/* Gazetteer mention scanner — C implementation of the exact match language
 * of rules.build_gazetteer_regex for pure-ASCII rows.
 *
 * Semantics replicated (see rules.py):
 *   pattern = (?<![A-Za-z0-9]) ( TRIE ) (?![A-Za-z0-9])  with re.IGNORECASE,
 * where TRIE is the disjoint-branch character trie over normalized aliases
 * and the token separator is GAP_CLASS+ = [\t\n\x0B\f\r _-]+ (the ASCII
 * subset of the grammar's Unicode gap class — non-ASCII rows never reach
 * this scanner).  Because trie branches start with distinct characters and
 * the gap class is disjoint from every literal (aliases are normalized:
 * gap characters collapse to single spaces), the regex engine's walk is
 * deterministic; this function performs the same walk:
 *
 *   - scan positions left to right; a match may only start where the
 *     preceding byte is not [A-Za-z0-9] (the lookbehind);
 *   - at a candidate position, walk the trie (input folded by ASCII
 *     tolower), recording an accept point at every end-flagged node
 *     (the regex's optional-continuation end marker);
 *   - the match is the DEEPEST accept point whose following byte is not
 *     [A-Za-z0-9] (continuation-first optionality + the lookahead,
 *     backtracking to shorter accepts exactly like the regex);
 *   - on a match, resume scanning at its end (finditer semantics);
 *     otherwise advance one byte.
 *
 * Worst case O(n * max_alias_len) per row — the same bound as the compiled
 * trie regex it replaces, with a ~5-10x smaller per-byte constant (no
 * bytecode interpreter, no Match objects).  Rows containing any byte >=
 * 0x80 are flagged for the caller's regex fallback: non-ASCII codepoints
 * can case-fold into the trie (e.g. U+212A KELVIN SIGN -> k) and are
 * alnum-foldable for the boundary classes, so byte-level scanning would
 * diverge from the regex on them.
 *
 * One call per Arrow batch: `data` + `offsets` address the raw UTF-8
 * buffer of a pyarrow StringArray, so the scan does not materialize Python
 * strings at all.
 */

#include <stdint.h>

static inline uint8_t fold8(uint8_t c) {
    return (c >= 'A' && c <= 'Z') ? (uint8_t)(c + 32) : c;
}

static inline int is_alnum(uint8_t c) {
    return (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') ||
           (c >= 'A' && c <= 'Z');
}

static inline int is_gap(uint8_t c) {
    return c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == 0x0C ||
           c == '\r' || c == '_' || c == '-';
}

#define GS_MAX_DEPTH 512

/* children: int32[nnodes * 128], -1 = no edge (indexed node*128 + byte)
 * endflag:  uint8[nnodes], 1 = an alias ends at this node
 * gapchild: int32[nnodes], child after a GAP_CLASS+ run, -1 = none
 * m_row/m_start/m_end: output buffers of capacity `cap`; start/end are
 *   byte offsets RELATIVE to the row.
 * row_fallback: uint8[nrows], set to 1 when the row has a byte >= 0x80
 *   (caller must rescan that row with the regex).
 * Returns the number of matches, -1 if cap was exceeded (caller retries
 * with a larger buffer), -2 if maxdepth exceeds the compiled-in bound. */
long long gs_scan_batch(const uint8_t *data, const int64_t *offsets,
                        int64_t nrows, const int32_t *children,
                        const uint8_t *endflag, const int32_t *gapchild,
                        int32_t maxdepth, int64_t *m_row, int64_t *m_start,
                        int64_t *m_end, int64_t cap, uint8_t *row_fallback);

/* ---- relation-grammar scanner (rules.py frozen patterns, ASCII rows) ----
 *
 * Byte-exact implementation of the four frozen clause patterns for rows
 * already proven pure-ASCII by gs_scan_batch (row_fallback is INPUT here).
 * On ASCII input the grammar's Unicode WS_CLASS collapses to the six bytes
 * [\t\n\x0B\f\r ] and every greedy run in the patterns is followed by a
 * class-disjoint byte, so a single left-to-right parse with no backtracking
 * recognizes exactly the same language as the compiled regexes
 * (the disjointness argument is spelled out in rules.py; parity is pinned
 * by tests/test_native_scan.py and the three-way fuzz in test_extract.py).
 *
 *   type 0  ONTOLOGY   (?<!\w)([a-z_]+) ([A-Z][A-Z0-9]{1,9}):0*([0-9]+) ! ([^.;|\n]*)
 *           g1=pred g2=TYPE g3=digits (leading zeros pre-stripped, >=1 kept)
 *   type 1  XREF       (?<!\w)xref ([A-Za-z][A-Za-z0-9_]*):(VALUE+)
 *           VALUE = not [.;,\n], not WS-then-'(', not WS-then-keyword-WS
 *   type 2  RANK       (?<!\w)has_rank NCBITaxon:([A-Za-z0-9_]+)(?!\w)
 *   type 3  SYNONYM    (?<!\w)synonym: ([^.;|\n]+)
 *
 * Matches are emitted per row in clause-type order (all type 0 in text
 * order, then type 1, ...) — the exact order extract_turn_from_mentions
 * appends triples, so the Python assembly is a straight loop.  Group
 * offsets are byte offsets RELATIVE to the row (== char offsets on ASCII).
 * Unused group slots are -1.  `row_counts` (int64[nrows], written for
 * EVERY row including fallback rows, which get 0) carries the per-row
 * match count, so the caller locates row r's clauses by running prefix
 * sum — no row-id column, no boundary scan.  Returns match count, or -1
 * when cap was exceeded (caller retries with a larger buffer; counts are
 * rewritten from scratch). */

static inline int is_word(uint8_t c) {
    return is_alnum(c) || c == '_';
}

static inline int is_ws6(uint8_t c) {
    return c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == 0x0C ||
           c == '\r';
}

static inline int is_digit(uint8_t c) { return c >= '0' && c <= '9'; }

static inline int has_sub(const uint8_t *d, int64_t lo, int64_t hi,
                          const char *s, int len) {
    for (int64_t p = lo; p + len <= hi; p++) {
        int k = 0;
        while (k < len && d[p + k] == (uint8_t)s[k])
            k++;
        if (k == len)
            return 1;
    }
    return 0;
}

static inline int lit_at(const uint8_t *d, int64_t p, int64_t hi,
                         const char *s, int len) {
    if (p + len > hi)
        return 0;
    for (int k = 0; k < len; k++)
        if (d[p + k] != (uint8_t)s[k])
            return 0;
    return 1;
}

/* the XREF value lookahead (?!WS(?:xref|has_rank|synonym:)WS) at pos v,
 * where data[v] is already known to be WS */
static inline int kw_follows(const uint8_t *d, int64_t v, int64_t hi) {
    int64_t p = v + 1;
    if (lit_at(d, p, hi, "xref", 4) && p + 4 < hi && is_ws6(d[p + 4]))
        return 1;
    if (lit_at(d, p, hi, "has_rank", 8) && p + 8 < hi && is_ws6(d[p + 8]))
        return 1;
    if (lit_at(d, p, hi, "synonym:", 8) && p + 8 < hi && is_ws6(d[p + 8]))
        return 1;
    return 0;
}

#define GS_EMIT(T, A, B, C, D, E, F)                                        \
    do {                                                                    \
        if (nm >= cap)                                                      \
            return -1;                                                      \
        c_type[nm] = (T);                                                   \
        g1s[nm] = (A); g1e[nm] = (B);                                       \
        g2s[nm] = (C); g2e[nm] = (D);                                       \
        g3s[nm] = (E); g3e[nm] = (F);                                       \
        nm++;                                                               \
        row_counts[r]++;                                                    \
    } while (0)

long long gs_scan_grammar(const uint8_t *data, const int64_t *offsets,
                          int64_t nrows, const uint8_t *row_fallback,
                          int64_t *row_counts, uint8_t *c_type,
                          int64_t *g1s, int64_t *g1e, int64_t *g2s,
                          int64_t *g2e, int64_t *g3s, int64_t *g3e,
                          int64_t cap) {
    long long nm = 0;
    for (int64_t r = 0; r < nrows; r++) {
        row_counts[r] = 0;
        if (row_fallback[r])
            continue;
        const int64_t lo = offsets[r], hi = offsets[r + 1];
        if (hi - lo < 5)
            continue;

        /* type 0: ontology relationship (prefilter mirrors the Python
         * `" ! " in text` gate byte-for-byte) */
        if (has_sub(data, lo, hi, " ! ", 3)) {
            int64_t i = lo;
            while (i < hi) {
                uint8_t c0 = data[i];
                if (!((c0 >= 'a' && c0 <= 'z') || c0 == '_') ||
                    (i > lo && is_word(data[i - 1]))) {
                    i++;
                    continue;
                }
                int64_t q = i;
                while (q < hi && ((data[q] >= 'a' && data[q] <= 'z') ||
                                  data[q] == '_'))
                    q++;
                if (q >= hi || data[q] != ' ') { i++; continue; }
                int64_t t0 = q + 1;
                if (t0 >= hi || !(data[t0] >= 'A' && data[t0] <= 'Z')) {
                    i++;
                    continue;
                }
                int64_t t = t0 + 1;
                while (t < hi && ((data[t] >= 'A' && data[t] <= 'Z') ||
                                  is_digit(data[t])))
                    t++;
                int64_t tl = t - t0; /* total TYPE length, 2..10 */
                if (tl < 2 || tl > 10 || t >= hi || data[t] != ':') {
                    i++;
                    continue;
                }
                int64_t d0 = t + 1, d = t + 1;
                while (d < hi && is_digit(data[d]))
                    d++;
                if (d == d0) { i++; continue; }
                int64_t z = d0;
                while (z < d - 1 && data[z] == '0')
                    z++; /* 0* strip, >=1 digit kept */
                if (!lit_at(data, d, hi, " ! ", 3)) { i++; continue; }
                int64_t v = d + 3;
                while (v < hi && data[v] != '.' && data[v] != ';' &&
                       data[v] != '|' && data[v] != '\n')
                    v++;
                GS_EMIT(0, i - lo, q - lo, t0 - lo, t - lo, z - lo, d - lo);
                i = v; /* finditer: resume at match end (end of value) */
            }
        }

        /* type 1: xref */
        {
            int64_t i = lo;
            while (i + 8 <= hi) { /* min match: "xref " k ':' v  = 8 bytes */
                if (data[i] != 'x' || (i > lo && is_word(data[i - 1])) ||
                    !lit_at(data, i, hi, "xref ", 5)) {
                    i++;
                    continue;
                }
                int64_t k0 = i + 5;
                if (k0 >= hi || !((data[k0] >= 'A' && data[k0] <= 'Z') ||
                                  (data[k0] >= 'a' && data[k0] <= 'z'))) {
                    i++;
                    continue;
                }
                int64_t k = k0 + 1;
                while (k < hi && is_word(data[k]))
                    k++;
                if (k >= hi || data[k] != ':') { i++; continue; }
                int64_t v0 = k + 1, v = k + 1;
                while (v < hi) {
                    uint8_t c = data[v];
                    if (c == '.' || c == ';' || c == ',' || c == '\n')
                        break;
                    if (is_ws6(c)) {
                        if (v + 1 < hi && data[v + 1] == '(')
                            break;
                        if (kw_follows(data, v, hi))
                            break;
                    }
                    v++;
                }
                if (v == v0) { i++; continue; }
                GS_EMIT(1, k0 - lo, k - lo, v0 - lo, v - lo, -1, -1);
                i = v;
            }
        }

        /* type 2: has_rank NCBITaxon: */
        {
            int64_t i = lo;
            while (i + 20 <= hi) { /* literal 19 + >=1 group byte */
                if (data[i] != 'h' || (i > lo && is_word(data[i - 1])) ||
                    !lit_at(data, i, hi, "has_rank NCBITaxon:", 19)) {
                    i++;
                    continue;
                }
                int64_t g0 = i + 19, g = i + 19;
                while (g < hi && is_word(data[g]))
                    g++;
                if (g == g0) { i++; continue; }
                GS_EMIT(2, g0 - lo, g - lo, -1, -1, -1, -1);
                i = g;
            }
        }

        /* type 3: synonym: */
        {
            int64_t i = lo;
            while (i + 10 <= hi) { /* literal 9 + >=1 value byte */
                if (data[i] != 's' || (i > lo && is_word(data[i - 1])) ||
                    !lit_at(data, i, hi, "synonym: ", 9)) {
                    i++;
                    continue;
                }
                int64_t v0 = i + 9, v = i + 9;
                while (v < hi && data[v] != '.' && data[v] != ';' &&
                       data[v] != '|' && data[v] != '\n')
                    v++;
                if (v == v0) { i++; continue; }
                GS_EMIT(3, v0 - lo, v - lo, -1, -1, -1, -1);
                i = v;
            }
        }
    }
    return nm;
}

long long gs_scan_batch(const uint8_t *data, const int64_t *offsets,
                        int64_t nrows, const int32_t *children,
                        const uint8_t *endflag, const int32_t *gapchild,
                        int32_t maxdepth, int64_t *m_row, int64_t *m_start,
                        int64_t *m_end, int64_t cap, uint8_t *row_fallback) {
    long long nm = 0;
    int64_t accepts[GS_MAX_DEPTH];
    if (maxdepth + 1 > GS_MAX_DEPTH)
        return -2;
    for (int64_t r = 0; r < nrows; r++) {
        const int64_t lo = offsets[r], hi = offsets[r + 1];
        int fb = 0;
        for (int64_t p = lo; p < hi; p++) {
            if (data[p] >= 0x80) {
                fb = 1;
                break;
            }
        }
        row_fallback[r] = (uint8_t)fb;
        if (fb)
            continue;
        int64_t i = lo;
        while (i < hi) {
            if (i > lo && is_alnum(data[i - 1])) { /* lookbehind fails */
                i++;
                continue;
            }
            int32_t node = 0;
            int64_t j = i;
            int na = 0;
            for (;;) {
                if (endflag[node])
                    accepts[na++] = j;
                if (j >= hi)
                    break;
                uint8_t c = data[j];
                if (is_gap(c) && gapchild[node] >= 0) {
                    /* maximal munch is the only viable path: gap bytes are
                     * disjoint from every literal edge */
                    do {
                        j++;
                    } while (j < hi && is_gap(data[j]));
                    node = gapchild[node];
                    continue;
                }
                int32_t nx = children[((int64_t)node << 7) | fold8(c)];
                if (nx < 0)
                    break;
                node = nx;
                j++;
            }
            int64_t e = -1;
            for (int d = na - 1; d >= 0; d--) { /* deepest valid accept */
                int64_t cand = accepts[d];
                if (cand == hi || !is_alnum(data[cand])) {
                    e = cand;
                    break;
                }
            }
            if (e > i) {
                if (nm >= cap)
                    return -1;
                m_row[nm] = r;
                m_start[nm] = i - lo;
                m_end[nm] = e - lo;
                nm++;
                i = e;
            } else {
                i++;
            }
        }
    }
    return nm;
}
