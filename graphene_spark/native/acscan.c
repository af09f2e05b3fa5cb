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
