"""MySQL-dump table scan as a Spark source (S1/S2/S3, SURVEY.md §2.1).

The reference state-machine-parses a .sql dump single-threaded
(LoadMysqlDump.groovy:34-41 states, :98-143 updateState, :204-226 tuple
splitter) and exposes each table as a lazy row iterator.  Spark-first
re-expression:

* **DDL parse (small) on the driver**: one pass over the file's CREATE TABLE
  blocks extracts {table -> [column, ...]} — equivalent of getColumns
  (LoadMysqlDump.groovy:287-299).  DDL text is KB-scale; no reason to
  distribute it.
* **INSERT parsing (big) distributed**: ``spark.read.text`` over the dump,
  filter to ``INSERT INTO `table``` lines (predicate pushdown on the line
  prefix), extract per-tuple strings with a QUOTE-AWARE regex
  (``regexp_extract_all`` matching balanced ``'...'`` segments — the
  state-machine tuple splitter of LoadMysqlDump.groovy:204-226, which tracks
  quoting so a value containing ``),(`` cannot mis-split), then ``from_csv``
  with quote ``'`` — the CSVParser analog (LoadMysqlDump.groovy:149).

All dump values arrive as strings (reference semantics, SURVEY.md §1.2);
``'NULL'`` sentinels become real nulls (ReactomeLoader.groovy:255 analog).
At 100 TB the dump would be splittable by line, so the text scan
parallelizes; the driver-side DDL pass reads only the header region.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_CREATE_RE = re.compile(r"^CREATE TABLE `([^`]+)`")
_COLDEF_RE = re.compile(r"^\s*`([^`]+)`")

# One VALUES tuple, quote-aware: inside the parens, either a complete
# single-quoted string (backslash escapes honoured, so \' does not close the
# string) or any run of non-quote/non-paren characters.  Unquoted fields in a
# dump are numbers/NULL and never contain parens, so this matches exactly the
# tuples the reference's quote-tracking state machine yields
# (LoadMysqlDump.groovy:204-226) — a value containing "),(" stays intact.
_TUPLE_PATTERN = r"\((?:'(?:[^'\\]|\\.)*'|[^'()])*\)"


_DDL_CACHE: dict[tuple[str, float], dict[str, list[str]]] = {}


def parse_ddl(dump_path: str, encoding: str = "ISO-8859-1") -> dict[str, list[str]]:
    """{table -> ordered column names} from the dump's CREATE TABLE blocks.

    One sequential driver-side pass over the file: mysqldump interleaves
    each table's CREATE TABLE with its INSERT block, so the DDL cannot be
    read from a bounded header region.  The parse is memoized per
    (path, mtime) so N read_table() calls cost ONE pass, not N — at real
    scale, ship the schema separately (or a .sql header split from the
    data) so the driver never streams the data file at all."""
    import os

    key = (os.path.abspath(dump_path), os.path.getmtime(dump_path))
    hit = _DDL_CACHE.get(key)
    if hit is not None:
        return hit
    tables: dict[str, list[str]] = {}
    current: str | None = None
    with open(dump_path, encoding=encoding) as f:
        for line in f:
            m = _CREATE_RE.match(line)
            if m:
                current = m.group(1)
                tables[current] = []
                continue
            if current is not None:
                if line.startswith(")"):
                    current = None
                    continue
                cm = _COLDEF_RE.match(line)
                if cm:
                    tables[current].append(cm.group(1))
    _DDL_CACHE[key] = tables
    return tables


def read_table(
    spark: SparkSession,
    dump_path: str,
    table: str,
    columns: list[str] | None = None,
    null_sentinel: str = "NULL",
) -> DataFrame:
    """One dump table as a DataFrame of string columns.

    Distributed pipeline: text scan -> line filter -> strip INSERT prefix ->
    quote-aware tuple extraction -> explode -> from_csv(quote=').
    """
    if columns is None:
        columns = parse_ddl(dump_path)[table]
    schema = ", ".join(f"`{c}` string" for c in columns)

    lines = spark.read.text(dump_path)
    prefix = f"INSERT INTO `{table}` VALUES "
    rows = (
        lines.filter(F.col("value").startswith(prefix))
        # keep only the (...),(...),(...) body
        .select(
            F.regexp_replace(
                F.expr(f"substring(value, {len(prefix) + 1})"), r";\s*$", ""
            ).alias("body")
        )
        # quote-aware tuple matcher (LoadMysqlDump.groovy:204-226): a "),("
        # INSIDE a quoted value never splits a tuple
        .select(
            F.explode(
                F.regexp_extract_all("body", F.lit(_TUPLE_PATTERN), F.lit(0))
            ).alias("tuple_paren")
        )
        .select(
            F.expr("substring(tuple_paren, 2, length(tuple_paren) - 2)").alias("tuple_str")
        )
        .select(
            F.from_csv(
                "tuple_str", schema, {"quote": "'", "escape": "\\"}
            ).alias("r")
        )
        .select("r.*")
    )
    # 'NULL' sentinel -> null (P9 analog, ReactomeLoader.groovy:255)
    return rows.select(
        *[F.nullif(F.col(c), F.lit(null_sentinel)).alias(c) for c in columns]
    )


def read_all_tables(spark: SparkSession, dump_path: str) -> dict[str, DataFrame]:
    """All tables in the dump as DataFrames (lazy — nothing scans until used)."""
    ddl = parse_ddl(dump_path)
    return {t: read_table(spark, dump_path, t, cols) for t, cols in ddl.items()}
