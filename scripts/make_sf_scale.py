"""Build a 10x-scale copy of /root/testdata/sf0.1 for scaling measurements
(VERDICT r06 task #1): every table is unioned from N key-shifted copies so
row counts and join fan-outs scale linearly while fixed-key-range query
filters (l_partkey <= 200 etc.) keep selecting the same absolute rows —
exactly how the driver's fixed queries behave on a bigger driver-generated
sf.  Document texts get a per-copy token suffix on every word so copies are
NOT near-duplicates of each other (a raw 10x text clone would add ~45
jaccard~1 pairs per doc — a quadratic pair explosion no real 10x corpus
has); embeddings get a tiny per-copy rotation for the same reason.

Writes to the target dir with multiple row groups per table, so scans have
real splits (the sf0.1 files are single-row-group and scan single-task).

Usage: python scripts/make_sf_scale.py [copies=10] [out=/root/sfx/sf1.0]
NEVER writes into /root/testdata (read-only by contract).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"

# per-table key columns to shift by copy_idx * stride (stride = a round
# power of ten above the sf0.1 max key, so copies never collide)
SHIFTS = {
    "region": [],
    "nation": [],  # dimension tables stay as-is (25/5 rows; every copy joins them)
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
STRIDE = 10_000_000


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/sfx/sf1.0"
    assert not out.startswith("/root/testdata"), "testdata is read-only"
    os.makedirs(out, exist_ok=True)

    from graphene_spark.session import get_spark

    spark = get_spark("make-sf-scale", master="local[16]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "200000")

    for name, keys in SHIFTS.items():
        df = spark.read.parquet(f"{SRC}/{name}.parquet")
        if not keys:  # small dims: single copy
            df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
            continue
        parts = []
        for c in range(copies):
            p = df
            for k in keys:
                p = p.withColumn(k, F.col(k) + F.lit(c * STRIDE).cast("long"))
            if name == "documents":
                # de-correlate text across copies: suffix every word
                p = p.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(w, F.lit(f"x{c}")),
                        ),
                        " ",
                    ),
                ) if c else p
            if name == "embeddings" and c:
                p = p.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, i: x + F.lit(c * 1e-4) * F.cos(i.cast("double")),
                    ),
                )
            parts.append(p)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        # repartition so the output has real splits (multi-file, multi-task
        # scans at the 10x size)
        n_out = max(2, min(16, copies))
        u.repartition(n_out).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(name, "rows:", spark.read.parquet(f"{out}/{name}.parquet").count())
    spark.stop()


if __name__ == "__main__":
    main()
