"""Custom stateful streaming operator: conversation sessionization.

``applyInPandasWithState`` maintains per-conversation running state across
micro-batches — the streaming analog of the reference's per-loader mutable
caches (Loader.groovy:22: state keyed by external id), but with managed,
checkpointed state instead of driver-held maps.

The operator accumulates (n_turns, turn-index span, ts span, mention count)
per conv_id and emits the updated summary every batch (update mode).  State
survives across restarts through the stream checkpoint, so an availableNow
"top-up" stream continues counting where the previous run stopped — tested
in tests/test_stateful.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, n_turns long, min_turn_idx int, max_turn_idx int, "
    "first_ts timestamp, last_ts timestamp, n_mentions long"
)
STATE_SCHEMA = "n_turns long, min_turn int, max_turn int, first_ts long, last_ts long, n_mentions long"

_MENTION_RE = r"(?i)(?<![A-Za-z0-9])ent[\s_\-]0*(\d+)(?![A-Za-z0-9])"


def _update_conversation(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import re

    mention_re = re.compile(_MENTION_RE)
    if state.exists:
        n_turns, min_t, max_t, first_ts, last_ts, n_m = state.get
    else:
        n_turns, min_t, max_t, first_ts, last_ts, n_m = 0, 2**31 - 1, -1, None, None, 0

    for pdf in pdfs:
        n_turns += len(pdf)
        if len(pdf):
            min_t = min(min_t, int(pdf["turn_idx"].min()))
            max_t = max(max_t, int(pdf["turn_idx"].max()))
            ts_min = pdf["ts"].min()
            ts_max = pdf["ts"].max()
            fs = int(ts_min.value // 1000)  # ns -> us
            ls = int(ts_max.value // 1000)
            first_ts = fs if first_ts is None else min(first_ts, fs)
            last_ts = ls if last_ts is None else max(last_ts, ls)
            n_m += int(
                pdf["text"].fillna("").map(lambda t: len(mention_re.findall(t))).sum()
            )

    state.update((n_turns, min_t, max_t, first_ts, last_ts, n_m))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_turns": [n_turns],
            "min_turn_idx": [min_t],
            "max_turn_idx": [max_t],
            "first_ts": [pd.Timestamp(first_ts, unit="us")],
            "last_ts": [pd.Timestamp(last_ts, unit="us")],
            "n_mentions": [n_m],
        }
    )


def conversation_sessions(stream: DataFrame) -> DataFrame:
    """Streaming per-conversation session summaries (update mode)."""
    return stream.groupBy("conv_id").applyInPandasWithState(
        _update_conversation,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_sessionization(
    spark: Any,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """availableNow sessionization appending update rows (tagged with the
    micro-batch id) to ``out_dir``; state is checkpointed so successive
    invocations continue accumulating.  ``latest_sessions`` reads the
    current snapshot (max batch per conversation)."""
    import pyspark.sql.functions as F

    from .streaming import TRANSCRIPTS_SCHEMA

    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(input_dir)
    out = conversation_sessions(stream)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out_dir)

    return (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def latest_sessions(spark: Any, out_dir: str) -> DataFrame:
    """Current per-conversation snapshot from the update log."""
    import pyspark.sql.functions as F

    log = spark.read.parquet(out_dir)
    return (
        log.groupBy("conv_id")
        .agg(F.max_by(F.struct(*[c for c in log.columns if c != "conv_id"]), "batch_id").alias("s"))
        .select("conv_id", "s.*")
        .drop("batch_id")
    )
