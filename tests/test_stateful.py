"""Stateful streaming sessionization: state accumulates across restarts."""

from __future__ import annotations

import os

from graphene_spark import datagen, stateful


def _write(pdf, path):
    pdf.to_parquet(path, index=False, coerce_timestamps="us", allow_truncated_timestamps=True)


def test_sessionization_accumulates_across_streams(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    ckpt = str(tmp_path / "ckpt")

    base = datagen.make_transcripts(n_convs=3, turns_per_conv=10, n_entities=20, seed=9)
    first = base[base.turn_idx < 5]
    second = base[base.turn_idx >= 5]

    out = str(tmp_path / "sessions")
    _write(first, os.path.join(str(inp), "b1.parquet"))
    q = stateful.run_sessionization(spark, str(inp), out, ckpt)
    q.awaitTermination(120)
    got1 = {r["conv_id"]: r for r in stateful.latest_sessions(spark, out).collect()}
    assert all(r["n_turns"] == 5 for r in got1.values())
    assert all(r["max_turn_idx"] == 4 for r in got1.values())

    # second half arrives in a NEW stream run: checkpointed state continues
    _write(second, os.path.join(str(inp), "b2.parquet"))
    q2 = stateful.run_sessionization(spark, str(inp), out, ckpt)
    q2.awaitTermination(120)
    got2 = {r["conv_id"]: r for r in stateful.latest_sessions(spark, out).collect()}
    assert len(got2) == 3
    for conv, r in got2.items():
        assert r["n_turns"] == 10, (conv, r)
        assert r["min_turn_idx"] == 0 and r["max_turn_idx"] == 9
        assert r["first_ts"] < r["last_ts"]
        assert r["n_mentions"] >= 0
