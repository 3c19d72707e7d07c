"""Custom stateful streaming operator: per-conversation running totals via
applyInPandasWithState, with state surviving a stream restart."""

from __future__ import annotations

from sparkx.streaming import start_conv_progress_stream
from sparkx.synth import synth_pandas, write_transcripts_parquet


def _write(tmp_path, name, seed, suffix):
    pdf = synth_pandas(n_convs=5, turns_per_conv=4, seed=seed)
    pdf["conv_id"] = pdf["conv_id"] + suffix
    write_transcripts_parquet(pdf, str(tmp_path / "in" / name))
    return pdf


def test_stateful_progress_accumulates_across_restarts(spark, tmp_path):
    (tmp_path / "in").mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    p1 = _write(tmp_path, "a.parquet", seed=5, suffix="_x")
    q = start_conv_progress_stream(spark, str(tmp_path / "in"), out, ckpt)
    q.awaitTermination(120)

    # restart with a second file: state must CARRY (same convs accumulate)
    p2 = _write(tmp_path, "b.parquet", seed=6, suffix="_x")
    q2 = start_conv_progress_stream(spark, str(tmp_path / "in"), out, ckpt)
    q2.awaitTermination(120)

    got = spark.read.parquet(f"{out}/batches").toPandas()
    latest = got.sort_values("batch_id").groupby("conv_id").last()

    import pandas as pd

    both = pd.concat([p1, p2], ignore_index=True)
    want = both.groupby("conv_id").agg(
        n_turns=("turn_idx", "size"), n_chars=("text", lambda s: s.str.len().sum())
    )
    for conv_id, row in want.iterrows():
        assert int(latest.loc[conv_id, "n_turns"]) == int(row.n_turns), conv_id
        assert int(latest.loc[conv_id, "n_chars"]) == int(row.n_chars), conv_id
