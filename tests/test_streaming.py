"""Structured-Streaming incremental ingest: same kernel, micro-batch sink,
checkpointed resume, output identical to the batch pipeline."""

from __future__ import annotations

import os

from sparkx.streaming import start_extraction_stream
from sparkx.synth import synth_pandas, write_transcripts_parquet


def _write_input_files(tmp_path, n_files=3, seed0=60):
    in_dir = tmp_path / "stream_in"
    in_dir.mkdir()
    frames = []
    for i in range(n_files):
        pdf = synth_pandas(n_convs=6, turns_per_conv=5, seed=seed0 + i)
        pdf["conv_id"] = pdf["conv_id"] + f"_f{i}"
        write_transcripts_parquet(pdf, str(in_dir / f"part_{i}.parquet"))
        frames.append(pdf)
    return in_dir, frames


def test_stream_matches_batch(spark, tmp_path):
    import pandas as pd

    from sparkx.pipeline import extract_blocks, surviving
    from sparkx.schemas import TRANSCRIPTS

    in_dir, frames = _write_input_files(tmp_path)
    out = tmp_path / "stream_out"
    q = start_extraction_stream(
        spark, str(in_dir), str(out), str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)

    got = (
        spark.read.parquet(f"{out}/extracted/stream")
        .toPandas()
        .sort_values("chunk_id")
        .reset_index(drop=True)
    )
    batch_in = spark.createDataFrame(pd.concat(frames, ignore_index=True), TRANSCRIPTS)
    want = (
        surviving(extract_blocks(batch_in))
        .toPandas()
        .sort_values("chunk_id")
        .reset_index(drop=True)
    )
    assert list(got.chunk_id) == list(want.chunk_id)
    assert list(got.structured_text) == list(want.structured_text)
    # ledger manifests were committed per micro-batch
    ledger = [f for f in os.listdir(out / "_ledger") if f.startswith("stream_batch_")]
    assert ledger


def test_sink_replay_is_idempotent(spark, tmp_path):
    """ADVICE r1: a micro-batch retried after the data write but before the
    streaming-checkpoint commit must NOT duplicate rows — the batch-keyed
    overwrite sink rewrites its own directory on replay."""
    from sparkx.schemas import TRANSCRIPTS
    from sparkx.streaming import make_batch_sink

    pdf = synth_pandas(n_convs=5, turns_per_conv=4, seed=81)
    batch = spark.createDataFrame(pdf, TRANSCRIPTS)
    out = str(tmp_path / "replay_out")
    sink = make_batch_sink(out, mode="fastpath", run_id="replay")

    sink(batch, 0)
    first = spark.read.parquet(f"{out}/extracted/stream").toPandas()
    sink(batch, 0)  # simulated replay of the same micro-batch
    second = spark.read.parquet(f"{out}/extracted/stream").toPandas()
    assert len(second) == len(first)
    assert second.chunk_id.is_unique
    assert sorted(second.chunk_id) == sorted(first.chunk_id)


def test_stream_restart_identity_guard(spark, tmp_path):
    """A committed stream out_path refuses (a) a different checkpoint dir —
    fresh checkpoints re-number batches from 0 over committed batch dirs —
    and (b) a restart whose checkpoint was lost."""
    import shutil

    import pytest

    in_dir, _ = _write_input_files(tmp_path, n_files=1, seed0=90)
    out, ckpt = str(tmp_path / "gout"), str(tmp_path / "gckpt")
    q = start_extraction_stream(spark, str(in_dir), out, ckpt, available_now=True)
    q.awaitTermination(120)

    with pytest.raises(ValueError, match="committed under"):
        start_extraction_stream(spark, str(in_dir), out, str(tmp_path / "ckpt2"))
    shutil.rmtree(ckpt)
    with pytest.raises(ValueError, match="is gone"):
        start_extraction_stream(spark, str(in_dir), out, ckpt)


def test_stream_resume_processes_only_new_files(spark, tmp_path):
    in_dir, _ = _write_input_files(tmp_path, n_files=2, seed0=70)
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    q = start_extraction_stream(spark, str(in_dir), str(out), str(ckpt), available_now=True)
    q.awaitTermination(120)
    n1 = spark.read.parquet(f"{out}/extracted/stream").count()

    # add one new file; restart from the same checkpoint
    pdf = synth_pandas(n_convs=4, turns_per_conv=5, seed=99)
    pdf["conv_id"] = pdf["conv_id"] + "_new"
    write_transcripts_parquet(pdf, str(in_dir / "part_new.parquet"))

    q2 = start_extraction_stream(spark, str(in_dir), str(out), str(ckpt), available_now=True)
    q2.awaitTermination(120)
    got = spark.read.parquet(f"{out}/extracted/stream").toPandas()
    assert len(got) > n1
    assert got.chunk_id.is_unique, "resume reprocessed already-committed files"
    assert got.conv_id.str.endswith("_new").sum() > 0
