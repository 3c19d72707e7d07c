"""Kill-and-resume semantics: snapshot ledger, idempotence, no duplicates
(north_rule resumability requirement)."""

from __future__ import annotations

import pytest

from sparkx.checkpoint import (
    SimulatedFailure,
    completed_groups,
    read_extracted,
    run_resumable,
)
from sparkx.schemas import TRANSCRIPTS
from sparkx.synth import synth_pandas


def _transcripts(spark, seed=37):
    return spark.createDataFrame(
        synth_pandas(n_convs=24, turns_per_conv=6, seed=seed), schema=TRANSCRIPTS
    )


def test_kill_and_resume_no_duplicates(spark, tmp_path):
    df = _transcripts(spark)
    out_a = str(tmp_path / "resumed")
    out_b = str(tmp_path / "single")

    # reference run: uninterrupted
    run_resumable(spark, df, out_b, n_groups=4, run_id="single")
    want = (
        read_extracted(spark, out_b)
        .toPandas()
        .sort_values("chunk_id")
        .reset_index(drop=True)
    )

    # killed run: dies after 2 of 4 group commits
    with pytest.raises(SimulatedFailure):
        run_resumable(spark, df, out_a, n_groups=4, run_id="try1", fail_after_groups=2)
    assert len(completed_groups(out_a)) == 2

    # resume: only remaining groups execute
    summary = run_resumable(spark, df, out_a, n_groups=4, run_id="try2")
    assert summary["groups_executed_this_run"] == 2
    assert len(summary["ledger"]) == 4

    got = (
        read_extracted(spark, out_a)
        .toPandas()
        .sort_values("chunk_id")
        .reset_index(drop=True)
    )
    assert got.chunk_id.is_unique, "duplicates after resume"
    assert list(got.chunk_id) == list(want.chunk_id)
    assert list(got.structured_text) == list(want.structured_text)
    assert list(got.status) == list(want.status)


def test_resume_is_noop_when_complete(spark, tmp_path):
    df = _transcripts(spark, seed=41)
    out = str(tmp_path / "done")
    run_resumable(spark, df, out, n_groups=3)
    summary = run_resumable(spark, df, out, n_groups=3)
    assert summary["groups_executed_this_run"] == 0


def test_resume_rejects_parameter_drift(spark, tmp_path):
    """ADVICE r1: a ledger committed under one (n_groups, mode, validate)
    must refuse to resume under another — group membership depends on
    n_groups, so silently skipping 'completed' groups would drop rows."""
    df = _transcripts(spark, seed=47)
    out = str(tmp_path / "drift")
    with pytest.raises(SimulatedFailure):
        run_resumable(spark, df, out, n_groups=4, fail_after_groups=1)
    for bad in (
        dict(n_groups=8),
        dict(n_groups=4, mode="agentic"),
        dict(n_groups=4, validate=False),
        # ADVICE r2: n_buckets shapes committed output (conv_bucket layout)
        dict(n_groups=4, n_buckets=64),
    ):
        with pytest.raises(ValueError, match="committed with"):
            run_resumable(spark, df, out, **bad)
    # original parameters still resume fine
    summary = run_resumable(spark, df, out, n_groups=4)
    assert len(summary["ledger"]) == 4


def test_lineage_columns_present(spark, tmp_path):
    df = _transcripts(spark, seed=43)
    out = str(tmp_path / "lin")
    run_resumable(spark, df, out, n_groups=2, run_id="lineage_run")
    got = read_extracted(spark, out)
    rows = got.select("run_id", "src_snapshot_id", "partition_id", "conv_bucket").limit(5).collect()
    assert all(r.run_id == "lineage_run" for r in rows)
    assert all(r.src_snapshot_id.startswith("group_") for r in rows)
    assert all(r.partition_id is not None and r.conv_bucket is not None for r in rows)
