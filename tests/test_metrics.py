"""Sidecar metrics table: totals must reconcile with the oracle's counters
(reference pipeline.py:255-319; FIXTURES.md §4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkx import oracle as O
from sparkx.pipeline import extract_blocks, extraction_metrics
from sparkx.schemas import TRANSCRIPTS
from sparkx.synth import synth_pandas


def test_metric_totals_match_oracle(spark):
    t = synth_pandas(n_convs=20, turns_per_conv=8, seed=47)
    blocks = extract_blocks(
        spark.createDataFrame(t, schema=TRANSCRIPTS), mode="agentic", run_id="m1"
    )
    m = extraction_metrics(blocks, "m1")

    got = {
        r.metric: r.total
        for r in m.filter(F.col("phase") == "extract")
        .groupBy("metric")
        .agg(F.sum("value").alias("total"))
        .collect()
    }
    want = O.metrics_totals(O.run_oracle(t.to_dict("records"), mode="agentic", validate=True))

    for status in ("accepted", "dropped_short", "dropped_table_small", "dropped_figure_small"):
        assert got.get(f"blocks_{status}", 0) == want[status], status
    assert got.get("retried", 0) == want["retried"]


def test_metrics_are_per_partition(spark):
    t = synth_pandas(n_convs=30, turns_per_conv=6, seed=53)
    blocks = extract_blocks(
        spark.createDataFrame(t, schema=TRANSCRIPTS), n_partitions=8, run_id="m2"
    )
    m = extraction_metrics(blocks, "m2").toPandas()
    assert m.partition_id.nunique() > 1, "metrics not per-partition"
    assert set(m.phase) == {"extract", "validate"}
    assert (m.run_id == "m2").all()
