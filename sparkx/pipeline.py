"""The extraction pipeline: scan → salt-repartition → kernel → lineage → write.

Spark restatement of the reference ingest path (``src/core/pipeline.py:208-330``,
SURVEY.md §3.1) as ONE narrow chain:

    transcripts scan
      → repartition on xxhash64(conv_id, turn_idx)      (skew break: per-turn
        extraction is embarrassingly parallel; a 10^6-turn conversation spreads
        across all partitions instead of pinning one executor)
      → mapInPandas(extract_batch)                       (parse + per-type
        process + retry + Checkpoint-A in a single Arrow pass — the reference's
        positional raw↔processed pairing (J1) becomes carried-through columns,
        never a join, SURVEY §4.3)
      → chunk_id = sha2(conv_id|turn_idx|type|idx)       (native, codegen'd;
        replaces uuid4 models.py:126 for reproducibility)
      → lineage columns (run_id, src_snapshot_id, partition_id, conv_bucket)
      → split: surviving rows → sink; all rows → metrics aggregation

Stable turn ordering is intrinsic to ``(conv_id, turn_idx, ts, block_rank,
block_idx)`` — reconstructed by :func:`ordered` at comparison time, never
depended on physically (north_rule W1 invariant).
"""

from __future__ import annotations

import functools
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkx.kernels.extract import OUTPUT_COLUMNS, extract_batch
from sparkx.schemas import EXTRACTED, SURVIVING_STATUSES

# kernel output schema = EXTRACTED minus chunk_id (added natively afterwards)
_KERNEL_SCHEMA = "".join(
    [
        "conv_id string, turn_idx int, role string, tool string, ts timestamp, ",
        "chunk_type string, block_rank int, block_idx int, raw_content string, ",
        "structured_text string, intuition_summary string, key_concepts array<string>, ",
        "confidence double, agent_notes string, retried boolean, ",
        "is_valid boolean, issues array<string>, verdict_score double, ",
        "validator_notes string, was_corrected boolean, status string",
    ]
)

DEFAULT_BUCKETS = 32


def _kernel(mode: str, validate: bool, it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        out = extract_batch(pdf, mode=mode, validate=validate)
        yield out[OUTPUT_COLUMNS]


def extract_blocks(
    transcripts: DataFrame,
    mode: str = "fastpath",
    validate: bool = True,
    run_id: str = "run_0",
    src_snapshot_id: str = "",
    n_partitions: int | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
    salt_repartition: bool = True,
) -> DataFrame:
    """All candidate blocks (surviving + dropped) with lineage columns."""
    spark = transcripts.sparkSession
    df = transcripts
    if salt_repartition:
        n_partitions = n_partitions or spark.sparkContext.defaultParallelism * 2
        # per-turn hash spread: breaks long-conversation skew (SURVEY §4.2);
        # safe because extraction is per-turn and ordering is intrinsic.
        df = df.repartition(n_partitions, F.xxhash64("conv_id", "turn_idx"))

    blocks = df.mapInPandas(
        functools.partial(_kernel, mode, validate), schema=_KERNEL_SCHEMA
    )
    return (
        blocks.withColumn(
            "chunk_id",
            F.sha2(
                F.concat_ws("|", "conv_id", "turn_idx", "chunk_type", "block_idx"),
                256,
            ),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("src_snapshot_id", F.lit(src_snapshot_id))
        .withColumn("partition_id", F.spark_partition_id())
        .withColumn(
            "conv_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
        )
        .select(*[f.name for f in EXTRACTED.fields], "run_id", "src_snapshot_id",
                "partition_id", "conv_bucket")
    )


def surviving(blocks: DataFrame) -> DataFrame:
    return blocks.filter(F.col("status").isin(*SURVIVING_STATUSES))


def ordered(blocks: DataFrame) -> DataFrame:
    """Stable output ordering (FIXTURES.md §3)."""
    return blocks.orderBy("conv_id", "turn_idx", "ts", "block_rank", "block_idx")


def crossref_edges(survivors: DataFrame) -> DataFrame:
    """P9 cross-reference heuristic (crew_mlx_tools.py:374-394) — native
    column ops, no UDF: lower-contains over the 4 keywords → edge rows."""
    kw = ["see figure", "table", "section", "refer to"]
    pred = functools.reduce(
        lambda a, b: a | b,
        [F.contains(F.lower("structured_text"), F.lit(k)) for k in kw],
    )
    return survivors.filter(pred).select(
        F.col("chunk_id").alias("source_chunk_id"),
        F.lit("cross_reference").alias("reference_type"),
        F.lit(0.8).alias("confidence"),
    )


def type_stats(blocks: DataFrame) -> DataFrame:
    """A1: chunk stats by type with rollup TOTAL (app.py:103-107)."""
    return (
        surviving(blocks)
        .rollup("chunk_type")
        .count()
        .select(
            F.coalesce("chunk_type", F.lit("TOTAL")).alias("chunk_type"),
            F.col("count").alias("n_chunks"),
        )
    )


def extraction_metrics(blocks: DataFrame, run_id: str) -> DataFrame:
    """Sidecar metrics rows: per (partition, bucket) status/type counts plus
    retry counts — the reference's counters (pipeline.py:255-319) made
    per-partition for lineage (north_rule)."""
    base = blocks.groupBy("partition_id", "conv_bucket", "status", "chunk_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("retried").cast("long")).alias("n_retried"),
        F.avg("confidence").alias("avg_conf"),
    )
    counts = base.select(
        F.lit(run_id).alias("run_id"),
        "partition_id",
        "conv_bucket",
        F.lit("extract").alias("phase"),
        F.concat(F.lit("blocks_"), "status").alias("metric"),
        F.col("n").cast("double").alias("value"),
        F.col("chunk_type").alias("detail"),
        F.current_timestamp().alias("ts"),
    )
    retries = base.select(
        F.lit(run_id).alias("run_id"),
        "partition_id",
        "conv_bucket",
        F.lit("extract").alias("phase"),
        F.lit("retried").alias("metric"),
        F.col("n_retried").cast("double").alias("value"),
        F.col("chunk_type").alias("detail"),
        F.current_timestamp().alias("ts"),
    )
    scores = base.select(
        F.lit(run_id).alias("run_id"),
        "partition_id",
        "conv_bucket",
        F.lit("validate").alias("phase"),
        F.lit("avg_confidence").alias("metric"),
        F.col("avg_conf").alias("value"),
        F.concat_ws("|", "chunk_type", "status").alias("detail"),
        F.current_timestamp().alias("ts"),
    )
    return counts.unionByName(retries).unionByName(scores)


def run_extraction(
    spark: SparkSession,
    transcripts: DataFrame,
    out_path: str,
    mode: str = "fastpath",
    validate: bool = True,
    run_id: str = "run_0",
    src_snapshot_id: str = "",
    n_buckets: int = DEFAULT_BUCKETS,
) -> dict:
    """One-shot (non-resumable) run: write survivors + metrics, return totals.
    For checkpointed runs use sparkx.checkpoint.run_resumable."""
    blocks = extract_blocks(
        transcripts, mode=mode, validate=validate, run_id=run_id,
        src_snapshot_id=src_snapshot_id, n_buckets=n_buckets,
    )
    blocks.persist()
    try:
        surviving(blocks).write.mode("overwrite").partitionBy("conv_bucket").parquet(
            f"{out_path}/extracted"
        )
        extraction_metrics(blocks, run_id).write.mode("append").parquet(
            f"{out_path}/metrics"
        )
        totals = {
            r["status"]: r["n"]
            for r in blocks.groupBy("status").agg(F.count("*").alias("n")).collect()
        }
    finally:
        blocks.unpersist()
    return totals
