"""End-to-end corpus build: the full training-data funnel as ONE Spark DAG.

    transcripts ─ extract_blocks ─ surviving text blocks
        → exact near-dup removal   (normalized-fingerprint canonical pick)
        → quality + length gate    (C4/Gopher-style heuristics)
        → deterministic sampling   (hash gate, reproducible)
        → corpus parquet (bucketed) + one-pass funnel metrics

Design for 100 TB:

* **Single materialization.** Every stage is expressed as a COLUMN FLAG on
  the surviving-block frame (``is_canonical``, ``passes_quality``,
  ``sampled``), so the funnel metrics and the final filter come from the
  same cached pass — no per-stage jobs re-reading the input.
* **Skew-safe shuffles.** The dedup canonical pick is
  ``groupBy(fp).agg(min(chunk_id))`` (map-side combinable) + an equi-join
  back (AQE-skew-splittable) — never a window, which cannot be partially
  aggregated and pins a hot fingerprint's every duplicate in one task.  The
  metrics rollup is tiny and post-aggregation.  Quality, sampling, and the
  write are narrow.
* **Dedup = keep the lexicographically-first chunk_id per normalized
  fingerprint** — deterministic under any partitioning, and chunk_id is
  itself deterministic (sha256 of coordinates), so re-runs pick identical
  canonicals.  ``dedup_mode="minhash"`` additionally resolves MinHash-LSH
  near-dup pairs to connected-component clusters and keeps one canonical per
  cluster — fuzzy dedup that actually removes near-dups, not just lists them.
* **Reproducible subset**: the sample gate is the md5 hash gate from
  sparkx.ops.corpus — same salt+rate selects the same corpus on any engine,
  which is what makes a training-data cut auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkx.ops.corpus import _gate, sample_bucket
from sparkx.ops.dedup import connected_components, minhash_lsh_pairs
from sparkx.ops.textstats import fingerprint, quality_score, token_count
from sparkx.pipeline import extract_blocks, surviving


def corpus_flags(
    blocks: DataFrame,
    min_tokens: int = 20,
    max_tokens: int = 5000,
    min_quality: float = 0.3,
    sample_rate: float = 1.0,
    salt: str = "corpus0",
    dedup_mode: str = "exact",
    jaccard_threshold: float = 0.5,
    ngram_n: int = 3,
) -> DataFrame:
    """Annotate surviving text blocks with the funnel stage flags.

    ``dedup_mode``:

    * ``"exact"`` — ``is_canonical`` = lowest chunk_id per normalized
      fingerprint.  The pick is ``groupBy(fp).agg(min(chunk_id))`` + an
      equi-join back, NOT a row_number window: the groupBy partially
      aggregates map-side and the join is AQE-skew-splittable, so one
      boilerplate string duplicated 10^8 times costs a combiner, not a
      single 10^8-row window task (windows cannot be partially aggregated
      and AQE does not split skewed window partitions).
    * ``"minhash"`` — exact pass first, then MinHash-LSH near-dup pairs over
      the exact canonicals are resolved to CLUSTERS (connected components,
      sparkx.ops.dedup.connected_components); ``is_canonical`` keeps only the
      min-chunk_id member of each near-dup cluster.  This is what actually
      removes fuzzy duplicates from a training corpus — pairs alone cannot.
      The cluster-loser set is a near-dup-only frame (tiny relative to the
      corpus), joined back as a null-flagging left join (AQE picks
      broadcast-hash when the frame is actually tiny).
    """
    text_blocks = surviving(blocks).filter(F.col("chunk_type") == "text")
    fp = fingerprint("structured_text")  # ONE normalization definition
    n = token_count("structured_text")
    flagged = text_blocks.withColumn("fp", fp)
    canon = flagged.groupBy("fp").agg(F.min("chunk_id").alias("_canon_chunk_id"))
    flagged = flagged.join(canon, "fp").withColumn(
        "is_canonical", F.col("chunk_id") == F.col("_canon_chunk_id")
    ).drop("_canon_chunk_id")
    cached_dep = None
    if dedup_mode == "minhash":
        # persist the exact-canonical frame FIRST: connected_components
        # localCheckpoints its input eagerly, which would otherwise run the
        # whole extraction + canonical-pick pipeline once for the cluster
        # pass and AGAIN when the caller materializes the returned plan —
        # at the 100 TB design point the extraction pass is the expensive
        # one, and it must run once.  The handle is stashed on the returned
        # DataFrame so build_corpus can unpersist after its own
        # materialization (a bare corpus_flags caller keeps the cache for
        # the session, which is what a query over the frame wants anyway).
        cached_dep = flagged.persist()  # persist() returns self (PySpark API)
        reps = flagged.filter("is_canonical").select(
            F.col("chunk_id").alias("doc_id"),
            F.col("structured_text").alias("text"),
        )
        pairs = minhash_lsh_pairs(reps, n=ngram_n, threshold=jaccard_threshold)
        clusters = connected_components(pairs)
        losers = clusters.filter(F.col("node_id") != F.col("cluster_id")).select(
            F.col("node_id").alias("chunk_id"), F.lit(True).alias("_near_dup_loser")
        )
        # no broadcast hint: near-dup losers are usually small, but a crawl
        # can be ~30% near-dup — let AQE pick broadcast-hash when the frame
        # is actually tiny and fall back to a shuffled join when it is not
        flagged = (
            flagged.join(losers, "chunk_id", "left")
            .withColumn(
                "is_canonical",
                F.col("is_canonical") & F.col("_near_dup_loser").isNull(),
            )
            .drop("_near_dup_loser")
        )
    elif dedup_mode != "exact":
        raise ValueError(f"unknown dedup_mode {dedup_mode!r}")
    out = (
        flagged.withColumn(
            "passes_quality",
            (n >= min_tokens)
            & (n <= max_tokens)
            & (quality_score("structured_text") >= min_quality),
        )
        .withColumn(
            "sampled",
            sample_bucket("chunk_id", salt) < F.lit(_gate(sample_rate)),
        )
    )
    # HIDDEN-CONTRACT WARNING: the cache handle rides on the returned
    # DataFrame object.  If a transform is ever inserted between this return
    # and the caller's getattr (e.g. a .repartition() before .persist() in
    # build_corpus), the attribute is lost and the cache leaks silently —
    # keep the return value the frame callers persist/inspect directly.
    out._sparkx_cached_dep = cached_dep
    return out


def build_corpus(
    spark: SparkSession,
    transcripts: DataFrame,
    out_path: str,
    mode: str = "fastpath",
    min_tokens: int = 20,
    max_tokens: int = 5000,
    min_quality: float = 0.3,
    sample_rate: float = 1.0,
    salt: str = "corpus0",
    run_id: str | None = None,
    dedup_mode: str = "exact",
    jaccard_threshold: float = 0.5,
) -> dict:
    """Run the funnel, write the corpus + metrics, return the funnel counts.

    Returns dict with: blocks_in, after_dedup, after_quality, after_sample
    (each counting rows surviving UP TO that stage, stages applied in
    order dedup → quality → sample).  Two passes over the cached frame:
    the ≤8-row flag-combination rollup (from which the funnel dict is
    derived driver-side — no separate agg job) and the corpus write.
    ``run_id`` defaults to a fresh unique id so appended metrics rows from
    repeated runs into one out_path stay distinguishable.
    """
    import uuid

    run_id = run_id or f"corpus_{uuid.uuid4().hex[:8]}"
    flagged = corpus_flags(
        extract_blocks(transcripts, mode=mode, run_id=run_id),
        min_tokens=min_tokens,
        max_tokens=max_tokens,
        min_quality=min_quality,
        sample_rate=sample_rate,
        salt=salt,
        dedup_mode=dedup_mode,
        jaccard_threshold=jaccard_threshold,
    ).persist()
    try:
        rollup = (
            flagged.groupBy("is_canonical", "passes_quality", "sampled")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        funnel = {
            "blocks_in": sum(r.n for r in rollup),
            "after_dedup": sum(r.n for r in rollup if r.is_canonical),
            "after_quality": sum(
                r.n for r in rollup if r.is_canonical and r.passes_quality
            ),
            "after_sample": sum(
                r.n
                for r in rollup
                if r.is_canonical and r.passes_quality and r.sampled
            ),
        }
        final = flagged.filter(
            F.col("is_canonical") & F.col("passes_quality") & F.col("sampled")
        ).drop("fp", "is_canonical", "passes_quality", "sampled")
        final.write.mode("overwrite").partitionBy("conv_bucket").parquet(
            f"{out_path}/corpus"
        )
        metrics = spark.createDataFrame(
            [
                (bool(r.is_canonical), bool(r.passes_quality), bool(r.sampled),
                 int(r.n), run_id)
                for r in rollup
            ] or [(True, True, True, 0, run_id)],
            "is_canonical boolean, passes_quality boolean, sampled boolean, "
            "n long, run_id string",
        )
        metrics.write.mode("append").parquet(f"{out_path}/metrics")
        return funnel
    finally:
        flagged.unpersist()
        dep = getattr(flagged, "_sparkx_cached_dep", None)
        if dep is not None:
            dep.unpersist()
