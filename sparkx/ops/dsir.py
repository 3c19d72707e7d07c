"""DSIR-style data selection: hashed n-gram domain-affinity scoring.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023) picks
pretraining documents whose hashed n-gram feature distribution matches a
target domain: fit unigram+bigram bucket distributions on the target and
the raw pool, then score every pool document by how much its feature mass
lands in target-favored buckets.  The reference repo stops at extraction;
this is the selection pass a 100 TB corpus pipeline runs right after it.

Deviation from the paper, on purpose: DSIR's per-feature weight is
``log p_target(f) - log p_raw(f)`` summed over the document's features.
``log`` of a float is not bit-identical across engines (JVM ``Math.log``
and C ``libm`` may differ in the last ulp, so any rounded grid can
tie-split), so the weight here is the add-one-smoothed INTEGER odds ratio
``(tgt_b + 1) * 10^6 div (raw_b + 1)`` — bounded in (0, 10^6] when the
target is a subset of the pool — and the document score is the integer
MEAN of its features' weights (``sum div count``).  Same monotone intent
(features frequent in-target and rare in-pool score high), exact on every
engine by construction; the integer-grid rule is the same one the
pagerank/HITS kernels use.

Scale shape (100 TB): TWO narrow passes over the pool, no big shuffle.
Pass 1 explodes features and aggregates per-bucket counts — map-side
combinable into at most ``n_buckets`` rows (the paper uses 10^4; default
4096 here), a few KB.  Pass 2 re-explodes, broadcast-joins the tiny
weight table, and sums per document (one bounded shuffle on doc id).
Re-computing the explode beats persisting |tokens| rows at corpus scale.
The feature array is bound through an ``explode(array(split(...)))``
Generate barrier so CollapseProject cannot inline the regex split into
the bigram lambda (the O(tokens^2) trap documented in
``textstats.with_shingles``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 4096  # hashed feature space (DSIR paper: 10^4); power of two
WEIGHT_SCALE = 1_000_000  # odds-ratio fixed-point grid (micro-units)


def _features(docs: DataFrame, col: str, id_col: str,
              extra: list[str]) -> DataFrame:
    """One row per (id, extra..., feature): unigrams + bigrams of the
    whitespace-split lowered text.  Narrow map; the explode(array(...))
    wrapper is the CollapseProject barrier (see module docstring)."""
    d = docs.select(
        F.col(id_col), *[F.col(c) for c in extra],
        F.explode(
            F.array(F.split(F.lower(F.trim(F.col(col))), r"\s+"))
        ).alias("_toks"),
    )
    feats = F.expr(
        "concat(_toks, CASE WHEN size(_toks) < 2 "
        "THEN cast(array() as array<string>) "
        "ELSE transform(sequence(0, size(_toks) - 2), "
        "i -> concat(_toks[i], ' ', _toks[i+1])) END)"
    )
    return d.select(
        id_col, *extra, F.explode(feats).alias("feat")
    )


def feature_bucket(col: str = "feat", n_buckets: int = N_BUCKETS) -> Column:
    """Engine-portable 32-bit md5-prefix hash into [0, n_buckets)
    (DuckDB mirror: ``('0x' || substr(md5(f), 1, 8))::BIGINT % n``)."""
    return (
        F.conv(F.substring(F.md5(F.col(col)), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def domain_affinity(docs: DataFrame, target: Column,
                    col: str = "text", id_col: str = "doc_id",
                    n_buckets: int = N_BUCKETS) -> DataFrame:
    """Score every document's affinity to the ``target`` subset (a boolean
    Column over ``docs``, e.g. ``F.col("lang") == "en"``) on the hashed
    unigram+bigram bucket space.

    Returns one row per input document: ``(id_col, n_feats, affinity_q)``
    where ``affinity_q`` is the integer mean of the document's per-feature
    odds-ratio weights on the 10^6 grid — ~10^6 means "all feature mass in
    buckets the target dominates", small values mean out-of-domain.
    Documents with no features (empty text still yields the one empty
    token, so only NULL text) get ``n_feats = 0, affinity_q = 0``.

    Plan: pass 1 ``groupBy(bucket)`` with two conditional counts builds
    raw+target counts together (<= n_buckets rows); pass 2 broadcast-joins
    the weight table onto the re-exploded features and aggregates per id.
    """
    tagged = docs.withColumn("_is_tgt", target.cast("boolean"))
    feats = _features(tagged, col, id_col, ["_is_tgt"]).withColumn(
        "bucket", feature_bucket("feat", n_buckets)
    )
    weights = (
        feats.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("raw_c"),
            F.sum(F.when(F.col("_is_tgt"), 1).otherwise(0)).alias("tgt_c"),
        )
        .select(
            "bucket",
            F.expr(
                f"((tgt_c + 1) * {WEIGHT_SCALE}L) div (raw_c + 1)"
            ).alias("w_q"),
        )
    )
    scored = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("w_q").alias("_sw"),
        )
        .select(
            id_col,
            "n_feats",
            F.expr("_sw div n_feats").alias("affinity_q"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce(F.col("affinity_q"), F.lit(0)).cast("long").alias("affinity_q"),
        )
    )
