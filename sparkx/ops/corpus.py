"""Corpus-curation operators for training-data pipelines.

The reference stops at extraction + retrieval; a 100 TB corpus pipeline also
needs the curation pass between them: deterministic sampling (reproducible
subsets without a stored sample table), stratified sampling (per-language /
per-source balance), heuristic quality filtering (the C4/Gopher-style rule
family), time-bucketed rollups, and distribution statistics.  All native
column expressions — every operator is a narrow map or one bounded
aggregation, no UDFs, no driver-side loops.

Scale notes:

* ``deterministic_sample`` — hash-gate filter, fully pushed into the scan
  stage (no shuffle, no stored state); the same (salt, rate) always selects
  the same rows, so pipelines are reproducible and resumable by
  construction.  md5-based so any engine can re-derive the subset.
* ``stratified_sample`` — same hash gate with a per-stratum rate map folded
  into ONE CASE expression: still a narrow map (the naive alternative —
  per-stratum sampleBy or N filtered unions — rescans the input N times).
* ``quality_length_filter`` — conjunction of cheap per-row predicates; at
  scale this is the first pass after extraction and must be scan-pushable,
  which pure column predicates are.
* ``time_bucket_rollup`` — date_trunc + groupBy: one shuffle on (bucket,
  key), map-side partial aggregation; value sums in integer micro-units so
  results are partitioning-independent (engine-parity rule).
* ``token_quantiles_by`` — DEFAULT is ``approx_percentile`` (mergeable
  quantile sketch, map-side combinable — the 100 TB shape); ``exact=True``
  keeps the interpolated ``percentile`` aggregate for the cross-engine
  oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkx.ops.textstats import quality_score, token_count

SAMPLE_BUCKETS = 10_000  # hash-gate resolution: rates quantized to 0.01%


def sample_bucket(key_col: str, salt: str = "") -> Column:
    """Deterministic bucket in [0, SAMPLE_BUCKETS) from md5(salt|key) —
    engine-portable (DuckDB: ('0x'||substr(md5(...),1,8))::BIGINT % N)."""
    keyed = F.concat(F.lit(salt), F.lit("|"), F.col(key_col).cast("string"))
    return F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("long") % SAMPLE_BUCKETS


def _gate(rate: float) -> int:
    """Bucket threshold for a rate — round, don't truncate: 0.29*10000 is
    2899.999… in binary, and int() would silently shift the gate by one
    bucket vs an engine that mirrors it with round(rate*10000)."""
    return round(rate * SAMPLE_BUCKETS)


def deterministic_sample(df: DataFrame, key_col: str, rate: float,
                         salt: str = "s0") -> DataFrame:
    """Reproducible ``rate`` subsample keyed on ``key_col`` (no RNG state,
    no stored sample list; same salt+rate → same rows on any engine/run)."""
    return df.filter(sample_bucket(key_col, salt) < _gate(rate))


def stratified_sample(df: DataFrame, key_col: str, strata_col: str,
                      rates: dict[str, float], default_rate: float = 0.0,
                      salt: str = "s0") -> DataFrame:
    """Per-stratum deterministic sampling with the rate map folded into one
    CASE expression — a single narrow map over the input."""
    gate: Column = F.lit(_gate(default_rate))
    for value, rate in rates.items():
        gate = F.when(
            F.col(strata_col) == value, F.lit(_gate(rate))
        ).otherwise(gate)
    return df.filter(sample_bucket(key_col, salt) < gate)


def temperature_mixture(
    docs: DataFrame,
    total_tokens: int,
    by: str = "lang",
    salt: str = "temp0",
) -> DataFrame:
    """Temperature-balanced sampling (the mT5 / CC-100 multilingual rule,
    Xue et al. 2021 §3.2; Conneau et al. 2020): per-stratum rates ∝
    observed_tokens^alpha instead of a hand-given mixture — low-resource
    strata are upsampled relative to proportional sampling.  alpha is
    pinned to 0.5 (T=2, inside the paper-recommended 0.2-0.7 band) because
    ``floor(sqrt(bigint))`` is the one fractional power both engines
    compute bit-identically (IEEE correctly-rounded sqrt + exact floor at
    these magnitudes); arbitrary-alpha ``pow`` doubles would tie-break
    differently on the e4 grid.  Every allocation step is integer
    division: t_s = total_tokens·w_s div Σw, rate_e4 = min(10^4,
    t_s·10^4 div n_s) — no float ever crosses an engine boundary.

    Execution mirrors `mixture_plan`: one tiny per-stratum aggregate, a
    1-row broadcast for the weight sum, one narrow hash-gated scan, final
    tally.  Output: (stratum, rate_e4, n_docs, n_tokens) of the sample."""
    n = token_count()
    tot = docs.groupBy(F.col(by).alias("_stratum")).agg(
        F.sum(n).alias("_toks")
    )
    w = tot.select(
        "_stratum", "_toks",
        F.floor(F.sqrt(F.col("_toks"))).cast("long").alias("_w"),
    )
    s = w.agg(F.sum("_w").alias("_sw"))
    rates = w.crossJoin(F.broadcast(s)).select(
        "_stratum",
        F.least(
            F.lit(SAMPLE_BUCKETS).cast("long"),
            F.expr(
                f"(({int(total_tokens)}L * _w) div _sw)"
                f" * {SAMPLE_BUCKETS} div _toks"
            ),
        ).alias("rate_e4"),
    )
    sampled = docs.join(
        F.broadcast(rates), docs[by] == F.col("_stratum")
    ).filter(sample_bucket("doc_id", salt) < F.col("rate_e4"))
    return (
        sampled.groupBy(F.col("_stratum").alias(by), "rate_e4")
        .agg(F.count("*").alias("n_docs"), F.sum(n).alias("n_tokens"))
    )


def mixture_plan(
    docs: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    by: str = "source",
    salt: str = "mix0",
) -> DataFrame:
    """Training-data MIXING: derive per-stratum deterministic sampling rates
    from target mixture WEIGHTS and a token budget, apply them, and report
    the realized mix — the op behind "30% code / 70% web at 1T tokens".

    rate_s = min(1, weight_s · total_tokens / observed_tokens_s), held as
    the integer gate ``rate_e4`` (bucket threshold out of 10000 — the same
    grid every sampler here uses, so the float never crosses an engine
    boundary).  Strata absent from ``weights`` get rate 0.  Output: one row
    per weighted stratum — (stratum, rate_e4, n_docs, n_tokens) of the
    SAMPLED subset.  The sample itself is reproducible on any engine/run
    (hash gate on doc_id), so the realized mix is auditable after the fact.

    Execution: one aggregate for the per-stratum token totals (tiny,
    broadcast back), one narrow filtered scan for the sample — no shuffle
    of the corpus itself beyond the final tally."""
    n = token_count()
    totals = (
        docs.groupBy(F.col(by).alias("_stratum"))
        .agg(F.sum(n).alias("_toks"))
        .filter(F.col("_stratum").isin(list(weights)))
    )
    w = F.lit(None).cast("double")
    for value, weight in weights.items():
        w = F.when(F.col("_stratum") == value, F.lit(float(weight))).otherwise(w)
    rates = totals.select(
        "_stratum",
        F.least(
            F.lit(SAMPLE_BUCKETS),
            F.round(w * total_tokens / F.col("_toks") * SAMPLE_BUCKETS).cast("long"),
        ).alias("rate_e4"),
    )
    sampled = (
        docs.join(F.broadcast(rates), docs[by] == F.col("_stratum"))
        .filter(sample_bucket("doc_id", salt) < F.col("rate_e4"))
    )
    return (
        sampled.groupBy(F.col("_stratum").alias(by), "rate_e4")
        .agg(F.count("*").alias("n_docs"), F.sum(n).alias("n_tokens"))
    )


def chunk_spans(
    docs: DataFrame,
    chunk_tokens: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking for a fixed context window — the
    long-document splitter that runs before sequence packing: windows of
    ``chunk_tokens`` whitespace tokens advancing by ``chunk_tokens −
    overlap`` (so consecutive chunks share ``overlap`` tokens and no token
    is lost at a boundary).  Output: one row per chunk —
    ``(id_col, chunk_idx, start_tok, n_tok, chunk_text)``; the final chunk
    may be short; empty/NULL documents produce no rows.  Original token
    case/content is preserved (this is training text, not a fingerprint).

    Execution: token array bound through the Generate barrier (see
    with_shingles — keeps the regex split evaluated once per doc), start
    offsets as a codegen'd ``sequence`` explode, each chunk a
    ``slice``+``concat_ws`` over the bound array.  One narrow Generate
    chain, no shuffle, no UDF — at 100 TB this is a pure map stage."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(col)), r"\s+")
    d = (
        docs.filter(F.col(col).isNotNull() & (F.trim(F.col(col)) != ""))
        .select(F.col(id_col), F.explode(F.array(toks)).alias("_toks"))
    )
    starts = F.expr(f"sequence(0, size(_toks) - 1, {stride})")
    out = d.select(
        id_col,
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
        "_toks",
    )
    return out.select(
        id_col,
        "chunk_idx",
        "start_tok",
        F.least(
            F.lit(chunk_tokens), F.size("_toks") - F.col("start_tok")
        ).alias("n_tok"),
        F.concat_ws(
            " ", F.expr(f"slice(_toks, start_tok + 1, {chunk_tokens})")
        ).alias("chunk_text"),
    )


def split_assign(
    docs: DataFrame,
    val_rate: float = 0.01,
    test_rate: float = 0.01,
    key_col: str = "doc_id",
    salt: str = "split0",
) -> DataFrame:
    """Deterministic train/val/test split assignment — the hash-gate trick
    applied to dataset splitting, so the split is a pure function of
    (salt, key): reproducible on any engine/run, stable under re-ingest
    (a re-crawled document lands in the same split — no eval leakage from
    split churn), and auditable after the fact.  Buckets
    ``[0, test) → test, [test, test+val) → val, rest → train`` on the
    10000-bucket grid.  One narrow map; no shuffle."""
    b = sample_bucket(key_col, salt)
    test_gate = _gate(test_rate)
    val_gate = test_gate + _gate(val_rate)
    return docs.withColumn(
        "split",
        F.when(b < test_gate, F.lit("test"))
        .when(b < val_gate, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def cluster_split(
    docs: DataFrame,
    pairs: DataFrame,
    val_rate: float = 0.01,
    test_rate: float = 0.01,
    id_col: str = "doc_id",
    salt: str = "splitc",
) -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicate CLUSTERS are the
    atomic unit, so no near-dup of a training document can land in the eval
    split (the eval-contamination hole a doc-keyed split leaves open — the
    reason benchmark decontamination work treats near-dups, not just exact
    matches, as leaks).  ``pairs`` is any (a_id, b_id) near-dup pair frame
    (MinHash-LSH at scale); pairs → connected components → each document's
    split key is its cluster id (min member id), singletons key on their
    own id — then the same deterministic hash gate as ``split_assign``, so
    the split stays reproducible and re-ingest-stable.

    Execution: the CC machinery is O(log n) bounded-shuffle rounds
    (dedup.connected_components); the label attach is ONE left join on
    doc_id (broadcast when the dup set is small — AQE decides); the gate
    itself is a narrow map.  Returns ``(doc_id, split_key, split)``.
    """
    from sparkx.ops.dedup import connected_components

    cc = connected_components(pairs).withColumnRenamed("node_id", id_col)
    labeled = docs.select(id_col).join(cc, id_col, "left").withColumn(
        "split_key", F.coalesce(F.col("cluster_id"), F.col(id_col))
    )
    b = sample_bucket("split_key", salt)
    test_gate = _gate(test_rate)
    val_gate = test_gate + _gate(val_rate)
    return labeled.select(
        id_col,
        "split_key",
        F.when(b < test_gate, F.lit("test"))
        .when(b < val_gate, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def corpus_cube(docs: DataFrame) -> DataFrame:
    """OLAP corpus summary: doc and token counts over CUBE(lang, source) —
    every (lang, source) cell plus per-lang, per-source, and grand totals in
    ONE pass (Spark plans the cube as an expanded aggregate with map-side
    partial combine; at 100 TB this is one shuffle, not four jobs).
    ``gid`` is the grouping bitmask (0 = leaf cell, 3 = grand total) so
    rolled-up NULLs are distinguishable from genuinely-NULL dimension
    values."""
    n = token_count()
    return (
        docs.cube("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n).alias("n_tokens"),
            # grouping_id must be computed inside the cube aggregate
            F.grouping_id().cast("int").alias("gid"),
        )
    )


def corpus_scorecard(docs: DataFrame) -> DataFrame:
    """Per-(lang, source) corpus health scorecard — the table a corpus
    curator actually reads before picking mixture weights: volume (docs,
    mean tokens), quality (mean composite score, Gopher rule-battery pass
    rate), and redundancy (exact-duplicate fraction by normalized
    fingerprint).  One map pass (Gopher signals + score + fingerprint are
    all narrow) feeding a low-cardinality grouped aggregate.

    Scale notes: the grouped count(DISTINCT fp) is planned by Catalyst as
    the two-level distinct rewrite (partial+final per (group, fp), then
    partial+final per group — four HashAggregates, two Exchanges; audited
    in PLANS.md), so a giant source does NOT funnel through one task.  Averages
    are shuffled as exact-integer sums (quality rides its 4-dp grid ×10⁴
    as a long — order-free across engines and across partitions).

    Every output ratio is TRUNCATED to the 1e-4 grid by INTEGER division
    (``(sum × 10⁴) div n``, then an exact /10⁴) — never ``round(sum/n)``:
    a mean over a grid hits .00005 ties constantly, and at a tie Spark
    (BigDecimal HALF_UP on the double's shortest decimal repr) and DuckDB
    (half-away on the raw binary double) round DIFFERENT ways.  Integer
    division has no ties and both engines agree exactly."""
    from sparkx.ops.textstats import fingerprint, gopher_rules

    g = gopher_rules(docs, select_all=True)
    base = g.select(
        "lang",
        "source",
        F.col("keep").cast("long").alias("_k"),
        token_count().alias("_t"),
        F.round(quality_score() * 10000).cast("long").alias("_q"),
        fingerprint().alias("_fp"),
    )
    agg = base.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("_t").alias("_st"),
        F.sum("_q").alias("_sq"),
        F.sum("_k").alias("_sk"),
        F.count_distinct(F.col("_fp")).alias("_ndist"),
    )
    return agg.select(
        "lang",
        "source",
        "n_docs",
        (F.expr("(_st * 10000) div n_docs") / 10000.0).alias("mean_tokens"),
        (F.expr("_sq div n_docs") / 10000.0).alias("mean_quality"),
        (F.expr("(_sk * 10000) div n_docs") / 10000.0).alias("gopher_keep_frac"),
        (F.expr("((n_docs - _ndist) * 10000) div n_docs") / 10000.0).alias(
            "dup_frac"
        ),
    )


def quality_length_filter(docs: DataFrame, min_tokens: int = 20,
                          max_tokens: int = 5000,
                          min_quality: float = 0.3) -> DataFrame:
    """C4/Gopher-style heuristic gate: token-count window + quality floor
    (quality = the deterministic score from sparkx.ops.textstats)."""
    n = token_count()
    return docs.filter(
        (n >= min_tokens) & (n <= max_tokens) & (quality_score() >= min_quality)
    )


def time_bucket_rollup(events: DataFrame, bucket_seconds: int = 3600,
                       key_col: str = "event_type") -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: (time bucket, key) →
    count + exact integer micro-unit value sum (float sums are
    partitioning-order dependent and are never emitted).  Buckets are epoch
    seconds (floor-divided), not date_trunc — timezone-independent and
    bit-identical across engines."""
    ep = F.col("ts").cast("timestamp").cast("long")
    return (
        events.groupBy(
            (F.floor(ep / bucket_seconds) * bucket_seconds).alias("bucket_epoch"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 10000).cast("long")).alias("value_e4"),
        )
    )


def token_quantiles_by(docs: DataFrame, by: str = "lang",
                       qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                       exact: bool = False,
                       accuracy: int = 10_000) -> DataFrame:
    """Token-count percentiles per group (the corpus length-distribution
    report).  Identical output schema in both modes.

    The DEFAULT is ``approx_percentile`` — a mergeable quantile sketch
    (Greenwald–Khanna style) that partially aggregates map-side, so the
    shuffle carries one bounded sketch per (partition, group) instead of
    every row: the only shape that survives a 100 TB group.  Rank error is
    ≤ 1/``accuracy``, tolerance-tested in tests/test_ops.py.

    ``exact=True`` uses the interpolated ``percentile`` aggregate — a full
    per-group sort, kept for the cross-engine oracle gate (DuckDB
    ``quantile_cont``) and small-data reports."""
    n = token_count().alias("n_tokens")
    d = docs.select(F.col(by).alias("grp"), n)
    if exact:
        cols = [
            F.percentile("n_tokens", F.lit(q)).alias(f"p{int(q * 100)}") for q in qs
        ]
    else:
        cols = [
            F.approx_percentile("n_tokens", F.lit(q), F.lit(accuracy))
            .cast("double")
            .alias(f"p{int(q * 100)}")
            for q in qs
        ]
    return d.groupBy("grp").agg(F.count("*").alias("n_docs"), *cols)


def distinct_stats(docs: DataFrame, by: str = "lang",
                   exact: bool = False, rsd: float = 0.02) -> DataFrame:
    """Distinct-content count per group — the corpus dedup-rate report
    (n_docs vs n_distinct normalized fingerprints).  Identical output schema
    in both modes.

    The DEFAULT is ``approx_count_distinct`` (HyperLogLog++, Heule et al.
    EDBT 2013): a bounded mergeable sketch per (partition, group), map-side
    combinable — an exact distinct at 100 TB shuffles every fingerprint once
    just to count them.  Relative standard deviation ``rsd``,
    tolerance-tested in tests/test_corpus.py.

    ``exact=True`` uses ``count_distinct`` — kept for the cross-engine
    oracle gate and small-data reports."""
    from sparkx.ops.textstats import fingerprint

    d = docs.select(F.col(by).alias("grp"), fingerprint("text").alias("fp"))
    n_distinct = (
        F.count_distinct("fp") if exact else F.approx_count_distinct("fp", rsd)
    ).alias("n_distinct")
    return d.groupBy("grp").agg(F.count("*").alias("n_docs"), n_distinct)


def pack_assignments(docs: DataFrame, budget_tokens: int = 2048,
                     n_shards: int = 64, by: str = "lang",
                     id_col: str = "doc_id") -> DataFrame:
    """Sequence-packing assignment: lay documents out in deterministic order
    and chunk the token stream into fixed ``budget_tokens`` training
    sequences — the concatenate-and-chunk policy LLM pretraining pipelines
    use (documents may straddle a boundary; exact first-fit bin packing is
    inherently sequential and is NOT what large pipelines do).

    Returns one row per document: group, shard, token count, the document's
    starting offset in its shard's token stream, and ``bin`` — the training
    sequence its first token lands in (``offset div budget``).

    Scale shape: the running sum is a window ORDERED within
    ``(group, shard)``, where ``shard`` is an engine-portable md5 hash of
    the document id into ``n_shards`` buckets.  Without the shard key a
    per-group ordered window puts an entire group in ONE task — the
    canonical window scale-killer; with it, parallelism is
    ``groups × n_shards`` and each shard packs independently (exactly how
    real packing runs: one stream per writer shard).  Offsets are exact
    integers, so the result is engine-reproducible."""
    from pyspark.sql import Window as W

    from sparkx.ops.textstats import token_count

    shard = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long") % n_shards
    )
    d = docs.select(
        F.col(id_col),
        F.col(by).alias("grp"),
        shard.alias("shard"),
        token_count().alias("n_tokens"),
    )
    w = (
        W.partitionBy("grp", "shard")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    running = F.sum("n_tokens").over(w)
    return d.select(
        id_col,
        "grp",
        "shard",
        "n_tokens",
        (running - F.col("n_tokens")).alias("start_offset"),
        F.floor((running - F.col("n_tokens")) / budget_tokens).cast("long").alias("bin"),
    )


def priority_sample(docs: DataFrame, weight_col: str, k: int,
                    by: str = "lang", id_col: str = "doc_id",
                    salt: str = "pri0") -> DataFrame:
    """Weight-proportional sampling without replacement via priority
    sampling (Duffield, Lund & Thorup, JACM 2007): each row gets priority
    q = w / u with u uniform from a deterministic hash, and the k highest
    priorities per group are kept — heavy rows are near-certain picks,
    light rows win proportionally to weight.  The classic use here:
    pick k representative documents per language with probability ∝ size,
    reproducibly (subset estimators over the kept rows are unbiased with
    the (k+1)-th priority as the threshold — not emitted; this operator is
    the selection, not the estimator).

    Engine-exact by construction: u is the 32-bit md5 prefix of
    ``salt|id`` plus one (range [1, 2^32], never zero), and the priority is
    the INTEGER ``w * 2^32 div u`` — no float ever crosses an engine
    boundary (a float w/u would rank-tie differently per engine).  Ties
    (same integer priority) break on ascending id.

    Scale shape: one narrow map computes u and q, then a per-group top-k.
    The rank-filter form lets Spark plan a ``WindowGroupLimit`` — each
    shuffle partition keeps only its local top-k per group BEFORE the
    exchange, so the shuffle carries O(groups * k) rows, not the corpus.
    Weights up to ~2^31 are safe from int64 overflow (w * 2^32)."""
    from pyspark.sql import Window as W

    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt), F.lit("|"),
                        F.col(id_col).cast("string"),
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        + 1
    )
    d = docs.select(
        F.col(by).alias("grp"),
        F.col(id_col),
        F.col(weight_col).cast("long").alias("weight"),
        u.alias("_u"),
    ).withColumn(
        "priority_q", F.expr("(weight * 4294967296L) div _u")
    )
    w = W.partitionBy("grp").orderBy(
        F.col("priority_q").desc(), F.col(id_col).asc()
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("grp", id_col, "weight", "priority_q", "rn")
    )


def capped_mixture(docs: DataFrame, budget_tokens: int,
                   weights: dict[str, int], max_epochs: int = 2,
                   by: str = "lang", default_weight: int = 1) -> DataFrame:
    """Data-constrained mixture allocation (the Muennighoff et al. 2023
    "scaling data-constrained LMs" regime): split a token budget across
    strata proportionally to integer ``weights``, but cap every stratum at
    ``max_epochs`` passes over its observed tokens — repeating a small
    source beyond a few epochs stops helping, so its excess share is
    water-filled onto the others.

    Exact capacitated proportional allocation (water-filling), closed form:
    sort strata by cap/weight ascending; the saturated set is the maximal
    prefix where ``cap_i * (W - cumw_{i-1}) <= w_i * (B - cumcap_{i-1})``
    (the lambda >= r_i test, cross-multiplied so it stays in int64 — no
    float in any decision); the rest get ``w_s * (B - C_m) div (W - V_m)``.
    The cap/weight SORT key is an IEEE double division — correctly rounded
    and therefore bit-identical on every engine — with ties broken on the
    stratum name; every allocated quantity is integer arithmetic.

    Scale shape: ONE map-side-combinable groupBy builds the per-stratum
    token counts — the only distributed work; its output is <=|strata|
    rows BY CONSTRUCTION, so the cutoff search runs on the driver (the
    same distributed-aggregate + driver-closed-form split as the graph
    ops' small-input fast path).  An all-Spark formulation costs ~5
    broadcast subplans of fixed job overhead to shuffle a 5-row frame.

    Output per stratum: observed tokens, weight, cap, ``alloc_tokens``,
    ``epochs_e4`` (allocated epochs on the e4 grid), ``saturated``.
    Int64-safe for budgets/caps up to ~2^62 / sum(weights)."""
    from sparkx.ops.textstats import token_count

    rows = (
        docs.groupBy(F.col(by).alias("stratum"))
        .agg(F.sum(token_count()).cast("long").alias("n_tokens"))
        .collect()
    )
    strata = sorted(
        (
            (
                r["stratum"],
                int(r["n_tokens"]),
                int(weights.get(r["stratum"], default_weight)),
                int(max_epochs) * int(r["n_tokens"]),
            )
            for r in rows
        ),
        key=lambda r: (r[3] / r[2], r[0]),  # IEEE-exact sort key + tie-break
    )
    b = int(budget_tokens)
    w_all = sum(r[2] for r in strata)
    c_m = v_m = m = 0
    for i, (_, _, w, cap) in enumerate(strata, start=1):
        if cap * (w_all - v_m) <= w * (b - c_m):
            m, c_m, v_m = i, c_m + cap, v_m + w
        else:
            break
    out = []
    for i, (stratum, n_tokens, w, cap) in enumerate(strata, start=1):
        alloc = cap if i <= m else w * (b - c_m) // (w_all - v_m)
        out.append(
            (
                stratum,
                n_tokens,
                w,
                cap,
                alloc,
                alloc * 10000 // n_tokens if n_tokens else 0,
                i <= m,
            )
        )
    return docs.sparkSession.createDataFrame(
        out,
        "stratum string, n_tokens long, w long, cap long, "
        "alloc_tokens long, epochs_e4 long, saturated boolean",
    )


def ccnet_buckets(docs: DataFrame, buckets: int = 3,
                  exact: bool = True) -> DataFrame:
    """CCNet perplexity bucketing (Wenzek et al., LREC 2020): per language,
    rank documents by their self-trained LM score and cut the ranking into
    ``buckets`` equal-population tiers — CCNet's head/middle/tail split
    that downstream corpus builds weight or drop (tail = highest
    perplexity = noisiest).  Returns ``(doc_id, lang, avg_logprob, tier,
    tier_name)`` with tier 1 = head (best).  ``tier_name`` is
    head/middle/tail for the canonical 3-way split, ``t<k>`` otherwise.

    Execution, two modes:

    * ``exact=True`` (oracle gate): ``ntile(buckets)`` over a per-language
      window ordered by the tie-free total order (avg_logprob DESC, doc_id)
      — deterministic because the LM score is already on the 1e-6 integer
      grid.  A per-language window is a per-language global sort; fine at
      verification scale.
    * ``exact=False`` (100-TB shape): no global sort — per-language tier
      CUTOFFS from an ``approx_percentile`` sketch (map-side-combinable, one
      bounded shuffle of sketch state), broadcast back onto the doc stream
      as a range lookup: a narrow map over the corpus.  Tier POPULATIONS are
      then approximate at the cutoff boundaries (sketch-error docs land one
      tier off), which is exactly the trade CCNet itself makes on shards.
    """
    from sparkx.ops.textstats import unigram_logprob

    lp = unigram_logprob(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    names = (
        F.when(F.col("tier") == 1, "head")
        .when(F.col("tier") == buckets, "tail")
        .otherwise("middle")
        if buckets == 3
        else F.concat(F.lit("t"), F.col("tier"))
    )
    if exact:
        from pyspark.sql import Window as W

        w = W.partitionBy("lang").orderBy(
            F.col("avg_logprob").desc(), F.col("doc_id")
        )
        tiered = lp.withColumn("tier", F.ntile(buckets).over(w))
    else:
        probs = [i / buckets for i in range(1, buckets)]
        cuts = lp.groupBy("lang").agg(
            F.expr(
                f"approx_percentile(-avg_logprob, array({', '.join(map(str, probs))}), 10000)"
            ).alias("cuts")
        )
        tier = F.lit(1)
        for i in range(len(probs)):
            tier = tier + F.when(-F.col("avg_logprob") > F.col("cuts")[i], 1).otherwise(0)
        tiered = lp.join(F.broadcast(cuts), "lang").withColumn("tier", tier)
    return tiered.select(
        "doc_id", "lang", "avg_logprob", "tier", names.alias("tier_name")
    )


def profile_columns(df: DataFrame, columns: list[str] | None = None,
                    exact: bool = True) -> DataFrame:
    """Single-scan dataset profiler — the ingest-time audit every pipeline
    runs before trusting a new drop: per column, row count, null count,
    distinct count, and min/max (cast to string so one schema fits every
    column type).  Returns one row per profiled column:
    ``(col_name, n_rows, n_nulls, n_distinct, min_s, max_s)``.

    Execution: ONE aggregate node computes all per-column measures in a
    single pass over the scan, then a ``stack``(unpivot) reshapes the 1-row
    wide result into the per-column report — the input is never rescanned
    per column (the naive loop-over-columns profiler is k scans).
    ``exact=True`` uses ``count_distinct`` (Catalyst plans one Expand — k×
    row multiplication before partial aggregation — the oracle-gate mode);
    the 100-TB default for wide tables is ``exact=False`` →
    ``approx_count_distinct`` (HLL++, Heule et al. 2013): no Expand, plain
    map-side-combinable partials, ±2% on distincts.  min/max are computed
    on the NATIVE type, then cast — lexicographic min of a numeric column
    would be wrong, and doubles would need grid formatting (profile integer
    and string columns; that covers every gate table)."""
    cols = columns or df.columns
    nd = F.count_distinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            nd(F.col(c)).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__mn"),
            F.max(c).cast("string").alias(f"{c}__mx"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__mn, {c}__mx" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS "
            f"(col_name, _nn, n_distinct, min_s, max_s)"
        ),
        F.col("_n").alias("n_rows"),
    ).select(
        "col_name",
        "n_rows",
        (F.col("n_rows") - F.col("_nn")).alias("n_nulls"),
        "n_distinct",
        "min_s",
        "max_s",
    )


def stratified_fixed_k(
    docs: DataFrame,
    k: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "stratk0",
) -> DataFrame:
    """Fixed-BUDGET stratified sample: exactly ``min(k, |stratum|)`` docs
    per group, picked in deterministic hash order (``md5(salt|id)``, id
    tiebreak) — the balanced-subset constructor for eval sets and ablation
    corpora where "500 docs per language" is the spec, not a rate (the
    rate-based `deterministic_sample`/`stratified_sample` cannot promise an
    exact count).  Same salt → same picks on any engine/run; adding new
    docs only ever displaces picks at the hash boundary.

    Execution: a rank-limit window per group.  Spark plans the ``rank <=
    k`` filter as WindowGroupLimit — each map task keeps only its local
    top-k per group BEFORE the shuffle, so a mega-stratum ships k rows per
    input partition, not the whole group, and the final per-group task
    merges bounded inputs.  Returns the sampled rows plus ``pick_order``
    (1..k within the stratum).
    """
    from pyspark.sql import Window

    hkey = F.md5(
        F.concat(F.lit(salt), F.lit("|"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(group_col).orderBy(hkey.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("pick_order", F.row_number().over(w))
        .filter(F.col("pick_order") <= k)
        .withColumn("pick_order", F.col("pick_order").cast("int"))
    )


def shard_assign(
    docs: DataFrame,
    n_shards: int = 8,
    key_col: str = "doc_id",
    salt: str = "shard0",
    strict: bool = False,
) -> DataFrame:
    """Deterministic balanced shard-writer assignment: every doc gets a
    ``shard`` in [0, n_shards) and a ``pos`` (0-based) giving its position
    within that shard under a reproducible global shuffle — the final
    "shuffle + shard" step of every training-corpus pipeline (the trainer
    streams shard files in ``pos`` order and sees a fixed pseudo-random
    document permutation, independent of input partitioning or cluster
    size; same salt → byte-identical shard layout on any engine/run).

    Execution: ONE hash exchange on ``shard`` + a per-shard local sort for
    the ``row_number`` — exactly the minimum a shard writer needs (the
    physical analogue is ``repartition(n, shard).sortWithinPartitions``).
    There is no global sort and no driver state; at 100 TB you raise
    ``n_shards`` until a shard's rows fit an executor's sort spill budget
    (10k shards of ~10 GB, not 8 of ~12 TB).  NULL keys coalesce to a
    sentinel so they are assigned, not dropped; the window tiebreak pins
    NULLS LAST explicitly because Spark's ``asc`` default (NULLS FIRST)
    and DuckDB/ANSI (NULLS LAST) disagree.

    ``key_col`` MUST be unique (it is the document identity): duplicate
    keys — including a second NULL — share one md5, tie on BOTH window
    order keys, and row_number then breaks the tie by partition arrival
    order, which is NOT reproducible across runs/engines.  Dedup (or
    uniquify) upstream; the determinism guarantee holds only for keyed
    rows.  ``strict=True`` enforces the precondition eagerly (one extra
    count-distinct job — two cheap aggregates, no wide payload) and raises
    on any duplicate or second-NULL key: the whole point of the op is
    reproducibility, so a pipeline that cannot guarantee uniqueness
    upstream should pay the check rather than ship a silently
    arrival-ordered shard layout.
    """
    from pyspark.sql import Window

    if strict:
        r = docs.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col(key_col)).alias("d"),
            F.sum(F.col(key_col).isNull().cast("long")).alias("nulls"),
        ).collect()[0]
        if r.d + min(r.nulls or 0, 1) != r.n:
            raise ValueError(
                f"shard_assign(strict=True): key_col {key_col!r} is not "
                f"unique ({r.n} rows, {r.d} distinct non-NULL, "
                f"{r.nulls or 0} NULL) — pos would be partition-arrival-"
                f"ordered and non-reproducible. Dedup upstream."
            )

    hh = F.md5(
        F.concat(
            F.lit(salt), F.lit("|"),
            F.coalesce(F.col(key_col).cast("string"), F.lit("∅")),
        )
    )
    keyed = docs.select(F.col(key_col), hh.alias("_h"))
    shard = (
        F.conv(F.substring(F.col("_h"), 1, 8), 16, 10).cast("long")
        % n_shards
    ).cast("int")
    w = Window.partitionBy("shard").orderBy(
        F.col("_h").asc(), F.col(key_col).asc_nulls_last()
    )
    return (
        keyed.withColumn("shard", shard)
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("_h")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Recrawl / corpus-refresh delta between two snapshots of the same
    logical table: per key, status ``added`` (new only), ``removed`` (old
    only), ``changed`` (both, content fingerprint differs) or
    ``unchanged`` — the op an incremental ingest runs so downstream
    (re-dedup, re-embed, re-index) touches only the delta instead of
    reprocessing 100 TB per crawl.

    Content identity is ``md5`` of the text with NULL coalesced to a
    sentinel distinct from the empty string (NULL text and '' are
    different contents).  Execution: one fingerprint projection per side
    (narrow map) + ONE full-outer shuffle join on the key — and when both
    snapshots are bucketed by ``key_col`` (the natural layout for a
    versioned corpus) the exchange is elided entirely and the diff is a
    co-located merge per bucket.
    """
    fp = lambda c: F.md5(F.coalesce(F.col(c), F.lit("∅null")))  # noqa: E731
    of = old.select(F.col(key_col), fp(text_col).alias("old_fp"))
    nf = new.select(F.col(key_col), fp(text_col).alias("new_fp"))
    j = of.join(nf, key_col, "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col(key_col), status.alias("status"), "old_fp", "new_fp")


def hll_batch_sketches(
    docs: DataFrame,
    batch_col: str = "batch",
    by: str = "lang",
    lg_k: int = 12,
) -> DataFrame:
    """Per-(ingest-batch, group) mergeable HLL distinct-content sketches
    (Apache DataSketches via ``hll_sketch_agg``), stored as BINARY — the
    "sketch as data" half of incremental corpus stats: each ingest batch
    builds its sketches once, persists them (a few KB per group), and
    every later report merges binaries instead of rescanning 100 TB of
    history.  Map-side combinable aggregate, one bounded shuffle on
    (batch, group).

    The other half is :func:`hll_merge_stats`.  Contrast
    :func:`distinct_stats`, whose ``approx_count_distinct`` sketch lives
    only inside one job — these sketches OUTLIVE the job, which is what
    makes the stats incremental across ingests."""
    from sparkx.ops.textstats import fingerprint

    d = docs.select(
        F.col(batch_col), F.col(by).alias("grp"), fingerprint("text").alias("fp")
    )
    return d.groupBy(batch_col, "grp").agg(
        F.hll_sketch_agg("fp", F.lit(lg_k)).alias("sketch"),
        F.count("*").alias("n_docs"),
    )


def hll_merge_stats(sketches: DataFrame, by: str = "grp") -> DataFrame:
    """Merge persisted per-batch HLL sketches into per-group distinct
    estimates (``hll_union_agg`` → ``hll_sketch_estimate``) — the report
    side of incremental corpus stats.  Input is the (tiny) sketch table,
    never the corpus: the merge is exact over sketch state, so
    union(batch sketches) estimates IDENTICALLY to one sketch built over
    the whole corpus (pytest-pinned).

    Estimate semantics: DataSketches HLL is EXACT while a group's
    cardinality keeps the sketch in sparse (coupon-list) mode — which
    covers the sf0.01 oracle gate, where the estimate equals
    count(DISTINCT fp) — and carries the usual ~1.6% (lg_k=12) relative
    error once promoted to dense at real scale, which is the point of the
    op.  Tolerance at dense scale is pytest-pinned separately."""
    return sketches.groupBy(by).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "n_distinct_merged"
        ),
        F.sum("n_docs").alias("n_docs"),
    )


def snapshot_drift(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    bucket_width: int = 32,
    n_buckets: int = 16,
) -> DataFrame:
    """Population-stability index (PSI) of the token-length distribution
    between two corpus snapshots — the drift monitor a recurring ingest
    runs next to :func:`snapshot_diff`: diff says WHICH docs changed, PSI
    says whether the corpus SHAPE moved (a new crawl source, a boilerplate
    regression, a truncation bug all shift the length histogram long
    before anyone reads samples).  PSI < 0.1 is the classic "stable"
    bound; > 0.25 is actionable drift.

    Buckets are fixed-width integer token-count bins
    (``least(tokens div width, n_buckets-1)``) — pure int64 arithmetic,
    not log2 bucketing, whose float boundaries (ln(8)/ln(2) =
    2.9999999999999996…) tie-break differently per engine.  Per-bucket
    contribution ``(p_new − p_old)·ln(p_new/p_old)`` with add-one
    smoothing over the FULL bucket spine (so empty buckets are defined),
    quantized to the 1e-6 grid per bucket (the bigram_logprob ln idiom)
    and emitted PER BUCKET — the caller sums ``psi_e6``; no cross-engine
    float accumulation ever happens inside the op.

    Execution: one narrow token-count map + one ≤``n_buckets``-row
    aggregate per side, a broadcast spine, and totals via an unpartitioned
    window over the joined ≤``n_buckets``-row frame — NOT a separate
    ``agg`` + crossJoin, which would reference the count subtree twice and
    double-evaluate it into FOUR corpus scans (caught by the r5 plan
    audit; the window's SinglePartition exchange ships ≤``n_buckets``
    rows).  The whole report is two corpus scans and constant-size
    state."""

    def counts(df: DataFrame, out: str) -> DataFrame:
        # the ONE canonical tokenizer (textstats.token_count) on the
        # NULL-coalesced column — an inline re-spelling could silently
        # diverge from every other token-count stat in the suite
        toks = token_count(F.coalesce(F.col(text_col), F.lit("")))
        # floor(int/width) is integer-valued, so the long cast is identical
        # under Spark's truncate and DuckDB's round — no cast ambiguity
        bucket = F.least(
            F.floor(toks / F.lit(bucket_width)), F.lit(n_buckets - 1)
        ).cast("long")
        return df.select(bucket.alias("bucket")).groupBy("bucket").agg(
            F.count("*").alias(out)
        )

    spark = old.sparkSession
    spine = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    j = (
        spine.join(counts(old, "n_old"), "bucket", "left")
        .join(counts(new, "n_new"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_old", F.lit(0).cast("long")).alias("n_old"),
            F.coalesce("n_new", F.lit(0).cast("long")).alias("n_new"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy()  # whole frame — ≤ n_buckets rows by construction
    jt = j.select(
        "*",
        F.sum("n_old").over(w).alias("t_old"),
        F.sum("n_new").over(w).alias("t_new"),
    )
    p_o = (F.col("n_old") + 1).cast("double") / (
        F.col("t_old") + n_buckets
    ).cast("double")
    p_n = (F.col("n_new") + 1).cast("double") / (
        F.col("t_new") + n_buckets
    ).cast("double")
    # round() on a raw double is normally the engine-parity trap (CLAUDE.md:
    # truncate grid-valued expressions instead), but it is safe here for the
    # same reason as ta_bigram_logprob's ln: the value is transcendental
    # (ln of a rational), so an exact .5 tie on the 1e-6 grid is
    # measure-zero — never round() a GRID-valued expression this way.
    psi_e6 = F.round((p_n - p_o) * F.log(p_n / p_o) * 1e6).cast("long")
    return jt.select(
        F.col("bucket").cast("int").alias("bucket"),
        "n_old",
        "n_new",
        psi_e6.alias("psi_e6"),
    )


def dialogue_windows(
    turns: DataFrame,
    budget: int = 120,
    target_role: str = "assistant",
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Training-example window assembly over conversation transcripts: for
    every ``target_role`` turn, the LONGEST contiguous suffix of preceding
    turns (plus the target) whose whitespace-token total fits ``budget`` —
    how chat corpora become supervised examples (one example per assistant
    turn, context = as much recent history as the sequence length allows).

    Pure integer math on the engine-pinned token count, so the driver gate
    hash-verifies it.  Per conversation: one window cumsum, one bounded
    groupBy collecting (turn_idx, prefix_tokens) structs — conversations
    are short (≤ thousands of turns) while corpora are wide (billions of
    conversations), so the per-conv array stays KB-sized no matter the
    corpus; all three wide ops hash on ``conv_col`` and AQE coalesces them
    onto one exchange.  The window start is found per target by filtering
    the conv's prefix-sum array (``prefix ≥ cum_target − budget``) — an
    O(turns) in-row scan, bound through an explode(array()) Generate
    barrier so CollapseProject cannot re-evaluate it per output column.

    Contract: the target turn is ALWAYS included; a single turn already
    over budget yields a one-turn example with ``fits = false`` (callers
    drop or truncate).  Returns ``(conv_col, idx_col, first_turn_idx,
    n_context_turns, context_tokens, fits)``.
    """
    from pyspark.sql import Window

    t = turns.select(
        F.col(conv_col),
        F.col(idx_col),
        F.col(role_col),
        token_count(text_col).cast("long").alias("_tok"),
    )
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    t = t.withColumn("_cum", F.sum("_tok").over(w)).withColumn(
        "_pre", F.col("_cum") - F.col("_tok")
    )
    arr = t.groupBy(conv_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(idx_col).alias("i"), F.col("_pre").alias("p")))
        ).alias("_arr")
    )
    tg = t.filter(F.col(role_col) == target_role).join(arr, conv_col)
    first_expr = F.coalesce(
        F.array_min(
            F.expr(
                f"transform(filter(_arr, x -> x.i <= {idx_col} "
                f"AND x.p >= _cum - {budget}), x -> x.i)"
            )
        ),
        F.col(idx_col),
    )
    tg = tg.select("*", F.explode(F.array(first_expr)).alias("first_turn_idx"))
    ctx_tokens = F.col("_cum") - F.array_min(
        F.expr("transform(filter(_arr, x -> x.i = first_turn_idx), x -> x.p)")
    )
    return tg.select(
        conv_col,
        idx_col,
        "first_turn_idx",
        F.size(
            F.expr(
                f"filter(_arr, x -> x.i >= first_turn_idx AND x.i <= {idx_col})"
            )
        ).cast("long").alias("n_context_turns"),
        ctx_tokens.alias("context_tokens"),
        (ctx_tokens <= budget).alias("fits"),
    )


def turn_boilerplate_strip(
    transcripts: DataFrame,
    min_share: float = 0.6,
    min_chars: int = 2,
) -> DataFrame:
    """Frequency-based boilerplate strip for TRANSCRIPTS — the CCNet/web
    freq-boiler rule (Wenzek et al. LREC 2020; html_extract.freq_boiler's
    idiom) applied to the turn table: a line that appears in ≥ ``min_share``
    of all conversations is template boilerplate (canned assistant openers,
    tool-output wrappers, system preambles), not content, and is stripped
    from EVERY turn.  This is the transcript-native extraction rung
    document-level dedup can't reach: at 10^12 turns the same preamble line
    sits in millions of conversations, poisoning n-gram stats and wasting
    tokens, while each containing turn is globally unique.

    Differs from :func:`sparkx.ops.dedup.line_dedup` (keep FIRST occurrence)
    in that ubiquity is measured per-CONVERSATION (df over conv_id, robust
    to one chatty conversation repeating a line) and frequent lines are
    dropped EVERYWHERE.

    Execution: posexplode lines → two-level map-side-combinable df
    aggregate ((lkey, conv) → lkey, never countDistinct in one hop) → the
    boilerplate set (tiny by construction: only lines above the share
    gate) broadcast into a LEFT ANTI join → ordered per-turn reassembly
    (array_sort(collect_list(struct)), the line_dedup idiom).  Shuffles
    carry (hash, conv_id, pos) triples, never line text twice.  The share
    gate crosses engines as an integer comparison (n_convs·10⁴ ≥
    share_e4·total_convs) — never a float ratio.

    Lines shorter than ``min_chars`` are exempt (kept verbatim, never
    counted): blank separators are formatting, not boilerplate.  NULL text
    behaves as '' (line_dedup's convention).  Returns one row per turn:
    ``(conv_id, turn_idx, role, clean_text, n_lines, n_dropped)``.
    """
    share_e4 = int(round(min_share * 10_000))
    lines = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        F.posexplode(
            F.split(F.coalesce(F.col("text"), F.lit("")), "\n")
        ).alias("pos", "line"),
    )
    elig = lines.filter(F.length("line") >= min_chars).withColumn(
        "lkey", F.md5(F.col("line"))
    )
    per_conv = elig.select("lkey", "conv_id").distinct()
    df_counts = per_conv.groupBy("lkey").agg(
        F.count(F.lit(1)).alias("n_convs")
    )
    total = transcripts.select(
        F.countDistinct("conv_id").alias("total_convs")
    )
    boiler = (
        df_counts.crossJoin(F.broadcast(total))
        .filter(
            F.col("n_convs") * F.lit(10_000)
            >= F.lit(share_e4) * F.col("total_convs")
        )
        .select("lkey")
    )
    kept = (
        elig.join(F.broadcast(boiler), "lkey", "left_anti")
        .select("conv_id", "turn_idx", "role", "pos", "line")
        .unionByName(lines.filter(F.length("line") < min_chars))
    )
    rebuilt = kept.groupBy("conv_id", "turn_idx", "role").agg(
        F.array_sort(F.collect_list(F.struct("pos", "line"))).alias("_arr"),
        F.count(F.lit(1)).alias("_kept"),
    )
    totals = lines.groupBy("conv_id", "turn_idx", "role").agg(
        F.count(F.lit(1)).alias("n_lines")
    )
    return totals.join(rebuilt, ["conv_id", "turn_idx", "role"], "left").select(
        "conv_id",
        "turn_idx",
        "role",
        F.coalesce(
            F.array_join(F.transform("_arr", lambda s: s["line"]), "\n"),
            F.lit(""),
        ).alias("clean_text"),
        F.col("n_lines").cast("long").alias("n_lines"),
        (
            F.col("n_lines") - F.coalesce(F.col("_kept"), F.lit(0))
        ).cast("long").alias("n_dropped"),
    )


def tool_chain_stats(
    transcripts: DataFrame,
    state_col: str = "tool",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Tool-invocation chain mining over agent transcripts: for consecutive
    tool turns within a conversation (ordered by ``order_col``), count every
    (tool_from → tool_to) transition corpus-wide, plus the number of
    distinct conversations exhibiting it — the Markov transition table an
    agent-pipeline owner reads to understand real workflows (and the
    curation signal for sampling conversations by workflow shape).  A
    conversation's FIRST tool call transitions from the pseudo-state
    ``START``, so entry-point frequencies ride the same table.

    Rows with NULL/empty ``state_col`` are not tool turns and are skipped
    (the chain links ACROSS them: user/assistant turns between two tool
    calls don't break the sequence).  ``order_col`` must be unique per
    conversation (the stable-turn-ordering invariant).

    Execution: one lag window per conversation — bounded by conversation
    length, the inherently sequential unit — then a map-side-combinable
    count plus a distinct-conv count over the (from, to) pairs.  Output is
    ≤ (n_tools+1)² rows regardless of corpus size.  Returns
    ``(tool_from, tool_to, n_transitions, n_convs)``.
    """
    from pyspark.sql import Window

    t = transcripts.filter(
        F.col(state_col).isNotNull() & (F.col(state_col) != "")
    )
    w = Window.partitionBy("conv_id").orderBy(order_col)
    pairs = t.select(
        "conv_id",
        F.coalesce(F.lag(state_col).over(w), F.lit("START")).alias(
            "tool_from"
        ),
        F.col(state_col).alias("tool_to"),
    )
    return pairs.groupBy("tool_from", "tool_to").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.countDistinct("conv_id").alias("n_convs"),
    )


def conv_loop_stats(
    turns: DataFrame,
    min_run: int = 3,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Stuck-loop detection over agent transcripts: per conversation, how
    many turns repeat the PREVIOUS turn's text verbatim and the longest
    consecutive run of identical turns — the signature of an agent retrying
    the same tool call / emitting the same apology until a step cap kills
    it.  Loop-y conversations are poison as training data (the model learns
    to repeat itself), so corpus builds gate on ``has_loop`` the same way
    they gate on Gopher rules.

    Classic gaps-and-islands, all on one ``(conv, idx)`` ordering: a turn
    is a repeat iff a previous turn exists and its text is null-safe-equal
    (two NULL-text turns DO extend a run — mirrored as
    ``IS NOT DISTINCT FROM``); island id = running count of run starts;
    run lengths fold to one row per conversation (``n_repeat_turns`` =
    ``n_turns − n_islands``, so the repeat count needs no second pass).
    Conversations are short while corpora are wide, so the window state is
    KB-bounded per key and the whole report is two partial-aggregated
    exchanges after the window's — no per-row Python, value-hash exact.

    Returns ``(conv_col, n_turns, n_repeat_turns, max_run, has_loop)``
    with ``has_loop = max_run ≥ min_run``.

    ``idx_col`` MUST be a unique within-conversation ordering (turn_idx is,
    by the transcript contract): duplicate indices make the lag pairing
    partition-arrival-ordered and non-reproducible across runs/engines —
    same precondition style as shard_assign's key uniqueness.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(conv_col).orderBy(idx_col)
    t = turns.select(conv_col, F.col(idx_col), F.col(text_col).alias("_tx"))
    t = t.withColumn(
        "_rep",
        (F.row_number().over(w) > 1)
        & F.col("_tx").eqNullSafe(F.lag("_tx").over(w)),
    )
    t = t.withColumn(
        "_isl", F.sum((~F.col("_rep")).cast("long")).over(w)
    )
    runs = t.groupBy(conv_col, "_isl").agg(F.count(F.lit(1)).alias("_run"))
    return runs.groupBy(conv_col).agg(
        F.sum("_run").alias("n_turns"),
        (F.sum("_run") - F.count(F.lit(1))).alias("n_repeat_turns"),
        F.max("_run").alias("max_run"),
        (F.max("_run") >= min_run).alias("has_loop"),
    )


def conv_role_qa(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
) -> DataFrame:
    """Chat-format well-formedness QA over transcripts: the checks an SFT
    pipeline runs before applying a chat template — per conversation, how
    many consecutive same-role turns break user/assistant alternation
    (``n_role_repeats`` — tool runs are exempt: multi-tool sequences are
    legal), how many tool turns appear without a preceding assistant call
    or tool chain (``n_orphan_tools``), whether the conversation opens
    with a user turn and closes with an assistant turn, and the composite
    ``well_formed`` gate.  Malformed conversations get dropped or repaired
    upstream of template rendering; this op puts numbers on how many.

    One lag window per conversation (bounded by conversation length — the
    inherently sequential unit) + one combinable aggregate; endpoints use
    ``min_by``/``max_by`` on the unique ``idx_col`` (DuckDB
    arg_min/arg_max — same semantics, unique ordering so no tie).  Same
    unique-``idx_col`` precondition as conv_loop_stats.

    Returns ``(conv_col, n_turns, n_role_repeats, n_orphan_tools,
    starts_with_user, ends_with_assistant, well_formed)``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(conv_col).orderBy(idx_col)
    t = turns.select(conv_col, F.col(idx_col), F.col(role_col).alias("_r"))
    t = t.withColumn("_prev", F.lag("_r").over(w))
    repeat = (
        F.col("_prev").isNotNull()
        & (F.col("_r") == F.col("_prev"))
        & (F.col("_r") != "tool")
    ).cast("long")
    orphan = (
        (F.col("_r") == "tool")
        & ~F.coalesce(F.col("_prev").isin("assistant", "tool"), F.lit(False))
    ).cast("long")
    return (
        t.groupBy(conv_col)
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(repeat).alias("n_role_repeats"),
            F.sum(orphan).alias("n_orphan_tools"),
            (F.min_by("_r", idx_col) == "user").alias("starts_with_user"),
            (F.max_by("_r", idx_col) == "assistant").alias("ends_with_assistant"),
        )
        .select(
            "*",
            (
                (F.col("n_role_repeats") == 0)
                & (F.col("n_orphan_tools") == 0)
                & F.col("starts_with_user")
                & F.col("ends_with_assistant")
            ).alias("well_formed"),
        )
    )


def preference_pairs(
    cands: DataFrame,
    group_col: str = "conv_id",
    id_col: str = "turn_idx",
    text_col: str = "text",
    quality_col: str | None = None,
) -> DataFrame:
    """Best-of-n preference-pair harvest (the DPO/RLHF-data construction
    step): given multiple candidate completions per prompt group, emit one
    ``(chosen, rejected)`` pair per group — chosen = highest-quality
    candidate, rejected = lowest — with the quality margin.  Groups whose
    candidates all tie on quality are dropped (a zero-margin pair teaches a
    preference model nothing, and keeping it would make the pair selection
    tiebreak-order-dependent).

    Quality is ``quality_col`` if the table already carries a score (the
    corpus-scale path — the curation pass scored every doc), else the
    deterministic :func:`sparkx.ops.textstats.quality_score` inline.

    ``id_col`` MUST be numeric and unique within a group (the min-id
    tiebreak rides ``−id`` inside the pick struct, same precondition as
    cluster_canonical; checked eagerly).  Both picks are single
    ``max_by``/``min_by`` aggregates over a lexicographic struct — one
    map-side-combinable groupBy, no Window, so a hot prompt group (10k
    sampled completions) costs a combiner, not a single-task sort.

    Returns ``(group_col, n_candidates, chosen_id, chosen_q, rejected_id,
    rejected_q, margin_e4)`` — margin on the 1e-4 integer grid (quality is
    4-dp by construction, so the scaled difference is integer-valued; never
    ``round()`` a mid-grid float cross-engine).
    """
    from sparkx.ops.textstats import quality_score

    _NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}
    id_type = dict(cands.dtypes).get(id_col)
    if id_type not in _NUMERIC and not str(id_type).startswith("decimal"):
        raise ValueError(
            f"preference_pairs requires a numeric id_col for the -id "
            f"tiebreak; got {id_col}: {id_type}. Hash string ids to a long "
            f"(e.g. xxhash64) first."
        )

    q_expr = (
        F.col(quality_col) if quality_col is not None
        else quality_score(text_col)
    )
    labeled = cands.select(
        group_col,
        F.col(id_col),
        F.coalesce(q_expr, F.lit(-1.0)).alias("q"),
    )
    agg = labeled.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.max_by(
            id_col, F.struct(F.col("q"), (-F.col(id_col)).alias("_n"))
        ).alias("chosen_id"),
        F.max("q").alias("chosen_q"),
        F.min_by(
            id_col, F.struct(F.col("q"), F.col(id_col).alias("_i"))
        ).alias("rejected_id"),
        F.min("q").alias("rejected_q"),
    )
    return agg.filter(F.col("chosen_q") > F.col("rejected_q")).select(
        group_col,
        "n_candidates",
        "chosen_id",
        "chosen_q",
        "rejected_id",
        "rejected_q",
        F.round((F.col("chosen_q") - F.col("rejected_q")) * F.lit(10000.0))
        .cast("long")
        .alias("margin_e4"),
    )


def sft_render_offsets(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    loss_role: str = "assistant",
) -> DataFrame:
    """Chat-template rendering with per-turn loss-mask character offsets —
    the step between transcript curation and SFT tokenization: each
    conversation renders to ``⊕ "<|" role "|>" text "\\n"`` in turn order,
    and the trainer masks loss to the ``loss_role`` turns' spans.  Emitting
    ``[start_off, end_off)`` offsets instead of the rendered megastring
    keeps the shuffle payload at metadata width (two longs + a bool per
    turn, not a re-copy of the corpus text) — the render itself is a
    deferred concat the tokenizer does per conversation.

    One cumulative-sum window per conversation (the inherently sequential
    unit) over an integer length column; ``start = cum − len`` so a single
    running total yields both edges.  Offsets count characters
    (codepoints), matching both engines' ``length()``.

    Returns ``(conv_col, idx_col, role_col, turn_len, start_off, end_off,
    loss_mask)``.
    """
    from pyspark.sql import Window

    # template chars: "<|" (2) + "|>" (2) + "\n" (1) = 5
    rendered_len = (
        F.length(F.col(role_col))
        + F.length(F.coalesce(F.col(text_col), F.lit("")))
        + F.lit(5)
    ).cast("long")
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    t = turns.select(
        conv_col, idx_col, role_col, rendered_len.alias("turn_len")
    ).withColumn("end_off", F.sum("turn_len").over(w))
    return t.select(
        conv_col,
        idx_col,
        role_col,
        "turn_len",
        (F.col("end_off") - F.col("turn_len")).alias("start_off"),
        "end_off",
        (F.col(role_col) == loss_role).alias("loss_mask"),
    )


def pack_efficiency(
    docs: DataFrame,
    budget_tokens: int = 2048,
    n_shards: int = 64,
    by: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-efficiency report of the :func:`pack_assignments` layout — the
    numbers a pretraining run reads before committing a packing config:
    per group, how many fixed-budget training sequences the token stream
    chunks into, how many pad tokens the final partial sequence of each
    writer shard wastes (concatenate-and-chunk wastes ONLY there — interior
    sequences are full by construction), the resulting fill rate, and how
    many documents straddle a sequence boundary (each straddle is an
    attention-fragmentation point; too many says the budget is small
    relative to document length).

    Pure integer arithmetic on the pack layout: per (group, shard) the
    stream length is ``Σ n_tokens``, sequences are ``ceil-div(budget)``,
    and a document straddles iff its first and last token land in
    different bins (``start div b ≠ (start+n−1) div b``).  Two bounded
    rollups over the per-doc frame — the expensive part (the ordered
    window) is pack_assignments itself, shard-parallel by design.

    Returns ``(grp, n_docs, n_shards_used, n_seqs, total_tokens,
    waste_tokens, fill_bp, n_straddle)`` — ``fill_bp`` on the basis-point
    integer grid (``total·10000 div capacity``), never a rounded float
    ratio.
    """
    b = int(budget_tokens)
    assigned = pack_assignments(
        docs, budget_tokens=b, n_shards=n_shards, by=by, id_col=id_col
    )
    straddle = (
        (F.col("n_tokens") > 0)
        & (
            F.expr(f"start_offset div {b}")
            != F.expr(f"(start_offset + n_tokens - 1) div {b}")
        )
    ).cast("long")
    per_shard = (
        assigned.groupBy("grp", "shard")
        .agg(
            F.count(F.lit(1)).alias("_docs"),
            F.sum("n_tokens").alias("_toks"),
            F.sum(straddle).alias("_straddle"),
        )
        .select(
            "grp", "_docs", "_toks", "_straddle",
            F.expr(f"(_toks + {b} - 1) div {b}").alias("_seqs"),
        )
    )
    return (
        per_shard.groupBy("grp")
        .agg(
            F.sum("_docs").alias("n_docs"),
            F.count(F.lit(1)).alias("n_shards_used"),
            F.sum("_seqs").alias("n_seqs"),
            F.sum("_toks").alias("total_tokens"),
            (F.sum("_seqs") * b - F.sum("_toks")).alias("waste_tokens"),
            F.sum("_straddle").alias("n_straddle"),
        )
        .select(
            "grp", "n_docs", "n_shards_used", "n_seqs", "total_tokens",
            "waste_tokens",
            F.expr(f"(total_tokens * 10000) div (n_seqs * {b})")
            .alias("fill_bp"),
            "n_straddle",
        )
    )


def epoch_schedule(
    docs: DataFrame,
    budget_tokens: int,
    max_epochs: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_col: str | None = None,
) -> DataFrame:
    """Data-constrained epoch-repeat allocation (the Muennighoff et al.
    "Scaling Data-Constrained Language Models" interface): given a token
    budget and a repeat ceiling, decide how many epochs each document is
    seen during training — the step that turns a curated corpus plus a
    compute budget into a sampling schedule.  Docs are ranked by quality
    (desc, ties → ``id_col`` asc) and the budget is filled in rank order
    with each doc reserving its full ``toks × max_epochs`` cap; the one
    doc straddling the budget gets the floor-partial epoch count
    (``(budget − cum_before) div toks``) and every doc past it gets 0.
    Budget-by-cap with a single straddler is the deterministic,
    prefix-sum-expressible contract (true remainder-carrying greedy is a
    sequential recurrence — not worth a non-mirrorable op for a ≤1-doc
    boundary difference).

    Scale shape: the global ranked cumsum is decomposed scan-sum style —
    quality lives on the 1e-4 grid, so (1) per-bucket cap totals are one
    map-side-combinable groupBy over ≤10 002 distinct ``q_e4`` values,
    (2) the bucket-level running total is a window over that bounded
    aggregate frame (rrf/zipf precedent — its SinglePartition exchange
    ships ≤10 002 rows, never the corpus), and (3) the within-bucket
    cumsum partitions by ``q_e4`` — NEVER a corpus-wide single-task
    window.  The decomposition equals the global cumsum exactly because
    the within-bucket order (``id_col`` asc) is the global tiebreak.

    Preconditions: ``id_col`` unique (duplicate ids make the running-sum
    frame order-dependent — the shard_assign precondition); token counts
    from the ONE canonical tokenizer.  All arithmetic is exact int64;
    the partial-epoch division only ever runs on a nonnegative numerator
    (engines disagree on negative integer division — the zipf_fit
    lesson).  NULL text coalesces to '' before tokenizing — ONE empty
    whitespace token, the canonical tokenizer's convention shared by
    every textstats op (never a special-cased 0); NULL quality scores −1
    (sorts last, q_e4 = −10000).  The ``toks <= 0`` branch is therefore
    defensive-only for caller-precomputed counts, not reachable from
    text.

    Returns ``(id_col, toks, q_e4, cum_before, repeats, sched_tokens)``.
    """
    from sparkx.session import spread_narrow_input

    docs = spread_narrow_input(docs)  # 1-task narrow scans serialize the map
    from pyspark.sql import Window

    e = int(max_epochs)
    b = int(budget_tokens)
    q_expr = (
        F.col(quality_col) if quality_col is not None
        else quality_score(text_col)
    )
    labeled = docs.select(
        F.col(id_col),
        token_count(F.coalesce(F.col(text_col), F.lit("")))
        .cast("long").alias("toks"),
        F.round(F.coalesce(q_expr, F.lit(-1.0)) * F.lit(10000.0))
        .cast("long").alias("q_e4"),
    ).withColumn("cap_toks", F.col("toks") * F.lit(e))
    bucket_tot = labeled.groupBy("q_e4").agg(
        F.sum("cap_toks").alias("_btot")
    )
    w_b = (
        Window.orderBy(F.desc("q_e4"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_before = bucket_tot.select(
        "q_e4",
        F.coalesce(F.sum("_btot").over(w_b), F.lit(0).cast("long"))
        .alias("_bb"),
    )
    w_in = (
        Window.partitionBy("q_e4").orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = labeled.join(F.broadcast(bucket_before), "q_e4").select(
        id_col, "toks", "q_e4",
        (
            F.col("_bb")
            + F.coalesce(F.sum("cap_toks").over(w_in), F.lit(0).cast("long"))
        ).alias("cum_before"),
    )
    repeats = (
        F.when(F.col("toks") <= 0, F.lit(0).cast("long"))
        .when(F.col("cum_before") >= b, F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.lit(e).cast("long"),
                F.expr(f"({b} - cum_before) div toks"),
            )
        )
    )
    return cum.select(
        id_col, "toks", "q_e4", "cum_before",
        repeats.alias("repeats"),
        (repeats * F.col("toks")).alias("sched_tokens"),
    )


def conv_sessions(
    turns: DataFrame,
    gap_sec: int = 60,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based session segmentation over agent transcripts: within each
    conversation a new *session* starts when the wall-clock gap to the
    previous turn exceeds ``gap_sec`` — the standard pre-step before
    per-session context assembly (a conversation resumed hours later should
    not leak the stale earlier context into a training window).  This is
    :func:`sparkx.ops.temporal.sessionize` re-keyed to the transcript
    contract (conv_id / turn_idx / ts) with per-session summary output.

    One window over ``(conv, idx)`` — epoch-seconds lag, gap > threshold (or
    first turn) marks a session start, running sum numbers the sessions
    0-based — then one combinable group-by fold to
    ``(conv_col, session_idx, n_turns, first_turn_idx, last_turn_idx,
    span_sec)``.  Timestamps go through ``cast("long")`` (epoch seconds,
    the sessionize convention) so span arithmetic is exact integer math on
    both engines.  Out-of-order timestamps yield a NEGATIVE gap, which is
    ``<= gap_sec`` and therefore extends the session — pinned by test so a
    clock hiccup never fragments a session.

    Scale shape: the window partitions by conversation — the inherently
    sequential unit, KB-bounded state per key — and the fold's keys refine
    the window's, so AQE sees a near-free second exchange over already-tiny
    partial aggregates.  Mega-conversation skew is the north-star's named
    hazard: the state here is O(1) per row (one lag), so even a 10M-turn
    conversation streams through a single task without blowup.

    ``idx_col`` MUST be a unique within-conversation ordering (same
    precondition as conv_loop_stats).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(conv_col).orderBy(idx_col)
    ep = F.col(ts_col).cast("long")
    t = turns.select(conv_col, F.col(idx_col), ep.alias("_ep"))
    gap = F.col("_ep") - F.lag("_ep").over(w)
    is_new = (gap.isNull() | (gap > gap_sec)).cast("long")
    t = t.withColumn(
        "session_idx", (F.sum(is_new).over(w) - 1).cast("int")
    )
    return t.groupBy(conv_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min(idx_col).alias("first_turn_idx"),
        F.max(idx_col).alias("last_turn_idx"),
        (F.max("_ep") - F.min("_ep")).alias("span_sec"),
    )


def merge_adjacent_turns(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Chat normalization: merge runs of CONSECUTIVE same-role turns within
    a conversation into one block — the standard pre-step before rendering
    chat templates (most formats require strict role alternation, and agent
    frameworks routinely emit split assistant messages: streamed halves,
    post-tool continuations, retry fragments).  Reference analog: the
    answer/revision turns are single logical messages even when the graph
    emits them in pieces (langgraph_pipeline.py's answer/revise nodes).

    Gaps-and-islands on one ``(conv, idx)`` window — a block starts where
    the role differs from the previous turn's (NULL-safe, so NULL-role runs
    merge too, same convention as conv_loop_stats) — then one group-by per
    block: texts joined with ``sep`` in turn order (NULL text contributes
    an empty string, exactly DuckDB's ``string_agg(coalesce(text,''))``),
    plus run length and the turn-idx span.  ``block_idx`` is 0-based per
    conversation, so ``(conv_col, block_idx)`` is the merged table's key
    and block order is the conversation order.

    Scale shape: the window partitions by conversation (KB-bounded
    sequential unit, O(1) lag state per row); the fold's keys refine the
    window partitioning.  The sort inside ``array_sort`` is per BLOCK
    (role runs — tens of rows), never per conversation.  The transform
    lambda is an interpreted HOF but runs once per OUTPUT row on an
    already-collected block array — the once-per-row regime CLAUDE.md's
    HOF rule allows.

    ``idx_col`` MUST be a unique within-conversation ordering (same
    precondition as conv_sessions/conv_loop_stats).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(conv_col).orderBy(idx_col)
    prev = F.lag(role_col).over(w)
    # the first turn is marked via lag(idx) IS NULL, NOT via the role
    # comparison: a conversation that STARTS with a NULL role would
    # otherwise read eqNullSafe(NULL, NULL-lag) = true and open at block
    # −1 (caught by the mirror test)
    first = F.lag(idx_col).over(w).isNull()
    is_new = (first | ~F.col(role_col).eqNullSafe(prev)).cast("long")
    t = turns.select(
        conv_col,
        F.col(idx_col),
        F.col(role_col),
        F.coalesce(F.col(text_col), F.lit("")).alias("_txt"),
    ).withColumn("block_idx", (F.sum(is_new).over(w) - 1).cast("int"))
    return t.groupBy(conv_col, "block_idx").agg(
        F.min(role_col).alias(role_col),  # constant within a block
        F.count(F.lit(1)).alias("n_merged"),
        F.min(idx_col).alias("first_turn_idx"),
        F.max(idx_col).alias("last_turn_idx"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col(idx_col).alias("i"), F.col("_txt").alias("t"))
                    )
                ),
                lambda x: x["t"],
            ),
            sep,
        ).alias("text"),
    )


def split_leakage(
    pairs: DataFrame,
    splits: DataFrame,
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Split-leakage audit: given a near-dup pair frame (``a_id``/``b_id``,
    any producer — MinHash-LSH at scale) and a split assignment, count pair
    edges by unordered split pair — the after-the-fact check that
    quantifies exactly the eval contamination :func:`cluster_split` exists
    to prevent (a doc-keyed :func:`split_assign` WILL show non-zero
    ``is_leak`` rows whenever near-dups exist; a cluster-atomic split must
    show zero).  Trust-but-verify for the split layer: run it after every
    corpus build, alert on any leak edge.

    Execution: two hash equi-joins attach each endpoint's split (the split
    frame is corpus-sized on one side and the pair frame is the post-LSH
    candidate set on the other — both shuffles are on the doc key, and AQE
    broadcasts the pair side when the dup set is small), then an unordered
    ``least/greatest`` normalization and a ≤|splits|²-row aggregate.  No
    driver state; output is constant-size.
    """
    a = splits.select(F.col(id_col).alias("a_id"), F.col(split_col).alias("_sa"))
    b = splits.select(F.col(id_col).alias("b_id"), F.col(split_col).alias("_sb"))
    j = pairs.select("a_id", "b_id").join(a, "a_id").join(b, "b_id")
    return (
        j.select(
            F.least("_sa", "_sb").alias("split_a"),
            F.greatest("_sa", "_sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_edges"))
        .withColumn("is_leak", F.col("split_a") != F.col("split_b"))
    )


def global_order(
    docs: DataFrame,
    n_shards: int = 256,
    key_col: str = "doc_id",
    salt: str = "order0",
    strict: bool = False,
) -> DataFrame:
    """Reproducible GLOBAL training-order permutation: every doc gets a
    single ``global_pos`` in [0, N) under a deterministic hash shuffle —
    the trainer-visible total order (:func:`shard_assign` fixes each
    shard's internal order; this op additionally fixes the order ACROSS
    shards, so "document #573,214 of the run" is a stable identity for
    resume/repro/debugging regardless of cluster size or input layout).

    Scan-sum decomposition — never a corpus-wide single-task window:
    (1) :func:`shard_assign` gives ``(shard, pos)`` (one hash exchange +
    per-shard local sort); (2) shard sizes are recounted from a NARROW
    re-derivation of the shard key (md5 of the key column only — a second
    scan of one pruned column, deliberately NOT a second reference to the
    window output, which Spark would re-evaluate wholesale: the cur_drift
    double-eval lesson); (3) the ≤``n_shards``-row count frame gets
    cumulative offsets via an unpartitioned window (bounded by
    construction) and broadcast-joins back: ``global_pos = offset + pos``.
    Same salt → byte-identical permutation on any engine, run, or cluster.

    The permutation ranks by ``(shard, md5)`` — shard is a hash RESIDUE,
    not a hash-prefix range, so this is not md5-sorted order; it is still
    a fixed pseudo-random permutation, which is the contract.  ``key_col``
    uniqueness precondition and ``strict`` are inherited from
    :func:`shard_assign`.
    """
    assigned = shard_assign(
        docs, n_shards=n_shards, key_col=key_col, salt=salt, strict=strict
    )
    # narrow re-derivation of the shard id for counting (no window subtree)
    hh = F.md5(
        F.concat(
            F.lit(salt), F.lit("|"),
            F.coalesce(F.col(key_col).cast("string"), F.lit("∅")),
        )
    )
    shard = (
        F.conv(F.substring(hh, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    counts = (
        docs.select(shard.alias("shard"))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # ≤ n_shards rows by construction — the single partition is fine
    offsets = counts.select(
        "shard",
        F.coalesce(F.sum("_n").over(w), F.lit(0)).cast("long").alias("_off"),
    )
    return assigned.join(F.broadcast(offsets), "shard").select(
        key_col,
        "shard",
        "pos",
        (F.col("_off") + F.col("pos")).cast("long").alias("global_pos"),
    )


def mix_plan(
    docs: DataFrame,
    weights: dict,
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Mixture planner: given target mixture ``weights`` (relative integer
    parts per source) and a total token ``budget_tokens``, compute per
    OBSERVED source the available token supply and the plan to hit the
    target — the arithmetic every training-mix spec sheet runs before
    :func:`capped_mixture` executes it:

    - ``avail_tokens`` — canonical token count summed over the source;
    - ``target_tokens`` — ``(budget × weight) div Σweights`` (truncating
      integer division, the parity rule — allocations may undershoot the
      budget by < |sources| tokens, never overshoot);
    - ``rate_e6`` — the deterministic sampling rate on the e6 grid,
      capped at 1e6 (downsampling plans cap; upsampling shows 1e6 and
      expresses the rest through epochs);
    - ``epochs`` — ``ceil(target / avail)`` via integer arithmetic: how
      many passes over the source the trainer schedules when the target
      exceeds supply (the data-constrained case
      :func:`epoch_schedule` allocates in detail).

    Sources observed in the corpus but absent from ``weights`` get weight
    0 (target 0 — explicitly excluded, visible in the plan rather than
    silently dropped); weights for sources with no corpus rows produce no
    row — the plan is over observed supply.  Execution: one map-side
    tokenize + per-source combinable sum (|sources| rows out), then pure
    column arithmetic against the broadcast weight MAP literal — no join,
    no second pass; at 100 TB this is one scan.
    """
    from sparkx.ops.textstats import token_count

    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    sum_w = sum(weights.values())
    if sum_w <= 0:
        raise ValueError("weights must sum to a positive value")
    wmap = F.create_map(
        *[F.lit(x) for k, v in sorted(weights.items()) for x in (k, int(v))]
    )
    agg = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(token_count(F.coalesce(F.col(text_col), F.lit(""))))
        .cast("long")
        .alias("avail_tokens")
    )
    w = F.coalesce(wmap[F.col("source")], F.lit(0)).cast("long")
    tgt = F.expr(
        f"(CAST({int(budget_tokens)} AS BIGINT) * weight) div {int(sum_w)}"
    ).cast("long")
    return (
        agg.withColumn("weight", w)
        .withColumn("target_tokens", tgt)
        .select(
            "source",
            "avail_tokens",
            "weight",
            "target_tokens",
            F.when(
                F.col("avail_tokens") > 0,
                F.least(
                    F.lit(1_000_000).cast("long"),
                    F.expr("(target_tokens * 1000000) div avail_tokens"),
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rate_e6"),
            F.when(
                (F.col("avail_tokens") > 0) & (F.col("target_tokens") > 0),
                F.expr(
                    "(target_tokens + avail_tokens - 1) div avail_tokens"
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("epochs"),
        )
    )


def interleave_order(
    docs: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "il0",
    n_shards: int = 256,
) -> DataFrame:
    """Deterministic proportional source interleaving — the training-order
    writer's answer to "which source at position p?": each source's docs
    are spread EVENLY through [0, N) (low-discrepancy stratified spacing,
    not a biased coin flip), so a mixture reads as locally well-mixed at
    every scale — no source droughts, no bursts — and the whole layout is
    reproducible from ``salt`` alone.  :func:`global_order` fixes ONE
    uniform permutation; this op fixes the canonical MIXTURE order
    (sources interleave by their size ratio; :func:`mix_plan` decides the
    sizes upstream).

    Math, all on the exact integer grid: source ``s`` with ``n`` docs
    gives its rank-``r`` doc (a deterministic per-source md5 shuffle) the
    stratified key ``key_e12 = floor((2r+1)·10¹² / (2n))`` — the midpoint
    of the r-th of n equal slots.  The global order is (key_e12, source,
    key); ``global_pos`` enumerates it WITHOUT a corpus-wide window:
    shards are contiguous key ranges (``shard = key_e12 div (10¹²/S)``),
    within-shard positions come from one shard-partitioned window, and
    the cross-shard offsets come from a CLOSED FORM — the number of
    source-``s`` keys below a boundary depends only on ``n``, never on
    which doc got which rank, so the count branch is |sources|×S rows of
    arithmetic, not a second pass over the corpus (and not a second
    evaluation of the rank window: the cur_drift lesson).

    Overflow discipline (the 100-TB part): ``(2r+1)·10¹²`` overflows
    int64 beyond ~4.6M docs/source, so the key is computed by exact
    two-step split — ``a = x·10⁶ div 2n; key = a·10⁶ + ((x·10⁶ mod 2n)·
    10⁶) div 2n`` (every intermediate ≤ 2n·10⁶: safe to ~4.6×10¹² docs
    per source), and the boundary counts factor the shard width out:
    ``#{r: key(r) < j·D} = #{r: S·(2r+1) < 2nj}`` — products bounded by
    2·S·n.  Both formulas are mirrored verbatim in the oracle.

    Returns ``(key_col, source, rank_in_source, key_e12, global_pos)``;
    ``global_pos`` is a total permutation of [0, N).  ``n_shards`` must
    divide 10¹² (any 2^a·5^b ≤ 10¹²); raise it until a shard's rows fit
    an executor sort.  NULL sources group together (one stratum), NULL
    keys follow :func:`shard_assign`'s sentinel convention.
    """
    from pyspark.sql import Window

    E = 10**12
    if E % n_shards != 0:
        raise ValueError("n_shards must divide 10^12 (use 2^a * 5^b)")
    d_width = E // n_shards
    hh = F.md5(
        F.concat(
            F.lit(salt), F.lit("|"),
            F.coalesce(F.col(key_col).cast("string"), F.lit("∅")),
        )
    )
    wsrc = Window.partitionBy(source_col).orderBy(
        F.col("_h").asc(), F.col(key_col).asc_nulls_last()
    )
    wcnt = Window.partitionBy(source_col)
    staged = (
        docs.select(
            F.col(key_col), F.col(source_col).alias("source"), hh.alias("_h")
        )
        .withColumn("rank_in_source", (F.row_number().over(wsrc) - 1).cast("long"))
        .withColumn("_n", F.count(F.lit(1)).over(wcnt).cast("long"))
    )
    # exact two-step key: x = 2r+1 < 2n; key = floor(x * 1e12 / (2n))
    staged = staged.withColumn(
        "key_e12",
        F.expr(
            "CAST((((2*rank_in_source+1) * 1000000) div (2*_n)) * 1000000 "
            "+ ((((2*rank_in_source+1) * 1000000) % (2*_n)) * 1000000) "
            "div (2*_n) AS BIGINT)"
        ),
    ).withColumn("_shard", F.expr(f"key_e12 div {d_width}").cast("int"))
    # NULLS LAST pinned on BOTH tiebreaks: Spark's asc default is NULLS
    # FIRST where DuckDB/ANSI is NULLS LAST (shard_assign's lesson)
    wshard = Window.partitionBy("_shard").orderBy(
        "key_e12",
        F.col("source").asc_nulls_last(),
        F.col(key_col).asc_nulls_last(),
    )
    positioned = staged.withColumn(
        "_pos", (F.row_number().over(wshard) - 1).cast("long")
    )
    # closed-form shard counts from (source, n) alone — never re-evaluates
    # the rank window.  c_below(j) = #{r in [0,n): S*(2r+1) < 2*n*j}
    sizes = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    S = n_shards
    # c_below(j) = #{r >= 0: 2r+1 <= q-1} clamped to n, with
    # q = ceil(2nj/S); that count is exactly q div 2 — NON-NEGATIVE by
    # construction, which matters: a (q-2) div 2 + 1 spelling goes
    # negative at q <= 1, where Spark's div truncates toward zero but
    # DuckDB's // floors (engine divergence on negatives)
    below = f"least(_n, ((2*_n*j + {S} - 1) div {S}) div 2)"
    per_shard = (
        sizes.select(
            "_n", F.explode(F.sequence(F.lit(0), F.lit(S - 1))).alias("j")
        )
        .select(
            F.col("j").alias("_shard"),
            (
                F.expr(below.replace("j", "(j+1)"))
                - F.expr(below)
            ).alias("_cnt"),
        )
        .groupBy("_shard")
        .agg(F.sum("_cnt").alias("_cnt"))
    )
    woff = Window.orderBy("_shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_shard.select(
        "_shard",
        F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).cast("long").alias("_off"),
    )
    return positioned.join(F.broadcast(offsets), "_shard").select(
        key_col,
        "source",
        "rank_in_source",
        "key_e12",
        (F.col("_off") + F.col("_pos")).cast("long").alias("global_pos"),
    )


def tool_latency_stats(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    tool_col: str = "tool",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-tool invocation timing over agent transcripts — the latency
    companion to :func:`tool_chain_stats`' transition table: for each tool,
    how long conversations run before its FIRST call (time-to-first,
    seconds from the conversation's first turn) and how far apart repeat
    calls sit (inter-call gap between consecutive same-tool turns in one
    conversation).  An agent-pipeline owner reads this to spot tools that
    only appear deep into long interactions or that get hammered in tight
    retry loops — both curation signals (sample by workflow tempo) and
    serving signals (prefetch/caching).

    All arithmetic on whole epoch seconds (``unix_timestamp`` /
    ``floor(epoch())`` — exact integers both engines), sums/extrema only —
    no float division anywhere, so the output is hash-gateable.

    Execution: the frame narrows to (conv, idx, tool, epoch) metadata
    width FIRST, then one unordered min-window per conversation (conv
    start) over the full cadence, a filter to tool turns, one lag window
    per (conversation, tool) over the much smaller filtered frame, and a
    map-side-combinable final aggregate of ≤ |tools| rows.  Two
    metadata-width exchanges total — never the corpus text.  ``idx_col``
    must be unique per conversation (the stable-turn-ordering invariant).
    Rows with NULL/empty ``tool_col`` are cadence-only (they anchor conv
    start but emit no tool rows).

    Returns ``(tool, n_calls, n_convs, min_ttf_s, max_ttf_s, sum_ttf_s,
    n_gaps, max_gap_s, sum_gap_s)``; gap columns are NULL for tools never
    called twice in one conversation.
    """
    from pyspark.sql import Window

    narrow = transcripts.select(
        F.col(conv_col).alias("_c"),
        F.col(idx_col).alias("_i"),
        F.col(tool_col).alias("_t"),
        F.unix_timestamp(F.col(ts_col)).cast("long").alias("_ep"),
    )
    w_conv = Window.partitionBy("_c")
    anchored = narrow.withColumn("_conv_start", F.min("_ep").over(w_conv))
    calls = anchored.filter(F.col("_t").isNotNull() & (F.col("_t") != ""))
    # NULLS LAST pinned: Spark's asc default is NULLS FIRST where
    # DuckDB/ANSI is NULLS LAST (shard_assign's lesson); a NULL idx row
    # in a multi-call group would otherwise order differently per engine
    w_tool = Window.partitionBy("_c", "_t").orderBy(
        F.col("_i").asc_nulls_last()
    )
    g = calls.select(
        "_c",
        "_t",
        (F.col("_ep") - F.col("_conv_start")).alias("_ttf"),
        (F.col("_ep") - F.lag("_ep").over(w_tool)).alias("_gap"),
        (F.row_number().over(w_tool) == 1).alias("_first"),
    )
    first_ttf = F.when(F.col("_first"), F.col("_ttf"))
    return g.groupBy(F.col("_t").alias("tool")).agg(
        F.count(F.lit(1)).alias("n_calls"),
        F.countDistinct("_c").alias("n_convs"),
        F.min(first_ttf).alias("min_ttf_s"),
        F.max(first_ttf).alias("max_ttf_s"),
        F.sum(first_ttf).alias("sum_ttf_s"),
        F.count("_gap").alias("n_gaps"),
        F.max("_gap").alias("max_gap_s"),
        F.sum("_gap").alias("sum_gap_s"),
    )


def budget_truncate(
    turns: DataFrame,
    budget_tokens: int = 256,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Context-budget truncation audit — what a fixed context window does
    to each conversation when the serving/training stack keeps the MOST
    RECENT turns: walking backward from the last turn, a turn survives iff
    the running token total through it still fits ``budget_tokens``
    (turn-atomic, the standard chat-truncation rule; a final turn larger
    than the whole budget is itself dropped — pinned by test).  The output
    quantifies truncation pressure per conversation so a budget can be
    chosen from data rather than folklore, and pairs with
    :func:`pack_efficiency` (which audits the packing direction).

    Tokens come from the ONE canonical whitespace tokenizer
    (:func:`sparkx.ops.textstats.token_count`) on the NULL-coalesced text
    — an inline re-spelling could silently diverge from every other token
    stat in the suite.  Counts and sums are exact longs; no floats.

    Execution: narrow to (conv, idx, tok) metadata width, ONE
    descending-ordered running-sum window per conversation (the
    inherently sequential unit, bounded by conversation length), then a
    map-side-combinable per-conversation aggregate.  One metadata-width
    exchange; the corpus text never shuffles.  ``idx_col`` must be unique
    per conversation (unique ordering makes the RANGE/ROWS window-frame
    distinction moot cross-engine).

    Returns ``(conv_col, n_turns, total_tokens, n_kept, tokens_kept,
    truncated)``.
    """
    from pyspark.sql import Window
    from sparkx.ops.textstats import token_count

    w = Window.partitionBy(conv_col).orderBy(F.col(idx_col).desc())
    t = turns.select(
        conv_col,
        F.col(idx_col),
        token_count(F.coalesce(F.col(text_col), F.lit(""))).cast("long").alias("_tok"),
    ).withColumn("_cum", F.sum("_tok").over(w))
    kept = F.col("_cum") <= F.lit(int(budget_tokens))
    return (
        t.groupBy(conv_col)
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("_tok").alias("total_tokens"),
            F.sum(kept.cast("long")).alias("n_kept"),
            F.sum(F.when(kept, F.col("_tok")).otherwise(F.lit(0))).alias(
                "tokens_kept"
            ),
        )
        .select(
            conv_col,
            "n_turns",
            "total_tokens",
            "n_kept",
            "tokens_kept",
            (F.col("n_kept") < F.col("n_turns")).alias("truncated"),
        )
    )


def crawl_plan(
    docs: DataFrame,
    weights: dict[str, int],
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Acquisition capacity planner — :func:`mix_plan` run BACKWARD through
    the cleaning funnel: mix_plan answers "given clean data, how much of
    each source goes in the mixture"; this answers the question the crawl
    team asks first — "how much RAW data must each source deliver so that
    after exact dedup and the Gopher battery, the mixture's per-source
    token demand is met?".  Per source, the funnel survival is measured
    from the corpus itself (unique-fingerprint rate × battery pass rate,
    both on the e4 grid), and the required raw volume is the ceiling
    division ``demand·10⁸ / (keep_bp·pass_bp)``.

    Estimation assumptions, stated because a planner is only honest about
    what it assumes: dedup-keep and quality-pass are treated as
    independent (measured marginally, multiplied), and document-level
    rates proxy token-level rates.  Both biases are corpus-measurable and
    the table carries the raw counts so a user can re-derive with their
    own model.  ``demand_tokens`` is the truncating proportional split
    ``weight·budget div Σweights`` (the mix_plan grid idiom).

    Weighted sources ABSENT from the corpus surface as infeasible rows
    (NULL rates, ``feasible`` false) rather than vanishing — the planner's
    job is exactly to flag the source that cannot deliver.

    Execution: ONE map-only pass (Gopher signals via
    :func:`~sparkx.ops.textstats.gopher_rules` ``select_all`` + the
    canonical fingerprint/token expressions in the same projection), one
    combinable per-source aggregate (count-distinct two-phase), and the
    ≤|sources|-row stats frame broadcast under the weights spine.  Output is
    |weights| rows at any corpus size; every intermediate fits int64
    (demand ≤ budget ≤ ~9·10¹⁰ → demand·10⁸ < 2⁶³).

    Returns ``(source, weight, n_docs, tokens_total, keep_bp, pass_bp,
    demand_tokens, raw_tokens_needed, feasible)``.
    """
    from sparkx.ops.textstats import fingerprint, gopher_rules, token_count

    total_w = sum(int(w) for w in weights.values())
    if total_w <= 0:
        raise ValueError("weights must sum to a positive total")
    spark = docs.sparkSession
    spine = spark.createDataFrame(
        [(s, int(w)) for s, w in sorted(weights.items())],
        "source string, weight long",
    )
    g = gopher_rules(docs, select_all=True, text_col=text_col)
    stats = (
        g.select(
            F.col(source_col).alias("source"),
            token_count(F.coalesce(F.col(text_col), F.lit("")))
            .cast("long")
            .alias("_tok"),
            fingerprint(text_col).alias("_fp"),
            F.col("keep").cast("long").alias("_k"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_tok").alias("tokens_total"),
            F.countDistinct("_fp").alias("_uniq"),
            F.sum("_k").alias("_pass"),
        )
    )
    # broadcast the STATS side: the preserved (left) side of a left join
    # cannot broadcast, and stats is equally bounded (≤|sources| rows)
    j = spine.join(F.broadcast(stats), "source", "left")
    keep_bp = F.expr("CAST((_uniq * 10000) DIV n_docs AS BIGINT)")
    pass_bp = F.expr("CAST((_pass * 10000) DIV n_docs AS BIGINT)")
    # integer DIV, never float-floor: weight*budget can exceed 2^53 where
    # a double silently loses exactness
    j = j.select(
        "source",
        "weight",
        F.col("n_docs"),
        "tokens_total",
        keep_bp.alias("keep_bp"),
        pass_bp.alias("pass_bp"),
        F.expr(
            f"CAST((weight * {int(budget_tokens)}) DIV {total_w} AS BIGINT)"
        ).alias("demand_tokens"),
    )
    surv = F.col("keep_bp") * F.col("pass_bp")
    raw = F.expr(
        "CAST((demand_tokens * 100000000 + keep_bp * pass_bp - 1) "
        "DIV (keep_bp * pass_bp) AS BIGINT)"
    )
    return j.select(
        "*",
        F.when(surv > 0, raw).alias("raw_tokens_needed"),
        F.coalesce(surv > 0, F.lit(False)).alias("feasible"),
    )


# high-precision literal alternations (the MOJIBAKE_RE idiom: no char
# classes, Java regex and RE2 read them identically); lowercased input
OUTCOME_ERROR_RE = (
    "error|exception|traceback|failed|failure|cannot |can't |unable to"
)
OUTCOME_APOLOGY_RE = (
    "i apologize|i'm sorry|i am sorry|unfortunately"
)
OUTCOME_DONE_RE = (
    "done|completed|finished|here is|here are|successfully"
)


def agent_outcomes(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Heuristic outcome labeling of agent conversations — the triage pass
    an RL/agent-data curation run does before anything model-based: the
    conversation's LAST assistant turn is the agent's closing statement,
    and high-precision literal markers classify it as ``error`` (failure
    talk), ``apology`` (the model gave up politely), ``done`` (completion
    talk), or ``unlabeled`` — with error > apology > done precedence, so
    "I'm sorry, the tool failed" reads as the failure it is.  Labels are
    routing evidence for a review queue and for outcome-stratified
    sampling (:func:`stratified_sample` on ``outcome``), not ground
    truth — the marker constants are module-level so a deployment tunes
    them in one place.

    A conversation with NO assistant turn gets ``outcome='no_assistant'``
    (a malformed-format signal that pairs with :func:`conv_role_qa`)
    rather than vanishing.  Flags ride along so the precedence can be
    re-derived downstream.

    Execution: filter to assistant turns, ONE map-side-combinable
    ``max_by`` per conversation (no window, no sort — the
    conv_role_qa endpoint idiom; ``idx_col`` must be unique per
    conversation), a right join back to the distinct-conv spine, then
    map-only regex flags on one short text per conversation.  Returns
    ``(conv_col, last_assistant_idx, has_error, has_apology, has_done,
    outcome)``.
    """
    a = transcripts.filter(F.col(role_col) == "assistant")
    last = a.groupBy(conv_col).agg(
        F.max(F.col(idx_col)).alias("last_assistant_idx"),
        F.max_by(F.col(text_col), F.col(idx_col)).alias("_t"),
    )
    spine = transcripts.select(conv_col).distinct()
    j = spine.join(last, conv_col, "left")
    low = F.lower(F.coalesce(F.col("_t"), F.lit("")))
    has_err = F.regexp_count(low, F.lit(OUTCOME_ERROR_RE)) > 0
    has_apo = F.regexp_count(low, F.lit(OUTCOME_APOLOGY_RE)) > 0
    has_done = F.regexp_count(low, F.lit(OUTCOME_DONE_RE)) > 0
    outcome = (
        F.when(F.col("last_assistant_idx").isNull(), F.lit("no_assistant"))
        .when(has_err, F.lit("error"))
        .when(has_apo, F.lit("apology"))
        .when(has_done, F.lit("done"))
        .otherwise(F.lit("unlabeled"))
    )
    return j.select(
        conv_col,
        "last_assistant_idx",
        has_err.alias("has_error"),
        has_apo.alias("has_apology"),
        has_done.alias("has_done"),
        outcome.alias("outcome"),
    )


def conv_lang_mix(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Per-conversation language-consistency audit — the multilingual
    transcript curation gate: a conversation whose turns flip language
    mid-stream is either genuine code-switching (keep, maybe upweight) or
    a session-stitching bug (drop), and either way a chat-template render
    wants to know.  Per conversation: per-language turn counts from the
    ONE canonical marker heuristic (:func:`~sparkx.ops.textstats.
    lang_id` — never an inline re-spelling), the dominant language under
    the same fixed LANG_ORDER tie precedence lang_id itself uses (en >
    de > fr > es > und), its share in truncating basis points, and the
    number of adjacent-turn language switches (the code-switch tempo).

    Because the language alphabet is CLOSED (LANG_ORDER + 'und'), the
    dominant pick needs no per-group sort or second window: per-language
    conditional sums ride ONE combinable aggregate and the argmax is a
    greatest()+CASE over five columns — the lang_id idiom lifted to the
    conversation level.  One metadata-width lag window per conversation
    (unique ``idx_col``, the stable-turn-ordering invariant) + one
    aggregate; the corpus text never shuffles.

    Returns ``(conv_col, n_turns, n_en, n_de, n_fr, n_es, n_und,
    dominant_lang, dominant_bp, n_switches)``.
    """
    from pyspark.sql import Window

    from sparkx.ops.textstats import LANG_ORDER, lang_id

    langs = list(LANG_ORDER) + ["und"]
    w = Window.partitionBy(conv_col).orderBy(F.col(idx_col).asc_nulls_last())
    t = turns.select(
        conv_col,
        F.col(idx_col),
        lang_id(text_col).alias("_lang"),
    ).withColumn("_prev", F.lag("_lang").over(w))
    agg = t.groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        *[
            F.sum((F.col("_lang") == lg).cast("long")).alias(f"n_{lg}")
            for lg in langs
        ],
        F.sum(
            (
                F.col("_prev").isNotNull() & (F.col("_lang") != F.col("_prev"))
            ).cast("long")
        ).alias("n_switches"),
    )
    best = F.greatest(*[F.col(f"n_{lg}") for lg in langs])
    dom = F.lit("und")
    for lg in reversed(langs[:-1]):  # earlier langs win ties → apply last
        dom = F.when(F.col(f"n_{lg}") == best, F.lit(lg)).otherwise(dom)
    return agg.select(
        conv_col,
        "n_turns",
        "n_en",
        "n_de",
        "n_fr",
        "n_es",
        "n_und",
        dom.alias("dominant_lang"),
        F.expr(
            # n_dom spelled via greatest inline: truncating bp share
            "CAST((greatest(n_en, n_de, n_fr, n_es, n_und) * 10000) "
            "DIV n_turns AS BIGINT)"
        ).alias("dominant_bp"),
        "n_switches",
    )


def turn_echo(
    turns: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    echo_threshold_e4: int = 2500,
) -> DataFrame:
    """Adjacent-turn echo/quotation audit — the extraction rung BETWEEN
    per-turn boilerplate (:func:`turn_boilerplate_strip`: lines frequent
    across conversations) and document dedup (:mod:`sparkx.ops.dedup`:
    whole-text near-dups): an assistant turn that largely restates the
    user turn it answers ("you asked X; X is…", tool-output parroting,
    quote-then-reply chat styles) carries little novel signal, and an SFT
    render that pays tokens for both sides of the echo trains the model to
    parrot.  Neither neighbouring op catches it: the echoed span is unique
    corpus-wide (so no line is globally frequent) and the two turns are
    different rows (so no document pair exists).

    Per adjacent turn pair (``idx_col`` order within a conversation — the
    stable-turn-ordering invariant), similarity is distinct-token-set
    Jaccard in truncating e4 fixed point: ``jac_e4 = (|A∩B|·10⁴) div
    max(|A∪B|,1)``.  Tokens are the house whitespace split (explicit
    ``[ \\t\\n\\x0b\\f\\r]+`` class — the Java/RE2-safe spelling, CLAUDE.md)
    WITHOUT lowercasing: quotation is literal reuse, and skipping
    ``lower()`` also sidesteps the unmirrorable-codepoint census entirely.
    A pair with previous-role ``user`` and current-role ``assistant``
    whose ``jac_e4 ≥ echo_threshold_e4`` is an echo pair.

    Execution/scale: distinct-token arrays are computed ONCE per turn in
    the pre-shuffle project, then ONE lag window per conversation carries
    them (the self-join alternative shuffles the corpus twice); the
    per-conversation aggregate reuses the window's hashpartitioning, so
    the whole op is ONE Exchange (plan-asserted in
    tests/test_r5_batch10_ops.py).
    The array lambdas (filter/intersect) run once per ROW — the
    interpreted-HOF rule of thumb allows that; nothing is per-pair-k.
    Long-conversation skew is bounded by per-conv turn counts exactly as
    in :func:`conv_lang_mix`.

    NULL text behaves as ``''`` (empty token set → jac 0); a conversation
    with a single turn has no pairs (all counts 0, ``max_jac_e4`` 0).
    Returns one row per conversation: ``(conv_col, n_pairs, n_ua_pairs,
    n_echo_pairs, max_jac_e4, mean_jac_e4, echo_share_e4)`` — means and
    shares in truncating integer e4 (never ``round()`` on a grid value).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(conv_col).orderBy(F.col(idx_col).asc_nulls_last())
    toks = F.array_distinct(
        F.filter(
            F.split(
                F.trim(F.coalesce(F.col(text_col), F.lit(""))),
                r"[ \t\n\x0b\f\r]+",
            ),
            lambda t: t != F.lit(""),
        )
    )
    t = turns.select(
        F.col(conv_col),
        F.col(idx_col),
        F.col(role_col).alias("_role"),
        toks.alias("_toks"),
    )
    lagged = t.select(
        conv_col,
        "_role",
        "_toks",
        F.lag("_toks").over(w).alias("_ptoks"),
        F.lag("_role").over(w).alias("_prole"),
    )
    inter = F.size(F.array_intersect("_toks", "_ptoks")).cast("long")
    un = (
        F.size("_toks").cast("long") + F.size("_ptoks").cast("long") - inter
    )
    pair = lagged.select(
        conv_col,
        F.col("_ptoks").isNotNull().alias("_has_prev"),
        F.coalesce(
            (F.col("_prole") == "user") & (F.col("_role") == "assistant"),
            F.lit(False),
        ).alias("_is_ua"),
        F.when(
            F.col("_ptoks").isNotNull(),
            (inter * 10000).alias("_num"),
        ).alias("_num"),
        F.when(F.col("_ptoks").isNotNull(), F.greatest(un, F.lit(1))).alias(
            "_den"
        ),
    ).withColumn("_jac_e4", F.expr("_num div _den"))
    agg = pair.groupBy(conv_col).agg(
        F.sum(F.col("_has_prev").cast("long")).alias("n_pairs"),
        F.sum((F.col("_has_prev") & F.col("_is_ua")).cast("long")).alias(
            "n_ua_pairs"
        ),
        F.sum(
            (
                F.col("_is_ua")
                & (F.col("_jac_e4") >= F.lit(echo_threshold_e4))
            ).cast("long")
        ).alias("n_echo_pairs"),
        F.coalesce(F.max("_jac_e4"), F.lit(0)).cast("long").alias(
            "max_jac_e4"
        ),
        F.sum(F.coalesce(F.col("_jac_e4"), F.lit(0))).alias("_sum_jac"),
    )
    return agg.select(
        conv_col,
        "n_pairs",
        "n_ua_pairs",
        "n_echo_pairs",
        "max_jac_e4",
        F.expr(
            "CAST(_sum_jac div greatest(n_pairs, 1) AS BIGINT)"
        ).alias("mean_jac_e4"),
        F.expr(
            "CAST((n_echo_pairs * 10000) div greatest(n_ua_pairs, 1)"
            " AS BIGINT)"
        ).alias("echo_share_e4"),
    )


def context_fit(
    turns: DataFrame,
    context_sizes: tuple[int, ...] = (1024, 4096, 16384),
    conv_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """Context-window fit sweep — the capacity question asked BEFORE
    committing a packing/truncation config: for each candidate context
    length, how many conversations fit whole, and what share of the token
    stream survives a token-level cut at that length.  This is the
    multi-point sibling of :func:`budget_truncate` (which AUDITS one
    chosen budget turn-by-turn) and the upstream input to
    :func:`pack_efficiency` (which scores the packing AFTER a budget is
    picked); the sweep's output is a handful of rows a human reads to
    pick the budget the other two ops then operate at.

    Whole-conversation token totals use the house whitespace
    :func:`~sparkx.ops.textstats.token_count` (NULL-text turns contribute
    nothing; an all-NULL conversation counts 0 tokens, mirrored with
    ``coalesce(sum,0)`` so no NULL reaches the comparisons).  ``lost``
    is the token-level upper bound ``Σ max(0, conv_tokens − ctx)`` — a
    turn-boundary truncation (budget_truncate) always loses at least
    this much.

    Execution/scale: ONE map-side-combinable per-conversation sum (the
    corpus text never shuffles — only per-turn token counts do), then an
    explode over the |context_sizes|-element literal array (row growth is
    the constant sweep width, the ann_probe_curve shape) into a final
    |context_sizes|-group combinable aggregate.  Two Exchanges, the
    second over ≤len(context_sizes) keys.  Shares on the truncating e4
    integer grid, never a rounded float.

    Returns one row per candidate size: ``(ctx, n_convs, n_fit,
    fit_share_e4, total_tokens, lost_tokens, kept_share_e4)``.
    """
    from sparkx.ops.textstats import token_count

    if not context_sizes:
        raise ValueError("context_fit needs at least one context size")
    per_conv = turns.groupBy(conv_col).agg(
        F.coalesce(F.sum(token_count(text_col)), F.lit(0))
        .cast("long")
        .alias("conv_tokens")
    )
    sized = per_conv.select(
        "conv_tokens",
        F.explode(
            F.array(*[F.lit(int(c)) for c in context_sizes])
        ).alias("ctx"),
    )
    agg = sized.groupBy("ctx").agg(
        F.count(F.lit(1)).alias("n_convs"),
        F.sum(
            (F.col("conv_tokens") <= F.col("ctx")).cast("long")
        ).alias("n_fit"),
        F.sum("conv_tokens").alias("total_tokens"),
        F.sum(
            F.least(F.col("conv_tokens"), F.col("ctx").cast("long"))
        ).alias("_kept"),
    )
    return agg.select(
        F.col("ctx").cast("int").alias("ctx"),
        "n_convs",
        "n_fit",
        F.expr(
            "CAST((n_fit * 10000) div greatest(n_convs, 1) AS BIGINT)"
        ).alias("fit_share_e4"),
        "total_tokens",
        (F.col("total_tokens") - F.col("_kept")).alias("lost_tokens"),
        F.expr(
            "CAST((_kept * 10000) div greatest(total_tokens, 1) AS BIGINT)"
        ).alias("kept_share_e4"),
    )
