"""Similarity search over embedding columns (array<float>).

* :func:`topk_bruteforce` — exact cosine top-k: one narrow map (dot products
  via native zip_with/aggregate, codegen'd) + a k-row global top (TakeOrdered,
  no full sort).  The verification baseline; at 100 TB it is a full scan.
* :func:`topk_lsh` — sign-LSH (IVF-style) variant: vectors are bucketed by
  the sign pattern of their first ``nbits`` dimensions; the query probes only
  its own bucket.  Partition pruning on the bucket column turns the scan into
  ~1/2^nbits of the data; recall traded per nbits (probe expansion left for a
  later round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkx.ops.dedup import _cosine, sign_bucket_at


def sign_bucket(col: str = "embedding", nbits: int = 4):
    """Sign-LSH bucket over the first nbits dims — single definition shared
    with the dedup banding (sign_bucket_at), so NULL/short-vector semantics
    can never diverge between ANN and dedup."""
    return sign_bucket_at(col, 1, nbits)


def _with_query(emb: DataFrame, query_vec_id: int) -> DataFrame:
    """Attach the query vector to every row via broadcast (never collects to
    a local literal — identical plan shape on a 1000-executor cluster)."""
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_embedding")
    )
    return emb.crossJoin(F.broadcast(q))


def topk_bruteforce(emb: DataFrame, query_vec_id: int, k: int = 10) -> DataFrame:
    scored = _with_query(emb, query_vec_id).select(
        "vec_id",
        "label",
        F.round(_cosine("embedding", "q_embedding"), 4).alias("cosine"),
    )
    return scored.filter(F.col("vec_id") != query_vec_id).orderBy(
        F.desc("cosine"), F.asc("vec_id")
    ).limit(k)


def text_topk(docs: DataFrame, query_doc_id: int, k: int = 5) -> DataFrame:
    """End-to-end text similarity search with no model: feature-hash the
    documents (sparkx.ops.embed integer weights), then cosine top-k computed
    RELATIONALLY — dot products via an equi-join on the hashed dimension,
    norms via a groupBy — so the whole chain is shuffled joins/aggregations
    Catalyst can plan (broadcast the k·64-row query side), and exact integer
    dots make it cross-engine verifiable."""
    from sparkx.ops.embed import embed_weights

    w = embed_weights(
        docs.select(F.col("doc_id"), F.col("text").alias("embed_text")),
        id_col="doc_id",
    )
    norms = w.groupBy("id").agg(
        F.sum(F.col("weight") * F.col("weight")).alias("norm_sq")
    )
    qw = w.filter(F.col("id") == query_doc_id).select(
        F.col("dim"), F.col("weight").alias("q_weight")
    )
    qn = norms.filter(F.col("id") == query_doc_id).select(
        F.col("norm_sq").alias("q_norm_sq")
    )
    dots = (
        w.join(F.broadcast(qw), "dim")
        .groupBy("id")
        .agg(F.sum(F.col("weight") * F.col("q_weight")).alias("dot"))
    )
    scored = (
        dots.join(norms, "id")
        .crossJoin(F.broadcast(qn))
        .filter(F.col("id") != query_doc_id)
        .select(
            F.col("id").alias("doc_id"),
            F.round(
                F.col("dot")
                / F.sqrt(F.col("norm_sq").cast("double") * F.col("q_norm_sq")),
                4,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc("doc_id")).limit(k)


def ivf_assign(
    emb: DataFrame,
    n_centroids: int = 16,
    seed: int = 7,
    max_iter: int = 10,
):
    """Train an IVF coarse quantizer (k-means, the inverted-file layout of
    Jégou et al., "Product Quantization for Nearest Neighbor Search", TPAMI
    2011 — here IVF-Flat: coarse cells + exact residual scoring) and assign
    every vector to its nearest centroid.

    Returns ``(assigned, centroids)``: the input frame with an ``ivf_cell``
    int column, and the centroid table as a small DataFrame
    ``(ivf_cell, centroid array<double>)``.  At corpus scale the assigned
    frame is written ``partitionBy("ivf_cell")`` so probes prune cell
    directories exactly like the sign-LSH layout (PLANS.md) — k-means cells
    track the data distribution where fixed sign-planes cannot, the classic
    IVF advantage on clustered embeddings.

    Training runs on a sample-sized frame by design (k-means over 100 TB is
    never trained on all rows; fit on emb.sample(...) upstream and assign
    with the model here if the corpus is huge — assignment itself is one
    narrow pass).  Not SQL-expressible (iterative), so IVF queries carry no
    DuckDB oracle; correctness is pinned by recall-vs-brute-force tests."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = emb.withColumn(
        "_vec", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter,
        featuresCol="_vec", predictionCol="ivf_cell",
    ).fit(v)
    assigned = model.transform(v).drop("_vec")
    spark = emb.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "ivf_cell int, centroid array<double>",
    )
    return assigned, centroids


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 2,
    seed: int = 7,
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVF-Flat ANN: probe the ``nprobe`` cells whose centroids are nearest
    the query (cosine), score exactly inside them.  Everything stays
    in-plan: the centroid table (n_centroids rows) cross-joins the broadcast
    1-row query to pick probe cells, then a broadcast semi-join restricts
    the scored scan to those cells — ~nprobe/n_centroids of the corpus read
    when the assigned table is partitioned by ``ivf_cell``.  Recall-vs-probe
    trade measured in tests/test_ops.py.

    ``index``: a prebuilt ``(assigned, centroids)`` pair from
    :func:`ivf_assign` — the production shape, where the k-means fit is the
    one-time INDEX BUILD (typically persisted ``partitionBy("ivf_cell")``,
    see PLANS.md) and each query pays only the probe.  ``None`` builds the
    index inline (demo/verification convenience)."""
    if index is None:
        index = ivf_assign(emb, n_centroids=n_centroids, seed=seed)
    assigned, centroids = index
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_embedding")
    )
    probe_cells = (
        centroids.crossJoin(F.broadcast(q))
        .select("ivf_cell", _cosine("centroid", "q_embedding").alias("_c"))
        .orderBy(F.desc("_c"), F.asc("ivf_cell"))
        .limit(nprobe)
        .select("ivf_cell")
    )
    scored = (
        assigned.join(F.broadcast(probe_cells), "ivf_cell")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(_cosine("embedding", "q_embedding"), 4).alias("cosine"),
        )
    )
    return scored.filter(F.col("vec_id") != query_vec_id).orderBy(
        F.desc("cosine"), F.asc("vec_id")
    ).limit(k)


def load_frozen_centroids() -> list[list[float]]:
    """The checked-in frozen coarse-quantizer artifact (fitted once by
    tools/fit_ivf_centroids.py; see sparkx/data/ivf_centroids.json for
    provenance).  Loaded as plain Python floats so both the Spark plan and
    the DuckDB oracle inline the identical double literals."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data",
        "ivf_centroids.json",
    )
    with open(path) as f:
        return json.load(f)["centroids"]


def _frozen_affinity(vec_col, centroid: list[float]):
    """Integer-grid affinity of ``vec_col`` to one frozen centroid:
    ``floor(dot(c, v) / ||c|| * 1e6)`` as a long.  ||v|| is omitted — it is
    constant across centroids, so the argmax/ordering is the cosine argmax —
    which keeps the expression free of a per-row shared subexpression (the
    CollapseProject trap, CLAUDE.md) and exactly mirrorable in SQL.  The
    floor-grid (never round) is the engine-parity idiom: both engines
    compute the identical left-to-right double sum, truncation has no
    half-tie."""
    cnorm = sum(x * x for x in centroid) ** 0.5
    lit = ", ".join(repr(float(x)) + "D" for x in centroid)
    return F.floor(
        _dot_expr(vec_col, f"array({lit})") / F.lit(cnorm) * F.lit(1_000_000.0)
    ).cast("long")


def _dot_expr(a_col: str, b_sql: str):
    """dot(a, b) with the same left-to-right fold as dedup._dot (bit-identical
    doubles vs DuckDB's list_dot_product)."""
    return F.expr(
        f"aggregate(zip_with({a_col}, {b_sql}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0 as double), (acc, v) -> acc + v)"
    )


def ivf_assign_frozen(
    emb: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Assign every vector to its nearest FROZEN centroid — the production
    IVF ingest shape: the coarse quantizer is a one-time fitted artifact
    (:func:`ivf_assign` / reference `store.py` index build), and every
    subsequent ingest or probe uses it as inlined literals.  One narrow
    map-only pass: no shuffle, no iteration — hence, unlike the k-means fit,
    fully SQL-expressible and DuckDB-oracle-gated (the fix for r4's only
    ``no_oracle`` driver row).

    Nearest = max integer-grid affinity (:func:`_frozen_affinity`), ties to
    the LOWEST cell id via ``array_max`` over ``struct(aff, -cell)`` — the
    struct-max argmax idiom (no Window, no second evaluation of the
    affinities).

    Vectors whose dimension does not match the frozen quantizer's (incl.
    NULL vectors) get a NULL cell — a 64-dim index must never silently
    score an 8-dim vector (Spark's zip_with would NULL-pad, a SQL mirror's
    fixed-length dot errors; surfaced by the adversarial ragged-dim
    fixture).  Upstream QA is :func:`embedding_health`."""
    dim = len(centroids[0])
    structs = F.array(
        *[
            F.struct(
                _frozen_affinity(vec_col, c).alias("aff"),
                F.lit(-i).alias("negcell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    best = F.array_max(structs)
    return emb.withColumn(
        "ivf_cell",
        F.when(F.size(F.col(vec_col)) == dim, -best.getField("negcell")),
    )


def ivf_topk_frozen(
    emb: DataFrame,
    centroids: list[list[float]],
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 2,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF-Flat probe against a FROZEN coarse quantizer (the production
    query path — :func:`ivf_topk` with the fit replaced by literals).  Probe
    cells = the ``nprobe`` centroids with the highest integer-grid affinity
    to the query (ties to lowest cell id, same grid as assignment); exact
    cosine scoring inside, same output contract as :func:`topk_bruteforce`.

    Plan shape: assignment is a map over the scan; the probe-cell set is a
    driver-free ≤nprobe-row frame (the query row's affinity array, sorted
    desc-aff/asc-cell, sliced, exploded) broadcast into a semi-join, so on
    an ``ivf_cell``-partitioned table the scan prunes to ~nprobe/n_cells of
    the corpus (PLANS.md; bench.py times that pruned shape as
    ``ann_ivf_probe``).  Probe-cell selection reuses the assignment's
    affinity expression verbatim — one idiom, one oracle mirror.

    ``assigned``: a prebuilt ``ivf_cell``-carrying frame (e.g. read back
    from a ``partitionBy("ivf_cell")`` parquet layout — the production
    index) — skips the inline assignment map so the probe pays only the
    pruned scan."""
    if assigned is None:
        assigned = ivf_assign_frozen(emb, centroids)
    # dim-mismatched corpus vectors carry a NULL ivf_cell (ivf_assign_frozen)
    # and never equi-join a probe cell; a dim-mismatched QUERY vector yields
    # an empty probe set (and an empty result) rather than a NULL-padded dot
    q = emb.filter(
        (F.col("vec_id") == query_vec_id)
        & (F.size("embedding") == len(centroids[0]))
    ).select(F.col("embedding").alias("q_embedding"))
    affs = F.array(
        *[
            F.struct(
                _frozen_affinity("q_embedding", c).alias("aff"),
                F.lit(-i).alias("negcell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    # array_sort asc on (aff, negcell) then reverse == (aff desc, cell asc)
    probe_cells = q.select(
        F.explode(F.slice(F.reverse(F.array_sort(affs)), 1, nprobe)).alias("s")
    ).select((-F.col("s.negcell")).alias("ivf_cell"))
    scored = (
        assigned.join(F.broadcast(probe_cells), "ivf_cell")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(_cosine("embedding", "q_embedding"), 4).alias("cosine"),
        )
    )
    return scored.filter(F.col("vec_id") != query_vec_id).orderBy(
        F.desc("cosine"), F.asc("vec_id")
    ).limit(k)


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Lexical retrieval: Okapi BM25 top-k (Robertson & Zaragoza, "The
    Probabilistic Relevance Framework: BM25 and Beyond", FnTIR 2009) with the
    Lucene-style smoothed idf ``ln(1 + (N - df + 0.5)/(df + 0.5))`` — the
    sparse complement to the embedding retrieval path (A4), and the
    first-stage ranker a RAG pipeline runs before reranking.

    Fully relational, no UDFs: term frequencies via explode+groupBy
    (map-side combinable), document frequencies and the corpus aggregates
    (N, avgdl) as broadcast 1-row/term-row frames, the per-(doc, term)
    partial scores summed per doc.  One shuffle on (doc_id, term), one on
    doc_id; the query-term frame (a handful of rows) broadcasts, so at
    corpus scale this is one scan + two bounded shuffles.

    Determinism across engines: each per-term partial score is quantized to
    a 1e-6 grid BEFORE the per-document sum (floating-point addition is not
    associative, and Spark and DuckDB aggregate in different orders — the
    integer-grid sum is order-free), then the total is rounded to 4 dp.
    Ties broken by doc_id ascending."""
    q_terms = [t for t in query.lower().split() if t]
    if not q_terms:
        raise ValueError("empty BM25 query")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.filter(F.col("term").isin(q_terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    part = idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        # quantize the per-term partial so the cross-engine sum order can't
        # change the 4-dp result
        .select("doc_id", F.round(part * 1e6).cast("long").alias("_p"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("_p") / 1e6, 4).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(k)


def build_text_index(
    docs: DataFrame, id_col: str = "doc_id", col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Inverted-index BUILD — the one-time heavy pass of lexical retrieval
    (the IVF build/probe split, applied to BM25): returns ``(postings,
    doclen, dfreq, stats)`` where postings = (term, id, tf) over ALL terms,
    doclen = (id, dl), dfreq = (term, df), stats = 1 row (n_docs, avgdl).

    One tokenize scan feeds two map-side-combinable aggregations; dfreq is
    a bounded rollup of postings.  At corpus scale the postings table is
    written ``partitionBy``/bucketed on ``term`` so a query's scan prunes
    to its handful of term partitions — the 100 TB query path never
    re-tokenizes the corpus (contrast :func:`bm25_topk`, which inlines the
    build per query as the demo/verification convenience)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.trim(F.col(col))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    postings = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    doclen = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    dfreq = postings.groupBy("term").agg(F.count("*").alias("df"))
    stats = doclen.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    return postings, doclen, dfreq, stats


def bm25_from_index(
    index: tuple[DataFrame, DataFrame, DataFrame, DataFrame],
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k served from a PREBUILT inverted index
    (:func:`build_text_index`) — value-identical to :func:`bm25_topk` (the
    df of a query term over the full postings table IS the df the inline
    path computes; identical idf/tf expressions, identical 1e-6-grid
    quantization before the per-doc sum, pinned by test).  Query cost:
    the postings scan restricted to the query's terms (partition-pruned on
    a term-partitioned layout) + one bounded per-doc aggregation."""
    postings, doclen, dfreq, stats = index
    q_terms = [t for t in query.lower().split() if t]
    if not q_terms:
        raise ValueError("empty BM25 query")
    tf = postings.filter(F.col("term").isin(q_terms))
    df_ = dfreq.filter(F.col("term").isin(q_terms))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    part = idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(part * 1e6).cast("long").alias("_p"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("_p") / 1e6, 4).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(k)


def rrf_fuse(
    docs: DataFrame,
    query: str,
    query_doc_id: int,
    k: int = 10,
    depth: int = 20,
    k0: int = 60,
) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion (Cormack, Clarke & Buettcher,
    SIGIR 2009) of the sparse BM25 ranking (:func:`bm25_topk`) and the dense
    feature-hash cosine ranking (:func:`text_topk`) —
    ``rrf = Σ_lists 1/(k0 + rank)`` with the standard ``k0 = 60``.  This is
    the first-stage fusion step of every production RAG retriever: lexical
    and embedding rankers fail on DIFFERENT queries, and RRF needs no score
    calibration because it consumes only the integer ranks.

    Scale shape: each ranker ends in a global top-``depth``
    (TakeOrderedAndProject — a k-row driver-side heap merge, no full sort),
    so the two rank windows and the full-outer fusion join run over ≤depth
    rows each; single-partition windows are fine HERE and only here, because
    the depth limit has already reduced the data.  The expensive work is the
    rankers themselves, whose plans are audited separately.

    Determinism: ranks are dense integers over a deterministic total order
    (score DESC, doc_id ASC — both rankers quantize their scores), and the
    fused score is two IEEE double divisions plus one addition in a fixed
    written order, identical in Spark and DuckDB; rounded to 6 dp.  A doc
    absent from one list keeps a NULL rank there and contributes only the
    other list's term (graded fusion, not an inner-join intersection)."""
    from pyspark.sql import Window

    bm = bm25_topk(docs, query, k=depth).withColumn(
        "bm25_rank",
        F.row_number().over(Window.orderBy(F.desc("bm25"), F.asc("doc_id"))),
    )
    cos = text_topk(docs, query_doc_id, k=depth).withColumn(
        "cos_rank",
        F.row_number().over(Window.orderBy(F.desc("cosine"), F.asc("doc_id"))),
    )
    fused = (
        bm.select("doc_id", "bm25_rank")
        .join(cos.select("doc_id", "cos_rank"), "doc_id", "full_outer")
        .select(
            "doc_id",
            "bm25_rank",
            "cos_rank",
            F.round(
                F.coalesce(1.0 / (F.lit(k0) + F.col("bm25_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(k0) + F.col("cos_rank")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(k)


def probe_masks(nbits: int, probe_hamming: int) -> list[int]:
    """XOR masks for multi-probe (Lv et al., VLDB 2007): the query's own
    bucket (mask 0), all Hamming-1 neighbors, and — at ``probe_hamming=2`` —
    all Hamming-2 neighbors.  Probe count: 1, 1+nbits, 1+nbits+C(nbits,2)."""
    masks = [0]
    if probe_hamming >= 1:
        masks += [1 << i for i in range(nbits)]
    if probe_hamming >= 2:
        masks += [(1 << i) | (1 << j) for i in range(nbits) for j in range(i + 1, nbits)]
    if probe_hamming >= 3:
        raise ValueError("probe_hamming > 2 not supported (probe count explodes)")
    return masks


def topk_lsh(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    nbits: int = 16,
    multiprobe: bool = True,
    probe_hamming: int | None = None,
) -> DataFrame:
    """Sign-LSH probe with Hamming-distance multi-probe (Lv et al., VLDB 2007).

    Vectors are bucketed by the sign pattern of their first ``nbits`` dims
    (2^16 buckets at the default — the r1 4-bit variant left each bucket
    ~1/16 of the corpus, effectively a scan).  The query probes its own
    bucket plus all Hamming-``probe_hamming`` neighbors — the buckets a
    near-boundary sign flip would land in — via a broadcast join on the
    exploded probe list, so the big side is touched once and partition
    pruning on ``bucket`` applies when the table is written bucket-
    partitioned (verified in tests/test_ops.py + PLANS.md).

    ``probe_hamming`` is the recall knob: 0 probes 1 bucket, 1 probes
    1+nbits, 2 probes 1+nbits+C(nbits,2) (recall-vs-probes measured in
    tests/test_ops.py::test_ann_lsh_probe_recall_monotone).  Defaults to 1
    when ``multiprobe`` (kept for API compat) else 0."""
    if probe_hamming is None:
        probe_hamming = 1 if multiprobe else 0
    b = emb.withColumn("bucket", sign_bucket(nbits=nbits))
    q = b.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_embedding"), F.col("bucket")
    )
    masks = probe_masks(nbits, probe_hamming)
    if len(masks) > 1:
        probes = F.array(
            *[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks]
        )
        q = q.select(
            "q_embedding", F.explode(probes).alias("bucket")
        )
    scored = b.join(F.broadcast(q), "bucket").select(
        "vec_id",
        "label",
        F.round(_cosine("embedding", "q_embedding"), 4).alias("cosine"),
    )
    return scored.filter(F.col("vec_id") != query_vec_id).orderBy(
        F.desc("cosine"), F.asc("vec_id")
    ).limit(k)


def knn_join(
    emb: DataFrame,
    k: int = 5,
    nbits: int = 8,
    probe_hamming: int = 1,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Batch kNN join: top-k cosine neighbors in ``emb`` for every query row
    — the shape semantic dedup and retrieval evaluation need at corpus scale
    (one query at a time is a driver loop; this is one distributed plan).
    ``queries=None`` is the self-join (every row is a query); pass a small
    (vec_id, embedding) batch to probe a large corpus — the shape an
    incremental ingest uses ("which existing docs does each NEW doc
    near-match?").

    Execution: sign-LSH bucketing on both sides; each query row probes its
    own bucket plus Hamming-``probe_hamming`` neighbor buckets (probe list
    exploded on the QUERY side — the data side is touched once).  When
    ``emb`` already carries a ``bucket`` column — i.e. it was READ from a
    bucket-partitioned table (``write.partitionBy("bucket")``, the layout
    ann storage should use) — that scan column is the join key directly, so
    Spark's dynamic partition pruning turns the small-query join into a
    planning-time directory prune of the corpus scan (evidenced in
    PLANS.md); otherwise the bucket is computed on the fly.  Candidate pairs
    are deduped (a pair can collide in several probe buckets), then
    per-query top-k via a row_number window partitioned by query id.  The
    window input is the candidate set (bounded per bucket), never the full
    cross product.

    Recall note: like every LSH probe, a true neighbor whose bucket differs
    in > probe_hamming of the first ``nbits`` sign bits is missed; recall is
    measured against brute force in tests/test_ops.py.  Raise
    ``probe_hamming`` / lower ``nbits`` for recall, reverse for speed."""
    from pyspark.sql import Window

    from sparkx.ops.dedup import _dot, _norm2

    # norms hoisted to a per-ROW column on each side: the cosine lambdas are
    # interpreted (not codegen'd), so per-PAIR work must be one traversal
    # (the dot), not four — same arithmetic (dot / sqrt(na*nb), identical
    # fold order) so values are bit-identical to _cosine
    # (the join boundary keeps norm2 per-row: projections are evaluated on
    # the join INPUTS, so the worst CollapseProject can do is re-evaluate the
    # probe side's norm once per exploded probe row — #probes per vector,
    # still never per pair)
    cols = ["vec_id", "embedding"] + (["bucket"] if "bucket" in emb.columns else [])
    b = emb.select(*cols)
    if "bucket" not in b.columns:
        b = b.withColumn("bucket", sign_bucket(nbits=nbits))
    b = b.withColumn("norm2", _norm2("embedding"))
    if queries is None:
        qsrc = b
    else:
        qsrc = (
            queries.select("vec_id", "embedding")
            .withColumn("bucket", sign_bucket(nbits=nbits))
            .withColumn("norm2", _norm2("embedding"))
        )
    probes = F.array(
        *[F.col("bucket").bitwiseXOR(F.lit(m)) for m in probe_masks(nbits, probe_hamming)]
    )
    q = qsrc.select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_embedding"),
        F.col("norm2").alias("q_norm2"),
        F.explode(probes).alias("bucket"),
    )
    pairs = (
        q.join(b, "bucket")
        .filter(F.col("q_id") != F.col("vec_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(
                _dot("q_embedding", "embedding")
                / F.sqrt(F.col("q_norm2") * F.col("norm2")),
                4,
            ).alias("cosine"),
        )
        .distinct()  # same pair via multiple probe buckets
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "cosine", "rank")
    )


def quantize_int8(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization (max-abs scaling): adds a
    ``codes`` array<int> column with ``code_j = floor(v_j·127/maxabs + 0.5)``
    in [-127, 127] — the standard 4× memory compression for ANN serving
    (100 TB of fp32 embeddings → 25 TB resident, dot products in integer
    SIMD).  The op itself is a narrow map, no shuffle.

    Engine-parity notes baked into the formula: ``floor(x + 0.5)`` instead
    of ``round(x)`` because Spark rounds HALF_UP on the shortest decimal
    repr while DuckDB rounds half-away on the raw double (the
    cur_scorecard lesson), whereas floor is exact on IEEE doubles in every
    engine; ``v·127`` is exact (24-bit float mantissa + 7 bits < 53) and
    the divide is correctly rounded, so codes are bit-identical across
    engines.  The per-vector ``maxabs`` aggregate is bound through an
    ``explode(array(...))`` Generate barrier so CollapseProject cannot
    inline the O(d) reduction into the per-element transform loop and make
    it O(d²) (the with_shingles lesson).  Zero vectors quantize to all-zero
    codes; NULL vectors pass through as NULL codes; a vector containing a
    NaN element maps to NULL codes EXPLICITLY (below) — without the guard,
    maxabs=NaN would give Spark an array-of-NULL-ints while a SQL mirror's
    CAST(floor(NaN) AS INT) errors, so the engines could never agree.  Run
    :func:`embedding_health` first to quarantine such vectors upstream.
    """
    maxabs = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    out = emb.withColumn("_maxabs", F.explode(F.array(maxabs)))
    codes = F.when(
        F.isnan(F.col("_maxabs")), F.lit(None).cast("array<int>")
    ).when(
        F.col("_maxabs") == 0.0,
        F.transform(F.col(vec_col), lambda x: F.lit(0)),
    ).otherwise(
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(
                x.cast("double") * 127.0 / F.col("_maxabs") + 0.5
            ).cast("int"),
        )
    )
    return out.withColumn("codes", codes).drop("_maxabs")


def _int_dot(a: str, b: str):
    """Exact int64 dot product of two int-code arrays (every partial sum
    bounded by 127²·d — no overflow, no float error, hash-gate safe)."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def int8_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Top-k nearest neighbours by cosine over the INT8-quantized codes —
    the fidelity surface of :func:`quantize_int8` made a query: compare
    its neighbour list against :func:`topk_bruteforce` on the fp32
    originals to measure what 4× compression costs in recall.

    All ranking arithmetic is exact-integer until the final cosine: dot
    and self-norms are int64 (bit-identical on any engine), and
    ``cos = dot / (sqrt(nq)·sqrt(nv))`` on exact ints ≤ 127²·d is a fully
    IEEE-determined double — stronger cross-engine ground than the fp32
    cosine, which is why the quantized path can be value-hash verified at
    all.  Plan: quantize (narrow map) → broadcast the 1-row query codes →
    one scan with per-row integer dots → global top-k (TakeOrdered, no
    full sort).  Zero-norm vectors are excluded (cosine undefined).
    """
    codes = quantize_int8(emb.filter(F.col("embedding").isNotNull())).select(
        "vec_id", "codes"
    )
    # n_q is a per-QUERY constant: compute it once on the 1-row broadcast
    # side, never per scanned row (the knn_join norm-hoist rule — HOF
    # lambdas are interpreted, so constant per-row re-evaluation is real
    # wall at scale)
    q = codes.filter(F.col("vec_id") == query_vec_id).select(
        F.col("codes").alias("q_codes"),
        _int_dot("codes", "codes").alias("n_q"),
    )
    scored = (
        codes.crossJoin(F.broadcast(q))
        .withColumn("dot_q", _int_dot("codes", "q_codes"))
        .withColumn("n_v", _int_dot("codes", "codes"))
        .filter(
            (F.col("vec_id") != query_vec_id)
            & (F.col("n_v") > 0)
            & (F.col("n_q") > 0)
        )
        .withColumn(
            "cos_q",
            F.col("dot_q").cast("double")
            / (
                F.sqrt(F.col("n_q").cast("double"))
                * F.sqrt(F.col("n_v").cast("double"))
            ),
        )
    )
    return (
        scored.select("vec_id", "dot_q", "cos_q")
        .orderBy(F.desc("cos_q"), F.asc("vec_id"))
        .limit(k)
    )


def embedding_health(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """One-row embedding-table QA report — the gate an ANN pipeline runs
    BEFORE building an index over 100 TB of vectors, where a single NaN
    poisons every dot product it touches and silently corrupts top-k
    order: counts of NULL vectors, vectors containing NaN, zero-norm
    vectors (cosine undefined), magnitude outliers (|x| > 100 — an
    unnormalized-model or wrong-scale symptom), and the min/max dimension
    (a ragged table breaks every zip_with).  All-integer output (exact on
    any engine); one narrow map + a single 1-row aggregate, no shuffle of
    vector data."""
    c = F.col(vec_col)
    has_nan = F.exists(c, lambda x: F.isnan(x.cast("double")))
    maxabs = F.aggregate(
        c, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    # bind BOTH interpreted array passes once per row through the
    # explode(array(struct(...))) Generate barrier — lambda-bearing
    # expressions are excluded from subexpression elimination, so naming
    # them in three flag columns would re-run the O(d) scans 3x/2x per
    # row (the quantize_int8 lesson, flag-column form)
    probed = emb.withColumn(
        "_hp", F.explode(F.array(F.struct(has_nan.alias("hn"), maxabs.alias("ma"))))
    )
    hn = F.col("_hp.hn")
    ma = F.col("_hp.ma")
    per = probed.select(
        c.isNull().cast("long").alias("is_null"),
        F.when(c.isNull(), F.lit(0)).otherwise(hn.cast("long")).alias("has_nan"),
        F.when(c.isNull() | hn, F.lit(0))
        .otherwise((ma == 0.0).cast("long")).alias("zero_norm"),
        F.when(c.isNull() | hn, F.lit(0))
        .otherwise((ma > 100.0).cast("long")).alias("outlier"),
        F.when(c.isNull(), F.lit(None)).otherwise(F.size(c)).alias("dims"),
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("is_null").alias("n_null"),
        F.sum("has_nan").alias("n_nan"),
        F.sum("zero_norm").alias("n_zero_norm"),
        F.sum("outlier").alias("n_outlier"),
        F.min("dims").alias("dims_min"),
        F.max("dims").alias("dims_max"),
    )


def int8_recall_report(
    emb: DataFrame, n_queries: int = 8, k: int = 10
) -> DataFrame:
    """The quantization fidelity math, made data (the dedup_recall_report
    pattern): per query vector, overlap@k between the INT8-code ranking
    and the fp32 brute-force ranking — the number a deployment reads
    before committing to 4× compression.  Returns ``(q_id, n_overlap)``
    with ``n_overlap ∈ [0, k]``.

    Both rankings are WindowGroupLimit-bounded per-query top-k over a
    broadcast query frame; the overlap is one equi-join on
    (q_id, vec_id) + a per-query count.  Assumes no zero-norm fp32
    vectors (cosine undefined; run :func:`embedding_health` first — the
    int8 side filters them, the fp32 side is the verification baseline
    and mirrors :func:`topk_bruteforce` exactly)."""
    from pyspark.sql import Window

    base = emb.filter(F.col("embedding").isNotNull())
    q32 = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding")
    )
    fp = (
        base.crossJoin(F.broadcast(q32))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "vec_id",
            F.round(_cosine("embedding", "q_embedding"), 4).alias("_c"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("_c"), F.asc("vec_id"))
    fp_top = (
        fp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("q_id", "vec_id")
    )
    codes = quantize_int8(base).select("vec_id", "codes")
    qc = codes.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("codes").alias("q_codes"),
        _int_dot("codes", "codes").alias("n_q"),
    )
    i8 = (
        codes.crossJoin(F.broadcast(qc))
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("dot_q", _int_dot("codes", "q_codes"))
        .withColumn("n_v", _int_dot("codes", "codes"))
        .filter((F.col("n_v") > 0) & (F.col("n_q") > 0))
        .select(
            "q_id", "vec_id",
            (
                F.col("dot_q").cast("double")
                / (
                    F.sqrt(F.col("n_q").cast("double"))
                    * F.sqrt(F.col("n_v").cast("double"))
                )
            ).alias("_c"),
        )
    )
    i8_top = (
        i8.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("q_id", "vec_id")
    )
    overlap = fp_top.join(i8_top, ["q_id", "vec_id"]).groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    return (
        q32.select("q_id")
        .join(overlap, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_overlap", F.lit(0).cast("long")).alias("n_overlap"),
        )
    )


def load_frozen_pq_codebooks() -> dict:
    """The checked-in frozen product-quantization codebook artifact (fitted
    once by tools/fit_pq_codebooks.py; see sparkx/data/pq_codebooks.json
    for provenance).  Plain Python floats so the Spark plan and the DuckDB
    oracle inline the identical double literals — the same
    frozen-artifact contract as :func:`load_frozen_centroids`."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data",
        "pq_codebooks.json",
    )
    with open(path) as f:
        return json.load(f)


def _pq_sub_affinity(vec_col: str, m: int, d_sub: int, codeword: list[float]):
    """Integer-grid affinity of subvector ``m`` of ``vec_col`` to one frozen
    codeword: ``floor((dot(v_sub, c) - ||c||²/2) · 1e6)`` as a long.  The
    ``-||c||²/2`` term makes the argmax the EUCLIDEAN argmin
    (‖v−c‖² = ‖v‖² − 2⟨v,c⟩ + ‖c‖², and ‖v‖² is codeword-invariant), while
    keeping the expression a plain dot against literals — the exact idiom
    :func:`_frozen_affinity` uses for the IVF coarse quantizer, so both
    engines compute the identical left-to-right double fold and the floor
    grid has no half-tie."""
    half = sum(x * x for x in codeword) / 2.0
    lit = ", ".join(repr(float(x)) + "D" for x in codeword)
    sub = f"slice({vec_col}, {m * d_sub + 1}, {d_sub})"
    return F.floor(
        (_dot_expr(sub, f"array({lit})") - F.lit(half)) * F.lit(1_000_000.0)
    ).cast("long")


def pq_encode(
    emb: DataFrame, books: dict, vec_col: str = "embedding"
) -> DataFrame:
    """Product-quantization encoding against FROZEN codebooks (Jégou, Douze,
    Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI 2011
    §II): the vector is split into ``m`` subvectors and each is replaced by
    the id of its nearest codeword — 64 fp32 dims become m=4 4-bit codes,
    the 64× compression that lets a 100 TB embedding corpus serve ANN from
    ~1.5 TB of resident codes.

    One narrow map over the scan, no shuffle: per subvector the argmin is
    the struct-max idiom over the integer-grid affinities
    (:func:`_pq_sub_affinity`; ties to the LOWEST codeword id via
    ``-j``), so the whole encode is SQL-expressible and DuckDB-gated —
    codebooks are inlined literals on both engines, same contract as
    :func:`ivf_assign_frozen`.  Adds ``pq_codes`` (array<int>, length m).
    NULL vectors and vectors whose dimension ≠ m·d_sub pass through as
    NULL codes (a frozen codebook must never silently encode a
    foreign-dimension vector — the ivf_assign_frozen contract);
    NaN-bearing vectors are undefined (gate with :func:`embedding_health`
    upstream, as for :func:`quantize_int8`)."""
    m_sub, d_sub = books["m"], books["d_sub"]
    codes = []
    for m in range(m_sub):
        structs = F.array(
            *[
                F.struct(
                    _pq_sub_affinity(vec_col, m, d_sub, cw).alias("aff"),
                    F.lit(-j).alias("negcode"),
                )
                for j, cw in enumerate(books["codebooks"][m])
            ]
        )
        codes.append((-F.array_max(structs).getField("negcode")).cast("int"))
    return emb.withColumn(
        "pq_codes",
        F.when(F.size(F.col(vec_col)) == m_sub * d_sub, F.array(*codes)),
    )


def pq_topk(
    emb: DataFrame,
    books: dict,
    query_vec_id: int = 0,
    k: int = 10,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes (Jégou et al. TPAMI
    2011 §IV): the query stays exact, every corpus vector is represented
    only by its ``m`` codes, and the approximate inner product is the sum
    of ``m`` lookup-table entries ``LUT[m][code]`` =
    ``floor(⟨q_sub_m, c_{m,code}⟩ · 1e6)``.

    Plan shape — the honest 100 TB ADC layout, not a per-row recompute:
    the LUT is a ≤m·ks-row frame built from the single query row (explode
    of literal-dot structs), BROADCAST into an equi-join against the
    codes exploded one row per (vec_id, m) — posexplode is the Generate
    barrier, so everything downstream is codegen'd — then a map-side-
    combined sum of m exact longs per doc and a global TakeOrdered.  Per
    corpus row the scored work is O(m) integer adds; the O(d) dots happen
    only m·ks times per QUERY.  ``encoded``: a prebuilt ``pq_codes``
    frame (the production code table read back from parquet) skips the
    inline encode so the probe pays only the code scan.

    Returns (vec_id, label, adc_e6) — adc_e6 is the integer-grid
    approximate inner product (desc, ties to vec_id asc), exact-summable
    and hash-gate stable on any engine."""
    m_sub, d_sub = books["m"], books["d_sub"]
    if encoded is None:
        encoded = pq_encode(
            emb.filter(F.size("embedding") == m_sub * d_sub), books
        )
    # NULL pq_codes (dim-mismatched / NULL vectors) vanish at posexplode;
    # a dim-mismatched QUERY yields an empty LUT and an empty result
    codes = encoded.select("vec_id", "label", "pq_codes")
    q = emb.filter(
        (F.col("vec_id") == query_vec_id)
        & (F.size("embedding") == m_sub * d_sub)
    ).select(F.col("embedding").alias("q_embedding"))
    lut_structs = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.lit(j).alias("code"),
                F.floor(
                    _dot_expr(
                        f"slice(q_embedding, {m * d_sub + 1}, {d_sub})",
                        "array("
                        + ", ".join(repr(float(x)) + "D" for x in cw)
                        + ")",
                    )
                    * F.lit(1_000_000.0)
                ).cast("long").alias("ip_e6"),
            )
            for m in range(m_sub)
            for j, cw in enumerate(books["codebooks"][m])
        ]
    )
    lut = q.select(F.explode(lut_structs).alias("s")).select(
        F.col("s.m").alias("m"), F.col("s.code").alias("code"),
        F.col("s.ip_e6").alias("ip_e6"),
    )
    exploded = codes.select(
        "vec_id", "label", F.posexplode("pq_codes").alias("m", "code")
    )
    return (
        exploded.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != query_vec_id)
        .groupBy("vec_id", "label")
        .agg(F.sum("ip_e6").alias("adc_e6"))
        .orderBy(F.desc("adc_e6"), F.asc("vec_id"))
        .limit(k)
    )


def ivfpq_topk(
    emb: DataFrame,
    centroids: list[list[float]],
    books: dict,
    query_vec_id: int = 0,
    k: int = 10,
    nprobe: int = 2,
    assigned_codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ: the composed production ANN serve layout (Jégou et al. TPAMI
    2011 §V "IVFADC"; the non-residual variant — FAISS ``IVFPQ`` with
    ``by_residual=false``): the coarse quantizer prunes the SEARCH (only
    ``nprobe`` cells are scanned), product quantization compresses the
    SCORING (each scanned vector costs m integer LUT adds instead of a
    d-dim dot).  At 100 TB this is the whole architecture: a
    cell-partitioned parquet code table where the probe reads
    ~nprobe/n_cells of the files (directory pruning) and holds 64×-smaller
    rows while doing it.

    Pure composition of the two frozen-artifact operators — probe-cell
    selection is :func:`ivf_topk_frozen`'s idiom verbatim, scoring is
    :func:`pq_topk` over the cell-pruned code frame — so the whole chain
    stays SQL-expressible and DuckDB-gated.  ``assigned_codes``: a prebuilt
    (vec_id, label, ivf_cell, pq_codes) frame (the production index, read
    back from a ``partitionBy("ivf_cell")`` layout); built inline when
    absent.  Same output contract as :func:`pq_topk` (adc_e6 desc, vec_id
    asc); dim-mismatched vectors are excluded by both underlying guards."""
    if assigned_codes is None:
        assigned_codes = pq_encode(ivf_assign_frozen(emb, centroids), books)
    q = emb.filter(
        (F.col("vec_id") == query_vec_id)
        & (F.size("embedding") == len(centroids[0]))
    ).select(F.col("embedding").alias("q_embedding"))
    affs = F.array(
        *[
            F.struct(
                _frozen_affinity("q_embedding", c).alias("aff"),
                F.lit(-i).alias("negcell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    probe_cells = q.select(
        F.explode(F.slice(F.reverse(F.array_sort(affs)), 1, nprobe)).alias("s")
    ).select((-F.col("s.negcell")).alias("ivf_cell"))
    pruned = assigned_codes.filter(F.col("pq_codes").isNotNull()).join(
        F.broadcast(probe_cells), "ivf_cell"
    )
    return pq_topk(emb, books, query_vec_id=query_vec_id, k=k, encoded=pruned)


def pq_recall_report(
    emb: DataFrame, books: dict, n_queries: int = 8, k: int = 10
) -> DataFrame:
    """PQ fidelity made data (the int8_recall_report pattern): per query
    vector, overlap@k between the ADC ranking over PQ codes and the exact
    inner-product brute-force ranking — the number a deployment reads
    before committing to 64× compression.  Returns ``(q_id, n_overlap)``,
    ``n_overlap ∈ [0, k]``.

    Both rankings are integer-grid deterministic (exact baseline =
    floor(dot·1e6) longs, ADC = exact long sums of LUT entries; ties to
    vec_id asc), so the whole report is SQL-expressible and value-hash
    gateable.  The ADC side is the multi-query generalization of
    :func:`pq_topk`: the LUT carries q_id (n_queries·m·ks rows, still
    broadcast-size), codes are encoded ONCE and joined once.
    Dim-mismatched / NULL vectors are excluded by the encode guard on
    both sides."""
    from pyspark.sql import Window

    m_sub, d_sub = books["m"], books["d_sub"]
    base = emb.filter(F.size("embedding") == m_sub * d_sub)
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding")
    )
    fp = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.floor(
                _dot_expr("embedding", "q_embedding") * F.lit(1_000_000.0)
            ).cast("long").alias("_ip"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("_ip"), F.asc("vec_id"))
    fp_top = (
        fp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("q_id", "vec_id")
    )
    codes = pq_encode(base, books).select("vec_id", "pq_codes")
    lut_structs = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.lit(j).alias("code"),
                F.floor(
                    _dot_expr(
                        f"slice(q_embedding, {m * d_sub + 1}, {d_sub})",
                        "array("
                        + ", ".join(repr(float(x)) + "D" for x in cw)
                        + ")",
                    )
                    * F.lit(1_000_000.0)
                ).cast("long").alias("ip_e6"),
            )
            for m in range(m_sub)
            for j, cw in enumerate(books["codebooks"][m])
        ]
    )
    lut = q.select("q_id", F.explode(lut_structs).alias("s")).select(
        "q_id", F.col("s.m").alias("m"), F.col("s.code").alias("code"),
        F.col("s.ip_e6").alias("ip_e6"),
    )
    adc = (
        codes.select("vec_id", F.posexplode("pq_codes").alias("m", "code"))
        .join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum("ip_e6").alias("_adc"))
    )
    w2 = Window.partitionBy("q_id").orderBy(F.desc("_adc"), F.asc("vec_id"))
    adc_top = (
        adc.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .select("q_id", "vec_id")
    )
    overlap = (
        fp_top.join(adc_top, ["q_id", "vec_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        q.select("q_id")
        .join(overlap, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_overlap", F.lit(0).cast("long")).alias("n_overlap"),
        )
    )


def ivf_recall_report(
    emb: DataFrame,
    centroids: list[list[float]],
    n_queries: int = 8,
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF fidelity made data (the int8/pq recall-report pattern): per query
    vector, overlap@k between the frozen-quantizer IVF probe ranking
    (:func:`ivf_topk_frozen`, ``nprobe`` cells) and the exact cosine
    brute-force ranking — the recall a deployment reads before committing
    to an ``nprobe/n_cells`` scan fraction.  Returns ``(q_id, n_overlap)``
    with ``n_overlap ∈ [0, k]``.

    Both rankings live on the floor-1e6 integer cosine grid (ties to
    vec_id asc), so the whole report — assignment, probe-cell selection,
    candidate scoring, both top-ks, the overlap — is SQL-expressible and
    value-hash gateable; this upgrades the IVF recall claim from
    pytest-only (VERDICT r4) to driver-verified.  The exact side is the
    verification baseline, not a production path: at corpus scale only the
    IVF branch runs (probe cells → pruned scan on a cell-partitioned
    layout), and recall is measured on a sampled query set exactly like
    this one.

    Execution notes: per-row norms are hoisted to columns on the scan side
    of each join boundary (the knn_join idiom — the cosine lambdas are
    interpreted, so per-PAIR work must be one traversal); the probe-cell
    frame is ≤ ``n_queries·nprobe`` rows and broadcast; candidates carry
    their embedding through the assignment map so no corpus self-join is
    needed.  Dim guard: only vectors matching the frozen quantizer's
    dimension participate on either side (NULL/ragged vectors excluded by
    construction)."""
    from pyspark.sql import Window

    from sparkx.ops.dedup import _dot, _norm2

    dim = len(centroids[0])
    base = (
        emb.filter(F.size("embedding") == dim)
        .select("vec_id", "embedding")
        .withColumn("_n2", _norm2("embedding"))
    )
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_embedding"),
        F.col("_n2").alias("_qn2"),
    )
    grid_ip = F.floor(
        _dot("embedding", "q_embedding")
        / F.sqrt(F.col("_n2") * F.col("_qn2"))
        * F.lit(1_000_000.0)
    ).cast("long")
    scored = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", grid_ip.alias("_ip"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("_ip"), F.asc("vec_id"))
    exact_top = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("q_id", "vec_id")
    )
    # IVF branch: assignment keeps embedding/_n2 so candidates score without
    # a corpus self-join; probe cells reuse the assignment affinity idiom
    assigned = ivf_assign_frozen(base, centroids)
    affs = F.array(
        *[
            F.struct(
                _frozen_affinity("q_embedding", c).alias("aff"),
                F.lit(-i).alias("negcell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    probe = q.select(
        "q_id",
        F.explode(F.slice(F.reverse(F.array_sort(affs)), 1, nprobe)).alias("s"),
    ).select("q_id", (-F.col("s.negcell")).alias("ivf_cell"))
    ivf_scored = (
        assigned.join(F.broadcast(probe), "ivf_cell")
        .join(
            F.broadcast(q.select("q_id", "q_embedding", "_qn2")), "q_id"
        )
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", grid_ip.alias("_ip"))
    )
    ivf_top = (
        ivf_scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("q_id", "vec_id")
    )
    overlap = (
        exact_top.join(ivf_top, ["q_id", "vec_id"])
        .groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        q.select("q_id")
        .join(overlap, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_overlap", F.lit(0).cast("long")).alias("n_overlap"),
        )
    )


def ranking_metrics_report(
    emb: DataFrame, n_queries: int = 8, k: int = 10
) -> DataFrame:
    """Graded ranking-quality evaluation of the int8 ANN serving path —
    nDCG@k and MRR, the two numbers a retrieval deployment actually quotes
    (overlap@k from :func:`int8_recall_report` says WHAT fraction survived
    compression; nDCG says whether the survivors are in the right ORDER,
    and MRR whether the single best neighbor still surfaces first).
    Relevance is binary membership in the fp32 brute-force top-``k`` (the
    verification baseline, mirroring :func:`topk_bruteforce`).

    Cross-engine exactness (the bigram_logprob ln idiom): each hit's DCG
    gain ``1/log2(rank+1)`` is quantized per-rank to the 1e-6 grid —
    ``floor(1e6·ln 2/ln(rank+1))`` — BEFORE the long sum, the ideal DCG is
    the same quantized expression summed over ranks 1..k engine-side (never
    a Python-float constant smuggled in), and nDCG is integer division on
    the grid (``dcg_e6·1e6 div idcg_e6``).  MRR needs no ln at all:
    ``1e6 div rank`` is exact integer arithmetic.

    Scale shape: identical to :func:`int8_recall_report` — both rankings
    are WindowGroupLimit-bounded per-query top-k over a broadcast query
    frame; the metrics join touches ≤ n_queries·k rows.  Same no-zero-norm
    precondition (run :func:`embedding_health` first).

    Returns ``(q_id, n_hits, dcg_e6, ndcg_e6, rr_e6)`` — all metrics on
    integer grids; divide by 1e6 for the conventional [0,1] values.
    """
    from pyspark.sql import Window

    def gain_e6(rank_col):
        return F.floor(
            F.lit(1000000.0) * F.log(F.lit(2.0))
            / F.log(rank_col.cast("double") + F.lit(1.0))
        ).cast("long")

    base = emb.filter(F.col("embedding").isNotNull())
    q32 = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding")
    )
    fp = (
        base.crossJoin(F.broadcast(q32))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "vec_id",
            F.round(_cosine("embedding", "q_embedding"), 4).alias("_c"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("_c"), F.asc("vec_id"))
    fp_top = (
        fp.withColumn("rel_rank", F.row_number().over(w))
        .filter(F.col("rel_rank") <= k)
        .select("q_id", "vec_id", "rel_rank")
    )
    codes = quantize_int8(base).select("vec_id", "codes")
    qc = codes.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("codes").alias("q_codes"),
        _int_dot("codes", "codes").alias("n_q"),
    )
    i8 = (
        codes.crossJoin(F.broadcast(qc))
        .filter(F.col("vec_id") != F.col("q_id"))
        .withColumn("dot_q", _int_dot("codes", "q_codes"))
        .withColumn("n_v", _int_dot("codes", "codes"))
        .filter((F.col("n_v") > 0) & (F.col("n_q") > 0))
        .select(
            "q_id", "vec_id",
            (
                F.col("dot_q").cast("double")
                / (
                    F.sqrt(F.col("n_q").cast("double"))
                    * F.sqrt(F.col("n_v").cast("double"))
                )
            ).alias("_c"),
        )
    )
    i8_top = (
        i8.withColumn("sys_rank", F.row_number().over(w))
        .filter(F.col("sys_rank") <= k)
        .select("q_id", "vec_id", "sys_rank")
    )
    hits = i8_top.join(fp_top, ["q_id", "vec_id"])
    per_q = hits.groupBy("q_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.sum(gain_e6(F.col("sys_rank"))).alias("dcg_e6"),
        F.max(
            F.when(
                F.col("rel_rank") == 1,
                F.expr("1000000 div sys_rank"),
            ).otherwise(F.lit(0))
        ).cast("long").alias("rr_e6"),
    )
    idcg_e6 = F.aggregate(
        F.sequence(F.lit(1), F.lit(k)),
        F.lit(0).cast("long"),
        lambda acc, r: acc + gain_e6(r),
    )
    return (
        q32.select("q_id")
        .join(per_q, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
            F.coalesce("dcg_e6", F.lit(0).cast("long")).alias("dcg_e6"),
            F.coalesce("rr_e6", F.lit(0).cast("long")).alias("rr_e6"),
            idcg_e6.alias("_idcg"),
        )
        .select(
            "q_id",
            "n_hits",
            "dcg_e6",
            F.expr("(dcg_e6 * 1000000) div _idcg").alias("ndcg_e6"),
            "rr_e6",
        )
    )


def mmr_rerank(
    emb: DataFrame,
    n_queries: int = 4,
    n_cands: int = 12,
    k: int = 5,
    lam_e4: int = 5000,
    checkpoint_picks: bool = True,
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified re-rank (Carbonell &
    Goldstein 1998) of each query's brute-force candidate list — the
    context-assembly upgrade over plain top-k (reference retrieval returns
    raw nearest chunks, ``store.py`` top-k): a RAG context of k
    near-duplicate chunks wastes its token budget, so each pick maximizes
    ``λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)`` against the already-picked
    set S.

    MMR is inherently sequential in k, so the greedy is unrolled as k
    chained frame steps (the pagerank fixed-iteration pattern) over
    BOUNDED frames: candidates are the per-query top-``n_cands``
    (WindowGroupLimit over the broadcast query frame — the corpus-scale
    stage, identical shape to :func:`ranking_metrics_report`), and every
    greedy step touches ≤ ``n_queries·n_cands`` candidate rows and
    ≤ ``n_queries·n_cands²`` precomputed pair sims.  Candidate and
    pair-sim frames are localCheckpoint'd once (bounded by construction)
    so the k unrolled steps do not re-evaluate the corpus scan or grow
    the plan.

    Cross-engine exactness: relevance and pair sims are cosines rounded
    to the 1e-4 grid then scaled to int64 (ties on a continuous cosine
    are measure-zero — the ann_ndcg precedent); the MMR objective is then
    exact integer arithmetic, ``mmr_e8 = lam_e4·rel_e4 −
    (10000−lam_e4)·maxsim_e4``, with ties broken by min ``vec_id`` via
    the ±id struct-max pick (the preference_pairs idiom — no Window on
    the per-step argmax, a map-side-combinable aggregate).  ``maxsim`` is
    clamped at 0: cosine lives in [−1, 1] and an UNclamped negative
    max-sim would pay a diversity BONUS to anti-correlated candidates,
    letting them outscore their own relevance (classic MMR assumes
    sim ∈ [0, 1]).  First pick has S = ∅ → maxsim term 0 → argmax of
    relevance, the standard MMR seed.  Queries with fewer than k
    candidates emit all of them (rank sequence stays gap-free).

    Returns ``(q_id, pick_rank, vec_id, rel_e4, maxsim_e4, mmr_e8)``.
    """
    base = emb.filter(F.col("embedding").isNotNull())
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_embedding")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(F.desc("_c"), F.asc("vec_id"))
    cand = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "vec_id", "embedding",
            F.round(_cosine("embedding", "q_embedding"), 4).alias("_c"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_cands)
        .select(
            "q_id", "vec_id", "embedding",
            F.round(F.col("_c") * F.lit(10000.0)).cast("long").alias("rel_e4"),
        )
        .localCheckpoint(eager=True)
    )
    a = cand.select("q_id", F.col("vec_id").alias("a"),
                    F.col("embedding").alias("_ea"))
    bb = cand.select("q_id", F.col("vec_id").alias("b"),
                     F.col("embedding").alias("_eb"))
    pairs = (
        a.join(bb, "q_id")
        .filter(F.col("a") != F.col("b"))
        .select(
            "q_id", "a", "b",
            F.round(F.round(_cosine("_ea", "_eb"), 4) * F.lit(10000.0))
            .cast("long").alias("sim_e4"),
        )
        .localCheckpoint(eager=True)
    )
    mu = int(10000 - lam_e4)
    remaining = cand.select("q_id", "vec_id", "rel_e4")
    selected = None
    for step in range(1, k + 1):
        if selected is None:
            scored = remaining.withColumn(
                "maxsim_e4", F.lit(0).cast("long")
            )
        else:
            sel_ids = selected.select(
                F.col("q_id").alias("_sq"), F.col("vec_id").alias("_s")
            )
            p = pairs.select(
                F.col("q_id").alias("_pq"), "a", "b", "sim_e4"
            )
            ms = (
                remaining.join(
                    sel_ids, F.col("q_id") == F.col("_sq")
                )
                .join(
                    p,
                    (F.col("q_id") == F.col("_pq"))
                    & (F.col("vec_id") == F.col("a"))
                    & (F.col("_s") == F.col("b")),
                )
                .groupBy("q_id", "vec_id")
                .agg(
                    F.greatest(
                        F.lit(0).cast("long"), F.max("sim_e4")
                    ).alias("maxsim_e4")
                )
            )
            scored = remaining.join(ms, ["q_id", "vec_id"])
        scored = scored.withColumn(
            "mmr_e8",
            F.lit(int(lam_e4)) * F.col("rel_e4")
            - F.lit(mu) * F.col("maxsim_e4"),
        )
        pick = (
            scored.groupBy("q_id")
            .agg(
                F.max(
                    F.struct(
                        F.col("mmr_e8"),
                        (-F.col("vec_id")).alias("_nv"),
                        F.col("rel_e4").alias("_r"),
                        F.col("maxsim_e4").alias("_m"),
                    )
                ).alias("p")
            )
            .select(
                "q_id",
                F.lit(step).alias("pick_rank"),
                (-F.col("p._nv")).alias("vec_id"),
                F.col("p._r").alias("rel_e4"),
                F.col("p._m").alias("maxsim_e4"),
                F.col("p.mmr_e8").alias("mmr_e8"),
            )
        )
        # checkpoint the ≤ n_queries-row pick: without this the step
        # chain re-evaluates every earlier pick inside both the next
        # step's anti-join AND the final union (the DAG grows
        # combinatorially in k — measured 13.0 s → ~3.8 s at sf0.1 for
        # identical output).  The aggregate is checkpointed BEFORE the
        # downstream joins, per the dedup.connected_components rule.
        # checkpoint_picks=False keeps the fully chained lazy plan — the
        # plan-audit probe (tools/gen_plans.py) uses it to assert the
        # per-step argmax shape (partial_max struct agg), which the
        # production plan hides inside already-materialized RDD scans.
        if checkpoint_picks:
            pick = pick.localCheckpoint(eager=True)
        selected = pick if selected is None else selected.unionByName(pick)
        remaining = remaining.join(
            pick.select("q_id", "vec_id"), ["q_id", "vec_id"], "left_anti"
        )
    return selected


def filtered_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    predicate=None,
) -> DataFrame:
    """Metadata-filtered vector search: exact cosine top-k restricted to
    corpus rows satisfying ``predicate`` (a Column) — the "filtered ANN"
    every production vector store needs (retrieve only docs matching a
    lang/source/label/date gate).  The filter is PRE-scoring, applied to
    the corpus side only: the query-vector lookup stays UNfiltered, so a
    query whose own metadata fails the gate still retrieves (the common
    cross-slice case: "given this English doc, find similar French ones").

    Execution, 100-TB shape: the predicate is a plain Catalyst expression
    on the scan side, so it reaches the parquet reader as a pushed filter
    (plan-asserted: PushedFilters on the scan — the corpus rows that fail
    the gate are never decoded, let alone scored); the query vector rides
    a broadcast (never a collected literal); top-k is
    TakeOrderedAndProject (per-partition heads, never a global sort).
    Pre-filtering beats post-filtering top-k structurally: filter-then-
    score always returns k true matches, while score-then-filter can
    return fewer than k after the gate.  The brute-force scan is the
    exactness baseline; at scale compose the same predicate with the
    IVF/PQ probes (cell pruning and metadata pruning stack).
    """
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_embedding")
    )
    base = emb if predicate is None else emb.filter(predicate)
    scored = base.crossJoin(F.broadcast(q)).select(
        "vec_id",
        "label",
        F.round(_cosine("embedding", "q_embedding"), 4).alias("cosine"),
    )
    return (
        scored.filter(F.col("vec_id") != query_vec_id)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def embedding_decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    threshold_e6: int = 900_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic decontamination: flag every training vector whose cosine
    to ANY eval-benchmark vector reaches ``threshold_e6`` (×10⁻⁶) — the
    embedding-space complement of the exact/n-gram/Bloom decontamination
    family (textstats.decontaminate / bloom_decontaminate), which
    paraphrased or translated benchmark leaks evade (the contamination
    mode documented by Yang et al. 2023, arXiv:2311.04850 — "rephrased
    samples" defeat n-gram overlap).

    Scale shape: the eval set is SMALL by definition (benchmarks are
    10²–10⁵ rows) and broadcasts; scoring is a map-side
    BroadcastNestedLoopJoin over the training scan — zero shuffle until
    the per-train-vector aggregate, which combines map-side (partial
    max).  At 100 TB this is one corpus pass, the same shape the Bloom
    variant uses for token sets.  Norms are hoisted per-row on BOTH
    sides before the join (knn_join lesson: per-PAIR work must be the
    one dot traversal).

    Parity: grid cosine ``floor(dot/(sqrt(n2a·n2b))·1e6)``, NULL-guarded
    for zero norms (0/0 = NaN ERRORS in a SQL mirror's CAST, the
    quantize_int8 lesson) and for dim mismatches (zip_with NULL-pads in
    Spark, a fixed-dim SQL dot errors — the frozen-vector-ops lesson);
    such pairs contribute nothing.  ``nearest_eval_id`` rides the exact
    int64 key ``cos_e6·2³² − eval_id`` (argmax with ties to the LOWEST
    eval id, no struct-max dependence, no second aggregate pass):
    ``cos_e6 ≤ 10⁶`` so the key is ≤ ~4.6×10¹⁵ — overflow-safe while
    eval ids < 2³², asserted in the oracle mirror by construction.

    Returns one row per train vector: ``(id, max_eval_sim_e6 — NULL if
    no eval pair was scorable, nearest_eval_id, is_contaminated —
    False when nothing scorable)``.  Precondition: a non-empty eval set
    (an EMPTY benchmark returns an empty frame — the alternative is a
    second corpus scan just to re-emit ids for a vacuous answer).
    """
    from sparkx.ops.dedup import _dot, _norm2

    K = 2**32
    t = train.select(
        F.col(id_col), F.col(vec_col).alias("_tv")
    ).withColumn("_tn2", _norm2("_tv"))
    e = eval_set.select(
        F.col(id_col).alias("_eid"), F.col(vec_col).alias("_ev")
    ).withColumn("_en2", _norm2("_ev"))
    cos_e6 = F.when(
        (F.size("_tv") == F.size("_ev"))
        & (F.col("_tn2") > 0) & (F.col("_en2") > 0),
        F.floor(
            _dot("_tv", "_ev") / F.sqrt(F.col("_tn2") * F.col("_en2"))
            * F.lit(1_000_000.0)
        ),
    ).cast("long")
    pairs = t.crossJoin(F.broadcast(e)).select(
        id_col,
        cos_e6.alias("cos_e6"),
        (cos_e6 * F.lit(K) - F.col("_eid")).alias("_key"),
    )
    agg = pairs.groupBy(id_col).agg(
        F.max("cos_e6").alias("max_eval_sim_e6"),
        F.max("_key").alias("_maxkey"),
    )
    return agg.select(
        id_col,
        "max_eval_sim_e6",
        (F.col("max_eval_sim_e6") * F.lit(K) - F.col("_maxkey"))
        .alias("nearest_eval_id"),
        F.coalesce(
            F.col("max_eval_sim_e6") >= F.lit(threshold_e6), F.lit(False)
        ).alias("is_contaminated"),
    )


def ivf_assign_join(
    emb: DataFrame,
    centroids_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
    cvec_col: str = "centroid",
) -> DataFrame:
    """Nearest-centroid assignment against a centroid TABLE — the scale
    form of :func:`ivf_assign_frozen`.  Inlined literals stop scaling at
    ~hundreds of centroids (the expression tree grows linearly and every
    task re-interprets it); a production IVF / SemDeDup coarse quantizer
    has 50k–110k centroids, which must arrive as data: a small DataFrame
    BROADCAST into a nested-loop join, per-(vector, centroid) affinities
    scored map-side, and the argmax taken by a per-vector aggregate with
    map-side combine.  One corpus pass, one shuffle row per vector.

    Exactly the same integer-grid affinity as the frozen path —
    ``floor(dot(c, v)/||c||·1e6)`` as a long, argmax with ties to the
    LOWEST cell id via ``max(struct(aff, -cell))`` — so the two paths are
    bit-identical on the same centroids (pinned by pytest: frozen
    artifact as literals vs the same rows through this join).  ||c|| is
    hoisted to a per-row column on the broadcast side (never recomputed
    per pair).

    Guards: dim-mismatched (vector, centroid) pairs are excluded by the
    join predicate — a vector matching NO centroid dimension gets a NULL
    cell through the final left join, mirroring the frozen path's dim
    guard; zero-norm centroids are dropped eagerly (affinity would be
    ±Inf/NaN — a zero centroid is a fit bug, not an assignable cell) and
    NULL vectors never pair.  Returns ``emb`` + ``ivf_cell``.
    """
    from sparkx.ops.dedup import _dot, _norm2

    c = (
        centroids_df.select(
            F.col(cell_col).alias("_cell"), F.col(cvec_col).alias("_cv")
        )
        .withColumn("_cn", F.sqrt(_norm2("_cv")))
        .filter(F.col("_cn") > 0)
    )
    pairs = emb.select(F.col(id_col), F.col(vec_col)).join(
        F.broadcast(c), F.size(F.col(vec_col)) == F.size(F.col("_cv"))
    )
    aff = F.floor(
        _dot(vec_col, "_cv") / F.col("_cn") * F.lit(1_000_000.0)
    ).cast("long")
    best = pairs.groupBy(id_col).agg(
        F.max(
            F.struct(aff.alias("aff"), (-F.col("_cell")).alias("negcell"))
        ).alias("_b")
    )
    return emb.join(best, id_col, "left").select(
        *[F.col(x) for x in emb.columns],
        (-F.col("_b.negcell")).alias("ivf_cell"),
    )


def mutual_knn_pairs(
    emb: DataFrame,
    k: int = 3,
    nbits: int = 8,
    probe_hamming: int = 1,
    checkpoint: bool = True,
) -> DataFrame:
    """Mutual top-k neighbor pairs: ``(a, b)`` such that b is in a's
    top-``k`` cosine neighbors AND a is in b's — the symmetric relation
    margin-based bitext mining (Artetxe & Schwenk, ACL 2019) and
    graph-based semantic dedup build on: one-directional nearness keeps
    hub vectors (a hub is top-1 of thousands; almost none are top-k of
    the hub), mutuality prunes them structurally.

    Built ON :func:`knn_join` (the banded sign-LSH candidate path — same
    probe geometry, same quantized scores), so recall characteristics
    and the 100 TB story are knn_join's: bucketed candidates, never
    all-pairs.  The top-``k`` frame (n·k rows) is lazily checkpointed
    before the mutual self-join — without it the join's two branches
    re-evaluate the whole LSH candidate stage twice (the unrolled-loop
    lesson, CLAUDE.md); pass ``checkpoint=False`` only to keep a pure
    plan for explain/tests.

    Output: one row per unordered mutual pair, ``a_id < b_id``:
    ``(a_id, b_id, cosine — identical in both directions (same dot, same
    norm product, same round), rank_ab — b's rank in a's list, rank_ba —
    a's rank in b's)``.
    """
    top = knn_join(emb, k=k, nbits=nbits, probe_hamming=probe_hamming)
    if checkpoint:
        top = top.localCheckpoint(eager=False)
    a = top.select(
        F.col("q_id").alias("a_id"),
        F.col("vec_id").alias("b_id"),
        "cosine",
        F.col("rank").alias("rank_ab"),
    )
    b = top.select(
        F.col("q_id").alias("_bq"),
        F.col("vec_id").alias("_bv"),
        F.col("rank").alias("rank_ba"),
    )
    return (
        a.join(
            b,
            (F.col("a_id") == F.col("_bv")) & (F.col("b_id") == F.col("_bq")),
        )
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "cosine", "rank_ab", "rank_ba")
    )


def ivf_probe_curve(
    emb: DataFrame,
    centroids: list[list[float]],
    n_queries: int = 8,
    k: int = 10,
    probes: tuple[int, ...] = (1, 2, 4),
) -> DataFrame:
    """Recall-vs-nprobe tuning curve for the frozen-quantizer IVF index —
    the one table an ANN deployment reads to pick its scan fraction:
    :func:`ivf_recall_report` answers "what is recall at THIS nprobe";
    this op sweeps the whole knob in ONE candidate pass.  Probe sets are
    nested (the top-1 cell ⊂ top-2 cells ⊂ …), so candidates are built
    once at ``max(probes)`` with each candidate tagged by its cell's probe
    rank, and the curve point for nprobe=p is simply the top-k over
    candidates with ``cell_rank ≤ p`` — the index is scanned once, not
    once per curve point (at 100 TB the candidate fetch IS the cost; the
    per-p re-rank touches ≤ n_queries·|candidates| bounded rows).

    The scored candidate frame is eagerly localCheckpoint'd before the
    per-p top-k loop — an unrolled k-frame loop over a lazy plan would
    re-evaluate the assignment join once per curve point (the ann_mmr
    lesson); the frame is bounded by the query sample, never the corpus.

    Same integer-grid cosine (floor 1e6, ties vec_id asc) and dim guard
    as the recall report, so the whole curve is value-hash gateable.
    Returns ``(q_id, nprobe, n_overlap)`` — n_queries·|probes| rows,
    monotone nondecreasing in nprobe per query (pinned by test).
    """
    from pyspark.sql import Window

    from sparkx.ops.dedup import _dot, _norm2

    probes = tuple(sorted(set(int(p) for p in probes)))
    max_p = probes[-1]
    dim = len(centroids[0])
    base = (
        emb.filter(F.size("embedding") == dim)
        .select("vec_id", "embedding")
        .withColumn("_n2", _norm2("embedding"))
    )
    q = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_embedding"),
        F.col("_n2").alias("_qn2"),
    )
    grid_ip = F.floor(
        _dot("embedding", "q_embedding")
        / F.sqrt(F.col("_n2") * F.col("_qn2"))
        * F.lit(1_000_000.0)
    ).cast("long")
    w = Window.partitionBy("q_id").orderBy(F.desc("_ip"), F.asc("vec_id"))
    exact_top = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", grid_ip.alias("_ip"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("q_id", "vec_id")
    )
    # probe cells with their rank (1-based), kept through the candidate
    # join so every curve point reads the same tagged frame
    affs = F.array(
        *[
            F.struct(
                _frozen_affinity("q_embedding", c).alias("aff"),
                F.lit(-i).alias("negcell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    probe = q.select(
        "q_id",
        F.posexplode(F.slice(F.reverse(F.array_sort(affs)), 1, max_p)),
    ).select(
        "q_id",
        (F.col("pos") + 1).alias("cell_rank"),
        (-F.col("col.negcell")).alias("ivf_cell"),
    )
    assigned = ivf_assign_frozen(base, centroids)
    cand = (
        assigned.join(F.broadcast(probe), "ivf_cell")
        .join(F.broadcast(q.select("q_id", "q_embedding", "_qn2")), "q_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", "cell_rank", grid_ip.alias("_ip"))
        .localCheckpoint(eager=True)
    )
    spark = emb.sparkSession
    curves = None
    for p in probes:
        top_p = (
            cand.filter(F.col("cell_rank") <= p)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select("q_id", F.lit(p).cast("int").alias("nprobe"), "vec_id")
        )
        curves = top_p if curves is None else curves.unionByName(top_p)
    overlap = (
        curves.join(exact_top, ["q_id", "vec_id"])
        .groupBy("q_id", "nprobe")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    spine = q.select("q_id").crossJoin(
        spark.range(1).select(
            F.explode(
                F.array(*[F.lit(p).cast("int") for p in probes])
            ).alias("nprobe")
        )
    )
    return spine.join(overlap, ["q_id", "nprobe"], "left").select(
        "q_id",
        "nprobe",
        F.coalesce("n_overlap", F.lit(0).cast("long")).alias("n_overlap"),
    )
