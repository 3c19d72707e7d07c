"""Link-graph analytics over extracted hyperlink edges: degrees, a
fixed-iteration PageRank (Page et al. 1999), and fixed-iteration HITS
hubs/authorities (Kleinberg, JACM 1999) in exact integer arithmetic.

Everything runs on a micro-unit grid (rank × 10^6 as a long): the per-edge
contribution is ``r_q div out_deg`` and the damping update is
``(15·grid) div (100·n) + (85·S) div 100`` — integer division and long sums
only, so the result is bit-identical across engines and partition orders
(float summation is order-sensitive; an unrounded float PageRank can never
pass a value-hash gate).  The deliberate cost is the mass lost to floor
division (≤ out_deg micro-units per node per round) — identical in every
engine, so parity holds exactly.

Scale notes (100 TB): edges join ranks on src (the natural co-partition
key), contributions aggregate map-side onto dst, and each iteration is two
bounded shuffles.  The edge frame is persisted once and reused every
iteration; for long runs `checkpoint_every` truncates rank lineage the same
way `dedup.connected_components` does.  Dangling nodes (out_deg 0) simply
contribute nothing — with the damping base term their rank stays at the
floor, matching the "no redistribution" PageRank variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

GRID = 1_000_000


def degrees(edges: DataFrame) -> DataFrame:
    """(id, in_deg, out_deg) for every node appearing in the edge list."""
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    outd = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    ind = edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("in_deg")
    )
    return (
        nodes.join(outd, "id", "left")
        .join(ind, "id", "left")
        .select(
            "id",
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        )
    )


def _step(e: DataFrame, nodes: DataFrame, ranks: DataFrame,
          base_q: int) -> DataFrame:
    """One PageRank iteration: contributions flow edges⋈ranks on src, are
    floor-divided by out_deg, and sum map-side-combined onto dst; the
    damping base term comes back via a left join on the node list (exposed
    module-level so the plan audit can grade the per-iteration shape)."""
    contrib = (
        e.join(ranks.select(F.col("id").alias("src"), "r_q"), "src")
        .select(
            F.col("dst").alias("id"),
            F.expr("r_q div out_deg").alias("c_q"),
        )
    )
    s = contrib.groupBy("id").agg(F.sum("c_q").alias("s_q"))
    return nodes.join(s, "id", "left").select(
        "id",
        (F.lit(base_q)
         + F.expr("(85 * coalesce(s_q, 0L)) div 100")).alias("r_q"),
    )


PAGERANK_SCHEMA = "doc_id long, pagerank double, in_deg long, out_deg long"
HITS_SCHEMA = "doc_id long, hub double, authority double"


def _pagerank_driver(spark, pairs: list, iters: int) -> DataFrame:
    """Small-graph fast path: the same integer-grid recurrence as plain
    dict loops on the driver — one collect, zero iterative jobs.  Output
    is bit-identical to the distributed loop by construction (integer
    floor-div arithmetic is order-free), verified by
    tests/test_graph.py::test_driver_and_distributed_paths_identical."""
    from collections import Counter

    if not pairs:
        return spark.createDataFrame([], PAGERANK_SCHEMA)
    nodes = sorted({s for s, _ in pairs} | {d for _, d in pairs})
    out_deg = Counter(s for s, _ in pairs)
    in_deg = Counter(d for _, d in pairs)
    n = len(nodes)
    base_q = (15 * GRID) // (100 * n)
    r = {v: GRID // n for v in nodes}
    for _ in range(iters):
        s = dict.fromkeys(nodes, 0)
        for src, dst in pairs:
            s[dst] += r[src] // out_deg[src]
        r = {v: base_q + (85 * s[v]) // 100 for v in nodes}
    return spark.createDataFrame(
        [(v, r[v] / GRID, in_deg.get(v, 0), out_deg.get(v, 0))
         for v in nodes],
        "doc_id long, pagerank double, in_deg long, out_deg long",
    )


def pagerank(edges: DataFrame, iters: int = 3, n_nodes: int | None = None,
             checkpoint_every: int | None = None,
             driver_edges_threshold: int = 1_000_000) -> DataFrame:
    """Fixed-iteration integer-grid PageRank with damping 0.85.

    Output: (doc_id, pagerank double, in_deg, out_deg) — ``pagerank`` is
    the exact micro-unit long divided by 10^6, so the double is the same
    in every engine.  ``n_nodes`` defaults to the distinct node count (one
    tiny driver scalar).

    Edge sets ≤ ``driver_edges_threshold`` resolve on the driver in one
    collect (same pattern as `dedup.connected_components`: at sf-test
    scale the distributed loop's wall is per-job fixed overhead, not
    data); pass 0 to force the distributed path.  The edge frame is
    persisted either way, so the probe count never re-runs the upstream
    extraction."""
    edges = edges.persist()
    if driver_edges_threshold and edges.count() <= driver_edges_threshold:
        pairs = [(r[0], r[1]) for r in edges.select("src", "dst").collect()]
        out = _pagerank_driver(edges.sparkSession, pairs, iters)
        edges.unpersist()
        return out

    deg = degrees(edges)
    if n_nodes is None:
        n_nodes = deg.count()
    if n_nodes == 0:  # no edges → no nodes; avoid the div-by-zero base term
        edges.unpersist()
        return edges.sparkSession.createDataFrame([], PAGERANK_SCHEMA)
    base_q = (15 * GRID) // (100 * n_nodes)
    init_q = GRID // n_nodes

    e = (
        edges.join(
            deg.select(F.col("id").alias("src"), "out_deg"), "src"
        ).select("src", "dst", "out_deg").persist()
    )
    nodes = deg.select("id")
    ranks = nodes.select("id", F.lit(init_q).cast("long").alias("r_q"))
    for i in range(iters):
        ranks = _step(e, nodes, ranks, base_q)
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    # materialize the final ranks and the degree table (tiny: 2-3 longs per
    # node) so the persisted edge frames can be released NOW — returning a
    # lazy plan over `e`/`edges` and unpersisting them here would silently
    # recompute the whole upstream chain at the caller's first action
    ranks = ranks.localCheckpoint(eager=True)
    deg = deg.localCheckpoint(eager=True)
    e.unpersist()
    edges.unpersist()
    return ranks.join(deg, "id").select(
        F.col("id").alias("doc_id"),
        (F.col("r_q") / GRID).alias("pagerank"),
        "in_deg", "out_deg",
    )


def _hits_driver(spark, pairs: list, iters: int) -> DataFrame:
    """Small-graph fast path for `hits` — same integer recurrence as dict
    loops on the driver; bit-identical to the distributed loop."""
    if not pairs:
        return spark.createDataFrame([], HITS_SCHEMA)
    nodes = sorted({s for s, _ in pairs} | {d for _, d in pairs})
    h = dict.fromkeys(nodes, GRID)
    a = dict.fromkeys(nodes, 0)
    for _ in range(iters):
        a = dict.fromkeys(nodes, 0)
        for src, dst in pairs:
            a[dst] += h[src]
        ma = max(a.values())
        a = {v: (a[v] * GRID) // ma for v in nodes}
        h = dict.fromkeys(nodes, 0)
        for src, dst in pairs:
            h[src] += a[dst]
        mh = max(h.values())
        h = {v: (h[v] * GRID) // mh for v in nodes}
    return spark.createDataFrame(
        [(v, h[v] / GRID, a[v] / GRID) for v in nodes],
        "doc_id long, hub double, authority double",
    )


def _scale_by_max(scores: DataFrame, col: str) -> DataFrame:
    """score*GRID div max(score) — the integer-grid HITS normalizer.  The
    max comes back as a broadcast 1-row cross join, so the whole iteration
    stays one lazy plan (no per-iteration driver action)."""
    m = scores.agg(F.max(col).alias("_m"))
    return (
        scores.crossJoin(F.broadcast(m))
        .select(
            "id", F.expr(f"({col} * {GRID}L) div _m").alias(col),
        )
    )


def hits(edges: DataFrame, iters: int = 2,
         driver_edges_threshold: int = 1_000_000) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg, JACM 1999): authority(v) sums the
    hub scores linking TO v, hub(u) sums the authority scores u links to;
    each half-step is max-normalized onto the ×10^6 integer grid
    (``score*GRID div max`` — the L2 norm of the textbook form is
    irrational, so max-normalization keeps the fixed point comparable
    while staying bit-identical across engines and partition orders).

    Output: (doc_id, hub double, authority double), both exact micro-unit
    longs over 10^6.  Per iteration: edges⋈hubs on src summed onto dst,
    then edges⋈authorities on dst summed onto src — two bounded shuffles
    each, with the 1-row max broadcast back.  Small edge sets resolve on
    the driver like `pagerank`; pass ``driver_edges_threshold=0`` to force
    the distributed loop.

    Range bound: the scale step computes ``raw*10^6`` in long arithmetic,
    so a node whose raw score exceeds 9.2e12 — in-degree beyond ~9.2M at
    the 10^6 hub ceiling — would overflow; at that scale drop GRID to
    10^4 (the recurrence is grid-invariant up to rounding)."""
    edges = edges.persist()
    if driver_edges_threshold and edges.count() <= driver_edges_threshold:
        pairs = [(r[0], r[1]) for r in edges.select("src", "dst").collect()]
        out = _hits_driver(edges.sparkSession, pairs, iters)
        edges.unpersist()
        return out

    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    h = nodes.select("id", F.lit(GRID).cast("long").alias("h_q"))
    a = nodes.select("id", F.lit(0).cast("long").alias("a_q"))
    for i in range(iters):
        a_raw = (
            edges.join(h.select(F.col("id").alias("src"), "h_q"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("h_q").alias("a_q"))
        )
        a = _scale_by_max(
            nodes.join(a_raw, "id", "left")
            .select("id", F.coalesce("a_q", F.lit(0)).alias("a_q")),
            "a_q",
        )
        h_raw = (
            edges.join(a.select(F.col("id").alias("dst"), "a_q"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("a_q").alias("h_q"))
        )
        h = _scale_by_max(
            nodes.join(h_raw, "id", "left")
            .select("id", F.coalesce("h_q", F.lit(0)).alias("h_q")),
            "h_q",
        )
        # each iteration chains 4 joins; truncate lineage every round so a
        # long run cannot stack-overflow the planner (tiny frames: 2 longs)
        a = a.localCheckpoint(eager=True)
        h = h.localCheckpoint(eager=True)
    out = h.join(a, "id").select(
        F.col("id").alias("doc_id"),
        (F.col("h_q") / GRID).alias("hub"),
        (F.col("a_q") / GRID).alias("authority"),
    ).localCheckpoint(eager=True)
    nodes.unpersist()
    edges.unpersist()
    return out


def _resolve_driver(spark, pairs: list[tuple[int, int]], max_hops: int) -> DataFrame:
    """Small-graph fast path: walk every chain with a Python dict — exact
    under the SAME bounded-resolution contract as the distributed loop
    (resolved iff a terminal is reached within ``max_hops`` steps), so the
    two paths are bit-identical by construction (pinned in tests)."""
    nxt = dict(pairs)
    rows = []
    for src, _ in pairs:
        cur, hops = src, 0
        while hops < max_hops and cur in nxt:
            cur = nxt[cur]
            hops += 1
        if cur in nxt:  # still redirecting after max_hops → unresolved
            rows.append((src, None, None, False))
        else:
            rows.append((src, cur, hops, True))
    return spark.createDataFrame(
        sorted(rows), "src long, terminal long, hops long, resolved boolean"
    )


def resolve_chains(
    edges: DataFrame,
    max_hops: int = 64,
    driver_edges_threshold: int = 1_000_000,
) -> DataFrame:
    """Redirect/canonical-chain resolution by POINTER DOUBLING: map every
    source in a functional graph (each src has exactly one dst — HTTP
    redirects, rel=canonical links, alias tables) to its terminal target,
    with the exact hop count — the URL-canonicalization pass a crawl
    corpus runs before dedup, where following chains one hop per job would
    take O(chain length) rounds.

    Doubling composes the pointer map with itself each round
    (x→f(x) becomes x→f(f(x))), so ``ceil(log2(max_hops))`` self-joins
    resolve every chain up to ``max_hops`` — 6 bounded shuffles for
    64-hop chains at any corpus size, the canonical log-round primitive
    (same family as Wikipedia-scale label propagation; contrast
    ``connected_components``, which solves the UNDIRECTED grouping
    problem).  Distances stay exact: adopting an ancestor's pointer adds
    its distance, never an estimate.

    Bounded-resolution contract: a source whose chain has not reached a
    terminal within ``max_hops`` steps (true cycle, or a longer-than-cap
    chain) returns ``(terminal=NULL, hops=NULL, resolved=false)`` — cycles
    are indistinguishable from over-cap chains by design, and both are
    what a crawler drops.  Edge sets ≤ ``driver_edges_threshold`` resolve
    on the driver (the connected_components fast-path pattern); force the
    distributed loop in tests with ``driver_edges_threshold=0``.

    Returns ``(src, terminal, hops, resolved)``, one row per distinct src.
    """
    import math

    e = edges.select("src", "dst").distinct()
    if driver_edges_threshold and e.count() <= driver_edges_threshold:
        pairs = [(r.src, r.dst) for r in e.collect()]
        return _resolve_driver(edges.sparkSession, pairs, max_hops)

    srcs = e.select(F.col("src").alias("node")).distinct()
    # P: src → (ptr at distance dist along its chain)
    p = e.select("src", F.col("dst").alias("ptr"), F.lit(1).cast("long").alias("dist"))
    p = p.localCheckpoint(eager=True)
    rounds = max(1, math.ceil(math.log2(max_hops)))
    for _ in range(rounds):
        q = p.select(
            F.col("src").alias("q_node"),
            F.col("ptr").alias("q_ptr"),
            F.col("dist").alias("q_dist"),
        )
        p = (
            p.join(q, p["ptr"] == q["q_node"], "left")
            .select(
                "src",
                F.coalesce("q_ptr", "ptr").alias("ptr"),
                (F.col("dist") + F.coalesce("q_dist", F.lit(0))).alias("dist"),
            )
            .localCheckpoint(eager=True)  # truncate the doubling lineage
        )
    # resolved iff the final pointer is a terminal (no outgoing edge)
    # AND within the hop budget
    out = (
        p.join(srcs.select(F.col("node").alias("ptr")), "ptr", "left_anti")
        .select("src", "ptr", "dist")
        .filter(F.col("dist") <= max_hops)
    )
    return (
        p.select("src")
        .distinct()
        .join(
            out.select(
                "src",
                F.col("ptr").alias("terminal"),
                F.col("dist").alias("hops"),
            ),
            "src",
            "left",
        )
        .select(
            "src",
            "terminal",
            "hops",
            F.col("terminal").isNotNull().alias("resolved"),
        )
    )
