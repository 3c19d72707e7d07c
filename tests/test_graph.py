"""Link-graph analytics (sparkx/ops/graph.py) vs a pure-Python loop oracle.

The oracle runs the same integer-grid PageRank recurrence with plain dict
loops — micro-unit longs and floor division make the result bit-identical
regardless of summation order, so equality is exact (no tolerance).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from sparkx.ops import graph as G
from sparkx.ops import html_extract as H

GRID = 1_000_000

# skewed graph: hub 0 (everyone links to it), a chain, a 2-cycle, and a
# dangling node 9 (out_deg 0 — contributes nothing, keeps floor rank)
EDGES = [
    (1, 0), (2, 0), (3, 0), (4, 0), (5, 0), (6, 0),
    (1, 2), (2, 3), (3, 4),
    (7, 8), (8, 7),
    (0, 9),
]


def pagerank_py(edges, iters=3):
    nodes = sorted({s for s, d in edges} | {d for s, d in edges})
    out_deg = Counter(s for s, d in edges)
    in_deg = Counter(d for s, d in edges)
    n = len(nodes)
    base = (15 * GRID) // (100 * n)
    r = {v: GRID // n for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for src, dst in edges:
            s[dst] += r[src] // out_deg[src]
        r = {v: base + (85 * s[v]) // 100 for v in nodes}
    return {
        v: (r[v] / GRID, in_deg.get(v, 0), out_deg.get(v, 0)) for v in nodes
    }


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def test_degrees_match_loop(spark):
    got = {
        r["id"]: (r["in_deg"], r["out_deg"])
        for r in G.degrees(_edges_df(spark, EDGES)).collect()
    }
    ind = Counter(d for s, d in EDGES)
    outd = Counter(s for s, d in EDGES)
    want = {
        v: (ind.get(v, 0), outd.get(v, 0))
        for v in {s for s, d in EDGES} | {d for s, d in EDGES}
    }
    assert got == want


def test_pagerank_matches_loop_oracle_exactly(spark):
    # threshold=0 forces the distributed loop (the 100 TB path); the
    # default would resolve this 12-edge graph on the driver
    for iters in (1, 3, 5):
        got = {
            r["doc_id"]: (r["pagerank"], r["in_deg"], r["out_deg"])
            for r in G.pagerank(
                _edges_df(spark, EDGES), iters=iters,
                driver_edges_threshold=0,
            ).collect()
        }
        assert got == pagerank_py(EDGES, iters=iters), iters


def test_driver_and_distributed_paths_identical(spark):
    df = _edges_df(spark, EDGES)
    drv = sorted(map(tuple, G.pagerank(df, iters=3).collect()))
    dist = sorted(
        map(tuple, G.pagerank(df, iters=3, driver_edges_threshold=0).collect())
    )
    assert drv == dist
    assert [type(v) for v in drv[0]] == [type(v) for v in dist[0]]


def test_pagerank_hub_outranks_chain_and_dangling(spark):
    got = {
        r["doc_id"]: r["pagerank"]
        for r in G.pagerank(_edges_df(spark, EDGES), iters=3).collect()
    }
    assert got[9] == max(got.values())  # collects the hub's entire rank
    assert got[0] > got[1] and got[0] > got[4]  # 6-in-link hub beats chain
    # floor-division mass loss only ever shrinks total rank below 1.0
    assert sum(got.values()) <= 1.0


def test_pagerank_checkpoint_every_is_semantically_inert(spark):
    plain = sorted(
        map(tuple, G.pagerank(_edges_df(spark, EDGES), iters=4).collect())
    )
    ckpt = sorted(
        map(
            tuple,
            G.pagerank(
                _edges_df(spark, EDGES), iters=4, checkpoint_every=2,
                driver_edges_threshold=0,
            ).collect(),
        )
    )
    assert plain == ckpt


def test_extract_links_round_trip(spark):
    # 120 docs: the mod-97 hub link is live (97 < 120) and the (3d+1) mod n
    # bijection wraps; the arithmetic ground truth must equal the
    # render→regex extraction exactly
    n = 120
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc {i} words enough here", "web")
         for i in range(n)],
        "doc_id long, text string, source string",
    )
    got = sorted(
        (r["src"], r["dst"])
        for r in H.extract_links(H.render_pages(docs, link_mod=n)).collect()
    )
    want = sorted(
        {(i, (3 * i + 1) % n) for i in range(n)}
        | {(i, i % 97) for i in range(n)}
        - {(i, i) for i in range(n)}
    )
    want = sorted((s, d) for s, d in want if s != d)
    assert got == want
    # nav/menu/ad/footer hrefs (/about, /buy, …) never leak into the graph
    assert all(0 <= d < n for _, d in got)


def test_render_without_link_mod_is_unchanged(spark):
    docs = spark.createDataFrame(
        [(i, f"some words for document {i}", "web") for i in range(5)],
        "doc_id long, text string, source string",
    )
    html = {r["doc_id"]: r["html"] for r in H.render_pages(docs).collect()}
    assert all('class="rel"' not in h for h in html.values())


def test_extract_pagerank_end_to_end_matches_loop(spark):
    n = 120
    docs = spark.createDataFrame(
        [(i, f"token stream for page {i}", "web") for i in range(n)],
        "doc_id long, text string, source string",
    )
    edges_df = H.extract_links(H.render_pages(docs, link_mod=n))
    edges = [(r["src"], r["dst"]) for r in edges_df.collect()]
    got = {
        r["doc_id"]: (r["pagerank"], r["in_deg"], r["out_deg"])
        for r in G.pagerank(edges_df, iters=3).collect()
    }
    assert got == pagerank_py(edges, iters=3)
    # the first 97 docs collect hub in-links → skewed, non-uniform ranks
    assert len({pr for pr, _, _ in got.values()}) > 5


def hits_py(edges, iters=2):
    """Independent HITS loop: adjacency-list traversal (vs the kernel's
    edge-list sweep), same integer-grid max normalization."""
    nodes = sorted({s for s, d in edges} | {d for s, d in edges})
    out_adj = {v: [] for v in nodes}
    in_adj = {v: [] for v in nodes}
    for s, d in edges:
        out_adj[s].append(d)
        in_adj[d].append(s)
    h = {v: GRID for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(iters):
        a = {v: sum(h[u] for u in in_adj[v]) for v in nodes}
        ma = max(a.values())
        a = {v: (a[v] * GRID) // ma for v in nodes}
        h = {v: sum(a[d] for d in out_adj[v]) for v in nodes}
        mh = max(h.values())
        h = {v: (h[v] * GRID) // mh for v in nodes}
    return {v: (h[v] / GRID, a[v] / GRID) for v in nodes}


def test_hits_matches_loop_oracle_both_paths(spark):
    df = _edges_df(spark, EDGES)
    want = hits_py(EDGES, iters=2)
    for thresh in (1_000_000, 0):  # driver fast path, distributed loop
        got = {
            r["doc_id"]: (r["hub"], r["authority"])
            for r in G.hits(df, iters=2, driver_edges_threshold=thresh)
            .collect()
        }
        assert got == want, thresh


def test_hits_hub_and_authority_structure(spark):
    got = {
        r["doc_id"]: (r["hub"], r["authority"])
        for r in G.hits(_edges_df(spark, EDGES), iters=2).collect()
    }
    # node 0 receives 6 in-links → the top authority (normalized to 1.0)
    assert got[0][1] == 1.0
    assert got[0][1] == max(a for _, a in got.values())
    # nodes pointing at 0 are the strong hubs; the dangling node 9 has
    # no out-links → hub exactly 0
    assert got[9][0] == 0.0
    assert max(h for h, _ in got.values()) == 1.0


def test_empty_edge_set_yields_empty_results(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    for thresh in (1_000_000, 0):
        pr = G.pagerank(empty, iters=3, driver_edges_threshold=thresh)
        assert pr.count() == 0
        assert [f.name for f in pr.schema.fields] == [
            "doc_id", "pagerank", "in_deg", "out_deg"]
        ht = G.hits(empty, iters=2, driver_edges_threshold=thresh)
        assert ht.count() == 0
        assert [f.name for f in ht.schema.fields] == [
            "doc_id", "hub", "authority"]


def _chains_dict(df):
    return {r.src: (r.terminal, r.hops, r.resolved) for r in df.collect()}


def test_resolve_chains_topologies(spark):
    """Chain / cycle / over-cap semantics of the bounded-resolution
    contract: exact hop counts for resolved chains, NULL terminal for
    cycles AND for chains longer than max_hops (indistinguishable by
    design)."""
    # 1→2→3→99 (terminal), 10→11→10 (2-cycle), 20→20? no self — 20→21→22→23→24→98
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 99), (10, 11), (11, 10),
         (20, 21), (21, 22), (22, 23), (23, 24), (24, 98)],
        "src long, dst long",
    )
    got = _chains_dict(G.resolve_chains(edges, max_hops=64))
    assert got[1] == (99, 3, True)
    assert got[2] == (99, 2, True)
    assert got[3] == (99, 1, True)
    assert got[10] == (None, None, False)   # cycle
    assert got[11] == (None, None, False)
    assert got[20] == (98, 5, True)
    # cap below the 5-hop chain: 20 becomes unresolved, 22 (3 hops) resolves
    capped = _chains_dict(G.resolve_chains(edges, max_hops=3))
    assert capped[20] == (None, None, False)
    assert capped[21] == (None, None, False)  # 4 hops > cap 3
    assert capped[22] == (98, 3, True)
    assert capped[1] == (99, 3, True)


def test_resolve_chains_distributed_equals_driver(spark):
    """The pointer-doubling loop (driver_edges_threshold=0) is bit-identical
    to the driver walk on a mixed graph: long chain + cycle + short chains,
    including an exactly-at-cap chain."""
    rows = [(i, i + 1) for i in range(40)]          # 0→1→…→40 (terminal 40)
    rows += [(100, 101), (101, 102), (102, 100)]    # 3-cycle
    rows += [(200, 201)]                            # 1-hop
    edges = spark.createDataFrame(rows, "src long, dst long")
    drv = _chains_dict(G.resolve_chains(edges, max_hops=40))
    dist = _chains_dict(
        G.resolve_chains(edges, max_hops=40, driver_edges_threshold=0)
    )
    assert drv == dist
    assert drv[0] == (40, 40, True)     # exactly at cap → resolved
    assert drv[100] == (None, None, False)
    assert drv[200] == (201, 1, True)
    # one hop over cap
    drv39 = _chains_dict(G.resolve_chains(edges, max_hops=39))
    dist39 = _chains_dict(
        G.resolve_chains(edges, max_hops=39, driver_edges_threshold=0)
    )
    assert drv39 == dist39
    assert drv39[0] == (None, None, False)
    assert drv39[1] == (40, 39, True)


def test_resolve_chains_empty(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    for thresh in (1_000_000, 0):
        out = G.resolve_chains(empty, driver_edges_threshold=thresh)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == [
            "src", "terminal", "hops", "resolved"]
