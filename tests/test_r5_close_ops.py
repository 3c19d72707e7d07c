"""Loop-mirror tests for the r5-close operators: epoch_schedule
(data-constrained epoch-repeat allocation) and mmr_rerank (maximal-
marginal-relevance diversified context re-rank).  Each Spark result is
compared against a boring pure-Python recomputation, plus the edge paths
the driver's clean testdata never exercises (quality ties across the
bucket-decomposition boundary, the budget straddler, a diversity-forcing
near-duplicate candidate, fewer candidates than k)."""

from __future__ import annotations

import math

# ───────────────────────── epoch_schedule ──────────────────────────────────


def _epoch_mirror(rows, budget, e):
    """Global-cumsum mirror: rows = [(id, toks, q_e4)]; returns
    {id: (toks, q_e4, cum_before, repeats, sched_tokens)}."""
    ordered = sorted(rows, key=lambda t: (-t[2], t[0]))
    out, cum = {}, 0
    for did, toks, q_e4 in ordered:
        if toks <= 0:
            rep = 0
        elif cum >= budget:
            rep = 0
        else:
            rep = min(e, (budget - cum) // toks)
        out[did] = (toks, q_e4, cum, rep, rep * toks)
        cum += toks * e
    return out


def test_epoch_schedule_mirror_with_straddler_and_ties(spark):
    """Hand-built schedule exercising all three regimes (full repeats,
    the floor-partial straddler, the zero tail), a quality tie straddling
    the budget cutoff (the within-bucket id-asc order decides who gets
    epochs), and a NULL quality sorting last."""
    from sparkx.ops.corpus import epoch_schedule

    # (doc_id, q, n_words): budget 100, E=3.
    # A(q .9, 20 toks) cap 60 → 3 epochs; B(q .8, 20) cum 60 → partial
    # (100−60)//20 = 2; C(q .8, 10, HIGHER id than B) cum 120 → 0 — the
    # tie inside the q=.8 bucket resolves by id asc, so B eats the budget
    # first; D(q NULL → −1) last → 0.
    rows = [
        (1, 0.9, 20), (2, 0.8, 20), (3, 0.8, 10), (4, None, 30),
    ]
    df = spark.createDataFrame(
        [(i, q, " ".join(f"w{j}" for j in range(n))) for i, q, n in rows],
        "doc_id long, q double, text string",
    )
    got = {
        r["doc_id"]: (
            r["toks"], r["q_e4"], r["cum_before"], r["repeats"],
            r["sched_tokens"],
        )
        for r in epoch_schedule(
            df, budget_tokens=100, max_epochs=3, quality_col="q"
        ).collect()
    }
    want = _epoch_mirror(
        [(i, n, int(round((q if q is not None else -1.0) * 10000)))
         for i, q, n in rows],
        budget=100, e=3,
    )
    assert got == want
    # non-vacuity: the three regimes actually occur
    assert got[1][3] == 3 and got[2][3] == 2 and got[3][3] == 0
    assert got[4][3] == 0 and got[4][1] == -10000


def test_epoch_schedule_decomposition_equals_global_cumsum(spark):
    """120 docs over a handful of quality buckets (forcing multi-row
    buckets AND multi-bucket spans): the engine's scan-sum decomposition
    must equal the single global ranked cumsum exactly."""
    from sparkx.ops.corpus import epoch_schedule

    docs = [
        (i, ((i * 7) % 5) / 10.0, 1 + (i * 13) % 9) for i in range(120)
    ]
    df = spark.createDataFrame(
        [(i, q, " ".join(f"w{j}" for j in range(n))) for i, q, n in docs],
        "doc_id long, q double, text string",
    )
    budget, e = 700, 4
    got = {
        r["doc_id"]: (
            r["toks"], r["q_e4"], r["cum_before"], r["repeats"],
            r["sched_tokens"],
        )
        for r in epoch_schedule(
            df, budget_tokens=budget, max_epochs=e, quality_col="q"
        ).collect()
    }
    want = _epoch_mirror(
        [(i, n, int(round(q * 10000))) for i, q, n in docs],
        budget=budget, e=e,
    )
    assert got == want
    # sanity: budget binds (a zero tail exists) and some doc is partial
    reps = sorted(v[3] for v in got.values())
    assert reps[0] == 0 and reps[-1] == e


def test_epoch_schedule_inline_quality_matches_quality_score(spark):
    from sparkx.ops.corpus import epoch_schedule
    from sparkx.ops.textstats import quality_score

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "!!! ??? ,,, ;;; ..."),
        (3, "a b c d e f g h i j k l m n o p q r s t"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    inline = sorted(
        epoch_schedule(df, budget_tokens=30, max_epochs=2).collect(),
        key=lambda r: r["doc_id"],
    )
    pre = sorted(
        epoch_schedule(
            df.withColumn("q", quality_score("text")),
            budget_tokens=30, max_epochs=2, quality_col="q",
        ).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [r.asDict() for r in inline] == [r.asDict() for r in pre]


# ───────────────────────── mmr_rerank ──────────────────────────────────────


def _mmr_mirror(vecs, n_queries, n_cands, k, lam=5000):
    """Pure-Python greedy MMR on the op's exact grids; returns
    [(q_id, pick_rank, vec_id, rel_e4, maxsim_e4, mmr_e8)]."""

    def cos4(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return round(
            num / math.sqrt(sum(x * x for x in a) * sum(y * y for y in b)), 4
        )

    mu = 10000 - lam
    out = []
    for q in range(n_queries):
        ranked = sorted(
            ((cos4(v, vecs[q]), vid) for vid, v in vecs.items() if vid != q),
            key=lambda t: (-t[0], t[1]),
        )[:n_cands]
        rel = {vid: int(round(c * 10000)) for c, vid in ranked}
        sim = {
            (a, b): int(round(cos4(vecs[a], vecs[b]) * 10000))
            for a in rel for b in rel if a != b
        }
        sel = []
        for step in range(1, k + 1):
            rem = [v for v in rel if v not in sel]
            if not rem:
                break
            def clamped_ms(v):
                # clamp at 0 — anti-similarity earns no diversity bonus
                return max(0, max((sim[(v, s)] for s in sel), default=0))

            scored = sorted(
                ((lam * rel[v] - mu * clamped_ms(v), -v, v) for v in rem),
                reverse=True,
            )
            score, _nv, vid = scored[0]
            ms = clamped_ms(vid)
            out.append((q, step, vid, rel[vid], ms, score))
            sel.append(vid)
    return out


def _f32(vecs):
    import numpy as np

    return {
        vid: [float(np.float32(x)) for x in v] for vid, v in vecs.items()
    }


def test_mmr_diversity_beats_plain_topk(spark):
    """B is an exact scalar multiple of A (sim 1.0, rel tied with A), C is
    diverse but lower-relevance: plain top-2 picks A then B; MMR at
    λ=0.3 must pick A then C — and the full frame must equal the mirror.
    (The negative-relevance fillers fall outside n_cands=3; the maxsim
    clamp itself is exercised by the multi-query mirror fixture, whose
    candidate sets contain anti-correlated members.)"""
    from sparkx.ops.similarity import mmr_rerank

    vecs = {
        0: [1000.0, 0.0],       # the query
        1: [999.0, 40.0],       # A: top relevance
        2: [1998.0, 80.0],      # B: exact duplicate direction of A
        3: [700.0, 700.0],      # C: diverse, lower relevance
        4: [-500.0, 863.0],     # filler (negative relevance)
        5: [-900.0, -100.0],    # filler (anti-correlated with A)
    }
    df = spark.createDataFrame(
        [(vid, v) for vid, v in sorted(vecs.items())],
        "vec_id long, embedding array<float>",
    )
    got = sorted(
        (
            r["q_id"], r["pick_rank"], r["vec_id"], r["rel_e4"],
            r["maxsim_e4"], r["mmr_e8"],
        )
        for r in mmr_rerank(
            df, n_queries=1, n_cands=3, k=3, lam_e4=3000
        ).collect()
    )
    want = sorted(_mmr_mirror(_f32(vecs), 1, 3, 3, lam=3000))
    assert got == want
    picks = [vid for (_q, _r, vid, *_rest) in got]
    # plain top-2 by relevance is [1, 2]; MMR demotes the duplicate
    assert picks[0] == 1 and picks[1] == 3
    assert 2 not in picks[:2]


def test_mmr_mirror_multi_query(spark):
    """Deterministic 14-vector fixture, 3 queries: full frame equality
    against the mirror at the default λ=0.5."""
    from sparkx.ops.similarity import mmr_rerank

    vecs = {
        i: [((i * 37) % 23) - 11.0, ((i * 53) % 29) - 14.0, (i % 5) - 2.0]
        for i in range(14)
    }
    # keep norms nonzero
    vecs = {i: (v if any(v) else [1.0, 0.0, 0.0]) for i, v in vecs.items()}
    df = spark.createDataFrame(
        [(vid, v) for vid, v in sorted(vecs.items())],
        "vec_id long, embedding array<float>",
    )
    got = sorted(
        (
            r["q_id"], r["pick_rank"], r["vec_id"], r["rel_e4"],
            r["maxsim_e4"], r["mmr_e8"],
        )
        for r in mmr_rerank(df, n_queries=3, n_cands=8, k=4).collect()
    )
    want = sorted(_mmr_mirror(_f32(vecs), 3, 8, 4))
    assert got == want


def test_mmr_fewer_candidates_than_k(spark):
    """4 vectors, 1 query → only 3 candidates: all are emitted with a
    gap-free 1..3 rank sequence (no padding, no crash)."""
    from sparkx.ops.similarity import mmr_rerank

    vecs = {0: [1.0, 0.0], 1: [0.9, 0.1], 2: [0.0, 1.0], 3: [-1.0, 0.5]}
    df = spark.createDataFrame(
        [(vid, v) for vid, v in sorted(vecs.items())],
        "vec_id long, embedding array<float>",
    )
    rows = sorted(
        mmr_rerank(df, n_queries=1, n_cands=10, k=5).collect(),
        key=lambda r: r["pick_rank"],
    )
    assert [r["pick_rank"] for r in rows] == [1, 2, 3]
    assert {r["vec_id"] for r in rows} == {1, 2, 3}
    want = sorted(_mmr_mirror(_f32(vecs), 1, 10, 5))
    got = sorted(
        (
            r["q_id"], r["pick_rank"], r["vec_id"], r["rel_e4"],
            r["maxsim_e4"], r["mmr_e8"],
        )
        for r in rows
    )
    assert got == want
