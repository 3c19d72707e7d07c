"""Loop-mirror tests for semdedup (SemDeDup, Abbas et al. 2023): the
order-based prune rule pinned against greedy-against-kept, the zero-norm /
ragged-dim / NULL guards, exact-duplicate drop, and a full mirror on
random vectors against the frozen production artifact."""

from __future__ import annotations

import math

import pytest


def _assign(v, centroids):
    """Mirror of ivf_assign_frozen: argmax floor(dot(c,v)/||c||*1e6),
    ties to the LOWEST cell; None for dim mismatch / NULL."""
    if v is None or len(v) != len(centroids[0]):
        return None
    best = None
    for i, c in enumerate(centroids):
        cn = math.sqrt(sum(x * x for x in c))
        aff = math.floor(sum(a * b for a, b in zip(c, v)) / cn * 1e6)
        if best is None or aff > best[0]:
            best = (aff, i)
    return best[1]


def _mirror(rows, centroids, thr):
    """Pure-loop semdedup: per id, max grid-cosine to lower-id cell-mates
    (norm-guarded) and the lowest-id mate at/above threshold."""
    cells = {i: _assign(v, centroids) for i, v in rows}
    n2 = {i: (None if v is None else sum(x * x for x in v)) for i, v in rows}
    vec = dict(rows)
    out = {}
    for i, _ in rows:
        maxsim, dup = None, None
        for j, _ in rows:
            if j >= i or cells[i] is None or cells[j] != cells[i]:
                continue
            if n2[i] > 0 and n2[j] > 0:
                c = math.floor(
                    sum(a * b for a, b in zip(vec[i], vec[j]))
                    / math.sqrt(n2[i] * n2[j]) * 1e6
                )
                maxsim = c if maxsim is None else max(maxsim, c)
                if c >= thr and (dup is None or j < dup):
                    dup = j
        out[i] = (cells[i], maxsim, dup, dup is None)
    return out


def _run(spark, rows, centroids, thr):
    from sparkx.ops.dedup import semdedup

    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    return {
        r["vec_id"]: (
            r["ivf_cell"], r["max_prior_sim_e6"], r["dup_of"], r["is_kept"]
        )
        for r in semdedup(df, centroids=centroids, threshold_e6=thr).collect()
    }


def test_semdedup_order_based_not_greedy(spark):
    """The paper's rule is order-based: c is dropped because of b EVEN
    THOUGH b was itself dropped (greedy-against-kept would keep c, since
    its only kept prior mate a is below threshold).  Unit vectors at
    0/25/50 degrees, threshold cos(30 deg) ~= 866025."""
    a = [1.0, 0.0]
    b = [math.cos(math.radians(25)), math.sin(math.radians(25))]
    c = [math.cos(math.radians(50)), math.sin(math.radians(50))]
    rows = [(1, a), (2, b), (3, c)]
    cents = [[1.0, 0.0]]
    got = _run(spark, rows, cents, 866_025)
    assert got == _mirror(rows, cents, 866_025)
    assert got[1][3] is True and got[1][2] is None
    assert got[2] == (0, math.floor(math.cos(math.radians(25)) * 1e6), 1, False)
    # the pin: dup_of = 2 (the dropped b), and a's cosine stayed below thr
    assert got[3][2] == 2 and got[3][3] is False
    assert math.floor(math.cos(math.radians(50)) * 1e6) < 866_025


def test_semdedup_guards(spark):
    """Zero vector (0/0 = NaN without the guard) scores NULL against
    everything and is kept; ragged-dim and NULL vectors get a NULL cell
    and are kept; an exact duplicate is dropped with dup_of = the lower
    id."""
    rows = [
        (0, [1.0, 0.0]),          # cell 0 — the zero vector's cell-mate
        (1, [3.0, 4.0]),          # cell 1
        (2, [3.0, 4.0]),          # exact dup of 1
        (3, [0.0, 0.0]),          # zero norm — ties to cell 0, pairs with
                                  # id 0, NULL score under the guard, kept
        (4, [1.0, 2.0, 3.0]),     # ragged dim — NULL cell, kept
        (5, None),                # NULL vector — NULL cell, kept
    ]
    cents = [[1.0, 0.0], [0.0, 1.0]]
    got = _run(spark, rows, cents, 990_000)
    assert got == _mirror(rows, cents, 990_000)
    assert got[2][2] == 1 and got[2][3] is False
    assert got[2][1] >= 999_999  # grid cosine of an exact dup
    assert got[3] == (0, None, None, True)  # paired but NULL-scored
    assert got[4] == (None, None, None, True)
    assert got[5] == (None, None, None, True)


def test_semdedup_cells_bound_pairs(spark):
    """Vectors in DIFFERENT cells never pair: two antipodal groups under a
    2-centroid quantizer each dedup internally but see no cross-cell
    similarity (max_prior_sim_e6 comes only from cell-mates)."""
    rows = [
        (1, [1.0, 0.05]), (2, [1.0, 0.06]),
        (3, [0.05, 1.0]), (4, [0.06, 1.0]),
    ]
    cents = [[1.0, 0.0], [0.0, 1.0]]
    got = _run(spark, rows, cents, 999_000)
    assert got == _mirror(rows, cents, 999_000)
    assert got[1][0] == 0 and got[3][0] == 1
    assert got[1][1] is None and got[3][1] is None  # no prior cell-mate
    assert got[2][2] == 1 and got[4][2] == 3


def test_semdedup_mirror_frozen_artifact(spark):
    """Full mirror on 60 seeded random 64-dim vectors against the REAL
    frozen production centroids, threshold low enough to drop some."""
    import random

    from sparkx.ops.similarity import load_frozen_centroids

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(60)
    ]
    cents = load_frozen_centroids()
    got = _run(spark, rows, cents, 150_000)
    mir = _mirror(rows, cents, 150_000)
    assert got == mir
    kept = sum(1 for v in got.values() if v[3])
    assert 0 < kept < 60  # both branches exercised


def test_semdedup_default_artifact_and_threshold(spark):
    """centroids=None loads the frozen artifact; the default threshold is
    the paper's 0.95."""
    from sparkx.ops.dedup import semdedup

    df = spark.createDataFrame(
        [(1, [1.0] * 64), (2, [1.0] * 64)],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["is_kept"] for r in semdedup(df).collect()}
    assert got == {1: True, 2: False}


# ── embedding_decontaminate ──────────────────────────────────────────────


def _decon_mirror(train, evals, thr):
    out = {}
    for i, tv in train:
        best = None  # (cos, -eid) max
        for eid, ev in evals:
            if tv is None or ev is None or len(tv) != len(ev):
                continue
            n2t = sum(x * x for x in tv)
            n2e = sum(x * x for x in ev)
            if not (n2t > 0 and n2e > 0):
                continue
            c = math.floor(
                sum(a * b for a, b in zip(tv, ev))
                / math.sqrt(n2t * n2e) * 1e6
            )
            if best is None or (c, -eid) > best:
                best = (c, -eid)
        if best is None:
            out[i] = (None, None, False)
        else:
            out[i] = (best[0], -best[1], best[0] >= thr)
    return out


def _decon_run(spark, train, evals, thr):
    from sparkx.ops.similarity import embedding_decontaminate

    schema = "vec_id long, embedding array<double>"
    got = embedding_decontaminate(
        spark.createDataFrame(train, schema),
        spark.createDataFrame(evals, schema),
        threshold_e6=thr,
    ).collect()
    return {
        r["vec_id"]: (
            r["max_eval_sim_e6"], r["nearest_eval_id"], r["is_contaminated"]
        )
        for r in got
    }


def test_embed_decontam_mirror_and_guards(spark):
    """Loop mirror over adversarial fixtures: a clear leak, a clean doc,
    a zero-norm train vector (NULL sim, not contaminated), a ragged-dim
    eval vector (never scored), and a NULL eval vector."""
    train = [
        (1, [1.0, 0.0]),      # leaked: ~eval 10
        (2, [-1.0, 0.02]),    # clean: negative cosine to both evals
        (3, [0.0, 0.0]),      # zero norm — nothing scorable
        (4, None),            # NULL vector — nothing scorable
    ]
    evals = [
        (10, [0.999, 0.01]),
        (11, [0.0, 1.0]),
        (12, [1.0, 2.0, 3.0]),  # ragged — excluded pairwise by the guard
        (13, None),             # NULL — excluded
    ]
    got = _decon_run(spark, train, evals, 900_000)
    assert got == _decon_mirror(train, evals, 900_000)
    assert got[1][2] is True and got[1][1] == 10
    assert got[2][2] is False
    assert got[3] == (None, None, False)
    assert got[4] == (None, None, False)


def test_embed_decontam_argmax_tie_lowest_eval_id(spark):
    """Two eval vectors IDENTICAL to the train vector: nearest_eval_id
    must be the LOWEST eval id (the cos*2^32 - id key's tiebreak)."""
    train = [(1, [3.0, 4.0])]
    evals = [(21, [3.0, 4.0]), (20, [3.0, 4.0]), (22, [0.0, 1.0])]
    got = _decon_run(spark, train, evals, 1_000_001)
    assert got == _decon_mirror(train, evals, 1_000_001)
    assert got[1][1] == 20
    assert got[1][0] >= 999_999
    assert got[1][2] is False  # threshold above the grid max


def test_embed_decontam_empty_eval_set(spark):
    """Documented precondition: an empty benchmark returns an empty
    frame (no second corpus scan for a vacuous answer)."""
    from sparkx.ops.similarity import embedding_decontaminate

    schema = "vec_id long, embedding array<double>"
    out = embedding_decontaminate(
        spark.createDataFrame([(1, [1.0, 0.0])], schema),
        spark.createDataFrame([], schema),
    )
    assert out.count() == 0


# ── ivf_assign_join (centroid table vs frozen literals) ──────────────────


def test_assign_join_bit_identical_to_frozen(spark):
    """The broadcast-table path must assign EXACTLY as the frozen-literal
    path on the same centroids — same grid affinity, same lowest-cell
    tiebreak — on 80 seeded random vectors plus a ragged and a NULL
    vector (both: NULL cell on both paths)."""
    import random

    from sparkx.ops.similarity import (
        ivf_assign_frozen,
        ivf_assign_join,
        load_frozen_centroids,
    )

    rng = random.Random(13)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(80)]
    rows += [(80, [1.0, 2.0]), (81, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = load_frozen_centroids()
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "cell long, centroid array<double>",
    )
    frozen = {
        r["vec_id"]: r["ivf_cell"] for r in ivf_assign_frozen(df, cents).collect()
    }
    joined = {
        r["vec_id"]: r["ivf_cell"] for r in ivf_assign_join(df, cdf).collect()
    }
    assert joined == frozen
    assert joined[80] is None and joined[81] is None
    assert sum(1 for v in joined.values() if v is not None) == 80


def test_assign_join_drops_zero_norm_centroid_ties_lowest(spark):
    """A zero-norm centroid is dropped eagerly (never assignable); an
    exact affinity tie goes to the LOWEST cell id."""
    from sparkx.ops.similarity import ivf_assign_join

    df = spark.createDataFrame(
        [(1, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    cdf = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),   # zero norm — dropped
            (7, [1.0, 0.0]),   # same affinity to (1,1) as cell 3
            (3, [0.0, 1.0]),
        ],
        "cell long, centroid array<double>",
    )
    got = ivf_assign_join(df, cdf).collect()
    assert got[0]["ivf_cell"] == 3


# ── mutual_knn_pairs ─────────────────────────────────────────────────────


def test_mutual_knn_prunes_hub(spark):
    """The hub pathology mutuality exists to prune: vectors 1..4 all have
    the hub (0) as a near neighbor, but the hub's OWN top-1 list holds
    only its single nearest — so with k=1 only (0, nearest) survives,
    while every knn_join edge INTO the hub from the others is dropped."""
    from sparkx.ops.similarity import knn_join, mutual_knn_pairs

    # 2-D vectors, one LSH band of 2 bits — all in bucket 3 (both dims
    # positive): candidates are all-pairs, so this tests the MUTUAL rule,
    # not recall
    rows = [
        (0, [1.0, 1.0]),            # hub
        (1, [1.0, 0.9]),            # hub's nearest
        (2, [1.0, 0.5]),
        (3, [0.5, 1.0]),
        (4, [0.9, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = mutual_knn_pairs(df, k=1, nbits=2).collect()
    knn = knn_join(df, k=1, nbits=2).collect()
    into_hub = [r for r in knn if r["vec_id"] == 0]
    assert len(into_hub) >= 2          # several vectors point AT the hub
    assert len(got) == 1               # ...but only one mutual pair
    r = got[0]
    assert (r["a_id"], r["b_id"]) == (0, 1)
    assert r["rank_ab"] == 1 and r["rank_ba"] == 1


def test_mutual_knn_subset_and_symmetry(spark):
    """On 40 seeded vectors: every mutual pair appears in knn_join's
    top-k in BOTH directions with matching ranks and the same rounded
    cosine; and every knn_join edge whose reverse edge exists is
    reported exactly once (a_id < b_id)."""
    import random

    from sparkx.ops.similarity import knn_join, mutual_knn_pairs

    rng = random.Random(5)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    k = 3
    top = {
        (r["q_id"], r["vec_id"]): (r["rank"], r["cosine"])
        for r in knn_join(df, k=k).collect()
    }
    expected = {
        (a, b): (top[(a, b)][0], top[(b, a)][0], top[(a, b)][1])
        for (a, b) in top
        if a < b and (b, a) in top
    }
    got = {
        (r["a_id"], r["b_id"]): (r["rank_ab"], r["rank_ba"], r["cosine"])
        for r in mutual_knn_pairs(df, k=k).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_semdedup_blocked_identical_to_unblocked(spark):
    """Fragment-replicate blocking is a pure execution-layout change:
    n_blocks=3 must produce byte-identical output to the default on the
    frozen-artifact fixture (every pair still scored exactly once)."""
    import random

    from sparkx.ops.dedup import semdedup
    from sparkx.ops.similarity import load_frozen_centroids

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = load_frozen_centroids()
    key = lambda r: (r["vec_id"],)
    plain = sorted(
        semdedup(df, centroids=cents, threshold_e6=150_000).collect(), key=key
    )
    blocked = sorted(
        semdedup(df, centroids=cents, threshold_e6=150_000, n_blocks=3).collect(),
        key=key,
    )
    assert [r.asDict() for r in plain] == [r.asDict() for r in blocked]
