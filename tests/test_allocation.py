"""Loop-mirror parity for capped_mixture (water-filling) and range_join."""

from __future__ import annotations

import datetime as dt

from sparkx.ops.corpus import capped_mixture
from sparkx.ops.temporal import range_join


def _waterfill(tokens: dict[str, int], weights: dict[str, int],
               budget: int, max_epochs: int, default_w: int = 1):
    """Sequential reference: sort by cap/weight, saturate the maximal
    prefix, divide the remainder proportionally (integer div)."""
    rows = [
        (s, t, weights.get(s, default_w), max_epochs * t)
        for s, t in tokens.items()
    ]
    rows.sort(key=lambda r: (r[3] / r[2], r[0]))
    w_all = sum(r[2] for r in rows)
    c, v, m = 0, 0, 0
    for i, (_, _, w, cap) in enumerate(rows, start=1):
        if cap * (w_all - v) <= w * (budget - c):
            m, c, v = i, c + cap, v + w
        else:
            break
    out = {}
    for i, (s, t, w, cap) in enumerate(rows, start=1):
        if i <= m:
            alloc = cap
        else:
            alloc = w * (budget - c) // (w_all - v)
        out[s] = (t, w, cap, alloc, alloc * 10000 // t if t else 0, i <= m)
    return out


def test_capped_mixture_matches_waterfill(spark):
    docs = spark.createDataFrame(
        [(i, "w " * n, lang) for i, (lang, n) in enumerate(
            [("en", 100)] * 10 + [("de", 40)] * 3 + [("fr", 50)] * 4
        )],
        "doc_id long, text string, lang string",
    )
    # token_count on "w w ... w " = n tokens
    tokens = {"en": 1000, "de": 120, "fr": 200}
    weights = {"en": 5, "de": 3, "fr": 2}
    budget, k = 900, 2

    got = {
        r["stratum"]: (r["n_tokens"], r["w"], r["cap"], r["alloc_tokens"],
                       r["epochs_e4"], r["saturated"])
        for r in capped_mixture(
            docs, budget_tokens=budget, weights=weights, max_epochs=k
        ).collect()
    }
    assert got == _waterfill(tokens, weights, budget, k)
    # the budget is fully spent up to integer-division dust
    assert 0 <= budget - sum(v[3] for v in got.values()) < sum(
        weights.get(s, 1) for s in tokens
    )


def test_capped_mixture_all_saturated(spark):
    docs = spark.createDataFrame(
        [(0, "a b c", "en"), (1, "d e", "de")],
        "doc_id long, text string, lang string",
    )
    got = {
        r["stratum"]: (r["alloc_tokens"], r["saturated"])
        for r in capped_mixture(
            docs, budget_tokens=10_000, weights={"en": 5}, max_epochs=2
        ).collect()
    }
    # budget exceeds every cap: all saturate at cap = 2 * tokens
    assert got == {"en": (6, True), "de": (4, True)}


def test_range_join_matches_loop(spark):
    t0 = dt.datetime(2024, 1, 1)
    left = [(i, t0 + dt.timedelta(seconds=s)) for i, s in
            enumerate([0, 50, 119, 300])]
    right = [(100 + i, t0 + dt.timedelta(seconds=s, microseconds=us))
             for i, (s, us) in enumerate(
                 [(0, 0), (45, 500000), (60, 1), (110, 0), (360, 0),
                  (361, 0)])]
    l_df = spark.createDataFrame(left, "event_id long, ts timestamp")
    r_df = spark.createDataFrame(right, "event_id long, ts timestamp")

    got = {
        (r["l_id"], r["r_id"]): r["lag_us"]
        for r in range_join(l_df, r_df, horizon_sec=60).collect()
    }
    want = {}
    for li, lt in left:
        for ri, rt in right:
            lag = (rt - lt) // dt.timedelta(microseconds=1)
            if 0 <= lag <= 60_000_000:
                want[(li, ri)] = lag
    assert got == want
    # boundary checks: lag 0 included, 1µs past the horizon excluded,
    # r-before-l never matches
    assert got[(0, 100)] == 0
    assert (0, 102) not in got and (2, 103) not in got
