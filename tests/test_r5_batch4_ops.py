"""Loop-mirror tests for interleave_order (deterministic proportional
source interleaving): hashlib mirror with unequal source sizes and a
NULL key, permutation totality, the interleave regularity property, the
overflow-safe split arithmetic checked against big-int ground truth at
sizes Spark never sees locally, and the n_shards validation."""

from __future__ import annotations

import hashlib

E = 10**12


def _split_key(r, n):
    """The exact two-step form both engines run (every intermediate
    <= 2n * 10^6)."""
    x = 2 * r + 1
    a = (x * 1_000_000) // (2 * n)
    rem = (x * 1_000_000) % (2 * n)
    return a * 1_000_000 + (rem * 1_000_000) // (2 * n)


def _mirror(rows, salt="il0"):
    groups = {}
    for k, s in rows:
        groups.setdefault(s, []).append(k)
    out = []
    for s, keys in groups.items():
        n = len(keys)
        ordered = sorted(
            keys,
            key=lambda k: (
                hashlib.md5(
                    f"{salt}|{'∅' if k is None else k}".encode()
                ).hexdigest(),
                k is None,
                k if k is not None else 0,
            ),
        )
        for r, k in enumerate(ordered):
            out.append({"key": k, "source": s, "rank": r,
                        "key_e12": _split_key(r, n)})
    out.sort(
        key=lambda t: (
            t["key_e12"],
            t["source"] is None, t["source"] or "",
            t["key"] is None, t["key"] if t["key"] is not None else 0,
        )
    )
    for pos, t in enumerate(out):
        t["global_pos"] = pos
    return {t["key"]: (t["source"], t["rank"], t["key_e12"], t["global_pos"])
            for t in out}


def test_interleave_order_mirror(spark):
    """Unequal sizes (7 / 3 / 1) + a NULL key (sentinel hash); the Spark
    shard-decomposed global_pos must equal the mirror's single global
    sort, and be a total permutation."""
    from sparkx.ops.corpus import interleave_order

    rows = [(i, "a") for i in range(7)] + [
        (10, "b"), (11, "b"), (12, "b"), (None, "c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        r["doc_id"]: (
            r["source"], r["rank_in_source"], r["key_e12"], r["global_pos"]
        )
        for r in interleave_order(df, n_shards=8).collect()
    }
    assert got == _mirror(rows)
    assert sorted(v[3] for v in got.values()) == list(range(11))


def test_interleave_regularity(spark):
    """Stratified spacing is the op's contract: with sources of 10 and 20
    docs, the merged order never runs more than 3 consecutive docs of the
    bigger source and never 2 of the smaller (the mirror's key order IS
    the spec; this asserts the human-visible property)."""
    from sparkx.ops.corpus import interleave_order

    rows = [(i, "small") for i in range(10)] + [
        (100 + i, "large") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    ordered = [
        r["source"]
        for r in interleave_order(df, n_shards=16)
        .orderBy("global_pos")
        .collect()
    ]
    run, prev, max_run = 0, None, {}
    for s in ordered:
        run = run + 1 if s == prev else 1
        prev = s
        max_run[s] = max(max_run.get(s, 0), run)
    assert max_run["large"] <= 3
    assert max_run["small"] == 1
    # and both sources span the whole range, not a prefix
    first_small = ordered.index("small")
    last_small = len(ordered) - 1 - ordered[::-1].index("small")
    assert first_small < 5 and last_small > len(ordered) - 6


def test_interleave_split_arithmetic_huge_n():
    """The two-step key equals floor((2r+1)*1e12 / 2n) by big-int ground
    truth at source sizes far beyond int64-safe naive arithmetic
    (n = 10^10: the naive product overflows at ~4.6*10^6)."""
    for n in (10**10, 4_600_001, 999_999_937):
        for r in (0, 1, n // 3, n - 2, n - 1):
            assert _split_key(r, n) == ((2 * r + 1) * E) // (2 * n)
            assert (2 * r + 1) * 1_000_000 < 2**63  # int64-safe intermediates
            assert _split_key(r, n) < E


def test_interleave_validates_n_shards(spark):
    from sparkx.ops.corpus import interleave_order

    import pytest

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        interleave_order(df, n_shards=7)  # does not divide 10^12
