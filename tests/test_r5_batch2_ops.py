"""Loop-mirror tests for the r5 batch-2 operators: filtered_topk
(metadata-filtered vector search), global_order (reproducible global
training-order permutation), encoding_flags (encoding-damage detector),
and method_agreement (minhash × simhash pair-consensus audit).  Each
Spark result is compared against a boring pure-Python recomputation plus
the edges the driver's corpus never exercises (query-label excluded by
its own gate, NULL keys, permutation totality, clean/NULL text, a
simhash-only reordered pair)."""

from __future__ import annotations

import hashlib
import math

# ───────────────────── filtered_topk ─────────────────────────────────────────


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(dot / (na * nb), 4)


def test_filtered_topk_mirror(spark):
    """Top-k restricted to even labels; the query vector (odd label) must
    still retrieve — the filter gates the CORPUS side only — and its own
    row is excluded even when its label passes the gate."""
    from pyspark.sql import functions as F

    from sparkx.ops.similarity import filtered_topk

    rows = [
        (0, [1.0, 0.0, 0.0], 1),   # query: label 1 (fails the even gate)
        (1, [0.9, 0.1, 0.0], 2),
        (2, [0.8, 0.2, 0.0], 3),   # best cosine among odd — must be absent
        (3, [0.0, 1.0, 0.0], 2),
        (4, [0.7, 0.3, 0.0], 4),
        (5, [1.0, 0.0, 0.0], 2),   # cosine 1.0, even → rank 1
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = filtered_topk(
        df, query_vec_id=0, k=3, predicate=F.col("label") % 2 == 0
    ).collect()
    q = rows[0][1]
    want = sorted(
        ((r[0], r[2], _cos(r[1], q)) for r in rows if r[2] % 2 == 0 and r[0] != 0),
        key=lambda t: (-t[2], t[0]),
    )[:3]
    assert [(r["vec_id"], r["label"], r["cosine"]) for r in got] == want
    assert [r["vec_id"] for r in got] == [5, 1, 4]  # non-vacuity: 2 gated out


def test_filtered_topk_fewer_than_k_and_self_gate(spark):
    """Pre-filtering returns fewer than k when the gate leaves fewer rows
    (never pads with gated rows), and the query's own row never returns
    even when its label passes."""
    from pyspark.sql import functions as F

    from sparkx.ops.similarity import filtered_topk

    rows = [
        (0, [1.0, 0.0], 2),
        (1, [0.5, 0.5], 2),
        (2, [0.0, 1.0], 7),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = filtered_topk(
        df, query_vec_id=0, k=10, predicate=F.col("label") == 2
    ).collect()
    assert [r["vec_id"] for r in got] == [1]


# ───────────────────── global_order ──────────────────────────────────────────


def _order_mirror(ids, n_shards, salt):
    staged = []
    for i in ids:
        key = "∅" if i is None else str(i)
        hh = hashlib.md5(f"{salt}|{key}".encode()).hexdigest()
        staged.append((i, int(hh[:8], 16) % n_shards, hh))
    out = {}
    offset = 0
    for shard in sorted({s for _, s, _ in staged}):
        members = sorted(
            (t for t in staged if t[1] == shard),
            key=lambda t: (t[2], t[0] is None, t[0] if t[0] is not None else 0),
        )
        for pos, (i, s, _) in enumerate(members):
            out[i] = (s, pos, offset + pos)
        offset += len(members)
    return out


def test_global_order_mirror_and_totality(spark):
    """global_pos is a total permutation [0, N): unique, gap-free, and
    byte-identical to the hashlib mirror — including a NULL key (sentinel
    '∅') and shards of very different sizes."""
    from sparkx.ops.corpus import global_order

    ids = list(range(40)) + [None]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: (r["shard"], r["pos"], r["global_pos"])
        for r in global_order(df, n_shards=4, salt="t0").collect()
    }
    assert got == _order_mirror(ids, 4, "t0")
    assert sorted(v[2] for v in got.values()) == list(range(41))


def test_global_order_salt_changes_permutation(spark):
    """Same salt → identical permutation across runs; a different salt →
    a different one (the reshuffle knob epoch schedules rely on)."""
    from sparkx.ops.corpus import global_order

    df = spark.createDataFrame([(i,) for i in range(64)], "doc_id long")
    a1 = {r["doc_id"]: r["global_pos"]
          for r in global_order(df, n_shards=8, salt="e1").collect()}
    a2 = {r["doc_id"]: r["global_pos"]
          for r in global_order(df, n_shards=8, salt="e1").collect()}
    b = {r["doc_id"]: r["global_pos"]
         for r in global_order(df, n_shards=8, salt="e2").collect()}
    assert a1 == a2
    assert a1 != b
    assert sorted(b.values()) == list(range(64))


# ───────────────────── encoding_flags ────────────────────────────────────────


def test_encoding_flags_signals(spark):
    """Each signal counts exactly; tokenizer whitespace (tab/LF/VT/FF/CR)
    is NOT control damage; NULL text is clean-empty (0s, not NULLs)."""
    from sparkx.ops.textstats import encoding_flags

    rows = [
        (1, "clean prose, nothing wrong."),
        (2, "smart quote gone wrong: â€™ and â€œtwiceâ€"),
        (3, "lost bytes � here � and � there"),
        (4, "bell \x07 and escape \x1b chars"),
        (5, "tabs\tand\nnewlines\x0b\x0c\rare fine"),
        (6, None),
        (7, "café is clean utf-8, CafÃ© is not"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_replacement"], r["n_mojibake"], r["n_ctrl"], r["is_damaged"]
        )
        for r in encoding_flags(df).collect()
    }
    assert got[1] == (0, 0, 0, False)
    assert got[2] == (0, 3, 0, True)   # â€™ + â€œ + â€ → 3 'â€' hits
    assert got[3] == (3, 0, 0, True)
    assert got[4] == (0, 0, 2, True)
    assert got[5] == (0, 0, 0, False)  # whitespace family excluded
    assert got[6] == (0, 0, 0, False)  # NULL text = clean-empty
    assert got[7] == (0, 1, 0, True)   # é clean, Ã© mojibake


# ───────────────────── method_agreement ──────────────────────────────────────


def test_method_agreement_flags(spark):
    """A verbatim dup fires BOTH detectors (jaccard 1, hamming 0); a
    token-reordered dup fires SimHash ONLY (identical bag → identical
    fingerprint; reversed trigram shingles are disjoint → no minhash
    pair).  Vocabularies are disjoint across the two pairs so no cross
    pair can appear."""
    from sparkx.ops.dedup import method_agreement

    fwd = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rev = " ".join(reversed(fwd.split()))
    dup = "kilo lima mike november oscar papa quebec romeo sierra tango"
    rows = [(1, fwd), (2, rev), (3, dup), (4, dup)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["a_id"], r["b_id"]): (
            r["jaccard"], r["hamming"], r["in_minhash"], r["in_simhash"]
        )
        for r in method_agreement(df, n=3, threshold=0.5, max_hamming=3).collect()
    }
    assert set(got) == {(1, 2), (3, 4)}
    assert got[(1, 2)] == (None, 0, False, True)      # simhash-only
    assert got[(3, 4)] == (1.0, 0, True, True)        # consensus


def test_method_agreement_matches_components(spark):
    """The audit is EXACTLY the full outer join of the two component ops'
    outputs — flags and scores re-derived from independently collected
    frames on a mixed corpus."""
    from sparkx.ops.dedup import (
        method_agreement,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, base) for i in range(1, 4)] + [
        (4, " ".join(reversed(base.split()))),
        (5, "completely unrelated words about distributed query planning"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mh = {(r["a_id"], r["b_id"]): r["jaccard"]
          for r in minhash_lsh_pairs(df, n=3, threshold=0.5).collect()}
    sh = {(r["a_id"], r["b_id"]): r["hamming"]
          for r in simhash_pairs(df, max_hamming=3).collect()}
    want = {
        k: (mh.get(k), sh.get(k), k in mh, k in sh)
        for k in set(mh) | set(sh)
    }
    got = {
        (r["a_id"], r["b_id"]): (
            r["jaccard"], r["hamming"], r["in_minhash"], r["in_simhash"]
        )
        for r in method_agreement(df, n=3, threshold=0.5, max_hamming=3).collect()
    }
    assert got == want
    assert any(v[2] and v[3] for v in got.values())  # non-vacuity: consensus
