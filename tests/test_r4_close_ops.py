"""Loop-mirror tests for the r4-close operators: shard_assign,
snapshot_diff, quantize_int8/int8_topk/int8_recall_report,
containment_pairs, HLL batch sketches, snapshot PSI drift,
embedding_health, and cluster_canonical.  Each Spark result is compared
against a boring pure-Python recomputation (the oracle style of
sparkx/oracle.py) including the NULL/zero edge paths the driver's clean
testdata never exercises."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


# ───────────────────────── shard_assign ────────────────────────────────────


def test_shard_assign_mirror(spark):
    from sparkx.ops.corpus import shard_assign

    ids = list(range(37)) + [None]
    docs = spark.createDataFrame(
        [(i, f"t{j}") for j, i in enumerate(ids)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shard_assign(docs, n_shards=4, salt="shard0").collect()
    }

    # mirror: md5('shard0|' + str(id or ∅)), shard = first-8-hex % 4,
    # pos = rank of hash within shard (ties impossible: distinct keys)
    rows = []
    for i in ids:
        key = "∅" if i is None else str(i)
        hh = _md5(f"shard0|{key}")
        rows.append((i, hh, int(hh[:8], 16) % 4))
    want: dict = {}
    for shard in range(4):
        members = sorted(
            [(hh, i) for (i, hh, s) in rows if s == shard],
            key=lambda t: (t[0], (t[1] is None, t[1])),  # NULLS LAST
        )
        for pos, (_, i) in enumerate(members):
            want[i] = (shard, pos)
    assert got == want
    # balance sanity: every shard non-pathological on 38 keys
    sizes = [sum(1 for v in want.values() if v[0] == s) for s in range(4)]
    assert min(sizes) >= 1


def test_shard_assign_strict_uniqueness_guard(spark):
    """strict=True fails fast on duplicate keys (incl. a second NULL) —
    the silent degradation ADVICE r4 flagged; unique keys pass through
    with identical output to the default path."""
    import pytest

    from sparkx.ops.corpus import shard_assign

    ok = spark.createDataFrame(
        [(i, "t") for i in range(10)] + [(None, "t")],
        "doc_id long, text string",
    )
    key = lambda r: (r[0] is None, r[0], r[1:])
    assert (
        sorted(map(tuple, shard_assign(ok, n_shards=4, strict=True).collect()), key=key)
        == sorted(map(tuple, shard_assign(ok, n_shards=4).collect()), key=key)
    )
    dup = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="not\\s+unique|not unique"):
        shard_assign(dup, n_shards=4, strict=True)
    two_nulls = spark.createDataFrame(
        [(None, "a"), (None, "b"), (2, "c")], "doc_id long, text string"
    )
    with pytest.raises(ValueError):
        shard_assign(two_nulls, n_shards=4, strict=True)


def test_shard_assign_deterministic(spark):
    from sparkx.ops.corpus import shard_assign

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(100), "text": ["x"] * 100})
    )
    a = sorted(map(tuple, shard_assign(docs, n_shards=8).collect()))
    b = sorted(map(tuple, shard_assign(docs.repartition(7), n_shards=8).collect()))
    assert a == b  # layout independent of input partitioning


# ───────────────────────── snapshot_diff ───────────────────────────────────


def test_snapshot_diff_statuses(spark):
    from sparkx.ops.corpus import snapshot_diff

    old = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4, 5],
                      "text": ["same", "will change", None, "", "gone"]})
    )
    new = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4, 6],
                      "text": ["same", "changed!", "", None, "fresh"]})
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "changed",  # NULL → ''  is a content change (sentinel ≠ md5(''))
        4: "changed",  # ''  → NULL likewise
        5: "removed",
        6: "added",
    }


# ─────────────────────── int8 quantization ─────────────────────────────────


def _codes_mirror(vec):
    if vec is None:
        return None
    f32 = [float(np.float32(x)) for x in vec]  # array<float> storage rounding
    m = max((abs(x) for x in f32), default=0.0)
    if m == 0.0:
        return [0] * len(vec)
    return [int(math.floor(x * 127.0 / m + 0.5)) for x in f32]


def test_quantize_int8_mirror(spark):
    from sparkx.ops.similarity import quantize_int8

    vecs = [
        [1.0, -2.0, 0.5, 2.0],
        [0.0, 0.0, 0.0, 0.0],          # zero vector → all-zero codes
        [1e-9, -1e-9, 1e-9, -1e-9],    # tiny but nonzero → ±127 at extremes
        None,                          # NULL vector → NULL codes
        [-3.5, 3.5, 1.75, -1.75],      # exact .5 rounding edges
        [1.0, float("nan"), 2.0, 0.5],  # NaN element → NULL codes (explicit
        # guard: without it Spark yields [NULL,...] ints while a SQL
        # mirror's CAST(floor(NaN) AS INT) errors — ADVICE r4)
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    got = {r["vec_id"]: r["codes"] for r in quantize_int8(df).collect()}
    for i, v in enumerate(vecs):
        if v is not None and any(x != x for x in v):
            assert got[i] is None, f"NaN vec {i} must map to NULL codes"
            continue
        assert got[i] == _codes_mirror(v), f"vec {i}"
    # range invariant
    for cs in got.values():
        if cs is not None:
            assert all(-127 <= c <= 127 for c in cs)


def test_int8_topk_vs_numpy(spark):
    from sparkx.ops.similarity import int8_topk

    rng = np.random.RandomState(7)
    mat = rng.randn(30, 16).astype(np.float32)
    mat[5] = 0.0  # zero vector must be excluded, not crash
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    got = [(r["vec_id"], r["dot_q"]) for r in int8_topk(df, query_vec_id=0, k=5).collect()]

    codes = {i: _codes_mirror([float(x) for x in mat[i]]) for i in range(30)}
    qc = codes[0]
    scored = []
    for i in range(1, 30):
        c = codes[i]
        dot = sum(a * b for a, b in zip(c, qc))
        nv = sum(a * a for a in c)
        nq = sum(a * a for a in qc)
        if nv > 0 and nq > 0:
            scored.append((dot / (math.sqrt(nq) * math.sqrt(nv)), i, dot))
    scored.sort(key=lambda t: (-t[0], t[1]))
    want = [(i, d) for (_, i, d) in scored[:5]]
    assert got == want
    assert all(i != 5 for i, _ in got)  # zero vector excluded


def test_int8_topk_close_to_fp32(spark):
    """Fidelity: on smooth random vectors the quantized top-5 should
    largely agree with the fp32 brute-force top-5 (overlap ≥ 3/5)."""
    from sparkx.ops.similarity import int8_topk, topk_bruteforce

    rng = np.random.RandomState(11)
    mat = rng.randn(40, 32).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]], 0) for i in range(40)],
        "vec_id long, embedding array<float>, label int",
    )
    q5 = {r["vec_id"] for r in int8_topk(df, query_vec_id=0, k=5).collect()}
    f5 = {r["vec_id"] for r in topk_bruteforce(df, query_vec_id=0, k=5).collect()}
    assert len(q5 & f5) >= 3


# ─────────────────────── containment pairs ─────────────────────────────────


def _shingles(text, n=3):
    import re as _re

    toks = _re.split("[ \t\n\x0b\f\r]+", text.lower().strip(" "))
    if len(toks) < n:
        return set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def test_containment_mirror(spark):
    from sparkx.ops.dedup import containment_pairs

    texts = {
        1: "alpha beta gamma delta epsilon zeta",
        2: "intro words alpha beta gamma delta epsilon zeta outro tail here",  # ⊃ 1
        3: "alpha beta gamma completely different suffix tokens",
        4: "unrelated document about entirely other topics now",
        5: "tiny doc",  # < n tokens → no shingles → excluded
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r["a_id"], r["b_id"]): (r["n_inter"], r["n_a"], r["n_b"], r["containment"])
        for r in containment_pairs(df, n=3, threshold=0.5).collect()
    }

    sh = {i: _shingles(t) for i, t in texts.items()}
    want = {}
    ids = sorted(sh)
    for i in ids:
        for j in ids:
            if i >= j or not sh[i] or not sh[j]:
                continue
            inter = len(sh[i] & sh[j])
            if inter == 0:
                continue
            c = inter / min(len(sh[i]), len(sh[j]))
            if c >= 0.5:
                want[(i, j)] = (inter, len(sh[i]), len(sh[j]), c)
    assert got == want
    assert (1, 2) in got and got[(1, 2)][3] == 1.0  # doc 1 fully inside doc 2
    # Jaccard for the same pair is well below 1 — the asymmetric signal
    assert got[(1, 2)][0] / (got[(1, 2)][1] + got[(1, 2)][2] - got[(1, 2)][0]) < 0.5


def test_containment_df_cap_is_lower_bound(spark):
    from sparkx.ops.dedup import containment_pairs

    # one shingle shared by every doc ('x y z' prefix) becomes hot under
    # the cap; capped containment must never exceed the exact value
    texts = [(i, f"x y z doc{i} tail{i} more{i} words{i}") for i in range(6)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    exact = {
        (r["a_id"], r["b_id"]): r["containment"]
        for r in containment_pairs(df, n=3, threshold=0.0).collect()
    }
    capped = {
        (r["a_id"], r["b_id"]): r["containment"]
        for r in containment_pairs(df, n=3, threshold=0.0, max_shingle_df=3).collect()
    }
    for pair, c in capped.items():
        assert c <= exact[pair] + 1e-12


# ───────────────────── HLL incremental sketches ────────────────────────────


def test_hll_merge_equals_whole_corpus_sketch(spark):
    """Union of per-batch sketches must estimate IDENTICALLY to one sketch
    built over the whole corpus (merge is exact over sketch state), and in
    the sparse regime both equal the exact distinct count."""
    from pyspark.sql import functions as F

    from sparkx.ops.corpus import hll_batch_sketches, hll_merge_stats

    rows = [(i, f"doc body {i % 97} tail", "en" if i % 2 else "de", i % 5)
            for i in range(400)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, batch long"
    )
    merged = {
        r["grp"]: (r["n_distinct_merged"], r["n_docs"])
        for r in hll_merge_stats(hll_batch_sketches(docs)).collect()
    }
    whole = {
        r["grp"]: r["n_distinct_merged"]
        for r in hll_merge_stats(
            hll_batch_sketches(docs.withColumn("batch", F.lit(0)))
        ).collect()
    }
    assert {g: v[0] for g, v in merged.items()} == whole
    # sparse regime → exact: 97 is odd, so over 400 ids BOTH parities see
    # every body residue — 97 distinct per lang
    exact = {"en": 97, "de": 97}
    assert {g: v[0] for g, v in merged.items()} == exact
    assert merged["en"][1] == merged["de"][1] == 200


def test_hll_dense_mode_tolerance(spark):
    """Past sparse promotion the estimate is approximate — pin the lg_k=12
    error envelope (±5% is ~3 standard errors) on 20k distinct values."""
    from pyspark.sql import functions as F

    from sparkx.ops.corpus import hll_batch_sketches, hll_merge_stats

    docs = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique doc "), F.col("id")).alias("text"),
        F.lit("en").alias("lang"),
        (F.col("id") % 4).alias("batch"),
    )
    est = hll_merge_stats(hll_batch_sketches(docs)).collect()[0]["n_distinct_merged"]
    assert abs(est - 20_000) / 20_000 < 0.05


# ───────────────────────── snapshot drift (PSI) ─────────────────────────────


def test_snapshot_drift_mirror(spark):
    import re as _re

    from sparkx.ops.corpus import snapshot_drift

    old_rows = [(i, "tok " * (i * 7 % 200)) for i in range(60)] + [(60, None)]
    new_rows = [(i, "tok " * ((i * 7 % 200) + 40)) for i in range(45)]
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    got = {
        r["bucket"]: (r["n_old"], r["n_new"], r["psi_e6"])
        for r in snapshot_drift(old, new, bucket_width=32, n_buckets=16).collect()
    }

    def bucket(text):
        # the pinned tokenizer-mirror class: Python \s is Unicode-aware and
        # str.strip() eats \t/\n edges where Spark's trim strips ' ' only
        toks = _re.split("[ \t\n\x0b\f\r]+", (text or "").strip(" "))
        return min(len(toks) // 32, 15)

    import math

    co, cn = [0] * 16, [0] * 16
    for _, t in old_rows:
        co[bucket(t)] += 1
    for _, t in new_rows:
        cn[bucket(t)] += 1
    t_old, t_new = sum(co), sum(cn)
    want = {}
    for b in range(16):
        p_o = (co[b] + 1) / (t_old + 16)
        p_n = (cn[b] + 1) / (t_new + 16)
        want[b] = (co[b], cn[b], round((p_n - p_o) * math.log(p_n / p_o) * 1e6))
    assert set(got) == set(want)
    for b in range(16):
        assert got[b][:2] == want[b][:2], f"bucket {b} counts"
        assert abs(got[b][2] - want[b][2]) <= 1, f"bucket {b} psi grid"
    # the +40-token shift must register as real drift
    assert sum(v[2] for v in got.values()) / 1e6 > 0.25
    # identical snapshots → zero PSI everywhere
    zero = snapshot_drift(old, old).collect()
    assert all(r["psi_e6"] == 0 for r in zero)


# ───────────────────── embedding health report ──────────────────────────────


def test_embedding_health_counts(spark):
    from sparkx.ops.similarity import embedding_health

    vecs = [
        (1, [1.0, 2.0, 3.0]),
        (2, None),
        (3, [float("nan"), 1.0, 2.0]),
        (4, [0.0, 0.0, 0.0]),
        (5, [250.0, 1.0, 1.0]),
        (6, [1.0]),                      # ragged
        (7, [-101.0, 0.5, 0.5]),         # negative outlier
        (8, [float("nan")]),             # nan AND ragged: counted as nan
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    r = embedding_health(df).collect()[0]
    assert r["n_vecs"] == 8
    assert r["n_null"] == 1
    assert r["n_nan"] == 2
    assert r["n_zero_norm"] == 1
    assert r["n_outlier"] == 2
    assert r["dims_min"] == 1 and r["dims_max"] == 3


def test_embedding_health_clean_table(spark):
    from sparkx.ops.similarity import embedding_health

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(1, 50)],
        "vec_id long, embedding array<float>",
    )
    r = embedding_health(df).collect()[0]
    assert (r["n_null"], r["n_nan"], r["n_zero_norm"], r["n_outlier"]) == (0, 0, 0, 0)
    assert r["n_vecs"] == 49 and r["dims_min"] == r["dims_max"] == 2


# ─────────────────── quality-aware cluster canonical ────────────────────────


def test_cluster_canonical_picks_best_quality(spark):
    from sparkx.ops.dedup import cluster_canonical

    # cluster {1,2,3}: doc 3 is the long clean original (highest quality),
    # doc 1 (min id) is a truncated copy — min-id would keep the WRONG one
    long_text = ("the quick brown fox jumps over a lazy dog and keeps "
                 "running through the long meadow of tall grass ") * 3
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "the quick brown fox jumps over a lazy dog!!!!!"),
            (3, long_text),
            (7, None),        # NULL text, singleton: own canonical, q = -1
            (9, "a lone unduplicated document of decent length here"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "a_id long, b_id long"
    )
    rows = {r["doc_id"]: r for r in cluster_canonical(docs, pairs).collect()}
    assert rows[1]["cluster_id"] == rows[2]["cluster_id"] == rows[3]["cluster_id"] == 1
    assert all(rows[i]["keep_doc_id"] == 3 for i in (1, 2, 3))  # NOT min-id
    assert rows[3]["is_canonical"] and not rows[1]["is_canonical"]
    assert rows[7]["cluster_id"] == 7 and rows[7]["is_canonical"]
    assert rows[7]["q"] == -1.0
    assert rows[9]["is_canonical"] and rows[9]["keep_doc_id"] == 9


def test_cluster_canonical_tiebreak_min_id(spark):
    from sparkx.ops.dedup import cluster_canonical

    # identical text → identical quality → tiebreak keeps min id
    docs = spark.createDataFrame(
        [(5, "same words here exactly"), (4, "same words here exactly")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(4, 5)], "a_id long, b_id long")
    rows = {r["doc_id"]: r for r in cluster_canonical(docs, pairs).collect()}
    assert rows[4]["is_canonical"] and not rows[5]["is_canonical"]
    assert rows[5]["keep_doc_id"] == 4


def test_int8_recall_report_vs_numpy(spark):
    from sparkx.ops.similarity import int8_recall_report

    rng = np.random.RandomState(3)
    mat = rng.randn(25, 12).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(25)],
        "vec_id long, embedding array<float>",
    )
    got = {r["q_id"]: r["n_overlap"]
           for r in int8_recall_report(df, n_queries=4, k=5).collect()}

    def rank_fp(q):
        scored = []
        for i in range(25):
            if i == q:
                continue
            c = round(float(np.dot(mat[i].astype(np.float64), mat[q].astype(np.float64))
                            / math.sqrt(np.dot(mat[i].astype(np.float64), mat[i].astype(np.float64))
                                        * np.dot(mat[q].astype(np.float64), mat[q].astype(np.float64)))), 4)
            scored.append((-c, i))
        return {i for _, i in sorted(scored)[:5]}

    def rank_i8(q):
        codes = {i: _codes_mirror([float(x) for x in mat[i]]) for i in range(25)}
        nq = sum(a * a for a in codes[q])
        scored = []
        for i in range(25):
            if i == q:
                continue
            nv = sum(a * a for a in codes[i])
            if nv == 0 or nq == 0:
                continue
            dot = sum(a * b for a, b in zip(codes[i], codes[q]))
            scored.append((-(dot / (math.sqrt(nq) * math.sqrt(nv))), i))
        return {i for _, i in sorted(scored)[:5]}

    for q in range(4):
        assert got[q] == len(rank_fp(q) & rank_i8(q)), f"query {q}"
    # int8 at 12 dims should preserve most of the neighbourhood
    assert sum(got.values()) >= 4 * 3
