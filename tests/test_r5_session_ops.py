"""Loop-mirror tests for the r5-session operators: preference_pairs
(DPO best-of-n harvest), sft_render_offsets (chat-template loss-mask
spans), and ranking_metrics_report (nDCG@k + MRR of the int8 serving
path).  Each Spark result is compared against a boring pure-Python
recomputation, including the edge paths the driver's clean testdata
never exercises (quality ties, zero-margin groups, NULL text,
quantization-induced rank flips)."""

from __future__ import annotations

import math

import pytest

# ───────────────────────── preference_pairs ────────────────────────────────


def test_preference_pairs_mirror(spark):
    from sparkx.ops.corpus import preference_pairs

    # (group, id, q): g1 has a clear margin; g2 is an all-tie group (must
    # drop); g3 ties at BOTH ends so the min-id tiebreak decides; g4 has a
    # NULL quality (coalesces to -1.0 and loses).
    rows = [
        ("g1", 1, 0.9), ("g1", 2, 0.1), ("g1", 3, 0.5),
        ("g2", 1, 0.4), ("g2", 2, 0.4),
        ("g3", 1, 0.7), ("g3", 2, 0.7), ("g3", 3, 0.2), ("g3", 4, 0.2),
        ("g4", 7, None), ("g4", 8, 0.0),
    ]
    df = spark.createDataFrame(rows, "grp string, cid int, q double")
    got = {
        r["grp"]: (
            r["n_candidates"], r["chosen_id"], r["chosen_q"],
            r["rejected_id"], r["rejected_q"], r["margin_e4"],
        )
        for r in preference_pairs(
            df, group_col="grp", id_col="cid", quality_col="q"
        ).collect()
    }
    assert "g2" not in got  # zero-margin group dropped
    assert got["g1"] == (3, 1, 0.9, 2, 0.1, 8000)
    # g3: chosen = min-id among top ties (1), rejected = min-id among
    # bottom ties (3)
    assert got["g3"] == (4, 1, 0.7, 3, 0.2, 5000)
    # g4: NULL quality → -1.0, loses to 0.0
    assert got["g4"] == (2, 8, 0.0, 7, -1.0, 10000)


def test_preference_pairs_rejects_string_id(spark):
    from sparkx.ops.corpus import preference_pairs

    df = spark.createDataFrame(
        [("g", "a", 0.5)], "grp string, cid string, q double"
    )
    with pytest.raises(ValueError, match="numeric id_col"):
        preference_pairs(df, group_col="grp", id_col="cid", quality_col="q")


def test_preference_pairs_inline_quality_matches_quality_score(spark):
    """Without quality_col the op scores text inline with quality_score —
    pin that the pick then agrees with an explicit precomputed column."""
    from pyspark.sql import functions as F

    from sparkx.ops.corpus import preference_pairs
    from sparkx.ops.textstats import quality_score

    rows = [
        ("g", 1, "the quick brown fox jumps over the lazy dog"),
        ("g", 2, "!!! ??? ,,, ;;; ..."),
        ("g", 3, "a b c d e f g h i j k l m n o p q r s t"),
    ]
    df = spark.createDataFrame(rows, "grp string, cid int, text string")
    inline = preference_pairs(df, group_col="grp", id_col="cid").collect()
    pre = preference_pairs(
        df.withColumn("q", quality_score("text")),
        group_col="grp", id_col="cid", quality_col="q",
    ).collect()
    assert [r.asDict() for r in inline] == [r.asDict() for r in pre]


# ───────────────────────── sft_render_offsets ──────────────────────────────


def test_sft_render_offsets_tile_the_rendered_string(spark):
    """Offsets must be exactly the spans of each turn in the rendered
    conversation string — verified by actually rendering it in Python."""
    from sparkx.ops.corpus import sft_render_offsets

    convs = {
        "c1": [(0, "user", "hi"), (1, "assistant", "hello!"),
               (2, "tool", "{}"), (3, "assistant", "done")],
        "c2": [(5, "user", ""), (7, "assistant", None)],  # gap + NULL text
    }
    rows = [
        (c, i, r, t) for c, turns in convs.items() for (i, r, t) in turns
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = sft_render_offsets(df).collect()
    by_conv = {}
    for r in got:
        by_conv.setdefault(r["conv_id"], []).append(r)
    for c, turns in convs.items():
        rendered = "".join(
            f"<|{role}|>{text or ''}\n" for (_, role, text) in turns
        )
        out = sorted(by_conv[c], key=lambda r: r["turn_idx"])
        assert out[0]["start_off"] == 0
        assert out[-1]["end_off"] == len(rendered)
        for (idx, role, text), r in zip(turns, out):
            piece = f"<|{role}|>{text or ''}\n"
            assert r["turn_len"] == len(piece)
            assert (
                rendered[r["start_off"]:r["end_off"]] == piece
            ), (c, idx)
            assert r["loss_mask"] == (role == "assistant")
        # spans tile: each start is the previous end
        for prev, cur in zip(out, out[1:]):
            assert cur["start_off"] == prev["end_off"]


# ───────────────────────── ranking_metrics_report ──────────────────────────


def _mirror_metrics(vecs: dict, n_queries: int, k: int):
    """Pure-Python mirror of ranking_metrics_report (same grids)."""

    def cosine(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / math.sqrt(
            sum(x * x for x in a) * sum(y * y for y in b)
        )

    def codes(v):
        m = max(abs(x) for x in v)
        if m == 0:
            return [0] * len(v)
        return [math.floor(x * 127.0 / m + 0.5) for x in v]

    def gain(r):
        return math.floor(1_000_000.0 * math.log(2.0) / math.log(r + 1.0))

    idcg = sum(gain(r) for r in range(1, k + 1))
    out = {}
    for q in range(n_queries):
        fp = sorted(
            (
                (round(cosine(v, vecs[q]), 4), vid)
                for vid, v in vecs.items() if vid != q
            ),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        rel_rank = {vid: i + 1 for i, (_, vid) in enumerate(fp)}
        cq = codes(vecs[q])
        i8 = sorted(
            (
                (cosine(codes(v), cq), vid)
                for vid, v in vecs.items()
                if vid != q and any(codes(v))
            ),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        n_hits = dcg = rr = 0
        for i, (_, vid) in enumerate(i8):
            if vid in rel_rank:
                n_hits += 1
                dcg += gain(i + 1)
                if rel_rank[vid] == 1:
                    rr = 1_000_000 // (i + 1)
        out[q] = (n_hits, dcg, dcg * 1_000_000 // idcg, rr)
    return out


def test_ranking_metrics_mirror_with_rank_flip(spark):
    """Vectors crafted so int8 quantization TIES two near-neighbours that
    fp32 distinguishes — the vec_id tiebreak then demotes the fp-top-1
    doc, so MRR drops below 1 for that query and the metric math is
    exercised non-vacuously; the rest are deterministic filler."""
    from sparkx.ops.similarity import ranking_metrics_report

    vecs = {
        0: [1000.0, 0.0],
        1: [900.0, 400.0],
        # q0's two nearest: id 3 wins on fp32 (off-axis 28 < 35, cosines
        # 0.9996 vs 0.9994 — distinct at the op's 4-dp rounding) but BOTH
        # quantize to codes [127, 4] (floor(off·0.127 + 0.5) = 4 for
        # off ∈ [27.6, 35.4]) — the int8 ranking ties and its vec_id ASC
        # tiebreak puts id 2 first, demoting the fp-top-1 doc to system
        # rank 2 ⇒ MRR = 1e6 div 2 for q0.
        2: [1000.0, 35.0],
        3: [1000.0, 28.0],
        4: [800.0, 500.0],
        5: [-700.0, 100.0],
        6: [300.0, 950.0],
        7: [1000.0, 180.0],
    }
    # deterministic filler (no wall-clock / RNG)
    for i in range(8, 16):
        vecs[i] = [((i * 37) % 23) - 11.0, ((i * 53) % 29) - 14.0]
    n_queries, k = 2, 6
    rows = [(vid, [float(x) for x in v]) for vid, v in sorted(vecs.items())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # float32 storage truncates values; mirror on the float32-rounded vecs
    import numpy as np

    vecs32 = {
        vid: [float(np.float32(x)) for x in v] for vid, v in vecs.items()
    }
    want = _mirror_metrics(vecs32, n_queries, k)
    got = {
        r["q_id"]: (r["n_hits"], r["dcg_e6"], r["ndcg_e6"], r["rr_e6"])
        for r in ranking_metrics_report(df, n_queries=n_queries, k=k).collect()
    }
    assert got == want
    # non-vacuity: the crafted tie flip must demote q0's fp-top-1 doc to
    # system rank 2 (MRR = 0.5), so the metric math is exercised off the
    # all-perfect fixed point
    assert got[0][3] == 500_000


def test_ranking_metrics_perfect_ranking_is_all_ones(spark):
    """Angularly well-separated vectors survive int8 exactly: every
    query scores ndcg=mrr=1 and dcg equals the engine-side ideal DCG.
    (Near-collinear fixtures do NOT qualify — quantization legitimately
    flips ~1e-5-apart cosines; the spread here keeps gaps ≥ 0.2.)"""
    from sparkx.ops.similarity import ranking_metrics_report

    vecs = {
        0: [1000.0, 0.0],
        1: [800.0, 600.0],
        2: [0.0, 1000.0],
        3: [-600.0, 800.0],
        4: [-1000.0, 0.0],
        5: [-800.0, -600.0],
    }
    df = spark.createDataFrame(
        [(vid, v) for vid, v in vecs.items()],
        "vec_id long, embedding array<float>",
    )
    k = 4
    idcg = sum(
        math.floor(1_000_000.0 * math.log(2.0) / math.log(r + 1.0))
        for r in range(1, k + 1)
    )
    for r in ranking_metrics_report(df, n_queries=2, k=k).collect():
        assert r["n_hits"] == k
        assert r["dcg_e6"] == idcg
        assert r["ndcg_e6"] == 1_000_000
        assert r["rr_e6"] == 1_000_000


# ───────────────────────── zipf_fit ────────────────────────────────────────


def _zipf_mirror(counts, grid=1000):
    xs, ys = [], []
    ordered = sorted(counts, key=lambda t: (-t[1], t[0]))
    for rank0, (_tok, n) in enumerate(ordered):
        xs.append(math.floor(math.log(rank0 + 1) * grid))
        ys.append(math.floor(math.log(n) * grid))
    k = len(xs)
    if k < 2:
        return None
    num = k * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    den = k * sum(x * x for x in xs) - sum(xs) ** 2
    if den == 0:
        return None
    return (-1 if num < 0 else 1) * (abs(num) * 10000 // den)


def test_zipf_fit_mirror_and_perfect_zipf(spark):
    from sparkx.ops.textstats import zipf_fit

    # perfect Zipf: n = 100000 // rank — slope must land near −1
    counts = [(f"t{r:02d}", 100000 // r) for r in range(1, 41)]
    df = spark.createDataFrame(counts, "tok string, n long")
    row = zipf_fit(df).collect()[0]
    assert row["k"] == 40
    assert row["n_top"] == 100000 and row["n_kth"] == 2500
    assert row["slope_e4"] == _zipf_mirror(counts)
    assert -10500 <= row["slope_e4"] <= -9500  # ≈ −1

    # tie-heavy flat table (the sf0.01 shape): mirror must still agree
    flat = [(f"w{r}", 900 + (r % 3)) for r in range(10)] + [("rare", 5)]
    dff = spark.createDataFrame(flat, "tok string, n long")
    rowf = zipf_fit(dff).collect()[0]
    assert rowf["slope_e4"] == _zipf_mirror(flat)


def test_zipf_fit_degenerate_k1(spark):
    from sparkx.ops.textstats import zipf_fit

    df = spark.createDataFrame([("only", 7)], "tok string, n long")
    row = zipf_fit(df).collect()[0]
    assert row["k"] == 1 and row["slope_e4"] is None


# ───────────────────────── pack_efficiency ─────────────────────────────────


def test_pack_efficiency_mirror(spark):
    """Replay the pack layout in Python (md5 shard hash, per-(grp, shard)
    doc_id-ordered cumsum) and recompute the report; budget 10 so
    straddles and partial-sequence waste both occur."""
    import hashlib
    from collections import defaultdict

    from sparkx.ops.corpus import pack_efficiency

    docs = [
        (i, "en" if i % 3 else "de", " ".join(f"w{j}" for j in range(1 + i % 7)))
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    got = {
        r["grp"]: (
            r["n_docs"], r["n_shards_used"], r["n_seqs"], r["total_tokens"],
            r["waste_tokens"], r["fill_bp"], r["n_straddle"],
        )
        for r in pack_efficiency(
            df, budget_tokens=10, n_shards=2, by="lang"
        ).collect()
    }

    B = 10
    streams = defaultdict(list)
    for i, lang, text in docs:
        shard = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 2
        streams[(lang, shard)].append((i, len(text.split(" "))))
    per_grp = defaultdict(lambda: [0, 0, 0, 0, 0])  # docs, shards, seqs, toks, straddle
    for (lang, _shard), items in streams.items():
        off = 0
        toks = strad = 0
        for _i, n in sorted(items):
            if n > 0 and off // B != (off + n - 1) // B:
                strad += 1
            off += n
            toks += n
        g = per_grp[lang]
        g[0] += len(items)
        g[1] += 1
        g[2] += (toks + B - 1) // B
        g[3] += toks
        g[4] += strad
    want = {
        lang: (
            d, s, q, t, q * B - t, t * 10000 // (q * B), st
        )
        for lang, (d, s, q, t, st) in per_grp.items()
    }
    assert got == want
    # non-vacuity: straddles and waste must actually occur at budget 10
    assert any(v[6] > 0 for v in want.values())
    assert any(v[4] > 0 for v in want.values())
