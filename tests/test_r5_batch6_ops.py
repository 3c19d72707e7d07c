"""Edge-pinning tests for the r5 batch-6 ops: tool_latency_stats (TTF from
the true conversation start, gaps only between same-tool calls, NULL/empty
tool rows anchor but never emit), prefix_dedup (longest-wins/min-id pick,
numeric-id precondition, NULL≡empty grouping), and budget_truncate (the
turn-atomic drop-even-the-last-turn edge, exact token accounting)."""

from __future__ import annotations

import datetime as dt

import pytest


def _ts(s):
    return dt.datetime(2026, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)


# ── tool_latency_stats ────────────────────────────────────────────────


def _latency(spark, rows):
    from sparkx.ops.corpus import tool_latency_stats

    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, tool string, ts timestamp"
    )
    return {
        r["tool"]: (
            r["n_calls"], r["n_convs"], r["min_ttf_s"], r["max_ttf_s"],
            r["sum_ttf_s"], r["n_gaps"], r["max_gap_s"], r["sum_gap_s"],
        )
        for r in tool_latency_stats(df).collect()
    }


def test_tool_latency_ttf_anchors_on_nontool_turns(spark):
    # conv opens with a toolless turn at t=0; first 'search' at t=70 →
    # TTF counts from the TRUE conversation start, not the first tool turn
    out = _latency(spark, [
        ("c1", 0, "", _ts(0)),
        ("c1", 1, "search", _ts(70)),
        ("c1", 2, None, _ts(100)),
        ("c1", 3, "search", _ts(190)),
    ])
    assert out["search"] == (2, 1, 70, 70, 70, 1, 120, 120)


def test_tool_latency_gaps_are_per_tool_not_per_turn(spark):
    # browse interleaves between the two search calls: the search gap
    # links ACROSS it (190-10=180), and single-call browse has no gaps
    out = _latency(spark, [
        ("c1", 0, "search", _ts(10)),
        ("c1", 1, "browse", _ts(60)),
        ("c1", 2, "search", _ts(190)),
    ])
    assert out["search"] == (2, 1, 0, 0, 0, 1, 180, 180)
    n_calls, n_convs, *_rest, n_gaps, max_gap, sum_gap = out["browse"]
    assert (n_calls, n_convs, n_gaps) == (1, 1, 0)
    assert max_gap is None and sum_gap is None


def test_tool_latency_aggregates_across_convs(spark):
    # two convs, one call each: TTF 0 (tool turn IS the start) and 40
    out = _latency(spark, [
        ("a", 0, "exec", _ts(0)),
        ("b", 0, "", _ts(100)),
        ("b", 1, "exec", _ts(140)),
    ])
    assert out["exec"] == (2, 2, 0, 40, 40, 0, None, None)


# ── prefix_dedup ──────────────────────────────────────────────────────


def _prefix(spark, rows, prefix_chars=4):
    from sparkx.ops.dedup import prefix_dedup

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["keep_doc_id"], r["group_size"], r["is_kept"])
        for r in prefix_dedup(df, prefix_chars=prefix_chars).collect()
    }


def test_prefix_dedup_longest_wins_then_min_id(spark):
    out = _prefix(spark, [
        (1, "templ short"),
        (2, "templ much longer body"),
        (3, "templ much longer tail"),  # same len as 2 → min id wins
        (9, "other"),
    ])
    assert out[1] == (2, 3, False)
    assert out[2] == (2, 3, True)
    assert out[3] == (2, 3, False)
    assert out[9] == (9, 1, True)


def test_prefix_dedup_null_groups_with_empty(spark):
    out = _prefix(spark, [(1, None), (2, ""), (3, "x")])
    # NULL (len 0) and "" (len 0) share the empty-prefix group; tie → id 1
    assert out[1] == (1, 2, True)
    assert out[2] == (1, 2, False)
    assert out[3][2] is True


def test_prefix_dedup_rejects_string_ids(spark):
    from sparkx.ops.dedup import prefix_dedup

    df = spark.createDataFrame([("a", "t")], "doc_id string, text string")
    with pytest.raises(ValueError, match="numeric id_col"):
        prefix_dedup(df)


# ── budget_truncate ───────────────────────────────────────────────────


def _truncate(spark, rows, budget):
    from sparkx.ops.corpus import budget_truncate

    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )
    return {
        r["conv_id"]: (
            r["n_turns"], r["total_tokens"], r["n_kept"],
            r["tokens_kept"], r["truncated"],
        )
        for r in budget_truncate(df, budget_tokens=budget).collect()
    }


def test_budget_truncate_keeps_most_recent_turns(spark):
    out = _truncate(spark, [
        ("c", 0, "a b c d"),   # 4 tokens — dropped (cum from end = 9 > 6)
        ("c", 1, "e f g"),     # 3 tokens — kept (cum 5)
        ("c", 2, "h i"),       # 2 tokens — kept (cum 2)
    ], budget=6)
    assert out["c"] == (3, 9, 2, 5, True)


def test_budget_truncate_fully_kept_and_oversize_last_turn(spark):
    out = _truncate(spark, [
        ("ok", 0, "a b"),
        ("ok", 1, "c"),
        # single turn larger than the whole budget → 0 kept (turn-atomic)
        ("big", 0, "t1 t2 t3 t4 t5 t6 t7 t8"),
    ], budget=4)
    assert out["ok"] == (2, 3, 2, 3, False)
    assert out["big"] == (1, 8, 0, 0, True)


def test_budget_truncate_null_text_counts_like_empty(spark):
    # coalesce(NULL,'') tokenizes to 1 (the suite-wide empty-split rule)
    out = _truncate(spark, [("c", 0, None), ("c", 1, "x y")], budget=3)
    assert out["c"] == (2, 3, 2, 3, False)


# ── ivf_probe_curve ───────────────────────────────────────────────────


def test_probe_curve_monotone_and_exact_at_full_probe(spark):
    """Recall is nondecreasing in nprobe per query, and probing EVERY cell
    recovers the exact top-k (overlap == k) — plus agreement with
    ivf_recall_report at the shared point."""
    import random

    from sparkx.ops.similarity import (
        ivf_probe_curve, ivf_recall_report, load_frozen_centroids,
    )

    cents = load_frozen_centroids()
    dim, n_cells = len(cents[0]), len(cents)
    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    k = 5
    curve = {
        (r["q_id"], r["nprobe"]): r["n_overlap"]
        for r in ivf_probe_curve(
            df, cents, n_queries=4, k=k, probes=(1, 2, n_cells)
        ).collect()
    }
    assert len(curve) == 4 * 3
    for q in range(4):
        assert curve[(q, 1)] <= curve[(q, 2)] <= curve[(q, n_cells)]
        assert curve[(q, n_cells)] == k  # all cells probed == brute force
    single = {
        r["q_id"]: r["n_overlap"]
        for r in ivf_recall_report(
            df, cents, n_queries=4, k=k, nprobe=2
        ).collect()
    }
    assert all(curve[(q, 2)] == single[q] for q in range(4))


# ── minhash_threshold_sweep ───────────────────────────────────────────


def test_threshold_sweep_monotone_and_zero_floor(spark):
    """Counts are nonincreasing as the threshold tightens; thresholds no
    pair reaches report explicit zeros (spine semantics); agreement with
    a direct minhash_lsh_pairs run at each threshold."""
    from sparkx.ops.dedup import minhash_lsh_pairs, minhash_threshold_sweep

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base),                                   # exact dup of 1
        (3, base + " lambda mu nu"),                 # high-jaccard variant
        (4, "totally different words entirely here unrelated content"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sweep = {
        r["threshold_e4"]: (r["n_pairs"], r["n_docs_flagged"])
        for r in minhash_threshold_sweep(
            df, thresholds_e4=(3000, 6000, 9990)
        ).collect()
    }
    assert set(sweep) == {3000, 6000, 9990}
    assert sweep[3000][0] >= sweep[6000][0] >= sweep[9990][0]
    assert sweep[3000][1] >= sweep[6000][1] >= sweep[9990][1]
    assert sweep[9990] == (1, 1)  # only the exact dup survives 0.999
    # each curve point equals an independent single-threshold run
    for t in (3000, 6000, 9990):
        pairs = minhash_lsh_pairs(df, threshold=t / 10_000.0).collect()
        assert sweep[t][0] == len(pairs)
        assert sweep[t][1] == len({p["b_id"] for p in pairs})


# ── batch 7: fertility / compliance / dehyphenation ───────────────────


def test_tokenizer_fertility_exact_counts(spark):
    from sparkx.ops.textstats import tokenizer_fertility

    rows = [
        (1, "en", "hello, world!"),      # ws 2; bpe: hello , world ! = 4
        (2, "en", "plain words here"),   # ws 3; bpe 3
        (3, "de", None),                  # NULL → ws 1 (empty-split rule), bpe 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["lang"]: r for r in tokenizer_fertility(df).collect()}
    en = out["en"]
    assert (en["n_docs"], en["ws_tokens"], en["bpe_tokens"]) == (2, 5, 7)
    assert en["fertility_e4"] == 7 * 10000 // 5
    de = out["de"]
    assert (de["ws_tokens"], de["bpe_tokens"], de["fertility_e4"]) == (1, 0, 0)


def test_compliance_flags_precision(spark):
    from sparkx.ops.textstats import compliance_flags

    rows = [
        (1, "© 2026 Someone"),
        (2, "we opt out of model training entirely"),
        (3, "licensed under the Apache License 2.0"),
        (4, "paranoia is not an opt-out marker"),   # no false 'noai' hit
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (
            r["has_copyright"], r["has_noai"], r["has_license"],
            r["needs_review"],
        )
        for r in compliance_flags(df).collect()
    }
    assert out[1] == (True, False, False, True)
    assert out[2] == (False, True, False, True)
    assert out[3] == (False, False, True, True)
    assert out[4] == (False, False, False, False)
    assert out[5] == (False, False, False, False)


def test_dehyphenate_repairs_and_counts(spark):
    from sparkx.ops.textstats import dehyphenate_stats

    rows = [
        (1, "exam-\nple of a hyphen-\nbreak"),      # two LF breaks
        (2, "soft­hyphen and cr-\r\nlf break"),  # soft + CRLF break
        (3, "list item -\n not a word break"),       # space boundary: kept
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (
            r["n_soft_hyphens"], r["n_crlf"], r["n_hyphen_breaks"],
            r["text_repaired"],
        )
        for r in dehyphenate_stats(df).collect()
    }
    assert out[1] == (0, 0, 2, "example of a hyphenbreak")
    assert out[2] == (1, 1, 1, "softhyphen and crlf break")
    assert out[3] == (0, 0, 0, "list item -\n not a word break")
    assert out[4] == (0, 0, 0, "")


def test_quality_calibration_buckets_and_sentinel(spark):
    from sparkx.ops.textstats import (
        gopher_rules, quality_calibration, quality_score,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, None),                                    # NULL → -1 sentinel
        (2, "tiny"),                                  # low score, gopher fail
        (3, " ".join(f"the and of have with w{i}" for i in range(20))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["bucket"]: (r["n_docs"], r["n_pass"], r["pass_bp"])
        for r in quality_calibration(df).collect()
    }
    assert out[-1] == (1, 0, 0)  # NULL text: counted, never passing
    assert sum(v[0] for v in out.values()) == 3
    # cross-check bucket placement + pass flags against the components
    comp = df.select(
        "doc_id",
        F.round(quality_score("text") * 10000).cast("long").alias("q"),
    ).collect()
    keeps = {
        r["doc_id"]: r["keep"] for r in gopher_rules(df).collect()
    }
    for r in comp:
        if r["q"] is None:
            continue
        b = min(r["q"] // 1000, 9)
        assert b in out
        assert out[b][1] <= out[b][0]
        if keeps[r["doc_id"]]:
            assert out[b][1] >= 1


def test_scan_parallelism_bounds(spark):
    """The r5 row-group lesson as an op: a huge single-group file is
    row-group-bound with est_tasks=1; a small many-group file is
    byte-bound; recommended_groups lifts exactly to the byte cap."""
    from sparkx.ops.diag import scan_parallelism_report

    rows = [
        ("one_group_huge", 10 * 128 * 1024 * 1024, 1),
        ("many_groups_small", 1024, 64),
        ("balanced", 2 * 128 * 1024 * 1024, 2),
        ("zero_groups_listing_bug", 512, 0),
    ]
    df = spark.createDataFrame(
        rows, "path string, bytes long, n_row_groups int"
    )
    out = {
        r["path"]: (r["est_tasks"], r["bound"], r["recommended_groups"])
        for r in scan_parallelism_report(df).collect()
    }
    assert out["one_group_huge"] == (1, "row_groups", 10)
    assert out["many_groups_small"] == (1, "bytes", 1)
    assert out["balanced"] == (2, "bytes", 2)
    # caps tie at 1 → 'bytes' (a 512-byte file cannot parallelize anyway)
    assert out["zero_groups_listing_bug"] == (1, "bytes", 1)


def test_crawl_plan_closed_forms(spark):
    """Demand is the truncating proportional split; raw volume is the exact
    ceiling division by measured survival; an absent weighted source is an
    infeasible row, not a missing one."""
    import pytest as _pt

    from sparkx.ops.corpus import crawl_plan

    # passes gopher: >50 words, varied 2-grams, sane word lengths, stopwords
    good = " ".join(
        f"the alpha{i} and beta{i} of gamma{i} have delta{i} with eps{i}"
        for i in range(15)
    )
    rows = (
        [(i, "a", good + f" d{i}") for i in range(4)]       # 4 unique passing docs
        + [(10, "b", good + " x"), (11, "b", good + " x")]  # b: exact dups (keep 1/2)
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {
        r["source"]: r
        for r in crawl_plan(
            df, {"a": 3, "b": 1, "ghost": 1}, budget_tokens=1000
        ).collect()
    }
    a, b, g = out["a"], out["b"], out["ghost"]
    assert a["demand_tokens"] == 3 * 1000 // 5 and b["demand_tokens"] == 200
    assert a["keep_bp"] == 10000 and a["pass_bp"] == 10000
    assert a["raw_tokens_needed"] == a["demand_tokens"]  # survival 1.0
    assert b["keep_bp"] == 5000  # 1 unique of 2
    surv = b["keep_bp"] * b["pass_bp"]
    assert b["raw_tokens_needed"] == (b["demand_tokens"] * 10**8 + surv - 1) // surv
    assert g["n_docs"] is None and g["raw_tokens_needed"] is None
    assert g["feasible"] is False and a["feasible"] is True
    with _pt.raises(ValueError, match="positive"):
        crawl_plan(df, {"a": 0}, budget_tokens=10)


def test_page_meta_head_scoped(spark):
    """Body-injected metadata-shaped markup cannot leak in; a headless
    page yields all-absent; robots directives parse case-insensitively."""
    from sparkx.ops.html_extract import page_meta

    rows = [
        (1, '<head><title>Real</title><meta name="robots" content="NOINDEX"/>'
            '<link rel="canonical" href="/d9"/></head>'
            '<p><title>fake</title><link rel="canonical" href="/evil"/></p>'),
        (2, '<p>no head at all <title>body</title></p>'),
        (3, '<head><title></title></head>body'),   # empty title → NULL
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = {
        r["doc_id"]: (
            r["title"], r["robots"], r["noindex"], r["nofollow"],
            r["canonical_url"], r["declares_duplicate"],
        )
        for r in page_meta(df).collect()
    }
    assert out[1] == ("Real", "noindex", True, False, "/d9", True)
    assert out[2] == (None, "", False, False, None, False)
    assert out[3] == (None, "", False, False, None, False)
    assert out[4] == (None, "", False, False, None, False)


def test_agent_outcomes_precedence_and_no_assistant(spark):
    from sparkx.ops.corpus import agent_outcomes

    rows = [
        ("c1", 0, "user", "please do the thing"),
        ("c1", 1, "assistant", "working on it"),
        # LAST assistant turn wins; mixed markers → error beats apology
        ("c1", 2, "assistant", "I'm sorry, the tool FAILED badly"),
        ("c2", 0, "assistant", "Done! here is the result"),
        ("c3", 0, "user", "hello?"),
        ("c3", 1, "tool", "noise"),
        ("c4", 0, "assistant", "plain closing words"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = {
        r["conv_id"]: (r["last_assistant_idx"], r["outcome"])
        for r in agent_outcomes(df).collect()
    }
    assert out["c1"] == (2, "error")
    assert out["c2"] == (0, "done")
    assert out["c3"] == (None, "no_assistant")
    assert out["c4"] == (0, "unlabeled")


def test_conv_dedup_order_insensitive(spark):
    from sparkx.ops.dedup import conv_dedup

    rows = [
        ("a", "hello there"), ("a", "second turn"),
        ("b", "second turn"), ("b", "hello there"),   # same multiset, reordered
        ("c", "hello there"), ("c", "different turn"),
        ("d", None), ("e", ""),                        # NULL ≡ empty turn
    ]
    df = spark.createDataFrame(rows, "conv_id string, text string")
    out = {
        r["conv_id"]: (r["keep_conv_id"], r["group_size"], r["is_kept"])
        for r in conv_dedup(df).collect()
    }
    assert out["a"] == ("a", 2, True)
    assert out["b"] == ("a", 2, False)   # reordered re-log collapses
    assert out["c"][1] == 1 and out["c"][2] is True
    assert out["d"] == ("d", 2, True) and out["e"] == ("d", 2, False)


def test_conv_lang_mix_dominant_and_switches(spark):
    from sparkx.ops.corpus import conv_lang_mix

    rows = [
        ("m", 0, "the cat and the dog is a pet"),        # en
        ("m", 1, "der hund und die katze ist nicht da"), # de
        ("m", 2, "the end of it is a wrap"),             # en
        ("u", 0, "zzz qqq xxx"),                          # und
        ("t", 0, "the thing is a test"),                  # en
        ("t", 1, "das ist der test und nicht mehr"),     # de — tie 1:1? no, 1 en 1 de
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )
    out = {
        r["conv_id"]: (
            r["n_turns"], r["n_en"], r["n_de"], r["n_und"],
            r["dominant_lang"], r["dominant_bp"], r["n_switches"],
        )
        for r in conv_lang_mix(df).collect()
    }
    assert out["m"] == (3, 2, 1, 0, "en", 6666, 2)
    assert out["u"] == (1, 0, 0, 1, "und", 10000, 0)
    # 1 en vs 1 de tie → en wins by LANG_ORDER precedence (lang_id's rule)
    assert out["t"] == (2, 1, 1, 0, "en", 5000, 1)
