"""Loop-mirror tests for the r5 batch-3 operators: rule_ablation (Gopher
rule-wise fail / unique-reject table), dup_by_source (per-source
duplication scorecard), and mix_plan (token-budget mixture planner).
The ablation mirror re-derives the accounting from gopher_rules' own
signal output (the signals themselves are pinned by the existing gopher
tests and the driver hash gate), so what is tested here is exactly the
layer each new op adds."""

from __future__ import annotations

THRESH = dict(
    min_words=50, max_words=100_000, min_mean_word_len=3.0,
    max_mean_word_len=10.0, max_symbol_ratio=0.1, max_bullet_frac=0.9,
    max_ellipsis_frac=0.3, min_stop_hits=2, max_dup_line_frac=0.3,
    max_dup_2gram_frac=0.2,
)


def _fails(sig, t=THRESH):
    return {
        "n_words": not (t["min_words"] <= sig["n_words"] <= t["max_words"]),
        "mean_word_len": not (
            t["min_mean_word_len"] <= sig["mean_word_len"] <= t["max_mean_word_len"]
        ),
        "symbol_ratio": sig["symbol_ratio"] > t["max_symbol_ratio"],
        "bullet_frac": sig["bullet_frac"] > t["max_bullet_frac"],
        "ellipsis_frac": sig["ellipsis_frac"] > t["max_ellipsis_frac"],
        "stop_hits": sig["stop_hits"] < t["min_stop_hits"],
        "dup_line_frac": sig["dup_line_frac"] > t["max_dup_line_frac"],
        "dup_2gram_frac": sig["dup_2gram_frac"] > t["max_dup_2gram_frac"],
    }


def test_rule_ablation_mirror(spark):
    """Ablation accounting re-derived from gopher_rules' own signals: a
    healthy doc, a symbol-only failure (unique), a too-short doc (fails
    n_words AND stop_hits — counted in both n_fail columns, in NEITHER
    n_unique_reject)."""
    from sparkx.ops.textstats import gopher_rules, rule_ablation

    # non-repetitive by construction (unique word{i} tokens — a repeated
    # phrase would trip dup_2gram_frac and silently break the "unique
    # failure" cases below)
    healthy = "the and that have with to be of " + " ".join(
        f"word{i}" for i in range(60)
    )
    rows = [
        (1, healthy),
        (2, healthy + " " + "#" * 100),     # symbol_ratio only (one token)
        (3, "tiny doc"),                    # n_words + stop_hits
        (4, healthy),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = [r.asDict() for r in gopher_rules(df).collect()]
    per_doc = [_fails(s) for s in sigs]
    want = {}
    for rule in per_doc[0]:
        n_fail = sum(f[rule] for f in per_doc)
        n_unique = sum(
            f[rule] and sum(f.values()) == 1 for f in per_doc
        )
        want[rule] = (n_fail, n_unique, len(rows))
    got = {
        r["rule"]: (r["n_fail"], r["n_unique_reject"], r["n_docs"])
        for r in rule_ablation(df).collect()
    }
    assert got == want
    # non-vacuity: the engineered failures actually landed
    assert got["symbol_ratio"] == (1, 1, 4)
    assert got["n_words"][0] == 1 and got["n_words"][1] == 0
    assert got["stop_hits"][0] == 1 and got["stop_hits"][1] == 0


def test_rule_ablation_threshold_passthrough(spark):
    """Loosening one threshold through the kwargs moves exactly that
    rule's row (the predicates come from the same shared helper keep
    uses, so the ablation tracks the filter by construction)."""
    from sparkx.ops.textstats import rule_ablation

    df = spark.createDataFrame([(1, "tiny doc")], "doc_id long, text string")
    strict = {r["rule"]: r["n_fail"] for r in rule_ablation(df).collect()}
    loose = {
        r["rule"]: r["n_fail"]
        for r in rule_ablation(df, min_words=1, min_stop_hits=0).collect()
    }
    assert strict["n_words"] == 1 and loose["n_words"] == 0
    assert strict["stop_hits"] == 1 and loose["stop_hits"] == 0
    assert strict["symbol_ratio"] == loose["symbol_ratio"] == 0


def test_dup_by_source_scorecard(spark):
    """Hand-computed scorecard: within-source dups, a cross-source shared
    text (counted once per source in n_cross_fp, NOT a within-source dup
    when it appears once there), and whitespace-normalized equality."""
    from sparkx.ops.dedup import dup_by_source

    rows = [
        (1, "A", "same text"),
        (2, "A", "same   text"),     # normalized dup of 1 (ws collapse)
        (3, "A", "shared banner"),
        (4, "A", "unique to a"),
        (5, "B", "shared banner"),
        (6, "B", "unique to b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r.asDict() for r in dup_by_source(df).collect()}
    assert got["A"] == {
        "source": "A", "n_docs": 4, "n_unique": 3, "n_dup_rows": 1,
        "dup_rate_e4": 2500, "n_cross_fp": 1,
    }
    assert got["B"] == {
        "source": "B", "n_docs": 2, "n_unique": 2, "n_dup_rows": 0,
        "dup_rate_e4": 0, "n_cross_fp": 1,
    }


def test_mix_plan_arithmetic(spark):
    """Integer-grid plan math: downsampling rate, upsampling epochs with
    the rate capped at 1e6, a weight-0 source (observed but excluded),
    and truncating division throughout."""
    from sparkx.ops.corpus import mix_plan

    rows = [
        (1, "big", "w " * 400),   # 400 tokens... (trailing split artifact)
        (2, "small", "x y z"),    # 3 tokens
        (3, "zero", "a b c d"),   # 4 tokens, not in weights
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["source"]: r.asDict()
        for r in mix_plan(
            df, {"big": 3, "small": 1}, budget_tokens=400
        ).collect()
    }
    sum_w = 4
    big_avail = got["big"]["avail_tokens"]
    assert big_avail == 400
    big_tgt = (400 * 3) // sum_w    # 300 ≤ 400 available → downsample
    assert got["big"]["target_tokens"] == big_tgt
    assert got["big"]["rate_e6"] == (big_tgt * 1_000_000) // big_avail == 750_000
    assert got["big"]["epochs"] == 1
    small_tgt = (400 * 1) // sum_w  # 100 vs 3 available → heavy upsample
    assert got["small"]["target_tokens"] == small_tgt
    assert got["small"]["rate_e6"] == 1_000_000  # capped
    assert got["small"]["epochs"] == (small_tgt + 3 - 1) // 3
    assert got["zero"] == {
        "source": "zero", "avail_tokens": 4, "weight": 0,
        "target_tokens": 0, "rate_e6": 0, "epochs": 0,
    }


def test_mix_plan_validates_inputs(spark):
    from sparkx.ops.corpus import mix_plan

    df = spark.createDataFrame([(1, "a", "t")], "doc_id long, source string, text string")
    import pytest

    with pytest.raises(ValueError):
        mix_plan(df, {"a": 0}, budget_tokens=10)
    with pytest.raises(ValueError):
        mix_plan(df, {"a": 1}, budget_tokens=-5)
