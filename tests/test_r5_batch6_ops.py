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
