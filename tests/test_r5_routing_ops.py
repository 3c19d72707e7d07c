"""Loop-mirror tests for the r5 routing operators: conv_sessions
(gap-based session segmentation) and code_likeness (code-vs-prose
routing flags).  Each Spark result is compared against a boring
pure-Python recomputation, including the edges the driver's derived
transcripts never exercise (out-of-order timestamps, exact-threshold
gaps, NULL/empty text, fence-only documents, threshold boundaries)."""

from __future__ import annotations

import re

import pytest

# ───────────────────────── conv_sessions ───────────────────────────────────


def _sessions_mirror(rows, gap_sec):
    """rows: (conv, idx, ep).  Returns {(conv, session_idx): summary}."""
    by_conv = {}
    for conv, idx, ep in rows:
        by_conv.setdefault(conv, []).append((idx, ep))
    out = {}
    for conv, turns in by_conv.items():
        turns.sort()
        sess, prev_ep = -1, None
        for idx, ep in turns:
            if prev_ep is None or ep - prev_ep > gap_sec:
                sess += 1
            key = (conv, sess)
            s = out.setdefault(key, {"n": 0, "lo": idx, "hi": idx,
                                     "elo": ep, "ehi": ep})
            s["n"] += 1
            s["lo"], s["hi"] = min(s["lo"], idx), max(s["hi"], idx)
            s["elo"], s["ehi"] = min(s["elo"], ep), max(s["ehi"], ep)
            prev_ep = ep
    return out


def test_conv_sessions_mirror(spark):
    from pyspark.sql import functions as F

    from sparkx.ops.corpus import conv_sessions

    # c1: gap exactly 60 does NOT split; 61 does.  c2: out-of-order ts →
    # negative gap extends the session (clock hiccup never fragments).
    # c3: single turn.  c4: every gap splits.
    rows = [
        ("c1", 0, 1000), ("c1", 1, 1060), ("c1", 2, 1121),
        ("c2", 0, 2000), ("c2", 1, 1990), ("c2", 2, 2045),
        ("c3", 5, 3000),
        ("c4", 0, 0), ("c4", 1, 100), ("c4", 2, 200),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ep long"
    ).select("conv_id", "turn_idx", F.timestamp_seconds("ep").alias("ts"))
    got = {
        (r["conv_id"], r["session_idx"]): (
            r["n_turns"], r["first_turn_idx"], r["last_turn_idx"],
            r["span_sec"],
        )
        for r in conv_sessions(df, gap_sec=60).collect()
    }
    want = _sessions_mirror(rows, 60)
    assert set(got) == set(want)
    for key, s in want.items():
        assert got[key] == (s["n"], s["lo"], s["hi"], s["ehi"] - s["elo"]), key
    # the named edges, pinned explicitly
    assert ("c1", 0) in got and ("c1", 1) in got        # 61 splits, 60 not
    assert got[("c1", 0)][0] == 2
    assert got[("c2", 0)] == (3, 0, 2, 55)              # negative gap extends
    assert got[("c3", 0)] == (1, 5, 5, 0)
    assert len([k for k in got if k[0] == "c4"]) == 3   # every 100s gap splits


def test_conv_sessions_splits_every_large_gap(spark):
    from pyspark.sql import functions as F

    from sparkx.ops.corpus import conv_sessions

    rows = [("c4", 0, 0), ("c4", 1, 100), ("c4", 2, 200)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ep long"
    ).select("conv_id", "turn_idx", F.timestamp_seconds("ep").alias("ts"))
    got = sorted(
        (r["session_idx"], r["n_turns"])
        for r in conv_sessions(df, gap_sec=60).collect()
    )
    assert got == [(0, 1), (1, 1), (2, 1)]


# ───────────────────────── code_likeness ───────────────────────────────────

_SYM = re.compile(r"[{}();=<>]")
_SNAKE = re.compile(r"[a-z0-9]+_[a-z0-9]+")
_KW = re.compile(r"(def |return |import |#include)")


def _code_mirror(text, threshold_e4=200):
    txt = text or ""
    lines = txt.split("\n")
    n_sym = len(_SYM.findall(txt))
    n_snake = len(_SNAKE.findall(txt))
    n_indent = sum(
        1 for x in lines if x.startswith("    ") or x.startswith("\t")
    )
    n_kw = len(_KW.findall(txt))
    tlen = max(len(txt), 1)
    score = ((n_sym * 2 + n_snake * 3 + n_indent * 5 + n_kw * 5) * 10000
             ) // tlen + (2000 if "```" in txt else 0)
    return (n_sym, n_snake, n_indent, n_kw, len(lines), score,
            score >= threshold_e4)


@pytest.mark.parametrize(
    "text",
    [
        None,                                     # NULL → all-zero, not code
        "",                                       # len clamp (no div by 0)
        "plain prose with no code at all here",
        "def f(x):\n    return snake_case_id;\n",  # all four signals
        "\tif (a==b) { c(); }\n\tx_y = 1",         # tab indent + symbols
        "```\n```",                                # fence-only: flat +2000
        "a_b_c d_e",                               # leftmost-greedy snake=2
        "predefined return_value importance",      # kw needs trailing space
        "line\n\n\n",                              # trailing empties kept
    ],
)
def test_code_likeness_mirror(spark, text):
    from sparkx.ops.textstats import code_likeness

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = code_likeness(df, threshold_e4=200).collect()[0]
    n_sym, n_snake, n_indent, n_kw, n_lines, score, is_code = _code_mirror(
        text
    )
    assert (
        r["n_sym"], r["n_snake"], r["n_indent"], r["n_kw"], r["n_lines"],
        r["code_score_e4"], r["is_code"],
    ) == (n_sym, n_snake, n_indent, n_kw, n_lines, score, is_code), text


def test_code_likeness_threshold_boundary(spark):
    from sparkx.ops.textstats import code_likeness

    # fence alone scores exactly 2000 on any text: pick thresholds around it
    df = spark.createDataFrame([(1, "```")], "doc_id long, text string")
    hi = code_likeness(df, threshold_e4=2001).collect()[0]
    at = code_likeness(df, threshold_e4=2000).collect()[0]
    assert at["is_code"] and not hi["is_code"]
    assert at["code_score_e4"] == 2000


def test_code_likeness_plan_is_map_only(spark):
    """No shuffle, no Python in the plan — pure scan-side routing."""
    from sparkx.ops.textstats import code_likeness

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = code_likeness(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
