"""Loop-mirror + edge tests for the batch-10 operator: turn_echo
(adjacent-turn echo/quotation audit).  The Spark result is compared
against a boring pure-Python recomputation on a hand-built conversation
set covering the edges the driver's clean transcript derivation never
hits: single-turn conversations, NULL/whitespace-only text, identical
adjacent turns (jac 10000), disjoint turns (jac 0), tool-role pairs
(excluded from ua counts but still scored), and the truncating-division
grid."""

from __future__ import annotations

import re


def _toks(text):
    return set(
        t
        for t in re.split(r"[ \t\n\x0b\f\r]+", (text or "").strip(" "))
        if t != ""
    )


def _oracle(rows, thr=2500):
    """rows: (conv, idx, role, text) → {conv: expected tuple}."""
    from collections import defaultdict

    by_conv = defaultdict(list)
    for c, i, r, t in rows:
        by_conv[c].append((i, r, t))
    out = {}
    for c, turns in by_conv.items():
        turns.sort(key=lambda x: x[0])
        n_pairs = n_ua = n_echo = 0
        jacs = []
        for (pi, pr, pt), (ci, cr, ct) in zip(turns, turns[1:]):
            a, b = _toks(pt), _toks(ct)
            inter = len(a & b)
            un = len(a | b)
            jac = (inter * 10000) // max(un, 1)
            jacs.append(jac)
            n_pairs += 1
            is_ua = pr == "user" and cr == "assistant"
            n_ua += is_ua
            n_echo += is_ua and jac >= thr
        out[c] = (
            n_pairs,
            n_ua,
            n_echo,
            max(jacs) if jacs else 0,
            sum(jacs) // max(n_pairs, 1),
            (n_echo * 10000) // max(n_ua, 1),
        )
    return out


ROWS = [
    # full echo: assistant repeats the user verbatim (jac 10000)
    ("c1", 0, "user", "please run the deploy script now"),
    ("c1", 1, "assistant", "please run the deploy script now"),
    # partial echo above threshold: shared {run, the, deploy, script}
    ("c1", 2, "user", "run the deploy script again please thanks"),
    ("c1", 3, "assistant", "i will run the deploy script"),
    # disjoint pair (jac 0), and a tool-role pair (scored, not ua)
    ("c2", 0, "user", "alpha beta gamma"),
    ("c2", 1, "assistant", "delta epsilon zeta"),
    ("c2", 2, "tool", "alpha beta gamma"),
    # NULL and whitespace-only texts → empty token sets, jac 0
    ("c3", 0, "user", None),
    ("c3", 1, "assistant", "   "),
    ("c3", 2, "user", "\t\n"),
    # single-turn conversation → all-zero row, max_jac 0
    ("c4", 0, "user", "lonely"),
    # duplicate tokens collapse to a distinct set: jac = 2/2 = 10000
    ("c5", 0, "user", "word word word other"),
    ("c5", 1, "assistant", "other word"),
]


def test_turn_echo_mirror(spark):
    from sparkx.ops.corpus import turn_echo

    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, role string, text string"
    )
    got = {
        r["conv_id"]: (
            r["n_pairs"],
            r["n_ua_pairs"],
            r["n_echo_pairs"],
            r["max_jac_e4"],
            r["mean_jac_e4"],
            r["echo_share_e4"],
        )
        for r in turn_echo(df).collect()
    }
    assert got == _oracle(ROWS)
    # pin the interesting values explicitly, not just the mirror
    assert got["c1"][3] == 10000  # verbatim echo
    assert got["c1"][2] == 2  # both ua pairs echo (4/7 tokens = 5714)
    assert got["c2"] == (2, 1, 0, 0, 0, 0)  # tool pair scored, not ua
    assert got["c4"] == (0, 0, 0, 0, 0, 0)  # single turn
    assert got["c5"][3] == 10000  # distinct-set collapse


def test_turn_echo_threshold_and_order(spark):
    from sparkx.ops.corpus import turn_echo

    # out-of-order input rows must not change pairing (stable turn
    # ordering is by turn_idx, not arrival), and a stricter threshold
    # flips the partial-echo pair off while the verbatim pair stays.
    df = spark.createDataFrame(
        list(reversed(ROWS)),
        "conv_id string, turn_idx int, role string, text string",
    )
    got = {
        r["conv_id"]: (r["n_echo_pairs"], r["echo_share_e4"])
        for r in turn_echo(df, echo_threshold_e4=9000).collect()
    }
    assert got["c1"] == (1, 5000)  # only the verbatim pair survives
    exp = _oracle(ROWS, thr=9000)
    assert {c: v[2] for c, v in exp.items()} == {
        c: v[0] for c, v in got.items()
    }


def test_turn_echo_single_exchange_plan(spark):
    """The lag window and the per-conv aggregate must share ONE hash
    Exchange (the aggregate reuses the window's partitioning).  Detail
    headers are the bare node name (CLAUDE.md) — count `(n) Exchange`
    lines, never `Exchange hashpartitioning` substrings."""
    from sparkx.ops.corpus import turn_echo

    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, role string, text string"
    )
    plan = turn_echo(df)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    n_ex = len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))
    assert n_ex == 1, f"turn_echo plan has {n_ex} Exchanges (want 1)\n{plan}"
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


# ───────────────────────── context_fit ─────────────────────────────────────


def _ctx_oracle(rows, sizes):
    """rows: (conv, text) → {ctx: (n_convs, n_fit, fit_e4, total, lost,
    kept_e4)} — whitespace token counts, Java-\\s class, NULL→0."""
    from collections import defaultdict

    per = defaultdict(int)
    seen = set()
    for c, t in rows:
        seen.add(c)
        if t is not None:
            per[c] += len(re.split(r"[ \t\n\x0b\f\r]+", t.strip(" ")))
    out = {}
    for ctx in sizes:
        toks = [per[c] for c in seen]
        n_fit = sum(1 for n in toks if n <= ctx)
        total = sum(toks)
        kept = sum(min(n, ctx) for n in toks)
        out[ctx] = (
            len(seen),
            n_fit,
            (n_fit * 10000) // max(len(seen), 1),
            total,
            total - kept,
            (kept * 10000) // max(total, 1),
        )
    return out


def test_context_fit_mirror(spark):
    from sparkx.ops.corpus import context_fit

    # c1: 3 tokens total; c2: 12; c3: all-NULL conversation (0 tokens —
    # must count as fitting everywhere, not vanish); c4: straddles the
    # small size exactly (boundary <= is inclusive)
    rows = [
        ("c1", "one two three"),
        ("c2", "a b c d"), ("c2", "e f g h"), ("c2", "i j k l"),
        ("c3", None),
        ("c4", "t1 t2 t3 t4 t5"),
    ]
    df = spark.createDataFrame(
        [(c, 0, "user", t) for c, t in rows],
        "conv_id string, turn_idx int, role string, text string",
    )
    sizes = (4, 5, 100)
    got = {
        r["ctx"]: (
            r["n_convs"], r["n_fit"], r["fit_share_e4"],
            r["total_tokens"], r["lost_tokens"], r["kept_share_e4"],
        )
        for r in context_fit(df, context_sizes=sizes).collect()
    }
    assert got == _ctx_oracle(rows, sizes)
    assert got[4][1] == 2   # c1(3 tokens) and all-NULL c3(0) fit at 4
    assert got[5][1] == 3   # c4's 5 tokens fit at exactly 5 (inclusive)
    assert got[100] == (4, 4, 10000, 20, 0, 10000)


def test_context_fit_empty_and_guard(spark):
    import pytest as _pytest

    from sparkx.ops.corpus import context_fit

    df = spark.createDataFrame(
        [], "conv_id string, turn_idx int, role string, text string"
    )
    assert context_fit(df, context_sizes=(8,)).count() == 0
    with _pytest.raises(ValueError):
        context_fit(df, context_sizes=())
