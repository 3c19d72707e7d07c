"""Loop-mirror tests for the r5 final-session operators:
merge_adjacent_turns (chat normalization), conv_prefix_groups
(conversation branch collapse), split_leakage (near-dup split audit),
readability (FK grade / reading ease on the e3 grid), and
lexical_diversity (TTR / hapax ratios).  Each Spark result is compared
against a boring pure-Python recomputation, plus the edges the driver's
derived transcripts never exercise (NULL roles and texts, sub-k
conversations, empty prefix signatures, zero-leak splits, blank
documents, terminator-free headlines)."""

from __future__ import annotations

import re

# ───────────────────── merge_adjacent_turns ─────────────────────────────────


def _merge_mirror(rows, sep="\n"):
    """rows: (conv, idx, role, text).  Returns {(conv, block_idx): tuple}."""
    by_conv = {}
    for conv, idx, role, text in rows:
        by_conv.setdefault(conv, []).append((idx, role, text))
    out = {}
    for conv, turns in by_conv.items():
        turns.sort(key=lambda t: t[0])
        blk, prev_role, started = -1, object(), False
        for idx, role, text in turns:
            if not started or role != prev_role:
                blk += 1
            started, prev_role = True, role
            key = (conv, blk)
            s = out.setdefault(
                key, {"role": role, "n": 0, "lo": idx, "hi": idx, "txt": []}
            )
            s["n"] += 1
            s["lo"] = min(s["lo"], idx)
            s["hi"] = max(s["hi"], idx)
            s["txt"].append(text if text is not None else "")
        # normalize
    return {
        k: (v["role"], v["n"], v["lo"], v["hi"], sep.join(v["txt"]))
        for k, v in out.items()
    }


def test_merge_adjacent_turns_mirror(spark):
    """Runs of 1, 2, and 3; NULL text inside a run; a NULL-role run (the
    null-safe island rule merges it); single-turn conversation."""
    from sparkx.ops.corpus import merge_adjacent_turns

    rows = [
        ("c1", 0, "user", "a"),
        ("c1", 1, "user", None),
        ("c1", 2, "assistant", "b"),
        ("c1", 3, "assistant", "c"),
        ("c1", 4, "assistant", "d"),
        ("c1", 5, "user", "e"),
        ("c2", 0, None, "x"),
        ("c2", 1, None, "y"),
        ("c2", 2, "user", "z"),
        ("c3", 7, "tool", "only"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {
        (r["conv_id"], r["block_idx"]): (
            r["role"], r["n_merged"], r["first_turn_idx"],
            r["last_turn_idx"], r["text"],
        )
        for r in merge_adjacent_turns(df).collect()
    }
    assert got == _merge_mirror(rows)
    # non-vacuity: a 3-run, a NULL-text merge, and a NULL-role merge occur
    assert got[("c1", 1)] == ("assistant", 3, 2, 4, "b\nc\nd")
    assert got[("c1", 0)] == ("user", 2, 0, 1, "a\n")
    assert got[("c2", 0)][1] == 2 and got[("c2", 0)][0] is None


def test_merge_adjacent_turns_custom_sep_and_order(spark):
    """Out-of-order input rows must not change block assembly (the window
    orders by turn_idx, the block join by the struct sort)."""
    from sparkx.ops.corpus import merge_adjacent_turns

    rows = [
        ("c", 2, "u", "third"),
        ("c", 0, "u", "first"),
        ("c", 1, "u", "second"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    r = merge_adjacent_turns(df, sep=" | ").collect()
    assert len(r) == 1
    assert r[0]["text"] == "first | second | third"


# ───────────────────── conv_prefix_groups ───────────────────────────────────


def test_conv_prefix_groups_mirror(spark):
    """Three convs share a prefix (different lengths → longest canonical,
    conv-id tiebreak among equals); one conv has fewer than k turns; one
    conv has NO turns below k (empty signature)."""
    import hashlib

    from sparkx.ops.dedup import conv_prefix_groups

    rows = [
        # group A: a1 (3 turns), a2 (4 turns) → a2 canonical; a3 ties a1
        ("a1", 0, "hi"), ("a1", 1, "there"), ("a1", 2, "x"),
        ("a2", 0, "hi"), ("a2", 1, "there"), ("a2", 2, "y"), ("a2", 3, "z"),
        ("a3", 0, "hi"), ("a3", 1, "there"), ("a3", 2, "w"),
        # short conv: only one prefix turn (signs just 'solo')
        ("b1", 0, "solo"),
        # no turns below k=2 → empty signature
        ("c1", 5, "late"), ("c1", 6, "later"),
        # NULL text in prefix → '' contribution
        ("d1", 0, None), ("d1", 1, "tail"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {
        r["conv_id"]: (
            r["prefix_sig"], r["n_turns"], r["n_branches"], r["is_canonical"]
        )
        for r in conv_prefix_groups(df, k=2).collect()
    }

    def sig(*texts):
        return hashlib.md5("\x1f".join(texts).encode()).hexdigest()

    sa = sig("hi", "there")
    assert got["a2"] == (sa, 4, 3, True)
    assert got["a1"] == (sa, 3, 3, False)
    assert got["a3"] == (sa, 3, 3, False)
    assert got["b1"] == (sig("solo"), 1, 1, True)
    assert got["c1"] == (sig(""), 2, 1, True)  # md5('') group
    assert got["d1"] == (sig("", "tail"), 2, 1, True)


def test_conv_prefix_groups_tiebreak_is_conv_id(spark):
    from sparkx.ops.dedup import conv_prefix_groups

    rows = [("z9", 0, "p"), ("a1", 0, "p")]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {r["conv_id"]: r["is_canonical"] for r in conv_prefix_groups(df, k=1).collect()}
    assert got == {"a1": True, "z9": False}


# ───────────────────────── split_leakage ────────────────────────────────────


def test_split_leakage_counts_and_zero_leak(spark):
    from sparkx.ops.corpus import split_leakage

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (6, 7)], "a_id long, b_id long"
    )
    splits = spark.createDataFrame(
        [(1, "train"), (2, "val"), (3, "train"), (4, "test"), (5, "test"),
         (6, "train"), (7, "val")],
        "doc_id long, split string",
    )
    got = {
        (r["split_a"], r["split_b"]): (r["n_edges"], r["is_leak"])
        for r in split_leakage(pairs, splits).collect()
    }
    # edges: (1,2) train-val leak; (1,3) train-train; (2,3) train-val leak;
    # (4,5) test-test; (6,7) train-val leak
    assert got == {
        ("train", "val"): (3, True),
        ("train", "train"): (1, False),
        ("test", "test"): (1, False),
    }
    # cluster-atomic split → zero leak rows
    atomic = spark.createDataFrame(
        [(i, "train") for i in (1, 2, 3)] + [(i, "test") for i in (4, 5)]
        + [(i, "val") for i in (6, 7)],
        "doc_id long, split string",
    )
    leaks = [
        r for r in split_leakage(pairs, atomic).collect() if r["is_leak"]
    ]
    assert leaks == []


# ───────────────────────── readability ──────────────────────────────────────


def _read_mirror(text):
    txt = (text or "").strip(" ")
    if txt == "":
        return (None,) * 5
    w = len(re.split(r"[ \t\n\x0b\f\r]+", txt))
    s = max(len(re.findall(r"[.!?]+", txt)), 1)
    syl = len(re.findall(r"[aeiouy]+", txt.lower()))
    fk = (390 * w) // s + (11800 * syl) // w - 15590
    ease = 206835 - (1015 * w) // s - (84600 * syl) // w
    return (w, s, syl, fk, ease)


def test_readability_mirror(spark):
    from sparkx.ops.textstats import readability

    texts = [
        "Hello world. How are you?",          # two sentences
        "headline with no terminator",         # clamp s=1
        "Wow!!! Ellipsis... works?!",          # terminator RUNS count once
        "",                                    # blank → NULLs
        None,                                  # NULL → NULLs
        "bcd fgh",                             # zero syllables
        "  padded   whitespace\ttabs\nnewlines. ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_words"], r["n_sents"], r["n_syll"],
            r["fk_grade_e3"], r["ease_e3"],
        )
        for r in readability(df).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _read_mirror(t), repr(t)
    # non-vacuity: the run-collapse case really has 3 sentences, not 8
    assert got[2][1] == 3
    assert got[3] == (None,) * 5 and got[4] == (None,) * 5


def test_readability_plan_is_map_only(spark):
    from sparkx.ops.textstats import readability

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = readability(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ───────────────────── lexical_diversity ────────────────────────────────────


def _ttr_mirror(text):
    toks = [t for t in re.split(r"[ \t\n\x0b\f\r]+", (text or "").strip(" ")) if t != ""]
    if not toks:
        return None
    n = len(toks)
    counts = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    types = len(counts)
    hapax = sum(1 for c in counts.values() if c == 1)
    return (n, types, hapax, (types * 10000) // n, (hapax * 10000) // n)


def test_lexical_diversity_mirror(spark):
    from sparkx.ops.textstats import lexical_diversity

    texts = [
        "a a b",                       # ttr 6666, hapax 3333 (truncating)
        "all unique tokens here",
        "spam spam spam spam",         # single type, zero hapax
        "x\ty x\nz  y",                # whitespace variants, dups across them
        "",                            # no tokens → row dropped
        None,                          # NULL → dropped
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_types"], r["n_hapax"],
            r["ttr_e4"], r["hapax_e4"],
        )
        for r in lexical_diversity(df).collect()
    }
    for i, t in enumerate(texts):
        want = _ttr_mirror(t)
        if want is None:
            assert i not in got, repr(t)
        else:
            assert got[i] == want, repr(t)
    assert got[0] == (3, 2, 1, 6666, 3333)
    assert got[2] == (4, 1, 0, 2500, 0)
