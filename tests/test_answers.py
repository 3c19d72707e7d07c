"""Answer-phase skeleton contracts (S7, U5, W3+U6, P11) — each pinned to the
reference's deterministic behavior (serialization.py:71-108,
validation.py:484-517, orchestrator.py:232-241, extraction.py:93-98 +
base.py:43)."""

from __future__ import annotations

import pandas as pd

from sparkx.ops.answers import (
    ANSWER_TRACE_TRUNC,
    CONTEXT_SEP,
    assemble_context,
    checkpoint_b,
    enumerate_context,
    serialized_answer,
)
from sparkx.ops.prompts import RETRY_SUFFIX, TABLE_PREFIX, TEXT_PREFIX, build_prompts


def test_answer_trace_truncation_boundary(spark):
    """serialization.py:87-89 — '...' appended ONLY when len > 1000; exactly
    1000 passes through untouched."""
    rows = [
        ("a.pdf", "q1", "ans", "x" * 999, True, 0.9),
        ("b.pdf", "q2", "ans", "x" * 1000, True, 0.9),
        ("c.pdf", "q3", "ans", "x" * 1001, False, 0.5),
    ]
    df = spark.createDataFrame(
        rows,
        "pdf_file string, question string, answer string, reasoning_trace string,"
        " answer_is_grounded boolean, answer_verdict_score double",
    )
    got = {r.question: r.reasoning_trace for r in serialized_answer(df).collect()}
    assert got["q1"] == "x" * 999
    assert got["q2"] == "x" * 1000
    assert got["q3"] == "x" * ANSWER_TRACE_TRUNC + "..."
    # python-reference replication of the exact expression
    for t in ("x" * 999, "x" * 1000, "x" * 1001):
        want = t[:1000] + "..." if len(t) > 1000 else t
        key = {999: "q1", 1000: "q2", 1001: "q3"}[len(t)]
        assert got[key] == want


def test_checkpoint_b_null_string_and_fallbacks(spark):
    """validation.py:484-487 ('null' normalization), :490-498 (float parse →
    1.0), :508-517 (error fallback verdict 0.5, grounded True)."""
    rows = [
        # (id, revised_raw, score_raw, grounded_raw, notes_raw, had_error)
        (0, "null", "0.7", True, None, False),
        (1, "NULL", None, None, None, False),
        (2, "", "bogus", False, "n2", False),
        (3, None, "0.25", True, None, False),
        (4, "keep me", "1.5", False, None, False),
        (5, "would keep", "0.9", False, "n5", True),
        # ' null ' is truthy and lower() != 'null' (the reference does NOT
        # strip before comparing, validation.py:486) → KEPT verbatim
        (6, " null ", "0.1", True, None, False),
        (7, "Null", "0.2", True, None, False),  # mixed case IS normalized
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, revised_answer_raw string, verdict_score_raw string,"
        " is_grounded_raw boolean, validator_notes_raw string, had_error boolean",
    )
    got = {r.doc_id: r for r in checkpoint_b(df).collect()}
    assert got[0].revised_answer is None and got[0].verdict_score == 0.7
    assert got[1].revised_answer is None and got[1].verdict_score == 1.0
    assert got[1].is_grounded is True  # missing attr defaults True
    assert got[2].revised_answer is None and got[2].verdict_score == 1.0
    assert got[2].is_grounded is False and got[2].validator_notes == "n2"
    assert got[3].revised_answer is None and got[3].verdict_score == 0.25
    assert got[4].revised_answer == "keep me" and got[4].verdict_score == 1.5
    # error fallback path
    assert got[5].is_grounded is True
    assert got[5].revised_answer is None
    assert got[5].verdict_score == 0.5
    assert got[5].validator_notes.startswith("Validation error: ")
    assert got[6].revised_answer == " null "  # unstripped comparison
    assert got[7].revised_answer is None


def test_save_answers_json_roundtrip(spark, tmp_path):
    """S7 writer: JSON-lines export carries the truncated trace."""
    from sparkx.sinks import save_answers_json

    rows = [("a.pdf", "q", "ans", "t" * 1500, True, 1.0)]
    df = spark.createDataFrame(
        rows,
        "pdf_file string, question string, answer string, reasoning_trace string,"
        " answer_is_grounded boolean, answer_verdict_score double",
    )
    out = str(tmp_path / "answers_json")
    save_answers_json(df, out)
    back = spark.read.json(out).collect()
    assert len(back) == 1
    assert back[0].reasoning_trace == "t" * 1000 + "..."
    assert back[0].pdf_file == "a.pdf"


def test_context_enumeration_matches_reference_format(spark):
    """orchestrator.py:232-241 byte-for-byte: the part layout, 800-char
    truncation, and the '\\n\\n---\\n\\n' join in rank order."""
    rows = [
        (2, 11, "table", "f.pdf", 3, 0.5, "sum2", "y" * 900),
        (1, 10, "text", "e.pdf", 2, 0.875, "sum1", "short content"),
    ]
    df = spark.createDataFrame(
        rows,
        "rank int, doc_id long, chunk_type string, source_file string,"
        " page_num int, score double, intuition_summary string, text string",
    )
    parts = {r.rank: r.part for r in enumerate_context(df).collect()}

    def ref_part(i, m, score, text):  # literal reference expression
        return (
            f"[{i}] ({m['chunk_type'].upper()} | {m['source_file']} p.{m['page_num']} | "
            f"score={score:.2f})\n"
            f"Summary: {m['intuition_summary']}\nContent: {text[:800]}"
        )

    assert parts[1] == ref_part(
        1,
        {"chunk_type": "text", "source_file": "e.pdf", "page_num": 2,
         "intuition_summary": "sum1"},
        0.875,
        "short content",
    )
    assert parts[2] == ref_part(
        2,
        {"chunk_type": "table", "source_file": "f.pdf", "page_num": 3,
         "intuition_summary": "sum2"},
        0.5,
        "y" * 900,
    )
    assert parts[2].endswith("y" * 800) and "y" * 801 not in parts[2]

    row = assemble_context(enumerate_context(df)).collect()[0]
    assert row.n_hits == 2
    assert row.context == parts[1] + CONTEXT_SEP + parts[2]  # rank order


def test_prompt_build_matches_reference(spark):
    """extraction.py:93-98/:159-164: prompt = PREFIX + raw + (suffix iff
    retried); figures excluded (vision prompts are not text-templated)."""
    rows = [
        ("c0", 0, "text", 0, "hello passage", False),
        ("c0", 1, "table", 0, "| a |\n| --- |", True),
        ("c0", 2, "figure", 0, "FIGLINE", False),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, chunk_type string, block_idx int,"
        " raw_content string, retried boolean",
    )
    got = {(r.turn_idx): r.prompt for r in build_prompts(df).collect()}
    assert got[0] == TEXT_PREFIX + "hello passage"
    assert got[1] == TABLE_PREFIX + "| a |\n| --- |" + RETRY_SUFFIX
    assert 2 not in got
    # the reference's literal retry suffix (base.py:43)
    assert RETRY_SUFFIX == (
        "\n[RETRY] Low confidence. Be conservative; flag unknowns explicitly."
    )


def test_query_stats_reference_semantics(spark):
    """A5 (langgraph_pipeline.py:545,569,605-606,295,723): answer_length =
    len(answer), hallucination_count = len(list), was_revised fires ONLY via
    the revise node — (NOT is_grounded) AND revised_answer IS NOT NULL — and
    the node itself flags only TRUTHY revised text (:292-300), so a
    reachable-but-empty '' revision still reads was_revised=False;
    else the stats.get('was_revised', False) default."""
    from sparkx.ops.answers import query_stats

    rows = [
        # grounded, halls listed anyway, revision present → NOT revised
        (1, 4, "hello", True, ["x"], "rev"),
        # ungrounded + revision → revised (the revise-node path)
        (2, 2, None, False, None, "rev"),
        # ungrounded, no revision → warning-prefix path, was_revised False
        (3, 0, "answer text", False, ["a", "b"], None),
        # ADVERSARIAL: ungrounded + EMPTY-STRING revision — the revise node
        # runs (is not None) but `if revised_answer:` is falsy, so the
        # reference leaves the default False.  Raw inputs bypassing
        # checkpoint_b (which normalizes '' to NULL) must match.
        (4, 1, "kept answer", False, [], ""),
    ]
    df = spark.createDataFrame(
        rows,
        "query_id long, retrieved_count int, answer string, is_grounded boolean,"
        " hallucinations array<string>, revised_answer string",
    )
    got = {
        r.query_id: (
            r.retrieved_count, r.answer_length, r.is_grounded,
            r.hallucination_count, r.was_revised,
        )
        for r in query_stats(df).collect()
    }
    assert got[1] == (4, 5, True, 1, False)
    assert got[2] == (2, 0, False, 0, True)
    assert got[3] == (0, 11, False, 2, False)
    assert got[4] == (1, 11, False, 0, False)
