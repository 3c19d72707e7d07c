"""Answer/query-phase deterministic skeletons (SURVEY S7, U5, W3+U6).

The reference's query phase is LLM-driven, but three of its contracts are
pure deterministic column logic, preserved here exactly:

* :func:`serialized_answer` — the answer-JSON sink shape
  (``src/utils/serialization.py:71-108``): ``reasoning_trace`` truncated to
  1000 chars + ``"..."`` **only when longer** (:87-89), validation summary
  flattened.
* :func:`checkpoint_b` — Checkpoint-B answer-validation gates
  (``src/agents/validation.py:400-517``): the ``'null'``-string / empty /
  None normalization of ``revised_answer`` (:484-487), the float-parse
  fallback of ``verdict_score`` to 1.0 (:490-498), and the error-path
  defaults ``(is_grounded=True, revised=None, verdict_score=0.5,
  notes='Validation error: …')`` (:508-517).
* :func:`enumerate_context` / :func:`assemble_context` — the retrieval
  context build (``src/agents/orchestrator.py:232-240``): hits numbered
  ``[1]..[n]`` in arrival order, per-chunk 800-char truncation, the exact
  ``[i] (TYPE | file p.N | score=X.XX)\\nSummary: …\\nContent: …`` layout,
  parts joined with ``\\n\\n---\\n\\n`` (:241).

All native column expressions — no UDFs; the per-query hit set is tiny
(top-k), so the enumeration window is a k-row operation regardless of
corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ANSWER_TRACE_TRUNC = 1000  # serialization.py:87-89
CONTEXT_CHUNK_TRUNC = 800  # orchestrator.py:240
CONTEXT_SEP = "\n\n---\n\n"  # orchestrator.py:241
ERROR_VERDICT = 0.5  # validation.py:512


def _trunc_suffix(col, limit: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(c) > limit, F.concat(F.substring(c, 1, limit), F.lit("..."))
    ).otherwise(c)


def serialized_answer(answers: DataFrame) -> DataFrame:
    """S7: row-shape of save_answer (serialization.py:83-100), flattened.

    Expects columns: pdf_file, question, answer, reasoning_trace,
    answer_is_grounded, answer_verdict_score."""
    return answers.select(
        "pdf_file",
        "question",
        "answer",
        _trunc_suffix("reasoning_trace", ANSWER_TRACE_TRUNC).alias("reasoning_trace"),
        "answer_is_grounded",
        "answer_verdict_score",
    )


def checkpoint_b(results: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """U5: deterministic Checkpoint-B skeleton over raw validator outputs.

    Input columns (the model-output stand-ins):
      revised_answer_raw string — may be NULL, '', or the literal 'null'/'NULL'
      verdict_score_raw  string — may be NULL or unparseable
      is_grounded_raw    boolean — may be NULL (missing attribute)
      validator_notes_raw string — may be NULL (missing attribute → '')
      had_error          boolean — validation raised (error fallback path)
      error_msg          string  — exception text for the fallback notes
    """
    raw = F.col("revised_answer_raw")
    err = F.col("had_error")
    # validation.py:484-487 — truthy AND lower() != 'null'
    revised = F.when(
        raw.isNotNull() & (raw != "") & (F.lower(raw) != "null"), raw
    ).otherwise(F.lit(None).cast("string"))
    # validation.py:490-498 — float(score) with 1.0 on None/parse failure
    score = F.coalesce(
        F.col("verdict_score_raw").try_cast("double"), F.lit(1.0)
    )
    err_msg = (
        F.coalesce("error_msg", F.lit(""))
        if "error_msg" in results.columns
        else F.lit("")
    )
    return results.select(
        F.col(id_col),
        F.when(err, F.lit(True))
        .otherwise(F.coalesce(F.col("is_grounded_raw"), F.lit(True)))
        .alias("is_grounded"),
        F.when(err, F.lit(None).cast("string")).otherwise(revised).alias(
            "revised_answer"
        ),
        F.when(err, F.lit(ERROR_VERDICT)).otherwise(score).alias("verdict_score"),
        F.when(err, F.concat(F.lit("Validation error: "), err_msg))
        .otherwise(F.coalesce("validator_notes_raw", F.lit("")))
        .alias("validator_notes"),
    )


def query_stats(results: DataFrame, id_col: str = "query_id") -> DataFrame:
    """A5: the LangGraph stats record, composed exactly as the reference's
    graph nodes fill it (``src/core/langgraph_pipeline.py``):

    * ``retrieved_count`` = len(hits)                 (:545, _retrieve)
    * ``answer_length``   = len(raw answer)           (:569, _generate)
    * ``is_grounded``     = validation verdict        (:605, _validate)
    * ``hallucination_count`` = len(hallucinations)   (:606, _validate)
    * ``was_revised``     — the revise node (:295) is reached iff
      ``needs_revision = not is_grounded and revised_answer is not None``
      (:604), but the node sets ``was_revised=True`` only on *truthiness*
      of the revised text (:292-300) — a reachable-but-empty
      ``revised_answer == ''`` leaves the ``stats.get('was_revised',
      False)`` default (:351,723).  Hence the column form:
      ``(NOT is_grounded) AND revised_answer IS NOT NULL AND
      length(revised_answer) > 0``.  (Inputs composed through
      :func:`checkpoint_b` never carry '' — it normalizes ''/'null' to
      NULL — but query_stats must match the reference for raw inputs too.)

    Input columns: ``id_col``, retrieved_count int, answer string,
    is_grounded boolean, hallucinations array<string>, revised_answer string
    (the Checkpoint-B outputs — compose with :func:`checkpoint_b`).
    """
    return results.select(
        F.col(id_col),
        F.col("retrieved_count").cast("long").alias("retrieved_count"),
        F.length(F.coalesce(F.col("answer"), F.lit(""))).cast("long").alias(
            "answer_length"
        ),
        F.col("is_grounded"),
        F.coalesce(F.size("hallucinations"), F.lit(0)).cast("long").alias(
            "hallucination_count"
        ),
        (
            ~F.col("is_grounded")
            & F.col("revised_answer").isNotNull()
            & (F.length("revised_answer") > 0)
        ).alias("was_revised"),
    )


def enumerate_context(ranked_hits: DataFrame) -> DataFrame:
    """W3+U6: per-hit numbered context parts (orchestrator.py:232-240).

    Expects columns: rank (int, 1-based arrival order), doc_id, chunk_type,
    source_file, page_num (int), score (double), intuition_summary, text.
    """
    part = F.concat(
        F.lit("["),
        F.col("rank").cast("string"),
        F.lit("] ("),
        F.upper("chunk_type"),
        F.lit(" | "),
        F.col("source_file"),
        F.lit(" p."),
        F.col("page_num").cast("string"),
        F.lit(" | score="),
        F.format_string("%.2f", F.col("score")),
        F.lit(")\nSummary: "),
        F.col("intuition_summary"),
        F.lit("\nContent: "),
        F.substring(F.col("text"), 1, CONTEXT_CHUNK_TRUNC),
    )
    return ranked_hits.select("rank", "doc_id", part.alias("part"))


def assemble_context(parts: DataFrame) -> DataFrame:
    """Join the numbered parts with the reference separator, in rank order
    (array_sort on (rank, part) structs — deterministic under any
    partitioning, unlike bare collect_list)."""
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("rank"), F.col("part")))),
        lambda x: x["part"],
    )
    return parts.agg(
        F.count("*").alias("n_hits"),
        F.array_join(ordered, CONTEXT_SEP).alias("context"),
    )
