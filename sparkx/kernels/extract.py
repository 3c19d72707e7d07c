"""Per-type block processing + retry + Checkpoint-A validation kernel.

Deterministic re-expression of the reference's extraction agents per
SURVEY.md §7.3: the LLM bodies are replaced by deterministic kernels whose
*contracts* — inputs, outputs, gates, fallbacks, truncations, defaults —
match the reference exactly.

Two modes:

* ``fastpath`` — the reference's deterministic crew fast path
  (``src/core/crewai_pipeline.py:144-160``): every surviving block becomes
  ``structured_text = str(raw_content)[:2000]``, ``confidence = 0.8``,
  ``agent_notes = "Extracted via direct MLX agents (no crew orchestration)"``,
  empty summary/concepts.  This is the golden mode matching the reference's
  own fixture ``output/21_77_chunks.json``.
* ``agentic`` — the parse-failure default skeleton of the three extraction
  agents (``src/agents/extraction.py``): text conf 0.7 (:125), table conf 0.7
  (:192) + schema annotation (:184) with exactly-computed schema stats
  (SURVEY A3: ``columns=row0``, ``row_count=n-1``), figure conf 0.6 (:278),
  OCR fallback conf 0.3 / ``intuition_summary="OCR fallback."`` /
  ``agent_notes="Vision model not loaded."`` (:282-306); plus the retry
  contract (``src/agents/base.py:42,81-96``): a first-pass confidence below
  0.5 triggers exactly one retry whose result wins (with a deterministic
  kernel the rerun is value-identical; the ``retried`` flag records it).

Figure ``structured_text`` is the stable PIL repr prefix
``<PIL.Image.Image image mode=RGB size={w}x{h}`` — the reference's trailing
memory address is documented nondeterminism (SURVEY §3.2) and excluded from
the equality invariant.  All figure modes coerce to RGB (parser.py:72-79).

Checkpoint-A (``src/agents/validation.py:272-302`` + accept contract
``src/core/pipeline.py:264-312``): a deterministic containment audit replaces
the vision-model verdict.  ``is_valid`` ⇔ the extracted core text is contained
in ``str(raw_content)[:2000]``; invalid rows always get a corrected rebuild
with ``confidence = verdict_score`` and notes prefixed
``"[CHECKPOINT-A CORRECTED] "`` (validation.py:286-295).  Accept iff
``is_valid and confidence >= 0.25``; corrected substitution; else discard.
With ``validate=False`` accept-all above the 0.25 floor (pipeline.py:309-312).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from sparkx.kernels.blocks import BLOCK_COLUMNS, parse_blocks

TRUNC_STRUCTURED = 2000  # crewai_pipeline.py:155, extraction.py:122
TRUNC_OCR = 1000  # extraction.py:275
CONFIDENCE_THRESHOLD = 0.5  # base.py:42
ACCEPT_FLOOR = 0.25  # pipeline.py:292,306,311
FASTPATH_CONF = 0.8  # crewai_pipeline.py:157
FASTPATH_NOTES = "Extracted via direct MLX agents (no crew orchestration)"  # :158
TEXT_CONF = 0.7  # extraction.py:125
TABLE_CONF = 0.7  # extraction.py:192
VISION_CONF = 0.6  # extraction.py:278
OCR_CONF = 0.3  # extraction.py:304
LOWCONF_MARKER = "[[LOWCONF]]"  # synthetic hook standing in for model uncertainty
LOWCONF_CONF = 0.4
CORRECTED_PREFIX = "[CHECKPOINT-A CORRECTED] "  # validation.py:295

OUTPUT_COLUMNS = [
    "conv_id", "turn_idx", "role", "tool", "ts",
    "chunk_type", "block_rank", "block_idx", "raw_content",
    "structured_text", "intuition_summary", "key_concepts",
    "confidence", "agent_notes", "retried",
    "is_valid", "issues", "verdict_score", "validator_notes",
    "was_corrected", "status",
]


_JSON_CTRL_SHORT = {"\b": "\\b", "\f": "\\f", "\r": "\\r", "\t": "\\t", "\n": "\\n"}


def _json_ctrl_escape(m) -> str:
    c = m.group()
    return _JSON_CTRL_SHORT.get(c, "\\u%04x" % ord(c))


def _json_str_array(tsv_header: pd.Series) -> pd.Series:
    """``json.dumps(cells, ensure_ascii=False)`` for TSV-encoded cell lists,
    built with vectorized string ops.  Control chars < 0x20 get json.dumps'
    escapes (short forms for \\b \\f \\r; \\u00XX otherwise) — found by the
    hypothesis fuzz gate; cells can carry \\r or other control bytes even
    though \\t (delimiter) and \\n (line split) cannot."""
    esc = (
        tsv_header.astype(object)
        .str.replace("\\", "\\\\", regex=False)
        .str.replace('"', '\\"', regex=False)
        .str.replace("\t", '", "', regex=False)  # delimiter BEFORE ctrl escape
        .str.replace(r"[\x00-\x1f]", _json_ctrl_escape, regex=True)
    )
    return '["' + esc + '"]'


def _figure_repr(w: pd.Series, h: pd.Series) -> pd.Series:
    return (
        "<PIL.Image.Image image mode=RGB size="
        + w.astype("int64").astype(str)
        + "x"
        + h.astype("int64").astype(str)
    )


def process_blocks(blocks: pd.DataFrame, mode: str = "fastpath") -> pd.DataFrame:
    """Attach structured_text/summary/concepts/confidence/notes/retried to
    parsed block rows.  Dropped blocks get empty processing fields."""
    b = blocks.copy()
    n = len(b)
    alive = b["parse_status"].eq("")
    is_text = b["chunk_type"].eq("text")
    is_table = b["chunk_type"].eq("table")
    is_fig = b["chunk_type"].eq("figure")

    raw = b["raw_content"].fillna("").astype(object)
    trunc = raw.str.slice(0, TRUNC_STRUCTURED)

    structured = pd.Series([""] * n, dtype=object, index=b.index)
    summary = pd.Series([""] * n, dtype=object, index=b.index)
    concepts = pd.Series([[] for _ in range(n)], dtype=object, index=b.index)
    notes = pd.Series([""] * n, dtype=object, index=b.index)
    conf = pd.Series(np.zeros(n), index=b.index)

    fig_repr = _figure_repr(
        pd.to_numeric(b["fig_w"], errors="coerce").fillna(-1),
        pd.to_numeric(b["fig_h"], errors="coerce").fillna(-1),
    )

    if mode == "fastpath":
        # str(raw_content)[:2000] for text/table; PIL repr for figures
        structured = trunc.where(~is_fig, fig_repr)
        conf = pd.Series(np.full(n, FASTPATH_CONF), index=b.index)
        notes = pd.Series([FASTPATH_NOTES] * n, dtype=object, index=b.index)
        retried = pd.Series(np.zeros(n, dtype=bool), index=b.index)
    elif mode == "agentic":
        is_ocr = is_fig & b["fig_mode"].fillna("RGB").ne("RGB")
        # schema annotation (P10/A3): appended AFTER truncation (extraction.py:184)
        header = b["header_line"].fillna("").astype(object)
        n_rows = pd.to_numeric(b["n_rows"], errors="coerce").fillna(0).astype("int64")
        annotation = (
            '\n<!-- schema: {"columns": '
            + _json_str_array(header)
            + ', "row_count": '
            + (n_rows - 1).clip(lower=0).astype(str)
            + ', "units": {}} -->'
        )
        ocr_text = b["fig_caption"].fillna("").astype(object).str.slice(0, TRUNC_OCR)
        structured = trunc.copy()
        structured = structured.where(~is_table, trunc + annotation)
        structured = structured.where(~is_fig, fig_repr)
        structured = structured.where(~is_ocr, ocr_text)

        lowconf = is_text & raw.str.contains(LOWCONF_MARKER, regex=False)
        conf = pd.Series(
            np.select(
                [is_ocr.to_numpy(), lowconf.to_numpy(), is_text.to_numpy(),
                 is_table.to_numpy(), is_fig.to_numpy()],
                [OCR_CONF, LOWCONF_CONF, TEXT_CONF, TABLE_CONF, VISION_CONF],
                default=0.0,
            ),
            index=b.index,
        )
        summary = summary.where(~is_ocr, "OCR fallback.")  # extraction.py:304
        notes = notes.where(
            ~(is_fig & ~is_ocr),
            "figure_type=other | " + b["fig_caption"].fillna("").astype(object),
        )  # agent_notes shape extraction.py:279
        notes = notes.where(~is_ocr, "Vision model not loaded.")  # extraction.py:305
        # retry contract (base.py:81-96): one retry when pass-1 conf < 0.5;
        # the deterministic kernel's pass 2 is value-identical, flag records it.
        retried = (conf < CONFIDENCE_THRESHOLD) & alive
    else:
        raise ValueError(f"unknown mode: {mode}")

    # dropped blocks carry no processing output
    dead = ~alive
    structured = structured.where(~dead, "")
    summary = summary.where(~dead, "")
    notes = notes.where(~dead, "")
    conf = conf.where(~dead, 0.0)
    retried = retried & alive

    b["structured_text"] = structured
    b["intuition_summary"] = summary
    b["key_concepts"] = concepts
    b["confidence"] = conf.astype(float)
    b["agent_notes"] = notes
    b["retried"] = retried.astype(bool)
    return b


def validate_blocks(b: pd.DataFrame, validate: bool = True) -> pd.DataFrame:
    """Checkpoint-A audit + accept/correct/discard decision (adds status +
    validation columns).  Expects `process_blocks` output."""
    n = len(b)
    alive = b["parse_status"].eq("")
    is_fig = b["chunk_type"].eq("figure")

    if not validate:
        # pipeline.py:309-312 — accept all above the floor, no validation struct
        b["is_valid"] = pd.Series([None] * n, dtype=object)
        b["issues"] = pd.Series([None] * n, dtype=object)
        b["verdict_score"] = pd.Series([None] * n, dtype=object)
        b["validator_notes"] = pd.Series([None] * n, dtype=object)
        b["was_corrected"] = np.zeros(n, dtype=bool)
        accept = alive & (b["confidence"] >= ACCEPT_FLOOR)
        b["status"] = np.where(
            accept, "accepted", np.where(alive, "discarded", b["parse_status"])
        )
        return b

    raw_trunc = b["raw_content"].fillna("").astype(object).str.slice(0, TRUNC_STRUCTURED)
    # core text = structured_text minus the table schema annotation
    core = (
        b["structured_text"]
        .fillna("")
        .astype(object)
        .str.replace(r"\n<!-- schema: \{.*\} -->$", "", regex=True)
    )
    # containment audit: fast vectorized equality covers the by-construction
    # case; the rare non-equal rows fall back to a substring check on just
    # that slice (batch-level, not per-Spark-row).
    eq = core.eq(raw_trunc) | core.eq(
        b["fig_caption"].fillna("").astype(object).str.slice(0, TRUNC_OCR)
    )
    is_valid = eq | is_fig
    hard = ~is_valid & alive
    if hard.any():
        sub = pd.Series(
            np.fromiter(
                (c in r for c, r in zip(core[hard], raw_trunc[hard])),
                dtype=bool,
                count=int(hard.sum()),
            ),
            index=b.index[hard],
        )
        is_valid = is_valid.mask(hard, sub)

    verdict = is_valid.map({True: 1.0, False: 0.5})
    issues = pd.Series(
        np.where(is_valid, None, "structured_text not contained in source"),
        index=b.index,
        dtype=object,
    ).map(lambda x: [] if x is None else [x])
    vnotes = pd.Series(np.where(is_valid, "", "containment-failure"),
                       index=b.index, dtype=object)

    # corrected rebuild (validation.py:286-295): corrected is ALWAYS built
    # when invalid; structured_text falls back to the source text, confidence
    # becomes verdict_score, notes get the corrected prefix.
    corrected_needed = ~is_valid & alive
    b["structured_text"] = b["structured_text"].where(~corrected_needed, raw_trunc)
    b["confidence"] = b["confidence"].where(~corrected_needed, verdict)
    b["agent_notes"] = b["agent_notes"].where(
        ~corrected_needed, CORRECTED_PREFIX + vnotes
    )

    accept = alive & is_valid & (b["confidence"] >= ACCEPT_FLOOR)
    b["status"] = np.where(
        corrected_needed,
        "corrected",
        np.where(accept, "accepted", np.where(alive, "discarded", b["parse_status"])),
    )
    # dropped blocks are never validated (they don't reach Checkpoint A in the
    # reference, pipeline.py:259-298) → NULL validation struct
    dead = ~alive
    b["is_valid"] = is_valid.astype(object).where(~dead, None)
    b["issues"] = issues.where(~dead, None)
    b["verdict_score"] = verdict.astype(object).where(~dead, None)
    b["validator_notes"] = vnotes.where(~dead, None)
    b["was_corrected"] = corrected_needed.to_numpy(dtype=bool)
    return b


def extract_batch(
    turns: pd.DataFrame, mode: str = "fastpath", validate: bool = True
) -> pd.DataFrame:
    """Full kernel: turns batch → processed+validated block rows
    (OUTPUT_COLUMNS).  This is the single function `mapInPandas` wraps."""
    blocks = parse_blocks(turns)
    if len(blocks) == 0:
        out = pd.DataFrame(columns=OUTPUT_COLUMNS)
        return out
    b = process_blocks(blocks, mode=mode)
    b = validate_blocks(b, validate=validate)
    b["turn_idx"] = b["turn_idx"].astype("int32")
    b["block_rank"] = b["block_rank"].astype("int32")
    b["block_idx"] = b["block_idx"].astype("int32")
    return b[OUTPUT_COLUMNS]
