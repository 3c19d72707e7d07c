"""Kernel unit tests on hand-built micro-batches (the reference's
LangGraph-node test style, SURVEY.md §5, applied to kernels)."""

from __future__ import annotations

import pandas as pd
import pytest

from sparkx import oracle as O
from sparkx.kernels.blocks import parse_blocks
from sparkx.kernels.extract import extract_batch, process_blocks, validate_blocks

TS = pd.Timestamp("2026-01-01")


def turns(*texts: str) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": ["c0"] * len(texts),
            "turn_idx": pd.array(range(len(texts)), dtype="int32"),
            "role": ["user"] * len(texts),
            "tool": [""] * len(texts),
            "ts": [TS] * len(texts),
            "text": list(texts),
        }
    )


# ── markdown rendering: byte-identical to parser.py:140-156 ────────────────
class TestMarkdown:
    def test_basic(self):
        b = parse_blocks(turns("a\tb\n1\t2"))
        md = b[b.chunk_type == "table"].iloc[0].raw_content
        assert md == "| a | b |\n| --- | --- |\n| 1 | 2 |"
        assert md == O.to_markdown([["a", "b"], ["1", "2"]])

    def test_empty_cells_none_semantics(self):
        # str(c or "") → empty stays empty
        b = parse_blocks(turns("a\t\tb\n\t2\t"))
        md = b[b.chunk_type == "table"].iloc[0].raw_content
        assert md == O.to_markdown([["a", None, "b"], [None, "2", None]])
        assert md == "| a |  | b |\n| --- | --- | --- |\n|  | 2 |  |"

    def test_ragged_rows_not_padded(self):
        # rows shorter/longer than the header are rendered as-is, never padded
        # to header width (parser.py:153-155). NB: a 1-cell row has no TAB and
        # is not a table line under the TSV grammar — minimum 2 cells.
        b = parse_blocks(turns("a\tb\tc\nx\ty\n1\t2\t3\t4"))
        md = b[b.chunk_type == "table"].iloc[0].raw_content
        assert md == O.to_markdown([["a", "b", "c"], ["x", "y"], ["1", "2", "3", "4"]])
        assert md.splitlines()[1] == "| --- | --- | --- |"  # sized to row 0
        assert md.splitlines()[2] == "| x | y |"
        assert md.splitlines()[3] == "| 1 | 2 | 3 | 4 |"

    def test_glyph_cells_verbatim(self):
        b = parse_blocks(turns("h1\th2\n(cid:1234)\t(cid:9)"))
        md = b[b.chunk_type == "table"].iloc[0].raw_content
        assert "| (cid:1234) | (cid:9) |" in md

    def test_single_column(self):
        # a single-cell line has no TAB → not a table; force 1-col via trailing tab? No:
        # one-column tables require a tab; "x\t" parses as 2 cells ["x",""].
        b = parse_blocks(turns("x\t\ny\t"))
        md = b[b.chunk_type == "table"].iloc[0].raw_content
        assert md == O.to_markdown([["x", ""], ["y", ""]])


# ── gates (parser.py:31-32,55,81-83,125) ────────────────────────────────────
class TestGates:
    def test_min_table_rows(self):
        b = parse_blocks(turns("only\tone\trow"))
        t = b[b.chunk_type == "table"].iloc[0]
        assert t.parse_status == "dropped_table_small"

    def test_text_len_boundary(self):
        at = "x" * 40
        below = "x" * 39
        b = parse_blocks(turns(at, below, "  " + at + "  "))
        texts = b[b.chunk_type == "text"].sort_values("turn_idx")
        assert texts.iloc[0].parse_status == ""  # exactly 40 passes (>=)
        assert texts.iloc[1].parse_status == "dropped_short"
        assert texts.iloc[2].parse_status == ""  # strip() then compare

    def test_figure_dim_boundary(self):
        b = parse_blocks(
            turns(
                "FIG;mode=RGB;w=80;h=80;caption=ok",
                "FIG;mode=RGB;w=79;h=500;caption=no",
                "FIG;mode=RGB;w=500;h=79;caption=no",
            )
        )
        f = b[b.chunk_type == "figure"].sort_values("turn_idx")
        assert list(f.parse_status) == ["", "dropped_figure_small", "dropped_figure_small"]

    def test_empty_and_none_text(self):
        df = turns("")
        df.loc[0, "text"] = None
        b = parse_blocks(df)
        assert len(b) == 1
        assert b.iloc[0].chunk_type == "text"
        assert b.iloc[0].parse_status == "dropped_short"


# ── multi-block emission order: tables, figures, text (parser.py:49-133) ───
class TestEmissionOrder:
    def test_order_and_indices(self):
        text = "\n".join(
            [
                "intro line that is long enough to survive the minimum text gate",
                "a\tb",
                "1\t2",
                "FIG;mode=RGB;w=100;h=100;caption=first",
                "middle prose",
                "c\td",
                "3\t4",
                "FIG;mode=RGB;w=200;h=200;caption=second",
                "closing line",
            ]
        )
        b = parse_blocks(turns(text))
        assert list(b.chunk_type) == ["table", "table", "figure", "figure", "text"]
        assert list(b.block_rank) == [0, 0, 1, 1, 2]
        assert list(b.block_idx) == [0, 1, 0, 1, 0]
        # tables in order of appearance
        assert b.iloc[0].raw_content.startswith("| a | b |")
        assert b.iloc[1].raw_content.startswith("| c | d |")
        assert b.iloc[2].fig_caption == "first"
        # remainder = non-consumed lines joined
        assert b.iloc[4].raw_content == (
            "intro line that is long enough to survive the minimum text gate"
            "\nmiddle prose\nclosing line"
        )

    def test_adjacent_tables_merge_into_one_region(self):
        # contiguous TSV lines form ONE region (maximal run)
        b = parse_blocks(turns("a\tb\n1\t2\nc\td\n3\t4"))
        assert (b.chunk_type == "table").sum() == 1


# ── fastpath processing (crewai_pipeline.py:149-160) ────────────────────────
class TestFastpath:
    def test_truncation_2000(self):
        long = "y" * 3000
        out = extract_batch(turns(long), mode="fastpath")
        row = out[out.chunk_type == "text"].iloc[0]
        assert len(row.structured_text) == 2000
        assert row.structured_text == long[:2000]
        assert row.confidence == 0.8
        assert row.agent_notes == "Extracted via direct MLX agents (no crew orchestration)"
        assert row.intuition_summary == ""
        assert row.key_concepts == []

    def test_figure_stable_repr(self):
        out = extract_batch(turns("FIG;mode=RGB;w=611;h=278;caption=x"), mode="fastpath")
        f = out[out.chunk_type == "figure"].iloc[0]
        # golden fixture prefix (output/21_77_chunks.json, address excluded)
        assert f.structured_text == "<PIL.Image.Image image mode=RGB size=611x278"


# ── agentic processing: defaults, schema annotation, OCR, retry ─────────────
class TestAgentic:
    def test_table_schema_annotation(self):
        out = extract_batch(turns("h1\th2\tномер\nv1\t\tv3\nw1\tw2\tw3"), mode="agentic")
        t = out[out.chunk_type == "table"].iloc[0]
        assert t.structured_text.endswith(
            '\n<!-- schema: {"columns": ["h1", "h2", "номер"], "row_count": 2, "units": {}} -->'
        )
        assert t.confidence == 0.7

    def test_ocr_fallback(self):
        out = extract_batch(
            turns("FIG;mode=OCR;w=100;h=100;caption=scanned text body"), mode="agentic"
        )
        f = out[out.chunk_type == "figure"].iloc[0]
        assert f.structured_text == "scanned text body"
        assert f.confidence == 0.3
        assert f.intuition_summary == "OCR fallback."
        assert f.agent_notes == "Vision model not loaded."
        assert bool(f.retried) is True  # 0.3 < 0.5 → retry contract fired

    def test_lowconf_retry_flag(self):
        prose = "this prose is certainly long enough to pass the gate [[LOWCONF]]"
        out = extract_batch(turns(prose), mode="agentic")
        row = out[out.chunk_type == "text"].iloc[0]
        assert row.confidence == 0.4
        assert bool(row.retried) is True
        normal = extract_batch(turns(prose.replace(" [[LOWCONF]]", " without marker")),
                               mode="agentic")
        assert bool(normal[normal.chunk_type == "text"].iloc[0].retried) is False


# ── Checkpoint-A contract (pipeline.py:264-312, validation.py:272-302) ──────
class TestValidation:
    def _processed(self, structured: str, raw: str, conf: float) -> pd.DataFrame:
        b = parse_blocks(turns(raw))
        b = process_blocks(b, mode="fastpath")
        b = b[b.chunk_type == "text"].copy()
        b["structured_text"] = structured
        b["confidence"] = conf
        return b

    def test_corrected_substitution(self):
        raw = "the original source text of this block is long enough to pass gates"
        b = self._processed("THIS WAS CORRUPTED BY A HALLUCINATING MODEL", raw, 0.8)
        v = validate_blocks(b, validate=True).iloc[0]
        assert v.status == "corrected"
        assert bool(v.was_corrected) is True
        assert v.structured_text == raw  # rebuilt from source
        assert v.confidence == v.verdict_score == 0.5
        assert v.agent_notes.startswith("[CHECKPOINT-A CORRECTED] ")

    def test_discard_below_floor(self):
        raw = "another source text comfortably above the forty character minimum"
        b = self._processed(raw, raw, 0.2)  # valid but conf < 0.25
        v = validate_blocks(b, validate=True).iloc[0]
        assert v.status == "discarded"

    def test_accept_at_floor(self):
        raw = "another source text comfortably above the forty character minimum"
        b = self._processed(raw, raw, 0.25)
        v = validate_blocks(b, validate=True).iloc[0]
        assert v.status == "accepted"
        assert bool(v.is_valid) is True and v.verdict_score == 1.0

    def test_validate_false_floor_only(self):
        raw = "another source text comfortably above the forty character minimum"
        b = self._processed("NOT CONTAINED ANYWHERE", raw, 0.24)
        v = validate_blocks(b, validate=False).iloc[0]
        assert v.status == "discarded"  # floor applies, containment doesn't
        b2 = self._processed("NOT CONTAINED ANYWHERE", raw, 0.26)
        v2 = validate_blocks(b2, validate=False).iloc[0]
        assert v2.status == "accepted"


# ── property-style: kernel == oracle on randomized family soup ──────────────
@pytest.mark.parametrize("mode", ["fastpath", "agentic"])
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_kernel_matches_oracle_random(mode, seed):
    from sparkx.synth import synth_pandas

    t = synth_pandas(n_convs=12, turns_per_conv=9, seed=seed)
    k = extract_batch(t, mode=mode, validate=True)
    k = k.sort_values(["conv_id", "turn_idx", "block_rank", "block_idx"]).reset_index(drop=True)
    ob = O.run_oracle(t.to_dict("records"), mode=mode, validate=True)
    assert len(k) == len(ob)
    for i, b in enumerate(ob):
        row = k.iloc[i]
        assert row.structured_text == b.structured_text, (i, b.chunk_type)
        assert row.status == b.status
        assert row.confidence == b.confidence
        assert row.agent_notes == b.agent_notes
        assert bool(row.retried) == b.retried
