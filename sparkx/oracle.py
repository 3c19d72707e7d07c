"""Pure-Python reference oracle for the extraction semantics.

An *independent* re-implementation of the deterministic reference semantics
catalogued in SURVEY.md §2 (Det rows) and §7.2, written as naive per-turn
loops with zero pandas/Spark — the way the reference itself computes
(reference ``src/core/parser.py``, ``src/core/crewai_pipeline.py:144-160``,
``src/agents/base.py:81-96``, ``src/agents/validation.py:272-302``,
``src/core/pipeline.py:264-312``).  pytest asserts per-turn byte equality
between the Spark pipeline and this oracle (FIXTURES.md §5).

Keep this file boring and literal.  If the kernel and the oracle disagree,
the oracle wins unless the reference says otherwise.
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass, field

MIN_TABLE_ROWS = 2
MIN_TEXT_LEN = 40
MIN_FIGURE_DIM = 80
FIG_RE = re.compile(r"^FIG;mode=([A-Za-z0-9]+);w=(\d+);h=(\d+);caption=(.*)$")
LOWCONF_MARKER = "[[LOWCONF]]"
CROSSREF_KEYWORDS = ["see figure", "table", "section", "refer to"]  # crew_mlx_tools.py:381


@dataclass
class OracleBlock:
    conv_id: str
    turn_idx: int
    role: str
    tool: str
    ts: object
    chunk_type: str
    block_rank: int
    block_idx: int
    raw_content: str
    parse_status: str = ""
    fig_mode: str | None = None
    fig_w: int = -1
    fig_h: int = -1
    fig_caption: str | None = None
    header_cells: list[str] | None = None
    n_rows: int = -1
    # processing outputs
    structured_text: str = ""
    intuition_summary: str = ""
    key_concepts: list[str] = field(default_factory=list)
    confidence: float = 0.0
    agent_notes: str = ""
    retried: bool = False
    # validation outputs
    is_valid: bool | None = None
    issues: list[str] | None = None
    verdict_score: float | None = None
    validator_notes: str | None = None
    was_corrected: bool = False
    status: str = ""

    @property
    def chunk_id(self) -> str:
        key = f"{self.conv_id}|{self.turn_idx}|{self.chunk_type}|{self.block_idx}"
        return hashlib.sha256(key.encode("utf-8")).hexdigest()


def to_markdown(table: list[list]) -> str:
    """Byte-identical to PDFParser._to_markdown (parser.py:140-156)."""
    if not table:
        return ""
    header = "| " + " | ".join(str(c or "") for c in table[0]) + " |"
    sep = "| " + " | ".join("---" for _ in table[0]) + " |"
    rows = ["| " + " | ".join(str(c or "") for c in row) + " |" for row in table[1:]]
    return "\n".join([header, sep] + rows)


def parse_turn(conv_id, turn_idx, role, tool, ts, text) -> list[OracleBlock]:
    """One turn → ordered candidate blocks (tables, figures, text)."""
    text = text or ""
    lines = text.split("\n")
    tables: list[OracleBlock] = []
    figures: list[OracleBlock] = []
    remainder: list[str] = []

    cur_grid: list[list[str]] | None = None

    def flush_table():
        nonlocal cur_grid
        if cur_grid is None:
            return
        status = "" if len(cur_grid) >= MIN_TABLE_ROWS else "dropped_table_small"
        tables.append(
            OracleBlock(
                conv_id, turn_idx, role, tool, ts,
                "table", 0, len(tables), to_markdown(cur_grid),
                parse_status=status,
                header_cells=list(cur_grid[0]),
                n_rows=len(cur_grid),
            )
        )
        cur_grid = None

    for line in lines:
        m = FIG_RE.match(line)
        if m:
            flush_table()
            mode, w, h, caption = m.group(1), int(m.group(2)), int(m.group(3)), m.group(4)
            status = "" if (w >= MIN_FIGURE_DIM and h >= MIN_FIGURE_DIM) else "dropped_figure_small"
            figures.append(
                OracleBlock(
                    conv_id, turn_idx, role, tool, ts,
                    "figure", 1, len(figures), line,
                    parse_status=status,
                    fig_mode=mode, fig_w=w, fig_h=h, fig_caption=caption,
                )
            )
        elif "\t" in line:
            if cur_grid is None:
                cur_grid = []
            cur_grid.append(line.split("\t"))
        else:
            flush_table()
            remainder.append(line)
    flush_table()

    rem_text = "\n".join(remainder)
    text_status = "" if len(rem_text.strip()) >= MIN_TEXT_LEN else "dropped_short"
    text_block = OracleBlock(
        conv_id, turn_idx, role, tool, ts,
        "text", 2, 0, rem_text, parse_status=text_status,
    )
    return tables + figures + [text_block]


def process_block(b: OracleBlock, mode: str) -> OracleBlock:
    if b.parse_status:
        return b
    if mode == "fastpath":
        # crewai_pipeline.py:149-160
        if b.chunk_type == "figure":
            b.structured_text = f"<PIL.Image.Image image mode=RGB size={b.fig_w}x{b.fig_h}"
        else:
            b.structured_text = str(b.raw_content)[:2000]
        b.confidence = 0.8
        b.agent_notes = "Extracted via direct MLX agents (no crew orchestration)"
        return b
    if mode != "agentic":
        raise ValueError(mode)
    if b.chunk_type == "text":
        b.structured_text = str(b.raw_content)[:2000]
        b.confidence = 0.4 if LOWCONF_MARKER in b.raw_content else 0.7
    elif b.chunk_type == "table":
        schema = {"columns": b.header_cells, "row_count": b.n_rows - 1, "units": {}}
        b.structured_text = (
            str(b.raw_content)[:2000]
            + "\n<!-- schema: " + json.dumps(schema, ensure_ascii=False) + " -->"
        )
        b.confidence = 0.7
    elif b.chunk_type == "figure":
        if b.fig_mode != "RGB":
            # OCR fallback (extraction.py:282-306)
            b.structured_text = (b.fig_caption or "")[:1000]
            b.confidence = 0.3
            b.intuition_summary = "OCR fallback."
            b.agent_notes = "Vision model not loaded."
        else:
            b.structured_text = f"<PIL.Image.Image image mode=RGB size={b.fig_w}x{b.fig_h}"
            b.confidence = 0.6
            b.agent_notes = "figure_type=other | " + (b.fig_caption or "")
    # retry contract base.py:81-96 — deterministic rerun is value-identical
    if b.confidence < 0.5:
        b.retried = True
    return b


def validate_block(b: OracleBlock, validate: bool) -> OracleBlock:
    if b.parse_status:
        b.status = b.parse_status
        return b
    if not validate:
        b.status = "accepted" if b.confidence >= 0.25 else "discarded"
        return b
    core = re.sub(r"\n<!-- schema: \{.*\} -->$", "", b.structured_text)
    if b.chunk_type == "figure":
        valid = True
    else:
        valid = core in str(b.raw_content)[:2000]
    b.is_valid = valid
    b.verdict_score = 1.0 if valid else 0.5
    b.issues = [] if valid else ["structured_text not contained in source"]
    b.validator_notes = "" if valid else "containment-failure"
    if not valid:
        # corrected rebuild, validation.py:286-295 + pipeline.py:276-281
        b.structured_text = str(b.raw_content)[:2000]
        b.confidence = b.verdict_score
        b.agent_notes = "[CHECKPOINT-A CORRECTED] " + b.validator_notes
        b.was_corrected = True
        b.status = "corrected"
    elif b.confidence >= 0.25:
        b.status = "accepted"
    else:
        b.status = "discarded"
    return b


def run_oracle(turns, mode: str = "fastpath", validate: bool = True) -> list[OracleBlock]:
    """turns: iterable of dicts with conv_id/turn_idx/role/tool/ts/text.
    Returns blocks in stable order (conv_id, turn_idx, ts, rank, idx)."""
    out: list[OracleBlock] = []
    ordered = sorted(turns, key=lambda r: (r["conv_id"], r["turn_idx"], str(r.get("ts"))))
    for r in ordered:
        for blk in parse_turn(
            r["conv_id"], r["turn_idx"], r.get("role"), r.get("tool"), r.get("ts"),
            r.get("text"),
        ):
            out.append(validate_block(process_block(blk, mode), validate))
    return out


def crossref_links(blocks: list[OracleBlock]) -> list[dict]:
    """Cross-reference heuristic (crew_mlx_tools.py:374-394) on surviving blocks."""
    links = []
    for b in blocks:
        if b.status not in ("accepted", "corrected"):
            continue
        content = b.structured_text.lower()
        if any(ref in content for ref in CROSSREF_KEYWORDS):
            links.append(
                {
                    "source_chunk_id": b.chunk_id,
                    "reference_type": "cross_reference",
                    "confidence": 0.8,
                }
            )
    return links


def metrics_totals(blocks: list[OracleBlock]) -> dict[str, int]:
    """The reference's counters (pipeline.py:255-319) as totals."""
    m: dict[str, int] = {
        "n_candidate_blocks": len(blocks),
        "accepted": 0,
        "corrected": 0,
        "discarded": 0,
        "dropped_short": 0,
        "dropped_table_small": 0,
        "dropped_figure_small": 0,
        "retried": 0,
    }
    for b in blocks:
        m[b.status] += 1
        if b.retried:
            m["retried"] += 1
    return m
