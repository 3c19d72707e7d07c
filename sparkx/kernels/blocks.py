"""Turn-text → block segmentation kernel (the "parser").

Re-expresses the reference PDF parser's per-page emission semantics
(reference ``src/core/parser.py:34-156``) over transcript turns.  The PDF
concepts map onto a deterministic line grammar for the ``text`` payload of a
turn (FIXTURES.md §2):

* **table region** — maximal run of consecutive lines containing a TAB
  (a serialized cell grid, one row per line, cells separated by ``\\t``;
  the analog of ``plumb_page.extract_tables()``, parser.py:54).  Rendered to
  markdown with byte-identical ``_to_markdown`` semantics (parser.py:140-156):
  ``str(c or "")`` None/empty handling, ``---`` separator sized to row 0,
  ragged rows NOT padded.  Gate: ``len(rows) >= MIN_TABLE_ROWS (2)``
  (parser.py:31,55).
* **figure line** — ``FIG;mode=<M>;w=<int>;h=<int>;caption=<...>`` (the analog
  of ``fitz_page.get_images``, parser.py:66-121).  Gate: ``w >= 80 and
  h >= 80`` (parser.py:81-83).  All modes are coerced to RGB downstream
  (parser.py:72-79).
* **text remainder** — all other lines of the turn joined by ``\\n`` (the
  analog of ``plumb_page.extract_text()``, parser.py:124).  Gate:
  ``len(text.strip()) >= MIN_TEXT_LEN (40)`` (parser.py:32,125).

Per-turn emission order mirrors the per-page order: **tables, then figures,
then text** (parser.py:49-133), encoded as ``block_rank`` 0/1/2 plus an
intra-kind ``block_idx``.

Gated-out blocks are emitted with a ``status`` of ``dropped_*`` so the metrics
sidecar can count drops in the same pass; lines consumed by a table region or
figure never re-enter the text remainder.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MIN_TABLE_ROWS = 2  # parser.py:31
MIN_TEXT_LEN = 40  # parser.py:32
MIN_FIGURE_DIM = 80  # parser.py:81-83

FIG_RE = r"^FIG;mode=([A-Za-z0-9]+);w=(\d+);h=(\d+);caption=(.*)$"

RANK_TABLE, RANK_FIGURE, RANK_TEXT = 0, 1, 2

# columns every block row carries (turn passthrough + block identity)
_CARRY = ["conv_id", "turn_idx", "role", "tool", "ts"]
BLOCK_COLUMNS = _CARRY + [
    "chunk_type",
    "block_rank",
    "block_idx",
    "raw_content",  # markdown for tables, FIG line for figures, remainder for text
    "fig_mode",
    "fig_w",
    "fig_h",
    "fig_caption",
    "parse_status",  # "" (alive) | dropped_table_small | dropped_figure_small | dropped_short
    # table-only internals consumed by the extraction kernel (schema stat A3):
    "header_line",
    "n_rows",
]


def _empty_blocks() -> pd.DataFrame:
    df = pd.DataFrame({c: pd.Series(dtype=object) for c in BLOCK_COLUMNS})
    for c in ("turn_idx", "block_rank", "block_idx", "fig_w", "fig_h"):
        df[c] = df[c].astype("int64", errors="ignore")
    return df


def parse_blocks(turns: pd.DataFrame) -> pd.DataFrame:
    """Segment a batch of turns into block rows (flatMap: 1 turn → N blocks).

    ``turns`` columns: conv_id, turn_idx, role, tool, ts, text.
    Returns one row per candidate block with ``parse_status`` marking gate
    outcomes.  Every turn emits exactly one text candidate (possibly empty →
    ``dropped_short``), mirroring the parser's unconditional
    ``extract_text() or ""`` (parser.py:124).
    """
    if len(turns) == 0:
        return _empty_blocks()

    t = turns.reset_index(drop=True)
    t["_tid"] = np.arange(len(t), dtype=np.int64)

    # ── explode to lines ────────────────────────────────────────────────
    lines = t["text"].fillna("").astype(object).str.split("\n")
    L = t[["_tid"]].copy()
    L["line"] = lines
    L = L.explode("line", ignore_index=True)
    L["line"] = L["line"].fillna("").astype(object)
    L["lno"] = L.groupby("_tid", sort=False).cumcount()

    fig_parts = L["line"].str.extract(FIG_RE)
    is_fig = fig_parts[0].notna()
    is_tab = L["line"].str.contains("\t", regex=False) & ~is_fig

    # ── table regions: contiguous is_tab runs within a turn ────────────
    new_run = is_tab & (
        ~is_tab.shift(fill_value=False) | (L["_tid"] != L["_tid"].shift())
    )
    region_id = new_run.cumsum()

    tables = _render_tables(L, is_tab, region_id)
    figures = _build_figures(L, is_fig, fig_parts)
    texts = _build_text_remainder(L, ~is_tab & ~is_fig, n_turns=len(t))

    blocks = pd.concat([tables, figures, texts], ignore_index=True)
    blocks = blocks.sort_values(["_tid", "block_rank", "block_idx"], kind="stable")

    out = t[_CARRY + ["_tid"]].merge(blocks, on="_tid", how="inner")
    out = out.sort_values(["_tid", "block_rank", "block_idx"], kind="stable").drop(
        columns="_tid"
    )
    return out.reset_index(drop=True)[BLOCK_COLUMNS]


def _render_tables(L: pd.DataFrame, is_tab: pd.Series, region_id: pd.Series) -> pd.DataFrame:
    T = pd.DataFrame(
        {
            "_tid": L.loc[is_tab, "_tid"],
            "lno": L.loc[is_tab, "lno"],
            "line": L.loc[is_tab, "line"],
            "region": region_id[is_tab],
        }
    )
    if len(T) == 0:
        return pd.DataFrame(columns=["_tid", "block_rank", "block_idx", "chunk_type",
                                     "raw_content", "fig_mode", "fig_w", "fig_h",
                                     "fig_caption", "parse_status", "header_line",
                                     "n_rows"])

    # markdown body line: "| " + " | ".join(cells) + " |" with cells = TSV split.
    # str(c or "") maps empty→empty, so a TSV cell already IS str(c or "").
    T["md"] = "| " + T["line"].str.replace("\t", " | ", regex=False) + " |"

    g = T.groupby("region", sort=False)
    pos = g.cumcount()
    header_md = T.loc[pos == 0].set_index("region")["md"]
    header_line = T.loc[pos == 0].set_index("region")["line"]
    first_lno = T.loc[pos == 0].set_index("region")["lno"]
    tid = T.loc[pos == 0].set_index("region")["_tid"]
    nrows = g.size()

    # separator: "| " + " | ".join("---" for _ in row0) + " |"  (parser.py:152)
    ncols0 = header_line.str.count("\t") + 1
    sep = "| ---" + pd.Series(" | ---", index=ncols0.index).str.repeat(ncols0 - 1) + " |"

    body = T.loc[pos > 0].groupby("region", sort=False)["md"].agg("\n".join)
    body = body.reindex(header_md.index)
    markdown = header_md + "\n" + sep + ("\n" + body).fillna("")

    res = pd.DataFrame(
        {
            "_tid": tid,
            "first_lno": first_lno,
            "raw_content": markdown,
            "n_rows": nrows.reindex(header_md.index),
            "header_line": header_line,
        }
    ).sort_values(["_tid", "first_lno"], kind="stable")
    res["block_idx"] = res.groupby("_tid", sort=False).cumcount()
    res["block_rank"] = RANK_TABLE
    res["chunk_type"] = "table"
    res["parse_status"] = np.where(
        res["n_rows"] >= MIN_TABLE_ROWS, "", "dropped_table_small"
    )
    res["fig_mode"] = None
    res["fig_w"] = -1
    res["fig_h"] = -1
    res["fig_caption"] = None
    # header_line is kept for the table-schema stat (SURVEY A3) downstream
    return res[["_tid", "block_rank", "block_idx", "chunk_type", "raw_content",
                "fig_mode", "fig_w", "fig_h", "fig_caption", "parse_status",
                "header_line", "n_rows"]]


def _build_figures(L: pd.DataFrame, is_fig: pd.Series, fig_parts: pd.DataFrame) -> pd.DataFrame:
    Fg = pd.DataFrame(
        {
            "_tid": L.loc[is_fig, "_tid"],
            "raw_content": L.loc[is_fig, "line"],
            "fig_mode": fig_parts.loc[is_fig, 0],
            "fig_w": fig_parts.loc[is_fig, 1].astype("int64"),
            "fig_h": fig_parts.loc[is_fig, 2].astype("int64"),
            "fig_caption": fig_parts.loc[is_fig, 3],
        }
    )
    Fg["block_idx"] = Fg.groupby("_tid", sort=False).cumcount()
    Fg["block_rank"] = RANK_FIGURE
    Fg["chunk_type"] = "figure"
    Fg["parse_status"] = np.where(
        (Fg["fig_w"] >= MIN_FIGURE_DIM) & (Fg["fig_h"] >= MIN_FIGURE_DIM),
        "",
        "dropped_figure_small",
    )
    Fg["header_line"] = None
    Fg["n_rows"] = -1
    return Fg


def _build_text_remainder(L: pd.DataFrame, keep: pd.Series, n_turns: int) -> pd.DataFrame:
    rem = L.loc[keep].groupby("_tid", sort=False)["line"].agg("\n".join)
    rem = rem.reindex(pd.RangeIndex(n_turns), fill_value="")
    res = pd.DataFrame({"_tid": rem.index.to_numpy(), "raw_content": rem.to_numpy()})
    res["block_idx"] = 0
    res["block_rank"] = RANK_TEXT
    res["chunk_type"] = "text"
    res["parse_status"] = np.where(
        res["raw_content"].str.strip().str.len() >= MIN_TEXT_LEN, "", "dropped_short"
    )
    res["fig_mode"] = None
    res["fig_w"] = -1
    res["fig_h"] = -1
    res["fig_caption"] = None
    res["header_line"] = None
    res["n_rows"] = -1
    return res
