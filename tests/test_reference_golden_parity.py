"""Parity against the reference's OWN golden fixture.

`/root/reference/output/21_77_chunks.json` is the reference's committed
golden output (40 chunks produced by its deterministic crew fast path,
SURVEY.md §3.2).  Every constant our fastpath kernel and JSON sink implement
must match that file byte-for-byte — this test reads the fixture (read-only)
and checks our constants against it, so any drift in our re-expression of the
reference contract fails here even without running the reference."""

from __future__ import annotations

import json
import re

import pytest

from sparkx.kernels.extract import FASTPATH_CONF, FASTPATH_NOTES
from sparkx.sinks import SERIALIZED_TRUNC

FIXTURE = "/root/reference/output/21_77_chunks.json"


@pytest.fixture(scope="module")
def golden():
    with open(FIXTURE, encoding="utf-8") as f:
        return json.load(f)


def test_chunk_mix(golden):
    # 6 text / 12 table / 22 figure (SURVEY §3.2)
    counts = {}
    for c in golden:
        counts[c["chunk_type"]] = counts.get(c["chunk_type"], 0) + 1
    assert counts == {"text": 6, "table": 12, "figure": 22}


def test_fastpath_constants_match(golden):
    for c in golden:
        assert c["confidence"] == FASTPATH_CONF
        assert c["agent_notes"] == FASTPATH_NOTES
        assert c["intuition_summary"] == ""
        assert c["key_concepts"] == []
        assert c["validation"] is None


def test_chunk_type_domain_lowercase(golden):
    # models.py:22-25 — lowercase values (the reference's own test asserts
    # uppercase and is wrong; code is truth, SURVEY §1.4)
    assert {c["chunk_type"] for c in golden} <= {"text", "table", "figure"}


def test_figure_repr_stable_prefix(golden):
    """Our figure structured_text is the stable prefix of the reference's
    PIL repr; the trailing ' at 0x…>' memory address is the documented
    nondeterminism excluded from equality (SURVEY §3.2)."""
    pat = re.compile(r"^<PIL\.Image\.Image image mode=RGB size=(\d+)x(\d+) at 0x[0-9A-F]+>$")
    for c in golden:
        if c["chunk_type"] != "figure":
            continue
        m = pat.match(c["structured_text"])
        assert m, c["structured_text"]
        w, h = int(m.group(1)), int(m.group(2))
        ours = f"<PIL.Image.Image image mode=RGB size={w}x{h}"
        assert c["structured_text"].startswith(ours)
        assert w >= 80 and h >= 80  # parser size gate held in the golden run


def test_serialization_truncation_rule(golden):
    """serialization.py:37 — [:500] + '...' only when longer than 500."""
    for c in golden:
        st = c["structured_text"]
        assert len(st) <= SERIALIZED_TRUNC + 3
        if len(st) == SERIALIZED_TRUNC + 3:
            assert st.endswith("...")


def test_table_markdown_shape(golden):
    """Table chunks in the golden file are the parser's markdown (P1):
    '| '-prefixed header and a '| --- | … |' separator row.  NB cells can
    contain embedded newlines (pdfplumber), so rows are not line-aligned —
    only the prefix and the separator row are stable shape invariants."""
    sep = re.compile(r"^\| ---( \| ---)* \|$", re.MULTILINE)
    for c in golden:
        if c["chunk_type"] != "table":
            continue
        st = c["structured_text"]
        assert st.startswith("| "), st[:40]
        assert sep.search(st), st[:120]
