"""Property-based fuzz: for ARBITRARY turn text (including adversarial tab /
newline / FIG-marker soup), the vectorized kernel must agree byte-for-byte
with the pure-Python oracle.  This is the strongest equality gate — it
explores the grammar's edge space rather than the synth generator's families.
No Spark needed (the pandas kernel is the unit under test; the Spark wrapper
equality is covered by test_spark_oracle)."""

from __future__ import annotations

import pandas as pd
from hypothesis import example, given, settings
from hypothesis import strategies as st

from sparkx import oracle as O
from sparkx.kernels.extract import extract_batch

# building blocks that stress every grammar branch
_cell = st.text(
    alphabet=st.characters(blacklist_characters="\t\n\r", blacklist_categories=("Cs",)),
    max_size=8,
)
_tsv_line = st.lists(_cell, min_size=2, max_size=5).map("\t".join)
_fig_line = st.builds(
    lambda mode, w, h, cap: f"FIG;mode={mode};w={w};h={h};caption={cap}",
    st.sampled_from(["RGB", "OCR", "L"]),
    st.integers(0, 300),
    st.integers(0, 300),
    _cell,
)
_near_fig = st.sampled_from(
    [
        "FIG;mode=RGB;w=10;h=",  # malformed → not a figure line
        "xFIG;mode=RGB;w=100;h=100;caption=no",  # not at line start
        "FIG;mode=;w=1;h=1;caption=",  # empty mode → no match
        " FIG;mode=RGB;w=100;h=100;caption=sp",  # leading space
    ]
)
_prose_line = st.text(
    alphabet=st.characters(blacklist_characters="\t\n\r", blacklist_categories=("Cs",)),
    max_size=60,
)
_line = st.one_of(_prose_line, _tsv_line, _fig_line, _near_fig)
_turn_text = st.lists(_line, min_size=0, max_size=8).map("\n".join)


def _frame(texts: list[str]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": [f"c{i % 3}" for i in range(len(texts))],
            "turn_idx": pd.array(range(len(texts)), dtype="int32"),
            "role": ["user"] * len(texts),
            "tool": [""] * len(texts),
            "ts": [pd.Timestamp("2026-01-01")] * len(texts),
            "text": texts,
        }
    )


@settings(max_examples=120, deadline=None)
@given(texts=st.lists(_turn_text, min_size=1, max_size=6),
       mode=st.sampled_from(["fastpath", "agentic"]))
@example(texts=["\t\x1f\n\t"], mode="agentic")  # r1 JSON control-char bug
@example(texts=["a" * 36 + "\n\n\n\n"], mode="fastpath")  # strip-gate boundary
@example(texts=["a" * 39 + " ", "b" * 40 + "\r\n"], mode="fastpath")
def test_kernel_matches_oracle_on_arbitrary_text(texts, mode):
    t = _frame(texts)
    got = (
        extract_batch(t, mode=mode, validate=True)
        .sort_values(["conv_id", "turn_idx", "block_rank", "block_idx"], kind="stable")
        .reset_index(drop=True)
    )
    want = O.run_oracle(t.to_dict("records"), mode=mode, validate=True)
    assert len(got) == len(want), (len(got), len(want))
    for i, b in enumerate(want):
        row = got.iloc[i]
        assert row.conv_id == b.conv_id and row.turn_idx == b.turn_idx
        assert row.chunk_type == b.chunk_type, (i, row.chunk_type, b.chunk_type)
        assert row.raw_content == b.raw_content, (i, repr(row.raw_content), repr(b.raw_content))
        assert row.structured_text == b.structured_text, i
        assert row.status == b.status, (i, row.status, b.status)
        assert row.confidence == b.confidence
        assert bool(row.retried) == b.retried
