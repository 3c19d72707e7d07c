"""Corpus-curation operators: determinism, stratification, filter parity,
rollup conservation, quantile parity vs numpy."""

from __future__ import annotations

import re

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def docs_pdf():
    import pandas as pd

    return pd.read_parquet(f"{SF}/documents.parquet")


def test_sample_gate_rounds_not_truncates():
    """0.29*10000 is 2899.999… in binary; int() would shift the gate by one
    bucket vs an engine mirroring it with round(rate*10000)."""
    from sparkx.ops.corpus import _gate

    assert _gate(0.29) == 2900
    assert _gate(0.07) == 700
    assert _gate(0.2) == 2000 and _gate(1.0) == 10000 and _gate(0.0) == 0


def test_deterministic_sample_is_deterministic_and_salted(spark, docs):
    from sparkx.ops.corpus import deterministic_sample

    a = sorted(r.doc_id for r in deterministic_sample(docs, "doc_id", 0.2).collect())
    b = sorted(r.doc_id for r in deterministic_sample(docs, "doc_id", 0.2).collect())
    assert a == b and len(a) > 0
    # rate lands near 20% (hash-uniformity, 500 docs)
    n = docs.count()
    assert 0.1 * n <= len(a) <= 0.3 * n
    # a different salt selects a different (deterministic) subset
    c = sorted(r.doc_id for r in
               deterministic_sample(docs, "doc_id", 0.2, salt="s1").collect())
    assert c != a
    # monotone: a higher rate is a superset of a lower rate (same salt)
    sup = sorted(r.doc_id for r in deterministic_sample(docs, "doc_id", 0.5).collect())
    assert set(a) <= set(sup)


def test_stratified_sample_rates(spark, docs, docs_pdf):
    from sparkx.ops.corpus import stratified_sample

    out = stratified_sample(
        docs, "doc_id", "lang", rates={"en": 1.0, "de": 0.0}, default_rate=0.5
    ).toPandas()
    n_en = (docs_pdf.lang == "en").sum()
    assert (out.lang == "en").sum() == n_en  # rate 1.0 keeps every row
    assert (out.lang == "de").sum() == 0  # rate 0.0 drops every row
    other = docs_pdf.lang[~docs_pdf.lang.isin(["en", "de"])].count()
    kept_other = (~out.lang.isin(["en", "de"])).sum()
    assert 0.25 * other <= kept_other <= 0.75 * other


def test_quality_length_filter_matches_python(spark, docs, docs_pdf):
    from sparkx.ops.corpus import quality_length_filter

    got = set(
        r.doc_id for r in quality_length_filter(
            docs, min_tokens=20, max_tokens=5000, min_quality=0.3
        ).select("doc_id").collect()
    )

    def py_pass(text: str) -> bool:
        toks = re.split(r"\s+", text.strip())
        n = len(toks)
        punct = sum(c in ".,;:!?" for c in text) / max(len(text), 1)
        stop = sum(t.lower() in ("the", "a", "and", "of", "to", "is") for t in
                   re.split(r"\s+", text.strip().lower())) / max(n, 1)
        q = round(min(1.0, n / 100.0) * 0.5 + (1.0 - punct) * 0.3 + stop * 0.2, 4)
        return 20 <= n <= 5000 and q >= 0.3

    want = {row.doc_id for _, row in docs_pdf.iterrows() if py_pass(row.text)}
    assert got == want


def test_time_bucket_rollup_conserves_totals(spark):
    from sparkx.ops.corpus import time_bucket_rollup

    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = time_bucket_rollup(ev, bucket_seconds=3600).toPandas()
    assert out.n_events.sum() == ev.count()
    assert (out.bucket_epoch % 3600 == 0).all()
    # value micro-units conserve the global sum
    import pandas as pd

    raw = pd.read_parquet(f"{SF}/events.parquet")
    assert out.value_e4.sum() == int(round(raw.value * 10000).sum())


def test_token_quantiles_sketch_path_close_to_exact(spark, docs):
    """The DEFAULT path is now the mergeable approx_percentile sketch (the
    100-TB shape); it must stay within sketch tolerance of the exact path
    (exact=True, kept for the oracle gate)."""
    from sparkx.ops.corpus import token_quantiles_by

    exact = {
        r.grp: (r.p50, r.p90)
        for r in token_quantiles_by(docs, exact=True).collect()
    }
    approx = {r.grp: (r.p50, r.p90) for r in token_quantiles_by(docs).collect()}
    for grp, (p50, p90) in exact.items():
        a50, a90 = approx[grp]
        assert abs(a50 - p50) <= max(2.0, 0.05 * p50), (grp, a50, p50)
        assert abs(a90 - p90) <= max(2.0, 0.05 * p90), (grp, a90, p90)


def test_scrub_pii_matches_python(spark):
    import pandas as pd

    from sparkx.ops.textstats import EMAIL_RE, PHONE_RE, scrub_pii

    texts = [
        "mail me at jo.doe+x@sub.example.co.uk now",
        "call +1 (555) 010-9999 or 555-123-4567 today",
        "both a@b.io and +49 30 1234567!",
        "nothing here",
        "",
        "fake@ @no.tld a@b.c",  # a@b.c: single-char TLD fails {2,}
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        "doc_id long, text string",
    )
    got = scrub_pii(df).toPandas().set_index("doc_id")

    for i, t in enumerate(texts):
        assert got.loc[i, "n_emails"] == len(re.findall(EMAIL_RE, t)), t
        no_email = re.sub(EMAIL_RE, "<EMAIL>", t)
        assert got.loc[i, "n_phones"] == len(re.findall(PHONE_RE, no_email)), t
        assert got.loc[i, "scrubbed"] == re.sub(PHONE_RE, "<PHONE>", no_email), t
    assert got.loc[0, "n_emails"] == 1 and got.loc[1, "n_phones"] >= 1
    assert "<EMAIL>" in got.loc[2, "scrubbed"] and "<PHONE>" in got.loc[2, "scrubbed"]


def test_line_repetition_ratio_matches_python(spark):
    import pandas as pd

    from sparkx.ops.textstats import line_repetition_ratio

    texts = ["a\nb\na", "x\nx\nx\nx", "solo", "", "\n\n", "p\n\nq\np\nq"]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.rr
        for r in df.select("doc_id", line_repetition_ratio().alias("rr")).collect()
    }
    for i, t in enumerate(texts):
        lines = [x for x in t.split("\n") if x != ""]
        want = 0.0 if not lines else round(1.0 - len(set(lines)) / len(lines), 4)
        assert got[i] == pytest.approx(want), (i, t)


def test_token_quantiles_match_numpy(spark, docs, docs_pdf):
    import numpy as np

    from sparkx.ops.corpus import token_quantiles_by

    got = {r.grp: (r.n_docs, r.p50, r.p90, r.p99)
           for r in token_quantiles_by(docs, by="lang", exact=True).collect()}
    for lang, grp in docs_pdf.groupby("lang"):
        toks = grp.text.map(lambda t: len(re.split(r"\s+", t.strip()))).to_numpy()
        n, p50, p90, p99 = got[lang]
        assert n == len(toks)
        assert p50 == pytest.approx(np.percentile(toks, 50, method="linear"))
        assert p90 == pytest.approx(np.percentile(toks, 90, method="linear"))
        assert p99 == pytest.approx(np.percentile(toks, 99, method="linear"))


def test_distinct_stats_sketch_close_to_exact(spark, docs):
    """The DEFAULT distinct count is the mergeable HLL++ sketch (the 100-TB
    shape); it must stay within rsd tolerance of the exact count
    (exact=True, kept for the oracle gate)."""
    from sparkx.ops.corpus import distinct_stats

    exact = {r.grp: r.n_distinct for r in distinct_stats(docs, exact=True).collect()}
    approx = {r.grp: r.n_distinct for r in distinct_stats(docs).collect()}
    assert set(exact) == set(approx)
    for grp, n in exact.items():
        assert abs(approx[grp] - n) <= max(2, 0.1 * n), (grp, approx[grp], n)


def test_pack_assignments_match_pandas(spark, docs, docs_pdf):
    """Concatenate-and-chunk packing: offsets are exact per-(grp, shard)
    running sums in doc_id order, bin = start_offset // budget, and every
    document is assigned exactly once."""
    import hashlib
    import re

    from sparkx.ops.corpus import pack_assignments

    got = pack_assignments(docs, budget_tokens=512, n_shards=8).toPandas()
    assert len(got) == len(docs_pdf)
    ref = docs_pdf.copy()
    ref["n_tokens"] = ref.text.map(lambda t: len(re.split(r"\s+", t.strip())))
    ref["shard"] = ref.doc_id.map(
        lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 8
    )
    ref = ref.sort_values("doc_id")
    ref["start_offset"] = (
        ref.groupby(["lang", "shard"]).n_tokens.cumsum() - ref.n_tokens
    )
    by_id = got.set_index("doc_id")
    for _, r in ref.iterrows():
        row = by_id.loc[r.doc_id]
        assert row.shard == r.shard and row.n_tokens == r.n_tokens, r.doc_id
        assert row.start_offset == r.start_offset, r.doc_id
        assert row.bin == r.start_offset // 512, r.doc_id


def test_mixture_plan_rates_and_budget(spark):
    """Weights + token budget → per-stratum gates: a stratum with plenty of
    tokens gets rate ≈ weight·budget/observed; one with too few saturates
    at 10000 (take everything); unweighted strata are absent."""
    from pyspark.sql import functions as F

    from sparkx.ops.corpus import mixture_plan

    rows = []
    did = 0
    for src, n_docs, words in [("web", 200, 50), ("code", 10, 50), ("junk", 30, 50)]:
        for _ in range(n_docs):
            rows.append((did, src, "tok " * words))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r.source: r
        for r in mixture_plan(
            docs, weights={"web": 0.5, "code": 0.5}, total_tokens=1000, by="source"
        ).collect()
    }
    assert set(got) <= {"web", "code"}  # junk never sampled
    # web: observed 200*50=10000 tokens, target 500 → rate 500 of 10000
    assert got["web"].rate_e4 == 500
    # code: observed 500 tokens < target 500... equals budget → rate 10000
    assert got["code"].rate_e4 == 10000 and got["code"].n_docs == 10
    # realized web tokens near the 500 target (hash-gate variance at n=200)
    assert 0 < got["web"].n_tokens <= 2000


def test_corpus_cube_totals_consistent(spark):
    """CUBE invariants: the grand total equals the sum of leaf cells, each
    per-dimension rollup equals the sum of its children, and gid separates
    rollup NULLs from real values."""
    from sparkx.ops.corpus import corpus_cube

    docs = spark.createDataFrame(
        [(0, "en", "a", "w w w"), (1, "en", "b", "w w"), (2, "de", "a", "w")],
        "doc_id long, lang string, source string, text string",
    )
    rows = corpus_cube(docs).collect()
    leaf = [r for r in rows if r.gid == 0]
    total = [r for r in rows if r.gid == 3]
    assert len(total) == 1
    assert total[0].n_docs == sum(r.n_docs for r in leaf) == 3
    assert total[0].n_tokens == sum(r.n_tokens for r in leaf) == 6
    by_lang = {r.lang: r for r in rows if r.gid == 1}  # source rolled up
    assert by_lang["en"].n_tokens == 5 and by_lang["de"].n_tokens == 1


def test_chunk_spans_reconstruction_and_overlap(spark):
    """Chunking invariants: stride = chunk − overlap, consecutive chunks
    share exactly `overlap` tokens, concatenating chunk cores (dropping
    each chunk's leading overlap) reconstructs the document, and the final
    chunk is the only short one."""
    from sparkx.ops.corpus import chunk_spans

    text = " ".join(f"w{i}" for i in range(230))
    docs = spark.createDataFrame(
        [(1, text), (2, "only three tokens"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    rows = sorted(
        chunk_spans(docs, chunk_tokens=100, overlap=20).collect(),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 2}  # empty/NULL docs produce nothing
    c1 = by_doc[1]
    assert [r.start_tok for r in c1] == [0, 80, 160]
    assert [r.n_tok for r in c1] == [100, 100, 70]
    toks1 = [c1[0].chunk_text.split()] + [r.chunk_text.split()[20:] for r in c1[1:]]
    assert " ".join(t for ts in toks1 for t in ts) == text  # lossless
    # consecutive chunks share exactly the overlap
    assert c1[0].chunk_text.split()[80:] == c1[1].chunk_text.split()[:20]
    short = by_doc[2]
    assert len(short) == 1 and short[0].n_tok == 3
    assert short[0].chunk_text == "only three tokens"

    import pytest

    with pytest.raises(ValueError):
        chunk_spans(docs, chunk_tokens=10, overlap=10)


def test_split_assign_deterministic_and_disjoint(spark):
    """Split assignment is a pure function of (salt, key): stable across
    calls, partitions the corpus, and approximates the requested rates."""
    from sparkx.ops.corpus import split_assign

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(2000)], "doc_id long, text string"
    )
    a = {r.doc_id: r.split for r in split_assign(docs, 0.1, 0.1).collect()}
    b = {r.doc_id: r.split for r in split_assign(docs, 0.1, 0.1).collect()}
    assert a == b  # deterministic
    from collections import Counter

    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert abs(c["val"] / 2000 - 0.1) < 0.03 and abs(c["test"] / 2000 - 0.1) < 0.03
    # a subset re-ingest keeps every doc's assignment (no split churn)
    sub = {r.doc_id: r.split
           for r in split_assign(docs.filter("doc_id < 500"), 0.1, 0.1).collect()}
    assert all(a[k] == v for k, v in sub.items())


def test_corpus_scorecard_groups_and_grid_truncation(spark):
    """Scorecard per (lang, source): exact-dup fraction, Gopher pass rate,
    and integer-grid (truncating) means — hand-verifiable fixture."""
    from sparkx.ops.corpus import corpus_scorecard

    passer = " ".join(
        ["the", "of", "and", "that", "have", "with", "be", "to"]
        + [f"word{i:02d}xx" for i in range(44)]
    )  # 52 words, mwl ~5, 8 stopwords, no repetition -> keep
    docs = spark.createDataFrame(
        [
            (1, passer, "en", "a"),
            (2, passer, "en", "a"),          # exact duplicate
            (3, "too short to keep", "en", "b"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    got = {
        (r.lang, r.source): r for r in corpus_scorecard(docs).collect()
    }
    a, b = got[("en", "a")], got[("en", "b")]
    assert a.n_docs == 2 and a.dup_frac == 0.5 and a.gopher_keep_frac == 1.0
    assert a.mean_tokens == 52.0
    assert 0.0 < a.mean_quality < 1.0
    assert b.n_docs == 1 and b.dup_frac == 0.0 and b.gopher_keep_frac == 0.0
    assert b.mean_tokens == 4.0


def test_temperature_mixture_upsamples_low_resource(spark):
    import hashlib
    import math

    from sparkx.ops.corpus import temperature_mixture

    # skewed corpus: 'hi' is low-resource (2 docs x 10 tokens), 'en' is
    # high-resource (50 docs x 20 tokens)
    rows = [(i, " ".join(f"w{j}" for j in range(10)), "hi", "web")
            for i in range(2)]
    rows += [(100 + i, " ".join(f"w{j}" for j in range(20)), "en", "web")
             for i in range(50)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    budget = 500
    got = {
        r["lang"]: (r["rate_e4"], r["n_docs"], r["n_tokens"])
        for r in temperature_mixture(docs, total_tokens=budget).collect()
    }

    # python mirror of the integer allocation + hash gate
    toks = {"hi": 20, "en": 1000}
    w = {k: math.isqrt(v) for k, v in toks.items()}
    sw = sum(w.values())
    rate = {
        k: min(10000, ((budget * w[k]) // sw) * 10000 // toks[k])
        for k in toks
    }

    def bucket(doc_id):
        return int(hashlib.md5(f"temp0|{doc_id}".encode())
                   .hexdigest()[:8], 16) % 10000

    want = {}
    for k, ids, per_doc in (("hi", range(2), 10),
                            ("en", range(100, 150), 20)):
        kept = [i for i in ids if bucket(i) < rate[k]]
        if kept:
            want[k] = (rate[k], len(kept), per_doc * len(kept))
    assert got == want

    # alpha=0.5 upsamples the low-resource stratum: its sampling RATE
    # exceeds the high-resource one's even though its share of tokens is
    # 50x smaller (proportional sampling would give equal rates)
    assert rate["hi"] > rate["en"]


def test_dialogue_windows_hand_computed(spark):
    """Window assembly against hand-computed token math: budget boundary
    inclusive, over-budget lone target (fits=false, target still emitted),
    per-conversation isolation, and non-contiguous turn indexes."""
    from sparkx.ops.corpus import dialogue_windows

    rows = [
        # conv A: toks 4, 3, 5, 2 at idx 0..3 (assistant at 1 and 3)
        ("A", 0, "user", "t1 t2 t3 t4"),
        ("A", 1, "assistant", "a b c"),
        ("A", 2, "user", "u1 u2 u3 u4 u5"),
        ("A", 3, "assistant", "x y"),
        # conv B: a single over-budget assistant turn (12 tokens, budget 10)
        ("B", 0, "assistant", " ".join(f"w{i}" for i in range(12))),
        # conv C: non-contiguous idx (10, 20, 30), assistant at 30
        ("C", 10, "user", "one two three"),          # 3
        ("C", 20, "tool", "four five"),              # 2
        ("C", 30, "assistant", "six seven eight"),   # 3
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    got = {
        (r.conv_id, r.turn_idx): (
            r.first_turn_idx, r.n_context_turns, r.context_tokens, r.fits
        )
        for r in dialogue_windows(df, budget=10).collect()
    }
    # A@1: turns 0+1 = 7 ≤ 10 → window [0,1]
    assert got[("A", 1)] == (0, 2, 7, True)
    # A@3: suffix sums: [3]=2, [2,3]=7, [1,2,3]=10 (boundary, fits),
    # [0..3]=14 > 10 → window [1,3]
    assert got[("A", 3)] == (1, 3, 10, True)
    # B@0: lone 12-token target over budget → emitted, fits=false
    assert got[("B", 0)] == (0, 1, 12, False)
    # C@30: 3+2+3 = 8 ≤ 10 → all three turns despite index gaps
    assert got[("C", 30)] == (10, 3, 8, True)
    assert len(got) == 4  # only assistant turns become examples


def test_dialogue_windows_budget_zero_and_exact_fit(spark):
    """budget smaller than every turn → every example is the lone target
    with fits=false; exact-fit suffix is included (≤, not <)."""
    from sparkx.ops.corpus import dialogue_windows

    df = spark.createDataFrame(
        [("X", 0, "user", "p q"), ("X", 1, "assistant", "r s t")],
        "conv_id string, turn_idx int, role string, text string",
    )
    tight = {r.turn_idx: (r.first_turn_idx, r.context_tokens, r.fits)
             for r in dialogue_windows(df, budget=1).collect()}
    assert tight[1] == (1, 3, False)
    exact = {r.turn_idx: (r.first_turn_idx, r.context_tokens, r.fits)
             for r in dialogue_windows(df, budget=5).collect()}
    assert exact[1] == (0, 5, True)


def test_turn_boilerplate_strip_per_conversation_df(spark):
    """The share gate counts CONVERSATIONS, not occurrences: a line pasted
    20× inside one conversation is content (kept); a line present once in
    3 of 4 conversations crosses the 0.6 share gate (stripped everywhere).
    Short lines are exempt; a turn whose every line is boilerplate
    survives with clean_text ''; NULL text behaves as ''."""
    from sparkx.ops.corpus import turn_boilerplate_strip

    preamble = "I am a helpful agent."
    spam = "local repetition line"
    rows = [
        ("A", 0, "assistant", preamble + "\nalpha content here"),
        ("A", 1, "user", "\n".join([spam] * 20)),
        ("B", 0, "assistant", preamble + "\nbeta content here"),
        ("C", 0, "assistant", preamble),
        ("C", 1, "user", "x\ngamma content here"),
        ("D", 0, "assistant", "delta content here"),
        ("D", 1, "tool", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")
    got = {(r.conv_id, r.turn_idx): r
           for r in turn_boilerplate_strip(df, min_share=0.6).collect()}
    assert len(got) == len(rows)
    # preamble in 3/4 convs (share 0.75 ≥ 0.6) → stripped everywhere
    assert got[("A", 0)].clean_text == "alpha content here"
    assert got[("A", 0)].n_dropped == 1 and got[("A", 0)].n_lines == 2
    assert got[("B", 0)].clean_text == "beta content here"
    # all-boilerplate turn survives empty
    assert got[("C", 0)].clean_text == "" and got[("C", 0)].n_dropped == 1
    # 20× within ONE conv: conv-df = 1/4 < 0.6 → kept verbatim
    assert got[("A", 1)].clean_text == "\n".join([spam] * 20)
    assert got[("A", 1)].n_dropped == 0
    # short line 'x' exempt even though unique; content intact
    assert got[("C", 1)].clean_text == "x\ngamma content here"
    # untouched conv + NULL text conventions
    assert got[("D", 0)].clean_text == "delta content here"
    assert got[("D", 1)].clean_text == "" and got[("D", 1)].n_lines == 1


def test_tool_chain_stats_links_across_non_tool_turns(spark):
    """Transitions pair CONSECUTIVE tool turns: intervening user/assistant
    turns don't break the chain; a conversation's first tool call
    transitions from START; n_convs counts distinct conversations per
    transition, not occurrences."""
    from sparkx.ops.corpus import tool_chain_stats

    rows = [
        ("A", 0, "user", ""), ("A", 1, "tool", "search"),
        ("A", 2, "assistant", ""), ("A", 3, "tool", "exec"),
        ("A", 4, "tool", "exec"),
        ("B", 0, "tool", "search"), ("B", 1, "tool", "exec"),
        ("C", 0, "tool", "browse"), ("C", 1, "tool", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string")
    got = {(r.tool_from, r.tool_to): (r.n_transitions, r.n_convs)
           for r in tool_chain_stats(df).collect()}
    assert got[("START", "search")] == (2, 2)   # convs A and B
    assert got[("search", "exec")] == (2, 2)    # across A's assistant turn
    assert got[("exec", "exec")] == (1, 1)
    assert got[("START", "browse")] == (1, 1)   # C's NULL tool row skipped
    assert len(got) == 4


def test_conv_loop_stats_islands_and_null_runs(spark):
    """Gaps-and-islands semantics: runs counted on consecutive verbatim
    repeats only, NULL-text turns extend runs (null-safe equality), a
    leading NULL is never a repeat, and has_loop flips at min_run."""
    from sparkx.ops.corpus import conv_loop_stats

    rows = [
        # c1: a a a b a  → runs 3,1,1; repeats 2; loop at min_run=3
        ("c1", 0, "a"), ("c1", 1, "a"), ("c1", 2, "a"),
        ("c1", 3, "b"), ("c1", 4, "a"),
        # c2: NULL NULL x NULL → NULL run of 2; leading NULL not a repeat
        ("c2", 0, None), ("c2", 1, None), ("c2", 2, "x"), ("c2", 3, None),
        # c3: all distinct
        ("c3", 0, "p"), ("c3", 1, "q"),
    ]
    got = {
        r.conv_id: r
        for r in conv_loop_stats(
            spark.createDataFrame(rows, "conv_id string, turn_idx int, text string"),
            min_run=3,
        ).collect()
    }
    assert (got["c1"].n_turns, got["c1"].n_repeat_turns, got["c1"].max_run,
            got["c1"].has_loop) == (5, 2, 3, True)
    assert (got["c2"].n_turns, got["c2"].n_repeat_turns, got["c2"].max_run,
            got["c2"].has_loop) == (4, 1, 2, False)
    assert (got["c3"].max_run, got["c3"].has_loop) == (1, False)


def test_conv_role_qa_rules(spark):
    """Alternation repeats (tool runs exempt), orphan tools (leading, or
    after user), endpoint checks, composite gate."""
    from sparkx.ops.corpus import conv_role_qa

    rows = [
        # c1: clean — user/assistant with a legal tool chain in between
        ("c1", 0, "user"), ("c1", 1, "assistant"), ("c1", 2, "tool"),
        ("c1", 3, "tool"), ("c1", 4, "assistant"),
        # c2: assistant repeat + tool after user (orphan) + leading ok
        ("c2", 0, "user"), ("c2", 1, "assistant"), ("c2", 2, "assistant"),
        ("c2", 3, "user"), ("c2", 4, "tool"),
        # c3: opens with tool (orphan), ends with user
        ("c3", 0, "tool"), ("c3", 1, "assistant"), ("c3", 2, "user"),
    ]
    got = {r.conv_id: r
           for r in conv_role_qa(
               spark.createDataFrame(
                   rows, "conv_id string, turn_idx int, role string")
           ).collect()}
    c1 = got["c1"]
    assert (c1.n_role_repeats, c1.n_orphan_tools, c1.starts_with_user,
            c1.ends_with_assistant, c1.well_formed) == (0, 0, True, True, True)
    c2 = got["c2"]
    assert (c2.n_role_repeats, c2.n_orphan_tools, c2.well_formed) == (1, 1, False)
    c3 = got["c3"]
    assert (c3.n_orphan_tools, c3.starts_with_user, c3.ends_with_assistant,
            c3.well_formed) == (1, False, False, False)
