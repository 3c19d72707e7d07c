"""Kernel-vs-pure-Python parity for the DSIR domain-affinity scorer and
the priority sampler — the same loop-mirror style as test_corpus."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sparkx.ops.corpus import priority_sample
from sparkx.ops.dsir import N_BUCKETS, WEIGHT_SCALE, domain_affinity

DOCS = [
    # (doc_id, text, lang, n_chars)
    (0, "the quick brown fox jumps over the lazy dog", "en", 44),
    (1, "the quick brown fox naps all day", "en", 32),
    (2, "der schnelle braune fuchs springt", "de", 33),
    (3, "le renard brun rapide saute", "fr", 27),
    (4, "the lazy dog naps under the brown fox", "en", 37),
    (5, "fox fox fox", "de", 11),
    (6, "", "fr", 0),
]


def _mk(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, n_chars long"
    )


def _bucket(feat: str) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % N_BUCKETS


def _feats(text: str) -> list[str]:
    toks = __import__("re").split(r"\s+", text.lower().strip())
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def test_domain_affinity_matches_loop_mirror(spark):
    got = {
        r["doc_id"]: (r["n_feats"], r["affinity_q"])
        for r in domain_affinity(_mk(spark), F.col("lang") == "en").collect()
    }

    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    per_doc: dict[int, list[int]] = {}
    for doc_id, text, lang, _ in DOCS:
        bs = [_bucket(f) for f in _feats(text)]
        per_doc[doc_id] = bs
        for b in bs:
            raw[b] = raw.get(b, 0) + 1
            if lang == "en":
                tgt[b] = tgt.get(b, 0) + 1
    w = {b: ((tgt.get(b, 0) + 1) * WEIGHT_SCALE) // (raw[b] + 1) for b in raw}
    want = {}
    for doc_id, bs in per_doc.items():
        s = sum(w[b] for b in bs)
        want[doc_id] = (len(bs), s // len(bs)) if bs else (0, 0)
    assert got == want

    # in-domain docs outscore out-of-domain ones (the operator's point)
    en = [got[i][1] for i in (0, 1, 4)]
    other = [got[i][1] for i in (2, 3)]
    assert min(en) > max(other)


def test_priority_sample_matches_loop_mirror(spark):
    got = {
        (r["grp"], r["doc_id"]): (r["weight"], r["priority_q"], r["rn"])
        for r in priority_sample(
            _mk(spark), weight_col="n_chars", k=2
        ).collect()
    }

    rows = []
    for doc_id, _, lang, n_chars in DOCS:
        u = int(hashlib.md5(f"pri0|{doc_id}".encode()).hexdigest()[:8], 16) + 1
        rows.append((lang, doc_id, n_chars, (n_chars * 4294967296) // u))
    want = {}
    for lang in {r[0] for r in rows}:
        grp = sorted(
            (r for r in rows if r[0] == lang),
            key=lambda r: (-r[3], r[1]),
        )
        for rn, r in enumerate(grp[:2], start=1):
            want[(lang, r[1])] = (r[2], r[3], rn)
    assert got == want
    # exactly k per full group
    assert sum(1 for (g, _) in got if g == "en") == 2


def test_top_tokens_exact_vs_loop(spark):
    from collections import Counter

    from sparkx.ops.textstats import top_tokens

    docs = _mk(spark)
    got = [(r["tok"], r["n"]) for r in top_tokens(docs, k=5, capacity=64)
           .orderBy("n", "tok").collect()]

    cnt = Counter()
    for _, text, _, _ in DOCS:
        cnt.update(__import__("re").split(r"\s+", text.lower().strip()))
    want = sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:5]
    assert sorted(got, key=lambda t: (-t[1], t[0])) == want


def test_top_tokens_capacity_certification(spark):
    import pytest

    from sparkx.ops.textstats import top_tokens

    # capacity 2 over a diverse stream: the k-th count cannot beat
    # N/capacity, so the operator must refuse rather than return a
    # possibly-incomplete top-k
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}x{j}" for j in range(20)), "en", 0)
         for i in range(30)],
        "doc_id long, text string, lang string, n_chars long",
    )
    with pytest.raises(ValueError, match="cannot be certified"):
        top_tokens(docs, k=3, capacity=2)
