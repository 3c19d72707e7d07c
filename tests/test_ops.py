"""Unit tests for the training-data ops against pure-Python reference
computations (independent of the DuckDB contract check)."""

from __future__ import annotations

import hashlib
import itertools
import math
import re

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_pdf():
    import pandas as pd

    return pd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def docs(spark, docs_pdf):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb_pdf():
    import pandas as pd

    return pd.read_parquet(f"{SF}/embeddings.parquet")


def _py_shingles(text: str, n: int = 3) -> set[str]:
    toks = re.split(r"\s+", text.strip().lower())
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_shingles_match_python(spark, docs, docs_pdf):
    from sparkx.ops.textstats import with_shingles

    got = {
        r["doc_id"]: set(r["shingles"])
        for r in with_shingles(docs).select("doc_id", "shingles").collect()
    }
    for _, row in docs_pdf.head(50).iterrows():
        assert got[row.doc_id] == _py_shingles(row.text), row.doc_id


def test_minhash_lsh_recall_vs_exact(spark, docs, docs_pdf):
    """LSH candidates verified with exact Jaccard must be a subset of the
    exact all-pairs result, with high recall at the threshold."""
    from sparkx.ops.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    exact = {
        (r.a_id, r.b_id): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }
    lsh = {
        (r.a_id, r.b_id): r.jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.2).collect()
    }
    assert set(lsh) <= set(exact)
    if exact:
        recall = len(lsh) / len(exact)
        assert recall >= 0.5, f"LSH recall too low: {recall:.2f} ({len(lsh)}/{len(exact)})"


def test_simhash_matches_python(spark, docs, docs_pdf):
    from sparkx.ops.dedup import with_simhash

    got = {r.doc_id: r.simhash for r in with_simhash(docs).collect()}

    def py_simhash(text: str) -> int:
        votes = [0] * 32
        for tok in re.split(r"\s+", text.strip().lower()):
            h = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
            for j in range(32):
                votes[j] += 1 if (h >> j) & 1 else -1
        return sum(1 << j for j in range(32) if votes[j] > 0)

    for _, row in docs_pdf.head(30).iterrows():
        assert got[row.doc_id] == py_simhash(row.text), row.doc_id


def test_ann_topk_matches_numpy(spark, emb_pdf):
    import numpy as np

    from sparkx.ops.similarity import topk_bruteforce

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = topk_bruteforce(emb, query_vec_id=0, k=10).collect()

    M = np.stack(emb_pdf.sort_values("vec_id")["embedding"].to_numpy()).astype(np.float64)
    ids = emb_pdf.sort_values("vec_id")["vec_id"].to_numpy()
    q = M[ids == 0][0]
    cos = M @ q / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
    order = sorted(
        [(round(c, 4), int(i)) for c, i in zip(cos, ids) if i != 0],
        key=lambda t: (-t[0], t[1]),
    )[:10]
    assert [(r.cosine, r.vec_id) for r in got] == order


def test_exact_dedup_groups(spark, docs, docs_pdf):
    from sparkx.ops.dedup import exact_dedup

    got = exact_dedup(docs).toPandas()
    # all texts distinct in this dataset → every group size 1, ids preserved
    norm = docs_pdf.text.str.replace(r"\s+", " ", regex=True).str.strip().str.lower()
    assert len(got) == norm.nunique()
    assert got.group_size.sum() == len(docs_pdf)


def test_multimodal_plumbing(spark, docs, docs_pdf):
    from sparkx.ops.multimodal import decode_media, documents_as_media, resize_plan

    media = documents_as_media(docs)
    dec = decode_media(media, fake_decode=True).toPandas()
    assert len(dec) == len(docs_pdf)
    assert dec.ok.all()
    assert dec.feature.map(len).eq(8).all()
    by_id = dec.set_index("media_id")
    for _, row in docs_pdf.head(20).iterrows():
        assert by_id.loc[row.doc_id, "digest"] == hashlib.md5(row.text.encode()).hexdigest()
    rp = resize_plan(media, max_dim=512).toPandas()
    assert (rp.out_width <= 512).all() and (rp.out_height <= 512).all()


def test_multimodal_real_decode_raises(spark, docs):
    from sparkx.ops.multimodal import decode_media, documents_as_media

    with pytest.raises(Exception) as ei:
        decode_media(documents_as_media(docs), fake_decode=False).limit(1).collect()
    assert "NotImplementedError" in str(ei.value) or "real media decode" in str(ei.value)
