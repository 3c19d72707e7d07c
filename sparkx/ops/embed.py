"""Embedder stage (SURVEY U7): the vector-store embed step
(reference ``src/core/store.py:45-77`` — e5-small, normalized, batch 32) with
the model swapped for a deterministic feature-hashing kernel, exactly as the
LLM stages were (SURVEY §7.3).  Contract preserved: input text =
``structured_text + "\\n\\n" + intuition_summary`` (store.py:54), output =
L2-normalized fixed-dim vector.

Two implementations with identical outputs:

* :func:`embed_weights` — pure column expressions (explode tokens → dim =
  md5-hash % D, sign = hash bit → integer weights) — SQL-oracle-verifiable.
* :func:`embed_vectors` — the same computation folded into a single
  Arrow-batched pandas kernel returning ``array<float>`` (the shape a real
  model embedder would slot into; batch size = ``embedder_batch_size``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DIM = 64


def embed_input(df: DataFrame) -> DataFrame:
    """store.py:54 — text fed to the embedder."""
    return df.withColumn(
        "embed_text",
        F.concat_ws("\n\n", F.col("structured_text"), F.col("intuition_summary")),
    )


def embed_weights(df: DataFrame, id_col: str = "chunk_id", text_col: str = "embed_text",
                  dim: int = DIM) -> DataFrame:
    """(id, dim, weight) rows: feature hashing with md5 — dim = first 8 hex
    chars % D, sign = 9th hex nibble parity.  Integer weights → exact
    cross-engine comparison."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).filter("tok != ''")
    hashed = toks.withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"))
    return (
        hashed.groupBy("id", (F.col("h") % dim).cast("int").alias("dim"))
        .agg(
            F.sum(
                F.when(F.conv(F.substring(F.md5("tok"), 9, 1), 16, 10).cast("int") % 2 == 0, 1)
                .otherwise(-1)
            ).alias("weight")
        )
    )


def _embed_kernel(dim: int, it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        vecs = np.zeros((len(pdf), dim), dtype=np.float64)
        for row_i, text in enumerate(pdf["embed_text"].fillna("")):
            for tok in str(text).lower().strip().split():
                d = hashlib.md5(tok.encode()).hexdigest()
                j = int(d[:8], 16) % dim
                vecs[row_i, j] += 1 if int(d[8], 16) % 2 == 0 else -1
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        out = pdf[["chunk_id"]].copy()
        out["embedding"] = list((vecs / norms).astype(np.float32))
        yield out


def embed_vectors(df: DataFrame, dim: int = DIM) -> DataFrame:
    """(chunk_id, embedding array<float>) — normalized, Arrow-batched.  NB the
    token loop here is the *stub standing in for the model forward pass*
    (store.py:55 ``encode(..., normalize_embeddings=True)``); a real embedder
    replaces the inner loop with one batched model call per Arrow batch."""
    import functools

    inp = embed_input(df).select("chunk_id", "embed_text")
    return inp.mapInPandas(
        functools.partial(_embed_kernel, dim),
        schema="chunk_id string, embedding array<float>",
    )


def _hash_forward(texts, dim: int) -> np.ndarray:
    """The deterministic 'forward pass' of the feature-hash stand-in model:
    texts (any str iterable) → L2-normalized float32 (n, dim).  Same math as
    :func:`_embed_kernel`, factored so the predict_batch_udf seam and the
    mapInPandas path can never diverge."""
    vecs = np.zeros((len(texts), dim), dtype=np.float64)
    for row_i, text in enumerate(texts):
        if text is None:
            continue
        for tok in str(text).lower().strip().split():
            d = hashlib.md5(tok.encode()).hexdigest()
            j = int(d[:8], 16) % dim
            vecs[row_i, j] += 1 if int(d[8], 16) % 2 == 0 else -1
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return (vecs / norms).astype(np.float32)


def make_embedder_udf(make_predict_fn=None, dim: int = DIM, batch_size: int = 32):
    """The MODEL SEAM (reference ``store.py:32-55``): a
    ``pyspark.ml.functions.predict_batch_udf`` with exactly the signature a
    real sentence-transformers checkpoint uses for batch inference —
    ``make_predict_fn() -> predict(texts: np.ndarray) -> np.ndarray`` of
    float32 ``(n, dim)``.  Spark's standard model-serving shape: the model
    loads ONCE per python worker (inside make_predict_fn, not per row),
    input rows arrive in ``batch_size`` chunks (32 = the reference's
    embedder batch, ``config.py:39``), output is an ``array<float>`` column.

    The default ``make_predict_fn`` is the deterministic feature-hash
    stand-in (:func:`_hash_forward` — this sandbox has no torch/
    sentence-transformers); swapping in multilingual-e5-small is exactly::

        def make_predict_fn():
            from sentence_transformers import SentenceTransformer
            m = SentenceTransformer("intfloat/multilingual-e5-small")
            return lambda texts: m.encode(
                list(texts), normalize_embeddings=True   # store.py:55
            ).astype("float32")

    — no plan change: the physical plan carries the same single
    ArrowEvalPython node either way (pinned by tests/test_embed_seam.py).
    """
    from pyspark.ml.functions import predict_batch_udf
    from pyspark.sql.types import ArrayType, FloatType

    if make_predict_fn is None:
        import functools

        def make_predict_fn(_fwd=functools.partial(_hash_forward, dim=dim)):
            return lambda texts: _fwd(texts)

    return predict_batch_udf(
        make_predict_fn,
        return_type=ArrayType(FloatType()),
        batch_size=batch_size,
    )


def embed_vectors_model(
    df: DataFrame,
    make_predict_fn=None,
    dim: int = DIM,
    batch_size: int = 32,
) -> DataFrame:
    """(chunk_id, embedding array<float>) via the :func:`make_embedder_udf`
    seam — the production embed stage: S5's vector-store input built by a
    batched model UDF instead of the mapInPandas demo kernel.  With the
    default (no model) it is value-identical to :func:`embed_vectors`."""
    udf = make_embedder_udf(make_predict_fn, dim=dim, batch_size=batch_size)
    return (
        embed_input(df)
        .select("chunk_id", "embed_text")
        .withColumn("embedding", udf(F.col("embed_text")))
        .drop("embed_text")
    )
