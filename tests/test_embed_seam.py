"""The predict_batch_udf embedder seam (VERDICT r4 #7; reference contract
store.py:32-55): a real model must drop into the embed stage without plan
changes, and the default feature-hash stand-in must be value-identical to
the mapInPandas demo kernel."""

from __future__ import annotations

import re

import numpy as np
from pyspark.sql import functions as F


def _chunks(spark):
    rows = [
        ("c1", "hash join builds a table", "summary of joins"),
        ("c2", "vector scan reads pages", None),
        ("c3", "", ""),
        ("c4", None, "only a summary"),
    ]
    return spark.createDataFrame(
        rows, "chunk_id string, structured_text string, intuition_summary string"
    )


def test_seam_default_matches_mapinpandas_kernel(spark):
    """embed_vectors_model (predict_batch_udf seam, default stand-in) is
    value-identical to embed_vectors (mapInPandas kernel) — both float32,
    same normalization, same NULL/empty handling."""
    from sparkx.ops.embed import embed_vectors, embed_vectors_model

    df = _chunks(spark)
    a = {r.chunk_id: r.embedding for r in embed_vectors(df).collect()}
    b = {r.chunk_id: r.embedding for r in embed_vectors_model(df).collect()}
    assert set(a) == set(b) == {"c1", "c2", "c3", "c4"}
    for cid in a:
        np.testing.assert_array_equal(
            np.asarray(a[cid], dtype=np.float32),
            np.asarray(b[cid], dtype=np.float32),
            err_msg=cid,
        )
        # normalized (or the all-zero empty-text vector)
        n = float(np.linalg.norm(np.asarray(a[cid], dtype=np.float64)))
        assert abs(n - 1.0) < 1e-6 or n == 0.0


def _plan_shape(df) -> list[str]:
    """Physical node sequence (detail-block headers, the CLAUDE.md-safe way
    to read explain('formatted')), with plan-instance ids stripped."""
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return re.findall(r"^\(\d+\) ([A-Za-z0-9_ ]+)", plan, re.M)


def test_stub_model_drops_in_without_plan_changes(spark):
    """A different 'model' (a stub standing in for e5-small: same
    make_predict_fn shape, different weights) produces the IDENTICAL
    physical node sequence — swapping models is a pure predict-fn swap,
    never a plan change."""
    from sparkx.ops.embed import embed_vectors_model

    DIM = 8

    def make_stub_model():
        # a fake "checkpoint": deterministic projection of text length —
        # loads 'weights' once per worker, like a real model would
        w = np.arange(1, DIM + 1, dtype=np.float32)

        def predict(texts):
            lens = np.array(
                [0.0 if t is None else float(len(str(t))) for t in texts],
                dtype=np.float32,
            )
            out = lens[:, None] * w[None, :]
            norms = np.linalg.norm(out, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            return (out / norms).astype(np.float32)

        return predict

    df = _chunks(spark)
    default = embed_vectors_model(df)
    stub = embed_vectors_model(df, make_predict_fn=make_stub_model, dim=DIM)
    assert _plan_shape(default) == _plan_shape(stub)
    # exactly one Python-eval node in the plan (batched Arrow UDF, not
    # row-at-a-time): the embed stage costs one python exchange, period
    nodes = _plan_shape(stub)
    py_nodes = [n for n in nodes if "Python" in n or "Arrow" in n]
    assert len(py_nodes) == 1, nodes

    got = {r.chunk_id: r.embedding for r in stub.collect()}
    v1 = np.asarray(got["c1"], dtype=np.float32)
    assert v1.shape == (DIM,) and abs(float(np.linalg.norm(v1)) - 1.0) < 1e-6
    # stub semantics: direction is the fixed w regardless of text length
    v2 = np.asarray(got["c2"], dtype=np.float32)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)


def test_seam_batch_size_respected(spark):
    """predict sees inputs in ≤batch_size chunks (the reference's batch 32 →
    here 3 to force multiple batches on 8 rows)."""
    from sparkx.ops.embed import embed_vectors_model

    seen: list[int] = []

    def make_spy():
        def predict(texts):
            # executed on workers; assert the invariant locally per call
            assert len(texts) <= 3, f"batch of {len(texts)} exceeds batch_size"
            return np.zeros((len(texts), 4), dtype=np.float32)

        return predict

    rows = [(f"c{i}", f"text {i}", None) for i in range(8)]
    df = spark.createDataFrame(
        rows, "chunk_id string, structured_text string, intuition_summary string"
    ).coalesce(1)
    out = embed_vectors_model(df, make_predict_fn=make_spy, dim=4, batch_size=3)
    assert out.count() == 8
