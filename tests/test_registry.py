"""ExecutorRegistry (S8 model cache / O2 unload): once-per-process load
semantics, both in-process and through real Spark Python workers."""

from __future__ import annotations

import pandas as pd

from sparkx.registry import ExecutorRegistry


def test_registry_once_per_key_and_unload():
    ExecutorRegistry.unload()
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        return object()

    a = ExecutorRegistry.get("k1", factory)
    b = ExecutorRegistry.get("k1", factory)
    assert a is b and calls["n"] == 1
    ExecutorRegistry.get("k2", factory)
    assert calls["n"] == 2
    ExecutorRegistry.unload("k1")
    ExecutorRegistry.get("k1", factory)  # reload after explicit unload
    assert calls["n"] == 3
    st = ExecutorRegistry.stats()
    assert "k1" in str(st["loaded_keys"]) and st["pid"] > 0
    ExecutorRegistry.unload()
    assert ExecutorRegistry.stats()["loaded_keys"] == []


def test_registry_loads_once_per_spark_worker(spark):
    """Across a many-partition mapInPandas job, the factory must run once per
    Python WORKER PROCESS, not once per batch/partition."""

    def kernel(it):
        from sparkx.registry import ExecutorRegistry

        ExecutorRegistry.get(("codec", "test"), object)
        n_batches = sum(len(pdf) for pdf in it)
        st = ExecutorRegistry.stats()
        yield pd.DataFrame(
            {
                "pid": [st["pid"]],
                "loads": [st["load_counts"].get(str(("codec", "test")), 0)],
                "rows_seen": [n_batches],
            }
        )

    df = spark.range(0, 10_000, numPartitions=16)
    out = df.mapInPandas(kernel, schema="pid long, loads long, rows_seen long").toPandas()
    assert out.rows_seen.sum() == 10_000
    assert len(out) == 16  # one report row per partition
    # each worker process loaded the codec exactly once, regardless of how
    # many partitions it processed
    per_pid = out.groupby("pid").loads.max()
    assert (per_pid == 1).all(), per_pid.to_dict()
    # with 16 partitions on a local[4] test session, workers are reused
    assert out.pid.nunique() < 16
