"""Per-executor resource registry — S8 model cache + O2 sequential unload.

The reference caches loaded models in a process-level singleton so repeated
agent calls never re-load (``src/core/cache.py:25-104`` ModelCache: dict of
loaded instances keyed by model id) and frees unused ones to bound memory
(``cleanup_unused_models``, :106-130; the pipeline loads/unloads agents
sequentially for the same reason).

On Spark the process that needs this is the PYTHON WORKER, not the driver:
an Arrow kernel (mapInPandas/mapInArrow) runs in a pool of worker processes,
each of which sees many batches and many tasks over a job.  The executor
analog of the reference's singleton is therefore a module-global registry
inside each worker — ``ExecutorRegistry.get(key, factory)`` runs ``factory``
at most once per (worker process, key) no matter how many batches stream
through, and ``unload`` drops instances when a stage is done with them.
Spark reuses Python workers across tasks (``spark.python.worker.reuse``
defaults true), so the cache amortizes across the whole job, exactly like
the reference's per-process cache amortizes across documents.

Nothing here talks to Spark: it is deliberately a plain-process primitive so
the same code works under mapInPandas, applyInPandas, foreachBatch, or unit
tests.
"""

from __future__ import annotations

import os
import threading
from collections.abc import Callable
from typing import Any


class ExecutorRegistry:
    """Process-level keyed singleton cache (thread-safe: local-mode executors
    may run several task threads in one worker).  Loads take a PER-KEY lock
    so a slow factory for one model never serializes loads of unrelated
    keys; the class lock only guards the dictionaries."""

    _lock = threading.Lock()
    _key_locks: dict[Any, threading.Lock] = {}
    _instances: dict[Any, Any] = {}
    _load_counts: dict[Any, int] = {}

    @classmethod
    def get(cls, key: Any, factory: Callable[[], Any]) -> Any:
        """Return the cached instance for ``key``, building it with
        ``factory`` exactly once per process (ModelCache.load_* semantics,
        cache.py:44-62)."""
        with cls._lock:
            if key in cls._instances:
                return cls._instances[key]
            klock = cls._key_locks.setdefault(key, threading.Lock())
        with klock:  # concurrent loads of DIFFERENT keys proceed in parallel
            with cls._lock:
                if key in cls._instances:
                    return cls._instances[key]
            instance = factory()
            with cls._lock:
                cls._instances[key] = instance
                cls._load_counts[key] = cls._load_counts.get(key, 0) + 1
            return instance

    @classmethod
    def unload(cls, key: Any | None = None) -> None:
        """Drop one instance (or all) — the sequential load/unload analog
        (cache.py:106-130, O2): bounds worker memory between stages."""
        with cls._lock:
            if key is None:
                cls._instances.clear()
            else:
                cls._instances.pop(key, None)

    @classmethod
    def stats(cls) -> dict:
        """Observability hook: pid + per-key load counts (a kernel can emit
        these as columns to audit one-load-per-worker behavior)."""
        with cls._lock:
            return {
                "pid": os.getpid(),
                "loaded_keys": sorted(map(str, cls._instances)),
                "load_counts": {str(k): v for k, v in cls._load_counts.items()},
            }
