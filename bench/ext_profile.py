"""Component profile of the extraction volume query (guide §1.4 noop-style
isolation): times the bare scan, the native branch alone, the kernel branch
alone, and the full union, per mode.  Usage: python bench/ext_profile.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
TURNS = int(os.environ.get("SPARKX_BENCH_TURNS", 1_600_000))


def main() -> int:
    from pyspark.sql import functions as F

    from sparkx.pipeline import (
        _COMPLEX_PRED,
        _kernel,
        _native_fig_pred,
        _native_tab1_pred,
        extract_blocks,
        surviving,
    )
    from sparkx.session import build_session

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = build_session("ext-prof", master=f"local[{CPUS}]",
                          shuffle_partitions=2 * CPUS)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    t = spark.read.parquet(f"{base}/sparkx_bench_input_{TURNS}")
    surviving(extract_blocks(t)).count()  # warm

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out = {"load": round(os.getloadavg()[0], 2)}

    def timed(name, fn):
        walls = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            walls.append(round(time.time() - t0, 3))
        out[name] = walls

    import functools

    claimed = _native_fig_pred(F.col("text")) | _native_tab1_pred(F.col("text"))
    kern_in = t.filter(F.expr(_COMPLEX_PRED) & ~claimed)
    timed("scan_count", lambda: t.count())
    timed("scan_noop_text", lambda: noop(t.select("text")))
    timed("route_counts", lambda: kern_in.count())
    for mode in ("fastpath", "agentic"):
        full = extract_blocks(t, mode=mode, validate=True, emit_raw=False)
        kb = kern_in.mapInPandas(
            functools.partial(_kernel, mode, True, False),
            schema="conv_id string, turn_idx int, role string, tool string, "
                   "ts timestamp, chunk_type string, block_rank int, "
                   "block_idx int, structured_text string, "
                   "intuition_summary string, key_concepts array<string>, "
                   "confidence double, agent_notes string, retried boolean, "
                   "is_valid boolean, issues array<string>, "
                   "verdict_score double, validator_notes string, "
                   "was_corrected boolean, status string",
        )
        from sparkx.pipeline import _native_routed_blocks

        native_in = t.filter(
            ~F.expr(f"coalesce({_COMPLEX_PRED}, false)")
            | F.coalesce(claimed, F.lit(False))
        )
        nb = _native_routed_blocks(native_in, mode, True, False)
        timed(f"{mode}_kernel_branch", lambda kb=kb: noop(kb))
        timed(f"{mode}_native_branch", lambda nb=nb: noop(nb))
        timed(f"{mode}_full_surv_count",
              lambda full=full: surviving(full).count())
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
