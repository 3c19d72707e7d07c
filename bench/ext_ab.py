"""Isolated A/B timing for the extraction volume queries (guide §1.4).

Times surviving(extract_blocks(...)).count() on the persisted synthetic
bench input for fastpath and agentic modes, N repeats each, printing one
JSON line.  Usage: python bench/ext_ab.py [tag] [repeats]
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
    from sparkx.pipeline import extract_blocks, surviving
    from sparkx.session import build_session
    from sparkx.synth import synth_spark

    tag = sys.argv[1] if len(sys.argv) > 1 else "run"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session("ext-ab", master=f"local[{CPUS}]",
                          shuffle_partitions=2 * CPUS)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    vol_path = f"{base}/sparkx_bench_input_{TURNS}"
    if not os.path.isdir(vol_path):
        synth_spark(spark, n_convs=TURNS // 100, turns_per_conv=100,
                    n_partitions=2 * CPUS).write.mode("overwrite").parquet(vol_path)
    t = spark.read.parquet(vol_path)
    # warm python workers + JIT
    surviving(extract_blocks(t)).count()
    out = {"tag": tag, "load": round(os.getloadavg()[0], 2)}
    for mode in ("fastpath", "agentic"):
        walls = []
        for _ in range(reps):
            t0 = time.time()
            surviving(
                extract_blocks(t, mode=mode, validate=True, emit_raw=False)
            ).count()
            walls.append(round(time.time() - t0, 3))
        out[mode] = walls
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
