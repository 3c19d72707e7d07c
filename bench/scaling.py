"""Two-parallelism scaling evidence (north_rule: ≥0.8 efficiency N → 4N).

No real cluster exists in this sandbox, so cluster sizes N and 4N are proxied
by ``local[8]`` vs ``local[32]`` — same machine, same deterministic input,
separate JVMs.  Each configuration runs ≥3 trials of the fastpath extraction
pipeline over an identical synthetic transcript table (generated on the
executors, materialized before timing so only extraction is measured);
medians are reported.

    efficiency = (throughput_32 / throughput_8) / (32 / 8)

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from sparkx.session import build_session
from sparkx.pipeline import extract_blocks, surviving
from sparkx.synth import synth_spark
cpus = int(sys.argv[1]); turns = int(sys.argv[2])
spark = build_session("sparkx-scaling", master=f"local[{{cpus}}]",
                      shuffle_partitions=2 * cpus)
t = synth_spark(spark, n_convs=turns // 100, turns_per_conv=100,
                n_partitions=2 * cpus)
t.persist().count()
t0 = time.time()
n = surviving(extract_blocks(t, mode="fastpath")).count()
wall = time.time() - t0
print(json.dumps({{"wall": wall, "turns": turns, "blocks": n}}))
spark.stop()
"""


def run_once(cpus: int, turns: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", RUNNER.format(repo=REPO), str(cpus), str(turns)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    turns = int(os.environ.get("SPARKX_SCALING_TURNS", 200_000))
    trials = int(os.environ.get("SPARKX_SCALING_TRIALS", 3))
    results = {}
    for cpus in (8, 32):
        walls = []
        for i in range(trials):
            r = run_once(cpus, turns)
            walls.append(r["wall"])
            print(f"local[{cpus}] trial {i + 1}: {r['wall']:.2f}s "
                  f"({turns / r['wall']:.0f} turns/s)", file=sys.stderr)
        med = statistics.median(walls)
        results[cpus] = {
            "walls": [round(w, 3) for w in walls],
            "median_wall": round(med, 3),
            "turns_per_sec": round(turns / med, 1),
        }
    speedup = results[32]["turns_per_sec"] / results[8]["turns_per_sec"]
    efficiency = speedup / (32 / 8)
    summary = {
        "turns": turns,
        "trials": trials,
        "local8": results[8],
        "local32": results[32],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
        "pass": efficiency >= 0.8,
    }

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE — scaling evidence (N vs 4N proxy)

Generated {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())} by `bench/scaling.py`.

North_rule criterion: ≥0.8 throughput scaling efficiency between N and 4N
executors.  No real cluster exists in this sandbox, so N→4N is proxied by
`local[8]` → `local[32]` (same machine, separate JVMs, identical deterministic
input, pinned seed, input materialized before timing, {trials} trials, medians).

| config | trial walls (s) | median wall (s) | throughput (turns/s) |
|---|---|---|---|
| local[8] (N) | {results[8]['walls']} | {results[8]['median_wall']} | {results[8]['turns_per_sec']} |
| local[32] (4N) | {results[32]['walls']} | {results[32]['median_wall']} | {results[32]['turns_per_sec']} |

* input: {turns:,} synthetic transcript turns (sparkx.synth.synth_spark, seed 42),
  fastpath extraction + Checkpoint-A, count of surviving blocks as the action.
* speedup (4N vs N): **{speedup:.2f}×** (ideal 4×)
* **scaling efficiency: {efficiency:.3f}** (target ≥ 0.8 → {"PASS" if efficiency >= 0.8 else "FAIL"})

Caveat (bench honesty, SURVEY §7.6): a single-machine core-count sweep shares
memory bandwidth and page cache between "clusters"; on a real 4N-executor
cluster the extraction stage is embarrassingly parallel after the salt
repartition (no cross-executor traffic except the final counts), so the
single-machine figure is a lower bound on cluster efficiency for this stage.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
