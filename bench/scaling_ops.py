"""Multi-operator N vs 4N scaling evidence (VERDICT r4 item 8).

``bench/scaling.py`` measures the flagship extraction path; this harness
measures the three operator families whose physical shape is DIFFERENT from
a narrow map pipeline — the ones a 1000-executor deployment would stress:

* ``funnel_gopher`` — the full corpus-build funnel (extract → exact-dedup
  self-join → Gopher rule battery → sample): MapInPandas + one groupBy/join
  shuffle over the extracted frame.
* ``pagerank``      — distributed fixed-iteration PageRank (forced past the
  driver fast path): 2 shuffles × iters over the edge frame, the iterative
  worst case.
* ``minhash_pairs`` — MinHash-LSH near-dup pairs: shingle explode → band
  shuffle → candidate self-join → hashed-shingle verify join, the
  widest-shuffle operator in the suite.

Methodology is identical to ``scaling.py`` (same machine, one pinned JVM per
config via ``taskset``, warm pass then timed pass inside each JVM, N/4N
alternated per trial, median of per-trial paired wall ratios — the sandbox's
co-tenant noise is multiplicative on a minutes scale, so paired ratios are
the unbiased estimator).  Inputs are synthesized deterministically into
/dev/shm once and shared by every config (seeded numpy; no wall-clock or
RNG inside the measured region).

Sizing rule (BENCH/BASELINE.md, learned r1): the 4N wall must be ≥ ~20 s or
fixed per-job overhead (scheduling, Python-worker spin-up, final agg) reads
as a scaling loss.  Defaults below are calibrated for that on this machine;
override with SPARKX_SCALING_OPS_{TURNS,NODES,DOCS,TRIALS}.

Usage: python bench/scaling_ops.py            # appends to BENCH/BASELINE.md
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ── deterministic input synthesis (parent process, numpy, cached) ──────────


def _shm(name: str) -> str:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    return f"{base}/sparkx_scaling_ops_{name}"


def ensure_transcripts(turns: int) -> str:
    """Reuse scaling.py's cached transcript input (same generator, same
    seed) so the funnel measurement shares the extraction headline's input
    shape."""
    sys.path.insert(0, os.path.join(REPO, "bench"))
    import scaling as S

    return S.ensure_input(turns)


def ensure_edges(n_nodes: int, deg: int = 8) -> str:
    """Power-law-free deterministic multigraph: node i links to
    (i*K_j + C_j) mod n for j < deg (distinct odd multipliers → full-period
    permutations, so in-degree is uniform and the shuffle is skew-free:
    this measures the engine's scaling, not a skew pathology — skew has its
    own diagnosis op)."""
    path = _shm(f"edges_{n_nodes}x{deg}")
    if os.path.isdir(path):
        return path
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = np.repeat(np.arange(n_nodes, dtype=np.int64), deg)
    mults = np.array([1103515245, 22695477, 1664525, 69069,
                      134775813, 214013, 16807, 48271][:deg], dtype=np.int64)
    offs = np.arange(deg, dtype=np.int64) * 1234567 + 12345
    dst = (np.arange(n_nodes, dtype=np.int64)[:, None] * mults[None, :]
           + offs[None, :]) % n_nodes
    tbl = pa.table({"src": src, "dst": dst.reshape(-1)})
    os.makedirs(path, exist_ok=True)
    # row_group_size bounds scan parallelism: Spark splits parquet at row-
    # group boundaries, so a single-row-group file = a single scan task at
    # ANY core count (caught live in r5: the docs input below shipped ONE
    # 400k-row group and the whole shingle/sketch stage ran single-task in
    # both configs, reading as a total scaling failure of the OP)
    pq.write_table(tbl, f"{path}/edges.parquet",
                   row_group_size=max(65536, n_nodes * deg // 64))
    return path


def ensure_docs(n_docs: int, dup_frac: float = 0.1) -> str:
    """Synthetic near-dup corpus: vocab-8k word sequences of 40-80 words;
    ``dup_frac`` of docs are near-copies of an earlier doc with 3 words
    swapped (Jaccard ≈ 0.9 → caught by the 0.5-threshold banding), the rest
    are independent draws (Jaccard ≈ 0 → band collisions are the rare-pair
    noise floor).  Pair structure is PAIRS, not cliques, so the candidate
    set is O(n·dup_frac) — the healthy-corpus shape (the dup-clique
    pathology is measured separately in BENCH/R3_NOTES.md)."""
    path = _shm(f"docs_{n_docs}_{int(dup_frac * 100)}")
    if os.path.isdir(path):
        return path
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(42)
    vocab = np.array([f"w{i:04d}" for i in range(8000)])
    lens = rng.randint(40, 81, size=n_docs)
    texts: list[str] = []
    n_dup = int(n_docs * dup_frac)
    for i in range(n_docs):
        if i >= n_docs - n_dup:
            base = texts[i - (n_docs - n_dup)].split(" ")
            for p in rng.randint(0, len(base), size=3):
                base[p] = vocab[rng.randint(0, len(vocab))]
            texts.append(" ".join(base))
        else:
            texts.append(" ".join(vocab[rng.randint(0, len(vocab), size=lens[i])]))
    tbl = pa.table({"doc_id": pa.array(range(n_docs), type=pa.int64()),
                    "text": texts})
    os.makedirs(path, exist_ok=True)
    # 64 row groups — see the edges writer note: one row group = one scan
    # task no matter how many executors the job has
    pq.write_table(tbl, f"{path}/docs.parquet",
                   row_group_size=max(4096, n_docs // 64))
    return path


def ensure_vectors(n_vecs: int, dim: int = 8) -> str:
    """Synthetic embedding table for the semdedup scaling leg: seeded
    normal dim-8 vectors (dim 8, not 64, so the interpreted per-pair dot
    is cheap enough to size the PAIR count as the dominant cost — the
    quantity whose scaling is under test).  The 128 scaling centroids are
    drawn in the runner from a fixed seed; cell sizes spread ~3.6× (real
    Voronoi volume variance — the skew a production SemDeDup shuffle
    actually sees)."""
    path = _shm(f"vecs_{n_vecs}x{dim}")
    if os.path.isdir(path):
        return path
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(7)
    v = rng.normal(size=(n_vecs, dim)).astype(np.float64)
    tbl = pa.table({
        "vec_id": pa.array(range(n_vecs), type=pa.int64()),
        "embedding": pa.array(v.tolist(), type=pa.list_(pa.float64())),
    })
    os.makedirs(path, exist_ok=True)
    # 64 row groups — see the edges writer note
    pq.write_table(tbl, f"{path}/vecs.parquet",
                   row_group_size=max(4096, n_vecs // 64))
    return path


# ── per-op runner (child process, pinned, warm + timed pass in one JVM) ────

RUNNER = """
import os, sys, time, json
sys.path.insert(0, {repo!r})
cpus, op, path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
from sparkx.session import build_session
spark = build_session("sparkx-scaling-ops", master=f"local[{{cpus}}]",
                      shuffle_partitions=2 * cpus)
spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")

def work():
    if op == "funnel_gopher":
        from sparkx.pipeline import extract_blocks
        from sparkx.corpus_build import corpus_flags
        t = spark.read.parquet(path)
        # SPARKX_FUNNEL_PERSIST_MODE drives the cache-layer A/B that pins
        # the funnel's local-mode scaling ceiling on the BlockManager
        # (BENCH/BASELINE.md): "none" trades a second extraction pass for
        # zero cache traffic — if THAT scales like the flagship while
        # "cache" stays at ~0.55, the ceiling is the cache layer, not the
        # operator DAG
        cf = corpus_flags(extract_blocks(t, n_partitions=2 * cpus),
                          min_tokens=5, max_tokens=5000, sample_rate=0.5,
                          salt="corpus0", quality_mode="gopher",
                          persist_mode=os.environ.get(
                              "SPARKX_FUNNEL_PERSIST_MODE", "cache"))
        with cf as flagged:
            return flagged.count()
    if op == "pagerank":
        from sparkx.ops.graph import pagerank
        e = spark.read.parquet(path + "/edges.parquet")
        pr = pagerank(e, iters=5, driver_edges_threshold=0)
        return pr.count()
    if op == "minhash_pairs":
        from sparkx.ops.dedup import minhash_lsh_pairs
        d = spark.read.parquet(path + "/docs.parquet")
        return minhash_lsh_pairs(d, n=3, threshold=0.5).count()
    if op == "semdedup":
        import numpy as np
        from pyspark.sql import functions as F
        from sparkx.ops.dedup import semdedup
        rng = np.random.RandomState(11)
        cents = rng.normal(size=(128, 8))
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
        e = spark.read.parquet(path + "/vecs.parquet")
        # SPARKX_SEMDEDUP_BLOCKS=1 measures the plain cell-keyed join (the
        # granularity-capped layout); >1 the fragment-replicate blocked join
        sd = semdedup(e, centroids=cents.tolist(), threshold_e6=990_000,
                      n_blocks=int(os.environ.get("SPARKX_SEMDEDUP_BLOCKS", "8")))
        # a bare count() lets Catalyst prune the ENTIRE pair branch of the
        # left-joined aggregate (caught live in r5: 4.2G pairs "in" 2.3 s);
        # filtering on is_kept forces the aggregate
        return sd.filter(~F.col("is_kept")).count()
    raise SystemExit(f"unknown op {{op}}")

work()                        # warm pass (scan cache, codegen, Python workers)
t0 = time.time(); n = work(); wall = time.time() - t0
print(json.dumps({{"wall": wall, "rows": n}}))
spark.stop()
"""


def run_once(cpus: int, op: str, path: str) -> dict:
    cmd = [sys.executable, "-c", RUNNER.format(repo=REPO),
           str(cpus), op, path]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    load0 = os.getloadavg()[0]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True,
                         cwd=REPO)
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    r = json.loads(line)
    # load BEFORE the leg approximates the ambient (co-tenant) level; load
    # after mixes our own just-finished job into the 1-min average.  Both
    # recorded so trials can be classified clean/contaminated post hoc.
    r["load_before"] = round(load0, 2)
    r["load_after"] = round(os.getloadavg()[0], 2)
    return r


def _wait_quiet(threshold: float, max_wait_s: float) -> float:
    """Block until the 1-min load average drops below ``threshold`` (the
    co-tenant storms on this box run in minutes-scale bursts — waiting a
    few minutes for a quiet window beats measuring through a burst), or
    give up after ``max_wait_s`` and measure anyway (the per-leg ambient
    record marks the trial).  Returns the load at release."""
    t0 = time.time()
    while True:
        load = os.getloadavg()[0]
        if load < threshold or time.time() - t0 > max_wait_s:
            return load
        print(f"quiet-gate: ambient load {load:.1f} >= {threshold} — "
              f"waiting ({int(time.time() - t0)}s)", file=sys.stderr)
        time.sleep(30)


def measure_pair(op: str, path: str, n: int, n4: int, trials: int) -> dict:
    quiet_gate = float(os.environ.get("SPARKX_SCALING_QUIET_GATE", "0"))
    quiet_max_wait = float(os.environ.get("SPARKX_SCALING_QUIET_MAX_WAIT", "900"))
    walls: dict[int, list[float]] = {n: [], n4: []}
    loads: dict[int, list[float]] = {n: [], n4: []}
    rows = None
    for i in range(trials):
        for cpus in (n, n4):  # alternate to decorrelate the noise factor
            if quiet_gate > 0:
                # per-LEG gate: also absorbs our own previous leg's 1-min
                # load-average decay, so "ambient before leg" is truly
                # ambient and every leg starts on a quiet machine
                _wait_quiet(quiet_gate, quiet_max_wait)
            r = run_once(cpus, op, path)
            walls[cpus].append(r["wall"])
            loads[cpus].append(r["load_before"])
            if rows is None:
                rows = r["rows"]
            elif r["rows"] != rows:
                raise SystemExit(
                    f"{op}: output rows changed across configs "
                    f"({rows} vs {r['rows']}) — not the same computation")
            print(f"{op} trial {i + 1} local[{cpus}] "
                  f"(pinned 0-{cpus - 1}): {r['wall']:.2f}s "
                  f"(ambient load before leg {r['load_before']:.1f}, "
                  f"after {r['load_after']:.1f})", file=sys.stderr)
    paired = [a / b for a, b in zip(walls[n], walls[n4])]
    speedup = statistics.median(paired)
    return {
        "op": op,
        "rows": rows,
        "N": n, "4N": n4,
        "walls_N": [round(w, 2) for w in walls[n]],
        "walls_4N": [round(w, 2) for w in walls[n4]],
        "ambient_load_N": loads[n],
        "ambient_load_4N": loads[n4],
        "median_wall_N": round(statistics.median(walls[n]), 2),
        "median_wall_4N": round(statistics.median(walls[n4]), 2),
        "paired_speedups": [round(x, 3) for x in paired],
        "speedup": round(speedup, 3),
        "efficiency": round(speedup / 4, 3),
    }


def main() -> int:
    turns = int(os.environ.get("SPARKX_SCALING_OPS_TURNS", 3_200_000))
    nodes = int(os.environ.get("SPARKX_SCALING_OPS_NODES", 2_000_000))
    docs = int(os.environ.get("SPARKX_SCALING_OPS_DOCS", 400_000))
    vecs = int(os.environ.get("SPARKX_SCALING_OPS_VECS", 200_000))
    trials = int(os.environ.get("SPARKX_SCALING_OPS_TRIALS", 5))
    only = sys.argv[1:] or ["funnel_gopher", "pagerank", "minhash_pairs",
                            "semdedup"]

    inputs = {
        "funnel_gopher": (lambda: ensure_transcripts(turns), f"{turns:,} turns"),
        "pagerank": (lambda: ensure_edges(nodes), f"{nodes:,} nodes × deg 8, 5 iters"),
        "minhash_pairs": (lambda: ensure_docs(docs), f"{docs:,} docs, 10% near-dup"),
        "semdedup": (lambda: ensure_vectors(vecs),
                     f"{vecs:,} dim-8 vectors, 128 cells (~156M pairs)"),
    }
    results = []
    t0 = time.time()
    load0 = os.getloadavg()[0]
    for op in only:
        gen, label = inputs[op]
        path = gen()
        res = measure_pair(op, path, 4, 16, trials)
        res["input"] = label
        results.append(res)
        print(json.dumps(res), file=sys.stderr)

    summary = {
        "trials": trials,
        "funnel_persist_mode": os.environ.get("SPARKX_FUNNEL_PERSIST_MODE",
                                              "cache"),
        "wall_total_sec": round(time.time() - t0, 1),
        "load_avg_start": round(load0, 2),
        "load_avg_end": round(os.getloadavg()[0], 2),
        "ops": {r["op"]: r["efficiency"] for r in results},
        "min_efficiency": min(r["efficiency"] for r in results),
        "target": 0.8,
        "pass": all(r["efficiency"] >= 0.8 for r in results),
    }
    # single-op re-measures should NOT clobber the composite ledger:
    # point SPARKX_SCALING_OPS_OUT at a per-run artifact instead
    out = os.environ.get(
        "SPARKX_SCALING_OPS_OUT",
        os.path.join(REPO, "BENCH", "scaling_ops_last.json"),
    )
    with open(out, "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=1)
    print(json.dumps(summary))
    return 0 if summary["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
