"""Paired A/B for the narrow-input spread (CLAUDE.md noise discipline:
alternate configs in ONE session, median of paired ratios).

Variant A = spread disabled (identity monkeypatch), B = spread enabled.
Each round times every probe query under A then B (order alternating per
round), so co-tenant drift hits both variants equally in expectation.

Usage: python bench/ab_spread.py [rounds]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PROBES = [
    # heavy per-row map work (expected spread winners)
    "dedup_minhash_lsh", "dedup_simhash", "fp_winnow", "ta_top_tokens",
    "ann_pq", "cur_embed_decontam", "dedup_semdedup", "ann_bm25",
    "ext_text_blocks", "p11_prompt_build",
    # trivial aggregates (expected spread losers / neutral)
    "tb_rollup", "cur_mixture", "p6_safe_json", "cur_hll_batches",
    "cohort_retention", "w2_topk_per_group",
]


def main() -> int:
    import sparkx.session as SS
    import __spark_entry__ as E
    from sparkx.session import build_session

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = build_session("ab-spread", master=f"local[{CPUS}]",
                          shuffle_partitions=2 * CPUS)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
    qs = E.queries()

    real_spread = SS.spread_narrow_input

    def identity(df, min_parts: int = 8):
        return df

    def set_variant(on: bool):
        fn = real_spread if on else identity
        SS.spread_narrow_input = fn
        E.spread_narrow_input = fn

    # warm both variants once
    for on in (False, True):
        set_variant(on)
        qs["dedup_minhash_lsh"](spark, SF_DIR).count()

    results = {name: {"A": [], "B": []} for name in PROBES}
    for r in range(rounds):
        order = [False, True] if r % 2 == 0 else [True, False]
        for on in order:
            set_variant(on)
            key = "B" if on else "A"
            for name in PROBES:
                t0 = time.time()
                qs[name](spark, SF_DIR).count()
                results[name][key].append(round(time.time() - t0, 3))
    set_variant(True)

    report = {}
    for name in PROBES:
        a, b = results[name]["A"], results[name]["B"]
        ratios = sorted(bb / aa for aa, bb in zip(a, b))
        report[name] = {
            "A_med": round(statistics.median(a), 3),
            "B_med": round(statistics.median(b), 3),
            "ratio_med": round(statistics.median(ratios), 3),
            "A": a, "B": b,
        }
    print(json.dumps({"load": round(os.getloadavg()[0], 2),
                      "rounds": rounds, "probes": report}, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
