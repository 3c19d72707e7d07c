"""spark-submit entry for the end-to-end corpus build funnel.

    spark-submit --py-files dist/sparkx.zip jobs/corpus_build.py \
        --input <transcripts parquet> --output <out> \
        [--sample-rate 0.5 --min-tokens 20 --min-quality 0.3] \
        [--dedup-mode minhash --jaccard-threshold 0.5] \
        [--synth-convs 1000 --synth-turns 100]

Prints one JSON line with the funnel counts
(blocks_in → after_dedup → after_quality → after_sample).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="sparkx corpus build")
    p.add_argument("--input")
    p.add_argument("--output", required=True)
    p.add_argument("--mode", choices=["fastpath", "agentic"], default="fastpath")
    p.add_argument("--min-tokens", type=int, default=20)
    p.add_argument("--max-tokens", type=int, default=5000)
    p.add_argument("--min-quality", type=float, default=0.3)
    p.add_argument("--sample-rate", type=float, default=1.0)
    p.add_argument("--salt", default="corpus0")
    p.add_argument("--dedup-mode", choices=["exact", "minhash"], default="exact",
                   help="minhash additionally resolves near-dup clusters and "
                        "keeps one canonical per cluster")
    p.add_argument("--jaccard-threshold", type=float, default=0.5)
    p.add_argument("--quality-mode", choices=["score", "gopher"], default="score",
                   help="gopher swaps the score gate for the MassiveText "
                        "rule battery (min/max-tokens become its word-count "
                        "bounds; --min-quality is ignored)")
    p.add_argument("--run-id", default=None)
    p.add_argument("--master", default=None)
    p.add_argument("--synth-convs", type=int, default=0)
    p.add_argument("--synth-turns", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    from sparkx.corpus_build import build_corpus
    from sparkx.session import build_session
    from sparkx.synth import synth_spark

    spark = build_session("sparkx-corpus", master=args.master)
    try:
        if args.synth_convs:
            transcripts = synth_spark(
                spark, args.synth_convs, args.synth_turns, seed=args.seed
            )
        elif args.input:
            transcripts = spark.read.parquet(args.input)
        else:
            p.error("--input or --synth-convs required")
        t0 = time.time()
        funnel = build_corpus(
            spark,
            transcripts,
            args.output,
            mode=args.mode,
            min_tokens=args.min_tokens,
            max_tokens=args.max_tokens,
            min_quality=args.min_quality,
            sample_rate=args.sample_rate,
            salt=args.salt,
            run_id=args.run_id or f"corpus_{int(time.time())}",
            dedup_mode=args.dedup_mode,
            jaccard_threshold=args.jaccard_threshold,
            quality_mode=args.quality_mode,
        )
        print(json.dumps({**funnel, "wall_sec": round(time.time() - t0, 2)}))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
