"""Dump .explain("formatted") for named driver queries to files.

Usage: python tools/plan_snap.py OUTDIR TAG [sf_dir] query [query...]
Writes OUTDIR/<query>_<TAG>.txt for each query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir, tag = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3]
    names = sys.argv[4:]
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as E
    from sparkx.session import build_session

    import tempfile

    spark = build_session(
        "plan-snap", master="local[4]", shuffle_partitions=8,
        warehouse=tempfile.mkdtemp(prefix="plans_wh_"),
    )

    def fmt(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    qs = E.queries()
    for name in names:
        if name == "ext_volume":
            # the bench volume query shape (extraction over a synth scan)
            from sparkx.pipeline import extract_blocks, surviving
            from sparkx.synth import synth_spark

            tdir = tempfile.mkdtemp(prefix="plansnap_") + "/t"
            synth_spark(spark, 50, 20, n_partitions=2).write.mode(
                "overwrite"
            ).parquet(tdir)
            t = spark.read.parquet(tdir)
            df = surviving(extract_blocks(t, mode="fastpath", emit_raw=False))
        else:
            df = qs[name](spark, sf_dir)
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(fmt(df))
        print("wrote", name)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
