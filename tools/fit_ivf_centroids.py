"""Regenerate the frozen IVF coarse-quantizer artifact.

Fits k-means ONCE (sparkx.ops.similarity.ivf_assign — KMeans k=8, seed=7,
maxIter=10) on the sf0.01 embeddings table and writes the centroids to
``sparkx/data/ivf_centroids.json``.  The fit is the one-time INDEX BUILD of
the IVF layout (Jégou et al. TPAMI 2011); everything downstream — the
``ann_ivf`` driver query, its DuckDB oracle, the bench probe path — treats
the centroids as a frozen artifact inlined as literals, which is exactly the
production shape (a quantizer trained on a sample, shipped with the index).

Run only when the fit parameters or the sf0.01 embeddings change; the
artifact is checked in so correctness gates never depend on k-means
reproducibility.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = os.path.join(REPO, "sparkx", "data", "ivf_centroids.json")


def main() -> int:
    from pyspark.sql import SparkSession

    from sparkx.ops.similarity import ivf_assign

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    _, centroids = ivf_assign(emb, n_centroids=8, seed=7, max_iter=10)
    cents = [
        [float(x) for x in r.centroid]
        for r in sorted(centroids.collect(), key=lambda r: r.ivf_cell)
    ]
    obj = {
        "comment": (
            "IVF coarse-quantizer centroids, fitted ONCE via "
            "sparkx.ops.similarity.ivf_assign (KMeans k=8, seed=7, "
            "maxIter=10) on " + SF_DIR + "/embeddings.parquet and FROZEN "
            "as the production quantizer artifact (regenerate: python "
            "tools/fit_ivf_centroids.py). The ann_ivf driver query and its "
            "DuckDB oracle both inline these literals, making "
            "assignment+probe+scoring SQL-expressible."
        ),
        "n_centroids": 8,
        "seed": 7,
        "max_iter": 10,
        "fit_input": SF_DIR + "/embeddings.parquet",
        "centroids": cents,
    }
    with open(OUT, "w") as f:
        json.dump(obj, f, indent=1)
    print(f"wrote {OUT}: {len(cents)} centroids, dim {len(cents[0])}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
