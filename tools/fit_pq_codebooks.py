"""Regenerate the frozen product-quantization codebook artifact.

Fits the PQ codebooks ONCE — m=4 subvectors × ks=16 codewords, plain
deterministic Lloyd k-means in numpy (seeded farthest-point-free init:
evenly-strided sorted sample, 25 fixed iterations) — on the sf0.01
embeddings table and writes ``sparkx/data/pq_codebooks.json``.  This is the
one-time INDEX BUILD of the PQ layout (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 §II): everything
downstream — ``pq_encode``, the ADC probe, the ``ann_pq`` driver query and
its DuckDB oracle — treats the codebooks as frozen literals, the production
shape (a quantizer trained on a sample, shipped with the index).

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
OUT = os.path.join(REPO, "sparkx", "data", "pq_codebooks.json")

M_SUBVECTORS = 4
KS = 16
N_ITER = 25


def _kmeans(x, k: int, n_iter: int):
    """Deterministic Lloyd's: init = every (n//k)-th point of the
    lexicographically sorted sample (no RNG at all), then fixed
    iterations; empty clusters re-seeded to the point farthest from its
    centroid (ties to lowest index)."""
    import numpy as np

    order = np.lexsort(x.T[::-1])
    cents = x[order[:: max(1, len(x) // k)][:k]].astype(np.float64).copy()
    for _ in range(n_iter):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(k):
            mask = assign == j
            if mask.any():
                cents[j] = x[mask].mean(axis=0)
            else:
                far = d[np.arange(len(x)), assign].argmax()
                cents[j] = x[far]
    return cents


def main() -> int:
    import numpy as np
    import pandas as pd

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    x = np.array(emb["embedding"].tolist(), dtype=np.float64)
    dim = x.shape[1]
    assert dim % M_SUBVECTORS == 0, (dim, M_SUBVECTORS)
    d_sub = dim // M_SUBVECTORS
    books = []
    for m in range(M_SUBVECTORS):
        sub = x[:, m * d_sub : (m + 1) * d_sub]
        cents = _kmeans(sub, KS, N_ITER)
        books.append([[float(v) for v in c] for c in cents])
    obj = {
        "comment": (
            "Product-quantization codebooks (Jégou et al. TPAMI 2011), "
            f"fitted ONCE (m={M_SUBVECTORS} subvectors × ks={KS} codewords, "
            f"deterministic Lloyd {N_ITER} iters, RNG-free strided init) on "
            + SF_DIR
            + "/embeddings.parquet and FROZEN as the production quantizer "
            "artifact (regenerate: python tools/fit_pq_codebooks.py).  The "
            "ann_pq driver query and its DuckDB oracle both inline these "
            "literals, making encode + ADC probe SQL-expressible."
        ),
        "m": M_SUBVECTORS,
        "ks": KS,
        "d_sub": d_sub,
        "n_iter": N_ITER,
        "fit_input": SF_DIR + "/embeddings.parquet",
        "codebooks": books,
    }
    with open(OUT, "w") as f:
        json.dump(obj, f, indent=1)
    print(f"wrote {OUT}: m={M_SUBVECTORS} ks={KS} d_sub={d_sub}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
