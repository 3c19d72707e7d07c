"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine.  All native column expressions (md5 is the cross-engine
hash so every operator is DuckDB-oracle-verifiable).

Algorithms follow the published formulations: MinHash resemblance sketches
(Broder, "On the resemblance and containment of documents", 1997) with
banded LSH (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets ch. 3);
SimHash (Charikar, "Similarity estimation techniques from rounding
algorithms", STOC 2002; Manku et al., "Detecting near-duplicates for web
crawling", WWW 2007 — the banded Hamming search); random-hyperplane sign LSH
for embeddings (Charikar 2002).

Scale notes (100 TB):

* ``exact_dedup`` — one shuffle on the 16-byte fingerprint; map-side partial
  aggregation applies.  This is THE baseline dedup for web-scale corpora.
* ``ngram_jaccard_pairs`` — exact all-pairs via a shared-shingle join;
  quadratic in bucket size, so it is the *verification* path.  At scale use
  ``minhash_lsh_pairs`` which bounds candidates per band-bucket.
* ``minhash_lsh_pairs`` — K minhashes / b bands of r rows: candidate iff a
  band matches (P[candidate] ≈ 1-(1-j^r)^b); candidates then verified with
  true Jaccard.  Shuffles are on (band, bucket) keys — bounded and salted by
  the hash itself; AQE skew-join handles pathological buckets.
* ``simhash_pairs`` — 32-bit SimHash, 4 bands × 8 bits: by pigeonhole, any
  pair with Hamming distance ≤ 3 shares ≥ 1 intact band, so the banded join
  finds ALL such pairs (no recall loss), then the exact popcount filter
  applies.
* ``embedding_near_dup_pairs`` — exact cosine over bucketed candidates (sign
  LSH); brute-force variant for verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkx.ops.textstats import fingerprint, with_shingles

MINHASH_K = 16
MINHASH_BANDS = 4  # r = K/BANDS = 4 rows per band
SIMHASH_BITS = 32
SIMHASH_BANDS = 4


# ── exact dedup ──────────────────────────────────────────────────────────────
def exact_dedup(docs: DataFrame) -> DataFrame:
    """Keep the lowest doc_id per normalized-content fingerprint; report
    group size.  groupBy on md5 → map-side combine, one bounded shuffle."""
    return (
        docs.select("doc_id", fingerprint().alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("group_size"),
        )
    )


# ── n-gram Jaccard (exact verification path) ────────────────────────────────
def _pair_jaccard(sh: DataFrame, threshold: float) -> DataFrame:
    """Candidate pairs already joined as (a_id, b_id, a_sh, b_sh) → verified
    Jaccard ≥ threshold."""
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size("a_sh") + F.size("b_sh") - inter
    jac = inter / F.greatest(union, F.lit(1))
    return (
        sh.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact near-dup pairs by token n-gram Jaccard.  Candidates = pairs
    sharing ≥1 shingle (shared-shingle equi-join), then exact verification."""
    sh = with_shingles(docs, n=n).select("doc_id", "shingles")
    posting = sh.select(F.col("doc_id"), F.explode("shingles").alias("sh"))
    cand = (
        posting.alias("a")
        .join(posting.alias("b"), "sh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    joined = (
        cand.join(sh.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("a_sh")), "a_id")
        .join(sh.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_sh")), "b_id")
    )
    return _pair_jaccard(joined, threshold)


# ── MinHash + LSH (scale path) ───────────────────────────────────────────────
def with_minhash(docs: DataFrame, n: int = 3, k: int = MINHASH_K) -> DataFrame:
    """K min-hashes per doc: mh_i = lexicographic MIN over shingles of
    md5(i ‖ '|' ‖ shingle).  Hex-string min is engine-portable (no int
    conversion), uniform, and deterministic."""
    sh = with_shingles(docs, n=n)
    return sh.withColumn(
        "minhash",
        F.expr(
            f"transform(sequence(0, {k - 1}), "
            f"i -> array_min(transform(shingles, s -> md5(concat(cast(i as string), '|', s)))))"
        ),
    )


def lsh_bands(mh: DataFrame, bands: int = MINHASH_BANDS, k: int = MINHASH_K) -> DataFrame:
    """(doc_id, band, bucket) rows: bucket = md5 of the band's minhash slice."""
    r = k // bands
    return mh.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> md5(concat_ws(',', slice(minhash, b*{r} + 1, {r}))))"
            )
        ).alias("band", "bucket"),
    )


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard."""
    mh = with_minhash(docs, n=n)
    bb = lsh_bands(mh)
    cand = (
        bb.alias("a")
        .join(bb.alias("b"), ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    sh = mh.select("doc_id", "shingles")
    joined = (
        cand.join(sh.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("a_sh")), "a_id")
        .join(sh.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_sh")), "b_id")
    )
    return _pair_jaccard(joined, threshold)


# ── SimHash ──────────────────────────────────────────────────────────────────
def with_simhash(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """32-bit SimHash over whitespace tokens.  Token hash = first 8 hex chars
    of md5 → BIGINT (conv base16); bit j of the simhash = sign of the sum of
    (±1) votes.  Explode+groupBy keeps it fully native (no UDF)."""
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    ).withColumn("h", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sim = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = bit if sim is None else sim + bit
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """All pairs with Hamming(simhash) ≤ max_hamming via 8-bit banding
    (lossless for ≤3 of 32 bits by pigeonhole) + exact popcount filter."""
    sim = with_simhash(docs)
    bands = sim.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 8 * b).bitwiseAND(F.lit(255))
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band", "key"),
    )
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


# ── embedding cosine near-dup ────────────────────────────────────────────────
def _cosine(a: str, b: str):
    dot = F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0 as double), (acc, v) -> acc + v)"
    )
    na = F.expr(
        f"aggregate({a}, cast(0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double))"
    )
    nb = F.expr(
        f"aggregate({b}, cast(0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double))"
    )
    return dot / F.sqrt(na * nb)


def embedding_near_dup_pairs(
    emb: DataFrame, threshold: float = 0.9, bucketed: bool = True
) -> DataFrame:
    """Pairs with cosine ≥ threshold.  ``bucketed=True`` restricts candidates
    to pairs sharing the 4-bit sign bucket of dims 1–4 (sign-LSH; the scale
    path).  ``bucketed=False`` is the exact brute-force verification path."""
    e = emb.select("vec_id", "embedding")
    if bucketed:
        bucket = sum(
            F.when(F.element_at("embedding", i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(4)
        )
        e = e.withColumn("bucket", bucket)
        pairs = e.alias("a").join(e.alias("b"), "bucket")
    else:
        pairs = e.alias("a").crossJoin(e.alias("b"))
    return (
        pairs.filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            F.round(_cosine("a.embedding", "b.embedding"), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
