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
  the hash itself; AQE skew-join handles pathological buckets.  Minhashes
  use ONE md5 per shingle + double hashing (Kirsch–Mitzenmacher), not K
  md5s — the hash pass is the dominant cost at corpus scale.
* ``simhash_pairs`` — 64-bit SimHash (Manku et al. WWW 2007), 4 bands × 16
  bits: by pigeonhole, any pair with Hamming distance ≤ 3 shares ≥ 1 intact
  band, so the banded join finds ALL such pairs (no recall loss), then the
  exact popcount filter applies.  64 bits / 16-bit band keys keep band
  buckets sparse at web scale (the 32-bit/8-bit r1 variant saturated at
  ~10^5 docs per band key).
* ``embedding_near_dup_pairs`` — banded sign-LSH (n_bands bands × nbits sign
  bits over disjoint dim ranges), union of band collisions, exact cosine
  verify.  Brute-force variant for verification only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkx.ops.textstats import fingerprint, with_shingles

MINHASH_K = 16
MINHASH_BANDS = 4  # r = K/BANDS = 4 rows per band
SIMHASH_BITS = 64  # Manku et al. (WWW 2007) use 64-bit fingerprints
SIMHASH_BANDS = 4  # 4 × 16-bit bands — lossless for Hamming ≤ 3
EMB_LSH_BITS = 16  # sign bits per band → 2^16 buckets per band (scale default)
EMB_LSH_BANDS = 4  # bands over disjoint dim ranges; candidate iff ANY matches


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


def priority_dedup(docs: DataFrame, priority: list[str],
                   source_col: str = "source") -> DataFrame:
    """Exact dedup with a source-priority canonical pick: among documents
    sharing a normalized-content fingerprint, keep the one from the
    highest-priority source (order of ``priority``, e.g. curated > news >
    web crawl — the standard production rule when the same text arrives
    from several feeds); unlisted sources rank after all listed ones, ties
    broken by lowest doc_id, so the pick is total and deterministic.

    Execution: one groupBy on the md5 fingerprint with a struct-min
    aggregate ``min(struct(rank, doc_id, source))`` — map-side combinable
    like `exact_dedup` (contrast a row_number window over fp, which cannot
    partial-aggregate and single-tasks hot fingerprints).  Output:
    (fp, keep_doc_id, keep_source, group_size)."""
    rank = F.lit(len(priority))
    for i, s in reversed(list(enumerate(priority))):
        rank = F.when(F.col("_src") == s, F.lit(i)).otherwise(rank)
    return (
        docs.select(
            "doc_id", F.col(source_col).alias("_src"),
            fingerprint().alias("fp"),
        )
        .groupBy("fp")
        .agg(
            F.min(
                F.struct(
                    rank.alias("r"), F.col("doc_id"), F.col("_src")
                )
            ).alias("b"),
            F.count("*").alias("group_size"),
        )
        .select(
            "fp",
            F.col("b.doc_id").alias("keep_doc_id"),
            F.col("b._src").alias("keep_source"),
            "group_size",
        )
    )


def incremental_dedup(new_docs: DataFrame, corpus: DataFrame) -> DataFrame:
    """Incremental-ingest exact dedup: of a NEW batch, keep only documents
    whose normalized-content fingerprint appears neither in the existing
    CORPUS nor earlier (by min doc_id) within the batch itself — the batch
    path an append-only training-data pipeline runs on every ingest (the
    streaming twin is streaming_dedup's first-seen state machine).

    Execution: within-batch canonical pick = groupBy(fp).min(doc_id)
    (map-side combinable), then ONE left_anti join against the corpus
    fingerprint set.  Both shuffles are on the 32-char fingerprint; the
    corpus side projects a single column so a 100 TB corpus contributes
    only its fp column to the exchange (or a bloom/broadcast when small —
    AQE decides).  Returns ``(fp, doc_id, batch_dups)`` — surviving new
    docs with their within-batch duplicate counts."""
    batch = (
        new_docs.select("doc_id", fingerprint().alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("doc_id"),
            (F.count("*") - 1).alias("batch_dups"),
        )
    )
    seen = corpus.select(fingerprint().alias("fp"))
    return batch.join(seen, "fp", "left_anti").select("fp", "doc_id", "batch_dups")


def line_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_chars: int = 2,
) -> DataFrame:
    """Corpus-wide line-level exact dedup with document reassembly — the
    CCNet paragraph-dedup rung (Wenzek et al., "CCNet: Extracting high
    quality monolingual datasets from web crawl data", LREC 2020): hash
    every line of every document, keep only the FIRST occurrence of each
    line corpus-wide (ordered by ``(doc_id, line position)``), and rebuild
    each document from its surviving lines.  This removes boilerplate that
    repeats *across* pages (nav bars, cookie banners, footers) that
    document-level dedup can never touch.

    Lines shorter than ``min_chars`` are exempt (always kept): hashing
    empty/one-char lines would collapse every blank separator in the corpus
    onto its first page.

    Execution: posexplode → groupBy on ``md5(line)`` (map-side combinable
    ``min(struct(doc_id, pos))`` canonical pick — NOT a row_number window,
    which would single-task hot boilerplate lines) → join back on the hash
    → ordered per-doc reassembly via ``array_sort(collect_list(struct))``.
    Shuffles are on the 32-char line hash and on ``doc_id`` — both bounded.
    At 100 TB the line-hash exchange carries (hash, doc_id, pos) triples
    only, never the line text twice.

    Returns one row per input document: ``(doc_id, text, lines_in,
    lines_kept, lines_cut)`` — documents whose every line was cut survive
    with empty ``text``.
    """
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("pos", "line"),
    )
    elig = lines.filter(F.length("line") >= min_chars).withColumn(
        "lkey", F.md5(F.col("line"))
    )
    first = elig.groupBy("lkey").agg(
        F.min(F.struct("doc_id", "pos")).alias("keeper")
    )
    kept = (
        elig.join(first, "lkey")
        .filter(
            (F.col("doc_id") == F.col("keeper.doc_id"))
            & (F.col("pos") == F.col("keeper.pos"))
        )
        .select("doc_id", "pos", "line")
        .unionByName(lines.filter(F.length("line") < min_chars))
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_sort(F.collect_list(F.struct("pos", "line"))).alias("_arr"),
        F.count("*").alias("lines_kept"),
    )
    totals = lines.groupBy("doc_id").agg(F.count("*").alias("lines_in"))
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(
                F.array_join(
                    F.transform("_arr", lambda s: s["line"]), "\n"
                ),
                F.lit(""),
            ).alias("text"),
            "lines_in",
            F.coalesce(F.col("lines_kept"), F.lit(0)).cast("long").alias(
                "lines_kept"
            ),
            (
                F.col("lines_in")
                - F.coalesce(F.col("lines_kept"), F.lit(0))
            ).cast("long").alias("lines_cut"),
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


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                        max_shingle_df: int | None = 10_000) -> DataFrame:
    """Exact near-dup pairs by token n-gram Jaccard.  Candidates = pairs
    sharing ≥1 shingle (shared-shingle equi-join), then exact verification.

    ``max_shingle_df`` is the posting-list frequency cap (the standard
    stop-shingle trick): shingles appearing in more than this many docs are
    dropped from the CANDIDATE join only — without it, one boilerplate
    shingle ("of the and") shared by n docs produces n² candidate rows.
    Verification still uses the full shingle sets, so reported Jaccard values
    are exact; the only recall loss is a pair whose EVERY shared shingle is
    hot (such pairs overlap mostly in boilerplate and are below any useful
    threshold in practice).  ``None`` disables the cap (the brute-exact
    verification path)."""
    sh = with_shingles(docs, n=n).select("doc_id", "shingles")
    posting = sh.select(F.col("doc_id"), F.explode("shingles").alias("sh"))
    if max_shingle_df is not None:
        hot = (
            posting.groupBy("sh")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("sh")
        )
        posting = posting.join(F.broadcast(hot), "sh", "left_anti")
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


def shared_ngram_stats(docs: DataFrame, n: int = 3) -> DataFrame:
    """Per-document CROSS-corpus duplication signal: for each doc, the
    fraction of its distinct token ``n``-gram shingles that also appear in
    at least one OTHER document — the corpus-level complement of the
    within-doc repetition fractions (textstats.gopher_rules).  A high
    ``shared_frac`` marks boilerplate-heavy near-duplicate material that
    pairwise dedup may keep (each pair below threshold) but that still
    drags a training mix; MassiveText-family builds use exactly this
    signal to rank sources by redundancy.

    Relational shape (no pairs, no quadratic anywhere): shingle document
    frequencies via one map-side-combinable ``groupBy(shingle).count()``
    (shingles are DISTINCT per doc, so count(*) IS the doc frequency), a
    join back to the posting list, and a per-doc aggregate — two bounded
    shuffles on (shingle) and one on (doc_id).  A viral stop-shingle makes
    a hot join key; that join is equi-join-shaped, so AQE skew-join splits
    it at runtime (and only the ``df > 1`` BIT is consumed downstream, so
    a capped/sketched df would also do — kept exact here because the gate
    oracle is exact).  Docs with fewer than ``n`` tokens have no shingles
    and report ``(0, 0, 0.0)`` via the left join, matching the SQL oracle's
    coalesce."""
    sh = with_shingles(docs, n=n).select("doc_id", "shingles")
    posting = sh.select("doc_id", F.explode("shingles").alias("s"))
    df_ = posting.groupBy("s").agg(F.count("*").alias("df"))
    per_doc = (
        posting.join(df_, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("df") > 1).cast("long")).alias("n_shared"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0).cast("long")).alias("n_shingles"),
            F.coalesce("n_shared", F.lit(0).cast("long")).alias("n_shared"),
        )
        .withColumn(
            "shared_frac",
            F.when(F.col("n_shingles") <= 0, F.lit(0.0)).otherwise(
                F.round(F.col("n_shared") / F.col("n_shingles"), 4)
            ),
        )
    )


def repeated_span_pairs(
    docs: DataFrame,
    n: int = 5,
    min_span_tokens: int = 10,
    max_shingle_df: int | None = 10_000,
) -> DataFrame:
    """Substring-level duplication: for each doc pair sharing at least one
    token ``n``-gram, the LONGEST run of consecutive shared n-grams —
    reported as ``span_tokens = run + n - 1``, the length of the longest
    shared token substring — filtered to ``span_tokens >= min_span_tokens``.
    This is the signal behind suffix-array substring dedup (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better", ACL 2022):
    two documents can be far apart by whole-document Jaccard yet still share
    a 1,000-token boilerplate block that should be cut once, not trained on
    twice.

    Suffix arrays don't distribute; this is the relational equivalent.
    POSITIONAL shingles (doc_id, pos, shingle — NOT distinct, unlike the
    Jaccard path) meet in a shared-shingle equi-join; a shared shingle at
    positions (pa, pb) lies on diagonal ``pa − pb``, and a run of
    consecutive shared shingles is a maximal consecutive-``pa`` stretch on
    one diagonal — grouped in one pass with the classic gaps-and-islands
    key ``pa − row_number()`` (no iteration, no per-row Python).  Shuffles:
    the shingle join (AQE-skew-splittable), one window + aggregate on
    (pair, diagonal), one aggregate on pair.

    ``max_shingle_df`` is the posting-cap (stop-shingle) guard from
    :func:`ngram_jaccard_pairs`: without it one viral n-gram makes a
    quadratic candidate set.  Capping can only SPLIT a reported run (a run
    through a dropped hot shingle is seen as two shorter runs), never
    invent one — recall-safe for spans whose every window is hot-free.
    At corpus scale the string shingle would ride the shuffle as an 8-byte
    hash (the hashed-verify precedent in minhash_lsh_pairs); kept as the
    string here because the DuckDB gate oracle joins on shingle equality."""
    from sparkx.session import spread_narrow_input

    docs = spread_narrow_input(docs)  # 1-task narrow scans serialize the map
    runs = _diag_runs(_positional_posting(docs, n, max_shingle_df))
    return (
        runs.groupBy("a_id", "b_id")
        .agg(F.max("run").alias("max_run"))
        .select(
            "a_id",
            "b_id",
            (F.col("max_run") + F.lit(n - 1)).alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= min_span_tokens)
    )


def _positional_posting(
    docs: DataFrame, n: int, max_shingle_df: int | None
) -> DataFrame:
    """(doc_id, pos, s): ALL positional token n-gram shingles (not distinct
    — position matters), with the optional stop-shingle posting cap.  The
    token array is Generate-barrier-bound (see with_shingles)."""
    split_expr = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    d = docs.select("doc_id", F.explode(F.array(split_expr)).alias("_toks"))
    parts = ", ' ', ".join(f"_toks[i+{k}]" for k in range(n))
    posting = (
        d.filter(F.expr(f"size(_toks) >= {n}"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(_toks) - {n}), "
                    f"i -> concat({parts}))"
                )
            ).alias("pos", "s"),
        )
    )
    if max_shingle_df is not None:
        hot = (
            posting.groupBy("s")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("s")
        )
        posting = posting.join(F.broadcast(hot), "s", "left_anti")
    return posting


def _diag_runs(posting: DataFrame) -> DataFrame:
    """Maximal runs of consecutive shared shingles per (pair, diagonal):
    (a_id, b_id, diag, run_start, run) where ``run_start`` is the a-side
    position of the run's first shingle and ``run`` its shingle count.
    The b-side start is ``run_start − diag``.  One shared-shingle join +
    one PARTITIONED window (gaps-and-islands) + one aggregate."""
    a = posting.select(
        F.col("doc_id").alias("a_id"), F.col("pos").alias("apos"), "s"
    )
    b = posting.select(
        F.col("doc_id").alias("b_id"), F.col("pos").alias("bpos"), "s"
    )
    matches = (
        a.join(b, "s")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "apos", (F.col("apos") - F.col("bpos")).alias("diag"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("a_id", "b_id", "diag").orderBy("apos")
    return (
        matches.withColumn("grp", F.col("apos") - F.row_number().over(w))
        .groupBy("a_id", "b_id", "diag", "grp")
        .agg(F.min("apos").alias("run_start"), F.count("*").alias("run"))
        .drop("grp")
    )


def cut_repeated_spans(
    docs: DataFrame,
    n: int = 5,
    min_span_tokens: int = 10,
    max_shingle_df: int | None = 10_000,
) -> DataFrame:
    """The actionable half of substring dedup (Lee et al., ACL 2022 cut the
    spans, not the documents): remove every shared token span of at least
    ``min_span_tokens`` from the NON-canonical side of each pair (the
    higher doc_id — the min-id copy keeps its text, mirroring every other
    canonical-pick in this module), and return one row per input doc with
    the whitespace-normalized cleaned text and the number of tokens cut.

    Pipeline, all relational: diagonal runs (:func:`_diag_runs`) →
    b-side token intervals → per-doc INTERVAL MERGE (a doc cut by several
    partners has overlapping spans; classic running-max gaps-and-islands
    over a window PARTITIONED by doc_id, so no global window) → cut-span
    arrays joined back to the corpus (left join: most docs are untouched)
    → token filter + reassembly as native array lambdas.  The per-token
    ``exists`` over the span array is an interpreted HOF, but it runs only
    on the CUT docs (the join probe side) and span arrays are tiny after
    merging — the hot path (uncut docs) is a codegen'd concat_ws.

    Output text is whitespace-normalized (single spaces) for ALL rows —
    the same canonical form the dedup fingerprints use — so cut and uncut
    rows are directly comparable and the cross-engine oracle is exact."""
    from sparkx.session import spread_narrow_input

    docs = spread_narrow_input(docs)  # 1-task narrow scans serialize the map
    runs = _diag_runs(_positional_posting(docs, n, max_shingle_df))
    spans = runs.filter(F.col("run") + F.lit(n - 1) >= min_span_tokens).select(
        F.col("b_id").alias("doc_id"),
        (F.col("run_start") - F.col("diag")).alias("s"),
        (F.col("run_start") - F.col("diag") + F.col("run") + F.lit(n - 2)).alias("e"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    merged = (
        spans.withColumn(
            "_new",
            F.when(
                prev_max_e.isNull() | (F.col("s") > prev_max_e + 1), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "_island",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("doc_id", "_island")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )
    cuts = merged.groupBy("doc_id").agg(
        F.collect_list(F.struct(F.col("s"), F.col("e"))).alias("_spans")
    )
    out = (
        docs.join(cuts, "doc_id", "left")
        .select(
            "doc_id",
            F.explode(
                F.array(F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), r"\s+"))
            ).alias("_arr"),
            "_spans",
        )
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN _spans IS NULL THEN _arr "
                "ELSE transform(filter(sequence(0, size(_arr) - 1), "
                "i -> NOT exists(_spans, sp -> i >= sp.s AND i <= sp.e)), "
                "i -> _arr[i]) END"
            ).alias("_kept"),
            F.size("_arr").alias("_n_in"),
        )
        .select(
            "doc_id",
            F.concat_ws(" ", F.col("_kept")).alias("text_clean"),
            (F.col("_n_in") - F.size("_kept")).cast("long").alias("n_tokens_cut"),
        )
    )
    return out


# ── MinHash + LSH (scale path) ───────────────────────────────────────────────
def minhash_sketches(docs: DataFrame, n: int = 3, k: int = MINHASH_K,
                     shingled: DataFrame | None = None) -> DataFrame:
    """(doc_id, minhash array<bigint>) via double hashing
    (Kirsch–Mitzenmacher): each shingle is md5'd ONCE into two 32-bit halves
    (h1, h2); the k-th hash is min over shingles of h1 + k·h2 (< 2^36, no
    overflow).

    Execution shape matters more than the formula here: shingles are
    EXPLODED to rows, the hash halves are plain codegen'd column
    expressions, and the K minima are K ``min`` aggregates in one groupBy —
    whole-stage codegen end to end with map-side partial aggregation, ONE
    bounded shuffle on doc_id.  The obvious alternative (nested
    higher-order-function transforms over the shingle array) is interpreted
    per element and Catalyst inlines the shared md5 subexpression into the
    K-loop — measured 16× the hash work and ~30× the wall time at sf0.1.
    explode_outer keeps empty-shingle docs (all-NULL sketch, matching
    list_min([]) = NULL in the DuckDB oracle).

    ``shingled``: pass a precomputed with_shingles frame to share the
    shingle definition with a caller that also needs the arrays."""
    sh = shingled if shingled is not None else with_shingles(docs, n=n)
    posting = sh.select("doc_id", F.explode_outer("shingles").alias("s"))
    h1 = F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5("s"), 9, 8), 16, 10).cast("long")
    aggs = [F.min(h1 + F.lit(i) * h2).alias(f"_mh{i}") for i in range(k)]
    return (
        posting.groupBy("doc_id")
        .agg(*aggs)
        .select(
            "doc_id",
            F.array(*[F.col(f"_mh{i}") for i in range(k)]).alias("minhash"),
        )
    )


def with_minhash(docs: DataFrame, n: int = 3, k: int = MINHASH_K) -> DataFrame:
    """Shingles + minhash sketch per doc (one shingle definition, shared with
    the sketch aggregation) — prefer minhash_sketches when the shingle
    arrays aren't needed downstream; it avoids the join."""
    sh = with_shingles(docs, n=n)
    return sh.join(minhash_sketches(docs, n=n, k=k, shingled=sh), "doc_id")


def lsh_bands(mh: DataFrame, bands: int = MINHASH_BANDS, k: int = MINHASH_K) -> DataFrame:
    """(doc_id, band, bucket) rows: bucket = md5 of the band's minhash slice
    (decimal-stringified — engine-portable).

    Empty-shingle docs (all-NULL sketch: <n tokens) are filtered out BEFORE
    banding: concat_ws skips NULLs, so every such doc would hash to the same
    md5('') bucket in every band — a quadratic candidate self-join among
    short docs at corpus scale.  Correctness is unaffected (an empty shingle
    set can never reach any Jaccard threshold; the verify stage dropped those
    candidates anyway) — this only removes the candidate blowup."""
    r = k // bands
    mh = mh.filter(F.element_at("minhash", 1).isNotNull())
    return mh.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> md5(concat_ws(',', transform(slice(minhash, b*{r} + 1, {r}), "
                f"x -> cast(x as string)))))"
            )
        ).alias("band", "bucket"),
    )


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.
    The band branch needs only the sketches (no shingle payload crosses the
    banding shuffle); shingle arrays are attached to the candidate set only,
    once per side — and as 60-bit HASHED longs, not strings: the verify
    join's cost at scale is shuffling two shingle arrays per candidate pair
    (a dup-riddled corpus emits O(d²) pairs per d-member dup group — 6.7M
    pairs measured from 3.8k near-identical docs), so shrinking each element
    from a ~20-char string to 8 bytes cuts the dominant shuffle ~2.5×.
    Set Jaccard is unchanged: shingles are distinct per doc and a within-pair
    md5 collision (~2.5k elements into 2^60) has probability ~2^-40.  The
    hashing transform is interpreted per element but runs once per DOC; the
    savings accrue per PAIR.  ``ngram_jaccard_pairs`` keeps string shingles
    as the brute-exact verification path."""
    bb = lsh_bands(minhash_sketches(docs, n=n))
    cand = (
        bb.alias("a")
        .join(bb.alias("b"), ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    hashed = F.expr(
        "transform(shingles, s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint))"
    )
    sh = with_shingles(docs, n=n).select("doc_id", hashed.alias("shingles"))
    joined = (
        cand.join(sh.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("a_sh")), "a_id")
        .join(sh.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_sh")), "b_id")
    )
    return _pair_jaccard(joined, threshold)


# ── near-dup cluster resolution (connected components) ──────────────────────
def _cc_driver_union_find(base: DataFrame) -> DataFrame:
    """Resolve a BOUNDED pair set on the driver with union-find (path
    compression + union-by-min-root, so the final root of every component is
    its minimum node id — byte-identical to the distributed min-label
    result).  Called only below ``driver_pairs_threshold``: near-dup pair
    sets are tiny relative to the corpus (the quadratic blowup lives in the
    LSH bucket join upstream, already bounded), so the common case is a few
    thousand pairs where ~16 fixed-overhead iterative Spark jobs cost far
    more than one collect of the edges."""
    id_type = base.schema["u"].dataType
    edges = [(r.u, r.v) for r in base.collect()]
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru  # larger root under smaller → root stays the min
    nodes = sorted({x for e in edges for x in e})
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField("node_id", id_type, False),
         StructField("cluster_id", id_type, False)]
    )
    return base.sparkSession.createDataFrame(
        [(x, find(x)) for x in nodes], schema
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 25,
    driver_pairs_threshold: int = 1 << 20,
) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate CLUSTERS: one
    ``(node_id, cluster_id)`` row per node appearing in any pair, where
    ``cluster_id`` is the minimum node id in the node's connected component —
    the canonical representative a corpus build keeps.

    Algorithm: iterative min-label propagation with pointer doubling (the
    alternating-min-join family — Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC 2014).  Each round does
    (1) a propagate join — every node offers its current label to each
    neighbor, min-aggregated (map-side combinable),
    (2) a path-halving join — ``label ← label(label)`` — which is what turns
    O(diameter) rounds into O(log n): a chain of length 2^k collapses in ~k
    rounds, and
    (3) an edge CONTRACTION — edges are rewritten onto current labels and
    intra-cluster edges dropped (``label(u) == label(v)``).  Contraction is
    what makes the DENSE case cheap: a near-dup clique — the shape a
    dup-riddled crawl actually produces, where a d-member dup group emits
    O(d²) verified pairs — is uniformly labeled after round 1, so its whole
    quadratic edge set vanishes from every later round.  Without it, each
    round re-joins the full pair set against the labels (measured 130 s for
    6.7M pairs over 3.7k nodes at local[8]; with contraction the second
    round sees ~0 edges).  Each round is bounded shuffles on node id /
    label; frames are localCheckpoint'd per round so the plan does not grow
    with iterations (on a real cluster use a reliable checkpoint dir).

    Convergence: the contracted edge frame is EMPTY exactly when the
    quotient graph is uniformly labeled per component — the per-round edge
    count, needed anyway, is the convergence signal (no separate
    changed-label pass).  Labels then form a pointer FOREST (chains are
    strictly decreasing node ids, so acyclic): nodes that stopped appearing
    as quotient-edge endpoints hold stale pointers like ``7→2→1``.  A final
    pointer-doubling compression (``label ← label(label)`` until no row
    changes) resolves every chain; chains from one component always meet —
    any dropped edge's endpoints share a label at drop time, so their
    chains pass through a common value — and every chain's fixpoint is the
    component minimum ``m`` (``label(m) == m`` forever; labels only
    decrease and never leave the component).

    **Small-input early exit**: when the materialized pair count is at most
    ``driver_pairs_threshold`` (default 2^20 ≈ 1M pairs, tens of MB of ids),
    the edges are collected and resolved with driver-side union-find in ONE
    job — identical output (union-by-min-root keeps each component's root at
    its minimum id).  The iterative path costs a fixed ~0.4 s *per round* in
    Spark job overhead regardless of data volume, which dwarfs the real work
    whenever the pair set is small — and near-dup pair sets usually are,
    even over a 100 TB corpus, because pairs are emitted per LSH bucket, not
    per document.  Above the threshold (a genuinely dup-riddled crawl) the
    distributed O(log n)-round path runs unchanged.  Pass
    ``driver_pairs_threshold=0`` to force the distributed path.

    If the distributed loop exhausts ``max_iter`` before converging, a
    ``RuntimeWarning`` is raised: the output would contain SPLIT clusters
    (one component spread over several cluster_ids), which silently inflates
    a dedup survivor count.
    """
    # materialize the pair set BEFORE the symmetrize union: the union
    # references its input twice, so an un-checkpointed (possibly expensive)
    # upstream pair pipeline — an LSH candidate join — would be evaluated
    # twice in the same job
    base = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v")).localCheckpoint()
    if base.count() <= driver_pairs_threshold:  # count on checkpointed data: cheap
        return _cc_driver_union_find(base)
    edges = (
        base.union(base.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = edges.select(F.col("u").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    ).localCheckpoint()
    converged = False
    n_edges = -1
    for i in range(max_iter):
        msgs = edges.join(labels, edges["u"] == labels["id"]).select(
            F.col("v").alias("id"), "label"
        )
        # checkpoint the aggregate BEFORE the path-halving self-join: the
        # self-join then references one materialized plan (flat lineage, and
        # it sidesteps Catalyst's attribute-rewrite trouble when local-
        # checkpointing a self-joined aggregate)
        new = (
            labels.select("id", "label")
            .union(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        # path halving: label ← label's own label (labels are node ids, so
        # every label resolves; inner join is total).  NOT checkpointed —
        # it is a self-join of the checkpointed aggregate, and local-
        # checkpointing a self-joined aggregate trips Catalyst attribute
        # rewriting; downstream reads recompute one cheap join over `new`.
        right = new.select(
            F.col("id").alias("r_id"), F.col("label").alias("r_label")
        )
        halved = new.join(right, new["label"] == right["r_id"]).select(
            "id", F.col("r_label").alias("label")
        )
        labels = halved
        # contract: rewrite edges onto current labels, drop intra-cluster
        # edges, re-symmetrize.  Dense dup cliques disappear here after the
        # first round; path-shaped remnants keep shrinking geometrically
        # because halving moves labels two hops per round.
        lu = labels.select(F.col("id").alias("u"), F.col("label").alias("_lu"))
        lv = labels.select(F.col("id").alias("v"), F.col("label").alias("_lv"))
        contracted = (
            edges.join(lu, "u")
            .join(lv, "v")
            .filter(F.col("_lu") != F.col("_lv"))
            .select(
                F.least("_lu", "_lv").alias("u"),
                F.greatest("_lu", "_lv").alias("v"),
            )
            .distinct()
        )
        edges = (
            contracted.union(
                contracted.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            .localCheckpoint()
        )
        n_edges = edges.count()  # on the checkpointed, shrinking frame
        if n_edges == 0:
            converged = True
            break
    if converged:
        # final pointer compression: the quotient converged, but nodes that
        # left the quotient early hold stale pointer chains.  Doubling
        # compresses depth-d chains in ~log2(d) rounds; chain depth is
        # bounded by the round count, so this is a handful of cheap passes
        # over the label-only frame.
        for _ in range(max_iter):
            right = labels.select(
                F.col("id").alias("r_id"), F.col("label").alias("r_label")
            )
            nl = (
                labels.join(right, labels["label"] == right["r_id"])
                .select(
                    "id",
                    F.col("r_label").alias("label"),
                    (F.col("label") != F.col("r_label")).alias("_chg"),
                )
                .localCheckpoint()
            )
            changed = nl.filter("_chg").count()
            labels = nl.drop("_chg")
            if changed == 0:
                break
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components exhausted max_iter={max_iter} with "
            f"{n_edges} contracted edges still live — the output contains "
            f"SPLIT clusters (one component under multiple cluster_ids); "
            f"raise max_iter",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("id").alias("node_id"), F.col("label").alias("cluster_id"))


# ── SimHash ──────────────────────────────────────────────────────────────────
def with_simhash(docs: DataFrame) -> DataFrame:
    """64-bit SimHash over whitespace tokens (Manku et al., WWW 2007), held
    as TWO 32-bit halves (sim_lo bits 0-31, sim_hi bits 32-63) so neither
    engine needs signed-64 edge handling.  Token hash = md5 hex halves →
    BIGINT; bit j of the simhash = sign of the sum of (±1) votes.
    Explode+groupBy keeps it fully native (no UDF); the 32-bit r1 variant
    saturated at web scale (birthday collisions per 8-bit band key)."""
    from sparkx.session import spread_narrow_input

    docs = spread_narrow_input(docs)  # 1-task narrow scans serialize the map
    half = SIMHASH_BITS // 2
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
        )
        .withColumn("h_lo", F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"))
        .withColumn("h_hi", F.conv(F.substring(F.md5("tok"), 9, 8), 16, 10).cast("long"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col(src), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{name}{j}")
        for src, name in (("h_lo", "l"), ("h_hi", "h"))
        for j in range(half)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)

    def _pack(name: str):
        sim = None
        for j in range(half):
            bit = F.when(
                F.col(f"v{name}{j}") > 0, F.lit(1 << j).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            sim = bit if sim is None else sim + bit
        return sim

    return agg.select("doc_id", _pack("l").alias("sim_lo"), _pack("h").alias("sim_hi"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """All pairs with Hamming(simhash64) ≤ max_hamming via 16-bit banding
    (4 bands over 64 bits — lossless for ≤3 by pigeonhole) + exact popcount
    filter.  16-bit band keys give 65536-way spread per band (vs 256 at 32
    bits), keeping band buckets joinable at web scale."""
    sim = with_simhash(docs)
    bands = sim.select(
        "doc_id",
        "sim_lo",
        "sim_hi",
        F.posexplode(
            F.array(
                F.col("sim_lo").bitwiseAND(F.lit(65535)),
                F.shiftright(F.col("sim_lo"), 16).bitwiseAND(F.lit(65535)),
                F.col("sim_hi").bitwiseAND(F.lit(65535)),
                F.shiftright(F.col("sim_hi"), 16).bitwiseAND(F.lit(65535)),
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
            F.col("a.sim_lo").alias("alo"),
            F.col("a.sim_hi").alias("ahi"),
            F.col("b.sim_lo").alias("blo"),
            F.col("b.sim_hi").alias("bhi"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("alo").bitwiseXOR(F.col("blo"))) + F.bit_count(
        F.col("ahi").bitwiseXOR(F.col("bhi"))
    )
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


# ── embedding cosine near-dup ────────────────────────────────────────────────
# NB these are higher-order-function lambdas — interpreted, NOT codegen'd.
# Fine once per ROW; on a per-PAIR hot path hoist the norms to per-row
# columns first (see similarity.knn_join) so each pair pays one traversal
# (the dot), not four.
def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), "
        f"cast(0 as double), (acc, v) -> acc + v)"
    )


def _norm2(a: str):
    return F.expr(
        f"aggregate({a}, cast(0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double))"
    )


def _cosine(a: str, b: str):
    return _dot(a, b) / F.sqrt(_norm2(a) * _norm2(b))


def sign_bucket_at(col: str, start_dim: int, nbits: int):
    """Sign-LSH bucket over dims [start_dim, start_dim+nbits) (1-based).
    try_element_at: vectors shorter than the dim range contribute 0-bits
    (NULL ≥ 0 is false), matching SQL bracket-indexing semantics."""
    return sum(
        F.when(F.try_element_at(col, F.lit(start_dim + i)) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(nbits)
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    bucketed: bool = True,
    nbits: int = EMB_LSH_BITS,
    n_bands: int = EMB_LSH_BANDS,
) -> DataFrame:
    """Pairs with cosine ≥ threshold.

    ``bucketed=True`` is the scale path: BANDED sign-LSH (Charikar 2002
    hyperplane hashing with minhash-style banding) — ``n_bands`` bands, each
    bucketing on ``nbits`` sign bits of a disjoint dim range (band t → dims
    t·nbits+1 … (t+1)·nbits; nbits·n_bands ≤ dim).  Candidates = pairs
    colliding in ANY band, then exact cosine verify + distinct on the scored
    rows (a band-dup candidate costs one extra dot product, not an
    array-payload shuffle).

    Parameter geometry (sign-agreement p = 1 − acos(ρ)/π per bit):
    the 16×4 default gives 2^16 buckets per band — band-buckets stay sparse
    at web scale (the r1 single-4-bit-bucket design left every bucket ~1/16
    of the corpus, effectively all-pairs) — and per-band collision p^16,
    recall 1−(1−p^16)^4: ~30% at ρ=0.9, intentionally ~0 at ρ=0.3.  That is
    the honest trade: an all-pairs-≥0.3 contract is not LSH-able (nor is its
    output storable) at 100 TB; for low thresholds at test scale use wider
    recall via ``nbits=8, n_bands=8`` (256-bucket bands, ~14% recall at
    ρ≈0.3–0.5, ~93% at ρ=0.9) as the driver demo does.  Recall is measured
    against the brute-force oracle in tests/test_ops.py.

    ``bucketed=False`` is the exact brute-force verification path —
    quadratic BY DESIGN, never the scale path."""
    e = emb.select("vec_id", "embedding")
    if bucketed:
        bands = F.array(
            *[
                F.struct(
                    F.lit(t).alias("band"),
                    sign_bucket_at("embedding", t * nbits + 1, nbits).alias("key"),
                )
                for t in range(n_bands)
            ]
        )
        # norm2 hoisted to a per-ROW column before the band explode: the
        # cosine lambdas are interpreted, so the per-CANDIDATE verify must
        # pay one traversal (the dot), not four — same arithmetic
        # (dot / sqrt(na*nb), identical fold order), bit-identical scores
        b = e.withColumn("norm2", _norm2("embedding")).select(
            "vec_id", "embedding", "norm2", F.explode(bands).alias("bk")
        ).select(
            "vec_id", "embedding", "norm2",
            F.col("bk.band").alias("band"), F.col("bk.key").alias("key"),
        )
        return (
            b.alias("a")
            .join(b.alias("b"), ["band", "key"])
            .filter(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(
                F.col("a.vec_id").alias("a_id"),
                F.col("b.vec_id").alias("b_id"),
                F.round(
                    _dot("a.embedding", "b.embedding")
                    / F.sqrt(F.col("a.norm2") * F.col("b.norm2")),
                    4,
                ).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
            .distinct()
        )
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


def novelty_scores(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    col: str = "text",
) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a doc's distinct
    n-gram shingles whose corpus-wide first occurrence (min doc_id) is this
    document — the marginal-contribution curve of an ordered ingest.  Docs
    near 0 add nothing the corpus hasn't seen (dedup candidates even when
    no single pair crosses a Jaccard threshold — diffuse redundancy);
    ordering the corpus by source priority makes this "what does feed X
    add on top of feed Y".

    Execution: one shingle pass (the Generate-barrier ``with_shingles``),
    groupBy on the shingle for the corpus-wide min-id first-occurrence
    (map-side combinable), join back, per-doc counts — two bounded shuffles
    on the shingle key, one on doc_id.  No pairs anywhere: this reads the
    same posting table n-gram Jaccard builds, but consumes it linearly.
    The novelty ratio is truncated on the 1e-4 grid by integer division
    (tie-free across engines); docs with fewer than ``n`` tokens have no
    shingles and report NULL novelty.

    Returns ``(doc_id, n_shingles, n_novel, novelty)``.
    """
    from sparkx.ops.textstats import with_shingles

    sh = with_shingles(
        docs.select(F.col(id_col).alias("doc_id"), col), col=col, n=n
    ).select("doc_id", F.explode("shingles").alias("s"))
    first = sh.groupBy("s").agg(F.min("doc_id").alias("first_id"))
    per_doc = (
        sh.join(first, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                (F.col("first_id") == F.col("doc_id")).cast("long")
            ).alias("n_novel"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.when(
                F.coalesce("n_shingles", F.lit(0)) > 0,
                F.expr("(n_novel * 10000) div n_shingles") / 10000.0,
            ).alias("novelty"),
        )
    )


def containment_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.9,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact near-SUPERSET pairs by shingle containment (Broder 1997's
    second resemblance measure): ``containment = |A∩B| / min(|A|, |B|)``
    — the asymmetric signal Jaccard structurally misses.  A short article
    embedded verbatim in a long boilerplate-framed page has Jaccard
    ≈ |article|/|page| (arbitrarily low) but containment ≈ 1.0; web-corpus
    dedup needs this rung to catch syndicated/wrapped copies that pairwise
    Jaccard keeps.

    Purely AGGREGATIVE — no per-pair array re-verification (contrast
    ``ngram_jaccard_pairs``): shingles are distinct per doc, so the
    posting-list self-join yields exactly one row per (pair, shared
    shingle) and ``groupBy(pair).count()`` IS ``|A∩B|``; denominators are
    per-doc shingle counts joined back.  Two bounded shuffles (shingle,
    pair) + two size joins.  ``max_shingle_df`` drops hot shingles from
    the posting list BEFORE the self-join (the stop-shingle cap); unlike
    the Jaccard op the intersection is counted on the capped postings, so
    with a cap the reported containment is a LOWER BOUND over the
    informative-shingle space — exact when ``None`` (the oracle-gate
    default here; production sets a cap).
    """
    sh = with_shingles(docs, n=n).select("doc_id", "shingles")
    sizes = sh.select(
        "doc_id", F.size("shingles").alias("n_sh")
    ).filter(F.col("n_sh") > 0)
    posting = sh.select("doc_id", F.explode("shingles").alias("s"))
    if max_shingle_df is not None:
        hot = (
            posting.groupBy("s")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("s")
        )
        posting = posting.join(F.broadcast(hot), "s", "left_anti")
    inter = (
        posting.alias("a")
        .join(posting.alias("b"), "s")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    j = (
        inter.join(
            sizes.select(F.col("doc_id").alias("a_id"), F.col("n_sh").alias("n_a")),
            "a_id",
        )
        .join(
            sizes.select(F.col("doc_id").alias("b_id"), F.col("n_sh").alias("n_b")),
            "b_id",
        )
    )
    # exact-int division: n_inter and the least() are int64, so the double
    # is IEEE-determined — no round() (the cross-engine half-tie trap)
    cont = F.col("n_inter").cast("double") / F.least("n_a", "n_b").cast("double")
    return (
        j.withColumn("containment", cont)
        .filter(F.col("containment") >= threshold)
        .select("a_id", "b_id", "n_inter", "n_a", "n_b", "containment")
    )


def cluster_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_col: str | None = None,
) -> DataFrame:
    """Quality-aware near-dup cluster resolution: per connected-component
    cluster keep the HIGHEST-quality member (ties → min id), singletons
    are their own canonical — what production dedup actually ships, vs the
    min-id pick the funnel uses for determinism demos: near-dup clusters
    mix a clean original with truncated/boilerplate-wrapped copies, and
    min-id keeps whichever crawled first.  ``pairs`` is any (a_id, b_id)
    near-dup frame (MinHash-LSH at scale).

    Quality = :func:`textstats.quality_score` on ``text_col`` (NULL text
    scores −1 so it never beats a scored member; an all-NULL cluster falls
    back to min id via the tiebreak).  The pick is a map-side-combinable
    ``max(struct(q, −id))`` groupBy + one join back — the skew-safe shape
    (a viral cluster ships one struct per map task, never its rows,
    through the pick exchange; contrast a row_number window, which
    single-tasks the hottest cluster).  Returns
    ``(doc_id, cluster_id, keep_doc_id, is_canonical, q)``.

    The argmax-then-join shape evaluates the labeled frame twice (once
    under the pick aggregate, once as the probe).  The quality expression
    rides that double evaluation, so at corpus scale pass
    ``quality_col`` — a column PRECOMPUTED into the docs table (the
    curation pass already scores every doc) — and the doubled subtree is
    a bare two-column scan; computing the score inline is the
    demo/verification convenience.

    ``id_col`` MUST be numeric: the min-id tiebreak rides ``−id`` inside
    the pick struct (checked eagerly below — a string id would fail
    analysis or, worse, misorder silently).  Hash string ids to a long
    (xxhash64) upstream if needed — same precondition style as
    shard_assign's key uniqueness.
    """
    from sparkx.ops.textstats import quality_score

    _NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}
    id_type = dict(docs.dtypes).get(id_col)
    if id_type not in _NUMERIC and not str(id_type).startswith("decimal"):
        raise ValueError(
            f"cluster_canonical requires a numeric id_col for the -id "
            f"tiebreak; got {id_col}: {id_type}. Hash string ids to a long "
            f"(e.g. xxhash64) first."
        )

    q_expr = (
        F.col(quality_col) if quality_col is not None
        else quality_score(text_col)
    )
    cc = connected_components(pairs).withColumnRenamed("node_id", id_col)
    labeled = (
        docs.select(
            F.col(id_col),
            F.coalesce(q_expr, F.lit(-1.0)).alias("q"),
        )
        .join(cc, id_col, "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col(id_col)))
    )
    best = (
        labeled.groupBy("cluster_id")
        .agg(
            F.max(
                F.struct(F.col("q"), (-F.col(id_col)).alias("_nid"))
            ).alias("b")
        )
        .select("cluster_id", (-F.col("b._nid")).alias("keep_doc_id"))
    )
    return labeled.join(best, "cluster_id").select(
        id_col,
        "cluster_id",
        "keep_doc_id",
        (F.col(id_col) == F.col("keep_doc_id")).alias("is_canonical"),
        "q",
    )


def editdist_pairs(
    docs: DataFrame,
    key_col: str = "text",
    id_col: str = "doc_id",
    max_dist: int = 1,
) -> DataFrame:
    """Typo-level near-dup pairs by bounded edit distance over a SHORT key
    (title, question, normalized first line) via deletion-neighborhood
    blocking — the FastSS / SymSpell family (Bocek et al. 2007, public):
    every key emits itself plus its ``len(key)`` single-character-deletion
    variants as signatures; two keys within edit distance 1 provably share
    at least one signature (equal → the key itself; deletion/insertion →
    the shorter IS a variant of the longer; substitution → deleting the
    differing position from both collides), so a signature equi-join has
    EXACT recall and a ``levenshtein ≤ max_dist`` check kills the false
    positives (e.g. transpositions like ``ab``/``ba`` collide but measure
    2).  Never all-pairs: candidates exist only where signatures collide.

    Only ``max_dist=1`` is supported — the k-deletion neighborhood is
    C(len, k)-sized and a different algorithm (SymSpell's dictionary-side
    expansion) is the right tool past 1.

    Scale notes: a key of length L emits L+1 signatures (len-bounded by
    the caller's key construction — keep keys ≤ ~64 chars); pairs are
    deduped per signature collision set.  Identical keys pair
    quadratically (they ARE pairwise dups) — run exact dedup first, the
    standard pipeline order.  Empty/NULL keys carry no signal and are
    dropped.

    Cross-engine note: Spark's ``levenshtein`` counts code points, DuckDB's
    counts BYTES — a DuckDB-mirrored query must sanitize the key to ASCII
    first (the ``dedup_editdist`` gated query replaces ``[^\\x20-\\x7e]``
    with ``?``), which also makes ``substr`` positions agree.

    Returns ``(a_id, b_id, dist)`` with ``a_id < b_id``, one row per pair.
    """
    if max_dist != 1:
        raise ValueError("editdist_pairs supports max_dist=1 only")
    base = docs.select(
        F.col(id_col).alias("_id"), F.col(key_col).alias("_k")
    ).filter(F.length("_k") > 0)
    sigs = base.select(
        "_id",
        "_k",
        F.explode(
            F.array_union(
                F.array(F.col("_k")),
                F.expr(
                    "transform(sequence(1, char_length(_k)), "
                    "i -> concat(substring(_k, 1, i-1), substring(_k, i+1)))"
                ),
            )
        ).alias("_sig"),
    )
    a = sigs.select(
        F.col("_id").alias("a_id"), F.col("_k").alias("_ka"), "_sig"
    )
    b = sigs.select(
        F.col("_id").alias("b_id"), F.col("_k").alias("_kb"), "_sig"
    )
    return (
        a.join(b, "_sig")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", F.levenshtein("_ka", "_kb").alias("dist"))
        .filter(F.col("dist") <= max_dist)
        .distinct()
    )


def conv_prefix_groups(
    turns: DataFrame,
    k: int = 2,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Conversation branch collapse: group conversations by the signature of
    their first ``k`` turns and pick one canonical per group — the
    transcript-corpus analog of URL-keyed page dedup.  Agent frameworks
    fork conversations (regenerated answers, A/B samples, resumed
    sessions), producing many transcripts that share a verbatim opening;
    training on every branch over-weights the shared prefix, so corpus
    builds keep the longest branch (most turns) per prefix group.

    ``prefix_sig`` = md5 over the first-``k`` turn texts in turn order,
    joined with the unit separator 0x1f (NULL text → empty string, both
    conventions shared with the oracle's ``string_agg``).  A conversation
    with FEWER than ``k`` turns signs whatever prefix it has; one with no
    turns below ``k`` indices signs the empty string — degenerate groups,
    kept rather than dropped so the audit sees them.  Canonical pick:
    most turns, then lowest ``conv_col`` (string-safe — no numeric-id
    precondition, unlike cluster_canonical's −id trick).

    Execution: one per-conversation fold (hash exchange on ``conv_col``;
    the conditional ``collect_list`` carries only the ≤k prefix structs,
    never the whole conversation) and two windows over ``prefix_sig`` on a
    CONVERSATIONS-sized frame (already corpus-cardinality / turns-per-conv
    — at 10^12 turns the conv frame is ~10^9 rows, and groups are small by
    construction, so the rank window never sees a mega-partition unless
    the corpus truly has millions of identical-prefix branches, in which
    case that skew IS the signal the op exists to find).
    """
    from pyspark.sql import Window

    per_conv = turns.groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col(idx_col) < k,
                                F.struct(
                                    F.col(idx_col).alias("i"),
                                    F.coalesce(F.col(text_col), F.lit("")).alias("t"),
                                ),
                            )
                        )
                    ),
                    lambda x: x["t"],
                ),
                "\x1f",
            )
        ).alias("prefix_sig"),
    )
    wg = Window.partitionBy("prefix_sig")
    wr = wg.orderBy(F.desc("n_turns"), F.asc(conv_col))
    return per_conv.select(
        conv_col,
        "prefix_sig",
        "n_turns",
        F.count(F.lit(1)).over(wg).alias("n_branches"),
        (F.row_number().over(wr) == 1).alias("is_canonical"),
    )


def method_agreement(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    max_hamming: int = 3,
) -> DataFrame:
    """Detector-consensus audit: the full outer join of the two lexical
    near-dup detectors' pair sets — MinHash-LSH (shingle-Jaccard: order-
    sensitive, catches shared PASSAGES) and SimHash (token-bag Hamming:
    order-blind, catches shared VOCABULARY) — one row per candidate pair
    with each method's score and membership flag.  The calibration tool a
    corpus build runs before trusting either detector alone: both-methods
    pairs are safe to auto-drop, single-method pairs are where the two
    definitions of "near" genuinely diverge (reordered boilerplate fires
    SimHash only; a long shared quote inside distinct docs fires MinHash
    only) and deserve the threshold review.

    Execution: the two pair pipelines are the suite's scale-safe
    banded-LSH paths unchanged (each bounded by its band-bucket joins);
    the consensus join runs over POST-LSH pair frames — orders of
    magnitude smaller than the corpus — on the normalized ``a_id < b_id``
    pair key both producers already emit, so the full outer join is a
    cheap equi-join no matter what the corpus weighs.  NULL score = that
    method did not propose the pair (membership is carried explicitly in
    the flags, so downstream never infers it from NULLs).
    """
    mh = minhash_lsh_pairs(docs, n=n, threshold=threshold)
    sh = simhash_pairs(docs, max_hamming=max_hamming)
    j = mh.join(sh, ["a_id", "b_id"], "full_outer")
    return j.select(
        "a_id",
        "b_id",
        "jaccard",
        F.col("hamming").cast("long").alias("hamming"),
        F.col("jaccard").isNotNull().alias("in_minhash"),
        F.col("hamming").isNotNull().alias("in_simhash"),
    )


def dup_by_source(docs: DataFrame, source_col: str = "source") -> DataFrame:
    """Per-source duplication scorecard: for each source feed, row count,
    distinct normalized-content fingerprints, duplicate rows (rows minus
    distinct — what exact dedup would delete within the source),
    ``dup_rate_e4`` on the e4 grid by truncating division, and
    ``n_cross_fp`` — how many of this source's distinct fingerprints also
    appear in at least one OTHER source (the feed-overlap signal that
    tells a build which feeds mirror each other and which
    source-priority rule to write; :func:`priority_dedup` consumes that
    decision).  The ingest-audit view a corpus build checks per batch:
    a feed whose dup rate jumps is re-crawling itself; a pair of feeds
    with high cross counts should be collapsed by priority.

    Execution: one fingerprint projection (map-only, the shared
    :func:`~sparkx.ops.textstats.fingerprint` md5), then (a) a per-source
    count/count-distinct aggregate and (b) the cross-source path —
    distinct (source, fp) pairs, a per-fp source count, and a semi-join
    back — all keyed on fp/source with map-side partials; output is
    |sources| rows.  NULL-text docs carry a NULL fp, which COUNT(DISTINCT)
    ignores on both engines — they count as rows, never as unique content
    (document-level semantics: a NULL text cannot be deduplicated).
    """
    fp = docs.select(
        F.col(source_col).alias("source"), fingerprint().alias("fp")
    )
    per_src = fp.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("fp").alias("n_unique"),
    )
    pairs = fp.filter(F.col("fp").isNotNull()).distinct()
    nsrc = pairs.groupBy("fp").agg(F.count(F.lit(1)).alias("_ns"))
    cross = (
        pairs.join(nsrc, "fp")
        .filter(F.col("_ns") >= 2)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_cross_fp"))
    )
    return per_src.join(cross, "source", "left").select(
        "source",
        "n_docs",
        "n_unique",
        (F.col("n_docs") - F.col("n_unique")).cast("long").alias("n_dup_rows"),
        F.expr("((n_docs - n_unique) * 10000) div n_docs")
        .cast("long")
        .alias("dup_rate_e4"),
        F.coalesce(F.col("n_cross_fp"), F.lit(0)).cast("long")
        .alias("n_cross_fp"),
    )


def semdedup(
    emb: DataFrame,
    centroids: list[list[float]] | None = None,
    threshold_e6: int = 950_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 1,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings against a frozen coarse
    quantizer and pruning, WITHIN each cluster, every vector whose cosine
    to some lower-id cluster-mate reaches ``threshold_e6`` (×10⁻⁶).  This
    is the paper's actual rule — a vector is removed iff its max
    similarity to any vector EARLIER in a fixed order exceeds eps; the
    rule is order-based and non-iterative (NOT greedy-against-kept), so it
    is one self-join + one aggregate, no sequential dependency — which is
    what makes it embarrassingly parallel at 100 TB.

    Scale shape: the cluster assignment is the map-only
    :func:`~sparkx.ops.similarity.ivf_assign_frozen` pass; the quadratic
    blowup is bounded PER CELL (the paper runs ~50k–110k clusters so cells
    hold ~n/50k vectors; the checked-in 8-centroid artifact is the demo
    quantizer, not the scale parameter).  Norms are hoisted to per-row
    columns BEFORE the self-join (the knn_join lesson: cosine lambdas are
    interpreted, so per-PAIR work must be one traversal — the dot).  The
    assignment subtree is evaluated twice (pair branch + output probe) —
    the cluster_canonical precedent; it is a narrow scan+map.

    Parity: scores live on the floor-1e6 integer grid (no half-ties);
    zero-norm vectors score NULL against everything EXPLICITLY — without
    the guard 0/0 = NaN, where Spark's floor→long yields NULL but a SQL
    mirror's CAST(floor(NaN)) errors (the quantize_int8 lesson).
    Dim-mismatched and NULL vectors carry a NULL cell (never join, always
    kept) — :func:`~sparkx.ops.similarity.ivf_assign_frozen`'s dim guard.

    Returns one row per input: ``(id, ivf_cell, max_prior_sim_e6 — max
    grid-cosine to any lower-id cluster-mate (the paper's thresholded
    statistic, NULL if none scorable), dup_of — the LOWEST-id mate at or
    above threshold (NULL if kept), is_kept)``.  Keep-priority variants
    (e.g. the paper's keep-farthest-from-centroid) compose by remapping
    ``id_col`` to a rank upstream; quality-aware canonical picks over
    TRANSITIVE clusters are :func:`cluster_canonical`'s job instead.

    ``n_blocks`` — fragment-replicate blocking for the pair join.  With
    the default (1) the shuffle key is the cell alone; because pair work
    grows as cell-size², hash-assigning a FEW uneven cells to many
    partitions caps parallelism (r5 scaling leg: 128 cells / 32
    partitions simulated to a 0.42 efficiency ceiling, measured 0.53).
    With ``n_blocks = s``: each row gets a deterministic block
    ``xxhash64(id) mod s``, the LEFT side replicates s× (one copy per
    target block), and the join keys on ``(cell, target_block)`` —
    s× finer, near-even granularity; each (i, j>i... j<i) pair is still
    produced EXACTLY once (left=i matches only target_block =
    block(j)), so the output is byte-identical (pytest-pinned) and the
    oracle is unchanged.  Cost: s× left-side shuffle bytes (the vector
    rides the replication) — size s to your partition count, not higher.
    """
    from sparkx.ops.similarity import ivf_assign_frozen, load_frozen_centroids

    if centroids is None:
        centroids = load_frozen_centroids()
    a = ivf_assign_frozen(
        emb.select(id_col, vec_col), centroids, vec_col=vec_col
    ).withColumn("_n2", _norm2(vec_col))
    left = a.select(
        F.col(id_col).alias("_i"), F.col(vec_col).alias("_vi"),
        F.col("_n2").alias("_n2i"), "ivf_cell",
    )
    right = a.select(
        F.col(id_col).alias("_j"), F.col(vec_col).alias("_vj"),
        F.col("_n2").alias("_n2j"), "ivf_cell",
    )
    join_keys = ["ivf_cell"]
    if n_blocks > 1:
        blk = lambda c: F.pmod(F.xxhash64(F.col(c)), F.lit(n_blocks))
        left = left.withColumn(
            "_t", F.explode(F.sequence(F.lit(0), F.lit(n_blocks - 1)))
        )
        right = right.withColumn("_t", blk("_j").cast("int"))
        join_keys = ["ivf_cell", "_t"]
    cos_e6 = F.when(
        (F.col("_n2i") > 0) & (F.col("_n2j") > 0),
        F.floor(
            _dot("_vi", "_vj") / F.sqrt(F.col("_n2i") * F.col("_n2j"))
            * F.lit(1_000_000.0)
        ),
    ).cast("long")
    pairs = (
        left.join(right, join_keys)
        .filter(F.col("_j") < F.col("_i"))
        .select("_i", F.col("_j"), cos_e6.alias("cos_e6"))
    )
    agg = pairs.groupBy("_i").agg(
        F.max("cos_e6").alias("max_prior_sim_e6"),
        F.min(
            F.when(F.col("cos_e6") >= threshold_e6, F.col("_j"))
        ).alias("dup_of"),
    )
    return (
        a.join(agg, F.col(id_col) == F.col("_i"), "left")
        .select(
            F.col(id_col),
            F.col("ivf_cell"),
            F.col("max_prior_sim_e6"),
            F.col("dup_of"),
            F.col("dup_of").isNull().alias("is_kept"),
        )
    )


def prefix_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_chars: int = 64,
) -> DataFrame:
    """Shared-prefix canonical collapse — the crawl/transcript analog of
    "these are the same template": documents whose first ``prefix_chars``
    characters agree form one group (boilerplate system prompts, mirrored
    article lead-ins, re-posted announcements), and the group keeps its
    LONGEST member (most content preserved), ties broken by min id.
    Exact dedup (:func:`exact_dedup`) only collapses byte-identical
    bodies; prefix dedup is the cheap first pass that catches
    truncated/extended variants of one template before the n-gram
    machinery runs.

    The group key is ``md5(substr(text, 1, prefix_chars))`` — constant
    16-byte width however large ``prefix_chars`` is, so the shuffle
    carries (key, len, id) metadata, never the corpus text.  The
    canonical pick is a map-side-combinable ``max(struct(len, −id))``
    groupBy — NOT a per-key window: a hot template prefix (millions of
    members at crawl scale) would serialize into one window sort, while
    the combinable agg reduces it on the map side.  One metadata-width
    shuffle for the agg + one bounded join back (best frame is
    |distinct prefixes| rows).

    ``id_col`` MUST be numeric (the −id tiebreak — same precondition and
    eager check as :func:`cluster_canonical`).  NULL text groups with
    empty text (one stratum).  Both engines hash the UTF-8 bytes of a
    codepoint-counted substring, so the key is cross-engine stable.

    Returns ``(id_col, prefix_key, text_len, keep_doc_id, group_size,
    is_kept)``.
    """
    _NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}
    id_type = dict(docs.dtypes).get(id_col)
    if id_type not in _NUMERIC and not str(id_type).startswith("decimal"):
        raise ValueError(
            f"prefix_dedup requires a numeric id_col for the -id tiebreak; "
            f"got {id_col}: {id_type}. Hash string ids to a long first."
        )
    txt = F.coalesce(F.col(text_col), F.lit(""))
    base = docs.select(
        F.col(id_col),
        F.md5(F.substring(txt, 1, prefix_chars)).alias("prefix_key"),
        F.length(txt).cast("long").alias("text_len"),
    )
    best = (
        base.groupBy("prefix_key")
        .agg(
            F.max(
                F.struct(F.col("text_len"), (-F.col(id_col)).alias("_nid"))
            ).alias("b"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .select(
            "prefix_key",
            (-F.col("b._nid")).alias("keep_doc_id"),
            "group_size",
        )
    )
    return base.join(best, "prefix_key").select(
        id_col,
        "prefix_key",
        "text_len",
        "keep_doc_id",
        "group_size",
        (F.col(id_col) == F.col("keep_doc_id")).alias("is_kept"),
    )


def minhash_threshold_sweep(
    docs: DataFrame,
    n: int = 3,
    thresholds_e4: tuple[int, ...] = (5000, 7000, 9000),
) -> DataFrame:
    """Dedup-threshold tuning curve — the near-dup analog of the ANN
    recall-vs-nprobe sweep: how many verified pairs and how many
    pairwise-dominated docs each candidate Jaccard threshold would flag,
    so the dedup threshold is chosen from data rather than folklore.  One
    banded-LSH candidate pass verified at the sweep's LOWEST threshold
    (thresholds only ever tighten a verified pair set — the same
    nested-set observation as :func:`~sparkx.ops.similarity.
    ivf_probe_curve`'s probe cells), then every curve point is an
    aggregate over that one frame; the shingle machinery never re-runs
    per point.

    ``n_docs_flagged`` counts distinct higher-ids of passing pairs — the
    greedy remove-the-larger-id upper bound a sweep wants for sizing;
    cluster-atomic removal at the chosen threshold is
    :func:`cluster_canonical`'s job afterwards.  Thresholds ride the e4
    integer grid (``jaccard`` is already round(·,4), so ×10⁴ re-rounds to
    an EXACT long both engines agree on — never a raw-double ≥ compare
    at the grid boundary).

    Execution: the |thresholds| spine broadcasts against the pair frame
    (3× pair rows, metadata width), then one map-side-combinable
    two-phase distinct aggregate; output is ≤ |thresholds| rows at any
    corpus size.  Returns ``(threshold_e4, n_pairs, n_docs_flagged)``.
    """
    lo = min(thresholds_e4) / 10_000.0
    pairs = minhash_lsh_pairs(docs, n=n, threshold=lo).select(
        "b_id",
        F.round(F.col("jaccard") * 10_000).cast("long").alias("_jac_e4"),
    )
    spark = docs.sparkSession
    spine = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(int(t)).cast("int") for t in sorted(thresholds_e4)])
        ).alias("threshold_e4")
    )
    return (
        pairs.crossJoin(F.broadcast(spine))
        .filter(F.col("_jac_e4") >= F.col("threshold_e4"))
        .groupBy("threshold_e4")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("b_id").alias("n_docs_flagged"),
        )
        .join(spine, "threshold_e4", "right")
        .select(
            "threshold_e4",
            F.coalesce("n_pairs", F.lit(0).cast("long")).alias("n_pairs"),
            F.coalesce("n_docs_flagged", F.lit(0).cast("long")).alias(
                "n_docs_flagged"
            ),
        )
    )


def conv_dedup(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    text_col: str = "text",
) -> DataFrame:
    """Conversation-level exact dedup under turn-order-insensitive content
    equality — the re-logged-session case document-level dedup cannot
    see: two captures of one agent session often differ only in turn
    interleaving jitter (concurrent tool results landing in either
    order), so the conversation fingerprint is the md5 of the SORTED
    multiset of per-turn content fingerprints.  Same content + any
    ordering → same fingerprint; one changed turn → different.  The
    order-SENSITIVE variant is :func:`~sparkx.ops.corpus`'s prefix-tree
    machinery (dedup_branches); this is the cheap whole-session exact
    pass that runs first.

    The per-turn fingerprint is the ONE canonical
    :func:`~sparkx.ops.textstats.fingerprint` (whitespace-collapse +
    md5); NULL-text turns fingerprint as the empty string's so they
    count as turns, not holes.  Keeper is min ``conv_col`` per group
    (lexicographic — conv ids are strings).

    Execution: one metadata-width shuffle to assemble per-conversation
    fingerprint arrays (``array_sort(collect_list(...))`` — the
    line-dedup idiom: deterministic under any partitioning, unlike bare
    collect_list), then the exact_dedup-shaped combinable groupBy on the
    32-char conv fingerprint + a bounded join back.  The corpus text
    never shuffles — only 16-byte turn hashes do.  Returns ``(conv_col,
    conv_fp, n_turns, keep_conv_id, group_size, is_kept)``.
    """
    from sparkx.ops.textstats import fingerprint

    # fingerprint md5s NULL text to NULL; coalesce AFTER so a NULL turn
    # hashes exactly like an empty-content turn (md5('') — the normalized
    # form of '' is itself '')
    per_turn = transcripts.select(
        F.col(conv_col),
        F.coalesce(fingerprint(text_col), F.md5(F.lit(""))).alias("_fp"),
    )
    convs = per_turn.groupBy(conv_col).agg(
        F.md5(
            F.array_join(F.array_sort(F.collect_list("_fp")), ",")
        ).alias("conv_fp"),
        F.count(F.lit(1)).alias("n_turns"),
    )
    best = convs.groupBy("conv_fp").agg(
        F.min(conv_col).alias("keep_conv_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return convs.join(best, "conv_fp").select(
        conv_col,
        "conv_fp",
        "n_turns",
        "keep_conv_id",
        "group_size",
        (F.col(conv_col) == F.col("keep_conv_id")).alias("is_kept"),
    )
