"""Text analysis operators: token counting, quality scoring, language-ID,
fingerprinting.  All native column expressions — zero Python UDFs.

These generalize the reference's string surface (word counts
``src/agents/base.py:307-317``, lower/contains heuristics
``src/agents/orchestrator.py:44-59``) into the operators a training-data
pipeline needs at 100 TB: every one is a narrow map — no shuffle — so they
scale linearly with input splits.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# fixed stopword marker sets for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ["the", "a", "and", "of", "to", "is"],
    "de": ["der", "die", "das", "und", "nicht", "ist"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "los", "las", "y", "es", "una"],
}
LANG_ORDER = ["en", "de", "fr", "es"]  # tie-break precedence (fixed)

PUNCT_CLASS = "[^.,;:!?]"


def tokens(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: str | Column = "text") -> Column:
    """Whitespace token count (word-count analog of base.py:307-317)."""
    return F.size(tokens(col))


# BPE-ish pretokenizer pattern: a token is a maximal ASCII word run or one
# non-word non-space character — the match-count form (alternation + classes
# only) so Java regex, RE2 (DuckDB), and Python re read it identically; the
# whitespace class is spelled out because Java's \s includes \x0B where
# RE2's does not
BPE_TOKEN_RE = r"[0-9A-Za-z_]+|[^0-9A-Za-z_ \t\n\x0b\f\r]"


def bpe_ish_token_count(col: str = "text") -> Column:
    """BPE-ish proxy token count: word runs + individual punctuation marks,
    the segmentation shape byte-pair pretokenizers use.  A single
    regexp_extract_all — deterministic, JVM-side, no interpreted lambdas."""
    return F.size(
        F.regexp_extract_all(
            F.coalesce(F.col(col), F.lit("")), F.lit(BPE_TOKEN_RE), F.lit(0)
        )
    )


def _marker_count(col: str, lang: str) -> Column:
    markers = LANG_MARKERS[lang]
    cond = " OR ".join(f"t = '{m}'" for m in markers)
    return F.expr(
        f"size(filter(split(lower(trim({col})), '\\\\s+'), t -> {cond}))"
    )


def lang_scores(col: str = "text") -> dict[str, Column]:
    return {lang: _marker_count(col, lang) for lang in LANG_ORDER}


def lang_id(col: str = "text") -> Column:
    """Stopword-marker language heuristic with fixed tie-break order; 'und'
    (undetermined) when no marker hits."""
    scores = lang_scores(col)
    best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
    expr: Column = F.lit("und")
    for lang in reversed(LANG_ORDER):  # earlier langs win ties → apply last
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def punct_ratio(col: str = "text") -> Column:
    n_punct = F.length(F.regexp_replace(F.col(col), PUNCT_CLASS, ""))
    return n_punct / F.greatest(F.length(F.col(col)), F.lit(1))


def stopword_ratio(col: str = "text") -> Column:
    return _marker_count(col, "en") / F.greatest(token_count(col), F.lit(1))


def quality_score(col: str = "text") -> Column:
    """Deterministic document quality score in [0,1]:
    0.5·min(1, tokens/100) + 0.3·(1 − punct_ratio) + 0.2·stopword_ratio."""
    return F.round(
        F.least(F.lit(1.0), token_count(col) / F.lit(100.0)) * 0.5
        + (F.lit(1.0) - punct_ratio(col)) * 0.3
        + stopword_ratio(col) * 0.2,
        4,
    )


def normalized(col: str = "text") -> Column:
    """Canonical text form for dedup: lower, collapse whitespace, trim."""
    return F.lower(F.trim(F.regexp_replace(F.col(col), r"\s+", " ")))


def fingerprint(col: str = "text") -> Column:
    """Exact-content fingerprint: md5 of the normalized text."""
    return F.md5(normalized(col))


def winnow_fingerprints(
    docs: DataFrame,
    n: int = 3,
    window: int = 4,
    id_col: str = "doc_id",
    col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003):
    the rolling-hash fingerprint selection that guarantees any shared run of
    ≥ ``window + n − 1`` tokens between two documents shares ≥ 1 selected
    fingerprint, at ~2/(window+1) selection density — the overlap-detection
    primitive (MOSS) a corpus pipeline uses for contamination checks.

    Returns one ``(id_col, fp)`` row per distinct selected fingerprint.

    Execution, 100-TB shape: positional token n-grams via posexplode (NOT
    array_distinct — winnowing is positional), a 32-bit engine-portable hash
    per shingle (md5 prefix as BIGINT, same trick as the minhash kernel),
    then the per-document sliding-window minimum as a codegen'd window
    aggregate (``ROWS BETWEEN window−1 PRECEDING AND CURRENT ROW``) and a
    distinct.  One shuffle on ``id_col``; window state is bounded by the
    document's own length, so no skew beyond document length itself (cap
    pathological documents upstream).  Classic winnowing breaks min ties by
    rightmost position; with 32-bit hashes ties are ~2^-32 per window and
    the DISTINCT fingerprint set is identical under any tie-break, so the
    plain windowed min is used (keeps the aggregate partially evaluable and
    the oracle SQL byte-portable)."""
    from pyspark.sql import Window as W

    # explode(array(split)) = Generate barrier against CollapseProject
    # inlining the split into the positional-shingle lambda (see
    # with_shingles — O(tokens²) otherwise)
    d = docs.select(
        F.col(id_col),
        F.explode(
            F.array(F.split(F.lower(F.trim(F.col(col))), r"\s+"))
        ).alias("_toks"),
    )
    parts = ", ' ', ".join(f"_toks[i+{k}]" for k in range(n))
    sh = d.select(
        id_col,
        F.posexplode(
            F.expr(
                f"CASE WHEN size(_toks) < {n} THEN cast(array() as array<string>) "
                f"ELSE transform(sequence(0, size(_toks) - {n}), "
                f"i -> concat({parts})) END"
            )
        ).alias("pos", "sh"),
    )
    h = F.conv(F.substring(F.md5("sh"), 1, 8), 16, 10).cast("long")
    w = W.partitionBy(id_col).orderBy("pos").rowsBetween(-(window - 1), 0)
    return (
        sh.withColumn("fp", F.min(h).over(w))
        .filter(F.col("pos") >= window - 1)  # only full windows select
        .select(id_col, "fp")
        .distinct()
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    n: int = 3,
    window: int = 4,
    min_shared: int = 2,
    max_fp_df: int | None = 10_000,
    id_col: str = "doc_id",
    col: str = "text",
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints — the
    contamination / overlap-detection report (MOSS-style): by the winnowing
    guarantee, any pair sharing a token run ≥ ``window + n − 1`` long shows
    up here.

    Execution: fingerprint inverted-index self-join (equi-join on fp) +
    count per pair.  ``max_fp_df`` is the posting-list frequency cap (same
    trick as ``sparkx.ops.dedup.ngram_jaccard_pairs``): a boilerplate
    fingerprint present in d documents would contribute d² candidate rows,
    so fingerprints with document frequency > cap are dropped from the join
    — they carry no discriminating signal anyway."""
    fps = winnow_fingerprints(docs, n=n, window=window, id_col=id_col, col=col)
    if max_fp_df is not None:
        hot = (
            fps.groupBy("fp")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_fp_df)
            .select("fp")
        )
        fps = fps.join(F.broadcast(hot), "fp", "left_anti")
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, "fp")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("a_id"), F.col(f"b.{id_col}").alias("b_id")
        )
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def contamination_report(
    train: DataFrame,
    test: DataFrame,
    n: int = 3,
    window: int = 4,
    max_fp_df: int | None = 10_000,
    id_col: str = "doc_id",
    col: str = "text",
) -> DataFrame:
    """Train/test contamination audit: per TEST document, how much of its
    winnowing fingerprint set appears anywhere in the TRAIN corpus — the
    benchmark-leakage check every training-data release runs (winnowing
    guarantee: any verbatim run of ≥ ``window + n − 1`` shared tokens is
    caught).  Returns one row per test doc with ≥ ``window + n − 1`` tokens:
    ``(test_id, n_fps, n_shared_fps, n_train_docs, contamination)`` where
    contamination = shared/total fingerprints (0.0 = clean, 1.0 = fully
    covered by training text).

    Execution: winnow both sides (per-doc window aggregates, one shuffle
    each), equi-join on the 32-bit fingerprint — the train side can be
    billions of rows; the join key is an 8-byte hash and the per-test
    aggregation is map-side combinable.  ``max_fp_df`` caps boilerplate
    fingerprints on the TRAIN side (a fp present in d train docs joins d
    times per test hit; capped fps carry no leakage signal — same trick as
    winnow_overlap_pairs)."""
    tr = winnow_fingerprints(train, n=n, window=window, id_col=id_col, col=col).select(
        F.col(id_col).alias("_train_id"), "fp"
    )
    if max_fp_df is not None:
        hot = (
            tr.groupBy("fp")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_fp_df)
            .select("fp")
        )
        tr = tr.join(F.broadcast(hot), "fp", "left_anti")
    te = winnow_fingerprints(test, n=n, window=window, id_col=id_col, col=col)
    tot = te.groupBy(id_col).agg(F.count("*").alias("n_fps"))  # fps distinct per doc
    hits = (
        te.join(tr, "fp")
        .groupBy(id_col)
        .agg(
            F.countDistinct("fp").alias("n_shared_fps"),
            F.countDistinct("_train_id").alias("n_train_docs"),
        )
    )
    shared = F.coalesce(F.col("n_shared_fps"), F.lit(0))
    return tot.join(hits, id_col, "left").select(
        F.col(id_col).alias("test_id"),
        "n_fps",
        shared.alias("n_shared_fps"),
        F.coalesce(F.col("n_train_docs"), F.lit(0)).alias("n_train_docs"),
        F.round(shared / F.col("n_fps"), 4).alias("contamination"),
    )


def with_shingles(docs: DataFrame, col: str = "text", n: int = 3,
                  out: str = "shingles") -> DataFrame:
    """Add a distinct token n-gram shingle column (array<string>) — the
    rolling-window base for near-dup fingerprints.  Empty array when fewer
    than n tokens.  Native transform/sequence, no UDF.

    The token array is bound through ``explode(array(split(...)))`` — a
    1-row Generate that CollapseProject cannot merge through.  A plain
    ``withColumn`` got inlined: the transform lambda references ``_toks``
    n+2 times, and Catalyst's duplicate-expensive-expression guard does not
    see through lambda bodies, so every element evaluated THREE full regex
    splits of the document — O(tokens²) work per doc, measured 20.9 s vs
    0.8 s for one shingle-explode pass over sf0.1 (the same trap CLAUDE.md
    records for the minhash K-loop, in projection form).  explode(array(x))
    never changes the row count (a 1-element array even when x is NULL)."""
    from sparkx.session import spread_narrow_input

    docs = spread_narrow_input(docs)  # 1-task narrow scans serialize the map
    split_expr = F.split(F.lower(F.trim(F.col(col))), r"\s+")
    d = docs.select("*", F.explode(F.array(split_expr)).alias("_toks"))
    parts = ", ' ', ".join(f"_toks[i+{k}]" for k in range(n))
    return d.withColumn(
        out,
        F.expr(
            f"CASE WHEN size(_toks) < {n} THEN cast(array() as array<string>) "
            f"ELSE array_distinct(transform(sequence(0, size(_toks) - {n}), "
            f"i -> concat({parts}))) END"
        ),
    ).drop("_toks")


# PII patterns kept to syntax Java regex, RE2, and Python re all interpret
# identically (no lookaround, no possessive quantifiers, and NO bare \s —
# Java's \s includes \x0B where RE2's does not, and Python's is
# Unicode-aware; the whitespace inside the phone class is spelled out).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = "\\+?[0-9][0-9()\\- \\t\\n\\x0B\\f\\r]{6,}[0-9]"


def scrub_pii(docs: DataFrame, col: str = "text") -> DataFrame:
    """Redact emails/phone-like spans and report per-doc hit counts — the
    pre-training scrub pass.  Pure regexp_replace / regexp_count column
    expressions: a narrow map, no shuffle, scan-pushable upstream filters
    untouched."""
    c = F.col(col)
    return docs.withColumn("n_emails", F.regexp_count(c, F.lit(EMAIL_RE))) \
        .withColumn("n_phones", F.regexp_count(
            F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), F.lit(PHONE_RE))) \
        .withColumn(
            "scrubbed",
            F.regexp_replace(
                F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
            ),
        )


def line_repetition_ratio(col: str | Column = "text") -> Column:
    """Gopher-style repeated-line ratio: 1 − distinct(lines)/lines over
    non-empty lines (0.0 for docs with no non-empty lines).  Native
    split/filter/array_distinct — no UDF."""
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    lines = F.filter(F.split(c, r"\n"), lambda x: x != F.lit(""))
    n = F.size(lines)
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        F.round(1.0 - F.size(F.array_distinct(lines)) / n, 4)
    )


# the 8 high-frequency English stopwords of the published rule ("contains at
# least 2 of ..."), Rae et al. 2021 (Gopher), Appendix A1.2
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _gopher_pass_preds(
    min_words: int,
    max_words: int,
    min_mean_word_len: float,
    max_mean_word_len: float,
    max_symbol_ratio: float,
    max_bullet_frac: float,
    max_ellipsis_frac: float,
    min_stop_hits: int,
    max_dup_line_frac: float,
    max_dup_2gram_frac: float,
) -> dict:
    """The 8 per-rule PASS predicates over :func:`gopher_rules`' signal
    columns — the ONE definition of each rule's threshold comparison,
    shared by the fused ``keep`` and by :func:`rule_ablation` (a re-spelled
    copy in either place could silently drift on boundary semantics)."""
    return {
        "n_words": F.col("n_words").between(min_words, max_words),
        "mean_word_len": F.col("mean_word_len").between(
            min_mean_word_len, max_mean_word_len
        ),
        "symbol_ratio": F.col("symbol_ratio") <= max_symbol_ratio,
        "bullet_frac": F.col("bullet_frac") <= max_bullet_frac,
        "ellipsis_frac": F.col("ellipsis_frac") <= max_ellipsis_frac,
        "stop_hits": F.col("stop_hits") >= min_stop_hits,
        "dup_line_frac": F.col("dup_line_frac") <= max_dup_line_frac,
        "dup_2gram_frac": F.col("dup_2gram_frac") <= max_dup_2gram_frac,
    }


def gopher_rules(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_stop_hits: int = 2,
    max_dup_line_frac: float = 0.3,
    max_dup_2gram_frac: float = 0.2,
    text_col: str = "text",
    id_col: str = "doc_id",
    select_all: bool = False,
) -> DataFrame:
    """Per-document MassiveText quality-rule flags (Rae et al., "Scaling
    Language Models: ... Gopher", arXiv 2021, Appendix A1.2) — the published
    heuristic filter battery every large-scale training-corpus build runs
    before model-based scoring: word-count bounds, mean word length,
    symbol-to-word ratio (``#`` and ``...``), bullet-line and ellipsis-line
    fractions, stopword presence, and the within-document repetition
    signals (duplicate-line fraction, duplicate word-2-gram fraction).

    Returns one row per doc with each raw signal plus the fused ``keep``
    boolean.  Keeping the signals (not just ``keep``) is deliberate: corpus
    builds tune thresholds per source, and the signal columns are the input
    to that tuning.

    Scale shape: ONE narrow projection — no joins, no shuffles, no UDFs; at
    100 TB this is a map-only pass that pipelines into whatever filter or
    aggregation follows.  The token and line arrays are bound through
    ``explode(array(...))`` Generate barriers (row count unchanged) so
    CollapseProject cannot inline the regex split into every lambda
    reference — the same O(tokens²) trap :func:`with_shingles` documents.

    Determinism: every ratio is ``floor((num × 10⁴) / den) / 10⁴`` — one
    IEEE division of exact integers followed by floor, which is TIE-FREE:
    ``round()`` at a .00005 grid tie goes different ways in Spark
    (BigDecimal HALF_UP on the shortest decimal repr) and DuckDB
    (half-away on the raw double) — see CLAUDE.md.  ``keep`` compares the
    gridded values, so the engines agree exactly.

    ``text_col``/``id_col`` rebind the input columns; ``select_all=True``
    keeps EVERY input column alongside the signals + ``keep`` — the shape
    the corpus funnel uses to layer the battery as a flag column without a
    self-join."""
    from sparkx.session import spread_narrow_input

    docs = spread_narrow_input(docs)  # 1-task narrow scans serialize the map
    toks_expr = F.expr(
        f"filter(split(lower(trim(coalesce({text_col}, ''))), '\\\\s+'), "
        "t -> t != '')"
    )
    lines_expr = F.expr(
        f"filter(split(coalesce({text_col}, ''), '\\n'), x -> x != '')"
    )
    d = docs.select(
        "*",
        F.explode(F.array(toks_expr)).alias("_gtoks"),
        F.explode(F.array(lines_expr)).alias("_glines"),
    )
    n_words = F.size("_gtoks")
    n_lines = F.size("_glines")
    text_raw = F.coalesce(F.col(text_col), F.lit(""))
    text_len = F.length(text_raw)
    hash_count = text_len - F.length(F.replace(text_raw, F.lit("#"), F.lit("")))
    ellipsis_count = (
        text_len - F.length(F.replace(text_raw, F.lit("..."), F.lit("")))
    ) / 3
    def _grid4(num, den):
        # floor((num*1e4)/den)/1e4 — the tie-free cross-engine ratio form
        return F.floor((num * 10000) / den) / 10000.0

    mean_word_len = _grid4(
        F.expr("aggregate(_gtoks, 0L, (a, t) -> a + length(t))"),
        F.greatest(n_words, F.lit(1)),
    )
    symbol_ratio = _grid4(
        hash_count + ellipsis_count, F.greatest(n_words, F.lit(1))
    )
    bullet_frac = _grid4(
        F.size(
            F.expr(
                "filter(_glines, l -> startswith(ltrim(l), '- ') "
                "OR startswith(ltrim(l), '* ') OR startswith(ltrim(l), '• '))"
            )
        ),
        F.greatest(n_lines, F.lit(1)),
    )
    ellipsis_frac = _grid4(
        F.size(F.expr("filter(_glines, l -> endswith(rtrim(l), '...'))")),
        F.greatest(n_lines, F.lit(1)),
    )
    stop_hits = sum(
        (
            F.array_contains("_gtoks", w).cast("int")
            for w in GOPHER_STOPWORDS[1:]
        ),
        F.array_contains("_gtoks", GOPHER_STOPWORDS[0]).cast("int"),
    )
    dup_line_frac = F.when(n_lines <= 0, F.lit(0.0)).otherwise(
        _grid4(n_lines - F.size(F.array_distinct("_glines")), n_lines)
    )
    grams = F.expr(
        "CASE WHEN size(_gtoks) < 2 THEN cast(array() as array<string>) "
        "ELSE transform(sequence(0, size(_gtoks) - 2), "
        "i -> concat(_gtoks[i], ' ', _gtoks[i+1])) END"
    )
    n_grams = F.size(grams)
    dup_2gram_frac = F.when(n_grams <= 0, F.lit(0.0)).otherwise(
        _grid4(n_grams - F.size(F.array_distinct(grams)), n_grams)
    )
    signal_cols = [
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        stop_hits.alias("stop_hits"),
        dup_line_frac.alias("dup_line_frac"),
        dup_2gram_frac.alias("dup_2gram_frac"),
    ]
    if select_all:
        flagged = d.select(*docs.columns, *signal_cols)
    else:
        flagged = d.select(id_col, *signal_cols)
    preds = _gopher_pass_preds(
        min_words, max_words, min_mean_word_len, max_mean_word_len,
        max_symbol_ratio, max_bullet_frac, max_ellipsis_frac,
        min_stop_hits, max_dup_line_frac, max_dup_2gram_frac,
    )
    keep = functools.reduce(lambda a, b: a & b, preds.values())
    return flagged.withColumn("keep", keep)


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Corpus-trained unigram language-model score per document — the
    relational stand-in for CCNet/KenLM perplexity filtering (Wenzek et
    al., "CCNet: Extracting High Quality Monolingual Datasets from Web
    Crawl Data", LREC 2020): documents whose tokens are improbable under
    the corpus's own unigram distribution are OOD noise (mojibake, code
    soup, wrong language); corpus builds cut the low tail.

    ``avg_logprob`` = mean over the doc's tokens of ln(tf(token)/N), where
    tf comes from THIS corpus (self-trained, no external model).  Higher
    (closer to 0) = more typical.

    Execution: one exploded-token scan feeds both the term-frequency table
    and the per-doc stream; the tf join is an equi-join on term
    (AQE-skew-splittable — 'the' is a hot key); the 1-row corpus total
    broadcasts.  Cross-engine exactness: each token's ln() result is
    quantized to a 1e-6 grid as a long BEFORE the per-doc sum (same recipe
    as BM25 — ln may differ by 1 ulp between engines only at the grid
    boundary, and sums must be order-free), and the mean is the tie-free
    integer-grid division (never round(sum/n) — see CLAUDE.md)."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "filter(split(lower(trim(coalesce(text, ''))), '\\\\s+'), "
                "t -> t != '')"
            )
        ).alias("term"),
    )
    tf = toks.groupBy("term").agg(F.count("*").alias("tf"))
    total = tf.agg(F.sum("tf").alias("n_total"))
    logp_e6 = F.round(
        F.log(F.col("tf") / F.col("n_total")) * 1e6
    ).cast("long")
    scored = (
        toks.join(tf, "term")
        .crossJoin(F.broadcast(total))
        .select("doc_id", logp_e6.alias("_lp"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("_lp").alias("_slp"))
        .select(
            "doc_id",
            "n_tokens",
            (F.expr("_slp div n_tokens") / 1e6).alias("avg_logprob"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("avg_logprob", F.lit(0.0)).alias("avg_logprob"),
        )
    )


def text_profile(docs: DataFrame) -> DataFrame:
    """One-pass profile: doc_id, token counts, ratios, quality, lang, md5."""
    return docs.select(
        "doc_id",
        token_count().alias("n_tokens"),
        F.round(punct_ratio(), 4).alias("punct_ratio"),
        F.round(stopword_ratio(), 4).alias("stopword_ratio"),
        quality_score().alias("quality"),
        lang_id().alias("lang_pred"),
        fingerprint().alias("fp_md5"),
    )


def top_tokens(docs: DataFrame, k: int = 50, capacity: int = 4096,
               col: str = "text") -> DataFrame:
    """EXACT corpus-wide top-k most-frequent tokens at unbounded vocabulary,
    without ever shuffling the full (token, count) space: distributed
    Misra-Gries candidate generation + an exact recount of the candidates.

    Why not a plain groupBy(token)?  At 100 TB the token key space is
    billions of distinct strings; the full-width shuffle is the cost.  The
    classic two-pass instead (Misra & Gries 1982 summaries as the candidate
    filter):

    1. Each partition builds an MG(``capacity``) summary in one pass via
       ``mapInPandas`` (Arrow-batched; the dict lives across batches within
       the partition) — at most ``capacity`` candidate tokens per partition,
       plus one NULL-token marker row carrying the partition's token total
       (so N needs no extra corpus scan).  Pigeonhole guarantee: any token
       with GLOBAL count > N/capacity exceeds n_p/capacity in at least one
       partition and therefore survives that partition's summary, so the
       candidate union is a superset of every such token.
    2. The exact pass re-tokenizes, broadcast-semi-joins the bounded
       candidate set, and counts ONLY candidates — a map-side-combinable
       aggregate over ≤ partitions*capacity keys.

    Exactly two corpus scans; the summary frame (≤ partitions*capacity
    rows) is persisted across its two consumers and released before
    return.  The result is exact (recounted), deterministic (count desc,
    token asc tie-break), and SAFE by a runtime check: if the k-th exact
    count does not exceed N/capacity the superset guarantee cannot certify
    completeness and this raises (raise ``capacity``).  Sketch error never
    reaches the output — MG only proposes candidates."""
    from pyspark.sql import Window as W

    def _mg(batches):
        import re as _re

        import pandas as _pd

        counts: dict[str, int] = {}
        n_part = 0
        # tokenize EXACTLY like the recount pass and the oracle: space-only
        # trim (Spark/DuckDB trim() strip ' ' only — Python str.strip()
        # would eat \t/\n edges) and the explicit ASCII whitespace class
        # (Python's \s is Unicode-aware and splits on \xa0/　, so a
        # token containing them would never be PROPOSED as a candidate and
        # the pigeonhole completeness argument breaks — caught by the
        # adversarial contract suite)
        for pdf in batches:
            for text in pdf[col]:
                toks = _re.split(
                    "[ \t\n\x0b\f\r]+", str(text or "").lower().strip(" ")
                )
                n_part += len(toks)
                for t in toks:
                    if t in counts:
                        counts[t] += 1
                    elif len(counts) < capacity:
                        counts[t] = 1
                    else:
                        # decrement-all step; drop zeros
                        dead = []
                        for kk in counts:
                            counts[kk] -= 1
                            if counts[kk] == 0:
                                dead.append(kk)
                        for kk in dead:
                            del counts[kk]
        yield _pd.DataFrame(
            {"tok": list(counts.keys()) + [None], "cnt": [0] * len(counts) + [n_part]}
        )

    summary = docs.select(col).mapInPandas(
        _mg, schema="tok string, cnt long"
    ).persist()
    try:
        cands = summary.filter(F.col("tok").isNotNull()).select("tok").distinct()
        n_total = (
            summary.filter(F.col("tok").isNull())
            .agg(F.sum("cnt").alias("n"))
            .collect()[0]["n"]
        ) or 0
        toks = docs.select(
            F.explode(
                F.split(
                    F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))),
                    "[ \t\n\x0b\f\r]+",
                )
            ).alias("tok")
        )
        exact = (
            toks.join(F.broadcast(cands), "tok", "left_semi")
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        w = W.orderBy(F.col("n").desc(), F.col("tok").asc())
        rows = (
            exact.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .collect()
        )
    finally:
        summary.unpersist()
    if len(rows) == k:
        kth = min(r["n"] for r in rows)
        if kth * capacity <= n_total:
            raise ValueError(
                f"top_tokens: k-th count {kth} <= N/capacity "
                f"({n_total}/{capacity}) — the MG candidate superset cannot "
                f"be certified complete; raise capacity"
            )
    return docs.sparkSession.createDataFrame(
        [(r["tok"], r["n"]) for r in rows], "tok string, n long"
    )


def decontaminate(
    train: DataFrame,
    test: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag every TRAIN document sharing ≥ 1
    token ``n``-gram with the held-out TEST set — the removal pass (Brown
    et al., GPT-3 appendix C; 13-gram overlap is the published recipe, the
    ``n`` here is a knob) that complements :func:`contamination_report`'s
    per-test audit.  Returns one row per train doc:
    ``(id_col, n_hits, contaminated)`` where ``n_hits`` counts DISTINCT
    contaminated shingles; callers drop ``contaminated`` rows.

    Execution, 100-TB shape: the eval set is tiny by construction
    (benchmarks are kilodocs, the corpus is terabytes), so its distinct
    shingle fingerprints — 32-bit md5-prefix hashes, the same
    engine-portable trick as the winnowing kernel — are BROADCAST; the
    train side explodes shingles, broadcast-hash-joins (no shuffle of the
    corpus), and the per-doc count is map-side combinable.  The corpus is
    scanned once and never shuffled at full width; the only wide op is the
    final bounded groupBy on ``id_col``.  A hash collision flags a clean
    doc (never the reverse); at 32 bits × kilodoc eval sets the rate is
    ~|eval_fps|/2^32 per shingle and the oracle computes the identical
    hash, so the gate stays exact."""
    h = F.conv(F.substring(F.md5("sh"), 1, 8), 16, 10).cast("long")
    te = (
        with_shingles(test, col=col, n=n, out="shingles")
        .select(F.explode("shingles").alias("sh"))
        .select(h.alias("fp"))
        .distinct()
    )
    tr = (
        with_shingles(train, col=col, n=n, out="shingles")
        .select(id_col, F.explode("shingles").alias("sh"))
        .select(id_col, h.alias("fp"))
    )
    hits = (
        tr.join(F.broadcast(te), "fp", "left_semi")
        .groupBy(id_col)
        .agg(F.count_distinct("fp").alias("n_hits"))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0).cast("long")).alias("n_hits"),
            F.col("n_hits").isNotNull().alias("contaminated"),
        )
    )


def _bloom_pos(sh_col, j: int, m_bits: int):
    """Bit position j of a shingle: salted-md5 prefix mod m — the k
    independent hash functions of the filter, engine-portable (md5 + conv
    exist verbatim in Spark and DuckDB; the value is non-negative so % is
    safe in both)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(sh_col, F.lit(f"|{j}"))), 1, 8), 16, 10
        ).cast("long")
        % m_bits
    ).cast("int")


def bloom_bits(
    test: DataFrame, n: int = 3, m_bits: int = 1 << 16, k: int = 4,
    col: str = "text",
) -> DataFrame:
    """The test-set Bloom filter as a relation: the DISTINCT set-bit
    positions (≤ min(m_bits, k·|test shingles|) rows).  Kept relational so
    the filter build itself is a plain bounded aggregation; callers that
    want the physical bitset fold these into words (see
    :func:`bloom_decontaminate`)."""
    sh = with_shingles(test, col=col, n=n, out="shingles").select(
        F.explode("shingles").alias("sh")
    )
    poss = [sh.select(_bloom_pos(F.col("sh"), j, m_bits).alias("pos"))
            for j in range(k)]
    out = poss[0]
    for p in poss[1:]:
        out = out.unionAll(p)
    return out.distinct()


def bloom_decontaminate(
    train: DataFrame,
    test: DataFrame,
    n: int = 3,
    m_bits: int = 1 << 16,
    k: int = 4,
    id_col: str = "doc_id",
    col: str = "text",
) -> DataFrame:
    """Bloom-filter decontamination (Bloom CACM 1970 + the GPT-3 App. C
    removal pass): flag every TRAIN doc whose token ``n``-gram set hits the
    TEST set's Bloom filter — the 100-TB shape of :func:`decontaminate`.

    Where the exact op broadcast-joins the eval fingerprint SET (size ∝
    |eval shingles|), this one reduces the eval side to a FIXED-SIZE bitset
    (``m_bits`` bits = m/8 bytes — 8 KB at the default — regardless of eval
    size) embedded as a literal word array in the plan: the corpus scan is
    then PURE MAP — per shingle, k salted-md5 bit probes against the
    in-plan words, no join, no corpus shuffle except the final bounded
    per-doc count.  That is the production trade: a deterministic
    false-positive rate ≈ (1−e^{−k·n_fps/m})^k (never false negatives — a
    clean doc can be flagged, a contaminated one never missed) for a
    membership structure whose size is independent of the eval corpus, so
    a 1000-executor job ships 8 KB per task instead of re-broadcasting a
    growing fingerprint table per batch.

    The bitset build collects the set-bit positions once — bounded by
    ``m_bits`` (a constant, default 65 536 ints), the same
    provably-small-frame rule as the connected-components driver path.
    Both the positions and the probes use the identical salted-md5
    expression, so a DuckDB oracle reproduces membership — including the
    false positives — bit-for-bit.

    Returns one row per train doc: ``(id_col, n_fps, n_bloom_hits,
    contaminated)`` where ``n_fps`` counts the doc's distinct shingles and
    ``n_bloom_hits`` those passing all k bit probes.
    """
    assert m_bits % 64 == 0, "m_bits must fill whole 64-bit words"
    set_bits = [r.pos for r in bloom_bits(
        test, n=n, m_bits=m_bits, k=k, col=col
    ).collect()]
    words = [0] * (m_bits // 64)
    for pos in set_bits:
        words[pos // 64] |= 1 << (pos % 64)
    # two's-complement into signed longs (bit 63 must survive F.lit)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    wlit = F.lit(words)

    tr = with_shingles(train, col=col, n=n, out="shingles").select(
        id_col, F.explode("shingles").alias("sh")
    )
    # bind the k md5 positions through an explode(array(...)) Generate
    # barrier so each salted md5 is computed ONCE per shingle (the
    # CollapseProject rule would otherwise inline the hash into both the
    # word-index and the shift of every probe — the with_shingles lesson)
    pos_arr = F.array(*[_bloom_pos(F.col("sh"), j, m_bits) for j in range(k)])
    probed = tr.select(id_col, F.explode(F.array(pos_arr)).alias("_ps"))

    def _bit(j: int):
        # pyspark's F.shiftleft only takes a python-int shift; the SQL
        # function accepts a column, so the mask goes through F.expr
        p = F.element_at(F.col("_ps"), j + 1)
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), element_at(_ps, {j + 1}) % 64)"
        )
        return (
            F.element_at(wlit, (p / 64).cast("int") + 1).bitwiseAND(mask)
            != 0
        )

    all_hit = _bit(0)
    for j in range(1, k):
        all_hit = all_hit & _bit(j)
    hits = (
        probed.select(id_col, all_hit.alias("_inb"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_fps"),
            F.sum(F.col("_inb").cast("long")).alias("n_bloom_hits"),
        )
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_fps", F.lit(0).cast("long")).alias("n_fps"),
            F.coalesce("n_bloom_hits", F.lit(0).cast("long")).alias(
                "n_bloom_hits"
            ),
            (F.coalesce("n_bloom_hits", F.lit(0).cast("long")) > 0).alias(
                "contaminated"
            ),
        )
    )


def char_entropy(docs: DataFrame, id_col: str = "doc_id",
                 col: str = "text") -> DataFrame:
    """Per-document character-level Shannon entropy (nats) — the cheap
    mojibake / binary-junk / compression-artifact detector a web-corpus
    quality battery runs next to the Gopher rules: natural prose sits in a
    narrow entropy band, base64 blobs and repeated-char padding fall far
    outside it.

    Returns ``(id_col, n_chars, entropy)`` with ``entropy = −Σ p·ln p``
    over the doc's character distribution (0.0 for empty docs).

    Execution: explode to (doc, char) — a narrow generate —, one groupBy
    (doc, char) with map-side combine (the key space per doc is the
    alphabet, so the shuffle is bounded by docs × |alphabet|, not corpus
    bytes), then a per-doc sum.  Cross-engine exactness: each character
    class's term ``(c/n)·ln(n/c)`` is quantized to the 1e-6 grid as a long
    BEFORE the per-doc sum (the BM25/unigram-LM recipe — float sums must
    be order-free), so the 6-dp entropy is bit-identical across engines
    and partition orders."""
    chars = docs.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"CASE WHEN length(coalesce({col}, '')) = 0 "
                f"THEN cast(array() as array<string>) "
                f"ELSE transform(sequence(1, length({col})), "
                f"i -> substring({col}, i, 1)) END"
            )
        ).alias("ch"),
    )
    counts = chars.groupBy(id_col, "ch").agg(F.count(F.lit(1)).alias("c"))
    n = counts.groupBy(id_col).agg(F.sum("c").alias("n"))
    term_e6 = F.round(
        F.lit(1e6) * (F.col("c") / F.col("n")) * F.log(F.col("n") / F.col("c"))
    ).cast("long")
    scored = (
        counts.join(n, id_col)
        .select(id_col, F.col("n"), term_e6.alias("_t"))
        .groupBy(id_col)
        .agg(F.max("n").alias("n_chars"), F.sum("_t").alias("_s"))
        .select(id_col, "n_chars", (F.col("_s") / 1e6).alias("entropy"))
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chars", F.lit(0).cast("long")).alias("n_chars"),
            F.coalesce("entropy", F.lit(0.0)).alias("entropy"),
        )
    )


def bigram_logprob(docs: DataFrame, id_col: str = "doc_id",
                   col: str = "text") -> DataFrame:
    """Corpus-trained BIGRAM language-model score per document — one Markov
    order above :func:`unigram_logprob`, the next rung toward the KenLM
    perplexity filter of CCNet: token-salad documents that pass a unigram
    screen (common words, wrong order) score poorly under conditionals.

    ``avg_logprob`` = mean over the doc's bigrams of
    ``ln (c(w1,w2)+1) / (c(w1·)+V)`` — add-one (Laplace) smoothing over the
    corpus vocabulary ``V``, self-trained, no external model.  Docs with
    < 2 tokens return ``(0, 0.0)``.

    Execution: the bigram stream is positional pairs via a
    sequence/transform lambda behind the explode(array(·)) CollapseProject
    barrier (see :func:`with_shingles`).  Bigram counts are one
    map-side-combinable aggregate over it; CONTEXT counts roll up from the
    bigram count table itself (c(w1·) = Σ_w2 c(w1,w2)) — never a separate
    corpus pass; the vocabulary size is a 1-row broadcast (one
    unigram-distinct pass).  Catalyst does not share the tokenize subtree
    between the count build and the scoring probe, so the corpus is
    tokenized three times (count pass, vocab pass, probe pass) — at the
    100 TB design point, persist the exploded pair stream (or extract once
    to a table) exactly as the corpus funnel persists extraction.  The
    scoring join is an equi-join on the bigram key (AQE-skew-splittable —
    stopword pairs are hot).
    Cross-engine exactness: per-bigram ln quantized to the 1e-6 grid before
    the long sum, tie-free integer-grid mean (never round(sum/n))."""
    arr = (
        f"filter(split(lower(trim(coalesce({col}, ''))), '\\\\s+'), "
        f"t -> t != '')"
    )
    d = docs.select(
        F.col(id_col), F.explode(F.array(F.expr(arr))).alias("_toks")
    )
    bg = d.select(
        id_col,
        F.explode(
            F.expr(
                "CASE WHEN size(_toks) < 2 THEN "
                "cast(array() as array<struct<w1:string,w2:string>>) "
                "ELSE transform(sequence(0, size(_toks) - 2), "
                "i -> struct(_toks[i] as w1, _toks[i+1] as w2)) END"
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # context counts roll up from the bigram table (c(w1·) = Σ_w2 c(w1,w2))
    # instead of a THIRD corpus scan+explode — at 100 TB the rollup input is
    # the bounded (w1,w2) count table, not the corpus
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = d.select(F.explode("_toks").alias("t")).agg(
        F.count_distinct("t").alias("v")
    )
    lp_e6 = F.round(
        F.log((F.col("c12") + 1) / (F.col("c1") + F.col("v"))) * 1e6
    ).cast("long")
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(id_col, lp_e6.alias("_lp"))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("_lp").alias("_s"))
        .select(
            id_col,
            "n_bigrams",
            (F.expr("_s div n_bigrams") / 1e6).alias("avg_logprob"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            F.coalesce("avg_logprob", F.lit(0.0)).alias("avg_logprob"),
        )
    )


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    col: str = "text",
) -> DataFrame:
    """Per-document top-k TF-IDF keywords (Sparck Jones, "A statistical
    interpretation of term specificity", JDoc 1972): ``tf · ln(N/df)`` with
    the unsmoothed idf — the standard keyword/topic signal a curation
    pipeline attaches per document (cluster labeling, topic balance
    reports, near-dup triage).

    Fully relational: explode → (doc, term) counts (map-side combinable)
    → term document frequencies → broadcast-joined corpus size → one
    ``row_number`` window PARTITIONED BY doc (bounded by the doc's distinct
    term count, never corpus-wide).  Determinism across engines: the score
    is quantized to the 1e-6 grid immediately (``round(tf·idf·10⁶)`` as a
    long — the BM25 precedent), ranked on the exact integer with ``term``
    as tiebreak, and reported on the 1e-4 grid via integer division (no
    round-at-4dp tie, CLAUDE.md).

    Returns ``(doc_id, rank, term, score)``, ``rank`` in 1..k.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.lower(F.trim(F.coalesce(F.col(col), F.lit("")))), r"\s+")
        ).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    q = F.round(
        F.col("tf")
        * F.log(F.col("n_docs").cast("double") / F.col("df"))
        * 1e6
    ).cast("long")
    # NB: unlike bm25_topk (df filtered to a handful of query terms), the
    # full-vocabulary df table is NOT broadcastable at corpus scale — this
    # is a shuffle join on term, co-partitioned with the tf aggregate's own
    # output partitioning, so Catalyst elides the second exchange.
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", q.alias("_q"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("_q"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            F.col("rank").cast("int").alias("rank"),
            "term",
            (F.expr("_q div 100") / 10000.0).alias("score"),
        )
    )


def vocab_growth(
    docs: DataFrame,
    bucket_docs: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Heaps-law vocabulary growth curve: cumulative distinct-token count
    vs cumulative token count along the corpus prefix order — the curve a
    corpus build reads to judge source diversity (a flattening vocab means
    the new data is rehash; tokenizer teams read the same curve to size
    vocabularies).  Prefix order is ``id_col`` bucketed into
    ``bucket_docs``-document chunks, so the report is reproducible on any
    engine and independent of partitioning.

    The cumulative-distinct trick is first-occurrence attribution: a
    token's contribution to the vocabulary happens in the bucket of its
    ``min(doc_id)`` — one map-side-combinable min per distinct token, one
    per-bucket count, NO quadratic prefix recount (the naive "distinct
    over every prefix" is O(buckets·corpus)).  Token totals fold per
    bucket the same way; both rollups then cumsum over a single global
    window whose input is the ≤``n_docs/bucket_docs``-row bucket frame —
    metadata-scale, never corpus-scale.  Zero-token (NULL/empty) documents
    still count toward ``docs_cum``.

    Returns ``(bucket, docs_cum, tokens_cum, vocab_cum)`` ordered by
    bucket.
    """
    from pyspark.sql import Window

    bucket = F.expr(f"{id_col} div {bucket_docs}").alias("bucket")
    toks = docs.select(
        F.col(id_col),
        bucket,
        F.explode(
            F.filter(
                F.split(
                    F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))),
                    r"\s+",
                ),
                lambda x: x != "",
            )
        ).alias("tok"),
    )
    spine = docs.select(bucket).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("_docs")
    )
    per_bucket_toks = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("_toks")
    )
    new_types = (
        toks.groupBy("tok")
        .agg(F.min(id_col).alias("_first"))
        .select(F.expr(f"_first div {bucket_docs}").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("_new"))
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(per_bucket_toks, "bucket", "left")
        .join(new_types, "bucket", "left")
        .select(
            "bucket",
            F.sum("_docs").over(w).alias("docs_cum"),
            F.sum(F.coalesce("_toks", F.lit(0).cast("long"))).over(w).alias("tokens_cum"),
            F.sum(F.coalesce("_new", F.lit(0).cast("long"))).over(w).alias("vocab_cum"),
        )
        .orderBy("bucket")
    )


def zipf_fit(
    freq: DataFrame,
    token_col: str = "tok",
    count_col: str = "n",
    grid: int = 1000,
) -> DataFrame:
    """Zipf-law fit over a top-k token-frequency table: the OLS slope of
    ``ln(count)`` against ``ln(rank)`` — natural language sits near −1
    (Zipf 1949); a much flatter slope flags template/boilerplate-heavy or
    synthetic corpora, a much steeper one vocabulary collapse (the
    complementary corpus-shape diagnostic to :func:`vocab_growth`'s
    Heaps curve).  Feed it :func:`top_tokens` output — the input contract
    is a BOUNDED frequency table (≤ a few hundred rows), so the single
    ranking window here is metadata-scale by construction (the rrf_fuse
    precedent); the corpus-scale work happened upstream in the
    candidate-generation pass.

    Cross-engine exactness: ln values are quantized to the ``1/grid``
    lattice (the bigram_logprob idiom) and the whole regression runs on
    exact int64 arithmetic — N = k·Σxy − Σx·Σy, D = k·Σxx − (Σx)²,
    slope = N/D emitted on the 1e-4 grid.  Because Spark's ``div``
    truncates toward zero while engines disagree on negative floor
    division, the division runs on |N| and the sign is re-applied —
    identical everywhere.  Bounds: with counts ≤ 1e12 and k ≤ 500 every
    intermediate stays ≤ ~1e16 < 2^63.

    Returns one row: ``(k, n_top, n_kth, slope_e4)`` — ``slope_e4`` NULL
    when k < 2 (no regression).
    """
    from pyspark.sql import Window

    rank = F.row_number().over(
        Window.orderBy(F.desc(count_col), F.asc(token_col))
    )

    def ln_grid(c):
        return F.floor(F.log(c.cast("double")) * F.lit(float(grid))).cast(
            "long"
        )

    g = freq.select(
        F.col(count_col).alias("_n"), rank.alias("_rank")
    ).select(
        "_n",
        ln_grid(F.col("_rank")).alias("_x"),
        ln_grid(F.col("_n")).alias("_y"),
    )
    a = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.max("_n").alias("n_top"),
        F.min("_n").alias("n_kth"),
    )
    nd = a.select(
        "k",
        "n_top",
        "n_kth",
        (F.col("k") * F.col("_sxy") - F.col("_sx") * F.col("_sy"))
        .cast("long")
        .alias("_num"),
        (F.col("k") * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
        .cast("long")
        .alias("_den"),
    )
    return nd.select(
        "k",
        "n_top",
        "n_kth",
        F.when(
            (F.col("k") < 2) | (F.col("_den") == 0),
            F.lit(None).cast("long"),
        )
        .otherwise(
            F.when(F.col("_num") < 0, F.lit(-1))
            .otherwise(F.lit(1))
            .cast("long")
            * F.expr("(abs(_num) * 10000) div _den")
        )
        .alias("slope_e4"),
    )


def code_likeness(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_e4: int = 200,
) -> DataFrame:
    """Code-likeness scoring: the language-ID analogue for *code vs prose*
    — a corpus build routes code-like documents to a separate mixture
    bucket (or a code-specific quality battery) instead of letting Gopher
    prose rules throw them away.  Four cheap surface signals per document,
    all exactly countable on both engines:

    * ``n_sym`` — occurrences of the code-symbol class ``[{}();=<>]``
      (braces, semicolons, comparison/assignment — prose-rare, code-dense);
    * ``n_snake`` — ``snake_case`` identifiers ``[a-z0-9]+_[a-z0-9]+``
      (leftmost-greedy in both Java-regex and RE2, so counts agree);
    * ``n_indent`` — lines opening with four spaces or a tab (block
      indentation; the HOF lambda runs once per ROW, the allowed budget);
    * ``n_kw`` — keyword hits ``def | return | import |#include`` with the
      trailing space inside the literal (poor-man's word boundary — ``\\b``
      is the kind of class the engines disagree on, plain literals are not).

    Score = length-normalized weighted sum on the e4 integer grid via
    truncating ``div`` (the cur_scorecard idiom — never ``round()`` a
    grid value), plus a flat +2000 for a markdown code fence; ``is_code``
    gates at ``threshold_e4``.  Map-only plan: no shuffle, no Python, scales
    as a pure scan — the filter pushes to the parquet reader and the whole
    row fits one codegen stage.

    Returns ``(id_col, n_sym, n_snake, n_indent, n_kw, n_lines,
    code_score_e4, is_code)``.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(txt, "\n")
    n_indent = F.size(
        F.filter(
            lines,
            lambda x: x.startswith("    ") | x.startswith("\t"),
        )
    ).cast("long")
    base = docs.select(
        F.col(id_col),
        F.regexp_count(txt, F.lit(r"[{}();=<>]")).cast("long").alias("n_sym"),
        F.regexp_count(txt, F.lit("[a-z0-9]+_[a-z0-9]+"))
        .cast("long")
        .alias("n_snake"),
        n_indent.alias("n_indent"),
        F.regexp_count(txt, F.lit("(def |return |import |#include)"))
        .cast("long")
        .alias("n_kw"),
        F.size(lines).cast("long").alias("n_lines"),
        F.greatest(F.length(txt), F.lit(1)).cast("long").alias("_len"),
        txt.contains("```").cast("long").alias("_fence"),
    )
    score = (
        F.expr(
            "((n_sym * 2 + n_snake * 3 + n_indent * 5 + n_kw * 5) * 10000)"
            " div _len"
        )
        + F.col("_fence") * 2000
    ).cast("long")
    return base.select(
        id_col,
        "n_sym",
        "n_snake",
        "n_indent",
        "n_kw",
        "n_lines",
        score.alias("code_score_e4"),
        (score >= threshold_e4).alias("is_code"),
    )


def readability(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Readability scoring on the integer grid: Flesch–Kincaid grade level
    and Flesch reading ease (Kincaid et al. 1975) from three exactly
    countable surface signals — the classic prose-quality router a corpus
    build runs next to the Gopher rules (e.g. keep grade 4–14 for a
    general-web mix, route outliers to review).

    Counts (all single JVM-side regex passes, oracle-identical by
    construction): ``n_words`` = the canonical whitespace token count;
    ``n_sents`` = maximal ``[.!?]+`` runs, clamped to ≥1 (headlines have
    words but no terminator); ``n_syll`` = maximal ``[aeiouy]+`` vowel
    groups in the lowercased text — the standard syllable surrogate: exact
    on the engines' shared ASCII semantics, and biased identically across
    docs so ORDERING (what a router consumes) is preserved even where the
    count misses English edge cases like silent-e.

    Scores on the e3 grid via TRUNCATING integer division (the parity
    rule — never round() a grid value):
    ``fk_grade_e3  = (390·w) div s + (11800·syl) div w − 15590``
    ``ease_e3      = 206835 − (1015·w) div s − (84600·syl) div w``
    Blank docs (empty/NULL text) keep their row with NULL scores — a
    corpus audit must see them, not lose them.  Map-only: no shuffle, no
    Python, pure scan at any scale."""
    txt = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    blank = txt == ""
    base = docs.select(
        id_col,
        blank.alias("_blank"),
        token_count(txt).cast("long").alias("n_words"),
        F.greatest(
            F.regexp_count(txt, F.lit(r"[.!?]+")), F.lit(1)
        ).cast("long").alias("n_sents"),
        F.regexp_count(F.lower(txt), F.lit("[aeiouy]+"))
        .cast("long")
        .alias("n_syll"),
    )
    fk = F.expr(
        "(390 * n_words) div n_sents + (11800 * n_syll) div n_words - 15590"
    ).cast("long")
    ease = F.expr(
        "206835 - (1015 * n_words) div n_sents - (84600 * n_syll) div n_words"
    ).cast("long")
    nullify = lambda c: F.when(F.col("_blank"), F.lit(None).cast("long")).otherwise(c)  # noqa: E731
    return base.select(
        id_col,
        nullify(F.col("n_words")).alias("n_words"),
        nullify(F.col("n_sents")).alias("n_sents"),
        nullify(F.col("n_syll")).alias("n_syll"),
        nullify(fk).alias("fk_grade_e3"),
        nullify(ease).alias("ease_e3"),
    )


def lexical_diversity(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document lexical diversity: type–token ratio and hapax-legomenon
    ratio over the canonical whitespace tokens — the cheap template /
    boilerplate / keyword-stuffing detector (machine-generated spam repeats
    a tiny vocabulary → low TTR; natural prose at web-document lengths sits
    in a stable band; both ratios feed the quality-router ensemble next to
    :func:`readability` and the Gopher rules).

    Shape: explode → two-level aggregate — ``(doc, token)`` counts (partial
    map-side combine collapses each doc's repeats before the shuffle), then
    a per-doc fold counting tokens / types / count-1 types.  Everything is
    codegen'd; the only wide op hashes on the doc key both times, so AQE
    coalesces the second exchange over the already-tiny per-doc partials.
    This is the scale-safe form — array_distinct / HOF lambdas per row
    would be interpreted, and corpus-wide token frames are exactly what
    top_tokens/vocab_growth already shuffle, so at 10^12 turns the cost is
    the tokenize pass itself.

    Ratios on the e4 grid by truncating div.  Docs with NO tokens
    (empty/NULL text) drop out — inner-group semantics, same convention as
    cur_chunks; the blank-doc census lives in :func:`readability` /
    profile.  ``n_tokens`` here counts NON-EMPTY tokens (the empty split
    artifact is filtered), so it can differ by 1 from the raw
    token_count() convention on blank-ish texts — documented, mirrored in
    the oracle."""
    tok = docs.select(
        id_col, F.explode(tokens(F.coalesce(F.col(text_col), F.lit("")))).alias("t")
    ).filter(F.col("t") != "")
    per_tok = tok.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("cnt"))
    agg = per_tok.groupBy(id_col).agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum((F.col("cnt") == 1).cast("long")).alias("n_hapax"),
    )
    return agg.select(
        id_col,
        "n_tokens",
        "n_types",
        "n_hapax",
        F.expr("(n_types * 10000) div n_tokens").cast("long").alias("ttr_e4"),
        F.expr("(n_hapax * 10000) div n_tokens").cast("long").alias("hapax_e4"),
    )


# Classic UTF-8-decoded-as-Latin-1 artifacts, as literal 2-char sequences
# (an alternation of literals, not char-class ranges, so Java regex and RE2
# agree by construction): 'â€' opens the smart-quote/dash family
# (â€™ â€œ â€“ …), 'Ã·Â' prefixes cover the mangled Latin-1 letter block
# (Ã© Ã± Ã¼ … Â« Â° …).
MOJIBAKE_RE = "â€|Ã©|Ã¨|Ã¡|Ã³|Ãº|Ã±|Ã§|Ã¤|Ã¶|Ã¼|Ã«|Ã¢|Ã®|Â«|Â»|Â·|Â°|Â±"


def encoding_flags(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Encoding-damage detector: per-document counts of the three surface
    signals of a broken decode pipeline, each an exactly countable pattern
    (no statistics, no thresholds to tune — if any fires, some upstream
    stage mangled bytes):

    - ``n_replacement`` — U+FFFD replacement characters (a decoder already
      KNEW it lost bytes and said so);
    - ``n_mojibake`` — classic UTF-8-read-as-Latin-1 digraphs
      (:data:`MOJIBAKE_RE`: â€™-family punctuation, Ã©-family letters —
      the ftfy repertoire's high-precision core as literal alternations);
    - ``n_ctrl`` — C0 control characters EXCLUDING the tokenizer's
      whitespace set (tab/LF/VT/FF/CR stay legal, same ``[ \\t\\n\\x0b
      \\f\\r]`` convention as every tokenizer in the suite), i.e.
      ``[\\x00-\\x08\\x0e-\\x1f]`` — binary junk pasted into text.

    ``is_damaged`` = any signal > 0 — route to re-decode/drop, never
    train on it (damaged text poisons dedup too: one U+FFFD differs from
    every clean near-dup).  NULL text counts as clean-empty (0s, not
    NULLs: the flag answers "did we SEE damage", and in no-text we saw
    none).  Map-only: three regexp_count passes inside one codegen span,
    zero shuffle at any scale — run it with the Gopher battery.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    n_repl = F.regexp_count(txt, F.lit("�")).cast("long")
    n_moji = F.regexp_count(txt, F.lit(MOJIBAKE_RE)).cast("long")
    n_ctrl = F.regexp_count(txt, F.lit(r"[\x00-\x08\x0e-\x1f]")).cast("long")
    return docs.select(
        id_col,
        n_repl.alias("n_replacement"),
        n_moji.alias("n_mojibake"),
        n_ctrl.alias("n_ctrl"),
        ((n_repl + n_moji + n_ctrl) > 0).alias("is_damaged"),
    )


def rule_ablation(docs: DataFrame, **gopher_params) -> DataFrame:
    """Rule-wise ablation of the Gopher battery: one row per rule with how
    many documents FAIL it (``n_fail``) and how many it rejects UNIQUELY
    (``n_unique_reject`` — docs every OTHER rule would keep, i.e. exactly
    the documents the corpus regains if this one threshold is loosened) —
    the marginal-value table every threshold-tuning pass reads before
    touching a knob.  ``n_docs`` rides along so rates are one division
    away.  Thresholds are :func:`gopher_rules`' kwargs, passed through
    verbatim; the per-rule comparisons come from the SAME
    :func:`_gopher_pass_preds` the fused ``keep`` uses, so the ablation
    can never drift from the filter it ablates.

    Execution: the gopher signal pass (map-only, one corpus scan) → 8
    fail bits + their row-sum → ONE global aggregate (17 combinable sums,
    partial map-side, single-partition exchange carries one row) → the
    8-row table via a literal-struct explode.  Corpus-size-independent
    output; at 100 TB this costs exactly one Gopher pass plus a
    17-column partial-agg shuffle of one row per task.
    """
    sig = gopher_rules(docs, **gopher_params)
    defaults = dict(
        min_words=50, max_words=100_000, min_mean_word_len=3.0,
        max_mean_word_len=10.0, max_symbol_ratio=0.1, max_bullet_frac=0.9,
        max_ellipsis_frac=0.3, min_stop_hits=2, max_dup_line_frac=0.3,
        max_dup_2gram_frac=0.2,
    )
    thresholds = {
        k: gopher_params.get(k, v)
        for k, v in defaults.items()
    }
    preds = _gopher_pass_preds(**thresholds)
    names = list(preds)
    fails = sig.select(
        *[(~p).cast("long").alias(f"_f_{k}") for k, p in preds.items()]
    ).withColumn(
        "_tot", functools.reduce(lambda a, b: a + b,
                                 [F.col(f"_f_{k}") for k in names]),
    )
    agg = fails.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(f"_f_{k}").alias(f"_nf_{k}") for k in names],
        *[
            F.sum(((F.col(f"_f_{k}") == 1) & (F.col("_tot") == 1)).cast("long"))
            .alias(f"_nu_{k}")
            for k in names
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(k).alias("rule"),
                F.coalesce(F.col(f"_nf_{k}"), F.lit(0)).cast("long").alias("n_fail"),
                F.coalesce(F.col(f"_nu_{k}"), F.lit(0)).cast("long")
                .alias("n_unique_reject"),
            )
            for k in names
        ]
    )
    return agg.select(F.explode(rows).alias("s"), F.col("_n")).select(
        F.col("s.rule").alias("rule"),
        F.col("s.n_fail").alias("n_fail"),
        F.col("s.n_unique_reject").alias("n_unique_reject"),
        F.col("_n").cast("long").alias("n_docs"),
    )


def tokenizer_fertility(
    docs: DataFrame,
    by: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-fertility table per group — the number every multilingual
    corpus owner reads before committing to a tokenizer: BPE-ish subword
    tokens per whitespace word (:func:`bpe_ish_token_count` /
    :func:`token_count`, the suite's two canonical counters — never inline
    re-spellings).  A language whose fertility is far above the corpus
    median is paying more context budget per word (the tokenizer is
    poorly fit to it), which silently skews any token-budgeted mixture
    (:func:`~sparkx.ops.corpus.mix_plan` allocates tokens, users consume
    words).

    ``fertility_e4`` is the truncating integer ratio ``bpe·10⁴ div ws``
    (nonnegative numerator — the negative-division engine divergence
    can't arise), exact on the e4 grid both engines; totals ride along so
    any other ratio is one division away.

    Execution: one narrow map (two regexp counts in a single codegen
    span) + one map-side-combinable aggregate; ≤ |groups| output rows,
    zero shuffle beyond the ≤|groups| exchange at any corpus size.
    Returns ``(by, n_docs, ws_tokens, bpe_tokens, fertility_e4)``.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    t = docs.select(
        F.col(by),
        token_count(txt).cast("long").alias("_ws"),
        bpe_ish_token_count(text_col).cast("long").alias("_bpe"),
    )
    return (
        t.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_ws").alias("ws_tokens"),
            F.sum("_bpe").alias("bpe_tokens"),
        )
        .select(
            by,
            "n_docs",
            "ws_tokens",
            "bpe_tokens",
            F.expr(
                "CAST((bpe_tokens * 10000) DIV greatest(ws_tokens, 1) "
                "AS BIGINT)"
            ).alias("fertility_e4"),
        )
    )


# literal alternations (no char classes, so Java regex and RE2 agree by
# construction — the MOJIBAKE_RE idiom); lowercased text is the input
COPYRIGHT_RE = "©|copyright|all rights reserved"
NOAI_RE = "do not train|noai|no-ai|opt.?out of.{0,20}training"
LICENSE_RE = "creative commons|cc-by|cc0|apache license|mit license|gpl"


def compliance_flags(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Licensing / opt-out surface-marker flags — the compliance screen a
    training-corpus build runs before mixing a source in: per document,
    does the text carry a copyright assertion (:data:`COPYRIGHT_RE`), an
    AI-training opt-out marker (:data:`NOAI_RE` — the noai/"do not
    train" repertoire), or an explicit license name
    (:data:`LICENSE_RE`)?  Surface markers are evidence for a HUMAN
    review queue and for per-source rollups (a source where 40% of docs
    assert opt-out needs a policy decision, not a regex) — the flags
    gate routing, they are not legal conclusions, and the patterns are
    high-precision literals by design (the encoding_flags philosophy:
    exactly countable, no thresholds).

    Map-only: three regexp matches over lowercased text in one codegen
    span, zero shuffle at any scale — run it with the Gopher battery.
    NULL text flags nothing.  Returns ``(id_col, has_copyright,
    has_noai, has_license, needs_review)``.
    """
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    has_c = F.regexp_count(low, F.lit(COPYRIGHT_RE)) > 0
    has_n = F.regexp_count(low, F.lit(NOAI_RE)) > 0
    has_l = F.regexp_count(low, F.lit(LICENSE_RE)) > 0
    return docs.select(
        id_col,
        has_c.alias("has_copyright"),
        has_n.alias("has_noai"),
        has_l.alias("has_license"),
        (has_c | has_n | has_l).alias("needs_review"),
    )


def dehyphenate_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Hyphenation line-break repair — the classic PDF/OCR extraction
    artifact (reference parser family: text blocks arrive with words
    split "exam-\\nple" at the original layout's line ends, plus
    invisible soft hyphens U+00AD): strip soft hyphens, normalize CRLF,
    then rejoin alphanumeric words split by ``-`` + newline.  Counts are
    derived from EXACT length deltas, not a second regexp count — the
    join pattern consumes its boundary characters, so leftmost
    non-overlapping match counts would undercount "a-\\nb-\\nc" chains;
    the length arithmetic is exact instead because each normalization
    step removes a fixed char count (soft hyphen 1, CRLF→LF 1, rejoined
    break 2).

    Replacement syntax differs per engine ($1 Java, \\\\1 RE2 + the 'g'
    flag DuckDB needs for replace-ALL) but the repertoire (captures,
    literal classes) is common — the oracle mirrors it verbatim.
    Map-only: three regexp_replace passes in one codegen span, zero
    shuffle at any scale.  Returns ``(id_col, n_soft_hyphens, n_crlf,
    n_hyphen_breaks, text_repaired)``.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    no_soft = F.regexp_replace(txt, "\u00ad", "")
    norm = F.regexp_replace(no_soft, r"\r\n", "\n")
    joined = F.regexp_replace(
        norm, r"([0-9A-Za-z])-\n([0-9A-Za-z])", r"$1$2"
    )
    return docs.select(
        id_col,
        (F.length(txt) - F.length(no_soft)).cast("long").alias(
            "n_soft_hyphens"
        ),
        (F.length(no_soft) - F.length(norm)).cast("long").alias("n_crlf"),
        F.floor(
            (F.length(norm) - F.length(joined)) / 2
        ).cast("long").alias("n_hyphen_breaks"),
        joined.alias("text_repaired"),
    )


def quality_calibration(
    docs: DataFrame,
    n_buckets: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    **gopher_params,
) -> DataFrame:
    """Calibration table for the cheap quality scorer against the Gopher
    rule battery — the question a corpus build answers before trusting
    :func:`quality_score` as a sampling weight: within each score bucket,
    what fraction of documents does the expensive battery
    (:func:`gopher_rules`) actually keep?  A well-calibrated scorer shows
    a monotone pass-rate curve; a flat one means the score is noise for
    this corpus and the mixture should weight on something else.  This is
    the scorer↔battery analog of :func:`rule_ablation`'s per-rule
    marginal table.

    Buckets are ``score·10⁴ div (10⁴/n_buckets)`` capped at the top
    bucket (exact integer arithmetic on the e4 grid the scorer already
    lives on); NULL-text documents (NULL score) land in the ``-1``
    sentinel bucket rather than vanishing.  ``pass_bp`` is the
    truncating basis-point rate ``n_pass·10⁴ div n_docs`` (nonnegative
    numerator — the engine-divergence-free form).

    Execution: gopher_rules' single map-only signal pass with
    ``select_all=True`` (no self-join — the funnel idiom) plus the score
    expression in the same projection, then one map-side-combinable
    aggregate of ≤ ``n_buckets+1`` rows.  Zero extra shuffle at any
    corpus size.  Returns ``(bucket, n_docs, n_pass, pass_bp)``.
    """
    if 10_000 % n_buckets != 0:
        raise ValueError("n_buckets must divide 10000")
    width = 10_000 // n_buckets
    g = gopher_rules(
        docs, select_all=True, text_col=text_col, id_col=id_col,
        **gopher_params,
    )
    t = g.select(
        F.round(quality_score(text_col) * 10_000).cast("long").alias("_q"),
        F.col("keep").cast("long").alias("_k"),
    )
    bucket = (
        F.when(F.col("_q").isNull(), F.lit(-1).cast("int"))
        .otherwise(
            F.least(
                F.expr(f"_q div {width}"), F.lit(n_buckets - 1)
            ).cast("int")
        )
    )
    return (
        t.select(bucket.alias("bucket"), "_k")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_k").alias("n_pass"),
        )
        .select(
            "bucket",
            "n_docs",
            "n_pass",
            F.expr("CAST((n_pass * 10000) DIV n_docs AS BIGINT)").alias(
                "pass_bp"
            ),
        )
    )
