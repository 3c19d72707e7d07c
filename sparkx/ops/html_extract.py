"""Main-content extraction from HTML: boilerplate stripping via local
text/link-density heuristics plus corpus-level block-frequency filtering.

This is the north-rule "HTML boilerplate strip … text-density + link-density
boilerplate classification" component re-expressed as codegen'd column
expressions — zero Python UDFs anywhere.  The two classifiers follow the
published heuristics line:

- **Local densitometry** (Kohlschütter et al., WSDM 2010 "Boilerplate
  Detection Using Shallow Text Features"; Pomikálek 2011 jusText): a block
  whose anchor-text share exceeds 1/3, or whose text is shorter than a
  minimum, is navigation/chrome, not content.
- **Corpus frequency** (the CCNet/OSCAR "most common lines are boilerplate"
  rule, Wenzek et al. 2020): a block whose exact text recurs across a large
  fraction of pages is template chrome regardless of its local shape.

The page *renderer* (`render_pages`) is the deterministic synthetic-DOM
generator the brief requires (no external data): each `documents` row is
rendered into a flat single-line page — nav, site menu, `<h1>`, three
content paragraphs (word-slice thirds, one with an inline anchor every
third doc), an ad block, and a footer — so both classifiers have real
positives and negatives, and the whole render+extract chain is expressible
identically in DuckDB SQL for the value-hash oracle gate.

Scale notes (100 TB): render and block classification are narrow maps —
no shuffle, linear in input splits, whole-stage codegen throughout (regexp
split/extract/replace + integer arithmetic; the one HOF-free trick is
``length(array_join(regexp_extract_all(...), ''))`` for anchor chars).
Per-doc reassembly is a single map-side-combinable groupBy on doc_id.
The frequency method adds one bounded shuffle (block-text df) whose
boilerplate side is tiny by construction (df ≥ frac·N) and is broadcast
back.  Parity rules: regexes are Java/RE2/Python-identical (no lookaround,
no backreferences, spelled-out whitespace class), ratios are truncated on
an integer grid (`x*10000 div y`), and the 1/3 density test is the exact
integer comparison ``3*link_chars <= text_chars`` — no float anywhere a
tie could differ across engines.

Reference parity: the reference's extraction stage gates blocks on text
length and type (src/extraction.py min-text/min-rows/min-size gates); this
module generalizes those gates to the HTML/boilerplate domain the north
rule names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Block-level tags the splitter recognises.  `</a>` is deliberately NOT a
# block close: anchors are inline.  All regexes below are Java/RE2-portable
# (alternation + classes only; no lookaround, no backreferences).
BLOCK_TAGS = "nav|div|h1|p|footer"
BLOCK_CLOSE_RE = rf"</(?:{BLOCK_TAGS})>"
BLOCK_OPEN_RE = rf"<({BLOCK_TAGS})[^>]*>"
TAG_RE = r"<[^>]*>"
ANCHOR_TEXT_RE = r"<a [^>]*>([^<]*)</a>"

# Portable whitespace class (Java's \s includes \x0B where RE2's does not).
_WS = r"[ \t\n\x0b\f\r]+"

DEFAULT_MIN_TEXT_CHARS = 15


def render_pages(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 source_col: str = "source",
                 link_mod: int | None = None) -> DataFrame:
    """Render each document as a deterministic single-line HTML page:
    nav + menu (link-dense chrome), ``<h1>`` + three word-slice-third
    paragraphs (content; every third doc gets an inline anchor in its
    first paragraph), an ad block, and a per-source footer.

    ``link_mod`` (normally the corpus doc count) additionally inserts a
    "related" div with two deterministic cross-document links —
    ``/d{(3*doc_id+1) % link_mod}`` (a bijection: keeps the graph
    connected) and ``/d{doc_id % 97}`` (a hub link: the first 97 docs
    collect web-graph-realistic skewed in-degree) — giving the corpus a
    real hyperlink graph for `extract_links` / `ops.graph.pagerank`.
    Default None renders the original page byte-identically.

    Output: (doc_id, html).  Narrow map; the token array is bound through
    an ``explode(array(...))`` Generate barrier so CollapseProject cannot
    inline the regex split into the six slice expressions that reference
    it (the with_shingles trap, CLAUDE.md)."""
    toks_expr = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), _WS),
        lambda x: x != F.lit(""),
    )
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("_src"),
        F.explode(F.array(toks_expr)).alias("_toks"),
    ).select(
        "doc_id", "_src", "_toks",
        F.size("_toks").alias("_n"),
        F.expr("cast(ceil(size(_toks) / 3.0) as int)").alias("_k"),
    )
    sid = F.col("doc_id").cast("string")
    h1 = F.array_join(F.slice("_toks", 1, 4), " ")
    p1_plain = F.array_join(F.expr("slice(_toks, 1, _k)"), " ")
    # inline anchor on the first word for every third doc (so content
    # paragraphs have nonzero-but-low link density)
    p1_anchored = F.concat(
        F.lit('<a href="/w">'), F.get("_toks", 0), F.lit("</a> "),
        F.array_join(F.expr("slice(_toks, 2, _k - 1)"), " "),
    )
    p1 = F.when(
        (F.col("doc_id") % 3 == 0) & (F.col("_k") >= 2), p1_anchored
    ).otherwise(p1_plain)
    p2 = F.array_join(F.expr("slice(_toks, _k + 1, _k)"), " ")
    p3 = F.array_join(
        F.expr("slice(_toks, 2 * _k + 1, greatest(_n - 2 * _k, 0))"), " ")
    if link_mod is not None:
        a = (3 * F.col("doc_id") + 1) % link_mod
        bb = F.col("doc_id") % min(97, link_mod)
        rel = F.concat(
            F.lit('<div class="rel">Related <a href="/d'),
            a.cast("string"), F.lit('">d'), a.cast("string"),
            F.lit('</a> <a href="/d'), bb.cast("string"),
            F.lit('">d'), bb.cast("string"), F.lit("</a></div>"),
        )
    else:
        rel = F.lit("")
    html = F.concat(
        F.lit('<html><body><nav><a href="/">Home</a> '
              '<a href="/about">About</a> <a href="/d'),
        sid, F.lit('">Doc '), sid, F.lit("</a></nav>"),
        F.lit('<div class="menu">Site menu <a href="/a">archive</a> '
              '<a href="/t">topics</a> <a href="/s">search</a></div>'),
        F.lit("<h1>"), h1, F.lit("</h1>"),
        F.lit("<p>"), p1, F.lit("</p>"),
        F.lit('<div class="ad">Sponsored <a href="/buy">buy now</a> '
              '<a href="/deal">deal</a></div>'),
        F.lit("<p>"), p2, F.lit("</p>"),
        F.lit("<p>"), p3, F.lit("</p>"),
        rel,
        F.lit('<footer><a href="/tos">Terms</a> '
              '<a href="/privacy">Privacy</a> (c) corpus '),
        F.col("_src"), F.lit("</footer></body></html>"),
    )
    return d.select("doc_id", html.alias("html"))


def html_blocks(pages: DataFrame, html_col: str = "html",
                min_text_chars: int = DEFAULT_MIN_TEXT_CHARS) -> DataFrame:
    """Split pages into block elements and classify each by text/link
    density.  Output one row per block:

    (doc_id, block_idx, tag, btext, text_chars, link_chars, link_density,
    is_content)

    - ``btext`` is the tag-stripped block text.
    - ``link_chars`` is the summed anchor-text length, computed codegen-side
      as ``length(array_join(regexp_extract_all(frag, ANCHOR, 1), ''))`` —
      no interpreted aggregate lambda.
    - ``link_density`` is reported truncated to 4 dp on the integer grid;
      the *decision* uses the exact integer form ``3*link_chars <=
      text_chars`` (jusText's 1/3 threshold) so no engine can disagree on
      a tie.

    Narrow map (posexplode is a per-row Generate, no shuffle)."""
    frags = F.split(F.col(html_col), BLOCK_CLOSE_RE)
    b = pages.select(
        "doc_id", F.posexplode(frags).alias("block_idx", "_frag")
    ).select(
        "doc_id", "block_idx",
        F.regexp_extract("_frag", BLOCK_OPEN_RE, 1).alias("tag"),
        F.regexp_replace("_frag", TAG_RE, "").alias("btext"),
        F.length(
            F.array_join(
                F.regexp_extract_all("_frag", F.lit(ANCHOR_TEXT_RE), F.lit(1)),
                "",
            )
        ).alias("link_chars"),
    ).filter(F.col("tag") != "")
    text_chars = F.length("btext")
    return b.select(
        "doc_id", "block_idx", "tag", "btext",
        text_chars.alias("text_chars"), "link_chars",
        (F.expr("link_chars * 10000L div greatest(length(btext), 1)")
         / 10000.0).alias("link_density"),
        ((text_chars >= min_text_chars)
         & (3 * F.col("link_chars") <= text_chars)).alias("is_content"),
    )


def _reassemble(blocks: DataFrame, keep: str) -> DataFrame:
    """Group classified blocks back to one row per doc: ordered '\\n'-joined
    kept text + kept/dropped char accounting.  One map-side-combinable
    groupBy on doc_id; the ordered join sorts the collected (idx, text)
    structs per group — bounded by blocks-per-page, not corpus size."""
    k = F.col(keep)
    kept_struct = F.when(k, F.struct("block_idx", "btext"))
    return blocks.groupBy("doc_id").agg(
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["btext"],
                ),
                "\n",
            ),
            F.lit(""),
        ).alias("main_text"),
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(k.cast("long")).alias("n_kept"),
        F.sum(F.when(k, F.length("btext")).otherwise(0).cast("long"))
         .alias("kept_chars"),
        F.sum(F.when(~k, F.length("btext")).otherwise(0).cast("long"))
         .alias("dropped_chars"),
    )


def main_content(pages: DataFrame, html_col: str = "html",
                 min_text_chars: int = DEFAULT_MIN_TEXT_CHARS) -> DataFrame:
    """Density-rule main-content extraction: strip boilerplate blocks
    (short or link-dense) and reassemble each page's content in block
    order.  Output: (doc_id, main_text, n_blocks, n_kept, kept_chars,
    dropped_chars)."""
    return _reassemble(
        html_blocks(pages, html_col, min_text_chars), "is_content")


REL_DIV_RE = r'<div class="rel">(.*?)</div>'
DOC_HREF_RE = r"/d([0-9]+)"


def extract_links(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Extract the cross-document hyperlink graph from rendered pages: pull
    the "related" div (non-greedy group — RE2/Java/Python-identical), read
    every ``/d<id>`` href inside it, and emit distinct non-self edges
    (src, dst).

    Narrow map + explode; the only wide op is the final distinct (bounded
    by the edge count, ~2/doc here).  This is the DOM-heuristic side of the
    north rule turned into graph input: at 100 TB the same shape feeds a
    host-level link graph for PageRank-family scoring."""
    rel = F.regexp_extract(F.col(html_col), REL_DIV_RE, 1)
    return (
        pages.select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.regexp_extract_all(rel, F.lit(DOC_HREF_RE), F.lit(1))
            ).alias("_d"),
        )
        .select("src", F.col("_d").cast("long").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def freq_boilerplate(pages: DataFrame, html_col: str = "html",
                     df_num: int = 1, df_den: int = 10) -> DataFrame:
    """Corpus-frequency boilerplate removal (CCNet/OSCAR rule): a block
    whose exact text appears on at least ``df_num/df_den`` of all pages is
    template chrome — drop it, keep everything else (no density rule, so
    the two methods' disagreements are visible: per-doc nav lines that
    embed the doc id survive frequency filtering but not densitometry).

    The threshold test is pure integer math (``df * df_den >= n_docs *
    df_num``) — no float ratio an engine could round differently.

    Plan shape: block classification (narrow map) → one bounded shuffle
    for the (btext → document-frequency) table → the frequent side is tiny
    by construction (≤ df_den/df_num rows per distinct template block) and
    AQE broadcasts it back onto the block stream → one groupBy reassembly.
    At 100 TB the df table is the only shuffle and is capped by template
    cardinality, not corpus size."""
    blocks = html_blocks(pages, html_col, min_text_chars=0)
    n_docs = pages.count()  # tiny driver scalar: one count over the scan
    freq = (
        blocks.groupBy("btext")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") * df_den >= F.lit(n_docs) * df_num)
        .select("btext", F.lit(True).alias("_boiler"))
    )
    flagged = blocks.join(F.broadcast(freq), "btext", "left").withColumn(
        "_keep", F.col("_boiler").isNull()
    )
    return _reassemble(flagged, "_keep")


# URL canonicalization: tracking params any web pipeline strips before
# URL-level dedup (CDX/WARC convention; the SURT idea minus scheme folding).
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid)="
_URL_PARTS_RE = r"^([^:]+)://([^/?]+)([^?]*)\??(.*)$"


def canonical_url(col: str = "url"):
    """Canonical form of a URL as a pure codegen'd expression chain — the
    normalization pass before URL-level exact dedup (every web-crawl
    pipeline's first dedup rung, upstream of content hashing: the same
    page is fetched under thousands of tracking-parameter variants).

    Steps (each a documented canonicalization choice):
      1. strip the ``#fragment``;
      2. lowercase scheme and host; drop a leading ``www.``;
      3. drop default ports (``:80`` http, ``:443`` https);
      4. drop tracking params (``utm_*``, ``fbclid``, ``gclid``), SORT the
         survivors (param order is transport noise);
      5. strip the trailing ``/`` of a non-root path; empty path → ``/``.

    Pure regexp_extract / split / filter / array_sort / concat — a narrow
    map, no UDF, no shuffle; identical expressions exist in DuckDB SQL so
    the canonicalization itself is oracle-gated (parity trap: both engines
    must sort params by raw byte order, which binary UTF8 collation gives)."""
    u = F.regexp_replace(F.col(col), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _URL_PARTS_RE, 1))
    host0 = F.lower(F.regexp_extract(u, _URL_PARTS_RE, 2))
    host1 = F.regexp_replace(host0, r"^www\.", "")
    # expression-only port strip: conditional regexp on the scheme
    host = F.when(scheme == "https", F.regexp_replace(host1, r":443$", "")) \
        .when(scheme == "http", F.regexp_replace(host1, r":80$", "")) \
        .otherwise(host1)
    path0 = F.regexp_extract(u, _URL_PARTS_RE, 3)
    path = F.when(path0 == "", F.lit("/")).otherwise(
        F.when(
            (F.length(path0) > 1) & path0.endswith("/"),
            path0.substr(F.lit(1), F.length(path0) - 1),
        ).otherwise(path0)
    )
    query = F.regexp_extract(u, _URL_PARTS_RE, 4)
    params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(params == "", "").otherwise(F.concat(F.lit("?"), params)),
    )


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """URL-level exact dedup over the canonical form: one row per canonical
    URL with the duplicate count and the min-id canonical representative —
    the crawl-frontier dedup that runs before any content is even fetched
    twice.  groupBy on the canonicalized string: one bounded shuffle with
    map-side combine, no UDFs (the canonicalization is a narrow map)."""
    return (
        df.select(F.col(id_col), canonical_url(url_col).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def url_host(col: str = "url"):
    """Lowercased hostname of a URL, port stripped — pure regexp chain."""
    return F.regexp_replace(
        F.lower(F.regexp_extract(F.col(col), r"^[^:]+://([^/?#]+)", 1)),
        r":[0-9]+$",
        "",
    )


def registered_domain(col: str = "url"):
    """Registered-domain heuristic: the last two dot-labels of the host
    (``a.b.example.com`` → ``example.com``).  A public-suffix-list stand-in
    — correct for gTLDs, folds ``co.uk``-style ccSLDs one level too far; a
    production deployment swaps in the PSL table via a broadcast join, the
    expression shape stays the same."""
    h = url_host(col)
    labels = F.split(h, r"\.")
    return F.when(
        F.size(labels) >= 2,
        F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1)),
    ).otherwise(h)


def host_scorecard(
    df: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Per-registered-domain corpus health rollup — the table behind domain
    blocklists and per-site sampling weights in web-corpus curation (C4 /
    RefinedWeb both gate on domain aggregates): volume (docs, distinct
    hosts, tokens), mean tokens per doc, and exact-duplicate fraction by
    normalized content fingerprint.

    One narrow map (host/domain regexps, token count, md5 fingerprint)
    into a grouped aggregate; the two count(DISTINCT) get Catalyst's
    expand-based rewrite so a mega-domain doesn't funnel through one task.
    Ratios are truncated on the 1e-4 grid by integer division (the
    tie-free cross-engine rule — see corpus_scorecard)."""
    from sparkx.ops.textstats import fingerprint, token_count

    base = df.select(
        registered_domain(url_col).alias("domain"),
        url_host(url_col).alias("_h"),
        token_count(text_col).alias("_t"),
        fingerprint(text_col).alias("_fp"),
    )
    agg = base.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("_h").alias("n_hosts"),
        F.sum("_t").alias("n_tokens"),
        F.count_distinct("_fp").alias("_ndist"),
    )
    return agg.select(
        "domain",
        "n_docs",
        "n_hosts",
        "n_tokens",
        (F.expr("(n_tokens * 10000) div n_docs") / 10000.0).alias(
            "mean_tokens"
        ),
        (F.expr("((n_docs - _ndist) * 10000) div n_docs") / 10000.0).alias(
            "dup_frac"
        ),
    )


def page_meta(
    pages: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """Head-metadata extraction — the crawl-compliance companion to
    :func:`main_content`'s body strip: per page, the ``<title>``, the
    ``robots`` meta directives (``noindex`` — the page asked to be left
    out of the index/corpus; ``nofollow`` — its links must not feed the
    link graph), and the ``rel=canonical`` URL (the publisher's OWN
    dedup hint — :func:`url_dedup` consolidates on it before any content
    hashing runs, and a canonical pointing elsewhere marks this page a
    declared duplicate).  ``noindex`` pairs with
    :func:`~sparkx.ops.textstats.compliance_flags` as the machine-readable
    side of the opt-out screen.

    Extraction is HEAD-SCOPED: the ``<head>…</head>`` segment is cut
    first (lazy quantifier, leading-anchored), and the tag patterns run
    on it alone — body text that happens to contain metadata-shaped
    markup (hostile or quoted pages) cannot leak into the result, and a
    page without a head yields all-absent.  No-match yields '' in BOTH
    Spark and DuckDB ``regexp_extract`` (the cross-engine convention this
    op leans on), NULLed explicitly for absent title/canonical so
    downstream aggregation counts are honest.  Map-only: four
    regexp_extract in one codegen span, zero shuffle at any scale.

    Returns ``(id_col, title, robots, noindex, nofollow, canonical_url,
    declares_duplicate)``; ``declares_duplicate`` is true when a
    canonical exists and differs from the page's own ``/d{id}`` URL.
    """
    h = F.regexp_extract(
        F.coalesce(F.col(html_col), F.lit("")), "^<head>(.*?)</head>", 1
    )
    title = F.regexp_extract(h, "<title>([^<]*)</title>", 1)
    robots = F.lower(
        F.regexp_extract(h, '<meta name="robots" content="([^"]*)"', 1)
    )
    canonical = F.regexp_extract(h, '<link rel="canonical" href="([^"]*)"', 1)
    self_url = F.concat(F.lit("/d"), F.col(id_col).cast("string"))
    return pages.select(
        F.col(id_col),
        F.when(title != "", title).alias("title"),
        robots.alias("robots"),
        robots.contains("noindex").alias("noindex"),
        robots.contains("nofollow").alias("nofollow"),
        F.when(canonical != "", canonical).alias("canonical_url"),
        ((canonical != "") & (canonical != self_url)).alias(
            "declares_duplicate"
        ),
    )
