"""HTML main-content extraction: Spark kernels vs a pure-Python loop oracle.

The loop oracle renders the same synthetic page, splits/classifies blocks,
and reassembles — boring imperative code, independently derived from the
published rules (jusText 1/3 link-density; CCNet most-common-lines), so a
shared bug with the Catalyst expressions is unlikely.
"""

from __future__ import annotations

import re

import pytest

from sparkx.ops import html_extract as H

DOCS = [
    # (doc_id, text, source)
    (0, "key agg row scan alpha beta gamma delta epsilon", "web"),
    (1, "one two three four five six seven eight nine ten eleven", "web"),
    (2, "  padded   whitespace\ttokens\nnewline  split  ", "book"),
    (3, "anchored first paragraph doc three gets an inline anchor here ok", "web"),
    (4, "", "web"),          # empty text → empty slices, chrome-only page
    (5, None, "book"),       # NULL text → coalesced to ''
    (6, "tiny", "web"),      # 1 token
    (7, "a b c", "web"),     # 3 tokens: k=1, p3 empty
    (8, "x " * 40, "web"),   # long uniform doc
    (9, "solo unique words only here make paragraph pass minimum", "news"),
]


def render_py(doc_id: int, text: str | None, source: str) -> str:
    toks = [t for t in re.split(r"[ \t\n\x0b\f\r]+", (text or "").strip()) if t]
    n = len(toks)
    k = -(-n // 3)  # ceil
    h1 = " ".join(toks[0:4])
    if doc_id % 3 == 0 and k >= 2:
        p1 = f'<a href="/w">{toks[0]}</a> ' + " ".join(toks[1:k])
    else:
        p1 = " ".join(toks[0:k])
    p2 = " ".join(toks[k : 2 * k])
    p3 = " ".join(toks[2 * k : n])
    return (
        f'<html><body><nav><a href="/">Home</a> <a href="/about">About</a> '
        f'<a href="/d{doc_id}">Doc {doc_id}</a></nav>'
        f'<div class="menu">Site menu <a href="/a">archive</a> '
        f'<a href="/t">topics</a> <a href="/s">search</a></div>'
        f"<h1>{h1}</h1><p>{p1}</p>"
        f'<div class="ad">Sponsored <a href="/buy">buy now</a> '
        f'<a href="/deal">deal</a></div>'
        f"<p>{p2}</p><p>{p3}</p>"
        f'<footer><a href="/tos">Terms</a> <a href="/privacy">Privacy</a> '
        f"(c) corpus {source}</footer></body></html>"
    )


def blocks_py(doc_id: int, html: str, min_text: int = 15):
    out = []
    for idx, frag in enumerate(re.split(r"</(?:nav|div|h1|p|footer)>", html)):
        m = re.search(r"<(nav|div|h1|p|footer)[^>]*>", frag)
        if not m:
            continue
        btext = re.sub(r"<[^>]*>", "", frag)
        link_chars = sum(
            len(t) for t in re.findall(r"<a [^>]*>([^<]*)</a>", frag)
        )
        out.append(
            {
                "doc_id": doc_id,
                "block_idx": idx,
                "tag": m.group(1),
                "btext": btext,
                "text_chars": len(btext),
                "link_chars": link_chars,
                "is_content": len(btext) >= min_text
                and 3 * link_chars <= len(btext),
            }
        )
    return out


def reassemble_py(blocks, keep_fn):
    by_doc: dict[int, list] = {}
    for b in blocks:
        by_doc.setdefault(b["doc_id"], []).append(b)
    rows = []
    for doc_id, bs in by_doc.items():
        bs.sort(key=lambda b: b["block_idx"])
        kept = [b for b in bs if keep_fn(b)]
        rows.append(
            {
                "doc_id": doc_id,
                "main_text": "\n".join(b["btext"] for b in kept),
                "n_blocks": len(bs),
                "n_kept": len(kept),
                "kept_chars": sum(b["text_chars"] for b in kept),
                "dropped_chars": sum(
                    b["text_chars"] for b in bs if not keep_fn(b)
                ),
            }
        )
    return sorted(rows, key=lambda r: r["doc_id"])


@pytest.fixture(scope="module")
def pages(spark):
    docs = spark.createDataFrame(
        [(i, t, s) for i, t, s in DOCS], "doc_id long, text string, source string"
    )
    return H.render_pages(docs).cache()


def test_render_matches_loop_oracle(spark, pages):
    got = {r["doc_id"]: r["html"] for r in pages.collect()}
    assert len(got) == len(DOCS)
    for doc_id, text, source in DOCS:
        assert got[doc_id] == render_py(doc_id, text, source), doc_id


def test_blocks_match_loop_oracle(spark, pages):
    got = sorted(
        ([r["doc_id"], r["block_idx"], r["tag"], r["btext"], r["text_chars"],
          r["link_chars"], r["is_content"]]
         for r in H.html_blocks(pages).collect()),
    )
    want = sorted(
        [b["doc_id"], b["block_idx"], b["tag"], b["btext"], b["text_chars"],
         b["link_chars"], b["is_content"]]
        for i, t, s in DOCS
        for b in blocks_py(i, render_py(i, t, s))
    )
    assert got == want
    # every page yields all 8 structural blocks (nav, menu, h1, 3×p, ad, footer)
    assert len(got) == 8 * len(DOCS)


def test_link_density_decision_is_integer_exact(spark):
    # a block whose text is exactly 3× its anchor text is CONTENT (<= not <)
    page = spark.createDataFrame(
        [(1, '<html><body><p><a href="/x">abcde</a>0123456789</p>'
             "</body></html>")],
        "doc_id long, html string",
    )
    [row] = H.html_blocks(page).collect()
    assert row["text_chars"] == 15 and row["link_chars"] == 5
    assert row["is_content"]  # 3*5 <= 15, boundary inclusive


def test_main_content_matches_loop_oracle(spark, pages):
    got = [
        [r["doc_id"], r["main_text"], r["n_blocks"], r["n_kept"],
         r["kept_chars"], r["dropped_chars"]]
        for r in H.main_content(pages).orderBy("doc_id").collect()
    ]
    all_blocks = [
        b for i, t, s in DOCS for b in blocks_py(i, render_py(i, t, s))
    ]
    want = [
        [r["doc_id"], r["main_text"], r["n_blocks"], r["n_kept"],
         r["kept_chars"], r["dropped_chars"]]
        for r in reassemble_py(all_blocks, lambda b: b["is_content"])
    ]
    assert got == want


def test_main_content_strips_chrome_keeps_paragraphs(spark, pages):
    rows = {r["doc_id"]: r for r in H.main_content(pages).collect()}
    r1 = rows[1]  # 11 tokens, no inline anchor
    assert "Home" not in r1["main_text"] and "Sponsored" not in r1["main_text"]
    assert "Privacy" not in r1["main_text"]
    assert r1["main_text"].startswith("one two three four")  # h1 kept
    # chrome-only pages (empty doc) keep nothing
    assert rows[4]["n_kept"] == 0 and rows[4]["main_text"] == ""
    assert rows[5]["n_kept"] == 0
    assert rows[4]["n_blocks"] == 8


def test_freq_boilerplate_drops_repeated_templates(spark, pages):
    # with only 10 docs, the default 1/10 threshold makes df=1 "frequent";
    # use 2/10 so unique blocks survive and the method's designed contrast
    # with densitometry is visible
    all_blocks = [
        b for i, t, s in DOCS for b in blocks_py(i, render_py(i, t, s), 0)
    ]
    n_docs = len(DOCS)
    df = {}
    for b in all_blocks:
        df.setdefault(b["btext"], set()).add(b["doc_id"])
    want = [
        [r["doc_id"], r["main_text"], r["n_blocks"], r["n_kept"],
         r["kept_chars"], r["dropped_chars"]]
        for r in reassemble_py(
            all_blocks,
            lambda b: len(df[b["btext"]]) * 10 < n_docs * 2,
        )
    ]
    got = [
        [r["doc_id"], r["main_text"], r["n_blocks"], r["n_kept"],
         r["kept_chars"], r["dropped_chars"]]
        for r in H.freq_boilerplate(pages, df_num=2, df_den=10)
        .orderBy("doc_id").collect()
    ]
    assert got == want
    # the menu/ad/footer template text recurs on every page → dropped;
    # the per-doc nav (embeds the doc id) is unique → SURVIVES frequency
    # filtering even though densitometry drops it
    r1 = dict(zip(["doc_id", "main_text", "n_blocks", "n_kept",
                   "kept_chars", "dropped_chars"], got[1]))
    assert "Site menu" not in r1["main_text"]
    assert "Sponsored" not in r1["main_text"]
    assert f"Doc 1" in r1["main_text"]  # nav survives the frequency rule


def test_freq_threshold_is_integer_exact(spark):
    # 10 docs, threshold 1/10: df=1 * 10 >= 10 * 1 → even a single
    # occurrence is "frequent" at that corpus size; use 2/10 to check the
    # boundary both ways
    docs = spark.createDataFrame(
        [(i, f"doc{i} number{i} unique{i} words{i} for{i} document{i} "
             f"number{i}b padded{i} out{i}", "w")
         for i in range(10)],
        "doc_id long, text string, source string",
    )
    pages = H.render_pages(docs)
    out = H.freq_boilerplate(pages, df_num=2, df_den=10).collect()
    # shared chrome (df=10) dropped everywhere; df=1 content blocks kept
    for r in out:
        i = r["doc_id"]
        assert "Site menu" not in r["main_text"]
        assert f"unique{i}" in r["main_text"]
