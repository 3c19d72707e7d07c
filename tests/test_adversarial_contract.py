"""Adversarial contract gate: every queries()↔oracle_sql() pair must still
agree on hostile data — NULL/empty/whitespace text, repeated tokens, quotes,
backslashes, carriage returns, vertical tabs (the one char where Java's \\s
and RE2's \\s disagree — r2 pinned all oracle whitespace to an explicit
class), NBSP/ideographic spaces, embedded emails/phones, repeated lines,
15k-char documents, NULL event values and malformed/NULL JSON props.  The
driver's testdata is clean; 100 TB of real transcripts is not.  (This gate
found two real bugs on first run: DuckDB's json_extract_string crashing on
empty input, and the multimodal decode kernel crashing on NULL payload
bytes.)"""

from __future__ import annotations

import shutil

import pytest

import __spark_entry__ as E
from tools.check_contract import dtype_kind, normalize

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    import duckdb

    adv = tmp_path_factory.mktemp("sfadv")
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{adv}/{t}.parquet")
    con = duckdb.connect()
    con.execute(
        """
COPY (
  SELECT * FROM (VALUES
    (0::BIGINT, NULL, 'en', 'src0', 0::BIGINT),
    (1, '', 'en', 'src1', 0),
    (2, '   ', 'de', 'src1', 3),
    (3, 'emoji [SMILE] taxt with unicode ünïcode and the a of to is tokens here', 'fr', 'src2', 60),
    (4, 'single', 'es', 'src3', 6),
    (5, repeat('word ', 3000), 'en', 'src4', 15000),
    (6, 'quote" and back\\slash and braces {x} here the end', 'zh', 'src5', 48),
    (7, 'the the the the the the the the the the', 'en', 'src6', 40),
    (8, chr(13) || 'carriage' || chr(13) || 'returns everywhere the and of to is', 'en', 'src7', 40),
    (9, 'normal prose document with enough text to pass all the gates easily here', 'en', 'src8', 70),
    (10, 'vertical' || chr(11) || 'tab' || chr(11) || 'whitespace the a of to is pad pad', 'en', 'src9', 40),
    (11, 'nbsp' || chr(160) || 'and' || chr(12288) || 'ideographic space the of to is words', 'en', 'src9', 44),
    (12, 'contact real.user+tag@mail.example.org or call +44 20 7946 0958 now the a of', 'en', 'src10', 60),
    (13, 'line one' || chr(10) || 'line one' || chr(10) || 'line two repeated lines the of to', 'en', 'src10', 40),
    (14, chr(160) || 'leading and trailing nbsp the a of to is around this text' || chr(160), 'en', 'src11', 60),
    (15, '😀 astral emoji 👩‍👩‍👧‍👦 zwj family and 𝔘𝔫𝔦 math letters the a of to is here', 'en', 'src11', 70)
  ) t(doc_id, text, lang, source, n_chars)
) TO 'DEST/documents.parquet' (FORMAT PARQUET)""".replace("DEST", str(adv))
    )
    con.execute(
        """
COPY (
  SELECT * FROM (VALUES
    (0::BIGINT, TIMESTAMP '2026-01-01 00:00:00', 1::BIGINT, 'click', 1.5::DOUBLE, '{"k": 1}'),
    (1, TIMESTAMP '2026-01-01 00:10:00', 1, 'purchase', 2.5, 'no json here'),
    (2, TIMESTAMP '2026-01-01 01:10:00', 1, 'click', NULL, NULL),
    (3, TIMESTAMP '2026-01-01 01:10:00', 2, 'purchase', 4.0, '{"k": 2}'),
    (4, TIMESTAMP '2026-01-01 01:10:00', 2, 'purchase', 3.0, '{}'),
    (5, TIMESTAMP '2026-01-01 02:00:00', 2, 'click', 0.0, '{"j": 9}'),
    (6, TIMESTAMP '2026-01-01 02:00:01', 3, 'view', -1.0, NULL)
  ) t(event_id, ts, user_id, event_type, value, props)
) TO 'DEST/events.parquet' (FORMAT PARQUET)""".replace("DEST", str(adv))
    )
    con.execute(
        """
COPY (
  SELECT CAST(range AS BIGINT) AS vec_id,
         list_transform(range(1, 9), i -> CAST(sin(range * 7 + i) AS FLOAT)) AS embedding,
         CAST(range % 3 AS INT) AS label
  FROM range(20)
) TO 'DEST/embeddings.parquet' (FORMAT PARQUET)""".replace("DEST", str(adv))
    )
    con.close()
    return str(adv)


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{adv_dir}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(E.queries().keys()))
def test_adversarial_query_matches_oracle(spark, adv_duck, adv_dir, name):
    got = E.queries()[name](spark, adv_dir).toPandas()
    if name not in E.oracle_sql():
        # oracle-less queries (iterative algorithms, e.g. ann_ivf's k-means)
        # get the driver's weaker rows-only contract: the query must still
        # RUN on hostile data and produce a stable frame
        assert got.columns.tolist(), name
        return
    want = adv_duck.execute(E.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} != {len(want)}"
    bad_kinds = {
        c: (str(got[c].dtype), str(want[c].dtype))
        for c in got.columns
        if dtype_kind(got[c].dtype) != dtype_kind(want[c].dtype)
    }
    assert not bad_kinds, f"{name}: dtype kind mismatch {bad_kinds}"
    g, w = normalize(got), normalize(want)
    for c in g.columns:
        assert g[c].equals(w[c]), f"{name}: column {c} differs on adversarial data"
