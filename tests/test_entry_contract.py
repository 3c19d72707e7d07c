"""Mirror of the driver's correctness gate: every queries() entry must match
its oracle_sql() on DuckDB at sf0.001 (row count + columns + values)."""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from tools.check_contract import normalize

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


# non-SQL-expressible ops (iterative algorithms) that deliberately omit a
# DuckDB oracle and take the driver's weaker rows-only check; each must say
# so in its query docstring.  Empty since r5: ann_ivf's k-means fit is
# frozen as a checked-in artifact, making the whole probe SQL-expressible
ORACLE_EXEMPT: set[str] = set()


def test_every_query_has_oracle_or_is_documented():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    missing = set(qs) - set(os_)
    assert missing == ORACLE_EXEMPT, f"undocumented oracle-less queries: {missing - ORACLE_EXEMPT}"


@pytest.mark.parametrize("name", sorted(E.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    got = E.queries()[name](spark, SF_DIR).toPandas()
    if name in ORACLE_EXEMPT:
        assert len(got.columns) and len(got) >= 0  # rows-only contract
        return
    want = duck.execute(E.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    g, w = normalize(got), normalize(want)
    for c in g.columns:
        assert g[c].equals(w[c]), f"{name}: column {c} differs"


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert df.count() > 100
