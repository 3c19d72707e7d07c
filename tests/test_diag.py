"""Scale diagnostics (sparkx/ops/diag.py): key-skew report and small-files
compaction planner — hand-computed values + structural invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkx.ops import diag as DG


def test_skew_report_hand_computed(spark):
    """Hot key, NULL-sentinel class, integer-grid share, ceil-div salt."""
    rows = [("hot",)] * 70 + [("warm",)] * 20 + [(None,)] * 10
    df = spark.createDataFrame(rows, "k string")
    got = [
        (r.key, r.n_rows, r.share_e6, r.n_keys, r.suggested_salt)
        for r in DG.skew_report(df, "k", top=10, target_rows_per_task=30).collect()
    ]
    # shares: 70/100, 20/100, 10/100 on the e6 grid; salt = ceil(n/30)
    assert got == [
        ("hot", 70, 700000, 3, 3),
        ("warm", 20, 200000, 3, 1),
        ("∅", 10, 100000, 3, 1),
    ]
    # top-k truncation + count-desc/key-asc tiebreak
    tie = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    t = [r.key for r in DG.skew_report(tie, "k", top=2).collect()]
    assert t == ["a", "b"]


def test_compaction_plan_invariants(spark):
    """Every packed group except the last crosses the target once; oversize
    files are singleton groups numbered after the packed ones; the plan is
    independent of input partitioning."""
    files = [(f"f{i:03d}", 40) for i in range(10)]      # 400 bytes of smalls
    files += [("zbig1", 500), ("zbig2", 9000)]           # oversize at ≥100
    df = spark.createDataFrame(files, "path string, bytes long")
    plan = {r.path: (r.grp, r.oversize)
            for r in DG.compaction_plan(df, target_bytes=100).collect()}
    # cumulative rule: pre // 100 → f000-f002 grp0 (pre 0,40,80),
    # f003-f004 grp1 (120,160), f005 grp2 (200)... i.e. ceil groups of ~3/2
    assert plan["f000"] == (0, False) and plan["f002"] == (0, False)
    assert plan["f003"] == (1, False)
    # group totals: every packed group except the last ≥ target once closed
    from collections import defaultdict

    sizes = defaultdict(int)
    for p, (g, big) in plan.items():
        if not big:
            sizes[g] += 40
    gs = [sizes[g] for g in sorted(sizes)]
    assert all(s + 40 > 100 for s in gs[:-1])  # closed groups crossed target
    # oversize: singleton groups after the packed ones, path-ordered
    n_packed = max(g for g, big in plan.values() if not big) + 1
    assert plan["zbig1"] == (n_packed, True)
    assert plan["zbig2"] == (n_packed + 1, True)
    # partitioning independence
    plan7 = {r.path: (r.grp, r.oversize)
             for r in DG.compaction_plan(
                 df.repartition(7), target_bytes=100).collect()}
    assert plan7 == plan


def test_compaction_plan_all_oversize_and_empty(spark):
    df = spark.createDataFrame([("a", 10_000), ("b", 20_000)],
                               "path string, bytes long")
    plan = {r.path: (r.grp, r.oversize)
            for r in DG.compaction_plan(df, target_bytes=100).collect()}
    assert plan == {"a": (0, True), "b": (1, True)}
    empty = spark.createDataFrame([], "path string, bytes long")
    assert DG.compaction_plan(empty).count() == 0


def test_partition_prune_report_overlap_and_null_stats(spark):
    """Overlap semantics at the boundaries (inclusive both ends), NULL-stats
    files always scanned, share on the integer grid."""
    manifest = spark.createDataFrame(
        [("f0", 0.0, 9.0, 10), ("f1", 10.0, 19.0, 10),
         ("f2", 20.0, 29.0, 30), ("f3", None, None, 50)],
        "f string, min_v double, max_v double, n_rows long",
    )
    ranges = spark.createDataFrame(
        [("exact", 10.0, 19.0), ("edge", 9.0, 10.0),
         ("miss", 40.0, 50.0), ("all", 0.0, 29.0)],
        "range_id string, lo double, hi double",
    )
    got = {r.range_id: r
           for r in DG.partition_prune_report(manifest, ranges).collect()}
    # exact: f1 + the NULL-stats file
    assert (got["exact"].n_scanned, got["exact"].rows_scanned) == (2, 60)
    # edge touches f0 (max=9>=9) and f1 (min=10<=10) + NULL-stats
    assert got["edge"].n_scanned == 3
    # miss: only the NULL-stats file survives pruning
    assert (got["miss"].n_scanned, got["miss"].rows_scanned) == (1, 50)
    assert got["all"].n_scanned == 4 and got["all"].rows_total == 100
    assert got["all"].scan_share_e6 == 1_000_000
    assert got["miss"].scan_share_e6 == 500_000
    # empty manifest → empty report (nothing to scan)
    empty = spark.createDataFrame([], "f string, min_v double, max_v double, n_rows long")
    assert DG.partition_prune_report(empty, ranges).count() == 0
