"""Scale diagnostics: the reports an engineer runs BEFORE tuning a 100 TB
job — join-key skew analysis (does this groupBy/join need salting?) and
small-files compaction planning (does this table need rewriting before the
next thousand-task scan?).  Both are plain bounded aggregations whose
outputs are integer-grid deterministic, so the driver value-hash gate
verifies them like any operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def skew_report(
    df: DataFrame,
    key_col: str,
    top: int = 10,
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """Join/groupBy-key skew diagnosis: the ``top`` heaviest keys with their
    row share and the salt factor that would level them — the report that
    decides between a plain shuffle, AQE skew handling, and explicit
    salting (CLAUDE.md scale rule: skewed keys hurt; this op puts a number
    on "skewed").

    Per key: ``n_rows``, ``share_e6`` (rows·10⁶ div total — integer grid,
    order-free), ``suggested_salt`` = ceil(n_rows / target_rows_per_task)
    as integer ceil-div (the number of salt buckets that caps any single
    task at the target).  NULL keys are a skew class of their own and are
    reported under the sentinel key ``'∅'`` (they hash to one partition
    like any hot key).

    Execution: one map-side-combinable count per key, a 1-row broadcast
    total, and a global top-``top`` (TakeOrderedAndProject — k-row heap,
    no full sort).  The per-key count frame is the op's only shuffle and
    is exactly the shuffle being diagnosed — run it once, read the report,
    salt accordingly.
    """
    counts = (
        df.select(
            F.coalesce(F.col(key_col).cast("string"), F.lit("∅")).alias("key")
        )
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    total = counts.agg(
        F.sum("n_rows").alias("_total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_rows",
            F.expr("(n_rows * 1000000) div _total").alias("share_e6"),
            "n_keys",
            F.expr(
                f"(n_rows + {target_rows_per_task} - 1) div {target_rows_per_task}"
            ).cast("int").alias("suggested_salt"),
        )
        .orderBy(F.desc("n_rows"), F.asc("key"))
        .limit(top)
    )


def compaction_plan(
    files: DataFrame,
    target_bytes: int = 128 * 1024 * 1024,
    path_col: str = "path",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Small-files compaction planner: assign every file to a compaction
    group so each group's total is ~``target_bytes`` — the maintenance op
    behind every "millions of tiny parquet files" table (a 100 TB scan at
    128 MB splits wants ~800k tasks; the same data in 4 KB files wants 25
    billion).  Files already ≥ target stay singleton groups (``oversize``
    flag — rewriting them buys nothing).

    Grouping is the deterministic cumulative rule: files ordered by
    ``path`` (stable, engine-independent), group = floor(preceding-bytes /
    target) among the sub-target files — every group except possibly the
    last lands in [target, target + max_small_file) bytes once the group
    boundary is crossed.  One window cumsum over the file listing (a
    listing is ~rows = files, KB-scale payload — never corpus-scale) and
    pure integer math.

    Returns ``(path, bytes, grp, oversize)`` — the driver for a
    ``coalesce``/rewrite job per ``grp``.
    """
    from pyspark.sql import Window

    small = files.filter(F.col(bytes_col) < target_bytes)
    big = files.filter(F.col(bytes_col) >= target_bytes)
    planned = small.select(
        F.col(path_col).alias("path"),
        F.col(bytes_col).cast("long").alias("bytes"),
        F.expr(
            f"(sum({bytes_col}) OVER (ORDER BY {path_col} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))"
        ).alias("_pre"),
    ).select(
        "path",
        "bytes",
        F.expr(f"coalesce(_pre, 0L) div {target_bytes}").cast("long").alias("grp"),
        F.lit(False).alias("oversize"),
    )
    # oversize files: singleton groups numbered after the packed ones, in
    # path order (group ids stay deterministic)
    n_grps = planned.agg(
        F.coalesce(F.max("grp") + 1, F.lit(0).cast("long")).alias("_n")
    )
    solo = (
        big.select(
            F.col(path_col).alias("path"),
            F.col(bytes_col).cast("long").alias("bytes"),
            (F.row_number().over(Window.orderBy(path_col)) - 1)
            .cast("long")
            .alias("_r"),
        )
        .crossJoin(F.broadcast(n_grps))
        .select(
            "path",
            "bytes",
            (F.col("_r") + F.col("_n")).alias("grp"),
            F.lit(True).alias("oversize"),
        )
    )
    return planned.unionByName(solo)


def partition_prune_report(
    manifest: DataFrame,
    ranges: DataFrame,
    min_col: str = "min_v",
    max_col: str = "max_v",
    rows_col: str = "n_rows",
    range_id: str = "range_id",
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Manifest file-skipping simulator: for each candidate query range,
    how many files (and rows) a min/max-stats prune would actually skip —
    the number that decides whether a table's sort/partition layout earns
    its keep before anyone runs the 100 TB scan (the Iceberg manifest /
    parquet row-group pruning math, made a report).

    Semantics mirror the engines': a file is scanned iff its stats range
    overlaps the predicate (``max_v ≥ lo AND min_v ≤ hi``); a file with
    NULL stats (no footer, all-NULL column) can never be pruned and is
    ALWAYS scanned — pruning must be conservative.

    Scale: a manifest is metadata (one row per file; a 100 TB table at
    128 MB files is ~800k rows) and the range set is a handful of planner
    candidates, so the broadcast range × manifest product is bounded and
    folds map-side into one ≤|ranges|-row report (an EMPTY manifest yields
    an empty report — there is nothing to scan).  Returns ``(range_id,
    lo, hi, n_files, n_scanned, rows_total, rows_scanned,
    scan_share_e6)`` with ``scan_share_e6 = rows_scanned·10⁶ div
    rows_total`` on the integer grid.
    """
    scanned = F.coalesce(
        (F.col(max_col) >= F.col(lo_col))
        & (F.col(min_col) <= F.col(hi_col)),
        F.lit(True),
    ).cast("long")
    return (
        manifest.crossJoin(F.broadcast(ranges))
        .groupBy(range_id, lo_col, hi_col)
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(scanned).alias("n_scanned"),
            F.sum(F.col(rows_col)).alias("rows_total"),
            F.sum(scanned * F.col(rows_col)).alias("rows_scanned"),
        )
        .select(
            range_id,
            lo_col,
            hi_col,
            "n_files",
            "n_scanned",
            "rows_total",
            "rows_scanned",
            F.expr(
                "CASE WHEN rows_total > 0 THEN (rows_scanned * 1000000) div rows_total "
                "ELSE 0 END"
            ).alias("scan_share_e6"),
        )
    )


def scan_parallelism_report(
    files: DataFrame,
    max_partition_bytes: int = 128 * 1024 * 1024,
    path_col: str = "path",
    bytes_col: str = "bytes",
    row_groups_col: str = "n_row_groups",
) -> DataFrame:
    """Scan-parallelism advisor — the codified form of this round's
    hardest-won benchmark lesson (BENCH/BASELINE.md "minhash 0.271"):
    Spark assigns one scan task per parquet ROW GROUP slice, so a
    single-file table written with pyarrow's 1M-row default scans as ONE
    task at any core count, and every map stage downstream of it
    serializes no matter how many executors the job has.  Given a file
    listing with per-file row-group counts, estimate the achievable task
    count per file and name the binding constraint.

    ``est_tasks = least(n_row_groups, ceil(bytes / max_partition_bytes))``
    (at least 1): a file yields at most one task per row group, and at
    most one per ``spark.sql.files.maxPartitionBytes`` slice.
    ``bound = 'row_groups'`` marks files whose layout (not size) caps
    parallelism — exactly the writer mistake to fix —
    with ``recommended_groups`` the group count that lifts the cap to the
    byte bound.  All pure integer arithmetic (``ceil`` via ``(b+m-1) div
    m`` — nonnegative, engine-exact); a listing is metadata-scale, so the
    op is map-only over ~|files| rows at any table size.

    Returns ``(path, bytes, n_row_groups, est_tasks, bound,
    recommended_groups)``.
    """
    m = int(max_partition_bytes)
    byte_cap = F.expr(f"greatest(({bytes_col} + {m} - 1) div {m}, 1)").cast(
        "long"
    )
    rg_cap = F.greatest(F.col(row_groups_col).cast("long"), F.lit(1))
    est = F.least(rg_cap, byte_cap)
    return files.select(
        F.col(path_col).alias("path"),
        F.col(bytes_col).cast("long").alias("bytes"),
        F.col(row_groups_col).cast("long").alias("n_row_groups"),
        est.alias("est_tasks"),
        F.when(rg_cap < byte_cap, F.lit("row_groups"))
        .otherwise(F.lit("bytes"))
        .alias("bound"),
        byte_cap.alias("recommended_groups"),
    )
