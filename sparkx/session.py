"""SparkSession builder tuned for the extraction workload.

Arrow on (all kernels are pandas-on-Arrow), AQE on (runtime skew backstop),
and an optional Iceberg catalog that activates only when the runtime ships the
Iceberg Spark extension (not present in this sandbox; the parquet snapshot
ledger in ``sparkx.checkpoint`` provides the same transactional semantics).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batches sized for text-heavy rows (SURVEY.md §4.2): large enough to
# amortize Arrow round-trip + per-batch pandas overhead (measured: 16k beats
# 4k by ~10% on the extraction kernel), small enough to bound executor memory
# when turns carry multi-KB payloads (16k rows × ~1KB ≈ 16MB per batch).
ARROW_BATCH_ROWS = 16384


def _iceberg_available() -> bool:
    """True iff an iceberg-spark-runtime jar is on the classpath."""
    try:
        import pyspark

        jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        return any("iceberg-spark-runtime" in j for j in os.listdir(jars))
    except OSError:
        return False


def build_session(
    app_name: str = "sparkx",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    warehouse: str | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or os.environ.get("SPARKX_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # local[N] → N; 2x cores keeps shuffle tasks small without tiny-file blowup
        n = master.removeprefix("local[").removesuffix("]")
        shuffle_partitions = 2 * (cpus if n in ("*", "") else int(n))

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        # parquet scan parallelism at 100TB: default 128MB splits; keep default
        # but make it explicit so the knob is visible to operators.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARKX_DRIVER_MEM", "8g"))
    )
    if warehouse:
        b = b.config("spark.sql.warehouse.dir", warehouse)
    if _iceberg_available():
        # Real-cluster path: a hadoop-backed Iceberg catalog named `ice`.
        b = (
            b.config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
            .config("spark.sql.catalog.ice.type", "hadoop")
            .config(
                "spark.sql.catalog.ice.warehouse",
                warehouse or os.environ.get("SPARKX_ICEBERG_WAREHOUSE", "/tmp/sparkx_ice"),
            )
        )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
