"""SparkSession factory with scale-appropriate defaults.

Tuned for the engine's execution profile: expression-heavy projections
(Either guards), broadcast-able dimension joins, and AQE for runtime
re-planning (skew joins, partition coalescing). On a real cluster the
same config applies — only master/parallelism change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_session(
    app_name: str = "pipz-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # AQE: runtime partition coalescing + skew-join splitting —
        # essential at 100 TB, harmless at sf0.001.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        # Arrow for the pandas-UDF escape hatch (the slow path, but
        # batched, never row-at-a-time).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Dimension tables in this schema are tiny; keep the default
        # 10 MB threshold but make the intent explicit.
        .config("spark.sql.autoBroadcastJoinThreshold", 10 * 1024 * 1024)
        .config("spark.sql.session.timeZone", "UTC")
        # keep managed-table data out of the repo working directory
        .config("spark.sql.warehouse.dir", os.environ.get(
            "SPARK_GRAFT_WAREHOUSE", "/tmp/pipz-spark-warehouse"))
        # events.parquet stores TIMESTAMP(NANOS); Spark has no nanos
        # timestamp — read as long and normalize in the catalog.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
