"""SparkSession factory with scale-aware defaults.

The reference delegates physical tuning to Postgres B-tree indexes
(/root/reference/src/models.py:41-57). Our analog is declarative: AQE for runtime
re-planning and skew handling, partition pruning via month-partitioned parquet, and
broadcast joins for small dimensions. These defaults are what we'd ship to a
1000-executor cluster; only `master` and memory are local-mode artifacts.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "payroll-etl-fastapi-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession tuned for this engine.

    Scale notes (100 TB design):
    - AQE on: coalesces post-shuffle partitions and splits skewed ones at runtime,
      so one static `spark.sql.shuffle.partitions` choice survives 1000x data.
    - UTC session timezone: testdata timestamps are timezone-naive; pinning UTC
      makes results reproducible across driver hosts.
    - Broadcast threshold left at default (10 MB) — dims here (region/nation/
      supplier, dim_dept/dim_employee) are far below it; AQE also converts
      sort-merge joins to broadcast at runtime when post-filter sizes allow.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        # local mode: ~1x cores keeps tasks coarse enough for tiny SF inputs;
        # on a real cluster this would be 2-3x total cores (AQE coalesces down).
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
