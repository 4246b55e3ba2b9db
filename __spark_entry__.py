"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``payroll_etl_fastapi_spark``; this module is the thin
registry the driver imports.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from payroll_etl_fastapi_spark.plans import suite  # noqa: E402
from payroll_etl_fastapi_spark.plans import suite_dedup  # noqa: E402,F401  (registers queries)
from payroll_etl_fastapi_spark.plans import suite_similarity  # noqa: E402,F401
from payroll_etl_fastapi_spark.plans import suite_text  # noqa: E402,F401
from payroll_etl_fastapi_spark.plans import suite_windows  # noqa: E402,F401
from payroll_etl_fastapi_spark.plans import suite_multimodal  # noqa: E402,F401
from payroll_etl_fastapi_spark.plans import suite_pipeline  # noqa: E402,F401
from payroll_etl_fastapi_spark.plans import suite_streaming  # noqa: E402,F401
from payroll_etl_fastapi_spark.plans import suite_asof  # noqa: E402,F401
from payroll_etl_fastapi_spark.plans import suite_olap  # noqa: E402,F401
from payroll_etl_fastapi_spark.plans import suite_corpus  # noqa: E402,F401
from payroll_etl_fastapi_spark.plans import suite_relational  # noqa: E402,F401
from payroll_etl_fastapi_spark.plans import suite_cdc  # noqa: E402,F401
from payroll_etl_fastapi_spark.plans import suite_profile  # noqa: E402
from payroll_etl_fastapi_spark.plans import suite_search  # noqa: E402,F401,F401
from payroll_etl_fastapi_spark.plans import suite_binning  # noqa: E402,F401


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the per-nation revenue rollup
    (reference by-dept analog — joins, broadcast dims, grouped sums, ordering)."""
    return suite.QUERIES["kpi_rollup_by_nation"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return dict(suite.QUERIES)  # suite_* modules above register into this dict


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (omitted ⇒ rows-only check)."""
    return dict(suite.ORACLES)
