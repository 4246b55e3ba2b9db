from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")

from payroll_etl_fastapi_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"
REFERENCE_CSV = "/root/reference/data/payroll.csv"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests")
    yield spark


@pytest.fixture(scope="session")
def reference_csv() -> str:
    if not os.path.exists(REFERENCE_CSV):
        pytest.skip("reference dataset not available")
    return REFERENCE_CSV
