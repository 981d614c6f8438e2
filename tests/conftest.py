import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_data_lake_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="sdl_tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


def assert_df_equal(actual, expected, ignore_nullability=True):
    """Schema (name+type) + symmetric-difference equality
    (GenericDataFrame.isEqual, GenericDataFrame.scala:200-227)."""
    a_schema = [(f.name, f.dataType.simpleString()) for f in actual.schema.fields]
    e_schema = [(f.name, f.dataType.simpleString()) for f in expected.schema.fields]
    assert a_schema == e_schema, f"schema mismatch: {a_schema} != {e_schema}"
    extra = actual.exceptAll(expected)
    missing = expected.exceptAll(actual)
    n_extra, n_missing = extra.count(), missing.count()
    assert n_extra == 0 and n_missing == 0, (
        f"row mismatch: {n_extra} unexpected rows {extra.take(5)}, "
        f"{n_missing} missing rows {missing.take(5)}"
    )
