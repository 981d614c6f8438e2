"""Regression tests for tools/check_oracle.py — the local replica of the
driver's correctness gate.

The r5 driver marked three queries red because their oracle SQL emitted an
uncast DuckDB ``SUM(BIGINT)`` (HUGEINT -> Arrow decimal128) while Spark
returned int64, and the old self-grade coerced Decimal->float and missed it.
These tests pin the fix: the comparator must (a) distinguish numeric type
classes and (b) flag decimal128-bound oracle columns whose Spark twin is not
DecimalType.
"""

from __future__ import annotations

import datetime
import decimal
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracle import canon_rows, normalize, typeclass_violations  # noqa: E402


def test_normalize_distinguishes_decimal_from_int():
    # The exact r5 failure: Decimal('13017') vs int 13017 compare EQUAL in
    # Python but hash differently in the driver. They must normalize apart.
    assert normalize(decimal.Decimal("13017")) != normalize(13017)
    assert normalize(1.0) != normalize(1)
    assert normalize(True) != normalize(1)


def test_normalize_is_scale_insensitive_within_decimal():
    assert normalize(decimal.Decimal("1.50")) == normalize(decimal.Decimal("1.5"))
    assert normalize(decimal.Decimal("13017")) == normalize(decimal.Decimal("13017.0"))


def test_normalize_stable_values():
    assert normalize(None) is None
    assert normalize(float("nan")) == ("f", "NaN")
    assert normalize(decimal.Decimal("NaN")) == ("d", "NaN")
    assert normalize([1, 2.0]) == (("i", 1), ("f", 2.0))
    assert normalize(datetime.date(2024, 1, 2)) == "2024-01-02T00:00:00"


def test_canon_rows_catches_hugeint_vs_int64():
    # Pre-fix r5 shape: identical values, different numeric classes.
    a = canon_rows(["total"], [(13017,)])
    b = canon_rows(["total"], [(decimal.Decimal("13017"),)])
    assert a != b


@pytest.mark.usefixtures("spark")
def test_typeclass_violations_flags_uncast_sum(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT CAST(range AS BIGINT) AS n FROM range(5)")
    sdf = spark.range(1).selectExpr("CAST(10 AS BIGINT) AS total")
    # Uncast SUM(BIGINT) -> HUGEINT: must be flagged.
    viols = typeclass_violations(sdf, con, "SELECT SUM(n) AS total FROM t")
    assert viols and viols[0].startswith("total:")
    # CAST fixes it.
    assert typeclass_violations(sdf, con, "SELECT CAST(SUM(n) AS BIGINT) AS total FROM t") == []
    # Decimal-on-both-sides is legitimate.
    sdec = spark.range(1).selectExpr("CAST(1.5 AS DECIMAL(12,9)) AS total")
    assert typeclass_violations(sdec, con, "SELECT CAST(SUM(n) AS DECIMAL(12,9)) AS total FROM t") == []
