"""Data-quality operators: row constraints + aggregate expectations.

Reference: `dataobject/Constraint.scala:37-63` (row-level boolean SQL;
violation raises with a PK trace), `dataobject/expectation/*.scala`
(SQLExpectation :39, CountExpectation :44, SQLFractionExpectation :48,
UniqueKeyExpectation :51-75, scopes Job/JobPartition/All Expectation.scala:122-134)
and the evaluation pipeline `dataobject/ExpectationValidation.scala:77-216`.

Job-scope metrics ride on `df.observe()` — zero extra scans; All-scope runs a
separate aggregation query against the written data.
"""

from __future__ import annotations

import abc
from dataclasses import dataclass
from enum import Enum
from typing import Any

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


class Severity(str, Enum):
    WARN = "warn"
    ERROR = "error"


class ExpectationScope(str, Enum):
    JOB = "job"  # rows written by this run (observe)
    JOB_PARTITION = "job_partition"  # per processed partition (groupBy agg)
    ALL = "all"  # whole table after write (separate agg query)


class ExpectationValidationError(Exception):
    pass


@dataclass
class Constraint:
    """Row-level constraint compiled into the write plan
    (Constraint.scala:37-63): any violating row aborts the job via
    raise_error, carrying a primary-key trace for debugging."""

    name: str
    expression: str
    pk_cols: list[str] | None = None

    def validation_column(self) -> Column:
        msg = F.concat(
            F.lit(f"constraint '{self.name}' ({self.expression}) violated"),
            F.lit(" for "),
            F.to_json(F.struct(*[F.col(c) for c in (self.pk_cols or [])])) if self.pk_cols else F.lit("row"),
        )
        return F.when(~F.coalesce(F.expr(self.expression), F.lit(False)), F.raise_error(msg)).otherwise(
            F.lit(True)
        )


def apply_constraints(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Force constraint evaluation by routing every output column through a
    when(raise_error) guard column (ExpectationValidation.scala:191-208)."""
    if not constraints:
        return df
    guard = F.lit(True)
    for c in constraints:
        guard = guard & c.validation_column()
    return df.withColumn("_dl_constraints", guard).where(F.col("_dl_constraints")).drop("_dl_constraints")


@dataclass
class Expectation(abc.ABC):
    name: str
    expectation: str | None = None  # comparison suffix e.g. "> 0", "= 1"
    severity: Severity = Severity.ERROR
    scope: ExpectationScope = ExpectationScope.JOB

    @abc.abstractmethod
    def agg_expressions(self) -> list[Column]:
        """Aggregate expressions producing this expectation's metric(s)."""

    def evaluate(self, metrics: dict[str, Any]) -> str | None:
        """Return violation message or None; default compares metric `name`
        against the `expectation` suffix."""
        if self.expectation is None:
            return None
        value = metrics.get(self.name)
        ok = _compare(value, self.expectation)
        if ok:
            return None
        return f"expectation '{self.name}' failed: {value!r} !{self.expectation}"


@dataclass
class SQLExpectation(Expectation):
    """Named aggregate expression (SQLExpectation.scala:39)."""

    aggExpression: str = "count(*)"

    def agg_expressions(self):
        return [F.expr(self.aggExpression).alias(self.name)]


@dataclass
class CountExpectation(Expectation):
    """(CountExpectation.scala:44)"""

    name: str = "count"

    def agg_expressions(self):
        return [F.count(F.lit(1)).alias(self.name)]


@dataclass
class SQLFractionExpectation(Expectation):
    """Fraction of rows matching a condition (SQLFractionExpectation.scala:48)."""

    condition: str = "true"

    def agg_expressions(self):
        return [
            (
                F.sum(F.when(F.expr(self.condition), F.lit(1)).otherwise(F.lit(0)))
                / F.count(F.lit(1))
            ).alias(self.name)
        ]


@dataclass
class UniqueKeyExpectation(Expectation):
    """PK uniqueness via count vs (approx_)count_distinct
    (UniqueKeyExpectation.scala:51-75). approximate=True uses HyperLogLog —
    the only sane option on a 100 TB key space."""

    key_cols: list[str] | None = None
    approximate: bool = False
    expectation: str | None = ">= 0.999999"

    def agg_expressions(self):
        keys = F.struct(*[F.col(c) for c in (self.key_cols or [])])
        distinct = (
            F.approx_count_distinct(keys) if self.approximate else F.count_distinct(keys)
        )
        return [(distinct / F.count(F.lit(1))).alias(self.name)]


def setup_observation(
    df: DataFrame, expectations: list[Expectation], obs_name: str
) -> tuple[DataFrame, Observation | None]:
    """Attach job-scope expectation metrics to the write via observe()."""
    job_exps = [e for e in expectations if e.scope == ExpectationScope.JOB]
    exprs = [F.count(F.lit(1)).alias("count")]
    seen = {"count"}
    for e in job_exps:
        for expr in e.agg_expressions():
            alias = expr._jc.toString().split(" AS ")[-1].strip("`") if " AS " in expr._jc.toString() else e.name
            if alias in seen:
                continue
            seen.add(alias)
            exprs.append(expr)
    obs = Observation(obs_name)
    return df.observe(obs, *exprs), obs


def validate_expectations(
    expectations: list[Expectation],
    metrics: dict[str, Any],
) -> list[str]:
    """Evaluate all expectations; raise on Error severity, return warnings
    (DataFrameActionImpl.scala:339-368)."""
    warnings: list[str] = []
    errors: list[str] = []
    for e in expectations:
        msg = e.evaluate(metrics)
        if msg is None:
            continue
        (errors if e.severity == Severity.ERROR else warnings).append(msg)
    if errors:
        raise ExpectationValidationError("; ".join(errors))
    return warnings


def compute_scope_all_metrics(df: DataFrame, expectations: list[Expectation]) -> dict[str, Any]:
    """Separate aggregation query for scope=All expectations."""
    all_exps = [e for e in expectations if e.scope == ExpectationScope.ALL]
    if not all_exps:
        return {}
    exprs = [x for e in all_exps for x in e.agg_expressions()]
    row = df.agg(*exprs).collect()[0]
    return row.asDict()


def _compare(value: Any, expectation: str) -> bool:
    if value is None:
        return False
    expectation = expectation.strip()
    for op in (">=", "<=", "!=", "==", ">", "<", "="):
        if expectation.startswith(op):
            rhs = float(expectation[len(op):].strip().strip("'\""))
            lhs = float(value)
            return {
                ">=": lhs >= rhs,
                "<=": lhs <= rhs,
                ">": lhs > rhs,
                "<": lhs < rhs,
                "=": lhs == rhs,
                "==": lhs == rhs,
                "!=": lhs != rhs,
            }[op]
    raise ValueError(f"cannot parse expectation {expectation!r}")
