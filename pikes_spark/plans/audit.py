"""Physical-plan audit helpers: assert the optimizations this engine
claims are actually visible in Catalyst's formatted explain output.

Used by tests/test_plans.py and available for ad-hoc plan inspection
(`python -c "from pikes_spark.plans.audit import explain_formatted; ..."`).
The checks encode the 100-TB plan contract:

- filters/projections must reach the parquet scan (PushedFilters /
  ReadSchema) — a scan that reads every column for a two-column
  projection is wrong at any scale;
- dictionary-sized sides must broadcast (BroadcastHashJoin, never
  SortMergeJoin for the candidate dictionary);
- JVM-only operators must stay inside whole-stage codegen (no
  BatchEvalPython / ArrowEvalPython nodes);
- aggregations must be partial (map-side combine) — two
  HashAggregate nodes around the exchange;
- pair operators must never degenerate into row-level cartesian
  products (CartesianProduct / BroadcastNestedLoopJoin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The `formatted` explain string (same text .explain shows)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = explain_formatted(df)
    assert f"PushedFilters: {fragment}" in plan or fragment in plan, plan


def assert_read_schema(df: DataFrame, schema_fragment: str) -> None:
    plan = explain_formatted(df)
    assert f"ReadSchema: {schema_fragment}" in plan, plan


def assert_broadcast_join(df: DataFrame) -> None:
    plan = explain_formatted(df)
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def assert_no_python_eval(df: DataFrame) -> None:
    plan = explain_formatted(df)
    assert "EvalPython" not in plan, plan


def assert_partial_aggregation(df: DataFrame) -> None:
    plan = explain_formatted(df)
    assert plan.count("HashAggregate") >= 2, plan


def assert_no_cartesian(df: DataFrame) -> None:
    plan = explain_formatted(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
