"""The local oracle checker must be type-faithful (VERDICT r4 finding
2): the driver's value hash distinguishes DuckDB HUGEINT (an un-CAST
SUM over an integer column) from Spark bigint even when every value is
equal, while str()-normalization masks it. scripts/check_oracles.py's
type_audit is the guard — pin that it reproduces the r4 reds' exact
bug class (uncast SUM -> HUGEINT -> flagged) and passes the safe set."""

import sys

import duckdb
from pyspark.sql.types import (ArrayType, DoubleType, LongType, StringType,
                               StructField, StructType)

sys.path.insert(0, "scripts")
from check_oracles import type_audit, _canon_duck_type  # noqa: E402


def _duck(sql):
    rel = duckdb.sql(sql)
    return [c.lower() for c in rel.columns], list(rel.types)


def test_uncast_sum_hugeint_is_flagged():
    # the literal r4 bug class: SUM over an integer column -> HUGEINT
    duck_cols, duck_types = _duck(
        "SELECT SUM(x) AS batch_tokens FROM (VALUES (1), (2)) t(x)")
    assert _canon_duck_type(duck_types[0]).startswith("BANNED")
    spark_schema = StructType([StructField("batch_tokens", LongType())])
    problems = type_audit(spark_schema, ["batch_tokens"],
                          duck_types, duck_cols)
    assert any("driver-unsafe" in p for p in problems)


def test_cast_sum_bigint_is_clean():
    duck_cols, duck_types = _duck(
        "SELECT CAST(SUM(x) AS BIGINT) AS batch_tokens "
        "FROM (VALUES (1), (2)) t(x)")
    spark_schema = StructType([StructField("batch_tokens", LongType())])
    assert type_audit(spark_schema, ["batch_tokens"],
                      duck_types, duck_cols) == []


def test_int_vs_float_class_mismatch_is_flagged():
    duck_cols, duck_types = _duck(
        "SELECT CAST(1 AS BIGINT) AS v")
    spark_schema = StructType([StructField("v", DoubleType())])
    problems = type_audit(spark_schema, ["v"], duck_types, duck_cols)
    assert any("class mismatch" in p for p in problems)


def test_safe_types_and_nested_pass():
    duck_cols, duck_types = _duck(
        "SELECT CAST(1 AS BIGINT) AS a, 'x' AS b, 1.5 AS c, "
        "[1, 2] AS d")
    # DuckDB 1.5 literal is DECIMAL — also unsafe; cast it
    duck_cols, duck_types = _duck(
        "SELECT CAST(1 AS BIGINT) AS a, 'x' AS b, "
        "CAST(1.5 AS DOUBLE) AS c, [1, 2] AS d")
    spark_schema = StructType([
        StructField("a", LongType()), StructField("b", StringType()),
        StructField("c", DoubleType()),
        StructField("d", ArrayType(LongType()))])
    assert type_audit(spark_schema, ["a", "b", "c", "d"],
                      duck_types, duck_cols) == []


def test_decimal_literal_is_flagged():
    # DECIMAL round-trips through pandas as object/Decimal — unsafe
    duck_cols, duck_types = _duck("SELECT 1.5 AS v")
    spark_schema = StructType([StructField("v", DoubleType())])
    problems = type_audit(spark_schema, ["v"], duck_types, duck_cols)
    assert any("driver-unsafe" in p for p in problems)
