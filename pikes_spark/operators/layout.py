"""Data-layout clustering: z-order (Morton) file clustering stats.

The Iceberg/Delta OPTIMIZE ZORDER story, quantified: when a table is
queried by TWO independent columns, sorting files by either one makes
min/max file pruning useless for the other. Interleaving the columns'
bits (the Morton curve) bounds BOTH columns' value span inside every
file, so a predicate on either column skips most files.

This operator writes nothing — it computes, for the same rows under a
linear (single-column sort) layout and a z-order layout, the per-file
min/max span of both clustering columns and returns the per-layout
span sums. The ratio IS the data-skipping win: a filter's expected
scan cost is proportional to the summed span overlap. At 100 TB this
decides whether a point query reads 1 file or 10^4; the computation
here is two window row_numbers + one groupBy — nothing scans twice.

The z-value expression is generated ONCE as SQL text and used
verbatim by both engines (F.expr and DuckDB), so the oracle exercises
the identical bit arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_BITS = 8            # 8 bits per dimension -> 16-bit z-values
_ROWS_PER_FILE = 512


def _z_expr(x: str, y: str, bits: int = _BITS) -> str:
    """Morton interleave of two pre-bounded [0, 2^bits) ints as pure
    integer SQL — identical text for Spark and DuckDB."""
    terms = []
    for i in range(bits):
        terms.append(
            f"(CAST(floor(({x}) / {1 << i}) AS BIGINT) % 2) * {1 << (2 * i)}")
        terms.append(
            f"(CAST(floor(({y}) / {1 << i}) AS BIGINT) % 2) * {1 << (2 * i + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


# clustering dimensions over orders: customer key and order day, each
# folded to 8 bits (real z-ordering range-partitions first; the fold
# keeps the arithmetic oracle-identical)
_X = "o_custkey % 256"
_Y_SPARK = "datediff(o_orderdate, DATE '1992-01-01') % 256"
_Y_DUCK = "date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 256"


def zorder_stats(spark: SparkSession, sf_dir: str,
                 rows_per_file: int = _ROWS_PER_FILE) -> DataFrame:
    """Per-layout file-clustering quality: (layout, n_files,
    sum_x_span, sum_y_span) for 'linear' (sorted by order date) vs
    'zorder' (sorted by the Morton value of (custkey, day)).

    Scale shape: two sorts of (int, int, int) projections — the sort
    IS the operation being modeled (a layout rewrite is a sort) —
    then one map-side-combinable per-file min/max groupBy each."""
    from pyspark.sql import Window
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = orders.select(
        F.expr(_X).alias("x"),
        F.expr(_Y_SPARK).alias("y"),
        F.col("o_orderkey").alias("okey"))

    def spans(df: DataFrame, order_cols, layout: str) -> DataFrame:
        w = Window.orderBy(*order_cols)
        f = df.withColumn(
            "file_id",
            F.floor((F.row_number().over(w) - 1) / rows_per_file))
        per_file = (f.groupBy("file_id")
                    .agg((F.max("x") - F.min("x") + 1).alias("xs"),
                         (F.max("y") - F.min("y") + 1).alias("ys")))
        return per_file.agg(
            F.lit(layout).alias("layout"),
            F.count("*").cast("bigint").alias("n_files"),
            F.sum("xs").cast("bigint").alias("sum_x_span"),
            F.sum("ys").cast("bigint").alias("sum_y_span"))

    lin = spans(base, [F.col("y"), F.col("okey")], "linear")
    zed = spans(base.withColumn("z", F.expr(_z_expr("x", "y"))),
                [F.col("z"), F.col("okey")], "zorder")
    return lin.unionAll(zed).orderBy("layout")


ZORDER_STATS_SQL = f"""
WITH base AS (
  SELECT {_X} AS x, {_Y_DUCK} AS y, o_orderkey AS okey FROM orders
),
lin AS (
  SELECT CAST(floor((row_number() OVER (ORDER BY y, okey) - 1)
              / {_ROWS_PER_FILE}) AS BIGINT) AS file_id, x, y
  FROM base
),
zed AS (
  SELECT CAST(floor((row_number() OVER (ORDER BY {_z_expr('x', 'y')}, okey)
              - 1) / {_ROWS_PER_FILE}) AS BIGINT) AS file_id, x, y
  FROM base
),
lf AS (SELECT file_id, max(x) - min(x) + 1 AS xs, max(y) - min(y) + 1 AS ys
       FROM lin GROUP BY 1),
zf AS (SELECT file_id, max(x) - min(x) + 1 AS xs, max(y) - min(y) + 1 AS ys
       FROM zed GROUP BY 1)
SELECT 'linear' AS layout, CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(xs) AS BIGINT) AS sum_x_span,
       CAST(sum(ys) AS BIGINT) AS sum_y_span FROM lf
UNION ALL
SELECT 'zorder', CAST(count(*) AS BIGINT), CAST(sum(xs) AS BIGINT),
       CAST(sum(ys) AS BIGINT) FROM zf
ORDER BY layout
"""


# ---------------------------------------------------------------------------
# bucketed co-located join: the shuffle-free big-big join layout
# ---------------------------------------------------------------------------

_BUCKETS = 8


def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write customer and an orders rollup as BUCKETED tables
    (bucketBy(8, key) + sortBy) and join them — the layout that makes
    a big-big equi-join SHUFFLE-FREE: both sides' files are already
    hash-partitioned and sorted by the join key, so the sort-merge
    join reads co-located buckets with NO Exchange on either side
    (asserted in tests/test_plans.py).

    This is the survey's spo/pos-layout principle applied to join
    locality: at 100 TB the dominant cost of a repeated
    customer⋈orders join is the two table-wide hash exchanges;
    bucketing pays that shuffle ONCE at write time and amortizes it
    over every subsequent join/aggregation on the key. The returned
    rollup is value-checked against the plain (unbucketed) join SQL —
    layout must never change results.

    Mechanics: external bucketed tables under a temp warehouse path,
    unique per-run names (driver reruns safe), dropped after
    materialization; results land in a plain DataFrame."""
    import tempfile
    import uuid

    tag = uuid.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix="pikes_buckets_")
    tc, to = f"bkt_cust_{tag}", f"bkt_ord_{tag}"
    cust = (spark.read.parquet(f"{sf_dir}/customer.parquet")
            .select("c_custkey", "c_mktsegment"))
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .groupBy("o_custkey")
              .agg(F.count("*").cast("bigint").alias("n_orders"),
                   F.sum(F.floor(F.col("o_totalprice") * 100)
                         .cast("bigint")).alias("cents")))
    (cust.write.bucketBy(_BUCKETS, "c_custkey").sortBy("c_custkey")
     .option("path", f"{base}/{tc}").saveAsTable(tc))
    (orders.write.bucketBy(_BUCKETS, "o_custkey").sortBy("o_custkey")
     .option("path", f"{base}/{to}").saveAsTable(to))
    try:
        joined = (spark.table(tc).join(
            spark.table(to),
            F.col("c_custkey") == F.col("o_custkey"))
            .groupBy("c_mktsegment")
            .agg(F.count("*").cast("bigint").alias("n_cust"),
                 F.sum("n_orders").cast("bigint").alias("n_orders"),
                 F.sum("cents").cast("bigint").alias("cents"))
            .orderBy("c_mktsegment"))
        out = spark.createDataFrame(joined.collect(), joined.schema)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tc}")
        spark.sql(f"DROP TABLE IF EXISTS {to}")
    return out


def bucketed_join_plan(spark: SparkSession, sf_dir: str):
    """The bucketed join frame itself (not materialized) plus its
    table names, for plan assertions; caller must drop the tables."""
    import tempfile
    import uuid

    tag = uuid.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix="pikes_buckets_")
    tc, to = f"bkt_cust_{tag}", f"bkt_ord_{tag}"
    cust = (spark.read.parquet(f"{sf_dir}/customer.parquet")
            .select("c_custkey", "c_mktsegment"))
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .groupBy("o_custkey")
              .agg(F.count("*").cast("bigint").alias("n_orders")))
    (cust.write.bucketBy(_BUCKETS, "c_custkey").sortBy("c_custkey")
     .option("path", f"{base}/{tc}").saveAsTable(tc))
    (orders.write.bucketBy(_BUCKETS, "o_custkey").sortBy("o_custkey")
     .option("path", f"{base}/{to}").saveAsTable(to))
    # force the sort-merge strategy: at sandbox scale the planner
    # prefers broadcast (and then ignores bucketing); the property
    # under test is the big-big layout, where SMJ is what runs
    j = (spark.table(tc).hint("merge")
         .join(spark.table(to).hint("merge"),
               F.col("c_custkey") == F.col("o_custkey")))
    return j, (tc, to)


BUCKETED_JOIN_SQL = """
WITH rollup_o AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_custkey
)
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_cust,
       CAST(sum(r.n_orders) AS BIGINT) AS n_orders,
       CAST(sum(r.cents) AS BIGINT) AS cents
FROM customer c JOIN rollup_o r ON c.c_custkey = r.o_custkey
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
"""


# ---------------------------------------------------------------------------
# partitioned layout + partition-pruned scan
# ---------------------------------------------------------------------------

_PRUNE_DAYS = ("2024-01-03", "2024-01-04")


def partitioned_events_rollup(spark: SparkSession, sf_dir: str,
                              days=_PRUNE_DAYS) -> DataFrame:
    """Hive-partitioned layout + pruned read: the events table is
    written partitioned by event_date (the storage layout a 100 TB
    event log actually uses — one directory per day), then a
    two-day rollup reads it back through a partition filter.

    The point at scale: the date predicate is resolved against the
    partition MANIFEST, not the data — the scan touches 2 of ~30
    directories and the other 28 days are never opened (asserted on
    the physical plan in tests/test_plans_session8.py via
    PartitionFilters/'partitions read'). Values are checked against
    the unpartitioned SQL — layout must never change results.

    Integer cents (floor(value*100)) keep the sum exact cross-engine."""
    import tempfile

    base = tempfile.mkdtemp(prefix="pikes_partevents_")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    (ev.withColumn("event_date", F.to_date("ts"))
     .write.partitionBy("event_date").mode("overwrite").parquet(base))
    pruned = pruned_events_frame(spark, base, days)
    out = spark.createDataFrame(pruned.collect(), pruned.schema)
    import shutil
    shutil.rmtree(base, ignore_errors=True)
    return out


def pruned_events_frame(spark: SparkSession, base: str,
                        days=_PRUNE_DAYS) -> DataFrame:
    """The pruned-scan rollup frame (separate so tests can assert the
    partition filters on the un-materialized plan)."""
    part = spark.read.parquet(base)
    return (part.filter(F.col("event_date")
                        .isin([F.lit(d).cast("date") for d in days]))
            .groupBy(F.col("event_date").cast("string").alias("event_date"),
                     "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.floor(F.col("value") * 100).cast("bigint"))
                 .alias("cents"))
            .orderBy("event_date", "event_type"))


PARTITION_PRUNE_SQL = f"""
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events
WHERE (CAST(ts AS DATE) = DATE '{_PRUNE_DAYS[0]}'
       OR CAST(ts AS DATE) = DATE '{_PRUNE_DAYS[1]}')
GROUP BY 1, 2 ORDER BY 1, 2
"""
