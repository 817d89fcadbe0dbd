"""Event-stream operators over the ``events`` table: sessionization and
windowed aggregation — batch DataFrame versions with exact SQL oracles;
the streaming variants use the same expressions behind
``withWatermark`` + ``session_window``/``window``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

SESSION_GAP_MIN = 30


def sessionize(spark: SparkSession, sf_dir: str,
               gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Classic lag+cumsum sessionization: a new session starts when the
    gap to the previous event of the same user exceeds gap_minutes.
    Returns per-session stats."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")  # ts is TIMESTAMP_NTZ; session tz is UTC
    gap = epoch - F.lag(epoch).over(w)
    sess = (ev.withColumn("new_sess",
                          F.when(gap.isNull() | (gap > gap_minutes * 60), 1)
                          .otherwise(0))
            .withColumn("sess_no", F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    # decimal sum is exact/order-independent; a double sum's floor() can
    # flip on boundary values depending on partition order vs the oracle
    return (sess.groupBy("user_id", "sess_no")
            .agg(F.count("*").alias("n_events"),
                 F.floor(F.sum(F.col("value").cast("decimal(38,6)")))
                 .cast("bigint").alias("sum_value_fl"),
                 F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("sess_start"))
            .orderBy("user_id", "sess_no"))


SESSIONIZE_SQL = f"""
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sess_no
  FROM g
)
SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no, count(*) AS n_events,
       CAST(floor(sum(CAST(value AS DECIMAL(38,6)))) AS BIGINT) AS sum_value_fl,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start
FROM s GROUP BY user_id, sess_no ORDER BY user_id, sess_no
"""


def windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type (batch form of the
    streaming windowed agg)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.floor(F.sum(F.col("value").cast("decimal(38,6)")))
                 .cast("bigint").alias("sum_value_fl"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
                    "event_type", "n", "sum_value_fl")
            .orderBy("win_start", "event_type"))


WINDOWED_COUNTS_SQL = """
SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type, count(*) AS n,
       CAST(floor(sum(CAST(value AS DECIMAL(38,6)))) AS BIGINT) AS sum_value_fl
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""
