"""Stream-stream event-time join (watermarked, time-bounded).

The ad-attribution shape: every ``click`` is joined to each prior
``view`` by the same user within an attribution window — the canonical
Structured Streaming stream-stream INNER join (Spark docs: "Stream-
Stream Joins", time-range condition + watermarks on both sides).

Reference scope: the reference engine is batch-only (SURVEY §2 S3/S6);
this module extends the engine the way its streaming sessionizer does
— same semantics as the batch SQL twin, driven through a real
streaming run so the state/watermark machinery is exercised, then
value-checked against the batch oracle.

Scale design (10^12 events):
- Both sides carry a watermark, so Spark bounds the join STATE: a
  buffered view row is dropped as soon as the click-side watermark
  passes ``view.ts + window`` (state size = input-rate × window, not
  history).
- The join keys on user_id → both sides hash-partition identically;
  the time-range predicate prunes within each key group. No skew
  beyond per-user fan-in (same exposure as batch sessionize).
- INNER join emits matches as they are found; completeness does not
  wait for watermark expiry, so a single availableNow pass yields the
  full result set (expiry only GCs state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

ATTRIB_WINDOW_MIN = 60


def streaming_view_click_join(events_stream: DataFrame,
                              window_minutes: int = ATTRIB_WINDOW_MIN,
                              watermark: str = "1 minute") -> DataFrame:
    """events readStream (event_id, ts, user_id, event_type) ->
    append-mode stream of (user_id, view_id, click_id, gap_us):
    every (view, click) pair of the same user with
    view.ts <= click.ts <= view.ts + window."""
    views = (events_stream.filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"),
                     F.col("ts").alias("v_ts"),
                     F.col("event_id").alias("view_id"))
             .withWatermark("v_ts", watermark))
    clicks = (events_stream.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("ts").alias("c_ts"),
                      F.col("event_id").alias("click_id"))
              .withWatermark("c_ts", watermark))
    joined = views.join(
        clicks,
        F.expr(f"""v_user = c_user AND c_ts >= v_ts
                   AND c_ts <= v_ts + INTERVAL {window_minutes} MINUTES"""))
    # exact microsecond gap (second-granular casts would round
    # differently across engines on fractional-second timestamps)
    return joined.select(
        F.col("v_user").alias("user_id"), "view_id", "click_id",
        (F.unix_micros(F.col("c_ts").cast("timestamp"))
         - F.unix_micros(F.col("v_ts").cast("timestamp")))
        .alias("gap_us"))


def run_view_click_join(spark: SparkSession, sf_dir: str,
                        landing: str, out: str, ckpt: str) -> None:
    """Land the events table, run the stream-stream join through one
    availableNow pass, commit results to ``out`` as parquet."""
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string")
    # Land as ONE file: the data spans days but the watermark is
    # minutes, so batch-oracle equivalence requires the availableNow
    # pass to see everything in a single micro-batch (a second batch
    # after the watermark advanced would drop rows as late). One input
    # file with no maxFilesPerTrigger = exactly one micro-batch; on a
    # real continuous deployment the watermark bounds state and late
    # rows are dropped BY DESIGN (the docstring contract).
    (spark.read.parquet(f"{sf_dir}/events.parquet")
     .select("event_id", "ts", "user_id", "event_type")
     .coalesce(1).write.parquet(landing))
    stream = spark.readStream.schema(schema).parquet(landing)
    q = (streaming_view_click_join(stream).writeStream
         .format("parquet").outputMode("append")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(600)


VIEW_CLICK_JOIN_SQL = f"""
SELECT v.user_id AS user_id,
       v.event_id AS view_id,
       c.event_id AS click_id,
       epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
FROM events v JOIN events c
  ON v.user_id = c.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts >= v.ts
 AND c.ts <= v.ts + INTERVAL {ATTRIB_WINDOW_MIN} MINUTE
ORDER BY v.user_id, view_id, click_id
"""
