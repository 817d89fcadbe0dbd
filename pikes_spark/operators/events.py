"""Event-stream operators over the ``events`` table: sessionization and
windowed aggregation — batch DataFrame versions with exact SQL oracles;
the streaming variants use the same expressions behind
``withWatermark`` + ``session_window``/``window``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events scan re-split to the session core count when the source
    has fewer parquet splits than cores (same rationale as
    dedup._documents: a small single-file input otherwise runs every
    map — JSON parsing, timestamp math — on one task until the first
    exchange; a no-op on real many-file inputs)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    par = spark.sparkContext.defaultParallelism
    if ev.rdd.getNumPartitions() < par:
        ev = ev.repartition(par)
    return ev

SESSION_GAP_MIN = 30


def sessionize(spark: SparkSession, sf_dir: str,
               gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Classic lag+cumsum sessionization: a new session starts when the
    gap to the previous event of the same user exceeds gap_minutes.
    Returns per-session stats."""
    ev = _events(spark, sf_dir)
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
    ev = _events(spark, sf_dir)
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


def asof_join(spark: SparkSession, sf_dir: str,
              left_type: str = "click",
              right_type: str = "purchase") -> DataFrame:
    """Point-in-time-correct AS-OF join (the operator Spark's DataFrame
    API lacks natively; kdb aj / DuckDB ASOF JOIN semantics): for every
    ``left_type`` event, the same user's most recent ``right_type``
    event at-or-before its timestamp.

    Plan: union-tag both sides, ONE shuffle on user_id, then an
    event-time-ordered running ``last(..., ignorenulls)`` window carries
    the right side forward — no range self-join, no per-row probe. This
    is the standard scalable shape for feature-store point-in-time
    joins; at 10^12 rows the only exchange is the user_id hash
    partition both sides share, and skewed users cost only window
    sort, not join fanout.

    Equal timestamps: the right side sorts FIRST (side 0 < 1), so
    at-or-before is inclusive — exactly DuckDB's ``ON l.ts >= r.ts``.
    Non-matching left rows are dropped (inner as-of).
    """
    ev = _events(spark, sf_dir)
    left = (ev.filter(F.col("event_type") == left_type)
            .select("user_id", "ts", "event_id",
                    F.lit(None).cast("timestamp").alias("r_ts"),
                    F.lit(None).cast("double").alias("r_value"),
                    F.lit(1).alias("side")))
    right = (ev.filter(F.col("event_type") == right_type)
             .select("user_id", "ts",
                     F.lit(None).cast("bigint").alias("event_id"),
                     F.col("ts").alias("r_ts"),
                     F.col("value").alias("r_value"),
                     F.lit(0).alias("side")))
    w = (Window.partitionBy("user_id")
         .orderBy("ts", "side", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = (right.unionByName(left)
               .withColumn("p_ts", F.last("r_ts", ignorenulls=True).over(w))
               .withColumn("p_value",
                           F.last("r_value", ignorenulls=True).over(w)))
    return (carried.filter((F.col("side") == 1) & F.col("p_ts").isNotNull())
            .select("event_id", "user_id",
                    F.floor(F.col("p_value") * 1000).cast("bigint")
                    .alias("purchase_value_x1000"),
                    (F.col("ts").cast("timestamp").cast("long")
                     - F.col("p_ts").cast("timestamp").cast("long"))
                    .alias("gap_s"))
            .orderBy("event_id"))


ASOF_JOIN_SQL = """
SELECT c.event_id, c.user_id,
       CAST(floor(p.value * 1000) AS BIGINT) AS purchase_value_x1000,
       CAST(date_diff('second', p.ts, c.ts) AS BIGINT) AS gap_s
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.event_id
"""


def sliding_window_count(spark: SparkSession, sf_dir: str,
                         minutes: int = 5) -> DataFrame:
    """Per-event burst metric: how many events the same user fired in
    the preceding ``minutes`` (inclusive of this one) — the
    rate-limit / burst-detection primitive of an ingest pipeline.

    Uses a true event-time RANGE frame (rangeBetween over epoch
    seconds), not a row frame: ties and uneven spacing are handled by
    time, and Spark evaluates it in the same single user_id exchange
    as any other window — no self-join. DuckDB oracle uses the
    equivalent RANGE BETWEEN INTERVAL frame.
    """
    ev = _events(spark, sf_dir)
    secs = F.col("ts").cast("timestamp").cast("long")
    w = (Window.partitionBy("user_id").orderBy(F.col("ts_s"))
         .rangeBetween(-minutes * 60, 0))
    return (ev.withColumn("ts_s", secs)
            .withColumn("n_burst", F.count("*").over(w))
            .select("event_id", "user_id", F.col("n_burst").cast("bigint")
                    .alias("n_burst"))
            .orderBy("event_id"))


SLIDING_COUNT_SQL = """
SELECT event_id, user_id,
       CAST(count(*) OVER (
         PARTITION BY user_id ORDER BY date_trunc('second', ts)
         RANGE BETWEEN INTERVAL 5 MINUTE PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS n_burst
FROM events
ORDER BY event_id
"""


FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: per user, how deep into the
    view -> click -> purchase sequence they got, where each stage must
    occur STRICTLY after the previous stage's first occurrence
    (strict ts comparison keeps the definition engine-independent
    under timestamp ties). depth 0 = never viewed.

    Scale shape: three conditional-min aggregations keyed by user_id.
    Each pre-aggregates map-side to one row per user before its
    exchange, and the stage tables join user-to-user (same key, so
    AQE plans them shuffle-local); nothing row-level ever crosses
    stages."""
    ev = _events(spark, sf_dir) \
              .select("user_id", "event_type", "ts")
    users = ev.select("user_id").distinct()
    v = (ev.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("v_ts")))
    c = (ev.join(v, "user_id")
         .filter((F.col("event_type") == "click") & (F.col("ts") > F.col("v_ts")))
         .groupBy("user_id").agg(F.min("ts").alias("c_ts")))
    p = (ev.join(c, "user_id")
         .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("c_ts")))
         .groupBy("user_id").agg(F.min("ts").alias("p_ts")))
    return (users.join(v, "user_id", "left").join(c, "user_id", "left")
            .join(p, "user_id", "left")
            .select("user_id",
                    F.when(F.col("p_ts").isNotNull(), 3)
                    .when(F.col("c_ts").isNotNull(), 2)
                    .when(F.col("v_ts").isNotNull(), 1)
                    .otherwise(0).cast("bigint").alias("funnel_depth"))
            .orderBy("user_id"))


FUNNEL_SQL = """
WITH users AS (SELECT DISTINCT user_id FROM events),
v AS (SELECT user_id, MIN(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY 1),
p AS (SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY 1)
SELECT u.user_id,
       CAST(CASE WHEN p.p_ts IS NOT NULL THEN 3
                 WHEN c.c_ts IS NOT NULL THEN 2
                 WHEN v.v_ts IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS funnel_depth
FROM users u
LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
LEFT JOIN p USING (user_id)
ORDER BY u.user_id
"""


# ---------------------------------------------------------------------------
# Weekly retention cohorts
# ---------------------------------------------------------------------------

def retention_cohorts(spark, sf_dir: str):
    """Classic cohort-retention matrix: users grouped by first-activity
    week (cohort), counted per week-offset of later activity.

    Weeks are epoch-day // 7 (timezone-free integer arithmetic — the
    same value in any engine; calendar WEEK() functions differ on
    week-start conventions between engines).

    Scale shape: everything is keyed by user_id until the final tiny
    (cohort, offset) aggregate — the distinct (user, week) pre-agg and
    the per-user min-week agg share one exchange key, and the join
    between them is user-keyed (AQE broadcastable since the cohort
    side is one row per user)."""
    ev = _events(spark, sf_dir)
    week = F.floor(F.datediff(F.to_date("ts"), F.lit("1970-01-01")) / 7)
    uw = ev.select("user_id", week.alias("week")).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (uw.join(cohort, "user_id")
            .withColumn("week_offset", F.col("week") - F.col("cohort_week"))
            .groupBy("cohort_week", "week_offset")
            .agg(F.countDistinct("user_id").alias("n_users"))
            .select(F.col("cohort_week").cast("bigint").alias("cohort_week"),
                    F.col("week_offset").cast("bigint").alias("week_offset"),
                    F.col("n_users").cast("bigint").alias("n_users"))
            .orderBy("cohort_week", "week_offset"))


RETENTION_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS week
  FROM events
),
cohort AS (
  SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
)
SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
       CAST(uw.week - c.cohort_week AS BIGINT) AS week_offset,
       CAST(COUNT(DISTINCT uw.user_id) AS BIGINT) AS n_users
FROM uw JOIN cohort c USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# SCD type-2 history build
# ---------------------------------------------------------------------------

def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from an event stream:
    per user, collapse consecutive repeats of the tracked attribute
    (event_type) and emit validity intervals [valid_from, valid_to)
    in epoch microseconds (valid_to = -1 for the open current row).
    The warehouse-dimension twin of sessionize: same single user_id
    shuffle, lag to detect change, lead for the interval close.

    Scale shape: ONE hash exchange on user_id feeds both windows
    (lag + lead share the partitioning/sort); rows are (long, string,
    long) — the event payload is projected away before the shuffle."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (ev.select("user_id", "event_id", "ts", "event_type")
           .withColumn("prev", F.lag("event_type").over(w))
           .filter(F.col("prev").isNull()
                   | (F.col("prev") != F.col("event_type"))))
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ; session tz is UTC, so the cast is epoch-exact
    return (chg.withColumn(
        "valid_from_us",
        F.unix_micros(F.col("ts").cast("timestamp")))
            .withColumn("valid_to_us",
                        F.coalesce(F.lead("valid_from_us").over(w2),
                                   F.lit(-1).cast("long")))
            .select("user_id", "event_type", "valid_from_us",
                    "valid_to_us")
            .orderBy("user_id", "valid_from_us"))


SCD2_SQL = """
WITH chg AS (
  SELECT user_id, event_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
),
v AS (
  SELECT user_id, event_type, epoch_us(ts) AS valid_from_us, ts, event_id
  FROM chg WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type, valid_from_us,
       COALESCE(lead(valid_from_us) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id),
                -1) AS valid_to_us
FROM v ORDER BY user_id, valid_from_us
"""


# ---------------------------------------------------------------------------
# semi-structured property extraction (JSON payload rollup)
# ---------------------------------------------------------------------------

def json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract the JSON ``props`` payload (schema-on-read) and roll it
    up per event type — the semi-structured path every event pipeline
    needs: the payload column stays an opaque string in storage, the
    engine projects typed fields at query time.

    Scale shape: get_json_object is JVM-side (Jackson inside codegen,
    no Python); extraction happens BEFORE the groupBy so the exchange
    carries (event_type, k) longs, not JSON strings. At 10^12 events
    the parse is the map stage's CPU; a repeated-access production
    table would materialize the field once (schema evolution), which
    is what the snapshot MERGE machinery here already covers."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (ev.select("event_type", k.alias("k"))
            .groupBy("event_type")
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.sum("k").cast("bigint").alias("sum_k"),
                 F.min("k").cast("bigint").alias("min_k"),
                 F.max("k").cast("bigint").alias("max_k"),
                 F.countDistinct("k").cast("bigint").alias("n_k"))
            .orderBy("event_type"))


JSON_PROPS_SQL = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k,
       CAST(count(DISTINCT k) AS BIGINT) AS n_k
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# item co-visitation (recommendation counts)
# ---------------------------------------------------------------------------

_COVIS_MIN_USERS = 3
_COVIS_USER_CAP = 100


def covisitation(spark: SparkSession, sf_dir: str,
                 min_users: int = _COVIS_MIN_USERS,
                 user_cap: int = _COVIS_USER_CAP) -> DataFrame:
    """Item-item co-visitation counts (the classic recommendation
    candidate generator): items i1 < i2 both viewed/clicked by the
    same user, counted by DISTINCT users.

    Scale shape: the item id is parsed JVM-side (get_json_object)
    BEFORE the exchange; the per-user item set is distinct-reduced,
    and power users above `user_cap` distinct items are EXCLUDED
    (the cap is part of the contract, mirrored in the oracle — same
    discipline as common_neighbors' hub cap) so the per-user pair
    blowup is bounded by cap^2; pair counting is map-side
    combinable."""
    ev = _events(spark, sf_dir)
    ui = (ev.filter(F.col("event_type").isin("view", "click"))
          .select("user_id",
                  F.get_json_object("props", "$.k").cast("bigint")
                  .alias("item"))
          .distinct())
    deg = ui.groupBy("user_id").agg(F.count("*").alias("n_items"))
    ui = ui.join(deg.filter(F.col("n_items") <= user_cap), "user_id")
    l, r = ui.alias("l"), ui.alias("r")
    return (l.join(r, (F.col("l.user_id") == F.col("r.user_id"))
                   & (F.col("l.item") < F.col("r.item")))
            .groupBy(F.col("l.item").alias("i1"),
                     F.col("r.item").alias("i2"))
            .agg(F.count("*").alias("n_users"))
            .filter(F.col("n_users") >= min_users)
            .orderBy(F.desc("n_users"), "i1", "i2"))


COVISITATION_SQL = f"""
WITH ui AS (
  SELECT DISTINCT user_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events WHERE event_type IN ('view', 'click')
),
capped AS (
  SELECT user_id FROM ui GROUP BY user_id
  HAVING COUNT(*) <= {_COVIS_USER_CAP}
),
uic AS (SELECT ui.* FROM ui JOIN capped USING (user_id))
SELECT l.item AS i1, r.item AS i2, COUNT(*) AS n_users
FROM uic l JOIN uic r ON l.user_id = r.user_id AND l.item < r.item
GROUP BY l.item, r.item
HAVING COUNT(*) >= {_COVIS_MIN_USERS}
ORDER BY n_users DESC, i1, i2
"""


# ---------------------------------------------------------------------------
# daily trending top-k items
# ---------------------------------------------------------------------------

_TREND_K = 3


def trending_items(spark: SparkSession, sf_dir: str,
                   k: int = _TREND_K) -> DataFrame:
    """Top-k most-viewed items per day with deterministic ties
    (count desc, item asc). One (day, item) partial-agg count + one
    day-partitioned rank window whose k-cutoff Spark pushes below the
    shuffle (WindowGroupLimit), so only ~k rows per day survive."""
    from pyspark.sql import Window
    ev = _events(spark, sf_dir)
    daily = (ev.filter(F.col("event_type") == "view")
             .groupBy(F.to_date("ts").cast("string").alias("day"),
                      F.get_json_object("props", "$.k").cast("bigint")
                      .alias("item"))
             .agg(F.count("*").alias("n")))
    w = Window.partitionBy("day").orderBy(F.desc("n"), F.asc("item"))
    return (daily.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("day", "item", "n", F.col("rk").cast("bigint").alias("rk"))
            .orderBy("day", "rk"))


TRENDING_SQL = f"""
WITH daily AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
         COUNT(*) AS n
  FROM events WHERE event_type = 'view'
  GROUP BY 1, 2
)
SELECT day, item, n, rk FROM (
  SELECT day, item, n,
         CAST(ROW_NUMBER() OVER (PARTITION BY day ORDER BY n DESC, item ASC)
              AS BIGINT) AS rk
  FROM daily
) WHERE rk <= {_TREND_K}
ORDER BY day, rk
"""


# ---------------------------------------------------------------------------
# item transition matrix (first-order Markov counts)
# ---------------------------------------------------------------------------

_TRANS_MIN = 3


def item_transitions(spark: SparkSession, sf_dir: str,
                     min_n: int = _TRANS_MIN) -> DataFrame:
    """First-order Markov transition counts over each user's
    time-ordered view/click stream: (item_t -> item_{t+1}) pairs via
    one lead() on the SAME (user_id)-partitioned exchange the
    sessionizer uses, then a map-side-combinable pair count.
    Self-transitions (same item twice) are kept — they are real
    signal for dwell modeling. Ties in ts are broken by event_id so
    the sequence is total-ordered and cross-engine identical.

    Output: (src_item, dst_item, n) with n >= min_n, plus the exact
    rational row share p_fp = n * 1e6 // row_total for ranking."""
    from pyspark.sql import Window
    ev = _events(spark, sf_dir)
    stream = (ev.filter(F.col("event_type").isin("view", "click"))
              .select("user_id", "ts", "event_id",
                      F.get_json_object("props", "$.k").cast("bigint")
                      .alias("item")))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (stream
             .withColumn("nxt", F.lead("item").over(w))
             .filter(F.col("nxt").isNotNull())
             .groupBy(F.col("item").alias("src_item"),
                      F.col("nxt").alias("dst_item"))
             .agg(F.count("*").alias("n")))
    wrow = Window.partitionBy("src_item")
    return (pairs
            .withColumn("row_total", F.sum("n").over(wrow))
            .filter(F.col("n") >= min_n)
            .select("src_item", "dst_item", "n",
                    F.expr("n * 1000000 div row_total").alias("p_fp"))
            .orderBy("src_item", F.desc("n"), "dst_item"))


ITEM_TRANSITIONS_SQL = f"""
WITH stream AS (
  SELECT user_id, ts, event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events WHERE event_type IN ('view', 'click')
),
seq AS (
  SELECT item,
         LEAD(item) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM stream
),
pairs AS (
  SELECT item AS src_item, nxt AS dst_item, COUNT(*) AS n
  FROM seq WHERE nxt IS NOT NULL GROUP BY item, nxt
)
SELECT src_item, dst_item, n,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY src_item) AS BIGINT)
         AS p_fp
FROM pairs QUALIFY n >= {_TRANS_MIN}
ORDER BY src_item, n DESC, dst_item
"""


# ---------------------------------------------------------------------------
# bucketed interval range join
# ---------------------------------------------------------------------------

_RANGE_WIN_S = 1800  # purchases look back 30 minutes over views


def range_join_views(spark: SparkSession, sf_dir: str,
                     window_s: int = _RANGE_WIN_S) -> DataFrame:
    """Interval RANGE JOIN via time bucketing — the scale-safe shape
    for "join each purchase to every view of the same user in the
    preceding ``window_s`` seconds" that Spark's equi-join planner
    cannot derive from the inequality predicate alone (a naive
    user_id join explodes on power users; DuckDB plans an IEJoin).

    Plan: both sides bucket ts into ``window_s``-wide bins; a view
    can only serve purchases in its own bin or the next one (the
    lookback interval equals the bin width), so views are exploded
    into exactly those TWO (user, bin) keys (bounded 2x duplication,
    nothing like a cross join), equi-joined, then the exact interval
    predicate filters in the same stage. One shuffle on a composite
    key whose cardinality grows with users x time — skewed users are
    split across time bins, which is precisely why the bucketed form
    survives a 100x scale-up.

    Returns per purchase: n_views in window and seconds since the
    most recent one (NULL when none — left join keeps zero rows).
    """
    ev = _events(spark, sf_dir)
    ts_s = F.col("ts").cast("timestamp").cast("long")
    p = (ev.filter(F.col("event_type") == "purchase")
         .select("event_id", "user_id", ts_s.alias("p_s"),
                 F.floor(ts_s / window_s).alias("bin")))
    v = (ev.filter(F.col("event_type") == "view")
         .select("user_id", ts_s.alias("v_s"),
                 F.explode(F.array(
                     F.floor(ts_s / window_s),
                     F.floor(ts_s / window_s) + 1)).alias("bin")))
    hits = (p.join(v, ["user_id", "bin"])
            .filter((F.col("v_s") >= F.col("p_s") - window_s)
                    & (F.col("v_s") < F.col("p_s")))
            .groupBy("event_id")
            .agg(F.count("*").alias("n_views"),
                 F.max("v_s").alias("last_v")))
    return (p.select("event_id", "user_id", "p_s").join(hits, "event_id", "left")
            .select("event_id", "user_id",
                    F.coalesce("n_views", F.lit(0)).cast("bigint")
                    .alias("n_views_30m"),
                    (F.col("p_s") - F.col("last_v")).cast("bigint")
                    .alias("last_view_gap_s"))
            .orderBy("event_id"))


RANGE_JOIN_SQL = f"""
WITH p AS (
  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS p_s
  FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS v_s
  FROM events WHERE event_type = 'view'
),
hits AS (
  SELECT p.event_id, COUNT(*) AS n_views, MAX(v.v_s) AS last_v
  FROM p JOIN v ON p.user_id = v.user_id
   AND v.v_s >= p.p_s - {_RANGE_WIN_S} AND v.v_s < p.p_s
  GROUP BY p.event_id
)
SELECT p.event_id, p.user_id,
       CAST(COALESCE(h.n_views, 0) AS BIGINT) AS n_views_30m,
       CAST(p.p_s - h.last_v AS BIGINT) AS last_view_gap_s
FROM p LEFT JOIN hits h USING (event_id)
ORDER BY p.event_id
"""
