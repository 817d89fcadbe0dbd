"""Events sessionization/window ops + streaming pipeline smoke."""

import shutil
import tempfile

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_sessionize_deterministic(spark):
    from pikes_spark.operators.events import sessionize
    rows = sessionize(spark, SF).collect()
    assert rows
    # session numbering starts at 1 and is dense per user
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r["sess_no"])
    for u, sess in by_user.items():
        assert sess == list(range(1, len(sess) + 1))


def test_streaming_pages_to_triples(spark):
    from pikes_spark.sources.pages import pages_from_documents
    from pikes_spark.streaming.stream_pages import stream_pages_to_triples
    from pikes_spark.sources.tables import SnapshotTable

    tmp = tempfile.mkdtemp(prefix="pikes_stream_")
    try:
        landing = f"{tmp}/landing"
        pages_from_documents(spark, SF).limit(30).write.parquet(landing)
        q = stream_pages_to_triples(spark, landing, f"{tmp}/out",
                                    f"{tmp}/ckpt", trigger_once=True)
        q.awaitTermination(300)
        table = SnapshotTable(f"{tmp}/out/triples_stream", name="triples_stream")
        df = table.read(spark)
        assert df is not None and df.count() > 0
        snap = table.latest_snapshot()
        assert snap["lineage"]["mode"] == "streaming"
        # restart with no new files: no new snapshot data
        q2 = stream_pages_to_triples(spark, landing, f"{tmp}/out",
                                     f"{tmp}/ckpt", trigger_once=True)
        q2.awaitTermination(300)
        snap2 = SnapshotTable(f"{tmp}/out/triples_stream",
                              name="triples_stream").latest_snapshot()
        assert snap2["total_rows"] == snap["total_rows"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stateful_streaming_sessionize_matches_batch(spark):
    """applyInPandasWithState sessionizer == batch sessionize on the
    same events: run the stream twice (availableNow) — the second run
    sees only a far-future sentinel whose watermark fires the
    event-time timeouts that close the remaining open sessions."""
    import datetime
    from pikes_spark.operators.events import sessionize
    from pikes_spark.streaming.stateful import streaming_sessionize

    tmp = tempfile.mkdtemp(prefix="pikes_state_")
    try:
        ev = (spark.read.parquet(f"{SF}/events.parquet")
              .filter(F.col("user_id") < 5)
              .select("event_id", "ts", "user_id", "value"))
        ev.write.parquet(f"{tmp}/landing")
        # batch expectation over the SAME subset
        ev_dir = f"{tmp}/batch"
        ev.write.parquet(f"{ev_dir}/events.parquet")
        expected = {(r["user_id"], r["sess_no"], r["n_events"],
                     r["sum_value_fl"], r["sess_start"])
                    for r in sessionize(spark, ev_dir).collect()}

        schema = "event_id bigint, ts timestamp, user_id bigint, value double"

        def run_once():
            stream = spark.readStream.schema(schema).parquet(f"{tmp}/landing")
            q = (streaming_sessionize(stream).writeStream
                 .format("parquet").outputMode("append")
                 .option("path", f"{tmp}/out")
                 .option("checkpointLocation", f"{tmp}/ckpt")
                 .trigger(availableNow=True).start())
            q.awaitTermination(300)

        run_once()
        # sentinel advances the watermark past every open session's gap
        spark.createDataFrame(
            [(999999, datetime.datetime(2030, 1, 1), -1, 0.0)], schema
        ).write.mode("append").parquet(f"{tmp}/landing")
        run_once()

        got = {(r["user_id"], r["sess_no"], r["n_events"],
                r["sum_value_fl"], r["sess_start"])
               for r in spark.read.parquet(f"{tmp}/out").collect()
               if r["user_id"] >= 0}
        assert got == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_stream_dedup_first_arrival_wins(spark, tmp_path):
    """Within-batch: min doc_id wins. Cross-batch: ARRIVAL order wins
    even when the later duplicate has a smaller id (the committed set
    is immutable). Replays cannot double-commit."""
    from pikes_spark.sources.tables import SnapshotTable
    from pikes_spark.streaming.stream_dedup import stream_dedup_exact

    landing = str(tmp_path / "landing")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    ddl = "doc_id bigint, text string, lang string"
    b1 = spark.createDataFrame(
        [(10, "alpha beta", "en"), (20, "alpha beta", "en"),   # in-batch dup
         (30, "gamma", "en")], ddl)
    b1.write.parquet(landing)
    stream_dedup_exact(spark, landing, out, ckpt).awaitTermination(300)
    b2 = spark.createDataFrame(
        [(5, "gamma", "en"),          # smaller id, but arrives later -> dropped
         (40, "delta", "en")], ddl)
    b2.write.mode("append").parquet(landing)
    stream_dedup_exact(spark, landing, out, ckpt).awaitTermination(300)
    table = SnapshotTable(f"{out}/unique_docs", name="unique_docs")
    got = sorted(r.doc_id for r in table.read(spark).collect())
    assert got == [10, 30, 40]
    # replay with same checkpoint: no new epochs, table unchanged
    stream_dedup_exact(spark, landing, out, ckpt).awaitTermination(300)
    assert sorted(r.doc_id for r in table.read(spark).collect()) == [10, 30, 40]


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Stream-stream watermarked INNER join through a real availableNow
    run == the batch time-range join, row for row."""
    import duckdb
    from pikes_spark.streaming.stream_join import (
        run_view_click_join, VIEW_CLICK_JOIN_SQL)
    run_view_click_join(spark, SF, str(tmp_path / "landing"),
                        str(tmp_path / "out"), str(tmp_path / "ckpt"))
    got = sorted(tuple(r) for r in spark.read.parquet(str(tmp_path / "out"))
                 .select("user_id", "view_id", "click_id", "gap_us")
                 .collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    want = sorted(tuple(r) for r in con.sql(VIEW_CLICK_JOIN_SQL).fetchall())
    assert got == want
    assert got  # non-degenerate


def test_dedup_within_watermark_suppresses_redelivery(spark, tmp_path):
    """Twice-delivered events collapse to exactly the batch distinct
    set through dropDuplicatesWithinWatermark."""
    import duckdb
    from pikes_spark.streaming.stream_dedup import (
        stream_dedup_within_watermark)
    stream_dedup_within_watermark(
        spark, SF, str(tmp_path / "landing"), str(tmp_path / "out"),
        str(tmp_path / "ckpt"))
    got = sorted(tuple(r) for r in spark.read
                 .parquet(str(tmp_path / "out"))
                 .select("event_id", "user_id", "event_type").collect())
    want = sorted(map(tuple, duckdb.sql(
        f"SELECT DISTINCT event_id, user_id, event_type "
        f"FROM '{SF}/events.parquet'").fetchall()))
    assert got == want


def test_streaming_windowed_counts_match_batch(spark):
    """Watermarked tumbling-window agg through the sentinel-flush
    protocol == the batch windowed aggregation, value for value."""
    import __spark_entry__ as e
    got = [tuple(r) for r in
           e.queries()["stream_windowed_counts"](spark, SF).collect()]
    want = [tuple(r) for r in
            e.queries()["evt_windowed_counts"](spark, SF).collect()]
    assert got == want and got
