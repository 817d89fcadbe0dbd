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
