"""Streaming exact deduplication of a continuously-arriving corpus.

Batch exact dedup (operators/dedup.exact_duplicates) groups the whole
table at once; a crawler's landing directory instead drains in
micro-batches, and a duplicate may arrive epochs after its original.
The streaming form keeps the seen-set as a committed snapshot table of
(norm-hash, representative doc_id) and processes each micro-batch as:

  1. within-batch dedup: min doc_id per normalized-text hash;
  2. anti-join against the committed seen-set (cross-epoch dedup);
  3. append the surviving representatives to the seen-set, lineage-
     keyed by epoch id so a replayed batch cannot double-commit
     (the stream_pages exactly-once pattern).

"First occurrence wins" is made deterministic as MIN doc_id within a
batch; across batches, arrival order wins (the committed set is
immutable). The seen-set table carries only 16-byte hash keys + ids —
at 10^12 documents that is a few TB of parquet, joinable by hash key
with ordinary shuffle joins, not driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.tables import SnapshotTable

DOCS_DDL = "doc_id bigint, text string, lang string"


def _normed(df: DataFrame) -> DataFrame:
    # same normalization as dedup.EXACT_DUP_SQL
    return df.select(
        "doc_id",
        F.xxhash64(F.regexp_replace(F.trim(F.lower("text")),
                                    r"\s+", " ")).alias("h"))


def stream_dedup_exact(spark: SparkSession, landing_dir: str,
                       out_root: str, checkpoint_dir: str):
    """readStream(landing parquet of documents) -> committed unique-set
    snapshot table at {out_root}/unique_docs. Returns StreamingQuery."""
    table = SnapshotTable(f"{out_root}/unique_docs", ["h"],
                          name="unique_docs")

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if table.has_lineage("epoch", epoch_id):
            return
        normed = _normed(batch_df)
        in_batch = (normed.groupBy("h")
                    .agg(F.min("doc_id").alias("doc_id"),
                         F.count("*").alias("n_batch_dups")))
        seen = table.read(spark)
        fresh = (in_batch.join(seen.select("h"), "h", "left_anti")
                 if seen is not None else in_batch)
        table.append(fresh, spark,
                     lineage={"epoch": epoch_id, "mode": "stream_dedup"})

    stream = spark.readStream.schema(DOCS_DDL).parquet(landing_dir)
    return (stream.writeStream
            .foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str,
                                  landing: str, out: str,
                                  ckpt: str) -> None:
    """Streaming duplicate-event suppression via Spark's native
    ``dropDuplicatesWithinWatermark`` — the ingestion-side
    exactly-once-per-key guard (at-least-once sources redeliver; the
    dedup state is GC'd once the watermark passes, so state is
    bounded by the redelivery horizon, not the stream's history —
    the property that makes keyed dedup viable on an unbounded
    stream).

    The landing dir receives the events table TWICE (byte-identical
    redelivery); the committed output must equal the batch DISTINCT.

    Single-batch assumption: equality with the batch oracle holds
    because the availableNow pass reads the whole landing dir in ONE
    micro-batch (no maxFilesPerTrigger/maxBytesPerTrigger is set, so
    the file source takes everything available). If it were split, a
    redelivered row arriving after the watermark advanced past its ts
    would be dropped as late — correct streaming semantics, but not
    the batch DISTINCT.
    """
    schema = ("event_id bigint, ts timestamp, user_id bigint, "
              "event_type string")
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .select("event_id", "ts", "user_id", "event_type"))
    ev.write.parquet(landing)
    ev.write.mode("append").parquet(landing)
    stream = spark.readStream.schema(schema).parquet(landing)
    q = (stream.withWatermark("ts", "10 minutes")
         .dropDuplicatesWithinWatermark(["event_id"])
         .writeStream.format("parquet").outputMode("append")
         .option("path", out).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(600)


DEDUP_WITHIN_WM_SQL = """
SELECT DISTINCT event_id, user_id, event_type
FROM events ORDER BY event_id
"""
