"""Structured-Streaming ingestion of the pages table.

The reference is pure batch (SURVEY.md §2.6: no streaming semantics);
resume there is file-level skip-done. For a continuously-crawled
corpus the idiomatic Spark shape is ``readStream`` over the landing
directory + ``foreachBatch`` running the SAME batch operators per
micro-batch, committing each batch to the snapshot table — exactly-once
via the streaming checkpoint + idempotent snapshot append.

This reuses every batch operator unchanged: foreachBatch hands us a
batch DataFrame, so annotate/link/distill/canonicalize compose as-is.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..operators.annotate import annotate_pages, distill_annotations
from ..operators.linking import candidates_df, link_entities
from ..sources.tables import SnapshotTable

PAGES_DDL = ("url string, warc_ts timestamp, html binary, "
             "text string, lang string")


def stream_pages_to_triples(spark: SparkSession, landing_dir: str,
                            out_root: str, checkpoint_dir: str,
                            trigger_once: bool = True):
    """readStream(landing parquet) -> per-batch KG extraction ->
    snapshot-committed triples. Returns the StreamingQuery."""
    table = SnapshotTable(f"{out_root}/triples_stream",
                          ["subject", "predicate", "object"],
                          name="triples_stream")
    cands = candidates_df(spark)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # foreachBatch is at-least-once: a micro-batch replayed after a
        # crash between append and checkpoint commit would double-append.
        # The epoch id is stable across replays, so an epoch already in
        # a committed manifest is skipped -> exactly-once appends.
        if table.has_lineage("epoch", epoch_id):
            return
        ann = annotate_pages(batch_df)
        links = link_entities(ann, cands)
        triples = distill_annotations(ann, links)
        table.append(triples, spark, lineage={"epoch": epoch_id,
                                              "mode": "streaming"})

    stream = (spark.readStream.schema(PAGES_DDL).parquet(landing_dir))
    writer = (stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
