"""End-to-end KG construction job (the two-job DAG of SURVEY.md §7,
mirroring the reference's annotate-then-distill shape, EP2):

    pages --J1 annotate--> annotations --J2 link--+
                                                  |--J3 distill--> triples_raw
    triples_raw --J4 canonicalize--> triples (spo) + triples_pos (pos)
                                     + lineage manifests  [resumable]

Resume: the triples table's manifests record committed urls; a new run
anti-joins pages against them (skip-done, FolderOrchestrator.java:166-176)
so killed runs continue from the last committed snapshot with no
duplicate or lost triples.

Metrics: ``observe()`` counters per stage end up in the lineage
manifest (the reference's Tracker equivalent, RDFGenerator.java:349-432).
"""

from __future__ import annotations

import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.annotate import annotate_pages, distill_annotations
from .operators.canonicalize import canonicalize_triples
from .operators.linking import candidates_df, link_entities
from .sources.pages import pages_from_documents
from .sources.tables import SnapshotTable


def raw_table_for(out_root: str) -> SnapshotTable:
    return SnapshotTable(f"{out_root}/triples_raw", name="triples_raw")


def run_pipeline(spark: SparkSession, sf_dir: str, out_root: str,
                 resume: bool = True, cc_max_iter: int = 8,
                 include_gold: bool = True, replicate: int = 1) -> dict:
    """Run the full job; returns the lineage manifest of the commit.

    ``replicate`` deterministically fans the input out k-fold (urls
    suffixed ?copy=i) — used by the scaling bench to make compute
    dominate fixed overheads at sandbox scale."""
    t0 = time.time()
    timings: dict = {}

    def mark(name: str) -> None:
        timings[name] = round(time.time() - t0 - sum(timings.values()), 2)

    spo = SnapshotTable(f"{out_root}/triples", ["subject", "predicate", "object"],
                        name="triples")
    pos = SnapshotTable(f"{out_root}/triples_pos", ["predicate", "object", "subject"],
                        name="triples_pos")

    pages = pages_from_documents(spark, sf_dir, include_gold=include_gold)
    if replicate > 1:
        copies = spark.range(replicate).select(F.col("id").alias("_copy"))
        pages = (pages.crossJoin(F.broadcast(copies))
                 .withColumn("url", F.concat("url", F.lit("?copy="),
                                             F.col("_copy").cast("string")))
                 .drop("_copy"))

    skipped = 0
    if resume:
        # skip-done is keyed on the ACCUMULATING raw-triples table (the
        # source of truth); spo/pos are derived global views (below)
        done = raw_table_for(out_root).committed_urls(spark)
        if done is not None:
            before = pages.count()
            pages = pages.join(done, "url", "left_anti")
            skipped = before - pages.count()
            # rebalance only after the anti-join skewed the partitions;
            # a fresh run keeps the source's 2x-parallelism round-robin
            # split — repartitioning again here moved every html payload
            # through a SECOND exchange for no balance gain. NOTE:
            # range-partitioning on length(text) was tried and is WORSE
            # (lengths cluster, ranges skew); hash on the unique key
            # distributes evenly.
            pages = pages.repartition(
                2 * max(spark.sparkContext.defaultParallelism, 8), "url")

    # J1 materializes annotations (the inter-job IR — the reference's NAF
    # files, EP2): linking and distillation both read the materialized
    # table instead of re-running the NLP UDF, and a killed run resumes
    # from here.
    ann_table = SnapshotTable(f"{out_root}/annotations", name="annotations")
    ann_manifest = ann_table.append(annotate_pages(pages), spark,
                                    lineage={"sf_dir": sf_dir, "stage": "J1 annotate"})
    ann = spark.read.parquet(ann_manifest["data_dirs"][-1])
    mark("j1_annotate")

    links = link_entities(ann, candidates_df(spark))

    # J3 materializes raw triples before canonicalization — J4 scans the
    # triple table several times (edge build, CC, rewrite); without this
    # the distill UDF would re-run once per scan.
    raw_table = raw_table_for(out_root)
    raw_manifest = raw_table.append(
        distill_annotations(ann, links), spark,
        lineage={"from_snapshot": ann_manifest["snapshot_id"], "stage": "J3 distill"})
    mark("j3_distill")

    # J4 canonicalization is CORPUS-GLOBAL (the reference's smushing runs
    # over the whole graph): the component map is computed over the union
    # of all committed raw snapshots + this run's, and spo/pos are
    # REBUILT (overwrite snapshots) — a resume can therefore merge
    # sameAs components spanning old and new documents, and a crash
    # between the spo and pos writes cannot leave them divergent (both
    # are derived from triples_raw on the next run). Cost: the rewrite
    # scans all raw triples per run — the same cost profile as the
    # reference's global smushing pass.
    triples_raw = spark.read.parquet(*raw_manifest["data_dirs"])
    triples = canonicalize_triples(triples_raw, max_iter=cc_max_iter)
    mark("j4_cc_plan")

    lineage = {
        "sf_dir": sf_dir,
        "skipped_done_urls": skipped,
        "from_raw_snapshot": raw_manifest["snapshot_id"],
        "stage": "pages->annotate->link->distill->canonicalize",
    }
    # ONE compute pass feeds BOTH layouts: the canonical triples are
    # materialized once (a parquet read-back between the writes scanned
    # as ~2 fat tasks and serialized the pos sort — measured 3x the spo
    # write's wall), then the two sorted writes run as CONCURRENT jobs
    # over the shared cache — the sorts are independent, so the
    # scheduler overlaps the pos sort with the spo commit tail instead
    # of serializing the two (the J5 scaling bottleneck; on a real
    # cluster these are two independent sort+commit jobs per snapshot).
    from concurrent.futures import ThreadPoolExecutor

    triples = triples.persist()
    triples.count()  # materialize the cache exactly once
    mark("j4_materialize")
    with ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(spo.overwrite, triples, spark, lineage)
        f2 = pool.submit(pos.overwrite, triples, spark,
                         {"derived_from": "triples"})
        m1, m2 = f1.result(), f2.result()
    mark("j5_sorted_writes")
    triples.unpersist()
    wall = time.time() - t0
    return {
        "triples_snapshot": m1, "pos_snapshot": m2,
        "timings": timings,
        "wall_seconds": round(wall, 2),
        "added_triples": m1["added_rows"],
        "triples_per_second": round(m1["added_rows"] / wall, 1) if wall else 0.0,
    }
