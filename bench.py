"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

metric: end-to-end KG pipeline throughput (triples emitted / second)
plus per-query wall times for the other operator families. Set
BENCH_SCALING=1 to also run the pipeline at two parallelism levels
(local[N/4] vs local[N]) and report scaling efficiency (the
sandbox stand-in for N->4N executors; see BENCH.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _run_queries(spark, sf_dir: str) -> dict:
    import __spark_entry__ as entry
    from pikes_spark.pipeline import run_pipeline

    timings: dict = {}
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out_root = tempfile.mkdtemp(prefix="pikes_bench_", dir=base)
    try:
        t0 = time.time()
        result = run_pipeline(spark, sf_dir, out_root, resume=False)
        timings["kg_pipeline"] = round(time.time() - t0, 3)
        n_triples = result["added_triples"]
    finally:
        shutil.rmtree(out_root, ignore_errors=True)

    qs = entry.queries()
    bench_queries = [
        "txt_token_counts", "txt_lang_id", "txt_quality", "txt_fingerprint",
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
        "dedup_embedding_cosine", "sim_brute_force_topk", "sim_ivf_topk",
        "rel_filter_agg", "rel_join_window_topk",
        # r4-cont additions: SPARQL layer, iterative BFS, training-data ops
        "kg_sparql_rel", "kg_sparql_construct", "kg_bfs_reach",
        "txt_top_terms", "txt_train_test_split", "txt_redact_pii",
        "kg_sparql_path_seq", "kg_triangles", "txt_repetition",
        "kg_sparql_subquery",
        # r4 session-3 additions: corpus filtering, decontamination,
        # retrieval, span dedup
        "web_corpus_filter", "txt_decontaminate", "txt_bm25_topk",
        "dedup_repeated_spans", "kg_sparql_describe",
        # r4 session-4 additions: k-NN graph, link prediction, CDC
        "sim_knn_graph", "kg_common_neighbors", "kg_snapshot_diff",
        # r4 session-5 additions: hyperlink extraction -> host graph
        # -> anchor EL priors -> host PageRank
        "web_page_links", "web_host_graph", "web_anchor_priors",
        "web_host_pagerank", "warc_read_pages", "txt_vocab", "txt_encode",
        # r4 session-6 additions: prefix-filter exact similarity join,
        # Bloom semi-join, bigram LM surprisal, BPE train+encode
        "dedup_jaccard_prefix", "rel_bloom_semi_join",
        "txt_bigram_surprisal", "txt_bpe_merges", "txt_bpe_encode_stats",
        # r4 session-7 additions: SNM blocking, DSIR weights, k-core,
        # walk corpus, GD-trained probe, hybrid RRF, mixture recipe,
        # compression signal, bucketed join, SHACL, char-sets
        "dedup_snm_pairs", "txt_dsir_weights", "kg_kcore",
        "kg_walk_corpus", "txt_train_linear_probe", "sim_hybrid_rrf",
        "txt_domain_mix", "txt_compression_digest", "tbl_bucketed_join",
        "kg_shacl_report", "kg_char_sets", "evt_scd2_history",
        "dedup_incremental", "sim_kmeans_codebook", "evt_json_props",
        "rel_q5_local_supplier", "rel_rollup_revenue",
        # r4 session-8 additions: RDFS/OWL entailment, HITS, LPA,
        # co-occurrence PMI, curation funnel, partition-pruned layout,
        # co-visitation, trending
        "kg_rdfs_entail", "kg_owl_entail", "kg_hits", "kg_label_prop",
        "txt_cooc_pmi", "txt_curation_funnel", "txt_percentile_filter",
        "tbl_partition_prune", "evt_covisitation", "evt_trending",
        "evt_item_transitions", "txt_novelty", "txt_phrase_search",
        "tbl_write_audit_publish", "mm_phash_pairs", "mm_audio_fp_pairs",
        "sim_knn_classify", "txt_hll_by_lang", "kg_sparql_graph",
        "tbl_snapshot_history", "dedup_cluster_sizes",
        # r5 additions: lexicon sentiment (F19 sf-scaled face),
        # NAF XML debug export
        "txt_sentiment", "kg_naf_export",
        # r5 session-2 additions: RAG chunking, bucketed interval
        # range join, SemDeDup within-cluster semantic drop
        "txt_chunks", "evt_range_join", "sim_semdedup",
    ]
    for name in bench_queries:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()  # per-query caches don't leak memory forward
    return {"timings": timings, "n_triples": n_triples}


def _pipeline_wall(master: str, sf_dir: str, shuffle: int,
                   replicate: int = 1) -> tuple:
    """Run the KG pipeline on a fresh session with the given master;
    return (wall_seconds, triples)."""
    from pikes_spark.session import get_spark
    from pikes_spark.pipeline import run_pipeline

    # Snapshot tables AND shuffle dirs on the ramdisk for the scaling
    # measurement: on a real cluster both scale with the node count
    # (per-executor local disks / object store); the sandbox's single
    # shared 450 MB/s disk would otherwise bound every parallelism level
    # to the same I/O ceiling (measured: 8 vs 32 cores within 5%).
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    shuffle_dir = tempfile.mkdtemp(prefix="pikes_shuffle_", dir=base)
    spark = get_spark(app=f"bench_{master}", master=master,
                      shuffle_partitions=shuffle,
                      extra_conf={"spark.local.dir": shuffle_dir})
    out_root = tempfile.mkdtemp(prefix="pikes_scale_", dir=base)
    warm_root = tempfile.mkdtemp(prefix="pikes_warm_", dir=base)
    try:
        # steady-state hygiene: a tiny end-to-end pass first so JVM JIT,
        # codegen and Python workers are warm — a real 100 TB run
        # amortizes this one-time cost to zero, and including it in a
        # 1-3 minute sandbox wall would understate scaling for BOTH
        # levels asymmetrically (fewer cores = longer amortization)
        warm_sf = sf_dir.replace("sf0.1", "sf0.001")
        if not os.path.isdir(warm_sf):
            warm_sf = sf_dir
        run_pipeline(spark, warm_sf, warm_root, resume=False)
        t0 = time.time()
        result = run_pipeline(spark, sf_dir, out_root, resume=False,
                              replicate=replicate)
        wall = time.time() - t0
        return wall, result["added_triples"]
    finally:
        spark.stop()
        shutil.rmtree(out_root, ignore_errors=True)
        shutil.rmtree(warm_root, ignore_errors=True)
        shutil.rmtree(shuffle_dir, ignore_errors=True)


def _compute_wall(master: str, sf_dir: str, shuffle: int,
                  replicate: int = 1) -> tuple:
    """Compute-only variant: pages -> annotate -> distill -> noop sink,
    no materialization. Isolates the distributed compute that dominates
    at real corpus scale from single-node commit/write overheads."""
    import tempfile as _tf
    from pikes_spark.session import get_spark
    from pikes_spark.sources.pages import pages_from_documents
    from pikes_spark.operators.annotate import pages_to_triples
    from pyspark.sql import functions as F

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    shuffle_dir = _tf.mkdtemp(prefix="pikes_shuffle_", dir=base)
    spark = get_spark(app=f"bench_c_{master}", master=master,
                      shuffle_partitions=shuffle,
                      extra_conf={"spark.local.dir": shuffle_dir})
    try:
        pages = pages_from_documents(spark, sf_dir)
        if replicate > 1:
            copies = spark.range(replicate).select(F.col("id").alias("_copy"))
            pages = (pages.crossJoin(F.broadcast(copies))
                     .withColumn("url", F.concat("url", F.lit("?copy="),
                                                 F.col("_copy").cast("string")))
                     .drop("_copy"))
        pages = pages.repartition(2 * max(spark.sparkContext.defaultParallelism, 8), "url")
        # warm up JVM/codegen/python workers with a tiny prefix so the
        # measured wall is steady-state compute
        pages_to_triples(pages.limit(64)).count()
        t0 = time.time()
        df = pages_to_triples(pages)
        n = df.count()
        return time.time() - t0, n
    finally:
        spark.stop()
        shutil.rmtree(shuffle_dir, ignore_errors=True)


def _burn(_):
    s = 0
    for i in range(10**7):
        s += i * i
    return s


def _host_effective_cores(n: int) -> float:
    """Calibration probe: time one CPU-bound task alone, then n in
    parallel processes; the ratio is the parallelism the (shared,
    co-tenant-throttled) host actually delivers right now. Recorded in
    the bench JSON so a wall-clock number can be read against the
    host's health in that measurement window — the same 32-thread job
    has measured a 6.6x spread across windows on this box (BENCH.md)."""
    import multiprocessing as mp

    t0 = time.time()
    _burn(0)
    one = time.time() - t0
    with mp.Pool(n) as pool:
        t0 = time.time()
        pool.map(_burn, range(n))
        par = time.time() - t0
    return round(n * one / par, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    eff_cores = _host_effective_cores(cpus)

    scaling = {}
    if os.environ.get("BENCH_SCALING"):
        # same job, two parallelism levels: N/4 then N cores. The input is
        # deterministically replicated so compute dominates fixed overheads
        # (Spark scheduling, snapshot commits) — the sandbox stand-in for a
        # long-running N vs 4N-executor cluster job.
        replicate = int(os.environ.get("BENCH_REPLICATE", "6"))
        lo = max(cpus // 4, 1)
        wall_lo, n_lo = _pipeline_wall(f"local[{lo}]", sf_dir, max(lo, 8),
                                       replicate)
        wall_hi, n_hi = _pipeline_wall(f"local[{cpus}]", sf_dir, max(cpus, 8),
                                       replicate)
        tput_lo, tput_hi = n_lo / wall_lo, n_hi / wall_hi
        scaling = {
            "cores_lo": lo, "cores_hi": cpus, "replicate": replicate,
            "wall_lo_s": round(wall_lo, 2), "wall_hi_s": round(wall_hi, 2),
            "triples_per_s_lo": round(tput_lo, 1),
            "triples_per_s_hi": round(tput_hi, 1),
            "scaling_efficiency": round((tput_hi / tput_lo) / (cpus / lo), 3),
        }

    from pikes_spark.session import get_spark
    spark = get_spark(app="bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    t_all = time.time()
    res = _run_queries(spark, sf_dir)
    total = round(time.time() - t_all, 3)
    spark.stop()

    kg_wall = res["timings"]["kg_pipeline"]
    # Per-query timings on their OWN line first: the sweep is ~85 queries
    # and the dict outgrew the driver's stdout-tail capture in r4
    # (BENCH_r04.json parsed:null). The headline line below is short and
    # printed LAST so a tail capture always parses it.
    print(json.dumps({"queries": res["timings"]}), flush=True)
    headline = [
        "kg_pipeline", "txt_token_counts", "dedup_exact", "dedup_minhash_lsh",
        "sim_ivf_topk", "rel_filter_agg", "kg_sparql_rel", "kg_triangles",
        "txt_bm25_topk", "warc_read_pages",
    ]
    out = {
        "metric": "kg_pipeline_triples_per_sec",
        "value": round(res["n_triples"] / kg_wall, 1),
        "unit": "triples/sec",
        "sf": sf,
        "n_triples": res["n_triples"],
        "kg_pipeline_seconds": kg_wall,
        "queries": {k: res["timings"][k] for k in headline
                    if k in res["timings"]},
        "n_queries": len(res["timings"]),
        "total_seconds": total,
        # host-health calibration for this measurement window: how many
        # of the nominal cores the shared host actually delivered
        "host_effective_cores": eff_cores,
        "host_nominal_cores": cpus,
    }
    if scaling:
        out["scaling"] = scaling
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
