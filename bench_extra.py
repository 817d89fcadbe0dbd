"""Side benchmark (bench.py is FROZEN for the driver): times an
arbitrary subset of queries() with the same methodology as bench.py
(noop sink, clearCache between queries), plus optionally the pipeline.

Usage: python bench_extra.py [query ...]   (no args = a default hot set)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_EXTRA_PIPELINE=1
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

DEFAULT = [
    "txt_decontaminate", "dedup_minhash_lsh", "sim_semdedup",
    "kg_naf_export", "dedup_jaccard_prefix", "dedup_cluster_sizes",
    "txt_lang_id", "kg_kcore", "kg_triangles", "txt_novelty",
    "kg_common_neighbors", "txt_fingerprint", "txt_dsir_weights",
    "txt_train_linear_probe", "txt_quality", "sim_ivf_topk",
    "txt_token_counts", "kg_linking_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = sys.argv[1:] or DEFAULT
    from pikes_spark.session import get_spark
    spark = get_spark(app="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    import __spark_entry__ as entry
    timings = {}
    if os.environ.get("BENCH_EXTRA_PIPELINE"):
        from pikes_spark.pipeline import run_pipeline
        base = "/dev/shm" if os.path.isdir("/dev/shm") else None
        out_root = tempfile.mkdtemp(prefix="pikes_bx_", dir=base)
        try:
            t0 = time.time()
            run_pipeline(spark, sf_dir, out_root, resume=False)
            timings["kg_pipeline"] = round(time.time() - t0, 3)
        finally:
            shutil.rmtree(out_root, ignore_errors=True)
    qs = entry.queries()
    for name in names:
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
    spark.stop()
    print(json.dumps({"queries": timings, "sf_dir": sf_dir, "cpus": cpus}))


if __name__ == "__main__":
    main()
