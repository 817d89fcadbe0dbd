"""spark-submit entry point for the KG construction job.

Cluster deployment (the north-rule launch shape):

    cd /root/repo && zip -r /tmp/pikes_spark.zip pikes_spark
    spark-submit --master <cluster> \
        --py-files /tmp/pikes_spark.zip \
        scripts/submit_job.py --sf-dir <input> --out <table-root> \
        [--resume] [--replicate N] [--cc-max-iter K]

The script builds no SparkSession configuration beyond sane analytics
defaults (AQE, UTC, Arrow) — executor counts/memory come from
spark-submit, so the same artifact runs at N and 4N executors
unchanged. Prints the commit manifest as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", required=True,
                    help="input directory with documents.parquet")
    ap.add_argument("--out", required=True, help="triple-table root")
    ap.add_argument("--resume", action="store_true",
                    help="skip urls already committed (default: off)")
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--cc-max-iter", type=int, default=8)
    ap.add_argument("--shuffle-partitions", type=int, default=None,
                    help="override spark.sql.shuffle.partitions")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    builder = (SparkSession.builder.appName("pikes-spark-kg")
               .config("spark.sql.adaptive.enabled", "true")
               .config("spark.sql.adaptive.skewJoin.enabled", "true")
               .config("spark.sql.session.timeZone", "UTC")
               .config("spark.sql.execution.arrow.pyspark.enabled", "true"))
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions",
                                 str(args.shuffle_partitions))
    spark = builder.getOrCreate()

    from pikes_spark.pipeline import run_pipeline

    result = run_pipeline(spark, args.sf_dir, args.out,
                          resume=args.resume, replicate=args.replicate,
                          cc_max_iter=args.cc_max_iter)
    out = {k: result[k] for k in
           ("wall_seconds", "added_triples", "triples_per_second", "timings")}
    out["snapshot_id"] = result["triples_snapshot"]["snapshot_id"]
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
