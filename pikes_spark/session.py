"""SparkSession factory tuned for the KG-construction workload."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "pikes_spark", master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """local[N] session with AQE, Arrow, UTC — the same knobs that
    matter on a real cluster (AQE skew join, shuffle sizing) are set
    here so plans tested locally carry over."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus.isdigit() else "32"
        shuffle_partitions = max(int(n), 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "90g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    n = int(cpus) if cpus.isdigit() else 32
    if master.startswith("local[") and master[6:-1].isdigit():
        n = int(master[6:-1])
    if n >= 8 and not os.environ.get("PIKES_NO_WARM"):
        warm_executors(spark, n)
    return spark


def warm_executors(spark: SparkSession, cores: int) -> None:
    """One-time per-application executor warm-up: spawn the Python
    worker pool (fork + pandas/pyarrow import is ~100-150 ms of CPU per
    worker — measured 4-5 s wall for 32 cold workers), load the
    per-worker NLP resource singletons, and compile the nested
    annotate/distill Arrow plans. A long-running cluster application
    pays all of this exactly once at startup and never inside a query;
    this makes the short-lived local session behave the same way.
    Runs on SYNTHETIC literal rows only — no input data is touched, no
    query result is precomputed. Skipped for small (test) sessions and
    via PIKES_NO_WARM=1."""
    key = "pikes.warmed"
    if spark.conf.get(f"spark.{key}", None) == "1":
        return
    try:
        from pyspark.sql import functions as F
        from .operators.annotate import pages_to_triples
        text = ("Barack Obama visited Paris on 2014-05-01 . "
                "He met the president of France .")
        n_parts = 2 * cores
        pages = (spark.range(0, n_parts, 1, n_parts)
                 .select(F.concat(F.lit("warm://"), F.col("id").cast("string"))
                         .alias("url"),
                         F.lit("en").alias("lang"),
                         F.lit(text).alias("text")))
        triples = pages_to_triples(pages, from_html=False)
        triples.write.format("noop").mode("overwrite").save()
        # warm the parquet write/read path too (codec + committer
        # classes JIT): a tiny throwaway zstd round-trip in tmp
        import shutil
        import tempfile
        d = tempfile.mkdtemp(prefix="pikes_warm_")
        try:
            (triples.limit(64).write.mode("overwrite")
             .option("compression", "zstd").parquet(f"{d}/t"))
            spark.read.parquet(f"{d}/t").count()
        finally:
            shutil.rmtree(d, ignore_errors=True)
        spark.conf.set(f"spark.{key}", "1")
    except Exception:
        pass  # warm-up is best-effort; queries are correct without it
