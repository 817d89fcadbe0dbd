"""MERGE upsert + snapshot-diff CDC over the snapshot tables.

The reference materializes its graph into committed snapshot tables
and resumes from the last commit (FolderOrchestrator.java:166-176,
RDFGenerator.java:372-393); a production KG additionally needs the two
table-maintenance verbs this module adds on the same machinery:

- ``SnapshotTable.merge`` (sources/tables.py): Iceberg `MERGE INTO`
  semantics — matched rows replaced, unmatched inserted, one atomic
  overwrite commit, lineage carrying matched/inserted counts;
- ``snapshot_diff``: change-data capture between two committed
  snapshots (the incremental-consumer view: which keys appeared,
  disappeared, or changed between commit A and commit B).

Driver queries run the real machinery end-to-end on the ``customer`` /
``orders`` tables (a read-modify-write balance rollup), so the DuckDB
oracle can state the expected result as plain relational SQL while the
Spark side exercises commit, time travel, merge, and diff.

Scale shape: the diff is one full-outer join keyed on the merge keys —
the same key the table sorts by, so an Iceberg backend prunes it to
per-partition zone ranges; fixed-point integer balances (floor x100)
keep the values bit-identical cross-engine.
"""

from __future__ import annotations

import tempfile
from typing import List

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.tables import SnapshotTable


def snapshot_diff(tbl: SnapshotTable, spark: SparkSession,
                  seq_a: int, seq_b: int, keys: List[str]) -> DataFrame:
    """CDC between committed snapshots: one row per key whose row set
    changed from snapshot ``seq_a`` to ``seq_b``, labeled
    insert / delete / update, with before/after images."""
    a = tbl.read(spark, sequence=seq_a)
    b = tbl.read(spark, sequence=seq_b)
    val_cols = [c for c in a.columns if c not in keys]
    av = a.select(*keys, *[F.col(c).alias(f"_a_{c}") for c in val_cols],
                  F.lit(1).alias("_in_a"))
    bv = b.select(*keys, *[F.col(c).alias(f"_b_{c}") for c in val_cols],
                  F.lit(1).alias("_in_b"))
    j = av.join(bv, keys, "full_outer")
    changed = F.lit(False)
    for c in val_cols:
        changed = changed | ~F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}"))
    change = (F.when(F.col("_in_a").isNull(), F.lit("insert"))
              .when(F.col("_in_b").isNull(), F.lit("delete"))
              .otherwise(F.lit("update")))
    return (j.filter(F.col("_in_a").isNull() | F.col("_in_b").isNull()
                     | changed)
            .select(*keys, change.alias("change"),
                    *[F.col(f"_a_{c}").alias(f"{c}_before") for c in val_cols],
                    *[F.col(f"_b_{c}").alias(f"{c}_after") for c in val_cols]))


# ---------------------------------------------------------------------------
# Driver queries: customer-balance rollup over the real table machinery
# ---------------------------------------------------------------------------

def _cents(col):
    # floor, not round: IEEE multiply + floor is bit-identical across
    # engines; double round() ties differ (HALF_UP vs HALF_EVEN).
    return F.floor(col.cast("double") * 100).cast("bigint")


def _build_customer_table(spark: SparkSession, sf_dir: str) -> SnapshotTable:
    """Snapshot 1: balances (cents) for even-custkey customers.
    Snapshot 2: MERGE of per-customer order totals — existing keys get
    balance += delta, odd-custkey customers with orders insert."""
    root = tempfile.mkdtemp(prefix="pikes_cdc_q_")
    tbl = SnapshotTable(root, sort_cols=["c_custkey"], name="cust_bal")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    base = (cust.filter(F.col("c_custkey") % 2 == 0)
            .select(F.col("c_custkey").cast("bigint").alias("c_custkey"),
                    _cents(F.col("c_acctbal")).alias("bal_c")))
    tbl.append(base, spark, lineage={"op": "base"})

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    deltas = (orders.groupBy(F.col("o_custkey").cast("bigint")
                             .alias("c_custkey"))
              .agg(F.sum(_cents(F.col("o_totalprice"))).alias("delta")))
    cur = tbl.read(spark)
    updates = (deltas.join(cur, "c_custkey", "left")
               .select("c_custkey",
                       (F.coalesce(F.col("bal_c"), F.lit(0))
                        + F.col("delta")).alias("bal_c")))
    tbl.merge(updates, ["c_custkey"], spark)
    return tbl


def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl = _build_customer_table(spark, sf_dir)
    return tbl.read(spark).orderBy("c_custkey")


def snapshot_diff_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl = _build_customer_table(spark, sf_dir)
    out = snapshot_diff(tbl, spark, 0, 1, ["c_custkey"])
    return (out.select("c_custkey", "change",
                       F.coalesce("bal_c_before", F.lit(-1))
                       .alias("bal_before"),
                       F.coalesce("bal_c_after", F.lit(-1))
                       .alias("bal_after"))
            .orderBy("c_custkey"))


_CDC_CTES = """
base AS (
  SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
         CAST(floor(CAST(c_acctbal AS DOUBLE) * 100) AS BIGINT) AS bal_c
  FROM customer WHERE c_custkey % 2 = 0
),
upd AS (
  SELECT CAST(o_custkey AS BIGINT) AS c_custkey,
         CAST(SUM(CAST(floor(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT))
              AS BIGINT) AS delta
  FROM orders GROUP BY 1
),
merged AS (
  SELECT COALESCE(b.c_custkey, u.c_custkey) AS c_custkey,
         COALESCE(b.bal_c, 0) + COALESCE(u.delta, 0) AS bal_c
  FROM base b FULL OUTER JOIN upd u ON b.c_custkey = u.c_custkey
)
"""

MERGE_UPSERT_SQL = f"""
WITH {_CDC_CTES}
SELECT c_custkey, bal_c FROM merged ORDER BY c_custkey
"""

SNAPSHOT_DIFF_SQL = f"""
WITH {_CDC_CTES}
SELECT COALESCE(m.c_custkey, b.c_custkey) AS c_custkey,
       CASE WHEN b.c_custkey IS NULL THEN 'insert'
            WHEN m.c_custkey IS NULL THEN 'delete'
            ELSE 'update' END AS change,
       COALESCE(b.bal_c, -1) AS bal_before,
       COALESCE(m.bal_c, -1) AS bal_after
FROM base b FULL OUTER JOIN merged m ON b.c_custkey = m.c_custkey
WHERE b.c_custkey IS NULL OR m.c_custkey IS NULL OR b.bal_c <> m.bal_c
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# write-audit-publish (WAP)
# ---------------------------------------------------------------------------

def write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Iceberg write-audit-publish pattern on the same snapshot
    machinery: an incoming batch is STAGED as a committed snapshot of
    a staging table (never visible to readers of the published table),
    AUDITED with declarative checks, and only the passing rows are
    PUBLISHED as one atomic commit — the governance verb that
    completes merge/CDC/time-travel/expire/compaction.

    Batch: per-customer balance rollup. Audit rules (each a codegen
    predicate, evaluated in one pass): non-negative balance, known
    market segment. The published table's lineage records staged /
    failed / published counts, so a monitor can alert on audit-failure
    spikes without scanning data.

    Returns the per-segment published rollup plus audit totals under
    segment='__AUDIT__' — all value-checked against plain SQL."""
    stage_root = tempfile.mkdtemp(prefix="pikes_wap_stage_")
    pub_root = tempfile.mkdtemp(prefix="pikes_wap_pub_")
    stage = SnapshotTable(stage_root, sort_cols=["c_custkey"], name="stage")
    pub = SnapshotTable(pub_root, sort_cols=["c_custkey"], name="published")

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    batch = cust.select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        F.col("c_mktsegment").alias("segment"),
        _cents(F.col("c_acctbal")).alias("bal_c"))
    stage.append(batch, spark, lineage={"op": "wap_stage"})

    staged = stage.read(spark)
    ok = ((F.col("bal_c") >= 0)
          & F.col("segment").isin("AUTOMOBILE", "BUILDING", "FURNITURE",
                                  "HOUSEHOLD", "MACHINERY"))
    audited = staged.withColumn("_ok", ok)
    n_staged = staged.count()
    passing = audited.filter("_ok").drop("_ok")
    n_pass = passing.count()
    pub.append(passing, spark,
               lineage={"op": "wap_publish", "staged": n_staged,
                        "published": n_pass,
                        "audit_failed": n_staged - n_pass})

    rollup = (pub.read(spark)
              .groupBy("segment")
              .agg(F.count("*").alias("n"),
                   F.sum("bal_c").alias("bal_c")))
    rows = rollup.collect() + [("__AUDIT__", int(n_staged - n_pass),
                                int(n_staged))]
    import shutil
    shutil.rmtree(stage_root, ignore_errors=True)
    shutil.rmtree(pub_root, ignore_errors=True)
    return (spark.createDataFrame(rows, rollup.schema)
            .orderBy("segment"))


WAP_SQL = """
WITH batch AS (
  SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment AS segment,
         CAST(floor(CAST(c_acctbal AS DOUBLE) * 100) AS BIGINT) AS bal_c
  FROM customer
),
audited AS (
  SELECT *, bal_c >= 0 AND segment IN
         ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')
           AS ok
  FROM batch
)
SELECT segment, COUNT(*) AS n, CAST(SUM(bal_c) AS BIGINT) AS bal_c
FROM audited WHERE ok GROUP BY segment
UNION ALL
SELECT '__AUDIT__',
       CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT),
       COUNT(*)
FROM audited
ORDER BY segment
"""


# ---------------------------------------------------------------------------
# snapshot history (the Iceberg `history`/`snapshots` metadata table)
# ---------------------------------------------------------------------------

def snapshot_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The table-history metadata view over the commit manifests (what
    Iceberg exposes as `SELECT * FROM t.history/t.snapshots`): one row
    per commit with its operation, matched/inserted lineage counts and
    the row-count accounting. Runs the real base-append + MERGE flow
    on the snapshot machinery and reads the manifests back — a pure
    metadata scan, no data files touched.

    All emitted columns are deterministic functions of the input
    tables (wall-clock fields are excluded), so the history
    value-checks against plain relational SQL."""
    tbl = _build_customer_table(spark, sf_dir)
    rows = []
    for seq in range(tbl.latest_snapshot()["sequence"] + 1):
        man = tbl.snapshot(seq)
        lin = man.get("lineage", {})
        rows.append((int(man["sequence"]), str(lin.get("op", "")),
                     int(lin.get("matched", -1)),
                     int(lin.get("inserted", -1)),
                     int(man["added_rows"]), int(man["total_rows"])))
    import shutil
    shutil.rmtree(tbl.root, ignore_errors=True)
    return (spark.createDataFrame(
        rows, "sequence bigint, op string, matched bigint, "
              "inserted bigint, added_rows bigint, total_rows bigint")
        .orderBy("sequence"))


SNAPSHOT_HISTORY_SQL = """
WITH base AS (
  SELECT CAST(c_custkey AS BIGINT) AS c_custkey FROM customer
  WHERE c_custkey % 2 = 0
),
upd AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS c_custkey FROM orders),
stats AS (
  SELECT (SELECT COUNT(*) FROM base) AS n_base,
         (SELECT COUNT(*) FROM upd) AS n_upd,
         (SELECT COUNT(*) FROM base JOIN upd USING (c_custkey)) AS n_matched,
         (SELECT COUNT(*) FROM (SELECT c_custkey FROM base
                                UNION SELECT c_custkey FROM upd)) AS n_merged
)
SELECT CAST(0 AS BIGINT) AS sequence, 'base' AS op,
       CAST(-1 AS BIGINT) AS matched, CAST(-1 AS BIGINT) AS inserted,
       CAST(n_base AS BIGINT) AS added_rows,
       CAST(n_base AS BIGINT) AS total_rows
FROM stats
UNION ALL
SELECT 1, 'merge', CAST(n_matched AS BIGINT),
       CAST(n_upd - n_matched AS BIGINT),
       CAST(n_merged AS BIGINT), CAST(n_merged AS BIGINT)
FROM stats
ORDER BY sequence
"""
