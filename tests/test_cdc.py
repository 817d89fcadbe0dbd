"""MERGE upsert + snapshot-diff CDC on the snapshot tables, and the
common-neighbors / k-NN-graph operators added alongside them."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pikes_spark.operators.cdc import snapshot_diff
from pikes_spark.operators.graph import common_neighbors
from pikes_spark.sources.tables import SnapshotTable


@pytest.fixture()
def tbl(tmp_path, spark):
    t = SnapshotTable(str(tmp_path / "t"), sort_cols=["k"], name="t")
    base = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, v long")
    t.append(base, spark)
    return t


def test_merge_upserts_and_counts(spark, tbl):
    upd = spark.createDataFrame([(2, 25), (4, 40)], "k long, v long")
    m = tbl.merge(upd, ["k"], spark)
    assert m["lineage"]["matched"] == 1
    assert m["lineage"]["inserted"] == 1
    rows = {r.k: r.v for r in tbl.read(spark).collect()}
    assert rows == {1: 10, 2: 25, 3: 30, 4: 40}


def test_merge_keeps_time_travel(spark, tbl):
    upd = spark.createDataFrame([(2, 25)], "k long, v long")
    tbl.merge(upd, ["k"], spark)
    old = {r.k: r.v for r in tbl.read(spark, sequence=0).collect()}
    assert old == {1: 10, 2: 20, 3: 30}


def test_merge_into_empty_table(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "e"), name="e")
    upd = spark.createDataFrame([(1, 5)], "k long, v long")
    m = t.merge(upd, ["k"], spark)
    assert m["lineage"] == {"op": "merge", "matched": 0, "inserted": 1}
    assert t.read(spark).count() == 1


def test_snapshot_diff_labels(spark, tbl):
    # overwrite (not merge) so the diff also has a DELETE to label:
    # 1 unchanged, 2 updated, 3 deleted, 4 inserted
    new = spark.createDataFrame([(1, 10), (2, 25), (4, 40)], "k long, v long")
    tbl.overwrite(new, spark)
    out = {r.k: (r.change, r.v_before, r.v_after)
           for r in snapshot_diff(tbl, spark, 0, 1, ["k"]).collect()}
    assert out == {2: ("update", 20, 25),
                   3: ("delete", 30, None),
                   4: ("insert", None, 40)}


def test_common_neighbors_hub_cap_and_count(spark):
    # a,b share n1,n2; a,c share n1; hub is shared by everyone but its
    # degree (4) exceeds the cap, so it contributes nothing
    edges = spark.createDataFrame(
        [("a", "n1"), ("b", "n1"), ("c", "n1"),
         ("a", "n2"), ("b", "n2"),
         ("a", "hub"), ("b", "hub"), ("c", "hub"), ("d", "hub")],
        "src string, dst string")
    out = {(r.ca, r.cb): r.common
           for r in common_neighbors(edges, hub_cap=3, min_common=1).collect()}
    assert out == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_knn_graph_matches_numpy_brute_force(spark):
    from pikes_spark.operators.similarity import knn_graph
    sf = "/root/testdata/sf0.001"
    got = knn_graph(spark, sf, k=3, n_blocks=4).collect()
    emb = {r.vec_id: np.array(r.embedding, dtype=np.float64)
           for r in spark.read.parquet(f"{sf}/embeddings.parquet").collect()}
    ids = sorted(emb)
    mat = np.stack([emb[i] for i in ids])
    # mirror the kernel's per-dimension fold (matmul's blocked order
    # can differ in the last ulp, flipping a floor at the boundary)
    dots = np.zeros((len(ids), len(ids)))
    nrm = np.zeros(len(ids))
    for d in range(mat.shape[1]):
        dots += np.outer(mat[:, d], mat[:, d])
        nrm += mat[:, d] * mat[:, d]
    cos = np.floor(dots / np.sqrt(np.outer(nrm, nrm)) * 1e6).astype(np.int64)
    for r in got:
        si = ids.index(r.src)
        order = sorted(((-cos[si][ids.index(j)], j)
                        for j in ids if j != r.src))
        exp_dst = order[r.rk - 1][1]
        assert (r.dst, r.cos_x1e6) == (exp_dst, cos[si][ids.index(exp_dst)]), r
