"""Eighth-session operators: RDFS entailment, HITS, co-occurrence PMI,
percentile filter, curation funnel, partition pruning."""

import pytest
from pyspark.sql import functions as F

from pikes_spark.operators import rdfs

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# RDFS entailment
# ---------------------------------------------------------------------------

def test_transitive_closure_chain():
    got = rdfs._transitive_closure([("a", "b"), ("b", "c"), ("c", "d")])
    assert ("a", "d") in got and ("a", "c") in got and ("b", "d") in got
    assert len(got) == 6


def test_rdfs_entail_rules_fire(spark):
    triples = spark.createDataFrame(
        [("cust:1", rdfs._EX + "inNation", "nat:7", False),
         ("nat:7", rdfs._EX + "name", "FRANCE", True)],
        ["subject", "predicate", "object", "object_is_literal"])
    out = {(r.subject, r.predicate, r.object)
           for r in rdfs.rdfs_entail(triples).collect()}
    # rdfs7: subproperty propagation (one hop and closed two-hop)
    assert ("cust:1", rdfs._EX + "locatedIn", "nat:7") in out
    assert ("cust:1", rdfs._EX + "relatedTo", "nat:7") in out
    # rdfs2/rdfs3 + rdfs9: domain/range typing climbed to the roots
    assert ("cust:1", rdfs._RDF_TYPE, rdfs._EX + "Customer") in out
    assert ("cust:1", rdfs._RDF_TYPE, rdfs._EX + "Resource") in out
    assert ("nat:7", rdfs._RDF_TYPE, rdfs._EX + "Nation") in out
    assert ("nat:7", rdfs._RDF_TYPE, rdfs._EX + "Place") in out
    # literal objects are never typed (rdfs3 guard)
    assert not any(s == "FRANCE" for (s, _, _) in out)
    # schema closure rows present exactly once
    assert ("http://example.org/Customer", rdfs._SUBCLASS,
            "http://example.org/Resource") in out


def test_rdfs_entail_disjoint_from_input(spark):
    """Derived predicates never collide with data predicates — the
    invariant that lets the plan skip the anti-join."""
    out = rdfs.rdfs_entail_rel(spark, SF)
    data_preds = {r.predicate for r in
                  rdfs.rel_triples(spark, SF).select("predicate")
                  .distinct().collect()}
    got_preds = {r.predicate for r in
                 out.select("predicate").distinct().collect()}
    assert not (data_preds & got_preds)


def test_rdfs_entail_plan_broadcasts(spark):
    plan = rdfs.rdfs_entail_rel(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------

def test_hits_star_graph(spark):
    """Hub center pointing at k leaves: center is the max hub, leaves
    share the max authority; normalization pins both at the scale."""
    from pikes_spark.operators.graph import hits_int, _HITS_SCALE
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], ["src", "dst"])
    rows = {r.node: (r.auth, r.hub) for r in hits_int(e).collect()}
    assert rows[0][1] == _HITS_SCALE          # the only hub
    assert rows[0][0] == 0                    # no in-edges
    for leaf in (1, 2, 3):
        assert rows[leaf][0] == _HITS_SCALE   # symmetric authorities
        assert rows[leaf][1] == 0             # no out-edges


def test_hits_partitioning_invariance(spark):
    """Integer arithmetic makes the scores identical under different
    parallelism — the property the distributed value check relies on."""
    from pikes_spark.operators.graph import hits_int
    edges = [(i % 13, (i * 7) % 13) for i in range(60) if i % 13 != (i * 7) % 13]
    a = spark.createDataFrame(edges, ["src", "dst"])
    r1 = sorted(map(tuple, hits_int(a.repartition(1)).collect()))
    r32 = sorted(map(tuple, hits_int(a.repartition(32)).collect()))
    assert r1 == r32


# ---------------------------------------------------------------------------
# co-occurrence PMI
# ---------------------------------------------------------------------------

def test_cooc_pmi_exact_lift(spark, tmp_path):
    """Three docs, hand-computable counts: lift is the exact rational."""
    import pandas as pd
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": ["x y", "x y", "x y", "x y", "x y", "x z"],
    })
    p = str(tmp_path / "docs")
    spark.createDataFrame(pdf).write.parquet(p + "/documents.parquet")
    from pikes_spark.operators.textstats import cooc_pmi
    out = {(r.t1, r.t2): r for r in
           cooc_pmi(spark, p, v=3, min_pair=1).collect()}
    r = out[("x", "y")]
    # N=6, c(x)=6, c(y)=5, c12=5 -> lift = 6*5*1e6 // 30 = 1_000_000
    assert (r.c1, r.c2, r.c12, r.lift_fp) == (6, 5, 5, 1_000_000)
    r2 = out[("x", "z")]
    # N=6, c(x)=6, c(z)=1, c12=1 -> 6*1*1e6 // 6 = 1_000_000
    assert r2.lift_fp == 1_000_000


# ---------------------------------------------------------------------------
# percentile filter / curation funnel
# ---------------------------------------------------------------------------

def test_percentile_filter_exact_decile(spark):
    from pikes_spark.operators.textstats import percentile_filter
    rows = percentile_filter(spark, "/root/testdata/sf0.001").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        n = len(rs)
        dropped = [r for r in rs if r.dropped]
        assert len(dropped) == n * 10 // 100
        # the dropped set is exactly the lowest (score, doc_id) prefix
        order = sorted(rs, key=lambda r: (r.score, r.doc_id))
        assert set((r.doc_id) for r in dropped) == \
            set(r.doc_id for r in order[:n * 10 // 100])


def test_curation_funnel_monotone(spark):
    from pikes_spark.operators.textstats import curation_funnel
    for r in curation_funnel(spark, "/root/testdata/sf0.001").collect():
        assert (r.n0_all >= r.n1_quality >= r.n2_dedup
                >= r.n3_decon >= r.n4_capped >= 0)
        assert r.n4_capped <= 50


# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------

def test_label_prop_majority_and_clamp(spark):
    """Node 10 has two '1'-labeled and one '0'-labeled neighbors ->
    majority 1; node 11 ties 0 vs 1 -> smallest label 0; seeds stay."""
    from pikes_spark.operators.graph import label_propagation
    e = spark.createDataFrame(
        [(1, 10), (2, 10), (0, 10),   # 1,2 carry label 1,2... build exact
         (0, 11), (1, 11)],
        ["src", "dst"])
    out = {r.node: r.label for r in
           label_propagation(e, seeds=(0, 1, 2), iters=1).collect()}
    # node 10 neighbors: labels {1, 2, 0} -- all count 1, tie -> min = 0
    assert out[10] == 0
    # node 11 neighbors: labels {0, 1} -> tie -> 0
    assert out[11] == 0
    assert out[0] == 0 and out[1] == 1 and out[2] == 2


def test_label_prop_partitioning_invariance(spark):
    from pikes_spark.operators.graph import label_propagation
    edges = [(i % 17, (i * 5) % 17) for i in range(80) if i % 17 != (i * 5) % 17]
    df = spark.createDataFrame(edges, ["src", "dst"])
    r1 = sorted(map(tuple, label_propagation(df.repartition(1)).collect()))
    r32 = sorted(map(tuple, label_propagation(df.repartition(32)).collect()))
    assert r1 == r32


# ---------------------------------------------------------------------------
# partition pruning
# ---------------------------------------------------------------------------

def test_partition_prune_plan(spark, tmp_path):
    """The date predicate must land in PartitionFilters (manifest-level
    pruning) — NOT in PushedFilters/DataFilters (row-level)."""
    from pyspark.sql import functions as F
    from pikes_spark.operators.layout import pruned_events_frame
    base = str(tmp_path / "pe")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    (ev.withColumn("event_date", F.to_date("ts"))
     .write.partitionBy("event_date").parquet(base))
    plan = pruned_events_frame(spark, base)._jdf.queryExecution() \
        .executedPlan().toString()
    scan = [l for l in plan.splitlines() if "FileScan" in l][0]
    assert "PartitionFilters: [event_date" in scan
    assert "PushedFilters: []" in scan


# ---------------------------------------------------------------------------
# OWL-lite entailment
# ---------------------------------------------------------------------------

def test_owl_entail_chain(spark):
    """a partOf b partOf c partOf d: derived = 3 new partOf edges
    (a-c, a-d, b-d) + 6 hasPart inverses (all closed edges flipped)."""
    from pikes_spark.operators.rdfs import owl_entail, _PART_OF, _HAS_PART
    t = spark.createDataFrame(
        [("a", _PART_OF, "b", False),
         ("b", _PART_OF, "c", False),
         ("c", _PART_OF, "d", False)],
        ["subject", "predicate", "object", "object_is_literal"])
    rows = owl_entail(t).collect()
    part = {(r.subject, r.object) for r in rows if r.predicate == _PART_OF}
    haspart = {(r.subject, r.object) for r in rows if r.predicate == _HAS_PART}
    assert part == {("a", "c"), ("a", "d"), ("b", "d")}
    assert haspart == {("b", "a"), ("c", "b"), ("d", "c"),
                       ("c", "a"), ("d", "a"), ("d", "b")}


# ---------------------------------------------------------------------------
# co-visitation / trending
# ---------------------------------------------------------------------------

def test_covisitation_user_cap(spark, tmp_path):
    """A power user over the cap contributes no pairs; normal users
    are counted by DISTINCT users (duplicate events collapse)."""
    import json
    rows = []
    eid = 0
    # users 1..3 each view items 10 and 20 (user 1 views item 10 twice)
    for u in (1, 2, 3):
        for item in (10, 20):
            rows.append((eid, "2024-01-05 00:00:00", u, "view",
                         0.0, json.dumps({"k": item}))); eid += 1
    rows.append((eid, "2024-01-05 01:00:00", 1, "view", 0.0,
                 json.dumps({"k": 10}))); eid += 1
    # power user 99 views 200 distinct items (over the cap of 100)
    for item in range(1000, 1200):
        rows.append((eid, "2024-01-06 00:00:00", 99, "view",
                     0.0, json.dumps({"k": item}))); eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"])
                 .to_timestamp("ts"))
    p = str(tmp_path / "ev")
    df.write.parquet(p + "/events.parquet")
    from pikes_spark.operators.events import covisitation
    out = [(r.i1, r.i2, r.n_users) for r in covisitation(spark, p).collect()]
    assert out == [(10, 20, 3)]   # no pairs from user 99; distinct users


def test_trending_deterministic_ties(spark):
    from pikes_spark.operators.events import trending_items
    out = trending_items(spark, "/root/testdata/sf0.001").collect()
    by_day = {}
    for r in out:
        by_day.setdefault(r.day, []).append(r)
    for day, rs in by_day.items():
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        # rank order respects (n desc, item asc)
        for a, b in zip(rs, rs[1:]):
            assert (a.n, -a.item) >= (b.n, -b.item) or a.n > b.n


# ---------------------------------------------------------------------------
# item transitions / novelty
# ---------------------------------------------------------------------------

def test_item_transitions_order_and_share(spark, tmp_path):
    import json
    from pyspark.sql import functions as F
    rows = []
    # user 1: 10 -> 20 -> 10 -> 20 ; user 2: 10 -> 20 (x via ties)
    seq = [(1, "2024-01-05 00:00:0%d" % i, item)
           for i, item in enumerate([10, 20, 10, 20])]
    seq += [(2, "2024-01-05 00:00:00", 10), (2, "2024-01-05 00:00:01", 20)]
    for eid, (u, ts, item) in enumerate(seq):
        rows.append((eid, ts, u, "view", 0.0, json.dumps({"k": item})))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).withColumn("ts", F.to_timestamp("ts"))
    p = str(tmp_path / "ev")
    df.write.parquet(p + "/events.parquet")
    from pikes_spark.operators.events import item_transitions
    out = {(r.src_item, r.dst_item): (r.n, r.p_fp)
           for r in item_transitions(spark, p, min_n=1).collect()}
    # 10->20 appears 3x (u1 twice, u2 once); 20->10 once
    assert out[(10, 20)] == (3, 1_000_000)   # all of row 10's mass
    assert out[(20, 10)] == (1, 1_000_000)   # all of row 20's mass


def test_novelty_first_arrival(spark, tmp_path):
    import pandas as pd
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b c d e f",          # all grams novel (first doc)
                 "a b c d e f",          # exact copy -> novelty 0
                 "a b c d e x"],         # 1 of 2 grams novel
    })
    p = str(tmp_path / "docs")
    spark.createDataFrame(pdf).write.parquet(p + "/documents.parquet")
    from pikes_spark.operators.textstats import novelty_scores
    out = {r.doc_id: (r.n_grams, r.n_novel, r.novelty_fp)
           for r in novelty_scores(spark, p).collect()}
    assert out[1] == (2, 2, 1_000_000)
    assert out[2] == (2, 0, 0)
    assert out[3] == (2, 1, 500_000)


# ---------------------------------------------------------------------------
# plan-shape audit (scale regressions)
# ---------------------------------------------------------------------------

def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_cooc_pmi_plan(spark):
    """Vocab restriction is a broadcast join; the pair self-join is an
    equi-join on doc_id (never a cartesian); no Python in the plan."""
    from pikes_spark.operators.textstats import cooc_pmi
    p = _plan(cooc_pmi(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_covisitation_plan(spark):
    from pikes_spark.operators.events import covisitation
    p = _plan(covisitation(spark, SF))
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_novelty_plan_no_python_and_hashed_exchange(spark):
    """Pure Catalyst; the gram exchange carries the md5 hash, not raw
    text (no `text` column survives past the project under the
    exchange)."""
    from pikes_spark.operators.textstats import novelty_scores
    p = _plan(novelty_scores(spark, SF))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p


def test_trending_window_group_limit(spark):
    from pikes_spark.operators.events import trending_items
    p = _plan(trending_items(spark, SF))
    assert "WindowGroupLimit" in p


# ---------------------------------------------------------------------------
# phrase search / WAP / perceptual hash
# ---------------------------------------------------------------------------

def test_phrase_search_adjacency(spark, tmp_path):
    import pandas as pd
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["table hash table hash",    # 2 hits, first at pos 1
                 "hash table",               # reversed -> 0 hits
                 "x table y hash table hash z"],  # 1 hit at pos 5
    })
    p = str(tmp_path / "docs")
    spark.createDataFrame(pdf).write.parquet(p + "/documents.parquet")
    from pikes_spark.operators.textstats import phrase_search
    out = {r.doc_id: (r.n_hits, r.first_pos)
           for r in phrase_search(spark, p).collect()}
    assert out == {1: (2, 1), 3: (1, 5)}


def test_wap_publishes_only_audited(spark):
    from pikes_spark.operators.cdc import write_audit_publish
    rows = {r.segment: (r.n, r.bal_c)
            for r in write_audit_publish(spark, SF).collect()}
    audit_failed, staged = rows.pop("__AUDIT__")
    published = sum(n for n, _ in rows.values())
    assert staged == published + audit_failed
    assert audit_failed > 0            # negative balances exist in TPC-H
    # every published balance aggregate is non-negative by the audit rule
    assert all(bal >= 0 for _, bal in rows.values())


def test_phash_banded_equals_bruteforce(spark):
    """Banded candidate generation is COMPLETE for hamming <= 3 with 4
    bands (pigeonhole) — operator output must equal all-pairs."""
    import itertools
    from pikes_spark.operators.multimodal import phash_pairs, _image_corpus
    got = sorted((r.id1, r.id2, r.hamming)
                 for r in phash_pairs(spark).collect())
    hs = {r.media_id: r.ahash for r in _image_corpus(spark).collect()}
    bf = sorted((a, b, bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1"))
                for a, b in itertools.combinations(sorted(hs), 2))
    assert got == [(a, b, h) for a, b, h in bf if h <= 3]


def test_ahash_deterministic_and_msb_first():
    import numpy as np
    from pikes_spark.operators.multimodal import ahash64
    bright = np.zeros((8, 8, 3), dtype=np.uint8)
    bright[0, 0] = 255  # one bright pixel -> only bit 63 set... plus mean rule
    h = ahash64(bright)
    # single nonzero pixel: v*64 >= total holds only there (and at
    # zero-pixels 0*64 >= total fails since total > 0)
    assert h == -(2 ** 63)  # bit 63 as signed int64


# ---------------------------------------------------------------------------
# audio fingerprint / knn classify / grouped HLL
# ---------------------------------------------------------------------------

def test_audio_fp_banded_equals_bruteforce(spark):
    import itertools
    from pikes_spark.operators.multimodal import (
        audio_fp_pairs, _audio_corpus, _AFP_MAX_HAMMING)
    got = sorted((r.id1, r.id2, r.hamming)
                 for r in audio_fp_pairs(spark).collect())
    hs = {r.media_id: r.afp for r in _audio_corpus(spark).collect()}
    bf = sorted((a, b, bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1"))
                for a, b in itertools.combinations(sorted(hs), 2))
    assert got == [(a, b, h) for a, b, h in bf if h <= _AFP_MAX_HAMMING]
    # precision/recall of the spectral fingerprint on this corpus:
    # exactly the perturbed-variant pairs, no cross-pitch collisions
    assert got and all(b == a + 1000 for a, b, _ in got)


def test_afp64_amplitude_invariant_pitch_discriminative():
    """The spectral fingerprint's two contract properties: scaling the
    clip's amplitude leaves the hash unchanged; moving the pitch by a
    band width changes it."""
    import numpy as np
    from pikes_spark.operators.multimodal import afp64
    t = np.arange(16000)
    tone = lambda f, a: (a * np.sin(2 * np.pi * f * t / 16000)
                         ).astype(np.int16)
    assert afp64(tone(220, 3000)) == afp64(tone(220, 900))
    assert afp64(tone(220, 3000)) != afp64(tone(280, 3000))


def test_knn_classify_majority_tiebreak(spark, tmp_path):
    import pandas as pd
    # 6 unit-ish vectors in 2 clusters; labels tie inside a cluster ->
    # smallest label wins for the probe vector
    rows = [
        (0, [1.0, 0.0], 5), (1, [0.99, 0.01], 3), (2, [0.98, 0.02], 3),
        (3, [0.0, 1.0], 7), (4, [0.01, 0.99], 7), (5, [0.02, 0.98], 1),
    ]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    p = str(tmp_path / "emb")
    spark.createDataFrame(pdf).write.parquet(p + "/embeddings.parquet")
    from pikes_spark.operators.similarity import knn_classify
    out = {r.vec_id: r.pred_label for r in
           knn_classify(spark, p, k=2).collect()}
    # vec 0's 2-NN are vecs 1,2 (both label 3) -> 3
    assert out[0] == 3
    # vec 3's 2-NN are vecs 4 (7) and 5 (1): tie 1v1 -> smallest label 1
    assert out[3] == 1


def test_hll_by_lang_close_to_exact(spark):
    from pikes_spark.operators.sketches import hll_by_lang
    for r in hll_by_lang(spark, "/root/testdata/sf0.001").collect():
        # m=64 registers: expect the estimate within ~40% of exact
        assert abs(r.hll_estimate - r.exact_distinct) <= \
            max(10, int(0.4 * r.exact_distinct))


# ---------------------------------------------------------------------------
# SPARQL GRAPH (named graphs)
# ---------------------------------------------------------------------------

def _quads(spark):
    rows = [
        ("a", "p:knows", "b", False, "g1"),
        ("b", "p:knows", "c", False, "g1"),
        ("a", "p:knows", "c", False, "g2"),
        ("c", "p:name", "C", True, "g2"),
    ]
    return spark.createDataFrame(
        rows, ["subject", "predicate", "object", "object_is_literal",
               "graph"])


def test_graph_fixed_iri_prunes(spark):
    from pikes_spark.operators.kgquery import sparql_query
    out = sparql_query(_quads(spark), """
      SELECT ?s ?o WHERE { GRAPH <g1> { ?s <p:knows> ?o } } ORDER BY ?s
    """).collect()
    assert [(r.s, r.o) for r in out] == [("a", "b"), ("b", "c")]


def test_graph_var_binds_and_constrains(spark):
    """All patterns in one GRAPH ?g group must match in the SAME
    graph: a-knows-? and ?-name-? co-occur only in g2."""
    from pikes_spark.operators.kgquery import sparql_query
    out = sparql_query(_quads(spark), """
      SELECT ?g ?o ?nm WHERE {
        GRAPH ?g { ?s <p:knows> ?o . ?o <p:name> ?nm }
      }
    """).collect()
    assert [(r.g, r.o, r.nm) for r in out] == [("g2", "c", "C")]


def test_graph_joins_default_bgp(spark):
    from pikes_spark.operators.kgquery import sparql_query
    out = sparql_query(_quads(spark), """
      SELECT ?g ?s WHERE {
        ?s <p:knows> <c> .
        GRAPH ?g { ?s <p:knows> <b> }
      }
    """).collect()
    # default BGP matches subjects a (g2) and b (g1); the graph group
    # needs s-knows-b, which only a has (in g1)
    assert [(r.g, r.s) for r in out] == [("g1", "a")]


def test_graph_requires_graph_column(spark):
    import pytest as _pt
    from pikes_spark.operators.kgquery import sparql_query, SparqlError
    t = _quads(spark).drop("graph")
    with _pt.raises(SparqlError):
        sparql_query(t, "SELECT ?s WHERE { GRAPH ?g { ?s <p:knows> ?o } }")


# ---------------------------------------------------------------------------
# snapshot history metadata view
# ---------------------------------------------------------------------------

def test_snapshot_history_accounting(spark):
    from pikes_spark.operators.cdc import snapshot_history
    rows = snapshot_history(spark, SF).collect()
    assert [r.sequence for r in rows] == [0, 1]
    base, merge = rows
    assert base.op == "base" and merge.op == "merge"
    # overwrite semantics: total == added on the merge commit
    assert merge.total_rows == merge.added_rows
    # merge accounting: merged rows = base + inserted
    assert merge.total_rows == base.total_rows + merge.inserted
    assert merge.matched <= base.total_rows


def test_dedup_cluster_sizes_accounting(spark):
    from pikes_spark.operators.dedup import (
        dedup_cluster_sizes, dedup_group_representatives)
    hist = dedup_cluster_sizes(spark, "/root/testdata/sf0.001").collect()
    groups = dedup_group_representatives(
        spark, "/root/testdata/sf0.001").collect()
    # histogram mass equals the group map: sum(size*n) = grouped docs,
    # sum(docs_removed) = dropped docs
    assert sum(r.size * r.n_groups for r in hist) == len(groups)
    assert sum(r.docs_removed for r in hist) == \
        sum(1 for g in groups if not g.keep)
    assert all(r.size >= 2 for r in hist)
