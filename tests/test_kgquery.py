"""SPARQL BGP compiler (operators/kgquery): parser, join semantics,
filters, and plan shape."""

import pytest

from pyspark.sql import functions as F

from pikes_spark.operators.kgquery import (
    SparqlError, SparqlQuery, sparql_query)


TRIPLES = [
    # (subject, predicate, object, object_is_literal)
    ("e:ev1", "sem:hasActor", "e:alice", False),
    ("e:ev1", "rdf:type", "sem:Event", False),
    ("e:ev2", "sem:hasActor", "e:bob", False),
    ("e:ev2", "sem:hasActor", "e:alice", False),
    ("e:ev2", "rdf:type", "sem:Event", False),
    ("e:ev3", "sem:hasActor", "e:carol", False),   # not typed Event
    ("e:alice", "foaf:name", "Alice", True),
    ("e:bob", "foaf:name", "Bob", True),
    ("e:alice", "rdf:type", "nwr:PERSON", False),
    ("e:bob", "rdf:type", "nwr:PERSON", False),
    # literal with same text as an IRI object, to test the
    # literal/IRI distinction
    ("e:x", "p:val", "sem:Event", True),
    ("e:loop", "p:self", "e:loop", False),
]

PFX = """PREFIX sem: <sem:>
PREFIX rdf: <rdf:>
PREFIX foaf: <foaf:>
PREFIX nwr: <nwr:>
PREFIX p: <p:>
PREFIX e: <e:>
"""


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(
        TRIPLES, "subject string, predicate string, object string, "
                 "object_is_literal boolean")


def q(triples_df, text):
    return [tuple(r) for r in sparql_query(triples_df, PFX + text).collect()]


def test_parse_rejects_garbage():
    with pytest.raises(SparqlError):
        SparqlQuery("FNORD ?x WHERE { ?x ?y ?z }")
    with pytest.raises(SparqlError):
        SparqlQuery("SELECT ?x WHERE { }")
    with pytest.raises(SparqlError):
        SparqlQuery("SELECT ?x WHERE { ?x unknownpfx:p ?y . }")


def test_single_pattern_constant_predicate(triples):
    rows = q(triples, "SELECT ?s ?o WHERE { ?s sem:hasActor ?o . } "
                      "ORDER BY ?s ?o")
    assert rows == [("e:ev1", "e:alice"), ("e:ev2", "e:alice"),
                    ("e:ev2", "e:bob"), ("e:ev3", "e:carol")]


def test_join_on_shared_variable(triples):
    rows = q(triples, """SELECT ?ev ?a WHERE {
        ?ev sem:hasActor ?a .
        ?ev rdf:type sem:Event .
    } ORDER BY ?ev ?a""")
    # ev3 drops: not typed Event
    assert rows == [("e:ev1", "e:alice"), ("e:ev2", "e:alice"),
                    ("e:ev2", "e:bob")]


def test_three_hop_join_with_literal_object(triples):
    rows = q(triples, """SELECT ?ev ?name WHERE {
        ?ev sem:hasActor ?a .
        ?a rdf:type nwr:PERSON .
        ?a foaf:name ?name .
    } ORDER BY ?ev ?name""")
    assert rows == [("e:ev1", "Alice"), ("e:ev2", "Alice"),
                    ("e:ev2", "Bob")]


def test_literal_vs_iri_distinction(triples):
    # quoted "sem:Event" matches ONLY the literal row
    rows = q(triples, 'SELECT ?s WHERE { ?s p:val "sem:Event" . }')
    assert rows == [("e:x",)]
    # IRI sem:Event as object matches only non-literal rows
    rows = q(triples, "SELECT ?s WHERE { ?s rdf:type sem:Event . } ORDER BY ?s")
    assert rows == [("e:ev1",), ("e:ev2",)]


def test_repeated_variable_in_one_pattern(triples):
    rows = q(triples, "SELECT ?x WHERE { ?x p:self ?x . }")
    assert rows == [("e:loop",)]


def test_filter_neq_and_regex(triples):
    rows = q(triples, """SELECT ?ev ?a WHERE {
        ?ev sem:hasActor ?a .
        FILTER (?a != e:alice)
    } ORDER BY ?ev""")
    assert rows == [("e:ev2", "e:bob"), ("e:ev3", "e:carol")]
    rows = q(triples, """SELECT ?a WHERE {
        ?a foaf:name ?n .
        FILTER (regex(?n, "^A"))
    }""")
    assert rows == [("e:alice",)]


def test_filter_unbound_variable_raises(triples):
    with pytest.raises(SparqlError):
        sparql_query(triples, PFX + "SELECT ?s WHERE { ?s foaf:name ?n . "
                                    "FILTER (?missing != ?n) }")


def test_distinct_and_limit(triples):
    rows = q(triples, "SELECT DISTINCT ?a WHERE { ?ev sem:hasActor ?a . } "
                      "ORDER BY ?a LIMIT 2")
    assert rows == [("e:alice",), ("e:bob",)]


def test_projection_unbound_raises(triples):
    with pytest.raises(SparqlError):
        sparql_query(triples, PFX + "SELECT ?nope WHERE { ?s foaf:name ?n . }")


def test_disconnected_bgp_cross_joins(triples):
    # disconnected patterns are legal SPARQL: cartesian of both match sets
    rows = q(triples, """SELECT ?n1 ?n2 WHERE {
        e:alice foaf:name ?n1 .
        e:bob foaf:name ?n2 .
    }""")
    assert rows == [("Alice", "Bob")]


def test_connected_bgp_plan_has_no_cartesian(triples):
    """Greedy connected ordering: a chain BGP must compile to equi-joins
    only, even when the most-constrained patterns don't share vars."""
    plan = sparql_query(triples, PFX + """SELECT ?ev ?name WHERE {
        ?ev rdf:type sem:Event .
        ?a rdf:type nwr:PERSON .
        ?ev sem:hasActor ?a .
        ?a foaf:name ?name .
    }""")._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan


def test_rel_bgp_matches_duckdb(spark):
    """Semantic oracle: the compiled BGP over the relational triple view
    equals DuckDB's explicit-join formulation of the same query."""
    import duckdb

    from pikes_spark.operators.kgquery import (
        REL_BGP, SPARQL_REL_SQL, rel_triples)
    sf_dir = "/root/testdata/sf0.001"
    out = sparql_query(rel_triples(spark, sf_dir), REL_BGP)
    got = [tuple(r) for r in out.collect()]
    con = duckdb.connect()
    for tab in ("customer", "nation", "region"):
        con.sql(f"CREATE VIEW {tab} AS SELECT * "
                f"FROM '{sf_dir}/{tab}.parquet'")
    assert got == [tuple(r) for r in con.sql(SPARQL_REL_SQL).fetchall()]


def test_optional_left_join_nulls(triples):
    # carol has no foaf:name -> NULL; alice/bob get theirs
    rows = q(triples, """SELECT ?a ?n WHERE {
        ?ev sem:hasActor ?a .
        OPTIONAL { ?a foaf:name ?n . }
    } ORDER BY ?a ?n""")
    assert rows == [("e:alice", "Alice"), ("e:alice", "Alice"),
                    ("e:bob", "Bob"), ("e:carol", None)]


def test_optional_group_with_internal_filter(triples):
    # filter inside OPTIONAL narrows the group, not the required part
    rows = q(triples, """SELECT ?a ?n WHERE {
        ?a rdf:type nwr:PERSON .
        OPTIONAL { ?a foaf:name ?n . FILTER (regex(?n, "^B")) }
    } ORDER BY ?a""")
    assert rows == [("e:alice", None), ("e:bob", "Bob")]


def test_optional_without_shared_var_raises(triples):
    with pytest.raises(SparqlError):
        sparql_query(triples, PFX + """SELECT ?a ?x WHERE {
            ?a rdf:type nwr:PERSON .
            OPTIONAL { ?x p:self ?x . }
        }""")


def test_optional_rel_matches_duckdb(spark):
    import duckdb

    from pikes_spark.operators.kgquery import (
        REL_BGP_OPTIONAL, SPARQL_OPTIONAL_SQL, rel_triples)
    sf_dir = "/root/testdata/sf0.001"
    out = sparql_query(rel_triples(spark, sf_dir), REL_BGP_OPTIONAL)
    got = sorted((tuple(r) for r in out.collect()),
                 key=lambda t: tuple("" if v is None else v for v in t))
    con = duckdb.connect()
    for tab in ("customer", "nation", "region"):
        con.sql(f"CREATE VIEW {tab} AS SELECT * "
                f"FROM '{sf_dir}/{tab}.parquet'")
    want = sorted((tuple(r) for r in con.sql(SPARQL_OPTIONAL_SQL).fetchall()),
                  key=lambda t: tuple("" if v is None else v for v in t))
    assert got == want


def test_aggregate_count_group_by(triples):
    rows = q(triples, """SELECT ?ev (COUNT(?a) AS ?n) WHERE {
        ?ev sem:hasActor ?a .
    } GROUP BY ?ev ORDER BY ?ev""")
    assert rows == [("e:ev1", 1), ("e:ev2", 2), ("e:ev3", 1)]


def test_aggregate_global_count_star(triples):
    rows = q(triples, "SELECT (COUNT(*) AS ?n) WHERE { ?s sem:hasActor ?o . }")
    assert rows == [(4,)]


def test_aggregate_count_distinct(triples):
    rows = q(triples, """SELECT (COUNT(DISTINCT ?a) AS ?n) WHERE {
        ?ev sem:hasActor ?a .
    }""")
    assert rows == [(3,)]


def test_aggregate_min_max(triples):
    rows = q(triples, """SELECT ?ev (MIN(?a) AS ?lo) (MAX(?a) AS ?hi) WHERE {
        ?ev sem:hasActor ?a .
    } GROUP BY ?ev ORDER BY ?ev""")
    assert rows == [("e:ev1", "e:alice", "e:alice"),
                    ("e:ev2", "e:alice", "e:bob"),
                    ("e:ev3", "e:carol", "e:carol")]


def test_aggregate_rejects_ungrouped_projection(triples):
    with pytest.raises(SparqlError):
        sparql_query(triples, PFX + """SELECT ?a (COUNT(*) AS ?n) WHERE {
            ?ev sem:hasActor ?a . } GROUP BY ?ev""")


def test_aggregate_rel_matches_duckdb(spark):
    import duckdb

    from pikes_spark.operators.kgquery import (
        REL_BGP_AGG, SPARQL_AGG_SQL, rel_triples)
    sf_dir = "/root/testdata/sf0.001"
    out = sparql_query(rel_triples(spark, sf_dir), REL_BGP_AGG)
    got = [tuple(r) for r in out.collect()]
    con = duckdb.connect()
    for tab in ("customer", "nation", "region"):
        con.sql(f"CREATE VIEW {tab} AS SELECT * "
                f"FROM '{sf_dir}/{tab}.parquet'")
    assert got == [tuple(r) for r in con.sql(SPARQL_AGG_SQL).fetchall()]
    assert len(got) > 0


def test_query_snapshot_end_to_end(spark, tmp_path):
    """Full loop: distill gold pages -> commit spo/pos snapshots ->
    SPARQL over the materialized table."""
    from pikes_spark.pipeline import run_pipeline
    from pikes_spark.operators.kgquery import query_snapshot

    out_root = str(tmp_path / "kg")
    run_pipeline(spark, "/root/testdata/sf0.001", out_root, resume=False)
    # canonicalization smushed linked entities onto their DBpedia IRIs;
    # those canonical subjects are queryable in the materialized KG
    rows = query_snapshot(spark, out_root, """
        PREFIX ks: <http://dkm.fbk.eu/ontologies/knowledgestore#>
        SELECT DISTINCT ?s WHERE {
            ?s rdf:type ks:Entity .
            FILTER (regex(?s, "^http://dbpedia"))
        } ORDER BY ?s""").collect()
    assert len(rows) > 5
    assert all(r.s.startswith("http://dbpedia.org/") for r in rows)
    # aggregate over the snapshot: events per page
    agg = query_snapshot(spark, out_root, """
        PREFIX sem: <http://semanticweb.cs.vu.nl/2009/11/sem/>
        SELECT (COUNT(DISTINCT ?ev) AS ?n) WHERE {
            ?ev rdf:type sem:Event .
        }""").collect()
    assert agg[0].n > 50


def test_union_branches_align_vars(triples):
    rows = q(triples, """SELECT ?x ?n WHERE {
        { ?x rdf:type nwr:PERSON . ?x foaf:name ?n . }
        UNION
        { ?x rdf:type sem:Event . }
    } ORDER BY ?x ?n""")
    assert rows == [("e:alice", "Alice"), ("e:bob", "Bob"),
                    ("e:ev1", None), ("e:ev2", None)]


def test_union_joined_with_required_pattern(triples):
    rows = q(triples, """SELECT ?ev ?a WHERE {
        ?ev sem:hasActor ?a .
        { ?a rdf:type nwr:PERSON . } UNION { ?a foaf:name "Carol" . }
    } ORDER BY ?ev ?a""")
    assert rows == [("e:ev1", "e:alice"), ("e:ev2", "e:alice"),
                    ("e:ev2", "e:bob")]


def test_values_single_var(triples):
    rows = q(triples, """SELECT ?a ?n WHERE {
        ?a foaf:name ?n .
        VALUES ?n { "Alice" "Nobody" }
    }""")
    assert rows == [("e:alice", "Alice")]


def test_values_multi_var_with_undef(triples):
    # UNDEF on ?n = wildcard: second row admits every name of e:bob
    rows = q(triples, """SELECT ?a ?n WHERE {
        ?a foaf:name ?n .
        VALUES (?a ?n) { (e:alice "Alice") (e:bob UNDEF) }
    } ORDER BY ?a""")
    assert rows == [("e:alice", "Alice"), ("e:bob", "Bob")]


def test_union_rel_matches_duckdb(spark):
    import duckdb

    from pikes_spark.operators.kgquery import (
        REL_BGP_UNION, REL_BGP_VALUES, SPARQL_UNION_SQL, SPARQL_VALUES_SQL,
        rel_triples)
    sf_dir = "/root/testdata/sf0.001"
    t = rel_triples(spark, sf_dir)
    con = duckdb.connect()
    for tab in ("customer", "nation", "region"):
        con.sql(f"CREATE VIEW {tab} AS SELECT * "
                f"FROM '{sf_dir}/{tab}.parquet'")
    got = [tuple(r) for r in sparql_query(t, REL_BGP_UNION).collect()]
    assert got == [tuple(r) for r in con.sql(SPARQL_UNION_SQL).fetchall()]
    got = [tuple(r) for r in sparql_query(t, REL_BGP_VALUES).collect()]
    assert got == [tuple(r) for r in con.sql(SPARQL_VALUES_SQL).fetchall()]
    assert len(got) > 0


@pytest.fixture(scope="module")
def hier(spark):
    # a -> b -> c -> d chain plus side edge b -> x; cycle d -> a
    return spark.createDataFrame(
        [("a", "p:in", "b", False), ("b", "p:in", "c", False),
         ("c", "p:in", "d", False), ("b", "p:in", "x", False),
         ("d", "p:in", "a", False), ("a", "p:other", "z", False)],
        "subject string, predicate string, object string, "
        "object_is_literal boolean")


def test_property_path_transitive(hier):
    rows = sorted(r.y for r in sparql_query(hier, PFX + """
        SELECT ?y WHERE { <a> p:in+ ?y . }""").collect())
    # closure from a: b, c, d, x, and back to a through the cycle
    assert rows == ["a", "b", "c", "d", "x"]


def test_property_path_reverse_endpoint(hier):
    rows = sorted(r.x for r in sparql_query(hier, PFX + """
        SELECT ?x WHERE { ?x p:in+ <d> . }""").collect())
    assert rows == ["a", "b", "c", "d"]  # d reaches itself via the cycle


def test_property_path_requires_constant_pred(hier):
    with pytest.raises(SparqlError):
        sparql_query(hier, PFX + "SELECT ?x WHERE { ?x ?p+ <d> . }")


def test_path_inverse(hier):
    # (?x ^p:in <a>) == (<a> p:in ?x)
    rows = sorted(r.x for r in sparql_query(hier, PFX + """
        SELECT ?x WHERE { ?x ^p:in <a> . }""").collect())
    assert rows == ["b"]


def test_path_sequence(hier):
    rows = sorted(r.y for r in sparql_query(hier, PFX + """
        SELECT ?y WHERE { <a> p:in/p:in ?y . }""").collect())
    assert rows == ["c", "x"]


def test_path_sequence_with_closure_tail(hier):
    rows = sorted(set(r.y for r in sparql_query(hier, PFX + """
        SELECT ?y WHERE { <a> p:in/p:in+ ?y . }""").collect()))
    assert rows == ["a", "b", "c", "d", "x"]


def test_path_alternation(hier):
    rows = sorted(r.y for r in sparql_query(hier, PFX + """
        SELECT ?y WHERE { <a> p:in|p:other ?y . }""").collect())
    assert rows == ["b", "z"]


def test_path_zero_or_more(hier):
    rows = sorted(r.y for r in sparql_query(hier, PFX + """
        SELECT ?y WHERE { <b> p:in* ?y . }""").collect())
    assert rows == ["a", "b", "c", "d", "x"]
    # a node with no outgoing edges still matches itself (zero-length)
    rows = sorted(r.y for r in sparql_query(hier, PFX + """
        SELECT ?y WHERE { <z> p:in* ?y . }""").collect())
    assert rows == ["z"]


def test_path_zero_or_one(hier):
    rows = sorted(r.y for r in sparql_query(hier, PFX + """
        SELECT ?y WHERE { <c> p:in? ?y . }""").collect())
    assert rows == ["c", "d"]


def test_path_inverse_of_alternation(hier):
    # ^(p1|p2): swap endpoints of the alternation edge set
    rows = sorted(tuple(r) for r in sparql_query(hier, PFX + """
        SELECT ?x ?y WHERE { ?x ^(p:in|p:other) ?y . ?y <p:in> <b> . }
    """).collect())
    # y must have p:in edge to b -> y == a; x = targets of a's edges
    assert rows == [("b", "a"), ("z", "a")]


def test_path_sequence_internal_var_not_projected(hier):
    df = sparql_query(hier, PFX +
                      "SELECT * WHERE { <a> p:in/p:in ?y . }")
    assert df.columns == ["y"]


def test_path_seq_ops_star_match_duckdb(spark):
    import duckdb

    from pikes_spark.operators.kgquery import (
        REL_BGP_PATH_OPS, REL_BGP_PATH_SEQ, REL_BGP_PATH_STAR,
        SPARQL_PATH_OPS_SQL, SPARQL_PATH_SEQ_SQL, SPARQL_PATH_STAR_SQL,
        rel_triples)
    sf_dir = "/root/testdata/sf0.001"
    t = rel_triples(spark, sf_dir)
    con = duckdb.connect()
    for tab in ("customer", "nation", "region"):
        con.sql(f"CREATE VIEW {tab} AS SELECT * "
                f"FROM '{sf_dir}/{tab}.parquet'")
    for bgp, sql in ((REL_BGP_PATH_SEQ, SPARQL_PATH_SEQ_SQL),
                     (REL_BGP_PATH_OPS, SPARQL_PATH_OPS_SQL),
                     (REL_BGP_PATH_STAR, SPARQL_PATH_STAR_SQL)):
        got = [tuple(r) for r in sparql_query(t, bgp).collect()]
        want = [tuple(r) for r in con.sql(sql).fetchall()]
        assert got == want and len(got) > 0


def test_construct_template(triples):
    from pikes_spark.operators.kgquery import sparql_construct
    out = sparql_construct(triples, PFX + """
        CONSTRUCT { ?a <p:actsIn> ?ev . ?a a <p:Actor> . }
        WHERE { ?ev sem:hasActor ?a . }""")
    rows = sorted(tuple(r) for r in out.collect())
    assert ("e:alice", "p:actsIn", "e:ev1") in rows
    assert ("e:alice", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "p:Actor") in rows
    # dedup: alice acts in two events but is typed Actor once
    assert len([r for r in rows if r[1].endswith("type")
                and r[0] == "e:alice"]) == 1


def test_ask(triples):
    from pikes_spark.operators.kgquery import sparql_ask
    assert sparql_ask(triples, PFX + "ASK { ?x foaf:name \"Alice\" . }")
    assert not sparql_ask(triples, PFX + "ASK { ?x foaf:name \"Zelda\" . }")


def test_path_rel_matches_duckdb(spark):
    import duckdb

    from pikes_spark.operators.kgquery import (
        REL_BGP_PATH, REL_CONSTRUCT, SPARQL_CONSTRUCT_SQL, SPARQL_PATH_SQL,
        rel_triples, sparql_construct)
    sf_dir = "/root/testdata/sf0.001"
    t = rel_triples(spark, sf_dir)
    con = duckdb.connect()
    for tab in ("customer", "nation", "region"):
        con.sql(f"CREATE VIEW {tab} AS SELECT * "
                f"FROM '{sf_dir}/{tab}.parquet'")
    got = [tuple(r) for r in sparql_query(t, REL_BGP_PATH).collect()]
    assert got == [tuple(r) for r in con.sql(SPARQL_PATH_SQL).fetchall()]
    got = sorted(tuple(r) for r in sparql_construct(t, REL_CONSTRUCT).collect())
    want = sorted(tuple(r) for r in con.sql(SPARQL_CONSTRUCT_SQL).fetchall())
    assert got == want and len(got) > 0


def test_minus_removes_matches(triples):
    rows = q(triples, """SELECT ?a WHERE {
        ?a rdf:type nwr:PERSON .
        MINUS { ?ev2 sem:hasActor ?a . ?ev2 rdf:type sem:Event . }
    }""")
    assert rows == []  # both persons act in typed events
    rows = q(triples, """SELECT ?a WHERE {
        ?ev sem:hasActor ?a .
        FILTER NOT EXISTS { ?a rdf:type nwr:PERSON . }
    }""")
    assert rows == [("e:carol",)]


def test_minus_plan_is_anti_join(triples):
    plan = sparql_query(triples, PFX + """SELECT ?a WHERE {
        ?ev sem:hasActor ?a .
        MINUS { ?a foaf:name ?n . }
    }""")._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan


def test_minus_rel_matches_duckdb(spark):
    import duckdb

    from pikes_spark.operators.kgquery import (
        REL_BGP_MINUS, SPARQL_MINUS_SQL, rel_triples)
    sf_dir = "/root/testdata/sf0.001"
    got = [tuple(r) for r in sparql_query(
        rel_triples(spark, sf_dir), REL_BGP_MINUS).collect()]
    con = duckdb.connect()
    for tab in ("customer", "nation", "region"):
        con.sql(f"CREATE VIEW {tab} AS SELECT * "
                f"FROM '{sf_dir}/{tab}.parquet'")
    assert got == [tuple(r) for r in con.sql(SPARQL_MINUS_SQL).fetchall()]


def test_optional_then_aggregate_counts_skip_nulls(triples):
    # COUNT(?n) must skip unbound (NULL) optional bindings, COUNT(*) not
    rows = q(triples, """SELECT ?a (COUNT(?n) AS ?named) (COUNT(*) AS ?all) WHERE {
        ?ev sem:hasActor ?a .
        OPTIONAL { ?a foaf:name ?n . }
    } GROUP BY ?a ORDER BY ?a""")
    assert rows == [("e:alice", 2, 2), ("e:bob", 1, 1), ("e:carol", 0, 1)]


def test_union_and_optional_combined(triples):
    rows = q(triples, """SELECT ?x ?n WHERE {
        { ?x rdf:type sem:Event . } UNION { ?x rdf:type nwr:PERSON . }
        OPTIONAL { ?x foaf:name ?n . }
    } ORDER BY ?x""")
    assert rows == [("e:alice", "Alice"), ("e:bob", "Bob"),
                    ("e:ev1", None), ("e:ev2", None)]


def test_multiple_filters_and_messy_whitespace(triples):
    rows = q(triples, "SELECT ?ev ?a WHERE {\n\t?ev   sem:hasActor\t?a .\n"
                      "  FILTER (?a != e:alice)\n"
                      "  FILTER (regex(?a, \"^e:\"))\n"
                      "  FILTER (?ev != e:ev3)\n} ORDER BY ?a")
    assert rows == [("e:ev2", "e:bob")]


def test_values_combined_with_minus(triples):
    rows = q(triples, """SELECT ?a WHERE {
        ?ev sem:hasActor ?a .
        VALUES ?a { e:alice e:bob e:carol }
        MINUS { ?a foaf:name ?n . }
    }""")
    assert rows == [("e:carol",)]


# ---------------------------------------------------------------- r4:
# BIND / HAVING / OFFSET / full expression FILTERs


def test_bind_arithmetic_and_projection(triples):
    rows = q(triples, """SELECT ?a ?ln WHERE {
        ?a foaf:name ?n .
        BIND(STRLEN(?n) * 10 AS ?ln)
    } ORDER BY ?a""")
    assert rows == [("e:alice", 50), ("e:bob", 30)]


def test_bind_chained_and_filtered(triples):
    # later BIND references earlier alias; FILTER references the bind
    rows = q(triples, """SELECT ?n ?u WHERE {
        ?a foaf:name ?n .
        BIND(UCASE(?n) AS ?u)
        BIND(CONCAT(?u, "!") AS ?bang)
        FILTER(STRENDS(?bang, "E!"))
    }""")
    assert rows == [("Alice", "ALICE")]


def test_bind_rebind_rejected(triples):
    with pytest.raises(SparqlError):
        q(triples, "SELECT ?n WHERE { ?a foaf:name ?n . "
                   "BIND(UCASE(?n) AS ?n) }")


def test_filter_boolean_connectives(triples):
    rows = q(triples, """SELECT ?ev ?a WHERE {
        ?ev sem:hasActor ?a .
        FILTER(?a = e:alice || ?a = e:carol && ?ev != e:ev3)
    } ORDER BY ?ev""")
    # && binds tighter than ||: alice rows survive, carol's ev3 dropped
    assert rows == [("e:ev1", "e:alice"), ("e:ev2", "e:alice")]


def test_filter_builtins_contains_if(triples):
    rows = q(triples, """SELECT ?a ?tag WHERE {
        ?a foaf:name ?n .
        BIND(IF(CONTAINS(LCASE(?n), "li"), "yes", "no") AS ?tag)
        FILTER(!STRSTARTS(?n, "Z"))
    } ORDER BY ?a""")
    assert rows == [("e:alice", "yes"), ("e:bob", "no")]


def test_having_on_count(triples):
    rows = q(triples, """SELECT ?a (COUNT(?ev) AS ?c) WHERE {
        ?ev sem:hasActor ?a .
    } GROUP BY ?a HAVING(COUNT(?ev) >= 2) ORDER BY ?a""")
    assert rows == [("e:alice", 2)]


def test_having_internal_agg_not_projected(triples):
    # HAVING over an aggregate NOT in the projection: internal _hav
    # column must be computed then dropped
    rows = q(triples, """SELECT ?a (MIN(?ev) AS ?first) WHERE {
        ?ev sem:hasActor ?a .
    } GROUP BY ?a HAVING(COUNT(?ev) = 1) ORDER BY ?a""")
    assert rows == [("e:bob", "e:ev2"), ("e:carol", "e:ev3")]


def test_offset_and_limit(triples):
    base = q(triples, "SELECT ?a WHERE { ?ev sem:hasActor ?a . } ORDER BY ?a ?ev")
    page = q(triples, "SELECT ?a WHERE { ?ev sem:hasActor ?a . } "
                      "ORDER BY ?a ?ev LIMIT 2 OFFSET 1")
    assert page == base[1:3]


def test_bind_having_offset_match_duckdb(spark):
    """Relational cross-check: BIND + HAVING + OFFSET vs DuckDB on the
    TPC-H customer table (triple-ized)."""
    import duckdb
    import os
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    trip = cust.selectExpr(
        "concat('c:', c_custkey) AS subject",
        "'p:mktsegment' AS predicate",
        "c_mktsegment AS object", "true AS object_is_literal").unionByName(
        cust.selectExpr(
            "concat('c:', c_custkey) AS subject",
            "'p:acctbal' AS predicate",
            "cast(c_acctbal AS string) AS object",
            "true AS object_is_literal"))
    got = [tuple(r) for r in sparql_query(trip, """
        PREFIX p: <p:>
        SELECT ?seg (COUNT(?c) AS ?n) WHERE {
            ?c p:mktsegment ?s .
            BIND(LCASE(?s) AS ?seg)
        } GROUP BY ?seg HAVING(COUNT(?c) > 2)
        ORDER BY ?seg LIMIT 3 OFFSET 1""").collect()]
    con = duckdb.connect()
    exp = con.sql(
        f"SELECT lower(c_mktsegment) AS seg, count(*) AS n "
        f"FROM '{sf_dir}/customer.parquet' GROUP BY seg HAVING n > 2 "
        f"ORDER BY seg LIMIT 3 OFFSET 1").fetchall()
    assert got == [tuple(r) for r in exp]


def test_filter_exists_semi_join(triples):
    # keep only actors that have a name; no duplication from multiple
    # witnesses (semi-join, not inner join)
    rows = q(triples, """SELECT ?ev ?a WHERE {
        ?ev sem:hasActor ?a .
        FILTER EXISTS { ?a foaf:name ?n . }
    } ORDER BY ?ev ?a""")
    assert rows == [("e:ev1", "e:alice"), ("e:ev2", "e:alice"),
                    ("e:ev2", "e:bob")]


def test_filter_not_exists_still_works(triples):
    rows = q(triples, """SELECT ?a WHERE {
        ?ev sem:hasActor ?a .
        FILTER NOT EXISTS { ?a foaf:name ?n . }
    }""")
    assert rows == [("e:carol",)]


def test_subquery_join(triples):
    # inner SELECT computes per-actor event counts; outer joins names
    rows = q(triples, """SELECT ?a ?n ?c WHERE {
        ?a foaf:name ?n .
        { SELECT ?a (COUNT(?ev) AS ?c) WHERE {
            ?ev sem:hasActor ?a . } GROUP BY ?a }
    } ORDER BY ?a""")
    assert rows == [("e:alice", "Alice", 2), ("e:bob", "Bob", 1)]


def test_subquery_with_limit_scopes_inside(triples):
    # LIMIT inside the subquery must not cap the outer result
    rows = q(triples, """SELECT ?a ?ev WHERE {
        ?ev sem:hasActor ?a .
        { SELECT ?a WHERE { ?a rdf:type nwr:PERSON . } }
    } ORDER BY ?a ?ev""")
    assert rows == [("e:alice", "e:ev1"), ("e:alice", "e:ev2"),
                    ("e:bob", "e:ev2")]


def test_group_concat_and_sample(triples):
    rows = q(triples, """SELECT ?ev (GROUP_CONCAT(?a ; SEPARATOR=",") AS ?who)
                                (SAMPLE(?a) AS ?one) WHERE {
        ?ev sem:hasActor ?a .
    } GROUP BY ?ev ORDER BY ?ev""")
    assert rows == [("e:ev1", "e:alice", "e:alice"),
                    ("e:ev2", "e:alice,e:bob", "e:alice"),
                    ("e:ev3", "e:carol", "e:carol")]


def test_group_concat_distinct_default_sep(triples):
    rows = q(triples, """SELECT ?t (GROUP_CONCAT(DISTINCT ?s) AS ?subs) WHERE {
        ?s rdf:type ?t .
    } GROUP BY ?t ORDER BY ?t""")
    assert rows == [("nwr:PERSON", "e:alice e:bob"),
                    ("sem:Event", "e:ev1 e:ev2")]


def test_describe_explicit_iri(triples):
    from pikes_spark.operators.kgquery import sparql_describe
    got = sorted(tuple(r) for r in
                 sparql_describe(triples, PFX + "DESCRIBE e:alice").collect())
    # subject triples + triples pointing at e:alice as an IRI object
    assert got == sorted([
        ("e:alice", "foaf:name", "Alice", True),
        ("e:alice", "rdf:type", "nwr:PERSON", False),
        ("e:ev1", "sem:hasActor", "e:alice", False),
        ("e:ev2", "sem:hasActor", "e:alice", False),
    ])


def test_describe_var_with_where(triples):
    from pikes_spark.operators.kgquery import sparql_describe
    got = sorted(tuple(r) for r in sparql_describe(triples, PFX + """
        DESCRIBE ?ev WHERE { ?ev rdf:type sem:Event . }""").collect())
    assert got == sorted([
        ("e:ev1", "sem:hasActor", "e:alice", False),
        ("e:ev1", "rdf:type", "sem:Event", False),
        ("e:ev2", "sem:hasActor", "e:bob", False),
        ("e:ev2", "sem:hasActor", "e:alice", False),
        ("e:ev2", "rdf:type", "sem:Event", False),
    ])


def test_describe_literal_object_not_a_resource(triples):
    # "sem:Event" as a LITERAL object must not pull e:x into the
    # description of sem:Event
    from pikes_spark.operators.kgquery import sparql_describe
    got = sorted(tuple(r) for r in sparql_describe(
        triples, PFX + "DESCRIBE sem:Event").collect())
    assert got == sorted([
        ("e:ev1", "rdf:type", "sem:Event", False),
        ("e:ev2", "rdf:type", "sem:Event", False),
    ])


def test_describe_mixed_terms_and_errors(triples):
    from pikes_spark.operators.kgquery import SparqlError, sparql_describe
    # explicit IRI + var in one DESCRIBE
    got = sorted(tuple(r) for r in sparql_describe(triples, PFX + """
        DESCRIBE e:carol ?p WHERE { ?p rdf:type nwr:PERSON .
                                    ?p foaf:name "Bob" . }""").collect())
    assert got == sorted([
        ("e:ev3", "sem:hasActor", "e:carol", False),
        ("e:bob", "foaf:name", "Bob", True),
        ("e:bob", "rdf:type", "nwr:PERSON", False),
        ("e:ev2", "sem:hasActor", "e:bob", False),
    ])
    with pytest.raises(SparqlError):
        sparql_describe(triples, PFX + "DESCRIBE ?x")  # var, no WHERE
    with pytest.raises(SparqlError):
        sparql_describe(triples, "DESCRIBE")


def test_describe_matches_duckdb_oracle(spark):
    import duckdb
    from pikes_spark.operators.kgquery import (
        REL_DESCRIBE, SPARQL_DESCRIBE_SQL, rel_triples, sparql_describe)
    sf = "/root/testdata/sf0.001"
    t = rel_triples(spark, sf)
    got = sorted(tuple(r) for r in
                 sparql_describe(t, REL_DESCRIBE).collect())
    con = duckdb.connect()
    for tbl in ("customer", "nation", "region"):
        con.sql(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf}/{tbl}.parquet'")
    exp = sorted(tuple(r) for r in con.sql(SPARQL_DESCRIBE_SQL).fetchall())
    assert got == exp and len(got) > 10


def test_numeric_and_hash_builtins(triples):
    rows = q(triples, """SELECT ?s ?r ?c ?f WHERE {
        ?s foaf:name ?n .
        BIND (STRLEN(?n) / 2 AS ?half)
        BIND (ROUND(?half) AS ?r) BIND (CEIL(?half) AS ?c)
        BIND (FLOOR(?half) AS ?f)
    } ORDER BY ?s""")
    # Alice: 5/2=2.5 -> round 3 (HALF_UP), ceil 3, floor 2; Bob: 1.5->2,2,1
    assert rows == [("e:alice", 3.0, 3, 2), ("e:bob", 2.0, 2, 1)]
    import hashlib
    rows = q(triples, """SELECT ?n ?h WHERE {
        ?s foaf:name ?n . BIND (MD5(?n) AS ?h)
    } ORDER BY ?n""")
    assert rows == [(n, hashlib.md5(n.encode()).hexdigest())
                    for n in ("Alice", "Bob")]


def test_encode_for_uri(triples):
    rows = q(triples, """SELECT ?e WHERE {
        e:x p:val ?v . BIND (ENCODE_FOR_URI(CONCAT(?v, " 1/2&")) AS ?e)
    }""")
    assert rows == [("sem%3AEvent%201%2F2%26",)]
