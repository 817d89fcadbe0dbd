"""Gold-graph eval harness: calibration against the published numbers
and floors for this repo's pipeline (pure Python, no Spark session)."""

import pytest

from pikes_spark.eval.reference_data import (load_gold_graphs,
                                             load_pikes_graphs,
                                             load_report_markers,
                                             apply_markers)
from pikes_spark.eval.evaluate import evaluate, align
from pikes_spark.eval.spark_system import build_spark_graphs


@pytest.fixture(scope="module")
def calibrated():
    gold = load_gold_graphs()
    pikes = load_pikes_graphs()
    mappings = {s: align(gold[s], pikes[s]) for s in gold}
    apply_markers(gold, load_report_markers(mappings))
    return gold, pikes


@pytest.fixture(scope="module")
def pikes_totals(calibrated):
    gold, pikes = calibrated
    return evaluate(gold, pikes)


# components the harness reproduces EXACTLY from eval-pm.md "latest"
EXACT = {
    "instances": (147, 13, 6),
    "linking": (14, 6, 4),
    "types_vn": (24, 10, 20),
    "types_pb": (37, 7, 16),
    "roles_vn": (47, 15, 47),
    "roles_fn": (47, 32, 61),
    "sameas": (6, 1, 9),
}

# components within alignment-tie tolerance (Java hash-order ties)
CLOSE = {
    "types_fn": (38, 25, 15),
    "types_nb": (24, 7, 13),
    "roles_pb": (67, 15, 52),
    "roles_nb": (31, 18, 24),
    "edges": (134, 21, 37),
    "triples": (335, 136, 261),
}


@pytest.mark.parametrize("comp", sorted(EXACT))
def test_calibration_exact(pikes_totals, comp):
    tp, fp, fn = EXACT[comp]
    pr = pikes_totals[comp]
    assert (pr.tp, pr.fp, pr.fn) == (tp, fp, fn)


@pytest.mark.parametrize("comp", sorted(CLOSE))
def test_calibration_close(pikes_totals, comp):
    tp, fp, fn = CLOSE[comp]
    pr = pikes_totals[comp]
    assert abs(pr.tp - tp) <= 4 and abs(pr.fp - fp) <= 4 and abs(pr.fn - fn) <= 4


def test_gold_counts_match_published(pikes_totals):
    # gold item counts are alignment-independent -> must be exact
    published_gold = {"instances": 153, "triples": 596, "linking": 18,
                      "types_vn": 44, "types_fn": 53, "types_pb": 53,
                      "types_nb": 37, "roles_vn": 94, "roles_fn": 108,
                      "roles_pb": 119, "roles_nb": 55, "sameas": 15,
                      "edges": 171}
    for comp, n in published_gold.items():
        pr = pikes_totals[comp]
        assert pr.tp + pr.fn == n, comp


@pytest.fixture(scope="module")
def spark_scores(calibrated):
    gold, pikes = calibrated
    spark = build_spark_graphs()
    return evaluate(gold, spark), evaluate(pikes, spark)


# floors for THIS repo's pipeline — raise as components improve;
# a drop below any floor = regression in the distillation core
# (current: instances .984, triples .980, edges .985, sameas 1.0,
#  types .96-1.0, roles .95-.99; the reference's own output scores
#  instances .94, triples .64, edges .82, sameas .55)
SPARK_GOLD_FLOORS = {"instances": 0.96, "linking": 0.90, "edges": 0.95,
                     "triples": 0.95, "types_nb": 0.96, "types_fn": 0.94,
                     "types_vn": 0.96, "types_pb": 0.96, "roles_nb": 0.92,
                     "roles_vn": 0.95, "roles_pb": 0.95, "roles_fn": 0.94,
                     "sameas": 0.95}


@pytest.mark.parametrize("comp", sorted(SPARK_GOLD_FLOORS))
def test_spark_vs_gold_floor(spark_scores, comp):
    vs_gold, _ = spark_scores
    assert vs_gold[comp].f1 >= SPARK_GOLD_FLOORS[comp], \
        f"{comp} f1={vs_gold[comp].f1:.3f}"


def test_spark_vs_reference_instances(spark_scores):
    _, vs_ref = spark_scores
    assert vs_ref["instances"].precision >= 0.90
    assert vs_ref["instances"].f1 >= 0.80


# Floors for the literal north-rule comparison: this engine aligned
# against the reference's OWN emitted graphs
# (src/site/resources/eval-pm/pikes/pikes.{1..8}.ttl) — reference-team-
# produced data, no authorship conflict. Triple-level output parity is
# structurally capped near ~.6 because the two systems err against
# gold in DIFFERENT places (this repo far less: gold triples F1 .99 vs
# the reference's .64), so these floors guard against regression, not
# assert near-1.0 (see EVAL.md "Reading").
SPARK_VS_REFERENCE_FLOORS = {"instances": 0.90, "triples": 0.55,
                             "linking": 0.70, "edges": 0.70,
                             "types_pb": 0.65, "roles_pb": 0.60}


@pytest.mark.parametrize("comp", sorted(SPARK_VS_REFERENCE_FLOORS))
def test_spark_vs_reference_emissions_floor(spark_scores, comp):
    _, vs_ref = spark_scores
    assert vs_ref[comp].f1 >= SPARK_VS_REFERENCE_FLOORS[comp], \
        f"{comp} f1 vs reference emissions = {vs_ref[comp].f1:.3f}"
