"""Unit tests for the dep-path regex engine (semantics of
KAFDocument.java:1886-2112, RDFGenerator.java:106-110)."""

from pikes_spark.functions.deptree import (
    DepGraph, compile_dep_pattern, dep_path_string, match_dep_path)
from pikes_spark.operators.distill import MODIFIER_REGEX, PARTICIPATION_REGEX


def test_path_string_direction():
    # 0 -NMOD-> 1 ; walking 1 -> 0 goes against the edge: '-'
    deps = [(0, 1, "NMOD")]
    assert dep_path_string(0, deps) == "_+%s_" % _c("nmod")
    assert dep_path_string(1, deps) == "_-%s_" % _c("nmod")


def _c(label):
    from pikes_spark.functions.deptree import _dep_path_char
    return _dep_path_char(label)


def test_multi_label_edge_splits():
    # "NMOD-TMP" emits two chars with same prefix (KAFDocument.java:1918)
    s = dep_path_string(0, [(0, 1, "NMOD-TMP")])
    assert s == "_+%s+%s_" % (_c("nmod"), _c("tmp"))


def test_simple_match():
    assert match_dep_path(0, [(0, 1, "NMOD")], "NMOD")
    assert not match_dep_path(0, [(0, 1, "AMOD")], "NMOD")
    assert match_dep_path(0, [(0, 1, "AMOD")], "(NMOD|AMOD)")


def test_kleene_patterns():
    # (COORD CONJ?)* matches empty path and COORD CONJ chains
    assert match_dep_path(0, [], "(COORD CONJ?)*")
    path = [(0, 1, "COORD"), (1, 2, "CONJ")]
    assert match_dep_path(0, path, "(COORD CONJ?)*")
    assert match_dep_path(0, [(0, 1, "COORD")], "(COORD CONJ?)*")
    assert not match_dep_path(0, [(0, 1, "CONJ")], "(COORD CONJ?)*")


def test_inverse_label():
    # leading '-' in the pattern requires traversal against the edge
    assert match_dep_path(1, [(0, 1, "VC")], "-VC")
    assert not match_dep_path(0, [(0, 1, "VC")], "-VC")
    assert match_dep_path(0, [(0, 1, "VC")], "VC")


def test_modifier_regex_semantics():
    # NMOD PMOD chain: supporters -NMOD-> of -PMOD-> fight
    path = [(0, 1, "NMOD"), (1, 2, "PMOD")]
    assert match_dep_path(0, path, MODIFIER_REGEX)
    # AMOD alone
    assert match_dep_path(0, [(0, 1, "AMOD")], MODIFIER_REGEX)
    # SUB does not match
    assert not match_dep_path(0, [(0, 1, "SUB")], MODIFIER_REGEX)


def test_participation_regex_semantics():
    # pred -SUB-> subj
    assert match_dep_path(0, [(0, 1, "SUB")], PARTICIPATION_REGEX)
    # empty (role head == arg head)
    assert match_dep_path(0, [], PARTICIPATION_REGEX)
    # coordination expansion: SUB COORD CONJ
    path = [(0, 1, "SUB"), (1, 2, "COORD"), (2, 3, "CONJ")]
    assert match_dep_path(0, path, PARTICIPATION_REGEX)
    # PMOD hop
    assert match_dep_path(0, [(0, 1, "PMOD")], PARTICIPATION_REGEX)
    # NMOD does not participate
    assert not match_dep_path(0, [(0, 1, "NMOD")], PARTICIPATION_REGEX)


def test_head_of_span():
    #      2
    #     / \
    #    0   3
    #    |
    #    1
    g = DepGraph([(2, 0, "SUB"), (2, 3, "OBJ"), (0, 1, "NMOD")])
    assert g.head_of_span([0, 1]) == 0
    assert g.head_of_span([0, 1, 2, 3]) == 2
    assert g.head_of_span([1, 3]) is None  # two roots -> null (KAFDocument.java:2038-2041)
    assert g.head_of_span([2]) == 2


def test_descendants_ancestors():
    g = DepGraph([(2, 0, "SUB"), (2, 3, "OBJ"), (0, 1, "NMOD")])
    assert g.descendants([2]) == {0, 1, 2, 3}
    assert g.descendants([0]) == {0, 1}
    assert g.ancestors([1]) == {1, 0, 2}


def test_undirected_path():
    g = DepGraph([(2, 0, "SUB"), (2, 3, "OBJ"), (0, 1, "NMOD")])
    # 1 up to 0 up to 2 down to 3
    path = g.path(1, 3)
    assert path == [(0, 1, "NMOD"), (2, 0, "SUB"), (2, 3, "OBJ")]
    s = dep_path_string(1, path)
    assert s.startswith("_-")  # first hop goes against NMOD


def test_descendants_matching():
    # meet -SUB-> john -COORD-> and -CONJ-> mary
    g = DepGraph([(0, 1, "SUB"), (1, 2, "COORD"), (2, 3, "CONJ")])
    got = g.descendants_matching([1], "(COORD CONJ?)*")
    assert got == {1, 2, 3}
    got2 = g.descendants_matching([0], PARTICIPATION_REGEX)
    assert got2 == {0, 1, 2, 3}
