"""F13 srlSelfArgFixing (NAFFilter.java:1246-1308) — the named pytest
the round-4 verdict asked for: assert (a) a mandatory self-arg is
ADDED when the SRL missed it, (b) an INVALID self-role (argnum outside
the roleset's mandatory∪optional lists, or a non-``A<digit>`` label on
the predicate head) is REMOVED, and (c) the filter is a no-op on this
engine's own pipeline output (the nominal generator already honors
the NomBank contract)."""

from pikes_spark.functions.deptree import DepGraph
from pikes_spark.functions.nlp import (annotate_document,
                                       srl_self_arg_fixing)
from pikes_spark.functions.resource_loaders import nombank_index
from pikes_spark.functions.tokenize import Tagged


def _pred(head, roles, roleset="teacher.01"):
    return {
        "head_id": head,
        "term_ids": [head],
        "refs": [{"resource": "NomBank", "reference": roleset,
                  "source": "mate"}],
        "roles": [dict(r) for r in roles],
    }


# one 3-token 'sentence': teacher(0) heads of(1) heads math(2)
_TAGS = [Tagged("NN", "N", "teacher"), Tagged("IN", "P", "of"),
         Tagged("NN", "N", "math")]
_GRAPH = DepGraph([(0, 1, "NMOD"), (1, 2, "PMOD")])


def test_f13_adds_missing_mandatory_self_arg():
    # teacher.01: mandatory [0], optional [2] (fixture NomBank TSV)
    rs = nombank_index().roleset("teacher.01")
    assert rs.mandatory_args == [0] and rs.optional_args == [2]
    pred = _pred(0, roles=[])  # SRL missed the self-arg entirely
    out = srl_self_arg_fixing([pred], _TAGS, _GRAPH)
    roles = out[0]["roles"]
    assert len(roles) == 1
    assert roles[0]["sem_role"] == "A0"
    assert roles[0]["head_id"] == 0
    # span = dep descendants of the predicate head (NAFFilter:1296-1299)
    assert roles[0]["term_ids"] == [0, 1, 2]


def test_f13_removes_invalid_numbered_self_role():
    # A1 is neither mandatory nor optional for teacher.01 -> removed;
    # the reference still records currentNum=1 from the removed role,
    # so the mandatory A0 (!= 1) is then added (NAFFilter:1276-1296)
    pred = _pred(0, roles=[{"sem_role": "A1", "term_ids": [0],
                            "head_id": 0, "refs": []}])
    out = srl_self_arg_fixing([pred], _TAGS, _GRAPH)
    sem = sorted(r["sem_role"] for r in out[0]["roles"])
    assert sem == ["A0"]


def test_f13_removes_non_numbered_self_role():
    # SRL_ROLE_PATTERN is A(\d).* — an AM-TMP self-role never matches,
    # so it is invalid and removed; A0 is added
    pred = _pred(0, roles=[{"sem_role": "AM-TMP", "term_ids": [0],
                            "head_id": 0, "refs": []}])
    out = srl_self_arg_fixing([pred], _TAGS, _GRAPH)
    sem = sorted(r["sem_role"] for r in out[0]["roles"])
    assert sem == ["A0"]


def test_f13_keeps_valid_optional_and_adds_mandatory():
    # a valid OPTIONAL self-role (A2) is kept; currentNum=2 != 0 so
    # the mandatory A0 is still added
    pred = _pred(0, roles=[{"sem_role": "A2", "term_ids": [0],
                            "head_id": 0, "refs": []}])
    out = srl_self_arg_fixing([pred], _TAGS, _GRAPH)
    sem = sorted(r["sem_role"] for r in out[0]["roles"])
    assert sem == ["A0", "A2"]


def test_f13_keeps_valid_mandatory_self_role_unchanged():
    pred = _pred(0, roles=[{"sem_role": "A0", "term_ids": [0],
                            "head_id": 0, "refs": []}])
    out = srl_self_arg_fixing([pred], _TAGS, _GRAPH)
    assert out[0]["roles"] == pred["roles"]


def test_f13_skips_verbs_and_unknown_rolesets():
    vtags = [Tagged("VBD", "V", "teach")]
    vpred = _pred(0, roles=[{"sem_role": "A9", "term_ids": [0],
                             "head_id": 0, "refs": []}],
                  roleset="teach.01")
    out = srl_self_arg_fixing([vpred], vtags, DepGraph([]))
    assert out[0]["roles"] == vpred["roles"]  # verbs untouched
    upred = _pred(0, roles=[{"sem_role": "A9", "term_ids": [0],
                             "head_id": 0, "refs": []}],
                  roleset="zzznotaroleset.99")
    out = srl_self_arg_fixing([upred], _TAGS, _GRAPH)
    assert out[0]["roles"] == upred["roles"]  # unknown roleset skipped


def test_f13_non_self_roles_pass_through():
    # a role headed elsewhere is untouched even with an invalid label
    pred = _pred(0, roles=[{"sem_role": "A7", "term_ids": [2],
                            "head_id": 2, "refs": []}])
    out = srl_self_arg_fixing([pred], _TAGS, _GRAPH)
    sem = sorted(r["sem_role"] for r in out[0]["roles"])
    assert sem == ["A0", "A7"]
    assert any(r["head_id"] == 2 and r["sem_role"] == "A7"
               for r in out[0]["roles"])


def test_f13_noop_on_own_pipeline_output():
    """The generator already emits mandatory self-args, so running the
    filter a SECOND time over real pipeline annotations changes
    nothing — the wired-in pass is a contract check, not a rewrite."""
    doc = annotate_document(
        "The supporters of the government opposed the sanctions.")
    preds = doc["predicates"]
    tags = [Tagged(t["morphofeat"], t["pos"], t["lemma"])
            for t in doc["terms"]]
    graph = DepGraph([(d["from"], d["to"], d["rfunc"])
                      for d in doc["deps"]])
    again = srl_self_arg_fixing(preds, tags, graph)
    assert again == preds
    # and the mandatory self-arg is really present end-to-end
    sup = next(p for p in preds
               if tags[p["head_id"]].lemma == "supporter")
    assert any(r["sem_role"] == "A0" and r.get("head_id") == sup["head_id"]
               for r in sup["roles"])
