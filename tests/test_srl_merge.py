"""F9 srlPreprocess merge tests (NAFFilter.java:985-1107 semantics)."""

from pikes_spark.functions.deptree import DepGraph
from pikes_spark.functions.srl_merge import merge_srl_sources


def _g():
    return DepGraph([(0, 1, "SUB"), (0, 2, "OBJ")])


def _mate(fn=None):
    refs = [{"resource": "PropBank", "reference": "meet.01"}]
    if fn:
        refs.append({"resource": "FrameNet", "reference": fn})
    return {"id": "pr1", "source": "mate", "term_ids": [0], "head_id": 0,
            "refs": refs,
            "roles": [{"sem_role": "A0", "term_ids": [1],
                       "refs": [{"resource": "PropBank", "reference": "meet.01@0"}]}]}


def _semafor(fn="Come_together"):
    return {"id": "f_pr1", "source": "semafor", "term_ids": [0], "head_id": 0,
            "refs": [{"resource": "FrameNet", "reference": fn}],
            "roles": [
                {"sem_role": "", "term_ids": [1],
                 "refs": [{"resource": "FrameNet", "reference": f"{fn}@Party_1"}]},
                {"sem_role": "", "term_ids": [2],
                 "refs": [{"resource": "FrameNet", "reference": f"{fn}@Party_2"}]},
            ]}


def test_same_head_merges_into_mate():
    out = merge_srl_sources([_mate(), _semafor()], _g())
    assert len(out) == 1
    p = out[0]
    assert p["source"] == "mate"
    assert any(r["resource"] == "FrameNet" for r in p["refs"])
    # equal-span role (term 1) merged refs; new role (term 2) appended
    assert len(p["roles"]) == 2
    a0 = next(r for r in p["roles"] if r["term_ids"] == [1])
    assert any((rr.get("resource") or "") == "FrameNet" for rr in a0["refs"])


def test_disagreeing_frames_drop_fn_data():
    out = merge_srl_sources([_mate(fn="Hostile_encounter"), _semafor()], _g())
    p = out[0]
    fn_refs = [r["reference"] for r in p["refs"] if r["resource"] == "FrameNet"]
    assert fn_refs == ["Hostile_encounter"]  # semafor frame not merged
    appended = next(r for r in p["roles"] if r["term_ids"] == [2])
    assert not any((rr.get("resource") or "").lower() == "framenet"
                   for rr in appended.get("refs") or [])


def test_tool_disable_and_headless_drop():
    preds = [_mate(), _semafor(),
             {"id": "prX", "source": "mate", "term_ids": [1, 2], "head_id": None,
              "refs": [], "roles": []}]  # span {1,2} has two roots -> no head
    out = merge_srl_sources(preds, _g(), enable_semafor=False)
    assert len(out) == 1 and out[0]["source"] == "mate"
    out2 = merge_srl_sources(preds, _g(), enable_mate=False)
    assert len(out2) == 1 and out2[0]["source"] == "semafor"


def test_semafor_only_survives():
    out = merge_srl_sources([_semafor()], _g())
    assert len(out) == 1 and out[0]["source"] == "semafor"


def test_f10_removes_wrong_rolesets():
    from pikes_spark.functions.nlp import srl_remove_wrong_refs
    from pikes_spark.functions.tokenize import Tagged
    tags = [Tagged("VBD", "V", "give"), Tagged("NN", "N", "donor")]
    preds = [
        {"head_id": 0, "term_ids": [0], "roles": [], "refs": [
            {"resource": "PropBank", "reference": "give.01", "source": "mate"},
            {"resource": "PropBank", "reference": "take.01", "source": "mate"},
        ]},
        {"head_id": 1, "term_ids": [1], "roles": [], "refs": [
            {"resource": "NomBank", "reference": "donor.01", "source": "mate"},
            # source-verb PropBank ref is NOT checked for a nominal head
            {"resource": "PropBank", "reference": "donate.01", "source": "pm"},
        ]},
    ]
    out = srl_remove_wrong_refs(preds, tags)
    refs0 = [r["reference"] for r in out[0]["refs"]]
    assert refs0 == ["give.01"]  # take.01 lemma-mismatch removed
    refs1 = [r["reference"] for r in out[1]["refs"]]
    assert "donate.01" in refs1 and "donor.01" in refs1


def test_f10_sense_check():
    from pikes_spark.functions.nlp import srl_remove_wrong_refs
    from pikes_spark.functions.tokenize import Tagged
    tags = [Tagged("VBD", "V", "run")]
    preds = [{"head_id": 0, "term_ids": [0], "roles": [], "refs": [
        {"resource": "PropBank", "reference": "run.05", "source": "mate"},
        {"resource": "PropBank", "reference": "run.01", "source": None},
    ]}]
    out = srl_remove_wrong_refs(preds, tags)
    # first SOURCED sense (05) wins; run.01 dropped
    assert [r["reference"] for r in out[0]["refs"]] == ["run.05"]


def test_semafor_source_merges_end_to_end():
    from pikes_spark.functions.nlp import annotate_document
    doc = annotate_document("The fighters storm fortified positions.")
    storm = [p for p in doc["predicates"]
             if any(r["reference"] == "storm.02" for r in p["refs"] or [])]
    assert storm
    # the semafor FrameNet frame merged into the mate predicate
    fns = [r["reference"] for r in storm[0]["refs"]
           if (r["resource"] or "").lower() == "framenet"]
    assert "Attack" in fns
    # semafor-only predicate survives on 'positions'
    pos = [p for p in doc["predicates"]
           if (p.get("source") or "") == "semafor"
           and any(r["reference"] == "Locale_by_collocation"
                   for r in p["refs"] or [])]
    assert pos
