"""F19/D8 opinion extraction — the pikes-raid counterpart.

The reference extracts opinions (expression span + prior polarity +
holder + target) with pikes-raid, a trained CRF/SVM stack over
MPQA-style data (pikes-raid/src/main/java/eu/fbk/dkm/pikes/raid/
Extractor.java), reading prior polarities from the MPQA subjectivity
clues via SubjectivityLexicon.java:44-118. The extractor itself is a
trained model we do not ship; this module rebuilds the TASK as
deterministic dependency rules over the same lexicon resource:

- the lexicon PARSER implements the real MPQA clues line format
  (``type=strongsubj word1=... pos1=... stemmed1=... priorpolarity=...``,
  pos mapped adj->G adverb->A noun->N verb->V exactly like
  SubjectivityLexicon.index), with the repo's standard breadth
  layering: curated fixture below ∪ ``$PIKES_SUBJ_LEXICON`` file;
- expression = the subjective head term plus its subjective/intensifier
  modifiers; polarity = prior polarity, flipped under negation
  (Opinion.Polarity.forLabel's pos/neg normalization);
- holder = the SUB of an experiencer verb, else the SUB of the nearest
  governing speech verb (the raid holder convention: opinion sources
  are speech/psych subjects);
- target = OBJ/PRD of a verbal expression, the modified noun of an
  attributive adjective, the copular subject of a predicative one, the
  of-PP complement of a nominal one.

Like F17/F18 and conn edges, D8 emission is OFF by default — the
reference's default triple pipeline runs without raid, so an opinions
layer never reaches its RDFGenerator; operators/distill.py gates the
emission behind ``ENABLE_OPINIONS`` / ``emit_opinions=True`` with the
same reference-default reasoning.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

from .deptree import DepGraph

# curated fixture, in the REAL MPQA clues line format so the parser is
# exercised by default (subset of the public subjectivity lexicon)
FIXTURE_LEXICON = """\
type=strongsubj word1=success pos1=noun stemmed1=n priorpolarity=positive
type=weaksubj word1=hope pos1=verb stemmed1=y priorpolarity=positive
type=weaksubj word1=hope pos1=noun stemmed1=n priorpolarity=positive
type=weaksubj word1=favor pos1=noun stemmed1=n priorpolarity=positive
type=strongsubj word1=love pos1=verb stemmed1=y priorpolarity=positive
type=strongsubj word1=praise pos1=verb stemmed1=y priorpolarity=positive
type=weaksubj word1=support pos1=verb stemmed1=y priorpolarity=positive
type=weaksubj word1=supporter pos1=noun stemmed1=n priorpolarity=positive
type=strongsubj word1=good pos1=adj stemmed1=n priorpolarity=positive
type=strongsubj word1=great pos1=adj stemmed1=n priorpolarity=positive
type=strongsubj word1=excellent pos1=adj stemmed1=n priorpolarity=positive
type=weaksubj word1=simple pos1=adj stemmed1=n priorpolarity=positive
type=weaksubj word1=veteran pos1=adj stemmed1=n priorpolarity=positive
type=strongsubj word1=happy pos1=adj stemmed1=n priorpolarity=positive
type=strongsubj word1=welcome pos1=verb stemmed1=y priorpolarity=positive
type=strongsubj word1=threat pos1=noun stemmed1=n priorpolarity=negative
type=strongsubj word1=fear pos1=verb stemmed1=y priorpolarity=negative
type=strongsubj word1=fear pos1=noun stemmed1=n priorpolarity=negative
type=strongsubj word1=hate pos1=verb stemmed1=y priorpolarity=negative
type=strongsubj word1=oppose pos1=verb stemmed1=y priorpolarity=negative
type=weaksubj word1=opposition pos1=noun stemmed1=n priorpolarity=negative
type=strongsubj word1=attack pos1=verb stemmed1=y priorpolarity=negative
type=strongsubj word1=attack pos1=noun stemmed1=n priorpolarity=negative
type=strongsubj word1=bad pos1=adj stemmed1=n priorpolarity=negative
type=strongsubj word1=terrible pos1=adj stemmed1=n priorpolarity=negative
type=strongsubj word1=awful pos1=adj stemmed1=n priorpolarity=negative
type=weaksubj word1=slow pos1=adj stemmed1=n priorpolarity=negative
type=weaksubj word1=worry pos1=verb stemmed1=y priorpolarity=negative
type=weaksubj word1=concern pos1=noun stemmed1=n priorpolarity=negative
type=strongsubj word1=condemn pos1=verb stemmed1=y priorpolarity=negative
type=strongsubj word1=criticize pos1=verb stemmed1=y priorpolarity=negative
type=weaksubj word1=insurgent pos1=noun stemmed1=n priorpolarity=negative
type=weaksubj word1=sanction pos1=noun stemmed1=n priorpolarity=negative
type=strongsubj word1=destroy pos1=verb stemmed1=y priorpolarity=negative
type=weaksubj word1=injure pos1=verb stemmed1=y priorpolarity=negative
type=weaksubj word1=isolate pos1=verb stemmed1=y priorpolarity=negative
type=weaksubj word1=wrong pos1=adj stemmed1=n priorpolarity=negative
type=strongsubj word1=fast pos1=adj stemmed1=n priorpolarity=positive
"""

_POS_MAP = {"adj": "G", "adverb": "A", "noun": "N", "verb": "V",
            "anypos": None}

NEGATORS = {"not", "n't", "never", "no"}
INTENSIFIERS = {"very", "too", "so", "really", "extremely", "quite",
                "highly", "deeply"}
SPEECH_VERBS = {"say", "claim", "argue", "believe", "warn", "insist",
                "note", "add", "report", "state", "declare", "think"}
EXPERIENCER_VERBS = {"fear", "hope", "love", "hate", "support", "oppose",
                     "worry", "welcome", "condemn", "praise", "criticize",
                     "like", "dislike", "favor"}


def parse_subjectivity_lexicon(text: str) -> Dict[Tuple[str, Optional[str]],
                                                  Tuple[str, bool]]:
    """MPQA clues format -> {(word, pos|None): (polarity, strong)}.
    Mirrors SubjectivityLexicon.index: key=value tokens, pos mapping,
    'weakneg' normalized to negative; 'stemmed1=y' entries are keyed by
    the raw word (this engine matches on lemma, which equals the MPQA
    stem for the regular inflections the rule lemmatizer produces)."""
    lex: Dict[Tuple[str, Optional[str]], Tuple[str, bool]] = {}
    for line in text.splitlines():
        word = pos = polarity = None
        strong = False
        for token in line.split():
            if "=" not in token:
                continue
            key, value = token.split("=", 1)
            if key == "type":
                strong = "strong" in value.lower()
            elif key == "word1":
                word = value
            elif key == "pos1":
                pos = _POS_MAP.get(value.lower())
            elif key == "priorpolarity":
                v = value.lower()
                polarity = ("negative" if v == "weakneg"
                            else v if v in ("positive", "negative", "neutral")
                            else None)
        if word and polarity:
            lex[(word.lower(), pos)] = (polarity, strong)
    return lex


_LEX_CACHE: Optional[dict] = None


def subjectivity_lexicon() -> dict:
    """Fixture ∪ $PIKES_SUBJ_LEXICON breadth layer (same layering as
    the other resource loaders)."""
    global _LEX_CACHE
    if _LEX_CACHE is None:
        lex = parse_subjectivity_lexicon(FIXTURE_LEXICON)
        path = os.environ.get("PIKES_SUBJ_LEXICON")
        if path and os.path.exists(path):
            with open(path, encoding="utf-8") as fh:
                lex.update(parse_subjectivity_lexicon(fh.read()))
        _LEX_CACHE = lex
    return _LEX_CACHE


def reset_lexicon_cache() -> None:
    global _LEX_CACHE
    _LEX_CACHE = None


def _lookup(lex: dict, lemma: str, pos: str):
    return lex.get((lemma.lower(), pos)) or lex.get((lemma.lower(), None))


def _child(graph: DepGraph, i: int, *labels: str) -> Optional[int]:
    for c, lab in sorted(graph.children.get(i, [])):
        if lab in labels:
            return c
    return None


def _pp_object(graph: DepGraph, tokens: List[dict], i: int,
               preps: Tuple[str, ...]) -> Optional[int]:
    for c, lab in sorted(graph.children.get(i, [])):
        if lab == "NMOD" and tokens[c]["form"].lower() in preps:
            pm = _child(graph, c, "PMOD")
            if pm is not None:
                return pm
    return None


def extract_opinions(tokens: List[dict], terms: List[dict],
                     graph: DepGraph) -> List[dict]:
    """token/term dict layers (ANNOTATIONS_SCHEMA shapes) -> opinions:
    {id, head_id, expression_ids, polarity, strength, holder_ids,
    target_ids}. Deterministic: terms scanned in order, one opinion per
    subjective head not already inside an earlier expression span."""
    lex = subjectivity_lexicon()
    n = len(terms)
    opinions: List[dict] = []
    used: set = set()
    for i in range(n):
        if i in used:
            continue
        t = terms[i]
        hit = _lookup(lex, t["lemma"], t["pos"])
        if hit is None:
            continue
        polarity, strong = hit
        # expression span: head + subjective/intensifier modifiers
        span = [i]
        for c, lab in graph.children.get(i, []):
            if lab in ("AMOD", "ADV", "NMOD"):
                cf = tokens[c]["form"].lower()
                if cf in INTENSIFIERS or _lookup(lex, terms[c]["lemma"],
                                                 terms[c]["pos"]):
                    span.append(c)
        span = sorted(span)
        used.update(span)
        # negation flip (Polarity pos<->neg; neutral stays)
        negated = any(tokens[c]["form"].lower() in NEGATORS
                      for c, _ in graph.children.get(i, []))
        par = graph.parent.get(i)
        if not negated and par is not None and terms[par[0]]["pos"] == "V":
            negated = any(tokens[c]["form"].lower() in NEGATORS
                          for c, _ in graph.children.get(par[0], []))
        if negated and polarity in ("positive", "negative"):
            polarity = "negative" if polarity == "positive" else "positive"

        holder: Optional[int] = None
        target: Optional[int] = None
        pos = t["pos"]
        if pos == "V":
            if t["lemma"].lower() in EXPERIENCER_VERBS:
                holder = _child(graph, i, "SUB")
            target = _child(graph, i, "OBJ") or _child(graph, i, "PRD") \
                or _pp_object(graph, tokens, i,
                              ("of", "at", "against", "about"))
        elif pos == "G":
            if par is not None and par[1] == "NMOD":
                target = par[0]  # attributive: the modified noun
            elif par is not None and terms[par[0]]["lemma"] == "be":
                target = _child(graph, par[0], "SUB")  # predicative
        elif pos == "N":
            target = _pp_object(graph, tokens, i, ("of", "against",
                                                   "about", "to"))
        # speech-verb holder: nearest governing speech verb's subject
        if holder is None:
            k = i
            seen = {i}
            while True:
                p = graph.parent.get(k)
                if p is None or p[0] in seen:
                    break
                k = p[0]
                seen.add(k)
                if terms[k]["pos"] == "V" \
                        and terms[k]["lemma"].lower() in SPEECH_VERBS:
                    sub = _child(graph, k, "SUB")
                    if sub is not None and i not in graph.descendants([sub]):
                        holder = sub
                    break

        def _span_of(h: Optional[int]) -> List[int]:
            if h is None:
                return []
            sent = tokens[i]["sent"]
            return sorted(d for d in graph.descendants([h])
                          if tokens[d]["sent"] == sent)

        opinions.append({
            "id": f"o{len(opinions) + 1}",
            "head_id": i,
            "expression_ids": span,
            "polarity": polarity,
            "strength": "strong" if strong else "weak",
            "holder_ids": _span_of(holder),
            "target_ids": _span_of(target),
        })
    return opinions
