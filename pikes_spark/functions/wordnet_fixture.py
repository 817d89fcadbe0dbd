"""WordNet / SUMO / YAGO fixture resources (N4 WSD + F2 sense completion).

Reference semantics: UKB assigns a WordNet-3.0 synset per term
(AnnotationPipeline.java:260-263); NAFFilter.termSenseCompletion
(NAFFilter.java:388-496) cross-completes synset -> SUMO concept with a
hypernym climb until a mapped concept is found, and synset -> YAGO
IRI (Sumo.synsetsToConcepts, YagoTaxonomy.getDBpediaYagoIRIs);
RDFGenerator types predicates sem:Event + sumo:Process when the SUMO
concept is a Process subclass (RDFGenerator.java:1013-1024).

Here: a deterministic most-frequent-sense dictionary + tiny taxonomy
(FIXTURES.md §3) — broadcast tables at deployment.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

# lemma (nouns) -> most frequent sense synset id
MFS_NOUN: Dict[str, str] = {
    "supporter": "10677713-n", "fight": "00958896-n", "meeting": "08310389-n",
    "aid": "01207609-n", "president": "10467179-n", "dollar": "13407086-n",
    "group": "00031264-n", "rebel": "10519494-n", "agreement": "06770275-n",
    "war": "00973077-n", "city": "08524735-n", "country": "08544813-n",
    "weapon": "04565375-n", "fighter": "10088390-n", "donor": "10025730-n",
    "program": "05898568-n", "sanction": "01139104-n", "official": "10372373-n",
    # offset documented by the reference itself (example.md:21
    # `ks:synset wn30:10533013-n` for "competitors")
    "competitor": "10533013-n",
}
MFS_VERB: Dict[str, str] = {
    "meet": "02023107-v", "fight": "01090335-v", "support": "02556126-v",
    "result": "02635659-v", "visit": "02487573-v", "become": "02626604-v",
    "announce": "00965035-v", "sign": "01067816-v", "say": "00941990-v",
}

# synset -> hypernym chain (one parent each, fixture)
HYPERNYMS: Dict[str, List[str]] = {
    "10677713-n": ["09820263-n"],           # supporter -> person
    "10533013-n": ["09820263-n"],           # competitor/rival -> person
    "00958896-n": ["00952963-n"],           # fight -> conflict
    "00952963-n": ["00030358-n"],           # conflict -> act/process
    "08310389-n": ["07975026-n"],           # meeting -> social gathering
    "07975026-n": ["00031264-n"],           # gathering -> group
    "01207609-n": ["00030358-n"],           # aid -> act
    "10467179-n": ["09820263-n"],           # president -> person
    "13407086-n": ["13385913-n"],           # dollar -> money
    "10519494-n": ["09820263-n"],           # rebel -> person
    "10088390-n": ["09820263-n"],           # fighter -> person
    "10025730-n": ["09820263-n"],           # donor -> person
    "10372373-n": ["09820263-n"],           # official -> person
    "06770275-n": ["00030358-n"],           # agreement -> act
}

# synset -> (SUMO concept, is_process)  — only "upper" synsets mapped, so
# the hypernym climb is exercised
SUMO: Dict[str, Tuple[str, bool]] = {
    "09820263-n": ("Human", False),
    "00030358-n": ("Process", True),
    "00031264-n": ("Group", False),
    "13385913-n": ("CurrencyMeasure", False),
    "08524735-n": ("City", False),
    "08544813-n": ("Nation", False),
    "04565375-n": ("Weapon", False),
    "02023107-v": ("Meeting", True),
    "01090335-v": ("ViolentContest", True),
    "02556126-v": ("Supporting", True),
    "02635659-v": ("Process", True),
    "02487573-v": ("Motion", True),
    "00965035-v": ("Communication", True),
    "01067816-v": ("Writing", True),
    "00941990-v": ("Communication", True),
}

# synset -> YAGO DBpedia-class IRI localname
YAGO: Dict[str, str] = {
    "10677713-n": "Supporter110677713", "00958896-n": "Fight100958896",
    "08310389-n": "Meeting108310389", "10467179-n": "President110467179",
    "09820263-n": "Person100007846", "13407086-n": "Dollar113407086",
}

SUMO_NS = "http://www.ontologyportal.org/SUMO.owl#"
YAGO_NS = "http://dbpedia.org/class/yago/"


def most_frequent_sense(lemma: str, pos: str) -> Optional[str]:
    """N4 MFS lookup by KAF pos char: curated fixture rows first (they
    pin the gold-corpus senses), then the real WordNet index at full
    breadth when a dict dir is configured (wordnet_real.py — the same
    first-offset-in-index.<pos> semantics JWNL gives the reference,
    WordNet.java:159-167)."""
    if pos == "N" and lemma in MFS_NOUN:
        return MFS_NOUN[lemma]
    if pos == "V" and lemma in MFS_VERB:
        return MFS_VERB[lemma]
    from .wordnet_real import most_frequent_sense_real
    return most_frequent_sense_real(lemma, pos)


def synset_to_sumo(synset: str, max_climb: int = 8) -> Optional[Tuple[str, bool]]:
    """Hypernym climb until a SUMO-mapped synset (NAFFilter.java:450-478).
    Fixture rows first (curated for the gold corpus), then the real
    Sumo.tsv index at full breadth (4.5k concepts; Process-ness via
    the loaded concept hierarchy, Sumo.isSubClassOf semantics)."""
    seen = set()
    cur = synset
    for _ in range(max_climb):
        if cur in SUMO:
            return SUMO[cur]
        if cur in seen:
            break
        seen.add(cur)
        parents = HYPERNYMS.get(cur)
        if not parents:
            break
        cur = parents[0]
    from .resource_loaders import sumo_data
    sd = sumo_data()
    if sd is not None:
        concept = sd.synset_to_concept.get(synset)
        if concept:
            return (concept, sd.is_subclass_of(concept, "Process"))
    return None


def synset_to_yago(synset: str) -> Optional[str]:
    local = YAGO.get(synset)
    if local is None and len(synset) > 2 and synset[:8].isdigit():
        from .resource_loaders import yago_offsets
        yo = yago_offsets()
        if yo is not None:
            local = yo.get(int(synset[:8]))
    return YAGO_NS + local if local else None
