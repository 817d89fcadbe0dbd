"""Graph distillation: annotation layers -> RDF triples.

Per-document rule engine re-expressing the semantics of the
reference's two rule passes (SURVEY.md §2.3/§2.4):

NAFFilter (pikes-resources NAFFilter.java:248-333 fixed stage order):
  F1 termSenseFiltering     (:375-386)   — n/a (no sense refs in stub NLP)
  F3 entityRemoveOverlaps   (:536-568)   — drop contained / timex-overlap
  F4 entitySpanFixing       (:498-534)   — strip leading D/P + symbol terms
  F7 entityAddition         (:570-623)   — entity for bare nouns/pronouns
  F8 entityValueNormalization (:625-665) — spelled-number -> value ref

RDFGenerator.Extractor (pikes-rdf RDFGenerator.java:497-719 step order):
  D0 metadata       (:721-798)
  D1 timex          (:800-873)
  D2 entities       (:875-973) + attributes (:1520-1582)
  D3 predicates     (:975-1078) incl. copular be skip (:533-567)
  D5 modifiers      (:587-619, 1101-1149) via MODIFIER_REGEX (:106)
  D6 coref sameAs   (:1151-1259)
  D7 roles          (:1261-1391) via PARTICIPATION_REGEX (:109-110)
  D9 mentions       (:1584-1670) — NIF char-offset IRIs
  D11 fact graphs   (:1824-1857, 1966-2015) — murmur3 graph IRIs

Pure Python per document (documents are small); executed vectorized
over Arrow batches by operators.annotate / pipeline. Emits flat
triple rows: (url, subject, predicate, object, graph, sent,
mention_begin, mention_end, conf, component).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Set, Tuple

from ..functions.deptree import DepGraph
from ..functions.numbers import parse_spelled_number, ordinal_rank
from ..functions.hashing import fact_hash_key, murmur3_id, murmur3_ids_batch

# namespace table (RDFGenerator.java:128-144 DEFAULT_NAMESPACE_MAP)
NS = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "ks": "http://dkm.fbk.eu/ontologies/knowledgestore#",
    "nif": "http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#",
    "sem": "http://semanticweb.cs.vu.nl/2009/11/sem/",
    "nwr": "http://www.newsreader-project.eu/ontologies/",
    "gaf": "http://groundedannotationframework.org/gaf#",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "dct": "http://purl.org/dc/terms/",
    "gr": "http://purl.org/goodrelations/v1#",
    "propbank": "http://www.newsreader-project.eu/ontologies/propbank/",
    "nombank": "http://www.newsreader-project.eu/ontologies/nombank/",
    "verbnet": "http://www.newsreader-project.eu/ontologies/verbnet/",
    "framenet": "http://www.newsreader-project.eu/ontologies/framenet/",
    "eso": "http://www.newsreader-project.eu/domain-ontology#",
    "framebase": "http://framebase.org/ns/",
    "entity": "entity:",
    "attribute": "attr:",
    "owltime": "http://www.newsreader-project.eu/time/",
}

RDF_TYPE = NS["rdf"] + "type"
RDFS_LABEL = NS["rdfs"] + "label"
OWL_SAMEAS = NS["owl"] + "sameAs"
KS_ENTITY = NS["ks"] + "Entity"
KS_TIME = NS["ks"] + "Time"
KS_ATTRIBUTE = NS["ks"] + "Attribute"
KS_MOD = NS["ks"] + "mod"
KS_QUANTITY = NS["ks"] + "quantity"
KS_RANK = NS["ks"] + "rank"
KS_PERCENTAGE = NS["ks"] + "percentage"
KS_EXPRESSED_BY = NS["ks"] + "expressedBy"
KS_MENTION_OF = NS["ks"] + "mentionOf"
KS_HAS_MENTION = NS["ks"] + "hasMention"
KS_MENTION = NS["ks"] + "Mention"
KS_INCLUDE = NS["ks"] + "include"
GAF_DENOTED_BY = NS["gaf"] + "denotedBy"
FOAF_NAME = NS["foaf"] + "name"
SEM_EVENT = NS["sem"] + "Event"
SEM_HAS_ACTOR = NS["sem"] + "hasActor"
SEM_HAS_TIME = NS["sem"] + "hasTime"
SEM_HAS_PLACE = NS["sem"] + "hasPlace"
NIF_BEGIN = NS["nif"] + "beginIndex"
NIF_END = NS["nif"] + "endIndex"
NIF_ANCHOR = NS["nif"] + "anchorOf"

# DEFAULT_TYPE_MAP (RDFGenerator.java:112-126)
TYPE_MAP = {
    "entity.per": NS["nwr"] + "PERSON",
    "entity.person": NS["nwr"] + "PERSON",
    "entity.org": NS["nwr"] + "ORGANIZATION",
    "entity.organization": NS["nwr"] + "ORGANIZATION",
    "entity.loc": NS["nwr"] + "LOCATION",
    "entity.location": NS["nwr"] + "LOCATION",
    "entity.misc": NS["nwr"] + "MISC",
    "entity.money": NS["gr"] + "PriceSpecification",
    "entity.date": "http://www.w3.org/TR/owl-time#DateTimeInterval",
    "entity.time": "http://www.w3.org/TR/owl-time#DateTimeInterval",
    "timex.date": "http://www.w3.org/TR/owl-time#DateTimeInterval",
    "timex.duration": "http://www.w3.org/TR/owl-time#ProperInterval",
}

MODIFIER_REGEX = "(NMOD|AMOD|TMP|LOC|TITLE) PMOD? (COORD CONJ?)* PMOD?"
PARTICIPATION_REGEX = "SUB? (COORD CONJ?)* (PMOD (COORD CONJ?)*)? ((VC OPRD?)|(IM OPRD?))*"

# property-entity types skipped as instances when used as modifiers
# (RDFGenerator.java:890-901)
_PROPERTY_TYPES = {"money", "cardinal", "ordinal", "percent", "language",
                   "norp", "quantity"}

_SUMO_NS = "http://www.ontologyportal.org/SUMO.owl#"

# D8 opinions default (see Distiller.__init__): the reference's
# default pipeline has no raid stage, so emission defaults OFF
ENABLE_OPINIONS = False

# F20 srlPreMOnIRIs (on by default like the reference,
# NAFFilter.java:1644-1720; prefixes NAFUtils.java:85-97)
PREMON_NS = "http://premon.fbk.eu/resource/"
_PREMON_PREFIX = {"propbank": "pb17", "nombank": "nb10",
                  "verbnet": "vb32", "framenet": "fn15"}


def premon_class_iri(resource: str, pred: str) -> str:
    """NAFUtils.createPreMOnSemanticClassIRIfor (NAFUtils.java:995-1012).
    PB/NB rolesets are lowercased; FrameNet frame and VerbNet class
    names keep their case (Grant_permission) so the downstream eval
    rewrite recovers the exact reference name."""
    if resource in ("propbank", "nombank"):
        pred = pred.lower()
    return PREMON_NS + _PREMON_PREFIX[resource] + "-" + pred


def premon_role_iri(resource: str, pred: str, role: str) -> str:
    """NAFUtils.createPreMOnSemanticRoleIRIfor (NAFUtils.java:1015-1046):
    PB/NB roles a1 -> arg1, am-loc -> argloc (reference quirk kept);
    VN theta roles / FN frame elements keep their case (Participant_1)."""
    if resource in ("propbank", "nombank"):
        pred = pred.lower()
        role = role.lower()
        if "am-" not in role:
            role = role.replace("a", "arg")
        else:
            role = role.replace("am-", "arg")
    return PREMON_NS + _PREMON_PREFIX[resource] + "-" + pred + "@" + role

# degree adverbs never become attribute nodes (gold has no nodes for
# "most", "more", "just"); locative adverbs like "abroad" do
_DEGREE_ADVERBS = {"most", "more", "just", "very", "too", "so", "quite",
                   "least", "less", "almost", "nearly", "rather",
                   "similar", "such", "same"}

# attribute-node adjectives with a FrameNet frame type in the reference
# inventory ("other" evokes Increment)
_ATTR_FN_FRAMES = {"other": "Increment"}

# adjective lemma -> [(frame, frame_element, attr_is_subject)]: labeled
# FrameNet roles between an attribute node and the instance it
# modifies ("other" adds its head to a set; "fortified" states the
# head's purpose)
_ATTR_FN_ROLES = {
    "other": [("Increment", "added_set", True), ("Increment", "class", True)],
    "fortify": [("Locale_by_use", "inherent_purpose", False)],
}

_XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
_XSD_DOUBLE = "http://www.w3.org/2001/XMLSchema#double"
_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


class Distiller:
    """One Extractor per document (RDFGenerator.java:477-719).

    ``strict_rolesets`` is F11 srlRemoveUnknownPredicates
    (NAFFilter.java:1163-1187): predicates whose roleset is absent from
    the roleset inventory are dropped. The reference RDF runner has it
    ON (RDFGenerator.java:328-330); here the default (None) resolves to
    ON when the full-breadth PropBank/NomBank inventory is loadable
    (~10.5k rolesets — $PIKES_PROPBANK_TSV/$PIKES_NOMBANK_TSV or the
    reference checkout) and OFF when only the fixture slice exists,
    where strict filtering would wrongly drop most real predicates."""

    def __init__(self, url: str, text: str, doc: dict, lang: str = "en",
                 strict_rolesets: Optional[bool] = None,
                 emit_conn: bool = False,
                 created: Optional[str] = None,
                 emit_opinions: Optional[bool] = None):
        if strict_rolesets is None:
            from ..functions.resource_loaders import broad_roleset_inventory
            strict_rolesets = broad_roleset_inventory() is not None
        self.strict_rolesets = strict_rolesets
        # D8 opinions (RDFGenerator.java:1393-1467): OFF by default —
        # the reference's default triple pipeline runs without
        # pikes-raid, so no opinions layer ever reaches its generator;
        # the flag is this engine's equivalent of running raid
        self.emit_opinions = (ENABLE_OPINIONS if emit_opinions is None
                              else emit_opinions)
        # conn:<lemma-path> edges (RDFGenerator.java:1127,1370): in the
        # reference the "conn" namespace is COMMENTED OUT of
        # DEFAULT_NAMESPACE_MAP (:143 "TODO .put(conn, ...)"), so
        # mintRefIRI returns null and NO conn edges are emitted by
        # default — we keep the same default and the machinery behind
        # this flag (extract_path is implemented + tested either way)
        self.emit_conn = emit_conn
        self.created = created
        self.url = url
        self.base = url  # document IRI base for minted instance IRIs
        self.text = text
        self.doc = doc
        self.lang = lang
        self.tokens = doc["tokens"]
        self.terms = doc["terms"]
        self.graph = DepGraph([(d["from"], d["to"], d["rfunc"]) for d in doc["deps"]])
        self.triples: List[dict] = []
        # deferred fact-graph hash inputs: emit_fact stores an int index
        # into this list as the graph (or mention-link subject) and
        # run() patches all of them with ONE numpy-vectorized murmur3
        # batch — the r4 profile's top per-document cost (~25%)
        self._hash_keys: List[bytes] = []
        # head term id -> (object_iri, predicate_iri) (RDFGenerator annotations map :2019-2036)
        self.ann_obj: Dict[int, str] = {}
        self.ann_pred: Dict[int, str] = {}
        self.ann_extent: Dict[int, List[int]] = {}
        self.minted: Dict[str, str] = {}
        self.minted_inv: Set[str] = set()
        # mention IRI -> (head char begin, head char end); consumed by the
        # gold-eval converter (eval/convert.py) the way pikes.patch.trig's
        # eval:head statements disambiguate multi-term mentions
        self.mention_heads: Dict[str, Tuple[int, int]] = {}
        self._copula_pairs: List[Tuple[dict, int, int]] = []
        self._ellipsis_iris: Dict[str, str] = {}
        self._ellipsis_by_head: Dict[int, List[str]] = {}
        self._entity_surfaces_seen: Set[str] = set()
        # IRIs that already carry a gaf:denotedBy (a reused global
        # entity:<surface> IRI keeps only its FIRST mention link, like the
        # reference output: pikes.5.ttl <entity:iraqi> has one denotedBy
        # despite two occurrences)
        self._denoted: Set[str] = set()
        self._timex_wfs: Set[int] = set()
        for tmx in doc["timexes"]:
            self._timex_wfs.update(tmx["wf_ids"])

    # ------------------------------------------------------------------
    # offsets (NAFUtils.java:378-393)
    # ------------------------------------------------------------------
    def t_begin(self, tid: int) -> int:
        return self.tokens[tid]["begin"]

    def t_end(self, tid: int) -> int:
        tok = self.tokens[tid]
        if tok["form"] in ("-LSB-", "-RSB-", "''"):
            return tok["begin"] + 1
        return tok["begin"] + tok["len"]

    def span_text(self, tids: Sequence[int]) -> str:
        tids = sorted(tids)
        return self.text[self.t_begin(tids[0]) : self.t_end(tids[-1])]

    # getText (NAFUtils.java:172-186): proper nouns keep case, rest lowered
    def naf_text(self, tids: Sequence[int]) -> str:
        parts = []
        for tid in sorted(tids):
            form = self.tokens[tid]["form"]
            if not self.terms[tid]["morphofeat"].startswith("NNP"):
                form = form.lower()
            parts.append(form)
        return " ".join(parts)

    # filterTerms (NAFUtils.java:153-171)
    def filter_terms(self, tids: Sequence[int]) -> List[int]:
        result: List[int] = []
        at_beginning = True
        for tid in sorted(tids):
            pos = (self.terms[tid]["pos"] or "O")[0].upper()
            if at_beginning and pos in ("D", "P"):
                continue
            form = self.tokens[tid]["form"]
            if any(c.isalnum() for c in form):
                result.append(tid)
                at_beginning = False
        return result

    # ------------------------------------------------------------------
    # IRI minting (RDFGenerator.java:1788-1822)
    # ------------------------------------------------------------------
    def mint_iri(self, key: str, suggested: Optional[str] = None) -> str:
        local = self.minted.get(key)
        if local is None:
            name = suggested if suggested is not None else key
            base = "".join("_" if c.isspace() else c for c in name)
            counter = 1
            while True:
                local = base if counter == 1 else f"{base}_{counter}"
                if local not in self.minted_inv:
                    self.minted[key] = local
                    self.minted_inv.add(local)
                    break
                counter += 1
        return _clean_iri(self.base + "#" + local)

    # ------------------------------------------------------------------
    # emission
    # ------------------------------------------------------------------
    def _emit(self, s: str, p: str, o: str, graph: str, component: str,
              sent: int = -1, mb: int = -1, me: int = -1, conf: float = 1.0,
              o_literal: bool = False, o_datatype: str = "") -> None:
        self.triples.append({
            "url": self.url, "subject": s, "predicate": p, "object": o,
            "graph": graph, "component": component, "sent": sent,
            "mention_begin": mb, "mention_end": me, "conf": conf,
            "object_is_literal": o_literal, "object_datatype": o_datatype,
        })

    def emit_meta(self, s: str, p: str, o: str, component: str = "meta",
                  o_literal: bool = False, o_datatype: str = "") -> None:
        if s and p and o is not None:
            self._emit(s, p, o, "", component, o_literal=o_literal,
                       o_datatype=o_datatype)

    def emit_fact(self, s: str, p: str, o: str, mention: Optional[str],
                  component: str, sent: int = -1, mb: int = -1, me: int = -1,
                  conf: float = 1.0, o_literal: bool = False,
                  o_datatype: str = "") -> None:
        """emitFact (RDFGenerator.java:1834-1857): reify in fact graph;
        rdf:type objects expand through TYPE_MAP."""
        if not (s and p and o):
            return
        objects = [o]
        if p == RDF_TYPE and o in TYPE_MAP:
            objects = [TYPE_MAP[o]]
        elif p == RDF_TYPE and "." in o and o.split(".")[0] in ("entity", "timex") \
                and o not in TYPE_MAP and not o.startswith("http"):
            objects = []  # unmapped string type key -> nothing (extract() map miss)
        for obj in objects:
            hid = len(self._hash_keys)
            self._hash_keys.append(
                fact_hash_key(s, p, obj, o_literal, o_datatype))
            self._emit(s, p, obj, hid, component, sent, mb, me, conf,
                       o_literal, o_datatype)
            if mention:
                self._emit(hid, KS_EXPRESSED_BY, mention, "", "mention_link",
                           sent, mb, me, conf)

    # ------------------------------------------------------------------
    # D9 emitMention (RDFGenerator.java:1584-1670)
    # ------------------------------------------------------------------
    def emit_mention(self, tids: Sequence[int]) -> Optional[str]:
        sorted_ids = sorted(set(tids), key=lambda t: (self.t_begin(t), self.t_end(t)))
        if not sorted_ids:
            return None
        begin = self.t_begin(sorted_ids[0])
        component_iris: List[str] = []
        anchor_parts: List[str] = []
        uri = [f"{self.url}#char={begin},"]
        offset = begin
        start_idx = 0
        for i, tid in enumerate(sorted_ids):
            t_off = self.t_begin(tid)
            if t_off > offset and self.text[offset:t_off].strip():
                seg_start = self.t_begin(sorted_ids[start_idx])
                anchor_parts.append(self.text[seg_start:offset] + " [...] ")
                uri.append(f"{offset};{t_off},")
                sub = self.emit_mention(sorted_ids[start_idx:i])
                if sub:
                    component_iris.append(sub)
                start_idx = i
            offset = self.t_end(tid)
        if start_idx > 0:
            sub = self.emit_mention(sorted_ids[start_idx:])
            if sub:
                component_iris.append(sub)
        anchor_parts.append(self.text[self.t_begin(sorted_ids[start_idx]):offset])
        uri.append(str(offset))
        anchor = "".join(anchor_parts)
        mention = "".join(uri)
        self.emit_meta(mention, KS_MENTION_OF, self.url, "mention")
        self.emit_meta(self.url, KS_HAS_MENTION, mention, "mention")
        self.emit_meta(mention, RDF_TYPE, KS_MENTION, "mention")
        if component_iris:
            self.emit_meta(mention, RDF_TYPE, NS["ks"] + "CompoundString", "mention")
            for c in component_iris:
                self.emit_meta(mention, NS["ks"] + "componentSubString", c, "mention")
        self.emit_meta(mention, NIF_BEGIN, str(begin), "mention", True, _XSD_INT)
        self.emit_meta(mention, NIF_END, str(offset), "mention", True, _XSD_INT)
        self.emit_meta(mention, NIF_ANCHOR, anchor, "mention", True)
        return mention

    # ------------------------------------------------------------------
    # NAFFilter stages
    # ------------------------------------------------------------------
    def filter_stage(self) -> None:
        doc = self.doc
        # F4 entitySpanFixing (NAFFilter.java:498-534)
        fixed = []
        for ent in doc["entities"]:
            tids = self.filter_terms(ent["term_ids"])
            if tids:
                ent = dict(ent)
                ent["term_ids"] = tids
                fixed.append(ent)
        # F3 entityRemoveOverlaps (NAFFilter.java:536-568)
        keep: List[dict] = []
        for i, ent in enumerate(fixed):
            span = set(ent["term_ids"])
            contained = any(
                j != i and span < set(other["term_ids"]) for j, other in enumerate(fixed)
            )
            overlaps_timex = bool(span & self._timex_wfs)
            if not contained and not overlaps_timex:
                keep.append(ent)
        # F7 entityAddition (NAFFilter.java:570-623): bare nouns/pronouns not
        # in any entity/timex -> new non-named entity (type None)
        covered: Set[int] = set()
        for ent in keep:
            covered.update(ent["term_ids"])
        covered |= self._timex_wfs
        referenced: Set[int] = set()
        for pred in self.doc.get("predicates", []):
            for role in pred.get("roles") or []:
                rh = role.get("head_id")
                if rh is not None:
                    referenced.add(rh)
        for co in self.doc.get("corefs", []):
            for sp in co["spans"]:
                referenced.update(sp)
        for tid, term in enumerate(self.terms):
            pos = (term["pos"] or "O")[0].upper()
            if pos not in ("R", "N", "Q") or tid in covered:
                continue
            # NAME dep part of a larger name -> skip (namePart rule)
            dep = self.graph.dep_to(tid)
            if pos == "R" and dep is not None and "name" in dep[1].lower():
                continue
            # a personal pronoun nobody refers to (expletive 'it',
            # relative 'that') is not an instance; possessives ("its")
            # always are
            if pos == "Q" and tid not in referenced \
                    and not term["morphofeat"].startswith("PRP$"):
                continue
            span = self.nominal_span(tid)
            keep.append({"id": f"auto{tid}", "type": None, "named": pos == "R",
                         "term_ids": span, "refs": []})
            covered.update(span)
        # F8 entityValueNormalization (NAFFilter.java:625-665)
        for ent in keep:
            if ent["type"] in ("CARDINAL", "ORDINAL", "PERCENT", "MONEY"):
                words = [self.tokens[t]["form"] for t in ent["term_ids"]]
                if ent["type"] == "ORDINAL":
                    val = ordinal_rank(words[0])
                else:
                    clean = [w.lstrip("$").rstrip("%") for w in words]
                    val = parse_spelled_number(clean)
                if val is not None:
                    prefix = ""
                    joined = " ".join(words)
                    if "$" in joined:
                        prefix = "$"
                    elif "%" in joined or ent["type"] == "PERCENT":
                        prefix = "%"
                    ent = ent  # mutate in place
                    ent.setdefault("refs", []).append(
                        {"resource": "value", "reference": prefix + _fmt_num(val),
                         "confidence": 1.0})
        doc["entities"] = keep

    # getNominalSpan simplified (NAFUtils.java:286-334): markable closure +
    # NAME-regex descendants
    def nominal_span(self, tid: int) -> List[int]:
        terms = {tid}
        head = tid
        terms |= self.graph.descendants_matching([head], "NAME")
        return sorted(terms)

    # ------------------------------------------------------------------
    # RDF generation stages
    # ------------------------------------------------------------------
    def run(self) -> List[dict]:
        self.filter_stage()
        self.process_metadata()   # D0
        self.process_timexes()    # D1
        self.process_entities()   # D2
        self.process_predicates() # D3 (+D7 roles, D5 modifiers)
        for pred, a1, a2 in self._copula_pairs:
            self._emit_copula_sameas(pred, a1, a2)
        self.process_corefs()     # D6
        self.process_modifiers()  # D5
        self.process_roles()      # D7
        if self.emit_opinions:
            self.process_opinions()  # D8 (off by default, like reference)
        # patch deferred fact-graph ids in one vectorized murmur3 batch
        ids = murmur3_ids_batch(self._hash_keys)
        for t in self.triples:
            g = t["graph"]
            if type(g) is int:
                t["graph"] = "fact:" + ids[g]
            s = t["subject"]
            if type(s) is int:
                t["subject"] = "fact:" + ids[s]
        return self.triples

    # D0 (RDFGenerator.java:721-798)
    def process_metadata(self) -> None:
        self.emit_meta(self.url, RDF_TYPE, NS["ks"] + "Resource", "meta")
        self.emit_meta(self.url, RDF_TYPE, NS["ks"] + "Text", "meta")
        # dct:title/creator/created from the file descriptor
        # (RDFGenerator.java:733-739); a web page has no NAF fileDesc,
        # so title/creator are empty literals like the reference's
        # output on plain text (cf. pikes.1.ttl dct:title "")
        self.emit_meta(self.url, NS["dct"] + "title", "", "meta", True)
        self.emit_meta(self.url, NS["dct"] + "creator", "", "meta", True)
        if self.created:
            self.emit_meta(self.url, NS["dct"] + "created", self.created,
                           "meta", True)
        self.emit_meta(self.url, NS["ks"] + "annotatedWith",
                       self.url + ".naf", "meta")
        self.emit_meta(self.url, NS["dct"] + "language",
                       "http://lexvo.org/id/iso639-1/" + (self.lang or "en"), "meta")
        self.emit_meta(self.url, NS["ks"] + "textHash",
                       murmur3_id([self.text]), "meta", True)

    # D1 (RDFGenerator.java:800-873): TimeML values become structured
    # OWL-Time interval/duration IRIs via util/OWLTime.java semantics
    # (Interval.parseTimex :82, Duration.parseTimex :562); the interval/
    # duration description triples go to the default graph (the
    # reference writes them through the raw handler with null context),
    # the hasDurationDescription link and type triples are facts
    def process_timexes(self) -> None:
        from ..functions.owltime import Duration, Interval
        for tmx in self.doc["timexes"]:
            tids = sorted(tmx["wf_ids"])
            head = self.graph.head_of_span(tids) or tids[-1]
            mention = self.emit_mention(tids)
            if mention:
                self.mention_heads[mention] = (self.t_begin(head), self.t_end(head))
            value = tmx.get("value") or ""
            ttype = (tmx.get("type") or "DATE").lower()
            sent = self.tokens[tids[0]]["sent"]
            mb, me = self.t_begin(tids[0]), self.t_end(tids[-1])
            iri = None
            if value:
                if ttype in ("date", "time"):
                    interval = Interval.parse_timex(value)
                    if interval is not None:
                        iri, rows = interval.to_rows(NS["owltime"])
                        for (s, p, o, lit, dt) in rows:
                            self.emit_meta(s, p, o, "owltime",
                                           o_literal=lit, o_datatype=dt)
                elif ttype == "duration":
                    duration = Duration.parse_timex(value)
                    if duration is not None:
                        iri = NS["owltime"] + duration.label()
                        desc_iri, rows = duration.to_rows(NS["owltime"])
                        for (s, p, o, lit, dt) in rows:
                            self.emit_meta(s, p, o, "owltime",
                                           o_literal=lit, o_datatype=dt)
                        self.emit_fact(iri, "http://www.w3.org/TR/owl-time#"
                                       "hasDurationDescription", desc_iri,
                                       mention, "owltime", sent, mb, me)
            if iri is None:
                iri = self.mint_iri("tmx:" + tmx["id"],
                                    value or self.span_text(tids))
            self.ann_obj[head] = iri
            self.ann_extent[head] = tids
            # role lookups may land on any token of a multi-token timex
            # ("in March 2013": the dep head can be the year while the
            # PP's PMOD is the month) — map every span token to the
            # instance
            for t2 in tids:
                self.ann_obj.setdefault(t2, iri)
            self.emit_fact(iri, RDF_TYPE, KS_ENTITY, mention, "instance", sent, mb, me)
            self.emit_fact(iri, RDF_TYPE, KS_TIME, mention, "instance", sent, mb, me)
            self.emit_fact(iri, RDF_TYPE, "timex." + ttype, mention, "type_timex",
                           sent, mb, me)
            self.emit_meta(iri, GAF_DENOTED_BY, mention, "mention")
            self.emit_fact(iri, RDFS_LABEL, self.span_text(tids), mention,
                           "attribute", sent, mb, me, o_literal=True)

    # D2 (RDFGenerator.java:875-973 + emitEntityAttributes :1520-1582)
    def process_entities(self) -> None:
        for ent in self.doc["entities"]:
            tids = sorted(ent["term_ids"])
            head = self.graph.head_of_span(tids) or tids[-1]
            etype = (ent["type"] or "").lower()
            is_property = etype in _PROPERTY_TYPES
            # property entities that act as modifiers are skipped
            # (RDFGenerator.java:895-901)
            if is_property:
                dep = self.graph.dep_to(head)
                if dep is not None and re.fullmatch(r"(NMOD|AMOD)",
                                                    dep[1].split("-")[0]):
                    continue
            mention = self.emit_mention(tids)
            if mention:
                self.mention_heads[mention] = (self.t_begin(head), self.t_end(head))
            sent = self.tokens[tids[0]]["sent"]
            mb, me = self.t_begin(tids[0]), self.t_end(tids[-1])
            named = bool(ent.get("named"))
            linked_uri = None
            best_conf = 0.0
            for ref in ent.get("refs") or []:
                res = (ref.get("resource") or "").lower()
                if res in ("dbpedia", "spotlight") and (ref.get("confidence") or 0) >= best_conf:
                    linked_uri = ref.get("reference")
                    best_conf = ref.get("confidence") or 0.0
            # IRI minting (RDFGenerator.java:911-919): non-named OR linked
            # entities get a DOCUMENT-scoped minted IRI (suggested name =
            # span text if named else head lemma); named-but-unlinked
            # entities get a GLOBAL entity:<surface> IRI (the reference's
            # cross-document merge-by-surface mechanism)
            if (not named) or linked_uri:
                suggested = (self.naf_text(self.filter_terms(tids) or tids)
                             if named else self.terms[head]["lemma"])
                iri = self.mint_iri("ent:" + str(ent["id"]), suggested)
            else:
                surface = self.span_text(tids).lower().replace(" ", "_")
                if surface in self._entity_surfaces_seen:
                    # a REPEATED unlinked surface stays a separate
                    # per-mention instance (gold: iraqi_1/iraqi_2 with
                    # coref sameAs between them); cross-document merge
                    # happens at D12 smushing over the sameAs edges,
                    # not by IRI collision
                    iri = self.mint_iri("ent:" + str(ent["id"]),
                                        self.terms[head]["lemma"])
                else:
                    self._entity_surfaces_seen.add(surface)
                    iri = _clean_iri("entity:" + surface)
            if head not in self.ann_obj:
                self.ann_obj[head] = iri
                self.ann_extent[head] = tids
            else:
                iri = self.ann_obj[head]
            self.emit_fact(iri, RDF_TYPE, KS_ENTITY, mention, "instance", sent, mb, me)
            if etype:
                self.emit_fact(iri, RDF_TYPE, "entity." + etype, mention,
                               "type_entity", sent, mb, me)
            # F2/N4 sense-completion types: SUMO concept + YAGO class from
            # the head term's synset refs (NAFFilter.java:388-496;
            # proper names carry none per F1)
            for tref in self.terms[head].get("refs") or []:
                tres = (tref.get("resource") or "").lower()
                if tres == "sumo":
                    self.emit_fact(iri, RDF_TYPE, _SUMO_NS + tref["reference"],
                                   mention, "type_sumo", sent, mb, me)
                elif tres == "yago":
                    self.emit_fact(iri, RDF_TYPE, tref["reference"],
                                   mention, "type_yago", sent, mb, me)
            if iri not in self._denoted:
                self._denoted.add(iri)
                self.emit_meta(iri, GAF_DENOTED_BY, mention, "mention")
            # a demonym premodifier inside a gazetteer multiword ("the
            # SYRIAN opposition") stays visible as an attribute node
            # with a ks:mod edge (gold: opposition associatedWith syrian)
            from ..functions.nlp import _DEMONYMS
            for tid in tids:
                if tid != head \
                        and self.tokens[tid]["form"].lower() in _DEMONYMS:
                    attr = self.emit_term(tid)
                    if attr:
                        self.emit_fact(iri, KS_MOD, attr, None, "edge", sent)
            if named:
                self.emit_fact(iri, FOAF_NAME,
                               self.naf_text(self.filter_terms(tids) or tids),
                               mention, "attribute", sent, mb, me, o_literal=True)
            if linked_uri:
                prop = OWL_SAMEAS if named else NS["rdfs"] + "seeAlso"
                self.emit_fact(iri, prop, linked_uri, mention, "link", sent, mb, me,
                               conf=best_conf)
            # attributes for property entities (RDFGenerator.java:1520-1582)
            if is_property:
                value_ref = next((r for r in ent.get("refs") or []
                                  if (r.get("resource") or "") == "value"), None)
                if value_ref:
                    v = value_ref["reference"]
                    if etype in ("cardinal", "quantity"):
                        self.emit_fact(iri, KS_QUANTITY, v, mention, "attribute",
                                       sent, mb, me, o_literal=True, o_datatype=_XSD_DOUBLE)
                    elif etype == "ordinal":
                        self.emit_fact(iri, KS_RANK, v, mention, "attribute",
                                       sent, mb, me, o_literal=True, o_datatype=_XSD_DOUBLE)
                    elif etype == "percent":
                        self.emit_fact(iri, KS_PERCENTAGE, v.lstrip("%"), mention,
                                       "attribute", sent, mb, me, o_literal=True,
                                       o_datatype=_XSD_DOUBLE)
                    elif etype == "money":
                        self.emit_fact(iri, NS["gr"] + "hasCurrency",
                                       _currency(v), mention, "attribute",
                                       sent, mb, me, o_literal=True)
                        self.emit_fact(iri, NS["gr"] + "hasCurrencyValue",
                                       v.lstrip("$€¥"), mention, "attribute",
                                       sent, mb, me, o_literal=True,
                                       o_datatype=_XSD_DOUBLE)

    # D3 (RDFGenerator.java:975-1078) + copular skip (:533-567)
    def process_predicates(self) -> None:
        coref_pairs = self._coref_head_pairs()
        named_heads: Set[int] = set()
        for ent in self.doc["entities"]:
            if ent.get("named") or (ent["type"] or "").lower() in ("ordinal",):
                h = self.graph.head_of_span(ent["term_ids"])
                if h is not None and (
                        not ent.get("named")
                        or self.terms[h]["morphofeat"].startswith("NNP")):
                    # a gazetteer R+N multiword ("Syrian opposition")
                    # keeps its common-noun head predicable
                    named_heads.add(h)
        for tmx in self.doc["timexes"]:
            h = self.graph.head_of_span(tmx["wf_ids"])
            named_heads.add(h if h is not None else -1)
            named_heads.update(tmx["wf_ids"])
        for pred in self.doc["predicates"]:
            head = pred.get("head_id", pred["term_ids"][0])
            # skip if head is a timex or named/ordinal entity head (:983-990)
            if head in named_heads:
                continue
            if pred.get("ellipsis"):
                self._emit_ellipsis_pred(pred)
                continue
            # F11 srlRemoveUnknownPredicates (see class docstring):
            # inventory = fixture slice + the full-breadth PropBank /
            # NomBank ids when available
            if self.strict_rolesets:
                from ..functions.predicate_matrix import PM_PREDICATES
                from ..functions.resource_loaders import \
                    broad_roleset_inventory
                rs = next((r["reference"] for r in pred.get("refs") or []
                           if (r.get("resource") or "").lower()
                           in ("propbank", "nombank")), None)
                broad = broad_roleset_inventory() or set()
                if rs not in PM_PREDICATES \
                        and (rs or "").lower() not in broad:
                    continue
            # noun-sharing: predicate over an existing non-named entity
            # reuses the entity IRI (selfArg logic :1005-1028)
            shared_iri = self.ann_obj.get(head)
            roleset = next((r["reference"] for r in pred.get("refs") or []
                            if (r.get("resource") or "").lower() in ("propbank", "nombank")),
                           None)
            # copular 'be' predicate skipped ONLY when its A1/A2 heads
            # coref together (RDFGenerator.java:533-567) — then an
            # owl:sameAs replaces the event; a non-coreferring copula
            # stays a normal frame instance (gold keeps ':is a pb:be.01')
            if roleset and roleset.split(".")[0] in ("be", "become"):
                heads = {}
                for role in pred.get("roles") or []:
                    h = role.get("head_id")
                    if role["sem_role"] in ("A1", "A2") and h is not None:
                        heads[role["sem_role"]] = h
                if len(heads) == 2:
                    a1, a2 = heads["A1"], heads["A2"]
                    if (a1, a2) in coref_pairs or (a2, a1) in coref_pairs:
                        self._emit_copula_sameas(pred, a1, a2)
                        continue
                    if roleset.split(".")[0] == "be":
                        # identity copula "X is a Y": the frame instance
                        # stays AND the args are equated — deferred until
                        # both arg IRIs exist (RDFGenerator.java:533-567)
                        self._copula_pairs.append((pred, a1, a2))
            tids = sorted(pred["term_ids"])
            # selfArg (RDFGenerator.java:1005-1028): when a role's head IS
            # the predicate head and an entity IRI already covers it, the
            # predicate gets its OWN minted IRI (lemma + collision suffix,
            # e.g. insurgent_2) so the self-arg becomes a real role edge;
            # otherwise the entity IRI is reused (noun-sharing)
            self_arg = False
            if shared_iri is not None:
                for role in pred.get("roles") or []:
                    rh = role.get("head_id")
                    if rh is None:
                        rh = self.graph.head_of_span(role["term_ids"])
                    if rh == head:
                        self_arg = True
                        break
            sharing = shared_iri is not None and not self_arg
            if sharing:
                iri = shared_iri
                # reuse the entity span's mention (RDFGenerator.java:1032-1037)
                mention = self.emit_mention(self.ann_extent.get(head, tids))
            else:
                iri = self.mint_iri("pred:" + str(head),
                                    self.terms[head]["lemma"])
                mention = self.emit_mention(tids)
            if mention:
                self.mention_heads[mention] = (self.t_begin(head), self.t_end(head))
            sent = self.tokens[tids[0]]["sent"]
            mb, me = self.t_begin(tids[0]), self.t_end(tids[-1])
            self.ann_pred[head] = iri
            if head not in self.ann_extent:
                self.ann_extent[head] = tids
            self.emit_fact(iri, RDF_TYPE, KS_ENTITY, mention, "instance", sent, mb, me)
            self.emit_fact(iri, RDF_TYPE, SEM_EVENT, mention, "instance", sent, mb, me)
            self.emit_meta(iri, GAF_DENOTED_BY, mention, "mention")
            # SUMO Process subclass => sumo type on the event instance
            # (RDFGenerator.java:1013-1024, 1071-1077)
            for tref in self.terms[head].get("refs") or []:
                if (tref.get("resource") or "").lower() == "sumo" \
                        and tref.get("source") == "process":
                    self.emit_fact(iri, RDF_TYPE, _SUMO_NS + tref["reference"],
                                   mention, "type_sumo", sent, mb, me)
            # D4 processFactuality: ks:factuality literal on the predicate
            # instance (RDFGenerator.java:1080-1099)
            fact_val = pred.get("factuality")
            if fact_val:
                self.emit_fact(iri, NS["ks"] + "factuality", fact_val,
                               mention, "factuality", sent, mb, me,
                               o_literal=True)
            for ref in pred.get("refs") or []:
                res = (ref.get("resource") or "").lower()
                if res in NS and ref.get("reference"):
                    comp = {"propbank": "type_pb", "nombank": "type_nb",
                            "verbnet": "type_vn", "framenet": "type_fn",
                            "framebase": "type_fb",
                            "eso": "type_eso"}.get(res, "type_" + res)
                    if res in _PREMON_PREFIX:
                        obj = premon_class_iri(res, ref["reference"])
                    else:
                        obj = NS[res] + ref["reference"].replace("#", ".")
                    self.emit_fact(iri, RDF_TYPE, obj, mention, comp, sent, mb, me)

    def _emit_ellipsis_pred(self, pred: dict) -> None:
        """Second predicate instance over a shared head for gapped
        coordination ("... but not Islamic extremists"): own IRI, same
        mention anchor, CT- factuality, and the gap's "not" as a ks:mod
        attribute node."""
        head = pred.get("head_id", pred["term_ids"][0])
        tids = sorted(pred["term_ids"])
        iri = self.mint_iri("pred_e:" + str(head) + pred["id"],
                            self.terms[head]["lemma"])
        self._ellipsis_iris[pred["id"]] = iri
        self._ellipsis_by_head.setdefault(head, []).append(iri)
        mention = self.emit_mention(tids)
        if mention:
            self.mention_heads[mention] = (self.t_begin(head), self.t_end(head))
        sent = self.tokens[tids[0]]["sent"]
        mb, me = self.t_begin(tids[0]), self.t_end(tids[-1])
        self.emit_fact(iri, RDF_TYPE, KS_ENTITY, mention, "instance", sent, mb, me)
        self.emit_fact(iri, RDF_TYPE, SEM_EVENT, mention, "instance", sent, mb, me)
        self.emit_meta(iri, GAF_DENOTED_BY, mention, "mention")
        fact_val = pred.get("factuality")
        if fact_val:
            self.emit_fact(iri, NS["ks"] + "factuality", fact_val,
                           mention, "factuality", sent, mb, me, o_literal=True)
        for ref in pred.get("refs") or []:
            res = (ref.get("resource") or "").lower()
            if res in NS and ref.get("reference"):
                comp = {"propbank": "type_pb", "nombank": "type_nb",
                        "verbnet": "type_vn", "framenet": "type_fn",
                        "framebase": "type_fb",
                        "eso": "type_eso"}.get(res, "type_" + res)
                if res in _PREMON_PREFIX:
                    obj = premon_class_iri(res, ref["reference"])
                else:
                    obj = NS[res] + ref["reference"].replace("#", ".")
                self.emit_fact(iri, RDF_TYPE, obj, mention, comp, sent, mb, me)
        neg_term = pred.get("neg_term")
        if neg_term is not None:
            attr = self.emit_term(neg_term)
            if attr:
                self.emit_fact(iri, KS_MOD, attr, None, "edge", sent)

    def _emit_copula_sameas(self, pred: dict, a1_head: int, a2_head: int) -> bool:
        """Copular be/become: if both args are annotated instances, emit
        owl:sameAs between them instead of an event (RDFGenerator.java:533-567
        emits nothing for the predicate; the coreference between the arg
        instances is handled by coref — we additionally link them when the
        copula explicitly equates two instances).

        Coordinated subject ("X and Y are Zs"): the predicative nominal
        denotes the GROUP, so instead of equating its instance with the
        coordination HEAD alone, emit ks:include edges from the
        predicative instance to every coordinated member — the same
        group treatment D6 gives coreference compounds
        (RDFGenerator.java:1195-1240; the reference's worked example
        `src/site/markdown/example.md:104` shows exactly this output:
        `instance:competitors ks:includes instance:trump,
        instance:clinton`)."""
        o2 = self.ann_obj.get(a2_head) or self.ann_pred.get(a2_head)
        if o2 is None:
            return False
        coords = [(t, self.ann_obj.get(t) or self.ann_pred.get(t))
                  for t in sorted(self.graph.descendants_matching(
                      [a1_head], "(COORD CONJ?)*"))]
        coords = [(t, iri) for t, iri in coords if iri and iri != o2]
        tids = sorted(pred["term_ids"])
        sent = self.tokens[tids[0]]["sent"]
        if len(coords) >= 2:
            extent = sorted({t for t, _i in coords})
            mention = self.emit_mention(sorted(set(
                extent + self.ann_extent.get(a2_head, []))))
            for _t, iri in coords:
                self.emit_fact(o2, KS_INCLUDE, iri, mention, "include", sent)
            return True
        o1 = self.ann_obj.get(a1_head) or self.ann_pred.get(a1_head)
        if o1 and o1 != o2:
            mention = self.emit_mention(sorted(set(
                self.ann_extent.get(a1_head, []) + self.ann_extent.get(a2_head, []))))
            self.emit_fact(o1, OWL_SAMEAS, o2, mention, "sameas", sent)
            return True
        return False

    def _coref_head_pairs(self) -> Set[Tuple[int, int]]:
        pairs: Set[Tuple[int, int]] = set()
        for coref in self.doc.get("corefs", []):
            heads = []
            for span in coref["spans"]:
                h = self.graph.head_of_span(span)
                if h is not None:
                    heads.append(h)
            for i in range(len(heads)):
                for j in range(i + 1, len(heads)):
                    pairs.add((heads[i], heads[j]))
        return pairs

    # D6 (RDFGenerator.java:1151-1259): cluster members resolve via the
    # (COORD CONJ?)* head expansion; coordinated members become a minted
    # compound instance with ks:include edges to each coordinate
    # (:1195-1240); then all-pairs owl:sameAs with joint mentions
    def process_corefs(self) -> None:
        for coref in self.doc.get("corefs", []):
            members: List[Tuple[int, str, List[int]]] = []
            for span in coref["spans"]:
                h = self.graph.head_of_span(span)
                if h is None:
                    continue
                span_set = set(span)
                coords: List[Tuple[int, str]] = []
                for t in sorted(self.graph.descendants_matching(
                        [h], "(COORD CONJ?)*")):
                    if t not in span_set:
                        continue
                    iri = self.ann_obj.get(t) or self.ann_pred.get(t)
                    if iri is not None:
                        coords.append((t, iri))
                if not coords:
                    continue
                if len(coords) == 1:
                    members.append((coords[0][0], coords[0][1], sorted(span)))
                else:
                    local = "_".join(i.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
                                     .rsplit(":", 1)[-1] for _t, i in coords)
                    comp = self.mint_iri("comp:" + local, local)
                    extent = sorted({t for t, _i in coords})
                    mention = self.emit_mention(extent)
                    sent = self.tokens[extent[0]]["sent"]
                    self.emit_fact(comp, RDF_TYPE, KS_ENTITY, mention,
                                   "instance", sent)
                    for _t, iri in coords:
                        self.emit_fact(comp, KS_INCLUDE, iri, mention,
                                       "include", sent)
                    members.append((coords[0][0], comp, sorted(span)))
            # all-pairs owl:sameAs with joint mention (:1243-1258);
            # anaphor-to-antecedent direction for neuter pronouns
            # ('it' sameAs X, matching the gold convention)
            def _is_it(h: int) -> bool:
                return self.tokens[h]["form"].lower() in ("it", "its")

            def _is_rel(h: int) -> bool:
                return self.tokens[h]["form"].lower() in ("who", "whom",
                                                          "which", "that")

            def _is_pron(h: int) -> bool:
                return self.terms[h]["pos"] == "Q"

            named_hs = {t for e in self.doc.get("entities", [])
                        if e.get("named") for t in e["term_ids"]}

            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    a, b = members[i], members[j]
                    # a relative pronoun corefers with its personal-pronoun
                    # co-arguments only implicitly — no explicit sameAs in
                    # the reference output (RDFGenerator.java:1243-1258
                    # emits links for markable mentions only)
                    if (_is_rel(a[0]) and _is_pron(b[0])) or \
                            (_is_rel(b[0]) and _is_pron(a[0])):
                        continue
                    joint = sorted(set(members[i][2] + members[j][2]))
                    mention = self.emit_mention(joint)
                    sent = self.tokens[joint[0]]["sent"]
                    if _is_it(b[0]) and not _is_it(a[0]):
                        a, b = b, a
                    elif b[2] and b[2][0] == a[0] + 1:
                        # title apposition "president Bashar al-Assad":
                        # the name is the subject of the sameAs link
                        a, b = b, a
                    elif a[0] in named_hs and b[0] not in named_hs \
                            and self.terms[b[0]]["pos"] == "N":
                        # distant definite-NP anaphor ("the group" after
                        # "the Nusra Front"): anaphor is the subject
                        a, b = b, a
                    self.emit_fact(a[1], OWL_SAMEAS, b[1],
                                   mention, "sameas", sent)

    # D5 (RDFGenerator.java:587-619, 1101-1149)
    def process_modifiers(self) -> None:
        coref_heads = {h for pair in self._coref_head_pairs() for h in pair}
        # a modifier already captured as a ROLE of the head's predicate
        # needs no ks:mod edge (the role edge covers the pair); and when
        # a head carries both an entity and a predicate IRI, the mod
        # edge belongs on the ENTITY instance (gold: fighters
        # hasQuality veteran — not fighters_v)
        role_covered: Set[Tuple[int, int]] = set()
        for pred in self.doc.get("predicates", []):
            ph = pred.get("head_id", pred["term_ids"][0])
            for role in pred.get("roles") or []:
                rh = role.get("head_id")
                if rh is not None:
                    role_covered.add((ph, rh))
        seen: Set[Tuple[int, str]] = set()
        for head, iri in list(self.ann_obj.items()) + list(self.ann_pred.items()):
            if (head, iri) in seen:
                continue
            if head in self.ann_obj and iri != self.ann_obj[head]:
                continue  # pred-side duplicate of an entity head
            seen.add((head, iri))
            extent = set(self.ann_extent.get(head, [head]))
            for mod in self.graph.descendants_matching([head], MODIFIER_REGEX):
                if mod == head or mod in extent or mod in coref_heads:
                    continue
                if (head, mod) in role_covered:
                    continue
                if (self.terms[mod]["pos"] or "O")[0].upper() == "Q":
                    continue  # possessive/relative pronouns: no mod edge
                if self.terms[mod]["lemma"] == "not" and mod > 0 \
                        and self.terms[mod - 1]["morphofeat"] == "CC":
                    continue  # "but not": negation owned by the ellipsis
                target = self.ann_obj.get(mod) or self.ann_pred.get(mod)
                sent = self.tokens[head]["sent"]
                if target:
                    self.emit_fact(iri, KS_MOD, target, None, "edge", sent)
                    conn = self.conn_iri(head, mod)
                    if conn:
                        self.emit_fact(iri, conn, target, None, "edge", sent)
                else:
                    term = self.terms[mod]
                    if (term["pos"] or "O")[0].upper() in ("G", "A") \
                            and term["lemma"] not in _DEGREE_ADVERBS:
                        attr = self.emit_term(mod)
                        if attr:
                            self.emit_fact(iri, KS_MOD, attr, None, "edge", sent)
                            from ..functions.framebase import default_index
                            for frame, fe, attr_subj in _ATTR_FN_ROLES.get(
                                    term["lemma"], []):
                                prop = premon_role_iri("framenet", frame, fe)
                                s2, o2 = ((attr, iri) if attr_subj
                                          else (iri, attr))
                                self.emit_fact(s2, prop, o2, None,
                                               "role_fn", sent)
                                # F15 twin for the attribute-node role
                                fb = default_index().property_for(frame, fe)
                                if fb:
                                    self.emit_fact(s2, NS["framebase"] + fb,
                                                   o2, None, "role_fb", sent)

    # extractPath (RDFGenerator.java:1732-1773): lemma path between two
    # heads along the undirected dep-tree route, skipping edges inside
    # either head's (-VC|-IM|-OPRD)* chain and COORD/CONJ links
    def extract_path(self, frm: int, to: int) -> Optional[str]:
        def up_chain(t: int) -> Set[int]:
            out = {t}
            cur = t
            while True:
                p = self.graph.parent.get(cur)
                if p is None or p[1].split("-")[0].upper() not in (
                        "VC", "IM", "OPRD"):
                    break
                cur = p[0]
                out.add(cur)
            return out

        from_terms = up_chain(frm)
        to_terms = up_chain(to)
        if from_terms & to_terms:
            return None
        path = self.graph.path(frm, to)
        if path is None:
            return None
        path = [d for d in path
                if not (d[0] in from_terms and d[1] in from_terms
                        or d[0] in to_terms and d[1] in to_terms)]
        if not path or path[0][1] in from_terms:
            return None  # moving towards the tree root
        parts: List[str] = []
        for (h, _dep, func) in path[1:]:
            if func.upper() not in ("COORD", "CONJ"):
                parts.append(self.terms[h]["lemma"].lower().replace(" ", "_"))
        return "_".join(parts)

    def conn_iri(self, frm: int, to: int) -> Optional[str]:
        """mintRefIRI('conn', path) — None unless emit_conn (the
        reference's default namespace map lacks 'conn', :143)."""
        if not self.emit_conn:
            return None
        path = self.extract_path(frm, to)
        if not path:
            return None
        return _clean_iri("http://www.newsreader-project.eu/conn/" + path)

    # D10 emitTerm (RDFGenerator.java:1672-1730): attribute node in the
    # GLOBAL attr: namespace named by the sorted recursive modifier ids
    # + the head's synset (or lemma); emits ks:headSynset and recursive
    # ks:mod edges to modifier attribute nodes
    def emit_term(self, head: int) -> Optional[str]:
        syn = next((r["reference"] for r in self.terms[head].get("refs") or []
                    if (r.get("resource") or "").startswith("wn")), None)
        head_id = (syn or self.terms[head]["lemma"].lower())
        modifier_iris: List[str] = []
        modifier_ids: List[str] = []
        for mod in sorted(self.graph.descendants_matching([head], "AMOD|NMOD")):
            if mod != head and (self.terms[mod]["pos"] or "O")[0].upper() in "AGV" \
                    and self.terms[mod]["lemma"] not in _DEGREE_ADVERBS:
                mod_iri = self.emit_term(mod)
                if mod_iri:
                    modifier_iris.append(mod_iri)
                    modifier_ids.append(mod_iri.rsplit(":", 1)[-1])
        closure = [t for t in sorted(self.graph.descendants_matching(
            [head], "(AMOD|NMOD)*"))
            if (self.terms[t]["pos"] or "O")[0].upper() in "AGV"
            and self.terms[t]["lemma"] not in _DEGREE_ADVERBS]
        label = self.naf_text(self.filter_terms(closure) or closure or [head])
        level = 0
        for mid in modifier_ids:
            i = 1
            while "_" * i in mid:
                level = max(level, i)
                i += 1
        sep = "_" * (level + 1)
        attr_id = sep.join(sorted(modifier_ids) + [head_id]) \
            if modifier_ids else head_id
        iri = _clean_iri("attr:" + attr_id.replace(" ", "_"))
        mention = self.emit_mention(closure or [head])
        if mention:
            self.mention_heads[mention] = (self.t_begin(head), self.t_end(head))
        sent = self.tokens[head]["sent"]
        self.emit_fact(iri, RDF_TYPE, KS_ATTRIBUTE, None, "instance", sent)
        self.emit_fact(iri, RDFS_LABEL, label, None, "attribute", sent, o_literal=True)
        if syn:
            self.emit_fact(iri, NS["ks"] + "headSynset",
                           "http://wordnet-rdf.princeton.edu/wn30/" + syn,
                           None, "attribute", sent)
        fn_frame = _ATTR_FN_FRAMES.get(self.terms[head]["lemma"])
        if fn_frame:
            self.emit_fact(iri, RDF_TYPE,
                           premon_class_iri("framenet", fn_frame),
                           None, "type_fn", sent)
            # F15 twin: the attribute node's frame also has a FrameBase
            # microframe (NAFFilter.java:1429-1438 maps every FrameNet
            # predicate ref, attribute-backed ones included)
            from ..functions.framebase import default_index, pos_for_penn_tag
            fb = default_index().class_for(
                fn_frame, self.terms[head]["lemma"].lower(),
                pos_for_penn_tag(self.terms[head]["morphofeat"]))
            if fb:
                self.emit_fact(iri, RDF_TYPE, NS["framebase"] + fb,
                               None, "type_fb", sent)
        for mod_iri in modifier_iris:
            self.emit_fact(iri, KS_MOD, mod_iri, None, "edge", sent)
        self.emit_meta(iri, GAF_DENOTED_BY, mention, "mention")
        return iri

    # D8 (RDFGenerator.java:1393-1467 processOpinion +
    # :1469-1501 emitOpinionArgument)
    def process_opinions(self) -> None:
        """Opinion instances: mint an IRI per opinion, type it
        sumo:Entity + ks:Opinion + ks:{Positive,Negative,Neutral}Opinion
        (Opinion.Polarity.forLabel's pos/neg normalization), label it
        with the expression's NAF text, and link ks:expression /
        ks:target / ks:holder to the HEAD term's node — the reference
        call passes spanProperty=null, so only head edges are emitted
        (:1417-1439); a head with no entity/predicate IRI gets an
        attribute node via emitTerm when its POS is A/G/V and it does
        not govern a VC chain (:1447-1457)."""
        from ..functions.opinions import extract_opinions
        opinions = extract_opinions(self.tokens, self.terms, self.graph)
        for op in opinions:
            iri = self.mint_iri("opinion:" + op["id"], op["id"])
            sent = self.tokens[op["head_id"]]["sent"]
            self.emit_fact(iri, RDF_TYPE, _SUMO_NS + "Entity", None,
                           "opinion", sent)
            self.emit_fact(iri, RDF_TYPE, NS["ks"] + "Opinion", None,
                           "opinion", sent)
            pol = op["polarity"].capitalize()  # Positive/Negative/Neutral
            self.emit_fact(iri, RDF_TYPE, NS["ks"] + pol + "Opinion",
                           None, "opinion", sent)
            self.emit_fact(iri, RDFS_LABEL,
                           self.naf_text(op["expression_ids"]), None,
                           "opinion", sent, o_literal=True)
            for prop, head in (
                    ("expression", op["head_id"]),
                    ("target", self.graph.head_of_span(op["target_ids"])
                     if op["target_ids"] else None),
                    ("holder", self.graph.head_of_span(op["holder_ids"])
                     if op["holder_ids"] else None)):
                if head is None:
                    continue
                uri = self.ann_obj.get(head) or self.ann_pred.get(head)
                if uri is None \
                        and (self.terms[head]["pos"] or "O")[0].upper() in "AGV" \
                        and not any(lab == "VC" for _, lab
                                    in self.graph.children.get(head, [])):
                    uri = self.emit_term(head)
                if uri:
                    self.emit_fact(iri, NS["ks"] + prop, uri, None,
                                   "opinion", sent)

    # D7 (RDFGenerator.java:1261-1391)
    def process_roles(self) -> None:
        for pred in self.doc["predicates"]:
            phead = pred.get("head_id", pred["term_ids"][0])
            if pred.get("ellipsis"):
                pred_iri = self._ellipsis_iris.get(pred["id"])
            else:
                pred_iri = self.ann_pred.get(phead)
            if pred_iri is None:
                continue
            # ALL pb/nb rolesets of the predicate contribute role
            # properties (RDFGenerator.java:1349-1361 iterates every
            # predicate ref) — nominalizations carry both nb + pb
            rolesets = [((r.get("resource") or "").lower(), r["reference"])
                        for r in pred.get("refs") or []
                        if (r.get("resource") or "").lower()
                        in ("propbank", "nombank")]
            roleset = rolesets[0][1] if rolesets else None
            for role in pred.get("roles") or []:
                sem = role["sem_role"]
                if sem.startswith("R-"):
                    continue  # skip reference roles (:1272)
                rhead = role.get("head_id")
                if rhead is None:
                    rhead = self.graph.head_of_span(role["term_ids"])
                if rhead is None:
                    continue
                # argument heads via PARTICIPATION_REGEX (:1281-1292);
                # a self-arg or a clausal argument (verb head) stays on
                # its own node — no SUB/COORD expansion (the expansion
                # would leak the role onto co-conjuncts / the embedded
                # clause's subject)
                if rhead == phead or role.get("no_expand") \
                        or (self.terms[rhead]["pos"] or "O")[0].upper() == "V":
                    arg_heads = {rhead}
                else:
                    arg_heads = self.graph.descendants_matching(
                        [rhead], PARTICIPATION_REGEX)
                # properties (:1294-1361)
                props: List[Tuple[str, str]] = []
                if sem == "A0":
                    props.append((SEM_HAS_ACTOR, "role_sem"))
                elif sem in ("AM-TMP",):
                    props.append((SEM_HAS_TIME, "role_sem"))
                elif sem in ("AM-LOC",):
                    props.append((SEM_HAS_PLACE, "role_sem"))
                if re.fullmatch(r"A\d", sem) or sem.startswith("AM-") \
                        or sem == "mod":
                    per_res = role.get("arg_by_res") or {}
                    for res, rs in rolesets:
                        arg = per_res.get(res, sem)
                        if arg is None:
                            continue  # role absent on this resource side
                        props.append((premon_role_iri(res, rs, arg),
                                      "role_pb" if res == "propbank" else "role_nb"))
                # conn:<lemma-path> property (RDFGenerator.java:1363-1371)
                conn = self.conn_iri(phead, rhead)
                if conn:
                    props.append((conn, "edge"))
                # VN theta roles / FN frame elements from PM refs
                # (mintRefIRI per resource, RDFGenerator.java:1323-1345);
                # PM refs come as "<class>@<role>" -> PreMOn role IRIs
                for rref in role.get("refs") or []:
                    rres = (rref.get("resource") or "").lower()
                    if rres in ("verbnet", "framenet") and rref.get("reference"):
                        cls, _, rl = rref["reference"].partition("@")
                        props.append((premon_role_iri(rres, cls, rl or "role"),
                                      "role_vn" if rres == "verbnet" else "role_fn"))
                    elif rres == "framebase" and rref.get("reference"):
                        # F15 role properties land directly in the frb
                        # namespace (fe-<Frame>-<FE>; FrameBase.java:124-134)
                        props.append((NS["framebase"] + rref["reference"],
                                      "role_fb"))
                sent = self.tokens[rhead]["sent"]
                for ah in sorted(arg_heads):
                    arg_iri = self.ann_obj.get(ah) or self.ann_pred.get(ah)
                    if arg_iri is None and ah != rhead:
                        continue
                    if arg_iri == pred_iri:
                        continue  # self-arg on a noun-sharing IRI -> no self-loop
                    if arg_iri is None:
                        # unannotated N/G/A arg -> attribute node (:1374-1390)
                        if (self.terms[ah]["pos"] or "O")[0].upper() in ("N", "G", "A"):
                            arg_iri = self.emit_term(ah)
                        if arg_iri is None:
                            continue
                    mention = self.emit_mention(sorted(set(role["term_ids"]) | {phead}))
                    mb = self.t_begin(min(role["term_ids"]))
                    me = self.t_end(max(role["term_ids"]))
                    # a clausal argument whose head anchors an ellipsis
                    # twin refers to BOTH instances ("want to support X
                    # but not Y" -> want a1 support AND a1 support_2)
                    extra = ([] if pred.get("ellipsis")
                             else self._ellipsis_by_head.get(ah, []))
                    for prop, component in props:
                        self.emit_fact(pred_iri, prop, arg_iri, mention, component,
                                       sent, mb, me)
                        for eiri in extra:
                            self.emit_fact(pred_iri, prop, eiri, mention,
                                           component, sent, mb, me)


def _fmt_num(v: float) -> str:
    if v == int(v):
        return str(int(v))
    return repr(v)


def _currency(v: str) -> str:
    if v.startswith("$"):
        return "USD"
    if v.startswith("€"):
        return "EUR"
    if v.startswith("¥"):
        return "JPY"
    return "USD"


def _clean_iri(iri: str) -> str:
    """Util.cleanIRI-equivalent: strip characters illegal in IRIs."""
    return re.sub(r"[^\w\-.~:/?#\[\]@!$&'()*+,;=%]", "_", iri)


def distill_document(url: str, text: str, doc: dict, lang: str = "en") -> List[dict]:
    """annotation layers -> triple rows (one document)."""
    return Distiller(url, text, doc, lang).run()
