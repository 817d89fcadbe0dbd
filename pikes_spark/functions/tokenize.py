"""Deterministic sentence splitter, PTB-style tokenizer, rule POS/lemma.

Fills the contract of the reference's CoreNLP ``tokenize, ssplit,
pos, lemma`` stages (AnnotationPipeline.java:1066-1086 with
``ssplit.newlineIsSentenceBreak=two`` per config-pikes.prop:15; token
copy loop AnnotationPipeline.java:225-270). The reference treats
these as external models — what matters downstream is the contract:

    tokens: (id, sent, begin, len, form)   # char offsets into text
    terms:  (id, lemma, pos, morphofeat)   # pos = 1-char KAF simple pos

KAF simple-pos chars (used by NAFFilter.java:375-623 rules):
R proper noun, N common noun, Q pronoun, V verb, G adjective,
A adverb, D determiner, P preposition/particle, C conjunction, O other.

This is a deterministic rule model (no weights) — accurate enough to
drive the distillation rules on the fixture corpus, pluggable for a
real tagger at deployment. Pure Python; runs vectorized inside Arrow
UDFs batched per page.
"""

from __future__ import annotations

import re
from typing import List, NamedTuple

from .resources import GAZETTEER as _GAZ


class Token(NamedTuple):
    id: int
    sent: int
    begin: int
    length: int
    form: str


# ---------------------------------------------------------------------------
# Sentence splitting
# ---------------------------------------------------------------------------

_ABBREV = {
    "mr", "mrs", "ms", "dr", "prof", "st", "jr", "sr", "inc", "ltd", "co",
    "corp", "vs", "etc", "e.g", "i.e", "u.s", "u.k", "u.n", "a.m", "p.m",
    "gen", "col", "sgt", "rev", "hon", "jan", "feb", "mar", "apr", "jun",
    "jul", "aug", "sep", "sept", "oct", "nov", "dec", "no", "vol", "fig",
}

_SENT_END = re.compile(r"[.!?]+[\"')\]]*")


def _is_abbrev(text: str, dot_idx: int) -> bool:
    """True if the '.' at dot_idx ends an abbreviation or initial."""
    j = dot_idx - 1
    while j >= 0 and (text[j].isalnum() or text[j] == "."):
        j -= 1
    word = text[j + 1 : dot_idx].lower()
    if word in _ABBREV:
        return True
    # single-letter initial ("G.", "W.") or dotted acronym ("G.W", "U.S")
    if len(word) == 1 and word.isalpha():
        return True
    if "." in word and all(len(p) <= 1 for p in word.split(".")):
        return True
    return False


def split_sentences(text: str) -> List[tuple]:
    """Return [(begin, end)] sentence character spans.

    Breaks at [.!?]+ followed by whitespace + an uppercase/digit/quote
    start, except after abbreviations; a blank line always breaks
    (``newlineIsSentenceBreak=two``).
    """
    spans: List[tuple] = []
    n = len(text)
    start = 0
    i = 0
    while i < n:
        ch = text[i]
        if ch == "\n":
            # paragraph break: two+ newlines (possibly with spaces between)
            j = i + 1
            saw_second = False
            while j < n and text[j] in " \t\n\r":
                if text[j] == "\n":
                    saw_second = True
                j += 1
            if saw_second or j >= n:
                if text[start:i].strip():
                    spans.append((start, i))
                start = j
                i = j
                continue
        m = _SENT_END.match(text, i)
        if m and ch in ".!?":
            end = m.end()
            if ch == "." and _is_abbrev(text, i):
                i += 1
                continue
            # require whitespace then sentence-ish start (or EOF)
            k = end
            while k < n and text[k] in " \t":
                k += 1
            nxt = text[k] if k < n else ""
            if k >= n or text[k] == "\n" or nxt.isupper() or nxt.isdigit() or nxt in "\"'(":
                if text[start:end].strip():
                    spans.append((start, end))
                while end < n and text[end] in " \t":
                    end += 1
                start = end
                i = end
                continue
        i += 1
    if start < n and text[start:].strip():
        # trim trailing whitespace from the final span
        e = n
        while e > start and text[e - 1] in " \t\n\r":
            e -= 1
        spans.append((start, e))
    return spans


# ---------------------------------------------------------------------------
# Tokenization (PTB-ish)
# ---------------------------------------------------------------------------

# money/percent/numbers stay single tokens; contractions split off
_TOKEN = re.compile(
    r"""
    \$\d+(?:,\d{3})*(?:\.\d+)?      # $5  $5,000.25
  | \d+(?:,\d{3})*(?:\.\d+)?%?      # 5,000  3.5  20%
  | [A-Za-z]+(?:\.[A-Za-z]+)+\.?    # U.S.  G.W.  e.g.
  | [A-Za-z]+(?:-[A-Za-z]+)*        # word  twenty-three
  | --+ | \.\.\.
  | [^\sA-Za-z0-9]                  # single punctuation char
    """,
    re.VERBOSE,
)

_CONTRACTION_TAIL = re.compile(r"(?i)(n't|'s|'re|'ve|'ll|'d|'m)$")


_TAILS = {"s", "re", "ve", "ll", "d", "m"}


def tokenize_sentence(text: str, begin: int, end: int, sent: int, next_id: int) -> List[Token]:
    """Tokenize text[begin:end] into offset-anchored tokens; contraction
    tails (n't 's 're 've 'll 'd 'm) are separate tokens PTB-style."""
    raw = [(m.start(), m.group(0)) for m in _TOKEN.finditer(text, begin, end)]
    merged: List[tuple] = []
    i = 0
    while i < len(raw):
        b, form = raw[i]
        # word + ' + tail  ->  contraction split
        if form[-1:].isalpha() and i + 2 <= len(raw) - 1 and raw[i + 1][1] == "'" \
                and raw[i + 1][0] == b + len(form):
            nb, nform = raw[i + 2]
            if nb == raw[i + 1][0] + 1 and nform.isalpha():
                low = nform.lower()
                if low == "t" and form.lower().endswith("n") and len(form) > 1:
                    merged.append((b, form[:-1]))
                    merged.append((b + len(form) - 1, form[-1] + "'" + nform))
                    i += 3
                    continue
                if low in _TAILS:
                    merged.append((b, form))
                    merged.append((raw[i + 1][0], "'" + nform))
                    i += 3
                    continue
        merged.append((b, form))
        i += 1
    out: List[Token] = []
    tid = next_id
    for b, form in merged:
        out.append(Token(tid, sent, b, len(form), form))
        tid += 1
    return out


# ---------------------------------------------------------------------------
# POS tagging + lemmatization (deterministic rules)
# ---------------------------------------------------------------------------

_DETS = {"the", "a", "an", "this", "that", "these", "those", "every", "each",
         "some", "any", "no", "another", "all", "both"}
_PREPS = {"of", "in", "on", "at", "by", "for", "with", "from", "to", "into",
          "about", "against", "between", "during", "through", "over", "under",
          "after", "before", "since", "until", "upon", "within", "without",
          "near", "across", "around", "behind", "among", "per", "via"}
_PRONOUNS = {"i", "you", "he", "she", "it", "we", "they", "me", "him", "her",
             "us", "them", "who", "whom", "which", "what", "himself",
             "herself", "itself", "themselves", "myself", "yourself"}
_POSS_PRON = {"my", "your", "his", "its", "our", "their", "hers", "theirs",
              "mine", "yours", "ours"}
_CONJ = {"and", "or", "but", "nor", "yet", "so"}
_SUBORD = {"because", "although", "though", "while", "whereas", "if",
           "unless", "when", "whenever", "where", "wherever", "that",
           "whether", "as"}
_MODALS = {"can", "could", "may", "might", "must", "shall", "should", "will",
           "would", "ca", "wo"}
_BE = {"am", "is", "are", "was", "were", "be", "been", "being", "'s", "'re", "'m"}
_HAVE = {"have", "has", "had", "having", "'ve"}
_DO = {"do", "does", "did", "doing", "done"}
_ADVERBS = {"very", "not", "n't", "also", "too", "then", "now", "here",
            "there", "never", "always", "often", "again", "still", "just",
            "even", "only", "later", "soon", "strongly", "recently",
            "abroad", "overseas", "ago"}
# verb particles (RP after a verb: "running out", "fight on")
_PARTICLES = {"out", "up", "down", "off", "away", "back"}
_COMMON_VERBS = {
    "said", "says", "say", "met", "meet", "meets", "became", "become",
    "becomes", "resulted", "result", "results", "cost", "costs", "won",
    "win", "wins", "made", "make", "makes", "support", "supports",
    "supported", "fight", "fights", "fought", "announced", "announce",
    "announces", "signed", "sign", "signs", "visited", "visit", "visits",
    "launched", "launch", "launches", "led", "lead", "leads", "gave",
    "give", "gives", "took", "take", "takes", "saw", "see", "sees",
    "helped", "help", "helps", "created", "create", "creates", "acquired",
    "acquire", "acquires", "founded", "found", "founds", "born", "died",
    "die", "dies", "wrote", "write", "writes", "moved", "move", "moves",
    "lived", "live", "lives", "worked", "work", "works", "opened", "open",
    "opens", "built", "build", "builds", "joined", "join", "joins",
    "flow", "flows", "flowed", "hope", "hopes", "hoped", "plan", "plans",
    "planned", "push", "pushes", "pushed", "mount", "mounts", "mounted",
    "gather", "gathers", "gathered", "attract", "attracts", "attracted",
    "want", "wants", "wanted", "pose", "poses", "posed", "storm", "storms",
    "capture", "captures", "captured", "prevent", "prevents", "prevented",
    "isolate", "isolates", "isolated", "organize", "organizes", "organized",
    "sense", "senses", "sensed", "run", "runs", "ran", "prompt", "prompts",
    "prompted", "blacklist", "blacklists", "inherit", "inherits",
    "inherited", "return", "returns", "returned", "deal", "deals", "dealt",
    "contribute", "contributes", "contributed", "reach", "reaches",
    "reached",
}

# General verb breadth (a realistic common-English inventory, not a
# fixture slice): lemmas inflected programmatically below. Strongly
# noun-biased homographs (report, place, form, face, name, point ...)
# are deliberately excluded — the tagger's context guards are
# positional, and a wrong verb reading is costlier than a missed one.
_VERB_LEMMA_LIST = [
    "accept", "accuse", "achieve", "add", "admit", "adopt", "agree",
    "aim", "allow", "announce", "appear", "apply", "appoint", "approve",
    "argue", "arrest", "arrive", "ask", "attack", "attempt", "attend",
    "avoid", "ban", "begin", "believe", "belong", "blame", "block",
    "boost", "borrow", "buy", "call", "cancel", "carry", "cause",
    "celebrate", "claim", "climb", "collect", "combine", "compare",
    "compete", "complain", "complete", "confirm", "connect", "consider",
    "contain", "continue", "convince", "cover", "criticize", "cut",
    "decide", "declare", "decline", "defeat", "defend", "delay",
    "deliver", "demand", "deny", "depend", "describe", "destroy",
    "develop", "disappear", "discover", "discuss", "dismiss", "donate",
    "earn", "elect", "emerge", "employ", "enable", "encourage", "end",
    "enjoy", "enter", "escape", "establish", "estimate", "examine",
    "exist", "expand", "expect", "explain", "explore", "express",
    "extend", "fail", "fall", "fear", "feel", "fill", "find", "finish",
    "fly", "focus", "follow", "forget", "gain", "generate", "grab",
    "grow", "handle", "happen", "hate", "hear", "hide", "hire", "hit",
    "hold", "identify", "ignore", "imagine", "impose", "improve",
    "include", "increase", "indicate", "inform", "injure", "insist",
    "intend", "introduce", "invest", "investigate", "invite", "involve",
    "isolate", "keep", "kill", "know", "last", "learn", "leave", "lend",
    "lift", "like", "listen", "lose", "love", "maintain", "manage",
    "mean", "measure", "mention", "miss", "monitor", "need", "notice",
    "obtain", "occur", "offer", "operate", "oppose", "overcome", "own",
    "participate", "pay", "perform", "persuade", "pick", "point",
    "praise", "predict", "prefer", "prepare", "present", "prevent",
    "produce", "promise", "promote", "propose", "protect", "protest",
    "prove", "provide", "publish", "pull", "punish", "pursue", "raise",
    "read", "realize", "receive", "recognize", "recommend", "recover",
    "reduce", "refuse", "reject", "release", "remain", "remember",
    "remind", "remove", "repeat", "replace", "reply", "represent",
    "request", "require", "rescue", "resign", "resist", "resolve",
    "respond", "restore", "reveal", "review", "rise", "say", "search",
    "seek", "seem", "seize", "select", "sell", "send", "serve", "settle",
    "share", "shoot", "shut", "solve", "speak", "spend", "spread",
    "stand", "start", "state", "stay", "steal", "stop", "stress",
    "strike", "struggle", "submit", "succeed", "suffer", "suggest",
    "supply", "suppose", "surround", "survive", "suspect", "suspend",
    "teach", "tell", "think", "threaten", "throw", "train", "transfer",
    "travel", "treat", "try", "turn", "understand", "urge", "vote",
    "wait", "warn", "wear", "welcome", "withdraw", "witness", "wonder",
    "worry",
]

_IRREGULAR_PAST = {
    "begin": ("began", "begun"), "buy": ("bought",), "catch": ("caught",),
    "cut": ("cut",), "fall": ("fell", "fallen"), "feel": ("felt",),
    "find": ("found",), "fly": ("flew", "flown"), "forget": ("forgot",
    "forgotten"), "grow": ("grew", "grown"), "hear": ("heard",),
    "hide": ("hid", "hidden"), "hit": ("hit",), "hold": ("held",),
    "keep": ("kept",), "know": ("knew", "known"), "leave": ("left",),
    "lend": ("lent",), "lose": ("lost",), "mean": ("meant",),
    "pay": ("paid",), "read": ("read",), "rise": ("rose", "risen"),
    "seek": ("sought",), "sell": ("sold",), "send": ("sent",),
    "shoot": ("shot",), "shut": ("shut",), "speak": ("spoke", "spoken"),
    "spend": ("spent",), "spread": ("spread",), "stand": ("stood",),
    "steal": ("stole", "stolen"), "strike": ("struck",),
    "teach": ("taught",), "tell": ("told",), "think": ("thought",),
    "throw": ("threw", "thrown"), "understand": ("understood",),
    "wear": ("wore", "worn"), "withdraw": ("withdrew", "withdrawn"),
}


def _inflections(lemma: str):
    """lemma -> surface forms (base, 3sg, past/participle, gerund) with
    the standard orthographic rules; irregular pasts from the table."""
    forms = {lemma}
    if lemma.endswith(("s", "sh", "ch", "x", "z", "o")):
        forms.add(lemma + "es")
    elif lemma.endswith("y") and len(lemma) > 2 and lemma[-2] not in "aeiou":
        forms.add(lemma[:-1] + "ies")
    else:
        forms.add(lemma + "s")
    if lemma in _IRREGULAR_PAST:
        forms.update(_IRREGULAR_PAST[lemma])
        stem = lemma[:-1] if lemma.endswith("e") else lemma
        forms.add(stem + "ing")
        return forms
    if lemma.endswith("e") and not lemma.endswith(("ee", "ye", "oe")):
        forms.add(lemma + "d")
        forms.add(lemma[:-1] + "ing")
    elif lemma.endswith("y") and len(lemma) > 2 and lemma[-2] not in "aeiou":
        forms.add(lemma[:-1] + "ied")
        forms.add(lemma + "ing")
    else:
        # final-consonant doubling for stressed CVC monosyllables
        dbl = (len(lemma) >= 3 and lemma[-1] not in "aeiouwxy"
               and lemma[-2] in "aeiou" and lemma[-3] not in "aeiou"
               and len(lemma) <= 4)
        stem = lemma + lemma[-1] if dbl else lemma
        forms.add(stem + "ed")
        forms.add(stem + "ing")
    return forms


for _lemma in _VERB_LEMMA_LIST:
    _COMMON_VERBS.update(_inflections(_lemma))
_IRREGULAR_LEMMA = {
    "met": "meet", "became": "become", "won": "win", "made": "make",
    "fought": "fight", "led": "lead", "gave": "give", "took": "take",
    "saw": "see", "wrote": "write", "built": "build", "found": "find",
    "founded": "found", "born": "bear", "died": "die", "said": "say",
    "is": "be", "are": "be", "was": "be", "were": "be", "am": "be",
    "been": "be", "being": "be", "'s": "be", "'re": "be", "'m": "be",
    "has": "have", "had": "have", "having": "have", "'ve": "have",
    "does": "do", "did": "do", "done": "do", "doing": "do",
    "children": "child", "men": "man", "women": "woman", "people": "person",
    "ca": "can", "wo": "will", "'ll": "will", "'d": "would",
}

for _lemma, _pasts in _IRREGULAR_PAST.items():
    for _p in _pasts:
        _IRREGULAR_LEMMA.setdefault(_p, _lemma)

_ADJECTIVES = {
    "strong", "new", "good", "big", "high", "old", "major", "small",
    "large", "great", "long", "little", "own", "other", "last", "late",
    "young", "important", "public", "bad", "same", "able", "early",
    "free", "full", "low", "hard", "best", "better", "nuclear", "several",
    "many", "few", "much", "next", "final", "recent", "top", "annual",
    "explicit", "stark", "direct", "simple", "viable", "similar", "lone",
    "former", "current", "effective", "seasoned", "illegal",
}
# deverbal/plain nouns and verbs that the -al/-ic/-ish adjective-suffix
# heuristic would mis-tag
_SUFFIX_NOT_ADJ = {
    "approval", "arrival", "refusal", "proposal", "denial", "removal",
    "survival", "revival", "trial", "burial", "interval", "capital",
    "hospital", "animal", "signal", "metal", "total", "journal",
    "festival", "scandal", "tribunal", "rival",
    "music", "critic", "republic", "traffic", "logic", "topic", "clinic",
    "publish", "establish", "finish", "punish", "diminish", "distinguish",
    "abolish", "accomplish", "astonish", "furnish", "vanish", "flourish",
}
_ORDINALS = {"first", "second", "third", "fourth", "fifth", "sixth",
             "seventh", "eighth", "ninth", "tenth"}
_CARDINAL_WORDS = {"zero", "one", "two", "three", "four", "five", "six",
                   "seven", "eight", "nine", "ten", "eleven", "twelve",
                   "twenty", "thirty", "forty", "fifty", "sixty", "seventy",
                   "eighty", "ninety", "hundred", "thousand", "million",
                   "billion", "trillion"}

_MONTHS = {"january", "february", "march", "april", "may", "june", "july",
           "august", "september", "october", "november", "december"}


class Tagged(NamedTuple):
    morphofeat: str  # PTB tag
    pos: str         # KAF 1-char simple pos
    lemma: str


def _noun_lemma(w: str) -> str:
    if len(w) > 3 and w.endswith("ies"):
        return w[:-3] + "y"
    if len(w) > 4 and w.endswith("sses"):
        return w[:-2]
    if len(w) > 3 and w.endswith("ses"):
        return w[:-1]  # bases -> base, cases -> case
    if len(w) > 2 and w.endswith("s") and not w.endswith("ss") and not w.endswith("us"):
        return w[:-1]
    return w


def _prefer_known(primary: str, alt: str) -> str:
    """Disambiguate between two lemma candidates against the
    full-breadth PropBank lemma index when available (collapsed ->
    collapse not collaps; gloated -> gloat not gloate; grasped stays
    grasp). Suffix rules alone cannot decide the -e/-no-e classes."""
    try:
        from .resource_loaders import propbank_index
        pb = propbank_index()
    except Exception:
        pb = None
    if pb is not None and primary not in pb.by_lemma \
            and alt in pb.by_lemma:
        return alt
    return primary


def _known_verb_stem(stem: str) -> str:
    return _prefer_known(stem, stem + "e")


def _verb_lemma(w: str) -> str:
    if w in _IRREGULAR_LEMMA:
        return _IRREGULAR_LEMMA[w]
    if len(w) > 4 and w.endswith("ied"):
        return w[:-3] + "y"
    if len(w) > 3 and w.endswith("ed"):
        stem = w[:-2]
        if len(stem) > 2 and stem[-1] == stem[-2] and stem[-1] not in "aeiou" and stem[-1] not in "sl":
            # doubled final consonant usually undoubles (planned ->
            # plan) but -ff/-zz verbs keep it (rebuffed -> rebuff)
            return _prefer_known(stem[:-1], stem)
        if stem.endswith(("at", "iv", "os", "us", "ir", "ur", "iz", "bl",
                          "v", "c", "g", "as", "uad", "ut", "ens", "olat")):
            return _prefer_known(stem + "e", stem)
        return _known_verb_stem(stem)
    if len(w) > 4 and w.endswith("ing"):
        stem = w[:-3]
        if len(stem) > 2 and stem[-1] == stem[-2] and stem[-1] not in "aeiou":
            return _prefer_known(stem[:-1], stem)
        if stem.endswith(("at", "iv", "os", "us", "ir", "ur", "iz", "bl",
                          "v", "c", "uad", "ut", "ens", "olat", "ak", "om")):
            return _prefer_known(stem + "e", stem)
        return _known_verb_stem(stem)
    if len(w) > 3 and w.endswith("ies"):
        return w[:-3] + "y"
    if len(w) > 2 and w.endswith("es") and w[-3] in "shoxz":
        return w[:-2]
    if len(w) > 2 and w.endswith("s") and not w.endswith("ss"):
        return w[:-1]
    return w


def tag_tokens(tokens: List[Token]) -> List[Tagged]:
    """Deterministic POS+lemma. Context used: sentence position, the
    previous tag, capitalization."""
    out: List[Tagged] = []
    prev_tag = ""
    prev_sent = -1
    for idx, tok in enumerate(tokens):
        form = tok.form
        low = form.lower()
        sent_initial = tok.sent != prev_sent
        prev_sent = tok.sent
        t: Tagged
        if re.fullmatch(r"\$\d[\d,]*(?:\.\d+)?", form) or re.fullmatch(r"\d[\d,]*(?:\.\d+)?%?", form):
            t = Tagged("CD", "O", form)
        elif not any(c.isalnum() for c in form):
            t = Tagged(form if form in {",", ".", ":", ";", "``", "''", "(", ")"} else "SYM", "O", form)
        elif low in {"this", "that", "these", "those"} \
                and idx + 1 < len(tokens) and tokens[idx + 1].sent == tok.sent \
                and (tokens[idx + 1].form.lower() in _BE | _MODALS | _HAVE
                     or tokens[idx + 1].form.lower() in _COMMON_VERBS):
            # demonstrative pronoun in subject position: "This is ..."
            t = Tagged("PRP", "Q", low)
        elif low == "that" and (prev_tag.startswith("VB") or prev_tag == "MD"):
            # complementizer right after a verb ("said that donors ...")
            t = Tagged("IN", "P", "that")
        elif low in _DETS:
            t = Tagged("DT", "D", low)
        elif low in _POSS_PRON:
            t = Tagged("PRP$", "Q", low)
        elif low in _PRONOUNS:
            t = Tagged("PRP", "Q", low)
        elif low == "'s" and prev_tag in {"NNP", "NNPS", "NN", "NNS"}:
            t = Tagged("POS", "O", "'s")
        elif low in _BE:
            t = Tagged(_be_tag(low), "V", "be")
        elif low in _HAVE:
            t = Tagged("VBZ" if low == "has" else ("VBD" if low == "had" else "VBP"), "V", "have")
        elif low in _DO:
            t = Tagged("VBZ" if low == "does" else ("VBD" if low == "did" else "VBP"), "V", "do")
        elif low in _MODALS:
            t = Tagged("MD", "V", _IRREGULAR_LEMMA.get(low, low))
        elif low in {"n't", "not"}:
            t = Tagged("RB", "A", "not")
        elif low in {"most", "more", "less", "least"}:
            t = Tagged("RBS" if low in ("most", "least") else "RBR",
                       "A", low)
        elif low in _PARTICLES and prev_tag.startswith("VB"):
            t = Tagged("RP", "P", low)
        elif low in _CONJ:
            t = Tagged("CC", "C", low)
        elif low in _PREPS:
            t = Tagged("IN" if low != "to" else "TO", "P", low)
        elif low in _SUBORD:
            t = Tagged("IN", "P", low)
        elif (form[:1].isupper() and not sent_initial
                and low in _ADJECTIVES
                and idx + 1 < len(tokens)
                and tokens[idx + 1].sent == tok.sent
                and tokens[idx + 1].form[:1].isupper()
                and tokens[idx + 1].form[:1].isalpha()):
            # capitalized run start mid-sentence whose lowercase form is
            # a common adjective ("New York", "White House"): the
            # capitalization + capitalized successor outweigh the
            # lexicon — proper noun (standard NERC heuristic; fixes
            # NNP-run starts the adjective branch below would swallow)
            t = Tagged("NNP", "R", form)
        elif low in _ADJECTIVES or prev_tag == "RB" and low not in _COMMON_VERBS \
                and form[0].islower() and not low.endswith("ly"):
            t = Tagged("JJ", "G", low)
        elif low in _ORDINALS:
            t = Tagged("JJ", "G", low)
        elif low in _CARDINAL_WORDS:
            t = Tagged("CD", "O", low)
        elif low in _MONTHS and form[0].isupper():
            t = Tagged("NNP", "R", form)
        elif form[0].isupper() and (low in _GAZ or
                                    idx + 1 < len(tokens) and tokens[idx + 1].form[0].isupper()
                                    and (low + " " + tokens[idx + 1].form.lower()) in _GAZ):
            t = Tagged("NNP", "R", form)
        elif form[0].isupper() and (not sent_initial or "." in form or idx + 1 < len(tokens)
                                    and tokens[idx + 1].form[0].isupper()):
            t = Tagged("NNPS" if low.endswith("s") and low[:-1] in () else "NNP", "R", form)
        elif form[0].isalpha() and any(c.isupper() for c in form[1:]):
            # internal capitalization: "al-Assad", "McCain", "iPhone"
            t = Tagged("NNP", "R", form)
        elif low in _COMMON_VERBS and (
                prev_tag not in {"DT", "JJ", "PRP$", "POS"}
                or (idx > 0 and tokens[idx - 1].form.lower() == "that")) \
                and not (prev_tag in {"NN", "NNP"}
                         and _verb_tagged(low).morphofeat == "VBP"):
            # "that" before a known verb form is a relative pronoun /
            # complementizer, not a determiner blocking the verb reading.
            # A BASE form right after a singular noun cannot be its
            # finite verb (no 3sg agreement) — noun-compound reading
            # ("government report") beats the verb reading there.
            t = _verb_tagged(low)
        elif low in _ADVERBS or (low.endswith("ly") and len(low) > 3):
            t = Tagged("RB", "A", low[:-2] if low.endswith("ly") and len(low) > 4 and low not in _ADVERBS else low)
        elif low.endswith("ing") and len(low) > 4 and (
                prev_tag in {"VBZ", "VBP", "VBD", "MD", "VB"}
                or (idx + 1 < len(tokens) and tokens[idx + 1].sent == tok.sent
                    and tokens[idx + 1].form.lower()
                    in _DETS | _PRONOUNS | _POSS_PRON | _ADJECTIVES
                    | {"that", "out", "to"})
                or (prev_tag in {"IN", "TO"}
                    and idx + 1 < len(tokens)
                    and tokens[idx + 1].sent == tok.sent
                    and tokens[idx + 1].form[0].isupper())):
            # participle/gerund: after a verb, OR followed by a
            # determiner/pronoun/adjective complement ("posing a stark
            # challenge", "returning the favor") — a following plain noun
            # keeps it nominal ("fighting forces")
            t = Tagged("VBG", "V", _verb_lemma(low))
        elif low.endswith("ed") and len(low) > 3 and "-" in low \
                and prev_tag in {"IN", "TO", "DT", "JJ"} \
                and idx + 1 < len(tokens) and tokens[idx + 1].sent == tok.sent \
                and tokens[idx + 1].form[0].isalpha() \
                and tokens[idx + 1].form.lower() not in _PREPS | _DETS:
            # hyphenated participial premodifier: "like-minded donors"
            t = Tagged("JJ", "G", low)
        elif low.endswith("ed") and len(low) > 3 and prev_tag in {
                "VBZ", "VBP", "VBD", "MD", "VB", "RB", "",
                "NN", "NNS", "NNP", "NNPS", "PRP"}:
            # "-ed" right after a base/present verb and followed by a
            # bare nominal is a participial modifier ("storm fortified
            # positions"), not a finite verb
            if (prev_tag in {"VB", "VBP", "VBZ"} and idx + 1 < len(tokens)
                    and tokens[idx + 1].sent == tok.sent
                    and tokens[idx + 1].form[0].isalpha()
                    and tokens[idx + 1].form.lower() not in _PREPS
                    and tokens[idx + 1].form.lower() not in _DETS):
                t = Tagged("JJ", "G", _verb_lemma(low))
            else:
                t = _verb_tagged(low)
        elif low.endswith(("ous", "ful", "ive", "able", "ible", "al", "ic", "ish")) \
                and len(low) > 4 and low not in _SUFFIX_NOT_ADJ \
                and not (idx + 1 < len(tokens)
                         and tokens[idx + 1].form.lower() in ("who", "whom")):
            # "the official WHO stole" — a relative pronoun can only
            # attach to a nominal head, so the -al/-ic adjective
            # reading is impossible there
            t = Tagged("JJ", "G", low)
        elif form[0].isupper() and sent_initial and idx + 1 < len(tokens) and tokens[idx + 1].form[0].islower() and low not in _COMMON_VERBS:
            # sentence-initial capitalized common word: noun by default
            t = Tagged("NNS" if low.endswith("s") and len(low) > 3 else "NN", "N",
                       _noun_lemma(low))
        elif form[0].isupper():
            t = Tagged("NNP", "R", form)
        elif low.endswith("s") and len(low) > 3 and low in _COMMON_VERBS \
                and prev_tag in {"PRP", "NNP", "NNPS", "NNS", "NN"} \
                and low not in _CARDINAL_WORDS:
            # 3sg verb after nominal subject — only for KNOWN verb forms;
            # an unknown -s word after a nominal is far more often a
            # plural noun ("military bases", "oil fields", "the donors")
            t = Tagged("VBZ", "V", _verb_lemma(low))
        else:
            t = Tagged("NNS" if low.endswith("s") and len(low) > 3 else "NN", "N", _noun_lemma(low))
        out.append(t)
        prev_tag = t.morphofeat
    return out


def _be_tag(low: str) -> str:
    return {"am": "VBP", "is": "VBZ", "'s": "VBZ", "are": "VBP", "'re": "VBP",
            "'m": "VBP", "was": "VBD", "were": "VBD", "be": "VB",
            "been": "VBN", "being": "VBG"}[low]


def _verb_tagged(low: str) -> Tagged:
    lemma = _verb_lemma(low)
    if low.endswith("ing"):
        tag = "VBG"
    elif low == lemma + "s" or low.endswith("es") and not low.endswith("ses"):
        tag = "VBZ"
    elif low.endswith("ed") or low in _IRREGULAR_LEMMA and low not in ("fight", "meet"):
        tag = "VBD"
    else:
        tag = "VBP"
    return Tagged(tag, "V", lemma)


# Penn tag prefix -> KAF pos letter (KAFDocument term pos alphabet,
# same mapping the rule tagger emits)
_KAF_FOR_PENN = [("NNP", "R"), ("NN", "N"), ("VB", "V"), ("MD", "V"),
                 ("JJ", "G"), ("RB", "A"), ("DT", "D"), ("PRP", "Q"),
                 ("WP", "Q"), ("IN", "P"), ("TO", "P"), ("RP", "P"),
                 ("CC", "C"), ("CD", "O"), ("POS", "O")]


def tagged_from_penn(tokens: List[Token],
                     penn_tags: List[str]) -> List[Tagged]:
    """Model-predicted Penn tags -> Tagged tuples (KAF pos letter via
    _KAF_FOR_PENN; lemmas from the rule lemmatizer keyed by the
    predicted tag). This is how a registered BatchTagger's output
    re-enters the deterministic pipeline."""
    out: List[Tagged] = []
    for tok, tag in zip(tokens, penn_tags):
        low = tok.form.lower()
        pos = next((p for pre, p in _KAF_FOR_PENN
                    if tag.startswith(pre)), "O")
        if tag.startswith("VB") or tag == "MD":
            lemma = _IRREGULAR_LEMMA.get(low) or _verb_lemma(low)
        elif tag in ("NNS", "NNPS"):
            lemma = _noun_lemma(low)
        elif tag.startswith("NNP"):
            lemma = tok.form
        else:
            lemma = low
        out.append(Tagged(tag, pos, lemma))
    return out


def annotate_text(text: str):
    """text -> (sentences, tokens, tagged). POS layer: the registered
    batched model if one is installed (functions/model_slot.py — the
    pluggable Arrow-batch slot), else the deterministic rule tagger."""
    sents = split_sentences(text)
    tokens: List[Token] = []
    for s_idx, (b, e) in enumerate(sents):
        tokens.extend(tokenize_sentence(text, b, e, s_idx, len(tokens)))
    from .model_slot import active_tagger
    model = active_tagger()
    if model is not None:
        by_sent: List[List[str]] = [[] for _ in sents]
        for tok in tokens:
            by_sent[tok.sent].append(tok.form)
        penn = model.tag(by_sent)
        flat = [t for sent_tags in penn for t in sent_tags]
        tagged = tagged_from_penn(tokens, flat)
    else:
        tagged = tag_tokens(tokens)
    return sents, tokens, tagged
