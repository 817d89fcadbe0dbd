"""Unit tests: html wrap/extract inversion, tokenizer, numbers, hashing,
timex values (FIXTURES.md §6 micro-fixtures)."""

import pytest
from hypothesis import given, settings, strategies as st

from pikes_spark.functions.htmltext import extract_text, wrap_html, valid_page
from pikes_spark.functions.tokenize import annotate_text, split_sentences
from pikes_spark.functions.numbers import parse_spelled_number, ordinal_rank
from pikes_spark.functions.hashing import (
    fact_graph_iri, fingerprint, murmur3_x64_128, murmur3_id)
from pikes_spark.functions.nlp import annotate_document


# --- html ------------------------------------------------------------------

def test_wrap_extract_inverse_basic():
    t = "Hello & <world>.\n\nSecond > paragraph."
    assert extract_text(wrap_html(t)) == t


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF), max_size=400))
def test_wrap_extract_inverse_property(t):
    assert extract_text(wrap_html(t)) == t


def test_extract_strips_boilerplate():
    t = "Article body."
    html = wrap_html(t)
    assert b"Home" in html and b"Example Corp" in html
    out = extract_text(html)
    assert "Home" not in out and "Example Corp" not in out


def test_valid_page_guard():
    assert not valid_page("")
    assert valid_page("x")
    assert not valid_page("x" * 1_000_001)


# --- sentences / tokens ----------------------------------------------------

def test_sentence_split_two_sentences():
    text = "It cost $5 billion. John and Mary met in London."
    spans = split_sentences(text)
    assert len(spans) == 2
    assert text[spans[0][0]:spans[0][1]] == "It cost $5 billion."


def test_sentence_split_abbreviations():
    text = "Mr. Smith met Dr. Jones. They talked."
    spans = split_sentences(text)
    assert len(spans) == 2
    assert text[spans[0][0]:spans[0][1]] == "Mr. Smith met Dr. Jones."


def test_sentence_split_blank_line():
    text = "One sentence\n\nanother fragment"
    assert len(split_sentences(text)) == 2


def test_token_offsets_are_exact():
    text = "G.W. Bush and Bono are strong."
    _, tokens, _ = annotate_text(text)
    for t in tokens:
        assert text[t.begin:t.begin + t.length] == t.form


def test_contractions():
    text = "They can't win."
    _, tokens, _ = annotate_text(text)
    forms = [t.form for t in tokens]
    assert "ca" in forms and "n't" in forms


# --- numbers ---------------------------------------------------------------

@pytest.mark.parametrize("words,expected", [
    (["five", "billion"], 5e9),
    (["twenty-three"], 23),
    (["3.5", "million"], 3.5e6),
    (["one", "hundred", "twenty"], 120),
    (["seventeen"], 17),
    (["5"], 5),
    (["banana"], None),
])
def test_spelled_numbers(words, expected):
    assert parse_spelled_number(words) == expected


def test_ordinals():
    assert ordinal_rank("third") == 3
    assert ordinal_rank("5th") == 5
    assert ordinal_rank("dog") is None


# --- hashing ---------------------------------------------------------------

def test_murmur3_known_vector():
    # Public MurmurHash3 x64 128 test vector (seed 0, empty input)
    assert murmur3_x64_128(b"") == (0, 0)
    # deterministic, different for different input
    assert murmur3_x64_128(b"hello") != murmur3_x64_128(b"hello!")


def test_fact_iri_deterministic():
    a = fact_graph_iri("s", "p", "o")
    assert a == fact_graph_iri("s", "p", "o")
    assert a.startswith("fact:") and len(a) == 5 + 22
    assert a != fact_graph_iri("s", "p", "o", obj_is_literal=True)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=120), min_size=1, max_size=20))
def test_murmur3_batch_matches_scalar(parts_list):
    """The numpy-vectorized batch hasher must be bit-identical to the
    scalar murmur3_id across arbitrary lengths (block boundaries, empty
    strings, multi-byte UTF-8) — the frozen gold checksums depend on it."""
    from pikes_spark.functions.hashing import murmur3_ids_batch
    keys = [chr(0).join(["", s]).encode("utf-8", "surrogatepass")
            for s in parts_list]
    assert murmur3_ids_batch(keys) == [murmur3_id(["", s]) for s in parts_list]


def test_murmur3_batch_block_boundaries():
    from pikes_spark.functions.hashing import murmur3_ids_batch
    cases = ["x" * n for n in (0, 1, 7, 8, 9, 15, 16, 17, 23, 24, 31, 32, 33,
                               47, 48, 63, 64, 65, 127, 128, 129)]
    keys = [c.encode() for c in cases]
    import struct
    from pikes_spark.functions.hashing import murmur3_x64_128, _B64
    def scalar_render(b):
        h1, h2 = murmur3_x64_128(b)
        v = (h1 << 64) | h2
        return "".join(_B64[(v >> (6 * i)) & 63] for i in range(22))
    assert murmur3_ids_batch(keys) == [scalar_render(k) for k in keys]


def test_fingerprint_matches_sql_definition():
    # acc = (acc*131 + ord(ch)) % 1e9+7
    assert fingerprint("") == 0
    assert fingerprint("a") == ord("a")
    assert fingerprint("ab") == (ord("a") * 131 + ord("b")) % 1_000_000_007


# --- timex values ----------------------------------------------------------

@pytest.mark.parametrize("text,value,ttype", [
    ("They met in March 2002.", "2002-03", "DATE"),
    ("It happened in 1998.", "1998", "DATE"),
    ("He stayed for three weeks.", "P3W", "DURATION"),
    ("The deadline is March 5, 2002.", "2002-03-05", "DATE"),
])
def test_timex_values(text, value, ttype):
    doc = annotate_document(text)
    assert any(t["value"] == value and t["type"] == ttype for t in doc["timexes"]), doc["timexes"]


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=9, max_codepoint=0x1F9FF),
               max_size=600))
def test_annotate_distill_never_crashes_and_offsets_valid(text):
    """Fuzz the full rule-NLP + distillation path: arbitrary unicode
    must never raise, token offsets must index into the text, and
    every emitted triple must carry a subject and predicate."""
    from pikes_spark.functions.nlp import annotate_document
    from pikes_spark.operators.distill import distill_document
    doc = annotate_document(text)
    for t in doc["tokens"]:
        assert 0 <= t["begin"] <= len(text)
        assert text[t["begin"]:t["begin"] + t["len"]] == t["form"]
    triples = distill_document("http://e/fuzz", text, doc, "en")
    for tr in triples:
        assert tr["subject"] and tr["predicate"]
