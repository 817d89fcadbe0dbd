"""Real WordNet index loader (functions/wordnet_real.py) and its
layering under the N4 MFS lookup + F2 typing chain."""

import os

import pytest

from pikes_spark.functions import wordnet_real as wr
from pikes_spark.functions import wordnet_fixture as wf

# WNDB-format index.noun slice (real WN-3.0 offsets; first offset =
# most frequent sense per the format's frequency ordering)
_INDEX_NOUN = """\
  1 This is a mock license header line the parser must skip
competitor n 1 2 @ ~ 1 1 10533013
supporter n 1 1 @ 1 0 10677713
bank n 2 3 @ ~ #m 2 2 08420278 09213565
"""
_INDEX_VERB = """\
compete v 1 2 @ ~ 1 1 01072949
"""


@pytest.fixture
def wn_dir(tmp_path, monkeypatch):
    d = tmp_path / "wn"
    d.mkdir()
    (d / "index.noun").write_text(_INDEX_NOUN)
    (d / "index.verb").write_text(_INDEX_VERB)
    monkeypatch.setenv("PIKES_WORDNET_DIR", str(d))
    wr.reset_wordnet_cache()
    yield d
    wr.reset_wordnet_cache()


def test_parse_index_file_first_offset_wins():
    idx = wr.parse_index_file(_INDEX_NOUN, "n")
    assert idx["competitor"] == "10533013-n"
    assert idx["bank"] == "08420278-n"  # MFS = first listed offset


def test_mfs_layering_fixture_first(wn_dir):
    # fixture rows keep winning for curated lemmas
    assert wf.most_frequent_sense("supporter", "N") == "10677713-n"
    # out-of-fixture lemma resolves through the real index
    assert wf.most_frequent_sense("competitor", "N") == "10533013-n"
    assert wf.most_frequent_sense("compete", "V") == "01072949-v"
    # unknown lemma stays None
    assert wf.most_frequent_sense("zorblat", "N") is None


def test_chain_to_yago_typing(wn_dir):
    """N4 -> F2: the real-index synset for 'competitor' reaches the
    real YagoTaxonomy class (example.md:46 dbyago:Rival110533013)."""
    syn = wf.most_frequent_sense("competitor", "N")
    yago = wf.synset_to_yago(syn)
    if yago is None:
        pytest.skip("YagoTaxonomy.tsv not resolvable in this env")
    assert yago.endswith("Rival110533013")


def test_no_dir_degrades_to_none(monkeypatch):
    monkeypatch.delenv("PIKES_WORDNET_DIR", raising=False)
    monkeypatch.setenv("PIKES_RESOURCES_DIR", "/nonexistent")
    wr.reset_wordnet_cache()
    try:
        assert wr.mfs_index("N") is None
        assert wf.most_frequent_sense("bank", "N") is None
        # fixture layer still serves curated lemmas (incl. the
        # reference-documented competitor synset added in r4)
        assert wf.most_frequent_sense("fight", "N") == "00958896-n"
        assert wf.most_frequent_sense("competitor", "N") == "10533013-n"
    finally:
        wr.reset_wordnet_cache()
