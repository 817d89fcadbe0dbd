"""Resource-root decoupling (VERDICT r3 item 3): when
$PIKES_RESOURCES_DIR is set it is authoritative — no sibling-checkout
probe — and the engine degrades gracefully to its in-code fixtures
when the root is empty; fetch_resources.py populates a root that then
serves full breadth."""

import os
import subprocess
import sys

import pytest

from pikes_spark.functions import resource_loaders as rl


@pytest.fixture
def resource_env(tmp_path):
    saved = {k: os.environ.get(k) for k in
             ("PIKES_RESOURCES_DIR", "PIKES_PROPBANK_TSV",
              "PIKES_NOMBANK_TSV", "PIKES_SUMO_TSV", "PIKES_YAGO_TSV",
              "PIKES_LINKING_STOPWORDS", "PIKES_MAPPINGS_FRAMES",
              "PIKES_MAPPINGS_ROLES")}
    for k in saved:
        os.environ.pop(k, None)
    rl.reset_resource_caches()
    yield tmp_path
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
    rl.reset_resource_caches()


def test_empty_root_disables_breadth_and_skips_ref_probe(resource_env):
    empty = resource_env / "empty"
    empty.mkdir()
    os.environ["PIKES_RESOURCES_DIR"] = str(empty)
    rl.reset_resource_caches()
    # authoritative root: nothing resolves, even though the sandbox's
    # /root/reference checkout exists
    assert rl.resolve_resource("PIKES_PROPBANK_TSV", "PropBank.tsv") is None
    assert rl.propbank_index() is None
    assert rl.nombank_index() is None
    assert rl.sumo_data() is None
    assert rl.yago_offsets() is None
    assert rl.linking_stopwords() is None
    assert rl.sense_mappings() is None
    assert rl.broad_roleset_inventory() is None


def test_pipeline_runs_standalone_on_fixtures(resource_env):
    empty = resource_env / "empty"
    empty.mkdir()
    os.environ["PIKES_RESOURCES_DIR"] = str(empty)
    rl.reset_resource_caches()
    from pikes_spark.eval.spark_system import distill_gold_page
    triples, _heads = distill_gold_page(
        "http://example.org/standalone/1",
        "G.W. Bush met his supporters in Paris. They signed an "
        "agreement on March 2013.")
    comps = {t["component"] for t in triples}
    assert len(triples) > 20
    assert {"instance", "mention", "edge"} <= comps


def test_fetch_from_checkout_restores_breadth(resource_env):
    root = resource_env / "res"
    root.mkdir()
    env = dict(os.environ, PIKES_RESOURCES_DIR=str(root))
    out = subprocess.run(
        [sys.executable, "scripts/fetch_resources.py",
         "--from-checkout", "/root/reference"],
        capture_output=True, text=True, env=env, check=True)
    assert "fetched PropBank.tsv" in out.stdout
    os.environ["PIKES_RESOURCES_DIR"] = str(root)
    rl.reset_resource_caches()
    pb = rl.propbank_index()
    assert pb is not None and len(pb.by_id) > 5000
    inv = rl.broad_roleset_inventory()
    assert inv is not None and "compete.01" in inv
