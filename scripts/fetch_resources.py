"""Populate $PIKES_RESOURCES_DIR with the public resource files the
breadth loaders consume (deployment decoupling, VERDICT r3 item 3).

Mirrors the reference's ``getDependencies.sh:1-9`` (WordNet dict +
model downloads) plus the resource TSVs the reference ships inside
``pikes-resources/src/main/resources/.../resources/`` in its public
GPL repo (github.com/BenediktHeinrichs/pikes). Two modes:

  python scripts/fetch_resources.py --from-checkout /path/to/pikes
      copy the TSVs out of a local checkout (works offline; this is
      what the sandbox uses, pointed at /root/reference)

  python scripts/fetch_resources.py --download
      fetch from the public URLs (WordNet 3.1 dict from
      wordnetcode.princeton.edu per getDependencies.sh:1; the TSVs
      from the public pikes repo raw URLs). Requires network; each
      failure is reported and skipped — the engine degrades to its
      in-code fixtures for anything missing.

Target dir: $PIKES_RESOURCES_DIR (required). After populating it, the
engine runs standalone — no sibling checkout probe happens when
PIKES_RESOURCES_DIR is set (resource_loaders.resolve_resource).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tarfile
import urllib.request

# files consumed by pikes_spark.functions.resource_loaders /
# wordnet_real / el_dict, relative to the checkout's resources dir
_CHECKOUT_RES = ("pikes-resources/src/main/resources/"
                 "eu/fbk/dkm/pikes/resources")
_TSVS = ["PropBank.tsv", "NomBank.tsv", "Sumo.tsv", "YagoTaxonomy.tsv",
         "linking_stopwords", "mappings-frames.tsv", "mappings-roles.tsv"]

_RAW_BASE = ("https://raw.githubusercontent.com/BenediktHeinrichs/pikes/"
             "master/" + _CHECKOUT_RES)
_WORDNET_URL = "https://wordnetcode.princeton.edu/wn3.1.dict.tar.gz"
# public DBpedia Spotlight lexicalization/prior data (surface ->
# resource with counts); any file in that TSV shape works — see
# pikes_spark/functions/el_dict.py for the accepted format
_EL_DICT_HINT = ("EL dictionary: provide a surface\\turi\\tcount TSV as "
                 "$PIKES_RESOURCES_DIR/el_candidates.tsv (e.g. built "
                 "from the public DBpedia lexicalizations dataset)")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--from-checkout", metavar="DIR",
                    help="local pikes checkout to copy resource TSVs from")
    ap.add_argument("--download", action="store_true",
                    help="fetch from the public URLs (needs network)")
    args = ap.parse_args()

    dest = os.environ.get("PIKES_RESOURCES_DIR")
    if not dest:
        print("set PIKES_RESOURCES_DIR to the target directory first",
              file=sys.stderr)
        return 2
    os.makedirs(dest, exist_ok=True)

    ok, failed = [], []
    if args.from_checkout:
        src_dir = os.path.join(args.from_checkout, _CHECKOUT_RES)
        for name in _TSVS:
            src = os.path.join(src_dir, name)
            try:
                shutil.copyfile(src, os.path.join(dest, name))
                ok.append(name)
            except OSError as e:
                failed.append((name, str(e)))
    if args.download:
        for name in _TSVS:
            try:
                urllib.request.urlretrieve(f"{_RAW_BASE}/{name}",
                                           os.path.join(dest, name))
                ok.append(name)
            except Exception as e:  # noqa: BLE001 — report-and-continue
                failed.append((name, str(e)))
        try:  # getDependencies.sh:1-3
            tgz = os.path.join(dest, "wn3.1.dict.tar.gz")
            urllib.request.urlretrieve(_WORDNET_URL, tgz)
            with tarfile.open(tgz) as tf:
                tf.extractall(dest, filter="data")
            os.rename(os.path.join(dest, "dict"),
                      os.path.join(dest, "wordnet"))
            ok.append("wordnet/")
        except Exception as e:  # noqa: BLE001
            failed.append(("wordnet/", str(e)))

    for name in ok:
        print(f"fetched {name}")
    for name, err in failed:
        print(f"SKIPPED {name}: {err}", file=sys.stderr)
    print(_EL_DICT_HINT)
    return 0 if ok or not (args.from_checkout or args.download) else (
        0 if ok else 1)


if __name__ == "__main__":
    sys.exit(main())
