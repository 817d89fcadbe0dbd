"""Print tokens/deps/predicates of a gold sentence (g1..g8) or stdin text.

Usage: python scripts/nlp_debug.py g7
       python scripts/nlp_debug.py "Some sentence."
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pikes_spark.functions.nlp import annotate_document  # noqa: E402
from pikes_spark.sources.gold import GOLD_PAGES  # noqa: E402


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else "g1"
    pages = dict(GOLD_PAGES)
    text = pages[arg] if arg in pages else arg
    doc = annotate_document(text)
    toks = doc["tokens"]
    terms = doc["terms"]
    print(text)
    print("\n-- tokens/terms --")
    for t, tm in zip(toks, terms):
        print(f"{t['id']:3d} {t['form']:>16} {tm['pos']:>2} {tm['morphofeat']:>4} {tm['lemma']}")
    print("\n-- deps --")
    for d in sorted(doc["deps"], key=lambda d: d["to"]):
        print(f"  {d['rfunc']:>6} head={d['from']:3d} {toks[d['from']]['form']:>14}"
              f"  dep={d['to']:3d} {toks[d['to']]['form']}")
    print("\n-- predicates --")
    for p in doc["predicates"]:
        refs = ",".join(f"{r['resource'][:2]}:{r['reference']}" for r in p["refs"])
        print(f"  [{p['head_id']:3d} {toks[p['head_id']]['form']}] {refs}")
        for r in p["roles"]:
            print(f"      {r['sem_role']:>7} -> {r['head_id']:3d} "
                  f"{toks[r['head_id']]['form']} span={r['term_ids']}")
    print("\n-- corefs --")
    for c in doc["corefs"]:
        print("  " + " | ".join(" ".join(toks[i]["form"] for i in sp)
                                for sp in c["spans"]))
    print("\n-- entities --")
    for e in doc["entities"]:
        print(f"  {e['type']:>8} named={e['named']} "
              + " ".join(toks[i]["form"] for i in e["term_ids"]))


if __name__ == "__main__":
    main()
