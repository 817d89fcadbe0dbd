"""Dump per-component FN/FP items of the repo-vs-gold evaluation.

Usage: python scripts/gold_diag.py [component ...]
Default components: roles_pb roles_nb roles_vn roles_fn edges sameas.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pikes_spark.eval.reference_data import (load_gold_graphs,  # noqa: E402
                                             load_report_markers,
                                             load_pikes_graphs,
                                             apply_markers)
from pikes_spark.eval.spark_system import build_spark_graphs  # noqa: E402
from pikes_spark.eval.evaluate import align, evaluate_sentence  # noqa: E402


def short(x):
    if not isinstance(x, str):
        return repr(x)
    for pre in ("http://www.newsreader-project.eu/time/",
                "http://pikes.fbk.eu/ontologies/eval#",):
        if x.startswith(pre):
            return "t:" + x[len(pre):]
    if "#" in x:
        return x.rsplit("#", 1)[1]
    return x.rsplit("/", 1)[-1]


def main() -> None:
    comps = sys.argv[1:] or ["roles_pb", "roles_nb", "roles_vn",
                             "roles_fn", "edges", "sameas"]
    gold = load_gold_graphs()
    pikes = load_pikes_graphs()
    mappings = {s: align(gold[s], pikes[s]) for s in gold}
    apply_markers(gold, load_report_markers(mappings))
    spark = build_spark_graphs()
    for sent in sorted(gold.keys()):
        g, t = gold[sent], spark[sent]
        mapping = align(g, t)
        prs = evaluate_sentence(g, t, mapping)
        header = False
        for comp in comps:
            pr = prs[comp]
            if not pr.fn_items and not pr.fp_items:
                continue
            if not header:
                print(f"\n===== {short(sent)}: {g.sentence.text[:90]}")
                header = True
            for it in pr.fn_items:
                if isinstance(it, tuple):
                    print(f"  {comp} FN: " + " | ".join(short(v) for v in it))
                else:
                    print(f"  {comp} FN: {short(it)}")
            for it in pr.fp_items:
                if isinstance(it, tuple):
                    print(f"  {comp} FP: " + " | ".join(short(v) for v in it))
                else:
                    print(f"  {comp} FP: {short(it)}")


if __name__ == "__main__":
    main()
