"""Fast repo-vs-gold component table (no EVAL.md rewrite).

Usage: python scripts/gold_quick.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pikes_spark.eval.reference_data import (load_gold_graphs,  # noqa: E402
                                             load_pikes_graphs,
                                             load_report_markers,
                                             apply_markers)
from pikes_spark.eval.spark_system import build_spark_graphs  # noqa: E402
from pikes_spark.eval.evaluate import evaluate, report, align  # noqa: E402


def main() -> None:
    gold = load_gold_graphs()
    pikes = load_pikes_graphs()
    mappings = {s: align(gold[s], pikes[s]) for s in gold}
    apply_markers(gold, load_report_markers(mappings))
    spark = build_spark_graphs()
    print(report(evaluate(gold, spark), "repo vs gold"))


if __name__ == "__main__":
    main()
