"""Two-parallelism scaling measurement (the sandbox stand-in for
N -> 4N executors; see BENCH.md).

The sandbox host is shared (co-tenant load makes single runs vary
2-3x), so we alternate lo/hi runs for ``rounds`` rounds and use the
MINIMUM wall per level — the standard low-noise estimator on shared
hardware. Usage:

    python scripts/scaling_bench.py [sf_dir] [replicate] [lo] [hi] [rounds]
"""

import json
import sys

sys.path.insert(0, ".")

from bench import _pipeline_wall  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    rounds = int(sys.argv[5]) if len(sys.argv) > 5 else 3

    walls = {lo: [], hi: []}
    triples = None
    for r in range(rounds):
        for cores in (lo, hi):
            wall, n = _pipeline_wall(f"local[{cores}]", sf_dir, 2 * cores, rep)
            walls[cores].append(round(wall, 1))
            triples = n
            print(json.dumps({"round": r, "cores": cores,
                              "wall": round(wall, 1), "triples": n}), flush=True)
    w_lo, w_hi = min(walls[lo]), min(walls[hi])
    eff = (triples / w_hi) / (triples / w_lo) / (hi / lo)
    print(json.dumps({
        "replicate": rep, "cores_lo": lo, "cores_hi": hi,
        "walls_lo": walls[lo], "walls_hi": walls[hi],
        "min_wall_lo": w_lo, "min_wall_hi": w_hi,
        "triples": triples,
        "tput_lo": round(triples / w_lo), "tput_hi": round(triples / w_hi),
        "scaling_efficiency": round(eff, 3)}), flush=True)


if __name__ == "__main__":
    main()
