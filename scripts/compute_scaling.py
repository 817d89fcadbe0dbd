"""Compute-only N vs 4N scaling (annotate+distill, noop sink, warmup).
Usage: python scripts/compute_scaling.py [sf_dir] [replicate] [lo] [hi] [rounds]
"""

import json
import sys

sys.path.insert(0, ".")

from bench import _compute_wall  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    rounds = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    walls = {lo: [], hi: []}
    n = None
    for r in range(rounds):
        for cores in (lo, hi):
            wall, n = _compute_wall(f"local[{cores}]", sf_dir, 2 * cores, rep)
            walls[cores].append(round(wall, 1))
            print(json.dumps({"round": r, "cores": cores, "wall": round(wall, 1),
                              "triples": n}), flush=True)
    w_lo, w_hi = min(walls[lo]), min(walls[hi])
    print(json.dumps({
        "mode": "compute_only", "replicate": rep,
        "cores_lo": lo, "cores_hi": hi,
        "walls_lo": walls[lo], "walls_hi": walls[hi],
        "min_wall_lo": w_lo, "min_wall_hi": w_hi, "triples": n,
        "tput_lo": round(n / w_lo), "tput_hi": round(n / w_hi),
        "scaling_efficiency": round((n / w_hi) / (n / w_lo) / (hi / lo), 3)}),
        flush=True)


if __name__ == "__main__":
    main()
