"""Two-parallelism scaling measurement (the sandbox stand-in for
N -> 4N executors; see BENCH.md). Usage:

    python scripts/scaling_bench.py [sf_dir] [replicate] [lo] [hi]
"""

import json
import sys

sys.path.insert(0, ".")

from bench import _pipeline_wall  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    wall_lo, n_lo = _pipeline_wall(f"local[{lo}]", sf_dir, 2 * lo, rep)
    print(json.dumps({"cores": lo, "wall": round(wall_lo, 1), "triples": n_lo,
                      "tput": round(n_lo / wall_lo)}), flush=True)
    wall_hi, n_hi = _pipeline_wall(f"local[{hi}]", sf_dir, 2 * hi, rep)
    print(json.dumps({"cores": hi, "wall": round(wall_hi, 1), "triples": n_hi,
                      "tput": round(n_hi / wall_hi)}), flush=True)
    eff = (n_hi / wall_hi) / (n_lo / wall_lo) / (hi / lo)
    print(json.dumps({"replicate": rep, "scaling_efficiency": round(eff, 3)}),
          flush=True)


if __name__ == "__main__":
    main()
