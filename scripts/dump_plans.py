"""Dump .explain('formatted') for named queries to plans/<tag>/<query>_<suffix>.txt.

Usage: python scripts/dump_plans.py <suffix> <query> [<query> ...]
Writes to plans/r06/. Uses sf0.1 and a local[8] session (plan shape is
independent of core count)."""
import os, sys, io, contextlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pikes_spark.session import get_spark


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app="plans", master="local[8]", shuffle_partitions=8)
    import __spark_entry__ as entry
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
