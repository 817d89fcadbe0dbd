"""Driver-style correctness check: run every queries() entry and its
oracle_sql() in DuckDB over the same sf dir; compare row count, column
names, and order-insensitive value hash. Usage:

    python scripts/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import hashlib

import duckdb

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm(r[i]) for i in order) for r in rows
    )
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def _norm(v):
    if v is None:
        return ""
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


# The driver's value hash is type-sensitive: DuckDB HUGEINT (e.g. an
# un-CAST SUM over an integer column) round-trips through pandas as
# float64 and hashes differently from Spark's bigint even when every
# value is equal.  str()-normalization above masks that, so we
# additionally canonicalize both engines' column TYPES and fail on (a)
# any type outside the driver-safe set and (b) a cross-engine class
# mismatch (int column vs float column).  VERDICT r4 finding 2.
_DUCK_CANON = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date", "BLOB": "binary",
    "TIMESTAMP": "timestamp", "TIMESTAMP WITH TIME ZONE": "timestamp",
    "TIMESTAMP_NS": "timestamp", "TIMESTAMP_MS": "timestamp",
}
_SPARK_CANON = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "boolean": "bool", "date": "date", "binary": "binary",
    "timestamp": "timestamp", "timestamp_ntz": "timestamp",
}


def _canon_duck_type(t) -> str:
    s = str(t).upper()
    if s.endswith("[]") or s.startswith("STRUCT") or s.startswith("MAP"):
        return "nested"
    return _DUCK_CANON.get(s, f"BANNED({s})")


def _canon_spark_type(dt) -> str:
    s = dt.simpleString()
    if s.startswith(("array", "struct", "map")):
        return "nested"
    return _SPARK_CANON.get(s, f"BANNED({s})")


def type_audit(spark_schema, spark_cols, duck_types, duck_cols):
    """Return a list of human-readable type problems (empty = clean)."""
    problems = []
    duck_by_col = {c: _canon_duck_type(t) for c, t in zip(duck_cols, duck_types)}
    spark_by_col = {}
    for f, c in zip(spark_schema.fields, spark_cols):
        spark_by_col[c] = _canon_spark_type(f.dataType)
    for c, ct in duck_by_col.items():
        if ct.startswith("BANNED"):
            problems.append(f"duckdb col {c!r} has driver-unsafe type {ct}")
    for c, ct in spark_by_col.items():
        if ct.startswith("BANNED"):
            problems.append(f"spark col {c!r} has driver-unsafe type {ct}")
    for c in set(duck_by_col) & set(spark_by_col):
        a, b = spark_by_col[c], duck_by_col[c]
        if a != b and not (a.startswith("BANNED") or b.startswith("BANNED")):
            problems.append(f"col {c!r} class mismatch: spark {a} vs duckdb {b}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as entrymod
    from pikes_spark.session import get_spark

    spark = get_spark(app="oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            spark_rows = df.collect()
            spark_cols = df.columns
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: spark error {repr(exc)[:200]}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spark_rows)} rows")
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = [c.lower() for c in rel.columns]
            duck_types = list(rel.types)
            duck_rows = rel.fetchall()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL {name}: duckdb error {repr(exc)[:200]}")
            continue
        sc = [c.lower() for c in spark_cols]
        ok_schema = sorted(sc) == sorted(duck_cols)
        ok_count = len(spark_rows) == len(duck_rows)
        type_problems = type_audit(df.schema, sc, duck_types, duck_cols)
        h_s = value_hash([[r[c] for c in spark_cols] for r in spark_rows], sc)
        h_d = value_hash(duck_rows, duck_cols)
        ok_hash = h_s == h_d and not type_problems
        status = "OK  " if (ok_schema and ok_count and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{status} {name}: rows {len(spark_rows)}/{len(duck_rows)} "
              f"schema={'ok' if ok_schema else f'{sc} vs {duck_cols}'} "
              f"hash={'ok' if ok_hash else f'{h_s} vs {h_d}'}")
        for p in type_problems:
            print(f"   TYPE {p}")
        if not ok_hash and ok_schema and ok_count:
            # show first differing rows for debugging
            ss = sorted(tuple(_norm(r[c]) for c in spark_cols) for r in spark_rows)
            dd = sorted(tuple(_norm(v) for v in r) for r in duck_rows)
            for i, (x, y) in enumerate(zip(ss, dd)):
                if x != y:
                    print(f"   first diff at {i}:\n    spark={x}\n    duck ={y}")
                    break
    spark.stop()
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
