"""Local mirror of the driver's correctness gate: run each queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet,
compare row count, column names, and an order-insensitive value hash.

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    # rows canonicalize through json (one string per row): naive
    # '|'/'\n' joins would let free-text fields containing the separator
    # alias distinct result sets to the same hash
    import json

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(json.dumps([_fmt(r[i]) for i in order]) for r in rows)
    return hashlib.md5("\n".join(canon).encode()).hexdigest()


def _fmt(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.10g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, list):
        return "[" + ",".join(_fmt(x) for x in v) + "]"
    return str(v)


def make_duck_con(sf_dir: str):
    """DuckDB connection with the standard table views registered —
    shared by this CLI and tests/test_queries_oracle.py so both gates
    always see the same table set."""
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

    from relation_extraction_cdr_spark.plans.queries import ORACLES, QUERIES
    from relation_extraction_cdr_spark.session import spark_session

    unknown = only - set(QUERIES)
    if unknown:
        # a typo'd name silently checking nothing would print ALL OK
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        return 2

    spark = spark_session("oracle_check")
    spark.sparkContext.setLogLevel("ERROR")

    con = make_duck_con(sf_dir)

    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = [tuple(r) for r in sdf.collect()]
            spark_cols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in ORACLES:
            print(f"OK?  {name}: rows={len(spark_rows)} (no oracle — rows-only check)")
            continue
        try:
            res = con.execute(ORACLES[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = []
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols spark={spark_cols} duck={duck_cols}")
        else:
            hs = value_hash(spark_rows, spark_cols)
            hd = value_hash(duck_rows, duck_cols)
            if hs != hd:
                problems.append("value-hash mismatch")
                s = sorted(spark_rows)[:3]
                d = sorted(duck_rows)[:3]
                problems.append(f"spark sample={s} duck sample={d}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"OK   {name}: rows={len(spark_rows)} hash match")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
