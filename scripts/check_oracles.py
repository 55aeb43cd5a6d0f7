"""Local replica of the driver's correctness gate: run every
``__spark_entry__.queries()`` entry at sf0.01 and compare against its
``oracle_sql()`` DuckDB result — row count, column names, and exact sorted
values (stricter than a value hash: exact equality including doubles, so a
pass here implies a hash match).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as e

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_conn(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize_rows(cols, rows):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from continuousfilteringbenchmark_spark.session import get_spark

    spark = get_spark("check_oracles", cpus=8, shuffle_partitions=16)
    con = duck_conn(sf_dir)

    oracles = e.oracle_sql()
    failures = []
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sorted(sdf.columns)
        srows = [row.asDict() for row in sdf.collect()]
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(srows)} rows, cols={scols}")
            continue
        try:
            cur = con.execute(oracles[name])
            raw = cur.fetchall()
            names = [d[0] for d in cur.description]
        except Exception as ex:
            failures.append(name)
            print(f"{name:28s} ORACLE SQL ERROR: {ex}")
            continue
        ocols = sorted(names)
        orows = [dict(zip(names, r)) for r in raw]
        status = []
        if len(srows) != len(orows):
            status.append(f"ROWS {len(srows)} vs {len(orows)}")
        if scols != ocols:
            status.append(f"COLS {scols} vs {ocols}")
        if not status:
            a = normalize_rows(scols, srows)
            b = normalize_rows(scols, orows)
            if a != b:
                n_bad = sum(1 for x, y in zip(a, b) if x != y)
                status.append(f"VALUES differ ({n_bad}/{len(a)} rows)")
                for x, y in list(zip(a, b))[:2000]:
                    if x != y:
                        status.append(f"  spark={x}")
                        status.append(f"  duck ={y}")
                        break
        if status:
            failures.append(name)
            print(f"{name:28s} FAIL  " + " | ".join(status))
        else:
            print(f"{name:28s} OK    {len(srows)} rows")

    print()
    if failures:
        print(f"FAILED: {failures}")
        sys.exit(1)
    print("all oracle checks passed")


if __name__ == "__main__":
    main()
