"""Replicates the driver's CORRECTNESS gate at an arbitrary sf dir.

Usage: python tools/driver_check.py [sf_dir] [entry ...]
Defaults to /root/testdata/sf0.01 (the driver's gate scale) and all entries.
Prints one status line per entry and a summary; exit code 1 on any failure.
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def main():
    import duckdb

    import __spark_entry__ as entry_mod
    from jassv2_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark(app_name="driver-check")
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name in sorted(queries):
        if only and name not in only:
            continue
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"{name}: rows-only ({len(srows)} rows)")
                continue
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            ok_schema = sorted(scols) == sorted(dcols)
            ok_rows = len(srows) == len(drows)
            a, b = _rowset(scols, srows), _rowset(dcols, drows)
            ok_hash = a == b
            status = "OK" if (ok_schema and ok_rows and ok_hash) else "FAIL"
            print(f"{name}: {status} rows={len(srows)}/{len(drows)} "
                  f"schema={ok_schema} hash={ok_hash}")
            if status == "FAIL":
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"  first diffs: {diff}")
                failures.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            failures.append(name)
    print(f"\n{'ALL GREEN' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
