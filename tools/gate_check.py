"""Local replica of the driver's correctness gate at an arbitrary SF.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
on DuckDB over the same parquet tables, compares row count, column names,
and an order-insensitive value hash — the same three checks the driver
records in CORRECTNESS_r{N}.json — and prints per-entry timing so slow
entries can be found before the driver runs.

Usage: python tools/gate_check.py [sf_dir] [entry ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)


def _hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(tuple(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for row in canon:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from jassv2_spark.session import get_spark

    spark = get_spark(app_name="gate-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name in sorted(queries):
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            t_spark = time.perf_counter() - t0
            sql = oracles.get(name)
            if sql is None:
                print(f"{name:32s} rows={len(srows):>8} spark={t_spark:6.1f}s NO_ORACLE")
                continue
            t1 = time.perf_counter()
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            t_duck = time.perf_counter() - t1
            ok_rows = len(srows) == len(drows)
            ok_cols = sorted(scols) == sorted(dcols)
            ok_hash = ok_cols and _hash(scols, srows) == _hash(dcols, drows)
            status = "OK" if (ok_rows and ok_cols and ok_hash) else "FAIL"
            if status == "FAIL":
                failures.append(name)
            print(
                f"{name:32s} rows={len(srows):>8}/{len(drows):<8} "
                f"spark={t_spark:6.1f}s duck={t_duck:5.1f}s "
                f"cols={'ok' if ok_cols else 'MISMATCH'} "
                f"hash={'ok' if ok_hash else 'MISMATCH'} {status}"
            )
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:32s} ERROR {type(e).__name__}: {e}")
        sys.stdout.flush()
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL GREEN")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
