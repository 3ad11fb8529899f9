"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same sf dir; compare
row-count + column names + order-insensitive value hash.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x01".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import importlib.util

    spec = importlib.util.spec_from_file_location("entrymod", os.path.join(REPO, "__spark_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from geopull_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = m.queries()
    oracles = m.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"[{name}] SPARK ERROR: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"[{name}] rows-only: {len(srows)} rows, cols={scols}")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"[{name}] DUCKDB ERROR: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        ok_count = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        sh = frame_hash(srows, scols)
        dh = frame_hash(drows, dcols)
        ok_hash = sh == dh
        status = "OK" if (ok_count and ok_cols and ok_hash) else "MISMATCH"
        print(
            f"[{name}] {status}: rows {len(srows)}/{len(drows)}"
            f" cols {'=' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'}"
            f" hash {'=' if ok_hash else f'{sh[:8]} vs {dh[:8]}'}"
        )
        if status != "OK":
            failures.append(name)
            if not ok_hash and ok_count and ok_cols:
                # show first differing rows for debugging
                sset = {frame_hash([r], scols): r for r in srows[:5000]}
                dset = {frame_hash([r], dcols): r for r in drows[:5000]}
                for k in list(sset.keys() - dset.keys())[:3]:
                    print("   spark-only:", sset[k])
                for k in list(dset.keys() - sset.keys())[:3]:
                    print("   duck-only: ", dset[k])
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
