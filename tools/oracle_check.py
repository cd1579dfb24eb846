"""Local replica of the driver's correctness gate: run every declared query
on Spark AND its DuckDB oracle, compare row count + sorted-column value
hash. Usage:

    python tools/oracle_check.py [--strict] [--shard=i/n] [sf_dir] [query ...]

``--strict`` disables the 9-digit float rounding in the canonical form
(exact repr on both sides). Default rounding matches the driver's gate,
where float-summing queries are green; strict mode is for auditing
integer-exact queries, where any canon difference is a real bug.
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


STRICT = False


def canon(val) -> str:
    if val is None:
        return "NULL"
    if isinstance(val, float):
        if val != val:
            return "NaN"
        return repr(val) if STRICT else repr(round(val, 9))
    if isinstance(val, bool):
        return str(int(val))
    return str(val)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, len(rows)


def main() -> int:
    global STRICT
    argv = [a for a in sys.argv[1:] if a != "--strict"]
    STRICT = len(argv) != len(sys.argv) - 1
    # --shard i/n: run only every n-th query starting at i (round-robin
    # over registry order). One sequential local[8] session leaves most
    # of a 32-core box idle; launch n workers with --shard 0/n .. n-1/n
    # (e.g. in tmux) to saturate it — the round-6 full-×10 recipe.
    # Ctrl-C will NOT stop a DuckDB query mid-flight (GIL held in C);
    # kill -9 the worker AND its orphaned Spark JVM, then respawn on the
    # remainder via an explicit query list.
    shard_i, shard_n = 0, 1
    for a in list(argv):
        if a.startswith("--shard="):
            argv.remove(a)
            shard_i, shard_n = map(int, a.split("=", 1)[1].split("/"))
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    import __spark_entry__ as e
    from data_pipeline_stripe_spark.session import get_session

    spark = get_session(master="local[8]")
    con = duckdb.connect()
    import os

    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table = a directory of parts
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for idx, (name, fn) in enumerate(qs.items()):
        if only and name not in only:
            continue
        if idx % shard_n != shard_i:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1
            continue
        sh, sn = table_hash(scols, srows)
        oh, on = table_hash(ocols, orows)
        if sn != on:
            print(f"FAIL {name}: rows spark={sn} oracle={on}")
            n_fail += 1
        elif sh != oh:
            print(f"FAIL {name}: value hash mismatch ({sn} rows)")
            sset = {"\x1f".join(canon(v) for v in r) for r in srows}
            oset = {"\x1f".join(canon(v) for v in r) for r in orows}
            for d in list(sset - oset)[:3]:
                print(f"  spark-only: {d[:200]}")
            for d in list(oset - sset)[:3]:
                print(f"  oracle-only: {d[:200]}")
            n_fail += 1
        else:
            print(f"PASS {name}: {sn} rows hash={sh} ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
