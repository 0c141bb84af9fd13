"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at the given sf dir, comparing row count, sorted column names,
and an order-insensitive value hash (values canonicalized to strings,
doubles rounded to 9 significant-ish decimals).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v) -> str:
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if hasattr(v, "tolist") and not hasattr(v, "upper"):  # numpy array/scalar
        out = v.tolist()
        if isinstance(out, (list, tuple)):
            return "[" + ",".join(canon(x) for x in out) + "]"
        return canon(out)
    return str(v)


def df_hash(rows, cols) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from kgspark.runtime import release_materialized
    from kgspark.session import get_spark

    spark = get_spark("check-oracles", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            release_materialized()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            # fetchdf(), not fetchall(): the driver compares through
            # pandas, where DuckDB HUGEINT/DECIMAL become float64 —
            # fetchall() keeps Python ints and hides that class of
            # canonicalization mismatch (bit us in round 2 on
            # corpus_token_stats).
            ddf = con.execute(oracles[name]).fetchdf()
            d_cols = list(ddf.columns)
            d_rows = [
                tuple(None if v is pd.NaT else v for v in r)
                for r in ddf.itertuples(index=False, name=None)
            ]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue

        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema {sorted(s_cols)} != {sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rows {len(s_rows)} != {len(d_rows)}")
        if not problems and df_hash(s_rows, s_cols) != df_hash(d_rows, d_cols):
            problems.append("value-hash mismatch")
            s_set = {tuple(canon(v) for v in r) for r in s_rows}
            d_set = {tuple(canon(v) for v in r) for r in d_rows}
            ex_s = list(s_set - d_set)[:3]
            ex_d = list(d_set - s_set)[:3]
            problems.append(f"spark-only={ex_s} duck-only={ex_d}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"OK   {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
