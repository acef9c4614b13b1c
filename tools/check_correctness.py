"""Local simulator of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB, compare
row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from sparkclean.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(a.columns) != sorted(b.columns):
        problems.append(f"schema: spark={sorted(a.columns)} oracle={sorted(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"rowcount: spark={len(a)} oracle={len(b)}")
        return problems
    a, b = normalize(a.copy()), normalize(b.copy())
    for c in a.columns:
        av, bv = a[c], b[c]
        # The driver gate hashes values, so an int64-vs-float64 dtype split
        # (e.g. DuckDB HUGEINT sum() -> pandas float) fails there even when
        # allclose passes here. Mirror that strictness.
        ak, bk = av.dtype.kind, bv.dtype.kind
        int_kinds, float_kinds = {"i", "u"}, {"f", "c"}
        if (
            (ak in int_kinds and bk in float_kinds)
            or (ak in float_kinds and bk in int_kinds)
            or (ak in int_kinds | float_kinds) != (bk in int_kinds | float_kinds)
        ):
            problems.append(
                f"dtype[{c}]: spark={av.dtype} oracle={bv.dtype} (driver hash would differ)"
            )
        if av.dtype.kind in "fc" or bv.dtype.kind in "fc":
            ok = np.allclose(
                av.astype(float), bv.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True
            )
        else:
            try:
                ok = (av.astype(str) == bv.astype(str)).all()
            except Exception:
                ok = False
        if not ok:
            bad = None
            try:
                if av.dtype.kind in "fc":
                    diffs = ~np.isclose(
                        av.astype(float), bv.astype(float),
                        rtol=1e-9, atol=1e-9, equal_nan=True,
                    )
                else:
                    diffs = (av.astype(str) != bv.astype(str)).to_numpy()
                i = int(np.argmax(diffs))
                bad = f" e.g. row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r} ({int(diffs.sum())} diffs)"
            except Exception:
                pass
            problems.append(f"values[{c}]{bad or ''}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("correctness-sim", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"ERROR: unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__} {str(e)[:300]}")
            n_fail += 1
            # a failing query may have persisted intermediates — clear so
            # later queries don't run under its cache pressure
            spark.catalog.clearCache()
            continue
        # queries may persist intermediates (shared knn graph, datalab
        # frames); drop them so caches never accumulate across the run
        spark.catalog.clearCache()
        if name not in oracles:
            print(f"PASS {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {type(e).__name__} {str(e)[:300]}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
