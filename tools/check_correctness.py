"""Local stand-in for the driver's correctness gate: run every
registered query on Spark AND its DuckDB oracle at a given sf, then
compare row count, column names, and (order-insensitively) values.

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) == 0:
        return df.reset_index(drop=True)
    # stringify for a stable total order, then sort rows
    key = df.astype(str).agg("\x1f".join, axis=1)
    return df.iloc[key.sort_values(kind="mergesort").index].reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return str(a) == str(b)


def compare(name: str, spark_df, oracle_df) -> list[str]:
    issues = []
    if len(spark_df) != len(oracle_df):
        issues.append(f"rowcount spark={len(spark_df)} oracle={len(oracle_df)}")
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        issues.append(f"columns spark={sc} oracle={oc}")
        return issues
    if issues:
        return issues
    s, o = canon(spark_df), canon(oracle_df)
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        bad = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(sv, ov))
            if not values_equal(None if pd.isna(x) else x, None if pd.isna(y) else y)
        ]
        if bad:
            i, x, y = bad[0]
            issues.append(
                f"value col={col} {len(bad)}/{len(sv)} differ; first@{i}: spark={x!r} oracle={y!r}"
            )
        # exact-string check too (what a strict hash would see)
        selif = [str(x) for x in sv] != [str(y) for y in ov]
        if selif and not bad:
            i = next(j for j, (x, y) in enumerate(zip(sv, ov)) if str(x) != str(y))
            issues.append(
                f"HASHRISK col={col}: values equal but strings differ, e.g. "
                f"spark={sv[i]!r} oracle={ov[i]!r}"
            )
    return issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    from maston_spark.queries import all_oracles, all_queries
    from maston_spark.session import build_session, TABLES

    qs, oracles = all_queries(), all_oracles()
    spark = build_session("check-correctness")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_rowsonly = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: ORACLE ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        issues = compare(name, sdf, odf)
        if issues:
            print(f"FAIL {name}: " + " | ".join(issues))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
