"""Local mirror of the driver's correctness gate.

Runs every declared query at sf0.01 on Spark AND its oracle SQL on
DuckDB, then compares row count, schema (column names), and values
(columns sorted by name, rows sorted, exact comparison with a float
report so precision-fragile queries surface BEFORE the driver sees
them).

Usage:  python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

# the driver gates at sf0.01; override (e.g. sf0.1) to validate the
# same oracles at 10× the data — engine-vs-engine agreement that
# holds across scale factors is much stronger evidence than one point
import os

SF_DIR = os.environ.get("PIPZ_CHECK_SF_DIR", "/root/testdata/sf0.01")


def canon(df):
    """Sort columns by name, rows by string form — order-insensitive."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def compare(name, sdf, odf):
    issues = []
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"schema mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    if len(sdf) != len(odf):
        issues.append(f"rowcount mismatch: spark={len(sdf)} oracle={len(odf)}")
        return issues
    s, o = canon(sdf), canon(odf)
    max_float_diff = 0.0
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if a is None and b is None:
                continue
            if isinstance(a, float) or isinstance(b, float):
                fa = float("nan") if a is None else float(a)
                fb = float("nan") if b is None else float(b)
                if math.isnan(fa) and math.isnan(fb):
                    continue
                if fa != fb:
                    max_float_diff = max(max_float_diff, abs(fa - fb))
                    if abs(fa - fb) > 1e-9:
                        issues.append(f"col {col} row {i}: {a!r} != {b!r}")
                        if len(issues) > 5:
                            return issues
            elif a != b:
                issues.append(f"col {col} row {i}: {a!r} != {b!r}")
                if len(issues) > 5:
                    return issues
    if max_float_diff > 0:
        issues.append(f"NOTE float bits differ (max {max_float_diff:.3e}) — hash would MISMATCH")
    return issues


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from pipz_spark.session import get_session
    from pipz_spark.sources.catalog import TABLES

    only = set(sys.argv[1:])
    spark = get_session("correctness", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, build in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = build(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        finally:
            from pipz_spark.datapipe import release_caches

            release_caches()
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (rows-only check) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        issues = compare(name, sdf, odf)
        if issues:
            print(f"FAIL  {name} ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            for i in issues:
                print(f"      {i}")
            n_fail += 1
        else:
            print(f"OK    {name}: {len(sdf)} rows exact match [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
