"""Local stand-in for the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql() twin
on DuckDB (same parquet tables, pre-registered views), then compares:
row count, column names/dtypes, and order-insensitive values (exact for
ints/strings, reporting max abs diff for floats). Exit code 1 on any mismatch.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows — the driver's
    order-insensitive compare."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_object_dtype(df[c]):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    if len(spark_df) != len(duck_df):
        errs.append(f"row count: spark={len(spark_df)} duck={len(duck_df)}")
    s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
    if s_cols != d_cols:
        errs.append(f"columns: spark={s_cols} duck={d_cols}")
        return errs
    if errs:
        return errs
    s, d = normalize(spark_df), normalize(duck_df)
    for c in s.columns:
        sc, dc = s[c], d[c]
        if pd.api.types.is_float_dtype(sc) or pd.api.types.is_float_dtype(dc):
            sc = pd.to_numeric(sc, errors="coerce").astype(float)
            dc = pd.to_numeric(dc, errors="coerce").astype(float)
            both_nan = sc.isna() & dc.isna()
            diff = (sc - dc).abs()
            bad = ~both_nan & ~(diff == 0)
            if bad.any():
                mx = diff[bad].max()
                errs.append(
                    f"col {c}: {int(bad.sum())} float mismatches, max abs diff {mx!r}"
                )
        else:
            neq = sc.astype(str) != dc.astype(str)
            if neq.any():
                i = int(neq.idxmax())
                errs.append(
                    f"col {c}: {int(neq.sum())} mismatches, first at row {i}: "
                    f"spark={sc.iloc[i]!r} duck={dc.iloc[i]!r}"
                )
    return errs


def main() -> int:
    import __spark_entry__ as entrymod
    from payroll_etl_fastapi_spark.session import get_spark

    only = set(sys.argv[2:])
    spark = get_spark("check-oracle")
    con = duck_connect(SF_DIR)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failed, passed, skipped = [], [], []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            skipped.append(name)
            print(f"SKIP  {name} (no oracle — rows-only check)")
            try:
                n = fn(spark, SF_DIR).count()
                print(f"      rows={n}")
            except Exception as exc:  # noqa: BLE001
                failed.append(name)
                print(f"FAIL  {name}: spark error {exc}")
            continue
        try:
            spark_pd = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: spark error: {str(exc).splitlines()[0][:300]}")
            continue
        try:
            duck_pd = con.sql(sql).df()
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL  {name}: duckdb error: {str(exc).splitlines()[0][:300]}")
            continue
        errs = compare(name, spark_pd, duck_pd)
        if errs:
            failed.append(name)
            print(f"FAIL  {name}")
            for e in errs:
                print(f"      {e}")
        else:
            passed.append(name)
            print(f"OK    {name} ({len(spark_pd)} rows)")

    print(
        f"\n{len(passed)} ok, {len(failed)} failed, {len(skipped)} oracle-less "
        f"(of {len(queries)} queries) at {SF_DIR}"
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
