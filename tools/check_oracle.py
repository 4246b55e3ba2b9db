"""Local stand-in for the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql() twin
on DuckDB (same parquet tables, pre-registered views), then compares:
row count, column names, and an order-insensitive DTYPE-SENSITIVE value
serialization — each cell rendered with str() exactly as it sits in the
pandas frame, so an int64 229 and a float64 229.0 DO NOT match (this is how
the driver's value hash behaves; DuckDB's HUGEINT sums reach pandas as
float64 and must be CAST AS BIGINT in the oracle SQL, not normalized away
here). Exit code 1 on any mismatch.

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


def _cell(v) -> str:
    """Dtype-sensitive canonical rendering of one cell. str() keeps the
    int/float distinction (str(229)='229', str(229.0)='229.0') that the
    driver's value hash sees; nulls of any flavor collapse to one token."""
    if v is None or v is pd.NaT:
        return "<null>"
    if isinstance(v, float) and v != v:  # NaN (Spark null and DuckDB null both land here for float cols)
        return "<null>"
    if v is pd.NA:
        return "<null>"
    return str(v)


def canonical(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, serialize every cell dtype-sensitively, then sort
    rows by the serialized values — mirrors the driver's order-insensitive,
    dtype-sensitive value hash."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = pd.DataFrame({c: df[c].map(_cell) for c in df.columns})
    return out.sort_values(by=list(out.columns), ignore_index=True)


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
    s, d = canonical(spark_df), canonical(duck_df)
    for c in s.columns:
        sc, dc = s[c], d[c]
        neq = sc != dc
        if neq.any():
            i = int(neq.idxmax())
            msg = (
                f"col {c}: {int(neq.sum())} mismatches, first at row {i}: "
                f"spark={sc.iloc[i]!r} duck={dc.iloc[i]!r}"
            )
            # Debug hint: distinguish repr-only drift (e.g. 229 vs 229.0,
            # dtype bug in the oracle SQL) from a real numeric difference.
            try:
                sn = pd.to_numeric(sc[neq], errors="raise")
                dn = pd.to_numeric(dc[neq], errors="raise")
                mx = (sn - dn).abs().max()
                msg += f" [numeric max abs diff {mx!r}{' — repr/dtype only' if mx == 0 else ''}]"
            except (ValueError, TypeError):
                pass
            errs.append(msg)
    return errs


def main() -> int:
    import __spark_entry__ as entrymod
    from payroll_etl_fastapi_spark.session import get_spark

    only = set(sys.argv[2:])
    spark = get_spark("check-oracle")
    con = duck_connect(SF_DIR)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # Retired twins stay locally verified even though the driver no longer
    # sees them (registry curation, round 3).
    queries.update(entrymod.archived_queries())
    oracles.update(entrymod.archived_oracle_sql())

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
