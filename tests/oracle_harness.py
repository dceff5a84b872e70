"""Local clone of the driver's DuckDB-oracle comparison: row count, schema
shape, and order-insensitive value comparison (with float tolerance so we
catch real mismatches, not ulp noise — the driver hashes exact values, which
is why every order-sensitive float aggregate in the catalog is rounded on
both sides)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_df, oracle_df: pd.DataFrame, name: str, float_tol: float = 1e-9) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    errors: list[str] = []
    sp = spark_df.toPandas()
    if len(sp) != len(oracle_df):
        errors.append(f"{name}: row count {len(sp)} vs oracle {len(oracle_df)}")
        return errors
    if sorted(sp.columns) != sorted(oracle_df.columns):
        errors.append(f"{name}: columns {sorted(sp.columns)} vs {sorted(oracle_df.columns)}")
        return errors
    a, b = _normalize(sp), _normalize(oracle_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            bad = 0
            for x, y in zip(av, bv):
                xn, yn = pd.isna(x), pd.isna(y)
                if xn and yn:
                    continue
                if xn != yn or not math.isclose(float(x), float(y), rel_tol=float_tol, abs_tol=1e-9):
                    bad += 1
            if bad:
                errors.append(f"{name}.{c}: {bad}/{len(av)} float mismatches")
        else:
            neq = (av.astype(str).where(~av.isna(), "∅") != bv.astype(str).where(~bv.isna(), "∅"))
            if neq.any():
                i = int(neq.idxmax())
                errors.append(
                    f"{name}.{c}: {int(neq.sum())}/{len(av)} mismatches; first at row {i}: "
                    f"{av.iloc[i]!r} vs {bv.iloc[i]!r}"
                )
    return errors
