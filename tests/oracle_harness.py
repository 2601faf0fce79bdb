"""Shared harness that mimics the driver's correctness gate: run each
``queries()`` entry and its ``oracle_sql()`` side-by-side on the same
sf dir and compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duckdb_con(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(np.int64)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = np.nan_to_num(
                np.round(df[c].astype(np.float64), 9), nan=-1.5e300
            )
        elif pd.api.types.is_integer_dtype(df[c]) or pd.api.types.is_bool_dtype(df[c]):
            df[c] = (
                df[c].astype("float64").fillna(-4.0e18).astype(np.int64)
            )
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    errs = []
    a, b = normalize(ray_df), normalize(sql_df)
    if list(a.columns) != list(b.columns):
        errs.append(f"{name}: columns {list(a.columns)} != {list(b.columns)}")
        return errs
    if len(a) != len(b):
        errs.append(f"{name}: rows {len(a)} != {len(b)}")
        return errs
    if len(a):
        neq = (a.to_numpy() != b.to_numpy()).any(axis=1)
        if neq.sum() > 0:
            errs.append(
                f"{name}: value mismatch in {int(neq.sum())} rows; first:\n"
                f"ray:\n{a[neq].head(3)}\nsql:\n{b[neq].head(3)}"
            )
    return errs
