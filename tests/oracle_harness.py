"""Local stand-in for the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL side-by-side, sort columns by name, compare
row-count, schema-width, and order-insensitive values."""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm_cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return round(v, 6)
        if hasattr(v, "tolist"):  # numpy arrays from duckdb lists
            return tuple(v.tolist())
        if isinstance(v, (list, tuple)):
            return tuple(v)
        if isinstance(v, pd.Timestamp):
            # keep tz affinity visible: the driver's value hash renders
            # tz-aware and naive timestamps differently, so a DuckDB
            # TIMESTAMPTZ vs Spark TIMESTAMP_NTZ divergence must FAIL here
            return v.isoformat()
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return v

    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def compare(spark_df, duck_con, oracle_sql: str) -> None:
    actual = spark_df.toPandas()
    expected = duck_con.sql(oracle_sql).df()
    assert len(actual) == len(expected), (
        f"row count mismatch: spark={len(actual)} duckdb={len(expected)}"
    )
    assert sorted(c.lower() for c in actual.columns) == sorted(
        c.lower() for c in expected.columns
    ), f"schema mismatch: {sorted(actual.columns)} vs {sorted(expected.columns)}"
    a, e = _normalize(actual), _normalize(expected)
    mismatches = [(x, y) for x, y in zip(a, e) if x != y]
    assert not mismatches, f"value mismatch ({len(mismatches)} rows), first: {mismatches[:3]}"
