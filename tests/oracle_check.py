"""Local replica of the driver's correctness compare.

Runs a registered Spark query and its DuckDB oracle on the same parquet
tables, then compares row count, column set, and order-insensitive values —
strict by default (exact equality after canonicalization) so anything that
passes here should pass any reasonable driver hash.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonical float repr — bit-identical values stringify identically
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    out.sort()
    return out


def compare(spark_df, oracle: str, sf_dir: str) -> None:
    con = duckdb_con(sf_dir)
    expected = con.execute(oracle).fetchdf()
    actual = spark_df.toPandas()

    assert sorted(actual.columns) == sorted(expected.columns), (
        f"column mismatch: spark={sorted(actual.columns)} oracle={sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"row count mismatch: spark={len(actual)} oracle={len(expected)}"
    )
    a_rows, e_rows = canon_rows(actual), canon_rows(expected)
    mismatches = [
        (i, a, e) for i, (a, e) in enumerate(zip(a_rows, e_rows)) if a != e
    ]
    assert not mismatches, (
        f"{len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )
