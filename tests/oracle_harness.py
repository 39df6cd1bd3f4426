"""Local mirror of the driver's correctness gate.

Runs each catalog query on Spark AND its DuckDB oracle on the same
parquet tables, then compares row count, column names, and
order-insensitive values. Strict by default (exact equality after
canonicalization) so any float nondeterminism surfaces here before the
driver sees it.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from universal_data_connector_spark.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values to comparable forms."""
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<NULL>"
        if isinstance(v, float):
            return f"{v!r}"  # repr: exact shortest round-trip
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        return str(v)

    out = df.copy()
    for c in out.columns:
        out[c] = out[c].map(norm)
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def compare(spark_df, duck_rel) -> tuple[bool, str]:
    """Returns (match, detail). Mirrors the driver: count + columns +
    order-insensitive values."""
    sp = spark_df.toPandas()
    du = duck_rel.df()
    if sorted(map(str.lower, sp.columns)) != sorted(map(str.lower, du.columns)):
        return False, f"columns differ: spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    sp.columns = [c.lower() for c in sp.columns]
    du.columns = [c.lower() for c in du.columns]
    if len(sp) != len(du):
        return False, f"row count differs: spark={len(sp)} duck={len(du)}"
    a, b = _canon(sp), _canon(du)
    if a.equals(b):
        return True, "ok"
    diff_mask = (a != b).any(axis=1)
    n_diff = int(diff_mask.sum())
    sample = ""
    if n_diff:
        i = diff_mask.idxmax()
        sample = f" first diff row {i}: spark={a.loc[i].to_dict()} duck={b.loc[i].to_dict()}"
    return False, f"{n_diff}/{len(a)} rows differ.{sample}"
