"""Local replica of the driver's Spark-vs-DuckDB correctness check.

Runs each ``queries()`` entry and its ``oracle_sql()`` on the same parquet
tables, normalizes (sort columns by name, sort rows, round floats) and
compares. Used by tests/test_entry_oracle.py and by hand while developing.
"""

from __future__ import annotations

import math
import os

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, bool):
        return bool(v)
    return v


def _normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare_query(spark, sf_dir: str, name: str, fn, sql: str) -> dict:
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = duck_connection(sf_dir)
    rel = con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()
    res = {
        "name": name,
        "spark_rows": len(s_rows),
        "duck_rows": len(d_rows),
        "spark_cols": sorted(s_cols),
        "duck_cols": sorted(d_cols),
    }
    res["cols_match"] = sorted(s_cols) == sorted(d_cols)
    sn, dn = _normalize(s_cols, s_rows), _normalize(d_cols, d_rows)
    res["rows_match"] = sn == dn
    if not res["rows_match"]:
        sset = set(map(repr, sn))
        dset = set(map(repr, dn))
        res["only_spark"] = sorted(sset - dset)[:5]
        res["only_duck"] = sorted(dset - sset)[:5]
    return res
