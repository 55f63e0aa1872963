"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors the contract in __spark_entry__.py: for each query key, run
the Spark implementation and the DuckDB oracle on the same parquet
tables, sort columns by name, sort rows, and compare values exactly
(strings/ints) — derived doubles are rounded by the queries themselves
so exact comparison is the right bar.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from mercurygate_spark.queries.registry import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            # Spark-written table (the scaled sf1 evidence dir): a
            # DIRECTORY of part files — DuckDB needs the glob; the
            # driver's raw testdata is single-file and stays as-is
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v: Any) -> Any:
    """Normalize a cell for comparison (both engines feed through this)."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and represent at fixed precision;
        # queries pre-round derived floats, so this is belt-and-braces.
        return round(v + 0.0, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def rows_normalized(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


def compare(spark, sf_dir: str, name: str, fn, sql: str) -> tuple[bool, str]:
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = duck_connection(sf_dir)
    try:
        res = con.execute(sql)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row counts differ: spark={len(s_rows)} duck={len(d_rows)}"
    sn = rows_normalized(s_cols, s_rows)
    dn = rows_normalized(d_cols, d_rows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        return False, f"values differ; first diffs (spark, duck): {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
