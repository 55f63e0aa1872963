"""Driver-contract tests for __spark_entry__.py (the exact surface the
verify harness consumes)."""

from __future__ import annotations

import __spark_entry__ as E


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_disc_price" in df.columns  # flagship schema stable


def test_contract_shape():
    q = E.queries()
    o = E.oracle_sql()
    assert len(q) >= 60
    # every oracle key must have a query impl
    assert set(o) <= set(q)
    # oracles are non-trivial SQL
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())
    # every key is oracle-checked — the sketches via bound-check
    # contracts (booleans the oracle pins to TRUE), everything else
    # via full value oracles
    assert set(q) == set(o)


def test_queries_are_lazy(spark, sf_dir):
    """queries() callables must return unevaluated DataFrames (the
    driver collects; eager collects here would double-execute)."""
    df = E.queries()["scan_parquet"](spark, sf_dir)
    from pyspark.sql import DataFrame

    assert isinstance(df, DataFrame)
