"""The primary correctness gate, run locally: every registered query
with an oracle must hash-match DuckDB on the same parquet data —
the same bar the driver applies at sf0.01 (BASELINE.md)."""

from __future__ import annotations

import pytest

from mercurygate_spark.queries import all_oracles, all_queries
from tests.oracle_harness import compare

ORACLES = all_oracles()
QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    ok, msg = compare(spark, sf_dir, name, QUERIES[name], ORACLES[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
