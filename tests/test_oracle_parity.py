"""The primary correctness gate, run locally: every registered query
with an oracle must hash-match DuckDB on the same parquet data —
the same bar the driver applies at sf0.01 (BASELINE.md)."""

from __future__ import annotations

import pytest

from mercurygate_spark.queries import all_oracles, all_queries
from tests.oracle_harness import compare
from tests.registry_sample import registry_sample

ORACLES = all_oracles()
QUERIES = all_queries()

# stride-4 sample by default / full registry when SPARK_GRAFT_FULL_TESTS=1
# (see tests/registry_sample.py — the full sweep still gates every round
# via scripts/sweep.py artifacts and the builder's closing full-tests run)
PARITY_KEYS = registry_sample(ORACLES)


@pytest.mark.parametrize("name", PARITY_KEYS)
def test_oracle_parity(spark, sf_dir, name):
    ok, msg = compare(spark, sf_dir, name, QUERIES[name], ORACLES[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", PARITY_KEYS)
def test_oracle_output_dtypes_strict(duck_con, name):
    """Strict driver-hash guard: the driver serializes DuckDB results
    as-is, so an oracle output column typed HUGEINT (int128 — DuckDB's
    default for integer sum()) or DECIMAL hashes differently from
    Spark's BIGINT/DOUBLE even when every value is equal. This caught
    3 hash-red driver rows in round 2 (dedup_simhash,
    multimodal_partition_stats, scan_json_lines); the fix is
    CAST(sum(...) AS BIGINT) in the oracle. Checked via the arrow
    schema — value normalization in oracle_harness masks this, hence
    the separate strict mode."""
    import pyarrow as pa

    tbl = duck_con.execute(ORACLES[name]).fetch_arrow_table()
    offending = []
    for f in tbl.schema:
        ty = f.type
        if pa.types.is_decimal(ty):
            offending.append(f"{f.name}: {ty}")
        elif pa.types.is_integer(ty) and ty.bit_width > 64:
            offending.append(f"{f.name}: {ty}")
    assert not offending, (
        f"{name}: oracle output columns would hash-mismatch the driver "
        f"(cast to BIGINT/DOUBLE in the oracle SQL): {offending}"
    )
