"""Contract tests pinning merge_upsert_scd to Delta MERGE semantics.

delta-spark cannot be installed in this sandbox (no network, no cached
wheel, no jars — docs/COVERAGE.md), so the DeltaTable fast path in
io/writers.py is dead code here. These tests pin the parquet-fallback
path to the EXACT semantics the Delta branch would execute, expressed
as a pure-Python reference model of:

    DeltaTable.forPath(spark, path).alias("t")
      .merge(incoming_latest.alias("s"), "t.pk = s.pk")
      .whenMatchedUpdateAll(condition="s.<order_by> >= t.<order_by>")
      .whenNotMatchedInsertAll()
      .whenNotMatchedBySourceUpdate(set={"active": "'N'"})   # snapshot extracts
      .execute()

(whenNotMatchedBySource is the Delta 2.3+ soft-delete clause; with
DELTA-style extracts — soft_delete_missing=False — that clause is
omitted and absent keys keep their flag.) If delta-spark ever lands in
the environment, the same assertions run against the real branch
unchanged, because merge_upsert_scd routes through
write_delta_or_parquet/read_delta_or_parquet.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F  # noqa: F401 (parity with sibling tests)

from mercurygate_spark.catalog import TableSpec
from mercurygate_spark.pipeline.silver import merge_upsert_scd

SPEC = TableSpec(
    name="scd_case",
    source_file="claim.txt",
    primary_key=["pk"],
    order_by=["version"],
    rename={},
    ts_columns=[],
)
SCHEMA = "pk long, version long, payload string, active string"


def delta_merge_model(
    target: dict[int, tuple],
    incoming: list[tuple],
    soft_delete_missing: bool = True,
) -> dict[int, tuple]:
    """Pure-Python replay of the Delta MERGE above. Rows are
    (pk, version, payload, active); target keyed by pk."""
    latest: dict[int, tuple] = {}
    for row in incoming:  # dedupe_latest over the source: max version per pk
        pk, version = row[0], row[1]
        if pk not in latest or version > latest[pk][1]:
            latest[pk] = row
    out = dict(target)
    for pk, s in latest.items():
        if pk in out:
            if s[1] >= out[pk][1]:  # whenMatchedUpdateAll, ties → source
                out[pk] = s
        else:  # whenNotMatchedInsertAll
            out[pk] = s
    if soft_delete_missing:  # whenNotMatchedBySourceUpdate set active='N'
        for pk in out:
            if pk not in latest:
                r = out[pk]
                out[pk] = (r[0], r[1], r[2], "N")
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, schema=SCHEMA)


def _seed(spark, path, rows):
    """First merge against a missing path writes incoming-latest as-is."""
    merge_upsert_scd(spark, _df(spark, rows), SPEC, path)


def _table(df) -> dict[int, tuple]:
    return {
        r["pk"]: (r["pk"], r["version"], r["payload"], r["active"])
        for r in df.collect()
    }


def test_merge_matrix_update_insert_tie_soft_delete(spark, tmp_path):
    """One merge exercising every MERGE clause at once."""
    path = str(tmp_path / "t1")
    target_rows = [
        (1, 1, "t1", "Y"),  # updated by newer source (v3 after source dedupe)
        (2, 5, "t2", "Y"),  # source older (v0) → kept, no regression
        (3, 1, "t3", "Y"),  # exact version tie → source wins
        (4, 1, "t4", "Y"),  # absent from source → active flips N
        (5, 2, "t5", "N"),  # absent AND already N → stays N, version kept
    ]
    incoming = [
        (1, 2, "s1a", "Y"),
        (1, 3, "s1b", "Y"),  # intra-batch dup: v3 must win before merging
        (2, 0, "s2", "Y"),
        (3, 1, "s3", "Y"),
        (7, 1, "s7", "Y"),   # brand-new key → insert
    ]
    _seed(spark, path, target_rows)
    out = merge_upsert_scd(spark, _df(spark, incoming), SPEC, path)
    expected = delta_merge_model({r[0]: r for r in target_rows}, incoming)
    assert _table(out) == expected
    # spot-pin the interesting cells so a model bug can't hide a real one
    got = _table(out)
    assert got[1] == (1, 3, "s1b", "Y")
    assert got[2] == (2, 5, "t2", "Y")
    assert got[3] == (3, 1, "s3", "Y")
    assert got[4] == (4, 1, "t4", "N")
    assert got[5] == (5, 2, "t5", "N")
    assert got[7] == (7, 1, "s7", "Y")


def test_merge_delta_extract_keeps_absent_flags(spark, tmp_path):
    """soft_delete_missing=False (DELTA extracts): absence ≠ deletion —
    the whenNotMatchedBySource clause is omitted entirely."""
    path = str(tmp_path / "t2")
    target_rows = [(1, 1, "t1", "Y"), (2, 1, "t2", "N")]
    incoming = [(3, 1, "s3", "Y")]
    _seed(spark, path, target_rows)
    out = merge_upsert_scd(
        spark, _df(spark, incoming), SPEC, path, soft_delete_missing=False
    )
    expected = delta_merge_model(
        {r[0]: r for r in target_rows}, incoming, soft_delete_missing=False
    )
    assert _table(out) == expected
    assert _table(out)[1][3] == "Y" and _table(out)[2][3] == "N"


def test_merge_idempotent_and_resurrection(spark, tmp_path):
    """Replaying a batch is a no-op (exactly-once landing can retry);
    a soft-deleted key reappearing with a newer version goes active
    again — the full SCD life cycle."""
    path = str(tmp_path / "t3")
    _seed(spark, path, [(1, 1, "a", "Y"), (2, 1, "b", "Y")])
    batch = [(1, 2, "a2", "Y")]  # pk2 vanishes → N
    first = _table(merge_upsert_scd(spark, _df(spark, batch), SPEC, path))
    again = _table(merge_upsert_scd(spark, _df(spark, batch), SPEC, path))
    assert first[2][3] == "N"
    # replay: pk1 ties (v2=v2, same row), pk2 still absent → stays N
    assert again == first
    # resurrection
    out = _table(
        merge_upsert_scd(spark, _df(spark, [(2, 2, "b2", "Y")]), SPEC, path)
    )
    assert out[2] == (2, 2, "b2", "Y")
    assert out[1] == (1, 2, "a2", "N") or out[1][3] == "N"  # pk1 now absent → N


def test_merge_randomized_against_model(spark, tmp_path):
    """Seeded random target/incoming pairs: fallback == model on every
    cell. Versions drawn distinct-per-pk so the only tie case is the
    deliberate one covered above (full-row md5 ties are unordered by
    design)."""
    rng = random.Random(7)
    for trial in range(3):
        path = str(tmp_path / f"r{trial}")
        pks = list(range(10))
        target_rows = [
            (pk, rng.randrange(0, 50), f"t{pk}", rng.choice(["Y", "Y", "N"]))
            for pk in pks
            if rng.random() < 0.7
        ]
        if not target_rows:
            target_rows = [(0, 1, "t0", "Y")]
        incoming = []
        for pk in pks:
            if rng.random() < 0.6:
                for v in rng.sample(range(100), rng.randrange(1, 3)):
                    incoming.append((pk, v, f"s{pk}.{v}", "Y"))
        if not incoming:
            incoming = [(11, 1, "s11", "Y")]
        sdm = rng.random() < 0.5
        _seed(spark, path, target_rows)
        out = merge_upsert_scd(
            spark, _df(spark, incoming), SPEC, path, soft_delete_missing=sdm
        )
        expected = delta_merge_model(
            {r[0]: r for r in target_rows}, incoming, soft_delete_missing=sdm
        )
        assert _table(out) == expected, f"trial {trial} (soft_delete={sdm})"
