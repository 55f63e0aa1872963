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


# ---------------------------------------------------------------------------
# SCD2 (merge_upsert_scd2): full-history contract
# ---------------------------------------------------------------------------

def _scd2_apply(spark, path, rows, ts):
    from mercurygate_spark.pipeline.silver import merge_upsert_scd2

    inc = spark.createDataFrame(rows, "k long, v string")
    return merge_upsert_scd2(spark, inc, ["k"], ["v"], str(path), ts)


def _hist_set(df):
    return {
        (r["k"], r["v"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in df.collect()
    }


def test_scd2_new_change_vanish_reappear(spark, tmp_path):
    """The four SCD2 transitions across three loads: key 1 unchanged
    throughout (one open row), key 2 changes at t2 (closed + open),
    key 3 vanishes at t2 and reappears at t3 with its old value (two
    separate versions — a gap never reopens a closed row), key 4
    arrives at t2 (open from t2)."""
    p = tmp_path / "scd2"
    _scd2_apply(spark, p, [(1, "a"), (2, "b"), (3, "c")], "t1")
    _scd2_apply(spark, p, [(1, "a"), (2, "B"), (4, "d")], "t2")
    got = _hist_set(_scd2_apply(spark, p, [(1, "a"), (2, "B"), (3, "c"), (4, "d")], "t3"))
    assert got == {
        (1, "a", "t1", None, True),
        (2, "b", "t1", "t2", False),
        (2, "B", "t2", None, True),
        (3, "c", "t1", "t2", False),
        (3, "c", "t3", None, True),
        (4, "d", "t2", None, True),
    }


def test_scd2_replay_is_idempotent(spark, tmp_path):
    """Crash-window replay: re-applying the SAME snapshot (same
    load_ts) must be a byte-identical no-op — unchanged rows are
    untouched, and nothing closes or inserts. Mirrors the SCD1 merge
    torture tests' replay doctrine."""
    p = tmp_path / "scd2r"
    _scd2_apply(spark, p, [(1, "a"), (2, "b")], "t1")
    before = _hist_set(_scd2_apply(spark, p, [(1, "a"), (2, "x")], "t2"))
    after = _hist_set(_scd2_apply(spark, p, [(1, "a"), (2, "x")], "t2"))
    assert before == after
    # and a third generation still behaves after the replay
    final = _hist_set(_scd2_apply(spark, p, [(2, "x")], "t3"))
    assert final == {
        (1, "a", "t1", "t3", False),
        (2, "b", "t1", "t2", False),
        (2, "x", "t2", None, True),
    }


def test_scd2_duplicate_pk_incoming_keeps_one_open_row(spark, tmp_path):
    """ADVICE r12: a duplicate-pk incoming batch must NOT fan out the
    full-outer join — it is reduced to one row per key BEFORE the
    merge, so the ≤1-open-row invariant holds. With order_by the
    winner is the order_by-max row; replaying the deduped equivalent
    snapshot yields the identical history."""
    from mercurygate_spark.pipeline.silver import merge_upsert_scd2

    p = tmp_path / "scd2dup"
    inc = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (2, "c", 1), (2, "c", 1)],
        "k long, v string, seq long",
    )
    hist = merge_upsert_scd2(
        spark, inc, ["k"], ["v"], str(p), "t1", order_by=["seq"]
    )
    got = _hist_set(hist.drop("seq")) if "seq" in hist.columns else _hist_set(hist)
    assert got == {(1, "b", "t1", None, True), (2, "c", "t1", None, True)}
    # second generation with dupes again: key 1 flips back to "a"
    inc2 = spark.createDataFrame(
        [(1, "a", 3), (1, "a", 4), (2, "c", 3)], "k long, v string, seq long"
    )
    hist2 = merge_upsert_scd2(
        spark, inc2, ["k"], ["v"], str(p), "t2", order_by=["seq"]
    )
    assert _hist_set(hist2) == {
        (1, "b", "t1", "t2", False),
        (1, "a", "t2", None, True),
        (2, "c", "t1", None, True),
    }
    # ≤1 open row per key even without order_by (deterministic md5 pick)
    p2 = tmp_path / "scd2dup2"
    inc3 = spark.createDataFrame([(7, "x"), (7, "y")], "k long, v string")
    h = _hist_set(merge_upsert_scd2(spark, inc3, ["k"], ["v"], str(p2), "t1"))
    open_rows = [r for r in h if r[4]]
    assert len(open_rows) == 1 and open_rows[0][0] == 7
    # and the pick is stable across replays (an md5 winner flip at t2
    # would close the t1 row and open a new one)
    h2 = _hist_set(merge_upsert_scd2(spark, inc3, ["k"], ["v"], str(p2), "t2"))
    assert sum(1 for r in h2 if r[4]) == 1
    assert h2 == h


def test_scd2_structural_invariants_random(spark, tmp_path):
    """Randomized generations vs structural invariants: ≤1 open row
    per key; spans ordered and non-overlapping per key (valid_from <
    valid_to for closed rows, each next version starts at or after the
    previous close); every (key, load) value visible in exactly the
    version covering that load."""
    rng = random.Random(7)
    p = tmp_path / "scd2x"
    ts = [f"t{i}" for i in range(1, 6)]
    gens = []
    for i in range(5):
        gens.append(
            [(k, rng.choice("abc")) for k in range(8) if rng.random() < 0.7]
        )
        hist = _scd2_apply(spark, p, gens[-1], ts[i])
    rows = hist.collect()
    by_key = {}
    for r in rows:
        by_key.setdefault(r["k"], []).append(r)
    order = {t: i for i, t in enumerate(ts)}
    for k, vs in by_key.items():
        assert sum(1 for r in vs if r["is_current"]) <= 1, k
        vs = sorted(vs, key=lambda r: order[r["valid_from"]])
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to"] is not None and not a["is_current"]
            assert order[a["valid_to"]] <= order[b["valid_from"]], (k, a, b)
    # point-in-time correctness: the version covering load i carries
    # exactly the value loaded at i
    for i, gen_rows in enumerate(gens):
        for k, v in gen_rows:
            cover = [
                r
                for r in by_key[k]
                if order[r["valid_from"]] <= i
                and (r["valid_to"] is None or order[r["valid_to"]] > i)
            ]
            assert len(cover) == 1 and cover[0]["v"] == v, (k, i, v, cover)
