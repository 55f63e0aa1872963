"""Silver layer (SURVEY.md §3 EP2 + §2b realizations).

Reference behavior: read bronze across all dateParts, rename ~140
columns, flag active='Y', overwrite Delta (mm_bronze_silver.py:
204-275). This engine adds what the reference only declares:

- consistent typing of ALL timestamp columns on EVERY path
  (fixes §2d-4 — the reference types one column, first load only);
- pk-latest dedupe using the catalog's primary_key/order_by
  (config.py:36-72 intent, never implemented there);
- merge-upsert + SCD soft delete: existing keys updated, new keys
  inserted, vanished keys kept with active='N' (the reference writes
  active='Y' forever and never flips it — mm_bronze_silver.py:222).

Merge is implemented Delta-free as anti-join + union + overwrite
(Delta MERGE INTO when the classpath has it — io.writers probes).
At scale both sides shuffle once on the pk; AQE handles skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mercurygate_spark.catalog import TableSpec
from mercurygate_spark.io.writers import (
    read_delta_or_parquet,
    write_delta_or_parquet,
)
from mercurygate_spark.pipeline.conform import (
    add_soft_delete_flag,
    dedupe_latest,
    rename_conform,
    type_timestamps,
)


def conform(df: DataFrame, spec: TableSpec) -> DataFrame:
    """Bronze → silver shape: single-projection rename, type ALL
    declared timestamp columns, soft-delete flag. Pure; applied
    identically on initial and refresh paths."""
    out = rename_conform(df, spec.rename, keep_unmapped=True)
    out = type_timestamps(out, spec.ts_columns)
    return add_soft_delete_flag(out)


def publish_snapshot(df: DataFrame, spec: TableSpec, path: str) -> str:
    """Reference-parity publish: dedupe to latest per pk, then
    overwrite (the reference's snapshot-replace, K2)."""
    latest = dedupe_latest(df, spec.primary_key, spec.order_by, tiebreakers=None)
    return write_delta_or_parquet(latest, path, mode="overwrite")


def _staged_swap(spark: SparkSession, df: DataFrame, path: str) -> None:
    """Publish ``df`` over a path its own plan READS: write once to a
    staging dir, then swap the staging dir in with a filesystem rename
    (io.fs.rename_path — metadata-only on local disk/HDFS).

    This used to re-read the staging dir and write the bytes a SECOND
    time to the final path; per merge that doubled the write volume of
    the whole table (at 100 TB, a full extra history write per load —
    guide §6). The rename publishes the identical files with zero
    additional Spark jobs. The staging hop itself can't be skipped:
    the merged frame's lineage reads ``path``, so overwriting it in
    place would clobber the merge's own input mid-job."""
    from mercurygate_spark.io.fs import delete_path, rename_path

    staging = path.rstrip("/") + "__staging"
    write_delta_or_parquet(df, staging, mode="overwrite")
    delete_path(spark, path)
    rename_path(spark, staging, path)
    # the rename happened behind Spark's back — drop any cached file
    # listing/data for both paths so the next read lists fresh
    spark.catalog.refreshByPath(path)
    spark.catalog.refreshByPath(staging)


def merge_upsert_scd(
    spark: SparkSession,
    incoming: DataFrame,
    spec: TableSpec,
    path: str,
    soft_delete_missing: bool = True,
) -> DataFrame:
    """Incremental publish realizing the declared registry intent
    (SURVEY.md §2b): latest-per-pk incoming rows win over existing.
    Keys absent from the extract are retained; with
    ``soft_delete_missing`` (SNAPSHOT extracts — absence means the row
    is gone upstream) they're flagged active='N', without it (DELTA
    extracts — absence just means unchanged) they keep their flag.
    Returns the new current table (also written).

    Plan: union(existing, dedupe(incoming)) → latest-per-pk dedupe
    (order_by decides between existing and incoming — a late-arriving
    OLDER row can never regress the table; incoming wins exact ties) →
    soft-delete flagging. One shuffle per side; no driver-side state.

    Path probes and staging cleanup go through the Hadoop FileSystem
    API (io.fs) so the first-load/refresh routing works on s3a://,
    abfss://, hdfs:// — not just the driver's local disk (the
    reference's os.path.exists bug, SURVEY.md §2d-3)."""
    from mercurygate_spark.io.fs import path_exists

    incoming_latest = dedupe_latest(incoming, spec.primary_key, spec.order_by)
    if not path_exists(spark, path):
        write_delta_or_parquet(incoming_latest, path, mode="overwrite")
        return incoming_latest
    existing = read_delta_or_parquet(spark, path)
    all_rows = existing.withColumn("__src", F.lit(0)).unionByName(
        incoming_latest.withColumn("__src", F.lit(1)), allowMissingColumns=True
    )
    current = dedupe_latest(
        all_rows, spec.primary_key, spec.order_by, tiebreakers=["__src"]
    ).drop("__src")
    if soft_delete_missing:
        incoming_keys = incoming_latest.select(spec.primary_key).distinct()
        current = current.join(
            incoming_keys.withColumn("__present", F.lit(1)), spec.primary_key, "left"
        ).withColumn(
            "active", F.when(F.col("__present").isNull(), F.lit("N")).otherwise(F.col("active"))
        ).drop("__present")
    _staged_swap(spark, current, path)
    return read_delta_or_parquet(spark, path)


def _scd2_dirs(path: str) -> tuple[str, str]:
    """The SCD2 table's two physical partitions: ``open/`` (the live
    version per key — overwritten per load via staged swap) and
    ``closed/`` (finished versions — append-only, never read by the
    merge and never rewritten)."""
    root = path.rstrip("/")
    return root + "/open", root + "/closed"


def read_scd2_history(spark: SparkSession, path: str) -> DataFrame:
    """Full SCD2 history = open ∪ closed. The ONLY reader of the
    closed partition — the merge itself never scans it."""
    from mercurygate_spark.io.fs import path_exists

    o_dir, c_dir = _scd2_dirs(path)
    out = read_delta_or_parquet(spark, o_dir)
    if path_exists(spark, c_dir):
        out = out.unionByName(read_delta_or_parquet(spark, c_dir))
    return out


def merge_upsert_scd2(
    spark: SparkSession,
    incoming: DataFrame,
    pk: list[str],
    tracked: list[str],
    path: str,
    load_ts: str,
    order_by: list[str] | None = None,
) -> DataFrame:
    """Full type-2 slowly-changing-dimension merge — the reference's
    active='Y' intent (mm_bronze_silver.py:222) taken to its
    production conclusion (VERDICT r11 next #5): instead of one
    current row per key with a flag, the table keeps EVERY version as
    a row spanning [valid_from, valid_to), with valid_to NULL (open)
    and is_current=true on the live version.

    Per load (snapshot semantics — absence means gone upstream):
    - NEW key            → insert (valid_from=load_ts, open);
    - CHANGED tracked    → close the open row (valid_to=load_ts) and
      insert the new version (open);
    - UNCHANGED          → untouched (idempotent: replaying the same
      snapshot is a no-op — pinned by test_merge_semantics);
    - VANISHED key       → close the open row, no successor.
    Closed history rows are never rewritten — PHYSICALLY: the table
    is two partitions (``path/open`` and ``path/closed``, see
    _scd2_dirs); the merge reads ONLY the open rows, APPENDS the newly
    closed versions to ``closed/``, and staged-swaps the new open set.
    Per load the scan volume is O(live keys) and the write volume is
    O(live keys + changes) — not O(full history) for both, which is
    what the previous single-dir layout paid (at 100 TB, every load
    re-read and re-wrote years of closed versions just to carry them
    across the overwrite). ``closed/`` accumulates one file set per
    load; at scale that is the append-only date-partitioned history
    every lakehouse compacts on its own schedule.

    Plan: reduce incoming to ONE row per pk first (order_by DESC when
    supplied, else a deterministic md5 pick — same contract as
    merge_upsert_scd; a duplicate-pk incoming would otherwise fan out
    the full-outer join and insert multiple open rows per key,
    breaking the ≤1-open-row invariant), then ONE full-outer join
    between the open rows and that latest-per-pk incoming on the pk
    (both sides shuffle once; AQE handles skew), a null-safe struct
    comparison over the tracked columns (null-safe so a NULL→value
    transition counts as a change). Timestamps are caller-supplied
    strings so replay/backfill is deterministic — no wall-clock reads
    inside the merge."""
    from mercurygate_spark.io.fs import path_exists

    incoming = dedupe_latest(incoming, pk, order_by or []).select(*pk, *tracked)
    o_dir, c_dir = _scd2_dirs(path)

    def open_row(df: DataFrame) -> DataFrame:
        return df.select(
            *pk,
            *tracked,
            F.lit(load_ts).alias("valid_from"),
            F.lit(None).cast("string").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )

    if not path_exists(spark, o_dir):
        out = open_row(incoming)
        write_delta_or_parquet(out, o_dir, mode="overwrite")
        return read_scd2_history(spark, path)

    # the merge scans ONLY the live rows; closed history stays on disk
    cur = read_delta_or_parquet(spark, o_dir).where(F.col("is_current"))

    inc = incoming.select(*pk, *tracked)
    tracked_struct = lambda side: F.struct(  # noqa: E731
        *[F.col(f"{side}.{c}") for c in tracked]
    )
    # presence of the incoming side can't key off a tracked column
    # (it may legitimately be NULL) — use a sentinel presence flag
    j = cur.alias("c").join(
        inc.withColumn("__in", F.lit(1)).alias("i"), pk, "full_outer"
    )
    in_cur = F.col("c.valid_from").isNotNull()
    in_inc = F.col("i.__in").isNotNull()
    same = tracked_struct("c").eqNullSafe(tracked_struct("i"))

    unchanged = j.where(in_cur & in_inc & same).select("c.*")
    to_close = j.where(in_cur & (~in_inc | ~same)).select("c.*").withColumn(
        "valid_to", F.lit(load_ts)
    ).withColumn("is_current", F.lit(False))
    to_insert = open_row(
        j.where(in_inc & (~in_cur | ~same)).select(
            *pk, *[F.col(f"i.{c}").alias(c) for c in tracked]
        )
    )
    # newly closed versions append to the closed partition (the only
    # write it ever sees); the new open set staged-swaps into open/.
    # The append must land BEFORE the swap: to_close reads open/, and
    # both frames read it through the full-outer join above — the
    # append materializes to_close while its input still exists.
    write_delta_or_parquet(to_close, c_dir, mode="append")
    new_open = unchanged.unionByName(to_insert)
    _staged_swap(spark, new_open, o_dir)
    return read_scd2_history(spark, path)
