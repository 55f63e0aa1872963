"""Sinks (SURVEY.md §2a K1-K3).

The reference writes Bronze as hive-partitioned parquet
(mm_source_to_bronze.py:164) and Silver as Delta with
``overwriteSchema=true`` (mm_bronze_silver.py:230,246,271). This engine
keeps both shapes, with a parquet fallback when delta-spark is not on
the classpath (SURVEY.md §7 risk "Delta availability").

Scale posture: writers accept a ``target_partitions`` hint so callers
can compact small files (the reference's daily full-overwrite sidesteps
compaction; at 100 TB you repartition before write instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def delta_available(spark: SparkSession) -> bool:
    """True when the Delta Lake writer can be used in this session."""
    try:
        # py4j resolves missing classes to JavaPackage lazily, so probe
        # with Class.forName which genuinely throws when absent.
        spark._jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")  # noqa: SLF001
        return True
    except Exception:
        return False


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    target_partitions: int | None = None,
) -> None:
    """Partitioned parquet overwrite — reference K1
    (mm_source_to_bronze.py:164) as one idempotent call.

    ``sortWithinPartitions(partition_by)`` before the write bounds
    each task to ONE open parquet writer at a time (FileFormatWriter
    closes the current file when the sorted partition key changes):
    without it a task holds a column-buffering writer per partition
    value it sees — with ~80 year_month values that is the JVM-heap
    blowup the round-8 memory probe measured (OOM at a 1.4 GB heap,
    unreachable by execution-memory spilling because writer buffers
    live on the heap). The sort is a per-task, spillable operation —
    exactly the memory class that degrades gracefully — and, unlike a
    repartition(partition_by), it neither adds a shuffle nor
    concentrates a hot month into one task."""
    if target_partitions:
        df = df.repartition(target_partitions, *(partition_by or []))
    if partition_by:
        df = df.sortWithinPartitions(*partition_by)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_delta_or_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    overwrite_schema: bool = True,
    partition_by: list[str] | None = None,
) -> str:
    """Reference K2 (mm_bronze_silver.py:230): Delta overwrite with
    overwriteSchema when Delta is on the classpath, else parquet.
    Returns the format actually used ('delta' | 'parquet')."""
    fmt = "delta" if delta_available(df.sparkSession) else "parquet"
    w = df.write.format(fmt).mode(mode)
    if fmt == "delta" and overwrite_schema:
        w = w.option("overwriteSchema", "true")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)
    return fmt


def read_delta_or_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read back whatever ``write_delta_or_parquet`` produced. The
    _delta_log probe uses the Hadoop FileSystem API (io.fs) so it works
    on object-store URIs, not just driver-local paths."""
    from mercurygate_spark.io.fs import path_exists

    fmt = "delta" if path_exists(spark, path.rstrip("/") + "/_delta_log") else "parquet"
    return spark.read.format(fmt).load(path)
