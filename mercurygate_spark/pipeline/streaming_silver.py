"""Incremental bronze→silver via Structured Streaming (SURVEY.md §1.4
'Structured Streaming variant' — the reference's daily snapshot loop
re-expressed as an Auto-Loader-style incremental pipeline).

``readStream`` watches the bronze landing directory; each microbatch
runs the SAME conform + merge_upsert_scd the batch path uses
(foreachBatch — the canonical pattern for merge sinks, since MERGE
isn't an append-only streaming sink). ``availableNow`` makes runs
terminate after draining the backlog, which is exactly the reference's
scheduled-notebook cadence with checkpointed exactly-once progress on
top: a crashed run resumes from the checkpoint instead of re-reading
everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from mercurygate_spark.catalog import TableSpec
from mercurygate_spark.pipeline.silver import conform, merge_upsert_scd


def incremental_silver(
    spark: SparkSession,
    bronze_dir: str,
    schema: StructType | str,
    spec: TableSpec,
    silver_path: str,
    checkpoint_dir: str,
) -> None:
    """Drain new bronze files into the silver table with SCD merge
    semantics. Blocks until the backlog is processed (availableNow)."""
    stream = spark.readStream.schema(schema).format("parquet").load(bronze_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # delta semantics: a key missing from this microbatch is merely
        # unchanged, not deleted — no soft-delete flip
        merge_upsert_scd(
            spark, conform(batch_df, spec), spec, silver_path, soft_delete_missing=False
        )

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
