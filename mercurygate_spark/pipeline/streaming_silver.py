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
    after_merge=None,
) -> None:
    """Drain new bronze files into the silver table with SCD merge
    semantics. Blocks until the backlog is processed (availableNow).

    ``after_merge(batch_id)`` is a failure-injection hook invoked
    AFTER the merge side effect but BEFORE foreachBatch returns —
    i.e. before Structured Streaming commits the batch's offsets to
    the checkpoint. Raising from it reproduces the worst crash window
    of the foreachBatch contract (side effect durable, progress not),
    which the restart-torture test uses to prove the merge is
    replay-idempotent. Production callers leave it None.

    Exactly-once here is at-least-once delivery × idempotent sink:
    foreachBatch may REPLAY a batch whose merge already ran (crash in
    that window ⇒ on restart the same batch_id/data re-runs). The
    idempotency key is the table's primary key + order_by recency —
    merge_upsert_scd dedupes to latest-per-pk, so re-merging rows
    that are already the table's current versions is a no-op (equal
    order_by ties resolve to the incoming copy, which is value-equal).
    """
    stream = spark.readStream.schema(schema).format("parquet").load(bronze_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # delta semantics: a key missing from this microbatch is merely
        # unchanged, not deleted — no soft-delete flip
        merge_upsert_scd(
            spark, conform(batch_df, spec), spec, silver_path, soft_delete_missing=False
        )
        if after_merge is not None:
            after_merge(batch_id)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
