"""Streaming window operators over the events stream.

Batch-parity design: each streaming op has identical semantics to a
batch SQL expression, so the DuckDB oracle checks the streaming result
(queries/streaming_queries.py). Streams read the same parquet via
``readStream`` (explicit schema — streaming requires one), run with
``trigger(availableNow=True)`` so runs terminate, and land in a memory
sink the caller reads back.

At scale: file-source streaming with availableNow is the idiomatic
incremental-batch pattern (the reference's daily snapshot loop,
re-expressed); watermarks bound state for true continuous runs.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # epoch long (ns or µs — see normalize_event_ts)
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def link_parquet_into_dir(d: str, src: str, single_name: str) -> None:
    """Symlink a parquet source into stream-source dir ``d``
    (idempotent, no data copy). Spark's file streaming source lists
    data FILES non-recursively: a raw testdata table (one file) links
    under ``single_name``, while a Spark-written DIRECTORY table (the
    sf1 evidence layout) must have each part file linked individually
    — a symlinked subdirectory is silently ignored, which zeroed every
    streaming key at sf1 before this was factored out."""
    import glob
    import os

    if os.path.isdir(src):
        targets = sorted(glob.glob(os.path.join(src, "part-*.parquet")))
    else:
        targets = [src]
    for t in targets:
        link = os.path.join(
            d, os.path.basename(t) if len(targets) > 1 else single_name
        )
        try:
            os.symlink(t, link)
        except FileExistsError:  # concurrent creator won the race — same target
            pass


def _as_stream_dir(sf_dir: str) -> str:
    """Per-sf stream-source dir for the events table — at scale the
    source is a real landing directory."""
    import os
    import tempfile

    d = os.path.join(
        tempfile.gettempdir(), "mercurygate_stream_src", sf_dir.strip("/").replace("/", "_")
    )
    os.makedirs(d, exist_ok=True)
    link_parquet_into_dir(d, f"{sf_dir}/events.parquet", "events.parquet")
    return d


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents parquet as a file stream (same landing-directory
    pattern as the events stream; schema from a batch footer peek of
    the same files). Used by the streaming corpus-filter keys — at
    scale the source is the crawl landing directory."""
    import os
    import tempfile

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    d = os.path.join(
        tempfile.gettempdir(), "mercurygate_stream_src_docs",
        sf_dir.strip("/").replace("/", "_"),
    )
    os.makedirs(d, exist_ok=True)
    link_parquet_into_dir(d, f"{sf_dir}/documents.parquet", "documents.parquet")
    schema = spark.read.parquet(d).schema
    return spark.readStream.schema(schema).format("parquet").load(d)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events parquet as a stream, ts normalized to timestamp via the
    same magnitude-guarded normalizer as the batch reader
    (functions.normalize_event_ts) — Spark version drift in the
    TIMESTAMP(NANOS)+explicit-LongType contract (raw ns in ≤4.0 legacy
    mode, µs in 4.1.x) cannot silently compress the timeline."""
    from mercurygate_spark.functions import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    d = _as_stream_dir(sf_dir)
    # File streams require an explicit schema; take it from a batch
    # footer peek of the SAME files rather than hard-coding the raw
    # testdata's layout — the raw files surface ts as LONG (NANOS under
    # nanosAsLong), while Spark-rewritten evidence dirs (the sf1 set)
    # carry INT96/MICROS timestamps, and a mismatched explicit schema
    # either errors (INT96) or silently yields zero rows.
    # normalize_event_ts is the shared choke point that maps either
    # surfaced type to TimestampType.
    schema = spark.read.parquet(d).schema
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(d)
    )
    return normalize_event_ts(raw)


def run_to_memory(stream_df: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Execute a streaming frame with availableNow into a memory sink;
    return the materialized result as a batch DataFrame."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    out = spark.table(name)
    return out


def tumbling_counts(events: DataFrame, minutes: int = 10) -> DataFrame:
    """Tumbling-window counts per event_type with a watermark (bounds
    state; harmless under availableNow)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(events: DataFrame, length_min: int = 10, slide_min: int = 5) -> DataFrame:
    """Sliding-window counts — each event lands in length/slide windows."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", f"{length_min} minutes", f"{slide_min} minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.unix_micros(F.col("w.start")).alias("window_start_us"), "n_events")
    )


def session_windows(events: DataFrame, gap_min: int = 30) -> DataFrame:
    """Session windows per user: a session closes after gap_min of
    inactivity. Batch twin: gaps-and-islands (lag + cumsum)."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", f"{gap_min} minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )


def stateful_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running event count + value sum kept in explicit GroupState — the
    template for operators Spark's built-ins can't express (custom
    sessionization, decaying counters, online sketches).

    On a bounded availableNow run the final state equals the batch
    aggregate, which is what the oracle checks."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("s", DoubleType())]
    )

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def interval_join_streams(
    clicks: DataFrame, purchases: DataFrame, minutes: int = 10, how: str = "inner"
) -> DataFrame:
    """Stream-stream interval join: click events joined to the same
    user's purchase events that happen within `minutes` AFTER the
    click — the canonical attribution shape. Both sides carry
    watermarks (required for append-mode stream-stream joins: they
    bound how long each side's rows are buffered in state; a purchase
    can only match clicks ≤10 min older, so watermark + range
    condition let Spark evict state as time advances).

    Batch twin: the same equi+range theta join, which is the oracle.

    how="leftOuter": unmatched clicks ALSO emit (null purchase cols)
    once the watermark passes their join-window end. Under
    availableNow on a single input file this is deterministic: the
    data processes in one batch (watermark still initial → no outer
    rows yet), then Spark runs a final no-data cleanup trigger with
    the watermark advanced to max(event_ts) − delay, flushing exactly
    the unmatched clicks whose window end lies at or before it —
    measured and pinned in tests/test_streaming_semantics.py
    ::test_stream_stream_left_outer_join_null_emission. Clicks inside
    the final watermark window never emit (they would need a later
    trigger), which the oracle replays arithmetically.
    """
    a = clicks.select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", "1 hour")
    b = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", "1 hour")
    joined = a.join(
        b,
        (a["user_id"] == b["p_user_id"])
        & (b["purchase_ts"] >= a["click_ts"])
        & (b["purchase_ts"] <= a["click_ts"] + F.expr(f"INTERVAL {minutes} MINUTES")),
        how,
    )
    return joined.select(
        "click_id",
        "purchase_id",
        # the equi key survives on whichever side is present (outer
        # rows have only one side's columns non-null)
        F.coalesce(a["user_id"], b["p_user_id"]).alias("user_id"),
        F.unix_micros("click_ts").alias("click_ts_us"),
        F.unix_micros("purchase_ts").alias("purchase_ts_us"),
        "purchase_value",
    )


def distinct_pairs_stream(events: DataFrame) -> DataFrame:
    """Streaming dropDuplicates on (user_id, event_type) — the
    incremental-dedupe shape; output restricted to the key columns so
    which-row-survives nondeterminism can't leak into results."""
    return events.select("user_id", "event_type").dropDuplicates(["user_id", "event_type"])


def typed_state_type_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator on the transformWithState API (Spark
    4): per-user MAP state keyed by event_type, updated per batch —
    the typed-state successor to applyInPandasWithState (see
    stateful_user_counts) with composable ValueState/ListState/
    MapState primitives, TTL, and timers instead of one opaque tuple.

    State layout: MapState<event_type, count> per user_id group. Each
    batch emits the UPDATED (user_id, event_type, running_count) rows
    only — state-diff output, the incremental-materialized-view shape.
    On a bounded availableNow run the final count per key equals the
    batch groupBy — the oracle contract. Requires the RocksDB state
    store (transformWithState's backing store; set by the caller)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _TypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "type_counts", "event_type string", "n bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            batch: dict[str, int] = {}
            for pdf in rows:
                for et, n in pdf.groupby("event_type").size().items():
                    batch[et] = batch.get(et, 0) + int(n)
            out = []
            for et in sorted(batch):
                prev = (
                    self._counts.getValue((et,))[0]
                    if self._counts.containsKey((et,))
                    else 0
                )
                total = prev + batch[et]
                self._counts.updateValue((et,), (total,))
                out.append((key[0], et, total))
            yield pd.DataFrame(out, columns=["user_id", "event_type", "n_events"])

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_TypeCounts(),
        outputStructType="user_id bigint, event_type string, n_events bigint",
        outputMode="Update",
        timeMode="None",
    )


def ohlc_bars_stream(events: DataFrame, minutes: int | None = None) -> DataFrame:
    """Streaming OHLC bars — the batch ts_ohlc_bars operator run
    incrementally: tumbling event-time windows per series, open/close
    via min_by/max_by over the total (ts, event_id) order. The same
    declarative aggregate works in both engines BECAUSE it is
    order-insensitive mergeable state (each partial keeps one
    candidate row); a first_value/window formulation would not be
    expressible in a streaming aggregate at all. Watermark bounds
    state for continuous runs; under availableNow the final bars equal
    the batch groupBy — the oracle contract."""
    from mercurygate_spark.operators.ohlc import BAR_MINUTES, ohlc_aggs, ohlc_ord

    if minutes is None:
        minutes = BAR_MINUTES
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(*ohlc_aggs(ohlc_ord()))
        .select(
            "event_type",
            F.unix_micros(F.col("w.start")).alias("bar_us"),
            "open",
            "high",
            "low",
            "close",
            "n_ticks",
        )
    )
