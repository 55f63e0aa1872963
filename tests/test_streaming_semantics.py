"""Streaming semantics beyond the oracle harness: watermark behavior
across real microbatch boundaries (SURVEY.md §2c 'watermark +
late-data').

What Spark's watermark actually guarantees (and what we assert):
1. append mode emits each closed window EXACTLY ONCE;
2. state is BOUNDED — windows behind the watermark are evicted, so
   state size doesn't grow with stream length;
3. on-time data aggregates correctly across microbatch boundaries.
A late row whose window state is still alive may legally still be
aggregated (the watermark is a minimum-retention guarantee, not a
strict filter) — so that edge is deliberately not pinned here.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F


def _write_batch(spark, rows, path):
    """Write ONE parquet FILE (not a Spark output directory — the file
    streaming source does not recurse into subdirectories)."""
    import glob
    import shutil
    import tempfile

    df = spark.createDataFrame(rows, schema="event_id long, ts timestamp, user_id long")
    staging = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    shutil.move(part, path)
    shutil.rmtree(staging, ignore_errors=True)


def test_watermark_exactly_once_and_bounded_state(spark, tmp_path):
    """10 microbatches, one 10-minute window each, 10-minute watermark:
    every window must appear exactly once with the right count, and
    the final state must hold only the windows the watermark hasn't
    passed — not all 10."""
    src = str(tmp_path / "stream_src")
    os.makedirs(src, exist_ok=True)
    base = datetime(2026, 1, 1, 10, 0)
    n_batches = 10
    for i in range(n_batches):
        # two events per 10-min window, windows strictly advancing
        t0 = base + timedelta(minutes=10 * i)
        _write_batch(
            spark,
            [(2 * i, t0, 1), (2 * i + 1, t0 + timedelta(minutes=5), 1)],
            os.path.join(src, f"b{i:02d}.parquet"),
        )
    import time as _time

    now = _time.time()
    for i in range(n_batches):
        os.utime(os.path.join(src, f"b{i:02d}.parquet"), (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("string").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_semantics")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = [(r["ws"], r["n"]) for r in spark.table("wm_semantics").collect()]

    # exactly-once: no window start twice, every emitted count correct
    starts = [ws for ws, _ in emitted]
    assert len(starts) == len(set(starts)), f"window re-emitted: {emitted}"
    assert all(n == 2 for _, n in emitted), f"wrong counts: {emitted}"
    # windows the watermark passed were all emitted (the last 1-2 may
    # still be open — watermark lags one batch)
    assert len(emitted) >= n_batches - 2
    # bounded state: far fewer rows retained than windows seen
    state = q.lastProgress["stateOperators"][0]
    assert state["numRowsTotal"] <= 3, f"state unbounded: {state['numRowsTotal']}"


def test_stream_batch_parity_across_microbatches(spark, tmp_path):
    """The streaming aggregate over N microbatches equals the batch
    aggregate over the union of all files — the batch-parity contract
    the oracle harness checks on one batch, here checked across many."""
    src = str(tmp_path / "stream_src2")
    os.makedirs(src, exist_ok=True)
    base = datetime(2026, 1, 1, 9, 0)
    rows_all = []
    for i in range(5):
        rows = [(10 * i + j, base + timedelta(minutes=3 * i + j), j % 3) for j in range(4)]
        rows_all += rows
        _write_batch(spark, rows, os.path.join(src, f"c{i}.parquet"))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    counts = stream.groupBy("user_id").agg(F.count("*").alias("n"))
    q = (
        counts.writeStream.format("memory")
        .queryName("parity_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["user_id"]: r["n"] for r in spark.table("parity_counts").collect()}
    expect = {}
    for _, _, u in rows_all:
        expect[u] = expect.get(u, 0) + 1
    assert got == expect


def test_checkpoint_resume_is_incremental_exactly_once(spark, tmp_path):
    """The checkpointed foreachBatch pipeline must be restartable:
    drain the backlog, land MORE files, restart with the SAME
    checkpoint — only the new files are processed (no reprocessing of
    the old backlog, no lost rows). This is the incremental-batch
    contract the reference's daily snapshot loop lacks (it re-reads
    everything, every day)."""
    src = str(tmp_path / "resume_src")
    sink = str(tmp_path / "resume_sink")
    ckpt = str(tmp_path / "resume_ckpt")
    os.makedirs(src, exist_ok=True)
    base = datetime(2026, 1, 1, 9, 0)

    def drain():
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long"
        ).parquet(src)

        def land(batch_df, batch_id):
            batch_df.write.mode("append").parquet(sink)

        q = (
            stream.writeStream.foreachBatch(land)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write_batch(
        spark,
        [(i, base + timedelta(minutes=i), i % 2) for i in range(6)],
        os.path.join(src, "first.parquet"),
    )
    drain()
    assert spark.read.parquet(sink).count() == 6

    _write_batch(
        spark,
        [(100 + i, base + timedelta(hours=1, minutes=i), i % 2) for i in range(4)],
        os.path.join(src, "second.parquet"),
    )
    drain()
    landed = spark.read.parquet(sink)
    # 6 + 4, nothing duplicated, nothing lost
    assert landed.count() == 10
    ids = sorted(r["event_id"] for r in landed.collect())
    assert ids == list(range(6)) + [100, 101, 102, 103]


def test_ts_reader_contract_canary(spark, sf_dir):
    """Version-drift canary (VERDICT r5 item 2): Spark's contract for
    parquet TIMESTAMP(NANOS) read under an explicit LongType schema
    silently changed between versions (raw nanos under legacy
    nanosAsLong in ≤4.0 vs micros in 4.1.x), which compressed the
    event timeline 1000× and broke four streaming keys in round 5.

    Reads events.ts through all three reader paths — batch inferred,
    batch explicit-LongType (normalized), and streaming
    explicit-LongType (normalized) — and asserts each agrees with
    DuckDB's min/max(ts) to the exact microsecond. If a future Spark
    upgrade drifts any path, this fails loudly instead of shipping
    garbage windows."""
    import duckdb

    from mercurygate_spark.functions import normalize_event_ts
    from mercurygate_spark.streaming.windows import (
        EVENTS_SCHEMA,
        read_events_stream,
        run_to_memory,
    )

    path = f"{sf_dir}/events.parquet"
    lo, hi = duckdb.sql(
        f"select min(ts), max(ts) from read_parquet('{path}')"
    ).fetchone()
    expect = (lo.replace(tzinfo=None), hi.replace(tzinfo=None))

    def min_max(df):
        r = df.select(
            F.min("ts").alias("lo"), F.max("ts").alias("hi")
        ).collect()[0]
        return (r["lo"].replace(tzinfo=None), r["hi"].replace(tzinfo=None))

    # 1. batch inferred (registry path)
    inferred = normalize_event_ts(spark.read.parquet(path))
    assert min_max(inferred) == expect, "batch-inferred path drifted"

    # 2. batch explicit LongType + magnitude-guarded normalizer
    explicit = normalize_event_ts(
        spark.read.schema(EVENTS_SCHEMA).parquet(path)
    )
    assert min_max(explicit) == expect, "batch-explicit-schema path drifted"

    # 3. streaming explicit LongType (the path that broke in round 5)
    agg = (
        read_events_stream(spark, sf_dir)
        .groupBy()
        .agg(
            F.unix_micros(F.min("ts")).alias("lo_us"),
            F.unix_micros(F.max("ts")).alias("hi_us"),
        )
    )
    row = run_to_memory(agg, output_mode="complete").collect()[0]
    import calendar

    # integer µs on both sides — float .timestamp() math can lose a µs
    def to_us(dt):
        return calendar.timegm(dt.timetuple()) * 10**6 + dt.microsecond

    assert (row["lo_us"], row["hi_us"]) == (to_us(expect[0]), to_us(expect[1])), (
        f"streaming path drifted: got ({row['lo_us']}, {row['hi_us']}) µs, "
        f"want {expect}"
    )


def test_dedupe_within_watermark_evicts_state(spark, tmp_path):
    """Pins the production contract of dropDuplicatesWithinWatermark
    (stream_dedupe_within_watermark's docstring): a duplicate arriving
    while the key's state is alive is suppressed; after the watermark
    passes the key's horizon, state is evicted and the SAME key is
    emitted again. Three microbatches, event time advancing 2 hours
    per batch, 30-minute watermark."""
    import time as _time

    src = str(tmp_path / "dedupe_src")
    os.makedirs(src, exist_ok=True)
    base = datetime(2026, 3, 1, 8, 0)
    # Timing rules this pins (observed via StreamingQueryProgress):
    # the watermark a batch USES comes from the batches before it, and
    # state eviction runs at END of batch — so a key re-emits only in
    # a batch that starts strictly after one whose watermark passed
    # the key's horizon. Key B does the watermark-advancing.
    # batch 0: key A twice (in-batch dup suppressed) + key B
    _write_batch(
        spark,
        [(1, base, 100), (2, base + timedelta(minutes=1), 100),
         (3, base, 200)],
        os.path.join(src, "b0.parquet"),
    )
    # batch 1 (+2h): key B — suppressed duplicate; raises max event
    # time so the NEXT batch runs with watermark +1h30
    _write_batch(
        spark,
        [(4, base + timedelta(hours=2), 200)],
        os.path.join(src, "b1.parquet"),
    )
    # batch 2: key B again — runs with wm +1h30; at its END key A
    # (horizon base+31min) is evicted
    _write_batch(
        spark,
        [(5, base + timedelta(hours=2, minutes=1), 200)],
        os.path.join(src, "b2.parquet"),
    )
    # batch 3 (+4h): key A twice — fresh state epoch, re-emits ONCE
    _write_batch(
        spark,
        [(6, base + timedelta(hours=4), 100),
         (7, base + timedelta(hours=4, minutes=1), 100)],
        os.path.join(src, "b3.parquet"),
    )
    now = _time.time()
    for i in range(4):
        os.utime(os.path.join(src, f"b{i}.parquet"), (now + 10 * i, now + 10 * i))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    deduped = (
        stream.withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark(["user_id"])
        .select("event_id", "user_id")
    )
    name = "dedupe_wm_evict"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        (r["user_id"], r["event_id"]) for r in spark.table(name).collect()
    )
    emitted_users = [u for u, _ in rows]
    # key A: one emission per state epoch (b0, then b3 after its b2
    # eviction); key B emits once in b0 — its b1 duplicate is
    # suppressed, and by b2's run the wm (+1h30) has passed B's own
    # horizon too, so whether b2's arrival emits depends only on
    # end-of-batch eviction order — pin A's contract, allow either
    # for B's racing edge
    assert emitted_users.count(100) == 2, rows
    assert emitted_users.count(200) in (1, 2), rows
    # hard suppressions: in-batch duplicates and within-horizon dup
    emitted_events = {e for _, e in rows}
    assert {2, 4, 7}.isdisjoint(emitted_events), rows


def test_stream_stream_left_outer_join_null_emission(spark, tmp_path):
    """Stream-stream LEFT OUTER interval join semantics, the part the
    inner-join key (stream_interval_join) can't see:

    1. matched pairs emit EAGERLY (first microbatch, like the inner join);
    2. an unmatched left row emits its null-padded outer result only
       AFTER the watermark passes its join-window end — and in the
       microbatch FOLLOWING the one that advanced the watermark
       (watermarks update between batches);
    3. at availableNow termination Spark runs a final state-cleanup
       trigger with the watermark advanced through the LAST batch, so
       trailing unmatched rows behind that final watermark DO flush —
       but a row within the final watermark delay (c4 here) stays
       unemitted forever. Pipelines draining a backlog only need a
       flush event for the very tail, not per batch.
    """
    import glob
    import shutil
    import tempfile
    import time as _time
    from datetime import datetime, timedelta

    src = str(tmp_path / "ssj")
    os.makedirs(src, exist_ok=True)
    base = datetime(2026, 1, 1, 10, 0)

    def write(path, rows):
        df = spark.createDataFrame(
            rows, schema="event_id long, ts timestamp, user_id long, event_type string"
        )
        staging = tempfile.mkdtemp()
        df.coalesce(1).write.mode("overwrite").parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        shutil.move(part, path)
        shutil.rmtree(staging, ignore_errors=True)

    # b0: c1 matches p1 inside the 10-min interval; c2 never matches
    write(os.path.join(src, "b0.parquet"), [
        (1, base, 1, "click"),
        (2, base + timedelta(minutes=1), 2, "click"),
        (100, base + timedelta(minutes=5), 1, "purchase"),
    ])
    # b1: advances max event time to 11:00 → watermark 10:55 for b2
    write(os.path.join(src, "b1.parquet"), [(3, base + timedelta(minutes=60), 3, "click")])
    # b2: triggers eviction of c2's expired state → outer null emits here
    write(os.path.join(src, "b2.parquet"), [(4, base + timedelta(minutes=120), 4, "click")])
    now = _time.time()
    for i in range(3):
        os.utime(os.path.join(src, f"b{i}.parquet"), (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "5 minutes")
    )
    clicks = stream.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    purchases = stream.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL 10 MINUTES"
        ),
        "leftOuter",
    ).select("click_id", "purchase_id")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["click_id"], r["purchase_id"]) for r in spark.table("ssj_outer").collect()}
    # c1 matched eagerly; c2 null-emitted once the watermark passed
    # mid-stream; c3 flushed by the final cleanup trigger (final wm =
    # 12:00 - 5min = 11:55 > its 11:10 window end); c4's window end
    # (12:10) is beyond the final watermark → never emitted.
    assert got == {(1, 100), (2, None), (3, None)}


def test_python_stream_source_restart_replays_exactly_once(spark, tmp_path):
    """Kill the tick stream mid-feed and restart from the same
    checkpoint: the committed-offset replay path (readBetweenOffsets)
    must hand back exactly the in-flight batch — total rows stay 200
    with no duplicates and no gaps. This is the restart contract the
    API exists for; the parity key only exercises the happy path."""
    from pyspark.sql import functions as F

    from mercurygate_spark.io.python_source import register_tick_stream_source

    register_tick_stream_source(spark)
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run(drain_all: bool) -> None:
        q = (
            spark.readStream.format("ticks")
            .load()
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
        ).start()
        try:
            if drain_all:
                q.processAllAvailable()
            else:
                # stop after at least one committed batch
                import time

                for _ in range(300):
                    if q.lastProgress and q.lastProgress["numInputRows"] > 0:
                        break
                    time.sleep(0.1)
        finally:
            q.stop()

    run(drain_all=False)   # partial run, killed mid-feed
    run(drain_all=True)    # restart from the same checkpoint
    got = spark.read.parquet(out_dir)
    assert got.count() == 200
    assert got.select("tick_id").distinct().count() == 200  # no dupes
    assert got.agg(F.min("tick_id"), F.max("tick_id")).first() == (0, 199)  # no gaps


def _protobuf_available() -> bool:
    """transformWithStateInPandas serializes its state-server protocol
    with the google.protobuf Python package, which is not installed in
    this sandbox (and cannot be: no network). Same env-gate class as
    delta-spark — the operator is real, the execution path unlocks the
    moment the dependency lands."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _protobuf_available(),
    reason="google.protobuf not installed; transformWithState needs it",
)
def test_transform_with_state_type_counts(spark, sf_dir):
    """typed_state_type_counts (transformWithStateInPandas + RocksDB
    state store + MapState): final per-(user, event_type) count on a
    bounded run equals the batch groupBy."""
    from pyspark.sql import Window

    from mercurygate_spark.streaming.windows import (
        read_events_stream,
        run_to_memory,
        typed_state_type_counts,
    )

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    out = run_to_memory(
        typed_state_type_counts(read_events_stream(spark, sf_dir)),
        output_mode="update",
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(F.col("n_events").desc())
    got = {
        (r.user_id, r.event_type): r.n_events
        for r in out.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .collect()
    }
    exact = {
        (r.user_id, r.event_type): r.n
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exact


def test_stream_static_ivfpq_index_append_visible_next_microbatch(spark, tmp_path):
    """stream_ivfpq_probe's live-refresh claim, pinned (round-9 verdict
    item 3): 'the static index side is re-planned per micro-batch, so a
    nightly index append is picked up at the NEXT batch with no
    restart'. This is the STRONG in-run form — one streaming query,
    maxFilesPerTrigger=1, the index append performed inside foreachBatch
    AFTER micro-batch 0 — so visibility at batch 1 can only come from
    per-micro-batch re-planning of the static catalog table, not from a
    query restart.

    Both query vectors are IDENTICAL to corpus vector 9's embedding, and
    the appended index row (id 999999) is also vector 9's embedding with
    ADC distance 0 to the queries — so it lands in the very list both
    queries probe: its absence from batch 0 is meaningful (it WOULD have
    matched had it been in the index), and its presence in batch 1 can
    only mean the join re-read the appended file."""
    import glob
    import shutil
    import tempfile

    from mercurygate_spark.io.bucketing import write_bucketed
    from mercurygate_spark.operators.similarity import (
        ivfpq_encode,
        ivfpq_score_distributed,
        pq_train_codebooks,
        train_ivf_centroids,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    cmat = train_ivf_centroids(e)
    cmats = pq_train_codebooks(e)
    name = f"mg_live_refresh_{os.getpid()}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    try:
        write_bucketed(
            ivfpq_encode(e, cmat, cmats), name, "centroid_id", 8,
            sort_by="centroid_id",
        )
        src = str(tmp_path / "qsrc")
        os.makedirs(src)
        target = e.where(F.col("vec_id") == 9).collect()[0]["embedding"]

        def land_query(qid, fname, mtime):
            staging = tempfile.mkdtemp()
            spark.createDataFrame(
                [(qid, target)], "vec_id long, embedding array<double>"
            ).coalesce(1).write.mode("overwrite").parquet(staging)
            part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
            dest = os.path.join(src, fname)
            shutil.move(part, dest)
            # distinct mtimes pin the micro-batch order (the file source
            # orders by modification time; equal stamps would make the
            # two-batch sequence racy)
            os.utime(dest, (mtime, mtime))
            shutil.rmtree(staging, ignore_errors=True)

        import time as _time

        now = _time.time()
        land_query(1000001, "f1.parquet", now - 60)
        land_query(1000002, "f2.parquet", now)

        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        scored = ivfpq_score_distributed(stream, spark.table(name), cmat, cmats)

        state = {"appended": False, "batches": []}

        def handle(batch_df, batch_id):
            queries = sorted(
                r[0] for r in batch_df.select("query_id").distinct().collect()
            )
            appended_hits = batch_df.where(
                F.col("candidate_id") == 999999
            ).count()
            state["batches"].append((batch_id, queries, appended_hits))
            if not state["appended"]:
                newv = spark.createDataFrame(
                    [(999999, target)], "vec_id long, embedding array<double>"
                )
                write_bucketed(
                    ivfpq_encode(newv, cmat, cmats), name, "centroid_id", 8,
                    sort_by="centroid_id", mode="append",
                )
                state["appended"] = True

        q = (
            scored.writeStream.foreachBatch(handle)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

        assert len(state["batches"]) == 2, state["batches"]
        b0, b1 = state["batches"]
        # batch 0: appended vector not yet in the index — zero hits even
        # though it would have matched (same probed list, ADC 0)
        assert b0[1] == [1000001] and b0[2] == 0, state["batches"]
        # batch 1: the SAME static table frame now serves the appended
        # row — picked up with no restart
        assert b1[1] == [1000002] and b1[2] == 1, state["batches"]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_stream_filter_funnel_is_genuinely_multi_batch(spark):
    """The streaming funnel's contract: the availableNow run actually
    splits into multiple micro-batches (4 part files ×
    maxFilesPerTrigger=1 — not a single-batch formality), and the
    cross-batch count/XOR merge reproduces the batch stage-0..2
    attrition exactly (raw count = corpus size, stage counts
    monotonically non-increasing)."""
    from mercurygate_spark.queries import all_queries
    from mercurygate_spark.queries import streaming_queries as sq

    sf = "/root/testdata/sf0.001"
    rows = {
        r["stage_idx"]: r
        for r in all_queries()["stream_filter_funnel"](spark, sf).collect()
    }
    assert sq._LAST_FUNNEL_BATCHES >= 2, sq._LAST_FUNNEL_BATCHES
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert rows[0]["n_docs"] == n_docs
    assert rows[0]["n_docs"] >= rows[1]["n_docs"] >= rows[2]["n_docs"]
    assert rows[2]["n_docs"] > 0


def test_new_stateful_keys_rerun_same_session(spark):
    """Same-session re-run idempotence (the r11 doctrine extended to
    the round-12 stateful keys): sink_scd2_history, stream_scd2_upsert
    and stream_filter_funnel each own process-scoped tmp state (table
    dirs, landing dirs, checkpoints); running a key twice in ONE
    session must produce identical results — the driver's bench loop
    runs every headline key 4x in one JVM."""
    from mercurygate_spark.queries import all_queries

    sf = "/root/testdata/sf0.001"
    q = all_queries()
    for key in ("sink_scd2_history", "stream_scd2_upsert", "stream_filter_funnel",
                "stream_decontaminate", "stream_classifier_gate"):
        a = sorted(map(tuple, q[key](spark, sf).collect()))
        b = sorted(map(tuple, q[key](spark, sf).collect()))
        assert a == b, key
        assert len(a) > 0, key
