"""DST-transition torture tests (VERDICT r6, next-round item 7).

Dataset: events straddling the America/New_York spring-forward,
2026-03-08 — local wall clock jumps 01:59:59 EST → 03:00:00 EDT at
07:00:00 UTC. The engine's contract is that ALL window/gap/session
arithmetic runs on absolute instants (unix micros; session TZ pinned
to UTC by session.py and load_tables), so a 2-real-minute gap that
LOOKS like 62 wall-clock minutes must never split a session, and
window boundaries/counts must be identical whether the surrounding
session happens to be configured UTC or America/New_York (the
driver's environment leaks TZ into any code that forgets to pin it).

Events are constructed from integer epoch micros via
F.timestamp_micros(), which is TZ-free — the fixture carries exact
instants no matter what the session TZ says at any point.
"""

from __future__ import annotations

from contextlib import contextmanager
from datetime import datetime

from pyspark.sql import functions as F

# 07:00:00 UTC on 2026-03-08 = the spring-forward instant
# (02:00 EST → 03:00 EDT local)
T0_US = int((datetime(2026, 3, 8, 7, 0, 0) - datetime(1970, 1, 1)).total_seconds()) * 1_000_000
MIN_US = 60 * 1_000_000

# (event_id, minutes relative to transition, user_id)
_ROWS = [
    (1, -15, 1),  # 01:45 EST
    (2, -5, 1),   # 01:55 EST
    (3, -1, 1),   # 01:59 EST
    (4, +1, 1),   # 03:01 EDT — 2 REAL minutes after event 3
    (5, +5, 1),   # 03:05 EDT
    (6, +65, 1),  # 04:05 EDT — 60 real minutes after event 5
    (7, -14, 2),  # second user
    (8, +2, 2),
    (9, +70, 2),
]


@contextmanager
def session_tz(spark, tz: str):
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        yield
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def _events(spark):
    df = spark.createDataFrame(
        [(e, T0_US + m * MIN_US, u) for e, m, u in _ROWS],
        schema="event_id long, ts_us long, user_id long",
    )
    return df.select(
        "event_id", F.timestamp_micros("ts_us").alias("ts"), "user_id"
    )


# user 1 gaps: 10, 4, 2, 4, 60 min → one 5-event session + event 6 alone;
# user 2 gaps: 16, 68 min → a 2-event session + event 9 alone.
EXPECTED_SESSIONS = {(1, 5), (1, 1), (2, 2), (2, 1)}


def test_sessionize_gap_ignores_wall_clock_jump(spark):
    """gap=30min sessionize: events 3 and 4 are 2 REAL minutes apart
    (01:59 EST → 03:01 EDT, a 62-minute wall-clock jump). They must
    share a session under ANY session TZ; the 60-real-minute gap to
    event 6 must split regardless of looking like 60 wall minutes."""
    from mercurygate_spark.operators.sessionize import sessionize

    df = _events(spark)
    for tz in ("UTC", "America/New_York"):
        with session_tz(spark, tz):
            out = sessionize(
                df, "user_id", "ts", gap_seconds=1800, order_tiebreak="event_id"
            )
            got = {(r["user_id"], r["n_events"]) for r in out.collect()}
            assert got == EXPECTED_SESSIONS, f"tz={tz}: {sorted(got)}"


def test_tumbling_window_boundaries_are_instant_aligned(spark):
    """30-minute tumbling windows over the transition: sub-day windows
    align to epoch instants, so both TZs must yield the SAME
    (start-instant, count) histogram, and the starts must be exactly
    the UTC half-hours — no 23-hour-day artifacts."""
    df = _events(spark)
    results = {}
    for tz in ("UTC", "America/New_York"):
        with session_tz(spark, tz):
            out = (
                df.groupBy(F.window("ts", "30 minutes").alias("w"))
                .agg(F.count("*").alias("n"))
                .select(F.unix_micros("w.start").alias("start_us"), "n")
            )
            results[tz] = sorted((r["start_us"], r["n"]) for r in out.collect())
    assert results["UTC"] == results["America/New_York"]
    half = 30 * MIN_US
    assert results["UTC"] == [
        (T0_US - half, 4),      # 06:30-07:00 UTC: events 1,2,3,7
        (T0_US, 3),             # 07:00-07:30 UTC: events 4,5,8
        (T0_US + 2 * half, 2),  # 08:00-08:30 UTC: events 6,9
    ]


def test_streaming_session_window_spans_transition(spark, tmp_path):
    """Structured Streaming session_window(gap=30min) across the
    spring-forward, with the session TZ set to America/New_York for
    the WHOLE query: same session structure as batch sessionize."""
    import os

    from tests.test_streaming_semantics import _write_batch

    src = str(tmp_path / "dst_stream")
    os.makedirs(src, exist_ok=True)
    # materialize instants under UTC so the parquet file carries the
    # exact epoch micros of the fixture
    with session_tz(spark, "UTC"):
        rows = [
            (r["event_id"], r["ts"], r["user_id"])
            for r in _events(spark).collect()
        ]
        _write_batch(spark, rows, os.path.join(src, "b0.parquet"))
    with session_tz(spark, "America/New_York"):
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, user_id long")
            .parquet(src)
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(
                F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
            )
            .agg(F.count("*").alias("n"))
            .select("user_id", "n")
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("dst_sessions")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r["user_id"], r["n"]) for r in spark.table("dst_sessions").collect()
        }
    assert got == EXPECTED_SESSIONS


def test_streaming_tumbling_counts_span_transition(spark, tmp_path):
    """Streaming tumbling 30-min windows under a New-York session TZ:
    window starts and counts must equal the batch/UTC histogram (the
    streaming twin of the batch boundary test, run through a real
    microbatch)."""
    import os

    from tests.test_streaming_semantics import _write_batch

    src = str(tmp_path / "dst_tumble")
    os.makedirs(src, exist_ok=True)
    with session_tz(spark, "UTC"):
        rows = [
            (r["event_id"], r["ts"], r["user_id"])
            for r in _events(spark).collect()
        ]
        _write_batch(spark, rows, os.path.join(src, "b0.parquet"))
    with session_tz(spark, "America/New_York"):
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, user_id long")
            .parquet(src)
        )
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "30 minutes").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.unix_micros("w.start").alias("start_us"), "n")
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("dst_tumble")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(
            (r["start_us"], r["n"]) for r in spark.table("dst_tumble").collect()
        )
    half = 30 * MIN_US
    assert got == [(T0_US - half, 4), (T0_US, 3), (T0_US + 2 * half, 2)]


def test_hour_trunc_is_instant_exact_across_transition(spark):
    """The engine's cross-engine-exact calendar paths truncate via
    unix_micros arithmetic (TZ-free). Pin: identical epoch results
    under both TZs, and the hours around the jump are exactly
    06:00/07:00/08:00 UTC."""
    df = _events(spark)
    results = {}
    for tz in ("UTC", "America/New_York"):
        with session_tz(spark, tz):
            out = df.select(
                "event_id",
                (F.unix_micros("ts") - F.unix_micros("ts") % (3600 * 1_000_000))
                .alias("hour_us"),
            )
            results[tz] = sorted((r["event_id"], r["hour_us"]) for r in out.collect())
    assert results["UTC"] == results["America/New_York"]
    by_id = dict(results["UTC"])
    assert by_id[3] == T0_US - 3600 * 1_000_000
    assert by_id[4] == T0_US
    assert by_id[6] == T0_US + 3600 * 1_000_000


def test_date_trunc_day_differs_by_tz_and_engine_pins_utc(spark):
    """The converse pin: date_trunc('DAY', ts) IS session-TZ-sensitive
    (06:30 UTC is Mar 8 in UTC but Mar 7 (EST) in New York local) —
    assert the sensitivity exists, which is exactly why the engine
    pins UTC before any calendar key runs (session.get_spark,
    registry.load_tables). A green here plus the non-UTC full-sweep
    (docs/COVERAGE.md) proves the pin is what protects the oracles."""
    df = _events(spark).where(F.col("event_id") == 1)  # 06:45 UTC
    got = {}
    for tz in ("UTC", "America/New_York"):
        with session_tz(spark, tz):
            got[tz] = df.select(
                F.unix_micros(F.date_trunc("DAY", "ts")).alias("d")
            ).collect()[0]["d"]
    assert got["UTC"] == T0_US - 7 * 3600 * 1_000_000  # Mar 8 00:00 UTC
    # NY local midnight Mar 8 = 05:00 UTC
    assert got["America/New_York"] == T0_US - 2 * 3600 * 1_000_000
    assert got["UTC"] != got["America/New_York"]
