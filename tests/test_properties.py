"""Property-based tests (SURVEY.md §5.4) via hypothesis: invariants
that must hold for ANY input, not just fixtures."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mercurygate_spark.operators.skew import salted_agg
from mercurygate_spark.pipeline.conform import dedupe_latest

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),            # pk
        st.integers(min_value=0, max_value=10),           # version (order col)
        st.integers(min_value=-1000, max_value=1000),     # payload
    ),
    min_size=1,
    max_size=40,
)


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_dedupe_output_has_unique_pk_and_keeps_max(spark, rows):
    base = datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [(pk, base + timedelta(hours=v), v, p) for pk, v, p in rows],
        schema="pk long, updated_on timestamp, version long, payload long",
    )
    out = dedupe_latest(df, ["pk"], ["updated_on"], tiebreakers=["payload"]).collect()
    # unique pk
    pks = [r["pk"] for r in out]
    assert len(pks) == len(set(pks))
    # every kept row carries its pk's max version (order-col respected)
    expect = {}
    for pk, v, p in rows:
        expect[pk] = max(expect.get(pk, -1), v)
    for r in out:
        assert r["version"] == expect[r["pk"]]
    # input pks all survive
    assert set(pks) == {pk for pk, _, _ in rows}


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_union_preserves_counts(spark, rows):
    df = spark.createDataFrame(rows, schema="a long, b long, c long")
    u = df.unionByName(df)
    assert u.count() == 2 * len(rows)
    assert u.groupBy().agg(F.sum("c")).collect()[0][0] == 2 * sum(r[2] for r in rows)


@given(rows=rows_strategy)
@settings(**SETTINGS)
def test_salted_agg_equals_plain_agg(spark, rows):
    df = spark.createDataFrame(rows, schema="k long, v long, w long")
    plain = {
        (r["k"]): (r["total"], r["n"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("w").alias("total"), F.count("*").alias("n"), F.max("w").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["total"], r["n"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            {
                "total": (F.sum("w"), F.sum("total")),
                "n": (F.count("*"), F.sum("n")),
                "mx": (F.max("w"), F.max("mx")),
            },
            n_salts=4,
        ).collect()
    }
    assert plain == salted


@given(
    keys=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=60),
    probes=st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=15),
)
@settings(**SETTINGS)
def test_cms_one_sided_error_property(spark, keys, probes):
    """Count-Min guarantee for ANY multiset: est(k) >= true_count(k),
    including unseen probe keys (true count 0)."""
    from collections import Counter

    from mercurygate_spark.operators.sketches import cms_build, cms_probe

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    sketch = cms_build(df, "k")
    pdf = spark.createDataFrame([(p,) for p in set(probes)], "k long")
    est = {r["k"]: r["cms_est"] for r in cms_probe(sketch, pdf, "k").collect()}
    truth = Counter(keys)
    assert set(est) == set(probes)  # every probe answered
    for k, e in est.items():
        assert e >= truth.get(k, 0)


@given(
    members=st.sets(st.text(alphabet="abcdef", min_size=1, max_size=6), min_size=1, max_size=30),
)
@settings(**SETTINGS)
def test_bloom_no_false_negatives_property(spark, members):
    """Bloom guarantee for ANY key set: every inserted key hits."""
    from mercurygate_spark.operators.sketches import bloom_bits, bloom_probe

    mdf = spark.createDataFrame([(m,) for m in members], "k string")
    bits = bloom_bits(mdf, "k")
    hits = bloom_probe(bits, mdf, "k").collect()
    assert len(hits) == len(members)
    assert all(r["bloom_hit"] for r in hits)


@given(
    lefts=st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=15),
    rights=st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=15),
    tol=st.integers(min_value=1, max_value=50),
)
@settings(**SETTINGS)
def test_asof_tolerance_subset_property(spark, lefts, rights, tol):
    """For ANY inputs: the tolerance-bounded as-of result is a subset
    of the unbounded result (same matches, minus out-of-window ones),
    and every surviving match distance is within tolerance."""
    from datetime import datetime, timedelta

    from mercurygate_spark.operators.asof import asof_join

    base = datetime(2026, 1, 1)
    ldf = spark.createDataFrame(
        [(1, base + timedelta(seconds=s), i) for i, s in enumerate(lefts)],
        "k long, lts timestamp, lid long",
    )
    rdf = spark.createDataFrame(
        [(1, base + timedelta(seconds=s), float(i)) for i, s in enumerate(rights)],
        "k long, rts timestamp, rv double",
    )
    full = {
        r["lid"]: r["rts"]
        for r in asof_join(
            ldf, rdf, on="k", left_ts="lts", right_ts="rts",
            right_cols=["rts", "rv"], left_key=["lid"],
        ).collect()
    }
    bounded = {
        r["lid"]: r["rts"]
        for r in asof_join(
            ldf, rdf, on="k", left_ts="lts", right_ts="rts",
            right_cols=["rts", "rv"], left_key=["lid"], tolerance_seconds=tol,
        ).collect()
    }
    lts_by_id = {i: base + timedelta(seconds=s) for i, s in enumerate(lefts)}
    for lid, rts in bounded.items():
        assert full[lid] == rts  # same pick where both match
        assert (lts_by_id[lid] - rts).total_seconds() <= tol
    # anything dropped by the tolerance was out of window
    for lid in set(full) - set(bounded):
        assert (lts_by_id[lid] - full[lid]).total_seconds() > tol


@given(
    w=st.integers(min_value=1, max_value=8192),
    h=st.integers(min_value=1, max_value=8192),
    dur=st.integers(min_value=0, max_value=10**10),
    brand=st.sampled_from([b"isom", b"mp42", b"avc1", b"dash", b"M4V "]),
    version=st.sampled_from([0, 1]),
)
@settings(**SETTINGS)
def test_mp4_build_parse_round_trip(w, h, dur, brand, version):
    """parse(build(x)) == x for ANY valid dims/duration/brand/version
    — the no-codec box walker and the builder must stay inverses.
    (Pure Python, no Spark: runs hundreds of cases cheaply.)"""
    from mercurygate_spark.operators.multimodal import build_mp4, parse_mp4_header

    p = build_mp4(w, h, dur, brand, version=version)
    got = parse_mp4_header(p)
    assert got == (brand.decode("ascii"), w, h, dur)


@given(
    ts=st.datetimes(
        min_value=datetime(1990, 1, 1), max_value=datetime(2200, 1, 1)
    ),
)
@settings(**SETTINGS)
def test_epoch_normalizer_unit_invariant(spark, ts):
    """normalize_event_ts must land on the SAME timestamp whether the
    reader surfaced nanos or micros — the magnitude guard that keeps
    Spark-version drift from compressing the timeline (round-5 bug)."""
    import calendar

    from mercurygate_spark.functions import normalize_event_ts

    us = calendar.timegm(ts.timetuple()) * 10**6 + ts.microsecond
    df = spark.createDataFrame([(us,), (us * 1000,)], schema="ts long")
    out = [r["ts"] for r in normalize_event_ts(df).collect()]
    assert out[0] == out[1] == ts.replace(tzinfo=None)


@given(
    totals=st.lists(
        st.integers(min_value=1, max_value=10**7), min_size=1, max_size=8
    ),
)
@settings(**SETTINGS)
def test_token_budget_arithmetic_invariants(totals):
    """The epochs+ppm decomposition of a token quota must (a) never
    exceed the target by more than one fractional pass, (b) hit the
    target exactly when total divides it, (c) keep frac_ppm < 1e6.
    Pure-integer replica of sample_token_budget's plan arithmetic."""
    corpus = sum(totals)
    budget = corpus // 2
    n = len(totals)
    target = budget // n
    for total in totals:
        epochs = target // total
        frac_ppm = ((target % total) * 1_000_000) // total
        assert 0 <= frac_ppm < 1_000_000
        # expected sampled tokens: epochs*total + ~frac_ppm/1e6*total
        lo = epochs * total
        hi = epochs * total + total  # one full fractional pass at most
        assert lo <= target <= hi if epochs * total <= target else True
        if target % total == 0:
            assert frac_ppm == 0 and epochs * total == target


@given(
    n_steps=st.integers(min_value=2, max_value=5),
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # user
            st.integers(min_value=0, max_value=4),   # step type index
            st.integers(min_value=0, max_value=50),  # time
        ),
        min_size=1,
        max_size=60,
    ),
)
@settings(**SETTINGS)
def test_funnel_n_step_matches_sequential_reference(spark, n_steps, events):
    """operators.funnel.funnel_steps at ANY step count (2..5) must
    agree with a per-user sequential replay: a user reaches step i iff
    some event of type i is STRICTLY later than the earliest time they
    reached step i-1 (first-touch ordered-funnel semantics)."""
    from mercurygate_spark.operators.funnel import funnel_steps

    labels = [f"e{i}" for i in range(n_steps)]
    df = spark.createDataFrame(
        [(u, f"e{t}", ts) for u, t, ts in events],
        schema="user_id long, event_type string, ts long",
    )
    out = funnel_steps(
        df, [(lbl, F.col("event_type") == lbl) for lbl in labels]
    ).collect()

    # sequential reference
    by_user: dict[int, list[tuple[int, int]]] = {}
    for u, t, ts in events:
        by_user.setdefault(u, []).append((t, ts))
    depths = []
    for u, evs in by_user.items():
        t0 = [ts for t, ts in evs if t == 0]
        if not t0:
            continue
        reached, prev = 1, min(t0)
        for i in range(1, n_steps):
            nxt = [ts for t, ts in evs if t == i and ts > prev]
            if not nxt:
                break
            reached, prev = i + 1, min(nxt)
        depths.append(reached)

    assert len(out) == n_steps
    first = len(depths)
    for i, row in enumerate(out, start=1):
        n = sum(1 for d in depths if d >= i)
        assert row["step"] == ">".join(labels[:i])
        assert row["n_users"] == n
        assert row["conv_ppm"] == (n * 1_000_000) // first if first else True


@given(
    gap_min=st.integers(min_value=1, max_value=60),
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),     # user
            st.integers(min_value=0, max_value=5000),  # offset minutes
        ),
        min_size=1,
        max_size=50,
    ),
)
@settings(**SETTINGS)
def test_sessionize_matches_sequential_reference(spark, gap_min, events):
    """operators.sessionize at ANY gap must agree with a per-user
    sequential replay: sort by (ts, id), a gap >= threshold starts a
    new session (matching Spark session_window's [start, last+gap)
    semantics); per-session n_events and min-ts must match."""
    from datetime import datetime, timedelta

    from mercurygate_spark.operators.sessionize import sessionize

    base = datetime(2026, 1, 1)
    rows = [
        (u, base + timedelta(minutes=m), i)
        for i, (u, m) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, schema="user_id long, ts timestamp, eid long")
    out = sessionize(df, "user_id", "ts", gap_seconds=gap_min * 60,
                     order_tiebreak="eid")
    got = sorted(
        (r["user_id"], r["session_start"], r["n_events"]) for r in out.collect()
    )

    expect = []
    by_user: dict[int, list] = {}
    for u, ts, i in rows:
        by_user.setdefault(u, []).append((ts, i))
    for u, evs in by_user.items():
        evs.sort()
        start, n, prev = evs[0][0], 0, None
        for ts, _ in evs:
            if prev is not None and (ts - prev).total_seconds() >= gap_min * 60:
                expect.append((u, start, n))
                start, n = ts, 0
            n += 1
            prev = ts
        expect.append((u, start, n))
    assert got == sorted(expect)


@given(
    days=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 40)),  # (user, epoch-day)
        min_size=1,
        max_size=60,
    ),
)
@settings(**SETTINGS)
def test_gaps_islands_matches_sequential_reference(spark, days):
    """The production streaks() contraction (used by window_gaps_islands)
    must agree with a literal per-user scan: longest run of consecutive distinct days, number of
    runs, and total distinct active days."""
    from mercurygate_spark.queries.windows import streaks

    df = spark.createDataFrame(days, schema="user_id long, di long").distinct()
    got = sorted(
        (r["user_id"], r["longest"], r["n_streaks"], r["active"])
        for r in streaks(df).groupBy("user_id")
        .agg(
            F.max("len").alias("longest"),
            F.count("*").alias("n_streaks"),
            F.sum("len").alias("active"),
        )
        .collect()
    )

    by_user: dict[int, set] = {}
    for u, d in days:
        by_user.setdefault(u, set()).add(d)
    expect = []
    for u, ds in by_user.items():
        sd = sorted(ds)
        runs, cur = [], 1
        for a, b in zip(sd, sd[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        expect.append((u, max(runs), len(runs), len(sd)))
    assert got == sorted(expect)


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=1,
        max_size=30,
    ),
)
@settings(**SETTINGS)
def test_moving_median_array_readout_matches_numpy(spark, vals):
    """The production moving_median_expr (used by window_moving_median)
    must equal numpy's exact median over every trailing
    7-element window — including the even-count interpolation."""
    import numpy as np
    from pyspark.sql import Window

    from mercurygate_spark.queries.windows import moving_median_expr

    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, schema="i long, x double")
    w = Window.orderBy("i").rowsBetween(-6, Window.currentRow)
    med = moving_median_expr("x", w)
    got = {r["i"]: r["m"] for r in df.select("i", med.alias("m")).collect()}
    xs = [v for _, v in rows]
    for i in range(len(xs)):
        window = xs[max(0, i - 6) : i + 1]
        assert abs(got[i] - float(np.median(window))) < 1e-9


@given(
    spans=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),      # key
            st.integers(min_value=0, max_value=100),    # start
            st.integers(min_value=1, max_value=30),     # length
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_interval_coverage_matches_brute_union(spark, spans):
    """interval_coverage (the window_interval_coverage sweep) must
    equal the brute-force union of covered integer points, for ANY
    span multiset — including spans that swallow several later ones,
    the case a lag(e)-based merge gets wrong."""
    from mercurygate_spark.queries.windows import interval_coverage

    df = spark.createDataFrame(
        [(k, s, s + ln) for k, s, ln in spans], schema="user_id long, s long, e long"
    )
    got = {
        r["user_id"]: (r["n_islands"], r["covered_us"])
        for r in interval_coverage(df, "user_id").collect()
    }
    expect = {}
    for k in {k for k, _, _ in spans}:
        ivs = sorted((s, s + ln) for kk, s, ln in spans if kk == k)
        islands = []
        for s0, e0 in ivs:
            if islands and s0 <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e0)
            else:
                islands.append([s0, e0])
        expect[k] = (len(islands), sum(e0 - s0 for s0, e0 in islands))
    assert got == expect


@given(
    toks=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=8),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_adjacent_pairs_matches_python_zip(spark, toks):
    """adjacent_pairs (text_bpe_merge_step's zip-shift) must produce
    exactly zip(tk, tk[1:]) for any token array — pinning the
    1-indexed slice arithmetic on empty, single-token, and repeated
    sequences."""
    from collections import Counter

    from mercurygate_spark.queries.text import adjacent_pairs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], schema="i long, tk array<string>"
    )
    out = (
        df.select(F.explode(adjacent_pairs(F.col("tk"))).alias("p"))
        .select("p.w1", "p.w2")
        .collect()
    )
    got = Counter((r["w1"], r["w2"]) for r in out)
    expect = Counter((a, b) for t in toks for a, b in zip(t, t[1:]))
    assert got == expect


@given(
    keys=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),   # event_id
            st.integers(min_value=0, max_value=10**9),   # user_id
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_geohash_formula_matches_subdivision_reference(keys):
    """fn_geohash's closed-form bit interleave must equal the geohash
    SPEC's algorithm — alternating binary midpoint subdivision, lon
    bit first. The production SQL text (_geohash_sql_parts, the same
    string Spark executes) is evaluated in DuckDB over random ids and
    compared against an independent iterative reference."""
    import duckdb

    from mercurygate_spark.queries.scalar_fns import (
        GEOHASH_ALPHA,
        _geohash_sql_parts,
    )

    def reference(gx: int, gy: int) -> str:
        # subdivision on [0, 32768): alternating lon/lat bits, MSB first
        code = 0
        lo_x, hi_x, lo_y, hi_y = 0, 32768, 0, 32768
        for b in range(30):
            if b % 2 == 0:  # even position (MSB side): longitude bit
                mid = (lo_x + hi_x) // 2
                bit = 1 if gx >= mid else 0
                lo_x, hi_x = (mid, hi_x) if bit else (lo_x, mid)
            else:
                mid = (lo_y + hi_y) // 2
                bit = 1 if gy >= mid else 0
                lo_y, hi_y = (mid, hi_y) if bit else (lo_y, mid)
            code = (code << 1) | bit
        return "".join(
            GEOHASH_ALPHA[(code >> (25 - 5 * i)) & 31] for i in range(6)
        )

    con = duckdb.connect()
    con.execute("CREATE TABLE events (event_id BIGINT, user_id BIGINT)")
    con.executemany("INSERT INTO events VALUES (?, ?)", keys)
    xi, yi, code_sql = _geohash_sql_parts()
    rows = con.execute(
        f"SELECT {xi}, {yi}, {code_sql.replace(' div ', ' // ')} FROM events"
    ).fetchall()
    for (e, u), (xv, yv, code) in zip(keys, rows):
        gx, gy = (xv * 32768) // 1000, (yv * 32768) // 1000
        got = "".join(
            GEOHASH_ALPHA[(code >> (25 - 5 * i)) & 31] for i in range(6)
        )
        assert got == reference(gx, gy), (e, u, gx, gy)


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # user
            st.integers(min_value=0, max_value=50),   # ts offset
            st.sampled_from(["a", "b", "c"]),         # type
        ),
        min_size=2,
        max_size=30,
        unique_by=lambda t: (t[0], t[1]),
    )
)
@settings(**SETTINGS)
def test_markov_transitions_match_sequential_replay(spark, events):
    """agg_markov_transitions' lag-pairing must equal a plain
    sequential replay of each user's ordered chain, for any event
    multiset — pinning the (ts, event_id) tie-break and the
    prev-NULL head drop."""
    from collections import Counter, defaultdict

    rows = [
        (uid, i, float(ts), et) for i, (uid, ts, et) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, schema="user_id long, event_id long, ts double, event_type string"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    got = Counter(
        (r["prev_type"], r["event_type"])
        for r in df.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        ).collect()
        if r["prev_type"] is not None
    )
    chains = defaultdict(list)
    for uid, eid, ts, et in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        chains[uid].append(et)
    expect = Counter(
        (a, b) for chain in chains.values() for a, b in zip(chain, chain[1:])
    )
    assert got == expect


@given(
    w=st.integers(min_value=1, max_value=32),
    h=st.integers(min_value=1, max_value=16),
    seed=st.integers(min_value=0, max_value=255),
)
@settings(**SETTINGS)
def test_png_codec_round_trip_property(w, h, seed):
    """build_png → decode_png_gray is the identity on pixels for ANY
    (width, height, seed) — heights ≥5 exercise all five scanline
    filters; 1-pixel-wide images exercise the left=0 edge of Sub/
    Average/Paeth."""
    from mercurygate_spark.operators.multimodal import build_png, decode_png_gray

    dw, dh, pix = decode_png_gray(build_png(w, h, seed))
    assert (dw, dh) == (w, h)
    assert len(pix) == w * h
    for y in range(h):
        for x in range(w):
            assert pix[y * w + x] == (7 * x + 13 * y + seed) % 256


def _greedy_bpe_merge(tk: list[str], a: str, b: str) -> list[str]:
    """Reference greedy left-to-right BPE merge application."""
    out, i = [], 0
    while i < len(tk):
        if i + 1 < len(tk) and tk[i] == a and tk[i + 1] == b:
            out.append(f"{a}_{b}")
            i += 2
        else:
            out.append(tk[i])
            i += 1
    return out


@given(
    toks=st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=16),
    pair=st.sampled_from([("a", "b"), ("b", "a"), ("a", "c"), ("c", "b")]),
)
@settings(**SETTINGS)
def test_bpe_triple_replace_equals_greedy(toks, pair):
    """text_bpe_train applies a merge as a TRIPLE leftmost-no-rescan
    string replace over the space-joined corpus. For non-self pairs
    (the only kind the trainer selects) that must equal the greedy
    left-to-right merge — one pass can skip an occurrence whose
    leading delimiter the previous match consumed; three passes must
    recover all of them. Python str.replace shares the leftmost
    no-rescan semantics of JVM StringReplace and DuckDB replace, so
    this pins the algorithm all three engines run."""
    a, b = pair
    s = " " + " ".join(toks) + " "
    for _ in range(3):
        s = s.replace(f" {a} {b} ", f" {a}_{b} ")
    got = s.split()
    assert got == _greedy_bpe_merge(toks, a, b)


def test_bpe_spark_replace_matches_python(spark):
    """F.replace must share Python str.replace's leftmost-no-rescan
    semantics on the boundary-sharing sequences the property test
    exercises (runs of alternating pairs)."""
    cases = [
        ["a", "b", "a", "b", "a", "b", "a", "b"],
        ["a", "b", "a", "b", "a"],
        ["c", "a", "b", "b", "a", "b"],
        ["a", "a", "b", "b"],
        [],
        ["a"],
    ]
    df = spark.createDataFrame(
        [(i, " " + " ".join(t) + " ") for i, t in enumerate(cases)],
        schema="i long, s string",
    )
    col = F.col("s")
    for _ in range(3):
        col = F.replace(col, F.lit(" a b "), F.lit(" a_b "))
    rows = {r["i"]: r["out"] for r in df.select("i", col.alias("out")).collect()}
    for i, t in enumerate(cases):
        py = " " + " ".join(t) + " "
        for _ in range(3):
            py = py.replace(" a b ", " a_b ")
        assert rows[i] == py
        assert py.split() == _greedy_bpe_merge(t, "a", "b")


def test_unigram_viterbi_reconstructs_every_word(spark):
    """Unigram-tokenizer invariant: concatenating a word's Viterbi
    pieces reproduces the word exactly, every piece is in the vocab,
    and no piece exceeds UNI_MAX_PIECE — for every distinct word in
    the corpus (coverage: single chars are immortal, so the DP can
    never dead-end)."""
    from mercurygate_spark.queries.registry import load_tables
    from mercurygate_spark.queries.text import (
        UNI_MAX_PIECE,
        UNI_PEN,
        UNI_SEED_MIN,
        _uni_seed_vocab,
        _uni_viterbi,
        _uni_words,
    )

    docs = load_tables(spark, "/root/testdata/sf0.001", "documents")["documents"]
    words = _uni_words(docs)
    v1 = _uni_seed_vocab(words).where(
        (F.col("freq") >= UNI_SEED_MIN) | (F.length("piece") == 1)
    ).collect()
    cost = {r["piece"]: UNI_PEN - min(r["freq"], UNI_PEN - 1) for r in v1}
    rows = _uni_viterbi(words, cost).collect()
    assert rows
    for r in rows:
        pieces = r["seg"].split()
        assert "".join(pieces) == r["word"]
        for p in pieces:
            assert p in cost and 1 <= len(p) <= UNI_MAX_PIECE


def test_unigram_vocab_cap_guard_trips(spark, monkeypatch):
    """The unigram driver-collect cap is a RUNTIME guard, not a
    comment (operators/logreg.py 2^53 doctrine): shrink the assumed
    alphabet so the documented Σ alphabet^l cap falls below the real
    seed-vocab size, and the bounded collect must raise with the
    actionable message instead of silently collecting past the cap."""
    import pytest

    import mercurygate_spark.queries.text as text_mod
    from mercurygate_spark.queries import all_queries

    monkeypatch.setattr(text_mod, "UNI_ALPHABET_SIZE", 1)
    with pytest.raises(RuntimeError, match="driver-collect cap"):
        all_queries()["text_unigram_train"](
            spark, "/root/testdata/sf0.001"
        ).collect()


def test_unigram_vocab_cap_matches_doc():
    """The shipped constants still produce the documented ≈1.73M cap —
    if UNI_MAX_PIECE or UNI_ALPHABET_SIZE changes, the docstrings and
    SCALING.md numbers must move with it."""
    from mercurygate_spark.queries.text import _uni_vocab_cap

    assert _uni_vocab_cap() == 36 + 36**2 + 36**3 + 36**4 == 1_727_604


def _py_wordpiece(corpora: list[list[str]], merges: int) -> list[tuple]:
    """Pure-Python greedy WordPiece replay: unigram + adjacent-pair
    counts, winner by ((c * 1e9) // (u1*u2), c, w1 asc, w2 asc) with
    self-pairs excluded, merge applied left-to-right greedily."""
    from collections import Counter

    docs = [list(t) for t in corpora]
    out = []
    for step in range(1, merges + 1):
        uc: Counter = Counter()
        pc: Counter = Counter()
        for t in docs:
            uc.update(t)
            for i in range(len(t) - 1):
                if t[i] != t[i + 1]:
                    pc[(t[i], t[i + 1])] += 1
        if not pc:
            break
        best = max(
            pc.items(),
            key=lambda kv: (
                (kv[1] * 10**9) // (uc[kv[0][0]] * uc[kv[0][1]]),
                kv[1],
                # lexicographic ASC tie-break → invert for max()
                tuple(-b for b in kv[0][0].encode()) + (1,),
                tuple(-b for b in kv[0][1].encode()) + (1,),
            ),
        )
        (w1, w2), c = best
        sq = (c * 10**9) // (uc[w1] * uc[w2])
        out.append((step, w1, w2, f"{w1}_{w2}", c, sq))
        new_docs = []
        for t in docs:
            nt, i = [], 0
            while i < len(t):
                if i + 1 < len(t) and t[i] == w1 and t[i + 1] == w2:
                    nt.append(f"{w1}_{w2}")
                    i += 2
                else:
                    nt.append(t[i])
                    i += 1
            new_docs.append(nt)
        docs = new_docs
    return out


def test_wordpiece_spark_loop_matches_python_replay(spark):
    """text_wordpiece_train's distributed loop (vocab-join scoring,
    integer-quantized likelihood, triple-replace application) must
    reproduce the greedy single-machine reference exactly, merge by
    merge — including a case where the LIKELIHOOD winner differs from
    the COUNT (BPE) winner: 'x y' appears 3x but x,y are frequent
    elsewhere; 'p q' appears 2x and p,q appear nowhere else, so
    2e9/(2*2) > 3e9/(8*8) and WordPiece must pick (p,q) first."""
    from mercurygate_spark.queries.text import _wp_train_loop

    corpora = [
        ["x", "y", "x", "z", "y", "p", "q"],
        ["x", "y", "x", "w", "y", "p", "q"],
        ["x", "y", "x", "x", "y", "y", "z"],
        ["w", "z", "x", "y", "w", "x", "y"],
    ]
    # sanity of the scenario: (p,q) likelihood-wins despite lower count
    py = _py_wordpiece(corpora, 4)
    assert (py[0][1], py[0][2]) == ("p", "q"), py[0]

    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, " " + " ".join(t) + " ") for i, t in enumerate(corpora)],
        schema="doc_id long, s string",
    )
    _, got = _wp_train_loop(docs, 4)
    assert got == py, (got, py)
