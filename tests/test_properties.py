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
