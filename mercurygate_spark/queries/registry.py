"""Query registry: the single source of truth for the engine's query
surface (SURVEY.md §2c keys → implementations + DuckDB oracles)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def stabilize_rounding(sql: str) -> str:
    """Rewrite every ``round(expr, n)`` in an oracle to the
    cross-engine-stable ``floor(expr * 10^n + 0.5) / 10^n`` — the same
    expression the Spark side uses (functions.r2/r6), so half-boundary
    values round identically in both engines. Applied at registration;
    the rewritten SQL is what the driver receives."""
    out = []
    i = 0
    low = sql.lower()
    while True:
        j = low.find("round(", i)
        # require a non-identifier char before 'round' (word boundary)
        while j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            j = low.find("round(", j + 1)
        if j == -1:
            out.append(sql[i:])
            break
        out.append(sql[i:j])
        depth, k = 1, j + len("round(")
        start = k
        last_comma = -1
        while depth > 0:
            ch = sql[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 1:
                last_comma = k
            k += 1
        if last_comma == -1:
            out.append(sql[j:k])  # round(x) — leave as-is
        else:
            expr = stabilize_rounding(sql[start:last_comma])
            scale = int(sql[last_comma + 1 : k - 1].strip())
            out.append(f"floor(({expr}) * {10**scale} + 0.5) / {10**scale}")
        i = k
    return "".join(out)


def query(name: str, oracle: str | None = None):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under
    ``name`` with an optional DuckDB oracle twin."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        sql = stabilize_rounding(oracle) if oracle else oracle
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=sql, doc=fn.__doc__ or "")
        return fn

    return deco


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read the requested testdata parquet tables (TESTDATA.md layout).

    Plain ``spark.read.parquet`` — Catalyst handles column pruning and
    predicate pushdown from whatever the query selects/filters.

    Nanosecond-timestamp normalization: parquet TIMESTAMP(NANOS)
    columns (events.ts) may surface as long nanos (legacy
    ``nanosAsLong``), long micros (Spark 4.1.x), or an inferred
    timestamp; ``functions.normalize_event_ts`` disambiguates by
    magnitude and lands on the same µs truncation DuckDB's reader
    performs, so oracle comparisons agree on any Spark version.
    """
    from mercurygate_spark.functions import normalize_event_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # Driver may call queries() on an untuned session in a non-UTC zone;
    # date functions must agree with the UTC-naive oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out: dict[str, DataFrame] = {}
    for n in names:
        df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
        if n == "events":
            df = normalize_event_ts(df)
        out[n] = df
    return out
