"""Scalar/column helper functions (SURVEY.md §2c "Scalar functions").

All helpers build Column expressions from ``pyspark.sql.functions`` —
JVM-side, whole-stage-codegen friendly; no Python UDFs here. Each has
a deterministic cross-engine contract so a DuckDB oracle can reproduce
it bit-for-bit:

- timestamps are compared as epoch microseconds (``ts_us`` ==
  DuckDB ``epoch_us``) — avoids tz/precision ambiguity in hashing;
- derived date buckets are formatted strings (``month_bucket`` ==
  DuckDB ``strftime(date_trunc('month', x), '%Y-%m')``);
- derived doubles are rounded (``r2``/``r6``) on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference parity: the one explicit timestamp format in the reference
# (mm_bronze_silver.py:216) — reused by the conform layer and fn_to_timestamp.
REFERENCE_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def ts_us(c: Column | str) -> Column:
    """Timestamp → epoch microseconds (bigint). DuckDB twin: epoch_us(x)."""
    return F.unix_micros(F.col(c) if isinstance(c, str) else c)


def month_bucket(c: Column | str) -> Column:
    """Month bucket as 'YYYY-MM' string — the engine's version of the
    reference's year_month partition column (mm_source_to_bronze.py:149),
    string-typed for cross-engine hash stability.
    DuckDB twin: strftime(date_trunc('month', x), '%Y-%m')."""
    return F.date_format(F.col(c) if isinstance(c, str) else c, "yyyy-MM")


def _round_fixed(c: Column, scale: int) -> Column:
    """Cross-engine-stable rounding: floor(x*10^s + 0.5)/10^s.

    Spark's round() (BigDecimal HALF_UP over the double's shortest
    decimal repr) and DuckDB's round() (raw-double based) disagree on
    exact half-boundary values — which 2-dp money data hits
    systematically. This explicit IEEE expression evaluates
    bit-identically in both engines; the SQL twin is the same text
    (see sql_r2/sql_r6)."""
    k = 10**scale
    return F.floor(c * k + F.lit(0.5)) / k


def r2(c: Column) -> Column:
    """Round derived double to 2 dp (money). SQL twin: sql_r2."""
    return _round_fixed(c, 2)


def r4(c: Column) -> Column:
    """Round derived double to 4 dp (rates/slopes). SQL twin via
    registry.stabilize_rounding on round(x, 4)."""
    return _round_fixed(c, 4)


def r6(c: Column) -> Column:
    """Round derived double to 6 dp (ratios). SQL twin: sql_r6."""
    return _round_fixed(c, 6)


def sql_r2(expr: str) -> str:
    """DuckDB twin of r2 — embed in oracle SQL strings."""
    return f"floor(({expr}) * 100 + 0.5) / 100"


def sql_r6(expr: str) -> str:
    """DuckDB twin of r6 — embed in oracle SQL strings."""
    return f"floor(({expr}) * 1000000 + 0.5) / 1000000"


def norm_text(c: Column | str) -> Column:
    """Normalize free text: lowercase, collapse whitespace, trim.
    DuckDB twin: trim(regexp_replace(lower(x), '\\s+', ' ', 'g'))."""
    col = F.col(c) if isinstance(c, str) else c
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(c: Column | str) -> Column:
    """Tokenize to lowercase alnum tokens, empty strings dropped.
    DuckDB twin:
    list_filter(regexp_split_to_array(lower(x), '[^a-z0-9]+'), t -> t <> '')."""
    col = F.col(c) if isinstance(c, str) else c
    return F.filter(F.split(F.lower(col), "[^a-z0-9]+"), lambda t: t != "")


def md5_hex(c: Column) -> Column:
    """md5 hex digest of a string column (cross-engine stable hash —
    unlike F.hash/xxhash64 which are Spark-specific murmur/xxh)."""
    return F.md5(c.cast("string"))


def let1(expr: Column, body) -> Column:
    """Evaluate `expr` exactly once per row by binding it as a
    higher-order-function lambda variable: transform(array(expr),
    x -> body(x))[0].

    Why: Catalyst's filter pushdown (PushPredicateThroughNonJoin)
    substitutes project aliases into predicates with no cost guard, so
    a filter referencing an expensive derived column (e.g. a regex
    token split) re-evaluates the full expression at every reference —
    and when the reference sits inside an array lambda, once per
    element. Binding through a lambda variable is opaque to alias
    substitution and stays pure whole-stage codegen (no UDF), so the
    expression is computed once regardless of how the plan collapses.
    """
    return F.transform(F.array(expr), body).getItem(0)


def trigram_array(tk: Column) -> Column:
    """Word-trigram array ("a b c") from a token-array column. Empty
    when fewer than 3 tokens. DuckDB twin:
    CASE WHEN len(tk) >= 3 THEN list_transform(range(1, len(tk) - 1),
    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) ELSE [] END.

    NULL semantics match the twin's ``||`` exactly: ``F.concat``
    propagates a NULL element to a NULL trigram (``concat_ws`` would
    silently skip it and diverge from the oracle if this helper were
    ever fed a nullable token array — tokens() can't produce NULL
    elements, but don't rely on that here)."""
    return F.when(
        F.size(tk) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(tk) - 3),
            lambda i: F.concat(
                tk[i], F.lit(" "), tk[i + 1], F.lit(" "), tk[i + 2]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


# events.ts epoch magnitude guard: 2024-era nanos ≈ 1.7e18, micros ≈
# 1.7e15. Spark's parquet contract for TIMESTAMP(NANOS) under an
# explicit LongType schema has drifted across versions (raw nanos under
# legacy nanosAsLong vs micros under 4.1.x), so normalize by magnitude,
# never by assumed unit. 4e17 µs ≈ year 14646; 4e17 ns ≈ 1982-09 — no
# real event timestamp sits on the wrong side.
_NANOS_THRESHOLD = 4 * 10**17


def epoch_long_to_ts(colname: str) -> Column:
    """Long epoch column (nanos OR micros, disambiguated by magnitude)
    → timestamp. Integer `div` (not float /) keeps full precision at
    1e18 scale; DuckDB twin: its native ns→µs truncating reader."""
    c = F.col(colname)
    micros = F.when(
        c > F.lit(_NANOS_THRESHOLD), F.expr(f"`{colname}` div 1000")
    ).otherwise(c)
    return F.timestamp_micros(micros)


def normalize_event_ts(df, colname: str = "ts"):
    """Normalize an event-time column to TimestampType regardless of
    how the reader surfaced it: long nanos (legacy nanosAsLong), long
    micros (Spark 4.1.x explicit-schema), or an already-converted
    timestamp (inferred read). The single choke point shared by the
    batch loader (queries/registry.py) and the streaming reader
    (streaming/windows.py) so the two paths cannot drift apart."""
    from pyspark.sql.types import LongType

    if isinstance(df.schema[colname].dataType, LongType):
        return df.withColumn(colname, epoch_long_to_ts(colname))
    return df


def md5_long(c: Column) -> Column:
    """First 60 bits of md5 as a non-negative bigint. Cross-engine
    deterministic base hash for minhash/simhash/LSH, where Spark's
    native hash() would not match any oracle.
    DuckDB twin: ('0x' || substr(md5(x), 1, 15))::BIGINT."""
    return F.conv(F.substring(md5_hex(c), 1, 15), 16, 10).cast("long")
