"""Scalar functions (SURVEY.md §2c "Scalar functions").

Covers: fn_date_trunc_month (P2), fn_to_timestamp (P3), fn_date_arith,
fn_string_ops, fn_math_round, fn_null_handling, fn_array_map_json.
All stay inside whole-stage codegen — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mercurygate_spark.functions import REFERENCE_TS_FMT, month_bucket, r2, r6, ts_us
from mercurygate_spark.queries.registry import load_tables, query


@query(
    "fn_date_trunc_month",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS year_month,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY 1
    """,
)
def fn_date_trunc_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month bucketing — the reference's year_month derivation
    (P2, mm_source_to_bronze.py:149) used as a KPI group key."""
    t = load_tables(spark, sf_dir, "orders")
    return (
        t["orders"]
        .groupBy(month_bucket("o_orderdate").alias("year_month"))
        .agg(F.count("*").alias("n_orders"), r2(F.sum("o_totalprice")).alias("revenue"))
    )


@query(
    "fn_to_timestamp",
    oracle="""
    SELECT event_id,
           epoch_us(strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S')) AS parsed_us
    FROM events
    """,
)
def fn_to_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String→timestamp with the reference's exact format
    (P3, mm_bronze_silver.py:216 'yyyy-MM-dd HH:mm:ss'): format each
    event ts to that string, parse it back, return epoch micros of the
    (second-truncated) result. Proves format-pinned round-tripping."""
    t = load_tables(spark, sf_dir, "events")
    return t["events"].select(
        "event_id",
        ts_us(
            F.to_timestamp(F.date_format("ts", REFERENCE_TS_FMT), REFERENCE_TS_FMT)
        ).alias("parsed_us"),
    )


@query(
    "fn_date_arith",
    oracle="""
    SELECT o_orderpriority,
           year(o_orderdate) AS order_year,
           count(*) AS n_items,
           round(avg(date_diff('day', o_orderdate, l_shipdate)), 2) AS avg_ship_days,
           max(date_diff('day', o_orderdate, l_shipdate)) AS max_ship_days
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority, year(o_orderdate)
    """,
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: order→ship latency in days (the claim-cycle-time
    KPI over the reference's date_* chains, mm_bronze_silver.py:63-83)
    + year extraction."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    j = t["orders"].join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
    lat = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return j.groupBy(
        "o_orderpriority", F.year("o_orderdate").alias("order_year")
    ).agg(
        F.count("*").alias("n_items"),
        r2(F.avg(lat)).alias("avg_ship_days"),
        F.max(lat).alias("max_ship_days"),
    )


@query(
    "fn_string_ops",
    oracle="""
    SELECT c_custkey,
           upper(c_mktsegment) AS seg_upper,
           lower(c_name) AS name_lower,
           trim(concat(c_name, ' ')) AS name_trimmed,
           substr(c_name, 1, 8) AS name_prefix,
           CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
           length(c_name) AS name_len,
           concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation
    FROM customer
    """,
)
def fn_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper/lower/trim/substr/regexp_extract/length/
    concat_ws over the party-name columns (the code/address cols of the
    reference, mm_bronze_silver.py:10-86)."""
    t = load_tables(spark, sf_dir, "customer")
    return t["customer"].select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.trim(F.concat(F.col("c_name"), F.lit(" "))).alias("name_trimmed"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).cast("long").alias("name_num"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("|", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
    )


@query(
    "fn_math_round",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 2) AS net_price,
           abs(l_quantity - 25) AS qty_dev,
           CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_kilo_ceil,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_kilo_floor,
           round(sqrt(l_quantity), 6) AS qty_sqrt
    FROM lineitem
    """,
)
def fn_math_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/abs/ceil/floor/sqrt on amounts
    (mm_bronze_silver.py:56-62 money columns). ceil/floor cast to
    BIGINT on both sides (Spark returns LONG, DuckDB DOUBLE)."""
    t = load_tables(spark, sf_dir, "lineitem")
    return t["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        r2(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("long").alias("price_kilo_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_kilo_floor"),
        r6(F.sqrt("l_quantity")).alias("qty_sqrt"),
    )


@query(
    "fn_null_handling",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN nullif(o_orderpriority, '5-LOW') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           round(sum(coalesce(nullif(o_totalprice, 0), 0)), 2) AS sum_total,
           count(nullif(o_orderpriority, '5-LOW')) AS n_not_low
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def fn_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL family: nullif/coalesce/null-skipping count — the engine's
    treatment of the reference's sparse date_* columns (most claim
    dates are null until their lifecycle step happens)."""
    t = load_tables(spark, sf_dir, "orders")
    low_nulled = F.nullif(F.col("o_orderpriority"), F.lit("5-LOW"))
    return t["orders"].groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(low_nulled.isNull().cast("long")).alias("n_low"),
        r2(F.sum(F.coalesce(F.nullif(F.col("o_totalprice"), F.lit(0.0)), F.lit(0.0)))).alias(
            "sum_total"
        ),
        F.count(low_nulled).alias("n_not_low"),
    )


@query(
    "fn_array_map_json",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types
    FROM events
    GROUP BY user_id
    """,
)
def fn_array_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/JSON family: JSON field extraction from the events props
    payload + collected-distinct-sorted array rendered as a string
    (deterministic; raw collect_list order is engine-dependent).
    Gap-fill for the reference's flat-scalar model (SURVEY.md §1.2)."""
    t = load_tables(spark, sf_dir, "events")
    return t["events"].groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("event_types"),
    )


@query(
    "fn_regexp_family",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '^([a-z]+)', 1) AS first_word,
           len(regexp_extract_all(text, '[aeiou]+')) AS n_vowel_runs,
           regexp_matches(text, '[0-9]') AS has_digit,
           regexp_replace(text, '[aeiou]', '_', 'g')[1:20] AS censored_prefix
    FROM documents
    """,
)
def fn_regexp_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp family: capture-group extract, match counting
    (regexp_extract_all), boolean match (rlike), global replace — the
    string-mangling surface every log/text pipeline leans on. All four
    compile to JVM codegen regex ops (single pass per doc, no shuffle);
    both engines use non-backtracking-compatible patterns so semantics
    agree."""
    t = load_tables(spark, sf_dir, "documents")
    return t["documents"].select(
        "doc_id",
        F.regexp_extract("text", r"^([a-z]+)", 1).alias("first_word"),
        F.size(F.expr("regexp_extract_all(text, '[aeiou]+', 0)")).alias("n_vowel_runs"),
        F.col("text").rlike("[0-9]").alias("has_digit"),
        F.substring(F.regexp_replace("text", "[aeiou]", "_"), 1, 20).alias(
            "censored_prefix"
        ),
    )


@query(
    "fn_bitwise_ops",
    oracle="""
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id | 4096 AS with_flag,
           xor(event_id, user_id) AS xored,
           event_id << 2 AS shifted_l,
           event_id >> 3 AS shifted_r,
           bit_count(event_id) AS pop_count
    FROM events
    """,
)
def fn_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shifts/popcount over the id columns —
    the primitives flag-packing and hash-partitioning schemes lean on.
    All codegen scalar expressions (DuckDB's bit_count returns the same
    BIGINT popcount Spark's bit_count does on BIGINT inputs)."""
    t = load_tables(spark, sf_dir, "events")
    e = t["events"]
    return e.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("xored"),
        F.shiftleft(F.col("event_id"), 2).alias("shifted_l"),
        F.shiftright(F.col("event_id"), 3).alias("shifted_r"),
        F.bit_count("event_id").cast("long").alias("pop_count"),
    )


@query(
    "fn_calendar_ops",
    oracle="""
    SELECT o_orderkey,
           quarter(o_orderdate) AS order_quarter,
           weekofyear(o_orderdate) AS iso_week,
           dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
    FROM orders
    """,
)
def fn_calendar_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar family: quarter, ISO week, day-of-week, month-clamped
    add_months, last_day. Cross-engine contracts handled explicitly:
    DuckDB dayofweek is 0=Sunday vs Spark 1=Sunday (+1 in the oracle);
    date outputs rendered as strings so no date-type hash ambiguity;
    both engines clamp Jan 31 + 1 month to Feb end."""
    t = load_tables(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return t["orders"].select(
        "o_orderkey",
        F.quarter(d).alias("order_quarter"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofweek(d).alias("dow"),
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus_3m"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
    )


@query(
    "sql_correlated_subquery",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, round(o.o_totalprice, 2) AS top_price
    FROM orders o
    WHERE o.o_totalprice = (
      SELECT max(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL front door: each
    customer's maximum-price order(s). Catalyst DECORRELATES this into
    an aggregate + join (no per-row re-execution — the plan is the
    same one the DataFrame API would build), which is what makes the
    construct usable at 100 TB. max, not avg, keeps the comparison
    exact (no accumulation-order boundary flips)."""
    t = load_tables(spark, sf_dir, "orders")
    t["orders"].createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey,
               floor(o.o_totalprice * 100 + 0.5) / 100 AS top_price
        FROM orders o
        WHERE o.o_totalprice = (
          SELECT max(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


_TK_SQL = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"


@query(
    "fn_higher_order_array",
    oracle=f"""
    SELECT doc_id,
           len({_TK_SQL}) AS n_tokens,
           len(list_filter({_TK_SQL}, t -> len(t) > 4)) AS n_long_tokens,
           CAST(coalesce(list_sum(list_transform({_TK_SQL}, t -> len(t))), 0) AS BIGINT)
             AS total_token_chars,
           list_max({_TK_SQL}) AS max_token
    FROM documents
    """,
)
def fn_higher_order_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as a user surface (transform /
    filter / aggregate — the same primitives the engine's dot products
    and shingles are built from): per-document token-length stats
    computed entirely inside the array, no explode, no shuffle. At
    100 TB explode-then-aggregate for per-row array stats is a 100×
    row amplification; the lambda forms stay one-row-in one-row-out."""
    from mercurygate_spark.functions import tokens

    t = load_tables(spark, sf_dir, "documents")
    d = t["documents"].withColumn("__tk", tokens("text"))
    return d.select(
        "doc_id",
        F.size("__tk").alias("n_tokens"),
        F.size(F.filter("__tk", lambda x: F.length(x) > 4)).alias("n_long_tokens"),
        F.aggregate(
            F.transform("__tk", lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_token_chars"),
        F.array_max("__tk").alias("max_token"),
    )


@query(
    "fn_try_cast",
    oracle="""
    SELECT o_orderkey,
           TRY_CAST(o_orderpriority AS BIGINT) AS bad_long,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS priority_rank,
           TRY_CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) IS NOT NULL AS date_ok,
           TRY_CAST(o_orderstatus AS DOUBLE) AS bad_double
    FROM orders
    """,
)
def fn_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casting (try_cast): unparseable values become NULL
    instead of failing the job — non-negotiable at 100 TB, where a
    single dirty row must not kill a 1000-executor stage (ANSI mode's
    hard-error cast is the alternative failure mode). '1-URGENT' as a
    whole fails to parse, its leading digit succeeds; both engines
    agree on every case."""
    t = load_tables(spark, sf_dir, "orders")
    return t["orders"].select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("long").alias("bad_long"),
        F.substring("o_orderpriority", 1, 1).try_cast("long").alias("priority_rank"),
        F.date_format("o_orderdate", "yyyy-MM-dd").try_cast("date").isNotNull().alias(
            "date_ok"
        ),
        F.col("o_orderstatus").try_cast("double").alias("bad_double"),
    )


@query(
    "fn_hash_family",
    oracle="""
    SELECT p_partkey,
           md5(p_name) AS name_md5,
           sha256(p_name || '|' || p_brand) AS row_sha256,
           length(md5(p_name)) AS md5_len
    FROM part
    """,
)
def fn_hash_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic-hash family (md5 / sha2-256) — the primitive under
    content-addressed dedup, stable sampling and fingerprinting
    (queries/dedup.py, queries/sampling.py all key on these). Pure
    codegen column expressions: one scan, zero shuffle; at 100 TB the
    hash rides the existing scan for free. Both engines emit lowercase
    hex so the parity is byte-exact."""
    t = load_tables(spark, sf_dir, "part")
    return t["part"].select(
        "p_partkey",
        F.md5(F.col("p_name").cast("binary")).alias("name_md5"),
        F.sha2(F.concat_ws("|", "p_name", "p_brand"), 256).alias("row_sha256"),
        F.length(F.md5(F.col("p_name").cast("binary"))).alias("md5_len"),
    )


@query(
    "fn_url_parse",
    oracle="""
    SELECT doc_id,
           source || '.example.com' AS host,
           '/docs/' || CAST(doc_id AS VARCHAR) AS path,
           lang AS q_lang
    FROM documents
    """,
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition via Spark's parse_url (HOST / PATH / keyed
    QUERY param) over a synthesized-from-columns URL. The oracle builds
    the expected parts from the raw columns independently, so parse_url
    semantics (not string concat) are what's under test. Codegen-only
    — crawl-scale URL normalization with no Python in the path."""
    t = load_tables(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return t["documents"].select(
        "doc_id",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
    )


@query(
    "fn_map_ops",
    oracle="""
    SELECT user_id,
           CAST(count(DISTINCT event_type) AS INT) AS n_types,
           CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS n_clicks,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS type_keys
    FROM events GROUP BY user_id
    """,
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column ops: per-user event_type→count built as a real
    MapType via map_from_entries(collect_list(struct)), then read back
    through element_at / map_keys / size. The oracle derives the same
    facts WITHOUT a map (conditional count, distinct count, sorted key
    list), so Spark's map semantics — not shared SQL — are under test.
    Maps stay executor-side; only scalars leave the operator."""
    t = load_tables(spark, sf_dir, "events")
    counts = t["events"].groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    mapped = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "c")))
        ).alias("m")
    )
    return mapped.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.coalesce(F.element_at("m", F.lit("click")), F.lit(0)).alias("n_clicks"),
        F.array_join(F.array_sort(F.map_keys("m")), ",").alias("type_keys"),
    )


@query(
    "fn_aes_roundtrip",
    oracle="""
    SELECT p_partkey,
           p_name AS decrypted,
           length(p_name) + 28 AS cipher_len,
           true AS roundtrip_ok
    FROM part
    """,
)
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption round-trip: aes_encrypt (GCM, random IV
    — ciphertext is nondeterministic BY DESIGN, so the oracle pins the
    deterministic facts: decrypt∘encrypt is identity and GCM output is
    plaintext + 12-byte IV + 16-byte tag). The at-rest protection
    pattern for PII columns that must stay joinable after decrypt."""
    t = load_tables(spark, sf_dir, "part")
    enc = F.expr("aes_encrypt(p_name, '0123456789abcdef')")  # AES-128 key
    return t["part"].select(
        "p_partkey",
        F.expr(
            "cast(aes_decrypt(aes_encrypt(p_name, '0123456789abcdef'),"
            " '0123456789abcdef') as string)"
        ).alias("decrypted"),
        F.length(enc).cast("long").alias("cipher_len"),
        (
            F.expr(
                "cast(aes_decrypt(aes_encrypt(p_name, '0123456789abcdef'),"
                " '0123456789abcdef') as string)"
            )
            == F.col("p_name")
        ).alias("roundtrip_ok"),
    )


@query(
    "fn_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(
             json_object('u', user_id, 't', event_type), '$.u') AS BIGINT) AS u,
           json_extract_string(
             json_object('u', user_id, 't', event_type), '$.t') AS t
    FROM events
    """,
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT type (Spark 4): ingest the raw JSON
    props payload with parse_json and read typed paths back out with
    variant_get — the schema-on-read path for payloads too ragged for
    a fixed struct, stored binary-encoded (no re-parse per access,
    unlike get_json_object). A second variant is BUILT from columns
    via to_json∘struct then round-tripped, so encode and decode are
    both pinned. The oracle replays both through DuckDB's JSON
    functions."""
    t = load_tables(spark, sf_dir, "events")
    built = F.parse_json(F.to_json(F.struct(F.col("user_id").alias("u"), F.col("event_type").alias("t"))))
    return t["events"].select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
        F.try_variant_get(built, "$.u", "bigint").alias("u"),
        F.try_variant_get(built, "$.t", "string").alias("t"),
    )


@query(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_totalprice >= 200000.0 AND o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (spark.sql(..., args={...})): values bind
    as literals at parse time — injection-proof templating for the SQL
    front door (string-concat SQL is the reference's style and the
    anti-pattern). The bound plan is identical to the inlined one, so
    pushdown still reaches the scan."""
    t = load_tables(spark, sf_dir, "orders")
    t["orders"].createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_orders,
               floor(sum(o_totalprice) * 100 + 0.5) / 100 AS revenue
        FROM orders
        WHERE o_totalprice >= :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"min_price": 200000.0, "status": "F"},
    )


@query(
    "sql_lateral_subquery",
    oracle="""
    SELECT c.c_mktsegment, t.o_orderkey, round(t.o_totalprice, 2) AS o_totalprice
    FROM (SELECT DISTINCT c_mktsegment FROM customer) c,
         LATERAL (
           SELECT o.o_orderkey, o.o_totalprice
           FROM orders o JOIN customer c2 ON o.o_custkey = c2.c_custkey
           WHERE c2.c_mktsegment = c.c_mktsegment
           ORDER BY o.o_totalprice DESC, o.o_orderkey
           LIMIT 3
         ) t
    """,
)
def sql_lateral_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery join: top-3 orders PER segment,
    written as 'for each segment row, run this ordered-limit query'.
    Catalyst decorrelates it into a rank-window over the join (one
    shuffle) rather than re-running the subquery per driving row —
    the same plan family as window_rank_topn_per_group, reached from
    SQL. Unique tie-break (o_orderkey) pins the qualifying set."""
    t = load_tables(spark, sf_dir, "orders", "customer")
    t["orders"].createOrReplaceTempView("orders")
    t["customer"].createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c.c_mktsegment, t.o_orderkey,
               floor(t.o_totalprice * 100 + 0.5) / 100 AS o_totalprice
        FROM (SELECT DISTINCT c_mktsegment FROM customer) c,
             LATERAL (
               SELECT o.o_orderkey, o.o_totalprice
               FROM orders o JOIN customer c2 ON o.o_custkey = c2.c_custkey
               WHERE c2.c_mktsegment = c.c_mktsegment
               ORDER BY o.o_totalprice DESC, o.o_orderkey
               LIMIT 3
             ) t
        """
    )


@query(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(avg(l_quantity), 4) AS avg_qty
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    HAVING count(*) > 10
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4 `|>` operators): the TPC-H Q1 pricing
    summary written as a linear dataflow — FROM |> WHERE |> EXTEND |>
    AGGREGATE |> WHERE — instead of inside-out nested SELECT. Each
    pipe stage is sugar over the same logical operators, so Catalyst
    produces the identical pushed-filter + partial/final hash-agg plan
    as the ANSI oracle form; the value-hash pins that equivalence."""
    t = load_tables(spark, sf_dir, "lineitem")
    t["lineitem"].createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |> EXTEND l_extendedprice * (1 - l_discount) AS disc_price
        |> AGGREGATE count(*) AS n_items,
                     floor(sum(disc_price) * 100 + 0.5) / 100 AS revenue,
                     floor(avg(l_quantity) * 10000 + 0.5) / 10000 AS avg_qty
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n_items > 10
        |> SELECT l_returnflag, l_linestatus, n_items, revenue, avg_qty
        """
    )


@query(
    "fn_collation",
    oracle="""
    WITH w AS (
      SELECT CASE WHEN p_partkey % 2 = 0
                  THEN upper(split_part(p_name, ' ', 1))
                  ELSE split_part(p_name, ' ', 1) END AS raw_word
      FROM part
    )
    SELECT lower(raw_word) AS word,
           count(*) AS n_parts,
           count(DISTINCT raw_word) AS n_case_variants
    FROM w GROUP BY 1
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collation (Spark 4 COLLATE): group case-insensitively by
    declaring the column UTF8_LCASE instead of wrapping every
    comparison in lower() — the collation travels with the type, so
    every downstream equality/group/join on the column inherits it.
    Case variation is injected deterministically (even part keys
    upper-cased), the group key is the COLLATED column, and
    n_case_variants counts the raw binary-distinct spellings merged
    into each group (2 wherever both parities occur). Output surfaces
    lower(word) rather than Spark's nondeterministic per-group
    representative. Oracle replays with explicit lower() grouping —
    pinning that collation is semantics, not a new algorithm."""
    t = load_tables(spark, sf_dir, "part")
    words = t["part"].select(
        F.when(
            F.col("p_partkey") % 2 == 0,
            F.upper(F.split(F.col("p_name"), " ").getItem(0)),
        )
        .otherwise(F.split(F.col("p_name"), " ").getItem(0))
        .alias("raw_word")
    )
    grouped = words.groupBy(
        F.collate(F.col("raw_word"), "UTF8_LCASE").alias("word_ci")
    ).agg(
        F.count("*").alias("n_parts"),
        F.countDistinct("raw_word").alias("n_case_variants"),
    )
    return grouped.select(
        F.lower(F.col("word_ci")).cast("string").alias("word"),
        "n_parts",
        "n_case_variants",
    )


@query(
    "fn_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / nullif(l_quantity - 25.0, 0) AS price_per_excess,
           CASE WHEN l_partkey = 0 THEN 0
                WHEN l_partkey = 1 THEN 9223372036854775807 END AS big_product,
           l_extendedprice / nullif(l_discount, 0) AS per_discount_unit
    FROM lineitem
    """,
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic (try_divide / try_multiply) — the
    expression-level companion to fn_try_cast: divide-by-zero and
    bigint overflow become NULL instead of an ANSI runtime error, so
    one degenerate row cannot kill a 1000-executor stage. try_divide
    NULLs exactly where the oracle's nullif-guarded division does;
    try_multiply(l_partkey, BIGINT_MAX) overflows (→NULL) for every
    partkey except the non-overflowing 0 and 1 — the oracle replays
    both cases analytically.
    Division on bit-identical parquet doubles is IEEE-deterministic,
    so no rounding is needed."""
    t = load_tables(spark, sf_dir, "lineitem")
    li = t["lineitem"]
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 25.0).alias(
            "price_per_excess"
        ),
        F.try_multiply(
            F.col("l_partkey"), F.lit(9223372036854775807).cast("long")
        ).alias("big_product"),
        F.try_divide(F.col("l_extendedprice"), F.col("l_discount")).alias(
            "per_discount_unit"
        ),
    )


@query(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE d AS (
      SELECT c_custkey AS k, 0 AS depth
      FROM customer WHERE c_custkey <= 6
      UNION ALL
      SELECT c.c_custkey, d.depth + 1
      FROM customer c JOIN d ON c.c_custkey // 7 = d.k
      WHERE c.c_custkey > 6
    )
    SELECT depth,
           count(*) AS n_nodes,
           min(k) AS min_key,
           max(k) AS max_key
    FROM d GROUP BY depth
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): walk a synthetic
    org-chart where customer k reports to k div 7 (roots k<=6), and
    count nodes per depth. The fixpoint loop runs INSIDE Catalyst —
    each recursion step is a planned join against the prior frontier,
    the same iterate-join-frontier shape graph_pagerank builds by hand
    in the DataFrame API (there with per-round localCheckpoint; the
    CTE engine bounds recursion with
    spark.sql.cte.recursion.level.limit instead, default 100 — depth
    here is log7(|customers|) ~ 5 at sf0.1). Every edge derives from
    c_custkey arithmetic, so DuckDB replays the identical recursion.

    Integer division: Spark SQL's `//`-free dialect uses DIV; the
    engine-side SQL says `div` while the oracle says `//` — same
    floor-division on positive keys."""
    t = load_tables(spark, sf_dir, "customer")
    t["customer"].createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH RECURSIVE d AS (
          SELECT c_custkey AS k, 0 AS depth
          FROM customer WHERE c_custkey <= 6
          UNION ALL
          SELECT c.c_custkey, d.depth + 1
          FROM customer c JOIN d ON c.c_custkey div 7 = d.k
          WHERE c.c_custkey > 6
        )
        SELECT depth,
               count(*) AS n_nodes,
               min(k) AS min_key,
               max(k) AS max_key
        FROM d GROUP BY depth
        """
    )


GEOHASH_ALPHA = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_sql_parts() -> tuple[str, str, str]:
    """(xi, yi, code) SQL expressions shared VERBATIM by the Spark
    side (F.expr) and the DuckDB oracle — one formula text, two
    engines, so the bit arithmetic cannot drift. Integer-only: grid
    cells come from (v * 32768) div 1000, never a float divide, so no
    floor-boundary ulp risk exists anywhere."""
    xi = "((event_id * 37) % 1000)"
    yi = "(((user_id * 91) + event_id) % 1000)"
    gx = f"(({xi} * 32768) div 1000)"
    gy = f"(({yi} * 32768) div 1000)"
    code = " + ".join(
        f"((({gx} >> {i}) & 1) << {2 * i + 1}) + ((({gy} >> {i}) & 1) << {2 * i})"
        for i in range(15)
    )
    return xi, yi, f"({code})"


@query(
    "fn_geohash",
    oracle=f"""
    WITH c AS (
      SELECT event_id,
             {_geohash_sql_parts()[2].replace(' div ', ' // ')} AS code
      FROM events
    )
    SELECT event_id, code,
           {" || ".join(
               f"substr('{GEOHASH_ALPHA}', CAST((code >> {25 - 5 * i}) & 31 AS INT) + 1, 1)"
               for i in range(6)
           )} AS geohash6
    FROM c
    """,
)
def fn_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash encoding — the textual space-filling-curve index (the
    base32 cousin of sink_zorder_morton's Morton code): interleave
    the longitude/latitude grid bits (lon first, per the geohash
    spec) into a 30-bit code and read it out 5 bits at a time through
    the geohash alphabet. A 6-char hash names a ~±0.6 km cell, and
    PREFIX equality = spatial proximity — so geo joins become string
    prefix equi-joins and LIKE 'u09%' prunes on ordinary string
    statistics. Coordinates derive from events columns via
    INTEGER-ONLY grid math ((v·2¹⁵) div 1000 — no float divide, no
    floor-boundary risk), and the bit-interleave formula is ONE
    generated SQL text evaluated by both engines, so the oracle pins
    the exact bit layout, not a reimplementation of it."""
    t = load_tables(spark, sf_dir, "events")
    _, _, code_sql = _geohash_sql_parts()
    chars = [
        f"substr('{GEOHASH_ALPHA}', CAST((code >> {25 - 5 * i}) & 31 AS INT) + 1, 1)"
        for i in range(6)
    ]
    return (
        t["events"]
        .select("event_id", "user_id")
        .withColumn("code", F.expr(code_sql))
        .select(
            "event_id",
            "code",
            F.expr(" || ".join(chars)).alias("geohash6"),
        )
    )
