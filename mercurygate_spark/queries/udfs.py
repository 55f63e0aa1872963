"""Explicit UDF surface (SURVEY.md §2c 'UDF/UDAF/UDTF'): the
Arrow-vectorized scalar pandas_udf pattern, oracle-checked.

Row-at-a-time Python UDFs are deliberately absent from the engine —
every Python crossing is Arrow-batched (this scalar pandas_udf, the
mapInPandas extractors in operators.multimodal/dedup, the cogrouped
applyInPandas in operators.asof, the stateful applyInPandasWithState
in streaming.windows).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves stringified type hints here
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mercurygate_spark.queries.registry import load_tables, query


def make_token_count_udf():
    """Vectorized token counter (python-regex twin of the pure-Column
    functions.tokens — same class, same empty filtering). Built
    lazily: pandas_udf schema parsing needs an active session."""
    import re

    from pyspark.sql.functions import pandas_udf

    pat = re.compile(r"[^a-z0-9]+")

    @pandas_udf("long")
    def token_count_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: sum(1 for x in pat.split(t.lower()) if x))

    return token_count_udf


@query(
    "udtf_python_table",
    oracle="""
    SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                              t -> t <> '')) AS token
    FROM documents
    WHERE doc_id < 20
    """,
)
def udtf_python_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, Spark 4): one input row → many
    output rows, lateral-joined — the tokenizer as a table function.
    Arrow-less but row-bounded here (20 docs); the set-returning shape
    the reference's flat model never had."""
    import re

    from pyspark.sql.functions import udtf

    pat = re.compile(r"[^a-z0-9]+")

    @udtf(returnType="token: string")
    class Tokenize:
        def eval(self, text: str):
            for t in pat.split(text.lower()):
                if t:
                    yield (t,)

    spark.udtf.register("tokenize_udtf", Tokenize)
    t = load_tables(spark, sf_dir, "documents")
    t["documents"].where(F.col("doc_id") < 20).createOrReplaceTempView("docs_udtf_v")
    return spark.sql(
        "SELECT d.doc_id, tok.token "
        "FROM docs_udtf_v d, LATERAL tokenize_udtf(d.text) tok"
    )


@query(
    "udaf_pandas_geomean",
    oracle="""
    SELECT l_returnflag,
           round(exp(avg(ln(l_extendedprice))), 6) AS geomean_price,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udaf_pandas_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate (UDAF) via grouped applyInPandas with one-row
    output per group: geometric mean of prices. numpy log/exp vs
    DuckDB ln/exp differ by ≤1 ulp — absorbed by the 6-dp rounding."""
    import numpy as np
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("l_returnflag", StringType()),
            StructField("geomean_price", DoubleType()),
            StructField("n_rows", LongType()),
        ]
    )

    def geomean(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["l_extendedprice"].to_numpy(dtype=np.float64)
        g = float(np.exp(np.log(x).mean()))
        g = np.floor(g * 1_000_000 + 0.5) / 1_000_000
        return pd.DataFrame(
            {"l_returnflag": [pdf["l_returnflag"].iloc[0]], "geomean_price": [g],
             "n_rows": [len(x)]}
        )

    t = load_tables(spark, sf_dir, "lineitem")
    return (
        t["lineitem"].select("l_returnflag", "l_extendedprice")
        .groupBy("l_returnflag")
        .applyInPandas(geomean, schema)
    )


@query(
    "udf_python_scalar",
    oracle="""
    SELECT doc_id,
           len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           t -> t <> '')) AS n_tokens_udf,
           n_chars
    FROM documents
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf over documents: Arrow batches in, one
    vectorized pass per batch — the sanctioned shape for logic that
    genuinely needs Python (tokenizers, model featurizers)."""
    t = load_tables(spark, sf_dir, "documents")
    return t["documents"].select(
        "doc_id",
        make_token_count_udf()(F.col("text")).alias("n_tokens_udf"),
        "n_chars",
    )


@query(
    "udf_arrow_batches",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           length(text) AS n_chars,
           upper(substr(lang, 1, 2)) AS lang_uc
    FROM documents
    """,
)
def udf_arrow_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the zero-copy batch path — the function receives raw
    pyarrow.RecordBatch objects (no pandas materialization at all) and
    answers with RecordBatches built from pyarrow.compute kernels.
    One tier below mapInPandas: for pure columnar transforms this
    skips the Arrow→pandas→Arrow round-trip entirely, which is the
    difference that matters when the batch is mostly large binary/text
    payloads. The oracle replays the same byte/char/case facts in
    SQL."""
    import pyarrow as pa
    import pyarrow.compute as pc

    t = load_tables(spark, sf_dir, "documents")

    def arrow_meta(batches):
        for batch in batches:
            text = batch.column(batch.schema.get_field_index("text"))
            lang = batch.column(batch.schema.get_field_index("lang"))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("doc_id")),
                    pc.binary_length(pc.cast(text, pa.binary())).cast(pa.int64()),
                    pc.utf8_length(text).cast(pa.int64()),
                    pc.utf8_upper(pc.utf8_slice_codeunits(lang, 0, 2)),
                ],
                names=["doc_id", "n_bytes", "n_chars", "lang_uc"],
            )

    return t["documents"].select("doc_id", "text", "lang").mapInArrow(
        arrow_meta,
        schema="doc_id long, n_bytes long, n_chars long, lang_uc string",
    )


@query(
    "udtf_polymorphic_analyze",
    oracle="""
    SELECT p_partkey,
           split_part(p_name, ' ', 1) AS p1,
           split_part(p_name, ' ', 2) AS p2,
           split_part(p_name, ' ', 3) AS p3
    FROM part WHERE p_partkey < 50
    """,
)
def udtf_polymorphic_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4 static `analyze`): the output
    SCHEMA is computed at plan time from the constant argument — here
    split_n(name, ' ', 3) analyzes to columns (p1, p2, p3); calling it
    with 5 would plan five columns from the same class. Catalyst sees
    the resolved schema like any relation, so downstream pruning and
    predicates work unchanged — the table-function equivalent of
    generics, impossible with a fixed returnType UDTF
    (udtf_python_table). Oracle replays with split_part, including its
    ''-beyond-last-part convention for two-word names."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class SplitN:
        @staticmethod
        def analyze(
            s: AnalyzeArgument, delim: AnalyzeArgument, n: AnalyzeArgument
        ) -> AnalyzeResult:
            return AnalyzeResult(
                schema=StructType(
                    [
                        StructField(f"p{i + 1}", StringType())
                        for i in range(int(n.value))
                    ]
                )
            )

        def eval(self, s: str, delim: str, n: int):
            parts = (s or "").split(delim)
            # '' (not None) beyond the last part — split_part semantics,
            # so the oracle comparison is exact on short names
            yield tuple(
                parts[i] if i < len(parts) else "" for i in range(int(n))
            )

    spark.udtf.register("split_n_udtf", SplitN)
    t = load_tables(spark, sf_dir, "part")
    t["part"].where(F.col("p_partkey") < 50).createOrReplaceTempView(
        "parts_udtf_v"
    )
    return spark.sql(
        "SELECT p.p_partkey, t.p1, t.p2, t.p3 "
        "FROM parts_udtf_v p, LATERAL split_n_udtf(p.p_name, ' ', 3) t"
    )
