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
