"""mercurygate_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark engine with the query and
data-processing capabilities of the reference freight-claims
medallion pipeline (leticiaacs-dev/mercurygate, see SURVEY.md), plus
the Gold-layer query surface it promises and large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing).

Architecture (SURVEY.md §7):

- ``session``   — SparkSession factory with deterministic, scale-aware conf.
- ``catalog``   — declarative table registry (schemas, pks, rename maps).
- ``io``        — sources (csv/parquet/local rows, sftp fetch) and sinks.
- ``pipeline``  — bronze ingest → silver conform/dedupe/SCD → run ledger.
- ``functions`` — scalar/column helpers built on pyspark.sql.functions.
- ``operators`` — engine operators Spark lacks natively (as-of join,
                  minhash/simhash dedup, cosine top-k, text analysis,
                  multimodal plumbing).
- ``queries``   — the Gold query library; every query is registered with
                  a DuckDB oracle twin for the correctness harness.
- ``streaming`` — Structured Streaming variants over the events table.

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
