"""Text analysis operators (north-star surface, BASELINE.json):
token counting, quality scoring, language-ID heuristic, document
fingerprinting.

All are pure Column-expression builders over built-in functions —
JVM-side, codegen-friendly, linear scans with no shuffle until the
caller aggregates. Each has an exact DuckDB-SQL twin documented in
queries/text.py, so correctness is oracle-checked, not eyeballed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mercurygate_spark.functions import md5_hex, norm_text, tokens

# Stopword markers per language for the n-gram/marker language-ID
# heuristic. Deterministic tie-break: first language in this tuple wins.
LANG_MARKERS: tuple[tuple[str, str], ...] = (
    ("en", r"(^| )(the|a|of|and|to|is)( |$)"),
    ("de", r"(^| )(der|die|das|und|ist|ein)( |$)"),
    ("es", r"(^| )(el|la|de|y|es|un)( |$)"),
    ("fr", r"(^| )(le|la|et|est|un|une)( |$)"),
    ("zh", r"[一-鿿]"),
)

STOPWORDS_EN = ("the", "a", "of", "and", "to", "is", "in", "it")


def token_count(c: Column | str) -> Column:
    """Number of alnum tokens. DuckDB twin:
    len(list_filter(regexp_split_to_array(lower(x), '[^a-z0-9]+'), t -> t <> ''))."""
    return F.size(tokens(c))


def distinct_token_count(c: Column | str) -> Column:
    """Distinct alnum tokens. DuckDB twin: len(list_distinct(...))."""
    return F.size(F.array_distinct(tokens(c)))


def marker_count(c: Column | str, pattern: str) -> Column:
    """Occurrences of a marker regex in normalized text.
    DuckDB twin: len(regexp_extract_all(x, pattern))."""
    col = norm_text(c)
    return F.regexp_count(col, F.lit(pattern))


def lang_scores(c: Column | str) -> list[tuple[str, Column]]:
    """Per-language marker scores for the language-ID heuristic."""
    return [(lang, marker_count(c, pat)) for lang, pat in LANG_MARKERS]


def lang_id(c: Column | str) -> Column:
    """Predicted language = argmax of marker scores, ties → first
    language in LANG_MARKERS order, all-zero → 'und'. Built as a
    CASE chain so the DuckDB twin is the same CASE chain."""
    scores = lang_scores(c)
    best = scores[0][1]
    for _, s in scores[1:]:
        best = F.greatest(best, s)
    expr = F.lit("und")
    for lang, s in reversed(scores):
        expr = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(expr)
    return expr


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features per document (length / punctuation /
    stopword ratios). Ratios are int/int divisions with identical
    operand trees on both engines → bit-identical doubles."""
    n_tok = token_count(text_col)
    n_chars = F.length(F.col(text_col))
    stop_pat = r"(^| )(" + "|".join(STOPWORDS_EN) + r")( |$)"
    n_stop = marker_count(text_col, stop_pat)
    # punctuation count = chars minus alnum/space chars
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z0-9 ]", ""))
    return df.withColumns(
        {
            "n_tokens": n_tok,
            "n_distinct_tokens": distinct_token_count(text_col),
            "n_stopwords": n_stop,
            "n_punct": n_punct,
            "char_len": n_chars,
        }
    )


def fingerprint(c: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of normalized text.
    Cross-engine stable (DuckDB: md5(normalized)). Near-dup variants
    (minhash/simhash) live in operators.dedup."""
    return md5_hex(norm_text(c))
