"""Frequency / membership sketches (SURVEY.md §2c sketch family,
rounding out agg_approx_distinct / agg_approx_quantile): Count-Min
Sketch for per-key frequency estimation and a Bloom-filter membership
prefilter for dedup candidate generation.

Public-knowledge basis: Cormode & Muthukrishnan, "An improved data
stream summary: the count-min sketch and its applications" (J.
Algorithms 2005); Bloom, "Space/time trade-offs in hash coding with
allowable errors" (CACM 1970).

Unlike the engine-native HLL/GK sketches (whose internals are
engine-specific, hence bound-check oracles), these are built from the
same md5-affine hash family as minhash (operators.dedup.HASH_PARAMS
shape) — every counter and every bit is deterministic and replayable
in DuckDB SQL, so their oracles compare exact values, not bounds.

Scale notes:
- CMS: the sketch is D×W counters (a few KB) produced by one
  map-side-combinable groupBy — the 100 TB shuffle moves at most
  D×W rows per partition, never the keys. Probing broadcasts the
  sketch (it is tiny by construction).
- Bloom: the bit table is ≤ M_BITS rows, built from the (small)
  reference side and broadcast to the corpus probe join — the corpus
  is scanned once and never shuffled (same decontamination shape as
  dedup_contamination_ngram).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mercurygate_spark.functions import md5_long

P_HASH = 2_147_483_647  # 2^31 - 1 (MINHASH_PRIME); (a*h+b) < 2^62, no overflow

# Count-Min Sketch geometry: D independent hash rows × W counters.
# eps = e/W ≈ 0.5%, delta = e^-D ≈ 2% — textbook parameterization.
CMS_DEPTH = 4
CMS_WIDTH = 512

# Bloom geometry: M bits, K hashes.
BLOOM_BITS = 4096
BLOOM_HASHES = 3


def _h0(c: Column) -> Column:
    """Base 60-bit md5 hash folded into the prime field (cross-engine:
    DuckDB twin is ('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15))
    ::BIGINT % P)."""
    return md5_long(c) % P_HASH


def _affine(h0: Column, j: int, width: int) -> Column:
    """j-th affine permutation folded to [0, width) — the same
    (2j+1, 97j+31) family as the minhash permutations."""
    return ((F.lit(2 * j + 1) * h0 + F.lit(97 * j + 31)) % P_HASH) % width


def duck_h0_sql(expr: str) -> str:
    """DuckDB twin of _h0 — the single source of truth for the base
    hash; every sketch oracle must build on this (and duck_affine_sql)
    rather than hand-writing the hash family."""
    return f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15))::BIGINT % {P_HASH})"


def duck_affine_sql(h0_expr: str, j_expr: str, width: int) -> str:
    """DuckDB twin of _affine with the row/hash index as an SQL expr."""
    return (
        f"((((2 * {j_expr} + 1) * {h0_expr} + (97 * {j_expr} + 31)) "
        f"% {P_HASH}) % {width})"
    )


def cms_build(df: DataFrame, key_col: str) -> DataFrame:
    """Build the D×W Count-Min counter table: (r, c, cnt). One
    partial+final hash aggregation; the shuffle carries at most D×W
    rows per map partition regardless of input size.

    NULL keys are excluded: md5_long(NULL) is NULL, which would
    accumulate an unreachable (r, NULL) cell that cms_probe could
    never read back. Both ends of the contract (build and probe)
    drop NULLs, so the sketch counts exactly the non-null keys."""
    h = df.where(F.col(key_col).isNotNull()).select(_h0(F.col(key_col)).alias("__h0"))
    cells = h.select(
        F.posexplode(
            F.array(*[_affine(F.col("__h0"), r, CMS_WIDTH) for r in range(CMS_DEPTH)])
        ).alias("r", "c")
    )
    return cells.groupBy("r", "c").agg(F.count("*").alias("cnt"))


def cms_probe(sketch: DataFrame, probes: DataFrame, key_col: str) -> DataFrame:
    """Estimate each probe key's frequency: min over the D counters the
    key hashes to. The sketch side is broadcast (≤ D×W rows by
    construction). The sketch table is SPARSE (untouched cells have no
    row), so the join is LEFT with missing counters read as 0 — an
    unseen probe key correctly estimates ~0 instead of being dropped
    (or inheriting a colliding heavy hitter's count) as an inner join
    would. NULL probe keys are dropped (never counted at build time —
    see cms_build). Returns (key_col, cms_est)."""
    ph = probes.where(F.col(key_col).isNotNull()).select(
        key_col, _h0(F.col(key_col)).alias("__h0")
    )
    pcells = ph.select(
        key_col,
        F.posexplode(
            F.array(*[_affine(F.col("__h0"), r, CMS_WIDTH) for r in range(CMS_DEPTH)])
        ).alias("r", "c"),
    )
    joined = pcells.join(F.broadcast(sketch), ["r", "c"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("cms_est")
    )


def bloom_bits(df: DataFrame, key_col: str) -> DataFrame:
    """Set-bit table of the Bloom filter over ``df[key_col]``:
    single-column (bit) DataFrame with ≤ BLOOM_BITS distinct rows.
    NULL keys are excluded (hash of NULL is NULL, settable to no bit);
    the membership contract is over non-null keys only."""
    h = df.where(F.col(key_col).isNotNull()).select(_h0(F.col(key_col)).alias("__h0"))
    return (
        h.select(
            F.explode(
                F.array(*[_affine(F.col("__h0"), j, BLOOM_BITS) for j in range(BLOOM_HASHES)])
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    bits: DataFrame, probes: DataFrame, key_col: str, hash_col: str | None = None
) -> DataFrame:
    """Membership probe: a key is a Bloom hit iff ALL of its K bits are
    set. Hashes ``hash_col`` (default: the key itself), reports per
    ``key_col``. The bit table is broadcast; the probe side is scanned
    once and aggregated on its own key — no shuffle of the corpus
    beyond the per-key count. Probe rows whose hashed value is NULL
    are dropped rather than reported as bloom_hit=false — a NULL was
    never inserted at build time (see bloom_bits), and a fabricated
    false would read as a false negative, which the Bloom contract
    forbids. Returns (key_col, bloom_hit)."""
    ph = probes.where(F.col(hash_col or key_col).isNotNull()).select(
        key_col, _h0(F.col(hash_col or key_col)).alias("__h0")
    )
    pbits = ph.select(
        key_col,
        F.explode(
            F.array(*[_affine(F.col("__h0"), j, BLOOM_BITS) for j in range(BLOOM_HASHES)])
        ).alias("bit"),
    )
    marked = pbits.join(
        F.broadcast(bits.withColumn("__set", F.lit(1))), "bit", "left"
    )
    # Compare matched bits against the group's OWN row count, not the
    # constant K: a key appearing n times in probes contributes n*K bit
    # rows, and requiring == K would false-negative a true member —
    # violating the Bloom contract.
    return marked.groupBy(key_col).agg(
        (F.count("__set") == F.count("*")).alias("bloom_hit")
    )
