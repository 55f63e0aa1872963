"""As-of join (SURVEY.md §2c `join_asof`): for each left row, the
latest right row with ``right_ts <= left_ts`` per key.

Spark has no native as-of join (public API gap also noted in the
PySpark guide's OLAP patterns). Two strategies:

- ``asof_join``: equi-join on key + range filter + row_number window.
  One shuffle per side on the key; AQE handles skew. This is the
  scale-path when right-side fan-in per left row is bounded.
- ``asof_join_pandas``: cogrouped ``applyInPandas`` running
  ``pd.merge_asof`` per key group — Arrow-batched, for when the
  window's intermediate (left × matching-right) blowup is too large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    how: str = "inner",
    left_key: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Window-based as-of join.

    Left columns are all kept; caller aliases ``right_cols`` beforehand
    on collision. ``left_key`` is a unique key of the left side (falls
    back to all left columns) — the ranking window partitions on it.
    Deterministic tie-break: equal right timestamps resolve by the
    remaining ``right_cols`` (descending for backward, ascending for
    forward — always toward the same deterministic pick).

    ``direction`` (pd.merge_asof vocabulary):
    - ``backward``: latest right with right_ts <= left_ts (default);
    - ``forward``: earliest right with right_ts >= left_ts;
    - ``nearest``: right row minimizing |right_ts - left_ts|, either
      side. Tie rule (pinned, deterministic): equal distances resolve
      to the EARLIER right_ts (the backward candidate), then ascending
      ``right_cols``.
    ``tolerance_seconds`` bounds the match distance: backward matches
    within [left_ts - tol, left_ts], forward within [left_ts, left_ts
    + tol], nearest within [left_ts - tol, left_ts + tol]. A tolerance
    turns the range predicate into a band — the same pushdown-friendly
    shape as ts_proximity_join, and at scale it caps per-key fan-in
    (an unbounded as-of against a year of history joins every older
    row; a tolerance joins a bounded window).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    if tolerance_seconds is not None:
        tolerance_seconds = float(tolerance_seconds)
        if not tolerance_seconds >= 0:  # also rejects NaN
            raise ValueError(f"tolerance_seconds must be >= 0, got {tolerance_seconds!r}")
    lcols = left.columns
    r = right.select(on, right_ts, *[c for c in right_cols if c not in (on, right_ts)])
    j = left.join(r, on=on, how="inner")
    if direction == "backward":
        j = j.where(F.col(right_ts) <= F.col(left_ts))
        if tolerance_seconds is not None:
            # fixed-point format: repr(1e-05) would yield an unparseable
            # 'INTERVAL 1e-05 SECOND'; micros is timestamp resolution
            j = j.where(
                F.col(right_ts)
                >= F.col(left_ts) - F.expr(f"INTERVAL '{tolerance_seconds:.6f}' SECOND")
            )
        order = [F.col(right_ts).desc()] + [
            F.col(c).desc() for c in right_cols if c not in (on, right_ts)
        ]
    elif direction == "forward":
        j = j.where(F.col(right_ts) >= F.col(left_ts))
        if tolerance_seconds is not None:
            j = j.where(
                F.col(right_ts)
                <= F.col(left_ts) + F.expr(f"INTERVAL '{tolerance_seconds:.6f}' SECOND")
            )
        order = [F.col(right_ts).asc()] + [
            F.col(c).asc() for c in right_cols if c not in (on, right_ts)
        ]
    else:  # nearest
        if tolerance_seconds is not None:
            tol = F.expr(f"INTERVAL '{tolerance_seconds:.6f}' SECOND")
            j = j.where(
                (F.col(right_ts) >= F.col(left_ts) - tol)
                & (F.col(right_ts) <= F.col(left_ts) + tol)
            )
        dist = F.abs(F.unix_micros(F.col(right_ts)) - F.unix_micros(F.col(left_ts)))
        order = [dist.asc(), F.col(right_ts).asc()] + [
            F.col(c).asc() for c in right_cols if c not in (on, right_ts)
        ]
    w = Window.partitionBy(*(left_key or lcols)).orderBy(*order)
    matched = j.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
    if how == "left":
        # anti-join on the unique left_key (null-safe by uniqueness);
        # anti-joining on ALL left columns would mis-classify matched
        # rows containing NULLs (null-unsafe equality) and duplicate them
        anti_key = left_key or lcols
        missing = left.join(matched.select(anti_key), on=anti_key, how="left_anti")
        matched = matched.unionByName(missing, allowMissingColumns=True)
    return matched


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Cogrouped merge_asof — per-key pandas merge, Arrow-batched.

    Preferred when one key has many right rows (the window variant
    materializes left×right-candidates before ranking; merge_asof is
    linear after the per-group sort)."""
    import pandas as pd

    out_fields = left.schema.fields + [
        f for f in right.schema.fields if f.name in right_cols and f.name != on
    ]
    from pyspark.sql.types import StructType

    schema = StructType(out_fields)
    rsel = right.select(on, right_ts, *[c for c in right_cols if c not in (on, right_ts)])

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        # Tie-break INSIDE the group: rows arrive in arbitrary
        # post-shuffle order (a pre-cogroup orderBy does not survive),
        # so sorting only by right_ts would leave equal-timestamp picks
        # nondeterministic. Sorting ascending by (ts, other right cols)
        # makes merge_asof's last-wins pick the MAX of the remaining
        # columns — the same tie-break as the window strategy's
        # descending order.
        r_order = [right_ts] + [c for c in right_cols if c not in (on, right_ts)]
        rpdf = rpdf.sort_values(r_order, kind="mergesort")
        merged = pd.merge_asof(
            lpdf, rpdf.drop(columns=[on]), left_on=left_ts, right_on=right_ts
        )
        # inner semantics, matching asof_join: drop unmatched left rows
        # (also prevents NaN→LongType Arrow conversion failures on
        # integer right columns)
        merged = merged[merged[right_ts].notna()]
        return merged[[f.name for f in out_fields]]

    return left.groupBy(on).cogroup(rsel.groupBy(on)).applyInPandas(merge, schema)
