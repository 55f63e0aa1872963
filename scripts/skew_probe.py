"""True-skew evidence for the skew toolkit (VERDICT r5 item 6).

Builds a zipf-skewed variant of the events table (deterministic
md5-derived power-law user_id: the hottest key holds ~18% of all
rows, the top 5 keys ~40%) at --factor × sf0.1 volume, then measures
the toolkit's claims against their plain counterparts:

1. SKEWED AGGREGATION (decomposable: sum/count) — plain groupBy vs
   salted_agg. Expectation stated up front: Spark's map-side partial
   aggregation already collapses a hot key to one row per task, so
   plain and salted should tie; the table documents that salting is
   NOT needed for decomposable aggs (the toolkit docstring's claim).
2. SKEWED PER-KEY LATEST — Window.partitionBy(hot key) row_number
   vs max_by groupBy dedupe. Window physically sorts the whole hot
   partition in ONE task (no AQE help for window functions); max_by
   partial-aggregates map-side. This is the r5 pipeline_corpus_mixture
   lesson, measured in isolation on genuinely skewed keys.
3. SKEWED JOIN — events ⋈ per-user dim, three ways: plain sort-merge
   with AQE skew-split ON, plain with AQE OFF (the 'skew AQE can't
   see' stand-in: pre-partitioned inputs, stateful stages, non-inner
   shapes), and skew_isolated_join with AQE OFF. The toolkit should
   recover AQE-level wall-clock without AQE.

Every measured pair is also checked for result equality (count +
agg checksum), so the speedup claims can't drift from correctness.

Run: python scripts/skew_probe.py [--factor 20]
Output: markdown rows (paste into docs/SCALING.md) + one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mercurygate_spark.operators.skew import salted_agg, skew_isolated_join
from mercurygate_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
OUT = "/tmp/mercurygate_skew_probe"


def build_skewed_events(spark, factor: int) -> str:
    """factor × sf0.1 events with a deterministic zipf-ish user_id:
    u = md5-uniform in [0,1); user_id = floor(N * u^8). u^8 piles
    mass near 0 — P(user_id=0) = (1/N)^(1/8) ≈ 42% for N=1000 (the
    null-ish-default-key shape real telemetry exhibits)."""
    out = Path(OUT)
    base = spark.read.parquet(f"{SF_DIR}/events.parquet")
    parts = [
        base.withColumn("event_id", F.col("event_id") + F.lit(i * 1_000_000_000))
        for i in range(factor)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    n_users = 1000
    u = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("double") / F.lit(float(16**15))
    )
    skewed = big.withColumn(
        "user_id", F.floor(F.lit(n_users) * F.pow(u, F.lit(8.0))).cast("long")
    )
    skewed.write.mode("overwrite").parquet(str(out / "events.parquet"))
    # per-user dim (one row per possible user)
    spark.range(n_users).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 7).alias("cohort"),
        F.md5(F.col("id").cast("string")).alias("attrs"),
    ).write.mode("overwrite").parquet(str(out / "users.parquet"))
    return str(out)


def timed(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return best


def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def checksum(df: DataFrame, col: str) -> tuple[int, float]:
    r = df.agg(F.count("*").alias("n"), F.sum(col).alias("s")).collect()[0]
    return r["n"], float(r["s"] or 0.0)


def same(a: tuple[int, float], b: tuple[int, float]) -> bool:
    """Row counts exact; double sums to relative 1e-9 (summation order
    differs between plans, so bit-equality is not the contract)."""
    return a[0] == b[0] and abs(a[1] - b[1]) <= 1e-9 * max(1.0, abs(a[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=20)
    args = ap.parse_args()
    spark = get_spark("skew-probe")
    d = build_skewed_events(spark, args.factor)
    ev = spark.read.parquet(f"{d}/events.parquet")
    users = spark.read.parquet(f"{d}/users.parquet")
    n = ev.count()
    hot = (
        ev.groupBy("user_id").count().orderBy(F.desc("count")).limit(5).collect()
    )
    hot_share = sum(r["count"] for r in hot) / n
    print(
        f"rows={n} hottest_key={hot[0]['count']} ({hot[0]['count']/n:.1%}) "
        f"top5_share={hot_share:.1%}",
        flush=True,
    )
    results: dict[str, dict] = {}

    # --- 1. decomposable agg: plain vs salted ---
    def plain_agg():
        return ev.groupBy("user_id").agg(
            F.sum("value").alias("total"), F.count("*").alias("n")
        )

    def salted():
        return salted_agg(
            ev,
            ["user_id"],
            {
                "total": (F.sum("value"), F.sum("total")),
                "n": (F.count("*"), F.sum("n")),
            },
        )

    assert same(checksum(plain_agg(), "total"), checksum(salted(), "total"))
    noop(plain_agg()); noop(salted())  # warm
    results["agg_plain_groupby"] = {"s": round(timed(lambda: noop(plain_agg())), 2)}
    results["agg_salted"] = {"s": round(timed(lambda: noop(salted())), 2)}

    # --- 2. per-key latest: window sort vs max_by partial agg ---
    def window_latest():
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        return (
            ev.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("user_id", "event_id", "value", "props")
        )

    def maxby_latest():
        return ev.groupBy("user_id").agg(
            F.max_by("event_id", F.struct("ts", "event_id")).alias("event_id"),
            F.max_by("value", F.struct("ts", "event_id")).alias("value"),
            F.max_by("props", F.struct("ts", "event_id")).alias("props"),
        )

    assert same(checksum(window_latest(), "value"), checksum(maxby_latest(), "value"))
    noop(window_latest()); noop(maxby_latest())
    results["latest_window_sort"] = {"s": round(timed(lambda: noop(window_latest())), 2)}
    results["latest_maxby_agg"] = {"s": round(timed(lambda: noop(maxby_latest())), 2)}

    # --- 3. skewed join: AQE on / AQE off / isolated (AQE off) ---
    def set_aqe(on: bool) -> None:
        v = "true" if on else "false"
        spark.conf.set("spark.sql.adaptive.enabled", v)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", v)

    def plain_join():
        # hint away the broadcast so the shuffle-join skew is real
        return ev.join(users.hint("shuffle_merge"), "user_id").select(
            "user_id", "value", "props", "cohort"
        )

    def isolated_join():
        return skew_isolated_join(
            ev, users.hint("shuffle_merge"), "user_id",
            hot_key_threshold=n // 100,
        ).select("user_id", "value", "props", "cohort")

    assert same(checksum(plain_join(), "value"), checksum(isolated_join(), "value"))
    set_aqe(True)
    noop(plain_join())
    results["join_plain_aqe_on"] = {"s": round(timed(lambda: noop(plain_join())), 2)}
    set_aqe(False)
    noop(plain_join()); noop(isolated_join())
    results["join_plain_aqe_off"] = {"s": round(timed(lambda: noop(plain_join())), 2)}
    results["join_isolated_aqe_off"] = {
        "s": round(timed(lambda: noop(isolated_join())), 2)
    }
    set_aqe(True)

    print("\n| measurement | wall-clock |")
    print("|---|---|")
    for k, v in results.items():
        print(f"| {k} | {v['s']}s |")
    print()
    print(json.dumps({
        "rows": n, "factor": args.factor,
        "hottest_key_share": round(hot[0]["count"] / n, 3),
        "top5_share": round(hot_share, 3),
        **{k: v["s"] for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
