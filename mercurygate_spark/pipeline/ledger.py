"""Run ledger (reference Q2, mm_source_to_bronze.py:173-178,208 —
done correctly: timers start BEFORE the work, fixing
linehaul_source_to_bronze.py:147-155 where per-table timing was ≈0).
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class RunLedger:
    entries: list[dict] = field(default_factory=list)

    @contextmanager
    def timed(self, table: str, database: str):
        """Usage: ``with ledger.timed('claim', 'mm') as e: …; e['count']=n``."""
        entry = {"table": table, "database": database, "count": 0, "execution_time": 0.0}
        t0 = time.perf_counter()  # started before the work — not after it
        try:
            yield entry
        finally:
            entry["execution_time"] = round(time.perf_counter() - t0, 3)
            self.entries.append(entry)

    def to_df(self, spark: SparkSession) -> DataFrame:
        """The reference's metadata mini-query (EP3): local rows →
        DataFrame → projection."""
        return spark.createDataFrame(
            self.entries or [{"table": "", "database": "", "count": 0, "execution_time": 0.0}],
            schema="table string, database string, count long, execution_time double",
        ).select("table", "database", "count", "execution_time")

    def zero_count_tables(self) -> list[str]:
        return [e["table"] for e in self.entries if e["count"] == 0]
