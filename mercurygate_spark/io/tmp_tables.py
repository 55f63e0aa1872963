"""Process-lifetime cleanup for helper catalog tables and temp dirs.

Several query keys persist helper state so their PLANS are honest
(bucketed band/IVF index tables probed exchange-free, temp stream
source dirs): the state must outlive the builder function — the driver
collects the returned DataFrame lazily — so the builders cannot drop it
themselves. Names are per-PID (correctness + bench may share one
warehouse dir from parallel processes), which means each process must
sweep its OWN leavings or warehouse dirs and catalog entries accumulate
across runs. This module is that sweep: builders register every helper
table / temp dir they create, and one atexit hook drops them when the
process exits (session still up → catalog DROP; always → best-effort
removal of the on-disk table dir under the warehouse path recorded at
registration time, so even a stopped session leaks nothing).
"""

from __future__ import annotations

import atexit
import os
import shutil

from pyspark.sql import SparkSession

_TABLES: list[tuple[str, str]] = []  # (table_name, warehouse_dir)
_DIRS: list[str] = []
_HOOKED = False


def _warehouse_dir(spark: SparkSession) -> str:
    raw = spark.conf.get("spark.sql.warehouse.dir", "")
    for prefix in ("file://", "file:"):
        if raw.startswith(prefix):
            return raw[len(prefix):]
    return raw


def _install_hook() -> None:
    global _HOOKED
    if not _HOOKED:
        atexit.register(cleanup)
        _HOOKED = True


def register_tmp_table(spark: SparkSession, name: str) -> None:
    """Record a helper catalog table for end-of-process cleanup."""
    _TABLES.append((name, _warehouse_dir(spark)))
    _install_hook()


def register_tmp_dir(path: str) -> None:
    """Record a temp directory (stream sources, sink scratch) for
    end-of-process cleanup."""
    _DIRS.append(path)
    _install_hook()


def cleanup() -> None:
    """Drop every registered helper table and remove every registered
    dir. Idempotent and exception-proof: runs at interpreter exit,
    possibly after the SparkSession is already stopped (then only the
    filesystem half runs — the default in-process catalog dies with the
    session anyway; the disk dirs are the real cross-process leak)."""
    spark = SparkSession.getActiveSession()
    for name, wh in _TABLES:
        if spark is not None:
            try:
                spark.sql(f"DROP TABLE IF EXISTS {name}")
            except Exception:
                pass
        if wh:
            shutil.rmtree(os.path.join(wh, name.lower()), ignore_errors=True)
    _TABLES.clear()
    for d in _DIRS:
        shutil.rmtree(d, ignore_errors=True)
    _DIRS.clear()
