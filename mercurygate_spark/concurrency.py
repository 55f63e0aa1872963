"""Driver-side job overlap (guide §2.6) with a hardened error path.

Four query paths overlap an independent Spark job chain (classifier
GD training, an index retrain, a refresh extract) with the main
thread's stage so the side chain back-fills the main chain's
stragglers. The start-thread / result-cell / join / re-raise
boilerplate previously lived copy-pasted at each site (ADVICE r15),
with two shared defects:

- no join timeout — a hung side-thread Spark job deadlocked the query
  instead of failing it (VERDICT r15 "What's wrong" #5);
- no error-path join — when the MAIN thread's stage raised first, the
  side thread kept running orphaned jobs (and, in the medallion case,
  raced the cleanup rmtree against its in-flight write).

``run_in_background`` centralizes all of it. Threads are
``pyspark.InheritableThread`` so JVM thread-locals (job group / job
description) are inherited and cleaned up per the PySpark docs.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Generic, TypeVar

T = TypeVar("T")

# Generous by design: the overlapped stages finish in seconds locally
# and minutes at scale; the timeout exists to convert a genuinely hung
# side-thread job into a loud failure instead of a silent deadlock.
BACKGROUND_JOIN_TIMEOUT_S = float(
    os.environ.get("SPARK_GRAFT_BG_JOIN_TIMEOUT_S", "600")
)


class BackgroundJob(Generic[T]):
    """Handle for a side-thread stage started by run_in_background."""

    def __init__(self, fn: Callable[[], T], name: str) -> None:
        from pyspark import InheritableThread

        self._name = name
        self._out: dict[str, Any] = {}

        def _work() -> None:
            try:
                self._out["result"] = fn()
            except BaseException as exc:  # re-raised in result()
                self._out["err"] = exc

        self._th = InheritableThread(target=_work, daemon=True)
        self._th.start()

    def result(self, timeout_s: float = BACKGROUND_JOIN_TIMEOUT_S) -> T:
        """Join the side thread and return its result; re-raises the
        side thread's exception, and raises RuntimeError instead of
        deadlocking when the thread does not finish in time."""
        self._th.join(timeout_s)
        if self._th.is_alive():
            raise RuntimeError(
                f"background stage {self._name!r} did not finish within "
                f"{timeout_s:.0f}s — likely a hung Spark job in the side "
                "thread; failing the query instead of deadlocking"
            )
        if "err" in self._out:
            raise self._out["err"]
        return self._out["result"]

    def wait_quietly(self, timeout_s: float = BACKGROUND_JOIN_TIMEOUT_S) -> None:
        """Error-path join: bound the orphaned side thread WITHOUT
        masking the main thread's exception (its own error, if any, is
        deliberately swallowed — the main error is the one to surface).
        Call from an ``except``/``finally`` before cleanup that could
        race the side thread (e.g. rmtree of a dir it writes into)."""
        try:
            self._th.join(timeout_s)
        except Exception:
            pass


def run_in_background(fn: Callable[[], T], name: str = "stage") -> BackgroundJob[T]:
    """Start ``fn()`` on an InheritableThread; returns a handle whose
    ``.result()`` joins (bounded) and re-raises. See module docstring."""
    return BackgroundJob(fn, name)
