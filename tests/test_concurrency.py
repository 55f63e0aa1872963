"""run_in_background: the shared §2.6 overlap helper.

Pins the error-path contract VERDICT r15 #5 asked for: a failing side
thread errors the query (same exception), a HUNG side thread raises
instead of deadlocking, and wait_quietly never masks the main-thread
error.
"""

from __future__ import annotations

import time

import pytest

from mercurygate_spark.concurrency import run_in_background


def test_result_returns_value(spark):
    job = run_in_background(lambda: 40 + 2, "ok")
    assert job.result() == 42


def test_worker_exception_reraised(spark):
    class Boom(RuntimeError):
        pass

    def _fail():
        raise Boom("side thread failed")

    job = run_in_background(_fail, "fails")
    with pytest.raises(Boom, match="side thread failed"):
        job.result()


def test_hung_worker_raises_instead_of_deadlocking(spark):
    done = {"flag": False}

    def _slow():
        time.sleep(5.0)
        done["flag"] = True

    job = run_in_background(_slow, "hung-stage")
    t0 = time.monotonic()
    with pytest.raises(RuntimeError, match="hung-stage"):
        job.result(timeout_s=0.3)
    assert time.monotonic() - t0 < 3.0  # bounded, not the full sleep
    job.wait_quietly()  # cleanup for the test process


def test_wait_quietly_swallows_worker_error(spark):
    def _fail():
        raise ValueError("worker error that must not mask the main one")

    job = run_in_background(_fail, "quiet")
    job.wait_quietly()  # must not raise


def test_failing_side_spark_job_errors_the_query(spark, sf_dir):
    """A side thread running a FAILING Spark job must error the main
    path (not hang): the injected-failure test VERDICT r15 #8 asked
    for, on a real Spark action."""
    from pyspark.sql import functions as F

    def _bad_job():
        df = spark.range(10).select(
            F.assert_true(F.col("id") < 5).alias("ok"),
        )
        # noop sink computes every column (count() would prune the
        # asserting column away and the job would pass vacuously)
        df.write.format("noop").mode("overwrite").save()

    job = run_in_background(_bad_job, "bad-spark-job")
    with pytest.raises(Exception):
        job.result(timeout_s=120)
