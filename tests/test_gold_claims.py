"""Golden tests for the claim-family Gold KPIs (the reference's
promised-but-unbuilt layer) on synthetic silver-shaped fixtures."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from mercurygate_spark.queries.gold_claims import (
    claim_cycle_times,
    claimant_leaderboard,
    monthly_claim_kpis,
    open_claim_aging,
    payment_recovery,
)

D = datetime


@pytest.fixture(scope="module")
def silver_claim(spark):
    rows = [
        # claim_number, status, claimant, total, payment, created, filed, closed, paid, active
        ("C1", "CLOSED", "Acme", 1000.0, 800.0, D(2025, 1, 1), D(2025, 1, 5), D(2025, 2, 1), D(2025, 2, 10), "Y"),
        ("C2", "OPEN",   "Acme", 500.0,  0.0,   D(2025, 1, 15), D(2025, 1, 20), None, None, "Y"),
        ("C3", "OPEN",   "Beta", 2000.0, 0.0,   D(2024, 6, 1), None, None, None, "Y"),
        ("C4", "CLOSED", "Gamma", 0.0,   0.0,   D(2025, 2, 1), D(2025, 2, 2), D(2025, 2, 20), None, "N"),
    ]
    return spark.createDataFrame(
        rows,
        schema="claim_number string, status_code string, claim_ant string, "
               "total_amount double, payment_amount double, date_created timestamp, "
               "date_filed timestamp, date_closed timestamp, date_paid timestamp, active string",
    )


@pytest.fixture(scope="module")
def silver_payments(spark):
    rows = [
        ("C1", 500.0), ("C1", 300.0), ("C2", 0.0),
    ]
    return spark.createDataFrame(rows, schema="claim_number string, payment_amount double")


def test_cycle_times(spark, silver_claim):
    ct = {r["claim_number"]: r for r in claim_cycle_times(silver_claim).collect()}
    assert ct["C1"]["days_to_file"] == 4
    assert ct["C1"]["days_to_close"] == 31
    assert ct["C3"]["days_to_file"] is None  # never filed → null, not error


def test_open_claim_aging(spark, silver_claim):
    buckets = {r["age_bucket"]: r for r in
               open_claim_aging(silver_claim, D(2025, 3, 1)).collect()}
    # C2 created 2025-01-15 → 45 days → 31-90; C3 → 180+; C4 inactive excluded
    assert buckets["31-90"]["n_claims"] == 1 and buckets["31-90"]["exposure"] == 500.0
    assert buckets["180+"]["n_claims"] == 1 and buckets["180+"]["exposure"] == 2000.0
    assert "0-30" not in buckets


def test_payment_recovery(spark, silver_claim, silver_payments):
    rec = {r["claim_number"]: r for r in
           payment_recovery(silver_claim, silver_payments).collect()}
    assert rec["C1"]["total_paid"] == 800.0 and rec["C1"]["n_payments"] == 2
    assert rec["C1"]["recovery_ratio"] == 0.8
    assert rec["C3"]["total_paid"] == 0.0 and rec["C3"]["n_payments"] == 0
    assert rec["C4"]["recovery_ratio"] is None  # claimed 0 → null, not div/0


def test_monthly_kpis(spark, silver_claim):
    m = {r["year_month"]: r for r in monthly_claim_kpis(silver_claim).collect()}
    assert m["2025-01"]["n_claims"] == 2
    assert m["2025-01"]["claimed"] == 1500.0
    assert m["2025-01"]["n_closed"] == 1
    assert m["2024-06"]["n_claims"] == 1


def test_claimant_leaderboard(spark, silver_claim):
    rows = claimant_leaderboard(silver_claim, top_n=2).collect()
    assert [r["claim_ant"] for r in rows] == ["Beta", "Acme"]
    assert rows[1]["claimed_amount"] == 1500.0 and rows[1]["n_claims"] == 2
