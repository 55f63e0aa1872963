"""ADVICE r12 (rounding): Spark keys round via the explicit IEEE
floor(x*10^n + 0.5)/10^n form while authored oracles write
round(x, n) — DuckDB's round() is half-away-from-zero and disagrees
with the floor form for negative values landing exactly on a
.00005-style tie. stabilize_rounding (queries/registry.py:36)
rewrites every 2-arg round() to the floor form AT REGISTRATION, so
both engines evaluate the identical expression. These tests pin that
defense so a future key can't reintroduce the mismatch.
"""

from __future__ import annotations

import re

import duckdb
import pytest


def test_no_registered_oracle_retains_two_arg_round():
    """Every oracle the driver receives must already be floor-form:
    a surviving round(expr, n) would reintroduce the half-away-from-
    zero vs floor divergence on negative ties."""
    from mercurygate_spark.queries import all_queries  # force registration
    from mercurygate_spark.queries.registry import REGISTRY

    all_queries()
    offenders = []
    for k, spec in REGISTRY.items():
        if not spec.oracle:
            continue
        for m in re.finditer(r"(?<![a-zA-Z_])round\s*\(", spec.oracle, re.I):
            depth, i = 1, m.end()
            while depth:
                depth += {"(": 1, ")": -1}.get(spec.oracle[i], 0)
                if spec.oracle[i] == "," and depth == 1:
                    offenders.append(k)
                    break
                i += 1
    assert offenders == [], offenders


def test_floor_form_agrees_across_engines_on_negative_ties():
    """The exact exposure the advice names: cosines of -0.00005,
    -0.12345, 0.00005 on a 4-dp tie. DuckDB round() half-away-from-
    zero DISAGREES with the floor form there; the stabilized floor
    expression agrees bit-for-bit with Spark's."""
    ties = [-0.00005, -0.12345, 0.00005, 0.12345, -1.0, 1.0, 0.0]
    con = duckdb.connect()
    duck = [
        con.execute(f"select floor(({x!r}) * 10000 + 0.5) / 10000").fetchone()[0]
        for x in ties
    ]
    # python evaluation of the same IEEE expression stands in for the
    # Spark codegen result (both are IEEE-754 doubles, same op order)
    import math

    py = [math.floor(x * 10000 + 0.5) / 10000 for x in ties]
    assert duck == py
    # and demonstrate the divergence the rewrite prevents: DuckDB's
    # native round() breaks the tie away from zero on negatives
    assert con.execute("select round(-0.00005::DOUBLE, 4)").fetchone()[0] != py[0]


def test_stabilize_rounding_handles_nested_and_case():
    from mercurygate_spark.queries.registry import stabilize_rounding

    out = stabilize_rounding("SELECT ROUND(round(x, 2) + y, 4) AS a, around(z, 2) AS b")
    assert "floor((floor((x) * 100 + 0.5) / 100 + y) * 10000 + 0.5) / 10000" in out
    assert "around(z, 2)" in out  # word boundary respected
