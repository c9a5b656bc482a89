"""Regression tests for the local gate's STRICT signed-zero pass.

Round-10 shipped `cluster_assign` red because tools/verify_oracle.py's
1e-9 numeric tolerance treats Spark `0.0` and DuckDB `-0.0` as equal
while the driver's value hash splits them. The strict pass must flag
exactly that case — and nothing else — so the local gate can never
diverge from the driver's hash on signed zero again.
"""

import math

import pandas as pd

from tools.verify_oracle import compare


def test_signed_zero_is_flagged():
    a = pd.DataFrame({"k": [1, 2], "v": [0.0, 1.5]})
    b = pd.DataFrame({"k": [1, 2], "v": [-0.0, 1.5]})
    problems = compare(a, b)
    assert problems, "-0.0 vs 0.0 must fail the strict gate"
    assert any("signed-zero" in p for p in problems)


def test_matching_negative_zero_both_sides_passes():
    # both sides emitting -0.0 hash identically — not a defect
    a = pd.DataFrame({"v": [-0.0, 2.0]})
    b = pd.DataFrame({"v": [-0.0, 2.0]})
    assert compare(a, b) == []


def test_plain_match_and_tolerance_still_pass():
    a = pd.DataFrame({"v": [1.0, 2.0 + 1e-12]})
    b = pd.DataFrame({"v": [1.0, 2.0]})
    assert compare(a, b) == []


def test_numeric_divergence_still_flagged():
    a = pd.DataFrame({"v": [1.0]})
    b = pd.DataFrame({"v": [1.1]})
    assert any("values differ" in p for p in compare(a, b))


def test_nan_rows_do_not_trip_strict_pass():
    a = pd.DataFrame({"v": [float("nan"), 0.0]})
    b = pd.DataFrame({"v": [float("nan"), 0.0]})
    assert compare(a, b) == []


def test_nz_sql_identity():
    # the SQL twin of nz(): IEEE guarantees -0.0 + 0.0 == +0.0 and the
    # addition is a no-op everywhere else
    assert math.copysign(1.0, -0.0 + 0.0) == 1.0
    for x in (-1.25, -1e-300, 0.0, 1e-300, 7.5):
        assert x + 0.0 == x and math.copysign(1.0, x + 0.0) == math.copysign(
            1.0, x
        )
