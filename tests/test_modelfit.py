"""Tests for grouped model fits: exact-recovery on noiseless data, F-test
sanity (null uniform-ish, signal → tiny p), start-vs-end semantics."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_f_sf_closed_forms():
    from utils_spark.operators.modelfit import _f_sf

    # closed forms of the F survival function:
    # d1=2: sf = I_x(d2/2, 1) = x^(d2/2) with x = d2/(d2 + 2f)
    for f in (0.5, 1.0, 4.0, 25.0):
        x = 10.0 / (10.0 + 2.0 * f)
        assert math.isclose(_f_sf(f, 2, 10), x**5, rel_tol=1e-10)
    # d2=2: sf = I_x(1, d1/2) = 1 - (1-x)^(d1/2) with x = 2/(2 + d1*f)
    for f in (0.5, 3.0, 10.0):
        x = 2.0 / (2.0 + 4.0 * f)
        assert math.isclose(_f_sf(f, 4, 2), 1.0 - (1.0 - x) ** 2, rel_tol=1e-10)
    # F(1,1): sf = 2/pi * atan(1/sqrt(f))
    assert math.isclose(_f_sf(1.0, 1, 1), 0.5, rel_tol=1e-9)
    assert math.isclose(_f_sf(9.0, 1, 1), 2 / math.pi * math.atan(1 / 3), rel_tol=1e-9)
    assert _f_sf(0.0, 2, 10) == 1.0


def test_grouped_polyfit_recovers_lines(spark):
    from utils_spark.operators.modelfit import grouped_polyfit

    rows = []
    for g, (a, b) in {"g1": (2.0, 5.0), "g2": (-1.5, 0.5)}.items():
        for x in range(20):
            rows.append((g, float(x), a * x + b))
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r["group"]: r for r in grouped_polyfit(df, "g", "x", "y").collect()}
    assert math.isclose(out["g1"]["slope"], 2.0, abs_tol=1e-9)
    assert math.isclose(out["g1"]["intercept"], 5.0, abs_tol=1e-8)
    assert math.isclose(out["g2"]["slope"], -1.5, abs_tol=1e-9)
    assert out["g1"]["r2"] > 0.999999
    assert out["g1"]["pvalue"] < 1e-12


def test_grouped_polyfit_null_has_large_p(spark):
    from utils_spark.operators.modelfit import grouped_polyfit

    rng = np.random.default_rng(7)
    rows = [("null", float(x), float(rng.normal())) for x in range(50)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    r = grouped_polyfit(df, "g", "x", "y").collect()[0]
    assert r["pvalue"] > 0.01  # no association → not significant


def test_grouped_polyfit_degenerate_group(spark):
    from utils_spark.operators.modelfit import grouped_polyfit

    df = spark.createDataFrame([("tiny", 1.0, 2.0)], ["g", "x", "y"])
    r = grouped_polyfit(df, "g", "x", "y").collect()[0]
    # NaN crosses the Arrow boundary as NULL (matching R-NA ≙ Spark NULL, SURVEY §1.2)
    assert r["pvalue"] == 1.0 and r["r2"] is None


def test_start_vs_end(spark):
    from utils_spark.operators.modelfit import start_vs_end_test

    rows = [("up", float(t), float(t) * 2.0 + (0.01 * ((t * 7) % 5))) for t in range(40)]
    rows += [("flat", float(t), 3.0 + 0.01 * ((t * 3) % 7)) for t in range(40)]
    df = spark.createDataFrame(rows, ["g", "t", "y"])
    out = {r["g"]: r for r in start_vs_end_test(df, "g", "t", "y").collect()}
    assert out["up"]["delta"] > 50 and out["up"]["z_stat"] > 10
    assert abs(out["flat"]["delta"]) < 0.1


def test_param_sweep(spark):
    from utils_spark.operators.modelfit import param_sweep_fits

    rows = [("q", float(x), float(x * x)) for x in range(-10, 11)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = {r["degree"]: r for r in param_sweep_fits(df, "g", "x", "y", [1, 2]).collect()}
    # quadratic data: degree-2 fit is perfect, degree-1 is not
    assert out[2]["r2"] > 0.999999
    assert out[1]["r2"] < 0.5


def test_loess_trend_recovers_shape(spark):
    import numpy as np

    from utils_spark.operators.modelfit import loess_trend

    # technical trend: var = 2*mean + 1; plant 5 high-variance features
    rng = np.random.default_rng(11)
    rows = []
    for i in range(200):
        m = float(rng.uniform(0.5, 10))
        v = 2 * m + 1 + float(rng.normal(scale=0.1))
        if i < 5:
            v += 25.0  # biological signal
        rows.append((f"f{i}", m, v))
    df = spark.createDataFrame(rows, ["feature", "mean", "var"])
    out = {r["feature"]: r for r in loess_trend(df, "feature", "mean", "var").collect()}
    planted = sorted(out, key=lambda f: -out[f]["bio_var"])[:5]
    assert set(planted) == {f"f{i}" for i in range(5)}
    # trend approximates 2m+1 for non-planted features
    errs = [abs(out[f]["trend"] - (2 * out[f]["mean"] + 1)) for f in out if f not in planted]
    assert float(np.median(errs)) < 0.5


def test_condition_diff_test(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    # group 'diff': slopes 2.0 (A) vs -1.0 (B); group 'same': 1.0 both
    for g, (sa, sb) in {"diff": (2.0, -1.0), "same": (1.0, 1.0)}.items():
        for t in range(30):
            rows.append((g, "A", float(t), sa * t + float(rng.normal(scale=0.3))))
            rows.append((g, "B", float(t), sb * t + float(rng.normal(scale=0.3))))
    df = spark.createDataFrame(rows, ["g", "cond", "x", "y"])
    from utils_spark.operators.modelfit import condition_diff_test

    out = {r["group"]: r for r in condition_diff_test(df, "g", "cond", "x", "y", "A", "B").collect()}
    assert abs(out["diff"]["slope_diff"] - 3.0) < 0.1
    assert abs(out["diff"]["z_stat"]) > 20
    assert abs(out["same"]["z_stat"]) < 4


def test_natural_spline_basis_properties():
    """ns() invariants: exact reproduction of linears, natural (linear)
    extrapolation beyond boundary knots, and agreement with the literal
    textbook formula on a tiny knot set."""
    import numpy as np

    from utils_spark.operators.modelfit import natural_spline_basis

    knots = np.array([0.0, 0.3, 0.6, 1.0])
    x = np.linspace(-0.5, 1.5, 201)
    X = natural_spline_basis(x, knots)
    assert X.shape == (201, 4)  # 1, x, and K-2 = 2 spline columns

    # any linear y is reproduced exactly (it's in the span)
    y = 3.0 - 2.0 * x
    coef, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert np.allclose(X @ coef, y, atol=1e-10)

    # natural constraint: second differences vanish outside the boundaries
    h = x[1] - x[0]
    for col in range(2, 4):
        v = X[:, col]
        second = (v[2:] - 2 * v[1:-1] + v[:-2]) / h**2
        left, right = x[1:-1] < 0.0, x[1:-1] > 1.0
        assert np.abs(second[left]).max() < 1e-8
        assert np.abs(second[right]).max() < 1e-8

    # literal formula check at a hand-picked point
    xx = 0.45
    def d(j):
        return (max(xx - knots[j], 0) ** 3 - max(xx - knots[-1], 0) ** 3) / (knots[-1] - knots[j])
    row = natural_spline_basis(np.array([xx]), knots)[0]
    assert np.allclose(row, [1.0, xx, d(0) - d(2), d(1) - d(2)], atol=1e-12)


def test_grouped_splinefit_detects_smooth_signal(spark):
    """Spline fit must (a) flag a nonlinear smooth a line can't, with tiny
    p; (b) keep p large on pure noise; (c) beat the linear fit's r2 on the
    sine group."""
    import numpy as np

    from utils_spark.operators.modelfit import grouped_polyfit, grouped_splinefit

    rng = np.random.default_rng(42)
    rows = []
    for i in range(200):
        x = i / 200 * 2 * np.pi
        rows.append(("sine", float(x), float(np.sin(x) + rng.normal(scale=0.15))))
        rows.append(("noise", float(x), float(rng.normal(scale=1.0))))
    df = spark.createDataFrame(rows, ["g", "x", "y"])

    spl = {r["group"]: r for r in grouped_splinefit(df, "g", "x", "y", spline_df=4).collect()}
    lin = {r["group"]: r for r in grouped_polyfit(df, "g", "x", "y", degree=1).collect()}
    assert spl["sine"]["pvalue"] < 1e-10
    assert spl["noise"]["pvalue"] > 0.05
    assert spl["sine"]["r2"] > 0.9  # the spline tracks the sine
    assert spl["sine"]["r2"] > lin["sine"]["r2"] + 0.25  # far beyond the line
