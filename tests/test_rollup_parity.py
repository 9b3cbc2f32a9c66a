"""The BASELINE parity suite: Spark engine rollups (native closed form AND
Arrow exact-replay) vs the pandas oracle, at every retention tier —
values compared after the reference's round(5)
(reference harmonizers/__init__.py:233)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import oracle
from timeseries_harmonizer_spark.config import TIERS
from timeseries_harmonizer_spark.plans import pipeline


@pytest.fixture(scope="module")
def inputs_pdf(pages, reg):
    return pages.toPandas(), reg.toPandas()


def _compare(got: pd.DataFrame, expected: pd.DataFrame, tol=2e-5):
    got = got.sort_values(["url", "start"]).reset_index(drop=True)
    expected = expected.sort_values(["url", "start"]).reset_index(drop=True)
    assert len(got) == len(expected), (len(got), len(expected))
    assert (got["url"].to_numpy() == expected["url"].to_numpy()).all()
    assert (
        pd.DatetimeIndex(got["start"]) == pd.DatetimeIndex(expected["start"])
    ).all()
    g = got["value"].to_numpy(dtype="float64")
    e = expected["value"].to_numpy(dtype="float64")
    both_nan = np.isnan(g) & np.isnan(e)
    diff = np.abs(g - e)
    bad = ~(both_nan | (diff <= tol))
    assert not bad.any(), got[bad].head(10).to_string() + "\n---\n" + expected[bad].head(10).to_string()


@pytest.mark.parametrize("tier_name", ["1m", "1h", "1d"])
def test_native_rollup_matches_oracle(spark, pages, reg, inputs_pdf, tier_name):
    tier = TIERS[tier_name]
    prepared = pipeline.prepare(pages, reg, tier)
    pts = pipeline.rollup_points(prepared, tier, exact=False)
    got = (
        pts.select("url", "start", F.round("value", 5).alias("value"))
        .toPandas()
    )
    pages_pdf, reg_pdf = inputs_pdf
    expected = oracle.harmonize_pages(
        pages_pdf, reg_pdf, tier.seconds, tier.gap_seconds
    )
    _compare(got, expected)


def test_exact_replay_matches_oracle(spark, pages, reg, inputs_pdf):
    """The Arrow replay path (chunked: bounded group memory) matches the
    oracle kernels; chunk-partial merging reorders float addition, so the
    tolerance is ULP-level rather than 0."""
    tier = TIERS["1h"]
    prepared = pipeline.prepare(pages, reg, tier)
    pts = pipeline.rollup_points(prepared, tier, exact=True)
    got = pts.select("url", "start", F.round("value", 5).alias("value")).toPandas()
    pages_pdf, reg_pdf = inputs_pdf
    expected = oracle.harmonize_pages(pages_pdf, reg_pdf, tier.seconds, tier.gap_seconds)
    _compare(got, expected, tol=1e-9)


def test_exact_path_gapless_1d_tier(spark, pages, reg, inputs_pdf):
    """The 1d tier has gap_seconds=None (one session per url) — the exact
    path must still run with bounded Arrow groups (time chunking) and match
    the oracle, and LAST windows must carry a real is_real flag."""
    tier = TIERS["1d"]
    prepared = pipeline.prepare(pages, reg, tier)
    pts = pipeline.rollup_points(prepared, tier, exact=True)
    pdf = pts.select(
        "url", "start", F.round("value", 5).alias("value"), "is_real"
    ).toPandas()
    pages_pdf, reg_pdf = inputs_pdf
    expected = oracle.harmonize_pages(pages_pdf, reg_pdf, tier.seconds, tier.gap_seconds)
    _compare(pdf[["url", "start", "value"]], expected, tol=1e-9)
    assert pdf["is_real"].notna().all()


def test_twa_matches_numpy_trapezoid(spark):
    """rollup_native_twa vs a numpy trapezoid oracle on irregular data, and
    the analytic check: a pure linear ramp's TWA is the window midpoint."""
    from timeseries_harmonizer_spark.operators.rollup import rollup_native_twa

    rng = np.random.default_rng(11)
    t0 = 1704067200
    ts = np.sort(rng.choice(np.arange(0, 6 * 3600, 7), size=400, replace=False)) + t0
    vals = rng.normal(50, 10, size=400).round(3)
    pdf = pd.DataFrame(
        {"url": "u", "warc_ts": pd.to_datetime(ts, unit="s"), "value": vals}
    )
    got = (
        rollup_native_twa(spark.createDataFrame(pdf), session_col=None)
        .orderBy("start")
        .toPandas()
    )
    # numpy oracle: per fully-covered hour, trapezoid integral of the
    # piecewise-linear interpolant over [w, w+3600] / 3600
    f = lambda x: np.interp(x, ts.astype(float), vals)
    exp = []
    for w in range(t0, t0 + 6 * 3600, 3600):
        if ts[0] <= w and ts[-1] >= w + 3600:
            xs = np.unique(np.concatenate(
                [[w, w + 3600], ts[(ts >= w) & (ts <= w + 3600)].astype(float)]))
            integ = np.trapz(f(xs), xs)
            exp.append((w, np.floor(integ / 3600 * 1e6) / 1e6))
    assert len(got) == len(exp) >= 3
    np.testing.assert_allclose(
        got["value"].to_numpy(), [v for _, v in exp], rtol=0, atol=2e-6
    )
    # analytic: ramp v(t) = t - t0 over [t0, t0+2h] -> hour k TWA = k*3600+1800
    ramp = pd.DataFrame(
        {
            "url": "r",
            "warc_ts": pd.to_datetime([t0, t0 + 7200], unit="s"),
            "value": [0.0, 7200.0],
        }
    )
    r = (
        rollup_native_twa(spark.createDataFrame(ramp), session_col=None)
        .orderBy("start")
        .toPandas()
    )
    np.testing.assert_allclose(r["value"].to_numpy(), [1800.0, 5400.0])


def test_sum_avg_combined_equals_separate(spark, pages, reg):
    """r6: the single-pass SUM+AVG rollup must equal the separate
    operators bit-for-bit on the same prepared frame (per-branch rows and
    float operation order are identical by construction)."""
    from timeseries_harmonizer_spark.operators.rollup import (
        rollup_native_avg,
        rollup_native_sum,
        rollup_native_sum_avg,
    )

    tier = TIERS["1h"]
    prepared = pipeline.prepare(pages, reg, tier)
    combined = (
        rollup_native_sum_avg(
            prepared.where(F.col("agg_func").isin("SUM", "AVG")),
            freq_seconds=tier.seconds, session_col="session_id",
        )
        .toPandas().sort_values(["url", "start"]).reset_index(drop=True)
    )
    sums = rollup_native_sum(
        prepared.where(F.col("agg_func") == "SUM"),
        freq_seconds=tier.seconds, session_col="session_id",
    )
    avgs = rollup_native_avg(
        prepared.where(F.col("agg_func") == "AVG"),
        freq_seconds=tier.seconds, session_col="session_id",
    )
    separate = (
        sums.unionByName(avgs)
        .toPandas().sort_values(["url", "start"]).reset_index(drop=True)
    )
    assert len(combined) == len(separate)
    assert (combined["url"].to_numpy() == separate["url"].to_numpy()).all()
    assert (combined["start"].to_numpy() == separate["start"].to_numpy()).all()
    np.testing.assert_array_equal(
        combined["value"].to_numpy(), separate["value"].to_numpy()
    )
