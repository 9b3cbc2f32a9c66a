"""Chunked exact-replay rollup (bounded Arrow groups / time-salting) must be
value-identical to the unchunked replay."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from timeseries_harmonizer_spark.config import TIERS
from timeseries_harmonizer_spark.operators.rollup import rollup_exact, rollup_exact_chunked
from timeseries_harmonizer_spark.plans import pipeline


@pytest.mark.parametrize("agg", ["SUM", "AVG"])
def test_chunked_equals_unchunked(spark, pages, reg, agg):
    tier = TIERS["1h"]
    prepared = pipeline.prepare(pages, reg, tier).where(F.col("agg_func") == agg)
    base = (
        rollup_exact(prepared, freq_seconds=tier.seconds, session_col="session_id")
        .toPandas()
        .sort_values(["url", "start"])
        .reset_index(drop=True)
    )
    chunked = (
        rollup_exact_chunked(
            prepared,
            agg_func=agg,
            freq_seconds=tier.seconds,
            session_col="session_id",
            chunk_windows=3,  # aggressively small chunks to stress boundaries
        )
        .toPandas()
        .sort_values(["url", "start"])
        .reset_index(drop=True)
    )
    assert len(base) == len(chunked), (len(base), len(chunked))
    assert (base["url"].to_numpy() == chunked["url"].to_numpy()).all()
    assert (base["start"].to_numpy() == chunked["start"].to_numpy()).all()
    np.testing.assert_allclose(
        chunked["value"].to_numpy(), base["value"].to_numpy(), rtol=0, atol=1e-9
    )


def test_hot_series_chunked(spark):
    """Skew demonstration: one pathological hot url (50k points, one
    session) — the chunked path splits it into bounded Arrow groups and
    still matches the closed-form native path post-round."""
    import pandas as pd
    import numpy as np
    from timeseries_harmonizer_spark.operators.rollup import rollup_native_avg

    n = 50_000
    rng = np.random.default_rng(11)
    idx = pd.to_datetime(1704067200 + np.cumsum(rng.integers(20, 90, n)), unit="s")
    pdf = pd.DataFrame({"url": "hot", "warc_ts": idx, "value": rng.normal(100, 3, n)})
    df = spark.createDataFrame(pdf)
    chunked = (
        rollup_exact_chunked(
            df, agg_func="AVG", freq_seconds=3600, session_col=None, chunk_windows=6
        )
        .toPandas()
        .sort_values("start")
        .reset_index(drop=True)
    )
    native = (
        rollup_native_avg(df, freq_seconds=3600, session_col=None)
        .toPandas()
        .sort_values("start")
        .reset_index(drop=True)
    )
    assert len(chunked) == len(native) > 100
    np.testing.assert_allclose(
        chunked["value"].to_numpy(), native["value"].to_numpy(), rtol=0, atol=1e-6
    )
