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
