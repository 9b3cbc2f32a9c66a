"""timeseries_harmonizer_spark — a PySpark-native time-series rollup,
downsample and retention engine.

Brand-new engine (NOT a port) with the query/data-processing capabilities of
nuuuria/timeseries_harmonizer (reference at /root/reference), re-expressed
Spark-first over web-page crawl series: each ``url`` is a device series keyed
by ``warc_ts``; per-series cleaning, gap-splitting, resample/rollup to
retention tiers (1m/1h/1d + P1W/P1M calendar), formula evaluation (vectorized
across devices), compression payloads and a
checkpoint manifest — all as DataFrame plans optimized by Catalyst, with
vectorized Arrow UDFs only where the semantics genuinely require per-series
sequential state.
"""

from timeseries_harmonizer_spark.session import get_spark  # noqa: F401
from timeseries_harmonizer_spark.config import TIERS, TierConfig  # noqa: F401

__version__ = "0.1.0"
