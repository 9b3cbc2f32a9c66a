"""Compressed tier-payload stage: points -> per-(series, day-chunk) blobs
and back.

The analog of the reference's output record batching (Kafka chunks of 500,
reference lib2/__init__.py:54-61) re-designed for columnar storage: each
(series, tier, UTC-day) chunk stores its window starts as a delta-of-delta
blob and its values as a Gorilla-XOR blob (functions/compression.py), plus
uncompressed min/max/sum/count so coarse-tier downsampling and range
pruning never decode blobs. Chunking by day bounds blob size (<= 1440
points at the 1m tier) regardless of series length — a hot url never
produces an unbounded group.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from timeseries_harmonizer_spark.functions import compression as C

PAYLOAD_SCHEMA = (
    "url string, tier string, chunk_start timestamp, n long, "
    "vmin double, vmax double, vsum double, "
    "ts_blob binary, val_blob binary"
)


def compress_points(
    points: DataFrame,
    tier_name: str,
    key: str = "url",
    start_col: str = "start",
    value: str = "value",
    chunk_seconds: int = 86400,
) -> DataFrame:
    """points (key, start, value) -> compressed per-day payload rows."""
    src = points.select(
        F.col(key).alias("url"),
        F.col(start_col).alias("start"),
        F.col(value).alias("value"),
        (F.floor(F.unix_timestamp(F.col(start_col)) / chunk_seconds) * chunk_seconds)
        .alias("chunk_s"),
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("start")
        ts = (pdf["start"].astype("int64") // 10**9).to_numpy()
        vals = pdf["value"].to_numpy(dtype="float64")
        return pd.DataFrame(
            {
                "url": [pdf["url"].iloc[0]],
                "tier": [tier_name],
                "chunk_start": [pd.Timestamp(int(pdf["chunk_s"].iloc[0]), unit="s")],
                "n": [len(pdf)],
                "vmin": [float(pd.Series(vals).min())],
                "vmax": [float(pd.Series(vals).max())],
                "vsum": [float(pd.Series(vals).sum())],
                "ts_blob": [C.encode_timestamps(ts)],
                "val_blob": [C.encode_floats(vals)],
            }
        )

    return src.groupBy("url", "chunk_s").applyInPandas(fn, PAYLOAD_SCHEMA)


def decompress_points(payloads: DataFrame) -> DataFrame:
    """Inverse: payload rows -> (url, tier, start, value) points."""
    out_schema = "url string, tier string, start timestamp, value double"

    def fn(it):
        for pdf in it:
            frames = []
            for row in pdf.itertuples(index=False):
                ts = C.decode_timestamps(bytes(row.ts_blob))
                vals = C.decode_floats(bytes(row.val_blob))
                frames.append(
                    pd.DataFrame(
                        {
                            "url": row.url,
                            "tier": row.tier,
                            "start": pd.to_datetime(ts, unit="s"),
                            "value": vals,
                        }
                    )
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                columns=["url", "tier", "start", "value"]
            )

    return payloads.mapInPandas(fn, out_schema)
