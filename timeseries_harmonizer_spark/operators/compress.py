"""Compressed tier-payload stage: points -> per-(series, day-chunk) blobs
and back.

The analog of the reference's output record batching (Kafka chunks of 500,
reference lib2/__init__.py:54-61) re-designed for columnar storage: each
(series, tier, UTC-day) chunk stores its window starts as a delta-of-delta
blob and its values as a Gorilla-XOR blob (functions/compression.py), plus
uncompressed min/max/sum so coarse-tier downsampling and range pruning never
decode blobs. Chunking by day bounds blob size (<= 1440 points at the 1m
tier) regardless of series length — a hot url never produces an unbounded
group.

Execution shape: ``mapInPandas`` over url-partitioned, (url, chunk, start)-
sorted data — one Python call per Arrow batch, group slicing vectorized
with numpy inside the batch (an ``applyInPandas`` per (url, day) group paid
~7 ms of per-group overhead x O(urls x days) tiny groups — 20x slower).
Groups split across Arrow batch boundaries are carried over in a buffer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from timeseries_harmonizer_spark.functions import compression as C

PAYLOAD_SCHEMA = (
    "url string, tier string, chunk_start timestamp, n long, "
    "vmin double, vmax double, vsum double, "
    "ts_blob binary, val_blob binary"
)


def _encode_groups(pdf: pd.DataFrame, tier_name: str) -> pd.DataFrame:
    """pdf sorted by (url, chunk_s, start): one payload row per (url, chunk).

    Whole-batch vectorized: group stats come from ufunc.reduceat and BOTH
    blob streams are encoded in one pass over the batch
    (encode_*_grouped), so per-group work is a byte-slice — not two numpy
    encoder invocations per tiny (series, day) group (which dominated the
    stage at ~100 us x O(series x days) calls)."""
    urls = pdf["url"].to_numpy()
    chunks = pdf["chunk_s"].to_numpy()
    change = np.empty(len(pdf), dtype=bool)
    change[0] = True
    change[1:] = (urls[1:] != urls[:-1]) | (chunks[1:] != chunks[:-1])
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(pdf))
    ts_all = pdf["start"].astype("int64").to_numpy() // 10**9
    v_all = pdf["value"].to_numpy(dtype="float64")
    return pd.DataFrame(
        {
            "url": urls[starts],
            "tier": tier_name,
            "chunk_start": pd.to_datetime(chunks[starts].astype("int64"), unit="s"),
            "n": ends - starts,
            # fmin/fmax reduceat = nanmin/nanmax per group (NaN only if all-NaN)
            "vmin": np.fmin.reduceat(v_all, starts),
            "vmax": np.fmax.reduceat(v_all, starts),
            "vsum": np.add.reduceat(np.nan_to_num(v_all, nan=0.0), starts),
            "ts_blob": C.encode_timestamps_grouped(ts_all, starts, ends),
            "val_blob": C.encode_floats_grouped(v_all, starts, ends),
        }
    )


def compress_points(
    points: DataFrame,
    tier_name: str,
    key: str = "url",
    start_col: str = "start",
    value: str = "value",
    chunk_seconds: int = 86400,
    partitions: int | None = None,
) -> DataFrame:
    """points (key, start, value) -> compressed per-day payload rows."""
    src = points.select(
        F.col(key).alias("url"),
        F.col(start_col).alias("start"),
        F.col(value).alias("value"),
        (F.floor(F.unix_timestamp(F.col(start_col)) / chunk_seconds) * chunk_seconds)
        .alias("chunk_s"),
    )
    if partitions is None:
        # r6: scale-adaptive default — ride the session's shuffle-partition
        # setting (itself sized to the core count / cluster profile) instead
        # of a hard-coded 64; fewer, fuller output files and one task wave
        # on the local bench, config-driven width on a cluster.
        partitions = int(
            points.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    src = src.repartition(partitions, "url").sortWithinPartitions(
        "url", "chunk_s", "start"
    )

    def fn(it):
        buf: pd.DataFrame | None = None
        for pdf in it:
            if buf is not None and len(buf):
                pdf = pd.concat([buf, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # hold back the final (url, chunk) group — it may continue in
            # the next Arrow batch
            last_url = pdf["url"].iloc[-1]
            last_chunk = pdf["chunk_s"].iloc[-1]
            tail_mask = (pdf["url"] == last_url) & (pdf["chunk_s"] == last_chunk)
            head = pdf[~tail_mask]
            buf = pdf[tail_mask]
            if len(head):
                yield _encode_groups(head, tier_name)
        if buf is not None and len(buf):
            yield _encode_groups(buf, tier_name)

    return src.mapInPandas(fn, PAYLOAD_SCHEMA)


def decompress_points(payloads: DataFrame) -> DataFrame:
    """Inverse: payload rows -> (url, tier, start, value) points."""
    out_schema = "url string, tier string, start timestamp, value double"

    def fn(it):
        for pdf in it:
            if not len(pdf):
                continue
            # one decode call per blob (the codec boundary), but ONE output
            # frame per Arrow batch: repeat the per-blob keys by decoded
            # length instead of building a pandas frame per row (a frame per
            # tiny blob dominated this stage the same way per-group encoder
            # calls dominated the encode side)
            ts_parts = [C.decode_timestamps(bytes(b)) for b in pdf["ts_blob"]]
            val_parts = [C.decode_floats(bytes(b)) for b in pdf["val_blob"]]
            lens = np.array([len(t) for t in ts_parts], dtype=np.int64)
            yield pd.DataFrame(
                {
                    "url": np.repeat(pdf["url"].to_numpy(), lens),
                    "tier": np.repeat(pdf["tier"].to_numpy(), lens),
                    "start": pd.to_datetime(np.concatenate(ts_parts), unit="s"),
                    "value": np.concatenate(val_parts),
                }
            )

    return payloads.mapInPandas(fn, out_schema)
