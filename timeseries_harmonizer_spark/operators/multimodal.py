"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched mapInPandas stages.

The decode step is STUBBED (image/audio codecs aren't in this container):
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic fake decoder (seeded from the bytes) produces
shape-correct outputs — the Spark-side plumbing (schema, batching,
partition sizing) is real and tested either way.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, width int, height int, duration_s double, "
    "payload binary"
)


def synthetic_media(spark, n: int = 64, seed: int = 5) -> DataFrame:
    """Deterministic opaque binary payloads + typed metadata.

    Every column derives from the portable md5-based 64-bit hash family
    (functions/hashing.py) so an external engine (DuckDB
    ``md5_number_lower``) can recompute the metadata and the payload bytes
    exactly — which is what lets the q38 gate value-check this pipeline."""
    from timeseries_harmonizer_spark.functions.hashing import md5_lower64_masked

    sid = F.col("id").cast("string")
    h = lambda tag: md5_lower64_masked(F.concat(F.lit(f"{tag}{seed}:"), sid))
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(h("k"), 3) + 1).cast("int"),
        ).alias("kind"),
        (F.pmod(h("w"), 64) + 16).cast("int").alias("width"),
        (F.pmod(h("h"), 64) + 16).cast("int").alias("height"),
        (F.pmod(h("d"), 300) / 10.0).alias("duration_s"),
        F.encode(
            F.repeat(F.sha2(F.concat(F.lit("m"), sid), 256), 4),
            "UTF-8",
        ).alias("payload"),
    )


def decode_image(payload: bytes, width: int, height: int, fake: bool = False) -> np.ndarray:
    """STUB: real image decoding needs codecs absent from this container."""
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True for "
            "the deterministic fake decoder"
        )
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**31)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def extract_features(
    media: DataFrame, fake_decode: bool = True, batch_hint: int = 1024
) -> DataFrame:
    """Decode -> feature-extract per batch: mean/std per channel + a byte
    histogram sketch of the raw payload. Vectorized inside each Arrow batch;
    output schema is fixed and typed."""
    out_schema = (
        "media_id long, kind string, mean_r double, mean_g double, mean_b double, "
        "byte_entropy double"
    )

    def fn(it):
        for pdf in it:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(
                    columns=["media_id", "kind", "mean_r", "mean_g", "mean_b", "byte_entropy"]
                )
                continue
            payloads = [bytes(p) for p in pdf["payload"]]
            # byte entropy, vectorized across the whole batch: one flat
            # buffer, per-item segment ids, a single 2-D bincount
            lens = np.array([len(p) for p in payloads], dtype=np.int64)
            flat = np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(np.int64)
            seg = np.repeat(np.arange(n, dtype=np.int64), lens)
            counts = np.bincount(seg * 256 + flat, minlength=n * 256).reshape(n, 256)
            probs = counts / np.clip(counts.sum(axis=1, keepdims=True), 1, None)
            with np.errstate(divide="ignore", invalid="ignore"):
                ent = -np.where(probs > 0, probs * np.log2(np.where(probs > 0, probs, 1.0)), 0.0).sum(axis=1)
            # decode is the codec boundary — one library call per item (as a
            # real image decoder would be); the per-channel means reduce each
            # decoded array in numpy
            means = np.stack(
                [
                    decode_image(p, w, h, fake=fake_decode).reshape(-1, 3).mean(axis=0)
                    for p, w, h in zip(payloads, pdf["width"], pdf["height"])
                ]
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "mean_r": means[:, 0],
                    "mean_g": means[:, 1],
                    "mean_b": means[:, 2],
                    "byte_entropy": np.round(ent, 6),
                }
            )

    return media.mapInPandas(fn, out_schema)


def frame_sample(media: DataFrame, every_bytes: int = 32) -> DataFrame:
    """Frame-sampling analog: slice every Nth byte window of the payload as
    a 'frame'. Pure Column ops (substring over binary)."""
    n_frames = F.floor(F.length("payload") / every_bytes).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
    frames = F.transform(
        idx, lambda i: F.substring(F.col("payload"), i * every_bytes + 1, every_bytes)
    )
    return media.select(
        "media_id", "kind", F.posexplode(frames).alias("frame_no", "frame_bytes")
    )
