"""Structured Streaming tier rollup (SURVEY.md §2.10).

The reference is micro-batch by cron: each run re-reads a trailing
``days_to_gather`` window and the store dedups last-write-wins — an
*effective* watermark of now - lookback (reference launcher_v2.py:22-28,
launcher.py:40-44). The streaming mode makes that native: file-source
readStream -> withWatermark(lookback) -> windowed continuous aggregate in
append mode -> parquet sink with checkpointing. Late rows inside the
watermark update their window before it finalizes; rows later than the
watermark are dropped instead of silently corrupting closed windows.

``trigger(availableNow=True)`` gives the cron-equivalent batch semantics
with exactly-once sink checkpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_pages_stream(
    spark: SparkSession, path: str, schema=None, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.format("parquet")
    if schema is None:
        schema = spark.read.parquet(path).schema
    reader = reader.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def streaming_continuous_aggregate(
    stream: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    value: str = "value",
    freq_seconds: int = 3600,
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Per-(key, tumbling window) crawl_count + value stats, watermarked.
    Pass watermark=None when the input stream already carries one (e.g.
    after streaming_keep_last) — Spark disallows redefining it."""
    win = F.window(F.col(ts_col), f"{freq_seconds} seconds")
    if watermark is not None:
        stream = stream.withWatermark(ts_col, watermark)
    return (
        stream.groupBy(F.col(key), win)
        .agg(
            F.count("*").alias("crawl_count"),
            F.min(value).alias("len_min"),
            F.max(value).alias("len_max"),
            F.avg(value).alias("len_avg"),
            F.sum(value).alias("len_sum"),
        )
        .select(
            key,
            F.col("window.start").alias("start"),
            "crawl_count",
            "len_min",
            "len_max",
            "len_avg",
            "len_sum",
        )
    )


def streaming_keep_last(
    stream: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    watermark: str = "2 hours",
    order_col: str | None = None,
) -> DataFrame:
    """Streaming D1 analog with two modes, chosen by ``order_col``:

    - ``order_col=None`` (default): drop duplicate (key, ts) observations
      as they arrive (dropDuplicatesWithinWatermark — bounded state).
      CAUTION — this keeps the FIRST arrival, which DIVERGES from the batch
      D1 semantics where the scan-order LAST payload wins: if replays carry
      AMENDED payloads, batch and streaming outputs disagree. It is correct
      (and cheapest) when re-sends are byte-identical, which is the
      reference's store-level idempotency model (launcher.py:40-44 re-read
      + overwrite of the same rows).
    - ``order_col='ingest_pos'``: true last-wins — a watermarked aggregate
      taking max_by(payload, order_col) per (key, ts). Matches batch
      keep_last exactly, at the cost of withholding each row until the
      watermark passes its event time (append-mode finalization). Use this
      when replays may amend payloads.
    """
    wm = stream.withWatermark(ts_col, watermark)
    if order_col is None:
        return wm.dropDuplicatesWithinWatermark([key, ts_col])
    payload = [c for c in stream.columns if c not in (key, ts_col, order_col)]
    return wm.groupBy(key, ts_col).agg(
        *[F.max_by(c, order_col).alias(c) for c in payload]
    )


def run_available_now(
    agg: DataFrame, out_path: str, checkpoint: str, output_mode: str = "append"
) -> None:
    """Drain everything currently available (cron-run equivalent), then stop."""
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
