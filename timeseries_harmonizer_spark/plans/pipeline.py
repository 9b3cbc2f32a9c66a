"""End-to-end tier pipeline (SURVEY.md §3 lifecycle, Spark-first).

scan -> extract -> dedup -> enrich (broadcast registry) -> unit convert ->
sessionize -> clean -> rollup -> shape points -> write tier payloads.

Stage boundaries are Catalyst's; the explicit knobs are the bucket-hash
repartition before the per-series stages (the storage analog of the
reference's ``bucket = (ts // TS_BUCKETS) % BUCKETS``, lib/__init__.py:140)
and sessionization, which bounds per-group state for the Arrow stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from timeseries_harmonizer_spark.config import (
    EXACT_CHUNK_WINDOWS,
    N_BUCKETS,
    TIERS,
    VALUE_ROUND,
    TierConfig,
)
from timeseries_harmonizer_spark.functions.extract import extract_text
from timeseries_harmonizer_spark.operators.cleaning import unit_convert
from timeseries_harmonizer_spark.operators.dedup import keep_last, keep_last_sorted
from timeseries_harmonizer_spark.operators.rollup import (
    continuous_aggregate,
    rollup_exact_chunked,
    rollup_native_last,
    rollup_native_sum_avg,
)
from timeseries_harmonizer_spark.operators.sessionize import sessionize


def bucket_repartition(df: DataFrame, key: str = "url", n_buckets: int = N_BUCKETS) -> DataFrame:
    """Explicit bucket-hash repartitioning: co-locates every row of a series
    (and everything downstream keyed on it) in one shuffle."""
    return df.repartition(n_buckets, F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)))


def prepare(
    pages: DataFrame,
    registry: DataFrame,
    tier: TierConfig,
    use_extracted_text: bool = True,
) -> DataFrame:
    """scan -> extract -> prune -> ONE shuffle -> dedup -> enrich ->
    convert -> sessionize.

    Shuffle discipline (the 100 TB argument): the html binary never crosses
    a shuffle — extraction and column pruning happen map-side on the scan,
    so the single url-hash exchange carries only (url, ts, ingest_pos,
    value, lang). Dedup is a sorted-lag over the url partition (not a
    (url, ts)-keyed window), the registry join is broadcast, and every
    downstream per-series window / groupBy(url, ...) reuses the same
    partitioning via the subset rule — zero additional exchanges through
    rollup and payload aggregation.
    """
    df = pages
    if use_extracted_text:
        df = df.withColumn("text", extract_text(F.col("html")))
    df = df.withColumn("value", F.length("text").cast("double"))
    df = df.select("url", "warc_ts", "ingest_pos", "value", "lang")
    # the one exchange. r6: its WIDTH follows the session's shuffle-partition
    # setting (scale-adaptive: SPARK_GRAFT_SHUFFLE/cluster profile) instead
    # of the storage constant N_BUCKETS — on the 32-core bench host 64-wide
    # stages ran every window in two half-empty task waves (~10% of the
    # pass). The storage bucket ID (pmod(xxhash64(url), N_BUCKETS) in
    # shape_points) is a data VALUE and keeps N_BUCKETS regardless.
    width = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    df = df.repartition(width, "url")
    df = keep_last_sorted(df, key="url", ts_col="warc_ts", order_col="ingest_pos")
    df = df.join(F.broadcast(registry), "url", "inner")  # J1
    df = unit_convert(df)
    # P12: NaN drop at the stage boundary (reference harmonizers/__init__.py:347)
    # BEFORE sessionization, so null rows never define session boundaries.
    df = df.where(F.col("value").isNotNull())
    df = sessionize(df, key="url", ts_col="warc_ts", gap_seconds=tier.gap_seconds)
    return df


def rollup_points(
    prepared: DataFrame,
    tier: TierConfig,
    exact: bool = False,
) -> DataFrame:
    """Per-series rollup at the tier frequency, honoring each series'
    aggregation function; exact=True uses the reference-replay Arrow path,
    else the closed-form native path (same semantics, see operators.rollup).

    The exact path is always *chunked* (rollup_exact_chunked): Arrow group
    memory is bounded by chunk span even for gapless series — the 1d tier has
    gap_seconds=None, so without chunking one hot url would materialize its
    entire history as a single 1s grid (the reference's memory hazard at
    lib2/__init__.py:30). SUM/AVG windows that pass the completeness gate
    always contain real observations -> is_real=True; LAST uses the native
    operator, which derives is_real per window (LOCF fills are False)."""
    if exact:
        sums = rollup_exact_chunked(
            prepared.where(F.col("agg_func") == "SUM"),
            agg_func="SUM",
            freq_seconds=tier.seconds,
            session_col="session_id",
            chunk_windows=EXACT_CHUNK_WINDOWS,
        ).withColumn("is_real", F.lit(True))
        avgs = rollup_exact_chunked(
            prepared.where(F.col("agg_func") == "AVG"),
            agg_func="AVG",
            freq_seconds=tier.seconds,
            session_col="session_id",
            chunk_windows=EXACT_CHUNK_WINDOWS,
        ).withColumn("is_real", F.lit(True))
        lasts = rollup_native_last(
            prepared.where(F.col("agg_func") == "LAST"),
            freq_seconds=tier.seconds,
            session_col="session_id",
        )
        return sums.unionByName(avgs).unionByName(lasts)
    # r6: SUM and AVG share one knots pass + merge aggregate instead of
    # filtering (and re-sorting) the cached frame once per branch — the
    # per-branch math in rollup_native_sum_avg is the separate operators'
    # verbatim (equality pinned by test_sum_avg_combined_equals_separate
    # and the oracle parity suite).
    sum_avgs = rollup_native_sum_avg(
        prepared.where(F.col("agg_func").isin("SUM", "AVG")),
        freq_seconds=tier.seconds,
        session_col="session_id",
    ).withColumn("is_real", F.lit(True))
    lasts = rollup_native_last(
        prepared.where(F.col("agg_func") == "LAST"),
        freq_seconds=tier.seconds,
        session_col="session_id",
    )
    return sum_avgs.unionByName(lasts)


def shape_points(
    points: DataFrame, registry: DataFrame, tier: TierConfig
) -> DataFrame:
    """S9: the harmonized point record (reference lib/__init__.py:133-166):
    end = start + freq - 1s, value round(5), series hash + property from the
    registry, storage bucket id."""
    from timeseries_harmonizer_spark.functions.extract import (
        strip_property_namespace,
    )

    out = points.join(F.broadcast(registry.select("url", "series_hash", "property")), "url")
    return out.select(
        F.col("url"),
        F.col("series_hash"),
        # P8: URI -> ontology local name (idempotent for bare names)
        strip_property_namespace(F.col("property")).alias("property"),
        F.lit(tier.name).alias("tier"),
        F.col("start"),
        (F.col("start") + F.expr(f"INTERVAL {tier.seconds - 1} SECONDS")).alias("end"),
        F.round(F.col("value"), VALUE_ROUND).alias("value"),
        F.col("is_real"),
        F.pmod(F.xxhash64(F.col("url")), F.lit(N_BUCKETS)).cast("int").alias("bucket"),
    )


def tier_payloads(prepared: DataFrame, tier: TierConfig) -> DataFrame:
    """North-star continuous aggregate per (url, tier window)."""
    return continuous_aggregate(prepared, freq_seconds=tier.seconds).withColumn(
        "tier", F.lit(tier.name)
    )


def run_tier(
    pages: DataFrame,
    registry: DataFrame,
    tier_name: str = "1h",
    exact: bool = False,
    persist: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Full plan for one tier: returns (points, tier_payloads).

    ``prepared`` feeds four consumers (SUM/AVG/LAST rollup branches +
    payloads); persisting it turns 4 recomputations of
    scan->extract->dedup->join->sessionize into one (the extract UDF and the
    dedup shuffle are the expensive part — this is the analog of the
    reference writing the cleaned series once per run)."""
    tier = TIERS[tier_name]
    if tier.calendar:
        raise ValueError(
            f"tier {tier.name!r} has calendar windows: raw 1s-gated rollup is "
            "undefined for variable-length windows (the reference's "
            "pd.Timedelta('P1M') raises too, lib2/__init__.py:33). Calendar "
            "tiers are fed by the retention sweep (downsample from '1d'), "
            "rollup_native_last, or the formula engine."
        )
    prepared = prepare(pages, registry, tier)
    # r6: persist only the columns the rollup/payload consumers read.
    # prepare's output still carries the full registry enrichment
    # (series_hash 64-char strings, conversion factors, max_power) — caching
    # those builds and stores ~2x the bytes for columns no consumer of
    # `prepared` touches (shape_points re-joins the broadcast registry for
    # the point record). Guide §2.3: narrower rows, cheaper materialization.
    prepared = prepared.select(
        "url", "warc_ts", "value", "lang", "agg_func", "session_id"
    )
    if persist:
        prepared = prepared.persist()
    pts = shape_points(rollup_points(prepared, tier, exact=exact), registry, tier)
    payloads = tier_payloads(prepared, tier)
    return pts, payloads


def run_postprocessors(
    points: DataFrame,
    registry: DataFrame,
    tier_name: str = "1h",
    processors=None,
) -> dict[str, DataFrame]:
    """K4: run every registered :class:`PostProcessor` plugin over the
    tier's points (reference launcher invoking Processor.get_devices /
    process_device per post-process module). Each processor sees only the
    points of the systems it claims (broadcast semi-join on the registry
    dimension) and returns its update-only repair rows; results are keyed
    by processor name. New processors participate by registration alone —
    this function never changes."""
    from timeseries_harmonizer_spark.operators.postprocess import (
        registered_postprocessors,
    )

    out: dict[str, DataFrame] = {}
    for proc in processors if processors is not None else registered_postprocessors():
        systems = proc.get_systems(registry, tier_name)
        claimed = points.join(
            F.broadcast(systems.select("url").distinct()), "url", "left_semi"
        )
        out[proc.name] = proc.process(claimed, systems, tier_name)
    return out
