"""Deterministic synthetic ``web_pages`` source + ``registry`` dimension.

The engine's primary input per BASELINE.json.input_hint:
``web_pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING,
lang STRING)`` — each url is a device series keyed by warc_ts (the analog of
the reference's HBase row key ``{uri}~{epoch}``, reference
lib2/__init__.py:7-8). No external data: everything is generated from seeded
hashes with *Spark expressions only*, so generation itself distributes and
the same (seed, shape) is bit-identical at any parallelism.

Injected hazards (FIXTURES.md §A):
- Zipf-ish hot domains (exercises hot-key/skew handling),
- duplicate (url, warc_ts) rows with different payloads — scan-order last
  must win (reference keep-last dedup, harmonizers/__init__.py:350),
- session gaps > 2h (reference gap split, harmonizers/__init__.py:363-364),
- out-of-order ingest (reference sorts, harmonizers/__init__.py:347),
- malformed html whose extraction yields NULL text (the reference's
  ValueError -> NaN behavior, harmonizers/sources/bacnet.py:26-30).

``ingest_pos`` defines scan order (the keep-last tiebreak); ``text`` holds
the *expected* extraction of ``html`` (ground truth for the byte-identical
per-row invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

VOCAB = [
    "crawl", "index", "spark", "window", "rollup", "series", "tier", "gap",
    "merge", "shard", "bucket", "stream", "batch", "vector", "token", "page",
    "query", "table", "delta", "gorilla", "codec", "retention", "sweep",
    "manifest", "lineage", "watermark", "session", "harmonize", "interp",
    "locf", "float", "epoch", "domain", "anchor", "header", "body",
]

LANGS = ["en", "es", "de", "fr", "zh", "ja", "pt", "it", "ru", "nl", "pl", "ko"]

START_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def _vocab_array():
    return F.array(*[F.lit(w) for w in VOCAB])


def _langs_array():
    return F.array(*[F.lit(c) for c in LANGS])


def _h(*cols) -> F.Column:
    """Seeded 64-bit hash of the given columns/literals (non-negative)."""
    return F.abs(F.xxhash64(*[c if hasattr(c, "cast") else F.lit(c) for c in cols]))


def web_pages(
    spark: SparkSession,
    n_urls: int = 100,
    points_per_url: int = 200,
    n_domains: int = 20,
    seed: int = 42,
    dup_fraction_denom: int = 23,
    malformed_denom: int = 29,
    gap_denom: int = 41,
) -> DataFrame:
    """Build the synthetic web_pages DataFrame (not yet deduped/ordered).

    Columns: url, warc_ts, html(binary), text (expected extraction; NULL for
    malformed rows), lang, ingest_pos (scan order), value (len(text) —
    the rollup measure), url_idx (generator-internal, kept for tests).
    """
    n = n_urls * points_per_url
    df = spark.range(n).select(
        (F.col("id") / points_per_url).cast("long").alias("url_idx"),
        (F.col("id") % points_per_url).alias("i"),
        F.col("id"),
    )

    # Zipf-ish domain skew: cube a uniform [0,1) so low domain ids are hot.
    u = (_h("d", seed, F.col("url_idx")) % 100000) / 100000.0
    domain_idx = F.floor(F.lit(n_domains) * F.pow(u, F.lit(3.0)))
    df = df.withColumn("domain_idx", domain_idx)
    df = df.withColumn(
        "url",
        F.concat(
            F.lit("https://d"),
            F.col("domain_idx").cast("string"),
            F.lit(".example.com/p"),
            F.col("url_idx").cast("string"),
        ),
    )

    # Irregular arrival cadence per url in {30s, 5m, 1h} + jitter + rare
    # multi-hour gaps; cumulative sum per url gives the timeline.
    cadence = F.element_at(
        F.array(F.lit(30), F.lit(300), F.lit(3600)),
        (_h("c", seed, F.col("url_idx")) % 3 + 1).cast("int"),
    )
    jitter = _h("j", seed, F.col("id")) % (cadence / 2).cast("long")
    gap = F.when(
        (_h("g", seed, F.col("id")) % gap_denom) == 0,
        F.lit(6 * 3600) + (_h("g2", seed, F.col("id")) % 7200),
    ).otherwise(F.lit(0))
    step = F.greatest(cadence + jitter - (cadence / 4).cast("long") + gap, F.lit(1))
    df = df.withColumn("step", step)
    from pyspark.sql import Window as W

    df = df.withColumn(
        "ts_s",
        F.lit(START_EPOCH)
        + F.sum("step").over(
            W.partitionBy("url_idx").orderBy("i").rowsBetween(W.unboundedPreceding, 0)
        ),
    ).withColumn("warc_ts", F.timestamp_seconds(F.col("ts_s")))

    df = _payload_cols(df, seed, rev=0)

    # Duplicate rows: same (url, warc_ts), different payload, later ingest.
    dups = df.where(_h("u", seed, F.col("id")) % dup_fraction_denom == 0)
    dups = _payload_cols(
        dups.drop("text", "lang", "html", "malformed", "n_words"), seed, rev=1
    )
    df = df.unionByName(dups.withColumn("rev", F.lit(1)), allowMissingColumns=True)
    df = df.withColumn("rev", F.coalesce(F.col("rev"), F.lit(0)))

    # malformed html -> expected extraction is NULL
    malformed_mask = (_h("m", seed, F.col("id"), F.col("rev")) % malformed_denom) == 0
    df = df.withColumn("malformed", malformed_mask)
    html_str = F.concat(
        F.lit("<html><head><title>"),
        F.col("url"),
        F.lit("</title></head><body><p>"),
        F.col("text"),
        F.lit("</p></body></html>"),
    )
    df = df.withColumn(
        "html",
        F.encode(
            F.when(
                F.col("malformed"),
                F.substring(html_str, 1, 40),
            ).otherwise(html_str),
            "UTF-8",
        ),
    )
    df = df.withColumn("text", F.when(F.col("malformed"), F.lit(None)).otherwise(F.col("text")))

    # Scan order: a seeded permutation -> ingestion is out-of-time-order.
    # Dups get strictly-later ingest positions than every base row so
    # "scan-order last wins" is deterministic.
    df = df.withColumn(
        "ingest_pos",
        F.when(F.col("rev") == 0, _h("o", seed, F.col("id")) % (1 << 40)).otherwise(
            F.lit(1 << 40) + (_h("o2", seed, F.col("id")) % (1 << 40))
        ),
    )

    df = df.withColumn("value", F.length("text").cast("double"))
    # Deterministic url_idx-hash spread over 2x task slots: the generator's
    # natural output partitioning (an AQE-coalesced window exchange) lands
    # in a handful of large files, which caps the SCAN parallelism of every
    # downstream pass over the materialized table (8 tasks on 32 cores at
    # bench sizing). Rows are unchanged — only their file placement.
    df = df.repartition(
        spark.sparkContext.defaultParallelism * 2, F.col("url_idx")
    )
    return df.select(
        "url", "warc_ts", "html", "text", "lang", "ingest_pos", "value", "url_idx"
    )


def _payload_cols(df: DataFrame, seed: int, rev: int) -> DataFrame:
    """Deterministic text/lang payload as pure Spark expressions."""
    n_words = (_h("n", seed, rev, F.col("id")) % 40 + 3).cast("int")
    vocab = _vocab_array()
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda k: F.element_at(
            vocab, (_h("w", seed, rev, F.col("id"), k) % len(VOCAB) + 1).cast("int")
        ),
    )
    text = F.array_join(words, " ")
    lang = F.element_at(
        _langs_array(),
        (
            (_h("l", seed, F.col("id")) % 3 + F.col("domain_idx") * 5) % len(LANGS) + 1
        ).cast("int"),
    )
    return df.withColumn("n_words", n_words).withColumn("text", text).withColumn(
        "lang", lang
    )


def registry(spark: SparkSession, web_pages_df: DataFrame, seed: int = 42) -> DataFrame:
    """Synthetic metadata dimension — analog of the Neo4j device registry
    (reference harmonizers/sources/dexma.py:4-24), FIXTURES.md §C.

    One row per url (a few urls deliberately absent; some NULL conversion
    ratios to exercise coalesce defaults, reference lib2/__init__.py:45-51).
    Broadcast-joined to the fact side (J1).
    """
    urls = web_pages_df.select("url").distinct()
    h = _h("r", seed, F.col("url"))
    out = urls.select(
        F.col("url"),
        F.sha2(F.col("url"), 256).alias("series_hash"),
        F.element_at(
            F.array(
                F.lit("EnergyConsumptionGridElectricity"),
                F.lit("EnergyGeneration"),
                F.lit("Temperature"),
                F.lit("Status"),
            ),
            (h % 4 + 1).cast("int"),
        ).alias("property"),
        F.element_at(
            F.array(F.lit("SUM"), F.lit("AVG"), F.lit("LAST")), (h % 3 + 1).cast("int")
        ).alias("agg_func"),
        F.when(h % 7 == 0, F.lit(None)).otherwise(1.0 + (h % 5) / 10.0).alias("raw_conv_ratio"),
        F.when(h % 11 == 0, F.lit(None)).otherwise((h % 3) / 10.0).alias("raw_conv_offset"),
        F.lit(1.0).alias("harm_conv_ratio"),
        F.lit(0.0).alias("harm_conv_offset"),
        F.when(h % 13 == 0, F.lit(500.0)).otherwise(F.lit(10000.0)).alias("max_power"),
    )
    # leave ~3% of urls unregistered (left-anti coverage in tests)
    return out.where(h % 31 != 0)
