"""Dedup operators (SURVEY.md §2.3).

The reference's keep-last is pandas ``~index.duplicated(keep='last')`` after a
sort (reference harmonizers/__init__.py:347-350) — "last" meaning last in
*scan order* among equal timestamps. That is non-deterministic under
distributed scan, so the engine makes the tiebreak explicit: an
``ingest_pos`` (scan/arrival order) column, keep the max. Expressed as a
``row_number`` window so Catalyst plans a single hash-partition + sort —
no self-join, one shuffle on the series key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F


def keep_last(
    df: DataFrame,
    keys: Sequence[str] = ("url", "warc_ts"),
    order_col: str = "ingest_pos",
) -> DataFrame:
    """D1: keep the last row (by ``order_col``) per key tuple.

    Reference: sort + index.duplicated(keep='last'),
    harmonizers/__init__.py:347-350; launcher.py:170-172.
    """
    w = W.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def keep_last_sorted(
    df: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    order_col: str = "ingest_pos",
) -> DataFrame:
    """D1 keep-last per (key, ts) using ONE window over the key alone:
    within a key partition ordered by (ts asc, order desc), a row is the
    keep-last of its timestamp iff the previous row has a different ts.
    Same semantics as ``keep_last(keys=(key, ts))`` but the shuffle key is
    just ``key`` — so an upstream repartition(key) is reused, and every
    downstream per-series window/groupBy stays shuffle-free (subset rule).
    """
    w = W.partitionBy(key).orderBy(F.col(ts_col).asc(), F.col(order_col).desc())
    prev_ts = F.lag(ts_col).over(w)
    return (
        df.withColumn("__dup", prev_ts.isNotNull() & (prev_ts == F.col(ts_col)))
        .where(~F.col("__dup"))
        .drop("__dup")
    )


def keep_last_per_month(
    df: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    order_col: str = "ingest_pos",
) -> DataFrame:
    """D2: keep-last per calendar month (reference manttest.py:76-80)."""
    w = W.partitionBy(F.col(key), F.date_trunc("month", F.col(ts_col))).orderBy(
        F.col(order_col).desc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def last_write_wins(
    df: DataFrame,
    keys: Sequence[str] = ("series_hash", "start"),
    write_order_col: str = "snapshot_id",
) -> DataFrame:
    """D3: last-write-wins on read — the Druid ``LATEST("value")`` analog
    (reference launcher.py:40-44). Overlapping re-runs append newer
    snapshots; reads resolve to the newest write per point."""
    return keep_last(df, keys=keys, order_col=write_order_col)
