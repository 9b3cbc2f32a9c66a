"""Time-series join operators Spark lacks natively.

asof_join — for every left row, attach the most recent right row with
right.ts <= left.ts within the same key (optionally within a staleness
tolerance). The classic backward as-of join (pandas merge_asof, DuckDB
ASOF JOIN; the reference does this implicitly whenever it aligns a
measurement to the latest stored value, e.g. the formula engine's ffill
alignment, reference lib2/calculate_formulas.py:183-190).

Spark-first plan: NO range join (a `l.ts >= r.ts` condition plans as a
BroadcastNestedLoopJoin, O(|L|x|R|)). Instead: tag both sides, union, and
LOCF the right side's payload over one (key, ts) sort — a single hash
exchange + window, linear in |L|+|R|, partitioned by key so it scales out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: list[str] | str | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Range (interval-containment) join: every (point, interval) pair with
    ``start <= point_ts <= end`` (and equal ``by`` keys).

    Spark-first plan: a raw ``ts BETWEEN start AND end`` condition plans as
    a BroadcastNestedLoopJoin, O(|P|x|I|). Instead each interval explodes
    into the coarse time buckets it overlaps, each point carries its single
    bucket, and the join is a plain equi-join on (by..., bucket) with the
    BETWEEN as a residual filter. Each qualifying pair matches in exactly
    one bucket (the point's), so no dedup is needed. Candidate blow-up is
    interval_length / bucket_seconds — pick bucket_seconds near the typical
    interval length."""
    by = [] if by is None else [by] if isinstance(by, str) else list(by)
    B = int(bucket_seconds)
    pts = points.withColumn(
        "__b", F.floor(F.unix_timestamp(F.col(point_ts)) / B)
    )
    iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / B),
                F.floor(F.unix_timestamp(F.col(end_col)) / B),
            )
        ),
    )
    joined = pts.join(iv, by + ["__b"]).where(
        F.col(point_ts).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("__b")


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    right_cols: list[str] | None,
    tolerance_seconds: int | None,
    suffix: str,
) -> DataFrame:
    """nearest-direction as-of: both LOCF scans (ascending = backward
    candidate, descending = forward candidate) over the SAME union and the
    same hash partitioning — one exchange, two window sorts — then pick the
    candidate with the smaller absolute gap (ties to backward, matching
    pandas merge_asof)."""
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(by) | {on}]
    tagged_r = right.select(
        *by,
        F.col(on).alias(on),
        F.struct(
            F.col(on).alias("__asof_ts"),
            *[F.col(c).alias(c) for c in right_cols],
        ).alias("__r_row"),
    ).withColumn("__is_left", F.lit(0))
    tagged_l = left.withColumn("__is_left", F.lit(1))
    u = tagged_l.unionByName(tagged_r, allowMissingColumns=True)
    wb = (
        W.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wf = (
        W.partitionBy(*by)
        .orderBy(F.col(on).desc(), F.col("__is_left").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    out = (
        u.withColumn("__bk", F.last("__r_row", ignorenulls=True).over(wb))
        .withColumn("__fw", F.last("__r_row", ignorenulls=True).over(wf))
    )
    gap_b = F.unix_timestamp(F.col(on)) - F.unix_timestamp(F.col("__bk.__asof_ts"))
    gap_f = F.unix_timestamp(F.col("__fw.__asof_ts")) - F.unix_timestamp(F.col(on))
    tol_ok = (
        (lambda g: F.lit(True))
        if tolerance_seconds is None
        else (lambda g: g <= F.lit(tolerance_seconds))
    )
    ok_b = F.col("__bk").isNotNull() & tol_ok(gap_b)
    ok_f = F.col("__fw").isNotNull() & tol_ok(gap_f)
    pick_b = ok_b & (~F.coalesce(ok_f, F.lit(False)) | (gap_b <= gap_f))
    carried = F.when(pick_b, F.col("__bk")).when(ok_f, F.col("__fw"))
    out = out.withColumn("__carried", carried)
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"__carried.{c}"))
    return out.where(F.col("__is_left") == 1).drop(
        "__is_left", "__r_row", "__bk", "__fw", "__carried"
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | str = "key",
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """As-of join (pandas merge_asof semantics, all three directions).
    Returns every left row plus, for each of ``right_cols``, the value from
    the matched right row in the same ``by`` group (NULL if none, or if the
    time gap exceeds ``tolerance_seconds``):

    - ``backward`` (default): latest right row with right.on <= left.on
    - ``forward``: earliest right row with right.on >= left.on
    - ``nearest``: whichever of the two is closer in time (merge_asof
      resolves exact-distance ties to the backward row — so do we)

    Equal timestamps count as matches in every direction. Each direction is
    one hash exchange + window scan (nearest: one exchange, two window
    sorts), never a nested-loop range join."""
    if direction == "nearest":
        return _asof_nearest(
            left, right, on, by, right_cols, tolerance_seconds, suffix
        )
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    by = [by] if isinstance(by, str) else list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(by) | {on}]
    # Carry the WHOLE right row as one struct so every projected value and
    # the freshness verdict come from the SAME (latest) right row. LOCFing
    # each payload column independently would substitute a stale value from
    # an older row whenever the latest row has a NULL in that column (pandas
    # merge_asof / DuckDB ASOF return the NULL), and could mix values from
    # different right rows.
    tagged_r = right.select(
        *by,
        F.col(on).alias(on),
        F.struct(
            F.col(on).alias("__asof_ts"),
            *[F.col(c).alias(c) for c in right_cols],
        ).alias("__r_row"),
    ).withColumn("__is_left", F.lit(0))
    tagged_l = left.withColumn("__is_left", F.lit(1))
    u = tagged_l.unionByName(tagged_r, allowMissingColumns=True)
    # right rows sort before left rows at equal ts, so an equal-ts right row
    # is visible to the left row's LOCF frame; the struct is non-null on
    # every right row (even all-NULL payloads), so ignorenulls skips exactly
    # the left rows. Forward direction = the same scan over descending ts.
    ts_order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        W.partitionBy(*by)
        .orderBy(ts_order, F.col("__is_left").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    out = u.withColumn("__carried", F.last("__r_row", ignorenulls=True).over(w))
    gap = F.unix_timestamp(F.col(on)) - F.unix_timestamp(F.col("__carried.__asof_ts"))
    if direction == "forward":
        gap = -gap
    fresh = (
        F.col("__carried").isNotNull()
        if tolerance_seconds is None
        else (gap <= F.lit(tolerance_seconds))
    )
    for c in right_cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(fresh, F.col(f"__carried.{c}")).otherwise(F.lit(None)),
        )
    return out.where(F.col("__is_left") == 1).drop(
        "__is_left", "__r_row", "__carried"
    )
