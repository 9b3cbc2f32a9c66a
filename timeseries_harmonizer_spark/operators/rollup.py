"""Rollup / resample operators — R1-R10 (SURVEY.md §2.5).

Two implementations of the reference's ``harmonize_irregular_data``
(reference lib2/__init__.py:26-42):

1. ``rollup_exact`` — Arrow-batched ``applyInPandas`` per (series, session)
   replaying the reference's 1s-grid resample + linear-interpolation
   semantics bit-for-bit (the parity path). Group size is bounded by
   sessionization, so the 1s materialization never exceeds one session span.

2. ``rollup_native`` — the scale path: a closed-form, pure-DataFrame
   derivation. Key observation: after placing each point at
   ``floor(ts, 1s)`` and linearly interpolating, the per-second increment is
   *constant within each inter-point segment* (slope = dv/ds). So the
   tier-window sum/count/mean are exact segment-overlap arithmetic — no 1s
   grid is ever materialized. Each segment explodes into only the tier
   windows it overlaps (len/F + 1 rows), then a single groupBy(key, window)
   merges. Mathematically identical to the replay; floating-point addition
   order differs, so parity tests compare post-round(5).

LAST (R3) is fully native: tumbling max_by + dense window grid + LOCF.

Also here: R6 downsample (tier -> coarser tier), R7 upsample (ffill +
sum-splitting), R8 dense reindex, and the north-star continuous aggregates
(crawl count, text-length min/max/avg/sum, lang distribution) for web_pages.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F

from timeseries_harmonizer_spark.functions import series_kernels as K


def _window_col(ts_seconds_or_col, freq: int | str, is_ts: bool = False):
    """Tumbling-window label for fixed (floor(ts/s)*s, long seconds) or
    calendar ('P1W'/'P1M' -> date_trunc, timestamp) frequencies. Calendar
    floors match the reference's isodate_floor
    (reference lib2/calculate_formulas.py:11-17)."""
    if freq == "P1M":
        c = ts_seconds_or_col if is_ts else F.timestamp_seconds(ts_seconds_or_col)
        return F.date_trunc("month", c)
    if freq == "P1W":
        c = ts_seconds_or_col if is_ts else F.timestamp_seconds(ts_seconds_or_col)
        return F.date_trunc("week", c)
    s = int(freq)
    sec = F.unix_timestamp(ts_seconds_or_col) if is_ts else ts_seconds_or_col
    return F.floor(sec / s) * s


def _calendar_interval(freq: str) -> str:
    return "interval 1 month" if freq == "P1M" else "interval 1 week"


# ---------------------------------------------------------------------------
# Exact replay (parity path)
# ---------------------------------------------------------------------------

def rollup_exact(
    df: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    value: str = "value",
    agg_func_col: str = "agg_func",
    freq_seconds: int = 3600,
    session_col: str | None = "session_id",
) -> DataFrame:
    """R1/R2/R3 via per-(key, session) pandas replay.

    Output: (key, start TIMESTAMP, value DOUBLE) — window label = window
    start, matching pandas resample's label='left'.
    """
    group_cols = [key] + ([session_col] if session_col else [])
    out_schema = f"{key} string, start timestamp, {value} double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col)
        s = pdf.set_index(ts_col)[value]
        s.index = pd.DatetimeIndex(s.index)
        agg = pdf[agg_func_col].iloc[0]
        res = K.harmonize(s, agg, freq_seconds)
        out = res.reset_index()
        out.columns = ["start", value]
        out[key] = pdf[key].iloc[0]
        return out[[key, "start", value]]

    cols = group_cols + [ts_col, value, agg_func_col]
    return df.select(*[c for c in dict.fromkeys(cols)]).groupBy(*group_cols).applyInPandas(
        fn, out_schema
    )


# ---------------------------------------------------------------------------
# Native closed form (scale path)
# ---------------------------------------------------------------------------

def _knots(df, key, ts_col, value, session_col):
    """Collapse to 1s-floored knots (mean on collisions) and attach the next
    knot per series — the segment endpoints of the interpolated grid."""
    group = [F.col(key).alias("__k")] + (
        [F.col(session_col).alias("__sess")] if session_col else [F.lit(0).alias("__sess")]
    )
    pts = (
        df.where(F.col(value).isNotNull())
        .select(*group, F.unix_timestamp(F.col(ts_col)).alias("__s"), F.col(value).alias("__v"))
        .groupBy("__k", "__sess", "__s")
        .agg(F.avg("__v").alias("__v"))
    )
    w = W.partitionBy("__k", "__sess").orderBy("__s")
    return pts.select(
        "__k",
        "__sess",
        "__s",
        "__v",
        F.lead("__s").over(w).alias("__s2"),
        F.lead("__v").over(w).alias("__v2"),
    )


def rollup_native_sum(
    df: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    value: str = "value",
    freq_seconds: int = 3600,
    session_col: str | None = "session_id",
    drop_neg: bool = True,
) -> DataFrame:
    """R1 closed form. Per segment (s1,v1)->(s2,v2): every second in
    (s1, s2] carries increment slope=(v2-v1)/(s2-s1); negative-slope seconds
    are *removed* (reference keeps only diffs >= 0), making their windows
    incomplete. Window emitted iff kept-second count == freq."""
    from timeseries_harmonizer_spark.operators.cleaning import drop_negative_diffs

    if drop_neg:
        keys = [key] + ([session_col] if session_col else [])
        df = drop_negative_diffs(df.where(F.col(value).isNotNull()), keys, ts_col, value)
    seg = _knots(df, key, ts_col, value, session_col).where(F.col("__s2").isNotNull())
    Fs = freq_seconds
    slope = (F.col("__v2") - F.col("__v")) / (F.col("__s2") - F.col("__s"))
    # seconds covered by this segment: [s1+1, s2]
    a = F.col("__s") + 1
    b = F.col("__s2")
    win0 = F.floor(a / Fs) * Fs
    win1 = F.floor(b / Fs) * Fs
    seg = seg.select(
        "__k",
        slope.alias("__slope"),
        a.alias("__a"),
        b.alias("__b"),
        F.explode(F.sequence(win0, win1, F.lit(Fs))).alias("__w"),
    )
    ov = F.least(F.col("__b"), F.col("__w") + Fs - 1) - F.greatest(F.col("__a"), F.col("__w")) + 1
    seg = seg.where(F.col("__slope") >= 0).withColumn("__ov", ov)
    out = (
        seg.groupBy("__k", "__w")
        .agg(F.sum("__ov").alias("__cnt"), F.sum(F.col("__ov") * F.col("__slope")).alias("__sum"))
        .where(F.col("__cnt") == Fs)
        .select(
            F.col("__k").alias(key),
            F.timestamp_seconds(F.col("__w")).alias("start"),
            F.col("__sum").alias(value),
        )
    )
    return out


def rollup_native_avg(
    df: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    value: str = "value",
    freq_seconds: int = 3600,
    session_col: str | None = "session_id",
) -> DataFrame:
    """R2 closed form. Grid seconds [s1, s2) carry v1 + slope*(s-s1) (the
    final knot contributes itself); window mean = sum/count over overlap,
    emitted iff count == freq."""
    knots = _knots(df, key, ts_col, value, session_col)
    Fs = freq_seconds
    # open segments [s1, s2-1]; terminal knot (s2 null) -> single second [s1, s1]
    a = F.col("__s")
    b = F.when(F.col("__s2").isNotNull(), F.col("__s2") - 1).otherwise(F.col("__s"))
    slope = F.when(
        F.col("__s2").isNotNull(),
        (F.col("__v2") - F.col("__v")) / (F.col("__s2") - F.col("__s")),
    ).otherwise(F.lit(0.0))
    win0 = F.floor(a / Fs) * Fs
    win1 = F.floor(b / Fs) * Fs
    seg = knots.select(
        "__k",
        F.col("__s").alias("__s1"),
        F.col("__v").alias("__v1"),
        slope.alias("__slope"),
        a.alias("__a"),
        b.alias("__b"),
        F.explode(F.sequence(win0, win1, F.lit(Fs))).alias("__w"),
    )
    lo = F.greatest(F.col("__a"), F.col("__w"))
    hi = F.least(F.col("__b"), F.col("__w") + Fs - 1)
    n = hi - lo + 1
    # sum_{s=lo..hi} v1 + slope*(s - s1)  =  n*v1 + slope*(n*(lo+hi)/2 - n*s1)
    mid = (lo + hi).cast("double") / 2.0
    contrib = n.cast("double") * (F.col("__v1") + F.col("__slope") * (mid - F.col("__s1")))
    seg = seg.withColumn("__n", n).withColumn("__contrib", contrib)
    return (
        seg.groupBy("__k", "__w")
        .agg(F.sum("__n").alias("__cnt"), F.sum("__contrib").alias("__sum"))
        .where(F.col("__cnt") == Fs)
        .select(
            F.col("__k").alias(key),
            F.timestamp_seconds(F.col("__w")).alias("start"),
            (F.col("__sum") / F.col("__cnt")).alias(value),
        )
    )


def rollup_native_sum_avg(
    df: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    value: str = "value",
    agg_col: str = "agg_func",
    freq_seconds: int = 3600,
    session_col: str | None = "session_id",
    drop_neg: bool = True,
) -> DataFrame:
    """r6 optimization: the SUM and AVG closed-form rollups in ONE pass
    over a frame whose aggregation function is declared per series
    (``agg_col``, constant per key — the registry contract). The pipeline
    previously filtered the cached ``prepared`` twice and re-sorted each
    disjoint subset; this computes both with one knots window and one
    merge aggregate, branching the segment arithmetic per row. The math is
    rollup_native_sum / rollup_native_avg verbatim (see those docstrings):
    per-branch rows, expressions and float operation order are identical,
    so results match the separate operators bit-for-bit."""
    Fs = freq_seconds
    sess = F.col(session_col) if session_col else F.lit(0)
    df = df.where(F.col(value).isNotNull())
    if drop_neg:
        # R1 step 1, SUM rows only. Series are homogeneous in agg_col, so
        # the lag over (key, session) sees exactly the rows the SUM-only
        # operator's drop_negative_diffs saw.
        keys = [key] + ([session_col] if session_col else [])
        wd = W.partitionBy(*keys).orderBy(ts_col)
        diff = F.col(value) - F.lag(value).over(wd)
        df = (
            df.withColumn(
                "__negdrop",
                (F.col(agg_col) == "SUM") & F.coalesce(diff < 0, F.lit(False)),
            )
            .where(~F.col("__negdrop"))
            .drop("__negdrop")
        )
    pts = (
        df.select(
            F.col(key).alias("__k"),
            sess.alias("__sess"),
            F.col(agg_col).alias("__agg"),
            F.unix_timestamp(F.col(ts_col)).alias("__s"),
            F.col(value).alias("__v"),
        )
        .groupBy("__k", "__sess", "__agg", "__s")
        .agg(F.avg("__v").alias("__v"))
    )
    wl = W.partitionBy("__k", "__sess").orderBy("__s")
    knots = pts.select(
        "__k", "__agg", "__s", "__v",
        F.lead("__s").over(wl).alias("__s2"),
        F.lead("__v").over(wl).alias("__v2"),
    ).where(F.col("__s2").isNotNull() | (F.col("__agg") != "SUM"))
    is_sum = F.col("__agg") == "SUM"
    slope = F.when(
        F.col("__s2").isNotNull(),
        (F.col("__v2") - F.col("__v")) / (F.col("__s2") - F.col("__s")),
    ).otherwise(F.lit(0.0))
    # SUM covers seconds (s1, s2]; AVG covers [s1, s2-1] (+ terminal [s1, s1])
    a = F.when(is_sum, F.col("__s") + 1).otherwise(F.col("__s"))
    b = F.when(
        F.col("__s2").isNotNull(),
        F.when(is_sum, F.col("__s2")).otherwise(F.col("__s2") - 1),
    ).otherwise(F.col("__s"))
    win0 = F.floor(a / Fs) * Fs
    win1 = F.floor(b / Fs) * Fs
    seg = knots.select(
        "__k", "__agg",
        F.col("__s").alias("__s1"),
        F.col("__v").alias("__v1"),
        slope.alias("__slope"),
        a.alias("__a"),
        b.alias("__b"),
        F.explode(F.sequence(win0, win1, F.lit(Fs))).alias("__w"),
    ).where((F.col("__agg") != "SUM") | (F.col("__slope") >= 0))
    lo = F.greatest(F.col("__a"), F.col("__w"))
    hi = F.least(F.col("__b"), F.col("__w") + Fs - 1)
    n = hi - lo + 1
    mid = (lo + hi).cast("double") / 2.0
    contrib = F.when(is_sum, n * F.col("__slope")).otherwise(
        n.cast("double")
        * (F.col("__v1") + F.col("__slope") * (mid - F.col("__s1")))
    )
    return (
        seg.withColumn("__n", n)
        .withColumn("__c", contrib)
        .groupBy("__k", "__agg", "__w")
        .agg(F.sum("__n").alias("__cnt"), F.sum("__c").alias("__sum"))
        .where(F.col("__cnt") == Fs)
        .select(
            F.col("__k").alias(key),
            F.timestamp_seconds(F.col("__w")).alias("start"),
            F.when(is_sum, F.col("__sum"))
            .otherwise(F.col("__sum") / F.col("__cnt"))
            .alias(value),
        )
    )


def rollup_native_twa(
    df: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    value: str = "value",
    freq_seconds: int = 3600,
    session_col: str | None = "session_id",
) -> DataFrame:
    """Time-weighted average — the continuous-integral sibling of R2 (the
    TimescaleDB ``time_weight('linear')`` semantics, public): TWA over a
    tier window = (1/T) * integral of the piecewise-linear v(t) between
    knots, i.e. trapezoid areas over window overlaps, NOT the discrete
    1s-grid mean. Same segment-explode shape as the other native rollups
    (each inter-knot segment lands only in the windows it overlaps; one
    groupBy merges), windows emit iff fully covered."""
    seg0 = _knots(df, key, ts_col, value, session_col).where(
        F.col("__s2").isNotNull()
    )
    Fs = freq_seconds
    slope = (F.col("__v2") - F.col("__v")) / (F.col("__s2") - F.col("__s"))
    win0 = F.floor(F.col("__s") / Fs) * Fs
    win1 = F.floor(F.col("__s2") / Fs) * Fs
    seg = seg0.select(
        "__k",
        F.col("__s").alias("__s1"),
        F.col("__s2").alias("__e"),
        F.col("__v").alias("__v1"),
        slope.alias("__slope"),
        F.explode(F.sequence(win0, win1, F.lit(Fs))).alias("__w"),
    )
    a = F.greatest(F.col("__s1"), F.col("__w"))
    b = F.least(F.col("__e"), F.col("__w") + Fs)
    dur = (b - a).cast("double")
    va = F.col("__v1") + F.col("__slope") * (a - F.col("__s1"))
    vb = F.col("__v1") + F.col("__slope") * (b - F.col("__s1"))
    seg = (
        seg.withColumn("__dur", dur)
        .withColumn("__area", dur * (va + vb) / 2.0)
        .where(F.col("__dur") > 0)
    )
    return (
        seg.groupBy("__k", "__w")
        .agg(F.sum("__dur").alias("__cov"), F.sum("__area").alias("__integ"))
        .where(F.col("__cov") == Fs)
        .select(
            F.col("__k").alias(key),
            F.timestamp_seconds(F.col("__w")).alias("start"),
            (F.floor(F.col("__integ") / F.col("__cov") * 1e6) / 1e6).alias(value),
        )
    )


def rollup_native_last(
    df: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    value: str = "value",
    freq_seconds: int | str = 3600,
    session_col: str | None = None,
    chunk_windows: int = 50_000,
) -> DataFrame:
    """R3 native: tumbling last non-null value + LOCF across the dense
    window grid of each (series, session) — LOCF never bridges a session
    gap, matching the reference's per-part harmonization (reference
    harmonizers/__init__.py:379-383). Adds ``is_real`` = window had a raw
    observation (false -> LOCF-filled), the reference's isReal flag
    (reference lib/__init__.py:157-166).

    freq_seconds: window width in seconds, or 'P1W'/'P1M' for calendar
    windows (date_trunc labels, interval-stepped dense grid).

    Volume bound (the 100x argument): tiers with ``gap_check=None`` (1d)
    have unbounded sessions, so one url with years of sparse history would
    otherwise explode its whole span as ONE generator batch. Integer-
    frequency grids therefore bound every ``sequence``/explode batch at
    ``chunk_windows`` windows (~35 days at 1m, ~5.7 years at 1h) via a
    two-level explode over each observed window's claim span (see the
    claim-span comment in the body). Calendar grids (P1W/P1M) keep the
    direct span grid: decades are only hundreds of windows."""
    calendar = isinstance(freq_seconds, str)
    sess = F.col(session_col) if session_col else F.lit(0)
    win = _window_col(F.col(ts_col), freq_seconds, is_ts=True).alias("__w")
    per_win = (
        df.select(F.col(key).alias("__k"), sess.alias("__sess"), win, ts_col, value)
        .groupBy("__k", "__sess", "__w")
        .agg(
            F.expr(f"max_by({value}, {ts_col}) FILTER (WHERE {value} IS NOT NULL)").alias("__last"),
            F.count(F.col(ts_col)).alias("__nraw"),
        )
    )
    is_real = F.coalesce(F.col("__nraw") > 0, F.lit(False)).alias("is_real")
    if calendar:
        spans = per_win.groupBy("__k", "__sess").agg(
            F.min("__w").alias("__w0"), F.max("__w").alias("__w1")
        )
        grid = spans.select(
            "__k", "__sess",
            F.explode(
                F.sequence("__w0", "__w1", F.expr(_calendar_interval(freq_seconds)))
            ).alias("__w"),
        )
        joined = grid.join(per_win, ["__k", "__sess", "__w"], "left")
        w = (
            W.partitionBy("__k", "__sess")
            .orderBy("__w")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        return joined.select(
            F.col("__k").alias(key),
            F.col("__w").alias("start"),
            F.last("__last", ignorenulls=True).over(w).alias(value),
            is_real,
        )
    step = int(freq_seconds)
    span_s = int(chunk_windows) * step  # explode-batch bound, in seconds
    # r6 optimization (claim-span formulation): the dense grid + LEFT JOIN
    # + per-chunk LOCF + carry-in machinery is equivalent to each observed
    # window CLAIMING every grid slot up to (exclusive) the next observed
    # window, filled with the running last non-null value at the claimant —
    # the same derivation as `upsample`'s ffill. One window pass computes
    # both the carry (last non-null __last so far) and the claim end
    # (lead(__w) - step); a chunk-bounded double explode emits the slots.
    # This removes the grid/per_win join, three groupBys and a second
    # window sort from the old plan (plan: 2 exchanges fewer), while the
    # per-row explode stays bounded: the outer sequence steps in chunk
    # spans (gap/span rows), the inner in windows (<= chunk_windows rows).
    wspec = W.partitionBy("__k", "__sess").orderBy("__w")
    carry = F.last("__last", ignorenulls=True).over(
        wspec.rowsBetween(W.unboundedPreceding, 0)
    )
    nxt = F.lead("__w").over(wspec)
    claims = per_win.where(F.col("__w").isNotNull()).select(
        "__k",
        "__w",
        "__nraw",
        carry.alias("__fill"),
        F.coalesce(nxt - step, F.col("__w")).alias("__end"),  # inclusive
    )
    sub = claims.select(
        "__k", "__w", "__nraw", "__fill", "__end",
        F.explode(F.sequence("__w", "__end", F.lit(span_s))).alias("__sub"),
    )
    slot_end = F.least(F.col("__end"), F.col("__sub") + F.lit(span_s - step))
    slots = sub.select(
        "__k", "__w", "__nraw", "__fill",
        F.explode(F.sequence(F.col("__sub"), slot_end, F.lit(step))).alias("__slot"),
    )
    return slots.select(
        F.col("__k").alias(key),
        F.timestamp_seconds(F.col("__slot")).alias("start"),
        F.col("__fill").alias(value),
        ((F.col("__slot") == F.col("__w")) & F.coalesce(F.col("__nraw") > 0, F.lit(False))).alias(
            "is_real"
        ),
    )


# ---------------------------------------------------------------------------
# R6/R7 — cross-tier alignment
# ---------------------------------------------------------------------------

def downsample(
    points: DataFrame,
    key: str = "url",
    start_col: str = "start",
    value="value",
    agg: str = "sum",  # sum | avg | last
    from_seconds: int = 60,
    to_seconds: int | str = 3600,
) -> DataFrame:
    """R6: coarsen fine-tier points with the property's aggregation function
    (reference lib2/calculate_formulas.py:179-182). avg is carried as
    sum+count so coarse windows weight fine windows correctly.

    value: a column name, or a sequence of names aggregated in the SAME
    pass (r6 optimization: one scan + one shuffle for several measures of
    the same series, instead of one downsample-plus-join per measure —
    guide §2.3 'aggregate before you shuffle').

    to_seconds: target width in seconds, or 'P1W'/'P1M' for calendar windows
    (date_trunc labels — the reference's '1MS' resample analog,
    lib2/calculate_formulas.py:28-31)."""
    calendar = isinstance(to_seconds, str)
    if not calendar:
        assert to_seconds % from_seconds == 0
    values = [value] if isinstance(value, str) else list(value)
    win = _window_col(F.col(start_col), to_seconds, is_ts=True).alias("__w")
    if agg == "sum":
        aggs = [F.sum(v).alias(v) for v in values]
    elif agg == "avg":
        aggs = [(F.sum(v) / F.count(v)).alias(v) for v in values]
    elif agg == "last":
        aggs = [
            F.expr(f"max_by({v}, __s) FILTER (WHERE {v} IS NOT NULL)").alias(v)
            for v in values
        ]
    else:
        raise ValueError(agg)
    sel = [F.col(key).alias("__k"), win, *values]
    if agg == "last":
        sel.append(F.unix_timestamp(F.col(start_col)).alias("__s"))
    out = points.select(*sel).groupBy("__k", "__w").agg(*aggs)
    start = F.col("__w") if calendar else F.timestamp_seconds(F.col("__w"))
    return out.select(F.col("__k").alias(key), start.alias(start_col), *values)


def upsample(
    points: DataFrame,
    key: str = "url",
    start_col: str = "start",
    value: str = "value",
    agg: str = "sum",
    from_seconds: int = 3600,
    to_seconds: int = 60,
) -> DataFrame:
    """R7: refine coarse points to a finer grid by LOCF with the reference's
    ``resample(freq).ffill()`` semantics (lib2/calculate_formulas.py:183-190):
    each source point claims every fine slot in [its ts, next point's ts) —
    so a MISSING coarse window is filled by the previous point, not left
    empty — and SUM series divide the source value by the ACTUAL number of
    claimed slots (a point followed by a gap spreads thinner, conserving the
    series total). The final point of each series claims one full coarse
    window ([ts, ts+from_seconds)), matching the tier contract that a coarse
    point describes its whole window.

    Plan shape: one hash exchange on the series key (the lead window), then
    a slot explode — identical to the formula engine's `_upsample`
    (plans/formula.py), which this operator mirrors; no range join, no
    BroadcastNestedLoopJoin."""
    from pyspark.sql import Window as W

    assert from_seconds % to_seconds == 0
    src = points.select(
        F.col(key).alias("__k"),
        F.unix_timestamp(F.col(start_col)).alias("__s"),
        F.col(value).alias("__v"),
    )
    nxt = F.lead("__s").over(W.partitionBy("__k").orderBy("__s"))
    # exclusive claim end, clamped to at least one fine slot: a duplicate
    # (key, start) in the input makes lead(__s) == __s, which would send
    # F.sequence a negative span (runtime error) and n_slots to 0 (division
    # by zero) — each duplicate now claims exactly its own slot instead
    # (ADVICE r5); duplicate-free inputs are unaffected (end >= __s +
    # to_seconds already holds for them).
    end = F.greatest(
        F.coalesce(nxt, F.col("__s") + from_seconds),
        F.col("__s") + to_seconds,
    )
    # last claimed slot: highest to_seconds-multiple offset strictly < end
    last = F.col("__s") + F.floor((end - 1 - F.col("__s")) / to_seconds) * to_seconds
    spans = src.select(
        "__k", "__v", "__s", last.cast("long").alias("__l")
    )
    if agg == "sum":
        n_slots = (F.col("__l") - F.col("__s")) / to_seconds + 1
        spans = spans.withColumn("__v", F.col("__v") / n_slots)
    fine = spans.select(
        "__k",
        "__v",
        F.explode(F.sequence("__s", "__l", F.lit(to_seconds))).alias("__w"),
    )
    return fine.select(
        F.col("__k").alias(key),
        F.timestamp_seconds(F.col("__w")).alias(start_col),
        F.col("__v").alias(value),
    )


def dense_reindex(
    points: DataFrame,
    key: str = "url",
    start_col: str = "start",
    value: str = "value",
    freq_seconds: int = 3600,
    ts_ini=None,
    ts_end=None,
) -> DataFrame:
    """R8: complete missing grid points with NULL value (reference
    lib2/__init__.py:64-71). Bounds default to each series' own span."""
    Fs = freq_seconds
    src = points.select(
        F.col(key).alias("__k"),
        F.unix_timestamp(F.col(start_col)).alias("__w"),
        F.col(value),
    )
    if ts_ini is not None and ts_end is not None:
        lo = F.lit(int(pd.Timestamp(ts_ini).timestamp()) // Fs * Fs)
        hi = F.lit(int(pd.Timestamp(ts_end).timestamp()) // Fs * Fs)
        spans = src.select("__k").distinct().select("__k", lo.alias("__w0"), hi.alias("__w1"))
    else:
        spans = src.groupBy("__k").agg(F.min("__w").alias("__w0"), F.max("__w").alias("__w1"))
    grid = spans.select("__k", F.explode(F.sequence("__w0", "__w1", F.lit(Fs))).alias("__w"))
    return (
        grid.join(src, ["__k", "__w"], "left")
        .select(
            F.col("__k").alias(key),
            F.timestamp_seconds(F.col("__w")).alias(start_col),
            F.col(value),
        )
    )


# ---------------------------------------------------------------------------
# Continuous aggregates over web_pages (the north-star tier payload)
# ---------------------------------------------------------------------------

def continuous_aggregate(
    df: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    value: str = "value",
    lang: str = "lang",
    freq_seconds: int = 3600,
) -> DataFrame:
    """Per-(url, tier window): crawl count, value (text length) min/max/
    avg/sum, and the lang-distribution map. Two-level aggregation: the
    (key, window, lang) pre-aggregate bounds the collect_list fan-in (hot
    domains hit the partial-agg combiner map-side, so no salting is needed
    for these algebraic aggregates)."""
    Fs = freq_seconds
    win = (F.floor(F.unix_timestamp(F.col(ts_col)) / Fs) * Fs).alias("__w")
    base = df.select(F.col(key).alias("__k"), win, F.col(value).alias("__v"), F.col(lang).alias("__lang"))
    per_lang = base.groupBy("__k", "__w", "__lang").agg(
        F.count("*").alias("__n"),
        F.min("__v").alias("__min"),
        F.max("__v").alias("__max"),
        F.sum("__v").alias("__sum"),
        F.count("__v").alias("__nval"),
    )
    out = per_lang.groupBy("__k", "__w").agg(
        F.sum("__n").alias("crawl_count"),
        F.min("__min").alias("len_min"),
        F.max("__max").alias("len_max"),
        F.sum("__sum").alias("len_sum"),
        (F.sum("__sum") / F.sum("__nval")).alias("len_avg"),
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct(F.col("__lang"), F.col("__n"))))
        ).alias("lang_counts"),
    )
    return out.select(
        F.col("__k").alias(key),
        F.timestamp_seconds(F.col("__w")).alias("start"),
        "crawl_count",
        "len_min",
        "len_max",
        "len_avg",
        "len_sum",
        "lang_counts",
    )


# ---------------------------------------------------------------------------
# Chunked exact replay — bounded Arrow-group memory for hot series
# ---------------------------------------------------------------------------

def rollup_exact_chunked(
    df: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    value: str = "value",
    agg_func: str = "SUM",  # SUM | AVG (LAST is fully native)
    freq_seconds: int = 3600,
    session_col: str | None = "session_id",
    chunk_windows: int = 24,
) -> DataFrame:
    """Exact-replay rollup with *time-chunked* Arrow groups: the salted-key
    analog for hot series. Group key = (key, session, chunk) where chunk =
    floor(ts / (chunk_windows * freq)); each chunk also receives a one-point
    overlap (the previous chunk's last row) so the 1s interpolation across
    the boundary is identical to the unchunked replay. Kernels emit
    per-window (count, sum) partials; a native merge re-gates completeness
    (count == freq) after summation — bit-identical results, bounded memory:
    a chunk's 1s grid never exceeds chunk_windows * freq seconds (+gap).

    Negative-diff dropping (R1 step 1) runs as a native window op BEFORE
    chunking, because a dropped row changes its neighbors' interpolation —
    it must be decided globally, not per chunk.

    The kernel's FIRST replay step — the 1s-floor mean over colliding raw
    rows — is associative, so it runs natively (groupBy second + avg)
    BEFORE the Arrow boundary: a url+second with 10^6 raw collisions is
    collapsed map-side by the partial aggregate, and every Arrow group is
    hard-bounded at chunk_windows*freq_seconds rows (+1 overlap) no matter
    how degenerate the raw input (r4 verdict #5). The kernel enforces the
    bound with an assertion rather than trusting it. For SUM the pre-agg
    rides the negative-diff window's existing hash partitioning (keys ⊆
    grouping → no extra exchange); for AVG it IS the first exchange and
    shuffles only per-second partials, never raw collisions.
    """
    from timeseries_harmonizer_spark.operators.cleaning import drop_negative_diffs

    assert agg_func in ("SUM", "AVG")
    span = chunk_windows * freq_seconds
    keys = [key] + ([session_col] if session_col else [])
    df = df.where(F.col(value).isNotNull()).select(*keys, ts_col, value)
    if agg_func == "SUM":
        df = drop_negative_diffs(df, keys, ts_col, value)
    # native 1s-collision collapse == the kernel's resample('1s').mean()
    df = df.groupBy(
        *keys, F.date_trunc("second", F.col(ts_col)).alias(ts_col)
    ).agg(F.avg(value).alias(value))
    ts_s = F.unix_timestamp(F.col(ts_col))
    df = df.withColumn("__chunk", F.floor(ts_s / span))
    w = W.partitionBy(*keys).orderBy(ts_col)
    nxt_chunk = F.lead("__chunk").over(w)
    # duplicate boundary rows into the next chunk as its overlap point
    overlap = (
        df.withColumn("__next", nxt_chunk)
        .where(F.col("__next").isNotNull() & (F.col("__next") != F.col("__chunk")))
        .withColumn("__chunk", F.col("__next"))
        .withColumn("__is_overlap", F.lit(True))
        .drop("__next")
    )
    tagged = df.withColumn("__is_overlap", F.lit(False)).unionByName(overlap)

    kernel_drop_first = agg_func == "AVG"
    out_schema = f"{key} string, start timestamp, cnt long, total double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > span + 1:  # pre-agg guarantees ≤1 row/second + overlap
            raise AssertionError(
                f"Arrow group exceeds pre-agg bound: {len(pdf)} > {span + 1}"
            )
        pdf = pdf.sort_values(ts_col)
        s = pd.Series(pdf[value].to_numpy(), index=pd.DatetimeIndex(pdf[ts_col]))
        has_overlap = bool(pdf["__is_overlap"].iloc[0]) if len(pdf) else False
        if agg_func == "SUM":
            part = K.rollup_sum_partials(s, freq_seconds)
        else:
            part = K.rollup_avg_partials(
                s, freq_seconds, drop_first_grid_second=has_overlap
            )
        part[key] = pdf[key].iloc[0]
        return part[[key, "start", "cnt", "total"]]

    partials = tagged.groupBy(*keys, "__chunk").applyInPandas(fn, out_schema)
    merged = partials.groupBy(key, "start").agg(
        F.sum("cnt").alias("__cnt"), F.sum("total").alias("__total")
    )
    gated = merged.where(F.col("__cnt") == freq_seconds)
    val = (
        F.col("__total") if agg_func == "SUM" else F.col("__total") / F.col("__cnt")
    )
    return gated.select(key, "start", val.alias(value))
