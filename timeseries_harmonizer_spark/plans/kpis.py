"""K3 — building KPI computation (reference launcher.py:212-359).

Uses the v1 KPI constants and operations of the reference's KPI job
(reference lib/__init__.py:7-9, launcher.py:322-347):

  self_consumption = clip0(production - exported)
  total            = clip0(production + imported - exported)
  co2              = clip0(production * CO2_FACTOR)      # 0.00012
  trees            = clip0(co2 / TREES_FACTOR)           # 80
  households       = clip0(production / HOUSE_FACTOR)    # 4000

(exported ≡ 0 when the building has no grid-export metering). The v2
``KPIS_FACTORS`` in plans.formula are a different subsystem — the formula
engine's named constants — and are intentionally not used here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# v1 constants (reference lib/__init__.py:7-9).
KPI_V1 = {"CO2_FACTOR": 0.00012, "HOUSE_FACTOR": 4000.0, "TREES_FACTOR": 80.0}


def _clip0(c: Column) -> Column:
    """clip at 0, preserving NULL (pandas ``loc[v < 0] = 0`` leaves NaN;
    Spark ``greatest`` would turn NULL into 0 because it skips NULLs)."""
    return F.when(c < 0, F.lit(0.0)).otherwise(c)


def compute_kpis(
    production: DataFrame,      # (key, start, value)
    imported: DataFrame,
    exported: DataFrame | None,
    key: str = "building",
    start_col: str = "start",
    value: str = "value",
) -> DataFrame:
    p = production.select(F.col(key), F.col(start_col), F.col(value).alias("prod"))
    i = imported.select(F.col(key), F.col(start_col), F.col(value).alias("imp"))
    if exported is None:
        joined = p.join(i, [key, start_col]).withColumn("exp", F.lit(0.0))
    else:
        e = exported.select(F.col(key), F.col(start_col), F.col(value).alias("exp"))
        joined = p.join(i, [key, start_col]).join(e, [key, start_col])
    self_cons = _clip0(F.col("prod") - F.col("exp"))
    total = _clip0(F.col("prod") + F.col("imp") - F.col("exp"))
    co2 = _clip0(F.col("prod") * F.lit(KPI_V1["CO2_FACTOR"]))
    return joined.select(
        key,
        start_col,
        self_cons.alias("self_consumption"),
        total.alias("total_consumption"),
        co2.alias("co2_saved"),
        _clip0(co2 / F.lit(KPI_V1["TREES_FACTOR"])).alias("tree_equivalent"),
        _clip0(F.col("prod") / F.lit(KPI_V1["HOUSE_FACTOR"])).alias("household_equivalent"),
    )
