"""K3 — building KPI computation (reference launcher.py:212-359), with the
v2 constants (reference lib2/calculate_formulas.py:40-42).

Per (building, window): self-consumption = max(production - exported, 0)
(exported ≡ 0 when the building has no grid-export metering); total
consumption = max(production + imported - exported, 0); derived CO2 /
tree-equivalent / household KPIs are scalar multiples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from timeseries_harmonizer_spark.plans.formula import KPIS_FACTORS


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
    self_cons = F.greatest(F.col("prod") - F.col("exp"), F.lit(0.0))
    total = F.greatest(F.col("prod") + F.col("imp") - F.col("exp"), F.lit(0.0))
    co2 = F.col("prod") * F.lit(KPIS_FACTORS["CO2_FACTOR"])
    return joined.select(
        key,
        start_col,
        self_cons.alias("self_consumption"),
        total.alias("total_consumption"),
        co2.alias("co2_saved"),
        (co2 * F.lit(KPIS_FACTORS["TREES_FACTOR"])).alias("tree_equivalent"),
        (F.col("prod") / F.lit(KPIS_FACTORS["HOUSE_FACTOR"])).alias("household_equivalent"),
    )
