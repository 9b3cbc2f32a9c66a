"""K1/K2 — PV energy-balance post-processor as a Spark stage.

The repair loop is inherently sequential per system (neighbor
redistribution with rollback — reference post_process/pv_postprocess.py:26-68),
so it runs per system in Arrow-batched applyInPandas; everything around it
(gen/exp alignment, dense completion) is native DataFrame ops. Group state
is bounded by the CALLER's query window (the reference repairs one
lookback window per run, launcher.py:40-44; jobs invoke this with
ts_ini/ts_end the same way) — time-chunking inside the operator would
change semantics, because repairs cascade through +-5 neighbors and a
chunk boundary would cut an absorption chain.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from timeseries_harmonizer_spark.functions import series_kernels as K
from timeseries_harmonizer_spark.operators.rollup import dense_reindex


def pv_postprocess(
    gen: DataFrame,
    exp: DataFrame,
    key: str = "system",
    start_col: str = "start",
    value: str = "value",
    freq_seconds: int = 3600,
    ts_ini=None,
    ts_end=None,
) -> DataFrame:
    """Repair exported-energy points against generation per system; returns
    the repaired exported series densely reindexed over [ts_ini, ts_end]
    (K2, reference pv_postprocess.py:70-103). Systems needing no repair are
    omitted, matching the reference's update-only emission."""
    g = gen.select(F.col(key).alias("__k"), F.col(start_col).alias("__t"), F.col(value).alias("__gen"))
    e = exp.select(F.col(key).alias("__k"), F.col(start_col).alias("__t"), F.col(value).alias("__exp"))
    joined = g.join(e, ["__k", "__t"], "outer")

    schema = f"__k string, __t timestamp, {value} double"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__t")
        gen_s = pd.Series(pdf["__gen"].to_numpy(), index=pd.DatetimeIndex(pdf["__t"]))
        exp_s = pd.Series(pdf["__exp"].to_numpy(), index=pd.DatetimeIndex(pdf["__t"]))
        update, repaired = K.pv_energy_balance(gen_s, exp_s)
        if not update:
            return pd.DataFrame(columns=["__k", "__t", value])
        out = repaired.reset_index()
        out.columns = ["__t", value]
        out["__k"] = pdf["__k"].iloc[0]
        return out[["__k", "__t", value]]

    repaired = joined.groupBy("__k").applyInPandas(fn, schema)
    out = repaired.select(
        F.col("__k").alias(key), F.col("__t").alias(start_col), F.col(value)
    )
    if ts_ini is not None and ts_end is not None:
        out = dense_reindex(
            out, key=key, start_col=start_col, value=value,
            freq_seconds=freq_seconds, ts_ini=ts_ini, ts_end=ts_end,
        )
    return out


# ---------------------------------------------------------------------------
# K4 — post-processor plugin protocol + registry
# ---------------------------------------------------------------------------

import abc


class PostProcessor(abc.ABC):
    """K4 plugin protocol — the reference's Processor ABC
    (harmonizers/post_process/__init__.py:1-13: ``name`` /
    ``get_devices(frequency)`` / ``process_device(...)``) re-expressed over
    DataFrames: ``get_systems`` declares which registry series the
    processor claims for a tier; ``process`` receives the tier's points
    restricted to the claimed systems and returns the REPAIRED rows only
    (update-only emission, matching the reference writing back just the
    modified device series). Registration is by object, so deployments add
    processors without touching pipeline code."""

    name: str = ""

    @abc.abstractmethod
    def get_systems(self, registry: DataFrame, tier_name: str) -> DataFrame:
        """Subset of registry rows (must keep ``url``) this processor
        claims at this tier; the pipeline broadcast-joins it against the
        points (J1 — the registry is the small dimension)."""

    @abc.abstractmethod
    def process(
        self, points: DataFrame, systems: DataFrame, tier_name: str
    ) -> DataFrame:
        """Claimed points -> repaired/update rows (processor-shaped)."""


_REGISTRY: dict[str, PostProcessor] = {}


def register_postprocessor(proc: PostProcessor) -> PostProcessor:
    _REGISTRY[proc.name] = proc
    return proc


def unregister_postprocessor(name: str) -> None:
    _REGISTRY.pop(name, None)


def registered_postprocessors() -> tuple[PostProcessor, ...]:
    return tuple(_REGISTRY.values())


class PVEnergyBalanceProcessor(PostProcessor):
    """First registrant: the K1/K2 energy-balance repair as a plugin.
    Claims EnergyGeneration + EnergyConsumptionGridElectricity series;
    a 'system' is the url's domain (the device analog), its generation /
    exported pair being the domain-wide sums per tier window. Emits the
    repaired exported series for systems that needed repair (reference
    post_process/pv_postprocess.py:70-103 update-only write-back)."""

    name = "pv_energy_balance"
    GEN, EXP = "EnergyGeneration", "EnergyConsumptionGridElectricity"

    def get_systems(self, registry: DataFrame, tier_name: str) -> DataFrame:
        return registry.where(F.col("property").isin(self.GEN, self.EXP))

    def process(
        self, points: DataFrame, systems: DataFrame, tier_name: str
    ) -> DataFrame:
        dom = F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("system")
        tagged = points.select("url", "start", "value").join(
            F.broadcast(systems.select("url", "property")), "url"
        ).select(dom, "property", "start", "value")
        series = {
            p: tagged.where(F.col("property") == p)
            .groupBy("system", "start")
            .agg(F.sum("value").alias("value"))
            for p in (self.GEN, self.EXP)
        }
        return pv_postprocess(series[self.GEN], series[self.EXP], key="system")


register_postprocessor(PVEnergyBalanceProcessor())
