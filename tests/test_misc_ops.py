"""Typed extraction (P2-P6 family), month floor shift (S4), KPIs (K3),
formula component walk (F8)."""

import numpy as np
import pandas as pd

from timeseries_harmonizer_spark.functions.extract import (
    month_floor_shift,
    typed_value_extract,
)
from timeseries_harmonizer_spark.plans.formula import get_timeseries_components
from timeseries_harmonizer_spark.plans.kpis import compute_kpis


def test_typed_value_extract(spark):
    pdf = pd.DataFrame(
        {
            "kind": ["analog", "analog", "binary", "binary", "binary", "multiState", "other"],
            "raw": ["1.5", "oops", "Active", "inactive", "weird", "7", "2.25"],
        }
    )
    out = typed_value_extract(spark.createDataFrame(pdf)).toPandas()["value"]
    exp = [1.5, np.nan, 1.0, 0.0, np.nan, 7.0, 2.25]
    assert all(
        (np.isnan(e) and pd.isna(g)) or e == g for e, g in zip(exp, out)
    ), list(out)


def test_month_floor_shift(spark):
    # 2024-03-15 10:00 UTC -> Madrid is 11:00 CET -> floor Mar -> shift Feb
    pdf = pd.DataFrame({"warc_ts": [pd.Timestamp("2024-03-15 10:00:00")]})
    out = month_floor_shift(spark.createDataFrame(pdf)).toPandas()["warc_ts"].iloc[0]
    # Feb 1 00:00 Madrid == Jan 31 23:00 UTC
    assert out == pd.Timestamp("2024-01-31 23:00:00")


def test_compute_kpis(spark):
    idx = pd.date_range("2024-01-01", periods=3, freq="1h")
    mk = lambda vals: spark.createDataFrame(
        pd.DataFrame({"building": "b1", "start": idx, "value": vals})
    )
    out = (
        compute_kpis(mk([10.0, 5.0, 0.0]), mk([2.0, 2.0, 2.0]), mk([12.0, 1.0, 0.0]))
        .orderBy("start")
        .toPandas()
    )
    assert np.allclose(out["self_consumption"], [0.0, 4.0, 0.0])  # clipped at 0
    assert np.allclose(out["total_consumption"], [0.0, 6.0, 2.0])
    # v1 constants + v1 operations (reference launcher.py:322-347)
    assert np.allclose(out["co2_saved"], np.array([10, 5, 0]) * 0.00012)
    assert np.allclose(out["tree_equivalent"], np.array([10, 5, 0]) * 0.00012 / 80.0)
    assert np.allclose(out["household_equivalent"], np.array([10, 5, 0]) / 4000.0)


def test_get_timeseries_components():
    xml = (
        "<mh>A</mh><mo>+</mo><mbr><mh>B</mh><mo>*</mo><mc>CO2_FACTOR</mc></mbr>"
        "<mo>-</mo><mv>3</mv>"
    )
    comps = get_timeseries_components(xml)
    assert comps == {"A": "mh", "B": "mh", "CO2_FACTOR": "mc", "3": "mv"}


def test_strip_property_namespace(spark):
    """P8: ontology URIs reduce to their local name; bare names and double
    application are no-ops (the pipeline applies it unconditionally)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from timeseries_harmonizer_spark.functions.extract import (
        strip_property_namespace,
    )

    pdf = pd.DataFrame(
        {
            "p": [
                "https://example.org/ontology#EnergyConsumptionGridElectricity",
                "https://example.org/core/Power",
                "AlreadyBare",
            ]
        }
    )
    out = (
        spark.createDataFrame(pdf)
        .select(
            strip_property_namespace(F.col("p")).alias("one"),
            strip_property_namespace(strip_property_namespace(F.col("p"))).alias("twice"),
        )
        .toPandas()
    )
    assert out["one"].tolist() == [
        "EnergyConsumptionGridElectricity", "Power", "AlreadyBare",
    ]
    assert out["one"].tolist() == out["twice"].tolist()


def test_pyfiles_artifact_importable(tmp_path):
    """The --py-files zip must be importable standalone (fresh interpreter
    path with ONLY the zip), proving the package has no repo-relative
    imports that would break on a cluster."""
    import subprocess
    import sys

    from scripts.package_pyfiles import build

    out = build(str(tmp_path))
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import timeseries_harmonizer_spark as t; "
        "from timeseries_harmonizer_spark.operators.joins import asof_join; "
        "from timeseries_harmonizer_spark.plans.formula import FormulaEngine; "
        "print('zip-import-ok')"
    )
    r = subprocess.run(
        [sys.executable, "-c", code, out],
        capture_output=True, text=True, cwd=str(tmp_path),
    )
    assert "zip-import-ok" in r.stdout, r.stderr
