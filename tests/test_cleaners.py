"""C1-C11 cleaner parity: native Spark window expressions vs the pandas
kernels, plus hand-pinned micro-fixtures (FIXTURES.md §B)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseries_harmonizer_spark.functions import series_kernels as K
from timeseries_harmonizer_spark.operators import cleaning as CL


def _series_df(spark, values, start="2024-01-01", freq="15min", url="u1"):
    idx = pd.date_range(start, periods=len(values), freq=freq)
    pdf = pd.DataFrame({"url": url, "warc_ts": idx, "value": np.array(values, dtype="float64")})
    return spark.createDataFrame(pdf), pd.Series(np.array(values, dtype="float64"), index=idx)


def _col(df, name="value"):
    return df.toPandas().sort_values("warc_ts")[name].to_numpy()


def _eq(a, b):
    a, b = np.asarray(a, dtype="float64"), np.asarray(b, dtype="float64")
    assert len(a) == len(b), (len(a), len(b))
    same = (a == b) | (np.isnan(a) & np.isnan(b))
    assert same.all(), np.c_[a, b][~same]


def test_percentile_clean_iqr_floor(spark):
    # tight cluster -> IQR floored at 1 (reference clean_outliers.py:79)
    vals = [10.0, 10.1, 10.2, 10.1, 10.0, 10.2, 14.0, 10.1, 6.0]
    df, s = _series_df(spark, vals)
    got = _col(CL.percentile_clean(df, key="url"))
    _eq(got, K.percentile_clean(s).to_numpy())
    # the 14.0 and 6.0 fall outside [p10-1.5, p90+1.5] with floor 1
    assert np.isnan(got[6]) and np.isnan(got[8])


def test_max_power_clean_first_row_nan(spark):
    # default max_power 10000; 15min spacing -> threshold 2500/step
    vals = [100.0, 200.0, 9000.0, 300.0, 310.0]
    df, s = _series_df(spark, vals)
    got = _col(CL.max_power_clean(df, accumulated=False))
    exp = K.max_power_clean(s, 10000.0, accumulated=False).to_numpy()
    _eq(got, exp)
    assert np.isnan(got[0])  # first row: NaN delta compares False
    assert np.isnan(got[2])  # 9000 >= 2500


def test_max_power_clean_accumulated(spark):
    vals = [0.0, 100.0, 5000.0, 5100.0, 5200.0]
    df, s = _series_df(spark, vals)
    got = _col(CL.max_power_clean(df, accumulated=True))
    _eq(got, K.max_power_clean(s, 10000.0, accumulated=True).to_numpy())
    assert np.isnan(got[2])  # +4900 increment over 15min >= 2500


def test_incremental_only(spark):
    vals = [1.0, 2.0, 1.5, 3.0, np.nan, 2.0, 4.0]
    df, s = _series_df(spark, vals)
    got = CL.incremental_only_clean(df).toPandas().sort_values("warc_ts")["value"].to_numpy()
    exp = K.incremental_only_clean(s).to_numpy()
    _eq(got, exp)
    # 1.5 and the later 2.0 dropped; NaN kept
    assert len(got) == 5


def test_night_clean_instantaneous(spark):
    idx = pd.date_range("2024-01-01 21:00", periods=8, freq="2h")
    vals = np.arange(8, dtype="float64") + 1
    pdf = pd.DataFrame({"url": "u", "warc_ts": idx, "value": vals})
    df = spark.createDataFrame(pdf)
    got = _col(CL.night_consumption_clean(df, accumulated=False))
    exp = K.night_consumption_clean(pd.Series(vals, index=idx), accumulated=False).to_numpy()
    _eq(got, exp)
    assert got[1] == 0.0  # 23:00 zeroed


def test_night_clean_accumulated_sentinel(spark):
    # NaN at 21:00 then night rows: LOCF must not resurrect the pre-NaN value
    idx = pd.date_range("2024-01-01 20:00", periods=6, freq="1h")
    # NaN at 22:00, night rows are 23:00/00:00/01:00 (indices 3,4,5)
    vals = np.array([10.0, 11.0, np.nan, 13.0, 14.0, 15.0])
    pdf = pd.DataFrame({"url": "u", "warc_ts": idx, "value": vals})
    df = spark.createDataFrame(pdf)
    got = _col(CL.night_consumption_clean(df, accumulated=True))
    exp = K.night_consumption_clean(pd.Series(vals, index=idx), accumulated=True).to_numpy()
    _eq(got, exp)
    # night rows LOCF from the NaN sentinel -> NaN, not 11.0
    assert np.isnan(got[2]) and np.isnan(got[3]) and np.isnan(got[4]) and np.isnan(got[5])
    assert got[1] == 11.0


def test_drop_negative_diffs(spark):
    vals = [1.0, 2.0, 1.0, 3.0, 2.5, 4.0]
    df, s = _series_df(spark, vals)
    got = CL.drop_negative_diffs(df).toPandas().sort_values("warc_ts")["value"].to_numpy()
    _eq(got, K.drop_negative_diffs(s).to_numpy())


def test_unit_convert_defaults(spark):
    pdf = pd.DataFrame(
        {
            "value": [10.0, 10.0, 10.0, 10.0],
            "raw_conv_ratio": [2.0, np.nan, None, 0.0],
            "raw_conv_offset": [1.0, np.nan, 3.0, None],
            "harm_conv_ratio": [4.0, None, 2.0, np.nan],
            "harm_conv_offset": [0.5, 1.0, np.nan, None],
        }
    )
    df = spark.createDataFrame(pdf)
    got = CL.unit_convert(df).toPandas()["value"].to_numpy()
    import oracle

    exp = [
        oracle.unit_convert(10.0, r.raw_conv_ratio, r.harm_conv_ratio, r.raw_conv_offset, r.harm_conv_offset)
        for r in pdf.itertuples()
    ]
    _eq(got, exp)


def test_sentinel(spark):
    df, _ = _series_df(spark, [1.0, 2147483648.0, -2147483648.0, 5.0])
    got = _col(CL.sentinel_to_null(df))
    _eq(got, [1.0, np.nan, np.nan, 5.0])


def test_detect_reset_sessions(spark):
    # counter resets to near zero -> new segment (reference clean_outliers.py:44-50)
    vals = [100.0, 200.0, 300.0, 5.0, 100.0, 200.0]
    df, _ = _series_df(spark, vals)
    got = CL.detect_reset_sessions(df).toPandas().sort_values("warc_ts")["reset_id"].to_numpy()
    assert list(got) == [0, 0, 0, 1, 1, 1]


def test_znorm_spike_removed(spark):
    rng = np.random.default_rng(1)
    vals = 100 + np.round(rng.normal(0, 1, 80), 2)
    vals[60] = 5000.0
    df, s = _series_df(spark, vals, freq="1h")
    got = CL.znorm_clean(df).toPandas().sort_values("warc_ts")
    exp = K.znorm_clean(s)
    _eq(got["value"].to_numpy(), exp.to_numpy())
    assert len(got) == 30  # first 50 dropped
    assert np.isnan(got["value"].to_numpy()[10])  # the spike (row 60)


def test_composite_modbus(spark):
    rng = np.random.default_rng(2)
    inc = rng.integers(1, 10, 99).astype("float64")
    vals = np.concatenate([[0.0], np.cumsum(inc)])
    vals[40] = vals[39] + 100000  # absurd jump -> percentile-cleaned out
    pdf = pd.DataFrame(
        {
            "url": "u",
            "warc_ts": pd.date_range("2024-01-01 06:00", periods=100, freq="15min"),
            "value": vals,
            "property": "Consumption",
            "max_power": 10000.0,
            "agg_func": "SUM",
        }
    )
    df = spark.createDataFrame(pdf)
    got = CL.composite_clean(df, kind="modbus").toPandas().sort_values("warc_ts")
    s = pd.Series(vals, index=pdf["warc_ts"])
    exp = K.clean_modbus_energy_data(s, "Consumption", 10000.0, "SUM")
    _eq(got["value"].to_numpy(), exp.to_numpy())
