"""asof_join vs pandas merge_asof, plus the no-nested-loop plan guarantee."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from timeseries_harmonizer_spark.operators.joins import asof_join


def _fixture():
    rng = np.random.default_rng(3)
    lt = pd.to_datetime(1704067200 + np.sort(rng.integers(0, 50000, 200)), unit="s")
    rt = pd.to_datetime(1704067200 + np.sort(rng.integers(-5000, 45000, 80)), unit="s")
    left = pd.DataFrame(
        {"key": rng.choice(["a", "b", "c"], 200), "ts": lt, "lval": np.arange(200.0)}
    )
    right = pd.DataFrame(
        {"key": rng.choice(["a", "b", "c"], 80), "ts": rt, "price": rng.normal(10, 2, 80).round(3)}
    )
    return left, right


def _pandas_asof(left, right, tolerance=None, direction="backward"):
    kw = {"tolerance": pd.Timedelta(seconds=tolerance)} if tolerance else {}
    return (
        pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("ts").rename(columns={"price": "price_r"}),
            on="ts",
            by="key",
            direction=direction,
            **kw,
        )
        .sort_values(["key", "ts", "lval"])
        .reset_index(drop=True)
    )


def test_asof_join_matches_pandas(spark):
    left, right = _fixture()
    got = (
        asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                  on="ts", by="key", right_cols=["price"])
        .toPandas()
        .sort_values(["key", "ts", "lval"])
        .reset_index(drop=True)
    )
    exp = _pandas_asof(left, right)
    assert len(got) == len(exp) == 200
    np.testing.assert_allclose(
        got["price_r"].to_numpy(dtype=float), exp["price_r"].to_numpy(dtype=float),
        rtol=0, atol=0, equal_nan=True,
    )


def test_asof_join_tolerance(spark):
    left, right = _fixture()
    got = (
        asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                  on="ts", by="key", right_cols=["price"], tolerance_seconds=600)
        .toPandas()
        .sort_values(["key", "ts", "lval"])
        .reset_index(drop=True)
    )
    exp = _pandas_asof(left, right, tolerance=600)
    np.testing.assert_allclose(
        got["price_r"].to_numpy(dtype=float), exp["price_r"].to_numpy(dtype=float),
        rtol=0, atol=0, equal_nan=True,
    )


def test_asof_join_forward_and_nearest_match_pandas(spark):
    """merge_asof's other two directions, with and without tolerance."""
    left, right = _fixture()
    for direction in ("forward", "nearest"):
        for tol in (None, 600):
            got = (
                asof_join(
                    spark.createDataFrame(left), spark.createDataFrame(right),
                    on="ts", by="key", right_cols=["price"],
                    direction=direction, tolerance_seconds=tol,
                )
                .toPandas()
                .sort_values(["key", "ts", "lval"])
                .reset_index(drop=True)
            )
            exp = _pandas_asof(left, right, tolerance=tol, direction=direction)
            np.testing.assert_allclose(
                got["price_r"].to_numpy(dtype=float),
                exp["price_r"].to_numpy(dtype=float),
                rtol=0, atol=0, equal_nan=True,
                err_msg=f"direction={direction} tol={tol}",
            )


def test_asof_join_null_payload_is_atomic(spark):
    """The carried right row is atomic: when the LATEST right row has a NULL
    payload column, the output is NULL (merge_asof/DuckDB ASOF semantics) —
    never a stale value LOCF'd from an older right row — and multiple
    right_cols always come from the same right row."""
    ts = lambda s: pd.Timestamp(s)
    right = pd.DataFrame(
        {
            "key": ["a", "a"],
            "ts": [ts("2024-01-01 00:00:10"), ts("2024-01-01 00:00:20")],
            "price": [1.0, np.nan],
            "qty": [100.0, 200.0],
        }
    )
    left = pd.DataFrame(
        {
            "key": ["a", "a"],
            "ts": [ts("2024-01-01 00:00:15"), ts("2024-01-01 00:00:25")],
        }
    )
    got = (
        asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                  on="ts", by="key", right_cols=["price", "qty"])
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    # ts=15 matches the ts=10 row wholesale; ts=25 matches the ts=20 row
    # wholesale, whose price is NULL — a per-column LOCF would wrongly give 1.0
    assert got.loc[0, "price_r"] == 1.0 and got.loc[0, "qty_r"] == 100.0
    assert pd.isna(got.loc[1, "price_r"]) and got.loc[1, "qty_r"] == 200.0
    # and the tolerance verdict uses the same carried row's ts: with left at
    # 12s and 28s (gaps 2s and 8s to their matched rows), tolerance 5s keeps
    # the first match and voids the second entirely
    left2 = pd.DataFrame(
        {
            "key": ["a", "a"],
            "ts": [ts("2024-01-01 00:00:12"), ts("2024-01-01 00:00:28")],
        }
    )
    got_tol = (
        asof_join(spark.createDataFrame(left2), spark.createDataFrame(right),
                  on="ts", by="key", right_cols=["price", "qty"],
                  tolerance_seconds=5)
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )
    assert got_tol.loc[0, "price_r"] == 1.0 and got_tol.loc[0, "qty_r"] == 100.0
    assert pd.isna(got_tol.loc[1, "price_r"]) and pd.isna(got_tol.loc[1, "qty_r"])


def test_asof_join_randomized_nulls_all_directions(spark):
    """Seeded randomized parity vs merge_asof with NULL payloads injected —
    the struct carry must reproduce pandas exactly in every direction."""
    for seed in (1, 8):
        rng = np.random.default_rng(seed)
        lt = pd.to_datetime(
            1704067200 + np.sort(rng.integers(0, 20000, 120)), unit="s"
        )
        rt = pd.to_datetime(
            1704067200 + np.sort(rng.integers(-2000, 18000, 60)), unit="s"
        )
        price = rng.normal(10, 2, 60).round(3)
        price[rng.random(60) < 0.3] = np.nan  # NULL payloads
        left = pd.DataFrame(
            {"key": rng.choice(["a", "b"], 120), "ts": lt, "lval": np.arange(120.0)}
        )
        right = pd.DataFrame(
            {"key": rng.choice(["a", "b"], 60), "ts": rt, "price": price}
        )
        sl, sr = spark.createDataFrame(left), spark.createDataFrame(right)
        for direction in ("backward", "forward", "nearest"):
            got = (
                asof_join(sl, sr, on="ts", by="key", right_cols=["price"],
                          direction=direction)
                .toPandas()
                .sort_values(["key", "ts", "lval"])
                .reset_index(drop=True)
            )
            exp = _pandas_asof(left, right, direction=direction)
            np.testing.assert_allclose(
                got["price_r"].to_numpy(dtype=float),
                exp["price_r"].to_numpy(dtype=float),
                rtol=0, atol=0, equal_nan=True,
                err_msg=f"seed={seed} direction={direction}",
            )


def test_asof_join_plans_no_nested_loop(spark):
    left, right = _fixture()
    q = asof_join(spark.createDataFrame(left), spark.createDataFrame(right),
                  on="ts", by="key", right_cols=["price"])
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_matches_naive(spark):
    from timeseries_harmonizer_spark.operators.joins import interval_join

    rng = np.random.default_rng(9)
    pts = pd.DataFrame(
        {
            "key": rng.choice(["a", "b"], 300),
            "ts": pd.to_datetime(1704067200 + rng.integers(0, 200000, 300), unit="s"),
            "pval": np.arange(300),
        }
    )
    s = 1704067200 + np.sort(rng.integers(0, 180000, 40))
    iv = pd.DataFrame(
        {
            "key": rng.choice(["a", "b"], 40),
            "start": pd.to_datetime(s, unit="s"),
            "end": pd.to_datetime(s + rng.integers(600, 20000, 40), unit="s"),
            "iv_id": np.arange(40),
        }
    )
    got = (
        interval_join(
            spark.createDataFrame(pts), spark.createDataFrame(iv),
            by="key", bucket_seconds=3600,
        )
        .select("pval", "iv_id")
        .toPandas()
    )
    # naive pandas cross-filter oracle
    m = pts.merge(iv, on="key")
    exp = m[(m["ts"] >= m["start"]) & (m["ts"] <= m["end"])][["pval", "iv_id"]]
    g = set(map(tuple, got.to_numpy().tolist()))
    e = set(map(tuple, exp.to_numpy().tolist()))
    assert g == e and len(got) == len(exp)  # pair set identical, no dup rows


def test_interval_join_plans_no_nested_loop(spark):
    from timeseries_harmonizer_spark.operators.joins import interval_join

    pts = spark.createDataFrame(
        pd.DataFrame({"key": ["a"], "ts": [pd.Timestamp("2024-01-01")]})
    )
    iv = spark.createDataFrame(
        pd.DataFrame(
            {
                "key": ["a"],
                "start": [pd.Timestamp("2024-01-01")],
                "end": [pd.Timestamp("2024-01-02")],
            }
        )
    )
    plan = (
        interval_join(pts, iv, by="key")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_asof_join_property_based(spark):
    """Hypothesis-style property sweep (seeded grid, not @given — each case
    costs a Spark round trip): random key counts, duplicate timestamps,
    NULL payloads, empty sides — always exactly merge_asof."""
    cases = []
    for seed in range(4):
        rng = np.random.default_rng(seed)
        nl, nr = int(rng.integers(0, 40)), int(rng.integers(0, 25))
        keys = ["a", "b", "c"][: int(rng.integers(1, 4))]
        lt = np.sort(rng.integers(0, 5000, nl))
        rt = np.sort(rng.integers(-500, 4500, nr))
        price = rng.normal(0, 1, nr).round(2)
        if nr:
            price[rng.random(nr) < 0.25] = np.nan
        cases.append(
            (
                pd.DataFrame(
                    {"key": rng.choice(keys, nl),
                     "ts": pd.to_datetime(1704067200 + lt, unit="s"),
                     "lval": np.arange(float(nl))}
                ),
                pd.DataFrame(
                    {"key": rng.choice(keys, nr),
                     "ts": pd.to_datetime(1704067200 + rt, unit="s"),
                     "price": price}
                ),
            )
        )
    schema_l = "key string, ts timestamp, lval double"
    schema_r = "key string, ts timestamp, price double"
    for i, (left, right) in enumerate(cases):
        sl = spark.createDataFrame(left, schema=schema_l)
        sr = spark.createDataFrame(right, schema=schema_r)
        got = (
            asof_join(sl, sr, on="ts", by="key", right_cols=["price"])
            .toPandas()
            .sort_values(["key", "ts", "lval"])
            .reset_index(drop=True)
        )
        assert len(got) == len(left)
        if len(left) == 0:
            continue
        exp = _pandas_asof(left, right) if len(right) else left.assign(price_r=np.nan)
        exp = exp.sort_values(["key", "ts", "lval"]).reset_index(drop=True)
        np.testing.assert_allclose(
            got["price_r"].to_numpy(dtype=float),
            exp["price_r"].to_numpy(dtype=float),
            rtol=0, atol=0, equal_nan=True, err_msg=f"case {i}",
        )
