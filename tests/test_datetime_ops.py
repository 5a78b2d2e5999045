import datetime

import pytest
from pyspark.sql import functions as F

from anovos_spark.operators import datetime_ops as DT


@pytest.fixture(scope="module")
def ddf(spark):
    rows = [
        (1, datetime.datetime(2024, 1, 1, 5, 30, 0), 10.0),
        (1, datetime.datetime(2024, 2, 29, 23, 0, 0), 20.0),  # leap day
        (1, datetime.datetime(2024, 3, 31, 12, 0, 0), 30.0),
        (2, datetime.datetime(2023, 12, 31, 0, 0, 0), 40.0),
        (2, datetime.datetime(2024, 6, 15, 8, 0, 0), 50.0),
    ]
    return spark.createDataFrame(rows, schema="uid int, ts timestamp, v double")


def test_time_units(ddf):
    odf = DT.time_units_extraction(ddf, ["ts"], ["year", "month", "hour", "dayofweek"])
    r = odf.where(F.dayofmonth("ts") == 29).collect()[0]
    assert r["ts_year"] == 2024 and r["ts_month"] == 2 and r["ts_hour"] == 23


def test_unix_roundtrip(ddf):
    odf = DT.timestamp_to_unix(ddf, ["ts"])
    odf = DT.unix_to_timestamp(odf, ["ts_unix"])
    assert odf.where(F.col("ts") != F.col("ts_unix_ts")).count() == 0


def test_calendar_flags(ddf):
    odf = DT.is_leap_year(ddf, ["ts"])
    odf = DT.is_month_end(odf, ["ts"])
    odf = DT.is_weekend(odf, ["ts"])
    rows = {r["v"]: r for r in odf.collect()}
    assert rows[20.0]["ts_isLeapYear"] == 1
    assert rows[40.0]["ts_isLeapYear"] == 0
    assert rows[20.0]["ts_isMonthEnd"] == 1  # Feb 29 is month end in 2024
    assert rows[40.0]["ts_isMonthEnd"] == 1  # Dec 31
    assert rows[40.0]["ts_isWeekend"] == 1  # 2023-12-31 is a Sunday


def test_quarter_bounds(ddf):
    odf = DT.start_of_quarter(ddf, ["ts"])
    odf = DT.end_of_quarter(odf, ["ts"])
    r = {x["v"]: x for x in odf.collect()}
    assert str(r[20.0]["ts_quarterStart"]) == "2024-01-01"
    assert str(r[20.0]["ts_quarterEnd"]) == "2024-03-31"
    assert str(r[50.0]["ts_quarterEnd"]) == "2024-06-30"


def test_adding_time_units(ddf):
    odf = DT.adding_time_units(ddf, ["ts"], "day", 1)
    r = odf.where(F.col("v") == 20.0).collect()[0]
    assert str(r["ts_adjusted"]).startswith("2024-03-01")


def test_aggregator(ddf):
    out = DT.aggregator(ddf, ["v"], ["count", "sum", "max"], "ts", "yyyy")
    d = {r["ts"]: r for r in out.collect()}
    assert d["2024"]["v_count"] == 4
    assert d["2023"]["v_sum"] == 40.0


def test_window_aggregator_rolling(ddf):
    out = DT.window_aggregator(
        ddf, ["v"], ["sum"], "ts", "rolling", 2, partition_col="uid"
    )
    rows = sorted(
        [(r["uid"], r["v"], r["v_sum_w"]) for r in out.collect()]
    )
    assert (1, 30.0, 50.0) in rows  # 20+30
    assert (2, 50.0, 90.0) in rows  # 40+50


def test_window_aggregator_requires_partition(ddf):
    with pytest.raises(ValueError):
        DT.window_aggregator(ddf, ["v"], ["sum"], "ts", partition_col=None)


def test_lagged_ts(ddf):
    out = DT.lagged_ts(ddf, ["v"], lag=1, output_type="ts_diff",
                       partition_col="uid", order_col="ts")
    r = {x["v"]: x for x in out.collect()}
    assert r[30.0]["v_lag1"] == 20.0
    assert r[30.0]["v_lag1_diff"] == 10.0
    assert r[10.0]["v_lag1"] is None


def test_timestamp_comparison(ddf):
    out = DT.timestamp_comparison(ddf, ["ts"], "less_than", "2024-01-01 00:00:00")
    r = {x["v"]: x["ts_compared"] for x in out.collect()}
    assert r[40.0] == 1 and r[20.0] == 0


def test_time_weighted_avg(spark):
    import datetime as dt

    from anovos_spark.operators.datetime_ops import time_weighted_avg

    B = dt.datetime(2024, 1, 1)
    T = lambda m: B + dt.timedelta(minutes=m)
    df = spark.createDataFrame(
        [("g", T(0), 10.0), ("g", T(10), 100.0), ("g", T(60), 0.0),
         ("solo", T(0), 5.0)],
        "g string, ts timestamp, v double",
    )
    out = {r["g"]: r for r in time_weighted_avg(df, "g", "ts", "v").collect()}
    # 10 for 10min then 100 for 50min -> (10*600 + 100*3000)/3600 = 85
    assert out["g"]["twa"] == 85.0 and out["g"]["span_seconds"] == 3600
    assert out["g"]["plain_avg"] == round((10 + 100 + 0) / 3, 6)
    # a single observation spans nothing -> twa null, not a crash
    assert out["solo"]["twa"] is None and out["solo"]["n_obs"] == 1


def test_cusum_closed_form_equals_recursion(spark):
    import datetime as dt
    import random

    from anovos_spark.operators.datetime_ops import cusum_changepoints

    rng = random.Random(7)
    B = dt.datetime(2024, 1, 1)
    rows = [("g", B + dt.timedelta(minutes=i), i, rng.uniform(-2, 2)
             + (3 if i >= 30 else 0)) for i in range(60)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, i int, v double")
    cp = cusum_changepoints(df, "g", "ts", "v", target=0.0, threshold=8.0,
                            tiebreak_cols="i")
    got = [(r["cusum_pos"], r["cusum_neg"]) for r in cp.orderBy("ts").collect()]
    sp = sn = 0.0
    for _, _, _, v in rows:
        sp = max(0.0, sp + v)
        sn = min(0.0, sn + v)
        exp = (round(sp, 6), round(-sn, 6))
        assert got.pop(0) == exp
    # the upward shift at i=30 must raise a flag
    assert cp.where("flagged = 1").count() > 0


def test_benford_check(spark):
    from pyspark.sql import functions as F

    from anovos_spark.operators.datetime_ops import benford_check

    # perfectly Benford-shaped counts -> chi2 terms ~ 0
    import math

    rows = []
    for d in range(1, 10):
        n = round(10000 * math.log10(1 + 1 / d))
        rows += [(float(f"{d}00") + i % 7,) for i in range(n)]
    df = spark.createDataFrame(rows, "x double")
    out = benford_check(df, ["x"])
    assert out.agg(F.max("chi2_term")).collect()[0][0] < 1.0
    # sub-1 values take their first SIGNIFICANT digit; every digit 1-9
    # emits a row (zero-count digits carry chi2 = tot·P(d), not silence)
    df2 = spark.createDataFrame([(0.053,), (0.9,), (700.0,)], "x double")
    rows2 = benford_check(df2, ["x"]).collect()
    assert len(rows2) == 9
    assert sorted(r["digit"] for r in rows2 if r["n"] > 0) == [5, 7, 9]
    zero = {r["digit"]: r for r in rows2 if r["n"] == 0}
    assert sorted(zero) == [1, 2, 3, 4, 6, 8]
    for d, r in zero.items():
        assert r["observed_frac"] == 0.0
        assert abs(r["chi2_term"] - 3 * math.log10(1 + 1 / d)) < 1e-6


def test_benford_check_all_null_attribute_absent(spark):
    # regression (r5): an attribute whose values are ALL null/zero must be
    # absent entirely — not emit 9 rows of 0/0-null statistics that
    # downstream chi2 sums would silently treat as 0
    from pyspark.sql import functions as F

    from anovos_spark.operators.datetime_ops import benford_check

    df = spark.createDataFrame(
        [(123.0, None, 0.0), (456.0, None, 0.0)],
        "good double, allnull double, allzero double",
    )
    out = benford_check(df, ["good", "allnull", "allzero"])
    attrs = sorted(r["attribute"] for r in out.select("attribute").distinct().collect())
    assert attrs == ["good"]
    # and no null statistic cells anywhere
    assert out.where(
        F.col("observed_frac").isNull() | F.col("chi2_term").isNull()
    ).count() == 0


def test_time_weighted_avg_magnitude_guard(spark):
    """|value| >= 1e12 must FAIL FAST (in-plan raise), not silently null
    out of the decimal(18,6) pipeline; NULL values still pass through."""
    base = [
        ("g", datetime.datetime(2024, 1, 1, 0, 0, i), float(i + 1))
        for i in range(4)
    ]
    with_null = base + [("g", datetime.datetime(2024, 1, 1, 0, 1, 0), None)]
    df = spark.createDataFrame(with_null, "g string, ts timestamp, v double")
    row = DT.time_weighted_avg(df, "g", "ts", "v").collect()[0]
    assert row["n_obs"] == 5 and row["twa"] is not None

    bad = base + [("g", datetime.datetime(2024, 1, 1, 0, 1, 0), 2e12)]
    dfb = spark.createDataFrame(bad, "g string, ts timestamp, v double")
    with pytest.raises(Exception, match="exceeds the exact decimal"):
        DT.time_weighted_avg(dfb, "g", "ts", "v").collect()


def test_time_weighted_avg_nan_passes_like_null(spark):
    """ADVICE r6: NaN must NOT hit the magnitude fail-fast (whose
    'rescale' message misdiagnoses the input) — it passes through like
    NULL: the decimal cast nulls it and the row drops from both
    averages, matching pre-guard behavior."""
    base = [
        ("g", datetime.datetime(2024, 1, 1, 0, 0, i), float(i + 1))
        for i in range(4)
    ]
    with_nan = base + [("g", datetime.datetime(2024, 1, 1, 0, 1, 0), float("nan"))]
    df = spark.createDataFrame(with_nan, "g string, ts timestamp, v double")
    clean = DT.time_weighted_avg(
        spark.createDataFrame(base + [("g", datetime.datetime(2024, 1, 1, 0, 1, 0), None)],
                              "g string, ts timestamp, v double"),
        "g", "ts", "v",
    ).collect()[0]
    row = DT.time_weighted_avg(df, "g", "ts", "v").collect()[0]
    assert row["n_obs"] == 5
    assert row["twa"] == clean["twa"] and row["plain_avg"] == clean["plain_avg"]
