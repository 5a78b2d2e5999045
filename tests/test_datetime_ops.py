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
