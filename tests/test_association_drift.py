import math

import pytest
from pyspark.sql import functions as F

from anovos_spark.operators import association as A
from anovos_spark.operators import drift as D


@pytest.fixture(scope="module")
def adf(spark):
    # x perfectly separates y; z is noise-free constant-ish
    data = [
        (1.0, 10.0, "a", 1),
        (2.0, 20.0, "b", 1),
        (3.0, 30.0, "a", 1),
        (11.0, 10.0, "b", 0),
        (12.0, 20.0, "a", 0),
        (13.0, 30.0, "b", 0),
    ]
    return spark.createDataFrame(data, schema="x double, z double, cat string, y int")


def test_correlation(adf):
    d = {(r["attribute1"], r["attribute2"]): r["corr"] for r in A.correlation_matrix(adf, ["x", "z", "y"]).collect()}
    assert d[("x", "x")] == 1.0
    assert d[("x", "y")] == d[("y", "x")]
    assert d[("x", "y")] < -0.9  # x separates y inversely


def test_correlation_wide_path_matches_pairwise(adf):
    """Above the threshold the ml.stat.Correlation path must agree with
    the pairwise F.corr battery (no nulls here, so drop-row semantics
    coincide)."""
    narrow = {(r["attribute1"], r["attribute2"]): r["corr"]
              for r in A.correlation_matrix(adf, ["x", "z", "y"]).collect()}
    wide = {(r["attribute1"], r["attribute2"]): r["corr"]
            for r in A.correlation_matrix(adf, ["x", "z", "y"], wide_threshold=2).collect()}
    assert set(narrow) == set(wide)
    for k in narrow:
        assert wide[k] == pytest.approx(narrow[k], abs=1e-6)


def test_ig_perfect_separator(adf):
    d = {r["attribute"]: r["ig"] for r in A.ig_calculation(adf, "y", 1, ["x", "cat"], bin_size=2, bin_method="equal_range").collect()}
    assert d["x"] == pytest.approx(1.0, abs=1e-6)  # perfect split → full bit
    # cat (a→{1,1,0}, b→{1,0,0}) carries a fraction of a bit
    assert 0.0 < d["cat"] < 0.2


def test_iv_smoothing_applied(adf):
    d = {r["attribute"]: r["iv"] for r in A.iv_calculation(adf, "y", 1, ["x", "cat"], bin_size=2, bin_method="equal_range").collect()}
    # pure bins → smoothed woe = ln((3.5/3)/(0.5/3)); iv = 2·woe·1 ≈ 3.8918
    assert d["x"] == pytest.approx(2 * math.log((3.5 / 3) / (0.5 / 3)), abs=1e-4)
    assert 0.0 < d["cat"] < 1.0


def test_drift_identical_frames(spark):
    df = spark.range(1000).select(
        (F.col("id") % 100).cast("double").alias("v"),
        F.concat(F.lit("c"), (F.col("id") % 3).cast("string")).alias("cat"),
    )
    out = D.drift_statistics(df, df, ["v", "cat"])
    for r in out.collect():
        assert r["PSI"] == 0.0 and r["JSD"] == 0.0 and r["HD"] == 0.0 and r["KS"] == 0.0
        assert r["flagged"] == 0


def test_drift_single_method_string(spark):
    """method_type='PSI' (the reference API default call style) must select
    the one metric — not split the string into characters."""
    df = spark.range(100).select((F.col("id") % 10).cast("double").alias("v"))
    out = D.drift_statistics(df, df, ["v"], method_type="PSI")
    assert "PSI" in out.columns and "JSD" not in out.columns
    with pytest.raises(ValueError):
        D.drift_statistics(df, df, ["v"], method_type="BOGUS").collect()


def test_drift_shifted(spark):
    a = spark.range(2000).select((F.col("id") % 100).cast("double").alias("v"))
    b = spark.range(2000).select(((F.col("id") % 100) + 50).cast("double").alias("v"))
    out = {r["attribute"]: r for r in D.drift_statistics(b, a, ["v"]).collect()}
    assert out["v"]["PSI"] > 0.1
    assert out["v"]["flagged"] == 1


def test_stability_stable_vs_unstable(spark):
    stable = [
        spark.range(500).select(((F.col("id") % 10) + 1).cast("double").alias("s"),
                                ((F.col("id") % 10) * (i + 1) * 10.0).alias("u"))
        for i in range(4)
    ]
    out = {r["attribute"]: r for r in D.stability_index_computation(stable, ["s", "u"]).collect()}
    assert out["s"]["stability_index"] == 4.0
    assert out["u"]["stability_index"] < out["s"]["stability_index"]
    assert out["u"]["flagged"] in (0, 1)


def test_feature_stability_estimation(spark):
    # stable attribute stats across 4 periods → derived feature stable
    rows = []
    for i in range(4):
        rows.append((i, "x", 10.0 + i * 0.01, 2.0))
        rows.append((i, "y", 5.0, 1.0 + i * 0.001))
    stats_df = spark.createDataFrame(rows, "idx int, attribute string, mean double, stddev double")
    out = D.feature_stability_estimation(stats_df, "log(x) + y**2").collect()[0]
    assert out["stability_index"] == 4.0
    assert out["flagged"] == 0
    # unstable means → low index
    rows2 = [(i, "x", 10.0 * (2 ** i), 2.0) for i in range(4)]
    rows2 += [(i, "y", 5.0, 1.0) for i in range(4)]
    stats2 = spark.createDataFrame(rows2, "idx int, attribute string, mean double, stddev double")
    out2 = D.feature_stability_estimation(stats2, "x + y").collect()[0]
    assert out2["stability_index"] < out["stability_index"]
    assert out2["flagged"] in (0, 1)
