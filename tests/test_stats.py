import pytest
from pyspark.sql import functions as F

from anovos_spark.operators import stats


@pytest.fixture(scope="module")
def small_df(spark):
    data = [
        (1, 10.0, "a"),
        (2, 20.0, "b"),
        (3, None, "a"),
        (4, 40.0, None),
        (5, 50.0, "a"),
        (6, 0.0, "c"),
    ]
    return spark.createDataFrame(data, schema="id int, x double, cat string")


def _as_dict(df, key="attribute"):
    return {r[key]: r.asDict() for r in df.collect()}


def test_global_summary(small_df):
    d = {r["metric"]: r["value"] for r in stats.global_summary(small_df).collect()}
    assert d["rows_count"] == "6"
    assert d["columns_count"] == "3"
    assert d["numcols_count"] == "2"
    assert d["catcols_count"] == "1"


def test_missing_count(small_df):
    d = _as_dict(stats.missing_count(small_df))
    assert d["x"]["missing_count"] == 1
    assert d["cat"]["missing_count"] == 1
    assert d["id"]["missing_count"] == 0
    assert abs(d["x"]["missing_pct"] - round(1 / 6, 6)) < 1e-9


def test_nonzero_count(small_df):
    d = _as_dict(stats.nonzero_count(small_df))
    assert d["x"]["nonzero_count"] == 4  # 10,20,40,50 (null and 0 excluded)
    assert d["id"]["nonzero_count"] == 6


def test_mode_deterministic(small_df):
    d = _as_dict(stats.mode_computation(small_df, ["cat"]))
    assert d["cat"]["mode"] == "a"
    assert d["cat"]["mode_rows"] == 3


def test_mode_tie_break(spark):
    df = spark.createDataFrame([("b",), ("b",), ("a",), ("a",)], schema="c string")
    d = _as_dict(stats.mode_computation(df, ["c"]))
    assert d["c"]["mode"] == "a"  # tie → smallest value


def test_central_tendency(small_df):
    d = _as_dict(stats.measures_of_central_tendency(small_df))
    assert d["x"]["mean"] == 24.0  # (10+20+40+50+0)/5
    assert d["x"]["median"] == 20.0
    assert d["cat"]["mode"] == "a"
    assert d["cat"]["mode_pct"] == 0.6  # 3/5 non-null


def test_unique_and_cardinality(small_df):
    d = _as_dict(stats.unique_count(small_df))
    assert d["cat"]["unique_values"] == 3
    assert d["id"]["unique_values"] == 6
    card = _as_dict(stats.measures_of_cardinality(small_df))
    assert card["id"]["IDness"] == 1.0
    assert card["cat"]["IDness"] == 0.6


def test_dispersion(small_df):
    d = _as_dict(stats.measures_of_dispersion(small_df))
    assert d["x"]["range"] == 50.0
    assert d["x"]["variance"] == pytest.approx(430.0, abs=1e-2)


def test_dispersion_huge_values_fall_back_to_double(spark):
    """|x| >= 1e12 leaves the decimal(18,6) square's domain: the guarded
    double-sum fallback must produce the right variance instead of the
    silent-null corruption of an unguarded decimal cast."""
    data = [(float(2e12),), (float(3e12),), (float(4e12),)]
    df = spark.createDataFrame(data, schema="x double")
    d = _as_dict(stats.measures_of_dispersion(df, exact=True))
    assert d["x"]["variance"] == pytest.approx(1e24, rel=1e-6)
    assert d["x"]["stddev"] == pytest.approx(1e12, rel=1e-6)


def test_percentiles(small_df):
    d = _as_dict(stats.measures_of_percentiles(small_df))
    assert d["x"]["pct_min"] == 0.0
    assert d["x"]["pct_max"] == 50.0
    assert d["x"]["pct_50"] == 20.0


def test_shape(small_df):
    d = _as_dict(stats.measures_of_shape(small_df))
    assert "skewness" in d["x"]
    assert d["x"]["kurtosis"] is not None


def test_counts_vs_lineitem(lineitem):
    d = _as_dict(stats.measures_of_counts(lineitem))
    total = lineitem.count()
    assert d["l_quantity"]["fill_count"] == total
    assert d["l_quantity"]["missing_count"] == 0


def test_heavy_hitters_exact(spark):
    from pyspark.sql import functions as F

    from anovos_spark.operators.sketches import heavy_hitters

    # skewed stream: value 'hot' at 40%, 'warm' at 10%, long tail of
    # uniques — spread over many partitions to exercise the MG merge
    rows = (["hot"] * 400 + ["warm"] * 100 + [f"t{i}" for i in range(500)])
    df = spark.createDataFrame([(v,) for v in rows], "v string").repartition(16)
    got = {r["value"]: r["count"] for r in heavy_hitters(df, "v", support=0.05).collect()}
    assert got == {"hot": 400, "warm": 100}
    # tight capacity still exact (margin=1 -> capacity = 1/support)
    got2 = {r["value"]: r["count"]
            for r in heavy_hitters(df, "v", support=0.05, margin=1).collect()}
    assert got2 == got
    # support below the tail admits everything; counts stay exact
    all_vals = heavy_hitters(df, "v", support=1e-4)
    assert all_vals.count() == 502
    assert all_vals.agg(F.sum("count")).collect()[0][0] == 1000
    import pytest as _p

    with _p.raises(ValueError):
        heavy_hitters(df, "v", support=0.0)


def test_grouped_summary(spark):
    from anovos_spark.operators.stats import grouped_summary

    df = spark.createDataFrame(
        [("a", 1.0, 10.0), ("a", 3.0, None), ("b", 5.0, 20.0)],
        "g string, x double, y double",
    )
    out = {(r["g"], r["attribute"]): r
           for r in grouped_summary(df, "g", ["x", "y"], exact=True).collect()}
    ax = out[("a", "x")]
    assert ax["n"] == 2 and ax["mean"] == 2.0 and ax["stddev"] == round(2**0.5, 6)
    assert out[("a", "y")]["n_missing"] == 1 and out[("a", "y")]["stddev"] is None
    assert out[("b", "x")]["n"] == 1 and out[("b", "x")]["stddev"] is None
    assert out[("b", "y")]["vmin"] == 20.0 == out[("b", "y")]["vmax"]
    # group columns never profile themselves
    df2 = spark.createDataFrame([("a", 1.0, 2)], "g string, x double, k int")
    attrs = {r["attribute"] for r in grouped_summary(df2, "k").collect()}
    assert attrs == {"x"}


def test_measures_of_robustness(spark):
    from anovos_spark.operators.stats import measures_of_robustness

    # a wild outlier must not inflate its own cutoff
    rows = [(float(i % 10),) for i in range(100)] + [(10_000.0,)]
    df = spark.createDataFrame(rows, "x double")
    out = measures_of_robustness(df, ["x"], exact=True).collect()[0]
    # 101 values: ten each of 0..9 plus the outlier -> median 5, MAD 3
    assert out["median"] == 5.0
    assert out["mad"] == 3.0 and out["mad_scaled"] == round(3 * 1.4826, 6)
    assert out["robust_outliers"] == 1  # only the planted 10k point
    # constant column: mad 0, and the cutoff never divides by it
    dfc = spark.createDataFrame([(5.0,)] * 10, "x double")
    outc = measures_of_robustness(dfc, ["x"], exact=True).collect()[0]
    assert outc["mad"] == 0.0 and outc["robust_outliers"] == 0
    # an all-null column must not crash the whole battery (the learned
    # median is None; interpolating it into SQL would fail analysis)
    dfn = spark.createDataFrame(
        [(1.0, None), (2.0, None), (3.0, None)], "x double, y double"
    )
    outn = {r["attribute"]: r for r in
            measures_of_robustness(dfn, ["x", "y"], exact=True).collect()}
    assert outn["x"]["median"] == 2.0 and outn["x"]["mad"] == 1.0
    assert outn["y"]["median"] is None and outn["y"]["mad"] is None
    assert outn["y"]["robust_outliers"] == 0
