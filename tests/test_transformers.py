import pytest
from pyspark.sql import functions as F

from anovos_spark.operators import transformers as T


@pytest.fixture(scope="module")
def tdf(spark):
    data = [
        (1, 10.0, "a", 1),
        (2, 20.0, "b", 0),
        (3, 30.0, "a", 1),
        (4, 40.0, "c", 0),
        (5, 50.0, "a", 1),
        (6, None, "b", 0),
    ]
    return spark.createDataFrame(data, schema="id int, x double, cat string, y int")


def test_binning_equal_range(tdf):
    odf, model = T.attribute_binning(tdf, ["x"], bin_size=4)
    assert model["x"]["min"] == 10.0 and model["x"]["max"] == 50.0
    vals = {r["id"]: r["x"] for r in odf.collect()}
    assert vals[1] == 1   # 10 → first bin
    assert vals[5] == 4   # 50 = max → last bin
    assert vals[6] is None


def test_binning_equal_frequency(tdf):
    odf, model = T.attribute_binning(tdf, ["x"], method_type="equal_frequency", bin_size=2)
    vals = {r["id"]: r["x"] for r in odf.collect()}
    assert vals[1] == 1 and vals[5] == 2


def test_label_encoding_freq(tdf):
    model = T.label_encoding_fit(tdf, ["cat"])
    assert model["cat"] == {"a": 0, "b": 1, "c": 2}  # freq desc, tie b<c by count then value
    odf = T.label_encoding_apply(tdf, model)
    vals = {r["id"]: r["cat"] for r in odf.collect()}
    assert vals[1] == 0 and vals[2] == 1 and vals[4] == 2


def test_label_encoding_unseen(spark, tdf):
    model = T.label_encoding_fit(tdf, ["cat"])
    df2 = spark.createDataFrame([(9, "zzz")], schema="id int, cat string")
    odf = T.label_encoding_apply(df2, {"cat": model["cat"]})
    assert odf.collect()[0]["cat"] == -1


def test_label_encoding_cardinality_filtered_in_plan(spark):
    """An ID-like column above the threshold is dropped BEFORE collect —
    its mappings never reach the driver (the threshold's whole purpose)."""
    df = spark.range(200).select(
        F.concat(F.lit("id_"), F.col("id").cast("string")).alias("big"),
        (F.col("id") % 3).cast("string").alias("small"),
    )
    model = T.label_encoding_fit(df, ["big", "small"], cardinality_threshold=50)
    assert "big" not in model
    assert set(model["small"]) == {"0", "1", "2"}


def test_one_hot(tdf):
    odf = T.one_hot_encoding(tdf, ["cat"])
    assert {"cat_a", "cat_b", "cat_c"} <= set(odf.columns)
    r = {x["id"]: x for x in odf.collect()}
    assert r[1]["cat_a"] == 1 and r[1]["cat_b"] == 0


def test_target_encoding(tdf):
    model = T.target_encoding_fit(tdf, ["cat"], "y", 1)
    assert model["cat"]["a"] == 1.0
    assert model["cat"]["b"] == 0.0
    odf = T.target_encoding_apply(tdf, model)
    vals = {r["id"]: r["cat"] for r in odf.collect()}
    assert vals[1] == 1.0 and vals[2] == 0.0


def test_z_standardization(tdf):
    odf, model = T.z_standardization(tdf, ["x"])
    stats = odf.agg(F.round(F.avg("x"), 6).alias("m"), F.round(F.stddev("x"), 6).alias("s")).collect()[0]
    assert stats["m"] == 0.0
    assert stats["s"] == 1.0


def test_normalization(tdf):
    odf, model = T.normalization(tdf, ["x"])
    r = odf.agg(F.min("x"), F.max("x")).collect()[0]
    assert r[0] == 0.0 and r[1] == 1.0


def test_iqr_standardization(tdf):
    odf, model = T.iqr_standardization(tdf, ["x"])
    assert "x" in model
    med = odf.agg(F.expr("percentile(x, 0.5)")).collect()[0][0]
    assert abs(med) < 1e-9


def test_imputation_mmm(tdf):
    odf, model = T.imputation_MMM(tdf)
    assert model["x"]["value"] == 30.0  # median of 10..50
    assert odf.where(F.col("x").isNull()).count() == 0
    assert odf.where((F.col("id") == 6) & (F.col("x") == 30.0)).count() == 1


def test_outlier_categories(spark):
    data = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1 + [("d",)] * 1
    df = spark.createDataFrame(data, schema="cat string")
    model = T.outlier_categories_fit(df, ["cat"], coverage=0.8)
    assert model["cat"] == ["a", "b"]  # 0.5, 0.8 cum; c starts at 0.8 >= coverage
    odf = T.outlier_categories_apply(df, model)
    vals = {r["cat"] for r in odf.collect()}
    assert vals == {"a", "b", "outlier_categories"}


def test_feature_transformation(tdf):
    odf = T.feature_transformation(tdf, ["x"], method_type="sqrt", output_mode="append")
    r = {x["id"]: x for x in odf.collect()}
    assert abs(r[4]["x_sqrt"] - 40.0 ** 0.5) < 1e-9
    assert r[6]["x_sqrt"] is None


def test_expression_parser(tdf):
    odf = T.expression_parser(tdf, ["x * 2 as dbl", "id + 100 as idplus"])
    r = odf.where(F.col("id") == 1).collect()[0]
    assert r["dbl"] == 20.0 and r["idplus"] == 101


def test_feature_hashing(spark):
    from anovos_spark.operators.transformers import feature_hashing
    import pytest as _pt

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", None), (3, "a", "x")],
        ["id", "c1", "c2"],
    )
    out = feature_hashing(df, ["c1", "c2"], n_features=16)
    rows = {r["id"]: r for r in out.collect()}
    # deterministic, equal values -> equal buckets
    assert rows[1]["c1_hashed"] == rows[3]["c1_hashed"]
    assert rows[1]["c2_hashed"] == rows[3]["c2_hashed"]
    assert 0 <= rows[1]["c1_hashed"] < 16
    # nulls stay null, not bucket-0
    assert rows[2]["c2_hashed"] is None
    # same VALUE in different columns gets independent buckets (column salt)
    df2 = spark.createDataFrame([(1, "a", "a")], ["id", "c1", "c2"])
    r2 = feature_hashing(df2, ["c1", "c2"], n_features=1 << 20).collect()[0]
    assert r2["c1_hashed"] != r2["c2_hashed"]
    # replace mode swaps columns in place
    rep = feature_hashing(df, ["c1"], n_features=16, output_mode="replace")
    assert rep.schema["c1"].dataType.simpleString() == "int"
    with _pt.raises(ValueError):
        feature_hashing(df, ["c1"], output_mode="bogus")
