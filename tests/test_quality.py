import pytest
from pyspark.sql import functions as F

from anovos_spark.operators import quality


@pytest.fixture(scope="module")
def qdf(spark):
    data = [
        (1, 10.0, "alpha", "x"),
        (2, 12.0, "beta", "x"),
        (3, 11.0, "alpha", "x"),
        (4, 1000.0, "gamma", "x"),   # upper outlier
        (5, 9.0, None, "x"),
        (6, 10.5, "aaa", "x"),       # repeated-char invalid
        (7, 11.5, "abc1", "x"),      # consecutive-ordinal invalid
        (8, 10.2, "n/a", "x"),       # null synonym
        (1, 10.0, "alpha", "x"),     # duplicate of row 1
    ]
    return spark.createDataFrame(data, schema="id int, x double, name string, const string")


def test_duplicates(qdf):
    odf, stats = quality.duplicate_detection(qdf, treatment=True)
    d = {r["metric"]: r["value"] for r in stats.collect()}
    assert d["rows_count"] == 9
    assert d["unique_rows_count"] == 8
    assert d["duplicate_rows"] == 1
    assert odf.count() == 8


def test_null_rows(spark):
    df = spark.createDataFrame(
        [(1, None, None), (2, 1.0, "a"), (3, None, "b")],
        schema="id int, x double, s string",
    )
    odf, stats = quality.null_rows_detection(df, treatment=True, treatment_threshold=0.5)
    d = {r["null_cols_count"]: r for r in stats.collect()}
    assert d[2]["row_count"] == 1
    assert d[2]["flagged"] == 1
    assert d[0]["flagged"] == 0
    assert odf.count() == 2  # row with 2/3 nulls removed


def test_null_columns_row_removal(spark):
    df = spark.createDataFrame(
        [(1, None, "a"), (2, 1.0, "b"), (3, 2.0, None)],
        schema="id int, x double, s string",
    )
    odf, stats = quality.null_columns_detection(df, treatment=True)
    assert odf.count() == 1  # rows with any null in non-flagged cols removed


def test_outlier_clip(qdf):
    odf, stats = quality.outlier_detection(
        qdf, ["x"], min_validation=1, treatment=True, treatment_method="value_replacement"
    )
    d = {r["attribute"]: r for r in stats.collect()}
    assert d["x"]["upper_outliers"] >= 1
    assert odf.agg(F.max("x")).collect()[0][0] < 1000.0


def test_outlier_row_removal(qdf):
    odf, _ = quality.outlier_detection(
        qdf, ["x"], min_validation=1, treatment=True, treatment_method="row_removal"
    )
    assert odf.where(F.col("x") == 1000.0).count() == 0


def test_idness(qdf):
    odf, stats = quality.idness_detection(qdf, treatment=True, treatment_threshold=0.8)
    d = {r["attribute"]: r for r in stats.collect()}
    assert d["id"]["flagged"] == 1  # 8 distinct / 9 non-null = 0.8889 >= 0.8
    assert d["const"]["flagged"] == 0  # 1 distinct / 9
    assert "id" not in odf.columns
    assert "const" in odf.columns


def test_biasedness(qdf):
    odf, stats = quality.biasedness_detection(qdf, treatment=True, treatment_threshold=0.8)
    d = {r["attribute"]: r for r in stats.collect()}
    assert d["const"]["mode_pct"] == 1.0
    assert d["const"]["flagged"] == 1
    assert "const" not in odf.columns


def test_invalid_entries(qdf):
    odf, stats = quality.invalid_entries_detection(
        qdf, ["name"], treatment=True
    )
    d = {r["attribute"]: r for r in stats.collect()}
    # invalids: 'aaa' (repeat), 'abc1' (consecutive), 'n/a' (synonym)
    assert d["name"]["invalid_count"] == 3
    remaining = {r["name"] for r in odf.select("name").collect()}
    assert "aaa" not in remaining and "n/a" not in remaining and "abc1" not in remaining
    assert "alpha" in remaining
