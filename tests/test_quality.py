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


def test_validate_constraints(spark):
    from anovos_spark.operators.constraints import validate_constraints

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (2, None, -5.0), (3, "z", 200.0)],
        "k int, s string, v double",
    )
    ref = spark.createDataFrame([(1,), (2,)], "rk int")
    rules = [
        {"type": "not_null", "col": "s", "max_missing_frac": 0.3},   # 1/4 -> pass
        {"type": "not_null", "col": "s"},                            # fail
        {"type": "unique", "col": "k"},                              # dup 2 -> fail
        {"type": "in_range", "col": "v", "min": 0, "max": 100,
         "max_violation_frac": 0.5},                                 # 2/4 -> pass
        {"type": "in_set", "col": "s", "values": ["a"]},             # 'z' -> fail
        {"type": "row_count", "min": 1, "max": 10},
        {"type": "referential", "col": "k", "ref": "r", "ref_col": "rk"},  # 3 missing
    ]
    out = {r["rule_idx"]: r for r in
           validate_constraints(df, rules, {"r": ref}).collect()}
    assert out[0]["passed"] == 1 and out[0]["observed"] == 0.25
    assert out[1]["passed"] == 0
    assert out[2]["passed"] == 0 and out[2]["observed"] == round(1 / 4, 6)
    assert out[3]["passed"] == 1 and out[3]["observed"] == 0.5
    assert out[4]["passed"] == 0
    assert out[5]["passed"] == 1 and out[5]["observed"] == 4.0
    # distinct-key semantics: key 3 missing once among 3 distinct keys
    assert out[6]["observed"] == round(1 / 3, 6) and out[6]["passed"] == 0
    import pytest as _p

    with _p.raises(ValueError):
        validate_constraints(df, [{"type": "nope", "col": "k"}])
