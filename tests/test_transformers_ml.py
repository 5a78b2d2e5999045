import pytest
from pyspark.sql import functions as F

from anovos_spark.operators import transformers_ml as TML


@pytest.fixture(scope="module")
def mdf(spark):
    import random

    random.seed(7)
    rows = []
    for i in range(400):
        a = random.gauss(10, 2)
        b = 2 * a + random.gauss(0, 0.1)   # correlated with a
        c = random.random() * 5 + 1         # independent, positive
        y = 1 if a > 10 else 0
        rows.append((i, a, b, c, y))
    return spark.createDataFrame(rows, schema="id int, a double, b double, c double, y int")


def test_pca_latent(mdf):
    odf, model = TML.pca_latent_features(mdf, ["a", "b", "c"], explained_variance_cutoff=0.9)
    assert model["k"] < 3  # a,b nearly collinear → 2 components suffice
    assert f"latent_{model['k']-1}" in odf.columns
    assert odf.count() == 400


def test_knn_imputation(spark, mdf):
    holey = mdf.withColumn("a", F.when(F.col("id") % 7 == 0, None).otherwise(F.col("a")))
    imputed = TML.imputation_knn(holey, ["a", "b", "c"], k=3, sample_size=300)
    assert imputed.where(F.col("a").isNull()).count() == 0
    # imputed a should be close to b/2 thanks to the correlation
    j = imputed.alias("i").join(mdf.alias("t"), "id").where(F.col("id") % 7 == 0)
    err = j.agg(F.avg(F.abs(F.col("i.a") - F.col("t.a")))).collect()[0][0]
    assert err < 1.0  # far better than mean imputation (σ=2)


def test_als_imputation(spark, mdf):
    holey = mdf.withColumn("a", F.when(F.col("id") % 11 == 0, None).otherwise(F.col("a")))
    imputed = TML.imputation_als(holey, "id", ["a", "b", "c"], rank=4, max_iter=8)
    assert imputed.where(F.col("a").isNull()).count() == 0
    assert imputed.count() == 400


def test_als_imputation_append_mode(spark, mdf):
    # output_mode='append' keeps the holey original and adds a_imputed
    # (regression: the parameter used to be accepted and ignored)
    holey = mdf.withColumn("a", F.when(F.col("id") % 11 == 0, None).otherwise(F.col("a")))
    n_null = holey.where(F.col("a").isNull()).count()
    out = TML.imputation_als(holey, "id", ["a", "b", "c"], rank=4, max_iter=8,
                             output_mode="append")
    assert "a_imputed" in out.columns and "a" in out.columns
    assert out.where(F.col("a").isNull()).count() == n_null  # original untouched
    assert out.where(F.col("a_imputed").isNull()).count() == 0
    with pytest.raises(ValueError, match="output_mode"):
        TML.imputation_als(holey, "id", ["a"], output_mode="bogus")


def test_regression_imputation(spark, mdf):
    holey = mdf.withColumn("a", F.when(F.col("id") % 7 == 0, None).otherwise(F.col("a")))
    imputed = TML.imputation_regression(holey, ["a", "b", "c"], sample_size=400)
    assert imputed.where(F.col("a").isNull()).count() == 0
    assert imputed.count() == 400
    # b = 2a + ε(σ=0.1): conditional mean recovers a almost exactly
    j = imputed.alias("i").join(mdf.alias("t"), "id").where(F.col("id") % 7 == 0)
    err = j.agg(F.avg(F.abs(F.col("i.a") - F.col("t.a")))).collect()[0][0]
    assert err < 0.2  # far better than mean imputation (σ=2) and than KNN


def test_als_id_range_check(spark, mdf):
    big = mdf.withColumn("id", F.col("id").cast("long") + F.lit(2**40)).withColumn(
        "a", F.when(F.col("id") % 11 == 0, None).otherwise(F.col("a"))
    )
    with pytest.raises(ValueError, match="int32"):
        TML.imputation_als(big, "id", ["a", "b", "c"])


def test_auto_imputation(mdf):
    winner, scores = TML.auto_imputation(mdf, ["a", "b", "c"], sample_size=400)
    d = {r["method"]: r["score"] for r in scores.collect()}
    assert set(d) == {"mmm_mean", "mmm_median", "knn", "regression", "als"}
    assert winner == min(d, key=d.get)
    assert d["knn"] < d["mmm_mean"]  # correlation makes knn win
    assert d["regression"] < d["mmm_mean"]


def test_monotonic_binning(mdf):
    odf, model = TML.monotonic_binning(mdf, "y", 1, ["a", "c"], max_bins=8)
    assert "a" in model and "c" in model
    # a drives y → monotonic with few bins; binned values in range
    mx = odf.agg(F.max("a")).collect()[0][0]
    assert mx <= 20


def test_monotonic_binning_approx_path_matches_exact(mdf):
    """exact=False (the bench/production posture, percentile_approx acc
    1000) must choose the same bin counts as the exact grid on data whose
    quantiles are far apart relative to the sketch error."""
    _, exact_model = TML.monotonic_binning(mdf, "y", 1, ["a", "c"], max_bins=8)
    _, approx_model = TML.monotonic_binning(
        mdf, "y", 1, ["a", "c"], max_bins=8, exact=False
    )
    assert {c: m["bin_size"] for c, m in approx_model.items()} == {
        c: m["bin_size"] for c, m in exact_model.items()
    }


def test_boxcox(spark):
    import random

    random.seed(3)
    rows = [(random.lognormvariate(0, 0.6),) for _ in range(500)]
    df = spark.createDataFrame(rows, schema="x double")
    skew_before = df.agg(F.skewness("x")).collect()[0][0]
    odf, lambdas = TML.boxcox_transformation(df, ["x"])
    assert lambdas["x"] in (0, -0.25, 0.25)  # near-log for lognormal data
    sk = odf.agg(F.skewness("x")).collect()[0][0]
    assert abs(sk) < abs(skew_before)
    assert abs(sk) < 0.5


def test_autoencoder_latent_features(spark):
    import random

    random.seed(7)
    # 4 columns on a 2-D manifold: (u, v, u+v, u-v) → 2 latent units suffice
    rows = []
    for _ in range(800):
        u, v = random.gauss(0, 1), random.gauss(0, 1)
        rows.append((u, v, u + v + random.gauss(0, 0.01), u - v + random.gauss(0, 0.01)))
    df = spark.createDataFrame(rows, schema="a double, b double, c double, d double")
    odf, model = TML.autoencoder_latent_features(
        df, reduction_params=2, sample_size=800, epochs=60, batch_size=128, seed=1
    )
    assert model["k"] == 2
    # standardized inputs have variance 1; a 2-unit bottleneck on a 2-D
    # manifold must reconstruct far below that
    assert model["train_mse"] < 0.25
    assert odf.columns == ["a", "b", "c", "d", "latent_0", "latent_1"]
    row = odf.limit(5).collect()[0]
    assert -1.0 <= row["latent_0"] <= 1.0  # tanh range
    # deterministic given the seed
    _, model2 = TML.autoencoder_latent_features(
        df, reduction_params=2, sample_size=800, epochs=60, batch_size=128, seed=1
    )
    assert model2["train_mse"] == model["train_mse"]


def test_knn_imputation_boundary_tie_averages(spark):
    # regression (r5): refs tied at the k-th distance boundary must ALL
    # enter the fill average (deterministic), not an arbitrary
    # argpartition pick.  Three refs equidistant from the probe with
    # k=2: fill = mean of all three tied q values.
    rows = [
        (1, 10.0, 1.0),    # ref q=10 at b=1
        (2, 20.0, 1.0),    # ref q=20 at b=1 (tied distance to probe)
        (3, 60.0, 1.0),    # ref q=60 at b=1 (tied distance to probe)
        (4, None, 1.0),    # probe: all three refs at distance 0
    ]
    df = spark.createDataFrame(rows, "id int, q double, b double")
    out = TML.imputation_knn(df, ["q", "b"], k=2, sample_size=100)
    got = out.where(F.col("id") == 4).collect()[0]["q"]
    assert abs(got - 30.0) < 1e-9
