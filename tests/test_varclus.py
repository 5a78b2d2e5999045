import pytest

from anovos_spark.operators.varclus import variable_clustering


@pytest.fixture(scope="module")
def vdf(spark):
    import random

    random.seed(5)
    rows = []
    for _ in range(500):
        a = random.gauss(0, 1)
        b = a + random.gauss(0, 0.1)
        c = a - random.gauss(0, 0.1)
        x = random.gauss(0, 1)
        y = x + random.gauss(0, 0.1)
        cat = "hi" if a > 0 else "lo"   # categorical tied to the a-block
        rows.append((a, b, c, x, y, cat))
    return spark.createDataFrame(
        rows, schema="a double, b double, c double, x double, y double, cat string"
    )


def test_varclus_separates_blocks(vdf):
    out = variable_clustering(vdf, ["a", "b", "c", "x", "y"]).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["attribute"])
    assert len(by_cluster) == 2
    assert {"a", "b", "c"} in by_cluster.values()
    assert {"x", "y"} in by_cluster.values()
    # tight clusters → low RS ratios
    assert all(r["RS_ratio"] < 0.1 for r in out)


def test_varclus_with_categorical(vdf):
    out = variable_clustering(vdf).collect()
    attrs = {r["attribute"] for r in out}
    assert "cat" in attrs  # label-encoded and clustered
    cat_cluster = next(r["cluster"] for r in out if r["attribute"] == "cat")
    a_cluster = next(r["cluster"] for r in out if r["attribute"] == "a")
    assert cat_cluster == a_cluster  # cat derives from a


def test_varclus_single_cluster_when_uncorrelated(spark):
    import random

    random.seed(9)
    rows = [(random.random(), random.random()) for _ in range(200)]
    df = spark.createDataFrame(rows, schema="p double, q double")
    out = variable_clustering(df).collect()
    # uncorrelated pair: 2nd eigenvalue ≈ 1 — split only if > 1.0 strictly
    assert len(out) == 2
