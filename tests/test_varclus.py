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


def test_varclus_rs_columns_and_ranges(vdf):
    out = variable_clustering(vdf, ["a", "b", "c", "x", "y"]).collect()
    for r in out:
        assert 0.0 <= r["RS_own"] <= 1.0
        assert 0.0 <= r["RS_NC"] <= 1.0
        assert r["RS_ratio"] >= 0.0
        # own-cluster fit must beat nearest-other for tight blocks
        assert r["RS_own"] > r["RS_NC"]


def test_varclus_seed_stability(vdf):
    a = variable_clustering(vdf, ["a", "b", "c", "x", "y"], seed=1).collect()
    b = variable_clustering(vdf, ["a", "b", "c", "x", "y"], seed=99).collect()
    # sampling seed is irrelevant below sample_size: identical output
    key = lambda rows: sorted((r["attribute"], r["cluster"], r["RS_ratio"]) for r in rows)  # noqa: E731
    assert key(a) == key(b)


def test_quartimax_rotation_properties():
    import numpy as np

    from anovos_spark.operators.varclus import _quartimax

    rng = np.random.RandomState(0)
    L = rng.randn(6, 2)
    R = _quartimax(L)
    # orthogonal rotation preserves row norms (communalities)
    assert np.allclose((L**2).sum(axis=1), (R**2).sum(axis=1), atol=1e-8)
    # quartimax must not decrease the quartic criterion
    assert (R**4).sum() >= (L**4).sum() - 1e-8


def test_search_phase_fixes_bad_split():
    import numpy as np

    from anovos_spark.operators.varclus import _explained_variance, _search_phase

    # two perfect 2-variable blocks; start from the worst split
    c = np.eye(4)
    c[0, 1] = c[1, 0] = 0.95
    c[2, 3] = c[3, 2] = 0.95
    g1, g2 = _search_phase(c, [0, 2], [1, 3])
    assert {frozenset(g1), frozenset(g2)} == {frozenset({0, 1}), frozenset({2, 3})}
    assert _explained_variance(c, g1, g2) == pytest.approx(3.9, abs=1e-6)


def test_varclus_null_bearing_column_matches_manual_median_fill(spark):
    """The null-gated impute skip (r14) must leave null-BEARING inputs on
    the exact same path as before: clustering a frame with nulls in one
    column equals clustering the same frame with those nulls manually
    filled with that column's exact median."""
    import random

    random.seed(11)
    rows = []
    for i in range(400):
        a = random.gauss(0, 1)
        b = a + random.gauss(0, 0.1)
        x = random.gauss(0, 1)
        y = x + random.gauss(0, 0.1)
        rows.append((a, None if i % 7 == 0 else b, x, y))
    df = spark.createDataFrame(rows, schema="a double, b double, x double, y double")
    med_b = sorted(r[1] for r in rows if r[1] is not None)
    n = len(med_b)
    median = (med_b[(n - 1) // 2] + med_b[n // 2]) / 2.0
    filled = spark.createDataFrame(
        [(a, median if b is None else b, x, y) for a, b, x, y in rows],
        schema="a double, b double, x double, y double",
    )
    out_null = sorted(
        (r["cluster"], r["attribute"], r["RS_own"], r["RS_NC"], r["RS_ratio"])
        for r in variable_clustering(df, ["a", "b", "x", "y"]).collect()
    )
    out_fill = sorted(
        (r["cluster"], r["attribute"], r["RS_own"], r["RS_NC"], r["RS_ratio"])
        for r in variable_clustering(filled, ["a", "b", "x", "y"]).collect()
    )
    assert out_null == out_fill
    by_attr = {}
    for _, attr, *_ in out_null:
        by_attr[attr] = by_attr.get(attr, 0) + 1
    assert all(v == 1 for v in by_attr.values())
