import datetime

import pytest
from pyspark.sql import functions as F

from anovos_spark.operators import datetime_ops as DT
from anovos_spark.operators.ingest import join_dataset, salted_join


def test_salted_join_matches_plain(spark):
    # one massively hot key + a long tail
    big = spark.createDataFrame(
        [(1, i) for i in range(5000)] + [(k, 0) for k in range(2, 50)],
        schema="k int, v int",
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(1, 50)], "k int, name string")
    plain = join_dataset(big, dim, join_cols=["k"], join_type="inner")
    salted = salted_join(big, dim, ["k"], salt_buckets=8)
    assert salted.count() == plain.count()
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r) for r in salted.select(plain.columns).collect())
    assert a == b


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, 10), (99, 20)], "k int, v int")
    dim = spark.createDataFrame([(1, "one")], "k int, name string")
    out = salted_join(big, dim, ["k"], join_type="left")
    rows = {r["k"]: r["name"] for r in out.collect()}
    assert rows == {1: "one", 99: None}


@pytest.fixture()
def tzdf(spark):
    return spark.createDataFrame(
        [(datetime.datetime(2024, 6, 15, 12, 0, 0),)], schema="ts timestamp"
    )


def test_timezone_conversion(tzdf):
    out = DT.timezone_conversion(tzdf, ["ts"], "UTC", "America/New_York").collect()[0]
    assert str(out["ts_tz"]) == "2024-06-15 08:00:00"  # EDT = UTC-4


def test_string_to_timestamp_and_back(spark):
    df = spark.createDataFrame([("15/06/2024 09:30:00",)], schema="s string")
    out = DT.string_to_timestamp(df, ["s"], "dd/MM/yyyy HH:mm:ss")
    out = DT.timestamp_to_string(out, ["s_ts"], "yyyy-MM-dd")
    r = out.collect()[0]
    assert str(r["s_ts"]) == "2024-06-15 09:30:00"
    assert r["s_ts_str"] == "2024-06-15"


def test_time_diff_and_elapsed(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 0, 0), datetime.datetime(2024, 1, 2, 6, 0))],
        schema="a timestamp, b timestamp",
    )
    out = DT.time_diff(df, "a", "b", unit="hour").collect()[0]
    assert out["a_b_diff"] == 30.0
    el = DT.time_elapsed(df, ["a"], unit="day").collect()[0]
    assert el["a_elapsed"] > 365  # 2024 is long past


def test_attribute_type_recommendation(spark):
    from anovos_spark.operators.ingest import attribute_type_recommendation

    df = spark.createDataFrame(
        [(1, 5.0, "12.5", "abc"), (2, 5.0, "7", "def"), (3, 6.0, "9.1", "1")],
        schema="id int, lowcard double, numstr string, realstr string",
    )
    rec = {r["attribute"]: r for r in attribute_type_recommendation(df, cardinality_threshold=2, exact=True).collect()}
    assert rec["lowcard"]["recommended_type"] == "categorical"  # 2 distinct <= 2
    assert rec["id"]["recommended_type"] == "numerical"         # 3 distinct > 2
    assert rec["numstr"]["recommended_type"] == "numerical"     # all parse
    assert rec["realstr"]["recommended_type"] == "categorical"  # 1/3 parse
    assert rec["numstr"]["numeric_rate"] == 1.0


def test_hash_split(spark):
    from anovos_spark.operators.ingest import hash_split
    import pytest as _pt

    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    out = hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    # deterministic: identical assignment on re-run and under different partitioning
    a = {r["k"]: r["split"] for r in out.collect()}
    b = {
        r["k"]: r["split"]
        for r in hash_split(
            df.repartition(13), "k", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7
        ).collect()
    }
    assert a == b
    # different seed reshuffles assignments
    c = {r["k"]: r["split"] for r in hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1}, seed=8).collect()}
    assert a != c
    # group coherence: splitting on a group key puts all members together
    g = df.withColumn("grp", F.col("k") % 50)
    gout = hash_split(g, "grp", {"train": 0.5, "test": 0.5}, seed=7)
    per_group = gout.groupBy("grp").agg(F.countDistinct("split").alias("d")).collect()
    assert all(r["d"] == 1 for r in per_group)
    with _pt.raises(ValueError):
        hash_split(df, "k", {"train": 0.5, "test": 0.4})


def test_cap_per_group(spark):
    from anovos_spark.operators.ingest import cap_per_group

    df = spark.range(0, 100).select(
        (F.col("id") % 4).alias("grp"), F.col("id").alias("k")
    )
    out = cap_per_group(df, "grp", "k", k=5, seed=1)
    sizes = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(v == 5 for v in sizes.values())
    # deterministic under repartitioning
    a = {(r["grp"], r["k"]) for r in out.collect()}
    b = {(r["grp"], r["k"]) for r in cap_per_group(df.repartition(7), "grp", "k", k=5, seed=1).collect()}
    assert a == b
    # different seed -> different survivors
    c = {(r["grp"], r["k"]) for r in cap_per_group(df, "grp", "k", k=5, seed=2).collect()}
    assert a != c
    # groups smaller than k keep everything
    small = spark.createDataFrame([(1, 10), (1, 11)], ["grp", "k"])
    assert cap_per_group(small, "grp", "k", k=5).count() == 2


def test_temperature_sample(spark):
    from anovos_spark.operators.ingest import temperature_sample

    # skewed groups: 400 'big', 40 'small'
    df = spark.range(0, 440).select(
        F.when(F.col("id") < 400, "big").otherwise("small").alias("g"),
        F.col("id").alias("k"),
    )
    out = temperature_sample(df, "g", "k", alpha=0.5, seed=3)
    sizes = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    # alpha<1 upweights the small group: expected keep-rate for 'small' is
    # min(1, (sqrt40/(sqrt400+sqrt40)) * 440/40) = 1.0 -> all kept
    assert sizes["small"] == 40
    # 'big' downsampled: expected ~ (sqrt400/(sqrt400+sqrt40))*440 = 335
    assert 250 < sizes["big"] < 400
    # deterministic under repartitioning
    a = {(r["g"], r["k"]) for r in out.collect()}
    b = {(r["g"], r["k"]) for r in temperature_sample(df.repartition(5), "g", "k", alpha=0.5, seed=3).collect()}
    assert a == b
    # alpha=1 is a no-op rebalance (rates all 1)
    assert temperature_sample(df, "g", "k", alpha=1.0).count() == 440


def test_data_sample_balanced(spark):
    from anovos_spark.operators.ingest import data_sample

    # 3 strata with very different sizes: balanced mode should yield
    # roughly equal sample counts (fraction x smallest) per stratum
    # (reference behavior spec: data_sampling.py:128-146,
    # test_data_sampling.py's balanced branch)
    rows = [("a", i) for i in range(2000)] + [("b", i) for i in range(500)] + [
        ("c", i) for i in range(250)
    ]
    df = spark.createDataFrame(rows, ["g", "k"])
    out = data_sample(
        df, strata_cols=["g"], fraction=0.4,
        method_type="stratified", stratified_type="balanced", seed=12,
    )
    sizes = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    # expected 100 per stratum; 5 sigma ~ 50
    for g in ("a", "b", "c"):
        assert 50 < sizes[g] < 150, sizes
    # population mode keeps proportions instead
    prop = data_sample(
        df, strata_cols=["g"], fraction=0.4, method_type="stratified", seed=12,
    )
    psizes = {r["g"]: r["n"] for r in prop.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert psizes["a"] > 3 * psizes["c"]
    with pytest.raises(ValueError):
        data_sample(df, strata_cols=["g"], method_type="stratified", stratified_type="bogus")


def test_temperature_sample_scale_path(spark):
    from anovos_spark.operators.ingest import temperature_sample

    # 2k groups of 3 rows + one huge group; force the broadcast-join path
    # with a low max_literal_groups and check it matches the CASE path
    df = spark.range(0, 16_000).select(
        F.when(F.col("id") < 6_000, (F.col("id") % 2_000).cast("string"))
        .otherwise(F.lit("mega")).alias("g"),
        F.col("id").alias("k"),
    )
    out = temperature_sample(df, "g", "k", alpha=0.5, seed=7, max_literal_groups=100)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert plan.count("WHEN") < 50  # rates are NOT a per-group CASE chain
    lit_out = temperature_sample(df, "g", "k", alpha=0.5, seed=7, max_literal_groups=5_000)
    a = {(r["g"], r["k"]) for r in out.collect()}
    b = {(r["g"], r["k"]) for r in lit_out.collect()}
    assert a == b and len(a) > 0
    # temperature law: mega group downsampled, tiny groups kept whole
    sizes = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes["mega"] < 10_000
    assert sum(v for g, v in sizes.items() if g != "mega") == 6_000
    # deterministic under repartitioning
    c = {
        (r["g"], r["k"])
        for r in temperature_sample(
            df.repartition(7), "g", "k", alpha=0.5, seed=7, max_literal_groups=100
        ).collect()
    }
    assert a == c
    # 100k-group cardinality would OOM the driver as a literal CASE (the
    # exact failure mode the join path removes) — join path handles it
    big = spark.range(0, 200_000).select(
        (F.col("id") % 100_000).cast("string").alias("g"), F.col("id").alias("k")
    )
    big_out = temperature_sample(big, "g", "k", alpha=0.7, seed=3)
    assert "BroadcastHashJoin" in big_out._jdf.queryExecution().executedPlan().toString()
    n = big_out.count()
    assert 190_000 <= n <= 200_000  # alpha≈1 on equal-ish groups keeps nearly all


def test_token_budget_sample(spark):
    from pyspark.sql import functions as F

    from anovos_spark.operators.ingest import token_budget_sample

    df = spark.createDataFrame(
        [(i, "g" + str(i % 2), 100) for i in range(20)],
        "id int, grp string, toks int",
    )
    out = token_budget_sample(df, "grp", "id", "toks", budget=450)
    per = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    # 100-token docs against a 450 budget -> exactly 4 kept per group
    assert per == {"g0": 4, "g1": 4}
    # deterministic: same seed, same rows
    a = sorted(r["id"] for r in out.collect())
    b = sorted(r["id"] for r in token_budget_sample(df, "grp", "id", "toks", 450).collect())
    assert a == b
    # group under budget keeps everything
    out2 = token_budget_sample(df, "grp", "id", "toks", budget=10_000)
    assert out2.count() == 20


def test_mixture_plan(spark):
    from anovos_spark.operators.ingest import mixture_plan

    df = spark.createDataFrame(
        [("en", 600), ("en", 400), ("de", 300), ("fr", 100), ("xx", 50)],
        "lang string, toks int",
    )
    out = {r["lang"]: r for r in mixture_plan(df, "lang", "toks",
           {"en": 0.5, "de": 0.3, "fr": 0.2}).collect()}
    # binding group: fr has 100 tokens for a 0.2 target -> T* = 500
    assert out["fr"]["rate"] == 1.0
    assert out["en"]["planned_tokens"] == 250 and out["de"]["planned_tokens"] == 150
    assert abs(out["en"]["rate"] - 0.25) < 1e-9
    assert abs(out["de"]["rate"] - 0.5) < 1e-9
    # untargeted group inventoried at rate 0
    assert out["xx"]["rate"] == 0.0 and out["xx"]["tokens"] == 50
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mixture_plan(df, "lang", "toks", {"en": 0.5})


def test_weighted_sample_k(spark):
    from pyspark.sql import functions as F

    from anovos_spark.operators.ingest import weighted_sample_k

    df = spark.createDataFrame(
        [(i, "g" + str(i % 2), float(1 + (i % 5) * 100)) for i in range(200)]
        + [(900, "g0", 0.0), (901, "g0", None)],
        "id int, grp string, w double",
    )
    out = weighted_sample_k(df, "w", k=5, by="grp", id_col="id")
    per = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert per == {"g0": 5, "g1": 5}
    # zero/null weights never sampled
    ids = {r["id"] for r in out.collect()}
    assert 900 not in ids and 901 not in ids
    # deterministic under the same seed, different under another
    a = sorted(r["id"] for r in weighted_sample_k(df, "w", 5, "grp", "id", seed=1).collect())
    b = sorted(r["id"] for r in weighted_sample_k(df, "w", 5, "grp", "id", seed=1).collect())
    c = sorted(r["id"] for r in weighted_sample_k(df, "w", 5, "grp", "id", seed=2).collect())
    assert a == b and a != c
    # heavy weights dominate: weight-501 rows should out-sample weight-1
    big = spark.createDataFrame(
        [(i, float(1000 if i < 50 else 0.001)) for i in range(1000)],
        "id int, w double",
    )
    g = weighted_sample_k(big, "w", k=20, by=None, id_col="id")
    heavy = sum(1 for r in g.collect() if r["id"] < 50)
    assert heavy >= 18  # overwhelming odds under the weight ratio


def test_spark_version_guard(spark):
    from unittest import mock

    from anovos_spark.core.session import require_spark_version

    require_spark_version(spark)  # current session passes
    old = mock.Mock()
    old.version = "3.2.1"
    import pytest as _p

    with _p.raises(RuntimeError, match="requires Spark >= 3.5"):
        require_spark_version(old)
