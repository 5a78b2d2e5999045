import pytest
from pyspark.sql import functions as F

from anovos_spark.operators import geospatial as GEO
from anovos_spark.operators import timeseries as TS


@pytest.fixture(scope="module")
def geo_df(spark):
    rows = [
        (1, 48.8566, 2.3522),    # Paris
        (1, 51.5074, -0.1278),   # London
        (2, 40.7128, -74.0060),  # NYC
        (2, 40.7306, -73.9352),  # NYC (close)
    ]
    return spark.createDataFrame(rows, schema="uid int, lat double, lon double")


def test_haversine(spark):
    df = spark.createDataFrame(
        [(48.8566, 2.3522, 51.5074, -0.1278)], schema="a double, b double, c double, d double"
    )
    out = GEO.location_distance(df, "a", "b", "c", "d").collect()[0]
    assert abs(out["distance_km"] - 343.5) < 2.0  # Paris-London ≈ 343-344 km


def test_vincenty_canonical_vector(spark):
    # GDA technical manual test line: Flinders Peak -> Buninyong is
    # 54 972.271 m on the WGS-84/GRS-80 ellipsoid (sub-mm agreement
    # expected from the 6-iteration unroll).
    def dms(d, m, s):
        sign = -1 if d < 0 else 1
        return sign * (abs(d) + m / 60 + s / 3600)

    rows = [
        (dms(-37, 57, 3.72030), dms(144, 25, 29.52440),
         dms(-37, 39, 10.15610), dms(143, 55, 35.38390)),
        (10.0, 20.0, 10.0, 20.0),  # coincident -> exactly 0
        (0.0, 0.0, 0.0, 90.0),     # equatorial quarter arc (sin_alpha=±1 branch)
    ]
    df = spark.createDataFrame(rows, schema="a double, b double, c double, d double")
    out = GEO.location_distance(df, "a", "b", "c", "d", method="vincenty").collect()
    got = [r["distance_km"] for r in out]
    assert abs(got[0] - 54.972271) < 1e-6
    assert got[1] == 0.0
    assert abs(got[2] - 10018.754171) < 1e-5  # WGS-84 equatorial quarter


def test_vincenty_vs_haversine_band(spark):
    # ellipsoidal vs spherical distance differ by < 0.6% for mid-latitude pairs
    df = spark.createDataFrame(
        [(48.8566, 2.3522, 51.5074, -0.1278),
         (40.7128, -74.0060, 34.0522, -118.2437)],
        schema="a double, b double, c double, d double",
    )
    hav = GEO.location_distance(df, "a", "b", "c", "d")
    both = GEO.location_distance(
        hav, "a", "b", "c", "d", method="vincenty", result_col="vinc_km"
    ).collect()
    for r in both:
        assert abs(r["vinc_km"] / r["distance_km"] - 1.0) < 0.006


def test_geohash_encode(spark):
    df = spark.createDataFrame([(57.64911, 10.40744)], schema="lat double, lon double")
    out = GEO.geohash_encode(df, "lat", "lon", precision=11).collect()[0]
    assert out["geohash"] == "u4pruydqqvj"  # canonical test vector
    out5 = GEO.geohash_precision_control(
        GEO.geohash_encode(df, "lat", "lon", precision=11), "geohash", 5
    ).collect()[0]
    assert out5["geohash"] == "u4pru"


def test_centroid_and_rog(geo_df):
    cent = {r["uid"]: r for r in GEO.centroid(geo_df, "uid", "lat", "lon").collect()}
    assert 40.70 < cent[2]["lat_centroid"] < 40.74
    rog = {r["uid"]: r["rog_km"] for r in GEO.rog_calculation(geo_df, "uid", "lat", "lon").collect()}
    assert rog[1] > 100  # Paris↔London spread
    assert rog[2] < 10   # two NYC points


def test_reverse_geocoding(spark):
    df = spark.createDataFrame(
        [(48.85, 2.35), (40.71, -74.0), (35.68, 139.69), (-33.87, 151.21)],
        schema="lat double, lon double",
    )
    out = [r["country"] for r in GEO.reverse_geocoding(df, "lat", "lon").collect()]
    assert out == ["France", "United States", "Japan", "Australia"]
    # custom reference set + deterministic tie-break by name
    ref = [("A", 0.0, 0.0), ("B", 0.0, 0.0), ("C", 50.0, 50.0)]
    df2 = spark.createDataFrame([(1.0, 1.0)], schema="lat double, lon double")
    r = GEO.reverse_geocoding(df2, "lat", "lon", ref=ref).collect()[0]
    assert r["country"] == "A"
    assert r["country_dist_km"] > 0


def test_point_in_polygon(spark):
    square = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]
    df = spark.createDataFrame(
        [(5.0, 5.0), (15.0, 5.0), (-1.0, 5.0)], schema="lat double, lon double"
    )
    out = [r["in_polygon"] for r in GEO.location_in_polygon(df, "lat", "lon", square).collect()]
    assert out == [True, False, False]


def test_cartesian_roundtrip(spark):
    df = spark.createDataFrame([(45.0, 90.0)], schema="lat double, lon double")
    r = GEO.geo_format_cartesian(df, "lat", "lon").collect()[0]
    assert abs(r["loc_x"]) < 1e-9  # cos(45)*cos(90) = 0
    assert abs(r["loc_y"] - 0.7071067811865476) < 1e-9


def test_ts_format_vote(spark):
    df = spark.createDataFrame(
        [("2024-01-15", "15/01/2024 10:30:00", "20240115", "not a date", 7),
         ("2024-02-20", "20/02/2024 11:00:00", "20240220", "nope", 8)],
        schema="iso string, euro string, compact string, junk string, num int",
    )
    fmts = TS.ts_format_vote(df)
    assert fmts["iso"] == "yyyy-MM-dd"
    assert fmts["euro"] == "dd/MM/yyyy HH:mm:ss"
    assert fmts["compact"] == "yyyyMMdd"
    assert "junk" not in fmts
    odf, _ = TS.ts_preprocess(df, fmts)
    assert dict(odf.dtypes)["iso"] == "timestamp"
    assert odf.where(F.col("iso").isNull()).count() == 0


def test_daypart_and_feats(spark):
    import datetime

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 6, 8, 0), 1.0),
         (datetime.datetime(2024, 1, 8, 23, 0), 2.0)],
        schema="ts timestamp, v double",
    )
    out = {str(r["ts"]): r for r in TS.ts_processed_feats(df, "ts").collect()}
    assert out["2024-01-06 08:00:00"]["ts_daypart"] == "morning"
    assert out["2024-01-06 08:00:00"]["ts_weekend"] == 1  # Saturday
    assert out["2024-01-08 23:00:00"]["ts_daypart"] == "night"


def test_ts_eligibility(spark):
    import datetime

    rows = [(datetime.datetime(2024, 1, d, 0, 0),) for d in range(1, 11)]
    df = spark.createDataFrame(rows, schema="ts timestamp")
    d = {r["metric"]: r["value"] for r in TS.ts_eligibility_check(df, "ts").collect()}
    assert d["n_dates"] == 10
    assert d["gap_mean"] == 1.0
    assert d["gap_stddev"] == 0.0


def test_ts_analyzer(spark):
    import datetime

    rows = [(datetime.datetime(2024, 1, 1 + i % 3, 6 + i % 12, 0), float(i)) for i in range(30)]
    df = spark.createDataFrame(rows, schema="ts timestamp, v double")
    out = TS.ts_analyzer(df, "ts", "v")
    grans = {r["granularity"] for r in out.collect()}
    assert grans == {"date", "hour", "daypart", "weekend"}


def test_kmeans_max_k_validated(geo_df):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_k must be >= 2"):
        GEO.geo_cluster_analysis(geo_df, "lat", "lon", max_k=1)


def test_kmeans_clusters(geo_df):
    odf, costs = GEO.geo_cluster_analysis(geo_df, "lat", "lon", max_k=2)
    assert "cluster" in odf.columns
    assert len(costs) == 1  # k=2 only
    clusters = {r["uid"]: set() for r in odf.collect()}
    for r in odf.collect():
        clusters[r["uid"]].add(r["cluster"])
    # NYC points should co-cluster
    assert len(clusters[2]) == 1


def test_geohash_decode_roundtrip(spark):
    df = spark.createDataFrame(
        [(57.64911, 10.40744), (-33.8568, 151.2153), (0.0, 0.0)],
        schema="lat double, lon double",
    )
    enc = GEO.geohash_encode(df, "lat", "lon", precision=8)
    dec = GEO.geohash_decode(enc, "geohash", precision=8)
    for r in dec.collect():
        # decoded center must be within the precision-8 cell of the input
        assert abs(r["gh_lat"] - r["lat"]) <= 180.0 / 2**20
        assert abs(r["gh_lon"] - r["lon"]) <= 360.0 / 2**20
    # decode of a known vector hits the canonical cell center
    v = GEO.geohash_decode(
        spark.createDataFrame([("u4pruydqqvj",)], schema="geohash string"),
        "geohash",
        precision=11,
    ).collect()[0]
    assert abs(v["gh_lat"] - 57.64911) < 1e-5 and abs(v["gh_lon"] - 10.40744) < 1e-5


def test_location_in_country(spark):
    df = spark.createDataFrame(
        [(40.7, -74.0), (48.85, 2.35), (-33.9, 151.2), (None, None)],
        schema="lat double, lon double",
    )
    us = GEO.location_in_country(df, "lat", "lon", "United States").collect()
    assert [r["in_country"] for r in us] == [True, False, False, False]
    au = GEO.location_in_country(df, "lat", "lon", "Australia").collect()
    assert [r["in_country"] for r in au] == [False, False, True, False]
    with pytest.raises(ValueError):
        GEO.location_in_country(df, "lat", "lon", "Atlantis")
    # exact mode delegates to the bbox-prefiltered PIP
    tri = [(0.0, 0.0), (0.0, 10.0), (10.0, 0.0)]
    ex = GEO.location_in_country(
        spark.createDataFrame([(2.0, 2.0), (9.0, 9.0)], schema="lat double, lon double"),
        "lat", "lon", "X", method="exact", polygon=tri,
    ).collect()
    assert [r["in_country"] for r in ex] == [True, False]


def test_geo_stats_generator(geo_df):
    out = GEO.geo_stats_generator(geo_df, "lat", "lon", precisions=(1, 2), top_n=3)
    rows = out.collect()
    by_p = {}
    for r in rows:
        by_p.setdefault(r["precision"], []).append(r)
    # NYC pair shares a precision-2 cell → a cell with n_points=2, rank 1
    top2 = sorted(by_p[2], key=lambda r: r["rank"])[0]
    assert top2["n_points"] == 2 and abs(top2["pct_points"] - 0.5) < 1e-9


def test_geo_density_clusters(spark):
    import random

    random.seed(3)
    rows = [(random.gauss(40.7, 0.05), random.gauss(-74.0, 0.05)) for _ in range(40)]
    rows += [(random.gauss(51.5, 0.05), random.gauss(-0.1, 0.05)) for _ in range(40)]
    rows += [(10.0, 10.0)]  # lone noise point
    df = spark.createDataFrame(rows, schema="lat double, lon double")
    odf, stats = GEO.geo_density_clusters(df, "lat", "lon", eps_km=30.0, min_samples=5)
    d = {r["cluster"]: r["n_points"] for r in stats.collect()}
    assert d.get(-1, 0) == 1  # the lone point is noise
    assert sorted(v for k, v in d.items() if k != -1) == [40, 40]


def test_geo_density_clusters_border(spark):
    # DBSCAN border semantics via the distributed halo join: a sparse
    # cell ADJACENT to a dense cell joins that cluster; a sparse cell
    # two cells away stays noise
    eps = 30.0
    cell = eps / 111.32  # one grid step in degrees
    dense = [(0.5 * cell, 0.5 * cell)] * 6          # one dense cell (n=6)
    border = [(1.5 * cell, 0.5 * cell)]             # neighbor cell, n=1
    noise = [(3.5 * cell, 0.5 * cell)]              # 3 cells away, n=1
    df = spark.createDataFrame(dense + border + noise, "lat double, lon double")
    odf, stats = GEO.geo_density_clusters(df, "lat", "lon", eps_km=eps,
                                          min_samples=5)
    d = {r["cluster"]: r["n_points"] for r in stats.collect()}
    assert d == {0: 7, -1: 1}  # 6 core + 1 border joined; far point is noise


def test_geo_density_clusters_all_sparse(spark):
    # min_samples above every cell count: everything is noise, and only
    # the (empty) dense-cell set is collected — the sparse-cell universe
    # stays distributed
    rows = [(float(i), float(i)) for i in range(-60, 60)]  # 120 lone points
    df = spark.createDataFrame(rows, schema="lat double, lon double")
    odf, stats = GEO.geo_density_clusters(df, "lat", "lon", eps_km=30.0,
                                          min_samples=50)
    d = {r["cluster"]: r["n_points"] for r in stats.collect()}
    assert d == {-1: 120}


def test_silhouette_criterion(spark):
    import random

    random.seed(5)
    rows = [(random.gauss(0, 0.3), random.gauss(0, 0.3)) for _ in range(30)]
    rows += [(random.gauss(20, 0.3), random.gauss(20, 0.3)) for _ in range(30)]
    df = spark.createDataFrame(rows, schema="lat double, lon double")
    odf, scores = GEO.geo_cluster_analysis(
        df, "lat", "lon", max_k=4, criterion="silhouette"
    )
    best = max(scores, key=scores.get)
    assert best == 2  # two clean blobs
    assert odf.select("cluster").distinct().count() == 2


def test_seasonal_decompose(spark):
    import datetime as dt
    import math

    # 8 weeks of daily data: linear trend + weekly (period 7) seasonality
    base = dt.datetime(2024, 1, 1)
    rows = []
    for d in range(56):
        for _ in range(3):  # 3 observations per day -> exercises the agg
            season = 5.0 * math.sin(2 * math.pi * (d % 7) / 7)
            rows.append((base + dt.timedelta(days=d), 100.0 + 0.5 * d + season))
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = TS.seasonal_decompose(df, "ts", "v", period=7).collect()
    assert len(out) == 56
    mid = [r for r in out if r["trend"] is not None]
    # trend recovers the 0.5/day slope away from the edges
    slope = (mid[-1]["trend"] - mid[0]["trend"]) / (mid[-1]["idx"] - mid[0]["idx"])
    assert abs(slope - 0.5) < 0.05
    # seasonal component is centered and repeats with period 7
    assert abs(sum(r["seasonal"] for r in out[:7])) < 1e-6
    assert abs(out[0]["seasonal"] - out[7]["seasonal"]) < 1e-9
    # residuals are tiny for a noiseless series
    assert max(abs(r["resid"]) for r in out if r["resid"] is not None) < 0.3
    with pytest.raises(ValueError):
        TS.seasonal_decompose(df.limit(10), "ts", "v", period=7)


def test_dms_roundtrip(spark):
    df = spark.createDataFrame(
        [(48.8566,), (-73.9352,), (0.0,), (-0.5,)], schema="x double"
    )
    dms = GEO.geo_format_dms(df, ["x"])
    row = {r["x"]: r for r in dms.collect()}
    assert row[48.8566]["x_deg"] == 48 and row[48.8566]["x_min"] == 51
    assert row[-73.9352]["x_sign"] == -1 and row[-73.9352]["x_deg"] == 73
    assert row[-0.5]["x_sign"] == -1 and row[-0.5]["x_deg"] == 0 and row[-0.5]["x_min"] == 30
    back = GEO.geo_format_dd(dms, "x_deg", "x_min", "x_sec", "x_dd", sign_col="x_sign").collect()
    for r in back:
        assert abs(r["x_dd"] - r["x"]) < 1e-6  # exact roundtrip incl. (-1, 0)


def test_spatial_join_and_pip_expr(spark):
    from pyspark.sql import functions as F

    from anovos_spark.operators.geospatial import point_in_polygon_col, spatial_join

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 30.0, 30.0), (3, 9.0, 9.0), (4, -5.0, 0.0),
         (5, 0.0, 21.0)],
        "pid int, lat double, lon double",
    )
    polys = spark.createDataFrame(
        [
            (100, [(10.0, 0.0), (0.0, 10.0), (-10.0, 0.0), (0.0, -10.0)]),
            (200, [(5.0, 15.0), (5.0, 25.0), (-5.0, 25.0), (-5.0, 15.0)]),
        ],
        "poly_id int, vertices array<struct<lat:double,lon:double>>",
    )
    got = sorted((r["pid"], r["poly_id"]) for r in
                 spatial_join(pts, polys, "lat", "lon").collect())
    # diamond holds 1 and 4 (bbox corner 3 is outside); square holds 5
    assert got == [(1, 100), (4, 100), (5, 200)]
    # the PIP expression agrees with the existing UDF path on a grid
    grid = spark.range(0, 441).select(
        ((F.col("id") % 21).cast("double") - 10.0).alias("lat"),
        ((F.col("id") / 21).cast("int").cast("double") - 10.0).alias("lon"),
    )
    diamond = [(10.0, 0.0), (0.0, 10.0), (-10.0, 0.0), (0.0, -10.0)]
    from anovos_spark.operators.geospatial import location_in_polygon

    v = F.array(*[
        F.struct(F.lit(a).alias("lat"), F.lit(b).alias("lon")) for a, b in diamond
    ])
    both = location_in_polygon(grid, "lat", "lon", diamond).withColumn(
        "expr_in", point_in_polygon_col(F.col("lat"), F.col("lon"), v)
    )
    mismatch = both.where(F.col("in_polygon") != F.col("expr_in"))
    # boundary points may differ between the two ray-cast conventions;
    # interior/exterior must agree everywhere off the boundary
    off_boundary = mismatch.where(
        F.abs(F.abs("lat") + F.abs("lon") - 10.0) > 1e-9
    )
    assert off_boundary.count() == 0


def test_spatial_join_left(spark):
    from anovos_spark.operators.geospatial import spatial_join

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 30.0, 30.0), (3, 9.0, 9.0), (4, -5.0, 0.0),
         (5, 0.0, 21.0)],
        "pid int, lat double, lon double",
    )
    polys = spark.createDataFrame(
        [
            (100, [(10.0, 0.0), (0.0, 10.0), (-10.0, 0.0), (0.0, -10.0)]),
            (200, [(5.0, 15.0), (5.0, 25.0), (-5.0, 25.0), (-5.0, 15.0)]),
        ],
        "poly_id int, vertices array<struct<lat:double,lon:double>>",
    )
    got = sorted(
        (r["pid"], r["poly_id"])
        for r in spatial_join(pts, polys, "lat", "lon", how="left").collect()
    )
    # matched pairs as in inner, PLUS points 2 and 3 with null polygon cols
    assert got == [(1, 100), (2, None), (3, None), (4, 100), (5, 200)]


def test_spatial_join_left_nondeterministic_upstream(spark):
    # regression (r5): the 'left' path used monotonically_increasing_id
    # referenced from two plan subtrees — under a non-deterministic
    # upstream (sample/shuffle) the ids could diverge, duplicating or
    # dropping points.  Now a null-safe value anti-join (range_join's
    # pattern): duplicates keep multiplicity, null payloads match
    # themselves, totals are exact even over a shuffled/sampled input.
    from pyspark.sql import functions as F

    from anovos_spark.operators.geospatial import spatial_join

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (1, 0.0, 0.0),          # duplicate matched row
         (2, 30.0, 30.0), (2, 30.0, 30.0),      # duplicate unmatched row
         (None, 9.0, 9.0)],                     # null payload, unmatched
        "pid int, lat double, lon double",
    ).repartition(5).sample(False, 1.0, seed=7)  # non-deterministic-shaped plan
    polys = spark.createDataFrame(
        [(100, [(10.0, 0.0), (0.0, 10.0), (-10.0, 0.0), (0.0, -10.0)])],
        "poly_id int, vertices array<struct<lat:double,lon:double>>",
    )
    out = spatial_join(pts, polys, "lat", "lon", how="left")
    got = sorted(
        ((r["pid"] if r["pid"] is not None else -1), r["poly_id"])
        for r in out.collect()
    )
    assert got == [(-1, None), (1, 100), (1, 100), (2, None), (2, None)]


def test_geo_density_clusters_distributed_matches_driver(spark):
    # r5: above dense_cell_limit the components run through the
    # distributed near_dup_components min-label path; both paths use
    # min-(cx,cy) representatives ranked in sorted order, so labels must
    # match EXACTLY — including interleaved components (a shape where an
    # arbitrary-representative ordering would permute the ids) and an
    # isolated dense cell
    import random

    import anovos_spark.operators.geospatial as GEO

    rng = random.Random(5)
    pts = []
    # component A: an L of cells spanning cx 0..6 around lat 10
    for cxi in range(7):
        for _ in range(6):
            pts.append((10.0 + rng.random() * 0.2, cxi * 0.3 + rng.random() * 0.2))
    # component B: interleaved in lon range but lower lat (sorts between
    # A's min and max in (cx, cy) space)
    for _ in range(8):
        pts.append((2.0 + rng.random() * 0.2, 1.0 + rng.random() * 0.2))
    # component C: isolated single dense cell far away
    for _ in range(6):
        pts.append((-40.0 + rng.random() * 0.1, -100.0 + rng.random() * 0.1))
    # noise points (sparse, some adjacent to dense cells)
    for i in range(10):
        pts.append((60.0 + i * 3.0, 120.0 + i * 3.0))
    df = spark.createDataFrame(pts, "lat double, lon double")

    kw = dict(eps_km=30.0, min_samples=5)
    odf_drv, _ = GEO.geo_density_clusters(df, "lat", "lon", **kw)
    odf_dst, _ = GEO.geo_density_clusters(
        df, "lat", "lon", dense_cell_limit=0, **kw
    )
    key = lambda r: (r["lat"], r["lon"])
    drv = {key(r): r["cluster"] for r in odf_drv.collect()}
    dst = {key(r): r["cluster"] for r in odf_dst.collect()}
    assert drv == dst
    assert len({v for v in drv.values() if v >= 0}) >= 3  # ≥3 real clusters
    assert -1 in drv.values()                             # noise preserved
