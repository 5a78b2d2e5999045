"""Property-based tests (hypothesis) for algorithmic invariants the unit
tests can't sweep: prefix-filter exactness, melt/transpose roundtrip,
binning bounds, minhash containment."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=3, max_size=12).map(" ".join),
    min_size=2,
    max_size=8,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=doc_strategy, threshold=st.sampled_from([0.3, 0.5, 0.8]))
def test_prefix_filter_equals_bruteforce(spark, texts, threshold):
    """The PPJoin prefix filter must be EXACT: identical pair set to the
    brute-force all-pairs jaccard at any threshold."""
    from anovos_spark.operators.dedup import _shingles, ngram_jaccard_pairs

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=threshold).collect()
    }
    # brute force on the driver
    rows = df.select("doc_id", _shingles(F.col("text"), 3).alias("g")).collect()
    sets = {r["doc_id"]: set(r["g"]) for r in rows}
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            j = round(inter / union, 6) if union else 0.0
            if j >= threshold:
                want[(a, b)] = j
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    data=st.lists(
        st.tuples(st.integers(0, 5), st.floats(-100, 100), st.floats(-100, 100)),
        min_size=1,
        max_size=20,
    )
)
def test_melt_transpose_consistency(spark, data):
    """melt produces exactly rows × value-cols entries, values preserved."""
    from anovos_spark.core.utils import melt

    df = spark.createDataFrame(
        [(i, round(a, 3), round(b, 3)) for i, (g, a, b) in enumerate(data)],
        "id int, a double, b double",
    )
    long_df = melt(df, ["id"], ["a", "b"], "attr", "val")
    rows = long_df.collect()
    assert len(rows) == 2 * df.count()
    back = {(r["id"], r["attr"]): r["val"] for r in rows}
    for r in df.collect():
        assert back[(r["id"], "a")] == r["a"]
        assert back[(r["id"], "b")] == r["b"]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=2,
        max_size=50,
    ).filter(lambda v: max(v) > min(v)),
    bins=st.integers(2, 12),
)
def test_binning_bounds(spark, vals, bins):
    """equal-range bins are always in [1, bins]; min→1, max→bins."""
    from anovos_spark.operators.transformers import attribute_binning

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    odf, model = attribute_binning(df, ["x"], bin_size=bins)
    got = [r["x"] for r in odf.collect()]
    assert all(1 <= g <= bins for g in got)
    pairs = {v: g for v, g in zip(vals, got)}
    assert pairs[min(vals)] == 1
    assert pairs[max(vals)] == bins


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=doc_strategy)
def test_minhash_subset_of_exact(spark, texts):
    """LSH+verify output is always a subset of the exact pair set, and
    identical docs are always recovered."""
    from anovos_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    texts = texts + [texts[0]]  # guarantee one identical pair
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    exact = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(df, threshold=0.5).collect()}
    mh = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(df, threshold=0.5).collect()}
    assert mh <= exact
    assert (0, len(texts) - 1) in mh  # identical docs collide in every band


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(
        st.tuples(
            st.floats(min_value=-85, max_value=85, allow_nan=False),
            st.floats(min_value=-179, max_value=179, allow_nan=False),
        ),
        min_size=1,
        max_size=6,
    )
)
def test_reverse_geocoding_is_argmin(spark, pts):
    """The zero-shuffle argmin expression must agree with a driver-side
    exhaustive nearest-centroid search (haversine, name tiebreak)."""
    import math

    from anovos_spark.operators.geospatial import COUNTRY_CENTROIDS, reverse_geocoding

    def hav(la1, lo1, la2, lo2):
        dla, dlo = math.radians(la2 - la1) / 2, math.radians(lo2 - lo1) / 2
        a = math.sin(dla) ** 2 + math.cos(math.radians(la1)) * math.cos(
            math.radians(la2)
        ) * math.sin(dlo) ** 2
        return 2 * 6371.0088 * math.asin(min(1.0, math.sqrt(a)))

    df = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(pts)], "i long, lat double, lon double"
    )
    got = {r["i"]: r["country"] for r in reverse_geocoding(df, "lat", "lon").collect()}
    for i, (la, lo) in enumerate(pts):
        want = min(COUNTRY_CENTROIDS, key=lambda c: (hav(la, lo, c[1], c[2]), c[0]))[0]
        assert got[i] == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=doc_strategy)
def test_token_count_invariants(spark, texts):
    """whitespace tokens == split count; bpe_ish >= whitespace (the
    pre-tokenizer only ever splits further, plus whitespace runs)."""
    from anovos_spark.operators.text import token_count

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    ws = {r["id"]: r["n_tokens"] for r in token_count(df, mode="whitespace").collect()}
    bpe = {r["id"]: r["n_tokens"] for r in token_count(df, mode="bpe_ish").collect()}
    for i, t in enumerate(texts):
        assert ws[i] == len(t.split())
        assert bpe[i] >= ws[i]


def test_no_raw_control_bytes_in_source():
    """Raw control characters in source are invisible in editors and plan
    dumps but change runtime semantics (a literal \\x01 inside what reads
    as an empty string separator mis-hashed every hash_split fold until
    caught).  Control chars must be written as escape sequences."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent
    offenders = []
    for sub in ("anovos_spark", "tests", "tools"):
        for p in (root / sub).rglob("*.py"):
            data = p.read_bytes()
            bad = [
                (i, b)
                for i, b in enumerate(data)
                if b < 9 or (13 < b < 32)
            ]
            if bad:
                offenders.append((str(p), bad[:3]))
    assert not offenders, f"raw control bytes in source: {offenders}"


asof_rows = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2", "k3"]),
        st.integers(min_value=0, max_value=10_000),  # seconds offset
        st.floats(min_value=-100, max_value=100, allow_nan=False),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(left_rows=asof_rows, right_rows=asof_rows,
       direction=st.sampled_from(["backward", "forward"]))
def test_asof_join_matches_pandas_property(spark, left_rows, right_rows, direction):
    """asof_join ≡ pandas.merge_asof on arbitrary key/time/value data,
    both directions.  Right-side (key, ts) duplicates are pre-aggregated
    (max) because both engines leave the tie choice unspecified."""
    import datetime as dt

    import pandas as pd

    from anovos_spark.operators.temporal import asof_join

    base = dt.datetime(2024, 1, 1)

    def frame(rows, vcol):
        seen = {}
        for k, s, v in rows:
            key = (k, s)
            seen[key] = max(v, seen.get(key, float("-inf")))
        data = [(k, base + dt.timedelta(seconds=s), v) for (k, s), v in seen.items()]
        return data

    ldata = frame(left_rows, "lv")
    rdata = frame(right_rows, "rv")
    ldf = spark.createDataFrame(ldata, ["k", "ts", "lv"])
    rdf = spark.createDataFrame(rdata, ["k", "ts", "rv"])
    got = (
        asof_join(ldf, rdf, on="ts", by="k", direction=direction)
        .orderBy("k", "ts")
        .toPandas()
    )
    lp = pd.DataFrame(ldata, columns=["k", "ts", "lv"]).sort_values(["ts", "k"]).reset_index(drop=True)
    rp = pd.DataFrame(rdata, columns=["k", "ts", "rv"]).sort_values(["ts", "k"]).reset_index(drop=True)
    exp = pd.merge_asof(lp, rp, on="ts", by="k", direction=direction)
    exp = exp.sort_values(["k", "ts"]).reset_index(drop=True)
    assert list(got["rv_matched"].fillna(-1e18)) == list(exp["rv"].fillna(-1e18))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    toks=st.lists(st.integers(1, 50), min_size=1, max_size=30),
    budget=st.integers(1, 500),
)
def test_token_budget_prefix_property(spark, toks, budget):
    """The kept set must be exactly the longest hash-order prefix whose
    running sum fits the budget — computed independently on the driver —
    and must be monotone in the budget."""
    import hashlib

    from anovos_spark.operators.ingest import token_budget_sample

    df = spark.createDataFrame(
        [(i, "g", t) for i, t in enumerate(toks)], "id int, grp string, toks int"
    )
    kept = sorted(
        r["id"] for r in token_budget_sample(df, "grp", "id", "toks", budget).collect()
    )
    order = sorted(
        range(len(toks)),
        key=lambda i: (hashlib.md5(f"{i}|42".encode()).hexdigest(), i),
    )
    want, cum = [], 0
    for i in order:
        cum += toks[i]
        if cum > budget:
            break
        want.append(i)
    assert kept == sorted(want)
    bigger = sorted(
        r["id"]
        for r in token_budget_sample(df, "grp", "id", "toks", budget + 50).collect()
    )
    assert set(kept) <= set(bigger)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    sizes=st.lists(st.integers(100, 10000), min_size=2, max_size=5),
    seed_frac=st.sampled_from([0.3, 0.5, 0.7]),
)
def test_mixture_plan_invariants(spark, sizes, seed_frac):
    """rates in (0,1]; exactly one binding group at rate 1.0 (ties allowed);
    planned token ratios reproduce the target ratios exactly."""
    from anovos_spark.operators.ingest import mixture_plan

    groups = [f"g{i}" for i in range(len(sizes))]
    rows = [(g, s) for g, s in zip(groups, sizes)]
    df = spark.createDataFrame(rows, "grp string, toks int")
    # normalized targets over all groups
    raw = [seed_frac ** i for i in range(len(groups))]
    tot = sum(raw)
    targets = {g: r / tot for g, r in zip(groups, raw)}
    # exact sum-to-1 normalization for the operator's validation
    targets[groups[-1]] += 1.0 - sum(targets.values())
    out = {r["grp"]: r for r in mixture_plan(df, "grp", "toks", targets).collect()}
    assert all(0 < r["rate"] <= 1.0 for r in out.values())
    assert any(abs(r["rate"] - 1.0) < 1e-9 for r in out.values())
    # planned tokens follow the target proportions (floor rounding slack)
    tstar = min(out[g]["tokens"] / targets[g] for g in groups)
    for g in groups:
        assert abs(out[g]["planned_tokens"] - targets[g] * tstar) <= 1.0


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["shared line", "common footer", "xx", "yy", "zz"]),
                 min_size=1, max_size=5),
        min_size=2, max_size=6,
    ),
    k=st.integers(2, 4),
)
def test_boilerplate_removal_property(spark, docs, k):
    """A line is removed iff its normalized form appears in >= k distinct
    docs; surviving lines keep their original order."""
    from anovos_spark.operators.text import boilerplate_removal

    df = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(docs)],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in
           boilerplate_removal(df, "text", "doc_id", min_doc_count=k).collect()}
    from collections import Counter

    docfreq = Counter()
    for lines in docs:
        for key in {l.lower().strip() for l in lines if l.strip()}:
            docfreq[key] += 1
    for i, lines in enumerate(docs):
        keep = [l for l in lines
                if l.strip() == "" or docfreq[l.lower().strip()] < k]
        assert out[i]["text"] == "\n".join(keep)
        assert out[i]["removed_lines"] == len(lines) - len(keep)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    base=st.lists(
        st.text(alphabet="abcdef", min_size=4, max_size=10), min_size=2,
        max_size=6, unique=True,
    ),
    k=st.sampled_from([1, 2]),
)
def test_fuzzy_match_equals_bruteforce(spark, base, k):
    """FastSS candidates + Levenshtein verify must equal the brute-force
    all-pairs edit-distance join for k in {1, 2}."""
    from anovos_spark.operators.dedup import fuzzy_match_pairs

    df = spark.createDataFrame(list(enumerate(base)), "id long, s string")
    got = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in fuzzy_match_pairs(df, "s", "id", max_distance=k).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    want = {}
    for i in range(len(base)):
        for j in range(i + 1, len(base)):
            d = lev(base[i], base[j])
            if d <= k:
                want[(i, j)] = d
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    s=st.text(alphabet="abcxyz", min_size=0, max_size=64),
    k=st.sampled_from([1, 2]),
)
def test_deletion_neighborhood_bounded(spark, s, k):
    """The FastSS variant array never exceeds 1 + L + L·(L−1)/2 entries
    — the bound that keeps the candidate join's shuffle O(N·C(len,k))."""
    from pyspark.sql import functions as F

    from anovos_spark.operators.dedup import deletion_variants

    df = spark.createDataFrame([(s,)], "s string")
    n = df.select(F.size(deletion_variants(F.col("s"), k)).alias("n")).collect()[0]["n"]
    L = len(s)
    bound = 1 + L + (L * (L - 1) // 2 if k == 2 else 0)
    assert n <= bound


def test_fuzzy_match_truncate_long_keys(spark):
    """on_long='truncate': an adversarial 5,000-char key must not
    explode the variant join — blocking runs on the first max_length
    chars while the exact verify runs on the FULL strings, so the
    near-identical long pair matches and the far pair does not."""
    from pyspark.sql import functions as F

    from anovos_spark.operators.dedup import deletion_variants, fuzzy_match_pairs

    long_a = "x" * 5000
    long_b = "x" * 4999 + "y"          # distance 1, edit at the far end
    far = "z" * 5000                   # distance 5000 from both
    df = spark.createDataFrame(
        [(0, long_a), (1, long_b), (2, far), (3, "short"), (4, "shorp")],
        "id long, s string",
    )
    # default mode refuses loudly
    import pytest as _p

    with _p.raises(ValueError, match="caps len"):
        fuzzy_match_pairs(df, "s", "id", max_distance=1)
    got = {
        (r["id_a"], r["id_b"]): r["distance"]
        for r in fuzzy_match_pairs(
            df, "s", "id", max_distance=1, max_length=64, on_long="truncate"
        ).collect()
    }
    assert got == {(0, 1): 1, (3, 4): 1}
    # bounded expansion: the truncated key's neighborhood is the
    # max_length bound, not the raw-length one
    n = df.where(F.col("id") == 0).select(
        F.size(deletion_variants(F.col("s").substr(1, 64), 1)).alias("n")
    ).collect()[0]["n"]
    assert n <= 1 + 64


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5000),      # start offset s
            st.integers(min_value=0, max_value=400_000),   # length s (incl. long tails)
        ),
        min_size=1, max_size=12,
    ),
    pts=st.lists(st.integers(min_value=-500, max_value=410_000),
                 min_size=1, max_size=20),
)
def test_range_join_random_equals_bruteforce(spark, ivs, pts):
    """range_join with the AUTO p99 bucket must equal the brute-force
    containment join on arbitrary interval shapes, including heavy
    length skew (lengths span 0 s to ~4.6 days)."""
    import datetime as dt

    from anovos_spark.operators.temporal import range_join

    base = dt.datetime(2024, 1, 1)
    iv_rows = [
        (i, base + dt.timedelta(seconds=s), base + dt.timedelta(seconds=s + ln))
        for i, (s, ln) in enumerate(ivs)
    ]
    pt_rows = [(j, base + dt.timedelta(seconds=p)) for j, p in enumerate(pts)]
    intervals = spark.createDataFrame(iv_rows, "iv_id int, s timestamp, e timestamp")
    points = spark.createDataFrame(pt_rows, "p_id int, t timestamp")
    got = {
        (r["p_id"], r["iv_id"])
        for r in range_join(points, intervals, "t", "s", "e").collect()
    }
    want = {
        (j, i)
        for j, p in enumerate(pts)
        for i, (s, ln) in enumerate(ivs)
        if s <= p <= s + ln
    }
    assert got == want


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n_rows=st.sampled_from([2_000, 20_000]),
    n_groups=st.sampled_from([3, 40]),
)
def test_global_windows_run_on_bounded_frames(spark, n_rows, n_groups):
    """r5 (VERDICT #8): the empty-partitionBy windows in
    temperature_sample / mixture_plan / zipf_fit are safe only because
    they run on METADATA-sized frames (group counts, top-k vocab).  This
    reads the EXECUTED plan metrics and asserts every single-partition
    exchange feeding a Window carried O(groups/top_k) records — a
    refactor pointing one at the data frame fails here at 20k rows."""
    from tests.window_guard import single_partition_window_inputs

    from anovos_spark.operators.ingest import mixture_plan, temperature_sample
    from anovos_spark.operators.text import zipf_fit

    df = spark.range(n_rows).select(
        F.col("id"),
        F.concat(F.lit("g"), (F.col("id") % n_groups).cast("string")).alias("g"),
        (F.col("id") % 97 + 1).cast("long").alias("tokens"),
        F.concat(
            F.lit("tok"), (F.col("id") % 50).cast("string"),
            F.lit(" tok"), (F.col("id") % 23).cast("string"),
        ).alias("text"),
    )

    # temperature_sample: force the in-plan (scale) path
    ts = temperature_sample(df, "g", "id", max_literal_groups=0)
    for n in single_partition_window_inputs(ts):
        assert 0 <= n <= n_groups, f"temperature_sample window saw {n} rows"

    mp = mixture_plan(df, "g", "tokens", {"g0": 0.5, "g1": 0.5})
    for n in single_partition_window_inputs(mp):
        assert 0 <= n <= n_groups, f"mixture_plan window saw {n} rows"

    zf = zipf_fit(df, "text", top_k=30)
    for n in single_partition_window_inputs(zf):
        assert 0 <= n <= 30, f"zipf_fit window saw {n} rows"
