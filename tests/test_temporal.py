"""as-of join and range join: semantics vs pandas merge_asof / brute force,
plan-shape assertions (no nested-loop), tolerance and direction handling."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from anovos_spark.operators.temporal import asof_join, range_join


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        ("A", _ts(1, 9, 0), 10.0),
        ("A", _ts(1, 9, 30), 11.0),
        ("A", _ts(1, 10, 0), 12.0),
        ("B", _ts(1, 9, 15), 100.0),
        ("B", _ts(2, 9, 0), 101.0),
    ]
    return spark.createDataFrame(rows, ["sym", "ts", "px"])


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("A", _ts(1, 8, 0), 5),     # before any quote -> null
        ("A", _ts(1, 9, 30), 7),    # exactly at quote -> inclusive match 11.0
        ("A", _ts(1, 9, 45), 9),    # between -> 11.0
        ("A", _ts(2, 0, 0), 11),    # far after last -> 12.0
        ("B", _ts(1, 12, 0), 13),   # -> 100.0
        ("C", _ts(1, 12, 0), 15),   # key missing on right -> null
    ]
    return spark.createDataFrame(rows, ["sym", "ts", "qty"])


def test_asof_backward_matches_pandas(spark, quotes, trades):
    out = (
        asof_join(trades, quotes, on="ts", by="sym")
        .orderBy("sym", "ts")
        .toPandas()
    )
    lp = trades.toPandas().sort_values(["ts", "sym"]).reset_index(drop=True)
    rp = quotes.toPandas().sort_values(["ts", "sym"]).reset_index(drop=True)
    expected = pd.merge_asof(lp, rp, on="ts", by="sym", direction="backward")
    expected = expected.sort_values(["sym", "ts"]).reset_index(drop=True)
    assert list(out["px_matched"].fillna(-1)) == list(expected["px"].fillna(-1))
    # matched ts equals the quote's own ts wherever matched
    m = out["px_matched"].notna()
    assert (out.loc[m, "ts_matched"] <= out.loc[m, "ts"]).all()


def test_asof_forward(spark, quotes, trades):
    out = (
        asof_join(trades, quotes, on="ts", by="sym", direction="forward")
        .orderBy("sym", "ts")
        .toPandas()
    )
    lp = trades.toPandas().sort_values(["ts", "sym"]).reset_index(drop=True)
    rp = quotes.toPandas().sort_values(["ts", "sym"]).reset_index(drop=True)
    expected = pd.merge_asof(lp, rp, on="ts", by="sym", direction="forward")
    expected = expected.sort_values(["sym", "ts"]).reset_index(drop=True)
    assert list(out["px_matched"].fillna(-1)) == list(expected["px"].fillna(-1))


def test_asof_tolerance(spark, quotes, trades):
    out = (
        asof_join(
            trades, quotes, on="ts", by="sym", tolerance="INTERVAL 30 MINUTES"
        )
        .orderBy("sym", "ts")
        .toPandas()
    )
    lp = trades.toPandas().sort_values(["ts", "sym"]).reset_index(drop=True)
    rp = quotes.toPandas().sort_values(["ts", "sym"]).reset_index(drop=True)
    expected = pd.merge_asof(
        lp, rp, on="ts", by="sym", tolerance=pd.Timedelta(minutes=30)
    )
    expected = expected.sort_values(["sym", "ts"]).reset_index(drop=True)
    assert list(out["px_matched"].fillna(-1)) == list(expected["px"].fillna(-1))


def test_asof_requires_by(quotes, trades):
    with pytest.raises(ValueError, match="by"):
        asof_join(trades, quotes, on="ts")


def test_asof_plan_no_join_one_exchange(spark, quotes, trades):
    out = asof_join(trades, quotes, on="ts", by="sym")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # hash partition (+AQE read), never more


def test_range_join_brute_force_and_plan(spark):
    iv_rows = [
        ("u1", 1, _ts(1, 9), _ts(1, 11)),
        ("u1", 2, _ts(1, 10, 30), _ts(1, 12)),  # overlaps interval 1
        ("u2", 3, _ts(2, 0), _ts(2, 1)),
    ]
    pt_rows = [
        ("u1", 10, _ts(1, 10, 45)),  # in both u1 intervals
        ("u1", 11, _ts(1, 11, 30)),  # only interval 2
        ("u1", 12, _ts(1, 8)),       # none
        ("u2", 13, _ts(2, 0, 30)),   # interval 3
        ("u3", 14, _ts(2, 0, 30)),   # no key match
    ]
    ivs = spark.createDataFrame(iv_rows, ["uid", "iv_id", "start", "end"])
    pts = spark.createDataFrame(pt_rows, ["uid", "pt_id", "ts"])
    out = range_join(pts, ivs, "ts", "start", "end", by="uid")
    pairs = {(r["pt_id"], r["iv_id"]) for r in out.collect()}
    assert pairs == {(10, 1), (10, 2), (11, 2), (13, 3)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan

    left = range_join(pts, ivs, "ts", "start", "end", by="uid", how="left")
    got = {(r["pt_id"], r["iv_id"]) for r in left.collect()}
    assert got == {(10, 1), (10, 2), (11, 2), (13, 3), (12, None), (14, None)}


def test_range_join_left_null_payload_not_duplicated(spark):
    # regression: a matched point carrying a NULL payload column used to
    # fail the (null-unsafe) anti-join against itself and be emitted a
    # second time as a fabricated unmatched row
    ivs = spark.createDataFrame(
        [("u1", 1, _ts(1, 9), _ts(1, 11))], ["uid", "iv_id", "start", "end"]
    )
    pts = spark.createDataFrame(
        [("u1", 10, _ts(1, 10), None), ("u1", 11, _ts(1, 8), None)],
        "uid string, pt_id long, ts timestamp, payload string",
    )
    left = range_join(pts, ivs, "ts", "start", "end", by="uid", how="left")
    rows = sorted(
        [(r["pt_id"], r["iv_id"]) for r in left.collect()], key=lambda t: t[0]
    )
    assert rows == [(10, 1), (11, None)]


def test_range_join_bucket_inference_spans_buckets(spark):
    # interval longer than the inferred bucket must still match points in
    # every covered bucket (explode covers the grid)
    ivs = spark.createDataFrame(
        [("u", 1, _ts(1, 0), _ts(1, 3))], ["uid", "iv_id", "start", "end"]
    )
    pts = spark.createDataFrame(
        [("u", i, _ts(1, h)) for i, h in [(1, 0), (2, 1), (3, 2), (4, 3), (5, 4)]],
        ["uid", "pt_id", "ts"],
    )
    out = range_join(pts, ivs, "ts", "start", "end", by="uid", bucket_seconds=3600)
    assert {r["pt_id"] for r in out.collect()} == {1, 2, 3, 4}


def test_batch_sessionize(spark):
    from anovos_spark.operators.temporal import sessionize

    rows = [
        ("u1", _ts(1, 9, 0)),
        ("u1", _ts(1, 9, 20)),   # 20 min gap < 30 -> same session
        ("u1", _ts(1, 9, 50)),   # exactly 30 min -> NEW session (>= gap)
        ("u1", _ts(1, 12, 0)),
        ("u2", _ts(1, 9, 0)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = sessionize(df, "ts", "user_id", gap_seconds=1800).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user["u1"]) == [1, 1, 2]
    assert per_user["u2"] == [1]
    s = {r["session_id"]: r for r in out}
    first = [r for r in out if r["user_id"] == "u1" and r["n_events"] == 2][0]
    assert first["session_start"] == _ts(1, 9, 0) and first["session_end"] == _ts(1, 9, 20)


def test_scd2_from_changes(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from anovos_spark.operators.temporal import scd2_from_changes

    T = lambda h: dt.datetime(2024, 1, 1, h)
    df = spark.createDataFrame(
        [
            (1, "A", T(1), 10),
            (1, "A", T(2), 11),   # no-op: collapses
            (1, "B", T(3), 12),
            (1, "A", T(4), 13),   # back to A: NEW version, not merged
            (2, "X", T(5), 14),
        ],
        "k int, attr string, ts timestamp, eid int",
    )
    hist = scd2_from_changes(df, "k", "attr", "ts", tiebreak_cols="eid")
    rows = sorted(hist.collect(), key=lambda r: (r["k"], r["valid_from"]))
    assert [(r["k"], r["attr"], r["is_current"]) for r in rows] == [
        (1, "A", False), (1, "B", False), (1, "A", True), (2, "X", True),
    ]
    assert rows[0]["valid_to"] == T(3) and rows[1]["valid_to"] == T(4)
    # incremental merge: closed rows untouched; open row closes at the
    # first REAL change (the no-op update at T6 opens nothing)
    upd = spark.createDataFrame(
        [(1, "A", T(6), 15), (1, "C", T(7), 16)],
        "k int, attr string, ts timestamp, eid int",
    )
    h2 = scd2_from_changes(upd, "k", "attr", "ts", tiebreak_cols="eid", history=hist)
    rows2 = sorted(h2.collect(), key=lambda r: (r["k"], r["valid_from"]))
    assert [(r["k"], r["attr"], r["is_current"]) for r in rows2] == [
        (1, "A", False), (1, "B", False), (1, "A", False), (1, "C", True),
        (2, "X", True),
    ]
    assert rows2[2]["valid_to"] == T(7)
    # null attribute is a distinct tracked state, null-safely fingerprinted
    dfn = spark.createDataFrame(
        [(3, None, T(1), 1), (3, "A", T(2), 2), (3, None, T(3), 3)],
        "k int, attr string, ts timestamp, eid int",
    )
    hn = scd2_from_changes(dfn, "k", "attr", "ts", tiebreak_cols="eid")
    assert hn.count() == 3


def test_funnel_and_cohort(spark):
    import datetime as dt

    from anovos_spark.operators.temporal import cohort_retention, funnel

    T = lambda d, h=0: dt.datetime(2024, 1, d, h)
    ev = spark.createDataFrame(
        [
            # u1 completes in order; u2 clicks BEFORE signup (no credit);
            # u3 signs up only; u4 completes but outside the window
            (1, "signup", T(1)), (1, "click", T(1, 2)), (1, "purchase", T(1, 5)),
            (2, "click", T(1)), (2, "signup", T(1, 2)), (2, "purchase", T(1, 3)),
            (3, "signup", T(2)),
            (4, "signup", T(3)), (4, "click", T(9)), (4, "purchase", T(10)),
        ],
        "user_id int, event_type string, ts timestamp",
    )
    out = {r["step"]: r for r in funnel(
        ev, "user_id", "event_type", "ts",
        ["signup", "click", "purchase"], within_seconds=86400,
    ).collect()}
    assert out["signup"]["n_users"] == 4
    assert out["click"]["n_users"] == 1       # only u1 clicks after signup in-window
    assert out["purchase"]["n_users"] == 1
    assert out["purchase"]["conversion"] == 0.25
    # no window: u4's late completion now counts, u2 still out of order
    out2 = {r["step"]: r["n_users"] for r in funnel(
        ev, "user_id", "event_type", "ts", ["signup", "click", "purchase"]
    ).collect()}
    assert out2 == {"signup": 4, "click": 2, "purchase": 2}

    ret = {(str(r["cohort"])[:10], r["period_idx"]): r for r in
           cohort_retention(ev, "user_id", "ts", "week").collect()}
    # week of 2024-01-01: all 4 users start there; u4 returns in week 1
    assert ret[("2024-01-01", 0)]["n_users"] == 4
    assert ret[("2024-01-01", 1)]["n_users"] == 1
    assert ret[("2024-01-01", 1)]["retention"] == 0.25


def test_funnel_emits_unreached_steps(spark):
    """A step nobody reaches must still appear with n_users=0 — the
    funnel contract is one row per step (regression: groupBy silently
    dropped it, caught by the sf0.001 cross-scale differential)."""
    import datetime as dt

    from anovos_spark.operators.temporal import funnel

    ev = spark.createDataFrame(
        [(1, "signup", dt.datetime(2024, 1, 1)),
         (2, "signup", dt.datetime(2024, 1, 2))],
        "user_id int, event_type string, ts timestamp",
    )
    out = {r["step"]: r for r in funnel(
        ev, "user_id", "event_type", "ts", ["signup", "click", "purchase"]
    ).collect()}
    assert len(out) == 3
    assert out["signup"]["n_users"] == 2
    assert out["click"]["n_users"] == 0 and out["click"]["conversion"] == 0.0
    assert out["purchase"]["n_users"] == 0


def test_cohort_retention_dst(spark):
    """Weekly period index must survive a DST-observing session timezone:
    the spring-forward week is 604800-3600 s long, so unix-second division
    truncates period 1 back to 0 — datediff on dates must not."""
    import datetime as dt

    from anovos_spark.operators.temporal import cohort_retention

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        # US DST spring-forward: 2024-03-10; weeks of 03-04 and 03-11
        ev = spark.createDataFrame(
            [
                (1, dt.datetime(2024, 3, 5, 12)),
                (1, dt.datetime(2024, 3, 12, 12)),
            ],
            "user_id int, ts timestamp",
        )
        ret = {r["period_idx"]: r["n_users"] for r in
               cohort_retention(ev, "user_id", "ts", "week").collect()}
        assert ret == {0: 1, 1: 1}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_range_join_skewed_interval_autobucket(spark):
    """One year-long interval among minute-long ones: the default grid
    must follow the p99 length (clamped so the outlier's own explode
    stays under 10k rows), never the max — a max-based bucket would
    crowd every point into one or two join keys."""
    import datetime as dt

    from anovos_spark.operators.temporal import auto_bucket_seconds, range_join

    base = dt.datetime(2024, 1, 1)
    D = dt.timedelta
    ivs = [
        (i, base + D(minutes=2 * i), base + D(minutes=2 * i, seconds=60))
        for i in range(200)
    ]
    year = 365 * 86400
    ivs.append((999, base, base + D(seconds=year)))
    intervals = spark.createDataFrame(ivs, "iv_id int, s timestamp, e timestamp")
    ab = auto_bucket_seconds(intervals, "s", "e")
    # p99 is the minute grid; the only lift is the single-interval
    # explode clamp (<=10k rows for the year-long outlier)
    assert ab == -(-year // 10_000)
    assert ab < 2 * 3600  # nowhere near the max-based year bucket
    pts = [(j, base + D(minutes=2 * j, seconds=30)) for j in range(200)]
    points = spark.createDataFrame(pts, "p_id int, t timestamp")
    got = {
        (r["p_id"], r["iv_id"])
        for r in range_join(points, intervals, "t", "s", "e").collect()
    }
    want = {(j, j) for j in range(200)} | {(j, 999) for j in range(200)}
    assert got == want


def test_interval_overlap_join(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from anovos_spark.operators.temporal import interval_overlap_join

    T = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    a = spark.createDataFrame(
        [(1, "u", T(1), T(3)), (2, "u", T(5), T(6)), (3, "v", T(1), T(2))],
        "a_id int, k string, a_s timestamp, a_e timestamp",
    )
    b = spark.createDataFrame(
        [
            (10, "u", T(2), T(4)),    # overlaps a1
            (11, "u", T(3), T(5)),    # touches a1 at 3:00 (inclusive) only
            (12, "u", T(6, 30), T(7)),  # no overlap
            (13, "v", T(0), T(10)),   # long interval containing a3
        ],
        "b_id int, k string, b_s timestamp, b_e timestamp",
    )
    out = interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e", by="k")
    pairs = {(r["a_id"], r["b_id"]) for r in out.collect()}
    assert pairs == {(1, 10), (1, 11), (2, 11), (3, 13)}
    # exactly once per pair (first-shared-bucket dedup, no DISTINCT)
    assert out.count() == len(pairs)
    # plan shape: hash equi-join, no nested loop
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_merge_intervals_and_coverage(spark):
    import datetime as dt

    from anovos_spark.operators.temporal import interval_coverage, merge_intervals

    B = dt.datetime(2024, 1, 1)
    T = lambda m: B + dt.timedelta(minutes=m)
    df = spark.createDataFrame(
        [("k", T(0), T(10)), ("k", T(5), T(8)),    # contained in the first
         ("k", T(9), T(20)), ("k", T(30), T(40)),  # overlap, then a gap
         ("j", T(0), T(1))],
        "k string, s timestamp, e timestamp",
    )
    merged = sorted(merge_intervals(df, "k", "s", "e").collect(),
                    key=lambda r: (r["k"], r["s"]))
    assert [(r["k"], r["s"], r["e"], r["n_merged"]) for r in merged] == [
        ("j", T(0), T(1), 1),
        ("k", T(0), T(20), 3),   # containment must NOT split the island
        ("k", T(30), T(40), 1),
    ]
    cov = {r["k"]: r for r in interval_coverage(df, "k", "s", "e").collect()}
    assert cov["k"]["covered_seconds"] == 1800.0 and cov["k"]["n_islands"] == 2
    # min_gap bridges the 10-minute hole
    bridged = merge_intervals(df, "k", "s", "e", min_gap_seconds=600).where(
        "k = 'k'"
    )
    assert bridged.count() == 1


def test_batch_sessionize_string_and_date_ts(spark):
    # regression (r5): gap must go through cast('timestamp') first — a
    # bare cast('double') on a STRING ts yields null gaps and silently
    # opens a session per event
    from anovos_spark.operators.temporal import sessionize

    rows = [
        ("u1", "2024-01-01 09:00:00"),
        ("u1", "2024-01-01 09:20:00"),   # same session
        ("u1", "2024-01-01 09:50:00"),   # >= 30 min -> new session
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = sessionize(df, "ts", "user_id", gap_seconds=1800).collect()
    assert sorted(r["n_events"] for r in out) == [1, 2]

    import datetime as dt

    ddf = spark.createDataFrame(
        [("u1", dt.date(2024, 1, 1)), ("u1", dt.date(2024, 1, 1)),
         ("u1", dt.date(2024, 1, 3))],
        "user_id string, ts date",
    )
    out2 = sessionize(ddf, "ts", "user_id", gap_seconds=86400).collect()
    # two same-day events merge; the +2d event opens a new session
    assert sorted(r["n_events"] for r in out2) == [1, 2]


def test_asof_on_tie_policies(spark):
    """Tied right keys: on_tie=('max'|'min', col) picks a defined winner;
    whole-row consistency holds UNCONDITIONALLY (the winner row survives
    as one struct — its null columns stay null, never backfilled from a
    losing tied row); null tie keys lose; both string and tuple spellings
    accepted; bad specs and unknown columns raise."""
    quotes = spark.createDataFrame(
        [
            ("A", _ts(1, 9, 0), 10.0, "q1"),
            ("A", _ts(1, 9, 0), 30.0, "q2"),   # tie winner for max
            ("A", _ts(1, 9, 0), 5.0, "q3"),    # tie winner for min
            ("A", _ts(1, 9, 0), None, "q4"),   # null loses both
            ("A", _ts(1, 11, 0), 99.0, "q5"),
        ],
        ["sym", "ts", "px", "qid"],
    )
    trades = spark.createDataFrame(
        [("A", _ts(1, 10, 0), 1)], ["sym", "ts", "qty"]
    )
    for spec in (("max", "px"), "max:px"):
        row = asof_join(trades, quotes, on="ts", by="sym", on_tie=spec).collect()[0]
        assert (row["px_matched"], row["qid_matched"]) == (30.0, "q2")
    for spec in (("min", "px"), "min:px"):
        row = asof_join(trades, quotes, on="ts", by="sym", on_tie=spec).collect()[0]
        assert (row["px_matched"], row["qid_matched"]) == (5.0, "q3")
    # forward direction honors the same policy
    early = spark.createDataFrame([("A", _ts(1, 8, 0), 1)], ["sym", "ts", "qty"])
    row = asof_join(
        early, quotes, on="ts", by="sym", direction="forward", on_tie=("max", "px")
    ).collect()[0]
    assert (row["px_matched"], row["qid_matched"]) == (30.0, "q2")
    # all-null tie keys: some row is still matched (nulls only lose to non-null)
    nullq = spark.createDataFrame(
        [("A", _ts(1, 9, 0), None, "n1"), ("A", _ts(1, 9, 0), None, "n2")],
        schema=quotes.schema,
    )
    row = asof_join(trades, nullq, on="ts", by="sym", on_tie=("max", "px")).collect()[0]
    assert row["px_matched"] is None and row["qid_matched"] in ("n1", "n2")
    with pytest.raises(ValueError, match="on_tie"):
        asof_join(trades, quotes, on="ts", by="sym", on_tie="max")
    with pytest.raises(ValueError, match="not in right frame"):
        asof_join(trades, quotes, on="ts", by="sym", on_tie=("max", "nope"))


def test_asof_default_tie_canonical(spark):
    """0.12 default (on_tie=None): tied right rows are ordered by their
    attached payload tuple and the greatest wins — deterministic across
    partition layouts, unlike the pre-0.12 arbitrary pick.  Verified by
    running the same tied data under several input partitionings."""
    quotes_rows = [
        ("A", _ts(1, 9, 0), 10.0, "q1"),
        ("A", _ts(1, 9, 0), 30.0, "q2"),   # canonical winner: largest (px, qid)
        ("A", _ts(1, 9, 0), 30.0, "q0"),   # ties q2 on px, loses on qid
        ("A", _ts(1, 9, 0), None, "q9"),   # null px sorts first, loses
    ]
    trades = spark.createDataFrame([("A", _ts(1, 10, 0), 1)], ["sym", "ts", "qty"])
    for nparts in (1, 3, 7):
        quotes = spark.createDataFrame(quotes_rows, ["sym", "ts", "px", "qid"]).repartition(nparts)
        row = asof_join(trades, quotes, on="ts", by="sym").collect()[0]
        assert (row["px_matched"], row["qid_matched"]) == (30.0, "q2"), nparts


def test_asof_no_null_backfill_chimera(spark):
    """The winner row survives ATOMICALLY: a null payload column in the
    matched right row stays null — the pre-0.12 per-column ignorenulls
    fill would have backfilled it from an older right row (chimera).
    Exercises both the tie path and the plain nearest-row path."""
    # nearest right row has a NULL payload; an older row has a value
    quotes = spark.createDataFrame(
        [
            ("A", _ts(1, 8, 0), 7.0, "old"),
            ("A", _ts(1, 9, 0), None, "near"),
        ],
        ["sym", "ts", "px", "qid"],
    )
    trades = spark.createDataFrame([("A", _ts(1, 10, 0), 1)], ["sym", "ts", "qty"])
    row = asof_join(trades, quotes, on="ts", by="sym").collect()[0]
    assert row["qid_matched"] == "near" and row["px_matched"] is None
    assert row["ts_matched"] == _ts(1, 9, 0)
    # tie variant: the on_tie winner carries a null alongside the tie col
    quotes2 = spark.createDataFrame(
        [
            ("A", _ts(1, 9, 0), 5.0, "lo"),
            ("A", _ts(1, 9, 0), 9.0, None),  # max-px winner, null qid
        ],
        ["sym", "ts", "px", "qid"],
    )
    row = asof_join(trades, quotes2, on="ts", by="sym", on_tie=("max", "px")).collect()[0]
    assert row["px_matched"] == 9.0 and row["qid_matched"] is None


def test_orderable_rejects_interval_variant_map():
    """Spark 4 cannot sort maps, calendar intervals, or variants
    (DATATYPE_MISMATCH.INVALID_ORDERING_TYPE) — _orderable must say so,
    also through array/struct nesting."""
    from pyspark.sql import types as T

    from anovos_spark.operators.temporal import _orderable

    assert not _orderable(T.MapType(T.StringType(), T.LongType()))
    assert not _orderable(T.CalendarIntervalType())
    assert not _orderable(T.ArrayType(T.CalendarIntervalType()))
    assert not _orderable(
        T.StructType([T.StructField("i", T.CalendarIntervalType())])
    )
    if hasattr(T, "VariantType"):
        assert not _orderable(T.VariantType())
    assert _orderable(T.ArrayType(T.StructType([T.StructField("x", T.DoubleType())])))
    # ANSI day-time / year-month intervals ARE orderable (distinct from
    # CalendarIntervalType) — they must stay in the canonical key
    assert _orderable(T.DayTimeIntervalType())
    assert _orderable(T.YearMonthIntervalType())


def test_asof_unorderable_payload_subset_deterministic(spark):
    """Canonical default with a MAP payload riding along: the tie is
    decided by the ORDERABLE subset (px, qid) deterministically across
    partition layouts, and the winner's map column arrives atomically
    from that same winning row."""
    quotes_rows = [
        ("A", _ts(1, 9, 0), 10.0, "q1", {"src": "a"}),
        ("A", _ts(1, 9, 0), 30.0, "q2", {"src": "b"}),  # winner on (px, qid)
        ("A", _ts(1, 9, 0), 30.0, "q0", {"src": "c"}),
        ("A", _ts(1, 9, 0), None, "q9", {"src": "d"}),
    ]
    trades = spark.createDataFrame([("A", _ts(1, 10, 0), 1)], ["sym", "ts", "qty"])
    for nparts in (1, 3, 7):
        quotes = spark.createDataFrame(
            quotes_rows, ["sym", "ts", "px", "qid", "meta"]
        ).repartition(nparts)
        row = asof_join(trades, quotes, on="ts", by="sym").collect()[0]
        assert (row["px_matched"], row["qid_matched"]) == (30.0, "q2"), nparts
        assert row["meta_matched"] == {"src": "b"}, nparts


def test_asof_all_unorderable_payload_arbitrary_pick(spark):
    """When NO payload column is orderable (all maps), the documented
    arbitrary-pick fallback fires: the join still succeeds and attaches
    ONE of the tied rows whole (no analysis error, no chimera)."""
    quotes = spark.createDataFrame(
        [
            ("A", _ts(1, 9, 0), {"v": 1}),
            ("A", _ts(1, 9, 0), {"v": 2}),
        ],
        ["sym", "ts", "meta"],
    )
    trades = spark.createDataFrame([("A", _ts(1, 10, 0), 1)], ["sym", "ts", "qty"])
    row = asof_join(trades, quotes, on="ts", by="sym").collect()[0]
    assert row["meta_matched"] in ({"v": 1}, {"v": 2})
    assert row["ts_matched"] == _ts(1, 9, 0)


def test_asof_calendar_interval_payload_no_analysis_error(spark):
    """Regression (0.13): a CalendarIntervalType payload column must fall
    out of the canonical tie key like maps do — pre-fix the canonical
    default (and the secondary key under on_tie) tried to sort by it and
    failed at analysis time with INVALID_ORDERING_TYPE."""
    quotes = spark.createDataFrame(
        [
            ("A", _ts(1, 9, 0), 10.0, 1),
            ("A", _ts(1, 9, 0), 30.0, 2),
        ],
        ["sym", "ts", "px", "months"],
    ).withColumn("ivl", F.expr("make_interval(0, months, 0, 0, 0, 0, 0)")).drop("months")
    assert quotes.schema["ivl"].dataType.typeName() == "interval"
    trades = spark.createDataFrame([("A", _ts(1, 10, 0), 1)], ["sym", "ts", "qty"])
    # canonical default: decided by the orderable subset (px).  PySpark
    # cannot deserialize CalendarInterval values to Python, so compare the
    # interval column JVM-side (cast to its month count) before collect.
    out = asof_join(trades, quotes, on="ts", by="sym").select(
        "px_matched", F.expr("extract(month from ivl_matched)").alias("m")
    )
    row = out.collect()[0]
    assert (row["px_matched"], row["m"]) == (30.0, 2)
    # explicit on_tie with the interval column riding along as payload
    row = (
        asof_join(trades, quotes, on="ts", by="sym", on_tie=("min", "px"))
        .select("px_matched", F.expr("extract(month from ivl_matched)").alias("m"))
        .collect()[0]
    )
    assert (row["px_matched"], row["m"]) == (10.0, 1)
