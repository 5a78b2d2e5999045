import datetime
import shutil
import tempfile

import pytest

from anovos_spark.streaming import ops as S


@pytest.fixture(scope="module")
def stream_dir(spark):
    d = tempfile.mkdtemp(prefix="anovos_stream_")
    rows = []
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    for i in range(100):
        rows.append(
            (
                i,
                base + datetime.timedelta(seconds=30 * i),
                i % 5,
                float(i),
            )
        )
    # duplicate event ids 0-9 (late duplicates)
    for i in range(10):
        rows.append((i, base + datetime.timedelta(seconds=30 * i + 5), i % 5, float(i)))
    df = spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, user_id long, value double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/input")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _drain(query):
    query.awaitTermination(120)


def test_windowed_aggregation(spark, stream_dir):
    schema = "event_id long, ts timestamp, user_id long, value double"
    sdf = S.read_stream(spark, "parquet", f"{stream_dir}/input", schema=schema)
    agg = S.windowed_aggregation(
        sdf,
        "ts",
        window_duration="10 minutes",
        watermark="1 minute",
        group_cols=["user_id"],
        agg_exprs={"n": ("event_id", "count"), "total": ("value", "sum")},
    )
    q = S.write_stream(agg, "memory", query_name="win_agg", output_mode="append")
    _drain(q)
    out = spark.sql("select * from win_agg").collect()
    assert len(out) > 0
    # append mode emits only CLOSED windows: the final 12:40-12:50 window
    # (20 events) is still open when the stream drains — watermark
    # semantics working as designed
    assert sum(r["n"] for r in out) == 90


def test_streaming_dedup(spark, stream_dir):
    schema = "event_id long, ts timestamp, user_id long, value double"
    sdf = S.read_stream(spark, "parquet", f"{stream_dir}/input", schema=schema)
    deduped = S.streaming_dedup(sdf, ["event_id"], "ts", watermark="1 hour")
    q = S.write_stream(deduped, "memory", query_name="dedup_out", output_mode="append")
    _drain(q)
    out = spark.sql("select count(*) c, count(distinct event_id) d from dedup_out").collect()[0]
    assert out["c"] == 100  # 10 duplicates dropped
    assert out["d"] == 100


def test_sessionize(spark, stream_dir, tmp_path):
    import datetime

    # sessions only close when the watermark passes session_end + gap, so
    # the burst needs a much-later sentinel event to advance the watermark
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (i, base + datetime.timedelta(seconds=100 * i), i % 3, float(i))
        for i in range(30)
    ]
    rows.append((999, base + datetime.timedelta(hours=3), 999, 0.0))
    df = spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, user_id long, value double"
    )
    d = str(tmp_path / "sess_input")
    df.coalesce(1).write.mode("overwrite").parquet(d)

    schema = "event_id long, ts timestamp, user_id long, value double"
    sdf = S.read_stream(spark, "parquet", d, schema=schema)
    sessions = S.sessionize(sdf, "ts", "user_id", gap="6 minutes", watermark="1 minute")
    q = S.write_stream(sessions, "memory", query_name="sessions", output_mode="append")
    _drain(q)
    out = [r for r in spark.sql("select * from sessions").collect() if r["user_id"] != 999]
    # per-user events every 300 s < 6 min gap → one merged session per
    # user, closed by the sentinel's watermark advance
    assert len(out) == 3
    assert all(r["n_events"] == 10 for r in out)


def test_stateful_running_stats(spark, stream_dir):
    schema = "event_id long, ts timestamp, user_id long, value double"
    sdf = S.read_stream(spark, "parquet", f"{stream_dir}/input", schema=schema)
    stats = S.stateful_running_stats(sdf, "user_id", "value", "ts")
    q = S.write_stream(stats, "memory", query_name="running", output_mode="update")
    _drain(q)
    out = {r["user_id"]: r for r in spark.sql("select * from running").collect()}
    assert len(out) == 5
    assert out[0]["n"] == 22  # 20 + 2 dup rows for user 0
    assert out[0]["vmin"] == 0.0


def test_streaming_drift_monitor(spark, stream_dir):
    import uuid

    schema = "event_id long, ts timestamp, user_id long, value double"
    sdf = S.read_stream(spark, "parquet", f"{stream_dir}/input", schema=schema)
    # baseline == the stream's own distribution → PSI ≈ 0 in every window
    cuts = [25.0, 50.0, 75.0]
    props = [0.25, 0.25, 0.25, 0.25]
    mon = S.streaming_drift_monitor(
        sdf, "ts", "value", cuts, props, window_duration="10 minutes",
        watermark="10 minutes",
    )
    name = f"t_drift_{uuid.uuid4().hex[:8]}"
    q = (
        mon.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    _drain(q)
    rows = spark.table(name).collect()
    assert len(rows) >= 1
    assert all(r["n_events"] > 0 for r in rows)
    # values 0..99 uniform: every 10-min window (20 events) spans a narrow
    # value range → strong local drift vs the global baseline
    assert any(r["flagged"] == 1 for r in rows)
    with pytest.raises(ValueError):
        S.streaming_drift_monitor(sdf, "ts", "value", cuts, [0.5, 0.5])


def test_stream_stream_join(spark, stream_dir):
    import uuid

    schema = "event_id long, ts timestamp, user_id long, value double"

    def side(parity, id_alias, ts_alias):
        sdf = S.read_stream(spark, "parquet", f"{stream_dir}/input", schema=schema)
        return sdf.where(sdf["event_id"] % 2 == parity).select(
            sdf["event_id"].alias(id_alias), "user_id", sdf["ts"].alias(ts_alias)
        )

    left = side(0, "l_id", "l_ts")
    right = side(1, "r_id", "r_ts")
    joined = S.stream_stream_join(
        left, right, on="user_id", left_ts="l_ts", right_ts="r_ts",
        within="5 minutes", left_watermark="5 minutes", right_watermark="10 minutes",
    )
    name = f"t_ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    _drain(q)
    got = {
        (r["l_id"], r["r_id"]) for r in spark.table(name).collect()
    }
    # batch truth: same join condition on the static frames
    batch = spark.read.parquet(f"{stream_dir}/input")
    import pyspark.sql.functions as F

    lb = batch.where(F.col("event_id") % 2 == 0).select(
        F.col("event_id").alias("l_id"), "user_id", F.col("ts").alias("l_ts")
    )
    rb = batch.where(F.col("event_id") % 2 == 1).select(
        F.col("event_id").alias("r_id"), F.col("user_id").alias("u2"),
        F.col("ts").alias("r_ts"),
    )
    exp = {
        (r["l_id"], r["r_id"])
        for r in lb.join(
            rb,
            (F.col("user_id") == F.col("u2"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 5 MINUTES")),
        ).collect()
    }
    assert got == exp and len(got) > 0
    with pytest.raises(ValueError):
        S.stream_stream_join(
            left, right, on="user_id", left_ts="l_ts", right_ts="r_ts", how="bogus"
        )


def test_stream_stream_join_outer_keeps_right_keys(spark):
    # regression: rightOuter/fullOuter used to drop the right-side key
    # columns, losing the key of unmatched right rows entirely.  The
    # column logic is identical for batch frames (withWatermark is a
    # no-op there), which lets us assert the final emitted rows exactly.
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, base, "l1")], "user_id long, l_ts timestamp, l_tag string"
    )
    right = spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=1), "r1"), (99, base, "r99")],
        "user_id long, r_ts timestamp, r_tag string",
    )
    out = S.stream_stream_join(
        left, right, on="user_id", left_ts="l_ts", right_ts="r_ts",
        within="5 minutes", how="fullOuter",
    )
    assert out.columns.count("user_id") == 1
    rows = {(r["user_id"], r["l_tag"], r["r_tag"]) for r in out.collect()}
    assert rows == {(1, "l1", "r1"), (99, None, "r99")}


def test_rate_source_smoke(spark):
    sdf = S.read_stream(spark, "rate", options={"rowsPerSecond": "10"})
    assert sdf.isStreaming
    assert "timestamp" in sdf.columns


def test_incremental_stats_sink(spark, stream_dir, tmp_path):
    import pyspark.sql.functions as F

    schema = "event_id long, ts timestamp, user_id long, value double"
    # multi-file input so maxFilesPerTrigger=1 yields several micro-batches
    multi = str(tmp_path / "multi_input")
    spark.read.parquet(f"{stream_dir}/input").repartition(6).write.parquet(multi)

    def run(state, run_id, qn, compact_every=64):
        sdf = S.read_stream(
            spark, "parquet", multi, schema=schema,
            options={"maxFilesPerTrigger": "1"},
        )
        q = S.incremental_stats_sink(
            sdf, ["value"], state, query_name=qn, run_id=run_id,
            compact_every=compact_every,
        )
        _drain(q)

    state = str(tmp_path / "inc_stats")
    run(state, "runA", "inc1")
    out = {r["attribute"]: r for r in S.read_incremental_stats(spark, state).collect()}
    batch = spark.read.parquet(multi).agg(
        F.count("value").alias("n"),
        F.round(F.avg("value"), 6).alias("mean"),
        F.round(F.var_samp("value"), 6).alias("var"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    ).collect()[0]
    v = out["value"]
    assert v["n"] == batch["n"]
    assert abs(v["mean"] - batch["mean"]) < 1e-6
    assert abs(v["variance"] - batch["var"]) < 1e-4
    assert v["min"] == batch["mn"] and v["max"] == batch["mx"]
    # replay the SAME run (same run_id, same batch sequence): each batch
    # overwrites its own directory with identical content → stats unchanged
    run(state, "runA", "inc1_replay")
    v2 = {r["attribute"]: r for r in S.read_incremental_stats(spark, state).collect()}["value"]
    assert v2["n"] == v["n"] and v2["mean"] == v["mean"]
    # a genuinely NEW logical run gets its own run_id → contributes fully
    run(state, "runB", "inc2")
    v3 = {r["attribute"]: r for r in S.read_incremental_stats(spark, state).collect()}["value"]
    assert v3["n"] == 2 * v["n"]


def test_incremental_stats_sink_compaction(spark, stream_dir, tmp_path):
    import pyspark.sql.functions as F

    schema = "event_id long, ts timestamp, user_id long, value double"
    multi = str(tmp_path / "multi_input")
    spark.read.parquet(f"{stream_dir}/input").repartition(6).write.parquet(multi)
    state = str(tmp_path / "inc_stats_c")
    sdf = S.read_stream(
        spark, "parquet", multi, schema=schema, options={"maxFilesPerTrigger": "1"},
    )
    q = S.incremental_stats_sink(
        sdf, ["value"], state, query_name="inc_c", run_id="runC", compact_every=2,
    )
    _drain(q)
    # compaction folded old batches: live dirs bounded by compact_every+1,
    # independent of the 6 micro-batches that ran
    bids = S._list_batch_ids(spark, f"{state}/run_id=runC")
    assert any(b < 0 for b in bids)  # a compact generation exists
    assert len([b for b in bids if b >= 0]) <= 3
    # and the folded stats are still exact
    v = {r["attribute"]: r for r in S.read_incremental_stats(spark, state).collect()}["value"]
    batch = spark.read.parquet(multi).agg(
        F.count("value").alias("n"),
        F.round(F.avg("value"), 6).alias("mean"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    ).collect()[0]
    assert v["n"] == batch["n"] and abs(v["mean"] - batch["mean"]) < 1e-6
    assert v["min"] == batch["mn"] and v["max"] == batch["mx"]
    # replaying an already-compacted batch id writes a superseded dir the
    # reader must ignore (crash-safety contract): simulate by re-running
    # the same run — totals must not change
    sdf2 = S.read_stream(
        spark, "parquet", multi, schema=schema, options={"maxFilesPerTrigger": "1"},
    )
    q2 = S.incremental_stats_sink(
        sdf2, ["value"], state, query_name="inc_c2", run_id="runC", compact_every=100,
    )
    _drain(q2)
    v2 = {r["attribute"]: r for r in S.read_incremental_stats(spark, state).collect()}["value"]
    assert v2["n"] == batch["n"]


def test_streaming_dedup_sink(spark, tmp_path):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "one two three four five six seven eight nine ten eleven"),
            (3, "red orange yellow green blue indigo violet white black grey"),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs_multi")
    # 3 files -> 3 micro-batches at maxFilesPerTrigger=1
    docs.repartition(3, "doc_id").write.parquet(src)
    index_path = str(tmp_path / "dd_index")
    pairs_path = str(tmp_path / "dd_pairs")

    def run(run_id, qn, source=src):
        sdf = S.read_stream(
            spark, "parquet", source, schema="doc_id long, text string",
            options={"maxFilesPerTrigger": "1"},
        )
        q = S.streaming_dedup_sink(
            sdf, index_path, pairs_path, query_name=qn, run_id=run_id,
            threshold=0.5,
        )
        _drain(q)

    run("runA", "dd1")
    # distinct docs: index has all 3 signatures, no cross pairs
    assert S.read_dedup_index(spark, index_path).count() == 3
    assert S.read_dedup_pairs(spark, pairs_path).count() == 0
    # a second run streams edited copies: each must hit its source doc
    edited = docs.select(
        (F.col("doc_id") + 100).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail marker")).alias("text"),
    )
    src2 = str(tmp_path / "docs_edit")
    edited.repartition(3, "doc_id").write.parquet(src2)
    run("runB", "dd2", src2)
    pairs = S.read_dedup_pairs(spark, pairs_path).collect()
    assert {(r["new_id"], r["index_id"]) for r in pairs} == {
        (101, 1), (102, 2), (103, 3),
    }
    assert S.read_dedup_index(spark, index_path).count() == 6
    # replaying runB overwrites its own dirs with identical content
    run("runB", "dd3", src2)
    pairs2 = S.read_dedup_pairs(spark, pairs_path).collect()
    assert sorted((r["new_id"], r["index_id"]) for r in pairs2) == sorted(
        (r["new_id"], r["index_id"]) for r in pairs
    )
    assert S.read_dedup_index(spark, index_path).count() == 6


def test_streaming_dedup_sink_string_ids(spark, tmp_path):
    """First batch's empty pairs frame must take its id type from the
    batch (string here) — a hardcoded long would poison later parquet
    schema merges across sibling batch_id dirs."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            ("d1", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            ("d2", "one two three four five six seven eight nine ten eleven"),
        ],
        "doc_id string, text string",
    )
    src = str(tmp_path / "sdocs")
    docs.repartition(2, "doc_id").write.parquet(src)
    index_path = str(tmp_path / "sdd_index")
    pairs_path = str(tmp_path / "sdd_pairs")

    def run(run_id, qn, source):
        sdf = S.read_stream(
            spark, "parquet", source, schema="doc_id string, text string",
            options={"maxFilesPerTrigger": "1"},
        )
        q = S.streaming_dedup_sink(
            sdf, index_path, pairs_path, query_name=qn, run_id=run_id,
            threshold=0.5,
        )
        _drain(q)

    run("runA", "sdd1", src)
    assert S.read_dedup_pairs(spark, pairs_path).count() == 0
    edited = docs.select(
        F.concat(F.lit("copy_"), F.col("doc_id")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    src2 = str(tmp_path / "sdocs_edit")
    edited.repartition(2, "doc_id").write.parquet(src2)
    run("runB", "sdd2", src2)
    # the cross-batch read merges the empty first-batch file with the
    # string-id pair files — this is the line that used to fail
    pairs = S.read_dedup_pairs(spark, pairs_path).collect()
    assert {(r["new_id"], r["index_id"]) for r in pairs} == {
        ("copy_d1", "d1"), ("copy_d2", "d2"),
    }


def test_streaming_dedup_sink_intra_batch(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again extra"),
            (3, "completely different content about spark physical query plans"),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "one_batch")
    docs.coalesce(1).write.parquet(src)
    sdf = S.read_stream(spark, "parquet", src, schema="doc_id long, text string")
    q = S.streaming_dedup_sink(
        sdf, str(tmp_path / "idx"), str(tmp_path / "pairs"),
        query_name="ddintra", run_id="r0", threshold=0.5, intra_batch=True,
    )
    _drain(q)
    pairs = spark.read.parquet(str(tmp_path / "pairs")).collect()
    # no index yet -> only the within-batch near-dup, tagged intra
    assert [(r["new_id"], r["index_id"], r["intra"]) for r in pairs] == [(1, 2, True)]


def test_streaming_shuffle_partitions_scope(spark):
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with S.streaming_shuffle_partitions(spark, 3):
        assert spark.conf.get(key) == "3"
    assert spark.conf.get(key) == before
    # restores on exception too
    try:
        with S.streaming_shuffle_partitions(spark, 5):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(key) == before


class _FakeConf:
    def __init__(self, d):
        self._d = d

    def get(self, k, default=None):
        return self._d.get(k, default)


class _FakeSpark:
    def __init__(self, confs):
        self.conf = _FakeConf(confs)


def test_stream_scratch_local_lifecycle(spark, tmp_path):
    """At most TWO live dirs per tag with reclamation deferred one
    generation (r11 ADVICE: the immediately-previous invocation's
    returned DataFrame is lazy and may still read its scratch, so only
    the invocation after next may delete it).  Original r10 leak bound
    still holds: repeated runs never accumulate more than two dirs."""
    import os

    from anovos_spark import queries as Q

    d1 = Q._stream_scratch(spark, "pytest_scratch")
    assert os.path.isdir(d1)
    (open(os.path.join(d1, "marker"), "w")).close()
    d2 = Q._stream_scratch(spark, "pytest_scratch")
    # the previous dir SURVIVES the next invocation (lazy reader safety)
    assert os.path.isdir(d2) and d2 != d1 and os.path.isdir(d1)
    d3 = Q._stream_scratch(spark, "pytest_scratch")
    # ... and is reclaimed by the invocation after next (leak bound: 2)
    assert os.path.isdir(d3) and os.path.isdir(d2)
    assert not os.path.exists(d1)
    assert len(Q._SCRATCH_LIVE["pytest_scratch"]) == 2
    # distinct tags coexist
    d4 = Q._stream_scratch(spark, "pytest_scratch_other")
    assert os.path.isdir(d3) and os.path.isdir(d4)
    for tag in ("pytest_scratch", "pytest_scratch_other"):
        for d in Q._SCRATCH_LIVE.pop(tag):
            shutil.rmtree(d, ignore_errors=True)


def test_stream_scratch_conf_root_and_cluster_guard(tmp_path):
    """Conf-provided shared root is honored; a non-local master without a
    shared root raises instead of silently writing executor-local parquet
    the driver can't read back."""
    from anovos_spark import queries as Q

    root = str(tmp_path / "shared")
    fake = _FakeSpark({"spark.anovos.scratchDir": root, "spark.master": "yarn"})
    d = Q._stream_scratch(fake, "pytest_conf_scratch")
    assert d.startswith(root)
    for p in Q._SCRATCH_LIVE.pop("pytest_conf_scratch"):
        shutil.rmtree(p, ignore_errors=True)

    bare = _FakeSpark({"spark.master": "spark://host:7077"})
    with pytest.raises(ValueError, match="shared scratch dir"):
        Q._stream_scratch(bare, "pytest_cluster_scratch")


# ---------------------------------------------------------------------------
# Cross-batch watermark eviction (VERDICT r10 item #4): the stateful ops
# below were previously verified in single availableNow replays; these
# tests run them through >=4 micro-batches (maxFilesPerTrigger=1, one
# parquet file per batch in mtime order) with late/out-of-order rows
# crossing the watermark, and assert via StreamingQueryProgress
# stateOperators that (a) state rows are actually REMOVED between
# batches (eviction happens), (b) late rows are counted dropped and
# excluded from results.
#
# Measured Spark subtlety these tests encode: within one micro-batch the
# LATE-RECORD FILTER runs against the watermark of the PREVIOUS batch,
# while state eviction/emission runs against the updated one — so a late
# row arriving in the very batch where its window closes still slips in.
# The inputs therefore put TWO watermark-advancing sentinel batches
# between the on-time data and the late rows, guaranteeing the filter's
# (lagged) watermark has passed them.
# ---------------------------------------------------------------------------

def _write_event_file(path, rows, mtime):
    """One parquet FILE (not a Spark dir) so maxFilesPerTrigger=1 maps one
    file -> one micro-batch; mtimes pin the FileStreamSource batch order."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    ids, tss, uids, vals = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(list(tss), pa.timestamp("us", tz="UTC")),
                "user_id": pa.array(uids, pa.int64()),
                "value": pa.array([float(v) for v in vals], pa.float64()),
            }
        ),
        path,
    )
    os.utime(path, (mtime, mtime))


def _state_metrics(q):
    """Flatten recentProgress -> per-batch stateOperators metrics."""
    out = []
    for p in q.recentProgress:
        for so in p.get("stateOperators", []):
            out.append(so)
    return out


_EVSCHEMA = "event_id long, ts timestamp, user_id long, value double"


def _t(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m, 0)


def test_join_multibatch_watermark_eviction(spark, tmp_path):
    import uuid

    d = str(tmp_path / "mb_join")
    import os

    os.makedirs(d)
    # f1: matched pair at 12:00; f2+f3: far-future pairs advance the
    # watermark (two sentinel batches — see filter-lag note above);
    # f4: another pair + a LATE pair back at 12:30/12:31 — far behind
    # the watermark by then, must be dropped unjoined
    _write_event_file(f"{d}/f1.parquet",
                      [(0, _t(12, 0), 1, 0), (1, _t(12, 1), 1, 0)], 1_000)
    _write_event_file(f"{d}/f2.parquet",
                      [(10, _t(18, 0), 1, 0), (11, _t(18, 1), 1, 0)], 2_000)
    _write_event_file(f"{d}/f3.parquet",
                      [(40, _t(20, 0), 1, 0), (41, _t(20, 1), 1, 0)], 3_000)
    _write_event_file(f"{d}/f4.parquet",
                      [(20, _t(23, 0), 1, 0), (21, _t(23, 1), 1, 0),
                       (30, _t(12, 30), 1, 0), (31, _t(12, 31), 1, 0)], 4_000)

    def side(parity, id_alias, ts_alias):
        sdf = S.read_stream(spark, "parquet", d, schema=_EVSCHEMA,
                            options={"maxFilesPerTrigger": "1"})
        return sdf.where(sdf["event_id"] % 2 == parity).select(
            sdf["event_id"].alias(id_alias), "user_id", sdf["ts"].alias(ts_alias)
        )

    joined = S.stream_stream_join(
        side(0, "l_id", "l_ts"), side(1, "r_id", "r_ts"),
        on="user_id", left_ts="l_ts", right_ts="r_ts",
        within="5 minutes", left_watermark="1 hour", right_watermark="1 hour",
    )
    name = f"mbj_{uuid.uuid4().hex[:8]}"
    with S.streaming_shuffle_partitions(spark, 4):
        q = (
            joined.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        _drain(q)
    got = {(r["l_id"], r["r_id"]) for r in spark.table(name).collect()}
    # on-time pairs joined; the late pair (30, 31) excluded per contract
    assert got == {(0, 1), (10, 11), (40, 41), (20, 21)}
    sos = _state_metrics(q)
    assert len({p["batchId"] for p in q.recentProgress}) >= 4
    # eviction actually happened: buffered join rows were removed once the
    # watermark passed their window ...
    assert sum(so["numRowsRemoved"] for so in sos) > 0
    # ... so total state shrank below its peak by the final batch
    totals = [so["numRowsTotal"] for so in sos]
    assert totals[-1] < max(totals)
    # the late rows were counted as watermark drops
    assert sum(so["numRowsDroppedByWatermark"] for so in sos) >= 1


def test_sessionize_multibatch_watermark_eviction(spark, tmp_path):
    import os
    import uuid

    d = str(tmp_path / "mb_sess")
    os.makedirs(d)
    # f1: u1 burst (one session); f2+f3: sentinels advance the watermark
    # past the session (two batches — filter-lag note above); f4: new u3
    # burst + LATE u1 row at 12:02 that must neither extend nor
    # resurrect u1's already-emitted session
    _write_event_file(f"{d}/f1.parquet",
                      [(0, _t(12, 0), 1, 0), (1, _t(12, 1), 1, 0)], 1_000)
    _write_event_file(f"{d}/f2.parquet", [(10, _t(15, 0), 2, 0)], 2_000)
    _write_event_file(f"{d}/f3.parquet", [(11, _t(16, 0), 2, 0)], 3_000)
    _write_event_file(f"{d}/f4.parquet",
                      [(20, _t(18, 0), 3, 0), (30, _t(12, 2), 1, 0)], 4_000)
    sdf = S.read_stream(spark, "parquet", d, schema=_EVSCHEMA,
                        options={"maxFilesPerTrigger": "1"})
    sessions = S.sessionize(sdf, "ts", "user_id", gap="5 minutes",
                            watermark="10 minutes")
    name = f"mbs_{uuid.uuid4().hex[:8]}"
    with S.streaming_shuffle_partitions(spark, 4):
        q = (
            sessions.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        _drain(q)
    rows = {r["user_id"]: r for r in spark.table(name).collect()}
    # u1's session closed with exactly its 2 on-time events — the late row
    # didn't extend it (and no second u1 session appeared)
    assert rows[1]["n_events"] == 2
    assert [r["user_id"] for r in spark.table(name).collect()].count(1) == 1
    sos = _state_metrics(q)
    assert len({p["batchId"] for p in q.recentProgress}) >= 4
    assert sum(so["numRowsRemoved"] for so in sos) > 0
    totals = [so["numRowsTotal"] for so in sos]
    assert totals[-1] < max(totals)
    assert sum(so["numRowsDroppedByWatermark"] for so in sos) >= 1


def test_drift_monitor_multibatch_watermark_eviction(spark, tmp_path):
    import os
    import uuid

    d = str(tmp_path / "mb_drift")
    os.makedirs(d)
    # f1: 20 events in the 12:00-12:10 window; f2+f3: sentinels far ahead
    # (two batches — filter-lag note above); f4: more current data + LATE
    # rows back in the 12:00 window that must not change its
    # already-emitted n_events
    f1 = [(i, _t(12, 0) + datetime.timedelta(seconds=15 * i), 1, i)
          for i in range(20)]
    _write_event_file(f"{d}/f1.parquet", f1, 1_000)
    _write_event_file(f"{d}/f2.parquet", [(100, _t(15, 0), 1, 50)], 2_000)
    _write_event_file(f"{d}/f3.parquet", [(101, _t(16, 0), 1, 50)], 3_000)
    _write_event_file(f"{d}/f4.parquet",
                      [(200, _t(18, 0), 1, 60), (201, _t(12, 7), 1, 70),
                       (202, _t(12, 8), 1, 80)], 4_000)
    sdf = S.read_stream(spark, "parquet", d, schema=_EVSCHEMA,
                        options={"maxFilesPerTrigger": "1"})
    mon = S.streaming_drift_monitor(
        sdf, "ts", "value", [25.0, 50.0, 75.0], [0.25, 0.25, 0.25, 0.25],
        window_duration="10 minutes", watermark="10 minutes",
    )
    name = f"mbd_{uuid.uuid4().hex[:8]}"
    with S.streaming_shuffle_partitions(spark, 4):
        q = (
            mon.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        _drain(q)
    rows = {r["window"]["start"]: r for r in spark.table(name).collect()}
    # the 12:00 window was emitted with its 20 on-time events only
    assert rows[_t(12, 0)]["n_events"] == 20
    sos = _state_metrics(q)
    assert len({p["batchId"] for p in q.recentProgress}) >= 4
    assert sum(so["numRowsRemoved"] for so in sos) > 0
    totals = [so["numRowsTotal"] for so in sos]
    assert totals[-1] < max(totals)
    assert sum(so["numRowsDroppedByWatermark"] for so in sos) >= 1


def test_dedup_multibatch_watermark_eviction(spark, tmp_path):
    import os
    import uuid

    d = str(tmp_path / "mb_dedup")
    os.makedirs(d)
    # f1: two distinct events + one intra-batch duplicate; f2+f3:
    # sentinels advance the watermark far past f1; f4: a LATE duplicate
    # of event 0 (key state already evicted) and a late NEW key — with
    # dropDuplicatesWithinWatermark semantics the late duplicate may
    # reappear ONLY if its key's state was evicted, and late rows behind
    # the filter watermark are dropped entirely
    _write_event_file(f"{d}/f1.parquet",
                      [(0, _t(12, 0), 1, 0), (1, _t(12, 1), 1, 0),
                       (0, _t(12, 2), 1, 0)], 1_000)
    _write_event_file(f"{d}/f2.parquet", [(10, _t(15, 0), 2, 0)], 2_000)
    _write_event_file(f"{d}/f3.parquet", [(11, _t(16, 0), 2, 0)], 3_000)
    _write_event_file(f"{d}/f4.parquet",
                      [(0, _t(12, 3), 1, 0), (30, _t(12, 4), 1, 0),
                       (20, _t(18, 0), 3, 0)], 4_000)
    sdf = S.read_stream(spark, "parquet", d, schema=_EVSCHEMA,
                        options={"maxFilesPerTrigger": "1"})
    deduped = S.streaming_dedup(sdf, ["event_id"], "ts", watermark="30 minutes")
    name = f"mbdd_{uuid.uuid4().hex[:8]}"
    with S.streaming_shuffle_partitions(spark, 4):
        q = (
            deduped.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        _drain(q)
    ids = [r["event_id"] for r in spark.table(name).collect()]
    # the intra-batch duplicate of 0 was dropped; the late rows (0, 30)
    # were dropped by the watermark filter, not re-emitted
    assert sorted(ids) == [0, 1, 10, 11, 20]
    sos = _state_metrics(q)
    assert len({p["batchId"] for p in q.recentProgress}) >= 4
    # key state from f1/f2 was evicted once the watermark passed it
    assert sum(so["numRowsRemoved"] for so in sos) > 0
    totals = [so["numRowsTotal"] for so in sos]
    assert totals[-1] < max(totals)
    assert sum(so["numRowsDroppedByWatermark"] for so in sos) >= 1
