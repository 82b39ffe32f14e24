"""Structured Streaming tests: streaming windows over the events
fixture via the memory sink, checked against the batch equivalents."""

import pytest
from pyspark.sql import functions as F

from thrill_spark.catalog import load_table
from thrill_spark.streaming import windows as W

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    return load_table(spark, SF, "events").select("ts", "user_id", "event_type", "value").cache()


def _run_stream(spark, events_batch, build, name):
    schema = events_batch.schema
    import tempfile, os

    d = tempfile.mkdtemp(prefix="ts_stream_")
    events_batch.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(schema).parquet(d)
    out = build(stream)
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        return spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()


def test_stream_batch_schema_parity(spark, events_batch):
    """Pin the ts dtype once for the whole streaming surface: the
    r2 runtime drift (TIMESTAMP(NANOS) -> TIMESTAMP_NTZ) must never
    silently diverge the stream schema from the batch schema."""
    from pyspark.sql import types as T

    assert isinstance(events_batch.schema["ts"].dataType, T.TimestampType)
    import tempfile

    d = tempfile.mkdtemp(prefix="ts_schema_")
    events_batch.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(events_batch.schema).parquet(d)
    assert stream.schema == events_batch.schema
    assert stream.isStreaming


def test_stream_tumbling_matches_batch(spark, events_batch):
    got = _run_stream(
        spark,
        events_batch,
        lambda s: W.stream_tumbling(s, "ts", "1 hour", "10 minutes", keys=("event_type",)),
        "tumbling_out",
    )
    want = W.tumbling(events_batch, "ts", "1 hour", keys=("event_type",)).collect()
    g = sorted((r["window_start"], r["event_type"], r["n"]) for r in got)
    w = sorted((r["window_start"], r["event_type"], r["n"]) for r in want)
    assert g == w


def test_stream_session_window_runs(spark, events_batch):
    got = _run_stream(
        spark,
        events_batch,
        lambda s: W.stream_session(s, "ts", "30 minutes", "10 minutes"),
        "session_out",
    )
    assert len(got) > 0
    # session invariant: end >= start, n_events >= 1
    for r in got:
        assert r["session_end"] >= r["session_start"] and r["n_events"] >= 1


def test_batch_sessionize_gap_semantics(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0),
        (1, t0 + dt.timedelta(minutes=10)),   # same session
        (1, t0 + dt.timedelta(minutes=70)),   # new session (gap 60 > 30)
        (2, t0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = W.sessionize(df, "ts", gap_minutes=30).collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user[1]) == [1, 2]
    assert per_user[2] == [1]


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """State must carry across micro-batches: feed two files with
    maxFilesPerTrigger=1 and check the final running totals equal the
    whole-input aggregation."""
    import os
    from thrill_spark.streaming.stateful import stream_running_totals

    d = str(tmp_path / "in")
    os.makedirs(d, exist_ok=True)
    batch1 = spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 1.0)], ["user_id", "value"])
    batch2 = spark.createDataFrame([(1, 2.0), (2, 4.0), (3, 7.0)], ["user_id", "value"])
    batch1.coalesce(1).write.mode("append").parquet(d)
    batch2.coalesce(1).write.mode("append").parquet(d)

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    out = stream_running_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM running_totals").collect()
    finally:
        q.stop()
    # last emission per user must equal the all-input totals
    latest = {}
    for r in rows:  # memory sink appends in batch order
        latest[r["user_id"]] = (r["n_events"], r["total"])
    assert latest[1] == (3, 17.0)
    assert latest[2] == (2, 5.0)
    assert latest[3] == (1, 7.0)


def _feed_files(spark, tmp_path, schema, batches, subdir="in"):
    """Write each batch as one parquet file with increasing mtimes so
    maxFilesPerTrigger=1 processes them in order."""
    import os
    import time

    d = str(tmp_path / subdir)
    os.makedirs(d, exist_ok=True)
    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(d)
        time.sleep(0.05)
    return d


def _drain(spark, out, name, mode):
    q = out.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        return spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()


def test_stream_dedup_across_batches(spark, tmp_path):
    import datetime as dt
    from thrill_spark.streaming.dedup import stream_dedup

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    sch = "event_id long, ts timestamp"
    d = _feed_files(
        spark, tmp_path, sch,
        [
            [(1, t0), (2, t0 + dt.timedelta(minutes=1)), (1, t0)],
            [(1, t0), (3, t0 + dt.timedelta(minutes=2))],  # 1 is a cross-batch dup
        ],
    )
    stream = spark.readStream.schema(sch).option("maxFilesPerTrigger", "1").parquet(d)
    rows = _drain(spark, stream_dedup(stream, ["event_id"]), "dedup_out", "append")
    assert sorted(r["event_id"] for r in rows) == [1, 2, 3]


def test_stream_stream_join_matches_batch(spark, tmp_path):
    import datetime as dt
    from thrill_spark.streaming.joins import stream_stream_join

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    sch = "user_id long, ts timestamp, tag string"
    imps = [
        (1, t0, "imp_a"),
        (1, t0 + dt.timedelta(hours=3), "imp_b"),
        (2, t0, "imp_c"),
    ]
    clicks = [
        (1, t0 + dt.timedelta(minutes=10), "clk_a"),      # joins imp_a
        (1, t0 + dt.timedelta(hours=3, minutes=5), "clk_b"),  # joins imp_b
        (2, t0 + dt.timedelta(hours=2), "clk_late"),      # outside 30m lag
    ]
    di = _feed_files(spark, tmp_path, sch, [imps], subdir="imps")
    dc = _feed_files(spark, tmp_path, sch, [clicks], subdir="clicks")
    si = spark.readStream.schema(sch).parquet(di)
    sc = spark.readStream.schema(sch).parquet(dc)
    rows = _drain(
        spark,
        stream_stream_join(si, sc, "user_id", max_lag="30 minutes"),
        "ssj_out",
        "append",
    )
    got = sorted((r["l_tag"], r["r_tag"]) for r in rows)
    assert got == [("imp_a", "clk_a"), ("imp_b", "clk_b")]


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode tumbling agg with a 10-minute watermark: an event
    arriving after its window's watermark passed must not reopen the
    finalized window."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    sch = "user_id long, ts timestamp"
    d = _feed_files(
        spark, tmp_path, sch,
        [
            [(1, t0 + dt.timedelta(minutes=5)), (1, t0 + dt.timedelta(minutes=50))],
            # a batch-1 max of 12:50 sets the watermark to 12:40, but the
            # update only becomes operative one batch later — keep the
            # watermark level with an on-time event here
            [(1, t0 + dt.timedelta(minutes=55))],
            # watermark is now operative at 12:40; the 12:00 window closed
            [(1, t0 + dt.timedelta(minutes=6))],
            # advance watermark far so every window finalizes and emits
            [(1, t0 + dt.timedelta(hours=5))],
        ],
    )
    stream = spark.readStream.schema(sch).option("maxFilesPerTrigger", "1").parquet(d)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "30 minutes"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("w"), "n")
    )
    rows = _drain(spark, agg, "late_out", "append")
    by_w = {r["w"]: r["n"] for r in rows}
    # the 12:00 window finalized with 1 event; the late 12:06 event was dropped
    assert by_w[t0] == 1
    assert by_w[t0 + dt.timedelta(minutes=30)] == 2
