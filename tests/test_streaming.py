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
