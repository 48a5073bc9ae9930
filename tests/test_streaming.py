"""Structured Streaming surfaces: file-source change stream, watermarked
windowed status agg, sync-after cursor, sessionization."""

import os

from pyspark.sql import functions as F

from starbelly_spark.streaming.events import (
    run_stream_to_memory,
    sessionize,
    stream_events,
    sync_after,
    windowed_status,
)


def test_windowed_status_stream(spark, sf_dir, tmp_path):
    # file streaming source needs a directory; link the table in
    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        stream_dir / "part-0.parquet",
    )
    events = stream_events(spark, str(stream_dir))
    agg = windowed_status(events, window="6 hours", watermark="1 hour")
    run_stream_to_memory(agg, "status_out", output_mode="append")
    got = spark.sql("SELECT * FROM status_out")
    batch = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    # streaming totals must equal batch totals per (window, type) —
    # append mode only emits closed windows, so compare totals of the
    # emitted windows against the batch computation for those windows
    emitted = got.agg(F.sum("n").alias("n")).collect()[0]["n"]
    assert emitted is not None and emitted > 0
    batch_agg = (
        batch.groupBy(F.window("ts", "6 hours").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    joined = got.join(
        batch_agg,
        (got.window_start == F.col("win.start")) & (got.event_type == batch_agg.event_type),
    )
    mismatches = joined.where(got.n != batch_agg.n).count()
    assert mismatches == 0


def test_sync_after_cursor(spark, sf_dir):
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    results = events.select(F.col("event_id").alias("sequence"), "event_type")
    cursor = 500
    out = sync_after(results, cursor).collect()
    assert all(r.sequence > cursor for r in out)
    seqs = [r.sequence for r in out]
    assert seqs == sorted(seqs)


def test_sessionize(spark):
    rows = [
        (1, "2024-01-01 10:00:00", 1),
        (2, "2024-01-01 10:10:00", 1),   # same session (gap 10m)
        (3, "2024-01-01 12:00:00", 1),   # new session (gap > 30m)
        (4, "2024-01-01 10:05:00", 2),   # other user
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.event_id: r.session_id for r in sessionize(df, 30).collect()}
    assert out[1] == out[2] != out[3]
    assert out[4] == 1
