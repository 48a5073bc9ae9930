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


def test_streaming_first_seen_stateful(spark, tmp_path):
    """applyInPandasWithState: the seen-set as a custom stateful
    streaming operator — a URL emitted in micro-batch 1 must be
    suppressed when it reappears in micro-batch 2 (state survives
    across triggers via the state store)."""
    import hashlib

    from starbelly_spark.streaming.events import streaming_first_seen

    def h(u):
        return hashlib.blake2b(u.encode(), digest_size=16).digest()

    src = tmp_path / "urls_in"
    src.mkdir()
    batch1 = [("http://a/1", h("http://a/1")), ("http://a/2", h("http://a/2")),
              ("http://a/2", h("http://a/2"))]              # in-batch dup
    batch2 = [("http://a/2", h("http://a/2")),              # cross-batch dup
              ("http://a/3", h("http://a/3"))]
    spark.createDataFrame(batch1, "url string, url_hash binary") \
        .coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(batch2, "url string, url_hash binary") \
        .coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema("url string, url_hash binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out = streaming_first_seen(stream, n_groups=4)
    q = (
        out.writeStream.outputMode("update").format("memory")
        .queryName("first_seen")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    emitted = spark.sql("SELECT * FROM first_seen").collect()
    # bloom misses are EXACTLY the true firsts (no false negatives);
    # the cross-batch repeat of a/2 surfaces only as a maybe_dup row
    sure = sorted(r.url for r in emitted if not r.maybe_dup)
    assert sure == ["http://a/1", "http://a/2", "http://a/3"]
    # exact rescue: anti-join maybe rows against the exact seen table
    # (here: the definite firsts) — everything maybe was a true dup
    from starbelly_spark.streaming.events import rescue_maybe_dups

    edf = spark.createDataFrame(emitted)
    exact_seen = edf.where(~F.col("maybe_dup")).select("url_hash")
    final = sorted(
        r.url for r in rescue_maybe_dups(edf, exact_seen).collect()
    )
    assert final == ["http://a/1", "http://a/2", "http://a/3"]


def test_first_seen_state_is_bounded(spark):
    """r3: per-group state is ONE fixed-size bloom segment — its byte
    length does not grow with the number of URLs seen (the r2 blob
    state grew 16 bytes per URL)."""
    import hashlib

    from starbelly_spark.streaming.events import make_first_seen_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self.get = None

        def update(self, tup):
            self.get = tup
            self.exists = True

    bloom_bits = 1 << 13
    fn = make_first_seen_fn(bloom_bits, 42, "t")
    state = FakeState()

    def batch(urls):
        import pandas as pd

        return pd.DataFrame({
            "url": urls,
            "url_hash": [hashlib.blake2b(u.encode(), digest_size=16).digest()
                         for u in urls],
        })

    list(fn((0,), [batch([f"http://x/{i}" for i in range(10)])], state))
    size_10 = len(state.get[0])
    out2 = list(fn((0,), [batch([f"http://x/{i}" for i in range(500)])],
                 state))
    size_510 = len(state.get[0])
    assert size_10 == size_510 == 16 + bloom_bits // 8
    # and the operator still dedups: the 10 ramp URLs come back as
    # maybe_dup (bloom hit), the 490 new ones as definite firsts
    import pandas as pd

    all2 = pd.concat(out2)
    assert int((~all2["maybe_dup"]).sum()) == 490
    assert int(all2["maybe_dup"].sum()) == 10


def test_first_seen_dedups_across_arrow_chunks(spark):
    """r4 regression (advisor finding): applyInPandasWithState may
    deliver ONE micro-batch as SEVERAL Arrow chunks.  A URL repeated
    across chunks of the same batch must be emitted exactly once — not
    once sure (chunk 1) plus once maybe_dup (chunk 2, bloom hit from
    the chunk-1 add), which the downstream exact rescue could not
    remove because the external seen table doesn't hold this batch's
    rows yet."""
    import hashlib

    import pandas as pd

    from starbelly_spark.streaming.events import make_first_seen_fn

    class FakeState:
        exists = False
        get = None

        def update(self, tup):
            self.get = tup
            self.exists = True

    def batch(urls):
        return pd.DataFrame({
            "url": urls,
            "url_hash": [hashlib.blake2b(u.encode(), digest_size=16).digest()
                         for u in urls],
        })

    fn = make_first_seen_fn(1 << 13, 42, "t")
    # one invocation, three chunks; a/1 repeats in chunks 1+2+3 and
    # a/2 repeats in chunks 2+3
    chunks = [
        batch(["http://a/1", "http://a/0"]),
        batch(["http://a/1", "http://a/2"]),
        batch(["http://a/2", "http://a/3", "http://a/1"]),
    ]
    out = pd.concat(list(fn((0,), chunks, FakeState())))
    # each URL exactly once, all as definite firsts (fresh bloom)
    assert sorted(out["url"]) == [f"http://a/{i}" for i in range(4)]
    assert not out["maybe_dup"].any()
