"""Structured-Streaming operators (SURVEY.md §2.8 T-series).

The reference's live surfaces are RethinkDB changefeeds
(``/root/reference/starbelly/db.py:1111-1161``), the periodic job-status
subscription (``subscription.py:441-458``) and the resumable job-sync
stream (``subscription.py:320-393``).  Spark-first equivalents:

* **T4 change streams** → ``readStream`` over a table directory
  (file-source incremental discovery; Iceberg CDC on a real cluster).
* **T5 periodic status** → windowed streaming aggregation with
  watermark + ``StreamingQueryListener``-style metrics rows.
* **S12/W4 job sync** → incremental read after a sequence cursor —
  in streaming form, ``readStream`` on the results table ordered by
  the checkpointed offset; batch form in ``sync_after``.

The crawl loop itself stays a driver-side micro-batch program
(crawl.py) because Python Structured Streaming lacks
flatMapGroupsWithState and the frontier update needs multi-table
transactional commits per batch (SURVEY.md §7.2 hard-part 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_events(spark: SparkSession, path: str,
                  schema: str = EVENTS_SCHEMA) -> DataFrame:
    """T4: file-backed change stream (new files = change events)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def windowed_status(events: DataFrame, window: str = "1 hour",
                    slide: str | None = None,
                    watermark: str = "2 hours") -> DataFrame:
    """T5: periodic status emission as a watermarked windowed agg."""
    win = (F.window("ts", window, slide) if slide
           else F.window("ts", window))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type", "n", "sum_value",
        )
    )


def run_stream_to_memory(stream_df: DataFrame, name: str,
                         output_mode: str = "append"):
    """Drive a streaming query synchronously to completion (local
    file sources drain with processAllAvailable)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory").queryName(name).start()
    )
    q.processAllAvailable()
    q.stop()
    return q


def sync_after(results: DataFrame, cursor: int) -> DataFrame:
    """S12/W4: the job-sync read path — ordered scan after a sequence
    cursor (db.py:1074-1109); the cursor is the resume token."""
    return results.where(F.col("sequence") > cursor).orderBy("sequence")


def streaming_first_seen(
    urls: DataFrame,
    n_groups: int = 8,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Custom STATEFUL streaming operator via ``applyInPandasWithState``
    (the Python-streaming form of the crawl's URL-seen set): emit each
    URL the FIRST time it appears across the whole stream, dropping
    every later occurrence — per-group state is the set of seen
    16-byte url_hashes, carried across micro-batches by the state
    store.

    Input stream columns: (url string, url_hash binary).  Groups are
    hash partitions of url_hash (same routing as seen.partition_col),
    so state per group stays bounded and the operator scales by adding
    shuffle partitions.  At 10^10 URLs each group's blob becomes a
    bloom/cuckoo segment exactly like seen.py — the plumbing (grouped
    state, Arrow batches, update semantics) is what this operator
    pins.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.BinaryType()),
    ])
    state_schema = T.StructType([T.StructField("seen", T.BinaryType())])

    def _first_seen(key, pdfs, state):
        blob = state.get[0] if state.exists else b""
        seen = {blob[i:i + 16] for i in range(0, len(blob or b""), 16)}
        for pdf in pdfs:
            keep_rows, keep_urls = [], []
            for u, h in zip(pdf["url"], pdf["url_hash"]):
                hb = bytes(h)
                if hb not in seen:
                    seen.add(hb)
                    keep_urls.append(u)
                    keep_rows.append(hb)
            if keep_rows:
                yield pd.DataFrame({"url": keep_urls, "url_hash": keep_rows})
        state.update((b"".join(sorted(seen)),))

    grouped = urls.withColumn(
        "_g", F.pmod(F.xxhash64("url_hash"), F.lit(n_groups))
    ).groupBy("_g")
    return grouped.applyInPandasWithState(
        _first_seen,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization via lag + cumulative gap count (batch form of
    session_window) — per-user sessions with bounded gap."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        events.withColumn("_gap", gap)
        .withColumn(
            "new_session",
            (F.col("_gap").isNull() | (F.col("_gap") > gap_minutes * 60))
            .cast("int"),
        )
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .drop("_gap", "new_session")
    )
