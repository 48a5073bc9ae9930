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

import zlib

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


def make_first_seen_fn(bloom_bits: int, salt_seed: int, job_id: str):
    """The ``applyInPandasWithState`` kernel for streaming first-seen,
    factored out so tests can drive it with a fake state handle.

    Per-group state is ONE serialized BlockedBloom segment —
    **fixed-size** (``16 + bloom_bits/8`` bytes) no matter how many
    URLs the group has ever seen (the r2 verdict's unbounded
    sorted-hash-blob state, retired).  Bloom semantics give the exact
    split the batch engine uses (seen.split_new_urls):

    * bloom MISS ⇒ definitely first — emitted with ``maybe_dup=false``
      (no false negatives, so these are EXACTLY correct);
    * bloom HIT ⇒ seen before OR a false positive — emitted with
      ``maybe_dup=true`` for the downstream exact rescue
      (``rescue_maybe_dups``: anti-join against the exact seen table,
      outside the state store).

    In-batch repeats of a hash are exact duplicates of their first
    occurrence in the same batch and are dropped outright.  Because
    ``applyInPandasWithState`` may deliver a group's batch as SEVERAL
    Arrow chunks, that dedup must span chunks: a per-invocation set of
    hashes already emitted this batch (bounded by batch size, never
    persisted) suppresses later-chunk repeats — without it, a hash
    emitted sure in chunk 1 would bloom-hit in chunk 2 and be emitted
    again as maybe_dup, which the exact rescue (keyed on the external
    seen table only) cannot remove.
    """
    import pandas as pd

    from ..seen import BlockedBloom, _as_matrix

    def _first_seen(key, pdfs, state):
        salt = zlib.crc32(f"{job_id}|{int(key[0])}|{salt_seed}".encode())
        bloom = (
            BlockedBloom.from_bytes(bytes(state.get[0]))
            if state.exists else BlockedBloom(bloom_bits, salt)
        )
        emitted_this_batch: set = set()
        for pdf in pdfs:
            if not len(pdf):
                continue
            hb = pdf["url_hash"].map(bytes)
            hit = bloom.contains(_as_matrix(list(hb)))
            # later in-batch occurrences (same chunk OR a previous
            # chunk of this invocation) are exact dups of their first
            # occurrence in this batch — dropped outright
            first_in_batch = (
                ~hb.duplicated(keep="first").values
                & ~hb.isin(emitted_this_batch).values
            )
            keep = pd.DataFrame({
                "url": pdf["url"].values,
                "url_hash": hb.values,
                "maybe_dup": hit,
            })[first_in_batch]
            emitted_this_batch.update(keep["url_hash"])
            bloom.add(_as_matrix(list(keep["url_hash"][~keep["maybe_dup"]])))
            if len(keep):
                yield keep
        state.update((bloom.to_bytes(),))

    return _first_seen


def streaming_first_seen(
    urls: DataFrame,
    n_groups: int = 8,
    bloom_bits: int = 1 << 16,
    salt_seed: int = 42,
    job_id: str = "stream",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Custom STATEFUL streaming operator via ``applyInPandasWithState``
    (the Python-streaming form of the crawl's URL-seen set): emit each
    URL the FIRST time it appears across the whole stream, with
    bounded per-group state (see ``make_first_seen_fn``).

    Input stream columns: (url string, url_hash binary).  Output adds
    ``maybe_dup``: false rows are exactly-first; true rows need the
    exact rescue (``rescue_maybe_dups``) — the same
    prefilter-plus-rescue contract as the batch seen set.  Groups are
    hash partitions of url_hash (same routing as seen.partition_col),
    so the operator scales by adding groups: at 10^10 URLs, 1024
    groups × a 12 MB bloom segment each, all in the state store.
    """
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.BinaryType()),
        T.StructField("maybe_dup", T.BooleanType()),
    ])
    state_schema = T.StructType([T.StructField("seen", T.BinaryType())])

    grouped = urls.withColumn(
        "_g", F.pmod(F.xxhash64("url_hash"), F.lit(n_groups))
    ).groupBy("_g")
    return grouped.applyInPandasWithState(
        make_first_seen_fn(bloom_bits, salt_seed, job_id),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def rescue_maybe_dups(emitted: DataFrame, exact_seen: DataFrame) -> DataFrame:
    """Exact rescue for ``streaming_first_seen`` output (run per sink
    micro-batch, e.g. in foreachBatch, against the exact seen table):
    keep definite firsts plus maybe-rows that the exact table does NOT
    contain — identical contract to seen.split_new_urls."""
    sure = emitted.where(~F.col("maybe_dup"))
    rescued = emitted.where(F.col("maybe_dup")).join(
        exact_seen.select("url_hash"), "url_hash", "left_anti"
    )
    return sure.unionByName(rescued).drop("maybe_dup")


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
