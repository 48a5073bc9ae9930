"""Job read-path API — the Spark form of the reference's control-plane
reads (SURVEY.md §2.10, §3.2).

The reference exposes these over WebSocket+protobuf; here they are
plain driver functions over the job store (the brief scopes out the
wire protocol, ``SURVEY.md §2.10``):

* ``get_job_items`` — ``get_job_items`` / db.py:951-1012: ordered,
  paginated scan of results filtered by success/error/exception
  flags, with the body joined in (J1 order-preserving left join +
  W2 pagination).
* ``list_jobs`` — reverse-chron job list (W3, db.py:1028-1040),
  optional tag filter (P6).
* ``sync_items`` — resumable ordered scan after a sequence token
  (S12/W4, db.py:1074-1109 + subscription.py:320-342); the returned
  max sequence is the next sync token.
* ``job_status`` — the counters snapshot (A5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tableio import JobStore


def _results(store: JobStore) -> DataFrame:
    m = store.latest_manifest()
    if m is None:
        # deleted or never-started job (reference raises
        # InvalidRequestException "No job exists", server/job.py:28-30)
        raise ValueError(f"no job exists with id {store.job_id}")
    return store.table(m, "results")


def get_job_items(
    spark: SparkSession,
    root: str,
    job_id: str,
    include_success: bool = True,
    include_error: bool = True,
    include_exception: bool = True,
    offset: int = 0,
    limit: int = 100,
    with_body: bool = True,
) -> DataFrame:
    """Ordered, paginated item read with flag filtering (db.py:951-1012).

    success = 2xx; error = non-2xx status; exception = no status at all
    (db.py:963-993 boolean-expression semantics).
    """
    store = JobStore(spark, root, job_id)
    df = _results(store)
    is_success = F.col("is_success")
    is_error = (~F.col("is_success")) & F.col("status_code").isNotNull()
    is_exception = F.col("status_code").isNull()
    keep = F.lit(False)
    if include_success:
        keep = keep | is_success
    if include_error:
        keep = keep | is_error
    if include_exception:
        keep = keep | is_exception
    out = df.where(keep).orderBy("sequence")
    if not with_body:
        out = out.drop("body")
    return out.offset(offset).limit(limit)


def list_jobs(
    spark: SparkSession,
    root: str,
    job_ids: list[str],
    offset: int = 0,
    limit: int = 20,
) -> list[dict]:
    """Reverse-chron job list from manifests (W3 semantics)."""
    rows = []
    for job_id in job_ids:
        store = JobStore(spark, root, job_id)
        m = store.latest_manifest()
        if m is None:
            continue
        rows.append({
            "job_id": job_id,
            "run_state": m["run_state"],
            "batch_id": m["batch_id"],
            "clock": m["clock"],
            **m["counters"],
        })
    rows.sort(key=lambda r: (-r["clock"], r["job_id"]))
    return rows[offset:offset + limit]


def sync_items(
    spark: SparkSession,
    root: str,
    job_id: str,
    sync_token: int = 0,
    max_items: int = 1000,
) -> tuple[DataFrame, int]:
    """Resumable ordered read after a sequence cursor; returns
    (items, next_token).  next_token == sync_token ⇒ drained."""
    store = JobStore(spark, root, job_id)
    df = (
        _results(store)
        .where(F.col("sequence") > sync_token)
        .orderBy("sequence")
        .limit(max_items)
    )
    # ONE execution: the page is ≤ max_items rows, so collect it and
    # derive the token from the collected page (the previous shape ran
    # the limited scan twice — once for max(sequence), once for rows)
    rows = df.collect()
    token = max((r["sequence"] for r in rows), default=sync_token)
    page = spark.createDataFrame(rows, df.schema) if rows else df
    return page, int(token)


def job_status(spark: SparkSession, root: str, job_id: str) -> dict:
    from .crawl import job_stats

    return job_stats(spark, root, job_id)


def results_as_of(
    spark: SparkSession,
    root: str,
    job_id: str,
    batch_id: int,
) -> DataFrame:
    """Snapshot time travel: the results table exactly as of a
    committed batch (Iceberg's ``VERSION AS OF`` contract over the
    manifest log — old dirs are never deleted, so every committed
    snapshot stays readable)."""
    from .crawl import RESULTS_SCHEMA

    store = JobStore(spark, root, job_id)
    m = store.manifest_at(batch_id)
    if m is None:
        raise ValueError(f"no committed snapshot for batch {batch_id}")
    # schema so a pre-first-results snapshot (e.g. the batch-0 manifest
    # from start_job) returns an empty, correctly-typed DataFrame
    return store.table(m, "results", schema=RESULTS_SCHEMA)


def task_tree(
    spark: SparkSession,
    root: str,
    job_ids: list[str],
) -> dict:
    """Task-monitor snapshot — the analogue of the reference's
    task-tree subscription (``/root/reference/starbelly/
    subscription.py:602-680``: a periodic nested (name, subtasks)
    render of the running scheduler).  Here the "tasks" are the two
    real execution trees: the crawl jobs (manifest state → batch /
    counters) and Spark's scheduler (active jobs → active stages with
    task progress, via the public StatusTracker).  Callers poll this
    on the reference's period to stream the same surface."""
    jobs_node: list[dict] = []
    for job_id in job_ids:
        m = JobStore(spark, root, job_id).latest_manifest()
        if m is None:
            continue
        jobs_node.append({
            "name": f"job {job_id} ({m['run_state']})",
            "subtasks": [
                {"name": f"batch {m['batch_id']}", "subtasks": []},
                {"name": f"items {m['counters']['item_count']}",
                 "subtasks": []},
            ],
        })
    tracker = spark.sparkContext.statusTracker()
    stage_nodes = []
    for sid in tracker.getActiveStageIds():
        info = tracker.getStageInfo(sid)
        if info is None:
            continue
        stage_nodes.append({
            "name": f"stage {sid} ({info.numCompletedTasks}/"
                    f"{info.numTasks} tasks)",
            "subtasks": [],
        })
    spark_node = {
        "name": f"spark jobs {list(tracker.getActiveJobsIds())}",
        "subtasks": stage_nodes,
    }
    return {"name": "<Root>",
            "subtasks": [{"name": "crawl jobs", "subtasks": jobs_node},
                         spark_node]}


def resource_history(
    spark: SparkSession,
    root: str,
    job_id: str,
    last_n: int = 60,
) -> DataFrame:
    """Rolling resource/throughput view — the analogue of the
    reference's 1 Hz ring-buffer resource monitor
    (``/root/reference/starbelly/resource_monitor.py:67-141``, 60-sample
    history): the last ``last_n`` micro-batch snapshots with derived
    rates, newest first."""
    store = JobStore(spark, root, job_id)
    m = store.latest_manifest()
    if m is None:
        # deleted or never-started job — same guard as _results
        # (ADVICE r5 #5: delete_job made this reachable)
        raise ValueError(f"no job exists with id {job_id}")
    metrics = store.table(m, "metrics")
    span = F.greatest(
        F.col("clock_end") - F.col("clock_start"), F.lit(1e-9)
    )
    return (
        metrics.orderBy(F.col("batch_id").desc())
        .limit(last_n)
        .select(
            "batch_id", "clock_start", "clock_end",
            "urls_fetched", "links_discovered", "links_new",
            F.round(F.col("urls_fetched") / span, 3).alias("urls_per_sec"),
            F.round(F.col("bytes_fetched") / span, 3).alias("bytes_per_sec"),
        )
    )
