"""Diagnose the lo-leg per-batch cost growth (round-5 scaling attack).

Runs the scaling-bench crawl config at one parallelism level with
Spark event logging on, prints per-batch wall time + profile marks +
state sizes, then parses the event log into per-stage durations so the
growth can be attributed to an exact plan stage (Python eval, sort,
shuffle, scan) instead of a coarse mark.

Usage:  taskset -c 0-1 python tools/diag_lo.py 2 [ramp] [measured]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EVLOG_DIR = "/tmp/sparklogs"


def main() -> None:
    cpus = sys.argv[1] if len(sys.argv) > 1 else "2"
    ramp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    measured = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    import shutil

    shutil.rmtree(EVLOG_DIR, ignore_errors=True)
    os.makedirs(EVLOG_DIR, exist_ok=True)
    os.environ["SPARK_GRAFT_PROFILE"] = "1"

    from starbelly_spark.crawl import CrawlSettings, run_batch, start_job
    from starbelly_spark.policy import Limits, Policy, UrlRule
    from starbelly_spark.session import get_spark
    from starbelly_spark.sources.synthetic_web import WebConfig

    spark = get_spark(
        "diag_lo", master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.shuffle.partitions": cpus,
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVLOG_DIR}",
        },
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    web = WebConfig(n_hosts=2048, total_pages=20_000_000,
                    branching=8, skew_share=0.1, seed=42)
    policy = Policy(url_rules=(UrlRule("ADD", 1.0),),
                    limits=Limits(max_cost=8.0))
    settings = CrawlSettings(budget=300_000, per_host_k=1024,
                             global_delay=0.0, compact_every=6,
                             seen_partitions=32, bloom_bits=1 << 21,
                             cuckoo_buckets=1 << 15)
    bench_tmp = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="crawlbench_diag_", dir=bench_tmp)
    try:
        store = start_job(spark, root, "diag", web.seeds(2048),
                          policy, web, settings)
        m = store.latest_manifest()
        for i in range(ramp + measured):
            t0 = time.perf_counter()
            sc = spark.sparkContext
            sc.setJobGroup(f"batch-{i + 1}", f"batch {i + 1}")
            m = run_batch(store, m)
            dt = time.perf_counter() - t0
            print(
                f"BATCH {i + 1}: {dt:.1f}s frontier={m.get('frontier_size')} "
                f"items={m['counters']['item_count']} seq={m['sequence']}",
                flush=True,
            )
    finally:
        import shutil

        spark.stop()
        shutil.rmtree(root, ignore_errors=True)

    time.sleep(2)
    analyze()


def analyze() -> None:
    """Aggregate per-stage task time from the event log, grouped by
    (job group, stage name head) so growth across batches is visible."""
    paths = glob.glob(os.path.join(EVLOG_DIR, "*"))
    if not paths:
        print("no event log found")
        return
    path = max(paths, key=os.path.getmtime)
    if os.path.isdir(path):  # rolling event-log v2: events_N_*.zstd parts
        parts = sorted(glob.glob(os.path.join(path, "events_*")))
        lines = []
        import subprocess

        for p in parts:
            if p.endswith(".zstd"):
                raw = subprocess.run(["zstd", "-d", "-c", p],
                                     capture_output=True).stdout
            else:
                raw = open(p, "rb").read()
            lines.extend(raw.decode(errors="replace").splitlines())
    else:
        lines = open(path).read().splitlines()
    stage_info: dict[int, dict] = {}        # stage id -> {name, group}
    stage_time: dict[int, float] = {}       # stage id -> task-run-time sum
    stage_wall: dict[int, list] = {}        # stage id -> [min launch, max finish]
    job_group: dict[int, str] = {}
    for line in lines:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                gid = (ev.get("Properties") or {}).get("spark.jobGroup.id", "")
                for s in ev.get("Stage Infos", []):
                    sid = s["Stage ID"]
                    stage_info[sid] = {"name": s["Stage Name"], "group": gid}
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                rt = tm.get("Executor Run Time", 0) / 1000.0
                stage_time[sid] = stage_time.get(sid, 0.0) + rt
                ti = ev.get("Task Info") or {}
                w = stage_wall.setdefault(sid, [float("inf"), 0])
                w[0] = min(w[0], ti.get("Launch Time", float("inf")))
                w[1] = max(w[1], ti.get("Finish Time", 0))

    # roll up: group -> stage-name-head -> (task_sec, wall_sec)
    rollup: dict[str, dict[str, list]] = {}
    for sid, sec in stage_time.items():
        info = stage_info.get(sid, {"name": "?", "group": "?"})
        head = info["name"].split("\n")[0][:70]
        g = info["group"] or "(none)"
        wall = 0.0
        if sid in stage_wall and stage_wall[sid][1]:
            wall = (stage_wall[sid][1] - stage_wall[sid][0]) / 1000.0
        ent = rollup.setdefault(g, {}).setdefault(head, [0.0, 0.0, 0])
        ent[0] += sec
        ent[1] += wall
        ent[2] += 1
    for g in sorted(rollup):
        print(f"\n== job group {g}")
        for head, (sec, wall, n) in sorted(
            rollup[g].items(), key=lambda kv: -kv[1][0]
        ):
            if sec < 0.5:
                continue
            print(f"  {sec:8.1f}s task  {wall:7.1f}s wall  x{n:<3d} {head}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "analyze":
        analyze()
    else:
        main()
