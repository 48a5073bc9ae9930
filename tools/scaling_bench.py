"""Scaling-efficiency evidence (BASELINE.json north rule).

No real cluster exists in this sandbox, so the N-vs-4N-executor
criterion is evidenced by running the SAME job at two local
parallelism levels (local[2] vs local[8]) and reporting throughput at
both plus efficiency:

  speedup   = tput_hi / tput_lo
  efficiency = speedup / 4          (ideal 4× cores → 1.0)

Round-3 protocol (the r2 verdict's variance fix): the claim is the
MEDIAN efficiency over ``SCALE_PAIRS`` (default 5) interleaved
lo/hi pairs — each pair runs both levels back-to-back in fresh
subprocesses, alternating which level goes first so slow box drift
cancels instead of biasing one level — with the full per-pair run
table and the min/max spread disclosed.  Per-run wall time is
amortized with more measured batches (SCALE_BATCHES default 5, up
from 3).  Results stream to ``BENCH/scaling_runs.jsonl`` and the
report is rewritten after every pair, so a killed run still leaves
complete evidence for the pairs that finished.

Each level runs in a fresh subprocess (a JVM's master is fixed at
startup), hard-pinned to exactly N cores with taskset.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = textwrap.dedent(
    """
    import json, sys, tempfile, time
    sys.path.insert(0, {repo!r})
    from starbelly_spark.session import get_spark
    from bench import crawl_bench

    cpus = sys.argv[1]
    spark = get_spark("scale", master=f"local[{{cpus}}]",
                      extra_conf={{"spark.sql.shuffle.partitions": cpus}})
    # warmup: trigger codegen/python-worker startup
    spark.range(1000).selectExpr("sum(id)").collect()
    out = crawl_bench(spark, n_hosts={n_hosts}, total_pages={pages},
                      budget={budget}, per_host_k={k},
                      ramp_batches={ramp}, measure_batches={batches},
                      skew_share=0.1)
    print("SCALERESULT " + json.dumps(out))
    """
)


def run_level(cpus: int, n_hosts: int, pages: int, budget: int, k: int,
              ramp: int, batches: int) -> dict:
    """One level in a fresh subprocess, hard-pinned to exactly `cpus`
    physical cores via taskset — otherwise the JVM's GC/IO threads give
    the small-N level free extra cores and understate scaling."""
    # clean any leaked tmpfs state (a SIGKILLed child skips its
    # finally) — stale /dev/shm dirs measurably depress later runs.
    # hygiene_check only deletes when no competing bench is alive, so
    # this can never yank state from under a concurrent run.
    from bench import hygiene_check

    hygiene_check(warn_load=False)
    code = CHILD.format(repo=REPO, n_hosts=n_hosts, pages=pages,
                        budget=budget, k=k, ramp=ramp, batches=batches)
    env = dict(os.environ,
               OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1",
               MKL_NUM_THREADS="1")
    proc = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}",
         sys.executable, "-c", code, str(cpus)],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("SCALERESULT "):
            return json.loads(line[len("SCALERESULT "):])
    raise RuntimeError(
        f"local[{cpus}] run produced no result:\n{proc.stdout[-2000:]}"
        f"\n{proc.stderr[-2000:]}"
    )


def write_report(cfg: dict, pairs: list[dict], out_md: str) -> dict:
    lo, hi = cfg["lo"], cfg["hi"]
    effs = [p["efficiency"] for p in pairs]
    med = statistics.median(effs)
    summary = {
        "pairs": len(pairs),
        "median_efficiency": round(med, 3),
        "min_efficiency": round(min(effs), 3),
        "max_efficiency": round(max(effs), 3),
        "median_tput_lo": round(statistics.median(
            p["lo"]["urls_per_sec"] for p in pairs), 1),
        "median_tput_hi": round(statistics.median(
            p["hi"]["urls_per_sec"] for p in pairs), 1),
    }
    rows = "\n".join(
        f"| {p['pair']} | {p['order']} | {p['lo']['urls_per_sec']} "
        f"| {p['hi']['urls_per_sec']} | {p['speedup']:.2f}× "
        f"| {p['efficiency']:.2f} |"
        for p in pairs
    )
    with open(out_md, "w") as f:
        f.write(f"""# BENCH/BASELINE — crawl throughput + scaling evidence

Same job (synthetic web: {cfg['n_hosts']} hosts / {cfg['pages']} pages,
budget {cfg['budget']}, per_host_k {cfg['k']}, {cfg['ramp']} ramp +
{cfg['batches']} measured micro-batches) at two parallelism levels —
the sandbox stand-in for N vs 4N executors (task brief).

## Median-of-{len(pairs)} interleaved pairs (r3 protocol)

Each pair runs local[{lo}] (N) and local[{hi}] (4N) back-to-back in
fresh taskset-pinned subprocesses; the order alternates per pair
(lo-first / hi-first) so box drift cancels.  The claim is the MEDIAN.

| pair | order | local[{lo}] urls/s | local[{hi}] urls/s | speedup | efficiency |
|---|---|---|---|---|---|
{rows}

- **median scaling efficiency: {med:.2f}** (target ≥ 0.8 per
  BASELINE.json); spread [{min(effs):.2f}, {max(effs):.2f}] over
  {len(pairs)} identical-plan pairs.
- median throughput: local[{lo}] {summary['median_tput_lo']} urls/s →
  local[{hi}] {summary['median_tput_hi']} urls/s.
- Both levels are hard-pinned to exactly N cores with taskset
  (GC/IO/python workers included), so the ratio isolates the engine's
  parallel fraction.  N=local[{lo}] vs 4N=local[{hi}] is the
  unsaturated pair on this shared-memory box; a real cluster adds a
  memory bus per executor, so per-executor contention does not
  accumulate the way extra threads on one box do.

Raw per-pair JSON: BENCH/scaling_runs.jsonl
""")
    return summary


def main() -> None:
    # snapshot hygiene (r3 verdict #1): never start on a box that is
    # already benching, and never run past the deadline into a round
    # snapshot — a leftover instance is exactly what crashed BENCH_r03
    import time as _time

    from bench import hygiene_check

    hygiene_check()
    deadline = _time.monotonic() + float(
        os.environ.get("SCALE_MAX_SEC", "5400")
    )
    cfg = {
        "n_hosts": int(os.environ.get("SCALE_HOSTS", "2048")),
        "pages": int(os.environ.get("SCALE_PAGES", "20000000")),
        "budget": int(os.environ.get("SCALE_BUDGET", "300000")),
        "k": int(os.environ.get("SCALE_K", "1024")),
        "ramp": int(os.environ.get("SCALE_RAMP", "4")),
        "batches": int(os.environ.get("SCALE_BATCHES", "5")),
        "lo": int(os.environ.get("SCALE_LO", "2")),
        "hi": int(os.environ.get("SCALE_HI", "8")),
    }
    n_pairs = int(os.environ.get("SCALE_PAIRS", "5"))
    assert cfg["hi"] == 4 * cfg["lo"], "the criterion is N vs 4N"

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_md = os.path.join(REPO, "BENCH", "BASELINE.md")
    jsonl = os.path.join(REPO, "BENCH", "scaling_runs.jsonl")
    open(jsonl, "w").close()

    pairs: list[dict] = []
    for i in range(n_pairs):
        if _time.monotonic() > deadline:
            print(f"SCALE_MAX_SEC deadline hit after {len(pairs)} pairs — "
                  "stopping (snapshot hygiene)", flush=True)
            break
        order = ["lo-first", "hi-first"][i % 2]
        levels = (cfg["lo"], cfg["hi"]) if order == "lo-first" else \
                 (cfg["hi"], cfg["lo"])
        results = {}
        for cpus in levels:
            results[cpus] = run_level(
                cpus, cfg["n_hosts"], cfg["pages"], cfg["budget"],
                cfg["k"], cfg["ramp"], cfg["batches"],
            )
        r_lo, r_hi = results[cfg["lo"]], results[cfg["hi"]]
        speedup = r_hi["urls_per_sec"] / r_lo["urls_per_sec"]
        pair = {
            "pair": i + 1, "order": order, "lo": r_lo, "hi": r_hi,
            "speedup": round(speedup, 3),
            "efficiency": round(speedup / 4.0, 3),
        }
        pairs.append(pair)
        with open(jsonl, "a") as f:
            f.write(json.dumps(pair) + "\n")
        summary = write_report(cfg, pairs, out_md)
        print(f"PAIR {i + 1}/{n_pairs} ({order}): "
              f"eff={pair['efficiency']:.2f} "
              f"median-so-far={summary['median_efficiency']:.2f}",
              flush=True)

    print(json.dumps(summary))


if __name__ == "__main__":
    main()
