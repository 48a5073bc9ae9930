"""Pop cost pre-filter at its DESIGN ratio (r2 verdict follow-up).

The ratio-gated pre-filter (operators/frontier.py) exists for the
10^10-frontier regime: pop budget ≪ pending frontier.  The committed
crawl bench runs at ratio ~3, where the gate correctly stays dormant —
so this bench builds the high-ratio case the filter is FOR (20M-row
pending frontier, 60k budget → ratio ~333; a 20k budget would leave
the engage gate dormant) and measures, in two fresh subprocesses:

* the popped output hash with the filter ENGAGED vs force-DISABLED
  (must be identical — the filter is provably exact); and
* total shuffle write records + wall time for the pop, from Spark's
  REST status API (real executor metrics, not estimates).

Writes BENCH/PREFILTER.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent(
    """
    import hashlib, json, sys, time, urllib.request
    sys.path.insert(0, {repo!r})
    from pyspark.sql import functions as F
    from starbelly_spark.session import get_spark
    import starbelly_spark.operators.frontier as frontier_mod
    from starbelly_spark.operators.frontier import pop_batch

    mode = sys.argv[1]
    if mode == "disabled":
        frontier_mod.PREFILTER_RATIO = 10 ** 18   # gate never engages

    spark = get_spark("prefilter-" + mode,
                      extra_conf={{"spark.ui.enabled": "true"}})
    N, HOSTS, BUDGET, K = {n}, {hosts}, {budget}, {k}
    # deterministic synthetic pending frontier, generated JVM-side
    fr = (
        spark.range(N)
        .select(
            F.lit("bench").alias("job_id"),
            F.concat(F.lit("http://h"), (F.col("id") % HOSTS).cast("string"),
                     F.lit(".example/p"), F.col("id").cast("string")
                     ).alias("url"),
            F.concat(F.lit("h"), (F.col("id") % HOSTS).cast("string"),
                     F.lit(".example")).alias("host"),
            (F.pmod(F.xxhash64("id"), F.lit(1000)) / 10.0).alias("cost"),
            F.lit(False).alias("in_flight"),
            F.unhex(F.md5(F.col("id").cast("string"))).alias("url_hash"),
            F.md5(F.col("id").cast("string")).alias("url_hash_hex"),
        )
        .persist()
    )
    n = fr.count()                       # materialize before timing
    t0 = time.perf_counter()
    out = pop_batch(fr, BUDGET, K, eligible_hosts=None, with_rank=True)
    rows = out.select("url_hash_hex", frontier_mod.POP_RANK).collect()
    wall = time.perf_counter() - t0
    digest = hashlib.sha256(
        "\\n".join(f"{{r[0]}}|{{r[1]}}" for r in
                   sorted(rows, key=lambda r: r[1])).encode()
    ).hexdigest()[:16]

    # real shuffle metrics from the REST status API
    ui = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{{ui}}/api/v1/applications"))[0]["id"]
    stages = json.load(urllib.request.urlopen(
        f"{{ui}}/api/v1/applications/{{app}}/stages?status=complete"))
    shuffle_write = sum(s.get("shuffleWriteRecords", 0) for s in stages)
    shuffle_read = sum(s.get("shuffleReadRecords", 0) for s in stages)
    print("PREFRESULT " + json.dumps({{
        "mode": mode, "frontier_rows": n, "popped": len(rows),
        "hash": digest, "wall_sec": round(wall, 2),
        "shuffle_write_records": shuffle_write,
        "shuffle_read_records": shuffle_read,
    }}))
    """
)


def run(mode: str, n: int, hosts: int, budget: int, k: int) -> dict:
    code = CHILD.format(repo=REPO, n=n, hosts=hosts, budget=budget, k=k)
    proc = subprocess.run([sys.executable, "-c", code, mode],
                          capture_output=True, text=True, timeout=1800)
    for line in proc.stdout.splitlines():
        if line.startswith("PREFRESULT "):
            return json.loads(line[len("PREFRESULT "):])
    raise RuntimeError(f"{mode} run failed:\n{proc.stdout[-2000:]}"
                       f"\n{proc.stderr[-2000:]}")


def main() -> None:
    n = int(os.environ.get("PREF_N", "20000000"))
    hosts = int(os.environ.get("PREF_HOSTS", "4096"))
    # budget must clear the gate's engage thresholds (frontier.py:
    # target ≥ PREFILTER_MIN_ROWS or budget > 50k) — 60k does; 20k
    # leaves the gate dormant by design and both variants plan alike
    budget = int(os.environ.get("PREF_BUDGET", "60000"))
    k = int(os.environ.get("PREF_K", "64"))

    engaged = run("engaged", n, hosts, budget, k)
    disabled = run("disabled", n, hosts, budget, k)
    assert engaged["hash"] == disabled["hash"], (
        "pre-filter changed the popped set!", engaged, disabled)
    assert engaged["popped"] == disabled["popped"] == budget

    ratio = n / (4.0 * budget)
    red = 1 - engaged["shuffle_write_records"] / max(
        disabled["shuffle_write_records"], 1)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "PREFILTER.md"), "w") as f:
        f.write(f"""# Pop cost pre-filter at design ratio

Synthetic pending frontier: {n:,} rows / {hosts} hosts; pop budget
{budget:,}, per_host_k {k} → frontier/target ratio ≈ {ratio:,.0f}
(the gate engages above {8}; the committed crawl bench sits at ~3
where the straight window is faster and the gate stays dormant).

| variant | popped | output hash | shuffle write records | shuffle read records | pop wall s |
|---|---|---|---|---|---|
| pre-filter ENGAGED | {engaged['popped']:,} | `{engaged['hash']}` | {engaged['shuffle_write_records']:,} | {engaged['shuffle_read_records']:,} | {engaged['wall_sec']} |
| pre-filter DISABLED | {disabled['popped']:,} | `{disabled['hash']}` | {disabled['shuffle_write_records']:,} | {disabled['shuffle_read_records']:,} | {disabled['wall_sec']} |

- output hashes IDENTICAL (the approxQuantile cut is provably exact:
  every dropped row costs strictly more than every kept row, and the
  host-capped survivors filled the budget — operators/frontier.py).
- shuffle write records reduced **{red:.1%}** ({disabled['shuffle_write_records']:,}
  → {engaged['shuffle_write_records']:,}); at a 10^10-row frontier the
  disabled path's shuffle grows with the frontier while the engaged
  path stays O(slack × budget).
- wall: {disabled['wall_sec']}s → {engaged['wall_sec']}s on local[32]
  (metrics from Spark's REST status API, fresh subprocess per variant).
""")
    print(json.dumps({"engaged": engaged, "disabled": disabled,
                      "identical": True, "shuffle_reduction": round(red, 4)}))


if __name__ == "__main__":
    main()
