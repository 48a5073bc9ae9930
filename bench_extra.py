"""Extra (non-frozen) benchmarks: noop-sink stage isolation and
repeated per-query timing (optimization guide §1.4 / §1.5).

`bench.py` is FROZEN for measurement, so every probe used to justify a
round-6 change lives here instead.  Numbers from this file are cited
in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py queries  [sf_dir] [n_repeats] [name ...]
  python bench_extra.py minhash  [sf_dir] [n_repeats]
  python bench_extra.py simhash  [sf_dir] [n_repeats]
  python bench_extra.py crawl_profile
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _load(sf_dir: str) -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def probe_queries(spark, sf_dir: str, n: int, names: list[str]) -> None:
    import __spark_entry__ as entrymod
    import bench

    qs = entrymod.queries()
    names = names or bench.BENCH_QUERIES
    out: dict[str, list[float]] = {}
    for name in names:
        fn = bench.RAW_OVERRIDES.get(name, qs[name])
        times = []
        for _ in range(n):
            spark.sparkContext.setJobDescription(f"bench_extra {name}")
            times.append(_noop(fn(spark, sf_dir)))
        out[name] = times
        print(json.dumps({"query": name, "sec": times}), flush=True)
    print(json.dumps({"probe": "queries", "sf_dir": sf_dir,
                      "load_1m": _load(sf_dir), "results": out}))


def probe_minhash(spark, sf_dir: str, n: int) -> None:
    """Stage-isolated minhash pipeline: signatures → LSH candidates →
    full op (each through a noop sink, repeated n times)."""
    from pyspark.sql import functions as F

    from starbelly_spark.operators.dedup import (
        make_minhash_udf,
        minhash_lsh_candidates,
        minhash_near_dups,
    )
    from starbelly_spark.spread import spread

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    res: dict[str, list[float]] = {"signatures": [], "candidates": [],
                                   "full": []}
    for _ in range(n):
        mh = make_minhash_udf(64, 3, 42)
        sigs = (
            spread(docs.select("doc_id", "text"))
            .withColumn("minhash", mh(F.col("text")))
            .drop("text")
        )
        spark.sparkContext.setJobDescription("probe minhash signatures")
        res["signatures"].append(_noop(sigs))
        sigs_p = sigs.persist()
        cands = minhash_lsh_candidates(sigs_p, "doc_id", "minhash", 16, 4)
        spark.sparkContext.setJobDescription("probe minhash candidates")
        res["candidates"].append(_noop(cands))
        sigs_p.unpersist()
        spark.sparkContext.setJobDescription("probe minhash full")
        res["full"].append(_noop(minhash_near_dups(docs, threshold=0.5)))
    print(json.dumps({"probe": "minhash", "sf_dir": sf_dir,
                      "load_1m": _load(sf_dir), "results": res}))


def probe_simhash(spark, sf_dir: str, n: int) -> None:
    from starbelly_spark.operators.dedup import simhash_near_dups

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    res: dict[str, list[float]] = {"full": []}
    for _ in range(n):
        spark.sparkContext.setJobDescription("probe simhash full")
        res["full"].append(
            _noop(simhash_near_dups(docs, max_hamming=6, shingle_n=2)))
    print(json.dumps({"probe": "simhash", "sf_dir": sf_dir,
                      "load_1m": _load(sf_dir), "results": res}))


def probe_crawl_profile(spark) -> None:
    """Run the frozen bench's crawl at bench settings with per-stage
    profile marks printed live (SPARK_GRAFT_PROFILE=1)."""
    import bench

    os.environ["SPARK_GRAFT_PROFILE"] = "1"
    crawl = bench.crawl_bench(spark)
    print(json.dumps({"probe": "crawl_profile", "crawl": crawl}))


def main() -> None:
    from starbelly_spark.session import get_spark

    probe = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("bench_extra")
    if probe == "queries":
        probe_queries(spark, sf_dir, n, sys.argv[4:])
    elif probe == "minhash":
        probe_minhash(spark, sf_dir, n)
    elif probe == "simhash":
        probe_simhash(spark, sf_dir, n)
    elif probe == "crawl_profile":
        probe_crawl_profile(spark)
    else:
        raise SystemExit(f"unknown probe {probe}")


if __name__ == "__main__":
    main()
