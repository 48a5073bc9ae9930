"""spark-submit entry point for the crawl engine (north rule: "run via
spark-submit --py-files on a multi-executor cluster").

Usage (local example; on a cluster swap --master and add executors):

    python tools/make_pyfiles.py /tmp/starbelly_spark.zip
    spark-submit --master local[8] \
        --py-files /tmp/starbelly_spark.zip \
        tools/submit_crawl.py \
        --root /tmp/crawljob --job-id demo \
        --seeds http://h0.example/p0 http://h1.example/p0 \
        --hosts 8 --pages 200 --budget 32 --max-batches 20

The script only imports ``starbelly_spark`` from the shipped zip (or
the repo when run directly), builds the session from the ACTIVE
SparkSession that spark-submit provides, runs the micro-batch loop to
completion/limit, and prints the final job stats as one JSON line.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--job-id", default="job")
    p.add_argument("--seeds", nargs="+", required=True)
    p.add_argument("--hosts", type=int, default=8)
    p.add_argument("--pages", type=int, default=200)
    p.add_argument("--branching", type=int, default=3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--budget", type=int, default=64)
    p.add_argument("--per-host-k", type=int, default=4)
    p.add_argument("--global-delay", type=float, default=1.0)
    p.add_argument("--max-cost", type=float, default=6.0)
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--resume", action="store_true",
                   help="resume an existing job instead of starting")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    # under spark-submit the session/master come from the submit args;
    # getOrCreate attaches to it (falls back to a local session when
    # run as a plain python script)
    spark = SparkSession.builder.appName("starbelly-crawl").getOrCreate()

    from starbelly_spark.crawl import (
        CrawlSettings,
        job_stats,
        run_crawl,
        start_job,
    )
    from starbelly_spark.policy import Limits, Policy, UrlRule
    from starbelly_spark.sources.synthetic_web import WebConfig

    if not args.resume:
        web = WebConfig(n_hosts=args.hosts, total_pages=args.pages,
                        branching=args.branching, seed=args.seed)
        policy = Policy(url_rules=(UrlRule("ADD", 1.0),),
                        limits=Limits(max_cost=args.max_cost))
        settings = CrawlSettings(budget=args.budget,
                                 per_host_k=args.per_host_k,
                                 global_delay=args.global_delay)
        start_job(spark, args.root, args.job_id, args.seeds, policy, web,
                  settings)
    run_crawl(spark, args.root, args.job_id, max_batches=args.max_batches)
    print(json.dumps(job_stats(spark, args.root, args.job_id)))


if __name__ == "__main__":
    main()
