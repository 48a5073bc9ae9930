"""Dump .explain("formatted") for declared queries (and the bench raw
dedup overrides) to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py <tag> <suffix> [sf_dir] [query ...]
e.g.   python tools/dump_plans.py r06 before /root/testdata/sf1.0 \
           tpch_q3_shipping dedup_simhash_raw
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
import bench  # noqa: E402
from starbelly_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf1.0"
    names = sys.argv[4:]
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-plans")
    qs = dict(entrymod.queries())
    qs["dedup_simhash_raw"] = bench.RAW_OVERRIDES["dedup_simhash"]
    qs["dedup_minhash_lsh_raw"] = bench.RAW_OVERRIDES["dedup_minhash_lsh"]
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path)


if __name__ == "__main__":
    main()
