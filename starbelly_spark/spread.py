"""Scale-adaptive repartition for per-row-expensive stages.

Single-file tables (and single-row-group parquet files in general)
produce scans Spark cannot split: ``maxPartitionBytes`` splits are
assigned whole row groups, so a one-row-group file is always ONE task
no matter the config.  Any Python-UDF or regex-heavy stage fused into
that scan then runs serial while the rest of the cluster idles
(optimization guide §2.5 input skew / §4 Python boundary).

``spread`` round-robin-repartitions such an input up to the session's
default parallelism *only when the scan is narrower than that* — on a
production table with hundreds of well-sized files it is a no-op, so
the extra exchange is only ever paid where it buys parallelism.  The
shuffled bytes are the projected columns only (callers select before
spreading), and round-robin repartition is deterministic under task
retry (Spark sorts before round-robin since SPARK-23207).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the default parallelism iff it currently
    has fewer partitions; identity otherwise (cluster-safe)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df
