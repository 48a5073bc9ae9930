"""SparkSession factory tuned for the crawl engine.

Local-mode testing uses ``local[N]``; the same configs are what we
would submit on a real cluster via ``spark-submit --py-files`` (see
ARCHITECTURE.md §Deploy).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

# At 100 TB / 1000 executors these would be set per-cluster; the local
# values mirror the ratios (shuffle partitions ~ total cores, AQE on so
# skewed host-partitions get split at runtime).
_DEFAULTS = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # python-UDF stages are per-row heavy, not per-byte: without this,
    # AQE coalesces a 1M-row links shuffle (~100MB) down to 2-4
    # partitions and serializes the pandas-UDF work on them
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.ui.enabled": "false",
    # shuffle/spill on tmpfs when available: on this single-disk box the
    # shuffle writes otherwise serialize the whole pipeline behind one
    # spindle (a cluster has one disk array per executor)
    "spark.local.dir": (
        "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp"
    ),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
}


def get_spark(
    app_name: str = "starbelly_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with crawl-engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, else 32).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.master(master).appName(app_name)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    _warm_session(spark)
    return spark


def _warm_session(spark: SparkSession) -> None:
    """Run two throwaway ~100ms jobs once per session: a codegen'd
    aggregate over an exchange, and a pandas-UDF action sized to the
    default parallelism so every reusable Python worker is forked and
    the Arrow serialization path is JIT'd.  In local mode all of that
    executor machinery is lazily initialized by the FIRST job — without
    this, whichever query a caller happens to run first silently pays
    ~2-3 s of one-time JVM/Python startup inside its own wall time.
    No data is read and nothing is cached; set
    ``SPARK_GRAFT_NO_WARMUP=1`` to skip (micro-tests)."""
    if getattr(spark, "_starbelly_warmed", False) or os.environ.get(
        "SPARK_GRAFT_NO_WARMUP"
    ):
        return
    spark._starbelly_warmed = True
    from pyspark.sql import functions as F

    n = max(2, spark.sparkContext.defaultParallelism)
    rng = spark.range(0, n * 100, 1, n)
    rng.groupBy((F.col("id") % n).alias("k")).count().count()

    _wu = F.pandas_udf(lambda s: s, "long")
    # sum (not count) so the optimizer cannot prune the UDF column
    rng.select(_wu("id").alias("v")).agg(F.sum("v")).collect()


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executors (the --py-files path).

    Pandas-UDF closures pickle by reference to ``starbelly_spark.*``,
    so workers must be able to import the package regardless of where
    the driver script lives.  On a real cluster this is
    ``spark-submit --py-files starbelly_spark.zip``; locally we build
    the same zip once and ``addPyFile`` it.
    """
    if getattr(spark, "_starbelly_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(), "starbelly_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    spark._starbelly_shipped = True
