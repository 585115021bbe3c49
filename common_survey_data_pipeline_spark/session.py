"""SparkSession factory with engine-tuned defaults.

Defaults are chosen for the scale story (SURVEY.md §4): AQE on (runtime
partition coalescing + skew-join splitting), Arrow for any pandas
interchange, and a shuffle-partition count that matches local test cores
but is overridable for cluster runs via normal Spark submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_CONF: dict[str, str] = {
    # Adaptive query execution: coalesce small shuffle partitions, split
    # skewed ones, and convert sort-merge joins to broadcast at runtime.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow-batched transfer for pandas UDFs / toPandas (extension ops).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Dimension tables in the star schema are tiny; be generous with
    # broadcast so fact-side joins never shuffle the big side.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Keep parquet scans well-sized at large SF (default 128m is fine but
    # make it explicit — this is the knob to retune at 100 TB).
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    # Loud-overflow guard for the integer-cents money path (q1/q3):
    # per-row products are bounded by ~1e11, so int64 sums can wrap past
    # ~9e7 rows per group at extreme scale. ANSI mode (Spark 4.x default,
    # pinned here so a cluster-side conf can't silently disable it) turns
    # that wrap into ARITHMETIC_OVERFLOW — a failed job, never a silently
    # wrong total. tests/test_overflow_canary.py proves the behavior.
    "spark.sql.ansi.enabled": "true",
}


def get_spark(
    app_name: str = "common-survey-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back to
    ``local[*]``) so local tests exercise real parallelism; on a cluster,
    pass ``master=None`` with a pre-configured environment and the
    submit-time master wins.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus and cpus.isdigit() else 32

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULT_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
