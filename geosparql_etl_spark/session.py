"""SparkSession factory.

Defaults are tuned for the test environment (local[32], single JVM,
128 GiB) but every knob scales to a real cluster: AQE handles runtime
re-planning (partition coalescing, skew joins), shuffle partitions
default to cores locally and should be ~2-3x total cores on a cluster,
and the session timezone is pinned to UTC so timestamp semantics match
the oracle (DuckDB naive-UTC) and are deterministic across machines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # AQE: runtime partition coalescing, skew-join splitting, plan re-opt.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Deterministic timestamps; DuckDB oracle timestamps are naive UTC.
    "spark.sql.session.timeZone": "UTC",
    # Arrow for pandas_udf / mapInPandas / toPandas round trips.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Broadcast joins for dims up to 64 MB (nation/region/snomed-style
    # lookups are tiny; raise the ceiling so Catalyst broadcasts them).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "geosparql_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    when no cluster master is configured; on a real cluster, leave it None
    and submit with ``--master``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        # Local: one shuffle partition per core keeps every stage fully
        # parallel without tiny-partition overhead. On a cluster this
        # should be set to ~2-3x total executor cores (or left to AQE
        # with a high initial value).
        shuffle_partitions = int(cpus) if cpus else (os.cpu_count() or 8)

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    # Spark's 1g driver-heap default is sized for a thin cluster driver,
    # not for local mode where all executor threads share the driver JVM
    # — measured OOM (GCLocker retry storms) on a 200k-doc dedup at the
    # default. Only effective for a fresh JVM (local mode = this
    # process); on a cluster, size executors via submit flags instead.
    conf["spark.driver.memory"] = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
