"""SparkSession builder tuned for the engine.

Local-mode defaults follow the container (local[32], single JVM); on a real
cluster the same config block applies minus master/driver-memory, with AQE
doing runtime re-planning at the 100 TB scale target.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl_consumer_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    Defaults chosen for correctness-vs-oracle and scale:
    - UTC session timezone (oracle comparisons; cluster-invariant semantics)
    - AQE on (coalesce partitions, skew-join) — the runtime optimizer that
      replaces hand-tuning at 100 TB
    - Arrow on (pandas_udf fast path for the one non-expression decoder)
    - shuffle partitions sized to cores locally; on a cluster, AQE's
      coalescePartitions makes the initial number non-critical.
    """
    master = master or os.environ.get("SPARK_MASTER", f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    shuffle_partitions = shuffle_partitions or int(os.environ.get("SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
