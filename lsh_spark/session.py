"""SparkSession factory.

Local-mode friendly but configured the way a 1000-executor cluster run
would be: AQE on (runtime re-planning + skew-join mitigation), Arrow on
(all our heavy kernels are mapInArrow/pandas-UDF), shuffle partitions
sized to parallelism instead of the 200 default, UTC timezone pinned so
results compare bit-for-bit against the DuckDB oracle.

The reference has no session concept — it is a single-process NumPy script
(reference ``main.py:185-237``); its one parallelism knob is a
multiprocessing.Pool (reference ``json_manipulator.py:168-173``), which maps
here to executor parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lsh_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or 32 (the sandbox stand-in for a
    multi-executor cluster; scaling is evidenced by running the same job at
    local[N] and local[4N], per BASELINE.md).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("LSH_SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.warehouse.dir",
                os.environ.get("LSH_SPARK_WAREHOUSE", "/tmp/lsh_spark_warehouse"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
