"""SparkSession factory tuned for the engine.

Arrow transfer is mandatory (every geometry kernel is an Arrow-batched
pandas UDF); AQE handles skew/coalescing at scale.  Parallelism comes
from SPARK_GRAFT_CPUS (the driver benches the same job at local[8] vs
local[32] to evidence scaling efficiency).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "geojson_vt_rs_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    # executor Python workers don't inherit the driver's sys.path — make
    # the package importable regardless of the launch cwd (set BEFORE the
    # JVM starts so local-mode workers inherit it; spark-submit users
    # pass --py-files instead)
    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    prev = os.environ.get("PYTHONPATH", "")
    if repo_root not in prev.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + prev if prev else "")
        )
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # our shuffled rows are byte-light but CPU-heavy (pandas kernels:
        # clip, raster decode/render); the 64MB advisory size would
        # coalesce them onto a handful of cores — keep partitions fine-
        # grained so AQE still merges empties without serializing compute
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k"
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
