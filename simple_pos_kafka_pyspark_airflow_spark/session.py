"""SparkSession factory.

The reference creates its session ad hoc at module import time against a
standalone cluster (reference ``airflow/dags/POS_spark_dag.py:10-16``) with
no tuning at all — default 200 shuffle partitions on a 1-CPU worker. Here
the session is an explicit factory with the settings a 1000-executor /
100 TB deployment needs turned on from the start:

- **AQE** (adaptive query execution): runtime shuffle-partition coalescing,
  skew-join splitting, and dynamic join-strategy demotion. At 100 TB this is
  what keeps a 3-way fact join from dying on one hot key.
- **Arrow** for every Python<->JVM columnar transfer (Pandas UDFs,
  ``toPandas``) — the slow path stays vectorized.
- **shuffle.partitions** sized from the environment rather than the 200
  default; AQE coalesces down from there.

Local test mode (``local[N]``) is one JVM; the same config is what we would
submit to a real cluster, where ``spark.driver.memory`` would be replaced by
executor sizing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_session(
    app_name: str = "spark_graft",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or return) the engine's SparkSession.

    Deterministic-by-construction settings (UTC session timezone, explicit
    shuffle partition count) so contract queries hash identically across
    runs — the reference's correctness story depended on single-threaded
    consumers; ours depends on these configs plus deterministic plans.
    """
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{n}]"))
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # push filterless MIN/MAX/COUNT to parquet footer statistics: a
        # bare stats query answers from metadata instead of scanning rows
        # (off by default in Spark; correctness is the parquet stats
        # contract, and any filter/nested column disables it per-query)
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # let Python DataSources (sources/pydatasource.py) receive
        # pushFilters() for planning-time file pruning; Spark still
        # re-applies every filter row-level, so this is plan-shape only
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # 128 MB split targets: at 100 TB that is ~800k input tasks, the
        # right granularity for dynamic allocation; locally it just works.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
