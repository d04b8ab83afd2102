"""SparkSession factory with scale-oriented defaults.

The defaults below are chosen for the 100 TB design point and merely
*tested* on local[N]:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic join-strategy demotion are all load-bearing at cluster
  scale and harmless locally.
- Arrow on: every pandas UDF / mapInPandas boundary is Arrow-batched.
- shuffle.partitions is a *default parallelism hint*; AQE coalesces it
  down for small inputs, so one setting serves sf0.001 smoke tests and
  a 1000-executor cluster (where the operator code never hard-codes
  partition counts — it relies on AQE + explicit repartition-by-key
  only where co-location is semantically required).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "quick_and_easy_vectordb_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``)
    when no cluster master is configured; on a real cluster the caller's
    ``--master`` wins because an existing active session is reused as-is.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # embeddings are wide rows (~0.5-6 KB); keep scan splits moderate
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # local mode: the driver JVM hosts all executor threads, so it
        # needs executor-scale heap (32 threads on a 128 GiB box)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        # managed tables (bucketed writes) go to scratch, not the repo.
        # Per-process dir: each process also gets its own derby metastore,
        # so a shared warehouse would let one process's orphan-location
        # cleanup (writers.write_bucketed) delete a table a concurrent
        # process's catalog still references. Pid-keyed dirs make that
        # impossible; /tmp reaping handles the accumulation.
        .config("spark.sql.warehouse.dir", f"/tmp/qev_spark_warehouse_{os.getpid()}")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
