"""SparkSession factory with scale-oriented defaults.

All engine entry points accept an externally built session; this module
only centralizes the config we want everywhere: Arrow-backed pandas
UDFs, AQE (runtime coalescing + skew-join splitting), and a shuffle
partition count sized to the parallelism level instead of the 200
default (which at local[8..32] just creates tiny-task overhead, and on
a 1000-executor cluster is overridden by AQE coalescing anyway).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kgforge",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with kgforge defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox;
    on a real cluster pass None and let spark-submit own it.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[len("local[") : -1]
            shuffle_partitions = 32 if inner == "*" else max(int(inner), 4)
        else:
            shuffle_partitions = 200

    # Python workers (pandas UDF stages) don't inherit the driver's
    # sys.path — ship the package root via PYTHONPATH so launching from
    # any cwd works. On a real cluster, spark-submit --py-files
    # kgforge.zip provides the same (kgforge/tools/package.py builds it).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker_pythonpath = os.pathsep.join(
        p for p in [repo_root, os.environ.get("PYTHONPATH", "")] if p
    )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # deterministic float behavior for oracle comparisons
        .config("spark.sql.legacy.allowNegativeScaleOfDecimal", "true")
        .config("spark.executorEnv.PYTHONPATH", worker_pythonpath)
        .config("spark.driver.memory", os.environ.get("KGFORGE_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", os.environ.get("KGFORGE_UI", "false"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


def local_df(spark, rows, schema):
    """Driver-small local relation as a TRUE LocalRelation.

    `createDataFrame(list, schema)` goes through RDD parallelize and
    materializes `spark.default.parallelism` (32) near-empty slices
    that multiply through downstream unions into hundreds of no-op
    tasks; the pandas path (Arrow) plans as a LocalRelation /
    LocalTableScan — no job, no empty partitions. Use for
    schema-sized data only (the rows live on the driver)."""
    import pandas as pd

    if isinstance(schema, str):
        # "name type, name type" DDL — first token of each field; a
        # comma inside a composite type (map<string,int>) is out of
        # scope for driver-small relations
        cols = [f.strip().split(" ")[0] for f in schema.split(",")]
    else:  # StructType
        cols = schema.fieldNames()
    return spark.createDataFrame(
        pd.DataFrame(rows or None, columns=cols), schema
    )
