"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we'd set on a real cluster where it
transfers (AQE, UTC session time, Arrow); partition counts are sized by
``SPARK_GRAFT_CPUS`` so the same code scales from local[2] tests to a
1000-executor cluster (where ``spark.sql.shuffle.partitions`` would be
set to ~2-3x total cores, or left to AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "e_commerce_etl_pipeline_spark",
              cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE starts every shuffle at initialPartitionNum and coalesces
        # DOWN to fit advisoryPartitionSizeInBytes — it never splits UP.
        # With the start pinned to cpus (=32), a billion-row shuffle gets
        # ~30M rows/partition and spills: the sf100 probe measured
        # duplicate_chunk_spans going >100x past its sf10 time on exactly
        # this. Start high and let AQE shrink small shuffles back down;
        # tiny-SF plans are unchanged post-coalesce.
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                str(max(256, 8 * cpus)))
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # parquet scans: vectorized reader + pushdown are on by default;
        # keep split size default (128m) so 100 TB -> ~800k tasks, fine.
        .config("spark.sql.parquet.filterPushdown", "true")
        # driver testdata writes TIMESTAMP(NANOS) parquet, which Spark's
        # reader rejects; read as long and convert (see plans.queries.load_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
