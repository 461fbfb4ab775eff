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
        # this. Starting high is not free either: at sf0.1 a 256 floor
        # costs ~14% on the registry bench in per-stage scheduling /
        # shuffle-block overhead. So the floor is deployment-sized, like
        # shuffle.partitions on a real cluster: default 4x cores, and the
        # scale tools (gen_scale, probe_worst_alpha, sf>=10 corpora) set
        # SPARK_GRAFT_AQE_INIT_PARTS higher for spill-proof big shuffles.
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                os.environ.get("SPARK_GRAFT_AQE_INIT_PARTS",
                               str(max(128, 4 * cpus))))
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
