"""Pipeline drivers — the reference's three Airflow entry points
(SURVEY.md §3) as plain functions over the engine substrate.

- ``full_load_pipeline``: extract-all -> transform -> overwrite staging
  (full_load_etl_dag.py; the Shopee-first ordering and Parquet/XCom
  handoffs were orchestration artifacts — here each source is one lazy
  Spark plan ending in a parquet overwrite).
- ``incremental_pipeline``: windowed extract -> transform -> guarded
  keyed upsert (incremental_etl_dag.py's 15-minute path, ST1-ST3).
  The bridge/backfill DAG (ST4) is the same call with a wider window.
- ``RunAudit``: etl_control.batch_runs parity (ST5) — one row per run,
  appended to a small parquet audit table.
"""

from __future__ import annotations

import time
import uuid
from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.upsert import stamp_etl_metadata, upsert, write_table

AUDIT_SCHEMA = T.StructType([
    T.StructField("batch_id", T.StringType()),
    T.StructField("source_name", T.StringType()),
    T.StructField("status", T.StringType()),  # RUNNING/SUCCESS/FAILED
    T.StructField("records_extracted", T.LongType()),
    T.StructField("records_loaded", T.LongType()),
    T.StructField("started_at", T.DoubleType()),
    T.StructField("finished_at", T.DoubleType()),
    T.StructField("error", T.StringType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("over_budget", T.BooleanType()),
    # no-silent-caps evidence: rows an operator's cost fence dropped
    # during this run (near-dup LSH bucket fence, basket pair fence);
    # NULL for runs with no fenced operator
    T.StructField("fence_dropped_rows", T.LongType()),
    # which algorithm variant produced the run (near-dup: "clusters" vs
    # "fenced_pairs") and its measured recall-gate figure — NULL for
    # runs without a gated operator
    T.StructField("method", T.StringType()),
    T.StructField("recall", T.DoubleType()),
])


@dataclass
class RunAudit:
    """etl_control.batch_runs parity (ST5) plus the reference's
    operational policy analog (config/production.py:24,38,40 — 12-minute
    execution budget, >20% error-rate alert): every recorded run is
    stamped with its duration and an over-budget mark, and ``alerts()``
    surfaces the sources breaching either threshold so an orchestrator
    can page exactly like the reference's Airflow SLA/alert hooks."""

    spark: SparkSession
    path: str
    budget_s: float = 720.0          # reference: 12-min execution timeout
    alert_failure_rate: float = 0.2  # reference: >20% error-rate alert

    def record(self, row: dict) -> None:
        base = {f.name: None for f in AUDIT_SCHEMA.fields}
        base.update(row)
        if base["started_at"] is not None and base["finished_at"] is not None:
            base["duration_s"] = float(base["finished_at"] - base["started_at"])
            base["over_budget"] = base["duration_s"] > self.budget_s
        df = self.spark.createDataFrame([tuple(base[f.name] for f in AUDIT_SCHEMA.fields)],
                                        AUDIT_SCHEMA)
        df.write.mode("append").parquet(self.path)

    def runs(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def alerts(self) -> DataFrame:
        """Per-source health: failure rate vs the alert threshold and
        budget breaches. ``alert = true`` rows are the page-worthy ones."""
        agg = self.runs().groupBy("source_name").agg(
            F.count(F.lit(1)).alias("n_runs"),
            F.sum(F.when(F.col("status") == "FAILED", 1).otherwise(0)).alias("n_failed"),
            F.sum(F.when(F.col("over_budget"), 1).otherwise(0)).alias("n_over_budget"),
            F.max("duration_s").alias("max_duration_s"),
        )
        rate = F.col("n_failed") / F.col("n_runs")
        return agg.select(
            "*",
            rate.alias("failure_rate"),
            ((rate > self.alert_failure_rate) | (F.col("n_over_budget") > 0)
             ).alias("alert"),
        )


@dataclass
class SourcePipeline:
    """One platform's (extract, transform, load) wiring."""

    name: str
    extract: Callable[..., DataFrame]       # (spark, window=None) -> raw df
    transform: Callable[[DataFrame], DataFrame | dict[str, DataFrame]]
    keys: Sequence[str]
    order_col: str
    guard_cols: Sequence[str] = ()
    vn_naive_stamp: bool = False            # MISA/Shopee stamp +07 (T12)
    drop_null_key_rows: bool = False        # MISA D5 parity (null keys dropped at load)


def _tables_of(transformed) -> dict[str, DataFrame]:
    return transformed if isinstance(transformed, dict) else {"": transformed}


def full_load_pipeline(
    spark: SparkSession,
    pipeline: SourcePipeline,
    staging_root: str,
    audit: RunAudit | None = None,
) -> dict[str, int]:
    """Truncate+insert semantics (K2): overwrite each staging table."""
    batch_id = str(uuid.uuid4())
    t0 = time.time()
    counts: dict[str, int] = {}
    try:
        raw = pipeline.extract(spark)
        for suffix, df in _tables_of(pipeline.transform(raw)).items():
            table = suffix or pipeline.name
            keys = [k for k in pipeline.keys if k in df.columns]
            out = stamp_etl_metadata(df, pipeline.name, batch_id,
                                     pipeline.vn_naive_stamp)
            # child tables without the change-order column fall back to the
            # batch stamp (reference: only parent tables carry a guard,
            # shopee_orders_loader.py:672-695 — children replace-on-match)
            order_col = pipeline.order_col if pipeline.order_col in out.columns else "etl_updated_at"
            write_table(spark, out, f"{staging_root}/{table}", keys, order_col,
                        drop_null_key_rows=pipeline.drop_null_key_rows)
            try:
                counts[table] = spark.read.parquet(f"{staging_root}/{table}").count()
            except Exception:
                # an all-empty table writes no parquet files (no partitions),
                # so the read-back cannot infer a schema — that IS zero rows
                counts[table] = 0
        if audit:
            audit.record({
                "batch_id": batch_id, "source_name": pipeline.name,
                "status": "SUCCESS", "records_loaded": sum(counts.values()),
                "started_at": t0, "finished_at": time.time(),
            })
        return counts
    except Exception as e:
        if audit:
            audit.record({
                "batch_id": batch_id, "source_name": pipeline.name,
                "status": "FAILED", "started_at": t0,
                "finished_at": time.time(), "error": str(e)[:500],
            })
        raise


def near_dup_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    audit: RunAudit | None = None,
    max_bucket_vecs: int | None = None,
    method: str = "clusters",
    eval_recall: bool = True,
) -> dict[str, int | float | None]:
    """Near-duplicate detection as a production run.

    ``method="clusters"`` (the DEFAULT since r9 — VERDICT r8 #5): sink
    the chain-link CLUSTER assignment (extensions.similarity.
    near_dup_clusters — no fence, no drops; recall collapses to ~0.16
    for the fenced path on clone-heavy corpora while the cluster path
    holds 0.97-1.0), measure the recall gate on the cluster path only
    (near_dup_recall_eval with methods=("hybrid_clusters",) — the
    bounded hash-ranked sample), and record method + recall in the
    audit row.

    ``method="fenced_pairs"`` keeps the fenced PAIR enumeration as a
    DIAGNOSTIC run: audit carries the fence's observed drop count — the
    no-silent-caps evidence rides the query's own plan (an Observation;
    zero extra jobs) into ``fence_dropped_rows``, so an operator reading
    batch_runs sees exactly how much recall the MAX_LSH_BUCKET_VECS cost
    fence traded on this corpus snapshot (r8, VERDICT r6 #7/r7 #4).

    ``eval_recall=False`` skips the gate job (e.g. replays where the
    corpus snapshot's recall is already on record)."""
    from ..extensions.similarity import (
        MAX_LSH_BUCKET_VECS,
        embedding_near_dup_pairs,
        near_dup_clusters,
        near_dup_fence_observed_drops,
        near_dup_recall_eval,
    )

    if method not in ("clusters", "fenced_pairs"):
        raise ValueError(f"unknown near-dup method {method!r}")
    batch_id = str(uuid.uuid4())
    t0 = time.time()
    source = f"near_dup_{method}"
    try:
        if method == "clusters":
            near_dup_clusters(spark, sf_dir).write.mode("overwrite").parquet(
                out_path
            )
            dropped = None
            gate_methods = ("hybrid_clusters",)
        else:
            cap = (MAX_LSH_BUCKET_VECS if max_bucket_vecs is None
                   else max_bucket_vecs)
            embedding_near_dup_pairs(
                spark, sf_dir, max_bucket_vecs=cap
            ).write.mode("overwrite").parquet(out_path)
            dropped = near_dup_fence_observed_drops(sf_dir)
            gate_methods = ("fenced_pairs",)
        n = spark.read.parquet(out_path).count()
        recall = None
        if eval_recall:
            gate = near_dup_recall_eval(
                spark, sf_dir, methods=gate_methods
            ).collect()
            recall = float(gate[0]["recall"]) if gate[0]["recall"] is not None else None
        if audit:
            audit.record({
                "batch_id": batch_id, "source_name": source,
                "status": "SUCCESS", "records_loaded": n,
                "started_at": t0, "finished_at": time.time(),
                "fence_dropped_rows": dropped,
                "method": method, "recall": recall,
            })
        return {"rows": n, "fence_dropped_rows": dropped,
                "method": method, "recall": recall}
    except Exception as e:
        if audit:
            audit.record({
                "batch_id": batch_id, "source_name": source,
                "status": "FAILED", "started_at": t0,
                "finished_at": time.time(), "error": str(e)[:500],
                "method": method,
            })
        raise


def incremental_pipeline(
    spark: SparkSession,
    pipeline: SourcePipeline,
    staging_root: str,
    window: tuple,
    audit: RunAudit | None = None,
) -> dict[str, int]:
    """The 15-minute path: windowed change scan -> transform -> guarded
    upsert per table. Replays/overlapping windows are no-ops (ST3)."""
    batch_id = str(uuid.uuid4())
    t0 = time.time()
    counts: dict[str, int] = {}
    try:
        raw = pipeline.extract(spark, window=window)
        for suffix, df in _tables_of(pipeline.transform(raw)).items():
            table = suffix or pipeline.name
            keys = [k for k in pipeline.keys if k in df.columns]
            out = stamp_etl_metadata(df, pipeline.name, batch_id,
                                     pipeline.vn_naive_stamp)
            order_col = pipeline.order_col if pipeline.order_col in out.columns else "etl_updated_at"
            # One materialization per table: the count action populates the
            # cache and the upsert's source side reads it back, instead of
            # re-running the extract->transform lineage a second time.
            out = out.persist()
            try:
                n = out.count()
                if n:
                    upsert(spark, out, f"{staging_root}/{table}", keys, order_col,
                           [g for g in pipeline.guard_cols if g in df.columns],
                           drop_null_key_rows=pipeline.drop_null_key_rows)
            finally:
                out.unpersist()
            counts[table] = n
        if audit:
            audit.record({
                "batch_id": batch_id, "source_name": pipeline.name,
                "status": "SUCCESS", "records_extracted": sum(counts.values()),
                "records_loaded": sum(counts.values()),
                "started_at": t0, "finished_at": time.time(),
            })
        return counts
    except Exception as e:
        if audit:
            audit.record({
                "batch_id": batch_id, "source_name": pipeline.name,
                "status": "FAILED", "started_at": t0,
                "finished_at": time.time(), "error": str(e)[:500],
            })
        raise
