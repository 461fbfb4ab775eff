"""Incremental micro-batch ingestion (SURVEY.md §2.8).

The reference's 15-minute Airflow cron + lookback-window re-extract +
idempotent MERGE (dags/incremental_etl_dag.py:49-51, ST1-ST6) maps to
Structured Streaming: a file/stream source -> ``foreachBatch`` applying
the guarded keyed upsert. The ST3 late-data story is identical: windows
may overlap and batches may replay; the ``target.order < source.order``
guard makes re-delivery a no-op, so at-least-once delivery + keyed upsert
= effectively-once in the table.

Also provided: the batch-driver equivalent (``run_incremental_batch``)
with an explicit lookback window — the bridge/backfill path (ST4) is the
same function with a wider window.
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.upsert import upsert


def run_incremental_batch(
    spark: SparkSession,
    source: DataFrame,
    table_path: str,
    keys: Sequence[str],
    order_col: str,
    guard_cols: Sequence[str] = (),
    lookback: timedelta | None = None,
    now: datetime | None = None,
) -> int:
    """One micro-batch: filter the source to the lookback window on
    ``order_col`` (ST2 watermark analog), upsert into the table. Returns
    rows considered. Replay-safe by construction.

    The lookback-filtered source is scanned ONCE: the batch is pinned with
    an eager localCheckpoint, so both the count and the upsert read the
    materialized blocks instead of re-running the source scan (the
    count-then-act double read was r4 finding #1; same fix shape as
    pipelines/etl.py's write-then-count)."""
    batch = source
    if lookback is not None:
        # naive-UTC to match the column convention (order_col timestamps
        # are session-tz/UTC); datetime.utcnow() is deprecated
        now = now or datetime.now(timezone.utc).replace(tzinfo=None)
        batch = source.filter(F.col(order_col) >= F.lit(now - lookback))
    batch = batch.localCheckpoint(eager=True)
    n = batch.count()
    if n:
        upsert(spark, batch, table_path, keys, order_col, guard_cols)
    return n


def incremental_upsert_stream(
    spark: SparkSession,
    stream: DataFrame,
    table_path: str,
    keys: Sequence[str],
    order_col: str,
    guard_cols: Sequence[str] = (),
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """Structured Streaming driver: readStream source -> foreachBatch
    keyed upsert. ``Trigger.AvailableNow`` drains what's there and stops —
    the cron-equivalent; a processingTime trigger gives the continuous
    15-minute cadence."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert(spark, batch_df, table_path, keys, order_col, guard_cols)

    writer = stream.writeStream.foreachBatch(apply_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="15 minutes")
    return writer.start()


def time_partitioned_append_stream(
    spark: SparkSession,
    stream: DataFrame,
    table_path: str,
    ts_col: str = "ts",
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """Append-stream sink into the date-partitioned retention layout
    (operators/retention.py) — the event-firehose complement to the
    keyed upsert stream: no MERGE semantics, just partition-routed
    appends that keep range reads pruned and retention metadata-only.
    Each micro-batch adds at most one file per day it touches (the
    batch is repartitioned by day inside write_dated), so file growth
    is O(batches), bounded by compaction cadence, not O(tasks×days).
    Exactly-once: file-sink semantics come from the checkpoint — a
    replayed batch re-runs foreachBatch, so the append is at-least-once;
    downstream exact dedup (D1/exact_dedup) or an idempotent batch_id
    partition column is the standard remedy when the source replays."""
    from ..operators.retention import write_dated

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_dated(batch_df, table_path, ts_col, mode="append")

    writer = stream.writeStream.foreachBatch(apply_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="15 minutes")
    return writer.start()




def _assignment_root(work_dir: str) -> str:
    return f"{work_dir.rstrip('/')}/near_dup_assignment.parquet"


def _p1_root(work_dir: str) -> str:
    # the maintained PASS-1 assignment (the two-pass build's first
    # stage) — versioned alongside the final assignment; batch N's
    # update diffs rep churn against version N-1
    return f"{work_dir.rstrip('/')}/near_dup_p1.parquet"


def _latest_assignment_version(spark: SparkSession, root: str) -> int | None:
    """Highest v=<n> child carrying a _SUCCESS marker (a complete
    Spark-committed write); incomplete crash leftovers are skipped."""
    from ..operators import fsops

    if not fsops.exists(root, spark):
        return None
    complete = [
        int(name[2:])
        for name in fsops.list_child_names(root, spark)
        if name.startswith("v=")
        and fsops.exists(f"{root}/{name}/_SUCCESS", spark)
    ]
    return max(complete) if complete else None


def read_assignment(spark: SparkSession, work_dir: str) -> DataFrame:
    """The current near-dup assignment maintained by
    near_dup_index_stream: the latest COMPLETE version directory."""
    root = _assignment_root(work_dir)
    v = _latest_assignment_version(spark, root)
    if v is None:
        raise FileNotFoundError(
            f"no complete near-dup assignment version under {root}"
        )
    return spark.read.parquet(f"{root}/v={v}")

def near_dup_index_stream(
    spark: SparkSession,
    stream: DataFrame,
    work_dir: str,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming maintenance of the near-dup cluster index: each
    micro-batch of new vectors (vec_id, embedding) grows the stored
    assignment via extensions.incremental_clusters — the round-8
    incremental path (touched-bucket re-rank, contracted components,
    broadcast relabel) driven by Structured Streaming instead of a cron
    rebuild.

    ``work_dir`` holds the growing corpus (``embeddings.parquet``) and
    the maintained assignment under ``near_dup_assignment.parquet/v=<n>``
    VERSION directories, with the PASS-1 assignment versioned alongside
    under ``near_dup_p1.parquet/v=<n>`` (r9 — the two-pass updater
    diffs rep churn against it; p1 is written FIRST each batch, so a
    complete final version implies its p1 sibling). Both seed from the
    full build as v=0 on first use; readers take the highest FINAL
    version that carries a ``_SUCCESS`` marker (read_assignment), so a
    crash mid-write can never expose a partial table — the same
    keep-latest-complete discipline as operators.index_store. Per
    batch, in this order:

    1. grow the assignment from the CURRENT corpus + latest complete
       assignment version (the batch is not yet in the corpus — the
       update requires that), materialized before any write;
    2. write assignment version v=<batch_id + 1> (a replayed batch
       rewrites ITS OWN version — deterministic, idempotent);
    3. append the batch vectors to the corpus table;
    4. prune versions older than the previous one.

    Crash/replay contract (checkpointed foreachBatch is at-least-once):
    a replay AFTER step 3 is recognized by ALL of its ids being stored
    already — skipped (loudly, stderr); a PARTIAL id overlap is not a
    replay but an id-allocation fault and fails the stream instead of
    silently dropping rows. A crash during step 2 leaves an incomplete
    version that readers skip;
    a crash between 2 and 3 replays with the batch absent from the
    corpus but present in the prior assignment; the update re-derives
    the same edges and min-label merge is idempotent, so the stream
    converges to the same assignment. The hash tier is pinned at stream
    start (``bits``); every batch re-checks the corpus's tier and the
    stream REFUSES (clear re-tier error) at the first batch that starts
    past the next lsh_bits step — stale-bits occupancy degradation is
    an error, not a silent cap.
    """
    import sys

    from ..extensions import similarity as S
    from ..extensions.incremental_clusters import incremental_near_dup_update
    from ..operators.index_store import table_dir

    bits = S.lsh_bits(S.corpus_count(spark, work_dir))
    assign_root = _assignment_root(work_dir)
    p1_root = _p1_root(work_dir)
    emb_path = table_dir(work_dir, "embeddings")

    from ..operators import fsops

    if _latest_assignment_version(spark, assign_root) is None:
        # p1 first: a complete FINAL version implies its p1 sibling
        # exists (readers key completeness off the final). Both writes
        # OVERWRITE (ADVICE r9 #2): a crash between them leaves p1 v=0
        # on disk while the final is absent, so restart re-enters this
        # branch — with errorifexists the p1 write would raise
        # path-already-exists and the stream could never start without
        # manual cleanup. Overwrite makes seeding idempotent across
        # crashes, matching the batch-path discipline.
        S.near_dup_p1_clusters(spark, work_dir).write.mode(
            "overwrite"
        ).parquet(f"{p1_root}/v=0")
        S.near_dup_clusters(spark, work_dir).write.mode(
            "overwrite"
        ).parquet(f"{assign_root}/v=0")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # No-silent-caps: the tier was pinned at stream start; growing a
        # corpus past its lsh_bits step with stale bits silently degrades
        # bucket occupancy forever. Detect and refuse instead (the count
        # is fingerprint-memoized — one narrow job after each append).
        cur_bits = S.lsh_bits(S.corpus_count(spark, work_dir))
        if cur_bits != bits:
            raise RuntimeError(
                f"near_dup_index_stream: corpus crossed an lsh_bits step "
                f"(stream started at {bits} bits, corpus now needs "
                f"{cur_bits}) — stop the stream, full-rebuild the index "
                f"at the new tier (near_dup_clusters), and restart"
            )
        # Three-way replay contract (one narrow corpus scan): a batch
        # whose ids are ALL already stored is a checkpoint replay of a
        # fully-applied batch — skip; NO overlap — apply; PARTIAL
        # overlap is neither, it is an id-allocation fault — refuse
        # loudly rather than silently dropping the new rows.
        mx_batch = batch_df.agg(F.max("vec_id")).first()[0]
        if mx_batch is not None and mx_batch >= S.TWIN_OFFSET:
            raise RuntimeError(
                f"near_dup_index_stream: batch {batch_id} vec_id "
                f"{mx_batch} >= TWIN_OFFSET {S.TWIN_OFFSET}"
            )
        n_batch = batch_df.count()
        n_over = batch_df.select("vec_id").join(
            spark.read.parquet(emb_path).select("vec_id"),
            "vec_id", "left_semi",
        ).count()
        if n_over == n_batch:
            print(
                f"near_dup_index_stream: batch {batch_id} already "
                f"applied (all {n_batch} ids stored — checkpoint "
                f"replay) — skipped",
                file=sys.stderr,
            )
            return
        if n_over:
            raise RuntimeError(
                f"near_dup_index_stream: batch {batch_id} PARTIALLY "
                f"overlaps the stored corpus ({n_over}/{n_batch} ids) — "
                f"not a replay; fix the id allocator"
            )
        # the p1 sibling of the final version the reader picked (they
        # are written as a pair, p1 first, so it always exists)
        v_prior = _latest_assignment_version(spark, assign_root)
        prior = spark.read.parquet(f"{assign_root}/v={v_prior}")
        prior_p1 = spark.read.parquet(f"{p1_root}/v={v_prior}")
        grown, grown_p1 = incremental_near_dup_update(
            spark, work_dir, batch_df, prior=prior, prior_p1=prior_p1,
            bits=bits, return_p1=True,
            check_ids=False,  # the three-way pre-check above subsumes it
        )
        # materialize BEFORE writing either input's successor
        grown = grown.localCheckpoint()
        v = batch_id + 1
        grown_p1.write.mode("overwrite").parquet(f"{p1_root}/v={v}")
        grown.write.mode("overwrite").parquet(f"{assign_root}/v={v}")
        # append with the corpus table's own embedding element type —
        # a mixed float/double parquet directory would poison later reads
        emb_type = spark.read.parquet(emb_path).schema["embedding"].dataType
        batch_df.select(
            F.col("vec_id").cast("long"),
            F.col("embedding").cast(emb_type).alias("embedding"),
        ).write.mode("append").parquet(emb_path)
        # keep this and the previous complete version; prune the rest
        for root in (assign_root, p1_root):
            for name in fsops.list_child_names(root, spark):
                if name.startswith("v=") and int(name[2:]) < v - 1:
                    fsops.delete(f"{root}/{name}", spark)

    writer = stream.writeStream.foreachBatch(apply_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="15 minutes")
    return writer.start()
