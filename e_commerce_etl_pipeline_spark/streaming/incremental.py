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






# ---------------------------------------------------------------------------
# Streaming near-dup index maintenance (r10: appendable store)
# ---------------------------------------------------------------------------

# fold the delta tail into a fresh base generation every this many
# applied batches — bounds read fan-in (seq-dir count) and composed-
# remap size; each compact is one O(corpus) rewrite, amortized to
# O(corpus / compact_every) per batch
DEFAULT_COMPACT_EVERY = 64


def _store_for(spark: SparkSession, work_dir: str):
    from ..extensions import similarity as S
    from ..extensions.nd_store import NearDupStore

    bits = S.lsh_bits(S.corpus_count(spark, work_dir))
    return NearDupStore(spark, work_dir, bits)


def read_assignment(spark: SparkSession, work_dir: str) -> DataFrame:
    """The current near-dup assignment maintained by
    near_dup_index_stream: the store's base generation folded through
    its applied delta seqs (only COMPLETE seqs participate, so a crash
    mid-write can never surface a partial batch)."""
    store = _store_for(spark, work_dir)
    if not store.is_seeded():
        raise store.not_seeded_error()
    return store.final_fold()


def near_dup_delete(spark: SparkSession, work_dir: str, vec_ids) -> dict:
    """Takedown/opt-out deletion against the maintained near-dup index:
    tombstones the ids (and their synthesized twins) so every
    subsequent read excludes them immediately, relabels families whose
    canonical was deleted, and lets the next compaction re-cluster the
    remaining rows to full rebuild-equality. See
    NearDupStore.apply_tombstones for the window-semantics contract.
    Corpus-TABLE rows are the caller's to delete (lakehouse DELETE)."""
    store = _store_for(spark, work_dir)
    if not store.is_seeded():
        raise store.not_seeded_error()
    return store.apply_tombstones(vec_ids)


def read_p1_assignment(spark: SparkSession, work_dir: str) -> DataFrame:
    """The maintained PASS-1 assignment (the two-pass build's first
    stage), folded the same way."""
    store = _store_for(spark, work_dir)
    if not store.is_seeded():
        raise store.not_seeded_error()
    return store.p1_fold()


def near_dup_index_stream(
    spark: SparkSession,
    stream: DataFrame,
    work_dir: str,
    checkpoint_dir: str | None = None,
    trigger_available_now: bool = True,
    compact_every: int = DEFAULT_COMPACT_EVERY,
):
    """Streaming maintenance of the near-dup cluster index: each
    micro-batch of new vectors (vec_id, embedding) grows the stored
    assignment via extensions.incremental_clusters.apply_batch_to_store
    — the O(batch) store-backed path (pruned keyed-corpus reads,
    bounded delta writes) driven by Structured Streaming instead of a
    cron rebuild.

    ``work_dir`` holds the growing corpus (``embeddings.parquet``) and
    the appendable maintenance store (extensions.nd_store: keyed
    corpus + both assignments as base generations + per-batch delta
    seq dirs). The store seeds from the full build AT STREAM START,
    before the first trigger — so batch 1 costs what batch k costs
    (VERDICT r9 #3: the r9 scheme paid the keyed-corpus cache build
    inside the first maintenance window: 29.3 s at sf10, 96.4 s at
    sf100). Per batch, in this order:

    1. compute the batch's bounded delta against the store state and
       write it as the next seq dir (meta.json last — the seq's
       commit point; a replayed batch overwrites its own seq);
    2. append the batch vectors to the corpus table;
    3. every ``compact_every`` batches, fold the delta tail into a
       fresh base generation (O(corpus), amortized — and the ONLY
       corpus-sized work any batch ever does).

    Crash/replay contract (checkpointed foreachBatch is at-least-once):
    a replay AFTER step 2 is recognized by ALL of its ids being stored
    already — skipped (loudly, stderr); a PARTIAL id overlap is not a
    replay but an id-allocation fault and fails the stream instead of
    silently dropping rows. A crash DURING step 1 leaves a meta-less
    seq dir no reader sees; the replay overwrites it. A crash BETWEEN
    1 and 2 replays with the batch absent from the corpus but present
    in the store — recognized by the batch fingerprint riding the seq
    meta (or ``last_fp`` after a fallback/compact) and skipped, so no
    batch can ever occupy two seqs. The hash tier is pinned at stream
    start (``bits``); every batch re-checks the corpus's tier and the
    stream REFUSES (clear re-tier error) at the first batch that
    starts past the next lsh_bits step — stale-bits occupancy
    degradation is an error, not a silent cap. After a re-tier
    rebuild, the new tier's store seeds under its own root
    (nd_index*_b<bits>) — stale-tier artifacts can never be read."""
    import sys

    from ..extensions import similarity as S
    from ..extensions.incremental_clusters import apply_batch_to_store
    from ..operators.index_store import table_dir

    store = _store_for(spark, work_dir)
    bits = store.bits
    emb_path = table_dir(work_dir, "embeddings")
    if not store.is_seeded():
        # warm start: base generation (keyed corpus incl. sorted
        # layouts + both assignments) materialized before the first
        # trigger, off the maintenance clock
        store.seed()
    # narrow caches + Arrow worker pool built before the first trigger
    # (VERDICT r9 #3: batch 1 must cost what batch k costs)
    store.warm()

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
        res = apply_batch_to_store(spark, store, batch_df)
        if res.get("skipped"):
            print(
                f"near_dup_index_stream: batch {batch_id} store state "
                f"already current (seq {res['seq']}, {res['reason']}) — "
                f"appending corpus only",
                file=sys.stderr,
            )
        # append with the corpus table's own embedding element type —
        # a mixed float/double parquet directory would poison later reads
        emb_type = spark.read.parquet(emb_path).schema["embedding"].dataType
        batch_df.select(
            F.col("vec_id").cast("long"),
            F.col("embedding").cast(emb_type).alias("embedding"),
        ).write.mode("append").parquet(emb_path)
        if store.latest_seq() - store.upto_seq >= compact_every:
            store.compact()

    writer = stream.writeStream.foreachBatch(apply_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="15 minutes")
    return writer.start()
