"""Appendable on-disk near-dup maintenance store (VERDICT r9 #1/#2/#3).

The r9 streaming/append near-dup path had one structural scale-killer
left: every micro-batch re-derived the keyed corpus (wide embedding
scan + twin synthesis + 4-table explode + signature build) because the
keyed frame was fingerprint-cached per corpus SNAPSHOT and an append
changes the snapshot (`BENCH_incremental_append_sf10_r9.json`:
p1_edges 2.8 -> 11.1 s across three 400-vector appends). The keyed row
(t, bucket, __sig, __proj) is a pure per-vector function at a fixed
``lsh_bits`` tier, so this module persists it ONCE and appends each
batch's keyed rows instead — plus the two cluster assignments (pass-1
and final) as base + per-batch DELTAS, so no maintenance step ever
rewrites, rescans, or re-sorts a corpus-sized artifact.

Layout (all under ``{work_dir}/nd_index{_w2_suffix()}_b{bits}`` — the
chain widths, twin offset and hash tier ride the ROOT name, so a tuned
run can never poison another configuration's store)::

    _META          json {bits, gen, upto_seq, n_keyed}; the ATOMIC
                   commit point for seed and compact — it names the
                   active base generation and the last seq folded into
                   it; written LAST, so readers never see a torn base
    g=<gen>/       one immutable base generation
      keyed/       keyed corpus, range-partitioned and sorted by
                   (t, bucket), small row groups — bucket IN-list
                   reads prune at row-group granularity
      keyed_idx/   narrow (vec_id, t, bucket) sidecar sorted by vec_id
                   — "which buckets hold these ids" point-lookups
      p1/          pass-1 assignment sorted by vec_id   (cid lookups)
      p1_bycan/    pass-1 assignment sorted by canonical_id
                   (family-member enumeration)
      final/       final assignment sorted by vec_id
      p2b/         pass-2 BOUNDARY corpus (keyed cols + __fam: the
                   first/last/canonical rows per (t, bucket, pass-1
                   family) — similarity.p2_boundary_rows), sorted by
                   (t, bucket): the bucket-context read for pass 2
      p2b_byfam/   the same rows sorted by __fam — "which boundary
                   rows do these families own" pruned lookups
    s=<n>/         one dir per applied batch (seqs ≤ upto_seq are
                   folded into the base and ignored)
      keyed/       the batch corpus's keyed rows (base + twins)
      p1_new/      rows ADDED to the pass-1 assignment
      final_new/   rows ADDED to the final assignment
      p2b_new/     REWRITTEN boundary groups: the current boundary
                   rows of every (t, bucket, family) the batch
                   changed; a group's older rows are superseded by
                   construction (latest-writing seq wins — see
                   boundary-read rule below)
      tomb/        (tombstone seqs only, r12) deleted vec_ids incl.
                   twins; the seq's row artifacts are present but
                   EMPTY, its relabels ride the ordinary remap slots,
                   and every reader excludes the union of live
                   tombstones — see apply_tombstones for the deletion
                   contract and window semantics
      meta.json    {batch_fp, p1_remap, final_remap, ...}; written
                   LAST -> seq completeness marker

Boundary maintenance (r11 — VERDICT r10 #6). Pass 2 consumes ONLY
boundary rows, and the boundary set is CLOSED under growth/merge: the
extremes of a merged group are among its parts' extremes, and a
family's canonical rows are always in its own stored set (the
``vec_id == __fam`` clause), so re-running p2_boundary_rows over {old
parts' boundary rows ∪ new batch rows} reproduces the full-member
result exactly — no member enumeration, no member scan. Per batch the
pass-2 read is therefore proportional to the touched families'
BOUNDARY mass (clone-heavy corpora: a small fraction of membership —
exactly the corpora where family mass exploded the old member
re-enumeration, 145k -> 424k affected rows per fixed batch across one
corpus decade). Boundary-read rule: a stored row (base carries
seq=upto_seq, each delta its own seq) is CURRENT iff no later seq
rewrote its group — groups are compared at read time after relabeling
``__fam`` through the composed remap, and every merge rewrites ALL
constituent families' groups (touched-family closure), so
latest-seq-wins per relabeled (t, bucket, __fam) is exact.

Assignment semantics: ``assignment(N) = relabel(base ∪ new-rows(upto+1
.. N)) through the COMPOSED remaps(upto+1 .. N)``. A remap entry
(old_canonical -> new_canonical) is produced when a batch merges prior
families (min-label only ever decreases); remaps are dicts BOUNDED by
cumulative family churn, composed driver-side with path compression,
and applying the fully-composed map to any row is exact regardless of
which seq wrote it — a canonical that was remapped away at seq k can
never be a live canonical at seq > k, so the composed map's entries
never collide.

Crash/replay contract (single sequential writer — the stream):

- A seq dir without ``meta.json`` is incomplete and invisible to every
  reader; the replayed batch overwrites it in place.
- ``meta.json`` carries the batch's content fingerprint: a replay
  whose fingerprint matches the LATEST complete seq re-uses that seq
  number (a crash landed between the seq write and the corpus append),
  so no batch can ever occupy two seqs.
- Seed/compact write a FRESH generation dir and commit it by
  rewriting ``_META`` (tiny, last): a crash mid-write leaves ``_META``
  pointing at the old consistent state; stale generations and folded
  seq dirs are garbage-collected best-effort on the next commit
  (ADVICE r9 #2's overwrite-idempotent discipline, generalized).
- Concurrent-reader contract (integration-tested, r12): a lazy fold
  resolved against generation N-1 stays executable with EXACT rows
  across one subsequent compact (N-1 and the seq dirs its readers
  fold are retained — ADVICE r10 #5); after a second compact commits
  N+1 and GCs N-1, executing the stale plan raises Spark's
  missing-file error — a clean failure, never wrong or partial rows.
  Readers that can outlive two compaction cadences must re-resolve
  (build a fresh fold) per read.

Scale shape: per-batch work is proportional to the batch's touched
buckets and families — pruned parquet reads (bucket/vec_id IN-lists
against sorted bases; the IN pushdown threshold is raised so parquet
row-group stats actually see the lists), bounded driver collects, and
batch-sized writes. The corpus-sized artifacts are written once at
seed and rewritten only by ``compact()`` (amortized: every
``compact_every`` batches, or after a backfill batch routed through
the distributed fallback). At deployment scale the same layout maps to
a bucket-partitioned lakehouse table + an upsert-able assignment table;
the compute shape here already assumes nothing more than pruned reads.

Reference behavior parity: the reference maintains warehouse state
across 15-minute increments instead of re-extracting the world
(dags/incremental_etl_dag.py); this store applies that discipline to
the similarity index itself.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators import fsops
from . import similarity as S

KEYED_COLS = ["vec_id", "v", "norm", "t", "bucket", "__sig", "__proj"]
ASSIGN_COLS = ["vec_id", "canonical_id"]
P2B_COLS = [*KEYED_COLS, "__fam"]
# on-disk layout version: bumped when a generation gains artifacts —
# a store whose _META carries an older layout reads as unseeded, so
# the stream re-seeds it (fresh generation) instead of failing reads
LAYOUT = 2

# target rows per output file for the sorted base writes: small enough
# that (file, row-group) stats give the IN-list reads real pruning,
# large enough that file count stays O(corpus / 250k)
_BASE_ROWS_PER_FILE = 250_000
# small row groups inside each base file (default 128 MiB would leave
# one group per file and nothing to prune)
_BASE_BLOCK_BYTES = 4 * 1024 * 1024
# parquet IN-list pushdown gives up above this many values by default
# (10). Spark pushes an IN as a LINEAR or(eq, or(eq, ...)) chain and
# parquet-mr evaluates it recursively, so the list size bounds the
# filter-eval stack depth — a ~3k-value list overflowed executor
# stacks on the 25-batch heavy-corpus probe. 1024 prunes real batches
# and stays ~30x under the default 1 MiB thread stack.
_IN_THRESHOLD = 1024
# above this many lookup ids, a broadcast semi-join beats the IN
# literal tree (Catalyst plan build + py4j transfer scale with literal
# count; the scan it avoids is narrow) — and keeps every pushed IN
# within _IN_THRESHOLD, so no filter ever reaches parquet's recursive
# evaluator oversized
_ISIN_MAX = 1024


def _set_in_threshold(spark: SparkSession) -> None:
    """Raise the parquet IN-pushdown threshold for the MAINTENANCE
    session. Called from the store methods that build IN-pushdown
    reads (not from ``__init__``: a session that merely reads the
    maintained assignment — read_assignment/final_fold, which use
    broadcast remap joins, never IN-lists — must not have its global
    parquet behavior changed as a constructor side effect, ADVICE r10
    #4). The setting persists for the maintenance session because the
    frames those methods return are lazy — it must still be in force
    when the batch's counts/collects execute."""
    spark.conf.set(
        "spark.sql.parquet.pushdown.inFilterThreshold", str(_IN_THRESHOLD)
    )


def batch_fingerprint(batch_df: DataFrame) -> str:
    """Deterministic content fingerprint of a batch — one narrow
    aggregate (no collect of the ids). Used to recognize a replayed
    batch whose seq dir landed before a crash. Besides the id-set
    statistics, it folds in a CONTENT term (order-independent exact
    sum of per-row xxhash64 over id+embedding — decimal so a huge
    batch can't overflow ANSI long sums): a redelivery carrying the
    same ids but rewritten embeddings must be detected as a NEW batch,
    not skipped as a replay, or the index silently diverges from the
    corpus (ADVICE r10 #3)."""
    row = batch_df.agg(
        F.count("*").alias("n"),
        F.min("vec_id").alias("lo"),
        F.max("vec_id").alias("hi"),
        F.sum("vec_id").alias("s"),
        F.sum(F.col("vec_id") * F.col("vec_id")).alias("s2"),
        F.sum(
            F.xxhash64(F.col("vec_id"), F.col("embedding")).cast(
                "decimal(38,0)"
            )
        ).alias("ch"),
    ).first()
    return hashlib.sha1(
        f"{row['n']}|{row['lo']}|{row['hi']}|{row['s']}|{row['s2']}"
        f"|{row['ch']}".encode()
    ).hexdigest()


def _boundary_of(keyed: DataFrame, p1: DataFrame) -> DataFrame:
    """The full boundary corpus (keyed cols + __fam) from a keyed
    corpus and a pass-1 assignment — the seed/fallback construction
    (O(corpus), never run per micro-batch)."""
    fam = keyed.join(
        p1.select(
            "vec_id", F.col("canonical_id").alias("__fam")
        ),
        "vec_id", "left",
    ).withColumn("__fam", F.coalesce(F.col("__fam"), F.col("vec_id")))
    return S.p2_boundary_rows(fam, keep_fam=True)


def _compose(base: dict[int, int], nxt: dict[int, int]) -> dict[int, int]:
    """base then nxt, path-compressed: every historical canonical maps
    straight to its current one."""
    out = {old: nxt.get(tgt, tgt) for old, tgt in base.items()}
    for k, v in nxt.items():
        out.setdefault(k, v)
    return out


class NearDupStore:
    """Single-writer appendable store for one (work_dir, bits, widths,
    twin-offset) configuration. Readers may be concurrent; writes are
    the stream's (or the chained bench's) alone."""

    def __init__(self, spark: SparkSession, work_dir: str, bits: int):
        self.spark = spark
        self.work_dir = work_dir.rstrip("/")
        self.bits = bits
        self.root = f"{self.work_dir}/nd_index{S._w2_suffix()}_b{bits}"
        self._meta_cache: dict[int, dict] = {}
        self._composed_cache: dict[tuple[str, int], dict[int, int]] = {}
        self._root_meta_cache: dict | None = None
        self._narrow_cache: dict[tuple[int, str], DataFrame] = {}
        self._tail_cache: dict[tuple[int, str], tuple[int, DataFrame]] = {}
        self._tomb_cache: dict[tuple[int, int], list[int]] = {}

    # ---- root meta / layout helpers -------------------------------------
    def _root_meta(self) -> dict | None:
        if self._root_meta_cache is None:
            txt = fsops.read_text(f"{self.root}/_META", self.spark)
            try:
                self._root_meta_cache = json.loads(txt) if txt else {}
            except ValueError:
                # unparsable commit marker = incomplete state, not a
                # reader crash: _META is written atomically, so this
                # means external corruption — treat as unseeded (the
                # stream re-seeds from the full build, which is the
                # correct recovery) rather than failing every reader
                self._root_meta_cache = {}
        return self._root_meta_cache or None

    def is_seeded(self) -> bool:
        meta = self._root_meta()
        return meta is not None and meta.get("layout") == LAYOUT

    def seed_state(self) -> str:
        """Three-way store state, so readers can tell "nothing here"
        from "healthy pre-layout-v2 store awaiting re-seed" (ADVICE r11
        #3: during a layout migration window the old error claimed the
        store didn't exist): ``"seeded"`` | ``"stale-layout"`` |
        ``"unseeded"``."""
        meta = self._root_meta()
        if meta is None:
            return "unseeded"
        return "seeded" if meta.get("layout") == LAYOUT else "stale-layout"

    def not_seeded_error(self) -> FileNotFoundError:
        """The precise not-readable error for the current state."""
        if self.seed_state() == "stale-layout":
            got = (self._root_meta() or {}).get("layout", 0)
            return FileNotFoundError(
                f"near-dup store at {self.root} has layout {got} < "
                f"{LAYOUT} (pre-migration store, intact but not "
                "readable by this version); run the maintenance stream "
                "to re-seed it"
            )
        return FileNotFoundError(f"near-dup store not seeded: {self.root}")

    @property
    def upto_seq(self) -> int:
        meta = self._root_meta()
        return meta["upto_seq"] if meta else 0

    def _base(self, name: str) -> str:
        meta = self._root_meta()
        if meta is None:
            raise self.not_seeded_error()
        return f"{self.root}/g={meta['gen']}/{name}"

    def _seq_dir(self, seq: int) -> str:
        return f"{self.root}/s={seq}"

    # ---- delta-tail cache --------------------------------------------------
    def _tail(self, name: str, cols: list[str], max_seq: int) -> DataFrame | None:
        """The delta tail (seqs upto+1..max_seq of artifact ``name``)
        as ONE in-memory persisted frame with a ``__seq`` column,
        extended INCREMENTALLY: tail(N) = tail(N-1) ∪ seq N's rows, so
        a long-lived maintenance process re-reads no delta file twice.
        Without this, every action re-listed and re-footer-read every
        delta file — the residual ~0.15 s/batch climb of the r11
        70-batch curve (the tail is batch-scale: ~800 keyed rows per
        seq, trivially memory-resident). Returns None when the tail is
        empty. Invalidation: generation flips (keyed by gen) and seq
        overwrites (write_seq drops tails covering the rewritten seq).
        Reads at an OLDER max_seq than the cache covers bypass it."""
        meta = self._root_meta()
        if meta is None:
            raise self.not_seeded_error()
        if max_seq <= self.upto_seq:
            return None

        def _read(lo: int, hi: int) -> DataFrame | None:
            out = None
            for s in range(lo, hi + 1):
                if self._seq_meta(s) is None:
                    continue
                df = self.spark.read.parquet(
                    f"{self._seq_dir(s)}/{name}"
                ).select(*cols).withColumn("__seq", F.lit(s))
                out = df if out is None else out.unionByName(df)
            return out

        key = (meta["gen"], f"tail:{name}")
        hit = self._tail_cache.get(key)
        if hit is not None and hit[0] == max_seq:
            return hit[1]
        if hit is not None and hit[0] > max_seq:
            return _read(self.upto_seq + 1, max_seq)  # older view: bypass
        if hit is not None:
            ext = _read(hit[0] + 1, max_seq)
            if ext is None:  # no new complete seqs — same frame covers it
                self._tail_cache[key] = (max_seq, hit[1])
                return hit[1]
            df = hit[1].unionByName(ext)
        else:
            df = _read(self.upto_seq + 1, max_seq)
        if df is None:
            return None
        df = df.persist()
        df.count()  # materialize now — later actions read memory
        if hit is not None:
            try:
                hit[1].unpersist()
            except Exception:  # noqa: BLE001 — eviction best-effort
                pass
        self._tail_cache[key] = (max_seq, df)
        return df

    def _drop_tails(self, from_seq: int | None = None) -> None:
        """Evict tail caches — all of them (commit/replay), or those
        covering ``from_seq`` and later (a rewritten seq dir)."""
        for key, (mx, df) in list(self._tail_cache.items()):
            if from_seq is None or mx >= from_seq:
                try:
                    df.unpersist()
                except Exception:  # noqa: BLE001
                    pass
                self._tail_cache.pop(key, None)

    # ---- seeding / compaction --------------------------------------------
    def seed(self) -> None:
        """Materialize the base artifacts from the full-build stored
        artifacts for the CURRENT corpus (idempotent — a fresh
        generation committed by the final ``_META`` write)."""
        keyed = S.nd_keyed_corpus(self.spark, self.work_dir).select(*KEYED_COLS)
        p1 = S.near_dup_p1_clusters(self.spark, self.work_dir)
        final = S.near_dup_clusters(self.spark, self.work_dir)
        p2b = _boundary_of(keyed, p1)
        self._commit_generation(
            keyed, p1, final, self._max_physical_seq(), p2b=p2b
        )

    def compact(self, warm_after: bool = True) -> None:
        """Fold the deltas into a fresh sorted generation and retire
        the seq dirs — O(corpus), run every ``compact_every`` batches
        by the stream (amortized) or after a distributed-fallback
        backfill. Crash-safe: commit is the final ``_META`` rewrite.

        ``warm_after`` re-warms caches AND pre-touches the fresh
        generation's wide artifacts on the way out (see warm()): the
        cold first-read of the new base otherwise lands inside the
        next batches' maintenance windows (r12 sf100 attribution:
        81/69 s post-compact batches vs a 24.7 s median, all of it
        first-read I/O after the compact's write burst evicted the
        page cache)."""
        max_seq = self.latest_seq()
        # the folded tail seq's fingerprint survives the fold, so a
        # replay of that batch after a compact is still recognized
        last = self._seq_meta(max_seq) if max_seq > self.upto_seq else None
        keyed = self._keyed_all(max_seq).localCheckpoint()
        if self.tomb_ids(max_seq):
            # deletions can SPLIT families (a removed bridge) and folds
            # can relabel but never split — so a compaction that folds
            # live tombstones RE-CLUSTERS the remaining keyed rows with
            # the exact build machinery instead. keyed rows are pure
            # per-vector functions, so this equals the full rebuild on
            # corpus-minus-deleted (tests/test_nd_store_tombstones.py);
            # the cost is a seed-build minus the keyed-corpus
            # construction (the wide scan/explode), riding the existing
            # O(corpus) maintenance event. The fresh generation carries
            # no tombstones — they fold away with their seqs.
            p1, final = S.two_pass_clusters_from_keyed(keyed)
            p1 = p1.localCheckpoint()
            final = final.localCheckpoint()
            p2b = None  # _commit_generation derives it from (keyed, p1)
        else:
            p1 = self._fold("p1", max_seq).localCheckpoint()
            final = self._fold("final", max_seq).localCheckpoint()
            # the boundary corpus folds from its OWN stored rows
            # (relabel + latest-wins) — O(boundary corpus), never a
            # member re-window; left LAZY (see _commit_generation's
            # memory note)
            p2b = self.p2b_fold(max_seq)
        self._commit_generation(
            keyed, p1, final, max_seq,
            last_fp=last.get("batch_fp") if last else None,
            p2b=p2b,
        )
        if warm_after:
            self.warm()

    def _children(self) -> list[str]:
        if not fsops.exists(self.root, self.spark):
            return []
        return fsops.list_child_names(self.root, self.spark)

    def _max_physical_seq(self) -> int:
        seqs = [
            int(name[2:])
            for name in self._children()
            if name.startswith("s=")
        ]
        return max(seqs, default=0)

    def _commit_generation(
        self,
        keyed: DataFrame,
        p1: DataFrame,
        final: DataFrame,
        upto: int,
        last_fp: str | None = None,
        p2b: DataFrame | None = None,
    ) -> None:
        meta = self._root_meta()
        prev_upto = meta["upto_seq"] if meta else -1
        gen = (meta["gen"] + 1) if meta else 1
        gdir = f"{self.root}/g={gen}"
        n_keyed = keyed.count()
        nf = max(4, n_keyed // _BASE_ROWS_PER_FILE)
        self._sorted_write(
            keyed.select(*KEYED_COLS), f"{gdir}/keyed", nf, ["t", "bucket"]
        )
        self._sorted_write(
            keyed.select("vec_id", "t", "bucket"),
            f"{gdir}/keyed_idx", max(2, nf // 4), ["vec_id"],
        )
        na = max(2, nf // 8)
        self._sorted_write(
            p1.select(*ASSIGN_COLS), f"{gdir}/p1", na, ["vec_id"]
        )
        self._sorted_write(
            p1.select(*ASSIGN_COLS), f"{gdir}/p1_bycan", na, ["canonical_id"]
        )
        self._sorted_write(
            final.select(*ASSIGN_COLS), f"{gdir}/final", na, ["vec_id"]
        )
        if p2b is None:
            p2b = _boundary_of(keyed, p1)
        # NOT checkpointed: pinning a second corpus-sized wide frame
        # next to the keyed checkpoint OOMed a 24g heap at sf100 (the
        # boundary corpus ≈ the keyed corpus on low-clone shapes). The
        # boundary window recomputes once per sorted copy instead —
        # seed/compact-time work, never per batch. File sizing keys off
        # n_keyed (boundary ≤ keyed; smaller files only prune better).
        p2b = p2b.select(*P2B_COLS)
        nb = max(2, n_keyed // _BASE_ROWS_PER_FILE)
        self._sorted_write(p2b, f"{gdir}/p2b", nb, ["t", "bucket"])
        self._sorted_write(p2b, f"{gdir}/p2b_byfam", nb, ["__fam"])
        # the commit point: readers switch generations here or never —
        # written ATOMICALLY (temp + rename): a crash mid-write must
        # leave the OLD complete _META, not an empty/partial file that
        # reads as "not seeded" and discards the grown state
        fsops.write_text_atomic(
            f"{self.root}/_META",
            json.dumps({
                "bits": self.bits, "gen": gen, "layout": LAYOUT,
                "upto_seq": upto, "n_keyed": n_keyed,
                # fingerprint of the last batch folded into this base
                # (fallback/compact): lets a crash-replay of that batch
                # be recognized even though its seq dir is gone
                "last_fp": last_fp,
            }),
            self.spark,
        )
        self._root_meta_cache = None
        self._composed_cache.clear()
        self._tomb_cache.clear()
        self._drop_tails()  # the new generation folds the tail away
        self._gc(gen, prev_upto)

    def _gc(self, gen: int, prev_upto: int) -> None:
        """Best-effort removal of SUPERSEDED-TWICE state — retried
        implicitly at the next commit. Keeps the immediately-previous
        generation AND the seq dirs its readers fold (seqs >
        ``prev_upto``): the class contract allows concurrent readers,
        and a lazily-built fold that resolved paths against gen N-1
        may execute after this commit (ADVICE r10 #5 — the prior
        versioned-assignment scheme kept latest-two for the same
        reason). Deleted here: generations ≤ N-2 and seqs folded into
        BOTH live generations."""
        try:
            for name in self._children():
                if name.startswith("g=") and int(name[2:]) < gen - 1:
                    fsops.delete(f"{self.root}/{name}", self.spark)
                elif name.startswith("s=") and int(name[2:]) <= prev_upto:
                    fsops.delete(f"{self.root}/{name}", self.spark)
                    self._meta_cache.pop(int(name[2:]), None)
        except Exception:  # noqa: BLE001 — GC must never fail a commit
            pass

    def _sorted_write(
        self, df: DataFrame, path: str, nfiles: int, sort_cols: list[str]
    ) -> None:
        (
            df.repartitionByRange(nfiles, *[F.col(c) for c in sort_cols])
            .sortWithinPartitions(*sort_cols)
            .write.mode("overwrite")
            .option("parquet.block.size", _BASE_BLOCK_BYTES)
            .parquet(path)
        )

    # ---- seq bookkeeping -------------------------------------------------
    def _seq_meta(self, seq: int) -> dict | None:
        if seq in self._meta_cache:
            return self._meta_cache[seq]
        txt = fsops.read_text(f"{self._seq_dir(seq)}/meta.json", self.spark)
        if txt is None:
            return None
        try:
            meta = json.loads(txt)
        except ValueError:
            # meta.json is written atomically, so a parse failure means
            # external corruption — treat the seq as INCOMPLETE (same
            # as absent: invisible to readers, overwritten by replay)
            return None
        self._meta_cache[seq] = meta
        return meta

    def latest_seq(self) -> int:
        """Highest COMPLETE seq (``upto_seq`` when none newer exist).
        Seqs are written sequentially, so completeness is contiguous —
        walk down from the highest present dir."""
        upto = self.upto_seq
        for seq in sorted(
            (
                int(name[2:])
                for name in self._children()
                if name.startswith("s=") and int(name[2:]) > upto
            ),
            reverse=True,
        ):
            if self._seq_meta(seq) is not None:
                return seq
        return upto

    def seq_for_batch(self, batch_fp: str) -> int:
        """The seq this batch should (re)write: the latest complete
        seq if its fingerprint matches (torn replay — the seq landed
        but the corpus append did not), else the next number."""
        latest = self.latest_seq()
        if latest > self.upto_seq:
            meta = self._seq_meta(latest)
            if meta and meta.get("batch_fp") == batch_fp:
                return latest
        return latest + 1

    def write_seq(
        self,
        seq: int,
        batch_fp: str,
        batch_keyed: DataFrame,
        p1_new: list[tuple[int, int]],
        final_new: list[tuple[int, int]],
        p1_remap: dict[int, int],
        final_remap: dict[int, int],
        p2b_new: DataFrame | None = None,
    ) -> None:
        d = self._seq_dir(seq)
        batch_keyed.select(*KEYED_COLS).write.mode("overwrite").parquet(
            f"{d}/keyed"
        )
        # the batch's rewritten boundary groups (batch-scale: one row
        # set per changed (t, bucket, family)); written as a frame —
        # the recompute is distributed and never touches the driver
        (p2b_new if p2b_new is not None else batch_keyed.limit(0).withColumn(
            "__fam", F.col("vec_id")
        )).select(*P2B_COLS).coalesce(1).write.mode("overwrite").parquet(
            f"{d}/p2b_new"
        )
        for name, rows in (("p1_new", p1_new), ("final_new", final_new)):
            # one-partition RDD instead of a local relation: the local-
            # relation write path measured ~2.3 s per call even for
            # hundreds of rows (plan-embedded data + write overheads);
            # the RDD path is a single 0.3 s task
            self.spark.createDataFrame(
                self.spark.sparkContext.parallelize(rows or [], 1),
                "vec_id bigint, canonical_id bigint",
            ).write.mode("overwrite").parquet(f"{d}/{name}")
        fsops.write_text_atomic(
            f"{d}/meta.json",
            json.dumps({
                "seq": seq,
                "batch_fp": batch_fp,
                "p1_remap": {str(k): v for k, v in p1_remap.items()},
                "final_remap": {str(k): v for k, v in final_remap.items()},
                "n_p1_new": len(p1_new),
                "n_final_new": len(final_new),
            }),
            self.spark,
        )
        self._meta_cache.pop(seq, None)  # overwritten seq: force re-read
        self._composed_cache.clear()
        # a rewritten seq invalidates any cached tail that covered it
        # (a NEW seq drops nothing — the next read extends the tail)
        self._drop_tails(from_seq=seq)

    def warm(self) -> None:
        """Build the in-memory narrow caches, pre-touch the WIDE base
        artifacts, and spin up the Arrow python-worker pool BEFORE the
        first maintenance batch — the stream calls this at start (and
        compact() calls it after each generation commit) so batch 1 /
        the first post-compact batch costs what batch k costs.

        The wide pre-touch exists because of the r12 sf100 variance
        attribution (BENCH_incremental_append_sf100_r12.json): a
        generation write (seed/compact) pushes tens of GB through the
        page cache, and the next batches' pruned reads then pay COLD
        first-reads of the fresh 30+ GB base — the two post-compact
        batches ran 81/69 s against a 24.7 s median with identical
        work stats and GC < 0.5 s; their extra time was exactly the
        first disk read of the new generation's keyed/p2b files. One
        sequential scan here (on the maintenance clock, where the
        corpus-sized work already lives) buys flat per-batch cost
        after it. The aggregate touches EVERY column chunk (parquet
        count() alone is answered from footers and reads no data)."""
        for name in ("keyed_idx", "p1", "p1_bycan", "final"):
            self._narrow_base(name).count()
        for name in ("keyed", "p2b"):
            df = self.spark.read.parquet(self._base(name))
            # F.get touches the array column's pages (reader decodes
            # whole pages, so one element pulls the chunk) and is
            # out-of-bounds-safe under ANSI, unlike element_at
            df.select(
                F.sum(F.get("v", 0)),
                F.sum("norm"), F.sum("__sig"), F.sum("__proj"),
                F.sum("bucket"), F.sum("vec_id"), F.sum("t"),
            ).collect()
        latest = self.latest_seq()
        self.p2b_for_buckets([(0, 0)], latest).count()
        S.chain_edges_arrow(
            self.keyed_for_buckets([(0, 0)], latest),
            ["t", "bucket"], S.NEAR_DUP_CHAIN_W, S.NEAR_DUP_COS,
        ).count()

    # ---- composed remaps -------------------------------------------------
    def _composed(self, which: str, max_seq: int) -> dict[int, int]:
        key = (which, max_seq)
        hit = self._composed_cache.get(key)
        if hit is not None:
            return hit
        out: dict[int, int] = {}
        for seq in range(self.upto_seq + 1, max_seq + 1):
            meta = self._seq_meta(seq)
            if meta is None:  # incomplete tail — stop
                break
            out = _compose(
                out, {int(k): v for k, v in meta[f"{which}_remap"].items()}
            )
        self._composed_cache[key] = out
        return out

    # ---- reads -----------------------------------------------------------
    def _seq_paths(self, name: str, max_seq: int) -> list[str]:
        return [
            f"{self._seq_dir(s)}/{name}"
            for s in range(self.upto_seq + 1, max_seq + 1)
            if self._seq_meta(s) is not None
        ]

    def _narrow_base(self, name: str) -> DataFrame:
        """The NARROW base artifacts (keyed_idx, p1, p1_bycan, final)
        behind an in-memory persist, keyed by generation: every batch
        issues several point-lookups against them, and a long-lived
        maintenance process keeping its narrow indexes hot (hundreds of
        MB at sf100) is the deployment norm — the wide keyed base stays
        on disk. Generation flips (seed/compact) evict."""
        meta = self._root_meta()
        if meta is None:
            raise self.not_seeded_error()
        key = (meta["gen"], name)
        hit = self._narrow_cache.get(key)
        if hit is not None:
            return hit
        for (gen, _), df in list(self._narrow_cache.items()):
            if gen != meta["gen"]:
                try:
                    df.unpersist()
                except Exception:  # noqa: BLE001 — eviction best-effort
                    pass
                self._narrow_cache.pop((gen, _), None)
        df = self.spark.read.parquet(self._base(name)).persist()
        self._narrow_cache[key] = df
        return df

    def _keyed_all(self, max_seq: int) -> DataFrame:
        base = self.spark.read.parquet(self._base("keyed")).select(*KEYED_COLS)
        tail = self._tail("keyed", KEYED_COLS, max_seq)
        if tail is not None:
            base = base.unionByName(tail.select(*KEYED_COLS))
        # live tombstones hide deleted rows from EVERY keyed read —
        # batches applied in the deletion window can never form an edge
        # THROUGH a deleted vector (ghost bridge)
        return self._tomb_exclude(base, "vec_id", max_seq)

    # ---- tombstones -------------------------------------------------------
    def tomb_ids(self, max_seq: int) -> list[int]:
        """All tombstoned vec_ids (bases + twins) visible at
        ``max_seq`` — the union over LIVE tombstone seqs; a compaction
        re-clusters without them and folds the tombstones away.
        Driver-side by design: a tombstone batch is takedown-sized
        (same order as an ingest batch). Corpus-scale deletions should
        re-seed on the filtered corpus instead."""
        meta = self._root_meta()
        if meta is None:
            return []
        key = (meta["gen"], max_seq)
        hit = self._tomb_cache.get(key)
        if hit is not None:
            return hit
        ids: set[int] = set()
        for seq in range(self.upto_seq + 1, max_seq + 1):
            m = self._seq_meta(seq)
            if m is None:  # incomplete tail — stop (readers never pass it)
                break
            if m.get("kind") == "tombstone":
                ids.update(
                    r["vec_id"]
                    for r in self.spark.read.parquet(
                        f"{self._seq_dir(seq)}/tomb"
                    ).collect()
                )
        out = sorted(ids)
        self._tomb_cache[key] = out
        return out

    def _tomb_exclude(self, df: DataFrame, col: str, max_seq: int) -> DataFrame:
        ids = self.tomb_ids(max_seq)
        if not ids:
            return df
        if len(ids) <= _ISIN_MAX:
            _set_in_threshold(self.spark)
            return df.filter(~F.col(col).isin(ids))
        ids_df = self.spark.createDataFrame(
            ((i,) for i in ids), f"{col} bigint"
        )
        return df.join(F.broadcast(ids_df), col, "left_anti")

    def apply_tombstones(self, vec_ids) -> dict:
        """Delete vectors from the maintained index (takedowns /
        opt-outs — VERDICT r11 Next #6; the reference has no deletion
        path at all, append/MERGE only). Contract:

        - ``vec_ids`` are BASE ids; their synthesized twins
          (vec_id + TWIN_OFFSET) are tombstoned with them.
        - Immediately after: every fold/lookup/keyed/boundary read
          excludes the ids, and families whose CANONICAL was deleted
          relabel to their min REMAINING member through the standard
          composed-remap mechanism (one narrow fold scan per
          assignment at delete time, never per read).
        - WINDOW semantics (until the next compact): labels can be
          COARSER than a rebuild-without-deleted — a deleted BRIDGE's
          former family stays merged until re-clustered (folds can
          relabel but cannot SPLIT). Over-grouping only; a deleted id
          never resurfaces, and in-window batches compute edges
          against the filtered keyed corpus. Boundary sets of touched
          families may also be thinner than the true extremes in the
          window (deleted extremes are hidden, interior members are
          not in the stored boundary corpus) — a bounded in-window
          recall dip for NEW arrivals near the deleted rows, gone at
          compaction.
        - The next ``compact()`` re-clusters the remaining keyed rows
          with the full two-pass machinery and commits a generation
          EQUAL to the full rebuild on corpus-minus-deleted
          (equality-tested in tests/test_nd_store_tombstones.py).
        - Corpus-TABLE rows are the owner's to delete (lakehouse
          DELETE); the store never reads deleted vectors again either
          way, but tier derivation (corpus_count) drifts if deleted
          rows accumulate there — see docs/SCALE.md.

        Idempotent across crash/replay exactly like an ingest batch:
        the tombstone set's content fingerprint rides the seq meta.

        Version note for MIXED-VERSION reader fleets: a pre-deletion
        reader does not know to filter ``tomb`` ids and would
        resurface deleted rows from the base artifacts. This sandbox
        runs one code version; a rolling production deployment must
        bump ``LAYOUT`` when enabling deletion so older readers fail
        loudly (stale-layout error) instead of reading deleted data."""
        base = sorted({int(v) for v in vec_ids})
        if not base:
            return {"skipped": True, "reason": "empty"}
        ids = sorted({*base, *(v + S.TWIN_OFFSET for v in base)})
        fp = "tomb:" + hashlib.sha256(
            json.dumps(ids).encode()
        ).hexdigest()[:32]
        meta = self._root_meta() or {}
        latest = self.latest_seq()
        if meta.get("last_fp") == fp and latest == self.upto_seq:
            return {"skipped": True, "seq": latest, "reason": "folded replay"}
        if latest > self.upto_seq:
            lmeta = self._seq_meta(latest)
            if lmeta and lmeta.get("batch_fp") == fp:
                return {"skipped": True, "seq": latest, "reason": "seq replay"}
        seq = latest + 1
        remaps: dict[str, dict[int, int]] = {}
        for which in ("p1", "final"):
            fold = self._fold(which, latest)
            # dead canonicals (the canonical id itself is deleted) ->
            # min remaining member; bounded collect (<= |ids| rows)
            dead = self._ids_filtered(fold, "canonical_id", ids)
            if len(ids) <= _ISIN_MAX:
                survivors = dead.filter(~F.col("vec_id").isin(ids))
            else:
                ids_df = self.spark.createDataFrame(
                    ((i,) for i in ids), "vec_id bigint"
                )
                survivors = dead.join(
                    F.broadcast(ids_df), "vec_id", "left_anti"
                )
            remaps[which] = {
                r["canonical_id"]: r["m"]
                for r in survivors.groupBy("canonical_id")
                .agg(F.min("vec_id").alias("m"))
                .collect()
            }
        self.write_tombstone_seq(
            seq, fp, ids, remaps["p1"], remaps["final"]
        )
        return {
            "seq": seq, "n_tomb": len(ids),
            "p1_relabels": len(remaps["p1"]),
            "final_relabels": len(remaps["final"]),
        }

    def write_tombstone_seq(
        self,
        seq: int,
        batch_fp: str,
        tomb_ids: list[int],
        p1_remap: dict[int, int],
        final_remap: dict[int, int],
    ) -> None:
        """A tombstone seq is a standard seq dir whose row artifacts
        are EMPTY (so every existing multi-path reader works
        unchanged) plus a ``tomb/`` id list; the relabels ride the
        ordinary remap slots in meta. meta.json last, as always."""
        d = self._seq_dir(seq)
        empty_keyed = (
            self.spark.read.parquet(self._base("keyed"))
            .select(*KEYED_COLS).limit(0)
        )
        empty_keyed.write.mode("overwrite").parquet(f"{d}/keyed")
        empty_keyed.withColumn("__fam", F.col("vec_id")).select(
            *P2B_COLS
        ).write.mode("overwrite").parquet(f"{d}/p2b_new")
        for name in ("p1_new", "final_new"):
            self.spark.createDataFrame(
                self.spark.sparkContext.parallelize([], 1),
                "vec_id bigint, canonical_id bigint",
            ).write.mode("overwrite").parquet(f"{d}/{name}")
        self.spark.createDataFrame(
            self.spark.sparkContext.parallelize(
                [(i,) for i in tomb_ids], 1
            ),
            "vec_id bigint",
        ).write.mode("overwrite").parquet(f"{d}/tomb")
        fsops.write_text_atomic(
            f"{d}/meta.json",
            json.dumps({
                "seq": seq,
                "batch_fp": batch_fp,
                "kind": "tombstone",
                "n_tomb": len(tomb_ids),
                "p1_remap": {str(k): v for k, v in p1_remap.items()},
                "final_remap": {str(k): v for k, v in final_remap.items()},
                "n_p1_new": 0,
                "n_final_new": 0,
            }),
            self.spark,
        )
        self._meta_cache.pop(seq, None)
        self._composed_cache.clear()
        self._tomb_cache.clear()
        self._drop_tails(from_seq=seq)

    def _ids_filtered(
        self, df: DataFrame, col: str, ids: list[int]
    ) -> DataFrame:
        """Point-lookup filter with a size switch: small lists become
        IN predicates (parquet row-group pruning against the sorted
        base); big lists become a broadcast semi-join (a giant IN's
        literal tree costs more to plan than the full narrow scan it
        would save — measured 20 s for 33k literals at sf1)."""
        if len(ids) <= _ISIN_MAX:
            # the pushdown threshold must be in force when this lazy
            # read EXECUTES — set it here (the maintenance session's
            # conf), never in __init__ (reader sessions stay untouched)
            _set_in_threshold(self.spark)
            return df.filter(F.col(col).isin(ids))
        ids_df = self.spark.createDataFrame(
            ((i,) for i in ids), f"{col} bigint"
        )
        return df.join(F.broadcast(ids_df), col, "left_semi")

    def keyed_for_buckets(
        self, tbuckets: list[tuple[int, int]], max_seq: int
    ) -> DataFrame:
        """ALL current rows of the given (t, bucket) groups — the
        full-bucket member sets the chain kernel re-ranks. One pruned
        read per TABLE (t = leading sort key prunes to the table's
        range; the per-table bucket IN-list stays small enough to push
        down even when the combined list would not), unioned — the
        per-table predicate is already exact, no residual join."""
        if not tbuckets:
            return self._keyed_all(max_seq).limit(0)
        return self._tb_filtered(self._keyed_all(max_seq), tbuckets)

    def _tb_filtered(
        self, src: DataFrame, tbuckets: list[tuple[int, int]]
    ) -> DataFrame:
        by_t: dict[int, list[int]] = {}
        for t, b in tbuckets:
            by_t.setdefault(t, []).append(b)
        out = None
        for t, bs in sorted(by_t.items()):
            part = self._ids_filtered(
                src.filter(F.col("t") == t), "bucket", sorted(set(bs))
            )
            out = part if out is None else out.unionByName(part)
        return out

    def buckets_of(self, ids: list[int], max_seq: int) -> list[tuple[int, int]]:
        """(t, bucket) pairs holding any of ``ids`` — narrow pruned
        read of the vec_id-sorted sidecar (+ the tiny seq keyed dirs)."""
        if not ids:
            return []
        src = self._narrow_base("keyed_idx")
        # the cached in-memory tail replaces a per-batch re-read of
        # every delta file (a per-seq read+union loop measured a
        # ~1.3 s/batch plan-growth climb; a fresh multi-path relation
        # per action still re-listed/re-footer-read N files per batch)
        tail = self._tail("keyed", KEYED_COLS, max_seq)
        if tail is not None:
            src = src.unionByName(tail.select("vec_id", "t", "bucket"))
        src = self._tomb_exclude(src, "vec_id", max_seq)
        rows = (
            self._ids_filtered(src.select("vec_id", "t", "bucket"),
                               "vec_id", ids)
            .select("t", "bucket")
            .distinct()
            .collect()
        )
        return [(r["t"], r["bucket"]) for r in rows]

    def assign_all_df(self, which: str, max_seq: int) -> DataFrame:
        """base ∪ delta rows with RAW (as-written) canonicals — callers
        compose ``composed_remap`` on top (DataFrame-side relabel for
        bulk consumers; _assign_lookup for bounded point-lookups)."""
        base = "p1" if which == "p1" else "final"
        out = self._narrow_base(base).select(*ASSIGN_COLS)
        tail = self._tail(f"{which}_new", ASSIGN_COLS, max_seq)
        if tail is not None:
            out = out.unionByName(tail.select(*ASSIGN_COLS))
        return self._tomb_exclude(out, "vec_id", max_seq)

    def composed_remap(self, which: str, max_seq: int) -> dict[int, int]:
        return dict(self._composed(which, max_seq))

    def _assign_lookup(
        self, which: str, ids: list[int], max_seq: int
    ) -> dict[int, int]:
        """Current canonical for each of ``ids`` PRESENT in the
        assignment (absent ids are singletons — callers coalesce).
        Pruned read of the vec_id-sorted base + the tiny delta dirs,
        then the composed remap driver-side."""
        if not ids:
            return {}
        raw = {
            r["vec_id"]: r["canonical_id"]
            for r in self._ids_filtered(
                self.assign_all_df(which, max_seq), "vec_id", ids
            ).collect()
        }
        rm = self._composed(which, max_seq)
        return {v: rm.get(c, c) for v, c in raw.items()}

    def p1_lookup(self, ids: list[int], max_seq: int) -> dict[int, int]:
        return self._assign_lookup("p1", ids, max_seq)

    def final_lookup(self, ids: list[int], max_seq: int) -> dict[int, int]:
        return self._assign_lookup("final", ids, max_seq)

    def p1_members(self, canonicals: set[int], max_seq: int) -> list[int]:
        """vec_ids of every CURRENT member of the given (current)
        canonical families. Base rows carry seed-time canonicals, so
        the filter list is the PREIMAGE of the requested set under the
        composed remap — pruned against the canonical-sorted base
        copy."""
        if not canonicals:
            return []
        rm = self._composed("p1", max_seq)
        pre = set(canonicals) | {
            old for old, cur in rm.items() if cur in canonicals
        }
        src = self._narrow_base("p1_bycan").select(*ASSIGN_COLS)
        tail = self._tail("p1_new", ASSIGN_COLS, max_seq)
        if tail is not None:
            src = src.unionByName(tail.select(*ASSIGN_COLS))
        src = self._tomb_exclude(src, "vec_id", max_seq)
        rows = (
            self._ids_filtered(src, "canonical_id", sorted(pre))
            .select("vec_id")
            .collect()
        )
        return [r["vec_id"] for r in rows]

    # ---- boundary (pass-2) corpus reads ----------------------------------
    def _relabel_fam(self, df: DataFrame, rm: dict[int, int]) -> DataFrame:
        if not rm:
            return df
        rm_df = self.spark.createDataFrame(
            list(rm.items()), "__old bigint, __new bigint"
        )
        return (
            df.join(F.broadcast(rm_df), df["__fam"] == F.col("__old"), "left")
            .withColumn("__fam", F.coalesce(F.col("__new"), F.col("__fam")))
            .drop("__old", "__new")
        )

    def _p2b_seq_rows(self, max_seq: int) -> DataFrame | None:
        """Delta boundary rows with their writing seq attached — the
        cached in-memory tail (which carries ``__seq`` natively)."""
        return self._tail("p2b_new", P2B_COLS, max_seq)

    def _p2b_base(self) -> DataFrame:
        return self.spark.read.parquet(self._base("p2b")).withColumn(
            "__seq", F.lit(self.upto_seq)
        )

    def _p2b_current(
        self, src: DataFrame, max_seq: int,
        post_remap: dict[int, int] | None = None,
    ) -> DataFrame:
        """The CURRENT boundary rows among ``src``: relabel stored
        ``__fam`` through the composed store remap, keep only the
        latest-writing seq's rows per (t, bucket, fam) group — exact
        because every merge rewrites ALL constituent families' groups
        (see module docstring) — then optionally relabel to the
        caller's post-batch labels (applied AFTER latest-wins: group
        identity at read time is the store's, not the in-flight
        batch's)."""
        src = self._tomb_exclude(src, "vec_id", max_seq)
        src = self._relabel_fam(src, self._composed("p1", max_seq))
        w = Window.partitionBy("t", "bucket", "__fam")
        src = (
            src.withColumn("__mx", F.max("__seq").over(w))
            .filter(F.col("__seq") == F.col("__mx"))
            .drop("__mx", "__seq")
        )
        return self._relabel_fam(src, post_remap or {})

    def p2b_for_buckets(
        self, tbuckets: list[tuple[int, int]], max_seq: int,
        post_remap: dict[int, int] | None = None,
    ) -> DataFrame:
        """Current boundary rows of the given (t, bucket) groups — the
        pass-2 bucket context. Pruned read of the (t, bucket)-sorted
        base copy plus the tiny delta dirs."""
        if not tbuckets:
            return self._p2b_base().drop("__seq").limit(0)
        src = self._tb_filtered(self._p2b_base(), tbuckets)
        seqs = self._p2b_seq_rows(max_seq)
        if seqs is not None:
            src = src.unionByName(self._tb_filtered(seqs, tbuckets))
        return self._p2b_current(src, max_seq, post_remap)

    def p2b_for_fams(
        self, fams: set[int], max_seq: int,
        post_remap: dict[int, int] | None = None,
    ) -> DataFrame:
        """Current boundary rows of the given (current-canonical)
        families — pruned against the __fam-sorted base copy via the
        composed remap's preimage, exactly like p1_members."""
        if not fams:
            return self._p2b_base().drop("__seq").limit(0)
        rm = self._composed("p1", max_seq)
        pre = sorted(
            set(fams) | {old for old, cur in rm.items() if cur in fams}
        )
        base = self.spark.read.parquet(
            self._base("p2b_byfam")
        ).withColumn("__seq", F.lit(self.upto_seq))
        src = self._ids_filtered(base, "__fam", pre)
        seqs = self._p2b_seq_rows(max_seq)
        if seqs is not None:
            src = src.unionByName(self._ids_filtered(seqs, "__fam", pre))
        return self._p2b_current(src, max_seq, post_remap)

    def p2b_fold(self, max_seq: int | None = None) -> DataFrame:
        """The full current boundary corpus (compaction input)."""
        if max_seq is None:
            max_seq = self.latest_seq()
        src = self._p2b_base()
        seqs = self._p2b_seq_rows(max_seq)
        if seqs is not None:
            src = src.unionByName(seqs)
        return self._p2b_current(src, max_seq)

    def _fold(self, which: str, max_seq: int) -> DataFrame:
        base = "p1" if which == "p1" else "final"
        paths = [self._base(base)] + self._seq_paths(f"{which}_new", max_seq)
        df = self._tomb_exclude(
            self.spark.read.parquet(*paths), "vec_id", max_seq
        )
        rm = self._composed(which, max_seq)
        if not rm:
            return df.select(*ASSIGN_COLS)
        rm_df = self.spark.createDataFrame(
            list(rm.items()), "__old bigint, __new bigint"
        )
        return df.join(
            F.broadcast(rm_df), df.canonical_id == F.col("__old"), "left"
        ).select(
            "vec_id",
            F.coalesce(F.col("__new"), F.col("canonical_id")).alias(
                "canonical_id"
            ),
        )

    def p1_fold(self, max_seq: int | None = None) -> DataFrame:
        return self._fold(
            "p1", self.latest_seq() if max_seq is None else max_seq
        )

    def final_fold(self, max_seq: int | None = None) -> DataFrame:
        return self._fold(
            "final", self.latest_seq() if max_seq is None else max_seq
        )
