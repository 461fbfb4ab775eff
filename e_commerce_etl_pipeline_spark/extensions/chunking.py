"""Document chunking and corpus-wide exact-span dedup-with-rewrite.

Two training-data-preparation operators over the documents table:

- ``chunk_documents``: overlapping fixed-size token-window chunking
  (the standard context-window / RAG-passage prep step): every
  document is cut into CHUNK_W-token windows advancing by STRIDE_W
  tokens, so consecutive chunks share CHUNK_W - STRIDE_W tokens of
  context. Pure map + explode — ZERO shuffles at any corpus size.

- ``segment_dedup_docs``: the published exact-substring-dedup recipe
  (Lee et al. 2022, "Deduplicating Training Data Makes Language
  Models Better") realized at fixed segment granularity, and — unlike
  the detection-only ``text.duplicate_chunk_spans`` — it REWRITES the
  corpus: every SEG_W-token segment that already occurred earlier in
  the corpus (first occurrence = lowest (doc_id, seg_idx)) is removed,
  and each document is reassembled from its surviving segments.

Both stay entirely in JVM built-ins (split / slice / array_join /
md5 / posexplode) — no Python UDFs, full whole-stage codegen.

Scale shape (100 TB):
- chunking is embarrassingly parallel: tokens are materialized once
  per doc as an array, windows are array slices — output rows ≈
  tokens / STRIDE_W, no exchange anywhere;
- segment dedup is TWO linear shuffles, never pairwise: (1) hash-
  aggregate keyed on the segment text — keep-first resolved INSIDE
  the aggregate via the packed key min(doc_id·10^9 + seg_idx) (the
  same mutable-agg-buffer device as dedup_keep_newest — no window
  sort, no join-back of the occurrence table; see the function
  docstring for why the key is the text, not its md5), (2) hash-
  aggregate by doc_id to reassemble. A segment shared by k documents
  costs k rows through one exchange, not k² comparisons.
- the packed keeper key requires doc_id < 2^63 / 10^9 ≈ 9.2·10^9 and
  < 10^9 segments per document — asserted nowhere because the corpus
  generator's ids are dense from 0 (sf100 ≈ 5·10^6 docs); callers
  beyond that re-widen PACK exactly like dedup_keep_newest's shift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.queries import load_table

# token-window chunking: 32-token chunks, 24-token stride (8 overlap)
CHUNK_W = 32
STRIDE_W = 24

# exact-span dedup granularity (Lee et al. use 50 BPE tokens on web
# text; the synthetic corpus averages ~54 words/doc, so 16 keeps
# multiple segments per document)
SEG_W = 16

# packed keep-first key: doc_id * PACK + seg_idx (see module docstring)
PACK = 10**9


def _words(text: Column) -> Column:
    """Whitespace tokenization of lowercased text — identical to
    text.words_col / tfidf.term_frequencies so chunk and segment
    boundaries line up with every other token-level operator."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def _nonempty_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", _words(F.col("text")).alias("w"))
        # split('') yields [''] — drop genuinely tokenless docs
        .filter(F.element_at(F.col("w"), 1) != "")
    )


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_idx, chunk_start, n_tokens, chunk_text,
    chunk_hash): overlapping CHUNK_W-token windows at STRIDE_W-token
    stride. Chunk count per doc is 1 + ceil(max(n - CHUNK_W, 0) /
    STRIDE_W) — full coverage, the final window may be short (slice
    clips at the document end), and no window starts past the end.
    ``chunk_start`` is the 1-based token offset; ``chunk_hash`` is the
    md5 content id chunk-level dedup/decontamination joins on."""
    base = _nonempty_docs(spark, sf_dir)
    # integer ceil-div keeps the chunk count exact cross-engine (the
    # repo's no-float-log/ceil discipline): (max(n-C,0)+S-1) div S
    n_extra = F.expr(
        f"(greatest(size(w) - {CHUNK_W}, 0) + {STRIDE_W - 1}) div {STRIDE_W}"
    )
    starts = F.transform(
        F.sequence(F.lit(0).cast("long"), n_extra),
        lambda i: i * STRIDE_W + 1,
    )
    chunk = F.slice(F.col("w"), F.col("chunk_start").cast("int"), CHUNK_W)
    return (
        base.select(
            "doc_id",
            "w",
            F.posexplode(starts).alias("chunk_idx", "chunk_start"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            "chunk_start",
            F.size(chunk).cast("long").alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
        .withColumn("chunk_hash", F.md5(F.col("chunk_text")))
    )


CHUNK_DOCUMENTS_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS words
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
), starts AS (
  SELECT doc_id, words,
         UNNEST(generate_series(
           0, (greatest(len(words) - {CHUNK_W}, 0) + {STRIDE_W - 1}) // {STRIDE_W}
         )) AS chunk_idx
  FROM w
)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(chunk_idx * {STRIDE_W} + 1 AS BIGINT) AS chunk_start,
       CAST(len(words[chunk_idx * {STRIDE_W} + 1 : chunk_idx * {STRIDE_W} + {CHUNK_W}])
            AS BIGINT) AS n_tokens,
       array_to_string(words[chunk_idx * {STRIDE_W} + 1 : chunk_idx * {STRIDE_W} + {CHUNK_W}],
                       ' ') AS chunk_text,
       md5(array_to_string(words[chunk_idx * {STRIDE_W} + 1 : chunk_idx * {STRIDE_W} + {CHUNK_W}],
                           ' ')) AS chunk_hash
FROM starts
"""


def segment_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact-span dedup WITH document rewrite: cut every
    document into consecutive SEG_W-token segments, keep only the
    corpus-FIRST occurrence of each distinct segment (lowest
    (doc_id, seg_idx) — also dedups repeats WITHIN a document), and
    reassemble each document from its surviving segments in order.

    Output: (doc_id, n_segments, kept_segments, removed_segments,
    deduped_text). A document whose every segment already occurred
    earlier disappears entirely — that is the operator's point: the
    first document of a clone family keeps its full text, later clones
    lose exactly the repeated spans (cf. ``text.duplicate_chunk_spans``
    which only REPORTS the shared spans).

    Plan: hash-aggregate keyed DIRECTLY on the segment text with the
    packed min(doc_id·PACK + seg_idx) keeper key. Grouping on the text
    (not its md5) is deliberate plan engineering: grouping KEYS may be
    var-length, but agg BUFFERS must be fixed-width for
    HashAggregateExec — a `min_by(seg_text, pack)` under an md5 key
    carries a string buffer and Spark falls back to Sort+SortAggregate
    on both sides of the exchange (observed on 4.1.2). With the text
    as the key the buffers are three BIGINTs → pure HashAggregate, no
    sorts, no occurrence-table join-back — and exact-span semantics
    with no hash-collision caveat. Reassembly is one more
    hash-aggregate by doc_id with an in-aggregate
    array_sort(collect_list(struct(seg_idx, text)))."""
    segs = segment_rows(_nonempty_docs(spark, sf_dir))
    return reassemble_docs(keep_first_segments(segs))


def segment_rows(base: DataFrame) -> DataFrame:
    """(doc_id, n_seg, seg_idx, seg_text) — every consecutive
    SEG_W-token segment of a (doc_id, w: array<string>) frame. Shared
    by the batch operator and the streaming span-dedup path."""
    n_seg = F.expr(f"(size(w) + {SEG_W - 1}) div {SEG_W}")
    seg_texts = F.transform(
        F.sequence(F.lit(0).cast("long"), n_seg - 1),
        lambda i: F.array_join(
            F.slice(F.col("w"), (i * SEG_W + 1).cast("int"), SEG_W), " "
        ),
    )
    return base.select(
        "doc_id",
        n_seg.alias("n_seg"),
        F.posexplode(seg_texts).alias("seg_idx", "seg_text"),
    )


def tokenized_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, w) for non-empty documents of any (doc_id, text, ...)
    frame — the streaming-batch counterpart of _nonempty_docs."""
    return (
        docs.filter(F.col("text").isNotNull())
        .select("doc_id", _words(F.col("text")).alias("w"))
        .filter(F.element_at(F.col("w"), 1) != "")
    )


def keep_first_segments(segs: DataFrame) -> DataFrame:
    """Keep-first resolution: one row per DISTINCT segment text, at its
    lowest (doc_id, seg_idx). Pure HashAggregate (see
    segment_dedup_docs docstring). Output: (doc_id, seg_idx, seg_text,
    n_seg)."""
    pack = F.col("doc_id") * F.lit(PACK) + F.col("seg_idx")
    kept = segs.groupBy("seg_text").agg(
        F.min(pack).alias("keeper"),
        F.min_by("n_seg", pack).alias("n_seg"),
    )
    return kept.select(
        F.expr(f"keeper div {PACK}").alias("doc_id"),
        F.pmod(F.col("keeper"), F.lit(PACK)).alias("seg_idx"),
        "seg_text",
        "n_seg",
    )


def reassemble_docs(decoded: DataFrame) -> DataFrame:
    """Rebuild (doc_id, n_segments, kept_segments, removed_segments,
    deduped_text) from surviving (doc_id, seg_idx, seg_text, n_seg)
    rows — in-aggregate ordered reassembly, one hash aggregate."""
    return (
        decoded.groupBy("doc_id")
        .agg(
            F.max("n_seg").alias("n_segments"),
            F.count(F.lit(1)).alias("kept_segments"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seg_idx", "seg_text"))
                    ),
                    lambda x: x["seg_text"],
                ),
                " ",
            ).alias("deduped_text"),
        )
        .select(
            "doc_id",
            "n_segments",
            "kept_segments",
            (F.col("n_segments") - F.col("kept_segments")).alias(
                "removed_segments"
            ),
            "deduped_text",
        )
    )


SEGMENT_DEDUP_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS words
  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
), seg AS (
  SELECT doc_id,
         (len(words) + {SEG_W - 1}) // {SEG_W} AS n_seg,
         UNNEST(generate_series(0, (len(words) + {SEG_W - 1}) // {SEG_W} - 1)) AS seg_idx,
         UNNEST(list_transform(
           generate_series(0, (len(words) + {SEG_W - 1}) // {SEG_W} - 1),
           i -> array_to_string(words[i * {SEG_W} + 1 : i * {SEG_W} + {SEG_W}], ' ')
         )) AS seg_text
  FROM w
), kept AS (
  SELECT seg_text,
         min(doc_id * {PACK} + seg_idx) AS keeper,
         min_by(n_seg, doc_id * {PACK} + seg_idx) AS n_seg
  FROM seg GROUP BY 1
), decoded AS (
  SELECT keeper // {PACK} AS doc_id, keeper % {PACK} AS seg_idx, seg_text, n_seg
  FROM kept
)
SELECT doc_id,
       CAST(max(n_seg) AS BIGINT) AS n_segments,
       CAST(count(*) AS BIGINT) AS kept_segments,
       CAST(max(n_seg) - count(*) AS BIGINT) AS removed_segments,
       string_agg(seg_text, ' ' ORDER BY seg_idx) AS deduped_text
FROM decoded GROUP BY doc_id
"""


EXT_QUERIES = {
    "chunk_documents": (chunk_documents, CHUNK_DOCUMENTS_SQL),
    "segment_dedup_docs": (segment_dedup_docs, SEGMENT_DEDUP_SQL),
}
