"""Dataset-curation operators for training-data pipelines: deterministic
stratified sampling and per-group token-budget selection over the
documents table.

Both are pure column programs (no Python UDFs) and both are
deterministic — ordering keys are content hashes / unique ids, never
rand() — so the same corpus always yields the same sample, the oracle
hash-matches, and a re-run after failure selects identical rows (the
property that makes sampling safe inside an idempotent upsert pipeline,
SURVEY.md §2.8 ST3).

Scale notes (100 TB):
- ``stratified_lang_sample`` uses rank-by-hash ≤ quota per language.
  Spark 4's WindowGroupLimit rule rewrites rank-filter windows into
  per-partition partial top-k before the shuffle, so a dominant language
  (English is ~half of web corpora) never funnels its full document set
  through one reducer — only ~quota rows per map task survive.
- ``token_budget_sample`` (cumulative token sum ≤ budget per language)
  is inherently a prefix scan per group; the same WindowGroupLimit
  shape does not apply, but the hash-rank pre-filter bounds the rows
  entering the window at quota × partitions, which is what keeps the
  unavoidable per-group ordered pass small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.queries import load_table
from .text import token_count

SAMPLE_QUOTA = 40          # docs per language
TOKEN_BUDGET = 2_000       # whitespace tokens per language


def stratified_lang_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language quota sample: rank documents inside
    each language by md5(doc_id) (a uniform, content-independent shuffle
    order both engines compute identically) and keep the first
    SAMPLE_QUOTA."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= SAMPLE_QUOTA)
    )


STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, sample_rank
FROM (
  SELECT doc_id, lang,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY md5(CAST(doc_id AS STRING)), doc_id
         ) AS BIGINT) AS sample_rank
  FROM documents
)
WHERE sample_rank <= {SAMPLE_QUOTA}
"""


def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language token-budget selection: walk documents in a
    deterministic preference order (longest first, doc_id tie-break) and
    keep each document whose running token total still fits
    TOKEN_BUDGET. The running total uses an explicit ROWS frame — with a
    unique ordering key RANGE and ROWS agree, but ROWS is the contract
    both engines implement identically."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
    )


TOKEN_BUDGET_SQL = f"""
SELECT doc_id, lang, n_tokens, cum_tokens
FROM (
  SELECT doc_id, lang, n_tokens,
         CAST(SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY n_chars DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum_tokens
  FROM (
    SELECT doc_id, lang, n_chars,
           CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tokens
    FROM documents
  )
)
WHERE cum_tokens <= {TOKEN_BUDGET}
"""


QUALITY_THRESHOLD = 0.7


def quality_filter_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus quality-filter step as a first-class op: per
    (lang, source), documents and tokens kept vs dropped at the
    QUALITY_THRESHOLD. One scan, one shuffle on the tiny group key —
    the shape of a 100 TB filter report (the filtered corpus itself is
    the same predicate applied in a select)."""
    from .text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    keep = quality_score(F.col("text")) >= QUALITY_THRESHOLD
    n_tok = token_count(F.col("text")).cast("long")
    return docs.groupBy("lang", "source").agg(
        F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(~keep, 1).otherwise(0)).alias("n_dropped"),
        F.sum(F.when(keep, n_tok).otherwise(F.lit(0))).alias("tokens_kept"),
    )


def _quality_sql_expr() -> str:
    # mirror of text.TEXT_STATS_SQL's quality expression
    from .text import STOPWORDS

    stop_in = ",".join(f"'{w}'" for w in STOPWORDS)
    return f"""(least(CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE) / 50.0, 1.0)
        + least(CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), w -> w IN ({stop_in}))) AS DOUBLE)
                / CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE) * 5.0, 1.0)
        + CASE WHEN CAST(length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS DOUBLE)
                    / CAST(length(text) AS DOUBLE) <= 0.1 THEN 1.0 ELSE 0.5 END) / 3.0"""


def _quality_filter_sql() -> str:
    return f"""
SELECT lang, source,
       CAST(SUM(CASE WHEN {_quality_sql_expr()} >= {QUALITY_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN {_quality_sql_expr()} >= {QUALITY_THRESHOLD} THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN {_quality_sql_expr()} >= {QUALITY_THRESHOLD}
            THEN CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) ELSE 0 END) AS BIGINT) AS tokens_kept
FROM documents
GROUP BY 1, 2
"""


# PII patterns chosen to mean the same thing in Java regex (Spark) and
# RE2 (DuckDB): character classes, bounded repetition, no lookaround.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\+[0-9][0-9 -]{7,}[0-9]"


def redact_pii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over a corpus with deterministically injected
    contact lines (every 10th doc — the synthetic texts contain no PII,
    so the op must plant what it scrubs, same trick as the mutated
    near-dup corpus). Emails then phones are replaced by placeholder
    tags; output is flags + redacted-content fingerprint, all JVM-side
    regex — the 100 TB path is this exact select."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    injected = F.when(
        F.col("doc_id") % 10 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 555 123 4567"),
        ),
    ).otherwise(F.col("text"))
    with_pii = docs.select("doc_id", injected.alias("text"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), EMAIL_RE, "[EMAIL]"),
        PHONE_RE, "[PHONE]",
    )
    return with_pii.select(
        "doc_id",
        (F.col("text") != redacted).alias("had_pii"),
        F.md5(redacted).alias("redacted_fp"),
        F.length(redacted).cast("long").alias("n_chars_redacted"),
    )


REDACT_PII_SQL = f"""
WITH with_pii AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0
              THEN text || ' contact user' || CAST(doc_id AS STRING) || '@example.com or +1 555 123 4567'
              ELSE text END AS text
  FROM documents
), red AS (
  SELECT doc_id, text,
         regexp_replace(regexp_replace(text, '{EMAIL_RE}', '[EMAIL]', 'g'),
                        '{PHONE_RE}', '[PHONE]', 'g') AS redacted
  FROM with_pii
)
SELECT doc_id, text <> redacted AS had_pii, md5(redacted) AS redacted_fp,
       CAST(length(redacted) AS BIGINT) AS n_chars_redacted
FROM red
"""


# Target pre-training mixture over sources, as integer "parts" (the
# ratio 8:4:2:1). Integer parts keep every quota computation exact in
# both engines: u = min_s(count_s div parts_s), quota_s = parts_s * u is
# the LARGEST sample with exactly this mixture (no source can supply
# more than count_s docs). Sources absent from the map are excluded.
MIXTURE_PARTS = {"src0": 8, "src1": 4, "src2": 2, "src3": 1}


def source_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling: draw the largest sample whose source
    composition matches MIXTURE_PARTS exactly, deterministically
    (md5(doc_id) shuffle order within each source, like
    ``stratified_lang_sample``). 100 TB shape: the corpus shuffles ONCE
    by source for the ranking window; quotas come from a tiny per-source
    count aggregate broadcast back. The rank bound is data-driven
    (a column, not a literal), so the WindowGroupLimit partial-top-k
    rewrite doesn't apply — the window is still a single streaming pass
    per source partition."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    parts = F.lit(None).cast("long")
    for src, p in MIXTURE_PARTS.items():
        parts = F.when(F.col("source") == src, F.lit(p).cast("long")).otherwise(parts)
    d = docs.filter(F.col("source").isin(*MIXTURE_PARTS)).withColumn("parts", parts)
    counts = d.groupBy("source", "parts").agg(F.count(F.lit(1)).alias("n"))
    u = counts.agg(F.min(F.expr("n DIV parts")).alias("u"))
    quotas = counts.crossJoin(F.broadcast(u)).select(
        "source", (F.col("parts") * F.col("u")).cast("long").alias("quota")
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = d.withColumn("sample_rank", F.row_number().over(w).cast("long"))
    return (
        ranked.join(F.broadcast(quotas), "source")
        .filter(F.col("sample_rank") <= F.col("quota"))
        .select("doc_id", "source", "lang", "sample_rank", "quota")
    )


def _mixture_sql() -> str:
    values = ",".join(f"('{s}', {p})" for s, p in MIXTURE_PARTS.items())
    return f"""
WITH wt AS (SELECT * FROM (VALUES {values}) AS t(source, parts)),
counts AS (
  SELECT d.source, wt.parts, COUNT(*) AS n
  FROM documents d JOIN wt ON d.source = wt.source
  GROUP BY d.source, wt.parts
), u AS (
  SELECT MIN(n // parts) AS u FROM counts
), q AS (
  SELECT counts.source, CAST(counts.parts * u.u AS BIGINT) AS quota FROM counts, u
), ranked AS (
  SELECT d.doc_id, d.source, d.lang,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY d.source ORDER BY md5(CAST(d.doc_id AS STRING)), d.doc_id
         ) AS BIGINT) AS sample_rank
  FROM documents d JOIN wt ON d.source = wt.source
)
SELECT r.doc_id, r.source, r.lang, r.sample_rank, q.quota
FROM ranked r JOIN q ON r.source = q.source
WHERE r.sample_rank <= q.quota
"""


def dedup_aware_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation step every real pipeline runs: resolve
    near-dup clusters, keep only each cluster's HIGHEST-QUALITY member
    (dedup_canonical_best's policy), then draw the deterministic
    per-language quota sample from the survivors. Population is the
    near-dup corpus (documents ∪ planted mutations, language inherited
    from the source doc) — the survivors are a real mix of originals and
    mutations (whichever scored higher), so the sample demonstrably
    differs from sampling the raw corpus. Composition of the cached
    cluster/selection artifacts with the hash-rank sampler: one
    anti-join plus the one sampling shuffle."""
    from .components import dedup_canonical_best, dedup_clusters
    from .dedup_fuzzy import _mutated_corpus

    corpus = _mutated_corpus(spark, sf_dir).select("doc_id")
    langs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("__real_id"), "lang"
    )
    pop = corpus.join(
        F.broadcast(langs),
        corpus.doc_id % 1_000_000 == F.col("__real_id"),
    ).select("doc_id", "lang")
    members = dedup_clusters(spark, sf_dir)
    best = dedup_canonical_best(spark, sf_dir).select(
        F.col("canonical_doc_id"), F.col("best_doc_id")
    )
    losers = (
        members.join(best, "canonical_doc_id")
        .filter(F.col("doc_id") != F.col("best_doc_id"))
        .select("doc_id")
    )
    kept = pop.join(losers, "doc_id", "left_anti")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        kept.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= SAMPLE_QUOTA)
    )


def _dedup_aware_sample_sql() -> str:
    from .components import _dedup_canonical_best_sql, _dedup_clusters_sql

    return f"""
WITH best_t AS ({_dedup_canonical_best_sql().strip()}),
pop AS (
  SELECT c.doc_id, d.lang
  FROM (
    SELECT doc_id FROM documents
    UNION ALL
    SELECT doc_id + 1000000 FROM documents
  ) c JOIN documents d ON c.doc_id % 1000000 = d.doc_id
),
clusters2 AS ({_dedup_clusters_sql().strip()}),
losers AS (
  SELECT m.doc_id
  FROM clusters2 m JOIN best_t b ON m.canonical_doc_id = b.canonical_doc_id
  WHERE m.doc_id <> b.best_doc_id
),
kept AS (
  SELECT p.doc_id, p.lang FROM pop p
  WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = p.doc_id)
)
SELECT doc_id, lang, sample_rank
FROM (
  SELECT doc_id, lang,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY md5(CAST(doc_id AS STRING)), doc_id
         ) AS BIGINT) AS sample_rank
  FROM kept
)
WHERE sample_rank <= {SAMPLE_QUOTA}
"""


# Sequence packing: concat-then-chunk document placement for training
# batches. SEQ_LEN is the packed sequence length in whitespace tokens;
# PACK_BUCKET is the coarse-bucket width (docs per bucket) of the
# two-level prefix scan.
SEQ_LEN = 256
PACK_BUCKET = 100


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: lay every document out on one
    global token tape (corpus order = doc_id) and record, per document,
    its start offset, the SEQ_LEN-token training sequence its first
    token lands in, and whether it straddles a sequence boundary — the
    bookkeeping an LLM data loader needs to pack fixed-length batches.

    The global running sum is NOT a single-partition window (the
    straggler customer_spend_deciles' docstring warns about): it is a
    two-level prefix scan —
    1. coarse buckets of PACK_BUCKET docs each get a LOCAL cumulative
       sum (window partitioned by bucket — parallel);
    2. per-bucket totals (corpus/PACK_BUCKET rows — metadata-sized)
       get their own tiny running sum, and the resulting bucket offsets
       broadcast-join back: global = bucket offset + local cumsum.
    At larger corpora PACK_BUCKET grows so level-2 stays metadata-sized
    (10^6-doc buckets keep a trillion-doc corpus at 10^6 offset rows);
    a third level repeats the trick if that ever overflows.

    All arithmetic is exact int64; the sequence id divides on doubles
    below 2^53 (a 100 TB corpus is ~10^13 tokens), so floor(x / L) is
    exact in both engines."""
    from .text import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    b = docs.withColumn("__b", F.expr(f"doc_id DIV {PACK_BUCKET}"))
    local_w = (
        Window.partitionBy("__b").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn("__cum", F.sum("n_tokens").over(local_w))
    totals = b.groupBy("__b").agg(F.sum("n_tokens").alias("__btot"))
    offset_w = (
        Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__btot").over(offset_w), F.lit(0))
    ).select("__b", "__off")
    placed = local.join(F.broadcast(offsets), "__b").select(
        "doc_id", "n_tokens",
        (F.col("__off") + F.col("__cum") - F.col("n_tokens")).alias("start_offset"),
    )
    seq = F.floor(F.col("start_offset") / F.lit(SEQ_LEN)).cast("long")
    end_seq = F.floor(
        (F.col("start_offset") + F.col("n_tokens") - 1) / F.lit(SEQ_LEN)
    ).cast("long")
    return placed.select(
        "doc_id", "n_tokens", "start_offset",
        seq.alias("seq_id"),
        (seq != end_seq).alias("crosses_boundary"),
    )


SEQUENCE_PACKING_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
), placed AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_offset
  FROM toks
)
SELECT doc_id, n_tokens, start_offset,
       CAST(FLOOR(start_offset / {SEQ_LEN}.0) AS BIGINT) AS seq_id,
       CAST(FLOOR(start_offset / {SEQ_LEN}.0) AS BIGINT)
         <> CAST(FLOOR((start_offset + n_tokens - 1) / {SEQ_LEN}.0) AS BIGINT)
         AS crosses_boundary
FROM placed
"""


# ---- leakage-safe train/val/test splitting --------------------------------

# 256 md5-derived buckets: < 230 train (89.8%), < 243 val (5.1%), rest
# test (5.1%). Two hex chars keep the bucket arithmetic cheap in both
# engines (the dedup_fuzzy strpos idiom on the DuckDB side).
SPLIT_TRAIN_LT = 230
SPLIT_VAL_LT = 243


def leakage_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment that cannot leak exact
    duplicates across splits: every document is keyed by its exact-dup
    CANONICAL (min doc_id of its md5(text) group) and the split bucket
    is hashed from the canonical, so byte-identical documents always
    co-travel. Splitting each doc independently — the naive
    hash(doc_id) % N that corpus_prep.train_val_split summarizes —
    puts ~10% of every duplicate family's copies into eval splits,
    which is precisely the train/test contamination decontamination
    pipelines exist to prevent (same failure class the n-gram overlap
    gate measures, one layer earlier).

    Scale shape: one hash aggregate over md5(text) (the exact-dedup
    shuffle) + one equi-join back on the digest (AQE broadcasts the
    group table when the distinct-text count allows); the split rule
    itself is pure arithmetic on the canonical — no window, no sort,
    nothing corpus-ordered."""
    docs = load_table(spark, sf_dir, "documents")
    # coalesce: md5(NULL) is NULL and a NULL digest never equi-joins, so
    # a null-text doc would silently vanish from the assignment (in both
    # engines — parity would hide it). NULL text groups with "" instead.
    c = docs.select(
        "doc_id", F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("h")
    )
    groups = c.groupBy("h").agg(F.min("doc_id").alias("canonical_id"))
    bucket = F.conv(
        F.substring(F.md5(F.col("canonical_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    return (
        c.join(groups, "h")
        .select(
            "doc_id", "canonical_id",
            F.when(bucket < SPLIT_TRAIN_LT, "train")
            .when(bucket < SPLIT_VAL_LT, "val")
            .otherwise("test")
            .alias("split"),
        )
    )


_SPLIT_BUCKET_SQL = (
    "(strpos('0123456789abcdef',"
    " substr(md5(CAST(canonical_id AS VARCHAR)), 1, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef',"
    " substr(md5(CAST(canonical_id AS VARCHAR)), 2, 1)) - 1)"
)

LEAKAGE_SAFE_SPLITS_SQL = f"""
WITH c AS (
  SELECT doc_id, md5(COALESCE(text, '')) AS h FROM documents
), g AS (
  SELECT h, MIN(doc_id) AS canonical_id FROM c GROUP BY h
), j AS (
  SELECT c.doc_id, g.canonical_id, {_SPLIT_BUCKET_SQL} AS b
  FROM c JOIN g USING (h)
)
SELECT doc_id, canonical_id,
       CASE WHEN b < {SPLIT_TRAIN_LT} THEN 'train'
            WHEN b < {SPLIT_VAL_LT} THEN 'val'
            ELSE 'test' END AS split
FROM j
"""


def near_dup_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment that cannot leak NEAR-duplicates
    across splits — the production-grade tier above
    ``leakage_safe_splits``: paraphrased / perturbed copies (cosine >=
    NEAR_DUP_COS on the document embedding) co-travel because the
    split bucket is hashed from the near-dup CLUSTER canonical
    (extensions.similarity.near_dup_clusters — the no-fence chain-link
    path). The EXACT-dup canonical (min doc_id per md5(text) group, the
    leakage_safe_splits rule) is resolved FIRST and the cluster lookup
    keys on it, so this tier is a strict superset of the exact tier:
    byte-identical documents share their exact canonical and therefore
    the same cluster lookup and the same split — even when their
    embeddings are missing, below NEAR_DUP_COS, or missed by the
    recall-imperfect chain-LSH. (Falling back to the doc's OWN id, the
    pre-r9 form, let an exact-dup pair straddle train/eval whenever one
    copy was absent from the cluster artifact.)

    Scale shape: one md5(text) hash aggregate + digest equi-join (the
    exact-dedup shuffle, shared shape with leakage_safe_splits), then
    one equi-join against the fingerprint-keyed stored cluster artifact
    (built once per corpus snapshot) plus row-local split arithmetic.
    The DuckDB oracle recomputes the clusters from scratch through the
    independent recursive-CTE transitive closure — the strongest
    cross-check in the registry applied to the split boundary."""
    from .similarity import near_dup_clusters

    docs = load_table(spark, sf_dir, "documents")
    clusters = near_dup_clusters(spark, sf_dir)
    # exact-dup canonical first (identical rule + NULL-grouping to
    # leakage_safe_splits) — the guarantee floor this tier builds on
    c = docs.select(
        "doc_id", F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("h")
    )
    g = c.groupBy("h").agg(F.min("doc_id").alias("exact_id"))
    exact = c.join(g, "h").select("doc_id", "exact_id")
    canonical = F.coalesce(F.col("canonical_id"), F.col("exact_id"))
    bucket = F.conv(
        F.substring(F.md5(canonical.cast("string")), 1, 2), 16, 10
    ).cast("int")
    return (
        exact
        .join(clusters, exact["exact_id"] == clusters["vec_id"], "left")
        .select(
            "doc_id",
            canonical.alias("canonical_id"),
            F.when(bucket < SPLIT_TRAIN_LT, "train")
            .when(bucket < SPLIT_VAL_LT, "val")
            .otherwise("test")
            .alias("split"),
        )
    )


def _near_dup_splits_sql() -> str:
    from .similarity import _ND_CLUSTERS_SQL, _ND_CORPUS_SQL, _PARAMS_SQL

    return f"""
WITH RECURSIVE {_PARAMS_SQL}, {_ND_CORPUS_SQL}, {_ND_CLUSTERS_SQL},
ec AS (
  SELECT doc_id, md5(COALESCE(text, '')) AS h FROM documents
), eg AS (
  SELECT h, MIN(doc_id) AS exact_id FROM ec GROUP BY h
), assigned AS (
  SELECT ec.doc_id, COALESCE(c.canonical_id, eg.exact_id) AS canonical_id
  FROM ec JOIN eg USING (h)
  LEFT JOIN nd_clusters c ON c.vec_id = eg.exact_id
), bucketed AS (
  SELECT doc_id, canonical_id, {_SPLIT_BUCKET_SQL} AS b FROM assigned
)
SELECT doc_id, canonical_id,
       CASE WHEN b < {SPLIT_TRAIN_LT} THEN 'train'
            WHEN b < {SPLIT_VAL_LT} THEN 'val'
            ELSE 'test' END AS split
FROM bucketed
"""


# ---- split-boundary contamination audit ------------------------------------


def split_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit the split boundary leakage_safe_splits just drew: for each
    eval split (val/test), how many of its documents still share at
    least one word 4-gram with ANY train-split document, and the doc
    fraction. Exact-dup families co-travel by construction, so what
    this measures is the RESIDUAL lexical overlap (partial copies,
    boilerplate, near-dups below the exact tier) — the number a
    decontamination pass would have to chase. The same gram artifact
    benchmark_contamination shuffles is reused (fingerprint-keyed), so
    the audit adds one split join and one semi-join, not a re-shingle.

    Scale shape: grams ⋈ splits on doc_id (broadcastable split table?
    no — splits are corpus-sized, this is the one real shuffle), then
    eval grams LEFT SEMI train grams on the digest, then a two-row
    aggregate. Same cost class as the contamination gate itself."""
    from .contamination import contamination_grams

    splits = leakage_safe_splits(spark, sf_dir).select("doc_id", "split")
    grams = contamination_grams(spark, sf_dir).join(splits, "doc_id")
    train_g = (
        grams.filter(F.col("split") == "train").select("g").distinct()
    )
    eval_docs = splits.filter(F.col("split") != "train")
    overlap_docs = (
        grams.filter(F.col("split") != "train")
        .join(train_g, "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        eval_docs.join(overlap_docs, "doc_id", "left")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long")
            .alias("n_overlap_docs"),
        )
        .select(
            "split", "n_docs", "n_overlap_docs",
            (F.col("n_overlap_docs").cast("double")
             / F.col("n_docs").cast("double")).alias("overlap_frac"),
        )
    )


def _split_contamination_sql() -> str:
    from .contamination import _ngram_sql

    return f"""
WITH c AS (
  SELECT doc_id, md5(COALESCE(text, '')) AS h FROM documents
), gmin AS (
  SELECT h, MIN(doc_id) AS canonical_id FROM c GROUP BY h
), splits AS (
  SELECT c.doc_id,
         CASE WHEN b < {SPLIT_TRAIN_LT} THEN 'train'
              WHEN b < {SPLIT_VAL_LT} THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT c.doc_id, {_SPLIT_BUCKET_SQL} AS b
        FROM c JOIN gmin USING (h)) c
), grams AS (
  SELECT d.doc_id, s.split, UNNEST(list_distinct({_ngram_sql()})) AS g
  FROM documents d JOIN splits s USING (doc_id)
), train_g AS (
  SELECT DISTINCT g FROM grams WHERE split = 'train'
), overlap AS (
  SELECT DISTINCT doc_id FROM grams
  WHERE split <> 'train' AND g IN (SELECT g FROM train_g)
)
SELECT s.split, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN o.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_overlap_docs,
       CAST(SUM(CASE WHEN o.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS overlap_frac
FROM splits s LEFT JOIN overlap o USING (doc_id)
WHERE s.split <> 'train'
GROUP BY s.split
"""


# ---- temperature mixture weights -------------------------------------------


def temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling weights at temperature alpha = 0.5 — the
    standard multilingual/multi-domain rebalancing recipe (sample
    source i with probability proportional to its token share raised to
    alpha < 1, flattening the head so low-resource sources survive).
    Returns (source, n_docs, n_tokens, weight, oversample): ``weight``
    is the alpha-tempered sampling probability; ``oversample`` is the
    resulting epoch multiplier for the source (weight x corpus tokens /
    own tokens — > 1 means the trainer repeats the source).

    Cross-engine exactness is why alpha is 1/2 here: sqrt is IEEE
    correctly-rounded (identical in every engine), pow(x, 0.3) is not.
    The tempered masses are then pinned to fixed-point BIGINT micro-
    units (the lm_score/quality_model idiom) so the normalizing sum is
    INTEGER arithmetic — no float-accumulation-order dependence — and
    every emitted double is a single exact-operand division/multiply.

    Scale shape: one grouped aggregate (source cardinality is tiny) +
    a broadcast one-row total; no window, no sort."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text"))).alias("n_tokens"),
    )
    s = F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1_000_000).cast(
        "long"
    )
    tempered = counts.withColumn("s", s)
    totals = tempered.agg(
        F.sum("s").alias("total_s"), F.sum("n_tokens").alias("total_tokens")
    )
    weight = F.col("s").cast("double") / F.col("total_s").cast("double")
    return (
        tempered.crossJoin(F.broadcast(totals))
        .select(
            "source", "n_docs", "n_tokens",
            weight.alias("weight"),
            (weight * F.col("total_tokens").cast("double")
             / F.col("n_tokens").cast("double")).alias("oversample"),
        )
    )


TEMPERATURE_MIXTURE_SQL = """
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs,
         SUM(len(string_split_regex(trim(lower(text)), '\\s+'))) AS n_tokens
  FROM documents GROUP BY source
), tempered AS (
  SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT) AS s
  FROM counts
), totals AS (
  SELECT SUM(s) AS total_s, SUM(n_tokens) AS total_tokens FROM tempered
)
SELECT source, n_docs, n_tokens,
       CAST(s AS DOUBLE) / CAST(total_s AS DOUBLE) AS weight,
       CAST(s AS DOUBLE) / CAST(total_s AS DOUBLE)
         * CAST(total_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE)
         AS oversample
FROM tempered, totals
"""


# ---- training shard assignment ---------------------------------------------

N_SHARDS = 8


def training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's last hop before the trainer: assign every document
    a shard and a position inside it — a deterministic global shuffle.
    Shard = md5 bucket of the doc id (uniform, content-independent);
    intra-shard order = md5 of a DIFFERENT salt of the id (order must
    not correlate with the shard key, or shard 0 would hold the
    lexically-smallest order keys corpus-wide), ties broken by doc_id.
    Re-running on the same corpus yields byte-identical shards — the
    idempotent-replay property everything else in this engine holds.

    Scale shape: one hash-partition exchange on shard + one per-shard
    sort (the unavoidable pass — training order IS a per-shard total
    order); no global sort, no single-partition window. Shard count is
    the parallelism dial: production sizes N_SHARDS so a shard ≈ one
    trainer worker's slice."""
    docs = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    shard = (
        F.conv(F.substring(F.md5(did), 1, 4), 16, 10).cast("int") % N_SHARDS
    )
    order_key = F.md5(F.concat(F.lit("order:"), did))
    w = Window.partitionBy("shard").orderBy("order_key", "doc_id")
    return (
        docs.select(
            "doc_id",
            token_count(F.col("text")).alias("n_tokens"),
            shard.alias("shard"),
            order_key.alias("order_key"),
        )
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos", "n_tokens")
    )


TRAINING_SHARDS_SQL = f"""
WITH base AS (
  SELECT doc_id,
         len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens,
         ((strpos('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096
        + (strpos('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256
        + (strpos('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16
        + (strpos('0123456789abcdef',
                  substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1))
           % {N_SHARDS} AS shard,
         md5('order:' || CAST(doc_id AS VARCHAR)) AS order_key
  FROM documents
)
SELECT doc_id, CAST(shard AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard
                               ORDER BY order_key, doc_id) AS INT) AS pos,
       CAST(n_tokens AS INT) AS n_tokens
FROM base
"""


EXT_QUERIES = {
    "stratified_lang_sample": (stratified_lang_sample, STRATIFIED_SAMPLE_SQL),
    "leakage_safe_splits": (leakage_safe_splits, LEAKAGE_SAFE_SPLITS_SQL),
    "near_dup_safe_splits": (near_dup_safe_splits, _near_dup_splits_sql()),
    "training_shards": (training_shards, TRAINING_SHARDS_SQL),
    "temperature_mixture_weights": (
        temperature_mixture_weights, TEMPERATURE_MIXTURE_SQL,
    ),
    "split_contamination_report": (
        split_contamination_report, _split_contamination_sql(),
    ),
    "sequence_packing": (sequence_packing, SEQUENCE_PACKING_SQL),
    "dedup_aware_sample": (dedup_aware_sample, _dedup_aware_sample_sql()),
    "source_mixture_sample": (source_mixture_sample, _mixture_sql()),
    "token_budget_sample": (token_budget_sample, TOKEN_BUDGET_SQL),
    "quality_filter_summary": (quality_filter_summary, _quality_filter_sql()),
    "redact_pii_docs": (redact_pii_docs, REDACT_PII_SQL),
}
