"""Training-data hygiene operators: benchmark decontamination and
Gopher-style document quality flags.

- ``benchmark_contamination``: the standard n-gram decontamination check
  (the GPT-3/Gopher recipe: a training document is contaminated if it
  shares a long word n-gram with an evaluation benchmark). Scale shape:
  both sides explode to (md5(n-gram), doc_id) — a NARROW payload — the
  benchmark side is tiny and broadcast, and the join output aggregates
  per document. Never O(corpus²): cost is corpus-grams × matched-only.
- ``gopher_quality_flags``: per-document structural quality gates (word
  count band, mean word length band, stopword diversity, symbol ratio) —
  pure map stage, whole-stage codegen, no shuffle; the aggregate summary
  is a tiny group key.

Both are DuckDB-oracle-checked; n-gram construction and every ratio are
expressed identically in both engines (same word split, same md5 over
the space-joined window, left-to-right arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.queries import load_table
from .dedup_fuzzy import WORDS_SQL
from .text import STOPWORDS, words_col

# Contamination window: published recipes use 8-13 word n-grams against
# real corpora; the synthetic documents here are ~40 words over a tiny
# vocabulary, so 4 keeps the operator's output non-degenerate (18
# contaminated docs at sf0.01 vs 0 at n=8). The operator is n-agnostic.
NGRAM = 4
BENCH_MOD = 53      # doc_id % 53 == 0 -> the stand-in benchmark set

MIN_WORDS, MAX_WORDS = 10, 10_000
MIN_MWL, MAX_MWL = 3.0, 10.0     # mean word length band
MIN_DISTINCT_STOPWORDS = 2
MAX_SYMBOL_RATIO = 0.1           # '#' and '...' per word


def ngram_hashes(text: Column, n: int = NGRAM) -> Column:
    """md5 of each word n-gram window (space-joined), [] for short docs."""
    w = words_col(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(w) - F.lit(n)),
        lambda i: F.md5(F.concat_ws(" ", F.slice(w, i + 1, n))),
    )
    return F.when(F.size(w) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _ngram_sql(t: str = "text", n: int = NGRAM) -> str:
    w = WORDS_SQL.format(t=t)
    return (
        f"CASE WHEN len({w}) >= {n} THEN "
        f"list_transform(range(len({w}) - {n} + 1), "
        f"i -> md5(array_to_string(({w})[i + 1 : i + {n}], ' '))) "
        f"ELSE [] END"
    )


def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per training document: how many of its distinct word 8-grams also
    occur in the benchmark set (doc_id % BENCH_MOD == 0 — the stand-in
    for a held-out eval suite), plus the contamination ratio. Documents
    with zero overlap are excluded (at corpus scale the output is the
    quarantine list, not the corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id", F.explode(F.array_distinct(ngram_hashes(F.col("text")))).alias("g")
    )
    bench = (
        grams.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select("g").distinct()
    )
    corpus = grams.filter(F.col("doc_id") % BENCH_MOD != 0)
    totals = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        corpus.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        hits.join(totals, "doc_id")
        .select(
            "doc_id", "n_grams", "n_contaminated",
            (F.col("n_contaminated").cast("double")
             / F.col("n_grams").cast("double")).alias("contamination_ratio"),
        )
    )


BENCHMARK_CONTAMINATION_SQL = f"""
WITH grams AS (
  SELECT doc_id, UNNEST(list_distinct({_ngram_sql()})) AS g FROM documents
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {BENCH_MOD} = 0
), corpus AS (
  SELECT * FROM grams WHERE doc_id % {BENCH_MOD} <> 0
), totals AS (
  SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY doc_id
), hits AS (
  SELECT doc_id, COUNT(*) AS n_contaminated
  FROM corpus JOIN bench USING (g) GROUP BY doc_id
)
SELECT doc_id, n_grams, n_contaminated,
       CAST(n_contaminated AS DOUBLE) / CAST(n_grams AS DOUBLE) AS contamination_ratio
FROM hits JOIN totals USING (doc_id)
"""


def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule-style structural gates per document, plus the overall
    pass flag. Published-recipe shapes (word-count band, mean-word-length
    band, stopword diversity, symbol-to-word ratio) over this corpus's
    deterministic text."""
    docs = load_table(spark, sf_dir, "documents")
    w = words_col(F.col("text"))
    n_words = F.size(w)
    mwl = (
        F.aggregate(F.transform(w, F.length), F.lit(0).cast("long"),
                    lambda acc, x: acc + x).cast("double")
        / n_words.cast("double")
    )
    n_stops = F.size(F.filter(F.array_distinct(w), lambda x: x.isin(*STOPWORDS)))
    n_symbols = (
        F.size(F.filter(w, lambda x: x.contains("#")))
        + F.size(F.filter(w, lambda x: x.contains("...")))
    )
    sym_ratio = n_symbols.cast("double") / n_words.cast("double")
    flags = {
        "word_count_ok": (n_words >= MIN_WORDS) & (n_words <= MAX_WORDS),
        "mean_word_len_ok": (mwl >= MIN_MWL) & (mwl <= MAX_MWL),
        "stopwords_ok": n_stops >= MIN_DISTINCT_STOPWORDS,
        "symbol_ratio_ok": sym_ratio <= MAX_SYMBOL_RATIO,
    }
    out = docs.select(
        "doc_id", "lang",
        n_words.cast("long").alias("n_words"),
        mwl.alias("mean_word_len"),
        *[c.alias(name) for name, c in flags.items()],
    )
    all_ok = F.lit(True)
    for name in flags:
        all_ok = all_ok & F.col(name)
    return out.withColumn("gopher_pass", all_ok)


def _gopher_sql() -> str:
    w = WORDS_SQL.format(t="text")
    stop_in = ",".join(f"'{s}'" for s in STOPWORDS)
    mwl = (f"CAST(list_sum(list_transform({w}, x -> CAST(length(x) AS BIGINT))) AS DOUBLE)"
           f" / CAST(len({w}) AS DOUBLE)")
    n_stops = f"len(list_filter(list_distinct({w}), x -> x IN ({stop_in})))"
    n_sym = (f"(len(list_filter({w}, x -> contains(x, '#')))"
             f" + len(list_filter({w}, x -> contains(x, '...'))))")
    return f"""
SELECT doc_id, lang,
       CAST(len({w}) AS BIGINT) AS n_words,
       {mwl} AS mean_word_len,
       len({w}) >= {MIN_WORDS} AND len({w}) <= {MAX_WORDS} AS word_count_ok,
       {mwl} >= {MIN_MWL} AND {mwl} <= {MAX_MWL} AS mean_word_len_ok,
       {n_stops} >= {MIN_DISTINCT_STOPWORDS} AS stopwords_ok,
       CAST({n_sym} AS DOUBLE) / CAST(len({w}) AS DOUBLE) <= {MAX_SYMBOL_RATIO} AS symbol_ratio_ok,
       (len({w}) >= {MIN_WORDS} AND len({w}) <= {MAX_WORDS})
       AND ({mwl} >= {MIN_MWL} AND {mwl} <= {MAX_MWL})
       AND ({n_stops} >= {MIN_DISTINCT_STOPWORDS})
       AND (CAST({n_sym} AS DOUBLE) / CAST(len({w}) AS DOUBLE) <= {MAX_SYMBOL_RATIO}) AS gopher_pass
FROM documents
"""


EXT_QUERIES = {
    "benchmark_contamination": (benchmark_contamination, BENCHMARK_CONTAMINATION_SQL),
    "gopher_quality_flags": (gopher_quality_flags, _gopher_sql()),
}
