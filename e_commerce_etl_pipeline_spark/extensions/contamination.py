"""Training-data hygiene operators: benchmark decontamination,
Gopher-style document quality flags, and repetition filters.

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
- ``repetition_flags``: Gopher-recipe repetition gates (duplicate-word
  fraction, top-bigram character fraction, duplicate-2-gram character
  fraction). All per-document array arithmetic — a pure map stage with
  NO shuffle at any corpus size; per-doc cost is O(grams²) over ~100-gram
  documents, i.e. constant.

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
# Repetition gates (published recipes use 0.20-0.60 bands on web text;
# this synthetic corpus has a tiny vocabulary, so bands are set from its
# measured quantiles to keep pass/fail non-degenerate: each gate fails
# roughly the top ~15-20% most-repetitive documents at sf0.01).
MAX_DUP_WORD_FRAC = 0.60
MAX_TOP_BIGRAM_CHAR_FRAC = 0.10
MAX_DUP_2GRAM_CHAR_FRAC = 0.20
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


def contamination_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted exploded (doc_id, gram-md5) table; the shingling/hashing
    map stage feeds three aggregations (benchmark set, per-doc totals,
    hit counts), so it is materialized once per corpus snapshot —
    fingerprint-keyed like the dedup shingle caches (index_store, r6)."""
    from ..operators import index_store

    docs = load_table(spark, sf_dir, "documents")
    return index_store.cached_df(
        spark, index_store.table_dir(sf_dir, "documents"), "contamination_grams",
        lambda: docs.select(
            "doc_id",
            F.explode(F.array_distinct(ngram_hashes(F.col("text")))).alias("g"),
        ),
    )


def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per training document: how many of its distinct word 8-grams also
    occur in the benchmark set (doc_id % BENCH_MOD == 0 — the stand-in
    for a held-out eval suite), plus the contamination ratio. Documents
    with zero overlap are excluded (at corpus scale the output is the
    quarantine list, not the corpus)."""
    grams = contamination_grams(spark, sf_dir)
    bench = (
        grams.filter(F.col("doc_id") % BENCH_MOD == 0)
        .select("g").distinct()
        .withColumn("__hit", F.lit(1))
    )
    corpus = grams.filter(F.col("doc_id") % BENCH_MOD != 0)
    # ONE pass over the gram table (r8): left-broadcast-mark each gram,
    # then count total and contaminated in the same hash aggregate. The
    # previous totals⋈hits formulation scanned the gram artifact twice,
    # shuffled twice, and paid a doc_id join to recombine — at corpus
    # scale that is 2× gram-table I/O and an extra exchange for nothing.
    # The DuckDB oracle deliberately keeps the two-aggregate join
    # formulation, making it an independent cross-check of this plan.
    marked = corpus.join(F.broadcast(bench), "g", "left")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long")
            .alias("n_contaminated"),
        )
        .filter(F.col("n_contaminated") > 0)
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
    # words materialized as a column: the six HOF consumers below get no
    # common-subexpression reuse on an inline split (same caveat as
    # shingles_from_words / lang_id_from_words, r12)
    docs = docs.select(
        "doc_id", "lang", words_col(F.col("text")).alias("__w")
    )
    w = F.col("__w")
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


def repetition_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality gates per document (Gopher recipe):
    duplicate-word fraction, fraction of characters in the most frequent
    word bigram, and fraction of characters covered by repeated bigrams.
    All ratios are exact-integer numerators over an exact-integer char
    total with ONE trailing double division, so the DuckDB oracle
    reproduces the same IEEE doubles. Tie-break for the top bigram:
    lexicographically smallest among the max-count grams (its CHAR LENGTH
    is what enters the ratio, so the choice must be deterministic)."""
    docs = load_table(spark, sf_dir, "documents")
    # Stage arrays as materialized columns: each level references the
    # previous as an attribute, so nested higher-order expressions are
    # computed once per row (a single inlined tree recomputes `pairs`
    # inside per-element lambdas -> O(grams³) per doc; measured unusably
    # slow in both engines).
    w = F.col("w")
    base = docs.select("doc_id", "lang", words_col(F.col("text")).alias("w"))
    g2_expr = F.when(
        F.size(w) >= 2,
        F.transform(F.sequence(F.lit(0), F.size(w) - F.lit(2)),
                    lambda i: F.concat_ws(" ", F.slice(w, i + 1, 2))),
    ).otherwise(F.array().cast("array<string>"))
    g = base.select(
        "doc_id", "lang", "w", g2_expr.alias("g2"),
        F.aggregate(F.transform(w, lambda x: F.length(x).cast("long")),
                    F.lit(0).cast("long"), lambda a, b: a + b).alias("total_chars"),
    )
    # (count, gram) per distinct gram as RUN LENGTHS of the sorted gram
    # array (r12): the former per-distinct-gram filter scan was
    # O(distinct_grams × grams) per document — quadratic on
    # mostly-unique text (measured 2.68 s → 1.57 s noop-sink at sf0.1;
    # the gap widens with document length). Sorting groups equal grams
    # into runs, so boundary positions + their gaps ARE the (count,
    # gram) pairs: the same multiset the distinct+filter form built
    # (order differs, but every consumer — sum, max, min-of-filtered —
    # is order-insensitive over exact integers). The DuckDB oracle
    # keeps the distinct+filter formulation, independently
    # cross-checking this rewrite. Each level stays a materialized
    # column (the staging rule above), incl. the boundary array, which
    # two expressions below consume.
    s = g.select(
        "doc_id", "lang", "w", "g2", "total_chars",
        F.array_sort(F.col("g2")).alias("sg"),
    )
    # ONE fold over the sorted grams (r13, VERDICT r12 #8) replaces the
    # r12 boundary-position / next-boundary / (count, gram) pair arrays
    # plus their four consumers (dup-char aggregate, max count,
    # max-count filter, lexicographic min): equal grams are adjacent
    # after the sort, so a single left-to-right pass tracking the open
    # run (prev, run) closes each distinct gram's run exactly once and
    # folds all three statistics as it goes — same exact integers, ~5
    # fewer materialized per-row arrays. The per-run close updates:
    # dup += run·(len(prev)−1) when run>1; (bc, bg) takes (run, prev)
    # when run is STRICTLY larger or ties with a lexicographically
    # smaller gram — exactly array_min over the max-count grams. This
    # is a SPARK-side fold (deterministic expression evaluation); the
    # DuckDB oracle deliberately keeps the r11 distinct+filter
    # formulation as an independent cross-check (its list_reduce is
    # non-deterministic under vectorized execution, so the SQL twin
    # never folds).
    _zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("bc"),
        F.lit(None).cast("string").alias("bg"),
    )

    def _closed_dup(acc):
        return acc["dup"] + F.when(
            acc["run"] > 1,
            acc["run"] * (F.length(acc["prev"]) - F.lit(1)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    def _better(acc):
        # first close always wins (bc starts 0, run >= 1); ties prefer
        # the lexicographically smaller gram (bg NULL only before the
        # first close, unreachable on a tie since bc >= 1 then)
        return (acc["run"] > acc["bc"]) | (
            (acc["run"] == acc["bc"]) & (acc["prev"] < acc["bg"])
        )

    def _step(acc, x):
        return (
            F.when(acc["prev"].isNull(), F.struct(
                x.alias("prev"), F.lit(1).cast("long").alias("run"),
                acc["dup"].alias("dup"), acc["bc"].alias("bc"),
                acc["bg"].alias("bg"),
            ))
            .when(x == acc["prev"], F.struct(
                acc["prev"].alias("prev"),
                (acc["run"] + F.lit(1)).alias("run"),
                acc["dup"].alias("dup"), acc["bc"].alias("bc"),
                acc["bg"].alias("bg"),
            ))
            .otherwise(F.struct(
                x.alias("prev"), F.lit(1).cast("long").alias("run"),
                _closed_dup(acc).alias("dup"),
                F.when(_better(acc), acc["run"]).otherwise(acc["bc"])
                .alias("bc"),
                F.when(_better(acc), acc["prev"]).otherwise(acc["bg"])
                .alias("bg"),
            ))
        )

    def _finish(acc):
        # close the last open run; an empty gram array leaves the zero
        # accumulator (top_cnt 0, top_gram NULL, dup 0 — the empty-g2
        # outputs are pinned by the size(g2) > 0 guards below, exactly
        # like the former array_max-over-empty NULL)
        return F.struct(
            F.when(acc["prev"].isNotNull(), _closed_dup(acc))
            .otherwise(acc["dup"]).alias("dup"),
            F.when(acc["prev"].isNotNull() & _better(acc), acc["run"])
            .otherwise(acc["bc"]).alias("top_cnt"),
            F.when(acc["prev"].isNotNull() & _better(acc), acc["prev"])
            .otherwise(acc["bg"]).alias("top_gram"),
        )

    t = s.select(
        "doc_id", "lang", "w", "g2", "total_chars",
        F.aggregate(F.col("sg"), _zero, _step, _finish).alias("__rs"),
    ).select(
        "doc_id", "lang", "w", "g2", "total_chars",
        F.col("__rs")["top_cnt"].alias("top_cnt"),
        F.col("__rs")["dup"].alias("dup_chars"),
        F.col("__rs")["top_gram"].alias("__tg"),
    )
    # gram string length minus the joining space = chars it covers
    top_chars = F.col("top_cnt") * (F.length(F.col("__tg")) - F.lit(1)).cast("long")
    out = t.select(
        "doc_id", "lang",
        ((F.size(w) - F.size(F.array_distinct(w))).cast("double")
         / F.size(w).cast("double")).alias("dup_word_frac"),
        F.when(F.size(F.col("g2")) > 0,
               top_chars.cast("double") / F.col("total_chars").cast("double"))
        .otherwise(F.lit(0.0)).alias("top_bigram_char_frac"),
        F.when(F.size(F.col("g2")) > 0,
               F.col("dup_chars").cast("double") / F.col("total_chars").cast("double"))
        .otherwise(F.lit(0.0)).alias("dup_2gram_char_frac"),
    )
    flags = {
        "dup_word_ok": F.col("dup_word_frac") <= MAX_DUP_WORD_FRAC,
        "top_bigram_ok": F.col("top_bigram_char_frac") <= MAX_TOP_BIGRAM_CHAR_FRAC,
        "dup_2gram_ok": F.col("dup_2gram_char_frac") <= MAX_DUP_2GRAM_CHAR_FRAC,
    }
    out = out.select("*", *[c.alias(n) for n, c in flags.items()])
    all_ok = F.lit(True)
    for name in flags:
        all_ok = all_ok & F.col(name)
    return out.withColumn("repetition_pass", all_ok)


def _repetition_sql() -> str:
    w = WORDS_SQL.format(t="text")
    return f"""
WITH base AS (
  SELECT doc_id, lang, {w} AS w FROM documents
), g AS (
  SELECT doc_id, lang, w,
    CASE WHEN len(w) >= 2 THEN
      list_transform(range(len(w) - 1), i -> array_to_string(w[i + 1 : i + 2], ' '))
    ELSE [] END AS g2,
    list_sum(list_transform(w, x -> CAST(length(x) AS BIGINT))) AS total_chars
  FROM base
), p AS (
  SELECT doc_id, lang, w, g2, total_chars,
    list_transform(list_distinct(g2), x ->
      struct_pack(c := CAST(len(list_filter(g2, y -> y = x)) AS BIGINT), g := x)) AS pairs
  FROM g
), t AS (
  SELECT doc_id, lang, w, g2, total_chars, pairs,
    list_max(list_transform(pairs, q -> q.c)) AS top_cnt,
    list_sum(list_transform(pairs, q ->
      CASE WHEN q.c > 1 THEN q.c * (CAST(length(q.g) AS BIGINT) - 1) ELSE CAST(0 AS BIGINT) END)) AS dup_chars
  FROM p
), m AS (
  SELECT doc_id, lang,
    CAST(len(w) - len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS dup_word_frac,
    CASE WHEN len(g2) > 0 THEN
      CAST(top_cnt * (CAST(length(list_aggregate(
             list_transform(list_filter(pairs, q -> q.c = top_cnt), q -> q.g),
             'min')) AS BIGINT) - 1) AS DOUBLE) / CAST(total_chars AS DOUBLE)
    ELSE 0.0 END AS top_bigram_char_frac,
    CASE WHEN len(g2) > 0 THEN
      CAST(dup_chars AS DOUBLE) / CAST(total_chars AS DOUBLE)
    ELSE 0.0 END AS dup_2gram_char_frac
  FROM t
)
SELECT doc_id, lang, dup_word_frac, top_bigram_char_frac, dup_2gram_char_frac,
       dup_word_frac <= {MAX_DUP_WORD_FRAC} AS dup_word_ok,
       top_bigram_char_frac <= {MAX_TOP_BIGRAM_CHAR_FRAC} AS top_bigram_ok,
       dup_2gram_char_frac <= {MAX_DUP_2GRAM_CHAR_FRAC} AS dup_2gram_ok,
       dup_word_frac <= {MAX_DUP_WORD_FRAC}
       AND top_bigram_char_frac <= {MAX_TOP_BIGRAM_CHAR_FRAC}
       AND dup_2gram_char_frac <= {MAX_DUP_2GRAM_CHAR_FRAC} AS repetition_pass
FROM m
"""


EXT_QUERIES = {
    "benchmark_contamination": (benchmark_contamination, BENCHMARK_CONTAMINATION_SQL),
    "gopher_quality_flags": (gopher_quality_flags, _gopher_sql()),
    "repetition_flags": (repetition_flags, _repetition_sql()),
}
