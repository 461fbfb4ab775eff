"""Tokenizer-training support: corpus-wide BPE pair statistics, the
full iterative merge-training loop, and vocab-cached encoding.

BPE training (Sennrich et al. 2016 — the public recipe behind every
modern subword tokenizer) iterates one statistic: the frequency of
every ADJACENT symbol pair within words, over the whole corpus.
``bpe_pair_stats`` computes that statistic engine-side for the
character-level first iteration (DuckDB-oracle-checked);
``bpe_train_merges`` runs the full iterative algorithm — the brief's
canonical non-SQL-expressible op — and ``bpe_encode_stats`` applies
the learned merges back to the corpus through the word-vocabulary
cache, the same trick production tokenizers use (encode each DISTINCT
word once, not each occurrence).

Scale shape (100 TB):

- **Pair stats / iteration argmax**: pair enumeration is a pure map
  (per-word array math — no join, no Python); the only shuffle is the
  pair-count hash aggregate, whose key space is bounded by the symbol
  alphabet squared (the partial aggregate compresses each partition to
  that bound before the exchange, so the shuffle is KB-sized at any
  corpus size); the top-K / argmax is a bounded TakeOrdered over that
  vocabulary-sized result, never over data.
- **Training** touches the corpus exactly ONCE (the word-count
  aggregate). Every merge iteration then runs over the DISTINCT-word
  vocabulary — bounded by language, not by corpus size (Heaps' law:
  ~10^7 rows at web scale vs 10^11+ word occurrences), localCheckpointed
  per iteration so lineage stays constant. 100× more data changes the
  counts in the vocab table, not the per-iteration cost.
- **Encoding** never re-runs BPE per occurrence: the trained final
  vocabulary state (word → token count) is a fingerprint-keyed stored
  artifact; encoding is one join against it (vocabulary-sized build
  side — AQE picks broadcast when it fits) plus a per-doc aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import index_store
from ..plans.queries import load_table
from .text import words_col

TOP_PAIRS = 50
N_MERGES = 20


def bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pair, n): the TOP_PAIRS most frequent adjacent character pairs
    within words across the corpus — the argmax candidates of BPE's
    first merge iteration. Ties break on the pair string (total order,
    cross-engine deterministic)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(
        words_col(F.col("text")), lambda w: F.length(w) >= 2
    )
    exploded = docs.select(
        F.explode(
            F.flatten(
                F.transform(
                    words,
                    lambda w: F.transform(
                        F.sequence(F.lit(1), F.length(w) - 1),
                        lambda i: w.substr(i, F.lit(2)),
                    ),
                )
            )
        ).alias("pair")
    )
    return (
        exploded.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(TOP_PAIRS)
    )


BPE_PAIR_SQL = f"""
WITH words AS (
  SELECT UNNEST(string_split_regex(trim(lower(text)), '\\s+')) AS w
  FROM documents
), pairs AS (
  SELECT UNNEST(list_transform(generate_series(1, length(w) - 1),
                               i -> substr(w, CAST(i AS INT), 2))) AS pair
  FROM words WHERE length(w) >= 2
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair
LIMIT {TOP_PAIRS}
"""


# ---- iterative BPE training ----------------------------------------------


def _word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w, n): distinct-word frequency table — the single corpus-sized
    pass of BPE training, memoized per corpus snapshot (every merge
    iteration and the encode join reuse it)."""
    docs = load_table(spark, sf_dir, "documents")
    return index_store.cached_df(
        spark, index_store.table_dir(sf_dir, "documents"), "bpe_word_counts",
        lambda: (
            docs.select(F.explode(words_col(F.col("text"))).alias("w"))
            .filter(F.length("w") >= 1)
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("n"))
        ),
    )


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<left,right>> of adjacent symbol pairs ([] if <2)."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.struct(
            F.element_at(syms, i).alias("left"),
            F.element_at(syms, i + F.lit(1)).alias("right"),
        ),
    )
    return F.when(F.size(syms) >= 2, pairs).otherwise(
        F.array().cast("array<struct<left:string,right:string>>")
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """One BPE merge applied to a symbol array, engine-side.

    Left fold == the left-to-right greedy scan: after a merge the
    accumulator tail becomes ``left+right``, which can never match
    ``left`` again (that would need ``right`` to be empty, and empty
    symbols cannot occur), so a token merged in this iteration never
    re-merges as the LEFT side — exactly the scan's i += 2. The
    (a,a) self-pair case folds correctly for the same reason:
    "aaaa" -> [aa, aa], "aaa" -> [aa, a]."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(F.element_at(acc, -1), s)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _train_loop(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> tuple[DataFrame, DataFrame]:
    """Run the merge loop; return (merges, final word→token-count vocab).

    Per iteration: one bounded-argmax job over the vocabulary's pair
    stats (count DESC, left ASC, right ASC — total order, engine-
    independent) and one localCheckpoint materializing the merged
    symbol arrays (constant lineage across iterations; the iterative-
    algorithm analogue of the cluster-propagation checkpoints in
    extensions.components). The collect is 1 row per iteration."""
    wc = _word_counts(spark, sf_dir)
    # Partition the vocab by its SIZE, not by spark.sql.shuffle.partitions:
    # 40 iteration jobs over a few-thousand-word test vocab must not pay
    # 32 task launches each, and a 10^7-word web vocab must not squeeze
    # into one. ~50k words per task keeps both ends right; the count is
    # a fingerprint-keyed memo (one cheap job per corpus snapshot).
    n_vocab = index_store.cached_value(
        spark, index_store.table_dir(sf_dir, "documents"),
        "bpe_vocab_rows", wc.count,
    )
    n_parts = max(1, min(int(spark.sparkContext.defaultParallelism),
                         n_vocab // 50_000 + 1))
    vocab = (
        wc.select("w", "n", F.split("w", "").alias("syms"))
        .repartition(n_parts)
        .localCheckpoint()
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            vocab.select(
                F.col("n"), F.explode(_adjacent_pairs(F.col("syms"))).alias("p")
            )
            .groupBy("p.left", "p.right")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break  # every word fully merged to one token — converged
        left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["cnt"])
        merges.append((rank, left, right, left + right, cnt))
        prev = vocab
        vocab = vocab.withColumn(
            "syms", _apply_merge(F.col("syms"), left, right)
        ).localCheckpoint()
        # The new checkpoint is materialized (eager), so iteration i-1's
        # blocks are dead weight — release them. localCheckpoint trades
        # executor-loss recomputability for speed; on a real cluster a
        # long training run would use reliable checkpoint() to survive
        # executor churn (the same local-rig trade the components
        # propagation loop documents).
        prev.unpersist()
    merges_df = spark.createDataFrame(
        merges,
        "rank INT, left STRING, right STRING, merged STRING, pair_count BIGINT",
    )
    vocab_tokens = vocab.select("w", F.size("syms").alias("n_tokens"))
    return merges_df, vocab_tokens


def _trained(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Fingerprint-keyed trained artifacts (merge table + final vocab
    state), built at most once per corpus snapshot across processes;
    the closure shares ONE loop run when both artifacts are missing."""
    path = index_store.table_dir(sf_dir, "documents")
    state: dict[str, DataFrame] = {}

    def run() -> dict[str, DataFrame]:
        if "merges" not in state:
            state["merges"], state["vocab"] = _train_loop(spark, sf_dir)
        return state

    merges = index_store.stored_df(
        spark, path, "bpe_merges", lambda: run()["merges"]
    )
    vocab = index_store.stored_df(
        spark, path, "bpe_word_tokens", lambda: run()["vocab"]
    )
    return merges, vocab


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table: (rank, left, right, merged,
    pair_count) for N_MERGES iterations — the full iterative training
    algorithm, not just the first-iteration statistic. Rank 0 always
    equals the argmax of ``bpe_pair_stats`` (asserted in tests).

    No DuckDB oracle: each iteration's input depends on the previous
    argmax (genuinely iterative — the brief's documented rows-only
    carve-out); instead tests/test_tokenizer.py replays the exact
    training on a pure-Python reference BPE and compares the merge
    table verbatim at sf0.001."""
    merges, _ = _trained(spark, sf_dir)
    return merges.orderBy("rank")


def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE encoding statistics using the trained merges:
    (doc_id, n_words, n_chars, n_tokens_bpe, chars_per_token). Encoding
    rides the word-vocabulary cache — one join of the doc word stream
    against the trained (word → token count) state, never a per-
    occurrence merge replay; unseen words (possible on corpora the
    vocab wasn't trained on) fall back to character tokens via
    coalesce. Verified token-exact vs the Python reference encoder."""
    _, vocab = _trained(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    doc_words = docs.select(
        "doc_id", F.explode(words_col(F.col("text"))).alias("w")
    ).filter(F.length("w") >= 1)
    return (
        doc_words.join(vocab, "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w")).alias("n_chars"),
            F.sum(F.coalesce(F.col("n_tokens"), F.length("w")))
            .alias("n_tokens_bpe"),
        )
        .select(
            "doc_id", "n_words", "n_chars", "n_tokens_bpe",
            (F.col("n_chars").cast("double")
             / F.col("n_tokens_bpe").cast("double")).alias("chars_per_token"),
        )
    )


EXT_QUERIES = {
    "bpe_pair_stats": (bpe_pair_stats, BPE_PAIR_SQL),
    "bpe_train_merges": (bpe_train_merges, None),
    "bpe_encode_stats": (bpe_encode_stats, None),
}
