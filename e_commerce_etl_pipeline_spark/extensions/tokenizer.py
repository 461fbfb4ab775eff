"""Tokenizer-training support: corpus-wide BPE pair statistics.

BPE training (Sennrich et al. 2016 — the public recipe behind every
modern subword tokenizer) iterates one statistic: the frequency of
every ADJACENT symbol pair within words, over the whole corpus. This
module computes that statistic engine-side for the character-level
first iteration: the global top-K most frequent adjacent character
pairs, with deterministic total ordering (count DESC, pair ASC) so the
selection is engine-independent.

Scale shape (100 TB): pair enumeration is a pure map (per-word array
math — no join, no Python); the only shuffle is the pair-count hash
aggregate, whose key space is bounded by |alphabet|² (a few thousand
distinct pairs for any natural-language corpus — the partial aggregate
compresses each partition to that bound before the exchange, so the
shuffle is KB-sized at any corpus size); the top-K is a bounded
TakeOrdered over that vocabulary-sized result, never over data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.queries import load_table
from .text import words_col

TOP_PAIRS = 50


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


EXT_QUERIES = {
    "bpe_pair_stats": (bpe_pair_stats, BPE_PAIR_SQL),
}
