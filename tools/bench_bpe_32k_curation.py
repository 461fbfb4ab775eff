"""32k-merge BPE fed through the REAL curation chain (VERDICT r11 #5).

r11 proved the trainer at production merge count on a raw synthetic
corpus (BENCH_bpe_32k_r11.json). This closes the loop end-to-end the
way a training-data pipeline actually runs:

    synthetic Heaps-law documents table (with planted exact-dup clones
    and a quality-diverse stopword mix)
      -> the engine's OWN curation gate: text.quality_score >=
         curation.QUALITY_THRESHOLD, then drop non-canonical members of
         components.dedup_clusters (minhash-LSH -> components) — the
         exact curated_corpus_summary chain
      -> ONE Spark word-count aggregate over the CURATED docs
      -> tokenizer._train_driver at 32,768 merges
      -> encode the curated corpus with the learned vocabulary at
         three merge depths (20 / 1,024 / 32,768), reporting
         chars-per-token against the whitespace baseline (the r8
         20-merge figure on the stock documents table was ~1.37
         chars/token over its 20-merge vocab).

Plus the 10x-corpus scaling pair (same tool, one flag): train at a
FIXED merge count (4,096) on the 1x and the 10x corpus — the
corpus-sized work (word count) is the Spark aggregate and scales with
rows; the driver trainer's cost tracks the VOCABULARY (Heaps-law: 10x
words -> ~1.3x distinct), demonstrating cost scales with vocab, not
corpus size.

Deterministic throughout (xxhash64-derived uniforms, no RNG).
Prints ONE JSON line; optional argv[1] writes it to a file.

Usage: python tools/bench_bpe_32k_curation.py [OUT_JSON] [N_MERGES]
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

os.environ.setdefault("SPARK_GRAFT_AQE_INIT_PARTS", "64")
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from e_commerce_etl_pipeline_spark.extensions.components import (  # noqa: E402
    dedup_clusters,
)
from e_commerce_etl_pipeline_spark.extensions.curation import (  # noqa: E402
    QUALITY_THRESHOLD,
)
from e_commerce_etl_pipeline_spark.extensions.text import (  # noqa: E402
    STOPWORDS,
    quality_score,
    words_col,
)
from e_commerce_etl_pipeline_spark.extensions.tokenizer import (  # noqa: E402
    _train_driver,
)
from e_commerce_etl_pipeline_spark.plans.queries import load_table  # noqa: E402
from e_commerce_etl_pipeline_spark.session import get_spark  # noqa: E402

N_DOCS = 10_000
WORDS_PER_DOC = 200
VMAX = 1 << 18
SYLLABLES = [
    "ba", "ri", "ko", "ta", "mu", "se", "lo", "vi", "ne", "du",
    "pa", "ki", "fo", "ga", "he", "ju", "wa", "xe", "yo", "zu",
]
CLONE_MOD = 23          # doc_id % 23 == 0 clones doc_id - 1 (exact dup)
NO_STOP_FRAC = 0.15     # ~15% of docs carry NO stopwords -> quality-gated
SCALING_MERGES = 4_096  # fixed count for the 1x-vs-10x cost pair


def _docs_frame(spark, n_docs: int):
    """Deterministic Heaps-law documents: log-uniform word ranks over
    syllable words, ~1-in-6 word slots replaced by a real stopword
    (except the NO_STOP_FRAC of docs, which get none and fail the
    quality gate), doc_id % CLONE_MOD == 0 clones its predecessor."""
    syl = F.array(*[F.lit(s) for s in SYLLABLES])
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    pos = F.explode(F.sequence(F.lit(0), F.lit(WORDS_PER_DOC - 1)))
    base_doc = F.when(
        (F.col("doc_id") % CLONE_MOD == 0) & (F.col("doc_id") > 0),
        F.col("doc_id") - 1,
    ).otherwise(F.col("doc_id"))
    du = (
        F.pmod(F.xxhash64(F.lit("docq"), base_doc), F.lit(1_000_000_000))
        .cast("double") / 1.0e9
    )
    u = (
        F.pmod(
            F.xxhash64(F.col("__base") * WORDS_PER_DOC + F.col("i")),
            F.lit(1_000_000_000),
        ).cast("double") / 1.0e9
    )
    su = F.pmod(
        F.xxhash64(F.lit("stop"), F.col("__base") * WORDS_PER_DOC + F.col("i")),
        F.lit(60),
    )
    rank = F.floor(F.pow(F.lit(float(VMAX)), u)).cast("long")
    word = F.concat(*[
        F.when(
            F.col("rank") >= 20 ** k,
            F.element_at(
                syl,
                (F.pmod((F.col("rank") / F.lit(20 ** k)).cast("long"),
                        F.lit(20)) + 1).cast("int"),
            ),
        ).otherwise(F.lit(""))
        for k in range(5)
    ])
    # stopword substitution: ~10/60 slots, unless the doc is in the
    # no-stopword band (quality_score stop term -> 0 -> gated at 0.67)
    w = F.when(
        (F.col("__dq") >= NO_STOP_FRAC) & (su < 10),
        F.element_at(stop, (su + 1).cast("int")),
    ).otherwise(word)
    return (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"))
        .withColumn("__base", base_doc)
        .withColumn("__dq", du)
        .select("doc_id", "__base", "__dq", pos.alias("i"))
        .withColumn("rank", rank)
        .withColumn("w", w)
        .groupBy("doc_id")
        .agg(F.array_join(F.collect_list("w"), " ").alias("text"))
        .withColumn("lang", F.lit("en"))
        .withColumn("n_chars", F.length("text"))
    )


def _curated_word_counts(spark, work: str):
    """The engine's curation gate over the written documents table,
    then ONE word-count aggregate over the survivors."""
    docs = load_table(spark, work, "documents")
    non_keepers = dedup_clusters(spark, work).filter(
        F.col("doc_id") != F.col("canonical_doc_id")
    ).select("doc_id")
    kept = (
        docs.filter(quality_score(F.col("text")) >= QUALITY_THRESHOLD)
        .join(F.broadcast(non_keepers), "doc_id", "left_anti")
    )
    n_total = docs.count()
    n_kept = kept.count()
    wc_rows = [
        (r["w"], r["n"])
        for r in kept.select(F.explode(words_col(F.col("text"))).alias("w"))
        .filter(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    return wc_rows, n_total, n_kept


def _compression(wc: dict, tok_of: dict) -> tuple[int, float]:
    total_chars = sum(n * len(w) for w, n in wc.items())
    tokens = sum(wc[w] * t for w, t in tok_of.items())
    return tokens, round(total_chars / tokens, 4)


def main() -> None:
    out_file = sys.argv[1] if len(sys.argv) > 1 else None
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 32_768
    spark = get_spark("bench-bpe-32k-curation")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _emit(d):
        line = json.dumps(d)
        if out_file:
            with open(out_file, "w") as fh:
                fh.write(line + "\n")
        print(line, flush=True)

    out = {
        "metric": "bpe_32k_through_curation",
        "unit": "sec",
        "n_docs": N_DOCS,
        "words_per_doc": WORDS_PER_DOC,
        "clone_mod": CLONE_MOD,
        "quality_threshold": QUALITY_THRESHOLD,
    }

    work = tempfile.mkdtemp(prefix="bpe_cur_")
    try:
        t0 = time.time()
        _docs_frame(spark, N_DOCS).coalesce(4).write.parquet(
            f"{work}/documents.parquet"
        )
        out["gen_sec"] = round(time.time() - t0, 3)

        t0 = time.time()
        wc_rows, n_total, n_kept = _curated_word_counts(spark, work)
        out["curate_wc_sec"] = round(time.time() - t0, 3)
        out["docs_total"] = n_total
        out["docs_curated"] = n_kept
        wc = dict(wc_rows)
        out["n_vocab"] = len(wc)
        out["total_words"] = sum(wc.values())
        out["total_chars"] = sum(n * len(w) for w, n in wc.items())
        out["baseline_chars_per_word"] = round(
            out["total_chars"] / out["total_words"], 4
        )
        _emit(out)  # corpus facts land before the long train

        # shallow depths first (cheap, independent trains — the merge
        # sequence is deterministic, so depth-k merges are always the
        # first k of depth-32k; asserted below)
        depths = {}
        m20, tok20 = _train_driver(wc_rows, 20)
        depths[20] = (m20, tok20)
        t0 = time.time()
        m1k, tok1k = _train_driver(wc_rows, 1024)
        out["train_1k_sec"] = round(time.time() - t0, 3)
        depths[1024] = (m1k, tok1k)
        t0 = time.time()
        m32k, tok32k = _train_driver(wc_rows, n_merges)
        out["train_32k_sec"] = round(time.time() - t0, 3)
        out["n_merges_done"] = len(m32k)
        k = len(m32k)  # smoke runs may request < 1024 merges
        assert m32k[:20] == m20[:min(20, k)], "prefix determinism (20)"
        assert m32k[:1024] == m1k[:min(1024, k)], "prefix determinism (1k)"
        depths[n_merges] = (m32k, tok32k)

        comp = {}
        for d, (_m, tok) in depths.items():
            tokens, cpt = _compression(wc, tok)
            comp[str(d)] = {"tokens": tokens, "chars_per_token": cpt}
        out["compression_by_depth"] = comp
        _emit(out)

        # 10x corpus: fixed-merge-count cost pair (vocab-not-corpus)
        t0 = time.time()
        m_s, _ = _train_driver(wc_rows, SCALING_MERGES)
        out["scaling_1x"] = {
            "n_vocab": len(wc),
            "total_words": out["total_words"],
            "train_sec": round(time.time() - t0, 3),
        }
        _emit(out)
        big = _docs_frame(spark, N_DOCS * 10)
        t0 = time.time()
        wc10_rows = [
            (r["w"], r["n"])
            for r in big.select(
                F.explode(words_col(F.col("text"))).alias("w")
            )
            .filter(F.length("w") >= 1)
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        wc10_sec = round(time.time() - t0, 3)
        t0 = time.time()
        m10, _ = _train_driver(wc10_rows, SCALING_MERGES)
        out["scaling_10x"] = {
            "n_vocab": len(wc10_rows),
            "total_words": sum(n for _, n in wc10_rows),
            "wc_sec": wc10_sec,
            "train_sec": round(time.time() - t0, 3),
        }
        out["scaling_merges"] = SCALING_MERGES
        out["scaling_train_ratio_10x_over_1x"] = round(
            out["scaling_10x"]["train_sec"]
            / out["scaling_1x"]["train_sec"], 2
        )
        out["provenance"] = {
            "generator": "tools/bench_bpe_32k_curation.py",
            "deterministic": "xxhash64-derived uniforms, no RNG",
            "curation": "quality_score gate + dedup_clusters anti-join "
                        "(the curated_corpus_summary chain)",
        }
        _emit(out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
