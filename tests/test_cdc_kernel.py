"""The Arrow CDC boundary kernel (text.cdc_boundaries_arrow): exact
parity with a pure-Python rolling hash (incl. unicode and degenerate
texts), bit-identical positions to the expression form it replaced on
the driver corpus, and end-to-end duplicate-span detection."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.extensions.text import (
    BOUNDARY_MASK,
    MIN_CHUNK,
    ROLL_BASE,
    ROLL_MOD,
    ROLL_W,
    cdc_boundaries_arrow,
    cdc_chunk_hashes_arrow,
    duplicate_chunk_spans,
)


def _py_positions(text: str | None) -> list[int]:
    if text is None:
        return []
    cp = [ord(c) for c in text]
    n = len(cp)
    if n < ROLL_W:
        return []
    powers = [pow(ROLL_BASE, ROLL_W - 1 - j, ROLL_MOD) for j in range(ROLL_W)]
    out = []
    for i in range(n - ROLL_W + 1):
        h = sum(cp[i + j] * powers[j] for j in range(ROLL_W)) % ROLL_MOD
        if h % (BOUNDARY_MASK + 1) == 0:
            out.append(i + 1)
    return out


def test_kernel_matches_python_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog " * 8,
        "short",
        "",
        "exactly8",                      # == ROLL_W chars
        "naïve café — déjà vu ünïcödé " * 10,   # non-ASCII code points
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",   # uniform content
        None,  # NULL text must yield zero boundaries, not crash the batch
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: list(r["pos"])
        for r in cdc_boundaries_arrow(df).collect()
    }
    assert got == {i: _py_positions(t) for i, t in enumerate(texts)}


def test_cdc_kernel_matches_expression(spark, sf_dir):
    """The kernel must reproduce the HOF expression it replaced,
    position for position, on the driver corpus (ASCII, where Spark's
    ascii() and code points coincide)."""
    docs = spark.read.parquet(sf_dir + "/documents.parquet")
    codes = F.transform(F.split(F.col("text"), ""),
                        lambda c: F.ascii(c).cast("long"))
    powers = [pow(ROLL_BASE, ROLL_W - 1 - j, ROLL_MOD) for j in range(ROLL_W)]

    def win_hash(i):
        acc = F.lit(0).cast("long")
        for j, p in enumerate(powers):
            acc = acc + F.element_at(F.col("codes"), i + j) * F.lit(p)
        return acc % ROLL_MOD

    n = F.size(F.col("codes"))
    idx = F.when(
        n >= ROLL_W, F.sequence(F.lit(1), n - (ROLL_W - 1))
    ).otherwise(F.array().cast("array<int>"))
    hashes = F.transform(idx, win_hash)
    positions = F.filter(
        F.transform(
            hashes,
            lambda h, i: F.when(h % (BOUNDARY_MASK + 1) == 0, i + 1),
        ),
        lambda x: x.isNotNull(),
    )
    expected = {
        r["doc_id"]: list(r["p"])
        for r in docs.select("doc_id", F.col("text"))
        .withColumn("codes", codes)
        .select("doc_id", positions.alias("p"))
        .collect()
    }
    got = {
        r["doc_id"]: list(r["pos"])
        for r in cdc_boundaries_arrow(docs.select("doc_id", "text")).collect()
    }
    assert got == expected


def test_chunk_hash_kernel_matches_expression(spark, sf_dir):
    """The one-pass chunk-hash kernel (r13) must reproduce the r12
    pipeline — boundary kernel + concat bounds + substring transform +
    explode + length gate + JVM md5 — row for row (as multisets: the
    kernel emits per-doc chunks in document order, the old explode did
    too, but only the multiset is contracted) on the driver corpus.
    Exercises the code-point slicing, UTF-8 md5, length-gate and
    NULL/short-text paths against real data."""
    docs = spark.read.parquet(sf_dir + "/documents.parquet").select(
        "doc_id", "text"
    )
    based = cdc_boundaries_arrow(docs).join(docs, "doc_id")
    bounds = F.concat(
        F.array(F.lit(0)), F.col("pos"), F.array(F.length("text").cast("int"))
    )
    with_bounds = based.select("doc_id", "text", bounds.alias("b"))
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(F.col("b")) - 1),
        lambda i: F.substring(
            F.col("text"),
            F.element_at(F.col("b"), i) + 1,
            F.element_at(F.col("b"), i + 1) - F.element_at(F.col("b"), i),
        ),
    )
    expected = sorted(
        tuple(r) for r in
        with_bounds.select("doc_id", F.explode(chunks).alias("chunk"))
        .filter(F.length("chunk") >= MIN_CHUNK)
        .select("doc_id", F.md5(F.col("chunk")).alias("chunk_hash"),
                F.length("chunk").cast("long").alias("chunk_len"))
        .collect()
    )
    got = sorted(
        tuple(r) for r in cdc_chunk_hashes_arrow(docs, MIN_CHUNK).collect()
    )
    assert got == expected


def test_chunk_hash_kernel_edge_texts(spark):
    """NULL, empty, short and non-ASCII texts through the chunk kernel
    vs the same expression pipeline (the sf corpus is ASCII-only)."""
    texts = [
        "the quick brown fox jumps over the lazy dog " * 8,
        "short",
        "",
        "naïve café — déjà vu ünïcödé, plus padding characters " * 10,
        None,
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    based = cdc_boundaries_arrow(docs).join(docs, "doc_id")
    bounds = F.concat(
        F.array(F.lit(0)), F.col("pos"), F.array(F.length("text").cast("int"))
    )
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(F.col("b")) - 1),
        lambda i: F.substring(
            F.col("text"),
            F.element_at(F.col("b"), i) + 1,
            F.element_at(F.col("b"), i + 1) - F.element_at(F.col("b"), i),
        ),
    )
    expected = sorted(
        tuple(r) for r in
        based.select("doc_id", "text", bounds.alias("b"))
        .select("doc_id", F.explode(chunks).alias("chunk"))
        .filter(F.length("chunk") >= MIN_CHUNK)
        .select("doc_id", F.md5(F.col("chunk")).alias("chunk_hash"),
                F.length("chunk").cast("long").alias("chunk_len"))
        .collect()
    )
    got = sorted(
        tuple(r) for r in cdc_chunk_hashes_arrow(docs, MIN_CHUNK).collect()
    )
    assert got == expected


def test_duplicate_span_detected_end_to_end(spark, tmp_path):
    # long enough that interior content-defined cuts are near-certain
    # (boundary density ~1/32 chars; ~37 expected over ~1.2k chars)
    shared = (
        "this exact paragraph is copied verbatim between documents, "
        "carrying plenty of characters 0123456789 so the rolling hash "
        "plants several chunk boundaries inside it. " * 7
    )
    d = str(tmp_path / "corpus")
    spark.createDataFrame(
        [
            (0, "unique preamble one. " + shared + " unique tail one.", "en"),
            (1, "different intro here! " + shared + " other ending.", "en"),
            (2, "completely unrelated text with no overlap at all here", "en"),
        ],
        "doc_id long, text string, lang string",
    ).write.parquet(d + "/documents.parquet")
    dup = duplicate_chunk_spans(spark, d).collect()
    assert dup, "planted duplicated span not detected"
    assert all(r["n_docs"] >= 2 for r in dup)
    assert {r["first_doc"] for r in dup} <= {0, 1}
