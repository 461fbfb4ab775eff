"""Incremental signature store: only new/changed docs are recomputed,
unchanged rows survive upserts untouched, replay is a no-op."""

from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.extensions.signature_store import (
    signature_batch,
    update_signature_store,
)
from e_commerce_etl_pipeline_spark.operators.upsert import read_upsert_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_signature_store(spark, tmp_path):
    store = str(tmp_path / "sigstore")
    d1 = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "pack my box with five dozen liquor jugs for the long trip"),
    ])
    computed = update_signature_store(spark, d1, store, batch_seq=1)
    assert {r.doc_id for r in computed.collect()} == {1, 2}

    stored1 = {r.doc_id: r.asDict() for r in read_upsert_table(spark, store).collect()}
    assert set(stored1) == {1, 2}
    assert all(r["sig_seq"] == 1 for r in stored1.values())

    # batch 2: doc 1 unchanged, doc 2 text changed, doc 3 new
    d2 = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "a completely different second document body with new words"),
        (3, "sphinx of black quartz judge my vow said the brand new doc"),
    ])
    computed = update_signature_store(spark, d2, store, batch_seq=2)
    assert {r.doc_id for r in computed.collect()} == {2, 3}

    stored2 = {r.doc_id: r.asDict() for r in read_upsert_table(spark, store).collect()}
    assert set(stored2) == {1, 2, 3}
    # unchanged doc kept its original row (seq and band keys identical)
    assert stored2[1] == stored1[1]
    # changed doc was rewritten: new fingerprint, new seq
    assert stored2[2]["text_md5"] != stored1[2]["text_md5"]
    assert stored2[2]["sig_seq"] == 2
    assert stored2[3]["sig_seq"] == 2

    # replay of batch 2 computes nothing and leaves the store byte-identical
    computed = update_signature_store(spark, d2, store, batch_seq=3)
    assert computed.count() == 0
    stored3 = {r.doc_id: r.asDict() for r in read_upsert_table(spark, store).collect()}
    assert stored3 == stored2


def test_store_bands_match_direct_computation(spark, tmp_path):
    store = str(tmp_path / "sigstore2")
    docs = _docs(spark, [
        (7, "one two three four five six seven eight nine ten eleven twelve"),
    ])
    update_signature_store(spark, docs, store, batch_seq=1)
    direct = signature_batch(docs).drop("text_md5").collect()[0].asDict()
    stored = (
        read_upsert_table(spark, store)
        .drop("text_md5", "sig_seq")
        .collect()[0]
        .asDict()
    )
    assert stored == direct
