"""Watermarked windowed aggregation and the custom stateful dedup
operator, driven through real Structured Streaming file sources."""

import datetime

from pyspark.sql import types as T

from e_commerce_etl_pipeline_spark.streaming.windowed import (
    running_dedup_stream,
    windowed_counts,
)

EV_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("event_type", T.StringType()),
])


def ts(s):
    return datetime.datetime.fromisoformat(s)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, EV_SCHEMA).write.mode("overwrite").parquet(path)


def test_windowed_counts_with_watermark(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(spark, str(src / "b1"), [
        (1, ts("2024-01-01T00:10:00"), "click"),
        (2, ts("2024-01-01T00:20:00"), "click"),
        (3, ts("2024-01-01T01:05:00"), "view"),
        (4, ts("2024-01-01T09:00:00"), "click"),  # advances watermark far
    ])
    stream = spark.readStream.schema(EV_SCHEMA).option(
        "recursiveFileLookup", "true").parquet(str(src))
    agg = windowed_counts(stream)
    q = (agg.writeStream.format("memory").queryName("wc")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {(r.window_start, r.event_type): r.n_events
            for r in spark.sql("SELECT * FROM wc").collect()}
    # windows before the (max_ts - 2h) watermark are finalized and emitted
    assert rows[(ts("2024-01-01T00:00:00"), "click")] == 2
    assert rows[(ts("2024-01-01T01:00:00"), "view")] == 1


def test_running_dedup_stream(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(spark, str(src / "b1"), [
        (1, ts("2024-01-01T00:00:00"), "click"),
        (2, ts("2024-01-01T00:01:00"), "click"),
        (3, ts("2024-01-01T00:02:00"), "view"),
    ])
    stream = spark.readStream.schema(EV_SCHEMA).option(
        "recursiveFileLookup", "true").parquet(str(src))
    out = running_dedup_stream(stream, "event_type")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    emitted = []

    def capture(batch_df, batch_id):
        rows = batch_df.collect()
        emitted.extend(r.key for r in rows)
        if rows:
            batch_df.write.mode("append").parquet(sink)

    def run_once():
        q = (out.writeStream.foreachBatch(capture)
             .outputMode("update").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    assert set(emitted) == {"click", "view"}

    # second micro-batch: one replayed key, one new key -> only new emitted
    emitted.clear()
    _write_batch(spark, str(src / "b2"), [
        (4, ts("2024-01-01T00:03:00"), "click"),
        (5, ts("2024-01-01T00:04:00"), "purchase"),
    ])
    run_once()
    assert set(emitted) == {"purchase"}  # 'click' state survived the restart
