"""Watermarked windowed aggregation and the custom stateful dedup
operator, driven through real Structured Streaming file sources."""

import datetime

from pyspark.sql import types as T

from e_commerce_etl_pipeline_spark.streaming.windowed import (
    enrich_with_dim,
    running_dedup_stream,
    session_counts,
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


USER_EV_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("event_type", T.StringType()),
])


def test_session_counts_gap_semantics(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        # user 1: two events 10 min apart (one session), then a 40-min gap
        # (> 30-min gap -> second session)
        (1, ts("2024-01-01T00:00:00"), "click"),
        (1, ts("2024-01-01T00:10:00"), "click"),
        (1, ts("2024-01-01T00:50:00"), "view"),
        # user 2: single event
        (2, ts("2024-01-01T00:05:00"), "click"),
        # far-future event advances the watermark so sessions finalize
        (3, ts("2024-01-01T09:00:00"), "click"),
    ]
    spark.createDataFrame(rows, USER_EV_SCHEMA).write.mode(
        "overwrite").parquet(str(src / "b1"))
    stream = spark.readStream.schema(USER_EV_SCHEMA).option(
        "recursiveFileLookup", "true").parquet(str(src))
    q = (session_counts(stream).writeStream.format("memory")
         .queryName("sess").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.user_id, r.session_start, r.n_events)
           for r in spark.sql("SELECT * FROM sess").collect()}
    assert (1, ts("2024-01-01T00:00:00"), 2) in got   # merged session
    assert (1, ts("2024-01-01T00:50:00"), 1) in got   # after the gap
    assert (2, ts("2024-01-01T00:05:00"), 1) in got


def test_enrich_with_dim_broadcast_join(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame([
        (1, ts("2024-01-01T00:00:00"), "click"),
        (9, ts("2024-01-01T00:01:00"), "view"),     # no dim match -> NULLs
    ], USER_EV_SCHEMA).write.mode("overwrite").parquet(str(src / "b1"))
    dim = spark.createDataFrame(
        [(1, "gold")], "user_id long, tier string")
    stream = spark.readStream.schema(USER_EV_SCHEMA).option(
        "recursiveFileLookup", "true").parquet(str(src))
    q = (enrich_with_dim(stream, dim, "user_id").writeStream
         .format("memory").queryName("enriched").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.user_id: r.tier for r in
           spark.sql("SELECT * FROM enriched").collect()}
    assert got == {1: "gold", 9: None}


CONV_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("r_ts", T.TimestampType()),
    T.StructField("conv_type", T.StringType()),
])


def test_join_streams_interval_attribution(spark, tmp_path):
    """Impressions ⨝ conversions within 15 minutes: in-window pairs
    join, out-of-window and unmatched events drop."""
    from e_commerce_etl_pipeline_spark.streaming.windowed import (
        join_streams_interval,
    )

    imp_dir, conv_dir = tmp_path / "imp", tmp_path / "conv"
    imp_dir.mkdir(), conv_dir.mkdir()
    spark.createDataFrame([
        (1, ts("2024-01-01T00:00:00"), "banner"),
        (2, ts("2024-01-01T00:00:00"), "banner"),
        (3, ts("2024-01-01T00:00:00"), "banner"),
    ], USER_EV_SCHEMA).write.mode("overwrite").parquet(str(imp_dir / "b1"))
    spark.createDataFrame([
        (1, ts("2024-01-01T00:10:00"), "purchase"),   # in window
        (2, ts("2024-01-01T00:40:00"), "purchase"),   # past 15 min -> drop
        (4, ts("2024-01-01T00:05:00"), "purchase"),   # no impression
        (9, ts("2024-01-01T09:00:00"), "noise"),      # advances watermark
    ], CONV_SCHEMA).write.mode("overwrite").parquet(str(conv_dir / "b1"))
    imps = spark.readStream.schema(USER_EV_SCHEMA).option(
        "recursiveFileLookup", "true").parquet(str(imp_dir))
    convs = spark.readStream.schema(CONV_SCHEMA).option(
        "recursiveFileLookup", "true").parquet(str(conv_dir))
    q = (join_streams_interval(imps, convs).writeStream.format("memory")
         .queryName("attrib").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.user_id, r.conv_type) for r in
           spark.sql("SELECT * FROM attrib").collect()}
    assert got == {(1, "purchase")}
