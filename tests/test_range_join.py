import datetime

from pyspark.sql import functions as F

from e_commerce_etl_pipeline_spark.operators.range_join import band_self_join

BASE = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, i, BASE + datetime.timedelta(seconds=s)) for u, i, s in rows],
        "user_id long, event_id long, ts timestamp",
    )


def _naive_pairs(spark, df, band_us):
    a, b = df.alias("a"), df.alias("b")
    gap = F.unix_micros(F.col("b.ts")) - F.unix_micros(F.col("a.ts"))
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (gap > 0)
            & (gap <= band_us),
        )
        .select(
            F.col("a.event_id").alias("ia"),
            F.col("b.event_id").alias("ib"),
        )
    )


def test_band_join_matches_naive(spark):
    # gaps chosen to land inside, exactly on, and outside the band, and
    # to cross a bucket boundary (events at 59 s and 61 s with a 60 s band)
    rows = [
        (1, 0, 0), (1, 1, 30), (1, 2, 59), (1, 3, 61), (1, 4, 200),
        (2, 5, 0), (2, 6, 60), (2, 7, 121),
        (3, 8, 0),
    ]
    df = _events(spark, rows)
    band = 60 * 1_000_000
    got = {
        (r.a.event_id, r.b.event_id, r.gap_us)
        for r in band_self_join(df, ["user_id"], "ts", band).collect()
    }
    want = {
        (r.ia, r.ib)
        for r in _naive_pairs(spark, df, band).collect()
    }
    assert {(a, b) for a, b, _ in got} == want
    # exactly-on-band boundary included, just-outside excluded
    assert (5, 6, 60 * 1_000_000) in got
    assert all(0 < g <= band for _, _, g in got)
    # no duplicate pairs from the 2-bucket probe
    assert len(got) == len({(a, b) for a, b, _ in got})


def test_band_join_no_cross_key_pairs(spark):
    df = _events(spark, [(1, 0, 0), (2, 1, 10)])
    assert band_self_join(df, ["user_id"], "ts", 60_000_000).count() == 0


def test_long_ts_nanos_autocorrected(spark):
    """ADVICE r4: a LongType ts column holding epoch NANOS (what a raw
    spark.read of the TIMESTAMP(NANOS) events encoding yields under
    nanosAsLong) must not produce buckets/gap_us silently 1000x off —
    values above the plausible-micros ceiling are divided down to micros.
    """
    base_us = 1_700_000_000_000_000  # ~2023-11, plausible micros
    rows_us = [(1, 0, base_us), (1, 1, base_us + 30_000_000),
               (1, 2, base_us + 90_000_000)]
    df_us = spark.createDataFrame(rows_us, "user_id long, event_id long, ts long")
    df_ns = spark.createDataFrame(
        [(u, i, t * 1000) for u, i, t in rows_us],
        "user_id long, event_id long, ts long",
    )
    band = 60 * 1_000_000
    got_us = {(r.a.event_id, r.b.event_id, r.gap_us)
              for r in band_self_join(df_us, ["user_id"], "ts", band).collect()}
    got_ns = {(r.a.event_id, r.b.event_id, r.gap_us)
              for r in band_self_join(df_ns, ["user_id"], "ts", band).collect()}
    assert got_us == got_ns == {(0, 1, 30_000_000), (1, 2, 60_000_000)}
