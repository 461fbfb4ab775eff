"""Time-band (range) self-join via a bucketed equi-join.

The reference implements no range/theta joins — its only join shapes are
point lookups and the MERGE outer-join (SURVEY §2.6; e.g.
``src/extractors/tiktok_shop_extractor.py:355-452``). This operator is an
extension in the spirit of its windowed incremental scans
(``src/extractors/shopee_orders_extractor.py:738-768``): pair rows that
share a key and fall within a time band of each other.

Scale rationale: expressing the band as
``a.key = b.key AND b.ts BETWEEN a.ts AND a.ts + W`` gives Spark an
equi-join on ``key`` alone, with the band as a post-join filter — per-key
quadratic, fatal for hot keys at 100 TB. Bucketing the time axis at the
band width ``W`` and probing ``(bucket, bucket + 1)`` folds the band into
the equi-join key: every row meets only its own and the adjacent bucket,
so per-task work is bounded by local time density, not per-key cardinality.
The 2x probe duplication is the entire overhead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType


# Epoch-micros plausibility ceiling: ~year 4000 (64e15 µs). Epoch NANOS
# for any modern instant are ~1.7e18 — three orders of magnitude above —
# so one threshold cleanly separates the two encodings.
_MAX_PLAUSIBLE_MICROS = 64_000_000_000_000_000


def ts_micros(df: DataFrame, ts_col: str) -> Column:
    """Microseconds-since-epoch for ``ts_col`` regardless of its physical
    encoding: TIMESTAMP, TIMESTAMP_NTZ (cast first; session tz is UTC so
    wall-clock == instant), or already-numeric epoch micros (LongType
    passes through). Centralizing the dispatch keeps operators robust to
    parquet writers that emit isAdjustedToUTC=false timestamps.

    LongType MUST be epoch MICROseconds. The driver's events table has
    shipped as TIMESTAMP(NANOS), which a raw ``spark.read`` under
    ``nanosAsLong`` hands over as epoch NANOS — silently 1000x off in
    every bucket and gap (``plans.queries.load_table`` normalizes this;
    raw reads do not). Rather than trust the caller, values above the
    plausible-micros ceiling (~year 4000) are treated as nanoseconds and
    divided down, so an unnormalized frame yields correct bands instead
    of garbage. Integer division — ns magnitudes exceed double's 2^53
    exact range, so no float path."""
    dtype = dict(zip(df.columns, [f.dataType for f in df.schema.fields]))[ts_col]
    col = F.col(ts_col)
    if isinstance(dtype, LongType):
        as_us = F.expr(f"`{ts_col}` div 1000")
        return F.when(
            F.abs(col) > F.lit(_MAX_PLAUSIBLE_MICROS), as_us
        ).otherwise(col)
    if isinstance(dtype, TimestampNTZType):
        col = col.cast("timestamp")
    return F.unix_micros(col)


def band_self_join(
    df: DataFrame, keys: list[str], ts_col: str, band_us: int
) -> DataFrame:
    """All ordered pairs (a, b) sharing ``keys`` with
    ``0 < ts(b) - ts(a) <= band_us`` (microseconds).

    Returns one row per pair: struct columns ``a`` and ``b`` carrying the
    original columns, plus ``gap_us``. The join runs as an equi-join on
    ``keys + [band bucket]`` — broadcast/SMJ eligible, AQE-skew-splittable.
    """
    us = ts_micros(df, ts_col)
    bucket = F.floor(us / F.lit(band_us))
    left = df.withColumn("_us", us).withColumn(
        "_probe", F.explode(F.array(bucket, bucket + 1))
    )
    right = df.withColumn("_us", us).withColumn("_bucket", bucket)
    a, b = left.alias("a"), right.alias("b")
    cond = [F.col(f"a.{k}") == F.col(f"b.{k}") for k in keys]
    cond += [
        F.col("a._probe") == F.col("b._bucket"),
        F.col("b._us") > F.col("a._us"),
        F.col("b._us") <= F.col("a._us") + F.lit(band_us),
    ]
    out_cols = df.columns
    joined = a.join(b, cond)
    return joined.select(
        F.struct(*[F.col(f"a.{c}") for c in out_cols]).alias("a"),
        F.struct(*[F.col(f"b.{c}") for c in out_cols]).alias("b"),
        (F.col("b._us") - F.col("a._us")).alias("gap_us"),
    )
