"""Physical-encoding robustness for the events `ts` column.

The driver's testdata has shipped three different parquet encodings for
`ts` across rounds: TIMESTAMP(NANOS) (read as long nanos under
spark.sql.legacy.parquet.nanosAsLong), TIMESTAMP(MICROS,
isAdjustedToUTC=false) (read as TIMESTAMP_NTZ), and TIMESTAMP(MICROS,
isAdjustedToUTC=true) (read as TIMESTAMP). Round 3 lost two queries, three
tests, and the whole bench artifact to a silent ns→µs-NTZ switch. These
tests pin the contract: load_table always returns a session-TZ TIMESTAMP
with identical instants, whatever the writer emitted.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from e_commerce_etl_pipeline_spark.operators.range_join import band_self_join, ts_micros
from e_commerce_etl_pipeline_spark.plans.queries import load_table

# Deterministic instants (UTC), spanning a DST boundary in common zones so
# a wall-clock/instant confusion would actually change values.
INSTANTS_US = [
    1_700_000_000_000_000,
    1_700_000_123_456_789 // 1000 * 1000,  # µs-aligned
    1_711_846_800_000_000,  # 2024-03-31 01:00 UTC (EU DST switch hour)
]
EXPECTED = [
    datetime.datetime.utcfromtimestamp(us / 1e6).replace(microsecond=us % 1_000_000)
    for us in INSTANTS_US
]


def _write_fixture(dirpath: str, encoding: str) -> str:
    os.makedirs(dirpath, exist_ok=True)
    if encoding == "ns_long":
        arr = pa.array([us * 1000 for us in INSTANTS_US], pa.timestamp("ns"))
    elif encoding == "us_ntz":
        arr = pa.array(EXPECTED, pa.timestamp("us"))
    elif encoding == "us_ltz":
        arr = pa.array(EXPECTED, pa.timestamp("us", tz="UTC"))
    else:  # pragma: no cover
        raise ValueError(encoding)
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": arr,
            "user_id": pa.array([7, 7, 8], pa.int64()),
            "event_type": pa.array(["view", "click", "view"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(table, os.path.join(dirpath, "events.parquet"))
    return dirpath


@pytest.mark.parametrize("encoding", ["ns_long", "us_ntz", "us_ltz"])
def test_load_table_normalizes_ts(spark, tmp_path, encoding):
    sf = _write_fixture(str(tmp_path / encoding), encoding)
    df = load_table(spark, sf, "events")
    dtype = {f.name: f.dataType.simpleString() for f in df.schema.fields}["ts"]
    assert dtype == "timestamp", f"{encoding}: got {dtype}"
    got = sorted(r["ts"] for r in df.select("ts").collect())
    assert got == sorted(EXPECTED), f"{encoding}: instants drifted"


@pytest.mark.parametrize("encoding", ["ns_long", "us_ntz", "us_ltz"])
def test_ts_micros_dispatch(spark, tmp_path, encoding):
    sf = _write_fixture(str(tmp_path / encoding), encoding)
    df = load_table(spark, sf, "events")
    got = sorted(
        r["us"] for r in df.select(ts_micros(df, "ts").alias("us")).collect()
    )
    assert got == sorted(INSTANTS_US)


def test_band_self_join_accepts_ntz(spark, tmp_path):
    """band_self_join must analyze and run on a raw NTZ frame (no
    load_table normalization) — the operator is public API and callers may
    hand it whatever their reader produced."""
    sf = _write_fixture(str(tmp_path / "raw_ntz"), "us_ntz")
    raw = spark.read.parquet(os.path.join(sf, "events.parquet"))
    assert {f.name: f.dataType.simpleString() for f in raw.schema.fields}[
        "ts"
    ] == "timestamp_ntz"
    out = band_self_join(
        raw.select("event_id", "ts", "user_id"),
        ["user_id"],
        "ts",
        10**18,  # band wide enough to pair everything per-user
    )
    rows = out.collect()
    # user 7 has two events within the band -> exactly one ordered pair
    assert len(rows) == 1
    assert rows[0]["gap_us"] == INSTANTS_US[1] - INSTANTS_US[0]
