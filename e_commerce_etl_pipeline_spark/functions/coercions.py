"""Null-safe coercion kernel (column-expression builders, zero Python UDFs).

Re-expresses the reference's private scalar helpers as native Spark column
expressions so every coercion stays inside whole-stage codegen. Parity map
(reference file:line -> builder here):

- ``_safe_string``      tiktok_shop_transformer.py:23-45        -> safe_string
- ``_safe_decimal``     tiktok_shop_transformer.py:379-390      -> safe_decimal
- ``_safe_int``         tiktok_shop_transformer.py:392-399      -> safe_int
- ``_safe_bool``        tiktok_shop_transformer.py:439-449      -> safe_bool
- bool NaN->False       misa_crm_transformer.py:184-195         -> safe_bool_default_false
- ``_unix_to_datetime`` shopee_orders_transformer.py:36-43      -> epoch_to_ts_zero_null
- ``_safe_timestamp_utc`` + ms/s heuristic
                        tiktok_shop_transformer.py:401-437      -> epoch_to_ts
- ISO8601 coerce        misa_crm_transformer.py:172-181         -> iso_to_ts
- UTC -> +07 tz-naive   tiktok_shop_staging_loader.py:224-253   -> to_vn_naive
- 'nan'/'N/A'/'' scrub  shopee_orders_loader.py:403-442         -> null_scrub
- '%'/',' strip         misa_crm_loader.py:920-925              -> clean_numeric_string
- json.dumps columns    tiktok_shop_transformer.py:152-156      -> json_stringify

All builders accept a column name or Column and return a Column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Epoch-unit heuristic thresholds. The reference uses >1e10 in the TikTok
# transformer (tiktok_shop_transformer.py:431) and >=1e12 in the loaders
# (tiktok_shop_staging_loader.py:244-253, shopee_orders_loader.py:120-129,
# misa_crm_loader.py:900-911). Both are preserved; call sites pick one.
MS_THRESHOLD_TRANSFORM = 1e10
MS_THRESHOLD_LOADER = 1e12

VN_TZ = "Asia/Ho_Chi_Minh"

_NULL_LITERALS = ("nan", "NaN", "N/A", "null", "None", "NULL", "")

_TRUE_LITERALS = ("true", "1", "yes", "on")
_FALSE_LITERALS = ("false", "0", "no", "off")


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def safe_string(c: Column | str, max_len: int | None = None) -> Column:
    """str(v) with optional truncation to ``max_len``; NULL stays NULL."""
    out = _col(c).cast("string")
    if max_len is not None:
        out = F.substring(out, 1, max_len)
    return out


def safe_decimal(c: Column | str, precision: int = 18, scale: int = 4) -> Column:
    """Parse to decimal; ''/garbage -> NULL (try_cast semantics)."""
    s = F.trim(_col(c).cast("string"))
    return F.when(s == "", None).otherwise(s).try_cast(f"decimal({precision},{scale})")


def safe_float(c: Column | str) -> Column:
    s = F.trim(_col(c).cast("string"))
    return F.when(s == "", None).otherwise(s).try_cast("double")


def safe_int(c: Column | str) -> Column:
    """int(float(str(v))): '3.0' -> 3, 'x' -> NULL, NULL -> NULL."""
    d = safe_float(c)
    return d.try_cast("long")


def safe_bool(c: Column | str) -> Column:
    """true in {true,1,yes,on}; false in {false,0,no,off}; else NULL.

    Case-insensitive, like the reference's ``str(v).lower()``.
    """
    col = _col(c)
    s = F.lower(F.trim(col.cast("string")))
    return (
        F.when(col.isNull(), F.lit(None).cast("boolean"))
        .when(s.isin(*_TRUE_LITERALS), F.lit(True))
        .when(s.isin(*_FALSE_LITERALS), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def safe_bool_default_false(c: Column | str) -> Column:
    """MISA rule: NaN/NULL -> False (misa_crm_transformer.py:192-195)."""
    return F.coalesce(safe_bool(c), F.lit(False))


def _epoch_seconds(c: Column, ms_threshold: float) -> Column:
    d = c.cast("double")
    return F.when(d > F.lit(ms_threshold), d / 1000.0).otherwise(d)


def epoch_to_ts(c: Column | str, ms_threshold: float = MS_THRESHOLD_TRANSFORM) -> Column:
    """Epoch seconds-or-milliseconds -> UTC timestamp; unparseable -> NULL.

    Values above ``ms_threshold`` are treated as milliseconds (reference
    heuristic, tiktok_shop_transformer.py:418-437).
    """
    d = _col(c).cast("string").try_cast("double")
    secs = _epoch_seconds(d, ms_threshold)
    return F.timestamp_seconds(secs)


def epoch_to_ts_zero_null(c: Column | str,
                          ms_threshold: float = MS_THRESHOLD_TRANSFORM) -> Column:
    """Shopee rule: epoch 0 or NULL -> NULL (shopee_orders_transformer.py:36-43)."""
    d = _col(c).cast("string").try_cast("double")
    return F.when((d.isNull()) | (d == 0), F.lit(None).cast("timestamp")).otherwise(
        F.timestamp_seconds(_epoch_seconds(d, ms_threshold))
    )


def iso_to_ts(c: Column | str) -> Column:
    """ISO-8601 (tz-aware or naive) -> UTC timestamp; coerce errors to NULL.

    Matches ``pd.to_datetime(utc=True, errors='coerce')``
    (misa_crm_transformer.py:172-181). Session timezone must be UTC (we set
    it in session.py) so offset-less strings are read as UTC.
    """
    return _col(c).cast("string").try_cast("timestamp")


def to_vn_naive(c: Column | str) -> Column:
    """UTC timestamp -> Asia/Ho_Chi_Minh wall-clock, tz-naive (egress only).

    The warehouse convention: compute in UTC, store +07-naive
    (tiktok_shop_staging_loader.py:196-253, docs/TAI_LIEU_BAN_GIAO_ETL.txt).
    """
    return F.from_utc_timestamp(_col(c), VN_TZ).cast("timestamp_ntz")


def null_scrub(c: Column | str) -> Column:
    """Map literal 'nan'/'N/A'/'null'/'None'/'' (trimmed) -> NULL.

    Reference: shopee_orders_loader.py:403-442, misa_crm_loader.py:956-958.
    """
    col = _col(c)
    s = F.trim(col.cast("string"))
    return F.when(s.isin(*_NULL_LITERALS), F.lit(None).cast("string")).otherwise(col.cast("string"))


def clean_numeric_string(c: Column | str, precision: int = 18, scale: int = 4) -> Column:
    """Strip '%' and thousands ',' then numeric cast (misa_crm_loader.py:920-925)."""
    cleaned = F.regexp_replace(_col(c).cast("string"), "[%,]", "")
    return F.when(F.trim(cleaned) == "", None).otherwise(F.trim(cleaned)).try_cast(
        f"decimal({precision},{scale})"
    )


def json_stringify(c: Column | str) -> Column:
    """Struct/array column -> JSON string (NULL-safe), parity with json.dumps
    columns like payment_info_json (tiktok_shop_transformer.py:152-156)."""
    col = _col(c)
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(F.to_json(col))
