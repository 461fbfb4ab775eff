from .coercions import (  # noqa: F401
    safe_string,
    safe_decimal,
    safe_int,
    safe_bool,
    safe_bool_default_false,
    epoch_to_ts,
    epoch_to_ts_zero_null,
    iso_to_ts,
    to_vn_naive,
    null_scrub,
    clean_numeric_string,
    json_stringify,
)
