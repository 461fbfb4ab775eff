from .dedup import (  # noqa: F401
    keep_newest,
    keep_last,
    drop_all_duplicates,
    drop_null_keys,
)
from .upsert import upsert  # noqa: F401
from .flatten import explode_outer_prefixed  # noqa: F401
from .lakehouse import lakehouse_upsert, merge_into_statement  # noqa: F401
from .retention import (  # noqa: F401
    drop_expired_partitions,
    read_date_range,
    write_dated,
)
