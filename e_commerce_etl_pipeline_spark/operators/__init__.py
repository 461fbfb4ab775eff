from .dedup import (  # noqa: F401
    keep_newest,
    keep_last,
    drop_all_duplicates,
    drop_null_keys,
)
from .upsert import upsert  # noqa: F401
from .flatten import explode_outer_prefixed  # noqa: F401
from .lakehouse import lakehouse_upsert, merge_into_statement  # noqa: F401
from .layout import (  # noqa: F401
    read_time_range,
    retention_drop_partitions,
    write_time_partitioned,
)
