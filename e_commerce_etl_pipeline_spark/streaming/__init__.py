from .incremental import (  # noqa: F401
    incremental_upsert_stream,
    near_dup_index_stream,
    read_assignment,
    run_incremental_batch,
)
