from .incremental import incremental_upsert_stream, run_incremental_batch  # noqa: F401
