from .etl import full_load_pipeline, incremental_pipeline, RunAudit  # noqa: F401
