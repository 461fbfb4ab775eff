from .queries import QUERIES, load_table  # noqa: F401
