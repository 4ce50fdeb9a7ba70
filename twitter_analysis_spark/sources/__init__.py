from .io import load_table, load_tables, write_parquet  # noqa: F401
