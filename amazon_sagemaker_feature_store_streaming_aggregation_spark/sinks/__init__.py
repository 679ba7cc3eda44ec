from .batch import write_csv_single, write_parquet  # noqa: F401
