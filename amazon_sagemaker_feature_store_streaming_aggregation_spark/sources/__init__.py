from .batch import load_table, load_transactions  # noqa: F401
