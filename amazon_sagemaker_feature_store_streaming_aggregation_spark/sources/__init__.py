from .batch import (  # noqa: F401
    load_table,
    load_transactions,
    read_transactions_csv,
    read_transactions_jsonl,
    read_transactions_orc,
)
