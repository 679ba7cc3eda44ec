from .batch import write_csv_single, write_parquet  # noqa: F401
from .compaction import compact_parquet_dir, dir_stats  # noqa: F401
from .layout import (  # noqa: F401
    read_pruned,
    write_bucketed_table,
    write_hash_layout,
    write_zorder_layout,
    zorder_value,
)
