from .batch import write_csv_single, write_parquet  # noqa: F401
from .compaction import (  # noqa: F401
    compact_parquet_dir,
    dir_stats,
    heal_compaction_swap,
    heal_swap_leftovers,
)
from .layout import (  # noqa: F401
    read_pruned,
    write_bucketed_table,
    write_hash_layout,
    write_zorder_layout,
    zorder_value,
)
