"""Latest-row-per-key (top-1 per group by event time).

Reference: ``2_batch_ingestion.ipynb:303-307`` —
``dense_rank() OVER (PARTITION BY cc_num ORDER BY datetime DESC)`` then
``filter(rank == 1)``. The reference's choice of ``dense_rank`` keeps
*ties* on the max timestamp (a key with two rows at its latest instant
yields two rows); ``row_number`` dedupes to exactly one. Both are
offered; default preserves reference semantics.

Scale: a single hash shuffle on the key + per-partition sort — the same
exchange the window aggregation already uses, so when chained after
``trailing_window_features`` Catalyst reuses the partitioning (no second
shuffle; verify via ``.explain``: one Exchange feeding both Window
nodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RANK_COL = "__latest_rank"


def latest_per_key(
    df: DataFrame,
    key: str = "cc_num",
    ts: str = "datetime",
    keep_ties: bool = True,
    tie_break: list[str] | None = None,
) -> DataFrame:
    """Keep each key's most recent row.

    ``keep_ties=True`` → ``dense_rank`` (reference fidelity, B11);
    ``keep_ties=False`` → ``row_number`` with optional deterministic
    ``tie_break`` ordering columns appended after the timestamp.
    """
    order = [F.col(ts).desc()]
    if not keep_ties and tie_break:
        order += [F.col(c).asc() for c in tie_break]
    w = Window.partitionBy(key).orderBy(*order)
    rank = F.dense_rank() if keep_ties else F.row_number()
    return (
        df.withColumn(_RANK_COL, rank.over(w))
        .filter(F.col(_RANK_COL) == 1)
        .drop(_RANK_COL)
    )
