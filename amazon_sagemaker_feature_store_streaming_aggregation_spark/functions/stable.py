"""Hash-stable output shaping for oracle comparison.

Floating-point aggregates (AVG over a window, cosine similarity) are
order-of-accumulation dependent; Spark and an external oracle engine
legally differ in the last ulps. The driver compares *value hashes*, so
``queries()`` entries round every accumulation-dependent double to a
fixed grain — applied identically in the oracle SQL. 2 decimal places
follows the reference's own output rounding
(``2_batch_ingestion.ipynb:320``: ``round(avg_amt_last_1w, 2)``);
ratio-scale values use 4 dp (values ≈ 1, so ulp error ≪ grain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stabilize_doubles(df: DataFrame, places: dict[str, int]) -> DataFrame:
    """Round the named double columns in place to the given decimals."""
    for name, p in places.items():
        df = df.withColumn(name, F.round(F.col(name), p))
    return df
