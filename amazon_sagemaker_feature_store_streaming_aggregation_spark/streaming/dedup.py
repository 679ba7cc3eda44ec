"""Streaming deduplication (training-data pipeline extension).

At-least-once transports (Kinesis/Kafka — the reference's bus, SURVEY
U3) redeliver records on retry/restart, and large-scale ingest
pipelines dedup at the edge before anything downstream sees the
duplicate. Spark-native formulation: watermark-bounded
``dropDuplicates`` — per-key state in the state store, evicted once the
watermark passes, so state is O(keys within the watermark horizon),
not O(all keys ever).

Two variants:

* :func:`dedup_stream_exact` — duplicate = same id column(s) (e.g. the
  md5 ``tid`` of G4, or an idempotency key). Uses
  ``dropDuplicatesWithinWatermark`` when available (Spark >= 3.5):
  duplicates are dropped if they arrive within the watermark delay of
  the first occurrence, the semantics an at-least-once redelivery
  needs (a redelivered record carries the SAME event time, but may
  arrive after the event-time watermark of the original has passed).
* :func:`dedup_stream_content` — duplicate = same content hash
  (``h64(text)``, the streaming twin of ``operators/dedup.py::
  dedup_exact``): dedups payload-identical documents during ingest.

100 TB: state is hash-partitioned on the dedup key across executors
(the same shuffle a batch groupBy pays), and the watermark bounds both
state size and the dedup horizon; an unbounded exact dedup of an
infinite stream is impossible by construction, which is why the batch
``dedup_exact`` exists for full-corpus passes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h64


def dedup_stream_exact(
    stream: DataFrame,
    id_cols: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop re-deliveries of the same ``id_cols`` within the watermark
    horizon. Output rows are the FIRST arrival of each key."""
    wm = stream.withWatermark(ts_col, watermark)
    if hasattr(wm, "dropDuplicatesWithinWatermark"):
        return wm.dropDuplicatesWithinWatermark(list(id_cols))
    return wm.dropDuplicates([*id_cols, ts_col])


def dedup_stream_content(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Content dedup: duplicate = identical ``text_col`` payload. The
    state key is the 8-byte ``h64(text)`` (cross-engine md5-derived
    hash, functions/hashing.py) — the state store and the dedup shuffle
    carry the hash, never the payload."""
    hashed = stream.withColumn("__th", h64(text_col))
    out = dedup_stream_exact(hashed, ["__th"], ts_col=ts_col, watermark=watermark)
    return out.drop("__th")
