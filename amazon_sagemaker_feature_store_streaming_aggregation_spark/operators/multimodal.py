"""Multimodal column plumbing (training-data pipeline extension).

Images/audio/video are carried as opaque ``binary`` columns with typed
metadata structs. The Spark-side contract — schema, partition-preserving
``mapInPandas`` with Arrow batches, UDF signatures, batch shapes — is
real and tested; the actual codec calls are stubbed (the decode
libraries are not in this container): ``decoder='stub'`` raises
``NotImplementedError`` exactly where a real decoder plugs in, and
``decoder='fake'`` is a deterministic md5-seeded fake used by tests.

Scale: mapInPandas streams Arrow batches through Python one partition
at a time — no collect, no shuffle; metadata-only transformations
(filtering by width, sampling frames by index) stay JVM-side because
the metadata is a plain struct column, so predicate pushdown and
column pruning still apply to everything except the opaque payload.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: media payload + typed metadata (one row per asset)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = "media_id long, kind string, features array<double>"


def synth_media(spark, docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic fake media table derived from the documents table
    (text bytes as payload + synthetic metadata) — test fixture only."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            (F.pmod(F.col("doc_id"), F.lit(64)) + 16).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(48)) + 16).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (F.pmod(F.col("doc_id"), F.lit(30)) + 1).cast("int").alias("n_frames"),
            F.lit("raw").alias("format"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic md5-seeded 'decoded feature' vector (stands in for
    decode -> resize -> embed; same contract, fake math)."""
    if payload is None:
        return np.zeros(dim)
    h = hashlib.md5(payload).digest()
    seed = int.from_bytes(h[:8], "big", signed=False)
    rng = np.random.default_rng(seed)
    return rng.random(dim)


def extract_features(
    media: DataFrame, decoder: str = "stub", dim: int = FEATURE_DIM
) -> DataFrame:
    """Decode + feature-extract each asset via Arrow-batched mapInPandas.

    ``decoder='stub'`` marks the real-codec integration point
    (NotImplementedError); ``'fake'`` produces deterministic vectors so
    the plumbing (batching, schema, ordering) is testable.
    """
    if decoder not in ("stub", "fake"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "stub":
                raise NotImplementedError(
                    "real image/audio decode requires codec libraries not "
                    "present in this environment; plug the decoder in here"
                )
            feats = [
                _fake_features(c, dim).tolist() for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling plan for videos: explode frame indices 0, n, 2n…
    from metadata JVM-side (no payload decode; the per-frame payload
    slice happens in the decode stage)."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )


def resize_plan(
    media: DataFrame, max_width: int = 32
) -> DataFrame:
    """Metadata-level resize planning: target dims computed JVM-side;
    payload transformation deferred to the decode stage (stub)."""
    scale = F.when(
        F.col("meta.width") > max_width,
        F.lit(max_width) / F.col("meta.width").cast("double"),
    ).otherwise(F.lit(1.0))
    return media.withColumn(
        "target",
        F.struct(
            F.round(F.col("meta.width") * scale).cast("int").alias("width"),
            F.round(F.col("meta.height") * scale).cast("int").alias("height"),
        ),
    )
