"""Supervised quality classifier — the fastText/CCNet-shaped linear
model over the engine's hashed text features (the r12 verdict's
Missing #4).

The public recipe (CCNet, Wenzek et al. 2019; the LLaMA data work):
train a LINEAR classifier on labeled text — high-quality seed docs as
positives, boilerplate/crawl junk as negatives — and keep documents
the model accepts. This module supplies that recipe end to end on the
machinery the engine already has:

* **features** = :func:`~..operators.embedding.embed_text_hashed`'s
  signed feature-hashing bag (Weinberger 2009) — the SAME hash/sign/
  dims convention as every similarity operator, so the classifier
  scores with zero new scan machinery;
* **training** = full-batch logistic regression. Two interchangeable
  trainers: :func:`train_quality_classifier` (pure numpy over the
  built-in labeled fixture — the offline-artifact path, the
  ``write_lm_model`` deployment shape: deterministic, no Spark
  session needed, so oracle strings can inline its weights at import
  time) and :func:`train_quality_classifier_spark` (the 100-TB path:
  the embedded corpus is materialized once, each GD iteration is ONE
  distributed job — a scan-side sigmoid/residual projection and a
  64-key map-side-combined gradient aggregation; only ``dims`` floats
  ever reach the driver per iteration). Agreement between the two is
  pinned by tests/test_quality_clf.py;
* **scoring** = :func:`classify_quality`: EXACT int64 arithmetic —
  the document's ``q_micro`` integer embedding (micro-units) dotted
  with the micro-quantized weights plus a micro²-unit bias. One fixed
  integer sequence, bit-reproducible in DuckDB (the engine's oracle
  convention), scan-side, zero shuffles: classifying 100 TB is
  exactly as parallel as reading it.

Decision rule: ``quality_keep = quality_margin >= 0`` (the trained
decision boundary). Unscorable docs (NULL text / zero-norm bag) get a
NULL margin and a NULL keep — the ``quality_filter`` composition
drops them with the rejects (no evidence is not good evidence).

The built-in fixture (:func:`quality_training_fixture`) synthesizes
positives from fluent prose over the engine-domain vocabulary and
negatives from navigation/footer boilerplate — deterministic (md5-
indexed template picks, no RNG), so every process trains the
identical model and the registered oracle can bake the weights into
its SQL. Real deployments pass their own labeled frame to the Spark
trainer.
"""

from __future__ import annotations

import hashlib
import math
from functools import lru_cache
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .embedding import EMBED_QUANT, embed_text_hashed

#: positive-class template vocabulary — fluent prose over the corpus
#: domain (subjects/verbs/objects/connectives), so the classifier's
#: positive weights line up with real document tokens
_SUBJECTS = [
    "the query", "the table", "a stream", "the join", "the batch",
    "a window", "the scan", "the merge", "a filter", "the engine",
]
_VERBS = [
    "reads", "sorts", "merges", "filters", "joins", "groups",
    "scans", "batches", "orders", "hashes",
]
_OBJECTS = [
    "the data", "each row", "the column", "a small part",
    "the key order", "the hash value", "each group", "the big table",
    "a sorted line", "the fast stream",
]
_TAILS = [
    "before the next stage runs", "while the stream stays live",
    "and the part stays small", "so the sort can stay fast",
    "until the batch is done", "and the value stays in order",
    "as the window slides forward", "so the join stays cheap",
]

#: negative-class fragments — navigation/footer/consent boilerplate
#: (the crawl-junk class of the CCNet recipe)
_BOILER = [
    "home about contact privacy policy terms",
    "click here to subscribe to our newsletter",
    "copyright all rights reserved sitemap",
    "accept cookies manage settings login register",
    "follow us share like comment subscribe",
    "menu search cart checkout account wishlist",
    "faq support help center contact us",
    "sign up free trial pricing features download",
    "related posts tags categories archive rss",
    "advertisement sponsored content read more",
]


def _pick(seed: str, n: int) -> int:
    """Deterministic template index: md5-derived, no RNG state."""
    return int(hashlib.md5(seed.encode()).hexdigest()[:15], 16) % n


def quality_training_fixture(n_per_class: int = 200) -> list:
    """The built-in labeled fixture: ``(example_id, label, text)``
    rows, ``label`` 1 = high-quality prose, 0 = boilerplate.
    Deterministic by construction (md5-indexed picks)."""
    rows = []
    for i in range(n_per_class):
        s = _SUBJECTS[_pick(f"s:{i}", len(_SUBJECTS))]
        v = _VERBS[_pick(f"v:{i}", len(_VERBS))]
        o = _OBJECTS[_pick(f"o:{i}", len(_OBJECTS))]
        t = _TAILS[_pick(f"t:{i}", len(_TAILS))]
        rows.append((i, 1, f"{s} {v} {o} {t}"))
    for i in range(n_per_class):
        a = _BOILER[_pick(f"a:{i}", len(_BOILER))]
        b = _BOILER[_pick(f"b:{i}", len(_BOILER))]
        rows.append((n_per_class + i, 0, f"{a} {b}"))
    return rows


def _py_h64(s: str) -> int:
    """Pure-Python twin of functions/hashing.h64 (md5 60-bit)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _py_embed_unit(text: str, dims: int):
    """Pure-Python twin of embed_text_hashed's L2-normalized vector
    (training features only — the SCORING path uses the engine's own
    integer q_micro, so this twin never needs bit-parity with the
    scan expression, just the same hash/sign/bucket construction)."""
    hvec = [0] * dims
    for t in text.strip().split():
        h = _py_h64(t.lower())
        j = h % dims
        hvec[j] += 1 if (h // dims) % 2 == 0 else -1
    n2 = sum(v * v for v in hvec)
    if n2 == 0:
        return None
    inv = 1.0 / math.sqrt(n2)
    return [v * inv for v in hvec]


class QualityModel(NamedTuple):
    """Micro-quantized linear model: ``margin = bias_micro2 +
    Σ q_micro[d] * w_micro[d]`` — exact int64 (|q| ≤ 1e6, |w| bounded
    by the trainer's weight-norm assert, dims ≤ 4096 ⇒ far under
    2^63)."""

    w_micro: tuple
    bias_micro2: int
    dims: int


def _fit_logreg(X, y, iters: int, lr: float, l2: float):
    """Full-batch gradient descent, float64, fixed iteration count —
    deterministic for a fixed (X, y) ordering."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, d = X.shape
    w = np.zeros(d)
    b = 0.0
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        r = p - y
        w -= lr * ((X.T @ r) / n + l2 * w)
        b -= lr * (float(r.sum()) / n)
    return w, b


def _quantize_model(w, b, dims: int) -> QualityModel:
    import numpy as np

    assert float(np.abs(w).max()) < 100.0, (
        "trained weight magnitude leaves the exact-int64 margin "
        "envelope — lower lr or raise l2"
    )
    w_micro = tuple(int(round(float(x) * EMBED_QUANT)) for x in w)
    bias_micro2 = int(round(float(b) * EMBED_QUANT * EMBED_QUANT))
    return QualityModel(w_micro, bias_micro2, dims)


@lru_cache(maxsize=4)
def train_quality_classifier(
    dims: int = 64, iters: int = 300, lr: float = 2.0, l2: float = 1e-3
) -> QualityModel:
    """Train on the built-in fixture — pure Python/numpy, no Spark
    session, deterministic across processes (fixed example order,
    full-batch float64 GD), cached per process. This is the
    offline-artifact path: both the Spark scorer and the DuckDB
    oracle inline the SAME weights this returns."""
    rows = quality_training_fixture()
    X, y = [], []
    for _i, label, text in rows:
        v = _py_embed_unit(text, dims)
        if v is not None:
            X.append(v)
            y.append(label)
    w, b = _fit_logreg(X, y, iters, lr, l2)
    return _quantize_model(w, b, dims)


def train_quality_classifier_spark(
    labeled: DataFrame,
    dims: int = 64,
    iters: int = 300,
    lr: float = 2.0,
    l2: float = 1e-3,
    label_col: str = "label",
    text_col: str = "text",
) -> QualityModel:
    """The 100-TB trainer: same model, distributed gradient.

    The labeled corpus is embedded ONCE (scan-side) and eagerly
    localCheckpoint-ed — the per-iteration jobs start from a flat
    LogicalRDD, never re-running the fold (the embed fan-out
    contract). Each iteration is ONE job: scan-side sigmoid residual
    ``r = σ(w·x + b) − y``, then a ``posexplode`` → ``groupBy(dim)``
    gradient — 64 keys, map-side combined, so the shuffle moves dims
    rows per task and exactly ``dims`` floats reach the driver (a
    bounded metadata read, the repo's collect rule). Iterations are
    sequential by nature (GD); the per-iteration cost is one linear
    pass however large the corpus.

    Gradient floats are summed in shuffle order, so two runs can
    differ in final ulps — equality with the numpy trainer is pinned
    to a tolerance, and the DETERMINISTIC artifact for oracle-checked
    paths remains :func:`train_quality_classifier`."""
    emb = (
        embed_text_hashed(
            labeled.where(F.col(text_col).isNotNull()),
            dims=dims,
            id_col=label_col,
            text_col=text_col,
        )
        .where(F.col("norm2") > 0)
        .select(
            F.col(label_col).cast("double").alias("__y"),
            F.col("embedding").alias("__x"),
        )
        .localCheckpoint(eager=False)
    )
    # the count right here is the materializing action (lazy ckpt)
    n = emb.count()
    if n == 0:
        raise ValueError("no scorable labeled examples to train on")
    w = [0.0] * dims
    b = 0.0
    for _ in range(iters):
        w_lit = "array(" + ", ".join(f"cast({x!r} as double)" for x in w) + ")"
        z = (
            f"aggregate(zip_with(__x, {w_lit}, (x, w) -> cast(x as double) * w), "
            f"cast({b!r} as double), (acc, v) -> acc + v)"
        )
        resid = emb.select(
            (1.0 / (1.0 + F.exp(-F.expr(z))) - F.col("__y")).alias("__r"),
            "__x",
        )
        grad = (
            resid.select(
                F.posexplode("__x").alias("__d", "__xv"),
                F.col("__r"),
            )
            .groupBy("__d")
            .agg(F.sum(F.col("__r") * F.col("__xv").cast("double")).alias("__g"))
            .collect()
        )
        g = [0.0] * dims
        for row in grad:
            g[row["__d"]] = row["__g"]
        rsum = resid.agg(F.sum("__r")).first()[0] or 0.0
        w = [wi - lr * (gi / n + l2 * wi) for wi, gi in zip(w, g)]
        b = b - lr * (rsum / n)
    return _quantize_model(w, b, dims)


def classify_quality(
    docs: DataFrame,
    model: QualityModel | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score ``docs`` with the linear quality model: appends
    ``quality_margin`` (bigint — exact int64 ``bias + Σ q_micro·w``)
    and ``quality_keep`` (``margin >= 0``; NULL for unscorable docs).
    Scan-side only — the embedding fold plus one zip_with/aggregate
    per row, zero shuffles, zero UDFs, no driver actions."""
    if model is None:
        model = train_quality_classifier()
    w_lit = "array(" + ", ".join(f"{w}L" for w in model.w_micro) + ")"
    margin = (
        f"aggregate(zip_with(q_micro, {w_lit}, (x, w) -> x * w), "
        f"{model.bias_micro2}L, (acc, v) -> acc + v)"
    )
    out = embed_text_hashed(
        docs, dims=model.dims, id_col=id_col, text_col=text_col
    )
    return (
        out.withColumn("quality_margin", F.expr(margin))
        .withColumn("quality_keep", F.col("quality_margin") >= 0)
        .drop("hvec", "norm2", "embedding", "q_micro")
    )


def model_weights_sql(model: QualityModel | None = None) -> tuple:
    """(weights VALUES-list SQL, bias literal) for oracle builders:
    ``(VALUES (0, w0), (1, w1), ...) AS wts(dim, w)`` rows in the
    exact micro-unit integers the Spark scorer uses."""
    if model is None:
        model = train_quality_classifier()
    values = ", ".join(
        f"({d}, {w})" for d, w in enumerate(model.w_micro)
    )
    return f"(VALUES {values}) AS wts(dim, w)", str(model.bias_micro2)
