"""Point-in-time-correct training joins (offline-store read path).

The reference's training notebook joins *current* feature values to
historical labels (``3_train_and_deploy_model.ipynb`` trains on the
aggregates as they stand at dataset end) — safe there only because its
features are recomputed over the training window. The general
feature-store capability is the point-in-time join: every labeled
event reads each feature AS OF ITS OWN TIMESTAMP, never a later one,
so training-time features match what the model would have seen online
and future information cannot leak into the label row.

Spark-first: each feature history attaches via the union+sweep as-of
join (``operators/asof_join.py`` — one hash exchange on the entity
key, one running-window pass, no O(L x R) theta join). ``k`` feature
histories cost ``k`` sequential as-of passes over (labels + that
history); each pass shuffles only the label table plus the one
history it reads — at 100 TB that's the minimum data motion for the
semantics, and each pass is the E1-window envelope.

Per-feature staleness tolerances mirror the online path's cutoff
(reference I4, ``MaximumRecordAgeInSeconds``): a feature older than
its tolerance at label time is NULL in training exactly when the
online lookup would have discarded it — train/serve skew is the bug
this guards against.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame

from ..operators.asof_join import asof_join


def point_in_time_features(
    labels: DataFrame,
    histories: Mapping[str, DataFrame],
    key: str,
    label_ts: str = "ts",
    history_ts: str = "ts",
    tolerances_us: Mapping[str, int] | None = None,
    value_cols: Mapping[str, Sequence[str]] | None = None,
) -> DataFrame:
    """Attach every feature history to ``labels`` as of each label's
    own timestamp (backward, inclusive).

    ``histories`` maps a feature-group name to its history DataFrame
    (all rows ever written, not just the latest — the offline store).
    Each group's value columns arrive prefixed ``<group>__``, plus a
    ``<group>__asof_ts`` column holding the matched record's event
    time (NULL = no record existed yet, or it was staler than the
    group's tolerance). Label rows are never dropped.
    """
    tolerances_us = tolerances_us or {}
    out = labels
    for name, hist in histories.items():
        cols = (
            list(value_cols[name])
            if value_cols is not None and name in value_cols
            else [c for c in hist.columns if c not in (key, history_ts)]
        )
        renamed = hist.select(
            key,
            history_ts,
            *[hist[c].alias(f"{name}__{c}") for c in cols],
        )
        out = asof_join(
            out,
            renamed,
            key=key,
            probe_ts=label_ts,
            build_ts=history_ts,
            value_cols=[f"{name}__{c}" for c in cols],
            tolerance_us=tolerances_us.get(name),
            matched_ts_col=f"{name}__asof_ts",
        )
    return out
