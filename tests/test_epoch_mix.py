"""token_budget_mix_epochs (operators/sampling.py) — the Muennighoff
2023 data-constrained mixing recipe: repeat an under-sized source for
up to max_epochs deterministically-reshuffled epochs instead of
silently under-filling its token target."""

from __future__ import annotations

import pytest

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators import (
    token_budget_mix_epochs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, source string, text string")


# 6 docs x 4 tokens = 24 corpus tokens for source 'a'
A_ROWS = [(i, "a", "w%d x y z" % i) for i in range(6)]


def test_full_epochs_then_partial_cut(spark):
    # target = 60 tokens -> ceil(60/24) = 3 epochs: two full (48
    # tokens), third cut after 60 (here: cut mid-epoch-2)
    out = token_budget_mix_epochs(
        _docs(spark, A_ROWS), {"a": 10000}, budget_tokens=60, max_epochs=8
    ).collect()
    by_epoch = {}
    for r in out:
        by_epoch.setdefault(r.epoch, []).append(r)
        assert r.n_epochs == 3
    assert {len(by_epoch[0]), len(by_epoch[1])} == {6}  # full epochs
    assert 0 < len(by_epoch[2]) < 6  # partial final epoch
    assert max(r.cum_tokens for r in out) >= 60  # target met (<1 doc over)


def test_epochs_are_reshuffled(spark):
    out = token_budget_mix_epochs(
        _docs(spark, A_ROWS), {"a": 10000}, budget_tokens=48, max_epochs=8
    ).collect()
    order = {
        ep: [r.doc_id for r in sorted(out, key=lambda r: r.cum_tokens) if r.epoch == ep]
        for ep in (0, 1)
    }
    assert sorted(order[0]) == sorted(order[1]) == list(range(6))
    assert order[0] != order[1]  # fresh md5 order per epoch


def test_max_epochs_cap_reports_underfill(spark):
    # target 1000 >> 24*2: capped at 2 epochs, cum stops at 48 < 1000
    out = token_budget_mix_epochs(
        _docs(spark, A_ROWS), {"a": 10000}, budget_tokens=1000, max_epochs=2
    ).collect()
    assert len(out) == 12 and all(r.n_epochs == 2 for r in out)
    assert max(r.cum_tokens for r in out) == 48


def test_over_sized_source_stays_single_epoch(spark):
    out = token_budget_mix_epochs(
        _docs(spark, A_ROWS), {"a": 10000}, budget_tokens=8, max_epochs=4
    ).collect()
    assert all(r.epoch == 0 and r.n_epochs == 1 for r in out)
    assert len(out) == 2  # 8 tokens / 4 per doc


def test_rejects_bad_max_epochs(spark):
    with pytest.raises(ValueError, match="max_epochs"):
        token_budget_mix_epochs(
            _docs(spark, A_ROWS), {"a": 10000}, budget_tokens=8, max_epochs=0
        )
