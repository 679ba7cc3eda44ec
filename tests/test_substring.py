"""Substring-level dedup (operators/substring.py — the Lee et al.
2021 ExactSubstr pass): span discovery/merge semantics plus a
duplicate-doc_id parity check the shared dirty fixture doesn't cover
(its document ids stay unique; repeated ids with DIFFERENT texts
exercise the merged-extents-per-id rule and the removal oracle's
per-(id, text) reconstruction)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from amazon_sagemaker_feature_store_streaming_aggregation_spark.operators.substring import (
    remove_repeated_spans,
    repeated_spans,
)

RUN = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spans_cross_doc_and_merge(spark):
    # the 8-token RUN repeats across docs 1/2 at different offsets;
    # with k=4 its five 4-token windows mark and merge into ONE
    # maximal extent per doc
    docs = _df(
        spark,
        [
            (1, f"{RUN} one two three"),
            (2, f"pre words here {RUN} tail"),
            (3, "totally different content with no repeats whatsoever"),
        ],
    )
    got = {
        (r["doc_id"]): (r["span_start"], r["span_end"], r["n_windows"])
        for r in repeated_spans(docs, k=4).collect()
    }
    assert got == {1: (0, 8, 5), 2: (3, 11, 5)}


def test_spans_within_doc_repeat_counts(spark):
    # the paper counts EVERY occurrence — a run repeated inside one
    # document alone is still "repeated"
    docs = _df(spark, [(1, f"{RUN} {RUN} coda"), (2, "unrelated words")])
    got = repeated_spans(docs, k=4).collect()
    assert len(got) == 1
    r = got[0]
    # windows 0..12 all repeat (every 4-window inside RUN RUN appears
    # twice or straddles identically); merged into one extent
    assert (r["doc_id"], r["span_start"]) == (1, 0)
    assert r["span_end"] >= 12


def test_short_docs_and_nulls_emit_nothing(spark):
    docs = _df(
        spark,
        [(1, "a b c"), (2, None), (None, f"{RUN} {RUN}"), (4, "")],
    )
    assert repeated_spans(docs, k=4).count() == 0


def test_removal_surgery_and_full_coverage(spark):
    docs = _df(
        spark,
        [
            (1, f"{RUN} one two three"),
            (2, RUN),          # fully covered -> empty string survives
            (3, RUN),
            (4, None),         # NULL text -> NULL through
        ],
    )
    got = {
        r["doc_id"]: (r["text_clean"], r["n_tokens"], r["n_removed"])
        for r in remove_repeated_spans(docs, k=4).collect()
    }
    assert got[1] == ("one two three", 11, 8)
    assert got[2] == ("", 8, 8)
    assert got[3] == ("", 8, 8)
    assert got[4] == (None, None, None)


@pytest.mark.parametrize("query", ["spans", "removed"])
def test_duplicate_doc_id_parity(spark, tmp_path, query):
    """Duplicate ids with different texts: extents merge per id and
    apply to EACH row's own token stream; the registered oracles must
    reproduce both, including the duplicated-row multiplicity."""
    from entry_ext import (
        _SUBSTRING_REMOVED_ORACLE,
        _SUBSTRING_SPANS_ORACLE,
        _q_dedup_substring_removed,
        _q_dedup_substring_spans,
    )

    from .oracle import assert_matches, run_oracle

    rows = [
        (1, " ".join(f"w{i}" for i in range(20)) + f" {RUN}"),
        (2, f"{RUN} " + " ".join(f"v{i}" for i in range(20))),
        (7, "dup id first version with plenty of words inside here"),
        (7, f"dup id second version {RUN} trailing"),
        (8, RUN),
        (8, RUN),  # identical duplicated row
        (None, f"{RUN} null id row outside accounting"),
        (9, None),
    ]
    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    if query == "spans":
        sdf = _q_dedup_substring_spans(spark, d)
        sql = _SUBSTRING_SPANS_ORACLE
    else:
        sdf = _q_dedup_substring_removed(spark, d)
        sql = _SUBSTRING_REMOVED_ORACLE
    assert_matches(sdf, run_oracle(sql, d))
