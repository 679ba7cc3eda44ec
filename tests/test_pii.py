"""PII detection/redaction (functions/pii.py): planted emails, phones
and card numbers are counted, redacted with stable tokens, and the
Luhn audit keeps only arithmetically-valid card candidates."""

from __future__ import annotations

from amazon_sagemaker_feature_store_streaming_aggregation_spark.functions import (
    luhn_valid_candidates,
    redact_pii,
    with_pii_flags,
)

DOCS = [
    (1, "contact me at jane.doe+spam@example.co.uk or call 415-555-0173"),
    (2, "card 4532015112830366 was charged twice, also 1234567890123456"),
    (3, "nothing sensitive here, just words and the number 42"),
    (4, "two mails: a@b.io c.d@e-corp.com and phone 212 555 0100"),
    (5, None),
]


def test_pii_counts_and_flag(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_emails"], r["n_phones"], r["n_cc16"], r["has_pii"])
        for r in with_pii_flags(df).collect()
    }
    assert got[1] == (1, 1, 0, True)
    assert got[2] == (0, 0, 2, True)
    assert got[3] == (0, 0, 0, False)
    assert got[4] == (2, 1, 0, True)
    assert got[5] == (-1, -1, -1, None) or got[5][3] is None  # null text


def test_redaction_replaces_with_tokens(spark):
    df = spark.createDataFrame(DOCS[:4], "doc_id long, text string")
    got = {r["doc_id"]: r["text_redacted"] for r in redact_pii(df).collect()}
    assert got[1] == "contact me at [EMAIL] or call [PHONE]"
    assert got[2] == "card [CARD] was charged twice, also [CARD]"
    assert got[3] == DOCS[2][1]  # untouched
    assert "[EMAIL]" in got[4] and "[PHONE]" in got[4]
    assert "@" not in got[4]


def test_luhn_audit_keeps_only_valid_cards(spark):
    df = spark.createDataFrame(DOCS[:4], "doc_id long, text string")
    got = [
        (r["doc_id"], r["candidate"])
        for r in luhn_valid_candidates(df).collect()
    ]
    # 4532015112830366 passes Luhn; 1234567890123456 does not
    assert got == [(2, "4532015112830366")]


def test_luhn_audit_exact_above_2_53(spark):
    """Candidates reach the Luhn UDF as STRINGS: 9999999999999995 is
    Luhn-valid and above 2^53, where any float64 detour would round
    the value before the digit math (the r4 string-contract bug
    class). 9999999999999999 differs only in the last digit and must
    still be rejected — a rounding detour would conflate the two."""
    df = spark.createDataFrame(
        [(1, "cards 9999999999999995 and 9999999999999999")],
        "doc_id long, text string",
    )
    got = [r["candidate"] for r in luhn_valid_candidates(df).collect()]
    assert got == ["9999999999999995"]
