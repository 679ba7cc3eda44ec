"""PII detection and redaction (training-data pipeline extension).

A corpus destined for model training must be scrubbed of personally
identifying strings; the reference pipeline's domain (payment fraud,
16-digit card numbers — ``0_prepare_transactions_dataset.ipynb``
generates ``cc_num`` as 16-digit numbers) makes card-number hygiene a
first-class concern here.

Everything is scan-side column expressions over patterns chosen to
behave identically under Java regex (Spark) and RE2 (DuckDB) — no
lookarounds, no backreferences, explicit character classes:

* :data:`EMAIL_RE` — local@domain.tld shapes;
* :data:`PHONE_RE` — NNN<sep>NNN<sep>NNNN with ``-``/``.``/space
  separators (the conservative unambiguous shape);
* :data:`CC16_RE` — 16-digit runs, the card-number candidate shape.
  Counting/redaction treats every run as sensitive (a scrubber must
  over-redact, not under-redact); :func:`luhn_valid_candidates`
  additionally verifies candidates with the vectorized Luhn UDF
  (functions/udx.py) for audit queries that need precision.

100 TB: all three surfaces are per-row regex work inside whole-stage
codegen — zero shuffles, linear scan, pushdown-friendly (the
``has_pii`` flag is an ordinary boolean column a filter can consume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
CC16_RE = r"[0-9]{16}"

#: replacement tokens (stable, greppable downstream)
EMAIL_TOKEN = "[EMAIL]"
PHONE_TOKEN = "[PHONE]"
CC_TOKEN = "[CARD]"


def with_pii_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Count PII candidates per document: ``n_emails``, ``n_phones``,
    ``n_cc16`` and the composite ``has_pii`` flag."""
    def n(pattern: str):
        # Python-API regexp_extract_all: the pattern reaches Java regex
        # verbatim (no SQL string-literal escaping layer).
        return F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pattern), F.lit(0))
        ).cast("long")

    return (
        df.withColumn("n_emails", n(EMAIL_RE))
        .withColumn("n_phones", n(PHONE_RE))
        .withColumn("n_cc16", n(CC16_RE))
        .withColumn(
            "has_pii",
            (F.col("n_emails") + F.col("n_phones") + F.col("n_cc16")) > 0,
        )
    )


def redact_pii(
    df: DataFrame, text_col: str = "text", out: str = "text_redacted"
) -> DataFrame:
    """Replace every PII candidate with its stable token. Card numbers
    first (a 16-digit run must not survive inside a phone-ish match),
    then phones, then emails."""
    redacted = F.regexp_replace(F.col(text_col), CC16_RE, CC_TOKEN)
    redacted = F.regexp_replace(redacted, PHONE_RE, PHONE_TOKEN)
    redacted = F.regexp_replace(redacted, EMAIL_RE, EMAIL_TOKEN)
    return df.withColumn(out, redacted)


def luhn_valid_candidates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Audit query: one row per Luhn-VALID 16-digit candidate —
    ``(id, candidate)``. Candidates explode scan-side; the Luhn check
    is the vectorized Arrow UDF shared with the UDX surface."""
    from .udx import make_luhn_check

    cand = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(CC16_RE), F.lit(0))
        ).alias("candidate"),
    )
    # the candidate stays a STRING into the UDF: a long-typed Arrow
    # batch containing a null surfaces in pandas as float64, which
    # rounds values above 2^53 before any digit math (the exact bug
    # the string-input Luhn contract exists to prevent)
    return cand.withColumn(
        "luhn_ok", make_luhn_check()(F.col("candidate"))
    ).filter(F.col("luhn_ok") == 1).drop("luhn_ok")
