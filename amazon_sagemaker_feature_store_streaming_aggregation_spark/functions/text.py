"""Text analysis functions (training-data pipeline extension).

Language-ID (stopword-overlap heuristic), quality scoring, token
counting and rolling-hash document fingerprinting over the
``documents`` table. Everything is built-in column expressions
(codegen, scan-side, zero shuffles) with exact DuckDB oracle twins:
counts are integers, ratios are single IEEE divisions of integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Tiny per-language stopword lists for the n-gram/stopword heuristic.
#: (Deterministic, embedded — a real deployment swaps in fastText et al.
#: behind the same column contract.)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "and", "is", "not", "of", "to", "in"),
    "es": ("el", "la", "los", "y", "es", "no", "un", "con"),
    "fr": ("le", "la", "les", "et", "est", "pas", "un", "avec"),
    "zh": ("的", "是", "不", "了", "在", "我", "有", "和"),
}

#: ASCII punctuation counted by the quality heuristics (explicit set —
#: regex character-class semantics differ across engines).
_PUNCT = ".,;:!?"

_TOKENS = "filter(split(trim({c}), '\\\\s+'), t -> t != '')"


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count, char count, punctuation ratio, stopword ratio and a
    composite quality score.

    quality = 0.4*[20 <= tokens <= 1000] + 0.3*(1 - punct_ratio)
            + 0.3*stopword_ratio   (all deterministic arithmetic)
    """
    tokens = _TOKENS.format(c=text_col)
    en_stop = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    punct_classes = "".join(f"\\\\{ch}" for ch in _PUNCT)
    return (
        df.withColumn("n_tokens", F.expr(f"size({tokens})").cast("long"))
        # BPE-ish sub-word segmentation: letter runs | digit runs |
        # single non-alnum marks (the GPT-2-style pre-tokenizer shape;
        # the pattern is chosen to behave identically under Java regex
        # and RE2, verified against DuckDB)
        .withColumn(
            "n_tokens_bpe",
            F.expr(
                f"size(regexp_extract_all({text_col},"
                " '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0))"
            ).cast("long"),
        )
        .withColumn("n_chars_m", F.length(text_col).cast("long"))
        .withColumn(
            "n_punct",
            F.expr(
                f"length({text_col}) - length(regexp_replace({text_col},"
                f" '[{punct_classes}]', ''))"
            ).cast("long"),
        )
        .withColumn(
            "n_stopwords",
            F.expr(
                f"size(filter({tokens}, t -> array_contains(array({en_stop}),"
                f" lower(t))))"
            ).cast("long"),
        )
        .withColumn(
            "punct_ratio",
            F.when(F.col("n_chars_m") > 0,
                   F.col("n_punct").cast("double") / F.col("n_chars_m").cast("double"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(F.col("n_tokens") > 0,
                   F.col("n_stopwords").cast("double") / F.col("n_tokens").cast("double"))
            .otherwise(F.lit(0.0)),
        )
        .withColumn(
            "quality_score",
            F.when((F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 1000), F.lit(0.4))
            .otherwise(F.lit(0.0))
            + F.lit(0.3) * (F.lit(1.0) - F.col("punct_ratio"))
            + F.lit(0.3) * F.col("stopword_ratio"),
        )
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language ID: per language, count tokens in its
    stopword list; argmax with deterministic tie-break (score desc,
    language code asc). Adds ``lang_pred`` + per-language scores."""
    tokens = _TOKENS.format(c=text_col)
    out = df
    for lang, words in sorted(LANG_STOPWORDS.items()):
        lst = ", ".join(f"'{w}'" for w in words)
        out = out.withColumn(
            f"score_{lang}",
            F.expr(
                f"size(filter({tokens}, t -> array_contains(array({lst}), lower(t))))"
            ).cast("long"),
        )
    structs = F.array(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("score"), F.lit(lang).alias("lang")
            )
            for lang in sorted(LANG_STOPWORDS)
        ]
    )
    # array_sort on (score asc, lang asc) then take the last of max score:
    # pick via aggregate: keep struct with higher score; ties -> smaller lang.
    return out.withColumn(
        "lang_pred",
        F.expr(
            "aggregate("
            + "array("
            + ", ".join(
                f"struct(score_{lang} as score, '{lang}' as lang)"
                for lang in sorted(LANG_STOPWORDS)
            )
            + "), cast(null as struct<score:bigint, lang:string>),"
            " (acc, x) -> case when acc is null then x"
            " when x.score > acc.score then x else acc end"
            ").lang"
        ),
    )


def with_fingerprint(
    df: DataFrame, text_col: str = "text", k: int = 9, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprint: k-gram 60-bit hashes, minimum per
    sliding window of ``window`` grams, distinct + sorted.

    The fingerprint is robust to local edits (standard winnowing,
    Schleimer et al. 2003) and each array element is reproducible in
    SQL, so the whole column has an exact oracle.

    The md5-gram array is let-bound once inside the fingerprint
    expression (operators/dedup.py::_let_bound): Catalyst's
    CollapseProject would otherwise inline it into the per-window
    ``array_min(slice(...))`` lambda and recompute the hash array for
    EVERY window — O(n^2) md5 calls per document (measured 930 s vs
    ~2 s at sf0.1). Round 1 paid a full corpus shuffle as an exchange
    barrier instead; the let binding removes that shuffle."""
    from ..operators.dedup import _let_bound, _parallelize_scan

    grams = f"""
      transform(
        sequence(1, greatest(length({text_col}) - {k - 1}, 1)),
        i -> cast(conv(substring(md5(substring({text_col}, i, {k})), 1, 15), 16, 10)
             as bigint)
      )
    """
    fp = _let_bound(
        grams,
        "__g",
        f"""array_sort(array_distinct(
          transform(
            sequence(1, greatest(size(__g) - {window - 1}, 1)),
            i -> array_min(slice(__g, i, {window}))
          )
        ))""",
    )
    return _parallelize_scan(df).withColumn("fingerprint", F.expr(fp))


def with_repetition(
    df: DataFrame, text_col: str = "text", ns: tuple[int, ...] = (2, 3)
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    "Scaling Language Models" §A1.1 — public paper): for each word
    n-gram size ``n`` emit

    * ``n_{n}grams`` — total n-grams in the document,
    * ``top_{n}gram_count`` — occurrences of the most frequent n-gram,
    * ``dup_{n}gram_tokens`` — n-grams occurring more than once
      (counted with multiplicity),
    * ``top_{n}gram_frac`` / ``dup_{n}gram_frac`` — the two ratios
      filters actually threshold on.

    All scan-side: instead of exploding every n-gram through a
    groupBy (an O(corpus tokens) shuffle at 100 TB), each document
    sorts its own n-gram array and computes the run-length stats with
    a single ``aggregate`` pass — integer arithmetic only, so DuckDB
    reproduces every value exactly (the oracle uses the unnest+group
    formulation; same integers). The token array and the sorted gram
    array are let-bound (operators/dedup.py::_let_bound) so
    CollapseProject cannot duplicate them into consumer lambdas, and
    the run-length struct is extracted in a SEPARATE projection whose
    source column is referenced 3x — multi-use non-cheap aliases are
    not collapsed, so the aggregate runs once per (doc, n).
    """
    from ..operators.dedup import _let_bound, _parallelize_scan

    out = _parallelize_scan(df)
    for n in ns:
        gram = "concat_ws(' ', " + ", ".join(
            f"element_at(__tk, i + {j})" for j in range(n)
        ) + ")"
        # Spark's sequence(1, 0) is a DESCENDING [1, 0], not empty —
        # short documents must be guarded explicitly.
        grams = (
            f"IF(size(__tk) >= {n}, "
            f"transform(sequence(1, size(__tk) - {n - 1}), i -> {gram}), "
            f"array())"
        )
        run_length = """aggregate(
            __gs,
            named_struct('prev', CAST(NULL AS STRING),
                         'run', CAST(0 AS BIGINT),
                         'best', CAST(0 AS BIGINT),
                         'dup', CAST(0 AS BIGINT)),
            (s, x) -> IF(x <=> s.prev,
                named_struct('prev', x, 'run', s.run + 1,
                             'best', s.best, 'dup', s.dup),
                named_struct('prev', x, 'run', CAST(1 AS BIGINT),
                             'best', greatest(s.best, s.run),
                             'dup', s.dup
                               + IF(s.run > 1, s.run, CAST(0 AS BIGINT)))),
            s -> named_struct(
                'best', greatest(s.best, s.run),
                'dup', s.dup + IF(s.run > 1, s.run, CAST(0 AS BIGINT))))"""
        struct_expr = _let_bound(
            _TOKENS.format(c=text_col),
            "__tk",
            _let_bound(
                f"array_sort({grams})",
                "__gs",
                "named_struct("
                "'total', CAST(size(__gs) AS BIGINT), "
                f"'rl', {run_length})",
            ),
        )
        tmp = f"__rep{n}"
        total = F.col(f"{tmp}.total")
        top = F.col(f"{tmp}.rl.best")
        dup = F.col(f"{tmp}.rl.dup")
        out = (
            out.withColumn(tmp, F.expr(struct_expr))
            .withColumn(f"n_{n}grams", total)
            .withColumn(f"top_{n}gram_count", top)
            .withColumn(f"dup_{n}gram_tokens", dup)
            .withColumn(
                f"top_{n}gram_frac",
                F.when(
                    total > 0,
                    top.cast("double") / total.cast("double"),
                ).otherwise(F.lit(0.0)),
            )
            .withColumn(
                f"dup_{n}gram_frac",
                F.when(
                    total > 0,
                    dup.cast("double") / total.cast("double"),
                ).otherwise(F.lit(0.0)),
            )
            .drop(tmp)
        )
    return out
