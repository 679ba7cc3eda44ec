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
    # tokenize ONCE: the lowered token array is let-bound (the
    # single-element-transform trick from operators/dedup.py) and all
    # per-language scores evaluate off it inside one struct — the
    # per-column spelling re-ran the interpreted split+filter HOF once
    # per language (measured 2x slower at sf0.1)
    per_lang = ", ".join(
        "size(filter(__lt, t -> array_contains(array("
        + ", ".join(f"'{w}'" for w in words)
        + f"), t))) as s_{lang}"
        for lang, words in sorted(LANG_STOPWORDS.items())
    )
    bound = (
        f"transform(array(transform({tokens}, t -> lower(t))),"
        f" __lt -> struct({per_lang}))[0]"
    )
    out = df.withColumn("__ls", F.expr(bound))
    for lang in sorted(LANG_STOPWORDS):
        out = out.withColumn(
            f"score_{lang}", F.col(f"__ls.s_{lang}").cast("long")
        )
    out = out.drop("__ls")
    # pick via aggregate: keep struct with higher score; ties -> smaller lang.
    # NULL text (all scores NULL) predicts NULL — without the guard the
    # aggregate's first struct wins by default (NULL > NULL is NULL ->
    # keep acc) and a NULL-text doc would "predict" the alphabetically
    # first language.
    first = sorted(LANG_STOPWORDS)[0]
    return out.withColumn(
        "lang_pred",
        F.when(
            F.col(f"score_{first}").isNotNull(),
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
        ),
    )


# --------------------------------------------------------------- C-T lang-ID

#: Per-language training samples for the Cavnar–Trenkle profile (plain
#: composed sentences; profiles derive deterministically at import).
LANG_SAMPLES: dict[str, str] = {
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und die "
        "leute der stadt sagten dass es kein guter tag war um im regen "
        "draußen zu sein weil das wasser kalt war und der wind stark war "
        "aber sie gingen morgens zur arbeit und kamen abends mit ihren "
        "freunden und ihrer familie nach hause wo das essen schon auf dem "
        "tisch stand und alle zusammen aßen die regierung hat gestern neue "
        "gesetze angekündigt und viele menschen haben darüber gesprochen "
        "was das für die zukunft bedeuten könnte"
    ),
    "en": (
        "the quick brown fox jumps over the lazy dog and the people of "
        "the town said that it was not a good day to be out in the rain "
        "because the water was cold and the wind was strong but they went "
        "to work in the morning and came home at night with their friends "
        "and family where the food was already on the table and everyone "
        "ate together the government announced new laws yesterday and "
        "many people have been talking about what that could mean for "
        "the future"
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso y la gente "
        "del pueblo dijo que no era un buen día para estar bajo la lluvia "
        "porque el agua estaba fría y el viento era fuerte pero fueron al "
        "trabajo por la mañana y volvieron a casa por la noche con sus "
        "amigos y su familia donde la comida ya estaba en la mesa y todos "
        "comieron juntos el gobierno anunció ayer nuevas leyes y mucha "
        "gente ha estado hablando sobre lo que eso podría significar "
        "para el futuro"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et les "
        "gens de la ville ont dit que ce n était pas un bon jour pour "
        "être sous la pluie parce que l eau était froide et le vent était "
        "fort mais ils sont allés au travail le matin et sont rentrés "
        "chez eux le soir avec leurs amis et leur famille où le repas "
        "était déjà sur la table et tout le monde a mangé ensemble le "
        "gouvernement a annoncé hier de nouvelles lois et beaucoup de "
        "gens ont parlé de ce que cela pourrait signifier pour l avenir"
    ),
    "zh": (
        "敏捷的棕色狐狸跳过了懒惰的狗 镇上的人们说这不是一个适合在雨中"
        "外出的好日子 因为水很冷风很大 但他们早上去上班 晚上和朋友家人"
        "一起回家 那时饭菜已经摆在桌子上 大家一起吃饭 我们在一起的时候"
        "总是很开心 他有一个大家庭 今天天气很好 他们昨天宣布了新的计划 "
        "很多人都在谈论这对未来意味着什么 我们明天去公园玩"
    ),
}

#: C-T knobs: doc sample cap (chars), profile length, out-of-place
#: penalty for a missing n-gram. Grams of length 2 AND 3 (C-T uses a
#: mix of lengths; bigrams carry the signal on very short inputs).
#: 300 chars is Cavnar–Trenkle's own classification sample size; the
#: per-row gram count (and so the dominant interpreted-HOF cost) is
#: linear in this constant.
NGRAM_SAMPLE_CHARS = 300
PROFILE_K = 64
_OOP_PENALTY = PROFILE_K
_GRAM_LENS = (2, 3)


def _ct_grams(s: str) -> list[str]:
    """Python twin of the engine-side normalization + n-gram walk,
    used ONLY to derive the embedded profiles (constants shared by the
    Spark expression and the DuckDB oracle — cross-engine consistency
    depends on the doc side, not on how these constants were made)."""
    s = "".join(c if (c.isalpha() or c == " ") else " " for c in s.lower())
    s = " ".join(s.split())
    s = f" {s} "
    out: list[str] = []
    for n in _GRAM_LENS:
        if len(s) >= n:
            out.extend(
                g
                for i in range(len(s) - n + 1)
                if (g := s[i : i + n]).strip()  # no pure-padding grams
            )
    return out


def _ct_profile(sample: str, k: int = PROFILE_K) -> list[tuple[str, int]]:
    """Top-k n-grams of ``sample`` ranked by (count desc, gram asc) —
    the Cavnar–Trenkle ranked profile."""
    from collections import Counter

    counts = Counter(_ct_grams(sample))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(g, r) for r, (g, _c) in enumerate(ranked, start=1)]


#: lang -> [(gram, rank)] — derived once, deterministic.
LANG_PROFILES: dict[str, list[tuple[str, int]]] = {
    lang: _ct_profile(sample) for lang, sample in sorted(LANG_SAMPLES.items())
}


def _ct_norm_col(text_col: str):
    """Engine-side normalization: cap, lower, keep unicode letters and
    spaces, collapse runs, pad — every step has the same semantics in
    Spark (Java regex) and DuckDB (RE2)."""
    s = F.lower(F.substring(F.col(text_col), 1, NGRAM_SAMPLE_CHARS))
    s = F.regexp_replace(s, r"[^\p{L} ]", " ")
    s = F.regexp_replace(s, r" +", " ")
    return F.concat(F.lit(" "), F.trim(s), F.lit(" "))


def with_lang_id_ngram(
    df: DataFrame, text_col: str = "text", min_parallelism: int | None = None
) -> DataFrame:
    """Cavnar–Trenkle character-n-gram language ID (pure column
    expressions, scan-side, zero shuffles).

    Per document: normalize, take ranked top-``PROFILE_K`` 2-/3-grams
    (count desc, gram asc — deterministic), then score each language by
    out-of-place distance against its embedded ranked profile (missing
    gram costs ``_OOP_PENALTY``); prediction = argmin distance, ties to
    the lexicographically smaller code; null when the text yields no
    trigrams. Upgrades the stopword heuristic (:func:`with_lang_id`):
    morphology-bearing trigrams fire on text that contains no stopword
    at all, and the accuracy test shows it strictly beating the
    stopword baseline on such inputs.

    100 TB note: per-row cost is O(G log G) in the sampled gram count
    (sort + run-boundary counting; see the profile construction below)
    — bounded by ``NGRAM_SAMPLE_CHARS``, so per-row work is a constant
    independent of document length, exactly like the reference n-gram
    models that classify on a short prefix.
    """
    if min_parallelism is not None and df.rdd.getNumPartitions() < min_parallelism:
        # Compute-bound scan escape hatch: this operator does real
        # per-row work, so its wall-clock is bounded by SCAN
        # parallelism. A small/under-split input (e.g. one parquet
        # row group) serializes the whole job onto one task; a
        # round-robin spread of the raw (id, text) rows costs one
        # tiny exchange and buys back every core. At 100 TB the
        # file splits provide the parallelism and this stays None —
        # the row-wise result is identical either way.
        df = df.repartition(min_parallelism)
    norm = _ct_norm_col(text_col)
    out = df.withColumn("__ct_s", norm)
    walks = [
        f"case when length(__ct_s) >= {n} then "
        f"transform(sequence(1, length(__ct_s) - {n - 1}),"
        f" i -> substring(__ct_s, i, {n})) "
        f"else array() end"
        for n in _GRAM_LENS
    ]
    # pure-space grams only arise from the padding of empty/degenerate
    # texts (runs are collapsed) — drop them so such docs predict null
    tg = "filter(concat(" + ", ".join(walks) + "), g -> trim(g) != '')"
    # Ranked profile via sort + run boundaries: one O(G log G) sort,
    # then counts fall out of consecutive run-start indices. (The
    # naive distinct×filter spelling recounts the whole gram array for
    # every distinct gram — O(G·D) ≈ 5·10^5 interpreted comparisons
    # per row, measured 51 s for the sf0.1 documents table vs ~1 s for
    # this formulation. Higher-order functions are interpreted, never
    # codegen'd — keeping their complexity linear is what matters.)
    starts = (
        "IF(size(__ct_srt) = 0, array(), "
        "filter(sequence(1, size(__ct_srt)), i -> i = 1 OR "
        "element_at(__ct_srt, i) != element_at(__ct_srt, i - 1)))"
    )
    prof = (
        f"IF(size(__ct_st) = 0,"
        f" cast(array() as array<struct<negc:int,g:string>>),"
        f" slice(array_sort(transform(sequence(1, size(__ct_st)),"
        f" j -> struct("
        f"element_at(__ct_st, j)"
        f" - coalesce(try_element_at(__ct_st, j + 1),"
        f" size(__ct_srt) + 1) as negc,"
        f" element_at(__ct_srt, element_at(__ct_st, j)) as g"
        f"))), 1, {PROFILE_K}))"
    )
    out = (
        out.withColumn("__ct_tg", F.expr(tg))
        .withColumn("__ct_srt", F.expr("array_sort(__ct_tg)"))
        .withColumn("__ct_st", F.expr(starts))
        .withColumn("__ct_prof", F.expr(prof))
    )
    for lang in sorted(LANG_PROFILES):
        entries = ", ".join(
            f"'{g}', {r}L" for g, r in LANG_PROFILES[lang]
        )
        out = out.withColumn(
            f"dist_{lang}",
            F.expr(
                f"aggregate(transform(__ct_prof, (x, i) ->"
                f" coalesce(abs(try_element_at(map({entries}), x.g)"
                f" - (cast(i as long) + 1)), {_OOP_PENALTY}L)),"
                f" 0L, (acc, v) -> acc + v)"
            ),
        )
    pick = (
        "aggregate(array("
        + ", ".join(
            f"struct(dist_{lang} as d, '{lang}' as lang)"
            for lang in sorted(LANG_PROFILES)
        )
        + "), cast(null as struct<d:bigint, lang:string>),"
        " (acc, x) -> case when acc is null then x"
        " when x.d < acc.d then x else acc end).lang"
    )
    # Script detection precedes the n-gram model (as in real lang-ID
    # stacks): a majority-Han text is zh regardless of n-gram distance
    # — n-gram profiles from a small sample can't cover an ideographic
    # vocabulary. Java regex spells the class \p{IsHan}; RE2 (DuckDB)
    # spells it \p{Han}; semantics match.
    out = out.withColumn(
        "__ct_han",
        (
            F.length("__ct_s")
            - F.length(F.regexp_replace(F.col("__ct_s"), r"\p{IsHan}", ""))
        ).cast("long"),
    ).withColumn(
        "__ct_letters",
        F.length(F.regexp_replace(F.col("__ct_s"), r" ", "")).cast("long"),
    )
    return out.withColumn(
        "lang_pred_ngram",
        F.when(
            (F.col("__ct_han") > 0)
            & (F.col("__ct_han") * 2 > F.col("__ct_letters")),
            F.lit("zh"),
        )
        .when(F.size("__ct_prof") > 0, F.expr(pick))
        .otherwise(F.lit(None).cast("string")),
    ).drop(
        "__ct_s", "__ct_tg", "__ct_srt", "__ct_st", "__ct_prof",
        "__ct_han", "__ct_letters",
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
    # NULL text -> NULL fingerprint (explicit null routing): without
    # the guard, greatest(NULL-8, 1)=1 walks one gram of the NULL text
    # and the fingerprint becomes [NULL] — Spark's array_distinct KEEPS
    # the NULL (one phantom posexplode row) while DuckDB's
    # list_distinct drops it, so the two engines even disagree on it.
    return _parallelize_scan(df).withColumn(
        "fingerprint",
        F.when(F.col(text_col).isNotNull(), F.expr(fp)),
    )


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


#: the 8 Gopher "stop words" (Rae et al. 2021, arXiv:2112.11446 App. A)
_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def with_gopher_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher quality-rule flags (Rae et al. 2021, arXiv:2112.11446
    Appendix A — the published heuristic filter every large-scale
    pretraining recipe applies before model-based scoring): per
    document, the raw counts, one 0/1 flag per rule, and ``passes``
    (all rules hold). Rules, restated as INTEGER cross-multiplications
    so no ratio is ever a float (engine-bit-exact by construction):

    * ``f_word_count`` — ``min_words <= n_words <= max_words``;
    * ``f_mean_word_len`` — mean word length in [3, 10]:
      ``3*n_words <= word_chars <= 10*n_words``;
    * ``f_symbol_ratio`` — symbol-to-word ratio <= 0.1, symbols =
      '#' occurrences + maximal '...' runs: ``10*n_symbols <= n_words``;
    * ``f_bullet_lines`` — <= 90% of (non-empty, trimmed) lines start
      with a bullet ('-' or '*'): ``10*n_bullet_lines <= 9*n_lines``;
    * ``f_ellipsis_lines`` — <= 30% of lines end with '...':
      ``10*n_ellipsis_lines <= 3*n_lines``;
    * ``f_alpha_words`` — >= 80% of words contain an alphabetic char:
      ``5*n_alpha_words >= 4*n_words``;
    * ``f_stopwords`` — >= 2 distinct of the 8 Gopher stop words.

    ASCII-only heuristic by design (the paper's thresholds are
    English-corpus constants; unicode bullets/ellipses are out of
    scope and stated so). NULL text yields NULL counts, NULL flags and
    NULL ``passes`` — three-valued logic, the engine-wide NULL rule —
    so a pipeline must route NULLs explicitly rather than silently
    keep or drop them. Everything is scan-side codegen off ONE
    let-bound tokenization + line split (the ``with_lang_id``
    single-evaluation trick): zero shuffles, embarrassingly parallel.
    """
    toks = _TOKENS.format(c=text_col)
    lines = (
        f"filter(transform(split({text_col}, '\\n'), l -> trim(l)),"
        " l -> l != '')"
    )
    stop_arr = ", ".join(f"'{w}'" for w in _GOPHER_STOPWORDS)
    counts = f"""
      transform(array({toks}), __t ->
        transform(array(transform(__t, x -> lower(x))), __lt ->
          transform(array({lines}), __ln ->
            struct(
              cast(size(__t) as bigint) as n_words,
              aggregate(__t, 0L, (a, x) -> a + length(x)) as word_chars,
              cast(size(filter(__t,
                x -> regexp_like(x, '[A-Za-z]'))) as bigint) as n_alpha_words,
              cast(size(filter(array({stop_arr}),
                w -> array_contains(__lt, w))) as bigint) as n_stop_hits,
              cast(size(__ln) as bigint) as n_lines,
              cast(size(filter(__ln,
                l -> regexp_like(l, '^[\\\\-\\\\*]'))) as bigint)
                as n_bullet_lines,
              cast(size(filter(__ln,
                l -> regexp_like(l, '\\\\.{{3,}}$'))) as bigint)
                as n_ellipsis_lines
            )
          )[0]
        )[0]
      )[0]
    """
    n_symbols = (
        f"cast(length({text_col}) -"
        f" length(replace({text_col}, '#', ''))"
        f" + size(regexp_extract_all({text_col}, '\\\\.{{3,}}', 0))"
        " as bigint)"
    )
    out = df.withColumn("__g", F.expr(counts)).withColumn(
        "n_symbols", F.expr(n_symbols)
    )
    for c in (
        "n_words", "word_chars", "n_alpha_words", "n_stop_hits",
        "n_lines", "n_bullet_lines", "n_ellipsis_lines",
    ):
        out = out.withColumn(c, F.col(f"__g.{c}"))
    out = out.drop("__g")
    flags = {
        "f_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "f_mean_word_len": (F.col("word_chars") >= 3 * F.col("n_words"))
        & (F.col("word_chars") <= 10 * F.col("n_words")),
        "f_symbol_ratio": 10 * F.col("n_symbols") <= F.col("n_words"),
        "f_bullet_lines": 10 * F.col("n_bullet_lines")
        <= 9 * F.col("n_lines"),
        "f_ellipsis_lines": 10 * F.col("n_ellipsis_lines")
        <= 3 * F.col("n_lines"),
        "f_alpha_words": 5 * F.col("n_alpha_words") >= 4 * F.col("n_words"),
        "f_stopwords": F.col("n_stop_hits") >= 2,
    }
    passes = None
    for name, b in flags.items():
        out = out.withColumn(name, b.cast("int"))
        passes = b if passes is None else (passes & b)
    return out.withColumn("passes", passes.cast("int"))
