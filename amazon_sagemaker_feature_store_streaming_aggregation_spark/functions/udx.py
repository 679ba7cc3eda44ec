"""User-defined function surfaces: vectorized UDF, grouped UDAF, UDTF.

SURVEY §2.7 lists UDF/UDAF/UDTF as absent from the reference (its
only Python is driver-side glue), and this engine's own hot paths
deliberately avoid them — every shipped operator is built-in
expressions or Arrow-vectorized ``applyInPandas``/``mapInPandas``.
But an engine a reference user switches onto must *offer* the UD*
extension points, so each is demonstrated here with deterministic,
integer-only semantics that a DuckDB oracle reproduces bit-for-bit:

* :func:`luhn_check` — **scalar Pandas UDF** (Arrow-batched, numpy
  digit arithmetic — no per-row Python). Luhn mod-10 checksum over
  the 16-digit card domain of the reference
  (``0_prepare_transactions_dataset.ipynb`` generates ``cc_num`` as
  16-digit numbers).
* :func:`median_cents_udaf` — **grouped-aggregate Pandas UDF**
  (UDAF): exact lower-median over integer cents (order-statistic
  pick, no interpolation → no float divergence).
* :class:`WordPositions` — **UDTF** (Spark 4 ``@udtf``): one row per
  (position, word) of a text column. Row-at-a-time Python by
  construction — the API-surface demo; the engine's own tokenization
  uses ``explode(split(...))`` (codegen) for exactly this reason, and
  the equivalence is tested.

100 TB note: scalar Pandas UDFs ride whole-stage codegen boundaries
as ArrowEvalPython stages — vectorized, but still a JVM↔Python
round-trip per batch; prefer built-ins where expressible. UDTFs are
the slow path and should stay out of hot plans.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F


def make_luhn_check():
    """Scalar Pandas UDF factory (UDF types parse DDL at creation, so
    construction needs an active session — hence the factory)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def luhn_check(cc_num: pd.Series) -> pd.Series:
        """Luhn mod-10 checksum of a 16-digit card number (1 = valid).

        Takes the card number as a STRING: a nullable int64 Arrow
        batch surfaces in pandas as float64, which silently rounds
        values above 2^53 (~9.0e15 — a real slice of the 16-digit
        domain) before any digit math could run, and the same cc_num
        could then validate differently depending on whether its
        batch happened to carry a null.  The string path keeps the
        exact decimal representation end-to-end; the digits are still
        whole-array integer ``//``/``%`` after one exact str→int64
        parse (16 digits < 2^63), zero per-row Python.
        """
        ok = cc_num.notna()
        n = cc_num[ok].astype(np.int64)
        n = n.to_numpy(dtype=np.int64)
        total = np.zeros_like(n)
        for pos in range(16):  # 16 fixed positions, each whole-array
            d = (n // np.int64(10**pos)) % 10
            if pos % 2 == 1:  # every 2nd digit from the right doubles
                d = d * 2
                d = np.where(d > 9, d - 9, d)
            total = total + d
        out = pd.Series(pd.NA, index=cc_num.index, dtype="Int32")
        out[ok] = (total % 10 == 0).astype(np.int32)
        return out

    return luhn_check


def make_median_cents_udaf():
    """Grouped-aggregate Pandas UDF (UDAF) factory."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def median_cents_udaf(cents: pd.Series) -> int:
        """Exact lower median of integer cents.

        Order-statistic pick at index ``(n-1)//2`` of the sorted
        values — stays in int64 (no interpolation), so the result is
        engine- and partitioning-independent. Equivalent SQL:
        ``quantile_disc(0.5)`` over BIGINT (DuckDB).
        """
        # skip nulls (a null value row must not abort the group)
        v = np.sort(cents.dropna().to_numpy(dtype=np.int64))
        if len(v) == 0:
            return None
        return int(v[(len(v) - 1) // 2])

    return median_cents_udaf


def with_luhn_flag(df, cc_col: str = "cc_num", out: str = "luhn_ok"):
    """Apply the scalar UDF: one ArrowEvalPython stage.

    The cast to string happens JVM-side (exact decimal formatting of
    the long), so the Python worker never sees a lossy float64 — see
    :func:`make_luhn_check`.
    """
    return df.withColumn(out, make_luhn_check()(F.col(cc_col).cast("string")))


def median_value_by_user(events, key: str = "user_id", value: str = "value"):
    """UDAF over groups: exact lower-median cents per key.

    The groupBy shuffles (key, cents) pairs; each group's values meet
    the Python worker as ONE Arrow batch.
    """
    cents = F.expr(f"cast(round({value} * 100) as bigint)").alias("__cents")
    return (
        events.select(F.col(key), cents)
        .groupBy(key)
        .agg(make_median_cents_udaf()(F.col("__cents")).alias("median_cents"))
    )


def word_positions(documents, id_col: str = "doc_id", text_col: str = "text"):
    """UDTF surface: one output row per (pos, word) of each document.

    Declared lazily so importing this module never requires the UDTF
    runtime. The engine-native equivalent (tested equal) is
    ``select(id, posexplode(split(text, ' ')))`` — always prefer it in
    real plans; this exists to prove the table-function extension
    point works end-to-end.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, word: string")
    class WordPositions:
        def eval(self, doc_id: int, text: str):  # noqa: ANN001
            if text is None:
                return
            # Keep the ORIGINAL split index (1-based) and skip empty
            # tokens without compacting — matching the posexplode twin
            # (p0 + 1, then filter '') and the DuckDB oracle, so texts
            # with leading/consecutive spaces agree across all three.
            for pos, w in enumerate(text.split(" "), start=1):
                if w:
                    yield (pos, w)

    # lateral-join the UDTF against the table via SQL (the stable
    # Spark 4 surface for table arguments)
    import uuid as _uuid

    spark = documents.sparkSession
    # per-call unique names: a FIXED view/function name makes two
    # concurrent callers in one session clobber each other's input
    tag = _uuid.uuid4().hex[:12]
    fn = f"word_positions_{tag}"
    view = f"__udtf_docs_{tag}"
    spark.udtf.register(fn, WordPositions)
    documents.select(id_col, text_col).createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT d.{id_col}, t.pos, t.word
        FROM {view} d,
             LATERAL {fn}(d.{id_col}, d.{text_col}) t
        """
    )
