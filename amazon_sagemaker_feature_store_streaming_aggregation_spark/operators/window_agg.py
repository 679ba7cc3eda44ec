"""Trailing time-RANGE window aggregation (the reference's semantic core).

Reference: the batch aggregation SQL embedded in
``notebooks/2_batch_ingestion.ipynb:271-287`` — per-card trailing
COUNT/AVG over two time-range frames::

    COUNT(*) OVER w1 AS num_trans_last_10m,  AVG(amount) OVER w1 ...
    COUNT(*) OVER w2 AS num_trans_last_1w,   AVG(amount) OVER w2 ...
    w1 = (PARTITION BY cc_num ORDER BY cast(datetime as timestamp)
          RANGE INTERVAL 10 MINUTE PRECEDING)
    w2 = (... RANGE INTERVAL 1 WEEK PRECEDING)

Both frames are *trailing inclusive*: all of the key's rows with
``datetime in [current - T, current]``, including peers at the exact
same timestamp (RANGE semantics).

Spark-first design notes
------------------------
* Expressed with ``Window.partitionBy(key).orderBy(unix_micros(ts))
  .rangeBetween(-T_us, 0)`` — pure Catalyst ``WindowExec``: one hash
  shuffle on the key, one per-partition sort on the timestamp, then a
  streaming running-frame evaluation. Whole-stage-codegen'd input, no
  Python in the hot path.
* Ordering on ``unix_micros`` (exact integer microseconds) rather than a
  seconds cast preserves sub-second event times; the reference's
  ``cast(datetime as timestamp)`` ordering is equivalent for its
  second-granularity data.
* Both frames share one (partition, order) spec, so Catalyst plans a
  SINGLE exchange + sort for all four aggregates (one Window node).
* 100 TB: the shuffle is keyed on ``cc_num`` (high-cardinality card
  numbers → even distribution). A pathologically hot key serializes one
  partition; AQE skew handling does not split window partitions, so the
  documented mitigation is pre-bucketing the table by key or splitting
  hot keys with a bounded-history rewrite (state is (count, sum) per
  frame — see streaming/sliding_agg.py for the sketch form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TEN_MINUTES_US = 600 * 1_000_000
ONE_WEEK_US = 7 * 24 * 3600 * 1_000_000

#: Column with the amount in integer cents (deterministic long, exact
#: order-independent window SUM — see ``trailing_window_features_exact``).
AMT_CENTS = "_amt_cents"


def trailing_window_features(
    df: DataFrame,
    key: str = "cc_num",
    ts: str = "datetime",
    amount: str = "amount",
    short_us: int = TEN_MINUTES_US,
    long_us: int = ONE_WEEK_US,
    short_label: str = "10m",
    long_label: str = "1w",
) -> DataFrame:
    """Append the four trailing-window aggregate columns (B3–B6).

    Output columns: ``num_trans_last_{short}``, ``avg_amt_last_{short}``,
    ``num_trans_last_{long}``, ``avg_amt_last_{long}``.
    """
    order = F.unix_micros(F.col(ts).cast("timestamp"))
    w_short = (
        Window.partitionBy(key).orderBy(order).rangeBetween(-short_us, 0)
    )
    w_long = Window.partitionBy(key).orderBy(order).rangeBetween(-long_us, 0)
    # All four aggregates in ONE select: chained withColumn would
    # interleave Projects between the Window nodes and block Catalyst's
    # CollapseWindow rule (observed: 4 Window + 4 Sort nodes instead of
    # 2 Window + 1 Sort over a single exchange).
    return df.select(
        "*",
        F.count("*").over(w_short).alias(f"num_trans_last_{short_label}"),
        F.avg(amount).over(w_short).alias(f"avg_amt_last_{short_label}"),
        F.count("*").over(w_long).alias(f"num_trans_last_{long_label}"),
        F.avg(amount).over(w_long).alias(f"avg_amt_last_{long_label}"),
    )


def trailing_window_features_exact(
    df: DataFrame,
    key: str = "cc_num",
    ts: str = "datetime",
    amount: str = "amount",
    short_us: int = TEN_MINUTES_US,
    long_us: int = ONE_WEEK_US,
    short_label: str = "10m",
    long_label: str = "1w",
    keep_cent_sums: bool = False,
) -> DataFrame:
    """Bit-deterministic variant of :func:`trailing_window_features`.

    Floating-point SUM/AVG is accumulation-order dependent, so Spark and
    an external engine legally differ in the last ulps. Here amounts are
    first quantized to integer *cents* (``round(amount*100) :: long`` —
    exact for currency data, the reference's domain), the window SUM runs
    over longs (exact, order-independent), and the average is derived as
    ``(sum_cents / 100.0) / count`` — a fixed sequence of IEEE-754 ops on
    identical inputs, hence bit-identical across engines. Oracle twin::

        (SUM(cents) OVER w / 100.0) / COUNT(*) OVER w

    Same single-exchange WindowExec plan as the generic variant.
    """
    order = F.unix_micros(F.col(ts).cast("timestamp"))
    w_short = Window.partitionBy(key).orderBy(order).rangeBetween(-short_us, 0)
    w_long = Window.partitionBy(key).orderBy(order).rangeBetween(-long_us, 0)
    df = df.withColumn(AMT_CENTS, F.round(F.col(amount) * 100, 0).cast("long"))

    def avg_over(w):
        return (F.sum(AMT_CENTS).over(w) / F.lit(100.0)) / F.count("*").over(w)

    # Single select (see trailing_window_features): one Window node per
    # frame, one Sort, one Exchange.
    cols = [
        F.count("*").over(w_short).alias(f"num_trans_last_{short_label}"),
        avg_over(w_short).alias(f"avg_amt_last_{short_label}"),
        F.count("*").over(w_long).alias(f"num_trans_last_{long_label}"),
        avg_over(w_long).alias(f"avg_amt_last_{long_label}"),
    ]
    if keep_cent_sums:
        # Exact integer window sums, for downstream ops that must round
        # the average reproducibly (see plans/batch_ingest.py — half-up
        # rounding done in integer space, no double-rounding ambiguity).
        cols += [
            F.sum(AMT_CENTS).over(w_short).alias(f"sum_amt_cents_{short_label}"),
            F.sum(AMT_CENTS).over(w_long).alias(f"sum_amt_cents_{long_label}"),
        ]
    return df.select("*", *cols).drop(AMT_CENTS)


def trailing_window_features_bucketed(
    df: DataFrame,
    key: str = "cc_num",
    ts: str = "datetime",
    amount: str = "amount",
    bucket_s: int = 1,
    short_s: int = 600,
    long_s: int = 7 * 24 * 3600,
    short_label: str = "10m",
    long_label: str = "1w",
) -> DataFrame:
    """Hot-key (skew) rewrite of :func:`trailing_window_features_exact`:
    pre-aggregate ``(count, cent-sum)`` per ``(key, time-bucket)``, run
    the RANGE window over the BUCKETS, then join the per-bucket frame
    totals back to the rows.

    Why this kills skew: the per-key window input collapses from
    O(events) to O(active time buckets) — bounded by the time span
    (604 800 buckets/key/week at 1 s grain) no matter how hot the key —
    and every other stage distributes on ``(key, bucket)``, which
    spreads a hot key across the cluster. The groupBy's map-side
    partial aggregation means the shuffle also carries buckets, not
    events. The plain window plan cannot be skew-split by AQE (window
    partitions are atomic); this rewrite is the documented mitigation
    made code.

    The per-bucket frame totals are computed as a SWEEP, not a sliding
    window frame: every bucket emits an *enter* delta at its own
    position and an *exit* delta at ``pos + W + 1`` for each frame, and
    one running ``rowsBetween(unboundedPreceding, currentRow)``
    cumulative sum per key yields all four totals. Spark's bounded
    sliding frames re-aggregate the in-frame buffer on every row
    (aggregates cannot retract), i.e. O(rows x frame-width) — ruinous
    at a week-wide frame of 1 s buckets — while the running frame is a
    single O(n) pass.

    EXACT (bit-identical to :func:`trailing_window_features_exact`,
    tests assert it) whenever event times are multiples of ``bucket_s``
    seconds — the reference's domain is second-grain, so ``bucket_s=1``
    is exact there. For finer-grained timestamps the frame boundary
    truncates to bucket grain (a documented approximation; pick
    ``bucket_s`` at or below the data's grain to stay exact).
    """
    b = "__bucket"
    # Integer `div`, not floor(double /): exact for any epoch range (a
    # double quotient near an integer boundary could floor wrong).
    all_rows = df.withColumn(
        AMT_CENTS, F.round(F.col(amount) * 100, 0).cast("long")
    ).withColumn(
        b,
        F.expr(
            f"unix_micros(cast({ts} as timestamp)) div {1_000_000 * bucket_s}"
        ),
    )
    # NULL-timestamp rows are handled as their own per-key PEER GROUP
    # (matching the exact variant's RANGE-window null semantics) — the
    # bucketed equi-join below would otherwise silently DROP them
    # (NULL bucket never equi-joins), making the two variants disagree
    # on row count for dirty timestamps.
    null_rows = all_rows.where(F.col(b).isNull())
    rows = all_rows.where(F.col(b).isNotNull())

    # __bnn (non-NULL-amount count) rides the sweep so an all-NULL
    # frame can be told apart from a cancelled-out one: the running
    # SUM of deltas skips a NULL bucket sum but still nets earlier
    # +x/-x pairs to 0, where the exact variant's SUM over an
    # all-NULL frame is NULL — 0.0-vs-NULL divergence without it.
    buckets = rows.groupBy(key, b).agg(
        F.count("*").alias("__bn"),
        F.sum(AMT_CENTS).alias("__bs"),
        F.count(AMT_CENTS).alias("__bnn"),
    )

    # Sweep deltas. Frame [p - W, p] inclusive <=> bucket b' is in the
    # frame at query position p iff b' <= p < b' + W + 1, so b' enters
    # the running total at b' and leaves at b' + W + 1. All deltas are
    # cheap long arithmetic, so the explode is safe (no expensive-expr
    # re-eval hazard).
    w_s = F.lit(short_s // bucket_s)
    w_l = F.lit(long_s // bucket_s)
    n, s, nn = F.col("__bn"), F.col("__bs"), F.col("__bnn")
    zero = F.lit(0).cast("long")

    def delta(pos, dns, dss, dnns, dnl, dsl, dnnl):
        return F.struct(
            pos.alias("__pos"),
            dns.alias("__dns"),
            dss.alias("__dss"),
            dnns.alias("__dnns"),
            dnl.alias("__dnl"),
            dsl.alias("__dsl"),
            dnnl.alias("__dnnl"),
        )

    deltas = buckets.select(
        key,
        F.explode(
            F.array(
                delta(F.col(b), n, s, nn, n, s, nn),  # enters both frames
                delta(F.col(b) + w_s + 1, -n, -s, -nn, zero, zero, zero),
                delta(F.col(b) + w_l + 1, zero, zero, zero, -n, -s, -nn),
            )
        ).alias("__d"),
    ).select(key, "__d.*")

    # Collapse ties so positions are unique per key, then one O(n)
    # running cumulative sum (UnboundedPreceding frame = streaming add,
    # never re-aggregates a buffer).
    cum = deltas.groupBy(key, "__pos").agg(
        F.sum("__dns").alias("__dns"),
        F.sum("__dss").alias("__dss"),
        F.sum("__dnns").alias("__dnns"),
        F.sum("__dnl").alias("__dnl"),
        F.sum("__dsl").alias("__dsl"),
        F.sum("__dnnl").alias("__dnnl"),
    )
    w_run = (
        Window.partitionBy(key)
        .orderBy("__pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = cum.select(
        key,
        F.col("__pos").alias(b),
        F.sum("__dns").over(w_run).alias(f"num_trans_last_{short_label}"),
        F.sum("__dss").over(w_run).alias(f"sum_amt_cents_{short_label}"),
        F.sum("__dnns").over(w_run).alias(f"__nn_{short_label}"),
        F.sum("__dnl").over(w_run).alias(f"num_trans_last_{long_label}"),
        F.sum("__dsl").over(w_run).alias(f"sum_amt_cents_{long_label}"),
        F.sum("__dnnl").over(w_run).alias(f"__nn_{long_label}"),
    )

    def avg_of(label):
        # NULL when the frame holds only NULL-amount rows, exactly as
        # the exact variant's SUM over an all-NULL frame is NULL
        return F.when(
            F.col(f"__nn_{label}") > 0,
            (F.col(f"sum_amt_cents_{label}") / F.lit(100.0))
            / F.col(f"num_trans_last_{label}"),
        )

    # NULL-SAFE key equality: the exact variant's window puts all
    # NULL-key rows in ONE peer partition, so the bucketed rewrite
    # must join them back too — a plain equi-join never matches NULL
    # keys and silently drops every null-key row (caught by the
    # dirty-data oracle suite).
    totals_r = totals.withColumnRenamed(key, "__tk").withColumnRenamed(
        b, "__tb"
    )
    main = (
        rows.join(
            totals_r,
            F.col(key).eqNullSafe(F.col("__tk"))
            & (F.col(b) == F.col("__tb")),
            how="inner",
        )
        .drop("__tk", "__tb")
        .withColumn(f"avg_amt_last_{short_label}", avg_of(short_label))
        .withColumn(f"avg_amt_last_{long_label}", avg_of(long_label))
        .drop(
            b,
            AMT_CENTS,
            f"sum_amt_cents_{short_label}",
            f"sum_amt_cents_{long_label}",
            f"__nn_{short_label}",
            f"__nn_{long_label}",
        )
    )
    # null-ts peer group: every null row of a key sees all of the
    # key's null rows in BOTH frames (RANGE peers), same as the exact
    # variant's window over a null ordering value
    wn = Window.partitionBy(key)
    n_cnt = F.count("*").over(wn)
    n_avg = (F.sum(AMT_CENTS).over(wn) / F.lit(100.0)) / n_cnt
    null_out = (
        null_rows.withColumn(f"num_trans_last_{short_label}", n_cnt)
        .withColumn(f"avg_amt_last_{short_label}", n_avg)
        .withColumn(f"num_trans_last_{long_label}", n_cnt)
        .withColumn(f"avg_amt_last_{long_label}", n_avg)
        .drop(b, AMT_CENTS)
    )
    return main.unionByName(null_out.select(*main.columns))


def agg_features_query(
    transactions: DataFrame, exact: bool = True, keep_cent_sums: bool = False
) -> DataFrame:
    """The full E1 flagship query: windows (B3–B6) + ratio projection (B8).

    Reference: ``2_batch_ingestion.ipynb:271-287`` — outer SELECT adds
    ``amt_ratio1 = avg_amt_last_10m / avg_amt_last_1w``,
    ``amt_ratio2 = amount / avg_amt_last_1w``,
    ``count_ratio = num_trans_last_10m / num_trans_last_1w``.

    ``exact=True`` uses the cents-quantized deterministic window variant
    (bit-reproducible against the DuckDB oracle); ``exact=False`` is the
    reference-literal double AVG.
    """
    from .ratios import with_ratio_features

    if exact:
        win = trailing_window_features_exact(
            transactions, keep_cent_sums=keep_cent_sums
        )
    else:
        win = trailing_window_features(transactions)
    return with_ratio_features(win)
