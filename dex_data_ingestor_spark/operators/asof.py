"""As-of / latest-value joins.

The reference resolves "current price" with a per-row
``SELECT ... ORDER BY created_at DESC LIMIT 1`` and a default of 1.0
when absent (reference: Stellar.py:67-78) — one network round trip per
row. The engine computes latest-per-key once with a rank window and
broadcast-joins it; the general as-of (latest value at-or-before each
probe timestamp) is a range-window over the union of quotes and probes,
avoiding the O(quotes × probes) theta-join entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """One row per key: maximum ``ts_col`` (ties broken by
    ``tiebreakers`` descending, so the result is deterministic)."""
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreakers]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def asof_lookup(
    probes: DataFrame,
    quotes: DataFrame,
    keys: Sequence[str],
    probe_ts: str,
    quote_ts: str,
    value_cols: Sequence[str],
    default=None,
    tolerance: str | None = None,
) -> DataFrame:
    """For each probe row, attach the latest quote value at or before
    the probe's timestamp (classic as-of join).

    Implemented as union + last-value range window: tag quotes 0 /
    probes 1, sort within each key by (ts, tag), and carry the last
    non-null quote value forward. One shuffle on ``keys``; no range
    join explosion. ``default`` (if given) fills probes with no earlier
    quote — the reference's ``Decimal("1.0")`` fallback.

    ``tolerance`` (an INTERVAL string, e.g. ``"1 hour"``) bounds quote
    staleness: a carried quote older than ``probe_ts - tolerance`` is
    discarded (back to ``default``/NULL) — the financial-data contract
    where a quote from last week must not price today's trade.
    Freshness is judged per value column against the timestamp of the
    quote that actually SUPPLIED the carried value (a newer quote with
    a NULL value does not launder an older value's staleness).

    Only QUOTE rows can supply a carried value (the ``__tag == 0``
    guard below): when the probe side already carries a column with a
    value column's name, an unguarded last-non-null would carry the
    probes' own values forward and contaminate later probes' as-of
    results; the guard makes the output the quote-supplied value in
    every case, matching the supplied-ts freshness logic.
    """
    tagged_q = quotes.select(
        *keys,
        F.col(quote_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.col(c) for c in value_cols],
    )
    probe_cols = [c for c in probes.columns]
    tagged_p = probes.select(
        *probe_cols,
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(dict(quotes.dtypes)[c]).alias(c) for c in value_cols
          if c not in probe_cols],
    )
    unioned = tagged_q.unionByName(tagged_p, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned
    for c in value_cols:
        carried = F.last(
            F.when(F.col("__tag") == 0, F.col(c)), ignorenulls=True
        ).over(w)
        if tolerance is not None:
            # Timestamp of the quote that supplied THIS column's value:
            # the last quote row where the column was non-null.
            supplied_ts = F.last(
                F.when(
                    (F.col("__tag") == 0) & F.col(c).isNotNull(),
                    F.col("__ts"),
                ),
                ignorenulls=True,
            ).over(w)
            fresh = supplied_ts >= F.col("__ts") - F.expr(
                f"INTERVAL {tolerance}"
            )
            carried = F.when(fresh, carried)
        filled = filled.withColumn(c, carried)
        if default is not None:
            filled = filled.withColumn(c, F.coalesce(F.col(c), F.lit(default)))
    return filled.filter(F.col("__tag") == 1).drop("__ts", "__tag")
