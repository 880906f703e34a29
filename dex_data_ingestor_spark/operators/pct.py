"""Period-over-period change (YoY/QoQ) over a daily fact.

The reference fetches "the same fact N days ago" with one point-read
per row (reference: Hydration.py:199-228, Stellar.py:105-135) and
computes ``(cur - prev)/prev * 100`` (reference: utils.py:101-121).
Quirk preserved *as documented spec deviation* (SURVEY.md §7.3-4): the
reference's "year" and "quarter" offsets are both 14 days
(utils.py:87-99); the engine takes the offset as a parameter.

Two equivalent physical strategies (tests assert they agree):

- self-join: fact joined to itself on ``key, date - offset`` — Spark
  plans a shuffled hash join on (key, date); at 100 TB with
  date-partitioned facts this prunes to the two touched date ranges.
- window: per-key sort + ``lag`` when the calendar is dense. A lag
  over a row offset is only correct when every key has a row every
  day, so the join is the default.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from dex_data_ingestor_spark.functions.scalars import pct_change


def _shift_days(fact: DataFrame, date_col: str, days: int):
    """``date_col + days`` PRESERVING the column's type. ``date_add``
    returns DATE even for TIMESTAMP input, so using it unconditionally
    makes the self-join compare midnight-coerced dates against raw
    timestamps — every prior-row lookup silently misses (all-NULL
    ``_chg`` outputs, indistinguishable from "no prior row"). DATE
    keeps date_add (bit-identical to the original behavior); TIMESTAMP
    shifts via timestampadd; anything else is rejected loudly."""
    dtype = dict(fact.dtypes)[date_col]
    if dtype == "date":
        return F.expr(f"date_add({date_col}, {days})")
    if dtype.startswith("timestamp"):
        return F.expr(f"timestampadd(DAY, {days}, {date_col})")
    raise ValueError(
        f"period_over_period needs a DATE or TIMESTAMP {date_col!r}; "
        f"got {dtype}"
    )


def period_over_period(
    fact: DataFrame,
    keys: Sequence[str],
    date_col: str,
    value_cols: Sequence[str],
    offset_days: int,
    suffix: str = "_chg",
) -> DataFrame:
    """Attach % change vs the row ``offset_days`` earlier per key.

    Output keeps all fact columns and adds ``<value_col><suffix>`` per
    value column (NULL where no prior row or prior value is 0/NULL —
    the reference's null contract, utils.py:108-109,119-120).
    """
    prev = fact.select(
        *[F.col(k) for k in keys],
        _shift_days(fact, date_col, offset_days).alias(date_col),
        *[F.col(c).alias(f"__prev_{c}") for c in value_cols],
    )
    joined = fact.join(prev, on=[*keys, date_col], how="left")
    for c in value_cols:
        joined = joined.withColumn(
            f"{c}{suffix}", pct_change(F.col(c), F.col(f"__prev_{c}"))
        )
    return joined.drop(*[f"__prev_{c}" for c in value_cols])


def period_over_period_multi(
    fact: DataFrame,
    keys: Sequence[str],
    date_col: str,
    value_col: str,
    offsets: dict[str, int],
) -> DataFrame:
    """All period offsets in ONE shuffle (vs one self-join each).

    Each fact row is emitted once per role — current, and shifted
    forward by every offset — then a single (keys, date) hash-aggregate
    lines the roles up: at 100 TB this replaces N shuffled joins with
    one union (narrow) + one shuffle. Current-row presence is tracked
    with an explicit marker (not by the value being non-NULL), so facts
    with NULL values survive exactly as in the left-join form (tests
    assert agreement, including NULL-valued facts).

    Precondition: ``(keys, date_col)`` is unique in ``fact`` — the
    daily-fact PK contract the reference enforces (fact_token_daily_stats
    PK (token_id, date)). With duplicate key/date rows the hash-
    aggregate collapses them (MAX per role) while the join form keeps
    and multiplies them; this operator raises nothing at runtime, so
    callers with possibly-duplicated facts must dedup first.

    ``offsets``: output-suffix -> days, e.g. {"_yoy": 14, "_qoq": 7}.
    """
    # One narrow EXPLODE of each fact row into its roles instead of a
    # union of N+1 selects over ``fact``. The union form re-reads the
    # aggregated-fact subtree once per role: AQE stage reuse dedups
    # the computation (ReusedExchange), but every role branch still
    # re-READS the full fact shuffle — N+1 shuffle reads of the daily
    # fact at 100 TB. The explode reads it once and emits the same
    # (N+1)x rows into the same downstream exchange; rows, values and
    # the (keys, date) grouping are identical by construction.
    role_structs = [
        F.struct(
            F.col(date_col).alias(date_col),
            F.lit("cur").alias("__role"),
        )
    ]
    for suffix, days in offsets.items():
        role_structs.append(
            F.struct(
                _shift_days(fact, date_col, days).alias(date_col),
                F.lit(suffix).alias("__role"),
            )
        )
    unioned = fact.select(
        *[F.col(k) for k in keys],
        F.col(value_col),
        F.explode(F.array(*role_structs)).alias("__r"),
    ).select(
        *[F.col(k) for k in keys],
        F.col(f"__r.{date_col}").alias(date_col),
        F.col(value_col),
        F.col("__r.__role").alias("__role"),
    )
    agg_exprs = [
        F.max(F.when(F.col("__role") == "cur", F.col(value_col))).alias(
            value_col
        ),
        F.max(F.when(F.col("__role") == "cur", F.lit(1)).otherwise(F.lit(0)))
        .alias("__is_cur"),
    ]
    for suffix in offsets:
        agg_exprs.append(
            F.max(
                F.when(F.col("__role") == suffix, F.col(value_col))
            ).alias(f"__prev{suffix}")
        )
    grouped = unioned.groupBy(*keys, date_col).agg(*agg_exprs)
    out = grouped.filter(F.col("__is_cur") == 1).drop("__is_cur")
    for suffix in offsets:
        out = out.withColumn(
            f"{value_col}{suffix}",
            pct_change(F.col(value_col), F.col(f"__prev{suffix}")),
        ).drop(f"__prev{suffix}")
    return out
