"""Time-series regularization operators: date-spine gap filling and
forward fill.

The reference materializes daily fact rows only for days a source row
arrived (fact_token_daily_stats keyed (token_id, date),
Stellar.py:138-148); consumers that need a dense series (charting,
window math over regular steps) must fill the gaps. These operators do
that Spark-side:

- ``date_spine``: per key, every day between its first and last
  observation (sequence + explode — narrow after one small agg).
- ``gap_fill_daily``: daily aggregate -> spine left-join -> forward
  fill via ``last(value, ignorenulls=True)`` over an unbounded-
  preceding row window.

Scale shape: one shuffle for the daily aggregate, one tiny agg for the
per-key bounds, one window pass partitioned by key. The spine explode
multiplies rows by calendar days, not data size — worst case is keys
with long idle spans, which AQE's skew handling splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: Per-event-id headroom of the packed tick ordering key below.
TICK_ORDER_ID_BOUND = 1 << 21


def packed_tick_order(
    ts: str = "ts", event_id: str = "event_id", unit: str = "hour"
) -> Column:
    """One-BIGINT total tick order: ``us_into_<unit> * 2^21 +
    event_id`` — the ordering key the OHLC family's open/close
    selection runs on (q_ohlc_bars, q_return_corr, the streaming
    twin). Packed into a single scalar because DuckDB's
    arg_min/arg_max accept only scalar keys, so the oracle can mirror
    it verbatim; within one <unit> bucket the key is monotone in
    (ts, event_id), breaking timestamp ties by event id.

    The packing is only an order if ``event_id < 2^21``: a larger id
    bleeds into the microsecond digits and can rank a LATER tick
    below an earlier one (wrong open/close — silently, since nothing
    overflows int64 until event_id ~2^42). Shipped fixtures stay far
    inside the bound (max 99,999 at sf0.1), but ids are unbounded at
    production scale, so the domain is enforced LOUDLY here: any row
    outside [0, 2^21) raises through ``assert_true`` instead of
    corrupting the bar series — the quantize_units posture. Tapes
    with larger ids should re-key (dense per-bucket ids) or widen the
    packing after re-deriving the overflow bound (us_into_hour needs
    2^32, leaving 2^31 of id room in int64; us_into_day needs 2^37)."""
    okey = (
        F.expr(
            f"timestampdiff(MICROSECOND, date_trunc('{unit}', {ts}), {ts})"
        )
        * F.lit(TICK_ORDER_ID_BOUND)
        + F.col(event_id)
    )
    in_domain = (F.col(event_id) >= 0) & (
        F.col(event_id) < F.lit(TICK_ORDER_ID_BOUND)
    )
    # assert_true yields NULL when the domain holds (raises otherwise),
    # so the coalesce keeps the key's value bit-identical to the
    # unguarded form on in-contract data.
    return okey + F.coalesce(
        F.assert_true(
            in_domain,
            F.concat(
                F.lit(
                    "packed_tick_order: event_id outside [0, 2^21) "
                    "breaks the packed ordering: "
                ),
                F.col(event_id).cast("string"),
            ),
        ).cast("bigint"),
        F.lit(0).cast("bigint"),
    )


def date_spine(
    daily: DataFrame, keys: list[str], date_col: str
) -> DataFrame:
    """One row per key per calendar day between that key's first and
    last observed date (inclusive)."""
    bounds = daily.groupBy(*keys).agg(
        F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1")
    )
    return bounds.select(
        *keys,
        F.explode(
            F.sequence("__d0", "__d1", F.expr("interval 1 day"))
        ).alias(date_col),
    )


def gap_fill_daily(
    daily: DataFrame,
    keys: list[str],
    date_col: str,
    value_col: str,
) -> DataFrame:
    """Dense daily series with forward-filled values.

    Output columns: keys, ``date_col``, ``value_col`` (last observed
    value carried forward), ``is_observed`` (1 on real rows, 0 on
    filled rows). Leading days before a key's first observation cannot
    exist (the spine starts at the first observation), so the filled
    value is never NULL.
    """
    spine = date_spine(daily, keys, date_col)
    joined = spine.join(daily, [*keys, date_col], "left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    observed = F.col(value_col).isNotNull().cast("int")
    return joined.select(
        *keys,
        F.col(date_col),
        F.last(value_col, ignorenulls=True).over(w).alias(value_col),
        observed.alias("is_observed"),
    )


def moving_avg_days(
    daily: DataFrame,
    keys: list[str],
    date_col: str,
    value_col: str,
    days: int = 7,
) -> DataFrame:
    """Trailing ``days``-day moving sum/avg per key over a (possibly
    sparse) daily series, using a RANGE frame in calendar days — gaps
    narrow the divisor instead of polluting it with phantom rows.

    Spark's rangeBetween needs a numeric ordering key, so dates are
    mapped to epoch-days; the frame is ``[-(days-1), 0]``. The window
    sum keeps the engine's exact-decimal discipline, so results are
    oracle-reproducible. One hash-partitioned window pass.
    """
    epoch_day = F.datediff(F.col(date_col), F.lit("1970-01-01"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(epoch_day)
        .rangeBetween(-(days - 1), 0)
    )
    msum = (
        F.sum(F.col(value_col).cast("decimal(18,6)"))
        .over(w)
        .cast("double")
    )
    n = F.count(F.lit(1)).over(w)
    return daily.select(
        *keys,
        F.col(date_col),
        F.col(value_col),
        msum.alias("moving_sum"),
        (msum / n).alias("moving_avg"),
        n.alias("n_days_present"),
    )


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_us: int = 30 * 60 * 1_000_000,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Batch gaps-and-islands sessionization: assign each row a
    per-key ``session_seq`` that increments whenever the gap to the
    previous row (event time, ordered by ``ts_col`` + tiebreak)
    exceeds ``gap_us`` microseconds (integral microsecond arithmetic —
    second-truncation semantics differ between engines).

    The batch complement of the engine's streaming session windows
    (streaming/jobs.py session_window): the reference's hourly
    micro-batches (src/main.py:54-66 re-runs tasks on a cron) make
    batch sessionization the natural shape for its backfills.

    Scale shape: two window passes, BOTH partitioned by the session
    key — no global window, no shuffle beyond the one hash exchange
    on ``key_cols`` (the second window reuses the first's
    partitioning). Skewed keys (one user with millions of events)
    are bounded by per-key data, and AQE handles the partition-level
    skew.
    """
    if "_prev_ts" in df.columns:
        # same contract as debounce below: never silently overwrite
        # (and then drop) a caller's column of the staging name
        raise ValueError(
            "sessionize: input already has a '_prev_ts' column; "
            "rename it first"
        )
    tiebreak = order_tiebreak or []
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *tiebreak)
    staged = df.withColumn("_prev_ts", F.lag(ts_col).over(w))
    is_new = F.when(
        F.col("_prev_ts").isNull()
        | (
            F.expr(f"timestampdiff(MICROSECOND, _prev_ts, {ts_col})")
            > F.lit(gap_us)
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    running = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return staged.withColumn(
        "session_seq", F.sum(is_new).over(running)
    ).drop("_prev_ts")


def scd2_intervals(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 build: turn an append-only
    changelog (one row per attribute change, the shape the reference's
    hourly incremental pulls produce — see SqlDbEtl's bookmark window)
    into versioned dimension rows with validity intervals:

    ``(keys..., attrs..., effective_from, effective_to, is_current)``

    where ``effective_from`` is the change's own timestamp,
    ``effective_to`` is the NEXT change's timestamp for the same key
    (half-open interval, NULL for the live row), and ``is_current``
    marks the latest version. Point-in-time dimension lookups then
    join on ``effective_from <= t AND (t < effective_to OR
    effective_to IS NULL)`` — the warehouse-side complement of the
    as-of join (operators/asof.py).

    Scale shape: ONE window pass partitioned by the dimension key —
    a single hash exchange on ``key_cols``; no self-join, no global
    ordering. Ties on ``ts_col`` are broken by ``order_tiebreak``
    (give it the changelog's monotone id) so intervals are
    deterministic under same-timestamp updates; a tie produces a
    zero-width (from == to) superseded version, never a lost row.
    """
    tiebreak = order_tiebreak or []
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *tiebreak)
    nxt = F.lead(ts_col).over(w)
    return df.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("effective_from"),
        nxt.alias("effective_to"),
        nxt.isNull().alias("is_current"),
    )


def debounce(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_us: int = 60 * 1_000_000,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Keep only the FIRST event of each per-key burst — the
    ingest-side throttle for retry storms, double-submits, and sensor
    chatter. A burst uses the ROLLING-extension rule (each event
    within ``gap_us`` of its predecessor extends the burst, so a
    chain of sub-gap events collapses to one survivor however long it
    runs): a burst IS a session at the debounce gap, and its leader
    is exactly the row :func:`sessionize` flags as starting a new
    island — so one lag window and a filter suffice; materializing
    island ids and ranking within them would re-derive the same rows
    through two extra window passes and a sort.

    Scale shape: ONE hash exchange on ``key_cols``, one window
    function, a narrow filter."""
    if "_prev_ts" in df.columns:
        # withColumn would silently overwrite (then drop) caller data
        raise ValueError(
            "debounce stages an internal '_prev_ts' column; rename the "
            "input's _prev_ts column first"
        )
    tiebreak = order_tiebreak or []
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *tiebreak)
    staged = df.withColumn("_prev_ts", F.lag(ts_col).over(w))
    keep = F.col("_prev_ts").isNull() | (
        F.expr(f"timestampdiff(MICROSECOND, _prev_ts, {ts_col})")
        > F.lit(gap_us)
    )
    return staged.filter(keep).drop("_prev_ts")
