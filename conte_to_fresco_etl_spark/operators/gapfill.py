"""Time-spine gap filling and gap detection for irregular time series.

The reference's FRESCO model emits per-(job, host, timestamp) samples at
whatever cadence the collectors achieved — monitoring feeds drop samples
(reference semantics: conte-to-fresco-etl's transform keeps only rows
whose timestamps parse; gaps are implicit).  Downstream consumers that
window or resample need a REGULAR grid.  These operators regularize:

- ``fill_time_gaps``: per-key hourly spine from first to last observed
  bucket, observed buckets carry the (decimal-exact) mean value,
  missing buckets are filled by last-observation-carried-forward.
- ``detect_gaps``: the complementary audit — consecutive-event deltas
  exceeding a threshold, emitted as explicit gap rows.

Scale posture: the spine is GENERATED, not joined from a calendar
table — ``sequence()`` expands per key map-side after a tiny per-key
min/max aggregate, so spine size is |keys| x |buckets| with no shuffle
beyond the one hourly aggregation and the spine-observed join on
(key, bucket).  The LOCF window orders each key's buckets once — the
same single per-key sort every windowed operator here pays.  At 100 TB
the spine is orders of magnitude smaller than the input (it is the
DOWNSAMPLED series), so the join's shuffle is input-bound, not
spine-bound.  Skewed keys (one chatty host) hit the hourly aggregate,
which partial-aggregates map-side before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from conte_to_fresco_etl_spark.functions.core import normalize_ntz


def fill_time_gaps(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    round_to: int = 6,
) -> DataFrame:
    """Hourly regularization with LOCF fill.

    Output: ``(key, bucket_hour, value_filled, is_observed)`` — one row
    per key per hour between that key's first and last observed hour.
    Observed hours carry ``ROUND(mean(value), round_to)`` where the
    mean is a DECIMAL(18,4) sum over an exact count (order-independent,
    so cross-engine reproducible); unobserved hours carry the latest
    preceding observed value.  The first spine bucket is observed by
    construction, so ``value_filled`` is never NULL.
    """
    src = normalize_ntz(df)
    hourly = (
        src.select(
            F.col(key_col),
            F.date_trunc("hour", F.col(ts_col)).alias("bucket_hour"),
            F.col(value_col).cast("decimal(18,4)").alias("__v"),
        )
        .groupBy(key_col, "bucket_hour")
        .agg(
            F.round(
                F.sum("__v").cast("double") / F.count("*"), round_to
            ).alias("value_observed")
        )
        # referenced twice below (spine bounds + the observed join) —
        # persist the dimension-sized hourly table so the raw stream is
        # scanned once, not once per reference
        .persist()
    )
    spine = (
        hourly.groupBy(key_col)
        .agg(F.min("bucket_hour").alias("h0"), F.max("bucket_hour").alias("h1"))
        .select(
            F.col(key_col),
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("bucket_hour"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, [key_col, "bucket_hour"], "left")
        .select(
            F.col(key_col),
            F.col("bucket_hour"),
            F.last("value_observed", ignorenulls=True)
            .over(w)
            .alias("value_filled"),
            F.col("value_observed").isNotNull().alias("is_observed"),
        )
    )


def detect_gaps(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    min_gap_seconds: int = 3600,
) -> DataFrame:
    """Explicit gap rows: per key, consecutive-event deltas strictly
    greater than ``min_gap_seconds``.

    Output: ``(key, gap_start, gap_end, gap_seconds)`` where gap_start
    is the last event before the silence and gap_end the first after.
    One per-key window sort; no joins.  Deterministic tiebreak: events
    at the same timestamp are ordered by their delta-irrelevant
    position (equal timestamps produce a zero delta either way).
    """
    src = normalize_ntz(df)
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc())
    lagged = src.select(
        F.col(key_col),
        F.lag(F.col(ts_col)).over(w).alias("gap_start"),
        F.col(ts_col).alias("gap_end"),
    )
    gap_s = (
        F.unix_micros("gap_end") - F.unix_micros("gap_start")
    ) / F.lit(1_000_000.0)
    return (
        lagged.filter(
            F.col("gap_start").isNotNull()
            & (gap_s > F.lit(float(min_gap_seconds)))
        )
        .select(
            F.col(key_col),
            "gap_start",
            "gap_end",
            F.floor(gap_s).cast("long").alias("gap_seconds"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    tiebreak_col: str | None = "event_id",
    round_to: int = 6,
) -> DataFrame:
    """LOCF (step-function) time-weighted average per key — the
    hypertable ``time_weight('locf', ...)`` aggregate: each observation
    holds its value until the next one, so the mean weights every value
    by the microseconds it was in effect over [first event, last
    event].

    Output: ``(key, first_ts, last_ts, span_seconds, twa)``.  A key
    with a single observation (zero span) yields NULL twa (try_divide).
    Exactness: DECIMAL(18,4) values x exact long microsecond durations
    summed in decimal — order-independent — then one double division,
    ROUND(round_to)-pinned.  Ties on ts are ordered by the tiebreak so
    the value that carries forward into the next span is deterministic
    (tied rows themselves contribute zero-duration weight).

    Scale posture: one per-key window (the same sort every windowed
    operator pays) + one aggregate; no joins, no spine — this is the
    integral of the step function gap-fill materializes, computed
    without materializing it.
    """
    src = normalize_ntz(df)
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    us = F.unix_micros(F.col(ts_col))
    dur = (F.lead(us).over(w) - us).cast("decimal(20,0)")
    weighted = src.select(
        F.col(key_col),
        F.col(ts_col),
        (F.col(value_col).cast("decimal(18,4)") * dur).alias("__vw"),
        dur.alias("__dur"),
    )
    return weighted.groupBy(key_col).agg(
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
        (F.sum("__dur").cast("double") / F.lit(1_000_000.0)).alias(
            "span_seconds"
        ),
        F.round(
            F.try_divide(
                F.sum("__vw").cast("double"), F.sum("__dur").cast("double")
            ),
            round_to,
        ).alias("twa"),
    )


def ewma_features(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    alpha: float = 0.3,
    depth: int = 8,
) -> DataFrame:
    """Truncated exponentially-weighted moving average — the classic
    smoothed feature ML pipelines attach to every metric stream.  For
    each row, EWMA over the last ``depth`` observations of its key:

        ewma = Σ_j w_j·x_{t-j} / Σ_j w_j,   w_j = (1-α)^j

    truncating at ``depth`` makes the recurrence a FIXED lag chain —
    expressible as window expressions over ONE key-partitioned sort
    (all ``depth`` lags share a single Exchange+Sort, the
    top_event_sequences trick), fully whole-stage-codegen, instead of a
    sequential per-key scan (the untruncated recurrence is inherently
    order-serial; with (1-α)^8 ≈ 0.057 the truncation error is < 6%
    of the oldest term's weight and the usual engineering trade).
    Series shorter than ``depth`` renormalize over the PRESENT lags, so
    early rows are unbiased rather than damped toward zero.

    Determinism: weights are double constants; the numerator/denominator
    are the identical left-associated addition chains in the SQL oracle,
    and the quotient is ROUND(6)-pinned."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    num = None
    den = None
    for j in range(depth):
        wj = float((1.0 - alpha) ** j)
        lagv = F.lag(F.col(value_col), j).over(w) if j else F.col(value_col)
        term = F.coalesce(lagv * F.lit(wj), F.lit(0.0))
        wterm = F.when(lagv.isNotNull(), F.lit(wj)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = wterm if den is None else den + wterm
    return df.select(
        key_col,
        ts_col,
        id_col,
        value_col,
        F.round(num / den, 6).alias("ewma"),
    )


def seasonal_decompose(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Additive hour-of-day seasonal decomposition per key:

        value = level + seasonal(hour) + residual

    with ``level`` the key's overall mean and ``seasonal(hour)`` the
    hour-of-day mean minus the level — the one-line seasonality model
    behind diurnal anomaly baselines (compare residuals, not raw
    values, against the MAD screen).

    Output: per input row ``(key, id, ts, value, level, seasonal,
    residual)``; components ROUND(6) from decimal-exact sums.

    Scale posture: two dimension-sized aggregates (per key, per
    key×24-hour cell) broadcast back onto the stream — the corpus
    itself never shuffles."""
    dec = F.sum(F.col(value_col).cast("decimal(18,4)")).cast(
        "decimal(38,8)"
    )
    level = df.groupBy(key_col).agg(
        (dec.cast("double") / F.count("*").cast("double")).alias("__level")
    )
    hourly = df.groupBy(
        key_col, F.hour(ts_col).alias("__hr")
    ).agg(
        (dec.cast("double") / F.count("*").cast("double")).alias("__hmean")
    )
    out = (
        df.withColumn("__hr", F.hour(ts_col))
        .join(F.broadcast(level), key_col)
        .join(F.broadcast(hourly), [key_col, "__hr"])
    )
    seasonal = F.col("__hmean") - F.col("__level")
    residual = F.col(value_col) - F.col("__hmean")
    return out.select(
        key_col,
        id_col,
        ts_col,
        value_col,
        F.round("__level", 6).alias("level"),
        F.round(seasonal, 6).alias("seasonal"),
        F.round(residual, 6).alias("residual"),
    )


def lagged_cross_correlation(
    df: DataFrame,
    ts_col: str = "ts",
    x_type: str = "view",
    y_type: str = "purchase",
    type_col: str = "event_type",
    max_lag_hours: int = 2,
) -> DataFrame:
    """Lagged cross-correlation between two event types' hourly count
    series: corr(x_t, y_{t+L}) for L = 0..max_lag — the lead/lag
    discovery step behind "views predict purchases two hours later"
    analyses.

    Alignment is by TIMESTAMP (t+L joins on bucket + L hours), not by
    row position, so missing hours drop pairs instead of silently
    compressing time.  Correlations come from decimal-exact sufficient
    statistics (see robust.grouped_corr); output ``(lag_hours, n, r)``.

    Scale posture: the corpus collapses in ONE hourly count shuffle;
    the lag joins and corr run over the |hours| table."""
    from conte_to_fresco_etl_spark.operators.robust import grouped_corr

    hourly = (
        df.filter(F.col(type_col).isin([x_type, y_type]))
        .groupBy(F.date_trunc("hour", F.col(ts_col)).alias("h"))
        .agg(
            F.sum(F.when(F.col(type_col) == x_type, 1).otherwise(0))
            .alias("x"),
            F.sum(F.when(F.col(type_col) == y_type, 1).otherwise(0))
            .alias("y"),
        )
        .persist()
    )
    pairs = None
    for lag in range(max_lag_hours + 1):
        shifted = hourly.select(
            (F.col("h") - F.expr(f"INTERVAL {lag} HOURS")).alias("h"),
            F.col("y").alias("y_lead"),
        )
        p = (
            hourly.join(shifted, "h")
            .select(
                F.lit(lag).alias("lag_hours"),
                F.col("x"),
                F.col("y_lead").alias("y"),
            )
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    out = grouped_corr(pairs, key_col="lag_hours", x_col="x", y_col="y")
    hourly.unpersist(blocking=False)
    return out


def autocorrelation(
    series: DataFrame,
    order_col: str,
    value_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Sample autocorrelation function of an ordered series: for each
    lag L ≤ ``max_lag``,

        acf_L = Σ_t (x_t − μ)(x_{t−L} − μ)  /  Σ_t (x_t − μ)²

    — the periodicity/persistence diagnostic read before choosing
    seasonal windows or drift baselines (a strong acf_7 on daily data
    says "weekly cycle: compare day-over-week, not day-over-day").

    Returns ``(lag, n_pairs, acf)`` for lags 1..max_lag, acf ROUND(6).

    Cross-engine exactness: μ is ROUND(6) from decimal-summed values;
    every product is ROUND(12)→DECIMAL before its sum, numerator and
    denominator alike — aggregation-order independent.

    Plan shape: ONE ordered window produces all ``max_lag`` lag
    columns (they share the single sort), an explode turns them into
    (lag, pair) rows, and one small aggregate per lag finishes — the
    series itself is usually an already-aggregated (bucket, value)
    table, so the unpartitioned sort is over |buckets| rows, not the
    corpus."""
    x = F.col(value_col).cast("double")
    stats = series.agg(
        F.count("*").alias("__n"),
        F.round(
            F.sum(F.round(x, 9).cast("decimal(18,9)")).cast("double")
            / F.count("*"),
            6,
        ).alias("__mu"),
    )
    w = Window.orderBy(order_col)
    lagged = series.select(
        x.alias("__x"),
        *[
            F.lag(x, L).over(w).alias(f"__xl{L}")
            for L in range(1, max_lag + 1)
        ],
    ).crossJoin(F.broadcast(stats))
    d = F.col("__x") - F.col("__mu")
    den = lagged.agg(
        F.sum(F.round(d * d, 12).cast("decimal(28,12)")).alias("__den")
    )
    pairs = lagged.select(
        "__mu",
        "__x",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(L).cast("long").alias("lag"),
                        F.col(f"__xl{L}").alias("__xl"),
                    )
                    for L in range(1, max_lag + 1)
                ]
            )
        ).alias("__p"),
    ).select(
        "__mu", "__x", F.col("__p.lag").alias("lag"), F.col("__p.__xl").alias("__xl")
    ).filter(F.col("__xl").isNotNull())
    num = pairs.groupBy("lag").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(
            F.round(
                (F.col("__x") - F.col("__mu"))
                * (F.col("__xl") - F.col("__mu")),
                12,
            ).cast("decimal(28,12)")
        ).alias("__num"),
    )
    return num.crossJoin(F.broadcast(den)).select(
        "lag",
        "n_pairs",
        F.round(
            F.col("__num").cast("double") / F.col("__den").cast("double"), 6
        ).alias("acf"),
    )


def holt_forecast(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 7,
) -> DataFrame:
    """Holt double exponential smoothing (level + trend) over the daily
    count series of each key, with an ``horizon``-step linear forecast
    — the capacity-planning projection a pipeline owner runs on ingest
    volume ("where is this source's daily count heading").

    Output: ``(key, h, forecast)`` for h = 1..horizon, plus the fitted
    ``level`` and ``trend`` (per-key constants repeated on each row so
    the table is self-describing).  Keys with fewer than 2 observed
    days are dropped (Holt needs two points to seed the trend).

    Plan shape: one (key, day) count shuffle, one per-key collect_list
    (bounded: a day-granularity series is at most a few thousand
    elements per key — it collapses the corpus BEFORE any sequential
    work), then the recurrence folds per row via ``F.aggregate`` in
    array order.  The sequential dependency is inherent to exponential
    smoothing; at 100 TB the bounded-series fold per key is exactly
    how a distributed engine should run it (never a global window).
    Every recurrence step is ROUND(x, 12)-pinned; alpha/beta and their
    complements enter BOTH engines as repr'd literals (a ``1 - 0.3``
    folds to 0.7 exactly in DuckDB's decimal arithmetic but to a
    different double in Spark).
    """
    a, b = float(alpha), float(beta)
    one_a, one_b = 1.0 - a, 1.0 - b
    daily = (
        df.select(
            F.col(key_col).alias("key"),
            F.date_trunc("day", F.col(ts_col)).alias("__day"),
        )
        .groupBy("key", "__day")
        .agg(F.count("*").cast("double").alias("__y"))
    )
    series = (
        daily.groupBy("key")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__day", "__y"))),
                lambda s: s["__y"],
            ).alias("__ys")
        )
        .filter(F.size("__ys") >= 2)
    )

    def _step(acc, x):
        new_l = F.round(
            F.lit(a) * x + F.lit(one_a) * (acc["l"] + acc["b"]), 12
        )
        return F.struct(
            new_l.alias("l"),
            F.round(
                F.lit(b) * (new_l - acc["l"]) + F.lit(one_b) * acc["b"],
                12,
            ).alias("b"),
        )

    fitted = series.select(
        "key",
        F.aggregate(
            F.slice(F.col("__ys"), 2, F.size("__ys") - 1),
            F.struct(
                F.element_at("__ys", 1).alias("l"),
                (F.element_at("__ys", 2) - F.element_at("__ys", 1)).alias(
                    "b"
                ),
            ),
            _step,
        ).alias("__fit"),
    ).select(
        "key",
        F.col("__fit.l").alias("level"),
        F.col("__fit.b").alias("trend"),
    )
    return fitted.select(
        "key",
        "level",
        "trend",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.lit(int(horizon))),
                lambda h: F.round(
                    F.col("level") + h.cast("double") * F.col("trend"), 6
                ),
            )
        ).alias("h0", "forecast"),
    ).select(
        "key",
        (F.col("h0") + 1).cast("int").alias("h"),
        "forecast",
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
    )
