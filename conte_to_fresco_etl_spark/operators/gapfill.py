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
