"""Ordered-funnel and cohort-retention analytics over event streams.

The product-analytics queries every event warehouse serves: "of the
users who did A, how many later did B, then C?" and "of the users first
seen on day D, how many returned k days later?".  Both are pure
DataFrame compositions — no UDFs, no collects.

Scale posture:
- Funnel: each step is a per-user MIN-timestamp aggregate (map-side
  partial) followed by a key-co-partitioned join with the previous
  step's survivors.  The survivor table shrinks monotonically, so later
  stages join ever-smaller sides; every join keys on the user id, so
  AQE can convert survivors to broadcasts as they shrink.  The "did B
  AFTER A" predicate lives in the join condition, evaluated during the
  key-equal match — never a cross product.
- Retention: one distinct-(user, day) pass, one per-user first-day
  aggregate, one co-partitioned join, one (cohort, offset) count.  All
  four are single-shuffle aggregates on bounded keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conte_to_fresco_etl_spark.functions.core import normalize_ntz


def funnel_conversion(
    df: DataFrame,
    steps: list[str],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    max_lag_seconds: int | None = None,
) -> DataFrame:
    """Strictly-ordered funnel: a user converts through step k when
    their earliest step-k event is at-or-after their conversion time
    for step k-1 (the canonical first-touch funnel; ties at the same
    timestamp count, matching the >= the oracle uses).  With
    ``max_lag_seconds`` the step must ALSO land within that window of
    the previous conversion (the "click within 7 days of view" form) —
    the window bound rides the same join condition, so the plan shape
    is unchanged.

    Output: one row per step — ``(step, step_name, n_users,
    conversion)`` where conversion = ROUND(n_users / n_users(step 1),
    6).  Deterministic: MIN over timestamps is order-independent, and
    counts are exact.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    src = normalize_ntz(df).select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__t"),
        F.col(ts_col).alias("__ts"),
    )
    # survivors[k]: (user, conv_ts) for users who reached step k
    conv = (
        src.filter(F.col("__t") == steps[0])
        .groupBy("__u")
        .agg(F.min("__ts").alias("__conv"))
    )
    counts = [
        conv.agg(F.count("*").alias("n")).select(
            F.lit(1).alias("step"), F.lit(steps[0]).alias("step_name"), "n"
        )
    ]
    for i, step in enumerate(steps[1:], start=2):
        in_window = F.col("__ts") >= F.col("__conv")
        if max_lag_seconds is not None:
            in_window = in_window & (
                F.col("__ts")
                <= F.col("__conv")
                + F.expr(f"INTERVAL {int(max_lag_seconds)} SECONDS")
            )
        nxt = (
            src.filter(F.col("__t") == step)
            .join(conv, "__u")
            .filter(in_window)
            .groupBy("__u")
            .agg(F.min("__ts").alias("__conv"))
        )
        counts.append(
            nxt.agg(F.count("*").alias("n")).select(
                F.lit(i).alias("step"), F.lit(step).alias("step_name"), "n"
            )
        )
        conv = nxt
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    base = out.filter(F.col("step") == 1).select(F.col("n").alias("__n1"))
    return (
        out.join(F.broadcast(base))
        .select(
            F.col("step").cast("long").alias("step"),
            "step_name",
            F.col("n").alias("n_users"),
            # try_divide: an empty first step (n1 = 0) yields NULL
            # conversion, not an ANSI divide-by-zero error
            F.round(
                F.try_divide(F.col("n").cast("double"), F.col("__n1")), 6
            ).alias("conversion"),
        )
    )


def retention_cohorts(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    max_offset: int = 7,
) -> DataFrame:
    """Day-grain cohort retention.

    Cohort = the day of a user's first event.  For offsets 0..max,
    count how many of the cohort's users had ANY event exactly
    ``offset`` days after their cohort day, and the retention ratio
    against the cohort size.  Output: ``(cohort_day, day_offset,
    n_active, retention)``; offset 0 always equals the cohort size.
    """
    src = normalize_ntz(df)
    days = src.select(
        F.col(user_col).alias("__u"),
        F.date_trunc("day", F.col(ts_col)).alias("__day"),
    ).distinct()
    first = days.groupBy("__u").agg(F.min("__day").alias("cohort_day"))
    sizes = first.groupBy("cohort_day").agg(F.count("*").alias("__size"))
    return (
        days.join(first, "__u")
        .select(
            "__u",
            "cohort_day",
            F.datediff(F.col("__day"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .filter(
            (F.col("day_offset") >= 0) & (F.col("day_offset") <= max_offset)
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("n_active"))
        .join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            F.col("day_offset").cast("long").alias("day_offset"),
            "n_active",
            F.round(
                F.col("n_active").cast("double") / F.col("__size"), 6
            ).alias("retention"),
        )
    )


def conversion_latency(
    df: DataFrame,
    from_type: str = "view",
    to_type: str = "click",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Conversion-latency distribution: per user, seconds from the
    FIRST ``from_type`` event to the first ``to_type`` at-or-after it,
    summarized as exact p50/p90/p99 — the time-to-convert metric that
    turns a funnel count into an SLA.

    Output: ONE row ``(n_converted, p50_s, p90_s, p99_s, max_s)``.
    Latencies are exact integer microseconds divided once; percentiles
    are the deterministic interpolating form.

    Scale posture: two per-user MIN aggregates (the funnel_conversion
    shape) and a |users|-row percentile pass — the stream shuffles
    twice on the user key and never wider."""
    first_from = (
        df.filter(F.col(type_col) == from_type)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t0"))
    )
    joined = (
        df.filter(F.col(type_col) == to_type)
        .join(first_from, user_col)
        .filter(F.col(ts_col) >= F.col("t0"))
        .groupBy(user_col)
        .agg(
            F.min(F.unix_micros(F.col(ts_col))).alias("t1u"),
            F.max(F.unix_micros(F.col("t0"))).alias("t0u"),  # constant per user
        )
    )
    lat = joined.select(
        ((F.col("t1u") - F.col("t0u")).cast("double") / F.lit(1e6)).alias(
            "lat_s"
        )
    )
    return lat.agg(
        F.count("*").alias("n_converted"),
        F.round(F.expr("percentile(lat_s, 0.5)"), 6).alias("p50_s"),
        F.round(F.expr("percentile(lat_s, 0.9)"), 6).alias("p90_s"),
        F.round(F.expr("percentile(lat_s, 0.99)"), 6).alias("p99_s"),
        F.round(F.max("lat_s"), 6).alias("max_s"),
    )
