"""Gap-based sessionization, batch form.

The batch twin of ``streaming/stateful.py:sessionize`` (the
applyInPandasWithState operator): identical session semantics — a
session breaks when the gap to the previous event exceeds the timeout —
expressed as two window functions so the whole thing is one shuffle on
the user key, whole-stage codegen, no Python.

At 100 TB: one hash shuffle by user; skewed power users are bounded by
per-user event counts, and AQE skew-split applies because the windows
partition on the same key the shuffle hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from conte_to_fresco_etl_spark.functions.core import normalize_ntz


def sessionize_events(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-user sessions: order events by (ts, id); start a new session
    when the gap from the previous event exceeds ``gap_minutes``.
    Returns one row per session: (user, session_id, n_events,
    session_start, session_end) with session_id numbered from 0 in time
    order.

    Determinism: the intra-user order ties break by event id, and the
    gap compares integer microseconds — no float time math."""
    gap_us = gap_minutes * 60 * 1_000_000
    events = normalize_ntz(events)  # unix_micros below is LTZ-only
    order = [F.col(ts_col).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(user_col).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col(ts_col))
    brk = F.when(
        us - F.lag(us).over(w) > gap_us, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        events.select(user_col, ts_col, id_col)
        .withColumn("__brk", brk)
        .withColumn("session_id", F.sum("__brk").over(run).cast("long"))
        .groupBy(user_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )
