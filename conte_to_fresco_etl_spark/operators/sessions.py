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


def session_window_agg(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-user sessions via Spark's NATIVE ``session_window`` grouping
    expression — the same operator Structured Streaming uses for
    watermark-merged session state, here in batch.

    Session membership matches :func:`sessionize_events` exactly — an
    event landing EXACTLY ``gap`` after its predecessor is MERGED (the
    boundary touch counts; the break is strictly ``>`` in both forms,
    pinned by test_session_window_exact_gap_boundary).  The one output
    difference: ``session_close`` is ``max(ts) + gap`` (the window
    close), not the last event time.

    At 100 TB: one shuffle on the user key; Spark merges overlapping
    candidate windows per key inside the aggregate (no window-function
    sort pass), and the same plan runs under a watermark in streaming.
    """
    events = normalize_ntz(events)
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes"),
            F.col(user_col),
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_close"),
            "n_events",
        )
    )


def session_pattern_match(
    events: DataFrame,
    pattern: str = "v[^p]*p",
    symbols: dict[str, str] | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    gap_minutes: int = 30,
) -> DataFrame:
    """MATCH_RECOGNIZE-lite complex-event-processing over sessions: map
    each event type to a one-character symbol, fold every session's
    events (ordered by (ts, id)) into a symbol string, and count the
    non-overlapping regex ``pattern`` occurrences — e.g. the default
    ``v[^p]*p`` counts view→…→purchase conversions that complete
    without an intervening purchase.

    This is the batch shape of what Flink CEP / SQL MATCH_RECOGNIZE
    express: the session string is the event sequence, and the regex
    engine IS the NFA those operators compile to.  Patterns over the
    symbol alphabet (alternation, bounded gaps via ``[^x]{{0,n}}``,
    anchors) all carry over.

    Returns one row per session: ``(user, session_id, seq, n_matches)``.

    Scale posture: the session assignment is the ``sessionize_events``
    window pair (one shuffle on the user key); the fold is
    ``array_sort(collect_list(struct))`` per session — bounded by
    session length, never whole-history — and the regex runs once per
    session string, map-side.  Determinism: intra-session order ties
    break by event id, and the leftmost-non-overlapping count is
    identical across Java regex and RE2 for patterns whose inner
    classes exclude the terminator (the default's ``[^p]*`` cannot
    cross a ``p``)."""
    symbols = symbols or {
        "click": "c",
        "error": "e",
        "purchase": "p",
        "signup": "s",
        "view": "v",
    }
    gap_us = gap_minutes * 60 * 1_000_000
    events = normalize_ntz(events)
    sym = None
    for k in sorted(symbols):
        cond = F.col(type_col) == k
        sym = F.when(cond, symbols[k]) if sym is None else sym.when(
            cond, symbols[k]
        )
    sym = sym.otherwise("x")
    order = [F.col(ts_col).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(user_col).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col(ts_col))
    brk = F.when(us - F.lag(us).over(w) > gap_us, F.lit(1)).otherwise(
        F.lit(0)
    )
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("t"),
                        F.col(id_col).alias("i"),
                        sym.alias("s"),
                    )
                )
            ),
            lambda st: st["s"],
        ),
        "",
    )
    return (
        events.select(user_col, ts_col, id_col, type_col)
        .withColumn("__brk", brk)
        .withColumn("session_id", F.sum("__brk").over(run).cast("long"))
        .groupBy(user_col, "session_id")
        .agg(seq.alias("seq"))
        .select(
            user_col,
            "session_id",
            "seq",
            F.regexp_count("seq", F.lit(pattern)).cast("long").alias(
                "n_matches"
            ),
        )
    )
