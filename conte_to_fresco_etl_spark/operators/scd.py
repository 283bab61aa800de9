"""Slowly-changing-dimension (SCD type 2) interval building.

Warehouses version dimension attributes by turning a change/event stream
into validity intervals: one row per (key, attribute-state) run with
``valid_from`` / ``valid_to`` bounds and an ``is_current`` flag.  The
complementary lookup — "which state was valid at time T?" — is exactly
the as-of join (``operators/asof.py``); this operator builds the table
that join probes.

Scale posture: two window passes over ONE key-partitioned sort (same
partitioning and ordering, so Catalyst plans a single Exchange + Sort
feeding both Window operators): a lag pass marks change points, a lead
pass closes each surviving interval.  No joins, no collects; output
size = number of state changes, typically orders of magnitude smaller
than the input stream.  Skewed keys (one chatty entity) cost one sort
partition — the same bound every per-key windowed operator here has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from conte_to_fresco_etl_spark.functions.core import normalize_ntz


def scd2_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_cols: list[str] | None = None,
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Collapse an event stream into SCD2 validity intervals.

    A new interval opens at every event whose attribute tuple differs
    from the key's previous event (the first event always opens one);
    consecutive events with identical attributes extend the current
    interval.  ``valid_to`` is the next interval's ``valid_from``
    (half-open ``[from, to)`` convention, so intervals tile without
    overlap); the last interval has ``valid_to`` NULL and
    ``is_current`` true.

    Ordering is pinned by (ts, tiebreak) so same-timestamp events are
    deterministic; with a tie the LAST event in tiebreak order wins the
    instant, matching the as-of join's latest-at-T semantics.
    """
    attr_cols = attr_cols or ["event_type"]
    src = normalize_ntz(df)
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    changed = F.lit(False)
    for a in attr_cols:
        prev = F.lag(F.col(a)).over(w)
        # null-safe inequality: a NULL attribute is a state too
        changed = changed | ~F.col(a).eqNullSafe(prev)
    first = F.lag(F.col(ts_col)).over(w).isNull()
    tie = [F.col(tiebreak_col)] if tiebreak_col else []
    points = src.select(
        F.col(key_col),
        F.col(ts_col).alias("valid_from"),
        *tie,
        *[F.col(a) for a in attr_cols],
        (first | changed).alias("__open"),
    ).filter(F.col("__open"))
    # the lead pass must reuse the SAME tiebreak: two change points at
    # one timestamp otherwise swap valid_to nondeterministically
    order2 = [F.col("valid_from").asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w2 = Window.partitionBy(key_col).orderBy(*order2)
    return points.select(
        F.col(key_col),
        *[F.col(a) for a in attr_cols],
        F.col("valid_from"),
        F.lead(F.col("valid_from")).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Last-write-wins MERGE (SCD type 1): rows in ``updates`` replace
    matching ``target`` rows by key; unmatched update rows insert;
    untouched target rows survive — the batch-incremental load step
    every warehouse dimension table runs, and the batch twin of the
    streaming foreachBatch upsert (streaming/pipeline.py:upsert).

    Relational spelling: target LEFT-ANTI updates ∪ updates — one
    hash shuffle per side on the key (or zero for the anti side when
    updates is dimension-sized and AQE broadcasts it).  On a real
    warehouse this materializes via dynamic partition overwrite or a
    transactional table format's MERGE INTO; the dataflow is the same.

    Schemas must match; key collisions WITHIN updates are the caller's
    contract to resolve first (aggregate or rank to one row per key),
    as in SQL MERGE."""
    survivors = target.join(updates, key_cols, "left_anti")
    return survivors.unionByName(updates)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """Dataset-version diff: compare two corpus snapshots by key and
    content fingerprint and report ``added`` / ``removed`` /
    ``changed`` rows (unchanged rows are omitted — at corpus scale the
    diff is the small output, the point of publishing dataset deltas
    instead of full re-releases).

    Inputs carry ``(key_col, fingerprint_col)``; compute the
    fingerprint upstream (e.g. ``md5(text)``) so this operator stays a
    pure join.  Output: ``(key, status, old_fp, new_fp)``.

    Scale posture: ONE full-outer hash join on the key — both sides
    shuffle once; with bucketed snapshot tables even that exchange
    drops away.  The fingerprint comparison is null-safe equality, so
    a null fingerprint is a value, not a wildcard."""
    # presence flags, NOT fingerprint nullity: a row may legitimately
    # carry a null fingerprint and must not read as absent
    o = old.select(
        F.col(key_col).alias("key"),
        F.col(fingerprint_col).alias("old_fp"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(key_col).alias("key"),
        F.col(fingerprint_col).alias("new_fp"),
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, "key", "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("old_fp").eqNullSafe(F.col("new_fp")), F.lit("changed")
        )
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(F.col("key").alias(key_col), "status", "old_fp", "new_fp")
    )
