"""Large-large range joins via time binning.

A pure range predicate (``|t_a - t_b| <= tol``, or point-in-interval
with no selective equi key) gives Spark nothing to hash on: the built-in
plan is BroadcastNestedLoopJoin — O(|A|·|B|) compares and a broadcast
that dies when neither side is small.  Binning restores an equi key:
quantize time into ``tol``-width bins, emit each probe row into its own
bin and the preceding one, hash-join on the bin id, then apply the exact
range predicate to the (locally small) candidate set.

Why the pair count is safe: a pair (a, b) with ``0 <= t_b - t_a <= tol``
has ``floor(t_b/tol) - floor(t_a/tol) ∈ {0, 1}``, so emitting the probe
side into exactly ``{bin, bin-1}`` finds every qualifying pair exactly
once (the two emitted bins differ, so no dedup pass is needed).
Candidate pairs are bounded by sum over bins of n_a(bin)·2·n_b(bin) —
data-density bound, not |A|·|B|.

Scale posture: one shuffle per side on the bin id (plus the 2x fan-out
of the probe side), AQE skew-split applies to hot bins (bursts), and the
exact filter runs inside whole-stage codegen.  The same shape services
point-in-interval joins by exploding each interval into its covered bins
(``explode_interval_bins``) — interval length / tol bounds the fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conte_to_fresco_etl_spark.functions.core import normalize_ntz


def time_proximity_pairs(
    df: DataFrame,
    ts_col: str = "ts",
    id_col: str = "event_id",
    tolerance_seconds: float = 1.0,
    carry: list[str] | None = None,
) -> DataFrame:
    """Self range join: every unordered pair of rows whose timestamps
    lie within ``tolerance_seconds`` of each other, each pair exactly
    once as (id_a, id_b) with the EARLIER row (ties: smaller id) as
    ``id_a``.  Output adds ``dt_us`` — the non-negative microsecond gap.

    ``carry`` columns are attached from both rows as ``{c}_a``/``{c}_b``.
    """
    tol_us = int(tolerance_seconds * 1_000_000)
    carry = carry or []
    base = normalize_ntz(df).select(
        F.col(id_col).alias("__id"),
        F.unix_micros(F.col(ts_col)).alias("__us"),
        *[F.col(c) for c in carry],
    )
    # floor-division binning (not %): correct alignment for negative
    # (pre-1970) epochs too, where Java % follows the dividend's sign
    bin_of = (F.floor(F.col("__us") / tol_us) * tol_us).cast("long")
    a = base.select(
        F.col("__id").alias("id_a"),
        F.col("__us").alias("us_a"),
        bin_of.alias("__bin"),
        *[F.col(c).alias(f"{c}_a") for c in carry],
    )
    b = base.select(
        F.col("__id").alias("id_b"),
        F.col("__us").alias("us_b"),
        F.explode(F.array(bin_of, bin_of - tol_us)).alias("__bin"),
        *[F.col(c).alias(f"{c}_b") for c in carry],
    )
    dt = F.col("us_b") - F.col("us_a")
    pairs = (
        a.join(b, "__bin")
        .filter(
            (dt >= 0)
            & (dt <= tol_us)
            & ((dt > 0) | (F.col("id_a") < F.col("id_b")))
        )
        .select(
            "id_a",
            "id_b",
            dt.cast("long").alias("dt_us"),
            *[f"{c}_a" for c in carry],
            *[f"{c}_b" for c in carry],
        )
    )
    return pairs


def explode_interval_bins(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bin_seconds: float,
    bin_name: str = "__bin",
) -> DataFrame:
    """One row per (interval, covered bin): the build side of a
    point-in-interval range join (join points on
    ``floor(epoch_us(pt)/w)*w == __bin`` then filter the exact range).
    Fan-out per interval is ceil(length/bin) + 1 — pick ``bin_seconds``
    near the median interval length to keep it O(1)."""
    w_us = int(bin_seconds * 1_000_000)
    iv = normalize_ntz(intervals)
    s = F.unix_micros(F.col(start_col))
    e = F.unix_micros(F.col(end_col))
    sb = (F.floor(s / w_us) * w_us).cast("long")
    eb = (F.floor(e / w_us) * w_us).cast("long")
    return iv.withColumn(
        bin_name, F.explode(F.sequence(sb, eb, F.lit(w_us)))
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: float,
    how: str = "inner",
) -> DataFrame:
    """Large-large point-in-interval join: every (point, interval) pair
    with ``start <= ts <= end``, via the binned equi key — the
    composition of ``explode_interval_bins`` with a hash join and the
    exact predicate.  Both sides shuffle hash-partitioned on the bin;
    neither needs to broadcast (the broadcast interval join in
    ``operators/join.py`` remains the right plan when the interval side
    is dimension-sized).

    A pair is produced exactly once: a point joins only the single bin
    it falls in, and each interval emits each covered bin once.
    """
    if how != "inner":
        raise ValueError("point_in_interval_join supports inner only")
    w_us = int(bin_seconds * 1_000_000)
    pts = normalize_ntz(points)
    us = F.unix_micros(F.col(point_ts))
    pts = pts.withColumn(
        "__bin", (F.floor(us / w_us) * w_us).cast("long")
    )
    iv = explode_interval_bins(intervals, start_col, end_col, bin_seconds)
    out = pts.join(iv, "__bin").filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    )
    return out.drop("__bin")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bin_seconds: float,
    on: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Large-large interval-overlap join: every (a, b) pair whose
    closed intervals intersect (``a_start <= b_end AND b_start <=
    a_end`` — the inclusive convention the point join uses), via the
    same binned equi key.  The classic genomics / scheduling /
    downtime-correlation join Spark has no operator for.

    Emit-exactly-once without a distinct: overlapping intervals share
    every bin from ``max(start bins)`` to ``min(end bins)``, so a pair
    is kept only at ``__bin == greatest(a's start bin, b's start bin)``
    — the FIRST co-occupied bin — instead of deduplicating the
    candidate multiset with an extra shuffle.

    Cost: sum of per-bin |a| x |b| products (pick ``bin_seconds`` near
    the median interval length), one hash shuffle per side on the bin
    key.  ``on`` adds equality key pairs ``[(a_col, b_col), ...]`` to
    the join — the usual production shape (overlaps within a host /
    user / chromosome), which co-partitions on (key, bin) and shrinks
    each bin's product to the per-key slice.  Column names must be
    disjoint across ``a`` and ``b``.
    """
    clash = set(a.columns) & set(b.columns)
    if clash:
        raise ValueError(f"a/b column names must be disjoint: {clash}")
    w_us = int(bin_seconds * 1_000_000)
    ea = explode_interval_bins(a, a_start, a_end, bin_seconds, "__bin")
    eb = explode_interval_bins(b, b_start, b_end, bin_seconds, "__bin_b")
    sa = (
        F.floor(F.unix_micros(F.col(a_start)) / w_us) * w_us
    ).cast("long")
    sb = (
        F.floor(F.unix_micros(F.col(b_start)) / w_us) * w_us
    ).cast("long")
    cond = F.col("__bin") == F.col("__bin_b")
    for ka, kb in on or []:
        cond = cond & (F.col(ka) == F.col(kb))
    out = (
        ea.join(eb, cond)
        .filter(
            (F.col(a_start) <= F.col(b_end))
            & (F.col(b_start) <= F.col(a_end))
            & (F.col("__bin") == F.greatest(sa, sb))
        )
    )
    return out.drop("__bin", "__bin_b")
