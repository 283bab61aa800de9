"""As-of join: attach the most recent right-side row at-or-before (or
at-or-after) each left row's timestamp, per key.

The reference engine family exposes this as a first-class time-series
operator; Spark has no built-in.  The naive translation — a non-equi
join ``r.ts <= l.ts`` + argmax — materializes O(|L|·|R|/keys) pairs
before pruning.  This implementation is the scalable union form:

    1. tag both sides and union them (map-side only, no join),
    2. ONE hash shuffle on the key, sort within partitions by
       (ts, side, tie), and
    3. ``last(right_payload, ignorenulls=True)`` over a running window
       carries the latest right row forward onto each left row.

Cost is a single shuffle of |L| + |R| rows — identical plan shape to a
windowed aggregation, fully whole-stage-codegen, zero Python.  Skewed
keys are bounded by per-key row counts and AQE handles the rest; there
is no pair blow-up at any scale.

The right payload travels as ONE struct column so the match is atomic:
all attached columns come from the same right row even when nulls
appear in individual right fields.

Determinism: ties on (key, ts) between multiple right rows are broken
by the explicit ``right_tie`` column — backward picks the HIGHEST tie
(the last row a (ts, tie)-sorted stream delivers, matching pandas
``merge_asof``'s last-wins rule), forward the LOWEST (the first row
at-or-after, again the sorted-stream order).  A right row at exactly
the left row's timestamp is included in both directions (the inclusive
convention DuckDB's ASOF JOIN and pandas ``merge_asof`` share).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from conte_to_fresco_etl_spark.functions.core import normalize_ntz


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    right_tie: str | None = None,
    attach: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach columns of the single matching right
    row: the one with the greatest ``ts_col`` <= left's (``backward``)
    or the least >= left's (``forward``), within the same ``on`` key.

    ``attach`` lists the right columns to carry (default: every right
    column except the key and timestamp); each arrives as
    ``{prefix}{name}``, plus ``{prefix}ts`` (the matched timestamp) and
    ``{prefix}lag_us`` (microseconds between left ts and match, always
    >= 0).  Unmatched left rows keep all attached columns null.

    ``tolerance_seconds`` nulls out matches further than the tolerance
    — the match is dropped, not the left row (left join semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    left = normalize_ntz(left)
    # a null-ts right row would sort first (asc_nulls_first) and become
    # the running match for every left row after it — exclude it; a
    # null-ts LEFT row sorts first too, sees no right rows, and comes
    # out unmatched, which is the right answer without special-casing
    right = normalize_ntz(right).filter(F.col(ts_col).isNotNull())
    if attach is None:
        attach = [c for c in right.columns if c not in (*keys, ts_col)]
    payload_cols = [F.col(ts_col).alias("__rts")] + [
        F.col(c).alias(c) for c in attach
    ]

    ls = left.withColumn("__is_left", F.lit(1)).withColumn(
        "__payload",
        F.lit(None).cast(
            right.select(F.struct(*payload_cols).alias("s")).schema["s"].dataType
        ),
    )
    tie: Column = (
        F.col(right_tie) if right_tie is not None else F.lit(0)
    )
    rs = right.select(
        *[F.col(k) for k in keys],
        F.col(ts_col),
        F.lit(0).alias("__is_left"),
        F.struct(*payload_cols).alias("__payload"),
        tie.alias("__tie"),
    )
    ls = ls.withColumn("__tie", F.lit(None).cast(rs.schema["__tie"].dataType))
    u = ls.unionByName(rs, allowMissingColumns=True)

    # backward: ascending time, right-before-left at equal ts → the
    # running `last` sees the right row (inclusive <=).  forward is the
    # mirror image: descending time, so "first right at-or-after".
    if direction == "backward":
        # asc_nulls_first spelled explicitly (it IS Spark's asc default,
        # but engines differ — DuckDB defaults NULLS LAST — and the
        # null-ts-left-row-unmatched contract above depends on it)
        order = [F.col(ts_col).asc_nulls_first(), F.col("__is_left").asc(),
                 F.col("__tie").asc_nulls_last()]
    else:
        # desc_nulls_first: a null-ts LEFT row must sort BEFORE every
        # right row (as nulls-first does under asc for backward) so it
        # comes out unmatched instead of adopting the running payload
        order = [F.col(ts_col).desc_nulls_first(), F.col("__is_left").asc(),
                 F.col("__tie").desc_nulls_last()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn(
        "__m", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__is_left") == 1)

    lag_us = F.abs(
        F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("__m.__rts"))
    )
    if tolerance_seconds is not None:
        keep = lag_us <= int(tolerance_seconds * 1_000_000)
        matched = matched.withColumn(
            "__m", F.when(keep, F.col("__m"))
        )
        lag_us = F.abs(
            F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("__m.__rts"))
        )
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("__m.__rts").alias(f"{prefix}ts"))
    out_cols.extend(F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in attach)
    out_cols.append(lag_us.cast("long").alias(f"{prefix}lag_us"))
    return matched.select(*out_cols)
