"""Core numeric expressions (SURVEY §2.8 F1-F4).

Reference provenance:
  * safe_division — transform_conte_ts_data.py:125-146 (``a/b`` if ``b!=0``
    else default; default also on exception).
  * validate_metric / clip — transform_conte_ts_data.py:149-165 (np.clip).
  * calculate_rate — transform_conte_ts_data.py:168-187.

Semantic notes (SURVEY §4 "small expression library"):
  * Spark ``a/b`` yields NULL on /0 (non-ANSI); the reference yields the
    default (0.0), so the ``otherwise`` branch matters.
  * ``np.clip(NaN) = NaN`` — NaN passes through a clip.  Spark
    ``greatest(lit(0), NaN)`` is also NaN (NaN sorts greater than any
    number), so the semantics line up for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Re-tag every TIMESTAMP_NTZ column as session-local TIMESTAMP (LTZ).

    The same tz-naive parquet (``timestamp[us]``, isAdjustedToUTC=false)
    arrives as TIMESTAMP_NTZ or TIMESTAMP depending on the reading
    session's ``spark.sql.parquet.inferTimestampNTZ.enabled`` /
    ``spark.sql.timestampType``  — configs the engine does not control
    when handed a caller's SparkSession.  NTZ breaks instant arithmetic
    (``CAST(ts AS DOUBLE)`` and ``unix_micros`` are LTZ-only), so the
    engine canonicalizes at the source: under the UTC session timezone
    (pinned here, matching session.py's contract) the NTZ→LTZ cast is a
    pure re-tag — the naive wall-clock is interpreted as UTC, exactly
    DuckDB's naive-timestamp semantics, and downstream epoch math is
    identical across both load shapes.
    """
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if not ntz:
        return df
    # Session-INDEPENDENT retag (the earlier form set the caller's
    # session timezone to UTC as a side effect, silently changing every
    # other LTZ parse/render in a caller-owned session):
    # ``CAST(ntz AS timestamp_ltz)`` interprets the wall-clock in the
    # session zone S, so first shift the wall-clock from UTC to S
    # (``convert_timezone``) — the composition yields the instant whose
    # UTC wall-clock is the stored value, under ANY session timezone.
    # Under a UTC session (session.py's own contract) the shift is the
    # identity.  Caveat: for a non-UTC session zone WITH daylight-saving
    # transitions, wall-clocks inside the repeated fall-back hour are
    # ambiguous under the final cast; zones without DST are exact.
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    return df.withColumns(
        {
            c: F.convert_timezone(F.lit("UTC"), F.lit(tz), F.col(c)).cast(
                "timestamp_ltz"
            )
            for c in ntz
        }
    )


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def safe_div(
    num: Column | str, den: Column | str, default: float = 0.0
) -> Column:
    """``num/den`` when ``den != 0`` else ``default``; NULL inputs → default.

    Mirrors ``safe_division`` (transform_conte_ts_data.py:125-146): the
    reference returns the default both for a zero denominator and for any
    exception, which covers the NULL-input case here.
    """
    num, den = _col(num), _col(den)
    return F.coalesce(F.when(den != 0, num / den), F.lit(float(default)))


def clip(
    c: Column | str,
    lo: float | None = 0.0,
    hi: float | None = None,
) -> Column:
    """Clamp to ``[lo, hi]`` (``validate_metric``,
    transform_conte_ts_data.py:149-165; default is one-sided ``>= 0``).
    NaN propagates (np.clip semantics)."""
    out = _col(c)
    if lo is not None:
        out = F.greatest(F.lit(float(lo)), out)
    if hi is not None:
        out = F.least(F.lit(float(hi)), out)
    return out


def calculate_rate(
    delta_value: Column | str,
    delta_seconds: Column | str,
    min_dt: float = 0.1,
    first_row_default: float = 0.0,
) -> Column:
    """Per-interval rate with a floored Δt (transform_conte_ts_data.py:
    168-187, :615-617): ``Δvalue / max(min_dt, Δt)``; NULL deltas (first
    row of a lag window) → ``first_row_default``; result clamped ≥ 0
    (counter resets produce negative Δ, clamped by validate_metric at
    transform_conte_ts_data.py:615)."""
    dv, dt = _col(delta_value), _col(delta_seconds)
    rate = dv / F.greatest(F.lit(float(min_dt)), dt)
    return clip(F.coalesce(rate, F.lit(float(first_row_default))), lo=0.0)
