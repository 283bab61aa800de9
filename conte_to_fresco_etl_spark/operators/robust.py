"""Robust statistics: per-group median/MAD outlier detection.

The metric-quality screen the reference applies as fixed clips
(``validate_metric``, reference conte-etl-step-2-processor.py:480-511)
generalized to a data-driven rule: a value is anomalous when its
deviation from the per-group MEDIAN exceeds ``k`` scaled MADs (median
absolute deviation).  Median/MAD tolerate the exact pathology fixed
thresholds miss — a corrupted collector emitting a burst of garbage
moves the mean and stddev but barely moves the median.

At 100 TB: two aggregate passes over the fact table (median, then MAD
of the residuals) with dimension-sized per-group stat tables joined
back by broadcast — never a per-group sort window over the full data.
Exact ``percentile`` keeps the gate deterministic; the documented
sketch form swaps in ``approx_percentile`` for one-pass approximate
medians when two scans are too dear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

#: Consistency constant: MAD * 1.4826 estimates sigma under normality,
#: so ``k`` is in familiar z-score units.
MAD_SIGMA = 1.4826


def mad_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    id_col: str,
    k: float = 3.5,
) -> DataFrame:
    """Rows whose ``|value - median(group)|`` exceeds ``k * 1.4826 *
    MAD(group)``.

    Returns the flagged rows with ``(id, key, value, med, mad,
    robust_z)`` where ``robust_z = |v - med| / (1.4826 * mad)`` rounded
    to 6 places (NULL when the group's MAD is exactly zero — then ANY
    deviation from the median flags, the standard MAD-rule degeneracy
    for >50%-constant groups).

    Determinism: exact linear-interpolated ``percentile`` on both
    passes; the flag predicate is multiplication-only (no division), so
    engines agree bit-for-bit on the boundary.
    """
    med = broadcast(
        df.groupBy(key_col).agg(
            F.expr(f"percentile({value_col}, 0.5)").alias("med")
        )
    )
    dev = df.join(med, key_col).withColumn(
        "absdev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = broadcast(
        dev.groupBy(key_col).agg(
            F.expr("percentile(absdev, 0.5)").alias("mad")
        )
    )
    flagged = dev.join(mad, key_col).filter(
        F.col("absdev") > F.lit(k) * F.lit(MAD_SIGMA) * F.col("mad")
    )
    score = F.when(
        F.col("mad") != 0.0,
        F.round(F.col("absdev") / (F.lit(MAD_SIGMA) * F.col("mad")), 6),
    )
    return flagged.select(
        id_col,
        key_col,
        value_col,
        "med",
        "mad",
        score.alias("robust_z"),
    )


def psi_drift(
    df: DataFrame,
    key_col: str,
    value_col: str,
    split_col,
    bin_width: float = 25.0,
) -> DataFrame:
    """Population stability index between the two halves a boolean
    ``split_col`` induces (False = reference, True = current) — the
    standard drift score monitoring puts on every model input:
    PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 broken.

    Values are binned fixed-width (``floor(v / bin_width)``); the bin
    UNIVERSE per key is every bin either half occupies, and both
    halves are Laplace-smoothed over it (``p = (n+1) / (N+B)``) so
    empty-on-one-side bins contribute finitely instead of ±inf.

    Output: ``(key, n_ref, n_cur, n_bins, psi)``.

    Determinism: (p-q)·ln(p/q) contributions are ROUND(12)-pinned and
    summed as DECIMAL(28,12) — order-independent, engine-exact.

    Scale posture: one (key, bin, half) count shuffle with map-side
    partials collapses the corpus to |keys|·|bins|·2 rows; everything
    after is dimension-sized.  No quantile pass — fixed-width bins are
    the streaming-friendly choice (equi-depth bins need a per-key
    quantile pass; ``q_value_percentiles`` shows that form)."""
    binned = df.select(
        F.col(key_col).alias("key"),
        F.floor(F.col(value_col) / F.lit(bin_width)).alias("bin"),
        split_col.alias("cur"),
    )
    counts = binned.groupBy("key", "bin").agg(
        F.sum(F.when(~F.col("cur"), 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("cur"), 1).otherwise(0)).alias("n_cur"),
    )
    # Spark resolves column names case-insensitively by default, so the
    # per-key totals need names disjoint from the per-bin counts
    stats = counts.groupBy("key").agg(
        F.sum("n_ref").alias("tot_ref"),
        F.sum("n_cur").alias("tot_cur"),
        F.count("*").alias("n_bins"),
    )
    joined = counts.join(F.broadcast(stats), "key")
    p = (F.col("n_ref") + F.lit(1)).cast("double") / (
        F.col("tot_ref") + F.col("n_bins")
    ).cast("double")
    q = (F.col("n_cur") + F.lit(1)).cast("double") / (
        F.col("tot_cur") + F.col("n_bins")
    ).cast("double")
    contrib = F.round((q - p) * F.log(q / p), 12).cast("decimal(28,12)")
    return (
        joined.groupBy("key", "tot_ref", "tot_cur", "n_bins")
        .agg(F.sum(contrib).cast("double").alias("psi"))
        .select(
            F.col("key").alias(key_col),
            F.col("tot_ref").alias("n_ref"),
            F.col("tot_cur").alias("n_cur"),
            "n_bins",
            F.round("psi", 6).alias("psi"),
        )
    )
