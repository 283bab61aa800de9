"""PII detection and redaction over a text column — the scrub step a
training-data pipeline runs before anything leaves the raw zone.

Pure whole-stage-codegen expressions (``regexp_count`` /
``regexp_replace``): one map-side projection, no shuffle, no Python.
Patterns are written to the common subset of Java regex (Spark) and RE2
(DuckDB) — character classes, bounded repetition, ``\\b`` — both engines
scan leftmost-first with greedy quantifiers, so counts and replacements
agree exactly (the SQL oracle gates this).

Redaction order is fixed (email → IPv4 → phone) and counts are taken on
the ORIGINAL text, so the three detectors are independent of each other.

At 100 TB: embarrassingly parallel; regex cost is linear in bytes
scanned, and the projection prunes to (id, text) at the parquet scan.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Detector patterns — shared verbatim with the DuckDB oracle.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def _count(text: Column, pattern: str) -> Column:
    return F.regexp_count(text, F.lit(pattern)).cast("long")


def redact(text: Column) -> Column:
    """Replace every email, then IPv4, then phone match with its
    placeholder token.  Order matters only for nested shapes (digits
    inside an already-redacted span); fixing it makes the output a pure
    function of the input in both engines."""
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, IPV4_RE, IPV4_TOKEN)
    return F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document PII report + redacted text: match counts per
    detector (counted on the original text), a ``has_pii`` verdict, and
    the redacted body.  Keep the verdict column instead of filtering so
    downstream policy (drop vs redact vs quarantine) stays a cheap
    predicate."""
    t = F.col(text_col)
    n_emails = _count(t, EMAIL_RE)
    n_ipv4 = _count(t, IPV4_RE)
    n_phones = _count(t, PHONE_RE)
    return df.select(
        F.col(id_col),
        n_emails.alias("n_emails"),
        n_ipv4.alias("n_ipv4"),
        n_phones.alias("n_phones"),
        ((n_emails + n_ipv4 + n_phones) > 0).alias("has_pii"),
        redact(t).alias("redacted"),
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """k-anonymity enforcement over a quasi-identifier tuple: every row
    whose (quasi_cols) combination is shared by fewer than ``k`` rows
    has those columns SUPPRESSED (nulled) — the release then guarantees
    each quasi-identifier fingerprint maps to ≥ k individuals, the
    standard re-identification floor for shared datasets.

    Output: ``(id, *quasi_cols, group_n, suppressed)`` where the quasi
    values are null on suppressed rows and ``group_n`` is the original
    equivalence-class size.

    Distributed shape: aggregate the class sizes (one shuffle of the
    quasi tuple, map-side partials collapse it to |classes| rows), then
    join the class table back.  The class table is usually dimension-
    sized (that is the point of quasi-identifiers) so AQE broadcasts
    the join; a full-sort window over the corpus — the oracle's
    spelling — would shuffle every row's full width instead."""
    sizes = df.groupBy(*quasi_cols).agg(F.count("*").alias("group_n"))
    # Join back with NULL-SAFE equality: groupBy puts NULL quasi values
    # in their own class, but a plain equi-join would never match those
    # rows back to their sizes row, returning group_n = NULL and a NULL
    # suppressed verdict.  eqNullSafe keeps the class-size semantics
    # identical to the groupBy's.
    left = df.select(id_col, *quasi_cols).alias("l")
    rt = sizes.alias("s")
    cond = functools.reduce(
        lambda a, b: a & b,
        [
            F.col(f"l.{c}").eqNullSafe(F.col(f"s.{c}"))
            for c in quasi_cols
        ],
    )
    joined = left.join(rt, cond, "left").select(
        F.col(f"l.{id_col}").alias(id_col),
        *[F.col(f"l.{c}").alias(c) for c in quasi_cols],
        F.col("s.group_n").alias("group_n"),
    )
    small = F.col("group_n") < k
    return joined.select(
        id_col,
        *[
            F.when(~small, F.col(c)).alias(c)
            for c in quasi_cols
        ],
        "group_n",
        small.alias("suppressed"),
    )


def dp_noisy_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float = 1.0,
    seed: str = "dp",
) -> DataFrame:
    """Laplace-perturbed per-group count release — the MECHANISM of an
    ε-differentially-private count query (sensitivity 1, scale b = 1/ε
    noise), implemented with a SEEDED, deterministic noise draw.

    **This is NOT a DP guarantee as shipped.**  The noise is a pure
    function of ``(seed, group key)`` via the repo's hash-stable
    uniform (``md5(seed:group)`` → unit interval → Laplace inverse
    CDF); anyone who knows the seed recomputes the noise and recovers
    the exact counts.  Reproducibility and differential privacy are
    mutually exclusive properties of the SAME release: this function
    keeps the reproducible form so the mechanism's plumbing (noise
    scale, inverse-CDF transform, one-shuffle plan shape) is testable
    bit-for-bit against the DuckDB oracle.  A production DP deployment
    MUST pass a secret, single-use, cryptographically random ``seed``
    that is never persisted alongside the release — and each
    re-release with a fresh seed spends additional budget exactly as
    the ε-composition rule says.  With a committed/public seed (as in
    the gated catalog query), read the output as a deterministic
    perturbation for pipeline testing, not a privacy release.

    Output: ``(group_col, noisy_n)`` — the true count never leaves the
    plan.  One map-side partial count per group; no second shuffle.
    """
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{seed}:"), F.col(group_col).cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("double")
    # (h + 0.5) / 16^15 lies strictly inside (0, 1): the inverse CDF
    # below hits ln(0) at u ∈ {0, 1} exactly
    u = (h + F.lit(0.5)) / F.lit(float(16**15))
    b = 1.0 / float(epsilon)
    noise = F.when(
        u >= 0.5,
        -F.log(F.lit(1.0) - F.lit(2.0) * (u - F.lit(0.5))) * F.lit(b),
    ).otherwise(
        F.log(F.lit(1.0) - F.lit(2.0) * (F.lit(0.5) - u)) * F.lit(b)
    )
    return df.groupBy(group_col).agg(
        F.round(F.count("*").cast("double") + noise, 6).alias("noisy_n")
    )


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """l-diversity audit — k-anonymity's necessary complement: a class
    of ≥ k rows still leaks the sensitive attribute when all its rows
    SHARE one sensitive value (the homogeneity attack).  Each quasi-
    identifier equivalence class must see ≥ ``l`` distinct sensitive
    values.

    Output per class: ``(*quasi_cols, group_n, n_sensitive, top_frac,
    meets_l)`` — class size, distinct sensitive values, the largest
    single value's share (ROUND 6; the recursive-diversity signal),
    and the ≥ l verdict.  NULL sensitive values form their own class,
    matching the groupBy semantics of ``k_anonymity``.

    Distributed shape: ONE shuffle of (quasi, sensitive) counts
    (map-side partials), then a dimension-sized regroup on the quasi
    tuple — the corpus never moves twice."""
    counts = df.groupBy(
        *quasi_cols, F.col(sensitive_col).alias("__sv")
    ).agg(F.count("*").alias("__n"))
    per = counts.groupBy(*quasi_cols).agg(
        F.sum("__n").cast("long").alias("group_n"),
        F.count("*").alias("n_sensitive"),
        F.max("__n").alias("__top"),
    )
    return per.select(
        *quasi_cols,
        "group_n",
        "n_sensitive",
        F.round(
            F.col("__top").cast("double") / F.col("group_n").cast("double"),
            6,
        ).alias("top_frac"),
        (F.col("n_sensitive") >= F.lit(l)).alias("meets_l"),
    )


def t_closeness(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t_max: float = 0.3,
) -> DataFrame:
    """t-closeness audit for an ORDERED sensitive attribute: per
    quasi-identifier class, the Earth Mover's Distance between the
    class's sensitive-value distribution and the global one —
    ``t = sum_i |CumP_class(i) - CumP_global(i)| / (k - 1)`` over the
    ``k`` distinct ordered values — plus the ``t <= t_max`` verdict.
    Completes the k-anonymity / l-diversity / t-closeness trio: a class
    can be k-anonymous and l-diverse yet still leak (its distribution
    skewed far from the population's); this catches that.

    Exactness: the EMD numerator is computed in INTEGER cross-product
    space — ``sum |cum_class * N - cum_global * n_class|`` — with one
    final double division by ``n_class * N * (k-1)``, so the value is
    bit-exact and order-independent (no float cumsum drift).

    Scale shape: everything after the first aggregation is
    dimension-sized — (class x value) cells, a value-domain spine
    broadcast onto classes, and class-partitioned cumulative windows.
    The raw table is touched exactly once."""
    cell = df.groupBy(
        *[F.col(c) for c in quasi_cols],
        F.col(sensitive_col).alias("__v"),
    ).agg(F.count("*").alias("cnt"))
    glob = cell.groupBy("__v").agg(F.sum("cnt").alias("gcnt"))
    groups = cell.groupBy(*quasi_cols).agg(F.sum("cnt").alias("n_class"))
    totals = glob.agg(
        F.sum("gcnt").alias("n_total"), F.count("*").alias("k_values")
    )
    # Ordered-domain spine per class: every class must account for every
    # sensitive value (a missing cell is probability 0, not "skip") —
    # broadcast the value dimension onto the class dimension.
    spine = groups.crossJoin(F.broadcast(glob))
    filled = spine.join(cell, [*quasi_cols, "__v"], "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    w = (
        Window.partitionBy(*quasi_cols)
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = filled.select(
        *quasi_cols,
        "n_class",
        F.sum("cnt").over(w).alias("cum_class"),
        F.sum("gcnt").over(w).alias("cum_global"),
    )
    agg = (
        cum.crossJoin(F.broadcast(totals))
        .groupBy(*quasi_cols, "n_class", "n_total", "k_values")
        .agg(
            F.sum(
                F.abs(
                    F.col("cum_class") * F.col("n_total")
                    - F.col("cum_global") * F.col("n_class")
                )
            ).alias("emd_int")
        )
    )
    t = F.round(
        F.coalesce(
            F.try_divide(
                F.col("emd_int").cast("double"),
                F.col("n_class").cast("double")
                * F.col("n_total").cast("double")
                * (F.col("k_values").cast("double") - F.lit(1.0)),
            ),
            F.lit(0.0),
        ),
        6,
    )
    return agg.select(
        *quasi_cols,
        F.col("n_class").cast("long").alias("n_class"),
        t.alias("t_dist"),
        (t <= F.lit(t_max)).alias("within_t"),
    )


def randomized_response(
    df: DataFrame,
    group_col: str,
    flag_col: str,
    id_col: str,
    p_true: float = 0.75,
    seed: str = "rr",
) -> DataFrame:
    """Warner randomized response — the LOCAL-DP member of this privacy
    shelf (dp_noisy_counts is central DP: a trusted curator adds noise
    AFTER aggregation; here each ROW lies with probability 1−p before
    anything aggregates, so the collector never holds a true value).
    Each row reports its binary flag truthfully with probability
    ``p_true``, flipped otherwise; the release is the per-group
    debiased prevalence π̂ = (observed − (1−p)) / (2p − 1), unbiased
    because E[observed] = p·π + (1−p)(1−π).

    Output per group: ``(group, n, reported_rate, estimated_rate,
    true_rate)`` — ``true_rate`` is emitted ONLY as the test-scale
    audit column (a real release never computes it); estimates may
    legitimately fall outside [0,1] at small n (the unbiased
    estimator's documented behavior — clamping would bias it).
    ROUND(6) doubles.

    **Same caveat as dp_noisy_counts:** the flip draw here is the
    hash-stable uniform ``md5(seed:id)`` so the mechanism is testable
    bit-for-bit cross-engine; a production local-DP deployment draws
    the flip on-device from a cryptographic RNG and never persists it.

    Scale posture: the flip is a map-side predicate; ONE
    map-side-combinable group aggregation; scalar algebra after."""
    u = (
        F.conv(
            F.md5(
                F.concat(
                    F.lit(f"{seed}:"), F.col(id_col).cast("string")
                )
            ).substr(1, 15),
            16,
            10,
        ).cast("double")
        / float(16**15)
    )
    truth = F.col(flag_col).cast("boolean")
    reported = F.when(u < F.lit(float(p_true)), truth).otherwise(~truth)
    agg = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count("*").alias("n"),
        F.sum(reported.cast("int")).alias("rep"),
        F.sum(truth.cast("int")).alias("tru"),
    )
    n_ = F.col("n").cast("double")
    obs = F.col("rep").cast("double") / n_
    est = (obs - F.lit(1.0 - p_true)) / F.lit(2.0 * p_true - 1.0)
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        F.round(obs, 6).alias("reported_rate"),
        F.round(est, 6).alias("estimated_rate"),
        F.round(F.col("tru").cast("double") / n_, 6).alias("true_rate"),
    )
