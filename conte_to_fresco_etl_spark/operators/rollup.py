"""Hypertable-style time-bucket rollups.

Timescale/ClickHouse-family engines maintain multi-resolution continuous
aggregates (hour → day → total) as materialized hypertable rollups.  On
Spark the same product is ONE declarative pass: truncate the timestamp
to each grain and aggregate with GROUPING SETS / ROLLUP — Catalyst
expands the sets inside a single Expand + partial-aggregate plan, so the
input is scanned once and the shuffle carries only (key, grain) partial
states, not raw rows.  That is strictly better than the union-of-N-
aggregations a naive port would write (N scans, N shuffles).

At 100 TB: partial aggregation makes the map side reduce each input
partition to |keys|·|grains| rows before any shuffle; the result is
dimension-table sized.  Sums are decimal-exact (order-independent), so
rollup rows hash-match a naive reaggregation exactly — the invariant a
continuous-aggregate maintainer has to guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conte_to_fresco_etl_spark.functions.core import normalize_ntz


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    sum_decimals: int = 4,
) -> DataFrame:
    """Hierarchical (key, day, hour) rollup: hour-level rows plus
    day-level, key-level, and grand-total super-aggregate rows (nulls
    mark the rolled-up levels, ANSI ROLLUP semantics) in one pass.

    Columns: ``{key}, bucket_day, bucket_hour, grouping_id, n,
    sum_value`` — sums in DECIMAL(18, sum_decimals) cast to double so
    every level is exactly the sum of its children across engines and
    row orders.  ``grouping_id`` (standard GROUPING_ID bit mask, first
    column = MSB; 0 = leaf hour row, 7 = grand total) disambiguates a
    super-aggregate NULL from a genuinely-NULL key or timestamp in the
    data — without it the two collide and level sums stop reconciling.
    """
    src = normalize_ntz(df)
    dec = F.col(value_col).cast(f"decimal(18,{sum_decimals})")
    return (
        src.select(
            F.col(key_col),
            F.date_trunc("day", F.col(ts_col)).alias("bucket_day"),
            F.date_trunc("hour", F.col(ts_col)).alias("bucket_hour"),
            dec.alias("__v"),
        )
        .rollup(key_col, "bucket_day", "bucket_hour")
        .agg(
            F.grouping_id().cast("long").alias("grouping_id"),
            F.count("*").alias("n"),
            F.sum("__v").cast("double").alias("sum_value"),
        )
        .select(
            key_col, "bucket_day", "bucket_hour", "grouping_id",
            "n", "sum_value",
        )
    )


def distinct_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    id_col: str = "user_id",
    fine: str = "day",
    coarse: str = "week",
    est_tolerance: float = 0.05,
    merge_tolerance: float = 0.005,
) -> DataFrame:
    """Sketch-mergeable distinct-count rollup: per-``fine``-bucket HLL
    sketches (Apache DataSketches via ``hll_sketch_agg``) unioned up to
    the ``coarse`` grain, cross-checked against both a direct
    coarse-grain sketch and the exact distinct count.

    This is THE 100 TB distinct-count pattern: exact COUNT(DISTINCT)
    reshuffles every raw id for every grain you ask for, while daily
    sketches are built once (map-side, constant size per bucket) and
    every coarser rollup — week, month, arbitrary date ranges — is a
    cheap union over kilobyte-sized sketch states.  The property that
    makes the staging valid is merge-consistency: unioning the fine
    sketches yields the SAME estimator state as sketching the coarse
    bucket directly (HLL registers are max-merged, and max is
    associative over any partition of the stream).  The query emits
    that invariant as a checked column instead of assuming it.

    Output per coarse bucket: ``(bucket, n_fine, exact_ids,
    merge_consistent, est_within_tol)`` — the last two are the gated
    invariants (merged estimate within ``merge_tolerance`` RELATIVE of
    the direct estimate; direct estimate within ``est_tolerance`` of
    exact).  ``merge_consistent`` deliberately tolerates sub-percent
    drift rather than pinning exact double equality: identical
    estimates are only guaranteed while sketches stay in the
    coupon/sparse regime, and a union that crosses into dense mode (or
    auto-adapts lgK) can legitimately differ in the last few counts at
    higher cardinality — an exact-equality gate would flip to a false
    failure with nothing wrong (ADVICE r5).
    """
    fine_sketches = df.groupBy(
        F.date_trunc(fine, F.col(ts_col)).alias("fine_bucket")
    ).agg(F.hll_sketch_agg(F.col(id_col)).alias("sk"))
    merged = fine_sketches.groupBy(
        F.date_trunc(coarse, F.col("fine_bucket")).alias("bucket")
    ).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"))).alias(
            "merged_est"
        ),
        F.count("*").alias("n_fine"),
    )
    direct = df.groupBy(
        F.date_trunc(coarse, F.col(ts_col)).alias("bucket")
    ).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col(id_col))).alias(
            "direct_est"
        ),
        F.count_distinct(F.col(id_col)).alias("exact_ids"),
    )
    tol = F.lit(float(est_tolerance))
    mtol = F.lit(float(merge_tolerance))
    return merged.join(direct, "bucket").select(
        F.col("bucket").cast("date").alias("bucket"),
        "n_fine",
        "exact_ids",
        (
            F.abs(F.col("merged_est") - F.col("direct_est"))
            <= mtol * F.greatest(F.col("direct_est"), F.lit(1.0))
        ).alias("merge_consistent"),
        (
            F.abs(
                F.col("direct_est").cast("double")
                - F.col("exact_ids").cast("double")
            )
            <= tol * F.col("exact_ids").cast("double")
        ).alias("est_within_tol"),
    )


def count_min_topk(
    df: DataFrame,
    item_col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 512,
    seed: str = "cms",
) -> DataFrame:
    """Count-Min sketch audit: estimate the frequencies of the exact
    top-``k`` items from a ``depth × width`` CMS and report them next
    to the truth — the calibration table a pipeline builds before
    trusting the sketch as its streaming heavy-hitter monitor (the CMS,
    like the HLL in ``distinct_rollup``, is the MERGEABLE form: counter
    matrices from any partitioning/time-slicing add cell-wise, so a
    100 TB corpus sketches map-side into depth·width integers).

    Output per top-k item: ``(item, exact_n, cms_n, overestimate)``,
    ranked (exact_n DESC, item) for determinism.  CMS guarantees
    ``cms_n >= exact_n``; the overestimate column is the observed
    collision bias at this (depth, width).

    Exactness: row hashes are md5-stable (``md5(seed:i:item)`` first
    15 hex chars mod width — engine-portable, no xxhash in the oracle
    engine); the sketch build is one explode(depth) + groupBy over
    (row, bucket) — map-side combinable, 2·depth·width cells of state.
    The probe joins the k candidate items to their depth cells and
    takes MIN — a broadcast-sized join, never a second corpus pass."""
    items = df.select(F.col(item_col).alias("item")).filter(
        F.col("item").isNotNull()
    )
    exact = items.groupBy("item").agg(F.count("*").alias("exact_n"))
    topk = exact.orderBy(F.desc("exact_n"), F.asc("item")).limit(k)

    def bucket(i, item_expr):
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(":", F.lit(seed), F.lit(i), item_expr)
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(width),
        )

    cells = (
        items.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("row_i"),
                            bucket(i, F.col("item")).alias("bucket"),
                        )
                        for i in range(depth)
                    ]
                )
            ).alias("c")
        )
        .groupBy("c.row_i", "c.bucket")
        .agg(F.count("*").alias("cell_n"))
    )
    probes = topk.select(
        "item",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        bucket(i, F.col("item")).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("p"),
    )
    est = (
        probes.join(
            cells,
            (F.col("p.row_i") == F.col("row_i"))
            & (F.col("p.bucket") == F.col("bucket")),
        )
        .groupBy("item", "exact_n")
        .agg(F.min("cell_n").alias("cms_n"))
    )
    return est.select(
        "item",
        "exact_n",
        "cms_n",
        (F.col("cms_n") - F.col("exact_n")).alias("overestimate"),
    ).orderBy(F.desc("exact_n"), F.asc("item"))


def kmv_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 64,
    shingle_n: int = 5,
    seed: str = "kmv",
) -> DataFrame:
    """Pairwise distinct-set overlap between groups via K-Minimum-Values
    sketches — the theta-sketch product (Druid/DataSketches family):
    per-group distinct-shingle cardinality, union cardinality for every
    group pair from the merged sketch, and the inclusion-exclusion
    intersection + Jaccard estimates.  The set-intersection question
    HLL cannot answer (HLL unions only; ``distinct_rollup`` covers
    that axis) — this is how "how much does source A's content overlap
    source B's" is asked at 100 TB without a distinct-join.

    Hashing is the portable ``md5(seed:shingle)`` 60-bit uniform, so
    the sketch — and therefore every estimate — is a pure deterministic
    function of the corpus: exactly reproducible across runs, engines,
    and partitionings (the property the DuckDB oracle gates).  KMV
    estimator: ``(k-1) / u_(k)`` with ``u_(k)`` the k-th smallest
    unit-uniform; exact count when a group holds fewer than k values.

    Scale posture: one distinct-(group, hash) aggregation over the
    shingle explode, then the per-group k-min is a ``row_number <= k``
    that Spark executes as WindowGroupLimit (map-side partial top-k —
    each task forwards at most k rows per group, the shuffle never
    carries the full distinct set).  Everything downstream operates on
    |groups| x k sketch rows: the pair generation, union re-sketch,
    and estimates are dimension-sized.  Sketches are mergeable by
    construction — a monthly sketch table unions into quarters without
    touching raw data.

    Output per unordered pair (a < b): ``(source_a, source_b, est_a,
    est_b, est_union, est_intersection, jaccard_est)``, all ROUND(6).
    """
    from pyspark.sql import Window

    from conte_to_fresco_etl_spark.functions.text import md5_long
    from conte_to_fresco_etl_spark.parallelism import (
        DENSE_BYTES_PER_TASK,
        ensure_min_parallelism,
    )

    two60 = float(1 << 60)
    kd = F.lit(float(k - 1))

    c = F.lower(F.col(text_col))
    shingles = F.when(
        F.length(c) < shingle_n, F.array().cast("array<string>")
    ).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(c) - F.lit(shingle_n - 1)),
                lambda i: c.substr(i, F.lit(shingle_n)),
            )
        )
    )
    hs = (
        ensure_min_parallelism(
            df.select(F.col(group_col).alias("g"), F.col(text_col)),
            DENSE_BYTES_PER_TASK,
        )
        .select("g", F.explode(shingles).alias("s"))
        .select(
            "g",
            md5_long(F.concat(F.lit(f"{seed}:"), F.col("s"))).alias("h"),
        )
        .distinct()
    )
    wk = Window.partitionBy("g").orderBy("h")
    # the |groups|·k sketch feeds THREE consumers (per-group estimates
    # and both union-sketch sides): checkpoint so the shingle explode +
    # distinct — the only data-sized pass — runs ONCE and the
    # downstream plan is sketch-sized (r13; guide §3.3.  Un-truncated,
    # the 1k-line plan re-ran the explode per consumer: 52 Exchanges
    # at sf0.1; blocks are reclaimed by session.sweep_persisted)
    sk = (
        hs.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= k)
        .select("g", "h")
        .localCheckpoint(eager=False)
    )
    est = sk.groupBy("g").agg(
        F.count("*").alias("n"), F.max("h").alias("mx")
    ).select(
        "g",
        F.round(
            F.when(F.col("n") < k, F.col("n").cast("double")).otherwise(
                kd / (F.col("mx").cast("double") / F.lit(two60))
            ),
            6,
        ).alias("d"),
    )
    pairs = (
        est.alias("a")
        .join(est.alias("b"), F.col("a.g") < F.col("b.g"))
        .select(
            F.col("a.g").alias("ga"),
            F.col("b.g").alias("gb"),
            F.col("a.d").alias("da"),
            F.col("b.d").alias("db"),
        )
    )
    pu = (
        pairs.select("ga", "gb")
        .join(sk.withColumnRenamed("g", "ga"), "ga")
        .select("ga", "gb", "h")
        .unionByName(
            pairs.select("ga", "gb")
            .join(sk.withColumnRenamed("g", "gb"), "gb")
            .select("ga", "gb", "h")
        )
        .distinct()
    )
    wu = Window.partitionBy("ga", "gb").orderBy("h")
    uest = (
        pu.withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") <= k)
        .groupBy("ga", "gb")
        .agg(F.count("*").alias("nu"), F.max("h").alias("mxu"))
        .select(
            "ga",
            "gb",
            F.round(
                F.when(F.col("nu") < k, F.col("nu").cast("double")).otherwise(
                    kd / (F.col("mxu").cast("double") / F.lit(two60))
                ),
                6,
            ).alias("du"),
        )
    )
    inter = F.round(
        F.greatest(F.lit(0.0), F.col("da") + F.col("db") - F.col("du")), 6
    )
    return (
        pairs.join(uest, ["ga", "gb"])
        .select(
            F.col("ga").alias("source_a"),
            F.col("gb").alias("source_b"),
            F.col("da").alias("est_a"),
            F.col("db").alias("est_b"),
            F.col("du").alias("est_union"),
            inter.alias("est_intersection"),
            F.round(F.try_divide(inter, F.col("du")), 6).alias(
                "jaccard_est"
            ),
        )
    )
