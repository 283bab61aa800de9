"""Scan-parallelism guard for compute-dense stages.

A small parquet input (one file, one row group) scans as a SINGLE
partition, so a compute-dense downstream stage — Arrow signature
computation, codec decode, per-row scoring — runs on one core no matter
how many the session has.  ``ensure_min_parallelism`` repartitions such
inputs toward the session's default parallelism before the expensive
stage.

The target is COST-AWARE, not unconditional: partitions are sized from
the plan's estimated input bytes via ``bytes_per_task`` — the number of
input bytes whose downstream per-row work roughly fills one task.
Operators whose per-row compute is heavy relative to the bytes read
(md5-per-shingle signatures, codec decodes) pass a small
``bytes_per_task`` so even a 1 MB scan fans out; operators whose per-row
work is a few dozen FLOPs (embedding scoring) keep the default, so tiny
inputs are NOT shuffled for nothing but a multi-GB single-file corpus
still fans out to every core.

Scale posture: at 100 TB inputs arrive as thousands of row groups and
this is a NO-OP (the guard never down-partitions); locally it is the
difference between 1 and 32 cores doing the signature math — measured
1.58s → 0.65s on the minhash signature stage at sf0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Default: one task per 4 MB of input — right for lightweight per-row
#: work (vector scoring, simple projections).
DEFAULT_BYTES_PER_TASK = 4 * 1024 * 1024

#: For compute-dense stages (per-shingle hashing, codec decode): one
#: task per 64 KB of input.
DENSE_BYTES_PER_TASK = 64 * 1024


def estimate_input_bytes(df: DataFrame) -> int:
    """Best-effort input size from the plan's scan files (public API —
    ``df.inputFiles()``); non-local / unstat-able URIs count as 0, so
    callers treat the estimate as a lower bound."""
    try:
        import os
        from urllib.parse import unquote, urlparse

        est_bytes = 0
        for uri in df.inputFiles():
            parsed = urlparse(uri)
            if parsed.scheme in ("", "file"):
                try:
                    est_bytes += os.path.getsize(unquote(parsed.path))
                except OSError:
                    pass
        return est_bytes
    except Exception:  # noqa: BLE001 — stats unavailable: be conservative
        return 0


def ensure_min_parallelism(
    df: DataFrame, bytes_per_task: int = DEFAULT_BYTES_PER_TASK
) -> DataFrame:
    """Repartition ``df`` up to ``min(defaultParallelism,
    est_bytes / bytes_per_task)`` when the current plan yields fewer
    partitions; pass through unchanged otherwise.  Semantics-neutral for
    every operator in this package (they are row-order independent)."""
    sc = df.sparkSession.sparkContext
    # Size from the scan's input files (public API — df.inputFiles()),
    # not queryExecution() stats (private _jdf access, breaks across
    # Spark versions).  inputFiles() returns percent-encoded URIs, so
    # unquote before stat'ing (a space in a path arrives as %20).
    # Non-local URIs we can't stat cheaply count as 0: conservative —
    # the guard only ever fans OUT, never down-partitions, and at
    # remote-storage scale inputs arrive as many splits anyway.
    est_bytes = estimate_input_bytes(df)
    want = max(1, min(sc.defaultParallelism, est_bytes // bytes_per_task))
    if want > 1 and df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df


def prefix_sums(
    df: DataFrame,
    order_col: str,
    sum_cols: list[str],
    prefix: str = "cum_",
    input_pinned: bool = False,
) -> DataFrame:
    """Distributed cumulative sums: for every row, the INCLUSIVE running
    sum of each ``sum_cols`` entry over the global ``order_col`` order,
    emitted as ``{prefix}{col}`` next to the input columns.

    The naive spelling — ``F.sum(c).over(Window.orderBy(order_col))`` —
    moves the ENTIRE input through one task (Spark's "No Partition
    Defined for Window" warning): fine for a days-sized table, a
    straggler for anything data-sized (a 10⁷-token vocabulary, the
    per-distinct-value count table of a continuous metric).  This is
    the standard two-pass fix:

    1. range-partition on ``order_col`` (partitions are contiguous
       ranges of the order), cumsum WITHIN each partition in parallel;
    2. per-partition totals → each partition's running offset is the
       sum of all EARLIER partitions' totals, computed by a triangular
       join over the ~|shuffle partitions|² grid (a few thousand tiny
       rows) and broadcast back.

    Exactness: integer/decimal addition is associative, so the result
    is bit-identical to the single-task window for any contiguous
    split — use decimal/integer ``sum_cols`` (the package-wide
    quantize-then-sum discipline) and the sampled range boundaries
    cannot perturb values.  ``order_col`` must be unique per row
    (the callers cumsum tables already grouped BY the order key).

    Both the offsets aggregate and the output consume the partitioned
    frame; a lazy localCheckpoint pins the (sampled) range boundaries
    so the two sides cannot disagree on partition ids.

    The INPUT is pinned with its own lazy localCheckpoint first (r14):
    the range exchange's RangePartitioner runs a synchronous sample job
    over its child during plan construction (``toRdd`` inside the lazy
    checkpoint below), and without the pin that sample pass re-executes
    the caller's whole upstream pipeline — typically a full-input
    aggregation, or Theil-Sen's pairwise-slope join — a second time.
    Pinning the (marginal-sized) input makes the sample read persisted
    blocks, so the upstream runs exactly once per call.  A caller that
    has ALREADY pinned ``df`` (to share the materialization with its
    own second consumer, e.g. :func:`kth_element`'s total) passes
    ``input_pinned=True`` to skip the redundant inner checkpoint."""
    from pyspark.sql import Window, functions as F

    cols = df.columns
    pinned = df if input_pinned else df.localCheckpoint(eager=False)
    parts = pinned.repartitionByRange(order_col).withColumn(
        "__pid", F.spark_partition_id()
    )
    wloc = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parts.select(
        *cols,
        "__pid",
        *[F.sum(c).over(wloc).alias(f"__loc_{c}") for c in sum_cols],
    ).localCheckpoint(eager=False)
    ptot = local.groupBy("__pid").agg(
        *[F.sum(c).alias(f"__pt_{c}") for c in sum_cols]
    )
    earlier = ptot.select(
        F.col("__pid").alias("__bpid"),
        *[F.col(f"__pt_{c}").alias(f"__bt_{c}") for c in sum_cols],
    )
    offsets = (
        ptot.join(
            F.broadcast(earlier), F.col("__bpid") < F.col("__pid"), "left"
        )
        .groupBy("__pid")
        .agg(
            *[
                F.coalesce(F.sum(f"__bt_{c}"), F.lit(0)).alias(f"__off_{c}")
                for c in sum_cols
            ]
        )
    )
    return local.join(F.broadcast(offsets), "__pid").select(
        *cols,
        *[
            (F.col(f"__loc_{c}") + F.col(f"__off_{c}")).alias(
                f"{prefix}{c}"
            )
            for c in sum_cols
        ],
    )


def kth_element(
    df: DataFrame,
    value_col: str,
    ranks_of_m,
    out_col: str | None = None,
) -> DataFrame:
    """Exact order-statistic selection WITHOUT a global sort task: a
    ONE-row DataFrame ``({out_col}, m)`` where ``{out_col}`` is the
    average of the values at the 1-based ranks ``ranks_of_m(m_col)``
    (a list of rank expressions over the total-count column) and ``m``
    is the input row count.

    The naive spelling — ``row_number() over (ORDER BY value)`` then
    filtering to the target ranks — sorts the ENTIRE input in one task
    (the same WindowExec worst case :func:`prefix_sums` exists to
    kill).  This is the Mann-Whitney discipline applied to selection:

    1. collapse to the VALUE-MARGINAL count table (|distinct values|
       rows, one map-combinable shuffle);
    2. :func:`prefix_sums` over the marginal gives each distinct value
       its inclusive cumulative count — i.e. the half-open rank
       interval ``(cum - cnt, cum]`` it occupies;
    3. the k-th element is the unique marginal row whose interval
       contains k: ``cum >= k AND cum - cnt < k`` — a filter against
       the 1-row broadcast total, never a sort.

    Exactness: identical to the row_number spelling for ANY tie
    structure and tie-break order (ties share a value, and selection
    only ever reads the value).  ``ranks_of_m`` receives the ``m``
    Column and returns rank expressions (e.g. lower/upper middle for
    the median); rows matching ANY requested rank are averaged."""
    from pyspark.sql import functions as F

    out = out_col or f"kth_{value_col}"
    # r14: the marginal is pinned ONCE here and shared by all three of
    # its consumers (the range sample job, the cumsum chain, and the
    # total) — without the pin each consumer re-ran the full marginal
    # aggregation (three input scans per kth_element call).
    marg = df.groupBy(value_col).agg(F.count("*").alias("__mcnt")) \
        .localCheckpoint(eager=False)
    cum = prefix_sums(
        marg, value_col, ["__mcnt"], prefix="__cm_", input_pinned=True
    )
    # r13: the total derives from the marginal (Σ marginal counts = row
    # count, exact integer identity) instead of a second full pass over
    # ``df``.
    tot = marg.agg(F.sum("__mcnt").alias("m"))
    ranks = ranks_of_m(F.col("m"))
    hit = None
    for k in ranks:
        cond = (F.col("__cm___mcnt") >= k) & (
            (F.col("__cm___mcnt") - F.col("__mcnt")) < k
        )
        hit = cond if hit is None else (hit | cond)
    return (
        cum.join(F.broadcast(tot), hit)
        .agg(F.avg(value_col).alias(out), F.max("m").alias("m"))
    )


def exact_median(
    df: DataFrame, value_col: str, out_col: str | None = None
) -> DataFrame:
    """ONE-row ``({out_col} = exact median, m = count)`` via
    :func:`kth_element` at the lower and upper middle ranks
    ``floor((m+1)/2)`` / ``ceil((m+1)/2)`` (their average — the
    textbook even-n median).  Bit-identical to the single-task
    ``row_number`` median for any tie structure, with no global sort
    task anywhere in the plan."""
    from pyspark.sql import functions as F

    return kth_element(
        df,
        value_col,
        lambda m: [
            F.floor((m + F.lit(1)) / F.lit(2)),
            F.ceil((m + F.lit(1)) / F.lit(2)),
        ],
        out_col=out_col or f"med_{value_col}",
    )


def prefix_max(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum_max",
    descending: bool = False,
    exclusive: bool = False,
) -> DataFrame:
    """Distributed running maximum over a global order — the MAX
    sibling of :func:`prefix_sums` (max is associative and
    commutative, so the identical two-pass shape applies: per-range
    cummax in parallel, each partition offset by the max of all
    earlier partitions via the tiny triangular join).

    ``descending`` orders the scan from the top; ``exclusive`` emits
    the max of STRICTLY earlier rows (NULL for the first row) — the
    shape a skyline/Pareto scan needs.  ``order_col`` must be unique
    per row (callers scan tables already grouped by the order key).

    The input is pinned before the range exchange for the same reason
    as :func:`prefix_sums`: the RangePartitioner sample job otherwise
    re-executes the caller's upstream pipeline a second time."""
    from pyspark.sql import Window, functions as F

    cols = df.columns
    pinned = df.localCheckpoint(eager=False)
    parts = pinned.repartitionByRange(
        F.col(order_col).desc() if descending else F.col(order_col)
    ).withColumn("__pid", F.spark_partition_id())
    order = F.col(order_col).desc() if descending else F.col(order_col)
    frame = (-1 if exclusive else 0)
    wloc = (
        Window.partitionBy("__pid")
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, frame)
    )
    local = parts.select(
        *cols,
        "__pid",
        F.max(value_col).over(wloc).alias("__loc"),
    ).localCheckpoint(eager=False)
    # inclusive per-partition totals feed the offsets regardless of
    # the exclusive flag (earlier PARTITIONS are wholly earlier rows)
    ptot = local.groupBy("__pid").agg(
        F.max(value_col).alias("__pt")
    )
    earlier = ptot.select(
        F.col("__pid").alias("__bpid"), F.col("__pt").alias("__bt")
    )
    offsets = (
        ptot.join(
            F.broadcast(earlier), F.col("__bpid") < F.col("__pid"), "left"
        )
        .groupBy("__pid")
        .agg(F.max("__bt").alias("__off"))
    )
    merged = F.when(
        F.col("__off").isNull(), F.col("__loc")
    ).when(F.col("__loc").isNull(), F.col("__off")).otherwise(
        F.greatest(F.col("__loc"), F.col("__off"))
    )
    return local.join(F.broadcast(offsets), "__pid").select(
        *cols, merged.alias(out_col)
    )
