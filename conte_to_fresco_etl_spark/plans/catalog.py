"""Declared query catalog: every SURVEY §2 operator exercised as a
(Spark DataFrame query, ANSI-SQL DuckDB oracle) pair over the driver's
testdata tables (TESTDATA.md: region nation customer supplier part orders
lineitem events documents embeddings).

Cross-engine exactness rules (so order-insensitive value hashes match):
  * SUM of doubles is NOT reproducible across engines → sum in
    DECIMAL(18,2/4) (exact integer arithmetic, order-independent) and
    cast the result to DOUBLE in both engines.
  * derived floats (rates, ratios, cosines) → both sides compute the
    identical expression tree on identical operands, then ROUND(x, 6).
  * every hash derives from md5 (same hex in Spark and DuckDB);
    hex→int64 is conv(h,16,10) / CAST('0x'||h AS BIGINT).
  * rankings order by (rounded score, id) so ties are deterministic.

Scale notes are attached per query; the catalog is also the bench
workload (bench.py runs the HEADLINE set at sf0.1).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from conte_to_fresco_etl_spark.functions.core import clip, normalize_ntz
from conte_to_fresco_etl_spark.functions.job import (
    exitcode_case,
    host_list_string,
    std_job_id_extract,
    walltime_seconds,
)
from conte_to_fresco_etl_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_duplicate_groups,
    minhash_coefficients,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    MINHASH_PRIME,
)
from conte_to_fresco_etl_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)
from conte_to_fresco_etl_spark.operators.text_analysis import profile_documents
from conte_to_fresco_etl_spark.functions.text import LANG_STOPWORDS, EN_STOPWORDS

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

#: Per-process memo of each table's parquet SCHEMA (metadata only — the
#: catalog/metastore equivalent; every query still scans the parquet
#: itself).  Motivation (r13, measured): a bare ``spark.read.parquet``
#: pays ~0.25-0.32s of footer/schema inference PER CALL on this box,
#: while ``spark.read.schema(s).parquet`` costs ~0.07-0.10s — across
#: 366 queries x 1-3 table reads each that inference is a large slice
#: of the per-query fixed cost (guide §6: production tables resolve
#: schemas through a catalog, not per-query file inspection).  The
#: first read of each (dir, table) still infers and seeds the memo, so
#: behavior is schema-identical by construction.
_SCHEMA_MEMO: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    key = (sf_dir, name)
    sch = _SCHEMA_MEMO.get(key)
    if sch is None:
        df = spark.read.parquet(path)
        _SCHEMA_MEMO[key] = df.schema
        return normalize_ntz(df)
    return normalize_ntz(spark.read.schema(sch).parquet(path))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table loader tolerant of TIMESTAMP(NANOS) parquet, which
    Spark's vectorized reader rejects by default.  With nanosAsLong the
    column arrives as int64 nanos; convert via integer division (floor)
    to microseconds — the same truncation DuckDB applies, so both
    engines see identical instants."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover - conf removed/renamed upstream
        pass
    df = _t(spark, sf_dir, "events")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def _dec2(c):  # exact money arithmetic: decimal sums, double result
    return F.col(c).cast("decimal(18,2)")


def _dec4(c):
    return F.col(c).cast("decimal(18,4)")


#: TPC-H-ish revenue term, decimal-exact.
def _disc_price():
    return _dec2("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec4("l_discount"))


_SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# ---------------------------------------------------------------------------
# 1. Aggregation core (SURVEY §2.4 A1-A7 analogues)
# ---------------------------------------------------------------------------

@_q(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-aggregate with decimal-exact sums.  Scale: map-side partial
    agg + 4-group final — shuffle carries only group keys."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec2("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec2("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
        (F.sum(_dec2("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


@_q(
    "q_minmax_summary",
    """
    SELECT o_orderstatus, COUNT(*) AS n,
           MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_minmax_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 min/max date-range probe (processor:1244-1251 analogue)."""
    return _t(spark, sf_dir, "orders").groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
    )


# ---------------------------------------------------------------------------
# 2. Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------

@_q(
    "q3_top_orders",
    f"""
    SELECT l_orderkey,
           CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two broadcast joins + agg + deterministic top-k (revenue desc,
    orderkey asc).  Scale: customer/orders broadcast per-filter;
    lineitem never shuffles before the group-by."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@_q(
    "q_interval_join",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
      AND l_shipdate >= o_orderdate
      AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1's shape on testdata: equi-key + range predicate, small side
    broadcast (reference conte-etl-step-2-processor.py:742-748,783-785).
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate <= orders.o_orderdate + F.expr("INTERVAL 90 DAYS"))
    )
    return (
        li.join(orders, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(_dec2("l_quantity")).cast("double").alias("sum_qty"),
        )
    )


@_q(
    "q_semi_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/J4 left-semi filter by key set (utils/analyze-timestamps.py:53)."""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@_q(
    "q_anti_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 difference-of-key-sets as an anti join
    (transform_conte_ts_data.py:779-781 analogue)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@_q(
    "q_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 union + A3 distinct (transform:983-991, :1043)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


# ---------------------------------------------------------------------------
# 3. Window + pivot (SURVEY §2.5 W1, §2.9 R1)
# ---------------------------------------------------------------------------

@_q(
    "q_window_rate",
    """
    SELECT event_id, user_id, event_type,
           ROUND(GREATEST(0.0, COALESCE(
             (value - LAG(value) OVER w)
               / GREATEST(0.1, epoch(ts) - LAG(epoch(ts)) OVER w),
             0.0)), 6) AS rate
    FROM events
    WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    """,
)
def q_window_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 lag-diff rate (transform_conte_ts_data.py:591-617): Δvalue /
    max(0.1, Δt_seconds), first row per group → 0, clamped >= 0.
    Scale: single shuffle on the window key."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    dv = F.col("value") - F.lag("value").over(w)
    dt = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    rate = clip(
        F.coalesce(dv / F.greatest(F.lit(0.1), dt), F.lit(0.0)), lo=0.0
    )
    return ev.select(
        "event_id", "user_id", "event_type", F.round(rate, 6).alias("rate")
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

@_q(
    "q_pivot_scatter",
    "SELECT event_id, user_id, ts,\n"
    + ",\n".join(
        f"  CASE WHEN event_type = '{e}' THEN value END AS value_{e}"
        for e in _EVENT_TYPES
    )
    + "\nFROM events",
)
def q_pivot_scatter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 pivot-without-collapse (processor:804-833): one row per event,
    exactly one non-null value_* column — NOT groupBy().pivot()."""
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        *[
            F.when(F.col("event_type") == e, F.col("value")).alias(f"value_{e}")
            for e in _EVENT_TYPES
        ],
    )


# ---------------------------------------------------------------------------
# 4. Flagship: the conte set3 dataflow shape on testdata (E3)
# ---------------------------------------------------------------------------

_CONTE_SET3_SQL = (
    """
    WITH jobs AS (
      SELECT user_id,
             MIN(ts) AS start_time,
             MIN(ts) + INTERVAL 7 DAY AS end_time,
             COUNT(*) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT e.event_id,
           concat('JOB', CAST(e.user_id AS VARCHAR)) AS jid,
           e.ts AS time,
           j.start_time, j.end_time, j.n_events,
"""
    + ",\n".join(
        f"           CASE WHEN e.event_type = '{e}' THEN e.value END AS value_{e}"
        for e in _EVENT_TYPES
    )
    + """
    FROM events e
    JOIN jobs j ON e.user_id = j.user_id
      AND e.ts >= j.start_time AND e.ts <= j.end_time
    """
)

@_q("conte_set3", _CONTE_SET3_SQL)
def conte_set3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's E3 dataflow re-shaped onto testdata: derive a
    per-user job interval, broadcast-join events into it with the range
    predicate, pivot-scatter event values, standardize the join key
    (F9).  Mirrors process_year_month end-to-end
    (conte-etl-step-2-processor.py:1612-1839)."""
    ev = _events(spark, sf_dir)
    jobs = ev.groupBy("user_id").agg(
        F.min("ts").alias("start_time"),
        (F.min("ts") + F.expr("INTERVAL 7 DAYS")).alias("end_time"),
        F.count("*").alias("n_events"),
    )
    e, j = ev.alias("e"), jobs.alias("j")
    cond = (
        (F.col("e.user_id") == F.col("j.user_id"))
        & (F.col("e.ts") >= F.col("j.start_time"))
        & (F.col("e.ts") <= F.col("j.end_time"))
    )
    return e.join(F.broadcast(j), cond).select(
        F.col("e.event_id").alias("event_id"),
        F.concat(F.lit("JOB"), F.col("e.user_id").cast("string")).alias("jid"),
        F.col("e.ts").alias("time"),
        F.col("j.start_time").alias("start_time"),
        F.col("j.end_time").alias("end_time"),
        F.col("j.n_events").alias("n_events"),
        *[
            F.when(F.col("e.event_type") == t, F.col("e.value")).alias(f"value_{t}")
            for t in _EVENT_TYPES
        ],
    )


# ---------------------------------------------------------------------------
# 5. Reference scalar semantics (F9-F12) exercised cross-engine
# ---------------------------------------------------------------------------

_WT_SYNTH_SQL = """
      CASE CAST(l_partkey % 3 AS INTEGER)
        WHEN 0 THEN CAST(l_partkey AS VARCHAR)
        WHEN 1 THEN concat(CAST(l_linenumber AS VARCHAR), ':',
                           CAST(l_partkey % 60 AS VARCHAR))
        ELSE concat(CAST(l_linenumber AS VARCHAR), ':',
                    CAST(l_partkey % 60 AS VARCHAR), ':',
                    CAST(l_suppkey % 60 AS VARCHAR))
      END
"""

@_q(
    "q_walltime_parse",
    f"""
    WITH synth AS (
      SELECT l_orderkey, l_linenumber, {_WT_SYNTH_SQL} AS walltime
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, walltime,
           CASE
             WHEN regexp_matches(walltime, '^\\d+(\\.\\d+)?$')
               THEN CAST(walltime AS DOUBLE)
             WHEN len(string_split(walltime, ':')) = 3
               THEN TRY_CAST(string_split(walltime, ':')[1] AS DOUBLE) * 3600
                  + TRY_CAST(string_split(walltime, ':')[2] AS DOUBLE) * 60
                  + TRY_CAST(string_split(walltime, ':')[3] AS DOUBLE)
             WHEN len(string_split(walltime, ':')) = 2
               THEN TRY_CAST(string_split(walltime, ':')[1] AS DOUBLE) * 60
                  + TRY_CAST(string_split(walltime, ':')[2] AS DOUBLE)
           END AS timelimit
    FROM synth
    """,
)
def q_walltime_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 walltime→seconds (processor:224-276) over synthesized
    HH:MM:SS / MM:SS / bare-seconds strings."""
    li = _t(spark, sf_dir, "lineitem")
    wt = (
        F.when(
            (F.col("l_partkey") % 3) == 0, F.col("l_partkey").cast("string")
        )
        .when(
            (F.col("l_partkey") % 3) == 1,
            F.concat_ws(
                ":",
                F.col("l_linenumber").cast("string"),
                (F.col("l_partkey") % 60).cast("string"),
            ),
        )
        .otherwise(
            F.concat_ws(
                ":",
                F.col("l_linenumber").cast("string"),
                (F.col("l_partkey") % 60).cast("string"),
                (F.col("l_suppkey") % 60).cast("string"),
            )
        )
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        wt.alias("walltime"),
        walltime_seconds(wt).alias("timelimit"),
    )


@_q(
    "q_exitcode_case",
    """
    WITH synth AS (
      SELECT o_orderkey,
             CASE o_orderstatus WHEN 'F' THEN 'E' WHEN 'O' THEN 'S' ELSE 'Q' END AS ev,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE CAST(o_orderkey % 3 AS VARCHAR) END AS st
      FROM orders
    ),
    filled AS (
      SELECT o_orderkey, ev, COALESCE(st, '') AS st FROM synth
    )
    SELECT o_orderkey,
           CASE
             WHEN ev = 'E' AND st = '0' THEN 'COMPLETED'
             WHEN ev = 'E' AND st <> '0' THEN concat('FAILED:', st)
             WHEN ev = 'A' THEN 'ABORTED'
             WHEN ev = 'S' THEN 'STARTED'
             WHEN ev = 'Q' THEN 'QUEUED'
             ELSE concat_ws(':', ev, st)
           END AS exitcode
    FROM filled
    """,
)
def q_exitcode_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 exitcode CASE (processor:279-333) over synthesized PBS events;
    every-7th status is NULLed to pin the reference's fillna('')
    semantics (('E', NULL) → 'FAILED:')."""
    o = _t(spark, sf_dir, "orders")
    ev = (
        F.when(F.col("o_orderstatus") == "F", F.lit("E"))
        .when(F.col("o_orderstatus") == "O", F.lit("S"))
        .otherwise(F.lit("Q"))
    )
    st = F.when(
        F.col("o_orderkey") % 7 != 0, (F.col("o_orderkey") % 3).cast("string")
    )
    return o.select(
        "o_orderkey", exitcode_case(ev, st).alias("exitcode")
    )


@_q(
    "q_hostlist_parse",
    """
    WITH synth AS (
      SELECT s_suppkey,
             concat(s_name, '/0+', s_name, '/1+shared-node/2') AS exec_host
      FROM supplier
    )
    SELECT s_suppkey,
           concat('{',
             array_to_string(
               list_sort(list_distinct(
                 regexp_extract_all(exec_host, '([^/+]+)/', 1))), ','),
           '}') AS host_list
    FROM synth
    """,
)
def q_hostlist_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 exec_host→{a,b} (processor:566-616) over synthesized strings."""
    s = _t(spark, sf_dir, "supplier")
    exec_host = F.concat(
        F.col("s_name"), F.lit("/0+"), F.col("s_name"), F.lit("/1+shared-node/2")
    )
    return s.select(
        "s_suppkey", host_list_string(exec_host).alias("host_list")
    )


@_q(
    "q_jobid_normalize",
    """
    SELECT doc_id,
           CASE WHEN regexp_extract(source, '(\\d+)', 1) <> ''
                THEN concat('JOB', regexp_extract(source, '(\\d+)', 1))
                ELSE source END AS jid
    FROM documents
    """,
)
def q_jobid_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9/J2 id standardization (processor:496-507)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", std_job_id_extract(F.col("source")).alias("jid"))


# ---------------------------------------------------------------------------
# 6. Streaming-operator batch equivalents + validation probes
# ---------------------------------------------------------------------------

@_q(
    "q_windowed_rates",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_windowed_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregate — the batch twin of
    streaming.windowed_event_rates (same grouping; SUM in decimal instead
    of AVG so the value hash is order-independent cross-engine).  Scale:
    one shuffle on (window, event_type); map-side partial agg first."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum(_dec4("value")).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


@_q(
    "q_interval_violations",
    """
    WITH jobs AS (
      SELECT user_id,
             MIN(ts) AS start_t,
             MIN(ts) + INTERVAL 3 DAY AS end_t
      FROM events GROUP BY user_id
    )
    SELECT e.user_id,
           COUNT(*) AS n_ts,
           CAST(SUM(CASE WHEN e.ts < j.start_t OR e.ts > j.end_t
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outside,
           ROUND(CAST(SUM(CASE WHEN e.ts < j.start_t OR e.ts > j.end_t
                               THEN 1 ELSE 0 END) AS BIGINT)
                 * 100.0 / COUNT(*), 4)
             AS pct_outside
    FROM events e JOIN jobs j ON e.user_id = j.user_id
    GROUP BY e.user_id
    """,
)
def q_interval_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 validation probe (utils/analyze-timestamps.py:73-85) via
    validation.interval_violations: % of rows outside each job's
    interval.  Jobs fabricated as [first event, +3 days] per user."""
    from conte_to_fresco_etl_spark.validation import interval_violations

    ev = _events(spark, sf_dir)
    jobs = ev.groupBy(F.col("user_id").alias("jobID")).agg(
        F.min("ts").alias("start"),
        (F.min("ts") + F.expr("INTERVAL 3 DAYS")).alias("end"),
    )
    out = interval_violations(
        ev, jobs, ts_key="user_id", job_key="jobID", ts_col="ts"
    )
    return out.select(
        F.col("jobID").alias("user_id"), "n_ts", "n_outside", "pct_outside"
    )


@_q(
    "q_distinct_counts",
    """
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS d_orderkey,
           COUNT(DISTINCT l_partkey) AS d_partkey,
           COUNT(DISTINCT l_returnflag) AS d_returnflag
    FROM lineitem
    """,
)
def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 cardinality probe, exact form for the cross-engine gate (the
    scale path is validation.cardinality_report's HyperLogLog++
    approx_count_distinct — one pass, no per-column shuffle).

    NOT the naive ``agg(count_distinct × 3)``: Spark rewrites multiple
    distinct aggregates via Expand — every row is replicated once per
    distinct column into one wide shuffle (measured 1.80s at sf0.1 on
    local[32]).  Instead, union three column-pruned (key_id, value)
    projections, partial-aggregate to per-partition distinct pairs, and
    shuffle only the surviving narrow pairs; a second single-row agg
    folds pair counts into the distinct counts and n_rows (sum of the
    key-0 pair counts).  Measured 1.11s — same exact answer, and at
    100 TB the shuffle carries per-partition-distinct pairs instead of
    3× the corpus row count."""
    li = _t(spark, sf_dir, "lineitem")
    pairs = (
        li.select(
            F.lit(0).alias("k"),
            F.col("l_orderkey").cast("string").alias("v"),
        )
        .unionAll(li.select(F.lit(1), F.col("l_partkey").cast("string")))
        .unionAll(li.select(F.lit(2), F.col("l_returnflag").cast("string")))
        .groupBy("k", "v")
        .agg(F.count("*").alias("c"))
    )
    return pairs.groupBy().agg(
        # coalesce: SUM over zero rows is NULL, but the COUNT(*) oracle
        # (and the previous count(lit(1)) form) yields 0 on an empty table
        F.coalesce(F.sum(F.when(F.col("k") == 0, F.col("c"))), F.lit(0))
        .cast("long")
        .alias("n_rows"),
        F.count(F.when(F.col("k") == 0, F.col("v"))).alias("d_orderkey"),
        F.count(F.when(F.col("k") == 1, F.col("v"))).alias("d_partkey"),
        F.count(F.when(F.col("k") == 2, F.col("v"))).alias("d_returnflag"),
    )


@_q(
    "q_sessionize",
    """
    WITH e AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
      FROM e
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM s GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min timeout), batch twin of the
    streaming applyInPandasWithState sessionizer: two windows + one agg,
    a single shuffle on the user key."""
    from conte_to_fresco_etl_spark.operators.sessions import (
        sessionize_events,
    )

    return sessionize_events(_events(spark, sf_dir), gap_minutes=30)


@_q(
    "q_value_histogram",
    """
    SELECT event_type,
           CAST(FLOOR(value / 10.0) AS BIGINT) AS bin,
           COUNT(*) AS n,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1, 2
    """,
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values per type — the profiling
    aggregate behind distribution dashboards.  floor(v/width) binning is
    engine-exact on doubles; one partial-agg shuffle."""
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    return ev.groupBy(
        "event_type",
        F.floor(F.col("value") / 10.0).cast("long").alias("bin"),
    ).agg(
        F.count("*").alias("n"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@_q(
    "q_value_percentiles",
    """
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(quantile_cont(value, 0.25), 6) AS p25,
           ROUND(quantile_cont(value, 0.50), 6) AS p50,
           ROUND(quantile_cont(value, 0.75), 6) AS p75,
           ROUND(quantile_cont(value, 0.95), 6) AS p95
    FROM events
    WHERE value IS NOT NULL
    GROUP BY event_type
    """,
)
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group exact quantiles — the numeric-profiling aggregate
    behind outlier thresholds and quality-score cutoffs.  Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the same
    linear-interpolation definition (rank = p·(n-1)), so ROUND(x, 6)
    gates the computation exactly.

    Scale note: exact percentile materializes each group's value
    multiset; at 100 TB swap in ``approx_percentile`` (positional
    error bound, mergeable partial sketches, one pass) — same call
    shape, documented trade of exactness for a streaming-friendly
    sketch."""
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        *[
            F.round(F.percentile("value", F.lit(p)), 6).alias(
                f"p{int(p * 100)}"
            )
            for p in (0.25, 0.50, 0.75, 0.95)
        ],
    )


_ZORDER_BITS = 10
_ZORDER_SQL_EXPR = " | ".join(
    f"((user_id & {1 << i}) << {i}) | "
    f"((CAST(FLOOR(value) AS BIGINT) & {1 << i}) << {i + 1})"
    for i in range(_ZORDER_BITS)
)

@_q(
    "q_zorder_key",
    f"""
    SELECT event_id, CAST({_ZORDER_SQL_EXPR} AS BIGINT) AS z
    FROM events WHERE value IS NOT NULL
    """,
)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) interleave of (user_id, floor(value)) — the
    multi-dimensional clustering key behind ``write_zordered_export``'s
    file layout (2-D box queries prune files on either predicate via
    parquet min/max stats).  Pure shift/mask/or expression, map-side,
    identical bit arithmetic in both engines."""
    from conte_to_fresco_etl_spark.sources.sinks import zorder_key

    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    return ev.select(
        "event_id",
        zorder_key(
            F.col("user_id"), F.floor("value"), bits=_ZORDER_BITS
        ).alias("z"),
    )


@_q(
    "q_json_extract",
    """
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_k,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the ``props`` JSON string
    column with a typed ``from_json`` schema and aggregate the
    extracted field — the schema-on-read shape every event pipeline
    needs for property bags.  ``from_json`` yields NULL for malformed
    documents (count surfaced as n - n_k), so dirty rows degrade to
    nulls instead of failing the scan; the parse is a map-side codegen
    projection feeding one partial-agg shuffle."""
    ev = _events(spark, sf_dir)
    k = F.from_json(F.col("props"), "k long")["k"]
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count(k).alias("n_k"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@_q(
    "q5_local_volume",
    """
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,4))
                       - CAST(l.l_discount AS DECIMAL(18,4))))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
                    AND s.s_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join chain where customer and supplier
    must share a nation.  The dimension chain (region -> nation ->
    customer/supplier) broadcasts; only the lineitem-orders join
    shuffles on the order key — the plan a 100 TB star query needs.
    Decimal-summed revenue keeps the gate order-independent."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,4)")
        - F.col("l_discount").cast("decimal(18,4)")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"]),
        )
        .join(
            F.broadcast(n),
            (c["c_nationkey"] == n["n_nationkey"])
            & (s["s_nationkey"] == n["n_nationkey"]),
        )
        .join(
            F.broadcast(r),
            (n["n_regionkey"] == r["r_regionkey"])
            & (r["r_name"] == "ASIA"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# 6. Time-series operators the reference family exposes natively and
#    Spark lacks: as-of join, large-large range join, hypertable rollup.
#    Each is a composition of built-in ops (union+window / bin-join /
#    grouping sets) — no Python in any hot path.
# ---------------------------------------------------------------------------

_ASOF_SQL = """
    WITH u AS (
      SELECT user_id, ts, 1 AS is_left, event_id, value,
             NULL AS r_tie, NULL AS r_event_id, NULL AS r_value,
             NULL AS r_ts
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, 0 AS is_left, NULL, NULL,
             event_id, event_id, value, ts
      FROM events WHERE event_type = 'purchase'
    ),
    m AS (
      SELECT user_id, ts, is_left, event_id, value,
             LAST_VALUE(r_ts IGNORE NULLS) OVER w AS asof_ts,
             LAST_VALUE(r_event_id IGNORE NULLS) OVER w AS asof_event_id,
             LAST_VALUE(r_value IGNORE NULLS) OVER w AS asof_value,
      FROM u
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY ts NULLS FIRST, is_left, r_tie NULLS LAST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, ts, value,
           asof_ts, asof_event_id, asof_value,
           CAST(date_diff('microsecond', asof_ts, ts) AS BIGINT)
             AS asof_lag_us
    FROM m WHERE is_left = 1
"""

@_q("q_asof_join", _ASOF_SQL)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click gets the latest at-or-before purchase of
    the same user (ties on ts broken by the highest purchase event_id —
    the inclusive backward convention of DuckDB ASOF JOIN /
    pandas merge_asof).  Plan: tag + union + ONE hash shuffle on
    user_id + running last() — no pair blow-up at any |L|·|R|."""
    from conte_to_fresco_etl_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    return asof_join(
        clicks,
        purchases,
        on="user_id",
        ts_col="ts",
        right_tie="event_id",
        attach=["event_id", "value"],
    ).select(
        "event_id", "user_id", "ts", "value",
        "asof_ts", "asof_event_id", "asof_value", "asof_lag_us",
    )


_RANGE_PAIRS_SQL = """
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           CAST(date_diff('microsecond', a.ts, b.ts) AS BIGINT) AS dt_us,
           a.user_id AS user_id_a, b.user_id AS user_id_b
    FROM events a JOIN events b
      ON b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 SECOND
     AND (a.ts < b.ts OR a.event_id < b.event_id)
"""

@_q("q_range_pairs", _RANGE_PAIRS_SQL)
def q_range_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless range self-join (events within 1s of each other), binned:
    quantize to tolerance-width bins, probe side fans out into
    {bin, bin-1}, hash-join on the bin id, exact predicate after.  The
    built-in plan for this predicate is BroadcastNestedLoopJoin —
    O(n^2) compares; binning bounds candidates by per-bin density and
    shuffles hash-partitioned, so the join survives two large sides."""
    from conte_to_fresco_etl_spark.operators.rangejoin import (
        time_proximity_pairs,
    )

    return time_proximity_pairs(
        _events(spark, sf_dir),
        ts_col="ts",
        id_col="event_id",
        tolerance_seconds=1.0,
        carry=["user_id"],
    )


_ROLLUP_SQL = """
    WITH b AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
             date_trunc('hour', ts) AS bucket_hour,
             value
      FROM events
    )
    SELECT event_type, bucket_day, bucket_hour,
           CAST(GROUPING(event_type, bucket_day, bucket_hour) AS BIGINT)
             AS grouping_id,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM b
    GROUP BY ROLLUP (event_type, bucket_day, bucket_hour)
"""

@_q("q_time_rollup", _ROLLUP_SQL)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup (hour, day, key, grand
    total) in ONE pass via ROLLUP grouping sets: Catalyst's Expand +
    partial aggregation scans the input once and shuffles only partial
    states.  Decimal sums make every level exactly equal the sum of its
    children — the continuous-aggregate invariant."""
    from conte_to_fresco_etl_spark.operators.rollup import time_rollup

    return time_rollup(
        _events(spark, sf_dir),
        ts_col="ts",
        key_col="event_type",
        value_col="value",
    )


_TRAILING_SQL = """
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""

@_q("q_trailing_window", _TRAILING_SQL)
def q_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour per-user aggregate via a RANGE window frame on
    epoch microseconds — the rolling-metric shape (rate limiting,
    trailing load) that tumbling buckets can't express.  One shuffle on
    the user key; the range frame is a sliding pointer over the sorted
    partition, not a self-join.  Decimal sums keep the frame total
    exact under any evaluation order."""
    ev = _events(spark, sf_dir)
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("sum_1h"),
    )


_ABOVE_MEAN_SQL = """
    WITH s AS (
      SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot,
             COUNT(*) AS n
      FROM orders
    )
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders, s
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) * n > tot
"""

@_q("q_above_mean", _ABOVE_MEAN_SQL)
def q_above_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-aggregate subquery shape: keep orders priced above the
    global mean.  The mean never materializes as a float — the
    predicate is the cross-multiplied decimal form (price*n > total),
    exact in any engine and any aggregation order.  Plan: one partial
    agg to a 1-row stats side, broadcast cross join, map-side filter —
    the scan streams once and nothing wide shuffles."""
    orders = _t(spark, sf_dir, "orders")
    stats = orders.agg(
        F.sum(_dec2("o_totalprice")).alias("tot"), F.count("*").alias("n")
    )
    return (
        orders.crossJoin(F.broadcast(stats))
        .filter(_dec2("o_totalprice") * F.col("n") > F.col("tot"))
        .select(
            "o_orderkey", F.col("o_totalprice").cast("double").alias("price")
        )
    )


_SKEW_JOIN_SQL = """
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
"""

@_q("q_skew_salted_join", _SKEW_JOIN_SQL)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explicit-salting skew path under the hash gate: lineitem
    joins orders through `salted_join` (each left row lands in one of 8
    salt buckets, the right side replicates into all 8), so a hot order
    key spreads over 8 tasks — yet the result is provably the plain
    inner join, which is exactly what the oracle computes."""
    from conte_to_fresco_etl_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    return (
        salted_join(li, orders, on="k", salts=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(_dec2("l_quantity")).cast("double").alias("sum_qty"),
        )
    )


_PIVOT_AGG_SQL = (
    "SELECT user_id,\n"
    + ",\n".join(
        f"  CAST(SUM(CASE WHEN event_type = '{e}' THEN"
        f" CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS sum_{e},\n"
        f"  COUNT(CASE WHEN event_type = '{e}' THEN 1 END) AS n_{e}"
        for e in _EVENT_TYPES
    )
    + "\nFROM events GROUP BY user_id"
)

@_q("q_pivot_agg", _PIVOT_AGG_SQL)
def q_pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COLLAPSING pivot (one row per user, one column pair per
    event type) — the standard reshape R1 deliberately is not; both
    live in the catalog so the row-count contract of each is explicit.
    Values list pinned → Spark skips the distinct-scan planning pass
    and the output schema is static.  One partial-agg shuffle on the
    group key; the pivot itself is map-side conditional aggregation."""
    ev = _events(spark, sf_dir)
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(
            F.sum(_dec4("value")).cast("double").alias("sum"),
            F.count(F.when(F.col("event_type").isNotNull(), 1)).alias("n"),
        )
    )
    # pivot names columns "<event>_sum"; align to the oracle's
    # sum_<e>/n_<e>.  A user with NO rows in a bucket gets NULL from
    # pivot but 0 from the oracle's COUNT(CASE ...) — coalesce the
    # counts (sums stay NULL in both engines for an empty bucket).
    renamed = out.select(
        "user_id",
        *[
            c
            for e in _EVENT_TYPES
            for c in (
                F.col(f"{e}_sum").alias(f"sum_{e}"),
                F.coalesce(F.col(f"{e}_n"), F.lit(0)).alias(f"n_{e}"),
            )
        ],
    )
    return renamed


_QUARTILE_SQL = """
    SELECT event_id, user_id,
           CAST(NTILE(4) OVER (PARTITION BY user_id
                               ORDER BY value NULLS FIRST,
                                        event_id NULLS FIRST) AS BIGINT)
             AS quartile
    FROM events
"""

@_q("q_user_quartiles", _QUARTILE_SQL)
def q_user_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value quartile via NTILE — the bucketing shape behind
    per-entity score normalization.  The window orders by (value,
    event_id): a TOTAL order, so bucket boundaries are deterministic in
    any engine (NTILE over a partial order is not).  Null ordering is
    pinned NULLS FIRST on BOTH sides — Spark's ASC default, but
    DuckDB's default is NULLS LAST, so the gate would silently diverge
    the day the generator grows a null value.  One shuffle on the user
    key."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").asc_nulls_first(), F.col("event_id").asc_nulls_first()
    )
    return ev.select(
        "event_id",
        "user_id",
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


_DQ_SQL = """
    SELECT
      (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL)
        AS null_orderkeys,
      (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
        AS dangling_lineitems,
      (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders
                             GROUP BY 1 HAVING COUNT(*) > 1))
        AS dup_orderkeys,
      (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
        AS dangling_orders
"""

@_q("q_dq_report", _DQ_SQL)
def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row data-quality audit (dbt-test shape): null keys,
    duplicate primary keys, and referential-integrity violations across
    the star schema.  Each check is an aggregate or an anti join —
    dims broadcast, the fact side streams once per check; at 100 TB
    combine the fact-side checks into a single pass with conditional
    aggregation if the multi-scan cost matters (parquet scans here are
    cheap relative to the joins)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nulls = li.filter(F.col("l_orderkey").isNull()).agg(
        F.count("*").alias("null_orderkeys")
    )
    dangling_li = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "left_anti"
    ).agg(F.count("*").alias("dangling_lineitems"))
    dup = (
        orders.groupBy("o_orderkey")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > 1)
        .agg(F.count("*").alias("dup_orderkeys"))
    )
    dangling_o = orders.join(
        cust, orders.o_custkey == cust.c_custkey, "left_anti"
    ).agg(F.count("*").alias("dangling_orders"))
    return (
        nulls.crossJoin(dangling_li).crossJoin(dup).crossJoin(dangling_o)
    )


_CUBE_SQL = """
    WITH b AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
             value
      FROM events
    )
    SELECT event_type, bucket_day,
           CAST(GROUPING(event_type, bucket_day) AS BIGINT) AS grouping_id,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM b
    GROUP BY CUBE (event_type, bucket_day)
"""

@_q("q_cube_daily", _CUBE_SQL)
def q_cube_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day): all four grouping sets — including
    the per-day-across-types slice ROLLUP's hierarchy cannot produce —
    in the same single Expand + partial-agg pass.  GROUPING_ID
    disambiguates super-aggregate NULLs from data NULLs."""
    ev = _events(spark, sf_dir)
    return (
        ev.select(
            "event_type",
            F.date_trunc("day", F.col("ts")).alias("bucket_day"),
            _dec4("value").alias("__v"),
        )
        .cube("event_type", "bucket_day")
        .agg(
            F.grouping_id().cast("long").alias("grouping_id"),
            F.count("*").alias("n"),
            F.sum("__v").cast("double").alias("sum_value"),
        )
        .select("event_type", "bucket_day", "grouping_id", "n", "sum_value")
    )


_EXCEPT_SQL = """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_totalprice > 300000
"""

@_q("q_except_customers", _EXCEPT_SQL)
def q_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference with dedup) — customers who never placed
    a >300k order, as the set operator rather than the anti-join
    spelling (q_anti_join/q_semi_join use the same threshold); Catalyst
    plans both as a left-anti join, which the gated pair makes
    checkable."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    big = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.exceptAll(big).distinct()
