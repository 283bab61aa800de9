"""Plan-shape and semantics pins for the TPC-H-adapted decision-support
suite (plans/catalog_tpch.py).

Value correctness is carried by the per-query DuckDB oracles (the driver
gate + tests/oracle_parity.py); these tests pin the SCALE posture — the
physical plan each query promises in its docstring — and the semantic
edges an oracle diff would only catch by accident (outer-join survivors,
EXISTS-rewrite equivalence, deterministic LIMIT).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def qs():
    return entrymod.queries()


def test_suite_registered_with_oracles(qs):
    """All 19 adapted queries are declared, each with an exact oracle."""
    names = [n for n in qs if n[0] == "q" and n[1:3].rstrip("_").isdigit()]
    tpch = {
        "q2_min_cost_supplier", "q4_priority_exists", "q6_forecast_revenue",
        "q7_volume_shipping", "q8_market_share", "q9_product_profit",
        "q10_returned_items", "q11_important_parts", "q12_priority_class",
        "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
        "q16_supplier_variety", "q17_small_qty_revenue",
        "q18_large_volume_customers", "q19_disjunctive_revenue",
        "q20_promotion_suppliers", "q21_sole_returner",
        "q22_dormant_customers",
    }
    assert tpch <= set(names)
    oracles = entrymod.oracle_sql()
    for n in tpch:
        assert n in oracles and "SELECT" in oracles[n].upper()


def test_q6_predicates_reach_the_scan(spark, sf_dir, qs):
    """Q6 is the canonical pushdown probe: every predicate must appear
    in PushedFilters so parquet row groups prune on shipdate stats."""
    plan = _physical(qs["q6_forecast_revenue"](spark, sf_dir))
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "l_shipdate" in pushed
    assert "l_discount" in pushed
    assert "l_quantity" in pushed
    # scan reads only the 4 referenced columns (+1 colon for the label)
    scan = plan[plan.index("ReadSchema"):].split("\n")[0]
    assert scan.count(":") <= 5
    # single scalar aggregate: one partial + one final, no join
    assert "Join" not in plan


def test_q4_exists_is_a_semi_join_not_a_widening_join(spark, sf_dir, qs):
    plan = _physical(qs["q4_priority_exists"](spark, sf_dir))
    assert "LeftSemi" in plan


def test_q16_not_in_is_a_broadcast_anti_join(spark, sf_dir, qs):
    plan = _physical(qs["q16_supplier_variety"](spark, sf_dir))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_q22_not_exists_is_anti_join_and_avg_broadcasts(spark, sf_dir, qs):
    plan = _physical(qs["q22_dormant_customers"](spark, sf_dir))
    assert "LeftAnti" in plan
    # the scalar-average side is a 1-row broadcast, not a shuffle
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_q10_and_q18_rank_via_take_ordered(spark, sf_dir, qs):
    """LIMIT-after-ORDER BY must plan as TakeOrderedAndProject — a
    per-partition top-k then a k-row driver merge — never a full sort."""
    for name in ("q10_returned_items", "q18_large_volume_customers"):
        plan = _physical(qs[name](spark, sf_dir))
        assert "TakeOrderedAndProject" in plan, name


def test_q7_dimensions_broadcast_single_fact_shuffle(spark, sf_dir, qs):
    """Q7's only shuffle pair is lineitem⋈orders; customer, supplier
    and both nation copies must broadcast."""
    df = qs["q7_volume_shipping"](spark, sf_dir)
    plan = _physical(df)
    assert plan.count("BroadcastHashJoin") >= 4
    # hash shuffles: lineitem⋈orders (≤2 exchanges) + final agg; the
    # many BroadcastExchanges are dimension ships, not shuffles
    assert plan.count("Exchange hashpartitioning") <= 3


def test_q9_seven_way_join_keeps_fact_single_shuffle(spark, sf_dir, qs):
    plan = _physical(qs["q9_product_profit"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3


def test_q13_left_outer_keeps_orderless_customers(spark, sf_dir, qs):
    """The join-condition filter (not WHERE) must keep customers with
    zero qualifying orders as c_count = 0 rows."""
    out = {r["c_count"]: r["custdist"] for r in qs["q13_customer_distribution"](spark, sf_dir).collect()}
    total_customers = (
        spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    )
    assert sum(out.values()) == total_customers  # nobody dropped
    urgent_only = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
                F.col("o_orderpriority") != "1-URGENT"
            ),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .count()
    )
    assert out.get(0, 0) == urgent_only


def test_q21_aggregate_rewrite_matches_literal_exists(spark, sf_dir, qs):
    """The per-order-stats rewrite must equal the literal EXISTS /
    NOT EXISTS formulation computed the slow way."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    r = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    other = (
        li.select(F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2"))
    )
    exists = (
        r.join(
            other,
            (F.col("l_orderkey") == F.col("ok2")) & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
    )
    other_r = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3"))
    )
    literal = (
        exists.join(
            other_r,
            (F.col("l_orderkey") == F.col("ok3")) & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
        .select("l_orderkey", "l_suppkey")
    )
    stats = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count_distinct("l_suppkey").alias("nsupp"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("nretsupp"),
    )
    rewritten = (
        r.join(stats, F.col("ok") == F.col("l_orderkey"))
        .filter((F.col("nsupp") > 1) & (F.col("nretsupp") == 1))
        .select("l_orderkey", "l_suppkey")
    )
    assert sorted(map(tuple, literal.collect())) == sorted(
        map(tuple, rewritten.collect())
    )


def test_q15_ties_at_max_all_survive(spark):
    """Q15's decimal-exact MAX probe must keep every supplier tied at
    the maximum, like the oracle's equality join does."""
    from conte_to_fresco_etl_spark.plans.catalog import _dec2

    rev = spark.createDataFrame(
        [(1, "10.00"), (2, "10.00"), (3, "7.50")], "supplier_no INT, r STRING"
    ).select("supplier_no", _dec2("r").alias("total_revenue_dec"))
    mx = rev.agg(F.max("total_revenue_dec").alias("mx"))
    out = (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue_dec") == F.col("mx"))
        .select("supplier_no")
        .collect()
    )
    assert sorted(r[0] for r in out) == [1, 2]
