"""Bucketed-table contract: joins and aggregations on the bucket key
run WITHOUT an Exchange — the stored layout replaces the shuffle.

These are the plan assertions behind every "bucketed sort-merge join
in production" claim in SCALE.md: if a Spark upgrade or a session
conf ever silently re-introduces the shuffle, these tests fail.
"""

from __future__ import annotations

import pytest

from conte_to_fresco_etl_spark.sources.bucketed import (
    read_table,
    write_bucketed,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_user = events.groupBy("user_id").count()
    write_bucketed(events, "ev_bkt", "user_id", n_buckets=4)
    write_bucketed(per_user, "usr_bkt", "user_id", n_buckets=4)
    yield "ev_bkt", "usr_bkt"
    spark.sql("DROP TABLE IF EXISTS ev_bkt")
    spark.sql("DROP TABLE IF EXISTS usr_bkt")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    """Co-bucketed equi-join: zero Exchange anywhere in the plan (the
    join reads both sides' stored hashpartitioning), and the result
    matches the plain shuffled join row-for-row."""
    ev_t, usr_t = bucketed_tables
    ev, usr = read_table(spark, ev_t), read_table(spark, usr_t)
    # merge hint: the dim side is broadcast-small at test scale, which
    # would make the assertion vacuous — at 100 TB BOTH sides are big
    # and SMJ is the plan under test
    joined = ev.join(usr.hint("merge"), "user_id")
    plan = _plan(joined.select("user_id", "event_type", "count"))
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan

    plain_ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plain = plain_ev.join(
        plain_ev.groupBy("user_id").count(), "user_id"
    ).groupBy("event_type").count()
    got = joined.groupBy("event_type").count()
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    """Aggregation on the bucket key consumes the stored partitioning:
    no Exchange before the final aggregate."""
    ev_t, _ = bucketed_tables
    agg = read_table(spark, ev_t).groupBy("user_id").count()
    plan = _plan(agg)
    assert "Exchange" not in plan, plan


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Control: the same join off plain parquet files SHUFFLES — the
    exchange-free plans above come from the bucket layout, not from
    some session conf that would mask a regression."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    usr = ev.groupBy("user_id").count()
    import pyspark.sql.functions as F

    joined = ev.join(usr.hint("merge"), "user_id").groupBy(
        "event_type"
    ).agg(F.count("*").alias("n"))
    assert "Exchange" in _plan(joined)
