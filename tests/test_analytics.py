"""Semantics and plan-shape tests for the event-analytics + retrieval
family (gap fill / gap audit, funnel, retention, BM25)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from conte_to_fresco_etl_spark.operators.funnel import (
    funnel_conversion,
    retention_cohorts,
)
from conte_to_fresco_etl_spark.operators.gapfill import (
    detect_gaps,
    fill_time_gaps,
)
from conte_to_fresco_etl_spark.operators.text_analysis import bm25_topk


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture(scope="module")
def qs():
    return entrymod.queries()


# ---------------------------------------------------------------------------
# gap fill
# ---------------------------------------------------------------------------


def test_gapfill_locf_and_spine(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts(0, 10), 10.0),
            (1, _ts(0, 50), 20.0),  # same hour -> mean 15
            (1, _ts(3, 0), 7.0),    # hours 1,2 are gaps
            (2, _ts(5, 0), 1.0),    # single-point key: 1-row spine
        ],
        "user_id INT, ts TIMESTAMP, value DOUBLE",
    )
    out = {
        (r["user_id"], r["bucket_hour"].hour): (
            r["value_filled"],
            r["is_observed"],
        )
        for r in fill_time_gaps(ev).collect()
    }
    assert out[(1, 0)] == (15.0, True)
    assert out[(1, 1)] == (15.0, False)  # carried forward
    assert out[(1, 2)] == (15.0, False)
    assert out[(1, 3)] == (7.0, True)
    assert out[(2, 5)] == (1.0, True)
    assert len(out) == 5  # spine covers exactly [min, max] per key


def test_gapfill_first_bucket_never_null(spark, sf_dir, qs):
    nulls = (
        qs["q_gapfill"](spark, sf_dir)
        .filter(F.col("value_filled").isNull())
        .count()
    )
    assert nulls == 0


def test_detect_gaps_threshold_strict(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts(0)),
            (1, _ts(1)),   # exactly 3600s -> NOT a gap (strict >)
            (1, _ts(3)),   # 7200s -> gap
        ],
        "user_id INT, ts TIMESTAMP",
    ).withColumn("value", F.lit(0.0))
    rows = detect_gaps(ev, min_gap_seconds=3600).collect()
    assert len(rows) == 1
    assert rows[0]["gap_seconds"] == 7200
    assert rows[0]["gap_start"] == _ts(1) and rows[0]["gap_end"] == _ts(3)


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------


def test_funnel_enforces_step_order(spark):
    ev = spark.createDataFrame(
        [
            # u1 converts fully in order
            (1, "view", _ts(1)), (1, "click", _ts(2)), (1, "purchase", _ts(3)),
            # u2 clicked BEFORE viewing -> stops at step 1
            (2, "click", _ts(1)), (2, "view", _ts(2)),
            # u3 same-timestamp click counts (>= semantics)
            (3, "view", _ts(4)), (3, "click", _ts(4)),
            # u4 never viewed -> not even step 1
            (4, "purchase", _ts(1)),
        ],
        "user_id INT, event_type STRING, ts TIMESTAMP",
    )
    out = {
        r["step_name"]: (r["n_users"], r["conversion"])
        for r in funnel_conversion(
            ev, ["view", "click", "purchase"]
        ).collect()
    }
    assert out["view"] == (3, 1.0)
    assert out["click"] == (2, round(2 / 3, 6))
    assert out["purchase"] == (1, round(1 / 3, 6))


def test_funnel_conversion_monotone_on_testdata(spark, sf_dir, qs):
    rows = sorted(
        qs["q_funnel"](spark, sf_dir).collect(), key=lambda r: r["step"]
    )
    ns = [r["n_users"] for r in rows]
    assert ns == sorted(ns, reverse=True)  # survivors shrink monotonically
    assert rows[0]["conversion"] == 1.0


# ---------------------------------------------------------------------------
# retention
# ---------------------------------------------------------------------------


def test_retention_cohort_semantics(spark):
    d0, d1, d2 = (dt.datetime(2024, 1, i + 1, 12) for i in range(3))
    ev = spark.createDataFrame(
        [
            (1, d0), (1, d2),          # cohort day0, back at offset 2
            (2, d0), (2, d1), (2, d2), # cohort day0, offsets 0,1,2
            (3, d1),                   # cohort day1, offset 0 only
        ],
        "user_id INT, ts TIMESTAMP",
    ).withColumn("value", F.lit(0.0))
    out = {
        (r["cohort_day"].day, r["day_offset"]): (r["n_active"], r["retention"])
        for r in retention_cohorts(ev, max_offset=7).collect()
    }
    assert out[(1, 0)] == (2, 1.0)
    assert out[(1, 1)] == (1, 0.5)
    assert out[(1, 2)] == (2, 1.0)
    assert out[(2, 0)] == (1, 1.0)
    assert (2, 1) not in out  # no activity -> no row (sparse form)


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def test_bm25_prefers_term_rich_short_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark"),
            (2, "spark filler filler filler filler filler filler filler"),
            (3, "filler filler"),
            (4, ""),
        ],
        "doc_id INT, text STRING",
    )
    rows = bm25_topk(docs, ["spark"], k=10).collect()
    ids = [r["doc_id"] for r in rows]
    assert ids[0] == 1          # highest tf, shortest doc
    assert set(ids) == {1, 2}   # docs without the term never appear
    assert rows[0]["bm25"] > rows[1]["bm25"] > 0


def test_bm25_plan_is_distributed_topk(spark, sf_dir, qs):
    df = qs["q_bm25_topk"](spark, sf_dir)
    plan = _physical(df)
    assert "TakeOrderedAndProject" in plan   # never a full sort
    assert "CartesianProduct" not in plan
    # the 1-row corpus stats and the |terms|-row df table broadcast
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_analytics_queries_have_oracles():
    oracles = entrymod.oracle_sql()
    for n in ("q_gapfill", "q_event_gaps", "q_funnel", "q_retention",
              "q_bm25_topk"):
        assert n in oracles


# ---------------------------------------------------------------------------
# SCD2
# ---------------------------------------------------------------------------


def test_scd2_collapses_runs_and_tiles(spark):
    from conte_to_fresco_etl_spark.operators.scd import scd2_intervals

    ev = spark.createDataFrame(
        [
            (1, _ts(0), 1, "a"),
            (1, _ts(1), 2, "a"),   # same state -> extends interval
            (1, _ts(2), 3, "b"),   # change
            (1, _ts(3), 4, "b"),
            (1, _ts(4), 5, "a"),   # back to a -> NEW interval (type 2)
            (2, _ts(0), 6, None),  # NULL state opens an interval too
            (2, _ts(1), 7, "x"),
        ],
        "user_id INT, ts TIMESTAMP, event_id INT, event_type STRING",
    )
    rows = sorted(
        scd2_intervals(ev).collect(),
        key=lambda r: (r["user_id"], r["valid_from"]),
    )
    u1 = [r for r in rows if r["user_id"] == 1]
    assert [(r["event_type"], r["valid_from"].hour) for r in u1] == [
        ("a", 0), ("b", 2), ("a", 4)
    ]
    # half-open tiling: each valid_to equals the next valid_from
    for a, b in zip(u1, u1[1:]):
        assert a["valid_to"] == b["valid_from"]
    assert u1[-1]["valid_to"] is None and u1[-1]["is_current"]
    u2 = [r for r in rows if r["user_id"] == 2]
    assert [r["event_type"] for r in u2] == [None, "x"]


def test_scd2_point_in_time_matches_last_event(spark, sf_dir, qs):
    """The interval containing a probe instant must carry the state of
    the last event at-or-before it — the as-of contract."""
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("user_id") < 16)
        .select("user_id", "ts", "event_id", "event_type")
    )
    probe = dt.datetime(2024, 1, 15)
    expected = {
        r["user_id"]: r["event_type"]
        for r in ev.filter(F.col("ts") <= F.lit(probe))
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy(F.col("ts").desc(), F.col("event_id").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .collect()
    }
    from conte_to_fresco_etl_spark.operators.scd import scd2_intervals

    got = {
        r["user_id"]: r["event_type"]
        for r in scd2_intervals(ev)
        .filter(
            (F.col("valid_from") <= F.lit(probe))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(probe)))
        )
        .collect()
    }
    assert got == expected


def test_scd2_shares_one_sort_exchange(spark, sf_dir, qs):
    plan = _physical(qs["q_scd2_intervals"](spark, sf_dir))
    # both window passes key on user_id: one hash exchange only
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# transitions + PageRank
# ---------------------------------------------------------------------------


def test_event_transitions_counts_and_probs(spark):
    from conte_to_fresco_etl_spark.operators.graph import event_transitions

    ev = spark.createDataFrame(
        [
            (1, _ts(0), 1, "a"), (1, _ts(1), 2, "b"), (1, _ts(2), 3, "a"),
            (2, _ts(0), 4, "a"), (2, _ts(1), 5, "b"),
            (3, _ts(0), 6, "c"),  # single event: no transition
        ],
        "user_id INT, ts TIMESTAMP, event_id INT, event_type STRING",
    )
    out = {
        (r["src"], r["dst"]): (r["n_transitions"], r["prob"])
        for r in event_transitions(ev).collect()
    }
    assert out[("a", "b")] == (2, 1.0)       # a only ever goes to b
    assert out[("b", "a")] == (1, 1.0)
    assert ("c", "a") not in out and len(out) == 2


def test_pagerank_dangling_and_conservation(spark):
    from conte_to_fresco_etl_spark.operators.graph import pagerank

    # a -> b -> c, c dangles; unweighted
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src STRING, dst STRING"
    )
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iterations=5, weight_col=None).collect()
    }
    assert set(ranks) == {"a", "b", "c"}
    # total mass conserved up to the ROUND pins
    assert abs(sum(ranks.values()) - 1.0) < 1e-5
    # the chain end accumulates the most rank
    assert ranks["c"] > ranks["b"] > ranks["a"]


def test_pagerank_hub_wins_star_graph(spark):
    from conte_to_fresco_etl_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(f"leaf{i}", "hub") for i in range(4)]
        + [("hub", f"leaf{i}") for i in range(4)],
        "src STRING, dst STRING",
    )
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iterations=4, weight_col=None).collect()
    }
    assert all(ranks["hub"] > ranks[f"leaf{i}"] for i in range(4))


def test_pagerank_plan_stays_in_plan(spark, sf_dir, qs):
    """No collects: N, dangling mass, and the iterates are all inside
    one composed plan; ranks shuffle on node keys only."""
    df = qs["q_pagerank"](spark, sf_dir)
    plan = _physical(df)
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert len(rows) == 5  # five event types
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-5


def test_windowed_funnel_bounds_step_lag(spark):
    ev = spark.createDataFrame(
        [
            (1, "view", _ts(0)), (1, "click", _ts(0, 30)),   # within 1h
            (2, "view", _ts(0)), (2, "click", _ts(2)),       # 2h late
        ],
        "user_id INT, event_type STRING, ts TIMESTAMP",
    )
    out = {
        r["step_name"]: r["n_users"]
        for r in funnel_conversion(
            ev, ["view", "click"], max_lag_seconds=3600
        ).collect()
    }
    assert out == {"view": 2, "click": 1}


def test_top_sequences_lag_chain(spark):
    from conte_to_fresco_etl_spark.operators.graph import (
        top_event_sequences,
    )

    ev = spark.createDataFrame(
        [
            (1, _ts(0), 1, "a"), (1, _ts(1), 2, "b"), (1, _ts(2), 3, "c"),
            (1, _ts(3), 4, "a"), (1, _ts(4), 5, "b"), (1, _ts(5), 6, "c"),
            (2, _ts(0), 7, "a"), (2, _ts(1), 8, "b"),  # too short for n=3
        ],
        "user_id INT, ts TIMESTAMP, event_id INT, event_type STRING",
    )
    rows = top_event_sequences(ev, n=3, k=5).collect()
    out = {r["seq"]: r["n_occurrences"] for r in rows}
    assert out == {"a>b>c": 2, "b>c>a": 1, "c>a>b": 1}

    # a NULL event type keeps its place in the sequence (adjacency is
    # unchanged) but contributes to no gram
    ev_null = spark.createDataFrame(
        [
            (1, _ts(0), 1, "a"), (1, _ts(1), 2, None),
            (1, _ts(2), 3, "b"), (1, _ts(3), 4, "c"), (1, _ts(4), 5, "d"),
        ],
        "user_id INT, ts TIMESTAMP, event_id INT, event_type STRING",
    )
    out_null = {
        r["seq"]: r["n_occurrences"]
        for r in top_event_sequences(ev_null, n=3, k=5).collect()
    }
    assert out_null == {"b>c>d": 1}
    # deterministic ranking: count desc, then seq asc
    assert [r["seq"] for r in rows][0] == "a>b>c"


def test_top_sequences_single_stream_shuffle(spark, sf_dir, qs):
    plan = _physical(qs["q_top_sequences"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # one key sort for the lag chain + one gram-count exchange
    assert plan.count("Exchange hashpartitioning") <= 2


def test_time_weighted_avg_step_function(spark):
    from conte_to_fresco_etl_spark.operators.gapfill import (
        time_weighted_avg,
    )

    # value 10 holds for 1h, then 20 for 3h: twa = (10*1 + 20*3)/4 = 17.5
    ev = spark.createDataFrame(
        [
            (1, _ts(0), 1, 10.0),
            (1, _ts(1), 2, 20.0),
            (1, _ts(4), 3, 99.0),   # last value carries no weight
            (2, _ts(0), 4, 5.0),    # single observation: NULL twa
        ],
        "user_id INT, ts TIMESTAMP, event_id INT, value DOUBLE",
    )
    out = {r["user_id"]: r for r in time_weighted_avg(ev).collect()}
    assert out[1]["twa"] == 17.5
    assert out[1]["span_seconds"] == 4 * 3600.0
    assert out[1]["first_ts"] == _ts(0) and out[1]["last_ts"] == _ts(4)
    assert out[2]["twa"] is None


def test_keyed_interval_overlap_join(spark):
    from conte_to_fresco_etl_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    a = spark.createDataFrame(
        [(1, "h1", _ts(0), _ts(1)), (2, "h2", _ts(0), _ts(1))],
        "a_id INT, a_host STRING, a_start TIMESTAMP, a_end TIMESTAMP",
    )
    b = spark.createDataFrame(
        [(10, "h1", _ts(0, 30), _ts(2))],
        "b_id INT, b_host STRING, b_start TIMESTAMP, b_end TIMESTAMP",
    )
    pairs = [
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            a, b, "a_start", "a_end", "b_start", "b_end",
            bin_seconds=3600, on=[("a_host", "b_host")],
        ).collect()
    ]
    assert pairs == [(1, 10)]  # h2's time-overlap is filtered by the key


def test_hopping_window_expand_one_pass(spark, sf_dir, qs):
    """The sliding-window aggregate must plan as ONE Expand (each row
    fans to its length/hop windows) + partial aggregate — not a union
    of shifted aggregations."""
    plan = _physical(qs["q_hopping_window"](spark, sf_dir))
    assert plan.count("Expand") == 1 or "expand" in plan.lower()
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# HLL distinct rollup, DP counts, LSH calibration (round 5)
# ---------------------------------------------------------------------------


def test_distinct_rollup_merge_consistent_and_exact(spark):
    from conte_to_fresco_etl_spark.operators.rollup import distinct_rollup

    # two ISO weeks; user 1 spans both, user 2 repeats within one day
    rows = [
        (1, dt.datetime(2024, 1, 1, 5)),    # Mon wk1
        (2, dt.datetime(2024, 1, 1, 6)),
        (2, dt.datetime(2024, 1, 1, 7)),
        (3, dt.datetime(2024, 1, 3, 5)),    # Wed wk1
        (1, dt.datetime(2024, 1, 8, 5)),    # Mon wk2
        (4, dt.datetime(2024, 1, 9, 5)),    # Tue wk2
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    got = {
        r["bucket"].isoformat(): r
        for r in distinct_rollup(df).collect()
    }
    assert set(got) == {"2024-01-01", "2024-01-08"}
    wk1, wk2 = got["2024-01-01"], got["2024-01-08"]
    assert wk1["n_fine"] == 2 and wk1["exact_ids"] == 3
    assert wk2["n_fine"] == 2 and wk2["exact_ids"] == 2
    for r in got.values():
        assert r["merge_consistent"] is True
        assert r["est_within_tol"] is True


def test_dp_noisy_counts_matches_python_twin(spark):
    import hashlib
    import math

    from conte_to_fresco_etl_spark.operators.pii import dp_noisy_counts

    rows = [("a",)] * 10 + [("b",)] * 3 + [("c",)] * 7
    df = spark.createDataFrame(rows, "g string")
    got = {
        r["g"]: r["noisy_n"]
        for r in dp_noisy_counts(df, "g", epsilon=0.5, seed="s1").collect()
    }

    def twin(group, n, eps=0.5, seed="s1"):
        h = int(hashlib.md5(f"{seed}:{group}".encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / float(16**15)
        b = 1.0 / eps
        if u >= 0.5:
            noise = -math.log(1.0 - 2.0 * (u - 0.5)) * b
        else:
            noise = math.log(1.0 - 2.0 * (0.5 - u)) * b
        return round(n + noise, 6)

    for g, n in [("a", 10), ("b", 3), ("c", 7)]:
        assert got[g] == pytest.approx(twin(g, n), abs=1e-9)
        assert got[g] != float(n)  # noise actually applied


def test_lsh_candidate_curve_known_points(spark):
    from conte_to_fresco_etl_spark.operators.dedup import lsh_candidate_curve

    out = {
        (r["bands"], r["rows_per_band"], r["s"]): r
        for r in lsh_candidate_curve(spark).collect()
    }
    assert len(out) == 3 * 19
    r = out[(32, 4, 0.5)]
    assert r["p_candidate"] == pytest.approx(
        round(1.0 - (1.0 - 0.5**4) ** 32, 6)
    )
    assert r["s50"] == pytest.approx(round((1 / 32) ** 0.25, 6))
    # monotone in s for a fixed layout
    ps = [out[(16, 8, round(0.05 * k, 6))]["p_candidate"] for k in range(1, 20)]
    assert ps == sorted(ps)


def test_session_pattern_match_counts_conversions(spark):
    from conte_to_fresco_etl_spark.operators.sessions import (
        session_pattern_match,
    )

    rows = [
        # session 0: view, click, purchase, view, purchase -> 2 matches
        (1, _ts(0, 0), 1, "view"),
        (1, _ts(0, 1), 2, "click"),
        (1, _ts(0, 2), 3, "purchase"),
        (1, _ts(0, 3), 4, "view"),
        (1, _ts(0, 4), 5, "purchase"),
        # >30 min gap -> session 1: view with no purchase -> 0 matches
        (1, _ts(1, 0), 6, "view"),
        # user 2, one session: purchase before any view -> 0 matches
        (2, _ts(0, 0), 7, "purchase"),
        (2, _ts(0, 1), 8, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_id int, event_type string"
    )
    got = {
        (r["user_id"], r["session_id"]): r
        for r in session_pattern_match(ev).collect()
    }
    assert got[(1, 0)]["seq"] == "vcpvp" and got[(1, 0)]["n_matches"] == 2
    assert got[(1, 1)]["seq"] == "v" and got[(1, 1)]["n_matches"] == 0
    assert got[(2, 0)]["seq"] == "pv" and got[(2, 0)]["n_matches"] == 0


def test_session_pattern_match_matches_python_twin(spark):
    """Randomized-ish sequences: sessionize + fold + count in plain
    Python, compare every session string and match count."""
    import re as _re

    types = ["view", "click", "purchase", "signup", "error"]
    sym = {"view": "v", "click": "c", "purchase": "p",
           "signup": "s", "error": "e"}
    rows = []
    eid = 0
    for u in range(5):
        t = dt.datetime(2024, 1, 1)
        for i in range(40):
            # deterministic pseudo-random: type and gap from (u, i)
            ty = types[(u * 7 + i * 13) % 5]
            gap_min = 61 if (u + i) % 11 == 0 else (u * 3 + i) % 9
            t = t + dt.timedelta(minutes=gap_min)
            rows.append((u, t, eid, ty))
            eid += 1
    ev = spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_id int, event_type string"
    )
    from conte_to_fresco_etl_spark.operators.sessions import (
        session_pattern_match,
    )

    got = {
        (r["user_id"], r["session_id"]): (r["seq"], r["n_matches"])
        for r in session_pattern_match(ev).collect()
    }

    # twin
    expect = {}
    by_user: dict[int, list] = {}
    for u, t, e, ty in rows:
        by_user.setdefault(u, []).append((t, e, ty))
    for u, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        seqs: dict[int, str] = {}
        for t, e, ty in evs:
            if prev is not None and (t - prev).total_seconds() > 30 * 60:
                sid += 1
            seqs[sid] = seqs.get(sid, "") + sym[ty]
            prev = t
        for sid_, s in seqs.items():
            expect[(u, sid_)] = (s, len(_re.findall(r"v[^p]*p", s)))
    assert got == expect


def test_dp_noisy_counts_epsilon_scaling(spark):
    """Same seed => same uniform draw, so the deviation from the true
    count scales exactly with 1/epsilon (Laplace b = 1/eps)."""
    from conte_to_fresco_etl_spark.operators.pii import dp_noisy_counts

    df = spark.createDataFrame([("a",)] * 10 + [("b",)] * 20, "g string")

    def dev(eps):
        out = {
            r["g"]: r["noisy_n"]
            for r in dp_noisy_counts(df, "g", epsilon=eps, seed="sc").collect()
        }
        return {"a": out["a"] - 10, "b": out["b"] - 20}

    d1, d2 = dev(1.0), dev(2.0)
    for g in ("a", "b"):
        assert d1[g] != 0.0
        assert d1[g] == pytest.approx(2.0 * d2[g], abs=1e-5)


def test_kmv_overlap_exact_regime_identical_and_disjoint(spark):
    """Below k distinct values KMV is exact: identical groups estimate
    Jaccard 1.0 with intersection == union; disjoint groups estimate
    intersection 0; a half-overlapping pair lands exactly on the true
    counts (all three pairs in the exact n<k regime)."""
    from conte_to_fresco_etl_spark.operators.rollup import kmv_overlap

    text_x = "abcdefghij"        # 6 distinct 5-shingles
    text_y = "0123456789"        # 6 distinct, disjoint from x
    rows = [
        ("ga", text_x),
        ("gb", text_x),          # identical to ga
        ("gc", text_y),          # disjoint from ga/gb
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {
        (r["source_a"], r["source_b"]): r
        for r in kmv_overlap(df, "source", "text", k=64).collect()
    }
    ab = out[("ga", "gb")]
    assert ab["est_a"] == ab["est_b"] == 6.0
    assert ab["est_union"] == 6.0
    assert ab["est_intersection"] == 6.0
    assert ab["jaccard_est"] == 1.0
    ac = out[("ga", "gc")]
    assert ac["est_union"] == 12.0
    assert ac["est_intersection"] == 0.0
    assert ac["jaccard_est"] == 0.0


def test_kmv_overlap_sketch_regime_estimates_within_rse(spark):
    """Above k distinct values the (k-1)/u_(k) estimator applies: on a
    ~600-distinct-shingle group with k=64 the estimate must land within
    4 standard errors (4/sqrt(k-2) ~ 50%) of truth — loose enough to be
    deterministic-proof, tight enough to catch a wrong estimator."""
    from conte_to_fresco_etl_spark.operators.rollup import kmv_overlap

    import random

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    big = "".join(rng.choice(alpha) for _ in range(600))
    df = spark.createDataFrame(
        [("gx", big), ("gy", big)], "source string, text string"
    )
    exact = len({big[i : i + 5] for i in range(len(big) - 4)})
    assert exact > 64
    r = kmv_overlap(df, "source", "text", k=64).collect()[0]
    rse4 = 4.0 / (62.0 ** 0.5)
    assert abs(r["est_a"] - exact) / exact < rse4
    assert r["jaccard_est"] == 1.0  # identical sketches merge to themselves


def test_vocab_growth_hand_computed(spark):
    """Two buckets with a known growth curve: cumulative counts are
    exact; beta/K match the closed-form two-point log-log fit."""
    import math

    from conte_to_fresco_etl_spark.operators.text_analysis import vocab_growth

    rows = [
        (0, "a b c d"),        # bucket 0: vocab {a,b,c,d}
        (1, "a b a b"),
        (2, "e f g h i j"),    # bucket 1: adds {e,f,g,h,i,j}
        (3, "a e"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["bucket"]: r for r in vocab_growth(df, bucket_size=2).collect()}
    assert out[0]["tokens_cum"] == 8 and out[0]["vocab_cum"] == 4
    assert out[1]["tokens_cum"] == 16 and out[1]["vocab_cum"] == 10
    x1, y1 = math.log(8.0), math.log(4.0)
    x2, y2 = math.log(16.0), math.log(10.0)
    beta = (y2 - y1) / (x2 - x1)
    k = math.exp(((y1 + y2) - beta * (x1 + x2)) / 2.0)
    assert out[0]["heaps_beta"] == pytest.approx(beta, abs=2e-6)
    assert out[0]["heaps_k"] == pytest.approx(k, abs=2e-6)


def test_rrf_fuse_hand_computed_and_topk(spark):
    """Fused score equals 1/(60+r1)+1/(60+r2) on hand-built rankings;
    ties break by id; only topk rows survive per group."""
    from conte_to_fresco_etl_spark.operators.text_analysis import rrf_fuse

    rows = [
        ("g", 1, 10.0, 1.0),   # r1=1, r2=3
        ("g", 2, 5.0, 2.0),    # r1=2, r2=2
        ("g", 3, 1.0, 3.0),    # r1=3, r2=1
        ("g", 4, 1.0, 0.5),    # r1=4 (tie on score -> id), r2=4
    ]
    df = spark.createDataFrame(rows, "g string, i long, s1 double, s2 double")
    out = rrf_fuse(df, "g", "i", ["s1", "s2"], k0=60, topk=3).collect()
    assert len(out) == 3  # topk cut
    by_id = {r["i"]: r for r in out}
    assert by_id[1]["rank_1"] == 1 and by_id[1]["rank_2"] == 3
    assert by_id[3]["rank_1"] == 3 and by_id[3]["rank_2"] == 1
    exp = round(1.0 / 61 + 1.0 / 63, 6)
    assert by_id[1]["rrf_score"] == pytest.approx(exp, abs=1e-9)
    assert by_id[3]["rrf_score"] == pytest.approx(exp, abs=1e-9)
    # symmetric fused scores tie -> lower id first; 4 is cut
    assert 4 not in by_id
