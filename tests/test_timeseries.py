"""Unit tests: as-of join, binned range join, hypertable rollup."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from conte_to_fresco_etl_spark.operators.asof import asof_join
from conte_to_fresco_etl_spark.operators.rangejoin import (
    explode_interval_bins,
    time_proximity_pairs,
)
from conte_to_fresco_etl_spark.operators.rollup import time_rollup


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 10:00:05"), 100.0),
            (2, "A", _ts("2024-01-01 10:00:10"), 101.0),
            (3, "B", _ts("2024-01-01 10:00:07"), 50.0),
            (4, "A", _ts("2024-01-01 09:59:59"), 99.0),  # before any quote
        ],
        "trade_id long, sym string, ts timestamp, px double",
    )
    quotes = spark.createDataFrame(
        [
            (10, "A", _ts("2024-01-01 10:00:00"), 99.5),
            (11, "A", _ts("2024-01-01 10:00:05"), 100.5),  # tie w/ trade 1
            (12, "A", _ts("2024-01-01 10:00:05"), 100.6),  # same ts, higher id
            (13, "B", _ts("2024-01-01 10:00:01"), 49.5),
        ],
        "quote_id long, sym string, ts timestamp, bid double",
    )
    return quotes, trades


def test_asof_backward_inclusive_with_tie_break(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, on="sym", ts_col="ts",
        right_tie="quote_id", attach=["quote_id", "bid"],
    )
    rows = {r["trade_id"]: r for r in out.collect()}
    assert len(rows) == 4
    # equal-ts quote matches (inclusive); highest quote_id wins the tie
    assert rows[1]["asof_quote_id"] == 12 and rows[1]["asof_bid"] == 100.6
    assert rows[1]["asof_lag_us"] == 0
    # later trade still sees the latest quote at-or-before
    assert rows[2]["asof_quote_id"] == 12
    assert rows[2]["asof_lag_us"] == 5_000_000
    # per-key isolation
    assert rows[3]["asof_quote_id"] == 13
    # trade before any quote: unmatched, nulls
    assert rows[4]["asof_quote_id"] is None
    assert rows[4]["asof_ts"] is None and rows[4]["asof_lag_us"] is None


def test_asof_forward_direction(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, on="sym", ts_col="ts",
        right_tie="quote_id", attach=["quote_id"], direction="forward",
    )
    rows = {r["trade_id"]: r for r in out.collect()}
    # trade 4 (09:59:59) now matches the next quote at 10:00:00
    assert rows[4]["asof_quote_id"] == 10
    assert rows[4]["asof_lag_us"] == 1_000_000
    # trade 2 (10:00:10) has no quote at-or-after
    assert rows[2]["asof_quote_id"] is None


def test_asof_tolerance_nulls_distant_matches(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(
        trades, quotes, on="sym", ts_col="ts",
        right_tie="quote_id", attach=["quote_id"],
        tolerance_seconds=2.0,
    )
    rows = {r["trade_id"]: r for r in out.collect()}
    assert rows[1]["asof_quote_id"] == 12      # lag 0 <= 2s
    assert rows[2]["asof_quote_id"] is None    # lag 5s > 2s → nulled
    assert rows[2]["asof_lag_us"] is None
    assert len(rows) == 4                      # left rows never dropped


def test_asof_single_shuffle_plan(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, on="sym", right_tie="quote_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoop" not in plan


def test_time_proximity_pairs_exact_and_once(spark):
    base = _ts("2024-01-01 00:00:00")
    rows = [
        (1, base, "u"),
        (2, base + dt.timedelta(microseconds=999_999), "u"),   # in tol of 1
        (3, base + dt.timedelta(seconds=1), "v"),              # == tol of 1
        (4, base + dt.timedelta(seconds=2, microseconds=1), "v"),  # 1.000001s after 3
        (5, base, "w"),                                        # exact tie with 1
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id string")
    out = time_proximity_pairs(df, tolerance_seconds=1.0, carry=["user_id"])
    got = {(r["id_a"], r["id_b"]): r["dt_us"] for r in out.collect()}
    assert got[(1, 2)] == 999_999
    assert got[(1, 3)] == 1_000_000
    assert got[(1, 5)] == 0 and (5, 1) not in got
    assert got[(2, 3)] == 1
    # 5 (t=0) is the earlier row of its pairs, so it leads them
    assert got[(5, 2)] == 999_999
    assert got[(5, 3)] == 1_000_000
    # 4 is 1.000001s after 3 — strictly outside the inclusive tolerance
    assert (3, 4) not in got
    assert len(got) == 6


def test_explode_interval_bins_covers_and_bounds(spark):
    iv = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:30"), _ts("2024-01-01 00:02:10"))],
        "iv_id long, s timestamp, e timestamp",
    )
    out = explode_interval_bins(iv, "s", "e", bin_seconds=60.0)
    bins = sorted(r["__bin"] for r in out.collect())
    # covers minutes 0, 1, 2 of the hour — exactly the bins a point
    # inside [s, e] can fall into
    assert len(bins) == 3
    assert bins[1] - bins[0] == 60_000_000 and bins[2] - bins[1] == 60_000_000


def test_time_rollup_levels_sum_exactly(spark):
    rows = [
        ("a", _ts("2024-01-01 10:15:00"), 1.5),
        ("a", _ts("2024-01-01 10:45:00"), 2.25),
        ("a", _ts("2024-01-01 11:05:00"), 4.0),
        ("b", _ts("2024-01-02 00:00:00"), 8.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = time_rollup(df).collect()
    by_key = {
        (r["event_type"], r["bucket_day"], r["bucket_hour"]): (r["n"], r["sum_value"])
        for r in out
    }
    d1 = dt.datetime(2024, 1, 1)
    # hour level
    assert by_key[("a", d1, d1.replace(hour=10))] == (2, 3.75)
    assert by_key[("a", d1, d1.replace(hour=11))] == (1, 4.0)
    # day level = sum of its hours
    assert by_key[("a", d1, None)] == (3, 7.75)
    # key level and grand total
    assert by_key[("a", None, None)] == (3, 7.75)
    assert by_key[(None, None, None)] == (4, 15.75)
    # 3 hour rows + 2 day rows + 2 key rows + 1 total
    assert len(out) == 8


def test_asof_matches_pandas_merge_asof(spark):
    """Property check against an independent reference implementation:
    pandas.merge_asof (backward, inclusive) on randomized frames.  With
    the right side pre-sorted by (ts, tie), merge_asof's last-wins tie
    rule equals asof_join's highest-tie rule."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n_l, n_r = 300, 200
    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {
            "lid": np.arange(n_l),
            "k": rng.integers(0, 5, n_l),
            "ts": base + pd.to_timedelta(rng.integers(0, 86_400, n_l), unit="s"),
        }
    )
    right = pd.DataFrame(
        {
            "rid": np.arange(n_r),
            "k": rng.integers(0, 5, n_r),
            "ts": base + pd.to_timedelta(rng.integers(0, 86_400, n_r), unit="s"),
            "px": rng.random(n_r).round(6),
        }
    )
    expected = pd.merge_asof(
        left.sort_values(["ts", "lid"]),
        right.sort_values(["ts", "rid"]).rename(columns={"rid": "asof_rid"}),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )

    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            ts_col="ts",
            right_tie="rid",
            attach=["rid", "px"],
        )
        .select("lid", "asof_rid")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    exp = (
        expected[["lid", "asof_rid"]]
        .sort_values("lid")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype("float64"), exp.astype("float64")
    )


def test_catalog_survives_ntz_typed_session(spark, sf_dir):
    """Driver-session hardening (round-2 regression class): the driver
    runs queries in ITS OWN session, where inferTimestampNTZ /
    timestampType may make every timestamp arrive as TIMESTAMP_NTZ.
    normalize_ntz at the load sites must keep every time-dependent
    query planning cleanly under an NTZ-preferring session."""
    import __spark_entry__ as entrymod

    s2 = spark.newSession()
    s2.conf.set("spark.sql.timestampType", "TIMESTAMP_NTZ")
    qs = entrymod.queries()
    for name in [
        "q3_top_orders", "q_window_rate", "q_sessionize", "q_asof_join",
        "q_trailing_window", "q_time_rollup", "conte_set3",
    ]:
        assert qs[name](s2, sf_dir).count() >= 0, name


def test_time_proximity_pairs_pre_epoch_timestamps(spark):
    """Floor-division binning must stay aligned for negative epochs
    (Java % follows the dividend's sign and would shift pre-1970 bins).
    """
    base = _ts("1960-06-01 00:00:00")
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base + dt.timedelta(microseconds=500_000)),
            (3, base + dt.timedelta(seconds=5)),
        ],
        "event_id long, ts timestamp",
    )
    out = time_proximity_pairs(df, tolerance_seconds=1.0)
    got = {(r["id_a"], r["id_b"]): r["dt_us"] for r in out.collect()}
    assert got == {(1, 2): 500_000}


def test_asof_composite_key(spark):
    left = spark.createDataFrame(
        [(1, "A", "X", _ts("2024-01-01 10:00:05"))],
        "lid long, sym string, venue string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, "A", "X", _ts("2024-01-01 10:00:00"), 1.0),
            (11, "A", "Y", _ts("2024-01-01 10:00:04"), 2.0),  # wrong venue
        ],
        "rid long, sym string, venue string, ts timestamp, px double",
    )
    out = asof_join(
        left, right, on=["sym", "venue"], right_tie="rid", attach=["rid", "px"]
    ).collect()
    assert len(out) == 1 and out[0]["asof_rid"] == 10


def test_point_in_interval_join_equals_nonequi_join(spark):
    """The binned plan must produce exactly the rows of the plain
    non-equi join — each matching pair once, across bin boundaries,
    multi-bin intervals, and points outside every interval."""
    import random

    from conte_to_fresco_etl_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    rng = random.Random(5)
    base = _ts("2024-01-01 00:00:00")
    pts = [
        (i, base + dt.timedelta(seconds=rng.uniform(0, 600)))
        for i in range(200)
    ]
    ivs = []
    for j in range(30):
        s = rng.uniform(0, 550)
        ivs.append(
            (j, base + dt.timedelta(seconds=s),
             base + dt.timedelta(seconds=s + rng.uniform(0, 120)))
        )
    p = spark.createDataFrame(pts, "pid long, ts timestamp")
    iv = spark.createDataFrame(ivs, "ivid long, s timestamp, e timestamp")
    got = sorted(
        (r["pid"], r["ivid"])
        for r in point_in_interval_join(p, iv, "ts", "s", "e", 60.0).collect()
    )
    want = sorted(
        (r["pid"], r["ivid"])
        for r in p.join(
            iv, (p.ts >= iv.s) & (p.ts <= iv.e)
        ).collect()
    )
    assert got == want and len(got) > 0


def test_asof_null_timestamps_are_inert(spark):
    """A null-ts right row must never match anything; a null-ts left
    row comes out unmatched."""
    left = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01 10:00:05")), (2, "A", None)],
        "lid long, sym string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, "A", None, 9.9), (11, "A", _ts("2024-01-01 10:00:00"), 1.0)],
        "rid long, sym string, ts timestamp, px double",
    )
    rows = {
        r["lid"]: r
        for r in asof_join(
            left, right, on="sym", right_tie="rid", attach=["rid", "px"]
        ).collect()
    }
    assert rows[1]["asof_rid"] == 11 and rows[1]["asof_px"] == 1.0
    assert rows[2]["asof_rid"] is None and rows[2]["asof_lag_us"] is None
    assert len(rows) == 2


def test_asof_forward_null_left_ts_unmatched(spark):
    """Round-3 review regression: under desc ordering nulls sort LAST,
    so a null-ts left row used to adopt the running payload in forward
    mode; desc_nulls_first restores the unmatched contract."""
    left = spark.createDataFrame(
        [(1, "A", None)], "lid long, sym string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, "A", _ts("2024-01-01 10:00:00"), 1.0)],
        "rid long, sym string, ts timestamp, px double",
    )
    out = asof_join(
        left, right, on="sym", right_tie="rid", attach=["rid"],
        direction="forward",
    ).collect()
    assert len(out) == 1
    assert out[0]["asof_rid"] is None and out[0]["asof_ts"] is None


def test_holt_forecast_matches_reference_recurrence(spark):
    """Fold semantics pinned against a plain-Python Holt recurrence on
    a two-key daily series (one linear ramp — forecast must continue
    the ramp — and one too-short key that must be dropped)."""
    import datetime as dt

    from conte_to_fresco_etl_spark.operators.gapfill import holt_forecast

    rows = []
    base = dt.datetime(2024, 3, 1)
    counts = [10, 12, 14, 16, 18, 20]  # perfect ramp +2/day
    for d, n in enumerate(counts):
        for i in range(n):
            rows.append(("ramp", base + dt.timedelta(days=d, minutes=i)))
    rows.append(("short", base))  # single day -> dropped
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    out = holt_forecast(df, key_col="k", ts_col="ts", horizon=3).collect()
    got = {(r["key"], r["h"]): r for r in out}
    assert {k for k, _ in got} == {"ramp"}

    a, b_, oa, ob = 0.5, 0.3, 0.5, 0.7
    l, b = float(counts[0]), float(counts[1] - counts[0])
    for y in counts[1:]:
        nl = round(a * y + oa * (l + b), 12)
        b = round(b_ * (nl - l) + ob * b, 12)
        l = nl
    for h in (1, 2, 3):
        assert abs(got[("ramp", h)]["forecast"] - round(l + h * b, 6)) < 1e-9
    # a perfect ramp: trend converges to +2/day, forecast keeps climbing
    assert abs(got[("ramp", 1)]["trend"] - 2.0) < 0.2
    assert got[("ramp", 3)]["forecast"] > got[("ramp", 1)]["forecast"]
