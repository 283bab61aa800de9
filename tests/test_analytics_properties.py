"""Property-based cross-validation of the event-analytics operators
against independent pure-Python twins.

Each hypothesis example drives a whole operator pipeline (not a scalar
expression), so example counts are small — the point is adversarial
SHAPES (ties, single-point keys, empty steps, repeated states), not
volume.  Float comparisons allow 2e-6 (the half-up vs banker's rounding
daylight at the ROUND(x, 6) pins); everything structural is exact.
"""

from __future__ import annotations

import datetime as dt
import math
from collections import defaultdict

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from conte_to_fresco_etl_spark.operators.funnel import funnel_conversion
from conte_to_fresco_etl_spark.operators.gapfill import fill_time_gaps
from conte_to_fresco_etl_spark.operators.scd import scd2_intervals
from conte_to_fresco_etl_spark.operators.text_analysis import bm25_topk

BASE = dt.datetime(2024, 1, 1)


def _close(a, b, tol=2e-6):
    if a is None or b is None:
        return a is None and b is None
    return math.isclose(a, b, rel_tol=0, abs_tol=tol)


# ---------------------------------------------------------------------------
# gap fill
# ---------------------------------------------------------------------------

gap_events = st.lists(
    st.tuples(
        st.integers(0, 2),                      # key
        st.integers(0, 40),                     # hour offset
        st.integers(0, 59),                     # minute
        st.integers(-40, 40).map(lambda q: q / 4.0),  # value, exact in binary
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=6, deadline=None)
@given(gap_events)
def test_gapfill_matches_python_twin(spark, rows):
    df = spark.createDataFrame(
        [(k, BASE + dt.timedelta(hours=h, minutes=m), v) for k, h, m, v in rows],
        "user_id INT, ts TIMESTAMP, value DOUBLE",
    )
    got = {
        (r["user_id"], r["bucket_hour"]): (r["value_filled"], r["is_observed"])
        for r in fill_time_gaps(df).collect()
    }
    # twin: hourly means, [min, max] spine, LOCF
    buckets: dict[tuple[int, dt.datetime], list[float]] = defaultdict(list)
    for k, h, m, v in rows:
        buckets[(k, BASE + dt.timedelta(hours=h))].append(v)
    want = {}
    for k in {k for k, _ in buckets}:
        hours = sorted(h for kk, h in buckets if kk == k)
        lo, hi = hours[0], hours[-1]
        last = None
        h = lo
        while h <= hi:
            vs = buckets.get((k, h))
            if vs is not None:
                last = round(sum(vs) / len(vs), 6)  # exact: quarter values
                want[(k, h)] = (last, True)
            else:
                want[(k, h)] = (last, False)
            h += dt.timedelta(hours=1)
    assert set(got) == set(want)
    for key in want:
        assert _close(got[key][0], want[key][0]), (key, got[key], want[key])
        assert got[key][1] == want[key][1]


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------

funnel_events = st.lists(
    st.tuples(
        st.integers(0, 4),                       # user
        st.sampled_from(["view", "click", "purchase", "other"]),
        st.integers(0, 30),                      # ts offset (ties allowed)
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=6, deadline=None)
@given(funnel_events)
def test_funnel_matches_python_twin(spark, rows):
    steps = ["view", "click", "purchase"]
    df = spark.createDataFrame(
        [(u, t, BASE + dt.timedelta(minutes=o)) for u, t, o in rows],
        "user_id INT, event_type STRING, ts TIMESTAMP",
    )
    got = {
        r["step_name"]: r["n_users"]
        for r in funnel_conversion(df, steps).collect()
    }
    # twin: per-user earliest step-k event at-or-after the step-(k-1) time
    by_user = defaultdict(list)
    for u, t, o in rows:
        by_user[u].append((o, t))
    want = {s: 0 for s in steps}
    for u, evs in by_user.items():
        conv = None
        for s in steps:
            cand = [
                o for o, t in evs
                if t == s and (conv is None or o >= conv)
            ]
            if s == steps[0]:
                cand = [o for o, t in evs if t == s]
            if not cand:
                break
            conv = min(cand)
            want[s] += 1
    assert got == want


# ---------------------------------------------------------------------------
# SCD2
# ---------------------------------------------------------------------------

scd_events = st.lists(
    st.tuples(
        st.integers(0, 2),                 # key
        st.integers(0, 20),                # ts offset (ties allowed)
        st.sampled_from(["a", "b", None]),
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: (t[0], t[1]),  # unique (key, ts): event_id mirrors ts
)


@settings(max_examples=6, deadline=None)
@given(scd_events)
def test_scd2_matches_python_twin(spark, rows):
    df = spark.createDataFrame(
        [(k, BASE + dt.timedelta(minutes=o), o, s) for k, o, s in rows],
        "user_id INT, ts TIMESTAMP, event_id INT, event_type STRING",
    )
    got = sorted(
        (r["user_id"], r["valid_from"], r["valid_to"], r["event_type"],
         r["is_current"])
        for r in scd2_intervals(df).collect()
    )
    want = []
    by_key = defaultdict(list)
    for k, o, s in rows:
        by_key[k].append((o, s))
    for k, evs in by_key.items():
        evs.sort()
        opens = []
        prev = object()
        for o, s in evs:
            if s != prev:
                opens.append((o, s))
            prev = s
        for i, (o, s) in enumerate(opens):
            nxt = opens[i + 1][0] if i + 1 < len(opens) else None
            want.append(
                (
                    k,
                    BASE + dt.timedelta(minutes=o),
                    BASE + dt.timedelta(minutes=nxt) if nxt is not None else None,
                    s,
                    nxt is None,
                )
            )
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["spark", "hash", "window", "x", "y", "z"]),
        min_size=0,
        max_size=12,
    ),
    min_size=1,
    max_size=15,
)


@settings(max_examples=6, deadline=None)
@given(docs_strategy)
def test_bm25_matches_python_twin(spark, doc_tokens):
    terms, k1, b = ["spark", "hash"], 1.2, 0.75
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(doc_tokens)],
        "doc_id INT, text STRING",
    )
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(df, terms, k=len(doc_tokens) + 1, k1=k1, b=b).collect()
    }
    ne = [(i, toks) for i, toks in enumerate(doc_tokens) if toks]
    n_docs = float(len(ne))
    want = {}
    if ne:
        avgdl = sum(len(t) for _, t in ne) / n_docs
        dfreq = {
            w: float(sum(1 for _, t in ne if w in t)) for w in terms
        }
        for i, toks in ne:
            score = 0.0
            for w in terms:
                tf = float(toks.count(w))
                if tf == 0:
                    continue
                idf = math.log((n_docs - dfreq[w] + 0.5) / (dfreq[w] + 0.5) + 1.0)
                score += round(
                    idf * tf * (k1 + 1.0)
                    / (tf + k1 * (1 - b + b * len(toks) / avgdl)),
                    6,
                )
            if score:
                want[i] = score
    assert set(got) == set(want)
    for i in want:
        assert _close(got[i], want[i], tol=4e-6), (i, got[i], want[i])


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

edge_lists = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5)),
    min_size=1,
    max_size=15,
    unique=True,
)


def _pagerank_twin(pairs, iterations, damping):
    """Pure-Python replica of operators/graph.py:pagerank with the same
    ROUND pins: uniform out-edge weights, dangling redistribution."""
    from collections import defaultdict
    from decimal import Decimal

    nodes = sorted({s for s, _ in pairs} | {d for _, d in pairs})
    n = float(len(nodes))
    out = defaultdict(list)
    for s, d in pairs:
        out[s].append(d)
    ranks = {v: round(1.0 / n, 12) for v in nodes}
    for _ in range(iterations):
        cin = defaultdict(Decimal)
        for s, ds in out.items():
            w = 1.0 / len(ds)
            for d in ds:
                cin[d] += Decimal(str(round(ranks[s] * w, 12)))
        dang = float(
            sum(
                (Decimal(str(ranks[v])) for v in nodes if v not in out),
                Decimal(0),
            )
        )
        ranks = {
            v: round(
                (1.0 - damping) / n
                + damping * (float(cin.get(v, Decimal(0))) + dang / n),
                12,
            )
            for v in nodes
        }
    return {v: round(r, 6) for v, r in ranks.items()}


@settings(max_examples=6, deadline=None)
@given(edge_lists)
def test_pagerank_matches_python_twin(spark, pairs):
    from conte_to_fresco_etl_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(str(s), str(d)) for s, d in pairs], "src STRING, dst STRING"
    )
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iterations=3, weight_col=None).collect()
    }
    want = _pagerank_twin(
        [(str(s), str(d)) for s, d in pairs], iterations=3, damping=0.85
    )
    assert set(got) == set(want)
    for v in want:
        assert _close(got[v], want[v], tol=2e-6), (v, got[v], want[v])


# ---------------------------------------------------------------------------
# interval-overlap join
# ---------------------------------------------------------------------------


def test_interval_overlap_join_edges(spark):
    from conte_to_fresco_etl_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    def _ts(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    a = spark.createDataFrame(
        [
            (1, _ts(0), _ts(2)),    # long: spans many bins
            (2, _ts(5), _ts(5, 30)),
        ],
        "a_id INT, a_start TIMESTAMP, a_end TIMESTAMP",
    )
    b = spark.createDataFrame(
        [
            (10, _ts(1), _ts(1, 30)),  # inside a1
            (11, _ts(2), _ts(3)),      # touches a1's end exactly (inclusive)
            (12, _ts(4), _ts(4, 30)),  # overlaps nothing
        ],
        "b_id INT, b_start TIMESTAMP, b_end TIMESTAMP",
    )
    pairs = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            a, b, "a_start", "a_end", "b_start", "b_end", bin_seconds=600
        ).collect()
    )
    # each pair exactly once despite multi-bin overlap; touching
    # endpoints count (closed-interval convention)
    assert pairs == [(1, 10), (1, 11)]


interval_sets = st.lists(
    st.tuples(st.integers(0, 600), st.integers(0, 400)),  # start, length (s)
    min_size=0,
    max_size=12,
)


@settings(max_examples=6, deadline=None)
@given(interval_sets, interval_sets)
def test_interval_overlap_matches_brute_force(spark, xs, ys):
    from conte_to_fresco_etl_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    a = spark.createDataFrame(
        [
            (i, BASE + dt.timedelta(seconds=s), BASE + dt.timedelta(seconds=s + l))
            for i, (s, l) in enumerate(xs)
        ]
        or [(None, None, None)],
        "a_id INT, a_start TIMESTAMP, a_end TIMESTAMP",
    ).filter(F.col("a_id").isNotNull())
    b = spark.createDataFrame(
        [
            (i, BASE + dt.timedelta(seconds=s), BASE + dt.timedelta(seconds=s + l))
            for i, (s, l) in enumerate(ys)
        ]
        or [(None, None, None)],
        "b_id INT, b_start TIMESTAMP, b_end TIMESTAMP",
    ).filter(F.col("b_id").isNotNull())
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            a, b, "a_start", "a_end", "b_start", "b_end", bin_seconds=120
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (s1, l1) in enumerate(xs)
        for j, (s2, l2) in enumerate(ys)
        if s1 <= s2 + l2 and s2 <= s1 + l1
    )
    assert got == want  # complete AND exactly-once


# ---------------------------------------------------------------------------
# r9: rank-statistic identities across operators
# ---------------------------------------------------------------------------

two_samples = st.tuples(
    st.lists(st.integers(-8, 8).map(lambda q: q / 2.0), min_size=2,
             max_size=20),
    st.lists(st.integers(-8, 8).map(lambda q: q / 2.0), min_size=2,
             max_size=20),
)


@settings(max_examples=6, deadline=None)
@given(two_samples)
def test_cliffs_delta_is_rescaled_mannwhitney_u(spark, samples):
    """Cliff's delta and Mann-Whitney U are the same statistic on two
    scales: delta = 2*U_a/(n_a*n_b) - 1 for ANY tie structure — the two
    operators take different plan paths (b-count prefix scan vs pooled
    midranks), so the identity cross-checks both."""
    from conte_to_fresco_etl_spark.operators.robust import (
        cliffs_delta, mannwhitney_u,
    )

    a, b = samples
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    dlt = cliffs_delta(df, "g", "v", "a", "b").collect()[0]
    mwu = mannwhitney_u(df, "g", "v", "a", "b").collect()[0]
    n = len(a) * len(b)
    assert dlt["n_gt"] + dlt["n_lt"] <= n
    assert _close(
        dlt["cliffs_delta"], round(2.0 * mwu["u_a"] / n - 1.0, 6), tol=2e-6
    )


@settings(max_examples=6, deadline=None)
@given(two_samples)
def test_brunner_munzel_phat_complements_mannwhitney(spark, samples):
    """The Brunner-Munzel common-language effect p_hat equals
    U_a/(n_a*n_b) reflected: p_hat = P(a<b) + P(a=b)/2 = 1 - U_a/(nm)
    — a third independent path over the same rank structure."""
    from conte_to_fresco_etl_spark.operators.robust import (
        brunner_munzel, mannwhitney_u,
    )

    a, b = samples
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    bm = brunner_munzel(df, "g", "v", "a", "b").collect()[0]
    mwu = mannwhitney_u(df, "g", "v", "a", "b").collect()[0]
    n = len(a) * len(b)
    assert _close(bm["p_hat"], round(1.0 - mwu["u_a"] / n, 6), tol=2e-6)


@settings(max_examples=6, deadline=None)
@given(two_samples)
def test_anova_two_groups_squares_welch_under_equal_n(spark, samples):
    """With k=2 and EQUAL group sizes, the one-way ANOVA F equals the
    pooled-variance t² — and the classic identity t² = F ties the two
    sufficient-stat paths together.  (Unequal sizes still satisfy it
    for the pooled t; we draw equal-size pairs to keep the twin
    simple.)"""
    import math

    from conte_to_fresco_etl_spark.operators.robust import one_way_anova

    a, b = samples
    m = min(len(a), len(b))
    a, b = a[:m], b[:m]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    r = one_way_anova(df, "g", "v").collect()[0]
    if r["f_stat"] is None:
        return  # degenerate: zero within-variance
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((v - ma) ** 2 for v in a) / (na - 1)
    vb = sum((v - mb) ** 2 for v in b) / (nb - 1)
    sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
    t = (ma - mb) / math.sqrt(sp2 * (1 / na + 1 / nb))
    assert _close(r["f_stat"], round(t * t, 6), tol=5e-5)


@settings(max_examples=6, deadline=None)
@given(two_samples)
def test_delong_auc_is_mannwhitney_u_rescaled(spark, samples):
    """The DeLong AUC point estimate must equal U_a/(n_a*n_b) from the
    Mann-Whitney operator when 'positive' = group a and the score is
    the value — a fourth independent path over the rank structure."""
    from conte_to_fresco_etl_spark.operators.robust import (
        auc_delong, mannwhitney_u,
    )

    a, b = samples
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    dl = auc_delong(df, F.col("g") == "a", F.col("v")).collect()[0]
    mwu = mannwhitney_u(df, "g", "v", "a", "b").collect()[0]
    assert _close(
        dl["auc"], round(mwu["u_a"] / (len(a) * len(b)), 6), tol=2e-6
    )
