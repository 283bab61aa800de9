"""Sequence and graph analytics over event streams.

``event_transitions`` builds the first-order Markov transition table of
an event stream (the edge list + weights of the behavior graph);
``pagerank`` runs damped PageRank over any weighted edge list — the
classic link-analysis signal a crawl pipeline computes over its URL
graph, here exercised on the transition graph the events table induces.

Scale posture:
- Transitions: one per-key window sort (lag pairs) and one (src, dst)
  count shuffle; the per-src normalization is a window over the COUNTED
  table (|src|x|dst| rows — dimension-sized), not the raw stream.
- PageRank: per iteration, ONE join of the rank vector with the edge
  list on src and ONE groupBy dst — both shuffle on node keys, which is
  how Pregel-style systems partition the same computation.  The rank
  vector is |nodes| rows; at web scale both sides hash-partition on the
  node id and AQE handles skewed hubs.  Iterations are driver-
  coordinated like ``similarity.kmeans_step`` / ``dedup.connected_
  components`` — rounds are fixed (a hyperparameter, not data-driven),
  so plan depth is bounded without checkpointing.

Cross-engine exactness: rank updates are pinned per iteration —
contributions ROUND(x, 12) then summed as DECIMAL(28,12) (order-
independent), the damped update ROUND(x, 12) again — so an unrolled SQL
oracle reproduces every iterate bit-for-bit.
"""

from __future__ import annotations

import math
import os
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from conte_to_fresco_etl_spark.functions.core import normalize_ntz
from conte_to_fresco_etl_spark.session import free_blocks


# ---------------------------------------------------------------------------
# Single-task fixpoint execution for dimension-sized graphs
#
# The iterative operators below (pagerank / hits / markov_absorption) pin
# every iterate with ROUND(x, 12) + DECIMAL sums so an unrolled SQL oracle
# reproduces them bit-for-bit.  When the node set is DIMENSION-sized (the
# callers' broadcast_ranks / broadcast_scores declaration — an event-type
# or per-host graph), driving each round as separate Spark jobs is pure
# scheduling overhead: the r13 baseline measured the 25-row transition
# fixpoint at 2-4s of job/stage latency on top of a 0.9s edge build
# (guide §1.2: fix the distributed algorithm first).  These helpers run
# ALL rounds inside ONE applyInPandas task over the collapsed edge table,
# mirroring the in-plan arithmetic exactly:
#
# - Spark's round(double, s) is BigDecimal.valueOf(x).setScale(s, HALF_UP)
#   → double; BigDecimal.valueOf uses Double.toString (shortest round-trip
#   repr), which is what Python's repr(float) produces, so
#   Decimal(repr(x)).quantize(1e-s, HALF_UP) walks the identical values.
# - cast(double AS decimal(p, s)) performs the same HALF_UP quantize; the
#   DECIMAL sums are exact integer math in both engines.
# The distributed Pregel-style paths remain for web-scale graphs
# (broadcast flags False), and `test_hits_broadcast_path_matches_shuffle_
# path` pins the two paths bit-identical.
# ---------------------------------------------------------------------------


def _jround(x: float, scale: int) -> float:
    """Spark ``round(double, scale)``: HALF_UP on the shortest decimal
    repr, back to double (NaN/Inf pass through, as in RoundBase)."""
    if x != x or math.isinf(x):
        return x
    return float(
        Decimal(repr(x)).quantize(
            Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP
        )
    )


def _jdec(x: float, scale: int) -> Decimal:
    """Spark ``cast(double AS decimal(_, scale))``: HALF_UP quantize of
    the shortest decimal repr."""
    return Decimal(repr(x)).quantize(
        Decimal(1).scaleb(-scale), rounding=ROUND_HALF_UP
    )


#: Mis-declaration guard for the single-task fixpoint paths: the
#: broadcast_ranks/broadcast_scores flags are caller DECLARATIONS that
#: the node set is dimension-sized; a web-scale graph declared that way
#: would gather every distinct edge into one task.  The cap bounds the
#: gathered row count (default 5M rows ≈ a few hundred MB of pandas —
#: far above any dimension-sized graph, far below the OOM zone of the
#: O(iterations x rows) fixpoint that follows); override via
#: $SPARK_GRAFT_SINGLE_TASK_MAX_ROWS.
_SINGLE_TASK_MAX_ROWS = int(
    os.environ.get("SPARK_GRAFT_SINGLE_TASK_MAX_ROWS", 5_000_000)
)


def _single_task(df: DataFrame, fn, out_schema: StructType) -> DataFrame:
    """Run ``fn`` (pandas DataFrame -> pandas DataFrame) over ALL rows of
    a dimension-sized ``df`` in one applyInPandas task (one constant
    group).  An empty input yields an empty result frame.

    The row-cap guard (r14, VERDICT r13 item 8) fails FAST with a
    descriptive error instead of letting a mis-declared web-scale graph
    amplify through the in-task fixpoint: the check runs before any
    iteration work, so the cost of a false declaration is one gather,
    not iterations x rows of single-task compute.  (The gather itself
    is bounded by the Arrow batch pipeline; the fixpoint's quadratic
    amplification is what the cap prevents.)"""
    cap = _SINGLE_TASK_MAX_ROWS

    def guarded(pdf):
        if len(pdf) > cap:
            raise ValueError(
                f"single-task graph fixpoint received {len(pdf)} rows "
                f"(> cap {cap}): the node set is NOT dimension-sized — "
                "re-run with broadcast_ranks/broadcast_scores=False to "
                "use the distributed Pregel path, or raise "
                "$SPARK_GRAFT_SINGLE_TASK_MAX_ROWS if the size is "
                "intentional"
            )
        return fn(pdf)

    return df.groupBy(F.lit(1).alias("__fx")).applyInPandas(
        guarded, schema=out_schema
    )


def event_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """First-order Markov transition table: for every consecutive event
    pair within a key (ordered by (ts, tiebreak)), count (src, dst) and
    normalize per src.  Output: ``(src, dst, n_transitions, prob)``
    with prob = ROUND(n / out_total(src), 6) — exact longs in, so the
    double is reproducible."""
    src = normalize_ntz(df)
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = src.select(
        F.lag(F.col(type_col)).over(w).alias("src"),
        F.col(type_col).alias("dst"),
    ).filter(F.col("src").isNotNull())
    counts = pairs.groupBy("src", "dst").agg(
        F.count("*").alias("n_transitions")
    )
    tot = Window.partitionBy("src")
    return counts.select(
        "src",
        "dst",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(tot).cast("double"),
            6,
        ).alias("prob"),
    )


def top_event_sequences(
    df: DataFrame,
    n: int = 3,
    k: int = 20,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = "event_id",
    sep: str = ">",
) -> DataFrame:
    """Top-k most frequent length-``n`` event sequences (consecutive
    within a key).  Output: ``(seq, n_occurrences)``, ranked by
    (count desc, seq) so the LIMIT is deterministic.

    Scale posture: a LAG CHAIN over one key-partitioned sort — n-1 lag
    columns over the same window spec share a single Exchange + Sort —
    beats the rownum self-join spelling (n shuffles of the full stream)
    and the collect_list spelling (whole-history rows).  The count is
    one shuffle of (n-gram, 1) pairs with map-side partials; the rank
    is a TakeOrdered(k)."""
    if n < 2:
        raise ValueError("n must be >= 2")
    src = normalize_ntz(df)
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    lags = [
        F.lag(F.col(type_col), n - 1 - i).over(w).alias(f"__g{i}")
        for i in range(n - 1)
    ]
    grams = src.select(*lags, F.col(type_col).alias(f"__g{n - 1}"))
    # every position non-null: the oldest lag alone would not catch a
    # NULL event type mid-sequence (concat_ws silently skips nulls)
    present = F.lit(True)
    for i in range(n):
        present = present & F.col(f"__g{i}").isNotNull()
    complete = grams.filter(present)
    return (
        complete.select(
            F.concat_ws(sep, *[F.col(f"__g{i}") for i in range(n)]).alias(
                "seq"
            )
        )
        .groupBy("seq")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("seq").asc())
        .limit(k)
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = "prob",
    broadcast_ranks: bool = False,
) -> DataFrame:
    """Damped PageRank over a weighted edge list.

    Unweighted form (``weight_col=None``) splits a node's mass evenly
    across its out-edges; weighted form uses the given per-edge weight
    (weights should sum to ~1 per src — e.g. ``event_transitions``
    probabilities).  Dangling nodes (no out-edges) redistribute their
    mass uniformly, so total rank is conserved up to the ROUND pins.

    Output: ``(node, rank)`` with rank ROUND(x, 12)-pinned after every
    iteration (see module docstring).  Everything stays in-plan: N and
    the dangling mass are 1-row broadcast crossJoins, never collects.

    ``broadcast_ranks=True`` declares |nodes| dimension-sized (an
    event-type or per-host graph, as in the gate); since r13 that
    declaration routes the whole fixpoint into ONE applyInPandas task
    over the collapsed (src, dst, w, multiplicity) edge table — the
    iterate arithmetic (ROUND(12) pins, DECIMAL(28,12) sums) is
    mirrored exactly (see `_jround`/`_jdec`), so results are
    bit-identical to the Pregel path while paying one tiny job instead
    of per-round materialization jobs.  Leave it False for web-scale
    graphs, where the rank vector is as big as the corpus and must
    hash-partition alongside the edges (per iteration: one rank-edge
    join + one AQE-coalesced aggregate).
    """
    e = edges.select(
        F.col(src_col).alias("__s"),
        F.col(dst_col).alias("__d"),
        (
            F.col(weight_col).cast("double")
            if weight_col
            else F.lit(None).cast("double")
        ).alias("__w"),
    )
    if weight_col is None:
        outdeg = e.groupBy("__s").agg(F.count("*").alias("__deg"))
        e = e.join(outdeg, "__s").select(
            "__s", "__d", (F.lit(1.0) / F.col("__deg")).alias("__w")
        )
    if broadcast_ranks:
        return _pagerank_single_task(e, iterations, damping)
    # The edge list is referenced once per iteration AND by the node /
    # dangling derivations — the rank recurrence additionally fans out
    # the plan ~2^iterations.  Persist the dimension-sized staging
    # tables so every re-reference replays a cached edge table instead
    # of re-deriving it from the raw stream (same session-staging
    # convention as dedup.neardup_decision).
    e = e.persist()
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionByName(e.select(F.col("__d").alias("node")))
        .distinct()
        .persist()
    )
    n_total = nodes.agg(F.count("*").cast("double").alias("__n"))
    ranks = nodes.join(F.broadcast(n_total)).select(
        "node", F.round(F.lit(1.0) / F.col("__n"), 12).alias("rank")
    )
    has_out = e.select(F.col("__s").alias("node")).distinct().persist()
    maybe_bc = F.broadcast if broadcast_ranks else (lambda df: df)
    prev_ck = None
    for _ in range(iterations):
        contrib = (
            e.join(maybe_bc(ranks), e["__s"] == ranks["node"])
            .select(
                F.col("__d").alias("node"),
                F.round(F.col("rank") * F.col("__w"), 12)
                .cast("decimal(28,12)")
                .alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").cast("double").alias("__in"))
        )
        dangling = (
            ranks.join(has_out, "node", "left_anti")
            .agg(
                F.coalesce(
                    F.sum(F.col("rank").cast("decimal(28,12)")), F.lit(0)
                )
                .cast("double")
                .alias("__dang")
            )
        )
        ranks = (
            nodes.join(maybe_bc(contrib), "node", "left")
            .join(F.broadcast(n_total))
            .join(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    (F.lit(1.0) - F.lit(damping)) / F.col("__n")
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("__in"), F.lit(0.0))
                        + F.col("__dang") / F.col("__n")
                    ),
                    12,
                ).alias("rank"),
            )
        )
        # The recurrence references ranks twice per level (contrib +
        # dangling), fanning the lazy plan out 2^iterations — truncate
        # per round like connected_components does (localCheckpoint
        # here; durable checkpoint() on a cluster).  The rank vector is
        # |nodes| rows, so the materialization is trivial.
        ranks = ranks.localCheckpoint(eager=True)
        # the previous round's checkpoint blocks were consumed building
        # this round (now materialized); free them eagerly instead of
        # letting iterations-many rank vectors pile up in the block
        # manager until a session-level sweep
        if prev_ck is not None:
            free_blocks(prev_ck)
        prev_ck = ranks
    # ranks is materialized (eager checkpoints), so the per-call staging
    # caches can be released now — unlike the deliberately session-lived
    # dedup.neardup_decision table, these are scoped to this call
    e.unpersist()
    nodes.unpersist()
    has_out.unpersist()
    return ranks.select("node", F.round(F.col("rank"), 6).alias("rank"))


def _pagerank_single_task(
    e: DataFrame, iterations: int, damping: float
) -> DataFrame:
    """All PageRank rounds in one task over the collapsed edge table
    (see the module helper block).  ``e`` is (__s, __d, __w); duplicate
    edge rows are collapsed in-plan to a multiplicity so the gathered
    table is bounded by |distinct edges|, and each duplicate's
    contribution is the DECIMAL term times the multiplicity (exact)."""
    node_t = e.schema["__s"].dataType
    out_schema = StructType(
        [
            StructField("node", node_t),
            StructField("rank", DoubleType()),
        ]
    )
    damping = float(damping)
    iters = int(iterations)

    def run(pdf):
        import pandas as pd

        srcs = pdf["__s"].tolist()
        dsts = pdf["__d"].tolist()
        ws = pdf["__w"].tolist()
        ms = pdf["__m"].tolist()
        nodes = set(srcs) | set(dsts)
        n = float(len(nodes))
        r0 = _jround(1.0 / n, 12)
        rank = {v: r0 for v in nodes}
        has_out = set(srcs)
        no_out = [v for v in nodes if v not in has_out]
        zero = Decimal(0)
        for _ in range(iters):
            contrib: dict = {}
            for u, v, w, m in zip(srcs, dsts, ws, ms):
                c = _jdec(_jround(rank[u] * w, 12), 12) * m
                contrib[v] = contrib.get(v, zero) + c
            dang = zero
            for v in no_out:
                dang += _jdec(rank[v], 12)
            dang_f = float(dang)
            rank = {
                v: _jround(
                    (1.0 - damping) / n
                    + damping
                    * (
                        (float(contrib[v]) if v in contrib else 0.0)
                        + dang_f / n
                    ),
                    12,
                )
                for v in nodes
            }
        out = list(nodes)
        return pd.DataFrame(
            {"node": out, "rank": [_jround(rank[v], 6) for v in out]}
        )

    ec = e.groupBy("__s", "__d", "__w").agg(F.count("*").alias("__m"))
    return _single_task(ec, run, out_schema)


def cooccurrence_edges(
    df: DataFrame,
    key_col: str,
    context_col,
    min_shared: int = 1,
) -> DataFrame:
    """Undirected co-occurrence graph: two keys are connected when they
    appear in at least ``min_shared`` distinct shared contexts (the
    bipartite key-context projection — users sharing time buckets,
    documents sharing shingles, pages sharing link targets).

    Output: ``(a, b, n_shared)`` with ``a < b``, one row per edge.

    Scale posture: the classic posting-list self-join — distinct
    (key, context) pairs shuffle once on the CONTEXT, pairs are
    generated per posting list (cost Σ |posting|², never |keys|²), and
    hot contexts are the skew knob: cap or drop contexts whose posting
    exceeds a bound (a stopword-context filter), exactly as the n-gram
    Jaccard join does (dedup.ngram_jaccard_pairs)."""
    ctx = context_col if not isinstance(context_col, str) else F.col(context_col)
    posts = df.select(
        F.col(key_col).alias("__k"), ctx.alias("__ctx")
    ).distinct()
    a = posts.select(F.col("__k").alias("a"), "__ctx")
    b = posts.select(F.col("__k").alias("b"), "__ctx")
    return (
        a.join(b, "__ctx")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def triangle_count(
    edges: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Per-node triangle participation over an undirected edge list —
    the local clustering signal (spam farms and bot rings show up as
    abnormal triangle density).

    Input edges may be in any orientation and carry duplicates; they
    are canonicalized to ``a < b`` distinct pairs, self-loops dropped.
    Output: ``(node, n_triangles)`` for every node in ≥1 triangle.

    Scale posture — the degree-ordered (rank) orientation: each edge is
    directed from its lower-(degree, id) endpoint to the higher one, so
    every triangle is generated EXACTLY once from its lowest-rank
    vertex, and the wedge join fans out by min-degree: Σ out-deg² with
    out-degrees bounded by √(2|E|), the Ligra/Cohen bound — a hub of
    degree 10⁶ contributes wedges only through its (few) lower-degree
    neighbors, never 10¹² pairs.  Three shuffles total: degree count,
    wedge self-join on the pivot, and the closing edge semi-join."""
    canon = (
        edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("u"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        # canon feeds the degree pass AND both orientation join sides:
        # checkpoint truncates the (often join-heavy) upstream edge
        # build so it is computed ONCE and the downstream plan stays
        # edge-list-sized (r13; guide §3.3 — the un-truncated form
        # re-planned and re-executed the edge build up to 5x: a
        # 7.7k-line physical plan with 458 Exchanges at sf0.1)
        .distinct()
        .localCheckpoint(eager=False)
    )
    both = canon.select(F.col("u").alias("n")).unionByName(
        canon.select(F.col("v").alias("n"))
    )
    deg = both.groupBy("n").agg(F.count("*").alias("deg"))
    # orientation rank: (degree, node id) lexicographic as a STRUCT —
    # Spark orders structs field-by-field, so the comparison is total
    # for any comparable node-id type (64-bit, negative, or string ids
    # all work; a packed-BIGINT encoding would collide or overflow)
    rank = deg.select(
        "n",
        F.struct(F.col("deg"), F.col("n")).alias("rk"),
    )
    ra = rank.select(F.col("n").alias("u"), F.col("rk").alias("rk_u"))
    rb = rank.select(F.col("n").alias("v"), F.col("rk").alias("rk_v"))
    oriented = (
        canon.join(ra, "u")
        .join(rb, "v")
        .select(
            F.when(F.col("rk_u") < F.col("rk_v"), F.col("u"))
            .otherwise(F.col("v"))
            .alias("lo"),
            F.when(F.col("rk_u") < F.col("rk_v"), F.col("v"))
            .otherwise(F.col("u"))
            .alias("hi"),
            F.least("rk_u", "rk_v").alias("rk_lo"),
            F.greatest("rk_u", "rk_v").alias("rk_hi"),
        )
        # three consumers (two wedge sides + the closing semi-join):
        # checkpoint so orientation is computed once — the previous
        # persist() was unpersisted before the first action ran, so
        # every consumer recomputed the full orientation join (r13)
    ).localCheckpoint(eager=False)
    e1 = oriented.select(
        F.col("lo").alias("pivot"),
        F.col("hi").alias("x"),
        F.col("rk_hi").alias("rk_x"),
    )
    e2 = oriented.select(
        F.col("lo").alias("pivot"),
        F.col("hi").alias("y"),
        F.col("rk_hi").alias("rk_y"),
    )
    wedges = e1.join(e2, "pivot").filter(F.col("rk_x") < F.col("rk_y"))
    closing = oriented.select(
        F.col("lo").alias("x"), F.col("hi").alias("y")
    )
    tris = wedges.join(closing, ["x", "y"], "left_semi").select(
        "pivot", "x", "y"
    )
    members = (
        tris.select(F.col("pivot").alias("node"))
        .unionByName(tris.select(F.col("x").alias("node")))
        .unionByName(tris.select(F.col("y").alias("node")))
    )
    out = members.groupBy("node").agg(F.count("*").alias("n_triangles"))
    # checkpoint blocks (canon, oriented) are reclaimed by the session
    # sweep (session.sweep_persisted), the repo-wide convention for
    # lazily-checkpointed intermediates
    return out


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 0.01,
    min_confidence: float = 0.0,
) -> DataFrame:
    """Pairwise association rules over baskets (market-basket mining,
    the 1-antecedent slice of Apriori): for every DIRECTED item pair
    a→b co-occurring in enough baskets, emit

        support    = n_ab / N
        confidence = n_ab / n_a
        lift       = (n_ab · N) / (n_a · n_b)

    Output: ``(antecedent, consequent, n_pair, support, confidence,
    lift)``, all three ratios ROUND(6) from exact long counts.

    Scale posture: distinct (basket, item) postings self-join on the
    BASKET (Σ per-basket items², the n-gram-Jaccard shape); the
    min_support prune applies to pair counts BEFORE the item-frequency
    joins, and item frequencies broadcast back.  Deeper antecedents =
    iterate this join against surviving itemsets (Apriori's candidate
    generation), each round pruned by the same support floor."""
    posts = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    # basket count stays IN-PLAN (1-row broadcast crossJoin, the
    # q_above_mean discipline) — no eager driver count per call
    nb = posts.agg(
        F.count_distinct("__b").cast("double").alias("__n_baskets")
    )
    freq = posts.groupBy("__i").agg(F.count("*").alias("n_item"))
    a = posts.select("__b", F.col("__i").alias("antecedent"))
    b = posts.select("__b", F.col("__i").alias("consequent"))
    pairs = (
        a.join(b, "__b")
        .filter(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count("*").alias("n_pair"))
        .join(F.broadcast(nb))
        .filter(
            F.col("n_pair").cast("double")
            >= F.lit(float(min_support)) * F.col("__n_baskets")
        )
    )
    fa = freq.select(
        F.col("__i").alias("antecedent"), F.col("n_item").alias("n_a")
    )
    fb = freq.select(
        F.col("__i").alias("consequent"), F.col("n_item").alias("n_b")
    )
    n = F.col("__n_baskets")
    out = (
        pairs.join(F.broadcast(fa), "antecedent")
        .join(F.broadcast(fb), "consequent")
        .select(
            "antecedent",
            "consequent",
            "n_pair",
            F.round(F.col("n_pair").cast("double") / n, 6).alias("support"),
            F.round(
                F.col("n_pair").cast("double")
                / F.col("n_a").cast("double"),
                6,
            ).alias("confidence"),
            F.round(
                F.col("n_pair").cast("double") * n
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                6,
            ).alias("lift"),
        )
    )
    if min_confidence > 0.0:
        out = out.filter(F.col("confidence") >= min_confidence)
    return out


def score_propagation(
    scores: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality",
    a_col: str = "id_a",
    b_col: str = "id_b",
    alpha: float = 0.5,
) -> DataFrame:
    """One smoothing step of a per-node score over an undirected pair
    graph:

        smoothed_i = α·score_i + (1−α)·mean_{j ∈ N(i)} score_j

    (isolated nodes keep their own score).  Over a near-duplicate
    graph this propagates quality/spam evidence between documents that
    share content — a labeled spam doc drags its near-copies down even
    when their own heuristics look clean; iterate for multi-hop
    diffusion (each step is this operator applied to its own output).

    Returns (id, score, n_neighbors, smoothed), smoothed ROUND(6).

    Scale posture: symmetrize the pair list (union, no shuffle), one
    join to attach neighbor scores, one (node) aggregation; the node
    table joins back against the dimension-sized neighbor summary.
    Neighbor means sum as DECIMAL over ROUND(6) scores, so the result
    is aggregation-order independent across engines."""
    e = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
    )
    nb = (
        e.join(
            scores.select(
                F.col(id_col).alias("dst"), F.col(score_col).alias("__q")
            ),
            "dst",
        )
        .groupBy("src")
        .agg(
            F.count("*").alias("n_neighbors"),
            F.round(
                F.sum(F.col("__q").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("__nb_mean"),
        )
    )
    al = F.lit(float(alpha))
    return scores.join(
        nb, scores[id_col] == nb["src"], "left"
    ).select(
        F.col(id_col),
        F.col(score_col),
        F.coalesce(F.col("n_neighbors"), F.lit(0)).cast("long").alias(
            "n_neighbors"
        ),
        F.round(
            al * F.col(score_col)
            + (F.lit(1.0) - al)
            * F.coalesce(F.col("__nb_mean"), F.col(score_col)),
            6,
        ).alias("smoothed"),
    )


def label_propagation(
    pairs: DataFrame,
    rounds: int = 3,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Synchronous label-propagation community detection over an
    undirected pair graph: every node starts as its own label; each
    round every node adopts the MOST FREQUENT label among its neighbors
    (ties broken toward the smallest label — fully deterministic, no
    random visit order).  Unlike connected components (which merges
    everything reachable), LPA respects community structure: a thin
    bridge between two dense near-dup clusters does not glue them.

    Returns (node, label) after ``rounds`` synchronous rounds.

    Scale shape: per round, one edge->label join and one
    (node, label) count aggregation, then a node-partitioned top-1
    window over the collapsed count table — all label-/node-keyed
    shuffles, nothing quadratic.  The plan is localCheckpointed each
    round: the recurrence references the previous iterate once per
    direction, and an unbroken lineage would fan out 2^rounds."""
    e = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .unionByName(
            pairs.select(F.col(b_col).alias("a"), F.col(a_col).alias("b"))
        )
        .distinct()
        # referenced once per round: without this the symmetrize +
        # distinct shuffle (and whatever produced `pairs`) re-executes
        # in every round's job
        .localCheckpoint(eager=False)
    )
    labels = e.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    w = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("nlab").asc()
    )
    for _ in range(rounds):
        cnt = (
            e.join(
                labels.select(
                    F.col("node").alias("b"), F.col("label").alias("nlab")
                ),
                "b",
            )
            .groupBy(F.col("a").alias("node"), "nlab")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", F.col("nlab").alias("label"))
            .localCheckpoint(eager=False)
        )
    return labels


def kcore(
    edges: DataFrame,
    k: int = 2,
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 16,
    broadcast_alive: bool = False,
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly drop nodes
    of degree < ``k`` (and their edges) until the graph is stable — the
    maximal subgraph where every node keeps >= k neighbors.  The dense
    cores of a near-dup or co-occurrence graph are template farms and
    bot rings; the peeled periphery is incidental overlap.

    Output: one row per node of the INPUT graph —
    ``(node, core_deg, in_core)`` where ``core_deg`` is the node's
    degree inside the surviving subgraph (0 when peeled out).

    Scale posture: each round is one degree aggregate plus two
    semi-joins keyed on the node id (the Pregel partitioning), with
    the shrinking edge set localCheckpointed per round (the recurrence
    references it three times — the q_pagerank fan-out discipline).
    Peeling converges in <= max(coreness) rounds; the loop early-stops
    on a stable edge count (one scalar per round, the convergence
    probe every iterative operator here uses).  ``max_rounds`` bounds
    the unrolled SQL oracle; peeling is monotone, so once stable every
    further round is a no-op and any oracle unrolled to >= the
    convergence depth matches exactly.

    ``broadcast_alive=True`` ships the surviving-node set to the edge
    partitions instead of shuffling edges onto it (pagerank's
    ``broadcast_ranks`` knob): the right plan when |nodes| is
    dimension-sized; leave False for web-scale graphs where the alive
    set must hash-partition alongside the edges.
    """
    sym = edges.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).unionByName(
        edges.select(
            F.col(b_col).alias("src"), F.col(a_col).alias("dst")
        )
    )
    nodes = sym.select(F.col("src").alias("node")).distinct().persist()
    cur = sym.localCheckpoint()
    n_prev = cur.count()
    for _ in range(max_rounds):
        deg = cur.groupBy("src").agg(F.count("*").alias("__d"))
        alive = deg.filter(F.col("__d") >= k).select("src")
        alive_dst = alive.select(F.col("src").alias("dst"))
        if broadcast_alive:
            alive, alive_dst = F.broadcast(alive), F.broadcast(alive_dst)
        cur = (
            cur.join(alive, "src")
            .join(alive_dst, "dst")
            .select("src", "dst")
            .localCheckpoint()
        )
        n_now = cur.count()
        if n_now == n_prev:
            break
        n_prev = n_now
    core_deg = cur.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("core_deg")
    )
    return nodes.join(core_deg, "node", "left").select(
        "node",
        F.coalesce(F.col("core_deg"), F.lit(0)).alias("core_deg"),
        (F.coalesce(F.col("core_deg"), F.lit(0)) >= k).alias("in_core"),
    )


def modularity(
    pairs: DataFrame,
    labels: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    node_col: str = "node",
    label_col: str = "label",
) -> DataFrame:
    """Newman modularity of a node partition over an undirected pair
    graph — the objective that says whether :func:`label_propagation`'s
    communities are real structure or noise: Q = Σ_c (e_c/m −
    (d_c/2m)²) compares each community's internal edge mass against
    the random-graph expectation for its degree mass.  Q near 0 ⇒ the
    "communities" are no better than chance; the judge a pipeline
    applies before acting on any clustering.

    Input: unique undirected pairs (a < b) and a (node, label) table.
    Output per community: ``(label, n_nodes, internal_edges,
    degree_sum, contribution)`` with contribution ROUND(6); the
    partition's Q is the sum of the contribution column.

    Scale posture: degrees come from one symmetrized count; labels
    attach to pair endpoints via two node-keyed joins (broadcast when
    the label table is dimension-sized, sort-merge otherwise);
    everything collapses to |communities| rows before the scalar
    algebra; m enters as the annotated 1-row broadcast."""
    # pairs feeds THREE consumers (label attach, degree count, m):
    # checkpoint so an expensive upstream pair build (LSH banding,
    # signature Python stages) runs ONCE and the downstream plan is
    # edge-list-sized (r13; guide §3.3 — blocks reclaimed by
    # session.sweep_persisted)
    pairs = pairs.select(a_col, b_col).localCheckpoint(eager=False)
    la = labels.select(
        F.col(node_col).alias("na"), F.col(label_col).alias("la")
    )
    lb = labels.select(
        F.col(node_col).alias("nb"), F.col(label_col).alias("lb")
    )
    p = (
        pairs.select(F.col(a_col).alias("pa"), F.col(b_col).alias("pb"))
        .join(la, F.col("pa") == F.col("na"))
        .join(lb, F.col("pb") == F.col("nb"))
    )
    internal = (
        p.filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("lbl"))
        .agg(F.count("*").alias("e_c"))
    )
    sym = pairs.select(F.col(a_col).alias("n")).unionAll(
        pairs.select(F.col(b_col).alias("n"))
    )
    deg = sym.groupBy("n").agg(F.count("*").alias("d"))
    d_c = (
        deg.join(
            labels.select(
                F.col(node_col).alias("n"), F.col(label_col).alias("lbl")
            ),
            "n",
        )
        .groupBy("lbl")
        .agg(F.count("*").alias("n_nodes"), F.sum("d").alias("d_c"))
    )
    m_tot = pairs.agg(F.count("*").cast("double").alias("m"))
    joined = (
        d_c.join(internal, "lbl", "left")
        .join(F.broadcast(m_tot))
        .select(
            "lbl",
            "n_nodes",
            F.coalesce(F.col("e_c"), F.lit(0)).alias("e_c"),
            "d_c",
            "m",
        )
    )
    ec = F.col("e_c").cast("double")
    dc = F.col("d_c").cast("double")
    m_ = F.col("m")
    return joined.select(
        F.col("lbl").alias(label_col),
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("e_c").cast("long").alias("internal_edges"),
        F.col("d_c").cast("long").alias("degree_sum"),
        F.round(
            ec / m_ - (dc / (F.lit(2.0) * m_)) * (dc / (F.lit(2.0) * m_)),
            6,
        ).alias("contribution"),
    )


def markov_absorption(
    transitions: DataFrame,
    win_state: str,
    lose_state: str,
    iterations: int = 12,
    src_col: str = "src",
    dst_col: str = "dst",
    prob_col: str = "prob",
) -> DataFrame:
    """Absorbing-Markov-chain conversion probability: for every state
    of a first-order transition graph (:func:`event_transitions`), the
    probability of reaching ``win_state`` before ``lose_state`` within
    ``iterations`` steps — the attribution primitive behind Markov
    journey models ("how likely does a session standing at X convert
    rather than die?"), and the quantity whose per-channel deltas are
    the removal effects.

    Fixed-point iteration v(s) ← Σ_d T(s,d)·v(d) with v(win) = 1,
    v(lose) = 0 pinned; K iterations bound the horizon (the estimate
    is monotonically non-decreasing in K and converges geometrically).
    Per-term products ROUND(12) → DECIMAL-summed, the iterate
    ROUND(12)-pinned — bit-reproducible in any engine.

    Output: ``(state, p_win)`` per state, ROUND(6).

    Scale posture: the chain runs on the COLLAPSED transition table
    (|states|² rows at most — dimension-sized by construction), so
    since r13 ALL rounds execute inside ONE applyInPandas task over
    that table (module helper block) instead of K lazy-checkpointed
    tiny joins: the per-round ROUND(12)-pin + DECIMAL(38,12) sum
    sequence is mirrored exactly, results bit-identical, and the
    query pays one job instead of a 12-round nested plan.  The raw
    event stream is touched only by the upstream transition build."""
    t = transitions.select(
        F.col(src_col).alias("s"),
        F.col(dst_col).alias("d"),
        F.col(prob_col).cast("double").alias("p"),
    ).filter(~F.col("s").isin([win_state, lose_state]))
    out_schema = StructType(
        [
            StructField("state", t.schema["s"].dataType),
            StructField("p_win", DoubleType()),
        ]
    )
    iters = int(iterations)
    win, lose = win_state, lose_state

    def run(pdf):
        import pandas as pd

        srcs = pdf["s"].tolist()
        dsts = pdf["d"].tolist()
        ps = pdf["p"].tolist()
        ms = pdf["__m"].tolist()
        states = set(srcs) | set(dsts)
        v = {
            st: (1.0 if st == win else 0.0 if st == lose else 0.0)
            for st in states
        }
        zero = Decimal(0)
        for _ in range(iters):
            acc: dict = {}
            for s, d, p, m in zip(srcs, dsts, ps, ms):
                term = _jdec(_jround(p * v[d], 12), 12) * m
                acc[s] = acc.get(s, zero) + term
            nxt = {s: _jround(float(x), 12) for s, x in acc.items()}
            v = {
                st: (
                    1.0
                    if st == win
                    else 0.0 if st == lose else nxt.get(st, 0.0)
                )
                for st in states
            }
        out = list(states)
        return pd.DataFrame(
            {"state": out, "p_win": [_jround(v[st], 6) for st in out]}
        )

    tc = t.groupBy("s", "d", "p").agg(F.count("*").alias("__m"))
    return _single_task(tc, run, out_schema)


def adamic_adar(
    edges: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Adamic-Adar link-prediction scores over an undirected edge
    list: for each non-adjacent-or-adjacent pair with at least one
    common neighbor, AA(a,b) = Σ_{z ∈ Γ(a)∩Γ(b)} 1/ln(deg z) — the
    classic "which links are missing" ranking (rare shared neighbors
    count more than hubs), the graph sibling of the idf-weighted
    cosine join.  Output: ``(a, b, n_common, aa_score)`` with a < b,
    ROUND(6), one row per pair sharing ≥ 1 neighbor.

    Scale posture: symmetrize once, one degree collapse, then the
    wedge enumeration is a neighbor-keyed posting self-join (cost
    Σ deg² over the COLLAPSED graph, never |nodes|²) — hub degree is
    the skew knob, same as every posting join in this package.
    Exactness: each wedge contributes ROUND(1/ln(deg), 9) summed as
    DECIMAL; common neighbors have deg ≥ 2, so ln > 0."""
    und = edges.select(
        F.col(a_col).alias("u"), F.col(b_col).alias("v")
    ).unionAll(
        edges.select(F.col(b_col).alias("u"), F.col(a_col).alias("v"))
    )
    deg = und.groupBy("v").agg(F.count("*").alias("deg"))
    adj = und.join(deg, "v").select(
        "u",
        "v",
        # a degree-1 node can never be a COMMON neighbor, but its adj
        # row still evaluates the expression — guard ln(1) = 0 (ANSI
        # division) with an explicit branch; the NULL never survives
        # the wedge join
        F.when(
            F.col("deg") >= 2,
            F.round(
                F.lit(1.0) / F.log(F.col("deg").cast("double")), 9
            ),
        ).alias("w"),
    )
    l = adj.select(
        F.col("u").alias("a"), F.col("v").alias("z"), F.col("w")
    )
    r = adj.select(F.col("u").alias("b"), F.col("v").alias("z"))
    return (
        l.join(r, "z")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("n_common"),
            F.round(
                F.sum(F.col("w").cast("decimal(28,9)")).cast("double"), 6
            ).alias("aa_score"),
        )
    )


def link_prediction_scores(
    edges: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """The classical link-prediction score panel over an undirected
    edge list, one row per pair sharing >= 1 neighbor: common
    neighbors, Jaccard = cn/(deg_a + deg_b - cn), preferential
    attachment = deg_a * deg_b, and resource allocation =
    sum 1/deg(z) (Adamic-Adar's harder-decaying sibling) — the
    feature set a candidate-ranking model starts from, next to
    [[q_adamic_adar]]'s single score.  Output: ``(a, b, n_common,
    jaccard, pref_attach, res_alloc)`` with a < b, ROUND(6).

    Scale posture: the adamic_adar wedge posting self-join (cost
    Σ deg² over the collapsed graph) plus one broadcast degree
    re-attach; every weight is ROUND(9)-pinned and decimal-summed."""
    und = edges.select(
        F.col(a_col).alias("u"), F.col(b_col).alias("v")
    ).unionAll(
        edges.select(F.col(b_col).alias("u"), F.col(a_col).alias("v"))
    )
    deg = und.groupBy("v").agg(F.count("*").alias("deg"))
    adj = und.join(deg, "v").select(
        "u",
        "v",
        F.round(F.lit(1.0) / F.col("deg").cast("double"), 9).alias("w"),
    )
    l = adj.select(F.col("u").alias("a"), F.col("v").alias("z"), "w")
    r = adj.select(F.col("u").alias("b"), F.col("v").alias("z"))
    pairs = (
        l.join(r, "z")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("n_common"),
            F.sum(F.col("w").cast("decimal(28,9)")).alias("__ra"),
        )
    )
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("__da"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("__db"))
    out = pairs.join(F.broadcast(da), "a").join(F.broadcast(db), "b")
    return out.select(
        "a",
        "b",
        F.col("n_common").cast("long").alias("n_common"),
        F.round(
            F.col("n_common").cast("double")
            / (F.col("__da") + F.col("__db") - F.col("n_common")).cast(
                "double"
            ),
            6,
        ).alias("jaccard"),
        (F.col("__da").cast("long") * F.col("__db")).alias("pref_attach"),
        F.round(F.col("__ra").cast("double"), 6).alias("res_alloc"),
    )


def clustering_coefficient(
    edges: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Global clustering coefficient (transitivity): C = 3 * triangles
    / wedges, with wedges = sum_v deg(v)(deg(v)-1)/2 over the
    canonicalized simple graph — the one-number answer to "is this
    interaction graph clumpy or star-like", complementing the
    per-node [[q_triangle_count]].  Output — ONE row: ``(n_nodes,
    n_edges, n_triangles, n_wedges, transitivity)`` (ROUND 6; NULL
    when the graph has no wedge).

    Scale posture: triangles ride triangle_count's degree-ordered
    orientation (Σ min-degree² bound); wedges are one degree
    collapse."""
    canon = (
        edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("u"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    tri = triangle_count(canon, "u", "v").agg(
        (F.coalesce(F.sum("n_triangles"), F.lit(0)) / F.lit(3))
        .cast("long")
        .alias("n_triangles")
    )
    both = canon.select(F.col("u").alias("n")).unionByName(
        canon.select(F.col("v").alias("n"))
    )
    degs = both.groupBy("n").agg(F.count("*").alias("deg"))
    stats = degs.agg(
        F.count("*").alias("n_nodes"),
        (F.sum("deg") / F.lit(2)).cast("long").alias("n_edges"),
        (
            F.sum(
                (F.col("deg") * (F.col("deg") - 1)).cast("decimal(38,0)")
            )
            / F.lit(2)
        )
        .cast("long")
        .alias("n_wedges"),
    )
    j = stats.join(F.broadcast(tri), F.lit(True))
    return j.select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        "n_edges",
        "n_triangles",
        "n_wedges",
        F.when(
            F.col("n_wedges") > 0,
            F.round(
                F.lit(3.0)
                * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double"),
                6,
            ),
        ).alias("transitivity"),
    )


def degree_assortativity(
    edges: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Degree assortativity (Newman 2002): the Pearson correlation of
    endpoint degrees over every edge counted in BOTH directions —
    positive = hubs link hubs (social), negative = hubs link leaves
    (infrastructure/bot fans).  Output — ONE row: ``(n_edges,
    assortativity)`` (ROUND 6; NULL when either marginal is
    degenerate).

    Scale posture: one degree collapse, two broadcast degree
    attaches, decimal moment sums (integer degrees — exact)."""
    canon = (
        edges.select(
            F.least(F.col(a_col), F.col(b_col)).alias("u"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    both = canon.select(F.col("u").alias("n")).unionByName(
        canon.select(F.col("v").alias("n"))
    )
    deg = both.groupBy("n").agg(F.count("*").alias("deg"))
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("__du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("__dv"))
    ends = canon.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    # both directions: (du, dv) and (dv, du)
    xy = ends.select(
        F.col("__du").alias("x"), F.col("__dv").alias("y")
    ).unionAll(
        ends.select(F.col("__dv").alias("x"), F.col("__du").alias("y"))
    )
    mom = xy.agg(
        F.count("*").alias("m"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias(
            "sxy"
        ),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias(
            "sxx"
        ),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias(
            "syy"
        ),
    )
    md = F.col("m").cast("double")
    num = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double") / md
    vx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double") / md
    vy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double") / md
    return mom.select(
        (F.col("m") / F.lit(2)).cast("long").alias("n_edges"),
        F.when(
            (vx > 0) & (vy > 0), F.round(num / F.sqrt(vx * vy), 6)
        ).alias("assortativity"),
    )


def hits(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_scores: bool = False,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over a directed edge
    list, L1-normalized per half-step: a good HUB points at good
    authorities (h(u) = Σ_{u→v} a(v)), a good AUTHORITY is pointed at
    by good hubs (a(v) = Σ_{u→v} h(u)) — the second classic
    link-analysis fixpoint next to [[q_pagerank]] (PageRank scores
    endorsement flow; HITS separates the CITING role from the CITED
    role, which is what link-based source triage wants).  Output:
    ``(node, hub, authority)`` (ROUND 12 after every normalization,
    so the unrolled SQL oracle walks the identical fp sequence).

    Scale posture: per half-step ONE score-edge equi-join keyed on the
    node and ONE groupBy collapse (the Pregel partitioning, same as
    pagerank); normalization totals are annotated 1-row broadcast
    crosses; each round localCheckpoints (lazily — six eager
    materialization jobs cost more than the fan-out they prevent at
    3 iterations) so the recurrence does not fan the lazy plan
    2^iterations wide.  ``broadcast_scores=True`` ships the score
    vector to the edge partitions (pagerank's broadcast_ranks twin) —
    the right plan when |nodes| is dimension-sized; leave False for
    web-scale graphs where the score vector must hash-partition
    alongside the edges."""
    e = edges.select(
        F.col(src_col).alias("__s"), F.col(dst_col).alias("__d")
    ).distinct()
    if broadcast_scores:
        # |nodes| declared dimension-sized: run every half-step in ONE
        # applyInPandas task over the distinct edge table, mirroring
        # the in-plan ROUND(12)/DECIMAL(28,12) sequence exactly (module
        # helper block; bit-identity pinned by
        # test_hits_broadcast_path_matches_shuffle_path).
        return _hits_single_task(e, iterations)
    e = e.persist()
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionByName(e.select(F.col("__d").alias("node")))
        .distinct()
        .persist()
    )
    n_total = nodes.agg(F.count("*").cast("double").alias("__n"))
    auth = nodes.join(F.broadcast(n_total)).select(
        "node", F.round(F.lit(1.0) / F.col("__n"), 12).alias("score")
    )
    hub = None
    prev_hub = None
    auth_is_ck = False  # the initial auth is a plain plan, not a checkpoint
    for _ in range(iterations):
        a_side = F.broadcast(auth) if broadcast_scores else auth
        h_raw = (
            e.join(a_side, e["__d"] == a_side["node"])
            .groupBy(F.col("__s").alias("node"))
            .agg(
                F.sum(
                    F.col("score").cast("decimal(28,12)")
                ).cast("double").alias("__raw")
            )
        )
        h_tot = h_raw.agg(
            F.sum(F.col("__raw").cast("decimal(28,12)"))
            .cast("double")
            .alias("__t")
        )
        hub = (
            nodes.join(h_raw, "node", "left")
            .join(F.broadcast(h_tot))
            .select(
                "node",
                F.coalesce(
                    F.round(F.col("__raw") / F.col("__t"), 12),
                    F.lit(0.0),
                ).alias("score"),
            )
            .localCheckpoint(eager=True)
        )
        # the eager hub job above just materialized last round's (lazy)
        # auth checkpoint and consumed it — and last round's hub was
        # consumed producing that auth.  Free both now so live
        # checkpoints stay O(1) across iterations instead of 2 per
        # round.  (The initial auth is an unpersisted plain plan whose
        # lineage reaches the persisted e/nodes staging tables — never
        # free_blocks it, or the remaining rounds recompute them.)
        if prev_hub is not None:
            free_blocks(prev_hub)
        if auth_is_ck:
            free_blocks(auth)
        prev_hub = hub
        h_side = F.broadcast(hub) if broadcast_scores else hub
        a_raw = (
            e.join(h_side, e["__s"] == h_side["node"])
            .groupBy(F.col("__d").alias("node"))
            .agg(
                F.sum(
                    F.col("score").cast("decimal(28,12)")
                ).cast("double").alias("__raw")
            )
        )
        a_tot = a_raw.agg(
            F.sum(F.col("__raw").cast("decimal(28,12)"))
            .cast("double")
            .alias("__t")
        )
        auth = (
            nodes.join(a_raw, "node", "left")
            .join(F.broadcast(a_tot))
            .select(
                "node",
                F.coalesce(
                    F.round(F.col("__raw") / F.col("__t"), 12),
                    F.lit(0.0),
                ).alias("score"),
            )
            .localCheckpoint(eager=False)
        )
        auth_is_ck = True
    return (
        hub.withColumnRenamed("score", "hub")
        .join(
            auth.withColumnRenamed("score", "authority"), "node"
        )
        .select(
            "node",
            F.round(F.col("hub"), 6).alias("hub"),
            F.round(F.col("authority"), 6).alias("authority"),
        )
    )


def _ieee_div(a: float, b: float) -> float:
    """JVM double division (0/0 = NaN, x/0 = signed Inf) — Python's
    ``/`` raises on zero instead."""
    if b != 0.0:
        return a / b
    if a == 0.0 or a != a:
        return float("nan")
    return math.copysign(math.inf, a) * math.copysign(1.0, b)


def _hits_single_task(e: DataFrame, iterations: int) -> DataFrame:
    """All HITS half-steps in one task over the distinct edge table,
    walking the in-plan ROUND(12)/DECIMAL(28,12) sequence exactly (see
    the module helper block)."""
    node_t = e.schema["__s"].dataType
    out_schema = StructType(
        [
            StructField("node", node_t),
            StructField("hub", DoubleType()),
            StructField("authority", DoubleType()),
        ]
    )
    iters = int(iterations)

    def run(pdf):
        import pandas as pd

        srcs = pdf["__s"].tolist()
        dsts = pdf["__d"].tolist()
        nodes = set(srcs) | set(dsts)
        n = float(len(nodes))
        a0 = _jround(1.0 / n, 12)
        auth = {v: a0 for v in nodes}
        hub: dict = {}
        zero = Decimal(0)

        def half_step(score_of_far_end, key_pairs):
            # raw(k) = cast-to-double of the DECIMAL(28,12) sum of the
            # far-end scores; total re-quantizes the double raws; the
            # normalized score coalesces missing raws to 0.0.
            raw: dict = {}
            for k, far in key_pairs:
                raw[k] = raw.get(k, zero) + _jdec(score_of_far_end[far], 12)
            raw_f = {k: float(v) for k, v in raw.items()}
            tot = float(
                sum((_jdec(v, 12) for v in raw_f.values()), zero)
            )
            return {
                v: (
                    _jround(_ieee_div(raw_f[v], tot), 12)
                    if v in raw_f
                    else 0.0
                )
                for v in nodes
            }

        for _ in range(iters):
            hub = half_step(auth, zip(srcs, dsts))
            auth = half_step(hub, zip(dsts, srcs))
        out = list(nodes)
        return pd.DataFrame(
            {
                "node": out,
                "hub": [_jround(hub[v], 6) for v in out],
                "authority": [_jround(auth[v], 6) for v in out],
            }
        )

    return _single_task(e, run, out_schema)
