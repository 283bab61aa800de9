"""Probabilistic record linkage (entity resolution) — Fellegi-Sunter
match scoring over blocked candidate pairs.

The blocking side of ER already exists in this engine (sorted-
neighborhood ``dedup.snm_candidate_pairs``, MinHash LSH, exact keys);
this module adds the SCORING side: per-field agreement weights
``log2(m/u)`` / ``log2((1-m)/(1-u))`` summed into a pair match score,
with the u-probabilities (chance agreement between NON-matches)
estimated from the data itself — ``u = sum(freq^2) / n^2``, the
probability two random records agree on the field — and the
m-probabilities (agreement among true matches) supplied as documented
priors, the standard unsupervised FS setup.

Scale shape: u-estimation is one tiny aggregation per field (each a
1-row broadcast into the pair plan); pair generation is a block-keyed
self-join (never all-pairs — choose block keys so the largest block is
bounded, or feed SNM windows in); scoring is a codegen'd projection.
Weights are rounded to 12 decimals and summed in DECIMAL so the score
is order-independent and cross-engine exact.
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldComparison:
    """One FS field comparison: records agree when ``expr`` values are
    equal (null-safe equality; two NULLs agree).  ``m`` is the prior
    P(agree | same entity)."""

    name: str
    expr: Column
    m: float


#: u-probability clamp: keeps both weight logs finite when a field is
#: constant (u=1) or all-distinct at tiny n (u~0).
U_FLOOR = 1e-9


def _u_probability(df: DataFrame, field: FieldComparison) -> DataFrame:
    """1-row frame (u_<name>): P(two random records agree) =
    sum(freq^2)/n^2 over the field's value distribution, clamped to
    [U_FLOOR, 1 - U_FLOOR].  NULL is treated as a regular value (two
    missing fields 'agree'), matching the null-safe pair comparison."""
    freqs = df.groupBy(field.expr.alias("v")).agg(F.count("*").alias("c"))
    return freqs.agg(
        F.least(
            F.greatest(
                (F.sum(F.col("c") * F.col("c")).cast("double"))
                / (F.sum("c").cast("double") * F.sum("c").cast("double")),
                F.lit(U_FLOOR),
            ),
            F.lit(1.0 - U_FLOOR),
        ).alias(f"u_{field.name}")
    )


def snm_window_pairs(
    df: DataFrame,
    id_col: str,
    key: Column,
    window: int = 3,
    part_len: int = 2,
    passes: int = 1,
) -> DataFrame:
    """Sorted-neighborhood candidate pairs ``(id_a, id_b)`` over an
    arbitrary sort-key expression: records sort by ``key`` and each
    pairs with its ``window-1`` successors — the classic SNM blocking
    generator, exposed here so the linkage SCORERS (Fellegi-Sunter,
    Jaro-Winkler) can consume a candidate stream whose size is
    n·(window−1), LINEAR in the corpus, instead of a fixed-cardinality
    equality block whose Σ block² pair count grows quadratically.

    Scale posture: the sort is PARTITIONED by the key's ``part_len``-
    char prefix (never one global sort task); pairs straddling a
    partition boundary are the classic SNM blind spot, remedied the
    standard way by ``passes > 1``: pass p re-sorts under the key
    ROTATED left by ``floor(len·p/passes)`` characters (a pair split
    by one pass's prefix boundary shares a prefix under a rotation
    that starts inside their common substring), and the union of all
    passes' candidates is deduplicated.  Candidate volume is
    ``passes · n·(window−1)`` — still linear.  Output ids are
    least/greatest-normalized; within one pass no pair appears twice
    because the (key, id) order is total, and across passes the
    ``distinct`` removes re-discoveries."""

    def one_pass(k_expr: Column) -> DataFrame:
        keyed = df.select(
            F.col(id_col).alias("id"), k_expr.alias("k")
        ).withColumn("pblk", F.substring(F.col("k"), 1, part_len))
        w = Window.partitionBy("pblk").orderBy("k", "id")
        led = keyed.select(
            "id",
            *[
                F.lead("id", o).over(w).alias(f"n{o}")
                for o in range(1, window)
            ],
        )
        cand = None
        for o in range(1, window):
            p = led.select(
                F.least(F.col("id"), F.col(f"n{o}")).alias("id_a"),
                F.greatest(F.col("id"), F.col(f"n{o}")).alias("id_b"),
            ).filter(F.col(f"n{o}").isNotNull())
            cand = p if cand is None else cand.unionAll(p)
        return cand

    out = None
    for p in range(int(passes)):
        if p == 0:
            kp = key
        else:
            # rotate left by floor(len·p/passes): both engines divide
            # in double and floor, so the oracle mirrors this exactly
            off = F.floor(
                F.length(key) * F.lit(p) / F.lit(int(passes))
            ).cast("int")
            kp = F.concat(
                key.substr(off + F.lit(1), F.length(key)),
                key.substr(F.lit(1), off),
            )
        c = one_pass(kp)
        out = c if out is None else out.unionAll(c)
    return out if int(passes) == 1 else out.distinct()


def fellegi_sunter_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    fields: list[FieldComparison],
    top_k: int | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Score all within-block record pairs: (id_a, id_b,
    agree_<field>..., score) with score = sum of per-field FS weights,
    optionally keeping only the ``top_k`` highest-scoring pairs
    (rounded-score desc, then ids — deterministic).

    Candidate generation: pass ``candidates`` — an (id_a, id_b) frame
    from ``snm_window_pairs`` / LSH banding — and the pair stream is
    two id-keyed equi-joins against the narrow field projection,
    bounded by the candidate count (linear for SNM).  Without
    ``candidates``, blocks join on ``block_cols`` equality with
    ``id_a < id_b``; at 100 TB that key must bound the largest block
    (compose with SNM or LSH blocking when no natural bounded key
    exists) — the self-join shuffles block-partitioned slices, never
    the cross product of the table."""
    # One 1-row weight frame for ALL fields: each field's u-aggregate
    # 1-row frame crosses into a single row carrying the PRE-COMPUTED
    # agree/disagree weights, so the pair stream is crossed ONCE and
    # the per-pair work is a CASE + decimal add (the original form ran
    # four sequential 1-row BNLJ passes over the pair stream and
    # re-evaluated log2 per pair: measured 13.5s -> see bench).
    weights = None
    for f in fields:
        uf = _u_probability(df, f)
        u = F.col(f"u_{f.name}")
        uf = uf.select(
            F.round(F.log2(F.lit(f.m) / u), 12)
            .cast("decimal(28,12)")
            .alias(f"wa_{f.name}"),
            F.round(F.log2(F.lit(1.0 - f.m) / (F.lit(1.0) - u)), 12)
            .cast("decimal(28,12)")
            .alias(f"wd_{f.name}"),
        )
        weights = uf if weights is None else weights.crossJoin(uf)
    cols = [F.col(id_col), *[F.col(c) for c in block_cols]]
    cols += [f.expr.alias(f"f_{f.name}") for f in fields]
    narrow = df.select(*cols)
    a, b = narrow.alias("a"), narrow.alias("b")
    if candidates is not None:
        pairs = (
            candidates.join(a, F.col("id_a") == F.col(f"a.{id_col}"))
            .join(b, F.col("id_b") == F.col(f"b.{id_col}"))
            .crossJoin(F.broadcast(weights))
        )
    else:
        cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        for c in block_cols:
            cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
        pairs = a.join(b, cond).crossJoin(F.broadcast(weights))

    agree_cols = {
        f.name: F.col(f"a.f_{f.name}").eqNullSafe(F.col(f"b.f_{f.name}"))
        for f in fields
    }
    contribs = [
        F.when(agree_cols[f.name], F.col(f"wa_{f.name}")).otherwise(
            F.col(f"wd_{f.name}")
        )
        for f in fields
    ]
    score_dec = contribs[0]
    for c in contribs[1:]:
        score_dec = score_dec + c
    out = pairs.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        *[agree_cols[f.name].alias(f"agree_{f.name}") for f in fields],
        F.round(score_dec.cast("double"), 6).alias("score"),
    )
    if top_k is not None:
        out = out.orderBy(
            F.col("score").desc(), F.col("id_a"), F.col("id_b")
        ).limit(top_k)
    return out


def jaro_winkler(
    s1: str,
    s2: str,
    prefix_scale: float = 0.1,
    boost_threshold: float = 0.7,
) -> float:
    """Textbook Jaro-Winkler similarity (matching window
    ``max(|a|,|b|)//2 - 1``, half-mismatch transpositions, prefix boost
    up to 4 chars applied only above the 0.7 Jaro threshold) — the
    same convention DuckDB's ``jaro_winkler_similarity`` implements,
    which is exactly what makes the catalog gate an INDEPENDENT oracle
    rather than a mirror: two separately-written implementations must
    agree to 6 decimals on every blocked pair."""
    la, lb = len(s1), len(s2)
    if la == 0 or lb == 0:
        return 0.0  # two empties are 0.0 (DuckDB convention), not 1.0
    if s1 == s2:
        return 1.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    matched1 = [False] * la
    matched2 = [False] * lb
    m = 0
    for i, c in enumerate(s1):
        lo = i - window if i > window else 0
        hi = i + window + 1
        if hi > lb:
            hi = lb
        for j in range(lo, hi):
            if not matched2[j] and s2[j] == c:
                matched1[i] = True
                matched2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if matched1[i]:
            while not matched2[j]:
                j += 1
            if s1[i] != s2[j]:
                t += 1
            j += 1
    # transposition count floors the half (DuckDB/C++ convention;
    # the float-half variant diverges on odd mismatch counts)
    jaro = (m / la + m / lb + (m - t // 2) / m) / 3.0
    if jaro > boost_threshold:
        p = 0
        for a, b in zip(s1, s2):
            if a != b or p == 4:
                break
            p += 1
        jaro += p * prefix_scale * (1.0 - jaro)
    return jaro


def jaro_winkler_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str] | None = None,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Blocked pairwise Jaro-Winkler scoring — the fuzzy-string field
    comparator record linkage runs where exact/equality agreement
    (``fellegi_sunter_pairs``) is too brittle and token sets
    (``tfidf_cosine_pairs``) too coarse: typo'd names, transposed
    words, shared prefixes.

    Scale posture: candidate pairs come either from ``candidates``
    (an (id_a, id_b) frame, e.g. ``snm_window_pairs`` — n·(w−1)
    candidates, LINEAR in the corpus, and the natural pairing for a
    prefix-boosted metric: prefix-sorted neighbors) or from an
    EQUI-self-join on ``block_cols`` (where a natural key bounds the
    largest block — Σ block² bounds the join); the JW kernel is a
    per-pair string scan with no DataFrame-expression form, so it
    runs as an Arrow-batched pandas UDF map-side over the joined
    pairs — no extra shuffle, and the Python cost is proportional to
    SURVIVING candidates, not the corpus.  The threshold filters on
    the ROUND(6) score so membership is engine-stable.

    Output: ``(*block_cols, key_a, key_b, jw)`` with ``key_a <
    key_b`` inside each block; the candidates path emits
    ``(key_a, key_b, jw)``."""
    @F.pandas_udf("double")
    def _jw(sa: pd.Series, sb: pd.Series) -> pd.Series:
        return pd.Series(
            [jaro_winkler(x, y) for x, y in zip(sa, sb)],
            dtype="float64",
        )

    block_cols = block_cols or []
    base = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("k"),
        F.col(text_col).alias("s"),
    ).filter(F.col("k").isNotNull() & F.col("s").isNotNull())
    a, b = base.alias("a"), base.alias("b")
    if candidates is not None:
        pairs = (
            candidates.join(a, F.col("id_a") == F.col("a.k"))
            .join(b, F.col("id_b") == F.col("b.k"))
            .select(
                F.col("a.k").alias("key_a"),
                F.col("b.k").alias("key_b"),
                F.round(_jw(F.col("a.s"), F.col("b.s")), 6).alias("jw"),
            )
        )
    else:
        cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
        pairs = a.join(b, cond + [F.col("a.k") < F.col("b.k")]).select(
            *[F.col(f"a.{c}").alias(c) for c in block_cols],
            F.col("a.k").alias("key_a"),
            F.col("b.k").alias("key_b"),
            F.round(_jw(F.col("a.s"), F.col("b.s")), 6).alias("jw"),
        )
    return pairs.filter(F.col("jw") >= F.lit(float(threshold)))
