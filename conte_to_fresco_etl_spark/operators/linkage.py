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

from pyspark.sql import Column, DataFrame
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


def fellegi_sunter_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    fields: list[FieldComparison],
    top_k: int | None = None,
) -> DataFrame:
    """Score all within-block record pairs: (id_a, id_b,
    agree_<field>..., score) with score = sum of per-field FS weights,
    optionally keeping only the ``top_k`` highest-scoring pairs
    (rounded-score desc, then ids — deterministic).

    Blocks join on ``block_cols`` equality with ``id_a < id_b``; at
    100 TB the block key must bound the largest block (compose with
    SNM or LSH blocking when no natural bounded key exists) — the
    self-join shuffles block-partitioned slices, never the cross
    product of the table."""
    u_frames = [_u_probability(df, f) for f in fields]
    cols = [F.col(id_col), *[F.col(c) for c in block_cols]]
    cols += [f.expr.alias(f"f_{f.name}") for f in fields]
    narrow = df.select(*cols)
    a, b = narrow.alias("a"), narrow.alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    pairs = a.join(b, cond)
    for uf in u_frames:
        pairs = pairs.crossJoin(F.broadcast(uf))

    agree_cols = {
        f.name: F.col(f"a.f_{f.name}").eqNullSafe(F.col(f"b.f_{f.name}"))
        for f in fields
    }
    contribs = []
    for f in fields:
        u = F.col(f"u_{f.name}")
        w_agree = F.round(F.log2(F.lit(f.m) / u), 12)
        w_disagree = F.round(
            F.log2(F.lit(1.0 - f.m) / (F.lit(1.0) - u)), 12
        )
        contribs.append(
            F.when(agree_cols[f.name], w_agree)
            .otherwise(w_disagree)
            .cast("decimal(28,12)")
        )
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
