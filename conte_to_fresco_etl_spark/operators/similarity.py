"""Similarity search over embedding columns (``array<float>``).

  * brute_force_topk — exact cosine top-k: broadcast the (small) query
    set against the corpus, window-rank per query.  The correctness
    baseline and the right plan whenever |queries| is small: corpus never
    shuffles, one pass, map-side ranking via AQE.
  * lsh_topk — random-hyperplane LSH bucketing: corpus and queries hash
    to sign-bit signatures; candidates share a band; exact cosine + rank
    within candidates.  The 100 TB path: the corpus-side join key is a
    small int, so the pair space shrinks by ~2^bits/band before any
    distance math.  Approximate (recall < 1) — benchmark against
    brute_force_topk.

Determinism: hyperplanes come from a seeded NumPy generator on the
driver and enter the plan as literals; ranking breaks ties by id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from conte_to_fresco_etl_spark.functions.vectors import (
    cosine_similarity,
    dot,
    l2_norm,
    random_hyperplane_signs,
)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Returns (query_id, neighbor_id, cosine, rank).  Cosine is rounded to
    6 decimals BEFORE ranking so ordering is reproducible across engines;
    ties break by neighbor id ascending.  Self-matches are excluded when
    query ids live in the same id space as the corpus.
    """
    qid = query_id_col or id_col
    q = queries.select(
        F.col(qid).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    den = F.col("__qn") * F.col("__cn")
    cos = F.round(
        F.coalesce(F.when(den != 0, dot("__qv", "__cv") / den), F.lit(0.0)), 6
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def make_hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Signature = ``n_planes`` sign bits; split into ``bands`` bands;
    candidate = shares >= 1 band with the query.  Then exact cosine +
    rank within candidates only.
    """
    planes = make_hyperplanes(dim, n_planes, seed)
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1

    def with_bands(df: DataFrame, idc: str, out_id: str, out_vec: str) -> DataFrame:
        sig = random_hyperplane_signs(F.col(vec_col), planes)
        band_structs = F.array(
            *[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright(sig, bits_per_band * i)
                    .bitwiseAND(F.lit(mask))
                    .alias("key"),
                )
                for i in range(bands)
            ]
        )
        return df.select(
            F.col(idc).alias(out_id),
            F.col(vec_col).alias(out_vec),
            F.explode(band_structs).alias("b"),
        )

    c = with_bands(corpus, id_col, "neighbor_id", "__cv")
    q = with_bands(queries, id_col, "query_id", "__qv")
    cand = (
        c.join(
            F.broadcast(q),
            (c["b.band"] == q["b.band"]) & (c["b.key"] == q["b.key"])
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id", "__qv", "__cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qn, cn = l2_norm("__qv"), l2_norm("__cv")
    den = qn * cn
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(
            F.coalesce(F.when(den != 0, dot("__qv", "__cv") / den), F.lit(0.0)),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
