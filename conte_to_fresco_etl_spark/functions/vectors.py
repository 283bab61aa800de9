"""Vector expressions over ``array<float|double>`` embedding columns.

Built from higher-order array functions (``zip_with`` + ``aggregate``) so
dot products and norms run JVM-side with strict left-to-right summation —
bit-identical to a sequential oracle (DuckDB ``list_dot_product`` over
``DOUBLE[]``), which is what makes exact cross-engine correctness checks
possible on floating point.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from conte_to_fresco_etl_spark.functions.core import _col


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Left-to-right double-precision dot product."""
    a, b = _as_double(_col(a)), _as_double(_col(b))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either norm is 0 (instead of NULL/NaN)."""
    num = dot(a, b)
    den = l2_norm(a) * l2_norm(b)
    return F.coalesce(F.when(den != 0, num / den), F.lit(0.0))


def random_hyperplane_signs(
    a: Column | str, planes: list[list[float]]
) -> Column:
    """LSH signature for cosine similarity: sign bit per hyperplane packed
    into a BIGINT.  ``planes`` is a deterministic (seeded) host-side list —
    broadcast as literals into the plan, no shuffle, no UDF."""
    a = _as_double(_col(a))
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        d = F.aggregate(
            F.zip_with(a, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig
