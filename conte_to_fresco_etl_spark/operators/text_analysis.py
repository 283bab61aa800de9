"""Document profiling: language ID, quality scoring, token counting,
fingerprinting — one map-side pass over a documents table.

All columns are pure expressions from functions.text (no UDFs); at
100 TB this runs as a single whole-stage-codegen projection over the
parquet scan with full column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conte_to_fresco_etl_spark.functions.text import (
    approx_bpe_count,
    doc_fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    simhash32,
    stopword_ratio,
    token_count,
)


def profile_documents(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document profile: counts, ratios, quality, language,
    fingerprints.  Ratios/scores rounded to 6 decimals for reproducible
    cross-engine comparison."""
    from conte_to_fresco_etl_spark.parallelism import ensure_min_parallelism

    # the simhash/lang-score expressions are compute-dense per row; a
    # single-row-group scan must not serialize them onto one core
    df = ensure_min_parallelism(df)
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        token_count(t).alias("n_tokens"),
        approx_bpe_count(t).alias("n_bpe_tokens"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(quality_score(t), 6).alias("quality"),
        lang_id(t).alias("lang_pred"),
        doc_fingerprint(t).alias("fingerprint"),
        simhash32(t).alias("simhash"),
    )
