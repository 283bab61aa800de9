"""Document-profiling tests: the Arrow implementation must be
value-identical to the expression twin (the form the DuckDB oracle
mirrors), including tokenizer edge semantics."""

from __future__ import annotations

from conte_to_fresco_etl_spark.operators.text_analysis import (
    _expr_tokens_twin,
    profile_documents,
)


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()), key=lambda r: r[0]
    )


def test_profile_twins_match_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = _rows(profile_documents(docs, impl="arrow"))
    e = _rows(profile_documents(docs, impl="expr"))
    assert a == e


def test_profile_twins_match_on_edge_strings(spark):
    rows = [
        (0, "the quick brown fox and the lazy dog"),
        (1, ""),
        (2, "   "),                      # spaces only -> zero tokens
        (3, "\tthe tab-led text"),       # F.trim keeps the tab: Java
                                         # split yields a leading ''
        (4, "trailing newline\n"),
        (5, "!!! ??? ..."),              # punctuation soup
        (6, "café naïve résumé"),  # non-ASCII
        (7, "der die das und ist"),      # German stopwords
        (8, "a  b\t\tc"),                # mixed separator runs
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = _rows(profile_documents(docs, impl="arrow"))
    e = _rows(profile_documents(docs, impl="expr"))
    assert a == e


def test_tokens_twin_spark_split_semantics():
    # leading AND trailing empty tokens kept (trim removes spaces, not
    # tabs/newlines; Spark split uses limit=-1, unlike Java String.split)
    assert _expr_tokens_twin("\ta b") == ["", "a", "b"]
    assert _expr_tokens_twin("a b\n") == ["a", "b", ""]
    assert _expr_tokens_twin("   ") == []
    assert _expr_tokens_twin("") == []
    assert _expr_tokens_twin(" A  B ") == ["a", "b"]
