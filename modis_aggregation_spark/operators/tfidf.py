"""TF-IDF term weighting over a document corpus (SURVEY §7.1 step 9).

Plain relational formulation — no ML-pipeline state, no vocabulary
broadcast, no UDFs:

    tokens explode → per-(doc, term) counts (TF)
                   → per-term document frequency (DF) via a second groupBy
                   → join + idf = ln((N + 1) / (df + 1)) + 1  (smoothed)
                   → per-doc top-k terms by tf·idf (window)

Scale notes: both aggregations are partial+final hash aggs keyed by term /
(doc, term); the DF side is ≤ |vocabulary| rows and broadcasts into the
join. The only wide shuffle is the explode's (doc, term) grouping —
unavoidable and linear in corpus token count.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from modis_aggregation_spark.functions.text import tokens


def term_frequencies(
    docs: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, tf) — raw in-document term counts."""
    staged = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(content_col)).alias("__toks")
    )
    return (
        staged.select("doc_id", F.explode("__toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tf_idf(
    docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    top_k: int | None = None,
) -> DataFrame:
    """(doc_id, term, tf, df, tfidf[, rank]) with smoothed idf.

    ``idf = ln((N + 1) / (df + 1)) + 1`` (sklearn's smooth_idf convention —
    never divides by zero, never negative). ``top_k`` keeps the k highest-
    scoring terms per document (ties broken by term for determinism).
    """
    n_docs = docs.select(id_col).distinct().count()
    tf = term_frequencies(docs, content_col, id_col)
    df_ = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + F.lit(1.0)
    scored = (
        tf.join(F.broadcast(df_), "term")
        .withColumn("tfidf", F.col("tf") * idf)
        .select("doc_id", "term", "tf", "df", "tfidf")
    )
    if top_k is None:
        return scored
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
    )


def idf_value(n_docs: int, df: int) -> float:
    """Driver-side reference of the idf formula (for tests)."""
    return math.log((n_docs + 1) / (df + 1)) + 1.0
