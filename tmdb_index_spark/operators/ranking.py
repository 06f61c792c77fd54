"""Corpus term-weighting: TF-IDF and BM25 (north-star text analysis).

The reference has no text-ranking surface (its text handling stops at
regex id extraction — ``/root/reference/tmdb_index.py:430-440``); these
are the training-data-pipeline additions: per-doc salient terms
(TF-IDF) and ranked retrieval (BM25) over the ``documents`` table.

Spark-first design notes:

* tokenization is a single vectorized ``regexp_extract_all`` (JVM
  codegen) — no Python in the hot path;
* document frequency is a tiny relation (vocabulary-sized) and is
  broadcast back onto the term-frequency rows — no second shuffle of
  the big side. A word vocabulary stays broadcastable far past 100 TB
  of documents (~10M distinct words ≪ executor memory); if shingle
  vocabularies are ranked instead, drop the hint and let AQE pick.
* corpus-level scalars (N, avgdl) ride in via a broadcast cross join
  of a 1-row aggregate — never a driver-side ``collect``.

Cross-engine determinism: ``ln`` differs from DuckDB's by ≤1 ULP on
~2% of inputs (JVM ``Math.log`` vs libm), so every score is rounded to
4 decimals BEFORE ranking and ranks tie-break on the term / doc id.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_WORD_RE = "[a-z0-9]+"


def term_frequencies(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(id, term, tf)`` — lowercase word terms and their per-doc counts."""
    toks = docs.select(
        id_col,
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_WORD_RE), 0)
        ).alias("term"),
    )
    return toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    ``tfidf = tf · ln(N / df)``, rounded to 4 decimals; rank is
    ``row_number`` over (tfidf desc, term asc) so ties are
    deterministic. Returns ``(id, term, tf, tfidf, rank)``.
    """
    tf = term_frequencies(docs, text_col, id_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            "term",
            F.col("tf").cast("long").alias("tf"),
            "tfidf",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25.

    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` (Robertson-Sparck
    Jones, the Lucene form — always positive), and per-term
    ``score = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``
    summed over query terms, rounded to 4 decimals before ranking.
    Returns ``(id, score, rank)``.
    """
    tf = term_frequencies(docs, text_col, id_col)
    # dl = total tokens per doc; avgdl = exact integer sum / count.
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    qterms = tf.filter(F.col("term").isin(list(query_terms)))
    dfreq = qterms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        qterms.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "part",
            F.col("idf")
            * (
                (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ),
        )
    )
    totals = scored.groupBy(id_col).agg(
        F.round(F.sum("part"), 4).alias("score")
    )
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "score", F.col("rank").cast("long").alias("rank"))
    )
