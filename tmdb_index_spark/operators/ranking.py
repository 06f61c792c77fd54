"""Corpus term-weighting: TF-IDF and BM25 (north-star text analysis).

The reference has no text-ranking surface (its text handling stops at
regex id extraction — ``/root/reference/tmdb_index.py:430-440``); these
are the training-data-pipeline additions: per-doc salient terms
(TF-IDF) and ranked retrieval (BM25) over the ``documents`` table.

Spark-first design notes:

* tokenization is a single vectorized ``regexp_extract_all`` (JVM
  codegen) — no Python in the hot path;
* document frequency is a small relation (vocabulary-sized) and is
  broadcast back onto the term-frequency rows — no second shuffle of
  the big side. The broadcast is GUARDED, not assumed (round 12): a
  clean word vocabulary stays well under the 10M-row cap at any
  corpus scale, but noisy web corpora (typos, IDs, shingle
  vocabularies) can exceed it, so ``tfidf_top_terms`` measures the
  dfreq count and falls back to a plan-asserted shuffle-hash join
  above ``vocab_broadcast_max``.
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

from tmdb_index_spark.operators.materialize import pin_frame
from tmdb_index_spark.operators.partitioning import widen_small_scan

_WORD_RE = "[a-z0-9]+"


def term_frequencies(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(id, term, tf)`` — lowercase word terms and their per-doc counts."""
    # Widen first: single-row-group corpora scan as one task, and the
    # regex tokenize + explode is the hot per-row stage (no-op at
    # production scan widths — operators/partitioning.py).
    toks = widen_small_scan(docs.select(id_col, text_col)).select(
        id_col,
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_WORD_RE), 0)
        ).alias("term"),
    )
    return toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


#: vocabulary rows above which the per-term document-frequency
#: relation stops being broadcast: a clean word vocabulary stays well
#: under this at any corpus scale, but raw web-scale corpora can blow
#: past 10M distinct "words" on typo/ID noise, and a forced broadcast
#: then dies on the driver/broadcast limit exactly like the
#: salted-join bug the round-11 stress program caught.
VOCAB_BROADCAST_MAX = 10_000_000


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    materialize: str = "cache",
    scratch_dir: str | None = None,
    vocab_broadcast_max: int = VOCAB_BROADCAST_MAX,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    ``tfidf = tf · ln(N / df)``, rounded to 4 decimals; rank is
    ``row_number`` over (tfidf desc, term asc) so ties are
    deterministic. Returns ``(id, term, tf, tfidf, rank)``.

    Document frequency is aggregated per term (a vocabulary-sized
    relation) and joined back onto the term-frequency rows. A window
    count partitioned by ``term`` would funnel every tf row of a
    stopword through one task (a hot-key scale-killer at 100 TB), so
    the join is the design either way; the JOIN STRATEGY is guarded:
    the dfreq side is BROADCAST while its measured row count is ≤
    ``vocab_broadcast_max`` and falls back to a plan-asserted
    shuffle-hash join above it (dfreq is uniform per-term rows — no
    hot keys — so the fallback shuffles cleanly; only the broadcast
    assumption, not the plan shape, was the hazard). Only dfreq — the
    vocabulary-sized relation — is pinned (it feeds the guard's count
    and the broadcast build). The corpus-sized ``(id, term, tf)``
    frame is deliberately NOT pinned: its two consumers each run the
    tokenize+aggregate pass, which measures faster than a pinned
    single pass at bench scale (the cache store + materialization
    barrier costs more than the duplicated map work — the
    simhash-pin lesson) and is the safe direction at 100 TB, where a
    corpus-sized cache is itself the memory hazard while the second
    pass is an embarrassingly parallel map+shuffle.
    """
    tf = term_frequencies(docs, text_col, id_col)
    dfreq = pin_frame(
        tf.groupBy("term").agg(F.count(F.lit(1)).alias("df")),
        materialize,
        scratch_dir,
    )
    n_vocab = dfreq.count()
    if n_vocab <= vocab_broadcast_max:
        df_side = F.broadcast(dfreq)
    else:
        import warnings

        warnings.warn(
            f"tfidf_top_terms: vocabulary has {n_vocab:,} terms "
            f"(> broadcast cap {vocab_broadcast_max:,}) — falling back "
            "to a shuffle-hash join for the document-frequency side",
            stacklevel=2,
        )
        df_side = dfreq.hint("shuffle_hash")
    # N as a literal when the input is a bare parquet scan (footer
    # count, exact by construction — operators/partitioning, the
    # round-14 metadata_scan_rowcount pattern): drops the 1-row count
    # aggregate + its broadcast-exchange job and one corpus scan from
    # the plan. long/long division and lit(int)/long produce the same
    # double, so tfidf values are bit-identical; non-bare inputs keep
    # the aggregate.
    from tmdb_index_spark.operators.partitioning import (
        metadata_scan_rowcount,
    )

    n_exact = metadata_scan_rowcount(docs)
    scored = tf.join(df_side, "term")
    if n_exact is not None:
        n_col = F.lit(n_exact)
    else:
        scored = scored.crossJoin(
            F.broadcast(docs.agg(F.count(F.lit(1)).alias("n_docs")))
        )
        n_col = F.col("n_docs")
    scored = (
        scored
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(n_col / F.col("df")), 4),
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
    materialize: str = "cache",
    scratch_dir: str | None = None,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under BM25.

    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` (Robertson-Sparck
    Jones, the Lucene form — always positive), and per-term
    ``score = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``
    summed over query terms, rounded to 4 decimals before ranking.
    Returns ``(id, score, rank)``.

    The round-2 plan audit showed four full tokenize+shuffle passes of
    the corpus (the term-frequency subtree fed document lengths, corpus
    scalars, query-term rows, and document frequencies separately).
    Query terms are a tiny LITERAL list, so per-term frequencies fold
    into ONE per-doc conditional aggregation instead of a generic
    (doc, term) relation: tokenize → explode → ``groupBy(doc)`` with
    ``dl = count(*)`` and one ``sum(term = t)`` per query term — a
    single corpus pass and a single map-side-combined shuffle keyed by
    doc id, all inside codegen. The per-doc frame (|docs| rows, 1+|q|
    columns) is pinned and feeds just two consumers: a 1-row broadcast
    aggregate carrying N / avgdl / every per-term df, and the flat
    scoring expression. Docs containing no query term are filtered
    before ranking (same result set as the old qterms join).
    """
    terms = list(dict.fromkeys(query_terms))
    if not terms:
        # An empty query matches nothing; the per-term column expansion
        # below would otherwise index parts[0] out of range.
        id_type = docs.schema[id_col].dataType.simpleString()
        return docs.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, score double, rank long"
        )
    # Widen first: single-row-group corpora scan as one task, and the
    # regex tokenize + explode is the hot per-row stage (no-op at
    # production scan widths — operators/partitioning.py).
    toks = widen_small_scan(docs.select(id_col, text_col)).select(
        id_col,
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_WORD_RE), 0)
        ).alias("term"),
    )
    per_doc = pin_frame(
        toks.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("dl"),
            *[
                F.sum((F.col("term") == F.lit(t)).cast("long")).alias(f"__tf{i}__")
                for i, t in enumerate(terms)
            ],
        ),
        materialize,
        scratch_dir,
    )
    scalars = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum((F.col(f"__tf{i}__") > 0).cast("long")).alias(f"__df{i}__")
            for i in range(len(terms))
        ],
    )
    parts = []
    for i in range(len(terms)):
        tf = F.col(f"__tf{i}__")
        dfq = F.col(f"__df{i}__")
        idf = F.log(
            1.0 + (F.col("n_docs") - dfq + 0.5) / (dfq + 0.5)
        )
        parts.append(
            idf
            * (tf * (k1 + 1.0))
            / (tf + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
        )
    score = parts[0]
    for p in parts[1:]:
        score = score + p
    hit = F.col("__tf0__") > 0
    for i in range(1, len(terms)):
        hit = hit | (F.col(f"__tf{i}__") > 0)
    totals = (
        per_doc.crossJoin(F.broadcast(scalars))
        .filter(hit)
        .select(id_col, F.round(score, 4).alias("score"))
    )
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (
        totals.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "score", F.col("rank").cast("long").alias("rank"))
    )


def rrf_fuse(
    legs: dict[str, DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09) of
    independently ranked retrieval legs: ``score(d) = Σ_leg
    1/(k + rank_leg(d))``, the standard hybrid-search combiner for
    BM25 + vector legs. Rank-based, so the legs' incomparable score
    scales never need calibration; ``k`` = 60 is the paper constant.

    Input: ``{leg_name: frame}`` where each frame carries
    (``id_col``, ``rank_col``). Output: one row per doc appearing in
    ANY leg, with ``rrf_score`` plus one nullable ``<leg>_rank``
    column per leg (absent-from-leg contributes nothing).

    Cross-engine exactness: each term is one correctly-rounded IEEE
    division and the per-doc sum adds ≤ |legs| doubles; with the
    legs' own ranks deterministic, the fused ordering is bit-stable
    (ties break on id downstream). Scale: legs are top-k frames —
    tiny; the union + one groupBy on id is the entire cost, and
    fusing 4 legs of k=1000 over a billion-doc corpus moves 4000
    rows. The heavy lifting stays in the legs, which is the point.
    """
    if not legs:
        raise ValueError("rrf_fuse needs at least one leg")
    if k < 0:
        raise ValueError(f"k must be non-negative, got {k}")
    tagged = None
    for name, df in legs.items():
        part = df.select(
            F.col(id_col).alias("__id__"),
            F.lit(name).alias("__leg__"),
            F.col(rank_col).cast("bigint").alias("__rank__"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    fused = tagged.groupBy("__id__").agg(
        F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("__rank__"))).alias(
            "rrf_score"
        ),
        *[
            F.max(
                F.when(F.col("__leg__") == name, F.col("__rank__"))
            ).alias(f"{name}_rank")
            for name in legs
        ],
    )
    return fused.withColumnRenamed("__id__", id_col)
