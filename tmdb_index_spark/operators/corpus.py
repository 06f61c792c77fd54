"""Corpus cleaning: the composite training-data pipeline operator.

Chains the extension operators into the shape an LLM-data pipeline
actually runs — quality gate → language keep-list → exact dedup →
near-dup removal — producing the cleaned corpus in one lazy plan:

1. quality gate: length / word-count / stopword bounds (cheap map
   stage, prunes before anything expensive);
2. language keep-list on the declared ``lang`` column;
3. exact dedup: keep the lowest ``doc_id`` per content hash (one
   map-side-combined shuffle);
4. near-dup removal: MinHash-LSH pairs at ``jaccard_threshold``; the
   HIGHER id of each surviving pair is dropped (deterministic keeper
   rule). Transitive chains collapse to the minimum id only within
   directly-connected pairs — full connected components is a
   multi-round iteration deliberately out of scope for one pass (the
   pair list is exposed for offline CC jobs).

Ordering matters at scale: each stage shrinks the corpus the next
stage pays for; the expensive pairwise stage runs last and only over
survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tmdb_index_spark.functions.text import quality_features
from tmdb_index_spark.operators.dedup import dedup_keep_first
from tmdb_index_spark.operators.dedup_text import minhash_lsh_pairs

__all__ = ["clean_corpus"]


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 10,
    max_stopword_ratio: float = 0.9,
    langs: tuple[str, ...] | None = None,
    lang_col: str = "lang",
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """The cleaned corpus: quality-gated, language-filtered, exact- and
    near-deduplicated. Returns the surviving rows of ``df``."""
    feats = quality_features(F.col(text_col))
    gated = df.filter(
        (feats["n_words"] >= min_words)
        & (feats["stopword_ratio"] <= max_stopword_ratio)
    )
    if langs is not None:
        gated = gated.filter(F.col(lang_col).isin(*langs))

    # Exact dedup: keep lowest id per content hash.
    hashed = gated.withColumn("__h__", F.md5(F.col(text_col)))
    kept = dedup_keep_first(hashed, keys=("__h__",), order=(F.col(id_col),)).drop(
        "__h__"
    )

    # Near-dup removal among survivors: drop the higher id of each pair.
    pairs = minhash_lsh_pairs(
        kept, text_col=text_col, id_col=id_col, threshold=jaccard_threshold
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return kept.join(losers, id_col, "left_anti")
