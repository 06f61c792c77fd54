"""Named query catalog: one entry per implemented operator surface.

This is the driver-facing correctness contract (``__spark_entry__.py``
re-exports it): every entry pairs a Spark DataFrame builder with an
equivalent ANSI-SQL oracle that DuckDB runs over the same parquet
tables. Column names and types are aligned on both sides because the
driver hash-compares values after sorting columns by name.

Cross-engine determinism rules used throughout:

* exact money/quantity aggregation goes through ``DECIMAL(18,2)`` —
  decimal arithmetic is exact in both engines, so sums match
  bit-for-bit; the final aggregate is cast to double for a stable
  output type.
* float reductions over arrays use a sequential left-to-right fold in
  both engines (Spark ``aggregate``, DuckDB ``list_*``), rounded to 4
  decimals before any ranking so ranks can't diverge on 1-ULP noise.
* all hashing is md5-based (:mod:`tmdb_index_spark.functions.text`
  .portable_hash60) — never ``xxhash64``/``hash`` whose values are
  engine-private.
* every integer output is cast to ``bigint``, every float to
  ``double``.

Queries tagged (SURVEY.md §2 ids) exercise the reference-derived
operator; the ``documents``/``embeddings`` queries are the north-star
LLM-pipeline extensions (SURVEY.md §7 phase 5).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tmdb_index_spark.functions.text import (
    LANG_MARKERS,
    doc_fingerprint,
    quality_features,
    token_count,
    tokens,
)
from tmdb_index_spark.operators.dedup import (
    dedup_keep_first,
    dedup_keep_last,
    duplicate_ids,
)
from tmdb_index_spark.operators.dedup_text import (
    dedup_exact,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)
from tmdb_index_spark.operators.similarity import brute_force_topk, lsh_topk
from tmdb_index_spark.operators.upsert import (
    update_or_append,
    update_or_append_join,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

__all__ = ["QUERIES", "ORACLES", "flagship"]


