"""tmdb_index_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of ``josh/tmdb-index``
(an incremental Parquet index builder, reference at /root/reference)
on Apache Spark, plus large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Design stance (see SURVEY.md):

* DataFrame/SQL first — every operator is a lazy Catalyst plan, not an
  eager kernel call.  Predicate pushdown, column pruning and join
  strategy selection are delegated to Catalyst/AQE.
* The reference's order-dependent semantics (``maintain_order=True``
  keep-last dedup, positional slicing) are re-keyed on the dense ``id``
  invariant: explicit precedence columns + window functions instead of
  physical row order.
* Driver-side I/O (the TMDB HTTP feeds) stays behind a ``Fetcher``
  interface; fetched batches enter the plan via ``createDataFrame``.
"""

from tmdb_index_spark.session import get_spark
from tmdb_index_spark.operators.upsert import (
    align_id_col,
    ordered_union_schema,
    update_or_append,
    validate_id,
)
from tmdb_index_spark.operators.dedup import (
    dedup_keep_first,
    dedup_keep_last,
    duplicate_ids,
)
from tmdb_index_spark.operators.diff import change_summary
from tmdb_index_spark.operators.stats import compute_stats
from tmdb_index_spark.operators.selection import (
    select_backfill_candidates,
    select_refresh_candidates,
    select_stale_candidates,
)

__all__ = [
    "get_spark",
    "align_id_col",
    "ordered_union_schema",
    "update_or_append",
    "validate_id",
    "dedup_keep_first",
    "dedup_keep_last",
    "duplicate_ids",
    "change_summary",
    "compute_stats",
    "select_backfill_candidates",
    "select_refresh_candidates",
    "select_stale_candidates",
]
