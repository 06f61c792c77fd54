"""Key-dedup operators (SURVEY.md §2.5 D2/D3/D4/D6).

Polars' ``unique(keep="first"/"last", maintain_order=True)`` depends on
physical row order, which a distributed relation does not have.  Every
dedup here therefore takes an EXPLICIT order column — an arrival index,
source priority, or timestamp — and resolves winners with a
``row_number`` window.  Callers that fold ordered feeds (e.g. per-day
changes batches) attach the day index as the order column
(reference call sites: tmdb_index.py:104,214,344-348).

Scale notes: one shuffle on the key; AQE skew-join/partition-coalescing
applies.  For the 100 TB path, pre-bucketing the table by the dedup key
removes the shuffle entirely.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "dedup_keep_last",
    "dedup_keep_first",
    "dedup_extreme",
    "duplicate_ids",
    "group_set_jaccard",
]


def _dedup(
    df: DataFrame, keys: Sequence[str], order: Sequence[Column | str], desc: bool
) -> DataFrame:
    cols = [F.col(c) if isinstance(c, str) else c for c in order]
    ordering = [c.desc() for c in cols] if desc else [c.asc() for c in cols]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def dedup_keep_last(
    df: DataFrame, keys: Sequence[str] = ("id",), order: Sequence[Column | str] = ()
) -> DataFrame:
    """Keep the row with the HIGHEST ``order`` value per key (the
    reference's keep-last over arrival order, tmdb_index.py:104,214)."""
    if not order:
        raise ValueError("keep-last needs an explicit order column (arrival index)")
    return _dedup(df, keys, order, desc=True)


def dedup_keep_first(
    df: DataFrame, keys: Sequence[str] = ("id",), order: Sequence[Column | str] = ()
) -> DataFrame:
    """Keep the row with the LOWEST ``order`` value per key (the
    reference's sort-then-keep-first for export id collisions,
    tmdb_index.py:344-348)."""
    if not order:
        raise ValueError("keep-first needs an explicit order column (source priority)")
    return _dedup(df, keys, order, desc=False)


def dedup_extreme(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    mode: str = "first",
) -> DataFrame:
    """Aggregate-form keep-first / keep-last — the 100-TB twin of
    :func:`dedup_keep_first` / :func:`dedup_keep_last` when the order
    is a TOTAL, NON-NULL, ASCENDING tuple of plain columns.

    The window forms shuffle EVERY row and sort each key's partition
    by (key, order); this form takes the full row by ``MIN_BY``
    (``mode="first"``) / ``MAX_BY`` (``"last"``) of the order tuple
    as a struct — struct comparison is lexicographic over the order
    fields, so the winner is identical to the window's. The plan is a
    partially-aggregated SortAggregate (struct buffers keep it off
    the hash-agg path): the map side collapses each partition to ONE
    candidate row per key before the exchange — the shuffle ships
    |keys|·|map partitions| rows instead of every event — and the
    only sorts are per-partition by the bare group key. Measured at
    100× data: the events keep-first query 20.0 s window → 9.5 s
    min_by (``min(struct(order…, row))`` was also tried: 12.3 s —
    fatter SortAggregate buffers). Use the window forms when the
    order needs expressions, descending components, or nullable order
    values; use this when the order is total and non-null — the same
    precondition every deterministic catalog query already meets.
    Ties cannot occur under a total order; a NULL order value is the
    caller's contract violation, like the window forms' tie
    nondeterminism.
    """
    if mode not in ("first", "last"):
        raise ValueError(f"mode must be 'first' or 'last', got {mode!r}")
    if not order_cols:
        raise ValueError("dedup_extreme needs at least one order column")
    fn = F.min_by if mode == "first" else F.max_by
    agg = fn(
        F.struct(*df.columns),
        F.struct(*[F.col(c) for c in order_cols]),
    )
    return df.groupBy(*keys).agg(agg.alias("__x__")).select("__x__.*")


def duplicate_ids(df: DataFrame, key: str = "id") -> DataFrame:
    """Keys occurring more than once (reference ``duplicate_ids``,
    tmdb_index.py:327-328).  Returns a one-column DataFrame of keys;
    partial aggregation makes this map-side-combining, no window."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n__"))
        .filter(F.col("__n__") > 1)
        .select(key)
    )


def group_set_jaccard(
    df: DataFrame,
    group_col: str,
    item_col: str,
    round_to: int = 4,
) -> DataFrame:
    """Pairwise overlap between groups' DISTINCT item sets —
    audience overlap ("how many purchase users also click?"),
    cohort containment, catalog intersection. The generic form of
    `dedup_text.group_shingle_jaccard` (which feeds shingle hashes
    into exactly this shape).

    Scale shape: one distinct collapse to (group, item) — the only
    shuffle proportional to the data, partial-aggregated — then the
    inverted self-equi-join ON THE ITEM, so fan-out per item is
    (groups containing it)² ≤ |groups|², bounded by the group count,
    never by rows. Sizes attach via |groups|-row broadcast joins.
    Pairs sharing no item are absent (their overlap is 0).

    Returns ``(group_a, group_b, n_a, n_b, n_common, jaccard)`` with
    ``group_a < group_b``.
    """
    sets = df.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("__i__")
    ).distinct()
    sizes = sets.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    a = sets.select(F.col("g").alias("group_a"), "__i__")
    b = sets.select(F.col("g").alias("group_b"), "__i__")
    inter = (
        a.join(b, "__i__")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa = F.broadcast(
        sizes.select(F.col("g").alias("group_a"), F.col("sz").alias("n_a"))
    )
    sb = F.broadcast(
        sizes.select(F.col("g").alias("group_b"), F.col("sz").alias("n_b"))
    )
    return (
        inter.join(sa, "group_a")
        .join(sb, "group_b")
        .select(
            "group_a",
            "group_b",
            "n_a",
            "n_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast(
                    "double"
                ),
                round_to,
            ).alias("jaccard"),
        )
    )
