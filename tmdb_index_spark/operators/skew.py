"""Skew-safe aggregation helpers.

AQE's skew-join splitting and map-side partial aggregation neutralize
most hot-key problems for algebraic aggregates; the cases that still
melt a reducer are the NON-algebraic per-key computations — exact
distinct counts and collect-style aggregates — where one hot key's
whole value set lands on one task. These helpers restructure those into
two shuffles whose first phase spreads the hot key:

* :func:`two_phase_count_distinct` — exact distinct via
  groupBy(keys, value) → groupBy(keys): phase 1's key space is
  (key × value), so a hot key with many distinct values spreads over
  the cluster; phase 2 only counts deduped rows.
* :func:`salted_agg` — generic salt-and-merge for algebraic aggregates
  whose partial form the caller provides explicitly (sum/count/min/max);
  useful when partial aggregation is defeated (e.g. high-cardinality
  grouping under it) — the salt bounds any single task's share of a hot
  key at 1/n_salts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "two_phase_count_distinct",
    "salted_agg",
    "salted_join",
    "preagg_grouping",
    "skew_report",
]


def two_phase_count_distinct(
    df: DataFrame, keys: Sequence[str], value: str, alias: str = "n_distinct"
) -> DataFrame:
    """Exact per-key distinct count that survives hot keys: dedup on
    (keys, value) first — that shuffle spreads a hot key across as many
    tasks as it has distinct values — then count."""
    return (
        df.select(*keys, value)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(alias))
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation: ``partials`` maps output name →
    (phase-1 partial aggregate over the salted groups, phase-2 merge
    over the partials, referring to the phase-1 name). Example::

        salted_agg(df, ["k"], {
            "total": (F.sum("v"), F.sum("total")),
            "n":     (F.count(F.lit(1)), F.sum("n")),
        })

    The salt is derived from a hash of all columns (deterministic, no
    RNG) so reruns produce identical partials.
    """
    salt = (F.xxhash64(*df.columns) % n_salts).alias("__salt__")
    phase1 = (
        df.withColumn("__salt__", salt)
        .groupBy(*keys, "__salt__")
        .agg(*[p1.alias(name) for name, (p1, _) in partials.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[p2.alias(name) for name, (_, p2) in partials.items()]
    )


def preagg_grouping(
    df: DataFrame,
    dims: Sequence[str],
    partials: dict[str, tuple[Column, Column]],
    mode: str = "rollup",
    sets: Sequence[Sequence[str]] | None = None,
    grouping_id_col: str | None = None,
) -> DataFrame:
    """ROLLUP / CUBE / GROUPING SETS with the Expand blowup paid on
    the pre-aggregated frame instead of the raw table.

    Spark plans grouping-set aggregations as Expand → partial agg:
    every input row is REPLICATED once per grouping set before any
    aggregation happens, so a 3-set rollup pushes 3× the table through
    the aggregate — the measured cost of the direct form at 100× data
    was 2.9× the two-phase one (SCALE.md round 12: ``rollup_revenue``
    62.6 → 21.4 s). This helper aggregates ONCE at the finest grain
    (the full ``dims`` tuple — a frame no larger than the dims'
    value-combination count), then runs the grouping-set expansion
    over that compact frame, where the 3× replication is free.

    ``partials`` follows :func:`salted_agg`'s contract: output name →
    (phase-1 partial aggregate over the raw rows, phase-2 merge over
    the partials, referring to phase-1 names). Only algebraic
    aggregates merge this way — decompose AVG into sum+count
    yourself, and note a COUNT merge is ``F.sum(name)`` (on an EMPTY
    input the grand-total row then carries NULL where the direct form
    says 0 — coalesce in the merge if that row matters).

    ``mode``: ``"rollup"``, ``"cube"``, or ``"sets"`` (pass ``sets``).
    ``grouping_id_col`` appends ``F.grouping_id()`` (cast long) in
    phase 2 — identical to the direct form's because both expand over
    the same ``dims``. NULL dim values are preserved exactly: they
    form their own phase-1 cells and roll up like any other value,
    and ``grouping_id`` is what separates them from subtotal NULLs.
    """
    phase1 = df.groupBy(*dims).agg(
        *[p1.alias(name) for name, (p1, _) in partials.items()]
    )
    if mode == "rollup":
        grouped = phase1.rollup(*dims)
    elif mode == "cube":
        grouped = phase1.cube(*dims)
    elif mode == "sets":
        if sets is None:
            raise ValueError("mode='sets' requires the sets argument")
        grouped = phase1.groupingSets([list(s) for s in sets], *dims)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    merges = [p2.alias(name) for name, (_, p2) in partials.items()]
    if grouping_id_col:
        merges.append(F.grouping_id().cast("long").alias(grouping_id_col))
    return grouped.agg(*merges)


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Hot-key-proof join for a too-big-to-broadcast dimension: the
    dimension is replicated across ``n_salts`` copies and each skewed
    row is scattered to one copy, so a hot join key occupies at most
    1/n_salts of any shuffle partition.

    The salt never changes WHICH rows join — only where they meet —
    so the result is exactly the plain join (the oracle query runs the
    unsalted SQL). Row cost: dim shuffles n_salts×; use when AQE's
    skew splitting can't help (e.g. the skewed side feeds a
    co-partitioned downstream op it would have to re-shuffle anyway).
    Only ``inner`` and ``left`` are allowed — replicating the dim side
    would duplicate its unmatched rows under right/full joins.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left' only")
    # The salt value is irrelevant to correctness (each skewed row meets
    # one full dim copy), so a cheap nondeterministic spread is fine
    # under task retries — identical output either way.
    s = skewed.withColumn(
        "__salt__",
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    )
    d = dim.withColumn(
        "__salt__", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    # The dim is here BECAUSE it can't broadcast — but Catalyst sizes
    # the exploded side from the child's file bytes, so at scale it
    # happily plans a broadcast of n_salts x the dim and dies on the
    # 8 GiB hard limit (found live by the 100x stress: a 13 GiB
    # attempted broadcast at 60M lineitem rows). Pin the shuffled hash
    # join the operator's contract assumes.
    return s.join(d.hint("shuffle_hash"), [*on, "__salt__"], how).drop(
        "__salt__"
    )


def skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Key-skew diagnostic for join/aggregation planning: the
    ``top_k`` heaviest keys with their row share and their multiple
    of the uniform share (``skew_x`` = share × n_distinct_keys — 1.0
    means perfectly uniform, 100 means this key is 100× a fair
    slice). This is the measurement that decides whether a key needs
    the salting/two-phase treatments in this module before a 100 TB
    join is attempted.

    Scale shape: one partial-aggregated groupBy on the key (the same
    shuffle the join under diagnosis would do); totals and distinct-
    key counts are 1-row aggregates OVER THE AGGREGATED frame
    (|keys| rows, not N) broadcast back; the top-k compiles to
    TakeOrderedAndProject under the total order (count desc, key
    asc). Nothing is collected.

    Returns ``(key_col, n_rows, share, skew_x)``, heaviest first.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    counts = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    tot = counts.agg(
        F.sum("n_rows").cast("double").alias("__tot__"),
        F.count(F.lit(1)).cast("double").alias("__nkeys__"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            key_col,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__tot__"), round_to).alias(
                "share"
            ),
            F.round(
                F.col("n_rows") * F.col("__nkeys__") / F.col("__tot__"),
                round_to,
            ).alias("skew_x"),
        )
        .orderBy(F.col("n_rows").desc(), F.col(key_col).asc())
        .limit(top_k)
    )
