"""Declarative data-quality constraint checks.

Generalizes the reference's single hard-coded invariant — the dense
surrogate-key check (``/root/reference/tmdb_index.py:107-114``,
re-expressed in :func:`tmdb_index_spark.operators.upsert.validate_id`)
— into a composable check family a training-data pipeline runs per
batch: uniqueness, non-null, value ranges, and referential integrity.

Each check returns a 1-row ``(check, n_violations)`` frame;
:func:`run_checks` unions them into one summary. All checks are
single-aggregate or anti-join shaped — no check is ever more expensive
than one shuffle over the audited column(s), and unioned checks over
the same table share the scan after Spark's common-subexpression reuse.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _summary(name: str, count_df: DataFrame) -> DataFrame:
    return count_df.select(
        F.lit(name).alias("check"),
        F.col("n").cast("long").alias("n_violations"),
    )


def check_unique(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    """Rows participating in a duplicated key (0 when ``cols`` is a
    candidate key). Counts ALL members of duplicate groups, not just
    the extras, so the number reads as 'rows you must inspect'."""
    dupes = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("__c__"))
        .filter(F.col("__c__") > 1)
        .agg(F.coalesce(F.sum("__c__"), F.lit(0)).alias("n"))
    )
    return _summary(name or f"unique({','.join(cols)})", dupes)


#: Escape byte of the canonical key encoding: values are rewritten so
#: the raw null marker (``\x00``) and separator (``\x01``) can never
#: appear inside an escaped value — the encoding is injective even for
#: adversarial strings containing the marker bytes (round-12 advisor:
#: unescaped, ``('a\x01b', 'c')`` and ``('a', 'b\x01c')`` collided).
_CANON_ESC = "\x02"


def _esc_value(col):
    """Prefix-free escape: ``\x02``→``\x02e``, ``\x00``→``\x02z``,
    ``\x01``→``\x02u`` (escape byte first, so introduced pairs are
    never re-escaped). Decoding is unambiguous, hence injective."""
    out = F.replace(col, F.lit(_CANON_ESC), F.lit(_CANON_ESC + "e"))
    out = F.replace(out, F.lit("\x00"), F.lit(_CANON_ESC + "z"))
    return F.replace(out, F.lit("\x01"), F.lit(_CANON_ESC + "u"))


def _canon_key(cols: list[str]):
    """Canonical string encoding of a composite key that preserves
    groupBy-equality exactly: per-column ESCAPED value or null marker,
    unit-separator-joined.  Escaping (:func:`_esc_value`) guarantees no
    real value collides with the ``\x00N`` marker or the ``\x01``
    separator, so the encoding is injective for any input strings."""
    parts = []
    for c in cols:
        parts.append(
            F.coalesce(
                _esc_value(F.col(c).cast("string")), F.lit("\x00N")
            )
        )
    return F.concat_ws("\x01", *parts)


def canon_key_sql(cols: list[str]) -> str:
    """The DuckDB mirror of :func:`_canon_key` — same escape chain,
    marker, and separator, so a portable-sketch oracle hashes the
    identical key bytes."""

    def esc(c: str) -> str:
        v = f"CAST({c} AS VARCHAR)"
        v = f"replace({v}, chr(2), chr(2) || 'e')"
        v = f"replace({v}, chr(0), chr(2) || 'z')"
        return f"replace({v}, chr(1), chr(2) || 'u')"

    parts = [f"coalesce({esc(c)}, chr(0) || 'N')" for c in cols]
    if len(parts) == 1:
        return parts[0]
    return "concat_ws(chr(1), " + ", ".join(parts) + ")"


def check_unique_multi(
    df: DataFrame,
    key_sets: list[list[str]],
    names: list[str] | None = None,
    max_exact_rows: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """ALL uniqueness checks of one table in a single scan + two
    shuffles (the 100-TB form of N :func:`check_unique` calls, which
    cost one scan + one shuffle EACH):

    each row explodes to one ``(check_idx, canonical key string)``
    pair per key set; one map-side-combined shuffle keyed on
    ``(check_idx, key)`` collapses to per-key counts, and a second
    tiny shuffle rolls violating-group member counts up per check.
    Shuffled volume is the sum of the key sets' distinct-key counts —
    identical to the separate-checks total — but the table is scanned
    ONCE for all of them.  Same per-check numbers as
    :func:`check_unique` (all members of duplicate groups).

    ``max_exact_rows`` (round 13) is the scale gate: exactness must
    ship every distinct key, so for a near-candidate key the check is
    the whole table across the wire — the round-12 100× stress point
    (the lineitem composite-key check alone was 158 of ``dq_summary``'s
    164 s).  When set and the table's row count exceeds it, every key
    set routes to the sketch twin (:func:`check_unique_hll`, one scan
    + a constant 2^10-register shuffle at any size) and the returned
    rows carry ITS schema — ``(check, approx_unique, n_rows)`` instead
    of ``(check, n_violations)`` — so a consumer can always tell an
    estimate from an exact count by the columns alone.  ``None``
    (default) keeps the exact path unconditionally: exactness stays
    available opt-in at any scale.

    ``n_rows`` lets a caller that already counted the table (an audit
    composite counts once for several checks) decide the gate without
    the extra ``count()`` action this function would otherwise run per
    call (round-13 ADVICE)."""
    if not key_sets:
        raise ValueError("check_unique_multi needs at least one key set")
    if names is not None and len(names) != len(key_sets):
        raise ValueError(
            f"names has {len(names)} entries for {len(key_sets)} key "
            f"sets — the gated (sketch) path would IndexError and the "
            f"exact path would silently drop names"
        )
    if max_exact_rows is not None:
        if n_rows is None:
            # bare-scan audits (the dq_summary case) read the exact
            # count from the parquet footers — no gate job at all;
            # transformed inputs keep the count() fallback
            from tmdb_index_spark.operators.partitioning import (
                metadata_scan_rowcount,
            )

            n_rows = metadata_scan_rowcount(df)
        if n_rows is None:
            n_rows = df.count()
        if n_rows > max_exact_rows:
            out = check_unique_hll(
                df, key_sets[0], name=(names or [None])[0]
            )
            for i, ks in enumerate(key_sets[1:], start=1):
                out = out.unionByName(
                    check_unique_hll(
                        df, ks, name=names[i] if names else None
                    )
                )
            return out
    names = names or [f"unique({','.join(ks)})" for ks in key_sets]
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("__ci__"), _canon_key(ks).alias("__key__")
            )
            for i, ks in enumerate(key_sets)
        ]
    )
    ex = df.select(F.explode(pairs).alias("p")).select("p.__ci__", "p.__key__")
    per_key = ex.groupBy("__ci__", "__key__").agg(
        F.count(F.lit(1)).alias("__c__")
    )
    per_check = (
        per_key.filter(F.col("__c__") > 1)
        .groupBy("__ci__")
        .agg(F.sum("__c__").alias("__n__"))
    )
    name_map = F.array(*[F.lit(nm) for nm in names])
    spark = df.sparkSession
    idx = spark.range(len(key_sets)).select(
        F.col("id").cast("int").alias("__ci__")
    )
    return (
        idx.join(per_check, "__ci__", "left")
        .select(
            F.element_at(name_map, F.col("__ci__") + 1).alias("check"),
            F.coalesce(F.col("__n__"), F.lit(0)).cast("long").alias(
                "n_violations"
            ),
            "__ci__",
        )
        .orderBy("__ci__")
        .drop("__ci__")
    )


def check_scalars(
    df: DataFrame,
    non_null: list[str] | None = None,
    ranges: list[tuple[str, float | None, float | None]] | None = None,
) -> DataFrame:
    """ALL non-null and range checks of one table in a single
    shuffle-free aggregate pass (the multi-check twin of
    :func:`check_non_null` / :func:`check_range`, which each scan the
    table separately).  Returns one ``(check, n_violations)`` row per
    check, in declaration order."""
    non_null = non_null or []
    ranges = ranges or []
    if not non_null and not ranges:
        raise ValueError("check_scalars needs at least one check")
    aggs = []
    names = []
    for c in non_null:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)))
        names.append(f"non_null({c})")
    for c, lo, hi in ranges:
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (F.col(c) < lo)
        if hi is not None:
            cond = cond | (F.col(c) > hi)
        aggs.append(F.count(F.when(cond, 1)))
        names.append(f"range({c})")
    row = df.agg(
        *[a.cast("long").alias(f"__n{i}__") for i, a in enumerate(aggs)]
    )
    # typed-Column unpivot (explode of literal-name structs) instead of
    # a selectExpr stack(): check names need no SQL-literal escaping, so
    # a quote (or any other metacharacter) in a column name can't
    # corrupt the label or break the parse (round-12 advisor)
    pairs = F.array(
        *[
            F.struct(
                F.lit(nm).alias("check"),
                F.col(f"__n{i}__").alias("n_violations"),
            )
            for i, nm in enumerate(names)
        ]
    )
    return row.select(F.explode(pairs).alias("__p__")).select(
        "__p__.check", "__p__.n_violations"
    )


def check_unique_hll(
    df: DataFrame,
    cols: list[str],
    b: int = 10,
    name: str | None = None,
) -> DataFrame:
    """The 100-TB form of a uniqueness check: the exact variants
    (:func:`check_unique` / :func:`check_unique_multi`) must shuffle
    every DISTINCT key — for a near-candidate key that is the whole
    table across the wire (the round-12 stress point: the lineitem
    composite-key check alone was 158 of ``dq_summary``'s 164 s at
    100× data).  This twin estimates the distinct count with the
    PORTABLE HyperLogLog (:func:`~tmdb_index_spark.operators.sketches
    .portable_hll_distinct`, ±~2% at b=10): only ``2^b`` partial-max
    register rows per partition cross the wire, so cost is one scan +
    a constant-size shuffle at ANY table size — and the estimate is
    bit-reproducible in a second engine, so the check stays
    value-auditable (unlike ``approx_count_distinct``).

    Returns one row: ``(check, approx_unique double, n_rows bigint)``
    — report the CARDINALITY beside the row count rather than a
    pseudo-exact violation count, because subtracting a ±2% estimate
    from an exact count would fabricate precision (an exact-looking
    ``n_violations`` that can be negative).  Composite keys use the
    same canonical null-marker encoding as the exact checks, so the
    two twins audit the identical key function.
    """
    from tmdb_index_spark.operators.sketches import portable_hll_distinct

    tagged = df.select(
        F.lit(name or f"unique({','.join(cols)})").alias("check"),
        _canon_key(cols).alias("__key__"),
    )
    return portable_hll_distinct(
        tagged,
        "__key__",
        ["check"],
        b=b,
        out_col="approx_unique",
        count_col="n_rows",
    )


def check_non_null(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    nulls = df.agg(
        F.count(F.when(F.col(col).isNull(), 1)).alias("n")
    )
    return _summary(name or f"non_null({col})", nulls)


def check_range(
    df: DataFrame,
    col: str,
    lo: float | None = None,
    hi: float | None = None,
    name: str | None = None,
) -> DataFrame:
    """Non-null values outside [lo, hi] (either bound optional)."""
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    out = df.agg(F.count(F.when(cond, 1)).alias("n"))
    return _summary(name or f"range({col})", out)


def check_foreign_key(
    child: DataFrame,
    col: str,
    parent: DataFrame,
    parent_col: str,
    name: str | None = None,
) -> DataFrame:
    """Child rows whose non-null key has no parent.

    The child side pre-aggregates to ``(key, row count)`` before the
    anti join (map-side combine), so the join shuffles each side's
    DISTINCT key set rather than every child row — at 100 TB the
    child's key multiplicity (e.g. lineitems per order) never crosses
    the wire.  Broadcast applies when the parent key set is
    dimension-sized; otherwise both distinct-key sides hash-join."""
    child_keys = (
        child.select(F.col(col))
        .filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("__c__"))
    )
    orphans = (
        child_keys.join(
            parent.select(F.col(parent_col).alias(col)).distinct(),
            col,
            "left_anti",
        )
        .agg(F.coalesce(F.sum("__c__"), F.lit(0)).alias("n"))
    )
    return _summary(name or f"fk({col})", orphans)


def run_checks(checks: list[DataFrame]) -> DataFrame:
    """Union per-check summaries into one audit frame — the per-batch
    audit artifact.  All-exact checks produce the classic ``(check,
    n_violations)`` frame; when a gated uniqueness check routed to the
    sketch twin (:func:`check_unique_multi` ``max_exact_rows``), its
    ``(check, approx_unique, n_rows)`` rows union in by name and the
    other rows carry NULLs there — the column set itself says which
    rows are estimates."""
    if not checks:
        raise ValueError("run_checks needs at least one check")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), checks
    )


def fd_profile(
    df: DataFrame,
    candidates: list[tuple[str, str]],
) -> DataFrame:
    """Functional-dependency DISCOVERY — the complement of the
    declarative checks above: instead of asserting a known constraint,
    measure how close each candidate ``lhs → rhs`` dependency is to
    holding, the profiling signal schema-inference and data-contract
    tools are built on (e.g. Papenbrock & Naumann's FD-discovery
    framing, SIGMOD 2016 — here restricted to given candidates, which
    is the scalable production form).

    For each candidate: the number of distinct ``lhs`` groups, how
    many of those groups see more than one ``rhs`` value (violating
    groups), the violating ROW count, and the violation rate. An FD
    that holds exactly has 0 violating groups; near-FDs (rate under a
    few percent) are usually dirty data, not false rules.

    Plan: one ``(lhs, rhs)`` pair-count aggregate per candidate (two
    partial-aggregated groupBys — the pair collapse, then the group
    rollup), unioned; each candidate's work is bounded by its distinct
    pair count, never the row count, and candidates share the source
    scan under common-subexpression reuse."""
    if not candidates:
        raise ValueError("fd_profile needs at least one (lhs, rhs) candidate")
    outs = []
    for lhs, rhs in candidates:
        pairs = (
            df.groupBy(lhs, rhs)
            .agg(F.count(F.lit(1)).alias("__rows__"))
            .groupBy(lhs)
            .agg(
                F.count(F.lit(1)).alias("__nrhs__"),
                F.sum("__rows__").alias("__grows__"),
            )
        )
        outs.append(
            pairs.agg(
                F.lit(f"{lhs}->{rhs}").alias("candidate"),
                F.count(F.lit(1)).cast("bigint").alias("n_groups"),
                F.sum(F.when(F.col("__nrhs__") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating_groups"),
                F.sum(
                    F.when(F.col("__nrhs__") > 1, F.col("__grows__")).otherwise(
                        0
                    )
                )
                .cast("bigint")
                .alias("n_violating_rows"),
                F.round(
                    F.sum(
                        F.when(F.col("__nrhs__") > 1, F.col("__grows__"))
                        .otherwise(0)
                    ).cast("double")
                    / F.sum("__grows__").cast("double"),
                    6,
                ).alias("violation_rate"),
            )
        )
    return reduce(DataFrame.unionByName, outs)
