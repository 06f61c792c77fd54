"""Portable, cross-engine-checkable sketches (SURVEY.md §2.6 C8 scale
path).

Reference ``compute_stats`` (tmdb_index.py:142-175) computes exact
``n_unique`` per column; the declared 100-TB scale path replaces exact
distinct counting with a sketch.  Spark's built-in sketches
(``approx_count_distinct`` = HLL++, ``percentile_approx`` = GK) are
engine-private: their estimates cannot be reproduced by a second
engine, so queries built on them can only ever be rows-only checked.

This module re-implements the sketch layer as *portable* column
expressions — every step is plain integer/SQL arithmetic reproducible
verbatim in DuckDB, the same md5 trick the MinHash family uses
(DELTAS.md #4):

* :func:`portable_hll_distinct` — classic HyperLogLog (Flajolet et
  al. 2007): register index = low ``b`` bits of the 60-bit md5 hash
  (:func:`~tmdb_index_spark.functions.text.portable_hash60`), register
  value rho = position of the highest set bit of the remaining
  ``60-b`` bits (computed via the base-2 string length — no floats),
  estimate = raw harmonic mean ``alpha_m * m^2 / sum(2^-M_j)`` with
  the standard linear-counting small-range correction
  (``m * ln(m / V)`` when the raw estimate is below ``2.5 m`` and
  ``V`` registers are still empty).  Two determinism tricks make the
  result bit-identical regardless of aggregation order, partition
  count, or engine:

  - register terms are rescaled by ``2^CAP`` (rho clamped at CAP=40,
    a no-op below ~2^40 distinct keys per group) so the per-group sum
    is EXACT BIGINT arithmetic — max sum ``2^b * 2^40 << 2^63``;
  - the correction's ``ln`` is never evaluated at query time: ``V``
    can only take ``m - 1`` distinct values, so ``m * ln(m/V)`` is
    PRECOMPUTED host-side and embedded as a literal lookup array in
    both engines (1-ulp libm-vs-JVM transcendental drift can't occur).

  Standard error ~ ``1.04 / sqrt(2^b)`` in the harmonic regime and a
  few percent in the linear-counting regime — accurate from n=1 up.
* :func:`hash_sample_pred` — deterministic Bernoulli-by-hash sample
  predicate (``md5_hash % denom == 0``): selects the SAME rows in any
  engine.  Combined with an exact interpolated percentile over the
  sampled subset it is the portable stand-in for GK/KLL quantile
  sketches — a sampling-based quantile estimator with error
  ``O(1/sqrt(sample_n))`` per group.

Scale shape: the HLL is a single scan + two mergeable aggregations —
map-side partial ``max`` per (group, register) collapses every
partition to at most ``groups * 2^b`` rows before the shuffle, then a
tiny per-group reduce — the same bounded-memory plan HLL++ itself
uses.  The sample-percentile path shrinks the sort input by the
sampling factor before the per-group exact percentile.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tmdb_index_spark.functions.text import portable_hash60

__all__ = [
    "HLL_CAP",
    "hll_alpha",
    "hash_sample_pred",
    "tuned_sample_denom",
    "portable_hll_distinct",
    "portable_hll_oracle_sql",
]

#: rho clamp: register terms become exact ``2^(CAP - rho)`` BIGINTs.
#: 40 leading zero bits ~ first collision at ~2^40 distinct keys —
#: far beyond any per-group cardinality this engine targets.
HLL_CAP = 40


def hll_alpha(m: int) -> float:
    """Standard HLL bias-correction constant for ``m`` registers
    (Flajolet et al. 2007, table 1)."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _lc_table(m: int) -> list[float]:
    """Linear-counting lookup: entry V (1-indexed) = ``m * ln(m / V)``
    for V = 1..m-1, precomputed host-side so neither engine evaluates a
    transcendental (module docstring)."""
    import math

    return [m * math.log(m / v) for v in range(1, m)]


def hash_sample_pred(
    key: Column, denom: int | Column, seed: int = 0
) -> Column:
    """Deterministic 1/denom Bernoulli sample predicate: true iff the
    portable 60-bit md5 hash of ``key`` (cast to string) is 0 mod
    ``denom`` (an int, or a Column — e.g. the data-derived
    :func:`tuned_sample_denom`).  DuckDB mirror::

        (CAST(('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15))
              AS BIGINT) % denom) = 0
    """
    d = F.lit(denom) if isinstance(denom, int) else denom
    return F.pmod(portable_hash60(key.cast("string"), seed), d) == 0


def tuned_sample_denom(
    n: Column, target: int, min_denom: int = 4
) -> Column:
    """Self-tuned sampling denominator: the smallest power of two
    ``>= max(min_denom, ceil(n / target))`` — so a 1/denom hash sample
    of an ``n``-row stream lands BETWEEN ``target/2`` and ``target``
    rows (never above), no matter how large ``n`` grows.  The sketch
    family's occupancy-constant rule (``bits = f(COUNT(*))`` in the
    tuned LSH/IVF paths) applied to sampling: a FIXED denominator's
    sample grows linearly with the data, and any downstream exact
    computation over it (a per-group sorted percentile buffer, a
    driver collect) silently inherits that linear growth — the
    round-12 ``approx_value_quantiles`` 31.5×-at-100× lesson.

    Portable by the same no-transcendental trick as the HLL rho: the
    next power of two is ``2^bitlen(q - 1)`` with bitlen read off the
    base-2 string (``log2`` is libm-dependent and could flip ``ceil``
    at exact powers of two).  All-integer inputs, so the one double
    division (``floor((n + target - 1) / target)``) cannot misround
    across an integer boundary.  DuckDB mirror (q = the same floor)::

        CASE WHEN q <= {min_denom} THEN CAST({min_denom} AS BIGINT)
             ELSE CAST(POW(2, length(bin(q - 1))) AS BIGINT) END
    """
    if target < 1 or min_denom < 1:
        raise ValueError(
            f"target and min_denom must be >= 1, got {target}, {min_denom}"
        )
    q = F.floor(
        (n.cast("bigint") + F.lit(target - 1)) / F.lit(target)
    ).cast("bigint")
    bitlen = F.length(F.conv((q - 1).cast("string"), 10, 2))
    # 2^bitlen via POW-then-cast: exact in double far past any real
    # denominator (the portable_hll_distinct register-term idiom)
    nextpow = F.pow(F.lit(2.0), bitlen.cast("double")).cast("bigint")
    return F.when(
        q <= F.lit(min_denom), F.lit(min_denom).cast("bigint")
    ).otherwise(nextpow)


def portable_hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    b: int = 10,
    out_col: str = "approx_distinct",
    count_col: str = "n_rows",
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate of ``key_col``,
    reproducible bit-for-bit in any engine (module docstring).

    Returns ``group_cols + [out_col (double, rounded 4), count_col
    (bigint row count)]``.  Two mergeable aggregations: (group,
    register) partial-max — at most ``groups * 2^b`` rows cross the
    wire — then the per-group estimate over exact BIGINT register
    sums, with the literal-lookup linear-counting correction.

    NULL keys follow count-distinct semantics (round-12 advisor): a
    NULL key hits no register (it previously landed in a phantom
    NULL-index register row that biased both the register sum and the
    empty-register count), but its rows still count in ``count_col``.
    A group whose keys are ALL NULL estimates 0 distinct.
    """
    m = 1 << b
    w = 60 - b
    # The md5-per-row hash is the sketch's only data-sized compute, and
    # a single-row-group table scans as ONE task — widen the projected
    # (group, key) rows first (metadata-only probe; no-op at production
    # scan widths). Register maxes and row counts are partition-order
    # independent, so the estimate is bit-identical.
    from tmdb_index_spark.operators.partitioning import widen_small_scan

    # append key_col only when it is not already a group column — the
    # duplicate name would make the F.col(key_col) below AMBIGUOUS
    # (round-14 ADVICE; no current call site overlaps, API-level guard)
    proj = list(group_cols) + (
        [key_col] if key_col not in group_cols else []
    )
    src = widen_small_scan(df.select(*proj))
    base = src.select(
        *group_cols,
        portable_hash60(F.col(key_col).cast("string")).alias("__hll_h__"),
    )
    rest = F.expr(f"__hll_h__ DIV {m}")
    bitlen = F.length(F.conv(rest.cast("string"), 10, 2))
    # least() IGNORES nulls, so the null-hash guard must sit OUTSIDE it
    # — otherwise a NULL key silently got rho = HLL_CAP
    rho = F.when(
        F.col("__hll_h__").isNotNull(),
        F.least(
            F.lit(HLL_CAP),
            F.when(rest == F.lit(0), F.lit(w + 1)).otherwise(
                F.lit(w) - bitlen + F.lit(1)
            ),
        ),
    )
    regs = (
        base.select(
            *group_cols,
            F.pmod(F.col("__hll_h__"), F.lit(m)).alias("__hll_idx__"),
            rho.alias("__hll_rho__"),
        )
        .groupBy(*group_cols, "__hll_idx__")
        .agg(
            F.max("__hll_rho__").alias("__hll_m__"),
            F.count(F.lit(1)).alias("__hll_n__"),
        )
    )
    # exact integer register sum: hit registers contribute
    # 2^(CAP - M_j), the (m - hit) empty registers contribute 2^CAP.
    # count(__hll_idx__) counts only REAL (non-null-key) registers; the
    # NULL-index row's term is NULL, so sum() skips it, and coalesce
    # covers the all-NULL-keys group (no real registers at all).
    term = F.expr(f"CAST(POW(2, {HLL_CAP} - __hll_m__) AS BIGINT)")
    numer = hll_alpha(m) * m * m * float(2**HLL_CAP)
    hit = F.count("__hll_idx__")
    agg = regs.groupBy(*group_cols).agg(
        (
            F.coalesce(F.sum(term), F.lit(0))
            + (F.lit(m) - hit) * F.lit(2**HLL_CAP)
        ).alias("__hll_s__"),
        (F.lit(m) - hit).alias("__hll_v__"),
        F.sum("__hll_n__").alias(count_col),
    )
    e_raw = F.lit(numer) / F.col("__hll_s__").cast("double")
    lc = F.element_at(
        F.array(*[F.lit(x) for x in _lc_table(m)]),
        F.col("__hll_v__").cast("int"),
    )
    est = F.when(F.col("__hll_v__") == F.lit(m), F.lit(0.0)).when(
        (e_raw <= F.lit(2.5 * m)) & (F.col("__hll_v__") >= F.lit(1)), lc
    ).otherwise(e_raw)
    return agg.select(
        *group_cols, F.round(est, 4).alias(out_col), count_col
    )


def portable_hll_oracle_sql(
    key_sql: str,
    group_sql: str,
    group_alias: str,
    from_sql: str,
    b: int = 10,
    out_col: str = "approx_distinct",
    count_col: str = "n_rows",
) -> str:
    """The DuckDB mirror of :func:`portable_hll_distinct`: the SAME
    hash, register split, clamp, integer register sum, and literal
    linear-counting lookup, step for step — including the NULL-key
    rule (NULL keys hit no register but still count in ``count_col``)
    — so the two engines agree bit-for-bit.  ``key_sql`` /
    ``group_sql`` are SQL expressions over ``from_sql``."""
    m = 1 << b
    w = 60 - b
    numer = repr(hll_alpha(m) * m * m * float(2**HLL_CAP))
    lc = ", ".join(repr(x) for x in _lc_table(m))
    return f"""
WITH __hll_h AS (
  SELECT {group_sql} AS {group_alias},
         CAST(('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM {from_sql}
), __hll_r AS (
  SELECT {group_alias}, h % {m} AS idx,
         CASE WHEN h IS NULL THEN NULL
              ELSE LEAST({HLL_CAP}, CASE WHEN h // {m} = 0 THEN {w + 1}
                  ELSE {w} - length(bin(h // {m})) + 1 END) END AS rho
  FROM __hll_h
), __hll_reg AS (
  SELECT {group_alias}, idx, MAX(rho) AS mreg, COUNT(*) AS n
  FROM __hll_r GROUP BY {group_alias}, idx
), __hll_agg AS (
  SELECT {group_alias},
         COALESCE(SUM(CAST(POW(2, {HLL_CAP} - mreg) AS BIGINT)), 0)
           + ({m} - COUNT(idx)) * {2**HLL_CAP} AS s,
         {m} - COUNT(idx) AS v,
         CAST(SUM(n) AS BIGINT) AS {count_col}
  FROM __hll_reg GROUP BY {group_alias}
)
SELECT {group_alias},
       ROUND(CASE WHEN v = {m} THEN 0.0
                  WHEN {numer} / CAST(s AS DOUBLE) <= {repr(2.5 * m)}
                   AND v >= 1
                  THEN [{lc}][CAST(v AS INT)]
                  ELSE {numer} / CAST(s AS DOUBLE) END, 4) AS {out_col},
       {count_col}
FROM __hll_agg
"""
