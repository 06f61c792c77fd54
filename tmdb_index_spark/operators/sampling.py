"""Deterministic sampling / dataset splitting for training pipelines.

Random splits are useless at 100 TB — reruns must land every row in the
same split without storing assignments. Both operators key off the
engine-portable md5 hash, so the same row lands in the same
split/sample in any engine, any partitioning, any rerun:

* :func:`hash_split` — train/test/val by hash-mod buckets over a key.
* :func:`hash_sample` — a deterministic ~fraction sample.

Map-only; no shuffle, no RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tmdb_index_spark.functions.text import portable_hash60

__all__ = [
    "hash_split",
    "hash_sample",
    "split_column",
    "stratified_sample",
    "mixture_sample",
    "weighted_sample",
    "cap_per_group",
    "negative_pairs",
    "nucleus_filter",
    "waterfill_allocation",
    "temperature_allocation",
]

#: Granularity of split fractions (hash buckets).
_BUCKETS = 10_000


def _bucket(key: Column) -> Column:
    return portable_hash60(key.cast("string")) % _BUCKETS


def split_column(
    key: Column | str, fractions: dict[str, float]
) -> Column:
    """Split-name column from hash buckets over ``key``. ``fractions``
    maps names to fractions summing to ≤ 1; remainder rows get null
    (useful as a holdout)."""
    c = F.col(key) if isinstance(key, str) else key
    b = _bucket(c)
    expr = F.lit(None).cast("string")
    upper = 0.0
    bounds = []
    for name, frac in fractions.items():
        lower = upper
        upper += frac
        bounds.append((name, int(lower * _BUCKETS), int(upper * _BUCKETS)))
    if upper > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {upper} > 1")
    for name, lo, hi in reversed(bounds):
        expr = F.when((b >= lo) & (b < hi), F.lit(name)).otherwise(expr)
    return expr


def hash_split(
    df: DataFrame, key: str, fractions: dict[str, float], col: str = "split"
) -> DataFrame:
    """Append a deterministic split column (e.g. ``{"train": 0.9,
    "test": 0.1}``)."""
    return df.withColumn(col, split_column(key, fractions))


def hash_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """Deterministic ~``fraction`` subset by hash bucket."""
    if not 0 <= fraction <= 1:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_bucket(F.col(key)) < int(fraction * _BUCKETS))


def stratified_sample(
    df: DataFrame, strata_col: str, key: str, fractions: dict[str, float]
) -> DataFrame:
    """Deterministic per-stratum sampling: each stratum keeps its own
    hash-bucket fraction (e.g. downsample the dominant class, keep all
    of the rare one — the class-rebalancing shape). Strata absent from
    ``fractions`` are dropped; still map-only, no shuffle, no RNG —
    ``df.sampleBy`` gives approximate, seed-dependent strata instead.
    """
    for name, frac in fractions.items():
        if not 0 <= frac <= 1:
            raise ValueError(f"fraction for {name!r} must be in [0, 1]")
    b = _bucket(F.col(key))
    thresh = F.lit(None).cast("int")
    for name, frac in fractions.items():
        thresh = F.when(
            F.col(strata_col) == name, F.lit(int(frac * _BUCKETS))
        ).otherwise(thresh)
    return df.filter(b < thresh)


def mixture_sample(
    df: DataFrame,
    source_col: str,
    cost_col: str,
    key: str,
    weights: dict[str, float],
    budget: float,
) -> DataFrame:
    """Token-budget mixture sampling — the data-mixing step of a
    pretraining pipeline: given target mixture ``weights`` per source
    and a global ``budget`` (in units of ``cost_col``: tokens, chars,
    bytes), deterministically sample each source at the rate that
    lands its share of the budget. A source's rate is
    ``min(1, budget·w̄ₛ / totalₛ)`` (w̄ = weights normalized to sum 1;
    sources absent from ``weights`` get rate 0 and drop out); row
    selection is the same hash-bucket rule as :func:`hash_sample`, so
    membership is stable across reruns, engines, and partitionings —
    no RNG state, no stored assignments.

    Scale shape: one partial-aggregated groupBy over the corpus for
    the per-source totals (|sources| rows), rates broadcast back, then
    a map-only filter — the corpus never shuffles. The rate is an
    IEEE-double division floored onto the shared bucket grid, so any
    engine computes the identical keep set.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    wsum = sum(weights.values())
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    # Unroll the (small, driver-side) mixture table into a literal
    # CASE chain — it rides the plan, nothing joins a Python dict.
    wexpr = F.lit(0.0)
    for name, w in sorted(weights.items()):
        wexpr = F.when(F.col("__src__") == name, F.lit(w / wsum)).otherwise(
            wexpr
        )
    totals = df.groupBy(F.col(source_col).alias("__src__")).agg(
        F.sum(F.col(cost_col).cast("double")).alias("__tot__")
    )
    rates = totals.select(
        "__src__",
        F.floor(
            F.least(
                F.lit(1.0), F.lit(float(budget)) * wexpr / F.col("__tot__")
            )
            * _BUCKETS
        ).cast("long").alias("__keep__"),
    )
    return (
        df.join(F.broadcast(rates), F.col(source_col) == F.col("__src__"))
        .filter(_bucket(F.col(key)) < F.col("__keep__"))
        .drop("__src__", "__keep__")
    )


def weighted_sample(
    df: DataFrame,
    key: str,
    weight_col: str,
    k: int,
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-Res): keep the ``k`` rows with the largest
    ``ln(u) / w`` sort key, where ``u ∈ (0, 1)`` derives from the
    portable row hash — rows with larger ``weight_col`` are
    proportionally likelier to survive, membership is stable across
    engines/partitionings/reruns (same hash → same u → same key), and
    no RNG state or second pass is needed. ``ln(u)/w`` orders
    identically to the textbook ``u^(1/w)`` (monotone transform) while
    avoiding cross-engine ``pow`` at tiny exponents.

    With ``group_col`` the top-``k`` is per group (window row_number —
    the shuffle keys on the group, the reservoir never leaves its
    partition); without it, the global top-``k`` compiles to
    per-partition top-k + driver merge (TakeOrderedAndProject), never
    a global sort. Ties (absent in practice for hash-derived u) break
    on ``key`` for full determinism. Weights must be positive."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u = (
        (portable_hash60(F.col(key).cast("string")) % 1_000_000).cast("double")
        + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    skey = F.log(u) / F.col(weight_col).cast("double")
    tagged = df.withColumn("__skey__", skey)
    if group_col is None:
        return tagged.orderBy(
            F.col("__skey__").desc(), F.col(key).asc()
        ).limit(k).drop("__skey__")
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col("__skey__").desc(), F.col(key).asc()
    )
    return (
        tagged.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .drop("__skey__", "__rn__")
    )


def cap_per_group(
    df: DataFrame,
    key: str,
    group_col: str,
    cap: int,
) -> DataFrame:
    """Deterministically keep at most ``cap`` rows per ``group_col``,
    chosen by portable-hash rank over ``key`` — the domain-cap step of
    web-corpus pipelines (C4/RefinedWeb cap documents per host so one
    crawl-friendly domain cannot dominate the training mixture).

    Hash rank, not arrival order: membership is a pure function of
    (key, group), stable across engines, partitionings, and reruns,
    and adding documents to OTHER groups never changes a group's kept
    set. Ties on the hash (astronomically rare at 60 bits) break on
    the key. One shuffle on ``group_col``; the row_number window is
    the standard per-group top-k (rank computed per partition, no
    global sort). A pathologically hot group degrades to one fat task
    — at web scale cap ≪ group size, so pre-aggregation (keep the
    cap·P per-partition hash-smallest via a partial top-k) is the
    lever; documented, not defaulted, because the plain window wins
    below ~10^7 rows per group.
    """
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        portable_hash60(F.col(key).cast("string")).asc(), F.col(key).asc()
    )
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= cap)
        .drop("__rn__")
    )


def negative_pairs(
    df: DataFrame,
    id_col: str,
    k: int = 3,
    seed: int = 0,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    every anchor row, ``k`` pseudo-random partner rows drawn uniformly
    from the OTHER rows — no RNG state, no cross join, the same pairs
    on every engine and rerun.

    Requires a dense id space: ``id_col`` must hold exactly the
    integers ``0..N-1`` (what ``align_id_col`` / dense exports
    provide; validate with ``validate_id`` first if unsure). Partner
    selection is the classic skip-self trick:

        raw = portable_md5_hash(id, j, seed) mod (N-1)
        partner = raw + 1 if raw >= id else raw

    which is a bijection onto ``[0, N) \\ {id}`` per draw, so
    anchors never pair with themselves and the draw is uniform.
    Distinct draws j may repeat a partner (sampling WITH replacement,
    as contrastive batches do).

    Plan shape: N comes from a 1-row count aggregate (broadcast, never
    collected); draws explode a k-length sequence (bounded Generate);
    the partner's attributes arrive through ONE equi-join on the dense
    id — hash-partitionable, broadcastable when the corpus side is a
    dim. Nothing quadratic; output is exactly ``k·N`` rows.

    Returns ``(id_col, neg_rank, neg_id, *keep_cols-of-partner as
    neg_<col>)``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    n = df.agg(F.count(F.lit(1)).cast("long").alias("__n__"))
    anchors = (
        df.select(id_col)
        .crossJoin(F.broadcast(n))
        .filter(F.col("__n__") >= 2)
        .select(
            id_col,
            "__n__",
            F.explode(F.sequence(F.lit(1), F.lit(k))).alias("neg_rank"),
        )
    )
    raw = (
        portable_hash60(
            F.concat_ws(
                "|",
                F.col(id_col).cast("string"),
                F.col("neg_rank").cast("string"),
                F.lit(str(seed)),
            )
        )
        % (F.col("__n__") - 1)
    )
    pairs = anchors.select(
        id_col,
        "neg_rank",
        F.when(raw >= F.col(id_col), raw + 1).otherwise(raw).alias("neg_id"),
    )
    if not keep_cols:
        return pairs
    partner = df.select(
        F.col(id_col).alias("neg_id"),
        *[F.col(c).alias(f"neg_{c}") for c in keep_cols],
    )
    return pairs.join(partner, "neg_id").select(
        id_col, "neg_rank", "neg_id", *[f"neg_{c}" for c in keep_cols]
    )


def nucleus_filter(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    p: float,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Top-p (nucleus) selection per group: the SMALLEST prefix of
    items — taken in descending weight order — whose cumulative
    weight reaches fraction ``p`` of the group total. The
    corpus-curation cousin of nucleus sampling: "keep the sources
    covering 90% of tokens", "keep event types covering 99% of
    volume", a mass-coverage criterion no fixed top-k or threshold
    expresses.

    An item is kept iff its EXCLUSIVE prefix sum is still below
    ``p * total`` — so the item that crosses the threshold is
    included and nothing after it. Order is ``(weight desc,
    tiebreak asc)``; pass ``tiebreak_col`` whenever weights can tie
    or the kept set would be engine-dependent. Weights must be
    non-negative; they are accumulated as DECIMAL(28,6), so prefix
    sums are exact and the p-comparison is reproducible bit-for-bit
    (a float cumsum would make the boundary item partition-order
    dependent).

    Scale shape: one shuffle on the group key; the window and the
    group-total both run inside that partitioning (the total via an
    unbounded frame, no second scan or join). Output keeps
    ``(group_col, item columns, weight, cum_share)`` for the kept
    rows, ``cum_share`` rounded to 4.
    """
    if not 0.0 < p <= 1.0:
        raise ValueError(f"p must be in (0, 1], got {p}")
    w = F.col(weight_col).cast("decimal(28,6)")
    order = [F.col(weight_col).desc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    win = Window.partitionBy(group_col).orderBy(*order)
    cum = F.sum(w).over(
        win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = F.sum(w).over(Window.partitionBy(group_col))
    out = df.withColumn("__cum__", cum).withColumn("__tot__", total)
    keep = (F.col("__cum__") - w) < (
        F.lit(p).cast("decimal(28,6)") * F.col("__tot__")
    )
    return (
        out.filter(keep)
        .withColumn(
            "cum_share",
            F.round(
                F.col("__cum__").cast("double")
                / F.col("__tot__").cast("double"),
                4,
            ),
        )
        .drop("__cum__", "__tot__")
    )

def waterfill_allocation(
    df: DataFrame,
    avail_col: str,
    budget_col: str = "__budget__",
    group_col: str = "source",
) -> DataFrame:
    """Water-filling token-budget allocation with per-group caps — the
    mixture-planning step of a pretraining pipeline: split a global
    token budget ``B`` evenly across groups (sources/domains), except a
    group can never contribute more than it HAS; its surplus re-floods
    the remaining groups. The classic closed form over the sorted
    availability profile, no iteration:

    sort groups by availability ascending ``A_(1) <= ... <= A_(n)``
    with prefix sums ``P_i``; the pivot is the FIRST row where
    ``lambda_i = (B - P_{i-1}) / (n - i + 1) <= A_(i)`` — rows before
    it are capped at their availability, rows from it on get the water
    level ``lambda``. If no row qualifies (``B > sum(A)``) every group
    is capped and the level is NULL.

    ``df`` is one row per group carrying integer ``avail_col`` and the
    integer budget in ``budget_col`` (same value on every row — attach
    it with a broadcast of the 1-row total before calling). Returns
    ``(group_col, avail, allocation, capped, water_level)`` with
    ``allocation = LEAST(avail, lambda)`` as double.

    Scale: every window here runs over the GROUP-cardinality frame
    (sources/domains — bounded by construction, the same argument as
    the per-source rollups), totally ordered by ``(avail, group)`` so
    ties cannot swap between the stacked passes. Inputs are exact
    integers; ``lambda`` is one division of identical integers on any
    engine, so comparisons and outputs reproduce bit-for-bit.
    """
    w = Window.orderBy(F.col("avail"), F.col(group_col))
    base = df.select(
        F.col(group_col),
        F.col(avail_col).cast("bigint").alias("avail"),
        F.col(budget_col).cast("bigint").alias("__b__"),
    )
    ranked = base.select(
        group_col,
        "avail",
        "__b__",
        F.row_number().over(w).alias("__i__"),
        F.sum("avail").over(w).alias("__p__"),
        F.count(F.lit(1)).over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__n__"),
    )
    lam_i = (
        (F.col("__b__") - (F.col("__p__") - F.col("avail"))).cast("double")
        / (F.col("__n__") - F.col("__i__") + 1).cast("double")
    )
    flagged = ranked.select(
        group_col,
        "avail",
        F.when(lam_i <= F.col("avail").cast("double"), lam_i).alias("__lam__"),
    )
    # the true level is the FIRST qualifying row's lambda; every later
    # qualifying row's lambda is <= it (each skipped row contributed
    # MORE than the level), and rows before the pivot never qualify —
    # so MAX over qualifying lambdas selects the pivot's, portably
    level = F.max("__lam__").over(
        Window.orderBy(F.lit(1)).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    a = F.col("avail").cast("double")
    return flagged.select(
        group_col,
        F.col("avail").alias("avail_tokens"),
        F.round(
            F.when(level.isNull(), a).otherwise(F.least(a, level)), 4
        ).alias("allocation"),
        F.when(level.isNull(), F.lit(True))
        .otherwise(a <= level)
        .alias("capped"),
        F.round(level, 4).alias("water_level"),
    )


def temperature_allocation(
    df: DataFrame,
    avail_col: str,
    budget_col: str = "__budget__",
    group_col: str = "source",
    temperature: float = 2.0,
    epoch_cap: int = 4,
) -> DataFrame:
    """Temperature-scaled token-budget allocation with per-group epoch
    caps — the multilingual mixture rule of mT5/XLM-R (sample language
    ``l`` proportional to ``A_l^(1/T)``) combined with UniMax's repeat
    bound (Chung et al. 2023: never take more than ``epoch_cap``
    epochs of a group's data; surplus re-floods the rest): allocate
    the budget PROPORTIONAL TO WEIGHT ``w = A^(1/T)`` subject to
    ``alloc ≤ cap = epoch_cap · A``, redistributing capped groups'
    surplus proportionally among the uncapped. ``T = 1`` degenerates
    to proportional-to-size (each group sampled at the same rate);
    ``T → ∞`` approaches uniform — :func:`waterfill_allocation` is
    exactly that limit (and UniMax's own allocator is the water-fill
    over caps: ``waterfill_allocation`` with ``avail = epoch_cap·A``).

    Closed form, no iteration — the proportional-refill pivot over
    the ratio-sorted profile (generalizing the water-fill pivot):
    sort groups by ``r_i = cap_i / w_i`` ascending; with cap-prefix
    ``P_i`` and weight-suffix ``W_i = Σ_{j≥i} w_j``, the pivot is the
    FIRST row where the remaining-proportional scale
    ``s_i = (B - P_{i-1}) / W_i`` satisfies ``s_i ≤ r_i``; rows before
    it are capped, rows from it on get ``s · w``. The qualifying
    comparison is EXACT integer cross-multiplication in
    DECIMAL(38, 0) — ``(B - P_{i-1}) · w_i ≤ cap_i · W_i`` — the same
    overflow-proof rule as the composite's ppm sampler (requires
    ``cap · Σw < 10^38``; at 25 T tokens/source and micro-weights
    that is ~10^28).

    Cross-engine determinism is why ``temperature`` must be a POWER OF
    TWO: ``A^(1/2^k)`` is ``k`` nested square roots, and IEEE-754
    ``sqrt`` is correctly rounded — bit-identical in every engine —
    where a general ``pow(A, 1/T)`` is libm-dependent and could flip a
    pivot comparison. Weights are quantized to integer micros
    (``floor(1e6 · sqrt^k(A))``; ``T = 1`` uses ``A`` itself, already
    integral), so every comparison after the sqrt chain is exact
    integer arithmetic; the only doubles are the final ``s`` and
    ``s·w`` (correctly-rounded division/multiplication — identical
    everywhere).

    One row per group in, one out: ``(group_col, avail_tokens,
    cap_tokens, allocation, capped, scale)``; ``allocation`` rounded
    to 4, ``scale`` is the pivot scale (NULL when the budget covers
    every cap, i.e. every group is capped — the water-fill
    convention). Zero-availability groups allocate 0 (capped). All
    windows run over the GROUP-cardinality frame — bounded by
    construction, the :func:`waterfill_allocation` scale argument.
    """
    import math

    if epoch_cap < 1:
        raise ValueError(f"epoch_cap must be >= 1, got {epoch_cap}")
    k = round(math.log2(temperature)) if temperature > 0 else -1
    if k < 0 or 2.0 ** k != temperature:
        raise ValueError(
            f"temperature must be a power of two (1, 2, 4, ...) so the "
            f"weight A^(1/T) is a chain of correctly-rounded sqrts and "
            f"reproduces bit-for-bit in any engine; got {temperature!r}"
        )
    base = df.select(
        F.col(group_col),
        F.col(avail_col).cast("bigint").alias("avail"),
        F.col(budget_col).cast("bigint").alias("__b__"),
    )
    if k == 0:
        wexpr = F.col("avail").cast("decimal(38,0)")
    else:
        s = F.col("avail").cast("double")
        for _ in range(k):
            s = F.sqrt(s)
        wexpr = F.floor(s * F.lit(1e6)).cast("decimal(38,0)")
    pos = base.filter(F.col("avail") > 0).select(
        group_col,
        "avail",
        "__b__",
        (F.col("avail") * F.lit(epoch_cap)).cast("bigint").alias("__cap__"),
        wexpr.alias("__w__"),
    )
    # ratio sort: double division is correctly rounded, so the key is
    # engine-identical; ties totally ordered by (avail, group)
    ratio = F.col("__cap__").cast("double") / F.col("__w__").cast("double")
    w = Window.orderBy(ratio, F.col("avail"), F.col(group_col))
    whole = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = pos.select(
        group_col,
        "avail",
        "__cap__",
        "__w__",
        "__b__",
        F.sum("__cap__").over(w).alias("__p__"),
        F.sum("__w__").over(w).alias("__wp__"),
        F.sum("__w__").over(whole).alias("__wt__"),
    )
    num = (F.col("__b__").cast("decimal(38,0)")
           - (F.col("__p__") - F.col("__cap__")).cast("decimal(38,0)"))
    den = F.col("__wt__") - (F.col("__wp__") - F.col("__w__"))
    qualifies = num * F.col("__w__") <= F.col("__cap__").cast(
        "decimal(38,0)"
    ) * den
    flagged = ranked.select(
        group_col,
        "avail",
        "__cap__",
        "__w__",
        F.when(
            qualifies, num.cast("double") / den.cast("double")
        ).alias("__s__"),
    )
    # the true scale is the FIRST qualifying row's s; later qualifying
    # rows' s only shrink (each skipped row's cap exceeds its
    # proportional share at the pivot scale) — MAX selects the pivot's
    scale = F.max("__s__").over(whole)
    c = F.col("__cap__").cast("double")
    share = scale * F.col("__w__").cast("double")
    alloc = flagged.select(
        group_col,
        F.col("avail").alias("avail_tokens"),
        F.col("__cap__").alias("cap_tokens"),
        F.round(
            F.when(scale.isNull(), c).otherwise(F.least(c, share)), 4
        ).alias("allocation"),
        F.when(scale.isNull(), F.lit(True)).otherwise(c <= share).alias(
            "capped"
        ),
        F.round(scale, 6).alias("scale"),
    )
    zeros = base.filter(F.col("avail") <= 0).select(
        group_col,
        F.col("avail").alias("avail_tokens"),
        F.lit(0).cast("bigint").alias("cap_tokens"),
        F.lit(0.0).alias("allocation"),
        F.lit(True).alias("capped"),
        F.lit(None).cast("double").alias("scale"),
    )
    return alloc.unionByName(zeros)
