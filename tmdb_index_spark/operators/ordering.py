"""Deterministic global ordering without a global funnel.

A training pipeline needs a reproducible global order twice: to
shuffle a corpus deterministically (fixed seed → same training order
on every run) and to assign contiguous positions (shard offsets,
resume points). The naive Spark spelling —
``row_number() OVER (ORDER BY key)`` — is an ``Exchange
SinglePartition``: every row through ONE task, the canonical
100 TB-killer. And the tempting fix — ``repartitionByRange`` + a
per-partition offset pass — is subtly broken: the range sampler draws
new boundaries per JOB, so a separate counting job can disagree with
the positioning job's partitions.

:func:`global_row_positions` instead derives buckets from the DATA in
one lineage:

1. bucket = a monotone function of the key (equal keys → equal
   bucket), scaled into ``buckets`` bins from the key's [min, max]
   (1-row aggregate, broadcast — never collected);
2. per-bucket counts → exclusive running offsets (a window over
   |buckets| rows — bounded by the bucket count, not by N);
3. position = bucket offset + (row_number within bucket − 1); the
   within-bucket window partitions by bucket, fully parallel.

Because the bucket function is monotone in the key, bucket-major order
IS global key order, and positions are exact 0..N−1 ranks —
deterministic for any partitioning, any cluster size, any sampler.

Balance caveat: bucket sizes mirror the key distribution. For the
shuffle use-case the key is a uniform md5 hash, so buckets are even;
for skewed natural keys positions stay CORRECT but one bucket may
dominate — pass a hash of the key instead when balance matters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "global_row_positions",
    "deterministic_shuffle",
    "grouped_rank",
    "grouped_ntile",
    "grouped_prefix_sum",
]


def global_row_positions(
    df: DataFrame,
    key_col: str,
    tiebreak: list[str] | None = None,
    pos_col: str = "pos",
    buckets: int | None = None,
) -> DataFrame:
    """Append ``pos_col``: the 0-based global rank of each row under
    ``(key_col, *tiebreak)`` ascending. ``key_col`` must be numeric;
    ``(key_col, *tiebreak)`` must be a total order (unique) or
    equal rows receive arbitrary-but-disjoint positions.
    """
    tb = tiebreak or []
    b = buckets or df.sparkSession.sparkContext.defaultParallelism
    key = F.col(key_col)
    mm = df.agg(
        F.min(key).cast("double").alias("__lo__"),
        F.max(key).cast("double").alias("__hi__"),
    )
    # monotone in key; equal keys -> equal bucket; max key -> bucket b-1
    bucket = F.least(
        F.floor(
            (key.cast("double") - F.col("__lo__"))
            * b
            / (F.col("__hi__") - F.col("__lo__") + 1.0)
        ),
        F.lit(b - 1),
    ).cast("long")
    tagged = df.crossJoin(F.broadcast(mm)).withColumn("__bkt__", bucket)
    # |buckets| rows: the one intentionally-tiny single-partition window
    counts = tagged.groupBy("__bkt__").agg(F.count(F.lit(1)).alias("__cnt__"))
    woff = Window.orderBy("__bkt__").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = counts.select(
        "__bkt__",
        (F.sum("__cnt__").over(woff) - F.col("__cnt__")).alias("__off__"),
    )
    w = Window.partitionBy("__bkt__").orderBy(
        key, *[F.col(c) for c in tb]
    )
    return (
        tagged.join(F.broadcast(offsets), "__bkt__")
        .withColumn(
            pos_col,
            (F.row_number().over(w) - 1 + F.col("__off__")).cast("long"),
        )
        .drop("__bkt__", "__off__", "__lo__", "__hi__")
    )


def _tag_buckets(
    df: DataFrame,
    key_col: str,
    partition_cols: list[str],
    buckets: int,
    ascending: bool,
    pin: bool = True,
) -> DataFrame:
    """Tag each row with ``__key__`` (the sign-adjusted double sort key)
    and ``__bkt__`` (a monotone quantization of that key into at most
    ``buckets`` bins per partition group). Equal keys always land in
    equal buckets, and bucket-major order IS key order within a group,
    so any downstream per-bucket window plus a bounded per-(group,
    bucket) offset frame reproduces the exact global per-group order —
    with no single-partition Exchange over data.

    Bin boundaries are DATA-DERIVED QUANTILES (``percentile_approx``
    over the key, one bounded aggregate per group, broadcast — never
    collected): equal-WIDTH bins mirror the key distribution, and a
    heavy-tailed key (e.g. pairwise slopes massed near 0 inside a
    ±10M range) puts ~all rows in one bin — the single-task sort
    sneaks back in (measured: 2.86M of 2.89M rows in 1 of 32
    equal-width bins). Quantile cuts keep bins balanced for ANY
    distribution; the cut values never affect correctness — any
    monotone bucketing yields identical ranks — only balance, so the
    sketch's approximation error is harmless. The per-row bin is a
    compiled sum of ``key > cut_i`` comparisons (flat expressions,
    whole-stage codegen — not an interpreted array fold).

    The keyed input is PINNED (``pin_frame``): three plan subtrees
    consume it (the cuts aggregate, the per-bucket counts, and the
    final join), and without the pin each re-derives the caller's
    input lineage — measured 9.8× on ``user_rfm_segments``, whose
    three chained ntile passes multiplied the re-derivations. The
    pinned frame is the caller's (usually rollup-sized) input plus one
    double column; callers pass ``pin=False`` for pure lineage (e.g.
    when the input is already pinned).
    """
    key = F.col(key_col).cast("double")
    if not ascending:
        key = -key
    # Contract enforcement (round-7 ADVICE): a NULL sort key would get
    # a NULL __bkt__ and be SILENTLY DROPPED at the inner join on
    # __bkt__ — unlike the window spelling this family replaces, which
    # ranks NULLs. Fail loudly executor-side instead of losing rows;
    # callers with nullable keys must filter or coalesce first.
    keyed = df.withColumn(
        "__key__",
        F.when(
            F.col(key_col).isNull(),
            F.raise_error(
                F.lit(
                    f"grouped_rank family: NULL sort key in {key_col!r} — "
                    "the funnel-free rank contract requires non-null keys "
                    "(NULL rows would silently drop at the bucket join); "
                    "filter or coalesce them first"
                )
            ).cast("double"),
        ).otherwise(key),
    )
    if pin:
        from tmdb_index_spark.operators.materialize import pin_frame

        keyed = pin_frame(keyed)
    pcts = [i / buckets for i in range(1, buckets)]
    if not pcts:  # buckets == 1: everything in bin 0
        return keyed.withColumn("__bkt__", F.lit(0).cast("long"))
    # accuracy 1000 (not the 10k default): cuts only steer BALANCE, so
    # sketch precision buys nothing — a few % bucket-size wobble is
    # invisible while the sketch itself is measurably cheaper to merge
    cuts_agg = F.percentile_approx("__key__", pcts, 1_000).alias("__cuts__")
    if partition_cols:
        cc = keyed.groupBy(*partition_cols).agg(cuts_agg)
    else:
        cc = keyed.agg(cuts_agg)
    # The cuts frame is consumed by TWO duplicated plan subtrees (the
    # counts/offsets branch and the final join). percentile_approx's
    # sketch merge is not exactly order-independent, so two independent
    # evaluations could return different cut vectors — bucket tags on
    # the join side would then disagree with the histogram the offsets
    # came from, silently corrupting ranks. Pinning the (≤|groups|-row)
    # frame makes single-evaluation a guarantee instead of a
    # broadcast-exchange-reuse accident.
    from tmdb_index_spark.operators.materialize import pin_frame

    cc = pin_frame(cc)
    if partition_cols:
        tagged = keyed.join(F.broadcast(cc), partition_cols)
    else:
        tagged = keyed.crossJoin(F.broadcast(cc))
    bucket = sum(
        (F.col("__key__") > F.col("__cuts__").getItem(i)).cast("int")
        for i in range(len(pcts))
    ).cast("long")
    return tagged.withColumn("__bkt__", bucket).drop("__cuts__")


def grouped_rank(
    df: DataFrame,
    key_col: str,
    tiebreak: list[str] | None = None,
    partition_cols: list[str] | None = None,
    rank_col: str = "rank",
    n_col: str | None = None,
    ascending: bool = True,
    buckets: int | None = None,
    pin: bool = True,
) -> DataFrame:
    """Exact 1-based ``row_number`` rank of each row under
    ``(key_col, *tiebreak)`` within each ``partition_cols`` group —
    WITHOUT the single-partition (or few-huge-groups) WindowExec the
    naive ``row_number().over(Window...orderBy(...))`` spelling
    compiles to.

    The naive form funnels every group through one task; with no
    partition columns that is the whole frame, and with dim-bounded
    partition columns (25 nations over per-customer rollups) each task
    still sorts a DATA-PROPORTIONAL slice. Here the sort key is
    quantized into ``buckets`` monotone bins (:func:`_tag_buckets`),
    per-(group, bucket) counts become exclusive running offsets — a
    window over the |groups|·|buckets| BOUNDED frame — and the
    expensive ordered window partitions by (group, bucket), fully
    parallel. Identical output to the naive window for any total order.

    ``key_col`` must be numeric and non-null; ``(key_col, *tiebreak)``
    should be a total order within each group (ties get
    arbitrary-but-disjoint ranks, as with ``row_number``). ``n_col``
    optionally emits the group size alongside (needed by
    :func:`grouped_ntile`'s tile rule). Balance caveat as
    :func:`global_row_positions`: bucket sizes mirror the key
    distribution, positions stay correct regardless.
    """
    tb = tiebreak or []
    pc = list(partition_cols or [])
    b = buckets or df.sparkSession.sparkContext.defaultParallelism
    tagged = _tag_buckets(df, key_col, pc, b, ascending, pin=pin)
    counts = tagged.groupBy(*pc, "__bkt__").agg(
        F.count(F.lit(1)).alias("__cnt__")
    )
    # exclusive prefix over the bounded (group, bucket) frame
    woff = (
        Window.partitionBy(*pc)
        .orderBy("__bkt__")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wtot = Window.partitionBy(*pc) if pc else Window.partitionBy(F.lit(1))
    offsets = counts.select(
        *pc,
        "__bkt__",
        F.coalesce(F.sum("__cnt__").over(woff), F.lit(0)).alias("__off__"),
        F.sum("__cnt__").over(wtot).cast("long").alias("__n__"),
    )
    # order within the bucket by the ORIGINAL key (exact type compare —
    # the double cast is only for bucketing, where monotone-with-
    # possible-collisions is enough; e.g. wide decimals that collide in
    # double still rank exactly here)
    okey = F.col(key_col).asc() if ascending else F.col(key_col).desc()
    w = Window.partitionBy(*pc, "__bkt__").orderBy(
        okey, *[F.col(c).asc() for c in tb]
    )
    out = tagged.join(F.broadcast(offsets), [*pc, "__bkt__"]).withColumn(
        rank_col, (F.row_number().over(w) + F.col("__off__")).cast("long")
    )
    keep = [*df.columns, rank_col] + ([n_col] if n_col else [])
    if n_col:
        out = out.withColumn(n_col, F.col("__n__"))
    return out.select(*keep)


def grouped_ntile(
    df: DataFrame,
    n_tiles: int,
    key_col: str,
    tiebreak: list[str] | None = None,
    partition_cols: list[str] | None = None,
    tile_col: str = "tile",
    ascending: bool = True,
    buckets: int | None = None,
    pin: bool = True,
) -> DataFrame:
    """Exact ``NTILE(n_tiles)`` over ``(key_col, *tiebreak)`` per
    ``partition_cols`` group, computed from :func:`grouped_rank`'s
    funnel-free exact ranks plus the closed-form SQL tile rule (with
    N rows, q = N div n, r = N mod n: the first r tiles take q+1 rows,
    the rest q) — bit-identical to the window form, no
    single-partition sort anywhere. Same key/tiebreak requirements as
    :func:`grouped_rank`.
    """
    if n_tiles < 1:
        raise ValueError(f"n_tiles must be >= 1, got {n_tiles}")
    ranked = grouped_rank(
        df,
        key_col,
        tiebreak=tiebreak,
        partition_cols=partition_cols,
        rank_col="__rk__",
        n_col="__gn__",
        ascending=ascending,
        buckets=buckets,
        pin=pin,
    )
    k = int(n_tiles)
    # 0-based position p; head = r*(q+1) rows live in the oversized
    # tiles; GREATEST guards q=0 (N < k: everyone is in the head).
    tile = F.expr(
        f"CASE WHEN (__rk__ - 1) < (__gn__ % {k}) * ((__gn__ DIV {k}) + 1) "
        f"THEN (__rk__ - 1) DIV ((__gn__ DIV {k}) + 1) + 1 "
        f"ELSE (__gn__ % {k}) "
        f"  + ((__rk__ - 1) - (__gn__ % {k}) * ((__gn__ DIV {k}) + 1)) "
        f"    DIV GREATEST(__gn__ DIV {k}, 1) + 1 END"
    ).cast("long")
    return ranked.withColumn(tile_col, tile).select(*df.columns, tile_col)


def grouped_prefix_sum(
    df: DataFrame,
    key_col: str,
    sum_cols: dict[str, str],
    partition_cols: list[str] | None = None,
    ascending: bool = True,
    buckets: int | None = None,
    pin: bool = True,
) -> DataFrame:
    """Inclusive running sums ordered by ``key_col`` within each
    ``partition_cols`` group — the CDF/step-function primitive —
    without the single-partition ordered window the naive
    ``sum(x).over(Window.orderBy(key))`` compiles to.

    ``sum_cols`` maps output column → input column. ``key_col`` must
    be numeric, non-null, and UNIQUE within each group (collapse to
    per-key aggregates first — the step-CDF use always has); with
    duplicate keys the within-tie accumulation order would be
    arbitrary. Shape: per-(group, bucket) partial sums → exclusive
    bucket offsets over the bounded (group, bucket) frame → per-bucket
    inclusive window + offset. Sum dtypes follow Spark's ``sum``
    widening of the inputs.
    """
    pc = list(partition_cols or [])
    b = buckets or df.sparkSession.sparkContext.defaultParallelism
    tagged = _tag_buckets(df, key_col, pc, b, ascending, pin=pin)
    bsums = tagged.groupBy(*pc, "__bkt__").agg(
        *[F.sum(src).alias(f"__bs_{out}__") for out, src in sum_cols.items()]
    )
    woff = (
        Window.partitionBy(*pc)
        .orderBy("__bkt__")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bsums.select(
        *pc,
        "__bkt__",
        *[
            F.coalesce(F.sum(f"__bs_{out}__").over(woff), F.lit(0)).alias(
                f"__off_{out}__"
            )
            for out in sum_cols
        ],
    )
    okey = F.col(key_col).asc() if ascending else F.col(key_col).desc()
    win = (
        Window.partitionBy(*pc, "__bkt__")
        .orderBy(okey)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = tagged.join(F.broadcast(offsets), [*pc, "__bkt__"])
    for name, src in sum_cols.items():
        out = out.withColumn(
            name, F.sum(src).over(win) + F.col(f"__off_{name}__")
        )
    return out.select(*df.columns, *sum_cols.keys())


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    seed: int = 0,
    pos_col: str = "pos",
    buckets: int | None = None,
) -> DataFrame:
    """Reproducible corpus shuffle: order rows by the portable 60-bit
    md5 hash of ``key_col`` (salted with ``seed``), tiebroken by the
    key itself, and assign contiguous positions 0..N−1. Same seed →
    same training order on every run, any cluster size. The hash key
    is uniform, so buckets — and the position windows — stay balanced.
    """
    from tmdb_index_spark.functions.text import portable_hash60

    h = portable_hash60(F.col(key_col).cast("string"), seed=seed)
    return global_row_positions(
        df.withColumn("__shufkey__", h),
        "__shufkey__",
        tiebreak=[key_col],
        pos_col=pos_col,
        buckets=buckets,
    ).drop("__shufkey__")
