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
    "grouped_ntile_multi",
    "grouped_prefix_sum",
    "grouped_gini",
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


def _q(name: str) -> str:
    """Backquote an identifier for generated SQL."""
    return "`" + name.replace("`", "``") + "`"


def _null_guarded_key_sql(key_col: str, ascending: bool) -> str:
    """The sign-adjusted double sort key as ONE flat SQL expression,
    with the rank family's loud NULL-key contract (a NULL key would
    silently drop at the bucket join — raise executor-side instead).
    Flat string = one py4j call; the Column-object spelling cost ~10
    round-trips of pure plan-build latency per key."""
    msg = (
        f"grouped_rank family: NULL sort key in {key_col!r} — "
        "the funnel-free rank contract requires non-null keys "
        "(NULL rows would silently drop at the bucket join); "
        "filter or coalesce them first"
    )
    key = f"CAST({_q(key_col)} AS DOUBLE)"
    if not ascending:
        key = f"(- {key})"
    return (
        f'CASE WHEN {_q(key_col)} IS NULL THEN '
        f'CAST(raise_error("{msg}") AS DOUBLE) ELSE {key} END'
    )


def _order_by_sql(
    key_col: str, ascending: bool, tiebreak: list[str]
) -> str:
    """``ORDER BY`` body: the ORIGINAL key (exact type compare — the
    double cast is only for bucketing) then ascending tiebreaks.
    ASC/DESC carry Spark's default null ordering, matching the
    ``Column.asc()/.desc()`` spelling this replaces."""
    head = f"{_q(key_col)} {'ASC' if ascending else 'DESC'}"
    return ", ".join([head] + [f"{_q(c)} ASC" for c in tiebreak])


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
    # Contract enforcement (round-7 ADVICE): a NULL sort key would get
    # a NULL __bkt__ and be SILENTLY DROPPED at the inner join on
    # __bkt__ — unlike the window spelling this family replaces, which
    # ranks NULLs. Fail loudly executor-side instead of losing rows;
    # callers with nullable keys must filter or coalesce first.
    #
    # ONE selectExpr over a flat generated SQL string (round-9): the
    # Column-object spelling of this CASE cost ~10 py4j round-trips
    # per call — plan-BUILD time, the measured dominant constant of
    # the rank family at rollup scale (grouped_ntile_multi built its
    # plan in 0.9 s on TRIVIAL data before this rewrite).
    keyed = df.selectExpr(
        "*", _null_guarded_key_sql(key_col, ascending) + " AS __key__"
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
    # ONE F.expr over a flat generated SQL string: building this as a
    # Python sum of |cuts| Column objects costs one py4j round-trip
    # per term — measured as the dominant constant of the whole rank
    # family at rollup scale (plan BUILD time, before Spark even
    # plans). The flat string is a single py4j call and compiles to
    # the same whole-stage-codegen comparison chain.
    # one projection tags AND drops the cut vector (each DataFrame op
    # is an eager re-analysis of the whole plan — fuse where possible)
    return tagged.selectExpr(
        *[_q(c) for c in keyed.columns],
        _bucket_sql("__key__", "__cuts__", len(pcts)) + " AS __bkt__",
    )


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
    # exclusive prefix over the bounded (group, bucket) frame — flat
    # window-expression strings (one selectExpr = one py4j call; the
    # Window-object spelling was measured plan-build overhead)
    over_pc = ("PARTITION BY " + ", ".join(_q(c) for c in pc) + " ") if pc else ""
    offsets = counts.selectExpr(
        *[_q(c) for c in pc],
        "__bkt__",
        f"COALESCE(SUM(__cnt__) OVER ({over_pc}ORDER BY __bkt__ "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS __off__",
        f"CAST(SUM(__cnt__) OVER ({over_pc.strip()}) AS BIGINT) AS __n__",
    )
    # order within the bucket by the ORIGINAL key (exact type compare —
    # the double cast is only for bucketing, where monotone-with-
    # possible-collisions is enough; e.g. wide decimals that collide in
    # double still rank exactly here)
    part = ", ".join([_q(c) for c in pc] + ["__bkt__"])
    rank_sql = (
        f"CAST(ROW_NUMBER() OVER (PARTITION BY {part} "
        f"ORDER BY {_order_by_sql(key_col, ascending, tb)}) "
        f"+ __off__ AS BIGINT) AS {_q(rank_col)}"
    )
    out = tagged.join(F.broadcast(offsets), [*pc, "__bkt__"])
    keep = [_q(c) for c in df.columns] + [rank_sql]
    if n_col:
        keep.append(f"__n__ AS {_q(n_col)}")
    return out.selectExpr(*keep)


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
    tile = _ntile_expr("__rk__", "__gn__", int(n_tiles))
    return ranked.withColumn(tile_col, tile).select(*df.columns, tile_col)


def _bucket_sql(key_col: str, cuts_col: str, n_cuts: int) -> str:
    """Monotone quantile-bucket tag as ONE flat SQL expression: the
    count of cut values strictly below the key. Generated as a single
    string so plan construction is one py4j call, and kept as a flat
    comparison sum (not an array fold) so whole-stage codegen
    compiles it."""
    terms = " + ".join(
        f"(CASE WHEN {key_col} > {cuts_col}[{i}] THEN 1 ELSE 0 END)"
        for i in range(n_cuts)
    )
    return f"CAST({terms} AS BIGINT)"


def _ntile_sql(rk_col: str, n_col: str, k: int) -> str:
    """Closed-form SQL NTILE(k) from an exact 1-based rank and the
    group size: with N rows, q = N div k, r = N mod k, the first r
    tiles take q+1 rows, the rest q — bit-identical to the window
    form. GREATEST guards q=0 (N < k: everyone is in the head)."""
    return (
        f"CAST(CASE WHEN ({rk_col} - 1) < ({n_col} % {k}) * (({n_col} DIV {k}) + 1) "
        f"THEN ({rk_col} - 1) DIV (({n_col} DIV {k}) + 1) + 1 "
        f"ELSE ({n_col} % {k}) "
        f"  + (({rk_col} - 1) - ({n_col} % {k}) * (({n_col} DIV {k}) + 1)) "
        f"    DIV GREATEST({n_col} DIV {k}, 1) + 1 END AS BIGINT)"
    )


def _ntile_expr(rk_col: str, n_col: str, k: int) -> Column:
    return F.expr(_ntile_sql(rk_col, n_col, k))


def grouped_ntile_multi(
    df: DataFrame,
    n_tiles: int,
    specs: list[tuple[str, bool, str]],
    tiebreak: list[str] | None = None,
    partition_cols: list[str] | None = None,
    buckets: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(n_tiles)`` over SEVERAL orderings of the SAME
    frame in one fused pass — ``specs`` is a list of
    ``(key_col, ascending, tile_col)``; output = ``df`` plus one tile
    column per spec, each bit-identical to
    :func:`grouped_ntile`'s (and so to the naive window's) answer.

    Why not three :func:`grouped_ntile` calls joined back on the row
    key (the round-7 ``user_rfm_segments`` spelling)? Each call pays
    its own cuts aggregate, its own pinned tagged frame, and — the
    real constant — a data-sized shuffle JOIN back onto the scored
    frame. Fused: ONE cuts aggregate computes every spec's quantile
    vector (one ``percentile_approx`` per key in a single bounded
    agg), ONE pinned tagged frame carries every spec's bucket tag,
    ONE broadcast map-lookup join carries every spec's bucket offsets,
    and every spec's rank window sits in a single projection — row
    identity is preserved, so there is NO data-sized join-back at
    all. The only data-path exchanges left are the per-spec bucket
    windows (unavoidable: each ordering must sort once). Measured on
    ``user_rfm_segments`` at sf0.1: 3.2 s → ~1.5 s min-of-3.

    Same contract as :func:`grouped_rank`: keys numeric + non-null
    (loud executor-side failure otherwise), ``(key, *tiebreak)`` a
    total order within each group. The per-spec bucket tags keep the
    reserved ``__bkt__`` prefix (``__bkt__0``, ``__bkt__1``, …) so
    plan audits (``tools/window_lint.py``, ``tests/test_plans.py``)
    recognize the balanced-tag partitioning.
    """
    if n_tiles < 1:
        raise ValueError(f"n_tiles must be >= 1, got {n_tiles}")
    tb = tiebreak or []
    pc = list(partition_cols or [])
    b = buckets or df.sparkSession.sparkContext.defaultParallelism
    from tmdb_index_spark.operators.materialize import pin_frame

    # one keyed projection: every spec's sign-adjusted double key,
    # with the grouped_rank family's loud NULL-key contract. ONE
    # selectExpr over flat generated SQL — per-Column py4j round-trips
    # were the measured dominant constant at rollup scale (this
    # function built its plan in 0.9 s on TRIVIAL data before the
    # round-9 string rewrite).
    keyed = df.selectExpr(
        "*",
        *[
            _null_guarded_key_sql(key_col, ascending) + f" AS __key__{i}"
            for i, (key_col, ascending, _tile) in enumerate(specs)
        ],
    )
    keyed = pin_frame(keyed)
    pcts = [i / b for i in range(1, b)]
    if pcts:
        # ONE bounded aggregate for every spec's cut vector. Pinned:
        # `tagged` below is deliberately NOT pinned (it is a trivial
        # broadcast-join projection over the cached `keyed`, recomputed
        # per consumer), so the cuts frame must be single-evaluation on
        # its own — two independent percentile_approx sketch merges
        # could return different cut vectors and desynchronize the
        # histogram from the window-side bucket tags.
        arr = ", ".join(repr(p) for p in pcts)
        cuts = [
            F.expr(
                f"percentile_approx(__key__{i}, array({arr}), 1000)"
            ).alias(f"__cuts__{i}")
            for i in range(len(specs))
        ]
        cc = pin_frame(
            keyed.groupBy(*pc).agg(*cuts) if pc else keyed.agg(*cuts)
        )
        tagged = (
            keyed.join(F.broadcast(cc), pc)
            if pc
            else keyed.crossJoin(F.broadcast(cc))
        )
        # one projection tags every spec AND drops the cut vectors
        tagged = tagged.selectExpr(
            *[_q(c) for c in keyed.columns],
            *[
                _bucket_sql(f"__key__{i}", f"__cuts__{i}", len(pcts))
                + f" AS __bkt__{i}"
                for i in range(len(specs))
            ],
        )
    else:  # buckets == 1
        tagged = keyed.selectExpr(
            "*",
            *[
                f"CAST(0 AS BIGINT) AS __bkt__{i}"
                for i in range(len(specs))
            ],
        )
    # Pinned: the histogram branch and every chained window consume it
    # — unpinned, each re-derives the broadcast join + projections
    # (measured +35% on user_rfm_segments even over the cached keyed).
    tagged = pin_frame(tagged)
    # ONE fused histogram for every spec (vs |specs| separate groupBys
    # — each a full stage pair of pure scheduling overhead at rollup
    # scale): explode each row into (spec index, bucket) pairs, count
    # once, and derive every spec's exclusive offsets + group size from
    # the single bounded (|groups|·|specs|·|buckets|) frame.
    structs = ", ".join(
        f"named_struct('__d__', {i}, '__bkt__', __bkt__{i})"
        for i in range(len(specs))
    )
    hist = (
        tagged.selectExpr(
            *[_q(c) for c in pc], f"inline(array({structs}))"
        )
        .groupBy(*pc, "__d__", "__bkt__")
        .agg(F.count(F.lit(1)).alias("__cnt__"))
    )
    over_d = "PARTITION BY " + ", ".join(
        [_q(c) for c in pc] + ["__d__"]
    )
    offsets = hist.selectExpr(
        *[_q(c) for c in pc],
        "__d__",
        "__bkt__",
        f"COALESCE(SUM(__cnt__) OVER ({over_d} ORDER BY __bkt__ "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS __off__",
        f"CAST(SUM(__cnt__) OVER ({over_d}) AS BIGINT) AS __gn__",
    )
    # ONE broadcast map-lookup join instead of |specs| join-backs.
    # Every DataFrame transformation is eagerly ANALYZED over the
    # whole accumulated plan (measured ~100 ms per join at rollup
    # scale — plan-BUILD latency, before any execution), so the
    # chained per-spec join form paid |specs| plan merges. Pivot the
    # bounded offsets frame into one row per group carrying a
    # bucket→(off, n) map per spec, broadcast it once, and let each
    # spec's rank window read its offset with a map lookup (keys
    # exist by construction: a row's own bucket always contributed to
    # the histogram, so the ANSI strict map access never misses).
    wide = offsets.groupBy(*pc).agg(
        *[
            F.expr(
                f"map_from_entries(collect_list(CASE WHEN __d__ = {i} "
                "THEN struct(__bkt__, struct(__off__, __gn__)) END))"
            ).alias(f"__m{i}__")
            for i in range(len(specs))
        ]
    )
    out = (
        tagged.join(F.broadcast(wide), pc)
        if pc
        else tagged.crossJoin(F.broadcast(wide))
    )
    # extract the scalar lookups FIRST and drop the map columns — the
    # rank windows sit ABOVE this projection, so whatever it emits
    # rides every per-spec window exchange; two bigints per spec are
    # fine, |buckets|-entry maps per row are not (the rollup is
    # data-proportional at scale)
    out = out.selectExpr(
        *[_q(c) for c in tagged.columns],
        *[
            e
            for i in range(len(specs))
            for e in (
                f"__m{i}__[__bkt__{i}].__off__ AS __off{i}__",
                f"__m{i}__[__bkt__{i}].__gn__ AS __gn{i}__",
            )
        ],
    )
    # all specs' ranks in ONE projection — the analyzer extracts one
    # Window operator per distinct partitioning, the same per-spec
    # exchange+sort as the chained form, minus the joins — then every
    # tile in a second projection.
    rank_exprs = []
    for i, (key_col, ascending, _tile) in enumerate(specs):
        part = ", ".join([_q(c) for c in pc] + [f"__bkt__{i}"])
        rank_exprs.append(
            f"CAST(ROW_NUMBER() OVER (PARTITION BY {part} "
            f"ORDER BY {_order_by_sql(key_col, ascending, tb)}) "
            f"+ __off{i}__ AS BIGINT) AS __rk{i}__"
        )
    out = out.selectExpr("*", *rank_exprs)
    return out.selectExpr(
        *[_q(c) for c in df.columns],
        *[
            _ntile_sql(f"__rk{i}__", f"__gn{i}__", int(n_tiles))
            + f" AS {_q(tile_col)}"
            for i, (_k, _a, tile_col) in enumerate(specs)
        ],
    )


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
    over_pc = (
        "PARTITION BY " + ", ".join(_q(c) for c in pc) + " "
    ) if pc else ""
    offsets = bsums.selectExpr(
        *[_q(c) for c in pc],
        "__bkt__",
        *[
            f"COALESCE(SUM({_q(f'__bs_{out}__')}) OVER ({over_pc}"
            "ORDER BY __bkt__ ROWS BETWEEN UNBOUNDED PRECEDING AND "
            f"1 PRECEDING), 0) AS {_q(f'__off_{out}__')}"
            for out in sum_cols
        ],
    )
    part = ", ".join([_q(c) for c in pc] + ["__bkt__"])
    win = (
        f"OVER (PARTITION BY {part} "
        f"ORDER BY {_order_by_sql(key_col, ascending, [])} "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    out = tagged.join(F.broadcast(offsets), [*pc, "__bkt__"])
    return out.selectExpr(
        *[_q(c) for c in df.columns],
        *[
            f"SUM({_q(src)}) {win} + {_q(f'__off_{name}__')} AS {_q(name)}"
            for name, src in sum_cols.items()
        ],
    )


def grouped_gini(
    df: DataFrame,
    value_col: str,
    tiebreak: list[str],
    partition_cols: list[str] | None = None,
    n_col: str = "n",
    sum_col: str = "sum_w",
    gini_col: str = "gini",
    buckets: int | None = None,
) -> DataFrame:
    """Per-group Gini coefficient from the sorted-rank identity
    ``G = Σ(2i − n − 1)·x_i / (n·Σx)`` — the :func:`grouped_rank`
    machinery SPECIALIZED to its aggregate consumer, with two fusions
    the generic rank path cannot make:

    * **No join-back, no offsets join.** The generic path ranks every
      row (bucket window + broadcast offsets join) and re-aggregates.
      Here the per-bucket window feeds a ``GROUP BY (group, bucket)``
      DIRECTLY — same keys as the window partition, so the aggregate
      reuses the window's exchange — emitting per-bucket
      ``(cnt, Σx, Σ(2·wr−1)·x)``; global ranks never materialize.
      With ``i = off_b + wr``: ``Σ(2i−1)x = Σ_b[w_b + 2·off_b·S_b]``,
      and the bucket offsets come from a window over the BOUNDED
      per-bucket frame. For decimal inputs every term is
      decimal-exact, so the result is bit-identical to the per-row
      rank spelling (and to a SQL oracle ranking with
      ``ROW_NUMBER``); for float inputs summation order differs —
      pass decimals when parity matters.
    * **One-statement construction.** Every DataFrame transformation
      is eagerly re-ANALYZED over the whole accumulated plan — the
      measured dominant constant of the rank family at rollup scale
      (plan build, before any execution). After the pinned keyed
      frame, the entire computation is ONE ``spark.sql`` statement
      over a uuid-scoped temp view (dropped immediately — the
      analyzed plan owns the resolved subtree, not the name):
      measured ~0.2 s construction vs ~0.8 s for the op-chained form.

    ``(value_col, *tiebreak)`` must be a total order within each
    group; ``value_col`` numeric and non-null (loud executor-side
    failure otherwise — the family contract). The cuts CTE is
    consumed exactly once inside the single statement, so the
    percentile sketch single-evaluation hazard does not arise.

    Returns one row per group: ``partition_cols…, n_col`` (BIGINT
    count), ``sum_col`` (DOUBLE Σx), ``gini_col`` (DOUBLE,
    unrounded).
    """
    import uuid

    from tmdb_index_spark.operators.materialize import pin_frame

    spark = df.sparkSession
    pc = list(partition_cols or [])
    b = buckets or spark.sparkContext.defaultParallelism
    keyed = df.selectExpr(
        "*", _null_guarded_key_sql(value_col, True) + " AS __key__"
    )
    keyed = pin_frame(keyed)  # cuts + tagged both consume it
    view = f"__gini_keyed_{uuid.uuid4().hex[:12]}"
    keyed.createOrReplaceTempView(view)
    pc_q = ", ".join(_q(c) for c in pc)
    on_pc = " AND ".join(f"k.{_q(c)} = cuts.{_q(c)}" for c in pc)
    join_cuts = (
        f"JOIN ({{cuts}}) cuts ON {on_pc}"
        if pc
        else "CROSS JOIN ({cuts}) cuts"
    ).format(
        cuts=(
            "SELECT "
            + (pc_q + ", " if pc else "")
            + "percentile_approx(__key__, array("
            + ", ".join(repr(i / b) for i in range(1, b))
            + f"), 1000) AS __cuts__ FROM {view}"
            + (f" GROUP BY {pc_q}" if pc else "")
        )
    )
    order_by = _order_by_sql(value_col, True, tiebreak)
    over_grp = f"PARTITION BY {pc_q}" if pc else ""
    grp_by = f"GROUP BY {pc_q}" if pc else ""
    pc_sel = (pc_q + ", ") if pc else ""
    pc_bkt = (pc_q + ", " if pc else "") + "__bkt__"
    tagged_sql = (
        f"SELECT /*+ BROADCAST(cuts) */ k.*, "
        f"{_bucket_sql('__key__', '__cuts__', b - 1)} AS __bkt__ "
        f"FROM {view} k {join_cuts}"
        if b > 1
        else f"SELECT *, CAST(0 AS BIGINT) AS __bkt__ FROM {view}"
    )
    result = spark.sql(f"""
      WITH tagged AS (
        {tagged_sql}
      ),
      ranked AS (
        SELECT {pc_sel}__bkt__, {_q(value_col)},
               ROW_NUMBER() OVER (PARTITION BY {pc_bkt}
                 ORDER BY {order_by}) AS __wr__
        FROM tagged
      ),
      perb AS (
        SELECT {pc_sel}__bkt__,
               COUNT(1) AS __cnt__,
               SUM({_q(value_col)}) AS __sx__,
               SUM(CAST(2 * CAST(__wr__ AS BIGINT) - 1 AS DECIMAL(20,0))
                   * {_q(value_col)}) AS __w__
        FROM ranked
        GROUP BY {pc_bkt}
      ),
      offs AS (
        SELECT *, COALESCE(SUM(__cnt__) OVER ({over_grp} ORDER BY __bkt__
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS __off__
        FROM perb
      )
      SELECT {pc_sel}
             CAST(SUM(__cnt__) AS BIGINT) AS {_q(n_col)},
             CAST(SUM(__sx__) AS DOUBLE) AS {_q(sum_col)},
             (CAST(SUM(__w__ + CAST(2 * __off__ AS DECIMAL(20,0)) * __sx__) AS DOUBLE)
              - (CAST(SUM(__cnt__) AS BIGINT) + 1) * CAST(SUM(__sx__) AS DOUBLE))
             / (CAST(SUM(__cnt__) AS BIGINT) * CAST(SUM(__sx__) AS DOUBLE))
               AS {_q(gini_col)}
      FROM offs {grp_by}
    """)
    spark.catalog.dropTempView(view)
    return result


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
