"""Connected components over a near-duplicate pair list.

The reference stops at PAIR detection (its dedup surface is keep-last /
keep-first over exact keys — ``/root/reference/tmdb_index.py:248-254``);
assembling near-dup pairs into GROUPS (so one canonical doc per group can
be kept) is the north-star extension this module provides.

Spark-first design: iterative **label propagation with pointer jumping**
expressed as DataFrame joins.  Each round does

    label(u) <- min( label(u),                       -- keep
                     min over neighbors v of label(v),  -- neighbor-min
                     label(label(u)) )                  -- pointer jump

Neighbor-min alone converges in O(diameter) rounds; the pointer-jump term
halves label-chains each round, giving O(log d) rounds like the
large-star/small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) while staying two joins + one aggregation
per round.  ``localCheckpoint`` truncates lineage every round so the plan
stays flat no matter how many iterations run.

Scale notes (100 TB): each round is bounded by two shuffles of the edge
list.  A giant component concentrates one ``component`` value but the
joins stay keyed on ``node`` (unique) — the one skewable hash join
(pointer jump probe side) is handled by AQE skew-join splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """``(node, component)`` for every node appearing in ``pairs``.

    ``component`` is the minimum node id in the node's connected
    component — a deterministic canonical representative, so the result
    is reproducible across runs/engines (the DuckDB oracle computes the
    same labels via a recursive-CTE transitive closure).
    """
    import shutil
    import tempfile

    from tmdb_index_spark.operators.materialize import register_pin

    spark = pairs.sparkSession
    # Both edge directions come from ONE pass over the pair list: the
    # former union(select(a,b), select(b,a)) spelling executed the
    # whole upstream pair-search pipeline once PER BRANCH (pairs is not
    # pinned, and Spark does not share unpinned subtrees across union
    # arms) — measured as ~2.4 s of duplicated SimHash+join work per
    # CC-family query at sf0.1, and a duplicated full candidate-search
    # pass at any scale (guide §2.4: remove shuffles/passes outright).
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src).alias("a"), F.col(dst).alias("b")
                    ),
                    F.struct(
                        F.col(dst).alias("a"), F.col(src).alias("b")
                    ),
                )
            ).alias("__e__")
        )
        .select(F.col("__e__.a").alias("a"), F.col("__e__.b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # register with the pin ledger: these eager checkpoint blocks
    # otherwise outlive the query (freed only on driver GC +
    # ContextCleaner), and two CC-family queries back-to-back at the
    # 100x stress scale OOMed a 48g heap on the ACCUMULATED blocks —
    # release_pins() between bench/stress passes now frees them
    register_pin(edges)
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    # Each round materializes the new labels to parquet and reads them
    # back. This both truncates lineage AND resets Catalyst statistics —
    # localCheckpoint keeps the origin plan's stats, so iterated join
    # size estimates compound multiplicatively and the BigInteger
    # sizeInBytes doubles in bit-length every round (measured: by round
    # 12 the driver spent >60s/round inside BigInteger.multiplyKaratsuba
    # re-estimating plans while executors sat idle). A parquet round-trip
    # gives the next round a plain file relation with true, small stats;
    # it is also the restart-safe pattern a 1000-executor run wants.
    def step(lab: DataFrame, mark: str | None = None) -> DataFrame:
        """One label-propagation round: (node, component) -> the same
        frame with ``component`` replaced by min(keep, neighbor-min,
        pointer-jump). With ``mark``, additionally emit a 0/1 column
        flagging rows THIS round improved — the convergence probe
        rides the round's own projection instead of a separate
        old-vs-new join (round 15; the label before the ``least`` IS
        the round's input, so no extra plan subtree is embedded)."""
        nbr_min = (
            edges.alias("e")
            .join(lab.alias("l"), F.col("e.b") == F.col("l.node"))
            .groupBy(F.col("e.a").alias("node"))
            .agg(F.min("l.component").alias("nbr_min"))
        )
        jump = (
            lab.alias("x")
            .join(lab.alias("y"), F.col("x.component") == F.col("y.node"))
            .select(
                F.col("x.node").alias("node"),
                F.col("y.component").alias("jump_min"),
            )
        )
        new = F.least(
            F.col("component"),
            F.coalesce(F.col("nbr_min"), F.col("component")),
            F.coalesce(F.col("jump_min"), F.col("component")),
        )
        cols = ["node", new.alias("component")]
        if mark is not None:
            cols.append((new < F.col("component")).cast("long").alias(mark))
        return (
            lab.join(nbr_min, "node", "left")
            .join(jump, "node", "left")
            .select(*cols)
        )

    # Per-materialization overheads removed across rounds 14-15 (guide
    # §1/§2 — the loop's wall time was ~80% fixed per-materialization
    # cost at any scale where a round's data fits the cluster: job
    # launch, AQE stage setup, the commit):
    #
    # * the convergence probe was a SECOND job per round
    #   (``filter(new < old).isEmpty()`` re-reading the just-written
    #   parquet); it rides the write itself as an ``observe()``
    #   aggregate (round 14), and since round 15 the improvement flag
    #   is emitted by the final round's OWN projection (``step(...,
    #   mark=...)``) instead of an extra old-vs-new join per batch;
    # * THREE propagation rounds run per parquet materialization
    #   (round 14 batched two): the plan per write is deeper but still
    #   bounded (~12 joins over one parquet-rooted scan, shared
    #   subtrees deduplicated by AQE's exchange reuse), cutting the
    #   materializations 6 → 4 on the sf0.1 bench graph (instrumented
    #   batch count; build jobs 101 → 96). sf0.1 WALL is flat to
    #   noise — the saved round-trips are offset locally by the deeper
    #   plan's driver-side planning/codegen, which is FIXED at scale
    #   while the two saved materializations are full write+reads of
    #   the data-proportional labels frame. Four rounds per write was
    #   measured and REJECTED (warm 16-19 s vs ~9-12 s: the
    #   4^k-reference plan growth ate far more than the saved
    #   round-trip).
    #   Convergence is the LAST round's own improvement count: labels
    #   only ever decrease, so "round 3k changed nothing" means its
    #   input was already a fixpoint and rounds 3k-2/3k-1 were the
    #   final descent — exactly the old per-round fixpoint test. The
    #   converged labels are identical — min node id per component —
    #   whatever the batching, which the unchanged recursive-CTE
    #   oracle pins. ``max_iter`` bounds MATERIALIZATIONS, so the
    #   non-convergence guard now fires after up to 3x the old round
    #   budget (documented round-14 watch item; results unaffected).
    from pyspark.sql import Observation

    tmp = tempfile.mkdtemp(prefix="tmdb_index_spark_cc_")
    try:
        for i in range(max_iter):
            stepped = step(step(step(labels)), mark="__imp__")
            obs = Observation(f"cc_round_{i}")
            path = f"{tmp}/round_{i}"
            stepped.observe(
                obs, F.sum(F.col("__imp__")).alias("improved")
            ).write.mode("overwrite").parquet(path)
            labels = spark.read.parquet(path).select("node", "component")
            if not (obs.get["improved"] or 0):
                # Detach the result from the temp files before cleanup
                # (ledger-registered like the edge frame above).
                out = labels.localCheckpoint(eager=True)
                register_pin(out)
                return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_group_representatives(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Rows to DROP under keep-min-id dedup: every node whose component
    representative is a different (smaller) id.  Joining this against the
    corpus with a left-anti join keeps exactly one doc per near-dup group
    plus all docs in no group."""
    cc = connected_components(pairs, src, dst)
    return cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("drop_id"), F.col("component").alias("keep_id")
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle count of an undirected graph, via the
    degree-ordered edge-orientation algorithm (Cohen, "Graph Twiddling
    in a MapReduce World", CiSE 2009; the MR standard): orient every
    edge from its lower-(degree, id) endpoint to the higher, so each
    triangle is counted exactly once and — the scale point — every
    wedge join fans out from a vertex's OUT-degree, which orientation
    caps at O(√m) even for power-law hubs. A join of the raw adjacency
    against itself costs Σ d(v)²; the oriented join costs Σ d⁺(v)² =
    O(m^1.5) worst case, and a celebrity node with 10^7 neighbors
    stops being a 10^14-wedge task.

    Input edges may carry duplicates, self-loops, or either endpoint
    order; they are canonicalized first. Both joins are equi-joins on
    a vertex key (shuffle- or broadcast-able; AQE splits residual
    skew). Returns one row: ``n_nodes, n_edges, n_triangles``.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # Orient by (degree, id): lower endpoint -> higher endpoint.
    ranked = (
        e.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("deg", "du")
        .join(deg.withColumnRenamed("node", "v"), "v")
        .withColumnRenamed("deg", "dv")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("lo"), F.col("v").alias("hi")),
            )
            .otherwise(
                F.struct(F.col("v").alias("lo"), F.col("u").alias("hi"))
            )
            .alias("o")
        )
        .select(F.col("o.lo").alias("lo"), F.col("o.hi").alias("hi"))
    )
    # Wedges: two oriented edges sharing their low endpoint; the wedge
    # closes iff (hi1, hi2) is itself an edge (canonical order holds
    # because orientation is a total order on vertices).
    wedges = (
        ranked.alias("e1")
        .join(ranked.alias("e2"), F.col("e1.lo") == F.col("e2.lo"))
        .filter(F.col("e1.hi") < F.col("e2.hi"))
        .select(F.col("e1.hi").alias("x"), F.col("e2.hi").alias("y"))
    )
    closing = ranked.select(
        F.least("lo", "hi").alias("cu"), F.greatest("lo", "hi").alias("cv")
    )
    tri = wedges.join(
        closing,
        (F.least("x", "y") == F.col("cu"))
        & (F.greatest("x", "y") == F.col("cv")),
    )
    return (
        tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
        .crossJoin(
            e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
        )
        .crossJoin(
            deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        )
        .select("n_nodes", "n_edges", "n_triangles")
    )


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    damping_ppm: int = 850_000,
) -> DataFrame:
    """PageRank with EXACT fixed-point arithmetic, unrolled into a
    static dataflow — the "iterative algorithm as a plan" pattern.

    Ranks are integers in parts-per-million of a unit rank (1.0 ≡
    10^6). Each iteration is

        contrib(e) = rank(src) div out_degree(src)      -- integer div
        rank'(v)   = (10^6 - d) + d * Σ contrib / 10^6  -- integer ops

    so every operation is integer division/summation: NO float sums
    cross a shuffle, which makes the result bit-identical on any
    engine, partitioning, or aggregation order (a double-summed
    PageRank is order-dependent and cannot be oracle-checked exactly).
    The truncation error of div is < 1 ppm per hop — irrelevant for
    ranking, decisive for reproducibility.

    Scale shape: each iteration is one join of the edge list against
    the (|V|-sized) rank frame on ``src`` plus one groupBy on ``dst``
    — both partitioned by node key; ``iterations`` is a compile-time
    unroll (2-3 suffices for relative ordering on bounded-diameter
    graphs). Dangling nodes (no out-edges) simply stop propagating —
    with a symmetrized edge list none exist. Nodes with no in-edges
    keep the teleport term only, via the left join's COALESCE(0).

    Returns ``(node, rank_ppm)``.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg__"))
    unit = 1_000_000
    teleport = unit - damping_ppm
    rank = nodes.select("node", F.lit(unit).cast("bigint").alias("rank_ppm"))
    for _ in range(iterations):
        contrib = (
            e.join(rank, e.src == rank.node)
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_ppm div __deg__").alias("__c__"),
            )
        )
        in_sum = contrib.groupBy("node").agg(F.sum("__c__").alias("__in__"))
        rank = nodes.join(in_sum, "node", "left").select(
            "node",
            (
                F.lit(teleport).cast("bigint")
                + F.expr(
                    f"({damping_ppm} * coalesce(__in__, 0)) div {unit}"
                ).cast("bigint")
            ).alias("rank_ppm"),
        )
    return rank


def bfs_levels(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    max_hops: int = 3,
    materialize: str | None = None,
) -> DataFrame:
    """Bounded-hop BFS: minimum hop distance (0..``max_hops``) from
    any source node to every reachable node, as a statically-unrolled
    frontier-expansion dataflow — the traversal complement of
    :func:`connected_components` (which answers "same island?" but
    not "how far?").

    Each round expands only the CURRENT frontier — nodes whose min
    distance equals the previous hop — through one keyed join against
    the edge list, then folds discoveries in with a min-aggregate.
    The BFS invariant (every node at min hop h has a predecessor at
    min hop h-1) makes frontier-only expansion exact. Per round: one
    hash join on the node key + one groupBy — both partitioned by
    node, nothing proportional to path counts (levels are
    deduplicated before expanding, so dense graphs cost |edges| per
    round, not |paths|).

    ``max_hops`` is a compile-time unroll like
    :func:`pagerank_fixed_point`'s iterations: plan size is linear in
    it, and at 100 TB each additional hop is one more join stage over
    the same co-partitioned keys. Unreached nodes are absent from the
    output (callers left-join if they want NULL distances).

    ``materialize`` (``None`` | ``'cache'`` | ``'parquet'``) pins the
    edge frame so an expensive edge derivation (a self-join, a Python
    stage) computes once instead of once per hop — see
    `operators/materialize.py`; callers release via ``release_pins``.

    Returns ``(node, hop)`` with ``hop`` the minimum distance.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    e = edges.select(F.col(src).alias("__s__"), F.col(dst).alias("__d__"))
    if materialize is not None:
        # one edge materialization feeds all max_hops expansions
        from tmdb_index_spark.operators.materialize import pin_frame

        e = pin_frame(e, materialize)
    # Frontier-only recursion: level_h = distinct neighbors of
    # level_{h-1}, min-folded ONCE at the end. Folding per round
    # (dist = union(dist, next).groupBy.min) reads each round's frame
    # twice — filter + union — so lineage doubles per hop; here every
    # level frame is embedded once in the next level and once in the
    # final union, keeping the plan linear in max_hops. Expanding a
    # full level instead of the true min-frontier is exact: extra
    # expansions only produce larger hops, which the min discards.
    level = sources.select(F.col(node).alias("node")).distinct()
    levels = [level.withColumn("hop", F.lit(0).cast("int"))]
    for h in range(1, max_hops + 1):
        level = (
            level.join(e, level.node == e.__s__)
            .select(F.col("__d__").alias("node"))
            .distinct()
        )
        levels.append(level.withColumn("hop", F.lit(h).cast("int")))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.groupBy("node").agg(F.min("hop").alias("hop"))


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    rounds: int | None = None,
    materialize: str = "parquet",
    max_rounds: int = 50,
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly delete
    nodes of degree < ``k`` (degrees recomputed after every deletion
    wave) until the surviving subgraph — the k-core — is stable. The
    community-detection / spam-subgraph primitive that a single
    degree filter gets wrong: removing one wave lowers neighbors'
    degrees and can cascade.

    Two modes, same per-round dataflow (degree groupBy → alive
    filter → two semi-joins of the edge list against alive):

    * ``rounds=None`` (production): peel until a round deletes
      nothing (driver-side emptiness probe per round, like
      :func:`connected_components`), error after ``max_rounds``.
    * ``rounds=R`` (pinned): exactly R waves, converged or not —
      the oracle-parity mode, because an ANSI-SQL oracle can unroll
      R rounds but cannot express "until stable". Pin R at a value
      tests show converges on the data (a convergence test asserts
      rounds=R equals rounds=R+1).

    Every round's shrunken edge list is pinned (``materialize``; see
    `operators/materialize.py` — release with ``release_pins``):
    the edge frame feeds BOTH the degree aggregate and the next
    filter, so unpinned lineage would re-derive it 2^rounds times.
    The default is ``'parquet'``, NOT ``'cache'``: a cached round
    keeps the origin plan's Catalyst statistics, and iterated
    join-size estimates compound multiplicatively per round — the
    same pathology :func:`connected_components` documents — measured
    here as 42 s vs 3.7 s for 6 rounds at sf0.1 plus monotonically
    growing driver heap. The parquet round-trip gives each round a
    plain file relation with true statistics.
    Per round the work is one keyed aggregate + two semi-joins, all
    hash-partitioned on node keys; the peeled graph only shrinks.

    Input edges are canonicalized to symmetric (both directions, no
    self-loops), so ``degree`` means undirected degree. Returns the
    k-core members as ``(node, degree)`` — degree WITHIN the core.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds is not None and rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    from tmdb_index_spark.operators.materialize import pin_frame

    # one-pass symmetrization (the connected_components lesson, guide
    # §2.4): the former union(select(src,dst), select(dst,src)) ran
    # the caller's edge-derivation pipeline once PER BRANCH; the
    # explode emits both directions from a single pass — identical
    # rows (explode+distinct ≡ union+distinct)
    e = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src).alias("a"), F.col(dst).alias("b")
                    ),
                    F.struct(
                        F.col(dst).alias("a"), F.col(src).alias("b")
                    ),
                )
            ).alias("__e__")
        )
        .select(F.col("__e__.a").alias("a"), F.col("__e__.b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e = pin_frame(e, materialize)

    def _peel(ed: DataFrame) -> DataFrame:
        deg = ed.groupBy("a").agg(F.count(F.lit(1)).alias("__deg__"))
        alive = deg.filter(F.col("__deg__") >= k).select("a")
        return (
            ed.join(alive, "a", "left_semi")
            .join(alive.withColumnRenamed("a", "b"), "b", "left_semi")
            .select("a", "b")
        )

    # TWO peel waves per materialization (the connected_components
    # round-batching lesson): each pin is a full write+read round-trip
    # whose cost at any in-cluster scale is ~fixed, while the
    # double-peel plan is just twice as deep (two bounded
    # aggregate+semi-join layers over a plain file relation) — wave
    # SEMANTICS are unchanged, only where the loop materializes.
    if rounds is not None:
        for _ in range(rounds // 2):
            e = pin_frame(_peel(_peel(e)), materialize)
        if rounds % 2:
            e = pin_frame(_peel(e), materialize)
    else:
        # carry the edge count across rounds: counting the PREVIOUS
        # round's frame again each wave was a second probe job per
        # round over the just-pinned parquet (guide §1.5 fixed per-job
        # overhead; the CC loop's observe() lesson). Edge count is
        # monotone non-increasing and a peel of a fixpoint is the
        # identity, so "equal count across a double-wave" is exactly
        # the old per-wave fixpoint test.
        n_prev = e.count()
        for _ in range(max_rounds):
            nxt = pin_frame(_peel(_peel(e)), materialize)
            n_nxt = nxt.count()
            # converged when no edge was deleted across both waves
            if n_nxt == n_prev:
                e = nxt
                break
            e = nxt
            n_prev = n_nxt
        else:
            raise RuntimeError(f"k_core did not converge in {max_rounds} rounds")
    deg = e.groupBy("a").agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    return deg.filter(F.col("degree") >= k).select(
        F.col("a").alias("node"), "degree"
    )


def sssp_bounded(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    node: str = "node",
    max_hops: int = 3,
    materialize: str = "parquet",
) -> DataFrame:
    """Bounded-hop single-source(-set) shortest paths: the minimum
    path WEIGHT from any source to each node over paths of at most
    ``max_hops`` edges — Bellman-Ford relaxation unrolled into a
    static dataflow, the weighted sibling of :func:`bfs_levels`
    (which counts hops; this sums costs — edge weights must be
    non-negative integers so min-fold arithmetic is exact on every
    engine).

    Unlike BFS, a settled node can still improve when a longer-hop
    but cheaper path arrives, so frontier-only expansion is unsound;
    each round relaxes the FULL distance frame through the edge list
    and min-folds with the previous distances:

        dist_h(v) = min( dist_{h-1}(v),
                         min over edges (u,v): dist_{h-1}(u) + w(u,v) )

    Per round: one join keyed on the node + one min groupBy. The
    distance frame appears twice per round (relax + fold), so each
    round is pinned — parquet by default for the same
    compounding-statistics reason as :func:`k_core` (see SCALE.md).

    Returns ``(node, dist)`` for nodes reachable within
    ``max_hops`` hops; sources have dist 0.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    from tmdb_index_spark.operators.materialize import pin_frame

    e = edges.select(
        F.col(src).alias("__s__"),
        F.col(dst).alias("__d__"),
        F.col(weight).cast("long").alias("__w__"),
    )
    e = pin_frame(e, materialize)
    dist = pin_frame(
        sources.select(
            F.col(node).alias("node"), F.lit(0).cast("long").alias("dist")
        ).distinct(),
        materialize,
    )
    def _relax(d: DataFrame) -> DataFrame:
        relaxed = d.join(e, d.node == e.__s__).select(
            F.col("__d__").alias("node"),
            (F.col("dist") + F.col("__w__")).alias("dist"),
        )
        return (
            d.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )

    # TWO relaxation rounds per materialization (the k_core / CC
    # round-batching): each pin is a fixed write+read round-trip; the
    # double-relax plan embeds the intermediate frame twice (union +
    # join), a bounded 2x over pinned scans, and relaxation values are
    # independent of where the loop materializes.
    for _ in range(max_hops // 2):
        dist = pin_frame(_relax(_relax(dist)), materialize)
    if max_hops % 2:
        dist = pin_frame(_relax(dist), materialize)
    return dist
