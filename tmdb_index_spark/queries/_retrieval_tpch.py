"""Catalog part _retrieval_tpch (mechanical split of queries.py; see __init__)."""

from __future__ import annotations

from tmdb_index_spark.queries._shared import (  # noqa: E501
    DataFrame,
    F,
    SparkSession,
    T,
    Window,
    lsh_topk,
)
from tmdb_index_spark.queries._surface import (  # noqa: E501
    _dec,
    _events,
    _t,
)
from tmdb_index_spark.queries._embed_dedup import (  # noqa: E501
    _COS_SQL,
    _SIMHASH_NEARDUP_SQL,
)

def dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup GROUPS, not just pairs: connected components (iterative
    label propagation with pointer jumping, O(log d) rounds) over the
    SimHash near-dup pair list. Oracle: recursive-CTE transitive
    closure over the identical pair list."""
    from tmdb_index_spark.operators.dedup_text import simhash_neardup_pairs
    from tmdb_index_spark.operators.graph import connected_components

    pairs = simhash_neardup_pairs(
        _t(spark, sf_dir, "documents"), max_hamming=2
    )
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), "component"
    )


_DEDUP_GROUPS_SQL = f"""
WITH RECURSIVE pairs AS ({_SIMHASH_NEARDUP_SQL}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT a AS doc_id, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a
"""


def tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document (extension: text analysis /
    salient-term extraction)."""
    from tmdb_index_spark.operators.ranking import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=5)


_TFIDF_SQL = """
WITH tf AS (
  SELECT doc_id, term, COUNT(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents)
  GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY term
), n AS (SELECT COUNT(*)::BIGINT AS n_docs FROM documents)
SELECT doc_id, term, tf, tfidf, rank FROM (
  SELECT tf.doc_id, tf.term, tf.tf,
         ROUND(tf.tf * ln(n.n_docs / dfreq.df), 4) AS tfidf,
         ROW_NUMBER() OVER (
           PARTITION BY tf.doc_id
           ORDER BY ROUND(tf.tf * ln(n.n_docs / dfreq.df), 4) DESC, tf.term ASC
         )::BIGINT AS rank
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
) WHERE rank <= 5
"""


_BM25_TERMS = ("hash", "join", "dup")


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a fixed bag-of-words query
    (extension: text analysis / retrieval scoring)."""
    from tmdb_index_spark.operators.ranking import bm25_topk

    return bm25_topk(_t(spark, sf_dir, "documents"), _BM25_TERMS, k=20)


# Expression structure mirrors operators/ranking.py term for term so
# every double op is the same correctly-rounded IEEE op in both engines
# (only ln can differ, by 1 ULP — absorbed by the ROUND(..., 4)).
_BM25_SQL = f"""
WITH tf AS (
  SELECT doc_id, term, COUNT(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents)
  GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, SUM(tf)::BIGINT AS dl FROM tf GROUP BY doc_id
), corpus AS (
  SELECT COUNT(*)::BIGINT AS n_docs, SUM(dl)::BIGINT / COUNT(*) AS avgdl FROM dl
), q AS (
  SELECT * FROM tf WHERE term IN ({", ".join(repr(t) for t in _BM25_TERMS)})
), dfreq AS (
  SELECT term, COUNT(*)::BIGINT AS df FROM q GROUP BY term
), part AS (
  SELECT q.doc_id,
         ln(1.0 + ((corpus.n_docs - dfreq.df) + 0.5) / (dfreq.df + 0.5))
         * ((q.tf * 2.2) / (q.tf + 1.2 * (0.25 + (0.75 * dl.dl) / corpus.avgdl)))
           AS part
  FROM q JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN corpus
)
SELECT doc_id, score, rank FROM (
  SELECT doc_id, ROUND(SUM(part), 4) AS score,
         ROW_NUMBER() OVER (ORDER BY ROUND(SUM(part), 4) DESC, doc_id ASC)::BIGINT AS rank
  FROM part GROUP BY doc_id
) WHERE rank <= 20
"""


def cumulative_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-total window (rows unbounded preceding) over an ordered
    daily rollup; DECIMAL-exact accumulation, double output."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.sum(_dec("o_totalprice")).alias("d"))
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day",
        F.col("d").cast("double").alias("day_revenue"),
        F.sum("d").over(w).cast("double").alias("cum_revenue"),
    )


_CUMULATIVE_SQL = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate)::TIMESTAMP AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS d
  FROM orders GROUP BY 1
)
SELECT day, CAST(d AS DOUBLE) AS day_revenue,
       CAST(SUM(d) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_revenue
FROM daily
"""


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join (orders in a quarter
    with at least one returned lineitem), counted per priority."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    returned = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*)::BIGINT AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: NOT EXISTS → left-anti join (positive-balance
    customers with no 2001 order — the full history anti join is
    degenerate on this data since every customer has ordered), rolled
    up per nation."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
        )
    )


_Q22_SQL = """
SELECT c_nationkey, COUNT(*)::BIGINT AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer
WHERE c_acctbal > 0
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY c_nationkey
"""


def top_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group argmax: the highest-revenue supplier in each nation.
    Rank on the exact DECIMAL revenue (pre-cast) so ordering can't
    diverge on float noise; broadcast the supplier dim."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            _dec("l_extendedprice")
            * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
        ).alias("rev")
    )
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("rev"), F.asc("s_suppkey")
    )
    return (
        rev.join(F.broadcast(sup), rev.l_suppkey == sup.s_suppkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "s_nationkey",
            "s_suppkey",
            "s_name",
            F.col("rev").cast("double").alias("revenue"),
        )
    )


_TOP_SUPPLIER_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev
  FROM lineitem GROUP BY l_suppkey
)
SELECT s_nationkey, s_suppkey, s_name, CAST(rev AS DOUBLE) AS revenue FROM (
  SELECT s.s_nationkey, s.s_suppkey, s.s_name, rev.rev,
         ROW_NUMBER() OVER (PARTITION BY s.s_nationkey ORDER BY rev.rev DESC, s.s_suppkey ASC) AS rn
  FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
) WHERE rn = 1
"""


def user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG window breadth: per-user inter-event gap statistics. The
    mean is computed as exact integer sum / count (never float-summed)
    so both engines agree bit-for-bit."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_ltz = F.col("ts").cast("timestamp")  # NTZ-safe (see sessionize)
    gap = F.unix_micros(ts_ltz) - F.unix_micros(F.lag(ts_ltz).over(w))
    g = ev.select("user_id", gap.alias("gap_us")).filter(
        F.col("gap_us").isNotNull()
    )
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        (F.sum("gap_us") / F.count(F.lit(1))).alias("avg_gap_us"),
    )


_EVENT_GAPS_SQL = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT user_id, COUNT(*)::BIGINT AS n_gaps, MIN(gap_us)::BIGINT AS min_gap_us,
       SUM(gap_us)::BIGINT / COUNT(*) AS avg_gap_us
FROM g WHERE gap_us IS NOT NULL GROUP BY user_id
"""


def parts_never_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set-op breadth: part keys shipped in 2001 with no 2001
    return (scoped to the year — over full history every part has a
    return, which would make the set difference trivially empty)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp")
    )
    shipped = li.select("l_partkey")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    return shipped.subtract(returned)


_EXCEPT_SQL = """
SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01'
EXCEPT
SELECT l_partkey FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2001-01-01' AND l_returnflag = 'R'
"""


def value_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE window breadth: quartile buckets over event value (ties
    broken by event id so the bucketing is a deterministic total
    order), profiled per bucket.

    A bare ``ntile(4) OVER (ORDER BY ...)`` compiles to
    ``Exchange SinglePartition`` + global sort — every row through one
    task, the round-2 flagged scale anti-pattern. Rewritten as a
    distributed exact rank: range-partition on the total order, collect
    the K bounded per-partition counts (K = shuffle partitions, a
    driver-side scalar list — not data), turn them into rank offsets,
    then ``row_number`` per partition + offset = exact global rank.
    Bucket assignment applies the SQL NTILE size rule (first ``N mod 4``
    buckets take ``⌈N/4⌉`` rows) in closed form, so the result is
    bit-identical to the window form while every stage stays parallel.
    """
    ev = _events(spark, sf_dir).select("event_id", "value")
    return ntile_quartiles_distributed(spark, ev)


def ntile_quartiles_distributed(spark: SparkSession, ev: DataFrame) -> DataFrame:
    """Distributed exact ``ntile(4)`` profile over ``(event_id, value)``
    rows — the scalable core of :func:`value_ntile_quartiles`, split out
    so the NULL-value path is unit-testable off the fixed tables."""
    k = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # Range cuts are computed ONCE and embedded as literals so the
    # counts job and the rank job see the SAME partitioning — a
    # repartitionByRange would re-SAMPLE per job and desynchronize the
    # offsets from the ranks. The bucket id is a pure function of the
    # row (count of cuts below the value), so any job reproduces it.
    cuts = (
        ev.agg(
            F.percentile_approx(
                "value", [i / k for i in range(1, k)], 10_000
            ).alias("c")
        ).collect()[0]["c"]
        or []
    )
    pid_expr = sum(
        (F.col("value") > F.lit(float(c))).cast("int") for c in cuts
    ) if cuts else F.lit(0)
    # NULL values: (value > cut) is NULL, so route them to a dedicated
    # lowest partition id. Spark's window ASC is nulls-first, so ranking
    # them before every real bucket reproduces the ntile() ordering the
    # docstring claims bit-parity with (and keeps the driver-side
    # sorted(sizes) int-only).
    pid_expr = F.when(F.col("value").isNull(), F.lit(-1)).otherwise(pid_expr)
    part = ev.withColumn("__pid__", pid_expr.cast("int"))
    # Bounded driver data: one (pid, count) row per range bucket.
    sizes = {
        r["__pid__"]: r["cnt"]
        for r in part.groupBy("__pid__").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n_total = sum(sizes.values())
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]
    off_df = spark.createDataFrame(offsets, "__pid__ int, __off__ long")
    q, r = divmod(n_total, 4)
    head = r * (q + 1)  # rows living in the r oversized buckets
    wp = Window.partitionBy("__pid__").orderBy(F.asc("value"), F.asc("event_id"))
    rank = (F.row_number().over(wp) + F.col("__off__")).alias("__rank__")
    ranked = part.join(F.broadcast(off_df), "__pid__").select("event_id", "value", rank)
    d = max(q, 1)  # guard N < 4: every row then lands in the WHEN branch
    quartile = F.expr(
        f"CASE WHEN __rank__ <= {head} THEN (__rank__ + {q}) DIV {q + 1} "
        f"ELSE {r} + ((__rank__ - {head} + {d} - 1) DIV {d}) END"
    )
    return (
        ranked.select("value", quartile.alias("quartile"))
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .select(F.col("quartile").cast("long").alias("quartile"), "n_events", "lo", "hi")
    )


_NTILE_SQL = """
SELECT quartile::BIGINT AS quartile, COUNT(*) AS n_events,
       MIN(value) AS lo, MAX(value) AS hi
FROM (SELECT event_id, value,
             NTILE(4) OVER (ORDER BY value ASC, event_id ASC) AS quartile
      FROM events)
GROUP BY quartile
"""


def customers_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-scalar-subquery family: per customer, how many of
    their orders exceed their own average order value. Decorrelated to
    the aggregate-join Catalyst itself rewrites correlated subqueries
    into; the comparison uses the exact DECIMAL cross-multiply
    ``price·n > total`` so no float division can diverge between
    engines."""
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).alias("__total__"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        orders.join(per_cust, "o_custkey")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.when(
                    _dec("o_totalprice") * F.col("n_orders")
                    > F.col("__total__"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_above"),
            F.max("n_orders").alias("n_orders"),
        )
        .select(F.col("o_custkey").alias("custkey"), "n_above", "n_orders")
    )


_ABOVE_AVG_SQL = """
WITH t AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total,
         COUNT(*) AS n FROM orders GROUP BY 1
)
SELECT o.o_custkey AS custkey,
       SUM(CASE WHEN CAST(o.o_totalprice AS DECIMAL(18,2)) * t.n > t.total
                THEN 1 ELSE 0 END)::BIGINT AS n_above,
       MAX(t.n)::BIGINT AS n_orders
FROM orders o JOIN t ON o.o_custkey = t.o_custkey
GROUP BY 1
"""


def stratified_sample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling (extension: class
    rebalancing) — keep 10% of views, 50% of clicks, all errors; same
    rows in any engine/rerun from the hash formula alone."""
    from tmdb_index_spark.operators.sampling import stratified_sample

    ev = _events(spark, sf_dir)
    return (
        stratified_sample(
            ev, "event_type", "event_id",
            {"view": 0.1, "click": 0.5, "error": 1.0},
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


_STRATIFIED_SQL = """
WITH b AS (
  SELECT event_type,
         (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 10000) AS bucket
  FROM events
)
SELECT event_type, COUNT(*) AS n_events FROM b
WHERE (event_type = 'view' AND bucket < 1000)
   OR (event_type = 'click' AND bucket < 5000)
   OR (event_type = 'error' AND bucket < 10000)
GROUP BY 1
"""


#: dq_summary's uniqueness-gate threshold: exact uniqueness ships every
#: distinct key across the wire, so past this row count the audit
#: routes to the portable-HLL twin (constant-size register shuffle)
#: and the rows become estimates with their own schema.  10M keeps
#: every certified scale (sf0.1 lineitem ~600k rows) exact while the
#: 100× stress tier (60M lineitem rows — the measured 158-of-164-s
#: stage, SCALE.md r12) crosses it.
DQ_MAX_EXACT_UNIQUE_ROWS = 10_000_000


def dq_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (extension: generalizes the
    reference's dense-key invariant into a composable check family):
    uniqueness, non-null, range, and referential integrity in one
    summary frame.  Round-12 single-pass form: each table's scalar
    checks fuse into ONE shuffle-free aggregate (``check_scalars``),
    uniqueness runs through the exploded two-shuffle multi-key path
    (``check_unique_multi``), and the FK anti-joins pre-aggregate the
    child side to distinct keys — at 100× the lineitem FK shuffles
    ~1.5M distinct orderkeys instead of ~600M child rows, the lever
    for the 64.8× stress ratio this replaces (SCALE.md r12).

    Round 13 gates the uniqueness checks at
    :data:`DQ_MAX_EXACT_UNIQUE_ROWS` rows: below it (every certified
    oracle scale) they are exact — identical rows, identical static
    oracle; past it they route to the portable-HLL twin and surface as
    ``(check, approx_unique, n_rows)`` rows (NULL ``n_violations``),
    so the audit stays one-scan-per-table at any size instead of
    shuffling a whole near-candidate key column.  Exactness at scale
    stays available by calling ``check_unique_multi`` directly with
    ``max_exact_rows=None``."""
    from tmdb_index_spark.operators.checks import (
        check_foreign_key,
        check_scalars,
        check_unique_multi,
        run_checks,
    )

    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    customer = _t(spark, sf_dir, "customer")
    return run_checks(
        [
            check_unique_multi(
                orders, [["o_orderkey"]],
                max_exact_rows=DQ_MAX_EXACT_UNIQUE_ROWS,
            ),
            check_unique_multi(
                lineitem, [["l_orderkey", "l_linenumber"]],
                max_exact_rows=DQ_MAX_EXACT_UNIQUE_ROWS,
            ),
            check_scalars(
                orders,
                non_null=["o_custkey"],
                ranges=[("o_totalprice", 0.0, None)],
            ),
            check_scalars(lineitem, ranges=[("l_discount", 0.0, 1.0)]),
            check_foreign_key(orders, "o_custkey", customer, "c_custkey"),
            check_foreign_key(lineitem, "l_orderkey", orders, "o_orderkey"),
        ]
    )


_DQ_SQL = """
SELECT 'unique(o_orderkey)' AS check, (
  SELECT COALESCE(SUM(c), 0) FROM (
    SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1))::BIGINT AS n_violations
UNION ALL
SELECT 'unique(l_orderkey,l_linenumber)', (
  SELECT COALESCE(SUM(c), 0) FROM (
    SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1))::BIGINT
UNION ALL
SELECT 'non_null(o_custkey)',
       (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)::BIGINT
UNION ALL
SELECT 'range(l_discount)',
       (SELECT COUNT(*) FROM lineitem
        WHERE l_discount IS NOT NULL AND (l_discount < 0.0 OR l_discount > 1.0))::BIGINT
UNION ALL
SELECT 'range(o_totalprice)',
       (SELECT COUNT(*) FROM orders
        WHERE o_totalprice IS NOT NULL AND o_totalprice < 0.0)::BIGINT
UNION ALL
SELECT 'fk(o_custkey)',
       (SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL
        AND o_custkey NOT IN (SELECT c_custkey FROM customer))::BIGINT
UNION ALL
SELECT 'fk(l_orderkey)',
       (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL
        AND l_orderkey NOT IN (SELECT o_orderkey FROM orders))::BIGINT
"""


def dq_uniqueness_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-backed uniqueness audit (extension: the declared 100-TB
    path for ``dq_summary``'s heavy checks): the exact composite-key
    check must shuffle every distinct key — at 100× data the lineitem
    check alone was 158 of the audit's 164 s (SCALE.md r12) — while
    this twin estimates each key's cardinality with the PORTABLE
    HyperLogLog (`operators/checks.py: check_unique_hll`): one scan
    per table, a 2^10-register shuffle regardless of size, and an
    estimate a second engine reproduces bit-for-bit.  One row per
    audited key: (check, approx_unique, n_rows)."""
    from tmdb_index_spark.operators.checks import check_unique_hll

    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    return check_unique_hll(orders, ["o_orderkey"]).unionByName(
        check_unique_hll(lineitem, ["l_orderkey", "l_linenumber"])
    )


def _dq_unique_approx_sql() -> str:
    """Static oracle for ``dq_uniqueness_approx``: one portable-HLL
    block per audited key (same hash, registers, and literal
    linear-counting lookup as the engine), the composite key encoded
    with the exact checks' canonical null-marker scheme."""
    from tmdb_index_spark.operators.checks import canon_key_sql
    from tmdb_index_spark.operators.sketches import portable_hll_oracle_sql

    blocks = []
    for nm, key, tbl in [
        ("unique(o_orderkey)", canon_key_sql(["o_orderkey"]), "orders"),
        (
            "unique(l_orderkey,l_linenumber)",
            canon_key_sql(["l_orderkey", "l_linenumber"]),
            "lineitem",
        ),
    ]:
        # the alias is double-quoted: bare ``check`` is a DuckDB
        # reserved word and fails to parse as a plain identifier
        b = portable_hll_oracle_sql(
            key_sql=key,
            group_sql=f"'{nm}'",
            group_alias='"check"',
            from_sql=tbl,
            b=10,
            out_col="approx_unique",
            count_col="n_rows",
        )
        blocks.append(f"SELECT * FROM (\n{b}\n)")
    return "\nUNION ALL\n".join(blocks)


_DQ_UNIQUE_APPROX_SQL = _dq_unique_approx_sql()


def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof salted fact-to-dimension join (extension: the
    hot-key join path when the dimension can't broadcast). The salt
    only redistributes where rows meet, so the oracle is the plain
    unsalted join."""
    from tmdb_index_spark.operators.skew import salted_join

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    return (
        salted_join(li, orders.select("l_orderkey", "o_orderstatus"), ["l_orderkey"], n_salts=8)
        .groupBy("o_orderstatus")
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_SALTED_JOIN_SQL = """
SELECT o_orderstatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


def approx_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch family — the PORTABLE HyperLogLog
    (`operators/sketches.py`), not Spark's engine-private
    ``approx_count_distinct`` digest, so the estimate itself is
    hash-checkable against the verbatim DuckDB mirror (the last
    rows-only contract in the catalog, closed round 12).  b=10 (1024
    registers, ~3.2% rsd harmonic / few-% linear-counting regime with
    the literal-lookup correction); the operator takes ``b`` for
    tighter production error.  Plan: map-side partial max collapses
    each partition to <= days*1024 rows before the only data-sized
    shuffle.  Exact twin: ``distinct_users_daily_exact``."""
    from tmdb_index_spark.operators.sketches import portable_hll_distinct

    ev = _events(spark, sf_dir)
    return portable_hll_distinct(
        ev.select(F.date_trunc("day", F.col("ts")).alias("day"), "user_id"),
        key_col="user_id",
        group_cols=["day"],
        b=10,
        out_col="approx_users",
        count_col="n_events",
    )


def _approx_distinct_sql() -> str:
    from tmdb_index_spark.operators.sketches import portable_hll_oracle_sql

    return portable_hll_oracle_sql(
        key_sql="user_id",
        group_sql="date_trunc('day', ts)",
        group_alias="day",
        from_sql="events",
        b=10,
        out_col="approx_users",
        count_col="n_events",
    )


def approx_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch family — a PORTABLE sampling-based estimator
    (deterministic md5 Bernoulli sample + exact interpolated
    percentile over the sample, `operators/sketches.py`) instead of
    Spark's engine-private GK digest, so the estimate is
    hash-checkable cross-engine (rows-only contract closed round 12).
    The denominator is SELF-TUNED (`tuned_sample_denom`: smallest
    power of two landing the sample in (100k, 200k] rows) because the
    exact percentile over the sample has only |event_types|-way
    parallelism — a fixed 1/4 rate grew the per-group sort buffers
    linearly and measured 31.5× at 100× data; the bounded sample holds
    them constant.  One pass after the 1-row count: the sample
    predicate gates the percentile input while totals aggregate the
    full stream.  Exact twin: ``value_percentiles``."""
    from tmdb_index_spark.operators.sketches import (
        hash_sample_pred,
        tuned_sample_denom,
    )

    ev = _events(spark, sf_dir)
    den = ev.agg(F.count(F.lit(1)).alias("__n__")).select(
        tuned_sample_denom(F.col("__n__"), 200_000).alias("__den__")
    )
    # materialize the predicate as a PROJECTED column before the
    # aggregate: four aggregate expressions reference it, and inside
    # aggregate buffers Catalyst does not share the subexpression —
    # the inline form measured 4 md5 evaluations per row (33.7 s at
    # 100×, exactly 4× the one-hash pass)
    sampled = F.col("__sampled__")
    sv = F.when(sampled, F.col("value"))
    return (
        ev.crossJoin(F.broadcast(den))
        .withColumn(
            "__sampled__",
            hash_sample_pred(F.col("event_id"), F.col("__den__")),
        )
        .groupBy("event_type")
        .agg(
            F.round(F.percentile(sv, F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile(sv, F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile(sv, F.lit(0.99)), 4).alias("p99"),
            F.sum(sampled.cast("long")).alias("n_sampled"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_APPROX_QUANTILES_SQL = """
WITH den AS (
  SELECT CASE WHEN q <= 4 THEN CAST(4 AS BIGINT)
              ELSE CAST(POW(2, length(bin(q - 1))) AS BIGINT) END AS denom
  FROM (SELECT CAST(FLOOR((COUNT(*) + 199999) / 200000.0) AS BIGINT) AS q
        FROM events)
),
s AS (
  SELECT event_type, value,
         (CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
               AS BIGINT) % denom) = 0 AS sampled
  FROM events, den
)
SELECT event_type,
       ROUND(quantile_cont(CASE WHEN sampled THEN value END, 0.5), 4) AS p50,
       ROUND(quantile_cont(CASE WHEN sampled THEN value END, 0.9), 4) AS p90,
       ROUND(quantile_cont(CASE WHEN sampled THEN value END, 0.99), 4) AS p99,
       CAST(SUM(CASE WHEN sampled THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       COUNT(*) AS n
FROM s GROUP BY event_type
"""


def customer_first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE semantics, aggregate form: each
    customer's first and most recent order value. The (o_orderdate,
    o_orderkey) order is total and non-null, so first/last over the
    full-partition frame ARE per-key MIN_BY/MAX_BY of the order tuple
    — one map-side-combined aggregate instead of a full-table sort
    window plus DISTINCT (the `dedup_extreme` rationale; measured
    numbers in SCALE.md r12). Values pass through untouched — no
    arithmetic to diverge."""
    orders = _t(spark, sf_dir, "orders")
    okey = F.struct(F.col("o_orderdate"), F.col("o_orderkey"))
    return orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.min_by(F.col("o_totalprice"), okey).alias("first_price"),
        F.max_by(F.col("o_totalprice"), okey).alias("last_price"),
    )


_FIRST_LAST_SQL = """
SELECT DISTINCT o_custkey AS custkey,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice) OVER w AS last_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode with the REAL stdlib header codec: synthesize a
    spec-valid PNG/GIF/JPEG/WAV payload per document (dimensions are a
    pure function of ``doc_id``), then parse them back via
    ``decode_media``'s default ``header_codec``. The DuckDB oracle
    recomputes the expected metadata arithmetically, so any synth/parse
    disagreement (sniffing, endianness, offsets, frame walk) fails the
    gate. Both stages are Arrow ``mapInPandas``, map-only — payload
    bytes never shuffle."""
    import pandas as pd

    from tmdb_index_spark.operators.media_codec import (
        make_gif,
        make_jpeg,
        make_png,
        make_wav,
    )
    from tmdb_index_spark.operators.multimodal import (
        MEDIA_STRUCT,
        decode_media,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    synth_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media", MEDIA_STRUCT),
        ]
    )

    def synth(batches):
        for pdf in batches:
            media = []
            for raw in pdf["doc_id"]:
                d = int(raw)
                w, h = 1 + d % 64, 1 + (d * 7) % 64
                kind = d % 4
                if kind == 0:
                    data, mime = make_png(w, h), "image/png"
                elif kind == 1:
                    data, mime = make_gif(w, h, n_frames=1 + d % 5), "image/gif"
                elif kind == 2:
                    data, mime = make_jpeg(w, h), "image/jpeg"
                else:
                    data, mime = make_wav(100 + d % 500), "audio/wav"
                media.append(
                    {"data": data, "mime": mime, "source_uri": f"synth://{d}"}
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": media})

    decoded = decode_media(docs.mapInPandas(synth, synth_schema))
    # width/height are null for audio: cast to DOUBLE so the nullable
    # column renders identically in both engines (see json_props_rollup).
    return decoded.select(
        "doc_id",
        F.col("media.mime").alias("mime"),
        F.col("width").cast("double").alias("width"),
        F.col("height").cast("double").alias("height"),
        F.col("n_frames").cast("long").alias("n_frames"),
        "decode_ok",
    )


_MEDIA_DECODE_SQL = """
SELECT doc_id,
  CASE doc_id % 4 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/gif'
                  WHEN 2 THEN 'image/jpeg' ELSE 'audio/wav' END AS mime,
  CASE WHEN doc_id % 4 = 3 THEN NULL
       ELSE CAST(1 + doc_id % 64 AS DOUBLE) END AS width,
  CASE WHEN doc_id % 4 = 3 THEN NULL
       ELSE CAST(1 + (doc_id * 7) % 64 AS DOUBLE) END AS height,
  CAST(CASE doc_id % 4 WHEN 1 THEN 1 + doc_id % 5
                       WHEN 3 THEN 100 + doc_id % 500
                       ELSE 1 END AS BIGINT) AS n_frames,
  TRUE AS decode_ok
FROM documents
"""


def crossmodal_image_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal pipeline end-to-end under one oracle: synthesize a
    spec-valid media payload per document (same deterministic synth as
    ``media_decode``), DECODE it with the real stdlib header codec,
    keep documents whose payload parsed as a valid image
    (``decode_ok AND mime LIKE 'image/%'``), semi-join their doc_ids
    to the embedding table, and run sign-bit LSH top-3 among the
    surviving vectors — "near-dup images by embedding among
    decode-valid payloads".

    The decode filter is the real codec verdict on real bytes; the
    DuckDB oracle recomputes the same predicate arithmetically
    (``doc_id % 4 IN (0,1,2)`` — WAVs are the non-images and every
    synthesized payload is spec-valid), so a codec regression that
    mis-sniffs or rejects a valid image changes the corpus and fails
    the hash gate. Scale shape: decode is Arrow map-only (payload
    bytes never shuffle), the embedding restriction is a semi-join on
    the id, and candidate generation stays LSH-bucketed — no
    cartesian (plan-pinned with the other pair searches)."""
    import pandas as pd

    from tmdb_index_spark.operators.media_codec import (
        make_gif,
        make_jpeg,
        make_png,
        make_wav,
    )
    from tmdb_index_spark.operators.multimodal import (
        MEDIA_STRUCT,
        decode_media,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    synth_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media", MEDIA_STRUCT),
        ]
    )

    def synth(batches):
        for pdf in batches:
            media = []
            for raw in pdf["doc_id"]:
                d = int(raw)
                w, h = 1 + d % 64, 1 + (d * 7) % 64
                kind = d % 4
                if kind == 0:
                    data, mime = make_png(w, h), "image/png"
                elif kind == 1:
                    data, mime = make_gif(w, h, n_frames=1 + d % 5), "image/gif"
                elif kind == 2:
                    data, mime = make_jpeg(w, h), "image/jpeg"
                else:
                    data, mime = make_wav(100 + d % 500), "audio/wav"
                media.append(
                    {"data": data, "mime": mime, "source_uri": f"synth://{d}"}
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": media})

    decoded = decode_media(docs.mapInPandas(synth, synth_schema))
    valid_images = decoded.filter(
        F.col("decode_ok") & F.col("media.mime").startswith("image/")
    ).select("doc_id")
    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.join(
        valid_images, emb.vec_id == valid_images.doc_id, "leftsemi"
    )
    return lsh_topk(corpus, k=3, n_bits=6)


_CROSSMODAL_SQL = f"""
WITH img AS (
  SELECT doc_id FROM documents WHERE doc_id % 4 IN (0, 1, 2)
),
v AS (
  SELECT vec_id, v,
         list_sum(list_transform(generate_series(0, 5),
           i -> CASE WHEN v[i+1] >= 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS bucket
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE vec_id IN (SELECT doc_id FROM img))
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS_SQL} AS cos_sim
  FROM v q JOIN v c ON q.bucket = c.bucket
  WHERE q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC)::BIGINT AS rank
  FROM scored
) WHERE rank <= 3
"""


def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap fill (extension: the feature-store
    shape): a dense (user, day) spine with last-observation-carried-
    forward of each user's daily value. Days before a user's first
    activity stay null. The spine is users × global day range — the
    days side is a tiny broadcast, so no shuffle is added beyond the
    daily rollup's own."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.sum(_dec("value")).cast("double").alias("day_value"))
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    days = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 day"))
        ).alias("day")
    )
    spine = daily.select("user_id").distinct().crossJoin(F.broadcast(days))
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.last("day_value", ignorenulls=True).over(w).alias("value_locf"),
        )
    )


_GAP_FILL_SQL = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
  FROM events GROUP BY 1, 2
), b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
days AS (
  SELECT UNNEST(generate_series((SELECT lo FROM b), (SELECT hi FROM b),
                                INTERVAL 1 DAY)) AS day
),
spine AS (SELECT DISTINCT d.user_id, days.day FROM daily d, days)
SELECT s.user_id, s.day,
       last_value(d.day_value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
"""


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (completes the grouping family beside
    rollup/cube): per-returnflag totals, per-linestatus totals, and the
    grand total — with ``grouping_id`` disambiguating real nulls from
    subtotal rows.  Two-phase form (`operators/skew.py:
    preagg_grouping` — the ``rollup_revenue`` rationale): the raw
    table aggregates once at the (flag, status) grain and the 3-set
    Expand runs over those ~6 cells instead of 3× the table."""
    from tmdb_index_spark.operators.skew import preagg_grouping

    li = _t(spark, sf_dir, "lineitem")
    return preagg_grouping(
        li,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_price": (
                F.sum(_dec("l_extendedprice")),
                F.sum("sum_price").cast("double"),
            ),
            "n_rows": (F.count(F.lit(1)), F.sum("n_rows")),
        },
        mode="sets",
        sets=[["l_returnflag"], ["l_linestatus"], []],
        grouping_id_col="gid",
    )


_GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_rows,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt (reshape family, inverse of pivot): wide lineitem
    measure columns to long (metric, value) rows, profiled per metric.
    The melt is a zero-shuffle projection; only the profile
    aggregates."""
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_orderkey"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "metric",
        "val",
    )
    return long.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("val").cast("decimal(18,2)")).cast("double").alias("total"),
        F.min("val").alias("lo"),
        F.max("val").alias("hi"),
    )


_UNPIVOT_SQL = """
WITH long AS (
  SELECT l_orderkey, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'l_discount', l_discount FROM lineitem
)
SELECT metric, COUNT(*) AS n,
       CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total,
       MIN(val) AS lo, MAX(val) AS hi
FROM long GROUP BY metric
"""


def value_rank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK / CUME_DIST window breadth: per event type, how
    many events sit in the top decile by rank and the bottom decile by
    cumulative distribution, with the top decile's entry value. Both
    functions are pure functions of the ordered multiset, so the
    engines cannot diverge on ties.

    A window ``PARTITION BY event_type`` over raw events is the
    few-huge-groups funnel (|types| serial tasks of N/|types| rows —
    the round-7 window lint's first real catch). percent_rank and
    cume_dist cannot be group-limited (they need the whole multiset),
    but both are closed forms over per-(type, value) COUNTS:
    rank(v) = count(<v)+1, cume_dist(v) = count(<=v)/n — so the query
    collapses to counts first and rides
    :func:`grouped_prefix_sum`'s bucketed running sums; the per-type
    totals broadcast from a 5-row aggregate. Identical integer inputs
    → identical doubles on both engines."""
    from tmdb_index_spark.operators.ordering import grouped_prefix_sum

    ev = _events(spark, sf_dir)
    counts = ev.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).alias("__c__")
    )
    cum = grouped_prefix_sum(
        counts, "value", {"__cum__": "__c__"}, partition_cols=["event_type"]
    )
    totals = counts.groupBy("event_type").agg(
        F.sum("__c__").alias("__n__")
    )
    n = F.col("__n__").cast("double")
    rank = (F.col("__cum__") - F.col("__c__") + 1).cast("double")
    # single-row group: PERCENT_RANK is defined as 0 (and the session
    # runs ANSI, where (rank-1)/(n-1) would THROW on 0/0, not NULL)
    pr = F.when(n > 1, (rank - 1) / (n - 1)).otherwise(F.lit(0.0))
    cd = F.col("__cum__").cast("double") / n
    ranked = cum.join(F.broadcast(totals), "event_type").select(
        "event_type", "value", "__c__", pr.alias("pr"), cd.alias("cd")
    )
    return ranked.groupBy("event_type").agg(
        F.sum(F.when(F.col("pr") >= 0.9, F.col("__c__")).otherwise(0))
        .cast("long")
        .alias("n_top_decile"),
        F.min(F.when(F.col("pr") >= 0.9, F.col("value"))).alias("top_entry_value"),
        F.sum(F.when(F.col("cd") <= 0.1, F.col("__c__")).otherwise(0))
        .cast("long")
        .alias("n_bottom_decile"),
    )


_RANK_DIST_SQL = """
WITH ranked AS (
  SELECT event_type, value,
         PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value) AS pr,
         CUME_DIST() OVER (PARTITION BY event_type ORDER BY value) AS cd
  FROM events
)
SELECT event_type,
       SUM(CASE WHEN pr >= 0.9 THEN 1 ELSE 0 END)::BIGINT AS n_top_decile,
       MIN(CASE WHEN pr >= 0.9 THEN value END) AS top_entry_value,
       SUM(CASE WHEN cd <= 0.1 THEN 1 ELSE 0 END)::BIGINT AS n_bottom_decile
FROM ranked GROUP BY event_type
"""


def click_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join on a batch frame (the batch twin of the
    streaming ``attribute_outcomes``, same function — stream/batch
    parity by construction): every purchase paired with each prior
    click by the same user within 30 minutes."""
    from tmdb_index_spark.streaming.windowed import attribute_outcomes

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    return attribute_outcomes(clicks, purchases, within="30 minutes")


_ATTRIBUTION_SQL = """
SELECT a.user_id, a.event_id AS action_id, a.ts AS action_ts,
       o.event_id AS outcome_id, o.ts AS outcome_ts
FROM events a JOIN events o ON a.user_id = o.user_id
WHERE a.event_type = 'click' AND o.event_type = 'purchase'
  AND o.ts >= a.ts AND o.ts <= a.ts + INTERVAL 30 MINUTE
"""


def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs join predicate. Catalyst must push
    the common join key while keeping the disjunction as a join-side
    filter — the classic test that disjunctive predicates don't defeat
    pushdown (each OR branch references both tables)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30))
    )
    return joined.filter(cond).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


_Q19_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30)
"""


def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the deepest join tree in the catalog — lineitem
    × orders (both fact-sized, sort-merge) with supplier→nation and
    orders→customer→nation dimension chains (all broadcast). Yearly
    shipping volume between two nation pairs, both directions."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nkey"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


def value_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) histogram per event type (extension: the
    optimizer-statistics complement of `value_histogram`'s equi-width
    bins — the DB2/Oracle/ANALYZE-style histogram where every bucket
    holds ~N/k rows and the BOUNDARIES move with the distribution,
    which is what selectivity estimation and heavy-tail profiling
    actually need): exact NTILE(8) per event type over
    :func:`grouped_ntile`'s funnel-free buckets (the naive window
    would sort each event type's full slice in one task), tiebroken by
    event_id so the tile cut is a total order, then per-(type, bucket)
    count + rounded lo/hi boundaries. NTILE's closed-form tile rule is
    bit-identical to the SQL window on both engines."""
    from tmdb_index_spark.operators.ordering import grouped_ntile

    ev = _events(spark, sf_dir)
    vals = ev.select(
        "event_type",
        F.col("value").cast("double").alias("__v__"),
        "event_id",
    ).filter(F.col("__v__").isNotNull())
    tiled = grouped_ntile(
        vals,
        8,
        "__v__",
        tiebreak=["event_id"],
        partition_cols=["event_type"],
        tile_col="bucket",
    )
    return tiled.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(F.min("__v__"), 4).alias("lo"),
        F.round(F.max("__v__"), 4).alias("hi"),
    ).select(
        "event_type",
        F.col("bucket").cast("long").alias("bucket"),
        "n_rows",
        "lo",
        "hi",
    )


_EQUIDEPTH_SQL = """
WITH v AS (
  SELECT event_type, value::DOUBLE AS v, event_id
  FROM events WHERE value IS NOT NULL
),
t AS (
  SELECT event_type, v,
         NTILE(8) OVER (PARTITION BY event_type
                        ORDER BY v, event_id) AS bucket
  FROM v
)
SELECT event_type,
       bucket::BIGINT AS bucket,
       COUNT(*)::BIGINT AS n_rows,
       ROUND(MIN(v), 4) AS lo,
       ROUND(MAX(v), 4) AS hi
FROM t GROUP BY event_type, bucket
"""


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width binning (feature-engineering family): event values
    histogrammed into width-10 buckets. Pure arithmetic — floor before
    cast on both engines, since DuckDB's double→int cast ROUNDS while
    Spark's truncates."""
    ev = _events(spark, sf_dir)
    bucket = F.floor(F.col("value") / F.lit(10.0)).cast("long")
    return (
        ev.select(bucket.alias("bucket"), "value")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


_HISTOGRAM_SQL = """
SELECT CAST(FLOOR(value / 10.0) AS BIGINT) AS bucket,
       COUNT(*) AS n_events, MIN(value) AS lo, MAX(value) AS hi
FROM events GROUP BY 1
"""


def decontam_ngram_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (extension: n-gram overlap): docs
    whose 5-grams collide with a held-out eval split (doc_id % 10 == 0),
    rolled up per source. Eval n-gram hashes are broadcast — the train
    side never shuffles."""
    from tmdb_index_spark.operators.llm_prep import ngram_contamination

    docs = _t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    tr = docs.filter(F.col("doc_id") % 10 != 0)
    hits = ngram_contamination(tr, ev, n=5)
    return (
        tr.select("doc_id", "source")
        .join(hits, "doc_id")
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("contaminated_docs"),
            F.sum("ngram_hits").cast("long").alias("ngram_hits"),
        )
    )


_DECONTAM_SQL = """
WITH toks AS (
  SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents
),
ng AS (
  SELECT doc_id, source,
         unnest(list_transform(
           list_distinct(list_transform(range(1, len(ts) - 3),
                                        i -> array_to_string(ts[i:i+4], ' '))),
           s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)) AS h
  FROM toks
),
ev AS (SELECT DISTINCT h FROM ng WHERE doc_id % 10 = 0),
tr AS (SELECT doc_id, source, h FROM ng WHERE doc_id % 10 <> 0),
hit AS (SELECT tr.source, tr.doc_id FROM tr JOIN ev USING (h))
SELECT source,
       COUNT(DISTINCT doc_id)::BIGINT AS contaminated_docs,
       COUNT(*)::BIGINT AS ngram_hits
FROM hit GROUP BY source
"""


def dsir_source_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data-selection audit (extension: hashed n-gram importance
    resampling, Xie et al. 2023 — the data-selection step that
    up-weights corpus documents resembling a small trusted domain):
    score every document by the log importance weight of its hashed
    unigram+bigram bag under the target domain's smoothed 128-bucket
    distribution (docs from ``src0``, the trusted-domain proxy) vs the
    raw corpus's, then roll up per source — sources that look like the
    target get positive ``avg_logw`` and high ``n_target_like`` (docs a
    threshold-at-0 resample would keep). Bucket log-ratios are
    quantized to integer nanos BEFORE the per-doc sum
    (`operators/llm_prep.py: dsir_logweights`), so every aggregate
    below is exact integer arithmetic until the final division —
    cross-engine parity by construction, no float-sum ordering drift.
    Scale shape: one combinable (doc, bucket)-keyed shuffle fits the
    distributions; the 128-row weight table broadcasts back; the only
    other data-proportional step is the doc_id-keyed attach of
    per-doc weights to sources, a plain combinable sort-merge join."""
    from tmdb_index_spark.operators.llm_prep import dsir_logweights

    d = _t(spark, sf_dir, "documents")
    per_doc = dsir_logweights(d, is_target=F.col("source") == F.lit("src0"))
    q = F.coalesce(F.col("logw_q"), F.lit(0))
    return (
        d.select("doc_id", "source")
        .join(per_doc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum(q).cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(1e9),
                6,
            ).alias("avg_logw"),
            F.sum(F.when(q > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_target_like"),
        )
    )


_DSIR_SQL = """
WITH toks AS (
  SELECT doc_id, source,
         regexp_extract_all(coalesce(lower(text), ''), '[a-z0-9]+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, source = 'src0' AS tgt,
         unnest(list_concat(
           t, list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])
         )) AS g
  FROM toks
),
db AS (
  SELECT doc_id, tgt,
         ('0x' || substr(md5(g), 1, 15))::BIGINT % 128 AS b,
         COUNT(*)::BIGINT AS n
  FROM grams GROUP BY doc_id, tgt, b
),
dist AS (
  SELECT bb.b,
         COALESCE(cr, 0)::BIGINT AS cr,
         COALESCE(ct, 0)::BIGINT AS ct
  FROM (SELECT unnest(range(0, 128)) AS b) bb
  LEFT JOIN (
    SELECT b, SUM(n) AS cr, SUM(CASE WHEN tgt THEN n ELSE 0 END) AS ct
    FROM db GROUP BY b
  ) c USING (b)
),
tot AS (SELECT SUM(cr) AS tr, SUM(ct) AS tt FROM dist),
w AS (
  SELECT b,
         CAST(ROUND((ln((ct + 1)::DOUBLE / (tt + 128)::DOUBLE)
                   - ln((cr + 1)::DOUBLE / (tr + 128)::DOUBLE)) * 1e9)
              AS BIGINT) AS lwq
  FROM dist, tot
),
per_doc AS (
  SELECT doc_id, SUM(n * lwq) AS q
  FROM db JOIN w USING (b) GROUP BY doc_id
)
SELECT d.source,
       COUNT(*)::BIGINT AS n_docs,
       ROUND(CAST(SUM(COALESCE(q, 0)) AS DOUBLE) / COUNT(*) / 1e9, 6)
         AS avg_logw,
       SUM(CASE WHEN COALESCE(q, 0) > 0 THEN 1 ELSE 0 END)::BIGINT
         AS n_target_like
FROM documents d LEFT JOIN per_doc USING (doc_id)
GROUP BY d.source
"""


def repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (extension: quality scoring):
    duplicate-token fraction and most-common-bigram fraction.

    Uses the linear ``impl='explode'`` path: the expr form's NESTED
    higher-order functions (filter inside transform) drop out of
    whole-stage codegen and re-evaluate the captured shingle array per
    element — measured 243 s for 5000×54-token docs at sf0.1 vs ~2 s
    exploded (SCALE.md round 5). Results are identical (pinned by
    tests/test_llm_prep.py::test_repetition_explode_impl_matches_expr).
    """
    from tmdb_index_spark.operators.llm_prep import repetition_signals

    return repetition_signals(_t(spark, sf_dir, "documents"), impl="explode")


_REPETITION_SQL = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(coalesce(text, '')), '\\s+') AS ts
  FROM documents
),
b AS (
  SELECT doc_id, ts,
         CASE WHEN len(ts) >= 2
              THEN list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])
              ELSE []::VARCHAR[] END AS bg
  FROM t
)
SELECT doc_id,
  ROUND((len(ts) - len(list_distinct(ts))) * 1.0 / greatest(len(ts), 1), 4)
    AS dup_token_ratio,
  CASE WHEN len(bg) = 0 THEN 0.0
       ELSE ROUND(list_max(list_transform(list_distinct(bg),
                    x -> len(list_filter(bg, y -> y = x)))) * 1.0 / len(bg), 4)
  END AS top_bigram_frac
FROM b
"""


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style masking (extension: redaction): a deterministic dirty
    column (doc_id-derived email + number — the corpus itself is
    digit-free) is masked by the default rules; per-doc counts plus the
    md5 of the masked text prove the rewrite bit-for-bit."""
    from tmdb_index_spark.operators.llm_prep import redact_patterns

    docs = _t(spark, sf_dir, "documents")
    dirty = docs.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("contact"),
            F.concat(
                F.lit("user"), F.col("doc_id").cast("string"), F.lit("@example.com")
            ),
            F.lit("ref"),
            (F.col("doc_id") * 7919 + 10007).cast("string"),
        ).alias("text"),
    )
    red = redact_patterns(dirty)
    return red.select(
        "doc_id",
        F.col("n_redacted_0").alias("emails_masked"),
        F.col("n_redacted_1").alias("numbers_masked"),
        F.md5(F.col("redacted")).alias("redacted_md5"),
    )


_PII_REDACTION_SQL = """
WITH d AS (
  SELECT doc_id,
         coalesce(text, '') || ' contact user' || doc_id || '@example.com ref '
              || (doc_id * 7919 + 10007) AS t
  FROM documents
),
e AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))::BIGINT
           AS emails_masked,
         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                        '<EMAIL>', 'g') AS t2
  FROM d
)
SELECT doc_id, emails_masked,
       len(regexp_extract_all(t2, '[0-9]{4,}'))::BIGINT AS numbers_masked,
       md5(regexp_replace(t2, '[0-9]{4,}', '<NUM>', 'g')) AS redacted_md5
FROM e
"""


def pack_sequences_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (extension: concat-and-chunk): assign docs to
    fixed-capacity token chunks within (source, shard) streams, then
    report packing efficiency per source."""
    from tmdb_index_spark.operators.llm_prep import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    packed = pack_sequences(docs, capacity=256, shards=8)
    # distinct over the (shard, bin) PAIR — a scalar shard*K+bin key
    # would collide once any stream exceeds K bins, silently merging
    # chunks at scale.
    nbins = F.countDistinct(F.col("shard"), F.col("bin"))
    return packed.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        nbins.cast("long").alias("n_bins"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(
            F.sum("n_tokens") * F.lit(1.0) / (nbins * 256), 4
        ).alias("avg_bin_fill"),
    )


_PACK_SEQUENCES_SQL = """
WITH t AS (
  SELECT doc_id, source, doc_id % 8 AS shard,
         len(regexp_extract_all(coalesce(text, ''),
             '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))::BIGINT AS tok
  FROM documents
),
c AS (
  SELECT source, shard, tok,
         SUM(tok) OVER (PARTITION BY source, shard ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok AS strt
  FROM t
),
b AS (
  SELECT source, shard, tok, floor(strt / 256)::BIGINT AS bin FROM c
)
SELECT source, COUNT(*)::BIGINT AS n_docs,
       COUNT(DISTINCT (shard, bin))::BIGINT AS n_bins,
       SUM(tok)::BIGINT AS total_tokens,
       ROUND(SUM(tok) * 1.0 / (COUNT(DISTINCT (shard, bin)) * 256), 4) AS avg_bin_fill
FROM b GROUP BY source
"""


def unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scoring (extension: CCNet-style
    filter): mean negative log10 add-one-smoothed unigram probability
    per doc, scored against the corpus's own token distribution. One
    explode + token-frequency groupBy + per-doc mean — the reference-LM
    join shape at any scale."""
    from tmdb_index_spark.operators.llm_prep import unigram_logprob

    return unigram_logprob(_t(spark, sf_dir, "documents"))


_UNIGRAM_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(coalesce(text, '')), '\\s+')) AS tok
  FROM documents
),
nz AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
tf AS (SELECT tok, COUNT(*)::BIGINT AS tf FROM nz GROUP BY tok),
tot AS (SELECT SUM(tf) AS n, COUNT(*) AS v FROM tf)
SELECT doc_id, COUNT(*)::BIGINT AS n_tokens,
       ROUND(AVG(-log10((tf + 1) * 1.0 / (n + v))), 4) AS mean_neg_logp
FROM nz JOIN tf USING (tok), tot
GROUP BY doc_id
"""


def chunked_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (extension: context-window prep):
    64-token windows advancing by 48 (16-token overlap), map-only, the
    final short window kept. Returns every chunk with its text."""
    from tmdb_index_spark.operators.llm_prep import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=64, stride=48
    )


_CHUNKED_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(
           regexp_split_to_array(trim(coalesce(text, '')), '\\s+'),
           x -> x <> ''
         ) AS ts
  FROM documents
),
s AS (
  SELECT doc_id, ts,
         unnest(range(1, (len(ts) - 1) // 48 * 48 + 2, 48)) AS strt
  FROM t WHERE len(ts) > 0
)
SELECT doc_id, ((strt - 1) // 48)::BIGINT AS chunk_id,
       len(ts[strt:strt + 63])::BIGINT AS n_chunk_tokens,
       array_to_string(ts[strt:strt + 63], ' ') AS chunk_text
FROM s
"""


def corpus_shuffle_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle (extension: reproducible training
    order): every doc gets a contiguous 0-based position under the
    md5(doc_id # seed) order — computed WITHOUT a single-partition
    global window (`operators/ordering.py`: monotone data-derived
    buckets + per-bucket offsets; the only serial window is over
    |buckets| rows)."""
    from tmdb_index_spark.operators.ordering import deterministic_shuffle

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return deterministic_shuffle(docs, "doc_id", seed=7).select("doc_id", "pos")


_SHUFFLE_POS_SQL = """
SELECT doc_id,
       ROW_NUMBER() OVER (
         ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || '#7'), 1, 15))::BIGINT,
                  doc_id
       ) - 1 AS pos
FROM documents
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-side conjunctive range filters into a
    single global aggregate — every predicate must reach the parquet
    scan (min/max row-group skipping at scale), no join, no groupBy
    shuffle, one partial+final agg pair."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


_Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q10_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer in a
    quarter, deterministic top-20. Fact-fact join co-partitioned on
    orderkey; customer/nation dims broadcast; TakeOrderedAndProject
    for the limit."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).alias("__rev__"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("__rev__").cast("double").alias("revenue"),
        )
        .orderBy(F.col("__rev__").desc(), "c_custkey")
        .limit(20)
    )


_Q10_SQL = """
WITH r AS (
  SELECT c_custkey, c_name, n_name,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate < TIMESTAMP '1997-04-01'
  GROUP BY 1, 2, 3
)
SELECT c_custkey, c_name, n_name, CAST(rev AS DOUBLE) AS revenue
FROM r ORDER BY rev DESC, c_custkey LIMIT 20
"""


def acctbal_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (extension: point-in-interval): customers joined into
    five equal-width balance bands derived from the data's own
    [min, max] — a real interval-dimension join, not arithmetic
    bucketing. The bucketed index join keeps it an equi-join (no
    BroadcastNestedLoopJoin) — `operators/ranges.py`."""
    from tmdb_index_spark.operators.ranges import point_in_interval_join

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    mm = cust.agg(F.min("c_acctbal").alias("lo"), F.max("c_acctbal").alias("hi"))
    span = F.col("hi") - F.col("lo")
    bands = mm.select(
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("band"), "lo", "hi"
    ).select(
        F.col("band").cast("long").alias("band"),
        (F.col("lo") + F.col("band") * span / 5.0).alias("band_lo"),
        F.when(F.col("band") == 4, F.col("hi") + 1.0)
        .otherwise(F.col("lo") + (F.col("band") + 1) * span / 5.0)
        .alias("band_hi"),
    )
    joined = point_in_interval_join(
        cust, bands, "c_acctbal", "band_lo", "band_hi", bucket_width=2000.0
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
    )


_BAND_JOIN_SQL = """
WITH mm AS (SELECT MIN(c_acctbal) AS lo, MAX(c_acctbal) AS hi FROM customer),
bands AS (
  SELECT band, lo + band * (hi - lo) / 5.0 AS band_lo,
         CASE WHEN band = 4 THEN hi + 1.0
              ELSE lo + (band + 1) * (hi - lo) / 5.0 END AS band_hi
  FROM mm, unnest(range(0, 5)) AS t(band)
)
SELECT band, COUNT(*)::BIGINT AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer JOIN bands
  ON c_acctbal >= band_lo AND c_acctbal < band_hi
GROUP BY band
"""


def multi_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade (extension):
    hour from raw, day from HOUR, month from DAY — raw scanned once,
    coarser shuffles move |finer-grain| rows. The oracle computes every
    grain directly from raw, proving the cascade re-aggregation exact
    (decimal partial sums)."""
    from tmdb_index_spark.operators.ranges import cascade_time_rollup

    grains = cascade_time_rollup(_events(spark, sf_dir))
    out = None
    for name in ("hour", "day", "month"):
        g = grains[name].select(
            F.lit(name).alias("grain"),
            "bucket",
            "n_events",
            F.col("total_value").cast("double").alias("total_value"),
        )
        out = g if out is None else out.unionByName(g)
    return out


