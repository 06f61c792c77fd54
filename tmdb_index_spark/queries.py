"""Named query catalog: one entry per implemented operator surface.

This is the driver-facing correctness contract (``__spark_entry__.py``
re-exports it): every entry pairs a Spark DataFrame builder with an
equivalent ANSI-SQL oracle that DuckDB runs over the same parquet
tables. Column names and types are aligned on both sides because the
driver hash-compares values after sorting columns by name.

Cross-engine determinism rules used throughout:

* exact money/quantity aggregation goes through ``DECIMAL(18,2)`` —
  decimal arithmetic is exact in both engines, so sums match
  bit-for-bit; the final aggregate is cast to double for a stable
  output type.
* float reductions over arrays use a sequential left-to-right fold in
  both engines (Spark ``aggregate``, DuckDB ``list_*``), rounded to 4
  decimals before any ranking so ranks can't diverge on 1-ULP noise.
* all hashing is md5-based (:mod:`tmdb_index_spark.functions.text`
  .portable_hash60) — never ``xxhash64``/``hash`` whose values are
  engine-private.
* every integer output is cast to ``bigint``, every float to
  ``double``.

Queries tagged (SURVEY.md §2 ids) exercise the reference-derived
operator; the ``documents``/``embeddings`` queries are the north-star
LLM-pipeline extensions (SURVEY.md §7 phase 5).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tmdb_index_spark.functions.text import (
    LANG_MARKERS,
    doc_fingerprint,
    quality_features,
    token_count,
    tokens,
)
from tmdb_index_spark.operators.dedup import (
    dedup_keep_first,
    dedup_keep_last,
    duplicate_ids,
)
from tmdb_index_spark.operators.dedup_text import (
    dedup_exact,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
)
from tmdb_index_spark.operators.similarity import brute_force_topk, lsh_topk
from tmdb_index_spark.operators.upsert import (
    update_or_append,
    update_or_append_join,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

__all__ = ["QUERIES", "ORACLES", "flagship"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table is written with nanosecond timestamps, which
    Spark's parquet reader rejects by default. Read them as longs and
    truncate to microseconds — the same truncation DuckDB applies when
    casting to its microsecond TIMESTAMP, so both engines see identical
    values."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = _t(spark, sf_dir, "events")
    if dict(ev.dtypes).get("ts") == "bigint":
        # Integer division — float division loses ULPs at 1e18 nanos and
        # shifts the microsecond by one.
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return ev


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# Reference-surface queries (SURVEY.md §2)
# ---------------------------------------------------------------------------


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consumer scan+filter on the published artifact (reference
    README.md:6-12; S1/P7): predicate pushdown + column pruning reach
    the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_partkey") == 100) & (F.col("l_quantity") > 5)).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )


_FLAGSHIP_SQL = """
SELECT l_orderkey, l_partkey, l_suppkey, l_quantity
FROM lineitem
WHERE l_partkey = 100 AND l_quantity > 5
"""


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape (A3-A6 profiling aggregates): map-side partial
    aggregation; decimal-exact sums."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + _dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(
                F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_qty"),
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
"""


def q3_order_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (J-series joins + D9-style top-k): broadcast the
    filtered customer dim, aggregate revenue, deterministic top 10."""
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(revenue.cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


_Q3_SQL = """
SELECT o_orderkey, o_orderdate,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join; small dims broadcast, the
    customer-nation = supplier-nation predicate keeps it equi-join."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .filter(cust.c_nationkey == sup.s_nationkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(revenue.cast("double").alias("revenue"))
    )


_Q5_SQL = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
GROUP BY n_name
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: broadcast-join the part dim, conditional
    aggregate — promo share of revenue in one scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,2)"))).cast("double")
            / F.sum(rev).cast("double"),
            6,
        ).alias("promo_revenue_pct"),
        F.sum(rev).cast("double").alias("total_revenue"),
    )


_Q14_SQL = """
SELECT
  ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
      THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 6) AS promo_revenue_pct,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
"""


def json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction (events.props is a JSON string): parse
    k out of each payload, aggregate per event_type. get_json_object
    stays JVM-side — no UDF."""
    ev = _events(spark, sf_dir)
    # try_cast: ANSI mode makes plain cast THROW on a non-numeric payload
    # value; dirty JSON must degrade to null, not kill the job.
    k = F.get_json_object(F.col("props"), "$.k").try_cast("long")
    # Aggregates cast to DOUBLE on both engines: nullable-BIGINT outputs
    # are type-ambiguous in the driver's pandas canonicalizer (Spark side
    # promotes to float64/NaN, DuckDB keeps Int64 — round-1 hash mismatch).
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("double").alias("sum_k"),
            F.min("k").cast("double").alias("min_k"),
            F.max("k").cast("double").alias("max_k"),
        )
    )


_JSON_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) AS sum_k,
       CAST(MIN(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) AS min_k,
       CAST(MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) AS max_k
FROM events
GROUP BY event_type
"""


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping over (returnflag, linestatus): subtotals + grand
    total in one pass (grouping-set aggregation family)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def moving_avg_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed analytics (lag/frame family): 7-day moving average of
    daily event value over an ordered frame."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.sum(_dec("value")).cast("double").alias("day_value")
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        "day_value",
        F.round(F.avg("day_value").over(w), 4).alias("avg_7d"),
    )


_MOVING_AVG_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
  FROM events GROUP BY 1
)
SELECT day, day_value,
       ROUND(AVG(day_value) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS avg_7d
FROM daily
"""


def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot/reshape family: per-user event counts pivoted to one
    column per event type (explicit value list keeps the output schema
    static — the form that scales, since inferred pivot values need an
    extra distinct pass)."""
    ev = _events(spark, sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in types]
    )


_PIVOT_SQL = """
SELECT user_id,
  COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0)::BIGINT AS click,
  COALESCE(SUM(CASE WHEN event_type = 'error' THEN 1 END), 0)::BIGINT AS error,
  COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0)::BIGINT AS purchase,
  COALESCE(SUM(CASE WHEN event_type = 'signup' THEN 1 END), 0)::BIGINT AS signup,
  COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END), 0)::BIGINT AS view
FROM events GROUP BY user_id
"""


def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered array aggregation (collect family): each user's event
    types as a time-ordered sequence. collect_list alone is
    order-nondeterministic in a distributed engine — sorting structs of
    (ts, event_id, type) then projecting restores a deterministic
    order, matching SQL's ``list(... ORDER BY ts, event_id)``."""
    ev = _events(spark, sf_dir)
    seq = F.transform(
        F.sort_array(
            F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))
        ),
        lambda s: s["event_type"],
    )
    # Serialized to a scalar string: the driver's no-Arrow canonicalizer
    # cannot sort/hash array-typed cells (round-1 red row).
    return ev.groupBy("user_id").agg(
        F.array_join(seq, "|").alias("seq"), F.count(F.lit(1)).alias("n_events")
    )


_SEQUENCES_SQL = """
SELECT user_id,
       array_to_string(list(event_type ORDER BY ts, event_id), '|') AS seq,
       COUNT(*) AS n_events
FROM events GROUP BY user_id
"""


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event type (quantile
    aggregation family — exact, not approx, for oracle parity; the
    approx_percentile variant is the documented 100 TB path)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.percentile(F.col("value"), F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile(F.col("value"), F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile(F.col("value"), F.lit(0.99)), 4).alias("p99"),
    )


_PERCENTILES_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.9), 4) AS p90,
       ROUND(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY event_type
"""


def purchasing_error_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation (INTERSECT family): users appearing in both the
    purchase and the error event streams."""
    ev = _events(spark, sf_dir)
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


_INTERSECT_SQL = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
"""


def upsert_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's core upsert (C2/D2): a batch of re-priced orders
    overwrites matching ids, new ids append, old-only columns carry
    forward. Exercises the real ``update_or_append`` operator."""
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"),
        "o_totalprice",
        "o_orderstatus",
    )
    batch = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(
            F.col("o_orderkey").alias("id"),
            (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice"),
        )
    )
    return update_or_append(orders, batch)


_UPSERT_SQL = """
WITH unioned AS (
  SELECT o_orderkey AS id, o_totalprice, o_orderstatus, 0 AS prec FROM orders
  UNION ALL
  SELECT o_orderkey AS id, o_totalprice + 1000.0 AS o_totalprice, o_orderstatus, 1 AS prec
  FROM orders WHERE o_orderkey % 10 = 0
)
SELECT id, o_totalprice, o_orderstatus FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY id ORDER BY prec DESC) AS rn FROM unioned
) WHERE rn = 1
"""


def upsert_join_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SECOND upsert formulation (C2 as one full-outer join —
    ``update_or_append_join``, the co-located/bucketed scale path that
    consumes an id-bucketed index with no Exchange on the index side).
    Exercises all three merge cases: matched ids take the batch row,
    genuinely new ids append, and the batch-absent ``o_orderstatus``
    column carries forward from the index (null for appends)."""
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"), "o_totalprice", "o_orderstatus"
    )
    updates = orders.filter(F.col("id") % 10 == 0).select(
        "id", (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice")
    )
    appends = orders.filter(
        (F.col("id") % 997 == 0) & (F.col("id") % 10 != 0)
    ).select(
        (-F.col("id")).alias("id"),
        (F.col("o_totalprice") + F.lit(5.0)).alias("o_totalprice"),
    )
    return update_or_append_join(orders, updates.unionByName(appends))


_UPSERT_JOIN_SQL = """
WITH idx AS (
  SELECT o_orderkey AS id, o_totalprice, o_orderstatus FROM orders
), batch AS (
  SELECT id, o_totalprice + 1000.0 AS o_totalprice FROM idx WHERE id % 10 = 0
  UNION ALL
  SELECT -id, o_totalprice + 5.0 FROM idx WHERE id % 997 = 0 AND id % 10 <> 0
)
SELECT COALESCE(i.id, b.id) AS id,
       CASE WHEN b.id IS NOT NULL THEN b.o_totalprice
            ELSE i.o_totalprice END AS o_totalprice,
       i.o_orderstatus
FROM idx i FULL OUTER JOIN batch b ON i.id = b.id
"""


def align_dense_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-id materialization (C1/J1): absent ids become null rows.
    Uses ``spark.range`` as the dense leaf (the batch side would be
    broadcast by AQE when feed-sized)."""
    ev = _events(spark, sf_dir).filter(F.col("event_id") % 7 != 0)
    max_id = ev.agg(F.max("event_id")).collect()[0][0]
    dense = spark.range(int(max_id) + 1).select(F.col("id"))
    return dense.join(
        ev.select(F.col("event_id").alias("id"), "event_type", "value"),
        "id",
        "left",
    ).select("id", "event_type", "value")


_ALIGN_SQL = """
WITH ev AS (SELECT * FROM events WHERE event_id % 7 <> 0),
dense AS (SELECT UNNEST(generate_series(0, (SELECT MAX(event_id) FROM ev))) AS id)
SELECT dense.id, ev.event_type, ev.value
FROM dense LEFT JOIN ev ON dense.id = ev.event_id
"""


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-last dedup with explicit order (D2/D3): newest event per
    user, ties broken on event_id."""
    ev = _events(spark, sf_dir)
    return dedup_keep_last(
        ev, keys=("user_id",), order=(F.col("ts"), F.col("event_id"))
    ).select("user_id", "event_id", "event_type", "ts")


_LATEST_EVENT_SQL = """
SELECT user_id, event_id, event_type, ts FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
  FROM events
) WHERE rn = 1
"""


def first_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup with explicit order (D4): earliest event per
    user."""
    ev = _events(spark, sf_dir)
    return dedup_keep_first(
        ev, keys=("user_id",), order=(F.col("ts"), F.col("event_id"))
    ).select("user_id", "event_id", "event_type", "ts")


_FIRST_EVENT_SQL = """
SELECT user_id, event_id, event_type, ts FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) rn
  FROM events
) WHERE rn = 1
"""


def duplicate_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-key detection (D6) on the orders fact: customers with
    more than one order. Map-side-combined groupBy, no window."""
    return duplicate_ids(_t(spark, sf_dir, "orders"), key="o_custkey")


_DUPKEYS_SQL = """
SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) > 1
"""


def backfill_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill work-selection (D9): among never-seen keys (customers
    with no orders since 1999), the first 100 in key order."""
    cust = _t(spark, sf_dir, "customer")
    seen = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    missing = cust.join(seen, "c_custkey", "left_anti")
    w = Window.orderBy(F.col("c_custkey").asc())
    return (
        missing.select("c_custkey")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .select("c_custkey")
    )


_BACKFILL_SQL = """
SELECT c_custkey FROM (
  SELECT c_custkey, ROW_NUMBER() OVER (ORDER BY c_custkey ASC) rn
  FROM customer
  WHERE c_custkey NOT IN (
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
  )
) WHERE rn <= 100
"""


def refresh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Refresh work-selection (D10): the 100 stalest orders by date,
    deterministic tie-break on key."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return (
        orders.select("o_orderkey", "o_orderdate")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .select("o_orderkey", "o_orderdate")
    )


_REFRESH_SQL = """
SELECT o_orderkey, o_orderdate FROM (
  SELECT o_orderkey, o_orderdate,
         ROW_NUMBER() OVER (ORDER BY o_orderdate ASC, o_orderkey ASC) rn
  FROM orders
) WHERE rn <= 100
"""


def change_summary_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version diff (C7): full outer join of two table versions on the
    key; added / removed / changed / unchanged counts with null-safe
    column comparison."""
    orders = _t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        F.col("o_orderkey").alias("id"), F.col("o_totalprice").alias("price")
    )
    new = orders.select(
        F.col("o_orderkey").alias("id"),
        F.when(
            F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") + 1000.0
        ).otherwise(F.col("o_totalprice")).alias("price"),
    )
    o = old.select("id", F.col("price").alias("__old__"))
    n = new.select("id", F.col("price").alias("__new__"))
    j = o.join(n, "id", "full_outer")
    added = F.col("__old__").isNull() & F.col("__new__").isNotNull()
    removed = F.col("__new__").isNull() & F.col("__old__").isNotNull()
    changed = (
        F.col("__old__").isNotNull()
        & F.col("__new__").isNotNull()
        & (F.col("__old__") != F.col("__new__"))
    )
    return j.agg(
        F.sum(added.cast("int")).cast("long").alias("added"),
        F.sum(removed.cast("int")).cast("long").alias("removed"),
        F.sum(changed.cast("int")).cast("long").alias("changed"),
        F.sum(
            (
                F.col("__old__").isNotNull()
                & F.col("__new__").isNotNull()
                & (F.col("__old__") == F.col("__new__"))
            ).cast("int")
        ).cast("long").alias("unchanged"),
    )


_CHANGE_SUMMARY_SQL = """
WITH old AS (
  SELECT o_orderkey AS id, o_totalprice AS price FROM orders WHERE o_orderkey % 11 <> 0
), new AS (
  SELECT o_orderkey AS id,
         CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1000.0 ELSE o_totalprice END AS price
  FROM orders
)
SELECT
  SUM(CASE WHEN old.id IS NULL AND new.id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS added,
  SUM(CASE WHEN new.id IS NULL AND old.id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS removed,
  SUM(CASE WHEN old.id IS NOT NULL AND new.id IS NOT NULL AND old.price <> new.price THEN 1 ELSE 0 END)::BIGINT AS changed,
  SUM(CASE WHEN old.id IS NOT NULL AND new.id IS NOT NULL AND old.price = new.price THEN 1 ELSE 0 END)::BIGINT AS unchanged
FROM old FULL OUTER JOIN new ON old.id = new.id
"""


def profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (C8/A3-A5): per-column null and exact distinct
    counts in one multi-aggregate pass, unpivoted to (column, metric)
    rows."""
    orders = _t(spark, sf_dir, "orders")
    cols = ["o_orderstatus", "o_orderpriority", "o_custkey"]
    aggs = []
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("int")).cast("long").alias(f"n_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"d_{c}"))
    row = orders.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"n_{c}").alias("n_nulls"),
                F.col(f"d_{c}").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(pairs).alias("p")).select(
        "p.column", "p.n_nulls", "p.n_distinct"
    )


_PROFILE_SQL = """
SELECT 'o_orderstatus' AS "column",
       SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
       COUNT(DISTINCT o_orderstatus)::BIGINT AS n_distinct FROM orders
UNION ALL
SELECT 'o_orderpriority',
       SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)::BIGINT,
       COUNT(DISTINCT o_orderpriority)::BIGINT FROM orders
UNION ALL
SELECT 'o_custkey',
       SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT,
       COUNT(DISTINCT o_custkey)::BIGINT FROM orders
"""


def validate_dense_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-key invariant check (C9/A7) as a single aggregate:
    ``dense ⇔ nulls==0 ∧ min==0 ∧ max==n−1 ∧ distinct==n``."""
    ev = _events(spark, sf_dir)
    return ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("event_id").isNull().cast("int")).cast("long").alias("n_nulls"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        F.count_distinct("event_id").alias("n_distinct"),
        (
            (F.sum(F.col("event_id").isNull().cast("int")) == 0)
            & (F.min("event_id") == 0)
            & (F.max("event_id") == F.count(F.lit(1)) - 1)
            & (F.count_distinct("event_id") == F.count(F.lit(1)))
        ).alias("is_dense"),
    )


_VALIDATE_SQL = """
SELECT COUNT(*) AS n,
       SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
       MIN(event_id) AS min_id,
       MAX(event_id) AS max_id,
       COUNT(DISTINCT event_id)::BIGINT AS n_distinct,
       (SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) = 0
        AND MIN(event_id) = 0
        AND MAX(event_id) = COUNT(*) - 1
        AND COUNT(DISTINCT event_id) = COUNT(*)) AS is_dense
FROM events
"""


def extract_numeric_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex numeric-id extraction (P10) + UInt32 clamp (P11) over the
    customer name column (reference regex tables tmdb_index.py:22-26),
    via the engine's extraction functions."""
    from tmdb_index_spark.functions.extract import extract_numeric_id

    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        extract_numeric_id(F.col("c_name"), r"#(\d+)").alias("name_numeric_id"),
    )


_EXTRACT_SQL = """
SELECT c_custkey,
  CASE WHEN TRY_CAST(NULLIF(regexp_extract(c_name, '#(\\d+)', 1), '') AS BIGINT)
            BETWEEN 0 AND 4294967295
       THEN TRY_CAST(NULLIF(regexp_extract(c_name, '#(\\d+)', 1), '') AS BIGINT)
  END AS name_numeric_id
FROM customer
"""


def daily_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-granularity rounding (P8) + decimal-exact rollup: events per
    day with total value. The batch twin of the streaming tumbling
    window."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
    )


_DAILY_ROLLUP_SQL = """
SELECT date_trunc('day', ts) AS day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1
"""


def export_flag_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag left-join + null-fill (C4/J3/P6): mark customers present in
    the orders 'export' and fill absences with false."""
    cust = _t(spark, sf_dir, "customer")
    flag = (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("has_orders", F.lit(True))
    )
    return cust.join(flag, "c_custkey", "left").select(
        "c_custkey", F.coalesce("has_orders", F.lit(False)).alias("has_orders")
    )


_EXPORT_FLAG_SQL = """
SELECT c_custkey,
       COALESCE(f.has_orders, FALSE) AS has_orders
FROM customer
LEFT JOIN (SELECT DISTINCT o_custkey, TRUE AS has_orders FROM orders) f
  ON c_custkey = f.o_custkey
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-minute-gap sessions per user via lag + running
    sum — the window-function twin of streaming session windows."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # cast: unix_micros requires TIMESTAMP; driver parquet may carry
    # TIMESTAMP_NTZ, which reinterprets wall-clock under the pinned UTC
    # session — identical micros either way.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    with_session = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0),
    ).withColumn("session_id", F.sum("new_session").over(w))
    return (
        with_session.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


_SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
  FROM g
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM s GROUP BY user_id, session_id
"""


def hourly_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming tumbling-window aggregation — the
    SAME operator (`windowed_event_counts`) runs on the stream; epoch-
    aligned 1-hour windows equal date_trunc('hour')."""
    from tmdb_index_spark.streaming.windowed import windowed_event_counts

    return windowed_event_counts(_events(spark, sf_dir), "1 hour")


_HOURLY_WINDOW_SQL = """
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2, 3
"""


def session_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming gap-based session window — session
    end is last event + gap."""
    from tmdb_index_spark.streaming.windowed import sessionize_stream

    return sessionize_stream(_events(spark, sf_dir), gap="30 minutes")


# event_id tiebreak in BOTH window ORDER BYs: ts alone can tie, and
# the running SUM pass re-sorts independently of the LAG pass — the
# stacked-window tie-instability class caught on
# supplier_busy_intervals at sf0.1 (see tools/oracle_order_lint.py).
_SESSION_WINDOW_SQL = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""


# ---------------------------------------------------------------------------
# North-star extension queries: documents / embeddings
# ---------------------------------------------------------------------------


def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-content dedup groups over documents (extension: exact
    dedup)."""
    return dedup_exact(_t(spark, sf_dir, "documents"))


_DEDUP_EXACT_SQL = """
SELECT md5(text) AS content_hash,
       MIN(doc_id) AS keeper_id,
       COUNT(*) AS n_docs
FROM documents GROUP BY 1
"""

# Shared DuckDB CTE: tokenized docs and distinct word-3-gram shingles.
_DUCK_SHINGLES = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, greatest(len(ts)-2, 0)),
                                      i -> array_to_string(list_slice(ts, i, i+2), ' '))) AS shs
  FROM t
)
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-dup pairs ≥ 0.1 (extension: n-gram
    Jaccard dedup) via the inverted shingle index."""
    return ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.1, max_df=1000
    )


def _ngram_jaccard_sql(threshold: float, max_df: int | None = None) -> str:
    """Oracle for the Jaccard pair operators. ``max_df`` mirrors the
    operator's skew guard EXACTLY: shingles in more than ``max_df``
    docs are excluded from intersection counts while denominators stay
    the true pre-filter set sizes — so the oracle stays equivalent at
    corpus scales where the guard actually fires, not just where it's
    vacuous."""
    if max_df is None:
        ex_filtered = "ex"
        df_cte = ""
    else:
        df_cte = f""", sdf AS (
  SELECT s, COUNT(*) AS df FROM ex GROUP BY 1
), exf AS (
  SELECT e.doc_id, e.s FROM ex e JOIN sdf USING (s) WHERE sdf.df <= {max_df}
)"""
        ex_filtered = "exf"
    return (
        _DUCK_SHINGLES
        + f""", ex AS (
  SELECT doc_id, UNNEST(shs) AS s FROM sh
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY 1
){df_cte}, inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM {ex_filtered} a JOIN {ex_filtered} b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(c * 1.0 / (na.n + nb.n - c), 4) AS jaccard
FROM inter
JOIN sizes na ON id_a = na.doc_id
JOIN sizes nb ON id_b = nb.doc_id
WHERE ROUND(c * 1.0 / (na.n + nb.n - c), 4) >= {threshold}
"""
    )


_NGRAM_JACCARD_SQL = _ngram_jaccard_sql(0.1, max_df=1000)


def dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin/All-Pairs prefix-filtered exact Jaccard at t=0.5
    (extension: the candidate-pruning scale path; identical result set
    to the inverted-index operator, verified against the same plain
    SQL oracle)."""
    from tmdb_index_spark.operators.dedup_text import ngram_jaccard_pairs_prefix

    return ngram_jaccard_pairs_prefix(
        _t(spark, sf_dir, "documents"), threshold=0.5
    )


_JACCARD_PREFIX_SQL = _ngram_jaccard_sql(0.5)


def minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signatures, 8 hashes (extension: MinHash). Pure
    map stage — no shuffle."""
    return minhash_signatures(_t(spark, sf_dir, "documents"), num_hashes=8)


def _minhash_expr(i: int) -> str:
    from tmdb_index_spark.operators.dedup_text import (
        MINHASH_P,
        _minhash_a,
        _minhash_b,
    )

    base = "(('0x' || substr(md5(s), 1, 15))::BIGINT % {p})".format(p=MINHASH_P)
    return (
        f"list_min(list_transform(shs, s -> "
        f"({base} * {_minhash_a(i)} + {_minhash_b(i)}) % {MINHASH_P}))"
    )


_MINHASH_SQL = (
    _DUCK_SHINGLES
    + "SELECT doc_id, "
    + ", ".join(f"{_minhash_expr(i)} AS minhash_{i}" for i in range(8))
    + " FROM sh"
)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (extension: MinHash+LSH): banded
    buckets generate candidates, exact Jaccard ≥ 0.5 verifies."""
    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        num_hashes=16,
        bands=4,
        threshold=0.5,
    )


_MINHASH_LSH_SQL = (
    _DUCK_SHINGLES
    + """, sig AS (
  SELECT doc_id, """
    + ", ".join(f"{_minhash_expr(i)} AS mh{i}" for i in range(16))
    + """ FROM sh
), buckets AS (
  SELECT doc_id, b.band,
         CASE b.band
           WHEN 0 THEN concat_ws(',', mh0, mh1, mh2, mh3)
           WHEN 1 THEN concat_ws(',', mh4, mh5, mh6, mh7)
           WHEN 2 THEN concat_ws(',', mh8, mh9, mh10, mh11)
           ELSE concat_ws(',', mh12, mh13, mh14, mh15)
         END AS key
  FROM sig, (SELECT UNNEST(generate_series(0, 3)) AS band) b
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
), ex AS (
  SELECT doc_id, UNNEST(shs) AS s FROM sh
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY 1
), inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS c
  FROM cand c
  JOIN ex a ON a.doc_id = c.id_a
  JOIN ex b ON b.doc_id = c.id_b AND b.s = a.s
  GROUP BY 1, 2
)
SELECT id_a, id_b, ROUND(c * 1.0 / (na.n + nb.n - c), 4) AS jaccard
FROM inter
JOIN sizes na ON id_a = na.doc_id
JOIN sizes nb ON id_b = nb.doc_id
WHERE ROUND(c * 1.0 / (na.n + nb.n - c), 4) >= 0.5
"""
)


def incremental_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion novelty audit (extension: the batch-vs-
    index complement of `dedup_minhash_lsh` — production dedup is
    INCREMENTAL: a new batch arrives and the question is how much of it
    duplicates the already-indexed corpus, never re-pairing the index
    against itself): batch = docs with ``doc_id % 7 == 3``, index = the
    rest; `operators/dedup_text.py: minhash_novelty_pairs` generates
    strictly batch x index candidates with the batch's band buckets
    BROADCAST (the index never shuffles for candidate generation),
    verifies with exact Jaccard >= 0.5, and the rollup reports each
    source's batch size, duplicate count, and novel-content rate — the
    number an ingestion pipeline alarms on when a crawl source starts
    re-sending old content."""
    from tmdb_index_spark.operators.dedup_text import minhash_novelty_pairs

    docs = _t(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 7 == 3)
    index = docs.filter(F.col("doc_id") % 7 != 3)
    pairs = minhash_novelty_pairs(
        index, batch, num_hashes=16, bands=4, threshold=0.5
    )
    dup = pairs.select(F.col("batch_id").alias("doc_id")).distinct()
    flagged = batch.select("doc_id", "source").join(
        dup.withColumn("__dup__", F.lit(1)), "doc_id", "left"
    )
    n = F.count(F.lit(1))
    n_dup = F.sum(F.coalesce(F.col("__dup__"), F.lit(0)))
    return flagged.groupBy("source").agg(
        n.cast("long").alias("n_batch"),
        n_dup.cast("long").alias("n_dup"),
        F.round(
            F.lit(1.0) - n_dup.cast("double") / n.cast("double"), 4
        ).alias("novel_rate"),
    )


_NOVELTY_SQL = (
    _DUCK_SHINGLES
    + """, sig AS (
  SELECT doc_id, """
    + ", ".join(f"{_minhash_expr(i)} AS mh{i}" for i in range(16))
    + """ FROM sh
), buckets AS (
  SELECT doc_id, b.band,
         CASE b.band
           WHEN 0 THEN concat_ws(',', mh0, mh1, mh2, mh3)
           WHEN 1 THEN concat_ws(',', mh4, mh5, mh6, mh7)
           WHEN 2 THEN concat_ws(',', mh8, mh9, mh10, mh11)
           ELSE concat_ws(',', mh12, mh13, mh14, mh15)
         END AS key
  FROM sig, (SELECT UNNEST(generate_series(0, 3)) AS band) b
  WHERE mh0 IS NOT NULL
), cand AS (
  SELECT DISTINCT b.doc_id AS batch_id, a.doc_id AS index_id
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.key = b.key
  WHERE b.doc_id % 7 = 3 AND a.doc_id % 7 <> 3
), ex AS (
  SELECT doc_id, UNNEST(shs) AS s FROM sh
), sizes AS (
  SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY 1
), inter AS (
  SELECT c.batch_id, c.index_id, COUNT(*) AS c
  FROM cand c
  JOIN ex a ON a.doc_id = c.batch_id
  JOIN ex b ON b.doc_id = c.index_id AND b.s = a.s
  GROUP BY 1, 2
), dup AS (
  SELECT DISTINCT batch_id
  FROM inter
  JOIN sizes na ON batch_id = na.doc_id
  JOIN sizes nb ON index_id = nb.doc_id
  WHERE ROUND(c * 1.0 / (na.n + nb.n - c), 4) >= 0.5
)
SELECT d.source,
       COUNT(*)::BIGINT AS n_batch,
       SUM(CASE WHEN dup.batch_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_dup,
       ROUND(1.0 - SUM(CASE WHEN dup.batch_id IS NOT NULL THEN 1 ELSE 0
                       END) * 1.0 / COUNT(*), 4) AS novel_rate
FROM documents d LEFT JOIN dup ON d.doc_id = dup.batch_id
WHERE d.doc_id % 7 = 3
GROUP BY d.source
"""
)


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 64-bit SimHash fingerprints (extension: SimHash)."""
    return simhash64(_t(spark, sf_dir, "documents"))


_SIMHASH_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS ts
  FROM documents
), hs AS (
  SELECT doc_id,
         list_transform(ts, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hh,
         len(ts) AS n_tokens
  FROM toks
), votes AS (
  SELECT doc_id, n_tokens,
         list_transform(generate_series(0, 59),
           b -> list_sum(list_transform(hh,
                  h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)))
           AS v
  FROM hs
)
SELECT doc_id,
       list_sum(list_transform(generate_series(0, 59),
         b -> CASE WHEN v[b+1] > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END))::BIGINT
         AS simhash,
       n_tokens::BIGINT AS n_tokens
FROM votes
"""


def simhash_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, hamming ≤ 2 (extension: SimHash pair
    search with pigeonhole-block candidate generation)."""
    from tmdb_index_spark.operators.dedup_text import simhash_neardup_pairs

    return simhash_neardup_pairs(_t(spark, sf_dir, "documents"), max_hamming=2)


# Pigeonhole blocks for max_hamming=2 → 3 blocks of 20 bits over the
# 60-bit fingerprint; offsets derived identically to the Spark side.
def _simhash_block_sql() -> str:
    max_hamming = 2
    n_blocks = max_hamming + 1
    bits = 60
    base = bits // n_blocks
    sizes = [base + (1 if i < bits % n_blocks else 0) for i in range(n_blocks)]
    offsets = [sum(sizes[:i]) for i in range(n_blocks)]
    block_rows = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {i} AS blk, "
        f"(simhash >> {offsets[i]}) & {(1 << sizes[i]) - 1} AS val FROM sig"
        for i in range(n_blocks)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS ts
  FROM documents
), hs AS (
  SELECT doc_id, list_transform(ts, t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS hh
  FROM toks
), votes AS (
  SELECT doc_id,
         list_transform(generate_series(0, 59),
           b -> list_sum(list_transform(hh,
                  h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END))) AS v
  FROM hs
), sig AS (
  SELECT doc_id,
         list_sum(list_transform(generate_series(0, 59),
           b -> CASE WHEN v[b+1] > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END))::BIGINT
           AS simhash
  FROM votes WHERE v IS NOT NULL
), blocks AS ({block_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
  FROM blocks a JOIN blocks b ON a.blk = b.blk AND a.val = b.val
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming FROM cand WHERE hamming <= {max_hamming}
"""


_SIMHASH_NEARDUP_SQL = _simhash_block_sql()


def embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 for the first 10 vectors
    (extension: similarity-search baseline)."""
    emb = _t(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


_COS_SQL = (
    "ROUND(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i])) / "
    "(sqrt(list_sum(list_transform(q.v, x -> x * x))) * "
    "sqrt(list_sum(list_transform(c.v, x -> x * x)))), 4)"
)

_EMB_TOPK_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS_SQL} AS cos_sim
  FROM (SELECT * FROM v WHERE vec_id < 10) q
  CROSS JOIN v c
  WHERE q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC)::BIGINT AS rank
  FROM scored
) WHERE rank <= 5
"""


def embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit LSH-bucketed approximate all-pairs top-3 (extension:
    similarity-search scale path)."""
    return lsh_topk(_t(spark, sf_dir, "embeddings"), k=3, n_bits=6)


_EMB_LSH_SQL = f"""
WITH v AS (
  SELECT vec_id, v,
         list_sum(list_transform(generate_series(0, 5),
           i -> CASE WHEN v[i+1] >= 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS bucket
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
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


def embedding_lsh_tuned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-tuned LSH top-3: the production ANN entry point
    (:func:`~tmdb_index_spark.operators.similarity.lsh_index_topk`)
    with the bit count derived from the corpus row count —
    ``bits = clamp(ceil(log2(N / 32)), 1, dim)`` — so mean bucket
    occupancy (and therefore within-bucket scoring work per vector)
    stays constant as N grows. The fixed-bits twin above
    (``embedding_lsh_topk``) is the measured scale failure mode
    (SCALE.md: 10x data at 8 fixed bits -> 64.9x time); this query is
    the certified fix. The bit formula is a deterministic function of
    ``COUNT(*)``, so the DuckDB oracle computes the identical bucket
    ids (extension: similarity-search scale path)."""
    from tmdb_index_spark.operators.similarity import lsh_index_topk

    return lsh_index_topk(_t(spark, sf_dir, "embeddings"), k=3)


# Oracle mirror of lsh_index_topk's tuning rule (similarity.py):
#   bits = min(max(1, ceil(log2(max(N, 2) / target_bucket))), dim)
# with target_bucket=32 and dim=64. Both engines evaluate the same
# IEEE-double division and log2, so the computed bit count — and hence
# every bucket id — is identical.
_EMB_LSH_TUNED_SQL = f"""
WITH p AS (
  SELECT LEAST(GREATEST(1, CAST(CEIL(LOG2(GREATEST(COUNT(*), 2) / 32.0)) AS BIGINT)), 64) AS nb
  FROM embeddings
),
v AS (
  SELECT vec_id, v,
         list_sum(list_transform(generate_series(0, (SELECT nb FROM p) - 1),
           i -> CASE WHEN v[i+1] >= 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS bucket
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
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


#: Deterministic IVF centroids for the catalog query: 8 axis-aligned
#: unit vectors in the 64-dim embedding space. A production index fits
#: these with sampled k-means; the operator (assign + in-cell search) is
#: what's under test, and axis centroids make the oracle reproducible.
_IVF_DIM = 64
_IVF_CELLS = 16
_IVF_CENTROIDS = [
    (j, [1.0 if i == j else 0.0 for i in range(_IVF_DIM)]) for j in range(_IVF_CELLS)
]


def embedding_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate all-pairs top-3 (extension:
    similarity-search IVF scale path with fixed centroids)."""
    from tmdb_index_spark.operators.similarity import ivf_topk

    return ivf_topk(_t(spark, sf_dir, "embeddings"), _IVF_CENTROIDS, k=3)


def _ivf_dist_sql(j: int) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, {_IVF_DIM}), "
        f"i -> (v[i] - CASE WHEN i = {j + 1} THEN 1.0 ELSE 0.0 END) "
        f"* (v[i] - CASE WHEN i = {j + 1} THEN 1.0 ELSE 0.0 END)))"
    )


_IVF_SQL = (
    "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),\n"
    "d AS (SELECT vec_id, v, "
    + ", ".join(f"{_ivf_dist_sql(j)} AS d{j}" for j in range(_IVF_CELLS))
    + " FROM v),\n"
    "assigned AS (SELECT vec_id, v, CASE\n"
    + "\n".join(
        "  WHEN "
        + " AND ".join(f"d{j} <= d{o}" for o in range(_IVF_CELLS) if o != j)
        + f" THEN {j}"
        for j in range(_IVF_CELLS - 1)
    )
    + f"\n  ELSE {_IVF_CELLS - 1} END AS cell FROM d),\n"
    f"scored AS (\n"
    f"  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS_SQL} AS cos_sim\n"
    "  FROM assigned q JOIN assigned c ON q.cell = c.cell\n"
    "  WHERE q.vec_id <> c.vec_id\n"
    ")\n"
    "SELECT query_id, neighbor_id, cos_sim, rank FROM (\n"
    "  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id\n"
    "    ORDER BY cos_sim DESC, neighbor_id ASC)::BIGINT AS rank FROM scored\n"
    ") WHERE rank <= 3\n"
)


def embedding_ivf_tuned_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-tuned IVF top-3: the production IVF entry point
    (:func:`~tmdb_index_spark.operators.similarity.ivf_index_topk`)
    with ``cells = round(sqrt(N))`` (keeps both the within-cell
    quadratic and the assignment cost linear in N) and centroids fit
    by deterministic sampled k-means. The k-means fit is an iterative
    driver-side algorithm ANSI SQL cannot RUN — but given a fixed
    sample and seed it is a pure function, so the ORACLE re-runs the
    identical numpy fit (:func:`fit_kmeans_array` on the same
    ORDER BY vec_id LIMIT sample read straight from parquet) and
    embeds the fitted centroids as SQL literals
    (:func:`_fitted_ivf_oracle_sql`, registered via
    :data:`DYNAMIC_ORACLES`) — closing the round-6 ``no_oracle`` gap
    with a full value row. ULP caveat: Spark assigns via one BLAS
    matmul, the SQL via a sequential fold — a flip needs two cells
    within ~1 ULP of a vector, which random embeddings don't produce;
    the cos scores themselves compare after ROUND(...,4) (extension:
    similarity-search scale path)."""
    from tmdb_index_spark.operators.similarity import ivf_index_topk

    return ivf_index_topk(_t(spark, sf_dir, "embeddings"), k=3)


def _fitted_ivf_oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> str | None:
    """Value-row oracle for ``embedding_ivf_tuned_topk``: reproduce the
    deterministic centroid fit OUTSIDE Spark (duckdb parquet read of
    the same first-``max_sample``-by-id sample + the shared
    :func:`fit_kmeans_array` numpy core, same seed), then emit plain
    SQL with the fitted centroids as literals — assignment is argmin
    over a literal centroid table with the (dist, cell) tie-break the
    operator uses. Returns None when the table is unreadable (the
    driver then records the rows-only fallback)."""
    try:
        import duckdb
        import numpy as np

        from tmdb_index_spark.operators.similarity import fit_kmeans_array

        con = duckdb.connect()
        path = f"{sf_dir}/embeddings.parquet"
        n = con.sql(f"SELECT COUNT(*) FROM '{path}'").fetchone()[0]
        if not n:
            return None
        sample = con.sql(
            f"SELECT embedding FROM '{path}' ORDER BY vec_id LIMIT 10000"
        ).fetchall()
        X = np.array([list(r[0]) for r in sample], dtype="float64")
        cells = max(1, round(n ** 0.5))
        cents = fit_kmeans_array(X, cells)
    except Exception:  # noqa: BLE001 — missing table → rows-only row
        return None
    dim = X.shape[1]
    values = ",\n    ".join(
        "({}, [{}])".format(
            cid, ", ".join(repr(float(x)) for x in vec)
        )
        for cid, vec in cents
    )
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT * FROM (VALUES
    {values}
) AS t(cell, cv)),
d AS (
  SELECT vec_id, v, cell,
         list_sum(list_transform(generate_series(1, {dim}),
           i -> (v[i] - cv[i]) * (v[i] - cv[i]))) AS dist
  FROM v CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist ASC, cell ASC) AS rn
    FROM d
  ) WHERE rn = 1
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS_SQL} AS cos_sim
  FROM assigned q JOIN assigned c ON q.cell = c.cell
  WHERE q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC)::BIGINT AS rank
  FROM scored
) WHERE rank <= 3
"""


def embedding_ivf2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level (hierarchical) IVF top-3 — the round-7 answer to flat
    IVF's measured Θ(N^1.5) ceiling (SCALE.md): coarse-quantized
    assignment makes total work Θ(N^(4/3)) with ``cells = N^(2/3)``,
    ``coarse = √cells``, here with ``probe_coarse=2`` for boundary
    recall. The oracle reproduces the identical two-stage fit
    (:func:`_fitted_ivf2_oracle_sql` via the shared numpy core on the
    same parquet sample) and expresses the two-stage argmin over
    literal centroid tables — a full value row despite the iterative
    fit (extension: similarity-search scale path)."""
    from tmdb_index_spark.operators.similarity import ivf2_index_topk

    return ivf2_index_topk(
        _t(spark, sf_dir, "embeddings"), k=3, probe_coarse=2
    )


def _fitted_ivf2_oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> str | None:
    """Value-row oracle for ``embedding_ivf2_topk``: rerun the
    deterministic two-level fit from the same parquet sample, embed
    coarse + fine centroid tables (with fine→coarse membership) as
    literals, and express the two-stage assignment — each vector's 2
    nearest coarse cells by (dist, ccell), then argmin (dist, cell)
    over the probed cells' fine members — in plain SQL."""
    probe_coarse = 2
    try:
        import duckdb
        import numpy as np

        from tmdb_index_spark.operators.similarity import (
            two_level_from_sample,
        )

        con = duckdb.connect()
        path = f"{sf_dir}/embeddings.parquet"
        n = con.sql(f"SELECT COUNT(*) FROM '{path}'").fetchone()[0]
        if not n:
            return None
        sample = con.sql(
            f"SELECT embedding FROM '{path}' ORDER BY vec_id LIMIT 10000"
        ).fetchall()
        X = np.array([list(r[0]) for r in sample], dtype="float64")
        cells = max(1, min(round(n ** (2.0 / 3.0)), 10_000))
        coarse = max(1, round(cells ** 0.5))
        cc, fine, f2c = two_level_from_sample(X, cells, coarse)
    except Exception:  # noqa: BLE001
        return None
    dim = X.shape[1]
    # only POPULATED coarse cells are probe candidates (mirrors
    # two_level_ivf_assign: a probed-but-empty cell would drop the
    # vector from the membership join here while Spark must still
    # assign it)
    used = set(f2c.values())
    cvals = ",\n    ".join(
        "({}, [{}])".format(cid, ", ".join(repr(float(x)) for x in vec))
        for cid, vec in cc
        if int(cid) in used
    )
    fvals = ",\n    ".join(
        "({}, {}, [{}])".format(
            fid, f2c[int(fid)], ", ".join(repr(float(x)) for x in vec)
        )
        for fid, vec in fine
    )
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ccent AS (SELECT * FROM (VALUES
    {cvals}
) AS t(ccell, ccv)),
fcent AS (SELECT * FROM (VALUES
    {fvals}
) AS t(cell, ccell, cv)),
dc AS (
  SELECT vec_id, v, ccell,
         list_sum(list_transform(generate_series(1, {dim}),
           i -> (v[i] - ccv[i]) * (v[i] - ccv[i]))) AS cdist
  FROM v CROSS JOIN ccent
),
probed AS (
  SELECT vec_id, v, ccell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY cdist ASC, ccell ASC) AS pr
    FROM dc
  ) WHERE pr <= {probe_coarse}
),
df_ AS (
  SELECT p.vec_id, p.v, f.cell,
         list_sum(list_transform(generate_series(1, {dim}),
           i -> (p.v[i] - f.cv[i]) * (p.v[i] - f.cv[i]))) AS dist
  FROM probed p JOIN fcent f ON f.ccell = p.ccell
),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist ASC, cell ASC) AS rn
    FROM df_
  ) WHERE rn = 1
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS_SQL} AS cos_sim
  FROM assigned q JOIN assigned c ON q.cell = c.cell
  WHERE q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC)::BIGINT AS rank
  FROM scored
) WHERE rank <= 3
"""


def embedding_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-3 with query-side multi-probe (nprobe=2): each query
    searches its two nearest cells — the recall lever for boundary
    vectors (extension: similarity-search scale path). Scoring runs
    the cogrouped per-cell BLAS path (``impl='pandas'``, the default):
    the round-9 full-catalog stress sweep measured the interpreted
    expression spelling at 80× for 10× data — the per-pair 64-term
    fold constant, not the pinned-cell candidate count (the same
    pinned cells under BLAS track flat IVF's slope)."""
    from tmdb_index_spark.operators.similarity import ivf_topk

    return ivf_topk(
        _t(spark, sf_dir, "embeddings"), _IVF_CENTROIDS, k=3, nprobe=2,
    )


_IVF_MULTIPROBE_SQL = (
    "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),\n"
    "d AS (SELECT vec_id, v, "
    + ", ".join(f"{_ivf_dist_sql(j)} AS d{j}" for j in range(_IVF_CELLS))
    + " FROM v),\n"
    "cells AS (\n"
    + " UNION ALL\n".join(
        f"  SELECT vec_id, v, {j} AS cell, d{j} AS dist FROM d"
        for j in range(_IVF_CELLS)
    )
    + "\n),\n"
    "ranked AS (\n"
    "  SELECT vec_id, v, cell,\n"
    "         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS cr\n"
    "  FROM cells\n"
    "),\n"
    "scored AS (\n"
    f"  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS_SQL} AS cos_sim\n"
    "  FROM (SELECT * FROM ranked WHERE cr <= 2) q\n"
    "  JOIN (SELECT * FROM ranked WHERE cr = 1) c ON q.cell = c.cell\n"
    "  WHERE q.vec_id <> c.vec_id\n"
    ")\n"
    "SELECT query_id, neighbor_id, cos_sim, rank FROM (\n"
    "  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id\n"
    "    ORDER BY cos_sim DESC, neighbor_id ASC)::BIGINT AS rank FROM scored\n"
    ") WHERE rank <= 3\n"
)


def embedding_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (extension: embedding near-dup
    dedup) — exact baseline (quadratic candidate count BY
    CONSTRUCTION; the LSH-bucketed variant
    `cosine_neardup_pairs(n_bits=...)` is the scale path). Scoring
    runs the broadcast-matrix BLAS form (``impl='pandas'``, the
    default, corpus size bounded by contract): the round-9 stress
    sweep measured the interpreted per-pair fold at 47× for 10× data —
    a constant regression on top of the documented quadratic shape."""
    from tmdb_index_spark.operators.similarity import cosine_neardup_pairs

    return cosine_neardup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.4)


_EMB_NEARDUP_SQL = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  ROUND(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i])) /
        (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
         sqrt(list_sum(list_transform(b.v, x -> x * x)))), 4) AS cos_sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE ROUND(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i])) /
        (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
         sqrt(list_sum(list_transform(b.v, x -> x * x)))), 4) >= 0.4
"""


def embedding_neardups_tuned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-tuned bucketed embedding near-dup pairs (extension:
    embedding near-dup dedup, scale path) — the linear-work twin of
    the exact baseline above: sign-bit bucket count tracks
    ``COUNT(*)`` (`bits = clamp(ceil(log2(N / 32)), 1, dim)`, the
    same rule as `embedding_lsh_tuned_topk`), pinning mean bucket
    occupancy so total candidate volume is ~N·32/2 instead of N²/2.
    Same ``(id_a, id_b, cos_sim ≥ 0.4)`` contract on rounded sims;
    recall approximate at bucket boundaries (the documented LSH
    trade). The bit rule is a deterministic function of the row
    count, so the oracle reproduces bucket ids — and the emitted pair
    set — exactly."""
    from tmdb_index_spark.operators.similarity import neardup_index_pairs

    return neardup_index_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.4
    )


# Oracle mirror of neardup_index_pairs: the bit-count rule is the
# lsh_index_topk tuning formula (target_bucket=32, dim cap 64 — the
# embeddings table's dimension); both engines evaluate the same IEEE
# double log2/division, so bucket ids match bit-for-bit and the pair
# set is identical.
_EMB_NEARDUP_TUNED_SQL = """
WITH p AS (
  SELECT LEAST(GREATEST(1, CAST(CEIL(LOG2(GREATEST(COUNT(*), 2) / 32.0)) AS BIGINT)), 64) AS nb
  FROM embeddings
),
v AS (
  SELECT vec_id, v,
         list_sum(list_transform(generate_series(0, (SELECT nb FROM p) - 1),
           i -> CASE WHEN v[i+1] >= 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS bucket
  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
)
SELECT id_a, id_b, cos_sim FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    ROUND(list_sum(list_transform(generate_series(1, len(a.v)), i -> a.v[i] * b.v[i])) /
          (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
           sqrt(list_sum(list_transform(b.v, x -> x * x)))), 4) AS cos_sim
  FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
WHERE cos_sim >= 0.4
"""


def semantic_dedup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication flags (extension:
    embedding near-dup dedup, cluster-bounded scale path — Abbas et
    al. 2023, arXiv:2303.09540): k-means cells bound candidate
    generation to within-cell pairs (``N²/cells`` with the
    ``cells = round(√N)`` rule), and each vector is dropped iff a
    SMALLER-id cell-mate is ``cos ≥ 0.4`` similar — the deterministic
    first-occurrence election, so the kept set is a pure function of
    the table. The k-means fit is iterative and driver-side, but a
    pure function of the (first-10k-by-id) sample — the oracle
    re-runs the identical numpy fit and embeds the fitted centroids
    as SQL literals (:func:`_fitted_semantic_dedup_oracle_sql`, the
    ``embedding_ivf_tuned_topk`` pattern), making this a FULL value
    row despite the fit. Assignment map-only; one shuffle on cell;
    per-cell BLAS election."""
    from tmdb_index_spark.operators.similarity import semantic_dedup

    return semantic_dedup(_t(spark, sf_dir, "embeddings"), threshold=0.4)


def _fitted_semantic_dedup_oracle_sql(
    sf_dir: str = "/root/testdata/sf0.01",
) -> str | None:
    """Value-row oracle for ``semantic_dedup_flags``: reproduce the
    deterministic centroid fit outside Spark (same parquet sample,
    same numpy core, same seed — the :func:`_fitted_ivf_oracle_sql`
    recipe), then express assignment (argmin with the (dist, cell)
    tie-break), within-cell pair scoring (ROUND(cos, 4) ≥ t), and the
    smaller-id drop election in plain SQL."""
    try:
        import duckdb
        import numpy as np

        from tmdb_index_spark.operators.similarity import fit_kmeans_array

        con = duckdb.connect()
        path = f"{sf_dir}/embeddings.parquet"
        n = con.sql(f"SELECT COUNT(*) FROM '{path}'").fetchone()[0]
        if not n:
            return None
        sample = con.sql(
            f"SELECT embedding FROM '{path}' ORDER BY vec_id LIMIT 10000"
        ).fetchall()
        X = np.array([list(r[0]) for r in sample], dtype="float64")
        cells = max(1, round(n ** 0.5))
        cents = fit_kmeans_array(X, cells)
    except Exception:  # noqa: BLE001 — missing table → rows-only row
        return None
    dim = X.shape[1]
    values = ",\n    ".join(
        "({}, [{}])".format(
            cid, ", ".join(repr(float(x)) for x in vec)
        )
        for cid, vec in cents
    )
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT * FROM (VALUES
    {values}
) AS t(cell, cv)),
d AS (
  SELECT vec_id, v, cell,
         list_sum(list_transform(generate_series(1, {dim}),
           i -> (v[i] - cv[i]) * (v[i] - cv[i]))) AS dist
  FROM v CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, v, CAST(cell AS BIGINT) AS cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist ASC, cell ASC) AS rn
    FROM d
  ) WHERE rn = 1
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE ROUND(list_sum(list_transform(generate_series(1, {dim}), i -> a.v[i] * b.v[i])) /
        (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
         sqrt(list_sum(list_transform(b.v, x -> x * x)))), 4) >= 0.4
)
SELECT vec_id, cell, (vec_id NOT IN (SELECT vec_id FROM dropped)) AS keep
FROM assigned
"""


def embedding_pca_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA dimensionality reduction over the embedding corpus
    (extension: the embedding-space diagnostic a training pipeline runs
    before clustering/dedup — do the labels separate along the top
    principal directions, and how much variance do those directions
    carry): fit mean + top-2 eigenvectors on the bounded deterministic
    sample (`operators/similarity.py: fit_pca` — the
    :func:`fit_centroids` scale story: driver-side numpy on a (d, d)
    covariance, NEVER N-proportional), embed the fit as plan literals,
    and project the FULL corpus map-only — one flat unrolled
    expression per component (`pca_projection_sql`, shared verbatim
    with the oracle so both engines run the same left-associative
    float64 chain), projections quantized to integer micros before the
    per-label sum so the aggregate is exact integer arithmetic. Output:
    per-label PC means + the fit's explained-variance ratios. Full
    value oracle despite the iterative-looking fit — the
    fitted-literal dynamic-oracle pattern (same numpy core re-run on
    the same parquet sample, components embedded as literals)."""
    from tmdb_index_spark.operators.similarity import (
        fit_pca,
        pca_projection_sql,
    )

    emb = _t(spark, sf_dir, "embeddings")
    mu, comps, evr = fit_pca(emb, 2)
    p1 = pca_projection_sql(mu, comps[0], "embedding")
    p2 = pca_projection_sql(mu, comps[1], "embedding")
    proj = emb.selectExpr(
        "label",
        f"CAST(ROUND(({p1}) * 1e6) AS BIGINT) AS __p1__",
        f"CAST(ROUND(({p2}) * 1e6) AS BIGINT) AS __p2__",
    )
    n = F.count(F.lit(1))
    return proj.groupBy("label").agg(
        n.cast("long").alias("n_vecs"),
        F.round(
            F.sum("__p1__").cast("double") / n.cast("double") / F.lit(1e6), 6
        ).alias("mean_pc1"),
        F.round(
            F.sum("__p2__").cast("double") / n.cast("double") / F.lit(1e6), 6
        ).alias("mean_pc2"),
        F.lit(round(evr[0], 6)).alias("evr_pc1"),
        F.lit(round(evr[1], 6)).alias("evr_pc2"),
    )


def _fitted_pca_oracle_sql(
    sf_dir: str = "/root/testdata/sf0.01",
) -> str | None:
    """Value-row oracle for ``embedding_pca_labels``: re-run the
    deterministic PCA fit OUTSIDE Spark (duckdb read of the same
    first-``max_sample``-by-id parquet sample + the shared
    :func:`fit_pca_array` numpy core), then emit the projection as the
    SAME unrolled expression string (``pca_projection_sql``,
    ``one_based=True`` for DuckDB's list indexing) with the fitted
    mean/components as literals. Returns None when the table is
    unreadable (rows-only fallback)."""
    try:
        import duckdb
        import numpy as np

        from tmdb_index_spark.operators.similarity import (
            fit_pca_array,
            pca_projection_sql,
        )

        con = duckdb.connect()
        path = f"{sf_dir}/embeddings.parquet"
        sample = con.sql(
            f"SELECT embedding FROM '{path}' ORDER BY vec_id LIMIT 10000"
        ).fetchall()
        if not sample:
            return None
        X = np.array([list(r[0]) for r in sample], dtype="float64")
        mu, comps, evr = fit_pca_array(X, 2)
    except Exception:  # noqa: BLE001 — missing table → rows-only row
        return None
    p1 = pca_projection_sql(mu.tolist(), comps[0].tolist(), "embedding", True)
    p2 = pca_projection_sql(mu.tolist(), comps[1].tolist(), "embedding", True)
    return f"""
WITH proj AS (
  SELECT label,
         CAST(ROUND(({p1}) * 1e6) AS BIGINT) AS p1,
         CAST(ROUND(({p2}) * 1e6) AS BIGINT) AS p2
  FROM embeddings
)
SELECT label,
       COUNT(*)::BIGINT AS n_vecs,
       ROUND(CAST(SUM(p1) AS DOUBLE) / COUNT(*) / 1e6, 6) AS mean_pc1,
       ROUND(CAST(SUM(p2) AS DOUBLE) / COUNT(*) / 1e6, 6) AS mean_pc2,
       CAST({round(evr[0], 6)!r} AS DOUBLE) AS evr_pc1,
       CAST({round(evr[1], 6)!r} AS DOUBLE) AS evr_pc2
FROM proj GROUP BY label
"""


def embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-3 (extension: similarity-search scale path — the
    FAISS ``IVFPQ`` shape, Jégou et al. 2011): IVF cells with the
    flat-IVF ``cells = round(√N)`` rule bound the candidate sets, each
    candidate is an 8-subspace × 16-code product-quantization code
    word (~32× smaller than the raw float32 vector), and scoring is
    ADC — the query side stays exact, the candidate side is read from
    codes alone via one (m × ks) lookup table per query
    (:func:`~tmdb_index_spark.operators.similarity.ivfpq_index_topk`).
    IVF centroids AND per-subspace codebooks are fit by the SAME
    deterministic numpy k-means core on one bounded sample, so the
    ORACLE re-runs both fits from the same parquet sample and embeds
    them as SQL literals (:func:`_fitted_pq_oracle_sql`) — a FULL
    value row despite the iterative fits, the fitted-literal pattern.
    ULP caveat as for the IVF oracles: Spark scores via BLAS lookup
    tables, the SQL via sequential folds — adc_sim compares after
    ROUND(..., 4)."""
    from tmdb_index_spark.operators.similarity import ivfpq_index_topk

    return ivfpq_index_topk(_t(spark, sf_dir, "embeddings"), k=3)


def _fitted_pq_oracle_sql(
    sf_dir: str = "/root/testdata/sf0.01",
) -> str | None:
    """Value-row oracle for ``embedding_pq_topk``: reproduce BOTH
    deterministic fits OUTSIDE Spark (duckdb read of the same
    first-10000-by-id parquet sample; :func:`fit_kmeans_array` for the
    IVF centroids, :func:`fit_pq_array` for the per-subspace
    codebooks — identical seeds), embed centroid + codebook tables as
    literals, and express cell assignment, PQ encoding (per-subspace
    argmin with the (dist, code) tie-break) and ADC scoring in plain
    SQL. Returns None when the table is unreadable (rows-only
    fallback)."""
    m, ks, k = 8, 16, 3
    try:
        import duckdb
        import numpy as np

        from tmdb_index_spark.operators.similarity import (
            fit_kmeans_array,
            fit_pq_array,
        )

        con = duckdb.connect()
        path = f"{sf_dir}/embeddings.parquet"
        n = con.sql(f"SELECT COUNT(*) FROM '{path}'").fetchone()[0]
        if not n:
            return None
        sample = con.sql(
            f"SELECT embedding FROM '{path}' ORDER BY vec_id LIMIT 10000"
        ).fetchall()
        X = np.array([list(r[0]) for r in sample], dtype="float64")
        cells = max(1, round(n ** 0.5))
        cents = fit_kmeans_array(X, cells)
        books = fit_pq_array(X, m=m, ks=ks)
    except Exception:  # noqa: BLE001 — missing table → rows-only row
        return None
    dim = X.shape[1]
    sub = dim // m
    cent_values = ",\n    ".join(
        "({}, [{}])".format(cid, ", ".join(repr(float(x)) for x in vec))
        for cid, vec in cents
    )
    cb_values = ",\n    ".join(
        "({}, {}, [{}])".format(
            j, code, ", ".join(repr(float(x)) for x in vec)
        )
        for j, book in enumerate(books)
        for code, vec in book
    )
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT * FROM (VALUES
    {cent_values}
) AS t(cell, cv)),
d AS (
  SELECT vec_id, v, cell,
         list_sum(list_transform(generate_series(1, {dim}),
           i -> (v[i] - cv[i]) * (v[i] - cv[i]))) AS dist
  FROM v CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist ASC, cell ASC) AS rn
    FROM d
  ) WHERE rn = 1
),
cb AS (SELECT * FROM (VALUES
    {cb_values}
) AS t(sub, code, cbv)),
cdist AS (
  SELECT a.vec_id, cb.sub, cb.code,
         list_sum(list_transform(generate_series(1, {sub}),
           i -> (a.v[cb.sub * {sub} + i] - cb.cbv[i])
              * (a.v[cb.sub * {sub} + i] - cb.cbv[i]))) AS dist
  FROM assigned a CROSS JOIN cb
),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                 ORDER BY dist ASC, code ASC) AS rn
    FROM cdist
  ) WHERE rn = 1
),
cbn AS (SELECT sub, code,
               list_sum(list_transform(cbv, x -> x * x)) AS n2 FROM cb),
cnorm AS (
  SELECT c.vec_id, SQRT(SUM(n.n2)) AS cnorm
  FROM codes c JOIN cbn n ON n.sub = c.sub AND n.code = c.code
  GROUP BY 1
),
qn AS (SELECT vec_id,
              SQRT(list_sum(list_transform(v, x -> x * x))) AS qnorm
       FROM assigned),
dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         SUM(list_sum(list_transform(generate_series(1, {sub}),
           i -> q.v[cd.sub * {sub} + i] * cb.cbv[i]))) AS adot
  FROM assigned q
  JOIN assigned c ON q.cell = c.cell AND q.vec_id <> c.vec_id
  JOIN codes cd ON cd.vec_id = c.vec_id
  JOIN cb ON cb.sub = cd.sub AND cb.code = cd.code
  GROUP BY 1, 2
),
scored AS (
  SELECT d.query_id, d.neighbor_id,
         ROUND(d.adot / (q.qnorm * n.cnorm), 4) AS adc_sim
  FROM dots d
  JOIN qn q ON q.vec_id = d.query_id
  JOIN cnorm n ON n.vec_id = d.neighbor_id
)
SELECT query_id, neighbor_id, adc_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY adc_sim DESC, neighbor_id ASC)::BIGINT AS rank
  FROM scored
) WHERE rank <= {k}
"""


def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index-quality evaluation (extension: similarity-search eval
    harness — the recall@k sweep every production ANN deployment runs
    before trusting an index): mean recall@3 of the two self-tuned
    indexes (`lsh_tuned` = :func:`lsh_index_topk`, `ivf_tuned` =
    :func:`ivf_index_topk`) against EXACT cosine ground truth on a
    deterministic BOUNDED query sample (``vec_id % 50 = 0 AND vec_id <
    100000`` — the standard bounded-eval shape: the id cap holds the
    eval set at ≤2000 queries however large the corpus, so exact work
    is |sample|·N with the sample broadcast, LINEAR in N; a pure
    1-in-50 fraction would make it N²/50). A query with no approx
    rows still counts in the
    denominator; recall@3 = hits / (3 · n_queries). Both index results
    and the ground truth use the family contract (ROUND(cos, 4) before
    ranking, ties on lower neighbor id), so the compared sets — and
    hence the recall — are integer-exact across engines. The oracle
    re-runs the IVF centroid fit from the same parquet sample
    (fitted-literal pattern, :func:`_ann_recall_oracle_sql`) and the
    LSH bit rule as a function of COUNT(*)."""
    from tmdb_index_spark.operators.similarity import (
        ivf_index_topk,
        lsh_index_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    in_sample = (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 100_000)
    sampled = emb.filter(in_sample)
    exact = brute_force_topk(emb, sampled, k=3).select(
        "query_id", "neighbor_id"
    )
    nq = sampled.agg(F.count(F.lit(1)).alias("n_queries"))

    def _hits(name: str, approx: DataFrame) -> DataFrame:
        return (
            approx.filter(
                (F.col("query_id") % 50 == 0)
                & (F.col("query_id") < 100_000)
            )
            .join(F.broadcast(exact), ["query_id", "neighbor_id"], "leftsemi")
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .select(F.lit(name).alias("index_name"), "n_hits")
        )

    per_index = _hits("ivf_tuned", ivf_index_topk(emb, k=3)).unionByName(
        _hits("lsh_tuned", lsh_index_topk(emb, k=3))
    )
    return per_index.join(F.broadcast(nq)).select(
        "index_name",
        F.col("n_queries").cast("long").alias("n_queries"),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.round(
            F.col("n_hits") / (F.lit(3.0) * F.col("n_queries")), 6
        ).alias("recall_at_3"),
    )


def _ann_recall_oracle_sql(
    sf_dir: str = "/root/testdata/sf0.01",
) -> str | None:
    """Value-row oracle for ``ann_recall_eval``: exact top-3 over the
    sampled queries, the LSH bit-rule buckets (static — a function of
    COUNT(*)), and the IVF assignment over RE-FITTED centroid literals
    (same numpy core, same parquet sample as
    :func:`_fitted_ivf_oracle_sql`); recall joins each index's top-3
    to the exact set. Restricting the query side to the sample before
    ranking equals Spark's filter-after-ranking — per-query results
    are independent. Returns None when the table is unreadable."""
    try:
        import duckdb
        import numpy as np

        from tmdb_index_spark.operators.similarity import fit_kmeans_array

        con = duckdb.connect()
        path = f"{sf_dir}/embeddings.parquet"
        n = con.sql(f"SELECT COUNT(*) FROM '{path}'").fetchone()[0]
        if not n:
            return None
        sample = con.sql(
            f"SELECT embedding FROM '{path}' ORDER BY vec_id LIMIT 10000"
        ).fetchall()
        X = np.array([list(r[0]) for r in sample], dtype="float64")
        cells = max(1, round(n ** 0.5))
        cents = fit_kmeans_array(X, cells)
    except Exception:  # noqa: BLE001 — missing table → rows-only row
        return None
    dim = X.shape[1]
    cent_values = ",\n    ".join(
        "({}, [{}])".format(cid, ", ".join(repr(float(x)) for x in vec))
        for cid, vec in cents
    )
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
qs AS (SELECT * FROM v WHERE vec_id % 50 = 0 AND vec_id < 100000),
nq AS (SELECT COUNT(*) AS n_queries FROM qs),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_COS_SQL} DESC, c.vec_id ASC) AS rn
    FROM qs q CROSS JOIN v c WHERE q.vec_id <> c.vec_id
  ) WHERE rn <= 3
),
p AS (
  SELECT LEAST(GREATEST(1, CAST(CEIL(LOG2(GREATEST(COUNT(*), 2) / 32.0)) AS BIGINT)), {dim}) AS nb
  FROM embeddings
),
lshv AS (
  SELECT vec_id, v,
         list_sum(list_transform(generate_series(0, (SELECT nb FROM p) - 1),
           i -> CASE WHEN v[i+1] >= 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS bucket
  FROM v
),
lsh AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_COS_SQL} DESC, c.vec_id ASC) AS rn
    FROM (SELECT * FROM lshv WHERE vec_id % 50 = 0 AND vec_id < 100000) q
    JOIN lshv c ON q.bucket = c.bucket
    WHERE q.vec_id <> c.vec_id
  ) WHERE rn <= 3
),
cent AS (SELECT * FROM (VALUES
    {cent_values}
) AS t(cell, cv)),
d AS (
  SELECT vec_id, v, cell,
         list_sum(list_transform(generate_series(1, {dim}),
           i -> (v[i] - cv[i]) * (v[i] - cv[i]))) AS dist
  FROM v CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist ASC, cell ASC) AS rn
    FROM d
  ) WHERE rn = 1
),
ivf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_COS_SQL} DESC, c.vec_id ASC) AS rn
    FROM (SELECT * FROM assigned WHERE vec_id % 50 = 0 AND vec_id < 100000) q
    JOIN assigned c ON q.cell = c.cell
    WHERE q.vec_id <> c.vec_id
  ) WHERE rn <= 3
),
ivf_hits AS (SELECT COUNT(*) AS n_hits
             FROM ivf JOIN exact USING (query_id, neighbor_id)),
lsh_hits AS (SELECT COUNT(*) AS n_hits
             FROM lsh JOIN exact USING (query_id, neighbor_id))
SELECT 'ivf_tuned' AS index_name,
       nq.n_queries::BIGINT AS n_queries,
       ivf_hits.n_hits::BIGINT AS n_hits,
       ROUND(ivf_hits.n_hits / (3.0 * nq.n_queries), 6) AS recall_at_3
FROM ivf_hits, nq
UNION ALL
SELECT 'lsh_tuned', nq.n_queries::BIGINT, lsh_hits.n_hits::BIGINT,
       ROUND(lsh_hits.n_hits / (3.0 * nq.n_queries), 6)
FROM lsh_hits, nq
"""


_STATIONARY_ITERS = 16


def _stationary_sql(table: str, spark_dialect: bool) -> str:
    """One generated SQL text for the event-type stationary
    distribution, shared by both engines (only the integer-division
    operator differs: Spark ``DIV``, DuckDB ``//``): the Markov chain
    over consecutive-event transitions, its transition matrix
    quantized to exact integer ppm, then ``_STATIONARY_ITERS`` power
    steps of v·P as chained CTEs — every step is pure BIGINT
    multiply/sum/divide, so the fixed point is bit-identical across
    engines with NO float-sum caveat (the `trade_graph_pagerank`
    exact-integer convention, taken to a deeper unroll over the
    types×types-bounded frame)."""
    dv = "DIV" if spark_dialect else "//"
    steps = []
    prev = "v0"
    for i in range(1, _STATIONARY_ITERS + 1):
        steps.append(f"""
v{i} AS (
  SELECT p.b AS t, CAST(SUM({prev}.v * p.ppm) {dv} 1000000 AS BIGINT) AS v
  FROM {prev} JOIN p ON p.a = {prev}.t GROUP BY p.b
)""")
        prev = f"v{i}"
    return f"""
WITH pairs AS (
  SELECT event_type AS a,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS b
  FROM {table}
),
cnt AS (
  SELECT a, b, COUNT(*)::BIGINT AS c
  FROM pairs WHERE b IS NOT NULL GROUP BY a, b
),
rowsum AS (SELECT a, SUM(c) AS tot FROM cnt GROUP BY a),
p AS (
  SELECT cnt.a, cnt.b, CAST((c * 1000000) {dv} tot AS BIGINT) AS ppm
  FROM cnt JOIN rowsum ON cnt.a = rowsum.a
),
types AS (SELECT DISTINCT event_type AS t FROM {table}),
v0 AS (
  SELECT t, CAST(1000000000 {dv} (SELECT COUNT(*) FROM types) AS BIGINT)
           AS v
  FROM types
),
{",".join(steps)}
SELECT t AS event_type,
       CAST(v AS BIGINT) AS prob_nanos,
       ROUND(CAST(v AS DOUBLE) / 1e9, 6) AS stationary_prob
FROM {prev}
"""


def event_stationary_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the event-type Markov chain
    (extension: the fixed-point summary of `event_transition_probs` —
    where user behavior settles if the observed transition dynamics
    run forever, the classic power-iteration statistic behind
    behavioral steady-state dashboards): 16 unrolled v·P power steps
    over the types×types-bounded transition matrix, EVERY step exact
    integer arithmetic (probabilities as nanos, the matrix as ppm —
    the `trade_graph_pagerank` convention), so the result is
    bit-identical across engines with no float caveat at all. Row
    quantization truncates, so total mass decays ≤ |types| ppm per
    step (documented, deterministic); dangling types (no outgoing
    transitions) correctly bleed to zero. One generated flat SQL text
    serves BOTH engines (:func:`_stationary_sql`): one analyzer pass,
    16 tiny keyed aggregates over a bounded frame after the single
    events-sized window."""
    import uuid

    ev = _events(spark, sf_dir)
    view = f"__stationary_ev_{uuid.uuid4().hex[:12]}"
    ev.createOrReplaceTempView(view)
    return spark.sql(_stationary_sql(view, spark_dialect=True))


_STATIONARY_SQL = _stationary_sql("events", spark_dialect=False)


def code_switch_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switching (mixed-language) detection per source
    (extension: the cleaning signal language-ID alone misses — a doc
    whose tokens hit TWO languages' marker lexicons hard is mixed
    content that degrades monolingual training; flag docs where ≥2
    languages score ≥2 marker hits each, report the per-source mixed
    share): per-language hit counts are the `lang_id_predict` marker
    sets evaluated as pure column expressions (map-only), the flag is
    exact integer logic, and the per-source rollup is one combinable
    groupBy — parity is trivial by construction."""
    from tmdb_index_spark.functions.text import LANG_MARKERS, tokens

    docs = _t(spark, sf_dir, "documents")
    t = tokens(F.coalesce(F.col("text"), F.lit("")))
    def _hits(markers: tuple[str, ...]) -> F.Column:
        arr = F.array(*[F.lit(m) for m in markers])
        # NB: a two-parameter lambda would be read as (element, index)
        return F.size(
            F.filter(t, lambda w: F.array_contains(arr, F.lower(w)))
        )

    hit_langs = None
    for markers in LANG_MARKERS.values():
        flag = F.when(_hits(markers) >= 2, 1).otherwise(0)
        hit_langs = flag if hit_langs is None else hit_langs + flag
    mixed = F.when(hit_langs >= 2, 1).otherwise(0)
    return (
        docs.select("source", mixed.alias("__m__"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__m__").cast("bigint").alias("n_mixed"),
            F.round(
                F.sum("__m__").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mixed_rate"),
        )
    )


def _code_switch_sql() -> str:
    from tmdb_index_spark.functions.text import LANG_MARKERS

    flags = " + ".join(
        "(CASE WHEN len(list_filter(ts, w -> list_contains([{m}], "
        "lower(w)))) >= 2 THEN 1 ELSE 0 END)".format(
            m=", ".join(f"'{w}'" for w in markers)
        )
        for markers in LANG_MARKERS.values()
    )
    return f"""
WITH t AS (
  SELECT source,
         regexp_split_to_array(trim(coalesce(text, '')), '\\s+') AS ts
  FROM documents
),
flagged AS (
  SELECT source,
         CASE WHEN ({flags}) >= 2 THEN 1 ELSE 0 END AS m
  FROM t
)
SELECT source, COUNT(*)::BIGINT AS n_docs,
       SUM(m)::BIGINT AS n_mixed,
       ROUND(SUM(m) / CAST(COUNT(*) AS DOUBLE), 6) AS mixed_rate
FROM flagged GROUP BY 1
"""


_CODE_SWITCH_SQL = _code_switch_sql()


_BACKTEST_FOLDS = (
    ("1998-01-01", "1999-01-01"),
    ("1999-01-01", "2000-01-01"),
    ("2000-01-01", "2001-01-01"),
)


def rolling_backtest_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin (expanding-window) backtest of the per-DOW daily
    revenue model (extension: time-series cross-validation — the
    honest way to evaluate a forecaster, train strictly before each
    test year; Tashman 2000 review): three folds, each training the
    day-of-week mean on ALL days before the fold's start and scoring
    MAE / bias on the fold's year. ONE daily rollup feeds every fold
    (the expanding windows are filters over the same bounded daily
    frame — no re-scan per fold); day-of-week is the portable
    ``datediff % 7``; daily revenue exact DECIMAL; per-fold error sums
    quantize to integer micros before aggregation (no float-sum-order
    drift), divisions at the end. Output per fold: train/test day
    counts, MAE, mean bias (signed)."""
    li = _t(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy(F.date_trunc("day", F.col("l_shipdate")).alias("__day__"))
        .agg(F.sum(_dec("l_extendedprice")).alias("__rev__"))
        .select(
            "__day__",
            F.col("__rev__").cast("double").alias("__y__"),
            F.col("__rev__").alias("__ydec__"),
            (
                F.datediff(
                    F.col("__day__"), F.lit("1995-01-02").cast("date")
                )
                % 7
            ).alias("__dow__"),
        )
    )
    from tmdb_index_spark.operators.materialize import pin_frame

    daily = pin_frame(daily)  # every fold filters the same rollup
    folds = []
    for i, (start, end) in enumerate(_BACKTEST_FOLDS, 1):
        train = daily.filter(
            F.col("__day__") < F.lit(start).cast("timestamp")
        )
        test = daily.filter(
            (F.col("__day__") >= F.lit(start).cast("timestamp"))
            & (F.col("__day__") < F.lit(end).cast("timestamp"))
        )
        # model mean = exact DECIMAL sum, ONE double division — a
        # double SUM here would be addition-order-dependent across
        # engines/partitionings and could flip the micro-quantized
        # errors by one unit (round-9 ADVICE)
        model = train.groupBy("__dow__").agg(
            (
                F.sum("__ydec__").cast("double") / F.count(F.lit(1))
            ).alias("__pred__")
        )
        n_train = train.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_train_days")
        )
        err = F.col("__y__") - F.col("__pred__")
        scored = test.join(F.broadcast(model), "__dow__").select(
            F.round(F.abs(err) * F.lit(1e6)).cast("bigint").alias("__ae__"),
            F.round(err * F.lit(1e6)).cast("bigint").alias("__e__"),
        )
        agg = scored.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test_days"),
            F.sum("__ae__").cast("bigint").alias("__sae__"),
            F.sum("__e__").cast("bigint").alias("__se__"),
        )
        folds.append(
            agg.join(F.broadcast(n_train)).select(
                F.lit(i).cast("bigint").alias("fold"),
                F.lit(start).alias("test_start"),
                "n_train_days",
                "n_test_days",
                F.round(
                    F.col("__sae__").cast("double")
                    / F.expr("CAST(NULLIF(n_test_days, 0) AS DOUBLE)")
                    / F.lit(1e6),
                    2,
                ).alias("mae"),
                F.round(
                    F.col("__se__").cast("double")
                    / F.expr("CAST(NULLIF(n_test_days, 0) AS DOUBLE)")
                    / F.lit(1e6),
                    2,
                ).alias("mean_bias"),
            )
        )
    out = folds[0]
    for f in folds[1:]:
        out = out.unionByName(f)
    return out


def _backtest_fold_sql(i: int, start: str, end: str) -> str:
    return f"""
SELECT CAST({i} AS BIGINT) AS fold,
       '{start}' AS test_start,
       (SELECT COUNT(*)::BIGINT FROM daily
        WHERE day < TIMESTAMP '{start}') AS n_train_days,
       COUNT(*)::BIGINT AS n_test_days,
       ROUND(CAST(SUM(CAST(ROUND(ABS(t.y - m.pred) * 1e6) AS BIGINT))
                  AS DOUBLE)
             / NULLIF(COUNT(*), 0) / 1e6, 2) AS mae,
       ROUND(CAST(SUM(CAST(ROUND((t.y - m.pred) * 1e6) AS BIGINT))
                  AS DOUBLE)
             / NULLIF(COUNT(*), 0) / 1e6, 2) AS mean_bias
FROM (SELECT * FROM daily
      WHERE day >= TIMESTAMP '{start}' AND day < TIMESTAMP '{end}') t
JOIN (SELECT dow, CAST(SUM(ydec) AS DOUBLE) / COUNT(*) AS pred FROM daily
      WHERE day < TIMESTAMP '{start}' GROUP BY 1) m
  ON t.dow = m.dow
"""


_BACKTEST_SQL = (
    """
WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS day,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS y,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS ydec,
         date_diff('day', DATE '1995-01-02', date_trunc('day', l_shipdate))
           % 7 AS dow
  FROM lineitem GROUP BY 1
)
"""
    + " UNION ALL ".join(
        _backtest_fold_sql(i, s, e)
        for i, (s, e) in enumerate(_BACKTEST_FOLDS, 1)
    )
)


def source_quality_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-source mean quality
    (extension: the random-effects estimator a mixture owner uses to
    rank SMALL sources reliably — a 20-doc source's raw mean is noise;
    DerSimonian & Laird 1986 shrinks it toward the corpus mean with a
    weight from the between/within variance decomposition): per-source
    moments from FLOOR-quantized integer-micro quality scores (the
    adaptive-filter recipe), pooled within-variance σ̂² = SSW/(N−k),
    between-heterogeneity τ̂² = max(0, (Q − (k−1)σ̂²)/(N − Σn²/N)),
    shrink weight Bₛ = τ̂²/(τ̂² + σ̂²/nₛ), shrunk mean = grand +
    Bₛ·(raw − grand). The two variance-component sums (SSW's
    per-source terms, Q's per-source terms) quantize to integer nanos
    BEFORE their k-row aggregation (the PCA convention — no
    cross-engine float-sum-order drift); degenerate all-identical
    corpora give τ̂²+σ̂²/n = 0 → NULL weight → shrunk = grand via the
    COALESCE convention."""
    from tmdb_index_spark.functions.text import LANG_MARKERS, tokens

    docs = _t(spark, sf_dir, "documents")
    c = F.coalesce(F.col("text"), F.lit(""))
    t = tokens(c)
    stop = F.array([F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(t, lambda w: F.array_contains(stop, F.lower(w))))
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    score_q = (
        F.floor(
            F.lit(1e6) * n_stop.cast("double")
            / F.greatest(F.size(t), F.lit(1)).cast("double")
        )
        - F.floor(
            F.lit(1e6) * n_punct.cast("double")
            / F.greatest(F.length(c), F.lit(1)).cast("double")
        )
    ).cast("long")
    per = (
        docs.select("source", score_q.alias("__q__"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__n__"),
            F.sum("__q__").cast("bigint").alias("__s__"),
            F.sum(
                F.col("__q__").cast("decimal(19,0)")
                * F.col("__q__").cast("decimal(19,0)")
            ).cast("decimal(38,0)").alias("__ss__"),
        )
    )
    mean_s = F.col("__s__").cast("double") / F.col("__n__").cast("double")
    # per-source variance-component terms, quantized to integer nanos
    # (micros² scale) before the k-row aggregation
    ssw_term = F.col("__ss__").cast("double") - (
        F.col("__s__").cast("double") * F.col("__s__").cast("double")
        / F.col("__n__").cast("double")
    )
    terms = per.select(
        "source",
        "__n__",
        "__s__",
        F.round(ssw_term * F.lit(1e-3)).cast("bigint").alias("__ssw_m__"),
        mean_s.alias("__mean__"),
    )
    tot = terms.agg(
        F.sum("__n__").cast("bigint").alias("__nall__"),
        F.sum("__s__").cast("bigint").alias("__sall__"),
        F.count(F.lit(1)).cast("bigint").alias("__k__"),
        F.sum("__ssw_m__").cast("bigint").alias("__ssw__"),
        F.sum(F.col("__n__") * F.col("__n__")).cast("bigint").alias(
            "__n2__"
        ),
    )
    grand = F.col("__sall__").cast("double") / F.col("__nall__").cast("double")
    joined = terms.join(F.broadcast(tot)).withColumn(
        "__q_term__",
        F.round(
            F.col("__n__").cast("double")
            * (F.col("__mean__") - grand)
            * (F.col("__mean__") - grand)
            * F.lit(1e-3)
        ).cast("bigint"),
    )
    qsum = joined.agg(F.sum("__q_term__").cast("bigint").alias("__qsum__"))
    out = joined.join(F.broadcast(qsum))
    sigma2 = (
        F.col("__ssw__").cast("double")
        * F.lit(1e3)
        / F.expr("CAST(NULLIF(__nall__ - __k__, 0) AS DOUBLE)")
    )
    tau2 = F.greatest(
        F.lit(0.0),
        (F.col("__qsum__").cast("double") * F.lit(1e3)
         - (F.col("__k__") - 1).cast("double") * sigma2)
        / F.expr(
            "CAST(NULLIF(CAST(__nall__ AS DOUBLE)"
            " - CAST(__n2__ AS DOUBLE) / CAST(__nall__ AS DOUBLE), 0.0)"
            " AS DOUBLE)"
        ),
    )
    b = tau2 / F.expr(
        "NULLIF({t} + {s} / CAST(__n__ AS DOUBLE), 0.0)".format(
            t="GREATEST(CAST(0.0 AS DOUBLE), (CAST(__qsum__ AS DOUBLE) * 1e3"
              " - (CAST(__k__ AS DOUBLE) - 1.0) * (CAST(__ssw__ AS DOUBLE)"
              " * 1e3 / NULLIF(CAST(__nall__ - __k__ AS DOUBLE), 0.0)))"
              " / NULLIF(CAST(__nall__ AS DOUBLE) - CAST(__n2__ AS DOUBLE)"
              " / CAST(__nall__ AS DOUBLE), 0.0))",
            s="(CAST(__ssw__ AS DOUBLE) * 1e3"
              " / NULLIF(CAST(__nall__ - __k__ AS DOUBLE), 0.0))",
        )
    )
    shrunk = grand + F.coalesce(b, F.lit(0.0)) * (F.col("__mean__") - grand)
    return out.select(
        "source",
        F.col("__n__").alias("n_docs"),
        F.round(F.col("__mean__") / F.lit(1e6), 6).alias("raw_mean"),
        F.round(b, 6).alias("shrink_weight"),
        F.round(shrunk / F.lit(1e6), 6).alias("shrunk_mean"),
    )


# One source of truth for the English-marker literal both ablation
# oracles embed (round-9 ADVICE: the hardcoded copies would silently
# desync from LANG_MARKERS on a lexicon edit — _code_switch_sql already
# derives its marker lists this way).
_EN_MARKERS_SQL = (
    "[" + ",".join(f"'{m}'" for m in LANG_MARKERS["en"]) + "]"
)

_SHRINKAGE_SQL = """
WITH t AS (
  SELECT source, coalesce(text, '') AS text,
         regexp_split_to_array(trim(coalesce(text, '')), '\\s+') AS ts
  FROM documents
),
scored AS (
  SELECT source,
         CAST(FLOOR(1e6 * len(list_filter(ts, w -> list_contains(
                  __EN_MARKERS__, lower(w)))) * 1.0
                / greatest(len(ts), 1))
            - FLOOR(1e6 * (length(text)
                - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0
                / greatest(length(text), 1)) AS BIGINT) AS q
  FROM t
),
per AS (
  SELECT source, COUNT(*)::BIGINT AS n, SUM(q)::BIGINT AS s,
         CAST(SUM(CAST(q AS DECIMAL(19,0)) * CAST(q AS DECIMAL(19,0)))
              AS DECIMAL(38,0)) AS ss
  FROM scored GROUP BY 1
),
terms AS (
  SELECT source, n, s,
         CAST(ROUND((CAST(ss AS DOUBLE)
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
              * 1e-3) AS BIGINT) AS ssw_m,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_s
  FROM per
),
tot AS (
  SELECT SUM(n)::BIGINT AS nall, SUM(s)::BIGINT AS sall,
         COUNT(*)::BIGINT AS k, SUM(ssw_m)::BIGINT AS ssw,
         SUM(n * n)::BIGINT AS n2
  FROM terms
),
qterms AS (
  SELECT source, n, mean_s, nall, sall, k, ssw, n2,
         CAST(ROUND(CAST(n AS DOUBLE)
              * (mean_s - CAST(sall AS DOUBLE) / CAST(nall AS DOUBLE))
              * (mean_s - CAST(sall AS DOUBLE) / CAST(nall AS DOUBLE))
              * 1e-3) AS BIGINT) AS q_term
  FROM terms CROSS JOIN tot
),
qsum AS (SELECT SUM(q_term)::BIGINT AS qsum FROM qterms)
SELECT source,
       n AS n_docs,
       ROUND(mean_s / 1e6, 6) AS raw_mean,
       ROUND(
         GREATEST(0.0, (CAST(qsum AS DOUBLE) * 1e3
             - (CAST(k AS DOUBLE) - 1.0) * (CAST(ssw AS DOUBLE) * 1e3
               / NULLIF(CAST(nall - k AS DOUBLE), 0.0)))
           / NULLIF(CAST(nall AS DOUBLE)
               - CAST(n2 AS DOUBLE) / CAST(nall AS DOUBLE), 0.0))
         / NULLIF(
             GREATEST(0.0, (CAST(qsum AS DOUBLE) * 1e3
                 - (CAST(k AS DOUBLE) - 1.0) * (CAST(ssw AS DOUBLE) * 1e3
                   / NULLIF(CAST(nall - k AS DOUBLE), 0.0)))
               / NULLIF(CAST(nall AS DOUBLE)
                   - CAST(n2 AS DOUBLE) / CAST(nall AS DOUBLE), 0.0))
             + (CAST(ssw AS DOUBLE) * 1e3
                / NULLIF(CAST(nall - k AS DOUBLE), 0.0))
               / CAST(n AS DOUBLE), 0.0), 6) AS shrink_weight,
       ROUND((CAST(sall AS DOUBLE) / CAST(nall AS DOUBLE)
         + COALESCE(
             GREATEST(0.0, (CAST(qsum AS DOUBLE) * 1e3
                 - (CAST(k AS DOUBLE) - 1.0) * (CAST(ssw AS DOUBLE) * 1e3
                   / NULLIF(CAST(nall - k AS DOUBLE), 0.0)))
               / NULLIF(CAST(nall AS DOUBLE)
                   - CAST(n2 AS DOUBLE) / CAST(nall AS DOUBLE), 0.0))
             / NULLIF(
                 GREATEST(0.0, (CAST(qsum AS DOUBLE) * 1e3
                     - (CAST(k AS DOUBLE) - 1.0) * (CAST(ssw AS DOUBLE) * 1e3
                       / NULLIF(CAST(nall - k AS DOUBLE), 0.0)))
                   / NULLIF(CAST(nall AS DOUBLE)
                       - CAST(n2 AS DOUBLE) / CAST(nall AS DOUBLE), 0.0))
                 + (CAST(ssw AS DOUBLE) * 1e3
                    / NULLIF(CAST(nall - k AS DOUBLE), 0.0))
                   / CAST(n AS DOUBLE), 0.0), 0.0)
           * (mean_s - CAST(sall AS DOUBLE) / CAST(nall AS DOUBLE)))
         / 1e6, 6) AS shrunk_mean
FROM qterms CROSS JOIN qsum
""".replace("__EN_MARKERS__", _EN_MARKERS_SQL)


_ATTR_CHANNELS = ("click", "view", "signup", "error")
_ATTR_ITERS = 12


def _removal_effects_sql(table: str, spark_dialect: bool) -> str:
    """One generated SQL text for Markov removal-effect attribution
    (dialect differs only in the integer-division operator): journeys
    truncate at each user's FIRST purchase (total-ordered by (ts,
    event_id) row number), journey ends count as explicit
    ``__drop__`` transitions (omitting them over-predicts conversion —
    the estimated rows would renormalize away the null path), the
    transition matrix quantizes to exact integer ppm, 'purchase' gets
    a ppm self-loop of 1e6 so the absorbing-chain conversion mass
    accumulates through the SAME
    stationary-style v·P power step, and each channel's removal
    scenario filters that channel's rows/columns out of the matrix
    (mass entering a removed channel drops — the standard
    removal-effect convention). ``_ATTR_ITERS`` unrolled steps per
    scenario; every step is pure BIGINT arithmetic, so conversion
    masses are bit-identical across engines; the single double
    division happens in the final effect row."""
    dv = "DIV" if spark_dialect else "//"

    def steps(tag: str, p_cte: str, v0_cte: str) -> str:
        out = []
        prev = v0_cte
        for i in range(1, _ATTR_ITERS + 1):
            out.append(f"""
{tag}{i} AS (
  SELECT {p_cte}.b AS t,
         CAST(SUM({prev}.v * {p_cte}.ppm) {dv} 1000000 AS BIGINT) AS v
  FROM {prev} JOIN {p_cte} ON {p_cte}.a = {prev}.t GROUP BY {p_cte}.b
)""")
            prev = f"{tag}{i}"
        return ",".join(out)

    scen_ctes, conv_selects = [], []
    for c in _ATTR_CHANNELS:
        tag = f"v_{c}_"
        scen_ctes.append(f"""
p_{c} AS (SELECT a, b, ppm FROM p_aug WHERE a <> '{c}' AND b <> '{c}'),
v_{c}_0 AS (SELECT t, v FROM v0 WHERE t <> '{c}'),
{steps(tag, f"p_{c}", f"v_{c}_0")},
conv_{c} AS (
  SELECT COALESCE(MAX(v), 0) AS cv FROM {tag}{_ATTR_ITERS}
  WHERE t = 'purchase'
)""")
        conv_selects.append(f"""
SELECT '{c}' AS channel,
       ROUND(CAST(cf.cv AS DOUBLE) / 1e9, 6) AS p_convert_full,
       ROUND(CAST(conv_{c}.cv AS DOUBLE) / 1e9, 6) AS p_convert_without,
       ROUND(1.0 - CAST(conv_{c}.cv AS DOUBLE)
                   / CAST(NULLIF(cf.cv, 0) AS DOUBLE), 6)
         AS removal_effect
FROM conv_full cf, conv_{c}""")
    return f"""
WITH ordered AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM {table}
),
fpos AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'purchase' THEN rn END)
           AS fp
  FROM ordered GROUP BY user_id
),
kept AS (
  SELECT o.user_id, o.event_type, o.rn
  FROM ordered o JOIN fpos f ON o.user_id = f.user_id
  WHERE f.fp IS NULL OR o.rn <= f.fp
),
pairs AS (
  SELECT event_type AS a,
         COALESCE(LEAD(event_type) OVER (PARTITION BY user_id
                                         ORDER BY rn), '__drop__') AS b
  FROM kept
),
cnt AS (
  SELECT a, b, COUNT(*) AS c FROM pairs
  WHERE a <> 'purchase' GROUP BY a, b
),
rowsum AS (SELECT a, SUM(c) AS tot FROM cnt GROUP BY a),
p_aug AS (
  SELECT cnt.a, cnt.b, CAST((c * 1000000) {dv} tot AS BIGINT) AS ppm
  FROM cnt JOIN rowsum ON cnt.a = rowsum.a
  UNION ALL
  SELECT 'purchase', 'purchase', CAST(1000000 AS BIGINT)
),
nstart AS (SELECT COUNT(*) AS n FROM kept WHERE rn = 1),
v0 AS (
  SELECT event_type AS t,
         CAST((COUNT(*) * 1000000000) {dv} (SELECT n FROM nstart)
              AS BIGINT) AS v
  FROM kept WHERE rn = 1 GROUP BY event_type
),
{steps("v_full_", "p_aug", "v0")},
conv_full AS (
  SELECT COALESCE(MAX(v), 0) AS cv FROM v_full_{_ATTR_ITERS}
  WHERE t = 'purchase'
),
{",".join(scen_ctes)}
{" UNION ALL ".join(conv_selects)}
"""


def channel_removal_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution (extension: the data-driven
    multi-touch attribution model — Anderl et al. 2014 "Mapping the
    customer journey"; which event channel, if removed, costs the most
    conversion probability): absorbing-chain conversion mass from the
    first-event start distribution through the journey transition
    matrix (truncated at each user's first purchase, journey ends as
    explicit drop transitions), re-run with each channel's matrix
    rows/columns removed; removal effect = 1 − P(convert | channel
    removed) / P(convert).

    Execution shape: the corpus-sized work — the per-user (ts,
    event_id)-ordered windows and the (a, b) pair count — runs
    distributed (ONE user-keyed shuffle feeds both the truncation and
    the LEAD); the transition table that falls out is
    (|types|+1)²-bounded, so the 12-step × 5-scenario chain recursion
    runs driver-side over collected integers (``bounded_collect``, the
    MMR/robust-trend bounded-math convention — the all-in-SQL chain
    spelling spent 18.7 s of pure tiny-exchange overhead on ≤7-row
    frames). EVERY chain step is exact integer arithmetic (nanos ×
    ppm, Python int ≡ SQL BIGINT on these magnitudes), so the
    conversion masses are bit-identical to the ORACLE, which runs the
    full chain as generated SQL CTEs (:func:`_removal_effects_sql`);
    the final ROUNDs evaluate ENGINE-side over the literal masses so
    HALF_UP parity holds. Channels are the fixture's non-purchase
    event types; an absent channel yields effect 0."""
    from tmdb_index_spark.operators.materialize import bounded_collect

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("__rn__"),
    )
    fpos = (
        ordered.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("__rn__").alias("__fp__"))
    )
    kept = ordered.join(fpos, "user_id", "left").filter(
        F.col("__fp__").isNull() | (F.col("__rn__") <= F.col("__fp__"))
    )
    wk = Window.partitionBy("user_id").orderBy("__rn__")
    pairs = kept.select(
        F.col("event_type").alias("__a__"),
        F.coalesce(
            F.lead("event_type").over(wk), F.lit("__drop__")
        ).alias("__b__"),
    )
    cnt_rows = bounded_collect(
        pairs.filter(F.col("__a__") != "purchase")
        .groupBy("__a__", "__b__")
        .agg(F.count(F.lit(1)).alias("__c__")),
        10_000,
        "attribution transition table",
    )
    start_rows = bounded_collect(
        kept.filter(F.col("__rn__") == 1)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("__c__")),
        10_000,
        "attribution start distribution",
    )

    # exact-integer chain, identical to the oracle's generated CTEs
    cnt = {(r[0], r[1]): int(r[2]) for r in cnt_rows}
    rowsum: dict[str, int] = {}
    for (a, _b), c in cnt.items():
        rowsum[a] = rowsum.get(a, 0) + c
    ppm = {(a, b): (c * 1_000_000) // rowsum[a] for (a, b), c in cnt.items()}
    ppm[("purchase", "purchase")] = 1_000_000
    n_start = sum(int(r[1]) for r in start_rows)
    v0 = {
        r[0]: (int(r[1]) * 1_000_000_000) // n_start for r in start_rows
    } if n_start else {}

    def conv(removed: str | None) -> int:
        p = {
            (a, b): x
            for (a, b), x in ppm.items()
            if removed is None or (a != removed and b != removed)
        }
        v = {t: x for t, x in v0.items() if t != removed}
        for _ in range(_ATTR_ITERS):
            nxt: dict[str, int] = {}
            for (a, b), x in p.items():
                if a in v:
                    nxt[b] = nxt.get(b, 0) + v[a] * x
            v = {t: s // 1_000_000 for t, s in nxt.items()}
        return v.get("purchase", 0)

    cv_full = conv(None)
    rows = [
        (c, cv_full, conv(c)) for c in _ATTR_CHANNELS
    ]
    lit = spark.createDataFrame(
        rows, "channel string, __cvf__ long, __cvw__ long"
    )
    return lit.select(
        "channel",
        F.round(F.col("__cvf__").cast("double") / F.lit(1e9), 6).alias(
            "p_convert_full"
        ),
        F.round(F.col("__cvw__").cast("double") / F.lit(1e9), 6).alias(
            "p_convert_without"
        ),
        F.round(
            F.lit(1.0)
            - F.col("__cvw__").cast("double")
            / F.expr("CAST(NULLIF(__cvf__, 0) AS DOUBLE)"),
            6,
        ).alias("removal_effect"),
    )


_REMOVAL_EFFECTS_SQL = _removal_effects_sql("events", spark_dialect=False)


def order_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric 10% trimmed mean of order value per priority
    (extension: the robust-statistics companion to
    `weighted_median_price` — the mean with the top and bottom decile
    of ranks dropped, immune to the tail outliers that pull a plain
    mean): exact trim boundaries from integer ``n DIV 10`` (never
    ``n·0.1`` float arithmetic — ``floor`` of a binary 0.1 product can
    disagree with exact tenths), ranks from :func:`grouped_rank`'s
    funnel-free buckets (5 priorities = the few-huge-groups window
    funnel the rank family exists to avoid), kept-range sums exact
    DECIMAL. Output per priority: count, per-side trim count, trimmed
    and plain means."""
    from tmdb_index_spark.operators.ordering import grouped_rank

    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", _dec("o_totalprice").alias("__p__")
    )
    ranked = grouped_rank(
        o,
        "__p__",
        tiebreak=["o_orderkey"],
        partition_cols=["o_orderpriority"],
        rank_col="__r__",
        n_col="__n__",
        ascending=True,
    )
    k = F.expr("__n__ DIV 10")
    kept = ranked.filter((F.col("__r__") > k) & (F.col("__r__") <= F.col("__n__") - k))
    per = kept.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("__nk__"), F.sum("__p__").alias("__sk__")
    )
    alls = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("__p__").alias("__s__"),
    )
    return alls.join(F.broadcast(per), "o_orderpriority").select(
        "o_orderpriority",
        "n_orders",
        F.expr("CAST(n_orders DIV 10 AS BIGINT)").alias("n_trim_each"),
        F.round(
            F.col("__sk__").cast("double") / F.col("__nk__").cast("double"),
            2,
        ).alias("trimmed_mean"),
        F.round(
            F.col("__s__").cast("double") / F.col("n_orders").cast("double"),
            2,
        ).alias("mean_all"),
    )


_TRIMMED_MEAN_SQL = """
WITH o AS (
  SELECT o_orderpriority, o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS p
  FROM orders
),
ranked AS (
  SELECT o_orderpriority, p,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY p, o_orderkey) AS r,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM o
),
kept AS (
  SELECT o_orderpriority, p FROM ranked
  WHERE r > n // 10 AND r <= n - n // 10
),
per AS (
  SELECT o_orderpriority, COUNT(*) AS nk, SUM(p) AS sk
  FROM kept GROUP BY 1
),
alls AS (
  SELECT o_orderpriority, COUNT(*)::BIGINT AS n_orders, SUM(p) AS s
  FROM o GROUP BY 1
)
SELECT o_orderpriority, n_orders,
       CAST(n_orders // 10 AS BIGINT) AS n_trim_each,
       ROUND(CAST(sk AS DOUBLE) / nk, 2) AS trimmed_mean,
       ROUND(CAST(s AS DOUBLE) / n_orders, 2) AS mean_all
FROM alls JOIN per USING (o_orderpriority)
"""


_FDR_ALPHA = 0.05


def _fdr_sql(table: str) -> str:
    """One SQL text (shared verbatim by Spark and DuckDB — standard
    syntax only) for the per-nation balance z-test + Benjamini–
    Hochberg FDR correction: exact DECIMAL moment sums per nation,
    population z against the global mean, two-sided p via the
    Abramowitz & Stegun 7.1.26 erf polynomial (the only libm calls are
    exp/sqrt — the ``ln`` cross-engine stance: 1-ULP libm drift is
    absorbed by quantizing p to 6 decimals BEFORE the BH comparison,
    so the step-up rule compares identical quantized values), then the
    classic step-up: k* = max rank with p₍ₖ₎ ≤ k·α/m over the
    |nations|-bounded ranked frame."""
    # A&S 7.1.26 coefficients, embedded as repr literals on both sides
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p_coef = 0.3275911
    return f"""
WITH per_nation AS (
  SELECT n.n_name,
         COUNT(*) AS n_custs,
         SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS s,
         SUM(CAST(c.c_acctbal AS DECIMAL(18,2))
             * CAST(c.c_acctbal AS DECIMAL(18,2))) AS ss
  FROM {table} c JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
),
allstats AS (
  SELECT SUM(n_custs) AS nall, SUM(s) AS sall, SUM(ss) AS ssall,
         COUNT(*) AS m
  FROM per_nation
),
z AS (
  SELECT n_name, n_custs, m,
         CAST(s AS DOUBLE) / n_custs AS mean_s,
         CAST(sall AS DOUBLE) / nall AS mean_g,
         (CAST(s AS DOUBLE) / n_custs - CAST(sall AS DOUBLE) / nall)
           / (SQRT(CAST(ssall AS DOUBLE) / nall
                   - (CAST(sall AS DOUBLE) / nall)
                     * (CAST(sall AS DOUBLE) / nall))
              / SQRT(CAST(n_custs AS DOUBLE))) AS zval
  FROM per_nation CROSS JOIN allstats
),
pv AS (
  SELECT n_name, n_custs, m, mean_s, zval,
         ROUND((({a1!r} * (1.0 / (1.0 + {p_coef!r} * (ABS(zval) / SQRT(2.0))))
           + {a2!r} * POWER(1.0 / (1.0 + {p_coef!r} * (ABS(zval) / SQRT(2.0))), 2)
           + {a3!r} * POWER(1.0 / (1.0 + {p_coef!r} * (ABS(zval) / SQRT(2.0))), 3)
           + {a4!r} * POWER(1.0 / (1.0 + {p_coef!r} * (ABS(zval) / SQRT(2.0))), 4)
           + {a5!r} * POWER(1.0 / (1.0 + {p_coef!r} * (ABS(zval) / SQRT(2.0))), 5))
           * EXP(-(ABS(zval) / SQRT(2.0)) * (ABS(zval) / SQRT(2.0)))), 6)
           AS p_value
  FROM z
),
ranked AS (
  SELECT n_name, n_custs, m, mean_s, zval, p_value,
         ROW_NUMBER() OVER (ORDER BY p_value ASC, n_name ASC) AS bh_rank
  FROM pv
),
kstar AS (
  SELECT COALESCE(MAX(CASE WHEN p_value <= bh_rank * {_FDR_ALPHA!r} / m
                           THEN bh_rank ELSE 0 END), 0) AS k
  FROM ranked
)
SELECT n_name,
       CAST(n_custs AS BIGINT) AS n_custs,
       ROUND(mean_s, 2) AS mean_bal,
       ROUND(zval, 4) AS z_score,
       p_value,
       CAST(bh_rank AS BIGINT) AS bh_rank,
       bh_rank <= k AS significant
FROM ranked CROSS JOIN kstar
"""


def nation_balance_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple-testing control (extension: the eval-suite statistic
    behind any per-segment metric dashboard — 25 simultaneous
    per-nation balance z-tests inflate false positives, Benjamini–
    Hochberg 1995 step-up bounds the FDR at α=0.05): exact DECIMAL
    moment sums, population z per nation vs the global mean, two-sided
    p via the shared A&S 7.1.26 erf polynomial, p quantized to 6
    decimals BEFORE the step-up comparison so both engines run BH on
    identical values (the only libm calls are exp/sqrt — the
    `source_token_kl` ln stance on 1-ULP drift). ONE SQL text serves
    both engines verbatim (:func:`_fdr_sql`); every frame after the
    per-nation aggregate is |nations|-bounded."""
    import uuid

    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    cview = f"__fdr_cust_{uuid.uuid4().hex[:12]}"
    nview = f"__fdr_nation_{uuid.uuid4().hex[:12]}"
    cust.createOrReplaceTempView(cview)
    nation.createOrReplaceTempView(nview)
    return spark.sql(_fdr_sql(cview).replace(" nation n ", f" {nview} n "))


_NATION_FDR_SQL = _fdr_sql("customer")


def source_ablation_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-source-out data valuation (extension: the ablation
    table a data-mixture owner reads before cutting a source — how
    much does REMOVING each source move the corpus mean quality
    score? The exact group-wise LOO identity mean₋ₛ = (T − tₛ)/(N −
    nₛ) makes the whole table ONE aggregate pass — no per-source
    recompute, the trick that makes source ablations free at 100 TB):
    quality score = the `adaptive_quality_filter` recipe verbatim
    (stopword density − punctuation density, FLOOR-quantized integer
    micros), per-source sums exact BIGINT, the corpus totals broadcast
    back onto the |sources| frame, every mean one double division.
    ``delta`` = corpus mean − LOO mean (the source's contribution);
    NULLIF guards the single-source corpus."""
    from tmdb_index_spark.functions.text import LANG_MARKERS, tokens

    docs = _t(spark, sf_dir, "documents")
    c = F.coalesce(F.col("text"), F.lit(""))
    t = tokens(c)
    n_words = F.size(t)
    n_chars = F.length(c)
    stop = F.array([F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(t, lambda w: F.array_contains(stop, F.lower(w))))
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    score_q = (
        F.floor(
            F.lit(1e6) * n_stop.cast("double")
            / F.greatest(n_words, F.lit(1)).cast("double")
        )
        - F.floor(
            F.lit(1e6) * n_punct.cast("double")
            / F.greatest(n_chars, F.lit(1)).cast("double")
        )
    ).cast("long")
    per_src = (
        docs.select("source", score_q.alias("__q__"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__q__").cast("bigint").alias("__sq__"),
        )
    )
    tot = per_src.agg(
        F.sum("n_docs").cast("bigint").alias("__nall__"),
        F.sum("__sq__").cast("bigint").alias("__sqall__"),
    )
    src_mean = F.col("__sq__").cast("double") / F.col("n_docs").cast(
        "double"
    ) / F.lit(1e6)
    corpus_mean = F.col("__sqall__").cast("double") / F.col("__nall__").cast(
        "double"
    ) / F.lit(1e6)
    loo_mean = (
        (F.col("__sqall__") - F.col("__sq__")).cast("double")
        / F.expr("CAST(NULLIF(__nall__ - n_docs, 0) AS DOUBLE)")
        / F.lit(1e6)
    )
    return per_src.join(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.round(src_mean, 6).alias("source_mean"),
        F.round(corpus_mean, 6).alias("corpus_mean"),
        F.round(loo_mean, 6).alias("loo_mean"),
        # + 0.0 kills IEEE negative zero: a delta rounding to zero
        # from below prints -0.0 on one engine and 0.0 on the other
        (F.round(corpus_mean - loo_mean, 6) + F.lit(0.0)).alias("delta"),
    )


_SOURCE_ABLATION_SQL = """
WITH t AS (
  SELECT source, coalesce(text, '') AS text,
         regexp_split_to_array(trim(coalesce(text, '')), '\\s+') AS ts
  FROM documents
),
scored AS (
  SELECT source,
         CAST(FLOOR(1e6 * len(list_filter(ts, w -> list_contains(
                  __EN_MARKERS__, lower(w)))) * 1.0
                / greatest(len(ts), 1))
            - FLOOR(1e6 * (length(text)
                - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0
                / greatest(length(text), 1)) AS BIGINT) AS q
  FROM t
),
per_src AS (
  SELECT source, COUNT(*)::BIGINT AS n_docs, SUM(q)::BIGINT AS sq
  FROM scored GROUP BY 1
),
tot AS (SELECT SUM(n_docs)::BIGINT AS nall, SUM(sq)::BIGINT AS sqall
        FROM per_src)
SELECT source, n_docs,
       ROUND(CAST(sq AS DOUBLE) / CAST(n_docs AS DOUBLE) / 1e6, 6)
         AS source_mean,
       ROUND(CAST(sqall AS DOUBLE) / CAST(nall AS DOUBLE) / 1e6, 6)
         AS corpus_mean,
       ROUND(CAST(sqall - sq AS DOUBLE)
             / CAST(NULLIF(nall - n_docs, 0) AS DOUBLE) / 1e6, 6) AS loo_mean,
       ROUND(CAST(sqall AS DOUBLE) / CAST(nall AS DOUBLE) / 1e6
             - CAST(sqall - sq AS DOUBLE)
               / CAST(NULLIF(nall - n_docs, 0) AS DOUBLE) / 1e6, 6) + 0.0
         AS delta
FROM per_src, tot
""".replace("__EN_MARKERS__", _EN_MARKERS_SQL)


def signup_psm_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Propensity-matched treatment effect (extension: the
    observational-causal sibling of `purchase_did_estimate` —
    nearest-neighbor propensity matching, Rosenbaum & Rubin 1983):
    does signing up (treatment = ≥1 ``signup`` event) lift total
    purchase value (outcome), controlling for engagement (propensity
    proxy = the user's click count)? Each treated SCORE CELL matches
    the nearest control score (argmin |s−s'|, ties to the lower
    control score — matching WITH replacement on the
    coarsened-by-integer-score cells, the standard NN-matching shape
    re-expressed over bounded aggregates: the score tables are
    distinct click-counts, sub-linear in users, so the match join is
    a bounded broadcast cross with a per-treated-score argmin window,
    never a user×user pair join). Exactness: outcomes aggregate as
    DECIMAL; control cell means quantize to integer micros BEFORE the
    Σ n_t·ȳ_c accumulation (the PCA convention — no cross-engine
    float-sum-order drift); ATT divides once at the end, NULL via
    NULLIF when there are no treated or no control users."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("__clicks__"),
        F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0))
        .cast("bigint")
        .alias("__signups__"),
        F.sum(
            F.when(F.col("event_type") == "purchase", _dec("value")).otherwise(
                F.lit(0).cast("decimal(18,2)")
            )
        ).alias("__y__"),
    )
    treated = per_user.filter(F.col("__signups__") > 0)
    control = per_user.filter(F.col("__signups__") == 0)
    t_cells = treated.groupBy("__clicks__").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nt__"),
        F.sum("__y__").alias("__syt__"),
    )
    c_cells = control.groupBy("__clicks__").agg(
        F.count(F.lit(1)).cast("bigint").alias("__nc__"),
        (
            F.round(
                F.sum("__y__").cast("double")
                / F.count(F.lit(1)).cast("double")
                * F.lit(1e6)
            )
        )
        .cast("bigint")
        .alias("__mm__"),
    )
    wm = Window.partitionBy("__ts__").orderBy(
        F.abs(F.col("__ts__") - F.col("__cs__")).asc(), F.col("__cs__").asc()
    )
    matched = (
        t_cells.select(F.col("__clicks__").alias("__ts__"), "__nt__", "__syt__")
        .join(
            F.broadcast(
                c_cells.select(
                    F.col("__clicks__").alias("__cs__"), "__mm__"
                )
            )
        )
        .withColumn("__rn__", F.row_number().over(wm))
        .filter(F.col("__rn__") == 1)
    )
    tot = matched.agg(
        F.coalesce(F.sum("__nt__"), F.lit(0)).cast("bigint").alias(
            "n_treated"
        ),
        F.sum("__syt__").alias("__sy__"),
        F.sum(F.col("__nt__") * F.col("__mm__")).cast("decimal(38,0)").alias(
            "__smm__"
        ),
    )
    n_ctrl = control.agg(F.count(F.lit(1)).cast("bigint").alias("n_controls"))
    nt = F.col("n_treated").cast("double")
    mean_t = F.col("__sy__").cast("double") / F.expr("NULLIF(n_treated, 0)")
    mean_c = (
        F.col("__smm__").cast("double")
        / F.lit(1e6)
        / F.expr("NULLIF(n_treated, 0)")
    )
    return tot.join(F.broadcast(n_ctrl)).select(
        "n_treated",
        "n_controls",
        F.round(mean_t, 4).alias("mean_treated_outcome"),
        F.round(mean_c, 4).alias("mean_matched_outcome"),
        F.round(mean_t - mean_c, 4).alias("att"),
    )


_PSM_SQL = """
WITH per_user AS (
  SELECT user_id,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
           AS clicks,
         SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT
           AS signups,
         SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(value AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS y
  FROM events GROUP BY 1
),
t_cells AS (
  SELECT clicks AS ts, COUNT(*)::BIGINT AS nt, SUM(y) AS syt
  FROM per_user WHERE signups > 0 GROUP BY 1
),
c_cells AS (
  SELECT clicks AS cs, COUNT(*)::BIGINT AS nc,
         CAST(ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*) * 1e6) AS BIGINT)
           AS mm
  FROM per_user WHERE signups = 0 GROUP BY 1
),
matched AS (
  SELECT ts, nt, syt, mm FROM (
    SELECT t.ts, t.nt, t.syt, c.mm,
           ROW_NUMBER() OVER (PARTITION BY t.ts
                              ORDER BY ABS(t.ts - c.cs) ASC, c.cs ASC) AS rn
    FROM t_cells t CROSS JOIN c_cells c
  ) WHERE rn = 1
),
tot AS (
  SELECT COALESCE(SUM(nt), 0)::BIGINT AS n_treated, SUM(syt) AS sy,
         CAST(SUM(nt * mm) AS DECIMAL(38,0)) AS smm
  FROM matched
),
n_ctrl AS (
  SELECT COUNT(*)::BIGINT AS n_controls FROM per_user WHERE signups = 0
)
SELECT n_treated, n_controls,
       ROUND(CAST(sy AS DOUBLE) / NULLIF(n_treated, 0), 4)
         AS mean_treated_outcome,
       ROUND(CAST(smm AS DOUBLE) / 1e6 / NULLIF(n_treated, 0), 4)
         AS mean_matched_outcome,
       ROUND(CAST(sy AS DOUBLE) / NULLIF(n_treated, 0)
             - CAST(smm AS DOUBLE) / 1e6 / NULLIF(n_treated, 0), 4) AS att
FROM tot, n_ctrl
"""


def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction planning per source (extension: the
    lakehouse ops query behind every OPTIMIZE/rewrite job — given
    per-source row and byte totals, how many 128 MiB-target files
    should the rewrite emit and how many rows land in each): byte
    sizes are exact UTF-8 octet counts (Spark ``octet_length`` =
    DuckDB ``strlen``), file counts are pure integer ceiling division
    ((bytes + target − 1) DIV target — no float in the plan math, so
    cross-engine parity is trivial), and the per-source aggregate is
    one combinable map-side groupBy. At 100 TB this query IS the
    compaction driver's planning stage: its output is |sources| rows
    however large the corpus."""
    d = _t(spark, sf_dir, "documents")
    target = 134_217_728  # 128 MiB
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.octet_length(F.col("text"))).cast("bigint").alias(
            "total_bytes"
        ),
        F.max(F.octet_length(F.col("text"))).cast("bigint").alias(
            "max_doc_bytes"
        ),
    )
    nf = f"GREATEST(CAST(1 AS BIGINT), (total_bytes + {target - 1}) DIV {target})"
    return per.select(
        "source",
        "n_docs",
        "total_bytes",
        "max_doc_bytes",
        F.expr(nf).alias("target_files"),
        F.expr(f"CAST((n_docs + {nf} - 1) DIV {nf} AS BIGINT)").alias(
            "rows_per_file"
        ),
        F.round(
            F.col("total_bytes").cast("double")
            / F.col("n_docs").cast("double"),
            2,
        ).alias("avg_doc_bytes"),
    )


_COMPACTION_SQL = """
WITH per AS (
  SELECT source,
         COUNT(*)::BIGINT AS n_docs,
         SUM(strlen(text))::BIGINT AS total_bytes,
         MAX(strlen(text))::BIGINT AS max_doc_bytes
  FROM documents GROUP BY 1
)
SELECT source, n_docs, total_bytes, max_doc_bytes,
       GREATEST(1, (total_bytes + 134217727) // 134217728)::BIGINT
         AS target_files,
       ((n_docs + GREATEST(1, (total_bytes + 134217727) // 134217728) - 1)
        // GREATEST(1, (total_bytes + 134217727) // 134217728))::BIGINT
         AS rows_per_file,
       ROUND(CAST(total_bytes AS DOUBLE) / CAST(n_docs AS DOUBLE), 2)
         AS avg_doc_bytes
FROM per
"""


def conformal_revenue_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval for daily revenue
    (extension: distribution-free uncertainty quantification — the
    finite-sample-valid interval construction modern forecast evals
    report; Vovk et al. 2005, Angelopoulos & Bates 2021 intro): a
    per-day-of-week mean revenue model fits on the TRAIN years
    (1995–97), the CALIBRATION years (1998–99) supply the conformal
    radius q̂ = the ⌈(n_cal+1)·0.9⌉-th smallest |residual| (exact
    nearest-rank order statistic, ties broken by day), and the TEST
    years (2000+) measure empirical coverage of pred ± q̂ — conformal
    theory guarantees ≥90% up to finite-sample noise. Day-of-week is
    the portable ``datediff(day, 1995-01-02) % 7`` (engine date-part
    conventions differ; an integer day count cannot). Daily revenue
    aggregates as exact DECIMAL; residuals are single double
    subtractions of identical values; the rank window runs over the
    CALENDAR-BOUNDED calibration frame (~730 rows — the
    `robust_trend_daily` bound convention). Output: split sizes, q̂,
    and test coverage."""
    li = _t(spark, sf_dir, "lineitem")
    rev = F.sum(_dec("l_extendedprice")).alias("__rev__")
    daily = (
        li.groupBy(F.date_trunc("day", F.col("l_shipdate")).alias("__day__"))
        .agg(rev)
        .select(
            "__day__",
            F.col("__rev__").cast("double").alias("__y__"),
            F.col("__rev__").alias("__ydec__"),
            (
                F.datediff(
                    F.col("__day__"), F.lit("1995-01-02").cast("date")
                )
                % 7
            ).alias("__dow__"),
        )
    )
    train = daily.filter(F.col("__day__") < F.lit("1998-01-01").cast("timestamp"))
    cal = daily.filter(
        (F.col("__day__") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("__day__") < F.lit("2000-01-01").cast("timestamp"))
    )
    test = daily.filter(F.col("__day__") >= F.lit("2000-01-01").cast("timestamp"))
    # exact DECIMAL sum into the model mean, ONE double division — a
    # double SUM would be addition-order-dependent and could flip the
    # r <= q_hat coverage comparison at boundary values (round-9 ADVICE)
    model = train.groupBy("__dow__").agg(
        (F.sum("__ydec__").cast("double") / F.count(F.lit(1))).alias(
            "__pred__"
        )
    )
    cal_r = cal.join(F.broadcast(model), "__dow__").select(
        "__day__", F.abs(F.col("__y__") - F.col("__pred__")).alias("__r__")
    )
    n_cal_f = cal_r.agg(F.count(F.lit(1)).alias("__n_cal__"))
    w = Window.orderBy(F.col("__r__").asc(), F.col("__day__").asc())
    ranked = cal_r.select(
        "__r__", F.row_number().over(w).alias("__rn__")
    ).join(F.broadcast(n_cal_f))
    q_hat = ranked.filter(
        F.col("__rn__")
        == F.least(
            F.ceil((F.col("__n_cal__") + 1) * F.lit(0.9)).cast("int"),
            F.col("__n_cal__"),
        )
    ).select(F.col("__r__").alias("__q__"), "__n_cal__")
    test_r = test.join(F.broadcast(model), "__dow__").select(
        F.abs(F.col("__y__") - F.col("__pred__")).alias("__r__")
    )
    test_agg = test_r.join(F.broadcast(q_hat)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test_days"),
        F.first("__n_cal__").cast("bigint").alias("n_cal_days"),
        F.round(F.first("__q__"), 4).alias("q_hat"),
        F.round(
            F.sum(
                F.when(F.col("__r__") <= F.col("__q__"), 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("coverage"),
    )
    n_train = train.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_train_days")
    )
    return test_agg.join(F.broadcast(n_train)).select(
        "n_train_days", "n_cal_days", "n_test_days", "q_hat", "coverage"
    )


_CONFORMAL_SQL = """
WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS day,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS y,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS ydec,
         date_diff('day', DATE '1995-01-02', date_trunc('day', l_shipdate))
           % 7 AS dow
  FROM lineitem GROUP BY 1
),
model AS (
  SELECT dow, CAST(SUM(ydec) AS DOUBLE) / COUNT(*) AS pred
  FROM daily WHERE day < TIMESTAMP '1998-01-01' GROUP BY 1
),
cal_r AS (
  SELECT d.day, ABS(d.y - m.pred) AS r
  FROM daily d JOIN model m USING (dow)
  WHERE d.day >= TIMESTAMP '1998-01-01' AND d.day < TIMESTAMP '2000-01-01'
),
n_cal AS (SELECT COUNT(*) AS n_cal FROM cal_r),
ranked AS (
  SELECT r, ROW_NUMBER() OVER (ORDER BY r ASC, day ASC) AS rn FROM cal_r
),
q AS (
  SELECT r AS q_hat, n_cal FROM ranked, n_cal
  WHERE rn = LEAST(CAST(CEIL((n_cal + 1) * 0.9) AS INT), n_cal)
),
test_r AS (
  SELECT ABS(d.y - m.pred) AS r
  FROM daily d JOIN model m USING (dow)
  WHERE d.day >= TIMESTAMP '2000-01-01'
),
n_train AS (
  SELECT COUNT(*) AS n_train FROM daily WHERE day < TIMESTAMP '1998-01-01'
)
SELECT n_train::BIGINT AS n_train_days,
       n_cal::BIGINT AS n_cal_days,
       COUNT(*)::BIGINT AS n_test_days,
       ROUND(ANY_VALUE(q_hat), 4) AS q_hat,
       ROUND(SUM(CASE WHEN test_r.r <= q_hat THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS coverage
FROM test_r, q, n_train
GROUP BY n_train, n_cal
"""


_MMR_LAM, _MMR_DIV, _MMR_POOL, _MMR_K = 0.7, 0.3, 20, 5


def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified top-5 (extension: search-result diversification
    — Carbonell & Goldstein 1998 Maximal Marginal Relevance, the
    reranker RAG/search stacks run on the retrieval head so near-
    duplicate hits don't crowd the result list): exact cosine top-20
    for query vector ``vec_id = 0`` is the bounded candidate pool
    (TakeOrderedAndProject — reranking happens on the head, never the
    corpus), then :func:`~tmdb_index_spark.operators.similarity
    .mmr_rerank` greedily picks 5 with λ=0.7. The greedy trajectory
    is engine-exact (rounded-4 rel/sims, repr-shared λ literals, ties
    on lower id), so the ORACLE expresses the same 5 steps as chained
    CTEs — a full static value row for an iterative algorithm."""
    from tmdb_index_spark.operators.similarity import mmr_rerank

    emb = _t(spark, sf_dir, "embeddings")
    rel = brute_force_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=_MMR_POOL
    ).select(F.col("neighbor_id").alias("vec_id"), F.col("cos_sim").alias("rel"))
    pool = rel.join(emb.select("vec_id", "embedding"), "vec_id")
    return mmr_rerank(pool, k=_MMR_K, lam=_MMR_LAM)


def _mmr_oracle_sql() -> str:
    """Static oracle for ``mmr_diversified_topk``: the 5 greedy MMR
    steps as chained CTEs — each step joins the remaining pool to the
    pairwise sim matrix restricted to the selected-so-far set, takes
    MAX(sim), scores λ·rel − (1−λ)·maxsim on the same repr literals
    the Spark side uses (UNROUNDED for the argmax — both engines
    compute bit-identical doubles from the engine-rounded rel/sim
    inputs, so the pick order is exact), takes the (score DESC, id
    ASC) head, and ROUNDS only the OUTPUT score — mirroring the
    operator's in-engine final rounding."""
    steps = []
    sel_union = "SELECT vec_id FROM s1"
    for i in range(2, _MMR_K + 1):
        steps.append(f"""
s{i} AS (
  SELECT p.vec_id, p.rel,
         {_MMR_LAM!r} * p.rel - {_MMR_DIV!r} * MAX(s.sim) AS mmr
  FROM pool p
  JOIN sim s ON s.da = p.vec_id AND s.db IN ({sel_union})
  WHERE p.vec_id NOT IN ({sel_union})
  GROUP BY p.vec_id, p.rel
  ORDER BY mmr DESC, p.vec_id ASC LIMIT 1
)""")
        sel_union += f" UNION ALL SELECT vec_id FROM s{i}"
    selects = [
        f"SELECT CAST(1 AS BIGINT) AS rank, vec_id, rel AS relevance,"
        f" ROUND({_MMR_LAM!r} * rel, 4) AS mmr_score FROM s1"
    ] + [
        f"SELECT CAST({i} AS BIGINT), vec_id, rel, ROUND(mmr, 4) FROM s{i}"
        for i in range(2, _MMR_K + 1)
    ]
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
rel AS (
  SELECT c.vec_id, {_COS_SQL} AS rel
  FROM (SELECT * FROM v WHERE vec_id = 0) q
  CROSS JOIN v c
  WHERE c.vec_id <> 0
  ORDER BY rel DESC, c.vec_id ASC LIMIT {_MMR_POOL}
),
pool AS (SELECT r.vec_id, r.rel, vv.v FROM rel r JOIN v vv USING (vec_id)),
sim AS (
  SELECT q.vec_id AS da, c.vec_id AS db, {_COS_SQL} AS sim
  FROM pool q JOIN pool c ON q.vec_id <> c.vec_id
),
s1 AS (SELECT vec_id, rel FROM pool ORDER BY rel DESC, vec_id ASC LIMIT 1),
{",".join(steps)}
{" UNION ALL ".join(selects)}
"""


_MMR_SQL = _mmr_oracle_sql()


def distinct_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe exact distinct (two-phase dedup-then-count): distinct
    parts shipped per supplier."""
    from tmdb_index_spark.operators.skew import two_phase_count_distinct

    return two_phase_count_distinct(
        _t(spark, sf_dir, "lineitem"), keys=["l_suppkey"], value="l_partkey",
        alias="n_parts",
    )


_DISTINCT_PARTS_SQL = """
SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts
FROM lineitem GROUP BY l_suppkey
"""


def lang_id_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-lexicon language ID (extension: text analysis): per-lang
    marker hits, deterministic priority-ordered argmax."""
    docs = _t(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    langs = list(LANG_MARKERS)
    def _counter(markers: tuple[str, ...]):
        arr = F.array(*[F.lit(m) for m in markers])
        return lambda w: F.array_contains(arr, F.lower(w))

    scores = {}
    for lang in langs:
        scores[lang] = F.size(F.filter(t, _counter(LANG_MARKERS[lang])))
    pred = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = scores[lang] >= scores[other]
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return docs.select(
        "doc_id",
        pred.alias("pred_lang"),
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in langs],
    )


def _duck_lang_score(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return (
        f"len(list_filter(regexp_split_to_array(trim(text), '\\s+'),"
        f" w -> list_contains([{markers}], lower(w))))"
    )


_LANG_ID_SQL = (
    "WITH s AS (SELECT doc_id, "
    + ", ".join(f"{_duck_lang_score(lang)} AS score_{lang}" for lang in LANG_MARKERS)
    + " FROM documents)\nSELECT doc_id, CASE\n"
    + "\n".join(
        "  WHEN "
        + " AND ".join(
            f"score_{lang} >= score_{other}"
            for other in LANG_MARKERS
            if other != lang
        )
        + f" THEN '{lang}'"
        for lang in list(LANG_MARKERS)[:-1]
    )
    + f"\n  ELSE '{list(LANG_MARKERS)[-1]}' END AS pred_lang, "
    + ", ".join(f"score_{lang}::BIGINT AS score_{lang}" for lang in LANG_MARKERS)
    + " FROM s"
)


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-quality features (extension: quality scoring)."""
    docs = _t(spark, sf_dir, "documents")
    feats = quality_features(F.col("text"))
    return docs.select(
        "doc_id", *[expr.alias(name) for name, expr in feats.items()]
    )


_TEXT_QUALITY_SQL = """
WITH t AS (
  SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents
)
SELECT doc_id,
  length(text)::BIGINT AS n_chars,
  len(ts)::BIGINT AS n_words,
  ROUND(list_sum(list_transform(ts, w -> length(w))) * 1.0 / greatest(len(ts), 1), 4) AS avg_word_len,
  ROUND((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0
        / greatest(length(text), 1), 4) AS punct_ratio,
  ROUND(len(list_filter(ts, w -> list_contains(['the','and','of','to','a','is'], lower(w)))) * 1.0
        / greatest(len(ts), 1), 4) AS stopword_ratio
FROM t
"""


def adaptive_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source adaptive quality-threshold filtering (extension: the
    FineWeb/per-dump lesson — one global quality cutoff over-filters
    clean sources and under-filters noisy ones, so each source gets its
    OWN threshold, here the source's 25th-percentile quality score;
    docs at or above it are kept): quality score = stopword density
    minus punctuation density, quantized to exact integer micros via
    FLOOR (identical double division then FLOOR on both engines — no
    float-tie hazard in the ranking), per-source p25 found by exact
    rank ``k = (n + 3) DIV 4`` over :func:`grouped_rank`'s funnel-free
    buckets (a naive ``row_number`` window partitioned by the ~20
    sources would sort data-proportional slices in single tasks), and
    the 20-row threshold frame broadcasts back for the keep count.
    Score pieces mirror `_TEXT_QUALITY_SQL`'s recipe verbatim (the
    tokenizer-drift lesson)."""
    from tmdb_index_spark.functions.text import LANG_MARKERS, tokens
    from tmdb_index_spark.operators.ordering import grouped_rank

    docs = _t(spark, sf_dir, "documents")
    c = F.coalesce(F.col("text"), F.lit(""))
    t = tokens(c)
    n_words = F.size(t)
    n_chars = F.length(c)
    stop = F.array([F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(t, lambda w: F.array_contains(stop, F.lower(w))))
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    score_q = (
        F.floor(
            F.lit(1e6) * n_stop.cast("double")
            / F.greatest(n_words, F.lit(1)).cast("double")
        )
        - F.floor(
            F.lit(1e6) * n_punct.cast("double")
            / F.greatest(n_chars, F.lit(1)).cast("double")
        )
    ).cast("long")
    scored = docs.select("doc_id", "source", score_q.alias("__q__"))
    ranked = grouped_rank(
        scored,
        "__q__",
        tiebreak=["doc_id"],
        partition_cols=["source"],
        rank_col="__r__",
        n_col="__n__",
        ascending=True,
    )
    thr = ranked.filter(
        F.col("__r__") == F.expr("(__n__ + 3) div 4")
    ).select("source", F.col("__q__").alias("__thr__"))
    n = F.count(F.lit(1))
    kept = F.sum(F.when(F.col("__q__") >= F.col("__thr__"), 1).otherwise(0))
    return (
        scored.join(F.broadcast(thr), "source")
        .groupBy("source")
        .agg(
            n.cast("long").alias("n_docs"),
            F.round(F.max("__thr__").cast("double") / F.lit(1e6), 6).alias(
                "threshold"
            ),
            kept.cast("long").alias("n_kept"),
            F.round(kept.cast("double") / n.cast("double"), 4).alias(
                "kept_rate"
            ),
        )
    )


_ADAPTIVE_QUALITY_SQL = """
WITH t AS (
  SELECT doc_id, source, coalesce(text, '') AS text,
         regexp_split_to_array(trim(coalesce(text, '')), '\\s+') AS ts
  FROM documents
),
scored AS (
  SELECT doc_id, source,
         CAST(FLOOR(1e6 * len(list_filter(ts, w -> list_contains(
                  ['the','and','of','to','a','is'], lower(w)))) * 1.0
                / greatest(len(ts), 1))
            - FLOOR(1e6 * (length(text)
                - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0
                / greatest(length(text), 1)) AS BIGINT) AS q
  FROM t
),
ranked AS (
  SELECT source, q,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY q, doc_id) AS r,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM scored
),
thr AS (
  SELECT source, q AS thr FROM ranked WHERE r = (n + 3) // 4
)
SELECT s.source,
       COUNT(*)::BIGINT AS n_docs,
       ROUND(CAST(MAX(thr) AS DOUBLE) / 1e6, 6) AS threshold,
       SUM(CASE WHEN q >= thr THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       ROUND(SUM(CASE WHEN q >= thr THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
         AS kept_rate
FROM scored s JOIN thr USING (source)
GROUP BY s.source
"""


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting (extension: token counting)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )


_TOKEN_COUNT_SQL = """
SELECT doc_id,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))::BIGINT AS n_tokens
FROM documents
"""


def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer merge-coverage audit (extension: the vocab-sizing
    diagnostic behind `token_zipf_fit` — if the tokenizer's merge
    table keeps only the corpus's top-K word BIGRAMS, what fraction of
    each source's adjacent-pair occurrences falls outside it, i.e.
    must be encoded unmerged): vocabulary = the top 512 bigrams by
    corpus frequency (ties broken by the bigram string — a total
    order, so the cut is deterministic), selected with a plan-bounded
    ``orderBy().limit()`` (TakeOrderedAndProject — never a global
    sort), **broadcast** to the per-(source, bigram) count frame; OOV
    share = 1 − in-vocab occurrences / total occurrences from exact
    integer sums. The unit is the bigram (not the word) because it is
    the unit whose type count GROWS with corpus diversity — the
    combinatorial tail merge tables actually truncate. Tokenization
    and bigram construction mirror `dsir_logweights`' recipe verbatim
    in the oracle."""
    d = _t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(
        F.lower(F.coalesce(F.col("text"), F.lit(""))), F.lit("[a-z0-9]+"), 0
    )
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = d.select("source", F.explode(bigrams).alias("__term__"))
    per_src_term = grams.groupBy("source", "__term__").agg(
        F.count(F.lit(1)).cast("bigint").alias("__c__")
    )
    vocab = (
        per_src_term.groupBy("__term__")
        .agg(F.sum("__c__").alias("__f__"))
        .orderBy(F.col("__f__").desc(), F.col("__term__").asc())
        .limit(512)
        .select("__term__", F.lit(1).alias("__in__"))
    )
    joined = per_src_term.join(F.broadcast(vocab), "__term__", "left")
    n_tok = F.sum("__c__")
    n_in = F.sum(F.when(F.col("__in__").isNotNull(), F.col("__c__")).otherwise(0))
    return joined.groupBy("source").agg(
        n_tok.cast("bigint").alias("n_tokens"),
        (n_tok - n_in).cast("bigint").alias("n_oov"),
        F.round(
            F.lit(1.0) - n_in.cast("double") / n_tok.cast("double"), 6
        ).alias("oov_rate"),
    )


_OOV_SQL = """
WITH t AS (
  SELECT source,
         regexp_extract_all(coalesce(lower(text), ''), '[a-z0-9]+') AS ts
  FROM documents
),
grams AS (
  SELECT source,
         unnest(list_transform(range(1, len(ts)),
                               i -> ts[i] || ' ' || ts[i + 1])) AS term
  FROM t
),
pst AS (
  SELECT source, term, COUNT(*)::BIGINT AS c
  FROM grams GROUP BY source, term
),
vocab AS (
  SELECT term FROM (
    SELECT term, SUM(c) AS f FROM pst GROUP BY term
  ) ORDER BY f DESC, term ASC LIMIT 512
)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.term IS NULL THEN c ELSE 0 END) AS BIGINT)
         AS n_oov,
       ROUND(1.0 - SUM(CASE WHEN v.term IS NOT NULL THEN c ELSE 0 END)
             * 1.0 / SUM(c), 6) AS oov_rate
FROM pst LEFT JOIN vocab v USING (term)
GROUP BY source
"""


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprints (extension: document
    fingerprinting)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fingerprint")
    )


_FINGERPRINT_SQL = (
    _DUCK_SHINGLES
    + """
SELECT doc_id,
  array_to_string(list_slice(list_sort(list_transform(shs,
    s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)), 1, 4), ',') AS fingerprint
FROM sh
"""
)


def asof_purchase_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (extension: point-in-time operator Spark lacks
    natively): each purchase event gets the user's most recent prior
    signup value — single-shuffle union+carry-forward plan; the oracle
    is DuckDB's native ASOF JOIN."""
    from tmdb_index_spark.operators.asof import as_of_join

    ev = _events(spark, sf_dir)
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.col("value").alias("purchase_value")
    )
    right = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("value").alias("signup_value")
    )
    return as_of_join(left, right, on="user_id").select(
        "user_id", "event_id", "purchase_value", "signup_value"
    )


_ASOF_SQL = """
WITH l AS (
  SELECT user_id, ts, event_id, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
), r AS (
  SELECT user_id, ts, value AS signup_value
  FROM events WHERE event_type = 'signup'
)
SELECT l.user_id, l.event_id, l.purchase_value, r.signup_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def train_test_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based dataset split (extension: sampling) —
    split sizes are reproducible in any engine from the same formula."""
    from tmdb_index_spark.operators.sampling import hash_split

    docs = _t(spark, sf_dir, "documents")
    return (
        hash_split(docs, "doc_id", {"train": 0.8, "test": 0.1, "val": 0.1})
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_SPLIT_SQL = """
WITH b AS (
  SELECT (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000) AS bucket
  FROM documents
)
SELECT CASE
         WHEN bucket >= 0 AND bucket < 8000 THEN 'train'
         WHEN bucket >= 8000 AND bucket < 9000 THEN 'test'
         WHEN bucket >= 9000 AND bucket < 10000 THEN 'val'
       END AS split,
       COUNT(*) AS n_docs
FROM b GROUP BY 1
"""


def corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite training-data pipeline (extension): quality gate →
    language keep-list → exact dedup → MinHash-LSH near-dup removal,
    one lazy plan over the documents table."""
    from tmdb_index_spark.operators.corpus import clean_corpus

    return clean_corpus(
        _t(spark, sf_dir, "documents"),
        min_words=10,
        max_stopword_ratio=0.9,
        langs=("en", "de", "fr", "es"),
        jaccard_threshold=0.8,
    )


def _corpus_clean_sql() -> str:
    sig_cols = ", ".join(f"{_minhash_expr(i)} AS mh{i}" for i in range(16))
    return f"""
WITH gated AS (
  -- stopword gate compares the SAME round-4 value the Spark side
  -- gates on (quality_features rounds), so threshold-boundary docs
  -- can't diverge between engines
  SELECT * FROM documents
  WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 10
    AND ROUND(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                        w -> list_contains(['the','and','of','to','a','is'], lower(w))))
        * 1.0 / greatest(len(regexp_split_to_array(trim(text), '\\s+')), 1), 4) <= 0.9
    AND lang IN ('en', 'de', 'fr', 'es')
), kept AS (
  SELECT doc_id, text, lang, source, n_chars FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) rn
    FROM gated
  ) WHERE rn = 1
), t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts FROM kept
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, greatest(len(ts)-2, 0)),
                                      i -> array_to_string(list_slice(ts, i, i+2), ' '))) AS shs
  FROM t
), sig AS (
  SELECT doc_id, {sig_cols} FROM sh
), buckets AS (
  SELECT doc_id, b.band,
         CASE b.band
           WHEN 0 THEN concat_ws(',', mh0, mh1, mh2, mh3)
           WHEN 1 THEN concat_ws(',', mh4, mh5, mh6, mh7)
           WHEN 2 THEN concat_ws(',', mh8, mh9, mh10, mh11)
           ELSE concat_ws(',', mh12, mh13, mh14, mh15)
         END AS key
  FROM sig, (SELECT UNNEST(generate_series(0, 3)) AS band) b
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
), ex AS (
  SELECT doc_id, UNNEST(shs) AS s, len(shs) AS n FROM sh
), inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS c, MAX(a.n) AS na, MAX(b.n) AS nb
  FROM cand c
  JOIN ex a ON a.doc_id = c.id_a
  JOIN ex b ON b.doc_id = c.id_b AND b.s = a.s
  GROUP BY 1, 2
), losers AS (
  SELECT DISTINCT id_b AS doc_id FROM inter
  WHERE ROUND(c * 1.0 / (na + nb - c), 4) >= 0.8
)
SELECT k.* FROM kept k LEFT JOIN losers l ON k.doc_id = l.doc_id
WHERE l.doc_id IS NULL
"""


_CORPUS_CLEAN_SQL = _corpus_clean_sql()


def corpus_pipeline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus preparation composite (extension:
    the reference's `process()` lesson — `tmdb_index.py:546-568`
    composes fetch→upsert→enrich→flag into ONE artifact — applied to
    the north-star LLM surface): adaptive per-source quality gate →
    language keep-list → exact dedup → MinHash-LSH near-dup →
    SemDeDup semantic dedup → 5-gram eval decontamination →
    water-filling budget + map-only hash-rate mixture sample →
    concat-and-chunk packing, each stage the already-certified
    operator, chained over pinned (plan-truncating checkpoint)
    survivor frames so the corpus is scanned O(stages) times. Output:
    one exact-integer yield row per stage (docs_in/out/dropped,
    tokens_out). FULL value oracle despite the k-means fit inside the
    semantic stage — the fitted-literal dynamic-oracle pattern
    (centroids fit on the full embeddings table, independent of the
    upstream filter params, so the oracle re-fit needs no survivor
    replay)."""
    from tmdb_index_spark.operators.corpus_pipeline import (
        corpus_pipeline_stats as _pipeline_stats,
    )

    return _pipeline_stats(
        _t(spark, sf_dir, "documents"), _t(spark, sf_dir, "embeddings")
    )


def _fitted_corpus_pipeline_oracle_sql(
    sf_dir: str = "/root/testdata/sf0.01",
) -> str | None:
    """Value-row oracle for ``corpus_pipeline_stats``: re-run the
    deterministic centroid fit outside Spark (same parquet sample,
    same numpy core — the :func:`_fitted_semantic_dedup_oracle_sql`
    recipe, cells fit on the FULL embeddings table), then express all
    eight stages as chained CTEs mirroring each certified stage
    oracle: the adaptive-quality recipe (`_ADAPTIVE_QUALITY_SQL`),
    the corpus-clean minhash blocks (`_corpus_clean_sql`), the
    SemDeDup election, the decontam 5-grams (`_DECONTAM_SQL`), the
    water-fill closed form (`_WATERFILL_SQL`) + ppm hash-rate sample,
    and the pack binning (`_PACK_SEQUENCES_SQL`)."""
    try:
        import duckdb
        import numpy as np

        from tmdb_index_spark.operators.similarity import fit_kmeans_array

        con = duckdb.connect()
        path = f"{sf_dir}/embeddings.parquet"
        n = con.sql(f"SELECT COUNT(*) FROM '{path}'").fetchone()[0]
        if not n:
            return None
        sample = con.sql(
            f"SELECT embedding FROM '{path}' ORDER BY vec_id LIMIT 10000"
        ).fetchall()
        X = np.array([list(r[0]) for r in sample], dtype="float64")
        cells = max(1, round(n ** 0.5))
        cents = fit_kmeans_array(X, cells)
    except Exception:  # noqa: BLE001 — missing table → rows-only row
        return None
    dim = X.shape[1]
    values = ",\n    ".join(
        "({}, [{}])".format(
            cid, ", ".join(repr(float(x)) for x in vec)
        )
        for cid, vec in cents
    )
    sig_cols = ", ".join(f"{_minhash_expr(i)} AS mh{i}" for i in range(16))
    tok_expr = (
        "len(regexp_extract_all(coalesce(text, ''),"
        " '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))::BIGINT"
    )
    return f"""
WITH docs0 AS (
  SELECT doc_id, text, lang, source, {tok_expr} AS tok FROM documents
),
q_scored AS (
  SELECT doc_id, source,
         CAST(FLOOR(1e6 * len(list_filter(
                  regexp_split_to_array(trim(coalesce(text, '')), '\\s+'),
                  w -> list_contains({_EN_MARKERS_SQL}, lower(w)))) * 1.0
                / greatest(len(regexp_split_to_array(
                      trim(coalesce(text, '')), '\\s+')), 1))
            - FLOOR(1e6 * (length(coalesce(text, ''))
                - length(regexp_replace(coalesce(text, ''),
                                        '[^\\w\\s]', '', 'g'))) * 1.0
                / greatest(length(coalesce(text, '')), 1)) AS BIGINT) AS q
  FROM documents
),
q_ranked AS (
  SELECT source, q,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY q, doc_id) AS r,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM q_scored
),
thr AS (SELECT source, q AS thr FROM q_ranked WHERE r = (n + 3) // 4),
s1 AS (
  SELECT d.* FROM docs0 d
  JOIN q_scored sc ON d.doc_id = sc.doc_id
  JOIN thr t ON d.source = t.source
  WHERE sc.q >= t.thr
),
s2 AS (SELECT * FROM s1 WHERE lang IN ('en', 'de', 'fr', 'es')),
s3 AS (
  SELECT doc_id, text, lang, source, tok FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) rn
    FROM s2
  ) WHERE rn = 1
),
t3 AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts FROM s3),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, greatest(len(ts)-2, 0)),
                                      i -> array_to_string(list_slice(ts, i, i+2), ' '))) AS shs
  FROM t3
),
sig AS (SELECT doc_id, {sig_cols} FROM sh),
buckets AS (
  SELECT doc_id, b.band,
         CASE b.band
           WHEN 0 THEN concat_ws(',', mh0, mh1, mh2, mh3)
           WHEN 1 THEN concat_ws(',', mh4, mh5, mh6, mh7)
           WHEN 2 THEN concat_ws(',', mh8, mh9, mh10, mh11)
           ELSE concat_ws(',', mh12, mh13, mh14, mh15)
         END AS key
  FROM sig, (SELECT UNNEST(generate_series(0, 3)) AS band) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
),
ex AS (SELECT doc_id, UNNEST(shs) AS s, len(shs) AS n FROM sh),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS c, MAX(a.n) AS na, MAX(b.n) AS nb
  FROM cand c
  JOIN ex a ON a.doc_id = c.id_a
  JOIN ex b ON b.doc_id = c.id_b AND b.s = a.s
  GROUP BY 1, 2
),
losers AS (
  SELECT DISTINCT id_b AS doc_id FROM inter
  WHERE ROUND(c * 1.0 / (na + nb - c), 4) >= 0.8
),
s4 AS (
  SELECT s3.* FROM s3 LEFT JOIN losers l ON s3.doc_id = l.doc_id
  WHERE l.doc_id IS NULL
),
v AS (
  SELECT e.vec_id, e.embedding::DOUBLE[] AS v
  FROM embeddings e JOIN s4 ON e.vec_id = s4.doc_id
),
cent AS (SELECT * FROM (VALUES
    {values}
) AS tc(cell, cv)),
dd AS (
  SELECT vec_id, v, cell,
         list_sum(list_transform(generate_series(1, {dim}),
           i -> (v[i] - cv[i]) * (v[i] - cv[i]))) AS dist
  FROM v CROSS JOIN cent
),
assigned AS (
  SELECT vec_id, v, CAST(cell AS BIGINT) AS cell FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                 ORDER BY dist ASC, cell ASC) AS rn
    FROM dd
  ) WHERE rn = 1
),
semdrop AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE ROUND(list_sum(list_transform(generate_series(1, {dim}), i -> a.v[i] * b.v[i])) /
        (sqrt(list_sum(list_transform(a.v, x -> x * x))) *
         sqrt(list_sum(list_transform(b.v, x -> x * x)))), 4) >= 0.4
),
s5 AS (
  SELECT s4.* FROM s4 LEFT JOIN semdrop sd ON s4.doc_id = sd.vec_id
  WHERE sd.vec_id IS NULL
),
ng_ev AS (
  SELECT DISTINCT unnest(list_transform(
           list_distinct(list_transform(range(1, len(ts) - 3),
                                        i -> array_to_string(ts[i:i+4], ' '))),
           g -> ('0x' || substr(md5(g), 1, 15))::BIGINT)) AS h
  FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS ts
        FROM documents WHERE doc_id % 10 = 0)
),
tr5 AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM s5 WHERE doc_id % 10 <> 0
),
ng_tr AS (
  SELECT doc_id, unnest(list_transform(
           list_distinct(list_transform(range(1, len(ts) - 3),
                                        i -> array_to_string(ts[i:i+4], ' '))),
           g -> ('0x' || substr(md5(g), 1, 15))::BIGINT)) AS h
  FROM tr5
),
contam AS (SELECT DISTINCT doc_id FROM ng_tr JOIN ng_ev USING (h)),
s6 AS (
  SELECT s5.* FROM s5 LEFT JOIN contam c ON s5.doc_id = c.doc_id
  WHERE s5.doc_id % 10 <> 0 AND c.doc_id IS NULL
),
per_src AS (SELECT source, SUM(tok)::BIGINT AS avail FROM s6 GROUP BY 1),
bb AS (SELECT CAST(FLOOR(SUM(avail) / 2) AS BIGINT) AS budget FROM per_src),
wr AS (
  SELECT source, avail, budget,
         ROW_NUMBER() OVER (ORDER BY avail, source) AS i,
         SUM(avail) OVER (ORDER BY avail, source) AS p,
         COUNT(*) OVER () AS n
  FROM per_src, bb
),
wf AS (
  SELECT source, avail,
         CASE WHEN CAST(budget - (p - avail) AS DOUBLE)
                   / CAST(n - i + 1 AS DOUBLE)
                   <= CAST(avail AS DOUBLE)
              THEN CAST(budget - (p - avail) AS DOUBLE)
                   / CAST(n - i + 1 AS DOUBLE)
         END AS lam
  FROM wr
),
lev AS (SELECT MAX(lam) AS level FROM wf),
caps AS (
  SELECT source, avail,
         CAST(FLOOR(ROUND(CASE WHEN level IS NULL THEN CAST(avail AS DOUBLE)
                    ELSE LEAST(CAST(avail AS DOUBLE), level) END, 4))
              AS BIGINT) AS cap
  FROM wf, lev
),
s7 AS (
  SELECT s6.* FROM s6 JOIN caps c ON s6.source = c.source
  WHERE ('0x' || substr(md5(CAST(s6.doc_id AS VARCHAR)), 1, 15))::BIGINT
          % 1000000
        < CASE WHEN c.avail = 0 THEN 1000000
               ELSE (c.cap * 1000000) // c.avail END
),
pk AS (
  SELECT source, doc_id % 8 AS shard, tok,
         SUM(tok) OVER (PARTITION BY source, doc_id % 8 ORDER BY doc_id)
           - tok AS strt
  FROM s7
),
nseq AS (
  SELECT COUNT(DISTINCT (source, shard, CAST(FLOOR(strt / 256) AS BIGINT)))
           ::BIGINT AS n
  FROM pk
),
c0 AS (SELECT COUNT(*)::BIGINT AS n, COALESCE(SUM(tok), 0)::BIGINT AS t FROM docs0),
c1 AS (SELECT COUNT(*)::BIGINT AS n, COALESCE(SUM(tok), 0)::BIGINT AS t FROM s1),
c2 AS (SELECT COUNT(*)::BIGINT AS n, COALESCE(SUM(tok), 0)::BIGINT AS t FROM s2),
c3 AS (SELECT COUNT(*)::BIGINT AS n, COALESCE(SUM(tok), 0)::BIGINT AS t FROM s3),
c4 AS (SELECT COUNT(*)::BIGINT AS n, COALESCE(SUM(tok), 0)::BIGINT AS t FROM s4),
c5 AS (SELECT COUNT(*)::BIGINT AS n, COALESCE(SUM(tok), 0)::BIGINT AS t FROM s5),
c6 AS (SELECT COUNT(*)::BIGINT AS n, COALESCE(SUM(tok), 0)::BIGINT AS t FROM s6),
c7 AS (SELECT COUNT(*)::BIGINT AS n, COALESCE(SUM(tok), 0)::BIGINT AS t FROM s7)
SELECT CAST(0 AS BIGINT) AS stage, 'input' AS stage_name,
       c0.n AS docs_in, c0.n AS docs_out,
       CAST(0 AS BIGINT) AS docs_dropped, c0.t AS tokens_out FROM c0
UNION ALL SELECT 1, 'quality', c0.n, c1.n, c0.n - c1.n, c1.t FROM c0, c1
UNION ALL SELECT 2, 'lang', c1.n, c2.n, c1.n - c2.n, c2.t FROM c1, c2
UNION ALL SELECT 3, 'exact_dedup', c2.n, c3.n, c2.n - c3.n, c3.t FROM c2, c3
UNION ALL SELECT 4, 'lsh_neardup', c3.n, c4.n, c3.n - c4.n, c4.t FROM c3, c4
UNION ALL SELECT 5, 'semantic_dedup', c4.n, c5.n, c4.n - c5.n, c5.t FROM c4, c5
UNION ALL SELECT 6, 'decontam', c5.n, c6.n, c5.n - c6.n, c6.t FROM c5, c6
UNION ALL SELECT 7, 'budget_sample', c6.n, c7.n, c6.n - c7.n, c7.t FROM c6, c7
UNION ALL SELECT 8, 'pack', c7.n, (SELECT n FROM nseq),
          CAST(0 AS BIGINT), c7.t FROM c7
ORDER BY stage
"""


# ---------------------------------------------------------------------------
# Graph dedup groups, term ranking, and window/semi/anti-join breadth
# ---------------------------------------------------------------------------


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


def dq_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (extension: generalizes the
    reference's dense-key invariant into a composable check family):
    uniqueness, non-null, range, and referential integrity in one
    summary frame."""
    from tmdb_index_spark.operators.checks import (
        check_foreign_key,
        check_non_null,
        check_range,
        check_unique,
        run_checks,
    )

    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    customer = _t(spark, sf_dir, "customer")
    return run_checks(
        [
            check_unique(orders, ["o_orderkey"]),
            check_unique(lineitem, ["l_orderkey", "l_linenumber"]),
            check_non_null(orders, "o_custkey"),
            check_range(lineitem, "l_discount", lo=0.0, hi=1.0),
            check_range(orders, "o_totalprice", lo=0.0),
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
    """HLL sketch family (rows-only check — no oracle by design: HLL
    estimates are engine-private, which is exactly why the EXACT
    profiling path exists for parity and this one for scale). Same
    plan shape as the exact count, no extra shuffle."""
    ev = _events(spark, sf_dir)
    return ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def approx_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch family (rows-only check — approx percentile
    digests are engine-private; the exact twin is
    ``value_percentiles``). One pass, mergeable sketch per group."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], 10_000).alias("q"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "event_type",
        F.col("q")[0].alias("p50"),
        F.col("q")[1].alias("p90"),
        F.col("q")[2].alias("p99"),
        "n",
    )


def customer_first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE window breadth: each customer's first and
    most recent order value over the full-partition frame (values pass
    through untouched — no arithmetic to diverge)."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        orders.select(
            F.col("o_custkey").alias("custkey"),
            F.first_value("o_totalprice").over(w).alias("first_price"),
            F.last_value("o_totalprice").over(w).alias("last_price"),
        )
        .distinct()
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
    subtotal rows."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping_id().cast("long").alias("gid"),
        )
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


_MULTI_GRAIN_SQL = """
SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket,
       COUNT(*)::BIGINT AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 2
UNION ALL
SELECT 'day', date_trunc('day', ts),
       COUNT(*)::BIGINT,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
FROM events GROUP BY 2
UNION ALL
SELECT 'month', date_trunc('month', ts),
       COUNT(*)::BIGINT,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
FROM events GROUP BY 2
"""


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer×orders LEFT OUTER join (join-side
    predicate, not a pre-filter of customers) → per-customer order
    count INCLUDING zeros → histogram of counts. Two aggregations; the
    second one's key (c_count) is tiny-cardinality, so the final
    shuffle moves ~|distinct counts| rows per partition after partial
    aggregation."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


_Q13_SQL = """
SELECT c_count, COUNT(*)::BIGINT AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey)::BIGINT AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q15_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, keep every
    supplier tied at the MAX (scalar-subquery-over-aggregate). The max
    is a 1-row aggregate broadcast against the revenue frame; the tie
    comparison runs on the exact DECIMAL sum, never a double, so
    equality cannot diverge between engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    disc = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(disc).alias("__rev__"))
    mx = rev.agg(F.max("__rev__").alias("__mx__"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("__rev__") == F.col("__mx__"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("__rev__").cast("double").alias("total_revenue"),
        )
    )


_Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE r = (SELECT MAX(r) FROM rev)
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated AVG subquery — revenue from
    lineitems of one brand whose quantity is below 20% of that part's
    average. The brand filter broadcasts FIRST so the per-part stats
    aggregate only brand rows; the threshold test is rewritten to the
    integer-exact form ``5·qty·cnt < sum_qty`` (DECIMAL both sides) so
    no engine ever materializes the float average."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    bl = li.join(
        F.broadcast(brand_parts), li.l_partkey == brand_parts.p_partkey
    ).drop("p_partkey")
    per_part = bl.groupBy("l_partkey").agg(
        F.sum(_dec("l_quantity")).alias("__sumq__"),
        F.count(F.lit(1)).alias("__cnt__"),
    )
    return (
        bl.join(per_part, "l_partkey")
        .filter(
            _dec("l_quantity") * F.lit(5) * F.col("__cnt__")
            < F.col("__sumq__")
        )
        .agg(
            F.round(
                F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 2
            ).alias("avg_yearly")
        )
    )


_Q17_SQL = """
WITH bl AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#1'
),
pp AS (
  SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sumq,
         COUNT(*) AS cnt
  FROM bl GROUP BY l_partkey
)
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2)
         AS avg_yearly
FROM bl JOIN pp USING (l_partkey)
WHERE 5 * CAST(l_quantity AS DECIMAL(18,2)) * cnt < sumq
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING over a fact aggregate (orders whose
    total quantity > 250 — ~top 1%) joined back to orders + broadcast
    customer, deterministic top-20 by (totalprice DESC, orderkey). The
    aggregate-then-join runs co-partitioned on orderkey; the limit
    compiles to TakeOrderedAndProject (per-partition top-k, no global
    sort)."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("__q__"))
        .filter(F.col("__q__") > 250)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("__q__").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


_Q18_SQL = """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(q AS DOUBLE) AS sum_qty
FROM orders JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape ("suppliers who kept orders waiting"): the
    hardest standard join topology — correlated EXISTS and NOT EXISTS
    against two more aliases of the same fact, correlated on orderkey.
    The synthetic lineitem has no receipt/commit dates, so (as in the
    Q4 shape above) ``l_returnflag = 'R'`` stands in for "late".

    A NATION_1 supplier's late line waits iff the order is finalized
    ('F'), some OTHER supplier contributed a line to the same order
    (EXISTS → left-semi), and no other supplier was also late on it
    (NOT EXISTS → left-anti). Both rewritten joins are equi-joins on
    ``l_orderkey`` with the ``<>`` supplier residual attached — so the
    fact shuffles once on orderkey and the semi, anti, and orders
    probes all reuse that partitioning (plan-pinned: no
    BroadcastNestedLoopJoin, no cartesian); supplier and nation
    broadcast.

    The nation predicate is pushed into ``l1`` BEFORE the expensive
    orderkey semi/anti joins via a broadcast left-semi against the
    NATION_1 supplier keys: only ~1/|nations| of late lines flow
    through the heavy stage (the rest could never survive the final
    nation join anyway — at TPC-H ratios that is a ~25× probe-side
    reduction at 100 TB)."""
    li = _t(spark, sf_dir, "lineitem")
    late_cols = ["l_orderkey", "l_suppkey"]
    l2 = li.select(*late_cols).alias("l2")
    l3 = li.filter(F.col("l_returnflag") == "R").select(*late_cols).alias("l3")
    orders_f = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = _t(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_1"
    )
    nation_suppkeys = (
        _t(spark, sf_dir, "supplier")
        .alias("sf")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation").alias("nf")),
            (F.col("sf.s_nationkey") == F.col("nf.n_nationkey"))
            & (F.col("nf.n_name") == "NATION_1"),
        )
        .select(F.col("sf.s_suppkey").alias("__nsk__"))
    )
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(*late_cols)
        .join(
            F.broadcast(nation_suppkeys),
            F.col("l_suppkey") == F.col("__nsk__"),
            "leftsemi",
        )
        .alias("l1")
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "leftsemi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "leftanti",
        )
        .join(orders_f, F.col("l1.l_orderkey") == orders_f.o_orderkey, "leftsemi")
    )
    return (
        waiting.join(F.broadcast(supp), F.col("l1.l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


_Q21_SQL = """
SELECT s_name, COUNT(*)::BIGINT AS numwait
FROM lineitem l1
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_1'
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM orders
              WHERE o_orderkey = l1.l_orderkey AND o_orderstatus = 'F')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: conditional-aggregation ratio — NATION_1's share
    of yearly revenue across all customer nations. Dimension chain
    (customer→nation) broadcasts; the share divides two decimal-exact
    sums cast to double at the very end (identical bits both engines),
    rounded before compare."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    target = F.when(F.col("n_name") == "NATION_1", rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(target).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("mkt_share")
        )
    )


_Q8_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       ROUND(
         CAST(SUM(CASE WHEN n_name = 'NATION_1'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),
         6) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY 1
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape ("minimum cost supplier"): a correlated scalar
    MIN subquery over the part-supplier relation, re-expressed as a
    window MIN so the relation is scanned once. The synthetic schema
    has no ``partsupp`` table (TESTDATA.md), so it is derived from
    lineitem — ``supplycost = MIN(l_extendedprice / l_quantity)`` per
    (part, supplier), the same stand-in family as the Q4/Q21 shapes'
    returnflag dates. Region-filtered suppliers (EUROPE) restrict the
    relation BEFORE the per-part MIN, exactly like the correlated
    subquery in the spec (tpch q2: ps_supplycost = (SELECT MIN ...
    WHERE r_name = '...')). supplier/nation/region/part are all
    dimension-sized and broadcast; the only shuffle is the derived
    relation's groupBy — at 100 TB the window MIN re-uses that
    partitioning (partkey ⊂ grouping keys)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") < 15) & (F.col("p_type") == "ECONOMY")
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    ps = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
        )
    )
    # Region filter BEFORE the per-part MIN (the correlation domain).
    ps_eu = (
        ps.join(F.broadcast(supp), ps.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    w = Window.partitionBy("l_partkey")
    return (
        ps_eu.withColumn("min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select(
            F.col("s_acctbal"),
            F.col("s_name"),
            F.col("n_name"),
            F.col("p_partkey"),
            F.round(F.col("cost"), 2).alias("supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(100)
    )


_Q2_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY 1, 2
),
ps_eu AS (
  SELECT ps.*, s_acctbal, s_name, n_name
  FROM ps
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, ROUND(cost, 2) AS supplycost
FROM (
  SELECT *, MIN(cost) OVER (PARTITION BY l_partkey) AS min_cost FROM ps_eu
)
JOIN part ON l_partkey = p_partkey AND p_size < 15 AND p_type = 'ECONOMY'
WHERE cost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape ("product type profit measure"): profit per
    supplier-nation per year over a name-substring part filter. With
    no ``partsupp.ps_supplycost`` in the synthetic schema, unit cost
    is the deterministic stand-in ``ROUND(0.5 * p_retailprice, 2)``
    (both engines compute the identical double product and half-even
    round before the decimal cast). Every term is exact DECIMAL(18,2)
    two-factor arithmetic — the same discipline as the Q1/Q8 shapes —
    summed exactly and cast to double only at the end. part is
    broadcast (it is the filter dim); lineitem→orders is the one
    co-partitioned fact join; supplier/nation broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    cost = F.round(F.col("p_retailprice") * F.lit(0.5), 2).cast(
        "decimal(18,2)"
    ) * _dec("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(F.sum(revenue - cost).cast("double"), 2).alias("sum_profit")
        )
    )


_Q9_SQL = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       ROUND(CAST(SUM(
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
         - CAST(ROUND(0.5 * p_retailprice, 2) AS DECIMAL(18,2))
           * CAST(l_quantity AS DECIMAL(18,2))
       ) AS DOUBLE), 2) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%widget%'
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape ("important stock identification"): per-part
    value with a HAVING threshold computed from the GLOBAL total of
    the same relation — the scalar-subquery-in-HAVING topology. The
    part-supplier value is derived from lineitem (no partsupp table):
    ``value = SUM(l_extendedprice)`` over lines from EUROPE suppliers.
    The global total is a 1-row aggregate broadcast to the per-part
    side (plan-pinned like the Q15 MAX); the threshold keeps the
    spec's scale-invariance (tpch scales its fraction by 1/SF) by
    selecting parts above the MEAN share — written multiplicatively,
    ``value * n_parts > total``, so the compare is exact
    decimal-times-integer with no division rounding. At 100 TB the
    relation aggregates once, and the total re-aggregates the (tiny,
    |parts|-sized) per-part output — no second fact scan."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_lines = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    per_part = eu_lines.groupBy("l_partkey").agg(
        F.sum(_dec("l_extendedprice")).alias("value_dec")
    )
    total = per_part.agg(
        F.sum("value_dec").alias("total_dec"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_dec") * F.col("n_parts") > F.col("total_dec"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("value_dec").cast("double"), 2).alias("value"),
        )
    )


_Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS value_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
  GROUP BY 1
)
SELECT l_partkey AS p_partkey,
       ROUND(CAST(value_dec AS DOUBLE), 2) AS value
FROM per_part
WHERE value_dec * (SELECT COUNT(*) FROM per_part)
      > (SELECT SUM(value_dec) FROM per_part)
"""


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape ("shipping modes and order priority"):
    conditional CASE counts of urgent vs non-urgent orders per line
    class over a one-year shipdate window. The synthetic lineitem has
    no ``l_shipmode`` (TESTDATA.md), so ``l_returnflag`` plays the
    mode column, the same stand-in as the Q4/Q21 shapes. Both the
    range predicate and the IN-list reach the parquet scan
    (plan-pinned); the orders side projects only (o_orderkey,
    o_orderpriority) so the fact join carries two columns."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_returnflag").isin("A", "N"))
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )


_Q12_SQL = """
SELECT l_returnflag AS ship_class,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_returnflag IN ('A', 'N')
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
"""


def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape ("parts/supplier relationship"): COUNT(DISTINCT
    supplier) per (brand, type, size) bucket with a NOT-IN supplier
    exclusion. The part-supplier relation is the DISTINCT
    (l_partkey, l_suppkey) projection of lineitem (no partsupp
    table); the spec's "complaints" name-pattern exclusion becomes
    the deterministic stand-in ``s_suppkey % 4 = 0`` (documented;
    both engines evaluate the identical modulus), rewritten NOT-IN →
    left-anti against the dimension-sized supplier list. The distinct
    projection and the count-distinct both partial-aggregate map-side;
    part is broadcast."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(9, 10, 16, 24, 29))
    )
    complaints = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 4 == 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(complaints),
            li.l_suppkey == complaints.s_suppkey,
            "leftanti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (9, 10, 16, 24, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_suppkey % 4 = 0)
GROUP BY 1, 2, 3
"""


def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape ("potential part promotion"): nested
    IN-subqueries — suppliers IN (part-supplier pairs whose stock
    exceeds half of a correlated period aggregate, for parts IN a
    name-pattern list) — rewritten as a left-semi join chain. The
    spec's ``ps_availqty`` has no synthetic column, so stock is the
    prior-year shipment volume: both the 1996 "stock" and the 1997
    "demand" aggregates come from ONE conditional-aggregation pass
    over lineitem (a single fact scan — plan-pinned), compared
    exactly in DECIMAL; a NULL 1997 aggregate excludes the pair in
    both engines (NULL comparison). part is broadcast into the semi
    join; the supplier output joins dimension-sized nation/region
    (ASIA) broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("bolt"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    yr = F.year("l_shipdate")
    ps = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.when(yr == 1996, _dec("l_quantity"))).alias("stock_qty"),
        F.sum(F.when(yr == 1997, _dec("l_quantity"))).alias("demand_qty"),
    )
    flagged = (
        ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey, "leftsemi")
        .filter(
            F.col("stock_qty")
            > F.col("demand_qty") * F.lit(0.5).cast("decimal(2,1)")
        )
        .select("l_suppkey")
    )
    return (
        supp.join(flagged, supp.s_suppkey == flagged.l_suppkey, "leftsemi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


_Q20_SQL = """
WITH ps AS (
  SELECT l_suppkey, l_partkey,
         SUM(CASE WHEN year(l_shipdate) = 1996
                  THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS stock_qty,
         SUM(CASE WHEN year(l_shipdate) = 1997
                  THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS demand_qty
  FROM lineitem GROUP BY 1, 2
)
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
WHERE s_suppkey IN (
  SELECT l_suppkey FROM ps
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
    AND stock_qty > demand_qty * CAST(0.5 AS DECIMAL(2,1))
)
ORDER BY s_name
"""


def dup_span_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span fraction (extension: text
    analysis / corpus curation — the Gopher/RefinedWeb "fraction of
    text in duplicated n-grams" signal). Word-3-gram spans so the
    oracle reuses the shared shingle CTE; within-doc repetition is the
    separate ``repetition_quality`` query — this one scores corpus-wide
    boilerplate."""
    from tmdb_index_spark.operators.llm_prep import dup_span_fraction

    return dup_span_fraction(_t(spark, sf_dir, "documents"), n=3)


_DUP_SPAN_SQL = (
    _DUCK_SHINGLES
    + """, ex AS (
  SELECT doc_id, UNNEST(shs) AS s FROM sh
), sdf AS (
  SELECT s, COUNT(*) AS df FROM ex GROUP BY 1
), per AS (
  SELECT doc_id, COUNT(*) AS n_spans,
         SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS dup_spans
  FROM ex JOIN sdf USING (s) GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(per.n_spans, 0)::BIGINT AS n_spans,
       COALESCE(per.dup_spans, 0)::BIGINT AS dup_spans,
       ROUND(per.dup_spans * 1.0 / per.n_spans, 4) AS dup_frac
FROM documents d LEFT JOIN per USING (doc_id)
"""
)


#: Mixture weights for the catalog query: a 3-source mixture over the
#: 20 synthetic sources (unlisted sources get rate 0 — the operator's
#: contract), with a fixed char budget so per-source rates stay < 1 at
#: every SF.
_MIXTURE_WEIGHTS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
_MIXTURE_BUDGET = 5000.0


def mixture_token_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture sampling (extension: training-data mixing):
    deterministically sample each source at the rate that lands its
    weighted share of a global char budget — the data-mixing step
    between curation and tokenization. Hash-bucket membership, so the
    same rows are kept on any engine/partitioning/rerun."""
    from tmdb_index_spark.operators.sampling import mixture_sample

    return mixture_sample(
        _t(spark, sf_dir, "documents"),
        source_col="source",
        cost_col="n_chars",
        key="doc_id",
        weights=_MIXTURE_WEIGHTS,
        budget=_MIXTURE_BUDGET,
    ).select("doc_id", "source", "n_chars")


_MIXTURE_SQL = """
WITH totals AS (
  SELECT source, SUM(CAST(n_chars AS DOUBLE)) AS tot
  FROM documents GROUP BY 1
),
rates AS (
  SELECT source,
         CAST(FLOOR(LEAST(1.0,
           5000.0 * (CASE source WHEN 'src0' THEN 0.5
                                 WHEN 'src1' THEN 0.3
                                 WHEN 'src2' THEN 0.2
                                 ELSE 0.0 END) / tot) * 10000) AS BIGINT)
           AS keep
  FROM totals
)
SELECT doc_id, source, n_chars
FROM documents JOIN rates USING (source)
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000
      < keep
"""


def mixture_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling token-budget allocation (extension: the mixture-
    PLANNING complement of `mixture_token_sample` — before sampling,
    decide how many tokens each source contributes to a global budget
    when shares are even but small sources cap out and re-flood their
    surplus): per-source token totals feed
    `operators/sampling.py: waterfill_allocation`'s closed form over
    the sorted availability profile (first row where
    ``(B - P_{i-1}) / (n - i + 1) <= A_i`` sets the water level; no
    iteration). Budget = half the corpus's tokens (integer division,
    data-derived on both engines identically). Every window runs over
    the source-bounded frame, totally ordered by (avail, source); all
    inputs are exact integers so the one division reproduces
    bit-for-bit cross-engine."""
    from tmdb_index_spark.functions.text import token_count
    from tmdb_index_spark.operators.sampling import waterfill_allocation

    d = _t(spark, sf_dir, "documents")
    per_src = d.select(
        "source", token_count("text").cast("bigint").alias("__tok__")
    ).groupBy("source").agg(F.sum("__tok__").alias("avail_tokens"))
    # FLOOR on both engines: Spark CASTs double->bigint by truncation
    # but DuckDB CAST rounds, so an odd total would diverge without it
    budget = per_src.agg(
        F.floor(F.sum("avail_tokens") / F.lit(2))
        .cast("bigint")
        .alias("__budget__")
    )
    frame = per_src.crossJoin(F.broadcast(budget))
    return waterfill_allocation(
        frame, "avail_tokens", "__budget__", "source"
    )


_WATERFILL_SQL = """
WITH per_src AS (
  SELECT source,
         SUM(len(regexp_extract_all(text,
             '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))::BIGINT) AS avail
  FROM documents GROUP BY source
),
b AS (SELECT CAST(FLOOR(SUM(avail) / 2) AS BIGINT) AS budget FROM per_src),
ranked AS (
  SELECT source, avail, budget,
         ROW_NUMBER() OVER (ORDER BY avail, source) AS i,
         SUM(avail) OVER (ORDER BY avail, source) AS p,
         COUNT(*) OVER () AS n
  FROM per_src, b
),
flagged AS (
  SELECT source, avail,
         CASE WHEN CAST(budget - (p - avail) AS DOUBLE)
                   / CAST(n - i + 1 AS DOUBLE)
                   <= CAST(avail AS DOUBLE)
              THEN CAST(budget - (p - avail) AS DOUBLE)
                   / CAST(n - i + 1 AS DOUBLE)
         END AS lam
  FROM ranked
),
lev AS (SELECT MAX(lam) AS level FROM flagged)
SELECT source,
       CAST(avail AS BIGINT) AS avail_tokens,
       ROUND(CASE WHEN level IS NULL THEN CAST(avail AS DOUBLE)
                  ELSE LEAST(CAST(avail AS DOUBLE), level) END, 4)
         AS allocation,
       CASE WHEN level IS NULL THEN TRUE
            ELSE CAST(avail AS DOUBLE) <= level END AS capped,
       ROUND(level, 4) AS water_level
FROM flagged, lev
"""


def embedding_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric ANN join (extension: similarity search): top-3 corpus
    neighbors for the label-0 query subset via the bucketed
    :func:`~tmdb_index_spark.operators.similarity.lsh_knn_join` — the
    "label a query set against a big index" shape. Query side
    multi-probes its 1-bit-flip buckets and broadcasts; the corpus
    never shuffles (plan-pinned)."""
    from tmdb_index_spark.operators.similarity import lsh_knn_join

    emb = _t(spark, sf_dir, "embeddings")
    return lsh_knn_join(
        corpus=emb,
        queries=emb.filter(F.col("label") == 0),
        k=3,
        n_bits=8,
        multi_probe=True,
        exclude_self=True,
    )


_KNN_JOIN_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (
  SELECT vec_id, v,
         list_sum(list_transform(generate_series(0, 7),
           i -> CASE WHEN v[i+1] >= 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END))
           AS bucket
  FROM v
),
q AS (
  SELECT b.vec_id, b.v, b.bucket
  FROM b JOIN embeddings e ON b.vec_id = e.vec_id
  WHERE e.label = 0
),
qp AS (
  SELECT DISTINCT vec_id, v, xor(bucket, m.mask) AS bucket
  FROM q, (SELECT UNNEST([0, 1, 2, 4, 8, 16, 32, 64, 128]) AS mask) m
),
scored AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_COS_SQL} AS cos_sim
  FROM qp q JOIN b c ON q.bucket = c.bucket
  WHERE q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC)::BIGINT
              AS rank
  FROM scored
) WHERE rank <= 3
"""


def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation: revenue and line counts at every grain of
    (returnflag × linestatus) — both axes, each alone, and the grand
    total — in ONE pass with ``grouping_id`` disambiguating the
    subtotal rows from genuine NULL groups. Complements the
    ``rollup_revenue`` hierarchy: CUBE is the cross-grain topology
    (2^k grouping sets). Spark expands the cube BEFORE the exchange,
    so each of the 4 grouping sets partial-aggregates map-side and one
    shuffle carries all grains — at 100 TB this beats 4 separate
    scans 4:1 on I/O."""
    li = _t(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "revenue", "n_lines")
    )


_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2))
                         - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2)
         AS revenue,
       COUNT(*)::BIGINT AS n_lines
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel (view -> click -> purchase): users counted
    at each stage only when the stage's FIRST qualifying event strictly
    follows the previous stage's — the product-analytics sequence-match
    pattern, not independent event counts. Expressed as cascaded window
    minimums over ONE user-partitioned pass: the fact is scanned once
    and shuffled once on ``user_id``; all three stage thresholds
    evaluate inside that single window partitioning (the per-stage
    aggregate-and-join formulation the oracle uses would scan the fact
    three times), then a per-user fold produces the three global stage
    counts. Plan-pinned: one events FileScan, no join at all."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    typ, ts = F.col("event_type"), F.col("ts")
    staged = (
        ev.withColumn("t_view", F.min(F.when(typ == "view", ts)).over(w))
        .withColumn(
            "t_click",
            F.min(
                F.when((typ == "click") & (ts > F.col("t_view")), ts)
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when((typ == "purchase") & (ts > F.col("t_click")), ts)
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("t_view").cast("bigint").alias("n_viewed"),
        F.count("t_click").cast("bigint").alias("n_clicked_after"),
        F.count("t_purchase").cast("bigint").alias("n_purchased_after"),
    )


_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1
)
SELECT (SELECT COUNT(*) FROM v)::BIGINT AS n_viewed,
       (SELECT COUNT(*) FROM c)::BIGINT AS n_clicked_after,
       (SELECT COUNT(*) FROM p)::BIGINT AS n_purchased_after
"""


def weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-seen week
    (cohort) × week of activity, counting distinct active users per
    cell — the classic growth-analytics triangle. Week index is days
    since the corpus epoch ÷ 7 (integer), identical arithmetic in both
    engines. Two keyed aggregations (per-user first week, then the
    cohort cell counts) plus a user-keyed join — no window over the
    whole fact, nothing quadratic. (On the synthetic events table most
    users are active from week 0, so cohort 0 dominates the matrix —
    the SHAPE under test is the cohort topology, which fills out on
    real arrival-distributed data.)"""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.floor(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) / 7
        ).cast("bigint").alias("week"),
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(first, "user_id")
        .groupBy("cohort_week", F.col("week").alias("active_week"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    )


_RETENTION_SQL = """
WITH ev AS (
  SELECT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS week
  FROM events
),
first AS (
  SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY 1
)
SELECT cohort_week, ev.week AS active_week,
       COUNT(DISTINCT ev.user_id)::BIGINT AS n_users
FROM ev JOIN first ON ev.user_id = first.user_id
GROUP BY 1, 2
"""


def weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (extension:
    corpus curation): 3 docs per source, selection probability
    proportional to ``n_chars``, via the Efraimidis–Spirakis hash key
    (:func:`~tmdb_index_spark.operators.sampling.weighted_sample`).
    The oracle reproduces the identical ``ln(u)/w`` keys from the same
    md5-derived uniforms."""
    from tmdb_index_spark.operators.sampling import weighted_sample

    return weighted_sample(
        _t(spark, sf_dir, "documents"),
        key="doc_id",
        weight_col="n_chars",
        k=3,
        group_col="source",
    ).select("doc_id", "source", "n_chars")


_WEIGHTED_SAMPLE_SQL = """
WITH w AS (
  SELECT doc_id, source, n_chars,
         ln(((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 1000000) + 0.5) / 1000000.0)
           / CAST(n_chars AS DOUBLE) AS skey
  FROM documents
)
SELECT doc_id, source, n_chars FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                               ORDER BY skey DESC, doc_id ASC) AS rn
  FROM w
) WHERE rn <= 3
"""


def trade_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (2 unrolled iterations) over the
    symmetrized customer↔supplier trade graph (distinct pairs from
    orders⋈lineitem; supplier node ids offset by 10^6). Extension:
    iterative graph algorithms as static dataflow — exact integer
    (ppm) arithmetic makes the ranks bit-identical across engines,
    so unlike a float PageRank this one carries a full value oracle
    (:func:`~tmdb_index_spark.operators.graph.pagerank_fixed_point`)."""
    from tmdb_index_spark.operators.graph import pagerank_fixed_point

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    rel = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("cust"),
            (F.col("l_suppkey") + F.lit(1_000_000)).alias("supp"),
        )
        .distinct()
    )
    edges = rel.select(
        F.col("cust").alias("src"), F.col("supp").alias("dst")
    ).union(rel.select(F.col("supp").alias("src"), F.col("cust").alias("dst")))
    return pagerank_fixed_point(edges, iterations=2)


_PAGERANK_SQL = """
WITH rel AS (
  SELECT DISTINCT o_custkey AS cust, l_suppkey + 1000000 AS supp
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
e AS (
  SELECT cust AS src, supp AS dst FROM rel
  UNION ALL
  SELECT supp AS src, cust AS dst FROM rel
),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
r0 AS (SELECT node, 1000000::BIGINT AS rank_ppm FROM nodes),
c1 AS (
  SELECT e.dst AS node, SUM(r0.rank_ppm // deg.d) AS s
  FROM e JOIN r0 ON e.src = r0.node JOIN deg ON e.src = deg.src
  GROUP BY 1
),
r1 AS (
  SELECT n.node,
         (150000 + (850000 * COALESCE(c1.s, 0)) // 1000000)::BIGINT AS rank_ppm
  FROM nodes n LEFT JOIN c1 ON n.node = c1.node
),
c2 AS (
  SELECT e.dst AS node, SUM(r1.rank_ppm // deg.d) AS s
  FROM e JOIN r1 ON e.src = r1.node JOIN deg ON e.src = deg.src
  GROUP BY 1
)
SELECT n.node,
       (150000 + (850000 * COALESCE(c2.s, 0)) // 1000000)::BIGINT AS rank_ppm
FROM nodes n LEFT JOIN c2 ON n.node = c2.node
"""


def source_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-source outlier detection (extension: corpus curation
    quality filter): documents whose length deviates from their
    source's MEDIAN by more than 2.5× the source's MAD (median absolute
    deviation) — the standard robust alternative to mean/stddev, which
    a single giant document would drag. Two grouped exact-percentile
    aggregations (median, then MAD of residuals) plus a broadcast join
    of the |sources|-sized stats back onto the corpus; the corpus
    itself never shuffles. Exact interpolated percentiles compute
    identically in both engines (ints averaged in IEEE doubles).
    Sources whose MAD is 0 (degenerate constant-length) flag nothing —
    the explicit ``mad > 0`` guard both engines share."""
    docs = _t(spark, sf_dir, "documents")
    med = docs.groupBy("source").agg(
        F.expr("percentile(n_chars, 0.5)").alias("med")
    )
    resid = docs.join(F.broadcast(med), "source").select(
        "source",
        "doc_id",
        "n_chars",
        F.abs(F.col("n_chars") - F.col("med")).alias("__r__"),
        "med",
    )
    mad = resid.groupBy("source").agg(
        F.expr("percentile(__r__, 0.5)").alias("mad")
    )
    return (
        resid.join(F.broadcast(mad), "source")
        .filter(
            (F.col("mad") > 0)
            & (F.abs(F.col("n_chars") - F.col("med"))
               > F.lit(2.5) * F.col("mad"))
        )
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.round(
                F.abs(F.col("n_chars") - F.col("med")) / F.col("mad"), 4
            ).alias("robust_z"),
        )
    )


_OUTLIER_SQL = """
WITH med AS (
  SELECT source, quantile_cont(n_chars, 0.5) AS med
  FROM documents GROUP BY 1
),
resid AS (
  SELECT d.source, d.doc_id, d.n_chars, ABS(d.n_chars - med.med) AS r, med.med
  FROM documents d JOIN med ON d.source = med.source
),
mad AS (
  SELECT source, quantile_cont(r, 0.5) AS mad FROM resid GROUP BY 1
)
SELECT resid.doc_id, resid.source, resid.n_chars::BIGINT AS n_chars,
       ROUND(ABS(resid.n_chars - resid.med) / mad.mad, 4) AS robust_z
FROM resid JOIN mad ON resid.source = mad.source
WHERE mad.mad > 0
  AND ABS(resid.n_chars - resid.med) > 2.5 * mad.mad
"""


def user_state_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history of each user's event
    state: one row per RUN of consecutive identical ``event_type``
    values, with [valid_from, valid_to) validity, per-user version
    number, and an is_current flag on the open version. The reference
    keeps only latest state (keep-last upsert, tmdb_index.py:330-366);
    this is the full-history complement
    (:func:`~tmdb_index_spark.operators.temporal.scd2_build`). One
    shuffle on user_id; run detection, versioning, and the validity
    lead() all execute inside that partitioning."""
    from tmdb_index_spark.operators.temporal import scd2_build

    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    hist = scd2_build(ev, "user_id", "ts", "event_type", tiebreak="event_id")
    return hist.select(
        "user_id",
        F.col("event_type").alias("state"),
        "valid_from",
        "valid_to",
        F.col("version").cast("bigint").alias("version"),
        "is_current",
    )


_SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type IS DISTINCT FROM
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
              THEN 1 ELSE 0 END AS chg
  FROM events
),
runs AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS run
  FROM ordered
),
versions AS (
  SELECT user_id, run, MIN(event_type) AS state, MIN(ts) AS valid_from
  FROM runs GROUP BY 1, 2
)
-- valid_to casts to TIMESTAMP_NS: pandas tolerates a ns/us unit gap
-- on dense datetime series but not on ones containing NaT (the open
-- versions), so the NULLABLE column is pinned to Spark's ns unit.
SELECT user_id, state, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, run)
         ::TIMESTAMP_NS AS valid_to,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY valid_from, run)::BIGINT
         AS version,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, run)
         IS NULL AS is_current
FROM versions
"""


def supplier_busy_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval merge (gaps-and-islands over spans): each lineitem
    opens a 7-day busy window [shipdate, shipdate+7d) for its
    supplier; overlapping/touching windows merge into islands
    (:func:`~tmdb_index_spark.operators.temporal.merge_intervals`).
    Output per supplier: island count, source-interval count, and
    total busy seconds — exact integers via epoch arithmetic so the
    cross-engine compare is bit-exact. Both windows and both
    aggregations share the single l_suppkey shuffle."""
    from tmdb_index_spark.operators.temporal import merge_intervals

    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.col("l_shipdate").alias("start_ts"),
        (F.col("l_shipdate") + F.expr("INTERVAL 7 DAYS")).alias("end_ts"),
    )
    islands = merge_intervals(li, "l_suppkey", "start_ts", "end_ts")
    return islands.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum("n_merged").cast("bigint").alias("n_intervals"),
        F.sum(
            F.unix_timestamp("island_end") - F.unix_timestamp("island_start")
        ).cast("bigint").alias("busy_seconds"),
    )


# Duplicate spans (two same-day shipments of one supplier) are
# pre-aggregated in `iv` so (start_ts, end_ts) is a TOTAL order per
# supplier: the two stacked window passes (brk, running SUM(brk))
# would otherwise see DuckDB's parallel sort break ties differently
# per pass and assign a duplicate to the wrong island (caught at
# sf0.1: 3/1000 suppliers, busy_seconds inflated 8-9 days while
# single-threaded DuckDB equals Spark exactly). mult carries the
# collapsed multiplicity back into n_intervals.
_BUSY_INTERVALS_SQL = """
WITH iv AS (
  SELECT l_suppkey, l_shipdate AS start_ts,
         l_shipdate + INTERVAL 7 DAY AS end_ts,
         COUNT(*) AS mult
  FROM lineitem
  GROUP BY 1, 2, 3
),
flagged AS (
  SELECT l_suppkey, start_ts, end_ts, mult,
         CASE WHEN MAX(end_ts) OVER (PARTITION BY l_suppkey
                                     ORDER BY start_ts, end_ts
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING) IS NULL
                OR start_ts > MAX(end_ts) OVER (PARTITION BY l_suppkey
                                                ORDER BY start_ts, end_ts
                                                ROWS BETWEEN UNBOUNDED PRECEDING
                                                         AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS brk
  FROM iv
),
islands AS (
  SELECT l_suppkey, start_ts, end_ts, mult,
         SUM(brk) OVER (PARTITION BY l_suppkey ORDER BY start_ts, end_ts
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
),
merged AS (
  SELECT l_suppkey, island, MIN(start_ts) AS island_start,
         MAX(end_ts) AS island_end, SUM(mult) AS n_merged
  FROM islands GROUP BY 1, 2
)
SELECT l_suppkey, COUNT(*)::BIGINT AS n_islands,
       SUM(n_merged)::BIGINT AS n_intervals,
       SUM(epoch(island_end) - epoch(island_start))::BIGINT AS busy_seconds
FROM merged GROUP BY 1
"""


def cosupply_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the supplier co-supply graph (suppliers are
    adjacent when they ship lines of the same order) via
    degree-ordered edge orientation
    (:func:`~tmdb_index_spark.operators.graph.triangle_count`) — the
    MapReduce-standard O(m^1.5) algorithm whose wedge fan-out is
    capped by orientation even on power-law hubs. The oracle counts
    the same triangles with the naive u<v<w three-way self-join;
    orientation changes the join sizes, never the count.

    Edges require a low-quantity line (l_quantity <= 5): the
    UNfiltered co-supply graph on uniform TPC-H data is near-COMPLETE
    (avg degree ~1000 at sf0.1), and a near-complete graph has Th(n^3)
    triangles no algorithm can count faster than their own number
    (measured 50 s at sf0.1; the next decade is hopeless by
    construction, not by plan). The filter keeps qualifying per-order
    line multiplicity — and so graph density — SF-invariant (~0.4
    lines/order), so edges grow ~linearly with scale (sf0.01: 1013
    edges / 1435 triangles; sf0.1: 11.9k / 3696) and the O(m^1.5)
    bound stays meaningful. Real co-occurrence graphs are sparse for
    the same reason: bounded basket size."""
    from tmdb_index_spark.operators.graph import triangle_count

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") <= 5)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    edges = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_suppkey") < F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
    )
    return triangle_count(edges)


_TRIANGLES_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
            WHERE l_quantity <= 5),
e AS (
  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey < b.l_suppkey
),
nodes AS (
  SELECT u AS node FROM e UNION SELECT v FROM e
),
t AS (
  SELECT COUNT(*)::BIGINT AS n_triangles
  FROM e e1
  JOIN e e2 ON e2.u = e1.v
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT (SELECT COUNT(*) FROM nodes)::BIGINT AS n_nodes,
       (SELECT COUNT(*) FROM e)::BIGINT AS n_edges,
       t.n_triangles
FROM t
"""


def source_capped_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-cap sampling (C4/RefinedWeb style): keep at most 20
    documents per source, membership decided by portable-hash rank
    over doc_id
    (:func:`~tmdb_index_spark.operators.sampling.cap_per_group`) so
    the kept set is a pure function of (doc_id, source) — stable
    across engines, reruns, and data added to other sources. Returns
    the kept rows themselves; the oracle re-derives membership from
    the same md5 rank."""
    from tmdb_index_spark.operators.sampling import cap_per_group

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return cap_per_group(docs, "doc_id", "source", cap=20)


_SOURCE_CAP_SQL = """
WITH r AS (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT ASC,
                    doc_id ASC) AS rn
  FROM documents
)
SELECT doc_id, source, n_chars FROM r WHERE rn <= 20
"""


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level edit-distance-1 fuzzy join via SymSpell deletion
    neighborhoods
    (:func:`~tmdb_index_spark.operators.dedup_text.token_edit1_pairs`):
    part names within one token insert/delete/substitute of each
    other, found by exact equi-joins on deletion variants — O(N·L)
    keys, never an all-pairs comparison. Scoped to one brand: TPC-H
    part names (5 words from a ~90-word palette) are so dense that
    the full-table edit-1 graph at sf0.01 already has 437k edges —
    the scoping keeps the oracle row set discriminating, the operator
    itself is the scale path."""
    from tmdb_index_spark.operators.dedup_text import token_edit1_pairs

    parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#11")
        .select("p_partkey", "p_name")
    )
    return token_edit1_pairs(parts, id_col="p_partkey", text_col="p_name")


_FUZZY_NAME_SQL = """
WITH toks AS (
  SELECT p_partkey AS id, string_split(p_name, ' ') AS t, p_name AS s
  FROM part WHERE p_brand = 'Brand#11'
    AND len(string_split(p_name, ' ')) >= 2
),
vars AS (
  SELECT id, t, s, i AS pos,
         array_to_string(list_concat(t[1:i-1], t[i+1:len(t)]), ' ') AS v
  FROM toks, LATERAL UNNEST(generate_series(1, len(t))) AS u(i)
),
indel AS (
  SELECT LEAST(a.id, b.id) AS id_a, GREATEST(a.id, b.id) AS id_b,
         'indel' AS match_kind
  FROM vars a JOIN toks b ON a.v = b.s
),
sub AS (
  SELECT a.id AS id_a, b.id AS id_b, 'substitute' AS match_kind
  FROM vars a JOIN vars b
    ON a.v = b.v AND a.pos = b.pos AND a.id < b.id
  WHERE len(a.t) = len(b.t)
    AND len(list_filter(range(1, len(a.t)+1),
                        j -> a.t[j] IS DISTINCT FROM b.t[j])) = 1
)
SELECT DISTINCT id_a, id_b, match_kind FROM (
  SELECT * FROM indel UNION ALL SELECT * FROM sub
)
"""


def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical top-20 and exact-cosine vector
    top-20 (query = embedding 0) fused by reciprocal-rank fusion
    (:func:`~tmdb_index_spark.operators.ranking.rrf_fuse`), final
    top-10 by fused score. The fusion layer moves only the two top-k
    legs (≤40 rows here, ≤|legs|·k always) — the engine cost stays in
    the legs, which is why RRF is the hybrid-search standard: no score
    calibration across incomparable scales, rank-only arithmetic,
    bit-stable across engines."""
    from tmdb_index_spark.operators.ranking import bm25_topk, rrf_fuse
    from tmdb_index_spark.operators.similarity import brute_force_topk

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, _BM25_TERMS, k=20).select("doc_id", "rank")
    sem = brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=20).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )
    fused = rrf_fuse({"lex": lex, "sem": sem})
    return (
        fused.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
        .limit(10)
        .select("doc_id", "lex_rank", "sem_rank", "rrf_score")
    )


_HYBRID_RRF_SQL = f"""
WITH lex AS (
  SELECT doc_id, rank FROM ({_BM25_SQL})
),
v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sem_scored AS (
  SELECT c.vec_id AS doc_id, {_COS_SQL} AS cos_sim
  FROM (SELECT * FROM v WHERE vec_id = 0) q
  CROSS JOIN v c
  WHERE c.vec_id <> 0
),
sem AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id ASC)
             ::BIGINT AS rank
    FROM sem_scored
  ) WHERE rank <= 20
),
tagged AS (
  SELECT doc_id, 'lex' AS leg, rank FROM lex
  UNION ALL
  SELECT doc_id, 'sem' AS leg, rank FROM sem
),
fused AS (
  SELECT doc_id,
         SUM(1.0 / (60.0 + rank)) AS rrf_score,
         MAX(CASE WHEN leg = 'lex' THEN rank END) AS lex_rank,
         MAX(CASE WHEN leg = 'sem' THEN rank END) AS sem_rank
  FROM tagged GROUP BY doc_id
)
SELECT doc_id, lex_rank, sem_rank, rrf_score
FROM fused ORDER BY rrf_score DESC, doc_id ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------


def _self_configuring(fn: QueryFn) -> QueryFn:
    """The driver runs these callables with ITS OWN SparkSession, whose
    confs we don't control. Timestamp collection is timezone-sensitive —
    a non-UTC session shifts values against the (UTC-naive) DuckDB
    oracle — so every query pins the runtime-settable confs it needs
    before building its plan."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped

def dedup_segments_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact segment dedup WITH reassembly (extension:
    the removal counterpart of `dup_span_quality`'s signal): documents
    split into 16-token segments, corpus-wide first occurrence of each
    distinct segment kept (first = smallest (doc_id, seg_id)), docs
    rebuilt from their surviving segments
    (:func:`~tmdb_index_spark.operators.llm_prep.remove_duplicate_segments`).
    Two narrow shuffles (segment-hash election, doc reassembly) — the
    C4-style "keep one copy of boilerplate" cleaning step."""
    from tmdb_index_spark.operators.llm_prep import remove_duplicate_segments

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return remove_duplicate_segments(docs, seg_tokens=16)


_SEG_DEDUP_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(
           regexp_split_to_array(trim(coalesce(text, '')), '\\s+'),
           x -> x <> ''
         ) AS ts
  FROM documents
),
seg AS (
  SELECT doc_id, ts,
         unnest(range(1, len(ts) + 1, 16)) AS strt
  FROM t WHERE len(ts) > 0
),
hashed AS (
  SELECT doc_id,
         ((strt - 1) // 16)::BIGINT AS seg_id,
         array_to_string(ts[strt:strt + 15], ' ') AS seg_text,
         ('0x' || substr(md5(array_to_string(ts[strt:strt + 15], ' ')), 1, 15))::BIGINT AS h
  FROM seg
),
marked AS (
  SELECT doc_id, seg_id, seg_text,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, seg_id) = 1 AS kept
  FROM hashed
)
SELECT doc_id,
       COUNT(*)::BIGINT AS n_segments,
       COALESCE(SUM(CASE WHEN kept THEN 1 ELSE 0 END), 0)::BIGINT AS kept_segments,
       COALESCE(string_agg(seg_text, ' ' ORDER BY seg_id) FILTER (WHERE kept), '') AS text_dedup
FROM marked
GROUP BY doc_id
"""


def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per event day (extension:
    moving-frame COUNT(DISTINCT), which no built-in window frame
    expresses —
    :func:`~tmdb_index_spark.operators.temporal.sliding_window_distinct`).
    Collapses to distinct (user, day) first, then a bounded 7-way
    Generate per pair — blow-up is exactly the window length, never a
    calendar join."""
    from tmdb_index_spark.operators.temporal import sliding_window_distinct

    ev = _events(spark, sf_dir).select("user_id", "ts")
    out = sliding_window_distinct(
        ev, ts_col="ts", key_col="user_id", window_days=7
    )
    # timestamp day for cross-engine pandas parity (date_trunc convention)
    return out.withColumn("day", F.col("day").cast("timestamp"))


_SLIDING_DISTINCT_SQL = """
WITH pairs AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
days AS (SELECT DISTINCT day FROM pairs)
SELECT CAST(d.day AS TIMESTAMP) AS day,
       COUNT(DISTINCT p.user_id)::BIGINT AS n_active
FROM days d
JOIN pairs p ON p.day BETWEEN d.day - 6 AND d.day
GROUP BY d.day
"""


def event_transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams (extension: sequence mining —
    :func:`~tmdb_index_spark.operators.temporal.transition_matrix`):
    count + row-normalized P(next | prev) for consecutive event-type
    pairs, ordered by (ts, event_id) within user. One keyed shuffle +
    a vocabulary-sized aggregate."""
    from tmdb_index_spark.operators.temporal import transition_matrix

    ev = _events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    return transition_matrix(
        ev,
        seq_col="user_id",
        event_col="event_type",
        order_cols=("ts", "event_id"),
    )


_TRANSITION_SQL = """
WITH steps AS (
  SELECT LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_event,
         event_type AS next_event
  FROM events
),
counts AS (
  SELECT prev_event, next_event, COUNT(*)::BIGINT AS n_transitions
  FROM steps WHERE prev_event IS NOT NULL
  GROUP BY prev_event, next_event
)
SELECT prev_event, next_event, n_transitions,
       ROUND(CAST(n_transitions AS DOUBLE)
             / SUM(n_transitions) OVER (PARTITION BY prev_event), 4) AS p
FROM counts
"""


def price_size_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2D Pareto frontier / skyline (extension: multi-objective
    selection —
    :func:`~tmdb_index_spark.operators.frontier.frontier_2d`): the
    parts that are Pareto-minimal on (retail price, size) — no other
    part is cheaper-or-equal AND smaller-or-equal with one strict.
    Computed as a funnel-free running-min filter over distinct pairs
    (bucketed cummin + |buckets|-row carry), never the O(N²)
    NOT EXISTS self-join; the oracle states the same running-min
    derivation (provably equivalent to the dominance definition — see
    the operator docstring)."""
    from tmdb_index_spark.operators.frontier import frontier_2d

    parts = _t(spark, sf_dir, "part").select(
        F.col("p_retailprice").cast("double").alias("price"),
        F.col("p_size").cast("bigint").alias("size"),
    )
    return frontier_2d(parts, "price", "size", count_col="n_parts")


_FRONTIER_SQL = """
WITH pairs AS (
  SELECT CAST(p_retailprice AS DOUBLE) AS price,
         CAST(p_size AS BIGINT) AS size,
         COUNT(*)::BIGINT AS n_parts
  FROM part GROUP BY 1, 2
),
m AS (
  SELECT price, size, n_parts,
         MIN(size) OVER (
           ORDER BY price ASC, size ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prev_min
  FROM pairs
)
SELECT price, size, n_parts
FROM m WHERE prev_min IS NULL OR prev_min > size
"""


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE vocabulary-induction iteration (extension: tokenizer
    training —
    :func:`~tmdb_index_spark.operators.llm_prep.bpe_adjacent_pairs`):
    the 20 most frequent adjacent character pairs across all word
    occurrences. Token-scale work collapses map-side (pair alphabet is
    tiny) before the single shuffle."""
    from tmdb_index_spark.operators.llm_prep import bpe_adjacent_pairs

    docs = _t(spark, sf_dir, "documents").select("text")
    return bpe_adjacent_pairs(docs, top_k=20)


_BPE_PAIRS_SQL = """
WITH words AS (
  SELECT unnest(list_filter(
           regexp_split_to_array(trim(coalesce(text, '')), '\\s+'),
           x -> x <> ''
         )) AS w
  FROM documents
),
prs AS (
  SELECT unnest([w[i:i+1] for i in range(1, length(w))]) AS pair
  FROM words WHERE length(w) >= 2
)
SELECT pair, COUNT(*)::BIGINT AS n_pairs
FROM prs GROUP BY pair
ORDER BY n_pairs DESC, pair ASC
LIMIT 20
"""


def supplier_reach_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop BFS over the co-supply graph (extension: graph
    traversal — :func:`~tmdb_index_spark.operators.graph.bfs_levels`):
    minimum hop distance (<= 3) from nation-0 suppliers to every
    supplier reachable through shared low-quantity orders. Each hop is
    one co-partitioned join + min-fold; the oracle unrolls the same
    three frontier expansions as DISTINCT level sets and takes the
    min."""
    from tmdb_index_spark.operators.graph import bfs_levels

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") <= 5)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    edges = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_suppkey") != F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
        .distinct()
    )
    sources = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 0)
        .select(F.col("s_suppkey").alias("node"))
    )
    return bfs_levels(edges, sources, max_hops=3, materialize="cache")


_BFS_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
            WHERE l_quantity <= 5),
e AS (
  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey <> b.l_suppkey
),
d0 AS (SELECT DISTINCT s_suppkey AS node FROM supplier WHERE s_nationkey = 0),
l1 AS (SELECT DISTINCT e.dst AS node FROM d0 JOIN e ON e.src = d0.node),
l2 AS (SELECT DISTINCT e.dst AS node FROM l1 JOIN e ON e.src = l1.node),
l3 AS (SELECT DISTINCT e.dst AS node FROM l2 JOIN e ON e.src = l2.node),
lv AS (
  SELECT node, 0 AS hop FROM d0
  UNION ALL SELECT node, 1 FROM l1
  UNION ALL SELECT node, 2 FROM l2
  UNION ALL SELECT node, 3 FROM l3
)
SELECT node, MIN(hop)::INT AS hop FROM lv GROUP BY node
"""


def contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative-pair mining for contrastive training
    (extension:
    :func:`~tmdb_index_spark.operators.sampling.negative_pairs`): two
    uniform non-self partners per document via the hash-mod skip-self
    bijection over the dense doc_id space — no RNG state, no cross
    join, partner attributes through one dense-id equi-join."""
    from tmdb_index_spark.operators.sampling import negative_pairs

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return negative_pairs(
        docs, "doc_id", k=2, seed=0, keep_cols=("source",)
    )


_NEGATIVE_PAIRS_SQL = """
WITH n AS (SELECT COUNT(*)::BIGINT AS nn FROM documents),
draws AS (
  SELECT doc_id, j AS neg_rank,
         ('0x' || substr(md5(doc_id || '|' || j || '|' || '0'), 1, 15))::BIGINT
           % (nn - 1) AS raw
  FROM documents, n, (SELECT unnest(generate_series(1, 2)) AS j)
  WHERE nn >= 2
),
p AS (
  SELECT doc_id, neg_rank,
         CASE WHEN raw >= doc_id THEN raw + 1 ELSE raw END AS neg_id
  FROM draws
)
SELECT p.doc_id, p.neg_rank, p.neg_id, d.source AS neg_source
FROM p JOIN documents d ON d.doc_id = p.neg_id
"""


def user_value_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS trend of event value over time (extension: grouped
    regression —
    :func:`~tmdb_index_spark.operators.regression.grouped_linear_trend`):
    slope/intercept of value ~ epoch-day from five decimal-exact
    sufficient-statistic sums — one partial-aggregated groupBy, exact
    across engines because no float sum crosses the shuffle."""
    from tmdb_index_spark.operators.regression import grouped_linear_trend

    ev = _events(spark, sf_dir).select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("x_day"),
        "value",
    )
    return grouped_linear_trend(ev, "user_id", "x_day", "value")


_TREND_SQL = """
WITH pts AS (
  SELECT user_id,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS DECIMAL(18,0)) AS x,
         CAST(value AS DECIMAL(18,2)) AS y
  FROM events
),
agg AS (
  SELECT user_id,
         COUNT(*)::BIGINT AS n_points,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM pts GROUP BY user_id
),
fit AS (
  SELECT user_id, n_points,
         CASE WHEN CAST(n_points * sxx - sx * sx AS DOUBLE) <> 0.0
              THEN CAST(n_points * sxy - sx * sy AS DOUBLE)
                   / CAST(n_points * sxx - sx * sx AS DOUBLE)
         END AS slope,
         sx, sy
  FROM agg
)
SELECT user_id, n_points,
       ROUND(slope, 4) AS slope,
       ROUND((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
             / CAST(n_points AS DOUBLE), 4) AS intercept
FROM fit
"""


def user_value_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (extension: LOCF-weighted
    mean — :func:`~tmdb_index_spark.operators.temporal.time_weighted_avg`):
    each event's value holds until the user's next event; weights are
    exact integer microseconds and values exact decimals, so no float
    crosses a shuffle."""
    from tmdb_index_spark.operators.temporal import time_weighted_avg

    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "value")
    return time_weighted_avg(
        ev, key_col="user_id", ts_col="ts", value_col="value",
        tiebreak_col="event_id",
    )


_TWAP_SQL = """
WITH obs AS (
  SELECT user_id,
         CAST(LEAD(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
              ) - epoch_us(ts) AS DECIMAL(18,0)) AS w,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events
),
agg AS (
  SELECT user_id,
         COUNT(*)::BIGINT AS n_obs,
         SUM(v * w) AS swv,
         SUM(w) AS sw
  FROM obs GROUP BY user_id
)
SELECT user_id, n_obs,
       ROUND(CASE WHEN sw > 0
                  THEN CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE) END,
             4) AS twap
FROM agg
"""


def zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout locality audit (extension: multi-dim
    data-skipping layout —
    :func:`~tmdb_index_spark.operators.layout.zorder_locality_stats`):
    orders quantized on (custkey, order day), 8 bits each,
    interleaved; per top-6-bit Z-range the row count and BOTH
    dimensions' min/max spans — the tight-rectangle property that
    makes row-group stats prune multi-column predicates. Pure integer
    column arithmetic, one groupBy."""
    from tmdb_index_spark.operators.layout import zorder_locality_stats

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("bigint").alias("ckey"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).cast("bigint").alias("oday"),
    )
    return zorder_locality_stats(o, ["ckey", "oday"], bits=8, prefix_bits=6)


_ZORDER_SQL = """
WITH src AS (
  SELECT CAST(o_custkey AS BIGINT) AS ckey,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS oday
  FROM orders
),
mm AS (
  SELECT CAST(MIN(ckey) AS DOUBLE) AS lox, CAST(MAX(ckey) AS DOUBLE) AS hix,
         CAST(MIN(oday) AS DOUBLE) AS loy, CAST(MAX(oday) AS DOUBLE) AS hiy
  FROM src
),
q AS (
  SELECT ckey, oday,
         LEAST(CAST(FLOOR((CAST(ckey AS DOUBLE) - lox) * 256.0 / (hix - lox + 1.0)) AS BIGINT), 255) AS qx,
         LEAST(CAST(FLOOR((CAST(oday AS DOUBLE) - loy) * 256.0 / (hiy - loy + 1.0)) AS BIGINT), 255) AS qy
  FROM src, mm
),
z AS (
  SELECT ckey, oday, ((((qx >> 0) & 1) << 0) + (((qy >> 0) & 1) << 1) + (((qx >> 1) & 1) << 2) + (((qy >> 1) & 1) << 3) + (((qx >> 2) & 1) << 4) + (((qy >> 2) & 1) << 5) + (((qx >> 3) & 1) << 6) + (((qy >> 3) & 1) << 7) + (((qx >> 4) & 1) << 8) + (((qy >> 4) & 1) << 9) + (((qx >> 5) & 1) << 10) + (((qy >> 5) & 1) << 11) + (((qx >> 6) & 1) << 12) + (((qy >> 6) & 1) << 13) + (((qx >> 7) & 1) << 14) + (((qy >> 7) & 1) << 15)) AS zval FROM q
)
SELECT (zval >> 10) AS z_bucket,
       COUNT(*)::BIGINT AS n_rows,
       MIN(ckey) AS ckey_min, MAX(ckey) AS ckey_max,
       MIN(oday) AS oday_min, MAX(oday) AS oday_max
FROM z GROUP BY 1
"""


def source_token_nucleus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-p (nucleus) source selection per language (extension:
    mass-coverage curation —
    :func:`~tmdb_index_spark.operators.sampling.nucleus_filter`): the
    smallest set of sources covering >= 80% of each language's tokens,
    taken in descending token order. Prefix sums are decimal-exact so
    the boundary source is engine-independent."""
    from tmdb_index_spark.operators.sampling import nucleus_filter
    from tmdb_index_spark.functions.text import token_count

    st = (
        _t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.sum(token_count(F.col("text"))).cast("bigint").alias(
                "n_tokens"
            )
        )
    )
    return nucleus_filter(
        st, group_col="lang", weight_col="n_tokens", p=0.8,
        tiebreak_col="source",
    )


_NUCLEUS_SQL = """
WITH st AS (
  SELECT lang, source,
         SUM(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')))::BIGINT AS n_tokens
  FROM documents GROUP BY lang, source
),
c AS (
  SELECT lang, source, n_tokens,
         SUM(CAST(n_tokens AS DECIMAL(28,6))) OVER (
           PARTITION BY lang ORDER BY n_tokens DESC, source ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(CAST(n_tokens AS DECIMAL(28,6))) OVER (PARTITION BY lang) AS tot
  FROM st
)
SELECT lang, source, n_tokens,
       ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 4) AS cum_share
FROM c
WHERE (cum - n_tokens) < CAST(0.8 AS DECIMAL(28,6)) * tot
"""


def daily_transit_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact interval proration (extension:
    :func:`~tmdb_index_spark.operators.ranges.prorate_over_days`):
    each lineitem's extended price allocated across its order→ship
    days cent-by-cent (div share + remainder cents to earliest days),
    rolled up to daily open-order value, scoped to lines shipped
    within 60 days so the Generate fan-out is domain-bounded. One
    bounded Generate + one partial-aggregated day groupBy; totals are
    bit-exact on any engine or partitioning."""
    from tmdb_index_spark.operators.ranges import prorate_over_days

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    spans = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) >= 0)
        & (F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= 59)
    )
    out = prorate_over_days(
        spans, "o_orderdate", "l_shipdate", "l_extendedprice"
    )
    return out.withColumn("day", F.col("day").cast("timestamp"))


_PRORATE_SQL = """
WITH base AS (
  SELECT CAST(o.o_orderdate AS DATE) AS s,
         (CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE) + 1) AS n,
         CAST(ROUND(CAST(l.l_extendedprice AS DOUBLE) * 100, 0) AS BIGINT) AS c
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
        BETWEEN 0 AND 59
),
idx AS (
  SELECT s, n, c, unnest(range(0, n)) AS i FROM base
),
sh AS (
  SELECT CAST(s + CAST(i AS INT) AS TIMESTAMP) AS day,
         (c // n) + (CASE WHEN i < (c % n) THEN 1 ELSE 0 END) AS share
  FROM idx
)
SELECT day, COUNT(*)::BIGINT AS n_rows, SUM(share) / 100.0 AS amount
FROM sh GROUP BY day
"""


def orders_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style bucketed table digest (extension: anti-entropy
    verification —
    :func:`~tmdb_index_spark.operators.integrity.table_checksum`):
    canonical row serialization, portable 60-bit md5 row hashes,
    order-independent XOR fold per orderkey bucket — two tables are
    replicas iff their 64-row digest frames match, and a mismatched
    bucket localizes the damage to 1/64 of the data."""
    from tmdb_index_spark.operators.integrity import table_checksum

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("okey"),
        F.col("o_custkey").cast("bigint").alias("ckey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("total"),
        F.col("o_orderdate").cast("date").alias("odate"),
    )
    return table_checksum(o, key_col="okey", buckets=64)


_CHECKSUM_SQL = """
WITH c AS (
  SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 64
           AS bucket,
         ('0x' || substr(md5(
            CAST(o_orderkey AS VARCHAR) || chr(31) ||
            CAST(o_custkey AS VARCHAR) || chr(31) ||
            o_orderstatus || chr(31) ||
            CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || chr(31) ||
            CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
         ), 1, 15))::BIGINT AS h
  FROM orders
)
SELECT bucket, COUNT(*)::BIGINT AS n_rows, bit_xor(h) AS checksum
FROM c GROUP BY bucket
"""


def state_value_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 temporal attribution composite (extension:
    :func:`~tmdb_index_spark.operators.temporal.scd2_build` + validity
    interval join): every event attributed to the state version in
    effect at its timestamp ([valid_from, valid_to) semantics), then
    per state: distinct runs, events, exact total value. The join is
    an equi-join on user_id with the validity range as residual —
    co-partitioned, never a BNLJ; history rows per user are bounded
    by the run count."""
    from tmdb_index_spark.operators.temporal import scd2_build

    ev = _events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    hist = scd2_build(
        ev.select("user_id", "ts", "event_id", "event_type"),
        "user_id", "ts", "event_type", tiebreak="event_id",
    ).select(
        F.col("user_id").alias("h_user"),
        F.col("event_type").alias("state"),
        "valid_from", "valid_to", "version",
    )
    j = ev.join(
        hist,
        (F.col("user_id") == F.col("h_user"))
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    )
    return j.groupBy("state").agg(
        F.count_distinct(F.col("h_user"), F.col("version")).alias("n_runs"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(_dec("value")).cast("double").alias("total_value"),
    )


_STATE_ATTR_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type IS DISTINCT FROM
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
              THEN 1 ELSE 0 END AS chg
  FROM events
),
runs AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS run
  FROM ordered
),
versions AS (
  SELECT user_id, run, MIN(event_type) AS state, MIN(ts) AS valid_from
  FROM runs GROUP BY 1, 2
),
hist AS (
  SELECT user_id, state, valid_from,
         LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, run)
           AS valid_to,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY valid_from, run)
           AS version
  FROM versions
)
SELECT h.state,
       COUNT(DISTINCT (h.user_id, h.version))::BIGINT AS n_runs,
       COUNT(*)::BIGINT AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events e
JOIN hist h
  ON e.user_id = h.user_id
 AND e.ts >= h.valid_from
 AND (h.valid_to IS NULL OR e.ts < h.valid_to)
GROUP BY h.state
"""


def purchase_click_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor (extension:
    :func:`~tmdb_index_spark.operators.drift.histogram_kl`): KL (both
    directions) and Jensen-Shannon divergence between the value
    distributions of purchase vs click events on a shared 20-bin
    grid with add-one smoothing — the train-vs-serve feature-drift
    check. One data pass; all divergence math runs on the ≤ 2·bins
    aggregated rows."""
    from tmdb_index_spark.operators.drift import histogram_kl

    ev = _events(spark, sf_dir).select("event_type", "value")
    return histogram_kl(
        ev, value_col="value", side_col="event_type",
        side_a="purchase", side_b="click", bins=20,
    )


_DRIFT_SQL = """
WITH rows_ AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 'a'
              WHEN event_type = 'click' THEN 'b' END AS side,
         CAST(value AS DOUBLE) AS v
  FROM events
  WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
),
mm AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM rows_),
binned AS (
  SELECT side,
         LEAST(CAST(FLOOR((v - lo) * 20 / (hi - lo + 1.0)) AS BIGINT), 19) AS b
  FROM rows_, mm
),
wide AS (
  SELECT b,
         SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS cb
  FROM binned GROUP BY b
),
tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM wide),
per_bin AS (
  SELECT na, nb,
         (ca + 1.0) / (na + 20) AS p,
         (cb + 1.0) / (nb + 20) AS q
  FROM wide, tot
),
agg AS (
  SELECT na, nb,
         COUNT(*) AS occ,
         SUM(p * log2(p / q)) AS sab,
         SUM(q * log2(q / p)) AS sba,
         SUM(p / 2 * log2(p / ((p + q) / 2))
             + q / 2 * log2(q / ((p + q) / 2))) AS sjs
  FROM per_bin GROUP BY na, nb
)
SELECT CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       CAST(20 AS BIGINT) AS n_bins,
       ROUND(sab + (20 - occ) * (1.0 / (na + 20))
                 * log2((1.0 / (na + 20)) / (1.0 / (nb + 20))), 4) AS kl_ab,
       ROUND(sba + (20 - occ) * (1.0 / (nb + 20))
                 * log2((1.0 / (nb + 20)) / (1.0 / (na + 20))), 4) AS kl_ba,
       ROUND(sjs + (20 - occ) * (
               (1.0 / (na + 20)) / 2 * log2((1.0 / (na + 20))
                 / (((1.0 / (na + 20)) + (1.0 / (nb + 20))) / 2))
             + (1.0 / (nb + 20)) / 2 * log2((1.0 / (nb + 20))
                 / (((1.0 / (na + 20)) + (1.0 / (nb + 20))) / 2))
             ), 4) AS jsd
FROM agg
"""


def orderkey_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic (extension:
    :func:`~tmdb_index_spark.operators.skew.skew_report`): the ten
    heaviest lineitem orderkeys with their row share and uniform-share
    multiple — the measurement that decides whether a key needs the
    salted/two-phase treatment before a 100 TB join. Aggregate-frame
    scalars broadcast; top-k compiles to TakeOrderedAndProject."""
    from tmdb_index_spark.operators.skew import skew_report

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    return skew_report(li, "l_orderkey", top_k=10)


_SKEW_REPORT_SQL = """
WITH counts AS (
  SELECT l_orderkey, COUNT(*)::BIGINT AS n_rows
  FROM lineitem GROUP BY l_orderkey
),
tot AS (
  SELECT CAST(SUM(n_rows) AS DOUBLE) AS t,
         CAST(COUNT(*) AS DOUBLE) AS k
  FROM counts
)
SELECT l_orderkey, n_rows,
       ROUND(n_rows / t, 6) AS share,
       ROUND(n_rows * k / t, 6) AS skew_x
FROM counts, tot
ORDER BY n_rows DESC, l_orderkey ASC
LIMIT 10
"""


def cosupply_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-round k-core peeling (extension: cascading graph
    filtering — :func:`~tmdb_index_spark.operators.graph.k_core`):
    six delete-degree<3 waves over the sparse (quantity <= 2)
    co-supply graph — each wave lowers neighbors' degrees, so the
    survivor set depends on the full cascade, not one degree filter
    (62 -> 17 alive suppliers over the 6 waves at sf0.01). Rounds are
    pinned for oracle parity (SQL can unroll R waves, not "until
    stable"); the production entry point peels to convergence with
    the same per-wave dataflow, and the unit test pins
    pinned==converged on a closed graph."""
    from tmdb_index_spark.operators.graph import k_core

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") <= 2)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    edges = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_suppkey") != F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
        )
        .distinct()
    )
    return k_core(edges, k=3, rounds=6)


_KCORE_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
            WHERE l_quantity <= 2),
e0 AS (
  SELECT DISTINCT a.l_suppkey AS a, b.l_suppkey AS b
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey <> b.l_suppkey
),
a1 AS (SELECT a FROM (SELECT a, COUNT(*) c FROM e0 GROUP BY a) WHERE c >= 3),
e1 AS (SELECT e0.a, e0.b FROM e0 JOIN a1 x ON e0.a = x.a JOIN a1 y ON e0.b = y.a),
a2 AS (SELECT a FROM (SELECT a, COUNT(*) c FROM e1 GROUP BY a) WHERE c >= 3),
e2 AS (SELECT e1.a, e1.b FROM e1 JOIN a2 x ON e1.a = x.a JOIN a2 y ON e1.b = y.a),
a3 AS (SELECT a FROM (SELECT a, COUNT(*) c FROM e2 GROUP BY a) WHERE c >= 3),
e3 AS (SELECT e2.a, e2.b FROM e2 JOIN a3 x ON e2.a = x.a JOIN a3 y ON e2.b = y.a),
a4 AS (SELECT a FROM (SELECT a, COUNT(*) c FROM e3 GROUP BY a) WHERE c >= 3),
e4 AS (SELECT e3.a, e3.b FROM e3 JOIN a4 x ON e3.a = x.a JOIN a4 y ON e3.b = y.a),
a5 AS (SELECT a FROM (SELECT a, COUNT(*) c FROM e4 GROUP BY a) WHERE c >= 3),
e5 AS (SELECT e4.a, e4.b FROM e4 JOIN a5 x ON e4.a = x.a JOIN a5 y ON e4.b = y.a),
a6 AS (SELECT a FROM (SELECT a, COUNT(*) c FROM e5 GROUP BY a) WHERE c >= 3),
e6 AS (SELECT e5.a, e5.b FROM e5 JOIN a6 x ON e5.a = x.a JOIN a6 y ON e5.b = y.a)
SELECT a AS node, COUNT(*)::BIGINT AS degree
FROM e6 GROUP BY a HAVING COUNT(*) >= 3
"""


def collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-bigram pointwise mutual information (extension:
    collocation mining / PPMI-matrix counts —
    :func:`~tmdb_index_spark.operators.llm_prep.token_pmi`): the 20
    highest-PMI token pairs with at least 5 occurrences. All
    probability mass derives from integer counts, so PMI is
    bit-reproducible; vocabulary-sized joins only after the token
    scans."""
    from tmdb_index_spark.operators.llm_prep import token_pmi

    docs = _t(spark, sf_dir, "documents").select("text")
    return token_pmi(docs, min_count=5, top_k=20)


_PMI_SQL = """
WITH t AS (
  SELECT list_filter(
           regexp_split_to_array(trim(coalesce(text, '')), '\\s+'),
           x -> x <> ''
         ) AS ts
  FROM documents
),
uni AS (
  SELECT unnest(ts) AS tok FROM t
),
ucnt AS (SELECT tok, COUNT(*) AS cu FROM uni GROUP BY tok),
ntok AS (SELECT CAST(SUM(cu) AS DOUBLE) AS n FROM ucnt),
bg AS (
  SELECT ts[i] AS tok_a, ts[i + 1] AS tok_b
  FROM t, unnest(range(1, len(ts))) AS u(i)
  WHERE len(ts) >= 2
),
pcnt AS (
  SELECT tok_a, tok_b, COUNT(*)::BIGINT AS n_pair
  FROM bg GROUP BY tok_a, tok_b
),
npair AS (SELECT CAST(SUM(n_pair) AS DOUBLE) AS n FROM pcnt),
scored AS (
  SELECT p.tok_a, p.tok_b, p.n_pair,
         ROUND(log2((p.n_pair / npair.n)
                    / ((ua.cu / ntok.n) * (ub.cu / ntok.n))), 4) AS pmi
  FROM pcnt p
  JOIN ucnt ua ON ua.tok = p.tok_a
  JOIN ucnt ub ON ub.tok = p.tok_b
  CROSS JOIN npair CROSS JOIN ntok
  WHERE p.n_pair >= 5
)
SELECT tok_a, tok_b, n_pair, pmi
FROM scored
ORDER BY pmi DESC, tok_a ASC, tok_b ASC
LIMIT 20
"""


def label_centroid_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding class-separation audit (extension:
    :func:`~tmdb_index_spark.operators.similarity.label_centroid_cosine`):
    pairwise cosine between per-label centroids. Vectors never move
    whole through a shuffle — centroids come from a posexplode +
    (label, position) partial aggregate; the pairwise stage touches
    only the |labels|-row centroid frame."""
    from tmdb_index_spark.operators.similarity import label_centroid_cosine

    emb = _t(spark, sf_dir, "embeddings").select("label", "embedding")
    return label_centroid_cosine(emb)


_CENTROID_SQL = """
WITH pos AS (
  SELECT label,
         generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
cm AS (
  SELECT label, pos, SUM(val) / COUNT(*) AS m, COUNT(*) AS n
  FROM pos GROUP BY label, pos
),
cent AS (
  SELECT label,
         list(m ORDER BY pos) AS centroid,
         MAX(n)::BIGINT AS n_members
  FROM cm GROUP BY label
)
SELECT a.label AS label_a, b.label AS label_b,
       a.n_members AS n_a, b.n_members AS n_b,
       ROUND(
         list_sum(list_transform(generate_series(1, len(a.centroid)),
                                 i -> a.centroid[i] * b.centroid[i]))
         / (sqrt(list_sum(list_transform(a.centroid, x -> x * x)))
            * sqrt(list_sum(list_transform(b.centroid, x -> x * x)))),
         4) AS cos_sim
FROM cent a JOIN cent b ON a.label < b.label
"""


def revenue_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1/lag-7 autocorrelation of daily event revenue (extension:
    time-series diagnostics —
    :func:`~tmdb_index_spark.operators.regression.series_autocorrelation`):
    the weekly-seasonality check. The heavy pass is the daily rollup;
    lag pairs join on exact day difference over the |days|-row
    series, and correlation reduces to decimal-exact sufficient sums
    combined in double identically on both engines."""
    from tmdb_index_spark.operators.regression import series_autocorrelation

    daily = (
        _events(spark, sf_dir)
        .groupBy(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).cast("long").alias("x_day")
        )
        .agg(F.sum(_dec("value")).cast("decimal(18,2)").alias("revenue"))
    )
    return series_autocorrelation(daily, "x_day", "revenue", lags=(1, 7))


_AUTOCORR_SQL = """
WITH daily AS (
  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
  FROM events GROUP BY 1
),
p AS (
  SELECT l.lag, cur.y AS yc, prev.y AS yp
  FROM (SELECT unnest([1, 7]) AS lag) l
  CROSS JOIN daily cur
  JOIN daily prev ON prev.x = cur.x - l.lag
),
agg AS (
  SELECT lag,
         COUNT(*)::BIGINT AS n_pairs,
         CAST(SUM(yc) AS DOUBLE) AS sy,
         CAST(SUM(yp) AS DOUBLE) AS sx,
         CAST(SUM(yc * yp) AS DOUBLE) AS sxy,
         CAST(SUM(yc * yc) AS DOUBLE) AS syy,
         CAST(SUM(yp * yp) AS DOUBLE) AS sxx
  FROM p GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
       ROUND(CASE WHEN n_pairs >= 2
                   AND (n_pairs * sxx - sx * sx) > 0
                   AND (n_pairs * syy - sy * sy) > 0
             THEN (n_pairs * sxy - sx * sy)
                  / sqrt((n_pairs * sxx - sx * sx)
                         * (n_pairs * syy - sy * sy)) END,
             4) AS autocorr
FROM agg
"""


def source_shingle_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-level set similarity (extension: corpus provenance —
    :func:`~tmdb_index_spark.operators.dedup_text.group_shingle_jaccard`):
    exact Jaccard between each pair of SOURCES' distinct 3-gram
    shingle sets — mirror-domain detection before choosing cap
    weights. Shingle hashes computed once by the shared Arrow stage;
    the pair search is the inverted-index equi-join on the hash, so
    fan-out per shingle is bounded by the source count squared."""
    from tmdb_index_spark.operators.dedup_text import group_shingle_jaccard

    docs = _t(spark, sf_dir, "documents").select("source", "text")
    return group_shingle_jaccard(docs, group_col="source", n=3)


_SOURCE_OVERLAP_SQL = """
WITH toks AS (
  SELECT source,
         list_filter(
           regexp_split_to_array(trim(coalesce(text, '')), '\\s+'),
           x -> x <> ''
         ) AS ts
  FROM documents
),
sh AS (
  SELECT DISTINCT source AS g,
         ('0x' || substr(md5(array_to_string(ts[i:i+2], ' ')), 1, 15))::BIGINT AS h
  FROM toks, unnest(range(1, len(ts) - 1)) AS u(i)
  WHERE len(ts) >= 3
),
sizes AS (SELECT g, COUNT(*)::BIGINT AS sz FROM sh GROUP BY g),
inter AS (
  SELECT a.g AS group_a, b.g AS group_b, COUNT(*)::BIGINT AS n_common
  FROM sh a JOIN sh b ON a.h = b.h AND a.g < b.g
  GROUP BY a.g, b.g
)
SELECT i.group_a, i.group_b,
       sa.sz AS n_a, sb.sz AS n_b, i.n_common,
       ROUND(i.n_common / CAST(sa.sz + sb.sz - i.n_common AS DOUBLE), 4)
         AS jaccard
FROM inter i
JOIN sizes sa ON sa.g = i.group_a
JOIN sizes sb ON sb.g = i.group_b
"""


def benford_price_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformance check (extension: data-quality
    forensics): the observed leading-digit distribution of order
    totals vs Benford's log10(1 + 1/d) expectation, with per-digit
    chi-square contributions — the classic fabricated-numbers
    screen. Map-only digit extraction + a 9-row aggregate; every
    statistic derives from integer counts so the output is
    bit-reproducible."""
    o = _t(spark, sf_dir, "orders").select(
        F.substring(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
        ).cast("int").alias("digit")
    ).filter(F.col("digit").between(1, 9))
    counts = o.groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    tot = counts.agg(F.sum("n_orders").cast("double").alias("__tot__"))
    expected = F.log10(1 + 1 / F.col("digit").cast("double"))
    observed = F.col("n_orders") / F.col("__tot__")
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_orders",
            F.round(observed, 4).alias("observed_p"),
            F.round(expected, 4).alias("benford_p"),
            F.round(
                F.pow(observed - expected, 2) / expected * F.col("__tot__"),
                4,
            ).alias("chi2_term"),
        )
    )


_BENFORD_SQL = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
              AS INT) AS digit
  FROM orders
),
counts AS (
  SELECT digit, COUNT(*)::BIGINT AS n_orders
  FROM d WHERE digit BETWEEN 1 AND 9 GROUP BY digit
),
tot AS (SELECT CAST(SUM(n_orders) AS DOUBLE) AS t FROM counts)
SELECT digit, n_orders,
       ROUND(n_orders / t, 4) AS observed_p,
       ROUND(log10(1 + 1.0 / digit), 4) AS benford_p,
       ROUND(pow(n_orders / t - log10(1 + 1.0 / digit), 2)
             / log10(1 + 1.0 / digit) * t, 4) AS chi2_term
FROM counts, tot
"""


def conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-to-purchase latency distribution (extension: funnel
    timing): exact interpolated p50/p90 of the attribution delay in
    seconds, per-pair latencies from the same event-time interval
    join as `click_purchase_attribution` (the batch twin of streaming
    ``attribute_outcomes``). Latency math on integer epoch
    microseconds, quantiles on the small attributed-pairs frame."""
    from tmdb_index_spark.streaming.windowed import attribute_outcomes

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    pairs = attribute_outcomes(clicks, purchases, within="30 minutes")
    lat = pairs.select(
        (
            (
                F.unix_micros(F.col("outcome_ts").cast("timestamp"))
                - F.unix_micros(F.col("action_ts").cast("timestamp"))
            )
            / 1_000_000.0
        ).alias("latency_s")
    )
    return lat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.percentile(F.col("latency_s"), F.lit(0.5)), 4).alias("p50_s"),
        F.round(F.percentile(F.col("latency_s"), F.lit(0.9)), 4).alias("p90_s"),
    )


_CONVERSION_LATENCY_SQL = """
WITH pairs AS (
  SELECT (epoch_us(o.ts) - epoch_us(a.ts)) / 1000000.0 AS latency_s
  FROM events a JOIN events o ON a.user_id = o.user_id
  WHERE a.event_type = 'click' AND o.event_type = 'purchase'
    AND o.ts >= a.ts AND o.ts <= a.ts + INTERVAL 30 MINUTE
)
SELECT COUNT(*)::BIGINT AS n_pairs,
       ROUND(quantile_cont(latency_s, 0.5), 4) AS p50_s,
       ROUND(quantile_cont(latency_s, 0.9), 4) AS p90_s
FROM pairs
"""


def user_value_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of each user's cumulative event value
    (extension: running-extremum analytics): the largest peak-to-
    current drop of the running total, ordered by (ts, event_id).
    One shuffle on the user key; the cumulative sum, running max,
    and drawdown max all run inside that partitioning — decimal
    arithmetic end-to-end, so the result is exact."""
    ev = _events(spark, sf_dir).select(
        "user_id", "ts", "event_id", _dec("value").alias("v")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum("v").over(w)
    run_max = F.max(cum).over(w)
    stepped = ev.select(
        "user_id", (run_max - cum).alias("__dd__")
    )
    return stepped.groupBy("user_id").agg(
        F.max("__dd__").cast("double").alias("max_drawdown")
    )


_DRAWDOWN_SQL = """
WITH c AS (
  SELECT user_id, ts, event_id,
         SUM(CAST(value AS DECIMAL(18,2))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM events
),
m AS (
  SELECT user_id,
         MAX(cum) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cum AS dd
  FROM c
)
SELECT user_id, CAST(MAX(dd) AS DOUBLE) AS max_drawdown
FROM m GROUP BY user_id
"""


def part_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining (extension: co-occurrence
    lift): the 20 strongest part pairs ordered together, with support
    and lift = P(a,b) / (P(a)·P(b)) over order baskets. The pair
    candidates come from the orderkey self-join of DISTINCT
    (order, part) rows, so fan-out per order is bounded by its basket
    size squared (TPC-H: ≤ 7 lines), never all part pairs; lift
    derives from integer counts, so the ranking is engine-exact.
    Scoped to small-quantity lines to keep baskets sparse and the
    pair set discriminating."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") <= 10)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("__n__")
    )
    part_cnt = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("__cp__")
    )
    pairs = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders_both"))
    )
    ca = part_cnt.select(
        F.col("l_partkey").alias("part_a"), F.col("__cp__").alias("__ca__")
    )
    cb = part_cnt.select(
        F.col("l_partkey").alias("part_b"), F.col("__cp__").alias("__cb__")
    )
    scored = (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_orders_both",
            F.round(
                (F.col("n_orders_both") / F.col("__n__"))
                / (
                    (F.col("__ca__") / F.col("__n__"))
                    * (F.col("__cb__") / F.col("__n__"))
                ),
                4,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("n_orders_both").desc(),
        F.col("part_a").asc(),
        F.col("part_b").asc(),
    ).limit(20)


_PART_LIFT_SQL = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_quantity <= 10
),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_ord FROM li),
pc AS (SELECT l_partkey, COUNT(*) AS cp FROM li GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         COUNT(*)::BIGINT AS n_orders_both
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
SELECT p.part_a, p.part_b, p.n_orders_both,
       ROUND((p.n_orders_both / n.n_ord)
             / ((ca.cp / n.n_ord) * (cb.cp / n.n_ord)), 4) AS lift
FROM pairs p
JOIN pc ca ON ca.l_partkey = p.part_a
JOIN pc cb ON cb.l_partkey = p.part_b
CROSS JOIN n
ORDER BY p.n_orders_both DESC, p.part_a ASC, p.part_b ASC
LIMIT 20
"""


def frequent_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent behavioral subpaths (extension: sequence n-gram
    mining): the 15 most common consecutive event-type trigrams
    across user streams, ordered by (ts, event_id) within user —
    the path-level complement of `event_transition_probs` (bigram
    transitions). One shuffle on the user key; lag windows share
    that partitioning; the trigram aggregate is vocabulary³-bounded
    so it collapses map-side."""
    ev = _events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    tri = ev.select(
        F.lag("event_type", 2).over(w).alias("e1"),
        F.lag("event_type", 1).over(w).alias("e2"),
        F.col("event_type").alias("e3"),
    ).filter(F.col("e1").isNotNull())
    return (
        tri.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_paths"))
        .orderBy(
            F.col("n_paths").desc(),
            F.col("e1").asc(),
            F.col("e2").asc(),
            F.col("e3").asc(),
        )
        .limit(15)
    )


_EVENT_TRIGRAM_SQL = """
WITH tri AS (
  SELECT LAG(event_type, 2) OVER w AS e1,
         LAG(event_type, 1) OVER w AS e2,
         event_type AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1, e2, e3, COUNT(*)::BIGINT AS n_paths
FROM tri WHERE e1 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY n_paths DESC, e1 ASC, e2 ASC, e3 ASC
LIMIT 15
"""


def supplier_path_costs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop weighted shortest paths (extension: min-plus
    relaxation — :func:`~tmdb_index_spark.operators.graph.sssp_bounded`):
    cheapest <= 3-hop path cost from nation-0 suppliers over the
    co-supply graph, edge weight = the minimum combined quantity of a
    shared low-quantity order (integer, so the min-fold is exact).
    Bellman-Ford rounds unrolled — a settled node can still improve
    via a longer-but-cheaper path, which hop-counting BFS cannot
    express; each round is one keyed join + min groupBy over
    parquet-pinned frames."""
    from tmdb_index_spark.operators.graph import sssp_bounded

    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") <= 5)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.min("l_quantity").cast("long").alias("q"))
    )
    edges = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_suppkey") != F.col("b.l_suppkey"))
        .select(
            F.col("a.l_suppkey").alias("src"),
            F.col("b.l_suppkey").alias("dst"),
            (F.col("a.q") + F.col("b.q")).alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("weight"))
    )
    sources = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") == 0)
        .select(F.col("s_suppkey").alias("node"))
    )
    return sssp_bounded(edges, sources, max_hops=3)


_SSSP_SQL = """
WITH li AS (
  SELECT l_orderkey, l_suppkey, CAST(MIN(l_quantity) AS BIGINT) AS q
  FROM lineitem WHERE l_quantity <= 5
  GROUP BY l_orderkey, l_suppkey
),
e AS (
  SELECT a.l_suppkey AS s, b.l_suppkey AS d, MIN(a.q + b.q) AS w
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey <> b.l_suppkey
  GROUP BY a.l_suppkey, b.l_suppkey
),
d0 AS (
  SELECT DISTINCT s_suppkey AS node, CAST(0 AS BIGINT) AS dist
  FROM supplier WHERE s_nationkey = 0
),
d1 AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d0
    UNION ALL
    SELECT e.d AS node, d0.dist + e.w AS dist FROM d0 JOIN e ON e.s = d0.node
  ) GROUP BY node
),
d2 AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d1
    UNION ALL
    SELECT e.d AS node, d1.dist + e.w AS dist FROM d1 JOIN e ON e.s = d1.node
  ) GROUP BY node
),
d3 AS (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d2
    UNION ALL
    SELECT e.d AS node, d2.dist + e.w AS dist FROM d2 JOIN e ON e.s = d2.node
  ) GROUP BY node
)
SELECT node, dist FROM d3
"""


def audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types (extension:
    cohort set algebra —
    :func:`~tmdb_index_spark.operators.dedup.group_set_jaccard`):
    exact Jaccard between each pair of event types' distinct user
    sets. One distinct collapse + the inverted self-join on the user
    id — fan-out per user bounded by the event-type vocabulary
    squared."""
    from tmdb_index_spark.operators.dedup import group_set_jaccard

    ev = _events(spark, sf_dir).select("event_type", "user_id")
    return group_set_jaccard(ev, group_col="event_type", item_col="user_id")


_AUDIENCE_SQL = """
WITH sets AS (
  SELECT DISTINCT event_type AS g, user_id AS i FROM events
),
sizes AS (SELECT g, COUNT(*)::BIGINT AS sz FROM sets GROUP BY g),
inter AS (
  SELECT a.g AS group_a, b.g AS group_b, COUNT(*)::BIGINT AS n_common
  FROM sets a JOIN sets b ON a.i = b.i
  WHERE a.g < b.g
  GROUP BY a.g, b.g
)
SELECT i.group_a, i.group_b, sa.sz AS n_a, sb.sz AS n_b, i.n_common,
       ROUND(i.n_common / CAST(sa.sz + sb.sz - i.n_common AS DOUBLE), 4)
         AS jaccard
FROM inter i
JOIN sizes sa ON sa.g = i.group_a
JOIN sizes sb ON sb.g = i.group_b
"""


def revenue_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift detection per event type (extension:
    change-point scoring —
    :func:`~tmdb_index_spark.operators.regression.cusum_changepoint`):
    the maximum absolute cumulative deviation of daily value totals
    from each type's mean, and the day where it peaks. The running
    statistic is the division-free scaled form n·cumsum − t·total in
    exact decimals, so peak day and score are engine-exact."""
    from tmdb_index_spark.operators.regression import cusum_changepoint

    daily = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).cast("long").alias("x_day"),
        )
        .agg(F.sum(_dec("value")).cast("decimal(18,2)").alias("daily_value"))
    )
    return cusum_changepoint(daily, "event_type", "x_day", "daily_value")


_CUSUM_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
  FROM events GROUP BY 1, 2
),
walked AS (
  SELECT event_type, x,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         ABS(
           CAST(COUNT(*) OVER (PARTITION BY event_type) AS DECIMAL(18,0))
             * CAST(SUM(y) OVER (PARTITION BY event_type ORDER BY x
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DECIMAL(18,2))
           - CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x)
                  AS DECIMAL(18,0))
             * CAST(SUM(y) OVER (PARTITION BY event_type)
                    AS DECIMAL(18,2))
         ) AS s_abs
  FROM daily
),
ranked AS (
  SELECT event_type, x, n, s_abs,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY s_abs DESC, x ASC) AS rk
  FROM walked
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_points,
       CAST(x AS BIGINT) AS cp_x,
       ROUND(CAST(s_abs AS DOUBLE) / CAST(n AS DOUBLE), 4) AS cusum_max
FROM ranked WHERE rk = 1
"""


def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag
    (extension: weighted aggregation —
    :func:`~tmdb_index_spark.operators.aggregates.weighted_percentile`):
    the value where cumulative QUANTITY reaches half the flag's
    total — a shape F.percentile cannot express without row
    replication. One Exchange; decimal cumulative weights make the
    boundary row engine-exact."""
    from tmdb_index_spark.operators.aggregates import weighted_percentile

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("double").alias("price"),
        "l_quantity",
    )
    return weighted_percentile(
        li, group_col="l_returnflag", value_col="price",
        weight_col="l_quantity", p=0.5,
    )


_WEIGHTED_MEDIAN_SQL = """
WITH rows_ AS (
  SELECT l_returnflag AS g,
         CAST(l_extendedprice AS DOUBLE) AS v,
         CAST(l_quantity AS DECIMAL(18,2)) AS w
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
),
stepped AS (
  SELECT g, v,
         COUNT(*) OVER (PARTITION BY g) AS n,
         SUM(w) OVER (PARTITION BY g) AS tot,
         SUM(w) OVER (PARTITION BY g ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM rows_
)
SELECT g AS l_returnflag,
       CAST(MAX(n) AS BIGINT) AS n_rows,
       CAST(MAX(tot) AS DOUBLE) AS total_weight,
       MIN(v) AS wp
FROM stepped
WHERE cum >= CAST(0.5 AS DECIMAL(10,6)) * tot
GROUP BY g
"""


def daily_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-free expanding-window anomaly detection (extension:
    online-style monitoring —
    :func:`~tmdb_index_spark.operators.temporal.expanding_zscore_anomalies`):
    daily value totals per event type z-scored against STRICTLY
    earlier days only (what a deployed monitor would have known),
    flagged at |z| > 2 after 5 days of history. Exact decimal prefix
    sums; one group-keyed window."""
    from tmdb_index_spark.operators.temporal import expanding_zscore_anomalies

    daily = (
        _events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).cast("long").alias("x_day"),
        )
        .agg(F.sum(_dec("value")).cast("decimal(18,2)").alias("daily_value"))
    )
    return expanding_zscore_anomalies(
        daily, "event_type", "x_day", "daily_value",
        z_threshold=2.0, min_history=5,
    )


_ANOMALY_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x_day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
  FROM events GROUP BY 1, 2
),
stepped AS (
  SELECT event_type, x_day, y,
         COUNT(*) OVER w AS n,
         CAST(SUM(y) OVER w AS DECIMAL(18,2)) AS sy,
         CAST(SUM(y * y) OVER w AS DECIMAL(38,4)) AS syy
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY x_day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_type, x_day,
       CAST(y AS DOUBLE) AS y,
       CAST(n AS BIGINT) AS n_prior,
       ROUND((CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / n)
             / (sqrt(n * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) / n),
             4) AS z
FROM stepped
WHERE n >= 5
  AND (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
  AND ABS((CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / n)
          / (sqrt(n * CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) / n)) > 2.0
"""


def user_heartbeat_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heartbeat gap detection (extension: feed monitoring —
    :func:`~tmdb_index_spark.operators.temporal.missing_periods`):
    for each of the first 30 users, the days with NO events between
    their first and last activity — the silent-feed report. Fan-out
    is span length, never row count; the user scope keeps the gap
    list discriminating (every user has idle days)."""
    from tmdb_index_spark.operators.temporal import missing_periods

    ev = (
        _events(spark, sf_dir)
        .filter(F.col("user_id") < 30)
        .select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("day_idx"),
        )
    )
    return missing_periods(ev, "user_id", "day_idx")


_HEARTBEAT_SQL = """
WITH obs AS (
  SELECT DISTINCT user_id,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS i
  FROM events WHERE user_id < 30
),
span AS (
  SELECT user_id, MIN(i) AS lo, MAX(i) AS hi FROM obs GROUP BY user_id
),
grid AS (
  SELECT user_id, (hi - lo) > 100000 AS span_truncated,
         unnest(range(lo, (CASE WHEN (hi - lo) > 100000
                                THEN lo + 100000 ELSE hi END) + 1)) AS i
  FROM span
)
SELECT g.user_id, g.i AS missing_idx, g.span_truncated
FROM grid g
LEFT JOIN obs o ON o.user_id = g.user_id AND o.i = g.i
WHERE o.user_id IS NULL
"""


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers (extension: privacy
    governance): customer equivalence classes under
    (nation, market segment) whose size is below k=8 — the groups a
    release would have to suppress or generalize. One
    partial-aggregated groupBy; the violating-share scalar rides a
    1-row broadcast."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment"
    )
    groups = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    total = cust.agg(F.count(F.lit(1)).cast("double").alias("__t__"))
    return (
        groups.filter(F.col("n_rows") < 8)
        .crossJoin(F.broadcast(total))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_rows",
            F.round(F.col("n_rows") / F.col("__t__"), 6).alias(
                "suppressed_share"
            ),
        )
    )


_K_ANON_SQL = """
WITH g AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*)::BIGINT AS n_rows
  FROM customer GROUP BY c_nationkey, c_mktsegment
),
t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS tot FROM customer)
SELECT c_nationkey, c_mktsegment, n_rows,
       ROUND(n_rows / tot, 6) AS suppressed_share
FROM g, t WHERE n_rows < 8
"""


def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves (extension: growth analytics —
    the value complement of `weekly_retention_cohorts`): per
    first-seen-week cohort and weeks-since-acquisition age, the
    per-cohort cumulative value and cumulative value per acquired
    user. Decimal-exact sums; the cumulative window runs over the
    tiny (cohort × age) aggregate, never the fact."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.floor(
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) / 7
        ).cast("bigint").alias("week"),
        _dec("value").alias("v"),
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = first.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_users")
    )
    cells = (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("age_weeks"),
        )
        .agg(F.sum("v").cast("decimal(18,2)").alias("__wv__"))
    )
    wcum = (
        Window.partitionBy("cohort_week")
        .orderBy(F.col("age_weeks").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.withColumn(
            "cum_value", F.sum("__wv__").over(wcum).cast("double")
        )
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "age_weeks",
            "cohort_users",
            F.round("cum_value", 2).alias("cum_value"),
            F.round(
                F.col("cum_value") / F.col("cohort_users").cast("double"), 4
            ).alias("ltv_per_user"),
        )
    )


_LTV_SQL = """
WITH ev AS (
  SELECT user_id,
         CAST(FLOOR((CAST(ts AS DATE) - DATE '2024-01-01') / 7.0) AS BIGINT)
           AS week,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events
),
first_ AS (
  SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id
),
sizes AS (
  SELECT cohort_week, COUNT(*)::BIGINT AS cohort_users
  FROM first_ GROUP BY cohort_week
),
cells AS (
  SELECT f.cohort_week, e.week - f.cohort_week AS age_weeks,
         CAST(SUM(e.v) AS DECIMAL(18,2)) AS wv
  FROM ev e JOIN first_ f ON e.user_id = f.user_id
  GROUP BY f.cohort_week, e.week - f.cohort_week
),
walked AS (
  SELECT cohort_week, age_weeks,
         CAST(SUM(wv) OVER (PARTITION BY cohort_week ORDER BY age_weeks
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS cum_value
  FROM cells
)
SELECT w.cohort_week, w.age_weeks, s.cohort_users,
       ROUND(w.cum_value, 2) AS cum_value,
       ROUND(w.cum_value / s.cohort_users, 4) AS ltv_per_user
FROM walked w JOIN sizes s ON s.cohort_week = w.cohort_week
"""


def user_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per day (extension: composed from two
    :func:`~tmdb_index_spark.operators.temporal.sliding_window_distinct`
    passes — daily actives over 30-day actives). The distinct
    (user, day) collapse is shared work; ratios round to 4."""
    from tmdb_index_spark.operators.temporal import sliding_window_distinct

    ev = _events(spark, sf_dir).select("user_id", "ts")
    dau = sliding_window_distinct(
        ev, ts_col="ts", key_col="user_id", window_days=1
    ).select(F.col("day"), F.col("n_active").alias("dau"))
    mau = sliding_window_distinct(
        ev, ts_col="ts", key_col="user_id", window_days=30
    ).select(F.col("day"), F.col("n_active").alias("mau"))
    return (
        dau.join(mau, "day")
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "dau",
            "mau",
            F.round(F.col("dau") / F.col("mau").cast("double"), 4).alias(
                "stickiness"
            ),
        )
    )


_STICKINESS_SQL = """
WITH pairs AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
days AS (SELECT DISTINCT day FROM pairs),
dau AS (
  SELECT d.day, COUNT(DISTINCT p.user_id)::BIGINT AS dau
  FROM days d JOIN pairs p ON p.day = d.day GROUP BY d.day
),
mau AS (
  SELECT d.day, COUNT(DISTINCT p.user_id)::BIGINT AS mau
  FROM days d JOIN pairs p ON p.day BETWEEN d.day - 29 AND d.day
  GROUP BY d.day
)
SELECT CAST(dau.day AS TIMESTAMP) AS day, dau.dau, mau.mau,
       ROUND(CAST(dau.dau AS DOUBLE) / mau.mau, 4) AS stickiness
FROM dau JOIN mau ON mau.day = dau.day
"""


def nation_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini inequality coefficient of customer spend per nation
    (extension: concentration metrics): from the sorted-rank identity
    G = Σ(2i − n − 1)·x_i / (n·Σx). The rank i runs over PER-CUSTOMER
    aggregates partitioned by nation — the few-huge-groups hazard: the
    group COUNT is dim-bounded but each group's SIZE is
    |customers|/|nations|, data-proportional, so a naive
    ``row_number`` window would sort a data-sized slice in one task.
    :func:`grouped_gini` (operators/ordering.py) computes it with the
    bucketed rank machinery FUSED into its aggregate consumer: the
    per-bucket rank window feeds a same-keys GROUP BY (one exchange,
    no offsets join-back, global ranks never materialize), and the
    whole post-pin plan is one SQL statement (the op-chained form
    spent ~0.8 s in eager per-transformation re-analysis — plan-build
    latency, round-9 measurement). Sums are decimal-exact, the final
    ratio double — bit-identical to the per-row ROW_NUMBER oracle.
    Ties in spend get arbitrary ranks but the SUM over a tie block is
    order-invariant, so the coefficient is engine-exact."""
    from tmdb_index_spark.operators.ordering import grouped_gini

    spend = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.sum(_dec("o_totalprice")).cast("decimal(18,2)").alias("x"))
    )
    g = grouped_gini(
        spend, "x", tiebreak=["c_custkey"], partition_cols=["c_nationkey"],
        n_col="n_customers", sum_col="__sx__", gini_col="__g__",
    )
    return g.selectExpr(
        "c_nationkey",
        "n_customers",
        "ROUND(__sx__, 2) AS total_spend",
        "ROUND(__g__, 4) AS gini",
    )


_GINI_SQL = """
WITH spend AS (
  SELECT c.c_nationkey, c.c_custkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
           AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey, c.c_custkey
),
ranked AS (
  SELECT c_nationkey, x,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY x ASC, c_custkey ASC) AS i
  FROM spend
),
agg AS (
  SELECT c_nationkey,
         COUNT(*)::BIGINT AS n_customers,
         CAST(SUM(x) AS DOUBLE) AS sx,
         CAST(SUM(CAST(2 * i - 1 AS DECIMAL(18,0)) * x) AS DOUBLE) AS sw
  FROM ranked GROUP BY c_nationkey
)
SELECT c_nationkey, n_customers,
       ROUND(sx, 2) AS total_spend,
       ROUND((sw - (n_customers + 1) * sx) / (n_customers * sx), 4) AS gini
FROM agg
"""


def user_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix (extension:
    information metrics): H = −Σ p·log2 p over the user's type
    distribution — 0 bits = single-behavior users, log2(|types|) =
    perfectly mixed. Two partial-aggregated groupBys (user×type, then
    user); probabilities from integer counts so H is
    engine-reproducible."""
    counts = (
        _events(spark, sf_dir)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("__c__"))
    )
    wall = Window.partitionBy("user_id")
    p_ = F.col("__c__") / F.sum("__c__").over(wall)
    return (
        counts.select(
            "user_id",
            F.sum("__c__").over(wall).cast("bigint").alias("n_events"),
            (-p_ * F.log2(p_)).alias("__h__"),
        )
        .groupBy("user_id", "n_events")
        .agg(F.round(F.sum("__h__"), 4).alias("entropy_bits"))
        .select("user_id", "n_events", "entropy_bits")
    )


_ENTROPY_SQL = """
WITH counts AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events GROUP BY user_id, event_type
),
tot AS (
  SELECT user_id, SUM(c) AS n FROM counts GROUP BY user_id
)
SELECT c.user_id,
       CAST(t.n AS BIGINT) AS n_events,
       ROUND(SUM(-(c.c / CAST(t.n AS DOUBLE))
                 * log2(c.c / CAST(t.n AS DOUBLE))), 4) AS entropy_bits
FROM counts c JOIN tot t ON t.user_id = c.user_id
GROUP BY c.user_id, t.n
"""


def variant_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test over a deterministic A/B split (extension:
    experimentation / hypothesis testing). Variant = ``user_id % 2``
    (the hash-bucket assignment every experimentation platform uses,
    kept modulo-simple so the DuckDB oracle reproduces it); conversion
    = the user logged more ``purchase`` than ``error`` events — a
    per-user Bernoulli built purely from INTEGER counts, so p-hats and
    the pooled z statistic are engine-exact (no float aggregation
    anywhere before the final closed-form arithmetic). Plan: one
    events scan → per-user conditional-count aggregate (partial
    map-side combine) → single-row conditional rollup; nothing
    shuffles more than |users| rows and the z arithmetic is
    driver-free column math on one row."""
    per_user = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("__np__"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("__ne__"),
        )
        .select(
            F.pmod(F.col("user_id"), F.lit(2)).alias("__grp__"),
            (F.col("__np__") > F.col("__ne__"))
            .cast("int")
            .alias("__conv__"),
        )
    )
    agg = per_user.agg(
        F.sum(F.when(F.col("__grp__") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_control"),
        F.sum(F.when(F.col("__grp__") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_treatment"),
        F.sum(F.when(F.col("__grp__") == 0, F.col("__conv__")).otherwise(0))
        .cast("bigint")
        .alias("conv_control"),
        F.sum(F.when(F.col("__grp__") == 1, F.col("__conv__")).otherwise(0))
        .cast("bigint")
        .alias("conv_treatment"),
    )
    n0 = F.col("n_control").cast("double")
    n1 = F.col("n_treatment").cast("double")
    p0 = F.col("conv_control").cast("double") / n0
    p1 = F.col("conv_treatment").cast("double") / n1
    pp = (F.col("conv_control") + F.col("conv_treatment")).cast(
        "double"
    ) / (F.col("n_control") + F.col("n_treatment")).cast("double")
    z = (p1 - p0) / F.sqrt(pp * (1 - pp) * (1 / n0 + 1 / n1))
    return agg.select(
        "n_control",
        "n_treatment",
        "conv_control",
        "conv_treatment",
        F.round(p0, 4).alias("rate_control"),
        F.round(p1, 4).alias("rate_treatment"),
        F.round(z, 4).alias("z_score"),
        (F.abs(z) > 1.959964).alias("significant_95"),
    )


_ZTEST_SQL = """
WITH per_user AS (
  SELECT user_id % 2 AS grp,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 > SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY user_id
),
agg AS (
  SELECT CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_control,
         CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_treatment,
         CAST(SUM(CASE WHEN grp = 0 THEN conv ELSE 0 END) AS BIGINT)
           AS conv_control,
         CAST(SUM(CASE WHEN grp = 1 THEN conv ELSE 0 END) AS BIGINT)
           AS conv_treatment
  FROM per_user
)
SELECT n_control, n_treatment, conv_control, conv_treatment,
       ROUND(CAST(conv_control AS DOUBLE) / CAST(n_control AS DOUBLE), 4)
         AS rate_control,
       ROUND(CAST(conv_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE), 4)
         AS rate_treatment,
       ROUND((CAST(conv_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE)
              - CAST(conv_control AS DOUBLE) / CAST(n_control AS DOUBLE))
             / sqrt((CAST(conv_control + conv_treatment AS DOUBLE)
                     / CAST(n_control + n_treatment AS DOUBLE))
                    * (1 - CAST(conv_control + conv_treatment AS DOUBLE)
                           / CAST(n_control + n_treatment AS DOUBLE))
                    * (1 / CAST(n_control AS DOUBLE)
                       + 1 / CAST(n_treatment AS DOUBLE))), 4) AS z_score,
       abs((CAST(conv_treatment AS DOUBLE) / CAST(n_treatment AS DOUBLE)
            - CAST(conv_control AS DOUBLE) / CAST(n_control AS DOUBLE))
           / sqrt((CAST(conv_control + conv_treatment AS DOUBLE)
                   / CAST(n_control + n_treatment AS DOUBLE))
                  * (1 - CAST(conv_control + conv_treatment AS DOUBLE)
                         / CAST(n_control + n_treatment AS DOUBLE))
                  * (1 / CAST(n_control AS DOUBLE)
                     + 1 / CAST(n_treatment AS DOUBLE)))) > 1.959964
         AS significant_95
FROM agg
"""


_CORR_METRICS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def metric_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of the four lineitem measures
    (extension: multivariate statistics): ONE scan computes every
    sufficient statistic — n, Σx per metric, Σx·y per unordered pair —
    as a single-row partial aggregate (map-side combine; the only
    exchange moves one row), then the 6 correlations come from the
    closed form n·Σxy − Σx·Σy over √((n·Σxx − Σx²)(n·Σyy − Σy²)) and
    unpivot via ``stack``. All sums are DECIMAL-exact (measures have
    ≤2 decimals, so products are exact in DECIMAL(37,4)); both engines
    then apply the identical double-precision closed form, making the
    rounded output bit-reproducible. At 100 TB this is the
    textbook one-pass pattern: no per-pair rescans, no shuffle wider
    than one row."""
    li = _t(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for c in _CORR_METRICS:
        aggs.append(F.sum(_dec(c)).alias(f"s_{c}"))
    for i, a in enumerate(_CORR_METRICS):
        for b in _CORR_METRICS[i:]:
            aggs.append(F.sum(_dec(a) * _dec(b)).alias(f"sp_{a}_{b}"))
    stats = li.agg(*aggs)

    n = F.col("n").cast("double")

    def _corr(a: str, b: str) -> F.Column:
        num = n * F.col(f"sp_{a}_{b}").cast("double") - F.col(
            f"s_{a}"
        ).cast("double") * F.col(f"s_{b}").cast("double")
        da = n * F.col(f"sp_{a}_{a}").cast("double") - F.col(
            f"s_{a}"
        ).cast("double") * F.col(f"s_{a}").cast("double")
        db = n * F.col(f"sp_{b}_{b}").cast("double") - F.col(
            f"s_{b}"
        ).cast("double") * F.col(f"s_{b}").cast("double")
        return F.round(num / F.sqrt(da * db), 4)

    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_METRICS)
        for b in _CORR_METRICS[i + 1 :]
    ]
    stack_args: list[F.Column] = []
    for a, b in pairs:
        stack_args.extend(
            [
                F.lit(a.replace("l_", "")),
                F.lit(b.replace("l_", "")),
                _corr(a, b),
            ]
        )
    return stats.select(
        F.stack(
            F.lit(len(pairs)), *stack_args
        ).alias("metric_a", "metric_b", "corr")
    )


def _corr_sql() -> str:
    sums = ",\n         ".join(
        [f"SUM(CAST({c} AS DECIMAL(18,2))) AS s_{c}" for c in _CORR_METRICS]
        + [
            f"SUM(CAST({a} AS DECIMAL(18,2)) * CAST({b} AS DECIMAL(18,2)))"
            f" AS sp_{a}_{b}"
            for i, a in enumerate(_CORR_METRICS)
            for b in _CORR_METRICS[i:]
        ]
    )
    rows = []
    for i, a in enumerate(_CORR_METRICS):
        for b in _CORR_METRICS[i + 1 :]:
            nd = "CAST(n AS DOUBLE)"
            num = (
                f"{nd} * CAST(sp_{a}_{b} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE)"
            )
            da = (
                f"{nd} * CAST(sp_{a}_{a} AS DOUBLE)"
                f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE)"
            )
            db = (
                f"{nd} * CAST(sp_{b}_{b} AS DOUBLE)"
                f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)"
            )
            rows.append(
                f"SELECT '{a[2:]}' AS metric_a, '{b[2:]}' AS metric_b,\n"
                f"       ROUND(({num}) / sqrt(({da}) * ({db})), 4) AS corr\n"
                f"FROM stats"
            )
    return (
        "WITH stats AS (\n"
        "  SELECT CAST(COUNT(*) AS BIGINT) AS n,\n"
        f"         {sums}\n"
        "  FROM lineitem\n"
        ")\n" + "\nUNION ALL\n".join(rows)
    )


_CORR_MATRIX_SQL = _corr_sql()


def bloom_prefilter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction
    (:mod:`tmdb_index_spark.operators.bloom`; extension: scale
    infrastructure): revenue from lineitems of one part brand, where
    the fact scan first tests a CONSTANT-SIZE bitmap built from the
    dim keys (m = 2^ceil(log2(16·n)) bits, k = 3 portable md5 hashes)
    instead of joining — the pattern that at 100 TB discards ~all
    non-matching fact rows map-side before any shuffle. The query
    reports the bloom pass count, the exact match count (residual
    broadcast join — bloom guarantees no false negatives), the false
    positive count/rate, and the exact matched revenue; the DuckDB
    oracle reproduces the bitmap semantics as set membership over the
    same md5 positions, so the probabilistic structure itself is
    value-checked, not just the final revenue."""
    from tmdb_index_spark.operators.bloom import (
        auto_m_bits,
        build_bloom,
        with_bloom_flag,
    )

    dim = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#11")
        .select("p_partkey")
        .distinct()
    )
    n_keys = dim.count()  # dim-side scalar (bitmap sizing), never fact-side
    m_bits = auto_m_bits(n_keys, bits_per_key=16)
    bitmap = build_bloom(dim, "p_partkey", m_bits, k_hashes=3)

    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice"
    )
    joined = li.join(
        F.broadcast(dim.withColumn("__hit__", F.lit(1))),
        li.l_partkey == dim.p_partkey,
        "left",
    )
    flagged = with_bloom_flag(
        joined, "l_partkey", bitmap, m_bits, k_hashes=3
    )
    exact = F.col("__hit__").isNotNull()
    return flagged.agg(
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_bloom_pass"),
        F.sum(F.when(exact, 1).otherwise(0)).cast("bigint").alias("n_exact"),
        F.sum(F.when(F.col("bloom_pass") & ~exact, 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_pos"),
        F.round(
            F.sum(F.when(F.col("bloom_pass") & ~exact, 1).otherwise(0))
            .cast("double")
            / F.nullif(
                F.sum(F.when(~exact, 1).otherwise(0)).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("fp_rate"),
        F.round(
            F.sum(F.when(exact, _dec("l_extendedprice"))).cast("double"), 2
        ).alias("matched_revenue"),
    )


_BLOOM_SQL = """
WITH dimkeys AS (
  SELECT DISTINCT p_partkey FROM part WHERE p_brand = 'Brand#11'
),
m AS (
  SELECT CAST(POWER(2, GREATEST(4, CEIL(LOG2(16 * COUNT(*))))) AS BIGINT)
           AS m
  FROM dimkeys
),
pos AS (
  SELECT DISTINCT
         ('0x' || substr(md5(CAST(p_partkey AS VARCHAR) || s.suffix), 1, 15))
           ::BIGINT % m.m AS p
  FROM dimkeys, m, (VALUES (''), ('#1'), ('#2')) AS s(suffix)
),
fact AS (
  SELECT l_partkey, l_extendedprice,
         ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
           ::BIGINT % (SELECT m FROM m) AS p0,
         ('0x' || substr(md5(CAST(l_partkey AS VARCHAR) || '#1'), 1, 15))
           ::BIGINT % (SELECT m FROM m) AS p1,
         ('0x' || substr(md5(CAST(l_partkey AS VARCHAR) || '#2'), 1, 15))
           ::BIGINT % (SELECT m FROM m) AS p2
  FROM lineitem
),
flags AS (
  SELECT l_partkey, l_extendedprice,
         (p0 IN (SELECT p FROM pos)
          AND p1 IN (SELECT p FROM pos)
          AND p2 IN (SELECT p FROM pos)) AS bloom_pass,
         l_partkey IN (SELECT p_partkey FROM dimkeys) AS exact_match
  FROM fact
)
SELECT CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bloom_pass,
       CAST(SUM(CASE WHEN exact_match THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact,
       CAST(SUM(CASE WHEN bloom_pass AND NOT exact_match THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       ROUND(CAST(SUM(CASE WHEN bloom_pass AND NOT exact_match
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / NULLIF(CAST(SUM(CASE WHEN NOT exact_match THEN 1 ELSE 0 END)
                           AS DOUBLE), 0), 6) AS fp_rate,
       ROUND(CAST(SUM(CASE WHEN exact_match
                           THEN CAST(l_extendedprice AS DECIMAL(18,2))
                      END) AS DOUBLE), 2) AS matched_revenue
FROM flags
"""


def bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional bigram cross-entropy per document (extension:
    language-model quality scoring —
    :func:`~tmdb_index_spark.operators.llm_prep.bigram_logprob`): mean
    −log2 P(wᵢ|wᵢ₋₁) from the corpus's own adjacent-bigram counts.
    Complements `unigram_surprisal` (bag-of-words) with transition
    predictability: templates score near 0 bits. One zip_with bigram
    Generate + vocabulary-keyed aggregations/joins only."""
    from tmdb_index_spark.operators.llm_prep import bigram_logprob

    return bigram_logprob(_t(spark, sf_dir, "documents"))


_BIGRAM_PPL_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(
           regexp_split_to_array(trim(coalesce(text, '')), '\\s+'),
           x -> x <> ''
         ) AS ts
  FROM documents
),
bg AS (
  SELECT doc_id, ts[i] AS ta, ts[i + 1] AS tb
  FROM t, UNNEST(range(1, len(ts))) AS u(i)
  WHERE len(ts) >= 2
),
pc AS (SELECT ta, tb, COUNT(*)::BIGINT AS cab FROM bg GROUP BY ta, tb),
fc AS (SELECT ta, SUM(cab) AS ca FROM pc GROUP BY ta)
SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams,
       ROUND(AVG(-log2(CAST(cab AS DOUBLE) / CAST(ca AS DOUBLE))), 4)
         AS mean_neg_log2p
FROM bg JOIN pc USING (ta, tb) JOIN fc USING (ta)
GROUP BY doc_id
"""


def ewma_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponentially-weighted moving average of daily event
    value (extension: exponential smoothing / short-horizon forecast):
    ewma_d = Σₖ₌₀¹³ 0.7ᵏ·x_{d−k} / Σ 0.7ᵏ over the trailing 14 days
    that EXIST (the weight mass renormalizes over observed days, so
    series starts and gaps are handled without imputation). The
    recursion is rewritten as a BOUNDED fan-out: each day explodes
    into the ≤14 future days it contributes to (one Generate on the
    |days|-sized aggregate, never the events table), then an equi-join
    groupBy — no non-equi range join, no window with
    position-dependent weights, nothing proportional to |events| after
    the daily rollup. Weights 0.7ᵏ for integer k are identical doubles
    in any engine; daily sums are decimal-exact first."""
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.sum(_dec("value")).cast("double").alias("day_value"))
    )
    contrib = daily.select(
        F.col("day").alias("__src__"),
        F.col("day_value").alias("__v__"),
        F.explode(F.sequence(F.lit(0), F.lit(13))).alias("__k__"),
    ).select(
        F.timestamp_add("DAY", F.col("__k__"), F.col("__src__")).alias(
            "day"
        ),
        F.col("__v__"),
        F.pow(F.lit(0.7), F.col("__k__")).alias("__w__"),
    )
    sm = contrib.groupBy("day").agg(
        F.sum(F.col("__v__") * F.col("__w__")).alias("__num__"),
        F.sum("__w__").alias("__den__"),
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
    )
    return daily.join(sm, "day").select(
        "day",
        F.round(F.col("day_value"), 2).alias("actual"),
        F.round(F.col("__num__") / F.col("__den__"), 4).alias("ewma_14d"),
        "n_terms",
    )


_EWMA_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
  FROM events GROUP BY 1
),
contrib AS (
  SELECT d.day + u.k * INTERVAL 1 DAY AS day, d.day_value,
         POWER(0.7, u.k) AS w
  FROM daily d, UNNEST(range(0, 14)) AS u(k)
),
sm AS (
  SELECT day, SUM(day_value * w) AS num, SUM(w) AS den,
         COUNT(*)::BIGINT AS n_terms
  FROM contrib GROUP BY day
)
SELECT d.day, ROUND(d.day_value, 2) AS actual,
       ROUND(s.num / s.den, 4) AS ewma_14d, s.n_terms
FROM daily d JOIN sm s ON s.day = d.day
"""


def clamped_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-overdraft running balance per user (extension: non-associative
    scan made window-expressible): bᵢ = max(0, bᵢ₋₁ + dᵢ) looks like a
    sequential per-key recursion — the class of operator that usually
    forces applyInPandas — but the Lindley recursion has the exact
    reflection closed form  bₙ = Sₙ − min(0, min_{k≤n} Sₖ)  over plain
    prefix sums, so it compiles to TWO stacked windows in ONE
    user-keyed sort (cumsum, then prefix-min of the cumsum): one
    Exchange, no Python, no iteration. Deltas: view/click/signup
    credit ``value``, purchase/error debit it; every sum is
    DECIMAL-exact, so final/clamped amounts are engine-exact. Output
    per user: final balance, net flow, and the cumulative amount
    truncated by the zero floor (their difference)."""
    ev = _events(spark, sf_dir)
    delta = F.when(
        F.col("event_type").isin("view", "click", "signup"),
        _dec("value"),
    ).otherwise(-_dec("value"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(delta).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("__s__"),
    )
    run = run.select(
        "user_id",
        "ts",
        "event_id",
        "__s__",
        F.least(
            F.lit(0).cast("decimal(18,2)"),
            F.min("__s__").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        ).alias("__low__"),
    )
    last = run.select(
        "user_id",
        "__s__",
        "__low__",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy(
                F.col("ts").desc(), F.col("event_id").desc()
            )
        ).alias("__rn__"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias(
            "__n__"
        ),
    ).filter(F.col("__rn__") == 1)
    return last.select(
        "user_id",
        F.col("__n__").cast("bigint").alias("n_events"),
        F.col("__s__").cast("double").alias("net_flow"),
        (F.col("__s__") - F.col("__low__")).cast("double").alias(
            "final_balance"
        ),
        (F.lit(0).cast("decimal(18,2)") - F.col("__low__"))
        .cast("double")
        .alias("clamped_amount"),
    )


_CLAMPED_BALANCE_SQL = """
WITH run AS (
  SELECT user_id, ts, event_id,
         SUM(CASE WHEN event_type IN ('view', 'click', 'signup')
                  THEN CAST(value AS DECIMAL(18,2))
                  ELSE -CAST(value AS DECIMAL(18,2)) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM events
),
low AS (
  SELECT user_id, ts, event_id, s,
         LEAST(CAST(0 AS DECIMAL(38,2)),
               MIN(s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW)) AS lw,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM run
)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       CAST(s AS DOUBLE) AS net_flow,
       CAST(CAST(s AS DECIMAL(28,2)) - CAST(lw AS DECIMAL(28,2)) AS DOUBLE)
         AS final_balance,
       CAST(CAST(0 AS DECIMAL(28,2)) - CAST(lw AS DECIMAL(28,2)) AS DOUBLE)
         AS clamped_amount
FROM low WHERE rn = 1
"""


def click_purchase_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between two daily series (extension:
    temporal causality screening): Pearson r of (clicks on day d,
    purchase value on day d+lag) for every lag in −7..+7 — the
    does-engagement-precede-spend diagnostic; `revenue_autocorrelation`
    is the self-series special case. The lag alignment is a BOUNDED
    15-way explode on the |days|-sized rollup followed by an equi-join
    (never a non-equi range join); per-lag correlations come from
    sufficient statistics that are integer/DECIMAL-exact, so r is
    engine-reproducible. Output: one row per lag with the overlap
    length and r."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).cast("long").alias("clicks"),
        F.sum(
            F.when(F.col("event_type") == "purchase", _dec("value")).otherwise(
                F.lit(0).cast("decimal(18,2)")
            )
        ).alias("pval"),
    )
    x = daily.select(
        F.col("day").alias("__xd__"),
        F.col("clicks").alias("__x__"),
        F.explode(F.sequence(F.lit(-7), F.lit(7))).alias("lag"),
    ).select(
        "lag",
        "__x__",
        F.timestamp_add("DAY", F.col("lag"), F.col("__xd__")).alias("day"),
    )
    pairs = x.join(
        daily.select("day", F.col("pval").alias("__y__")), "day"
    )
    stats = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("__x__").cast("double").alias("__sx__"),
        F.sum("__y__").cast("double").alias("__sy__"),
        F.sum(F.col("__x__") * F.col("__x__")).cast("double").alias("__sxx__"),
        F.sum(F.col("__y__") * F.col("__y__")).cast("double").alias("__syy__"),
        F.sum(
            F.col("__x__").cast("decimal(18,0)") * F.col("__y__")
        ).cast("double").alias("__sxy__"),
    )
    n = F.col("n_days").cast("double")
    num = n * F.col("__sxy__") - F.col("__sx__") * F.col("__sy__")
    den = F.sqrt(
        (n * F.col("__sxx__") - F.col("__sx__") * F.col("__sx__"))
        * (n * F.col("__syy__") - F.col("__sy__") * F.col("__sy__"))
    )
    return stats.select(
        F.col("lag").cast("bigint").alias("lag"),
        "n_days",
        F.round(num / den, 4).alias("xcorr"),
    )


_LEADLAG_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS clicks,
         SUM(CASE WHEN event_type = 'purchase'
                  THEN CAST(value AS DECIMAL(18,2))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS pval
  FROM events GROUP BY 1
),
x AS (
  SELECT u.lag, d.clicks AS xv,
         d.day + u.lag * INTERVAL 1 DAY AS day
  FROM daily d, UNNEST(range(-7, 8)) AS u(lag)
),
pairs AS (
  SELECT x.lag, x.xv, y.pval AS yv
  FROM x JOIN daily y ON y.day = x.day
),
stats AS (
  SELECT lag, COUNT(*)::BIGINT AS n_days,
         CAST(SUM(xv) AS DOUBLE) AS sx,
         CAST(SUM(yv) AS DOUBLE) AS sy,
         CAST(SUM(xv * xv) AS DOUBLE) AS sxx,
         CAST(SUM(yv * yv) AS DOUBLE) AS syy,
         CAST(SUM(CAST(xv AS DECIMAL(18,0)) * yv) AS DOUBLE) AS sxy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, n_days,
       ROUND((CAST(n_days AS DOUBLE) * sxy - sx * sy)
             / sqrt((CAST(n_days AS DOUBLE) * sxx - sx * sx)
                    * (CAST(n_days AS DOUBLE) * syy - sy * sy)), 4)
         AS xcorr
FROM stats
"""


_FD_CANDIDATES = [
    ("l_orderkey", "l_returnflag"),
    ("l_orderkey", "l_shipdate"),
    ("l_partkey", "l_suppkey"),
    ("l_suppkey", "l_partkey"),
]


def fd_discovery_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery
    (:func:`~tmdb_index_spark.operators.checks.fd_profile`; extension:
    data-contract profiling): measure how close each candidate
    ``lhs → rhs`` dependency comes to holding on lineitem — distinct
    groups, violating groups/rows, violation rate. The discovery
    complement of `dq_summary`'s declarative checks: contracts you
    MIGHT be able to assert, found from data. Two stacked
    partial-aggregated groupBys per candidate; work bounded by
    distinct pair counts, never row count."""
    from tmdb_index_spark.operators.checks import fd_profile

    return fd_profile(_t(spark, sf_dir, "lineitem"), _FD_CANDIDATES)


def _fd_sql() -> str:
    blocks = []
    for lhs, rhs in _FD_CANDIDATES:
        blocks.append(
            f"""SELECT '{lhs}->{rhs}' AS candidate,
       COUNT(*)::BIGINT AS n_groups,
       CAST(SUM(CASE WHEN nrhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_groups,
       CAST(SUM(CASE WHEN nrhs > 1 THEN grows ELSE 0 END) AS BIGINT)
         AS n_violating_rows,
       ROUND(CAST(SUM(CASE WHEN nrhs > 1 THEN grows ELSE 0 END) AS DOUBLE)
             / CAST(SUM(grows) AS DOUBLE), 6) AS violation_rate
FROM (
  SELECT {lhs}, COUNT(*) AS nrhs, SUM(rows_) AS grows
  FROM (
    SELECT {lhs}, {rhs}, COUNT(*) AS rows_
    FROM lineitem GROUP BY {lhs}, {rhs}
  ) GROUP BY {lhs}
)"""
        )
    return "\nUNION ALL\n".join(blocks)


_FD_SQL = _fd_sql()


def dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal decomposition of daily event value
    (extension: seasonality analysis): per-weekday mean daily value
    and the seasonal index (weekday mean over overall mean — the
    multiplicative seasonal factor of classical decomposition). The
    weekday is derived as ``datediff(day, 1970-01-01) % 7`` (epoch day
    zero was a Thursday) — pure integer arithmetic identical in any
    engine, sidestepping the engines' incompatible dayofweek
    numbering. Two tiny aggregates over the |days| rollup; the
    overall mean broadcasts as one row."""
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.sum(_dec("value")).alias("__v__"))
    )
    labels = F.array(
        *[F.lit(d) for d in ["Thu", "Fri", "Sat", "Sun", "Mon", "Tue", "Wed"]]
    )
    per_dow = daily.select(
        F.pmod(
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")),
            F.lit(7),
        ).alias("dow_idx"),
        "__v__",
    ).groupBy("dow_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        (F.sum("__v__").cast("double") / F.count(F.lit(1))).alias(
            "__dm__"
        ),
    )
    overall = daily.agg(
        (F.sum("__v__").cast("double") / F.count(F.lit(1))).alias("__om__")
    )
    return (
        per_dow.crossJoin(F.broadcast(overall))
        .select(
            F.col("dow_idx").cast("bigint").alias("dow_idx"),
            F.element_at(labels, F.col("dow_idx").cast("int") + 1).alias(
                "weekday"
            ),
            "n_days",
            F.round(F.col("__dm__"), 2).alias("mean_daily_value"),
            F.round(F.col("__dm__") / F.col("__om__"), 4).alias(
                "seasonal_index"
            ),
        )
    )


_DOW_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         SUM(CAST(value AS DECIMAL(18,2))) AS v
  FROM events GROUP BY 1
),
per_dow AS (
  SELECT datediff('day', TIMESTAMP '1970-01-01', day) % 7 AS dow_idx,
         COUNT(*)::BIGINT AS n_days,
         CAST(SUM(v) AS DOUBLE) / COUNT(*) AS dm
  FROM daily GROUP BY 1
),
overall AS (
  SELECT CAST(SUM(v) AS DOUBLE) / COUNT(*) AS om FROM daily
)
SELECT CAST(dow_idx AS BIGINT) AS dow_idx,
       (['Thu', 'Fri', 'Sat', 'Sun', 'Mon', 'Tue', 'Wed'])[dow_idx + 1]
         AS weekday,
       n_days,
       ROUND(dm, 2) AS mean_daily_value,
       ROUND(dm / om, 4) AS seasonal_index
FROM per_dow, overall
"""


def signup_conversion_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for signup→high-value-purchase
    conversion (extension: survival analysis with right censoring):
    time-to-event = hours from first signup to first purchase with
    value > 150; users who never convert are CENSORED at the dataset
    horizon — the estimator S(t) = Π(1 − dᵤ/nᵤ) uses their at-risk
    time without counting them as conversions, which a naive
    conversion-rate query gets wrong. All timestamps reduce to integer
    epoch-second floors and integer hour division, so event times,
    at-risk counts, and hazards are engine-exact; the only float is
    the log-sum product form of S(t), cumulated over the |distinct
    times| aggregate (a few hundred rows — the ordered window never
    touches the events table). Output: one row per conversion time
    with at-risk count, conversions, hazard, and survival."""
    ev = _events(spark, sf_dir)
    su = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("__s__")
    ).filter(F.col("__s__").isNotNull())
    conv = (
        ev.join(su, "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("value") > 150)
            & (F.col("ts") >= F.col("__s__"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("__p__"))
    )
    gmax = ev.agg(F.max("ts").alias("__g__"))
    obs = (
        su.join(conv, "user_id", "left")
        .crossJoin(F.broadcast(gmax))
        .select(
            F.expr(
                "CAST((unix_timestamp(coalesce(__p__, __g__))"
                " - unix_timestamp(__s__)) DIV 3600 AS BIGINT)"
            ).alias("t_hours"),
            F.when(F.col("__p__").isNotNull(), 1).otherwise(0).alias(
                "__ev__"
            ),
        )
    )
    tot = obs.agg(F.count(F.lit(1)).alias("__n__"))
    bytime = (
        obs.groupBy("t_hours")
        .agg(
            F.count(F.lit(1)).alias("__call__"),
            F.sum("__ev__").alias("__d__"),
        )
        .crossJoin(F.broadcast(tot))
    )
    w = Window.orderBy("t_hours").rowsBetween(
        Window.unboundedPreceding, 0
    )
    risked = bytime.select(
        "t_hours",
        "__d__",
        (
            F.col("__n__")
            - F.sum("__call__").over(w)
            + F.col("__call__")
        ).alias("__nr__"),
    )
    term = F.when(
        F.col("__d__") > 0,
        F.log(
            1
            - F.col("__d__").cast("double") / F.col("__nr__").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    curved = risked.select(
        "t_hours",
        "__d__",
        "__nr__",
        F.exp(F.sum(term).over(w)).alias("__surv__"),
    )
    return curved.filter(F.col("__d__") > 0).select(
        "t_hours",
        F.col("__nr__").cast("bigint").alias("n_at_risk"),
        F.col("__d__").cast("bigint").alias("n_converted"),
        F.round(
            F.col("__d__").cast("double") / F.col("__nr__").cast("double"),
            6,
        ).alias("hazard"),
        F.round(F.col("__surv__"), 4).alias("survival"),
    )


_SURVIVAL_SQL = """
WITH su AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS s
  FROM events GROUP BY user_id
  HAVING MIN(CASE WHEN event_type = 'signup' THEN ts END) IS NOT NULL
),
conv AS (
  SELECT e.user_id, MIN(e.ts) AS p
  FROM events e JOIN su ON su.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.value > 150 AND e.ts >= su.s
  GROUP BY e.user_id
),
g AS (SELECT MAX(ts) AS gm FROM events),
obs AS (
  SELECT (CAST(floor(epoch(COALESCE(c.p, g.gm))) AS BIGINT)
          - CAST(floor(epoch(su.s)) AS BIGINT)) // 3600 AS t_hours,
         CASE WHEN c.p IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM su LEFT JOIN conv c ON c.user_id = su.user_id CROSS JOIN g
),
tot AS (SELECT COUNT(*) AS n FROM obs),
bytime AS (
  SELECT t_hours, COUNT(*) AS c_all, SUM(ev) AS d
  FROM obs GROUP BY t_hours
),
risked AS (
  SELECT t_hours, d,
         tot.n - SUM(c_all) OVER (ORDER BY t_hours
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) + c_all AS nr
  FROM bytime, tot
),
curved AS (
  SELECT t_hours, d, nr,
         exp(SUM(CASE WHEN d > 0
                      THEN ln(1 - CAST(d AS DOUBLE) / CAST(nr AS DOUBLE))
                      ELSE 0.0 END)
             OVER (ORDER BY t_hours
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
           AS surv
  FROM risked
)
SELECT t_hours, CAST(nr AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS n_converted,
       ROUND(CAST(d AS DOUBLE) / CAST(nr AS DOUBLE), 6) AS hazard,
       ROUND(surv, 4) AS survival
FROM curved WHERE d > 0
"""


def dedup_canonical_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup canonicalization — the APPLY step of deduplication
    (extension: corpus rewrite): for every SimHash near-dup component
    (`dedup_groups`'s connected components), elect the canonical
    representative (longest document, doc_id tiebreak) and emit the
    doc→canonical mapping the rewrite pass joins against. Composition
    reuse: pigeonhole-blocked pair search → pointer-jump components →
    one component-keyed window; the mapping is |clustered docs| rows,
    never the corpus."""
    from tmdb_index_spark.operators.dedup_text import simhash_neardup_pairs
    from tmdb_index_spark.operators.graph import connected_components

    docs = _t(spark, sf_dir, "documents")
    pairs = simhash_neardup_pairs(docs, max_hamming=2)
    comp = connected_components(pairs).select(
        F.col("node").alias("doc_id"), "component"
    )
    sized = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    ranked = sized.select(
        "doc_id",
        "component",
        F.row_number().over(w).alias("__rn__"),
    )
    canon = ranked.filter(F.col("__rn__") == 1).select(
        "component", F.col("doc_id").alias("canonical_id")
    )
    return (
        ranked.join(canon, "component")
        .select(
            "doc_id",
            F.col("component").cast("bigint").alias("component"),
            F.col("canonical_id").cast("bigint").alias("canonical_id"),
            (F.col("doc_id") == F.col("canonical_id")).alias(
                "is_canonical"
            ),
        )
    )


_CANONICAL_SQL = f"""
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
),
comp AS (
  SELECT a AS doc_id, LEAST(a, MIN(b)) AS component FROM reach GROUP BY a
),
ranked AS (
  SELECT c.doc_id, c.component,
         ROW_NUMBER() OVER (PARTITION BY c.component
                            ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn
  FROM comp c JOIN documents d ON d.doc_id = c.doc_id
),
canon AS (
  SELECT component, doc_id AS canonical_id FROM ranked WHERE rn = 1
)
SELECT r.doc_id, CAST(r.component AS BIGINT) AS component,
       CAST(c.canonical_id AS BIGINT) AS canonical_id,
       r.doc_id = c.canonical_id AS is_canonical
FROM ranked r JOIN canon c ON c.component = r.component
"""


def robust_trend_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonparametric trend estimation on daily revenue (extension:
    robust regression — the outlier-immune complement of
    `user_value_trends`' OLS): Theil-Sen slope (median of all pairwise
    slopes) and the Mann-Kendall S / τ trend test (sign counts —
    pure integers).

    Execution strategy (round-7 final form): the |days| rollup is
    CALENDAR-BOUNDED — ten years is 3650 rows, a century 36k — so the
    rollup collects to the driver (the same bounded-collect rule as
    the bloom bitmap and the k-means sample) and the |days|²/2 slope
    grid evaluates as row-chunked numpy. This replaced two distributed
    spellings that were pure overhead at any scale: the BNLJ +
    ``percentile`` form (10.4 s — the aggregate's count-map merge is
    single-threaded) and the BNLJ + bucketed-rank locate (~9 s — six
    bounded jobs over a 2.9M-row grid the driver computes in 0.2 s).
    A data-proportional frame must still use
    :func:`~tmdb_index_spark.operators.ordering.grouped_rank`; this
    fast path is justified ONLY by the calendar bound, stated here.

    Cross-engine exactness: daily sums stay decimal and move as
    integer CENTS (decimal(18,2)·100 — exact int64), so the slope is
    double(cents_diff)/100/gap — bit-identical to both engines'
    decimal-difference-then-cast. The median interpolates
    lo + 0.5·(hi − lo) over the two middle order statistics (the same
    formula both engines' exact percentile uses), and the final
    ROUNDING runs in Spark on literal columns so ROUND semantics
    match the previous in-engine form."""
    import numpy as np

    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(
            (F.sum(_dec("o_totalprice")) * 100)
            .cast("bigint")
            .alias("__cents__")
        )
        .filter(F.col("day").isNotNull())
        .select(
            F.datediff(
                F.col("day").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("__dayidx__"),
            "__cents__",
        )
    )
    # NULL order dates are excluded BEFORE pair formation — identical
    # to the oracle, whose a.day < b.day join never matches NULL.
    # The rollup is calendar-bounded (one row per DAY with orders):
    # 15k rows ≈ 40 years, the documented envelope of the driver-side
    # slope grid below (|days|²/2 pairs, ~5 GB at a century) — past it
    # the distributed grouped_rank spelling is the right form, so the
    # bound failing loudly IS the design.
    from tmdb_index_spark.operators.materialize import bounded_collect

    rows = bounded_collect(daily, 15_000, "robust-trend daily rollup")
    rows.sort(key=lambda r: r["__dayidx__"])
    d = np.array([r["__dayidx__"] for r in rows], dtype="int64")
    c = np.array([r["__cents__"] for r in rows], dtype="int64")
    n = len(d)
    n_pairs = int(n * (n - 1) // 2)
    # one pre-allocated slope buffer (8·n²/2 bytes: 53 MB per decade
    # of days, ~5 GB at a full century — the practical driver envelope;
    # beyond ~40 years switch back to the distributed grouped_rank
    # spelling) — filling slices avoids np.concatenate's transient
    # second copy
    slopes = np.empty(n_pairs, dtype="float64")
    mk_s = 0
    pos = 0
    chunk = max(1, int(2e7 // max(n, 1)))
    for s in range(0, n, chunk):
        blk = slice(s, min(s + chunk, n))
        dc = (c[None, :] - c[blk][:, None]).astype("float64") / 100.0
        gap = (d[None, :] - d[blk][:, None]).astype("float64")
        upper = d[None, :] > d[blk][:, None]
        part = dc[upper] / gap[upper]
        slopes[pos:pos + len(part)] = part
        pos += len(part)
        mk_s += int(np.sign(dc[upper]).sum())
    if n_pairs:
        slopes.sort(kind="stable")
        lo = slopes[(n_pairs + 1) // 2 - 1]
        hi = slopes[(n_pairs + 2) // 2 - 1]
        theil = float(lo + 0.5 * (hi - lo))
        tau = mk_s / n_pairs
    else:
        theil, tau = None, None
    out = spark.createDataFrame(
        [(n_pairs, theil, mk_s, float(tau) if tau is not None else None)],
        "n_pairs bigint, __t__ double, mk_s bigint, __tau__ double",
    )
    return out.select(
        "n_pairs",
        F.round(F.col("__t__"), 4).alias("theil_sen_slope"),
        "mk_s",
        F.round(F.col("__tau__"), 4).alias("mk_tau"),
    )


_ROBUST_TREND_SQL = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS v
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT CAST(b.v - a.v AS DOUBLE)
           / CAST(datediff('day', a.day, b.day) AS DOUBLE) AS slope,
         CAST(sign(CAST(b.v - a.v AS DOUBLE)) AS INTEGER) AS sgn
  FROM daily a JOIN daily b ON a.day < b.day
)
SELECT COUNT(*)::BIGINT AS n_pairs,
       ROUND(quantile_cont(slope, 0.5), 4) AS theil_sen_slope,
       CAST(SUM(sgn) AS BIGINT) AS mk_s,
       ROUND(CAST(SUM(sgn) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4)
         AS mk_tau
FROM pairs
"""


def orders_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table reconciliation audit (extension: financial-close
    style consistency checking — distinct from `fd_discovery`'s
    intra-table rules and `orders_checksum`'s table digests): compare
    each order's header total against the DECIMAL-exact net line total
    Σ extendedprice·(1−discount)·(1+tax) — the TPC-H definition of
    ``o_totalprice``, so on conformant data a clean close reports ~0
    mismatches — and report how many orders disagree beyond a cent,
    plus the delta distribution. NOTE on the synthetic fixtures: the
    test generator draws ``o_totalprice`` independently of lineitem
    (verified: header totals do not equal ANY line aggregate), so
    there the audit correctly reports ~100% mismatch — that is the
    fixture's property, not a query bug (ADVICE r6). One fact-side
    aggregate co-partitioned on the join key, a header hash join, and
    a single-row rollup; every amount stays decimal until the final
    output cast."""
    net = (
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
        * (F.lit(1).cast("decimal(18,2)") + _dec("l_tax"))
    )
    lines = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(net).cast("decimal(28,6)").alias("__lsum__"))
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", _dec("o_totalprice").alias("__tot__")
    )
    joined = orders.join(
        lines, orders.o_orderkey == lines.l_orderkey, "left"
    ).select(
        F.coalesce(
            F.col("__lsum__"), F.lit(0).cast("decimal(28,6)")
        ).alias("__lsum__"),
        "__tot__",
    )
    delta = (
        F.col("__tot__").cast("decimal(30,6)")
        - F.col("__lsum__").cast("decimal(30,6)")
    )
    mism = F.abs(delta) > 0.01
    return joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.when(mism, 1).otherwise(0)).cast("bigint").alias(
            "n_mismatched"
        ),
        F.round(
            F.sum(F.when(mism, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mismatch_rate"),
        F.max(F.abs(delta)).cast("double").alias("max_abs_delta"),
        F.sum(delta).cast("double").alias("net_delta"),
    )


_RECONCILE_SQL = """
WITH lines AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))
                  * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DECIMAL(28,6))
           AS lsum
  FROM lineitem GROUP BY l_orderkey
),
joined AS (
  SELECT CAST(o.o_totalprice AS DECIMAL(30,6))
           - CAST(COALESCE(l.lsum, 0) AS DECIMAL(30,6)) AS delta
  FROM orders o LEFT JOIN lines l ON l.l_orderkey = o.o_orderkey
)
SELECT COUNT(*)::BIGINT AS n_orders,
       CAST(SUM(CASE WHEN ABS(delta) > 0.01 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_mismatched,
       ROUND(CAST(SUM(CASE WHEN ABS(delta) > 0.01 THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS mismatch_rate,
       CAST(MAX(ABS(delta)) AS DOUBLE) AS max_abs_delta,
       CAST(SUM(delta) AS DOUBLE) AS net_delta
FROM joined
"""


def user_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (extension: behavioral scoring — the
    classic recency/frequency/monetary quintile model): per user, days
    since last purchase, purchase count, and decimal-exact purchase
    value, each scored into quintiles (5 = best) and concatenated into
    the familiar segment label. Every ``ntile`` orders with a user_id
    tiebreak — ntile on ties is otherwise ORDER-DEPENDENT and would
    break cross-engine reproducibility. The |users| rollup is
    DATA-PROPORTIONAL, so the three quintile scores come from
    :func:`grouped_ntile` (operators/ordering.py) — bucketed exact
    ranks plus the closed-form tile rule, bit-identical to the naive
    ``ntile(5) OVER (ORDER BY ...)`` the oracle runs, with no
    single-partition WindowExec anywhere on the data path."""
    ev = _events(spark, sf_dir)
    gmax = ev.agg(
        F.date_trunc("day", F.max("ts")).alias("__g__")
    )
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.date_trunc("day", F.max("ts")).alias("__last__"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(_dec("value")).alias("__m__"),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            "user_id",
            F.datediff(F.col("__g__"), F.col("__last__"))
            .cast("bigint")
            .alias("recency_days"),
            "frequency",
            F.col("__m__").cast("double").alias("monetary"),
        )
    )
    from tmdb_index_spark.operators.ordering import grouped_ntile_multi

    # FUSED multi-key ntile (round-8 VERDICT #4): one cuts aggregate,
    # one pinned tagged frame, three chained bucket windows — no
    # per-score shuffle join back onto the rollup (the round-7
    # three-branch spelling paid three of them).
    scored = grouped_ntile_multi(
        per_user,
        5,
        [
            ("recency_days", False, "r_score"),
            ("frequency", True, "f_score"),
            ("monetary", True, "m_score"),
        ],
        tiebreak=["user_id"],
    )
    scored = scored.select(
        "user_id",
        "recency_days",
        "frequency",
        F.round("monetary", 2).alias("monetary"),
        F.col("r_score").cast("bigint").alias("r_score"),
        F.col("f_score").cast("bigint").alias("f_score"),
        F.col("m_score").cast("bigint").alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.concat_ws(
            "-",
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


_RFM_SQL = """
WITH g AS (SELECT date_trunc('day', MAX(ts)) AS gm FROM events),
per_user AS (
  SELECT user_id,
         CAST(datediff('day', date_trunc('day', MAX(ts)), g.gm) AS BIGINT)
           AS recency_days,
         COUNT(*)::BIGINT AS frequency,
         SUM(CAST(value AS DECIMAL(18,2))) AS m
  FROM events, g
  WHERE event_type = 'purchase'
  GROUP BY user_id, g.gm
)
SELECT user_id, recency_days, frequency,
       ROUND(CAST(m AS DOUBLE), 2) AS monetary,
       CAST(NTILE(5) OVER (ORDER BY recency_days DESC, user_id ASC)
            AS BIGINT) AS r_score,
       CAST(NTILE(5) OVER (ORDER BY frequency ASC, user_id ASC)
            AS BIGINT) AS f_score,
       CAST(NTILE(5) OVER (ORDER BY CAST(m AS DOUBLE) ASC, user_id ASC)
            AS BIGINT) AS m_score,
       CONCAT_WS('-',
         CAST(NTILE(5) OVER (ORDER BY recency_days DESC, user_id ASC)
              AS VARCHAR),
         CAST(NTILE(5) OVER (ORDER BY frequency ASC, user_id ASC)
              AS VARCHAR),
         CAST(NTILE(5) OVER (ORDER BY CAST(m AS DOUBLE) ASC, user_id ASC)
              AS VARCHAR)) AS segment
FROM per_user
"""


def activity_powerlaw_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power-law exponent MLE for the user-activity distribution
    (extension: heavy-tail diagnostics — Clauset/Shalizi/Newman's
    α̂ = 1 + n / Σ ln(xᵢ/xmin) continuous-MLE form): fits how heavy
    the per-user event-count tail is; α near 2 = extreme concentration
    (relevant to skew planning: the same statistic predicts hot-key
    behavior). Two aggregates over the |users| rollup; xmin broadcast
    as one row; ln terms are doubles over exact integer counts,
    rounded. Degenerate data (every user at the same count) makes
    Σ ln(x/xmin) = 0 — Spark's non-ANSI divide yields NULL there
    while DuckDB's IEEE double division yields Infinity, so the
    denominator is NULLIF-guarded on BOTH sides: alpha_mle is a
    deterministic NULL sentinel on degenerate data (ADVICE r6)."""
    counts = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__x__"))
    )
    xmin = counts.agg(F.min("__x__").alias("__xmin__"))
    return (
        counts.crossJoin(F.broadcast(xmin))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.min("__x__").cast("bigint").alias("xmin"),
            F.max("__x__").cast("bigint").alias("xmax"),
            F.round(
                1
                + F.count(F.lit(1)).cast("double")
                / F.nullif(
                    F.sum(
                        F.log(
                            F.col("__x__").cast("double")
                            / F.col("__xmin__").cast("double")
                        )
                    ),
                    F.lit(0.0),
                ),
                4,
            ).alias("alpha_mle"),
        )
    )


_POWERLAW_SQL = """
WITH counts AS (
  SELECT user_id, COUNT(*)::BIGINT AS x FROM events GROUP BY user_id
),
xm AS (SELECT MIN(x) AS xmin FROM counts)
SELECT COUNT(*)::BIGINT AS n_users,
       CAST(MIN(x) AS BIGINT) AS xmin,
       CAST(MAX(x) AS BIGINT) AS xmax,
       ROUND(1 + CAST(COUNT(*) AS DOUBLE)
                 / NULLIF(SUM(ln(CAST(x AS DOUBLE) / CAST(xm.xmin AS DOUBLE))),
                          0.0),
             4) AS alpha_mle
FROM counts, xm
GROUP BY xm.xmin
"""


def conversion_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains/lift table (extension: model evaluation — the
    ranking-quality report every propensity model ships with): score
    users by click count (a deliberately simple observable 'model'),
    outcome = made a purchase over 150, then per score-decile report
    conversion rate, cumulative share of all conversions captured, and
    lift over the base rate. Deciles use ``ntile(10)`` with a user_id
    tiebreak (order-dependent otherwise), computed by
    :func:`grouped_ntile`'s bucketed funnel-free rewrite — the |users|
    rollup is data-proportional, so the naive global ntile window
    would be a single-partition sort. The one remaining ordered
    window (cumulative capture) runs over the 10-row decile frame,
    bounded by construction."""
    ev = _events(spark, sf_dir)
    users = ev.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).cast("bigint").alias("__score__"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 150),
                1,
            ).otherwise(0)
        ).alias("__conv__"),
    )
    from tmdb_index_spark.operators.ordering import grouped_ntile

    by_decile = (
        grouped_ntile(
            users, 10, "__score__", tiebreak=["user_id"],
            tile_col="decile", ascending=False,
        )
        .select("decile", "__score__", "__conv__")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("__conv__").cast("bigint").alias("n_converted"),
        )
    )
    tot = by_decile.agg(
        F.sum("n_converted").alias("__tc__"),
        F.sum("n_users").alias("__tu__"),
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        by_decile.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("bigint").alias("decile"),
            "n_users",
            "n_converted",
            F.round(
                F.col("n_converted").cast("double")
                / F.col("n_users").cast("double"),
                4,
            ).alias("conv_rate"),
            F.round(
                F.sum("n_converted").over(wcum).cast("double")
                / F.col("__tc__").cast("double"),
                4,
            ).alias("cum_capture"),
            F.round(
                (
                    F.col("n_converted").cast("double")
                    / F.col("n_users").cast("double")
                )
                / (
                    F.col("__tc__").cast("double")
                    / F.col("__tu__").cast("double")
                ),
                4,
            ).alias("lift"),
        )
    )


_GAINS_SQL = """
WITH users AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS score,
         MAX(CASE WHEN event_type = 'purchase' AND value > 150
                  THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
by_decile AS (
  SELECT decile, COUNT(*)::BIGINT AS n_users,
         CAST(SUM(conv) AS BIGINT) AS n_converted
  FROM (
    SELECT NTILE(10) OVER (ORDER BY score DESC, user_id ASC) AS decile,
           conv
    FROM users
  ) GROUP BY decile
),
tot AS (
  SELECT SUM(n_converted) AS tc, SUM(n_users) AS tu FROM by_decile
)
SELECT CAST(decile AS BIGINT) AS decile, n_users, n_converted,
       ROUND(CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE), 4)
         AS conv_rate,
       ROUND(CAST(SUM(n_converted) OVER (ORDER BY decile
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) / CAST(tot.tc AS DOUBLE), 4) AS cum_capture,
       ROUND((CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE))
             / (CAST(tot.tc AS DOUBLE) / CAST(tot.tu AS DOUBLE)), 4)
         AS lift
FROM by_decile, tot
"""


def ab_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B sample-size / power analysis (extension: experiment design —
    the planning complement of `variant_conversion_ztest`): from the
    OBSERVED base conversion rate, the users needed per variant to
    detect relative effects of 5/10/20% at α=0.05 (two-sided) and 80%
    power, via the standard two-proportion formula
    n = (z_α√(2p̄q̄) + z_β√(p₀q₀+p₁q₁))² / (p₁−p₀)². One per-user
    aggregate + one single-row rollup produce p₀; the three effect
    rows come from a bounded literal explode. Every engine computes
    the identical closed form on identical doubles, rounded."""
    ev = _events(spark, sf_dir)
    base = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 150),
                    1,
                ).otherwise(0)
            ).alias("__conv__")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            (
                F.sum("__conv__").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("__p0__"),
        )
    )
    effects = base.select(
        "n_users",
        "__p0__",
        F.explode(
            F.array(F.lit(0.05), F.lit(0.10), F.lit(0.20))
        ).alias("rel_effect"),
    )
    p0 = F.col("__p0__")
    p1 = p0 * (1 + F.col("rel_effect"))
    pbar = (p0 + p1) / 2
    za = F.lit(1.959964)  # two-sided alpha = 0.05
    zb = F.lit(0.841621)  # power = 0.80
    a = za * F.sqrt(2 * pbar * (1 - pbar)) + zb * F.sqrt(
        p0 * (1 - p0) + p1 * (1 - p1)
    )
    n = (a * a) / ((p1 - p0) * (p1 - p0))
    return effects.select(
        "n_users",
        F.round(p0, 4).alias("base_rate"),
        F.round(F.col("rel_effect"), 2).alias("rel_effect"),
        F.round(p1, 4).alias("target_rate"),
        F.ceil(n).cast("bigint").alias("n_per_variant"),
    )


_POWER_SQL = """
WITH base AS (
  SELECT COUNT(*)::BIGINT AS n_users,
         CAST(SUM(conv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS p0
  FROM (
    SELECT user_id,
           MAX(CASE WHEN event_type = 'purchase' AND value > 150
                    THEN 1 ELSE 0 END) AS conv
    FROM events GROUP BY user_id
  )
),
eff AS (
  SELECT base.n_users, base.p0, e.rel_effect,
         base.p0 * (1 + e.rel_effect) AS p1
  FROM base, (VALUES (0.05), (0.10), (0.20)) AS e(rel_effect)
),
parts AS (
  SELECT n_users, p0, rel_effect, p1,
         1.959964 * sqrt(2 * ((p0 + p1) / 2) * (1 - (p0 + p1) / 2))
         + 0.841621 * sqrt(p0 * (1 - p0) + p1 * (1 - p1)) AS a
  FROM eff
)
SELECT n_users,
       ROUND(p0, 4) AS base_rate,
       ROUND(rel_effect, 2) AS rel_effect,
       ROUND(p1, 4) AS target_rate,
       CAST(CEIL((a * a) / ((p1 - p0) * (p1 - p0))) AS BIGINT)
         AS n_per_variant
FROM parts
"""


def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier confusion matrix (extension: classification
    evaluation — the categorical complement of
    `conversion_gains_table`'s ranking report): `lang_id_predict`'s
    marker-lexicon predictions crossed against the declared ``lang``
    label, with per-cell recall (share of the true class). Composition
    reuse: the predictor runs once; the matrix is a |langs|²-bounded
    groupBy plus one label-keyed window on the aggregate."""
    pred = lang_id_predict(spark, sf_dir).select("doc_id", "pred_lang")
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("lang_true")
    )
    cm = (
        pred.join(docs, "doc_id")
        .groupBy("lang_true", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    wl = Window.partitionBy("lang_true")
    return cm.select(
        "lang_true",
        "pred_lang",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(wl).cast("double"),
            4,
        ).alias("recall_share"),
    )


_LANG_CONFUSION_SQL = f"""
WITH pred AS ({_LANG_ID_SQL}),
cm AS (
  SELECT d.lang AS lang_true, p.pred_lang, COUNT(*)::BIGINT AS n_docs
  FROM pred p JOIN documents d ON d.doc_id = p.doc_id
  GROUP BY d.lang, p.pred_lang
)
SELECT lang_true, pred_lang, n_docs,
       ROUND(CAST(n_docs AS DOUBLE)
             / CAST(SUM(n_docs) OVER (PARTITION BY lang_true) AS DOUBLE),
             4) AS recall_share
FROM cm
"""


#: Poisson(1) inverse-CDF thresholds for the hash-derived bootstrap
#: weights: P(X <= r) = e^-1 * sum_{i<=r} 1/i! for r = 0..4 (weight
#: capped at 5; P(X > 5) ~ 0.06%). Computed once and embedded as repr
#: literals on BOTH engines, so the CASE ladder is bit-identical.
import math as _math

_POIS_CDF = [
    _math.exp(-1.0) * s
    for s in (1.0, 2.0, 2.5, 2.0 + 2.0 / 3.0, 2.0 + 2.0 / 3.0 + 1.0 / 24.0)
]
_BOOT_B = 20


def _bootstrap_ci_sql(table: str, spark_dialect: bool) -> str:
    """One SQL text for the Poisson-bootstrap mean CI, generated for
    both engines from the same builder so every literal, alias, and
    CASE ladder is shared; only the 60-bit md5-hash parse and the
    array sort/index spellings differ per dialect."""
    key = (
        "CONCAT(CAST(l_orderkey AS STRING), ':', "
        "CAST(l_linenumber AS STRING), '#', '{b}')"
        if spark_dialect
        else "CONCAT(CAST(l_orderkey AS VARCHAR), ':', "
        "CAST(l_linenumber AS VARCHAR), '#', '{b}')"
    )
    h = (
        f"CAST(CAST(CONV(SUBSTRING(MD5({key}), 1, 15), 16, 10) AS BIGINT)"
        " AS DOUBLE)"
        if spark_dialect
        else f"CAST(('0x' || substr(md5({key}), 1, 15))::BIGINT AS DOUBLE)"
    )
    u = f"({h} / 1152921504606846976.0)"
    # the uniforms materialize ONCE in their own projection layer: a
    # CASE ladder inlining the md5 expression repeats it per WHEN arm
    # (5 hashes per weight instead of 1 — measured 14.3 s vs 3 s at
    # sf0.1)
    u_cols = ",\n         ".join(
        u.format(b=b) + f" AS u{b}" for b in range(_BOOT_B)
    )

    def ladder(b: int) -> str:
        return (
            "CASE "
            + " ".join(
                f"WHEN u{b} < {c!r} THEN {r}"
                for r, c in enumerate(_POIS_CDF)
            )
            + f" ELSE {len(_POIS_CDF)} END"
        )

    w_cols = ",\n         ".join(
        ladder(b) + f" AS w{b}" for b in range(_BOOT_B)
    )
    aggs = ",\n         ".join(
        f"SUM(w{b} * px) AS swx{b}, SUM(w{b}) AS sw{b}"
        for b in range(_BOOT_B)
    )
    means = ",\n      ".join(
        f"CAST(swx{b} AS DOUBLE) / NULLIF(CAST(sw{b} AS DOUBLE), 0.0)"
        for b in range(_BOOT_B)
    )
    if spark_dialect:
        sorted_means = f"array_sort(array(\n      {means}\n    ))"
        lo, hi = "element_at(ms, 2)", f"element_at(ms, {_BOOT_B - 2})"
    else:
        sorted_means = f"list_sort([\n      {means}\n    ])"
        lo, hi = "ms[2]", f"ms[{_BOOT_B - 2}]"
    return f"""
WITH uu AS (
  SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS px,
         {u_cols}
  FROM {table}
),
w AS (
  SELECT px,
         {w_cols}
  FROM uu
),
agg AS (
  SELECT COUNT(*) AS n, SUM(px) AS sp,
         {aggs}
  FROM w
),
sel AS (
  SELECT n, sp, {sorted_means} AS ms FROM agg
)
SELECT CAST(n AS BIGINT) AS n_rows,
       ROUND(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE), 6) AS point_mean,
       ROUND({lo}, 6) AS boot_lo,
       ROUND({hi}, 6) AS boot_hi
FROM sel
"""


def revenue_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for mean line revenue
    (extension: the AT-SCALE bootstrap — Chamandy et al. 2012,
    "Estimating uncertainty for massive data streams": classic
    resampling needs N draws per replicate and a data-sized RNG state,
    the Poisson bootstrap gives each row an independent Poisson(1)
    weight per replicate, so ALL {B} replicates run in ONE streaming
    pass as {B} extra conditional aggregates — no resampled copies, no
    shuffle beyond the single 1-row aggregate). Weights are the
    Poisson(1) inverse CDF of a hash-derived uniform
    (``portable_hash60(orderkey:linenumber#b) / 2^60`` — deterministic
    and engine-reproducible, the repo's hash-derived-sampling
    convention, no RNG state). Weighted sums are exact
    DECIMAL·integer; each replicate mean is one double division;
    the CI is nearest-rank p10/p90 (2nd and 18th of the 20 sorted
    replicate means). Both SQL texts come from ONE builder
    (:func:`_bootstrap_ci_sql`), so every literal and CASE ladder is
    shared; a replicate whose weights all land 0 (probability ~e^-N)
    yields a NULL mean via NULLIF rather than a divide error."""
    import uuid

    from tmdb_index_spark.operators.partitioning import widen_small_scan

    # the per-row hashing is the cost (B md5+parse per row): a small
    # single-row-group scan must widen to the session's parallelism or
    # one task runs the whole map stage serially (measured 22 s -> 3 s
    # at sf0.1); at real scale the scan is already wide and this
    # no-ops.
    li = widen_small_scan(
        _t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_extendedprice"
        )
    )
    view = f"__boot_li_{uuid.uuid4().hex[:12]}"
    li.createOrReplaceTempView(view)
    return spark.sql(_bootstrap_ci_sql(view, spark_dialect=True))


_BOOTSTRAP_CI_SQL = _bootstrap_ci_sql("lineitem", spark_dialect=False)


def lang_id_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa for the language-ID classifier (extension:
    classification evaluation — the chance-corrected agreement summary
    of `lang_confusion_matrix`, the statistic annotation pipelines
    report when judging classifier-vs-gold or annotator-vs-annotator
    agreement; Cohen 1960): κ = (p_o − p_e) / (1 − p_e) with observed
    agreement p_o = Σ diag / N and expected agreement p_e = Σ_c
    row_c·col_c / N². Marginal products go through DECIMAL(38,0) so
    the arithmetic stays exact at any N (bigint² overflows at
    petabyte-scale class counts); p_o/p_e are then single divisions of
    exact integers — identical doubles cross-engine. Degenerate p_e=1
    (a single class on both sides) yields NULL κ via the ANSI NULLIF
    convention rather than a divide error. All frames are
    |langs|²-bounded aggregates; the only corpus-sized work is the
    predictor's map-only pass."""
    pred = lang_id_predict(spark, sf_dir).select("doc_id", "pred_lang")
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("lang_true")
    )
    cm = (
        pred.join(docs, "doc_id")
        .groupBy("lang_true", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n__"))
    )
    tot = cm.agg(
        F.sum("__n__").cast("bigint").alias("__N__"),
        F.sum(
            F.when(F.col("lang_true") == F.col("pred_lang"), F.col("__n__"))
            .otherwise(F.lit(0))
        ).cast("bigint").alias("__diag__"),
    )
    rows_m = cm.groupBy("lang_true").agg(
        F.sum("__n__").cast("decimal(38,0)").alias("__r__")
    )
    cols_m = cm.groupBy("pred_lang").agg(
        F.sum("__n__").cast("decimal(38,0)").alias("__c__")
    )
    pe_num = (
        rows_m.join(
            F.broadcast(cols_m),
            rows_m.lang_true == cols_m.pred_lang,
        )
        .agg(F.sum(F.col("__r__") * F.col("__c__")).alias("__pe_num__"))
    )
    nd = F.col("__N__").cast("double")
    po = F.col("__diag__").cast("double") / nd
    pe = F.col("__pe_num__").cast("double") / (nd * nd)
    return tot.join(F.broadcast(pe_num)).select(
        F.col("__N__").alias("n_docs"),
        F.round(po, 6).alias("observed_agreement"),
        F.round(pe, 6).alias("expected_agreement"),
        F.round(
            (po - pe) / F.expr("NULLIF(1.0 - __pe_num__ / (CAST(__N__ AS DOUBLE) * CAST(__N__ AS DOUBLE)), 0.0)"),
            6,
        ).alias("kappa"),
    )


_LANG_KAPPA_SQL = f"""
WITH pred AS ({_LANG_ID_SQL}),
cm AS (
  SELECT d.lang AS lang_true, p.pred_lang, COUNT(*)::BIGINT AS n
  FROM pred p JOIN documents d ON d.doc_id = p.doc_id
  GROUP BY d.lang, p.pred_lang
),
tot AS (
  SELECT SUM(n)::BIGINT AS N,
         SUM(CASE WHEN lang_true = pred_lang THEN n ELSE 0 END)::BIGINT
           AS diag
  FROM cm
),
rows_m AS (SELECT lang_true, CAST(SUM(n) AS DECIMAL(38,0)) AS r
           FROM cm GROUP BY 1),
cols_m AS (SELECT pred_lang, CAST(SUM(n) AS DECIMAL(38,0)) AS c
           FROM cm GROUP BY 1),
pe_num AS (
  SELECT SUM(r * c) AS pe_num
  FROM rows_m JOIN cols_m ON lang_true = pred_lang
)
SELECT N AS n_docs,
       ROUND(CAST(diag AS DOUBLE) / CAST(N AS DOUBLE), 6)
         AS observed_agreement,
       ROUND(CAST(pe_num AS DOUBLE)
             / (CAST(N AS DOUBLE) * CAST(N AS DOUBLE)), 6)
         AS expected_agreement,
       ROUND((CAST(diag AS DOUBLE) / CAST(N AS DOUBLE)
              - CAST(pe_num AS DOUBLE)
                / (CAST(N AS DOUBLE) * CAST(N AS DOUBLE)))
             / NULLIF(1.0 - CAST(pe_num AS DOUBLE)
                    / (CAST(N AS DOUBLE) * CAST(N AS DOUBLE)), 0.0), 6)
         AS kappa
FROM tot, pe_num
"""


def purchase_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal burstiness per user (extension: Goh-Barabási
    burstiness index B = (σ−μ)/(σ+μ) of inter-event gaps): B → −1 for
    clockwork regularity, 0 for Poisson, → 1 for extreme bursts —
    the signature separating bot-like from human-like activity that
    plain min/avg gap stats (`user_event_gaps`) cannot express. Gaps
    are exact integer microseconds; μ and σ² derive from integer
    sum / sum-of-squares (decimal-exact; σ² via the one-pass identity
    E[x²]−E[x]²), so B is engine-reproducible. One user-keyed window
    + one groupBy — a single Exchange."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_ltz = F.col("ts").cast("timestamp")
    gap = F.unix_micros(ts_ltz) - F.unix_micros(F.lag(ts_ltz).over(w))
    g = ev.select("user_id", gap.alias("__gap__")).filter(
        F.col("__gap__").isNotNull()
    )
    stats = g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum("__gap__").cast("decimal(38,0)").alias("__s__"),
        F.sum(
            F.col("__gap__").cast("decimal(19,0)")
            * F.col("__gap__").cast("decimal(19,0)")
        ).alias("__ss__"),
    ).filter(F.col("n_gaps") >= 2)
    n = F.col("n_gaps").cast("double")
    mu = F.col("__s__").cast("double") / n
    var = F.col("__ss__").cast("double") / n - mu * mu
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    return stats.select(
        "user_id",
        "n_gaps",
        F.round(mu / 1e6, 2).alias("mean_gap_s"),
        F.round(sigma / 1e6, 2).alias("std_gap_s"),
        F.round((sigma - mu) / (sigma + mu), 4).alias("burstiness"),
    )


_BURSTINESS_SQL = """
WITH g AS (
  SELECT user_id,
         CAST(epoch_us(ts) AS BIGINT)
           - LAG(CAST(epoch_us(ts) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events WHERE event_type = 'purchase'
),
stats AS (
  SELECT user_id, COUNT(*)::BIGINT AS n_gaps,
         CAST(SUM(gap) AS DECIMAL(38,0)) AS s,
         SUM(CAST(gap AS DECIMAL(19,0)) * CAST(gap AS DECIMAL(19,0))) AS ss
  FROM g WHERE gap IS NOT NULL GROUP BY user_id
  HAVING COUNT(*) >= 2
)
SELECT user_id, n_gaps,
       ROUND((CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)) / 1e6, 2)
         AS mean_gap_s,
       ROUND(sqrt(GREATEST(CAST(ss AS DOUBLE) / CAST(n_gaps AS DOUBLE)
                           - (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                             * (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)),
                           0.0)) / 1e6, 2) AS std_gap_s,
       ROUND((sqrt(GREATEST(CAST(ss AS DOUBLE) / CAST(n_gaps AS DOUBLE)
                            - (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                              * (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)),
                            0.0))
              - CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))
             / (sqrt(GREATEST(CAST(ss AS DOUBLE) / CAST(n_gaps AS DOUBLE)
                              - (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                                * (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)),
                              0.0))
                + CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)), 4)
         AS burstiness
FROM stats
"""


def copurchase_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-based collaborative filtering (extension: recommender
    retrieval — the cosine-normalized sibling of `part_pair_lift`'s
    association mining): for every part, the top-3 co-purchased
    neighbors by cosine similarity cooc/√(cₐ·c_b) over order baskets.
    Candidates from the basket self-join (fan-out ≤ basket², never
    all-pairs); similarity rounded BEFORE ranking with a part_b
    tiebreak so the neighbor lists are engine-exact; per-item top-k is
    one window over the aggregated pair list."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") <= 10)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    part_cnt = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("__cp__")
    )
    half = (
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    pairs = half.unionByName(
        half.select(
            F.col("part_b").alias("part_a"),
            F.col("part_a").alias("part_b"),
            "n_both",
        )
    )
    ca = part_cnt.select(
        F.col("l_partkey").alias("part_a"), F.col("__cp__").alias("__ca__")
    )
    cb = part_cnt.select(
        F.col("l_partkey").alias("part_b"), F.col("__cp__").alias("__cb__")
    )
    scored = (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .select(
            "part_a",
            "part_b",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                / F.sqrt(
                    F.col("__ca__").cast("double")
                    * F.col("__cb__").cast("double")
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("part_a").orderBy(
        F.col("cosine").desc(), F.col("part_b").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
    )


_ITEM_CF_SQL = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey
  FROM lineitem WHERE l_quantity <= 10
),
part_cnt AS (
  SELECT l_partkey, COUNT(*) AS cp FROM li GROUP BY l_partkey
),
half AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         COUNT(*)::BIGINT AS n_both
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
),
pairs AS (
  SELECT part_a, part_b, n_both FROM half
  UNION ALL
  SELECT part_b AS part_a, part_a AS part_b, n_both FROM half
),
scored AS (
  SELECT p.part_a, p.part_b, p.n_both,
         ROUND(CAST(p.n_both AS DOUBLE)
               / sqrt(CAST(ca.cp AS DOUBLE) * CAST(cb.cp AS DOUBLE)),
               6) AS cosine
  FROM pairs p
  JOIN part_cnt ca ON ca.l_partkey = p.part_a
  JOIN part_cnt cb ON cb.l_partkey = p.part_b
)
SELECT part_a, part_b, n_both, cosine,
       CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY part_a
                               ORDER BY cosine DESC, part_b ASC) AS rank
  FROM scored
) WHERE rank <= 3
"""


def search_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the BM25 ranking (extension: ranking-quality
    metrics — completes the evaluation trio: gains table for
    propensity, confusion matrix for classification, NDCG for
    retrieval): graded relevance = raw query-term frequency in the
    document; DCG over the BM25 top-10, IDCG over the corpus-ideal
    top-10 (sort+limit compiles to TakeOrderedAndProject — no global
    sort materializes). Both engines mirror the BM25 expression tree
    term for term, so ranks — and therefore the 10-term DCG sums —
    agree after rounding."""
    from tmdb_index_spark.operators.ranking import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    terms_arr = F.array(*[F.lit(t) for t in _BM25_TERMS])
    rel_expr = F.size(
        F.filter(
            F.regexp_extract_all(
                F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0)
            ),
            lambda x: F.array_contains(terms_arr, x),
        )
    ).cast("bigint")
    relevance = docs.select("doc_id", rel_expr.alias("__rel__"))
    ranked = bm25_topk(docs, _BM25_TERMS, k=10).join(relevance, "doc_id")
    dcg = ranked.agg(
        F.sum(
            F.col("__rel__").cast("double")
            / F.log2(F.col("rank").cast("double") + 1)
        ).alias("__dcg__")
    )
    iw = Window.orderBy(F.col("__rel__").desc(), F.col("doc_id").asc())
    idcg = (
        relevance.orderBy(F.col("__rel__").desc(), F.col("doc_id").asc())
        .limit(10)
        .select("__rel__", F.row_number().over(iw).alias("__i__"))
        .agg(
            F.sum(
                F.col("__rel__").cast("double")
                / F.log2(F.col("__i__").cast("double") + 1)
            ).alias("__idcg__")
        )
    )
    return dcg.crossJoin(F.broadcast(idcg)).select(
        F.round(F.col("__dcg__"), 4).alias("dcg_at_10"),
        F.round(F.col("__idcg__"), 4).alias("idcg_at_10"),
        F.round(F.col("__dcg__") / F.col("__idcg__"), 4).alias(
            "ndcg_at_10"
        ),
    )


_NDCG_SQL = f"""
WITH bm AS ({_BM25_SQL}),
rel AS (
  SELECT doc_id,
         CAST(len(list_filter(
           regexp_extract_all(lower(text), '[a-z0-9]+'),
           x -> list_contains([{", ".join(repr(t) for t in _BM25_TERMS)}], x)
         )) AS BIGINT) AS rel
  FROM documents
),
dcg AS (
  SELECT SUM(CAST(rel AS DOUBLE) / log2(CAST(rank AS DOUBLE) + 1)) AS dcg
  FROM bm JOIN rel USING (doc_id) WHERE rank <= 10
),
ideal AS (
  SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id ASC) AS i
  FROM rel ORDER BY rel DESC, doc_id ASC LIMIT 10
),
idcg AS (
  SELECT SUM(CAST(rel AS DOUBLE) / log2(CAST(i AS DOUBLE) + 1)) AS idcg
  FROM ideal
)
SELECT ROUND(dcg, 4) AS dcg_at_10,
       ROUND(idcg, 4) AS idcg_at_10,
       ROUND(dcg / idcg, 4) AS ndcg_at_10
FROM dcg, idcg
"""


def forecast_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest metrics (extension: forecast evaluation — the
    scoring side of `ewma_daily_value`): the one-day-ahead EWMA
    forecast (weights over days d−14..d−1, renormalized over observed
    days) scored against the actual with MAE, RMSE, sMAPE, and MASE
    (error scaled by the naive previous-day forecast — the
    scale-free statistic that makes models comparable across series).
    Same bounded-explode alignment as the EWMA query (k shifted to
    1..14 so the forecast never sees its own day); every window/join
    runs on the |days| rollup."""
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.sum(_dec("value")).cast("double").alias("__v__"))
    )
    contrib = daily.select(
        F.col("day").alias("__src__"),
        F.col("__v__").alias("__sv__"),
        F.explode(F.sequence(F.lit(1), F.lit(14))).alias("__k__"),
    ).select(
        F.timestamp_add("DAY", F.col("__k__"), F.col("__src__")).alias(
            "day"
        ),
        "__sv__",
        F.pow(F.lit(0.7), F.col("__k__") - 1).alias("__w__"),
    )
    fc = contrib.groupBy("day").agg(
        (F.sum(F.col("__sv__") * F.col("__w__")) / F.sum("__w__")).alias(
            "__fc__"
        )
    )
    wlag = Window.orderBy("day")
    scored = (
        daily.join(fc, "day")
        .select(
            "day",
            "__v__",
            "__fc__",
            F.lag("__v__").over(wlag).alias("__prev__"),
        )
        .filter(F.col("__prev__").isNotNull())
    )
    err = F.abs(F.col("__v__") - F.col("__fc__"))
    naive = F.abs(F.col("__v__") - F.col("__prev__"))
    smape_term = (
        2
        * err
        / (F.abs(F.col("__v__")) + F.abs(F.col("__fc__")))
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.round(F.avg(err), 2).alias("mae"),
        F.round(F.sqrt(F.avg(err * err)), 2).alias("rmse"),
        F.round(F.avg(smape_term), 4).alias("smape"),
        F.round(F.avg(err) / F.avg(naive), 4).alias("mase"),
    )


_FORECAST_ACC_SQL = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
  FROM events GROUP BY 1
),
contrib AS (
  SELECT d.day + u.k * INTERVAL 1 DAY AS day, d.v AS sv,
         POWER(0.7, u.k - 1) AS w
  FROM daily d, UNNEST(range(1, 15)) AS u(k)
),
fc AS (
  SELECT day, SUM(sv * w) / SUM(w) AS f FROM contrib GROUP BY day
),
scored AS (
  SELECT d.day, d.v, fc.f,
         LAG(d.v) OVER (ORDER BY d.day) AS prev
  FROM daily d JOIN fc ON fc.day = d.day
)
SELECT COUNT(*)::BIGINT AS n_days,
       ROUND(AVG(ABS(v - f)), 2) AS mae,
       ROUND(sqrt(AVG(ABS(v - f) * ABS(v - f))), 2) AS rmse,
       ROUND(AVG(2 * ABS(v - f) / (ABS(v) + ABS(f))), 4) AS smape,
       ROUND(AVG(ABS(v - f)) / AVG(ABS(v - prev)), 4) AS mase
FROM scored WHERE prev IS NOT NULL
"""


def doc_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease scoring (extension: readability metrics for
    corpus quality filtering): 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words), with sentences counted as terminal-
    punctuation runs (floored at 1) and syllables approximated as
    vowel-group runs — the standard regex approximation; every count
    is an integer from the same regex semantics in both engines, so
    the score reproduces exactly. Pure column expressions, map-only,
    whole-stage codegen."""
    docs = _t(spark, sf_dir, "documents")
    txt = F.coalesce(F.col("text"), F.lit(""))
    words = F.size(
        F.regexp_extract_all(F.lower(txt), F.lit("[a-z0-9]+"), F.lit(0))
    )
    sentences = F.greatest(
        F.size(F.regexp_extract_all(txt, F.lit("[.!?]+"), F.lit(0))),
        F.lit(1),
    )
    syllables = F.size(
        F.regexp_extract_all(F.lower(txt), F.lit("[aeiouy]+"), F.lit(0))
    )
    # Exact-rational form: ×1000 clears the constants' decimals, so the
    # whole score is ONE integer-ratio double division — bit-identical
    # in any engine, emitted UNROUNDED (the exact ratio frequently
    # lands on .xx5 midpoints where Spark rounds the shortest decimal
    # repr and other engines round the binary value — the one place
    # the catalog's round-then-compare convention is unsafe).
    wl = words.cast("long")
    sl = sentences.cast("long")
    yl = syllables.cast("long")
    num = (
        F.lit(206835).cast("long") * sl * wl
        - F.lit(1015).cast("long") * wl * wl
        - F.lit(84600).cast("long") * sl * yl
    )
    den = F.lit(1000).cast("long") * sl * wl
    return docs.filter(words > 0).select(
        "doc_id",
        words.cast("bigint").alias("n_words"),
        sentences.cast("bigint").alias("n_sentences"),
        syllables.cast("bigint").alias("n_syllables"),
        (num.cast("double") / den.cast("double")).alias("flesch_score"),
    )


_READABILITY_SQL = """
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(coalesce(text, '')), '[a-z0-9]+'))
           AS words,
         GREATEST(len(regexp_extract_all(coalesce(text, ''), '[.!?]+')), 1)
           AS sentences,
         len(regexp_extract_all(lower(coalesce(text, '')), '[aeiouy]+'))
           AS syllables
  FROM documents
)
SELECT doc_id,
       CAST(words AS BIGINT) AS n_words,
       CAST(sentences AS BIGINT) AS n_sentences,
       CAST(syllables AS BIGINT) AS n_syllables,
       CAST(206835 * sentences * words
            - 1015 * words * words
            - 84600 * sentences * syllables AS DOUBLE)
         / CAST(1000 * sentences * words AS DOUBLE) AS flesch_score
FROM t WHERE words > 0
"""


def purchase_value_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test (extension: distribution
    comparison — the nonparametric sibling of `purchase_click_drift`'s
    binned PSI): D = max |F_weekday(v) − F_weekend(v)| between
    purchase-value distributions, weekday vs weekend from the portable
    epoch-mod-7 day index. Values collapse to (value, group) COUNTS
    first, and both step-CDFs come from :func:`grouped_prefix_sum`'s
    bucketed running sums — |distinct cent values| grows with data
    for continuous values, so the naive global ordered window would
    be a single-partition sort over a data-proportional frame. Every
    CDF step is an exact integer ratio; D is engine-exact.
    Significance at α=0.05 via the asymptotic threshold
    1.358·√((n₁+n₂)/(n₁·n₂))."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    dow = F.pmod(
        F.datediff(
            F.to_date(F.col("ts")), F.lit("1970-01-01").cast("date")
        ),
        F.lit(7),
    )
    # epoch day 0 = Thursday → indices 2 (Sat) and 3 (Sun) are weekend
    grp = F.when(dow.isin(2, 3), F.lit("weekend")).otherwise(
        F.lit("weekday")
    )
    vals = (
        ev.select(_dec("value").alias("__v__"), grp.alias("__g__"))
        .groupBy("__v__", "__g__")
        .agg(F.count(F.lit(1)).alias("__c__"))
    )
    per_val = vals.groupBy("__v__").agg(
        F.sum(F.when(F.col("__g__") == "weekday", F.col("__c__")).otherwise(0)).alias("__ca__"),
        F.sum(F.when(F.col("__g__") == "weekend", F.col("__c__")).otherwise(0)).alias("__cb__"),
    )
    tot = per_val.agg(
        F.sum("__ca__").alias("__na__"), F.sum("__cb__").alias("__nb__")
    )
    from tmdb_index_spark.operators.ordering import grouped_prefix_sum

    cdf = grouped_prefix_sum(
        per_val, "__v__", {"__cca__": "__ca__", "__ccb__": "__cb__"}
    )
    stepped = cdf.crossJoin(F.broadcast(tot)).select(
        "__na__",
        "__nb__",
        F.abs(
            F.col("__cca__").cast("double")
            / F.nullif(F.col("__na__").cast("double"), F.lit(0.0))
            - F.col("__ccb__").cast("double")
            / F.nullif(F.col("__nb__").cast("double"), F.lit(0.0))
        ).alias("__d__"),
    )
    n1 = F.col("__na__").cast("double")
    n2 = F.col("__nb__").cast("double")
    # one empty group → n1*n2 = 0: ANSI Spark would THROW where DuckDB
    # returns Inf — NULLIF on both engines makes the threshold (and
    # the verdict column) a deterministic NULL on degenerate data
    crit = 1.358 * F.sqrt((n1 + n2) / F.nullif(n1 * n2, F.lit(0.0)))
    return (
        stepped.groupBy("__na__", "__nb__")
        .agg(F.max("__d__").alias("__ks__"))
        .select(
            F.col("__na__").cast("bigint").alias("n_weekday"),
            F.col("__nb__").cast("bigint").alias("n_weekend"),
            F.round(F.col("__ks__"), 6).alias("ks_statistic"),
            F.round(crit, 6).alias("critical_05"),
            (F.col("__ks__") > crit).alias("distributions_differ"),
        )
    )


_KS_SQL = """
WITH p AS (
  SELECT CAST(value AS DECIMAL(18,2)) AS v,
         CASE WHEN datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                   IN (2, 3)
              THEN 'weekend' ELSE 'weekday' END AS g
  FROM events WHERE event_type = 'purchase'
),
per_val AS (
  SELECT v,
         SUM(CASE WHEN g = 'weekday' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN g = 'weekend' THEN 1 ELSE 0 END) AS cb
  FROM p GROUP BY v
),
tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM per_val),
stepped AS (
  SELECT tot.na, tot.nb,
         ABS(CAST(SUM(ca) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE) / NULLIF(CAST(tot.na AS DOUBLE), 0.0)
             - CAST(SUM(cb) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) / NULLIF(CAST(tot.nb AS DOUBLE), 0.0)) AS d
  FROM per_val, tot
)
SELECT CAST(na AS BIGINT) AS n_weekday,
       CAST(nb AS BIGINT) AS n_weekend,
       ROUND(MAX(d), 6) AS ks_statistic,
       ROUND(1.358 * sqrt((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                          / NULLIF(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE),
                                   0.0)), 6)
         AS critical_05,
       MAX(d) > 1.358 * sqrt((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                             / NULLIF(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE),
                                      0.0))
         AS distributions_differ
FROM stepped GROUP BY na, nb
"""


def column_dependence_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical column-dependence audit via mutual information
    (extension: the probabilistic complement of `fd_discovery`'s exact
    rules — MI catches SOFT dependence FDs miss entirely): I(X;Y) and
    the normalized coefficient U = I/min(H(X),H(Y)) for candidate
    column pairs, all from integer cell counts (joint groupBy;
    marginals and entropies re-aggregated from the |cells| joint, one
    scan per pair). U = 1 ⇔ one column determines the other; 0 ⇔
    independent."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    out = []
    for df, x, y in [
        (li, "l_returnflag", "l_linestatus"),
        (od, "o_orderstatus", "o_orderpriority"),
    ]:
        joint = df.groupBy(x, y).agg(F.count(F.lit(1)).alias("__c__"))
        mx = joint.groupBy(x).agg(F.sum("__c__").alias("__cx__"))
        my = joint.groupBy(y).agg(F.sum("__c__").alias("__cy__"))
        tot = joint.agg(F.sum("__c__").alias("__n__"))
        n = F.col("__n__").cast("double")
        p = F.col("__c__").cast("double") / n
        px = F.col("__cx__").cast("double") / n
        py = F.col("__cy__").cast("double") / n
        hx = mx.crossJoin(F.broadcast(tot)).agg(
            F.sum(
                -(F.col("__cx__").cast("double") / n)
                * F.log2(F.col("__cx__").cast("double") / n)
            ).alias("__hx__")
        )
        hy = my.crossJoin(F.broadcast(tot)).agg(
            F.sum(
                -(F.col("__cy__").cast("double") / n)
                * F.log2(F.col("__cy__").cast("double") / n)
            ).alias("__hy__")
        )
        mi = (
            joint.join(mx, x)
            .join(my, y)
            .crossJoin(F.broadcast(tot))
            .agg(
                F.sum(p * F.log2(p / (px * py))).alias("__mi__"),
                F.count(F.lit(1)).cast("bigint").alias("n_cells"),
            )
        )
        out.append(
            mi.crossJoin(F.broadcast(hx))
            .crossJoin(F.broadcast(hy))
            .select(
                F.lit(f"{x}|{y}").alias("pair"),
                "n_cells",
                F.round(F.col("__mi__"), 4).alias("mi_bits"),
                F.round(
                    F.col("__mi__")
                    / F.least(F.col("__hx__"), F.col("__hy__")),
                    4,
                ).alias("uncertainty_coef"),
            )
        )
    from functools import reduce as _reduce

    return _reduce(DataFrame.unionByName, out)


_MI_COLDEP_SQL = """
WITH j1 AS (
  SELECT l_returnflag AS x, l_linestatus AS y, COUNT(*) AS c
  FROM lineitem GROUP BY 1, 2
),
t1 AS (SELECT SUM(c) AS n FROM j1),
mx1 AS (SELECT x, SUM(c) AS cx FROM j1 GROUP BY x),
my1 AS (SELECT y, SUM(c) AS cy FROM j1 GROUP BY y),
h1 AS (
  SELECT
    (SELECT SUM(-(CAST(cx AS DOUBLE) / CAST(t1.n AS DOUBLE))
                * log2(CAST(cx AS DOUBLE) / CAST(t1.n AS DOUBLE)))
     FROM mx1, t1) AS hx,
    (SELECT SUM(-(CAST(cy AS DOUBLE) / CAST(t1.n AS DOUBLE))
                * log2(CAST(cy AS DOUBLE) / CAST(t1.n AS DOUBLE)))
     FROM my1, t1) AS hy
),
mi1 AS (
  SELECT SUM((CAST(c AS DOUBLE) / CAST(t1.n AS DOUBLE))
             * log2((CAST(c AS DOUBLE) / CAST(t1.n AS DOUBLE))
                    / ((CAST(cx AS DOUBLE) / CAST(t1.n AS DOUBLE))
                       * (CAST(cy AS DOUBLE) / CAST(t1.n AS DOUBLE)))))
           AS mi,
         COUNT(*)::BIGINT AS n_cells
  FROM j1 JOIN mx1 USING (x) JOIN my1 USING (y), t1
),
j2 AS (
  SELECT o_orderstatus AS x, o_orderpriority AS y, COUNT(*) AS c
  FROM orders GROUP BY 1, 2
),
t2 AS (SELECT SUM(c) AS n FROM j2),
mx2 AS (SELECT x, SUM(c) AS cx FROM j2 GROUP BY x),
my2 AS (SELECT y, SUM(c) AS cy FROM j2 GROUP BY y),
h2 AS (
  SELECT
    (SELECT SUM(-(CAST(cx AS DOUBLE) / CAST(t2.n AS DOUBLE))
                * log2(CAST(cx AS DOUBLE) / CAST(t2.n AS DOUBLE)))
     FROM mx2, t2) AS hx,
    (SELECT SUM(-(CAST(cy AS DOUBLE) / CAST(t2.n AS DOUBLE))
                * log2(CAST(cy AS DOUBLE) / CAST(t2.n AS DOUBLE)))
     FROM my2, t2) AS hy
),
mi2 AS (
  SELECT SUM((CAST(c AS DOUBLE) / CAST(t2.n AS DOUBLE))
             * log2((CAST(c AS DOUBLE) / CAST(t2.n AS DOUBLE))
                    / ((CAST(cx AS DOUBLE) / CAST(t2.n AS DOUBLE))
                       * (CAST(cy AS DOUBLE) / CAST(t2.n AS DOUBLE)))))
           AS mi,
         COUNT(*)::BIGINT AS n_cells
  FROM j2 JOIN mx2 USING (x) JOIN my2 USING (y), t2
)
SELECT 'l_returnflag|l_linestatus' AS pair, n_cells,
       ROUND(mi, 4) AS mi_bits,
       ROUND(mi / LEAST(hx, hy), 4) AS uncertainty_coef
FROM mi1, h1
UNION ALL
SELECT 'o_orderstatus|o_orderpriority' AS pair, n_cells,
       ROUND(mi, 4) AS mi_bits,
       ROUND(mi / LEAST(hx, hy), 4) AS uncertainty_coef
FROM mi2, h2
"""


def purchase_did_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate (extension: causal
    inference — the panel-data complement of the A/B z-test): mean
    purchase value per (variant, period) cell, with treatment =
    ``user_id % 2`` and the period split at the integer midpoint of
    the observed day range (epoch-day arithmetic — engine-exact), and
    DiD = (treat_post − treat_pre) − (ctrl_post − ctrl_pre). Cell
    means are DECIMAL sums over integer counts, so the estimate is
    reproducible to the last double bit. One scan → 4-cell
    conditional aggregate; the day range broadcasts as one row."""
    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    epoch_day = F.datediff(
        F.to_date(F.col("ts")), F.lit("1970-01-01").cast("date")
    )
    days = ev.agg(
        F.min(epoch_day).alias("__d0__"), F.max(epoch_day).alias("__d1__")
    )
    cells = (
        ev.select(
            F.pmod(F.col("user_id"), F.lit(2)).alias("__treat__"),
            epoch_day.alias("__d__"),
            _dec("value").alias("__v__"),
        )
        .crossJoin(F.broadcast(days))
        .select(
            "__treat__",
            (
                F.col("__d__")
                >= (F.col("__d0__") + F.col("__d1__") + 1) / 2
            ).cast("int").alias("__post__"),
            "__v__",
        )
        .groupBy("__treat__", "__post__")
        .agg(
            F.count(F.lit(1)).alias("__n__"),
            F.sum("__v__").alias("__s__"),
        )
    )
    m = {}
    agg_exprs = []
    for t in (0, 1):
        for p_ in (0, 1):
            name = f"__m{t}{p_}__"
            m[(t, p_)] = F.col(name)
            agg_exprs.append(
                F.max(
                    F.when(
                        (F.col("__treat__") == t) & (F.col("__post__") == p_),
                        F.col("__s__").cast("double")
                        / F.col("__n__").cast("double"),
                    )
                ).alias(name)
            )
    one = cells.agg(*agg_exprs)
    did = (m[(1, 1)] - m[(1, 0)]) - (m[(0, 1)] - m[(0, 0)])
    return one.select(
        F.round(m[(0, 0)], 4).alias("ctrl_pre"),
        F.round(m[(0, 1)], 4).alias("ctrl_post"),
        F.round(m[(1, 0)], 4).alias("treat_pre"),
        F.round(m[(1, 1)], 4).alias("treat_post"),
        F.round(did, 4).alias("did_estimate"),
    )


_DID_SQL = """
WITH p AS (
  SELECT user_id % 2 AS treat,
         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d,
         CAST(value AS DECIMAL(18,2)) AS v
  FROM events WHERE event_type = 'purchase'
),
days AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM p),
cells AS (
  SELECT treat,
         CAST(d >= (days.d0 + days.d1 + 1) / 2 AS INTEGER) AS post,
         COUNT(*) AS n, SUM(v) AS s
  FROM p, days GROUP BY 1, 2
),
one AS (
  SELECT
    MAX(CASE WHEN treat = 0 AND post = 0
             THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS m00,
    MAX(CASE WHEN treat = 0 AND post = 1
             THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS m01,
    MAX(CASE WHEN treat = 1 AND post = 0
             THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS m10,
    MAX(CASE WHEN treat = 1 AND post = 1
             THEN CAST(s AS DOUBLE) / CAST(n AS DOUBLE) END) AS m11
  FROM cells
)
SELECT ROUND(m00, 4) AS ctrl_pre,
       ROUND(m01, 4) AS ctrl_post,
       ROUND(m10, 4) AS treat_pre,
       ROUND(m11, 4) AS treat_post,
       ROUND((m11 - m10) - (m01 - m00), 4) AS did_estimate
FROM one
"""


def order_anova_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA (extension: the k-group generalization of
    `variant_conversion_ztest`'s two-group comparison): does mean
    order value differ across the 5 order priorities? F = (SSB/(k−1))
    / (SSW/(n−k)) from per-group sufficient statistics only — count,
    decimal-exact sum, decimal-exact sum of squares — so the fact
    table is one partial-aggregated groupBy; every between/within
    term is double arithmetic over identical decimal inputs on both
    engines. Also reports η² (effect size)."""
    g = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__n__"),
            F.sum(_dec("o_totalprice")).alias("__s__"),
            F.sum(
                (_dec("o_totalprice") * _dec("o_totalprice")).cast(
                    "decimal(38,4)"
                )
            ).alias("__ss__"),
        )
    )
    n = F.col("__n__").cast("double")
    s = F.col("__s__").cast("double")
    agg = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_groups"),
        F.sum("__n__").cast("bigint").alias("n_total"),
        F.sum(s * s / n).alias("__sb__"),
        F.sum("__s__").cast("double").alias("__S__"),
        F.sum("__ss__").cast("double").alias("__SS__"),
    )
    N = F.col("n_total").cast("double")
    k = F.col("k_groups").cast("double")
    ssb = F.col("__sb__") - F.col("__S__") * F.col("__S__") / N
    ssw = F.col("__SS__") - F.col("__sb__")
    # Degenerate-data NULL sentinels (ANSI mode throws on x/0): a
    # single priority group (k=1), n=k, or zero within-group variance
    # must yield NULL, not DIVIDE_BY_ZERO — same NULLIFs in _ANOVA_SQL.
    f_stat = (ssb / F.nullif(k - 1, F.lit(0.0))) / F.nullif(
        ssw / F.nullif(N - k, F.lit(0.0)), F.lit(0.0)
    )
    return agg.select(
        "k_groups",
        "n_total",
        F.round(f_stat, 4).alias("f_stat"),
        (F.col("k_groups") - 1).cast("bigint").alias("df_between"),
        (F.col("n_total") - F.col("k_groups")).cast("bigint").alias("df_within"),
        F.round(ssb / F.nullif(ssb + ssw, F.lit(0.0)), 6).alias(
            "eta_squared"
        ),
    )


_ANOVA_SQL = """
WITH g AS (
  SELECT o_orderpriority,
         COUNT(*)::BIGINT AS n,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                  * CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS ss
  FROM orders GROUP BY o_orderpriority
),
a AS (
  SELECT COUNT(*)::BIGINT AS k_groups,
         CAST(SUM(n) AS BIGINT) AS n_total,
         SUM(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS sb,
         CAST(SUM(s) AS DOUBLE) AS S,
         CAST(SUM(ss) AS DOUBLE) AS SS
  FROM g
)
SELECT k_groups, n_total,
       ROUND(((sb - S * S / n_total) / NULLIF(k_groups - 1, 0))
             / NULLIF((SS - sb) / NULLIF(n_total - k_groups, 0), 0.0),
             4) AS f_stat,
       CAST(k_groups - 1 AS BIGINT) AS df_between,
       CAST(n_total - k_groups AS BIGINT) AS df_within,
       ROUND((sb - S * S / n_total)
             / NULLIF((sb - S * S / n_total) + (SS - sb), 0.0),
             6) AS eta_squared
FROM a
"""


def event_dow_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and
    day-of-week (extension: the FREQUENCY-table complement of
    `column_dependence_mi`'s information-theoretic dependence — χ²
    gives the classical significance test where MI gives the effect
    size): X² = Σ (o−e)²/e over the |types|×7 contingency table, with
    expected counts from the marginals. The fact table collapses to
    integer cell counts in one groupBy; marginals re-aggregate the
    bounded cell frame (the `column_dependence_mi` pattern); all
    doubles derive from identical integers."""
    from tmdb_index_spark.operators.materialize import pin_frame

    ev = _events(spark, sf_dir)
    dow = F.pmod(
        F.datediff(
            F.to_date(F.col("ts")), F.lit("1970-01-01").cast("date")
        ),
        F.lit(7),
    )
    # the |types|×7 cell frame feeds four subtrees (marginals ×2,
    # total, contribution join) — pin it so events scan exactly once
    cells = pin_frame(
        ev.groupBy(
            F.col("event_type").alias("__t__"), dow.alias("__d__")
        ).agg(F.count(F.lit(1)).alias("__o__"))
    )
    rt = cells.groupBy("__t__").agg(F.sum("__o__").alias("__rt__"))
    ct = cells.groupBy("__d__").agg(F.sum("__o__").alias("__ct__"))
    tot = cells.agg(F.sum("__o__").alias("__n__"))
    e = (
        F.col("__rt__").cast("double")
        * F.col("__ct__").cast("double")
        / F.col("__n__").cast("double")
    )
    contrib = (F.col("__o__").cast("double") - e) * (
        F.col("__o__").cast("double") - e
    ) / e
    joined = (
        cells.join(F.broadcast(rt), "__t__")
        .join(F.broadcast(ct), "__d__")
        .crossJoin(F.broadcast(tot))
    )
    ntypes = F.countDistinct("__t__")
    ndows = F.countDistinct("__d__")
    return joined.agg(
        F.max("__n__").cast("bigint").alias("n_events"),
        F.round(F.sum(contrib), 4).alias("chi2"),
        ((ntypes - 1) * (ndows - 1)).cast("bigint").alias("df"),
    )


_CHISQ_SQL = """
WITH cells AS (
  SELECT event_type AS t,
         datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7 AS d,
         COUNT(*) AS o
  FROM events GROUP BY 1, 2
),
rt AS (SELECT t, SUM(o) AS rtot FROM cells GROUP BY t),
ct AS (SELECT d, SUM(o) AS ctot FROM cells GROUP BY d),
tot AS (SELECT SUM(o) AS n FROM cells)
SELECT CAST(MAX(n) AS BIGINT) AS n_events,
       ROUND(SUM((CAST(o AS DOUBLE) - CAST(rtot AS DOUBLE) * CAST(ctot AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(o AS DOUBLE) - CAST(rtot AS DOUBLE) * CAST(ctot AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(rtot AS DOUBLE) * CAST(ctot AS DOUBLE) / CAST(n AS DOUBLE))), 4) AS chi2,
       CAST((COUNT(DISTINCT t) - 1) * (COUNT(DISTINCT d) - 1) AS BIGINT) AS df
FROM cells JOIN rt USING (t) JOIN ct USING (d) CROSS JOIN tot
"""


def purchase_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test, weekday vs weekend purchase
    values (extension: the nonparametric two-sample location test —
    rank-based where `purchase_value_ks_test` is CDF-based, so the
    pair covers both classical alternatives). Values collapse to
    per-value group counts; tied ranks take the standard midrank,
    computed from :func:`grouped_prefix_sum`'s funnel-free running
    sums — midranks are multiples of 0.5, so R₁ (and U) accumulate
    EXACTLY in doubles and the tie-corrected z is identical on both
    engines."""
    from tmdb_index_spark.operators.ordering import grouped_prefix_sum

    ev = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    dow = F.pmod(
        F.datediff(
            F.to_date(F.col("ts")), F.lit("1970-01-01").cast("date")
        ),
        F.lit(7),
    )
    grp = F.when(dow.isin(2, 3), F.lit("weekend")).otherwise(
        F.lit("weekday")
    )
    per_val = (
        ev.select(_dec("value").alias("__v__"), grp.alias("__g__"))
        .groupBy("__v__")
        .agg(
            F.sum(
                F.when(F.col("__g__") == "weekday", 1).otherwise(0)
            ).alias("__ca__"),
            F.count(F.lit(1)).alias("__c__"),
        )
    )
    cum = grouped_prefix_sum(per_val, "__v__", {"__cum__": "__c__"})
    midrank = F.col("__cum__").cast("double") - (
        F.col("__c__").cast("double") - 1
    ) / 2
    agg = cum.agg(
        F.sum("__ca__").cast("bigint").alias("n_weekday"),
        (F.sum("__c__") - F.sum("__ca__")).cast("bigint").alias("n_weekend"),
        F.sum(midrank * F.col("__ca__").cast("double")).alias("__r1__"),
        F.sum(
            F.col("__c__").cast("double")
            * F.col("__c__").cast("double")
            * F.col("__c__").cast("double")
            - F.col("__c__").cast("double")
        ).alias("__tie__"),
    )
    n1 = F.col("n_weekday").cast("double")
    n2 = F.col("n_weekend").cast("double")
    nn = n1 + n2
    u = F.col("__r1__") - n1 * (n1 + 1) / 2
    # degenerate data (one empty group, a single purchase, or all
    # values tied) zeroes a denominator — NULLIF-guarded on BOTH
    # engines so z is a deterministic NULL instead of an ANSI
    # DIVIDE_BY_ZERO here and Inf/NaN in DuckDB
    var = n1 * n2 / 12 * (
        (nn + 1) - F.col("__tie__") / F.nullif(nn * (nn - 1), F.lit(0.0))
    )
    z = (u - n1 * n2 / 2) / F.nullif(F.sqrt(var), F.lit(0.0))
    return agg.select(
        "n_weekday",
        "n_weekend",
        F.round(u, 1).alias("u_stat"),
        F.round(z, 4).alias("z_score"),
    )


_MANNWHITNEY_SQL = """
WITH p AS (
  SELECT CAST(value AS DECIMAL(18,2)) AS v,
         CASE WHEN datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7
                   IN (2, 3)
              THEN 'weekend' ELSE 'weekday' END AS g
  FROM events WHERE event_type = 'purchase'
),
per_val AS (
  SELECT v,
         SUM(CASE WHEN g = 'weekday' THEN 1 ELSE 0 END) AS ca,
         COUNT(*) AS c
  FROM p GROUP BY v
),
cum AS (
  SELECT ca, c,
         SUM(c) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
  FROM per_val
),
a AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n_weekday,
         CAST(SUM(c) - SUM(ca) AS BIGINT) AS n_weekend,
         SUM((CAST(cm AS DOUBLE) - (CAST(c AS DOUBLE) - 1) / 2)
             * CAST(ca AS DOUBLE)) AS r1,
         SUM(CAST(c AS DOUBLE) * CAST(c AS DOUBLE) * CAST(c AS DOUBLE)
             - CAST(c AS DOUBLE)) AS tie
  FROM cum
)
SELECT n_weekday, n_weekend,
       ROUND(r1 - CAST(n_weekday AS DOUBLE) * (n_weekday + 1) / 2, 1)
         AS u_stat,
       ROUND((r1 - CAST(n_weekday AS DOUBLE) * (n_weekday + 1) / 2
              - CAST(n_weekday AS DOUBLE) * n_weekend / 2)
             / NULLIF(sqrt(CAST(n_weekday AS DOUBLE) * n_weekend / 12
                    * ((n_weekday + n_weekend + 1)
                       - tie / NULLIF(CAST(n_weekday + n_weekend AS DOUBLE)
                                      * (n_weekday + n_weekend - 1), 0.0))),
                      0.0), 4)
         AS z_score
FROM a
"""


def lang_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per language (extension: the
    multilingual-corpus diagnostic every tokenizer report carries —
    tokens per 100 characters and bytes per token tell you which
    languages a whitespace-ish tokenizer over- or under-segments):
    integer sums of token counts, characters, and octet lengths per
    language, ratios taken once at the end. Map-only feature
    extraction + one bounded groupBy; all ratios derive from exact
    integer sums."""
    from tmdb_index_spark.functions.text import token_count

    d = _t(spark, sf_dir, "documents")
    feats = d.select(
        "lang",
        token_count("text").alias("__tok__"),
        F.length("text").cast("bigint").alias("__chars__"),
        F.octet_length("text").cast("bigint").alias("__bytes__"),
    )
    g = feats.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__tok__").cast("bigint").alias("n_tokens"),
        F.sum("__chars__").cast("bigint").alias("__nc__"),
        F.sum("__bytes__").cast("bigint").alias("__nb__"),
    )
    return g.select(
        "lang",
        "n_docs",
        "n_tokens",
        # NULL sentinels for degenerate languages (ANSI x/0 throws):
        # zero chars or zero tokens (whitespace-only text — the exact
        # case source_token_kl guards) — same NULLIFs in _FERTILITY_SQL.
        F.round(
            F.col("n_tokens").cast("double")
            / F.nullif(F.col("__nc__").cast("double"), F.lit(0.0))
            * 100,
            4,
        ).alias("tokens_per_100_chars"),
        F.round(
            F.col("__nb__").cast("double")
            / F.nullif(F.col("n_tokens").cast("double"), F.lit(0.0)),
            4,
        ).alias("bytes_per_token"),
    )


_FERTILITY_SQL = """
WITH feats AS (
  SELECT lang,
         len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))::BIGINT AS tok,
         length(text)::BIGINT AS chars,
         octet_length(encode(text))::BIGINT AS bytes
  FROM documents
)
SELECT lang,
       COUNT(*)::BIGINT AS n_docs,
       CAST(SUM(tok) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(tok) AS DOUBLE)
             / NULLIF(CAST(SUM(chars) AS DOUBLE), 0.0) * 100, 4)
         AS tokens_per_100_chars,
       ROUND(CAST(SUM(bytes) AS DOUBLE)
             / NULLIF(CAST(SUM(tok) AS DOUBLE), 0.0), 4)
         AS bytes_per_token
FROM feats GROUP BY lang
"""


def dedup_yield_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup yield report (extension: the acceptance artifact of a
    dedup run — for each near-dup CLUSTER SIZE, how many clusters
    exist and how many documents canonicalization removes): a
    cluster-size histogram over `dedup_groups`' connected components.
    Two bounded aggregates over the component map; docs_removed =
    (size−1)·clusters since each cluster keeps one canonical doc."""
    from tmdb_index_spark.operators.dedup_text import simhash_neardup_pairs
    from tmdb_index_spark.operators.graph import connected_components

    pairs = simhash_neardup_pairs(
        _t(spark, sf_dir, "documents"), max_hamming=2
    )
    comp = connected_components(pairs)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            ((F.col("cluster_size") - 1) * F.col("n_clusters"))
            .cast("bigint")
            .alias("docs_removed"),
        )
    )


_YIELD_SQL = f"""
WITH comp AS ({_DEDUP_GROUPS_SQL}),
sizes AS (
  SELECT component, COUNT(*)::BIGINT AS cluster_size
  FROM comp GROUP BY component
)
SELECT cluster_size,
       COUNT(*)::BIGINT AS n_clusters,
       CAST((cluster_size - 1) * COUNT(*) AS BIGINT) AS docs_removed
FROM sizes GROUP BY cluster_size
"""


def source_token_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture divergence audit (extension: the training-mix
    governance metric — how far the corpus's PER-SOURCE TOKEN SHARE
    sits from the uniform target mix, per source and in total):
    KL(P‖U) contribution p·ln(p/u) for each source, where p = the
    source's token share and u = 1/|sources|. One map-only token
    count + a bounded per-source aggregate; shares are exact integer
    ratios so the doubles agree cross-engine."""
    from tmdb_index_spark.functions.text import token_count

    d = _t(spark, sf_dir, "documents")
    per_src = d.select(
        "source", token_count("text").cast("bigint").alias("__tok__")
    ).groupBy("source").agg(
        F.sum("__tok__").alias("__t__"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    tot = per_src.agg(
        F.sum("__t__").alias("__tt__"),
        F.count(F.lit(1)).alias("__ns__"),
    )
    p = F.col("__t__").cast("double") / F.col("__tt__").cast("double")
    u = F.lit(1.0) / F.col("__ns__").cast("double")
    # p = 0 (a source whose texts tokenize to nothing): the KL
    # convention is 0·ln(0) = 0 — guarded on BOTH engines (DuckDB's
    # ln(0) hard-errors, Spark's returns NULL; round-7 review)
    kl = F.when(F.col("__t__") > 0, p * F.log(p / u)).otherwise(F.lit(0.0))
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.col("__t__").cast("bigint").alias("n_tokens"),
        F.round(p, 6).alias("token_share"),
        F.round(kl, 6).alias("kl_contribution"),
    )


_SOURCE_KL_SQL = """
WITH per_src AS (
  SELECT source,
         SUM(len(regexp_extract_all(text,
             '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))::BIGINT) AS t,
         COUNT(*)::BIGINT AS n_docs
  FROM documents GROUP BY source
),
tot AS (SELECT SUM(t) AS tt, COUNT(*) AS ns FROM per_src)
SELECT source, n_docs,
       CAST(t AS BIGINT) AS n_tokens,
       ROUND(CAST(t AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS token_share,
       ROUND(CASE WHEN t > 0
                  THEN CAST(t AS DOUBLE) / CAST(tt AS DOUBLE)
                       * ln((CAST(t AS DOUBLE) / CAST(tt AS DOUBLE))
                            / (1.0 / CAST(ns AS DOUBLE)))
                  ELSE 0.0 END, 6) AS kl_contribution
FROM per_src, tot
"""


def vocab_unseen_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good–Turing unseen-mass audit per source (extension: the
    vocabulary-coverage sibling of `vocab_oov_rate` — how much
    probability mass a language model should reserve for tokens it
    has NEVER seen from each source, the classic Good–Turing estimate
    P(unseen) = N₁/N where N₁ counts singleton types; Gale & Sampson
    1995 "Good-Turing frequency estimation without tears"). Per
    source: token count, type count, singleton/doubleton type counts,
    unseen mass and singleton type share. Two combinable hash
    aggregates — (source, term) then source — plus a broadcast join
    back to the source list so zero-token sources still report (with
    the 0-guarded convention, not NULL). Tokenization is the ranking
    family's lowercase word regex, mirrored verbatim in the oracle.
    All counts are exact integers; the two ratios divide as doubles
    and round to 6, so cross-engine parity is by construction."""
    d = _t(spark, sf_dir, "documents")
    freq = (
        d.select(
            "source",
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0
                )
            ).alias("__term__"),
        )
        .groupBy("source", "__term__")
        .agg(F.count(F.lit(1)).alias("__f__"))
    )
    per_src = freq.groupBy("source").agg(
        F.sum("__f__").cast("bigint").alias("__n__"),
        F.count(F.lit(1)).cast("bigint").alias("__v__"),
        F.sum(F.when(F.col("__f__") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("__n1__"),
        F.sum(F.when(F.col("__f__") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("__n2__"),
    )
    srcs = d.select("source").distinct()
    n = F.coalesce(F.col("__n__"), F.lit(0).cast("bigint"))
    v = F.coalesce(F.col("__v__"), F.lit(0).cast("bigint"))
    n1 = F.coalesce(F.col("__n1__"), F.lit(0).cast("bigint"))
    n2 = F.coalesce(F.col("__n2__"), F.lit(0).cast("bigint"))
    return srcs.join(F.broadcast(per_src), "source", "left").select(
        "source",
        n.alias("n_tokens"),
        v.alias("n_types"),
        n1.alias("n_singletons"),
        n2.alias("n_doubletons"),
        F.round(
            F.when(n > 0, n1.cast("double") / n.cast("double")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("unseen_mass"),
        F.round(
            F.when(v > 0, n1.cast("double") / v.cast("double")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("singleton_type_share"),
    )


_VOCAB_UNSEEN_SQL = """
WITH freq AS (
  SELECT source, t.term, COUNT(*)::BIGINT AS f
  FROM documents,
       UNNEST(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t(term)
  GROUP BY 1, 2
),
per_src AS (
  SELECT source,
         SUM(f)::BIGINT AS n,
         COUNT(*)::BIGINT AS v,
         SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
         SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END)::BIGINT AS n2
  FROM freq GROUP BY 1
),
srcs AS (SELECT DISTINCT source FROM documents)
SELECT s.source,
       COALESCE(n, 0)::BIGINT AS n_tokens,
       COALESCE(v, 0)::BIGINT AS n_types,
       COALESCE(n1, 0)::BIGINT AS n_singletons,
       COALESCE(n2, 0)::BIGINT AS n_doubletons,
       ROUND(CASE WHEN COALESCE(n, 0) > 0
                  THEN COALESCE(n1, 0) / CAST(n AS DOUBLE)
                  ELSE 0.0 END, 6) AS unseen_mass,
       ROUND(CASE WHEN COALESCE(v, 0) > 0
                  THEN COALESCE(n1, 0) / CAST(v AS DOUBLE)
                  ELSE 0.0 END, 6) AS singleton_type_share
FROM srcs s LEFT JOIN per_src p USING (source)
"""


def token_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-slope fit of the token frequency distribution (extension:
    the corpus-statistics sibling of `activity_powerlaw_fit` — how
    closely token frequencies follow rank^(−s), the diagnostic behind
    vocabulary sizing and smoothing choices): OLS slope of
    ln(freq) on ln(rank) over the vocabulary. Frequency ranks come
    from :func:`grouped_rank`'s funnel-free bucketed ranks (the vocab
    frame grows with corpus diversity — a naive global row_number
    would single-task sort it). Integer frequencies → identical
    doubles; tiebreak on the term string makes ranks a total order.
    Tokenization is the ranking family's lowercase word regex (the
    oracle mirrors it verbatim — the round-7 fertility lesson: never
    let the two sides' tokenizers drift)."""
    from tmdb_index_spark.operators.ordering import grouped_rank

    d = _t(spark, sf_dir, "documents")
    vocab = (
        d.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0
                )
            ).alias("__term__")
        )
        .groupBy("__term__")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__f__"))
    )
    ranked = grouped_rank(
        vocab, "__f__", tiebreak=["__term__"], rank_col="__r__",
        ascending=False,
    )
    x = F.log(F.col("__r__").cast("double"))
    y = F.log(F.col("__f__").cast("double"))
    agg = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum("__f__").cast("bigint").alias("n_tokens"),
        F.sum(x).alias("__sx__"),
        F.sum(y).alias("__sy__"),
        F.sum(x * y).alias("__sxy__"),
        F.sum(x * x).alias("__sxx__"),
    )
    n = F.col("vocab_size").cast("double")
    # Single-token vocabulary: ln(rank)=0 everywhere → n·sxx−sx² = 0,
    # which ANSI-throws; NULL sentinel instead (mirrored in _ZIPF_SQL).
    slope = (n * F.col("__sxy__") - F.col("__sx__") * F.col("__sy__")) / F.nullif(
        n * F.col("__sxx__") - F.col("__sx__") * F.col("__sx__"), F.lit(0.0)
    )
    return agg.select(
        "vocab_size",
        "n_tokens",
        F.round(-slope, 4).alias("zipf_exponent"),
    )


_ZIPF_SQL = """
WITH vocab AS (
  SELECT term, COUNT(*)::BIGINT AS f
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents)
  GROUP BY term
),
ranked AS (
  SELECT f, ROW_NUMBER() OVER (ORDER BY f DESC, term ASC) AS r FROM vocab
),
a AS (
  SELECT COUNT(*)::BIGINT AS vocab_size,
         CAST(SUM(f) AS BIGINT) AS n_tokens,
         SUM(ln(CAST(r AS DOUBLE))) AS sx,
         SUM(ln(CAST(f AS DOUBLE))) AS sy,
         SUM(ln(CAST(r AS DOUBLE)) * ln(CAST(f AS DOUBLE))) AS sxy,
         SUM(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE))) AS sxx
  FROM ranked
)
SELECT vocab_size, n_tokens,
       ROUND(-((vocab_size * sxy - sx * sy)
               / NULLIF(vocab_size * sxx - sx * sx, 0.0)), 4) AS zipf_exponent
FROM a
"""


QUERIES: dict[str, QueryFn] = {
    "robust_trend_daily": robust_trend_daily,
    "orders_reconciliation": orders_reconciliation,
    "user_rfm_segments": user_rfm_segments,
    "activity_powerlaw_fit": activity_powerlaw_fit,
    "conversion_gains_table": conversion_gains_table,
    "ab_power_analysis": ab_power_analysis,
    "lang_confusion_matrix": lang_confusion_matrix,
    "lang_id_kappa": lang_id_kappa,
    "revenue_bootstrap_ci": revenue_bootstrap_ci,
    "purchase_burstiness": purchase_burstiness,
    "copurchase_item_cf": copurchase_item_cf,
    "search_ndcg": search_ndcg,
    "forecast_accuracy": forecast_accuracy,
    "doc_readability": doc_readability,
    "purchase_value_ks_test": purchase_value_ks_test,
    "column_dependence_mi": column_dependence_mi,
    "purchase_did_estimate": purchase_did_estimate,
    "variant_conversion_ztest": variant_conversion_ztest,
    "metric_correlation_matrix": metric_correlation_matrix,
    "bloom_prefilter_revenue": bloom_prefilter_revenue,
    "bigram_perplexity": bigram_perplexity,
    "ewma_daily_value": ewma_daily_value,
    "clamped_running_balance": clamped_running_balance,
    "click_purchase_leadlag": click_purchase_leadlag,
    "fd_discovery_lineitem": fd_discovery_lineitem,
    "dow_seasonality": dow_seasonality,
    "signup_conversion_survival": signup_conversion_survival,
    "dedup_canonical_map": dedup_canonical_map,
    "flagship_scan_filter": flagship,
    "dedup_segments_rebuild": dedup_segments_rebuild,
    "price_size_frontier": price_size_frontier,
    "supplier_reach_hops": supplier_reach_hops,
    "contrastive_negatives": contrastive_negatives,
    "user_value_trends": user_value_trends,
    "user_value_twap": user_value_twap,
    "zorder_locality": zorder_locality,
    "source_token_nucleus": source_token_nucleus,
    "daily_transit_allocation": daily_transit_allocation,
    "orders_checksum": orders_checksum,
    "state_value_attribution": state_value_attribution,
    "purchase_click_drift": purchase_click_drift,
    "orderkey_skew_report": orderkey_skew_report,
    "cosupply_kcore": cosupply_kcore,
    "collocation_pmi": collocation_pmi,
    "label_centroid_separation": label_centroid_separation,
    "revenue_autocorrelation": revenue_autocorrelation,
    "source_shingle_overlap": source_shingle_overlap,
    "benford_price_check": benford_price_check,
    "conversion_latency_quantiles": conversion_latency_quantiles,
    "user_value_drawdown": user_value_drawdown,
    "part_pair_lift": part_pair_lift,
    "frequent_event_trigrams": frequent_event_trigrams,
    "supplier_path_costs": supplier_path_costs,
    "audience_overlap": audience_overlap,
    "revenue_changepoints": revenue_changepoints,
    "weighted_median_price": weighted_median_price,
    "daily_value_anomalies": daily_value_anomalies,
    "user_heartbeat_gaps": user_heartbeat_gaps,
    "k_anonymity_audit": k_anonymity_audit,
    "cohort_ltv_curves": cohort_ltv_curves,
    "user_stickiness": user_stickiness,
    "nation_spend_gini": nation_spend_gini,
    "user_behavior_entropy": user_behavior_entropy,
    "bpe_pair_counts": bpe_pair_counts,
    "sliding_distinct_users": sliding_distinct_users,
    "event_transition_probs": event_transition_probs,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_order_revenue_topk": q3_order_revenue_topk,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q14_promo_revenue": q14_promo_revenue,
    "json_props_rollup": json_props_rollup,
    "rollup_revenue": rollup_revenue,
    "moving_avg_daily_value": moving_avg_daily_value,
    "value_percentiles": value_percentiles,
    "purchasing_error_users": purchasing_error_users,
    "pivot_event_counts": pivot_event_counts,
    "user_event_sequences": user_event_sequences,
    "upsert_keep_last": upsert_keep_last,
    "upsert_join_keep_last": upsert_join_keep_last,
    "align_dense_ids": align_dense_ids,
    "latest_event_per_user": latest_event_per_user,
    "first_event_per_user": first_event_per_user,
    "duplicate_custkeys": duplicate_custkeys,
    "backfill_topk": backfill_topk,
    "refresh_topk": refresh_topk,
    "change_summary_counts": change_summary_counts,
    "profile_stats": profile_stats,
    "validate_dense_key": validate_dense_key,
    "extract_numeric_ids": extract_numeric_ids,
    "daily_event_rollup": daily_event_rollup,
    "export_flag_join": export_flag_join,
    "sessionize_events": sessionize_events,
    "hourly_windowed_counts": hourly_windowed_counts,
    "session_window_counts": session_window_counts,
    "dedup_exact_hash": dedup_exact_hash,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "minhash_sigs": minhash_sigs,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "incremental_novelty_rate": incremental_novelty_rate,
    "simhash_fingerprints": simhash_fingerprints,
    "simhash_neardups": simhash_neardups,
    "embedding_topk": embedding_topk,
    "embedding_lsh_topk": embedding_lsh_topk,
    "embedding_lsh_tuned_topk": embedding_lsh_tuned_topk,
    "embedding_ivf_topk": embedding_ivf_topk,
    "embedding_neardups": embedding_neardups,
    "embedding_neardups_tuned": embedding_neardups_tuned,
    "semantic_dedup_flags": semantic_dedup_flags,
    "embedding_pca_labels": embedding_pca_labels,
    "embedding_pq_topk": embedding_pq_topk,
    "ann_recall_eval": ann_recall_eval,
    "mmr_diversified_topk": mmr_diversified_topk,
    "conformal_revenue_interval": conformal_revenue_interval,
    "compaction_plan": compaction_plan,
    "signup_psm_att": signup_psm_att,
    "event_stationary_dist": event_stationary_dist,
    "source_ablation_effects": source_ablation_effects,
    "nation_balance_fdr": nation_balance_fdr,
    "order_trimmed_mean": order_trimmed_mean,
    "channel_removal_effects": channel_removal_effects,
    "source_quality_shrinkage": source_quality_shrinkage,
    "rolling_backtest_mae": rolling_backtest_mae,
    "code_switch_rate": code_switch_rate,
    "distinct_parts_per_supplier": distinct_parts_per_supplier,
    "lang_id_predict": lang_id_predict,
    "text_quality": text_quality,
    "adaptive_quality_filter": adaptive_quality_filter,
    "token_counts": token_counts,
    "vocab_oov_rate": vocab_oov_rate,
    "doc_fingerprints": doc_fingerprints,
    "corpus_clean": corpus_clean,
    "corpus_pipeline_stats": corpus_pipeline_stats,
    "asof_purchase_snapshot": asof_purchase_snapshot,
    "train_test_split_counts": train_test_split_counts,
    "dedup_jaccard_prefix": dedup_jaccard_prefix,
    "dedup_groups": dedup_groups,
    "tfidf_terms": tfidf_terms,
    "bm25_search": bm25_search,
    "cumulative_daily_revenue": cumulative_daily_revenue,
    "order_priority_counts": order_priority_counts,
    "customers_without_orders": customers_without_orders,
    "top_supplier_per_nation": top_supplier_per_nation,
    "user_event_gaps": user_event_gaps,
    "cube_revenue": cube_revenue,
    "parts_never_returned": parts_never_returned,
    "value_ntile_quartiles": value_ntile_quartiles,
    "customers_above_avg_orders": customers_above_avg_orders,
    "stratified_sample_counts": stratified_sample_counts,
    "dq_summary": dq_summary,
    "salted_join_revenue": salted_join_revenue,
    "embedding_ivf_multiprobe": embedding_ivf_multiprobe,
    "customer_first_last_order": customer_first_last_order,
    "media_decode": media_decode,
    "crossmodal_image_neardups": crossmodal_image_neardups,
    "gap_fill_locf": gap_fill_locf,
    "grouping_sets_revenue": grouping_sets_revenue,
    "unpivot_lineitem_metrics": unpivot_lineitem_metrics,
    "value_rank_dist": value_rank_dist,
    "click_purchase_attribution": click_purchase_attribution,
    "disjunctive_brand_revenue": disjunctive_brand_revenue,
    "nation_trade_volume": nation_trade_volume,
    "value_histogram": value_histogram,
    "value_equidepth_histogram": value_equidepth_histogram,
    "decontam_ngram_hits": decontam_ngram_hits,
    "dsir_source_importance": dsir_source_importance,
    "mixture_budget_allocation": mixture_budget_allocation,
    "repetition_quality": repetition_quality,
    "pii_redaction": pii_redaction,
    "pack_sequences_stats": pack_sequences_stats,
    "q13_order_distribution": q13_order_distribution,
    "q15_top_suppliers": q15_top_suppliers,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_large_orders": q18_large_orders,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q9_product_type_profit": q9_product_type_profit,
    "q11_important_parts": q11_important_parts,
    "q12_shipmode_priority": q12_shipmode_priority,
    "q16_supplier_relationship": q16_supplier_relationship,
    "q20_promotion_suppliers": q20_promotion_suppliers,
    "dup_span_quality": dup_span_quality,
    "mixture_token_sample": mixture_token_sample,
    "embedding_knn_join": embedding_knn_join,
    "funnel_conversion": funnel_conversion,
    "weekly_retention_cohorts": weekly_retention_cohorts,
    "weighted_sample_per_source": weighted_sample_per_source,
    "trade_graph_pagerank": trade_graph_pagerank,
    "source_length_outliers": source_length_outliers,
    "q8_market_share": q8_market_share,
    "unigram_surprisal": unigram_surprisal,
    "chunked_documents": chunked_documents,
    "acctbal_band_counts": acctbal_band_counts,
    "multi_grain_rollup": multi_grain_rollup,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_item_customers": q10_returned_item_customers,
    "corpus_shuffle_positions": corpus_shuffle_positions,
    "user_state_scd2": user_state_scd2,
    "supplier_busy_intervals": supplier_busy_intervals,
    "cosupply_triangles": cosupply_triangles,
    "source_capped_docs": source_capped_docs,
    "fuzzy_name_pairs": fuzzy_name_pairs,
    "hybrid_rrf_search": hybrid_rrf_search,
    # rows-only entries (sketches are engine-private; the k-means fit is
    # an iterative algorithm; exact twins exist above for cross-engine
    # parity) — deliberately absent from ORACLES.
    "approx_distinct_users_daily": approx_distinct_users_daily,
    "approx_value_quantiles": approx_value_quantiles,
    "embedding_ivf_tuned_topk": embedding_ivf_tuned_topk,
    "embedding_ivf2_topk": embedding_ivf2_topk,
    "order_anova_by_priority": order_anova_by_priority,
    "event_dow_chisq": event_dow_chisq,
    "purchase_mannwhitney": purchase_mannwhitney,
    "lang_token_fertility": lang_token_fertility,
    "dedup_yield_curve": dedup_yield_curve,
    "source_token_kl": source_token_kl,
    "vocab_unseen_mass": vocab_unseen_mass,
    "token_zipf_fit": token_zipf_fit,
}

QUERIES = {name: _self_configuring(fn) for name, fn in QUERIES.items()}

ORACLES: dict[str, str] = {
    "robust_trend_daily": _ROBUST_TREND_SQL,
    "orders_reconciliation": _RECONCILE_SQL,
    "user_rfm_segments": _RFM_SQL,
    "activity_powerlaw_fit": _POWERLAW_SQL,
    "conversion_gains_table": _GAINS_SQL,
    "ab_power_analysis": _POWER_SQL,
    "lang_confusion_matrix": _LANG_CONFUSION_SQL,
    "lang_id_kappa": _LANG_KAPPA_SQL,
    "revenue_bootstrap_ci": _BOOTSTRAP_CI_SQL,
    "mmr_diversified_topk": _MMR_SQL,
    "conformal_revenue_interval": _CONFORMAL_SQL,
    "compaction_plan": _COMPACTION_SQL,
    "signup_psm_att": _PSM_SQL,
    "event_stationary_dist": _STATIONARY_SQL,
    "source_ablation_effects": _SOURCE_ABLATION_SQL,
    "nation_balance_fdr": _NATION_FDR_SQL,
    "order_trimmed_mean": _TRIMMED_MEAN_SQL,
    "channel_removal_effects": _REMOVAL_EFFECTS_SQL,
    "source_quality_shrinkage": _SHRINKAGE_SQL,
    "rolling_backtest_mae": _BACKTEST_SQL,
    "code_switch_rate": _CODE_SWITCH_SQL,
    "purchase_burstiness": _BURSTINESS_SQL,
    "copurchase_item_cf": _ITEM_CF_SQL,
    "search_ndcg": _NDCG_SQL,
    "forecast_accuracy": _FORECAST_ACC_SQL,
    "doc_readability": _READABILITY_SQL,
    "purchase_value_ks_test": _KS_SQL,
    "column_dependence_mi": _MI_COLDEP_SQL,
    "purchase_did_estimate": _DID_SQL,
    "order_anova_by_priority": _ANOVA_SQL,
    "event_dow_chisq": _CHISQ_SQL,
    "purchase_mannwhitney": _MANNWHITNEY_SQL,
    "lang_token_fertility": _FERTILITY_SQL,
    "dedup_yield_curve": _YIELD_SQL,
    "source_token_kl": _SOURCE_KL_SQL,
    "vocab_unseen_mass": _VOCAB_UNSEEN_SQL,
    "token_zipf_fit": _ZIPF_SQL,
    "variant_conversion_ztest": _ZTEST_SQL,
    "metric_correlation_matrix": _CORR_MATRIX_SQL,
    "bloom_prefilter_revenue": _BLOOM_SQL,
    "bigram_perplexity": _BIGRAM_PPL_SQL,
    "ewma_daily_value": _EWMA_SQL,
    "clamped_running_balance": _CLAMPED_BALANCE_SQL,
    "click_purchase_leadlag": _LEADLAG_SQL,
    "fd_discovery_lineitem": _FD_SQL,
    "dow_seasonality": _DOW_SQL,
    "signup_conversion_survival": _SURVIVAL_SQL,
    "dedup_canonical_map": _CANONICAL_SQL,
    "flagship_scan_filter": _FLAGSHIP_SQL,
    "dedup_segments_rebuild": _SEG_DEDUP_SQL,
    "price_size_frontier": _FRONTIER_SQL,
    "supplier_reach_hops": _BFS_SQL,
    "contrastive_negatives": _NEGATIVE_PAIRS_SQL,
    "user_value_trends": _TREND_SQL,
    "user_value_twap": _TWAP_SQL,
    "zorder_locality": _ZORDER_SQL,
    "source_token_nucleus": _NUCLEUS_SQL,
    "daily_transit_allocation": _PRORATE_SQL,
    "orders_checksum": _CHECKSUM_SQL,
    "state_value_attribution": _STATE_ATTR_SQL,
    "purchase_click_drift": _DRIFT_SQL,
    "orderkey_skew_report": _SKEW_REPORT_SQL,
    "cosupply_kcore": _KCORE_SQL,
    "collocation_pmi": _PMI_SQL,
    "label_centroid_separation": _CENTROID_SQL,
    "revenue_autocorrelation": _AUTOCORR_SQL,
    "source_shingle_overlap": _SOURCE_OVERLAP_SQL,
    "benford_price_check": _BENFORD_SQL,
    "conversion_latency_quantiles": _CONVERSION_LATENCY_SQL,
    "user_value_drawdown": _DRAWDOWN_SQL,
    "part_pair_lift": _PART_LIFT_SQL,
    "frequent_event_trigrams": _EVENT_TRIGRAM_SQL,
    "supplier_path_costs": _SSSP_SQL,
    "audience_overlap": _AUDIENCE_SQL,
    "revenue_changepoints": _CUSUM_SQL,
    "weighted_median_price": _WEIGHTED_MEDIAN_SQL,
    "daily_value_anomalies": _ANOMALY_SQL,
    "user_heartbeat_gaps": _HEARTBEAT_SQL,
    "k_anonymity_audit": _K_ANON_SQL,
    "cohort_ltv_curves": _LTV_SQL,
    "user_stickiness": _STICKINESS_SQL,
    "nation_spend_gini": _GINI_SQL,
    "user_behavior_entropy": _ENTROPY_SQL,
    "bpe_pair_counts": _BPE_PAIRS_SQL,
    "sliding_distinct_users": _SLIDING_DISTINCT_SQL,
    "event_transition_probs": _TRANSITION_SQL,
    "q1_pricing_summary": _Q1_SQL,
    "q3_order_revenue_topk": _Q3_SQL,
    "q5_local_supplier_volume": _Q5_SQL,
    "q14_promo_revenue": _Q14_SQL,
    "json_props_rollup": _JSON_SQL,
    "rollup_revenue": _ROLLUP_SQL,
    "moving_avg_daily_value": _MOVING_AVG_SQL,
    "value_percentiles": _PERCENTILES_SQL,
    "purchasing_error_users": _INTERSECT_SQL,
    "pivot_event_counts": _PIVOT_SQL,
    "user_event_sequences": _SEQUENCES_SQL,
    "upsert_keep_last": _UPSERT_SQL,
    "upsert_join_keep_last": _UPSERT_JOIN_SQL,
    "align_dense_ids": _ALIGN_SQL,
    "latest_event_per_user": _LATEST_EVENT_SQL,
    "first_event_per_user": _FIRST_EVENT_SQL,
    "duplicate_custkeys": _DUPKEYS_SQL,
    "backfill_topk": _BACKFILL_SQL,
    "refresh_topk": _REFRESH_SQL,
    "change_summary_counts": _CHANGE_SUMMARY_SQL,
    "profile_stats": _PROFILE_SQL,
    "validate_dense_key": _VALIDATE_SQL,
    "extract_numeric_ids": _EXTRACT_SQL,
    "daily_event_rollup": _DAILY_ROLLUP_SQL,
    "export_flag_join": _EXPORT_FLAG_SQL,
    "sessionize_events": _SESSIONIZE_SQL,
    "hourly_windowed_counts": _HOURLY_WINDOW_SQL,
    "session_window_counts": _SESSION_WINDOW_SQL,
    "dedup_exact_hash": _DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": _NGRAM_JACCARD_SQL,
    "minhash_sigs": _MINHASH_SQL,
    "dedup_minhash_lsh": _MINHASH_LSH_SQL,
    "incremental_novelty_rate": _NOVELTY_SQL,
    "simhash_fingerprints": _SIMHASH_SQL,
    "simhash_neardups": _SIMHASH_NEARDUP_SQL,
    "embedding_topk": _EMB_TOPK_SQL,
    "embedding_lsh_topk": _EMB_LSH_SQL,
    "embedding_lsh_tuned_topk": _EMB_LSH_TUNED_SQL,
    "embedding_ivf_topk": _IVF_SQL,
    "embedding_neardups": _EMB_NEARDUP_SQL,
    "embedding_neardups_tuned": _EMB_NEARDUP_TUNED_SQL,
    "distinct_parts_per_supplier": _DISTINCT_PARTS_SQL,
    "lang_id_predict": _LANG_ID_SQL,
    "text_quality": _TEXT_QUALITY_SQL,
    "adaptive_quality_filter": _ADAPTIVE_QUALITY_SQL,
    "token_counts": _TOKEN_COUNT_SQL,
    "vocab_oov_rate": _OOV_SQL,
    "doc_fingerprints": _FINGERPRINT_SQL,
    "corpus_clean": _CORPUS_CLEAN_SQL,
    "asof_purchase_snapshot": _ASOF_SQL,
    "train_test_split_counts": _SPLIT_SQL,
    "dedup_jaccard_prefix": _JACCARD_PREFIX_SQL,
    "dedup_groups": _DEDUP_GROUPS_SQL,
    "tfidf_terms": _TFIDF_SQL,
    "bm25_search": _BM25_SQL,
    "cumulative_daily_revenue": _CUMULATIVE_SQL,
    "order_priority_counts": _Q4_SQL,
    "customers_without_orders": _Q22_SQL,
    "top_supplier_per_nation": _TOP_SUPPLIER_SQL,
    "user_event_gaps": _EVENT_GAPS_SQL,
    "cube_revenue": _CUBE_SQL,
    "parts_never_returned": _EXCEPT_SQL,
    "value_ntile_quartiles": _NTILE_SQL,
    "customers_above_avg_orders": _ABOVE_AVG_SQL,
    "stratified_sample_counts": _STRATIFIED_SQL,
    "dq_summary": _DQ_SQL,
    "salted_join_revenue": _SALTED_JOIN_SQL,
    "embedding_ivf_multiprobe": _IVF_MULTIPROBE_SQL,
    "customer_first_last_order": _FIRST_LAST_SQL,
    "media_decode": _MEDIA_DECODE_SQL,
    "crossmodal_image_neardups": _CROSSMODAL_SQL,
    "gap_fill_locf": _GAP_FILL_SQL,
    "grouping_sets_revenue": _GROUPING_SETS_SQL,
    "unpivot_lineitem_metrics": _UNPIVOT_SQL,
    "value_rank_dist": _RANK_DIST_SQL,
    "click_purchase_attribution": _ATTRIBUTION_SQL,
    "disjunctive_brand_revenue": _Q19_SQL,
    "nation_trade_volume": _Q7_SQL,
    "value_histogram": _HISTOGRAM_SQL,
    "value_equidepth_histogram": _EQUIDEPTH_SQL,
    "decontam_ngram_hits": _DECONTAM_SQL,
    "dsir_source_importance": _DSIR_SQL,
    "mixture_budget_allocation": _WATERFILL_SQL,
    "repetition_quality": _REPETITION_SQL,
    "pii_redaction": _PII_REDACTION_SQL,
    "pack_sequences_stats": _PACK_SEQUENCES_SQL,
    "q13_order_distribution": _Q13_SQL,
    "q15_top_suppliers": _Q15_SQL,
    "q17_small_qty_revenue": _Q17_SQL,
    "q18_large_orders": _Q18_SQL,
    "q21_waiting_suppliers": _Q21_SQL,
    "q2_min_cost_supplier": _Q2_SQL,
    "q9_product_type_profit": _Q9_SQL,
    "q11_important_parts": _Q11_SQL,
    "q12_shipmode_priority": _Q12_SQL,
    "q16_supplier_relationship": _Q16_SQL,
    "q20_promotion_suppliers": _Q20_SQL,
    "dup_span_quality": _DUP_SPAN_SQL,
    "mixture_token_sample": _MIXTURE_SQL,
    "embedding_knn_join": _KNN_JOIN_SQL,
    "funnel_conversion": _FUNNEL_SQL,
    "weekly_retention_cohorts": _RETENTION_SQL,
    "weighted_sample_per_source": _WEIGHTED_SAMPLE_SQL,
    "trade_graph_pagerank": _PAGERANK_SQL,
    "source_length_outliers": _OUTLIER_SQL,
    "q8_market_share": _Q8_SQL,
    "unigram_surprisal": _UNIGRAM_SQL,
    "chunked_documents": _CHUNKED_SQL,
    "acctbal_band_counts": _BAND_JOIN_SQL,
    "multi_grain_rollup": _MULTI_GRAIN_SQL,
    "q6_forecast_revenue": _Q6_SQL,
    "q10_returned_item_customers": _Q10_SQL,
    "corpus_shuffle_positions": _SHUFFLE_POS_SQL,
    "user_state_scd2": _SCD2_SQL,
    "supplier_busy_intervals": _BUSY_INTERVALS_SQL,
    "cosupply_triangles": _TRIANGLES_SQL,
    "source_capped_docs": _SOURCE_CAP_SQL,
    "fuzzy_name_pairs": _FUZZY_NAME_SQL,
    "hybrid_rrf_search": _HYBRID_RRF_SQL,
}

# Driver-window rotation, DETERMINISTIC (round-3 advisory): the
# driver's per-round CORRECTNESS file scores only the first 50 registry
# entries, so with >50 queries the presentation order decides which get
# a fresh hard driver row. Rather than a hand-picked priority list, the
# registry is ordered least-recently-driver-GREEN first: for each
# query, find the highest round whose CORRECTNESS_r{N}.json (written by
# the driver into the repo root) records a GREEN row for it — a hash
# match, or for the declared rows-only sketches a rows-recorded
# ``no_oracle`` row (their whole contract); sort ascending by that
# round, ties broken by last-checked round then name. Never-green
# queries sort first (round 0) — so a query whose oracle arrived AFTER
# its last driver look (the round-9 ``embedding_ivf_tuned_topk`` gap)
# re-enters the window immediately instead of waiting out a full
# rotation cycle behind newer additions. The schedule remains a pure
# function of the driver's own published history; the full local gate
# (tools/check_oracle.py, which iterates ALL entries) remains the
# per-change hard gate regardless of window position. Registry CONTENT
# is unchanged — this is ordering only.

#: Queries whose driver contract is rows-only BY DESIGN: their output
#: embeds an engine-private sketch digest (HLL / KLL internals) that no
#: second engine can reproduce bit-for-bit; exact twins carry value
#: parity for them (`distinct_users_daily_exact`, `value_percentiles`).
#: Exposed machine-readably through ``__spark_entry__.oracle_contract``
#: so the driver report can distinguish "by design" from "broken".
ROWS_ONLY_QUERIES: dict[str, str] = {
    "approx_distinct_users_daily":
        "engine-private HLL digest; exact twin distinct_users_daily_exact "
        "carries value parity",
    "approx_value_quantiles":
        "engine-private KLL/GK quantile sketch; exact twin "
        "value_percentiles carries value parity",
}


def _driver_check_history() -> tuple[dict[str, int], dict[str, int]]:
    """(last round with a GREEN row, last round checked at all), per
    query, from the driver's published CORRECTNESS_r*.json files."""
    import glob
    import json
    import os
    import re as _re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    green: dict[str, int] = {}
    seen: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path, encoding="utf-8") as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            seen[name] = max(seen.get(name, 0), rnd)
            ok = isinstance(row, dict) and (
                row.get("hash_match") is True
                or (
                    name in ROWS_ONLY_QUERIES
                    and row.get("err") == "no_oracle"
                    and (row.get("spark_rows") or 0) > 0
                )
            )
            if ok:
                green[name] = max(green.get(name, 0), rnd)
    return green, seen


def _rotated(registry: dict) -> dict:
    try:
        green, seen = _driver_check_history()
    except Exception:
        return registry
    order = sorted(
        registry, key=lambda k: (green.get(k, 0), seen.get(k, 0), k)
    )
    return {k: registry[k] for k in order}


QUERIES = _rotated(QUERIES)
ORACLES = _rotated(ORACLES)

#: Oracles whose SQL embeds DATA-DERIVED literals (fitted centroids):
#: built lazily per sf_dir because the literal values are a function of
#: the table contents — the driver compares at sf0.01, so that is the
#: default. Each builder returns the SQL string or None (→ the query
#: falls back to a rows-only row, exactly the pre-round-7 behavior).
DYNAMIC_ORACLE_BUILDERS: dict[str, Callable[[str], str | None]] = {
    "corpus_pipeline_stats": _fitted_corpus_pipeline_oracle_sql,
    "embedding_ivf_tuned_topk": _fitted_ivf_oracle_sql,
    "semantic_dedup_flags": _fitted_semantic_dedup_oracle_sql,
    "embedding_ivf2_topk": _fitted_ivf2_oracle_sql,
    "embedding_pca_labels": _fitted_pca_oracle_sql,
    "embedding_pq_topk": _fitted_pq_oracle_sql,
    "ann_recall_eval": _ann_recall_oracle_sql,
}


_DYNAMIC_ORACLE_CACHE: dict[str, dict[str, str]] = {}


def dynamic_oracles(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    """Materialize every dynamic oracle for ``sf_dir``; builders that
    fail (unreadable table) are skipped rather than raising. Memoized
    per ``sf_dir`` — each build re-runs the full numpy fits on a
    parquet sample, and the result is a pure function of the table
    bytes, so repeated ``oracle_sql()`` calls should be free."""
    if sf_dir in _DYNAMIC_ORACLE_CACHE:
        return dict(_DYNAMIC_ORACLE_CACHE[sf_dir])
    out: dict[str, str] = {}
    for name, build in DYNAMIC_ORACLE_BUILDERS.items():
        try:
            sql = build(sf_dir)
        except Exception:  # noqa: BLE001
            sql = None
        if sql:
            out[name] = sql
    _DYNAMIC_ORACLE_CACHE[sf_dir] = out
    return dict(out)
