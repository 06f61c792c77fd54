"""Catalog part _surface (mechanical split of queries.py; see __init__)."""

from __future__ import annotations

from tmdb_index_spark.queries._shared import (  # noqa: E501
    DataFrame,
    F,
    SparkSession,
    Window,
    dedup_keep_first,
    dedup_keep_last,
    duplicate_ids,
    update_or_append,
    update_or_append_join,
)

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
    total (grouping-set aggregation family).  Two-phase form
    (`operators/skew.py: preagg_grouping`): Spark expands every raw
    row once per grouping set BEFORE partial aggregation, so the
    direct rollup pushes 3× the table through the aggregate — here the
    table collapses to its ~6 (flag, status) cells first and the
    Expand runs over those (measured 62.6 → 21.4 s at 100×, SCALE.md
    r12). DECIMAL partials re-merge exactly, so results are
    bit-identical to the direct form (same oracle)."""
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
        mode="rollup",
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
    user, ties broken on event_id.  Aggregate form
    (`operators/dedup.py: dedup_extreme` — the (ts, event_id) order is
    total and non-null, so the winner is a per-key MAX_BY: map-side
    combine collapses each partition to one candidate per user before
    the shuffle, where the window form shuffled every event row and
    sorted by (user, ts, id); measured numbers in SCALE.md r12)."""
    from tmdb_index_spark.operators.dedup import dedup_extreme

    ev = _events(spark, sf_dir)
    return dedup_extreme(
        ev, keys=("user_id",), order_cols=("ts", "event_id"), mode="last"
    ).select("user_id", "event_id", "event_type", "ts")


_LATEST_EVENT_SQL = """
SELECT user_id, event_id, event_type, ts FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
  FROM events
) WHERE rn = 1
"""


def first_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup with explicit order (D4): earliest event per
    user.  Aggregate form — the `latest_event_per_user` rationale with
    MIN_BY (measured 20.0 → 9.5 s at 100×, SCALE.md r12)."""
    from tmdb_index_spark.operators.dedup import dedup_extreme

    ev = _events(spark, sf_dir)
    return dedup_extreme(
        ev, keys=("user_id",), order_cols=("ts", "event_id"), mode="first"
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


def pipeline_daily_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE full daily maintenance cycle of the reference's flagship
    ``process()`` lifecycle (``tmdb_index.py:546-568``) folded through
    the REAL operators as a single composite — the round-13 stretch
    closing the loop on grading the ENGINE's core loop, not just its
    stages, at scale.  Steps, each the certified operator the
    single-stage catalog queries exercise in isolation:

    1. **changes → upsert** (C2): yesterday's index (orders sans the
       ``% 11`` ids) absorbs one day's feed — re-priced ``% 10`` ids
       update in place, the ``% 11`` ids append
       (:func:`~tmdb_index_spark.operators.upsert.update_or_append`).
    2. **align** (C1): dense 0..max(id) materialization — absent ids
       become null rows (:func:`~tmdb_index_spark.operators.upsert
       .align_id_col`), exactly the reference's ``align_id_col``.
    3. **export flag** (C4/J3): broadcast the day's export id set
       (distinct lineitem orderkeys) onto the index, absent → false —
       the ``update_export_flag`` join+fill shape
       (``pipeline.py:109``).
    4. **work selection + fetch + second upsert** (D9/D10/C5): the
       first 100 never-fetched ids (the aligned null rows) via
       :func:`~tmdb_index_spark.operators.selection
       .select_backfill_candidates` and the 100 stalest via
       :func:`select_refresh_candidates`; their deterministic
       "fetched" rows (price = id/2, fresh ``retrieved_at``) upsert
       back in — the fetched frame lacks ``in_export``, so the J2
       enrichment carry-forward inside ``update_or_append`` is
       exercised too.
    5. **validate + summarize** (C9/A7/C7): the dense-key invariant as
       one aggregate pass over the final index plus per-step counts.

    Returns ONE summary row: ``(n_index, n_changes, n_after_upsert,
    n_aligned, n_exported, n_backfill, n_refresh, n_final, dense_ok,
    refetched_price_sum)`` — order-insensitive, DECIMAL-exact, fully
    static-oracle-checkable.  Scale shape: two id-partition upsert
    shuffles + the dense-range join (the lifecycle's intrinsic cost),
    one broadcast flag join, two TakeOrderedAndProject selections;
    the summary consumes only 1-row aggregates."""
    from functools import reduce

    from tmdb_index_spark.operators.selection import (
        select_backfill_candidates,
        select_refresh_candidates,
    )
    from tmdb_index_spark.operators.upsert import align_id_col

    orders = _t(spark, sf_dir, "orders")
    idx = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderdate").cast("timestamp").alias("retrieved_at"),
    )
    changes = orders.filter(
        (F.col("o_orderkey") % 10 == 0) | (F.col("o_orderkey") % 11 == 0)
    ).select(
        F.col("o_orderkey").alias("id"),
        (F.col("o_totalprice") + F.lit(1000.0)).alias("price"),
        F.lit("1998-12-01").cast("timestamp").alias("retrieved_at"),
    )
    from tmdb_index_spark.operators.materialize import pin_frame

    # lazy cache pins (ledger-registered, gates release them): after1
    # feeds 3 plan subtrees and flagged 5 — unpinned, each count arm
    # of the summary crossJoin re-derived the whole upsert+align chain
    after1 = pin_frame(update_or_append(idx, changes))
    aligned = align_id_col(after1)
    export = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("id"))
        .distinct()
        .withColumn("in_export", F.lit(True))
    )
    flagged = pin_frame(
        aligned.join(F.broadcast(export), "id", "left").withColumn(
            "in_export", F.coalesce(F.col("in_export"), F.lit(False))
        )
    )
    backfill = select_backfill_candidates(flagged, 100).select("id")
    refresh = select_refresh_candidates(flagged, 100).select("id")
    # disjoint by construction: backfill ids have NULL retrieved_at
    # (aligned filler rows), refresh ids non-NULL — the upsert's
    # unique-on-id contract holds without a dedup
    fetched = backfill.unionByName(refresh).select(
        "id",
        (F.col("id") * F.lit(0.5)).alias("price"),
        F.lit("2024-01-02").cast("timestamp").alias("retrieved_at"),
    )
    final = update_or_append(flagged, fetched)

    def one(df, col):
        return df.agg(F.count(F.lit(1)).cast("long").alias(col))

    validate = final.agg(
        F.count(F.lit(1)).cast("long").alias("n_final"),
        (
            (F.sum(F.col("id").isNull().cast("int")) == 0)
            & (F.min("id") == 0)
            & (F.max("id") == F.count(F.lit(1)) - 1)
            & (F.count_distinct("id") == F.count(F.lit(1)))
        ).alias("dense_ok"),
        F.round(
            F.sum(
                F.when(
                    F.col("retrieved_at")
                    == F.lit("2024-01-02").cast("timestamp"),
                    F.col("price"),
                ).otherwise(F.lit(0.0)).cast("decimal(18,2)")
            ).cast("double"),
            2,
        ).alias("refetched_price_sum"),
    )
    parts = [
        one(idx, "n_index"),
        one(changes, "n_changes"),
        one(after1, "n_after_upsert"),
        one(aligned, "n_aligned"),
        flagged.agg(
            F.sum(F.col("in_export").cast("int")).cast("long").alias(
                "n_exported"
            )
        ),
        one(backfill, "n_backfill"),
        one(refresh, "n_refresh"),
        validate,
    ]
    return reduce(lambda a, b: a.crossJoin(b), parts)


_DAILY_CYCLE_SQL = """
WITH idx AS (
  SELECT o_orderkey AS id, o_totalprice AS price,
         o_orderdate::TIMESTAMP AS retrieved_at
  FROM orders WHERE o_orderkey % 11 <> 0
),
changes AS (
  SELECT o_orderkey AS id, o_totalprice + 1000.0 AS price,
         TIMESTAMP '1998-12-01' AS retrieved_at
  FROM orders WHERE o_orderkey % 10 = 0 OR o_orderkey % 11 = 0
),
up1 AS (
  SELECT COALESCE(c.id, i.id) AS id,
         CASE WHEN c.id IS NOT NULL THEN c.price ELSE i.price END AS price,
         CASE WHEN c.id IS NOT NULL THEN c.retrieved_at
              ELSE i.retrieved_at END AS retrieved_at
  FROM idx i FULL OUTER JOIN changes c ON i.id = c.id
),
dense AS (
  SELECT UNNEST(generate_series(0, (SELECT MAX(id) FROM up1))) AS id
),
aligned AS (
  SELECT d.id, u.price, u.retrieved_at
  FROM dense d LEFT JOIN up1 u ON d.id = u.id
),
exp AS (SELECT DISTINCT l_orderkey AS id FROM lineitem),
flagged AS (
  SELECT a.id, a.price, a.retrieved_at, (e.id IS NOT NULL) AS in_export
  FROM aligned a LEFT JOIN exp e ON a.id = e.id
),
backfill AS (
  SELECT id FROM flagged WHERE retrieved_at IS NULL ORDER BY id LIMIT 100
),
refresh AS (
  SELECT id FROM (
    SELECT id FROM flagged WHERE retrieved_at IS NOT NULL
    ORDER BY retrieved_at ASC, id ASC LIMIT 100
  )
),
fetched AS (
  SELECT id, id * 0.5 AS price, TIMESTAMP '2024-01-02' AS retrieved_at
  FROM (SELECT id FROM backfill UNION ALL SELECT id FROM refresh)
),
final AS (
  SELECT COALESCE(f.id, g.id) AS id,
         CASE WHEN f.id IS NOT NULL THEN f.price ELSE g.price END AS price,
         CASE WHEN f.id IS NOT NULL THEN f.retrieved_at
              ELSE g.retrieved_at END AS retrieved_at,
         g.in_export
  FROM flagged g FULL OUTER JOIN fetched f ON g.id = f.id
)
SELECT
  (SELECT COUNT(*) FROM idx)::BIGINT AS n_index,
  (SELECT COUNT(*) FROM changes)::BIGINT AS n_changes,
  (SELECT COUNT(*) FROM up1)::BIGINT AS n_after_upsert,
  (SELECT COUNT(*) FROM aligned)::BIGINT AS n_aligned,
  (SELECT SUM(CASE WHEN in_export THEN 1 ELSE 0 END)
   FROM flagged)::BIGINT AS n_exported,
  (SELECT COUNT(*) FROM backfill)::BIGINT AS n_backfill,
  (SELECT COUNT(*) FROM refresh)::BIGINT AS n_refresh,
  (SELECT COUNT(*) FROM final)::BIGINT AS n_final,
  (SELECT SUM(CASE WHEN id IS NULL THEN 1 ELSE 0 END) = 0
          AND MIN(id) = 0 AND MAX(id) = COUNT(*) - 1
          AND COUNT(DISTINCT id) = COUNT(*)
   FROM final) AS dense_ok,
  (SELECT ROUND(CAST(SUM(CASE WHEN retrieved_at = TIMESTAMP '2024-01-02'
                              THEN price ELSE 0.0 END::DECIMAL(18,2))
                     AS DOUBLE), 2)
   FROM final) AS refetched_price_sum
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


