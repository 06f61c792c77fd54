"""Catalog part _sessions_temporal (mechanical split of queries.py; see __init__)."""

from __future__ import annotations

from tmdb_index_spark.queries._shared import (  # noqa: E501
    DataFrame,
    F,
    QueryFn,
    SparkSession,
    Window,
)
from tmdb_index_spark.queries._surface import (  # noqa: E501
    _dec,
    _events,
    _t,
)

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


