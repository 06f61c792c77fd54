"""Catalog part _quality_trends (mechanical split of queries.py; see __init__)."""

from __future__ import annotations

from tmdb_index_spark.queries._shared import (  # noqa: E501
    DataFrame,
    F,
    SparkSession,
    Window,
)
from tmdb_index_spark.queries._surface import (  # noqa: E501
    _dec,
    _events,
    _t,
)
from tmdb_index_spark.queries._embed_dedup import (  # noqa: E501
    _SIMHASH_NEARDUP_SQL,
)
from tmdb_index_spark.queries._stats_causal import (  # noqa: E501
    _LANG_ID_SQL,
    lang_id_predict,
)

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
    from tmdb_index_spark.operators.partitioning import widen_small_scan

    # 14 DECIMAL(37,4) multiply-accumulates per row in the partial
    # aggregate, and a single-row-group scan runs them all on ONE task
    # — widen the projected measures first (metadata-only probe; no-op
    # at production scan widths). Sums are partition-order independent
    # (DECIMAL addition is exact), so the statistics are bit-identical.
    li = widen_small_scan(
        _t(spark, sf_dir, "lineitem").select(*_CORR_METRICS)
    )
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
    array sort/index spellings differ per dialect.

    Per-replicate uniforms come from ONE md5 base hash per row mixed
    through the minhash universal-hash family (``((h % P)·a_b + b_b)
    % P``, P = 2³¹−1): the original B-md5s-per-row form was the
    catalog's one 100×-stress breach — 60M rows × 20 md5+CONV chains
    measured 267× at 100× data (hash throughput degrades under
    sustained allocation pressure), while the mixed form keeps one
    md5 and B integer mixes. Pairwise-independent uniforms ACROSS
    replicates are exactly what the Poisson bootstrap needs — each
    replicate's weights stay i.i.d. ACROSS ROWS (independent md5
    inputs), and replicate correlation only widens/narrows the CI by
    the mixing family's bias, the standard trade hash-derived
    bootstraps make (Chamandy et al. 2012 §4 use the same trick)."""
    key = (
        "CONCAT(CAST(l_orderkey AS STRING), ':', "
        "CAST(l_linenumber AS STRING))"
        if spark_dialect
        else "CONCAT(CAST(l_orderkey AS VARCHAR), ':', "
        "CAST(l_linenumber AS VARCHAR))"
    )
    h = (
        f"CAST(CONV(SUBSTRING(MD5({key}), 1, 15), 16, 10) AS BIGINT)"
        if spark_dialect
        else f"('0x' || substr(md5({key}), 1, 15))::BIGINT"
    )
    from tmdb_index_spark.operators.dedup_text import (
        MINHASH_P,
        _minhash_a,
        _minhash_b,
    )

    # base hash ONCE in its own projection layer; each uniform is one
    # modular mix of it (the minhash family — stays within 62 bits)
    u_cols = ",\n         ".join(
        f"CAST(((h0 % {MINHASH_P}) * {_minhash_a(b)} + {_minhash_b(b)})"
        f" % {MINHASH_P} AS DOUBLE) / {float(MINHASH_P)!r} AS u{b}"
        for b in range(_BOOT_B)
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
    # money rides as exact integer CENTS (bigint): 2B+ decimal-object
    # sums were the remaining 100x cost after the one-md5 fix — long
    # sums stay inside whole-stage codegen. Overflow headroom: max w
    # (8) x 1e7-cent prices x 6e10 rows ~ 5e18 < 2^63; at corpora
    # beyond that, shard the aggregate or return px to DECIMAL.
    aggs = ",\n         ".join(
        f"SUM(w{b} * px) AS swx{b}, SUM(w{b}) AS sw{b}"
        for b in range(_BOOT_B)
    )
    means = ",\n      ".join(
        f"CAST(swx{b} AS DOUBLE) / NULLIF(CAST(sw{b} AS DOUBLE), 0.0)"
        f" / 100.0"
        for b in range(_BOOT_B)
    )
    if spark_dialect:
        sorted_means = f"array_sort(array(\n      {means}\n    ))"
        lo, hi = "element_at(ms, 2)", f"element_at(ms, {_BOOT_B - 2})"
    else:
        sorted_means = f"list_sort([\n      {means}\n    ])"
        lo, hi = "ms[2]", f"ms[{_BOOT_B - 2}]"
    return f"""
WITH hh AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS px,
         {h} AS h0
  FROM {table}
),
uu AS (
  SELECT px,
         {u_cols}
  FROM hh
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
       ROUND(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6) AS point_mean,
       ROUND({lo}, 6) AS boot_lo,
       ROUND({hi}, 6) AS boot_hi
FROM sel
"""


