"""Catalog part _inference_late (mechanical split of queries.py; see __init__)."""

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
from tmdb_index_spark.queries._stats_causal import (  # noqa: E501
    _LANG_ID_SQL,
    lang_id_predict,
)
from tmdb_index_spark.queries._retrieval_tpch import (  # noqa: E501
    _BM25_SQL,
    _BM25_TERMS,
    _DEDUP_GROUPS_SQL,
)
from tmdb_index_spark.queries._quality_trends import (  # noqa: E501
    _bootstrap_ci_sql,
)

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
    # Round 15 (guide §1.5/§5 — the bounded-math convention): the ONLY
    # data-sized work per pair is the joint (x, y, count) aggregate —
    # everything downstream (marginals, entropies, MI) re-aggregates
    # the |cells|-bounded joint, which the former spelling expressed as
    # five aggregate subtrees + crossJoin weaving per pair (measured 35
    # consume jobs of tiny serial AQE stages). The joint cells are
    # bounded by the enum domains of the audited columns (returnflag ×
    # linestatus, orderstatus × orderpriority), so they ride ONE
    # distributed aggregate each into a bounded_collect and the
    # entropy/MI sums run in Python over the cells in SORTED cell
    # order (deterministic). Float caveat, stated honestly: the sums'
    # addition ORDER changes (was Spark partition order, now sorted
    # cells; DuckDB uses its own order too) — differences are ≤ a few
    # ULP and the declared output rounds to 4 decimals, which the
    # oracle hash confirms at every SF. The rounding itself stays IN
    # Spark over the literal rows.
    from tmdb_index_spark.operators.materialize import bounded_collect

    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    rows = []
    for df, x, y in [
        (li, "l_returnflag", "l_linestatus"),
        (od, "o_orderstatus", "o_orderpriority"),
    ]:
        cells = bounded_collect(
            df.groupBy(x, y).agg(F.count(F.lit(1)).alias("__c__")),
            4096,
            f"column-dependence joint cells {x}|{y}",
        )
        cells = sorted((r[x], r[y], int(r["__c__"])) for r in cells)
        n = float(sum(c for _, _, c in cells))
        cx: dict = {}
        cy: dict = {}
        for xv, yv, c in cells:
            cx[xv] = cx.get(xv, 0) + c
            cy[yv] = cy.get(yv, 0) + c
        if cells:
            import math

            hx = sum(
                -(cx[k] / n) * math.log2(cx[k] / n) for k in sorted(cx)
            )
            hy = sum(
                -(cy[k] / n) * math.log2(cy[k] / n) for k in sorted(cy)
            )
            mi = sum(
                (c / n)
                * math.log2((c / n) / ((cx[xv] / n) * (cy[yv] / n)))
                for xv, yv, c in cells
            )
            denom = min(hx, hy)
            if denom == 0.0:  # SQL double semantics: x/0.0 = ±Inf, 0/0 = NaN
                u = (
                    float("nan")
                    if mi == 0.0
                    else math.copysign(float("inf"), mi)
                )
            else:
                u = mi / denom
        else:  # empty table: the SQL's global aggregate emits NULLs
            mi = u = None
        rows.append((f"{x}|{y}", len(cells), mi, u))
    return spark.createDataFrame(
        rows, "pair string, n_cells long, __mi__ double, __u__ double"
    ).select(
        "pair",
        "n_cells",
        F.round(F.col("__mi__"), 4).alias("mi_bits"),
        F.round(F.col("__u__"), 4).alias("uncertainty_coef"),
    )


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




_BPE_MERGES_K = 8


def bpe_merges_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-round BPE vocabulary induction over the documents corpus
    (extension: the usable small-vocab trainer grown from the
    one-iteration ``bpe_pair_counts`` exhibit — round-9 verdict
    stretch #8; Sennrich et al. 2016): 8 greedy merge rounds, each
    fusing the (count desc, pair asc) argmax adjacent symbol pair over
    frequency-weighted word types. The merge itself is an engine-
    portable string ``replace`` on marker-prefixed symbol strings
    (see :func:`~tmdb_index_spark.operators.llm_prep
    .bpe_train_merges`), and the per-round argmax is ONE bounded
    driver row — the bounded-math convention, with the ORACLE running
    the identical 8 rounds as chained CTEs with scalar subqueries (a
    FULLY STATIC oracle for an iterative training algorithm). Scale:
    rounds iterate the vocab-bounded word-type frame; only the initial
    word count scans the corpus."""
    from tmdb_index_spark.operators.llm_prep import bpe_train_merges

    return bpe_train_merges(
        _t(spark, sf_dir, "documents"), k=_BPE_MERGES_K
    )


def _bpe_chain_sql(k: int, carry_word: bool = False) -> str:
    """The shared k-round BPE training chain (``WITH words … m{k}``)
    behind both BPE oracles: round r's merged
    strings (m{r}) feed round r+1's pair counts (p{r+1}); each round's
    chosen pair (c{r}) is a scalar subquery applied with the same
    greedy left-to-right ``replace`` the Spark side uses. Every
    multiply-referenced CTE is AS MATERIALIZED — the chain references
    each round twice (pair counts + next merge), and an inlining
    planner would otherwise expand the k-round chain 2^k times
    (measured: the un-pinned form did not finish at sf0.001).

    Returns only the CTE prefix; callers append their own final
    SELECT over ``c1..c{k}`` (merge rows — :func:`_bpe_merges_sql`) or
    ``m{k}`` (final encoded word state). ``carry_word=True`` threads
    the original word ``w`` through every round so a consumer (the
    ``bpe_encoded_fertility`` oracle) can join the FINAL encoded state
    ``m{k}`` back to the corpus — the encode half reuses the training
    chain instead of duplicating it."""
    w_sel = "w, " if carry_word else ""
    parts = [
        f"""
WITH words AS (
  SELECT w, COUNT(*)::BIGINT AS wf FROM (
    SELECT unnest(regexp_split_to_array(trim(coalesce(text, '')), '\\s+')) AS w
    FROM documents) WHERE w <> '' GROUP BY w
),
m0 AS (
  SELECT {w_sel}regexp_replace(w, '(.)', chr(31) || '\\1' || chr(31), 'g') AS s,
         wf
  FROM words
)"""
    ]
    # Symbols are wrapped in the marker on BOTH sides (see
    # bpe_train_merges: a prefix-only encoding fuses across symbol
    # boundaries when the merge's right symbol is a prefix of a longer
    # adjacent symbol). Splitting on the marker therefore yields empty
    # strings between/around symbols — list_filter recovers the clean
    # symbol sequence. The merge pattern re-wraps both symbols:
    # chr(31)||L||chr(31)||chr(31)||R||chr(31) -> chr(31)||LR||chr(31).
    for r in range(1, k + 1):
        parts.append(f""",
t{r} AS MATERIALIZED (
  SELECT {w_sel}list_filter(string_split(s, chr(31)), x -> x <> '') AS ss,
         s, wf
  FROM m{r - 1}),
p{r} AS (
  SELECT pr, SUM(wf)::BIGINT AS c FROM (
    SELECT unnest(list_transform(generate_series(1, len(ss) - 1),
             i -> ss[i] || chr(31) || ss[i + 1])) AS pr, wf
    FROM t{r}) GROUP BY pr
),
c{r} AS MATERIALIZED (SELECT pr, c FROM p{r} ORDER BY c DESC, pr ASC LIMIT 1),
m{r} AS MATERIALIZED (
  SELECT {w_sel}replace(s,
                 chr(31) || replace((SELECT pr FROM c{r}), chr(31),
                                    chr(31) || chr(31)) || chr(31),
                 chr(31) || replace((SELECT pr FROM c{r}), chr(31), '')
                         || chr(31)) AS s,
         wf
  FROM t{r}
)""")
    return "".join(parts)


def _bpe_merges_sql(k: int) -> str:
    """Final SELECT for ``bpe_merges_k``: one row per executed merge
    round, read off the chain's ``c{r}`` argmax CTEs."""
    rows = "\nUNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS step,"
        f" split_part(pr, chr(31), 1) AS left_sym,"
        f" split_part(pr, chr(31), 2) AS right_sym,"
        f" replace(pr, chr(31), '') AS merged, c AS n_pairs FROM c{r}"
        for r in range(1, k + 1)
    )
    return (
        _bpe_chain_sql(k) + f"\nSELECT * FROM (\n{rows}\n) ORDER BY step"
    )


_BPE_MERGES_SQL = _bpe_merges_sql(_BPE_MERGES_K)


def bpe_encoded_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language BPE token fertility after applying the 8 learned
    merges (extension: the ENCODE half of the tokenizer loop — round-10
    verdict #2; the trainer builds the artifact, this consumes it, the
    reference's build-then-query pattern ``README.md:6-12``): train
    :func:`~tmdb_index_spark.operators.llm_prep.bpe_train_merges` on
    the corpus, apply the merge table with :func:`~tmdb_index_spark
    .operators.llm_prep.bpe_encode`'s literal replace chain, and
    aggregate per language — words, characters, BPE tokens, and
    tokens-per-word fertility (every merge that fires lowers it below
    1·words + extra chars·0). Scale: train rounds are vocab-bounded
    (see ``bpe_merges_k``); encode + counts are one map-only pass over
    the corpus (k chained literal replaces, no UDF, no join) feeding a
    |languages|-row partial aggregate. The ORACLE is fully static: it
    reuses the training chain with the word carried through
    (:func:`_bpe_chain_sql` ``carry_word=True``) and joins the final
    encoded word state back to the corpus words."""
    from tmdb_index_spark.functions.text import tokens
    from tmdb_index_spark.operators.llm_prep import (
        bpe_encode,
        bpe_train_merges,
    )
    from tmdb_index_spark.operators.materialize import bounded_collect

    docs = _t(spark, sf_dir, "documents")
    merge_rows = bounded_collect(
        bpe_train_merges(docs, k=_BPE_MERGES_K),
        _BPE_MERGES_K,
        "BPE merge table",
    )
    merges = [(r["left_sym"], r["right_sym"]) for r in merge_rows]
    txt = F.coalesce(F.col("text"), F.lit(""))
    words = F.filter(tokens(txt), lambda x: x != F.lit(""))
    enc = bpe_encode(
        docs.select("lang", "text"), merges, out_col="__toks__"
    ).select(
        "lang",
        F.size(words).cast("bigint").alias("__nw__"),
        F.aggregate(
            words,
            F.lit(0).cast("bigint"),
            lambda acc, w: acc + F.length(w).cast("bigint"),
        ).alias("__nc__"),
        F.size("__toks__").cast("bigint").alias("__nt__"),
    )
    return (
        enc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__nw__").alias("n_words"),
            F.sum("__nc__").alias("n_chars"),
            F.sum("__nt__").alias("n_bpe_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_chars",
            "n_bpe_tokens",
            F.when(
                F.col("n_words") > 0,
                F.round(
                    F.col("n_bpe_tokens").cast("double")
                    / F.col("n_words").cast("double"),
                    4,
                ),
            ).alias("fertility"),
        )
    )


def _bpe_encode_fertility_sql(k: int) -> str:
    """Static oracle for ``bpe_encoded_fertility``: the training chain
    with ``w`` carried through (``m{k}`` holds each word type's FINAL
    encoded string), token count per word type read off the marker
    arithmetic (every token carries exactly two chr(31) markers), then
    a per-language rollup over the corpus word instances."""
    return (
        _bpe_chain_sql(k, carry_word=True)
        + f""",
enc AS MATERIALIZED (
  SELECT w,
         CAST((len(s) - len(replace(s, chr(31), ''))) / 2 AS BIGINT) AS nt
  FROM m{k}
),
docw AS (
  SELECT lang, w FROM (
    SELECT lang,
           unnest(regexp_split_to_array(trim(coalesce(text, '')), '\\s+')) AS w
    FROM documents) WHERE w <> ''
),
wagg AS (
  SELECT lang,
         COUNT(*)::BIGINT AS n_words,
         SUM(len(docw.w))::BIGINT AS n_chars,
         SUM(enc.nt)::BIGINT AS n_bpe_tokens
  FROM docw JOIN enc USING (w) GROUP BY lang
),
dcount AS (SELECT lang, COUNT(*)::BIGINT AS n_docs FROM documents GROUP BY lang)
SELECT d.lang, d.n_docs,
       coalesce(n_words, 0) AS n_words,
       coalesce(n_chars, 0) AS n_chars,
       coalesce(n_bpe_tokens, 0) AS n_bpe_tokens,
       CASE WHEN coalesce(n_words, 0) > 0
            THEN ROUND(n_bpe_tokens::DOUBLE / n_words::DOUBLE, 4) END
         AS fertility
FROM dcount d LEFT JOIN wagg USING (lang)"""
    )


_BPE_ENCODE_FERTILITY_SQL = _bpe_encode_fertility_sql(_BPE_MERGES_K)
