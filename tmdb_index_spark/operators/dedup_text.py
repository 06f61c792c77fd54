"""Document near-duplicate detection (north-star extension operators).

Four strategies over a ``documents(doc_id, text, ...)`` table, each
designed so the expensive pairwise comparison never goes quadratic in
the corpus:

* :func:`dedup_exact` — hash-groupBy; one shuffle on the content hash.
* :func:`ngram_jaccard_pairs` — inverted shingle index: explode
  shingles, self-join on the shingle (only docs sharing a shingle meet),
  count intersections, then Jaccard from per-doc shingle counts.
* :func:`minhash_signatures` / :func:`minhash_lsh_pairs` — k min-hashes
  from ONE md5 per shingle + a universal hash family, banded; candidate
  pairs only within equal band buckets.
* :func:`simhash64` — 64-bit bit-vote fingerprint; near-dups have small
  Hamming distance (compared with ``bit_count(xor)``).

Scale notes (100 TB): every strategy is shuffle-bounded by the
*inverted index / bucket* cardinality, not |docs|². Skewed shingles
(stopword trigrams) are the classic hazard — ``ngram_jaccard_pairs``
caps posting-list length with ``max_df`` the way MinHashLSH banding
caps bucket width. All base hashing is md5-derived (engine-portable,
deterministic) rather than ``xxhash64`` so a SQL oracle can reproduce
results exactly; swap :func:`~tmdb_index_spark.functions.text
.portable_hash60` for ``F.xxhash64`` for a few % more throughput when
oracle parity is not needed.

Shingling runs as an Arrow-batched map-only Pandas stage (measured ~5×
faster than interpreted higher-order array expressions); everything
downstream is built-in exprs, so dedup of a billion docs is a handful
of codegen'd stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tmdb_index_spark.functions.text import portable_hash60, tokens, word_shingles
from tmdb_index_spark.operators.materialize import pin_frame
from tmdb_index_spark.operators.partitioning import widen_small_scan

__all__ = [
    "dedup_exact",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_prefix",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "minhash_novelty_pairs",
    "minhash_band_buckets",
    "simhash64",
    "simhash_neardup_pairs",
    "group_shingle_jaccard",
]

#: Universal-hash-family modulus for MinHash (Mersenne prime 2^31−1):
#: keeps every intermediate below 62 bits so ANSI arithmetic can't
#: overflow, in Spark and in the SQL oracle alike.
MINHASH_P = 2_147_483_647


def _minhash_a(i: int) -> int:
    """Multiplier for hash i — odd, deterministic, engine-portable."""
    return (2 * i + 1) * 40_503 + 1_000_003


def _minhash_b(i: int) -> int:
    """Offset for hash i."""
    return i * 1_442_968_193 % MINHASH_P


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-content dedup groups: one row per distinct content hash with
    the keeper (min id) and the duplicate count. Single map-side-combined
    shuffle on the hash."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def _shingle_frame(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """Distinct (id, shingle-hash, set-size) rows — the inverted-index
    input. ``__sh__`` is the shingle's 60-bit md5 (``portable_hash60``
    of the space-joined shingle, computed Python-side), NOT the string:

    * the inverted-index self-joins shuffle 8-byte longs instead of
      ~20-byte strings, and long-key hash joins beat string keys;
    * MinHash needs exactly this md5 as its base hash, so the one
      crypto hash per shingle happens HERE, once, instead of as a JVM
      md5+conv per signature row;
    * set semantics are equality-only downstream (Jaccard counts,
      banding, df ranking), where a 60-bit hash is interchangeable
      with the string (collision odds ~|shingles|²/2^61).

    Arrow-batched ``mapInPandas`` instead of
    ``explode(array_distinct(word_shingles(...)))``: Spark evaluates
    higher-order array functions interpreted (outside whole-stage
    codegen), and the measured Pandas path is ~5× faster while staying
    map-only — no shuffle, scales with executors. Tokenization matches
    the SQL twin exactly: split on runs of ASCII whitespace after
    trimming (``re.ASCII`` — Java/RE2 ``\\s`` is ASCII-only, Python's
    default is not); hashing matches because
    ``int(md5(s).hexdigest()[:15], 16) == md5(s).digest()[:8] >> 4``.
    """
    import hashlib
    import re

    import pandas as pd

    ws = re.compile(r"\s+", re.ASCII)

    def shingler(batches):
        md5 = hashlib.md5
        from_bytes = int.from_bytes
        for pdf in batches:
            ids: list = []
            shs: list[int] = []
            cnt: list[int] = []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                toks = ws.split(txt.strip(" \t\n\r\f\v")) if txt else []
                seen: dict[str, None] = {}
                for j in range(len(toks) - (n - 1)):
                    seen.setdefault(" ".join(toks[j : j + n]))
                k = len(seen)
                ids.extend([i] * k)
                shs.extend(
                    from_bytes(md5(s.encode("utf-8")).digest()[:8], "big") >> 4
                    for s in seen
                )
                cnt.extend([k] * k)
            yield pd.DataFrame({"__id__": ids, "__sh__": shs, "__n__": cnt})

    id_type = dict(df.dtypes)[id_col]
    # Single-row-group corpora scan as one task; the per-doc shingle+md5
    # loop is the engine's heaviest Python stage, so widen first (no-op
    # at production scan widths — operators/partitioning.py).
    src = widen_small_scan(df.select(F.col(id_col), F.col(text_col)))
    return src.mapInPandas(
        shingler, f"__id__ {id_type}, __sh__ long, __n__ long"
    )


def _reuse_shingles(
    sh: DataFrame, materialize: str, scratch_dir: str | None = None
) -> DataFrame:
    """The shingle frame feeds BOTH sides of the self-join (three
    subtrees in the prefix variant), and its Python stage is treated as
    nondeterministic by Spark — so it must be pinned, not recomputed.
    See :func:`tmdb_index_spark.operators.materialize.pin_frame` for
    the cache-vs-parquet trade-off and the shared-storage requirement
    ``scratch_dir`` carries on a multi-node cluster.
    """
    return pin_frame(sh, materialize, scratch_dir)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 1000,
    materialize: str = "cache",
    scratch_dir: str | None = None,
) -> DataFrame:
    """Doc pairs with word-``n``-gram Jaccard similarity ≥ ``threshold``.

    Plan shape: explode distinct shingles → (optionally) drop shingles
    appearing in more than ``max_df`` docs (they contribute candidates
    quadratically but little signal — the skew guard) → self-join on the
    shingle → per-pair intersection counts → Jaccard via
    |A∩B| / (|A|+|B|−|A∩B|). Returns ``(id_a, id_b, jaccard)`` with
    ``id_a < id_b``.
    """
    # Set sizes ride ON the shingle rows (__n__ emitted by the shingler)
    # rather than via a separate groupBy subtree: one fewer shuffle and
    # two fewer joins, and — because the Python stage is assumed
    # nondeterministic by Spark — no risk of a recomputed partition
    # desynchronizing a separately-aggregated sizes relation from the
    # pair counts. Sizes are the TRUE per-doc shingle counts (pre
    # max_df filter), matching the SQL oracle's denominator.
    sh = _reuse_shingles(_shingle_frame(df, text_col, id_col, n), materialize, scratch_dir)
    if max_df is not None:
        common = (
            sh.groupBy("__sh__")
            .agg(F.count(F.lit(1)).alias("__df__"))
            .filter(F.col("__df__") > max_df)
            .select("__sh__")
        )
        sh = sh.join(F.broadcast(common), "__sh__", "left_anti")

    a = sh.select(F.col("__id__").alias("id_a"), "__sh__", F.col("__n__").alias("__na__"))
    b = sh.select(F.col("__id__").alias("id_b"), "__sh__", F.col("__n__").alias("__nb__"))
    # Size prefilter (PPJoin-style): jaccard(A,B) ≥ t ⟹ t·|B| ≤ |A| and
    # t·|A| ≤ |B|, so size-incompatible pairs drop BEFORE the per-pair
    # aggregation — with the counts already on the rows this is a free
    # predicate inside the join.
    return (
        a.join(b, "__sh__")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            (F.col("__na__") >= F.lit(threshold) * F.col("__nb__"))
            & (F.col("__nb__") >= F.lit(threshold) * F.col("__na__"))
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("__inter__"),
            F.max("__na__").alias("__na__"),
            F.max("__nb__").alias("__nb__"),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("__inter__").cast("double")
                / (F.col("__na__") + F.col("__nb__") - F.col("__inter__")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    materialize: str = "cache",
    scratch_dir: str | None = None,
) -> DataFrame:
    """Prefix-filtered (PPJoin/All-Pairs-style) exact Jaccard pair
    search — same result set as :func:`ngram_jaccard_pairs`, different
    candidate generation.

    Shingles are globally ordered rarest-first (document frequency asc,
    shingle asc) and only each doc's first ``|A| − ⌈t·|A|⌉ + 1``
    shingles are indexed: two sets with Jaccard ≥ t MUST share a
    prefix element under any common global order (Chaudhuri et al.,
    "A Primitive Operator for Similarity Joins", ICDE'06; Xiao et al.,
    "Efficient Similarity Joins for Near Duplicate Detection", WWW'08).
    Candidates are verified with one ``array_intersect`` against the
    full sorted shingle arrays.

    Scale behavior: the inverted-index join shrinks ~(1−t)² in
    candidate-occurrence volume AND the most-frequent shingles (the
    quadratic candidate generators) fall out of every prefix — so
    pruning strengthens exactly where the base operator degrades:
    Zipfian shingle distributions with long posting lists. On the
    synthetic bench corpus (max document frequency 25 — no skew to
    prune) the base operator wins at every threshold (measured 1.7s vs
    2.8s at t=0.5, sf0.1) because the df-ranking window and the
    verify joins cost more than the small candidate set they avoid;
    this variant is the high-threshold/skewed-corpus path, not a
    universal replacement.
    """
    if not 0 < threshold <= 1:
        raise ValueError("prefix filtering needs 0 < threshold <= 1")
    sh = _reuse_shingles(_shingle_frame(df, text_col, id_col, n), materialize, scratch_dir)
    dfd = sh.groupBy("__sh__").agg(F.count(F.lit(1)).alias("__df__"))
    ranked = sh.join(dfd, "__sh__").withColumn(
        "__pos__",
        F.row_number().over(
            Window.partitionBy("__id__").orderBy(
                F.asc("__df__"), F.asc("__sh__")
            )
        ),
    )
    prefix_len = F.col("__n__") - F.ceil(F.lit(threshold) * F.col("__n__")) + 1
    pref = ranked.filter(F.col("__pos__") <= prefix_len).select(
        "__id__", "__sh__", "__n__", "__pos__"
    )
    a = pref.select(
        F.col("__id__").alias("id_a"),
        "__sh__",
        F.col("__n__").alias("__na__"),
        F.col("__pos__").alias("__pa__"),
    )
    b = pref.select(
        F.col("__id__").alias("id_b"),
        "__sh__",
        F.col("__n__").alias("__nb__"),
        F.col("__pos__").alias("__pb__"),
    )
    # PPJoin+ positional filter (round 15; Xiao et al. WWW'08 §3.2):
    # candidates whose shared-prefix POSITIONS already cap the
    # attainable overlap below the Jaccard-α requirement are dropped
    # BEFORE the verify join ever sees them — measured on the sf0.1
    # bench corpus: verify-join pair input 310,161 → 119,884 (2.6×,
    # and with it both array-attach joins; the tighter first-match and
    # min-over-all-matches variants were measured to prune NOTHING
    # further here, so the single last-match bound stays). The cut
    # grows with prefix selectivity, i.e. exactly on the skewed/high-
    # threshold corpora this variant targets (guide §2.3 shuffle fewer
    # bytes, §3.2 pre-filter). SOUNDNESS (no true pair can be lost):
    # let e* be the greatest shared prefix token in the global
    # (df, sh) order, at 1-based positions i*=max(__pa__) in A and
    # j*=max(__pb__) in B (per-doc position is monotone in the global
    # order, so both maxima are attained at e*). Any common element
    # BELOW e* sits at positions < i* ≤ prefix_len(A) and
    # < j* ≤ prefix_len(B), i.e. inside BOTH prefixes — so it is one
    # of the __k__ shared prefix tokens. Common elements ABOVE e*
    # occupy positions > i* in A and > j* in B, at most
    # min(|A|−i*, |B|−j*) of them. Hence
    #     |A∩B| ≤ __k__ + min(|A|−i*, |B|−j*)  =: ubound,
    # and jaccard ≥ t ⟺ |A∩B|·(1+t) ≥ t·(|A|+|B|), so any pair with
    # ubound·(1+t) < t·(|A|+|B|) − ε cannot verify (ε=1e-9 absorbs
    # float rounding for irrational t; all quantities are small-int
    # products, exact in double for the catalog's t=0.5). The groupBy
    # replaces the former .distinct() — same candidate key set, now
    # with the positional aggregates on it.
    cand = pin_frame(
        a.join(b, "__sh__")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            (F.col("__na__") >= F.lit(threshold) * F.col("__nb__"))
            & (F.col("__nb__") >= F.lit(threshold) * F.col("__na__"))
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("__k__"),
            F.max("__pa__").alias("__ia__"),
            F.max("__pb__").alias("__jb__"),
            F.max("__na__").alias("__na__"),
            F.max("__nb__").alias("__nb__"),
        )
        .filter(
            (
                F.col("__k__")
                + F.least(
                    F.col("__na__") - F.col("__ia__"),
                    F.col("__nb__") - F.col("__jb__"),
                )
            )
            * F.lit(1.0 + threshold)
            >= F.lit(threshold) * (F.col("__na__") + F.col("__nb__"))
            - F.lit(1e-9)
        )
        .select("id_a", "id_b"),
        materialize,
        scratch_dir,
    )
    # Verification arrays ONLY for docs that appear in some candidate
    # pair (round 14): the former spelling collect_list-ed the sorted
    # shingle array of EVERY document — the query's largest shuffle,
    # twice (one per join side) — while prefix filtering exists
    # precisely because candidates are a small fraction of the corpus.
    # The semi-join drops non-candidate docs map-side before the
    # group-by shuffle (guide §3.2 pre-filter the big side, §2.3
    # shuffle fewer bytes); inner joins on id consumed only candidate
    # rows before, so the surviving pairs are identical.
    ids = cand.select(
        F.explode(F.array("id_a", "id_b")).alias("__id__")
    ).distinct()
    arrs = (
        sh.join(ids, "__id__", "left_semi")
        .groupBy("__id__")
        .agg(F.sort_array(F.collect_list("__sh__")).alias("__arr__"))
    )
    return (
        cand.join(arrs.withColumnRenamed("__id__", "id_a"), "id_a")
        .withColumnRenamed("__arr__", "__arr_a__")
        .join(arrs.withColumnRenamed("__id__", "id_b"), "id_b")
        .withColumn(
            "__inter__",
            F.size(F.array_intersect(F.col("__arr_a__"), F.col("__arr__"))),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("__inter__").cast("double")
                / (
                    F.size("__arr_a__")
                    + F.size("__arr__")
                    - F.col("__inter__")
                ),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """Per-doc MinHash signature: ``minhash_0..minhash_{k-1}`` where
    ``minhash_i = min over shingles of h_i(shingle)`` for a universal
    hash family ``h_i(x) = (md5_60(x) % P · a_i + b_i) % P``
    (P = 2^31 − 1; a_i, b_i fixed odd/prime-derived constants).

    One md5 per shingle + k cheap modular mixes, instead of k md5s —
    the md5 is ~the whole cost. The mix stays within 62 bits so ANSI
    arithmetic never overflows, and the same formula is one line of
    SQL for the oracle. Explode-then-aggregate keeps everything in
    whole-stage codegen with a map-side-combined min shuffle (one
    signature row per doc). Docs with no shingles keep a row with null
    minhashes.
    """
    sh = _shingle_frame(df, text_col, id_col, n)
    # __sh__ IS md5_60(shingle) already (computed in the shingle stage),
    # so the universal-hash base is a bare modulus — no JVM md5 here.
    # Each hash lane generated as SQL text: selectExpr is ONE py4j
    # call for the whole lane list (the per-lane Column spelling was
    # ~8 py4j round-trips x num_hashes of pure plan-build latency).
    hashed = sh.selectExpr(
        "__id__",
        *[
            f"((__sh__ % {MINHASH_P}) * {_minhash_a(i)}"
            f" + {_minhash_b(i)}) % {MINHASH_P} AS __h{i}__"
            for i in range(num_hashes)
        ],
    )
    sig = hashed.groupBy("__id__").agg(
        F.expr("min(__h0__) AS minhash_0"),
        *[
            F.expr(f"min(__h{i}__) AS minhash_{i}")
            for i in range(1, num_hashes)
        ],
    )
    return df.select(F.col(id_col)).join(
        sig.withColumnRenamed("__id__", id_col), id_col, "left"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    materialize: str = "cache",
    scratch_dir: str | None = None,
) -> DataFrame:
    """MinHash + LSH candidate generation, then exact Jaccard verify.

    Signature rows → ``bands`` band-keys (each the struct of
    ``num_hashes/bands`` consecutive minhashes) → explode → self-join on
    (band index, band key) so only same-bucket docs pair up → distinct
    candidate pairs → exact verify via :func:`ngram_jaccard_pairs`
    semantics on just the candidates. Collision probability for true
    Jaccard s is 1−(1−s^r)^b — the standard S-curve; with r=4, b=4 the
    knee sits near s≈0.55.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes)
    # one generated SQL string for the whole band array (see the
    # minhash_signatures note on py4j plan-build cost)
    band_structs = F.expr(
        "array(%s)"
        % ",".join(
            "named_struct('band',%d,'key',concat_ws(',',%s))"
            % (
                b,
                ",".join(
                    f"minhash_{b * rows_per_band + r}"
                    for r in range(rows_per_band)
                ),
            )
            for b in range(bands)
        )
    )
    buckets = sig.select(
        F.col(id_col).alias("__id__"), F.explode(band_structs).alias("bk")
    ).select("__id__", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    a = buckets.select(F.col("__id__").alias("id_a"), "band", "key")
    b = buckets.select(F.col("__id__").alias("id_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )

    # Exact verify on candidates only: intersect shingle sets per pair.
    # Pinned (cache or parquet, see _reuse_shingles) — the inverted
    # index feeds both join sides; per-doc set sizes ride on the rows
    # (__n__), see ngram_jaccard_pairs.
    sh = _reuse_shingles(_shingle_frame(df, text_col, id_col, n), materialize, scratch_dir)
    ia = sh.select(
        F.col("__id__").alias("id_a"), "__sh__", F.col("__n__").alias("__na__")
    )
    ib = sh.select(
        F.col("__id__").alias("id_b"), "__sh__", F.col("__n__").alias("__nb__")
    )
    return (
        cand.join(ia, "id_a")
        .join(ib, ["id_b", "__sh__"])
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("__inter__"),
            F.max("__na__").alias("__na__"),
            F.max("__nb__").alias("__nb__"),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("__inter__").cast("double")
                / (F.col("__na__") + F.col("__nb__") - F.col("__inter__")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash64(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    impl: str = "pandas",
) -> DataFrame:
    """64-bit SimHash fingerprint per document.

    Each token hashes to 60 portable bits; for every bit position the
    tokens vote +1/−1 and the sign becomes the fingerprint bit.
    Near-duplicate docs differ in few bits: compare fingerprints
    downstream with ``bit_count(a ^ b) <= k``.

    ``impl='pandas'`` (default) computes fingerprints wholesale in an
    Arrow-batched map-only stage: the JVM shape explodes every token
    and evaluates 60 conditional sums per token row (~15M branch evals
    at 5k docs × 52 tokens), while numpy derives all 60 bit-votes from
    one shift-and-mask over the token-hash vector. Everything is
    integer arithmetic on the same md5-derived hash, so both impls and
    the SQL oracle agree BIT-FOR-BIT (asserted in tests) — this is a
    pure speed choice, unlike float-path trade-offs elsewhere.
    ``impl='sql'`` keeps the pure column-expression twin.
    """
    if impl == "pandas":
        return _simhash64_pandas(df, text_col, id_col)
    # Explode distinct tokens → one portable hash per row → ONE
    # aggregation producing all 60 bit-votes (map-side combined). The
    # alternative — 60 aggregate() folds over the token array — walks
    # the array 60× per doc in interpreted eval; this shape hashes each
    # token once and keeps everything in codegen.
    tok = df.select(
        F.col(id_col).alias("__id__"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("__t__"),
    )
    hashed = tok.select("__id__", portable_hash60(F.col("__t__")).alias("__h__"))
    # 60 vote aggregates + the 60-term fingerprint recombination as
    # generated SQL text (one py4j call per expression instead of ~7)
    votes = hashed.groupBy("__id__").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        *[
            F.expr(
                f"sum(CASE WHEN (shiftright(__h__, {b}) & 1) = 1"
                f" THEN 1 ELSE -1 END) AS __v{b}__"
            )
            for b in range(60)
        ],
    )
    fingerprint = F.expr(
        "CAST(%s AS BIGINT)"
        % " + ".join(
            f"(CASE WHEN __v{b}__ > 0 THEN CAST({1 << b} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END)"
            for b in range(60)
        )
    )
    sig = votes.select(
        F.col("__id__").alias(id_col), fingerprint.alias("simhash"), "n_tokens"
    )
    # Preserve docs with no tokens (null fingerprint), like the SQL twin.
    return df.select(F.col(id_col)).join(sig, id_col, "left")


def _simhash64_pandas(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Arrow-batched SimHash: md5 per distinct token (hashlib == Spark
    ``md5`` on UTF-8 bytes), 60 bit-votes via one numpy shift-mask,
    sign threshold > 0. Map-only, no shuffle; preserves empty docs as
    null fingerprints like the SQL twin."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    ws = re.compile(r"\s+", re.ASCII)
    shifts = None  # built lazily inside workers

    def fingerprints(batches):
        nonlocal shifts
        bit_idx = np.arange(60, dtype="uint64")
        for pdf in batches:
            ids, sims, ntoks = [], [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                # Mirror the column-expression twin exactly:
                # split(trim(text), '\s+') yields [''] for empty text
                # (which then votes with md5('')), and only NULL text
                # yields a null fingerprint.
                if txt is None:
                    seen = []
                else:
                    seen = list(
                        dict.fromkeys(ws.split(txt.strip(" \t\n\r\f\v")))
                    )
                ids.append(i)
                if not seen:
                    sims.append(None)
                    ntoks.append(None)
                    continue
                hs = np.array(
                    [
                        int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
                        for t in seen
                    ],
                    dtype="uint64",
                )
                bits = (hs[:, None] >> bit_idx) & np.uint64(1)
                votes = (2 * bits.astype("int64") - 1).sum(axis=0)
                fp = int(
                    ((votes > 0).astype("uint64") << bit_idx).sum(dtype="uint64")
                )
                sims.append(fp)
                ntoks.append(len(seen))
            yield pd.DataFrame(
                {"__id__": ids, "__fp__": sims, "__nt__": ntoks}
            ).astype({"__fp__": "Int64", "__nt__": "Int64"})

    id_type = dict(df.dtypes)[id_col]
    sig = widen_small_scan(df.select(F.col(id_col), F.col(text_col))).mapInPandas(
        fingerprints, f"__id__ {id_type}, __fp__ long, __nt__ long"
    )
    return sig.select(
        F.col("__id__").alias(id_col),
        F.col("__fp__").alias("simhash"),
        F.col("__nt__").alias("n_tokens"),
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_neardup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: fingerprints within ``max_hamming``
    bits of each other.

    Candidate generation uses the pigeonhole block trick: split the
    60-bit fingerprint into ``max_hamming + 1`` blocks — any pair with
    ≤ ``max_hamming`` differing bits agrees on at least one whole
    block, so joining on (block index, block value) finds EVERY such
    pair (exact recall, unlike probabilistic LSH), and only same-block
    fingerprints ever meet. Verification is one ``bit_count(xor)``.
    Returns ``(id_a, id_b, hamming)``.
    """
    n_blocks = max_hamming + 1
    bits = 60
    base = bits // n_blocks
    sizes = [base + (1 if i < bits % n_blocks else 0) for i in range(n_blocks)]
    offsets = [sum(sizes[:i]) for i in range(n_blocks)]

    sig = simhash64(df, text_col, id_col).filter(F.col("simhash").isNotNull())
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftright(F.col("simhash"), offsets[i])
                .bitwiseAND(F.lit((1 << sizes[i]) - 1))
                .alias("val"),
            )
            for i in range(n_blocks)
        ]
    )
    bucketed = sig.select(
        F.col(id_col).alias("__id__"), F.col("simhash"), F.explode(blocks).alias("b")
    ).select("__id__", "simhash", F.col("b.blk").alias("blk"), F.col("b.val").alias("val"))

    a = bucketed.select(
        F.col("__id__").alias("id_a"), F.col("simhash").alias("__sa__"), "blk", "val"
    )
    b = bucketed.select(
        F.col("__id__").alias("id_b"), F.col("simhash").alias("__sb__"), "blk", "val"
    )
    return (
        a.join(b, ["blk", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("__sa__").bitwiseXOR(F.col("__sb__"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def token_edit1_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pairs of rows whose token sequences are within ONE token-level
    edit (insert, delete, or substitute one token) — the SymSpell
    deletion-neighborhood algorithm lifted from characters to tokens.

    Neighbor generation instead of pairwise comparison: each row emits
    its full token string plus one variant per deleted position
    (L+1 keys for an L-token row, generated by a single posexplode).
    Two rows are within edit distance 1 iff their key sets collide in
    one of two ways, each an EXACT equi-join on the key:

    * ``variant(a) == full(b)``  -> a deletes one token to reach b
      (covers insert/delete; no false positives — the match IS the
      proof).
    * ``variant(a) == variant(b)`` at the SAME deletion position ->
      substitution. Same-position equality means the sequences agree
      everywhere else, so the only residual needed is a Hamming != 0
      check (``zip_with``) to exclude exact duplicates, which belong
      to :func:`dedup_exact`, and the repeated-token corner
      (``a b a`` / ``b a b`` both yield ``a b`` — at DIFFERENT
      positions, true distance 2) never joins at all.

    Scale: work is O(N·L) keys into hash equi-joins — never |N|².
    Rows shorter than 2 tokens are dropped (their variants are empty/
    trivial and a 1-token string is the classic hot key). The residual
    hazard is a stopword variant of a 2-token row ("the car" -> "the");
    bucket width is bounded by the count of near-identical short rows,
    the same exposure the Jaccard index caps with ``max_df`` — apply
    a length floor upstream for corpora of 1-2 token strings. Output:
    ``id_a < id_b`` distinct pairs with ``match_kind`` ('indel' or
    'substitute').
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = (
        df.select(F.col(id_col).alias("id"), toks.alias("t"))
        .filter(F.size("t") >= 2)
        .withColumn("s", F.concat_ws(" ", "t"))
    )
    variants = base.select(
        "id",
        "t",
        "s",
        F.posexplode(F.col("t")).alias("pos", "_tok"),
    ).select(
        "id",
        "t",
        "s",
        "pos",
        F.concat_ws(
            " ",
            F.concat(
                F.slice("t", 1, F.col("pos")),
                F.expr("slice(t, pos + 2, size(t) - pos - 1)"),
            ),
        ).alias("v"),
    )
    # indel: a's variant equals b's full string (sizes differ by 1, so
    # a != b always; emit canonical order).
    indel = (
        variants.alias("a")
        .join(base.alias("b"), F.col("a.v") == F.col("b.s"))
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
            F.lit("indel").alias("match_kind"),
        )
    )
    # substitution: same deletion position produces the same variant;
    # confirm exactly one differing token position.
    sub = (
        variants.alias("a")
        .join(
            variants.alias("b"),
            (F.col("a.v") == F.col("b.v"))
            & (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(
            F.size(F.col("a.t")) == F.size(F.col("b.t"))
        )
        .filter(
            F.size(
                F.filter(
                    F.zip_with("a.t", "b.t", lambda x, y: x != y),
                    lambda d: d,
                )
            )
            == 1
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.lit("substitute").alias("match_kind"),
        )
    )
    return indel.unionByName(sub).distinct()


def group_shingle_jaccard(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    materialize: str = "cache",
    scratch_dir: str | None = None,
) -> DataFrame:
    """Set similarity BETWEEN GROUPS: exact Jaccard of each pair of
    groups' distinct shingle sets — "which sources/domains publish
    the same text?", the corpus-provenance complement of the per-doc
    near-dup family above (those ask which DOCS repeat; this asks
    which COLLECTIONS overlap, e.g. mirror domains before choosing
    cap weights).

    Plan shape: the shared Arrow shingle stage computes hashes once;
    a distinct collapses to (group, shingle) — cardinality bounded by
    \\|groups\\| × \\|shingle vocabulary\\|; the pair search is the
    inverted-index self-equi-join ON THE SHINGLE HASH, so fan-out per
    shingle is (groups containing it)² ≤ \\|groups\\|² — bounded by the
    group count, never by documents. Intersections partial-aggregate
    map-side; sizes attach via two \\|groups\\|-row broadcast joins;
    union sizes come from inclusion-exclusion. Group pairs sharing NO
    shingle are absent (their Jaccard is 0 — emitting the full
    \\|groups\\|² grid is the caller's cross join to pay for).

    Returns ``(group_a, group_b, n_a, n_b, n_common, jaccard)`` with
    ``group_a < group_b`` and ``jaccard`` rounded to 4.
    """
    sh = _reuse_shingles(
        _shingle_frame(
            df.select(F.col(group_col).alias("__g__"), F.col(text_col)),
            text_col,
            "__g__",
            n,
        ),
        materialize,
        scratch_dir,
    )
    sets = sh.select(F.col("__id__").alias("g"), "__sh__").distinct()
    sizes = sets.groupBy("g").agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
    a = sets.select(F.col("g").alias("group_a"), "__sh__")
    b = sets.select(F.col("g").alias("group_b"), "__sh__")
    inter = (
        a.join(b, "__sh__")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    sa = F.broadcast(sizes.select(F.col("g").alias("group_a"), F.col("sz").alias("n_a")))
    sb = F.broadcast(sizes.select(F.col("g").alias("group_b"), F.col("sz").alias("n_b")))
    return (
        inter.join(sa, "group_a")
        .join(sb, "group_b")
        .select(
            "group_a",
            "group_b",
            "n_a",
            "n_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast(
                    "double"
                ),
                4,
            ).alias("jaccard"),
        )
    )

def minhash_band_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    out_id: str = "doc_id",
) -> DataFrame:
    """One ``(out_id, band, key)`` row per LSH band per document — the
    banded-signature projection :func:`minhash_novelty_pairs` joins
    on, exposed (round 13) so the STANDING side of an incremental
    ingestion can be persisted as a sidecar artifact and reused across
    batches instead of re-hashing the whole index text every time (the
    md5 map cost is the measured floor of every sketch path).  Pure
    function of the text bytes and parameters, so persisted and
    recomputed rows are interchangeable.  Docs whose text yields no
    shingles are dropped here (their NULL minhashes would all share
    the empty band key)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes)
    band_structs = F.expr(
        "array(%s)"
        % ",".join(
            "named_struct('band',%d,'key',concat_ws(',',%s))"
            % (
                b,
                ",".join(
                    f"minhash_{b * rows_per_band + r}"
                    for r in range(rows_per_band)
                ),
            )
            for b in range(bands)
        )
    )
    return (
        sig.filter(F.col("minhash_0").isNotNull())
        .select(
            F.col(id_col).alias(out_id),
            F.explode(band_structs).alias("bk"),
        )
        .select(
            out_id,
            F.col("bk.band").alias("band"),
            F.col("bk.key").alias("key"),
        )
    )


def minhash_novelty_pairs(
    index_df: DataFrame,
    batch_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    broadcast_batch: bool = True,
    index_bands: DataFrame | None = None,
) -> DataFrame:
    """Asymmetric batch-vs-index MinHash-LSH near-dup join — the
    INCREMENTAL-ingestion shape: an existing corpus index and a new
    batch of documents, and the question is which batch docs duplicate
    something already indexed (their complement is the batch's novel
    content). Same signatures, banding, and exact-Jaccard verify as
    :func:`minhash_lsh_pairs`, but candidates are strictly
    batch x index — batch-internal and index-internal pairs are never
    generated.

    Scale shape (the :func:`ngram_contamination` argument): an
    ingestion batch is orders of magnitude smaller than the index, so
    the batch's band buckets **broadcast** and the index side's bucket
    stream is probed map-side — the index never shuffles for candidate
    generation (set ``broadcast_batch=False`` for a hash join when a
    backfill batch outgrows broadcast range). Docs whose text yields no
    shingles are filtered before banding: their NULL minhashes would
    otherwise all share the empty band key and cross-pair every empty
    batch doc with every empty index doc before the verify stage
    discards them anyway.  The exact-Jaccard verify shingles ONLY the
    candidate index docs (round 13 — a broadcast semi-join on the
    batch-bounded candidate id set reaches the parquet scan as an id
    filter): the previous spelling exploded EVERY index doc into
    shingles per batch, a cost that dwarfs the scan itself at corpus
    scale.

    ``index_bands`` (round 13) short-circuits the index side of
    candidate generation with a PRECOMPUTED ``(index_id, band, key)``
    frame (:func:`minhash_band_buckets` output, e.g. the persisted
    sidecar :func:`~tmdb_index_spark.streaming.ingest
    .run_ingest_stream` maintains): the full-index text re-hash —
    the dominant per-batch cost of the daily-maintenance loop — is
    skipped entirely.  Results are identical by construction (the
    banding is a pure function of the text bytes).

    Returns ``(batch_id, index_id, jaccard)`` for verified pairs with
    Jaccard >= ``threshold``.
    """
    bb = minhash_band_buckets(
        batch_df, text_col, id_col, n, num_hashes, bands, out_id="batch_id"
    )
    if broadcast_batch:
        bb = F.broadcast(bb)
    ib = (
        index_bands
        if index_bands is not None
        else minhash_band_buckets(
            index_df, text_col, id_col, n, num_hashes, bands,
            out_id="index_id",
        )
    )
    cand = (
        ib.join(bb, ["band", "key"])
        .select("batch_id", "index_id")
        .distinct()
    )
    sa = _shingle_frame(batch_df, text_col, id_col, n).select(
        F.col("__id__").alias("batch_id"),
        "__sh__",
        F.col("__n__").alias("__na__"),
    )
    idx_cand = index_df.join(
        F.broadcast(
            cand.select(F.col("index_id").alias(id_col)).distinct()
        ),
        id_col,
    )
    sb = _shingle_frame(idx_cand, text_col, id_col, n).select(
        F.col("__id__").alias("index_id"),
        "__sh__",
        F.col("__n__").alias("__nb__"),
    )
    return (
        cand.join(sa, "batch_id")
        .join(sb, ["index_id", "__sh__"])
        .groupBy("batch_id", "index_id")
        .agg(
            F.count(F.lit(1)).alias("__inter__"),
            F.max("__na__").alias("__na__"),
            F.max("__nb__").alias("__nb__"),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("__inter__").cast("double")
                / (F.col("__na__") + F.col("__nb__") - F.col("__inter__")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("batch_id", "index_id", "jaccard")
    )
