"""Dedup operator tests (SURVEY.md D2/D3/D4/D6)."""

from __future__ import annotations

import pytest

from tests.conftest import rows
from tmdb_index_spark.operators.dedup import (
    dedup_keep_first,
    dedup_keep_last,
    duplicate_ids,
)


def test_keep_last_by_arrival(spark):
    df = spark.createDataFrame(
        [(1, 0, "a"), (1, 1, "b"), (2, 0, "c")], "id long, arrival long, v string"
    )
    out = dedup_keep_last(df, keys=("id",), order=("arrival",)).drop("arrival")
    assert rows(out) == [{"id": 1, "v": "b"}, {"id": 2, "v": "c"}]


def test_keep_first_by_priority(spark):
    df = spark.createDataFrame(
        [(1, 1, "collection"), (1, 0, "movie"), (2, 1, "collection")],
        "id long, prio long, src string",
    )
    out = dedup_keep_first(df, keys=("id",), order=("prio",)).drop("prio")
    assert rows(out) == [{"id": 1, "src": "movie"}, {"id": 2, "src": "collection"}]


def test_dedup_requires_order():
    with pytest.raises(ValueError):
        dedup_keep_last(None, keys=("id",), order=())


def test_duplicate_ids(spark):
    df = spark.createDataFrame([(1,), (2,), (2,), (3,), (3,), (3,)], "id long")
    assert rows(duplicate_ids(df)) == [{"id": 2}, {"id": 3}]


def test_duplicate_ids_none(spark):
    df = spark.createDataFrame([(1,), (2,)], "id long")
    assert rows(duplicate_ids(df)) == []


def test_two_phase_count_distinct_matches_exact(spark):
    from pyspark.sql import functions as F

    from tmdb_index_spark.operators.skew import two_phase_count_distinct

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "c")], "k long, v string"
    )
    got = {r["k"]: r["n_distinct"] for r in two_phase_count_distinct(df, ["k"], "v").collect()}
    assert got == {1: 2, 2: 1}


def test_salted_agg_matches_plain(spark):
    from pyspark.sql import functions as F

    from tmdb_index_spark.operators.skew import salted_agg

    df = spark.createDataFrame([(i % 3, float(i)) for i in range(100)], "k long, v double")
    got = {
        r["k"]: (r["total"], r["n"])
        for r in salted_agg(
            df, ["k"],
            {"total": (F.sum("v"), F.sum("total")), "n": (F.count(F.lit(1)), F.sum("n"))},
        ).collect()
    }
    exp = {
        r["k"]: (r["total"], r["n"])
        for r in df.groupBy("k").agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == exp


def test_salted_join_matches_plain_join(spark):
    from tmdb_index_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(1, 10.0)] * 50 + [(2, 5.0)] * 3 + [(9, 1.0)],  # key 1 is hot; 9 has no dim row
        "k long, v double",
    )
    dim = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, name string")
    plain = fact.join(dim, "k").groupBy("k", "name").count()
    salted = salted_join(fact, dim, ["k"], n_salts=4).groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # left join keeps unmatched fact rows exactly once
    left = salted_join(fact, dim, ["k"], n_salts=4, how="left")
    assert left.filter("k = 9").count() == 1
    import pytest as _pytest
    with _pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], how="full")
    # the plan must NEVER broadcast the salted dim: the operator exists
    # for the can't-broadcast case, but Catalyst sizes the exploded dim
    # from its child's bytes and at 100x planned a 13 GiB broadcast
    # that died on the 8 GiB hard limit (round-11 stress finding) —
    # the shuffle_hash hint pins the shuffled hash join
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan


# ---------------------------------------------------------------------------
# token_edit1_pairs (SymSpell deletion neighborhoods at token level)
# ---------------------------------------------------------------------------

from tmdb_index_spark.operators.dedup_text import token_edit1_pairs  # noqa: E402


def _edit1(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return sorted(
        (r.id_a, r.id_b, r.match_kind)
        for r in token_edit1_pairs(df).collect()
    )


def test_token_edit1_insert_delete_substitute(spark):
    got = _edit1(
        spark,
        [
            (1, "red shiny ball"),
            (2, "red ball"),          # delete "shiny"
            (3, "red dull ball"),     # substitute shiny->dull
            (4, "blue car"),          # unrelated
            (5, "red shiny ball toy"),  # insert "toy"
        ],
    )
    assert got == [
        (1, 2, "indel"),
        (1, 3, "substitute"),
        (1, 5, "indel"),
        (2, 3, "indel"),
    ]


def test_token_edit1_excludes_exact_duplicates_and_distance2(spark):
    got = _edit1(
        spark,
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),   # exact dup -> dedup_exact's job
            (3, "alpha delta epsilon"),  # distance 2
        ],
    )
    assert got == []


def test_token_edit1_repeated_token_corner_is_not_matched(spark):
    # "a b a" and "b a b" share the deletion variant "a b" but at
    # DIFFERENT positions — true token distance is 2; the same-position
    # join must not pair them.
    got = _edit1(spark, [(1, "a b a"), (2, "b a b")])
    assert got == []


def test_token_edit1_drops_single_token_rows(spark):
    got = _edit1(spark, [(1, "ball"), (2, "red ball")])
    assert got == []


def test_token_edit1_one_pair_per_relationship(spark):
    # multiple shared variants must not produce duplicate rows
    got = _edit1(spark, [(1, "x x y"), (2, "x y")])
    assert got == [(1, 2, "indel")]


def test_token_edit1_plan_has_no_cartesian(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "a c")], "doc_id long, text string")
    plan = token_edit1_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_preagg_grouping_matches_direct_forms(spark):
    from pyspark.sql import functions as F

    from tmdb_index_spark.operators.skew import preagg_grouping

    # includes a REAL NULL dim value: grouping_id must separate it
    # from subtotal NULLs in both forms
    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 4.0),
         (None, "y", 8.0), ("a", "x", 16.0)],
        "f string, s string, v double",
    )
    partials = {
        "total": (F.sum("v"), F.sum("total")),
        "n": (F.count(F.lit(1)), F.sum("n")),
    }

    def key(rows_):
        return sorted(
            (str(r["f"]), str(r["s"]), r["total"], r["n"], r["gid"])
            for r in rows_
        )

    for mode, direct in [
        ("rollup", df.rollup("f", "s")),
        ("cube", df.cube("f", "s")),
    ]:
        got = preagg_grouping(
            df, ["f", "s"], partials, mode=mode, grouping_id_col="gid"
        ).collect()
        exp = direct.agg(
            F.sum("v").alias("total"),
            F.count(F.lit(1)).alias("n"),
            F.grouping_id().cast("long").alias("gid"),
        ).collect()
        assert key(got) == key(exp), mode

    sets = [["f"], ["s"], []]
    got = preagg_grouping(
        df, ["f", "s"], partials, mode="sets", sets=sets,
        grouping_id_col="gid",
    ).collect()
    exp = df.groupingSets(sets, "f", "s").agg(
        F.sum("v").alias("total"),
        F.count(F.lit(1)).alias("n"),
        F.grouping_id().cast("long").alias("gid"),
    ).collect()
    assert key(got) == key(exp)


def test_preagg_grouping_expand_runs_over_compact_frame(spark):
    from pyspark.sql import functions as F

    from tmdb_index_spark.operators.skew import preagg_grouping

    df = spark.createDataFrame(
        [("a", "x", 1.0)], "f string, s string, v double"
    )
    plan = preagg_grouping(
        df, ["f", "s"], {"total": (F.sum("v"), F.sum("total"))}
    )._jdf.queryExecution().executedPlan().toString()
    # the Expand node must sit ABOVE the finest-grain aggregate: in
    # the top-down plan print, an Aggregate appears BELOW Expand
    expand_at = plan.index("Expand")
    below_expand = plan[expand_at:]
    assert "HashAggregate" in below_expand or "SortAggregate" in below_expand


def test_dedup_extreme_matches_window_forms(spark):
    from pyspark.sql import functions as F

    from tmdb_index_spark.operators.dedup import (
        dedup_extreme,
        dedup_keep_first,
        dedup_keep_last,
    )

    # ties on ts within a user are broken by the unique event_id —
    # exactly the total-order precondition both forms require
    rows = [
        (1, 10, "a", 100), (1, 11, "b", 100), (1, 12, "c", 99),
        (2, 20, "d", 50), (2, 21, "e", 60),
        (3, 30, "f", 7),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts long"
    ).repartition(5)

    def key(frame):
        return sorted(map(tuple, frame.collect()))

    first_w = dedup_keep_first(
        df, keys=("user_id",), order=(F.col("ts"), F.col("event_id"))
    )
    last_w = dedup_keep_last(
        df, keys=("user_id",), order=(F.col("ts"), F.col("event_id"))
    )
    first_a = dedup_extreme(
        df, ("user_id",), ("ts", "event_id"), mode="first"
    ).select(*df.columns)
    last_a = dedup_extreme(
        df, ("user_id",), ("ts", "event_id"), mode="last"
    ).select(*df.columns)
    assert key(first_a) == key(first_w)
    assert key(last_a) == key(last_w)

    # the whole point: no window, and a MAP-SIDE partial combine so
    # the shuffle ships one candidate per (key, map partition) instead
    # of every row (the sorts that remain are per-partition by the
    # bare group key — SortAggregate's own requirement)
    plan = first_a._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min_by" in plan


def test_minhash_novelty_precomputed_index_bands(spark):
    """Round-13 persisted-band contract: (a) passing the index side's
    precomputed (index_id, band, key) frame yields EXACTLY the pairs
    the recompute path finds — the banding is a pure function of the
    text bytes; (b) the stored bands are authoritative — an empty band
    frame yields no candidates even though the texts match."""
    from tmdb_index_spark.operators.dedup_text import (
        minhash_band_buckets,
        minhash_novelty_pairs,
    )

    words = lambda p, n=30: " ".join(f"{p}{i:02d}" for i in range(n))  # noqa: E731
    index = spark.createDataFrame(
        [(i, words(chr(97 + i))) for i in range(6)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, words("b").replace(" ", "  ", 1)),  # token-dup of doc 1
            (101, words("zz")),                        # novel
        ],
        "doc_id long, text string",
    )
    base = sorted(
        map(tuple, minhash_novelty_pairs(index, batch).collect())
    )
    assert base and {p[0] for p in base} == {100}

    pre = minhash_band_buckets(index, out_id="index_id")
    got = sorted(
        map(
            tuple,
            minhash_novelty_pairs(
                index, batch, index_bands=pre
            ).collect(),
        )
    )
    assert got == base

    empty_bands = pre.filter("1 = 0")
    assert (
        minhash_novelty_pairs(
            index, batch, index_bands=empty_bands
        ).count()
        == 0
    )
