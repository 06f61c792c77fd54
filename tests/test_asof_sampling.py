"""Tests for the as-of join and deterministic sampling operators."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from tmdb_index_spark.operators.asof import as_of_join
from tmdb_index_spark.operators.sampling import hash_sample, hash_split


def _ts(minute):
    return datetime(2024, 1, 1, 0, minute)


def test_as_of_join_picks_latest_prior(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(30), "b"), (2, _ts(5), "c")],
        "k long, ts timestamp, ev string",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 100), (1, _ts(20), 200), (2, _ts(50), 300)],
        "k long, ts timestamp, snap long",
    )
    out = {r["ev"]: r["snap"] for r in as_of_join(left, right, on="k").collect()}
    assert out == {"a": 100, "b": 200, "c": None}  # c: no prior right row


def test_as_of_join_inclusive_at_equal_ts(spark):
    left = spark.createDataFrame([(1, _ts(20), "x")], "k long, ts timestamp, ev string")
    right = spark.createDataFrame([(1, _ts(20), 7)], "k long, ts timestamp, snap long")
    got = as_of_join(left, right, on="k").collect()[0]
    assert got["snap"] == 7  # right row AT the left ts is visible


def test_hash_split_fractions_and_determinism(spark):
    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, "doc_id", {"train": 0.8, "test": 0.2})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] - 8000) < 300
    assert abs(counts["test"] - 2000) < 300
    again = hash_split(df, "doc_id", {"train": 0.8, "test": 0.2})
    assert out.collect() == again.collect()


def test_hash_split_rejects_oversum():
    with pytest.raises(ValueError):
        from tmdb_index_spark.operators.sampling import split_column

        split_column("k", {"a": 0.7, "b": 0.7})


def test_hash_sample_subset_and_stable(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    s = hash_sample(df, "doc_id", 0.1)
    n = s.count()
    assert 50 < n < 200
    ids = {r["doc_id"] for r in s.collect()}
    bigger = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.2).collect()}
    assert ids <= bigger  # nested samples: growing the fraction only adds rows


def test_stratified_sample_deterministic_and_scoped(spark):
    from tmdb_index_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(200)]
        + [(1000 + i, "c") for i in range(10)],
        "id long, cls string",
    )
    out = stratified_sample(df, "cls", "id", {"a": 1.0, "b": 0.2})
    rows_ = out.collect()
    # stratum 'c' absent from fractions -> dropped entirely
    assert all(r.cls != "c" for r in rows_)
    # 'a' keeps everything
    assert sum(1 for r in rows_ if r.cls == "a") == 100
    # 'b' keeps a deterministic subset: identical across reruns
    again = {r.id for r in stratified_sample(df, "cls", "id", {"a": 1.0, "b": 0.2}).collect()}
    assert {r.id for r in rows_} == again
    n_b = sum(1 for r in rows_ if r.cls == "b")
    assert 0 < n_b < 100


def test_mixture_sample_rates_and_determinism(spark):
    from tmdb_index_spark.operators.sampling import mixture_sample

    rows = [(i, f"src{i % 4}", 100) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, src string, cost long")
    # Budget 5000 over weights {src0: .75, src1: .25}: target 3750 of
    # src0's 10000 -> rate .375; 1250 of src1's 10000 -> rate .125;
    # src2/src3 unlisted -> dropped entirely.
    out = mixture_sample(
        df, "src", "cost", key="id",
        weights={"src0": 0.75, "src1": 0.25}, budget=5000,
    )
    got = out.groupBy("src").count().collect()
    by_src = {r["src"]: r["count"] for r in got}
    assert set(by_src) <= {"src0", "src1"}
    # hash buckets approximate the rate; 100 rows per source, wide tol
    assert 20 <= by_src.get("src0", 0) <= 55
    assert 3 <= by_src.get("src1", 0) <= 25
    assert by_src.get("src0", 0) > by_src.get("src1", 0)
    # deterministic under repartitioning
    again = mixture_sample(
        df.repartition(7), "src", "cost", key="id",
        weights={"src0": 0.75, "src1": 0.25}, budget=5000,
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_mixture_sample_rate_caps_at_one(spark):
    from tmdb_index_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame(
        [(i, "a", 10) for i in range(50)], "id long, src string, cost long"
    )
    # budget far above total: rate clamps to 1, everything kept
    out = mixture_sample(
        df, "src", "cost", key="id", weights={"a": 1.0}, budget=1e9
    )
    assert out.count() == 50


def test_mixture_sample_rejects_bad_weights(spark):
    import pytest

    from tmdb_index_spark.operators.sampling import mixture_sample

    df = spark.createDataFrame([(1, "a", 1)], "id long, src string, cost long")
    with pytest.raises(ValueError):
        mixture_sample(df, "src", "cost", key="id", weights={}, budget=10)
    with pytest.raises(ValueError):
        mixture_sample(
            df, "src", "cost", key="id", weights={"a": 0.0}, budget=10
        )


def test_weighted_sample_bias_and_determinism(spark):
    from tmdb_index_spark.operators.sampling import weighted_sample

    # 200 light rows (w=1) vs 200 heavy rows (w=1000): the heavy class
    # must dominate a k=50 sample by a wide margin
    rows_ = [(i, "g", 1 if i < 200 else 1000) for i in range(400)]
    df = spark.createDataFrame(rows_, "id long, grp string, w long")
    got = weighted_sample(df, key="id", weight_col="w", k=50, group_col="grp")
    heavy = sum(1 for r in got.collect() if r["id"] >= 200)
    assert got.count() == 50
    assert heavy >= 45
    # deterministic under repartitioning
    again = weighted_sample(
        df.repartition(13), key="id", weight_col="w", k=50, group_col="grp"
    )
    assert sorted(r["id"] for r in got.collect()) == sorted(
        r["id"] for r in again.collect()
    )


def test_weighted_sample_global_topk_plan(spark):
    from tmdb_index_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], "id long, w long"
    )
    out = weighted_sample(df, key="id", weight_col="w", k=5)
    assert out.count() == 5
    p = out._jdf.queryExecution().executedPlan().toString()
    # global k must be per-partition top-k + driver merge, no full sort
    assert "TakeOrderedAndProject" in p


def test_weighted_sample_rejects_bad_k(spark):
    import pytest

    from tmdb_index_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame([(1, 1)], "id long, w long")
    with pytest.raises(ValueError):
        weighted_sample(df, key="id", weight_col="w", k=0)


# ---------------------------------------------------------------------------
# cap_per_group
# ---------------------------------------------------------------------------

from tmdb_index_spark.operators.sampling import cap_per_group  # noqa: E402


def _docs(spark, ids_by_group):
    rows = [(i, g) for g, ids in ids_by_group.items() for i in ids]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_cap_per_group_respects_cap(spark):
    df = _docs(spark, {"a": range(100), "b": range(100, 103)})
    out = cap_per_group(df, "doc_id", "source", cap=5)
    counts = {r.source: r.n for r in out.groupBy("source").agg(
        __import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    assert counts == {"a": 5, "b": 3}


def test_cap_per_group_membership_is_stable_across_other_groups(spark):
    # Adding docs to group b must not change which of group a's docs
    # survive — membership is a pure function of (key, group).
    base = _docs(spark, {"a": range(50), "b": range(100, 110)})
    grown = _docs(spark, {"a": range(50), "b": range(100, 200)})
    kept = lambda df: sorted(  # noqa: E731
        r.doc_id
        for r in cap_per_group(df, "doc_id", "source", cap=7)
        .filter("source = 'a'")
        .collect()
    )
    assert kept(base) == kept(grown)


def test_cap_per_group_deterministic_across_partitionings(spark):
    df = _docs(spark, {"a": range(200)})
    a = cap_per_group(df.repartition(1), "doc_id", "source", cap=9)
    b = cap_per_group(df.repartition(16), "doc_id", "source", cap=9)
    assert sorted(r.doc_id for r in a.collect()) == sorted(
        r.doc_id for r in b.collect()
    )


def test_cap_per_group_rejects_nonpositive_cap(spark):
    df = _docs(spark, {"a": [1]})
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cap_per_group(df, "doc_id", "source", cap=0)


# ----------------------------------------------------------- negatives


def _dense_docs(spark, n):
    return spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(n)], "doc_id long, source string"
    )


def test_negative_pairs_shape_and_no_self(spark):
    from tmdb_index_spark.operators.sampling import negative_pairs

    df = _dense_docs(spark, 20)
    out = negative_pairs(df, "doc_id", k=3).collect()
    assert len(out) == 60  # k * N exactly
    assert all(r["neg_id"] != r["doc_id"] for r in out)
    assert all(0 <= r["neg_id"] < 20 for r in out)


def test_negative_pairs_deterministic_and_seed_sensitive(spark):
    from tmdb_index_spark.operators.sampling import negative_pairs

    df = _dense_docs(spark, 15)
    a = sorted(map(tuple, negative_pairs(df, "doc_id", k=2, seed=1).collect()))
    b = sorted(map(tuple, negative_pairs(df, "doc_id", k=2, seed=1).collect()))
    c = sorted(map(tuple, negative_pairs(df, "doc_id", k=2, seed=2).collect()))
    assert a == b
    assert a != c


def test_negative_pairs_partner_attributes_joined(spark):
    from tmdb_index_spark.operators.sampling import negative_pairs

    df = _dense_docs(spark, 10)
    out = negative_pairs(df, "doc_id", k=2, keep_cols=("source",)).collect()
    srcs = {r["doc_id"]: r["source"] for r in df.collect()}
    assert all(r["neg_source"] == srcs[r["neg_id"]] for r in out)


def test_negative_pairs_single_row_corpus_is_empty(spark):
    from tmdb_index_spark.operators.sampling import negative_pairs

    df = _dense_docs(spark, 1)
    assert negative_pairs(df, "doc_id", k=3).count() == 0


def test_negative_pairs_rejects_bad_k(spark):
    import pytest
    from tmdb_index_spark.operators.sampling import negative_pairs

    with pytest.raises(ValueError):
        negative_pairs(_dense_docs(spark, 5), "doc_id", k=0)


def test_negative_pairs_roughly_uniform(spark):
    from tmdb_index_spark.operators.sampling import negative_pairs

    # 200 anchors x 5 draws = 1000 partner picks over 200 ids:
    # every id should be picked at least once, none hoard the mass
    df = _dense_docs(spark, 200)
    from collections import Counter

    picks = Counter(
        r["neg_id"] for r in negative_pairs(df, "doc_id", k=5).collect()
    )
    assert max(picks.values()) <= 25  # mean 5, generous tail bound


# ------------------------------------------------------------- nucleus


def test_nucleus_keeps_smallest_covering_prefix(spark):
    from tmdb_index_spark.operators.sampling import nucleus_filter

    # weights 50, 30, 15, 5: p=0.8 -> 50+30=80 reaches exactly 80%;
    # the crossing item (30) is kept, nothing after it
    rows = [("g", "a", 50), ("g", "b", 30), ("g", "c", 15), ("g", "d", 5)]
    df = spark.createDataFrame(rows, "grp string, item string, w long")
    out = nucleus_filter(df, "grp", "w", p=0.8, tiebreak_col="item")
    kept = sorted(r["item"] for r in out.collect())
    assert kept == ["a", "b"]


def test_nucleus_boundary_item_included(spark):
    from tmdb_index_spark.operators.sampling import nucleus_filter

    # p=0.5 with weights 40, 40, 20: first item covers only 40%,
    # second crosses 50% -> keep two
    rows = [("g", "a", 40), ("g", "b", 40), ("g", "c", 20)]
    df = spark.createDataFrame(rows, "grp string, item string, w long")
    kept = sorted(
        r["item"]
        for r in nucleus_filter(df, "grp", "w", 0.5, "item").collect()
    )
    assert kept == ["a", "b"]


def test_nucleus_p_one_keeps_everything(spark):
    from tmdb_index_spark.operators.sampling import nucleus_filter

    rows = [("g", "a", 1), ("g", "b", 1), ("h", "c", 9)]
    df = spark.createDataFrame(rows, "grp string, item string, w long")
    assert nucleus_filter(df, "grp", "w", 1.0, "item").count() == 3


def test_nucleus_groups_independent_and_share_monotone(spark):
    from tmdb_index_spark.operators.sampling import nucleus_filter

    rows = [("g", "a", 90), ("g", "b", 10), ("h", "c", 1), ("h", "d", 1)]
    df = spark.createDataFrame(rows, "grp string, item string, w long")
    out = {
        (r["grp"], r["item"]): r["cum_share"]
        for r in nucleus_filter(df, "grp", "w", 0.9, "item").collect()
    }
    assert out[("g", "a")] == 0.9
    assert ("g", "b") not in out
    # h: first item covers 0.5 < 0.9 -> second kept too
    assert out[("h", "c")] == 0.5 and out[("h", "d")] == 1.0


def test_nucleus_rejects_bad_p(spark):
    import pytest
    from tmdb_index_spark.operators.sampling import nucleus_filter

    df = spark.createDataFrame([("g", "a", 1)], "grp string, item string, w long")
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            nucleus_filter(df, "grp", "w", bad, "item")


# ---------------------------------------------------------------------------
# waterfill_allocation
# ---------------------------------------------------------------------------


def _wf(spark, avails, budget):
    from tmdb_index_spark.operators.sampling import waterfill_allocation

    rows = [(f"s{i}", a, budget) for i, a in enumerate(avails)]
    df = spark.createDataFrame(
        rows, "source string, avail long, __budget__ long"
    )
    return {
        r["source"]: r.asDict()
        for r in waterfill_allocation(df, "avail").collect()
    }


def test_waterfill_hand_computed_pivot(spark):
    # A=[1,10,20], B=12: source 0 capped at 1, remaining 11 floods the
    # other two at level 5.5 each — the first-qualifying-row lambda,
    # NOT the smaller lambdas later rows produce (the max-over-
    # qualifying selection under test)
    got = _wf(spark, [1, 10, 20], 12)
    assert got["s0"]["allocation"] == 1.0 and got["s0"]["capped"]
    assert got["s1"]["allocation"] == 5.5 and not got["s1"]["capped"]
    assert got["s2"]["allocation"] == 5.5 and not got["s2"]["capped"]
    assert all(v["water_level"] == 5.5 for v in got.values())
    assert sum(v["allocation"] for v in got.values()) == 12.0


def test_waterfill_budget_exceeds_supply(spark):
    got = _wf(spark, [1, 10, 20], 100)
    assert all(v["capped"] for v in got.values())
    assert all(v["water_level"] is None for v in got.values())
    assert [got[f"s{i}"]["allocation"] for i in range(3)] == [1.0, 10.0, 20.0]


def test_waterfill_exact_supply_and_zero_budget(spark):
    exact = _wf(spark, [1, 10, 20], 31)
    assert [exact[f"s{i}"]["allocation"] for i in range(3)] == [
        1.0,
        10.0,
        20.0,
    ]
    assert all(v["capped"] for v in exact.values())
    zero = _wf(spark, [1, 10, 20], 0)
    assert all(v["allocation"] == 0.0 for v in zero.values())
    assert all(v["water_level"] == 0.0 for v in zero.values())
    assert not any(v["capped"] for v in zero.values())


def test_waterfill_even_split_no_caps(spark):
    got = _wf(spark, [10, 10], 10)
    assert all(v["allocation"] == 5.0 for v in got.values())
    assert all(v["water_level"] == 5.0 for v in got.values())
    assert not any(v["capped"] for v in got.values())


# ---------------------------------------------------------------------------
# temperature_allocation
# ---------------------------------------------------------------------------


def _ta(spark, avails, budget, temperature=2.0, epoch_cap=4):
    from tmdb_index_spark.operators.sampling import temperature_allocation

    rows = [(f"s{i}", a, budget) for i, a in enumerate(avails)]
    df = spark.createDataFrame(
        rows, "source string, avail long, __budget__ long"
    )
    return {
        r["source"]: r.asDict()
        for r in temperature_allocation(
            df, "avail", temperature=temperature, epoch_cap=epoch_cap
        ).collect()
    }


def test_temperature_proportional_when_uncapped(spark):
    # T=1 -> weights are the availabilities themselves; a roomy epoch
    # cap never binds, so shares are exactly proportional
    got = _ta(spark, [1, 3], 2, temperature=1.0, epoch_cap=10)
    assert got["s0"]["allocation"] == 0.5
    assert got["s1"]["allocation"] == 1.5
    assert not got["s0"]["capped"] and not got["s1"]["capped"]


def test_temperature_hand_computed_pivot(spark):
    # A=[100, 400, 2500], T=2 -> sqrt weights 10:20:50 (micros),
    # epoch_cap=1 -> caps = avails, B=1000. Ratio-sorted s0, s1, s2:
    # s0 fails (scale 1000/80 = 12.5 > r=10) -> capped at 100; pivot
    # at s1 with scale 900/70 -> shares 900*(20/70), 900*(50/70).
    got = _ta(spark, [100, 400, 2500], 1000, temperature=2.0, epoch_cap=1)
    s = 900.0 / 70_000_000.0
    assert got["s0"]["allocation"] == 100.0 and got["s0"]["capped"]
    assert got["s1"]["allocation"] == round(s * 20_000_000, 4)
    assert got["s2"]["allocation"] == round(s * 50_000_000, 4)
    assert not got["s1"]["capped"] and not got["s2"]["capped"]
    total = sum(v["allocation"] for v in got.values())
    assert abs(total - 1000.0) < 1e-3


def test_temperature_budget_exceeds_caps_and_zero_avail(spark):
    got = _ta(spark, [10, 20, 0], 1000, temperature=2.0, epoch_cap=2)
    assert got["s0"]["allocation"] == 20.0 and got["s0"]["capped"]
    assert got["s1"]["allocation"] == 40.0 and got["s1"]["capped"]
    assert got["s0"]["scale"] is None
    assert got["s2"]["allocation"] == 0.0 and got["s2"]["capped"]
    assert got["s2"]["avail_tokens"] == 0


def test_temperature_unimax_is_waterfill_over_caps(spark):
    # UniMax's own allocator is uniform refill over epoch caps: at a
    # huge T the proportional rule degenerates toward uniform — pin the
    # exact equivalence instead via waterfill(avail=cap).
    from tmdb_index_spark.operators.sampling import waterfill_allocation

    rows = [("a", 6, 10), ("b", 40, 10), ("c", 80, 10)]
    df = spark.createDataFrame(
        rows, "source string, avail long, __budget__ long"
    )
    capped = df.selectExpr(
        "source", "avail * 2 AS avail", "__budget__"
    )
    wf = {
        r["source"]: r["allocation"]
        for r in waterfill_allocation(capped, "avail").collect()
    }
    # 3 groups, caps [12, 80, 160], B=10 -> nobody caps, level 10/3
    assert all(abs(v - 10.0 / 3) < 1e-3 for v in wf.values())


def test_temperature_validation(spark):
    import pytest

    with pytest.raises(ValueError, match="power of two"):
        _ta(spark, [1, 2], 1, temperature=3.0)
    with pytest.raises(ValueError, match="epoch_cap"):
        _ta(spark, [1, 2], 1, epoch_cap=0)
