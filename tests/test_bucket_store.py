"""Bucket-incremental index store (round 14): manifest commit
protocol, touched-buckets-only folds, upsert semantics, crash-window
degradation, and write-bytes proportionality."""

from __future__ import annotations

import json
import os

import pytest

from tmdb_index_spark.sources.bucket_store import (
    compact_bucket_index,
    fold_bucket_index,
    lookup_bucket_ids,
    read_bucket_index,
    read_bucket_manifest,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, payload string")


def _index_rows(spark, path):
    df = read_bucket_index(spark, path)
    return sorted(map(tuple, df.collect())) if df is not None else None


def test_fold_bootstrap_and_upsert_semantics(spark, tmp_path):
    p = str(tmp_path / "store")
    assert read_bucket_index(spark, p) is None
    r1 = fold_bucket_index(
        spark, p, _df(spark, [(i, f"v1-{i}") for i in range(10)]), "id", 4
    )
    assert r1["version"] == 1 and r1["touched"]
    assert _index_rows(spark, p) == sorted(
        (i, f"v1-{i}") for i in range(10)
    )
    # fold 2: ids 3,4 replaced, 20 appended — update_or_append parity
    r2 = fold_bucket_index(
        spark, p,
        _df(spark, [(3, "v2-3"), (4, "v2-4"), (20, "v2-20")]), "id", 4,
    )
    assert r2["version"] == 2
    expect = {(i, f"v1-{i}") for i in range(10) if i not in (3, 4)}
    expect |= {(3, "v2-3"), (4, "v2-4"), (20, "v2-20")}
    assert _index_rows(spark, p) == sorted(expect)
    man = read_bucket_manifest(spark, p)
    assert man["version"] == 2 and man["n_buckets"] == 4
    # untouched buckets still point at their v=1 directories: the fold
    # wrote only the touched ones
    v1_dirs = {d for d in man["buckets"].values() if "v=1" in d}
    v2_dirs = {d for d in man["buckets"].values() if "v=2" in d}
    assert v1_dirs and v2_dirs
    assert len(v2_dirs) == len(r2["touched"])


def test_empty_fold_is_a_committed_noop(spark, tmp_path):
    p = str(tmp_path / "store")
    fold_bucket_index(spark, p, _df(spark, [(1, "a")]), "id", 4)
    before = _index_rows(spark, p)
    r = fold_bucket_index(spark, p, _df(spark, []), "id", 4)
    assert r == {"version": 1, "touched": []}
    assert _index_rows(spark, p) == before


def test_bucket_count_is_pinned(spark, tmp_path):
    p = str(tmp_path / "store")
    fold_bucket_index(spark, p, _df(spark, [(1, "a")]), "id", 4)
    with pytest.raises(ValueError, match="rebucketing"):
        fold_bucket_index(spark, p, _df(spark, [(2, "b")]), "id", 8)


def test_torn_manifest_falls_back_to_previous_commit(spark, tmp_path):
    p = str(tmp_path / "store")
    fold_bucket_index(spark, p, _df(spark, [(1, "a"), (2, "b")]), "id", 4)
    good = _index_rows(spark, p)
    mdir = tmp_path / "store" / "_manifest"
    # crash mid-commit: a truncated higher-version manifest json
    (mdir / "m2.json").write_text('{"version": 2, "buck')
    assert read_bucket_manifest(spark, p)["version"] == 1
    assert _index_rows(spark, p) == good
    # and an abandoned .tmp is invisible to readers
    (mdir / "m3.json.tmp").write_text("{}")
    assert read_bucket_manifest(spark, p)["version"] == 1
    # the next fold replays over the garbage and commits cleanly
    (mdir / "m2.json").unlink()
    fold_bucket_index(spark, p, _df(spark, [(3, "c")]), "id", 4)
    assert _index_rows(spark, p) == sorted(
        {(1, "a"), (2, "b"), (3, "c")}
    )
    assert read_bucket_manifest(spark, p)["version"] == 2


def test_orphan_data_version_is_overwritten_on_replay(spark, tmp_path):
    # crash AFTER the v=2 data write but BEFORE its manifest commit:
    # readers resolve v=1; the replayed fold rewrites v=2 and commits
    p = str(tmp_path / "store")
    fold_bucket_index(spark, p, _df(spark, [(1, "a"), (2, "b")]), "id", 4)
    orphan = tmp_path / "store" / "data" / "v=2" / "__bkt__=0"
    orphan.mkdir(parents=True)
    (orphan / "part-zzz.parquet").write_bytes(b"not parquet")
    assert _index_rows(spark, p) == sorted({(1, "a"), (2, "b")})
    fold_bucket_index(spark, p, _df(spark, [(2, "b2")]), "id", 4)
    assert _index_rows(spark, p) == sorted({(1, "a"), (2, "b2")})


def test_cleanup_retains_exactly_new_and_previous_versions(
    spark, tmp_path
):
    p = str(tmp_path / "store")
    # three folds over the SAME id: its v=1 and v=2 bucket dirs are
    # superseded; after fold 3 the v=1 dir (not referenced by manifest
    # 3 or 2) must be gone, v=2's retained for racing readers
    for n, v in enumerate(["a", "b", "c"], start=1):
        fold_bucket_index(spark, p, _df(spark, [(1, v)]), "id", 4)
    data = tmp_path / "store" / "data"
    assert not (data / "v=1").exists()
    assert (data / "v=2").exists() and (data / "v=3").exists()
    mdir = tmp_path / "store" / "_manifest"
    names = sorted(
        f.name
        for f in mdir.iterdir()
        # the local FS is checksummed: ignore its .crc sidecars
        if f.name.endswith(".json") and not f.name.startswith(".")
    )
    assert names == ["m2.json", "m3.json"]
    assert _index_rows(spark, p) == [(1, "c")]


def test_fold_write_bytes_proportional_to_batch(spark, tmp_path):
    """The headline property: a small batch into a big index rewrites
    a small slice — new bytes ∝ touched buckets ∝ batch size (times
    bucket granularity), vs EQUAL to the index for the rename-aside
    swap.  20k-row index at 64 buckets, then a 3-row batch touching at
    most 3 buckets (≤ ~5% of the index)."""
    p = str(tmp_path / "store")
    big = spark.range(20_000).selectExpr(
        "id", "repeat('x', 64) AS payload"
    )
    r1 = fold_bucket_index(spark, p, big, "id", 64)
    assert len(r1["touched"]) == 64
    small = spark.range(3).selectExpr(
        "id + 100000 AS id", "repeat('y', 64) AS payload"
    )
    r2 = fold_bucket_index(spark, p, small, "id", 64)
    assert len(r2["touched"]) <= 3

    def du(d):
        total = 0
        for root, _, files in os.walk(d):
            total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
        return total

    b1 = du(tmp_path / "store" / "data" / "v=1")
    b2 = du(tmp_path / "store" / "data" / "v=2")
    assert b2 * 10 < b1, (b1, b2)
    df = read_bucket_index(spark, p)
    assert df.count() == 20_003


def test_lookup_prunes_to_probed_buckets(spark, tmp_path):
    """Point lookup reads ONLY the bucket directories the probed ids
    hash to (verified via the frame's input files), agrees with a
    full-index filter, returns a schema-correct empty frame for
    never-written buckets / empty probes, and None on bootstrap."""
    p = str(tmp_path / "store")
    assert lookup_bucket_ids(spark, p, [1], "id") is None
    big = spark.range(5_000).selectExpr("id", "'v' || id AS payload")
    fold_bucket_index(spark, p, big, "id", 64)

    probe = [3, 4711, 999999]  # one id absent from the index
    got = lookup_bucket_ids(spark, p, probe, "id")
    expect = sorted(
        map(
            tuple,
            read_bucket_index(spark, p)
            .filter("id IN (3, 4711, 999999)")
            .collect(),
        )
    )
    assert sorted(map(tuple, got.collect())) == expect
    assert len(expect) == 2
    # pruning proof: the lookup's scan touches at most |probe| bucket
    # dirs out of 64 — never the whole store
    touched = {f.rsplit("/", 2)[-2] for f in got.inputFiles()}
    assert 0 < len(touched) <= len(probe)
    full = {
        f.rsplit("/", 2)[-2]
        for f in read_bucket_index(spark, p).inputFiles()
    }
    assert len(full) == 64 and touched < full

    empty = lookup_bucket_ids(spark, p, [], "id")
    assert empty.columns == ["id", "payload"] and empty.count() == 0
    with pytest.raises(TypeError, match="unsupported id literal"):
        lookup_bucket_ids(spark, p, [1.5], "id")


def test_compaction_rewrites_to_one_file_per_bucket(spark, tmp_path):
    """After repeated folds a bucket holds one fragment per touching
    fold; compaction rewrites the CURRENT rows into one file per
    bucket under a fresh version with the same commit protocol —
    rows identical, manifest pointing only at the new version, the
    pre-previous versions cleaned up, and folding afterwards still
    works."""
    p = str(tmp_path / "store")
    assert compact_bucket_index(spark, p, "id") == {
        "version": 0, "n_files_before": 0, "n_files_after": 0,
    }
    # 5 folds over overlapping ids: bucket dirs accumulate fragments
    for k in range(5):
        fold_bucket_index(
            spark, p,
            _df(spark, [(i, f"f{k}-{i}") for i in range(k, k + 6)]),
            "id", 4,
        )
    before = _index_rows(spark, p)
    man0 = read_bucket_manifest(spark, p)
    r = compact_bucket_index(spark, p, "id")
    assert r["version"] == man0["version"] + 1
    assert r["n_files_after"] == 4 <= r["n_files_before"]
    assert _index_rows(spark, p) == before
    man = read_bucket_manifest(spark, p)
    assert man["version"] == r["version"]
    assert all(f"v={r['version']}" in d for d in man["buckets"].values())
    # wrong-bucketing guard still applies through the shared manifest
    with pytest.raises(ValueError, match="rebucketing"):
        fold_bucket_index(spark, p, _df(spark, [(1, "x")]), "id", 8)
    fold_bucket_index(spark, p, _df(spark, [(99, "post")]), "id", 4)
    assert (99, "post") in set(_index_rows(spark, p))


def test_manifest_json_is_stable_and_self_describing(spark, tmp_path):
    p = str(tmp_path / "store")
    fold_bucket_index(spark, p, _df(spark, [(1, "a")]), "id", 4)
    raw = json.loads(
        (tmp_path / "store" / "_manifest" / "m1.json").read_text()
    )
    assert set(raw) == {"version", "n_buckets", "buckets"}
    for b, d in raw["buckets"].items():
        assert d.startswith("data/v=1/__bkt__=") and int(b) < 4
