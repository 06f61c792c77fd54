"""Bucket-incremental parquet index store (round 14).

The rename-aside swap (:func:`~tmdb_index_spark.streaming.windowed
.recover_and_swap`) rewrites the WHOLE index every micro-batch — the
right artifact for reference parity (one file, ``tmdb_index.py:709``)
but the wrong write cost at a 100 TB index fed by small daily batches:
per-batch bytes written are proportional to the INDEX, not the batch.
This module is the cluster-scale alternative: the index lives as
hash-bucketed parquet directories plus a tiny versioned MANIFEST, and
a fold rewrites only the buckets the batch touches — per-batch write
bytes proportional to the BATCH (times bucket granularity).

Layout under ``path``::

    _manifest/m<version>.json   one per committed fold, highest wins
    data/v=<version>/__bkt__=<b>/part-*.parquet

The manifest maps every bucket to the data directory holding its
CURRENT rows; untouched buckets keep pointing at their old version's
directory.  Commit protocol (the published Iceberg/Delta shape —
immutable data files, metadata pointer last):

1. write the touched buckets' merged rows to a NEW ``data/v=N``
   directory (old files are never modified or deleted here);
2. write ``_manifest/m<N>.json.tmp`` and rename it to ``m<N>.json`` —
   the single atomic commit point;
3. best-effort delete data directories no longer referenced by the
   new or previous manifest, and manifests older than the previous.

Every crash window degrades to the PREVIOUS committed state, never to
a torn one: a crash before (2) leaves orphan ``v=N`` files the next
fold cleans up, readers still resolve the old manifest; a crash during
(2) leaves a ``.tmp`` readers ignore (and a truncated json would fail
parse and fall back to the next-lower manifest).  Replaying a batch
whose fold already committed is a no-op at the caller (the composite
keeps nothing, so no buckets are touched).

Single-writer by contract (the daily ingest loop); readers racing a
fold see either the old or the new manifest, both complete — the
previous version's data dirs are retained one fold for exactly that
reason.

Bucketing is ``pmod(xxhash64(id), n_buckets)`` — a pure function of
the id, stable across Spark versions (xxhash64 is a pinned algorithm),
so a row's bucket never moves and an id-equality probe prunes to one
directory.  ``n_buckets`` is fixed at store creation (the manifest
records it; folds validate) — rebucketing is a full rebuild by design.
"""

from __future__ import annotations

import json
import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "bucket_of",
    "compact_bucket_index",
    "fold_bucket_index",
    "lookup_bucket_ids",
    "read_bucket_index",
    "read_bucket_manifest",
]

_BKT = "__bkt__"


def bucket_of(id_col: str, n_buckets: int):
    """The stable id→bucket expression (pure function of the id)."""
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int")


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    return hpath, hpath(path).getFileSystem(spark._jsc.hadoopConfiguration())


def _read_text(spark: SparkSession, path: str) -> str:
    hpath, fs = _fs(spark, path)
    stream = fs.open(hpath(path))
    try:
        return spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()


def read_bucket_manifest(spark: SparkSession, path: str) -> dict | None:
    """The highest PARSEABLE committed manifest, or ``None`` (no store
    yet).  A torn top manifest (crash during its write before the
    rename — or scheme-specific rename weirdness) falls back to the
    next-lower version instead of failing the read."""
    hpath, fs = _fs(spark, path)
    mdir = hpath(posixpath.join(path, "_manifest"))
    if not fs.exists(mdir):
        return None
    versions = []
    for st in fs.listStatus(mdir):
        name = st.getPath().getName()
        if name.startswith("m") and name.endswith(".json"):
            try:
                versions.append(int(name[1:-5]))
            except ValueError:
                continue
    for v in sorted(versions, reverse=True):
        try:
            man = json.loads(
                _read_text(
                    spark, posixpath.join(path, "_manifest", f"m{v}.json")
                )
            )
            if man.get("version") == v and "buckets" in man:
                return man
        except Exception:  # noqa: BLE001 — torn manifest -> fall back
            continue
    return None


def _write_manifest(spark: SparkSession, path: str, man: dict) -> None:
    hpath, fs = _fs(spark, path)
    v = man["version"]
    tmp = hpath(posixpath.join(path, "_manifest", f"m{v}.json.tmp"))
    final = hpath(posixpath.join(path, "_manifest", f"m{v}.json"))
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(man, sort_keys=True), "utf-8"))
    finally:
        out.close()
    if not fs.rename(tmp, final):
        raise IOError(f"failed to commit manifest {final}")


def read_bucket_index(spark: SparkSession, path: str) -> DataFrame | None:
    """The CURRENT index as one DataFrame (no bucket column — the
    bucket is derivable from the id), or ``None`` when no committed
    manifest exists (bootstrap)."""
    man = read_bucket_manifest(spark, path)
    if man is None or not man["buckets"]:
        return None
    dirs = [
        posixpath.join(path, d)
        for _, d in sorted(man["buckets"].items(), key=lambda kv: int(kv[0]))
    ]
    return spark.read.parquet(*dirs)


def compact_bucket_index(
    spark: SparkSession,
    path: str,
    id_col: str,
) -> dict:
    """Rewrite every bucket's CURRENT rows into one fresh version —
    one file per bucket — and commit a manifest referencing only it.
    Daily folds each add a file to every touched bucket, so after N
    folds a bucket read opens up to N fragments; compaction bounds
    that read amplification the way lakehouse OPTIMIZE does, with the
    SAME commit protocol as a fold (immutable new files, manifest
    pointer last, previous version retained one commit for racing
    readers) — a crash mid-compaction degrades to the pre-compaction
    state.  Results are row-identical by construction; the manifest
    fingerprint changes, so ingest sidecars (bands/codes) rebuild once
    on the next batch — schedule compaction with, not against, the
    ingest cadence.  Returns ``{"version", "n_files_before",
    "n_files_after"}``; a no-op on an empty/missing store."""
    man = read_bucket_manifest(spark, path)
    if man is None or not man["buckets"]:
        return {
            "version": man["version"] if man else 0,
            "n_files_before": 0,
            "n_files_after": 0,
        }
    n_buckets = man["n_buckets"]
    cur = read_bucket_index(spark, path)
    n_before = len(cur.inputFiles())
    version = man["version"] + 1
    vdir = f"data/v={version}"
    # hash-repartition ON the bucket column: every bucket's rows land
    # in exactly one task, so each bucket directory gets exactly one
    # data file
    (
        cur.withColumn(_BKT, bucket_of(id_col, n_buckets))
        .repartition(n_buckets, F.col(_BKT))
        .write.mode("overwrite")
        .partitionBy(_BKT)
        .parquet(posixpath.join(path, vdir))
    )
    present = {
        int(r[0])
        for r in cur.select(bucket_of(id_col, n_buckets)).distinct().collect()
    }
    new_man = {
        "version": version,
        "n_buckets": n_buckets,
        "buckets": {
            str(b): posixpath.join(vdir, f"{_BKT}={b}")
            for b in sorted(present)
        },
    }
    _write_manifest(spark, path, new_man)
    keep_dirs = set(new_man["buckets"].values()) | set(
        man["buckets"].values()
    )
    _cleanup(spark, path, keep_dirs, {version, man["version"]})
    n_after = len(read_bucket_index(spark, path).inputFiles())
    return {
        "version": version,
        "n_files_before": n_before,
        "n_files_after": n_after,
    }


def lookup_bucket_ids(
    spark: SparkSession,
    path: str,
    ids: list,
    id_col: str,
) -> DataFrame | None:
    """Point lookup against the bucketed index: read ONLY the bucket
    directories the given ids hash to, then filter — the pruning the
    bucketing exists for (at a 100 TB index a probe for a handful of
    ids touches |ids| directories, not the table).  The id→bucket
    mapping is computed with the SAME JVM ``xxhash64`` expression the
    folds use, over a literal VALUES relation — one driver-local job,
    no data scan — so lookup and fold can never disagree on a row's
    home bucket.  Returns ``None`` when no committed store exists
    (the :func:`read_bucket_index` bootstrap convention); ids whose
    bucket was never written simply produce no rows.  ``ids`` may be
    ints or strings (matching the stored ``id_col`` type — hashing a
    LONG and its string form bucket differently by design)."""
    man = read_bucket_manifest(spark, path)
    if man is None or not man["buckets"]:
        return None
    n = man["n_buckets"]

    def lit_sql(v) -> str:
        if isinstance(v, bool) or not isinstance(v, (int, str)):
            raise TypeError(f"unsupported id literal type: {type(v)}")
        if isinstance(v, int):
            return f"(CAST({v} AS BIGINT))"
        escaped = v.replace("'", "''")
        return f"('{escaped}')"

    if not ids:
        dirs = []
    else:
        vals = ", ".join(lit_sql(v) for v in ids)
        probe = spark.sql(f"SELECT * FROM VALUES {vals} AS t({id_col})")
        bkts = {
            r[0]
            for r in probe.select(bucket_of(id_col, n)).distinct().collect()
        }
        dirs = [
            posixpath.join(path, man["buckets"][str(b)])
            for b in sorted(bkts)
            if str(b) in man["buckets"]
        ]
    if not dirs:
        # schema-correct empty frame: the probed buckets were never
        # written (or no ids) — read a committed bucket dir's footer
        # only, no row scan survives the false filter
        any_dir = posixpath.join(path, next(iter(man["buckets"].values())))
        return spark.read.parquet(any_dir).filter(F.lit(False))
    return spark.read.parquet(*dirs).filter(F.col(id_col).isin(list(ids)))


def _cleanup(spark: SparkSession, path: str, keep_dirs: set[str],
             keep_versions: set[int]) -> None:
    """Best-effort: drop data bucket dirs not referenced by the new or
    previous manifest, empty ``v=`` dirs, and manifests older than the
    previous.  Failures are swallowed — garbage is re-attempted on the
    next fold and never affects correctness."""
    hpath, fs = _fs(spark, path)
    try:
        ddir = hpath(posixpath.join(path, "data"))
        if fs.exists(ddir):
            for vst in fs.listStatus(ddir):
                vname = vst.getPath().getName()
                rel_v = posixpath.join("data", vname)
                kids = fs.listStatus(vst.getPath())
                live = 0
                for bst in kids:
                    rel = posixpath.join(rel_v, bst.getPath().getName())
                    if rel in keep_dirs:
                        live += 1
                    elif bst.getPath().getName().startswith(_BKT):
                        fs.delete(bst.getPath(), True)
                if live == 0:
                    fs.delete(vst.getPath(), True)
        mdir = hpath(posixpath.join(path, "_manifest"))
        if fs.exists(mdir):
            for st in fs.listStatus(mdir):
                name = st.getPath().getName()
                if name.endswith(".tmp"):
                    fs.delete(st.getPath(), False)
                elif name.startswith("m") and name.endswith(".json"):
                    try:
                        if int(name[1:-5]) not in keep_versions:
                            fs.delete(st.getPath(), False)
                    except ValueError:
                        continue
    except Exception:  # noqa: BLE001 — cleanup is advisory
        pass


def fold_bucket_index(
    spark: SparkSession,
    path: str,
    kept: DataFrame,
    id_col: str,
    n_buckets: int,
) -> dict:
    """Fold ``kept`` (id-unique upsert rows: re-sent ids replace, new
    ids append — :func:`~tmdb_index_spark.operators.upsert
    .update_or_append` semantics) into the bucketed index at ``path``,
    rewriting ONLY the buckets the batch touches.  Returns
    ``{"version", "touched"}``; an empty ``kept`` commits nothing
    (replay fixpoint).  ``n_buckets`` must match the store's (the
    manifest records it) — a mismatch raises instead of silently
    splitting ids across two bucketings."""
    man = read_bucket_manifest(spark, path)
    if man is not None and man.get("n_buckets") != n_buckets:
        raise ValueError(
            f"store at {path} was created with n_buckets="
            f"{man.get('n_buckets')}, fold called with {n_buckets} — "
            f"rebucketing is a full rebuild, not a fold"
        )
    keptb = kept.withColumn(_BKT, bucket_of(id_col, n_buckets))
    touched = sorted(
        r[0] for r in keptb.select(_BKT).distinct().collect()
    )
    if not touched:
        return {
            "version": man["version"] if man else 0,
            "touched": [],
        }
    version = (man["version"] + 1) if man else 1
    buckets = dict(man["buckets"]) if man else {}
    old_dirs = [
        posixpath.join(path, buckets[str(b)])
        for b in touched
        if str(b) in buckets
    ]
    if old_dirs:
        old_rows = spark.read.parquet(*old_dirs).withColumn(
            _BKT, bucket_of(id_col, n_buckets)
        )
        merged = old_rows.join(
            keptb.select(id_col), id_col, "left_anti"
        ).unionByName(keptb)
    else:
        merged = keptb
    vdir = f"data/v={version}"
    merged.write.mode("overwrite").partitionBy(_BKT).parquet(
        posixpath.join(path, vdir)
    )
    for b in touched:
        buckets[str(b)] = posixpath.join(vdir, f"{_BKT}={b}")
    new_man = {
        "version": version,
        "n_buckets": n_buckets,
        "buckets": buckets,
    }
    _write_manifest(spark, path, new_man)
    keep_dirs = set(buckets.values())
    if man is not None:
        keep_dirs |= set(man["buckets"].values())
    keep_versions = {version} | ({man["version"]} if man else set())
    _cleanup(spark, path, keep_dirs, keep_versions)
    return {"version": version, "touched": touched}
