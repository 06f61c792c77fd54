"""Bucketed table checksums for cross-system verification.

No reference counterpart (the reference trusts its single-writer
parquet file); at 100 TB the question "is the replica byte-identical
to the source?" cannot be answered by comparing rows — but it CAN be
answered by comparing a few hundred bucket digests. This is the
merkle-style anti-entropy pattern (Dynamo/Cassandra repair, Debezium
incremental snapshots): hash every row canonically, fold row hashes
per key-bucket with an ORDER-INDEPENDENT combiner, and diff the
digest tables. Mismatched buckets localize the damage to 1/buckets of
the data, which can then be re-compared or re-copied selectively.

Spark-first shape: the row hash and bucket id are pure column
expressions (portable md5, so any engine — including the DuckDB
oracle and whatever system holds the replica — reproduces the digest
bit-for-bit); the fold is one partial-aggregated groupBy on the
bucket id. XOR is the combiner: associative, commutative, and
width-preserving, so no ordering assumption and no overflow — the one
caveat (a row PAIR duplicated an even number of times cancels out) is
countered by also comparing per-bucket row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tmdb_index_spark.functions.text import portable_hash60

__all__ = ["table_checksum"]

#: Field separator / NULL marker for canonical row serialization.
#: Unit separator is vanishingly unlikely in data; NULL must be
#: distinct from the empty string or (NULL, 'x') == ('', 'x').
_SEP = "\x1f"
_NULL = "\x00"


def table_checksum(
    df: DataFrame,
    key_col: str,
    cols: list[str] | None = None,
    buckets: int = 256,
) -> DataFrame:
    """Per-bucket digests of ``df``: rows are serialized canonically
    (every column cast to string, NULL marked, unit-separator
    joined — cast your columns to the precision you mean first:
    float formatting is engine-specific, decimals/ints/dates are
    not), hashed with the portable 60-bit md5, bucketed by
    ``portable_hash(key) mod buckets``, and folded with XOR + count.

    Two tables are replicas iff their digest frames are equal; a
    mismatched bucket localizes the diff. ``buckets`` trades digest
    size against localization (256 buckets over 100 TB = ~400 GB per
    bucket to re-verify on mismatch; raise it for finer repair).

    Returns ``(bucket, n_rows, checksum)``.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    cols = cols or df.columns
    canon = F.concat_ws(
        _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
    )
    bucket = F.pmod(
        portable_hash60(F.col(key_col).cast("string")), F.lit(buckets)
    )
    return (
        df.select(
            bucket.alias("bucket"), portable_hash60(canon).alias("__h__")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.bit_xor("__h__").alias("checksum"),
        )
    )
