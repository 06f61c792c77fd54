"""Streaming near-duplicate detection: MinHash-LSH over a document
stream with per-bucket signature state.

The batch dedup surface (`operators/dedup_text.py`) answers "which
pairs in this corpus are near-dups"; a training-data INGEST pipeline
needs the streaming form — "is this arriving document a near-dup of
anything seen so far" — without re-scanning the corpus per batch.
This module keeps the seen signatures in Spark's state store, keyed by
LSH band bucket, so each arriving document is compared only against
the (occupancy-bounded) bucket it hashes into:

* map stage — per-doc MinHash signature computed inline in ONE
  Arrow `mapInPandas` pass (same shingle tokenization and universal
  hash family as the batch operator — `dedup_text.MINHASH_P`,
  `_minhash_a/_minhash_b` — so batch and stream agree on signatures).
  The batch operator's explode→groupBy formulation would be a second
  stateful operator on a stream; folding the per-doc min into the map
  stage keeps the whole query single-stateful.
* band stage — signatures explode into ``bands`` (band, key) bucket
  rows, exactly the batch banding (concat of r consecutive minhashes).
* state stage — one ``applyInPandasWithState`` keyed on (band, key):
  state is the list of (doc_id, signature) previously seen in the
  bucket; each arriving doc emits one detection row per stored
  signature whose full-signature agreement ≥ ``min_sig_match``
  (the streaming stand-in for the batch path's exact-Jaccard verify
  — agreement fraction is the unbiased Jaccard estimate), then joins
  the bucket's state itself.

Semantics: a doc colliding with a prior doc in MULTIPLE bands emits
one row per band (downstream `dropDuplicates(["doc_id", "matched_id"])`
if single verdicts are wanted); a redelivered doc_id never matches
itself and is not re-appended (idempotent under at-least-once
delivery). A doc that emits no detection is novel.

At 100 TB-scale ingest the state store bounds this: state size is
|corpus| signatures × bands. Production sets a processing-time timeout
or periodically compacts hot buckets (the eviction plug point is the
``GroupStateTimeout`` argument); bucket skew is the same S-curve trade
as the batch operator — more bands, narrower keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tmdb_index_spark.operators.dedup_text import (
    MINHASH_P,
    _minhash_a,
    _minhash_b,
)

__all__ = ["neardup_detect_stream", "DETECTION_SCHEMA"]

DETECTION_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("matched_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("sig_sim", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ids", T.ArrayType(T.LongType())),
        T.StructField("sigs", T.ArrayType(T.StringType())),
    ]
)


def _sig_mapper(text_col: str, id_col: str, n: int, num_hashes: int):
    """Per-doc signature, computed row-locally (no explode/groupBy, so
    the stream stays single-stateful). Tokenization and hashing match
    `dedup_text._shingle_frame` + `minhash_signatures` exactly."""
    import hashlib
    import re

    ws = re.compile(r"\s+", re.ASCII)
    a = [_minhash_a(i) for i in range(num_hashes)]
    b = [_minhash_b(i) for i in range(num_hashes)]

    def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        md5 = hashlib.md5
        from_bytes = int.from_bytes
        for pdf in batches:
            ids: list = []
            sigs: list[list[int | None]] = []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                toks = ws.split(txt.strip(" \t\n\r\f\v")) if txt else []
                seen: dict[str, None] = {}
                for j in range(len(toks) - (n - 1)):
                    seen.setdefault(" ".join(toks[j : j + n]))
                if not seen:
                    continue  # no shingles -> no signature -> no buckets
                bases = [
                    (from_bytes(md5(s.encode("utf-8")).digest()[:8], "big") >> 4)
                    % MINHASH_P
                    for s in seen
                ]
                sig = [
                    min((base * a[h] + b[h]) % MINHASH_P for base in bases)
                    for h in range(num_hashes)
                ]
                ids.append(i)
                sigs.append(sig)
            yield pd.DataFrame({"doc_id": ids, "sig": sigs})

    return mapper


def _make_detector(min_sig_match: float, num_hashes: int):
    def detect(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ids, sigs_csv = state.get if state.exists else ([], [])
        ids = list(ids)
        sigs = [[int(x) for x in s.split(",")] for s in sigs_csv]
        known = set(ids)
        out_doc: list[int] = []
        out_match: list[int] = []
        out_band: list[int] = []
        out_sim: list[float] = []
        band = int(key[0])
        for pdf in pdfs:
            # deterministic order within the batch
            for _, row in pdf.sort_values("doc_id").iterrows():
                did = int(row["doc_id"])
                sig = [int(x) for x in row["sig"]]
                if did in known:
                    continue  # redelivery: never self-match or re-add
                for mid, msig in zip(ids, sigs):
                    agree = sum(x == y for x, y in zip(sig, msig))
                    sim = agree / num_hashes
                    if sim >= min_sig_match:
                        out_doc.append(did)
                        out_match.append(mid)
                        out_band.append(band)
                        out_sim.append(round(sim, 4))
                ids.append(did)
                sigs.append(sig)
                known.add(did)
        state.update(
            (ids, [",".join(str(x) for x in s) for s in sigs])
        )
        yield pd.DataFrame(
            {
                "doc_id": out_doc,
                "matched_id": out_match,
                "band": out_band,
                "sig_sim": out_sim,
            }
        )

    return detect


def neardup_detect_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    min_sig_match: float = 0.5,
) -> DataFrame:
    """Near-dup detections for a streaming documents frame: one row
    ``(doc_id, matched_id, band, sig_sim)`` per (arriving doc ×
    previously-seen bucket-mate with signature agreement ≥
    ``min_sig_match`` × colliding band). See module docstring for
    semantics and the state-budget scale note."""
    if num_hashes % bands:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes})"
        )
    r = num_hashes // bands
    sig = docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        _sig_mapper(text_col, id_col, n, num_hashes),
        "doc_id long, sig array<long>",
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).cast("int").alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(F.col("sig"), bi * r + ri + 1)
                        for ri in range(r)
                    ],
                ).alias("key"),
            )
            for bi in range(bands)
        ]
    )
    buckets = sig.select(
        "doc_id", "sig", F.explode(band_structs).alias("bk")
    ).select(
        "doc_id",
        "sig",
        F.col("bk.band").alias("band"),
        F.col("bk.key").alias("key"),
    )
    return buckets.groupBy("band", "key").applyInPandasWithState(
        _make_detector(min_sig_match, num_hashes),
        outputStructType=DETECTION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
