"""Build a scaled-up copy of an sf directory for stress runs.

Replicates the FACT tables (lineitem / orders / events / documents /
embeddings) ``factor``× with deterministic key offsets; the dimension
tables (region / nation / customer / supplier / part) copy through
unscaled — dims grow far slower than facts in a real warehouse, and
keeping them fixed preserves the broadcast-join shape the plans rely
on. Key consistency: lineitem and orders share one order-key offset so
fact-fact joins keep linear cardinality; events offset both event and
user ids, so user-grained windows/sessions grow in USER count (linear
work), not in per-key density (which would manufacture hot keys).
Documents get a per-replica Caesar rotation of the lowercase alphabet
(``F.translate``): a bijection on tokens, so every replica preserves
the ORIGINAL corpus's intra-replica similarity structure exactly while
sharing zero shingles across replicas — pair counts scale ~linearly in
``factor``, the way a real larger corpus behaves, instead of
quadratically the way naive duplication would.

Usage:
    PYTHONPATH=/root/repo python tools/make_scaled_sf.py \
        [src_sf_dir] [dst_dir] [factor] [emb_factor]

Defaults: /root/testdata/sf0.1 -> /tmp/sf_scaled x10 (~sf1.0).

``emb_factor`` (default = ``factor``) scales the embeddings table
independently — the SemDeDup/ANN regime cliffs live at vector counts
(1.28M for the k-means fit cap) far beyond where the text/fact tables
are interesting. When ``emb_factor > factor`` the extra replicas get a
per-replica cyclic COORDINATE ROLL (the embeddings analog of the
documents Caesar rotation): a roll is a permutation, so norms and
intra-replica similarity structure are preserved exactly while
replicas decorrelate — sign-bit orthant occupancy measured ~uniform
(max/mean ≈ 2.6 at 1000×14-bit) instead of the factor×-duplicate
mega-cells verbatim replication would stack. Plain ``factor`` runs
keep the historical as-is replication so older SCALE.md rows stay
comparable; any ``emb_factor`` (even == factor) opts into rolls.
"""

from __future__ import annotations

import string
import sys

from pyspark.sql import functions as F


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_scaled"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    emb_factor = int(sys.argv[4]) if len(sys.argv) > 4 else None

    from tmdb_index_spark.session import get_spark

    spark = get_spark("make-scaled-sf")
    spark.sparkContext.setLogLevel("ERROR")
    alpha = string.ascii_lowercase

    # lineitem + orders: ONE shared order-key offset keeps the
    # fact-fact join consistent across replicas.
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    orders = spark.read.parquet(f"{src}/orders.parquet")
    max_ok = (
        max(
            li.agg(F.max("l_orderkey")).first()[0],
            orders.agg(F.max("o_orderkey")).first()[0],
        )
        + 1
    )
    reps = spark.range(factor).select(F.col("id").alias("__rep__"))
    (
        li.crossJoin(reps)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__rep__") * max_ok)
        .drop("__rep__")
        .write.mode("overwrite")
        .parquet(f"{dst}/lineitem.parquet")
    )
    (
        orders.crossJoin(reps)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__rep__") * max_ok)
        .drop("__rep__")
        .write.mode("overwrite")
        .parquet(f"{dst}/orders.parquet")
    )

    # events: new event AND user ids per replica — the corpus grows in
    # users (linear work), not in per-user density (hot keys).
    ev = spark.read.parquet(f"{src}/events.parquet")
    max_ev = ev.agg(F.max("event_id")).first()[0] + 1
    max_user = ev.agg(F.max("user_id")).first()[0] + 1
    (
        ev.crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + F.col("__rep__") * max_ev)
        .withColumn("user_id", F.col("user_id") + F.col("__rep__") * max_user)
        .drop("__rep__")
        .write.mode("overwrite")
        .parquet(f"{dst}/events.parquet")
    )

    # dimensions: copy through unscaled.
    for t in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{dst}/{t}.parquet")

    # documents: id offset + per-replica alphabet rotation (translate
    # takes literal alphabets, so replicas union as separate branches).
    docs = spark.read.parquet(f"{src}/documents.parquet")
    max_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    branches = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * max_doc)).withColumn(
            "text",
            F.translate(F.col("text"), alpha, alpha[k % 26:] + alpha[: k % 26]),
        )
        for k in range(factor)
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    out.write.mode("overwrite").parquet(f"{dst}/documents.parquet")

    # embeddings: id offset; without emb_factor, vectors replicate
    # as-is (cell populations grow factor×, the IVF stress case); with
    # emb_factor, each replica's coordinates cyclically ROLL by rep%dim
    # (norm- and structure-preserving decorrelation — see module doc).
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    max_vec = emb.agg(F.max("vec_id")).first()[0] + 1
    if emb_factor is None:
        ereps, rolled = reps, F.col("embedding")
    else:
        dim = len(emb.select("embedding").head()[0])
        ereps = spark.range(emb_factor).select(F.col("id").alias("__rep__"))
        shift = (F.col("__rep__") % dim).cast("int")
        rolled = F.concat(
            F.slice(F.col("embedding"), shift + 1, F.lit(dim) - shift),
            F.slice(F.col("embedding"), 1, shift),
        )
    (
        emb.crossJoin(ereps)
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep__") * max_vec)
        .withColumn("embedding", rolled)
        .drop("__rep__")
        .write.mode("overwrite")
        .parquet(f"{dst}/embeddings.parquet")
    )

    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        n = spark.read.parquet(f"{dst}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
