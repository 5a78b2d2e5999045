"""Generate a synthetic ~sf1 dataset dir for 100x scale probing.

documents/embeddings scale 10x from sf0.1 (so 100x vs sf0.01, the probe's
lo side); every other table symlinks to its sf0.1 parquet.  Generation is
deterministic (pure hash functions of ids — no rand()), replica structure
chosen to stress the dedup/similarity families realistically:

- replica 0 keeps the original row (the sf0.1 corpus embeds unchanged);
- replicas 1-2 are NEAR-DUPS: original text with a short appended marker
  (high Jaccard -> minhash/simhash/LSH candidate groups of bounded size 3);
- replicas 3-9 are DISTINCT content: every word rehashes through md5 with
  the replica index, so token sets are disjoint across replicas and no
  spurious near-dup mass appears.

Embeddings mirror that: replicas 1-2 jitter each coordinate slightly
(cosine ~0.999 -> real near-neighbor structure), 3-9 re-randomize via a
coordinate hash (uncorrelated).

Usage: python tools/gen_scale_data.py [out_dir]   (default .scaledata/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events",
]


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scaledata", "sf1",
    )
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = spark.range(10).select(F.col("id").cast("int").alias("rep"))
    d = docs.crossJoin(reps)  # 10 replicas per doc — deliberate fan-out
    mutated_words = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda w: F.substring(
                F.md5(F.concat(w, F.lit("#"), F.col("rep").cast("string"))), 1, 7
            ),
        ),
        " ",
    )
    new_text = (
        F.when(F.col("rep") == 0, F.col("text"))
        .when(
            F.col("rep") <= 2,
            F.concat(
                F.col("text"),
                F.lit(" nearrep"),
                F.col("rep").cast("string"),
                F.lit("x"),
                F.col("doc_id").cast("string"),
            ),
        )
        .otherwise(mutated_words)
    )
    out_docs = d.select(
        (F.col("doc_id") + F.col("rep").cast("long") * F.lit(10_000_000)).alias(
            "doc_id"
        ),
        new_text.alias("text"),
        "lang",
        "source",
        F.length(new_text).cast("long").alias("n_chars"),
    )
    out_docs.repartition(8).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    e = emb.crossJoin(reps)
    # deterministic per-coordinate perturbation in [-1, 1]
    def coord_hash(i):
        return (
            F.pmod(
                F.xxhash64(F.col("vec_id"), F.col("rep"), i), F.lit(20001)
            ).cast("double")
            / 10000.0
            - 1.0
        )

    jittered = F.zip_with(
        F.col("embedding"),
        F.transform(F.col("embedding"), lambda x, i: coord_hash(i)),
        lambda x, h: (x + h * F.lit(0.02)).cast("float"),
    )
    rehashed = F.transform(F.col("embedding"), lambda x, i: coord_hash(i).cast("float"))
    new_vec = (
        F.when(F.col("rep") == 0, F.col("embedding"))
        .when(F.col("rep") <= 2, jittered)
        .otherwise(rehashed)
    )
    out_emb = e.select(
        (F.col("vec_id") + F.col("rep").cast("long") * F.lit(10_000_000)).alias(
            "vec_id"
        ),
        new_vec.alias("embedding"),
        "label",
    )
    out_emb.repartition(8).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )

    for t in TABLES:
        link = f"{out_dir}/{t}.parquet"
        if not os.path.exists(link):
            os.symlink(f"{SRC}/{t}.parquet", link)

    for t in ("documents", "embeddings"):
        n = spark.read.parquet(f"{out_dir}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
