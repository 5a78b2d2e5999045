"""Similarity search over embedding columns (array<float>).

Two paths, same contract:
- brute_force_topk: exact cosine top-k via join + window — the baseline and
  the oracle-checkable truth.  O(Q·N) dot products; at 100 TB use it only
  for small Q against a broadcast query set (which is exactly how it's
  written: the query side is broadcast, the corpus side never shuffles).
- lsh_topk: random-hyperplane LSH — sign-bit sketch → bucket join → exact
  re-rank inside buckets.  Recall < 1, shuffle O(N·tables); the scale path.

Dot products run as F.aggregate/F.zip_with over the array — JVM-side,
no Python.  Floats are cast to double before multiply so the result is
deterministic (sequential fold, same order both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return F.try_divide(_dot(a, b), _norm2(a) * _norm2(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    [query_id, neighbor_id, cos_sim, rank] — self-matches excluded; ties
    broken by neighbor id asc on the 6-decimal-rounded similarity (so
    ranking is reproducible bit-for-bit across engines)."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    # broadcast the small query side; the corpus scan stays shuffle-free
    pairs = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    n_tables: int = 8,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: [id_a, id_b, cos_sim] with
    id_a < id_b and cos_sim ≥ threshold.

    exact=False (default, scale path): random-hyperplane LSH candidates →
    exact cosine verify — shuffle O(N·tables).  exact=True: full self-join
    (O(N²), the oracle-checkable baseline — small corpora only)."""
    from pyspark.sql import functions as F

    c1 = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    c2 = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if exact:
        pairs = c1.join(c2, F.col("id_a") < F.col("id_b"))
    else:
        dim = len(corpus.select(vec_col).first()[0])
        planes = {
            (t, b): _hyperplane(dim, seed, t, b)
            for t in range(n_tables)
            for b in range(n_bits)
        }

        def sketch(df, id_alias, v_alias):
            rows = []
            for t in range(n_tables):
                bits = None
                for b in range(n_bits):
                    plane = F.array(*[F.lit(v) for v in planes[(t, b)]])
                    bit = (_dot(F.col(v_alias), plane) > 0).cast("int")
                    bits = bit if bits is None else bits * 2 + bit
                rows.append(F.struct(F.lit(t).alias("t"), bits.alias("bk")))
            return df.select(
                id_alias, v_alias, F.explode(F.array(*rows)).alias("tb")
            ).select(id_alias, v_alias, "tb.t", "tb.bk")
        sa = sketch(c1, "id_a", "va")
        sb = sketch(c2, "id_b", "vb")
        pairs = (
            sa.join(sb, ["t", "bk"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "va", "vb")
            .distinct()
        )
    scored = pairs.select(
        "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim")
    )
    return scored.where(F.col("cos_sim") >= threshold)


def _hyperplane(dim: int, seed: int, table: int, bit: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from a counter-based
    LCG — reproducible anywhere, no RNG state."""
    vals = []
    x = (seed * 6364136223846793005 + (table * 97 + bit) * 1442695040888963407) % (2**63)
    for _ in range(dim):
        x = (x * 6364136223846793005 + 1442695040888963407) % (2**63)
        vals.append(((x >> 16) % 2000001) / 1000000.0 - 1.0)  # [-1, 1]
    return vals


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH ANN: sign sketches → bucket equi-join →
    exact cosine re-rank within candidates.

    [query_id, neighbor_id, cos_sim, rank].  Recall is approximate; the
    candidate join is an equi-join on (table, bucket) so shuffle volume is
    O(N·tables) regardless of corpus size."""
    from pyspark.sql import Window

    dim = len(corpus.select(vec_col).first()[0])
    planes = {
        (t, b): _hyperplane(dim, seed, t, b)
        for t in range(n_tables)
        for b in range(n_bits)
    }

    def sketch(df: DataFrame, id_alias: str) -> DataFrame:
        rows = []
        for t in range(n_tables):
            bits = None
            for b in range(n_bits):
                plane = F.array(*[F.lit(v) for v in planes[(t, b)]])
                bit = (_dot(F.col(vec_col), plane) > 0).cast("int")
                bits = bit if bits is None else bits * 2 + bit
            rows.append(F.struct(F.lit(t).alias("table"), bits.alias("bucket")))
        return df.select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(f"{id_alias}_v"),
            F.explode(F.array(*rows)).alias("tb"),
        ).select(id_alias, f"{id_alias}_v", "tb.table", "tb.bucket")

    cs = sketch(corpus, "neighbor_id")
    qs = sketch(queries, "query_id")
    cand = (
        cs.join(F.broadcast(qs), ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "query_id_v", "neighbor_id_v")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("query_id_v"), F.col("neighbor_id_v")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
