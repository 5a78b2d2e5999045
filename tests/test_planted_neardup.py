"""In-suite planted-pair recall differential for embedding_near_dup_pairs
(small twin of tools/planted_neardup_probe.py, which pins the same
invariant at sf10's 200k corpus in PLANTED_NEARDUP_r10.json):

plant vectors at EXACTLY cos = τ ± margin from known sources (closed-form
Gram-Schmidt construction) and assert the operator recalls every planted
positive and none of the planted negatives, on both algorithm paths.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

SF_DIR = "/root/testdata/sf0.01"
K = 20


@pytest.mark.parametrize(
    "threshold,pos_cos,neg_cos,tag",
    [(0.45, 0.50, 0.40, "exact_gemm"), (0.70, 0.995, 0.60, "lsh")],
)
def test_planted_pair_recall(spark, threshold, pos_cos, neg_cos, tag):
    from planted_neardup_probe import ID_BASE, make_planted

    from pyspark.sql import functions as F
    from pyspark.sql.types import (ArrayType, FloatType, IntegerType,
                                   LongType, StructField, StructType)

    from anovos_spark.operators.similarity import embedding_near_dup_pairs

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pool = [
        (r["vec_id"], r["embedding"])
        for r in emb.where(F.col("embedding").isNotNull())
        .orderBy("vec_id").limit(3 * K).collect()
        if np.linalg.norm(np.asarray(r["embedding"], dtype="float64")) > 1e-9
    ]
    assert len(pool) >= 2 * K
    pos_src, neg_src = pool[:K], pool[K:2 * K]
    pos = make_planted(pos_src, pos_cos, ID_BASE, seed=7)
    neg = make_planted(neg_src, neg_cos, ID_BASE + K, seed=11)
    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ])
    corpus = emb.unionByName(spark.createDataFrame(pos + neg, schema))

    hits = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(corpus, threshold=threshold)
        .where(F.col("id_b") >= ID_BASE).collect()
    }
    want_pos = {(sid, ID_BASE + i) for i, (sid, _) in enumerate(pos_src)}
    want_neg = {(sid, ID_BASE + K + i) for i, (sid, _) in enumerate(neg_src)}
    assert want_pos <= hits, (tag, sorted(want_pos - hits))
    assert not (want_neg & hits), (tag, sorted(want_neg & hits))
