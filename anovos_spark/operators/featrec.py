"""Feature recommender — attribute-to-feature-corpus semantic matching.

Reference parity: feature_recommender/feature_mapper.py:35-655 matches user
attribute names to a curated feature corpus by sentence-transformer
embedding cosine (driver-side pandas).  That model dependency isn't
portable, so the same contract is served by TF-IDF cosine over word +
character-trigram tokens — dependency-free and fully distributed:

- the corpus (small) tokenizes and broadcasts;
- attributes tokenize the same way;
- cosine is a SPARSE dot product computed as a token equi-join + sum of
  weight products — no dense vectors, no UDFs, scales to millions of
  attributes because the shuffle key is the token, never the pair.

The built-in corpus is a small ORIGINAL set of generic feature
descriptions; callers pass their own curated corpus_df for real use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# (feature_name, industry, usecase, description) — original content
DEFAULT_CORPUS: list[tuple[str, str, str, str]] = [
    ("customer_income_level", "finance", "credit scoring", "annual income level of the customer"),
    ("customer_age", "finance", "credit scoring", "age of the customer in years"),
    ("account_balance", "finance", "credit scoring", "current account balance amount"),
    ("transaction_amount", "finance", "fraud detection", "monetary amount of the transaction"),
    ("transaction_count_30d", "finance", "fraud detection", "number of transactions in the last thirty days"),
    ("days_since_last_login", "tech", "churn prediction", "days elapsed since the last user login"),
    ("session_duration_avg", "tech", "engagement", "average user session duration in seconds"),
    ("page_views_per_session", "tech", "engagement", "count of page views per user session"),
    ("cart_abandonment_rate", "retail", "conversion", "rate of shopping carts abandoned before purchase"),
    ("order_total_price", "retail", "sales forecasting", "total price of the customer order"),
    ("order_item_quantity", "retail", "sales forecasting", "quantity of items in the order"),
    ("product_discount_pct", "retail", "pricing", "discount percentage applied to the product"),
    ("shipping_duration_days", "retail", "logistics", "days between order and delivery"),
    ("call_duration_minutes", "telecom", "churn prediction", "duration of customer calls in minutes"),
    ("data_usage_gb", "telecom", "plan recommendation", "gigabytes of mobile data used per month"),
    ("claim_amount", "insurance", "claims", "monetary amount of the insurance claim"),
    ("policy_tenure_years", "insurance", "retention", "years the policy has been active"),
    ("patient_visit_count", "healthcare", "utilization", "number of patient visits in the period"),
    ("supplier_lead_time", "manufacturing", "supply chain", "lead time from supplier order to receipt"),
    ("tax_rate_pct", "finance", "billing", "tax rate percentage applied to the line item"),
]


def _tokenized(df: DataFrame, col: Column, keep: list[str]) -> DataFrame:
    """[*keep, token] — word tokens + character trigrams of an attribute
    name / description, staged through intermediate columns (a single
    nested HOF expression trips the analyzer's lateral-alias check)."""
    norm = F.regexp_replace(F.lower(col), r"[^a-z0-9]+", " ")
    step = df.select(
        *keep, F.filter(F.split(F.trim(norm), " "), lambda t: t != "").alias("__w__")
    ).withColumn("__sq__", F.concat_ws("", F.col("__w__")))
    idxs = F.sequence(F.lit(1), F.greatest(F.length("__sq__") - 2, F.lit(1)))
    grams = F.filter(
        F.transform(idxs, lambda i: F.col("__sq__").substr(i, F.lit(3))),
        lambda g: F.length(g) == 3,
    )
    return step.select(
        *keep,
        F.explode(F.array_distinct(F.concat(F.col("__w__"), grams))).alias("token"),
    )


def feature_recommender_match(
    attr_df: DataFrame,
    corpus_df: DataFrame | None = None,
    attr_col: str = "attribute",
    top_k: int = 2,
    min_score: float = 0.05,
) -> DataFrame:
    """[attribute, feature_name, industry, usecase, score, rank] — top-k
    corpus features per attribute by TF-IDF cosine."""
    spark = attr_df.sparkSession
    if corpus_df is None:
        corpus_df = spark.createDataFrame(
            DEFAULT_CORPUS,
            schema="feature_name string, industry string, usecase string, description string",
        )
    n_features = corpus_df.count()

    corpus_tok = _tokenized(
        corpus_df,
        F.concat_ws(" ", "feature_name", "description"),
        ["feature_name", "industry", "usecase"],
    )
    # idf from the corpus: ln(1 + N/df) — tiny frame, stays broadcastable
    idf = corpus_tok.groupBy("token").agg(
        F.log(F.lit(1.0) + F.lit(float(n_features)) / F.count_distinct("feature_name")).alias("idf")
    )
    cw = (
        corpus_tok.join(F.broadcast(idf), "token")
        .withColumn("w", F.col("idf"))
    )
    cnorm = cw.groupBy("feature_name").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("cn"))
    corpus_weighted = cw.join(F.broadcast(cnorm), "feature_name")

    attrs = _tokenized(
        attr_df.select(F.col(attr_col).alias("attribute")),
        F.col("attribute"),
        ["attribute"],
    )
    aw = attrs.join(F.broadcast(idf), "token").withColumn("w2", F.col("idf"))
    anorm = aw.groupBy("attribute").agg(F.sqrt(F.sum(F.col("w2") * F.col("w2"))).alias("an"))
    attr_weighted = aw.join(F.broadcast(anorm), "attribute")

    # sparse dot product: equi-join on token, sum the weight products
    scored = (
        attr_weighted.join(F.broadcast(corpus_weighted), "token")
        .groupBy("attribute", "feature_name", "industry", "usecase")
        .agg(
            F.round(
                F.sum(F.col("w") * F.col("w2")) / (F.first("an") * F.first("cn")), 6
            ).alias("score")
        )
        .where(F.col("score") >= min_score)
    )
    w = Window.partitionBy("attribute").orderBy(
        F.col("score").desc(), F.col("feature_name").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= top_k)


def hashed_token_embedding(
    df: DataFrame,
    text_col: Column,
    keep: list[str],
    dim: int = 64,
    out_col: str = "embedding",
) -> DataFrame:
    """Deterministic hashing-trick embedding: word + trigram tokens hash
    to one of ``dim`` signed buckets (xxhash64 — engine-stable), so the
    vector is a content-only function of the text.  Fully distributed
    (token explode → one groupBy per input row), no model artifact —
    the dependency-free provider for the embedded recommender path."""
    tok = _tokenized(df, text_col, keep)
    per = tok.withColumn(
        "__b__", F.pmod(F.xxhash64("token"), F.lit(dim))
    ).withColumn(
        "__s__",
        F.when(F.pmod(F.xxhash64("token", F.lit(1)), 2) == 0, 1.0).otherwise(-1.0),
    )
    aggs = [
        F.coalesce(
            F.sum(F.when(F.col("__b__") == i, F.col("__s__"))), F.lit(0.0)
        ).alias(f"d{i}")
        for i in range(dim)
    ]
    wide = per.groupBy(*keep).agg(*aggs)
    return wide.select(
        *keep, F.array(*[f"d{i}" for i in range(dim)]).alias(out_col)
    )


def _sentence_transformer_embeddings(
    attr_df: DataFrame,
    corpus_df: DataFrame,
    attr_col: str,
    model_dir: str,
):
    """Real-model provider (reference featrec_init.py:7,29-31 loads
    all-mpnet-base-v2).  Import-gated: the model library isn't in this
    environment, so the gate raises with a clear message; when present,
    the corpus (small) encodes driver-side and attributes encode inside
    mapInPandas with a per-worker model cache."""
    try:
        from sentence_transformers import SentenceTransformer  # noqa: F401
    except ImportError as exc:
        raise RuntimeError(
            "embedded feature recommender with model_dir requires the "
            "sentence-transformers package (reference parity: "
            "all-mpnet-base-v2); pass precomputed attr_emb_col/"
            "corpus_emb_col or omit model_dir for the hashed-token "
            "provider"
        ) from exc

    model = SentenceTransformer(model_dir)
    c_rows = corpus_df.collect()
    c_vecs = model.encode([f"{r['feature_name']} {r['description']}" for r in c_rows])
    spark = corpus_df.sparkSession
    corpus_emb = spark.createDataFrame(
        [
            (r["feature_name"], r["industry"], r["usecase"], [float(x) for x in v])
            for r, v in zip(c_rows, c_vecs)
        ],
        schema="feature_name string, industry string, usecase string, "
        "embedding array<double>",
    )

    def encode_batches(batches):
        import pandas as pd

        local = SentenceTransformer(model_dir)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = local.encode(list(pdf["attribute"]))
            yield pd.DataFrame(
                {"attribute": pdf["attribute"], "embedding": [list(map(float, v)) for v in vecs]}
            )

    attr_emb = attr_df.select(F.col(attr_col).alias("attribute")).mapInPandas(
        encode_batches, schema="attribute string, embedding array<double>"
    )
    return attr_emb, corpus_emb


def feature_recommender_match_embedded(
    attr_df: DataFrame,
    corpus_df: DataFrame | None = None,
    attr_col: str = "attribute",
    attr_emb_col: str | None = None,
    corpus_emb_col: str | None = None,
    model_dir: str | None = None,
    dim: int = 64,
    top_k: int = 2,
    min_score: float = 0.05,
) -> DataFrame:
    """Embedding-cosine recommender — the reference's actual scoring
    (feature_mapper.py:35-655: sentence-transformer cosine, driver-side
    pandas), distributed.  Same output contract as
    feature_recommender_match: [attribute, feature_name, industry,
    usecase, score, rank].

    Embedding provider, in priority order:
    1. precomputed columns (``attr_emb_col`` on attr_df + ``corpus_emb_col``
       on corpus_df) — bring-your-own model output;
    2. ``model_dir`` → sentence-transformers, import-gated;
    3. hashed-token embeddings (deterministic, dependency-free fallback —
       documented divergence from the reference's all-mpnet-base-v2
       rankings, featrec_init.py:29-31).

    Scoring: the corpus matrix (small by contract, ≤10k rows) collects
    and broadcasts; attribute vectors GEMM against it per Arrow batch
    (mapInPandas), so attributes never shuffle and scale to millions —
    only (attribute, feature, score≥min_score) survivors reach the
    rank window."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    spark = attr_df.sparkSession
    if corpus_df is None:
        corpus_df = spark.createDataFrame(
            DEFAULT_CORPUS,
            schema="feature_name string, industry string, usecase string, description string",
        )

    if attr_emb_col and corpus_emb_col:
        # bring-your-own embeddings may carry nulls — no geometry, excluded
        attr_emb = attr_df.where(F.col(attr_emb_col).isNotNull()).select(
            F.col(attr_col).alias("attribute"),
            F.col(attr_emb_col).alias("embedding"),
        )
        corpus_emb = corpus_df.where(F.col(corpus_emb_col).isNotNull()).select(
            "feature_name", "industry", "usecase",
            F.col(corpus_emb_col).alias("embedding"),
        )
    elif model_dir is not None:
        attr_emb, corpus_emb = _sentence_transformer_embeddings(
            attr_df, corpus_df, attr_col, model_dir
        )
    else:
        attr_emb = hashed_token_embedding(
            attr_df.select(F.col(attr_col).alias("attribute")),
            F.col("attribute"),
            ["attribute"],
            dim=dim,
        )
        corpus_emb = hashed_token_embedding(
            corpus_df,
            F.concat_ws(" ", "feature_name", "description"),
            ["feature_name", "industry", "usecase"],
            dim=dim,
        )

    c_rows = corpus_emb.collect()
    if len(c_rows) > 10_000:
        raise ValueError(
            "embedded recommender broadcasts the corpus; keep it <= 10k "
            "features (shard the corpus or use lsh_bucket_topk)"
        )
    if not c_rows:
        raise ValueError(
            "embedded recommender needs a non-empty feature corpus "
            "(corpus embedding collected empty)"
        )
    meta = [(r["feature_name"], r["industry"], r["usecase"]) for r in c_rows]
    C = np.array([r["embedding"] for r in c_rows], dtype="float64")
    Cn = np.sqrt((C * C).sum(axis=1))
    Cn[Cn == 0] = np.inf
    Cz = C / Cn[:, None]
    b_c = spark.sparkContext.broadcast((meta, Cz))
    thr = float(min_score)

    def score_blocks(batches):
        meta_b, Cz_b = b_c.value
        names = np.array([m[0] for m in meta_b])
        inds = np.array([m[1] for m in meta_b])
        uses = np.array([m[2] for m in meta_b])
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.array(list(pdf["embedding"]), dtype="float64")
            An = np.sqrt((A * A).sum(axis=1))
            An[An == 0] = np.inf
            S = np.round((A / An[:, None]) @ Cz_b.T, 6)  # (rows, n_features)
            ai, ci = np.nonzero(S >= thr)
            attrs = pdf["attribute"].to_numpy()
            yield pd.DataFrame(
                {
                    "attribute": attrs[ai],
                    "feature_name": names[ci],
                    "industry": inds[ci],
                    "usecase": uses[ci],
                    "score": S[ai, ci],
                }
            )

    scored = attr_emb.mapInPandas(
        score_blocks,
        schema="attribute string, feature_name string, industry string, "
        "usecase string, score double",
    )
    w = Window.partitionBy("attribute").orderBy(
        F.col("score").desc(), F.col("feature_name").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= top_k
    )


def list_all_industry(spark, corpus=None) -> DataFrame:
    """Distinct industries in the corpus (reference:
    feature_explorer.py:23-33)."""
    return _corpus_df(spark, corpus).select("industry").distinct().orderBy("industry")


def list_all_usecase(spark, corpus=None) -> DataFrame:
    """Distinct usecases (reference: feature_explorer.py:36-46)."""
    return _corpus_df(spark, corpus).select("usecase").distinct().orderBy("usecase")


def list_all_pair(spark, corpus=None) -> DataFrame:
    """Distinct (industry, usecase) pairs (reference:
    feature_explorer.py:49-58)."""
    return (
        _corpus_df(spark, corpus)
        .select("industry", "usecase")
        .distinct()
        .orderBy("industry", "usecase")
    )


def list_feature_by_industry(
    spark, industry: str, num_of_feat: int = 100, corpus=None
) -> DataFrame:
    """Features of one industry (reference: feature_explorer.py:181-223;
    exact-match path — the semantic path is feature_recommender_match)."""
    return (
        _corpus_df(spark, corpus)
        .where(F.lower(F.col("industry")) == industry.strip().lower())
        .orderBy("feature_name")
        .limit(num_of_feat)
    )


def list_feature_by_usecase(
    spark, usecase: str, num_of_feat: int = 100, corpus=None
) -> DataFrame:
    """Features of one usecase (reference: feature_explorer.py:226-269)."""
    return (
        _corpus_df(spark, corpus)
        .where(F.lower(F.col("usecase")) == usecase.strip().lower())
        .orderBy("feature_name")
        .limit(num_of_feat)
    )


def _corpus_df(spark, corpus=None) -> DataFrame:
    return spark.createDataFrame(
        corpus or DEFAULT_CORPUS,
        schema="feature_name string, industry string, usecase string, description string",
    )
