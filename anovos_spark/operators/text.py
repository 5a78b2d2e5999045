"""Text analysis for training-data pipelines: token stats, quality scoring,
language-ID heuristic, document fingerprinting.

These extend the reference's operator families to LLM-pipeline needs (the
reference has no text module; its NLP periphery is the embedding-based
feature_recommender, SURVEY §2.13).  All operators are pure Catalyst
expressions over the ``documents`` schema (doc_id, text, ...) — no UDFs, so
a 100 TB corpus scan stays JVM-side with full codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# whitespace tokenization shared by every operator (and by the DuckDB
# oracles — keep in sync with oracles.py)
_WS = r"\s+"

# minimal deterministic stopword profiles for the language-ID heuristic
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "for", "on", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "por", "con", "los"],
    "de": ["der", "die", "und", "das", "ist", "ein", "mit", "von", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
}

STOPWORDS_EN = LANG_PROFILES["en"]


def tokens(col: Column) -> Column:
    """Whitespace tokens with empties removed (split-on-\\s+ semantics)."""
    return F.filter(F.split(F.trim(col), _WS), lambda t: t != "")


def text_statistics(
    idf: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document stats: [id, n_chars, n_tokens, avg_token_len,
    punct_ratio, digit_ratio, space_ratio]."""
    t = F.col(text_col)
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    total_token_len = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    return idf.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(
            F.try_divide(total_token_len.cast("double"), n_tokens), 6
        ).alias("avg_token_len"),
        F.round(
            F.try_divide(
                (n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))).cast("double"),
                n_chars,
            ),
            6,
        ).alias("punct_ratio"),
        F.round(
            F.try_divide(
                (n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))).cast("double"),
                n_chars,
            ),
            6,
        ).alias("digit_ratio"),
        F.round(
            F.try_divide(
                (n_chars - F.length(F.regexp_replace(t, r" ", ""))).cast("double"),
                n_chars,
            ),
            6,
        ).alias("space_ratio"),
    )


def quality_score(
    idf: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_avg_token_len: float = 15.0,
    max_punct_ratio: float = 0.3,
    min_stopword_ratio: float = 0.01,
) -> DataFrame:
    """Heuristic quality gates in the C4/Gopher style: length, token shape,
    punctuation density, stopword presence.  Returns [id, n_tokens,
    stopword_ratio, quality_score, keep] with score = fraction of gates
    passed — a pure expression battery, one scan."""
    t = F.col(text_col)
    toks = tokens(F.lower(t))
    n_tokens = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS_EN)))
    stop_ratio = F.round(F.try_divide(stop_hits.cast("double"), n_tokens), 6)
    avg_len = F.try_divide(
        F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double"),
        n_tokens,
    )
    n_chars = F.length(t)
    punct_ratio = F.try_divide(
        (n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))).cast("double"), n_chars
    )
    gates = [
        (n_tokens >= min_tokens).cast("int"),
        (avg_len <= max_avg_token_len).cast("int"),
        (punct_ratio <= max_punct_ratio).cast("int"),
        (stop_ratio >= min_stopword_ratio).cast("int"),
    ]
    # coalesce: empty/whitespace-only docs have null ratios — they fail the
    # gate (keep=0) rather than propagating null through the score
    score = F.coalesce(
        sum(gates[1:], gates[0]) / F.lit(float(len(gates))), F.lit(0.0)
    )
    return idf.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
        (score == 1.0).cast("int").alias("keep"),
    )


def language_id(
    idf: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-profile language ID: score = matched profile words / tokens
    per language; predicted = argmax (ties → lexicographically first lang;
    no profile hit → 'und').  Pure expressions — the per-language scores are
    literal-array intersections, no UDF."""
    toks = tokens(F.lower(F.col(text_col)))
    n_tokens = F.size(toks)
    def profile_filter(words: list[str]):
        return lambda x: x.isin(words)

    scores = []
    for lang in sorted(LANG_PROFILES):
        hits = F.size(F.filter(toks, profile_filter(LANG_PROFILES[lang])))
        scores.append(
            F.struct(
                F.round(F.try_divide(hits.cast("double"), n_tokens), 6).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return idf.select(
        F.col(id_col),
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        F.coalesce(best["score"], F.lit(0.0)).alias("lang_score"),
    )


def document_fingerprint(
    idf: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Normalized-content fingerprint: md5 over lowercased,
    whitespace-collapsed text — the exact-dedup key. [id, fingerprint]"""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), _WS, " ")
    return idf.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


# GPT-2-style pre-tokenizer, simplified to the RE2-safe subset (no
# lookahead) so Spark's Java regex and the DuckDB oracle's RE2 agree:
# contractions | space-prefixed letter runs | space-prefixed digit runs |
# space-prefixed punctuation runs | whitespace runs.
BPE_ISH_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+|\s+"


def token_count(
    idf: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "whitespace",
) -> DataFrame:
    """Token counts per document → [id, n_tokens].

    mode='whitespace': split-on-\\s+ count (the cheap LLM-data heuristic).
    mode='bpe_ish': matches of a GPT-2-style pre-tokenizer regex over the
    lowercased text — tracks real BPE token counts within a few % on
    natural text, at scan speed (one regexp_count expression, no UDF, no
    vocab file)."""
    t = F.col(text_col)
    if mode == "whitespace":
        n = F.size(tokens(t))
    elif mode == "bpe_ish":
        n = F.regexp_count(F.lower(t), F.lit(BPE_ISH_RE))
    else:
        raise ValueError("mode must be whitespace|bpe_ish")
    return idf.select(F.col(id_col).alias("id"), n.cast("long").alias("n_tokens"))
