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


def vocabulary(
    idf: DataFrame,
    text_col: str = "text",
    top_k: int = 1000,
    min_count: int = 1,
    lowercase: bool = True,
) -> DataFrame:
    """Corpus vocabulary with counts and document frequency →
    [token, count, doc_freq], the top_k most frequent (ties broken by
    token for a deterministic result).

    One explode + one aggregation: partial (map-side) counting collapses
    each partition to its distinct tokens before the shuffle, so shuffle
    volume is O(distinct tokens per partition), not O(total tokens) —
    the classic wordcount shape that survives 100 TB.  top_k limits only
    the final sorted take, computed as a total-order TakeOrdered on the
    aggregated (small) frame, never on raw tokens.
    """
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    tok = idf.select(F.explode(tokens(t)).alias("token"), F.lit(1).alias("one"))
    agg = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("count"),
    )
    # doc_freq needs per-doc distinct tokens — array_distinct BEFORE the
    # explode so each (doc, token) contributes once, still one shuffle
    df_tok = idf.select(
        F.explode(F.array_distinct(tokens(t))).alias("token")
    ).groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    out = agg.join(df_tok, "token").where(F.col("count") >= min_count)
    return out.orderBy(F.col("count").desc(), F.col("token").asc()).limit(top_k)


def pack_sequences(
    idf: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    capacity: int = 2048,
    by=None,
    mode: str = "chunk",
) -> DataFrame:
    """Assign documents to fixed-capacity training sequences (the LLM
    "sequence packing" step) → [by..., id, n_tokens, seq_id, seq_offset].

    mode='chunk' (default): GPT-style concat-and-chunk — documents are
    laid end-to-end in a deterministic order (id within key) and the
    stream is sliced every `capacity` tokens; a document MAY straddle two
    sequences (seq_id is where it starts; `straddles` flags it).  This is
    how packed pretraining batches are actually built (boundaries marked
    by EOS downstream), and it is closed-form: ONE window cumsum, no
    state, no UDF — the whole op is a projection over a partitioned
    window, SQL-portable (the DuckDB oracle replays it exactly).

    mode='nextfit': true bin packing (no document ever splits): close the
    current sequence when the next document does not fit.  Inherently
    sequential per shard — implemented as applyInPandas over `by` shards
    (Arrow-batched, linear scan per shard).  Next-fit wastes at most one
    document per boundary (2-approximation of optimal bin count).
    Documents longer than `capacity` get their own sequence.

    `by` partitions the packing (e.g. language, source shard); without it
    the order/scan is global and is refused — at scale ALWAYS pack within
    shards.
    """
    from anovos_spark.core.utils import ensure_list

    by = ensure_list(by) if by is not None else []
    if not by:
        raise ValueError(
            "pack_sequences without \'by\' needs a single global ordered "
            "window/scan (one task at scale); pack within shards — e.g. a "
            "hash-bucket column"
        )
    if mode == "chunk":
        from pyspark.sql.window import Window

        tok = F.col(token_col).cast("long")
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(id_col))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = F.sum(tok).over(w)
        start = cum - tok
        return idf.select(
            *by,
            F.col(id_col),
            tok.alias(token_col),
            F.floor(start / F.lit(int(capacity))).cast("long").alias("seq_id"),
            (start % F.lit(int(capacity))).cast("long").alias("seq_offset"),
            (
                F.floor(start / F.lit(int(capacity)))
                < F.floor((cum - F.lit(1)) / F.lit(int(capacity)))
            ).cast("int").alias("straddles"),
        )
    if mode != "nextfit":
        raise ValueError("mode must be chunk|nextfit")

    import pandas as pd

    cap = int(capacity)
    out_fields = by + [id_col, token_col, "seq_id", "seq_offset"]

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        seq, off, used = [], [], 0
        cur = 0
        for t in pdf[token_col].astype("int64").clip(upper=cap):
            if used + t > cap and used > 0:
                cur += 1
                used = 0
            seq.append(cur)
            off.append(used)
            used += int(t)
        pdf = pdf[[*by, id_col, token_col]].copy()
        pdf["seq_id"] = pd.Series(seq, dtype="int64")
        pdf["seq_offset"] = pd.Series(off, dtype="int64")
        return pdf

    schema_parts = []
    for c in out_fields:
        if c in ("seq_id", "seq_offset", token_col):
            schema_parts.append(f"{c} long")
        else:
            dt = idf.schema[c].dataType.simpleString()
            schema_parts.append(f"{c} {dt}")
    return (
        idf.select(*by, id_col, F.col(token_col).cast("long").alias(token_col))
        .groupBy(*by)
        .applyInPandas(pack, schema=", ".join(schema_parts))
    )


def word_ngrams(col: Column, n: int, distinct: bool = False) -> Column:
    """Word n-grams of whitespace-normalized lowercase text as an array
    expression (no UDF).  Documents with fewer than n tokens yield an
    EMPTY array — important cross-engine detail: a naive
    sequence(1, size-n+1) goes DESCENDING in Spark when size < n and
    would fabricate grams, while SQL range() is simply empty.

    Built from n−1 zip_with joins of SHIFTED token arrays, NOT a
    per-position slice lambda: expressions inside a higher-order lambda
    re-evaluate per element, so the old transform(sequence, i →
    slice(toks, i, n)) re-split the document once per token — O(tokens²)
    work that hung on a 100k-token document (caught by the
    adversarial-text probe).  The shifted-zip form re-evaluates the
    split n times total: linear."""
    s = F.regexp_replace(F.lower(F.trim(col)), _WS, " ")
    toks = F.split(s, " ")
    m = F.greatest(F.size(toks) - n + 1, F.lit(0))
    grams = F.slice(toks, 1, m)
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, 1 + j, m),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    grams = F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
    return F.array_distinct(grams) if distinct else grams


# Redaction patterns in the Java-regex ∩ RE2 shared subset (no lookaround)
# so the Spark expression and the DuckDB oracle replace identical spans.
PII_PATTERNS = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+[0-9][0-9()\- ]{6,}[0-9]",
}


def pii_redact(
    idf: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns=("email", "ipv4", "phone"),
    replacement: str = "[REDACTED]",
) -> DataFrame:
    """Scrub PII spans (emails, IPv4, international-format phones) →
    input columns with `text_col` redacted plus [n_redactions].

    Pure regexp_replace/regexp_count expressions — scan-speed, zero
    shuffle, no UDF.  ``id_col`` is accepted for signature symmetry with
    the rest of the text battery and passes through untouched (ALL input
    columns are preserved).  Patterns apply in the given order (email before
    phone so digits inside an address are consumed first); counts are
    computed per pattern BEFORE its replacement so overlapping patterns
    never double-count a span already redacted."""
    unknown = [p for p in patterns if p not in PII_PATTERNS]
    if unknown:
        raise ValueError(f"unknown patterns {unknown}; known: {sorted(PII_PATTERNS)}")
    t = F.col(text_col)
    n = F.lit(0).cast("long")
    for p in patterns:
        rx = PII_PATTERNS[p]
        n = n + F.regexp_count(t, F.lit(rx))
        t = F.regexp_replace(t, rx, replacement)
    return idf.select(
        *[c for c in idf.columns if c != text_col],
        t.alias(text_col),
        n.alias("n_redactions"),
    )


def repetition_stats(
    idf: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 2,
) -> DataFrame:
    """Gopher-style repetition quality signals per document →
    [id, n_tokens, n_grams, distinct_grams, dup_gram_frac, top_gram_frac].

    top_gram_frac = tokens covered by the single most frequent n-gram /
    total tokens (the published \"fraction of chars in top n-gram\"
    filter, on tokens); dup_gram_frac = 1 - distinct/total grams.
    Counting is row-local (per document), so it runs as one Arrow batch
    pass inside the scan — zero shuffles, no gram explode."""
    import pandas as pd

    toks_n = F.size(F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), _WS, " "), " "))
    base = idf.select(
        F.col(id_col).alias("id"),
        toks_n.alias("n_tokens"),
        word_ngrams(F.col(text_col), ngram).alias("__grams__"),
    )
    id_type = base.schema["id"].dataType.simpleString()

    # per-document counting is row-local, so it runs inside the scan as an
    # Arrow batch pass — ZERO shuffles, versus exploding every gram
    # (~n_tokens× the text volume) through two doc-keyed exchanges.  Gram
    # content comes from the SAME word_ngrams expression as before, so
    # values are oracle-identical; the final fractions keep Spark-side
    # F.round (HALF_UP — python round() is banker's and would diverge).
    def count_blocks(batches):
        from collections import Counter

        for pdf in batches:
            if len(pdf) == 0:
                continue
            n_grams, distinct, max_cnt = [], [], []
            for grams in pdf["__grams__"]:
                g = list(grams)
                n_grams.append(len(g))
                if g:
                    counts = Counter(g)
                    distinct.append(len(counts))
                    max_cnt.append(max(counts.values()))
                else:
                    distinct.append(0)
                    max_cnt.append(0)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_tokens": pdf["n_tokens"],
                    "n_grams": pd.Series(n_grams, dtype="int64"),
                    "distinct_grams": pd.Series(distinct, dtype="int64"),
                    "max_cnt": pd.Series(max_cnt, dtype="int64"),
                }
            )

    counted = base.mapInPandas(
        count_blocks,
        schema=(
            f"id {id_type}, n_tokens int, n_grams bigint, "
            "distinct_grams bigint, max_cnt bigint"
        ),
    )
    return counted.select(
        "id",
        "n_tokens",
        "n_grams",
        "distinct_grams",
        F.round(
            F.when(
                F.col("n_grams") > 0,
                1.0 - F.col("distinct_grams") / F.col("n_grams"),
            ).otherwise(0.0),
            6,
        ).alias("dup_gram_frac"),
        F.round(
            F.when(
                F.col("n_tokens") > 0,
                F.col("max_cnt") * F.lit(ngram) / F.col("n_tokens"),
            ).otherwise(0.0),
            6,
        ).alias("top_gram_frac"),
    )


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 5,
) -> DataFrame:
    """Benchmark-contamination screen: per training document, the
    fraction of its DISTINCT word n-grams that appear anywhere in the
    benchmark corpus → [id, n_grams, n_contaminated, contamination_frac].

    The benchmark side collapses to its distinct gram set (explode +
    distinct — tiny relative to the corpus); the check is then a plain
    equi-join on the gram string, hash-partitionable at any scale, with
    per-doc aggregation on the document key.  No similarity search, no
    UDF — this is the standard exact n-gram-overlap decontamination used
    for LLM training data."""
    doc_grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode_outer(word_ngrams(F.col(text_col), ngram, distinct=True)).alias("gram"),
    )
    bench_grams = (
        benchmark.select(F.explode(word_ngrams(F.col(text_col), ngram, distinct=True)).alias("gram"))
        .distinct()
        .withColumn("__hit__", F.lit(1))
    )
    joined = doc_grams.join(bench_grams, "gram", "left_outer")
    return joined.groupBy("id").agg(
        F.count(F.when(F.col("gram").isNotNull(), F.lit(1))).alias("n_grams"),
        F.sum(F.coalesce(F.col("__hit__"), F.lit(0))).alias("n_contaminated"),
        F.round(
            F.when(
                F.count(F.when(F.col("gram").isNotNull(), F.lit(1))) > 0,
                F.sum(F.coalesce(F.col("__hit__"), F.lit(0)))
                / F.count(F.when(F.col("gram").isNotNull(), F.lit(1))),
            ).otherwise(0.0),
            6,
        ).alias("contamination_frac"),
    )


def line_repetition_stats(
    idf: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher's duplicate-line filters per document →
    [id, n_lines, distinct_lines, dup_line_frac, dup_line_char_frac].

    dup_line_frac = duplicated lines / total lines; dup_line_char_frac =
    characters inside duplicated lines / total line characters (the two
    published thresholds are 0.30 / 0.20).  Same explode + doc-keyed
    aggregate shape as repetition_stats; blank lines are ignored, lines
    compare after trim."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )
    per_line = idf.select(
        F.col(id_col).alias("id"),
        F.explode_outer(lines).alias("line"),
    ).groupBy("id", "line").agg(
        F.count(F.when(F.col("line").isNotNull(), F.lit(1))).alias("cnt"),
        F.length(F.coalesce(F.col("line"), F.lit(""))).alias("chars"),
    )
    dup_lines = F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0))
    dup_chars = F.sum(
        F.when(F.col("cnt") > 1, F.col("cnt") * F.col("chars")).otherwise(0)
    )
    tot_lines = F.sum(F.when(F.col("line").isNotNull(), F.col("cnt")).otherwise(0))
    tot_chars = F.sum(
        F.when(F.col("line").isNotNull(), F.col("cnt") * F.col("chars")).otherwise(0)
    )
    return per_line.groupBy("id").agg(
        tot_lines.alias("n_lines"),
        F.count(F.when(F.col("line").isNotNull(), F.lit(1))).alias("distinct_lines"),
        F.round(
            F.when(tot_lines > 0, dup_lines / tot_lines).otherwise(0.0), 6
        ).alias("dup_line_frac"),
        F.round(
            F.when(tot_chars > 0, dup_chars / tot_chars).otherwise(0.0), 6
        ).alias("dup_line_char_frac"),
    )


def ngram_counts(
    idf: DataFrame,
    text_col: str = "text",
    n: int = 2,
    top_k: int = 1000,
    min_count: int = 1,
) -> DataFrame:
    """Corpus-level n-gram frequency table → [gram, count], top_k by
    count (ties broken by gram).  Same wordcount shape as vocabulary —
    map-side partial counting keeps the shuffle at O(distinct grams per
    partition)."""
    grams = idf.select(F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
    agg = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("count"))
    return (
        agg.where(F.col("count") >= min_count)
        .orderBy(F.col("count").desc(), F.col("gram").asc())
        .limit(top_k)
    )


def normalize_text(
    idf: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    collapse_whitespace: bool = True,
    strip_control: bool = True,
    output_col: str | None = None,
) -> DataFrame:
    """Named text normalization (the preprocessing every text operator
    here applies inline): lowercase, strip C0/C1 control characters,
    collapse whitespace runs, trim.  Pure expressions, scan speed."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    if strip_control:
        t = F.regexp_replace(t, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    if collapse_whitespace:
        t = F.regexp_replace(F.trim(t), _WS, " ")
    out = output_col or text_col
    return idf.select(
        *[c for c in idf.columns if c != out], t.alias(out)
    )


def boilerplate_removal(
    idf: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_doc_count: int | None = None,
    min_doc_frac: float | None = None,
    total_docs: int | None = None,
) -> DataFrame:
    """Cross-document line dedup (RefinedWeb/CCNet-style boilerplate
    removal): delete every line whose normalized form (lower+trim)
    appears in at least ``min_doc_count`` distinct documents — or in at
    least ``min_doc_frac`` of the corpus — and reassemble each document
    with line order preserved.

    Returns [id_col, text (cleaned), n_lines, removed_lines, kept_chars,
    clean_md5] where clean_md5 fingerprints the reassembled text so a
    differential oracle can assert byte-exact reassembly without
    shipping the full strings.

    Scale design (100 TB posture):
    - the line-frequency aggregate is wordcount-shaped (map-side partial
      count-distinct per key, shuffle O(distinct lines per partition));
    - the frequent-line set — only lines above the threshold, i.e. the
      boilerplate itself — is SMALL by construction (Zipf head), so it
      rides back as a **broadcast** left join: the corpus-sized line
      table never shuffles for the membership test;
    - reassembly is one doc-keyed aggregation (array_sort over the
      per-doc line structs, bounded by document size).
    Blank lines are never counted or removed.  A document whose every
    line is boilerplate still yields a row (empty text), unlike a naive
    filter-then-group which would drop it.
    """
    if (min_doc_count is None) == (min_doc_frac is None):
        raise ValueError("pass exactly one of min_doc_count / min_doc_frac")
    if min_doc_frac is not None:
        total = total_docs if total_docs is not None else idf.count()
        threshold = float(min_doc_frac) * float(total)
    else:
        threshold = float(min_doc_count)

    other = [c for c in idf.columns if c not in (text_col, id_col)]
    lines = idf.select(
        F.col(id_col).alias("__id__"),
        *other,
        F.posexplode(F.split(F.col(text_col), sep)).alias("__pos__", "__line__"),
    ).withColumn("__k__", F.lower(F.trim(F.col("__line__"))))

    freq = (
        lines.where(F.col("__k__") != "")
        .groupBy("__k__")
        .agg(F.count_distinct("__id__").alias("__df__"))
        .where(F.col("__df__") >= F.lit(threshold))
        .select("__k__", F.lit(True).alias("__bad__"))
    )

    joined = lines.join(F.broadcast(freq), "__k__", "left")
    kept_struct = F.when(
        F.col("__bad__").isNull(), F.struct("__pos__", "__line__")
    )
    clean = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(kept_struct)), lambda s: s["__line__"]
        ),
        sep,
    )
    return (
        joined.groupBy(F.col("__id__").alias(id_col), *other)
        .agg(
            clean.alias(text_col),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("__bad__").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("removed_lines"),
        )
        .withColumn("kept_chars", F.length(text_col).cast("long"))
        .withColumn("clean_md5", F.md5(F.col(text_col)))
    )


def chunk_documents(
    idf: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split documents into fixed-size overlapping character chunks —
    the RAG / context-window preparation step: [id, chunk_id, chunk_start,
    chunk_text, n_chunks] with chunk_start 1-based, stride =
    chunk_chars - overlap, and the final chunk allowed to run short.

    Pure expressions (sequence → transform → substr → posexplode): the
    chunk fan-out happens inside the scan projection with whole-stage
    codegen, no UDF and no shuffle — at 100 TB this op is scan-bound by
    construction.  Chunk count per doc is ceil((len - overlap)/stride)
    (min 1), so chunks tile the document with exactly ``overlap``
    characters shared between neighbours."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap
    t = F.col(text_col)
    n_chunks = F.greatest(
        F.ceil((F.length(t) - F.lit(overlap)) / F.lit(stride)), F.lit(1)
    ).cast("int")
    starts = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        starts, lambda i: t.substr(i * stride + 1, F.lit(chunk_chars))
    )
    other = [c for c in idf.columns if c not in (text_col, id_col)]
    return idf.select(
        F.col(id_col),
        *other,
        n_chunks.alias("n_chunks"),
        F.posexplode(chunks).alias("chunk_id", "chunk_text"),
    ).select(
        id_col,
        *other,
        "chunk_id",
        (F.col("chunk_id") * stride + 1).cast("long").alias("chunk_start"),
        "chunk_text",
        "n_chunks",
    )


def zipf_fit(
    idf: DataFrame,
    text_col: str = "text",
    top_k: int = 200,
    min_count: int = 2,
) -> DataFrame:
    """Zipf's-law diagnostic: OLS fit of ln(count) on ln(rank) over the
    top-k vocabulary — natural language sits near slope -1; a corpus
    whose slope is far off (too flat: template spam / random tokens;
    too steep: tiny effective vocabulary) fails the smell test before
    any model sees it.

    Composes vocabulary() (wordcount shape) with a closed-form
    regression over the TOP-K frame (bounded: the windows and moments
    run on <= top_k rows).  Returns one row
    [n_tokens, slope, intercept, r2], all closed-form expressible, so
    the oracle replays the identical algebra.
    """
    from pyspark.sql import Window

    vocab = vocabulary(idf, text_col, top_k=top_k, min_count=min_count)
    w = Window.partitionBy().orderBy(F.col("count").desc(), F.col("token").asc())
    pts = vocab.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("count").cast("double")).alias("y"),
    )
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("x"), F.sum("y")
    sxx, sxy, syy = (
        F.sum(F.col("x") * F.col("x")),
        F.sum(F.col("x") * F.col("y")),
        F.sum(F.col("y") * F.col("y")),
    )
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    r2 = (
        (n * sxy - sx * sy)
        * (n * sxy - sx * sy)
        / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    )
    return pts.agg(
        n.cast("long").alias("n_tokens"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )
