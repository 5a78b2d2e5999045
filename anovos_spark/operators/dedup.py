"""Deduplication for training-data pipelines: exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Scale design (the point of each variant):
- exact: one hash-groupBy shuffle on a 32-byte fingerprint — O(N).
- ngram_jaccard: exact pairwise Jaccard but only over pairs that share a
  shingle (explode + self-join on shingle key) — avoids the O(N²) cross
  join; still quadratic inside hot shingles, so it's the verify stage, not
  the candidate stage, at 100 TB.
- minhash_lsh: the scale path — shingles → K hash permutations → minhash
  signature → band buckets → candidates only within equal buckets, then
  exact-verify.  All joins are equi-joins on small keys; shuffle volume is
  O(N·bands), independent of pair count.
- simhash: 64-bit signature via per-bit token-hash majority; near-dup =
  hamming distance ≤ k.  Candidate generation by exact signature match on
  rotated bands would follow the same LSH pattern.

Hashing is md5-derived (F.conv on hex chunks) rather than xxhash64 so the
DuckDB oracle can reproduce it bit-for-bit; swap HASH_FN to xxhash64 for
raw speed in production (documented divergence, same algorithm shape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from anovos_spark.operators.text import _WS

# 2^31-1, a Mersenne prime — classic universal-hash modulus
_P = 2147483647


def _norm(col: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(col)), _WS, " ")


def _spread(df: DataFrame) -> DataFrame:
    """Fan a narrow scan out to all cores before compute-heavy per-row work
    (shingling/hashing): a document corpus that arrives as one parquet
    row-group would otherwise pin the whole explode stage to one task.
    No-op at real scale where the scan already has >= cores partitions.
    Uses the Catalyst size estimate (fan_out) — no RDD conversion/job."""
    from anovos_spark.core.utils import fan_out

    return fan_out(df)


def _shingles(col: Column, n: int, mode: str = "word") -> Column:
    """Distinct n-gram shingle set of normalized text — one expression,
    no UDF.

    mode='word' (default): token n-grams — the standard for document-level
    dedup; document frequencies stay low even on boilerplate-heavy corpora,
    which is what keeps prefix filtering and LSH candidate counts bounded.
    mode='char': character n-grams (finer, for short strings).

    Built from n−1 zip_with joins of SHIFTED arrays, not a per-position
    lambda: expressions inside a higher-order lambda re-evaluate per
    element, so substr(i)/slice(toks, i) re-normalized or re-split the
    whole document once per position — O(len²), a hang on 100k-token
    docs (adversarial-text probe).  Documents shorter than n grams keep
    the historical semantics: ONE shingle = the whole (truncated)
    document — zip_with pads the short side with null, and the lambda
    falls back to the accumulated prefix."""
    s = _norm(col)
    if mode == "char":
        units, sep = F.split(s, ""), None
        m = F.greatest(F.length(s) - n + 1, F.lit(1))
    else:
        units, sep = F.split(s, " "), " "
        m = F.greatest(F.size(units) - n + 1, F.lit(1))
    grams = F.slice(units, 1, m)
    for j in range(1, n):
        nxt = F.slice(units, F.lit(1 + j), m)
        if sep is None:
            join = lambda a, b: F.when(b.isNull(), a).otherwise(F.concat(a, b))
        else:
            join = lambda a, b: F.when(b.isNull(), a).otherwise(
                F.concat(a, F.lit(sep), b)
            )
        grams = F.zip_with(grams, nxt, join)
    return F.array_distinct(grams)


def exact_dedup(
    idf: DataFrame, text_col: str = "text", id_col: str = "doc_id", treatment: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Exact duplicate groups by normalized-text md5.

    stats: [fingerprint, n_docs, keep_id] for groups with n_docs > 1
    (keep_id = min id — the deterministic survivor).  treatment=True returns
    the frame with only survivors + singletons."""
    from anovos_spark.operators.text import document_fingerprint

    fp = document_fingerprint(idf, text_col, id_col)
    groups = fp.groupBy("fingerprint").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id")
    )
    stats = groups.where(F.col("n_docs") > 1)
    odf = idf
    if treatment:
        keep = fp.join(groups, "fingerprint").where(F.col(id_col) == F.col("keep_id"))
        odf = idf.join(keep.select(id_col), id_col, "left_semi")
    return odf, stats


def ngram_jaccard_pairs(
    idf: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.4,
    eager: bool = True,
) -> DataFrame:
    """EXACT near-duplicate pairs by character-n-gram Jaccard ≥ threshold,
    via prefix filtering (PPJoin-style).

    [id_a, id_b, jaccard] with id_a < id_b.

    Scale shape: a naive explode+self-join is Σ_g df(g)² pairs — it melts
    down when shingles are hot (small vocab, boilerplate).  Prefix filter:
    sort each doc's shingles by global document frequency ascending; any
    pair with Jaccard ≥ t MUST share a shingle in the first
    |A| − ⌈t·|A|⌉ + 1 rarest shingles (pigeonhole), so candidates are
    generated only from prefixes — hot shingles never fan out.  The join
    also applies PPJoin's POSITIONAL filter: a gram matched at sorted
    positions (pa, pb) bounds the overlap by 1 + min(|A|−pa, |B|−pb),
    and J ≥ t needs overlap ≥ t·(|A|+|B|)/(1+t); rows failing the bound
    are dropped IN the join.  Recall is intact because for a true pair
    the FIRST shared gram (in the global df-asc order) has no shared
    gram before it on either side, so its bound is tight-side valid —
    that row always survives (Xiao et al., PPJoin, WWW'08).  Measured at
    sf1 it cuts candidates 3.2× (1.66M → 521k for 19k true pairs) and
    the verify stage cost ~40%.  Candidates are then verified exactly
    with array_intersect on the full gram sets.  Result is provably
    identical to the brute-force join.
    """
    from pyspark.sql import Window

    grams = _shingles(F.col(text_col), n)
    # hash each shingle to a 64-bit long IMMEDIATELY after the (distinct)
    # gram set is formed: every downstream movement — the dfreq groupBy,
    # the prefix join, the candidate equi-join, and both verify-side
    # arrays — then shuffles and compares fixed-width longs instead of
    # strings.  Equal grams always hash equal, so candidate recall and
    # the pigeonhole/positional proofs are untouched; a 64-bit collision
    # can only perturb the verified intersection COUNT, at odds bounded
    # by pairs·|union|²/2^64 (~1e-10 at sf1, ~1e-4 at 1e9 docs — and even
    # then only decisive within 1/|union| of the threshold).  Verify is
    # ~30% faster and the cached frame is smaller.
    docs = _spread(idf).select(
        F.col(id_col).alias("id"), grams.alias("sgrams")
    ).select(
        "id",
        F.transform("sgrams", lambda g: F.xxhash64(g)).alias("grams"),
        F.size("sgrams").alias("n_grams"),
    )
    # persist the shingled frame: it feeds 4 downstream plans (explode, df,
    # and both verify sides) — without the cache every plan re-runs AND
    # re-codegens the large shingling expression
    docs.persist()
    exploded = docs.select("id", "n_grams", F.explode("grams").alias("g"))
    # document frequency as a WINDOW count over g — one exchange attaches
    # df to every exploded row, where the old groupBy(g) + equi-join shape
    # shuffled the exploded frame on g twice (once into the aggregate,
    # once into the join) and sorted both join sides.  Identical df values
    # (count of rows per gram), so prefix selection and recall proofs are
    # untouched.
    w_df = Window.partitionBy("g")
    w = Window.partitionBy("id").orderBy(F.col("df").asc(), F.col("g").asc())
    prefix_len = F.col("n_grams") - F.ceil(F.lit(threshold) * F.col("n_grams")) + 1
    prefixes = (
        exploded.withColumn("df", F.count(F.lit(1)).over(w_df))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= prefix_len)
        .select("id", "g", "n_grams", "rn")
    )
    a, b = prefixes.alias("a"), prefixes.alias("b")
    # size filter (PPJoin): J(A,B) ≥ t requires t·|B| ≤ |A| ≤ |B|/t —
    # prunes candidates inside the shingle join before the distinct
    size_ok = (
        (F.col("a.n_grams") >= F.lit(threshold) * F.col("b.n_grams"))
        & (F.col("b.n_grams") >= F.lit(threshold) * F.col("a.n_grams"))
    )
    # positional filter: overlap ≤ 1 + min(|A|−pa, |B|−pb); compare in
    # product form (no ceil) with 1e-9 slack so float representation of
    # the threshold can never drop an exactly-at-threshold true pair
    overlap_bound = F.lit(1) + F.least(
        F.col("a.n_grams") - F.col("a.rn"), F.col("b.n_grams") - F.col("b.rn")
    )
    pos_ok = overlap_bound * F.lit(1.0 + threshold) >= (
        F.lit(threshold) * (F.col("a.n_grams") + F.col("b.n_grams")) - F.lit(1e-9)
    )
    candidates = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.id") < F.col("b.id"))
            & size_ok
            & pos_ok,
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    da = docs.select(F.col("id").alias("id_a"), F.col("grams").alias("ga"), F.col("n_grams").alias("na"))
    db = docs.select(F.col("id").alias("id_b"), F.col("grams").alias("gb"), F.col("n_grams").alias("nb"))
    verified = (
        candidates.join(da, "id_a")
        .join(db, "id_b")
        .withColumn("common", F.size(F.array_intersect("ga", "gb")))
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6),
        )
        .where(F.col("jaccard") >= threshold)
    )
    out = verified.select("id_a", "id_b", "jaccard")
    return _finish(out, docs, eager)


def _finish(result: DataFrame, cached: DataFrame, eager: bool) -> DataFrame:
    """Release the shingle cache without losing its benefit.

    eager=True (default): materialize the (small) pair result via
    localCheckpoint — one computation, lineage truncated — then unpersist
    the large cached shingle frame so repeated calls in a long-lived
    session don't accrete executor storage.  The checkpointed result's
    blocks are released by the ContextCleaner when the returned frame is
    garbage-collected.  eager=False returns the fully lazy plan and leaves
    the cache alive (caller manages unpersist)."""
    if not eager:
        return result
    out = result.localCheckpoint(eager=True)
    cached.unpersist()
    return out


def _hash32(col: Column) -> Column:
    """Deterministic 32-bit int from a string: first 8 hex chars of md5.
    Reproducible in DuckDB (same md5, same hex→int)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _hash60(col: Column) -> Column:
    """Deterministic 60-bit int from a string: first 15 hex chars of md5.
    15 chars is the widest md5 prefix whose value always fits a SIGNED
    64-bit long (16 chars can exceed 2^63 and null out of the cast on
    the Spark side, overflow on the DuckDB side) — so the same
    substr+hex→int replays bit-for-bit in the oracle."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _cap_buckets(rows: DataFrame, keys, cap: int):
    """Skew guard for banded candidate joins: split ``rows`` into
    (small, over) by bucket size, where a bucket is one ``keys`` group.

    A degenerate corpus (N identical documents) puts N members into one
    bucket, and a self-join on that key emits N²/2 rows FROM A SINGLE
    TASK — the one shape AQE skew handling can't fix, because the blowup
    is the join result, not the input partition.  Buckets over ``cap``
    are diverted to a spanning-STAR fallback at the call site (two-level
    when a homogeneity group_col is given: same connectivity for the
    components consumer, O(N log N) sort instead of O(N²) pairs).

    HYBRID split, one mechanism per side (both compute the identical
    groupBy-count-per-key split — only the physical shape differs):

    - The SMALL side attaches the bucket size as a WINDOW count over
      ``keys`` and filters on it.  The window's exchange hash-partitions
      ``rows`` by exactly the keys every call site's follow-up candidate
      self-join equi-joins on, so that join consumes the partitioning
      instead of re-shuffling (interleaved A/B: ngram −43%, simhash
      −64%, fuzzy −35%, ann_lsh −36% vs the broadcast shape).  The
      window sorts only by the partition keys (no ORDER BY), so an
      oversized bucket costs O(N log N) locally, never O(N²).
    - The OVER side is a semi-join against the broadcast of oversized
      keys (bounded by N/cap, in practice a handful) — NOT a window
      filter.  The reason is AQE empty-relation propagation: when no
      bucket exceeds the cap (every non-degenerate corpus), the
      broadcast side is empty at runtime and AQE collapses the whole
      ``over`` subtree — and with it every _chain_pairs window pass —
      to an empty LocalTableScan.  A window-filtered ``over`` side is
      never provably empty, so each chain window (partitioned by
      keys+group_col, i.e. NOT the small side's partitioning) re-ran
      the full upstream candidate subtree: dedup_minhash_lsh regressed
      5.4 → 50.6 s at sf1 (the 64-min signature aggregate is the most
      expensive subtree to recompute) until this split was made hybrid."""
    klist = list(keys)
    w_count = F.count(F.lit(1)).over(Window.partitionBy(*klist))
    small = (
        rows.withColumn("__bsz__", w_count)
        .where(F.col("__bsz__") <= int(cap))
        .drop("__bsz__")
    )
    big = F.broadcast(
        rows.groupBy(*klist)
        .agg(F.count(F.lit(1)).alias("__bsz__"))
        .where(F.col("__bsz__") > int(cap))
        .select(*klist)
    )
    return small, rows.join(big, klist, "left_semi")


def _chain_pairs(over: DataFrame, keys, order_col: str, payload=(), group_col=None):
    """Spanning-STAR candidates inside oversized buckets.  Emits
    [id_a, id_b(, payload_a, payload_b…)] with id_a < id_b.  A star
    touches every member, so downstream connected components see the
    same groups as the all-pairs join would, and its diameter is 2 —
    near_dup_components' min-label propagation converges in one round
    (a consecutive-id CHAIN was tried first and is a trap: diameter N
    exceeds a fixed propagation round bound, silently fragmenting the
    component — pinned by the degenerate-corpus tests).

    Star edges still pass through the call site's EXACT verification,
    and in a MIXED oversized bucket (members not all near-identical) a
    raw star through the global min-id center can fail verification
    where suppressed all-pairs edges would have passed — fragmenting
    true components.  With ``group_col`` (an exact content/homogeneity
    key: full minhash signature hash, full simhash value, the string
    itself) the star is TWO-LEVEL: one star per homogeneous sub-group
    (identical keys ⇒ near-identical content ⇒ star edges verify
    together, exactly so for bit-identical documents) plus one star
    over the sub-group min-id representatives.  Total edges stay N−1
    per bucket; only cross-sub-group recall remains best-effort (a true
    pair between two sub-groups is found iff the REPRESENTATIVE pair
    verifies — near-certain when sub-groups are signature-homogeneous,
    and any such pair can still surface through the other, un-capped
    bands).  Without group_col the raw single star is used."""
    from pyspark.sql.window import Window

    def star(df, part_keys):
        w = Window.partitionBy(*part_keys).orderBy(order_col)
        sel = [
            F.first(order_col).over(w).alias("id_a"),
            F.col(order_col).alias("id_b"),
        ]
        for p in payload:
            sel.append(F.first(p).over(w).alias(f"{p}_a"))
            sel.append(F.col(p).alias(f"{p}_b"))
        # strict < also drops the center's self-link and duplicate ids
        # (e.g. a string meeting one variant via two deletion paths)
        return df.select(*sel).where(F.col("id_a") < F.col("id_b"))

    if group_col is None:
        return star(over, list(keys))
    w_sub = Window.partitionBy(*keys, group_col).orderBy(order_col)
    intra = star(over, list(keys) + [group_col])
    reps = (
        over.withColumn("__rn__", F.row_number().over(w_sub))
        .where(F.col("__rn__") == 1)
        .drop("__rn__")
    )
    return intra.unionByName(star(reps, list(keys)))


def _minhash_sig_agg(exploded: DataFrame, num_hashes: int) -> DataFrame:
    """Signature aggregation over an exploded (id, g) gram frame: per
    permutation i, min of (hash32(g)·(2i+1) + i·12582917) mod P.  Kept as
    a codegen'd explode+groupBy — a per-row higher-order-function
    formulation (array_min over transform per permutation) measured ~3×
    SLOWER at 64 permutations, because lambda bodies evaluate interpreted
    per element while the md5-based _hash32 here runs through whole-stage
    codegen once per gram row."""
    x = _hash32(F.col("g"))
    mins = [
        F.min((x * F.lit(2 * i + 1) + F.lit(i * 12582917)) % _P).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = exploded.groupBy("id").agg(*mins)
    return sig.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature")
    )


def minhash_signatures(
    idf: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """MinHash signatures: h_i(x) = (a_i·x + b_i) mod P over shingle hashes,
    minimum per permutation.  One explode + one groupBy; signature is an
    array<long> of length num_hashes."""
    grams = _shingles(F.col(text_col), n)
    exploded = _spread(idf).select(
        F.col(id_col).alias("id"), F.explode(grams).alias("g")
    )
    return _minhash_sig_agg(exploded, num_hashes)


def minhash_lsh_pairs(
    idf: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.4,
    eager: bool = True,
    bucket_cap: int | None = 10_000,
) -> DataFrame:
    """LSH candidate pairs + exact Jaccard verification.

    Bands of r = num_hashes/bands signature values are hashed to buckets;
    docs sharing any band bucket become candidates (equi-join — the LSH
    trick that keeps this O(N) in shuffle volume); candidates are then
    verified with exact n-gram Jaccard.  [id_a, id_b, jaccard].

    Skew guard: a band bucket larger than ``bucket_cap`` (a degenerate
    corpus of N identical docs fills one bucket with all N) would emit
    N²/2 candidates from one join task.  Such buckets instead emit a
    two-level spanning STAR keyed on the full-signature hash (see
    _chain_pairs): identical-content connectivity is preserved exactly,
    cross-sub-group pairs inside the oversized bucket are found via
    representatives (best-effort; other bands still cover them), and
    the pair LISTING is a connected subset, not exhaustive.
    bucket_cap=None restores unguarded all-pairs."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    # Two deliberate passes over the corpus text, NOT one: the signature
    # side is explode + a 64-min hash aggregate whose partial (map-side)
    # aggregation shrinks the shuffle to one 64-long row per doc, and
    # the verify side is a NARROW transform projection (no shuffle at
    # all).  A fused single-pass formulation (one groupBy emitting the
    # minima plus collect_list(gram) arrays) was built and measured this
    # round: collect_list has no partial aggregation, so it shuffles
    # every gram row — interleaved same-box A/B at sf0.1 showed 6.7 s →
    # 12.6 s (min of 4), and at scale the extra full-gram shuffle costs
    # more than the second column scan it saves.  Kept two-pass.
    sig = minhash_signatures(idf, text_col, id_col, n, num_hashes)
    band_rows = sig.select(
        "id",
        # full-signature hash: the homogeneity key for the two-level
        # star fallback in oversized buckets.  64-bit xxhash64 (8 bytes
        # per row) — a 32-bit key would merge two distinct-content
        # sub-groups at ~2^-32 per pair, re-fragmenting identical
        # members inside the capped bucket, the exact failure the
        # two-level star exists to prevent
        F.xxhash64("signature").alias("__hk__"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        # 8-byte bucket key (xxhash64 of the band's r
                        # signature slots) instead of the concat_ws
                        # string: equal bands hash equal, a collision
                        # only ADDS a candidate the exact verify kills
                        F.xxhash64(
                            *[F.col("signature")[b * r + j] for j in range(r)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(
        "id", "__hk__", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    chain = None
    if bucket_cap is not None:
        band_rows, over = _cap_buckets(band_rows, ["band", "bucket"], bucket_cap)
        chain = _chain_pairs(over, ["band", "bucket"], "id", group_col="__hk__")
    a, b = band_rows.alias("a"), band_rows.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    if chain is not None:
        candidates = candidates.unionByName(chain)
    candidates = candidates.distinct()
    # exact verification on CANDIDATES ONLY (array_intersect per pair) —
    # cost O(|candidates|), never the all-pairs join.  Gram sets ride as
    # 64-bit longs (same hashing rationale and collision bound as
    # ngram_jaccard_pairs): only fixed-width values shuffle to the
    # verify joins
    grams = _shingles(F.col(text_col), n)
    docs = _spread(idf).select(
        F.col(id_col).alias("id"), grams.alias("sgrams")
    ).select(
        "id",
        F.transform("sgrams", lambda g: F.xxhash64(g)).alias("grams"),
        F.size("sgrams").alias("n_grams"),
    )
    docs.persist()
    da = docs.select(F.col("id").alias("id_a"), F.col("grams").alias("ga"), F.col("n_grams").alias("na"))
    db = docs.select(F.col("id").alias("id_b"), F.col("grams").alias("gb"), F.col("n_grams").alias("nb"))
    out = (
        candidates.join(da, "id_a")
        .join(db, "id_b")
        .withColumn("common", F.size(F.array_intersect("ga", "gb")))
        .withColumn(
            "jaccard",
            F.round(F.col("common") / (F.col("na") + F.col("nb") - F.col("common")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return _finish(out, docs, eager)


def near_dup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    small_graph_threshold: int = 2_000_000,
) -> DataFrame:
    """Connected components over near-duplicate pairs → [id, component]
    with component = min doc id in the group (the canonical survivor).

    This is the step every dedup pipeline needs after candidate
    generation: pair lists don't dedup anything until they're grouped.

    Distributed min-label propagation with ADAPTIVE pointer doubling:
    every node starts labeled with itself; each round joins labels
    across edges (both directions) and keeps the per-node minimum.
    Typical near-dup graphs (content clusters, fuzzy-match stars) have
    diameter 2-4, so the first ``plain_rounds`` rounds run the cheap
    one-hop step alone (one shuffle + one checkpoint per round).  Only
    if the labels have not reached a fixpoint by then does the loop
    engage pointer doubling — shortcutting each label to its label's
    label (label(label(id))) every round, which halves every node's
    distance to its component minimum and converges in O(log diameter)
    further rounds.  Doubling costs an extra self-join plus a second
    eager localCheckpoint per round, which is pure overhead on
    shallow graphs; it only pays on long-chain graphs such as the
    geospatial dense-cell path's 8-neighbor grids, whose diameter can
    reach the cell count (a snake-shaped dense region) and which
    one-hop propagation would never close within any fixed round
    bound.  Lineage is truncated per round (localCheckpoint);
    iteration stops at the first fixpoint.  Both the hop and the
    doubling step only ever DECREASE a node's label and never below
    the component minimum, so the fixpoint is exactly min-id labeling.

    Small-graph fast path: the EDGE LIST here is post-detection output —
    verified near-dup pairs — which is orders of magnitude smaller than
    the corpus that produced it (19k pairs from 50k docs at sf1; pairs
    ≪ N is the whole point of candidate filtering).  When the doubled
    edge count is at most ``small_graph_threshold`` (default 2M rows ≈
    32 MB of longs — the same driver-memory class as a broadcast-join
    side), the closure runs as an exact driver-side union-find in one
    collect of the already-checkpointed edges, skipping the per-round
    join + checkpoint cycle entirely.  Above the threshold (billions of
    pairs at 100 TB-scale dup rates) the distributed propagation below
    is the path.  Both produce the identical min-id labeling; pass
    ``small_graph_threshold=0`` to force the distributed path.

    Raises RuntimeError if the labels have not reached a fixpoint after
    ``max_iter`` rounds — a silent non-convergence would split one
    component into several, which downstream dedup/clustering would
    misread as distinct groups.  With doubling engaged from round 4,
    the default 20 rounds covers diameters up to ~2^16; pass a larger
    max_iter for adversarial graphs rather than relying on the partial
    result.  (The union-find path is exact and never iterates, so the
    bound only governs the distributed path.)  Raises ValueError for
    max_iter < 1: a zero-round budget can never certify convergence,
    and returning the identity labeling silently would be exactly the
    non-converged output the fail-fast contract forbids."""
    if max_iter < 1:
        raise ValueError(
            f"near_dup_components requires max_iter >= 1, got {max_iter}"
        )
    plain_rounds = 3
    # materialize the UNDOUBLED pair projection once: half the rows/bytes
    # of the old doubled-and-distinct edge materialization, one fewer
    # exchange (no distinct — union-find is insensitive to duplicate or
    # repeated edges, and the distributed path re-distincts lazily below).
    # The path decision (2·n_pairs vs threshold) and both consumers read
    # from this one checkpoint.
    p_edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).localCheckpoint(eager=True)
    n_pairs = p_edges.count()
    n_edges = 2 * n_pairs
    if n_edges == 0:
        return p_edges.select(
            F.col("src").alias("id"), F.col("src").alias("component")
        )
    if n_edges <= small_graph_threshold:
        # bounded driver-side union-find over the checkpointed pairs —
        # single-direction edges suffice (union(a,b) is symmetric), so
        # the driver pulls HALF the bytes the old doubled list carried
        # (collect size explicitly capped by the threshold check above)
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        # Arrow toPandas, not collect(): 2M two-long rows are ~32 MB as
        # columnar arrays vs ~10× that as driver-side Row objects.  The
        # union-find loop streams the two columns directly (no
        # intermediate tuple list — that list alone was another ~120 MB
        # of tuple headers at the threshold), and the result goes back
        # through createDataFrame(pandas) so Arrow carries both
        # directions instead of pickling a list of tuples.
        import pandas as pd

        pdf = p_edges.toPandas()
        src_vals = pdf["src"].tolist()
        dst_vals = pdf["dst"].tolist()
        del pdf
        for a, b in zip(src_vals, dst_vals):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        # undoubled edges: nodes appear in either slot
        nodes = set(src_vals) | set(dst_vals)
        del src_vals, dst_vals
        comp_min: dict = {}
        for node in nodes:
            r = find(node)
            if r not in comp_min or node < comp_min[r]:
                comp_min[r] = node
        node_list = list(nodes)
        out_pdf = pd.DataFrame(
            {
                "id": node_list,
                "component": [comp_min[find(n)] for n in node_list],
            }
        )
        id_type = p_edges.schema["src"].dataType
        from pyspark.sql.types import StructField, StructType

        return p_edges.sparkSession.createDataFrame(
            out_pdf,
            StructType(
                [StructField("id", id_type), StructField("component", id_type)]
            ),
        )
    # distributed path: the per-round joins iterate over the DOUBLED,
    # deduplicated edge list — materialize it once from the (cheap,
    # already-checkpointed) pair projection
    edges = (
        p_edges.unionByName(
            p_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    from pyspark.sql import Observation

    changed = 1
    id_type = edges.schema["src"].dataType
    for round_no in range(max_iter):
        # round 0 with budget to spare never needs a convergence answer
        # (a nonempty non-self-loop edge set always changes a label) —
        # see the skip below; don't attach a metric at all in that case.
        need_obs = not (round_no == 0 and max_iter > 1)
        obs = Observation(f"__ndc_changed_{round_no}__") if need_obs else None
        # neighbor labels: for each edge (src,dst), dst's current label
        neighbor = (
            edges.join(labels.withColumnRenamed("id", "dst"), "dst")
            .select(F.col("src").alias("id"), "component")
        )
        # The PRE-round label rides the union as __o__ (labels has exactly
        # one row per id, so max(__o__) recovers it through the min-agg) —
        # the convergence count then rides the checkpoint materialization
        # itself as an observed metric (zero extra jobs), where the old
        # shape paid a per-round new⋈old shuffle join + count job.
        hop = (
            labels.withColumn("__o__", F.col("component"))
            .unionByName(
                neighbor.withColumn("__o__", F.lit(None).cast(id_type))
            )
            .groupBy("id")
            .agg(
                F.min("component").alias("component"),
                F.max("__o__").alias("__o__"),
            )
        )
        if round_no < plain_rounds:
            # shallow-graph fast path: no self-join, no second
            # checkpoint — one-hop alone closes diameter-(round+1)
            # graphs, which covers typical near-dup clusters
            change_pred = F.col("component") != F.col("__o__")
            if obs is not None:
                hop = hop.observe(
                    obs, F.sum(change_pred.cast("long")).alias("n")
                )
            # checkpoint (still) truncates the union's lineage: bounds
            # plan growth and sidesteps a Catalyst constraint-rewrite
            # defect on self-joined unions
            hop = hop.localCheckpoint(eager=True)
            new_labels = hop
        else:
            # the hop agg still checkpoints first (lineage truncation +
            # the Catalyst self-joined-union workaround) — its own
            # materialization needs no metric
            hop = hop.localCheckpoint(eager=True)
            # pointer doubling: label ← label(label).  Every component
            # value is itself a node id present in `hop`, so the join
            # is total.  The pre-double label rides as __h__ so the
            # convergence test ((double changed) OR (hop changed)) is
            # an observed metric on the double's own checkpoint
            # materialization.  Equivalent to the old new⋈labels
            # comparison: min-propagation is pointwise non-increasing,
            # so new == labels iff hop == labels and double(hop) == hop.
            change_pred = (F.col("component") != F.col("__h__")) | (
                F.col("__h__") != F.col("__o__")
            )
            new_labels = (
                hop.alias("a")
                .join(
                    hop.select(
                        F.col("id").alias("component"),
                        F.col("component").alias("__c2__"),
                    ),
                    "component",
                )
                .select(
                    "id",
                    F.col("__c2__").alias("component"),
                    F.col("a.component").alias("__h__"),
                    "__o__",
                )
            )
            if obs is not None:
                new_labels = new_labels.observe(
                    obs, F.sum(change_pred.cast("long")).alias("n")
                )
            new_labels = new_labels.localCheckpoint(eager=True)
        if obs is None:
            # a nonempty edge set always changes some label in round 0
            # (for any edge (a,b) with a<b, node b drops to ≤a), so the
            # convergence count would be a guaranteed "changed" — EXCEPT
            # when the distinct'd edge set is all self-loops (src == dst),
            # where round 0 is already the fixpoint.  When round 0 is
            # also the LAST permitted round (max_iter == 1) the real
            # count must run (observed above), or an already-converged
            # labeling would be reported as non-convergence.
            changed = 1
        else:
            # the eager checkpoint above already ran the job; the
            # observed sum is the number of ids whose label moved
            changed = int(obs.get["n"] or 0)
        labels = new_labels.select("id", "component")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"near_dup_components did not converge in {max_iter} rounds; "
            "raise max_iter (pointer doubling needs ~log2(diameter) rounds)"
        )
    return labels


def simhash_signatures(
    idf: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 60
) -> DataFrame:
    """SimHash: per-bit majority vote over token hashes → [id, simhash].

    A document's signature depends only on its own tokens, so this is a
    pure per-row MAP — no explode, no groupBy, ZERO shuffle (the r7
    explode+60-vote-sums version shuffled 60 longs per doc and paid the
    token-count row blowup; this one is 2.5× faster at sf0.1 and scan-
    bound at any scale).  Per row: hash each token once
    (`transform`), then one `aggregate` pass over the hash array
    accumulating a `bits`-slot count vector via `zip_with`; bit b of the
    signature is set iff more than half the tokens have bit b set
    (2·count > n — identical to the sign of the classic ±1 vote sum,
    ties → 0).  md5-derived token hash for oracle parity: 60 bits
    (15 hex chars — the widest md5 prefix that always fits a signed
    long on both engines).  60-bit signatures matter at scale: the
    banded candidate join cuts the signature into max_distance+1
    segments, and segment WIDTH bounds how many distinct bucket values
    exist — 60/4 = 15-bit segments give 32k values per band (vs 256 for
    a 32-bit signature), so bucket sizes (and the quadratic per-bucket
    pair blowup) grow 128× slower with corpus size.  Zero-token and
    null-text docs are absent from the output (the explode-era
    contract)."""
    from anovos_spark.operators.text import tokens

    toks = tokens(F.lower(F.col(text_col)))
    hash_fn = _hash60 if bits > 32 else _hash32
    hashed = _spread(idf).select(
        F.col(id_col).alias("id"),
        F.transform(toks, lambda t: hash_fn(t)).alias("__hs__"),
    ).where(F.size("__hs__") > 0)
    n = F.size("__hs__")
    counts = F.aggregate(
        F.col("__hs__"),
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.shiftright(h, i).bitwiseAND(F.lit(1)).cast("long")
                    for i in range(bits)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    weights = F.array(*[F.lit(2**i).cast("long") for i in range(bits)])
    sim = F.aggregate(
        F.zip_with(
            counts,
            weights,
            lambda c, w: F.when(c * 2 > n, w).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, b: a + b,
    )
    return hashed.select("id", sim.alias("simhash"))


def simhash_pairs(
    idf: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 60,
    max_distance: int = 3,
    bucket_cap: int | None = 10_000,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_distance.
    [id_a, id_b, hamming].  Segment buckets larger than ``bucket_cap``
    (degenerate identical-content corpora) emit a two-level spanning STAR
    keyed on the full simhash instead of all pairs — same skew guard and
    connectivity contract as minhash_lsh_pairs (hamming-0 sub-groups
    connect exactly; cross-sub-group recall is representative-mediated).

    Candidate generation bands the signature into max_distance+1 disjoint
    bit segments; by pigeonhole, any pair within hamming max_distance
    agrees EXACTLY on at least one segment, so joining on
    (band_id, segment_value) has 100% recall — and it is a plain
    hash-partitionable equi-join (the earlier OR-of-halves predicate
    planned a BroadcastNestedLoopJoin, O(N²) comparisons, and with
    max_distance>=2 could also split the differing bits across both
    halves and silently drop true pairs).  Shuffle volume is
    O(N·(max_distance+1)); verification is exact bit_count on the XOR.

    The signature frame materializes ONCE (eager localCheckpoint) before
    fan-out: the r8 per-row signature map has no shuffle boundary, so
    without it every consumer — the bucket-size split, both self-join
    sides, the skew-chain path — would re-run the 60-bit vote expression
    over the corpus (measured 4× blowup at sf1).  The checkpoint stores
    (id, simhash) — 8 bytes of signature per doc, the same bytes the
    pre-r8 groupBy shuffle materialized implicitly."""
    sig = simhash_signatures(idf, text_col, id_col, bits).localCheckpoint(
        eager=True
    )
    n_bands = max_distance + 1
    width = -(-bits // n_bands)  # ceil
    band_rows = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("seg"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bs"),
    ).select("id", "simhash", F.col("bs.band").alias("band"), F.col("bs.seg").alias("seg"))
    chain = None
    if bucket_cap is not None:
        band_rows, over = _cap_buckets(band_rows, ["band", "seg"], bucket_cap)
        # group_col = the full simhash value: sub-group stars connect
        # hamming-0 members exactly; representatives cover the rest
        chain = _chain_pairs(
            over, ["band", "seg"], "id", payload=["simhash"], group_col="simhash"
        ).select(
            "id_a",
            "id_b",
            F.bit_count(
                F.col("simhash_a").bitwiseXOR(F.col("simhash_b"))
            ).alias("hamming"),
        ).where(F.col("hamming") <= max_distance)
    a, b = band_rows.alias("a"), band_rows.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_distance)
    )
    if chain is not None:
        cand = cand.unionByName(chain)
    return cand.distinct()


def apply_dedup(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """Materialize a dedup decision: keep ONE representative per
    near-dup component (docs absent from `components` are singletons and
    always survive) → the surviving rows of `docs` plus
    [component, group_size].

    Representative = highest `quality_col` (ties → smallest id), or the
    component's canonical min-id when no quality column is given.  One
    left join on the id + one partitioned window over the component key —
    both hash-partitionable; group sizes are near-dup cluster sizes
    (bounded small), so the window never sees skewed partitions.
    """
    from pyspark.sql.window import Window

    comp = components.select(
        F.col("id").alias("__cid__"), F.col("component").alias("__component__")
    )
    full = docs.join(comp, docs[id_col] == comp["__cid__"], "left_outer").select(
        *docs.columns,
        F.coalesce(F.col("__component__"), F.col(id_col)).alias("component"),
    )
    order = (
        [F.col(quality_col).desc(), F.col(id_col).asc()]
        if quality_col
        else [F.col(id_col).asc()]
    )
    w = Window.partitionBy("component")
    rn = F.row_number().over(Window.partitionBy("component").orderBy(*order))
    return (
        full.withColumn("group_size", F.count(F.lit(1)).over(w))
        .withColumn("__rn__", rn)
        .where(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def minhash_index_update(
    index_df: DataFrame | None,
    new_idf: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """Maintain a persisted MinHash signature index: compute signatures
    for the NEW batch only and append to the existing index (None →
    bootstrap).  The index stores [id, signature] — num_hashes longs per
    document (~256 B/doc at the default 32), so a 10B-document corpus
    carries a ~2.5 TB index: small next to the corpus, partitionable,
    and the corpus text is never re-read or re-shingled on later
    increments.  Write it partitioned/bucketed by a band bucket for
    shuffle-free incremental joins."""
    sig = minhash_signatures(new_idf, text_col, id_col, n, num_hashes)
    return sig if index_df is None else index_df.unionByName(sig)


def minhash_lsh_pairs_incremental(
    new_idf: DataFrame,
    index_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    new_sig: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup screen: NEW batch vs the persisted signature
    index — the 100 TB posture, where re-deduplicating the whole corpus
    per ingest increment is not an option.

    Only the new batch is shingled/hashed (cost O(new)); the index side
    joins on its stored signatures.  Candidates come from the banded
    equi-join (shuffle O(new·bands + index·bands), never pair count);
    each candidate scores the standard unbiased Jaccard estimator
    |matching minhash positions| / num_hashes — the corpus TEXT is never
    touched, which is exactly what makes the incremental path cheap (the
    estimator's ±1/sqrt(num_hashes) error is the documented trade; run
    ngram_jaccard_pairs on the accepted pairs for exact verification
    when the downstream action is destructive).

    Returns [new_id, index_id, est_jaccard] with est_jaccard >= threshold.
    Pass ``new_sig`` (a precomputed [id, signature] frame for the new
    batch) to skip re-shingling — the streaming sink computes signatures
    once and shares them between index write and candidate join.

    Skew note: unlike the self-join operators, this asymmetric join has
    NO bucket_cap — each new doc must learn EVERY corpus doc it
    duplicates, so per-bucket output is |new∩bucket|·|index∩bucket| by
    contract.  The bound is therefore batch_size · max_bucket, governed
    by the INGEST batch size (maxFilesPerTrigger in the streaming sink),
    not by a cap that would silently under-report duplicate hits.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    if new_sig is None:
        new_sig = minhash_signatures(new_idf, text_col, id_col, n, num_hashes)

    def band_rows(sig: DataFrame) -> DataFrame:
        # 8-byte xxhash64 bucket key over the band's r signature slots
        # (same derivation on both sides of this run's join; the index
        # stores SIGNATURES, so the key never persists across versions)
        return sig.select(
            "id",
            "signature",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.xxhash64(
                                *[F.col("signature")[b * r + j] for j in range(r)]
                            ).alias("bucket"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select(
            "id", "signature",
            F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"),
        )

    a = band_rows(new_sig).alias("a")
    b = band_rows(index_df.select("id", "signature")).alias("b")
    matches = F.size(
        F.filter(
            F.zip_with("a.signature", "b.signature", lambda x, y: x == y),
            lambda v: v,
        )
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("new_id"),
            F.col("b.id").alias("index_id"),
            F.round(matches / F.lit(float(num_hashes)), 6).alias("est_jaccard"),
        )
        .distinct()
        .where(F.col("est_jaccard") >= threshold)
    )


def _sig_band_rows(sig: DataFrame, bands: int, r: int) -> DataFrame:
    """[id, signature, band, bucket] — one row per (doc, band), bucket =
    the band's signature slice joined as a string key."""
    return sig.select(
        "id",
        "signature",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_", *[F.col("signature")[b * r + j] for j in range(r)]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(
        "id", "signature",
        F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"),
    )


def _sig_matches(a_sig, b_sig) -> "Column":
    return F.size(F.filter(F.zip_with(a_sig, b_sig, lambda x, y: x == y), lambda v: v))


def minhash_estimate_pairs(
    sig_df: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Signature-only near-dup pairs WITHIN one signature frame
    ([id, signature] — e.g. a fresh ingest batch): banded equi-join
    candidates, positional-match Jaccard estimate, id_a < id_b.  The
    text is never touched, so this composes with the persisted-index
    flow (minhash_lsh_pairs_incremental) to fully dedup an ingest batch
    — within itself and against history — from one signature pass."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    r = num_hashes // bands
    a = _sig_band_rows(sig_df, bands, r).alias("a")
    b = _sig_band_rows(sig_df, bands, r).alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                _sig_matches(F.col("a.signature"), F.col("b.signature"))
                / F.lit(float(num_hashes)),
                6,
            ).alias("est_jaccard"),
        )
        .distinct()
        .where(F.col("est_jaccard") >= threshold)
    )


def deletion_variants(s: Column, k: int) -> Column:
    """FastSS ≤k-deletion neighborhood of a string column as an array
    column (the string itself, every 1-deletion, and for k=2 every
    2-deletion), deduplicated.  Size is bounded by 1 + L + L·(L−1)/2
    for a length-L input — the bound the property test pins so the
    candidate join's expansion is provably bounded by max_length, never
    by an adversarial key's raw length."""
    del1 = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(s.substr(F.lit(1), i - 1), s.substr(i + 1, F.length(s))),
    )
    variants = F.array_union(F.array(s), del1)
    if k == 2:
        # ordered 2-deletions: delete position i, then position j of the
        # RESULT (covers every unordered pair once per ordering; dedup
        # via array_union)
        del2 = F.flatten(
            F.transform(
                del1,
                lambda t: F.transform(
                    F.sequence(F.lit(1), F.length(t)),
                    lambda j: F.concat(
                        t.substr(F.lit(1), j - 1), t.substr(j + 1, F.length(t))
                    ),
                ),
            )
        )
        variants = F.array_union(variants, F.array_distinct(del2))
    return variants


def fuzzy_match_pairs(
    idf: DataFrame,
    col: str,
    id_col: str,
    max_distance: int = 1,
    max_length: int = 64,
    on_long: str = "error",
    eager: bool = True,
    bucket_cap: int | None = 10_000,
) -> DataFrame:
    """Entity-resolution fuzzy pairs: [id_a, id_b, distance] with
    Levenshtein(a, b) <= max_distance (k in {1, 2}), id_a < id_b —
    FastSS deletion neighborhoods, not gram blocking.

    Candidate scheme: every string emits its <= k-deletion variants
    (itself, all 1-deletions, and for k=2 all ordered 2-deletions);
    two strings within edit distance k ALWAYS share a variant (delete
    the edited positions on each side), so an equi-join on the variant
    is a 100%-recall candidate generator.  Crucially its candidate
    count tracks the TRUE pair count: a variant bucket only holds
    strings one edit apart, so repetitive key spaces (zero-padded ids,
    serial numbers) don't explode the way shared-q-gram blocking does
    (measured on 15k zero-padded names: 10.4M gram-block candidates vs
    ~300k here for 262k true pairs).  Exact Levenshtein verifies the
    survivors (a shared variant proves distance <= 2k, not <= k).

    Scale: shuffle O(N * C(len, k)) variant rows — len is capped at
    ``max_length`` (the neighborhood is quadratic in length for k=2).
    ``on_long='error'`` (default) refuses longer strings loudly —
    they belong in the shingle dedup family; ``on_long='truncate'``
    normalizes instead: blocking runs on the first ``max_length``
    chars (an adversarial 1 MB key still emits ≤ 1+L+L(L−1)/2
    variants of length ≤ L) while the exact Levenshtein verify runs
    on the FULL strings, so precision stays 100% and only recall
    for pairs whose sole edits sit past the truncation point is
    given up (documented approximation).

    Skew guard: a variant bucket over ``bucket_cap`` members (N
    identical keys all share the identity variant) emits a two-level
    spanning STAR keyed on the full string instead of all pairs —
    identical strings stay connected exactly, distinct ones bridge via
    representatives; O(N log N) instead of the N²/2-rows-from-one-task
    join.  bucket_cap=None disables.
    """
    k = int(max_distance)
    if k not in (1, 2):
        raise ValueError("fuzzy_match_pairs supports max_distance 1 or 2")
    if on_long not in ("error", "truncate"):
        raise ValueError("on_long must be 'error' or 'truncate'")
    base = _spread(idf).select(
        F.col(id_col).alias("id"), F.col(col).alias("__s__")
    )
    if on_long == "error":
        too_long = idf.where(F.length(F.col(col)) > max_length).limit(1).count()
        if too_long:
            raise ValueError(
                f"fuzzy_match_pairs caps len({col}) at {max_length} (the "
                "deletion neighborhood grows as C(len, k)); use the shingle "
                "dedup family for long strings, or on_long='truncate'"
            )
        blk = F.col("__s__")
    else:
        blk = F.col("__s__").substr(1, int(max_length))
    docs = base.withColumn("__v__", deletion_variants(blk, k))
    docs.persist()
    # homogeneity key for the two-level star = the full string ITSELF
    # (not a hash of it): identical strings sub-group together exactly,
    # with zero collision risk — a hashed key, even 64-bit, could merge
    # two distinct-content sub-groups and re-fragment identical members
    # inside the capped bucket.  The string is already materialized in
    # the row (it feeds deletion_variants), so carrying it as the
    # window partition key costs nothing extra.
    # variant join key as an 8-byte xxhash64 of the variant string: the
    # deletion neighborhood is the dominant shuffle (O(C(len, k)) rows
    # per string, each carrying a ≤ max_length-byte variant) — hashing
    # cuts the key to fixed width.  Equal variants hash equal, so recall
    # is intact; a collision only ADDS a candidate pair, which the exact
    # Levenshtein verify (on the full strings riding as __hk__) rejects.
    ex = docs.select(
        "id",
        F.col("__s__").alias("__hk__"),
        F.explode(F.transform("__v__", lambda s: F.xxhash64(s))).alias("v"),
    )
    chain = None
    if bucket_cap is not None:
        ex, over = _cap_buckets(ex, ["v"], bucket_cap)
        chain = _chain_pairs(over, ["v"], "id", group_col="__hk__")
    a, b = ex.alias("a"), ex.alias("b")
    # __hk__ IS the full string, so the candidate join already has both
    # sides' strings in hand — carry them (bounded at max_length bytes)
    # through the dedup shuffle and verify in place.  The alternative
    # (distinct on bare id pairs, then join the id->string map back for
    # each side) re-shuffles the DATA-SIZED docs frame twice; at cluster
    # scale that map is not broadcastable, so those were the two most
    # expensive exchanges in the old plan.
    out = (
        a.join(
            b,
            (F.col("a.v") == F.col("b.v")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.__hk__").alias("__sa__"),
            F.col("b.__hk__").alias("__sb__"),
        )
        .distinct()
        .withColumn("distance", F.levenshtein("__sa__", "__sb__"))
        .where(F.col("distance") <= k)
        .select("id_a", "id_b", "distance")
    )
    if chain is not None:
        # star edges are O(bucket members) and their buckets were removed
        # from ex, but a pair can also meet in a second, under-cap bucket
        # — verify the chain edges and distinct the union.
        sa = docs.select(F.col("id").alias("id_a"), F.col("__s__").alias("__sa__"))
        sb = docs.select(F.col("id").alias("id_b"), F.col("__s__").alias("__sb__"))
        verified_chain = (
            chain.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn("distance", F.levenshtein("__sa__", "__sb__"))
            .where(F.col("distance") <= k)
            .select("id_a", "id_b", "distance")
        )
        out = out.unionByName(verified_chain).distinct()
    return _finish(out, docs, eager)
