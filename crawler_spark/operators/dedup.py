"""Deduplication operators (U5-U7, C5-C9 + training-data dedup family).

Every operator is a declarative DataFrame plan — Catalyst handles pushdown
and AQE handles skew. Shuffle inventory (what a 100 TB run pays):

  * first_by_order / seen_anti_join: ONE hash shuffle on the dedup key.
  * exact-content dedup: one shuffle on content_hash (the window and the
    join-back reuse the same partitioning).
  * simhash banded join: explode 4x then ONE shuffle on (band_idx, band)
    — the pigeonhole trick turns an O(n^2) all-pairs scan into a
    self-equi-join whose cost is the bucket collision count.
  * minhash LSH: shuffle on (band_idx, band_signature).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.functions.simhash_udfs import hamming_col
from crawler_spark.functions.text import token_hash60_col, word_shingles_col, ws_tokens_col


def first_by_order(df: DataFrame, key: str, order_cols: list[str]) -> DataFrame:
    """U5/U7: keep the first row per `key` by `order_cols` (extraction order).
    Order is a computed column, never physical row order."""
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def seen_anti_join(
    candidates: DataFrame,
    seen: DataFrame,
    key: str = "url_hash",
    ttl_filter: Column | None = None,
) -> DataFrame:
    """U6: drop candidates whose hash is in the seen set (optionally only
    'fresh' seen rows per the 24 h TTL — TTL becomes a partition-prunable
    predicate on seen_at instead of Redis key expiry)."""
    s = seen.filter(ttl_filter) if ttl_filter is not None else seen
    return candidates.join(s.select(key).distinct(), key, "left_anti")


def mark_exact_duplicates(
    pages: DataFrame,
    id_col: str = "page_id",
    content_col: str = "content_sha256",
    order_col: str = "crawled_at",
) -> DataFrame:
    """C8/Q2: canonical page = earliest `order_col` (ties: lowest id) per
    content hash; later pages get is_duplicate / duplicate_of / score 100."""
    w = Window.partitionBy(content_col).orderBy(F.col(order_col).asc(), F.col(id_col).asc())
    return (
        pages.withColumn("__rn", F.row_number().over(w))
        .withColumn("__canon", F.first(id_col).over(w))
        .withColumn("is_duplicate", F.col("__rn") > 1)
        .withColumn("duplicate_of", F.when(F.col("__rn") > 1, F.col("__canon")))
        .withColumn("similarity_score", F.when(F.col("__rn") > 1, F.lit(100)))
        .drop("__rn", "__canon")
    )


def content_hash_stats(pages: DataFrame, content_col: str = "content_sha256") -> DataFrame:
    """C7: occurrence counting per content hash (the MERGE INTO source)."""
    return pages.groupBy(content_col).agg(
        F.count("*").alias("occurrence_count"),
        F.min("page_id").alias("first_seen_page_id"),
        F.first("simhash", ignorenulls=True).alias("simhash_fingerprint"),
    )


def _band_explode(
    df: DataFrame, id_col: str, fp_col: str, n_bands: int
) -> DataFrame:
    """Explode each 64-bit fingerprint into `n_bands` contiguous (band_idx,
    band) rows — the LSH index rows both the self-join and the incremental
    probe shuffle on."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    src = df.select(F.col(id_col).alias("id"), F.col(fp_col).alias("fp")).filter(
        F.col("fp").isNotNull()
    )
    return src.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(F.col("fp"), i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("band"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("id", "fp", "b.band_idx", "b.band")


def simhash_near_dup_join(
    df: DataFrame,
    id_col: str = "id",
    fp_col: str = "simhash",
    threshold: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """C5/C6 at scale: banded LSH self-join.

    Split each 64-bit fingerprint into `n_bands` contiguous bands; by
    pigeonhole, hamming(a,b) <= n_bands-1 implies >=1 identical band, so the
    self-equi-join on (band_idx, band_value) is a lossless candidate
    generator for threshold <= n_bands-1. Verify with JVM-side bit_count.
    Emits (id_a < id_b, distance, similarity_pct), deduped across bands.
    """
    if threshold > n_bands - 1:
        raise ValueError(f"threshold {threshold} needs n_bands >= threshold+1")
    banded = _band_explode(df, id_col, fp_col, n_bands)
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band") == F.col("r.band"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.fp").alias("fp_a"),
            F.col("r.fp").alias("fp_b"),
        )
        .dropDuplicates(["id_a", "id_b"])  # a pair can collide in >1 band
    )
    return (
        pairs.withColumn("distance", hamming_col(F.col("fp_a"), F.col("fp_b")))
        .filter(F.col("distance") <= threshold)
        .withColumn("similarity_pct", (1 - F.col("distance") / 64.0) * 100.0)
        .select("id_a", "id_b", "distance", "similarity_pct")
    )


def simhash_incremental_near_dup(
    corpus: DataFrame,
    delta: DataFrame,
    id_col: str = "id",
    fp_col: str = "simhash",
    threshold: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """C5 in its production shape: probe only the round's NEW fingerprints
    against the standing corpus index (content_hash.sql:67-78's per-insert
    lookup in result_persistence.py:231-264, set-at-a-time instead of
    row-at-a-time).

    Returns exactly the pairs that re-running the full banded self-join on
    (corpus UNION delta) would ADD — i.e. every near-dup pair with at least
    one delta member: (corpus x delta) probes plus within-delta pairs. The
    corpus is touched only through its band rows; at 10^10 docs that index
    is a bucketed table on (band_idx, band) appended each round, so the
    equi-join prunes to the delta's buckets and per-round cost is
    O(|delta| x bucket occupancy), never O(|corpus|) — the invariant
    full(corpus+delta) == full(corpus) + incremental(corpus, delta) is
    gated in tests/test_simhash.py.
    """
    if threshold > n_bands - 1:
        raise ValueError(f"threshold {threshold} needs n_bands >= threshold+1")
    corpus_idx = _band_explode(corpus, id_col, fp_col, n_bands)
    delta_idx = _band_explode(delta, id_col, fp_col, n_bands)
    probe = delta_idx.alias("d").join(
        corpus_idx.alias("c"),
        (F.col("d.band_idx") == F.col("c.band_idx"))
        & (F.col("d.band") == F.col("c.band"))
        & (F.col("d.id") != F.col("c.id")),
    ).select(
        F.least(F.col("d.id"), F.col("c.id")).alias("id_a"),
        F.greatest(F.col("d.id"), F.col("c.id")).alias("id_b"),
        F.when(F.col("d.id") < F.col("c.id"), F.col("d.fp"))
        .otherwise(F.col("c.fp"))
        .alias("fp_a"),
        F.when(F.col("d.id") < F.col("c.id"), F.col("c.fp"))
        .otherwise(F.col("d.fp"))
        .alias("fp_b"),
    )
    within = (
        delta_idx.alias("l")
        .join(
            delta_idx.alias("r"),
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band") == F.col("r.band"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.fp").alias("fp_a"),
            F.col("r.fp").alias("fp_b"),
        )
    )
    pairs = probe.unionByName(within).dropDuplicates(["id_a", "id_b"])
    return (
        pairs.withColumn("distance", hamming_col(F.col("fp_a"), F.col("fp_b")))
        .filter(F.col("distance") <= threshold)
        .withColumn("similarity_pct", (1 - F.col("distance") / 64.0) * 100.0)
        .select("id_a", "id_b", "distance", "similarity_pct")
    )


MINHASH_M31 = 2147483647  # 2^31 - 1 (Mersenne)


def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    """(a_i, b_i) for k universal-hash permutations over Z_{2^31-1} — the
    ONE source of truth shared by minhash_signature and the SQL oracles.

    a_i must be LARGE (near-M31) odd multipliers so a_i * (h mod M31)
    actually WRAPS the modulus: the previous scheme's small a_i (<= 31) on
    a 40-bit h never reached its 2^61-1 modulus, making every component a
    strictly monotone transform of the SAME base hash — all k argmins
    picked the same shingle, signature agreement collapsed to a single
    Bernoulli trial (docs share their global-min shingle or nothing), and
    the LSH band amplification 1-(1-J^r)^b was silently a no-op.
    a_i * h31 < 2^62 stays exact in int64 on both engines."""
    return [
        (
            (1103515245 * (i + 1) + 7919) % MINHASH_M31 | 1,
            (1000003 * (i + 1) + 12345) % MINHASH_M31,
        )
        for i in range(k)
    ]


def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    shingle_words: int = 3,
) -> DataFrame:
    """MinHash signatures over word shingles, fully JVM-side.

    Per-shingle 40-bit base hash h (md5-substring, engine-portable),
    reduced to h31 = h mod (2^31-1), then k universal-hash permutations
    h_i = (a_i*h31 + b_i) mod (2^31-1), signature_i = min over shingles.
    Coefficients from minhash_coeffs (deterministic, wrap-verified) so the
    signature is reproducible in the SQL oracle. Documents shorter than
    `shingle_words` tokens have no shingles and get NO signature row — the
    usual minhash-pipeline convention (exact-hash dedup upstream catches
    identical short docs; near-dup similarity is meaningless below one
    shingle of context).

    Plan shape: explode shingles -> md5 once per shingle -> k min-aggregates
    with map-side partial aggregation (shuffle volume = docs x k longs, not
    shingles). A map-only alternative (hash the shingle array, k array_min
    transforms) was A/B-measured 4-5x SLOWER per core: higher-order-function
    lambdas are interpreted per element while the exploded pipeline stays in
    whole-stage codegen — and its one aggregate exchange is what downstream
    self-referencing consumers (the LSH bucket agg) reuse instead of
    re-evaluating the signature lineage.
    """
    m = MINHASH_M31
    shingles = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles_col(F.col(text_col), shingle_words)).alias("shingle"),
    )
    hashed = shingles.withColumn(
        "h",
        F.conv(F.substring(F.md5(F.col("shingle")), 17, 10), 16, 10)
        .cast("long") % F.lit(m),
    )
    aggs = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(m)).alias(f"mh_{i}")
        for i, (a, b) in enumerate(minhash_coeffs(k))
    ]
    return hashed.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    signatures: DataFrame, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding over minhash signatures: docs sharing any full band are
    candidate near-dups. Emits distinct (id_a < id_b) candidate pairs.

    Plan shape: ONE exchange — explode bands, groupBy (band, key) with
    collect_list, then expand each bucket's id list to ordered pairs JVM-side
    (nested array transforms). A banded self-join would cost two exchanges
    AND evaluate the signature lineage once per side; the bucket aggregation
    evaluates it once. Pair expansion is
    quadratic per bucket — the same output the self-join produced — and
    NEAR-dup bucket sizes are bounded by construction (that is the point of
    banding). The honest boundary: EXACT duplicates share every band, so a
    corpus with k copies of one page makes a k-sized bucket (k^2 pairs and a
    k-id collect_list in one task) under this aggregation AND a k^2-row join
    under the self-join alternative. Run exact dedup first
    (`mark_exact_duplicates`, as the pipeline does) so identical content
    collapses to canonicals before LSH — then bucket size is governed by the
    band collision probability it was tuned for.
    """
    buckets = (
        _band_keys(signatures, bands, rows_per_band)
        .groupBy("band_idx", "band_key")
        .agg(F.array_sort(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pair_arrays = F.expr(
        "flatten(transform(ids, (x, i) -> "
        "transform(slice(ids, i + 2, size(ids) - i - 1), "
        "y -> struct(x AS id_a, y AS id_b))))"
    )
    return (
        buckets.select(F.explode(pair_arrays).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def _band_keys(signatures: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(id, band_idx, band_key) rows for LSH banding over minhash signatures."""
    band_structs = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.concat_ws(
                "|", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    return signatures.select("id", F.explode(F.array(*band_structs)).alias("b")).select(
        "id", "b.band_idx", "b.band_key"
    )


def minhash_incremental_pairs(
    corpus_sigs: DataFrame,
    delta_sigs: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """MinHash-LSH candidate maintenance in its production shape: probe only
    the round's NEW signatures against the standing corpus band index, the
    set-at-a-time form of the reference's persist-time duplicate lookup
    (result_persistence.py:231-264) for the MinHash family — the sibling of
    `simhash_incremental_near_dup`.

    Returns exactly the candidate pairs that re-running `minhash_lsh_pairs`
    on (corpus UNION delta) would ADD: signatures never change, so every new
    pair has >= 1 delta member — (corpus x delta) band probes plus
    within-delta bucket pairs (invariant gated in tests/test_simhash.py).
    The corpus is touched only through its (band_idx, band_key, id) index; at
    10^10 docs that index is a standing table bucketed on (band_idx,
    band_key) appended each round, so the equi-join prunes to the delta's
    buckets and per-round cost is O(|delta| x bucket occupancy), never
    O(|corpus|). Within-delta pairs reuse the one-exchange bucket
    aggregation (no delta self-join).
    """
    corpus_idx = _band_keys(corpus_sigs, bands, rows_per_band)
    delta_idx = _band_keys(delta_sigs, bands, rows_per_band)
    probe = (
        delta_idx.alias("d")
        .join(
            corpus_idx.alias("c"),
            (F.col("d.band_idx") == F.col("c.band_idx"))
            & (F.col("d.band_key") == F.col("c.band_key"))
            & (F.col("d.id") != F.col("c.id")),
        )
        .select(
            F.least(F.col("d.id"), F.col("c.id")).alias("id_a"),
            F.greatest(F.col("d.id"), F.col("c.id")).alias("id_b"),
        )
    )
    within = minhash_lsh_pairs(delta_sigs, bands=bands, rows_per_band=rows_per_band)
    return probe.unionByName(within).distinct()


def jaccard_pairs(
    df: DataFrame, pairs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs (verification stage after
    LSH, or directly for bounded pair sets)."""
    toks = df.select(
        F.col(id_col).alias("id"), F.array_distinct(ws_tokens_col(F.col(text_col))).alias("toks")
    )
    a = toks.alias("a")
    b = toks.alias("b")
    return (
        pairs.join(a, pairs.id_a == F.col("a.id"))
        .join(b, pairs.id_b == F.col("b.id"))
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
                / F.size(F.array_union(F.col("a.toks"), F.col("b.toks")))
            ).alias("jaccard"),
        )
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """C9 at scale: transitive closure of pairwise duplicate matches into
    groups — min-label propagation to a fixpoint (the alternating-star
    family of Kiveris et al. "Connected Components in MapReduce"; this is
    the simple-propagation variant, which converges in diameter(G) rounds —
    dedup graphs are near-cliques with tiny diameter, so 3-4 rounds in
    practice).

    Each iteration is ONE exchange: label(x) <- min(label(x), min over
    neighbors' labels), computed as union(labels, neighbor-propagated
    labels) -> map-side-combinable min aggregation. The propagation join
    needs no exchange of its own — the cached edge table is pre-partitioned
    on the join key and the labels side arrives already hash-partitioned on
    `id` from the previous iteration's aggregation. Convergence is detected
    with a SCALAR aggregate instead of a join against the previous labels:
    labels only ever decrease, so sum(comp) (as decimal(38,0) — overflow-
    proof at any node count) is strictly decreasing until the fixpoint, and
    an unchanged sum == zero changed labels. Iterations are bounded by
    `max_iter` with a loud failure on non-convergence rather than a
    silently-partial result.

    Returns (id, component_id) with component_id = min node id reachable.
    Reference parity: duplicate-group maintenance (current_schema.sql
    duplicate_group tables) groups by exact hash only; this is the fuzzy
    generalization a 100 TB dedup pipeline needs (MinHash/simhash pairs ->
    canonical clusters).
    """
    sym = edges.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).unionByName(
        edges.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    )
    base = sym.select(F.col("src").alias("id")).distinct()
    if nodes is not None:
        base = base.unionByName(nodes.select(F.col("id"))).distinct()
    # pre-partition the (large, loop-invariant) edge table on the join key
    # before caching: every iteration joins sym.dst == labels.id, and a
    # cached hash-partitioned layout lets Catalyst reuse the exchange — only
    # the (small, changing) labels side moves per iteration. At 10^10 edges
    # this is the difference between one edge shuffle total and one per
    # iteration.
    sym = sym.repartition("dst").cache()
    # localCheckpoint (eager) each generation: caching alone keeps the DATA
    # but the LOGICAL plan still nests every prior iteration, and Catalyst
    # re-analyzes the whole tree per iteration — measured superlinear
    # planning growth (2.1s -> 11.7s by iteration 4 at sf0.1). Checkpointing
    # replaces the plan with a scan of the materialized partitions, making
    # per-iteration cost flat. (Executor-local storage; on a production
    # cluster use spark.sparkContext.setCheckpointDir + .checkpoint() for
    # fault-tolerant lineage truncation — same plan shape.)
    labels = base.select("id", F.col("id").alias("comp")).localCheckpoint()
    checksum = F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
    prev_sum = labels.agg(checksum).collect()[0]["s"]
    for _ in range(max_iter):
        propagated = sym.join(labels, sym["dst"] == labels["id"], "inner").select(
            F.col("src").alias("id"), F.col("comp")
        )
        step = (
            labels.unionByName(propagated)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()  # eager: materializes + truncates lineage
        )
        cur_sum = step.agg(checksum).collect()[0]["s"]
        labels = step
        if cur_sum == prev_sum:
            out = labels.select("id", F.col("comp").alias("component_id"))
            sym.unpersist()
            return out
        prev_sum = cur_sum
    sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations"
    )


def duplicated_window_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Exact substring (k-token window) duplication statistics — the
    Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    Better" pass re-expressed Spark-first: every k-token window of every
    document is hashed (60-bit md5 prefix, the repo's shared oracle-
    replayable key), a window is DUPLICATED when its hash occurs >= 2 times
    across the corpus (covers both cross-document boilerplate and
    within-document repetition — the suffix-array criterion restricted to
    fixed-length windows), and each document reports its window count,
    duplicated-window count, and duplicated fraction.

    100 TB plan: windows never materialize as strings off-task — the
    explode emits (doc_id, hash) pairs only; ONE shuffle builds the global
    hash -> occurrence count (map-side combinable), the count joins back
    CO-PARTITIONED on the hash (the groupBy's own partitioning, no extra
    exchange), and the per-doc rollup is a second combinable aggregation.
    Compare line_dedup (distinct-doc threshold + broadcast strip): this
    operator keeps the full multiset semantics a suffix-array pass needs.
    Zero UDF. Reference: the crawler has no training-curation analogue
    (SURVEY §2.9) — this is a beyond-reference LLM-pipeline operator."""
    from crawler_spark.functions.text import md5_60bit_col, word_ngrams_col

    base = docs.select(
        F.col(id_col).alias("doc_id"),
        word_ngrams_col(F.col(text_col), k).alias("wins"),
    )
    exploded = base.select(
        "doc_id", F.explode("wins").alias("w")
    ).select("doc_id", md5_60bit_col(F.col("w")).alias("h"))
    counts = exploded.groupBy("h").agg(F.count(F.lit(1)).alias("n_occ"))
    per_doc = (
        exploded.join(counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum((F.col("n_occ") >= 2).cast("int")).alias("n_dup_windows"),
        )
    )
    # zero-window docs (< k tokens) keep a row with explicit zeros
    return (
        base.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).cast("int").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).cast("int").alias("n_dup_windows"),
            F.round(
                F.coalesce(
                    F.col("n_dup_windows") / F.col("n_windows"), F.lit(0.0)
                ),
                4,
            ).alias("dup_frac"),
        )
    )
