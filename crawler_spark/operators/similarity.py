"""Similarity search over embedding columns (training-data pipeline ops).

Brute-force cosine top-k is the exactness baseline: broadcast the (small)
query set, one pass over the corpus, JVM-side fold for the dot product,
window top-k. The scale path is LSH bucketing (random-hyperplane signatures):
corpus and queries hash to buckets; only same-bucket pairs are scored —
sublinear candidate sets at 100 TB, tunable recall via n_planes/probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_spark.functions.vectors import cosine_col, simhash_plane_col


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (queries broadcast)."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine_col(F.col(vec_col), F.col("__qvec")), 4).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(query_id_col, id_col, "cosine", F.col("__rn").alias("rank"))
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    round_dp: int = 4,
) -> DataFrame:
    """IVF coarse quantization: every vector joins its nearest centroid by
    cosine (centroids broadcast — the small dim). Scores are rounded before
    the argmax so the assignment is reproducible across engines; ties break
    on centroid id. Returns corpus + centroid_id."""
    c = centroids.select(
        F.col(centroid_id_col), F.col(vec_col).alias("__cvec")
    )
    scored = corpus.crossJoin(F.broadcast(c)).withColumn(
        "__sim", F.round(cosine_col(F.col(vec_col), F.col("__cvec")), round_dp)
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__sim").desc(), F.col(centroid_id_col).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__sim", "__cvec")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF search: corpus partitioned into centroid lists (one assignment
    pass), each query probes its `nprobe` nearest lists and scores exact
    cosine only there. At 100 TB the lists are the physical partitioning
    (write the corpus bucketed by centroid_id -> probes prune partitions);
    recall tunes with nprobe, cost ~ nprobe/n_centroids of brute force."""
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    probes = _probe_lists(
        queries, centroids, nprobe, vec_col, query_id_col, keep_qvec=True
    )
    scored = assigned.join(F.broadcast(probes), "centroid_id").select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine_col(F.col(vec_col), F.col("__qvec")), 4).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(query_id_col, id_col, "cosine", F.col("__rn").cast("int").alias("rank"))
    )


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket equality prunes candidates
    before exact cosine. Deterministic planes (hash-seeded), no model state."""
    seeds = list(range(1, n_planes + 1))
    c = corpus.withColumn("__bucket", simhash_plane_col(F.col(vec_col), seeds))
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        simhash_plane_col(F.col(vec_col), seeds).alias("__bucket"),
    )
    scored = c.join(F.broadcast(q), "__bucket").select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine_col(F.col(vec_col), F.col("__qvec")), 4).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(query_id_col, id_col, "cosine", F.col("__rn").alias("rank"))
    )


def _pq_subslices(vec: "F.Column", m: int, dsub: int) -> "F.Column":
    """Split a dim-length vector into m contiguous dsub-length sub-vectors."""
    return F.array(*[F.slice(vec, j * dsub + 1, dsub) for j in range(m)])


def _pq_dsub(dim: int, m: int) -> int:
    if dim % m != 0:
        raise ValueError(
            f"PQ requires m to divide dim exactly (dim={dim}, m={m}): a "
            f"remainder would silently drop the trailing {dim % m} dimensions "
            "from codebooks and codes while qnorm still covers them"
        )
    return dim // m


def _probe_lists(
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    vec_col: str,
    query_id_col: str,
    keep_qvec: bool = False,
) -> DataFrame:
    """The IVF probe: each query's nprobe nearest centroid lists by rounded
    cosine (ties on centroid id) — shared by ivf_topk and ivfpq_topk so the
    probe semantics (and their DuckDB oracles) cannot drift apart."""
    from crawler_spark.functions.vectors import cosine_col

    cq = centroids.select(F.col("centroid_id"), F.col(vec_col).alias("__cvec"))
    qscored = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    ).crossJoin(F.broadcast(cq)).withColumn(
        "__sim", F.round(cosine_col(F.col("__qvec"), F.col("__cvec")), 4)
    )
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("__sim").desc(), F.col("centroid_id").asc()
    )
    cols = [query_id_col, "centroid_id"] + (["__qvec"] if keep_qvec else [])
    return (
        qscored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select(*cols)
    )


def _adc_scan(
    scan_codes: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """The ADC scan: per-query LUT of partial dots + codeword norms against
    the broadcast codebooks, partial-sum aggregation, approx-cosine top-k.
    `scan_codes` is (id, sub_idx, code); if it already carries query_id
    (pre-pruned, IVF-PQ), the LUT joins per query — otherwise every query
    scans every code (plain PQ). Shared by pq_adc_topk and ivfpq_topk."""
    from crawler_spark.functions.vectors import dot_col, norm_col

    dsub = _pq_dsub(dim, m)
    qv = F.col(vec_col).cast("array<double>")
    qsubs = queries.select(
        F.col(query_id_col),
        norm_col(qv).alias("qnorm"),
        F.posexplode(_pq_subslices(qv, m, dsub)).alias("sub_idx", "qsv"),
    )
    lut = qsubs.join(F.broadcast(codebooks), "sub_idx").select(
        query_id_col, "qnorm", "sub_idx", "code",
        F.round(dot_col(F.col("qsv"), F.col("cv")), 6).alias("partial"),
        F.round(dot_col(F.col("cv"), F.col("cv")), 6).alias("cnorm2"),
    )
    join_keys = ["sub_idx", "code"]
    if query_id_col in scan_codes.columns:
        join_keys = [query_id_col] + join_keys
    scored = (
        scan_codes.join(F.broadcast(lut), join_keys)
        .groupBy(query_id_col, id_col)
        .agg(
            F.round(
                F.sum("partial") / (F.max("qnorm") * F.sqrt(F.sum("cnorm2"))), 4
            ).alias("cosine")
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(query_id_col, id_col, "cosine", F.col("__rn").cast("int").alias("rank"))
    )


def pq_fit_encode(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    ksub: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> tuple[DataFrame, DataFrame]:
    """Product quantization: train m per-subspace codebooks (ksub codewords
    each) and encode every corpus vector as m small codes.

    This is the compressed-domain scan path for 100 TB embedding corpora: a
    768-dim float vector (3 KB) becomes m codes (m bytes at ksub<=256), so
    the similarity scan reads ~1000x fewer bytes — the codebooks are a tiny
    broadcast dim and raw vectors are only touched at train/encode time.

    Deterministic for cross-engine replay (same discipline as kmeans_fit):
    init codebook j = sub-slices of the ksub lowest-id vectors; ONE Lloyd
    refinement with L2 assignment; the argmin key is
    round(<cv,cv> - 2<sv,cv>, round_dp) — the |sv|^2-free expansion of the
    squared L2 distance (constant per row, so the argmin is unchanged) —
    with ties on code id; refined means rounded to round_dp.

    Spark shape: one posexplode pass over the corpus (m rows/vector), an
    equi-join on sub_idx against the broadcast codebook, argmin window
    partitioned by (vector, subspace). No cartesian, no Python.

    Returns (codebooks(sub_idx, code, cv), codes(id, sub_idx, code)).
    """
    dsub = _pq_dsub(dim, m)
    v = F.col(vec_col).cast("array<double>")
    subs = corpus.select(
        F.col(id_col),
        F.posexplode(_pq_subslices(v, m, dsub)).alias("sub_idx", "sv"),
    )
    w_init = Window.orderBy(id_col)
    init = (
        corpus.orderBy(id_col).limit(ksub)
        .withColumn("code", F.row_number().over(w_init) - 1)
        .select(
            "code",
            F.posexplode(_pq_subslices(v, m, dsub)).alias("sub_idx", "cv"),
        )
    )

    def _assign(codebook: DataFrame) -> DataFrame:
        from crawler_spark.functions.vectors import dot_col

        scored = subs.join(F.broadcast(codebook), "sub_idx").withColumn(
            "__key",
            F.round(
                dot_col(F.col("cv"), F.col("cv"))
                - 2 * dot_col(F.col("sv"), F.col("cv")),
                round_dp,
            ),
        )
        w = Window.partitionBy(id_col, "sub_idx").orderBy(
            F.col("__key").asc(), F.col("code").asc()
        )
        return (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(id_col, "sub_idx", "code", "sv")
        )

    a1 = _assign(init)
    means = a1.select(
        "sub_idx", "code", F.posexplode("sv").alias("pos", "val")
    ).groupBy("sub_idx", "code", "pos").agg(
        F.round(F.avg("val"), round_dp).alias("val")
    )
    codebooks = (
        means.groupBy("sub_idx", "code")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "val"))).alias("s"))
        .select(
            "sub_idx", "code",
            F.transform(F.col("s"), lambda x: x["val"]).alias("cv"),
        )
        .localCheckpoint()  # truncate the two-pass lineage before re-assign
    )
    codes = _assign(codebooks).select(id_col, "sub_idx", "code")
    return codebooks, codes


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 4,
    ksub: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """PQ asymmetric-distance top-k (ADC): queries score against CODES, not
    raw vectors. Per query, a lookup table of partial dot products
    round(<q_j, cv>, 6) and codeword norms round(<cv,cv>, 6) is built
    against the broadcast codebooks (m x ksub rows per query); the corpus
    side contributes only its codes. approx cosine =
    sum_j <q_j, cv_code_j> / (|q| * sqrt(sum_j |cv_code_j|^2)), rounded 4dp.

    Shuffle inventory: the codes scan joins the broadcast LUT (zero
    exchange), ONE hash shuffle for the (query, vector) partial-sum
    aggregation (map-side combined), one top-k window per query. On a real
    deployment codes are written once at ingest and this is the only scan —
    combine with ivf_topk lists (IVF-PQ) to prune it further.
    """
    codebooks, codes = pq_fit_encode(
        corpus, dim, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col
    )
    return _adc_scan(
        codes, queries, codebooks, dim, m, k, id_col, vec_col, query_id_col
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    dim: int,
    m: int = 4,
    ksub: int = 8,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-PQ: coarse lists prune WHICH codes are scanned, PQ codes decide
    HOW they are scored — the standard billion-scale ANN composition. Each
    query probes its nprobe nearest centroid lists (ivf_assign semantics)
    and ADC-scores only the codes of vectors in those lists; raw corpus
    vectors are read once at build time (assign + encode), never at query
    time. Cost vs pq_adc_topk: x(nprobe/n_lists); cost vs ivf_topk: the
    probed lists are scanned in code domain (bytes, not vectors).

    Composition of the two shared kernels: `_probe_lists` (the ivf_topk
    probe, verbatim) prunes which codes reach `_adc_scan` (the pq_adc_topk
    scan, verbatim) — pruning changes WHICH codes are scanned, never how
    they score (gated in tests/test_pq.py). Shuffle inventory: build = one
    argmin window per stage (list assign, code assign); query = codes ⋈
    broadcast(probes) ⋈ broadcast(LUT), ONE partial-sum shuffle, one top-k
    window. On Iceberg, codes are written bucketed by list id, so the probe
    join prunes files before it prunes rows."""
    codebooks, codes = pq_fit_encode(
        corpus, dim, m=m, ksub=ksub, id_col=id_col, vec_col=vec_col
    )
    lists = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col).select(
        id_col, "centroid_id"
    )
    coded = codes.join(lists, id_col)  # (id, sub_idx, code, centroid_id)
    probes = _probe_lists(queries, centroids, nprobe, vec_col, query_id_col)
    pruned = coded.join(F.broadcast(probes), "centroid_id").select(
        query_id_col, id_col, "sub_idx", "code"
    )
    return _adc_scan(
        pruned, queries, codebooks, dim, m, k, id_col, vec_col, query_id_col
    )


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> tuple[DataFrame, DataFrame]:
    """Distributed Lloyd's iteration for IVF centroid training (completes
    the train side of the IVF ANN path; `ivf_assign`/`ivf_topk` are the
    probe side). Spark-shape per iteration: broadcast-assign (cosine argmax,
    same rounding as `ivf_assign` so every engine replays the argmax
    identically) -> posexplode to (centroid, dim) -> map-side-combinable
    mean -> re-assemble ordered arrays. Deterministic throughout: init =
    the k lowest-id vectors, means rounded to `round_dp` before the next
    assignment, ties on centroid id. Lineage is truncated per iteration
    (eager localCheckpoint — see operators/dedup.connected_components for
    the measured superlinear-planning failure mode this avoids). Clusters
    that lose every member drop out (no re-seeding — reproducible).

    Returns (centroids, sizes): the trained centroid table and the member
    counts of the final assignment that produced it.
    """
    w_init = Window.orderBy(id_col)
    centroids = (
        corpus.orderBy(id_col).limit(k)
        .withColumn("centroid_id", F.row_number().over(w_init) - 1)
        .select("centroid_id", F.col(vec_col).cast("array<double>").alias(vec_col))
    )
    sizes = None
    for _ in range(n_iter):
        # cache: the assignment (broadcast crossJoin + argmin window — the
        # iteration's expensive stage) feeds BOTH the means and the member
        # counts; uncached, the localCheckpointed means force one full
        # recompute per iteration just to count members
        assigned = ivf_assign(
            corpus, centroids, id_col=id_col, vec_col=vec_col
        ).persist()
        exploded = assigned.select(
            "centroid_id",
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"),
        )
        means = exploded.groupBy("centroid_id", "pos").agg(
            F.round(F.avg("val"), round_dp).alias("val")
        )
        centroids = (
            means.groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "val"))).alias("s"))
            .select(
                "centroid_id",
                F.transform(F.col("s"), lambda x: x["val"]).alias(vec_col),
            )
            .localCheckpoint()
        )
        sizes = assigned.groupBy("centroid_id").agg(
            F.count("*").cast("long").alias("n_members")
        ).localCheckpoint()
        assigned.unpersist()
    return centroids, sizes
