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
    cq = centroids.select(F.col("centroid_id"), F.col(vec_col).alias("__cvec"))
    qscored = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    ).crossJoin(F.broadcast(cq)).withColumn(
        "__sim", F.round(cosine_col(F.col("__qvec"), F.col("__cvec")), 4)
    )
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("__sim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        qscored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select(query_id_col, "centroid_id", "__qvec")
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
        assigned = ivf_assign(
            corpus, centroids, id_col=id_col, vec_col=vec_col
        )
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
        )
    return centroids, sizes
