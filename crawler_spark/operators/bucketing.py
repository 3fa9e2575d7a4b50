"""Bucketed standing tables: the shuffle-free probe path for perpetual state.

At 10^10 URLs the seen set and the LSH band index are the perpetually-large
side of every round's join; re-shuffling them each round is the classic
scale bug (the shuffle is O(|corpus|) forever, the probe is O(|delta|)). A
table written with ``bucketBy(n, keys)`` is read back already
hash-partitioned on those keys — a join on exactly those keys plans NO
Exchange on the bucketed side; only the round's delta shuffles (into n
buckets). ``sortBy`` additionally persists within-bucket order so
sort-merge joins skip the corpus-side sort when each bucket is one file.

This is the session-catalog expression of Iceberg's ``bucket(n, col)``
partition transform — the storage layout the engine's docstrings assume for
the standing ``seen`` / band-index tables (the reference holds this state in
Redis sets probed per URL, url_frontier.py / result_persistence.py:231-264;
here the standing side never moves again at all). Plan shape is pinned in
tests/test_bucketing.py: probe joins must show exactly ONE Exchange — the
delta side — and identical results to the unbucketed operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a managed parquet table bucketed (and by default
    sorted) on ``keys``. ``mode='append'`` is the per-round index-maintenance
    path: new files land in existing buckets, the read-side partitioning
    contract is unchanged."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed_seen_anti_join(
    spark: SparkSession,
    candidates: DataFrame,
    seen_table: str,
    key: str = "url_hash",
) -> DataFrame:
    """U6 against a bucketed standing seen table: LEFT ANTI on the bucket key.
    The seen side reads in place (no Exchange); only ``candidates`` shuffles.
    The merge hint keeps the plan honest at fixture scale, where Spark would
    otherwise broadcast the (tiny in tests, 100s-of-GB in production) seen
    side and hide the property under test."""
    seen = spark.table(seen_table).select(key).hint("merge")
    return candidates.join(seen, on=key, how="left_anti")


def bucketed_band_probe(
    spark: SparkSession,
    delta_idx: DataFrame,
    index_table: str,
) -> DataFrame:
    """Incremental LSH probe against a standing band index bucketed on
    (band_idx, band_key): emits candidate (id_a < id_b) pairs between the
    delta's band rows and the corpus index, corpus side unshuffled. Feed the
    result (unioned with within-delta pairs) to the same verify stage as
    `minhash_incremental_pairs`; append the delta's band rows to the table
    afterwards to maintain the index."""
    corpus_idx = spark.table(index_table).hint("merge")
    return (
        delta_idx.alias("d")
        .join(corpus_idx.alias("c"), on=["band_idx", "band_key"], how="inner")
        .filter(F.col("d.id") != F.col("c.id"))
        .select(
            F.least(F.col("d.id"), F.col("c.id")).alias("id_a"),
            F.greatest(F.col("d.id"), F.col("c.id")).alias("id_b"),
        )
        .distinct()
    )
