"""Bucketed standing-table gates: the big side of a probe join must not move.

These pin the property the 100 TB story leans on — a standing table written
with bucketBy(keys) joins on those keys with NO Exchange on its side, so
per-round shuffle volume is O(delta), never O(corpus). Results must equal
the unbucketed operators exactly.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.bucketing import (
    bucketed_band_probe,
    bucketed_seen_anti_join,
    write_bucketed,
)
from crawler_spark.plans.audit import count_shuffles, formatted_plan

SF = "/root/testdata/sf0.001"


@pytest.fixture
def table_name(spark):
    name = f"t_{uuid.uuid4().hex[:12]}"
    yield name
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def _seen(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") % 3 == 0)
        .select(F.sha2(F.col("text"), 256).alias("url_hash"))
        .distinct()
    )


def _candidates(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") % 2 == 0)
        .select(F.sha2(F.col("text"), 256).alias("url_hash"), "doc_id")
    )


def test_bucketed_seen_anti_join_single_exchange(spark, table_name):
    write_bucketed(_seen(spark), table_name, ["url_hash"], n_buckets=8)
    fresh = bucketed_seen_anti_join(spark, _candidates(spark), table_name)
    # only the candidate side shuffles; the bucketed seen side reads in place
    assert count_shuffles(fresh) == 1, formatted_plan(fresh)
    want = _candidates(spark).join(
        _seen(spark), on="url_hash", how="left_anti"
    )
    got_ids = {r.doc_id for r in fresh.collect()}
    want_ids = {r.doc_id for r in want.collect()}
    assert got_ids == want_ids and got_ids  # non-trivially exercised


def test_unbucketed_baseline_shuffles_both_sides(spark, table_name):
    """Control: the same anti-join over a plain (unbucketed) table shuffles
    BOTH sides — the Exchange the bucketed layout deletes."""
    _seen(spark).write.format("parquet").mode("overwrite").saveAsTable(table_name)
    seen = spark.table(table_name).select("url_hash").hint("merge")
    fresh = _candidates(spark).join(seen, on="url_hash", how="left_anti")
    assert count_shuffles(fresh) == 2, formatted_plan(fresh)


def test_bucketed_band_probe_matches_unbucketed(spark, table_name, tmp_path):
    from crawler_spark.operators.dedup import (
        _band_keys,
        minhash_signature,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus = docs.select(F.col("doc_id").alias("id"), "text")
    delta = docs.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("id"),
        F.concat(F.col("text"), F.lit(" tambahan akhir dokumen")).alias("text"),
    )
    corpus_idx = _band_keys(minhash_signature(corpus, "id", "text"), 4, 4)
    delta_idx = _band_keys(minhash_signature(delta, "id", "text"), 4, 4)
    write_bucketed(corpus_idx, table_name, ["band_idx", "band_key"], n_buckets=8)

    probe = bucketed_band_probe(spark, delta_idx, table_name)
    # delta lineage costs shuffles of its own (signature aggregation + the
    # final distinct); the corpus index side must add NONE. Control: the
    # IDENTICAL plan over the same rows stored as a plain parquet table —
    # the only delta between the two plans is the corpus-side Exchange.
    plain = str(tmp_path / "corpus_idx_plain")
    corpus_idx.write.mode("overwrite").parquet(plain)
    unbucketed = (
        delta_idx.alias("d")
        .join(
            spark.read.parquet(plain).hint("merge").alias("c"),
            on=["band_idx", "band_key"],
        )
        .filter(F.col("d.id") != F.col("c.id"))
        .select(
            F.least(F.col("d.id"), F.col("c.id")).alias("id_a"),
            F.greatest(F.col("d.id"), F.col("c.id")).alias("id_b"),
        )
        .distinct()
    )
    assert count_shuffles(probe) == count_shuffles(unbucketed) - 1, (
        formatted_plan(probe)
    )
    got = {(r.id_a, r.id_b) for r in probe.collect()}
    want = {(r.id_a, r.id_b) for r in unbucketed.collect()}
    assert got == want and got


def test_bucketed_append_maintains_layout(spark, table_name):
    """The per-round maintenance path: append new rows, the probe contract
    (single Exchange, exact results) must survive the second commit."""
    seen_a = _seen(spark)
    write_bucketed(seen_a, table_name, ["url_hash"], n_buckets=8)
    seen_b = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") % 5 == 0)
        .select(F.sha2(F.concat(F.col("text"), F.lit("v2")), 256).alias("url_hash"))
        .distinct()
    )
    write_bucketed(seen_b, table_name, ["url_hash"], n_buckets=8, mode="append")
    fresh = bucketed_seen_anti_join(spark, _candidates(spark), table_name)
    assert count_shuffles(fresh) == 1, formatted_plan(fresh)
    want = _candidates(spark).join(
        seen_a.unionByName(seen_b), on="url_hash", how="left_anti"
    )
    assert {r.doc_id for r in fresh.collect()} == {r.doc_id for r in want.collect()}
