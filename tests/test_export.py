"""Training-set export sink: deterministic hash-bucketed shards, bounded
file sizes, verifiable commit manifest written last."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _curated(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text", "lang")
    )


def test_export_manifest_matches_data_and_roundtrips(spark, tmp_path):
    from crawler_spark.operators.export import (
        export_training_shards,
        verify_export,
    )

    df = _curated(spark)
    out = str(tmp_path / "exp")
    man = export_training_shards(
        df, out, key_col="doc_id", n_buckets=4, max_rows_per_file=50
    )
    assert man["total_rows"] == df.count()
    # bounded shards: no file exceeds the cap
    assert all(s["rows"] <= 50 for s in man["shards"])
    # every bucket materialized and the roundtrip is lossless
    back = spark.read.parquet(out)
    assert sorted(r["doc_id"] for r in back.collect()) == sorted(
        r["doc_id"] for r in df.collect()
    )
    v = verify_export(spark, out)
    assert v["ok"], v
    assert v["total_rows"] == man["total_rows"]


def test_export_shard_membership_is_deterministic(spark, tmp_path):
    from crawler_spark.operators.export import export_training_shards

    df = _curated(spark)
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    export_training_shards(df, out1, key_col="doc_id", n_buckets=4)
    export_training_shards(df, out2, key_col="doc_id", n_buckets=4)

    def members(out):
        back = spark.read.parquet(out)
        return sorted(
            map(tuple, back.select("doc_id", "bucket").collect())
        )

    # hash-of-key bucketing: identical membership across runs (and across
    # engines — the bucket is the shared md5_60bit key mod n)
    assert members(out1) == members(out2)


def test_verify_export_catches_tampering(spark, tmp_path):
    from crawler_spark.operators.export import (
        export_training_shards,
        verify_export,
    )

    df = _curated(spark)
    out = str(tmp_path / "t")
    export_training_shards(df, out, key_col="doc_id", n_buckets=2)
    man_path = os.path.join(out, "_EXPORT_MANIFEST.json")
    man = json.load(open(man_path))
    victim = man["shards"][0]
    os.remove(os.path.join(out, f"bucket={victim['bucket']}", victim["file"]))
    v = verify_export(spark, out)
    assert not v["ok"] and "missing shard" in v["reason"]


def test_export_refuses_null_keys_before_writing(spark, tmp_path):
    from crawler_spark.operators.export import export_training_shards

    import pytest as _pytest

    df = _curated(spark).withColumn(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, None).otherwise(F.col("doc_id")),
    )
    out = str(tmp_path / "nullkey")
    with _pytest.raises(ValueError, match="NULL"):
        export_training_shards(df, out, key_col="doc_id", n_buckets=2)
    assert not os.path.isdir(out)  # fail-fast: no data files either


def test_verify_export_catches_unmanifested_extra_file(spark, tmp_path):
    import shutil

    from crawler_spark.operators.export import (
        export_training_shards,
        verify_export,
    )

    df = _curated(spark)
    out = str(tmp_path / "extra")
    man = export_training_shards(df, out, key_col="doc_id", n_buckets=2)
    donor = man["shards"][0]
    src = os.path.join(out, f"bucket={donor['bucket']}", donor["file"])
    shutil.copy(src, os.path.join(
        out, f"bucket={donor['bucket']}", "part-99999-extra.parquet"))
    v = verify_export(spark, out)
    assert not v["ok"] and "unmanifested" in v["reason"]
