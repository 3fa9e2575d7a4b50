"""merge_latest_wins semantic gates beyond the oracle: idempotence and
tie-breaking (ON CONFLICT DO UPDATE replays must be harmless)."""

from pyspark.sql import functions as F

from crawler_spark.operators.merge import merge_latest_wins


def _rows(df):
    return sorted(map(tuple, df.select("k", "v", "ts").collect()))


def test_reapplying_same_incoming_is_idempotent(spark):
    existing = spark.createDataFrame(
        [("a", "v1", 1), ("b", "v1", 1)], "k string, v string, ts int"
    )
    incoming = spark.createDataFrame(
        [("b", "v2", 2), ("c", "v2", 2)], "k string, v string, ts int"
    )
    once = merge_latest_wins(existing, incoming, keys=["k"], order_col="ts")
    twice = merge_latest_wins(once, incoming, keys=["k"], order_col="ts")
    assert _rows(once) == _rows(twice) == [
        ("a", "v1", 1), ("b", "v2", 2), ("c", "v2", 2)
    ]


def test_equal_timestamp_incoming_wins(spark):
    existing = spark.createDataFrame([("a", "old", 5)], "k string, v string, ts int")
    incoming = spark.createDataFrame([("a", "new", 5)], "k string, v string, ts int")
    got = merge_latest_wins(existing, incoming, keys=["k"], order_col="ts")
    assert _rows(got) == [("a", "new", 5)]


def test_stale_incoming_loses(spark):
    existing = spark.createDataFrame([("a", "fresh", 9)], "k string, v string, ts int")
    incoming = spark.createDataFrame([("a", "stale", 3)], "k string, v string, ts int")
    got = merge_latest_wins(existing, incoming, keys=["k"], order_col="ts")
    assert _rows(got) == [("a", "fresh", 9)]


def test_extra_existing_columns_projected_to_incoming_schema(spark):
    existing = spark.createDataFrame(
        [("a", "v1", 1, "junk")], "k string, v string, ts int, extra string"
    )
    incoming = spark.createDataFrame([("a", "v2", 2)], "k string, v string, ts int")
    got = merge_latest_wins(existing, incoming, keys=["k"], order_col="ts")
    assert got.columns == ["k", "v", "ts"]
    assert _rows(got) == [("a", "v2", 2)]
