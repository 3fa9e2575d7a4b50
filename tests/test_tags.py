"""Snapshot tags (Iceberg named refs): a tag pins a committed round —
readable forever via read_at(table, 'name'), protected from
expire_snapshots (retention keeps everything from the oldest tag forward),
and dropped by a rollback past it (its history no longer exists)."""

from __future__ import annotations

import pytest

from crawler_spark.engine.snapshots import SnapshotStore


def _mk(spark, r, n=15):
    return spark.createDataFrame(
        [(f"h-{r}-{i}", r) for i in range(n)],
        "url_hash string, round int",
    )


@pytest.fixture()
def store(spark, tmp_path):
    st = SnapshotStore(str(tmp_path / "tags"))
    st.commit_round(0, {"seen": _mk(spark, 0)}, row_hints={"seen": 15})
    for r in range(1, 6):
        st.commit_round(
            r, {}, delta_tables={"seen": _mk(spark, r)},
            row_hints={"seen": 15},
        )
    return st


def test_tag_read_resolves_like_round(spark, store):
    store.tag("cut-a", 2)
    by_round = sorted(map(tuple, store.read_at(spark, "seen", 2).collect()))
    by_tag = sorted(map(tuple, store.read_at(spark, "seen", "cut-a").collect()))
    assert by_tag == by_round and len(by_tag) == 45


def test_tag_requires_committed_round(store):
    with pytest.raises(ValueError, match="not a committed round"):
        store.tag("x", 99)


def test_tag_protects_retention(spark, store):
    store.tag("cut-a", 1)
    res = store.expire_snapshots(keep_last=2)
    # oldest tag at round 1 -> rounds 1..5 kept, only round 0 expired
    assert res["kept_rounds"] == 5
    assert store.manifest()["rounds"][0]["round"] == 1
    # the tagged round stays fully readable after expiry
    assert store.read_at(spark, "seen", "cut-a").count() == 30
    # drop the tag: the next expiry reclaims down to the plain window
    store.drop_tag("cut-a")
    assert store.expire_snapshots(keep_last=2)["kept_rounds"] == 2


def test_rollback_drops_tags_above_target(store):
    store.tag("old", 1)
    store.tag("new", 4)
    store.rollback(2)
    assert store.tags() == {"old": 1}


def test_unknown_tag_raises(spark, store):
    with pytest.raises(KeyError, match="no tag"):
        store.read_at(spark, "seen", "nope")
    with pytest.raises(KeyError, match="no tag"):
        store.drop_tag("nope")
