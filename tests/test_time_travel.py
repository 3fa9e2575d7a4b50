"""SnapshotStore time travel (`read_at` = Iceberg VERSION AS OF) and commit
history (`history()` = table.history()): per-round state reconstruction over
full+delta chains, retention-window errors after expire_snapshots, and
metadata-only history."""

from __future__ import annotations

import pytest

from crawler_spark.engine.snapshots import SnapshotStore


def _df(spark, ids):
    return spark.createDataFrame([(i, f"v{i}") for i in ids], "id int, v string")


def _ids(df):
    return sorted(r["id"] for r in df.collect())


@pytest.fixture()
def store(spark, tmp_path):
    """Rounds: 0 full {0,1} · 1 delta {2} · 2 delta {3} · 3 full {0..4}
    (compaction) · 4 delta {5}."""
    st = SnapshotStore(str(tmp_path))
    st.commit_round(0, {"t": _df(spark, [0, 1])}, metrics={"phase": "init"})
    st.commit_round(1, {}, delta_tables={"t": _df(spark, [2])})
    st.commit_round(2, {}, delta_tables={"t": _df(spark, [3])})
    st.commit_round(3, {"t": _df(spark, [0, 1, 2, 3, 4])})
    st.commit_round(4, {}, delta_tables={"t": _df(spark, [5])})
    return st


def test_read_at_reconstructs_each_round(spark, store):
    expect = {0: [0, 1], 1: [0, 1, 2], 2: [0, 1, 2, 3],
              3: [0, 1, 2, 3, 4], 4: [0, 1, 2, 3, 4, 5]}
    for rnd, ids in expect.items():
        assert _ids(store.read_at(spark, "t", rnd)) == ids


def test_read_at_latest_equals_read(spark, store):
    assert _ids(store.read_at(spark, "t", store.latest_round())) == \
        _ids(store.read(spark, "t"))


def test_read_at_between_commits_resolves_backwards(spark, store):
    # a round with no commit for the table resolves to the last state <= it
    store.commit_round(5, {}, metrics={"n_due": 0})
    assert _ids(store.read_at(spark, "t", 5)) == [0, 1, 2, 3, 4, 5]


def test_read_at_before_first_commit_is_none(spark, tmp_path):
    st = SnapshotStore(str(tmp_path))
    st.commit_round(2, {"t": _df(spark, [9])})
    # round >= oldest kept but before the table's first commit
    st.commit_round(3, {"u": _df(spark, [1])})
    assert st.read_at(spark, "u", 2) is None


def test_history_is_metadata_only(store):
    h = store.history()
    assert [e["round"] for e in h] == [0, 1, 2, 3, 4]
    assert h[0]["tables"]["t"]["mode"] == "full"
    assert h[1]["tables"]["t"]["mode"] == "delta"
    assert h[1]["tables"]["t"]["rows"] == 1
    assert h[3]["tables"]["t"]["rows"] == 5
    assert all(e["committed_at"] is not None for e in h)
    assert h[0]["metrics"] == {"phase": "init"}


def test_expired_round_raises_but_live_state_survives(spark, store):
    store.expire_snapshots(keep_last=2)
    with pytest.raises(ValueError, match="expired"):
        store.read_at(spark, "t", 1)
    assert _ids(store.read(spark, "t")) == [0, 1, 2, 3, 4, 5]
    assert _ids(store.read_at(spark, "t", store.latest_round())) == \
        [0, 1, 2, 3, 4, 5]


def test_kept_delta_round_stays_readable_after_expiry(spark, store):
    """keep_last=3 keeps rounds 2,3,4; round 2 is a delta whose base
    (rounds 0-1) leaves the window. Iceberg semantics: files referenced by
    ANY retained snapshot survive — so read_at(2) must return the TRUE
    round-2 state, not raise and certainly not the silently-partial [3]
    the pre-fix code produced (found by review). The below-window dirs are
    reclaimed only once the rounds referencing them expire too."""
    import os

    r0_dir = store.manifest()["rounds"][0]["tables"]["t"]["path"]
    store.expire_snapshots(keep_last=3)
    assert os.path.isdir(r0_dir), "dir referenced by kept round 2 must survive"
    assert _ids(store.read_at(spark, "t", 2)) == [0, 1, 2, 3]
    assert _ids(store.read_at(spark, "t", 3)) == [0, 1, 2, 3, 4]
    assert _ids(store.read_at(spark, "t", 4)) == [0, 1, 2, 3, 4, 5]
    assert _ids(store.read(spark, "t")) == [0, 1, 2, 3, 4, 5]
    with pytest.raises(ValueError, match="expired"):
        store.read_at(spark, "t", 1)
    # deferred reclamation: once round 2 itself expires, its fold is
    # unreferenced and the below-window dirs go
    store.expire_snapshots(keep_last=2)
    assert not os.path.isdir(r0_dir)
    assert _ids(store.read(spark, "t")) == [0, 1, 2, 3, 4, 5]


def test_read_changes_fast_path_unions_deltas_only(spark, store):
    # (0, 2] is all-delta: the change set is the delta dirs themselves —
    # no anti-join, no scan of the standing table
    df = store.read_changes(spark, "t", 0, 2)
    assert _ids(df) == [2, 3]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Except" not in plan
    assert _ids(store.read_changes(spark, "t", 3, 4)) == [5]


def test_read_changes_across_compaction_falls_back_to_diff(spark, store):
    # (0, 3] crosses the round-3 full rewrite: manifest attribution is
    # folded away, so the change set must come from a state diff
    assert _ids(store.read_changes(spark, "t", 0, 3)) == [2, 3, 4]
    # default to_round = latest
    assert _ids(store.read_changes(spark, "t", 0)) == [2, 3, 4, 5]


def test_read_changes_edges(spark, store):
    # from before the first commit: everything at to_round is a change
    assert _ids(store.read_changes(spark, "t", -1, 0)) == [0, 1]
    # empty range: no commit of the table in (4, 4]
    assert store.read_changes(spark, "t", 4, 4) is None


def test_read_changes_merge_on_read_reflects_deletes(spark, tmp_path):
    # a delete key makes "changes" more than the adds: the frontier must
    # take the state-diff path, never the raw delta union
    from crawler_spark.engine.snapshots import FRONTIER_DELS_SCHEMA

    schema = "url_hash string, attempt int, scheduled_ms long, not_before long"

    def fr(rows):
        return spark.createDataFrame(rows, schema)

    st = SnapshotStore(str(tmp_path / "mor"))
    st.commit_round(0, {"frontier": fr([("a", 0, 0, 0), ("b", 0, 0, 0)])})
    st.commit_round(
        1, {},
        delta_tables={
            "frontier": fr([("c", 0, 0, 0)]),
            "frontier_dels": fr([("a", 0, 0, 0)]),
        },
    )
    changed = st.read_changes(spark, "frontier", 0, 1)
    assert sorted(r["url_hash"] for r in changed.collect()) == ["c"]


def test_read_changes_after_expiry_degrades_never_undercounts(spark, store):
    # expire to rounds {3, 4}: rounds 1-2's delta content folds into round
    # 3's entry as base_paths. A from_round below the window must NOT take
    # the delta-union fast path (it would silently drop rounds 1-2's rows);
    # it degrades to "everything at to_round is a change" — reprocessing,
    # never missing rows.
    store.expire_snapshots(keep_last=2)
    assert _ids(store.read_changes(spark, "t", 0)) == [0, 1, 2, 3, 4, 5]
    # inside the window the diff path still answers exactly
    assert _ids(store.read_changes(spark, "t", 3, 4)) == [5]


def test_read_changes_diff_aligns_added_columns(spark, store):
    # add-column schema evolution + a full rewrite inside the range forces
    # the exceptAll path across two schema versions: the old side must
    # align (missing column reads null) instead of raising
    wide = spark.createDataFrame(
        [(i, f"v{i}", i * 10) for i in range(7)],
        "id int, v string, extra int",
    )
    store.commit_round(5, {"t": wide})
    changed = store.read_changes(spark, "t", 2, 5)
    ids = sorted(r["id"] for r in changed.collect())
    # rows 0-3 existed at round 2 but EVERY round-5 row differs from its
    # round-2 self (extra: null -> value), so all 7 are changes — the
    # correct CDC answer for a column backfill
    assert ids == [0, 1, 2, 3, 4, 5, 6]
    assert "extra" in changed.columns
