"""Manifest min/max file pruning (Iceberg's manifest-entry lower/upper-bound
file skipping): commit_round records per-file column bounds from the parquet
footers; read(prune=[(col, op, val), ...]) skips chain files whose bounds
prove no row can match. Gates: result parity with the unpruned read + real
filter, exact skip accounting on a round-partitioned chain, conservative
keep for stat-less commits / incomparable predicates, and merge-on-read
delete keys still applied under pruning."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine.snapshots import SnapshotStore

N_ROUNDS = 5
ROWS_PER_ROUND = 40


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    """An aged append-only chain: one full base + N-1 deltas of fetch_log,
    each round's rows carrying that round's fetched_round and a disjoint
    host range (hosts sort by round: h0* < h1* < ...)."""
    st = SnapshotStore(str(tmp_path_factory.mktemp("prune")))
    for rnd in range(N_ROUNDS):
        rows = [
            (f"h{rnd}-{i % 4:02d}.example", f"u{rnd}-{i:04d}", rnd, 200)
            for i in range(ROWS_PER_ROUND)
        ]
        df = spark.createDataFrame(
            rows, "host string, url_hash string, fetched_round int, status int"
        )
        if rnd == 0:
            st.commit_round(rnd, {"fetch_log": df},
                            row_hints={"fetch_log": ROWS_PER_ROUND})
        else:
            st.commit_round(rnd, {}, delta_tables={"fetch_log": df},
                            row_hints={"fetch_log": ROWS_PER_ROUND})
    return st


def _collected(df):
    return sorted(tuple(r) for r in df.collect())


class TestBoundsRecorded:
    def test_manifest_carries_per_file_bounds(self, store):
        for entry in store.manifest()["rounds"]:
            info = entry["tables"]["fetch_log"]
            for item in info["lineage"]:
                assert "stats" in item, (entry["round"], item)
                lo, hi = item["stats"]["fetched_round"]
                assert lo == hi == entry["round"]
                # string bounds too (hosts are short ASCII)
                hlo, hhi = item["stats"]["host"]
                assert hlo.startswith(f"h{entry['round']}-")
                assert hhi.startswith(f"h{entry['round']}-")


class TestPrunedRead:
    def test_parity_with_unpruned_read(self, spark, store):
        pred = [("fetched_round", ">=", 3)]
        pruned = store.read(spark, "fetch_log", prune=pred).filter(
            F.col("fetched_round") >= 3
        )
        full = store.read(spark, "fetch_log").filter(
            F.col("fetched_round") >= 3
        )
        assert _collected(pruned) == _collected(full)
        assert pruned.count() == 2 * ROWS_PER_ROUND

    def test_exact_file_skip_accounting(self, store):
        # every round wrote exactly one file (row_hints); a round-range
        # predicate keeps exactly the matching rounds' files
        io = store.prune_stats("fetch_log", [("fetched_round", ">=", 3)])
        assert io["files_total"] == N_ROUNDS
        assert io["files_kept"] == 2
        assert io["dirs_unpruned"] == 0
        io_eq = store.prune_stats("fetch_log", [("fetched_round", "==", 0)])
        assert io_eq["files_kept"] == 1

    def test_string_bounds_prune_host_ranges(self, spark, store):
        pred = [("host", "==", "h2-01.example")]
        io = store.prune_stats("fetch_log", pred)
        assert io["files_kept"] == 1
        got = store.read(spark, "fetch_log", prune=pred).filter(
            F.col("host") == "h2-01.example"
        )
        assert got.count() == ROWS_PER_ROUND // 4

    def test_all_files_pruned_yields_empty_with_schema(self, spark, store):
        df = store.read(
            spark, "fetch_log", prune=[("fetched_round", ">", 99)]
        )
        assert df.count() == 0
        assert set(df.columns) == {"host", "url_hash", "fetched_round",
                                   "status"}

    def test_conjunction_prunes_on_any_column(self, store):
        io = store.prune_stats(
            "fetch_log",
            [("fetched_round", ">=", 1), ("host", "<", "h3")],
        )
        # rounds 1 and 2 survive both bounds
        assert io["files_kept"] == 2


class TestConservativeKeeps:
    def test_incomparable_predicate_keeps_everything(self, store):
        io = store.prune_stats("fetch_log", [("fetched_round", "==", "x")])
        assert io["files_kept"] == io["files_total"] == N_ROUNDS

    def test_unknown_column_keeps_everything(self, store):
        io = store.prune_stats("fetch_log", [("no_such_col", "==", 1)])
        assert io["files_kept"] == N_ROUNDS

    def test_unsupported_op_raises(self, store):
        with pytest.raises(ValueError, match="unsupported prune op"):
            store.prune_stats("fetch_log", [("fetched_round", "!=", 1)])

    def test_statless_commit_kept_whole(self, spark, store):
        """A pre-upgrade manifest entry (no per-file stats) is read in full:
        strip one round's stats in place and re-check parity + accounting."""
        man_path = store._manifest_path
        with open(man_path) as fh:
            man = json.load(fh)
        backup = json.dumps(man)
        try:
            for item in man["rounds"][2]["tables"]["fetch_log"]["lineage"]:
                item.pop("stats", None)
            with open(man_path, "w") as fh:
                json.dump(man, fh)
            pred = [("fetched_round", ">=", 3)]
            io = store.prune_stats("fetch_log", pred)
            assert io["dirs_unpruned"] == 1  # round 2's dir kept whole
            assert io["files_kept"] == 3  # rounds 3, 4 + the stat-less dir
            got = store.read(spark, "fetch_log", prune=pred).filter(
                F.col("fetched_round") >= 3
            )
            assert got.count() == 2 * ROWS_PER_ROUND
        finally:
            with open(man_path, "w") as fh:
                fh.write(backup)

    def test_float_bounds_never_recorded(self, spark, tmp_path):
        """Parquet float min/max may omit NaN, so a float bound could prove
        absence of a row the file contains — float columns must carry no
        stats (Iceberg handles this via nan_value_counts; we prune on
        int/string keys only)."""
        st = SnapshotStore(str(tmp_path / "floats"))
        df = spark.createDataFrame(
            [(1, 0.5), (2, float("nan"))], "k int, score double"
        )
        st.commit_round(0, {"t": df}, row_hints={"t": 2})
        for item in st.manifest()["rounds"][0]["tables"]["t"]["lineage"]:
            assert "score" not in item.get("stats", {}), item
            assert "k" in item.get("stats", {})  # int bounds still recorded
        io = st.prune_stats("t", [("score", ">", 100.0)])
        assert io["files_kept"] == io["files_total"]

    def test_long_string_bounds_dropped_not_truncated(self, spark,
                                                      tmp_path):
        st = SnapshotStore(str(tmp_path / "longstr"))
        long_host = "a" * (SnapshotStore.STATS_MAX_LEN + 10) + ".example"
        df = spark.createDataFrame(
            [(long_host, 1)], "host string, fetched_round int"
        )
        st.commit_round(0, {"t": df}, row_hints={"t": 1})
        item = st.manifest()["rounds"][0]["tables"]["t"]["lineage"][0]
        assert "host" not in item.get("stats", {})
        # and a host predicate therefore keeps the file
        io = st.prune_stats("t", [("host", "==", "zzz")])
        assert io["files_kept"] == 1


class TestEngineLogRangeScan:
    def test_fetch_log_range_prunes_and_matches(self, spark, store):
        """Q8 against the live store: the engine's fetch_log_range reads
        O(range) files (tight per-delta fetched_round bounds) and returns
        exactly the full-read filter's rows."""
        from crawler_spark.engine.superstep import CrawlEngine

        eng = CrawlEngine(spark, store.root, {}, {})
        got = eng.fetch_log_range(1, 2)
        want = store.read(spark, "fetch_log").filter(
            F.col("fetched_round").between(1, 2)
        )
        assert _collected(got) == _collected(want)
        io = store.prune_stats(
            "fetch_log",
            [("fetched_round", ">=", 1), ("fetched_round", "<=", 2)],
        )
        assert io["files_kept"] == 2 and io["files_total"] == N_ROUNDS


class TestSortOrderClustering:
    """cluster_by (Iceberg write sort order): range-partition + sort on the
    cluster keys at commit time so per-file bounds become tight and
    disjoint — a key-range read prunes to O(matching files), where the
    unclustered layout's every file straddles the whole key space."""

    HOSTS = 16

    def _df(self, spark):
        rows = [
            (f"host{h:02d}.example", f"u{h:02d}-{i:03d}", 0)
            for h in range(self.HOSTS)
            for i in range(50)
        ]
        return spark.createDataFrame(
            rows, "host string, url_hash string, fetched_round int"
        )

    def test_clustered_bounds_disjoint_and_pruned(self, spark, tmp_path):
        st = SnapshotStore(str(tmp_path / "clustered"))
        st.ROWS_PER_FILE = 100  # force 8 files from the 800-row commit
        st.commit_round(
            0, {"t": self._df(spark)},
            row_hints={"t": self.HOSTS * 50},
            cluster_by={"t": ["host"]},
        )
        lineage = st.manifest()["rounds"][0]["tables"]["t"]["lineage"]
        assert len(lineage) > 1
        spans = sorted(
            tuple(item["stats"]["host"]) for item in lineage
        )
        for (_, prev_hi), (next_lo, _) in zip(spans, spans[1:]):
            assert prev_hi <= next_lo  # disjoint (range-partitioned)
        io = st.prune_stats("t", [("host", "==", "host05.example")])
        assert io["files_kept"] == 1 and io["files_total"] == len(lineage)
        got = st.read(
            spark, "t", prune=[("host", "==", "host05.example")]
        ).filter(F.col("host") == "host05.example")
        assert got.count() == 50

    def test_unclustered_control_cannot_prune(self, spark, tmp_path):
        st = SnapshotStore(str(tmp_path / "unclustered"))
        st.ROWS_PER_FILE = 100
        # same data, hash-spread across files: every file sees ~all hosts
        st.commit_round(
            0, {"t": self._df(spark).repartition(8)},
            row_hints={"t": self.HOSTS * 50},
        )
        io = st.prune_stats("t", [("host", "==", "host05.example")])
        assert io["files_total"] > 1
        assert io["files_kept"] == io["files_total"]


class TestMergeOnReadUnderPruning:
    def test_delete_keys_still_applied(self, spark, tmp_path):
        st = SnapshotStore(str(tmp_path / "mor"))
        adds = spark.createDataFrame(
            [(f"u{i:02d}", 0, 0, i) for i in range(10)],
            "url_hash string, attempt int, scheduled_ms long, not_before long",
        )
        st.commit_round(0, {"frontier": adds}, row_hints={"frontier": 10})
        dels = spark.createDataFrame(
            [("u03", 0, 0, 3)],
            "url_hash string, attempt int, scheduled_ms long, not_before long",
        )
        st.commit_round(
            1, {}, delta_tables={"frontier_dels": dels},
            row_hints={"frontier_dels": 1},
        )
        got = st.read(
            spark, "frontier", prune=[("not_before", "<=", 5)]
        ).filter(F.col("not_before") <= 5)
        hashes = {r.url_hash for r in got.collect()}
        assert hashes == {"u00", "u01", "u02", "u04", "u05"}
