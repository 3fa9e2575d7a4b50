"""Regression gates from the adversarial review of the file-pruning /
clustering diff: (1) a partially-pruned read must keep the FULL chain schema
(pruning is advisory — it must never change what columns a reader sees);
(2) float predicate values never prune (NaN ordering and >2^53 rounding make
Python comparisons diverge from Spark's — same rule as float bounds, which
are never recorded); (3) fetch_log_range on a store with no fetch_log commit
fails loudly instead of AttributeError; (4) a clustered commit without a row
hint still sizes output files from the data instead of exploding into
shuffle-partition-count near-empty files; (5) pruned chain enumeration
yields files in _chain_paths' canonical oldest-first order."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine.snapshots import SnapshotStore
from crawler_spark.engine.superstep import CrawlEngine


@pytest.fixture(scope="module")
def evostore(spark, tmp_path_factory):
    """A 2-round chain straddling an add-column upgrade: the full base has
    no `depth` column, the delta carries it — the exact mix the mergeSchema
    read exists for."""
    st = SnapshotStore(str(tmp_path_factory.mktemp("evoprune")))
    base = spark.createDataFrame(
        [(f"h0-{i}.example", f"u0-{i}", 0, 200) for i in range(8)],
        "host string, url_hash string, fetched_round int, status int",
    )
    st.commit_round(0, {"fetch_log": base}, row_hints={"fetch_log": 8})
    delta = spark.createDataFrame(
        [(f"h1-{i}.example", f"u1-{i}", 1, 200, i) for i in range(8)],
        "host string, url_hash string, fetched_round int, status int,"
        " depth int",
    )
    st.commit_round(1, {}, delta_tables={"fetch_log": delta},
                    row_hints={"fetch_log": 8})
    return st


class TestPartialPruneSchema:
    def test_pruning_out_the_new_column_files_keeps_the_column(
        self, spark, evostore
    ):
        # keeps only the pre-upgrade base file; `depth` lives only in the
        # pruned-out delta — the read must still surface it (null-filled),
        # exactly like the unpruned mergeSchema read does
        pred = [("fetched_round", "==", 0)]
        io = evostore.prune_stats("fetch_log", pred)
        assert io["files_kept"] == 1 and io["files_total"] == 2
        pruned = evostore.read(spark, "fetch_log", prune=pred)
        full = evostore.read(spark, "fetch_log")
        assert pruned.columns == full.columns
        got = pruned.filter(F.col("fetched_round") == 0)
        assert got.count() == 8
        assert got.filter(F.col("depth").isNull()).count() == 8

    def test_no_files_dropped_matches_unpruned_schema(self, spark, evostore):
        pruned = evostore.read(
            spark, "fetch_log", prune=[("fetched_round", ">=", 0)]
        )
        full = evostore.read(spark, "fetch_log")
        assert pruned.columns == full.columns
        assert pruned.count() == full.count() == 16


class TestFloatPredicates:
    def test_nan_predicate_value_never_prunes(self, spark, evostore):
        io = evostore.prune_stats(
            "fetch_log", [("fetched_round", "<=", float("nan"))]
        )
        assert io["files_kept"] == io["files_total"]
        # and the pruned read still returns every row pre-filter
        df = evostore.read(
            spark, "fetch_log",
            prune=[("fetched_round", "<=", float("nan"))],
        )
        assert df.count() == 16

    def test_plain_float_value_never_prunes(self, evostore):
        io = evostore.prune_stats("fetch_log", [("fetched_round", ">", 0.5)])
        assert io["files_kept"] == io["files_total"]


class TestFetchLogRangeGuard:
    def test_fresh_store_raises_not_attributeerror(self, spark, tmp_path):
        eng = CrawlEngine(spark, str(tmp_path / "fresh"), {}, {})
        with pytest.raises(ValueError, match="fetch_log"):
            eng.fetch_log_range(0, 5)


class TestClusteredWriteFileCount:
    def test_cluster_by_without_hint_derives_file_count(self, spark, tmp_path):
        st = SnapshotStore(str(tmp_path / "clust"))
        df = spark.createDataFrame(
            [(f"h{i % 7:02d}.example", f"u-{i:04d}", 0, 200)
             for i in range(200)],
            "host string, url_hash string, fetched_round int, status int",
        )
        st.commit_round(
            0, {}, delta_tables={"fetch_log": df},
            cluster_by={"fetch_log": ["host"]},
        )
        lineage = st.manifest()["rounds"][0]["tables"]["fetch_log"]["lineage"]
        # 200 rows @ ROWS_PER_FILE=4M -> exactly one file, not one per
        # shuffle partition
        assert len(lineage) == 1
        assert lineage[0]["rows"] == 200


class TestPrunedPathOrder:
    def test_enumeration_order_matches_chain_paths(self, evostore):
        chain = SnapshotStore._live_chain(
            evostore.manifest()["rounds"], "fetch_log"
        )
        canonical = SnapshotStore._chain_paths(chain)
        kept, _ = evostore._pruned_chain_paths(chain, [])
        dirs_in_order = []
        for p in kept:
            d = os.path.dirname(p) if not os.path.isdir(p) else p
            if not dirs_in_order or dirs_in_order[-1] != d:
                dirs_in_order.append(d)
        assert dirs_in_order == canonical
