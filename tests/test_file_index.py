"""Per-file bloom index sidecars (Iceberg puffin analogue): point-lookup
pruning on hash-distributed key columns, where min/max bounds are useless
(every file's url_hash bounds straddle the whole hex space — the reason the
reference needs btree ix_crawled_page_url_hash, current_schema.sql:1441).

Contract under test: (1) no false negatives ever — a committed key's file is
ALWAYS kept; (2) pruning is advisory — pruned-read results equal unpruned
filter results for present AND absent keys; (3) only int/string columns
build; (4) the sidecar lives inside the commit dir (shared lifecycle);
(5) page_lookup on an engine crawl uses it end-to-end."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.engine.snapshots import SnapshotStore


def _mk_rows(spark, round_no: int, n: int = 40):
    return spark.createDataFrame(
        [
            (
                f"h{i % 3}.example",
                f"hash-{round_no:02d}-{i:04d}",
                round_no,
                float(i),
            )
            for i in range(n)
        ],
        "host string, url_hash string, fetched_round int, score double",
    )


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    st = SnapshotStore(str(tmp_path_factory.mktemp("fidx")))
    fi = {"pages": ["url_hash", "fetched_round", "score"]}
    st.commit_round(
        0, {"pages": _mk_rows(spark, 0)}, row_hints={"pages": 40},
        file_index=fi,
    )
    for r in (1, 2):
        st.commit_round(
            r, {}, delta_tables={"pages": _mk_rows(spark, r)},
            row_hints={"pages": 40}, file_index=fi,
        )
    return st


class TestBuild:
    def test_sidecar_inside_commit_dir(self, store):
        man = store.manifest()
        for r in man["rounds"]:
            info = r["tables"]["pages"]
            assert os.path.exists(
                os.path.join(info["path"], SnapshotStore.INDEX_SIDECAR)
            )
            # int + string columns build; the float column is skipped
            # (same exclusion as min/max bounds — NaN/2^53 hazards)
            assert sorted(info["file_index"]) == [
                "fetched_round", "url_hash",
            ]

    def test_sidecar_invisible_to_spark_reads(self, spark, store):
        assert store.read(spark, "pages").count() == 120


class TestNoFalseNegatives:
    def test_every_committed_key_keeps_its_file(self, spark, store):
        """The bloom guarantee that makes pruning safe: for EVERY committed
        url_hash, the pruned read returns exactly the unpruned filter's
        rows (the key's file was never dropped)."""
        keys = [
            f"hash-{r:02d}-{i:04d}" for r in range(3) for i in range(0, 40, 7)
        ]
        for h in keys:
            pred = [("url_hash", "==", h)]
            got = (
                store.read(spark, "pages", prune=pred)
                .filter(F.col("url_hash") == h)
                .count()
            )
            assert got == 1, h


class TestPruning:
    def test_point_lookup_skips_other_rounds_files(self, store):
        io = store.prune_stats(
            "pages", [("url_hash", "==", "hash-01-0005")]
        )
        assert io["files_total"] == 3
        # the key lives in round 1's single file; FP on the other two is
        # possible in principle (~1% each) but deterministic for this
        # fixture — pruning must at minimum beat the no-index read
        assert 1 <= io["files_kept"] < io["files_total"]

    def test_absent_key_prunes_everything_or_nearly(self, spark, store):
        pred = [("url_hash", "==", "hash-99-9999")]
        io = store.prune_stats("pages", pred)
        assert io["files_kept"] < io["files_total"]
        df = store.read(spark, "pages", prune=pred).filter(
            F.col("url_hash") == "hash-99-9999"
        )
        assert df.count() == 0
        # schema survives even a fully-pruned read
        assert set(df.columns) == {
            "host", "url_hash", "fetched_round", "score",
        }

    def test_int_column_blooms_probe(self, store):
        # fetched_round == 1: min/max alone already isolates round 1's
        # file here, but the bloom must AGREE (keep it), never fight it
        io = store.prune_stats("pages", [("fetched_round", "==", 1)])
        assert io["files_kept"] == 1

    def test_float_predicate_never_bloom_pruned(self, store):
        io = store.prune_stats("pages", [("score", "==", 5.0)])
        assert io["files_kept"] == io["files_total"]

    def test_non_equality_ops_ignore_blooms(self, store):
        # range predicate on the indexed string col: blooms answer only ==,
        # min/max bounds still apply (every file matches this prefix range)
        io = store.prune_stats("pages", [("url_hash", ">=", "hash-00")])
        assert io["files_kept"] == io["files_total"]

    def test_unindexed_store_unaffected(self, spark, tmp_path):
        st = SnapshotStore(str(tmp_path / "noidx"))
        st.commit_round(0, {"pages": _mk_rows(spark, 0)})
        info = st.manifest()["rounds"][0]["tables"]["pages"]
        assert "file_index" not in info
        assert not os.path.exists(
            os.path.join(info["path"], SnapshotStore.INDEX_SIDECAR)
        )
        # min/max bounds may still prune (strings have usable bounds here);
        # correctness: the key's own file is never dropped
        pred = [("url_hash", "==", "hash-00-0005")]
        got = (
            st.read(spark, "pages", prune=pred)
            .filter(F.col("url_hash") == "hash-00-0005")
            .count()
        )
        assert got == 1


class TestReviewRegressions:
    """Gates from the adversarial review of the file-index/rollback diff."""

    def test_cross_type_predicate_never_bloom_prunes(self, store):
        # int column probed with a string value: hashes live in different
        # domains — the bloom must refuse to answer (kind mismatch), same
        # advisory rule as _file_may_match's TypeError guard
        io = store.prune_stats("pages", [("fetched_round", "==", "1")])
        assert io["files_kept"] == io["files_total"]

    def test_statsless_files_still_bloom_prune(self, spark, tmp_path):
        # every column's min/max is dropped (64-hex sha256 > STATS_MAX_LEN),
        # so the files carry NO stats — the pre-bloom code kept the whole
        # dir; the bloom index must still prune point lookups here, which
        # is exactly the production pages-table shape
        st = SnapshotStore(str(tmp_path / "nostats"))
        long_hash = "a" * 63

        def rows(r):
            return spark.createDataFrame(
                [(f"{long_hash}{r}{i:03d}"[:64] + f"{r}{i:03d}",)
                 for i in range(10)],
                "url_hash string",
            )

        st.commit_round(0, {"pages": rows(0)}, row_hints={"pages": 10},
                        file_index={"pages": ["url_hash"]})
        for r in (1, 2):
            st.commit_round(r, {}, delta_tables={"pages": rows(r)},
                            row_hints={"pages": 10},
                            file_index={"pages": ["url_hash"]})
        man = st.manifest()["rounds"][0]["tables"]["pages"]
        assert all("stats" not in it for it in man["lineage"])
        key = rows(1).head()["url_hash"]
        io = st.prune_stats("pages", [("url_hash", "==", key)])
        assert io["files_kept"] < io["files_total"]
        got = (
            st.read(spark, "pages", prune=[("url_hash", "==", key)])
            .filter(F.col("url_hash") == key)
            .count()
        )
        assert got == 1

    def test_recommit_after_rollback_invalidates_bloom_cache(
        self, spark, tmp_path
    ):
        # rollback deletes commit dirs that a re-run recreates at IDENTICAL
        # paths; a stale cached bloom would prove the new keys absent and
        # silently drop their files
        st = SnapshotStore(str(tmp_path / "cache"))
        fi = {"pages": ["url_hash"]}
        st.commit_round(0, {"pages": _mk_rows(spark, 0)},
                        row_hints={"pages": 40}, file_index=fi)
        st.commit_round(1, {}, delta_tables={"pages": _mk_rows(spark, 1)},
                        row_hints={"pages": 40}, file_index=fi)
        # warm the cache on round 1's sidecar
        st.prune_stats("pages", [("url_hash", "==", "hash-01-0000")])
        st.rollback(0)
        # re-run round 1 with DIFFERENT keys at the same delta path
        new = spark.createDataFrame(
            [("h0.example", f"fresh-{i:04d}", 1, 0.0) for i in range(40)],
            "host string, url_hash string, fetched_round int, score double",
        )
        st.commit_round(1, {}, delta_tables={"pages": new},
                        row_hints={"pages": 40}, file_index=fi)
        pred = [("url_hash", "==", "fresh-0007")]
        assert st.prune_stats("pages", pred)["files_kept"] >= 1
        got = (
            st.read(spark, "pages", prune=pred)
            .filter(F.col("url_hash") == "fresh-0007")
            .count()
        )
        assert got == 1


class TestEngineLookup:
    @pytest.fixture(scope="class")
    def engine(self, spark, tmp_path_factory):
        from crawler_spark.engine.corpus import (
            CorpusSpec, build_corpus, robots_map, seed_urls,
        )
        from crawler_spark.engine.superstep import CrawlEngine

        spec = CorpusSpec(n_hosts=2, listing_pages=2, details_per_page=3)
        eng = CrawlEngine(
            spark, str(tmp_path_factory.mktemp("fidxeng")),
            build_corpus(spec), robots_map(spec), per_host_budget=4,
            file_index={"pages": ["url_hash"], "fetch_log": ["url_hash"]},
        )
        eng.run(seeds=seed_urls(spec), max_rounds=10)
        return eng

    def test_page_lookup_parity_and_pruning(self, spark, engine):
        pages = engine.store.read(spark, "pages")
        some = [r["url_hash"] for r in pages.select("url_hash").head(3)]
        for h in some:
            via_lookup = sorted(
                map(tuple, engine.page_lookup(h).collect())
            )
            via_filter = sorted(
                map(tuple, pages.filter(F.col("url_hash") == h).collect())
            )
            assert via_lookup == via_filter and via_lookup
        io = engine.store.prune_stats(
            "pages", [("url_hash", "==", some[0])]
        )
        assert io["files_kept"] < io["files_total"]

    def test_absent_hash_empty(self, engine):
        assert engine.page_lookup("no-such-hash").count() == 0
