"""Snapshot-committed table store (Iceberg semantics over plain parquet).

The sandbox has no Iceberg runtime jar, so the engine gets Iceberg's two
load-bearing behaviors from first principles (same design, swappable for real
Iceberg on a cluster — the engine only calls read/commit/latest):

  * ATOMIC COMMIT: a round writes every table to
    `<root>/<table>/snap-<round>/` (parquet), then commits by atomic
    os.replace of `<root>/_manifest.json` — readers see the old snapshot set
    or the new one, never a mix. A crash mid-round leaves orphan snap dirs
    (harmless, like uncommitted Iceberg data files) and the previous manifest.
  * TIME TRAVEL / RESUME: the manifest records, per round: every table's
    snapshot path, per-partition row counts (lineage), and the round metrics
    (fetched/parsed/deduped/excluded/retried). `resume()` = read latest
    manifest and continue from round+1 — the checkpoint requirement of the
    north rule.
  * DELTA APPENDS (Iceberg fast-append): append-only tables (seen without
    TTL, fetch_log, dlq, retry_history, pages without re-crawl) commit only
    the round's NEW rows to `<root>/<table>/delta-<round>/`; a read unions
    the live chain — every delta back to (and including) the most recent
    full snapshot. Per-round write IO is therefore O(delta), not O(|table|),
    no matter how old the crawl is. The engine compacts (writes full) on its
    shard-rebuild cadence, bounding the chain length — the analogue of
    Iceberg manifest compaction / rewrite_data_files.

At 100 TB each table write is a partitioned parquet/Iceberg append; the
manifest stays O(tables x rounds) — metadata, not data.
"""

from __future__ import annotations

import json
import os
import pickle
import time
from typing import Any

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The frontier's full row identity — the equality-delete key of the
# merge-on-read commit model AND the engine's selection anti-join key (no
# two frontier rows can share all four; see superstep.py's selection
# comment). One source of truth: the engine imports it from here.
FRONTIER_ROW_KEY = ["url_hash", "attempt", "scheduled_ms", "not_before"]
FRONTIER_DELS_SCHEMA = (
    "url_hash string, attempt int, scheduled_ms long, not_before long"
)


class SnapshotStore:
    ROWS_PER_FILE = 4_000_000  # target rows per written parquet file

    # Iceberg v2 merge-on-read: data table -> its equality-delete table.
    # read()/read_at() resolve the pair (adds ANTI-JOIN delete keys), so
    # EVERY reader — engine, tests, time travel, external consumers — sees
    # live rows only, exactly as Iceberg applies delete files inside the
    # table scan rather than leaving it to each caller.
    MERGE_ON_READ = {"frontier": "frontier_dels"}

    # One sidecar per commit dir holding every indexed column's per-file
    # bloom (Iceberg's puffin file, one object-store RTT to load).
    # Underscore prefix = invisible to Spark/Hadoop file listings, and the
    # sidecar shares its data dir's lifecycle (expiry/rollback/orphan
    # reclamation delete the dir, sidecar included) — zero extra GC code.
    INDEX_SIDECAR = "_file_index.pkl"
    INDEX_BITS_PER_KEY = 10  # ~0.9% FP at k=7 — a false KEEP costs one file

    def __init__(self, root: str):
        self.root = root
        # parsed file-index sidecars, keyed by sidecar path (commit dirs are
        # immutable, so no invalidation); bounded FIFO
        self._index_cache: dict[str, dict[str, dict[str, Any]]] = {}
        os.makedirs(root, exist_ok=True)

    # Column-stats bounds longer than this are dropped rather than stored
    # (Iceberg's write.metadata.metrics truncate(16) — we drop instead of
    # truncate-and-increment to keep the manifest logic obviously safe).
    STATS_MAX_LEN = 40

    @classmethod
    def _footer_stats(cls, md: Any) -> dict[str, list[Any]]:
        """Per-column [min, max] from one parquet file's footer metadata —
        Iceberg's per-data-file lower_bounds/upper_bounds, the basis of
        manifest-level file pruning. Conservative by construction: a column
        appears ONLY when every row group carries usable min/max of a
        JSON-storable scalar type; pruning treats a missing column as
        'file may contain anything'."""
        bounds: dict[str, list[Any]] = {}
        dropped: set[str] = set()
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if "." in name or name in dropped:  # nested leaf: skip
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    dropped.add(name)
                    bounds.pop(name, None)
                    continue
                lo, hi = st.min, st.max
                if isinstance(lo, bytes):
                    try:
                        lo, hi = lo.decode("utf-8"), hi.decode("utf-8")
                    except (UnicodeDecodeError, AttributeError):
                        dropped.add(name)
                        bounds.pop(name, None)
                        continue
                # floats excluded deliberately: parquet writers may omit
                # NaN from min/max, so float bounds can EXCLUDE rows the
                # file contains — Iceberg tracks nan_value_counts for this;
                # we prune on int/string keys only (rounds, hosts, hashes)
                ok = all(
                    isinstance(v, (int, str, bool))
                    and not isinstance(v, float)
                    and not (
                        isinstance(v, str) and len(v) > cls.STATS_MAX_LEN
                    )
                    for v in (lo, hi)
                )
                if not ok:
                    dropped.add(name)
                    bounds.pop(name, None)
                    continue
                if name in bounds:
                    prev_lo, prev_hi = bounds[name]
                    bounds[name] = [min(prev_lo, lo), max(prev_hi, hi)]
                else:
                    bounds[name] = [lo, hi]
        return bounds

    @classmethod
    def _footer_lineage(cls, path: str) -> list[dict[str, Any]] | None:
        """Per-file row counts AND column min/max bounds straight from the
        local parquet footers (Iceberg's commit-time file stats). Returns
        None when the path is not a local directory (cluster object store) —
        caller falls back to one Spark scan of the written files (row counts
        only; files without stats are never pruned)."""
        if not os.path.isdir(path):
            return None
        try:
            import pyarrow.parquet as pq

            out = []
            for name in sorted(os.listdir(path)):
                if name.endswith(".parquet") and not name.startswith("."):
                    full = os.path.join(path, name)
                    md = pq.ParquetFile(full).metadata
                    item: dict[str, Any] = {
                        "partition": name,
                        "rows": int(md.num_rows),
                    }
                    stats = cls._footer_stats(md)
                    if stats:
                        item["stats"] = stats
                    out.append(item)
            return out
        except Exception:
            return None

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def manifest(self) -> dict[str, Any]:
        if not os.path.exists(self._manifest_path):
            return {"rounds": []}
        with open(self._manifest_path) as fh:
            return json.load(fh)

    def latest_round(self) -> int:
        rounds = self.manifest()["rounds"]
        return rounds[-1]["round"] if rounds else -1

    def _flip_manifest(self, man: dict[str, Any]) -> None:
        """THE atomic commit point, shared by every mutation path
        (commit/publish/drop/expire): tmp write + os.replace so readers see
        either the old manifest or the new one, never a partial file."""
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(man, fh, indent=1)
        os.replace(tmp, self._manifest_path)

    @staticmethod
    def _live_chain(rounds: list[dict], table: str) -> list[tuple[int, dict]]:
        """Newest-first [(round_list_index, table_info)] entries forming the
        table's live state: deltas accumulate until a terminal entry — a full
        snapshot, or any entry carrying folded `base_paths` (expire_snapshots
        attaches those when the chain's older half left the kept window)."""
        chain: list[tuple[int, dict]] = []
        for i in range(len(rounds) - 1, -1, -1):
            info = rounds[i]["tables"].get(table)
            if info is None:
                continue
            chain.append((i, info))
            if info.get("mode", "full") != "delta" or "base_paths" in info:
                break
        return chain

    @staticmethod
    def _chain_paths(chain: list[tuple[int, dict]]) -> list[str]:
        """Oldest-first parquet paths for a live chain from _live_chain."""
        if not chain:
            return []
        paths = [info["path"] for _, info in chain]  # newest-first
        paths.extend(reversed(chain[-1][1].get("base_paths", [])))
        return list(reversed(paths))

    @staticmethod
    def _is_live(path: str, live: set[str]) -> bool:
        """A dir is live if referenced directly OR if any live reference
        points INSIDE it — file-level fold refs (base_paths holding file
        paths) must keep the parent snap dir on disk."""
        return path in live or any(
            x.startswith(path + os.sep) for x in live
        )

    @staticmethod
    def _chain_rows(chain: list[tuple[int, dict]]) -> int:
        return (
            sum(info.get("rows", 0) for _, info in chain)
            + chain[-1][1].get("base_rows", 0)
            if chain
            else 0
        )

    def table_paths(self, table: str) -> list[str]:
        """Oldest-first parquet paths whose union is the table's RAW live
        state (for merge-on-read tables: the adds chain, pre-resolution)."""
        return self._chain_paths(
            self._live_chain(self.manifest()["rounds"], table)
        )

    def chain_length(self, table: str) -> int:
        """Number of manifest entries (1 terminal + N deltas) forming the
        table's live chain — what compaction cadences must bound."""
        return len(self._live_chain(self.manifest()["rounds"], table))

    def table_path(self, table: str) -> str | None:
        """Newest path of `table` (the full snapshot, or the newest delta —
        use table_paths()/read() for the complete live state)."""
        paths = self.table_paths(table)
        return paths[-1] if paths else None

    # ------------------------------------------------ manifest file pruning

    @staticmethod
    def _file_may_match(
        stats: dict[str, list[Any]] | None,
        predicates: list[tuple[str, str, Any]],
    ) -> bool:
        """Can a file whose footer bounds are `stats` contain a row
        satisfying EVERY predicate? Missing stats (column absent, no-stats
        file, incomparable types) answer yes — pruning must never drop a
        file it cannot prove empty. Bounds prove only absence: the caller
        still applies the real filter to the rows."""
        if not stats:
            return True
        for col, op, val in predicates:
            if isinstance(val, float):
                # same rule as float BOUNDS (never recorded): NaN ordering
                # and >2^53 rounding make Python float comparisons diverge
                # from Spark's — a float predicate value never prunes
                continue
            mm = stats.get(col)
            if mm is None:
                continue
            lo, hi = mm
            try:
                if op == "==":
                    if not (lo <= val and val <= hi):
                        return False
                elif op == "<=":
                    if not lo <= val:
                        return False
                elif op == "<":
                    if not lo < val:
                        return False
                elif op == ">=":
                    if not hi >= val:
                        return False
                elif op == ">":
                    if not hi > val:
                        return False
                else:
                    raise ValueError(f"unsupported prune op: {op!r}")
            except TypeError:
                # predicate value not comparable with the stored bounds
                # (e.g. str vs int) — cannot prove absence, keep the file
                continue
        return True

    # --------------------------------------------- per-file bloom indexes

    @staticmethod
    def _index_key_hashes(values: Any) -> np.ndarray:
        """Deterministic uint64 keys for file-index blooms, shared by build
        (column values) and probe (the predicate constant): pandas'
        fixed-key siphash — stable across processes/sessions, vectorized.
        Integer widths normalize to int64 (hash-identical); strings stay
        object. Floats never reach here (same exclusion as min/max stats)."""
        import pandas as pd

        arr = np.asarray(values)
        if arr.dtype.kind in ("i", "u"):
            arr = arr.astype(np.int64, copy=False)
        else:
            arr = arr.astype(object)
        return pd.util.hash_array(arr)

    def _build_file_index(
        self, path: str, lineage: list[dict[str, Any]], cols: list[str]
    ) -> list[str]:
        """Per-file bloom filters for point-lookup pruning — Iceberg's
        puffin blob sidecar. min/max bounds prune RANGE predicates but are
        useless for uniformly-distributed keys (every file's url_hash
        bounds straddle the whole hex space); a 10-bits/key bloom answers
        `==` on exactly those columns for ~1.25 bytes/row of metadata.
        Local-store commits only (the production analogue is Iceberg's
        write.metadata bloom properties); int/string columns only; a column
        that fails to build is skipped whole — pruning must stay advisory."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from crawler_spark.kernels.membership import BloomFilter

        def _kind(t: Any) -> str | None:
            if pa.types.is_integer(t):
                return "i"
            if pa.types.is_string(t) or pa.types.is_large_string(t):
                return "s"
            return None

        # {col: {"kind": "i"|"s", "files": {fname: blob}}} — the kind lets
        # the probe refuse cross-type predicate values (an int bloom probed
        # with a string hashes into a different domain and would prune
        # files Spark's cast-based equality matches)
        blooms: dict[str, dict[str, Any]] = {}
        try:
            # eligibility from the schema of the first file — no data read
            # for ineligible (float/nested) columns, one table read per file
            first = os.path.join(path, lineage[0]["partition"])
            schema = pq.ParquetFile(first).schema_arrow
            eligible = {
                c: k
                for c in cols
                if c in schema.names
                and (k := _kind(schema.field(c).type)) is not None
            }
            if not eligible:
                return []
            for item in lineage:
                tbl = pq.read_table(
                    os.path.join(path, item["partition"]),
                    columns=list(eligible),
                )
                for col, kind in eligible.items():
                    vals = (
                        tbl.column(col).drop_null()
                        .to_numpy(zero_copy_only=False)
                    )
                    bf = BloomFilter.for_capacity(
                        max(1, len(vals)),
                        bits_per_key=self.INDEX_BITS_PER_KEY,
                    )
                    if len(vals):
                        bf.add_many(self._index_key_hashes(vals))
                    blooms.setdefault(
                        col, {"kind": kind, "files": {}}
                    )["files"][item["partition"]] = bf.to_bytes()
        except Exception:
            return []  # index build is best-effort; pruning stays advisory
        with open(os.path.join(path, self.INDEX_SIDECAR), "wb") as fh:
            pickle.dump(blooms, fh)
        self._index_cache.pop(path, None)  # a rewrite invalidates any cache
        return sorted(blooms)

    def _load_file_index(
        self, path: str
    ) -> dict[str, dict[str, Any]] | None:
        """Parsed {col: {file: BloomFilter}} for a commit dir, cached.
        Any read problem answers None — the caller keeps every file."""
        from crawler_spark.kernels.membership import BloomFilter

        cached = self._index_cache.get(path)
        if cached is not None:
            return cached
        sidecar = os.path.join(path, self.INDEX_SIDECAR)
        try:
            with open(sidecar, "rb") as fh:
                raw = pickle.load(fh)
            parsed = {
                col: {
                    "kind": spec["kind"],
                    "files": {
                        f: BloomFilter.from_bytes(b)
                        for f, b in spec["files"].items()
                    },
                }
                for col, spec in raw.items()
            }
        except Exception:
            return None
        if len(self._index_cache) >= 64:
            self._index_cache.pop(next(iter(self._index_cache)))
        self._index_cache[path] = parsed
        return parsed

    def _pruned_chain_paths(
        self,
        chain: list[tuple[int, dict]],
        predicates: list[tuple[str, str, Any]],
    ) -> tuple[list[str], dict[str, int]]:
        """File-level read set for a live chain after manifest min/max
        pruning (Iceberg's manifest-entry lower/upper-bound filtering).
        Entries without per-file lineage stats — pre-upgrade commits, the
        non-local Spark-scan fallback, folded base_paths — are kept whole
        (dir paths); everything else is enumerated per file."""
        kept: list[str] = []
        io = {"files_total": 0, "files_kept": 0, "dirs_unpruned": 0}
        # equality predicates a per-file bloom can answer (int/string only —
        # the types the index builds over; bool/float never probe). Each
        # value is hashed ONCE here, and carries its type kind so the probe
        # can refuse a cross-type match (int bloom vs string value)
        eq_preds = [
            (
                c,
                "i" if isinstance(v, int) else "s",
                self._index_key_hashes([v]),
            )
            for c, op, v in predicates
            if op == "=="
            and not isinstance(v, bool)
            and isinstance(v, (int, str))
        ]
        # _chain_paths' canonical oldest-first order: folded base dirs
        # first (stored order), then chain entries oldest-first — readers
        # (mergeSchema field order) must see the same order pruned or not
        if chain:
            term = chain[-1][1]
            if term.get("base_unique") and term.get("base_files"):
                # file-level fold refs: individually bloom-prunable through
                # their ORIGINAL dir's sidecar (min/max stats stayed with
                # the old entry, but the sidecar lives beside the files)
                for path, _rows in term["base_files"]:
                    parent, fname = os.path.split(path)
                    io["files_total"] += 1
                    fidx = self._load_file_index(parent) if eq_preds else None
                    if fidx is not None and not self._bloom_may_match(
                        fidx, fname, eq_preds
                    ):
                        continue
                    io["files_kept"] += 1
                    kept.append(path)
            else:
                for base in term.get("base_paths", []):
                    io["dirs_unpruned"] += 1
                    kept.append(base)
        for _, info in reversed(chain):
            lineage = info.get("lineage") or []
            idx_cols = [
                c
                for c, _, _ in eq_preds
                if c in (info.get("file_index") or [])
            ]
            fidx = self._load_file_index(info["path"]) if idx_cols else None
            # zero-row files can never satisfy any predicate — they carry
            # no footer stats (nothing to bound) but are prunable outright,
            # and must not force the stats-completeness fallback below
            live = [it for it in lineage if it.get("rows", 0) > 0]
            io["files_total"] += len(lineage)
            incomplete = any("stats" not in it for it in live)
            if not lineage or (incomplete and fidx is None):
                # no lineage, or partial stats with no bloom index: keep the
                # whole dir — counting its files as kept keeps the ratio
                # honest. With a bloom index, stats-less files can still be
                # bloom-pruned per file below (a sha256 key column exceeds
                # STATS_MAX_LEN, so its files may carry NO min/max at all —
                # exactly the case the bloom index exists for).
                io["files_kept"] += len(lineage)
                io["dirs_unpruned"] += 1
                kept.append(info["path"])
                continue
            for item in live:
                if not self._file_may_match(item.get("stats"), predicates):
                    continue
                if fidx is not None and not self._bloom_may_match(
                    fidx, item["partition"], eq_preds
                ):
                    continue
                io["files_kept"] += 1
                kept.append(os.path.join(info["path"], item["partition"]))
        return kept, io

    @staticmethod
    def _bloom_may_match(
        fidx: dict[str, dict[str, Any]],
        fname: str,
        eq_preds: list[tuple[str, str, Any]],
    ) -> bool:
        """False only when some indexed column's per-file bloom PROVES the
        predicate value absent (no false negatives by construction). A
        missing bloom for this file keeps it, and so does a predicate whose
        value type differs from the indexed column's (mirrors
        _file_may_match's TypeError rule — Spark's cast-based equality
        could still match rows the foreign-type hash would miss)."""
        for col, kind, hashed in eq_preds:
            spec = fidx.get(col)
            if spec is None or spec["kind"] != kind:
                continue
            bf = spec["files"].get(fname)
            if bf is not None and not bool(bf.contains_many(hashed)[0]):
                return False
        return True

    @staticmethod
    def _union_columns(chain: list[tuple[int, dict]]) -> list[tuple[str, str]]:
        """(name, simpleString type) union over the chain's manifest column
        records, oldest-first — the chain's merged schema without touching
        a single parquet footer. Entries committed before column recording
        contribute nothing (conservative: a pruned read then surfaces
        whatever the kept files carry, never inventing columns)."""
        cols: list[tuple[str, str]] = []
        seen: set[str] = set()
        for _, info in reversed(chain):
            for name, dt in info.get("columns") or []:
                if name not in seen:
                    seen.add(name)
                    cols.append((name, dt))
        return cols

    def _align_pruned_schema(
        self, df: DataFrame, chain: list[tuple[int, dict]]
    ) -> DataFrame:
        """Pruning is advisory — it must never change what columns a reader
        sees. A predicate that prunes out every file of a post-upgrade delta
        would otherwise silently DROP the column the delta introduced
        (add-column evolution); re-add such columns as typed nulls, exactly
        what the unpruned mergeSchema read yields for the old files."""
        spec = self._union_columns(chain)
        have = set(df.columns)
        for name, dtype in spec:
            if name not in have:
                df = df.withColumn(name, F.lit(None).cast(dtype))
        if set(df.columns) == {n for n, _ in spec}:
            df = df.select(*[n for n, _ in spec])
        return df

    def prune_stats(
        self, table: str, predicates: list[tuple[str, str, Any]]
    ) -> dict[str, int]:
        """File-skipping accounting for a pruned read of `table`'s live
        chain — what BENCH reports as read amplification."""
        chain = self._live_chain(self.manifest()["rounds"], table)
        _, io = self._pruned_chain_paths(chain, predicates)
        return io

    # ------------------------------------------------ read-side merge policy

    def set_read_policy(
        self, table: str, keys: list[str], order_cols: list[str]
    ) -> None:
        """Register a LATEST-WINS read policy for `table` (the Iceberg
        MERGE INTO analogue read-side): chain deltas may carry newer
        VERSIONS of existing keys (e.g. TTL re-crawled pages), and read()
        resolves one row per key — greatest `order_cols` (descending,
        newest chain element first) wins. Persisted in the manifest so any
        reader of the store resolves identically. Idempotent."""
        man = self.manifest()
        pol = man.setdefault("read_policies", {})
        want = {"keys": list(keys), "order": list(order_cols)}
        if pol.get(table) != want:
            pol[table] = want
            self._flip_manifest(man)

    def _latest_wins_window(self, policy: dict):
        from pyspark.sql import Window

        return Window.partitionBy(*policy["keys"]).orderBy(
            *[F.col(c).desc() for c in policy["order"]]
        )

    def _resolve_latest_wins_chain(
        self, spark: SparkSession, chain: list[tuple[int, dict]], policy: dict
    ) -> DataFrame:
        """Latest-wins resolution WITHOUT shuffling the base: walk chain
        elements newest-first; each element dedups within itself (a window
        over that element only — delta-sized), then anti-joins the keys
        already claimed by newer elements (broadcast — the claimed set is
        bounded by the rounds-since-fold delta volume, the same budget
        argument as the frontier's equality-delete broadcast). The terminal
        full snapshot is engine-resolved (unique keys) so it skips the
        in-element window and never shuffles; order across elements needs
        no tiebreak because a round's delta only carries that round's
        order-column values."""
        keys = policy["keys"]
        w = self._latest_wins_window(policy)
        # oldest-first element list: folded base_paths, then chain paths
        elements: list[tuple[list[str], bool]] = []  # (paths, known_unique)
        terminal = chain[-1][1]
        if not terminal.get("base_unique"):
            # expiry-fold base: a raw chain segment, resolved per element
            for p in terminal.get("base_paths", []):
                elements.append(([p], False))
        for _, info in reversed(chain):
            paths = [info["path"]]
            if info is terminal and info.get("base_unique"):
                # file-level fold refs are latest-wins-resolved and key-
                # disjoint from the rewrite — ONE element with the terminal,
                # so the read plan stays independent of how many files are
                # folded by reference (no per-file claimed-broadcast builds)
                paths = list(info.get("base_paths", [])) + paths
            elements.append(
                (paths, info.get("mode", "full") != "delta")
            )
        out = None
        claimed = None
        for paths, unique in reversed(elements):  # newest-first
            el = spark.read.option("mergeSchema", "true").parquet(*paths)
            if not unique:
                el = (
                    el.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn")
                )
            if claimed is not None:
                el = el.join(F.broadcast(claimed), keys, "left_anti")
            out = (
                el
                if out is None
                else out.unionByName(el, allowMissingColumns=True)
            )
            k = el.select(*keys)
            claimed = k if claimed is None else claimed.unionByName(k)
        return out

    def _table_floor(self, rounds: list[dict], table: str) -> tuple[str, Any] | None:
        """Latest expiry floor declared for `table` within `rounds`
        (newest entry wins — floors only ever advance). Resolved over the
        caller's rounds list, so read_at time travel sees the historical
        floor. Falls back to the manifest-level floor that expire_snapshots
        preserves when the declaring entries leave the retention window —
        that floor predates every kept round, so it is valid for any
        rounds subset."""
        for entry in reversed(rounds):
            fl = entry.get("floors", {}).get(table)
            if fl is not None:
                return fl[0], fl[1]
        fl = self.manifest().get("floors", {}).get(table)
        return (fl[0], fl[1]) if fl is not None else None

    def plan_file_fold(
        self, spark: SparkSession, table: str, probe_col: str
    ) -> dict[str, Any] | None:
        """Plan a FILE-LEVEL chain fold (rewrite_data_files-with-filter):
        split the terminal snapshot's files into the set that MAY hold a
        version superseded by newer chain deltas (must be rewritten) and
        the set provably untouched (folded by reference). Affectedness is
        decided from metadata alone — the per-file bloom sidecar on
        `probe_col` probed with the deltas' claimed keys — no data scan of
        the base. Files without a bloom (no sidecar, carried refs whose
        parent lost its index) conservatively join the rewrite set.

        Returns {"rewrite_paths": [...], "keep_files": [[path, rows], ...],
        "rewrite_rows": int} — rewrite_paths includes every newer chain
        element (their rows are re-resolved with the affected files) — or
        None when there is no chain to fold or no sidecar exists at all
        (the caller falls back to the full rewrite)."""
        chain = self._live_chain(self.manifest()["rounds"], table)
        if len(chain) < 2:
            return None
        terminal = chain[-1][1]
        delta_paths = [info["path"] for _, info in chain[:-1]]
        claimed = (
            spark.read.option("mergeSchema", "true")
            .parquet(*delta_paths)
            .select(probe_col)
            .distinct()
            .toPandas()[probe_col]
            .to_numpy()
        )
        hashes = self._index_key_hashes(claimed) if len(claimed) else None
        # terminal candidates: its own lineage files + any file refs a
        # previous file-level fold carried (only when resolved-unique —
        # an expiry-fold base is a raw chain, not splittable file-wise)
        cands: list[tuple[str, int]] = []
        lineage = terminal.get("lineage") or []
        if not lineage:
            return None
        cands += [
            (os.path.join(terminal["path"], it["partition"]), int(it["rows"]))
            for it in lineage
        ]
        if terminal.get("base_paths"):
            if terminal.get("base_unique") and terminal.get("base_files"):
                cands += [(fr[0], int(fr[1])) for fr in terminal["base_files"]]
            else:
                return None  # expiry-folded base: fall back to full rewrite
        rewrite: list[str] = []
        keep: list[list[Any]] = []
        rewrite_rows = 0
        any_bloom = False
        # zero-row files hold nothing to supersede OR keep: dropping them
        # here is the fold's free dead-file cleanup
        cands = [(p, r) for p, r in cands if r > 0]
        for path, rows in cands:
            parent, fname = os.path.split(path)
            fidx = self._load_file_index(parent)
            bf = (
                fidx.get(probe_col, {}).get("files", {}).get(fname)
                if fidx
                else None
            )
            if bf is None:
                rewrite.append(path)
                rewrite_rows += rows
                continue
            any_bloom = True
            if hashes is not None and bool(bf.contains_many(hashes).any()):
                rewrite.append(path)
                rewrite_rows += rows
            else:
                keep.append([path, rows])
        if not any_bloom or not keep:
            return None  # no index, or nothing keepable: plain full fold
        return {
            "rewrite_paths": rewrite + delta_paths,
            "keep_files": keep,
            "rewrite_rows": rewrite_rows
            + sum(info.get("rows", 0) for _, info in chain[:-1]),
        }

    def _resolve_read(
        self,
        spark: SparkSession,
        rounds: list[dict],
        table: str,
        resolve: bool,
        prune: list[tuple[str, str, Any]] | None = None,
    ) -> DataFrame | None:
        """Chain-union + merge-on-read resolution over an explicit rounds
        list — shared by read() (committed state) and read_staged() (state
        as-if a staging-branch commit were published)."""
        chain = self._live_chain(rounds, table)
        all_paths = self._chain_paths(chain)
        if not all_paths:
            return None
        policy = (
            self.manifest().get("read_policies", {}).get(table)
            if resolve
            else None
        )
        floor = self._table_floor(rounds, table)
        if floor is not None:
            if policy is not None:
                # a floor on a latest-wins table would need the same
                # version-preservation argument as key pruning — not
                # supported (no engine table combines both)
                raise ValueError(
                    f"expiry floor on policy table {table!r} is unsupported"
                )
            # the floor is SEMANTIC (the store applies the exact filter),
            # and doubles as a manifest prune predicate so aged
            # round-partition files are skipped, not read-then-filtered
            prune = list(prune or []) + [(floor[0], ">=", floor[1])]
        if prune:
            if policy is not None:
                bad = [c for c, _, _ in prune if c not in policy["keys"]]
                if bad:
                    # pruning on a non-key column is not version-preserving
                    # for a latest-wins table: a file holding the WINNING
                    # version of a key could be skipped while an older
                    # version's file survives the predicate — the read
                    # would resolve to stale data. Keys are safe (every
                    # file holding the key is kept).
                    raise ValueError(
                        f"prune on non-key columns {bad} is unsafe for "
                        f"latest-wins table {table!r}"
                    )
            paths, _ = self._pruned_chain_paths(chain, prune)
            if not paths:
                # every file provably excluded: an empty frame with the
                # table's schema (footers only — no data read)
                return (
                    spark.read.option("mergeSchema", "true")
                    .parquet(*all_paths)
                    .limit(0)
                )
        else:
            paths = all_paths
            if policy is not None and len(paths) > 1:
                # unpruned latest-wins read: per-element resolution, base
                # never shuffles (see _resolve_latest_wins_chain)
                return self._resolve_latest_wins_chain(spark, chain, policy)
        # mergeSchema: a chain may mix schema versions (add-column evolution
        # — e.g. pre-depth full base + post-upgrade deltas); without it the
        # reader picks one file's schema and silently DROPS the new column
        # from every other file. Chains are <= REBUILD_EVERY+1 dirs, so the
        # footer merge is negligible.
        df = spark.read.option("mergeSchema", "true").parquet(*paths)
        if prune:
            df = self._align_pruned_schema(df, chain)
            if policy is not None and len(all_paths) > 1:
                # pruned latest-wins read: the kept file set is small (the
                # whole point of pruning), so a plain window resolves it —
                # and pruning is key-preserving for equality/bloom prune on
                # the policy keys (every file holding the key is kept), so
                # the winning version is always present
                df = (
                    df.withColumn(
                        "__rn",
                        F.row_number().over(self._latest_wins_window(policy)),
                    )
                    .filter(F.col("__rn") == 1)
                    .drop("__rn")
                )
        if floor is not None:
            # exact row-level cut on kept files (a kept file may straddle
            # the floor); the manifest prune above already skipped files
            # wholly below it
            df = df.filter(F.col(floor[0]) >= F.lit(floor[1]))
        dels_name = self.MERGE_ON_READ.get(table)
        if resolve and dels_name is not None:
            dels_chain = self._live_chain(rounds, dels_name)
            if self._chain_rows(dels_chain) > 0:
                dels = spark.read.option("mergeSchema", "true").parquet(
                    *self._chain_paths(dels_chain)
                )
                # EXPLICIT broadcast: the delete-key set is bounded by the
                # compaction cadence (<= REBUILD_EVERY rounds of consumed
                # rows), the adds side is the 10^10-row table — without the
                # hint, dels outgrowing autoBroadcastJoinThreshold would
                # shuffle the entire adds chain on every read.
                df = df.join(
                    F.broadcast(dels.select(*FRONTIER_ROW_KEY)),
                    FRONTIER_ROW_KEY,
                    "left_anti",
                )
        return df

    def read(
        self,
        spark: SparkSession,
        table: str,
        resolve: bool = True,
        prune: list[tuple[str, str, Any]] | None = None,
    ) -> DataFrame | None:
        """Live state of `table`. `prune` — a conjunction of
        (column, op, value) with op in {==, <, <=, >, >=} — skips chain
        files whose manifest min/max bounds prove no row can match
        (Iceberg's manifest pruning). ADVISORY ONLY: kept files may still
        hold non-matching rows, so the caller applies the real filter;
        files/commits without stats are always kept. Merge-on-read delete
        keys are applied in full either way (a delete may hit any file)."""
        # ONE manifest read for the call
        return self._resolve_read(
            spark, self.manifest()["rounds"], table, resolve, prune
        )

    # -------------------------------------------------------- snapshot tags

    def tag(self, name: str, round_no: int) -> None:
        """Iceberg tag: a named immutable reference to a committed round
        (e.g. 'training-cut-2026-08'). Tagged rounds are protected from
        expire_snapshots (retention keeps everything from the oldest tag
        forward) and readable forever via read_at(table, 'name'). Rollback
        past a tag drops the tag with its history."""
        man = self.manifest()
        if not any(r["round"] == round_no for r in man["rounds"]):
            raise ValueError(
                f"cannot tag round {round_no}: not a committed round"
            )
        man.setdefault("tags", {})[name] = round_no
        self._flip_manifest(man)

    def drop_tag(self, name: str) -> None:
        man = self.manifest()
        tags = man.get("tags", {})
        if name not in tags:
            raise KeyError(f"no tag {name!r}")
        del tags[name]
        if not tags:
            man.pop("tags", None)
        self._flip_manifest(man)

    def tags(self) -> dict[str, int]:
        return dict(self.manifest().get("tags", {}))

    def read_at(
        self,
        spark: SparkSession,
        table: str,
        round_no: int | str,
        resolve: bool = True,
    ) -> DataFrame | None:
        """Time-travel read (Iceberg `VERSION AS OF`): the live state of
        `table` as of `round_no` — a round number or a TAG name — resolved
        from the manifest chain over only commits <= that round. Raises if
        the round predates the retention window (expire_snapshots dropped
        it) — same contract as Iceberg's missing-snapshot error. Returns
        None when the table had no commit yet at that round."""
        if isinstance(round_no, str):
            tags = self.manifest().get("tags", {})
            if round_no not in tags:
                raise KeyError(f"no tag {round_no!r}")
            round_no = tags[round_no]
        all_rounds = self.manifest()["rounds"]
        if all_rounds and round_no < all_rounds[0]["round"]:
            raise ValueError(
                f"round {round_no} predates the retention window "
                f"(oldest kept: {all_rounds[0]['round']}) — expired"
            )
        rounds = [r for r in all_rounds if r["round"] <= round_no]
        chain = self._live_chain(rounds, table)
        if not chain:
            return None
        terminal = chain[-1][1]
        if terminal.get("mode", "full") == "delta" and "base_paths" not in terminal:
            # the chain never reached a full snapshot: this round's base was
            # expired without a fold (expire_snapshots only folds into the
            # CURRENT live chain). Returning just the surviving deltas would
            # be silently-partial data — same contract as the
            # predates-retention case above: raise.
            raise ValueError(
                f"table {table!r} at round {round_no}: delta chain base "
                f"predates the retention window (expired without fold) — "
                f"history unreachable"
            )
        paths = [info["path"] for _, info in chain]  # newest-first
        paths.extend(reversed(terminal.get("base_paths", [])))
        # mergeSchema for the same reason as read(): historical chains may
        # straddle an add-column schema upgrade
        df = spark.read.option("mergeSchema", "true").parquet(
            *list(reversed(paths))
        )
        policy = self.manifest().get("read_policies", {}).get(table)
        if resolve and policy is not None and len(paths) > 1:
            # time travel is a reporting path: the plain window resolution
            # is fine here (no per-round hot loop to keep shuffle-free)
            df = (
                df.withColumn(
                    "__rn",
                    F.row_number().over(self._latest_wins_window(policy)),
                )
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        floor = self._table_floor(rounds, table)
        if floor is not None:
            # the expiry floor AS OF this round (floors declared later are
            # out of scope of the time-travel view)
            df = df.filter(F.col(floor[0]) >= F.lit(floor[1]))
        dels_name = self.MERGE_ON_READ.get(table)
        if resolve and dels_name is not None:
            # the delete keys AS OF the same round — recursing through
            # read_at keeps the expiry/fold contract in one place
            dels = self.read_at(spark, dels_name, round_no, resolve=False)
            if dels is not None:
                df = df.join(
                    F.broadcast(dels.select(*FRONTIER_ROW_KEY)),
                    FRONTIER_ROW_KEY,
                    "left_anti",
                )
        return df

    def read_changes(
        self,
        spark: SparkSession,
        table: str,
        from_round: int,
        to_round: int | None = None,
    ) -> DataFrame | None:
        """Iceberg incremental scan (`incremental-from-snapshot` / the CDC
        changelog's insert half): rows present at `to_round` that were not
        present at `from_round` (exclusive/inclusive bounds, Iceberg's
        from-exclusive convention). THE downstream-consumer primitive — an
        indexer or training-data exporter polls "what's new since the round
        I last processed" instead of rescanning the table.

        Fast path, O(changed rows): when every commit of `table` in
        (from, to] is a delta, the change set IS the union of those delta
        dirs — no scan of the standing table at all (Iceberg's incremental
        append scan). Falls back to read_at(to) EXCEPT ALL read_at(from)
        when a full rewrite intervenes (compaction folds history, so added
        rows are no longer attributable from the manifest alone) and for
        merge-on-read tables (a delete key makes "changes" more than the
        adds). Returns None when the table has no commit in the range.

        A `from_round` older than the oldest retained round degrades to
        "everything at to_round is a change" — the fail-safe direction for
        a consumer that lost track across an expiry (it reprocesses rather
        than silently missing rows)."""
        if to_round is None:
            to_round = self.latest_round()
        rounds = self.manifest()["rounds"]
        in_range = [
            r["tables"][table]
            for r in rounds
            if from_round < r["round"] <= to_round and table in r["tables"]
        ]
        if not in_range:
            return None
        # Fast path ONLY when the manifest attributes every in-range row to
        # a delta it still holds: from_round inside the retention window
        # (an expired prefix means in_range no longer lists every commit in
        # the range) and no entry carrying a base_paths fold (folded content
        # predates the window — returning just the entry's own path would
        # be right, but a fold also marks that history was compacted away,
        # so take the safe diff). Merge-on-read tables always diff: a
        # delete key makes "changes" more than the adds.
        if (
            table not in self.MERGE_ON_READ
            and rounds
            and from_round >= rounds[0]["round"]
            and all(
                info.get("mode", "full") == "delta"
                and "base_paths" not in info
                for info in in_range
            )
        ):
            return spark.read.option("mergeSchema", "true").parquet(
                *[info["path"] for info in in_range]
            )
        new = self.read_at(spark, table, to_round)
        old = (
            self.read_at(spark, table, from_round)
            if any(r["round"] <= from_round for r in rounds)
            else None
        )
        if old is None:
            return new
        if old.columns != new.columns:
            # the chain may straddle an add-column schema upgrade (the same
            # case _resolve_read's mergeSchema exists for): align the old
            # side to the new schema — missing columns are null, as every
            # pre-upgrade row reads post-upgrade
            fields = {f.name: f.dataType for f in new.schema.fields}
            old = old.select(
                *[
                    (
                        F.col(c) if c in old.columns else F.lit(None)
                    ).cast(fields[c]).alias(c)
                    for c in new.columns
                ]
            )
        return new.exceptAll(old)

    def history(self) -> list[dict[str, Any]]:
        """Iceberg `table.history()` analogue over the whole store: one
        entry per commit — round, wall-clock, per-table (mode, rows, files)
        from the manifest's footer stats, plus the round metrics. Driver-side
        metadata only; no data files are read."""
        return [
            {
                "round": r["round"],
                "committed_at": r.get("committed_at"),
                "tables": {
                    t: {
                        "mode": info.get("mode", "full"),
                        "rows": info.get("rows"),
                        "files": len(info.get("lineage") or []),
                    }
                    for t, info in r["tables"].items()
                },
                "metrics": r.get("metrics", {}),
            }
            for r in self.manifest()["rounds"]
        ]

    def table_rows_many(self, tables: list[str]) -> dict[str, int]:
        """table_rows for several tables with ONE manifest read + parse —
        the per-round hint block asks for six counts; re-reading the
        O(tables x rounds) manifest JSON per count is driver IO that grows
        with crawl age."""
        rounds = self.manifest()["rounds"]
        return {
            t: self._chain_rows(self._live_chain(rounds, t)) for t in tables
        }

    def table_rows(self, table: str) -> int:
        """Live row count of `table` from manifest metadata alone (footer
        stats summed over the live chain — no data read). For latest-wins
        and merge-on-read tables this is an upper bound (pre-merge /
        pre-delete-resolution); exact for append-only."""
        return self.table_rows_many([table])[table]

    def blob_dir_for(self, round_no: int) -> str:
        """Where a round's filter shard blobs live; tasks write here directly
        (shared storage on a cluster) before the manifest flips."""
        return os.path.join(self.root, "_blobs", f"snap-{round_no:05d}")

    def blob_fold_dir_for(self, round_no: int) -> str:
        """Where a round's staggered shard-cohort FOLD element lives —
        separate from the delta dir so per-round delta bytes stay an exact
        measure of the round's fresh keys (the byte gates) while the fold
        carries the cohort's full membership + `full-<s>` markers. The
        `snap-` prefix keeps it under remove_orphans' jurisdiction."""
        return os.path.join(self.root, "_blobs", f"snap-{round_no:05d}-fold")

    def commit_round(
        self,
        round_no: int,
        tables: dict[str, DataFrame],
        metrics: dict[str, Any] | None = None,
        blobs: dict[str, bytes] | None = None,
        blob_dir: str | None = None,
        blob_chain: list[str] | None = None,
        delta_tables: dict[str, DataFrame] | None = None,
        row_hints: dict[str, int] | None = None,
        branch: str | None = None,
        cluster_by: dict[str, list[str]] | None = None,
        file_index: dict[str, list[str]] | None = None,
        floors: dict[str, tuple[str, Any]] | None = None,
        base_refs: dict[str, dict[str, Any]] | None = None,
    ) -> dict[str, Any]:
        """Write all round outputs, then flip the manifest atomically.

        `base_refs`: {table: {"files": [[path, rows], ...], "unique": bool}}
        — a FILE-LEVEL fold (Iceberg's rewrite_data_files-with-filter): the
        table's `full` DataFrame holds only the REWRITTEN rows, and the
        listed existing files are folded in BY REFERENCE (they become the
        entry's base_paths, kept alive by prefix-aware liveness). "unique"
        records that the referenced files are already latest-wins-resolved
        and key-disjoint from the rewrite, so policy reads skip their
        per-element window.

        `floors`: {table: (column, min_value)} — a metadata-only expiry
        floor (Iceberg's drop-partition analogue for a table partitioned on
        `column`): every read of the table filters `column >= min_value`,
        with chain files wholly below the floor pruned at the manifest
        level. Advancing the floor each round makes row expiry an O(1)
        metadata operation; the aged rows leave disk physically when the
        table's next FULL commit (compaction-rotation fold) rewrites only
        surviving rows. Floors are resolved newest-entry-wins, so read_at
        time travel sees the floor as of that round. CDC note: floor
        advances emit NO delete events through read_changes (same as
        Iceberg drop-partition) — a change consumer derives expiry from
        the floor value itself, not from row-level deletes.
        Lineage = per-spark-partition row counts captured at write time.

        `tables` are full snapshots (the table's complete state as of this
        round); `delta_tables` hold ONLY the round's new rows for append-only
        tables — read() unions them with the chain back to the last full
        write, so per-round IO stays O(delta) as the crawl ages.

        `branch`: write-audit-publish staging (Iceberg's `spark.wap.branch`).
        The data files are written exactly as for a normal commit, but the
        manifest entry lands under `staged[branch]` — invisible to read()/
        read_at()/latest_round() until publish_branch() moves it into the
        committed history, or drop_branch() reclaims it."""
        if branch is not None and round_no <= self.latest_round():
            # Data paths are keyed by round number only; staging a round that
            # is already committed would overwrite the committed round's
            # snap/delta dirs IN PLACE before any gate runs — and a vetoed
            # drop_branch could not restore them (the dirs stay "live" via
            # the committed entry, but hold the rolled-back data). A normal
            # commit of an existing round supersedes its manifest entry, so
            # only the branch path needs the guard.
            raise ValueError(
                f"cannot stage round {round_no} on branch {branch!r}: rounds"
                f" up to {self.latest_round()} are already committed, and"
                f" staging would overwrite round {round_no}'s committed data"
                " dirs in place"
            )
        # Iceberg invariant: a FULL snapshot of a merge-on-read table
        # supersedes every outstanding delete key (rewrite_data_files drops
        # applied delete files). A full commit that left the old dels chain
        # live would delete arbitrary rows of the NEW snapshot — if the
        # caller didn't reset the dels table, the store does.
        for mor, dels_name in self.MERGE_ON_READ.items():
            if (
                mor in tables
                and dels_name not in tables
                and dels_name not in (delta_tables or {})
            ):
                tables = dict(tables)
                tables[dels_name] = (
                    tables[mor]
                    .sparkSession.createDataFrame([], FRONTIER_DELS_SCHEMA)
                    .coalesce(1)
                )
        entry: dict[str, Any] = {
            "round": round_no,
            "committed_at": time.time(),
            "tables": {},
            "metrics": metrics or {},
        }
        if floors:
            entry["floors"] = {t: list(cv) for t, cv in floors.items()}

        def _write(name: str, df: DataFrame, mode: str) -> None:
            stem = "snap" if mode == "full" else "delta"
            path = os.path.join(self.root, name, f"{stem}-{round_no:05d}")
            hint = (row_hints or {}).get(name)
            n_files = (
                max(1, min(-(-hint // self.ROWS_PER_FILE), 256))
                if hint is not None
                else None
            )
            cluster = (cluster_by or {}).get(name)
            if cluster and n_files is None:
                # no row hint: one count of the (delta-sized) input beats
                # exploding into defaultParallelism near-empty range
                # partitions — engine paths always pass hints, this is the
                # ad-hoc-caller fallback
                n_files = max(
                    1, min(-(-df.count() // self.ROWS_PER_FILE), 256)
                )
            if cluster:
                # Iceberg write sort order: range-partition + sort on the
                # cluster keys so each file's footer min/max bounds are
                # TIGHT and DISJOINT on those keys — a key-range read then
                # prunes to O(matching files) instead of finding every
                # file's bounds straddling the whole key space. Costs one
                # range exchange per commit of this table (the same price
                # Iceberg pays for a sorted write) — per-table opt-in.
                df = (
                    df.repartitionByRange(n_files, *cluster)
                    if n_files is not None
                    else df.repartitionByRange(*cluster)
                ).sortWithinPartitions(*cluster)
            elif n_files is not None:
                # size output files by expected rows (the engine knows the
                # round's counts from its metrics aggregate): a few-hundred-
                # row delta must not become defaultParallelism near-empty
                # files — file-count growth is what makes chain reads and
                # listing slow as the crawl ages. At production scale the
                # same formula yields real parallel writes.
                df = df.coalesce(n_files)
            df.write.mode("overwrite").parquet(path)
            # lineage from the WRITTEN files' parquet footers — free driver-
            # side metadata, exactly how Iceberg records per-file row counts
            # at commit time (no Spark job, no plan re-execution)
            lineage = self._footer_lineage(path)
            if lineage is None:  # non-local store: one scan of written files
                lineage = [
                    {"partition": os.path.basename(r["f"]), "rows": int(r["n"])}
                    for r in df.sparkSession.read.parquet(path)
                    .groupBy(F.input_file_name().alias("f"))
                    .agg(F.count("*").alias("n"))
                    .collect()
                ]
            entry["tables"][name] = {
                "path": path,
                "mode": mode,
                "rows": sum(p["rows"] for p in lineage),
                "lineage": lineage,
                # the commit's column set (Iceberg's schema-id per snapshot):
                # lets a pruned read reconstruct the chain schema without
                # reading every file's footer
                "columns": [
                    [f.name, f.dataType.simpleString()] for f in df.schema
                ],
            }
            idx_cols = (file_index or {}).get(name)
            if idx_cols and os.path.isdir(path):
                built = self._build_file_index(path, lineage, idx_cols)
                if built:
                    entry["tables"][name]["file_index"] = built

        for name, df in tables.items():
            _write(name, df, "full")
            ref = (base_refs or {}).get(name)
            if ref:
                info = entry["tables"][name]
                info["base_files"] = [list(fr) for fr in ref["files"]]
                info["base_paths"] = [fr[0] for fr in ref["files"]]
                info["base_rows"] = int(sum(fr[1] for fr in ref["files"]))
                if ref.get("unique"):
                    info["base_unique"] = True
        for name, df in (delta_tables or {}).items():
            _write(name, df, "delta")
        if blobs:
            bdir = self.blob_dir_for(round_no)
            os.makedirs(bdir, exist_ok=True)
            for bname, blob in blobs.items():
                with open(os.path.join(bdir, bname), "wb") as fh:
                    fh.write(blob)
            entry["blob_dir"] = bdir
        elif blob_dir is not None:
            # blobs already written task-side (update_seen_shards out_dir)
            entry["blob_dir"] = blob_dir
        if blob_chain is not None:
            # merge-on-read filter store: this round's live chain (full base
            # first, then per-round delta dirs, newest last). blob_dir above
            # still records the dir THIS round wrote; readers resolve the
            # chain, not the single dir.
            entry["blob_chain"] = list(blob_chain)
        man = self.manifest()
        superseded: dict[str, Any] | None = None
        if branch is not None:
            staged = man.setdefault("staged", {})
            superseded = staged.get(branch)
            staged[branch] = entry
        else:
            man["rounds"] = [r for r in man["rounds"] if r["round"] < round_no]
            man["rounds"].append(entry)
        self._flip_manifest(man)  # the atomic commit point
        if superseded is not None:
            # replacing a staged entry releases the OLD entry's dirs — except
            # any the new entry re-wrote in place (same round number ⇒ same
            # snap/delta paths, already overwritten). AFTER the flip, like
            # Iceberg: a crash between commit and cleanup leaves orphan dirs
            # (harmless), never a manifest referencing deleted files.
            self._release_entry_dirs(man, superseded)
        return entry

    # ------------------------------------------------- write-audit-publish

    @staticmethod
    def _entry_own_paths(entry: dict[str, Any]) -> list[str]:
        """Dirs a staged entry itself wrote: its table snap/delta dirs and
        its own blob dir. Earlier blob-CHAIN elements and base_paths belong
        to the committed rounds that wrote them — never released here."""
        paths = [info["path"] for info in entry["tables"].values()]
        if entry.get("blob_dir"):
            paths.append(entry["blob_dir"])
        # the round's staggered cohort FOLD element (snap-NNNNN-fold) is
        # referenced only via blob_chain but written by THIS round — a
        # vetoed/superseded staged round must release it like its delta
        # dir, or repeated vetoed audits strand fold dirs until a
        # remove_orphans pass
        for d in entry.get("blob_chain") or []:
            if d.endswith(f"snap-{entry['round']:05d}-fold"):
                paths.append(d)
        return paths

    def _release_entry_dirs(self, man: dict[str, Any], entry: dict[str, Any]) -> int:
        """Delete `entry`'s own dirs unless a committed round or another
        staged entry still references them. `man` is the POST-removal
        manifest (the entry no longer appears in it)."""
        import shutil

        live: set[str] = set()
        for r in man["rounds"] + list(man.get("staged", {}).values()):
            for info in r["tables"].values():
                live.add(info["path"])
                live.update(info.get("base_paths", []))
            live.update(r.get("blob_chain") or [])
            if r.get("blob_dir"):
                live.add(r["blob_dir"])
        removed = 0
        for p in self._entry_own_paths(entry):
            if not self._is_live(p, live) and os.path.isdir(p):
                shutil.rmtree(p)
                self._index_cache.pop(p, None)  # dir gone -> blooms stale
                removed += 1
        return removed

    def staged_entry(self, branch: str = "audit") -> dict[str, Any] | None:
        """The manifest entry staged on `branch`, or None."""
        return self.manifest().get("staged", {}).get(branch)

    def _rounds_with_staged(
        self, man: dict[str, Any], branch: str
    ) -> list[dict[str, Any]]:
        e = man.get("staged", {}).get(branch)
        if e is None:
            raise KeyError(f"no staged commit on branch {branch!r}")
        return [r for r in man["rounds"] if r["round"] < e["round"]] + [e]

    def read_staged(
        self,
        spark: SparkSession,
        table: str,
        branch: str = "audit",
        resolve: bool = True,
    ) -> DataFrame | None:
        """The AUDIT read of write-audit-publish: `table`'s live state as if
        the staged branch commit were published — committed readers stay on
        the pre-round state. Raises KeyError when nothing is staged."""
        man = self.manifest()
        return self._resolve_read(
            spark, self._rounds_with_staged(man, branch), table, resolve
        )

    def publish_branch(self, branch: str = "audit") -> dict[str, Any]:
        """Atomically move the staged commit into the committed history
        (Iceberg's WAP cherry-pick): one manifest flip, no data IO — the
        files were already in place when the branch commit wrote them."""
        man = self.manifest()
        staged = man.get("staged", {})
        if branch not in staged:
            raise KeyError(f"no staged commit on branch {branch!r}")
        entry = staged.pop(branch)
        if not staged:
            man.pop("staged", None)  # keep published manifests byte-stable
        man["rounds"] = [
            r for r in man["rounds"] if r["round"] < entry["round"]
        ]
        man["rounds"].append(entry)
        self._flip_manifest(man)
        return entry

    def drop_branch(
        self, branch: str = "audit", missing_ok: bool = False
    ) -> dict[str, Any]:
        """Discard a staged commit: reclaim the dirs it wrote (never dirs a
        committed round still references) and flip the manifest. The store
        is then indistinguishable from one where the round never ran — the
        failed-audit half of write-audit-publish."""
        man = self.manifest()
        staged = man.get("staged", {})
        if branch not in staged:
            if missing_ok:
                return {"removed_dirs": 0}
            raise KeyError(f"no staged commit on branch {branch!r}")
        entry = staged.pop(branch)
        if not staged:
            man.pop("staged", None)  # a dropped audit leaves no trace
        self._flip_manifest(man)
        # delete AFTER the flip (Iceberg's order): a crash in between leaves
        # orphan dirs, never a staged manifest pointing at deleted files
        removed = self._release_entry_dirs(man, entry)
        return {"removed_dirs": removed, "round": entry["round"]}

    def rollback(self, to_round: int) -> dict[str, Any]:
        """Iceberg's `rollback_to_snapshot`: drop every committed round
        AFTER `to_round` and reclaim the dirs only those rounds own (a
        kept round's base_paths/blob_chain refs always point backward, so
        nothing live can reference a dropped dir — still enforced via the
        same liveness check as drop_branch). Staged branches are dropped
        too: their gate verdict belongs to a history that no longer exists.
        Streaming log feeds for dropped rounds are removed so tail readers
        never see events from rolled-back rounds. One atomic manifest flip;
        reclamation happens AFTER it (a crash between leaves orphans for
        remove_orphans, never a manifest pointing at deleted files). The
        engine's resume() then continues from `to_round + 1`, re-running
        the dropped rounds deterministically."""
        import shutil

        man = self.manifest()
        if man["rounds"]:
            oldest = man["rounds"][0]["round"]
            # below the retention window the target state was expired
            # (folded into newer manifests) — nothing can restore it.
            # to_round == -1 (full reset) is allowed only while round 0 is
            # still retained: an oldest round > 0 carries folded history.
            floor = -1 if oldest == 0 else oldest
            if to_round < floor:
                raise ValueError(
                    f"cannot rollback to round {to_round}: retention kept"
                    f" rounds {oldest}..{man['rounds'][-1]['round']} only"
                )
        dropped = [r for r in man["rounds"] if r["round"] > to_round]
        if not dropped:
            # nothing to roll back: committed history already ends at
            # to_round. An in-flight staged audit SURVIVES — its history
            # is intact, so destroying it would lose a live round's work.
            return {"dropped_rounds": 0, "dirs_reclaimed": 0, "feeds": 0}
        staged = man.get("staged") or {}
        new_man = dict(man)
        new_man["rounds"] = [
            r for r in man["rounds"] if r["round"] <= to_round
        ]
        new_man.pop("staged", None)
        # tags above the rollback point reference history that no longer
        # exists — they fall with it
        kept_tags = {
            n: r for n, r in man.get("tags", {}).items() if r <= to_round
        }
        new_man.pop("tags", None)
        if kept_tags:
            new_man["tags"] = kept_tags
        self._flip_manifest(new_man)
        reclaimed = 0
        for entry in dropped + list(staged.values()):
            reclaimed += self._release_entry_dirs(new_man, entry)
        feeds = 0
        # dropped committed rounds lose their PUBLISHED feed (and any
        # staging residue); staged entries only ever wrote under staging —
        # a kept committed round sharing a staged round number must keep
        # its published feed
        for entry, parents in [
            (e, ("_logfeed", "_logfeed_staging")) for e in dropped
        ] + [(e, ("_logfeed_staging",)) for e in staged.values()]:
            for parent in parents:
                feed = os.path.join(
                    self.root, parent, f"feed-{entry['round']:05d}"
                )
                if os.path.isdir(feed):
                    shutil.rmtree(feed)
                    feeds += 1
        return {
            "dropped_rounds": len(dropped),
            "dirs_reclaimed": reclaimed,
            "feeds": feeds,
        }

    def expire_snapshots(self, keep_last: int = 3) -> dict[str, Any]:
        """Iceberg `expire_snapshots` / the reference's partition-maintenance
        script (scripts/maintain_partitions.py, Q7): physically delete
        snapshot dirs and blob dirs no longer referenced by ANY of the most
        recent ``keep_last`` rounds. Time travel to expired rounds is lost,
        but every KEPT round stays fully readable (read_at) — a kept delta
        whose chain base leaves the window keeps those dirs alive via a
        `base_paths` fold, reclaimed later once the referencing round itself
        expires (Iceberg's files-referenced-by-retained-snapshots rule); the
        CURRENT state of every table is preserved, so reads and resume
        behave identically."""
        import shutil

        man = self.manifest()
        rounds = man["rounds"]
        # tags pin retention: keep everything from the oldest tagged round
        # forward (contiguous superset of Iceberg's referenced-snapshot
        # rule — never less readable than asked). A tagged round therefore
        # stays time-travelable for as long as its tag lives.
        tagged = set(man.get("tags", {}).values())
        if tagged:
            oldest_tagged_idx = min(
                i for i, r in enumerate(rounds) if r["round"] in tagged
            )
            keep_last = max(keep_last, len(rounds) - oldest_tagged_idx)
        if len(rounds) <= keep_last:
            return {"removed_dirs": 0, "kept_rounds": len(rounds)}
        dropped, kept = rounds[:-keep_last], rounds[-keep_last:]
        n_dropped = len(dropped)
        # expiry floors declared only by dropped entries must survive as the
        # manifest-level fallback (newest dropped declaration per table);
        # kept entries' own declarations still win at read time, so this
        # never moves a floor backwards
        for entry in dropped:
            for t, fl in entry.get("floors", {}).items():
                man.setdefault("floors", {})[t] = list(fl)

        # Per table: state at any round is a CHAIN (full base + deltas).
        # Iceberg's expire_snapshots removes data files only when NO
        # retained snapshot references them — so every KEPT round must stay
        # readable (read_at), not just the live state. For each table, the
        # oldest kept entry whose chain dips below the window gets the
        # below-window chain folded in as `base_paths` (those dirs then
        # survive on disk); newer kept rounds' chains terminate at or above
        # that entry, so they resolve too. When no kept round touches the
        # table at all, the whole live chain folds into the oldest kept
        # manifest entry. Disk for folded dirs is reclaimed once the rounds
        # referencing them expire in a later pass.
        all_tables = {t for r in rounds for t in r["tables"]}
        live_paths: set[str] = set()
        for t in all_tables:
            kept_idxs = [
                i for i in range(n_dropped, len(rounds)) if t in rounds[i]["tables"]
            ]
            if not kept_idxs:
                # table last written in a dropped round: fold its live chain
                # into the oldest kept manifest entry so read()/resume hold
                chain = self._live_chain(rounds, t)  # newest-first
                terminal_bases = chain[-1][1].get("base_paths", [])
                live_paths.update(info["path"] for _, info in chain)
                live_paths.update(terminal_bases)
                folded = list(terminal_bases) + [
                    info["path"] for _, info in reversed(chain)
                ]
                folded_rows = chain[-1][1].get("base_rows", 0) + sum(
                    info.get("rows", 0) for _, info in chain
                )
                newest = dict(chain[0][1])
                newest["base_paths"] = folded[:-1]  # all but its own path
                newest["base_rows"] = folded_rows - newest.get("rows", 0)
                kept[0]["tables"][t] = newest
                continue
            # chain as of the OLDEST kept round that has the table — if it
            # dips below the window, fold the below-window part into that
            # entry (newer kept chains stop at or above it)
            chain = self._live_chain(rounds[: kept_idxs[0] + 1], t)
            terminal_bases = chain[-1][1].get("base_paths", [])
            live_paths.update(info["path"] for _, info in chain)
            live_paths.update(terminal_bases)
            # every kept entry's own path (and any base fold it already
            # carries from an earlier expiry) stays live regardless of chains
            for i in kept_idxs:
                info = rounds[i]["tables"][t]
                live_paths.add(info["path"])
                live_paths.update(info.get("base_paths", []))
            dropped_part = [(i, info) for i, info in chain if i < n_dropped]
            if not dropped_part:
                continue
            # oldest-first: earlier-folded bases, then dropped chain paths
            folded = list(terminal_bases) + [
                info["path"] for _, info in reversed(dropped_part)
            ]
            # carry the folded rows forward so table_rows() (metrics + file-
            # count sizing) stays exact across expiry
            folded_rows = chain[-1][1].get("base_rows", 0) + sum(
                info.get("rows", 0) for _, info in dropped_part
            )
            oldest_kept = rounds[kept_idxs[0]]["tables"][t]
            oldest_kept["base_paths"] = folded
            oldest_kept["base_rows"] = folded_rows

        # a chain-committed round keeps its WHOLE chain alive: delta dirs
        # were written by earlier (possibly dropped) rounds, but the kept
        # round's membership reads through all of them
        live_blob_dirs: set[str] = set()
        for r in kept:
            live_blob_dirs.update(r.get("blob_chain") or [])
            if r.get("blob_dir"):
                live_blob_dirs.add(r["blob_dir"])
        # keep the newest blob dir/chain even if it predates the kept
        # window, AND fold its manifest reference into the oldest kept entry
        # (mirror of the table fold above) — keeping only the files while
        # dropping the reference would make latest_blob_dir()/
        # latest_blob_chain() return None, and the next round's incremental
        # shard update would then commit filters built from that round's
        # fresh keys alone (seen-set invariant broken)
        if not live_blob_dirs:
            for r in reversed(rounds):
                chain = r.get("blob_chain")
                if chain:
                    live_blob_dirs.update(chain)
                    kept[0]["blob_chain"] = list(chain)
                    kept[0]["blob_dir"] = r.get("blob_dir", chain[-1])
                    break
                if r.get("blob_dir"):
                    live_blob_dirs.add(r["blob_dir"])
                    kept[0]["blob_dir"] = r["blob_dir"]
                    break

        # a staged (write-audit-publish) entry's dirs are live until it is
        # published or dropped — expiry must not reclaim them from under an
        # in-flight audit (its blob_chain may reference committed rounds'
        # delta dirs that would otherwise leave the kept window)
        for e in man.get("staged", {}).values():
            for info in e["tables"].values():
                live_paths.add(info["path"])
                live_paths.update(info.get("base_paths", []))
            live_blob_dirs.update(e.get("blob_chain") or [])
            if e.get("blob_dir"):
                live_blob_dirs.add(e["blob_dir"])

        removed = 0
        for r in dropped:
            for info in r["tables"].values():
                # a dropped entry releases its own dir AND any base fold it
                # carried (deferred reclamation of earlier expiries' files)
                for p in [info["path"], *info.get("base_paths", [])]:
                    if not self._is_live(p, live_paths) and os.path.isdir(p):
                        shutil.rmtree(p)
                        removed += 1
            # a dropped round releases its own blob dir AND every chain
            # element it referenced (the base + deltas older rounds wrote:
            # once no kept round's chain reads through them, they have no
            # manifest entry left anywhere — skipping them here would leak
            # the previous full base each time an expiry crosses a
            # compaction boundary, unbounded disk growth)
            blob_refs = set(r.get("blob_chain") or [])
            if r.get("blob_dir"):
                blob_refs.add(r["blob_dir"])
            for bd in blob_refs:
                if bd not in live_blob_dirs and os.path.isdir(bd):
                    shutil.rmtree(bd)
                    removed += 1

        man["rounds"] = kept
        self._flip_manifest(man)
        return {"removed_dirs": removed, "kept_rounds": len(kept)}

    def remove_orphans(self, grace_seconds: float = 3600.0) -> dict[str, Any]:
        """Iceberg `remove_orphan_files`: physically delete snap-*/delta-*
        table dirs and `_blobs/snap-*` dirs that NO manifest entry —
        committed round, `base_paths` fold, blob chain/dir, or staged
        branch — references. Orphans are the documented residue of crashes
        between data writes and the manifest flip (every mutation path
        writes dirs FIRST, flips SECOND, so a crash never corrupts the
        manifest but can strand fully-written dirs); they are harmless to
        correctness and unbounded only in disk, which this maintenance pass
        reclaims. `grace_seconds` is Iceberg's `older_than` safety window:
        an IN-FLIGHT round's dirs exist before its manifest flip and would
        look orphaned to a concurrent pass — never run with a grace shorter
        than the longest possible round. The log-feed dirs are engine-owned
        (reconciled by round start), not store-owned, and are never
        touched."""
        import shutil
        import time

        man = self.manifest()

        def norm(p: str) -> str:
            # manifest paths were recorded with whatever spelling of root
            # the WRITING session used; this maintenance session may spell
            # it differently ('./store' vs 'store' vs absolute). Exact
            # string comparison would then see every committed dir as an
            # orphan and delete live data — normalize both sides.
            return os.path.normpath(os.path.abspath(p))

        live: set[str] = set()
        for r in man["rounds"] + list(man.get("staged", {}).values()):
            for info in r["tables"].values():
                live.add(norm(info["path"]))
                live.update(norm(b) for b in info.get("base_paths", []))
            live.update(norm(b) for b in r.get("blob_chain") or [])
            if r.get("blob_dir"):
                live.add(norm(r["blob_dir"]))
        now = time.time()
        removed, skipped_young = 0, 0
        for entry in sorted(os.listdir(self.root)):
            sub = os.path.join(self.root, entry)
            if not os.path.isdir(sub) or entry.startswith("_logfeed"):
                continue
            for name in sorted(os.listdir(sub)):
                if not name.startswith(("snap-", "delta-")):
                    continue
                p = os.path.join(sub, name)
                if self._is_live(norm(p), live) or not os.path.isdir(p):
                    continue
                if now - os.path.getmtime(p) < grace_seconds:
                    skipped_young += 1
                    continue
                shutil.rmtree(p)
                removed += 1
        return {"removed_dirs": removed, "skipped_young": skipped_young}

    def round_metrics(self) -> list[dict[str, Any]]:
        return [
            {"round": r["round"], **r["metrics"]} for r in self.manifest()["rounds"]
        ]

    def _latest_blob_entry(self) -> list[str] | None:
        """The NEWEST round's blob refs as a chain, or None. Never walks
        past the newest blob-bearing round to an older one: older blob
        state is missing every round since — serving it silently as
        current membership would re-admit those rounds' URLs. A missing/
        broken newest state returns None, which every engine consumer
        treats as 'authoritative full rebuild required' — the safe
        recovery, not the stale one."""
        for r in reversed(self.manifest()["rounds"]):
            chain = r.get("blob_chain")
            if chain is None:
                bdir = r.get("blob_dir")
                if bdir is None:
                    continue  # metrics-only round: no blob state committed
                chain = [bdir]
            if chain and all(os.path.isdir(d) for d in chain):
                return list(chain)
            return None
        return None

    def latest_blob_dir(self) -> str | None:
        """Most recent committed round's blob directory (the file-backed
        shard-probe path reads blobs per task from here, never the driver).
        Only meaningful when that round's state is a SINGLE dir (TTL-mode
        rewrites, compaction bases): a multi-element chain has no single
        authoritative dir, so this returns None and the caller must either
        use latest_blob_chain() or rebuild."""
        chain = self._latest_blob_entry()
        return chain[0] if chain is not None and len(chain) == 1 else None

    def latest_blob_chain(self) -> list[str] | None:
        """Most recent committed round's filter-blob CHAIN, oldest first
        (full base, then per-round delta dirs — merge-on-read for the
        filter store). Rounds committed before chain mode carry a single
        authoritative blob_dir, returned as a 1-chain."""
        return self._latest_blob_entry()

    def latest_blobs(self, prefix: str = "") -> dict[str, bytes]:
        for r in reversed(self.manifest()["rounds"]):
            bdir = r.get("blob_dir")
            if bdir and os.path.isdir(bdir):
                out = {}
                for fn in os.listdir(bdir):
                    if fn.startswith(prefix):
                        with open(os.path.join(bdir, fn), "rb") as fh:
                            out[fn] = fh.read()
                return out
        return {}
