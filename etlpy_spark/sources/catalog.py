"""Snapshot table catalog — Iceberg table semantics on plain Parquet.

The north_rule calls for Iceberg tables (frontier, seen shards, image +
caption) with snapshot checkpoints and resume. No Iceberg runtime jar ships
in this sandbox (no network for artifacts), so this module provides the
same contract on a parquet+manifest layout, and the crawl engine only ever
talks to this API — pointing it at a real Iceberg catalog later is a
drop-in (`append` → ``df.writeTo(t).append()``, `merge_upsert` →
``MERGE INTO``, `version` → Iceberg snapshot-id time travel).

Layout (one directory per table):
    data/v{N:06d}/part-*.parquet   -- one data dir per committed snapshot
    snapshots/v{N:06d}.json        -- manifest: mode, data dirs, meta
    _current                       -- name of latest snapshot (atomic rename)

Commit protocol: write data first, write the manifest, then atomically
swap ``_current`` (os.replace) — a crashed writer leaves the table at the
previous snapshot, which is exactly the resume point (generalizes the
reference master's ``skip=`` job resume, distributed.py:42,62-63).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Snapshot:
    version: int
    mode: str  # 'append' | 'overwrite'
    data_dirs: list[str]
    meta: dict
    # merge-on-read state (Iceberg equality-delete files): entries of
    # {"dir": <key-only parquet dir>, "upto": <data-dir index bound>} —
    # a tombstone deletes ONLY from data dirs with index < upto (the
    # Iceberg sequence-number rule: deletes never touch files added
    # after them, so a later re-append of the same key survives), plus
    # the key column name and cumulative (data, tomb) footer-row stats
    # driving compaction
    delete_dirs: list[dict] | None = None
    delete_key: str | None = None
    mor_stats: dict | None = None

    @property
    def name(self) -> str:
        return f"v{self.version:06d}"


class SnapshotTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        compression: str | None = None,
        sort_within: list[str] | None = None,
    ):
        # manifests (snapshots/, _current) are written with local os I/O
        # while the data dirs go through the Spark writer — a URI-scheme
        # path (hdfs://, s3a://) would split-brain the table: data on the
        # remote FS, manifests in a literal './hdfs:' directory. Require a
        # local / shared-mount path; porting to object storage means
        # routing BOTH through one FS API (or a real Iceberg catalog).
        if "://" in path and not path.startswith("file://"):
            raise ValueError(
                f"SnapshotTable path {path!r} uses a URI scheme; only local/"
                "shared-filesystem paths are supported (manifest I/O is local)"
            )
        if path.startswith("file://"):
            path = path[len("file://"):]
        self.spark = spark
        self.path = path
        # binary-payload tables (already-compressed image bytes) should set
        # compression='uncompressed': re-deflating PNG payloads in the
        # parquet writer burns a full extra CPU+copy pass per row for ~0 gain
        self.compression = compression
        # sorted-within-partition layout (Iceberg "sort order"): URL-heavy
        # tables share long key prefixes, so sorting before write lets
        # parquet dictionary/RLE pages bite — measured 45 -> 29 MB AND
        # 1.8 -> 1.0 s for a 2M-row URL table (fewer bytes = less of the
        # non-scaling write-bus / disk / network resource, paid for with
        # perfectly scalable in-partition CPU). No shuffle: partitioning
        # is untouched, only the order inside each task's output file.
        self.sort_within = sort_within
        os.makedirs(os.path.join(path, "snapshots"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)

    # -- snapshot bookkeeping

    def _snap_path(self, version: int) -> str:
        return os.path.join(self.path, "snapshots", f"v{version:06d}.json")

    def current_version(self) -> int | None:
        cur = os.path.join(self.path, "_current")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            return int(f.read().strip())

    def snapshot(self, version: int) -> Snapshot:
        with open(self._snap_path(version)) as f:
            d = json.load(f)
        return Snapshot(
            version=d["version"], mode=d["mode"], data_dirs=d["data_dirs"],
            meta=d["meta"], delete_dirs=d.get("delete_dirs"),
            delete_key=d.get("delete_key"), mor_stats=d.get("mor_stats"),
        )

    def history(self) -> list[Snapshot]:
        out = []
        v = self.current_version()
        if v is None:
            return out
        for i in range(1, v + 1):
            if os.path.exists(self._snap_path(i)):
                out.append(self.snapshot(i))
        return out

    # -- commits

    def _commit(self, df: DataFrame, mode: str, meta: dict | None) -> int:
        v = (self.current_version() or 0) + 1
        data_dir = os.path.join(self.path, "data", f"v{v:06d}")
        if self.sort_within and all(c in df.columns for c in self.sort_within):
            df = df.sortWithinPartitions(*self.sort_within)
        w = df.write.mode("overwrite")
        if self.compression:
            w = w.option("compression", self.compression)
        w.parquet(data_dir)
        snap = {"version": v, "mode": mode, "data_dirs": [data_dir], "meta": meta or {}}
        if mode == "append" and (prev := self.current_version()):
            ps = self.snapshot(prev)
            snap["data_dirs"] = ps.data_dirs + [data_dir]
            # tombstones survive plain appends (they delete from OLD dirs);
            # an overwrite resets them along with the data
            if ps.delete_dirs:
                snap["delete_dirs"] = ps.delete_dirs
                snap["delete_key"] = ps.delete_key
                snap["mor_stats"] = ps.mor_stats
        self._write_manifest(v, snap)
        return v

    def _write_manifest(self, v: int, snap: dict) -> None:
        tmp = self._snap_path(v) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, self._snap_path(v))
        cur_tmp = os.path.join(self.path, "_current.tmp")
        with open(cur_tmp, "w") as f:
            f.write(str(v))
        os.replace(cur_tmp, os.path.join(self.path, "_current"))

    def append(self, df: DataFrame, meta: dict | None = None) -> int:
        return self._commit(df, "append", meta)

    def append_counted(self, df: DataFrame, meta: dict | None = None) -> tuple[int, int]:
        """Append and return (version, rows written). The count comes from
        the freshly written parquet footers (metadata-only scan) — cheaper
        than caching the input just to count it (matters when rows carry
        image bytes)."""
        v = self._commit(df, "append", meta)
        data_dir = self.snapshot(v).data_dirs[-1]
        import pyarrow.parquet as pq

        n = 0
        for f in os.listdir(data_dir):
            if f.endswith(".parquet"):
                n += pq.read_metadata(os.path.join(data_dir, f)).num_rows
        return v, n

    def overwrite(self, df: DataFrame, meta: dict | None = None) -> int:
        return self._commit(df, "overwrite", meta)

    # -- externally-written data (executor-side pyarrow writers)

    def begin_external(self) -> tuple[int, str]:
        """Reserve the next snapshot's data dir for files written OUTSIDE
        the Spark writer (e.g. pyarrow part files emitted inside a UDF so
        binary payloads never cross the Arrow→JVM row path). Single-writer
        tables only (the crawler is); commit with commit_external."""
        v = (self.current_version() or 0) + 1
        data_dir = os.path.join(self.path, "data", f"v{v:06d}")
        os.makedirs(data_dir, exist_ok=True)
        return v, data_dir

    def commit_external(
        self, version: int, data_dir: str, mode: str = "append", meta: dict | None = None
    ) -> tuple[int, int]:
        """Manifest-commit part files already present in ``data_dir``;
        returns (version, row count from parquet footers). If no files were
        written the reservation is abandoned (table state unchanged). NB a
        retried/speculated task could leave duplicate part files — real
        Iceberg fences this with per-task commit metadata; the sandbox
        crawler runs without retries."""
        import pyarrow.parquet as pq

        files = [f for f in os.listdir(data_dir) if f.endswith(".parquet")]
        if not files:
            os.rmdir(data_dir)
            return self.current_version() or 0, 0
        n = sum(
            pq.read_metadata(os.path.join(data_dir, f)).num_rows for f in files
        )
        snap = {"version": version, "mode": mode, "data_dirs": [data_dir],
                "meta": meta or {}}
        if mode == "append" and (prev := self.current_version()):
            ps = self.snapshot(prev)
            snap["data_dirs"] = ps.data_dirs + [data_dir]
            if ps.delete_dirs:
                snap["delete_dirs"] = ps.delete_dirs
                snap["delete_key"] = ps.delete_key
                snap["mor_stats"] = ps.mor_stats
        self._write_manifest(version, snap)
        return version, n

    # -- merge-on-read deletes (Iceberg equality-delete files + compaction)

    def append_with_deletes(
        self, df: DataFrame, delete_keys: DataFrame, key: str,
        meta: dict | None = None, compact_threshold: float = 0.3,
    ) -> int:
        """One atomic commit = append ``df`` + equality-delete every
        existing row whose ``key`` appears in ``delete_keys`` (Iceberg
        merge-on-read DELETE semantics: a ~key-only tombstone file, no
        data-file rewrite). ``read()`` applies tombstones as an anti-join.

        This turns a mutate-in-place table (the crawl frontier) from an
        O(table) rewrite per commit into O(changed rows): at a 10^10-URL
        pending frontier the per-round commit writes round-sized files
        only. When accumulated tombstones exceed ``compact_threshold`` of
        live rows the commit compacts (one distributed rewrite, the moral
        equivalent of Iceberg's rewrite_data_files) so read-side anti-join
        cost stays bounded; amortized cost is O(changed) per commit."""
        v = (self.current_version() or 0) + 1
        data_dir = os.path.join(self.path, "data", f"v{v:06d}")
        del_dir = os.path.join(self.path, "data", f"v{v:06d}.del")
        if self.sort_within and all(c in df.columns for c in self.sort_within):
            df = df.sortWithinPartitions(*self.sort_within)
        w = df.write.mode("overwrite")
        if self.compression:
            w = w.option("compression", self.compression)
        w.parquet(data_dir)
        delete_keys.select(key).write.mode("overwrite").parquet(del_dir)
        prev = self.current_version()
        psnap = self.snapshot(prev) if prev else None
        if psnap and psnap.delete_key not in (None, key):
            raise ValueError(
                f"table already has tombstones keyed by {psnap.delete_key!r}"
            )
        prev_dirs = psnap.data_dirs if psnap else []
        dirs = prev_dirs + [data_dir]
        # the tombstone applies to PRE-EXISTING data dirs only (Iceberg
        # sequence numbers): rows appended in this same commit — or any
        # later one — with a deleted key stay live
        dels = (psnap.delete_dirs or [] if psnap else []) + [
            {"dir": del_dir, "upto": len(prev_dirs)}
        ]
        if psnap and psnap.mor_stats:
            stats = dict(psnap.mor_stats)
        else:
            # first MoR commit on this table: seed the live-row count from
            # the pre-existing data files (footer metadata only)
            stats = {"data": sum(self._footer_rows(d) for d in prev_dirs
                                 if os.path.exists(d)),
                     "tomb": 0}
        stats["data"] += self._footer_rows(data_dir)
        stats["tomb"] += self._footer_rows(del_dir)
        live = max(stats["data"] - stats["tomb"], 1)
        snap = {"version": v, "mode": "append", "data_dirs": dirs,
                "meta": dict(meta or {}), "delete_dirs": dels,
                "delete_key": key, "mor_stats": stats}
        self._write_manifest(v, snap)
        if stats["tomb"] > compact_threshold * live:
            return self.compact(meta=meta)
        return v

    def compact(self, meta: dict | None = None) -> int:
        """Materialize the post-delete view into one fresh snapshot (the
        moral equivalent of Iceberg rewrite_data_files): one distributed
        rewrite clears all tombstones so read-side anti-join cost stays
        bounded. Carries ``meta`` (defaults to the current snapshot's)."""
        cur = self.current_version()
        if cur is None:
            return 0
        if meta is None:
            meta = self.snapshot(cur).meta
        return self._commit(self.read(), "overwrite", meta)

    def _footer_rows(self, data_dir: str) -> int:
        import pyarrow.parquet as pq

        n = 0
        for f in os.listdir(data_dir):
            if f.endswith(".parquet"):
                n += pq.read_metadata(os.path.join(data_dir, f)).num_rows
        return n

    def merge_upsert(self, df: DataFrame, key: str, prefer_new: bool = False,
                     meta: dict | None = None) -> int:
        """MERGE INTO semantics: insert rows whose key is absent; existing
        rows win unless prefer_new. The anti-join is the only shuffle; at
        Iceberg this is a real MERGE with file-level pruning."""
        if self.current_version() is None:
            return self._commit(df.dropDuplicates([key]), "overwrite", meta)
        cur = self.read()
        if prefer_new:
            merged = df.dropDuplicates([key]).unionByName(
                cur.join(df.select(key).distinct(), on=key, how="left_anti")
            )
            return self._commit(merged, "overwrite", meta)
        new_rows = df.dropDuplicates([key]).join(
            cur.select(key).distinct(), on=key, how="left_anti"
        )
        # append-only commit: existing files untouched, one new data dir
        return self._commit(new_rows, "append", meta)

    # -- reads

    def read(self, version: int | None = None) -> DataFrame:
        v = version if version is not None else self.current_version()
        if v is None:
            raise FileNotFoundError(f"table {self.path} has no snapshots")
        snap = self.snapshot(v)
        if not snap.delete_dirs:
            dirs = [d for d in snap.data_dirs if os.path.exists(d)]
            return self.spark.read.parquet(*dirs)
        # sequence-aware tombstones: data dir i is deleted-from only by
        # tombstones with upto > i. Group data dirs sharing the same
        # applicable-tombstone set -> one anti-join per group (group
        # count stays small because compaction clears the tombstones).
        groups: dict[tuple, list[str]] = {}
        for i, d in enumerate(snap.data_dirs):
            if not os.path.exists(d):
                continue
            applicable = tuple(
                e["dir"] for e in snap.delete_dirs if e["upto"] > i
            )
            groups.setdefault(applicable, []).append(d)
        out = None
        for applicable, ds in groups.items():
            df = self.spark.read.parquet(*ds)
            if applicable:
                tomb = self.spark.read.parquet(*applicable).select(
                    snap.delete_key
                ).distinct()
                df = df.join(tomb, on=snap.delete_key, how="left_anti")
            out = df if out is None else out.unionByName(df)
        return out

    def read_or_empty(self, schema_ddl: str, version: int | None = None) -> DataFrame:
        try:
            return self.read(version)
        except FileNotFoundError:
            return self.spark.createDataFrame([], schema=schema_ddl)

    def rollback_to(self, version: int) -> None:
        """Point _current at an older snapshot (time travel / resume)."""
        if not os.path.exists(self._snap_path(version)):
            raise FileNotFoundError(f"no snapshot v{version}")
        cur_tmp = os.path.join(self.path, "_current.tmp")
        with open(cur_tmp, "w") as f:
            f.write(str(version))
        os.replace(cur_tmp, os.path.join(self.path, "_current"))

    def latest_meta(self) -> dict:
        v = self.current_version()
        return {} if v is None else self.snapshot(v).meta
