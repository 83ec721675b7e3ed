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


# Spark DDL simple-string → pyarrow type, for the executor-side writer
# (covers the narrow bookkeeping tables that opt into per-column encodings)
def _pa_types() -> dict:
    import pyarrow as pa

    return {
        "string": pa.string(),
        "bigint": pa.int64(),
        "int": pa.int32(),
        "smallint": pa.int16(),
        "tinyint": pa.int8(),
        "double": pa.float64(),
        "float": pa.float32(),
        "boolean": pa.bool_(),
        "binary": pa.binary(),
        "date": pa.date32(),
    }


class _LazyPaTypes:
    def __getitem__(self, key: str):
        try:
            return _pa_types()[key]
        except KeyError:
            raise KeyError(
                f"no pyarrow mapping for Spark type {key!r}; extend _pa_types "
                "or drop `encodings` for this table"
            ) from None


_PA_TYPES = _LazyPaTypes()


def write_parquet_parts(
    df: DataFrame,
    data_dir: str,
    pa_schema,
    sort_cols: list[str],
    column_encoding: dict[str, str] | None,
    no_dict_cols: list[str] | None,
) -> list[int]:
    """Write one deterministic ``part-{pid:05d}.parquet`` per task into
    ``data_dir`` (pyarrow, executor-side) and return the per-task row
    counts. Retry/speculation-safe: each task buffers its whole partition,
    sorts, writes to a uuid tmp name and atomically renames to its
    partition-id name — a re-run of the same partition replaces its own
    output (same row set) instead of adding a duplicate part file. Columns
    named in ``column_encoding`` are written without dictionary so the
    encoding (e.g. DELTA_BYTE_ARRAY for sorted URLs) actually applies."""
    names = [f.name for f in pa_schema]
    dict_cols = [c for c in names if c not in (no_dict_cols or [])]

    def write(batches):
        import uuid

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        parts = [pdf for pdf in batches if len(pdf)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
        if sort_cols:
            pdf = pdf.sort_values(sort_cols, kind="stable")
        tbl = pa.Table.from_pandas(pdf[names], schema=pa_schema, preserve_index=False)
        tmp = os.path.join(data_dir, f".tmp-{uuid.uuid4().hex}")
        pq.write_table(
            tbl, tmp,
            column_encoding=column_encoding or None,
            use_dictionary=dict_cols,
        )
        os.replace(tmp, os.path.join(data_dir, f"part-{pid:05d}.parquet"))
        yield pd.DataFrame({"n": [len(pdf)]})

    return [int(r["n"]) for r in df.mapInPandas(write, schema="n long").collect()]


def parquet_files(data_dir: str) -> list[str]:
    """All committed parquet files under a data dir, recursively (external
    writers may commit whole per-partition directories), skipping tmp/
    hidden entries (.tmp-*, _*) that a killed straggler may leave behind."""
    out: list[str] = []
    for root, dirs, files in os.walk(data_dir):
        dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
        out.extend(
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )
    return sorted(out)


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
        encodings: dict[str, str] | None = None,
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
        # per-column parquet encodings (e.g. {"url": "DELTA_BYTE_ARRAY"}):
        # sorted crawl URLs prefix-delta to ~5 B/row vs ~15 B dict+snappy
        # (measured 17 -> 9 MB on a 2M-row sorted URL table; 34.5 MB for
        # the round-2 4-column layout). The Spark parquet writer exposes no
        # per-column encoding control, so tables that set this write their
        # data dirs through an executor-side pyarrow writer (deterministic
        # part names + atomic rename — retry/speculation-safe; see
        # _write_data_dir). Bytes through the write path are the
        # non-scaling resource on a shared bus / shared disk — trading them
        # for in-partition CPU is the scaling win (BENCH/BASELINE.md).
        self.encodings = encodings
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

    def _write_data_dir(
        self, df: DataFrame, data_dir: str, sort_cols: list[str] | None = None
    ) -> None:
        """Write ``df``'s rows as parquet under ``data_dir`` — the Spark
        writer by default, or (when per-column ``encodings`` are set) an
        executor-side pyarrow writer: each task buffers its partition,
        sorts by ``sort_within`` (overridable per call via ``sort_cols`` —
        never by mutating instance state, which would race under the
        engine's multi-threaded rounds), and writes ONE deterministic
        ``part-{pid:05d}.parquet`` via tmp + atomic rename, so a retried or
        speculated task replaces its own identical output instead of
        duplicating rows."""
        if sort_cols is None:
            sort_cols = self.sort_within or []
        if not self.encodings:
            if sort_cols and all(c in df.columns for c in sort_cols):
                df = df.sortWithinPartitions(*sort_cols)
            w = df.write.mode("overwrite")
            if self.compression:
                w = w.option("compression", self.compression)
            w.parquet(data_dir)
            return
        os.makedirs(data_dir, exist_ok=True)
        import pyarrow as pa

        pa_schema = pa.schema(
            [(f.name, _PA_TYPES[f.dataType.simpleString()]) for f in df.schema.fields]
        )
        sort_cols = [c for c in sort_cols if c in df.columns]
        enc = {k: v for k, v in self.encodings.items() if k in df.columns}
        no_dict = [c for c in enc] or None
        counts = write_parquet_parts(
            df, data_dir, pa_schema, sort_cols, enc, no_dict
        )
        if not counts:
            # an empty snapshot must still be readable with its schema
            # (spark.read.parquet cannot infer from zero files)
            import pyarrow.parquet as pq

            pq.write_table(
                pa_schema.empty_table(), os.path.join(data_dir, "part-empty.parquet")
            )

    def _commit(self, df: DataFrame, mode: str, meta: dict | None) -> int:
        v = (self.current_version() or 0) + 1
        data_dir = os.path.join(self.path, "data", f"v{v:06d}")
        self._write_data_dir(df, data_dir)
        snap = {"version": v, "mode": mode, "data_dirs": [data_dir], "meta": meta or {}}
        if mode == "append" and (prev := self.current_version()):
            ps = self.snapshot(prev)
            snap["data_dirs"] = ps.data_dirs + [data_dir]
            # tombstones survive plain appends (they delete from OLD dirs);
            # an overwrite resets them along with the data. mor_stats must
            # COUNT the appended rows: a frozen live-row count makes a later
            # tomb > threshold*live check fire a full compaction on a table
            # that is almost entirely live.
            if ps.delete_dirs:
                snap["delete_dirs"] = ps.delete_dirs
                snap["delete_key"] = ps.delete_key
                if ps.mor_stats:
                    snap["mor_stats"] = {
                        **ps.mor_stats,
                        "data": ps.mor_stats["data"] + self._footer_rows(data_dir),
                    }
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
        return v, self._footer_rows(self.snapshot(v).data_dirs[-1])

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
        written the reservation is abandoned (table state unchanged).

        Retry/speculation safety is the WRITER protocol's job (the moral
        equivalent of Iceberg's per-task commit metadata): every external
        writer in the engine emits deterministic per-partition names via
        atomic rename — single ``part-{pid:05d}.parquet`` files, or whole
        ``part-{pid:05d}/`` chunk directories committed by a first-rename-
        wins directory swap — so a retried or speculated task replaces /
        yields to its partition's output instead of duplicating rows
        (tests/test_task_retry.py forces a mid-write task failure and
        asserts bitwise crawl parity). This commit still fences the
        leftovers: in-progress attempt dirs are swept, tmp/hidden files are
        excluded from the manifest count, and a duplicate partition id
        (two committed entries for one pid — impossible under the rename
        protocol) fails the commit rather than double-counting."""
        import shutil

        shutil.rmtree(data_dir + ".inprogress", ignore_errors=True)
        files = parquet_files(data_dir)
        if not files:
            shutil.rmtree(data_dir, ignore_errors=True)
            return self.current_version() or 0, 0
        top = {
            os.path.relpath(f, data_dir).split(os.sep)[0] for f in files
        }
        pids = [t.split("-")[1].split(".")[0] for t in top if t.startswith("part-")]
        if len(pids) != len(set(pids)):
            raise RuntimeError(
                f"duplicate partition outputs in {data_dir}: {sorted(top)}"
            )
        n = self._footer_rows(data_dir)
        snap = {"version": version, "mode": mode, "data_dirs": [data_dir],
                "meta": meta or {}}
        if mode == "append" and (prev := self.current_version()):
            ps = self.snapshot(prev)
            snap["data_dirs"] = ps.data_dirs + [data_dir]
            if ps.delete_dirs:
                snap["delete_dirs"] = ps.delete_dirs
                snap["delete_key"] = ps.delete_key
                # count the externally committed rows into the live-row
                # stats (see _commit): n is already the footer total
                if ps.mor_stats:
                    snap["mor_stats"] = {
                        **ps.mor_stats, "data": ps.mor_stats["data"] + n
                    }
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
        self._write_data_dir(df, data_dir)
        # tombstones are URL-heavy too: route them through the same writer
        # so they get the sorted layout + delta encoding byte cut
        self._write_data_dir(delete_keys.select(key), del_dir, sort_cols=[key])
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

        return sum(pq.read_metadata(f).num_rows for f in parquet_files(data_dir))

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
        # recursiveFileLookup: external writers may commit whole
        # per-partition chunk DIRECTORIES (the image writer's atomic
        # directory-rename protocol); hidden/tmp names are skipped by
        # Spark's file index already
        rd = self.spark.read.option("recursiveFileLookup", "true")
        if not snap.delete_dirs:
            dirs = [d for d in snap.data_dirs if os.path.exists(d)]
            return rd.parquet(*dirs)
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
            df = rd.parquet(*ds)
            if applicable:
                tomb = rd.parquet(*applicable).select(
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
