"""WebDataset-style tar-shard reader/writer — the de-facto layout for
multimodal training data (tar shards whose members ``<key>.<ext>`` group
into one sample per key: ``0001.jpg`` + ``0001.txt`` + ``0001.json``).

Training pipelines consume these shards sequentially per file, which is
exactly Spark's binaryFile + ``mapInPandas`` shape: one task per shard,
no shuffle, parallelism = shard count (shards are sized for that — the
format exists so a 100 TB dataset streams as tens of thousands of ~1 GB
tars). The sample grouping happens inside the task (members of one
sample are adjacent in a well-formed shard, but the reader tolerates any
member order within a shard).
"""

from __future__ import annotations

import io
import tarfile
from typing import Iterator

WDS_DDL = "shard string, key string, exts array<string>, files map<string, binary>"
TAR_DDL = "shard string, name string, bytes binary"


#: Per-yield frame budget for the shard readers: flush to Spark once the
#: accumulated member payload crosses this many bytes (or at each archive
#: boundary), so a dense shard never materializes as ONE pandas frame.
CHUNK_BYTES = 64 << 20


def _split_key(name: str) -> tuple[str, str]:
    """member name → (sample key, extension). WebDataset convention: the
    key is everything up to the first dot of the BASENAME (so
    ``a/0001.seg.png`` → key ``a/0001``, ext ``seg.png``; a dotted
    directory like ``v1.2/0001.jpg`` keys as ``v1.2/0001``, not ``v1``
    — r4 advisory)."""
    d = name.rfind("/") + 1
    base, _, ext = name[d:].partition(".")
    return name[:d] + base, ext


def iter_tar_members(data: bytes) -> Iterator[tuple[str, bytes]]:
    """(name, bytes) for each regular file in a (possibly gzipped) tar."""
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:*") as tf:
        for m in tf:
            if m.isfile():
                f = tf.extractfile(m)
                if f is not None:
                    yield m.name, f.read()


def iter_webdataset_samples(data: bytes) -> Iterator[tuple[str, dict]]:
    """(key, {ext: bytes}) per sample. Tolerates arbitrary member order
    (samples are keyed, not positional)."""
    samples: dict[str, dict] = {}
    order: list[str] = []
    for name, blob in iter_tar_members(data):
        key, ext = _split_key(name)
        if key not in samples:
            samples[key] = {}
            order.append(key)
        samples[key][ext] = blob
    for key in order:
        yield key, samples[key]


def write_webdataset(path: str, samples: list[tuple[str, dict]],
                     gzip_shard: bool = False) -> None:
    """Write (key, {ext: bytes}) samples as one tar shard, members
    emitted in sample order (the streaming-friendly layout)."""
    mode = "w:gz" if gzip_shard else "w"
    with tarfile.open(path, mode) as tf:
        for key, files in samples:
            for ext, blob in sorted(files.items()):
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(blob)
                tf.addfile(info, io.BytesIO(blob))


class _Chunker:
    """Accumulate rows for a mapInPandas body and flush a bounded pandas
    frame whenever the payload budget is crossed — so a dense archive
    yields many small frames instead of one giant one (per-task memory is
    O(CHUNK_BYTES), not O(shard))."""

    def __init__(self, cols: tuple[str, ...], budget: int = CHUNK_BYTES):
        self.cols = cols
        self.budget = budget
        self.out: dict[str, list] = {c: [] for c in cols}
        self.pending = 0

    def add(self, row: tuple, nbytes: int):
        for c, v in zip(self.cols, row):
            self.out[c].append(v)
        self.pending += nbytes

    def flush_if_full(self):
        if self.pending >= self.budget:
            yield from self.flush()

    def flush(self):
        import pandas as pd

        if self.out[self.cols[0]]:
            yield pd.DataFrame(self.out)
            self.out = {c: [] for c in self.cols}
            self.pending = 0


def _tar_rows(batches, budget: int = CHUNK_BYTES):
    """mapInPandas body for :func:`read_tar` — module-level with an
    explicit budget so tests can drive it with plain pandas batches and
    assert the per-yield bound."""
    ck = _Chunker(("shard", "name", "bytes"), budget)
    for pdf in batches:
        for p, content in zip(pdf["path"], pdf["content"]):
            for name, blob in iter_tar_members(bytes(content)):
                ck.add((p, name, blob), len(blob))
                yield from ck.flush_if_full()
    yield from ck.flush()


def read_tar(spark, path: str):
    """tar shard(s) → (shard, name, bytes) DataFrame; one task per shard,
    bounded per-yield frames (``CHUNK_BYTES``). Note binaryFile caps a
    single shard at 2 GB (one Spark binary cell); use
    :func:`read_tar_stream` for oversized shards."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(_tar_rows, schema=TAR_DDL)


def _tar_stream_rows(batches, budget: int = CHUNK_BYTES):
    ck = _Chunker(("shard", "name", "bytes"), budget)
    for pdf in batches:
        for p in pdf["path"]:
            local = p[5:] if p.startswith("file:") else p
            with tarfile.open(local, mode="r|*") as tf:
                for m in tf:
                    if not m.isfile():
                        continue
                    f = tf.extractfile(m)
                    if f is None:
                        continue
                    blob = f.read()
                    ck.add((p, m.name, blob), len(blob))
                    yield from ck.flush_if_full()
    yield from ck.flush()


def read_tar_stream(spark, path: str):
    """Streaming variant of :func:`read_tar` for shards past binaryFile's
    2 GB column ceiling: the task opens the shard by PATH and streams
    members (``tarfile`` ``r|*`` mode — sequential, constant memory), so
    neither the whole shard nor more than ``CHUNK_BYTES`` of members is
    ever resident. Local/NFS paths here; on a cluster the open() seam is
    where an HDFS/S3 streaming client plugs in."""
    files = spark.read.format("binaryFile").load(path).select("path")
    return files.mapInPandas(_tar_stream_rows, schema=TAR_DDL)


def _zip_rows(batches, budget: int = CHUNK_BYTES):
    import zipfile

    ck = _Chunker(("shard", "name", "bytes"), budget)
    for pdf in batches:
        for p, content in zip(pdf["path"], pdf["content"]):
            with zipfile.ZipFile(io.BytesIO(bytes(content))) as zf:
                for info in zf.infolist():
                    if not info.is_dir():
                        blob = zf.read(info)
                        ck.add((p, info.filename, blob), len(blob))
                        yield from ck.flush_if_full()
    yield from ck.flush()


def read_zip(spark, path: str):
    """zip shard(s) → (shard, name, bytes) DataFrame (datasets that ship
    zipped instead of tarred); same one-task-per-shard shape, bounded
    per-yield frames."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(_zip_rows, schema=TAR_DDL)


def _wds_rows(batches, budget: int = CHUNK_BYTES):
    ck = _Chunker(("shard", "key", "exts", "files"), budget)
    for pdf in batches:
        for p, content in zip(pdf["path"], pdf["content"]):
            for key, sample in iter_webdataset_samples(bytes(content)):
                nbytes = sum(len(b) for b in sample.values())
                ck.add((p, key, sorted(sample), sample), nbytes)
                yield from ck.flush_if_full()
    yield from ck.flush()


def read_webdataset(spark, path: str):
    """WebDataset shard(s) → one row per SAMPLE:
    (shard, key, exts, files: map<ext, bytes>). Feed the map entries to
    the image/text operators (e.g. ``F.element_at(files, 'jpg')`` →
    decode_image_features). Samples flush in bounded frames; one sample's
    members must still fit in memory (they are one row)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(_wds_rows, schema=WDS_DDL)


EXPORT_DDL = "shard string, n_samples long, n_bytes long"


def export_webdataset(df, out_dir: str, n_shards: int,
                      key_col: str = "key", files_col: str = "files") -> list:
    """Distributed WebDataset EXPORT — the other half of the training
    loop: a Spark frame of keyed multimodal samples (``key string,
    files map<string, binary>`` — the read_webdataset shape, or the
    crawl images table after a one-line select) becomes ``n_shards``
    tar shards named ``shard-{i:05d}.tar``.

    100 TB shape: one shard per partition, written EXECUTOR-SIDE with a
    streaming tarfile (constant memory per task — a member is in memory
    only while being appended, never the whole shard); `repartition(n,
    key)` spreads samples deterministically by key hash and
    `sortWithinPartitions(key)` fixes member order, so the same input
    produces byte-identical shards on any cluster size or retry
    schedule. Retry/speculation-safe by the house writer protocol: tmp
    file + os.replace, first rename wins, duplicate attempts produce
    identical bytes. Returns the committed (shard, n_samples, n_bytes)
    rows."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)

    def write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        final = os.path.join(out_dir, f"shard-{pid:05d}.tar")
        tmp = final + f".inprogress-{os.getpid()}"
        n = 0
        with tarfile.open(tmp, "w") as tf:
            for pdf in batches:
                for key, files in zip(pdf["key"], pdf["files"]):
                    for ext, blob in sorted(files.items()):
                        blob = bytes(blob)
                        info = tarfile.TarInfo(name=f"{key}.{ext}")
                        info.size = len(blob)
                        tf.addfile(info, io.BytesIO(blob))
                    n += 1
        size = os.path.getsize(tmp)
        os.replace(tmp, final)  # atomic; retries overwrite with same bytes
        yield pd.DataFrame({
            "shard": [os.path.basename(final)],
            "n_samples": [n],
            "n_bytes": [size],
        })

    out = (
        df.select(F.col(key_col).alias("key"), F.col(files_col).alias("files"))
        .repartition(n_shards, "key")
        .sortWithinPartitions("key")
        .mapInPandas(write, schema=EXPORT_DDL)
    )
    return sorted(out.collect(), key=lambda r: r.shard)
