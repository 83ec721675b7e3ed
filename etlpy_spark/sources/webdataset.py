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


def _split_key(name: str) -> tuple[str, str]:
    """member name → (sample key, extension). WebDataset convention: the
    key is everything up to the FIRST dot of the basename (so
    ``a/0001.seg.png`` → key ``a/0001``, ext ``seg.png``)."""
    base, dot, ext = name.partition(".")
    return base, ext


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


def read_tar(spark, path: str):
    """tar shard(s) → (shard, name, bytes) DataFrame; one task per shard."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def run(batches):
        for pdf in batches:
            out = {"shard": [], "name": [], "bytes": []}
            for p, content in zip(pdf["path"], pdf["content"]):
                for name, blob in iter_tar_members(bytes(content)):
                    out["shard"].append(p)
                    out["name"].append(name)
                    out["bytes"].append(blob)
            yield pd.DataFrame(out)

    return files.mapInPandas(run, schema=TAR_DDL)


def read_zip(spark, path: str):
    """zip shard(s) → (shard, name, bytes) DataFrame (datasets that ship
    zipped instead of tarred); same one-task-per-shard shape."""
    import zipfile

    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def run(batches):
        for pdf in batches:
            out = {"shard": [], "name": [], "bytes": []}
            for p, content in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(bytes(content))) as zf:
                    for info in zf.infolist():
                        if not info.is_dir():
                            out["shard"].append(p)
                            out["name"].append(info.filename)
                            out["bytes"].append(zf.read(info))
            yield pd.DataFrame(out)

    return files.mapInPandas(run, schema=TAR_DDL)


def read_webdataset(spark, path: str):
    """WebDataset shard(s) → one row per SAMPLE:
    (shard, key, exts, files: map<ext, bytes>). Feed the map entries to
    the image/text operators (e.g. ``F.element_at(files, 'jpg')`` →
    decode_image_features)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def run(batches):
        for pdf in batches:
            out = {"shard": [], "key": [], "exts": [], "files": []}
            for p, content in zip(pdf["path"], pdf["content"]):
                for key, sample in iter_webdataset_samples(bytes(content)):
                    out["shard"].append(p)
                    out["key"].append(key)
                    out["exts"].append(sorted(sample))
                    out["files"].append(sample)
            yield pd.DataFrame(out)

    return files.mapInPandas(run, schema=WDS_DDL)
