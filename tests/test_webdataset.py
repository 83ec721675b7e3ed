"""Tests for the WebDataset tar-shard source (sources/webdataset.py):
member iteration, sample grouping by key, the Spark readers, and an
end-to-end image+caption pipeline over shards."""

import numpy as np
import pytest

from etlpy_spark.functions.imagecodec import (
    caption_for,
    decode,
    encode_png,
    render_pixels,
)
from etlpy_spark.sources.webdataset import (
    iter_tar_members,
    iter_webdataset_samples,
    read_tar,
    read_webdataset,
    write_webdataset,
)


def _mk_samples(n=6, start=0):
    out = []
    for i in range(start, start + n):
        iid = f"img-{i:012d}"
        px = render_pixels(iid)
        out.append((f"{i:06d}", {
            "png": encode_png(px),
            "txt": caption_for(iid, 42).encode(),
            "json": b'{"id": "%s"}' % iid.encode(),
        }))
    return out


def test_roundtrip_plain_and_gzip_shards(tmp_path):
    samples = _mk_samples()
    for gz in (False, True):
        p = str(tmp_path / (f"s{gz}.tar" + (".gz" if gz else "")))
        write_webdataset(p, samples, gzip_shard=gz)
        got = list(iter_webdataset_samples(open(p, "rb").read()))
        assert [k for k, _ in got] == [k for k, _ in samples]
        for (k, files), (_, exp) in zip(got, samples):
            assert files == exp


def test_key_splits_at_first_dot_and_tolerates_any_order(tmp_path):
    import io
    import tarfile

    p = str(tmp_path / "odd.tar")
    with tarfile.open(p, "w") as tf:
        # interleaved member order + multi-dot extension
        for name, blob in (("a/0001.seg.png", b"A"), ("a/0002.txt", b"B"),
                           ("a/0001.txt", b"C"), ("a/0002.seg.png", b"D")):
            info = tarfile.TarInfo(name=name)
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))
    got = dict(iter_webdataset_samples(open(p, "rb").read()))
    assert got == {
        "a/0001": {"seg.png": b"A", "txt": b"C"},
        "a/0002": {"txt": b"B", "seg.png": b"D"},
    }


def test_spark_readers_match_serial(spark, tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    truth = {}
    for s in range(3):
        samples = _mk_samples(4, start=4 * s)
        write_webdataset(str(d / f"shard-{s:03d}.tar"), samples)
        truth.update(dict(samples))

    rows = read_webdataset(spark, str(d) + "/*.tar").collect()
    assert len(rows) == 12
    for r in rows:
        exp = truth[r.key]
        assert sorted(r.exts) == sorted(exp)
        assert {k: bytes(v) for k, v in r.files.items()} == exp

    # the flat tar reader sees every member
    n_members = read_tar(spark, str(d) + "/*.tar").count()
    assert n_members == 12 * 3


def test_webdataset_image_caption_pipeline(spark, tmp_path):
    """Shards → samples → decode the image member + pair the caption:
    the multimodal training-data ingest path, checked against the
    generators' ground truth."""
    from pyspark.sql import functions as F

    from etlpy_spark.operators import multimodal as mm

    d = tmp_path / "wds"
    d.mkdir()
    for s in range(2):
        write_webdataset(str(d / f"w-{s}.tar"), _mk_samples(5, start=5 * s))

    wds = read_webdataset(spark, str(d) + "/*.tar")
    pairs = wds.select(
        F.col("key").alias("image_id"),
        F.element_at("files", "png").alias("bytes"),
        F.decode(F.element_at("files", "txt"), "UTF-8").alias("caption"),
    )
    feats = mm.decode_image_features(pairs).join(
        pairs.select("image_id", "caption"), "image_id"
    )
    got = {r.image_id: r for r in feats.collect()}
    assert len(got) == 10
    for key, r in got.items():
        iid = f"img-{int(key):012d}"
        px = render_pixels(iid)
        assert (r.h, r.w) == px.shape[:2] and r.fmt == "png"
        assert r.caption == caption_for(iid, 42)


def test_read_zip_matches_serial(spark, tmp_path):
    import io
    import zipfile

    from etlpy_spark.sources.webdataset import read_zip

    d = tmp_path / "zips"
    d.mkdir()
    truth = {}
    for s in range(2):
        p = str(d / f"z-{s}.zip")
        with zipfile.ZipFile(p, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("dir/", "")  # directory entries are skipped
            for i in range(3):
                name, blob = f"d/{s}-{i}.bin", bytes([s, i]) * 50
                zf.writestr(name, blob)
                truth[name] = blob
    rows = read_zip(spark, str(d) + "/*.zip").collect()
    assert len(rows) == 6
    for r in rows:
        assert bytes(r.bytes) == truth[r.name]
