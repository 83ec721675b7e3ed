"""Round-5 advisory regression tests: EXIF orientation 7 (transverse vs
transpose), BMP V4/V5 header-internal BI_BITFIELDS masks, FLAC int32
range refusal, WebDataset dotted-directory keys, bounded per-yield frames
in every archive reader, and duplicate-capture dedup in archive replay."""

import io
import struct
import tarfile
import zipfile

import numpy as np
import pandas as pd
import pytest


# ---------------------------------------------------------------------------
# EXIF orientation 7 is the ANTI-diagonal flip, distinct from 5


def test_orientation_7_differs_from_5_and_maps_antidiagonal():
    from etlpy_spark.functions.jpegcodec import apply_orientation

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (4, 7, 3), dtype=np.uint8)  # non-symmetric
    o5, o7 = apply_orientation(px, 5), apply_orientation(px, 7)
    assert o5.shape == o7.shape == (7, 4, 3)
    assert not np.array_equal(o5, o7)
    # 5 = main-diagonal transpose; 7 = anti-diagonal (transverse)
    h, w = px.shape[:2]
    for i in (0, 3, 6):
        for j in (0, 3):
            assert np.array_equal(o5[i, j], px[j, i])
            assert np.array_equal(o7[i, j], px[h - 1 - j, w - 1 - i])
    # both diagonal flips stay self-inverse
    assert np.array_equal(apply_orientation(o5, 5), px)
    assert np.array_equal(apply_orientation(o7, 7), px)


# ---------------------------------------------------------------------------
# BMP V4/V5 BI_BITFIELDS: masks live INSIDE the header at offset 40


def _to_v4(blob: bytes, extra_after_masks: bytes = b"") -> bytes:
    """Rebuild a 40-byte-header BI_BITFIELDS BMP as a V4 (108-byte header)
    file: masks move from after-the-header into header offset 40, the
    pixel data offset shifts to 14+108."""
    (hdr_size,) = struct.unpack("<I", blob[14:18])
    assert hdr_size == 40
    info = bytearray(blob[14:54])
    masks = blob[54:66]  # the 3 DWORDs the 40-byte encoder appended
    (old_off,) = struct.unpack("<I", blob[10:14])
    body = blob[old_off:]
    struct.pack_into("<I", info, 0, 108)
    header = bytes(info) + masks + b"\x00" * 4 + b"\x00" * (108 - 40 - 16)
    assert len(header) == 108
    new_off = 14 + 108
    file_hdr = struct.pack("<2sIHHI", b"BM", new_off + len(body), 0, 0, new_off)
    return file_hdr + header + body


def test_bmp_v4_bitfields_masks_read_from_header():
    from etlpy_spark.functions.bmpcodec import decode_bmp, encode_bmp_ex
    from etlpy_spark.functions.imagecodec import render_pixels

    px = render_pixels("img-000000000077")
    for bpp, masks in ((16, (0xF800, 0x07E0, 0x001F)),
                       (32, (0xFF0000, 0x00FF00, 0x0000FF))):
        v1 = encode_bmp_ex(px, bpp=bpp, masks=masks)
        v4 = _to_v4(v1)
        assert np.array_equal(decode_bmp(v4), decode_bmp(v1)), bpp

    # truncation inside the V4 header raises ValueError, not struct.error
    v4 = _to_v4(encode_bmp_ex(px, bpp=16, masks=(0xF800, 0x07E0, 0x001F)))
    with pytest.raises(ValueError):
        decode_bmp(v4[:60])


# ---------------------------------------------------------------------------
# FLAC: int32 outside +/-2^23 must refuse, in-range int32 stays lossless


def test_flac_int32_out_of_range_refused_in_range_lossless():
    from etlpy_spark.functions.flaccodec import decode_flac, encode_flac

    rng = np.random.default_rng(3)
    ok = rng.integers(-(1 << 23), 1 << 23, size=(600, 2)).astype(np.int32)
    out, _ = decode_flac(encode_flac(ok))
    assert np.array_equal(out.astype(np.int64), ok.astype(np.int64))

    bad = ok.copy()
    bad[5, 0] = 1 << 23  # one sample past the 24-bit ceiling
    with pytest.raises(ValueError, match="24-bit"):
        encode_flac(bad)
    bad[5, 0] = -(1 << 23) - 1
    with pytest.raises(ValueError, match="24-bit"):
        encode_flac(bad)


# ---------------------------------------------------------------------------
# WebDataset keys split at the first dot of the BASENAME


def test_split_key_dotted_directory():
    from etlpy_spark.sources.webdataset import _split_key

    assert _split_key("v1.2/0001.jpg") == ("v1.2/0001", "jpg")
    assert _split_key("a/0001.seg.png") == ("a/0001", "seg.png")
    assert _split_key("0001.txt") == ("0001", "txt")
    assert _split_key("a.b/c.d/0002.json") == ("a.b/c.d/0002", "json")
    assert _split_key("noext") == ("noext", "")


def test_dotted_directory_samples_do_not_merge():
    from etlpy_spark.sources.webdataset import iter_webdataset_samples

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, blob in (("v1.2/0001.jpg", b"A"), ("v1.2/0001.txt", b"B"),
                           ("v1.2/0002.jpg", b"C")):
            info = tarfile.TarInfo(name=name)
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))
    got = dict(iter_webdataset_samples(buf.getvalue()))
    assert got == {"v1.2/0001": {"jpg": b"A", "txt": b"B"},
                   "v1.2/0002": {"jpg": b"C"}}


# ---------------------------------------------------------------------------
# Bounded per-yield frames in the archive reader bodies


def _dense_tar(n=40, size=1000) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for i in range(n):
            blob = bytes([i % 251]) * size
            info = tarfile.TarInfo(name=f"m{i:04d}.bin")
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))
    return buf.getvalue()


def _assert_bounded(frames, budget, max_member, n_rows):
    assert len(frames) > 1, "dense shard must flush more than one frame"
    sizes = [int(sum(len(b) for b in f["bytes"])) for f in frames]
    assert all(s <= budget + max_member for s in sizes), sizes
    assert sum(len(f) for f in frames) == n_rows


def test_tar_zip_reader_bodies_yield_bounded_frames(tmp_path):
    from etlpy_spark.sources.webdataset import _tar_rows, _tar_stream_rows, _zip_rows

    n, size, budget = 40, 1000, 4000
    tar = _dense_tar(n, size)
    batch = pd.DataFrame({"path": ["file:/x.tar"], "content": [tar]})
    frames = list(_tar_rows(iter([batch]), budget))
    _assert_bounded(frames, budget, size, n)
    # parity: concatenated frames == the whole shard
    cat = pd.concat(frames, ignore_index=True)
    assert list(cat["name"]) == [f"m{i:04d}.bin" for i in range(n)]

    p = tmp_path / "x.tar"
    p.write_bytes(tar)
    frames = list(_tar_stream_rows(
        iter([pd.DataFrame({"path": [f"file:{p}"]})]), budget))
    _assert_bounded(frames, budget, size, n)
    assert list(pd.concat(frames, ignore_index=True)["bytes"]) == list(cat["bytes"])

    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        for i in range(n):
            zf.writestr(f"m{i:04d}.bin", bytes([i % 251]) * size)
    batch = pd.DataFrame({"path": ["file:/x.zip"], "content": [zbuf.getvalue()]})
    frames = list(_zip_rows(iter([batch]), budget))
    _assert_bounded(frames, budget, size, n)


def test_webdataset_and_warc_bodies_yield_bounded_frames(tmp_path):
    from etlpy_spark.sources.warc import _warc_rows, write_warc
    from etlpy_spark.sources.webdataset import _wds_rows, write_webdataset

    n, size, budget = 30, 1000, 4000
    samples = [(f"{i:05d}", {"bin": bytes([i % 251]) * size}) for i in range(n)]
    p = tmp_path / "w.tar"
    write_webdataset(str(p), samples)
    batch = pd.DataFrame({"path": ["file:/w.tar"], "content": [p.read_bytes()]})
    frames = list(_wds_rows(iter([batch]), budget))
    assert len(frames) > 1
    sizes = [int(sum(len(b) for fm in f["files"] for b in fm.values()))
             for f in frames]
    assert all(s <= budget + size for s in sizes), sizes
    cat = pd.concat(frames, ignore_index=True)
    assert list(cat["key"]) == [k for k, _ in samples]

    wp = tmp_path / "w.warc.gz"
    write_warc(str(wp), [
        {"warc_type": "response", "url": f"http://h/{i}", "http_status": 200,
         "payload": bytes([i % 251]) * size, "date": "2026-01-01T00:00:00Z"}
        for i in range(n)
    ])
    batch = pd.DataFrame({"path": ["file:/w.warc.gz"],
                          "content": [wp.read_bytes()]})
    frames = list(_warc_rows(iter([batch]), budget))
    assert len(frames) > 1
    sizes = [int(sum(len(b) for b in f["payload"])) for f in frames]
    assert all(s <= budget + size for s in sizes), sizes
    cat = pd.concat(frames, ignore_index=True)
    # warcinfo + n responses, order preserved
    assert list(cat["url"])[-n:] == [f"http://h/{i}" for i in range(n)]


# ---------------------------------------------------------------------------
# Archive replay dedups duplicate captures of the same URL / image id


def test_archive_replay_dedups_duplicate_captures(spark, tmp_path):
    """Real WARC corpora hold multiple captures per URL. The replay must
    keep exactly one record per key (latest by date) so selected rows are
    never multiplied by the join — the crawl stays bitwise-identical to
    live even when every page/image also has an EARLIER garbage capture."""
    from etlpy_spark.crawl.frontier import CrawlConfig, SparkCrawler
    from etlpy_spark.sources.synthetic_web import WebConfig, seed_urls
    from etlpy_spark.sources.warc import archive_synthetic_web, write_warc

    web = WebConfig(n_hosts=2, n_cats=2, pages_per_cat=5, politeness_budget=2)
    seeds = seed_urls(web, n_per_host=2)
    arc_dir = str(tmp_path / "archive")
    archive_synthetic_web(web, arc_dir, segments=2)

    # stale duplicate capture for EVERY page url and one image id
    from etlpy_spark.sources.synthetic_web import make_url, page

    stale = []
    iid = None
    for k in range(web.n_hosts):
        for c in range(web.n_cats):
            for nn in range(1, web.pages_per_cat + 1):
                u = make_url(k, c, nn)
                iid = iid or (page(u, web)["image_ids"] or [None])[0]
                stale.append({
                    "warc_type": "response", "url": u, "http_status": 200,
                    "payload": b"<html>STALE CAPTURE</html>",
                    "date": "2025-06-01T00:00:00Z",
                })
    if iid:
        stale.append({
            "warc_type": "resource", "url": f"urn:image:{iid}",
            "payload": b"garbage-old-bytes",
            "content_type": "application/octet-stream",
            "date": "2025-06-01T00:00:00Z",
        })
    write_warc(arc_dir + "/seg-dup.warc.gz", stale)

    live = SparkCrawler(spark, str(tmp_path / "live"), CrawlConfig(web=web))
    live.run(seeds, max_rounds=2)
    replay = SparkCrawler(
        spark, str(tmp_path / "replay"),
        CrawlConfig(web=web, archive_path=arc_dir + "/*.warc.gz"),
    )
    replay.run(seeds, max_rounds=2)

    assert replay.crawl_log_list() == live.crawl_log_list()
    assert sorted(r.url for r in replay.seen.read().collect()) == \
        sorted(r.url for r in live.seen.read().collect())
    live_imgs = {r.image_id: bytes(r.bytes) for r in live.images.read().collect()}
    replay_imgs = {r.image_id: bytes(r.bytes) for r in replay.images.read().collect()}
    assert replay_imgs == live_imgs and live_imgs
