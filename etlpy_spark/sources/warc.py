"""WARC (ISO 28500 Web ARChive) reader/writer — the crawl interchange
format (Common Crawl publishes its corpus as gzipped WARC segments).

The reference engine fetches live pages (spider.py GetHTML); a web-scale
pipeline more often REPLAYS archived crawls, so the engine needs to
ingest WARC natively:

- ``write_warc`` emits spec-shaped records (warcinfo + request/response,
  CRLF headers, Content-Length framing, deterministic content-derived
  record IDs — no wall clock, no RNG, so tests and oracles re-derive
  identical bytes) with the Common Crawl convention of one gzip MEMBER
  per record, which is what makes records independently seekable.
- ``iter_warc_records`` parses plain or multi-member-gzip WARC bytes,
  framing on Content-Length, and unwraps the inner HTTP response (status,
  headers, body) when present.
- ``read_warc`` exposes archives to Spark as a DataFrame via binaryFile +
  ``mapInPandas`` — one task per segment file, the natural parallel unit
  (Common Crawl ships ~1 GB segments by the thousands; at 100 TB the
  fleet parallelism is the file count, and no shuffle is involved).
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

_CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# writer


def _record_bytes(rec: dict) -> bytes:
    """One uncompressed WARC record. ``rec``: warc_type, url, date,
    payload (bytes), http_status / http_content_type for response records,
    content_type to override the block type."""
    warc_type = rec.get("warc_type", "response")
    payload = rec.get("payload", b"")
    if warc_type == "response" and "http_status" in rec:
        extra = rec.get("http_headers") or {}
        lines = [
            f"HTTP/1.1 {rec['http_status']} OK",
            f"Content-Type: {rec.get('http_content_type', 'text/html')}",
        ] + [f"{k}: {v}" for k, v in extra.items()]
        if not any(k.lower() == "transfer-encoding" for k in extra):
            lines.append(f"Content-Length: {len(payload)}")
        head = ("\r\n".join(lines) + "\r\n\r\n").encode("ascii")
        block = head + payload
        block_type = "application/http; msgtype=response"
    else:
        block = payload
        block_type = rec.get("content_type", "application/octet-stream")
    date = rec.get("date", "2026-01-01T00:00:00Z")
    url = rec.get("url", "")
    digest = hashlib.sha1(url.encode() + date.encode() + block).hexdigest()
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode("ascii"),
        b"WARC-Record-ID: <urn:sha1:" + digest.encode("ascii") + b">",
        b"WARC-Date: " + date.encode("ascii"),
    ]
    if url:
        headers.append(b"WARC-Target-URI: " + url.encode("ascii"))
    headers.append(b"Content-Type: " + block_type.encode("ascii"))
    headers.append(b"Content-Length: " + str(len(block)).encode("ascii"))
    return _CRLF.join(headers) + _CRLF * 2 + block + _CRLF * 2


def write_warc(path: str, records: list[dict], compress: bool = True,
               info: dict | None = None) -> None:
    """Write records (prefixed by a warcinfo record) to ``path``. With
    ``compress`` each record is its own gzip member (the Common Crawl
    layout — members concatenate into one valid .warc.gz stream)."""
    info_payload = "\r\n".join(
        f"{k}: {v}" for k, v in (info or {"software": "etlpy-spark"}).items()
    ).encode("ascii")
    all_recs = [
        {"warc_type": "warcinfo", "payload": info_payload,
         "content_type": "application/warc-fields"},
    ] + list(records)
    with open(path, "wb") as f:
        for rec in all_recs:
            raw = _record_bytes(rec)
            if compress:
                co = zlib.compressobj(6, zlib.DEFLATED, 31)  # gzip member
                f.write(co.compress(raw) + co.flush())
            else:
                f.write(raw)


# ---------------------------------------------------------------------------
# reader


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (or pass through)."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = bytearray()
    while data:
        d = zlib.decompressobj(31)
        out += d.decompress(data)
        out += d.flush()
        if not d.eof:
            raise ValueError("truncated gzip member in WARC stream")
        data = d.unused_data
    return bytes(out)


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield dicts per record: warc_type, url, date, record_id, headers,
    block (bytes), and for http responses http_status / http_content_type
    / payload (the entity body). Frames strictly on Content-Length."""
    data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        head_end = data.find(_CRLF * 2, pos)
        if head_end < 0:
            raise ValueError("truncated WARC record header")
        lines = data[pos:head_end].split(_CRLF)
        if not lines[0].startswith(b"WARC/"):
            raise ValueError(f"bad WARC version line at offset {pos}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("ascii", "replace").lower()] = (
                v.strip().decode("ascii", "replace")
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing Content-Length") from None
        block_at = head_end + 4
        if block_at + length > n:
            raise ValueError("truncated WARC record block")
        block = data[block_at : block_at + length]
        pos = block_at + length
        rec = {
            "warc_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri", ""),
            "date": headers.get("warc-date", ""),
            "record_id": headers.get("warc-record-id", ""),
            "headers": headers,
            "block": block,
        }
        if headers.get("content-type", "").startswith("application/http"):
            split = block.find(_CRLF * 2)
            if split >= 0 and block[:5] == b"HTTP/":
                http_lines = block[:split].split(_CRLF)
                parts = http_lines[0].split()
                rec["http_status"] = int(parts[1]) if len(parts) > 1 else 0
                hh: dict[str, str] = {}
                for line in http_lines[1:]:
                    k, _, v = line.partition(b":")
                    hh[k.strip().lower().decode("ascii", "replace")] = (
                        v.strip().decode("ascii", "replace")
                    )
                if "content-type" in hh:
                    rec["http_content_type"] = hh["content-type"]
                payload, enc = _decode_http_body(block[split + 4 :], hh)
                rec["payload"] = payload
                rec["http_content_encoding"] = enc
        yield rec


def _dechunk(body: bytes) -> bytes:
    """Transfer-Encoding: chunked → entity bytes (trailers ignored)."""
    out = bytearray()
    pos = 0
    while True:
        eol = body.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("chunked: missing size line")
        size = int(body[pos:eol].split(b";")[0].strip(), 16)
        start = eol + 2
        if size == 0:
            return bytes(out)
        if start + size > len(body):
            raise ValueError("chunked: truncated chunk")
        out += body[start : start + size]
        pos = start + size
        if body[pos : pos + 2] != _CRLF:
            raise ValueError("chunked: missing chunk CRLF")
        pos += 2


def _decode_http_body(payload: bytes, hh: dict[str, str]) -> tuple[bytes, str]:
    """Undo the wire encodings a real crawl's WARC responses carry —
    Transfer-Encoding: chunked framing, then Content-Encoding gzip /
    deflate (both the zlib-wrapped and the raw-DEFLATE server variants)
    via stdlib zlib. Returns ``(entity_bytes, encoding_mark)`` where the
    mark is '' once fully decoded, or a typed residue ('br', 'zstd',
    'gzip-malformed', 'chunked-malformed', ...) so a 100 TB corpus can
    account for what it could not decode — tolerant, never raises."""
    te = hh.get("transfer-encoding", "").lower()
    if "chunked" in te:
        try:
            payload = _dechunk(payload)
        except (ValueError, IndexError):
            return payload, "chunked-malformed"
    ce = hh.get("content-encoding", "").strip().lower()
    if ce in ("", "identity"):
        return payload, ""
    if ce in ("gzip", "x-gzip"):
        try:
            return zlib.decompress(payload, 47), ""  # 47 = auto zlib/gzip
        except zlib.error:
            return payload, "gzip-malformed"
    if ce in ("deflate", "x-deflate"):
        try:
            return zlib.decompress(payload, 15), ""
        except zlib.error:
            try:
                return zlib.decompress(payload, -15), ""  # raw-DEFLATE servers
            except zlib.error:
                return payload, "deflate-malformed"
    return payload, ce  # brotli/zstd need codecs not available here


import re as _re

_DROP_BLOCKS = _re.compile(
    r"<(script|style|noscript)\b[^>]*>.*?</\1\s*>", _re.I | _re.S
)
_COMMENTS = _re.compile(r"<!--.*?-->", _re.S)
_TAGS = _re.compile(r"<[^>]*>")
_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
             "&apos;": "'", "&nbsp;": " ", "&#39;": "'"}


def html_to_text(html: str) -> str:
    """Visible text of an HTML page (tag-stripped, whitespace-normalized)
    — the WET-extraction step of a Common Crawl pipeline. Well-formed
    markup goes through a real parse (ElementTree itertext); real-world
    malformed HTML (unclosed tags, bare ampersands — i.e. most of the
    web) falls back to a tolerant extractor that drops script/style/
    comment blocks, strips tags, and decodes the common entities. Never
    raises."""
    if not html:
        return ""
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(html)
        return " ".join("".join(root.itertext()).split())
    except ET.ParseError:
        pass
    t = _COMMENTS.sub(" ", html)
    t = _DROP_BLOCKS.sub(" ", t)
    t = _TAGS.sub(" ", t)
    for ent, ch in _ENTITIES.items():
        t = t.replace(ent, ch)
    t = _re.sub(r"&#(\d{1,7});", lambda m: chr(int(m.group(1))) if int(m.group(1)) < 0x110000 else " ", t)
    return " ".join(t.split())


def warc_to_documents(spark, path: str, main_content: bool = False):
    """WARC archive(s) → a ``documents``-shaped DataFrame
    (doc_id, url, date, text): HTTP html responses charset-detected
    (functions/charset.py — BOM / Content-Type / meta tag / UTF-8
    validation / cp1252 fallback, the reference's meta-regex + chardet
    pipeline at spider.py:99,144-155 without the package) then
    tag-stripped to visible text. With ``main_content=True`` an extra
    ``main_text`` column carries the boilerplate-removed article body
    (block-level link-density classifier, functions/boilerplate.py) —
    the step between WET extraction and a training corpus. The front
    door of the training-corpus pipeline —
    feed the result straight into ``operators.corpus.prepare_corpus``
    (annotate → quality/repetition filter → PII redact → dedup →
    sample → pack). Same parallel shape as :func:`read_warc`: one task
    per segment, no shuffle."""
    import pandas as pd
    from pyspark.sql import functions as F

    recs = read_warc(spark, path).filter(
        (F.col("warc_type") == "response")
        & F.col("http_content_type").startswith("text/html")
        # keep only fully-decoded entities: rows whose Content-Encoding
        # could not be undone (brotli/zstd/malformed) would tag-strip to
        # garbage — they stay in read_warc with a typed mark for triage
        & (F.col("http_content_encoding") == "")
    )

    def run(batches):
        from etlpy_spark.functions.boilerplate import extract_main_content
        from etlpy_spark.functions.charset import decode_html_bytes

        for pdf in batches:
            out = {"doc_id": [], "url": [], "date": [], "text": []}
            if main_content:
                out["main_text"] = []
            for rid, u, d, ct, payload in zip(
                pdf["record_id"], pdf["url"], pdf["date"],
                pdf["http_content_type"], pdf["payload"]
            ):
                html = decode_html_bytes(bytes(payload), ct or "")
                out["doc_id"].append(rid)
                out["url"].append(u)
                out["date"].append(d)
                out["text"].append(html_to_text(html))
                if main_content:
                    out["main_text"].append(extract_main_content(html))
            yield pd.DataFrame(out)

    schema = "doc_id string, url string, date string, text string"
    if main_content:
        schema += ", main_text string"
    return recs.mapInPandas(run, schema=schema)


def archive_synthetic_web(cfg, out_dir: str, segments: int = 3) -> int:
    """Archive the whole synthetic web (every canonical page URL plus
    every referenced image blob) into ``segments`` .warc.gz files — the
    fixture for archive-replay crawl tests. Pages become ``response``
    records keyed by canonical URL; image blobs become ``resource``
    records keyed by ``urn:image:<image_id>``. Deterministic: same cfg →
    byte-identical segments. Returns the number of records written."""
    import os

    from etlpy_spark.sources.synthetic_web import fetch_image, make_url, page

    os.makedirs(out_dir, exist_ok=True)
    recs: list[dict] = []
    image_ids: set[str] = set()
    for k in range(cfg.n_hosts):
        for c in range(cfg.n_cats):
            for n in range(1, cfg.pages_per_cat + 1):
                u = make_url(k, c, n)
                pg = page(u, cfg)
                image_ids.update(pg["image_ids"])
                recs.append({
                    "warc_type": "response", "url": u, "http_status": 200,
                    "http_content_type": "text/html",
                    "payload": pg["html"].encode(),
                    "date": "2026-01-01T00:00:00Z",
                })
    for iid in sorted(image_ids):
        recs.append({
            "warc_type": "resource", "url": f"urn:image:{iid}",
            "payload": fetch_image(iid, cfg),
            "content_type": "application/octet-stream",
            "date": "2026-01-01T00:00:00Z",
        })
    for s in range(segments):
        write_warc(
            os.path.join(out_dir, f"seg-{s:03d}.warc.gz"),
            recs[s::segments],
        )
    return len(recs)


WARC_DDL = (
    "path string, warc_type string, url string, date string, "
    "record_id string, http_status int, http_content_type string, "
    "http_content_encoding string, payload binary"
)


def read_warc(spark, path: str):
    """WARC archive(s) → DataFrame. One task per segment file via
    binaryFile (no shuffle; parallelism = file count — the Common Crawl
    shape, where segments are ~1 GB and number in the thousands).
    warcinfo records are kept (filter on warc_type to drop them);
    non-HTTP records carry the raw block as payload. Records flush in
    bounded pandas frames (the webdataset ``CHUNK_BYTES`` budget), so a
    dense segment never materializes as ONE frame; binaryFile still caps
    a single segment at Spark's 2 GB binary-cell ceiling."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(_warc_rows, schema=WARC_DDL)


def _warc_rows(batches, budget: int | None = None):
    """mapInPandas body for :func:`read_warc` — module-level with an
    explicit budget so tests can drive it with plain pandas batches and
    assert the per-yield bound."""
    from etlpy_spark.sources.webdataset import CHUNK_BYTES, _Chunker

    cols = ("path", "warc_type", "url", "date", "record_id",
            "http_status", "http_content_type", "http_content_encoding",
            "payload")
    ck = _Chunker(cols, CHUNK_BYTES if budget is None else budget)
    for pdf in batches:
        for p, content in zip(pdf["path"], pdf["content"]):
            for rec in iter_warc_records(bytes(content)):
                payload = rec.get("payload", rec["block"])
                ck.add(
                    (p, rec["warc_type"], rec["url"], rec["date"],
                     rec["record_id"], rec.get("http_status"),
                     rec.get("http_content_type"),
                     rec.get("http_content_encoding"), payload),
                    len(payload),
                )
                yield from ck.flush_if_full()
    yield from ck.flush()
