"""Sitemap ingestion — the seed-list front door of a real crawl.

A production crawl bootstraps its frontier from robots.txt ``Sitemap:``
lines, expands sitemap INDEX files into child sitemaps, and feeds the
urlset entries (with lastmod/changefreq/priority hints) into the
frontier as ordered seeds. The reference's crawler takes its URL list
from pipeline config (spider.py CrawData / etl.py BfsGE); this module
supplies the missing discovery step in the same sandbox style as the
rest of the engine: parsing is pure bytes→rows (fetching stays
injectable, sources/synthetic_web.py pattern), and the distributed form
is one ``mapInPandas`` over a (url, bytes) DataFrame of fetched blobs —
one task per partition, no shuffle, no per-row Python at plan level.

Tolerance rules (real-web sitemaps are routinely malformed): gzip is
transparent; XML is parsed namespace-insensitively; when the XML parser
refuses, a ``<loc>`` regex scan recovers entries; a non-XML payload is
treated as a plain-text sitemap (one URL per line — the spec's text
variant). Nothing here raises on hostile bytes: garbage yields zero
entries.
"""

from __future__ import annotations

import re
import zlib

SITEMAP_DDL = ("source string, loc string, kind string, lastmod string, "
               "changefreq string, priority double")

_LOC_RE = re.compile(r"<loc[^>]*>\s*(.*?)\s*</loc\s*>", re.I | re.S)
_SITEMAP_LINE = re.compile(r"^\s*sitemap\s*:\s*(\S+)", re.I | re.M)
_URLISH = re.compile(r"^[a-z][a-z0-9+.-]*://\S+$", re.I)


def _gunzip(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        try:
            return zlib.decompress(data, 47)
        except zlib.error:
            return data
    return data


def _local(tag: str) -> str:
    """Element tag without its namespace ({ns}loc -> loc)."""
    return tag.rsplit("}", 1)[-1].lower()


def _entry(kind: str, node) -> dict | None:
    loc, lastmod, changefreq, priority = None, None, None, None
    for child in node:
        name = _local(child.tag)
        text = (child.text or "").strip()
        if name == "loc":
            loc = text
        elif name == "lastmod":
            lastmod = text
        elif name == "changefreq":
            changefreq = text
        elif name == "priority":
            try:
                priority = float(text)
            except ValueError:
                priority = None
    if not loc:
        return None
    return {"loc": loc, "kind": kind, "lastmod": lastmod,
            "changefreq": changefreq, "priority": priority}


def parse_sitemap(data: bytes) -> list[dict]:
    """Sitemap bytes → entry dicts (loc, kind 'url'|'sitemap', lastmod,
    changefreq, priority). Never raises; order is document order."""
    import xml.etree.ElementTree as ET

    data = _gunzip(data)
    text = data.decode("utf-8", "replace")
    stripped = text.lstrip("﻿ \t\r\n")
    if stripped[:1] == "<":
        try:
            root = ET.fromstring(text)
        except ET.ParseError:
            # regex recovery: kind by which container tag appears first
            kind = "sitemap" if re.search(r"<sitemapindex\b", text, re.I) else "url"
            return [{"loc": m.group(1), "kind": kind, "lastmod": None,
                     "changefreq": None, "priority": None}
                    for m in _LOC_RE.finditer(text) if m.group(1)]
        rootname = _local(root.tag)
        out = []
        if rootname == "sitemapindex":
            for node in root:
                if _local(node.tag) == "sitemap":
                    e = _entry("sitemap", node)
                    if e:
                        out.append(e)
        elif rootname == "urlset":
            for node in root:
                if _local(node.tag) == "url":
                    e = _entry("url", node)
                    if e:
                        out.append(e)
        return out
    # plain-text sitemap: one URL per line
    out = []
    for line in text.splitlines():
        line = line.strip()
        if line and _URLISH.match(line):
            out.append({"loc": line, "kind": "url", "lastmod": None,
                        "changefreq": None, "priority": None})
    return out


def robots_sitemaps(robots_txt: str) -> list[str]:
    """``Sitemap:`` directives from a robots.txt body, in file order
    (the directive is host-wide — outside any User-agent group)."""
    return [m.group(1) for m in _SITEMAP_LINE.finditer(robots_txt)]


def sitemap_entries(spark, df, url_col: str = "url", bytes_col: str = "bytes"):
    """(url, bytes) DataFrame of fetched sitemap blobs → one row per
    entry: (source, loc, kind, lastmod, changefreq, priority). Child
    sitemaps surface as kind='sitemap' rows — fetch those and run this
    again (the fetch loop stays with the caller, like the crawl's
    fetcher seam). One task per input partition, no shuffle."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = {k: [] for k in
                   ("source", "loc", "kind", "lastmod", "changefreq", "priority")}
            for src, blob in zip(pdf[url_col], pdf[bytes_col]):
                for e in parse_sitemap(bytes(blob)):
                    out["source"].append(src)
                    out["loc"].append(e["loc"])
                    out["kind"].append(e["kind"])
                    out["lastmod"].append(e["lastmod"])
                    out["changefreq"].append(e["changefreq"])
                    out["priority"].append(e["priority"])
            yield pd.DataFrame(out)

    return df.select(
        df[url_col].alias(url_col), df[bytes_col].alias(bytes_col)
    ).mapInPandas(run, schema=SITEMAP_DDL)


def sitemap_seed_list(fetch, roots: list[str], max_depth: int = 3,
                      max_sitemaps: int = 10_000) -> list[str]:
    """Expand sitemap roots (robots_sitemaps output, or index URLs) into
    an ordered, deduplicated seed-URL list for ``SparkCrawler.run``.

    ``fetch(url) -> bytes | None`` is the injectable fetcher (sandbox
    rule — tests pass a dict lookup). Expansion is breadth-first in
    document order, so the seed order — and therefore the frontier's
    dispatch order — is deterministic. Cycle-safe and budget-capped:
    an index that references itself, or a hostile 10^6-file index tree,
    stops at ``max_sitemaps`` fetches."""
    seen_maps: set[str] = set()
    seeds: list[str] = []
    seen_urls: set[str] = set()
    level = [r for r in roots if r]
    for _ in range(max_depth + 1):
        if not level or len(seen_maps) >= max_sitemaps:
            break
        next_level: list[str] = []
        for sm in level:
            if sm in seen_maps or len(seen_maps) >= max_sitemaps:
                continue
            seen_maps.add(sm)
            blob = fetch(sm)
            if blob is None:
                continue
            for e in parse_sitemap(blob):
                if e["kind"] == "sitemap":
                    next_level.append(e["loc"])
                elif e["loc"] not in seen_urls:
                    seen_urls.add(e["loc"])
                    seeds.append(e["loc"])
        level = next_level
    return seeds
