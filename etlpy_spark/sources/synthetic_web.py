"""Deterministic synthetic web (FIXTURES.md F2/F3): pages, links, robots,
images and captions are pure functions of (canonical_url, seed).

This replaces the reference's live HTTP layer (reference spider.py:100-157
GetHTML, spider.py:73-78 GetImage) in-sandbox: the Spark fetch UDFs and the
single-threaded parity oracle (crawl/oracle.py) call the *same* functions,
so crawl-order / seen-set / image parity is meaningful.

The page space: ``http://host{k}.example/cat{c}/p{n}`` with k<H, c<C, n≥1.
Out-links stay mostly on-host (real crawl locality) with a cross-host edge
every 5th page; host0 can be given a seed-skew factor to exercise hot-domain
politeness handling.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass, field

from etlpy_spark.functions.imagecodec import caption_for, image_bytes


def h64(s: str, seed: int) -> int:
    """Shared 64-bit deterministic hash (md5-based so the pure-Python oracle
    and the Spark-side pandas UDFs agree bit-for-bit; the engine's internal
    shard keys use Spark's builtin xxhash64 where parity isn't required)."""
    return int.from_bytes(hashlib.md5(f"{seed}|{s}".encode()).digest()[:8], "big")


@dataclass
class WebConfig:
    seed: int = 42
    n_hosts: int = 8
    n_cats: int = 4
    pages_per_cat: int = 50  # page-number space wraps at this
    max_links: int = 3
    max_images: int = 2
    image_universe: int = 10_000
    skew_host0: int = 1  # seed multiplicity for host0 (hot-domain knob)
    politeness_budget: int = 4  # max fetches per host per round
    dim_scale: int = 1  # image dimension multiplier (4 ≈ real web images)
    force_fmt: str = ""  # pin image container format ('' = per-id mix)
    # serve every ~Nth image (deterministic per id) as a MALFORMED JPEG —
    # a baseline scan layout under an SOF2 header, which the decoder
    # (rightly) refuses even though it decodes real progressive files —
    # the real-web garbage case the crawl path must absorb as a
    # decode_error row, not a task failure. 0 = off.
    unsupported_every: int = 0

    def priority(self, url: str) -> int:
        return h64("prio|" + url, self.seed) % 100


_URL_RE = re.compile(r"^http://host(\d+)\.example/cat(\d+)/p(\d+)$")


def parse_url(url: str) -> tuple[int, int, int] | None:
    m = _URL_RE.match(url)
    if not m:
        return None
    return int(m.group(1)), int(m.group(2)), int(m.group(3))


def make_url(k: int, c: int, n: int) -> str:
    return f"http://host{k}.example/cat{c}/p{n}"


def host_expr(col):
    """JVM-side ``url_host_of`` (parse_url semantics: synthetic host or "").
    Pure Column expression so the crawl never ships URLs to Python just to
    derive the host."""
    from pyspark.sql import functions as F

    num = F.regexp_extract(col, _URL_RE.pattern, 1)
    return F.when(num != "", F.concat(F.lit("host"), num, F.lit(".example"))).otherwise(F.lit(""))


def priority_expr(col, seed: int):
    """JVM-side ``WebConfig.priority`` — bit-exact h64 parity: md5 of
    "{seed}|prio|{url}", first 8 bytes as unsigned big-endian (= first 16
    hex chars via conv base16→10 into decimal(20,0)), mod 100. Verified
    against the pure-Python h64 in tests (including non-ASCII URLs)."""
    from pyspark.sql import functions as F

    u64 = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}|prio|"), col)), 1, 16), 16, 10
    ).cast("decimal(20,0)")
    return F.pmod(u64, F.lit(100)).cast("int")


def robots_disallow(host: str, cfg: WebConfig) -> list[str]:
    """host k disallows /cat{k % n_cats}/ when k % 7 == 0 (FIXTURES.md F3)."""
    m = re.match(r"^host(\d+)\.example$", host)
    if not m:
        return []
    k = int(m.group(1))
    if k % 7 == 0:
        return [f"/cat{k % cfg.n_cats}/"]
    return []


def robots_crawl_delay(host: str, cfg: WebConfig) -> int:
    """host k declares ``Crawl-delay: 2 + k%3`` (seconds) when k % 5 == 3;
    other hosts declare none (0). Deterministic like every robots rule."""
    m = re.match(r"^host(\d+)\.example$", host)
    if not m:
        return 0
    k = int(m.group(1))
    return 2 + (k % 3) if k % 5 == 3 else 0


def host_round_budget(host: str, cfg: WebConfig) -> int:
    """Per-host politeness budget for one round: the configured budget K
    corresponds to default request pacing; a host demanding a Crawl-delay
    d× the default gets K/d fetches per round (min 1 so progress is
    guaranteed). Part of THE CRAWL RULE — implemented identically by the
    serial oracle and the Spark engine's JVM-side budget expression."""
    d = robots_crawl_delay(host, cfg)
    return max(1, cfg.politeness_budget // d) if d > 0 else cfg.politeness_budget


def robots_txt(host: str, cfg: WebConfig) -> str:
    """Render host's deterministic robots RULES as a robots.txt document
    — what a live server at ``http://{host}/robots.txt`` would return.
    The functions above stay the engine's rule source (the injected-seam
    contract); this text form exists so the RFC 9309 parser
    (functions/robots.py) is differentially pinned against them:
    ``parse_robots(robots_txt(h)) == (robots_disallow(h),
    robots_crawl_delay(h))`` for every host."""
    lines = ["User-agent: *"]
    dis = robots_disallow(host, cfg)
    for d in dis:
        lines.append(f"Disallow: {d}")
    if not dis:
        lines.append("Disallow:")  # explicit allow-all group
    delay = robots_crawl_delay(host, cfg)
    if delay:
        lines.append(f"Crawl-delay: {delay}")
    lines.append(f"Sitemap: http://{host}/sitemap.xml")
    return "\n".join(lines) + "\n"


def robots_allowed(url: str, cfg: WebConfig) -> bool:
    p = parse_url(url)
    if p is None:
        return False
    k, c, n = p
    path = f"/cat{c}/p{n}"
    return not any(path.startswith(d) for d in robots_disallow(f"host{k}.example", cfg))


def page(url: str, cfg: WebConfig) -> dict:
    """Fetch simulation: {html, links, image_ids, captions} for a canonical
    URL. Unknown URLs 404 (empty page)."""
    p = parse_url(url)
    if p is None:
        return {"html": "", "links": [], "image_ids": [], "captions": []}
    k, c, n = p
    h = h64("page|" + url, cfg.seed)
    n_links = h % (cfg.max_links + 1)
    links = []
    for i in range(n_links):
        nn = (n * 7 + i * 13 + (h >> (8 + 4 * i)) % 11) % cfg.pages_per_cat + 1
        links.append(make_url(k, c, nn))
    if h % 5 == 0:
        kk = (k + 1 + (h >> 24) % max(1, cfg.n_hosts - 1)) % cfg.n_hosts
        cc = (c + (h >> 28) % cfg.n_cats) % cfg.n_cats
        links.append(make_url(kk, cc, (h >> 32) % cfg.pages_per_cat + 1))
    n_img = (h >> 16) % (cfg.max_images + 1)
    image_ids = [
        f"img-{(h64(f'imgref|{url}|{i}', cfg.seed)) % cfg.image_universe:012d}"
        for i in range(n_img)
    ]
    captions = [caption_for(i, cfg.seed) for i in image_ids]
    # attribute values are XML-escaped (quoteattr) so the markup is
    # well-formed for ANY future caption/url vocabulary — today's values
    # are XML-clean, so the escape is byte-identity and parity-neutral
    from xml.sax.saxutils import quoteattr

    body = "".join(
        [f"<a href={quoteattr(l)}>l</a>" for l in links]
        + [
            f"<img src={quoteattr(i)} alt={quoteattr(cap)} />"
            for i, cap in zip(image_ids, captions)
        ]
    )
    html = f"<html><body><h1>{url}</h1>{body}</body></html>"
    return {"html": html, "links": links, "image_ids": image_ids, "captions": captions}


def _mark_progressive(data: bytes) -> bytes:
    """Rewrite a baseline JPEG's SOF0 marker to SOF2 via a marker walk
    (segment payloads may contain \\xff\\xc0 by coincidence — a blind
    byte replace is not safe)."""
    b = bytearray(data)
    i = 2  # past SOI
    while i + 4 <= len(b) and b[i] == 0xFF:
        if b[i + 1] == 0xC0:
            b[i + 1] = 0xC2
            return bytes(b)
        i += 2 + ((b[i + 2] << 8) | b[i + 3])
    return data


def fetch_image(image_id: str, cfg: WebConfig) -> bytes:
    if (
        cfg.unsupported_every > 0
        and h64("unsup|" + image_id, cfg.seed) % cfg.unsupported_every == 0
    ):
        # a structurally CORRUPT progressive JPEG: baseline scan layout
        # under a rewritten SOF2 marker, which decode_jpg_image refuses
        # (real SOF2 files decode) — the skip-with-reason path's test blob
        return _mark_progressive(image_bytes(image_id, cfg.seed, cfg.dim_scale, "jpg"))
    return image_bytes(image_id, cfg.seed, cfg.dim_scale, cfg.force_fmt)


def parse_page(html: str) -> dict:
    """Extract {links, image_ids, captions} from a fetched page by PARSING
    its HTML — the same ElementTree parse the CrawlerTF extraction layer
    uses (``crawler_fetcher`` below; reference semantics: the spider
    fetches markup and extracts anchors/images from the parsed tree,
    spider.py:211-261 + GetImage spider.py:73-78 — it never receives a
    pre-extracted link list). The BfsGE fetch stage calls this per page,
    so the benchmark's per-URL cost includes the parse a real crawl pays.

    ``test_round2_ops.py::test_parse_page_matches_generator`` proves the
    round-trip exact: parse_page(page(u)["html"]) equals page(u)'s own
    link/image/caption lists for every URL shape, so the serial oracle
    (crawl/oracle.py) may keep reading the generator's lists directly —
    crawl order, seen set and image rows are bitwise unaffected."""
    if not html:
        return {"links": [], "image_ids": [], "captions": []}
    import xml.etree.ElementTree as ET

    try:
        root = ET.fromstring(html)
    except ET.ParseError:
        # a malformed page must not kill the whole fetch task — skip it,
        # like crawler_fetcher below (real spiders tolerate bad markup)
        return {"links": [], "image_ids": [], "captions": []}
    links = [a.attrib["href"] for a in root.iter("a")]
    image_ids, captions = [], []
    for img in root.iter("img"):
        image_ids.append(img.attrib["src"])
        captions.append(img.attrib.get("alt", ""))
    return {"links": links, "image_ids": image_ids, "captions": captions}


# ---------------------------------------------------------------------------
# seed list (FIXTURES.md F2) — includes dirty variants to exercise RFC-3986


_DIRTY = [
    lambda u: u,
    lambda u: u.replace("http://", "HTTP://").replace("host", "HoSt"),
    lambda u: u.replace(".example/", ".example:80/"),
    lambda u: u.replace("/cat", "/x/../cat"),
    lambda u: u + "?",
    lambda u: u.replace("/p", "/%70"),  # %70 = 'p', decodes to unreserved
]


def seed_urls(cfg: WebConfig, n_per_host: int = 2) -> list[str]:
    """Deterministic seed list in dispatch order (the reference dispatches
    jobs in seed order, distributed.py:60-66). host0 is repeated by
    ``skew_host0`` to create a hot domain."""
    seeds: list[str] = []
    i = 0
    for k in range(cfg.n_hosts):
        reps = cfg.skew_host0 if k == 0 else 1
        for r in range(reps):
            for j in range(n_per_host):
                c = (k + j + r) % cfg.n_cats
                n = (h64(f"seed|{k}|{r}|{j}", cfg.seed) % cfg.pages_per_cat) + 1
                url = make_url(k, c, n)
                seeds.append(_DIRTY[i % len(_DIRTY)](url))
                i += 1
    return seeds


# ---------------------------------------------------------------------------
# fetcher factory for the plan compiler's CrawlerTF (SmartCrawler semantics:
# reference spider.py:211-261 CrawData/GetDataFromCrawItems)


def extract_list_records(root, crawler) -> list[dict]:
    """List-mode extraction (reference spider.py:228-261
    ``GetDataFromCrawItems``): resolve the repeating-container root — the
    explicit ``RootXPath`` if set, else inferred via ``GetMaxCompareXPath``
    — then emit ONE record per root node with each CrawItem evaluated
    root-relatively. This keeps an item's fields aligned even when a
    container instance is missing an optional field (the failure mode of
    flat positional zipping). When no root can be inferred (single item /
    identical paths) each flat match is its own record."""
    from etlpy_spark.functions.expr import (
        get_max_compare_xpath,
        xpath_lite_doc,
        xpath_lite_text,
    )

    explicit = bool(crawler.root_xpath)
    root_xpath = crawler.root_xpath or get_max_compare_xpath(
        [ci.xpath for ci in crawler.crawl_items]
    )
    if root_xpath:
        n_root_seg = len(root_xpath.split("/"))
        recs = []
        for node in xpath_lite_doc(root, root_xpath):
            rec = {}
            for ci in crawler.crawl_items:
                # explicit root: item paths are node-relative (reference
                # appends them to tree.getpath(node)); inferred root: strip
                # the shared prefix segments (spider.py:250-252)
                rel = ci.xpath if explicit else "/".join(ci.xpath.split("/")[n_root_seg:])
                vals = xpath_lite_text(node, rel)
                rec[ci.name] = vals[0] if vals else None
            if all(v is None for v in rec.values()):
                continue  # reference skips empty documents (spider.py:257)
            recs.append(rec)
        return recs
    per_item = {ci.name: xpath_lite_text(root, ci.xpath) for ci in crawler.crawl_items}
    n = max((len(v) for v in per_item.values()), default=0)
    return [
        {k: (v[i] if i < len(v) else None) for k, v in per_item.items()}
        for i in range(n)
    ]


def crawler_fetcher(cfg: WebConfig):
    """Returns ctx.fetcher: CrawlerSpec -> (list[url] -> list[list[dict]]).

    Extraction runs the crawler's CrawItems XPaths against the synthetic
    page HTML via the same XPath-lite evaluator the XPathTF stage uses."""
    import xml.etree.ElementTree as ET

    from etlpy_spark.functions.expr import xpath_lite_text

    def for_crawler(crawler):
        def fetch(urls: list[str]) -> list[list[dict]]:
            out = []
            for u in urls:
                pg = page(u, cfg)
                try:
                    root = ET.fromstring(pg["html"]) if pg["html"] else None
                except ET.ParseError:
                    root = None
                if root is None:
                    out.append([])
                    continue
                if crawler.is_multi_data == "List":
                    out.append(extract_list_records(root, crawler))
                else:
                    rec = {}
                    for ci in crawler.crawl_items:
                        vals = xpath_lite_text(root, ci.xpath)
                        rec[ci.name] = vals[0] if vals else None
                    out.append([rec])
            return out

        return fetch

    return for_crawler
