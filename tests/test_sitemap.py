"""sources/sitemap.py — sitemap/robots seed discovery."""

import gzip

from etlpy_spark.sources.sitemap import (
    parse_sitemap,
    robots_sitemaps,
    sitemap_entries,
    sitemap_seed_list,
)

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def _urlset(urls, ns=NS) -> bytes:
    rows = "".join(
        f"<url><loc>{u}</loc><lastmod>2026-0{i % 9 + 1}-01</lastmod>"
        f"<changefreq>daily</changefreq><priority>0.{i % 10}</priority></url>"
        for i, u in enumerate(urls)
    )
    return f'<?xml version="1.0"?><urlset {ns}>{rows}</urlset>'.encode()


def _index(maps, ns=NS) -> bytes:
    rows = "".join(f"<sitemap><loc>{m}</loc></sitemap>" for m in maps)
    return f'<?xml version="1.0"?><sitemapindex {ns}>{rows}</sitemapindex>'.encode()


def test_parse_urlset_with_namespace_and_fields():
    urls = [f"http://h.example/p{i}" for i in range(5)]
    out = parse_sitemap(_urlset(urls))
    assert [e["loc"] for e in out] == urls
    assert all(e["kind"] == "url" for e in out)
    assert out[0]["lastmod"] == "2026-01-01"
    assert out[3]["priority"] == 0.3
    assert out[0]["changefreq"] == "daily"


def test_parse_index_gzip_and_no_namespace():
    maps = ["http://h.example/sm1.xml", "http://h.example/sm2.xml.gz"]
    for blob in (_index(maps), gzip.compress(_index(maps, ns="")),):
        out = parse_sitemap(blob)
        assert [e["loc"] for e in out] == maps
        assert all(e["kind"] == "sitemap" for e in out)


def test_parse_text_sitemap_and_hostile_bytes():
    text = b"http://h.example/a\n\nnot a url line\nhttps://h.example/b \n"
    out = parse_sitemap(text)
    assert [e["loc"] for e in out] == ["http://h.example/a", "https://h.example/b"]
    assert parse_sitemap(b"") == []
    assert parse_sitemap(b"\x00\xff garbage bytes") == []
    assert parse_sitemap(gzip.compress(b"")) == []
    # truncated gzip degrades to the raw bytes, which parse to nothing
    assert parse_sitemap(gzip.compress(_urlset(["http://x/1"]))[:10]) == []


def test_malformed_xml_regex_recovery():
    # unclosed tags: ElementTree refuses, the <loc> scan recovers
    broken = (b'<?xml version="1.0"?><urlset><url><loc>http://h/p1</loc>'
              b"<url><loc>http://h/p2</loc></url>")
    out = parse_sitemap(broken)
    assert [e["loc"] for e in out] == ["http://h/p1", "http://h/p2"]
    assert all(e["kind"] == "url" for e in out)
    broken_idx = b"<sitemapindex><sitemap><loc>http://h/sm.xml</loc>"
    assert parse_sitemap(broken_idx)[0]["kind"] == "sitemap"


def test_robots_sitemap_lines():
    robots = ("User-agent: *\nDisallow: /private\n"
              "Sitemap: http://h.example/sitemap.xml\n"
              "sitemap:http://h.example/extra.xml.gz\n")
    assert robots_sitemaps(robots) == [
        "http://h.example/sitemap.xml", "http://h.example/extra.xml.gz"]
    assert robots_sitemaps("User-agent: *\nAllow: /") == []


def test_seed_list_breadth_first_dedup_and_cycles():
    web = {
        "http://h/idx.xml": _index(["http://h/a.xml", "http://h/b.xml",
                                    "http://h/idx.xml"]),  # self-cycle
        "http://h/a.xml": _urlset(["http://h/p1", "http://h/p2"]),
        "http://h/b.xml": gzip.compress(
            _urlset(["http://h/p2", "http://h/p3"])),  # p2 duplicated
    }
    seeds = sitemap_seed_list(web.get, ["http://h/idx.xml"])
    assert seeds == ["http://h/p1", "http://h/p2", "http://h/p3"]
    # depth cap: an index chain deeper than max_depth stops cleanly
    chain = {f"http://h/l{i}.xml": _index([f"http://h/l{i + 1}.xml"])
             for i in range(10)}
    assert sitemap_seed_list(chain.get, ["http://h/l0.xml"], max_depth=2) == []
    # budget cap: a hostile wide tree stops at max_sitemaps fetches
    wide = {"http://h/root.xml": _index([f"http://h/c{i}.xml" for i in range(100)])}
    for i in range(100):
        wide[f"http://h/c{i}.xml"] = _urlset([f"http://h/w{i}"])
    got = sitemap_seed_list(wide.get, ["http://h/root.xml"], max_sitemaps=11)
    assert len(got) == 10  # root + 10 children fetched


def test_sitemap_entries_distributed(spark):
    import pandas as pd

    blobs = pd.DataFrame({
        "url": ["http://h/idx.xml", "http://h/a.xml"],
        "bytes": [_index(["http://h/a.xml"]),
                  _urlset(["http://h/p1", "http://h/p2"])],
    })
    df = spark.createDataFrame(blobs)
    rows = sitemap_entries(spark, df).orderBy("loc").collect()
    assert [(r.loc, r.kind) for r in rows] == [
        ("http://h/a.xml", "sitemap"),
        ("http://h/p1", "url"), ("http://h/p2", "url")]
    assert rows[1].priority == 0.0 and rows[2].priority == 0.1
    assert rows[0].source == "http://h/idx.xml"


def test_seed_list_feeds_the_crawler(spark, tmp_path):
    """Sitemap-discovered seeds drive a real crawl round: same engine
    path as list seeds, dispatch order = sitemap document order."""
    from etlpy_spark.crawl.frontier import CrawlConfig, SparkCrawler
    from etlpy_spark.sources.synthetic_web import WebConfig, make_url

    web_cfg = WebConfig(n_hosts=4, n_cats=2, pages_per_cat=6,
                        politeness_budget=4, max_links=3, max_images=1)
    urls = [make_url(h, c, 1) for h in range(4) for c in range(2)]
    site = {
        "http://h/root.xml": _index(["http://h/child.xml"]),
        "http://h/child.xml": _urlset(urls),
    }
    seeds = sitemap_seed_list(site.get, robots_sitemaps(
        "User-agent: *\nSitemap: http://h/root.xml\n"))
    assert seeds == urls
    crawler = SparkCrawler(spark, str(tmp_path / "wd"),
                           CrawlConfig(web=web_cfg, n_buckets=4))
    logs = crawler.run(seeds, max_rounds=1)
    assert logs and logs[0]["fetched"] > 0
