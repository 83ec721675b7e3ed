"""Round-2 feature tests: repeating-root List-mode extraction
(GetMaxCompareXPath / RootXPath, reference spider.py:38-49,228-261),
EtlTF with dropped parent columns, DbEX InsertOrUpdate routing, and the
explicit parallel_map/parallel_reduce split (reference etl.py:919-935)."""

from __future__ import annotations

import os
import tempfile
import xml.etree.ElementTree as ET

from pyspark.sql import functions as F

from etlpy_spark.functions.expr import get_max_compare_xpath, xpath_lite_doc
from etlpy_spark.plans.compiler import CompileContext, compile_module, compile_stages, finalize
from etlpy_spark.plans.spec import CrawlerSpec, CrawlItem, EtlModule, ProjectSpec, Stage
from etlpy_spark.sources.synthetic_web import extract_list_records


# ---------------------------------------------------------------------------
# GetMaxCompareXPath — differential vs the reference's own function


def _ref_gmc(reference, xpaths):
    import spider

    items = [spider.CrawItem(name=f"c{i}", xpath=x) for i, x in enumerate(xpaths)]
    return spider.GetMaxCompareXPath(items)


def test_get_max_compare_xpath_differential(reference):
    import sys

    sys.path.insert(0, "/root/reference") if "/root/reference" not in sys.path else None
    cases = [
        ["/html/body/div[1]/a/@title", "/html/body/div[2]/span"],
        ["/html/body/ul/li[1]/a", "/html/body/ul/li[2]/b", "/html/body/ul/li[3]/i"],
        ["//div/a/@href", "//div/img/@src"],
        ["/a/b/c", "/a/b/d", "/a/x/y"],
    ]
    for xs in cases:
        assert get_max_compare_xpath(xs) == _ref_gmc(reference, xs), xs


def test_get_max_compare_xpath_single_item_none():
    assert get_max_compare_xpath(["//a/@href"]) is None
    assert get_max_compare_xpath([]) is None


# ---------------------------------------------------------------------------
# List-mode extraction with an optional missing field per container


_HTML = (
    "<html><body>"
    "<ul>"
    '<li><a href="u1">Alpha</a><span>p1</span></li>'
    '<li><a href="u2">Beta</a></li>'  # price missing in item 2
    '<li><a href="u3">Gamma</a><span>p3</span></li>'
    "</ul>"
    "</body></html>"
)


def test_list_mode_root_alignment_inferred():
    """Positional zip would mis-assign p3 to item 2; root-based extraction
    keeps fields aligned per container instance."""
    crawler = CrawlerSpec(
        name="c",
        is_multi_data="List",
        crawl_items=[
            CrawlItem(name="title", xpath="/html/body/ul/li[1]/a"),
            CrawlItem(name="price", xpath="/html/body/ul/li[2]/span"),
        ],
    )
    root = ET.fromstring(_HTML)
    recs = extract_list_records(root, crawler)
    assert recs == [
        {"title": "Alpha", "price": "p1"},
        {"title": "Beta", "price": None},
        {"title": "Gamma", "price": "p3"},
    ]


def test_list_mode_root_alignment_explicit():
    crawler = CrawlerSpec(
        name="c",
        is_multi_data="List",
        root_xpath="//li",
        crawl_items=[
            CrawlItem(name="title", xpath="/a"),
            CrawlItem(name="price", xpath="/span"),
        ],
    )
    root = ET.fromstring(_HTML)
    recs = extract_list_records(root, crawler)
    assert [r["title"] for r in recs] == ["Alpha", "Beta", "Gamma"]
    assert [r["price"] for r in recs] == ["p1", None, "p3"]


def test_xpath_lite_doc_absolute_first_step():
    root = ET.fromstring(_HTML)
    lis = xpath_lite_doc(root, "/html/body/ul/li")
    assert len(lis) == 3
    assert xpath_lite_doc(root, "/html") == [root]


# ---------------------------------------------------------------------------
# EtlTF: sub-pipeline drops/overwrites a kept parent column


def test_etl_tf_parent_column_dropped(spark):
    proj = ProjectSpec()
    proj.modules["sub"] = EtlModule(
        name="sub",
        stages=[
            Stage("RenameTF", {"Column": "n", "NewColumn": "m"}),  # drops n
            Stage("PythonTF", {"Column": "m", "Script": "m*10", "NewColumn": "big"}),
        ],
    )
    proj.modules["main"] = EtlModule(
        name="main",
        stages=[
            Stage("RangeGE", {"MinValue": 1, "MaxValue": 4, "Interval": 1, "Column": "n", "MergeType": "Append"}),
            Stage("EtlTF", {"ETLSelector": "sub", "NewColumn": "n"}),
        ],
    )
    ctx = CompileContext(spark=spark, project=proj, parallelism=2)
    out = finalize(compile_module(ctx, "main"), ordered=True)
    rows = [r.asDict() for r in out.collect()]
    # parent n restored from the PARENT row (MergeQuery semantics)
    assert [r["n"] for r in rows] == [1, 2, 3]
    assert [r["big"] for r in rows] == [10, 20, 30]


# ---------------------------------------------------------------------------
# DbEX InsertOrUpdate → SnapshotTable.merge_upsert


def test_dbex_insert_or_update(spark):
    from etlpy_spark.sources.catalog import SnapshotTable

    wd = tempfile.mkdtemp(prefix="dbex_upsert_")
    path = os.path.join(wd, "items_tbl")
    ctx = CompileContext(spark=spark, parallelism=2, files_root=wd)
    ctx.execute = True

    def write(rows):
        df = spark.createDataFrame(rows, "k int, v string")
        df = df.withColumn("__ord__", F.array(F.col("k").cast("long")))
        st = Stage("DbEX", {"TableName": path, "ExecuteType": "InsertOrUpdate", "Key": "k"})
        out = compile_stages(ctx, [st], df)
        for _, sink in ctx.sinks:
            sink(finalize(out))
        ctx.sinks.clear()

    write([(1, "a"), (2, "b")])
    write([(2, "B2"), (3, "c")])  # k=2 updated, k=3 inserted
    got = {r.k: r.v for r in SnapshotTable(spark, path).read().collect()}
    assert got == {1: "a", 2: "B2", 3: "c"}


# ---------------------------------------------------------------------------
# parallel_map / parallel_reduce


def test_parallel_map_reduce_split(spark):
    from etlpy_spark.plans.parallel import parallel_execute, parallel_map, split_at_tolist

    stages = [
        Stage("RangeGE", {"MinValue": 1, "MaxValue": 9, "Interval": 1, "Column": "seed", "MergeType": "Append"}),
        Stage("ToListTF", {}),
        Stage("PythonTF", {"Column": "seed", "Script": "seed*seed", "NewColumn": "sq"}),
    ]
    prefix, suffix = split_at_tolist(stages)
    assert [s.type for s in prefix] == ["RangeGE"]
    assert [s.type for s in suffix] == ["PythonTF"]

    ctx = CompileContext(spark=spark, parallelism=4)
    seeds = finalize(parallel_map(ctx, stages))
    assert seeds.count() == 8
    out = finalize(parallel_execute(ctx, stages, partitions=4))
    got = sorted((r.seed, r.sq) for r in out.collect())
    assert got == [(i, i * i) for i in range(1, 9)]


def test_parallel_no_tolist_first_stage_is_map(spark):
    from etlpy_spark.plans.parallel import split_at_tolist

    stages = [
        Stage("RangeGE", {"MinValue": 1, "MaxValue": 4, "Interval": 1, "Column": "n", "MergeType": "Append"}),
        Stage("PythonTF", {"Column": "n", "Script": "n+1", "NewColumn": "m"}),
    ]
    prefix, suffix = split_at_tolist(stages)
    assert len(prefix) == 1 and [s.type for s in suffix] == ["PythonTF"]


# ---------------------------------------------------------------------------
# fetch-stage parse: parse_page(page(u)["html"]) must reproduce page(u)'s
# own lists EXACTLY (the BfsGE fetch extracts from parsed markup like the
# reference spider; the serial oracle keeps reading the generator's lists,
# so this round-trip identity is what keeps crawl parity bitwise intact)


def test_parse_page_matches_generator():
    from etlpy_spark.sources.synthetic_web import (
        WebConfig, make_url, page, parse_page, seed_urls,
    )

    for cfg in (
        WebConfig(n_hosts=40, n_cats=4, pages_per_cat=200, max_links=4,
                  max_images=3, image_universe=10_000),
        WebConfig(n_hosts=5, n_cats=2, pages_per_cat=20, max_links=2,
                  max_images=8, image_universe=100),
    ):
        urls = [make_url(k % cfg.n_hosts, k % cfg.n_cats,
                         (k * 17) % cfg.pages_per_cat + 1) for k in range(1500)]
        for u in urls:
            pg = page(u, cfg)
            parsed = parse_page(pg["html"])
            assert parsed["links"] == pg["links"], u
            assert parsed["image_ids"] == pg["image_ids"], u
            assert parsed["captions"] == pg["captions"], u
    # 404 / empty page
    assert parse_page("") == {"links": [], "image_ids": [], "captions": []}
    dead = page("http://nosuch", WebConfig(n_hosts=3))
    assert parse_page(dead["html"]) == {"links": [], "image_ids": [], "captions": []}
