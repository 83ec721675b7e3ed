"""End of the crawl→corpus loop: curate_images over a real crawl's images
table (operators/multimodal.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from etlpy_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def crawl_images(spark, tmp_path_factory):
    from etlpy_spark.crawl.frontier import CrawlConfig, SparkCrawler
    from etlpy_spark.sources.synthetic_web import WebConfig, seed_urls

    web = WebConfig(n_hosts=8, n_cats=3, pages_per_cat=30, politeness_budget=8,
                    max_links=3, max_images=2, skew_host0=2, image_universe=4000,
                    unsupported_every=9)
    wd = str(tmp_path_factory.mktemp("curate_crawl"))
    cr = SparkCrawler(spark, wd, CrawlConfig(web=web, n_shards=4, n_buckets=4,
                                             write_metrics=False))
    cr.run(seed_urls(web, n_per_host=2), max_rounds=2)
    return cr.images.read()


class TestCurateImages:
    def test_loop_closes_and_gates_hold(self, spark, crawl_images):
        total = crawl_images.count()
        assert total > 20
        curated = mm.curate_images(crawl_images, min_dim=48)
        rows = curated.collect()
        assert 0 < len(rows) < total  # something survived AND something was cut
        for r in rows:
            assert r["decode_error"] is None
            assert r["caption"]
            assert min(r["w"], r["h"]) >= 48
            assert r["entropy"] >= 1.0 and r["blur_var"] >= 4.0
            assert r["bytes"] is not None and r["phash"] is not None

    def test_rejections_are_the_right_rows(self, spark, crawl_images):
        curated_ids = {r["image_id"] for r in
                       mm.curate_images(crawl_images, min_dim=48)
                       .select("image_id").collect()}
        # every decode_error row and every sub-48px row must be out
        bad = crawl_images.filter(
            F.col("decode_error").isNotNull()
            | (F.least(F.col("w"), F.col("h")) < 48)
        )
        for r in bad.select("image_id").collect():
            assert r["image_id"] not in curated_ids

    def test_quality_columns_match_serial_kernels(self, spark, crawl_images):
        from etlpy_spark.functions.imagecodec import decode
        from etlpy_spark.functions.imagequality import quality_features

        sample = mm.curate_images(crawl_images, min_dim=48).limit(5).collect()
        assert sample
        for r in sample:
            q = quality_features(decode(bytes(r["bytes"])))
            for k, v in q.items():
                assert r[k] == v, (r["image_id"], k)

    def test_udf_stage_not_single_task(self, spark, crawl_images):
        """The AQE byte-coalesce trap: when the scan is narrow (one
        task), the compute-heavy quality stage must be explicitly spread
        to session parallelism (user repartitions are AQE-exempt); when
        the scan is already wide no extra shuffle is added."""
        narrow = crawl_images.coalesce(1)
        plan = mm.curate_images(narrow, min_dim=48)._jdf.queryExecution().toString()
        assert "RoundRobinPartitioning" in plan or "Repartition" in plan
        wide = crawl_images.repartition(
            spark.sparkContext.defaultParallelism * 2, "image_id")
        plan_wide = mm.curate_images(wide, min_dim=48)._jdf.queryExecution().toString()
        assert "RoundRobinPartitioning" not in plan_wide
