"""Priority aging (starvation protection): deferred URLs gain effective
priority each round — deterministic, so the distributed engine must
still reproduce the serial oracle exactly with aging enabled; and the
feature must actually change the schedule vs aging=0 (i.e. it binds)."""

from __future__ import annotations

import shutil
import tempfile

from etlpy_spark.crawl.frontier import CrawlConfig, SparkCrawler
from etlpy_spark.crawl.oracle import crawl_oracle
from etlpy_spark.sources.synthetic_web import WebConfig, seed_urls

WEB = WebConfig(n_hosts=5, n_cats=3, pages_per_cat=10, politeness_budget=1,
                skew_host0=4)
ROUNDS = 4
AGING = 25


def test_aging_parity_and_effect(spark):
    seeds = seed_urls(WEB, n_per_host=2)
    aged = crawl_oracle(seeds, WEB, max_rounds=ROUNDS, priority_aging=AGING)
    flat = crawl_oracle(seeds, WEB, max_rounds=ROUNDS)
    # the knob binds: with budget 1 and a deep backlog, aging reorders
    assert aged.crawl_log != flat.crawl_log
    assert {u for _, u in aged.crawl_log} != {u for _, u in flat.crawl_log} or (
        aged.crawl_log != flat.crawl_log
    )

    wd = tempfile.mkdtemp(prefix="crawl_aging_")
    try:
        cr = SparkCrawler(
            spark, wd, CrawlConfig(web=WEB, priority_aging=AGING)
        )
        cr.run(seeds, max_rounds=ROUNDS)
        assert cr.crawl_log_list() == aged.crawl_log
        assert cr.seen_urls_list() == set(aged.seen)
    finally:
        shutil.rmtree(wd, ignore_errors=True)
