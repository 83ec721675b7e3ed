"""One-off profiler: time each Spark action inside a crawl round by
monkey-wrapping SnapshotTable commits and DataFrame actions. Usage:
    python tools/profile_crawl.py [n_hosts] [rounds]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from etlpy_spark.session import get_spark


def main() -> None:
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from etlpy_spark.crawl import frontier as fr
    from etlpy_spark.crawl.frontier import CrawlConfig, SparkCrawler
    from etlpy_spark.sources import catalog
    from etlpy_spark.sources.synthetic_web import WebConfig, seed_urls

    spark = get_spark(app_name="profile-crawl", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # wrap the slow suspects
    timings: list[tuple[str, float]] = []

    def wrap(obj, name, label=None):
        orig = getattr(obj, name)

        def timed(*a, **k):
            t0 = time.time()
            out = orig(*a, **k)
            timings.append((label or name, time.time() - t0))
            return out

        setattr(obj, name, timed)

    wrap(catalog.SnapshotTable, "_commit", "table_commit")

    web = WebConfig(
        n_hosts=n_hosts, n_cats=6, pages_per_cat=400, politeness_budget=16,
        max_links=4, max_images=2, skew_host0=8, image_universe=200_000,
    )
    seeds = seed_urls(web, n_per_host=6)
    wd = tempfile.mkdtemp(prefix="prof_crawl_")
    cr = SparkCrawler(spark, wd, CrawlConfig(web=web, n_shards=16, n_buckets=32))

    t0 = time.time()
    cr.init_from_seeds(seeds)
    print(f"init_from_seeds: {time.time()-t0:.2f}s ({len(seeds)} seeds)")

    # instrument run_round manually by timing the big actions via listener
    for r in range(rounds):
        t0 = time.time()
        m = cr.run_round()
        print(f"round {r}: {time.time()-t0:.2f}s  {m}")

    print("\ncommit timings:")
    for label, dt in timings:
        print(f"  {label}: {dt:.2f}s")


if __name__ == "__main__":
    main()
