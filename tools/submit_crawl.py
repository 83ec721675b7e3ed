"""Production crawl entrypoint for spark-submit (north_rule: "submitted
via spark-submit --py-files to multi-executor clusters at N and 4N
executors").

Package the library and submit; the session comes from spark-submit's
master/executor settings (no master override here):

    cd /root/repo && zip -r /tmp/etlpy_spark.zip etlpy_spark
    spark-submit \
      --py-files /tmp/etlpy_spark.zip \
      --num-executors 250 --executor-cores 4 --executor-memory 16g \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.shuffle.partitions=2000 \
      tools/submit_crawl.py \
        --workdir /mnt/shared/crawl/run1 --seeds-file seeds.txt \
        --rounds 10 --shards 1024 --buckets 2000

``--workdir`` must be a LOCAL or SHARED-FILESYSTEM mount visible to the
driver (NFS/Lustre/fuse mount): the snapshot catalog writes manifests
with local file I/O. hdfs:///s3a:// URIs are rejected by SnapshotTable —
object-store backends need the manifest I/O routed through one FS API
(or a real Iceberg catalog, which the table API maps onto 1:1).

Resume: rerun the same command — the snapshot tables ARE the state
(a crashed round re-runs from its last committed snapshot; generalizes
the reference master's ``skip=`` resume, distributed.py:42,62-63).

In-sandbox the same file runs under plain ``python`` on local[N]; the
synthetic web stands in for HTTP fetch either way.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

try:  # normal production path: the --py-files zip (or PYTHONPATH) has it
    import etlpy_spark  # noqa: F401
except ImportError:  # in-sandbox convenience: plain `python tools/submit_crawl.py`
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--seeds-file", default=None, help="one URL per line; omit to resume")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--shards", type=int, default=16, help="seen-set shards")
    ap.add_argument("--buckets", type=int, default=0, help="politeness fetch buckets (0 = shuffle partitions)")
    ap.add_argument("--hosts", type=int, default=48, help="synthetic web size")
    ap.add_argument("--budget", type=int, default=16, help="politeness budget per host per round")
    ap.add_argument("--verify-oracle", action="store_true",
                    help="after the run, replay the serial reference-semantics "
                         "oracle on the driver and assert crawl-order + "
                         "URL-seen-set + image-row parity (synthetic web, "
                         "fresh runs only)")
    ap.add_argument("--master", default=None,
                    help="standalone-python convenience (e.g. local[4,2] to "
                         "run with task retries); under spark-submit leave "
                         "unset — the session carries the cluster config")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from etlpy_spark.crawl.frontier import CrawlConfig, SparkCrawler
    from etlpy_spark.sources.synthetic_web import WebConfig

    # under spark-submit the session already carries the cluster config;
    # standalone python gets sane local defaults from getOrCreate()
    b = SparkSession.builder.appName("etlpy-spark-crawl")
    if args.master:
        b = b.master(args.master)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    buckets = args.buckets or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    web = WebConfig(n_hosts=args.hosts, politeness_budget=args.budget)
    cfg = CrawlConfig(web=web, n_shards=args.shards, n_buckets=buckets)
    cr = SparkCrawler(spark, args.workdir, cfg)

    seeds = None
    if args.seeds_file:
        with open(args.seeds_file) as f:
            seeds = [line.strip() for line in f if line.strip()]
    metrics = cr.run(seeds, max_rounds=args.rounds)
    for m in metrics:
        print(json.dumps(m))

    if args.verify_oracle:
        if seeds is None:
            raise SystemExit("--verify-oracle needs --seeds-file (fresh run)")
        from etlpy_spark.crawl.oracle import crawl_oracle

        orc = crawl_oracle(seeds, web, max_rounds=args.rounds,
                           priority_aging=cfg.priority_aging)
        if cr.crawl_log_list() != orc.crawl_log:
            raise SystemExit("PARITY FAILED: crawl order diverges from serial oracle")
        if cr.seen_urls_list() != set(orc.seen):
            raise SystemExit("PARITY FAILED: URL-seen set diverges from serial oracle")
        got_imgs = [
            (r.image_id, r.caption, r.phash)
            for r in cr.images.read().select("image_id", "caption", "phash").collect()
        ]
        exp_imgs = {
            (i["image_id"], i["caption"], i["phash"]) for i in orc.images.values()
        }
        if len(got_imgs) != len(exp_imgs) or set(got_imgs) != exp_imgs:
            raise SystemExit(
                f"PARITY FAILED: image rows diverge from serial oracle "
                f"({len(got_imgs)} rows vs {len(exp_imgs)} expected distinct)"
            )
        print(f"PARITY OK: crawl order ({len(orc.crawl_log)} fetches), "
              f"seen set ({len(orc.seen)} URLs) and image rows "
              f"({len(exp_imgs)}) match the serial oracle")


if __name__ == "__main__":
    main()
