"""Single-threaded reference-semantics crawler — the parity oracle.

This is the executable specification of the crawl rule (north_rule: "matching
the reference's crawl ordering and URL-seen set under the same seed list +
politeness budget"). It implements exactly the semantics the reference
engine sketches:

  - seeds are dispatched in list order (reference distributed.py:60-66);
  - the URL-seen set is keep-first over the discovery stream (reference
    RepeatFT, etl.py:238-247; CrawlerTF's fetch memo, etl.py:454-464);
  - BFS frontier expansion (reference BfsGE intent, etl.py:658-659);
  - politeness budget per host per round (the reference's inert
    DelayTime=200ms, project.xml:9; etl.py:679-680) — URLs over budget are
    *deferred*, not dropped;
  - robots gating (absent in the reference; required by the north_rule).

THE CRAWL RULE (shared by this oracle and crawl/frontier.py):
  round r:
    1. candidates = frontier
    2. robots-blocked candidates are removed (counted, never fetched)
    3. per host, order by (priority, discovered_seq); the first
       host_round_budget(host) fetch this round (K, scaled down by the
       host's robots Crawl-delay), the rest defer to round r+1
    4. global fetch order = selected sorted by (priority, discovered_seq);
       fetch_seq continues across rounds
    5. pages are processed in fetch order; out-links in page order; a
       canonicalized link not in seen gets the next discovered_seq and
       enters the next frontier with priority = h64('prio|'+url) % 100
    6. image refs in (fetch order, page order); first reference wins;
       bytes fetched, decoded, pHashed, merged into the image table
    7. next frontier = deferred ∪ newly discovered
  stop after max_rounds or when the frontier empties.

All order is a pure function of (priority, discovered_seq); both are unique
per URL, so the order is total and the distributed engine can reproduce it
exactly (SURVEY.md §7 hard part #1).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from etlpy_spark.functions.imagecodec import (
    decode_or_error,
    image_spec,
    phash64,
    sniff_format,
)
from etlpy_spark.functions.url import canonicalize_url
from etlpy_spark.sources.synthetic_web import (
    WebConfig,
    fetch_image,
    host_round_budget,
    page,
    parse_url,
    robots_allowed,
)


def url_host_of(url: str) -> str:
    p = parse_url(url)
    return f"host{p[0]}.example" if p else ""


@dataclass
class OracleResult:
    crawl_log: list[tuple[int, str]] = field(default_factory=list)  # (fetch_seq, url)
    seen: dict[str, int] = field(default_factory=dict)  # url -> discovered_seq
    images: dict[str, dict] = field(default_factory=dict)  # image_id -> row
    metrics: list[dict] = field(default_factory=list)  # per round
    rounds_run: int = 0


def crawl_oracle(
    seeds: list[str], cfg: WebConfig, max_rounds: int = 3,
    priority_aging: int = 0,
) -> OracleResult:
    """``priority_aging`` > 0 enables starvation protection: a URL
    deferred for ``a`` rounds competes with effective priority
    ``max(0, priority - priority_aging*a)`` (lower = sooner), so a hot
    host's long backlog cannot starve low-priority pages forever. The
    effective priority is a pure function of (priority, entry_round,
    current_round) — still deterministic, still exactly reproducible by
    the distributed engine."""
    res = OracleResult()
    # ingest seeds: canonicalize in order, keep-first
    frontier: list[tuple[str, int, int, int]] = []  # (url, prio, seq, entry_round)
    seq = 0
    for s in seeds:
        canon = canonicalize_url(s)
        if canon is None or canon in res.seen:
            continue
        res.seen[canon] = seq
        frontier.append((canon, cfg.priority(canon), seq, 0))
        seq += 1
    fetch_seq = 0

    for r in range(max_rounds):
        if not frontier:
            break
        res.rounds_run = r + 1

        def eff(f):
            return (max(0, f[1] - priority_aging * (r - f[3]))
                    if priority_aging > 0 else f[1])

        allowed = [f for f in frontier if robots_allowed(f[0], cfg)]
        blocked = len(frontier) - len(allowed)
        # politeness: first K per host by (effective priority, discovered_seq)
        by_host: dict[str, list] = {}
        for f in sorted(allowed, key=lambda f: (eff(f), f[2])):
            by_host.setdefault(url_host_of(f[0]), []).append(f)
        selected, deferred = [], []
        for host, items in by_host.items():
            k = host_round_budget(host, cfg)
            selected.extend(items[:k])
            deferred.extend(items[k:])
        selected.sort(key=lambda f: (eff(f), f[2]))

        new_frontier: list[tuple[str, int, int, int]] = []
        new_images = 0
        for url, prio, dseq, _er in selected:
            res.crawl_log.append((fetch_seq, url))
            fetch_seq += 1
            pg = page(url, cfg)
            for link in pg["links"]:
                canon = canonicalize_url(link)
                if canon is None or canon in res.seen:
                    continue
                res.seen[canon] = seq
                new_frontier.append((canon, cfg.priority(canon), seq, r + 1))
                seq += 1
            for image_id, caption in zip(pg["image_ids"], pg["captions"]):
                if image_id in res.images:
                    continue
                data = fetch_image(image_id, cfg)
                # same skip-with-reason rule as the distributed path:
                # undecodable blobs become decode_error rows (dims/phash
                # need pixels; fmt falls back to the magic-byte sniff)
                px, err = decode_or_error(data)
                if err is None:
                    w, h, fmt = image_spec(image_id, cfg.seed, cfg.dim_scale, cfg.force_fmt)
                    ph = phash64(px)
                else:
                    w = h = ph = None
                    fmt = sniff_format(data)
                res.images[image_id] = {
                    "image_id": image_id,
                    "bytes": data,
                    "w": w,
                    "h": h,
                    "fmt": fmt,
                    "caption": caption,
                    "phash": ph,
                    "decode_error": err,
                }
                new_images += 1
        res.metrics.append(
            {
                "round": r,
                "scheduled": len(frontier),
                "robots_blocked": blocked,
                "fetched": len(selected),
                "deferred": len(deferred),
                "new_urls": len(new_frontier),
                "new_images": new_images,
            }
        )
        frontier = deferred + new_frontier
    return res
