"""functions/robots.py — RFC 9309 parsing, differentially pinned against
the synthetic web's injected rule functions."""

from hypothesis import given, settings
from hypothesis import strategies as st

from etlpy_spark.functions.robots import parse_robots


def test_group_selection_most_specific_wins():
    txt = """
User-agent: *
Disallow: /all/

User-agent: examplebot
Disallow: /ex/

User-agent: examplebot-news
Disallow: /news/
"""
    assert not parse_robots(txt, "ExampleBot/1.2").allowed("/ex/x")
    assert parse_robots(txt, "ExampleBot/1.2").allowed("/all/x")
    p = parse_robots(txt, "examplebot-news")
    assert not p.allowed("/news/x") and p.allowed("/ex/x")
    p = parse_robots(txt, "otherbot")
    assert not p.allowed("/all/x") and p.allowed("/ex/x")


def test_groups_merge_and_shared_agent_lines():
    txt = """
User-agent: a
User-agent: b
Disallow: /one/

User-agent: a
Disallow: /two/
Crawl-delay: 3
"""
    pa = parse_robots(txt, "a")
    assert not pa.allowed("/one/x") and not pa.allowed("/two/x")
    assert pa.crawl_delay == 3.0
    pb = parse_robots(txt, "b")
    assert not pb.allowed("/one/x") and pb.allowed("/two/x")
    assert pb.crawl_delay == 0.0


def test_longest_match_and_allow_tiebreak():
    txt = """
User-agent: *
Disallow: /p
Allow: /page
Disallow: /page/private
"""
    p = parse_robots(txt)
    assert not p.allowed("/px")            # /p matches
    assert p.allowed("/page.html")         # Allow /page longer than /p
    assert not p.allowed("/page/private/x")
    # RFC 9309 tie: equal length -> Allow wins
    tie = parse_robots("User-agent: *\nDisallow: /dir\nAllow: /dir\n")
    assert tie.allowed("/dir/x")


def test_wildcards_and_end_anchor():
    txt = """
User-agent: *
Disallow: /*.php$
Disallow: /tmp/*/cache
Allow: /tmp/ok/cache
"""
    p = parse_robots(txt)
    assert not p.allowed("/index.php")
    assert p.allowed("/index.php?x=1")     # $ anchors the end
    assert p.allowed("/index.phpx")
    assert not p.allowed("/tmp/a/cache")
    assert not p.allowed("/tmp/a/b/cache") # * spans segments
    assert p.allowed("/tmp/ok/cache")      # longer Allow wins


def test_empty_disallow_comments_case_and_garbage():
    txt = """
# global group
USER-AGENT: *   # comment after value
DISALLOW:
Crawl-Delay: 1.5
not a directive at all
Disallow /missing-colon
Sitemap: http://h.example/sm.xml
"""
    p = parse_robots(txt, "anybot")
    assert p.allowed("/anything")          # empty Disallow matches nothing
    assert p.crawl_delay == 1.5
    assert p.sitemaps == ["http://h.example/sm.xml"]
    # empty / whitespace robots.txt allows everything
    assert parse_robots("").allowed("/x")
    assert parse_robots("\n\n  \n").allowed("/x")


def test_sitemaps_are_host_wide():
    txt = """
Sitemap: http://h/a.xml
User-agent: specialbot
Disallow: /x/
Sitemap: http://h/b.xml
"""
    for ua in ("specialbot", "otherbot"):
        assert parse_robots(txt, ua).sitemaps == ["http://h/a.xml", "http://h/b.xml"]


def test_disallow_prefixes_roundtrip_and_refusal():
    import pytest

    p = parse_robots("User-agent: *\nDisallow: /a/\nDisallow: /b/\n")
    assert p.disallow_prefixes() == ["/a/", "/b/"]
    with pytest.raises(ValueError):
        parse_robots("User-agent: *\nAllow: /a/\n").disallow_prefixes()
    with pytest.raises(ValueError):
        parse_robots("User-agent: *\nDisallow: /*.php\n").disallow_prefixes()


def test_differential_vs_synthetic_rule_functions():
    """parse_robots(robots_txt(host)) reproduces the engine's injected
    rule functions exactly — every host shape, every page path."""
    from etlpy_spark.sources.synthetic_web import (
        WebConfig, make_url, parse_url, robots_allowed, robots_crawl_delay,
        robots_disallow, robots_txt,
    )

    cfg = WebConfig(n_hosts=40, n_cats=4, pages_per_cat=5)
    for k in range(cfg.n_hosts):
        host = f"host{k}.example"
        pol = parse_robots(robots_txt(host, cfg), "etlpy-spark")
        assert pol.crawl_delay == robots_crawl_delay(host, cfg)
        assert pol.disallow_prefixes() == robots_disallow(host, cfg)
        assert pol.sitemaps == [f"http://{host}/sitemap.xml"]
        for c in range(cfg.n_cats):
            for n in range(1, cfg.pages_per_cat + 1):
                url = make_url(k, c, n)
                _, cc, nn = parse_url(url)
                assert pol.allowed(f"/cat{cc}/p{nn}") == robots_allowed(url, cfg), url


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=400), st.text(max_size=20), st.text(max_size=60))
def test_parser_total_on_hostile_text(txt, ua, path):
    pol = parse_robots(txt, ua)
    assert isinstance(pol.allowed(path), bool)
    assert pol.crawl_delay >= 0.0


def test_crawl_parity_text_parsed_robots(spark, tmp_path):
    """cfg.robots_from_text: the RFC 9309 parser feeds the engine's robots
    table — crawl rows must be BITWISE identical to rule-function mode."""
    from etlpy_spark.crawl.frontier import CrawlConfig, SparkCrawler
    from etlpy_spark.sources.synthetic_web import WebConfig, seed_urls

    web = WebConfig(n_hosts=22, n_cats=3, pages_per_cat=8,
                    politeness_budget=5, max_links=3, max_images=1)
    seeds = seed_urls(web, n_per_host=2)
    logs = {}
    seen = {}
    for mode in (False, True):
        wd = str(tmp_path / f"wd-{mode}")
        cr = SparkCrawler(spark, wd, CrawlConfig(
            web=web, n_buckets=4, robots_from_text=mode))
        logs[mode] = cr.run(seeds, max_rounds=2)
        seen[mode] = sorted(
            (r.url, r.round) for r in cr.seen.read().collect())
        # the robots tables themselves agree row-for-row
        rob = sorted((r.host, list(r.disallow), r.crawl_delay)
                     for r in cr._robots_df().collect())
        if mode:
            assert rob == robots_ref
        else:
            robots_ref = rob
    assert logs[True] == logs[False]
    assert seen[True] == seen[False]
