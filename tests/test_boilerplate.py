"""Main-content extraction (functions/boilerplate.py)."""

from etlpy_spark.functions.boilerplate import (
    block_features,
    extract_main_content,
)

ARTICLE_P1 = (
    "The committee published its findings on Tuesday after a nine month "
    "inquiry into the safety of the bridge."
)
ARTICLE_P2 = (
    "Engineers told the inquiry that the load sensors had been reporting "
    "anomalies for several weeks before the closure was ordered."
)
SHORT_GOOD = "The report runs to 142 pages."  # 29 chars: near-threshold

PAGE = f"""<html><head><title>Bridge report</title>
<style>p {{ color: red }}</style>
<script>var x = "<p>not text</p>";</script>
</head><body>
<nav><ul><li><a href="/">Home</a></li><li><a href="/news">News</a></li>
<li><a href="/sport">Sport</a></li></ul></nav>
<div class="crumbs"><a href="/">Home</a> &gt; <a href="/news">News</a></div>
<article>
<p>{ARTICLE_P1}</p>
<p>{SHORT_GOOD}</p>
<p>{ARTICLE_P2}</p>
</article>
<aside><p>Related: <a href="/a">Another long story about bridges that would
otherwise pass the length test easily, padded padded padded</a></p></aside>
<footer><p>&copy; 2026 Example News. <a href="/terms">Terms</a></p></footer>
</body></html>"""


class TestExtraction:
    def test_keeps_article_drops_chrome(self):
        text = extract_main_content(PAGE)
        assert ARTICLE_P1 in text
        assert ARTICLE_P2 in text
        assert "Home" not in text          # nav + breadcrumbs
        assert "Related" not in text       # aside container
        assert "Terms" not in text         # footer container
        assert "color: red" not in text    # style
        assert "not text" not in text      # script content

    def test_near_block_promoted_between_good_neighbours(self):
        text = extract_main_content(PAGE)
        assert SHORT_GOOD in text

    def test_near_block_not_promoted_in_isolation(self):
        page = f"<html><body><p>{SHORT_GOOD}</p><p><a href='/x'>more</a></p></body></html>"
        assert extract_main_content(page) == ""

    def test_link_density_rejects_link_farm(self):
        links = " ".join(f'<a href="/{i}">interesting long anchor text {i}</a>' for i in range(20))
        page = f"<html><body><div>{links}</div><p>{ARTICLE_P1}</p></body></html>"
        text = extract_main_content(page)
        assert ARTICLE_P1 in text
        assert "anchor text 3" not in text

    def test_malformed_html_never_raises(self):
        for page in (
            "<html><body><p>" + ARTICLE_P1,               # nothing closed
            "<div><p>a & b " + ARTICLE_P1 + "<br>",       # bare ampersand
            "<p>" + ARTICLE_P1 + "</nav></footer>",       # stray closes
            "\x00<not a tag" + ARTICLE_P1,
            "",
        ):
            out = extract_main_content(page)
            assert isinstance(out, str)
        assert ARTICLE_P1 in extract_main_content("<html><body><p>" + ARTICLE_P1)

    def test_entities_decoded_in_blocks(self):
        page = f"<p>{ARTICLE_P1} Costs &amp; benefits: &#8364;5, &lt;1% said &quot;no&quot;.</p>"
        text = extract_main_content(page)
        assert "Costs & benefits" in text
        assert "€5" in text
        assert '<1% said "no"' in text

    def test_unclosed_nav_poisons_tail(self):
        page = f"<body><p>{ARTICLE_P1}</p><nav><p>{ARTICLE_P2}</p></body>"
        text = extract_main_content(page)
        assert ARTICLE_P1 in text
        assert ARTICLE_P2 not in text


class TestBlockFeatures:
    def test_labels_and_densities(self):
        feats = block_features(PAGE)
        by_text = {b["text"]: b for b in feats}
        a1 = by_text[ARTICLE_P1]
        assert a1["label"] == "good" and a1["link_density"] == 0.0
        nav = [b for b in feats if b["in_container"]]
        assert nav and all(b["label"] == "bad" for b in nav)

    def test_link_chars_bounded_by_block_chars(self):
        feats = block_features(PAGE)
        for b in feats:
            assert 0 <= b["link_chars"] <= b["n_chars"]
            assert 0.0 <= b["link_density"] <= 1.0

    def test_br_splits_blocks(self):
        page = f"<p>{ARTICLE_P1}<br>{ARTICLE_P2}</p>"
        feats = block_features(page)
        texts = [b["text"] for b in feats]
        assert ARTICLE_P1 in texts and ARTICLE_P2 in texts


from hypothesis import given, settings
from hypothesis import strategies as st

_SOUP = st.lists(st.one_of(
    st.text(alphabet="ab<>&/#; \n\"'=x-", max_size=24),
    st.sampled_from([
        "<div>", "</div>", "<p>", "</p>", "<a href='/x'>", "</a>", "<nav>",
        "</nav>", "<script>", "</script>", "<br>", "<!--", "-->", "&amp;",
        "&#65;", "&#999999999;", "<p", "</", ">", "<>", "\x00",
    ]),
), max_size=60)


class TestFuzz:
    @settings(max_examples=120, deadline=None)
    @given(_SOUP)
    def test_never_raises_and_invariants_hold(self, parts):
        """Any tag soup: extraction never raises, main_text chars are a
        subset story (no block text invented), features stay bounded."""
        html = "".join(parts)
        out = extract_main_content(html)
        assert isinstance(out, str)
        for b in block_features(html):
            assert b["n_chars"] == len(b["text"]) > 0
            assert 0 <= b["link_chars"] <= b["n_chars"]
            assert 0.0 <= b["link_density"] <= 1.0
            assert b["label"] in ("good", "near", "short", "bad")
