"""Main-content extraction (boilerplate removal) for crawled HTML.

A WET-style tag-strip (sources/warc.py ``html_to_text``) keeps *all*
visible text — navigation menus, footers, cookie banners, related-link
sidebars. A training corpus wants the article body only. This module
implements the standard shallow-feature block classifier (the
jusText / Boilerpipe family: Pomikálek 2011, Kohlschütter et al. WSDM
2010) in pure stdlib + regex, tolerant of real-world malformed HTML:

1. **Segment** the page into text blocks at block-level tag boundaries,
   tracking per block: visible characters, characters inside ``<a>``
   (link density), and whether the block sits inside a semantic
   boilerplate container (``nav`` / ``header`` / ``footer`` / ``aside``,
   plus ``script``/``style``/``noscript``/``svg``/``template`` which are
   dropped outright).
2. **Classify** each block: containers are ``bad``; high link density
   (> ``max_link_density``) is ``bad``; long blocks (≥ ``long_chars``)
   are ``good``; mid-length low-link blocks are ``near``; the rest
   ``short``.
3. **Relax**: ``near`` blocks adjacent to a ``good`` block are promoted
   (jusText's context-sensitive pass, one sweep each direction).

``extract_main_content`` joins the good blocks with newlines. The
classifier is deterministic and language-agnostic (length + link
density, no stopword lists), so the same thresholds hold across a
multilingual crawl; scores are exposed via ``block_features`` for tests
and tuning.

Runs per document inside Arrow-batched ``mapInPandas``
(``sources.warc.warc_to_documents(main_content=True)``) — zero per-row
Python at plan level, same discipline as the codec kernels.
"""

from __future__ import annotations

import re

# block-level elements that delimit text blocks when opened OR closed
_BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li dt dd td th tr table ul ol blockquote pre "
    "article section main figure figcaption form hr br title body html "
    "header footer nav aside".split()
)
# semantic containers whose entire subtree is boilerplate
_BAD_CONTAINERS = frozenset("nav header footer aside".split())
# subtrees with no visible text at all
_DROP_CONTAINERS = frozenset("script style noscript svg template".split())
# void elements never get a matching close tag — do not track depth
_VOID = frozenset("br hr img meta link input area base col embed source track wbr".split())

_TAG = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>|<!--.*?-->", re.S)
_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
             "&#39;": "'", "&apos;": "'", "&nbsp;": " "}
_NUMERIC_ENT = re.compile(r"&#(\d{1,7});")


def _decode_entities(t: str) -> str:
    for ent, ch in _ENTITIES.items():
        t = t.replace(ent, ch)
    return _NUMERIC_ENT.sub(
        lambda m: chr(int(m.group(1))) if int(m.group(1)) < 0x110000 else " ", t
    )


def _segment(html: str) -> list[dict]:
    """Tolerant one-pass segmentation: walk tags, accumulate visible text
    between block boundaries, count linked characters (``<a>`` depth) and
    flag blocks inside semantic boilerplate containers. Unclosed tags
    leave their depth counters high — harmless for classification (a page
    that never closes ``<nav>`` keeps everything after it boilerplate,
    which is what a human would conclude too)."""
    blocks: list[dict] = []
    buf: list[str] = []
    link_chars = 0
    a_depth = 0
    bad_depth = 0
    drop_depth = 0
    pos = 0

    def _flush() -> None:
        nonlocal buf, link_chars
        text = _decode_entities(" ".join("".join(buf).split()))
        if text:
            n = len(text)
            blocks.append({
                "text": text,
                "n_chars": n,
                "link_chars": min(link_chars, n),
                "in_container": bad_depth > 0,
            })
        buf = []
        link_chars = 0

    for m in _TAG.finditer(html):
        seg = html[pos : m.start()]
        pos = m.end()
        if seg and drop_depth == 0:
            buf.append(seg)
            if a_depth > 0:
                # linked chars counted on the whitespace-normalized form
                link_chars += len(" ".join(seg.split()))
        if m.group(2) is None:  # comment
            continue
        closing, name = m.group(1) == "/", m.group(2).lower()
        if name in _DROP_CONTAINERS:
            if not closing:
                drop_depth += 1
            elif drop_depth > 0:
                drop_depth -= 1
            continue
        if drop_depth > 0:
            continue
        if name == "a":
            if not closing:
                a_depth += 1
            elif a_depth > 0:
                a_depth -= 1
        if name in _BLOCK_TAGS:
            _flush()
            if name in _BAD_CONTAINERS and name not in _VOID:
                if not closing:
                    bad_depth += 1
                elif bad_depth > 0:
                    bad_depth -= 1
    tail = html[pos:]
    if tail and drop_depth == 0:
        buf.append(tail)
        if a_depth > 0:
            link_chars += len(" ".join(tail.split()))
    _flush()
    return blocks


def block_features(html: str, long_chars: int = 80, short_chars: int = 25,
                   max_link_density: float = 0.3) -> list[dict]:
    """Segment + classify + relax; returns the block list with
    ``link_density`` and final ``label`` in ('good', 'near', 'short',
    'bad') where content = label == 'good' after promotion."""
    blocks = _segment(html)
    for b in blocks:
        b["link_density"] = b["link_chars"] / b["n_chars"]
        if b["in_container"] or b["link_density"] > max_link_density:
            b["label"] = "bad"
        elif b["n_chars"] >= long_chars:
            b["label"] = "good"
        elif b["n_chars"] >= short_chars and b["link_density"] <= max_link_density / 1.5:
            b["label"] = "near"
        else:
            b["label"] = "short"
    # context-sensitive promotion: near blocks touching a good block
    # (one forward + one backward sweep, so runs of near blocks anchored
    # at either end by a good block all promote)
    for idx in list(range(1, len(blocks))) + list(range(len(blocks) - 2, -1, -1)):
        if blocks[idx]["label"] == "near":
            lo = blocks[idx - 1]["label"] == "good" if idx > 0 else False
            hi = blocks[idx + 1]["label"] == "good" if idx + 1 < len(blocks) else False
            if lo or hi:
                blocks[idx]["label"] = "good"
    return blocks


def extract_main_content(html: str, long_chars: int = 80, short_chars: int = 25,
                         max_link_density: float = 0.3) -> str:
    """Article-body text of an HTML page: the good blocks of
    ``block_features``, newline-joined. Empty string when no block
    qualifies (pure-navigation pages). Never raises."""
    if not html:
        return ""
    return "\n".join(
        b["text"] for b in block_features(html, long_chars, short_chars, max_link_density)
        if b["label"] == "good"
    )
