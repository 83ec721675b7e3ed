"""From-scratch charset detection for real-web HTML bytes.

The reference decodes fetched HTML by scanning a meta-charset regex and
falling back to the ``chardet`` package (spider.py:99, :144-155). This
module reimplements that pipeline without external deps, following the
order real browsers use (the WHATWG encoding sniff, simplified to the
encodings that dominate web archives):

1. byte-order mark (UTF-8 / UTF-16 / UTF-32, both endians)
2. ``charset=`` parameter on the HTTP Content-Type header
3. ``<meta charset=...>`` / ``<meta http-equiv=Content-Type ...>`` in the
   first 2 KiB (the reference's regex, made tolerant to quoting/order)
4. strict UTF-8 validation — valid UTF-8 is essentially never another
   intended encoding in practice
5. a UTF-16 null-byte pattern heuristic for BOM-less UTF-16
6. windows-1252 fallback (the WHATWG default for the legacy web; also
   what ``latin-1``/``iso-8859-1`` labels mean there)

Everything is a pure function of the bytes + header string, so the Spark
path and any serial oracle agree exactly. Decoding never raises: unknown
or lying labels degrade down this ladder, and the final decode uses
``errors="replace"``.
"""

from __future__ import annotations

import codecs
import re

_BOMS = (
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)

_CT_CHARSET = re.compile(r"charset\s*=\s*[\"']?([\w.:-]+)", re.IGNORECASE)
# <meta charset="..."> and <meta http-equiv="Content-Type" content="text/html; charset=...">
_META_CHARSET = re.compile(
    rb"<meta[^>]{0,256}?charset\s*=\s*[\"']?([\w.:-]+)", re.IGNORECASE
)

# WHATWG label → Python codec for the labels that matter on the web.
# latin-1 family deliberately maps to cp1252 (browsers treat it so, and
# cp1252 is a strict superset on the printable range).
_LABEL_ALIASES = {
    "iso-8859-1": "cp1252",
    "iso8859-1": "cp1252",
    "latin-1": "cp1252",
    "latin1": "cp1252",
    "us-ascii": "cp1252",
    "ascii": "cp1252",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "gb2312": "gbk",  # WHATWG: gb2312 label means GBK
    "gb-2312": "gbk",
    "utf8": "utf-8",
    "unicode": "utf-16-le",  # legacy IE label
}


def _resolve_label(label: str) -> str | None:
    """Charset label → Python codec name, or None when unknown."""
    name = label.strip().strip(";,").lower()
    name = _LABEL_ALIASES.get(name, name)
    try:
        info = codecs.lookup(name)
    except LookupError:
        return None
    # reject codecs that are not text charsets (e.g. 'hex')
    if not getattr(info, "_is_text_encoding", True):
        return None
    return info.name


def _looks_utf16(data: bytes) -> str | None:
    """BOM-less UTF-16 heuristic: ASCII-heavy UTF-16 text has a NUL in
    every other byte. Checked on the first 1 KiB."""
    head = data[:1024]
    if len(head) < 8:
        return None
    even = head[0::2].count(0)
    odd = head[1::2].count(0)
    half = max(len(head) // 2, 1)
    if odd > 0.4 * half and even < 0.05 * half:
        return "utf-16-le"
    if even > 0.4 * half and odd < 0.05 * half:
        return "utf-16-be"
    return None


def detect_charset(data: bytes, content_type: str = "") -> str:
    """Best-effort charset of an HTML/text payload (a Python codec name).

    Pure function of (bytes, header); never raises. The returned name is
    always decodable by Python's codecs with errors='replace'."""
    for bom, name in _BOMS:
        if data[: len(bom)] == bom:
            return name
    if content_type:
        m = _CT_CHARSET.search(content_type)
        if m:
            resolved = _resolve_label(m.group(1))
            if resolved:
                return resolved
    m = _META_CHARSET.search(data[:2048])
    if m:
        resolved = _resolve_label(m.group(1).decode("ascii", "replace"))
        if resolved:
            return resolved
    # UTF-16 check BEFORE UTF-8 validation: ASCII text in BOM-less UTF-16
    # is byte-interleaved NULs, which strict UTF-8 happily accepts
    u16 = _looks_utf16(data)
    if u16:
        return u16
    try:
        data.decode("utf-8", "strict")
        return "utf-8"
    except UnicodeDecodeError:
        pass
    return "cp1252"


def decode_html_bytes(data: bytes, content_type: str = "") -> str:
    """Bytes → text via detect_charset, replacement on bad sequences —
    the decode the reference performs at spider.py:144-155, chardet
    fallback included, with no external package."""
    return data.decode(detect_charset(data, content_type), "replace")
