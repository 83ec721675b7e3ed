"""functions/charset.py — the from-scratch replica of the reference's
meta-regex + chardet decode pipeline (spider.py:99, :144-155)."""

import codecs

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etlpy_spark.functions.charset import decode_html_bytes, detect_charset

CAFE = "café — naïve"


def test_bom_wins_over_everything():
    body = '<meta charset="shift_jis">' + CAFE
    for enc, codec in (("utf-8-sig", "utf-8-sig"), ("utf-16-le", "utf-16-le"),
                       ("utf-16-be", "utf-16-be")):
        raw = codecs.BOM_UTF8 + body.encode("utf-8") if enc == "utf-8-sig" else body.encode(enc)
        if enc == "utf-16-le":
            raw = codecs.BOM_UTF16_LE + body.encode("utf-16-le")
        elif enc == "utf-16-be":
            raw = codecs.BOM_UTF16_BE + body.encode("utf-16-be")
        assert detect_charset(raw, "text/html; charset=gbk") == codec
        assert CAFE in decode_html_bytes(raw, "text/html; charset=gbk")


def test_content_type_header_beats_meta_tag():
    raw = ('<meta http-equiv="Content-Type" content="text/html; charset=utf-8">'
           + CAFE).encode("cp1252")
    assert detect_charset(raw, "text/html; charset=windows-1252") == "cp1252"
    assert CAFE in decode_html_bytes(raw, "text/html; charset=windows-1252")


def test_meta_tag_both_syntaxes():
    for meta in ('<meta charset="windows-1252">',
                 "<meta charset=windows-1252>",
                 '<meta http-equiv="Content-Type" content="text/html; charset=windows-1252"/>'):
        raw = (meta + CAFE).encode("cp1252")
        assert detect_charset(raw) == "cp1252"
        assert CAFE in decode_html_bytes(raw)


def test_latin1_label_means_cp1252():
    # the WHATWG rule: iso-8859-1 labels decode as windows-1252 (0x93/0x94
    # are smart quotes there, control chars in true latin-1)
    raw = b"<meta charset='iso-8859-1'>he said \x93hi\x94"
    assert detect_charset(raw) == "cp1252"
    assert "“hi”" in decode_html_bytes(raw)


def test_declared_gbk_honored():
    raw = ('<meta charset="gb2312">' + "中文网页").encode("gbk")
    assert detect_charset(raw) == "gbk"
    assert "中文网页" in decode_html_bytes(raw)


def test_valid_utf8_without_declaration():
    raw = ("<p>" + CAFE + "</p>").encode("utf-8")
    assert detect_charset(raw) == "utf-8"
    assert CAFE in decode_html_bytes(raw)


def test_bomless_utf16_heuristic():
    text = "<html><body>plain ascii text that is long enough</body></html>"
    assert detect_charset(text.encode("utf-16-le")) == "utf-16-le"
    assert detect_charset(text.encode("utf-16-be")) == "utf-16-be"
    assert decode_html_bytes(text.encode("utf-16-le")) == text


def test_cp1252_fallback_and_lying_labels():
    # invalid utf-8, no declaration -> cp1252
    raw = b"caf\xe9 au lait"
    assert detect_charset(raw) == "cp1252"
    assert decode_html_bytes(raw) == "café au lait"
    # an unknown/garbage label degrades down the ladder, never raises
    raw2 = b'<meta charset="klingon-7">ok \xe9'
    assert detect_charset(raw2) == "cp1252"
    assert "ok é" in decode_html_bytes(raw2)
    # a non-charset codec name must not be honored
    assert detect_charset(b'<meta charset="hex">\xff\xfe\xff', "") != "hex"


def test_never_raises_on_hostile_bytes():
    for blob in (b"", b"\x00", b"\xff" * 64, bytes(range(256))):
        s = decode_html_bytes(blob)
        assert isinstance(s, str)


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=512), st.text(max_size=40))
def test_decode_total_function(data, ct):
    assert isinstance(decode_html_bytes(data, ct), str)


def test_warc_to_documents_charset(spark, tmp_path):
    """End-to-end: a cp1252 page and a utf-8 page through the WARC front
    door come out with identical visible text."""
    from etlpy_spark.sources.warc import warc_to_documents, write_warc

    body = "<html><body><p>" + CAFE + "</p></body></html>"
    recs = [
        {"warc_type": "response", "url": "http://a.example/1",
         "http_status": 200,
         "http_content_type": "text/html; charset=windows-1252",
         "payload": body.encode("cp1252"), "date": "2026-01-01T00:00:00Z"},
        {"warc_type": "response", "url": "http://a.example/2",
         "http_status": 200, "http_content_type": "text/html",
         "payload": body.encode("utf-8"), "date": "2026-01-01T00:00:00Z"},
    ]
    write_warc(str(tmp_path / "seg-00000.warc.gz"), recs)
    rows = warc_to_documents(spark, str(tmp_path)).orderBy("url").collect()
    assert len(rows) == 2
    assert rows[0]["text"] == rows[1]["text"]
    assert CAFE in rows[0]["text"]
