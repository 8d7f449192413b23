"""Unit tests: the deterministic decode fallback chain (SURVEY §2.2 M15)."""

from documentconvert_ray.functions.decode import decode_bytes, sniff_declared_charset


def test_utf8_plain():
    assert decode_bytes("héllo".encode()) == ("héllo", "utf-8")


def test_bom_utf8():
    text, enc = decode_bytes(b"\xef\xbb\xbfhi")
    assert (text, enc) == ("hi", "utf-8-sig")


def test_bom_utf16():
    text, enc = decode_bytes("hi".encode("utf-16-le"))  # no BOM → not utf16
    assert text  # falls through the chain, never raises
    text, enc = decode_bytes(b"\xff\xfe" + "hi".encode("utf-16-le"))
    assert (text, enc) == ("hi", "utf-16-le")


def test_declared_gb2312():
    doc = '<meta charset="gb2312"><p>中文内容</p>'
    raw = doc.encode("gb18030")
    text, enc = decode_bytes(raw)
    assert enc == "gb18030" and "中文内容" in text


def test_declared_latin1():
    doc = '<meta charset="iso-8859-1"><p>Größe</p>'
    raw = doc.encode("latin-1")
    text, enc = decode_bytes(raw)
    assert enc == "latin-1" and "Größe" in text


def test_declared_wrong_falls_through():
    # declared ascii but payload has utf-8 multibyte → strict ascii fails,
    # chain falls through to utf-8
    raw = '<meta charset="us-ascii">café'.encode()
    text, enc = decode_bytes(raw)
    assert enc == "utf-8" and "café" in text


def test_gbk_fallback_without_declaration():
    raw = "中文".encode("gb18030")  # invalid utf-8, valid gb18030
    text, enc = decode_bytes(raw)
    assert (text, enc) == ("中文", "gb18030")


def test_latin1_total_fallback():
    raw = bytes(range(200, 256))  # invalid utf-8 and gb18030 sequences
    text, enc = decode_bytes(raw)
    assert len(text) == len(raw)


def test_empty():
    assert decode_bytes(b"") == ("", "utf-8")


def test_determinism():
    raw = b"\xc3\xa9 caf\xe9 mixed"  # mixed valid/invalid utf-8
    assert decode_bytes(raw) == decode_bytes(raw)


def test_sniff_xml_decl():
    assert sniff_declared_charset(b"<?xml version='1.0' encoding=\"UTF-8\"?>") == "utf-8"
