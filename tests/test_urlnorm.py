"""M14 url/filename decode rules (reference encoding_utils.py:27-70
semantics, rebuilt from scratch)."""

from documentconvert_ray.functions.urlnorm import (
    canonicalize_url,
    decode_url_filename,
    looks_garbled,
    percent_decode,
)


def test_percent_decode_basic():
    assert percent_decode("caf%C3%A9.pdf") == "café.pdf"
    assert percent_decode("%E4%B8%AD%E6%96%87.docx") == "中文.docx"


def test_no_encoding_untouched():
    assert percent_decode("plain-name.pdf") == "plain-name.pdf"
    assert percent_decode("100% sure") == "100% sure"  # bare %, no %XX


def test_bad_decode_keeps_original():
    # %FF%FE is not valid utf-8 → strict decode fails → keep original
    assert percent_decode("a%FF%FEb") == "a%FF%FEb"


def test_mojibake_result_rejected():
    # percent-encoding of utf-8-read-as-latin1 bytes: decoding yields
    # 'Ã©' style garble → keep the original form
    garbled = "caf%C3%83%C2%A9"  # decodes to 'cafÃ©'
    assert percent_decode(garbled) == garbled
    assert looks_garbled("cafÃ©")
    assert not looks_garbled("café")
    assert not looks_garbled("Größe")  # real German: no adjacent pair


def test_filename_extraction():
    assert decode_url_filename("https://h/a/b/caf%C3%A9.pdf") == "café.pdf"
    assert decode_url_filename("/x/y/report.docx") == "report.docx"


def test_canonicalize_url():
    assert (
        canonicalize_url("HTTPS://Site-1.Example:443/p%61th?q=1#frag")
        == "https://site-1.example/path?q=1"
    )
    assert (
        canonicalize_url("http://h.example:80/") == "http://h.example/"
    )
    # canonicalization is idempotent
    u = canonicalize_url("https://A.B/c%20d")
    assert canonicalize_url(u) == u
