"""Standard-security-handler decryption (empty user password).

Two INDEPENDENT implementations are cross-checked: the extract side
(functions/pdf_crypt.py) against the corpus encrypt side
(sources/corpus.py _pdf_enc_*), with RC4 itself pinned to a published
known-answer vector so a shared misreading of the spec cannot cancel
out silently.
"""

import hashlib
import re

from documentconvert_ray.functions import pdf_crypt as pc
from documentconvert_ray.functions.pdf_extract import extract_pdf
from documentconvert_ray.sources import corpus as C


def test_rc4_known_answer():
    # classic published RC4 test vectors (key/plaintext/ciphertext)
    vectors = [
        (b"Key", b"Plaintext", bytes.fromhex("BBF316E8D940AF0AD3")),
        (b"Wiki", b"pedia", bytes.fromhex("1021BF0420")),
        (b"Secret", b"Attack at dawn",
         bytes.fromhex("45A01F645FC35B383552544B9BF5")),
    ]
    for key, pt, ct in vectors:
        assert pc.rc4(key, pt) == ct
        assert C._rc4_xor(key, pt) == ct  # corpus twin, same vectors
        assert pc.rc4(key, ct) == pt  # symmetric


def test_crypt_sides_agree():
    """file key / U entry / object key: corpus encrypt side ==
    pdf_crypt decrypt side, R2 and R3."""
    o = bytes(range(32))
    id0 = bytes(range(100, 116))
    for rev, bits in ((2, 40), (3, 128)):
        k_enc = C._pdf_enc_file_key(o, -44, id0, rev, bits)
        k_dec = pc.file_key(o, -44, id0, rev, bits)
        assert k_enc == k_dec
        u = C._pdf_enc_user_entry(k_enc, rev, id0)
        assert pc.check_user_password(k_dec, u, rev, id0)
        # a WRONG key must not validate
        bad = pc.file_key(o, -45, id0, rev, bits)
        assert not pc.check_user_password(bad, u, rev, id0)
        for num, gen in ((1, 0), (77, 0), (300, 1)):
            assert (C._pdf_enc_object_key(k_enc, num, gen)
                    == pc.object_key(k_dec, num, gen))


def _pdf_classes(limit: int = 4000):
    """Corpus pdf docs bucketed by encryption class."""
    out = {"pw": [], "empty": [], "plain": []}
    for doc_id in range(limit):
        rr = C._rng(doc_id, C.SEED + 99)
        roll = rr.random()
        if not (0.88 <= roll < 0.96):
            continue
        payload, _naive, _lang = C.make_pdf(doc_id)
        if not payload.rstrip(b" \t\r\n\x00").endswith(b"%%EOF"):
            continue
        if b"/Encrypt" not in payload:
            out["plain"].append((doc_id, payload))
        elif b"/U <" + b"11" * 32 + b">" in payload:
            out["pw"].append((doc_id, payload))
        else:
            out["empty"].append((doc_id, payload))
    return out


def test_corpus_encrypted_classes():
    cls = _pdf_classes()
    assert cls["pw"] and cls["empty"]
    for _doc_id, payload in cls["pw"]:
        res = extract_pdf(payload)
        assert not res.ok and res.error_kind == "encrypted_pdf"
    r2 = r3 = 0
    for doc_id, payload in cls["empty"]:
        res = extract_pdf(payload)
        assert res.ok and res.text_md, (doc_id, res.error_kind)
        if hashlib.md5(f"encR-{doc_id}".encode()).digest()[0] & 1:
            r2 += 1
        else:
            r3 += 1
    assert r2 and r3  # both RC4-40/R2 and RC4-128/R3 exercised


def test_decrypted_text_matches_plaintext_twin():
    """Manually strip the encryption from an RC4-empty corpus doc
    (decrypt every stream, drop /Encrypt+/ID from the trailer) and
    assert the extractor yields byte-identical markdown for both —
    proves decryption changes nothing but the wire bytes."""
    cls = _pdf_classes()
    checked = 0
    for doc_id, payload in cls["empty"][:6]:
        # recover the file key exactly as the extractor does
        m = re.search(rb"/Encrypt\s+(\d+)\s+0\s+R", payload)
        idm = re.search(rb"/ID\s*\[\s*<([0-9a-fA-F]*)>", payload)
        id0 = bytes.fromhex(idm.group(1).decode())
        encm = re.search(
            rb"/Filter /Standard /V (\d) /R (\d) /Length (\d+) "
            rb"/O <([0-9a-fA-F]+)> /U <([0-9a-fA-F]+)> /P (-?\d+)",
            payload)
        rev = int(encm.group(2))
        bits = int(encm.group(3))
        o = bytes.fromhex(encm.group(4).decode())
        p = int(encm.group(6))
        key = pc.file_key(o, p, id0, rev, bits)
        # decrypt every stream in place
        plain = bytearray(payload)
        for om in re.finditer(rb"(\d+)\s+0\s+obj\b", payload):
            num = int(om.group(1))
            end = payload.find(b"endobj", om.end())
            body = payload[om.end():end]
            sidx = body.find(b">>\nstream\n")
            if sidx < 0 or b"/Type /XRef" in body[:sidx]:
                continue
            start = sidx + len(b">>\nstream\n")
            eidx = body.rfind(b"\nendstream")
            data = pc.rc4(pc.object_key(key, num, 0), body[start:eidx])
            abs_start = om.end() + start
            plain[abs_start:abs_start + (eidx - start)] = data
        # drop the /Encrypt reference so the twin parses as plaintext
        enc_num = m.group(1)
        plain = bytes(plain).replace(
            b" /Encrypt " + enc_num + b" 0 R", b"")
        res_enc = extract_pdf(payload)
        res_plain = extract_pdf(plain)
        assert res_enc.ok and res_plain.ok, (doc_id, res_plain.error_kind)
        assert res_enc.text_md == res_plain.text_md, doc_id
        checked += 1
    assert checked >= 2
