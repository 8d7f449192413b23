"""Pure-Python AES-128 — the INVERSE cipher + CBC decryption feeding
the PDF standard security handler's /AESV2 crypt filter
(functions/pdf_crypt.py). Implemented from FIPS-197 (the published
spec: InvSubBytes / InvShiftRows / InvMixColumns / AddRoundKey and the
key expansion of §5.2); tests pin the block cipher to the spec's own
C.1 known-answer vector. The corpus generator carries an INDEPENDENT
forward-cipher implementation (sources/corpus._aes_encrypt_block) so
the round-trip tests cross-check two readings of the standard — the
same twin discipline as the RC4 pair.

Scope: 128-bit keys only (AESV2 is AES-128 by definition); CBC with
the PDF layout (16-byte IV prepended to the ciphertext) and PKCS#7
padding. Not a general crypto library — a wire-format decoder for one
documented PDF class.
"""

from __future__ import annotations

# FIPS-197 §5.1.1 S-box (forward, needed for the key schedule) and its
# inverse (§5.3.2)
_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_INV_SBOX = bytes(256)
_inv = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _inv[_v] = _i
_INV_SBOX = bytes(_inv)
del _inv, _i, _v

_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36)


def _xtime(a: int) -> int:
    a <<= 1
    if a & 0x100:
        a ^= 0x11B
    return a & 0xFF


def _gmul(a: int, b: int) -> int:
    """GF(2^8) multiply (§4.2)."""
    p = 0
    while b:
        if b & 1:
            p ^= a
        a = _xtime(a)
        b >>= 1
    return p


# multiplication tables for InvMixColumns coefficients 9, 11, 13, 14
_M9 = bytes(_gmul(x, 9) for x in range(256))
_M11 = bytes(_gmul(x, 11) for x in range(256))
_M13 = bytes(_gmul(x, 13) for x in range(256))
_M14 = bytes(_gmul(x, 14) for x in range(256))


def expand_key(key: bytes) -> list[bytes]:
    """§5.2 key expansion → 11 round keys of 16 bytes (AES-128)."""
    if len(key) != 16:
        raise ValueError("AES-128 key must be 16 bytes")
    w = [key[4 * i: 4 * i + 4] for i in range(4)]
    for i in range(4, 44):
        t = w[i - 1]
        if i % 4 == 0:
            t = bytes(_SBOX[b] for b in t[1:] + t[:1])
            t = bytes((t[0] ^ _RCON[i // 4 - 1],)) + t[1:]
        w.append(bytes(a ^ b for a, b in zip(w[i - 4], t)))
    return [b"".join(w[4 * r: 4 * r + 4]) for r in range(11)]


def decrypt_block(round_keys: list[bytes], block: bytes) -> bytes:
    """FIPS-197 §5.3 InvCipher over one 16-byte block (equivalent
    straightforward form: rounds of InvShiftRows, InvSubBytes,
    AddRoundKey, InvMixColumns)."""
    s = bytearray(a ^ b for a, b in zip(block, round_keys[10]))
    for rnd in range(9, 0, -1):
        # InvShiftRows: row r rotates RIGHT by r (state is
        # column-major: byte index = 4*col + row)
        t = bytearray(16)
        for col in range(4):
            for row in range(4):
                t[4 * ((col + row) % 4) + row] = s[4 * col + row]
        # InvSubBytes
        t = bytearray(_INV_SBOX[b] for b in t)
        # AddRoundKey
        rk = round_keys[rnd]
        t = bytearray(a ^ b for a, b in zip(t, rk))
        # InvMixColumns
        s = bytearray(16)
        for col in range(4):
            c = t[4 * col: 4 * col + 4]
            s[4 * col + 0] = (_M14[c[0]] ^ _M11[c[1]]
                              ^ _M13[c[2]] ^ _M9[c[3]])
            s[4 * col + 1] = (_M9[c[0]] ^ _M14[c[1]]
                              ^ _M11[c[2]] ^ _M13[c[3]])
            s[4 * col + 2] = (_M13[c[0]] ^ _M9[c[1]]
                              ^ _M14[c[2]] ^ _M11[c[3]])
            s[4 * col + 3] = (_M11[c[0]] ^ _M13[c[1]]
                              ^ _M9[c[2]] ^ _M14[c[3]])
    # final round: no InvMixColumns
    t = bytearray(16)
    for col in range(4):
        for row in range(4):
            t[4 * ((col + row) % 4) + row] = s[4 * col + row]
    t = bytearray(_INV_SBOX[b] for b in t)
    return bytes(a ^ b for a, b in zip(t, round_keys[0]))


def cbc_decrypt_pdf(key: bytes, data: bytes) -> bytes:
    """PDF /AESV2 stream layout: the first 16 bytes are the IV, the
    rest is CBC ciphertext with PKCS#7 padding. Returns the plaintext;
    raises ValueError on malformed layout/padding (callers turn that
    into the encrypted_pdf error row)."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("AES-CBC stream too short or misaligned")
    rks = expand_key(key)
    iv = data[:16]
    out = bytearray()
    prev = iv
    for off in range(16, len(data), 16):
        block = data[off: off + 16]
        pt = decrypt_block(rks, block)
        out += bytes(a ^ b for a, b in zip(pt, prev))
        prev = block
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytearray([pad]) * pad:
        raise ValueError("bad PKCS#7 padding")
    return bytes(out[:-pad])
