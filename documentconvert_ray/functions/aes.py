"""Pure-Python AES — cipher + inverse cipher + the CBC modes feeding
the PDF standard security handler's /AESV2 (AES-128) and /AESV3
(AES-256, /V 5 /R 6) crypt filters (functions/pdf_crypt.py).
Implemented from FIPS-197 (the published spec: the §5.1 cipher, §5.3
inverse cipher and the Nk-general key expansion of §5.2); tests pin
the block cipher to the spec's own C.1/C.3 known-answer vectors. The
corpus generator carries an INDEPENDENT forward-cipher implementation
(sources/corpus._aes_enc_block) so the round-trip tests cross-check
two readings of the standard — the same twin discipline as the RC4
pair.

Scope: 128/192/256-bit keys; CBC with the PDF layout (16-byte IV
prepended to the ciphertext, PKCS#7 padding) plus the no-padding
known-IV CBC that PDF 2.0's Algorithm 2.B hash and /UE key unwrap
require. Not a general crypto library — a wire-format decoder for two
documented PDF classes.
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


# forward MixColumns multiplication tables (coefficients 2, 3)
_M2 = bytes(_gmul(x, 2) for x in range(256))
_M3 = bytes(_gmul(x, 3) for x in range(256))


def expand_key(key: bytes) -> list[bytes]:
    """§5.2 key expansion, Nk-general → Nr+1 round keys of 16 bytes
    (Nr = Nk + 6: 10/12/14 rounds for AES-128/192/256)."""
    nk = len(key) // 4
    if len(key) not in (16, 24, 32):
        raise ValueError("AES key must be 16, 24 or 32 bytes")
    nr = nk + 6
    w = [key[4 * i: 4 * i + 4] for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = bytes(_SBOX[b] for b in t[1:] + t[:1])
            t = bytes((t[0] ^ _RCON[i // nk - 1],)) + t[1:]
        elif nk > 6 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        w.append(bytes(a ^ b for a, b in zip(w[i - nk], t)))
    return [b"".join(w[4 * r: 4 * r + 4]) for r in range(nr + 1)]


def decrypt_block(round_keys: list[bytes], block: bytes) -> bytes:
    """FIPS-197 §5.3 InvCipher over one 16-byte block (equivalent
    straightforward form: rounds of InvShiftRows, InvSubBytes,
    AddRoundKey, InvMixColumns)."""
    nr = len(round_keys) - 1
    s = bytearray(a ^ b for a, b in zip(block, round_keys[nr]))
    for rnd in range(nr - 1, 0, -1):
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


def encrypt_block(round_keys: list[bytes], block: bytes) -> bytes:
    """FIPS-197 §5.1 Cipher over one 16-byte block (SubBytes,
    ShiftRows, MixColumns, AddRoundKey) — needed decode-side by PDF
    2.0's Algorithm 2.B iterated hash, which CBC-ENCRYPTS its own
    input inside the password-to-key derivation."""
    nr = len(round_keys) - 1
    s = bytearray(a ^ b for a, b in zip(block, round_keys[0]))
    for rnd in range(1, nr):
        s = bytearray(_SBOX[b] for b in s)  # SubBytes
        t = bytearray(16)  # ShiftRows: row r rotates LEFT by r
        for col in range(4):
            for row in range(4):
                t[4 * col + row] = s[4 * ((col + row) % 4) + row]
        s = bytearray(16)  # MixColumns (2 3 1 1)
        for col in range(4):
            c = t[4 * col: 4 * col + 4]
            s[4 * col + 0] = _M2[c[0]] ^ _M3[c[1]] ^ c[2] ^ c[3]
            s[4 * col + 1] = c[0] ^ _M2[c[1]] ^ _M3[c[2]] ^ c[3]
            s[4 * col + 2] = c[0] ^ c[1] ^ _M2[c[2]] ^ _M3[c[3]]
            s[4 * col + 3] = _M3[c[0]] ^ c[1] ^ c[2] ^ _M2[c[3]]
        s = bytearray(a ^ b for a, b in zip(s, round_keys[rnd]))
    s = bytearray(_SBOX[b] for b in s)
    t = bytearray(16)
    for col in range(4):
        for row in range(4):
            t[4 * col + row] = s[4 * ((col + row) % 4) + row]
    return bytes(a ^ b for a, b in zip(t, round_keys[nr]))


def cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw CBC encryption, no padding, explicit IV (data length must
    be a block multiple) — Algorithm 2.B's inner step."""
    if len(data) % 16:
        raise ValueError("CBC no-pad data must be a 16-byte multiple")
    rks = expand_key(key)
    out = bytearray()
    prev = iv
    for off in range(0, len(data), 16):
        ct = encrypt_block(
            rks, bytes(a ^ b for a, b in zip(data[off:off + 16], prev)))
        out += ct
        prev = ct
    return bytes(out)


def cbc_decrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw CBC decryption, no padding, explicit IV — the /UE and /OE
    file-key unwrap of PDF 2.0 Algorithm 2.A (step f)."""
    if len(data) % 16:
        raise ValueError("CBC no-pad data must be a 16-byte multiple")
    rks = expand_key(key)
    out = bytearray()
    prev = iv
    for off in range(0, len(data), 16):
        block = data[off:off + 16]
        pt = decrypt_block(rks, block)
        out += bytes(a ^ b for a, b in zip(pt, prev))
        prev = block
    return bytes(out)


def cbc_decrypt_pdf(key: bytes, data: bytes) -> bytes:
    """PDF /AESV2 and /AESV3 stream layout: the first 16 bytes are
    the IV, the rest is CBC ciphertext with PKCS#7 padding (key length
    selects AES-128 vs AES-256). Returns the plaintext; raises
    ValueError on malformed layout/padding (callers turn that into the
    encrypted_pdf error row)."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("AES-CBC stream too short or misaligned")
    out = bytearray(cbc_decrypt_nopad(key, data[:16], data[16:]))
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytearray([pad]) * pad:
        raise ValueError("bad PKCS#7 padding")
    return bytes(out[:-pad])
