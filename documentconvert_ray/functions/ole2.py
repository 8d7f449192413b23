"""OLE2 / CFB (Compound File Binary) container: reader + writer.

The reference handles legacy binary office documents (.doc/.xls/.ppt
— 3 of the 7 files in its own test corpus, /root/reference/test/) by
shelling out to LibreOffice (services/document_service.py:128-185).
This module reads the container format directly on stdlib so the
extraction legs (doc_extract and friends) can pull the content
streams with no converter.

Format (MS-CFB): 512-byte header; the file body is a chain-allocated
sector heap (sector size 2^sector_shift, normally 512). The FAT maps
sector → next-sector; the DIFAT locates FAT sectors (first 109
entries live in the header). Directory entries are 128 bytes
(UTF-16LE name, type, start sector, size); streams smaller than the
mini-stream cutoff (4096) live in a mini-sector heap (64-byte
sectors) that itself is a stream of the root entry, chained by the
mini-FAT.

The writer exists for the deterministic test corpus (the same
pattern as the LZW/predictor encoders in sources/corpus.py): it
emits spec-shaped files — including the mini-stream path for small
streams — and the round-trip is pinned by tests.
"""

from __future__ import annotations

import struct

MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREE = 0xFFFFFFFF
_ENDCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC

MINI_CUTOFF = 4096


class CfbError(ValueError):
    """Unparseable / truncated compound file."""


def _chain(fat: list[int], start: int, limit: int) -> list[int]:
    out: list[int] = []
    s = start
    while s not in (_ENDCHAIN, _FREE) and s < 0xFFFFFFFA:
        if s >= len(fat) or len(out) > limit:
            raise CfbError(f"broken sector chain at {s}")
        out.append(s)
        s = fat[s]
    return out


def cfb_streams(raw: bytes) -> dict[str, bytes]:
    """Compound file → {stream name: bytes} (leaf names; the flat
    namespace is enough for the office legs — WordDocument, 0Table,
    Workbook, PowerPoint Document are all root-level)."""
    if len(raw) < 512 or not raw.startswith(MAGIC):
        raise CfbError("not an OLE2 compound file")
    (sector_shift, mini_shift) = struct.unpack_from("<HH", raw, 30)
    if sector_shift not in (9, 12) or mini_shift != 6:
        raise CfbError(f"unsupported sector shift {sector_shift}")
    ssz = 1 << sector_shift
    (n_fat,) = struct.unpack_from("<I", raw, 44)
    (dir_start,) = struct.unpack_from("<I", raw, 48)
    (mini_cutoff,) = struct.unpack_from("<I", raw, 56)
    (minifat_start, n_minifat) = struct.unpack_from("<II", raw, 60)
    (difat_start, n_difat) = struct.unpack_from("<II", raw, 68)

    def sector(i: int) -> bytes:
        off = 512 + i * ssz
        if off + ssz > len(raw):
            raise CfbError(f"sector {i} beyond EOF")
        return raw[off:off + ssz]

    # DIFAT: 109 header entries + chained DIFAT sectors. The walk is
    # bounded by the file's own sector count and a seen-set — a
    # corrupt header can claim n_difat=2^32-1 or chain a sector to
    # itself, and an unbounded loop would hang the extraction worker
    # (row-level error capture can't catch a hang)
    difat = list(struct.unpack_from("<109I", raw, 76))
    s = difat_start
    max_difat = min(n_difat, len(raw) // ssz + 1)
    seen: set[int] = set()
    for _ in range(max_difat):
        if s >= 0xFFFFFFFA:
            break
        if s in seen:
            raise CfbError(f"DIFAT cycle at sector {s}")
        seen.add(s)
        blk = sector(s)
        vals = struct.unpack(f"<{ssz // 4}I", blk)
        difat.extend(vals[:-1])
        s = vals[-1]
    fat_sectors = [x for x in difat[:max(n_fat, 0)] if x < 0xFFFFFFFA]
    if len(fat_sectors) < n_fat:
        raise CfbError("missing FAT sectors")
    fat: list[int] = []
    for fs in fat_sectors:
        fat.extend(struct.unpack(f"<{ssz // 4}I", sector(fs)))

    max_chain = len(raw) // ssz + 2

    def read_chain(start: int, size: int) -> bytes:
        data = b"".join(sector(s) for s in _chain(fat, start, max_chain))
        if size > len(data):
            raise CfbError("stream size beyond chain")
        return data[:size]

    # directory
    dir_data = b"".join(sector(s) for s in _chain(fat, dir_start, max_chain))
    entries = []
    for off in range(0, len(dir_data) - 127, 128):
        e = dir_data[off:off + 128]
        (name_len,) = struct.unpack_from("<H", e, 64)
        etype = e[66]
        if etype == 0 or name_len < 2 or name_len > 64:
            continue
        name = e[:name_len - 2].decode("utf-16-le", "replace")
        (start,) = struct.unpack_from("<I", e, 116)
        (size,) = struct.unpack_from("<Q", e, 120)
        if sector_shift == 9:
            size &= 0xFFFFFFFF  # v3: only the low 32 bits are valid
        entries.append((name, etype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    if root is None:
        raise CfbError("no root directory entry")

    # mini FAT + mini stream (the root entry's own chain)
    minifat: list[int] = []
    if n_minifat and minifat_start < 0xFFFFFFFA:
        for s in _chain(fat, minifat_start, max_chain):
            minifat.extend(struct.unpack(f"<{ssz // 4}I", sector(s)))
    mini_data = read_chain(root[2], root[3]) if root[3] else b""

    def read_mini(start: int, size: int) -> bytes:
        out = bytearray()
        for s in _chain(minifat, start, len(mini_data) // 64 + 2):
            off = s * 64
            if off + 64 > len(mini_data):
                raise CfbError(f"mini sector {s} beyond mini stream")
            out += mini_data[off:off + 64]
        if size > len(out):
            raise CfbError("mini stream size beyond chain")
        return bytes(out[:size])

    cutoff = mini_cutoff or MINI_CUTOFF
    out: dict[str, bytes] = {}
    for (name, etype, start, size) in entries:
        if etype != 2:  # streams only
            continue
        if name in out:
            continue  # first definition wins (deterministic)
        if size and size < cutoff:
            out[name] = read_mini(start, size)
        elif size:
            out[name] = read_chain(start, size)
        else:
            out[name] = b""
    return out


# ------------------------------------------------------------------ writer


def cfb_write(streams: list[tuple[str, bytes]]) -> bytes:
    """Streams → spec-shaped v3 compound file (512-byte sectors).

    Layout: [header | FAT | mini FAT | mini stream | big streams |
    directory]. Streams < 4096 bytes go through the mini-stream path,
    exactly like real writers, so the reader's mini-FAT branch is
    exercised by every corpus document. The directory is written LAST
    so a truncated payload deterministically loses its stream names
    (the corpus truncation variants rely on this)."""
    ssz, msz = 512, 64

    big = [(n, d) for (n, d) in streams if len(d) >= MINI_CUTOFF]
    small = [(n, d) for (n, d) in streams if len(d) < MINI_CUTOFF]

    # mini stream: concatenation of 64-byte-padded small streams
    mini = bytearray()
    mini_start: dict[str, int] = {}
    minifat: list[int] = []
    for (n, d) in small:
        nsec = max(1, -(-len(d) // msz))
        start = len(minifat)
        mini_start[n] = start
        minifat.extend(range(start + 1, start + nsec))
        minifat.append(_ENDCHAIN)
        mini += d + b"\0" * (nsec * msz - len(d))

    def pad_sect(b: bytes, fill: bytes = b"\0") -> bytes:
        n = -(-len(b) // ssz) if b else 0
        return b + fill * (n * ssz - len(b))

    minifat_bytes = pad_sect(
        b"".join(struct.pack("<I", v) for v in minifat), b"\xff")
    mini_bytes = pad_sect(bytes(mini))

    # directory entries: root + one per stream
    def dirent(name: str, etype: int, start: int, size: int,
               child: int = _FREE & 0xFFFFFFFF) -> bytes:
        nm = name.encode("utf-16-le")
        e = bytearray(128)
        e[0:len(nm)] = nm
        struct.pack_into("<H", e, 64, len(nm) + 2)
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<I", e, 68, 0xFFFFFFFF)  # left
        struct.pack_into("<I", e, 72, 0xFFFFFFFF)  # right
        struct.pack_into("<I", e, 76, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    # sector plan (after FAT whose size we solve iteratively)
    n_minifat_sect = len(minifat_bytes) // ssz
    n_mini_sect = len(mini_bytes) // ssz
    big_padded = [(n, pad_sect(d), len(d)) for (n, d) in big]
    n_big = sum(len(p) // ssz for (_n, p, _s) in big_padded)
    n_dir_entries = 1 + len(streams)
    dir_bytes_len = ((n_dir_entries * 128 + ssz - 1) // ssz) * ssz
    n_dir = dir_bytes_len // ssz

    n_data = n_minifat_sect + n_mini_sect + n_big + n_dir
    n_fat = 1
    while (n_fat + n_data) * 4 > n_fat * ssz:
        n_fat += 1

    # sector ids
    fat_first = 0
    minifat_first = fat_first + n_fat
    mini_first = minifat_first + n_minifat_sect
    big_first = mini_first + n_mini_sect
    dir_first = big_first + n_big
    total = dir_first + n_dir

    fat = [_FREE] * (n_fat * ssz // 4)
    for i in range(n_fat):
        fat[fat_first + i] = _FATSECT

    def chain_in(first: int, count: int) -> None:
        for i in range(count):
            fat[first + i] = (first + i + 1) if i + 1 < count else _ENDCHAIN

    chain_in(minifat_first, n_minifat_sect)
    chain_in(mini_first, n_mini_sect)
    big_start: dict[str, int] = {}
    cur = big_first
    for (n, p, _s) in big_padded:
        cnt = len(p) // ssz
        big_start[n] = cur
        chain_in(cur, cnt)
        cur += cnt
    chain_in(dir_first, n_dir)

    dirents = [dirent("Root Entry", 5,
                      mini_first if n_mini_sect else _ENDCHAIN & 0xFFFFFFFF,
                      len(mini_bytes), child=1)]
    for (n, d) in streams:
        if len(d) >= MINI_CUTOFF:
            dirents.append(dirent(n, 2, big_start[n], len(d)))
        else:
            dirents.append(
                dirent(n, 2,
                       mini_start[n] if d else _ENDCHAIN & 0xFFFFFFFF,
                       len(d)))
    dir_blob = b"".join(dirents).ljust(dir_bytes_len, b"\0")

    header = bytearray(512)
    header[0:8] = MAGIC
    struct.pack_into("<H", header, 24, 0x003E)   # minor version
    struct.pack_into("<H", header, 26, 0x0003)   # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)   # little-endian
    struct.pack_into("<HH", header, 30, 9, 6)    # sector shifts
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, dir_first)
    struct.pack_into("<I", header, 56, MINI_CUTOFF)
    struct.pack_into("<II", header, 60,
                     minifat_first if n_minifat_sect else _ENDCHAIN,
                     n_minifat_sect)
    struct.pack_into("<II", header, 68, _ENDCHAIN, 0)  # no DIFAT sectors
    difat = [_FREE] * 109
    for i in range(n_fat):
        if i >= 109:
            raise CfbError("file too large for header-only DIFAT")
        difat[i] = fat_first + i
    struct.pack_into("<109I", header, 76, *difat)

    body = bytearray()
    body += b"".join(struct.pack("<I", v) for v in fat)
    body += minifat_bytes
    body += mini_bytes
    for (_n, p, _s) in big_padded:
        body += p
    body += dir_blob
    assert len(body) == total * ssz
    return bytes(header) + bytes(body)
