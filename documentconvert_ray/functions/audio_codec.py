"""Pure-stdlib audio decoding — the REAL kernel behind the multimodal
audio stage for the stdlib-decodable format.

WAV/RIFF is parsed from its published wire layout (RIFF container →
fmt chunk → data chunk): sample rate, channels, bit depth and the raw
PCM payload all come from an actual chunk walk, exactly the parse a
real audio loader performs before DSP. Compressed codecs (MP3/AAC/...)
are genuinely unavailable in this environment; payloads that are not
RIFF/WAVE return None and the stage falls back to its declared
wire-byte path.

Reference parity: the reference treats non-document media as opaque
inputs routed to black-box converters (services/document_service.py
routing layer); this is the Ray-side analogue's first real stage.
"""

from __future__ import annotations

import struct

__all__ = ["WavInfo", "decode_wav", "avi_frame_count"]


class WavInfo:
    """Decoded WAV metadata + raw PCM bytes."""

    __slots__ = ("sample_rate", "channels", "bits", "pcm")

    def __init__(self, sample_rate: int, channels: int, bits: int,
                 pcm: bytes) -> None:
        self.sample_rate = sample_rate
        self.channels = channels
        self.bits = bits
        self.pcm = pcm

    @property
    def n_samples(self) -> int:
        bytes_per_frame = max(1, self.channels * (self.bits // 8))
        return len(self.pcm) // bytes_per_frame

    @property
    def duration_ms(self) -> int:
        if self.sample_rate <= 0:
            return 0
        return self.n_samples * 1000 // self.sample_rate


def avi_frame_count(payload: bytes) -> int | None:
    """REAL AVI (RIFF) video frame counter: walks the container's
    chunk tree — LIST chunks carry a 4CC list type and nest; the
    'movi' LIST holds the stream data whose '..dc'/'..db' (compressed/
    uncompressed video) chunks are the frames. Counting them is the
    container-level parse real tools perform without touching the
    codec payload. Returns None for non-AVI or structurally broken
    files."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"AVI ":
        return None
    n = len(payload)

    def walk(pos: int, end: int, in_movi: bool) -> int | None:
        frames = 0
        while pos + 8 <= end:
            tag = payload[pos:pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body = pos + 8
            if body + size > end:
                return None  # truncated chunk
            if tag == b"LIST":
                if size < 4:
                    return None
                ltype = payload[body:body + 4]
                sub = walk(body + 4, body + size,
                           in_movi or ltype == b"movi")
                if sub is None:
                    return None
                frames += sub
            elif in_movi and len(tag) == 4 and tag[2:4] in (b"dc", b"db"):
                frames += 1
            pos = body + size + (size & 1)  # word-align per spec
        return frames

    return walk(12, n, False)


def decode_wav(payload: bytes) -> WavInfo | None:
    """Walk the RIFF chunk structure: 12-byte RIFF/WAVE header, then
    (tag, size) chunks — fmt_ gives PCM format fields, data gives the
    sample payload (odd-sized chunks are word-padded per the spec).
    Returns None for non-RIFF payloads or structurally broken files —
    no guessing."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        return None
    n = len(payload)
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= n:
        tag = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body_at = pos + 8
        if body_at + size > n:
            return None  # truncated chunk
        if tag == b"fmt ":
            if size < 16:
                return None
            audio_fmt, channels, rate = struct.unpack_from(
                "<HHI", payload, body_at)
            bits = struct.unpack_from("<H", payload, body_at + 14)[0]
            if audio_fmt != 1 or channels == 0 or rate == 0 \
                    or bits not in (8, 16, 24, 32):
                return None  # only uncompressed PCM is decodable here
            fmt = (rate, channels, bits)
        elif tag == b"data":
            data = payload[body_at:body_at + size]
        pos = body_at + size + (size & 1)  # word-align per spec
    if fmt is None or data is None:
        return None
    rate, channels, bits = fmt
    return WavInfo(rate, channels, bits, data)
