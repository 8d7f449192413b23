"""Multimodal (image/audio/video) stage plumbing.

Payloads are opaque ``binary`` columns with typed metadata; every
stage is an actor-pool map_batches over small batches (payload bytes
are large — SURVEY guide on memory-aware batch sizing). Each modality
has a REAL wire-format kernel:

- image: decode (PPM/PGM, BMP, PNG incl. full pixel unfilter,
  baseline grayscale JPEG incl. full Huffman entropy decode + IDCT,
  GIF dims — functions/image_codec.py), nearest-neighbor pixel
  RESAMPLING, and md5-over-decoded-pixels features;
- audio: WAV/RIFF chunk-walk decode + integer-exact PCM loudness DSP
  (functions/audio_codec.py);
- video: container-level frame counting for animated GIF and AVI
  (block/RIFF-tree walks — how real tools count frames without
  codec decode).

Payloads no kernel recognizes fall back to a clearly-marked
deterministic stub, the swap-point for codec LIBRARIES (color-JPEG
chroma pipelines, MP3/H.264 payload decode) that are genuinely
unavailable in this environment (SURVEY.md env facts).

The reference's analogue is the image→markdown OCR leg
(services/document_service.py:826-907, mineru CLI subprocess) which is
likewise a black-box decode step behind a routing layer.
"""

from __future__ import annotations

import pyarrow as pa

# PIL/ffmpeg-class libraries absent; the stdlib image_codec decoders
# below are real regardless — this flag only gates the library-backed
# fallback for formats the stdlib path cannot parse
REAL_CODECS_AVAILABLE = False


def _fake_decode_dims(payload: bytes) -> tuple[int, int, int]:
    """STUB decode for unrecognized payloads: deterministic dims from
    byte length — replace with a library codec when one exists. Kept
    arithmetic-simple so the SQL oracle can express it exactly
    (pipelines/queries.py)."""
    n = len(payload)
    width = 64 + (n % 512)
    height = 64 + ((n * 7) % 512)
    channels = 3
    return width, height, channels


class ImageDecodeStage:
    """Actor-pool decoder: __init__ binds the codec table once per
    actor; __call__ decodes a batch of binary payloads to metadata
    (width, height, channels, n_bytes = DECODED buffer size w*h*c for
    real decodes / wire size for stub rows).

    Real kernel: functions/image_codec.decode_image — actual header
    (and for PNG, pixel) parsing of PPM/PGM/BMP/PNG/GIF/JPEG. With
    codec libraries this is also where PIL/turbojpeg handles would
    live; batch sizes stay small because payload bytes are large
    (SURVEY guide: memory-aware batch sizing for binary columns)."""

    def __init__(self) -> None:
        from ..functions.image_codec import decode_image

        if REAL_CODECS_AVAILABLE:  # pragma: no cover
            raise NotImplementedError("wire a library codec here")
        self._decode = decode_image
        self._fallback = _fake_decode_dims

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        ws: list[int] = []
        hs: list[int] = []
        cs: list[int] = []
        nb: list[int] = []
        for p in payloads:
            p = p or b""
            info = self._decode(p)
            if info is not None:
                ws.append(info.width)
                hs.append(info.height)
                cs.append(info.channels)
                nb.append(info.n_bytes)
            else:
                w, h, c = self._fallback(p)
                ws.append(w)
                hs.append(h)
                cs.append(c)
                nb.append(len(p))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "channels": pa.array(cs, pa.int64()),
                "n_bytes": pa.array(nb, pa.int64()),
            }
        )


class FrameSampleStage:
    """Frame sampler: emits one row per sampled frame index — the
    flat_map-shaped stage a real pipeline needs for frame-level work.
    The frame count is REAL for two real container formats: animated
    GIFs (functions/image_codec.gif_frame_count — image-descriptor
    block walk, no LZW decode) and AVI video
    (functions/audio_codec.avi_frame_count — RIFF tree walk counting
    the movi LIST's video chunks, no codec decode), exactly how real
    tools count frames. Unrecognized payloads fall back to the
    declared deterministic stub. Sampling is every ``stride``-th
    frame; rows are flagged kind='gif'/'avi'/'stub'."""

    def __init__(self, stride: int = 10) -> None:
        from ..functions.audio_codec import avi_frame_count
        from ..functions.image_codec import gif_frame_count

        self.stride = stride
        self._gif = gif_frame_count
        self._avi = avi_frame_count

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, kinds, frames = [], [], []
        for doc_id, p in zip(batch.column("doc_id").to_pylist(),
                             batch.column("payload").to_pylist()):
            p = p or b""
            nf = self._gif(p)
            if nf is not None:
                kind = "gif"
            else:
                nf = self._avi(p)
                if nf is not None:
                    kind = "avi"
                else:
                    kind = "stub"
                    nf = 1 + (len(p) % 300)
            for f in range(0, nf, self.stride):
                doc_ids.append(doc_id)
                kinds.append(kind)
                frames.append(f)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "frame_idx": pa.array(frames, pa.int64()),
            }
        )


class ImageResampleStage:
    """REAL thumbnailer: decodes raster payloads to pixels
    (functions/image_codec.decode_pixels) and NEAREST-NEIGHBOR
    resamples them to an aspect-preserving max_side bound — integer
    index math ((i·src)//dst), so a SQL oracle reproduces the exact
    output buffer. The signature is the md5 of the (possibly
    resampled) pixel buffer via its uppercase-hex encoding.

    Payloads without a pixel decode keep their REAL header dims when
    available (color JPEG/GIF via decode_image — no chroma/LZW
    pipeline here) or the declared stub dims otherwise; their dims still run
    the resize arithmetic (a thumbnail *plan*), the signature covers
    the wire bytes, and the row is flagged kind='wire'."""

    def __init__(self, max_side: int = 224) -> None:
        import hashlib

        from ..functions.image_codec import decode_image, decode_pixels

        self.max_side = max_side
        self._pixels = decode_pixels
        self._dims = decode_image
        self._md5 = hashlib.md5

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        ms = self.max_side
        kinds: list[str] = []
        ws: list[int] = []
        hs: list[int] = []
        rs: list[bool] = []
        sigs: list[str] = []
        for p in batch.column("payload").to_pylist():
            p = p or b""
            px = self._pixels(p)
            if px is not None:
                info, buf = px
                w, h, ch = info.width, info.height, info.channels
                m = max(w, h)
                if m > ms:
                    nw, nh = w * ms // m, h * ms // m
                    arr = np.frombuffer(buf, np.uint8).reshape(h, w, ch)
                    ri = (np.arange(nh) * h) // nh
                    ci = (np.arange(nw) * w) // nw
                    buf = arr[ri][:, ci].tobytes()
                else:
                    nw, nh = w, h
                kinds.append("pixels")
                rs.append(m > ms)
                ws.append(nw)
                hs.append(nh)
                sigs.append(
                    self._md5(buf.hex().upper().encode()).hexdigest()[:16])
            else:
                info = self._dims(p)
                if info is not None:
                    w, h = info.width, info.height
                else:
                    w, h, _c = _fake_decode_dims(p)
                m = max(w, h)
                if m > ms:
                    nw, nh = w * ms // m, h * ms // m
                else:
                    nw, nh = w, h
                kinds.append("wire")
                rs.append(m > ms)
                ws.append(nw)
                hs.append(nh)
                sigs.append(
                    self._md5(p.hex().upper().encode()).hexdigest()[:16])
        return pa.Table.from_pydict(
            {"doc_id": batch.column("doc_id"),
             "kind": pa.array(kinds, pa.string()),
             "width": pa.array(ws, pa.int64()),
             "height": pa.array(hs, pa.int64()),
             "resized": pa.array(rs, pa.bool_()),
             "sig": pa.array(sigs, pa.string())})


class OcrStage:
    """Text-from-pixels OCR over the corpus's bitmap-font slice — the
    leg that closes the reference's image→markdown path
    (services/document_service.py:826-907, `mineru` subprocess) on
    this environment's terms (no OCR model ships here; VERDICT r4
    task 3). __init__ binds the decoder + the shared glyph table once
    per actor; __call__ decodes each PNG payload to grayscale pixels
    (the REAL inflate+unfilter chain) and nearest-template-matches
    every 8×8 cell (functions/ocr) — byte-exact on clean glyphs,
    noise-proof up to OCR_NOISE_BUDGET flipped pixels per cell.
    Rows: kind='ocr' (clean) / 'ocr_noisy' (the planted noisy slice
    still recovers exactly) / 'no_image' (nothing to render) /
    'bad_strip' (decodable image that is not an 8-row glyph strip —
    a ROW-level value, never a task failure; the M9/M11 error
    philosophy)."""

    def __init__(self) -> None:
        from ..functions.image_codec import decode_pixels
        from ..functions.ocr import ocr_gray_row

        self._pixels = decode_pixels
        self._ocr = ocr_gray_row

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds: list[str] = []
        texts: list[str] = []
        noisy = batch.column("noisy").to_pylist()
        for p, nz in zip(batch.column("payload").to_pylist(), noisy):
            p = p or b""
            px = self._pixels(p)
            if px is None:
                kinds.append("no_image")
                texts.append("")
                continue
            info, buf = px
            try:
                text = self._ocr(buf, info.width)
            except ValueError:
                kinds.append("bad_strip")
                texts.append("")
                continue
            kinds.append("ocr_noisy" if nz else "ocr")
            texts.append(text)
        return pa.Table.from_pydict(
            {"doc_id": batch.column("doc_id"),
             "kind": pa.array(kinds, pa.string()),
             "ocr_text": pa.array(texts, pa.string())})


class AudioDecodeStage:
    """Actor-pool audio decoder — the REAL kernel is a RIFF/WAV chunk
    walk (functions/audio_codec.decode_wav): sample rate, channels,
    bit depth, sample count and duration all come from the actual wire
    layout, and the signature is the md5 of the raw PCM payload via
    its uppercase-hex encoding (SQL-mirrorable, same convention as the
    image kernels). Non-RIFF payloads (compressed codecs are genuinely
    unavailable here) fall back to wire-byte metadata, flagged
    kind='wire'."""

    def __init__(self) -> None:
        import hashlib

        from ..functions.audio_codec import decode_wav

        self._decode = decode_wav
        self._md5 = hashlib.md5

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds: list[str] = []
        rates: list[int] = []
        chans: list[int] = []
        nsamp: list[int] = []
        durms: list[int] = []
        sigs: list[str] = []
        for p in batch.column("payload").to_pylist():
            p = p or b""
            w = self._decode(p)
            if w is not None:
                kinds.append("wav")
                rates.append(w.sample_rate)
                chans.append(w.channels)
                nsamp.append(w.n_samples)
                durms.append(w.duration_ms)
                buf = w.pcm
            else:
                kinds.append("wire")
                rates.append(0)
                chans.append(0)
                nsamp.append(0)
                durms.append(0)
                buf = p
            sigs.append(
                self._md5(buf.hex().upper().encode()).hexdigest()[:16])
        return pa.Table.from_pydict(
            {"doc_id": batch.column("doc_id"),
             "kind": pa.array(kinds, pa.string()),
             "sample_rate": pa.array(rates, pa.int64()),
             "channels": pa.array(chans, pa.int64()),
             "n_samples": pa.array(nsamp, pa.int64()),
             "duration_ms": pa.array(durms, pa.int64()),
             "sig": pa.array(sigs, pa.string())})


class AudioFeatureStage:
    """REAL audio DSP over decoded PCM: int16 little-endian samples
    (numpy frombuffer) → integer-exact loudness statistics — Σ|x|,
    Σx² (int64-safe: 32767² ≈ 10⁹ per sample) and peak |x| — the
    integer core of an RMS/clipping audit. Non-RIFF payloads emit the
    declared zero row, flagged kind='wire'."""

    def __init__(self) -> None:
        from ..functions.audio_codec import decode_wav

        self._decode = decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        kinds: list[str] = []
        ns: list[int] = []
        sabs: list[int] = []
        ssq: list[int] = []
        peak: list[int] = []
        for p in batch.column("payload").to_pylist():
            p = p or b""
            w = self._decode(p)
            if w is not None and w.bits == 16:
                x = np.frombuffer(
                    w.pcm[: (len(w.pcm) // 2) * 2], dtype="<i2"
                ).astype(np.int64)
                a = np.abs(x)
                kinds.append("wav")
                ns.append(len(x))
                sabs.append(int(a.sum()))
                ssq.append(int((x * x).sum()))
                peak.append(int(a.max()) if len(a) else 0)
            else:
                kinds.append("wire")
                ns.append(0)
                sabs.append(0)
                ssq.append(0)
                peak.append(0)
        return pa.Table.from_pydict(
            {"doc_id": batch.column("doc_id"),
             "kind": pa.array(kinds, pa.string()),
             "n_samples": pa.array(ns, pa.int64()),
             "sum_abs": pa.array(sabs, pa.int64()),
             "sum_sq": pa.array(ssq, pa.int64()),
             "peak": pa.array(peak, pa.int64())})


class FeatureExtractStage:
    """Feature-extraction stage: payload → compact feature row. The
    kernel is REAL for fully-decodable rasters (PPM/BMP/PNG via
    functions/image_codec.decode_pixels, incl. baseline grayscale
    JPEG): the signature is the md5 of the DECODED pixel buffer
    (hashed via its uppercase-hex encoding so a SQL oracle can
    reproduce it with md5(to_hex(...))) and n_units is the decoded
    pixel-byte count. Header-only classes (color JPEG — no chroma
    pipeline here) and unrecognized payloads fall back to the
    same signature over the WIRE bytes, flagged kind='wire'. Swap-point
    for a real embedding model stays the same __call__; the Ray shape
    (batched actor-pool inference, small output rows) is unchanged."""

    def __init__(self) -> None:
        import hashlib

        from ..functions.image_codec import decode_pixels

        self._md5 = hashlib.md5
        self._pixels = decode_pixels

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds: list[str] = []
        sigs: list[str] = []
        n_units: list[int] = []
        for p in batch.column("payload").to_pylist():
            p = p or b""
            px = self._pixels(p)
            if px is not None:
                buf = px[1]
                kinds.append("pixels")
            else:
                buf = p
                kinds.append("wire")
            sigs.append(self._md5(buf.hex().upper().encode()).hexdigest()[:16])
            n_units.append(len(buf))
        return pa.Table.from_pydict(
            {"doc_id": batch.column("doc_id"),
             "kind": pa.array(kinds, pa.string()),
             "feature_sig": pa.array(sigs, pa.string()),
             "n_units": pa.array(n_units, pa.int64())})
