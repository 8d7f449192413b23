"""Real stdlib image decode (functions/image_codec.py) against the
independently written encode side (sources/corpus.synth_image)."""

from documentconvert_ray.functions.image_codec import (
    decode_image,
    decode_png_pixels,
)
from documentconvert_ray.sources.corpus import synth_image


def test_dims_roundtrip_all_formats():
    fill = b"the quick brown fox 0123456789"
    for fmt, channels in (("ppm", 3), ("bmp", 3), ("png", 1),
                          ("jpeg", 3)):
        for w, h in ((1, 1), (4, 7), (63, 5), (60, 64), (224, 3)):
            payload = synth_image(fmt, w, h, fill)
            info = decode_image(payload)
            assert info is not None, (fmt, w, h)
            assert (info.width, info.height, info.channels) \
                == (w, h, channels), fmt
            assert info.n_bytes == w * h * channels


def test_png_pixels_roundtrip():
    """Full PNG decode (inflate + None/Sub/Up unfilter) reproduces the
    tiled source bytes exactly — the kernel is real, not a header
    sniff."""
    fill = bytes(range(7, 250, 3))
    for w, h in ((5, 9), (60, 64), (1, 3)):
        payload = synth_image("png", w, h, fill)
        out = decode_png_pixels(payload)
        assert out is not None
        info, pixels = out
        assert (info.width, info.height, info.channels) == (w, h, 1)
        expected = b"".join(
            (fill * (w // len(fill) + 1))[:w] for _ in range(h))
        assert pixels == expected


def test_gif_dims():
    gif = b"GIF89a" + (320).to_bytes(2, "little") \
        + (200).to_bytes(2, "little") + b"\x00\x00\x00"
    info = decode_image(gif)
    assert (info.width, info.height, info.channels) == (320, 200, 3)


def test_pgm_gray():
    pgm = b"P5\n10 4\n255\n" + bytes(40)
    info = decode_image(pgm)
    assert (info.width, info.height, info.channels) == (10, 4, 1)


def test_tiff_ifd_walk_both_endians():
    """TIFF metadata decode: little- and big-endian IFD walks against
    the independently written encode side; truncated and tag-less
    streams refuse."""
    fill = b"tiff strip bytes"
    for fmt in ("tiff", "tiff_be"):
        for w, h in ((1, 1), (17, 9), (640, 480)):
            info = decode_image(synth_image(fmt, w, h, fill))
            assert info is not None, (fmt, w, h)
            assert (info.width, info.height, info.channels) == (w, h, 3)
    full = synth_image("tiff", 8, 8, fill)
    # IFD offset past the payload → None
    assert decode_image(full[:6]) is None
    # entry table truncated mid-record → None
    assert decode_image(full[:14]) is None
    # header magic only (II but wrong version word) → None
    assert decode_image(b"II+\x00" + full[4:]) is None


def test_unrecognized_and_truncated_return_none():
    assert decode_image(b"") is None
    assert decode_image(b"plain text payload, no magic") is None
    # truncated raster → None (no lying about undecodable payloads)
    ppm = synth_image("ppm", 8, 8, b"x")
    assert decode_image(ppm[: len(ppm) // 2]) is None
    # BMP with an unsupported bpp → None
    bmp = bytearray(synth_image("bmp", 4, 4, b"x"))
    bmp[28] = 4  # 4-bit palette
    assert decode_image(bytes(bmp)) is None
    # JPEG without a SOF marker → None
    assert decode_image(b"\xff\xd8\xff\xd9") is None


def test_jpeg_progressive_sof2():
    sof2 = (b"\xff\xd8"
            + b"\xff\xc2" + (11).to_bytes(2, "big") + b"\x08"
            + (33).to_bytes(2, "big") + (44).to_bytes(2, "big")
            + b"\x01\x01\x11\x00" + b"\xff\xd9")
    info = decode_image(sof2)
    assert (info.width, info.height, info.channels) == (44, 33, 1)


def test_decode_pixels_ppm_bmp_png():
    """decode_pixels returns the exact row-major raster for every
    fully-decodable format; header-only formats return None."""
    from documentconvert_ray.functions.image_codec import decode_pixels

    fill = b"tiled pixel source bytes \x00\xff\x80"
    for w, h in ((1, 1), (5, 9), (31, 4)):
        # PPM: one continuous tile over the whole raster
        info, px = decode_pixels(synth_image("ppm", w, h, fill))
        n = w * h * 3
        assert (info.width, info.height, info.channels) == (w, h, 3)
        assert px == (fill * (n // len(fill) + 1))[:n]
        # BMP: each row restarts the tile; padding stripped
        info, px = decode_pixels(synth_image("bmp", w, h, fill))
        row = (fill * (w * 3 // len(fill) + 1))[: w * 3]
        assert (info.width, info.height, info.channels) == (w, h, 3)
        assert px == row * h
        # PNG grayscale: each row restarts the tile
        info, px = decode_pixels(synth_image("png", w, h, fill))
        grow = (fill * (w // len(fill) + 1))[:w]
        assert (info.width, info.height, info.channels) == (w, h, 1)
        assert px == grow * h
    # header-only / unrecognized → None (wire fallback upstream)
    assert decode_pixels(synth_image("jpeg", 8, 8, fill)) is None
    assert decode_pixels(b"no image magic here") is None
    assert decode_pixels(b"") is None


def test_bmp_pixels_bottom_up_flip():
    """A hand-built BMP with DISTINCT rows verifies the bottom-up →
    top-down flip (synth_image's identical rows can't catch it)."""
    import struct

    from documentconvert_ray.functions.image_codec import decode_pixels

    w, h = 2, 3
    rows_topdown = [bytes([i] * 6) for i in (1, 2, 3)]
    row_size = w * 3
    pad = (-row_size) % 4
    img = b"".join(r + b"\x00" * pad for r in reversed(rows_topdown))
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                           len(img), 0, 0, 0, 0)
    bmp = (b"BM" + (54 + len(img)).to_bytes(4, "little")
           + b"\x00\x00\x00\x00" + (54).to_bytes(4, "little") + info_hdr
           + img)
    info, px = decode_pixels(bmp)
    assert (info.width, info.height) == (w, h)
    assert px == b"".join(rows_topdown)


def test_feature_stage_real_pixels():
    """FeatureExtractStage hashes DECODED pixels for raster payloads
    and wire bytes otherwise, with the hex-domain md5 the SQL oracle
    mirrors."""
    import hashlib

    import pyarrow as pa

    from documentconvert_ray.stages.multimodal import FeatureExtractStage

    fill = b"payload body 123"
    ppm = synth_image("ppm", 4, 4, fill)
    jpg = synth_image("jpeg", 4, 4, fill)
    batch = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "payload": pa.array([ppm, jpg], pa.binary())})
    out = FeatureExtractStage()(batch)
    kinds = out.column("kind").to_pylist()
    sigs = out.column("feature_sig").to_pylist()
    units = out.column("n_units").to_pylist()
    assert kinds == ["pixels", "wire"]
    raster = (fill * (48 // len(fill) + 1))[:48]
    assert sigs[0] == hashlib.md5(
        raster.hex().upper().encode()).hexdigest()[:16]
    assert units == [48, len(jpg)]
    assert sigs[1] == hashlib.md5(
        jpg.hex().upper().encode()).hexdigest()[:16]


def test_resample_stage_nearest_neighbor_exact():
    """ImageResampleStage reproduces a hand-computed NN resample on an
    image with DISTINCT pixels (synth_image's identical rows would
    mask row-index errors)."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from documentconvert_ray.stages.multimodal import ImageResampleStage

    w, h = 8, 6
    raster = bytes(range(w * h * 3))  # all-distinct pixel bytes
    ppm = b"P6\n%d %d\n255\n" % (w, h) + raster
    stage = ImageResampleStage(4)
    out = stage(pa.table({"doc_id": pa.array([7], pa.int64()),
                          "payload": pa.array([ppm], pa.binary())}))
    assert out.column("kind").to_pylist() == ["pixels"]
    assert out.column("resized").to_pylist() == [True]
    nw, nh = out.column("width")[0].as_py(), out.column("height")[0].as_py()
    assert (nw, nh) == (8 * 4 // 8, 6 * 4 // 8)  # (4, 3)
    arr = np.frombuffer(raster, np.uint8).reshape(h, w, 3)
    ri = (np.arange(nh) * h) // nh
    ci = (np.arange(nw) * w) // nw
    expect = arr[ri][:, ci].tobytes()
    assert out.column("sig").to_pylist() == [
        hashlib.md5(expect.hex().upper().encode()).hexdigest()[:16]]
    # below the bound: untouched buffer, resized=False
    out2 = ImageResampleStage(64)(
        pa.table({"doc_id": pa.array([7], pa.int64()),
                  "payload": pa.array([ppm], pa.binary())}))
    assert out2.column("resized").to_pylist() == [False]
    assert out2.column("sig").to_pylist() == [
        hashlib.md5(raster.hex().upper().encode()).hexdigest()[:16]]


def test_gif_frame_count_block_walk():
    """gif_frame_count walks the real GIF89a block structure: counts
    image descriptors through extensions, color tables and sub-block
    chains; refuses broken streams."""
    from documentconvert_ray.functions.image_codec import gif_frame_count
    from documentconvert_ray.sources.corpus import synth_gif_anim

    for nf in (1, 2, 7, 29):
        assert gif_frame_count(synth_gif_anim(8, 8, nf, b"abc")) == nf
    # global color table path: patch flags + insert a 6-byte GCT
    g = bytearray(synth_gif_anim(4, 4, 3, b"xy"))
    g[10] |= 0x80  # GCT present, depth 0 → 3*2 bytes
    g2 = bytes(g[:13]) + b"\x01\x02\x03\x04\x05\x06" + bytes(g[13:])
    assert gif_frame_count(g2) == 3
    # truncated stream (no trailer) and non-GIF → None
    full = synth_gif_anim(8, 8, 4, b"abc")
    assert gif_frame_count(full[:-2]) is None
    assert gif_frame_count(b"not a gif") is None
    assert gif_frame_count(b"") is None


def test_frame_sample_stage_real_gif():
    """FrameSampleStage uses the REAL block-walk count for GIF
    payloads and the declared stub for raw bytes."""
    import pyarrow as pa

    from documentconvert_ray.sources.corpus import synth_gif_anim
    from documentconvert_ray.stages.multimodal import FrameSampleStage

    gif = synth_gif_anim(8, 8, 25, b"abc")
    raw = b"x" * 42
    out = FrameSampleStage(stride=10)(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "payload": pa.array([gif, raw], pa.binary())}))
    rows = list(zip(out.column("doc_id").to_pylist(),
                    out.column("kind").to_pylist(),
                    out.column("frame_idx").to_pylist()))
    assert rows == [(0, "gif", 0), (0, "gif", 10), (0, "gif", 20),
                    (1, "stub", 0), (1, "stub", 10), (1, "stub", 20),
                    (1, "stub", 30), (1, "stub", 40)]


def test_wav_decode_riff_walk():
    """decode_wav parses real RIFF structure: fmt fields, data PCM,
    word-padding, and refuses non-PCM/truncated/garbage payloads."""
    import struct

    from documentconvert_ray.functions.audio_codec import decode_wav
    from documentconvert_ray.sources.corpus import synth_wav

    fill = b"pcm source bytes \x01\x80\xff"
    w = decode_wav(synth_wav(16000, 333, fill))
    assert (w.sample_rate, w.channels, w.bits) == (16000, 1, 16)
    assert w.n_samples == 333
    assert w.duration_ms == 333 * 1000 // 16000
    assert w.pcm == (fill * (666 // len(fill) + 1))[:666]
    # odd data size exercises the word-align path
    w2 = decode_wav(synth_wav(8000, 7, b"xyz"))  # 14 PCM bytes (even)
    assert w2.n_samples == 7
    # an extra LIST chunk before fmt/data still parses
    raw = synth_wav(8000, 4, b"ab")
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = raw[:12] + extra + raw[12:]
    patched = patched[:4] + struct.pack(
        "<I", len(patched) - 8) + patched[8:]
    w3 = decode_wav(patched)
    assert w3 is not None and w3.n_samples == 4
    # refusals: truncated, non-PCM format code, garbage
    assert decode_wav(raw[: len(raw) // 2]) is None
    bad = bytearray(raw)
    bad[20] = 3  # IEEE float format
    assert decode_wav(bytes(bad)) is None
    assert decode_wav(b"not riff") is None
    assert decode_wav(b"") is None


def test_audio_feature_stage_exact_dsp():
    """AudioFeatureStage's loudness stats equal hand-computed values
    on a WAV with known positive AND negative samples."""
    import struct

    import pyarrow as pa

    from documentconvert_ray.stages.multimodal import AudioFeatureStage

    samples = [0, 1, -1, 32767, -32768, 1000, -999]
    pcm = struct.pack("<%dh" % len(samples), *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    out = AudioFeatureStage()(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "payload": pa.array([wav, b"not riff"], pa.binary())}))
    assert out.column("kind").to_pylist() == ["wav", "wire"]
    assert out.column("n_samples").to_pylist() == [7, 0]
    assert out.column("sum_abs").to_pylist() == [
        sum(abs(s) for s in samples), 0]
    assert out.column("sum_sq").to_pylist() == [
        sum(s * s for s in samples), 0]
    assert out.column("peak").to_pylist() == [32768, 0]


def test_avi_frame_count_riff_tree():
    """avi_frame_count counts movi video chunks through the nested
    LIST tree; hdrl chunks don't count; broken streams refuse."""
    from documentconvert_ray.functions.audio_codec import avi_frame_count
    from documentconvert_ray.sources.corpus import synth_avi

    for nf in (1, 3, 17, 39):
        assert avi_frame_count(synth_avi(nf, b"frame")) == nf
    full = synth_avi(5, b"x")
    assert avi_frame_count(full[:-3]) is None  # truncated
    assert avi_frame_count(b"RIFF\x04\x00\x00\x00WAVE") is None  # not AVI
    assert avi_frame_count(b"") is None


def test_frame_sample_stage_avi_leg():
    import pyarrow as pa

    from documentconvert_ray.sources.corpus import synth_avi
    from documentconvert_ray.stages.multimodal import FrameSampleStage

    avi = synth_avi(23, b"p")
    out = FrameSampleStage(stride=10)(
        pa.table({"doc_id": pa.array([5], pa.int64()),
                  "payload": pa.array([avi], pa.binary())}))
    assert out.column("kind").to_pylist() == ["avi"] * 3
    assert out.column("frame_idx").to_pylist() == [0, 10, 20]
