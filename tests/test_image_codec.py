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
