"""Pure-stdlib PNG codec (functions/png.py) + the real-codec multimodal
path: decode correctness across all five filter types, CRC/corruption
error paths, and end-to-end Spark thumbnails with REAL pixel stats."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from clip_retrieval_spark.functions.png import (
    PNG_SIGNATURE,
    _chunk,
    decode_png,
    encode_png,
    grid_luminance_features,
    resize_nearest,
)


def _gradient(h=16, w=24, ch=3):
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (y * 255 // max(h - 1, 1)).astype(np.uint8)
    b = ((x + y) * 255 // max(h + w - 2, 1)).astype(np.uint8)
    return np.stack([r, g, b][:ch], axis=-1)


def _encode_with_filter(arr: np.ndarray, ftype: int) -> bytes:
    """Reference filterer (forward direction, per RFC 2083) — encodes
    every scanline with one chosen filter so decode exercises that
    unfilter branch against known pixels."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w, ch = a.shape
    bpp = ch
    stride = w * bpp
    flat = a.reshape(h, stride).astype(np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    out = bytearray()
    for y in range(h):
        line = flat[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.int32), line[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
        if ftype == 0:
            enc = line
        elif ftype == 1:
            enc = line - left
        elif ftype == 2:
            enc = line - prev
        elif ftype == 3:
            enc = line - ((left + prev) >> 1)
        elif ftype == 4:
            p = left + prev - upleft
            pa, pb, pc = (
                np.abs(p - left), np.abs(p - prev), np.abs(p - upleft),
            )
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = line - pred
        out.append(ftype)
        out.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[ch],
                       0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out)))
        + _chunk(b"IEND", b"")
    )


def test_roundtrip_rgb():
    img = _gradient()
    out = decode_png(encode_png(img))
    assert out.shape == img.shape
    assert np.array_equal(out, img)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_all_filter_types_decode(ftype):
    img = _gradient(h=9, w=13)
    out = decode_png(_encode_with_filter(img, ftype))
    assert np.array_equal(out, img), f"filter {ftype}"


@pytest.mark.parametrize("ch", [1, 2, 4])
def test_gray_and_alpha_channels(ch):
    img = _gradient(ch=3)
    img = np.repeat(img[:, :, :1], ch, axis=2) if ch != 3 else img
    out = decode_png(encode_png(img))
    assert np.array_equal(out, img)


def test_palette_decode():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 128]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    data = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert np.array_equal(out, pal[idx])


def test_corrupt_inputs_raise():
    good = encode_png(_gradient())
    with pytest.raises(ValueError):
        decode_png(b"JFIF not a png")
    with pytest.raises(ValueError):
        decode_png(good[:40])  # truncated
    flipped = bytearray(good)
    flipped[50] ^= 0xFF  # inside IDAT/IHDR -> CRC must catch it
    with pytest.raises(ValueError):
        decode_png(bytes(flipped))
    # the documented contract is ValueError for EVERY malformed input,
    # including the ones whose naive failure mode is a different type:
    with pytest.raises(ValueError):
        # cut IEND (12 bytes) plus 2 bytes of IDAT's CRC: a truncated
        # CRC field mid-stream (was struct.error)
        decode_png(good[:-14])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bad_idat = (  # valid CRCs, garbage DEFLATE (was zlib.error)
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", b"\x00not deflate\xff")
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(bad_idat)
    pal_ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0)
    oob_palette = (  # index 5 into a 2-entry PLTE (was IndexError)
        PNG_SIGNATURE
        + _chunk(b"IHDR", pal_ihdr)
        + _chunk(b"PLTE", bytes(6))
        + _chunk(b"IDAT", zlib.compress(b"\x00\x05"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(oob_palette)


def test_resize_nearest_stats():
    img = _gradient(h=32, w=32)
    small = resize_nearest(img, 8, 8)
    assert small.shape == (8, 8, 3)
    # nearest-neighbor keeps the value range and the gradient direction
    assert small[:, 0, 0].max() < small[:, -1, 0].min()


def test_grid_luminance_is_content_derived():
    dark = np.zeros((16, 16, 3), dtype=np.uint8)
    light = np.full((16, 16, 3), 255, dtype=np.uint8)
    f_dark = grid_luminance_features(dark)
    f_light = grid_luminance_features(light)
    assert f_dark.shape == (16,)
    assert np.all(f_dark == 0.0) and np.all(f_light > 0.99)
    # left-to-right gradient -> grid columns increase
    g = grid_luminance_features(_gradient(h=16, w=16))
    assert g[0] < g[3] and g[12] < g[15]


def test_spark_thumbnails_have_real_pixels(spark):
    """End-to-end through the Spark operator: a PNG payload's thumbnail
    is a real PNG whose decoded pixel stats match the source image —
    the VERDICT 'value-real on at least one format' bar."""
    from clip_retrieval_spark.operators.multimodal import (
        extract_features,
        resize_thumbnails,
    )

    img = _gradient(h=40, w=40)
    png_payload = encode_png(img)
    rows = [
        (1, "image", bytearray(png_payload), 40, 40, None),
        (2, "image", bytearray(b"\xff\xd8JPEG-ish stub bytes"), 8, 8, None),
        (3, "image", bytearray(b""), None, None, None),  # corrupt
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, meta_width int, "
        "meta_height int, meta_duration_ms int",
    )
    thumbs = {r["media_id"]: r for r in resize_thumbnails(media, 16).collect()}
    t1 = decode_png(bytes(thumbs[1]["thumb"]))
    assert t1.shape == (16, 16, 3)
    # real pixel stats: thumbnail mean tracks the source mean closely
    assert abs(t1.mean() - img.mean()) < 8.0
    # the stub path stays a digest (not decodable as PNG)
    with pytest.raises(ValueError):
        decode_png(bytes(thumbs[2]["thumb"]))

    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    assert feats[1]["ok"] and feats[3]["ok"] is False
    # PNG features are unit-norm grid luminance — all non-negative
    # before normalization, so every component >= 0 (hash-stub features
    # are uniform pseudo-noise; gradient features must be monotone-ish)
    f1 = np.array(feats[1]["feature"])
    assert f1.shape == (16,) and np.all(f1 >= 0)
    assert abs(float(np.linalg.norm(f1)) - 1.0) < 1e-5


def test_fuzz_png_decoder_exception_contract():
    """Property: arbitrary mutations of a valid PNG either decode or
    raise ValueError/NotImplementedError — never struct.error /
    zlib.error / IndexError (the documented corrupt-row contract)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    base = encode_png(_gradient(h=12, w=12))

    @settings(max_examples=150, deadline=None)
    @given(
        pos=st.integers(0, len(base) - 1),
        val=st.integers(0, 255),
        cut=st.integers(0, len(base)),
    )
    def _one(pos, val, cut):
        mutated = bytearray(base[:cut] or b"\x00")
        if pos < len(mutated):
            mutated[pos] = val
        try:
            decode_png(bytes(mutated))
        except (ValueError, NotImplementedError):
            pass

    _one()
