"""WAV codec (functions/wav.py) + the value-real audio path through
the multimodal operators. Mirrors tests/test_png.py / test_jpeg.py:
round-trip goldens with explicit quantization bounds, G.711 decode
pinned to the canonical ITU constants, corrupt-input contract, fuzz,
and the Spark operator producing content-derived audio features."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from clip_retrieval_spark.functions.wav import (
    decode_wav,
    encode_wav,
    is_wav,
    waveform_features,
)


def _sine(freq=440.0, rate=8000, sec=0.5, amp=0.5):
    t = np.arange(int(rate * sec)) / rate
    return amp * np.sin(2 * np.pi * freq * t)


@pytest.mark.parametrize(
    "bits,maxerr",
    [(8, 1 / 120.0), (16, 1 / 30000.0), (24, 1e-6), (32, 1e-9)],
)
def test_pcm_roundtrip(bits, maxerr):
    sig = _sine()
    dec, rate = decode_wav(encode_wav(sig, 8000, bits=bits))
    assert rate == 8000
    assert dec.shape == (len(sig), 1)
    assert np.abs(dec[:, 0] - sig).max() <= maxerr


def test_float32_stereo_roundtrip_and_channel_order():
    left, right = _sine(300), _sine(700)
    enc = encode_wav(
        np.stack([left, right], axis=1), 44100, bits=32, ieee_float=True
    )
    dec, rate = decode_wav(enc)
    assert rate == 44100 and dec.shape == (len(left), 2)
    assert np.abs(dec[:, 0] - left).max() < 1e-6
    assert np.abs(dec[:, 1] - right).max() < 1e-6


def _g711_wav(audio_format: int, raw: bytes) -> bytes:
    fmt = struct.pack("<HHIIHH", audio_format, 1, 8000, 8000, 1, 8)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
        + (b"\x00" if len(raw) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_g711_canonical_constants():
    # public ITU G.711 reference points (e.g. the values every
    # alaw2linear/ulaw2linear implementation must produce)
    mu, _ = decode_wav(_g711_wav(7, bytes([0x00, 0x7F, 0xFF])))
    assert round(mu[0, 0] * 32768) == -32124  # most negative
    assert mu[1, 0] == 0.0  # negative zero
    assert mu[2, 0] == 0.0  # positive zero
    al, _ = decode_wav(_g711_wav(6, bytes([0x55, 0xD5, 0x2A, 0xAA])))
    assert round(al[0, 0] * 32768) == -8
    assert round(al[1, 0] * 32768) == 8
    assert round(al[2, 0] * 32768) == -32256  # most negative
    assert round(al[3, 0] * 32768) == 32256  # most positive


def test_g711_decode_is_odd_symmetric():
    # complementing the sign bit must negate the value, for all codes
    mu, _ = decode_wav(_g711_wav(7, bytes(range(256))))
    for u in range(128):
        assert mu[u, 0] == -mu[u ^ 0x80, 0]
    al, _ = decode_wav(_g711_wav(6, bytes(range(256))))
    for a in range(128):
        assert al[a, 0] == -al[a ^ 0x80, 0]


def test_extra_chunks_and_odd_padding_tolerated():
    sig = _sine(sec=0.01)
    enc = bytearray(encode_wav(sig, 8000, bits=16))
    # splice a LIST chunk with odd size (forces pad-byte handling)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    i = bytes(enc).index(b"fmt ")
    patched = bytes(enc[:i]) + extra + bytes(enc[i:])
    patched = (
        patched[:4]
        + struct.pack("<I", len(patched) - 8)
        + patched[8:]
    )
    dec, rate = decode_wav(patched)
    assert rate == 8000 and dec.shape == (len(sig), 1)


def test_corrupt_inputs_raise_valueerror():
    good = encode_wav(_sine(sec=0.01), 8000)
    with pytest.raises(ValueError):
        decode_wav(b"\x89PNG not audio")
    with pytest.raises(ValueError):
        decode_wav(good[: len(good) // 2])
    with pytest.raises(ValueError):
        decode_wav(good[:12])  # header only: no fmt/data
    with pytest.raises(ValueError):
        decode_wav(b"")


def test_unsupported_codings_raise_notimplemented():
    # ADPCM (format 2) and WAVE_FORMAT_EXTENSIBLE (0xFFFE)
    for code in (2, 0xFFFE):
        with pytest.raises(NotImplementedError):
            decode_wav(_g711_wav(code, b"\x00\x00"))


def test_fuzz_decoder_never_leaks_exceptions():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    base = encode_wav(_sine(sec=0.02), 8000, bits=16)

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
            decode_wav(bytes(mutated))
        except (ValueError, NotImplementedError):
            pass

    _one()


def test_waveform_features_track_content():
    quiet = waveform_features(_sine(amp=0.1)[:, None], 8000)
    loud = waveform_features(_sine(amp=0.9)[:, None], 8000)
    # RMS envelope bins (0..7) scale with amplitude
    assert all(loud[i] > quiet[i] * 5 for i in range(8))
    lowf = waveform_features(_sine(freq=100)[:, None], 8000)
    highf = waveform_features(_sine(freq=3500)[:, None], 8000)
    # zero-crossing bins (8..11) move with frequency
    assert all(highf[i] > lowf[i] * 10 for i in range(8, 12))
    # spectral band energy shifts from the lowest band to a higher one
    assert lowf[12] > highf[12]
    assert highf[15] > lowf[15]
    # stereo sig / -sig mono-mixes to silence (channel mixing is real)
    silent = waveform_features(
        np.stack([_sine(), -_sine()], axis=1), 8000
    )
    assert np.abs(silent[:8]).max() < 1e-12


def test_spark_audio_features_content_derived(spark):
    """End-to-end through extract_features: a WAV payload yields a
    feature vector matching waveform_features of the SOURCE samples
    (not a digest), ok=true; corrupt audio is a corrupt row; an ADPCM
    payload falls to the deterministic stub with ok=true."""
    from clip_retrieval_spark.operators.multimodal import extract_features

    sig = _sine()
    payload = encode_wav(sig, 8000, bits=16)
    rows = [
        (1, "audio", bytearray(payload), None, None, 500),
        (2, "audio", bytearray(b"RIFF\x10\x00\x00\x00WAVEjunk"), None,
         None, 10),
        (3, "audio", bytearray(_g711_wav(2, b"\x00\x00")), None, None, 10),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, meta_width int, "
        "meta_height int, meta_duration_ms int",
    )
    feats = {r["media_id"]: r for r in extract_features(media).collect()}
    dec, rate = decode_wav(payload)
    want = waveform_features(dec, rate)
    want = want / np.linalg.norm(want)
    got = np.array(feats[1]["feature"], dtype=np.float64)
    assert feats[1]["ok"] is True
    assert np.abs(got - want).max() < 1e-6
    assert feats[2]["ok"] is False
    assert feats[3]["ok"] is True  # declared-unsupported -> stub vector
    assert feats[3]["feature"] is not None
