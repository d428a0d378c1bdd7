"""Pure-stdlib WAV (RIFF/WAVE) audio codec + waveform featurizer.

The reference treats audio as an opaque modality (clip-retrieval embeds
images/text only); this engine's multimodal operators declared audio a
stub through round 4. WAV is public knowledge (RIFF container; PCM,
IEEE-float and G.711 sample codings), so — like functions/png.py and
functions/jpeg.py before it — the audio path is now value-real: WAV
payloads decode to actual samples and featurize from waveform content,
not a digest.

Supported: format 1 (PCM, 8-bit unsigned / 16 / 24 / 32-bit signed LE),
format 3 (IEEE float32/float64), format 6 (G.711 A-law) and format 7
(G.711 mu-law), mono or multi-channel, arbitrary extra RIFF chunks
(fact/LIST/...) with odd-size pad bytes. Unsupported codings (ADPCM,
MP3-in-WAV, WAVE_FORMAT_EXTENSIBLE) raise NotImplementedError;
malformed input raises ValueError (the corrupt-row contract of the
multimodal operators).

Performance note: decode is numpy-vectorized over the whole data chunk
(frombuffer + arithmetic) — no per-sample Python. Fine for the
clip-length payloads a Pandas-UDF batch carries.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"


def is_wav(data: bytes) -> bool:
    return (
        len(data) >= 12
        and bytes(data[:4]) == WAV_MAGIC
        and bytes(data[8:12]) == b"WAVE"
    )


# ---------------------------------------------------------------------------
# G.711 (ITU-T): companded 8-bit codings. Tables built once from the
# canonical segment/mantissa formulas — public-spec arithmetic, not a
# copied table.


def _mulaw_decode_table() -> np.ndarray:
    out = np.empty(256, dtype=np.int32)
    bias = 0x84
    for u in range(256):
        b = ~u & 0xFF
        sign = b & 0x80
        exp = (b >> 4) & 0x07
        mant = b & 0x0F
        x = (((mant << 3) + bias) << exp) - bias
        out[u] = -x if sign else x
    return out


def _alaw_decode_table() -> np.ndarray:
    out = np.empty(256, dtype=np.int32)
    for a in range(256):
        b = a ^ 0x55
        sign = b & 0x80
        exp = (b >> 4) & 0x07
        mant = b & 0x0F
        if exp == 0:
            x = (mant << 4) + 8
        else:
            x = ((mant << 4) + 0x108) << (exp - 1)
        # A-law transmits sign-bit 1 for POSITIVE values (opposite of
        # mu-law's complemented convention): 0xD5 -> +8, 0x55 -> -8
        out[a] = x if sign else -x
    return out


_MULAW = _mulaw_decode_table()  # +/- 32124 full scale
_ALAW = _alaw_decode_table()  # +/- 32256 full scale


# ---------------------------------------------------------------------------
# Decoder


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples, sample_rate).

    ``samples`` is float64 with shape (n_frames, n_channels) scaled to
    [-1, 1]. Raises ValueError on malformed input, NotImplementedError
    on unsupported sample codings."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("not bytes")
    data = bytes(data)
    if not is_wav(data):
        raise ValueError("not a WAV (missing RIFF/WAVE header)")

    fmt = None
    raw = None
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned

    if fmt is None:
        raise ValueError("missing fmt chunk")
    if raw is None:
        raise ValueError("missing data chunk")
    audio_format, n_ch, rate, _byte_rate, _block, bits = fmt
    if n_ch == 0 or rate == 0:
        raise ValueError("zero channels or sample rate")

    if audio_format == 1:  # PCM
        if bits == 8:
            x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            if len(raw) % 3:
                raise ValueError("data chunk not a whole number of samples")
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            v = (
                b[:, 0].astype(np.int64)
                | (b[:, 1].astype(np.int64) << 8)
                | (b[:, 2].astype(np.int64) << 16)
            )
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            x = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / float(
                1 << 31
            )
        else:
            raise NotImplementedError(f"{bits}-bit PCM")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(raw, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(raw, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"{bits}-bit IEEE float")
    elif audio_format == 6:  # G.711 A-law
        x = _ALAW[np.frombuffer(raw, dtype=np.uint8)] / 32768.0
    elif audio_format == 7:  # G.711 mu-law
        x = _MULAW[np.frombuffer(raw, dtype=np.uint8)] / 32768.0
    else:
        raise NotImplementedError(f"WAV audio format {audio_format}")

    if len(x) % n_ch:
        raise ValueError("data chunk not a whole number of frames")
    return x.reshape(-1, n_ch), rate


# ---------------------------------------------------------------------------
# Encoder (fixture generator + re-encode path)


def encode_wav(
    samples: np.ndarray, sample_rate: int, bits: int = 16,
    ieee_float: bool = False,
) -> bytes:
    """float samples in [-1, 1], shape (n,) or (n, channels) -> WAV
    bytes. ``bits``: 8/16/24/32 PCM, or 32 with ieee_float=True."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.shape[0] == 0 or arr.shape[1] == 0:
        raise ValueError("expected (n,) or (n, channels) samples")
    if sample_rate <= 0:
        raise ValueError("sample rate must be positive")
    n_ch = arr.shape[1]
    flat = np.clip(arr, -1.0, 1.0).reshape(-1)

    if ieee_float:
        if bits != 32:
            raise ValueError("ieee_float supports bits=32 only")
        audio_format, payload = 3, flat.astype("<f4").tobytes()
    elif bits == 8:
        audio_format = 1
        payload = (
            np.clip(np.round(flat * 128.0 + 128.0), 0, 255)
            .astype(np.uint8)
            .tobytes()
        )
    elif bits == 16:
        audio_format = 1
        payload = (
            np.clip(np.round(flat * 32768.0), -32768, 32767)
            .astype("<i2")
            .tobytes()
        )
    elif bits == 24:
        audio_format = 1
        v = np.clip(
            np.round(flat * float(1 << 23)), -(1 << 23), (1 << 23) - 1
        ).astype(np.int64)
        v = np.where(v < 0, v + (1 << 24), v)
        b = np.empty((len(v), 3), dtype=np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        payload = b.tobytes()
    elif bits == 32:
        audio_format = 1
        payload = (
            np.clip(
                np.round(flat * float(1 << 31)), -(1 << 31), (1 << 31) - 1
            )
            .astype("<i4")
            .tobytes()
        )
    else:
        raise ValueError(f"unsupported bits {bits}")

    block = n_ch * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", audio_format, n_ch, sample_rate,
        sample_rate * block, block, bits,
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) & 1 else b"")
    )
    return (
        b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    )


# ---------------------------------------------------------------------------
# Featurizer: 16 content-derived dimensions (the audio analog of
# png.grid_luminance_features)


def waveform_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """(n, ch) samples -> 16-dim feature vector: 8 RMS-envelope bins,
    4 zero-crossing-rate bins, 4 octave-spaced spectral band energies.
    Pure numpy, deterministic, content-derived — a louder / brighter /
    busier signal measurably moves the dimensions it should."""
    if samples.ndim != 2 or samples.shape[0] == 0:
        raise ValueError("empty audio")
    mono = samples.mean(axis=1)
    n = len(mono)

    def _seg(k: int):
        edges = np.linspace(0, n, k + 1).astype(np.int64)
        return [mono[edges[i] : max(edges[i + 1], edges[i] + 1)]
                for i in range(k)]

    rms = [float(np.sqrt(np.mean(s * s))) for s in _seg(8)]
    zcr = [
        float(np.mean(np.abs(np.diff(np.signbit(s).astype(np.int8)))))
        if len(s) > 1 else 0.0
        for s in _seg(4)
    ]
    spec = np.abs(np.fft.rfft(mono))
    bands = []
    hi = len(spec)
    for b in range(4):
        lo_i = hi * (2**b - 1) // 15
        hi_i = hi * (2 ** (b + 1) - 1) // 15
        seg = spec[lo_i : max(hi_i, lo_i + 1)]
        bands.append(float(np.sqrt(np.mean(seg * seg))) / n)
    return np.array(rms + zcr + bands, dtype=np.float64)
