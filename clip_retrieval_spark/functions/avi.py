"""Pure-stdlib AVI (RIFF) container codec for MJPEG video.

Completes the modality triptych (PNG/JPEG images, WAV audio, now
video): AVI is the same RIFF chunk grammar as WAV, and Motion-JPEG
frames are baseline JPEGs — which functions/jpeg.py already decodes —
so MJPEG-in-AVI video payloads are value-real end to end: the
multimodal operators emit ACTUAL frame bytes and frame-content
features, not digests. All structures are public knowledge (RIFF/AVI
chunk layout, MainAVIHeader / AVIStreamHeader / BITMAPINFOHEADER).

Supported: single 'vids' stream, MJPG fourcc, '##dc' frame chunks,
arbitrary extra chunks (idx1, INFO, JUNK) tolerated. Other codecs
(cvid, DIB, h264, ...) raise NotImplementedError — the documented
swap-in is ffmpeg on a real cluster; malformed input raises ValueError
(the corrupt-row contract).
"""

from __future__ import annotations

import struct

import numpy as np

from clip_retrieval_spark.functions import jpeg

AVI_MAGIC = b"RIFF"


def is_avi(data: bytes) -> bool:
    return (
        len(data) >= 12
        and bytes(data[:4]) == AVI_MAGIC
        and bytes(data[8:12]) == b"AVI "
    )


def _chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) walking a chunk list."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + size > end:
            raise ValueError(f"truncated {cid!r} chunk")
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi(data: bytes) -> dict:
    """AVI bytes -> {"frames": [jpeg bytes...], "fps": float,
    "width": int, "height": int}.

    Raises ValueError on malformed input, NotImplementedError on
    non-MJPEG video codecs."""
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise ValueError("not bytes")
    data = bytes(data)
    if not is_avi(data):
        raise ValueError("not an AVI (missing RIFF/AVI header)")

    frames: list[bytes] = []
    fps = 0.0
    width = height = 0
    handler = None
    saw_movi = False

    def walk(pos: int, end: int):
        nonlocal fps, width, height, handler, saw_movi
        for cid, body, size in _chunks(data, pos, end):
            if cid == b"LIST":
                if size < 4:
                    raise ValueError("short LIST chunk")
                kind = data[body : body + 4]
                if kind == b"movi":
                    saw_movi = True
                walk(body + 4, body + size)
            elif cid == b"avih":
                if size < 40:
                    raise ValueError("short avih chunk")
                (us_per_frame, _, _, _, _, _, _, _, w, h) = struct.unpack(
                    "<10I", data[body : body + 40]
                )
                width, height = w, h
                if us_per_frame:
                    fps = 1e6 / us_per_frame
            elif cid == b"strh":
                if size < 36:
                    raise ValueError("short strh chunk")
                fcc_type = data[body : body + 4]
                fcc_handler = data[body + 4 : body + 8]
                if fcc_type == b"vids":
                    handler = fcc_handler
                    scale, rate = struct.unpack(
                        "<II", data[body + 20 : body + 28]
                    )
                    if scale:
                        fps = rate / scale
            elif cid[2:4] == b"dc" and cid[:2].isdigit():
                frames.append(data[body : body + size])

    walk(12, len(data))
    if handler is None:
        raise ValueError("no video stream (missing vids strh)")
    if handler not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"video codec {handler!r} (only MJPG is implemented)"
        )
    if not saw_movi:
        raise ValueError("missing movi list")
    for f in frames:
        if not jpeg.is_jpeg(f):
            raise ValueError("MJPG frame is not a JPEG stream")
    return {
        "frames": frames,
        "fps": fps if fps > 0 else 25.0,
        "width": width,
        "height": height,
    }


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: float = 25.0, quality: int = 90
) -> bytes:
    """uint8 (H, W, 3) pixel frames -> single-stream MJPEG AVI bytes
    (fixture generator + re-encode path)."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    if fps <= 0:
        raise ValueError("fps must be positive")
    payloads = [jpeg.encode_jpeg(f, quality=quality) for f in frames]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            cid + struct.pack("<I", len(body)) + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    def list_chunk(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<14I",
        int(round(1e6 / fps)), max_bytes * int(round(fps)), 0,
        0x10,  # AVIF_HASINDEX convention bit; harmless without idx1
        len(payloads), 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0, 0, 0, 0,
            1000, int(round(fps * 1000)),  # scale, rate
            0, len(payloads), max_bytes, 0xFFFFFFFF, 0,
            0, 0, w, h,
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3,
        0, 0, 0, 0,
    )
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = list_chunk(
        b"movi", b"".join(chunk(b"00dc", p) for p in payloads)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
