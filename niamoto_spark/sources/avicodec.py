"""Minimal AVI (RIFF) MJPEG container codec — pure stdlib struct.

Closes the round-2 "video gated" stub with a REAL public format: MJPEG-AVI
is just RIFF chunks whose '00dc' payloads are baseline JPEGs, which
``sources/jpegcodec.py`` already decodes.  This gives the multimodal path
an end-to-end video lane (container parse -> frame sample -> JPEG decode
-> features) without ffmpeg/PIL; other codecs (H.264 etc.) still raise —
decode them by swapping in pyav/ffmpeg where available.

Writer (`encode_avi_mjpeg`) exists for fixtures and as a sink; it emits
the canonical hdrl(avih + strl(strh+strf)) / movi / idx1 layout that any
standard player accepts.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 10,
                     quality: int = 90) -> bytes:
    """HxWx3 uint8 frames -> MJPEG AVI bytes."""
    from niamoto_spark.sources.jpegcodec import encode_jpeg

    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]

    avih = struct.pack("<14I", 1000000 // fps, 0, 0, 0x10, len(frames),
                       0, 1, 0, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<10I", 0, 0, 0, 1, fps,
                                            0, len(frames), 0, 0, 0)
            + struct.pack("<4H", 0, 0, 0, 0))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    movi_payload = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_payload)

    idx, off = [], 4                      # offsets relative to 'movi' tag
    for j in jpegs:
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def iter_avi_frames(data: bytes) -> Iterator[bytes]:
    """Yield the raw JPEG bytes of every video frame ('00dc'/'00dj'
    chunks inside the 'movi' list), in stream order."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    pos = 12
    end = min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])

    def walk(lo: int, hi: int) -> Iterator[bytes]:
        p = lo
        while p + 8 <= hi:
            fourcc = data[p:p + 4]
            (size,) = struct.unpack_from("<I", data, p + 4)
            payload_lo = p + 8
            payload_hi = payload_lo + size
            if payload_hi > hi:
                raise ValueError("truncated AVI chunk")
            if fourcc == b"LIST":
                ltype = data[payload_lo:payload_lo + 4]
                if ltype in (b"movi", b"rec "):
                    yield from walk(payload_lo + 4, payload_hi)
                elif ltype == b"hdrl":
                    pass                  # headers carry no frame data
            elif fourcc[2:4] in (b"dc", b"dj"):
                yield data[payload_lo:payload_hi]
            p = payload_hi + (size % 2)

    yield from walk(pos, end)


def decode_avi_mjpeg(data: bytes, every_n: int = 1,
                     max_frames: int | None = None) -> list[tuple[int, np.ndarray]]:
    """AVI bytes -> [(frame_idx, HxWx3 uint8 RGB)] for every Nth frame.
    Non-MJPEG payloads surface as the JPEG decoder's ValueError."""
    from niamoto_spark.sources.jpegcodec import decode_jpeg

    out = []
    for i, jpeg in enumerate(iter_avi_frames(data)):
        if i % every_n:
            continue
        out.append((i, decode_jpeg(jpeg)))
        if max_frames is not None and len(out) >= max_frames:
            break
    return out
