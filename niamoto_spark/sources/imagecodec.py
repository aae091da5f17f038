"""Pure-python image decoding for multimodal columns — PNG and BMP via
stdlib ``zlib``/``struct`` + numpy.

The multimodal operators (operators/multimodal.py) were decode-stubbed in
round 1 because PIL is absent.  PNG (deflate + per-scanline filters) and
uncompressed BMP decode exactly here; JPEG decodes via the sibling
``jpegcodec`` module (round-3 gap closure — web corpora are
overwhelmingly JPEG) and GIF via ``gifcodec``; video frames stay
behind the optional-PIL/ffmpeg gate.

Used inside mapInPandas batches — one worker decodes a whole Arrow batch
of payloads, the decoded pixels never leave the batch.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


#: Adam7 interlace passes: (x0, y0, dx, dy) per T. PNG 1.2 §8.2.
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _unfilter(raw: bytes, pos: int, height: int, stride: int,
              bpp: int) -> tuple["np.ndarray", int]:
    """Reverse per-scanline filtering for ``height`` rows of ``stride``
    bytes starting at ``pos``; returns (rows array, next position).
    Each interlace pass filters independently (prev row = previous row
    OF THE PASS), so Adam7 calls this once per pass."""
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if ftype == 1:                      # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:                    # Up
            line = (line.astype(np.int16) + prev) .astype(np.uint8)
        elif ftype == 3:                    # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((int(left) + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:                    # Paeth
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = line
        prev = out[y]
    return out, pos


def _rows_to_pixels(rows: "np.ndarray", width: int, channels: int,
                    bit_depth: int) -> "np.ndarray":
    """Unfiltered scanline BYTES -> (n, width, channels) uint8 samples.
    Sub-byte depths (1/2/4: gray or palette indices) unpack MSB-first
    and drop the row's padding bits; 16-bit takes the high byte (the
    standard 8-bit downconversion)."""
    n = rows.shape[0]
    if bit_depth == 8:
        return rows.reshape(n, width, channels)
    if bit_depth == 16:
        u16 = rows.reshape(n, -1).view(">u2")
        return (u16 >> 8).astype(np.uint8).reshape(n, width, channels)
    bits = np.unpackbits(rows, axis=1)            # MSB-first per byte
    per = bits.reshape(n, -1, bit_depth)
    weights = 1 << np.arange(bit_depth - 1, -1, -1)
    vals = (per * weights).sum(axis=2).astype(np.uint8)
    return vals[:, :width].reshape(n, width, 1)


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> HxWx3 uint8 RGB.  Supports color types 0 (gray), 2 (RGB),
    3 (palette), 4 (gray+alpha), 6 (RGBA) at the spec's legal bit
    depths (1/2/4 for gray+palette, 8/16 elsewhere; 16-bit samples take
    their high byte) and BOTH interlace methods (none / Adam7) — the
    shapes real web PNGs ship.  Alpha is dropped (composited on black
    is a policy choice; training features want raw channels)."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    color_type = bit_depth = None
    interlace = 0
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack_from(">I", data, pos), \
            data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = \
                struct.unpack(">IIBBBBB", chunk)
            legal = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8),
                     2: (8, 16), 4: (8, 16), 6: (8, 16)}
            if bit_depth not in legal.get(color_type, ()):
                raise ValueError(
                    f"illegal PNG depth/type ({bit_depth}/{color_type})")
            if interlace not in (0, 1):
                raise ValueError(f"unknown PNG interlace {interlace}")
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    # filters operate on BYTES at a left-distance of bpp bytes (>= 1)
    bpp = max(1, channels * bit_depth // 8)

    def stride_of(w: int) -> int:
        return (w * channels * bit_depth + 7) // 8

    if interlace:
        px = np.zeros((height, width, channels), dtype=np.uint8)
        rpos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = -(-(width - x0) // dx) if width > x0 else 0
            ph = -(-(height - y0) // dy) if height > y0 else 0
            if pw == 0 or ph == 0:
                continue                    # empty pass: NO scanlines
            rows, rpos = _unfilter(raw, rpos, ph, stride_of(pw), bpp)
            px[y0::dy, x0::dx] = _rows_to_pixels(rows, pw, channels,
                                                 bit_depth)
    else:
        rows, _ = _unfilter(raw, 0, height, stride_of(width), bpp)
        px = _rows_to_pixels(rows, width, channels, bit_depth)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        return palette[px[:, :, 0]]
    if bit_depth in (1, 2, 4):               # gray: scale to full range
        px = (px.astype(np.uint16) * 255 // ((1 << bit_depth) - 1)) \
            .astype(np.uint8)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:                       # gray + alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]                     # RGB / RGBA -> RGB


def encode_png(arr: np.ndarray, interlace: bool = False) -> bytes:
    """HxWx3 uint8 -> PNG bytes (filter 0, one IDAT) — fixture writer.
    ``interlace=True`` writes Adam7 pass order (each pass's scanlines
    filtered independently), exercising the decoder's interlaced
    path."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            parts.extend(b"\x00" + sub[y].tobytes()
                         for y in range(sub.shape[0]))
        raw = b"".join(parts)
    else:
        raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload \
            + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, int(interlace))
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 8-bit-palette / 24 / 32-bit BMP -> HxWx3 uint8 RGB
    (bottom-up or top-down; 8-bit rows index the BGRA color table)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (pixel_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size, width, height) = struct.unpack_from("<Iii", data, 14)
    (planes, bpp) = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0 or bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    flip = height > 0
    height = abs(height)
    palette = None
    if bpp == 8:
        (n_colors,) = struct.unpack_from("<I", data, 46)
        n_colors = n_colors or 256
        table = np.frombuffer(data, np.uint8, 4 * n_colors,
                              14 + hdr_size).reshape(n_colors, 4)
        palette = table[:, :3][:, ::-1]      # BGRA -> RGB
    bypp = max(1, bpp // 8)
    row_size = (width * bypp + 3) & ~3
    out = np.empty((height, width, 3), dtype=np.uint8)
    for y in range(height):
        row = np.frombuffer(data, dtype=np.uint8, count=width * bypp,
                            offset=pixel_off + y * row_size)
        if palette is not None:
            px = palette[row]
        else:
            px = row.reshape(width, bypp)[:, :3][:, ::-1]   # BGR -> RGB
        out[height - 1 - y if flip else y] = px
    return out


def decode_image(payload: bytes) -> np.ndarray:
    """Best-effort image decode: PIL when importable (all formats), else
    the pure decoders for PNG/BMP/JPEG/GIF; other formats raise."""
    try:
        import io

        from PIL import Image  # noqa: F401

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError:
        pass
    if payload[:8] == _PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"\xFF\xD8":
        from niamoto_spark.sources.jpegcodec import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from niamoto_spark.sources.gifcodec import decode_gif

        return decode_gif(payload)
    raise NotImplementedError(
        "only PNG/BMP/JPEG/GIF decode without PIL; "
        "install pillow for other formats")
