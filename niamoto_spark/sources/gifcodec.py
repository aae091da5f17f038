"""Pure-python GIF codec (GIF87a/GIF89a) — numpy + stdlib only.

Web corpora carry GIFs alongside PNG/JPEG; without this the multimodal
lane gated them behind optional PIL.  Scope:

- decode: global/local color tables, LZW decompression (LSB-first
  bitstream, dynamic code width, CLEAR/EOI, 12-bit dictionary cap),
  interlaced images (the 4-pass row order), GIF89a extension blocks
  (skipped; the graphic-control transparency index is honored), and
  animations — ``decode_gif`` composites the FIRST frame on the logical
  screen (the still-image contract decode_image needs);
  ``decode_gif_frames`` yields every frame's pixels + placement for the
  video-style ops (no disposal-method compositing — documented).
- encode: single-frame GIF89a from an RGB array with <= 256 distinct
  colors (GIF is palette-based: more colors is a QUANTIZATION decision
  the caller owns, so it raises instead of silently degrading).
  Real LZW compression, optional interlacing.

GIF is palette-indexed, so for palette-sized images the round trip is
EXACT: decode(encode(x)) == x bit-for-bit — the property the tests pin
and the q355 analytic oracle exploits (formula pixels -> exact channel
sums recomputed in SQL).

Like the PNG/JPEG codecs this runs inside mapInPandas batches; only the
LZW stream walk is a python loop (one step per output run, not per
pixel-bit).
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, dynamic width, 12-bit cap)
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # dictionary: code -> list of palette indices
    base = [[i] for i in range(clear)] + [None, None]
    table = list(base)
    out: list[int] = []
    prev: list[int] | None = None

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return out                    # truncated stream: best effort
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]          # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def _lzw_encode(indices: "np.ndarray", min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, w: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    it = iter(int(i) for i in indices)
    prev = next(it)
    for k in it:
        key = (prev, k)
        nxt = table.get(key)
        if nxt is not None:
            prev = nxt
            continue
        emit(prev, width)
        table[key] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:                 # dict full: reset
            emit(clear, width)
            table.clear()
            width = min_code_size + 1
            next_code = eoi + 1
        prev = k
    emit(prev, width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace_rows(h: int) -> list[int]:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        size = data[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos:pos + size])
        pos += size


def decode_gif_frames(data: bytes):
    """Yield (pixels HxWx3 uint8, left, top, transparency_mask|None)
    per image block, in stream order.  No disposal compositing —
    callers sampling animation frames treat each as an independent
    sub-image placed at (left, top) on the logical screen."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    transparent = None
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:                          # trailer
            return
        if b == 0x21:                          # extension
            label = data[pos + 1]
            body, pos = _read_subblocks(data, pos + 2)
            if label == 0xF9 and len(body) >= 4:   # graphic control
                transparent = body[3] if body[0] & 0x01 else None
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02X}")
        left, top, w, h, ipk = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        ct = gct
        if ipk & 0x80:
            n = 2 << (ipk & 0x07)
            ct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image without a color table")
        mcs = data[pos]
        lzw, pos = _read_subblocks(data, pos + 1)
        idx = np.array(_lzw_decode(lzw, mcs), dtype=np.int64)[:h * w]
        if idx.size < h * w:                   # truncated: pad with 0
            idx = np.pad(idx, (0, h * w - idx.size))
        grid = idx.reshape(h, w)
        if ipk & 0x40:                         # interlaced
            un = np.empty_like(grid)
            un[_deinterlace_rows(h)] = grid
            grid = un
        px = ct[np.clip(grid, 0, len(ct) - 1)]
        mask = (grid == transparent) if transparent is not None else None
        yield px, left, top, mask
        transparent = None


def decode_gif(data: bytes) -> np.ndarray:
    """First frame composited on the logical screen -> HxWx3 uint8 RGB
    (transparent pixels stay at the screen's zero fill).  Raises
    ValueError for non-GIF, truncated, or corrupt streams (the same
    malformed-input contract as decode_jpeg)."""
    try:
        return _decode_gif(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or corrupt GIF: {e}") from e


def _decode_gif(data: bytes) -> np.ndarray:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh = struct.unpack_from("<HH", data, 6)
    screen = np.zeros((sh, sw, 3), dtype=np.uint8)
    for px, left, top, mask in decode_gif_frames(data):
        h, w = px.shape[:2]
        region = screen[top:top + h, left:left + w]
        if mask is not None:
            keep = ~mask[:region.shape[0], :region.shape[1]]
            region[keep] = px[:region.shape[0], :region.shape[1]][keep]
        else:
            region[:] = px[:region.shape[0], :region.shape[1]]
        return screen                          # FIRST frame only
    raise ValueError("GIF contains no image block")


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """HxWx3 uint8 RGB with <= 256 distinct colors -> single-frame
    GIF89a.  More colors raises (palette quantization is the caller's
    decision); palette order is the sorted distinct colors, so the
    byte stream is deterministic."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_gif expects HxWx3 uint8 RGB")
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"GIF palettes hold 256 colors; image has {len(colors)} — "
            "quantize upstream")
    # palette size = power of two >= n (min 2); bits = log2
    bits = 1
    while (1 << bits) < len(colors):
        bits += 1
    n_pal = 1 << bits
    palette = np.zeros((n_pal, 3), dtype=np.uint8)
    palette[:len(colors)] = colors
    mcs = max(2, bits)

    grid = inverse.reshape(h, w)
    if interlace:
        grid = grid[_deinterlace_rows(h)]
    lzw = _lzw_encode(grid.ravel(), mcs)

    out = bytearray(b"GIF89a")
    out.extend(struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0))
    out.extend(palette.tobytes())
    out.extend(struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                           0x40 if interlace else 0x00))
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        block = lzw[i:i + 255]
        out.append(len(block))
        out.extend(block)
    out.append(0)                              # sub-block terminator
    out.append(0x3B)                           # trailer
    return bytes(out)
