"""GIF codec (sources/gifcodec.py): exact palette round-trips, LZW edge
cases (KwKwK, dictionary growth/reset, width bumps), interlacing, and
the decode_image dispatch."""

import numpy as np
import pytest

from niamoto_spark.sources import gifcodec as gc
from niamoto_spark.sources.imagecodec import decode_image


def _pal_img(rng, n_colors, h, w):
    pal = np.unique(rng.integers(0, 256, (n_colors, 3), dtype=np.uint8),
                    axis=0)
    return pal[rng.integers(0, len(pal), (h, w))]


@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_exact(interlace):
    rng = np.random.default_rng(5)
    img = _pal_img(rng, 16, 23, 37)
    data = gc.encode_gif(img, interlace=interlace)
    assert data[:6] == b"GIF89a"
    assert np.array_equal(gc.decode_gif(data), img)


def test_roundtrip_max_palette_dict_growth():
    """64x64 over a 256-color palette grows the LZW dictionary through
    several width bumps — encoder and decoder must bump in lockstep."""
    rng = np.random.default_rng(6)
    img = _pal_img(rng, 256, 64, 64)
    assert np.array_equal(gc.decode_gif(gc.encode_gif(img)), img)


def test_solid_color_kwkwk():
    """An all-same-index image is the classic KwKwK stream: the decoder
    must handle a code equal to the next undefined dictionary slot."""
    img = np.full((5, 9, 3), 42, dtype=np.uint8)
    assert np.array_equal(gc.decode_gif(gc.encode_gif(img)), img)


def test_dictionary_reset_on_large_noise():
    """Enough random content to hit the 4096-entry cap and the mid-
    stream CLEAR/reset path."""
    rng = np.random.default_rng(7)
    img = _pal_img(rng, 250, 160, 160)
    assert np.array_equal(gc.decode_gif(gc.encode_gif(img)), img)


def test_palette_overflow_raises():
    y, x = np.mgrid[0:32, 0:32]
    big = np.stack([x * 8 % 256, y * 8 % 256, (x + y) % 256],
                   axis=2).astype(np.uint8)
    with pytest.raises(ValueError, match="256 colors"):
        gc.encode_gif(big)


def test_not_a_gif_and_truncation():
    with pytest.raises(ValueError, match="not a GIF"):
        gc.decode_gif(b"PNG????")
    rng = np.random.default_rng(8)
    img = _pal_img(rng, 8, 12, 12)
    data = gc.encode_gif(img)
    # mid-structure truncation raises ValueError, never IndexError
    # (decode_jpeg's malformed-input contract)
    for cut in (len(data) // 2, len(data) - 2):
        with pytest.raises(ValueError):
            gc.decode_gif(data[:cut])


def test_decode_image_dispatches_gif():
    rng = np.random.default_rng(9)
    img = _pal_img(rng, 32, 10, 14)
    assert np.array_equal(decode_image(gc.encode_gif(img)), img)
