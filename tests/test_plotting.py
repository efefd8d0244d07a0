"""Unit tests for the chart-render image sink (SURVEY S5):
from-scratch PNG encode, integer-exact bar rasterization, and the
decode-side ink accounting used by s05_chart_sink's verification."""

from __future__ import annotations

import pytest

from echem_dft_etl_spark.operators import multimodal
from echem_dft_etl_spark.operators.plotting import (
    BAR_GAP,
    BAR_HEIGHT,
    BAR_W,
    encode_png_rgb,
    png_ink_stats,
    render_bar_chart,
)


def test_render_bar_chart_integer_layout():
    """Heights follow (v*(H-1))//vmax + 1 exactly; zero values draw
    nothing; the max value fills the panel."""
    values = [0, 1, 5, 10]
    w, h, pixels = render_bar_chart(values)
    assert (w, h) == (len(values) * (BAR_W + BAR_GAP), BAR_HEIGHT)
    expected = [0 if v == 0 else (v * (BAR_HEIGHT - 1)) // 10 + 1 for v in values]
    assert expected[-1] == BAR_HEIGHT  # max bar fills the panel

    def col_ink(x):
        return sum(
            1
            for y in range(h)
            if pixels[(y * w + x) * 3 : (y * w + x) * 3 + 3] == b"\x00\x00\x00"
        )

    for i, hb in enumerate(expected):
        x0 = i * (BAR_W + BAR_GAP)
        for dx in range(BAR_W):
            assert col_ink(x0 + dx) == hb, (i, dx)
        assert col_ink(x0 + BAR_W) == 0, i  # gap column is paper


def test_png_roundtrip_through_own_decoder_and_ink_stats():
    """encode_png_rgb output must decode bit-exact through BOTH the
    multimodal decoder (shared subset) and png_ink_stats."""
    w, h, pixels = render_bar_chart([2, 7, 3])
    png = encode_png_rgb(w, h, pixels)
    d = multimodal.decode_png(png)
    assert (d["format"], d["width"], d["height"]) == ("image/png", w, h)
    assert d["n_pixel_bytes"] == w * h * 3
    st = png_ink_stats(png)
    expected_ink = BAR_W * sum((v * (BAR_HEIGHT - 1)) // 7 + 1 for v in [2, 7, 3])
    assert st == {"width": w, "height": h, "ink_px": expected_ink}


def test_png_ink_stats_degrades_on_hostile_payloads():
    w, h, pixels = render_bar_chart([1])
    good = encode_png_rgb(w, h, pixels)
    hostile = [
        b"",                      # empty
        b"\x89PNG\r\n\x1a\n",      # signature only
        good[: len(good) // 2],   # truncated mid-IDAT
        good[:40] + b"\x00" * 20,  # corrupt IDAT
        b"BM" + good[2:],          # wrong magic
    ]
    for i, payload in enumerate(hostile):
        assert png_ink_stats(payload) is None, i


def test_render_rejects_negative_and_handles_empty():
    with pytest.raises(ValueError):
        render_bar_chart([3, -1])
    w, h, pixels = render_bar_chart([])
    assert (w, h) == (1, 1) and pixels == b"\xff\xff\xff"
    assert png_ink_stats(encode_png_rgb(w, h, pixels))["ink_px"] == 0


def test_encode_rejects_wrong_buffer_size():
    with pytest.raises(ValueError):
        encode_png_rgb(2, 2, b"\x00" * 11)


def test_png_encode_is_byte_deterministic():
    """encode_png_rgb promises deterministic bytes (fixed zlib level,
    no timestamps, no ancillary chunks) — the property that makes
    chart artifacts content-addressable and sink writes idempotent."""
    w, h, pixels = render_bar_chart([3, 9, 1, 7])
    a = encode_png_rgb(w, h, pixels)
    b = encode_png_rgb(w, h, bytes(pixels))
    assert a == b
    # structural sanity: exactly the three critical chunks, in order
    tags = []
    pos = 8
    while pos + 8 <= len(a):
        import struct as _s

        (ln,) = _s.unpack_from(">I", a, pos)
        tags.append(a[pos + 4 : pos + 8])
        pos += 12 + ln
    assert tags == [b"IHDR", b"IDAT", b"IEND"]
