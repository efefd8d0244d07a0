"""Image SINK plumbing: chart rendering to real PNG bytes (SURVEY S5).

The reference's only behavior with no engine counterpart until now was
its image sinks — matplotlib scatter+fit plots and ASE structure
renders saved per slab (``my_dag.py:173-183``, ``:223-237``). The
ENGINE-shaped version of that capability is not "call matplotlib on
the driver": it is a render stage that turns grouped rows into a
binary image column on the EXECUTORS (embarrassingly parallel, no
driver bottleneck, no pixels in any shuffle) and ships it through the
same partitioned file sinks as every other artifact. This module
provides that stage stdlib-only:

* :func:`encode_png_rgb` — a from-scratch 8-bit RGB PNG encoder
  (zlib + struct; filter 0 scanlines) producing files the engine's
  own from-scratch decoder (``multimodal.decode_png``) and any
  standard viewer accept;
* :func:`render_bar_chart` — an INTEGER-EXACT rasterizer: bar heights
  are ``(v * (H-1)) // vmax + 1``, all layout integer arithmetic, so
  every pixel of the output is reproducible in SQL — the property
  that lets a DuckDB oracle verify pixels that round-tripped through
  a real encode → file sink → decode path.

Scale shape: rendering is a per-group ``applyInPandas`` (one chart
per group, grouped shuffle carries only the narrow aggregate rows);
PNG bytes are written as an ordinary binary column through any file
sink, and decode-side verification reuses the multimodal batch
decoders. At 100 TB of charts (dashboard fan-out, per-entity report
cards) there is no driver involvement anywhere in the path.

matplotlib/ASE remain OPTIONAL driver-side swaps for publication
rendering; the Spark-side contract (grouped render → binary column →
sink) is what this module pins, and it is identical whichever
rasterizer runs inside the UDF.
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["encode_png_rgb", "render_bar_chart", "BAR_HEIGHT", "BAR_W", "BAR_GAP"]

#: Chart geometry — part of the oracle contract (the SQL replays the
#: filled-pixel arithmetic with these constants).
BAR_HEIGHT = 32
BAR_W = 3
BAR_GAP = 1

_INK = (0, 0, 0)
_PAPER = (255, 255, 255)


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png_rgb(width: int, height: int, pixels: bytes) -> bytes:
    """A complete, valid 8-bit RGB PNG (color type 2, no interlace,
    filter 0 on every scanline) from a row-major RGB byte buffer —
    the exact subset ``multimodal.decode_png`` reconstructs, so the
    engine round-trips its own artifacts bit-for-bit. Deterministic
    output: fixed zlib level, no timestamps, no ancillary chunks."""
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, need {width * height * 3}"
        )
    stride = width * 3
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def render_bar_chart(values: list[int]) -> tuple[int, int, bytes]:
    """Rasterize non-negative integer series as a bar chart with
    INTEGER-EXACT layout: each bar is ``BAR_W`` ink columns + a
    ``BAR_GAP`` column of paper; bar height is
    ``(v * (BAR_HEIGHT-1)) // vmax + 1`` for ``v > 0`` (so any
    non-zero value is visible and the max fills the panel) and 0 for
    ``v == 0``. Every coordinate is integer arithmetic on the inputs,
    which is what makes the chart's total ink SQL-replayable:
    ``filled_px = BAR_W * Σ heights``. Returns ``(width, height,
    row-major RGB bytes)``; empty input yields a 1×1 paper pixel."""
    if not values:
        return 1, 1, bytes(_PAPER)
    if min(values) < 0:
        raise ValueError("bar chart values must be non-negative")
    vmax = max(values)
    width = len(values) * (BAR_W + BAR_GAP)
    heights = [
        0 if v == 0 or vmax == 0 else (v * (BAR_HEIGHT - 1)) // vmax + 1
        for v in values
    ]
    buf = bytearray(bytes(_PAPER) * (width * BAR_HEIGHT))
    for i, hb in enumerate(heights):
        x0 = i * (BAR_W + BAR_GAP)
        for y in range(BAR_HEIGHT - hb, BAR_HEIGHT):
            base = (y * width + x0) * 3
            buf[base : base + BAR_W * 3] = bytes(_INK) * BAR_W
    return width, BAR_HEIGHT, bytes(buf)


def png_ink_stats(payload: bytes) -> dict | None:
    """Decode a PNG produced by :func:`encode_png_rgb` back to
    ``{width, height, ink_px}`` where ``ink_px`` counts pure-ink
    (0,0,0) pixels — the verification half of the sink round-trip:
    the oracle's integer bar arithmetic is checked against pixels
    RECONSTRUCTED from the written file, not against the renderer's
    own bookkeeping. Shares the unfilter path with the multimodal
    decoder; malformed payloads degrade to ``None``."""
    from .multimodal import _png_unfilter

    if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    try:
        pos, width, height, idat = 8, None, None, b""
        while pos + 8 <= len(payload):
            (ln,) = struct.unpack_from(">I", payload, pos)
            tag = payload[pos + 4 : pos + 8]
            body = payload[pos + 8 : pos + 8 + ln]
            if tag == b"IHDR":
                width, height, depth, ctype, comp, filt, inter = (
                    struct.unpack_from(">IIBBBBB", body)
                )
                # encode_png_rgb emits 8-bit truecolor, zlib/0 filter
                # method, non-interlaced; an Adam7 stream of the right
                # length would otherwise be mis-unfiltered instead of
                # degrading to None
                if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                    return None
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
            pos += 12 + ln
        if width is None or not idat:
            return None
        pixels = _png_unfilter(zlib.decompress(idat), width, height)
        if len(pixels) != width * height * 3:
            return None
    except (struct.error, zlib.error, IndexError, ValueError):
        return None
    ink = sum(
        1
        for p in range(0, len(pixels), 3)
        if pixels[p] == 0 and pixels[p + 1] == 0 and pixels[p + 2] == 0
    )
    return {"width": width, "height": height, "ink_px": ink}
