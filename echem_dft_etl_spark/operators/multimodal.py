"""Multimodal column plumbing (LLM-data-pipeline extension).

Images/audio/video ride through the engine as opaque ``binary`` columns
with a typed metadata struct alongside — the pattern that scales to
100 TB: payload bytes never pass through Python except inside the
Arrow-batched decode UDF, partitioning/shuffle operate on the (small)
metadata columns, and column pruning drops the payload whenever a query
doesn't touch it.

The payloads are REAL container formats built stdlib-only: 24-bpp BMP
images (``build_bmp_payload``) and 16-bit PCM WAV audio
(``build_wav_payload``), with pixel/sample data derived
deterministically from the corpus text so every byte is reproducible by
the DuckDB oracle. The decode stage parses the actual headers
(``struct.unpack`` of the BITMAPINFOHEADER / RIFF chunks) — dimensions
and features come from payload bytes, not from metadata riding
alongside. Swapping in PIL/librosa for richer codecs is a one-function
change; the Spark-side contract (schema, mapInPandas iterator, Arrow
batch bounding) is identical.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from .guards import require_at_least
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: Declared output schema of the decode stage.
DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, format string, "
    "width int, height int, feature_sum bigint"
)

#: Codec-agnostic image decode schema: n_pixel_bytes (the decoded
#: pixel-array length) replaces container n_bytes, which is not
#: closed-form for entropy-coded formats (a PNG's IDAT length depends
#: on zlib, so an oracle can't predict it — the PIXELS it inflates to
#: are still exactly reproducible).
IMAGE_DECODE_SCHEMA = (
    "doc_id bigint, format string, width int, height int, "
    "n_pixel_bytes bigint, feature_sum bigint"
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Materialize an opaque raw payload + metadata struct.

    In production this column arrives from the source (image bytes in
    parquet/iceberg); here it is derived deterministically from text so
    the plumbing is exercised end-to-end on the standard corpus. This
    raw form is the container-less baseline used by the frame/chunk
    generators; :func:`build_bmp_payload` / :func:`build_wav_payload`
    wrap real headers around the same bytes.
    """
    payload = F.encode(F.col("text"), "UTF-8")
    meta = F.struct(
        F.lit("fake/raw").alias("format"),
        (F.pmod(F.col("doc_id"), F.lit(4)) * 64 + 64).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), F.lit(3)) * 64 + 64).cast("int").alias("height"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("meta"))


def _fill(data: bytes, need: int) -> bytes:
    """``data`` cycled/truncated to exactly ``need`` bytes."""
    if not data:
        return b"\x00" * need
    return (data * (need // len(data) + 1))[:need]


def bmp_bytes(width: int, height: int, pixel_source: bytes) -> bytes:
    """A complete, valid 24-bpp BI_RGB BMP file.

    BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B) + rows of
    ``width·3`` pixel bytes. Widths are kept multiples of 4 by callers
    so rows need no padding and the pixel array is exactly
    ``width·height·3`` bytes — which keeps the DuckDB oracle's size
    arithmetic closed-form.
    """
    n_pix = width * height * 3
    pixels = _fill(pixel_source, n_pix)
    header = struct.pack("<2sIHHI", b"BM", 54 + n_pix, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, n_pix, 2835, 2835, 0, 0
    )
    return header + pixels


def build_bmp_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): real BMP bytes per document, built in an
    Arrow-batched pandas UDF (``struct.pack`` is the stdlib encoder).

    Dimensions are deterministic per doc (width ∈ {4,8,12,16}, height ∈
    {4,8,12}, both multiples of 4 → no row padding); the pixel array is
    the document's UTF-8 bytes cycled to fill — every output byte is a
    pure function of (doc_id, text) that the oracle reproduces.
    """

    @pandas_udf("binary")
    def make_bmp(doc_id: pd.Series, text: pd.Series) -> pd.Series:
        out = []
        for did, txt in zip(doc_id, text):
            w = (int(did) % 4 + 1) * 4
            h = (int(did) % 3 + 1) * 4
            out.append(bmp_bytes(w, h, txt.encode("utf-8")))
        return pd.Series(out)

    return docs.select(
        "doc_id", make_bmp(F.col("doc_id"), F.col("text")).alias("payload")
    )


def decode_bmp(payload: bytes) -> dict:
    """Parse a BMP payload's actual bytes: magic, header geometry, and
    a byte-sum feature over the leading pixels.

    This is a genuine (if minimal) decoder — width/height/offset come
    from ``struct.unpack`` of the BITMAPFILEHEADER/BITMAPINFOHEADER,
    and the feature window reads the pixel array at the offset the
    header declares. A PIL decode slots in here for formats with
    entropy coding; BMP needs none.
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        return {
            "n_bytes": len(payload),
            "format": "unknown",
            "width": None,
            "height": None,
            "feature_sum": None,
        }
    (pix_offset,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    pixels = payload[pix_offset:]
    return {
        "n_bytes": len(payload),
        "format": "image/bmp",
        "width": width,
        "height": height,
        "feature_sum": int(sum(pixels[:64])),
    }


def decode_batch(df: DataFrame) -> DataFrame:
    """Arrow-batched decode via mapInPandas.

    Iterator-of-batches signature: each pandas batch holds a bounded
    number of payloads (bounded by spark.sql.execution.arrow.
    maxRecordsPerBatch), so executor memory is independent of partition
    size — the property that matters when payloads are megabyte images
    rather than kilobyte texts. Expects (doc_id, payload) rows, e.g.
    from :func:`build_bmp_payload`.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_bmp(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "format": [f["format"] for f in feats],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "feature_sum": [f["feature_sum"] for f in feats],
                }
            )

    return df.mapInPandas(decode, DECODE_SCHEMA)


# =====================================================================
# PNG codec: a real entropy-coded image format, stdlib-only (zlib)
# =====================================================================


def png_bytes(width: int, height: int, pixel_source: bytes) -> bytes:
    """A complete, valid 8-bit RGB PNG file (RFC 2083 layout).

    Signature + IHDR + one IDAT (zlib-deflated scanlines, each row
    prefixed with filter type 0) + IEND, every chunk CRC-32'd. Unlike
    BMP this is a genuinely ENTROPY-CODED container — the compressed
    byte length is data-dependent — which is exactly why the decode
    contract reports pixel-array geometry, not container size.
    """
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    n_pix = width * height * 3
    pixels = _fill(pixel_source, n_pix)
    raw = b"".join(
        b"\x00" + pixels[r * width * 3 : (r + 1) * width * 3]
        for r in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def build_png_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): real PNG bytes per document — same
    deterministic geometry and cycled-text pixel fill as
    :func:`build_bmp_payload`, so the two codecs carry IDENTICAL
    pixel arrays and one oracle formula checks both."""

    @pandas_udf("binary")
    def make_png(doc_id: pd.Series, text: pd.Series) -> pd.Series:
        out = []
        for did, txt in zip(doc_id, text):
            w = (int(did) % 4 + 1) * 4
            h = (int(did) % 3 + 1) * 4
            out.append(png_bytes(w, h, txt.encode("utf-8")))
        return pd.Series(out)

    return docs.select(
        "doc_id", make_png(F.col("doc_id"), F.col("text")).alias("payload")
    )


def _png_unfilter(raw: bytes, width: int, height: int) -> bytes:
    """Reverse PNG scanline filtering for filter types 0-2 (None, Sub,
    Up) — a real inflate-then-reconstruct pass over the decompressed
    stream. Own encoder emits type 0 only; Sub/Up are handled so the
    decoder isn't secretly coupled to the encoder's choice. Types 3/4
    (Average/Paeth) raise — a PIL swap-in covers them."""
    stride = width * 3
    out = bytearray()
    prev = bytearray(stride)
    for r in range(height):
        base = r * (stride + 1)
        ftype = raw[base]
        row = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub: add left neighbor (3 bytes back, RGB)
            for i in range(3, stride):
                row[i] = (row[i] + row[i - 3]) & 0xFF
        elif ftype == 2:  # Up: add the row above
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unsupported PNG filter type {ftype}")
        out += row
        prev = row
    return bytes(out)


def decode_png(payload: bytes) -> dict:
    """Parse a PNG payload's actual bytes: signature, IHDR geometry,
    IDAT reassembly, zlib inflate, scanline unfilter — the full real
    decode path for the subset the stdlib covers (8-bit RGB,
    filters 0-2, no interlace). Features come from the RECONSTRUCTED
    pixel array, nothing from metadata."""
    import zlib

    bad = {
        "format": "unknown",
        "width": None,
        "height": None,
        "n_pixel_bytes": None,
        "feature_sum": None,
    }
    if len(payload) < 8 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return bad
    # Degrade-to-unknown on ANY malformed payload: a PNG magic with a
    # truncated IHDR (struct.error), corrupt IDAT (zlib.error), short
    # decompressed stream (IndexError in _png_unfilter), or an
    # unsupported filter type (ValueError) must yield the bad row, not
    # kill the whole mapInPandas task — one hostile file in a 100 TB
    # drop cannot be allowed to fail the batch.
    try:
        pos, width, height, idat = 8, None, None, b""
        while pos + 8 <= len(payload):
            (ln,) = struct.unpack_from(">I", payload, pos)
            tag = payload[pos + 4 : pos + 8]
            body = payload[pos + 8 : pos + 8 + ln]
            if tag == b"IHDR":
                if len(body) < 10:
                    return bad
                width, height, depth, ctype = struct.unpack_from(">IIBB", body)
                if depth != 8 or ctype != 2:
                    return bad
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
            pos += 12 + ln  # len + tag + crc
        if width is None or not idat:
            return bad
        pixels = _png_unfilter(zlib.decompress(idat), width, height)
        if len(pixels) != width * height * 3:
            return bad
    except (struct.error, zlib.error, IndexError, ValueError):
        return bad
    return {
        "format": "image/png",
        "width": width,
        "height": height,
        "n_pixel_bytes": len(pixels),
        "feature_sum": int(sum(pixels[:64])),
    }


def decode_image(payload: bytes) -> dict:
    """Codec dispatch on the payload's magic bytes — the decode stage
    is format-agnostic (the mapInPandas contract the module docstring
    promises); adding a codec is one branch here."""
    if payload[:2] == b"BM":
        d = decode_bmp(payload)
        w, h = d["width"], d["height"]
        return {
            "format": d["format"],
            "width": w,
            "height": h,
            "n_pixel_bytes": (w * h * 3) if w is not None else None,
            "feature_sum": d["feature_sum"],
        }
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    return {
        "format": "unknown",
        "width": None,
        "height": None,
        "n_pixel_bytes": None,
        "feature_sum": None,
    }


def decode_image_batch(df: DataFrame) -> DataFrame:
    """Arrow-batched codec-agnostic image decode via mapInPandas —
    same iterator/batch-bounding contract as :func:`decode_batch`,
    dispatching per payload on magic bytes (BMP and PNG mixed in one
    frame decode correctly batch by batch)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": [f["format"] for f in feats],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_pixel_bytes": [f["n_pixel_bytes"] for f in feats],
                    "feature_sum": [f["feature_sum"] for f in feats],
                }
            )

    return df.mapInPandas(decode, IMAGE_DECODE_SCHEMA)


#: One row per sampled frame — the 1:N generator shape of video decode.
FRAME_SCHEMA = "doc_id bigint, frame_index int, offset int, n_frames int"


def sample_frames(
    df: DataFrame, frame_size: int = 64, stride: int = 4
) -> DataFrame:
    """Frame sampling over an opaque video payload (STUB decode).

    The Spark-side plumbing is the real deliverable: a 1:N
    ``mapInPandas`` generator that turns each binary payload into one
    row per sampled frame, with bounded Arrow batches so executor
    memory doesn't scale with payload size. The stub 'container format'
    is ``n_frames = len(payload) // frame_size`` fixed-size frames,
    sampled every ``stride``-th; a real decoder (pyav / ffmpeg) slots
    into the same iterator with the same schema.
    """
    require_at_least("frame_size", frame_size, 1)
    require_at_least("stride", stride, 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [],
                "frame_index": [],
                "offset": [],
                "n_frames": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) // frame_size
                for i in range(0, n_frames, stride):
                    rows["doc_id"].append(doc_id)
                    rows["frame_index"].append(i)
                    rows["offset"].append(i * frame_size)
                    rows["n_frames"].append(n_frames)
            yield pd.DataFrame(rows)

    return df.mapInPandas(gen, FRAME_SCHEMA)


#: One row per SAMPLED video frame, features from decoded plane bytes.
VIDEO_FRAME_SCHEMA = (
    "doc_id bigint, frame_index int, n_frames int, width int, "
    "height int, luma_sum bigint"
)


def y4m_bytes(
    width: int, height: int, n_frames: int, pixel_source: bytes
) -> bytes:
    """A complete, valid YUV4MPEG2 (Y4M) video stream, ``Cmono``
    colorspace: the plain-text stream header, then per frame a
    ``FRAME\\n`` marker followed by the raw ``width*height`` luma
    plane. Y4M is the real uncompressed-video interchange format of
    ffmpeg/x264 pipelines — exactly the shape a frame-sampling stage
    sees after the (heavyweight, out-of-container) codec step. Luma
    bytes are the pixel_source cycled CONTIGUOUSLY across frames, so
    frame i's plane starts at stream offset ``i*width*height`` — the
    property the DuckDB oracle's byte arithmetic replays."""
    plane = width * height
    pixels = _fill(pixel_source, n_frames * plane)
    head = f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 Cmono\n".encode()
    return head + b"".join(
        b"FRAME\n" + pixels[i * plane : (i + 1) * plane]
        for i in range(n_frames)
    )


def build_y4m_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): real Y4M video bytes per document —
    deterministic geometry (same w/h cycle as the image codecs) and
    2..5 frames by ``doc_id % 4 + 2``, luma from cycled text."""

    @pandas_udf("binary")
    def make_y4m(doc_id: pd.Series, text: pd.Series) -> pd.Series:
        out = []
        for did, txt in zip(doc_id, text):
            w = (int(did) % 4 + 1) * 4
            h = (int(did) % 3 + 1) * 4
            nf = int(did) % 4 + 2
            out.append(y4m_bytes(w, h, nf, txt.encode("utf-8")))
        return pd.Series(out)

    return docs.select(
        "doc_id", make_y4m(F.col("doc_id"), F.col("text")).alias("payload")
    )


def parse_y4m(payload: bytes) -> dict | None:
    """Parse a Y4M stream's actual bytes: the ``YUV4MPEG2`` magic, the
    space-separated W/H/C header tags, then FRAME-marker-delimited
    planes. Returns ``{width, height, frames: [plane bytes, ...]}`` or
    None for anything malformed (missing magic, unknown tags, truncated
    frame, non-mono colorspace) — degrade, never raise, same contract
    as the image decoders."""
    try:
        nl = payload.index(b"\n")
    except ValueError:
        return None
    head = payload[:nl].split(b" ")
    if not head or head[0] != b"YUV4MPEG2":
        return None
    width = height = None
    cspace = b"420jpeg"  # the Y4M default when no C tag is present
    for tag in head[1:]:
        if tag[:1] == b"W":
            try:
                width = int(tag[1:])
            except ValueError:
                return None
        elif tag[:1] == b"H":
            try:
                height = int(tag[1:])
            except ValueError:
                return None
        elif tag[:1] == b"C":
            cspace = tag[1:]
    if not width or not height or width < 0 or height < 0:
        return None
    if cspace == b"mono":
        plane = width * height
    elif cspace in (b"420", b"420jpeg", b"420mpeg2", b"420paldv"):
        plane = width * height + 2 * ((width // 2) * (height // 2))
    elif cspace == b"444":
        plane = 3 * width * height
    else:
        return None
    frames = []
    pos = nl + 1
    while pos < len(payload):
        try:
            fnl = payload.index(b"\n", pos)
        except ValueError:
            return None
        if payload[pos:fnl].split(b" ")[0] != b"FRAME":
            return None
        body = payload[fnl + 1 : fnl + 1 + plane]
        if len(body) != plane:
            return None  # truncated frame
        frames.append(body)
        pos = fnl + 1 + plane
    return {"width": width, "height": height, "frames": frames}


def sample_y4m_frames(df: DataFrame, stride: int = 2) -> DataFrame:
    """REAL-container frame sampling: parse each payload as Y4M, keep
    every ``stride``-th frame, and feature each kept frame from its
    DECODED luma plane (sum of the leading 32 bytes) — the video
    sibling of decode_image_batch, upgrading :func:`sample_frames`'s
    stub container to an actual interchange format. Same 1:N
    ``mapInPandas`` generator contract: one input row fans out to
    0..n_frames/stride output rows inside one bounded Arrow batch,
    payload bytes never leave the executor, and malformed payloads
    contribute zero rows instead of failing the task."""
    require_at_least("stride", stride, 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [],
                "frame_index": [],
                "n_frames": [],
                "width": [],
                "height": [],
                "luma_sum": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                v = parse_y4m(bytes(payload))
                if v is None:
                    continue
                nf = len(v["frames"])
                for i in range(0, nf, stride):
                    rows["doc_id"].append(doc_id)
                    rows["frame_index"].append(i)
                    rows["n_frames"].append(nf)
                    rows["width"].append(v["width"])
                    rows["height"].append(v["height"])
                    rows["luma_sum"].append(
                        int(sum(v["frames"][i][:32]))
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(gen, VIDEO_FRAME_SCHEMA)


def y4m_scene_cuts(df: DataFrame, min_mean_delta: int = 5) -> DataFrame:
    """Scene-change detection over Y4M video payloads: decode EVERY
    frame's full luma plane (Arrow-batched ``mapInPandas``, bytes never
    leave the executor), then flag frames whose mean-luma jump from the
    previous frame is at least ``min_mean_delta`` gray levels — the
    classic luma-difference shot-boundary detector (the first stage of
    any video-training-data curation pipeline: segment on cuts, then
    sample/caption per shot). Composition shape: decoded per-frame
    features enter a per-video ``lag`` window, so the shuffle carries
    only ``(doc_id, frame_index, luma_sum, plane)`` — a few dozen bytes
    per frame regardless of resolution; at 100 TB decode dominates and
    is embarrassingly parallel. The threshold comparison is exact
    integer arithmetic (``|Δsum| ≥ delta·plane``), so the cut set is
    engine-stable for the DuckDB oracle. Malformed payloads contribute
    zero rows (same degrade contract as every decoder here)."""
    require_at_least("min_mean_delta", min_mean_delta, 0)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [],
                "frame_index": [],
                "luma_sum": [],
                "plane": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                v = parse_y4m(bytes(payload))
                if v is None:
                    continue
                plane = v["width"] * v["height"]
                for i, frame in enumerate(v["frames"]):
                    rows["doc_id"].append(doc_id)
                    rows["frame_index"].append(i)
                    rows["luma_sum"].append(int(sum(frame)))
                    rows["plane"].append(plane)
            yield pd.DataFrame(rows)

    from pyspark.sql.window import Window

    feats = df.mapInPandas(
        gen, "doc_id bigint, frame_index int, luma_sum bigint, plane int"
    )
    w = Window.partitionBy("doc_id").orderBy("frame_index")
    return (
        feats.withColumn("prev_luma", F.lag("luma_sum").over(w))
        .filter(F.col("prev_luma").isNotNull())
        .withColumn(
            "delta_abs", F.abs(F.col("luma_sum") - F.col("prev_luma"))
        )
        .filter(
            F.col("delta_abs") >= F.lit(min_mean_delta) * F.col("plane")
        )
        .select(
            "doc_id",
            "frame_index",
            F.col("luma_sum").cast("bigint").alias("luma_sum"),
            F.col("delta_abs").cast("bigint").alias("delta_abs"),
        )
    )


#: One row per analysis window — the audio STFT-framing shape.
AUDIO_CHUNK_SCHEMA = (
    "doc_id bigint, chunk_index int, start_sample int, n_chunk_samples int, "
    "n_samples int, sample_rate int"
)

WAV_SAMPLE_RATE = 16000


def wav_bytes(sample_source: bytes, rate: int = WAV_SAMPLE_RATE) -> bytes:
    """A complete, valid 16-bit mono PCM WAV file (44-byte RIFF header
    + sample data truncated to whole samples)."""
    data = sample_source[: 2 * (len(sample_source) // 2)]
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def build_wav_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): real WAV bytes per document (16-bit mono PCM,
    sample data = the document's UTF-8 bytes) via an Arrow-batched
    pandas UDF."""

    @pandas_udf("binary")
    def make_wav(text: pd.Series) -> pd.Series:
        return pd.Series([wav_bytes(t.encode("utf-8")) for t in text])

    return docs.select("doc_id", make_wav(F.col("text")).alias("payload"))


def parse_wav_header(payload: bytes) -> dict | None:
    """Parse the RIFF/fmt/data chunks of a WAV payload (stdlib-only
    genuine decode: rate, channels, bit depth and the sample count all
    come from the actual header bytes)."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, rate, channels, bits = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        if cid == b"fmt " and pos + 8 + 16 <= len(payload):
            _, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, pos + 8
            )
        elif cid == b"data" and None not in (rate, channels, bits):
            bytes_per_sample = channels * bits // 8
            if bytes_per_sample <= 0:  # corrupt fmt chunk: skip, don't crash
                return None
            return {
                "rate": rate,
                "channels": channels,
                "bits": bits,
                "n_samples": size // bytes_per_sample,
                # Byte offset of the first sample. NOT always 44: the
                # chunk walk accepts WAVs with extra chunks (LIST, fact)
                # before 'data', and consumers that read samples must
                # start here or they fingerprint chunk metadata as audio.
                "data_offset": pos + 8,
            }
        pos += 8 + size + (size & 1)
    return None


def chunk_audio(
    df: DataFrame, window: int = 1024, hop: int = 512
) -> DataFrame:
    """Overlapping analysis-window chunking over WAV payloads, sample
    count and rate decoded from the actual RIFF header
    (:func:`parse_wav_header`).

    The audio counterpart of :func:`sample_frames`: a 1:N mapInPandas
    generator emitting one row per (possibly partial) window at hop
    spacing — the framing step every STFT/fbank/ASR pipeline starts
    with. Payloads that don't parse are skipped (emitting a quarantine
    stream instead is a one-line change). A soundfile/torchaudio decode
    slots into the same iterator for compressed codecs; PCM WAV needs
    only the header.
    """
    require_at_least("window", window, 1)
    require_at_least("hop", hop, 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [],
                "chunk_index": [],
                "start_sample": [],
                "n_chunk_samples": [],
                "n_samples": [],
                "sample_rate": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                hdr = parse_wav_header(payload)
                if hdr is None:
                    continue
                n_samples = hdr["n_samples"]
                idx = 0
                for start in range(0, n_samples, hop):
                    rows["doc_id"].append(doc_id)
                    rows["chunk_index"].append(idx)
                    rows["start_sample"].append(start)
                    rows["n_chunk_samples"].append(min(window, n_samples - start))
                    rows["n_samples"].append(n_samples)
                    rows["sample_rate"].append(hdr["rate"])
                    idx += 1
            yield pd.DataFrame(rows)

    return df.mapInPandas(gen, AUDIO_CHUNK_SCHEMA)


#: Geometry + checksum of the nearest-neighbor-resized pixel grid.
RESIZE_SCHEMA = (
    "doc_id bigint, old_w int, old_h int, new_w int, new_h int, "
    "out_n_bytes bigint, pixel_checksum bigint"
)


def resize_bmp_batch(df: DataFrame, factor: int = 2) -> DataFrame:
    """Nearest-neighbor image downsample over real BMP payloads — the
    resize stage of a multimodal ingest pipeline.

    Decodes the actual header (geometry from BITMAPINFOHEADER, pixels
    at the declared offset), keeps every ``factor``-th pixel in each
    axis of the stored pixel grid, and emits the resized geometry plus
    an exact byte checksum of the resized pixel array (the value the
    oracle re-derives from first principles). Same Arrow-batched
    ``mapInPandas`` memory contract as :func:`decode_batch`; a PIL
    ``Image.resize`` slots into the same iterator for entropy-coded
    formats, with interpolation replacing the pure subsample.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "doc_id", "old_w", "old_h", "new_w", "new_h",
                "out_n_bytes", "pixel_checksum",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if len(payload) < 54 or payload[:2] != b"BM":
                    continue
                (pix_offset,) = struct.unpack_from("<I", payload, 10)
                w, h = struct.unpack_from("<ii", payload, 18)
                h = abs(h)  # negative height = top-down row order
                # standards-correct stride: BMP rows pad to 4 bytes; a
                # truncated/corrupt payload is skipped, not crashed on
                # (a real corpus always contains some)
                stride = (w * 3 + 3) // 4 * 4
                if w <= 0 or h <= 0 or pix_offset < 54 or len(
                    payload
                ) < pix_offset + h * stride:
                    continue
                rows_bytes = np.frombuffer(
                    payload, dtype=np.uint8, count=h * stride, offset=pix_offset
                ).reshape(h, stride)
                grid = rows_bytes[:, : w * 3].reshape(h, w, 3)
                small = grid[::factor, ::factor, :]
                rows["doc_id"].append(doc_id)
                rows["old_w"].append(w)
                rows["old_h"].append(h)
                rows["new_w"].append(small.shape[1])
                rows["new_h"].append(small.shape[0])
                rows["out_n_bytes"].append(int(small.size))
                rows["pixel_checksum"].append(int(small.astype(np.int64).sum()))
            yield pd.DataFrame(rows)

    return df.mapInPandas(gen, RESIZE_SCHEMA)


def _fixture_paths(sf_dir: str, name: str):
    """(root, base) for a write-once payload fixture keyed by the source
    corpus vintage (size + mtime of documents.parquet), rooted at
    ``$SPARK_GRAFT_SHARED_TMP`` (default: local tempdir — see the
    cluster caveat in :func:`_materialize_payload_files`)."""
    import hashlib
    import os
    import tempfile
    from pathlib import Path

    src = Path(sf_dir) / "documents.parquet"
    st = src.stat()
    vintage = hashlib.md5(
        f"{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:10]
    root = Path(
        os.environ.get("SPARK_GRAFT_SHARED_TMP", tempfile.gettempdir())
    )
    return root, root / f"echem_{name}_{Path(sf_dir).name}_{vintage}"


def _materialize_payload_files(
    sf_dir: str, payloads: DataFrame, suffix: str
) -> str:
    """Build an on-disk payload fixture once per (corpus, format): one
    ``doc_<id>.<suffix>`` file per document (the reference's
    one-POSCAR-per-material sink shape, my_dag.py:40-44), so decode
    pipelines can exercise the real ``binaryFile`` SOURCE instead of
    building payloads in-engine.

    Files are written from the executors (Arrow-batched mapInPandas —
    no driver collect) into a staging dir, then promoted atomically via
    rename; a ``_SUCCESS`` marker gates reuse across sessions. The
    cache key folds in the source parquet's (size, mtime), so a
    regenerated corpus — a documented recurring event — invalidates the
    fixture instead of silently serving payloads built from the OLD
    documents while the oracle reads the new ones.

    The fixture root (both staging and the promoted dir) is
    ``$SPARK_GRAFT_SHARED_TMP``, defaulting to the local tempdir. The
    default is LOCAL-MODE-ONLY: executor tasks open plain paths, so on
    a multi-node cluster the env var must point at storage every node
    mounts at the same path (NFS/FUSE-mounted object store) — a
    node-local default would scatter files across machines and promote
    a partial fixture. Staging lives under the same root so the
    promote rename stays a same-filesystem atomic op.
    """
    import os
    import shutil
    import tempfile
    from pathlib import Path

    root, base = _fixture_paths(sf_dir, f"{suffix}_files")
    if (base / "_SUCCESS").exists():
        return str(base)
    if base.exists():  # crashed prior build: discard and rebuild
        shutil.rmtree(base, ignore_errors=True)
    staging = Path(tempfile.mkdtemp(prefix=f"echem_{suffix}_staging_", dir=root))

    def write_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                with open(staging / f"doc_{int(did)}.{suffix}", "wb") as f:
                    f.write(payload)
            yield pd.DataFrame({"n": [len(pdf)]})

    payloads.mapInPandas(write_files, "n bigint").write.format("noop").mode(
        "overwrite"
    ).save()
    try:
        os.rename(staging, base)
        (base / "_SUCCESS").touch()
    except OSError:  # concurrent builder promoted first
        shutil.rmtree(staging, ignore_errors=True)
    return str(base)


def materialize_bmp_files(spark, sf_dir: str, docs: DataFrame) -> str:
    """On-disk BMP fixture (see :func:`_materialize_payload_files`)."""
    return _materialize_payload_files(sf_dir, build_bmp_payload(docs), "bmp")


def materialize_wav_files(spark, sf_dir: str, docs: DataFrame) -> str:
    """On-disk WAV fixture (see :func:`_materialize_payload_files`)."""
    return _materialize_payload_files(sf_dir, build_wav_payload(docs), "wav")


def materialize_bmp_parquet(spark, sf_dir: str, docs: DataFrame) -> str:
    """COLUMNAR payload fixture: the same BMP bytes as
    :func:`materialize_bmp_files`, stored as a ``binary`` column in
    parquet instead of one file per document.

    This is the 100 TB ingestion layout — millions of payloads pack
    into a bounded number of parquet files, the scan is a normal
    columnar read (payload pruned away when untouched), and nothing
    scales with document COUNT the way per-file listing does. The
    one-file-per-record ``binaryFile`` fixture stays registered for
    genuine file-drop ingestion; SCALE.md documents the crossover.

    Write-once per corpus vintage; the promote rename makes re-entrant
    and concurrent builds safe, and readers of an already-promoted
    fixture are never invalidated (the dir is immutable once
    ``_SUCCESS`` — Spark's own marker — exists).
    """
    import os
    import shutil
    import tempfile
    from pathlib import Path

    root, base = _fixture_paths(sf_dir, "bmp_parquet")
    if (base / "_SUCCESS").exists():
        return str(base)
    if base.exists():  # crashed prior build: discard and rebuild
        shutil.rmtree(base, ignore_errors=True)
    staging = Path(
        tempfile.mkdtemp(prefix="echem_bmp_parquet_staging_", dir=root)
    )
    out = staging / "data"
    build_bmp_payload(docs).write.parquet(str(out))
    try:
        os.rename(out, base)
    except OSError:  # concurrent builder promoted first
        pass
    shutil.rmtree(staging, ignore_errors=True)
    return str(base)


def read_payload_files(spark, path: str, suffix: str) -> DataFrame:
    """The ``binaryFile`` source (SURVEY §2.1 S1/S2 mapping): one row
    per file with (path, modificationTime, length, content); the doc id
    is recovered from the file name and the raw bytes become the opaque
    payload column every downstream decode stage consumes. The format
    supports partition-parallel listing and predicate pushdown on the
    metadata columns (e.g. ``length <`` caps decode input size)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"*.{suffix}")
        .load(path)
        .select(
            F.regexp_extract(F.col("path"), rf"doc_(\d+)\.{suffix}$", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("content").alias("payload"),
        )
    )


def read_bmp_files(spark, path: str) -> DataFrame:
    """BMP ``binaryFile`` scan (see :func:`read_payload_files`)."""
    return read_payload_files(spark, path, "bmp")


def ahash_bmp(payload: bytes, n_bits: int = 62) -> int | None:
    """Perceptual AVERAGE HASH of a BMP payload, integer-exact.

    The classic aHash recipe (mean-threshold bits over the pixel
    grid) with two determinism tweaks so any engine reproduces it
    bit-for-bit: (a) the threshold compare is cross-multiplied
    (``pixel * n > sum``) instead of ``pixel > sum/n`` — no float
    mean, no rounding-mode dependence; (b) the bit window is capped
    at 62 bits so the packed hash stays a POSITIVE int64 in engines
    with signed-only bigints. Geometry comes from the actual header
    (struct.unpack), pixels from the offset the header declares —
    the real decode path, same as :func:`decode_bmp`, including its
    corrupt-payload contract: a malformed payload hashes to ``None``
    (null), which every downstream equi-join drops — corrupt images
    can neither crash the job nor bucket together into false dup
    pairs (a sentinel 0 would do exactly that).
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    (pix_offset,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    n = width * height * 3
    px = payload[pix_offset : pix_offset + n]
    total = sum(px)
    h = 0
    for i in range(min(n_bits, len(px))):
        if px[i] * n > total:
            h |= 1 << i
    return h


def ahash_batch(df: DataFrame) -> DataFrame:
    """(doc_id, payload) → (doc_id, ahash): Arrow-batched perceptual
    hashing; one int64 out per image, so the downstream dup-pair join
    moves 8-byte hashes, never pixels."""

    @pandas_udf("bigint")
    def _ahash(payload: pd.Series) -> pd.Series:
        # dtype='object' is load-bearing: a batch mixing valid hashes
        # with a None (corrupt payload) would otherwise coerce to
        # float64 and silently round 62-bit hashes (same contract as
        # audio_fingerprint_batch).
        return pd.Series(
            [ahash_bmp(bytes(p)) for p in payload], dtype="object"
        )

    return df.select("doc_id", _ahash(F.col("payload")).alias("ahash"))


def audio_fingerprint(payload: bytes, frame: int = 8, n_bits: int = 62) -> int | None:
    """Energy-delta audio FINGERPRINT of a PCM WAV payload,
    integer-exact (the simplified Shazam/Chromaprint recipe: one bit
    per frame boundary, set when the next frame is louder).

    Frames are ``frame`` consecutive int16 samples; a frame's energy
    is the sum of ABSOLUTE sample values (integer, overflow-safe —
    squares would also fit int64 but buy nothing for a sign test);
    bit i = energy(frame i+1) > energy(frame i), packed little-endian
    over the first ``n_bits`` boundaries so the hash stays a positive
    int64. Geometry (rate/channels/bits/sample count) comes from the
    actual RIFF header via :func:`parse_wav_header`; malformed
    payloads fingerprint to ``None`` (null), which downstream
    equi-joins drop — same skip-don't-crash contract as
    :func:`ahash_bmp`. Only FULL frames participate, so a trailing
    partial frame can't make equal audio fingerprint unequal.
    """
    hdr = parse_wav_header(payload)
    if hdr is None or hdr["bits"] != 16 or hdr["channels"] != 1:
        return None
    off = hdr["data_offset"]
    data = payload[off : off + 2 * hdr["n_samples"]]
    n_frames = len(data) // (2 * frame)
    if n_frames < 2:
        return None
    energies = []
    for k in range(n_frames):
        e = 0
        for j in range(frame):
            off = (k * frame + j) * 2
            v = int.from_bytes(data[off : off + 2], "little", signed=True)
            e += v if v >= 0 else -v
        energies.append(e)
    h = 0
    for i in range(min(n_bits, n_frames - 1)):
        if energies[i + 1] > energies[i]:
            h |= 1 << i
    return h


def audio_fingerprint_batch(df: DataFrame) -> DataFrame:
    """(doc_id, payload) → (doc_id, afp): Arrow-batched fingerprinting;
    one int64 out per clip, so the dup-pair join moves 8-byte
    fingerprints, never samples."""

    @pandas_udf("bigint")
    def _afp(payload: pd.Series) -> pd.Series:
        return pd.Series(
            [audio_fingerprint(bytes(p)) for p in payload],
            dtype="object",
        )

    return df.select("doc_id", _afp(F.col("payload")).alias("afp"))
