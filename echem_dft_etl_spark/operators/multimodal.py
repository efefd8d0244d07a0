"""Multimodal column plumbing (LLM-data-pipeline extension).

Images/audio/video ride through the engine as opaque ``binary`` columns
with a typed metadata struct alongside — the pattern that scales to
100 TB: payload bytes never pass through Python except inside the
Arrow-batched decode UDF, partitioning/shuffle operate on the (small)
metadata columns, and column pruning drops the payload whenever a query
doesn't touch it.

The decode step itself is environment-dependent (image/audio libs are
NOT in this container) so it is stubbed behind ``decode_image_stub`` —
a deterministic fake with the real signature, batch shape and schema.
Swapping in PIL/librosa is a one-function change; everything around it
(schema, mapInPandas iterator contract, metadata derivation, batch
sizing) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Declared output schema of the decode stage.
DECODE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, format string, "
    "width int, height int, feature_sum bigint"
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Materialize an opaque binary payload + metadata struct.

    In production this column arrives from the source (image bytes in
    parquet/iceberg); here it is derived deterministically from text so
    the plumbing is exercised end-to-end on the standard corpus.
    """
    payload = F.encode(F.col("text"), "UTF-8")
    meta = F.struct(
        F.lit("fake/raw").alias("format"),
        (F.pmod(F.col("doc_id"), F.lit(4)) * 64 + 64).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), F.lit(3)) * 64 + 64).cast("int").alias("height"),
    )
    return docs.select("doc_id", payload.alias("payload"), meta.alias("meta"))


def decode_image_stub(payload: bytes) -> dict:
    """Deterministic fake decoder (STUB — container has no image libs).

    Real implementation would be e.g.::

        from PIL import Image
        img = Image.open(io.BytesIO(payload))  # NotImplementedError here

    The fake emits byte-level features so correctness of the
    surrounding plumbing (batching, schema, aggregation) is testable.
    """
    return {
        "n_bytes": len(payload),
        "feature_sum": int(sum(payload[:64])),
    }


def decode_batch(df: DataFrame) -> DataFrame:
    """Arrow-batched decode via mapInPandas.

    Iterator-of-batches signature: each pandas batch holds a bounded
    number of payloads (bounded by spark.sql.execution.arrow.
    maxRecordsPerBatch), so executor memory is independent of partition
    size — the property that matters when payloads are megabyte images
    rather than kilobyte texts.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "format": [m["format"] for m in pdf["meta"]],
                    "width": [m["width"] for m in pdf["meta"]],
                    "height": [m["height"] for m in pdf["meta"]],
                    "feature_sum": [f["feature_sum"] for f in feats],
                }
            )

    return df.mapInPandas(decode, DECODE_SCHEMA)


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


#: One row per analysis window — the audio STFT-framing shape.
AUDIO_CHUNK_SCHEMA = (
    "doc_id bigint, chunk_index int, start_sample int, n_chunk_samples int, "
    "n_samples int"
)


def chunk_audio(
    df: DataFrame, window: int = 1024, hop: int = 512
) -> DataFrame:
    """Overlapping analysis-window chunking over an opaque audio payload
    (STUB decode: 16-bit mono, ``n_samples = len(payload) // 2``).

    The audio counterpart of :func:`sample_frames`: a 1:N mapInPandas
    generator emitting one row per (possibly partial) window at hop
    spacing — the framing step every STFT/fbank/ASR pipeline starts
    with. A real decoder (soundfile / torchaudio) replaces the sample
    count; the Spark-side contract (schema, batching, overlap
    arithmetic) is what's exercised here.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [],
                "chunk_index": [],
                "start_sample": [],
                "n_chunk_samples": [],
                "n_samples": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_samples = len(payload) // 2
                idx = 0
                for start in range(0, n_samples, hop):
                    rows["doc_id"].append(doc_id)
                    rows["chunk_index"].append(idx)
                    rows["start_sample"].append(start)
                    rows["n_chunk_samples"].append(min(window, n_samples - start))
                    rows["n_samples"].append(n_samples)
                    idx += 1
            yield pd.DataFrame(rows)

    return df.mapInPandas(gen, AUDIO_CHUNK_SCHEMA)
