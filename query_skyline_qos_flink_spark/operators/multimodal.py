"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the payload is an opaque ``binary``
column that flows through Arrow record batches into ``mapInPandas`` workers;
decode / feature-extract / resize / frame-sample are per-batch Python
functions over those bytes.  Spark never interprets the payload — schema,
partitioning, batch shape and UDF signatures are the real, tested plumbing.

The actual codecs (pillow / ffmpeg / librosa) are NOT available in this
environment, so :func:`decode_image` / :func:`decode_audio` raise
``NotImplementedError`` at the clearly-marked integration point, and the
default pipeline uses :func:`fake_decode_meta` — a deterministic stand-in
computed purely from the bytes (length/md5 arithmetic) so tests and the
duckdb oracle can validate the full Spark-side path end to end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

META_SCHEMA = (
    "n_bytes bigint, content_md5 string, fake_width bigint, fake_height bigint, "
    "fake_frames bigint"
)


def attach_binary(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary payload column (UTF-8 bytes of a text
    column in the fixtures; in production this is the raw image/audio
    bytes read from object storage)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def decode_image(payload: bytes):  # pragma: no cover - integration stub
    """STUB: wire a real image decoder (e.g. pillow) here.

    Signature contract: bytes -> (height, width, channels, ndarray)."""
    raise NotImplementedError(
        "image decoding requires an image codec (e.g. pillow), which is not "
        "available in this environment; plug your decoder into "
        "extract_media_meta(decode_fn=...)"
    )


def decode_audio(payload: bytes):  # pragma: no cover - integration stub
    """STUB: wire a real audio decoder (e.g. soundfile/librosa) here."""
    raise NotImplementedError(
        "audio decoding requires an audio codec, which is not available in "
        "this environment; plug your decoder into extract_media_meta(decode_fn=...)"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, str, int, int, int]:
    """Deterministic stand-in 'decode': metadata derived only from bytes."""
    n = len(payload)
    md5 = hashlib.md5(payload).hexdigest()
    return n, md5, n % 640, (n * 7) % 480, n % 16 + 1


def extract_media_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decode_fn: Callable[[bytes], tuple] = fake_decode_meta,
) -> DataFrame:
    """Per-payload metadata via mapInPandas (Arrow binary batches).

    ``decode_fn`` is the integration point for real codecs; the default is
    the deterministic fake so the plumbing is testable without media libs.
    """
    id_field = df.schema[id_col]
    schema = f"{id_col} {id_field.dataType.simpleString()}, {META_SCHEMA}"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            metas = [decode_fn(bytes(p)) for p in pdf[payload_col]]
            out = pd.DataFrame(
                metas,
                columns=["n_bytes", "content_md5", "fake_width", "fake_height", "fake_frames"],
            )
            out.insert(0, id_col, pdf[id_col].to_numpy())
            yield out

    return df.select(id_col, payload_col).mapInPandas(fn, schema=schema)


def fake_frame_digest(payload: bytes, frame_idx: int) -> str:
    """Deterministic stand-in for 'decode frame i and fingerprint it'."""
    return hashlib.md5(payload + b":" + str(frame_idx).encode()).hexdigest()


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    n_frames_col: str = "fake_frames",
    id_col: str = "doc_id",
    max_frames: int = 4,
    frame_fn: Callable[[bytes, int], str] = fake_frame_digest,
) -> DataFrame:
    """Video-style frame sampling plumbing: explode each payload into up to
    ``max_frames`` evenly-strided frames (``idx_j = j * n_frames div
    n_samples``, integer arithmetic -> SQL-replicable), one output row per
    frame, processed batch-wise in ``mapInPandas``.

    ``frame_fn`` is the real-decoder integration point (ffmpeg frame
    extraction in production); the default hashes payload+index so the
    Spark-side fan-out — the part that matters for partitioning and
    shuffle volume — is testable and oracle-checkable without codecs.
    Output grows ×``min(max_frames, n_frames)`` per row; at scale, cap
    partition input sizes via ``spark.sql.files.maxPartitionBytes`` so the
    exploded Arrow batches stay within executor memory."""
    id_field = df.schema[id_col]
    schema = (
        f"{id_col} {id_field.dataType.simpleString()}, "
        "frame_idx bigint, frame_md5 string"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, idxs, digests = [], [], []
            for rid, payload, nf in zip(
                pdf[id_col], pdf[payload_col], pdf[n_frames_col]
            ):
                b = bytes(payload)
                ns = min(max_frames, int(nf))
                for j in range(ns):
                    fi = j * int(nf) // ns
                    ids.append(rid)
                    idxs.append(fi)
                    digests.append(frame_fn(b, fi))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_md5": digests}
            )

    return df.select(id_col, payload_col, n_frames_col).mapInPandas(fn, schema=schema)
