"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns beside a typed metadata
struct; decode / feature-extraction / frame-sampling run as Arrow-batched
``mapInPandas`` stages so the (CPU-heavy) per-item work parallelizes
per-partition and never round-trips through the driver.

The actual codec step is STUBBED: image/audio libraries are not in this
container, so :func:`decode_media` raises ``NotImplementedError`` and the
pipeline uses :func:`fake_decode_features` — a deterministic byte-level
stand-in with the same schema/partitioning/batch shape, keeping every
Spark-side contract real and testable.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_s", T.DoubleType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_entropy", T.DoubleType(), False),
        T.StructField("head_hash", T.StringType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def decode_media(data: bytes, kind: str):
    """Real codec hook — requires PIL/librosa/av, absent in this container.

    Swap this in on a cluster with the media libraries installed; the
    surrounding mapInPandas plumbing is unchanged.
    """
    raise NotImplementedError(
        "media codecs (PIL/librosa/av) are not available in this environment; "
        "use fake_decode_features for the deterministic stand-in"
    )


def fake_decode_features(data: bytes) -> tuple[int, float, str]:
    """Deterministic byte-level 'decode': size, 0-order entropy, head hash."""
    n = len(data)
    counts: dict[int, int] = {}
    for byte in data:
        counts[byte] = counts.get(byte, 0) + 1
    entropy = -sum((c / n) * math.log2(c / n) for c in counts.values()) if n else 0.0
    return n, round(entropy, 6), hashlib.md5(data[:64]).hexdigest()


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from the documents fixture: utf-8 payloads
    with kind/meta derived from doc_id — real binary columns for testing
    the plumbing without shipping media files."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    meta = F.struct(
        F.when(kind == "image", (F.col("n_chars") % 640 + 1).cast("int")).alias("width"),
        F.when(kind == "image", (F.col("n_chars") % 480 + 1).cast("int")).alias("height"),
        F.when(kind == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
        F.when(kind != "image", F.col("n_chars") / 100.0).alias("duration_s"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("data"),
        meta.alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_decode_features(bytes(d)) for d in pdf["data"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [f[0] for f in feats],
                    "byte_entropy": [f[1] for f in feats],
                    "head_hash": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("data", T.BinaryType(), False),
    ]
)


def resize_images(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Image resize stand-in: aspect-preserving downscale to ``max_side``.

    Real plumbing, fake kernel: target dimensions come from the typed
    ``meta`` struct (aspect ratio preserved, never upscaled — the real
    contract a PIL ``thumbnail`` call would honor), and the payload is
    deterministically subsampled to width×height bytes, standing in for
    pixel resampling.  Only ``kind = 'image'`` rows are processed — the
    filter sits BEFORE the Python stage so Catalyst prunes other media at
    the scan, not in the UDF.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_w, out_h, out_data = [], [], [], []
            for mid, meta, data in zip(pdf["media_id"], pdf["meta"], pdf["data"]):
                w, h = int(meta["width"]), int(meta["height"])
                scale = min(max_side / max(w, h), 1.0)
                nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
                raw = bytes(data)
                target = nw * nh
                if len(raw) >= target > 0:
                    step = len(raw) / target
                    resized = bytes(raw[int(i * step)] for i in range(target))
                else:
                    resized = raw.ljust(target, b"\x00")
                out_id.append(mid)
                out_w.append(nw)
                out_h.append(nh)
                out_data.append(resized)
            yield pd.DataFrame(
                {"media_id": out_id, "width": out_w, "height": out_h, "data": out_data}
            )

    return media.filter(F.col("kind") == "image").mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 64, every_n: int = 4) -> DataFrame:
    """Frame sampling stand-in: split payload into fixed-size chunks, keep
    every ``every_n``-th — the same shape a video frame sampler produces
    (media_id, frame_idx, binary frame)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_frame = [], [], []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                raw = bytes(data)
                frames = [
                    raw[i : i + frame_bytes]
                    for i in range(0, len(raw), frame_bytes)
                ]
                for idx in range(0, len(frames), every_n):
                    out_id.append(mid)
                    out_idx.append(idx)
                    out_frame.append(frames[idx])
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "frame": out_frame}
            )

    return media.mapInPandas(run, FRAME_SCHEMA)
