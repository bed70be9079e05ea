"""Multimodal (image/audio/video) column plumbing.

Design: media lives in opaque ``binary`` columns with a typed metadata
struct alongside (mime, width/height or sample_rate/duration, source_uri).
All decode / feature-extract steps are Arrow-batched Pandas iterators via
``mapInPandas`` — the payload never crosses the JVM<->Python boundary
row-at-a-time, and each batch is one contiguous Arrow buffer.

The actual codec calls are STUBBED in this environment (no PIL/ffmpeg in
the container): ``decode_image_meta`` parses real PNG/JPEG headers with
pure-Python struct reads (deterministic, testable), and the feature
extractor is a documented deterministic fake behind the same signature a
real model-embedding UDF would use. The Spark-side contract — schemas,
batch iteration, partitioning — is real and tested.

Scale notes: binary payloads make *row size*, not row count, the planning
unit. ``repartition_for_payload`` sizes partitions by payload bytes so a
partition of 4K images and a partition of 4K videos both fit executor
memory. Never groupBy/shuffle the binary column itself — project metadata
out first and join back by key if regrouping is needed.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def parse_image_header(payload: bytes | None) -> tuple[str | None, int | None, int | None, int]:
    """Pure-Python PNG/JPEG/GIF header sniff — the honest part of decode
    that needs no codec library."""
    if not payload:
        return None, None, None, 0
    n = len(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and n >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return "png", w, h, n
    if payload[:3] == b"GIF" and n >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return "gif", w, h, n
    if payload[:2] == b"\xff\xd8":  # JPEG: walk segments to SOF0/2
        i = 2
        while i + 9 < n:
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker in (0xC0, 0xC2):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return "jpeg", w, h, n
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return "jpeg", None, None, n
    return "unknown", None, None, n


def with_image_meta(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Attach the typed metadata struct by header-sniffing the payload.

    mapInPandas keeps every input column and appends ``meta`` — Arrow moves
    the binary column in whole batches.
    """
    out_schema = T.StructType(df.schema.fields + [T.StructField("meta", IMAGE_META_SCHEMA)])

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_image_header(p) for p in pdf[binary_col]]
            pdf = pdf.copy()
            pdf["meta"] = [
                {"format": f, "width": w, "height": h, "n_bytes": b}
                for f, w, h, b in metas
            ]
            yield pdf

    return df.mapInPandas(scan, out_schema)


def decode_image(payload: bytes) -> "object":
    """Full pixel decode — requires a codec library not present in this
    container. Deliberate stub; the real implementation returns an
    ndarray(h, w, c) and slots into extract_features below unchanged."""
    raise NotImplementedError(
        "pixel decode needs PIL/opencv; not available in this environment"
    )


FEATURE_SCHEMA = "id long, feature array<float>"


def extract_features(
    df: DataFrame, *, id_col: str = "id", binary_col: str = "payload", dim: int = 8
) -> DataFrame:
    """Deterministic fake feature extractor with the real contract.

    Stands in for a model-embedding step: consumes Arrow batches of binary
    payloads, emits (id, feature array<float>). The fake derives features
    from byte statistics so tests get stable values; a real model swaps the
    body, not the plumbing.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[binary_col]:
                p = p or b""
                # chunk byte-sums -> fixed-dim vector, normalized
                chunks = [p[i::dim] for i in range(dim)]
                v = [float(sum(c) % 997) / 997.0 for c in chunks]
                feats.append(v)
            yield pd.DataFrame({"id": pdf[id_col], "feature": feats})

    return df.mapInPandas(featurize, FEATURE_SCHEMA)


def repartition_for_payload(
    df: DataFrame, *, size_col_bytes: str, target_partition_mb: int = 256
) -> DataFrame:
    """Repartition so each partition holds ~target MB of payload — row
    count is meaningless when rows carry multi-MB media."""
    total = df.agg(F.sum(size_col_bytes)).first()[0] or 0
    n = max(1, int(total / (target_partition_mb * 1024 * 1024)))
    return df.repartition(n)


RESIZE_SCHEMA = "id long, payload binary, width int, height int"


def resize_images(
    df: DataFrame,
    *,
    id_col: str = "id",
    binary_col: str = "payload",
    target: tuple[int, int] = (224, 224),
) -> DataFrame:
    """Resize contract: (id, payload, width, height) out, Arrow-batched.

    Real pixel resampling needs a codec lib (absent here) — the stub
    re-emits the payload with the target dimensions recorded, keeping the
    schema/batching/partitioning path fully exercisable. A PIL-backed body
    replaces only the inner loop.
    """

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        w, h = target
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "payload": pdf[binary_col],  # stub: bytes unchanged
                    "width": w,
                    "height": h,
                }
            )

    return df.mapInPandas(do, RESIZE_SCHEMA)


FRAME_SCHEMA = "id long, frame_idx int, frame binary"


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "id",
    binary_col: str = "payload",
    every_n_bytes: int = 4096,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling contract for video payloads: one output row per
    sampled frame (id, frame_idx, frame). Without ffmpeg the "frames" are
    deterministic byte windows — the row-explosion shape (rows out >> rows
    in, payload sliced not copied whole) is the part that matters for the
    Spark plan, and it is real.
    """

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, p in zip(pdf[id_col], pdf[binary_col]):
                p = p or b""
                for k in range(min(max_frames, max(1, len(p) // every_n_bytes))):
                    ids.append(i)
                    idxs.append(k)
                    frames.append(p[k * every_n_bytes : (k + 1) * every_n_bytes])
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(do, FRAME_SCHEMA)
