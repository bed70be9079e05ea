"""End-to-end multimodal curation, composed exactly as a user would:
mixed image/video binaries -> metadata probe -> payload-aware
repartition -> real pixel decode (PPM/BMP/PNG/baseline-JPEG; MJPEG AVI
frames) -> resize to a training shape -> feature extraction -> embedding
near-dup candidates.

Run:  python examples/multimodal_pipeline.py [out_dir]

The synthetic testdata carries no binary columns, so the example builds
a small in-memory corpus of REAL encoded payloads (the same encoders the
test suite uses) — the point is the pipeline shape: every stage is an
Arrow-batched mapInPandas over binary columns, partitioned by payload
bytes rather than row count, with the decode matrix exactly as wide as
the pure-numpy codecs allow and everything else passing through typed
and accounted for.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_bigquery_pipeline_spark.multimodal import binary_ops, video_ops
from etl_bigquery_pipeline_spark.operators import similarity
from etl_bigquery_pipeline_spark.session import get_session


def _demo_corpus(spark):
    """Rows of (id, kind, payload): JPEGs, a PNG, a BMP, an MJPEG AVI,
    and one junk payload — the mixed bag a crawl actually yields."""
    import struct

    import numpy as np

    _root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(_root, "tests"))
    from jpeg_fixture import encode_baseline_jpeg

    def bmp(arr):
        h, w = arr.shape[:2]
        row = w * 3
        pad = (4 - row % 4) % 4
        body = b"".join(
            arr[r, :, ::-1].tobytes() + b"\x00" * pad
            for r in range(h - 1, -1, -1)
        )
        return (
            b"BM"
            + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
            + struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0
            )
        ) + body

    def mjpeg_avi(jpegs, w, h, fps=5):
        us = int(1e6 / fps)
        avih = (
            struct.pack("<IIII", us, 0, 0, 0)
            + struct.pack("<IIII", len(jpegs), 0, 1, 0)
            + struct.pack("<II", w, h)
            + b"\x00" * 16
        )
        hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
        movi = b"movi" + b"".join(
            b"00dc" + struct.pack("<I", len(j)) + j + b"\x00" * (len(j) % 2)
            for j in jpegs
        )
        body = (
            b"AVI "
            + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
            + b"LIST" + struct.pack("<I", len(movi)) + movi
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    rng = np.random.RandomState(11)
    rows = []
    for i in range(6):  # three near-identical pairs of JPEGs
        base = rng.randint(0, 200, (32, 32, 3)).astype(np.uint8)
        rows.append((i, "image", encode_baseline_jpeg(base // 2 * 2)))
    rows.append((10, "image", binary_ops.encode_ppm(rng.randint(0, 255, (16, 16, 3)).astype("uint8"))))
    rows.append((11, "image", bmp(rng.randint(0, 255, (12, 12, 3)).astype("uint8"))))
    # the full decode matrix: progressive JPEG, Adam7 PNG, GIF
    from gif_fixture import encode_gif
    from jpeg_fixture import encode_progressive_jpeg
    from test_multimodal import _encode_png

    rows.append((12, "image", encode_progressive_jpeg(
        rng.randint(0, 200, (20, 20, 3)).astype(np.uint8), script="sa")))
    rows.append((13, "image", _encode_png(
        rng.randint(0, 255, (14, 14, 3)).astype(np.uint8), [0, 1, 2, 3, 4],
        interlace=True)))
    pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    rows.append((14, "image", encode_gif(
        rng.randint(0, 16, (10, 10)).astype(np.uint8), pal)))
    frames = [
        encode_baseline_jpeg(
            np.full((16, 16, 3), (40 * k, 80, 120), dtype=np.uint8)
        )
        for k in range(4)
    ]
    rows.append((20, "video", mjpeg_avi(frames, 16, 16)))
    rows.append((99, "junk", b"not media"))
    return spark.createDataFrame(rows, "id long, kind string, payload binary")


def run(spark, out_dir: str) -> dict:
    corpus = _demo_corpus(spark)

    # 1. Probe + account for every payload before spending decode CPU.
    images = binary_ops.with_image_meta(
        corpus.filter(F.col("kind") == "image")
    )
    # payload-aware partitioning: rows are MBs, row counts lie
    images = binary_ops.repartition_for_payload(
        images.withColumn("n_bytes", F.col("meta.n_bytes")),
        size_col_bytes="n_bytes",
    )

    # 2. Videos: real MJPEG frame extraction, frames re-enter the image
    #    path as PPM payloads.
    frames = video_ops.extract_mjpeg_frames(
        corpus.filter(F.col("kind") == "video"), id_col="id", every_n=2
    ).select(
        (F.col("id") * 1000 + F.col("frame_idx")).alias("id"),
        F.col("frame").alias("payload"),
    )

    # 3. One resize matrix for both modalities.
    unified = images.select("id", "payload").unionByName(frames)
    resized = binary_ops.resize_images(unified, target=(8, 8))

    # 4. Features over the resized payloads -> near-dup candidates by
    #    hyperplane LSH over the feature vectors.
    feats = binary_ops.extract_features(
        resized.filter(F.col("resized")), dim=8
    ).withColumn("feature", F.col("feature").cast("array<float>"))
    pairs = similarity.embedding_near_dup_pairs(
        feats, id_col="id", vec_col="feature", dim=8, bands=2, band_bits=3,
        seed=7, threshold=0.98,
    )

    resized.write.mode("overwrite").parquet(out_dir)
    return {
        "n_payloads": corpus.count(),
        "n_resized": resized.filter(F.col("resized")).count(),
        "n_passthrough": resized.filter(~F.col("resized")).count(),
        "n_candidate_pairs": pairs.count(),
    }


def main() -> None:
    # argv convention matches the sibling examples: argv[1] is the
    # (ignored) sf_dir, argv[2] the output dir. Earlier versions took
    # out_dir as argv[1], which silently turned a testdata path passed
    # positionally into an overwrite target.
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/multimodal_out"
    if len(sys.argv) == 2 and "/testdata/" not in sys.argv[1]:
        out_dir = sys.argv[1]
    if "/testdata/" in out_dir:
        raise SystemExit(f"refusing to write into testdata: {out_dir}")
    spark = get_session("multimodal-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    print(run(spark, out_dir))
    spark.stop()


if __name__ == "__main__":
    main()
