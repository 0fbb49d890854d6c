"""Multimodal columns (BASELINE.json north-star): image/audio/video
as opaque ``binary`` columns with typed metadata.

Design for 100 TB: media bytes live in the ``content`` binary column
(or, above ~1 MB/object, as object-store URIs with content here set
NULL — the schema carries both). Decode / feature-extract run as
Arrow-batched ``mapInPandas`` so each task touches a whole batch of
blobs without per-row Python overhead, and partitioning stays by the
id key so downstream joins co-locate.

The actual pixel/sample decoding needs imaging/audio libraries that
are NOT in this environment — ``decode_image`` is therefore a
clearly-marked stub: real Spark-side plumbing (schema, batching, UDF
signature), deterministic fake decode behind ``fake=True``, and
``NotImplementedError`` otherwise.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("uri", T.StringType(), True),  # object-store pointer
        T.StructField("content", T.BinaryType(), True),  # inline bytes (small)
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media fixture: content = repeated md5 bytes
    keyed by id (seed-free, reproducible everywhere)."""
    rows = []
    for i in range(n):
        blob = (hashlib.md5(f"media-{i}".encode()).digest() * (4 + i % 13))[: 64 + i]
        kind = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                kind,
                f"s3://bucket/media/{i}",
                bytearray(blob),
                64 + i if kind == "image" else None,
                48 + i if kind == "image" else None,
                1000 * (i + 1) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def with_media_stats(media: DataFrame) -> DataFrame:
    """Metadata extraction over the binary column — pure built-ins:
    byte length, md5 content hash, leading magic bytes."""
    return (
        media.withColumn("n_bytes", F.length("content"))
        .withColumn("content_md5", F.md5("content"))
        .withColumn("magic", F.hex(F.expr("substring(content, 1, 4)")))
    )


def decode_image(media: DataFrame, fake: bool = True) -> DataFrame:
    """Image decode → (media_id, height, width, mean_intensity).

    Real decoding requires an imaging library absent from this
    container — the Spark plumbing (Arrow batch iterator, output
    schema, id passthrough) is real; the pixel math is a deterministic
    fake (byte-mean over the blob) behind ``fake=True``.
    """
    out_schema = "media_id long, height int, width int, mean_intensity double"

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decoding requires an imaging library (e.g. Pillow) "
                    "not available in this environment"
                )
            rows = pdf[pdf["media_type"] == "image"]
            yield pd.DataFrame(
                {
                    "media_id": rows["media_id"],
                    "height": rows["height"].astype("Int32"),
                    "width": rows["width"].astype("Int32"),
                    "mean_intensity": [
                        round(sum(b) / len(b), 4) if b is not None and len(b) else None
                        for b in rows["content"]
                    ],
                }
            )

    return media.mapInPandas(decode, schema=out_schema)


def resize_image(
    media: DataFrame, width: int = 32, height: int = 32, fake: bool = True
) -> DataFrame:
    """Image resize → (media_id, width, height, content).

    The Spark plumbing (Arrow batches, binary-in/binary-out schema,
    target dimensions closed over into the UDF) is real; the pixel
    resample is a deterministic fake — the blob is stride-sampled to
    exactly ``width*height`` bytes (repeating when shorter), which
    preserves the real operator's shape contract: fixed-size output
    per row, verifiable downstream.
    """
    out_schema = "media_id long, width int, height int, content binary"
    target = width * height

    def resize(batches):
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires an imaging library (e.g. Pillow) "
                    "not available in this environment"
                )
            rows = pdf[pdf["media_type"] == "image"]
            out = []
            for b in rows["content"]:
                if b is None or not len(b):
                    out.append(None)
                    continue
                raw = bytes(b)
                reps = (target + len(raw) - 1) // len(raw)
                out.append((raw * reps)[:target])
            yield pd.DataFrame(
                {
                    "media_id": rows["media_id"],
                    "width": width,
                    "height": height,
                    "content": out,
                }
            )

    return media.mapInPandas(resize, schema=out_schema)


def audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Audio feature extraction → (media_id, duration_ms, rms,
    zero_crossings).

    Real feature extraction needs an audio codec library; the fake
    treats the blob's bytes as centered 8-bit samples — RMS and
    zero-crossing count are computed with numpy over the whole Arrow
    batch, which is exactly the shape the real implementation takes.
    """
    out_schema = "media_id long, duration_ms int, rms double, zero_crossings int"

    def extract(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio decoding requires an audio library "
                    "not available in this environment"
                )
            rows = pdf[pdf["media_type"] == "audio"]
            rms, zc = [], []
            for b in rows["content"]:
                if b is None or not len(b):
                    rms.append(None)
                    zc.append(None)
                    continue
                samples = np.frombuffer(bytes(b), dtype=np.uint8).astype(
                    np.float64
                ) - 128.0
                rms.append(round(float(np.sqrt((samples**2).mean())), 4))
                signs = np.sign(samples)
                signs = signs[signs != 0]
                zc.append(int((signs[1:] != signs[:-1]).sum()))
            yield pd.DataFrame(
                {
                    "media_id": rows["media_id"],
                    "duration_ms": rows["duration_ms"].astype("Int32"),
                    "rms": rms,
                    "zero_crossings": pd.array(zc, dtype="Int32"),
                }
            )

    return media.mapInPandas(extract, schema=out_schema)


def frame_sample(media: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video frame sampling stub → one row per sampled frame offset.

    The frame-offset fan-out is real Spark (explode over a computed
    sequence); grabbing actual frames would need a video library.
    """
    if not fake:
        raise NotImplementedError("video decoding not available in this environment")
    videos = media.filter(F.col("media_type") == "video")
    offsets = F.sequence(
        F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)
    )
    return videos.select(
        "media_id",
        F.explode(offsets).alias("frame_offset_ms"),
    ).withColumn(
        "frame_key",
        F.concat(F.col("media_id"), F.lit(":"), F.col("frame_offset_ms")),
    )


def media_embeddings(media: DataFrame, dim: int = 64, fake: bool = True) -> DataFrame:
    """Media featurizer → (media_id, embedding array<double>) — the
    bridge from multimodal blobs into the similarity stack
    (``operators/similarity.py``: brute-force / LSH / IVF top-k all
    consume this shape unchanged).

    A real deployment runs a vision/audio encoder here; this fake is
    a deterministic byte-histogram projection (numpy over the Arrow
    batch — the exact shape a real encoder UDF takes: batched tensors
    in, fixed-dim float vectors out, id passthrough)."""
    if 256 % dim:
        raise ValueError(f"dim must divide 256 (byte-histogram fold), got {dim}")
    out_schema = "media_id long, embedding array<double>"

    def featurize(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media embedding requires an encoder model "
                    "not available in this environment"
                )
            ids, vecs = [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                if b is None or not len(b):
                    continue
                raw = np.frombuffer(bytes(b), dtype=np.uint8)
                # 256-bin byte histogram folded to `dim` buckets, L2-normalized:
                # deterministic, content-sensitive, fixed-dimension
                hist = np.bincount(raw, minlength=256).astype(np.float64)
                folded = hist.reshape(dim, 256 // dim).sum(axis=1)
                nrm = np.linalg.norm(folded)
                if nrm == 0:
                    continue
                ids.append(int(mid))
                vecs.append((folded / nrm).round(9).tolist())
            yield pd.DataFrame({"media_id": ids, "embedding": vecs})

    return media.mapInPandas(featurize, schema=out_schema)
