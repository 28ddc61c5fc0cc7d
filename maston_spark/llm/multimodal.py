"""Multimodal columns: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the *decode* kernels are
deterministic fakes (clearly marked) — but everything Spark-side is
real and tested: schemas, partitioning, UDF signatures, batch
shapes, and the metadata model. Swapping a fake kernel for a real
one (PIL/librosa/ffmpeg) changes only the numpy function body.

Scale design: media bytes never leave the executor JVM→Python Arrow
channel in bigger units than a batch; per-row Python is never used.
Frame sampling / resizing emit fixed-size feature rows, so
downstream tables are columnar-friendly. Partition by content hash
prefix for even media-size distribution (media length is heavily
skewed — a few long videos per million images).
"""

from __future__ import annotations

import hashlib
import zlib

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def synthesize_media(spark, n: int = 256, partitions: int | None = None) -> DataFrame:
    """Deterministic fake media table (payload = zlib of seeded bytes)
    for exercising the pipeline without codec libraries."""
    kinds = ["image", "audio", "video"]

    def gen(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for mid in pdf["id"]:
                kind = kinds[mid % 3]
                raw = hashlib.sha256(f"media-{mid}".encode()).digest() * (8 + mid % 5)
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "payload": zlib.compress(raw),
                        "meta": {
                            "mime": {"image": "image/png", "audio": "audio/wav",
                                     "video": "video/mp4"}[kind],
                            "width": 64 + (mid % 4) * 32 if kind != "audio" else None,
                            "height": 64 + (mid % 3) * 32 if kind != "audio" else None,
                            "duration_ms": (1000 + mid * 7) if kind != "image" else None,
                            "sample_rate": 16000 if kind == "audio" else None,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    base = spark.range(n)
    if partitions:
        base = base.repartition(partitions)
    return base.mapInPandas(gen, MEDIA_SCHEMA)


def with_content_hash(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Exact-dup key + partitioning key for media: sha2 of payload
    (built-in, JVM-side — bytes never reach Python for this)."""
    return df.withColumn("content_hash", F.sha2(F.col(payload_col), 256))


FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, feature array<float>"
)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas``.

    FAKE KERNEL: 'decoding' is zlib-decompress, the 'embedding' is a
    deterministic fold of the decoded bytes into ``dim`` float
    buckets. A real implementation replaces ``_kernel`` with e.g.
    PIL decode + model forward; the Spark contract (Arrow batches
    in, fixed-dim float vectors out) is unchanged.
    """
    import numpy as np
    import pandas as pd

    def _kernel(payload: bytes) -> "np.ndarray":
        try:
            raw = zlib.decompress(payload)
        except zlib.error:
            # corrupt media: real pipelines route to the error channel
            return np.zeros(dim, dtype=np.float32)
        a = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
        pad = (-len(a)) % dim
        if pad:
            a = np.pad(a, (0, pad))
        return a.reshape(-1, dim).mean(axis=0) / 255.0

    def run(it):
        for pdf in it:
            feats = [_kernel(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize image rows to ``width`` × ``height`` via ``mapInPandas``.

    FAKE KERNEL (like :func:`extract_features`): 'decode' is
    zlib-decompress, and the decoded byte stream is laid out as a
    grayscale image at the metadata's (height, width) — cyclically
    tiled to fill, so any payload length is valid — then resampled
    with vectorized nearest-neighbor index maps. A real implementation
    replaces the layout+resample body with PIL decode + resize; the
    Spark contract (Arrow batches in, w*h-byte payloads out, metadata
    carried through) is unchanged. Corrupt payloads yield NULL payload
    rather than throwing (error-channel convention shared with the
    other kernels).
    """
    import numpy as np
    import pandas as pd

    if width <= 0 or height <= 0:
        raise ValueError("width and height must be positive")

    def _kernel(payload: bytes, src_w: int, src_h: int) -> bytes | None:
        try:
            raw = zlib.decompress(payload)
        except zlib.error:
            return None
        src_w = max(int(src_w or 1), 1)
        src_h = max(int(src_h or 1), 1)
        img = np.resize(np.frombuffer(raw, dtype=np.uint8), (src_h, src_w))
        rows = (np.arange(height) * src_h) // height
        cols = (np.arange(width) * src_w) // width
        return img[np.ix_(rows, cols)].tobytes()

    def run(it):
        for pdf in it:
            out = [
                _kernel(p, m["width"], m["height"])
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": np.int32(width),
                    "height": np.int32(height),
                }
            )

    out_schema = "media_id long, payload binary, width int, height int"
    return df.filter(F.col("kind") == "image").mapInPandas(run, out_schema)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video rows: emits one row per sampled
    timestamp (FAKE KERNEL: frame payload = sha256(media_id, ts) —
    a real implementation calls the demuxer). Explodes ~duration/
    every_ms rows per video; output is evenly sized because the
    emit count is bounded by metadata, not payload size."""
    import numpy as np
    import pandas as pd

    def run(it):
        for pdf in it:
            dur = np.asarray(
                [int(m["duration_ms"] or 0) for m in pdf["meta"]], dtype=np.int64
            )
            counts = (np.maximum(dur, 0) + every_ms - 1) // every_ms
            total = int(counts.sum())
            media_ids = np.repeat(pdf["media_id"].to_numpy(np.int64), counts)
            pref = np.concatenate(([0], np.cumsum(counts)[:-1]))
            ts = (
                (np.arange(total, dtype=np.int64) - np.repeat(pref, counts))
                * every_ms
            ).astype(np.int32)
            # the hash IS the fake decode kernel — per emitted frame by
            # nature (a real demuxer call replaces it), but the row
            # expansion above is pure numpy
            frames = [
                hashlib.sha256(f"{m}:{t}".encode()).digest()
                for m, t in zip(media_ids.tolist(), ts.tolist())
            ]
            yield pd.DataFrame(
                {"media_id": media_ids, "ts_ms": ts, "frame": frames},
                columns=["media_id", "ts_ms", "frame"],
            )

    return df.filter(F.col("kind") == "video").mapInPandas(
        run, "media_id long, ts_ms int, frame binary"
    )
