"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
struct of metadata — the schema, partitioning, and Arrow-batched UDF
shape are the real, tested parts. The decode kernels themselves are
STUBBED (the image/audio libraries are not in this environment): each
stub either raises NotImplementedError (real-decode path) or produces a
deterministic md5-derived fake (plumbing-test path), clearly marked.

At scale the rules encoded here: binary payloads never pass through a
shuffle (extract features first, then drop the payload), batch
iteration uses mapInPandas (Arrow pages of rows, constant memory), and
feature outputs are narrow typed columns.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

try:  # real decoders, absent in this environment by design
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType(), True),
                    T.StructField("source", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def documents_as_assets(documents: DataFrame) -> DataFrame:
    """Build a binary asset table from the documents table (UTF-8
    payloads stand in for media bytes; the driver testdata ships no
    binary modality). Demonstrates the binary-column data model."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.col("source").alias("source"),
            F.col("n_chars").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for an image decode: md5 digest plus
    fake width/height derived from digest bytes. STUB — replace with a
    real decoder (PIL/libvips) where available."""
    digest = hashlib.md5(payload).hexdigest()
    width = 64 + int(digest[:4], 16) % 1856  # 64..1919
    height = 64 + int(digest[4:8], 16) % 1016  # 64..1079
    return digest, width, height


def extract_features(assets: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: each batch arrives as a pandas DataFrame; payload bytes
    never leave the executor, and the output is a narrow feature row per
    asset. With use_real_decoder=True this requires PIL and raises
    NotImplementedError here (the decode kernel is stubbed)."""
    if use_real_decoder and not _HAS_PIL:
        raise NotImplementedError(
            "real image decode requires PIL, not available in this environment; "
            "use use_real_decoder=False for the deterministic stub"
        )

    # Self-contained closure: no references to this module's globals, so
    # cloudpickle ships it by value and executors never need this
    # package importable (the driver harness may run from any CWD).
    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def _decode(payload: bytes) -> tuple[str, int, int]:
            digest = _hashlib.md5(payload).hexdigest()
            return (
                digest,
                64 + int(digest[:4], 16) % 1856,
                64 + int(digest[4:8], 16) % 1016,
            )

        for pdf in it:
            payloads = [bytes(p) for p in pdf["payload"]]
            feats = [_decode(p) for p in payloads]
            yield _pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "digest": [f[0] for f in feats],
                    "width": [f[1] for f in feats],
                    "height": [f[2] for f in feats],
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(
        _batches, schema=FEATURE_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("resized_width", T.IntegerType(), True),
        T.StructField("resized_height", T.IntegerType(), True),
    ]
)


def resize_images(
    features: DataFrame, max_side: int = 256, use_real_decoder: bool = False
) -> DataFrame:
    """Resize stub: computes aspect-preserving target dimensions capped
    at ``max_side`` from the extracted (width, height) features. The
    pixel-level resample is STUBBED (requires PIL/libvips — raises
    NotImplementedError on the real path); the dimension math, schema,
    and Arrow batching are real and tested."""
    if use_real_decoder and not _HAS_PIL:
        raise NotImplementedError(
            "real image resize requires PIL, not available in this environment; "
            "use use_real_decoder=False for the dimension-only stub"
        )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        cap = max_side
        for pdf in it:
            w = pdf["width"].astype("int64")
            h = pdf["height"].astype("int64")
            side = w.combine(h, max)
            scale_num = side.where(side > cap, cap).clip(lower=1)
            rw = (w * cap // scale_num).where(side > cap, w).astype("int32")
            rh = (h * cap // scale_num).where(side > cap, h).astype("int32")
            yield _pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "resized_width": rw,
                    "resized_height": rh,
                }
            )

    return features.select("asset_id", "width", "height").mapInPandas(
        _batches, schema=RESIZED_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_digest", T.StringType(), True),
    ]
)


def sample_frames(assets: DataFrame, max_frames: int = 5) -> DataFrame:
    """Frame sampling: one-to-many expansion of a video-like payload
    into per-frame rows — the mapInPandas shape for decode-and-explode
    pipelines (a 100 TB video corpus becomes a larger frame corpus
    without ever routing payload bytes through a shuffle).

    The frame decoder is STUBBED deterministically: frame count =
    1 + (md5 first byte mod max_frames); each frame digest is
    md5(payload || ':' || idx). Replace with a real demuxer (pyav/
    ffmpeg) where available."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in it:
            out_id, out_idx, out_dig = [], [], []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                p = bytes(payload)
                digest = _hashlib.md5(p).hexdigest()
                n_frames = 1 + int(digest[:2], 16) % max_frames
                for i in range(n_frames):
                    out_id.append(asset_id)
                    out_idx.append(i)
                    out_dig.append(
                        _hashlib.md5(p + b":" + str(i).encode()).hexdigest()
                    )
            yield _pd.DataFrame(
                {
                    "asset_id": out_id,
                    "frame_idx": out_idx,
                    "frame_digest": out_dig,
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(
        _batches, schema=FRAME_SCHEMA
    )
