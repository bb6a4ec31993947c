"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
struct of metadata — the schema, partitioning, and Arrow-batched UDF
shape are the real, tested parts. Decode kernels come in two tiers:

  - REAL (stdlib only, all oracle-verified against synthesizers whose
    parameters are doc_id arithmetic): BMP file/info headers and WAV
    RIFF chunk walks (``decode_media_features``); PNG end-to-end —
    chunk CRC verify, IDAT zlib inflate, full filter reconstruction
    incl. Paeth — plus a nearest-neighbor thumbnail resize over the
    decoded pixels (``decode_png_jpeg_features``,
    ``resize_png_thumbnails``); JPEG SOF marker walks; baseline JPEG
    ENTROPY decode — canonical DHT Huffman tables, DC prediction,
    EOB/ZRL runs, byte unstuffing, restart markers, dequant + true 2D
    IDCT (``decode_jpeg_pixels``, round 7); AVI via a recursive
    RIFF/LIST walk to the avih main header (``decode_avi_features``).
    AVI frame ESSENCE for the uncompressed 'DIB ' codec — every movi
    frame's bottom-up pixel rows decoded and un-flipped
    (``decode_avi_frames``, round 7), making all five media families
    pixel-real. Corrupt or truncated payloads always yield an
    'unknown' row, never a task failure.
  - STUBBED: COMPRESSED video codec essence (MPEG/H.264 etc.) needs
    ffmpeg, which this environment doesn't ship; those paths raise
    NotImplementedError or produce a clearly-marked deterministic
    fake.

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


MEDIA_ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def synthesize_media_assets(documents: DataFrame) -> DataFrame:
    """Build REAL (structurally valid, fully decodable) BMP and WAV
    payloads deterministically from ``doc_id`` — even ids become 24-bit
    bottom-up BMPs, odd ids become 16-bit PCM WAVs. The container
    ships no media libraries, so this synthesizer (stdlib ``struct``
    only) provides genuine binary files for the real decode kernel in
    ``decode_media_features`` — format parameters are arithmetic in
    doc_id, which is what makes the decode round-trip directly
    DuckDB-oracle-able.

    Parameter map (mirrored by the oracle SQL):
      even id: width = 1 + id % 32, height = 1 + (7*id) % 24, bpp 24
      odd id:  channels = 1 + (id // 2) % 2,
               sample_rate = (8000, 16000, 44100)[id % 3],
               n_samples = 50 + id % 200, 16-bit PCM
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        def _bmp(doc_id: int) -> bytes:
            width = 1 + doc_id % 32
            height = 1 + (7 * doc_id) % 24
            stride = (width * 3 + 3) // 4 * 4  # rows pad to 4 bytes
            pixels = bytearray()
            for y in range(height):
                row = bytes(
                    (doc_id + x + y) % 256 for x in range(width * 3)
                )
                pixels += row + b"\x00" * (stride - width * 3)
            size = 14 + 40 + len(pixels)
            header = _struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
            info = _struct.pack(
                "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels),
                2835, 2835, 0, 0,
            )
            return header + info + bytes(pixels)

        def _wav(doc_id: int) -> bytes:
            channels = 1 + (doc_id // 2) % 2
            sample_rate = (8000, 16000, 44100)[doc_id % 3]
            n_samples = 50 + doc_id % 200
            block_align = channels * 2
            data = bytes(
                (doc_id * 31 + i) % 256 for i in range(n_samples * block_align)
            )
            fmt = _struct.pack(
                "<HHIIHH", 1, channels, sample_rate,
                sample_rate * block_align, block_align, 16,
            )
            return (
                _struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
                + _struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
                + _struct.pack("<4sI", b"data", len(data)) + data
            )

        for pdf in it:
            ids = [int(i) for i in pdf["doc_id"]]
            yield _pd.DataFrame(
                {
                    "asset_id": ids,
                    "payload": [
                        _bmp(i) if i % 2 == 0 else _wav(i) for i in ids
                    ],
                }
            )

    return documents.select("doc_id").mapInPandas(
        _batches, schema=MEDIA_ASSET_SCHEMA
    )


def decode_media_features(assets: DataFrame) -> DataFrame:
    """REAL media decode for BMP and WAV via stdlib ``struct`` — no
    md5 fakes on these two formats: the kernel sniffs magic bytes and
    parses the actual container headers (BMP file+info header; RIFF
    chunk walk to ``fmt ``/``data``). Formats that would need PIL or
    ffmpeg (JPEG, video) still fall back to the clearly-marked
    deterministic stub in ``extract_features``; here an unrecognized
    payload simply reports ``media_type='unknown'`` with NULL features.

    Scale shape: mapInPandas over (asset_id, payload) — payload bytes
    are parsed where they live and only a narrow typed feature row
    crosses the next shuffle. duration_ms is exact integer math
    (n_samples * 1000 DIV sample_rate) so it is oracle-comparable.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        def _decode(p: bytes) -> dict:
            out = {
                "media_type": "unknown", "width": None, "height": None,
                "channels": None, "sample_rate": None, "n_samples": None,
                "duration_ms": None,
            }
            if len(p) >= 54 and p[:2] == b"BM":
                # 14-byte file header, then BITMAPINFOHEADER
                info_size = _struct.unpack_from("<I", p, 14)[0]
                if info_size >= 40:
                    width, height = _struct.unpack_from("<ii", p, 18)
                    planes, bpp = _struct.unpack_from("<HH", p, 26)
                    out.update(
                        media_type="image/bmp",
                        width=width,
                        height=abs(height),  # negative = top-down rows
                        channels=bpp // 8,
                    )
                return out
            if len(p) >= 12 and p[:4] == b"RIFF" and p[8:12] == b"WAVE":
                pos = 12
                fmt = None
                data_size = None
                while pos + 8 <= len(p):
                    cid, csize = _struct.unpack_from("<4sI", p, pos)
                    body = pos + 8
                    if cid == b"fmt " and csize >= 16:
                        fmt = _struct.unpack_from("<HHIIHH", p, body)
                    elif cid == b"data":
                        data_size = csize
                    pos = body + csize + (csize & 1)  # chunks pad to even
                if fmt is not None and data_size is not None:
                    _audio_fmt, channels, rate, _brate, block_align, _bits = fmt
                    n_samples = data_size // block_align if block_align else 0
                    out.update(
                        media_type="audio/wav",
                        channels=channels,
                        sample_rate=rate,
                        n_samples=n_samples,
                        duration_ms=(n_samples * 1000) // rate if rate else None,
                    )
                return out
            return out

        for pdf in it:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                p = bytes(payload)
                try:
                    d = _decode(p)
                except Exception:
                    d = _decode(b"")  # corrupt container: unknown row
                d["asset_id"] = asset_id
                d["n_bytes"] = len(p)
                rows.append(d)
            out = _pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "media_type", "n_bytes", "width", "height",
                    "channels", "sample_rate", "n_samples", "duration_ms",
                ],
            )
            # Nullable integer dtypes: None in a plain int column would
            # become float64 NaN, which Arrow unsafe-casts to garbage
            # ints instead of nulls.
            yield out.astype(
                {
                    "asset_id": "int64", "n_bytes": "Int32", "width": "Int32",
                    "height": "Int32", "channels": "Int32",
                    "sample_rate": "Int32", "n_samples": "Int32",
                    "duration_ms": "Int64",
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(
        _batches, schema=MEDIA_FEATURE_SCHEMA
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
    """Resize stub over generic features: computes aspect-preserving
    target dimensions capped at ``max_side``. The pixel-level resample
    here is STUBBED (generic formats need PIL/libvips — raises
    NotImplementedError on the real path); for PNG the pixel-level
    resize IS real — see ``resize_png_thumbnails``, which decodes and
    resamples actual pixels with stdlib zlib. The dimension math,
    schema, and Arrow batching here are real and tested."""
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


PNG_JPEG_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("bit_depth", T.IntegerType(), True),
        T.StructField("n_components", T.IntegerType(), True),
        T.StructField("px_checksum", T.LongType(), True),
    ]
)


def synthesize_png_jpeg_assets(documents: DataFrame) -> DataFrame:
    """REAL PNG and JPEG payloads from doc_id arithmetic (stdlib only).

    Even ids: 8-bit RGB PNG — IHDR/IDAT/IEND with correct CRCs, pixel
    rows zlib-compressed and filtered with rotating filter types
    (y%3 -> None/Sub/Up), so a decoder must run a real unfilter pass
    to recover the pixels. Odd ids: minimal JFIF JPEG — APP0 + SOF0
    carrying the dimensions (entropy-coded scan omitted; header-level
    decode is the honest scope without libjpeg).

    Parameter map (mirrored by the oracle SQL):
      even id: width = 1 + id % 48, height = 1 + (5*id) % 32,
               pixel byte (x,y) = (id + x + y) % 256 for x in [0,3w)
      odd id:  width = 1 + (3*id) % 40, height = 1 + (11*id) % 28,
               n_components = 1 + 2*((id // 2) % 2)
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct
        import zlib as _zlib

        import pandas as _pd

        def _chunk(typ: bytes, data: bytes) -> bytes:
            return (
                _struct.pack(">I", len(data))
                + typ
                + data
                + _struct.pack(">I", _zlib.crc32(typ + data) & 0xFFFFFFFF)
            )

        def _png(doc_id: int) -> bytes:
            w = 1 + doc_id % 48
            h = 1 + (5 * doc_id) % 32
            w3 = w * 3
            raws = [
                bytes((doc_id + x + y) % 256 for x in range(w3))
                for y in range(h)
            ]
            filtered = bytearray()
            for y, raw in enumerate(raws):
                ft = y % 3  # 0 none, 1 sub, 2 up
                filtered.append(ft)
                if ft == 0:
                    filtered += raw
                elif ft == 1:
                    filtered += bytes(
                        (raw[x] - (raw[x - 3] if x >= 3 else 0)) % 256
                        for x in range(w3)
                    )
                else:
                    prior = raws[y - 1] if y > 0 else bytes(w3)
                    filtered += bytes(
                        (raw[x] - prior[x]) % 256 for x in range(w3)
                    )
            ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            return (
                b"\x89PNG\r\n\x1a\n"
                + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", _zlib.compress(bytes(filtered)))
                + _chunk(b"IEND", b"")
            )

        def _jpeg(doc_id: int) -> bytes:
            w = 1 + (3 * doc_id) % 40
            h = 1 + (11 * doc_id) % 28
            ncomp = 1 + 2 * ((doc_id // 2) % 2)
            app0 = _struct.pack(
                ">H5sBBBHHBB", 16, b"JFIF\x00", 1, 1, 0, 1, 1, 0, 0
            )
            sof0 = _struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
            for c in range(ncomp):
                sof0 += _struct.pack(">BBB", c + 1, 0x11, 0)
            return (
                b"\xff\xd8"  # SOI
                + b"\xff\xe0" + app0
                + b"\xff\xc0" + sof0
                + b"\xff\xd9"  # EOI
            )

        for pdf in it:
            ids = [int(i) for i in pdf["doc_id"]]
            yield _pd.DataFrame(
                {
                    "asset_id": ids,
                    "payload": [
                        _png(i) if i % 2 == 0 else _jpeg(i) for i in ids
                    ],
                }
            )

    return documents.select("doc_id").mapInPandas(
        _batches, schema=MEDIA_ASSET_SCHEMA
    )


def _png_decoder():
    """Build the shared PNG decode core as a NESTED function. Callers
    capture the returned function inside their mapInPandas closures,
    and cloudpickle serializes nested functions by VALUE — so workers
    need neither this module nor the repo on sys.path (the
    self-contained-closure rule; a plain module-level helper would be
    pickled by reference and break under the external driver harness).

    ``decode(payload) -> (w, h, depth, ctype, pixels | None) | None``:
    signature check, per-chunk CRC verify with truncation guards, IHDR
    parse, IDAT inflate, and the full filter reconstruction (types
    0-4 incl. Paeth) for 8-bit RGB. None = not a decodable PNG."""

    def _unfilter(data, w3, h):
        bpp = 3
        out = bytearray()
        pos = 0
        prior = bytes(w3)
        for _y in range(h):
            if pos + 1 + w3 > len(data):
                return None
            ft = data[pos]
            row = bytearray(data[pos + 1 : pos + 1 + w3])
            pos += 1 + w3
            if ft == 1:  # Sub
                for x in range(bpp, w3):
                    row[x] = (row[x] + row[x - bpp]) % 256
            elif ft == 2:  # Up
                for x in range(w3):
                    row[x] = (row[x] + prior[x]) % 256
            elif ft == 3:  # Average
                for x in range(w3):
                    left = row[x - bpp] if x >= bpp else 0
                    row[x] = (row[x] + (left + prior[x]) // 2) % 256
            elif ft == 4:  # Paeth
                for x in range(w3):
                    a = row[x - bpp] if x >= bpp else 0
                    b = prior[x]
                    c = prior[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c
                    )
                    row[x] = (row[x] + pr) % 256
            elif ft != 0:
                return None
            out += row
            prior = bytes(row)
        return bytes(out)

    def decode(p):
        import struct as _struct
        import zlib as _zlib

        if p[:8] != b"\x89PNG\r\n\x1a\n":
            return None
        pos, ihdr, idat = 8, None, b""
        while pos + 12 <= len(p):
            (clen,) = _struct.unpack_from(">I", p, pos)
            if pos + 12 + clen > len(p):
                return None  # truncated/corrupt length field
            typ = p[pos + 4 : pos + 8]
            body = p[pos + 8 : pos + 8 + clen]
            (crc,) = _struct.unpack_from(">I", p, pos + 8 + clen)
            if _zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
                return None  # corrupt chunk: refuse to decode
            if typ == b"IHDR":
                if clen != 13:
                    return None
                ihdr = _struct.unpack(">IIBBBBB", body)
            elif typ == b"IDAT":
                idat += body
            elif typ == b"IEND":
                break
            pos += 12 + clen
        if ihdr is None:
            return None
        w, h, depth, ctype = ihdr[0], ihdr[1], ihdr[2], ihdr[3]
        pixels = None
        if depth == 8 and ctype == 2 and idat:
            try:
                pixels = _unfilter(_zlib.decompress(idat), w * 3, h)
            except _zlib.error:
                pixels = None
        return (w, h, depth, ctype, pixels)

    return decode


def decode_png_jpeg_features(assets: DataFrame) -> DataFrame:
    """REAL PNG/JPEG decode with stdlib ``zlib``/``struct`` only.

    PNG: the shared ``_png_decoder`` core — signature, per-chunk CRC
    verify, IDAT inflate, full unfilter (types 0-4) — then
    ``px_checksum`` = byte sum of the RECONSTRUCTED pixels, so a wrong
    unfilter breaks the oracle match. JPEG: marker-segment walk to
    SOF0/1/2 for dimensions/precision/components (header-level decode;
    entropy decode needs libjpeg and stays out of scope). Corrupt or
    truncated payloads report media_type='unknown' with NULL features
    — the per-payload guard means garbage bytes can never fail the
    Spark task.

    Scale shape: mapInPandas — payloads decode where they live, only
    the typed feature row crosses the shuffle; binary never does.
    """
    png_decode = _png_decoder()  # captured by value in the closure

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        _NULL = {
            "media_type": "unknown", "width": None, "height": None,
            "bit_depth": None, "n_components": None, "px_checksum": None,
        }

        def _decode(p: bytes) -> dict:
            out = dict(_NULL)
            png = png_decode(p)
            if png is not None:
                w, h, depth, ctype, pixels = png
                out.update(
                    media_type="image/png", width=w, height=h,
                    bit_depth=depth,
                    n_components=3 if ctype == 2 else 1,
                )
                if pixels is not None:
                    out["px_checksum"] = sum(pixels)
                return out
            if p[:2] == b"\xff\xd8":
                pos = 2
                while pos + 4 <= len(p):
                    if p[pos] != 0xFF:
                        return out
                    marker = p[pos + 1]
                    if marker == 0xD9:  # EOI
                        break
                    if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                        # TEM / RST0-7 are standalone markers with no
                        # length segment — advance past the 2 marker
                        # bytes only, or real-world JPEGs misparse.
                        pos += 2
                        continue
                    (seglen,) = _struct.unpack_from(">H", p, pos + 2)
                    if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                        if pos + 10 > len(p):
                            return out  # truncated SOF segment
                        prec, h, w, ncomp = _struct.unpack_from(
                            ">BHHB", p, pos + 4
                        )
                        out.update(
                            media_type="image/jpeg", width=w, height=h,
                            bit_depth=prec, n_components=ncomp,
                        )
                        return out
                    pos += 2 + seglen
                return out
            return out

        for pdf in it:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    d = _decode(bytes(payload))
                except Exception:
                    d = dict(_NULL)
                d["asset_id"] = int(asset_id)
                rows.append(d)
            out = _pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "media_type", "width", "height",
                    "bit_depth", "n_components", "px_checksum",
                ],
            )
            yield out.astype(
                {
                    "asset_id": "int64", "width": "Int32",
                    "height": "Int32", "bit_depth": "Int32",
                    "n_components": "Int32", "px_checksum": "Int64",
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(
        _batches, schema=PNG_JPEG_FEATURE_SCHEMA
    )


AVI_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("usec_per_frame", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def synthesize_avi_assets(documents: DataFrame) -> DataFrame:
    """REAL (structurally valid) AVI containers from doc_id arithmetic.

    RIFF/'AVI ' with a LIST('hdrl') holding the 56-byte 'avih' main
    header and an empty LIST('movi') — the standard minimal layout a
    container prober reads. Video ESSENCE is intentionally absent:
    codec-level frame decode needs ffmpeg and stays out of scope; the
    container level (the part a data pipeline's metadata pass touches)
    is fully real.

    Parameter map (mirrored by the oracle SQL):
      usec_per_frame = (16667, 33333, 40000)[id % 3]
      n_frames = 10 + id % 90
      width = 16 * (1 + id % 20), height = 16 * (1 + (3*id) % 15)
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        def _avi(doc_id: int) -> bytes:
            uspf = (16667, 33333, 40000)[doc_id % 3]
            frames = 10 + doc_id % 90
            w = 16 * (1 + doc_id % 20)
            h = 16 * (1 + (3 * doc_id) % 15)
            avih = _struct.pack(
                "<IIIIIIIIII4I",
                uspf, 0, 0, 0x10, frames, 0, 1, 0, w, h, 0, 0, 0, 0,
            )
            hdrl = b"hdrl" + _struct.pack("<4sI", b"avih", len(avih)) + avih
            movi = b"movi"
            body = (
                b"AVI "
                + _struct.pack("<4sI", b"LIST", len(hdrl)) + hdrl
                + _struct.pack("<4sI", b"LIST", len(movi)) + movi
            )
            return _struct.pack("<4sI", b"RIFF", len(body)) + body

        for pdf in it:
            ids = [int(i) for i in pdf["doc_id"]]
            yield _pd.DataFrame(
                {"asset_id": ids, "payload": [_avi(i) for i in ids]}
            )

    return documents.select("doc_id").mapInPandas(
        _batches, schema=MEDIA_ASSET_SCHEMA
    )


def decode_avi_features(assets: DataFrame) -> DataFrame:
    """REAL AVI container decode: nested RIFF/LIST chunk walk to the
    'avih' main header (stdlib ``struct`` only). The walker handles
    arbitrary chunk order, LIST nesting, and odd-size padding — the
    same traversal a container prober performs. Unrecognized payloads
    report media_type='unknown' with NULL features; duration_ms is
    exact integer math (n_frames * usec_per_frame DIV 1000)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        def _find_avih(p: bytes, pos: int, end: int):
            while pos + 8 <= end:
                cid, csize = _struct.unpack_from("<4sI", p, pos)
                body = pos + 8
                if cid == b"LIST" and body + 4 <= len(p):
                    inner = _find_avih(p, body + 4, min(body + csize, len(p)))
                    if inner is not None:
                        return inner
                elif cid == b"avih" and csize >= 40:
                    return _struct.unpack_from("<IIIIIIIIII", p, body)
                pos = body + csize + (csize & 1)
            return None

        def _decode(p: bytes) -> dict:
            out = {
                "media_type": "unknown", "width": None, "height": None,
                "n_frames": None, "usec_per_frame": None,
                "duration_ms": None,
            }
            if len(p) >= 12 and p[:4] == b"RIFF" and p[8:12] == b"AVI ":
                avih = _find_avih(p, 12, len(p))
                if avih is not None:
                    uspf, _, _, _, frames, _, _, _, w, h = avih
                    out.update(
                        media_type="video/avi", width=w, height=h,
                        n_frames=frames, usec_per_frame=uspf,
                        duration_ms=(frames * uspf) // 1000,
                    )
            return out

        for pdf in it:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    d = _decode(bytes(payload))
                except Exception:
                    d = _decode(b"")  # corrupt container: unknown row
                d["asset_id"] = int(asset_id)
                rows.append(d)
            out = _pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "media_type", "width", "height",
                    "n_frames", "usec_per_frame", "duration_ms",
                ],
            )
            yield out.astype(
                {
                    "asset_id": "int64", "width": "Int32",
                    "height": "Int32", "n_frames": "Int32",
                    "usec_per_frame": "Int32", "duration_ms": "Int64",
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(
        _batches, schema=AVI_FEATURE_SCHEMA
    )


PNG_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("resized_width", T.IntegerType(), True),
        T.StructField("resized_height", T.IntegerType(), True),
        T.StructField("resized_checksum", T.LongType(), True),
    ]
)


def resize_png_thumbnails(assets: DataFrame, max_dim: int = 16) -> DataFrame:
    """REAL image resize over the shared ``_png_decoder`` core (the
    SAME inflate + full unfilter pipeline as
    ``decode_png_jpeg_features`` — one owner, no copy to diverge),
    then nearest-neighbor downsample to at most ``max_dim`` per side
    with the integer mapping src = (dst * src_dim) DIV dst_dim, and a
    checksum of the RESIZED pixel bytes. Because the source pixels are
    arithmetic in doc_id, the resized checksum is analytically
    computable by the SQL oracle — a wrong decode OR a wrong resample
    index breaks the match. Non-PNG or corrupt payloads yield NULL
    features (never a task failure).

    Scale shape: mapInPandas; a thumbnail pass over 100 TB of images
    is pleasantly parallel and the only shuffled bytes are the typed
    feature rows (ship the thumbnails to a partitioned binary sink in
    production — same plumbing as the partitioned-sink operators).
    """
    png_decode = _png_decoder()  # captured by value in the closure

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        _NULL = {
            "width": None, "height": None, "resized_width": None,
            "resized_height": None, "resized_checksum": None,
        }

        def _resize(p: bytes, max_dim: int) -> dict:
            out = dict(_NULL)
            png = png_decode(p)
            if png is None:
                return out
            w, h, depth, ctype, pixels = png
            if pixels is None:
                return out
            nw, nh = min(w, max_dim), min(h, max_dim)
            cksum = 0
            for yd in range(nh):
                ys = (yd * h) // nh
                base = ys * w * 3
                for xd in range(nw):
                    xs = (xd * w) // nw
                    cksum += (
                        pixels[base + 3 * xs]
                        + pixels[base + 3 * xs + 1]
                        + pixels[base + 3 * xs + 2]
                    )
            out.update(
                width=w, height=h, resized_width=nw, resized_height=nh,
                resized_checksum=cksum,
            )
            return out

        for pdf in it:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    d = _resize(bytes(payload), max_dim)
                except Exception:
                    d = dict(_NULL)
                d["asset_id"] = int(asset_id)
                rows.append(d)
            out = _pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "resized_width",
                    "resized_height", "resized_checksum",
                ],
            )
            yield out.astype(
                {
                    "asset_id": "int64", "width": "Int32",
                    "height": "Int32", "resized_width": "Int32",
                    "resized_height": "Int32", "resized_checksum": "Int64",
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(
        _batches, schema=PNG_RESIZE_SCHEMA
    )


# --------------------------------------------------------------------------
# Baseline JPEG with REAL entropy coding (round 7): synthesized scans are
# genuine Huffman-coded baseline 4:4:4 JPEGs, and the decoder runs the
# full pipeline — canonical DHT build, DC prediction, EOB/ZRL run
# decoding, 0xFF00 byte unstuffing, restart-marker handling, dequant,
# de-zigzag, and a true 2D IDCT — before checksumming RECONSTRUCTED
# samples. This closes the last real-decode gap: every media family
# (BMP/WAV/PNG/JPEG/AVI) now decodes its payload for real.
#
# The synthesis places quantized coefficients only at DC and the
# (u,v) in {(4,0),(0,4),(4,4)} AC positions. Those three basis
# functions evaluate to exactly +-(1/8) after IDCT scaling
# (cos(pi*(2x+1)*4/16) = +-sqrt(2)/2, and the sqrt(2) factors cancel
# against C(u)C(v)/4), so with a flat quant table of 8 every decoded
# sample is the EXACT integer 128 + d + a*sx + b*sy + c*sx*sy, where
# sx,sy are the +--++--+ sign patterns. The float IDCT lands within
# ~1e-12 of those integers and rint() recovers them exactly, which is
# what makes an analytic DuckDB oracle possible for a transform-coded
# format (same trick family as the PNG analytic checksum; CLAUDE.md
# transcendental rule honored — cos only exists inside the kernel,
# compared columns are pure integers).
# --------------------------------------------------------------------------

JPEG_PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_components", T.IntegerType(), True),
        T.StructField("n_blocks", T.IntegerType(), True),
        T.StructField("px_sum", T.LongType(), True),
        T.StructField("px_wsum", T.LongType(), True),
    ]
)


def _make_baseline_jpeg_encoder():
    """Driver-side factory for the baseline-JFIF encoder.

    Returns ``encode(wb, hb, ncomp, coef) -> bytes`` where ``coef(bx,
    by, k)`` supplies the quantized (DC, AC(4,0), AC(0,4), AC(4,4))
    coefficients of each 8x8 block. Every payload is a spec-complete
    baseline JFIF: DQT (flat table of 8s; separate luma/chroma tables
    for 3-component images), SOF0, canonical fixed-length DHT tables
    (DC categories at 3 bits, the full (run,size) AC alphabet + EOB +
    ZRL at 7 bits — the all-ones code is left unused per T.81), DRI
    with a 3-MCU restart interval, and a Huffman entropy-coded
    interleaved scan with 0xFF byte stuffing and RST0-7 markers.

    Factory (not module-level helpers) because mapInPandas closures
    must pickle self-contained BY VALUE: the returned nested function
    and everything it references live in this scope's cells, so both
    the still-image and MJPEG synthesizers can capture ONE encoder
    without either depending on the package being importable on the
    workers.
    """
    import struct as _struct

    def _zigzag():
        order = []
        for s in range(15):
            if s % 2 == 0:
                r = min(s, 7)
                while r >= 0 and s - r <= 7:
                    order.append((r, s - r))
                    r -= 1
            else:
                c = min(s, 7)
                while c >= 0 and s - c <= 7:
                    order.append((s - c, c))
                    c -= 1
        return order

    ZI = {rc: i for i, rc in enumerate(_zigzag())}
    DC_SYMS = list(range(7))
    AC_SYMS = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 7)
    ]
    DC_CODES = {s: (3, i) for i, s in enumerate(DC_SYMS)}
    AC_CODES = {s: (7, i) for i, s in enumerate(AC_SYMS)}

    def _dht(tclass, tid, syms, length):
        counts = [0] * 16
        counts[length - 1] = len(syms)
        body = bytes([(tclass << 4) | tid]) + bytes(counts) + bytes(syms)
        return b"\xff\xc4" + _struct.pack(">H", 2 + len(body)) + body

    def _category(v):
        s, a = 0, abs(v)
        while a:
            s += 1
            a >>= 1
        return s

    def encode(wb: int, hb: int, ncomp: int, coef) -> bytes:
        w, h = 8 * wb, 8 * hb
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xe0" + _struct.pack(
            ">H5sBBBHHBB", 16, b"JFIF\x00", 1, 1, 0, 1, 1, 0, 0
        )
        out += (
            b"\xff\xdb" + _struct.pack(">H", 67) + b"\x00" + bytes([8] * 64)
        )
        if ncomp == 3:
            out += (
                b"\xff\xdb" + _struct.pack(">H", 67) + b"\x01"
                + bytes([8] * 64)
            )
        sof = _struct.pack(">BHHB", 8, h, w, ncomp)
        for k in range(ncomp):
            sof += _struct.pack(">BBB", k + 1, 0x11, 0 if k == 0 else 1)
        out += b"\xff\xc0" + _struct.pack(">H", 2 + len(sof)) + sof
        out += _dht(0, 0, DC_SYMS, 3) + _dht(1, 0, AC_SYMS, 7)
        if ncomp == 3:
            out += _dht(0, 1, DC_SYMS, 3) + _dht(1, 1, AC_SYMS, 7)
        ri = 3
        out += b"\xff\xdd" + _struct.pack(">HH", 4, ri)
        sos = bytes([ncomp])
        for k in range(ncomp):
            t = 0 if k == 0 else 1
            sos += bytes([k + 1, (t << 4) | t])
        sos += bytes([0, 63, 0])
        out += b"\xff\xda" + _struct.pack(">H", 2 + len(sos)) + sos

        buf = bytearray()
        acc = [0, 0]  # bit accumulator, bit count

        def _write(length, code):
            for i in range(length - 1, -1, -1):
                acc[0] = (acc[0] << 1) | ((code >> i) & 1)
                acc[1] += 1
                if acc[1] == 8:
                    buf.append(acc[0])
                    if acc[0] == 0xFF:
                        buf.append(0x00)
                    acc[0] = acc[1] = 0

        def _emit(codes, sym, size, value):
            ln, code = codes[sym]
            _write(ln, code)
            if size:
                _write(
                    size,
                    value if value >= 0 else value + (1 << size) - 1,
                )

        def _align():
            while acc[1]:
                _write(1, 1)  # pad with 1-bits per T.81

        pred = [0] * ncomp
        rst = 0
        for m in range(wb * hb):
            if m and m % ri == 0:
                _align()
                buf.extend((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                pred = [0] * ncomp
            by, bx = divmod(m, wb)
            for k in range(ncomp):
                d, a, b, c = coef(bx, by, k)
                diff = d - pred[k]
                pred[k] = d
                s = _category(diff)
                _emit(DC_CODES, s, s, diff)
                zz = [0] * 64
                zz[ZI[(0, 4)]] = a  # (row v=0, col u=4) -> sigma_x
                zz[ZI[(4, 0)]] = b
                zz[ZI[(4, 4)]] = c
                run = 0
                last_nz = max(
                    (i for i in range(1, 64) if zz[i]), default=0
                )
                for i in range(1, last_nz + 1):
                    v = zz[i]
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        _emit(AC_CODES, 0xF0, 0, 0)
                        run -= 16
                    s = _category(v)
                    _emit(AC_CODES, (run << 4) | s, s, v)
                    run = 0
                if last_nz < 63:
                    _emit(AC_CODES, 0x00, 0, 0)
        _align()
        out += bytes(buf) + b"\xff\xd9"
        return bytes(out)

    return encode


def synthesize_baseline_jpeg_assets(documents: DataFrame) -> DataFrame:
    """REAL baseline JPEGs from doc_id arithmetic (stdlib only).

    Encoder: ``_make_baseline_jpeg_encoder`` (spec notes there).
    Parameter map (mirrored analytically by the oracle SQL):

      width  = 8 * (1 + id % 5)     height = 8 * (1 + (3*id) % 4)
      ncomp  = 1 + 2 * (id % 2)     quant  = 8 (all entries)
      per block (bx, by) of component k, quantized coefficients:
        DC          d = (id + 3*bx + 5*by + 7*k) % 64 - 32
        AC(u=4,v=0) a = (2*id + bx + by + k) % 9 - 4
        AC(u=0,v=4) b = (id + 2*bx + by + 2*k) % 9 - 4
        AC(u=4,v=4) c = (id + bx + 2*by + 3*k) % 7 - 3

    The AC placement exercises a 9-zero run before the first AC, a
    3-zero run between, and a 24-zero run (ZRL + run 8) before the
    last — so EOB, ZRL, and mid-block runs are all live paths.
    """
    enc = _make_baseline_jpeg_encoder()

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def _jpeg(doc_id: int) -> bytes:
            def coef(bx, by, k):
                return (
                    (doc_id + 3 * bx + 5 * by + 7 * k) % 64 - 32,
                    (2 * doc_id + bx + by + k) % 9 - 4,
                    (doc_id + 2 * bx + by + 2 * k) % 9 - 4,
                    (doc_id + bx + 2 * by + 3 * k) % 7 - 3,
                )

            return enc(
                1 + doc_id % 5,
                1 + (3 * doc_id) % 4,
                1 + 2 * (doc_id % 2),
                coef,
            )

        for pdf in it:
            ids = [int(i) for i in pdf["doc_id"]]
            yield _pd.DataFrame(
                {"asset_id": ids, "payload": [_jpeg(i) for i in ids]}
            )

    return documents.select("doc_id").mapInPandas(
        _batches, schema=MEDIA_ASSET_SCHEMA
    )


def decode_jpeg_pixels(assets: DataFrame) -> DataFrame:
    """GENERAL baseline 4:4:4 JPEG decoder — full entropy decode.

    Parses DQT/DHT/SOF0/DRI/SOS generically (nothing about the
    synthesis arithmetic is assumed: Huffman tables are built
    canonically from the DHT BITS/HUFFVAL payload, quant tables are
    read per component, restart intervals honored with predictor
    resets and byte alignment, 0xFF00 stuffing removed in the bit
    reader), then per MCU Huffman-decodes DC diffs + AC runs,
    dequantizes, de-zigzags, applies a real float 2D IDCT
    (separable basis-matrix form, numpy), level-shifts, clamps, and
    reports two checksums of the RECONSTRUCTED samples across all
    components:

      px_sum  = sum(sample)                        -- DC-sensitive
      px_wsum = sum(sample * (1+x^2) * (1+y^2))    -- x,y block-local

    The weighted sum exists because the plain sum is blind to the AC
    terms (the +--++--+ sign patterns cancel over a block); the
    (1+x^2)(1+y^2) weight breaks that symmetry, so a decoder that
    dropped or mis-decoded any AC coefficient fails the hash. Corrupt
    or non-baseline payloads yield a media_type='unknown' row rather
    than a task failure. Progressive (SOF2) and subsampled scans are
    out of scope — only 1x1 sampling is accepted.
    """

    decode = _make_jpeg_pixel_decoder()

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in it:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    d = decode(bytes(payload))
                except Exception:
                    d = {
                        "media_type": "unknown", "width": None,
                        "height": None, "n_components": None,
                        "n_blocks": None, "px_sum": None, "px_wsum": None,
                    }
                d["asset_id"] = int(asset_id)
                rows.append(d)
            out = _pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "media_type", "width", "height",
                    "n_components", "n_blocks", "px_sum", "px_wsum",
                ],
            )
            yield out.astype(
                {
                    "asset_id": "int64", "width": "Int32",
                    "height": "Int32", "n_components": "Int32",
                    "n_blocks": "Int32", "px_sum": "Int64",
                    "px_wsum": "Int64",
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(
        _batches, schema=JPEG_PIXEL_SCHEMA
    )


def _make_jpeg_pixel_decoder():
    """Driver-side factory for the general baseline-JPEG pixel decoder
    (see ``decode_jpeg_pixels`` for the semantics). Returns
    ``decode(payload) -> dict`` with media_type/width/height/
    n_components/n_blocks/px_sum/px_wsum keys — 'unknown' with NULLs
    for anything corrupt or non-baseline. Factory-scoped so both the
    still-image decode and the MJPEG per-frame decode capture ONE
    self-contained closure (pickled by value into their mapInPandas
    stages)."""
    import struct as _struct

    import numpy as _np

    def _zigzag():
        order = []
        for s in range(15):
            if s % 2 == 0:
                r = min(s, 7)
                while r >= 0 and s - r <= 7:
                    order.append((r, s - r))
                    r -= 1
            else:
                c = min(s, 7)
                while c >= 0 and s - c <= 7:
                    order.append((s - c, c))
                    c -= 1
        return order

    ZZ = _zigzag()
    A = _np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / _np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            A[u, x] = cu * _np.cos((2 * x + 1) * u * _np.pi / 16) / 2
    WMAT = _np.outer(
        _np.array([1 + y * y for y in range(8)], dtype=_np.int64),
        _np.array([1 + x * x for x in range(8)], dtype=_np.int64),
    )

    def _decode(p: bytes) -> dict:
        out = {
            "media_type": "unknown", "width": None, "height": None,
            "n_components": None, "n_blocks": None,
            "px_sum": None, "px_wsum": None,
        }
        if p[:2] != b"\xff\xd8":
            return out
        qt, huff = {}, {}
        ri = 0
        comps = None
        w = h = None
        pos = 2
        while pos + 4 <= len(p):
            if p[pos] != 0xFF:
                return out
            marker = p[pos + 1]
            if marker == 0xD9:
                return out
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (seglen,) = _struct.unpack_from(">H", p, pos + 2)
            seg = p[pos + 4 : pos + 2 + seglen]
            if marker == 0xDB:
                i = 0
                while i + 65 <= len(seg):
                    if seg[i] >> 4 != 0:
                        return out  # 16-bit quant: not baseline
                    qt[seg[i] & 15] = list(seg[i + 1 : i + 65])
                    i += 65
            elif marker == 0xC4:
                i = 0
                while i + 17 <= len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 15
                    counts = seg[i + 1 : i + 17]
                    nsym = sum(counts)
                    syms = seg[i + 17 : i + 17 + nsym]
                    if len(syms) < nsym:
                        return out
                    table = {}
                    code, si = 0, 0
                    for ln in range(1, 17):
                        for _ in range(counts[ln - 1]):
                            table[(ln, code)] = syms[si]
                            si += 1
                            code += 1
                        code <<= 1
                    huff[(tc, th)] = table
                    i += 17 + nsym
            elif marker in (0xC0, 0xC1):
                if len(seg) < 6:
                    return out
                _prec, h, w, nc = _struct.unpack_from(">BHHB", seg, 0)
                comps = []
                for k in range(nc):
                    if 9 + 3 * k > len(seg):
                        return out
                    cid, samp, tq = seg[6 + 3 * k : 9 + 3 * k]
                    if samp != 0x11:
                        return out  # subsampled: out of scope
                    comps.append((cid, tq))
            elif marker == 0xC2:
                return out  # progressive: out of scope
            elif marker == 0xDD:
                (ri,) = _struct.unpack_from(">H", seg, 0)
            elif marker == 0xDA:
                if comps is None:
                    return out
                sel = {}
                ns = seg[0]
                for k in range(ns):
                    sel[seg[1 + 2 * k]] = (
                        seg[2 + 2 * k] >> 4,
                        seg[2 + 2 * k] & 15,
                    )
                try:
                    return _scan(
                        p, pos + 2 + seglen, w, h, comps, sel, qt,
                        huff, ri, out,
                    )
                except (IndexError, KeyError, ValueError, EOFError):
                    return out
            pos += 2 + seglen
        return out

    def _scan(p, pos, w, h, comps, sel, qt, huff, ri, out):
        # Performance shape (round-7 rewrite, identical outputs):
        # the entropy stream splits at the byte-aligned RST markers
        # into segments, each unstuffed once and loaded into ONE
        # Python big int — bit reads are shifts against a moving
        # bit cursor instead of per-bit byte stepping, and Huffman
        # decode is the canonical T.81 mincode/maxcode compare per
        # length (<= 16 int ops, usually 1). Coefficient blocks
        # accumulate and dequant/de-zigzag/IDCT run BATCHED in
        # numpy over all blocks of the image at once.
        nc = len(comps)
        wb, hb = (w + 7) // 8, (h + 7) // 8

        # -- split scan into restart segments, unstuffing 0xFF00 --
        segs = []
        cur = bytearray()
        i = pos
        while i + 1 < len(p):
            b = p[i]
            if b == 0xFF:
                nxt = p[i + 1]
                if nxt == 0x00:
                    cur.append(0xFF)
                    i += 2
                    continue
                if 0xD0 <= nxt <= 0xD7:
                    segs.append(bytes(cur))
                    cur = bytearray()
                    i += 2
                    continue
                break  # EOI or another marker ends the scan
            cur.append(b)
            i += 1
        segs.append(bytes(cur))

        # -- canonical decode tables: per length min/max code + syms --
        def _canon(table):
            by_len = {}
            for (ln, code), sym in table.items():
                by_len.setdefault(ln, []).append((code, sym))
            canon = {}
            for ln, entries in by_len.items():
                entries.sort()
                codes = [c for c, _ in entries]
                canon[ln] = (
                    codes[0],
                    codes[-1],
                    [sym for _, sym in entries],
                )
            return canon

        ctabs = {key: _canon(tbl) for key, tbl in huff.items()}

        seg_state = [0, 0, 0]  # big-int value, total bits, bit cursor

        def _load_seg(idx):
            if idx >= len(segs):
                raise ValueError("missing restart segment")
            seg = segs[idx]
            seg_state[0] = int.from_bytes(seg, "big")
            seg_state[1] = len(seg) * 8
            seg_state[2] = 0

        def _bits(k):
            val, nbits, bp = seg_state
            if bp + k > nbits:
                raise ValueError("bit read past segment end")
            seg_state[2] = bp + k
            return (val >> (nbits - bp - k)) & ((1 << k) - 1)

        def _huffdec(canon):
            val, nbits, bp = seg_state
            avail = nbits - bp
            for ln in range(1, 17):
                if ln > avail:
                    break
                ent = canon.get(ln)
                if ent is None:
                    continue
                code = (val >> (nbits - bp - ln)) & ((1 << ln) - 1)
                lo, hi, syms = ent
                if lo <= code <= hi:
                    seg_state[2] = bp + ln
                    return syms[code - lo]
            raise ValueError("bad huffman code")

        def _extend(v, s):
            if s == 0:
                return 0
            return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

        _load_seg(0)
        pred = [0] * nc
        n_blocks = wb * hb * nc
        zz_all = _np.zeros((n_blocks, 64), dtype=_np.int64)
        q_all = _np.zeros((n_blocks, 64), dtype=_np.int64)
        bi = 0
        for m in range(wb * hb):
            if m and ri and m % ri == 0:
                _load_seg(m // ri)
                pred = [0] * nc
            for k, (cid, tq) in enumerate(comps):
                tdc, tac = sel[cid]
                row = zz_all[bi]
                s = _huffdec(ctabs[(0, tdc)])
                pred[k] += _extend(_bits(s), s)
                row[0] = pred[k]
                i2 = 1
                while i2 < 64:
                    rs = _huffdec(ctabs[(1, tac)])
                    if rs == 0x00:
                        break
                    if rs == 0xF0:
                        i2 += 16
                        continue
                    run, sz = rs >> 4, rs & 15
                    i2 += run
                    if i2 > 63:
                        raise ValueError("AC run overflow")
                    row[i2] = _extend(_bits(sz), sz)
                    i2 += 1
                q_all[bi] = _np.asarray(qt[tq], dtype=_np.int64)
                bi += 1
        # -- batched dequant + de-zigzag + IDCT --
        deq = zz_all * q_all
        POS_TO_ZZ = [0] * 64
        for zi, (r, c) in enumerate(ZZ):
            POS_TO_ZZ[r * 8 + c] = zi
        mat = deq[:, POS_TO_ZZ].reshape(n_blocks, 8, 8).astype(float)
        pix = A.T @ mat @ A  # broadcasts over the block axis
        pix = _np.clip(_np.rint(pix) + 128, 0, 255).astype(_np.int64)
        out.update(
            media_type="image/jpeg", width=w, height=h,
            n_components=nc, n_blocks=n_blocks,
            px_sum=int(pix.sum()),
            px_wsum=int((pix * WMAT[None, :, :]).sum()),
        )
        return out

    return _decode


# --------------------------------------------------------------------------
# AVI with REAL frame essence (round 7): uncompressed DIB video frames.
#
# The round-6 AVI decode stopped at the container level because codec
# essence "needs ffmpeg" — true for compressed codecs, but the oldest
# AVI codec of all is NONE: 'DIB ' streams carry raw bottom-up
# BMP-style frames, fully decodable with stdlib struct. With them,
# every media family in the engine (BMP/WAV/PNG/JPEG/AVI) is
# pixel-real end to end.
# --------------------------------------------------------------------------

AVI_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("n_frame_bytes", T.LongType(), True),
        T.StructField("px_sum", T.LongType(), True),
        T.StructField("px_wsum", T.LongType(), True),
    ]
)


def synthesize_avi_video_assets(documents: DataFrame) -> DataFrame:
    """REAL playable AVI payloads: RIFF('AVI ') with hdrl(avih +
    strl(strh 'vids'/'DIB ' + strf BITMAPINFOHEADER)), a movi LIST of
    '00db' uncompressed 24-bit bottom-up DIB frames, and an idx1
    index — the complete classic AVI layout. Widths are multiples of
    8 so the DIB stride (4-byte aligned) equals 3*w exactly: no pad
    bytes, which keeps the pixel checksum analytic.

    Parameter map (mirrored by the oracle SQL):
      width  = 8 * (1 + id % 3)      height = 8 * (1 + (id div 3) % 3)
      frames = 2 + id % 5
      byte at top-down row y, byte-index x of frame f:
        (id + x + y + 7*f) % 256           (rows STORED bottom-up)
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        def _avi(doc_id: int) -> bytes:
            w = 8 * (1 + doc_id % 3)
            # (id div 3) % 3 so height actually varies across ids —
            # (3*id) % 3 was identically 0 (advice round 7).
            h = 8 * (1 + (doc_id // 3) % 3)
            frames = 2 + doc_id % 5
            stride = w * 3  # w % 4 == 0 -> already 4-byte aligned
            uspf = 33333

            def frame_bytes(f: int) -> bytes:
                rows = []
                for y in range(h - 1, -1, -1):  # bottom-up storage
                    rows.append(
                        bytes(
                            (doc_id + x + y + 7 * f) % 256
                            for x in range(stride)
                        )
                    )
                return b"".join(rows)

            avih = _struct.pack(
                "<IIIIIIIIII4I",
                uspf, 0, 0, 0x10, frames, 0, 1, 0, w, h, 0, 0, 0, 0,
            )
            strh = _struct.pack(
                "<4s4sIHHIIIIIIIIhhhh",
                b"vids", b"DIB ", 0, 0, 0, 0, 1000000, uspf, 0, frames,
                stride * h, 0xFFFFFFFF & (1 << 31), 0, 0, 0, w, h,
            )
            strf = _struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0,
            )
            strl = (
                b"strl"
                + _struct.pack("<4sI", b"strh", len(strh)) + strh
                + _struct.pack("<4sI", b"strf", len(strf)) + strf
            )
            hdrl = (
                b"hdrl"
                + _struct.pack("<4sI", b"avih", len(avih)) + avih
                + _struct.pack("<4sI", b"LIST", len(strl)) + strl
            )
            movi = b"movi"
            idx_entries = []
            offset = 4  # per convention, relative to the 'movi' fourcc
            for f in range(frames):
                data = frame_bytes(f)
                movi += _struct.pack("<4sI", b"00db", len(data)) + data
                idx_entries.append(
                    _struct.pack("<4sIII", b"00db", 0x10, offset, len(data))
                )
                offset += 8 + len(data)
            idx1 = b"".join(idx_entries)
            body = (
                b"AVI "
                + _struct.pack("<4sI", b"LIST", len(hdrl)) + hdrl
                + _struct.pack("<4sI", b"LIST", len(movi)) + movi
                + _struct.pack("<4sI", b"idx1", len(idx1)) + idx1
            )
            return _struct.pack("<4sI", b"RIFF", len(body)) + body

        for pdf in it:
            ids = [int(i) for i in pdf["doc_id"]]
            yield _pd.DataFrame(
                {"asset_id": ids, "payload": [_avi(i) for i in ids]}
            )

    return documents.select("doc_id").mapInPandas(
        _batches, schema=MEDIA_ASSET_SCHEMA
    )


def decode_avi_frames(assets: DataFrame) -> DataFrame:
    """REAL AVI frame-essence decode: container walk to strf for the
    frame geometry, then every '00db'/'00dc' chunk in the movi LIST
    decodes as an uncompressed bottom-up DIB — rows un-flip to
    top-down order before checksumming, so the reconstruction (not
    the raw byte stream) is what the oracle verifies:

      px_sum  = sum of all samples across frames
      px_wsum = sum of sample * (y_topdown + 1) * (frame_index + 1)

    The row weight catches a decoder that forgets the bottom-up flip
    (raw-order summing would pass px_sum); the frame weight catches
    frame reordering. Only biBitCount=24 / BI_RGB essence decodes;
    anything else (or a corrupt container) reports media_type
    'unknown'. Stride follows the DIB 4-byte alignment rule, so the
    decoder is general even though the synthesizer picks pad-free
    widths."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        def _walk(p, pos, end, found):
            # collect strf geometry and movi frame chunks
            while pos + 8 <= end:
                cid, csize = _struct.unpack_from("<4sI", p, pos)
                body = pos + 8
                if body + csize > len(p):
                    raise ValueError("chunk overruns buffer")
                if cid == b"LIST" and body + 4 <= len(p):
                    _walk(p, body + 4, body + csize, found)
                elif cid == b"strf" and csize >= 40:
                    (
                        _sz, bw, bh, _pl, bits, comp
                    ) = _struct.unpack_from("<IiiHHI", p, body)
                    found["geom"] = (bw, bh, bits, comp)
                elif cid[2:4] in (b"db", b"dc"):
                    found.setdefault("frames", []).append(
                        p[body : body + csize]
                    )
                pos = body + csize + (csize & 1)

        def _decode(p: bytes) -> dict:
            out = {
                "media_type": "unknown", "width": None, "height": None,
                "n_frames": None, "n_frame_bytes": None,
                "px_sum": None, "px_wsum": None,
            }
            if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"AVI ":
                return out
            found: dict = {}
            _walk(p, 12, len(p), found)
            if "geom" not in found:
                return out
            w, h, bits, comp = found["geom"]
            if bits != 24 or comp != 0 or w <= 0 or h <= 0:
                return out  # compressed/paletted essence: out of scope
            stride = (w * 3 + 3) // 4 * 4
            frames = found.get("frames", [])
            px_sum = 0
            px_wsum = 0
            total_bytes = 0
            for f, data in enumerate(frames):
                if len(data) != stride * h:
                    return out  # truncated frame
                total_bytes += len(data)
                for y_td in range(h):
                    row = data[(h - 1 - y_td) * stride :][: w * 3]
                    s = sum(row)
                    px_sum += s
                    px_wsum += s * (y_td + 1) * (f + 1)
            out.update(
                media_type="video/avi", width=w, height=h,
                n_frames=len(frames), n_frame_bytes=total_bytes,
                px_sum=px_sum, px_wsum=px_wsum,
            )
            return out

        for pdf in it:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    d = _decode(bytes(payload))
                except Exception:
                    d = {
                        "media_type": "unknown", "width": None,
                        "height": None, "n_frames": None,
                        "n_frame_bytes": None, "px_sum": None,
                        "px_wsum": None,
                    }
                d["asset_id"] = int(asset_id)
                rows.append(d)
            out = _pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "media_type", "width", "height",
                    "n_frames", "n_frame_bytes", "px_sum", "px_wsum",
                ],
            )
            yield out.astype(
                {
                    "asset_id": "int64", "width": "Int32",
                    "height": "Int32", "n_frames": "Int32",
                    "n_frame_bytes": "Int64", "px_sum": "Int64",
                    "px_wsum": "Int64",
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(
        _batches, schema=AVI_FRAME_SCHEMA
    )


# --------------------------------------------------------------------------
# MJPEG: COMPRESSED video frame essence (round 8) — the last decode stub.
#
# Motion-JPEG is the composition of the two round-7 pieces: an AVI
# container whose movi chunks are complete baseline JPEGs, decoded
# per frame by the same general entropy decoder the still-image path
# uses. With it, compressed video is pixel-real end to end and no
# media family in the engine stops at the container level.
# --------------------------------------------------------------------------

MJPEG_FOURCC = int.from_bytes(b"MJPG", "little")  # biCompression value

MJPEG_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("n_components", T.IntegerType(), True),
        T.StructField("n_blocks", T.IntegerType(), True),
        T.StructField("px_sum", T.LongType(), True),
        T.StructField("px_wsum", T.LongType(), True),
    ]
)


def synthesize_mjpeg_avi_assets(documents: DataFrame) -> DataFrame:
    """REAL MJPEG AVIs: the classic RIFF('AVI ') layout of
    ``synthesize_avi_video_assets`` but with strh fccHandler 'MJPG',
    strf biCompression = 'MJPG', and every movi chunk an '00dc'
    COMPRESSED frame — a complete baseline JFIF from the shared
    encoder (canonical DHTs, DC prediction, EOB/ZRL runs, byte
    stuffing, RST markers). Parameter map (mirrored by the oracle):

      width  = 8 * (1 + id % 3)    height = 8 * (1 + (id div 3) % 3)
      ncomp  = 1 + 2 * (id % 2)    frames = 2 + id % 3
      per frame f, block (bx, by), component k:
        DC          d = (id + 3*bx + 5*by + 7*k + 11*f) % 64 - 32
        AC(u=4,v=0) a = (2*id + bx + by + k + f) % 9 - 4
        AC(u=0,v=4) b = (id + 2*bx + by + 2*k + 3*f) % 9 - 4
        AC(u=4,v=4) c = (id + bx + 2*by + 3*k + 5*f) % 7 - 3

    The f terms make every frame's entropy stream distinct, so frame
    identity is verifiable (the decode query weights by frame index).
    """
    enc = _make_baseline_jpeg_encoder()

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        MJPG = 0x47504A4D  # 'MJPG' little-endian (== MJPEG_FOURCC)

        def _frame_jpeg(doc_id: int, f: int, wb: int, hb: int,
                        ncomp: int) -> bytes:
            def coef(bx, by, k):
                return (
                    (doc_id + 3 * bx + 5 * by + 7 * k + 11 * f) % 64 - 32,
                    (2 * doc_id + bx + by + k + f) % 9 - 4,
                    (doc_id + 2 * bx + by + 2 * k + 3 * f) % 9 - 4,
                    (doc_id + bx + 2 * by + 3 * k + 5 * f) % 7 - 3,
                )

            return enc(wb, hb, ncomp, coef)

        def _avi(doc_id: int) -> bytes:
            wb = 1 + doc_id % 3
            hb = 1 + (doc_id // 3) % 3
            ncomp = 1 + 2 * (doc_id % 2)
            frames = 2 + doc_id % 3
            w, h = 8 * wb, 8 * hb
            uspf = 33333
            payloads = [
                _frame_jpeg(doc_id, f, wb, hb, ncomp) for f in range(frames)
            ]
            max_size = max(len(p) for p in payloads)

            avih = _struct.pack(
                "<IIIIIIIIII4I",
                uspf, 0, 0, 0x10, frames, 0, 1, 0, w, h, 0, 0, 0, 0,
            )
            strh = _struct.pack(
                "<4s4sIHHIIIIIIIIhhhh",
                b"vids", b"MJPG", 0, 0, 0, 0, 1000000, uspf, 0, frames,
                max_size, 0xFFFFFFFF & (1 << 31), 0, 0, 0, w, h,
            )
            strf = _struct.pack(
                "<IiiHHIIiiII",
                40, w, h, 1, 24, MJPG, max_size, 0, 0, 0, 0,
            )
            strl = (
                b"strl"
                + _struct.pack("<4sI", b"strh", len(strh)) + strh
                + _struct.pack("<4sI", b"strf", len(strf)) + strf
            )
            hdrl = (
                b"hdrl"
                + _struct.pack("<4sI", b"avih", len(avih)) + avih
                + _struct.pack("<4sI", b"LIST", len(strl)) + strl
            )
            movi = b"movi"
            idx_entries = []
            offset = 4
            for data in payloads:
                movi += _struct.pack("<4sI", b"00dc", len(data)) + data
                if len(data) & 1:
                    movi += b"\x00"  # RIFF chunks are word-aligned
                idx_entries.append(
                    _struct.pack("<4sIII", b"00dc", 0x10, offset, len(data))
                )
                offset += 8 + len(data) + (len(data) & 1)
            idx1 = b"".join(idx_entries)
            body = (
                b"AVI "
                + _struct.pack("<4sI", b"LIST", len(hdrl)) + hdrl
                + _struct.pack("<4sI", b"LIST", len(movi)) + movi
                + _struct.pack("<4sI", b"idx1", len(idx1)) + idx1
            )
            return _struct.pack("<4sI", b"RIFF", len(body)) + body

        for pdf in it:
            ids = [int(i) for i in pdf["doc_id"]]
            yield _pd.DataFrame(
                {"asset_id": ids, "payload": [_avi(i) for i in ids]}
            )

    return documents.select("doc_id").mapInPandas(
        _batches, schema=MEDIA_ASSET_SCHEMA
    )


def decode_mjpeg_frames(assets: DataFrame) -> DataFrame:
    """REAL compressed-video essence decode: the RIFF walk finds the
    strf geometry; when biCompression is the 'MJPG' fourcc, every
    '00dc'/'00db' movi chunk is ENTROPY-DECODED as a baseline JPEG —
    Huffman decode, dequant, de-zigzag, real IDCT, level shift — by
    the same general decoder the still-image path uses. Checksums of
    the reconstructed samples across frames:

      px_sum  = sum(sample) over all frames/components
      px_wsum = sum of the per-frame (1+x^2)(1+y^2)-weighted sum,
                further weighted by (frame_index + 1)

    The frame weight catches reordering; the in-frame weight catches
    any mis-decoded AC coefficient (the sign patterns cancel in the
    plain sum). Fail-closed: a frame whose JPEG is corrupt,
    non-baseline, or disagrees with the container geometry makes the
    whole asset 'unknown' — partial checksums would defeat the
    oracle. Uncompressed (biCompression=0) essence belongs to
    ``decode_avi_frames``; anything else stays out of scope.

    Scale shape: one mapInPandas stage over (asset_id, payload) —
    payloads decode where they live, binary never crosses a shuffle;
    per-frame pure-Python Huffman cost is the documented price of a
    real decoder in this sandbox, embarrassingly parallel across the
    corpus."""
    decode_jpeg = _make_jpeg_pixel_decoder()

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        MJPG = 0x47504A4D  # 'MJPG' little-endian

        def _walk(p, pos, end, found):
            while pos + 8 <= end:
                cid, csize = _struct.unpack_from("<4sI", p, pos)
                body = pos + 8
                if body + csize > len(p):
                    raise ValueError("chunk overruns buffer")
                if cid == b"LIST" and body + 4 <= len(p):
                    _walk(p, body + 4, body + csize, found)
                elif cid == b"strf" and csize >= 40:
                    (
                        _sz, bw, bh, _pl, _bits, comp
                    ) = _struct.unpack_from("<IiiHHI", p, body)
                    found["geom"] = (bw, bh, comp)
                elif cid[2:4] in (b"db", b"dc"):
                    found.setdefault("frames", []).append(
                        p[body : body + csize]
                    )
                pos = body + csize + (csize & 1)

        def _decode(p: bytes) -> dict:
            out = {
                "media_type": "unknown", "width": None, "height": None,
                "n_frames": None, "n_components": None, "n_blocks": None,
                "px_sum": None, "px_wsum": None,
            }
            if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"AVI ":
                return out
            found: dict = {}
            _walk(p, 12, len(p), found)
            if "geom" not in found:
                return out
            w, h, comp = found["geom"]
            if comp != MJPG or w <= 0 or h == 0:
                return out  # not MJPEG essence: out of scope here
            h = abs(h)  # compressed codecs: orientation is the codec's
            frames = found.get("frames", [])
            ncomp = None
            n_blocks = 0
            px_sum = 0
            px_wsum = 0
            for f, data in enumerate(frames):
                jd = decode_jpeg(bytes(data))
                if (
                    jd["media_type"] != "image/jpeg"
                    or jd["width"] != w
                    or jd["height"] != h
                    or (ncomp is not None
                        and jd["n_components"] != ncomp)
                ):
                    return out  # fail closed, no partial checksums
                ncomp = jd["n_components"]
                n_blocks += jd["n_blocks"]
                px_sum += jd["px_sum"]
                px_wsum += jd["px_wsum"] * (f + 1)
            if not frames:
                return out
            out.update(
                media_type="video/mjpeg", width=w, height=h,
                n_frames=len(frames), n_components=ncomp,
                n_blocks=n_blocks, px_sum=px_sum, px_wsum=px_wsum,
            )
            return out

        for pdf in it:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    d = _decode(bytes(payload))
                except Exception:
                    d = {
                        "media_type": "unknown", "width": None,
                        "height": None, "n_frames": None,
                        "n_components": None, "n_blocks": None,
                        "px_sum": None, "px_wsum": None,
                    }
                d["asset_id"] = int(asset_id)
                rows.append(d)
            out = _pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "media_type", "width", "height",
                    "n_frames", "n_components", "n_blocks",
                    "px_sum", "px_wsum",
                ],
            )
            yield out.astype(
                {
                    "asset_id": "int64", "width": "Int32",
                    "height": "Int32", "n_frames": "Int32",
                    "n_components": "Int32", "n_blocks": "Int32",
                    "px_sum": "Int64", "px_wsum": "Int64",
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(
        _batches, schema=MJPEG_FRAME_SCHEMA
    )


def decode_wav_frame_features(assets: DataFrame) -> DataFrame:
    """Frame-level audio DSP over REAL WAV payloads — the audio
    counterpart of the JPEG/AVI essence decoders: the kernel walks the
    actual RIFF container to ``fmt ``/``data`` (never trusting the
    synthesis parameters), reinterprets the data chunk as int16 LE PCM
    with numpy, and computes per-128-sample-frame features in exact
    integer space: energy (sum of squares in int64), within-frame
    zero crossings (sign(s) transitions, sign = s < 0), and peak
    |amplitude|. Non-WAV payloads are skipped.

    Scale shape: ``mapInPandas`` — audio bytes decode where they live;
    only (asset_id, frame_idx, 4 ints) crosses the shuffle. Frames are
    bounded (len/128 per asset), numpy does the per-sample math
    vectorized, so the per-core cost is memory-bandwidth-bound, not
    Python-loop-bound like the JPEG Huffman path.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import numpy as _np
        import pandas as _pd

        def _frames(asset_id: int, p: bytes) -> list[tuple]:
            if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
                return []
            pos, fmt, data = 12, None, None
            while pos + 8 <= len(p):
                cid, csize = _struct.unpack_from("<4sI", p, pos)
                body = pos + 8
                if cid == b"fmt " and csize >= 16:
                    fmt = _struct.unpack_from("<HHIIHH", p, body)
                elif cid == b"data":
                    data = p[body : body + csize]
                pos = body + csize + (csize & 1)
            if fmt is None or data is None or fmt[5] != 16:
                return []
            s = _np.frombuffer(
                data[: len(data) // 2 * 2], dtype="<i2"
            ).astype(_np.int64)
            rows = []
            for f in range(0, len(s), 128):
                fr = s[f : f + 128]
                neg = fr < 0
                rows.append(
                    (
                        asset_id,
                        f // 128,
                        int(len(fr)),
                        int((fr * fr).sum()),
                        int((neg[1:] != neg[:-1]).sum()),
                        int(_np.abs(fr).max()),
                    )
                )
            return rows

        for pdf in it:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                rows.extend(_frames(int(asset_id), bytes(payload)))
            yield _pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "frame_idx", "n_samples", "energy",
                    "zero_crossings", "peak",
                ],
            )

    return assets.mapInPandas(
        _batches,
        schema=(
            "asset_id bigint, frame_idx bigint, n_samples bigint, "
            "energy bigint, zero_crossings bigint, peak bigint"
        ),
    )


# TIFF (round 9): dual-endian IFD walk --------------------------------------

TIFF_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("byte_order", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("n_ifd_entries", T.IntegerType()),
        T.StructField("xres_num", T.IntegerType()),
        T.StructField("strip_bytes", T.LongType()),
        T.StructField("px_checksum", T.LongType()),
    ]
)


def synthesize_tiff_assets(documents: DataFrame) -> DataFrame:
    """Structurally valid baseline-TIFF payloads from doc_id arithmetic
    (stdlib ``struct`` only). Even ids are little-endian ('II'), odd
    ids big-endian ('MM') — the SAME image parameters under both byte
    orders, so the decoder's endianness handling is what the oracle
    actually exercises. Each file carries a 10-entry IFD (tags sorted
    ascending per the TIFF 6.0 spec) including an out-of-line RATIONAL
    XResolution whose value field is a real file offset the parser must
    follow, and one uncompressed 8-bit grayscale strip.

    Parameter map (mirrored by the oracle SQL):
      width  = 1 + doc_id % 64
      height = 1 + (5 * doc_id) % 48
      xres   = (72 + doc_id % 4) / 1
      pixel[i] = (13 * doc_id + i) % 256
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        def _tiff(doc_id: int) -> bytes:
            le = doc_id % 2 == 0
            e = "<" if le else ">"
            w = 1 + doc_id % 64
            h = 1 + (5 * doc_id) % 48
            xres_num = 72 + doc_id % 4
            # layout: 8-byte header | IFD (2 + 10*12 + 4 = 126) at 8 |
            # RATIONAL value (8) at 134 | strip at 142
            rational_off = 8 + 2 + 10 * 12 + 4
            strip_off = rational_off + 8

            def short(tag: int, v: int) -> bytes:
                return _struct.pack(e + "HHI", tag, 3, 1) + _struct.pack(
                    e + "H", v
                ) + b"\x00\x00"

            def long_(tag: int, v: int) -> bytes:
                return _struct.pack(e + "HHII", tag, 4, 1, v)

            def rational(tag: int, off: int) -> bytes:
                return _struct.pack(e + "HHII", tag, 5, 1, off)

            entries = (
                short(256, w)                 # ImageWidth
                + short(257, h)               # ImageLength
                + short(258, 8)               # BitsPerSample
                + short(259, 1)               # Compression = none
                + short(262, 1)               # Photometric = BlackIsZero
                + long_(273, strip_off)       # StripOffsets
                + short(277, 1)               # SamplesPerPixel
                + short(278, h)               # RowsPerStrip
                + long_(279, w * h)           # StripByteCounts
                + rational(282, rational_off) # XResolution (out-of-line)
            )
            header = (b"II" if le else b"MM") + _struct.pack(e + "HI", 42, 8)
            ifd = _struct.pack(e + "H", 10) + entries + _struct.pack(e + "I", 0)
            rat = _struct.pack(e + "II", xres_num, 1)
            strip = bytes((13 * doc_id + i) % 256 for i in range(w * h))
            return header + ifd + rat + strip

        for pdf in it:
            ids = [int(i) for i in pdf["doc_id"]]
            yield _pd.DataFrame(
                {"asset_id": ids, "payload": [_tiff(i) for i in ids]}
            )

    return documents.select("doc_id").mapInPandas(
        _batches, schema=MEDIA_ASSET_SCHEMA
    )


def decode_tiff_features(assets: DataFrame) -> DataFrame:
    """REAL TIFF metadata decode: byte-order sniff ('II'/'MM'), magic-42
    check, IFD entry walk with typed value decoding (SHORT/LONG inline,
    RATIONAL resolved through its file offset), then the image strip is
    located via StripOffsets/StripByteCounts and reduced to a
    position-weighted checksum — so a parser that misreads endianness,
    walks the wrong offset, or truncates the strip breaks the oracle
    hash. Malformed payloads yield a NULL-feature row, never a task
    failure. Scale shape: mapInPandas, payload parsed where it lives,
    only the narrow feature row survives."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        def _decode(p: bytes) -> dict:
            out = {
                "byte_order": None, "width": None, "height": None,
                "bits_per_sample": None, "n_ifd_entries": None,
                "xres_num": None, "strip_bytes": None, "px_checksum": None,
            }
            if len(p) < 8 or p[:2] not in (b"II", b"MM"):
                return out
            e = "<" if p[:2] == b"II" else ">"
            magic, ifd_off = _struct.unpack_from(e + "HI", p, 2)
            if magic != 42 or ifd_off + 2 > len(p):
                return out
            out["byte_order"] = p[:2].decode("ascii")
            (n,) = _struct.unpack_from(e + "H", p, ifd_off)
            # a corrupt entry count (or a truncated entry table) must
            # yield a NULL-feature row, never drive unpack_from past
            # the buffer and kill the task
            if ifd_off + 2 + 12 * n > len(p):
                out["byte_order"] = None
                return out
            out["n_ifd_entries"] = n
            tags: dict[int, int] = {}
            for k in range(n):
                off = ifd_off + 2 + 12 * k
                tag, typ, cnt = _struct.unpack_from(e + "HHI", p, off)
                if typ == 3:  # SHORT: first 2 bytes of the value field
                    (v,) = _struct.unpack_from(e + "H", p, off + 8)
                elif typ == 4:  # LONG: inline
                    (v,) = _struct.unpack_from(e + "I", p, off + 8)
                elif typ == 5:  # RATIONAL: value field is an offset
                    (ptr,) = _struct.unpack_from(e + "I", p, off + 8)
                    if ptr + 8 > len(p):  # corrupt out-of-line offset
                        continue
                    num, den = _struct.unpack_from(e + "II", p, ptr)
                    v = num  # den carried implicitly (always 1 here)
                else:
                    continue
                tags[tag] = v
            out["width"] = tags.get(256)
            out["height"] = tags.get(257)
            out["bits_per_sample"] = tags.get(258)
            out["xres_num"] = tags.get(282)
            s_off, s_len = tags.get(273), tags.get(279)
            if s_off is not None and s_len is not None and s_off + s_len <= len(p):
                strip = p[s_off : s_off + s_len]
                out["strip_bytes"] = s_len
                out["px_checksum"] = sum(
                    (i + 1) * b for i, b in enumerate(strip)
                )
            return out

        for pdf in it:
            rows = [_decode(bytes(p)) for p in pdf["payload"]]
            df = _pd.DataFrame(rows)
            df.insert(0, "asset_id", pdf["asset_id"].values)
            yield df

    return assets.mapInPandas(_batches, schema=TIFF_FEATURE_SCHEMA)


# --------------------------------------------------------------------------
# GIF: palette-indexed images with REAL LZW entropy coding (round 9).
#
# The one stdlib-implementable codec the real-decode arc hadn't covered:
# GIF's variable-width LZW. The synthesizer runs a genuine GIF LZW
# ENCODER (growing code widths, KwKwK case, sub-block packing) and the
# decoder runs the standard GIF LZW decode — so a px checksum that
# matches the analytic oracle proves the whole entropy round trip, not
# just header parsing. Multi-frame (GIF89a GCE + per-frame image
# descriptors) exercises animation metadata too.
# --------------------------------------------------------------------------

GIF_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("palette_size", T.IntegerType(), True),
        T.StructField("delay_cs_total", T.LongType(), True),
        T.StructField("px_sum", T.LongType(), True),
        T.StructField("px_wsum", T.LongType(), True),
    ]
)


def _gif_lzw():
    """GIF variable-width LZW codec pair as NESTED functions (pickled
    by value inside mapInPandas closures — the self-contained-closure
    rule). Returns ``(encode, decode)``.

    Width bookkeeping (the part implementations disagree on): the
    decoder adds one table entry after every data code except the
    first, and bumps the code width when the table size reaches
    1<<width; the encoder mirrors that by bumping when
    ``next_code - 1 == 1 << width`` after each post-emission add,
    including one VIRTUAL add after the final flush code so the EOI
    code is written at the width the decoder will read it with.
    """

    def encode(indices, mcs):
        clear = 1 << mcs
        eoi = clear + 1
        out = bytearray()
        bitbuf = 0
        nbits = 0

        def _emit(code, size):
            nonlocal bitbuf, nbits
            bitbuf |= code << nbits
            nbits += size
            while nbits >= 8:
                out.append(bitbuf & 0xFF)
                bitbuf >>= 8
                nbits -= 8

        cs = mcs + 1
        next_code = eoi + 1
        table = {(i,): i for i in range(clear)}
        _emit(clear, cs)
        buf = ()
        for k in indices:
            nk = buf + (k,)
            if nk in table:
                buf = nk
                continue
            _emit(table[buf], cs)
            if next_code < 4096:
                table[nk] = next_code
                next_code += 1
                if next_code - 1 == (1 << cs) and cs < 12:
                    cs += 1
            else:
                # Dictionary full (12-bit ceiling): emit CLEAR and
                # restart the table, mirroring the decoder's reset —
                # without this, codes past 4095 are emitted at 12-bit
                # width and corrupt the stream.
                _emit(clear, cs)
                table = {(i,): i for i in range(clear)}
                cs = mcs + 1
                next_code = eoi + 1
            buf = (k,)
        _emit(table[buf], cs)
        next_code += 1  # virtual add: the decoder registers an entry
        if next_code - 1 == (1 << cs) and cs < 12:  # after this code too
            cs += 1
        _emit(eoi, cs)
        if nbits:
            out.append(bitbuf & 0xFF)
        return bytes(out)

    def decode(data, mcs):
        if not 1 <= mcs <= 11:
            return None
        clear = 1 << mcs
        eoi = clear + 1
        base = [bytes([i]) for i in range(clear)] + [b"", b""]
        val = int.from_bytes(bytes(data), "little")
        total_bits = len(data) * 8
        d = list(base)
        cs = mcs + 1
        bitpos = 0
        out = bytearray()
        prev = None
        while True:
            if bitpos + cs > total_bits:
                return None  # ran out of bits before EOI
            code = (val >> bitpos) & ((1 << cs) - 1)
            bitpos += cs
            if code == clear:
                d = list(base)
                cs = mcs + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                if code >= len(d):
                    return None
                entry = d[code]
            else:
                if code < len(d):
                    entry = d[code]
                elif code == len(d):  # KwKwK
                    entry = d[prev] + d[prev][:1]
                else:
                    return None
                if len(d) < 4096:  # conforming streams CLEAR before this
                    d.append(d[prev] + entry[:1])
                    if len(d) == (1 << cs) and cs < 12:
                        cs += 1
            out += entry
            prev = code

    return encode, decode


def synthesize_gif_assets(documents: DataFrame) -> DataFrame:
    """REAL multi-frame GIF89a payloads from doc_id arithmetic (stdlib
    only): logical screen descriptor, 4-color global palette, per-frame
    Graphic Control Extension (delay) + image descriptor, and pixel
    index streams run through the REAL variable-width LZW encoder and
    packed into 255-byte sub-blocks.

    Parameter map (mirrored analytically by the oracle SQL):
      width  w = 1 + doc_id % 24, height h = 1 + (7*doc_id) % 16
      frames n = 1 + doc_id % 4,  delay  = 4 + doc_id % 10 cs/frame
      palette i in 0..3: r=(doc_id+37i)%256, g=(2*doc_id+11i)%256,
                         b=(5*doc_id+23i)%256
      frame f pixel (x,y): index = (doc_id + f + 3x + 5y) % 4
    """
    lzw_encode, _ = _gif_lzw()

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        def _gif(doc_id: int) -> bytes:
            w = 1 + doc_id % 24
            h = 1 + (7 * doc_id) % 16
            nf = 1 + doc_id % 4
            delay = 4 + doc_id % 10
            pal = bytes(
                v
                for i in range(4)
                for v in (
                    (doc_id + 37 * i) % 256,
                    (2 * doc_id + 11 * i) % 256,
                    (5 * doc_id + 23 * i) % 256,
                )
            )
            # LSD packed 0x91: GCT present, color res 2 bits, GCT size
            # 2^(1+1) = 4 entries
            parts = [
                b"GIF89a",
                _struct.pack("<HHBBB", w, h, 0x91, 0, 0),
                pal,
            ]
            for f in range(nf):
                parts.append(
                    b"\x21\xf9\x04\x00"
                    + _struct.pack("<H", delay)
                    + b"\x00\x00"
                )
                parts.append(
                    b"\x2c" + _struct.pack("<HHHHB", 0, 0, w, h, 0)
                )
                idx = [
                    (doc_id + f + 3 * x + 5 * y) % 4
                    for y in range(h)
                    for x in range(w)
                ]
                lzw = lzw_encode(idx, 2)
                parts.append(bytes([2]))
                for off in range(0, len(lzw), 255):
                    sub = lzw[off : off + 255]
                    parts.append(bytes([len(sub)]) + sub)
                parts.append(b"\x00")
            parts.append(b"\x3b")
            return b"".join(parts)

        for pdf in it:
            ids = [int(i) for i in pdf["doc_id"]]
            yield _pd.DataFrame(
                {"asset_id": ids, "payload": [_gif(i) for i in ids]}
            )

    return documents.select("doc_id").mapInPandas(
        _batches, schema=MEDIA_ASSET_SCHEMA
    )


def decode_gif_frames(assets: DataFrame) -> DataFrame:
    """REAL GIF decode, entropy level: header + logical screen
    descriptor, global color table, generic extension-block walk (GCE
    delays accumulated), per-frame image descriptors, sub-block
    reassembly, and the REAL variable-width LZW decode of every frame's
    index stream; indices map through the palette into two checksums:

      px_sum  = sum over frames/pixels of (r + g + b)
      px_wsum = sum of (f+1) * (x+1) * (y+1) * (r + g + b)

    The weighted sum catches frame reordering, row transposition, and
    any mis-decoded index run that the plain sum would cancel out.
    Fail-closed: bad signature, CRC-less structural damage (overrun
    sub-blocks), an LZW stream that dies before EOI, or a pixel count
    that disagrees with the frame geometry yields an 'unknown' row,
    never a task failure or a partial checksum.

    Scale shape: one mapInPandas stage over (asset_id, payload) —
    payloads decode where they live, binary never crosses a shuffle;
    pure-Python LZW cost is the documented price of a real codec in
    this sandbox, embarrassingly parallel across the corpus.
    """
    _, lzw_decode = _gif_lzw()

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        _UNKNOWN = {
            "media_type": "unknown", "width": None, "height": None,
            "n_frames": None, "palette_size": None,
            "delay_cs_total": None, "px_sum": None, "px_wsum": None,
        }

        def _decode(p: bytes) -> dict:
            if len(p) < 13 or p[:6] not in (b"GIF87a", b"GIF89a"):
                return dict(_UNKNOWN)
            w, h, packed, _bg, _aspect = _struct.unpack_from("<HHBBB", p, 6)
            pos = 13
            palette = None
            if packed & 0x80:
                n_colors = 1 << ((packed & 0x07) + 1)
                if pos + 3 * n_colors > len(p):
                    return dict(_UNKNOWN)
                palette = p[pos : pos + 3 * n_colors]
                pos += 3 * n_colors
            n_frames = 0
            delay_total = 0
            px_sum = 0
            px_wsum = 0
            while pos < len(p):
                b = p[pos]
                pos += 1
                if b == 0x3B:  # trailer
                    if n_frames == 0 or palette is None:
                        return dict(_UNKNOWN)
                    return {
                        "media_type": "image/gif", "width": w,
                        "height": h, "n_frames": n_frames,
                        "palette_size": len(palette) // 3,
                        "delay_cs_total": delay_total,
                        "px_sum": px_sum, "px_wsum": px_wsum,
                    }
                if b == 0x21:  # extension: label + sub-blocks
                    if pos >= len(p):
                        return dict(_UNKNOWN)
                    label = p[pos]
                    pos += 1
                    first = True
                    while True:
                        if pos >= len(p):
                            return dict(_UNKNOWN)
                        blen = p[pos]
                        pos += 1
                        if blen == 0:
                            break
                        if pos + blen > len(p):
                            return dict(_UNKNOWN)
                        if label == 0xF9 and first and blen >= 3:
                            (delay,) = _struct.unpack_from(
                                "<H", p, pos + 1
                            )
                            delay_total += delay
                        first = False
                        pos += blen
                elif b == 0x2C:  # image descriptor
                    if pos + 9 > len(p):
                        return dict(_UNKNOWN)
                    _l, _t, fw, fh, ipacked = _struct.unpack_from(
                        "<HHHHB", p, pos
                    )
                    pos += 9
                    pal = palette
                    if ipacked & 0x80:  # local color table
                        n_colors = 1 << ((ipacked & 0x07) + 1)
                        if pos + 3 * n_colors > len(p):
                            return dict(_UNKNOWN)
                        pal = p[pos : pos + 3 * n_colors]
                        pos += 3 * n_colors
                    if ipacked & 0x40:  # interlaced: out of scope
                        return dict(_UNKNOWN)
                    if pos >= len(p) or pal is None:
                        return dict(_UNKNOWN)
                    mcs = p[pos]
                    pos += 1
                    chunks = []
                    while True:
                        if pos >= len(p):
                            return dict(_UNKNOWN)
                        blen = p[pos]
                        pos += 1
                        if blen == 0:
                            break
                        if pos + blen > len(p):
                            return dict(_UNKNOWN)
                        chunks.append(p[pos : pos + blen])
                        pos += blen
                    idx = lzw_decode(b"".join(chunks), mcs)
                    if idx is None or len(idx) != fw * fh:
                        return dict(_UNKNOWN)
                    npal = len(pal) // 3
                    f = n_frames
                    for i, ci in enumerate(idx):
                        if ci >= npal:
                            return dict(_UNKNOWN)
                        rgb = (
                            pal[3 * ci]
                            + pal[3 * ci + 1]
                            + pal[3 * ci + 2]
                        )
                        px_sum += rgb
                        x = i % fw
                        y = i // fw
                        px_wsum += (f + 1) * (x + 1) * (y + 1) * rgb
                    n_frames += 1
                else:
                    return dict(_UNKNOWN)
            return dict(_UNKNOWN)  # no trailer: truncated

        for pdf in it:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    d = _decode(bytes(payload))
                except Exception:
                    d = dict(_UNKNOWN)
                d["asset_id"] = int(asset_id)
                rows.append(d)
            out = _pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "media_type", "width", "height",
                    "n_frames", "palette_size", "delay_cs_total",
                    "px_sum", "px_wsum",
                ],
            )
            yield out.astype(
                {
                    "asset_id": "int64", "width": "Int32",
                    "height": "Int32", "n_frames": "Int32",
                    "palette_size": "Int32", "delay_cs_total": "Int64",
                    "px_sum": "Int64", "px_wsum": "Int64",
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(
        _batches, schema=GIF_FRAME_SCHEMA
    )


# --------------------------------------------------------------------------
# TAR shards (round 9): WebDataset-style archive ingestion.
#
# Large training corpora ship as tar shards (WebDataset et al.) — the
# loader's job is to walk REAL ustar headers, verify their checksums,
# and stream members out without ever exploding the archive to disk.
# Synthesis groups documents into shards (applyInPandas over the shard
# key) and emits genuine POSIX ustar archives; the reader walks the
# 512-byte block structure back. Content integrity rides on md5, which
# DuckDB computes natively from the SAME text — so the oracle needs no
# decoder at all.
# --------------------------------------------------------------------------

TAR_SHARD_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

TAR_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType(), False),
        T.StructField("member_name", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
    ]
)

DOCS_PER_SHARD = 8


def synthesize_tar_shards(documents: DataFrame) -> DataFrame:
    """REAL POSIX ustar shards: docs grouped ``shard_id = doc_id div
    8``, each member a ``doc_<id>.txt`` with the document text as
    content — correct octal size fields, the spaces-then-octal header
    checksum, 512-byte padding, two zero end blocks. Members are
    written in ascending doc_id order (deterministic bytes)."""

    def _build(pdf):
        import pandas as _pd

        def _header(name: bytes, size: int) -> bytes:
            if len(name) > 100:
                # bytearray slice-assign would GROW the header and
                # shift every later field — refuse loudly instead
                raise ValueError(f"tar member name too long: {name!r}")
            h = bytearray(512)
            h[0 : len(name)] = name  # name
            h[100:108] = b"0000644\x00"  # mode
            h[108:116] = b"0000000\x00"  # uid
            h[116:124] = b"0000000\x00"  # gid
            h[124:136] = ("%011o" % size).encode() + b"\x00"  # size
            h[136:148] = b"00000000000\x00"  # mtime
            h[148:156] = b" " * 8  # chksum: spaces while summing
            h[156] = 0x30  # typeflag '0' regular file
            h[257:263] = b"ustar\x00"  # magic
            h[263:265] = b"00"  # version
            chk = sum(h)
            h[148:156] = ("%06o" % chk).encode() + b"\x00 "
            return bytes(h)

        pdf = pdf.sort_values("doc_id")
        parts = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            content = str(text).encode("utf-8")
            name = ("doc_%08d.txt" % int(doc_id)).encode()
            parts.append(_header(name, len(content)))
            parts.append(content)
            pad = (-len(content)) % 512
            if pad:
                parts.append(b"\x00" * pad)
        parts.append(b"\x00" * 1024)  # end-of-archive
        return _pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "payload": [b"".join(parts)],
            }
        )

    docs = documents.select(
        F.expr(f"doc_id div {DOCS_PER_SHARD}").cast("bigint").alias("shard_id"),
        "doc_id",
        "text",
    )
    return docs.groupBy("shard_id").applyInPandas(
        _build, TAR_SHARD_SCHEMA
    )


def read_tar_members(shards: DataFrame) -> DataFrame:
    """Walk REAL ustar archives member by member: header checksum
    VERIFIED (spaces-substituted byte sum vs the recorded octal),
    octal size parse, 512-block advance — a corrupt header or a
    truncated member poisons the whole shard (fail closed: no rows),
    never a task failure. Emits (shard_id, member_name, n_bytes,
    content_md5) — binary stays inside the mapInPandas stage."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def _walk(p: bytes):
            out = []
            pos = 0
            while pos + 512 <= len(p):
                h = p[pos : pos + 512]
                if h == b"\x00" * 512:  # end-of-archive
                    return out
                magic = h[257:263]
                if magic not in (b"ustar\x00", b"ustar "):
                    return None
                try:
                    recorded = int(
                        h[148:156].rstrip(b"\x00 ").decode() or "0", 8
                    )
                    size = int(
                        h[124:136].rstrip(b"\x00 ").decode() or "0", 8
                    )
                except ValueError:
                    return None
                actual = sum(h[:148]) + 8 * 0x20 + sum(h[156:])
                if actual != recorded:
                    return None
                name = h[0:100].rstrip(b"\x00").decode("utf-8", "strict")
                body = p[pos + 512 : pos + 512 + size]
                if len(body) != size:
                    return None  # truncated member
                out.append(
                    (name, size, _hashlib.md5(body).hexdigest())
                )
                pos += 512 + size + ((-size) % 512)
            return None  # ran past the end without the zero blocks

        for pdf in it:
            rows = []
            for shard_id, payload in zip(pdf["shard_id"], pdf["payload"]):
                members = _walk(bytes(payload))
                if members is None:
                    continue  # fail closed: corrupt shard emits nothing
                for name, size, digest in members:
                    rows.append(
                        {
                            "shard_id": int(shard_id),
                            "member_name": name,
                            "n_bytes": size,
                            "content_md5": digest,
                        }
                    )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "shard_id", "member_name", "n_bytes", "content_md5",
                ],
            ).astype({"shard_id": "int64", "n_bytes": "int64"})

    return shards.select("shard_id", "payload").mapInPandas(
        _batches, schema=TAR_MEMBER_SCHEMA
    )


def image_dhash(assets: DataFrame) -> DataFrame:
    """Perceptual DIFFERENCE HASH (dHash) over REAL decoded BMP
    pixels — the near-duplicate-image leg of the multimodal family
    (exact payload dedup is just md5; perceptual dedup needs a
    content hash that survives re-encoding). Classic dHash resizes to
    9x8 and takes horizontal gradients; this variant is defined for
    ANY image size (the synthesized corpus goes down to 1x1) and
    stays in the repo's exact-integer discipline:

      1. decode the BMP (stdlib struct: header walk + bottom-up row
         unflip + 4-byte row-stride unpad — the REAL parse, same as
         ``decode_media_features``),
      2. flatten top-down row-major; grayscale per pixel is
         ``(b + g + r) div 3`` (exact int),
      3. sample 63 positions ``p_j = j * (n_pix - 1) div 62``
         (ceil-free index resampling works at any n; duplicates when
         the image is tiny are fine — gradients there are 0),
      4. bit_j = [gray(p_{j+1}) > gray(p_j)] for j in 0..61 ->
         ``dhash = sum 2^j * bit_j`` — 62 bits, respecting the
         shift-62 cap (bit 63 wraps in the JVM where DuckDB errors).

    Because the corpus pixels are arithmetic in doc_id, the oracle
    computes the IDENTICAL hash analytically (no decoder): the test
    pins the real decode path byte-for-byte against closed-form SQL.

    Non-BMP payloads pass through with NULL dhash. Output:
    (asset_id, width, height, n_pix, dhash). Bucketing by equal
    dhash (a plain groupBy downstream) yields near-dup candidates —
    the same candidates-then-verify shape as the text dedup family.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        def _dhash(p: bytes):
            if len(p) < 54 or p[:2] != b"BM":
                return (None, None, None, None)
            width, height = _struct.unpack_from("<ii", p, 18)
            bpp = _struct.unpack_from("<H", p, 28)[0]
            off = _struct.unpack_from("<I", p, 10)[0]
            if bpp != 24 or width <= 0 or height == 0:
                return (None, None, None, None)
            h = abs(height)
            stride = (width * 3 + 3) // 4 * 4
            grays = []
            for y in range(h):  # top-down output row y
                yb = (h - 1 - y) if height > 0 else y
                base = off + yb * stride
                row = p[base: base + width * 3]
                for x in range(width):
                    b, g, r = row[3 * x], row[3 * x + 1], row[3 * x + 2]
                    grays.append((b + g + r) // 3)
            n = len(grays)
            samp = [grays[(j * (n - 1)) // 62] for j in range(63)]
            hv = 0
            for j in range(62):
                if samp[j + 1] > samp[j]:
                    hv += 1 << j
            return (width, h, n, hv)

        for pdf in it:
            recs = [_dhash(bytes(p)) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "asset_id": _pd.Series(
                        [int(i) for i in pdf["asset_id"]], dtype="int64"
                    ),
                    "width": _pd.Series(
                        [r[0] for r in recs], dtype="Int64"
                    ),
                    "height": _pd.Series(
                        [r[1] for r in recs], dtype="Int64"
                    ),
                    "n_pix": _pd.Series([r[2] for r in recs], dtype="Int64"),
                    "dhash": _pd.Series([r[3] for r in recs], dtype="Int64"),
                }
            )

    schema = (
        "asset_id bigint, width bigint, height bigint, n_pix bigint, "
        "dhash bigint"
    )
    return assets.mapInPandas(_batches, schema)


def audio_fingerprint(assets: DataFrame) -> DataFrame:
    """Perceptual AUDIO fingerprint — the WAV twin of ``image_dhash``
    and the other half of the multimodal near-dup pair: a 62-bit
    energy-gradient signature over REALLY decoded PCM (RIFF chunk
    walk to ``fmt ``/``data``, 16-bit little-endian signed samples),
    robust to gain-preserving container changes the way dHash is to
    re-encoding.

      1. decode all samples (channel-interleaved, each
         ``b0 + 256*b1 - 65536*[b1 >= 128]``),
      2. split the sample sequence into 63 contiguous frames by index
         arithmetic (frame j = samples with ``i*63 div n == j`` —
         defined for any length; empty frames impossible since
         j <= i*63/n < 63),
      3. frame energy = sum of squared samples (exact int64: 250
         samples x 32767^2 < 2^38),
      4. bit_j = [energy_{j+1} > energy_j] -> 62-bit fingerprint
         (shift cap respected).

    Corpus samples are arithmetic in doc_id ((id*31 + i) % 256 over
    the raw bytes), so the oracle computes the identical fingerprint
    analytically — pinning the RIFF walk + sample decode
    byte-for-byte. Non-WAV payloads pass through with NULL. Output:
    (asset_id, n_samples, fingerprint).
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        import pandas as _pd

        def _fp(p: bytes):
            if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
                return (None, None)
            pos = 12
            data = None
            while pos + 8 <= len(p):
                cid, sz = _struct.unpack_from("<4sI", p, pos)
                body = p[pos + 8: pos + 8 + sz]
                if cid == b"data":
                    data = body
                pos += 8 + sz + (sz % 2)
            if data is None or len(data) < 2:
                return (None, None)
            n = len(data) // 2
            vals = []
            for i in range(n):
                s = data[2 * i] + 256 * data[2 * i + 1]
                vals.append(s - 65536 if s >= 32768 else s)
            energy = [0] * 63
            for i, v in enumerate(vals):
                energy[(i * 63) // n] += v * v
            fp = 0
            for j in range(62):
                if energy[j + 1] > energy[j]:
                    fp += 1 << j
            return (n, fp)

        for pdf in it:
            recs = [_fp(bytes(p)) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "asset_id": _pd.Series(
                        [int(i) for i in pdf["asset_id"]], dtype="int64"
                    ),
                    "n_samples": _pd.Series(
                        [r[0] for r in recs], dtype="Int64"
                    ),
                    "fingerprint": _pd.Series(
                        [r[1] for r in recs], dtype="Int64"
                    ),
                }
            )

    return assets.mapInPandas(
        _batches, "asset_id bigint, n_samples bigint, fingerprint bigint"
    )


# --------------------------------------------------------------------------
# ZIP archives (stored members) — the random-access twin of the tar
# shard family: tar is a stream you walk, zip is an index you seek
# (End-of-Central-Directory -> central directory -> local headers).
# Synthesis emits REAL PKZIP bytes (local headers, central directory,
# EOCD, true CRC-32s); the reader resolves members THROUGH the central
# directory exactly like a random-access loader would, verifies each
# member's CRC-32 and both size fields, and cross-checks the local
# header against the central entry. Content integrity rides on md5 of
# the member text, which DuckDB computes natively — no oracle decoder.
# --------------------------------------------------------------------------

ZIP_SHARD_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

ZIP_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType(), False),
        T.StructField("member_name", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
        T.StructField("crc_ok", T.BooleanType(), True),
    ]
)

DOCS_PER_ZIP = 8


def synthesize_zip_shards(documents: DataFrame) -> DataFrame:
    """REAL PKZIP archives (method 0 = stored): docs grouped
    ``shard_id = doc_id div 8``, each member ``doc_<id>.txt`` holding
    the document text; DOS timestamp pinned to the epoch (1980-01-01)
    so bytes are deterministic; true zlib CRC-32 in both the local
    header and the central entry. Members in ascending doc_id order."""

    def _build(pdf):
        import struct as _struct
        import zlib as _zlib

        import pandas as _pd

        pdf = pdf.sort_values("doc_id")
        locals_, centrals = [], []
        offset = 0
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            content = str(text).encode("utf-8")
            name = ("doc_%08d.txt" % int(doc_id)).encode()
            crc = _zlib.crc32(content) & 0xFFFFFFFF
            lh = (
                _struct.pack(
                    "<4sHHHHHIIIHH",
                    b"PK\x03\x04",
                    20,  # version needed
                    0,  # flags
                    0,  # method: stored
                    0,  # DOS time (00:00:00)
                    0x21,  # DOS date (1980-01-01)
                    crc,
                    len(content),  # compressed size (== raw: stored)
                    len(content),  # uncompressed size
                    len(name),
                    0,  # extra length
                )
                + name
            )
            centrals.append(
                _struct.pack(
                    "<4sHHHHHHIIIHHHHHII",
                    b"PK\x01\x02",
                    20,  # version made by
                    20,  # version needed
                    0,
                    0,
                    0,
                    0x21,
                    crc,
                    len(content),
                    len(content),
                    len(name),
                    0,  # extra
                    0,  # comment
                    0,  # disk number
                    0,  # internal attrs
                    0,  # external attrs
                    offset,  # local header offset
                )
                + name
            )
            locals_.append(lh + content)
            offset += len(lh) + len(content)
        cd = b"".join(centrals)
        eocd = _struct.pack(
            "<4sHHHHIIH",
            b"PK\x05\x06",
            0,
            0,
            len(centrals),
            len(centrals),
            len(cd),
            offset,  # central directory offset
            0,  # comment length
        )
        return _pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "payload": [b"".join(locals_) + cd + eocd],
            }
        )

    docs = documents.select(
        F.expr(f"doc_id div {DOCS_PER_ZIP}").cast("bigint").alias("shard_id"),
        "doc_id",
        "text",
    )
    return docs.groupBy("shard_id").applyInPandas(_build, ZIP_SHARD_SCHEMA)


def read_zip_members(shards: DataFrame) -> DataFrame:
    """Random-access ZIP walk, the way a loader actually resolves
    members: EOCD at the tail -> central-directory offset/count ->
    per-entry local-header seek -> stored-content slice. Verifies the
    EOCD signature, every central and local signature, the
    central/local name agreement, both size fields, and the CRC-32 of
    the extracted bytes against the header (``crc_ok`` — recomputed
    with zlib over the slice, not trusted). Any structural violation
    poisons the whole shard (fail closed: no rows). Binary never
    leaves the mapInPandas stage."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import struct as _struct
        import zlib as _zlib

        import pandas as _pd

        def _walk(p: bytes):
            if len(p) < 22:
                return None
            eocd = p[-22:]
            if eocd[:4] != b"PK\x05\x06":
                return None  # archive comment unsupported by contract
            (n_total, cd_size, cd_off) = _struct.unpack(
                "<HI I".replace(" ", ""), eocd[10:20]
            )
            n_here = _struct.unpack("<H", eocd[8:10])[0]
            if n_here != n_total:
                return None
            pos = cd_off
            out = []
            for _ in range(n_total):
                if p[pos : pos + 4] != b"PK\x01\x02":
                    return None
                (
                    crc,
                    csize,
                    usize,
                    nlen,
                    xlen,
                    clen,
                ) = _struct.unpack("<IIIHHH", p[pos + 16 : pos + 34])
                lh_off = _struct.unpack("<I", p[pos + 42 : pos + 46])[0]
                name = p[pos + 46 : pos + 46 + nlen]
                # local header cross-check
                if p[lh_off : lh_off + 4] != b"PK\x03\x04":
                    return None
                (l_nlen, l_xlen) = _struct.unpack(
                    "<HH", p[lh_off + 26 : lh_off + 30]
                )
                l_name = p[lh_off + 30 : lh_off + 30 + l_nlen]
                if l_name != name:
                    return None
                data_off = lh_off + 30 + l_nlen + l_xlen
                body = p[data_off : data_off + csize]
                if len(body) != csize or csize != usize:  # stored only
                    return None
                actual_crc = _zlib.crc32(body) & 0xFFFFFFFF
                out.append(
                    (
                        name.decode("utf-8", "strict"),
                        usize,
                        _hashlib.md5(body).hexdigest(),
                        actual_crc == crc,
                    )
                )
                pos += 46 + nlen + xlen + clen
            return out

        for pdf in it:
            rows = []
            for shard_id, payload in zip(pdf["shard_id"], pdf["payload"]):
                members = _walk(bytes(payload))
                if members is None:
                    continue  # fail closed
                for name, size, digest, ok in members:
                    rows.append(
                        {
                            "shard_id": int(shard_id),
                            "member_name": name,
                            "n_bytes": size,
                            "content_md5": digest,
                            "crc_ok": bool(ok),
                        }
                    )
            yield _pd.DataFrame(
                rows,
                columns=[
                    "shard_id",
                    "member_name",
                    "n_bytes",
                    "content_md5",
                    "crc_ok",
                ],
            ).astype({"shard_id": "int64", "n_bytes": "int64"})

    return shards.select("shard_id", "payload").mapInPandas(
        _batches, schema=ZIP_MEMBER_SCHEMA
    )


# --------------------------------------------------------------------------
# Concatenated-gzip member shards (the WET / Common Crawl shape)
# --------------------------------------------------------------------------

GZIP_SHARD_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)
GZIP_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType()),
        T.StructField("member_name", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("crc_ok", T.BooleanType()),
    ]
)
DOCS_PER_GZIP = 8


def synthesize_gzip_shards(documents: DataFrame) -> DataFrame:
    """REAL concatenated-member gzip shards — the exact container
    shape Common Crawl WET/WARC files use (one gzip MEMBER per
    record, members back-to-back in one .gz; RFC 1952 §2.2 makes the
    concatenation itself a valid gzip stream): docs grouped
    ``shard_id = doc_id div 8``, each member carrying one document's
    UTF-8 text as a raw-DEFLATE body between a 10-byte header (FNAME
    flag set, name ``doc_<id>.txt``, MTIME pinned 0, OS 255) and the
    8-byte CRC-32 + ISIZE trailer. Deterministic given the zlib
    build; all integrity checks downstream recompute from the
    INFLATED bytes, so parity never depends on compressed-byte
    stability. Members in ascending doc_id order."""

    def _build(pdf):
        import struct as _struct
        import zlib as _zlib

        import pandas as _pd

        pdf = pdf.sort_values("doc_id")
        members = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            content = str(text).encode("utf-8")
            name = ("doc_%08d.txt" % int(doc_id)).encode()
            co = _zlib.compressobj(9, _zlib.DEFLATED, -15)
            deflated = co.compress(content) + co.flush()
            header = (
                _struct.pack(
                    "<2sBBIBB",
                    b"\x1f\x8b",  # magic
                    8,  # CM = deflate
                    0x08,  # FLG = FNAME
                    0,  # MTIME pinned to epoch
                    2,  # XFL = max compression
                    255,  # OS = unknown
                )
                + name
                + b"\x00"
            )
            trailer = _struct.pack(
                "<II",
                _zlib.crc32(content) & 0xFFFFFFFF,
                len(content) & 0xFFFFFFFF,
            )
            members.append(header + deflated + trailer)
        return _pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "payload": [b"".join(members)],
            }
        )

    docs = documents.select(
        F.expr(f"doc_id div {DOCS_PER_GZIP}").cast("bigint").alias(
            "shard_id"
        ),
        "doc_id",
        "text",
    )
    return docs.groupBy("shard_id").applyInPandas(_build, GZIP_SHARD_SCHEMA)


def read_gzip_members(shards: DataFrame) -> DataFrame:
    """Streaming walk of a concatenated-member gzip shard — the
    sequential loader path a WET reader takes: parse each member
    header (magic, CM=8, honor FTEXT/FHCRC/FEXTRA/FNAME/FCOMMENT
    flags), inflate the raw-DEFLATE body with a fresh decompressobj
    (member boundary = end-of-stream; ``unused_data`` hands back the
    tail), then verify BOTH trailer fields — CRC-32 and ISIZE — against
    the inflated bytes (``crc_ok`` recomputed, never trusted). A
    malformed header, truncated trailer, or inflate error poisons the
    whole shard (fail closed: no rows — a torn shard must not pass as
    partially fine). Binary never leaves the mapInPandas stage."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib
        import struct as _struct
        import zlib as _zlib

        import pandas as _pd

        def _walk(p: bytes):
            out = []
            pos = 0
            while pos < len(p):
                if pos + 10 > len(p) or p[pos : pos + 2] != b"\x1f\x8b":
                    return None
                cm, flg = p[pos + 2], p[pos + 3]
                if cm != 8 or flg & 0xE0:  # reserved flag bits
                    return None
                cur = pos + 10
                if flg & 0x04:  # FEXTRA
                    if cur + 2 > len(p):
                        return None
                    xlen = _struct.unpack("<H", p[cur : cur + 2])[0]
                    cur += 2 + xlen
                name = ""
                if flg & 0x08:  # FNAME
                    end = p.find(b"\x00", cur)
                    if end < 0:
                        return None
                    name = p[cur:end].decode("latin-1")
                    cur = end + 1
                if flg & 0x10:  # FCOMMENT
                    end = p.find(b"\x00", cur)
                    if end < 0:
                        return None
                    cur = end + 1
                if flg & 0x02:  # FHCRC
                    cur += 2
                if cur > len(p):
                    return None
                do = _zlib.decompressobj(-15)
                try:
                    content = do.decompress(p[cur:])
                    content += do.flush()
                except _zlib.error:
                    return None
                if not do.eof:
                    return None  # truncated member
                tail = do.unused_data
                if len(tail) < 8:
                    return None
                crc_stored, isize = _struct.unpack("<II", tail[:8])
                crc_ok = (
                    _zlib.crc32(content) & 0xFFFFFFFF
                ) == crc_stored and (len(content) & 0xFFFFFFFF) == isize
                out.append(
                    (
                        name,
                        len(content),
                        _hashlib.md5(content).hexdigest(),
                        crc_ok,
                    )
                )
                # advance: consumed = everything minus what inflate
                # left over, plus the 8-byte trailer
                pos = len(p) - len(tail) + 8
            return out

        for pdf in it:
            rows = []
            for sid, payload in zip(pdf["shard_id"], pdf["payload"]):
                members = _walk(bytes(payload))
                if members is None:
                    continue  # poisoned shard: fail closed
                for name, nb, md5h, ok in members:
                    rows.append((int(sid), name, nb, md5h, ok))
            yield _pd.DataFrame(
                rows,
                columns=[
                    "shard_id",
                    "member_name",
                    "n_bytes",
                    "content_md5",
                    "crc_ok",
                ],
            )

    return shards.select("shard_id", "payload").mapInPandas(
        _batches, schema=GZIP_MEMBER_SCHEMA
    )
