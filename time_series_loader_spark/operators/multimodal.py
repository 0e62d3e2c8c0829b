"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference capability (BASELINE.json north star). The pattern for
image/audio/video at 100 TB:

- payloads are **opaque ``binary`` columns** with a small typed metadata
  struct alongside (modality, byte length, content digest);
- decode / feature-extraction runs as **Arrow-batched ``mapInPandas``** —
  the only sanctioned Python hop — so each task processes a columnar batch,
  never a row at a time;
- real codecs (PIL/ffmpeg/torchaudio) are NOT in this container. Two real
  container formats ARE decoded with pure-Python header parsers —
  **BMP** (width/height from the DIB header) and **WAV** (sample rate /
  channels / frame count from the RIFF fmt+data chunks) — exercised
  end-to-end by the ``multimodal_decode`` oracle query on payloads built
  with :func:`make_bmp`/:func:`make_wav`. ``decode_stub=True`` keeps the
  digest-derived fake kernel for formats that genuinely need native
  codecs; ``decode_stub=False`` runs the real parsers and raises
  NotImplementedError only for unrecognized magic bytes (JPEG/PNG/MP4…,
  where PIL/ffmpeg would slot in).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("digest", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a multimodal-shaped table from a text corpus: payload =
    utf-8 bytes (stand-in for image/audio bytes), plus typed metadata."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image").alias("modality"),
        payload.alias("payload"),
        F.length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("digest"),
    )


def make_bmp(width: int, height: int) -> bytes:
    """Minimal valid 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up,
    zeroed pixels, rows padded to 4 bytes). Pure Python — used to craft
    deterministic image payloads for the decode round-trip oracle."""
    import struct

    row = ((24 * width + 31) // 32) * 4
    image_size = row * height
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", 54 + image_size, 0, 0, 54,
        40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0,
    )
    return header + b"\x00" * image_size


def make_wav(sample_rate: int, n_channels: int, n_frames: int) -> bytes:
    """Minimal valid 16-bit PCM WAV (RIFF/fmt/data, silent samples)."""
    import struct

    block_align = n_channels * 2
    data_size = n_frames * block_align
    return (
        struct.pack(
            "<4sI4s" "4sIHHIIHH" "4sI",
            b"RIFF", 36 + data_size, b"WAVE",
            b"fmt ", 16, 1, n_channels, sample_rate,
            sample_rate * block_align, block_align, 16,
            b"data", data_size,
        )
        + b"\x00" * data_size
    )


def _pil_image():
    """PIL's Image module if the library is installed, else None — the
    r13 codec slot-in (VERDICT r12 #7) is OPTIONAL by construction: the
    pure-Python BMP/WAV parsers and the digest stub keep every kernel
    working in codec-less containers (this one included), and a
    PIL-equipped cluster gets JPEG/PNG decode/resize through the same
    kernels with zero plumbing changes. Called inside the Arrow kernels
    (executor-side import, once per worker interpreter via the module
    cache)."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def decode_payload(p: bytes) -> dict:
    """Header-parse one payload: BMP → (width, height), WAV → (sample_rate,
    n_channels, n_frames). Other formats (JPEG/PNG/GIF…) decode through
    PIL when it is installed (`_pil_image`); without it — or for formats
    even PIL rejects (MP4 → ffmpeg's territory) — raises
    NotImplementedError. The pure-Python fast paths stay first: they are
    codec-independent and bit-stable across PIL versions."""
    import struct

    if p[:2] == b"BM" and len(p) >= 26:
        w, h = struct.unpack_from("<ii", p, 18)
        return {
            "modality": "image", "width": w, "height": abs(h),
            "sample_rate": 0, "n_channels": 0, "n_frames": 1,
        }
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        _, rate, chans, block, _, _, data_size = _wav_chunks(p)
        return {
            "modality": "audio", "width": 0, "height": 0,
            "sample_rate": rate, "n_channels": chans,
            "n_frames": data_size // block if block else 0,
        }
    Image = _pil_image()
    if Image is not None:
        import io

        try:
            with Image.open(io.BytesIO(p)) as im:
                return {
                    "modality": "image",
                    "width": int(im.size[0]),
                    "height": int(im.size[1]),
                    "sample_rate": 0,
                    "n_channels": 0,
                    "n_frames": int(getattr(im, "n_frames", 1)),
                }
        except Exception:
            pass  # unrecognized even by PIL → the honest error below
    raise NotImplementedError(
        "real decode of this format requires PIL/ffmpeg; PIL is "
        f"{'installed but rejected the payload' if Image else 'not available in this container'}"
        " (pure-Python paths: BMP, WAV)"
    )


DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def synthesize_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic real-container payloads from an id column: even ids →
    BMP (width/height arithmetic in the id), odd ids → WAV (rate/channels/
    frames likewise). Because every decoded field and the byte length are
    pure functions of the id, a SQL oracle can predict them all — making
    the decode round-trip (build → parse) fully correctness-checked."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                if i % 2 == 0:
                    payloads.append(make_bmp((i % 64) + 1, (i % 37) + 2))
                else:
                    payloads.append(
                        make_wav(8000 + (i % 4) * 4000, ((i // 2) % 2) + 1, (i % 100) + 1)
                    )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return df.select(F.col(id_col)).mapInPandas(batches, "doc_id BIGINT, payload BINARY")


def decode_features(df: DataFrame) -> DataFrame:
    """REAL decode path: header-parse each payload (BMP/WAV) in an
    Arrow-batched ``mapInPandas`` kernel — same plumbing as the stub, a
    real kernel. Input needs (doc_id, payload)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_payload(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [f["modality"] for f in feats],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": pd.Series([f["width"] for f in feats], dtype="int32"),
                    "height": pd.Series([f["height"] for f in feats], dtype="int32"),
                    "sample_rate": pd.Series([f["sample_rate"] for f in feats], dtype="int32"),
                    "n_channels": pd.Series([f["n_channels"] for f in feats], dtype="int32"),
                    "n_frames": pd.Series([f["n_frames"] for f in feats], dtype="int32"),
                }
            )

    return df.mapInPandas(batches, DECODE_SCHEMA)


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode/feature-extract payloads via Arrow-batched mapInPandas.

    Stub kernel: width/height/n_frames derived from the first digest bytes
    (deterministic, engine-independent). ``decode_stub=False`` header-parses
    real containers (BMP/WAV via :func:`decode_payload`) and raises
    NotImplementedError on formats that need a native codec.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if not decode_stub:
                feats = [decode_payload(bytes(p)) for p in pdf["payload"]]
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "modality": [f["modality"] for f in feats],
                        "n_bytes": pdf["payload"].map(len).astype("int64"),
                        "digest": [
                            hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]
                        ],
                        "width": pd.Series([f["width"] for f in feats], dtype="int32"),
                        "height": pd.Series([f["height"] for f in feats], dtype="int32"),
                        "n_frames": pd.Series([f["n_frames"] for f in feats], dtype="int32"),
                    }
                )
                continue
            payloads = pdf["payload"]
            digests = [hashlib.sha256(bytes(p)).hexdigest() for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "digest": digests,
                    # fake decode: dimensions from the digest's first bytes
                    "width": [int(d[0:2], 16) + 1 for d in digests],
                    "height": [int(d[2:4], 16) + 1 for d in digests],
                    "n_frames": [int(d[4:6], 16) % 16 + 1 for d in digests],
                }
            )

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def resize_bmp(p: bytes, out_w: int, out_h: int) -> bytes:
    """REAL nearest-neighbor resize of a 24-bit uncompressed BMP, pure
    Python/numpy: parse the DIB header, index-sample the (bottom-up,
    4-byte-row-padded) pixel array, rebuild a valid BMP. Raises
    NotImplementedError for non-BMP payloads (a PIL resize slots in
    there on a codec-equipped cluster)."""
    import struct

    import numpy as np

    if p[:2] != b"BM":
        raise NotImplementedError("resize implemented for 24-bit BMP only")
    off = struct.unpack_from("<I", p, 10)[0]
    w, h = struct.unpack_from("<ii", p, 18)
    bpp = struct.unpack_from("<H", p, 28)[0]
    if bpp != 24 or h < 0:
        raise NotImplementedError("resize implemented for bottom-up 24bpp BMP")
    row = ((24 * w + 31) // 32) * 4
    px = np.frombuffer(p, dtype=np.uint8, count=row * h, offset=off).reshape(h, row)
    px = px[:, : w * 3].reshape(h, w, 3)
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    out = px[yi][:, xi]  # nearest-neighbor sample
    orow = ((24 * out_w + 31) // 32) * 4
    body = np.zeros((out_h, orow), dtype=np.uint8)
    body[:, : out_w * 3] = out.reshape(out_h, out_w * 3)
    return make_bmp(out_w, out_h)[:54] + body.tobytes()


def _wav_chunks(p: bytes) -> tuple[int, int, int, int, int, int, int]:
    """One RIFF chunk-walk shared by decode and transform paths:
    (audio_format, rate, chans, block, bits, data_off, data_size).
    Raises NotImplementedError for non-WAV payloads."""
    import struct

    if not (p[:4] == b"RIFF" and p[8:12] == b"WAVE"):
        raise NotImplementedError("not a RIFF/WAVE payload")
    off, fmt, rate, chans, block, bits = 12, 0, 0, 0, 0, 0
    data_off, data_size = -1, 0
    while off + 8 <= len(p):
        tag, size = struct.unpack_from("<4sI", p, off)
        if tag == b"fmt " and size >= 16:
            fmt, chans, rate, _, block, bits = struct.unpack_from("<HHIIHH", p, off + 8)
        elif tag == b"data" and block:
            data_off, data_size = off + 8, size
        off += 8 + size + (size & 1)
    return fmt, rate, chans, block, bits, data_off, data_size


def sample_wav_frames(p: bytes, every: int) -> bytes:
    """REAL frame-sampling of a 16-bit PCM WAV: keep every ``every``-th
    audio frame by block-align slicing of the data chunk and rebuild the
    RIFF container with corrected sizes. Raises NotImplementedError for
    non-WAV payloads and for non-16-bit / non-PCM encodings (``make_wav``
    writes a 16-bit PCM header, so rebuilding any other encoding with it
    would emit a corrupt container claiming the wrong sample width —
    ffmpeg's territory)."""
    import numpy as np

    fmt, rate, chans, block, bits, data_off, data_size = _wav_chunks(p)
    if fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"frame sampling implemented for 16-bit PCM only (format={fmt}, bits={bits})"
        )
    if data_off < 0 or not block:
        raise NotImplementedError("WAV without fmt/data chunks")
    frames = np.frombuffer(p, dtype=np.uint8, count=data_size, offset=data_off)
    frames = frames[: (data_size // block) * block].reshape(-1, block)
    kept = frames[::every]
    # rebuild: a fresh 44-byte RIFF/fmt/data header with corrected sizes,
    # then the surviving frame bytes
    return make_wav(rate, chans, len(kept))[:44] + kept.tobytes()


def resize_payload(p: bytes, out_w: int, out_h: int) -> bytes:
    """Format-dispatched resize: 24-bit bottom-up BMP through the
    pure-Python nearest-neighbor kernel (:func:`resize_bmp` —
    codec-independent, bit-stable), anything else — including BMP
    VARIANTS the pure kernel refuses (top-down, palette, 32bpp; r13
    review finding) — through PIL when installed (nearest resample for
    determinism, re-encoded in the source format). Raises
    NotImplementedError when neither path applies — the
    transform_payloads kernel catches it and passes the payload
    through flagged."""
    if p[:2] == b"BM":
        try:
            return resize_bmp(p, out_w, out_h)
        except NotImplementedError:
            if _pil_image() is None:
                raise  # no fallback: keep the pure kernel's message
    Image = _pil_image()
    if Image is not None:
        import io

        with Image.open(io.BytesIO(p)) as im:
            fmt = im.format
            # Image.Resampling only exists on Pillow >= 9.1; older
            # clusters expose the constant module-level. Version-
            # tolerant lookup, or transform_payloads' broad except
            # would silently pass every resize through untransformed
            # (r13 advisory)
            nearest = getattr(Image, "Resampling", Image).NEAREST
            out = im.resize((out_w, out_h), resample=nearest)
            buf = io.BytesIO()
            out.save(buf, format=fmt)
            return buf.getvalue()
    raise NotImplementedError(
        "resize of non-BMP payloads requires PIL (not available in this "
        "container)"
    )


def transform_payloads(
    df: DataFrame,
    op: str,
    out_w: int = 8,
    out_h: int = 8,
    every: int = 2,
) -> DataFrame:
    """Batch resize / frame-sample — the preprocessing step between
    decode and feature extraction at
    100 TB scale, over any (doc_id, payload) frame. Arrow-batched
    ``mapInPandas`` (the sanctioned Python hop), zero shuffle,
    embarrassingly parallel; payloads whose format the pure-Python
    kernels can't transform pass through UNCHANGED with
    ``transformed=false`` (production swaps in PIL/ffmpeg inside the
    same kernel — the Spark-side plumbing is identical).

    ``op``: 'resize' (images → ``out_w`` × ``out_h``) or 'frame_sample'
    (audio → every ``every``-th frame).
    """
    if op not in ("resize", "frame_sample"):
        raise ValueError("op must be 'resize' or 'frame_sample'")
    if op == "resize" and (out_w < 1 or out_h < 1):
        raise ValueError("out_w/out_h must be >= 1")
    if op == "frame_sample" and every < 1:
        raise ValueError("every must be >= 1")
    from pyspark.sql.types import BinaryType, BooleanType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("transformed", BooleanType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            outs, flags = [], []
            for p in pdf["payload"]:
                b = b"" if p is None else bytes(p)
                # broad catch, not just NotImplementedError: a truncated
                # header or corrupt chunk table raises struct/Value/Index
                # errors from the parsers, and the documented contract is
                # "untransformable payloads pass through flagged", not
                # "fail the stage after 4 task retries at 100 TB"
                try:
                    if op == "resize":
                        outs.append(resize_payload(b, out_w, out_h))
                    else:
                        outs.append(sample_wav_frames(b, every))
                    flags.append(True)
                except Exception:
                    outs.append(b)
                    flags.append(False)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": outs, "transformed": flags}
            )

    return df.select("doc_id", "payload").mapInPandas(batches, schema)
