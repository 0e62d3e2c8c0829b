"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference capability (BASELINE.json north star). The pattern for
image/audio/video at 100 TB:

- payloads are **opaque ``binary`` columns** with a small typed metadata
  struct alongside (modality, byte length, content digest);
- decode / feature-extraction runs as **Arrow-batched ``mapInPandas``** —
  the only sanctioned Python hop — so each task processes a columnar batch,
  never a row at a time;
- real codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
  decode step is STUBBED: ``decode_stub=True`` derives deterministic fake
  features from the content digest (real Spark plumbing — schema,
  batching, partitioning — with a fake kernel); ``decode_stub=False``
  raises NotImplementedError where the codec call belongs.
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


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode/feature-extract payloads via Arrow-batched mapInPandas.

    Stub kernel: width/height/n_frames derived from the first digest bytes
    (deterministic, engine-independent). A real deployment swaps the body
    for PIL/ffmpeg decode; the Spark plumbing is unchanged.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real decode requires PIL/ffmpeg; not available in this "
                    "container — run with decode_stub=True"
                )
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
