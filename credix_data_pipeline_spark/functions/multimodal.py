"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as binary columns
next to text.  The engine treats them as ``BinaryType`` with typed metadata
and runs decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` stages (one Python worker per partition, columnar transfer —
never per-row Python).

The actual media codecs (PIL/ffmpeg/librosa) are NOT available in this
environment, so the decode step is stubbed two ways:

* :func:`decode_image` / :func:`decode_audio` — raise ``NotImplementedError``
  with the exact integration point documented, and
* :func:`fake_decode_features` — a deterministic pure function of the bytes,
  used by tests/oracles so the surrounding Spark plumbing (schema, binary
  column, Arrow batch iteration, partitioning) is fully exercised.

Reference parity: the reference moves opaque blobs through the lake the same
way (Parquet bytes landed then loaded, `data_processing.py:37-42`,
`gcp_resource.py:24-30`); this generalizes that to media payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
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
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("payload", StringType()),  # BinaryType in real tables
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Decode an image payload to HxWxC array.

    STUB: real implementation would be ``PIL.Image.open(io.BytesIO(payload))``
    inside the same mapInPandas batch loop; PIL is not installed here.
    """
    raise NotImplementedError("image codec not available in this environment")


def decode_audio(payload: bytes):  # pragma: no cover - stub
    """STUB: real implementation: ``soundfile.read(io.BytesIO(payload))``."""
    raise NotImplementedError("audio codec not available in this environment")


def fake_decode_features(payload: bytes) -> tuple[int, str, int, int, int]:
    """Deterministic stand-in for decode+feature-extract: a pure function of
    the payload bytes, mirrored exactly by the SQL oracle."""
    n = len(payload)
    return (
        n,
        hashlib.md5(payload).hexdigest(),
        64 + n % 512,          # fake width
        64 + (n * 7) % 512,    # fake height
        1 + n % 16,            # fake frame count
    )


def extract_features_map_in_pandas(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over a (doc_id, payload:binary) frame.

    The per-batch loop is where a real codec would decode; everything around
    it (binary column, Arrow transfer, output schema, partition-parallelism)
    is production plumbing.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_decode_features(b) for b in pdf["payload"]]
            out = pd.DataFrame(
                feats,
                columns=["n_bytes", "content_md5", "width", "height", "n_frames"],
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)
