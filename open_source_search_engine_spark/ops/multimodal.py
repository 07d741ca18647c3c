"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the payload as a
``binary`` column with typed metadata alongside, keep Spark-side
operations (schema, partitioning, Arrow batch shape) real, and run the
actual codec work in vectorized `mapInPandas` stages. The decode
libraries (PIL/ffmpeg/etc.) are not in this container, so the codec step
is STUBBED: ``decode_image_meta`` computes deterministic fake
dimensions from the bytes, and ``decode_image_pixels`` raises
``NotImplementedError`` unless a decoder import succeeds. Everything
around the stub — batch iteration, schema, column pruning — is real and
tested.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def to_binary_payload(docs: DataFrame, payload_col: str = "text") -> DataFrame:
    """(doc_id, payload:binary) — models a media blob column; here the
    bytes are the doc text (the container has no real media), but the
    Spark-side handling is payload-agnostic."""
    return docs.select(
        "doc_id", F.encode(F.col(payload_col), "UTF-8").alias("payload")
    )


def _sniff_format(head: bytes) -> str:
    if head[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if head[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if head[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if head[:4] == b"RIFF":
        return "riff"
    return "unknown"


def decode_image_meta(payloads: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction. Real pipeline: parse the actual
    container header. Stub: deterministic fake dims from byte length
    (width = n mod 640 + 1, height = (n*7) mod 480 + 1) so tests pin the
    plumbing end-to-end."""

    def run(iterator):
        for pdf in iterator:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("int32"),
                    "format": [
                        _sniff_format(bytes(p[:8])) for p in pdf["payload"]
                    ],
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n * 7 % 480 + 1).astype("int32"),
                }
            )

    return payloads.mapInPandas(run, schema=IMAGE_META_SCHEMA)


def decode_image_pixels(payloads: DataFrame) -> DataFrame:
    """Real pixel decode — requires an image library not present in this
    container. The Spark plumbing (Arrow batches of binary -> array
    column) is what this function would wrap."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL/pillow (not installed in this "
            "container); decode_image_meta exercises the same plumbing"
        ) from e
    raise NotImplementedError("real decode path not implemented")
