"""Multimodal column plumbing (SURVEY.md §2.9 / north_star).

Images/audio/video are opaque ``binary`` payloads with typed metadata
(schemas.MEDIA). The Spark-side machinery — schema, partition-preserving
``mapInPandas`` with Arrow batches, deterministic feature extraction — is
real and tested; the actual codec step is STUBBED (the image/audio libs are
not in this container) behind ``decode_payload``, which raises
NotImplementedError unless the deterministic fake is requested.

At 100 TB: payloads ride in parquet binary columns; mapInPandas keeps the
work per-partition with Arrow batch transfer (no driver involvement, no
shuffle); feature extraction is embarrassingly parallel.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tables import spread

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, width int, height int, checksum string"
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from ``documents``: payload = utf-8 bytes of
    the text (a deterministic opaque blob), kind cycles image/audio/video.
    Stands in for `spark.read.format("binaryFile")` / parquet binary scans."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return spread(docs).select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )


def decode_payload(payload: bytes, kind: str, deterministic_fake: bool = False):
    """STUB — real decoding needs PIL/ffmpeg/librosa, not in this container.

    With ``deterministic_fake=True`` returns synthetic (width, height)
    derived from the byte length — enough to make the distributed plumbing
    testable end-to-end and oracle-checkable."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media codecs not available in this environment; "
            "pass deterministic_fake=True for the test fake"
        )
    n = len(payload)
    return (n % 640 + 16, (n * 7) % 480 + 16)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payloads.

    mapInPandas: each partition's rows arrive as pandas batches; output is
    one feature row per media row (checksum proves the real bytes made the
    round trip through Arrow)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [
                decode_payload(p, k, deterministic_fake=True)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "checksum": [hashlib.sha256(p).hexdigest() for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)
