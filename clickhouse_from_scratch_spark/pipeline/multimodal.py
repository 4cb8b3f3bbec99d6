"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed by Arrow-batched pandas transforms.

The decode step itself is STUBBED (no image/audio libs in this container):
``decode_image_batch`` produces a deterministic fake decode so the
Spark-side plumbing — schema, partitioning, ``mapInPandas`` batch shape —
is real and testable. Swap ``_fake_decode`` for PIL/librosa in production.

Scale design: ``mapInPandas`` keeps binary payloads inside Arrow batches
(no per-row pickling); repartition before decode sizes tasks by bytes,
not rows, since blobs are wide.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = ("doc_id long, media_type string, n_bytes long, "
                  "width long, height long, checksum string")


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Make an opaque binary column + metadata struct from text (test rig:
    stands in for real image bytes; schema shape is the contract)."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/png").alias("mime"),
            F.length(F.col(text_col)).alias("orig_size"),
        ).alias("media_meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic fake of an image decode: derive (width, height) from
    the payload length. A real decoder raises here instead:

        raise NotImplementedError("image decode requires PIL")
    """
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1)


def decode_image_batch(docs_with_payload: DataFrame) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched).

    Output schema is fixed (DECODED_SCHEMA); the fake decode keeps this
    runnable without PIL while exercising the real execution path.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            widths, heights, checks, sizes = [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                w, h = _fake_decode(b)
                widths.append(w)
                heights.append(h)
                sizes.append(len(b))
                checks.append(hashlib.md5(b).hexdigest())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": [m["mime"] for m in pdf["media_meta"]],
                "n_bytes": sizes,
                "width": widths,
                "height": heights,
                "checksum": checks,
            })

    return docs_with_payload.mapInPandas(decode, schema=DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling stand-in: deterministic 1-in-N selection by checksum
    hash (the video analogue of SAMPLE-by-key; pure filter, no shuffle)."""
    return decoded.filter(F.pmod(F.xxhash64("checksum"), F.lit(every_n)) == 0)
