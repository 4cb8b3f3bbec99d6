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


RESIZED_SCHEMA = ("doc_id long, payload binary, width long, height long")


def resize_image_batch(docs_with_payload: DataFrame, width: int = 64,
                       height: int = 64) -> DataFrame:
    """Resize via mapInPandas (Arrow-batched, no per-row pickling).

    The pixel resample itself is STUBBED (no PIL in this container): the
    fake 'resize' deterministically truncates/tiles the payload to
    width*height bytes, so the batch shape, binary round-trip, and fixed
    output schema — the parts Spark owns — are real and tested. Swap the
    body for ``PIL.Image.resize`` in production."""
    target = int(width) * int(height)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                if not b:
                    b = b"\x00"
                reps = (target + len(b) - 1) // len(b)
                out.append((b * reps)[:target])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "payload": out,
                "width": [int(width)] * len(out),
                "height": [int(height)] * len(out),
            })

    return docs_with_payload.mapInPandas(resize, schema=RESIZED_SCHEMA)


def extract_features_batch(docs_with_payload: DataFrame,
                           dim: int = 16) -> DataFrame:
    """Feature extraction via mapInPandas: payload bytes → deterministic
    unit-norm float vector (md5-seeded fake of an image/audio encoder —
    the real model slots into the same batch loop). The output
    ``embedding: array<float>`` feeds the similarity/ANN operators
    directly, so binary → features → near-dup runs end-to-end."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import math
        for pdf in batches:
            vecs = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                raw = []
                i = 0
                while len(raw) < dim:
                    d = hashlib.md5(b + i.to_bytes(4, "little")).digest()
                    raw.extend(x / 255.0 - 0.5 for x in d)
                    i += 1
                v = raw[:dim]
                n = math.sqrt(sum(x * x for x in v)) or 1.0
                vecs.append([float(x / n) for x in v])
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "embedding": vecs})

    return docs_with_payload.mapInPandas(
        feats, schema="doc_id long, embedding array<float>")
