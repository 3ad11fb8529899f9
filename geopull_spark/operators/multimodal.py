"""Multimodal columns: opaque binary media + typed metadata.

Media (image/audio/video) rides as ``binary`` columns with a typed metadata
struct. The decode step is STUBBED (no image/audio libs in this container —
clearly marked ``NotImplementedError`` / deterministic fake), but the Spark
plumbing — schema, batch shape, ``mapInPandas`` signature, partitioning — is
real and tested:

  materialize_media   — doc spans → one row per media span with deterministic
                        fake bytes (pure function of media_ref)
  decode_media        — STUB: raises unless fake=True, where it derives
                        typed metadata from the bytes deterministically
  extract_features    — Arrow-batched feature extractor (hash-based fake
                        embedding; swap the kernel for a real model runner)
  sample_frames       — video frame sampling stub (batch plumbing real)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def materialize_media(docs: DataFrame) -> DataFrame:
    """Explode media spans; synthesize deterministic bytes per media_ref
    (stand-in for an object-store fetch keyed by the ref)."""
    spans = docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).filter(F.col("s.media_ref").isNotNull())

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, ref, kind in zip(pdf["doc_id"], pdf["media_ref"], pdf["kind"]):
                seed = np.frombuffer(ref.encode().ljust(8, b"\0")[:8], dtype=np.uint64)[0]
                rng = np.random.default_rng(int(seed))
                size = 64 + int(seed % 192)
                rows.append((ref, doc_id, kind, rng.bytes(size)))
            yield pd.DataFrame(rows, columns=MEDIA_SCHEMA.fieldNames())

    flat = spans.select(
        "doc_id", F.col("s.media_ref").alias("media_ref"), F.col("s.kind").alias("kind")
    )
    return flat.mapInPandas(gen, MEDIA_SCHEMA)


def decode_media(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode media bytes → typed metadata.

    Real decoders (PIL/ffmpeg) are unavailable in this container; with
    ``fake=False`` this raises ``NotImplementedError`` inside the kernel.
    With ``fake=True`` metadata is derived deterministically from the bytes
    so the downstream plumbing (schema, joins, aggregation) is exercised."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image/audio decode requires PIL/ffmpeg — not in container"
                )
            rows = []
            for ref, kind, content in zip(pdf["media_ref"], pdf["kind"], pdf["content"]):
                b = bytes(content)
                n = len(b)
                if kind == "image":
                    rows.append((ref, kind, n, 16 + b[0] % 240, 16 + b[1] % 240, None))
                else:  # audio
                    rows.append((ref, kind, n, None, None, 1000 + b[0] * 37))
            yield pd.DataFrame(rows, columns=META_SCHEMA.fieldNames())

    return media.mapInPandas(decode, META_SCHEMA)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction (the model-runner slot). The fake
    kernel hashes byte windows into a unit-normalized float vector —
    deterministic, vectorized per batch."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_refs, out_vecs = [], []
            for ref, content in zip(pdf["media_ref"], pdf["content"]):
                b = np.frombuffer(bytes(content), dtype=np.uint8).astype(np.float64)
                chunks = np.array_split(b, dim)
                v = np.array([c.sum() % 997 for c in chunks], dtype=np.float64)
                norm = np.linalg.norm(v)
                v = v / norm if norm > 0 else v
                out_refs.append(ref)
                out_vecs.append(v.astype(np.float32).tolist())
            yield pd.DataFrame({"media_ref": out_refs, "features": out_vecs})

    return media.select("media_ref", "content").mapInPandas(feats, FEATURES_SCHEMA)
