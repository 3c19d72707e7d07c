"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched kernels over ``mapInPandas``.  The image/audio codecs are NOT
available in this environment, so the codec call itself is stubbed behind
``SPARKX_FAKE_DECODE`` (deterministic md5-based fake) /
``NotImplementedError`` — but the Spark-side plumbing (schema, batching,
partitioning, UDF signature) is real and tested, which is the part that has
to be right at 100 TB.

Mirrors the reference's figure path: PIL images held as opaque payloads
(reference ``src/core/parser.py:111-118``) with only shape metadata consumed
downstream (``src/agents/extraction.py:202-306``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

MEDIA_SCHEMA = (
    "media_id long, kind string, width int, height int, n_bytes long, media binary"
)
DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, n_bytes long, "
    "ok boolean, feature array<float>, digest string"
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Deterministically wrap the documents table as a media table: payload =
    utf-8 bytes, metadata derived arithmetically (stands in for real image
    bytes in this codec-less sandbox)."""
    payload = F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            ((F.col("doc_id") % 3) + 1).cast("int"),
        ).alias("kind"),
        ((F.col("doc_id") % 16) * 64 + 64).cast("int").alias("width"),
        ((F.col("doc_id") % 9) * 60 + 60).cast("int").alias("height"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        payload.alias("media"),
    )


class _FakeCodec:
    """Deterministic stand-in for the decode library.  Loaded through
    ExecutorRegistry so the (expensive, in real life) codec/model init runs
    once per Python worker process, not once per Arrow batch — the S8
    ModelCache semantics on executors."""

    def digest(self, payload: bytes) -> str:
        return hashlib.md5(payload).hexdigest()


def _decode_kernel(fake: bool, it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from sparkx.registry import ExecutorRegistry

    if not fake:
        # Real path: PIL/av/soundfile decode per kind — not shipped here.
        raise NotImplementedError(
            "real media decode requires PIL/av; run with fake_decode=True "
            "in codec-less environments"
        )
    codec = ExecutorRegistry.get(("codec", "fake"), _FakeCodec)
    for pdf in it:
        n = len(pdf)
        # Deterministic fake: digest of the raw payload + a fixed-dim feature
        # derived from the digest bytes (stable across runs and partitions).
        # NULL payloads decode as empty bytes (100-TB inputs contain nulls).
        digests = [
            codec.digest(bytes(b) if b is not None else b"") for b in pdf["media"]
        ]
        feats = [
            np.frombuffer(bytes.fromhex(d), dtype=np.uint8)[:FEATURE_DIM].astype(
                np.float32
            )
            / 255.0
            for d in digests
        ]
        out = pdf[["media_id", "kind", "width", "height", "n_bytes"]].copy()
        out["ok"] = np.ones(n, dtype=bool)
        out["feature"] = feats
        out["digest"] = digests
        yield out


def decode_media(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched decode/feature-extract.  Repartitions on media_id hash so
    huge single-key payload groups spread evenly (same skew treatment as the
    transcript pipeline)."""
    import functools

    d = media.repartition(
        media.sparkSession.sparkContext.defaultParallelism * 2,
        F.xxhash64("media_id"),
    )
    return d.mapInPandas(
        functools.partial(_decode_kernel, fake_decode), schema=DECODED_SCHEMA
    )


def resize_plan(decoded: DataFrame, max_dim: int = 512) -> DataFrame:
    """Resize is pure metadata arithmetic until the codec runs: compute the
    target geometry natively; the pixel op itself joins the stubbed kernel."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_dim) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return decoded.select(
        "media_id",
        "kind",
        F.round(F.col("width") * scale).cast("int").alias("out_width"),
        F.round(F.col("height") * scale).cast("int").alias("out_height"),
        F.round(scale, 4).alias("scale"),
    )


def frame_sample_plan(media: DataFrame, fps: int = 1, every_n: int = 30) -> DataFrame:
    """Frame sampling for video rows: deterministic frame index list derived
    from metadata (duration proxy = n_bytes); explode → one row per frame —
    the flatMap shape the real sampler will keep."""
    frames = F.expr(f"sequence(0, cast(n_bytes / 64 as int), {every_n})")
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("frame_idx"))
    )
