"""Multimodal column plumbing (north-star: image/audio/video as opaque
binary columns with typed metadata; reference B8 multi-modal RAG,
README.md:209-212 — docs only, no code).

The container has no image/audio codecs, so the *decode* step is a
deterministic fake (md5-derived pseudo-metadata) clearly marked below;
everything around it — the binary column schema, Arrow-batched
``mapInPandas`` operator shape, per-batch iteration, and partitioning
behavior — is the real 100 TB design:

- payloads travel as parquet ``binary`` columns (never strings)
- feature extraction is ``mapInPandas`` so each task processes Arrow
  record batches without per-row Python overhead; at scale the same
  UDF body calls a real codec (PIL/ffmpeg) per batch
- outputs are narrow typed columns so downstream joins/apps never
  re-read the blob
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, digest string, width int, height int, mode string"
)


def to_media_table(documents: DataFrame) -> DataFrame:
    """Model a media corpus: binary payload + mime + source metadata.
    (Payload = utf-8 of the text column; at scale this is the raw image
    / audio blob ingested from object storage.)"""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        "source",
    )


def _decode_batch(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB DECODE — deterministic fake. A real deployment replaces the
    body of this function with an actual codec (PIL.Image.open /
    soundfile / pyav frame sampling); the operator contract (Arrow
    batches in, typed features out) is unchanged."""
    for pdf in batches:
        digests = [hashlib.md5(p).hexdigest() for p in pdf["payload"]]
        h = [int(d[:8], 16) for d in digests]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "digest": digests,
                "width": [1 + (x % 640) for x in h],
                "height": [1 + ((x // 640) % 480) for x in h],
                "mode": ["RGB"] * len(pdf),
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """Decode/feature-extract via mapInPandas over binary payloads."""
    return media.select("doc_id", "payload").mapInPandas(_decode_batch, FEATURE_SCHEMA)


RESIZE_BOX = 224


def resize_specs(media: DataFrame, box: int = RESIZE_BOX) -> DataFrame:
    """Resize PLANNING — the JVM-side half of the resize operator:
    fit-within-box target geometry (aspect-preserving, never upscale)
    computed from decoded metadata. A real pipeline splits exactly
    here: codec decode (Arrow-batched Python) emits metadata, the
    geometry/filter/pruning logic stays in whole-stage codegen, and
    only rows with `needs_resize` re-enter the (expensive) pixel
    stage — at 100 TB that pruning is most of the win."""
    feats = extract_features(media)
    longest = F.greatest(F.col("width"), F.col("height"))
    scale = F.when(longest > box, F.lit(float(box)) / longest).otherwise(F.lit(1.0))
    # round-half-up (floor(x+0.5)), the PIL geometry convention — floor
    # alone undershoots the box edge when scale*longest lands at
    # 223.999... in IEEE arithmetic.
    new_dim = lambda c: (  # noqa: E731
        F.greatest(F.lit(1), F.floor(F.col(c) * scale + F.lit(0.5))).cast("int")
    )
    return feats.select(
        "doc_id",
        "width",
        "height",
        new_dim("width").alias("new_width"),
        new_dim("height").alias("new_height"),
        (longest > box).alias("needs_resize"),
    )


def resize_pixels(media: DataFrame, box: int = RESIZE_BOX) -> DataFrame:
    """Pixel resampling — requires a real image codec; the Spark-side
    contract is resize_specs ⋈ payload -> mapInPandas(PIL resize).
    Not implementable in this container."""
    raise NotImplementedError(
        "pixel resampling needs an image codec (PIL) absent from this "
        "environment; target geometry comes from resize_specs"
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling — requires a real codec; the Spark-side
    contract is identical to extract_features (mapInPandas over binary
    + frame index explode). Not implementable in this container."""
    raise NotImplementedError(
        "frame sampling needs a video codec (pyav/ffmpeg) absent from this "
        "environment; plumbing contract documented in extract_features"
    )
