"""Vector expressions (reference B7 — vector embedding support /
semantic search, README.md:315-320, ARCHITECTURE.md:771-778).

All dense-vector math is built from Spark's higher-order array
functions (``zip_with`` + ``aggregate``) — JVM-side, no UDF, no Arrow
round-trip. Embeddings are float32 in parquet; everything widens to
double *before* the dot product so results match the DuckDB oracle's
double-precision ``list_cosine_similarity`` (FIXTURES.md §3.4).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_double_array(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays."""
    return dot(a, b) / (norm(a) * norm(b))
