"""JVM-side literal relations for fixture/metadata-sized data.

``spark.createDataFrame(py_rows, ...)`` parallelizes pickled Python
rows over ``defaultParallelism`` partitions; every downstream stage
then launches Python workers just to deserialize a handful of literal
rows (~0.35 s per tiny job on local[32], measured). Admin/registry
queries (assignment tables, state machines, node lists — the
reference's in-memory registry, internal/cluster/shard_registry.go)
are built from such literals, so they were paying that tax per leg.

``local_df`` instead renders the rows as a SQL ``VALUES`` literal:
Catalyst folds it to a ``LocalTableScan`` — no Python workers, no
scan stage, constant-foldable, broadcastable by size. Collect of a
4-row relation drops 0.35 s -> 0.006 s; a 7-leg admin composite
drops ~2.5 s of pure overhead. On a real cluster the same holds:
metadata stays a driver-local literal instead of a 32-task job.

Scope: flat primitive schemas (string/int/bigint/double/boolean/
binary + NULLs) — exactly the fixture shapes. Nested/decimal types
should keep using ``spark.createDataFrame``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

__all__ = ["local_df"]


def _lit(v, typ: str) -> str:
    """One SQL literal, injection-safe for arbitrary str/bytes values."""
    if v is None:
        return f"CAST(NULL AS {typ})"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
        # the `d` suffix makes this a DOUBLE literal directly — a bare
        # `-0.0` would parse as DECIMAL (no signed zero) and lose the
        # sign bit through the cast (hypothesis-found)
        return f"{v!r}d"
    if isinstance(v, (bytes, bytearray)):
        return "X''" if not v else f"X'{bytes(v).hex()}'"
    # Spark's default string literal treats backslash as an escape.
    s = str(v).replace("\\", "\\\\").replace("'", "\\'")
    return f"'{s}'"


def local_df(spark: SparkSession, rows, ddl: str) -> DataFrame:
    """Literal rows -> DataFrame whose physical plan is LocalTableScan.

    ``ddl`` is a flat comma-separated ``name type`` schema string (the
    same shape passed to ``spark.createDataFrame``). Every column is
    CAST to its declared type so VALUES' type inference can't drift
    (int -> INT vs BIGINT, etc.). Empty ``rows`` yields an empty
    relation with the right schema.
    """
    parts = [p.strip() for p in ddl.split(",")]
    names = [p.split(None, 1)[0] for p in parts]
    types = [p.split(None, 1)[1] for p in parts]
    cols = ", ".join(f"CAST({n} AS {t}) AS {n}" for n, t in zip(names, types))
    alias = f"_t({', '.join(names)})"
    if not len(rows):
        nulls = ", ".join(f"CAST(NULL AS {t})" for t in types)
        return spark.sql(f"SELECT {cols} FROM (VALUES ({nulls})) AS {alias} WHERE 1=0")
    for i, r in enumerate(rows):
        if len(r) != len(types):
            # zip would silently truncate — fail as loudly as
            # createDataFrame's length-mismatch error did.
            raise ValueError(
                f"local_df: row {i} has {len(r)} values for "
                f"{len(types)} schema columns ({ddl!r})"
            )
    tuples = (
        "(" + ", ".join(_lit(v, t) for v, t in zip(r, types)) + ")" for r in rows
    )
    return spark.sql(f"SELECT {cols} FROM (VALUES {', '.join(tuples)}) AS {alias}")
