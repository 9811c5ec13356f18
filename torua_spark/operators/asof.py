"""As-of and range (interval) joins — operators Spark lacks natively
(pyspark guide "Common OLAP patterns"), built from shuffle-friendly
primitives instead of per-group pandas:

- ``asof_join``: union both sides with a side marker, one sort per
  key, carry the right side forward with ``last(ignorenulls)`` over an
  unbounded-preceding window. One shuffle on the key, one sort —
  at 100 TB this is a single range-partitioned sort per key group,
  with none of merge_asof's per-group pandas materialization.

- ``range_join_bucketized``: equi-join on a coarse time bucket (each
  interval exploded to the buckets it overlaps) + exact containment
  filter. Turns the O(n·m) inequality join Spark would execute as a
  nested loop into a hash join whose cost tracks actual overlaps.

The DuckDB oracle runs its *native* ASOF JOIN / inequality join, so
these implementations are verified against an independent engine's
built-in semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: str,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For every left row, attach ``payload`` from the nearest right
    row per key ``on`` — ``direction='backward'`` (default): latest
    right with ``right.ts <= left.ts``; ``direction='forward'``:
    earliest right with ``right.ts >= left.ts`` (both inclusive, the
    pandas ``merge_asof`` directions). ``tolerance_seconds`` NULLs the
    payload when the matched row is further than the tolerance from
    the left timestamp (the match itself is still the nearest row —
    exactly merge_asof's tolerance semantics). Left rows with no match
    get NULL. Columns in the result: all left columns + ``payload``.

    The carried value is wrapped in a single-field struct emitted only
    for right rows, so a right row whose payload is genuinely NULL
    still *wins* (native ASOF semantics: the row is matched and its
    NULL returned) instead of being skipped by ``ignorenulls`` in
    favor of an older non-null payload. Ties among multiple right rows
    at the same (key, ts) are broken deterministically: the greatest
    payload value wins (ascending struct order, last-wins).

    Plan shape is direction-independent: union both sides with a side
    marker, ONE sort per key (forward just negates the sort key), one
    unbounded-preceding carry — a single range-partitioned sort at
    100 TB, no per-group pandas."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    l_cols = left.columns
    p_type = right.schema[payload].dataType
    marker_type = "struct<p:" + p_type.simpleString() + ">"
    lhs = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(marker_type).alias("_marker"),
        *[F.col(c).alias(f"_l_{c}") for c in l_cols],
    )
    rhs = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(F.col(payload).alias("p")).alias("_marker"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in l_cols],
    )
    # Right rows sort before left rows at equal ts (_side 0 < 1), which
    # yields inclusive semantics in both directions; _marker orders
    # right rows with equal (key, ts) so the carried payload is
    # deterministic. Forward = backward over the time-reversed axis.
    both = lhs.unionByName(rhs).withColumn(
        "_ord",
        F.unix_micros(F.col("_ts").cast("timestamp"))
        * F.lit(1 if direction == "backward" else -1),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ord", "_side", "_marker")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = both.withColumn(
        "_asof", F.last("_marker", ignorenulls=True).over(w)["p"]
    )
    if tolerance_seconds is not None:
        gap_ok = (
            F.abs(
                F.unix_micros(F.col("_ts").cast("timestamp"))
                - F.last(
                    F.when(F.col("_side") == 0, F.unix_micros(F.col("_ts").cast("timestamp"))),
                    ignorenulls=True,
                ).over(w)
            )
            <= F.lit(int(tolerance_seconds) * 1_000_000)
        )
        out = out.withColumn("_asof", F.when(gap_ok, F.col("_asof")).otherwise(F.lit(None)))
    return (
        out.filter(F.col("_side") == 1)
        .select(*[F.col(f"_l_{c}").alias(c) for c in l_cols], F.col("_asof").alias(payload))
    )


def range_join_bucketized(
    events: DataFrame,
    intervals: DataFrame,
    event_ts: str,
    start: str,
    end: str,
    bucket_seconds: int,
) -> DataFrame:
    """Join events to the intervals containing them ([start, end),
    half-open) via coarse bucket equi-join + exact filter. ``intervals``
    keeps all its columns; result = events ⋈ containing intervals."""
    bucket = lambda c: F.floor(F.unix_timestamp(c) / F.lit(bucket_seconds))  # noqa: E731
    ev = events.withColumn("_b", bucket(F.col(event_ts)))
    iv = intervals.withColumn(
        "_bs",
        F.sequence(bucket(F.col(start)), bucket(F.col(end))),
    ).select(*intervals.columns, F.explode("_bs").alias("_b"))
    return (
        ev.join(iv, "_b")
        .filter((F.col(event_ts) >= F.col(start)) & (F.col(event_ts) < F.col(end)))
        .drop("_b")
    )
