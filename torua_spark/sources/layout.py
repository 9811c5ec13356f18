"""Z-order (Morton-curve) data layout — multi-dimensional clustering
for the 100 TB scan path.

``io.write_time_partitioned`` already gives partition pruning on time
plus single-column row-group clustering ("the poor-man's Z-order").
This module is the real thing: interleaving the bits of k quantized
dimensions gives ONE sort key whose locality covers range predicates
on ANY subset of those dimensions — the file/row-group min/max
statistics become tight on every interleaved column at once, so a
``user_id BETWEEN .. AND ts BETWEEN ..`` scan skips the bulk of a
table no single-column sort could skip. This is the same layout
technique Delta OPTIMIZE ZORDER BY and Iceberg's zorder rewrite apply;
here it rides plain parquet + repartitionByRange, matching the repo's
storage contract (SURVEY §7: no lakehouse jars in image).

Everything is EXACT integer arithmetic (quantize = affine map +
integer division; interleave = shift/or), so the DuckDB oracle
reproduces z-values bit-for-bit and the layout query is
hash-verifiable like any other declared entry.

Reference tie-in: B14 "index usage" (ARCHITECTURE.md:543 — per-shard
indexes) realized as file layout, the Spark-native equivalent of an
index over (key, time).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def quantize_int(col: Column | str, lo: int, hi: int, bits: int) -> Column:
    """Affine-map an integer column from [lo, hi] onto [0, 2^bits),
    clamped at both ends — exact integer math (``(x-lo)*2^bits DIV
    span``), reproducible bit-for-bit in any SQL engine.

    Exactness bound: Spark's ``/`` is double division, and
    floor(double-div) equals integer DIV only while the numerator
    stays under 2^53 — so ``span * 2^bits`` must fit 53 bits (the
    input is range-clamped BEFORE the multiply, so outliers can't
    overflow either). Epoch-seconds x 16 bits passes with 4 orders
    of margin; epoch-MILLIS over multi-year spans does not — raise
    fewer bits or pre-scale the column, and the error says so."""
    col = F.col(col) if isinstance(col, str) else col
    span = hi - lo + 1
    m = 1 << bits
    if span * m > (1 << 53):
        raise ValueError(
            f"quantize_int: span {span} x 2^{bits} exceeds exact double "
            f"range (2^53) — floor(a/b) would drift off integer DIV at "
            f"cell boundaries. Pre-scale the column (e.g. millis -> "
            f"seconds) or lower bits."
        )
    # Clamp the RAW value to [lo-1, hi+1] first: below-range collapses
    # to bucket 0 and above-range to 2^bits - 1 exactly as the
    # unclamped SQL twin does, while the product stays within the
    # guarded exact range for arbitrarily wild inputs.
    xc = F.greatest(F.lit(lo - 1), F.least(F.lit(hi + 1), col.cast("long")))
    q = F.floor((xc - F.lit(lo)) * F.lit(m) / F.lit(span)).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(m - 1), q))


def quantize_int_sql(expr: str, lo: int, hi: int, bits: int) -> str:
    span = hi - lo + 1
    q = f"((CAST({expr} AS BIGINT) - {lo}) * {1 << bits}) // {span}"
    return f"greatest(0, least({(1 << bits) - 1}, {q}))"


def zvalue(cols: list[Column], bits: int) -> Column:
    """Morton interleave of k pre-quantized columns (each in
    [0, 2^bits)): bit i of column c lands at position
    ``i*k + (k-1-c)`` — column 0 owns the most significant bit of
    each group. Pure shift/and/or expressions, whole-stage-codegen
    friendly; k*bits must fit a signed 64-bit value."""
    k = len(cols)
    assert k * bits <= 62, "z-value exceeds long range"
    z = F.lit(0).cast("long")
    for c, col in enumerate(cols):
        col = col.cast("long")
        for i in range(bits):
            bit = F.shiftright(col, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + (k - 1 - c)))
    return z


def zvalue_sql(exprs: list[str], bits: int) -> str:
    k = len(exprs)
    terms = []
    for c, e in enumerate(exprs):
        for i in range(bits):
            terms.append(f"(((({e}) >> {i}) & 1) << {i * k + (k - 1 - c)})")
    return "(" + " | ".join(terms) + ")"


def zvalue_py(vals: list[int], bits: int) -> int:
    """Reference implementation for tests."""
    k = len(vals)
    z = 0
    for c, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * k + (k - 1 - c))
    return z


def zorder_write(df: DataFrame, path: str, dims: list[tuple[str, int, int]],
                 bits: int = 16, n_files: int = 16,
                 mode: str = "overwrite") -> None:
    """Rewrite a table in Z-order: quantize each ``(col, lo, hi)``
    dimension, interleave into one z key, range-partition the rows by
    z into ``n_files`` output files and sort inside each — every file
    then covers a compact z-range, i.e. a small hyper-rectangle of
    the dimension space, which is exactly what makes its per-column
    min/max footer statistics selective.

    At 100 TB: repartitionByRange samples the z distribution (one
    extra pass over a sample, not the data), so files stay balanced
    under any key skew; n_files scales with data volume (target
    ~1 GB/file); and the z computation is pure codegen — the rewrite
    is one shuffle, the same cost class as any repartition."""
    z = zvalue([quantize_int(c, lo, hi, bits) for c, lo, hi in dims], bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def file_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-parquet-file min/max footer statistics for ``cols`` — the
    evidence a Z-order claim rests on (what a scan's row-group pruner
    consults). Driver-side metadata read via pyarrow; file-count-sized,
    never data-sized."""
    import pyarrow.parquet as pq
    import pathlib

    out = []
    for f in sorted(pathlib.Path(path).glob("*.parquet")):
        md = pq.ParquetFile(str(f)).metadata
        stat: dict = {"file": f.name, "rows": md.num_rows}
        schema_names = [md.schema.column(i).name for i in range(md.num_columns)]
        for col in cols:
            ci = schema_names.index(col)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(ci).statistics
                if s is not None and s.has_min_max:
                    mins.append(s.min)
                    maxs.append(s.max)
            stat[f"{col}_min"] = min(mins) if mins else None
            stat[f"{col}_max"] = max(maxs) if maxs else None
        out.append(stat)
    return out


def pruning_ratio(stats: list[dict], col: str, lo, hi) -> float:
    """Fraction of files a ``col BETWEEN lo AND hi`` scan can SKIP
    using footer min/max alone (the planner's view; row-group pruning
    inside kept files only improves on this). A file with MISSING
    stats counts as kept — a real pruner must read it."""
    total = len(stats)
    kept = sum(
        1 for s in stats
        if s[f"{col}_min"] is None
        or not (s[f"{col}_max"] < lo or s[f"{col}_min"] > hi)
    )
    return (total - kept) / total if total else 0.0
