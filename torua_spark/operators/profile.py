"""Table profiling — the ANALYZE/data-quality pass every ingest
pipeline runs before trusting a new drop: per-column null counts,
distinct cardinality, min/max, numeric means, in ONE scan.

Reference parity: the reference exposes per-shard stats and node-info
aggregation (internal/shard/doc.go stats surface — A7/A8); this is the
same observability contract lifted to column granularity over any
table.

Plan shape (the 100 TB contract): every metric is an aggregate over
one scan — Catalyst fuses the count/min/max/avg family into a single
partial+final aggregation (shuffle rows = partitions, not input
rows). Exact `count(DISTINCT c)` over many columns expands the input
(one replicate per distinct column — Spark's Expand operator), so at
corpus scale pass ``approx=True``: HyperLogLog++ sketches
(`approx_count_distinct`) fold into the SAME single pass with no
expand and ~1.6% default error. The result relation is O(#columns) —
the unpivot to one-row-per-column happens on the aggregated scalars,
never on data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double")
_TEMPORAL = ("timestamp", "timestamp_ntz", "date")


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  approx: bool = False) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df`` into one row per
    column: (col_name, dtype, n_rows, n_nulls, n_distinct, min_str,
    max_str, min_num, max_num, avg_num). Numerics fill the ``_num``
    triple (round4 doubles); strings fill lexicographic ``_str``
    bounds; temporals fill ``_str`` with a fixed
    ``yyyy-MM-dd HH:mm:ss`` rendering (lexicographic == chronological)
    so the output schema is engine-portable. Unsupported types (array,
    struct, binary) still report counts with null bounds."""
    from torua_spark.functions.compat import round4

    dtypes = dict(df.dtypes)
    cols = list(columns) if columns is not None else [c for c, _ in df.dtypes]
    nd = F.approx_count_distinct if approx else F.count_distinct

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        t = dtypes[c]
        col = F.col(c)
        aggs.append(F.count(col).alias(f"{c}__nn"))
        aggs.append(nd(col).alias(f"{c}__nd"))
        if t in _NUMERIC or t.startswith("decimal"):
            aggs.append(round4(F.min(col).cast("double")).alias(f"{c}__mn"))
            aggs.append(round4(F.max(col).cast("double")).alias(f"{c}__mx"))
            aggs.append(round4(F.avg(col.cast("double"))).alias(f"{c}__av"))
        elif t in _TEMPORAL:
            fmt = "yyyy-MM-dd HH:mm:ss"
            aggs.append(F.date_format(F.min(col), fmt).alias(f"{c}__mns"))
            aggs.append(F.date_format(F.max(col), fmt).alias(f"{c}__mxs"))
        elif t == "string":
            aggs.append(F.min(col).alias(f"{c}__mns"))
            aggs.append(F.max(col).alias(f"{c}__mxs"))
    one = df.agg(*aggs)

    tuples = []
    for c in cols:
        t = dtypes[c]
        if t in _NUMERIC or t.startswith("decimal"):
            mns, mxs = "CAST(NULL AS STRING)", "CAST(NULL AS STRING)"
            mn, mx, av = f"`{c}__mn`", f"`{c}__mx`", f"`{c}__av`"
        elif t in _TEMPORAL or t == "string":
            mns, mxs = f"`{c}__mns`", f"`{c}__mxs`"
            mn, mx, av = ("CAST(NULL AS DOUBLE)",) * 3
        else:
            mns, mxs = "CAST(NULL AS STRING)", "CAST(NULL AS STRING)"
            mn, mx, av = ("CAST(NULL AS DOUBLE)",) * 3
        tuples.append(
            f"'{c}', '{t}', __n, __n - `{c}__nn`, `{c}__nd`, "
            f"{mns}, {mxs}, {mn}, {mx}, {av}"
        )
    stack = (
        f"stack({len(cols)}, " + ", ".join(tuples) + ") AS "
        "(col_name, dtype, n_rows, n_nulls, n_distinct, "
        "min_str, max_str, min_num, max_num, avg_num)"
    )
    return one.select(F.expr(stack)).select(
        "col_name", "dtype",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_str", "max_str", "min_num", "max_num", "avg_num",
    )


def profile_correlations(df: DataFrame,
                         columns: list[str] | None = None) -> DataFrame:
    """Pairwise Pearson correlations over the numeric columns — the
    profiling companion every feature-engineering pass runs before
    trusting derived columns. ONE fused aggregation computes all
    C(n,2) `corr` aggregates in a single scan (partial+final, shuffle
    rows = partitions); the unpivot runs on the O(n^2) scalars.
    Output: (col_a, col_b, corr) with col_a < col_b, corr 4-dp-rounded
    (both engines compute sample Pearson; rounding absorbs summation-
    order ulps). Constant columns yield NULL corr (zero variance), as
    in SQL."""
    from torua_spark.functions.compat import round4

    dtypes = dict(df.dtypes)
    if columns is None:
        columns = [
            c for c, t in df.dtypes
            if t in _NUMERIC or t.startswith("decimal")
        ]
    pairs = [
        (a, b) for i, a in enumerate(columns) for b in columns[i + 1:]
    ]
    if not pairs:
        raise ValueError("profile_correlations needs >= 2 numeric columns")
    def _corr(a: str, b: str):
        # covar/(sd*sd) rather than F.corr: under ANSI mode corr()
        # raises DIVIDE_BY_ZERO on a zero-variance column; the
        # conditional keeps the division unevaluated there and yields
        # SQL's NULL (DuckDB corr() semantics)
        ca, cb = F.col(a).cast("double"), F.col(b).cast("double")
        denom = F.stddev_samp(ca) * F.stddev_samp(cb)
        return F.when(
            denom.isNull() | (denom == 0), F.lit(None)
        ).otherwise(F.covar_samp(ca, cb) / denom)

    aggs = [round4(_corr(a, b)).alias(f"{a}__{b}") for a, b in pairs]
    one = df.agg(*aggs)
    stack = (
        f"stack({len(pairs)}, "
        + ", ".join(f"'{a}', '{b}', `{a}__{b}`" for a, b in pairs)
        + ") AS (col_a, col_b, corr)"
    )
    return one.select(F.expr(stack))
