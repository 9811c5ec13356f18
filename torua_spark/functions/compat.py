"""Engine-portable determinism helpers.

``round(x, 4)`` is NOT portable: Spark rounds the double's exact
binary expansion via BigDecimal HALF_UP while DuckDB multiplies and
uses C-library rounding — the same IEEE double can round to different
4-dp values near a half boundary. ``round4`` instead uses only IEEE
arithmetic (`floor(x*10000 + 0.5)/10000`) which is bit-identical in
any engine evaluating doubles, so Spark results and DuckDB oracle
results agree exactly (FIXTURES.md §3 determinism contract).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def round4(col: Column | str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return F.floor(col * F.lit(10000.0) + F.lit(0.5) + F.lit(1e-9)) / F.lit(10000.0)


def round4_sql(expr: str) -> str:
    return f"floor(({expr}) * 10000.0 + 0.5 + 1e-9) / 10000.0"
