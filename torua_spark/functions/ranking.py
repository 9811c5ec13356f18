"""Scale-safe global top-k.

``row_number().over(Window.orderBy(...))`` with no ``partitionBy``
funnels EVERY input row through one task (a single-partition sort) —
correct at sf0.1, a straggler at 100 TB. ``orderBy(...).limit(k)``
instead compiles to ``TakeOrderedAndProject``: each partition keeps an
O(k) heap and only k rows per partition reach the final merge. The
rank column is then attached with a window over the k-row result,
which is trivially single-partition by construction.

tests/test_plans.py asserts ``TakeOrderedAndProject`` is present in
every declared top-k plan so the anti-pattern cannot regress.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def global_topk(df: DataFrame, order_cols: list[Column], k: int,
                rank_col: str = "rank") -> DataFrame:
    """Deterministic global top-k: ``order_cols`` must be a total order
    (include a unique tie-break column). Appends ``rank_col`` (int,
    1-based) ranked by the same order."""
    topk = df.orderBy(*order_cols).limit(k)
    w = Window.orderBy(*order_cols)
    return topk.withColumn(rank_col, F.row_number().over(w).cast("int"))
