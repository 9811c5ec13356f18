"""Physical-plan introspection helpers.

These power the plan-regression tests: the scale properties this
engine promises (filters pushed into the parquet scan, dims broadcast,
aggregates map-side combined, bucketed joins shuffle-free) are
asserted on `.explain` output so a refactor that silently breaks a
plan shape fails CI, not the 100 TB run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    plan = plan_string(df)
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    assert pushed and any(fragment in line for line in pushed), (
        f"filter '{fragment}' not pushed to scan:\n" + "\n".join(pushed or [plan])
    )


def assert_read_schema_only(df: DataFrame, columns: set[str]) -> None:
    """Assert every parquet ReadSchema in the plan projects a subset of
    ``columns`` union any per-table subset — i.e. column pruning
    reached the scan."""
    plan = plan_string(df)
    schemas = [line for line in plan.splitlines() if "ReadSchema" in line]
    assert schemas, plan
    for line in schemas:
        inner = line.split("struct<", 1)[-1].rstrip(">").strip()
        got = {f.split(":")[0].strip() for f in inner.split(",") if ":" in f}
        extra = got - columns
        assert not extra, f"scan reads unpruned columns {extra}: {line}"


def assert_broadcast_join(df: DataFrame) -> None:
    assert "BroadcastHashJoin" in plan_string(df), plan_string(df)


def assert_partial_final_agg(df: DataFrame) -> None:
    plan = plan_string(df)
    assert plan.count("HashAggregate") >= 2, plan


def assert_no_shuffle_exchange(df: DataFrame) -> None:
    plan = plan_string(df)
    assert "Exchange hashpartitioning" not in plan, plan
