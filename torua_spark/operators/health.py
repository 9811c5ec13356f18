"""Health-monitor operators (reference A21/A22/A23).

The reference's health monitor probes every node on a 5 s ticker and
flips a node to unhealthy after 3 *consecutive* failures; any success
resets the counter (internal/coordinator/health_monitor.go:111-145,
204-254). Batch analog: derive a probe stream from the events table
(FIXTURES.md §2.3 — user_id % n_nodes is the probed node, value < 50
is a failure) and evaluate the threshold state machine with ranking
windows:

- ``s3`` = rolling 3-row failure sum -> 3 means "3 consecutive fails"
- ``s4`` = rolling 4-row sum -> s3=3 AND s4=3 isolates the *transition*
  into the unhealthy state (the 4th-back probe was a success or the
  streak starts the history), matching the reference's one-callback-
  per-episode behavior (onUnhealthy fires once per threshold crossing).

Scale: one shuffle on node_id; per-node probe history is processed by
a single sorted window pass — at 100 TB of probe logs this partitions
by node and never materializes cross-node state. The streaming variant
(torua_spark.streaming.health_state) holds only a streak counter per
node in state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from torua_spark.constants import HEALTH_FAILURE_THRESHOLD

N_HEALTH_NODES = 8
FAIL_VALUE_CUTOFF = 50.0
PROBE_EVENT_TYPE = "error"


def probes_from_events(events: DataFrame, n_nodes: int = N_HEALTH_NODES) -> DataFrame:
    """Deterministic probe derivation shared with the DuckDB oracle."""
    return events.filter(F.col("event_type") == PROBE_EVENT_TYPE).select(
        F.concat(F.lit("n"), F.pmod(F.col("user_id"), F.lit(n_nodes))).alias("node_id"),
        F.col("ts"),
        F.col("event_id"),
        F.when(F.col("value") < FAIL_VALUE_CUTOFF, F.lit(1)).otherwise(F.lit(0)).alias("fail"),
    )


def _windowed(probes: DataFrame) -> DataFrame:
    k = HEALTH_FAILURE_THRESHOLD
    w = Window.partitionBy("node_id").orderBy("ts", "event_id")
    return (
        probes.withColumn("rn", F.row_number().over(w))
        .withColumn("s3", F.sum("fail").over(w.rowsBetween(-(k - 1), 0)))
        .withColumn("s4", F.sum("fail").over(w.rowsBetween(-k, 0)))
    )


def consecutive_failures(events: DataFrame, n_nodes: int = N_HEALTH_NODES) -> DataFrame:
    """A21 — per-node count of unhealthy *transitions* (threshold
    crossings), i.e. how many times onUnhealthy would have fired."""
    k = HEALTH_FAILURE_THRESHOLD
    win = _windowed(probes_from_events(events, n_nodes))
    return (
        win.groupBy("node_id")
        .agg(
            F.sum(
                ((F.col("s3") == k) & (F.col("s4") == k) & (F.col("rn") >= k)).cast("long")
            ).alias("unhealthy_transitions"),
            F.sum("fail").alias("total_failures"),
            F.count(F.lit(1)).alias("total_probes"),
        )
    )


def status_join(events: DataFrame, nodes: DataFrame, n_nodes: int = N_HEALTH_NODES) -> DataFrame:
    """A22 — GET /nodes: node list left-joined with live health status,
    'unknown' when never probed (cmd/coordinator/main.go:368-399).

    Current status = state at the *latest* probe: unhealthy iff the
    last HEALTH_FAILURE_THRESHOLD probes were all failures.
    """
    k = HEALTH_FAILURE_THRESHOLD
    win = _windowed(probes_from_events(events, n_nodes))
    wdesc = Window.partitionBy("node_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest = (
        win.withColumn("rdesc", F.row_number().over(wdesc))
        .filter(F.col("rdesc") == 1)
        .select(
            "node_id",
            F.when((F.col("s3") == k) & (F.col("rn") >= k), F.lit("unhealthy"))
            .otherwise(F.lit("healthy"))
            .alias("live_status"),
        )
    )
    return nodes.select("node_id").join(latest, "node_id", "left").select(
        "node_id", F.coalesce(F.col("live_status"), F.lit("unknown")).alias("status")
    )
