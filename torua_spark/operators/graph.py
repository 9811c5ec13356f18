"""Graph operators (reference §2.B B1/B2/B6 — documented, never
implemented: ARCHITECTURE.md:219-226 property-graph sharding,
ARCHITECTURE.md:548-568 multi-hop traversal, README.md:120-127).

The reference's design stores vertices hashed across shards with edges
co-located at their source vertex. The Spark realization: vertex and
edge DataFrames, traversal = self-joins on dst=src, co-location =
repartition on src (the analog of torua's edge placement), iterative
algorithms (connected components, PageRank) = loops of joins with
``localCheckpoint`` to truncate lineage each round (the Pregel pattern
re-expressed on DataFrames, since PySpark has no GraphX binding).

Scale notes:
- the edge build (orders ⋈ lineitem) is a co-partitioned shuffle join
  on l_orderkey; at 100 TB both facts should be bucketed on orderkey
  so it degrades to a zero-shuffle sort-merge join
- per-iteration state in CC/PageRank is one (vertex, label) table;
  messages = one shuffle per hop on dst — exactly the scatter-gather
  the reference's docs describe per-shard
- localCheckpoint every iteration keeps the plan O(1) deep instead of
  O(iterations); without it Catalyst re-derives the whole lineage and
  planning time explodes by iteration 10
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, functions as F

from torua_spark.functions.compat import round4

_ROWS_PER_PARTITION = 50_000

# Iterative algorithms broadcast their per-round vertex state while it
# is plausibly under the executor broadcast budget (~a few hundred MB
# of (long, long/double) rows); beyond that they fall back to shuffle
# joins against the (ideally bucketed) edge list.
_BROADCAST_STATE_MAX_VERTICES = 8_000_000


@contextmanager
def _iteration_partitions(df: DataFrame, n_rows: int):
    """Size shuffle partitions for an iterative loop to the working
    set instead of the session default: AQE right-sizes single queries
    but not the dozens of tiny shuffles an iterative algorithm issues.
    Clamped below by 8 and above by the session setting (a 10B-edge
    graph keeps the full configured parallelism)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    parts = max(8, min(int(prev), n_rows // _ROWS_PER_PARTITION + 1))
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def copurchase_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Edge list customer -> supplier through orders ⋈ lineitem
    (FIXTURES.md §2.5). Distinct (src, dst) pairs."""
    return (
        orders.select("o_orderkey", "o_custkey")
        .join(lineitem.select("l_orderkey", "l_suppkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .distinct()
    )


def coproduct_edges(orders: DataFrame, lineitem: DataFrame, distinct: bool = True) -> DataFrame:
    """Bipartite edge list customer -> (supplier, part): the customer
    bought that part from that supplier. Distinct triples.

    This is the scale-safe projection key for co-purchase analysis:
    grouping by (supplier, part) keeps pair blow-up linear in the edge
    count (measured max group size 3 at sf0.1, vs 345M raw pairs when
    keyed on supplier alone — a dense projection no engine should
    materialize at 100 TB).

    `distinct=False` skips the dedup shuffle for consumers whose next
    step dedups anyway (e.g. collect_set per (supp, part))."""
    out = (
        orders.select("o_orderkey", "o_custkey")
        .join(
            lineitem.select("l_orderkey", "l_suppkey", "l_partkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("src"),
            F.col("l_suppkey").alias("supp"),
            F.col("l_partkey").alias("part"),
        )
    )
    return out.distinct() if distinct else out


def two_hop(orders: DataFrame, lineitem: DataFrame,
            customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """B2 — `MATCH (c)-[*2]->(s)` over the star schema: distinct
    (c_custkey, s_suppkey) pairs reachable customer->order->line->supplier,
    with both endpoints verified against their vertex tables."""
    e = copurchase_edges(orders, lineitem)
    return (
        e.join(customer.select(F.col("c_custkey").alias("src")), "src", "left_semi")
        .join(supplier.select(F.col("s_suppkey").alias("dst")), "dst", "left_semi")
        .select(F.col("src").alias("c_custkey"), F.col("dst").alias("s_suppkey"))
    )


def out_degree(edges: DataFrame) -> DataFrame:
    """B6 — out-degree per source vertex: one partial+final count."""
    return edges.groupBy(F.col("src").alias("custkey")).agg(F.count(F.lit(1)).alias("degree"))


def triangle_pattern(customer: DataFrame, nation: DataFrame, region: DataFrame) -> DataFrame:
    """B1/B3 — pattern match customer->nation->region + aggregate:
    `MATCH (c:Customer)-[:IN]->(n:Nation)-[:IN]->(r:Region)` with group
    counts and balance stats per (region, nation). Both dims broadcast."""
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            round4(F.sum("c_acctbal")).alias("sum_acctbal"),
        )
    )


def _undirected(edges: DataFrame) -> DataFrame:
    fwd = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    return fwd.unionByName(fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """B6 — connected components by iterative min-label propagation.

    Vertices carry their own id as the initial label; each round every
    vertex takes the min of its own and its neighbors' labels; fixpoint
    = component membership with label = min vertex id in the component.
    Convergence check via an aggregate per round; lineage truncated with
    localCheckpoint (driver-local, no HDFS needed; on a real cluster use
    rdd checkpointing to object storage for fault tolerance).

    Input edges must already be over a single numeric vertex-id space.
    """
    # Materialize the (derived) edge list once — the loop body must join
    # against a checkpointed table, not re-derive orders ⋈ lineitem ⋈
    # distinct every iteration.
    und = _undirected(edges).localCheckpoint()
    n_edges = und.count()
    with _iteration_partitions(und, n_edges):
        labels = (
            und.select(F.col("a").alias("id"))
            .distinct()
            .withColumn("label", F.col("id"))
            .localCheckpoint()
        )
        n_vertices = labels.count()
        # The mutating state is one (id, label) row per vertex. When it
        # fits the broadcast budget, broadcasting it turns the per-round
        # edge join into a map-side hash join — the big, static edge
        # list is never shuffled, leaving ONE shuffle per round (the
        # min-label agg). Past the budget (1B-vertex graphs) fall back
        # to the shuffle join; there the right deployment move is
        # bucketing edges on `a` so the join side stays co-located.
        bcast = n_vertices <= _BROADCAST_STATE_MAX_VERTICES
        prev_sum = labels.agg(F.sum("label")).collect()[0][0]
        for _ in range(max_iter):
            state = F.broadcast(labels) if bcast else labels
            msgs = (
                und.join(state, und.a == state.id)
                .select(F.col("b").alias("id"), F.col("label"))
            )
            labels = (
                msgs.unionByName(labels.select("id", "label"))
                .groupBy("id")
                .agg(F.min("label").alias("label"))
                .localCheckpoint(eager=False)  # truncate lineage; materialized by the agg below
            )
            cur_sum = labels.agg(F.sum("label")).collect()[0][0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
    return labels.select(F.col("id").alias("vertex"), F.col("label").alias("component"))


def copurchase_vertex_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Co-purchase edges re-encoded into one numeric vertex space:
    customer c -> 2c, supplier s -> 2s+1 (bipartite disambiguation)."""
    e = copurchase_edges(orders, lineitem)
    return e.select((F.col("src") * 2).alias("src"), (F.col("dst") * 2 + 1).alias("dst"))


def pagerank(edges: DataFrame, iterations: int = 10, damping: float = 0.85) -> DataFrame:
    """B6 — PageRank via iterative DataFrame joins (directed edges).

    Standard power iteration: rank = (1-d) + d * sum(incoming rank /
    out_degree). Vertices with no outgoing edges contribute nothing
    (classic simplified formulation). Output rounded to 4 dp.
    """
    # Loop-invariant inputs materialized once (edges is usually a
    # derived join — without this every iteration re-runs it).
    edges = edges.localCheckpoint()
    n_edges = edges.count()
    with _iteration_partitions(edges, n_edges):
        vertices = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
            .localCheckpoint()
        )
        n_vertices = vertices.count()
        # Fold the (loop-invariant) out-degree into the edge list ONCE:
        # each edge carries w = 1/out_deg(src), so the loop body never
        # joins `deg` again — one join per round instead of two.
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
        ew = (
            edges.join(deg, "src")
            .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w"))
            .localCheckpoint()
        )
        # Zero-contribution rows for every vertex replace the final
        # vertices left-join: dangling/no-inbound vertices survive the
        # groupBy, so rank update = union + ONE aggregation shuffle.
        zeros = vertices.select("id", F.lit(0.0).alias("c")).localCheckpoint()
        # Broadcast the per-round rank state while it fits (same guard
        # and rationale as connected_components): the static edge list
        # is then never shuffled in the loop.
        bcast = n_vertices <= _BROADCAST_STATE_MAX_VERTICES
        ranks = vertices.withColumn("rank", F.lit(1.0))
        for _ in range(iterations):
            state = F.broadcast(ranks) if bcast else ranks
            contribs = (
                ew.join(state, ew.src == state.id)
                .select(F.col("dst").alias("id"), (F.col("rank") * F.col("w")).alias("c"))
            )
            ranks = (
                contribs.unionByName(zeros)
                .groupBy("id")
                .agg(F.sum("c").alias("s"))
                .select(
                    "id",
                    (F.lit(1.0 - damping) + F.lit(damping) * F.col("s")).alias("rank"),
                )
                # eager=False: lineage is cut every round but nothing runs
                # until the chain is materialized below — one job for
                # all iterations instead of one per round.
                .localCheckpoint(eager=False)
            )
        # Materialize while the iteration partitioning is in force.
        ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(F.col("id").alias("vertex"), round4("rank").alias("rank"))
