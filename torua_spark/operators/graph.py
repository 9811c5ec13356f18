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

# Iterative algorithms have two viable loop-body shapes and the right
# one depends on the per-round STATE size (both stay lazily chained —
# eager=False checkpoints, no per-round driver round-trip):
#
# - 'broadcast' — the vertex-state relation enters the edge join via a
#   chained BroadcastExchange (F.broadcast on a lazy frame is not a
#   collect), so neither the big static edge list nor the state is
#   shuffled for the join; the only per-round shuffle is the message
#   aggregation. Measured 1.5-2.5x over 'chained' on the co-purchase
#   graph at sf0.1 (and the win grows with edge size — the edge side
#   never moves). Each in-flight round holds one state broadcast
#   (~16 B/vertex), so the budget bounds vertices, multiplied by the
#   chained-round window.
# - 'chained' — shuffle join per round; nothing is broadcast, so it is
#   the only safe shape when the vertex state itself is huge.
#
# 'auto' picks broadcast whenever the state fits the budget; a
# 1B-vertex graph falls back to 'chained', where the deployment answer
# is an edge table bucketed on the join key.
_BROADCAST_STATE_MAX_VERTICES = 8_000_000


def _use_broadcast_state(mode: str, n_edges: int, n_vertices: int) -> bool:
    if mode == "broadcast":
        return True
    if mode == "chained":
        return False
    return n_vertices <= _BROADCAST_STATE_MAX_VERTICES


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


def _undirected(edges: DataFrame, dedup: bool = True) -> DataFrame:
    """Symmetrized edge list. ``dedup=False`` skips the distinct
    shuffle over 2|E| rows — safe whenever reversal cannot create a
    duplicate (e.g. a bipartite-encoded vertex space where src and dst
    ids never overlap) AND the input is already distinct; min/Pregel
    consumers stay CORRECT either way (idempotent messages), duplicate
    edges only cost message volume per round."""
    fwd = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    out = fwd.unionByName(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
    return out.distinct() if dedup else out


def connected_components(edges: DataFrame, max_iter: int = 25,
                         check_every: int = 2,
                         state_mode: str = "auto",
                         dedup_undirected: bool = True) -> DataFrame:
    """B6 — connected components by iterative min-label propagation.

    Vertices carry their own id as the initial label; each round every
    vertex takes the min of its own and its neighbors' labels; fixpoint
    = component membership with label = min vertex id in the component.

    The convergence check (a label-sum aggregate) runs every
    `check_every` rounds: the rounds in between stay LAZY (eager=False
    checkpoints) and execute as one Spark job, so the per-round driver
    round-trip is amortized — measured ~2x on the co-purchase graph.
    Worst case runs check_every-1 extra (idempotent) rounds past the
    fixpoint. Lineage is truncated with localCheckpoint (driver-local;
    on a real cluster use rdd checkpointing to object storage for
    fault tolerance). `state_mode` picks the loop-body join shape —
    see _use_broadcast_state.

    Input edges must already be over a single numeric vertex-id space.
    """
    # Materialize the (derived) edge list once — the loop body must join
    # against a checkpointed table, not re-derive orders ⋈ lineitem ⋈
    # distinct every iteration.
    und = _undirected(edges, dedup=dedup_undirected).localCheckpoint()
    n_edges = und.count()
    with _iteration_partitions(und, n_edges):
        labels = (
            und.select(F.col("a").alias("id"))
            .distinct()
            .withColumn("label", F.col("id"))
            .localCheckpoint()
        )
        n_vertices = labels.count()
        bcast = _use_broadcast_state(state_mode, n_edges, n_vertices)
        prev_sum = labels.agg(F.sum("label")).collect()[0][0]
        done = 0
        while done < max_iter:
            for _ in range(min(check_every, max_iter - done)):
                state = F.broadcast(labels) if bcast else labels
                msgs = (
                    und.join(state, und.a == state.id)
                    .select(F.col("b").alias("id"), F.col("label"))
                )
                labels = (
                    msgs.unionByName(labels.select("id", "label"))
                    .groupBy("id")
                    .agg(F.min("label").alias("label"))
                    # truncate lineage; materialized by the next check
                    .localCheckpoint(eager=False)
                )
                done += 1
            cur_sum = labels.agg(F.sum("label")).collect()[0][0]
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum
    return labels.select(F.col("id").alias("vertex"), F.col("label").alias("component"))


def bfs_hop_histogram(edges: DataFrame, seed_ids: DataFrame,
                      max_hops: int = 4) -> DataFrame:
    """B2 generalized — multi-source BFS over the undirected graph:
    min hop distance from the seed set (`seed_ids`: one `id` column),
    emitted as a histogram (hops, n_vertices) plus one `hops = -1` row
    counting vertices unreached within `max_hops`.

    State is the SPARSE reached set (id, hops) — rounds only touch the
    frontier's neighborhood, not the full vertex table, so early
    rounds are proportional to the expanding ball, not |V|. Rounds are
    chained lazily (eager=False checkpoints, one Spark job); min-
    aggregation makes re-discovery idempotent, the same Pregel shape
    as `connected_components`."""
    und = _undirected(edges).localCheckpoint()
    n_edges = und.count()
    with _iteration_partitions(und, n_edges):
        vertices = und.select(F.col("a").alias("id")).distinct().localCheckpoint()
        n_vertices = vertices.count()
        dist = (
            seed_ids.select("id")
            .join(vertices, "id", "left_semi")
            .select("id", F.lit(0).cast("int").alias("hops"))
            .localCheckpoint()
        )
        bcast = _use_broadcast_state("auto", n_edges, n_vertices)
        for _ in range(max_hops):
            state = F.broadcast(dist) if bcast else dist
            msgs = (
                und.join(state, und.a == state.id)
                .select(F.col("b").alias("id"), (F.col("hops") + F.lit(1)).alias("hops"))
            )
            dist = (
                msgs.unionByName(dist.select("id", "hops"))
                .groupBy("id")
                .agg(F.min("hops").cast("int").alias("hops"))
                .localCheckpoint(eager=False)
            )
        dist = dist.localCheckpoint(eager=True)
        n_reached = dist.count()
    hist = dist.groupBy("hops").agg(F.count(F.lit(1)).alias("n_vertices"))
    spark = edges.sparkSession
    unreached = spark.range(1).select(
        F.lit(-1).cast("int").alias("hops"),
        F.lit(n_vertices - n_reached).cast("long").alias("n_vertices"),
    )
    return hist.unionByName(unreached)


def copurchase_vertex_edges(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Co-purchase edges re-encoded into one numeric vertex space:
    customer c -> 2c, supplier s -> 2s+1 (bipartite disambiguation)."""
    e = copurchase_edges(orders, lineitem)
    return e.select((F.col("src") * 2).alias("src"), (F.col("dst") * 2 + 1).alias("dst"))


def pagerank(edges: DataFrame, iterations: int = 10, damping: float = 0.85,
             state_mode: str = "auto",
             weight_col: str | None = None) -> DataFrame:
    """B6 — PageRank via iterative DataFrame joins (directed edges).

    Standard power iteration: rank = (1-d) + d * sum(incoming rank /
    out_degree). Vertices with no outgoing edges contribute nothing
    (classic simplified formulation). Output rounded to 4 dp.

    With a fixed iteration count there is NO per-round driver
    round-trip in either state mode: every round is an eager=False
    checkpoint and the whole power iteration executes as one Spark job
    when the result materializes. The 'auto' pick broadcasts the rank
    state into the edge join while it fits the broadcast budget
    (chained BroadcastExchange — the edge list is never shuffled
    inside the loop; measured 1.5-2x at sf0.1), falling back to the
    shuffle join for vertex sets past `_BROADCAST_STATE_MAX_VERTICES`.
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
        # each edge carries w = 1/out_deg(src) — or, when weight_col is
        # given, w_ij / sum_j w_ij (weighted PageRank: rank flows in
        # proportion to edge weight) — so the loop body never joins
        # `deg` again: one join per round instead of two.
        if weight_col is None:
            deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
            ew = (
                edges.join(deg, "src")
                .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("w"))
                .localCheckpoint()
            )
        else:
            tot = edges.groupBy("src").agg(
                F.sum(F.col(weight_col).cast("double")).alias("wsum")
            )
            ew = (
                edges.join(tot, "src")
                .select(
                    "src", "dst",
                    (F.col(weight_col).cast("double") / F.col("wsum")).alias("w"),
                )
                .localCheckpoint()
            )
        # Zero-contribution rows for every vertex replace the final
        # vertices left-join: dangling/no-inbound vertices survive the
        # groupBy, so rank update = union + ONE aggregation shuffle.
        # No checkpoint of its own (r14): a literal projection of the
        # already-checkpointed vertices is O(1)-deep lineage — the
        # extra eager checkpoint was one more job and one more
        # resident block for zero plan benefit.
        zeros = vertices.select("id", F.lit(0.0).alias("c"))
        bcast = _use_broadcast_state(state_mode, n_edges, n_vertices)
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


# Unbounded-BFS safety rail: probe for convergence every batch of
# rounds (amortizing the count() job), and refuse to return a
# possibly-incomplete reached set if a pathological graph (a 100k-hop
# path) is still growing at the cap — loud beats silently partial.
SSSP_CONVERGE_BATCH = 3
SSSP_CONVERGE_CAP = 64


def shortest_paths(edges: DataFrame, source_id: int,
                   max_hops: int | None = 6,
                   undirected_dedup: bool = True) -> DataFrame:
    """B2 — Cypher ``shortestPath((src)-[*..k]-(v))`` parity: single-
    source unweighted shortest paths over the undirected graph, with a
    DETERMINISTIC predecessor per vertex so callers can reconstruct one
    canonical shortest path (reference ARCHITECTURE.md:548-568 multi-hop
    traversal; README.md:120-127 graph queries).

    Returns (id, hops, via): `hops` = min distance from `source_id`
    within `max_hops`, `via` = the smallest-id predecessor among all
    shortest paths (NULL for the source itself). Determinism matters
    because the driver hash-compares against a DuckDB oracle: ties are
    broken lexicographically on (hops, via) via a struct-min, which both
    engines order identically (hops first; `via` ties are always
    non-null because only the source holds hops=0).

    ``max_hops=None`` (the Cypher ``[:R*]`` unbounded hop) runs BFS to
    CONVERGENCE: the reached set grows by >= 1 vertex per round until
    the component is exhausted, so an unchanged count over a batch of
    rounds proves the fixpoint; the count() probe runs once per
    SSSP_CONVERGE_BATCH rounds (amortized, graph_k_core-style), extra
    post-fixpoint rounds are idempotent (struct-min), and a graph
    still growing at SSSP_CONVERGE_CAP rounds raises rather than
    return a silently partial reached set.

    Scale shape — same sparse-frontier Pregel skeleton as
    `bfs_hop_histogram`: state is the reached set only, rounds are
    lazily chained eager=False checkpoints (one Spark job total per
    batch), the broadcast-state mode keeps the big edge list
    unshuffled inside the loop, and message volume per round is the
    frontier's neighborhood, not |E|. At 100 TB the edge table should
    be bucketed on `a` so the per-round join is shuffle-free on the
    edge side.
    """
    und = _undirected(edges, dedup=undirected_dedup).localCheckpoint()
    # ONE stats job replaces und.count() + a materialized distinct
    # vertex relation + its count (r14, guide §1.2: the BFS result
    # contains only REACHED vertices, so the vertex relation was never
    # in the output path — it existed only for its count and the
    # source-row seed, both of which this aggregate / the filter below
    # provide without the extra shuffle + checkpoint + jobs).
    stats = und.agg(
        F.count(F.lit(1)).alias("ne"),
        F.approx_count_distinct("a").alias("nv"),
    ).collect()[0]
    n_edges, n_vertices = stats["ne"], stats["nv"]
    with _iteration_partitions(und, n_edges):
        dist = (
            und.filter(F.col("a") == F.lit(source_id))
            .select(F.col("a").alias("id"))
            .distinct()
            .select(
                "id",
                F.lit(0).cast("int").alias("hops"),
                F.lit(None).cast("long").alias("via"),
            )
            .localCheckpoint()
        )
        bcast = _use_broadcast_state("auto", n_edges, n_vertices)

        def _round(d: DataFrame, r: int) -> DataFrame:
            # FRONTIER-only messages (r14, guide §2.3): only vertices
            # first reached in the previous round send. Equivalent to
            # all-state sends: a vertex's hops is final at first reach
            # (BFS level order), every minimal-hops predecessor of a
            # vertex is first reached in the SAME round, so all
            # candidate (hops, via) messages that can win the
            # struct-min arrive together the round after — re-sends
            # from older vertices only duplicate messages the min
            # already consumed. Message volume per round drops from
            # |N(reached)| (~|E| once the component saturates) to
            # |N(frontier)|, and the per-round broadcast ships the
            # frontier, not the whole reached set.
            frontier = d.filter(F.col("hops") == F.lit(r - 1))
            state = F.broadcast(frontier) if bcast else frontier
            msgs = und.join(state, und.a == state.id).select(
                F.col("b").alias("id"),
                (F.col("hops") + F.lit(1)).cast("int").alias("hops"),
                F.col("a").cast("long").alias("via"),
            )
            return (
                msgs.unionByName(d.select("id", "hops", "via"))
                .groupBy("id")
                # struct-min = arg-min: smallest (hops, via) pair wins,
                # making the surviving predecessor deterministic.
                .agg(F.min(F.struct("hops", "via")).alias("s"))
                .select("id", F.col("s.hops").alias("hops"), F.col("s.via").alias("via"))
                .localCheckpoint(eager=False)
            )

        if max_hops is None:
            reached = dist.count()
            rounds = 0
            while True:
                for _ in range(SSSP_CONVERGE_BATCH):
                    rounds += 1
                    dist = _round(dist, rounds)
                dist = dist.localCheckpoint(eager=True)
                n = dist.count()
                if n == reached:
                    break  # no growth over a full batch = fixpoint
                reached = n
                if rounds >= SSSP_CONVERGE_CAP:
                    raise ValueError(
                        f"unbounded shortestPath still expanding after "
                        f"{rounds} BFS rounds ({n} vertices reached) — "
                        f"graph diameter exceeds SSSP_CONVERGE_CAP="
                        f"{SSSP_CONVERGE_CAP}; pass an explicit *..k "
                        f"bound for a partial traversal"
                    )
        else:
            for r in range(1, max_hops + 1):
                dist = _round(dist, r)
            dist = dist.localCheckpoint(eager=True)
    return dist


def reconstruct_path(paths: DataFrame, target_id: int) -> list[int]:
    """Walk `shortest_paths` predecessors from `target_id` back to the
    source; returns [source, ..., target] or [] if unreached.

    The walk stays DISTRIBUTED: k rounds of broadcast-joining the
    (≤1-row) current node's `via` back into the paths relation, chained
    lazily, then ONE collect of the k+1 path rows. Never collects the
    reached set itself (which is O(|V|) — the predecessor relation is
    the distributed artifact; a path is O(k) rows)."""
    paths = paths.localCheckpoint()
    cur = paths.filter(F.col("id") == F.lit(target_id)).localCheckpoint()
    head = cur.collect()  # 1 row: the target (or unreached)
    if not head:
        return []
    chain = cur
    for _ in range(int(head[0]["hops"])):
        cur = (
            paths.join(
                F.broadcast(cur.select(F.col("via").alias("id"))), "id"
            )
            .select("id", "hops", "via")
            .localCheckpoint(eager=False)
        )
        chain = chain.unionByName(cur)
    rows = chain.select("id", "hops").collect()  # k+1 rows
    return [r["id"] for r in sorted(rows, key=lambda r: r["hops"])]


def weighted_shortest_paths(edges: DataFrame, source_id: int,
                            rounds: int | None = 6,
                            undirected_dedup: bool = True) -> DataFrame:
    """B2 weighted — k-bounded lightest paths (Bellman-Ford rounds)
    over the undirected weighted graph: `dist` = minimum total edge
    weight among paths of <= `rounds` edges from `source_id`, with the
    same deterministic (dist, via) struct-min predecessor tie-break as
    `shortest_paths` (reference ARCHITECTURE.md:548-568 — traversal
    over edges carrying attributes).

    Input `edges` must carry (src, dst, w) with an EXACT (integer)
    weight column — exactness is what lets the driver hash-compare
    the result against the loop-unrolled oracle (floating-point
    min-plus would tie-break on rounding noise). Full Bellman-Ford is
    `rounds = |V| - 1`; a bounded k is the weighted analog of Cypher's
    `[*..k]` and keeps the job count fixed.

    ``rounds=None`` (round 9 — the weighted twin of
    ``shortest_paths(max_hops=None)``) runs to CONVERGENCE. The BFS
    count probe is NOT sufficient here: distances keep improving
    after first reach, so the fixpoint probe compares THREE monotone
    aggregates — row count (non-decreasing), sum(dist)
    (componentwise non-increasing under the struct-min, so the sum
    strictly falls whenever any dist improves) and sum(via) over
    dist-stable states (via only improves downward at equal dist) —
    all three stable over a batch of rounds == nothing changed,
    exactly (no hashing, no false convergence). Probes amortize over
    SSSP_CONVERGE_BATCH rounds; a graph still relaxing at
    SSSP_CONVERGE_CAP rounds raises (for non-negative integer
    weights Bellman-Ford needs <= |V|-1 rounds, so the cap also
    catches a negative-cycle input loudly instead of looping).

    Scale shape: identical to `shortest_paths` — sparse state, one
    aggregation shuffle per round, lazily chained checkpoints, the
    edge list never re-shuffled in broadcast-state mode."""
    und = edges.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), "w"
    ).unionByName(
        edges.select(F.col("dst").alias("a"), F.col("src").alias("b"), "w")
    )
    if undirected_dedup:
        # parallel edges: keep the lightest. ``undirected_dedup=False``
        # skips this shuffle when the caller's input is already one row
        # per (src, dst) AND src/dst ids cannot collide (the bipartite
        # vertex encoding) — reversal then cannot create a duplicate
        # (a, b), so the groupBy is the identity (r14).
        und = und.groupBy("a", "b").agg(F.min("w").alias("w"))
    und = und.localCheckpoint()
    # ONE stats job replaces und.count() + the materialized vertex
    # relation + its count (r14) — the result contains only reached
    # vertices, and n_vertices only feeds the broadcast-mode pick.
    stats = und.agg(
        F.count(F.lit(1)).alias("ne"),
        F.approx_count_distinct("a").alias("nv"),
    ).collect()[0]
    n_edges, n_vertices = stats["ne"], stats["nv"]
    with _iteration_partitions(und, n_edges):
        dist = (
            und.filter(F.col("a") == F.lit(source_id))
            .select(F.col("a").alias("id"))
            .distinct()
            .select(
                "id",
                F.lit(0).cast("long").alias("dist"),
                F.lit(None).cast("long").alias("via"),
                F.lit(True).alias("act"),
            )
            .localCheckpoint()
        )
        bcast = _use_broadcast_state("auto", n_edges, n_vertices)

        def _round(d: DataFrame) -> DataFrame:
            # DELTA messages (r14, guide §2.3): only vertices whose
            # (dist, via) changed last round send. Equivalent to
            # full re-sends: a vertex that did not change would resend
            # byte-identical messages, which are no-ops under the
            # struct-min (its last change already delivered its
            # current dist+w to every neighbor, and the state keeps
            # the min of everything ever received). ``act`` marks the
            # changed set: the winning struct differs from the best
            # previously-held row (or the vertex is newly reached).
            frontier = d.filter(F.col("act"))
            state = F.broadcast(frontier) if bcast else frontier
            msgs = und.join(state, und.a == state.id).select(
                F.col("b").alias("id"),
                (F.col("dist") + F.col("w")).cast("long").alias("dist"),
                F.col("a").cast("long").alias("via"),
                F.lit(True).alias("msg"),
            )
            held = d.select(
                "id", "dist", "via", F.lit(False).alias("msg")
            )
            return (
                msgs.unionByName(held)
                .groupBy("id")
                .agg(
                    F.min(F.struct("dist", "via")).alias("s"),
                    F.min(
                        F.when(~F.col("msg"), F.struct("dist", "via"))
                    ).alias("s_old"),
                )
                .select(
                    "id",
                    F.col("s.dist").alias("dist"),
                    F.col("s.via").alias("via"),
                    (
                        F.col("s_old").isNull()
                        | (F.col("s") < F.col("s_old"))
                    ).alias("act"),
                )
                .localCheckpoint(eager=False)
            )

        def _fingerprint(d: DataFrame) -> tuple:
            r = d.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("dist").alias("sd"),
                F.sum(F.coalesce(F.col("via"), F.lit(0))).alias("sv"),
            ).collect()[0]
            return (r["n"], r["sd"], r["sv"])

        if rounds is None:
            prev = _fingerprint(dist)
            done = 0
            while True:
                for _ in range(SSSP_CONVERGE_BATCH):
                    dist = _round(dist)
                done += SSSP_CONVERGE_BATCH
                dist = dist.localCheckpoint(eager=True)
                cur = _fingerprint(dist)
                if cur == prev:
                    break  # all three monotone aggregates stable = fixpoint
                prev = cur
                if done >= SSSP_CONVERGE_CAP:
                    raise ValueError(
                        f"weighted shortest paths still relaxing after "
                        f"{done} Bellman-Ford rounds — graph diameter "
                        f"exceeds SSSP_CONVERGE_CAP={SSSP_CONVERGE_CAP} "
                        f"or the input has a negative cycle; pass an "
                        f"explicit rounds bound for a partial relaxation"
                    )
        else:
            for _ in range(rounds):
                dist = _round(dist)
            dist = dist.localCheckpoint(eager=True)
    # ``act`` is loop machinery, not part of the contract
    return dist.select("id", "dist", "via")


def label_propagation(edges: DataFrame, rounds: int = 4) -> DataFrame:
    """B6 — community detection via synchronous label propagation with
    a SELF-VOTE and a deterministic tie-break: each round every vertex
    adopts the most frequent label among its neighbors plus itself,
    ties broken by the smallest label (arg-max on (count, -label)).

    The self-vote damps the 2-cycle oscillation synchronous LPA
    exhibits on bipartite graphs (the co-purchase graph IS bipartite);
    with a FIXED round count the run is deterministic either way, so
    the loop-unrolled oracle matches round-for-round — the same
    determinism contract as `pagerank`'s fixed power iteration.

    Cost: two aggregation shuffles per round ((id, label) vote count,
    then per-id arg-max) plus the message join — label state is one
    row per vertex, the same sparse-state scaling as the other
    iterative operators."""
    und = _undirected(edges).localCheckpoint()
    n_edges = und.count()
    with _iteration_partitions(und, n_edges):
        vertices = und.select(F.col("a").alias("id")).distinct().localCheckpoint()
        n_vertices = vertices.count()
        labels = vertices.select("id", F.col("id").alias("label")).localCheckpoint()
        bcast = _use_broadcast_state("auto", n_edges, n_vertices)
        for _ in range(rounds):
            state = F.broadcast(labels) if bcast else labels
            votes = (
                und.join(state, und.a == state.id)
                .select(F.col("b").alias("id"), "label")
                .unionByName(labels.select("id", "label"))  # self-vote
            )
            labels = (
                votes.groupBy("id", "label")
                .agg(F.count(F.lit(1)).alias("n"))
                .groupBy("id")
                # arg-max (count, -label): most frequent label, ties to
                # the smallest label value
                .agg(F.max(F.struct(F.col("n"), (-F.col("label")).alias("neg"))).alias("s"))
                .select("id", (-F.col("s.neg")).alias("label"))
                .localCheckpoint(eager=False)
            )
        labels = labels.localCheckpoint(eager=True)
    return labels.select(F.col("id").alias("vertex"), F.col("label").alias("community"))


def k_core(edges: DataFrame, k: int = 2, rounds: int = 16,
           check_every: int = 2,
           undirected_dedup: bool = True) -> DataFrame:
    """B6 — k-core membership by synchronous peeling: each round drops
    every vertex whose degree in the INDUCED surviving subgraph is
    < k; the fixpoint is the k-core. Returns (vertex, core_degree)
    for surviving vertices, core_degree = induced degree at the
    fixpoint. Peeling is monotone (survivors only shrink), so extra
    rounds past convergence are idempotent — the loop-unrolled oracle
    matches at ANY unroll depth >= the convergence round count, the
    same contract as connected_components.

    ``rounds`` is a CEILING, not a fixed count (r8): the loop probes
    the alive-set size every ``check_every`` rounds (the same
    amortized-probe discipline as connected_components — rounds in
    between stay lazy and run as one job) and stops at the first
    stable probe. Monotone peeling makes a stable COUNT a sound
    fixpoint witness: membership cannot change without the count
    dropping. Worst case runs check_every-1 idempotent extra rounds,
    which the depth-idempotent oracle absorbs.

    Cost per round: the alive set re-enters the edge relation as two
    semi-joins (broadcast while it fits — the same state-size logic
    as the other iterative operators) plus one degree aggregation;
    state is one id per surviving vertex and the edge list is
    checkpointed once. Rounds needed ~ the peeling depth (cascade
    length), typically far below diameter."""
    und = _undirected(edges, dedup=undirected_dedup).localCheckpoint()
    n_edges = und.count()
    with _iteration_partitions(und, n_edges):
        alive = und.select(F.col("a").alias("id")).distinct().localCheckpoint()
        n_vertices = alive.count()
        bcast = _use_broadcast_state("auto", n_edges, n_vertices)
        deg = None
        prev_n = n_vertices
        done = 0
        while done < rounds:
            for _ in range(min(check_every, rounds - done)):
                state = F.broadcast(alive) if bcast else alive
                induced = und.join(
                    state.select(F.col("id").alias("a")), "a", "left_semi"
                ).join(state.select(F.col("id").alias("b")), "b", "left_semi")
                deg = induced.groupBy(F.col("a").alias("id")).agg(
                    F.count(F.lit(1)).alias("core_degree")
                )
                alive = (
                    deg.filter(F.col("core_degree") >= F.lit(k))
                    .select("id")
                    .localCheckpoint(eager=False)
                )
                done += 1
            cur_n = alive.count()
            if cur_n == prev_n:
                break
            prev_n = cur_n
        alive = alive.localCheckpoint(eager=True)
        out = deg.join(alive, "id", "left_semi").select(
            F.col("id").alias("vertex"), F.col("core_degree")
        ).localCheckpoint(eager=True)
    return out
