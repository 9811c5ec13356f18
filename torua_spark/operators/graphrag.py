"""GraphRAG retrieval — the reference's north-star use case composed
end-to-end (`README.md:201-218` "GraphRAG system", vector search +
graph traversal united; torua documents the ambition but implements
neither half).

``graphrag_retrieve`` is the canonical GraphRAG read path:

1. **seed** — exact cosine top-k documents for a query embedding
   (`operators.similarity.brute_force_topk`; swap in the IVF variant
   at corpus scale — same downstream plan),
2. **expand** — one hop through the purchase graph from the seed
   documents' entities (seed set is k rows — it broadcasts, so the
   expansion join never shuffles the edge list),
3. **fuse** — neighbors inherit the best seed similarity decayed by
   the hop factor; union seeds + neighbors, rank over the ROUNDED
   score with total tie-breaks, emit a context-window-sized top-N.

Scale: the only corpus-sized inputs are the embedding scan (seed
step; partition-pruned under IVF) and the edge list (expansion step;
joined against a broadcast seed set). Everything downstream of the
seed top-k is O(k · degree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from torua_spark.functions.compat import round4
from torua_spark.operators.graph import copurchase_edges
from torua_spark.operators.similarity import brute_force_topk

HOP_DECAY = 0.5
N_SEEDS = 5
CONTEXT_LIMIT = 25


def graphrag_retrieve(embeddings: DataFrame, orders: DataFrame,
                      lineitem: DataFrame, query_vec_id: int = 0,
                      k: int = N_SEEDS, decay: float = HOP_DECAY,
                      limit: int = CONTEXT_LIMIT) -> DataFrame:
    """Top-`limit` retrieval context: seed docs (hop 0, score = cosine
    sim) plus their 1-hop purchase-graph neighbors (hop 1, score =
    best seed sim × decay)."""
    seeds = brute_force_topk(embeddings, query_vec_id, k)
    edges = copurchase_edges(orders, lineitem)
    seed_rows = seeds.select(
        F.lit("doc").alias("entity_type"),
        F.col("vec_id").alias("entity_id"),
        F.col("sim").alias("score"),
        F.lit(0).alias("hop"),
    )
    hop1 = (
        F.broadcast(seeds.select("vec_id", "sim"))
        .join(edges, F.col("vec_id") == F.col("src"))
        .groupBy("dst")
        .agg(F.max("sim").alias("msim"))
        .select(
            F.lit("supplier").alias("entity_type"),
            F.col("dst").alias("entity_id"),
            round4(F.col("msim") * decay).alias("score"),
            F.lit(1).alias("hop"),
        )
    )
    out = seed_rows.unionByName(hop1)
    w = Window.orderBy(
        F.col("score").desc(), F.col("entity_type").asc(), F.col("entity_id").asc()
    )
    return (
        out.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= limit)
    )
