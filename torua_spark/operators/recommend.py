"""Item-item collaborative filtering (reference README.md:221-224
"Use Cases — Recommendation Systems": distributed user-item
interaction graphs + collaborative filtering queries).

Spark-first shape, scale notes inline:

- Interactions are (order, customer, part) baskets; item-item
  co-occurrence pairs are generated WITHIN a basket (self-join
  co-partitioned on the order key), so pair volume is
  sum(basket_size^2) — linear in orders for bounded baskets — never
  the dense item-key projection (see coproduct_edges' 345M-pair
  cautionary note).
- Similarity is the implicit-feedback cosine
  cooc(a,b) / sqrt(pop(a) * pop(b)) over order incidence — pure
  integer inputs so both engines compute the identical double.
- Per-customer recommendation joins the customer's (small) bought
  set against the neighbor lists, excludes already-bought, sums
  similarity contributions, and takes top-k via global_topk
  (TakeOrderedAndProject — no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from torua_spark.functions.compat import round4
from torua_spark.functions.ranking import global_topk


def order_baskets(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Distinct (o_orderkey, o_custkey, part) basket rows."""
    return (
        orders.select("o_orderkey", "o_custkey")
        .join(
            lineitem.select("l_orderkey", F.col("l_partkey").alias("part")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("o_orderkey", "o_custkey", "part")
        .distinct()
    )


def item_popularity(baskets: DataFrame) -> DataFrame:
    """(part, pop): number of orders containing the item — one
    partial+final count, shuffle rows = distinct items."""
    return baskets.groupBy("part").agg(F.count(F.lit(1)).alias("pop"))


def item_item_cosine(baskets: DataFrame, min_cooc: int = 1) -> DataFrame:
    """(part_a, part_b, cooc, score) with part_a < part_b: basket-level
    co-occurrence count and implicit cosine. The pair join is keyed on
    the ORDER (bounded basket => linear pair volume); popularity rides
    in on two item-keyed joins (item relation is corpus-vocabulary
    sized; AQE picks broadcast when it fits)."""
    a = baskets.select("o_orderkey", F.col("part").alias("part_a"))
    b = baskets.select("o_orderkey", F.col("part").alias("part_b"))
    cooc = (
        a.join(b, "o_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("cooc"))
        .filter(F.col("cooc") >= min_cooc)
    )
    pop = item_popularity(baskets)
    return (
        cooc.join(pop.select(F.col("part").alias("part_a"), F.col("pop").alias("pop_a")), "part_a")
        .join(pop.select(F.col("part").alias("part_b"), F.col("pop").alias("pop_b")), "part_b")
        .select(
            "part_a", "part_b", "cooc",
            (F.col("cooc") / F.sqrt(F.col("pop_a") * F.col("pop_b"))).alias("score"),
        )
    )


def recommend_for_customer(orders: DataFrame, lineitem: DataFrame,
                           custkey: int, k: int = 10,
                           min_cooc: int = 1) -> DataFrame:
    """Top-k item recommendations for one customer: sum of item-item
    cosine contributions from their bought set, already-bought items
    excluded. Returns (part, rec_score, rank).

    The bought set is per-customer tiny (predicate pushes to the
    orders scan); the neighbor expansion is bought x avg-neighbor-list
    — index-shaped, not corpus-shaped."""
    # Materialize the baskets ONCE: four consumers (both cooc self-
    # join sides, item_popularity, bought) would otherwise each re-run
    # the corpus-sized orders ⋈ lineitem ⋈ distinct subtree —
    # ReuseExchange dedups only the identical self-join sides.
    baskets = order_baskets(orders, lineitem).localCheckpoint()
    sims = item_item_cosine(baskets, min_cooc)
    # symmetric neighbor list
    nbrs = sims.select(
        F.col("part_a").alias("src"), F.col("part_b").alias("dst"), "score"
    ).unionByName(
        sims.select(
            F.col("part_b").alias("src"), F.col("part_a").alias("dst"), "score"
        )
    )
    bought = (
        baskets.filter(F.col("o_custkey") == custkey)
        .select(F.col("part").alias("src"))
        .distinct()
    )
    cands = (
        nbrs.join(F.broadcast(bought), "src")
        .join(
            F.broadcast(bought.select(F.col("src").alias("dst"))),
            "dst",
            "left_anti",
        )
        .groupBy(F.col("dst").alias("part"))
        .agg(round4(F.sum("score")).alias("rec_score"))
    )
    return global_topk(
        cands, [F.col("rec_score").desc(), F.col("part")], k
    ).select("part", "rec_score", "rank")
