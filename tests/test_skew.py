"""AQE skew-join handling: with a synthetic hot key and lowered skew
thresholds, the adaptive plan splits the skewed partition — the final
plan carries SortMergeJoin(skew=true) — and results stay correct.

Note: the adaptive FINAL plan is only attached to the QueryExecution
that actually ran, so the asserted DataFrame itself is collected (an
action on a derived frame plans separately and shows isFinalPlan=false).
"""

from pyspark.sql import functions as F

from torua_spark.plans import plan_string


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "65536",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16384",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force sort-merge
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # ~99% of 200k rows on one hot key; the rest spread over 64 keys.
        left = spark.range(0, 200_000, 1, 16).select(
            F.when(F.col("id") % 100 < 99, F.lit(0)).otherwise(F.col("id") % 64).alias("k"),
            F.concat(F.lit("payload-payload-payload-"), F.col("id")).alias("payload"),
        )
        right = spark.range(64).select(F.col("id").alias("k"), F.lit("dim").alias("d"))
        joined = left.join(right, "k")
        rows = joined.collect()
        hot = sum(1 for r in rows if r["k"] == 0)
        assert hot == 198_000  # 99 of every 100 ids
        assert len(rows) == 200_000
        assert "skew=true" in plan_string(joined), plan_string(joined)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_band_skew_cap_on_near_dup_flood(spark):
    """VERDICT r2 #5: an adversarial near-duplicate FLOOD (many
    identical documents -> one hot LSH bucket) must not go quadratic
    when the band-skew cap is on. Pins (a) the candidate budget —
    star pairing emits O(B) rows for the flood bucket instead of
    O(B^2) — and (b) cluster equivalence: connected components over
    capped candidates equal components over exact all-pairs."""
    from pyspark.sql import functions as F

    from torua_spark.operators.dedup import minhash_lsh_pairs

    n_flood, n_normal = 400, 40
    flood = spark.range(n_flood).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "the same boilerplate page crawled again and again with "
            "identical body text every single time for every mirror"
        ).alias("text"),
    )
    normal = spark.range(n_flood, n_flood + n_normal).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("unique document number "), F.col("id"),
            F.lit(" with distinct content about topic "), F.col("id") * 7,
            F.lit(" and more words that do not repeat across docs "),
            F.col("id") * 13,
        ).alias("text"),
    )
    docs = flood.unionByName(normal)

    capped = minhash_lsh_pairs(docs, max_bucket=50)
    n_capped = capped.count()
    # Budget: linear in the flood (n_flood - 1 star edges), plus
    # whatever the small normal buckets contribute — far below the
    # ~80k all-pairs of the flood.
    assert n_capped < 3 * (n_flood + n_normal), n_capped

    # Cluster equivalence vs the exact all-pairs candidates.
    exact = minhash_lsh_pairs(docs)

    def components(pairs_df):
        import collections

        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in pairs_df.collect():
            ra, rb = find(r["doc_a"]), find(r["doc_b"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        groups = collections.defaultdict(set)
        for x in parent:
            groups[find(x)].add(x)
        return {frozenset(g) for g in groups.values() if len(g) > 1}

    assert components(capped) == components(exact)
