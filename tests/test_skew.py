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
    # Budget: the flood bucket must contribute EXACTLY its k=2-rep
    # star edges, sum_{i=1..k}(B-i) = 2*B - 3 — linear in B, vs the
    # ~80k all-pairs quadratic blow-up. Small normal buckets keep
    # their exact all-pairs (they're below the cap by construction).
    flood_pairs = capped.filter(
        (F.col("doc_a") < n_flood) & (F.col("doc_b") < n_flood)
    ).count()
    assert flood_pairs == 2 * n_flood - 3, flood_pairs
    assert n_capped < flood_pairs + n_normal * (n_normal - 1) // 2 + 1

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


def test_star_reps_bound_heterogeneous_bucket_loss(spark):
    """ADVICE r3: with k=2 representatives, an oversized HETEROGENEOUS
    bucket (unrelated min-id member M plus a true pair X~Y) keeps the
    X-Y candidate as long as X or Y ranks among the k smallest ids —
    the exact edge a single-representative star (k=1) provably loses.
    Pins the emitted pair set for both k values."""
    from pyspark.sql import functions as F

    from torua_spark.operators.dedup import _bucket_pairs

    rows = spark.createDataFrame(
        [(0, m) for m in range(5)], ["bucket", "doc_id"]
    ).select(F.col("bucket"), F.col("doc_id"))

    def pairs(star_reps):
        got = _bucket_pairs(
            rows, ["bucket"], "doc_id", "doc_a", "doc_b",
            max_bucket=3, star_reps=star_reps,
        )
        return {(r["doc_a"], r["doc_b"]) for r in got.collect()}

    # k=1: star around min id only — (1,2) etc. never emitted.
    assert pairs(1) == {(0, 1), (0, 2), (0, 3), (0, 4)}
    # k=2 (default): reps {0,1}; every member also meets rep 1, so a
    # true pair (1, y) survives even when doc 0 is an unrelated
    # collision.
    assert pairs(2) == {
        (0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (1, 3), (1, 4),
    }


def test_prefix_filter_cache_is_bounded(spark):
    """VERDICT r3 #3: prefix_filter_pairs persists two intermediates
    (shingles + prefix index). Spark's CacheManager dedups by logical
    plan, so repeated invocations over the same input must NOT grow
    the persistent-RDD set — and release_caches() must drop it to the
    baseline when the caller is done."""
    from pyspark.sql import functions as F

    from torua_spark.operators.dedup import prefix_filter_pairs, release_caches

    def n_cached():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("shared words appear in every document here "),
            F.col("id") % 5, F.lit(" body "), F.col("id") % 5,
        ).alias("text"),
    )
    base = n_cached()
    results = []
    sizes = []
    for _ in range(3):
        out = prefix_filter_pairs(docs, threshold=0.5)
        out.count()
        results.append(out)
        sizes.append(n_cached())
    # Flat across invocations: the 2nd and 3rd calls add nothing.
    assert sizes[0] <= base + 2
    assert sizes[1] == sizes[0]
    assert sizes[2] == sizes[0]
    for out in results:
        release_caches(out)
    assert n_cached() == base
