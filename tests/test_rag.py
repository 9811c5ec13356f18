"""LLM-pipeline declared queries vs DuckDB oracle + semantic checks."""

import pytest

from tests.oracle import compare
from torua_spark.operators import graphrag as gr
from torua_spark.queries import rag_q


# Iterate names WITH an oracle (vector_ann_ivf_learned is pinned by
# its recall property test instead — ANN results aren't SQL-matchable
# end-to-end, only the kmeans assignment underneath is).
@pytest.mark.parametrize("name", sorted(rag_q.ORACLE))
def test_rag_query_matches_oracle(spark, sf_dir, name):
    compare(rag_q.QUERIES[name](spark, sf_dir), rag_q.ORACLE[name], sf_dir)


def test_topk_is_ten_ranked(spark, sf_dir):
    rows = rag_q.QUERIES["vector_topk_cosine"](spark, sf_dir).collect()
    assert len(rows) == 10
    assert sorted(r["rank"] for r in rows) == list(range(1, 11))
    sims = [r["sim"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert sims == sorted(sims, reverse=True)


def test_ivf_is_subset_of_probed_cells(spark, sf_dir):
    out = rag_q.QUERIES["vector_ann_ivf"](spark, sf_dir).collect()
    assert len(out) == 10
    assert len({r["label"] for r in out}) <= 3  # nprobe cells only


def test_ngram_jaccard_pairs_above_threshold(spark, sf_dir):
    rows = rag_q.QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
    assert all(r["jaccard"] >= rag_q.JACCARD_THRESHOLD for r in rows)
    assert all(r["doc_a"] < r["doc_b"] for r in rows)


def test_simhash_is_32bit(spark, sf_dir):
    rows = rag_q.QUERIES["dedup_simhash"](spark, sf_dir).collect()
    assert all(0 <= r["simhash"] < 2**32 for r in rows)


def test_chunks_cover_documents(spark, sf_dir):
    """Every token position is covered: chunk i starts at i*stride,
    consecutive chunk_ids, and all full-size except possibly the tail."""
    from collections import defaultdict

    from torua_spark.operators.retrieval import CHUNK_SIZE, CHUNK_STRIDE
    from torua_spark.sources.catalog import load_table

    rows = rag_q.QUERIES["rag_chunk_documents"](spark, sf_dir).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    n_tokens = {
        r["doc_id"]: len(r["text"].split(" "))
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        n = n_tokens[doc_id]
        assert len(chunks) == (n - 1) // CHUNK_STRIDE + 1
        for c in chunks:
            expected = min(CHUNK_SIZE, n - c["chunk_id"] * CHUNK_STRIDE)
            assert c["n_tokens"] == expected


def test_graphrag_expansion_semantics(spark, sf_dir):
    """Seeds appear at hop 0 with their cosine score; every hop-1
    neighbor's score is a decayed seed score, never above the best
    seed."""
    from torua_spark.operators.graphrag import HOP_DECAY, N_SEEDS

    rows = rag_q.QUERIES["graphrag_retrieve"](spark, sf_dir).collect()
    seeds = [r for r in rows if r["hop"] == 0]
    hop1 = [r for r in rows if r["hop"] == 1]
    assert 0 < len(seeds) <= N_SEEDS
    assert all(r["entity_type"] == "doc" for r in seeds)
    assert all(r["entity_type"] == "supplier" for r in hop1)
    best = max(r["score"] for r in seeds)
    # 1e-4 slack: hop-1 scores are re-rounded after the decay multiply
    assert all(r["score"] <= best * HOP_DECAY + 1e-4 for r in hop1)
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


def test_ppr_mass_conservation(spark, sf_dir):
    """PPR scores are a sub-probability distribution (dangling mass
    dropped): positive, summing to <= 1 over the full vertex set, so
    the emitted top-k alone must also sum below 1."""
    rows = rag_q.QUERIES["graphrag_ppr"](spark, sf_dir).collect()
    assert rows, "PPR returned nothing"
    assert all(r["score"] >= 0 for r in rows)
    assert sum(r["score"] for r in rows) <= 1.0 + 1e-6
    assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))


def test_bfs_hops_partition_vertex_set(spark, sf_dir):
    """Histogram rows (incl. the hops=-1 unreached row) partition the
    vertex set; exactly N_SEEDS vertices sit at hop 0."""
    from torua_spark.operators.graph import copurchase_vertex_edges
    from torua_spark.sources.catalog import load_table

    rows = rag_q.QUERIES["graphrag_hops"](spark, sf_dir).collect()
    by_hop = {r["hops"]: r["n_vertices"] for r in rows}
    # hop 0 = the seeds that exist as graph vertices (absent seeds are
    # dropped, matching the oracle's d0 semi-join)
    assert 1 <= by_hop[0] <= gr.N_SEEDS
    edges = copurchase_vertex_edges(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )
    from pyspark.sql import functions as F

    n_vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .count()
    )
    assert sum(by_hop.values()) == n_vertices


def test_unigram_logprob_covers_corpus(spark, sf_dir):
    from pyspark.sql import functions as F
    from torua_spark.sources.catalog import load_table

    rows = rag_q.QUERIES["text_unigram_logprob"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert len(rows) == docs.count()
    assert all(r["avg_nll"] > 0 for r in rows)
    total_tok = docs.select(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("t")
    ).collect()[0]["t"]
    assert sum(r["n_tokens"] for r in rows) == total_tok


def test_quantization_error_within_half_step(spark, sf_dir):
    """Uniform quantization to 256 levels can't err more than half a
    step per dimension (plus the 4dp rounding slack)."""
    rows = rag_q.QUERIES["vector_quantize_report"](spark, sf_dir).collect()
    assert len(rows) == 64
    for r in rows:
        step = (r["maxv"] - r["minv"]) / 255.0
        assert r["max_err"] <= step / 2 + 1e-4, r
        assert 0 <= r["avg_err"] <= r["max_err"] + 1e-4


def test_bm25_ranked_topk(spark, sf_dir):
    rows = rag_q.QUERIES["rag_bm25_topk"](spark, sf_dir).collect()
    assert len(rows) == 10
    ordered = sorted(rows, key=lambda r: r["rank"])
    scores = [r["score"] for r in ordered]
    assert scores == sorted(scores, reverse=True)
    assert all(r["score"] > 0 for r in rows)


def test_prefix_filter_recall_covers_lsh_tier(spark, sf_dir):
    """Prefix filtering is COMPLETE (theorem-backed blocking): every
    pair the probabilistic LSH tier verified AT OR ABOVE the prefix
    tier's threshold must also be found."""
    pf = {
        (r["doc_a"], r["doc_b"])
        for r in rag_q.QUERIES["dedup_prefix_filter"](spark, sf_dir).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in rag_q.QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
        if r["jaccard"] >= rag_q.PREFIX_THRESHOLD
    }
    assert lsh <= pf


def test_hyperplane_banding_recall_vs_brute_force(spark, sf_dir):
    """VERDICT r1 #6: the learned (hyperplane-band) blocking key must
    recover most true near-dup pairs without any trusted label column.
    Theory at 64 bits / 16 bands of 4 for the corpus's sim range
    (0.35-0.51) is ~0.92; md5-derived planes measure ~0.90. Pin a 0.8
    floor so a regression to correlated planes (measured 0.62 with a
    linear integer mix) fails loudly."""
    from pyspark.sql import functions as F

    from torua_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    banded = {
        (r["vec_a"], r["vec_b"])
        for r in sim.embedding_near_dup_pairs(emb, 0.35).collect()
    }
    truth = {
        (r["vec_a"], r["vec_b"])
        for r in sim.embedding_near_dup_pairs(
            emb.withColumn("one", F.lit(1)), 0.35, cell_col="one"
        ).collect()
    }
    assert banded <= truth          # blocking never invents pairs
    assert truth, "fixture must contain near-dup pairs"
    assert len(banded) / len(truth) >= 0.8


def test_learned_ivf_recall_vs_brute_force(spark, sf_dir):
    """The fully-learned ANN path (k-means codebook -> cell assign ->
    nprobe probe -> exact search) must put most of the true top-10 in
    its answer. ANN recall < 1.0 is the documented trade-off; pin a
    floor of 6/10 so a broken quantizer (e.g. all mass in one cell or
    divergent assignment) fails."""
    from torua_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    truth = [r["vec_id"] for r in sim.brute_force_topk(emb, 0, 10).collect()]
    learned = [r["vec_id"] for r in sim.ivf_topk_learned(emb, 0, 10, nprobe=3).collect()]
    overlap = len(set(truth) & set(learned))
    assert overlap >= 6, (truth, learned)

    # Lloyd must actually move the codebook: iteration-2 centroids
    # differ from the seeds, and every vector gets exactly one cell.
    cells = sim.assign_cells(emb, sim.kmeans_centroids(emb))
    assert cells.count() == emb.count()
    assert cells.select("vec_id").distinct().count() == emb.count()


def test_repetition_scores_semantics(spark):
    """Constructed docs pin the Gopher-rule arithmetic: an all-repeat
    doc maxes both fractions, an all-distinct doc gets 1/n top-bigram
    mass and zero duplicate-trigram mass, a one-word doc has no gram
    mass to judge (NULLs)."""
    from torua_spark.operators import text_analysis as ta

    docs = spark.createDataFrame(
        [(1, "x x x x x"), (2, "a b c d"), (3, "w")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in ta.repetition_scores(docs).collect()}
    assert rows[1]["top_bigram_frac"] == 1.0       # 4x "x x"
    assert rows[1]["dup_trigram_frac"] == 1.0      # 3x "x x x"
    assert rows[2]["n_bigrams"] == 3
    assert abs(rows[2]["top_bigram_frac"] - 0.3333) < 1e-9
    assert rows[2]["dup_trigram_frac"] == 0.0
    assert rows[3]["top_bigram_frac"] is None
    assert rows[3]["dup_trigram_frac"] is None


def test_decontamination_semantics(spark):
    """A training doc identical to an eval doc must be flagged with
    jaccard 1.0; an unrelated doc must not appear. Pairs never join
    within a corpus (train x train dups are the self-join tier's job)."""
    from torua_spark.operators import dedup as dd

    leak = "alpha beta gamma delta epsilon zeta eta theta"
    train = spark.createDataFrame(
        [(10, leak), (11, "one two three four five six seven")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(90, leak), (91, "red green blue cyan magenta yellow black")],
        "doc_id long, text string",
    )
    got = {
        (r["train_id"], r["eval_id"]): r["jaccard"]
        for r in dd.cross_corpus_contamination(train, ev, 0.5).collect()
    }
    assert got == {(10, 90): 1.0}


def test_ngram_overlap_contamination_semantics(spark):
    """The collision method must catch a benchmark passage QUOTED
    inside a longer unrelated training doc — the case document-level
    Jaccard dilutes below threshold — and stay silent on disjoint
    text. n=4 here: the quoted passage contributes exactly
    len(passage_words)-3 distinct 4-grams."""
    from torua_spark.operators import dedup as dd

    passage = "alpha beta gamma delta epsilon zeta"          # 6 words
    train = spark.createDataFrame(
        [
            (10, "noise one two three " + passage + " four five six noise"),
            (11, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(90, passage), (91, "red green blue cyan magenta yellow")],
        "doc_id long, text string",
    )
    got = {
        (r["train_id"], r["eval_id"]): r["n_shared_ngrams"]
        for r in dd.ngram_overlap_contamination(train, ev, n=4, min_overlap=2).collect()
    }
    assert got == {(10, 90): 3}  # 6-word passage -> 3 distinct 4-grams


def test_pq_adc_recall_and_determinism(spark, sf_dir):
    """Product quantization: codes are m 4-bit cells, reconstruction
    error is finite and positive, ADC-only ranking clears a low floor
    on this distance-concentrated corpus, and the DEPLOYED path
    (ADC shortlist + exact re-rank) recovers near-exact recall.
    Encoding twice gives identical codes (deterministic Lloyd +
    rounded argmin)."""
    from torua_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = sim.pq_codebooks(emb).localCheckpoint()
    codes = sim.pq_encode(emb, books)
    rows = codes.collect()
    assert all(len(r["codes"]) == sim.PQ_M for r in rows)
    assert all(0 <= c < sim.PQ_K for r in rows for c in r["codes"])
    assert all(r["recon_err"] >= 0 for r in rows)

    again = {r["vec_id"]: r["codes"] for r in sim.pq_encode(emb, books).collect()}
    assert {r["vec_id"]: r["codes"] for r in rows} == again

    # ADC approximates EXACT L2 (embeddings are not normalized, so
    # cosine top-k is a different ranking — not the comparison).
    from pyspark.sql import functions as F
    from torua_spark.functions.vectors import to_double_array

    q = emb.filter(F.col("vec_id") == 0).select(
        to_double_array("embedding").alias("q")
    )
    d2 = F.aggregate(
        F.zip_with(to_double_array("embedding"), F.col("q"),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda a, v: a + v,
    )
    truth = [
        r["vec_id"]
        for r in emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", d2.alias("d2"))
        .orderBy(F.col("d2").asc(), F.col("vec_id").asc())
        .limit(10)
        .collect()
    ]
    # ADC-only: quantization noise dominates on this corpus (top-10 d2
    # spans ~10%) — low floor, documented in the PQ_M comment.
    adc_only = [r["vec_id"] for r in sim.pq_topk(emb, 0, 10).collect()]
    assert len(set(truth) & set(adc_only)) >= 2, (truth, adc_only)

    # Shortlist + exact re-rank: the deployed read path (measured
    # 10/10 here; floor at 8 absorbs corpus regeneration).
    reranked = [r["vec_id"] for r in sim.pq_topk_reranked(emb, 0, 10).collect()]
    assert len(set(truth) & set(reranked)) >= 8, (truth, reranked)


def test_incremental_dedup_matches_cross_corpus(spark, sf_dir, tmp_path):
    """The persisted-index incremental path must flag exactly the
    pairs the from-scratch cross-corpus tier flags: signatures survive
    a parquet round-trip (the index IS a table), and pruned verify
    changes nothing."""
    from pyspark.sql import functions as F

    from torua_spark.operators import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 10 < 8)
    new = docs.filter(F.col("doc_id") % 10 >= 8)

    idx_path = str(tmp_path / "minhash_index")
    dd.minhash_signatures(corpus).write.parquet(idx_path)
    index = spark.read.parquet(idx_path)

    got = {
        (r["corpus_id"], r["new_id"]): r["jaccard"]
        for r in dd.incremental_near_dups(new, corpus, index, 0.5).collect()
    }
    want = {
        (r["train_id"], r["eval_id"]): r["jaccard"]
        for r in dd.cross_corpus_contamination(corpus, new, 0.5).collect()
    }
    assert got == want
    assert want, "fixture must contain cross-batch near-dups"


def test_redact_pii_masks_constructed_docs(spark):
    """Real masking on constructed docs: emails and URLs replaced,
    counts exact, clean docs unchanged with changed=False."""
    from torua_spark.operators import text_analysis as ta

    docs = spark.createDataFrame(
        [
            (1, "contact bob@example.com or visit https://a.io/x now"),
            (2, "plain text only"),
            (3, "two mails a@b.co c.d@e.org and http://z.q"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in ta.redact_pii(docs).collect()}
    assert rows[1]["n_emails"] == 1 and rows[1]["n_urls"] == 1
    assert rows[1]["changed"] is True
    assert rows[2]["n_emails"] == 0 and rows[2]["n_urls"] == 0
    assert rows[2]["changed"] is False
    assert rows[3]["n_emails"] == 2 and rows[3]["n_urls"] == 1
    import hashlib

    expect = "contact <EMAIL> or visit <URL> now"
    assert rows[1]["redacted_md5"] == hashlib.md5(expect.encode()).hexdigest()


def test_auto_band_bits_scales_log_with_corpus():
    """LSH band width must grow with log2(n) so expected bucket size —
    and with it candidate-join volume per row — stays CONSTANT at any
    corpus scale (the sf0.1->sf1 sweep measured 87x time at 10x rows
    with a fixed r=4). Floors at the legacy r=4 for every corpus the
    driver checks, so the static DuckDB oracle stays bit-identical."""
    from torua_spark.operators import similarity as sim

    # oracle-compared SFs resolve to the legacy constant -> safe
    assert sim.auto_band_bits(500) == sim.HYPERPLANE_BAND_BITS    # sf0.01
    # bench-only SFs engage the law (target 64, VERDICT r6 #3)
    assert sim.auto_band_bits(2000) == 5                          # sf0.1
    assert sim.auto_band_bits(20_000) == 9                        # sf1
    # 1000-executor scale: still only 24 bits / L*24 planes
    assert sim.auto_band_bits(10**9) == 24
    # monotone, and bucket size n/2^r stays within [target/2, 2*target]
    prev = 0
    for n in (10**3, 10**4, 10**5, 10**6, 10**7, 10**8):
        r = sim.auto_band_bits(n)
        assert r >= prev
        prev = r
        if r > sim.HYPERPLANE_BAND_BITS:
            assert n / 2**r <= sim.HYPERPLANE_TARGET_BUCKET
            assert n / 2**r > sim.HYPERPLANE_TARGET_BUCKET / 2


def test_hyperplane_bands_auto_matches_pinned_at_small_n(spark, sf_dir):
    """At driver scale the auto path and the pinned legacy (64, r=4)
    path must produce the IDENTICAL blocking relation."""
    from torua_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    auto = sim.hyperplane_bands(emb).collect()
    pinned = sim.hyperplane_bands(
        emb, n_bits=sim.HYPERPLANE_BITS, band_bits=sim.HYPERPLANE_BAND_BITS
    ).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, pinned))


def test_lsh_bands_needed_recovers_legacy_and_prices_low_thresholds():
    from torua_spark.operators import similarity as sim

    # the legacy 64-bit/r=4 constant IS the 0.9-recall design point
    # for the fixture's tau=0.35 operating threshold
    assert sim.lsh_bands_needed(0.35, 4) == 16
    # scale-sized bands: near-dup regime stays cheap, low thresholds
    # are priced honestly
    assert sim.lsh_bands_needed(0.8, 8) <= 16
    assert sim.lsh_bands_needed(0.35, 8) > 100
    # monotone in threshold
    ls = [sim.lsh_bands_needed(t, 8) for t in (0.3, 0.5, 0.7, 0.9)]
    assert ls == sorted(ls, reverse=True)


def test_semantic_dedup_keeps_min_id_and_covers_corpus(spark, sf_dir):
    """Every vector gets exactly one row; the min-id member of every
    cell always survives; every dropped vector really has a smaller-id
    kept-or-dropped neighbor above threshold in its cell (star rule)."""
    from pyspark.sql import functions as F

    from torua_spark.operators import similarity as sim
    from torua_spark.queries.rag_q import NEARDUP_COS_THRESHOLD, _emb

    emb = _emb(spark, sf_dir)
    res = sim.semantic_dedup(emb, NEARDUP_COS_THRESHOLD)
    assert res.count() == emb.count()
    mins = res.groupBy("cell").agg(F.min("vec_id").alias("vec_id"))
    assert res.join(mins, ["cell", "vec_id"]).filter(~F.col("kept")).count() == 0
    dropped = res.filter(~F.col("kept")).select("vec_id")
    pairs = sim.embedding_near_dup_pairs(
        emb, NEARDUP_COS_THRESHOLD, cell_col="label"
    )
    witnessed = pairs.select(F.col("vec_b").alias("vec_id")).distinct()
    assert dropped.exceptAll(witnessed).count() == 0
    assert witnessed.exceptAll(dropped).count() == 0


def test_simhash_block_generalization_matches_legacy(spark, sf_dir):
    """Auto-sized blocking at driver scale must reproduce the legacy
    two-16-bit-halves candidate set and verified pairs exactly."""
    from torua_spark.operators import dedup as dd
    from torua_spark.queries.rag_q import _docs

    docs = _docs(spark, sf_dir)
    auto = dd.simhash_near_dup_pairs(docs, 6).collect()
    pinned = dd.simhash_near_dup_pairs(docs, 6, sig_bits=32, block_bits=16).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, pinned))


def test_simhash64_scale_path(spark, sf_dir):
    """64-bit signatures: high bits are exercised, blocked pairs are a
    subset of brute-force hamming pairs, and recall is EXACT for
    hamming <= n_blocks-1 (pigeonhole: 4 blocks of 16 bits)."""
    from pyspark.sql import functions as F

    from torua_spark.operators import dedup as dd
    from torua_spark.queries.rag_q import _docs

    docs = _docs(spark, sf_dir).limit(200)
    sigs = dd.simhash_signatures(docs, bits=64)
    assert sigs.filter(
        (F.col("simhash") < 0) | (F.col("simhash") >= 2**32)
    ).count() > 0, "64-bit signatures must populate the high half"

    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dd.simhash_near_dup_pairs(docs, 12, sig_bits=64).collect()
    }
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    brute = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in a.crossJoin(b)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 12)
        .collect()
    }
    assert set(got) <= set(brute)
    assert all(brute[k] == v for k, v in got.items())
    # pigeonhole recall: every true pair within hamming 3 is found
    close = {k for k, v in brute.items() if v <= 3}
    assert close <= set(got)


def test_simhash_32bit_raises_past_block_capacity():
    from torua_spark.operators import dedup as dd
    import pytest as _pt

    # 20M docs -> auto block width 18 -> one 32-bit block only
    with _pt.raises(ValueError, match="sig_bits=64"):
        dd.simhash_near_dup_pairs(None, 6, sig_bits=32, n_rows=20_000_000)


def test_semantic_dedup_auto_kmeans_blocking(spark, sf_dir):
    """cell_col=None: corpus-sized k-means blocking (k ~ n/target).
    One row per vector, deterministic across invocations, min-id per
    cell kept — the scale path for unlabeled corpora."""
    from pyspark.sql import functions as F

    from torua_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    r1 = sim.semantic_dedup(emb, 0.35, cell_col=None)
    assert r1.count() == emb.count()
    mins = r1.groupBy("cell").agg(F.min("vec_id").alias("vec_id"))
    assert r1.join(mins, ["cell", "vec_id"]).filter(~F.col("kept")).count() == 0
    r2 = sim.semantic_dedup(emb, 0.35, cell_col=None)
    assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, r2.collect()))


def test_neardup_warns_when_recall_budget_collapses(spark):
    """Auto-banded near-dup must WARN (never silently) when the fixed
    L=16 band count stops covering 0.9 recall at the caller's
    threshold and the corpus-sized band width; no warning at driver
    scale where L=16 IS the 0.9-recall design point."""
    import warnings

    from pyspark.sql import functions as F

    from torua_spark.operators import similarity as sim

    big = spark.range(0, 3000).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=7) for _ in range(4)]).alias("embedding"),
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sim.embedding_near_dup_pairs(big, 0.35)  # lazy: only the count runs
        assert any("recall" in str(x.message) for x in w), "expected warning"

    small = spark.range(0, 500).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=7) for _ in range(4)]).alias("embedding"),
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sim.embedding_near_dup_pairs(small, 0.35)
        assert not any("recall" in str(x.message) for x in w)


def test_semantic_dedup_refined_blocking_past_cap(spark, sf_dir):
    """Past the centroid cap the blocking key refines to
    (cell, band, sig): the dropped set must be a SUBSET of the
    cell-only dropped set (bands partition cells — refinement only
    removes candidates), every vector still gets one row, and min-id
    per cell still survives."""
    from pyspark.sql import functions as F

    from torua_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # max_k=4 forces the cap at this corpus size -> refined path
    refined = sim.semantic_dedup(emb, 0.35, cell_col=None, max_k=4)
    cellonly = sim.semantic_dedup(emb, 0.35, cell_col=None, max_k=4_000_000)
    assert refined.count() == emb.count()
    mins = refined.groupBy("cell").agg(F.min("vec_id").alias("vec_id"))
    assert refined.join(mins, ["cell", "vec_id"]).filter(~F.col("kept")).count() == 0
    # NOTE: refined uses k=4 cells, cellonly uses k=n/128 cells — the
    # subset property must be checked against the SAME cells, so
    # re-run cell-only at k=4 via the label-free internals:
    from torua_spark.operators.similarity import (
        _cell_band_pairs, assign_cells, kmeans_centroids,
    )

    cents = kmeans_centroids(emb, 4)
    base = emb.join(assign_cells(emb, cents), "vec_id")
    ref_pairs = {
        (r["vec_a"], r["vec_b"])
        for r in _cell_band_pairs(base, 0.35).collect()
    }
    cell_pairs = {
        (r["vec_a"], r["vec_b"])
        for r in sim.embedding_near_dup_pairs(base, 0.35, cell_col="cell").collect()
    }
    assert ref_pairs <= cell_pairs
    assert ref_pairs, "refined blocking must still find pairs"


def test_ivf_index_persist_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """Persisted IVF index (round 7): the cell-partitioned layout IS
    the index — a probe reads ONLY its nprobe cell directories
    (inputFiles() proof), and the persisted path probes the identical
    cells as the in-memory learned path (same portable arithmetic)."""
    from torua_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    report = sim.ivf_index_write(emb, path)
    assert report["cells"] > 3 and report["files"] >= report["cells"]

    qvec = [float(x) for x in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    out = sim.ivf_index_topk(spark, path, qvec, k=10, nprobe=3)
    rows = out.collect()
    assert len(rows) == 10
    # the query vector itself lives in the index: top hit, sim 1.0
    assert rows[0]["vec_id"] == 0 and rows[0]["sim"] == 1.0

    # partition pruning: the cell IN (...) predicate lands in the
    # scan's PartitionFilters (directory-level pruning — unprobed
    # cell= dirs are never opened), not as a post-scan data filter
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1) and " IN " in m.group(1), plan[:2000]
    # and only the probed cells appear in the pushed IN-list
    in_list = re.search(r" IN \(([^)]*)\)", m.group(1)).group(1)
    in_cells = {int(x) for x in re.findall(r"\d+", in_list)}
    probed_cells = {r["cell"] for r in rows}
    assert probed_cells <= in_cells and len(in_cells) == 3

    # parity with the in-memory learned path (excluding the query
    # vector, which the in-memory API filters out)
    mem = sim.ivf_topk_learned(emb, 0, 10, nprobe=3).collect()
    got = [(r["vec_id"], r["sim"]) for r in rows if r["vec_id"] != 0][:5]
    want = [(r["vec_id"], r["sim"]) for r in mem][:5]
    assert got == want


def test_boilerplate_lines_semantics(spark):
    from torua_spark.operators import text_analysis as ta

    docs = spark.createDataFrame(
        [
            ("d1", "COOKIE BANNER\nunique one\n\n  COOKIE BANNER  \nend1"),
            ("d2", "COOKIE BANNER\nunique two\nend2"),
            ("d3", "COOKIE BANNER\nunique three"),
            ("d4", "solo repeat\nsolo repeat"),
            ("d5", "COOKIE BANNER"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in ta.remove_boilerplate_lines(docs, min_docs=3).collect()
    }
    # trim-insensitive: the padded variant in d1 is removed too; the
    # blank line is NEVER boilerplate and survives in place
    assert out["d1"]["clean_text"] == "unique one\n\nend1"
    assert (out["d1"]["n_lines"], out["d1"]["n_removed"]) == (5, 2)
    assert out["d2"]["clean_text"] == "unique two\nend2"
    assert out["d3"]["clean_text"] == "unique three"
    # within-doc repetition is 1 distinct doc -> kept
    assert out["d4"]["clean_text"] == "solo repeat\nsolo repeat"
    assert out["d4"]["n_removed"] == 0
    # a fully-boilerplate doc survives as an empty row, not a dropped one
    assert out["d5"]["clean_text"] == ""
    assert (out["d5"]["n_lines"], out["d5"]["n_removed"]) == (1, 1)

    # the hashed-key scale path is byte-identical to the exact path
    hashed = {
        r["doc_id"]: r
        for r in ta.remove_boilerplate_lines(
            docs, min_docs=3, hash_lines=True
        ).collect()
    }
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in hashed.items()
    }


def test_boilerplate_corpus_nonvacuous(spark, sf_dir):
    from pyspark.sql import functions as F

    out = rag_q.QUERIES["text_boilerplate_lines"](spark, sf_dir)
    removed, docs = out.agg(
        F.sum("n_removed"), F.count(F.lit(1))
    ).first()
    assert docs > 0 and 0 < removed < docs * 10


def _exact_knn(rows, k):
    """Reference kNN with the operator's exact contract: round4 cosine,
    ties (sim desc, neighbor_id asc)."""
    import numpy as np

    ids = np.array([r["vec_id"] for r in rows])
    M = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = np.floor((Mn @ Mn.T) * 10000.0 + 0.5 + 1e-9) / 10000.0
    out = {}
    for i, v in enumerate(ids):
        cand = [(-S[i, j], int(ids[j])) for j in range(len(ids)) if j != i]
        cand.sort()
        out[int(v)] = [(nid, -negs) for negs, nid in cand[:k]]
    return out


def test_knn_join_full_probe_is_exact(spark, sf_dir):
    """Probing EVERY cell removes the blocking approximation: the
    operator must reproduce exact brute-force kNN bit-for-bit."""
    from torua_spark.operators import similarity as sim
    from torua_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = _exact_knn(emb.select("vec_id", "embedding").collect(), 5)
    got = {}
    for r in sim.knn_join(emb, 5, nprobe=sim.KMEANS_K).collect():
        got.setdefault(r["vec_id"], []).append(
            (r["rank"], r["neighbor_id"], r["sim"])
        )
    assert set(got) == set(exact)
    for v, lst in got.items():
        lst.sort()
        assert [(nid, s) for _, nid, s in lst] == [
            (nid, pytest.approx(s, abs=1e-9)) for nid, s in exact[v]
        ]


def test_knn_join_blocked_recall_and_shape(spark, sf_dir):
    from torua_spark.operators import similarity as sim
    from torua_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = _exact_knn(emb.select("vec_id", "embedding").collect(), 1)
    rows = sim.knn_join(emb, 5, nprobe=2).collect()
    # shape: no self pairs, ranks are 1..m consecutive per vector
    per = {}
    for r in rows:
        assert r["neighbor_id"] != r["vec_id"]
        per.setdefault(r["vec_id"], []).append(r["rank"])
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # recall@1 vs exact: uniform synthetic embeddings are the blocking
    # WORST case (no cluster structure); nprobe=2 of 16 cells measured
    # 0.426 — pin a conservative floor far above the 0.125 random rate
    got1 = {r["vec_id"]: r["neighbor_id"] for r in rows if r["rank"] == 1}
    hits = sum(1 for v, n in got1.items() if exact[v][0][0] == n)
    assert hits / len(got1) >= 0.30


def test_dedup_doc_lines_semantics(spark):
    from torua_spark.operators import text_analysis as ta

    docs = spark.createDataFrame(
        [
            ("d1", "alpha\nbeta\nalpha\n\n  alpha  \nbeta"),
            ("d2", "alpha\nalpha"),
            ("d3", "solo"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in ta.dedup_doc_lines(docs).collect()}
    # first occurrences survive in place; trim-equal repeats drop;
    # the blank line is structure and always survives
    assert out["d1"]["clean_text"] == "alpha\nbeta\n"
    assert (out["d1"]["n_lines"], out["d1"]["n_removed"]) == (6, 3)
    assert out["d2"]["clean_text"] == "alpha"
    assert out["d3"]["clean_text"] == "solo"
    assert out["d3"]["n_removed"] == 0


def test_dedup_doc_lines_corpus_nonvacuous(spark, sf_dir):
    from pyspark.sql import functions as F

    out = rag_q.QUERIES["text_dedup_doc_lines"](spark, sf_dir)
    removed = out.agg(F.sum("n_removed")).first()[0]
    assert removed > 0


def test_ivf_index_upsert_equals_rebuild(spark, sf_dir, tmp_path):
    """Incrementally upserting new + re-embedded vectors must leave
    the index state equal to the merged relation, with re-homed
    vectors correctly LEAVING their old cell, and the probe path must
    return the same top-k as a fresh query over the updated corpus'
    persisted state."""
    from pyspark.sql import functions as F

    from torua_spark.operators import similarity as sim
    from torua_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    sim.ivf_index_write(emb, path)
    before = {
        r["vec_id"]: r["cell"]
        for r in spark.read.parquet(f"{path}/vectors")
        .select("vec_id", "cell").collect()
    }

    # batch: 5 brand-new vectors + 5 re-embedded existing ones (take
    # another vector's embedding so most re-home to a different cell)
    donors = emb.orderBy("vec_id").limit(20).collect()
    rows = []
    for i in range(5):
        rows.append((1_000_000 + i, donors[i]["embedding"], donors[i]["label"]))
    for i in range(5):
        victim, donor = donors[i], donors[19 - i]
        rows.append((victim["vec_id"], donor["embedding"], donor["label"]))
    batch = spark.createDataFrame(rows, emb.schema)

    report = sim.ivf_index_upsert(spark, path, batch)
    assert report["rows_inserted"] == 10      # purge-first: all inserts
    assert report["rows_updated"] == 0
    assert report["rows_replaced"] == 5       # the 5 existing vec_ids

    after = {
        r["vec_id"]: (r["cell"], tuple(r["embedding"]))
        for r in spark.read.parquet(f"{path}/vectors")
        .select("vec_id", "cell", "embedding").collect()
    }
    # no duplicate vec_ids anywhere in the lake (the stale-twin hazard)
    n_rows = spark.read.parquet(f"{path}/vectors").count()
    assert n_rows == len(after) == len(before) + 5
    # re-embedded vectors carry their new embedding and sit in the
    # cell the SAVED codebook assigns for it
    cents = spark.read.parquet(f"{path}/centroids")
    want_cells = {
        r["vec_id"]: r["cell"]
        for r in sim.assign_cells(batch, cents).collect()
    }
    for vid, _, _ in rows:
        assert after[vid][0] == want_cells[vid]
    # probe parity: top-k from the maintained index == top-k from a
    # fresh index built over the SAME logical corpus with the SAME
    # codebook (write the merged relation back out cell-partitioned)
    q = donors[19]["embedding"]
    got = sim.ivf_index_topk(spark, path, q, k=5).collect()
    rebuilt = str(tmp_path / "rebuilt")
    merged = (
        emb.join(batch.select("vec_id"), "vec_id", "left_anti")
        .unionByName(batch)
    )
    merged.join(sim.assign_cells(merged, cents), "vec_id").write.partitionBy(
        "cell"
    ).parquet(f"{rebuilt}/vectors")
    cents.write.parquet(f"{rebuilt}/centroids")
    want = sim.ivf_index_topk(spark, rebuilt, q, k=5).collect()
    assert [(r["vec_id"], r["sim"]) for r in got] == [
        (r["vec_id"], r["sim"]) for r in want
    ]


def test_ivf_index_knn_batch_prunes_and_matches_knn_join(spark, sf_dir, tmp_path):
    """Batch ANN over the persisted index must (a) scan ONLY probed
    cell directories, and (b) for self-queries with the same codebook
    and nprobe, reproduce knn_join's result exactly."""
    from torua_spark.operators import similarity as sim
    from torua_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    sim.ivf_index_write(emb, path)
    cents = spark.read.parquet(f"{path}/centroids")

    queries = emb.orderBy("vec_id").limit(25)
    out = sim.ivf_index_knn_batch(spark, path, queries, k=5, nprobe=2)
    rows = out.collect()

    # (a) partition pruning: inputFiles of the index scan stay within
    # the probed cells
    probed = {
        r["cell"]
        for r in sim.probe_cells(queries, cents, 2).select("cell").distinct().collect()
    }
    nb = spark.read.parquet(f"{path}/vectors").filter(
        __import__("pyspark").sql.functions.col("cell").isin(sorted(probed))
    )
    for f in nb.inputFiles():
        assert any(f"cell={c}/" in f for c in probed), f

    # (b) parity with knn_join restricted to the same query set
    want = {
        (r["vec_id"], r["rank"]): (r["neighbor_id"], r["sim"])
        for r in sim.knn_join(emb, 5, 2, cents=cents).collect()
        if r["vec_id"] in {q["vec_id"] for q in queries.collect()}
    }
    got = {(r["vec_id"], r["rank"]): (r["neighbor_id"], r["sim"]) for r in rows}
    assert got == want


def test_cell_gemm_chunking_is_invisible(spark, sf_dir, monkeypatch):
    """Shrinking the query-chunk size must not change a single output
    row (the chunking is purely a peak-memory bound)."""
    from torua_spark.operators import similarity as sim
    from torua_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = sorted(map(tuple, sim.knn_join(emb, 5, 2).collect()))
    monkeypatch.setattr(sim, "_GEMM_CHUNK", 7)
    chunked = sorted(map(tuple, sim.knn_join(emb, 5, 2).collect()))
    assert base == chunked


def test_bigram_logprob_semantics(spark):
    """Hand-computed add-1 bigram NLL on a two-doc corpus."""
    import math

    from torua_spark.operators import text_analysis as ta

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in ta.bigram_logprob(docs).collect()}
    # pairs: d1: (a,b) (b,a) (a,b); d2: (a,b) (b,c)
    # c12: (a,b)=3 (b,a)=1 (b,c)=1 ; c1: a=3, b=2 ; V=3
    v = 3
    p_ab = (3 + 1) / (3 + v)
    p_ba = (1 + 1) / (2 + v)
    p_bc = (1 + 1) / (2 + v)

    def r4(x):
        return math.floor(x * 10000.0 + 0.5 + 1e-9) / 10000.0

    want1 = r4(-(math.log(p_ab) * 2 + math.log(p_ba)) / 3)
    want2 = r4(-(math.log(p_ab) + math.log(p_bc)) / 2)
    assert (out[1]["n_bigrams"], out[1]["avg_nll"]) == (3, want1)
    assert (out[2]["n_bigrams"], out[2]["avg_nll"]) == (2, want2)
    # fluency ordering: the repeated (a,b) doc is LESS surprising
    assert out[1]["avg_nll"] < out[2]["avg_nll"]


def test_knn_join_auto_k_sizes_cells_by_corpus(spark, sf_dir):
    """kmeans_k='auto' applies the corpus law: 500 vectors / 128 ->
    4 cells; ranks stay a valid top-k and recall@1 vs exact stays
    above the random rate for the coarser codebook."""
    from torua_spark.operators import similarity as sim
    from torua_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    rows = sim.knn_join(emb, 5, nprobe=2, kmeans_k="auto").collect()
    per = {}
    for r in rows:
        per.setdefault(r["vec_id"], []).append(r["rank"])
    assert len(per) == emb.count()
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # 4 cells, probe 2 -> candidates ~half the corpus; recall@1 should
    # beat the fixed-16 config's 0.426 (more candidates per query)
    exact = _exact_knn(emb.select("vec_id", "embedding").collect(), 1)
    got1 = {r["vec_id"]: r["neighbor_id"] for r in rows if r["rank"] == 1}
    hits = sum(1 for v, n in got1.items() if exact[v][0][0] == n)
    assert hits / len(got1) >= 0.5


def test_ivf_index_knn_batch_empty_queries(spark, sf_dir, tmp_path):
    from torua_spark.operators import similarity as sim
    from torua_spark.sources.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    sim.ivf_index_write(emb, path)
    out = sim.ivf_index_knn_batch(spark, path, emb.filter("vec_id < 0"))
    assert out.count() == 0
    assert out.columns == ["vec_id", "neighbor_id", "sim", "rank"]


def test_verified_pairs_string_ids_and_zero_norms(spark):
    """Review findings (r8): (a) non-integer vec_ids (document hashes)
    must take the type-agnostic join path, not crash the int-keyed
    gather; (b) zero-norm embeddings — they collide in EVERY
    hyperplane band — yield NULL sim and are dropped on BOTH verify
    paths, never an ANSI DIVIDE_BY_ZERO abort."""
    from torua_spark.operators import similarity as sim

    # string ids through the cell-blocked path (gather ineligible)
    emb_s = spark.createDataFrame(
        [("a", [1.0, 0.0], 0), ("b", [1.0, 0.001], 0), ("c", [0.0, 1.0], 0)],
        "vec_id string, embedding array<double>, cell int",
    )
    got = {
        (r.vec_a, r.vec_b)
        for r in sim.embedding_near_dup_pairs(
            emb_s, 0.9, cell_col="cell"
        ).collect()
    }
    assert got == {("a", "b")}
    # zero-norm vectors below the gather cap: dropped, no exception
    # (dim 64 — the hyperplane matrix's corpus dimension)
    z = [0.0] * 64
    u = [1.0] + [0.0] * 63
    v = [1.0, 0.01] + [0.0] * 62
    emb_z = spark.createDataFrame(
        [(0, z), (1, z), (2, u), (3, v)],
        "vec_id long, embedding array<double>",
    )
    got_z = {
        (r.vec_a, r.vec_b)
        for r in sim.embedding_near_dup_pairs(emb_z, 0.9).collect()
    }
    assert got_z == {(2, 3)}
    # and above the cap (forced join path): same result, no abort
    import torua_spark.operators.similarity as simmod

    saved = simmod.PAIR_VERIFY_GATHER_ELEMS
    simmod.PAIR_VERIFY_GATHER_ELEMS = 0
    try:
        got_j = {
            (r.vec_a, r.vec_b)
            for r in sim.embedding_near_dup_pairs(emb_z, 0.9).collect()
        }
    finally:
        simmod.PAIR_VERIFY_GATHER_ELEMS = saved
    assert got_j == {(2, 3)}


def test_exact_substring_dedup_semantics(spark):
    """ExactSubstr on a hand-built corpus (k=4): a repeated 4-token
    passage survives ONLY at its corpus-first (min doc, pos)
    occurrence; overlapping duplicate windows merge into one span;
    shorter-than-k repeats are untouched; a fully-duplicated doc
    empties."""
    from torua_spark.operators.dedup import (
        exact_substring_dedup,
        exact_substring_spans,
    )

    boiler = "all rights reserved worldwide"  # 4 tokens
    docs = spark.createDataFrame(
        [
            # doc 0: first occurrence of the passage — kept
            (0, f"alpha beta {boiler} gamma"),
            # doc 1: same passage later — removed; 'alpha beta' (2 <
            # k) repeats but is too short to count
            (1, f"alpha beta delta {boiler}"),
            # doc 2: the passage plus one extra shared token on each
            # side of a second copy -> overlapping windows, one span
            (2, f"x {boiler} {boiler} y"),
            # doc 3: IS the passage exactly — fully emptied
            (3, boiler),
            # doc 4: no repeats at all
            (4, "entirely unique text here today"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_tokens_removed)
        for r in exact_substring_dedup(docs, k=4).collect()
    }
    assert out[0] == (f"alpha beta {boiler} gamma", 7, 0)
    assert out[1] == ("alpha beta delta", 7, 4)
    assert out[2] == ("x y", 10, 8)
    assert out[3] == ("", 4, 4)
    assert out[4] == ("entirely unique text here today", 5, 0)
    # span view: doc 2's two overlapping copies merged to ONE span
    spans = {
        (r.doc_id, r.start, r.end)
        for r in exact_substring_spans(docs, k=4).collect()
    }
    assert (2, 1, 9) in spans and (3, 0, 4) in spans
    assert not any(d == 0 for d, _, _ in spans)  # first copy untouched


def test_exact_substring_dedup_corpus_nonvacuous(spark, sf_dir):
    """On the synthetic corpus the operator must actually fire (the
    boilerplate generator repeats passages) and never grow a doc."""
    from torua_spark.operators.dedup import exact_substring_dedup
    from torua_spark.sources.catalog import load_table

    out = exact_substring_dedup(
        load_table(spark, sf_dir, "documents"), k=10
    )
    from pyspark.sql import functions as F

    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("n_tokens_removed") > 0).cast("int")).alias("touched"),
        F.min("n_tokens_removed").alias("mn"),
    ).collect()[0]
    assert agg["n"] > 0 and agg["touched"] > 0 and agg["mn"] >= 0


def test_incremental_exact_substring_equals_from_scratch(spark, sf_dir, tmp_path):
    """The incremental twin == the from-scratch run restricted to the
    batch, when batch ids sort after indexed ids (monotone ingest
    keys) — on a hand fixture covering all three duplicate classes
    (vs-index, batch-internal, none) AND on the synthetic corpus."""
    from pyspark.sql import functions as F

    from torua_spark.operators.dedup import (
        exact_substring_dedup,
        exact_substring_index_write,
        incremental_exact_substring_dedup,
    )
    from torua_spark.sources.catalog import load_table

    boiler = "terms of service apply"
    base = spark.createDataFrame(
        [(0, f"intro {boiler} outro"), (1, "some other base text")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, f"new doc {boiler} tail"),       # dup vs index
            (11, "fresh phrase appears twice ok"),  # batch-first copy
            (12, "fresh phrase appears twice ok"),  # batch-internal dup
            (13, "wholly unique content here"),     # untouched
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "widx")
    exact_substring_index_write(base, idx, k=4)
    inc = {
        r.doc_id: (r.clean_text, r.n_tokens_removed)
        for r in incremental_exact_substring_dedup(
            spark, idx, batch, k=4
        ).collect()
    }
    scratch = {
        r.doc_id: (r.clean_text, r.n_tokens_removed)
        for r in exact_substring_dedup(base.unionByName(batch), k=4)
        .filter(F.col("doc_id") >= 10)
        .collect()
    }
    assert inc == scratch
    assert inc[10] == ("new doc tail", 4)
    assert inc[11][1] == 0 and inc[12][1] > 0
    assert inc[13] == ("wholly unique content here", 0)
    # corpus: same equivalence at sf0.001 with the declared split
    docs = load_table(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    t = (int(max_id) + 1) * 4 // 5
    idx2 = str(tmp_path / "widx2")
    exact_substring_index_write(docs.filter(F.col("doc_id") < t), idx2, k=10)
    inc2 = sorted(
        map(
            tuple,
            incremental_exact_substring_dedup(
                spark, idx2, docs.filter(F.col("doc_id") >= t), k=10
            ).collect(),
        )
    )
    scratch2 = sorted(
        map(
            tuple,
            exact_substring_dedup(docs, k=10)
            .filter(F.col("doc_id") >= t)
            .collect(),
        )
    )
    assert inc2 == scratch2 and len(inc2) > 0


def test_exact_substring_guards(spark, tmp_path):
    """The loud-failure guards from the r8 review: string ids are
    rejected up front (a packed key would be NULL/raise mid-shuffle);
    a k-mismatched index probe raises; a batch id at or below the max
    indexed id violates the monotone-ingest precondition."""
    import pytest as _pytest

    from torua_spark.operators.dedup import (
        exact_substring_dedup,
        exact_substring_index_write,
        incremental_exact_substring_dedup,
    )

    sdocs = spark.createDataFrame(
        [("a", "x y z w"), ("b", "x y z w")], "doc_id string, text string"
    )
    with _pytest.raises(ValueError, match="integral"):
        exact_substring_dedup(sdocs, k=4)

    docs = spark.createDataFrame(
        [(0, "one two three four five"), (1, "six seven eight nine ten")],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "gidx")
    exact_substring_index_write(docs, idx, k=4)
    batch_hi = spark.createDataFrame(
        [(5, "one two three four extra")], "doc_id long, text string"
    )
    with _pytest.raises(ValueError, match="k=4"):
        incremental_exact_substring_dedup(spark, idx, batch_hi, k=5)
    batch_lo = spark.createDataFrame(
        [(1, "re-ingested low id text here")], "doc_id long, text string"
    )
    with _pytest.raises(ValueError, match="monotone"):
        incremental_exact_substring_dedup(spark, idx, batch_lo, k=4)
    # the valid shape still runs
    out = incremental_exact_substring_dedup(spark, idx, batch_hi, k=4)
    assert out.count() == 1


def test_exact_substring_meta_corruption_is_loud(spark, tmp_path):
    """r8 review hole: ONLY a missing _meta sidecar may skip the
    monotone-key validation (pre-meta index contract). A corrupt
    sidecar must raise, not silently disable the guard."""
    import shutil

    import pytest as _pytest

    from torua_spark.operators.dedup import (
        exact_substring_index_write,
        incremental_exact_substring_dedup,
    )

    docs = spark.createDataFrame(
        [(0, "one two three four five")], "doc_id long, text string"
    )
    idx = str(tmp_path / "cidx")
    exact_substring_index_write(docs, idx, k=4)
    batch = spark.createDataFrame(
        [(7, "one two three four extra")], "doc_id long, text string"
    )
    # corrupt sidecar: _meta exists but holds garbage bytes -> loud
    shutil.rmtree(f"{idx}/_meta")
    (tmp_path / "cidx" / "_meta").mkdir()
    (tmp_path / "cidx" / "_meta" / "part-0.parquet").write_bytes(
        b"not a parquet file"
    )
    with _pytest.raises(Exception) as exc:
        incremental_exact_substring_dedup(spark, idx, batch, k=4)
    assert "PATH_NOT_FOUND" not in str(exc.value)
    # missing sidecar: the documented pre-meta contract still skips
    shutil.rmtree(f"{idx}/_meta")
    assert incremental_exact_substring_dedup(spark, idx, batch, k=4).count() == 1


def test_exact_substring_oversized_id_is_loud(spark):
    """r8 review hole: |id| >= 2^43 would overflow the packed 64-bit
    first-occurrence key (silent mis-ranking under non-ANSI); the
    row-level guard raises with a remap message instead."""
    import pytest as _pytest

    from torua_spark.operators.dedup import exact_substring_dedup

    docs = spark.createDataFrame(
        [(1 << 43, "one two three four five")], "doc_id long, text string"
    )
    with _pytest.raises(Exception, match="overflow|surrogate"):
        exact_substring_dedup(docs, k=4).collect()
    # Long.MIN_VALUE: abs() would overflow back negative and slip an
    # abs-based guard (r9 review) — the comparison form stays loud
    docs_min = spark.createDataFrame(
        [(-(1 << 63), "one two three four five")], "doc_id long, text string"
    )
    with _pytest.raises(Exception, match="overflow|surrogate"):
        exact_substring_dedup(docs_min, k=4).collect()


def test_decontaminate_embeddings_rejects_string_ids(spark):
    """String/UUID ids fail the int64 gather contract with the remap
    message, not a cryptic numpy cast error (r9 review)."""
    import pytest as _pytest

    from torua_spark.operators import similarity as sim

    e = [0.0, 1.0]
    good = spark.createDataFrame([(1, e)], "vec_id long, embedding array<double>")
    bad = spark.createDataFrame([("a", e)], "vec_id string, embedding array<double>")
    with _pytest.raises(ValueError, match="integral"):
        sim.decontaminate_embeddings(bad, good, 0.5)
    with _pytest.raises(ValueError, match="integral"):
        sim.decontaminate_embeddings(good, bad, 0.5)


def test_exact_substring_spans_exact_for_threshold_k(spark):
    """VERDICT r8 stretch, resolved by PROOF instead of construction:
    the union-of-repeated-k-windows form is EXACT for the >= k
    threshold at token granularity — a position is covered iff it
    lies inside some repeated substring of length >= k (suffix-array
    semantics, Lee et al. 2021 §4), minus the corpus-first copy. The
    suggested k-doubling union (windows at k, 2k, 4k...) is therefore
    a NO-OP: any repeat of length >= 2k has all its k-subwindows
    repeated, and each subwindow's first occurrence sorts <= the
    2k-window's, so 2k coverage is subsumed by k coverage (verified
    over 3000 random corpora offline; asserted on the Spark output
    below). 30 seeded random corpora, token-prefixed per corpus so
    one Spark pass isolates them, vs a brute-force Python reference."""
    import random

    from torua_spark.operators.dedup import exact_substring_spans

    rng = random.Random(20260815)
    corpora = []
    rows = []
    for c in range(30):
        nd = rng.randint(1, 4)
        docs = [
            (c * 100 + i,
             " ".join(f"c{c}_{rng.choice('ab')}"
                      for _ in range(rng.randint(0, 14))))
            for i in range(nd)
        ]
        corpora.append(docs)
        rows.extend(docs)
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def ref_covered(docs, k):
        wins: dict = {}
        for i, t in docs:
            ts = t.split()
            for s in range(len(ts) - k + 1):
                wins.setdefault(tuple(ts[s:s + k]), []).append((i, s))
        cov = {i: set() for i, _ in docs}
        for occs in wins.values():
            if len(occs) >= 2:
                first = min(occs)
                for (i, s) in occs:
                    if (i, s) != first:
                        cov[i].update(range(s, s + k))
        return cov

    spark_cov = {}
    for k in (2, 3, 4):
        got: dict = {}
        for r in exact_substring_spans(df, k).collect():
            got.setdefault(r.doc_id, set()).update(range(r.start, r.end))
        spark_cov[k] = got
        for docs in corpora:
            want = ref_covered(docs, k)
            for i, _ in docs:
                assert got.get(i, set()) == want[i], (k, i)
    # k-doubling subsumption on the Spark output itself: every
    # 2k-covered position is k-covered, so unioning is a no-op
    for k in (2,):
        for i, cov2k in spark_cov[2 * k].items():
            assert cov2k <= spark_cov[k].get(i, set()), i


def test_decontaminate_embeddings_vs_reference(spark):
    """decontaminate_embeddings == brute-force numpy best-match on
    synthetic vectors, including the hostile rows: a zero-norm train
    vector and a zero-norm eval vector are never flagged and never
    selected, a NULL embedding likewise, and rounded-sim ties break
    to the smallest eval_id."""
    import numpy as np

    from torua_spark.operators import similarity as sim

    rng = np.random.default_rng(11)
    dim = 8
    ev = [(100, list(map(float, rng.normal(size=dim)))),
          (101, list(map(float, rng.normal(size=dim)))),
          (102, [0.0] * dim)]          # zero-norm eval: never selected
    # train: 0 = exact copy of eval 101 (sim 1.0), 1 = its negation,
    # 2 = zero-norm, 3 = NULL, 4 = random, 5 = copy of eval 100
    tr = [(0, ev[1][1]), (1, [-x for x in ev[1][1]]), (2, [0.0] * dim),
          (3, None), (4, list(map(float, rng.normal(size=dim)))),
          (5, ev[0][1])]
    train = spark.createDataFrame(tr, "vec_id long, embedding array<double>")
    eval_df = spark.createDataFrame(ev, "vec_id long, embedding array<double>")
    got = {
        r.train_id: (r.eval_id, r.sim)
        for r in sim.decontaminate_embeddings(train, eval_df, 0.9).collect()
    }
    assert got == {0: (101, 1.0), 5: (100, 1.0)}
    # tie-break: two identical eval vectors -> smallest eval_id wins
    eval_tie = spark.createDataFrame(
        [(7, ev[0][1]), (6, ev[0][1])], "vec_id long, embedding array<double>"
    )
    tied = {
        r.train_id: r.eval_id
        for r in sim.decontaminate_embeddings(train, eval_tie, 0.9).collect()
    }
    assert tied == {5: 6}
    # the over-budget guard is loud
    import pytest as _pytest

    old = sim.DECON_EVAL_GATHER_ELEMS
    sim.DECON_EVAL_GATHER_ELEMS = 4
    try:
        with _pytest.raises(ValueError, match="broadcast budget"):
            sim.decontaminate_embeddings(train, eval_df, 0.9)
    finally:
        sim.DECON_EVAL_GATHER_ELEMS = old


def test_decontaminate_embeddings_randomized_vs_numpy(spark):
    """Randomized parity: on seeded gaussian corpora (with planted
    near-copies so matches exist), decontaminate_embeddings equals
    the full numpy brute force — same round4, same argmax tie-break."""
    import numpy as np

    from torua_spark.operators import similarity as sim

    def r4(a):
        return np.floor(a * 1e4 + 0.5 + 1e-9) / 1e4

    for seed in (3, 17, 99):
        rng = np.random.default_rng(seed)
        dim, n_tr, n_ev = 12, 40, 7
        ev = rng.normal(size=(n_ev, dim))
        tr = rng.normal(size=(n_tr, dim))
        # plant near-copies: train rows 0..4 = noisy eval rows
        for i in range(5):
            tr[i] = ev[i % n_ev] + rng.normal(scale=0.05, size=dim)
        thresh = 0.6
        sims = r4(
            (tr @ ev.T)
            / (np.linalg.norm(tr, axis=1)[:, None]
               * np.linalg.norm(ev, axis=1)[None, :])
        )
        j = np.argmax(sims, axis=1)
        best = sims[np.arange(n_tr), j]
        want = {
            int(i): (int(j[i]) + 1000, float(best[i]))
            for i in range(n_tr) if best[i] >= thresh
        }
        train = spark.createDataFrame(
            [(i, [float(x) for x in tr[i]]) for i in range(n_tr)],
            "vec_id long, embedding array<double>",
        )
        eval_df = spark.createDataFrame(
            [(i + 1000, [float(x) for x in ev[i]]) for i in range(n_ev)],
            "vec_id long, embedding array<double>",
        )
        got = {
            r.train_id: (r.eval_id, r.sim)
            for r in sim.decontaminate_embeddings(train, eval_df, thresh).collect()
        }
        assert len(want) >= 5 and got == want, seed


def test_linear_quality_score_vs_reference(spark):
    """linear_quality_score == a plain-Python reference scorer on the
    same md5 hashed features (independent of the SQL oracle): bucket,
    sign, L2 norm, dot, sigmoid, all hand-computed; an empty doc gets
    the prior sigmoid(bias); keep flips on the rounded quality."""
    import hashlib
    import math

    from torua_spark.operators import text_analysis as ta

    docs = [(0, "red fox red fox jumps"), (1, "slow brown dog"), (2, "")]
    weights = {b: (b % 7 - 3) / 3.0 for b in range(64)}
    bias = 0.2

    def md5_32(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16)

    def r4(x):
        return math.floor(x * 1e4 + 0.5 + 1e-9) / 1e4

    want = {}
    for doc_id, text in docs:
        acc: dict[int, float] = {}
        for t in text.split(" ") if text else [""]:
            h = md5_32(t)
            sgn = 1.0 if (h // 64) % 2 == 0 else -1.0
            acc[h % 64] = acc.get(h % 64, 0.0) + sgn
        nz = {b: s for b, s in acc.items() if s != 0}
        nrm = math.sqrt(sum(s * s for s in nz.values()))
        dot = sum(r4(s / nrm) * weights[b] for b, s in nz.items()) if nz else 0.0
        logit = dot + bias
        q = 1.0 / (1.0 + math.exp(-logit))
        want[doc_id] = (r4(logit), r4(q), r4(q) >= 0.5)

    # the empty doc tokenizes to [''] whose hash still lands somewhere:
    # mirror Spark's split('', ' ') == [''] semantics in the reference
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.logit, r.quality, r.keep)
        for r in ta.linear_quality_score(df, weights, bias).collect()
    }
    assert got == want


def test_mutual_knn_clusters_vs_union_find(spark, sf_dir):
    """mutual_knn_clusters == union-find over the mutual edge set of
    the (already oracled) knn_join, with min-vertex-id labels and
    singletons under their own id — the mutuality filter, the CC
    fixpoint, and the singleton completion checked independently of
    the SQL oracle."""
    from torua_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = {
        (r.vec_id, r.neighbor_id)
        for r in sim.knn_join(emb, sim.KNN_K, sim.KNN_NPROBE)
        .select("vec_id", "neighbor_id")
        .collect()
    }
    mutual = {(a, b) for a, b in pairs if (b, a) in pairs and a < b}
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in mutual:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    n = emb.count()
    want = {v: min(find(v), v) if v in parent else v for v in range(n)}
    # min-id labeling: re-resolve to the component minimum
    comp_min: dict[int, int] = {}
    for v in range(n):
        r = find(v) if v in parent else v
        comp_min[r] = min(comp_min.get(r, v), v)
    want = {v: comp_min[find(v) if v in parent else v] for v in range(n)}
    got = {
        r.vec_id: r.cluster
        for r in sim.mutual_knn_clusters(emb).collect()
    }
    assert got == want
    assert len(got) == n  # every vector labeled, singletons included


def test_ivf_index_append_equals_from_scratch(spark, sf_dir, tmp_path):
    """Frozen-codebook equivalence: appending a batch into a persisted
    IVF index yields byte-identical probe results to a from-scratch
    index built with the SAME centroids over base ∪ batch — plus the
    loud guards (stale/duplicate ids, corrupt _meta)."""
    import shutil

    import pytest as _pytest
    from pyspark.sql import functions as F

    from torua_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cut = int(emb.count() * 0.8)
    base = emb.filter(F.col("vec_id") < cut)
    batch = emb.filter(F.col("vec_id") >= cut)
    p_inc = str(tmp_path / "inc")
    sim.ivf_index_write(base, p_inc)
    report = sim.ivf_index_append(spark, p_inc, batch)
    assert report["appended"] == batch.count()
    # from-scratch twin with the SAME frozen centroids
    cents = spark.read.parquet(f"{p_inc}/centroids")
    p_full = str(tmp_path / "full")
    (
        emb.join(sim.assign_cells(emb, cents), "vec_id")
        .write.partitionBy("cell").parquet(f"{p_full}/vectors")
    )
    cents.write.parquet(f"{p_full}/centroids")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    q = [float(x) for x in q]
    got = sorted(map(tuple, sim.ivf_index_topk(spark, p_inc, q, 10, 3).collect()))
    want = sorted(map(tuple, sim.ivf_index_topk(spark, p_full, q, 10, 3).collect()))
    assert got == want and len(got) == 10
    # batch rows actually landed and are probe-visible
    n_union = spark.read.parquet(f"{p_inc}/vectors").count()
    assert n_union == emb.count()
    # fresh-ids guard: re-appending the same batch is loud
    with _pytest.raises(ValueError, match="fresh-ids"):
        sim.ivf_index_append(spark, p_inc, batch)
    # corrupt _meta is loud (missing _meta keeps the pre-meta contract)
    shutil.rmtree(f"{p_inc}/_meta")
    (tmp_path / "inc" / "_meta").mkdir()
    (tmp_path / "inc" / "_meta" / "part-0.parquet").write_bytes(b"junk")
    nxt = spark.createDataFrame(
        [(emb.count() + 5, q)], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(Exception) as exc:
        sim.ivf_index_append(spark, p_inc, nxt)
    assert "PATH_NOT_FOUND" not in str(exc.value)
    shutil.rmtree(f"{p_inc}/_meta")
    assert sim.ivf_index_append(spark, p_inc, nxt)["appended"] == 1


def test_ivf_index_compact_preserves_content_and_heals(spark, sf_dir, tmp_path):
    """Compaction: file count drops to one per cell, content and probe
    results are byte-identical, probes still partition-prune, and
    every crash point of the two-rename swap self-heals (roll forward
    with tmp, roll back with only trash, drop leftovers when live)."""
    import os
    import pathlib
    import shutil

    from pyspark.sql import functions as F

    from torua_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cut = int(emb.count() * 0.8)
    path = str(tmp_path / "ivf")
    sim.ivf_index_write(emb.filter(F.col("vec_id") < cut), path)
    sim.ivf_index_append(spark, path, emb.filter(F.col("vec_id") >= cut))
    before = sorted(
        map(tuple, spark.read.parquet(f"{path}/vectors")
            .select("vec_id", "cell").collect())
    )
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    q = [float(x) for x in q]
    probe_before = sorted(map(tuple, sim.ivf_index_topk(spark, path, q, 10, 3).collect()))
    rep = sim.ivf_index_compact(spark, path)
    cells = len(list(pathlib.Path(f"{path}/vectors").glob("cell=*")))
    assert rep["files_after"] == cells <= rep["files_before"]
    after = sorted(
        map(tuple, spark.read.parquet(f"{path}/vectors")
            .select("vec_id", "cell").collect())
    )
    assert after == before
    assert sorted(map(tuple, sim.ivf_index_topk(spark, path, q, 10, 3).collect())) == probe_before
    # crash healing — (a) mid-write: live intact, stray tmp dropped
    os.makedirs(f"{path}/.compact_tmp_vectors/cell=0", exist_ok=True)
    assert sim.ivf_compact_recover(path) == "dropped_tmp"
    assert not os.path.exists(f"{path}/.compact_tmp_vectors")
    # (b) between the renames: live absent, tmp complete -> forward
    os.rename(f"{path}/vectors", f"{path}/.compact_tmp_vectors")
    os.makedirs(f"{path}/.compact_trash_vectors", exist_ok=True)
    assert sim.ivf_compact_recover(path) == "rolled_forward"
    assert sorted(
        map(tuple, spark.read.parquet(f"{path}/vectors")
            .select("vec_id", "cell").collect())
    ) == before
    # (c) crash mid-write after trash rename never happens (trash only
    # exists once live was renamed away) — but a lone trash rolls back
    os.rename(f"{path}/vectors", f"{path}/.compact_trash_vectors")
    assert sim.ivf_compact_recover(path) == "rolled_back"
    assert sorted(
        map(tuple, spark.read.parquet(f"{path}/vectors")
            .select("vec_id", "cell").collect())
    ) == before
    # a compact run after any heal converges to the same content
    sim.ivf_index_compact(spark, path)
    assert sorted(
        map(tuple, spark.read.parquet(f"{path}/vectors")
            .select("vec_id", "cell").collect())
    ) == before


def test_ivf_append_journal_detects_and_heals_crashes(spark, sf_dir, tmp_path):
    """r10 append-journal contract: a crash at ANY point of the append
    protocol (journal -> _meta -> vectors -> journal clear) is (a)
    DETECTED — every probe/maintenance path raises while the marker is
    present, instead of silently serving an index that omits the batch
    (the r9 advice hole) — and (b) HEALED by ivf_append_recover back to
    exactly the pre- or post-append state, never a mix."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from torua_spark.operators import similarity as sim
    from torua_spark.sources.local import local_df

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cut = int(emb.count() * 0.8)
    base = emb.filter(F.col("vec_id") < cut)
    batch = emb.filter(F.col("vec_id") >= cut)
    path = str(tmp_path / "ivf")
    sim.ivf_index_write(base, path)
    old_max = base.agg(F.max("vec_id")).collect()[0][0]
    batch_max = batch.agg(F.max("vec_id")).collect()[0][0]
    batch_count = batch.count()
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    q = [float(x) for x in q]
    base_rows = sorted(
        map(tuple, spark.read.parquet(f"{path}/vectors")
            .select("vec_id", "cell").collect())
    )
    base_probe = sorted(
        map(tuple, sim.ivf_index_topk(spark, path, q, 10, 3).collect())
    )
    jdir = f"{path}/{sim._APPEND_JOURNAL}"

    def write_journal():
        local_df(
            spark, [(batch_max, batch_count, old_max)],
            "batch_max long, batch_count long, old_max long",
        ).coalesce(1).write.mode("overwrite").parquet(jdir)

    def write_meta(v):
        local_df(spark, [(v,)], "max_id long").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{path}/_meta")

    # (a) crash right after the journal write: probes + upsert raise
    write_journal()
    for op in (
        lambda: sim.ivf_index_topk(spark, path, q, 10, 3),
        lambda: sim.ivf_index_knn_batch(
            spark, path, batch.limit(1), sim.KNN_K, sim.KNN_NPROBE
        ),
        lambda: sim.ivf_index_upsert(spark, path, batch.limit(1)),
    ):
        with _pytest.raises(ValueError, match="unfinished append"):
            op()
    assert sim.ivf_append_recover(spark, path) == "rolled_back"
    assert sim.ivf_append_recover(spark, path) is None  # idempotent
    assert sorted(
        map(tuple, sim.ivf_index_topk(spark, path, q, 10, 3).collect())
    ) == base_probe

    # (b) crash after the _meta advance, before any vector lands:
    # heal rolls _meta back so the retry append is NOT fresh-ids-blocked
    write_journal()
    write_meta(batch_max)
    assert sim.ivf_append_recover(spark, path) == "rolled_back"
    from torua_spark.sources.io import read_meta_sidecar

    assert read_meta_sidecar(spark, path)[0]["max_id"] == old_max

    # (c) crash mid-append (partial multi-file write): heal rewrites
    # the tree WITHOUT the partial rows and restores the watermark
    write_journal()
    write_meta(batch_max)
    cents = spark.read.parquet(f"{path}/centroids")
    half = batch.limit(int(batch_count // 2))
    (
        half.join(sim.assign_cells(half, cents), "vec_id")
        .write.mode("append").partitionBy("cell")
        .parquet(f"{path}/vectors")
    )
    assert sim.ivf_append_recover(spark, path) == "rolled_back_partial"
    assert sorted(
        map(tuple, spark.read.parquet(f"{path}/vectors")
            .select("vec_id", "cell").collect())
    ) == base_rows
    assert read_meta_sidecar(spark, path)[0]["max_id"] == old_max

    # (d) crash after the vectors landed, before the journal clear:
    # heal recognizes completion and keeps the batch
    write_journal()
    write_meta(batch_max)
    (
        batch.join(sim.assign_cells(batch, cents), "vec_id")
        .write.mode("append").partitionBy("cell")
        .parquet(f"{path}/vectors")
    )
    assert sim.ivf_append_recover(spark, path) == "completed"
    assert spark.read.parquet(f"{path}/vectors").count() == emb.count()
    assert read_meta_sidecar(spark, path)[0]["max_id"] == batch_max

    # (e) a plain append self-heals a pending journal before running
    nxt_id = int(batch_max) + 1
    nxt = spark.createDataFrame(
        [(nxt_id, q)], "vec_id long, embedding array<double>"
    )
    write_journal()  # stale marker from the (already-complete) batch
    assert sim.ivf_index_append(spark, path, nxt)["appended"] == 1
    assert not __import__("os").path.exists(jdir)

    # (f) pre-meta index with an advanced _meta: ambiguous, must raise
    local_df(
        spark, [(nxt_id, 1, None)],
        "batch_max long, batch_count long, old_max long",
    ).coalesce(1).write.mode("overwrite").parquet(jdir)
    with _pytest.raises(ValueError, match="pre-meta"):
        sim.ivf_append_recover(spark, path)
    import shutil as _sh

    _sh.rmtree(jdir)

    # (g) CORRUPT _meta with a journal: the crash landed inside the
    # _meta overwrite — recovery restores from the journal instead of
    # wedging (completed case: the one vector above old_max=batch_max
    # is nxt_id, appended in (e))
    new_max = int(nxt_id)
    local_df(
        spark, [(new_max, 1, int(batch_max))],
        "batch_max long, batch_count long, old_max long",
    ).coalesce(1).write.mode("overwrite").parquet(jdir)
    _sh.rmtree(f"{path}/_meta")
    import pathlib as _pl

    _pl.Path(f"{path}/_meta").mkdir()
    _pl.Path(f"{path}/_meta/part-0.parquet").write_bytes(b"junk")
    assert sim.ivf_append_recover(spark, path) == "completed"
    from torua_spark.sources.io import read_meta_sidecar as _rms

    assert _rms(spark, path)[0]["max_id"] == new_max


def test_substring_index_append_compact_lifecycle(spark, sf_dir, tmp_path):
    """r10 window-hash index life cycle: (1) append equivalence — the
    appended index equals the from-scratch index over base ∪ batch,
    row for row; (2) compaction preserves content exactly and shrinks
    the file count; (3) every crash point of the append journal
    protocol is detected (probes raise) and healed
    (exact_substring_append_recover), mirroring the IVF contract."""
    import pathlib

    import pytest as _pytest
    from pyspark.sql import functions as F

    from torua_spark.operators import dedup as dd
    from torua_spark.sources.catalog import load_table
    from torua_spark.sources.io import read_meta_sidecar
    from torua_spark.sources.local import local_df

    docs = load_table(spark, sf_dir, "documents")
    max_id = int(docs.agg(F.max("doc_id")).collect()[0][0])
    t = (max_id + 1) * 4 // 5
    base = docs.filter(F.col("doc_id") < t)
    batch = docs.filter(F.col("doc_id") >= t)
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    dd.exact_substring_index_write(base, inc, k=10)
    rep = dd.exact_substring_index_append(spark, inc, batch, k=10)
    assert rep["appended_hashes"] > 0
    dd.exact_substring_index_write(docs, full, k=10)
    grams = lambda p: sorted(  # noqa: E731
        map(tuple, spark.read.parquet(f"{p}/grams").collect())
    )
    assert grams(inc) == grams(full)
    assert read_meta_sidecar(spark, inc)[0]["max_id"] == max_id
    # (2) compaction: content identical, files drop to the target
    before = grams(inc)
    n_before = len(list(pathlib.Path(f"{inc}/grams").rglob("*.parquet")))
    crep = dd.exact_substring_index_compact(spark, inc)
    assert crep["files_after"] <= n_before and crep["files_after"] >= 1
    assert grams(inc) == before
    # swap crash healing on the grams tree (shared tree_swap machinery)
    import os

    os.rename(f"{inc}/grams", f"{inc}/.compact_tmp_grams")
    assert dd.exact_substring_compact_recover(inc) == "rolled_forward"
    assert grams(inc) == before

    # (3) append-journal crash points
    old_max = int(base.agg(F.max("doc_id")).collect()[0][0])
    jdir = f"{inc}/{dd._SUBSTR_JOURNAL}"
    watermark = (old_max + 1) << 20
    batch_rows = [r for r in before if r[1] >= watermark]

    def write_journal(n_new):
        local_df(
            spark, [(old_max, n_new, 10, max_id)],
            "old_max long, n_new long, k int, batch_max long",
        ).coalesce(1).write.mode("overwrite").parquet(jdir)

    def write_meta(v):
        local_df(spark, [(v, 10)], "max_id long, k int").coalesce(
            1
        ).write.mode("overwrite").parquet(f"{inc}/_meta")

    # (a) journal present: probe and append-retry paths are loud/healed
    write_journal(len(batch_rows))
    with _pytest.raises(ValueError, match="unfinished append"):
        dd.incremental_exact_substring_dedup(spark, inc, batch, k=10)
    # journal present + batch rows present + meta advanced == the
    # crash-before-clear state: recover says completed, keeps content
    assert dd.exact_substring_append_recover(spark, inc) == "completed"
    assert grams(inc) == before
    # (b) crash after _meta advance, no rows landed: simulate by
    # rolling the tree back to base-only first
    dd.exact_substring_index_write(base, inc, k=10)
    write_journal(len(batch_rows))
    write_meta(max_id)
    assert dd.exact_substring_append_recover(spark, inc) == "rolled_back"
    assert read_meta_sidecar(spark, inc)[0]["max_id"] == old_max
    # (c) partial multi-file append: plant HALF the batch rows
    write_journal(len(batch_rows))
    write_meta(max_id)
    half = batch.filter(F.col("doc_id") < (t + max_id + 1) // 2)
    dd._window_hashes(half, 10, "doc_id", "text").groupBy("h").agg(
        F.min("p").alias("first_p")
    ).join(
        spark.read.parquet(f"{inc}/grams").select("h"), "h", "left_anti"
    ).write.mode("append").parquet(f"{inc}/grams")
    assert (
        dd.exact_substring_append_recover(spark, inc)
        == "rolled_back_partial"
    )
    # healed tree == the pre-append index exactly
    ref = str(tmp_path / "ref_base")
    dd.exact_substring_index_write(base, ref, k=10)
    assert grams(inc) == grams(ref)
    assert read_meta_sidecar(spark, inc)[0]["max_id"] == old_max
    # (d) a plain append self-heals a pending journal, then converges
    write_journal(len(batch_rows))
    dd.exact_substring_index_append(spark, inc, batch, k=10)
    assert grams(inc) == before
    # (d2) CORRUPT _meta with a journal: the crash landed inside the
    # _meta overwrite — recovery restores from the journal's
    # watermarks instead of wedging (completed case: grams hold the
    # full batch, so _meta is re-written at batch_max)
    import pathlib as _pl

    write_journal(len(batch_rows))
    shutil_rm = __import__("shutil").rmtree
    shutil_rm(f"{inc}/_meta")
    _pl.Path(f"{inc}/_meta").mkdir()
    _pl.Path(f"{inc}/_meta/part-0.parquet").write_bytes(b"junk")
    assert dd.exact_substring_append_recover(spark, inc) == "completed"
    assert read_meta_sidecar(spark, inc)[0]["max_id"] == max_id
    assert grams(inc) == before
    # (e) k-mismatch and stale-id guards are loud
    with _pytest.raises(ValueError, match="k="):
        dd.exact_substring_index_append(spark, inc, batch, k=5)
    with _pytest.raises(ValueError, match="monotone"):
        dd.exact_substring_index_append(spark, inc, batch, k=10)


def test_hierarchical_semantic_dedup(spark, sf_dir):
    """r10 stretch (VERDICT r9 #8): two-level k-means behind the
    semantic_dedup API — engaged exactly when the flat-k cap bites,
    fine cells sized ~target, every vector labeled once, and the full
    group-keyed two-level Lloyd hash-checked against the DuckDB
    oracle (both levels unrolled)."""
    from pyspark.sql import functions as F

    from torua_spark.operators import similarity as sim
    from torua_spark.queries import rag_q

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    out = sim.semantic_dedup(
        emb, threshold=0.35, cell_col=None,
        target_cell=rag_q._HIER_TARGET, max_k=rag_q._HIER_K1,
        hierarchical=True,
    ).localCheckpoint(eager=True)
    assert out.count() == n  # every vector labeled exactly once
    # fine cells: packed ids decompose to coarse < k1, sizes near the
    # target (Lloyd imbalance allowed, but nothing corpus-sized)
    stats = out.groupBy("cell").agg(F.count(F.lit(1)).alias("c"))
    rows = stats.collect()
    assert len(rows) > rag_q._HIER_K1  # level 2 actually refined
    assert all(
        r["cell"] // sim._HIER_FINE_STRIDE < rag_q._HIER_K1 for r in rows
    )
    assert max(r["c"] for r in rows) <= 12 * rag_q._HIER_TARGET
    # hash-exact vs the group-keyed two-level Lloyd oracle
    compare(
        sim.semantic_dedup(
            emb, threshold=0.35, cell_col=None,
            target_cell=rag_q._HIER_TARGET, max_k=rag_q._HIER_K1,
            hierarchical=True,
        ),
        rag_q.ORACLE["semantic_dedup_hierarchical"],
        sf_dir,
    )
    # un-engaged cap (k_wanted <= max_k): hierarchical flag is a no-op
    flat = sim.semantic_dedup(
        emb, threshold=0.35, cell_col=None, target_cell=128,
        max_k=sim.SEMANTIC_MAX_K, hierarchical=True,
    )
    flat_ref = sim.semantic_dedup(
        emb, threshold=0.35, cell_col=None, target_cell=128,
        max_k=sim.SEMANTIC_MAX_K,
    )
    assert sorted(map(tuple, flat.collect())) == sorted(
        map(tuple, flat_ref.collect())
    )


def test_index_append_heals_crashed_compaction_first(spark, sf_dir, tmp_path):
    """r10 review (the round's most severe finding): a compaction that
    crashed BETWEEN its two renames leaves no live tree; an append that
    didn't heal first would silently RECREATE the tree with only the
    batch, and the next recover would drop the trash holding the whole
    base corpus. Both index families must roll the swap forward before
    appending — and recovery itself must converge when its own partial
    rollback crashed mid-swap."""
    import os

    from pyspark.sql import functions as F

    from torua_spark.operators import dedup as dd
    from torua_spark.operators import similarity as sim
    from torua_spark.sources.catalog import load_table
    from torua_spark.sources.local import local_df

    # --- IVF family
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cut = int(emb.count() * 0.8)
    base, batch = emb.filter(F.col("vec_id") < cut), emb.filter(
        F.col("vec_id") >= cut
    )
    path = str(tmp_path / "ivf")
    sim.ivf_index_write(base, path)
    # crash point: live renamed away, rewrite complete in tmp
    os.rename(f"{path}/vectors", f"{path}/.compact_tmp_vectors")
    sim.ivf_index_append(spark, path, batch)  # must roll forward first
    assert spark.read.parquet(f"{path}/vectors").count() == emb.count()
    # recovery converges when ITS OWN partial rollback crashed mid-swap:
    # journal present + live tree sitting in tmp
    old_max = int(base.agg(F.max("vec_id")).collect()[0][0])
    local_df(
        spark,
        [(int(emb.agg(F.max("vec_id")).collect()[0][0]), batch.count(),
          old_max)],
        "batch_max long, batch_count long, old_max long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/{sim._APPEND_JOURNAL}"
    )
    os.rename(f"{path}/vectors", f"{path}/.compact_tmp_vectors")
    assert sim.ivf_append_recover(spark, path) == "completed"
    assert spark.read.parquet(f"{path}/vectors").count() == emb.count()

    # --- window-hash family
    docs = load_table(spark, sf_dir, "documents")
    max_id = int(docs.agg(F.max("doc_id")).collect()[0][0])
    t = (max_id + 1) * 4 // 5
    idx = str(tmp_path / "widx")
    dd.exact_substring_index_write(docs.filter(F.col("doc_id") < t), idx, k=10)
    full = str(tmp_path / "wfull")
    dd.exact_substring_index_write(docs, full, k=10)
    os.rename(f"{idx}/grams", f"{idx}/.compact_tmp_grams")
    dd.exact_substring_index_append(
        spark, idx, docs.filter(F.col("doc_id") >= t), k=10
    )
    assert sorted(
        map(tuple, spark.read.parquet(f"{idx}/grams").collect())
    ) == sorted(map(tuple, spark.read.parquet(f"{full}/grams").collect()))


def test_index_rebuild_clears_stale_crash_artifacts(spark, sf_dir, tmp_path):
    """r10 advice (medium): rebuilding an index IN PLACE after a
    crashed append/compaction must clear the stale _append_journal and
    half-swapped .compact_* trees — otherwise probes on the fresh
    index still raise on the dead journal, and running the recover
    'to fix it' compares the NEW index against the OLD journal's
    watermark and can silently truncate the rebuild."""
    import os

    from pyspark.sql import functions as F

    from torua_spark.operators import dedup as dd
    from torua_spark.operators import similarity as sim
    from torua_spark.sources.catalog import load_table
    from torua_spark.sources.local import local_df

    # --- IVF family
    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    sim.ivf_index_write(emb, path)
    q = [float(x) for x in
         emb.filter(F.col("vec_id") == 0).select("embedding")
         .collect()[0][0]]
    want = sorted(
        map(tuple, sim.ivf_index_topk(spark, path, q, 10, 3).collect())
    )
    # plant a stale journal (old_max FAR below the rebuilt corpus:
    # recover against it would classify the rebuild 'partial' and
    # truncate) plus crashed-compaction leftovers
    local_df(
        spark, [(5, 3, 2)],
        "batch_max long, batch_count long, old_max long",
    ).coalesce(1).write.parquet(f"{path}/{sim._APPEND_JOURNAL}")
    os.makedirs(f"{path}/.compact_tmp_vectors", exist_ok=True)
    os.makedirs(f"{path}/.compact_trash_vectors", exist_ok=True)
    sim.ivf_index_write(emb, path)  # rebuild in place
    assert not os.path.exists(f"{path}/{sim._APPEND_JOURNAL}")
    assert not os.path.exists(f"{path}/.compact_tmp_vectors")
    assert not os.path.exists(f"{path}/.compact_trash_vectors")
    assert sim.ivf_append_recover(spark, path) is None  # nothing stale
    got = sorted(
        map(tuple, sim.ivf_index_topk(spark, path, q, 10, 3).collect())
    )
    assert got == want  # probes serve, and serve the full rebuild

    # --- window-hash family
    docs = load_table(spark, sf_dir, "documents")
    idx = str(tmp_path / "widx")
    dd.exact_substring_index_write(docs, idx, k=10)
    want_grams = sorted(
        map(tuple, spark.read.parquet(f"{idx}/grams").collect())
    )
    local_df(
        spark, [(2, 7, 10, 1)],
        "old_max long, n_new long, k int, batch_max long",
    ).coalesce(1).write.parquet(f"{idx}/{dd._SUBSTR_JOURNAL}")
    os.makedirs(f"{idx}/.compact_tmp_grams", exist_ok=True)
    dd.exact_substring_index_write(docs, idx, k=10)
    assert not os.path.exists(f"{idx}/{dd._SUBSTR_JOURNAL}")
    assert not os.path.exists(f"{idx}/.compact_tmp_grams")
    assert dd.exact_substring_append_recover(spark, idx) is None
    assert sorted(
        map(tuple, spark.read.parquet(f"{idx}/grams").collect())
    ) == want_grams


def test_rebuild_failure_before_write_keeps_journal_guard(
        spark, sf_dir, tmp_path, monkeypatch):
    """r11 review (the severity-1 finding): the stale-artifact clear
    must NOT precede the rebuild's first destructive write by the
    long compute — a rebuild that dies during Lloyd (OOM-kill,
    preemption) would otherwise leave the OLD half-appended index
    serving with its journal guard already deleted, the exact silent
    truncation the journal exists to detect. Pin: a failure before
    the data-tree teardown leaves journal AND old data intact, and
    probes still raise."""
    import os

    import pytest as _pt
    from pyspark.sql import functions as F

    from torua_spark.operators import dedup as dd
    from torua_spark.operators import similarity as sim
    from torua_spark.sources.catalog import load_table
    from torua_spark.sources.local import local_df

    # --- IVF family: crash inside kmeans_centroids (the long compute)
    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    sim.ivf_index_write(emb, path)
    local_df(
        spark, [(5, 3, 2)],
        "batch_max long, batch_count long, old_max long",
    ).coalesce(1).write.parquet(f"{path}/{sim._APPEND_JOURNAL}")

    def boom(*a, **k):
        raise MemoryError("simulated mid-Lloyd death")

    monkeypatch.setattr(sim, "kmeans_centroids", boom)
    with _pt.raises(MemoryError):
        sim.ivf_index_write(emb, path)
    assert os.path.exists(f"{path}/{sim._APPEND_JOURNAL}")
    assert os.path.exists(f"{path}/vectors")  # old data untouched
    q = [float(x) for x in
         emb.filter(F.col("vec_id") == 0).select("embedding")
         .collect()[0][0]]
    with _pt.raises(ValueError, match="unfinished append"):
        sim.ivf_index_topk(spark, path, q, 10, 3)

    # --- window-hash family: crash building the window-hash plan
    docs = load_table(spark, sf_dir, "documents")
    idx = str(tmp_path / "widx")
    dd.exact_substring_index_write(docs, idx, k=10)
    local_df(
        spark, [(2, 7, 10, 1)],
        "old_max long, n_new long, k int, batch_max long",
    ).coalesce(1).write.parquet(f"{idx}/{dd._SUBSTR_JOURNAL}")
    monkeypatch.setattr(dd, "_window_hashes", boom)
    with _pt.raises(MemoryError):
        dd.exact_substring_index_write(docs, idx, k=10)
    assert os.path.exists(f"{idx}/{dd._SUBSTR_JOURNAL}")
    assert os.path.exists(f"{idx}/grams")
    with _pt.raises(ValueError, match="unfinished append"):
        dd._require_no_pending_substr_append(spark, idx)


def test_append_recover_restores_missing_meta(spark, sf_dir, tmp_path):
    """r10 advice (medium): _meta overwrite is delete-then-write, so a
    crash between the two leaves _meta MISSING (not corrupt). With an
    empty effective batch (n == batch_count == 0 — a fully-duplicate
    daily batch) the completed branch must still restore _meta from
    the journal, not silently downgrade the index to the pre-meta
    caller-beware contract."""
    import shutil

    from pyspark.sql import functions as F

    from torua_spark.operators import dedup as dd
    from torua_spark.operators import similarity as sim
    from torua_spark.sources.catalog import load_table
    from torua_spark.sources.io import read_meta_sidecar
    from torua_spark.sources.local import local_df

    # --- IVF: empty batch (batch_count=0), crash mid-_meta-overwrite
    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    sim.ivf_index_write(emb, path)
    old_max = int(emb.agg(F.max("vec_id")).collect()[0][0])
    local_df(
        spark, [(old_max, 0, old_max)],
        "batch_max long, batch_count long, old_max long",
    ).coalesce(1).write.parquet(f"{path}/{sim._APPEND_JOURNAL}")
    shutil.rmtree(f"{path}/_meta")  # the delete landed, the write didn't
    assert sim.ivf_append_recover(spark, path) == "completed"
    meta = read_meta_sidecar(spark, path)
    assert meta and meta[0]["max_id"] == old_max  # contract preserved

    # --- window-hash twin (n_new=0, missing _meta)
    docs = load_table(spark, sf_dir, "documents")
    idx = str(tmp_path / "widx")
    dd.exact_substring_index_write(docs, idx, k=10)
    dmax = int(docs.agg(F.max("doc_id")).collect()[0][0])
    local_df(
        spark, [(dmax, 0, 10, dmax)],
        "old_max long, n_new long, k int, batch_max long",
    ).coalesce(1).write.parquet(f"{idx}/{dd._SUBSTR_JOURNAL}")
    shutil.rmtree(f"{idx}/_meta")
    assert dd.exact_substring_append_recover(spark, idx) == "completed"
    meta = read_meta_sidecar(spark, idx)
    assert meta and meta[0]["max_id"] == dmax and meta[0]["k"] == 10


def test_legacy_root_layout_raises_informatively(spark, sf_dir, tmp_path):
    """r10 advice (low): an index persisted by the pre-r10
    exact_substring_index_write (gram rows at the index ROOT, no
    grams/ subtree) must fail with a message naming the breaking
    layout change, not a bare PATH_NOT_FOUND."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from torua_spark.operators import dedup as dd
    from torua_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    legacy = str(tmp_path / "legacy_idx")
    # simulate the pre-r10 layout: data parquet at the root
    dd._window_hashes(docs, 10, "doc_id", "text").groupBy("h").agg(
        F.min("p").alias("first_p")
    ).write.parquet(legacy)
    for op in (
        lambda: dd.incremental_exact_substring_dedup(
            spark, legacy, docs.limit(5), k=10
        ),
        lambda: dd.exact_substring_index_append(
            spark, legacy, docs.limit(5), k=10
        ),
        lambda: dd.exact_substring_index_compact(spark, legacy),
    ):
        with _pytest.raises(ValueError, match="pre-r10 root-level"):
            op()


def test_image_plant_offset_guard_raises_on_collision(spark):
    """r10 advice (low): a corpus whose doc_id reaches the plant
    offset (10M) would silently collide with planted rows — the media
    builder now carries a row-level loud guard."""
    import pytest as _pytest

    from torua_spark.queries.rag_q import _IMG_ORIG_OFFSET
    from torua_spark.queries import rag_q
    from torua_spark.sources.local import local_df

    docs = local_df(
        spark,
        [(_IMG_ORIG_OFFSET + 1, "colliding doc text", "web")],
        "doc_id long, text string, source string",
    )
    with _pytest.raises(Exception, match="collide"):
        rag_q.image_media_with_plants(docs).collect()
