"""Sampling / split / sequence-packing invariants (pipeline_q)."""

from pyspark.sql import Window, functions as F

from torua_spark.operators import sampling as smp
from torua_spark.queries import pipeline_q
from torua_spark.sources.catalog import load_table


def test_stratified_sample_is_deterministic_and_on_rate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = pipeline_q.q_sample_stratified(spark, sf_dir).collect()
    b = pipeline_q.q_sample_stratified(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    got = {}
    for r in a:
        got[r["lang"]] = got.get(r["lang"], 0) + 1
    for lang, n in got.items():
        rate = pipeline_q.SAMPLE_RATES.get(lang, pipeline_q.SAMPLE_DEFAULT)
        # md5 is uniform; 3-sigma Bernoulli band around the target rate
        p, tot = rate, totals[lang]
        sigma = (p * (1 - p) / tot) ** 0.5
        assert abs(n / tot - p) < 3.5 * sigma + 0.02, (lang, n, tot, p)


def test_split_fractions_partition_each_language(spark, sf_dir):
    rows = pipeline_q.q_train_test_split(spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        assert abs(sum(r["frac"] for r in rs) - 1.0) < 1e-3, lang
        assert {r["split"] for r in rs} <= {"train", "val", "test"}
        train = next(r for r in rs if r["split"] == "train")
        assert train["frac"] > 0.6, (lang, train["frac"])


def test_exclusive_prefix_sum_matches_global_window(spark, sf_dir):
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.length("text").alias("v")
    )
    got = smp.exclusive_prefix_sum(toks, "doc_id", "v", block=7)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = toks.withColumn("offset", F.coalesce(F.sum("v").over(w), F.lit(0)))
    assert sorted(map(tuple, got.select("doc_id", "offset").collect())) == sorted(
        map(tuple, want.select("doc_id", "offset").collect())
    )


def test_corpus_funnel_is_monotone(spark, sf_dir):
    rows = sorted(
        pipeline_q.q_corpus_funnel(spark, sf_dir).collect(),
        key=lambda r: r["stage"],
    )
    assert [r["stage_name"] for r in rows] == smp.FUNNEL_STAGES
    counts = [r["n_docs"] for r in rows]
    chars = [r["sum_chars"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert chars == sorted(chars, reverse=True)
    assert counts[0] == load_table(spark, sf_dir, "documents").count()


def test_canonical_clusters_cover_pair_vertices(spark, sf_dir):
    from torua_spark.operators import dedup as dd
    from torua_spark.queries import rag_q

    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(docs, rag_q.JACCARD_THRESHOLD).collect()
    in_pairs = {r["doc_a"] for r in pairs} | {r["doc_b"] for r in pairs}
    clusters = rag_q.QUERIES["dedup_cluster_canonical"](spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in clusters) == len(in_pairs)
    assert all(r["n_docs"] >= 2 for r in clusters)
    canon = {r["canonical_doc"] for r in clusters}
    assert canon <= in_pairs


def test_pack_sequences_conserves_docs_and_tokens(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    seqs = pipeline_q.q_pack_sequences(spark, sf_dir).collect()
    n_docs = docs.count()
    total_tok = docs.select(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("t")
    ).collect()[0]["t"]
    assert sum(r["n_docs"] for r in seqs) == n_docs
    assert sum(r["tok_mass"] for r in seqs) == total_tok
    assert all(0 <= r["n_crossing"] <= r["n_docs"] for r in seqs)
    assert max(r["seq_id"] for r in seqs) <= total_tok // smp.PACK_BUDGET


def test_fixed_size_sample_exact_counts(spark, sf_dir):
    rows = pipeline_q.q_sample_fixed_size(spark, sf_dir).collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(r["rank_in_stratum"])
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import functions as F

    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    for lang, ranks in per_lang.items():
        want = min(pipeline_q.FIXED_SAMPLE_N, totals[lang])
        assert sorted(ranks) == list(range(1, want + 1)), lang


def test_curriculum_phases_partition_corpus(spark, sf_dir):
    """Phases tile the corpus: counts sum to |docs|, quality bands are
    ordered and non-overlapping (q_hi of phase i <= q_lo of phase
    i+1 up to 4-dp rounding), and the result matches its oracle."""
    from tests.oracle import compare

    docs = load_table(spark, sf_dir, "documents")
    out = pipeline_q.q_curriculum_phases(spark, sf_dir)
    rows = sorted(out.collect(), key=lambda r: r["phase"])
    assert [r["phase"] for r in rows] == [1, 2, 3, 4]
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for a, b in zip(rows, rows[1:]):
        assert a["q_hi"] <= b["q_lo"] + 1e-9
    compare(out, pipeline_q.ORACLE["curriculum_phases"], sf_dir)


def test_mixture_sample_matches_oracle(spark, sf_dir):
    from tests.oracle import compare

    compare(
        pipeline_q.q_mixture_sample(spark, sf_dir),
        pipeline_q.ORACLE["mixture_sample"], sf_dir,
    )


def test_mixture_sample_semantics(spark, sf_dir):
    """Deterministic; proportions track the weights (3.5-sigma band);
    up-sampled sources repeat documents with contiguous epochs 1..k;
    unweighted sources are absent."""
    docs = load_table(spark, sf_dir, "documents")
    m = smp.mixture_sample(docs, {"src0": 6.0, "src1": 1.0, "src2": 1.0})
    a = sorted(map(tuple, m.collect()))
    assert a == sorted(map(tuple, smp.mixture_sample(
        docs, {"src0": 6.0, "src1": 1.0, "src2": 1.0}).collect()))
    by_src = {}
    epochs = {}
    for doc_id, src, epoch in a:
        by_src[src] = by_src.get(src, 0) + 1
        epochs.setdefault((src, doc_id), []).append(epoch)
    assert set(by_src) == {"src0", "src1", "src2"}
    n_avail = {r[0]: r[1] for r in docs.groupBy("source").count().collect()}
    total = n_avail["src0"] + n_avail["src1"] + n_avail["src2"]
    # src0 rate = total * (6/8) / n_src0 > 1 -> every doc repeats
    rate0 = total * (6.0 / 8.0) / n_avail["src0"]
    assert rate0 > 1
    for (src, doc_id), es in epochs.items():
        assert es == list(range(1, len(es) + 1))  # contiguous epochs
        if src == "src0":
            assert len(es) >= int(rate0)  # floor guaranteed to all
    # expected counts within a Bernoulli band around total * w
    for src, w in (("src0", 0.75), ("src1", 0.125), ("src2", 0.125)):
        expect = total * w
        sd = (n_avail[src] * 0.25) ** 0.5 + 1  # loose bound on the
        assert abs(by_src[src] - expect) < 3.5 * sd + 2, (src, by_src[src], expect)


def test_mixture_sample_by_token_units(spark, sf_dir):
    """by='n_chars': the mix is sized in character units — realized
    per-source char share tracks the weights within a few documents'
    worth of slack (repetition is whole-document)."""
    docs = load_table(spark, sf_dir, "documents")
    weights = {"src0": 3.0, "src1": 1.0}
    m = smp.mixture_sample(docs, weights, by="n_chars")
    chars = {r.doc_id: r.n_chars for r in docs.select("doc_id", "n_chars").collect()}
    got = {}
    for r in m.collect():
        got[r.source] = got.get(r.source, 0) + chars[r.doc_id]
    total = sum(got.values())
    assert abs(got["src0"] / total - 0.75) < 0.08
    assert abs(got["src1"] / total - 0.25) < 0.08


def test_mixture_sample_properties(spark, sf_dir):
    """Property sweep over weight shapes: output only weighted
    sources, epochs contiguous from 1, per-source count within a
    Bernoulli band of total*w, deterministic across invocations."""
    docs = load_table(spark, sf_dir, "documents")
    cases = [
        {"src0": 1.0},
        {"src0": 1.0, "src1": 1.0, "src2": 1.0, "src3": 1.0},
        {"src0": 10.0, "src1": 0.5},
        {"src5": 2.5, "src9": 7.5},
    ]
    n_avail = {r[0]: r[1] for r in docs.groupBy("source").count().collect()}
    for weights in cases:
        rows = sorted(map(tuple, smp.mixture_sample(docs, weights).collect()))
        assert rows == sorted(
            map(tuple, smp.mixture_sample(docs, weights).collect())
        )
        wsum = sum(weights.values())
        total = sum(n_avail[s] for s in weights)
        by_src, epochs = {}, {}
        for doc_id, src, epoch in rows:
            assert src in weights
            by_src[src] = by_src.get(src, 0) + 1
            epochs.setdefault((src, doc_id), []).append(epoch)
        for es in epochs.values():
            assert es == list(range(1, len(es) + 1))
        for s, w in weights.items():
            expect = total * w / wsum
            sd = (n_avail[s] * 0.25) ** 0.5 + 1
            assert abs(by_src.get(s, 0) - expect) < 3.5 * sd + 2, (
                weights, s, by_src.get(s), expect
            )


def test_source_cap_matches_oracle(spark, sf_dir):
    from tests.oracle import compare

    compare(
        pipeline_q.q_source_cap(spark, sf_dir),
        pipeline_q.ORACLE["source_cap"], sf_dir,
    )


def test_source_cap_semantics(spark, sf_dir):
    """At most cap per source; survivors are the LONGEST docs (every
    kept doc >= every dropped doc of its source, doc_id tie-break)."""
    docs = load_table(spark, sf_dir, "documents")
    kept = smp.source_cap(docs, 5)
    kept_rows = kept.collect()
    per_src = {}
    for r in kept_rows:
        per_src.setdefault(r.source, []).append((r.n_chars, r.doc_id))
    assert all(len(v) <= 5 for v in per_src.values())
    all_rows = docs.collect()
    for src, kept_v in per_src.items():
        dropped = [
            (r.n_chars, r.doc_id) for r in all_rows
            if r.source == src and (r.n_chars, r.doc_id) not in set(kept_v)
        ]
        if dropped:
            # rank order: kept (-chars, id) keys all precede dropped
            worst_kept = max((-c, i) for c, i in kept_v)
            best_dropped = min((-c, i) for c, i in dropped)
            assert worst_kept < best_dropped


def test_mixture_sample_rejects_bad_weights(spark, sf_dir):
    import pytest

    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="positive"):
        smp.mixture_sample(docs, {})
    with pytest.raises(ValueError, match="positive"):
        smp.mixture_sample(docs, {"src0": 1.0, "src1": 0.0})
    with pytest.raises(ValueError, match="positive"):
        smp.mixture_sample(docs, {"src0": -2.0})


def test_weighted_sample_aes_properties(spark):
    import pytest
    from pyspark.sql import functions as F

    from torua_spark.operators import sampling as smp

    # 200 light rows (w=1) vs 200 heavy rows (w=50): the heavy half
    # must dominate a 100-draw sample (A-ES bias toward weight), and
    # the draw is a permutation prefix: ranks 1..n, keys non-increasing
    rows = [(i, 1) for i in range(200)] + [(i, 50) for i in range(200, 400)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = smp.weighted_sample(df, "w", 100).collect()
    assert len(out) == 100
    assert sorted(r["draw"] for r in out) == list(range(1, 101))
    keys = [r["key"] for r in sorted(out, key=lambda r: r["draw"])]
    assert keys == sorted(keys, reverse=True)
    heavy = sum(1 for r in out if r["w"] == 50)
    assert heavy >= 75  # deterministic given the hash; measured high

    # reproducible: same salt -> identical sample; different salt ->
    # different sample (independent hash family)
    again = smp.weighted_sample(df, "w", 100).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    other = smp.weighted_sample(df, "w", 100, salt="ws2").collect()
    assert {r["doc_id"] for r in other} != {r["doc_id"] for r in out}

    with pytest.raises(ValueError, match="non-positive"):
        smp.weighted_sample(
            spark.createDataFrame([(1, 0)], "doc_id long, w long"), "w", 1
        )


def test_mixture_sample_rejects_unavailable_sources(spark):
    import pytest
    from pyspark.sql import functions as F

    from torua_spark.operators import sampling as smp

    docs = spark.createDataFrame(
        [(1, "a", 0), (2, "a", 0), (3, "b", 5)],
        "doc_id long, source string, n_chars long",
    )
    # all-zero unit column for source a -> loud error, not ZeroDivision
    with pytest.raises(ValueError, match="no available n_chars"):
        smp.mixture_sample(docs, {"a": 1.0, "b": 1.0}, by="n_chars")
    # a weighted source absent from the corpus -> loud error too
    with pytest.raises(ValueError, match="no available rows"):
        smp.mixture_sample(docs, {"zz": 1.0})
    # valid sources still work
    assert smp.mixture_sample(docs, {"b": 1.0}, by="n_chars").count() >= 0
