"""CorpusPipeline facade: the end-to-end corpus chain a pretraining
pipeline ships, driven at sf0.001."""

from pyspark.sql import functions as F

from torua_spark.pipeline import CorpusPipeline
from torua_spark.sources.catalog import load_table


def test_full_chain_monotone_and_schema_stable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    p0 = CorpusPipeline(spark, docs)
    n0 = p0.df().count()

    p1 = p0.quality_filter(min_chars=50, min_quality=0.3)
    p2 = p1.repetition_filter()
    p3 = p2.dedup_exact()
    p4 = p3.dedup_near(threshold=0.5)
    counts = [n0] + [p.df().count() for p in (p1, p2, p3, p4)]
    assert counts == sorted(counts, reverse=True), counts
    assert counts[-1] > 0
    assert p4.df().columns == docs.columns  # filters never reshape

    split = p4.split()
    assert set(r["split"] for r in split.select("split").distinct().collect()) <= {
        "train", "val", "test"
    }


def test_decontaminate_removes_flagged_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    u_col = F.col("doc_id") % 10
    train, ev = docs.filter(u_col < 8), docs.filter(u_col >= 9)
    p = CorpusPipeline(spark, train).decontaminate(ev, threshold=0.5)
    kept = p.df()
    # No kept doc may still collide with the eval corpus.
    from torua_spark.operators import dedup as dd

    assert dd.cross_corpus_contamination(kept, ev, 0.5).count() == 0
    assert dd.ngram_overlap_contamination(kept, ev, 8, 2).count() == 0
    assert kept.count() < train.count()  # fixture contains real leaks


def test_sample_rates_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = CorpusPipeline(spark, docs).sample({"en": 0.5}).df()
    b = CorpusPipeline(spark, docs).sample({"en": 0.5}).df()
    assert sorted(r["doc_id"] for r in a.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in b.select("doc_id").collect()
    )


def test_pack_after_filters(spark, sf_dir):
    """The terminal packing stage runs on the filtered corpus: token
    mass in the packed sequences equals the surviving docs' token
    count, and every sequence respects the budget on starts."""
    from torua_spark.operators.sampling import PACK_BUDGET

    docs = load_table(spark, sf_dir, "documents")
    p = CorpusPipeline(spark, docs).quality_filter(min_chars=50, min_quality=0.3)
    packed = p.pack().collect()
    total_tokens = p.df().select(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("t")
    ).collect()[0]["t"]
    assert sum(r["tok_mass"] for r in packed) == total_tokens
    assert all(r["n_docs"] >= 1 for r in packed)
    assert len(packed) >= total_tokens // PACK_BUDGET


def test_mix_stage_targets_output_proportions(spark, sf_dir):
    """The mix stage re-proportions to weights over the SURVIVING
    corpus (post-filter), repeating scarce sources as epochs."""
    from torua_spark.pipeline import CorpusPipeline
    from torua_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    m = CorpusPipeline(spark, docs).quality_filter(min_chars=50).mix(
        {"src0": 3.0, "src1": 1.0}
    )
    rows = m.collect()
    assert set(m.columns) == {"doc_id", "source", "epoch"}
    srcs = {r.source for r in rows}
    assert srcs <= {"src0", "src1"} and len(rows) > 0
    # deterministic re-run
    again = CorpusPipeline(spark, docs).quality_filter(min_chars=50).mix(
        {"src0": 3.0, "src1": 1.0}
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_cap_then_mix_chain(spark, sf_dir):
    from torua_spark.pipeline import CorpusPipeline
    from torua_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    m = (
        CorpusPipeline(spark, docs)
        .cap_per_source(10)
        .mix({"src0": 1.0, "src1": 1.0})
    )
    rows = m.collect()
    assert len(rows) > 0
    # base doc ids in the mix come only from the capped survivors
    kept_ids = {
        r.doc_id
        for r in CorpusPipeline(spark, docs).cap_per_source(10).df().collect()
    }
    assert {r.doc_id for r in rows} <= kept_ids


def test_clean_lines_stage_rewrites_and_chains(spark):
    from torua_spark.pipeline import CorpusPipeline

    docs = spark.createDataFrame(
        [
            (1, "COOKIE\nalpha\nalpha\nbody one", "en", "a", 0),
            (2, "COOKIE\nbody two", "en", "a", 0),
            (3, "COOKIE\nbody three", "en", "b", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).withColumn("n_chars", __import__("pyspark").sql.functions.length("text").cast("long"))
    out = {
        r["doc_id"]: (r["text"], r["n_chars"])
        for r in CorpusPipeline(spark, docs).clean_lines(min_docs=3).df().collect()
    }
    # COOKIE (3 docs) removed everywhere; doc 1's repeated alpha
    # collapses to its first occurrence; n_chars tracks the rewrite
    assert out[1] == ("alpha\nbody one", len("alpha\nbody one"))
    assert out[2] == ("body two", len("body two"))
    assert out[3] == ("body three", len("body three"))
    # and schema/column order is unchanged so later stages chain
    chained = (
        CorpusPipeline(spark, docs)
        .clean_lines(min_docs=3)
        .quality_filter(min_chars=1, min_quality=0.0)
        .df()
    )
    assert chained.columns == docs.columns
    assert chained.count() == 3


def test_classifier_and_semantic_decon_stages_chain(spark, sf_dir):
    """Round-9 stages: classifier_filter keeps exactly the keep=true
    docs, decontaminate_semantic drops exactly the flagged doc_ids,
    and both preserve schema so the chain continues."""
    from pyspark.sql import functions as F

    from torua_spark.operators import similarity as sim
    from torua_spark.operators.text_analysis import linear_quality_score
    from torua_spark.pipeline import CorpusPipeline
    from torua_spark.queries.rag_q import QUALITY_BIAS, _quality_weights
    from torua_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    w = _quality_weights()
    p = CorpusPipeline(spark, docs).classifier_filter(w, QUALITY_BIAS)
    want_keep = {
        r.doc_id
        for r in linear_quality_score(docs, w, QUALITY_BIAS)
        .filter("keep").collect()
    }
    assert {r.doc_id for r in p.df().select("doc_id").collect()} == want_keep
    assert p.df().columns == docs.columns

    emb = load_table(spark, sf_dir, "embeddings")
    train_emb = emb.filter(F.col("vec_id") % 50 != 0).select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    eval_emb = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    flagged = {
        r.train_id
        for r in sim.decontaminate_embeddings(
            train_emb, eval_emb, 0.35, id_col="doc_id"
        ).collect()
    }
    p2 = CorpusPipeline(spark, docs).decontaminate_semantic(
        train_emb, eval_emb, 0.35
    )
    got = {r.doc_id for r in p2.df().select("doc_id").collect()}
    base = {r.doc_id for r in docs.select("doc_id").collect()}
    assert got == base - flagged and len(flagged) > 0
