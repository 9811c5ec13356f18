"""CorpusPipeline — the user-facing facade for the LLM-training-data
surface, `ToruaEngine`'s sibling: engine.py gives a torua user the
reference's KV/topology HTTP surface 1:1; this gives the north-star
corpus operations (README.md:315-320 "data pipelines", the reference's
documented-but-unimplemented ambition) as one chainable object.

Every stage is LAZY — a stage method returns a new CorpusPipeline
whose `df()` is the filtered corpus plan; nothing executes until an
action. The stage set mirrors what a pretraining pipeline actually
ships, in its canonical order:

    CorpusPipeline(spark, docs)
        .quality_filter(min_chars=100, min_quality=0.45)
        .repetition_filter(max_top_bigram_frac=0.18,
                           max_dup_trigram_frac=0.30)
        .dedup_exact()
        .dedup_near(threshold=0.5)
        .decontaminate(eval_docs)
        .sample({"en": 1.0, "de": 0.5})
        .df()

Scale notes per stage live on the underlying operators
(operators/text_analysis.py, operators/dedup.py,
operators/sampling.py) — the facade adds no plan shape of its own;
every filter is an anti-join against a key set the operator already
computes bucketed/blocked (never all-pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from torua_spark.operators import dedup as dd
from torua_spark.operators import sampling as smp
from torua_spark.operators import text_analysis as ta


class CorpusPipeline:
    def __init__(self, spark: SparkSession, documents: DataFrame):
        self.spark = spark
        self._docs = documents

    def df(self) -> DataFrame:
        """The current corpus plan (lazy)."""
        return self._docs

    def _with(self, docs: DataFrame) -> "CorpusPipeline":
        return CorpusPipeline(self.spark, docs)

    # ---------------------------------------------------------- quality
    def quality_filter(self, min_chars: int = 100,
                       min_quality: float = 0.45) -> "CorpusPipeline":
        """Length + composite-quality gate (the corpus_funnel stages)."""
        q = ta.quality_scores(self._docs).select("doc_id", "quality_score")
        keep = q.filter(F.col("quality_score") >= min_quality).select("doc_id")
        return self._with(
            self._docs.filter(F.col("n_chars") >= min_chars)
            .join(keep, "doc_id", "left_semi")
        )

    def repetition_filter(self, max_top_bigram_frac: float = 0.18,
                          max_dup_trigram_frac: float = 0.30) -> "CorpusPipeline":
        """Gopher-rule gate: drop docs whose top-2-gram or duplicate-
        3-gram mass exceeds the published-style thresholds. Docs too
        short to have gram mass (NULL fractions) are KEPT — no
        repetition evidence is not repetition."""
        r = ta.repetition_scores(self._docs)
        drop = r.filter(
            (F.col("top_bigram_frac") > max_top_bigram_frac)
            | (F.col("dup_trigram_frac") > max_dup_trigram_frac)
        ).select("doc_id")
        return self._with(self._docs.join(drop, "doc_id", "left_anti"))

    def clean_lines(self, min_docs: int = 3, intra_doc: bool = True,
                    sep: str = "\n") -> "CorpusPipeline":
        """CCNet line-cleaning pass — the one stage family that
        REWRITES text instead of filtering rows: cross-document
        boilerplate-line removal (a trimmed line in >= ``min_docs``
        distinct docs drops everywhere) then, by default, intra-
        document repeated-line dedup. ``n_chars`` is recomputed when
        present so downstream length gates see the cleaned body.
        Canonical order: run BEFORE dedup/decontamination so shared
        boilerplate doesn't glue unrelated documents into near-dup
        pairs."""
        cols = self._docs.columns

        def _swap_text(docs, cleaned):
            out = docs.drop("text").join(
                cleaned.select("doc_id", F.col("clean_text").alias("text")),
                "doc_id",
            )
            return out

        docs = _swap_text(
            self._docs, ta.remove_boilerplate_lines(self._docs, min_docs, sep=sep)
        )
        if intra_doc:
            docs = _swap_text(docs, ta.dedup_doc_lines(docs, sep=sep))
        if "n_chars" in cols:
            docs = docs.withColumn("n_chars", F.length("text").cast("long"))
        return self._with(docs.select(*cols))

    # ------------------------------------------------------------ dedup
    def dedup_exact(self) -> "CorpusPipeline":
        """Keep one survivor (min doc_id) per exact text duplicate."""
        keep = dd.exact_dedup(self._docs).select("doc_id")
        return self._with(self._docs.join(keep, "doc_id", "left_semi"))

    def dedup_near(self, threshold: float = 0.5) -> "CorpusPipeline":
        """Near-dup removal: MinHash/LSH pairs -> clusters -> keep each
        cluster's canonical survivor; docs in no cluster pass through.

        The one MATERIALIZING stage (the verified pair relation is
        localCheckpointed once and shared between the cluster and
        membership consumers — at deployment scale this is the persist
        of the detection tier's output)."""
        pairs = (
            dd.ngram_jaccard_pairs(self._docs, threshold)
            .select("doc_a", "doc_b")
            .localCheckpoint()
        )
        clusters = dd.canonicalize_near_dups(self._docs, threshold, pairs=pairs)
        members = (
            pairs.select(F.col("doc_a").alias("doc_id"))
            .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
            .distinct()
        )
        survivors = clusters.select(F.col("canonical_doc").alias("doc_id"))
        drop = members.join(survivors, "doc_id", "left_anti")
        return self._with(self._docs.join(drop, "doc_id", "left_anti"))

    def decontaminate(self, eval_docs: DataFrame,
                      threshold: float = 0.5,
                      ngram: int | None = 8,
                      min_overlap: int = 2) -> "CorpusPipeline":
        """Drop training docs flagged by EITHER decontamination tier:
        whole-document MinHash-Jaccard (near-dup of an eval doc) or
        exact n-gram collision (benchmark text quoted inside). Pass
        ``ngram=None`` to skip the collision tier."""
        flagged = dd.cross_corpus_contamination(
            self._docs, eval_docs, threshold
        ).select(F.col("train_id").alias("doc_id"))
        if ngram is not None:
            flagged = flagged.unionByName(
                dd.ngram_overlap_contamination(
                    self._docs, eval_docs, ngram, min_overlap
                ).select(F.col("train_id").alias("doc_id"))
            )
        return self._with(
            self._docs.join(flagged.distinct(), "doc_id", "left_anti")
        )

    def classifier_filter(self, weights: dict[int, float],
                          bias: float = 0.0,
                          threshold: float = 0.5) -> "CorpusPipeline":
        """Learned quality gate (round 9): keep docs the hashed-feature
        linear classifier scores >= threshold — the fastText-style
        stage between the heuristic gates (quality_filter /
        repetition_filter) and dedup. Weights are the frozen offline
        model; the score is one JVM pass (linear_quality_score)."""
        keep = (
            ta.linear_quality_score(self._docs, weights, bias,
                                    threshold=threshold)
            .filter(F.col("keep"))
            .select("doc_id")
        )
        return self._with(self._docs.join(keep, "doc_id", "left_semi"))

    def decontaminate_semantic(self, train_emb: DataFrame,
                               eval_emb: DataFrame,
                               threshold: float = 0.35,
                               id_col: str = "doc_id") -> "CorpusPipeline":
        """Embedding-cosine decontamination tier (round 9): drop
        training docs whose embedding best-matches any eval-benchmark
        embedding at >= threshold — the semantic sibling of
        :meth:`decontaminate` for paraphrased leakage the n-gram tier
        cannot see. BOTH relations carry (``id_col``, embedding) —
        ``train_emb`` keyed like the corpus; the eval side is
        broadcast once (similarity.decontaminate_embeddings)."""
        from torua_spark.operators import similarity as sim

        flagged = sim.decontaminate_embeddings(
            train_emb, eval_emb, threshold, id_col=id_col
        ).select(F.col("train_id").alias("doc_id"))
        return self._with(
            self._docs.join(flagged.distinct(), "doc_id", "left_anti")
        )

    # ------------------------------------------------- sample / split
    def sample(self, rates: dict[str, float],
               default_rate: float = 1.0) -> "CorpusPipeline":
        """Deterministic per-language Bernoulli resampling (pretraining
        mix reweighting); rate 1.0 keeps a stratum whole."""
        u = smp.hash_unit(F.col("doc_id").cast("string"), "sample:")
        rate = F.lit(float(default_rate))
        for lang, r in rates.items():
            rate = F.when(F.col("lang") == lang, F.lit(float(r))).otherwise(rate)
        return self._with(self._docs.filter(u < rate))

    def cap_per_source(self, cap: int,
                       rank_col: str = "n_chars") -> "CorpusPipeline":
        """Per-source document cap (the crawl-pipeline domain cap):
        keep the top ``cap`` docs per source by ``rank_col``
        (deterministic tie-break) — runs before mixing so no single
        domain dominates the weights."""
        return self._with(smp.source_cap(self._docs, cap, rank_col))

    def mix(self, weights: dict[str, float],
            total: int | None = None) -> DataFrame:
        """Source-weighted training MIX (round 7): terminal stage —
        re-proportion the surviving corpus to ``weights`` with
        hash-threshold downsampling and epoch-repetition upsampling
        (operators/sampling.mixture_sample). Returns the (doc_id,
        source, epoch) mix manifest a training loader consumes; join
        back on doc_id for text. Unlike `sample` (per-stratum keep
        rates), `mix` targets OUTPUT proportions, repeating scarce
        sources — the LLM-data-mix recipe."""
        return smp.mixture_sample(self._docs, weights, total)

    def split(self) -> DataFrame:
        """Hash-banded train/val/test assignment column attached to the
        surviving corpus (the artifact a pipeline writes per doc)."""
        u = smp.hash_unit(F.col("doc_id").cast("string"), "split:")
        return self._docs.withColumn(
            "split",
            F.when(u < F.lit(smp.TRAIN_FRAC), F.lit("train"))
            .when(u < F.lit(smp.TRAIN_FRAC + smp.VAL_FRAC), F.lit("val"))
            .otherwise(F.lit("test")),
        )

    def pack(self, budget: int = smp.PACK_BUDGET) -> DataFrame:
        """Concat-then-chunk sequence packing of the SURVIVING corpus
        (the final stage: what the training loader reads). Terminal —
        returns the packed-sequence relation, not a pipeline."""
        return smp.pack_sequences(self._docs, budget)

    # ---------------------------------------------------------- report
    def report(self) -> DataFrame:
        """One-row corpus summary (docs, chars, languages) — the cheap
        progress probe between stages."""
        return self._docs.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
            F.count_distinct("lang").alias("n_langs"),
        )
