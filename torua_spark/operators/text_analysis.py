"""Text-analysis operators (north-star B17: language ID, quality
scoring, token counting, document fingerprinting) over the documents
corpus. Pure Catalyst expressions; per-document outputs are bounded
and deterministic (doubles rounded to 4 dp, FIXTURES.md §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from torua_spark.functions.compat import round4
from torua_spark.functions.text import (
    STOPWORDS,
    char_shingles,
    md5_32,
    mean_word_length,
    stopword_ratio,
    tokens,
    type_token_ratio,
)


def text_stats(documents: DataFrame) -> DataFrame:
    """Per-language corpus stats: doc count, avg chars, avg whitespace
    token count (declared `text_stats`)."""
    return (
        documents.select("lang", "n_chars", F.size(tokens("text")).alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            round4(F.avg("n_chars")).alias("avg_chars"),
            round4(F.avg("n_tokens")).alias("avg_tokens"),
        )
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Per-doc quality signals + a composite score: length band,
    stopword ratio (fluency proxy), type-token ratio (repetition
    penalty), mean word length. Composite = weighted sum, the shape a
    C4/Gopher-style quality filter takes."""
    return documents.select(
        "doc_id",
        F.col("n_chars"),
        round4(stopword_ratio("text")).alias("stop_ratio"),
        round4(type_token_ratio("text")).alias("ttr"),
        round4(mean_word_length("text")).alias("mean_word_len"),
        round4(
            F.least(F.col("n_chars") / F.lit(500.0), F.lit(1.0)) * 0.3
            + stopword_ratio("text") * 0.2
            + type_token_ratio("text") * 0.3
            + F.least(mean_word_length("text") / F.lit(8.0), F.lit(1.0)) * 0.2
        ).alias("quality_score"),
    )


def language_id(documents: DataFrame) -> DataFrame:
    """Heuristic language ID: stopword-hit ratio as the English signal
    (the classic n-gram/stopword heuristic reduced to its deterministic
    core). Emits predicted lang + agreement with the labeled lang,
    aggregated per (lang, predicted)."""
    w = tokens("text")
    en_hits = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    pred = F.when(en_hits.cast("double") / F.size(w) >= 0.05, F.lit("en")).otherwise(
        F.lit("unknown")
    )
    return (
        documents.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def token_counts(documents: DataFrame) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    token stream (runs of letters / digits / single non-space symbols)
    — aggregated corpus-wide per source."""
    return (
        documents.select(
            "source",
            F.size(tokens("text")).alias("ws_tokens"),
            F.regexp_count(F.col("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]")).alias("re_tokens"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws_tokens").alias("total_ws_tokens"),
            F.sum("re_tokens").alias("total_re_tokens"),
        )
    )


def unigram_logprob(documents: DataFrame) -> DataFrame:
    """Unigram language-model quality score — the classic LM filter:
    per-doc mean negative log-probability of its tokens under the
    corpus unigram distribution (high = surprising/rare text, low =
    fluent/common). The cheap proxy for perplexity-based filtering.

    Corpus-sized work is ONE (token) count shuffle; the unigram table
    is vocabulary-sized and broadcast to score tokens in place, and
    the corpus total is a broadcast scalar. Per-doc reduce is a
    partial+final aggregation."""
    spark_parallelism = documents.sparkSession.sparkContext.defaultParallelism
    tok = documents.repartition(spark_parallelism, "doc_id").select(
        "doc_id", F.explode(tokens("text")).alias("t")
    )
    uni = tok.groupBy("t").agg(F.count(F.lit(1)).alias("cnt"))
    total = uni.agg(F.sum("cnt").alias("total"))
    return (
        tok.join(F.broadcast(uni), "t")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            round4(
                F.avg(-F.log(F.col("cnt").cast("double") / F.col("total")))
            ).alias("avg_nll"),
        )
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Document fingerprint: min-hash over character 8-gram shingles
    (one-permutation rolling-hash fingerprint) + shingle cardinality.
    Equal fingerprints are near-certain content matches."""
    sh = char_shingles("text", 8)
    return documents.select(
        "doc_id",
        F.array_min(F.transform(sh, lambda s: md5_32(s))).alias("fingerprint"),
        F.size(sh).alias("n_shingles"),
    )
