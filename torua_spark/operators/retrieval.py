"""Retrieval operators — chunking, TF-IDF, BM25 (reference §2.B
B7/B17: the "GraphRAG" serving path torua documents but never built —
`README.md:201-218` RAG use cases, `ARCHITECTURE.md:771-778` semantic
search. A RAG pipeline needs documents chunked, term-scored, and
ranked; these are the batch (corpus-preparation) halves of that path,
re-expressed as declarative DataFrame plans).

Scale notes (100 TB corpus):
- chunking is embarrassingly parallel: one narrow projection per
  document, no shuffle at all — the explode multiplies rows inside the
  scan stage and WholeStageCodegen keeps it JVM-side
- TF-IDF / BM25 term statistics (df, avgdl, N) are tiny relative to
  the corpus (vocabulary-sized / scalar) — they broadcast, so the only
  corpus-sized shuffles are the (doc_id, term) partial+final counts
- top-k uses rank-over-rounded-score with a total tie-break so results
  are deterministic across engines and retries; the global top-k
  window at the end operates on the already-aggregated per-doc rows
  (corpus-cardinality, not token-cardinality)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from torua_spark.functions.compat import round4
from torua_spark.functions.ranking import global_topk
from torua_spark.functions.text import STOPWORDS, tokens

CHUNK_SIZE = 64
CHUNK_STRIDE = 48

BM25_K1 = 1.2
BM25_B = 0.75


def chunk_documents(documents: DataFrame,
                    size: int = CHUNK_SIZE,
                    stride: int = CHUNK_STRIDE) -> DataFrame:
    """Overlapping token-window chunks: chunk i covers tokens
    [i*stride, i*stride+size); the last chunk may be short. Emits
    (doc_id, chunk_id, n_tokens, chunk_md5) — the md5 stands in for
    the chunk body so downstream embedding/indexing jobs shuffle a
    32-byte digest, not the text."""
    w = tokens("text")
    starts = F.sequence(
        F.lit(0).cast("long"),
        F.floor((F.size(w) - F.lit(1)) / F.lit(stride)).cast("long"),
    )
    chunk = F.slice(
        F.col("w"), (F.col("chunk_id") * stride + 1).cast("int"), size
    )
    return (
        documents.select("doc_id", F.explode(starts).alias("chunk_id"), w.alias("w"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.size(chunk).alias("n_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
        )
    )


def tfidf_top_terms(documents: DataFrame, k: int = 3) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF
    (tf * ln((N+1)/(df+1))), stopwords excluded.

    Corpus-sized work: one (doc_id, term) count shuffle. The document
    frequency relation is vocabulary-sized — Heaps-law sublinear but
    UNBOUNDED in the corpus, so it is NOT broadcast-hinted: AQE picks
    a broadcast when the measured build side fits and a shuffle join
    (the scale-safe plan) when it doesn't. Only the 1-row corpus size
    is forced-broadcast. Ranking happens on the ROUNDED score with the
    term as a total tie-break — deterministic across engines."""
    tok = documents.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    ).filter(~F.col("term").isin(*STOPWORDS))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf already has one row per (doc, term): df = row count per term.
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ndocs = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .select(
            "doc_id",
            "term",
            "tf",
            round4(
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
            ).alias("tfidf"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("int"))
        .filter(F.col("rank") <= k)
    )


def bm25_topk(documents: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = BM25_K1, b: float = BM25_B) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25
    (idf = ln(1 + (N - df + 0.5)/(df + 0.5))).

    The per-term statistics (df, idf) and the scalars (N, avgdl) are
    broadcast; the corpus-sized shuffles are the per-(doc, term) count
    and the final per-doc sum. Documents containing none of the query
    terms score 0 and are not emitted. The final global top-k is
    ``TakeOrderedAndProject`` (O(k) heap per partition) — never a
    single-partition sort of the matching corpus."""
    toks = documents.select("doc_id", tokens("text").alias("w"))
    dl = toks.select("doc_id", F.size("w").alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        toks.select("doc_id", F.explode("w").alias("term"))
        .filter(F.col("term").isin(*query_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(round4(F.sum("c")).alias("score"))
    return global_topk(per_doc, [F.col("score").desc(), F.col("doc_id").asc()], k)


def hashed_retrieval(documents: DataFrame, query_text: str, k: int = 10,
                     dim: int = 64, size: int = CHUNK_SIZE,
                     stride: int = CHUNK_STRIDE) -> DataFrame:
    """End-to-end MODEL-FREE retrieval: overlapping token-window
    chunks -> hashing-trick sparse embeddings -> dot-product top-k
    against the hashed query (both sides L2-normalized, so the dot IS
    the cosine). Zero model state, fully deterministic, every stage a
    Catalyst expression — the ingest-time retrieval baseline a
    pipeline ships before any learned embedder exists, and the
    plumbing (chunk -> embed -> score -> top-k) that a learned
    embedder later slots into.

    Scale shape: chunk token rows explode inside the scan stage; the
    sparse chunk-embedding relation is ≤dim rows per chunk keyed by
    (doc, chunk); the query embedding is ≤dim rows BROADCAST into the
    bucket equi-join, so scoring touches only chunks sharing a bucket
    with the query; top-k is TakeOrdered."""
    from torua_spark.operators.text_analysis import hashed_sparse

    w = tokens("text")
    starts = F.sequence(
        F.lit(0).cast("long"),
        F.floor((F.size(w) - F.lit(1)) / F.lit(stride)).cast("long"),
    )
    chunk_tok = (
        documents.select("doc_id", F.explode(starts).alias("chunk_id"), w.alias("w"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.explode(
                F.slice(F.col("w"), (F.col("chunk_id") * stride + 1).cast("int"), size)
            ).alias("t"),
        )
    )
    chunk_emb = hashed_sparse(chunk_tok, ["doc_id", "chunk_id"], dim)
    spark = documents.sparkSession
    from torua_spark.sources.local import local_df

    q_tok = local_df(spark, [(query_text,)], "text string").select(
        F.lit(0).alias("qid"), F.explode(tokens("text")).alias("t")
    )
    q_emb = hashed_sparse(q_tok, ["qid"], dim).select(
        "bucket", F.col("weight").alias("qw")
    )
    scored = (
        chunk_emb.join(F.broadcast(q_emb), "bucket")
        .groupBy("doc_id", "chunk_id")
        .agg(round4(F.sum(F.col("weight") * F.col("qw"))).alias("score"))
    )
    return global_topk(
        scored,
        [F.col("score").desc(), F.col("doc_id").asc(), F.col("chunk_id").asc()],
        k,
    )


RRF_C = 60  # Cormack et al. 2009's constant


def hybrid_rrf(documents: DataFrame, query_terms: list[str], query_text: str,
               k: int = 10, depth: int = 20, c: int = RRF_C) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: the lexical list
    (BM25 over ``query_terms``) and the dense-proxy list (hashed-
    embedding chunk retrieval over ``query_text``, reduced to doc
    level by best chunk) each contribute 1/(c + rank); docs surface on
    the fused score. RRF is the standard score-free fusion — it never
    compares the two engines' incompatible score scales, only ranks.

    Scale: both input lists are top-``depth`` (bounded); everything
    after the two retrievals is ≤2·depth rows on the driver-free
    fused aggregation. The expensive parts are exactly the two
    retrieval plans, unchanged."""
    lex = bm25_topk(documents, query_terms, depth).select(
        "doc_id", F.col("rank").alias("r")
    )
    dense_doc = (
        hashed_retrieval(documents, query_text, depth)
        .groupBy("doc_id")
        .agg(F.min("rank").alias("best"))
    )
    w = Window.orderBy(F.col("best").asc(), F.col("doc_id").asc())
    dense = dense_doc.select(
        "doc_id", F.row_number().over(w).alias("r")
    )
    fused = (
        lex.unionByName(dense)
        .select("doc_id", (F.lit(1.0) / (F.lit(float(c)) + F.col("r"))).alias("s"))
        .groupBy("doc_id")
        .agg(round4(F.sum("s")).alias("rrf_score"))
    )
    return global_topk(
        fused, [F.col("rrf_score").desc(), F.col("doc_id").asc()], k
    )
