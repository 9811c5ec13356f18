"""LLM-pipeline declared queries vs DuckDB oracle + semantic checks."""

import pytest

from tests.oracle import compare
from torua_spark.queries import rag_q


@pytest.mark.parametrize("name", sorted(rag_q.QUERIES))
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


def test_bm25_ranked_topk(spark, sf_dir):
    rows = rag_q.QUERIES["rag_bm25_topk"](spark, sf_dir).collect()
    assert len(rows) == 10
    ordered = sorted(rows, key=lambda r: r["rank"])
    scores = [r["score"] for r in ordered]
    assert scores == sorted(scores, reverse=True)
    assert all(r["score"] > 0 for r in rows)
