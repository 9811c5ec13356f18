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
