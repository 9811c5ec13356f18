"""Declared queries completing the UDF/UDAF/UDTF category (§2.C) with
the three Python extension points Spark offers — each used only where
the built-in surface genuinely lacks the operator, each oracle-checked:

- UDTF (`shard_split_ranges`): torua's shard split (B16,
  ARCHITECTURE.md:454-468 — split a shard at >120% of average size)
  as a table function emitting sub-ranges of the key space.
- pandas UDAF (`udaf_quality_by_lang`): applyInPandas grouped
  aggregation computing a chars-weighted mean quality score per
  language (the custom-UDAF pattern; weights make it a real
  aggregate, not a re-spelling of avg).
- (scalar pandas UDFs are exercised implicitly by the multimodal
  mapInPandas operator.)
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import udtf

N_SPLITS = 4
SPLIT_ALPHABET = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


@udtf(returnType="shard_id int, split_idx int, range_start string, range_end string")
class ShardSplit:
    """Split a shard's key space into N_SPLITS lexicographic sub-ranges
    by first character of a fixed alphabet (deterministic; the
    migration plan a coordinator would hand to movers)."""

    def eval(self, shard_id: int, n_splits: int):
        step = len(SPLIT_ALPHABET) // n_splits
        for i in range(n_splits):
            start = SPLIT_ALPHABET[i * step]
            end = SPLIT_ALPHABET[(i + 1) * step] if i < n_splits - 1 else "~"
            yield shard_id, i, start, end


def q_shard_split_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # coalesce(1): a lateral UDTF spawns a Python worker per partition;
    # 32 partitions of a 4-row input is all startup cost.
    shards = spark.range(4).coalesce(1).select(F.col("id").cast("int").alias("shard_id"))
    shards.createOrReplaceTempView("_shards_to_split")
    spark.udtf.register("shard_split", ShardSplit)
    return spark.sql(
        f"SELECT s.* FROM _shards_to_split t, "
        f"LATERAL shard_split(t.shard_id, {N_SPLITS}) s"
    )


def _weighted_quality(pdf: pd.DataFrame) -> pd.DataFrame:
    w = pdf["n_chars"].astype("float64")
    q = pdf["quality_score"]
    return pd.DataFrame(
        {
            "lang": [pdf["lang"].iloc[0]],
            "n_docs": [len(pdf)],
            "weighted_quality": [float((q * w).sum() / w.sum())],
        }
    )


def q_udaf_quality_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from torua_spark.functions.compat import round4
    from torua_spark.operators.text_analysis import quality_scores
    from torua_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    scored = quality_scores(docs).join(docs.select("doc_id", "lang"), "doc_id")
    out = scored.select("lang", "n_chars", "quality_score").groupBy("lang").applyInPandas(
        _weighted_quality, schema="lang string, n_docs long, weighted_quality double"
    )
    return out.select("lang", "n_docs", round4("weighted_quality").alias("weighted_quality"))


QUERIES = {
    "shard_split_ranges": q_shard_split_ranges,
    "udaf_quality_by_lang": q_udaf_quality_by_lang,
}

_step = len(SPLIT_ALPHABET) // N_SPLITS
_RANGE_ROWS = ", ".join(
    f"({i}, '{SPLIT_ALPHABET[i*_step]}', "
    f"'{SPLIT_ALPHABET[(i+1)*_step] if i < N_SPLITS - 1 else '~'}')"
    for i in range(N_SPLITS)
)

ORACLE = {
    "shard_split_ranges": f"""
        WITH shards AS (SELECT CAST(i AS INTEGER) AS shard_id FROM range(4) t(i)),
        splits(split_idx, range_start, range_end) AS (VALUES {_RANGE_ROWS})
        SELECT shard_id, CAST(split_idx AS INTEGER) AS split_idx, range_start, range_end
        FROM shards CROSS JOIN splits
    """,
    # The pandas UDAF computes sum(q*w)/sum(w) with pandas' pairwise
    # summation; the oracle mirrors with plain SQL sums — identical at
    # round4 for these magnitudes (per-group n<=2000, values in [0,1]).
    "udaf_quality_by_lang": """
        WITH scored AS (
            SELECT d.lang, d.n_chars,
                   floor((least(d.n_chars / 500.0, 1.0) * 0.3 + stop_ratio * 0.2
                          + ttr * 0.3 + least(mwl / 8.0, 1.0) * 0.2) * 10000.0 + 0.5 + 1e-9)
                       / 10000.0 AS quality_score
            FROM (
                SELECT doc_id, lang, n_chars,
                       len(list_filter(w, t -> list_contains(
                           ['the','a','of','and','to','in','is','it'], t)))::DOUBLE
                           / len(w) AS stop_ratio,
                       len(list_distinct(w))::DOUBLE / len(w) AS ttr,
                       list_sum(list_transform(w, t -> length(t)))::DOUBLE / len(w) AS mwl
                FROM (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS w
                      FROM documents)
            ) d
        )
        SELECT lang, count(*) AS n_docs,
               floor((sum(quality_score * n_chars) / sum(n_chars)) * 10000.0 + 0.5 + 1e-9)
                   / 10000.0 AS weighted_quality
        FROM scored GROUP BY lang
    """,
}
