"""Declared training-data pipeline queries (sampling, splits,
sequence packing) + DuckDB oracles.

Determinism contract: every sampling decision is a salted md5 band
(`sampling.hash_unit`), and every fractional threshold is
interpolated into the oracle SQL from the SAME Python float the Spark
side uses, so both engines compare bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from torua_spark.operators import sampling as smp
from torua_spark.sources.catalog import load_table

# Pretraining-mix rates: boost en, keep zh, downsample the rest.
SAMPLE_RATES = {"en": 0.5, "zh": 0.3}
SAMPLE_DEFAULT = 0.2


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return smp.stratified_sample(
        load_table(spark, sf_dir, "documents"), SAMPLE_RATES, SAMPLE_DEFAULT
    )


def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return smp.train_test_split(load_table(spark, sf_dir, "documents"))


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return smp.pack_sequences(load_table(spark, sf_dir, "documents"))


QUERIES = {
    "sample_stratified": q_sample_stratified,
    "train_test_split": q_train_test_split,
    "pack_sequences": q_pack_sequences,
}


def _u_sql(salt: str) -> str:
    """SQL twin of sampling.hash_unit (md5 top 32 bits / 2^32)."""
    return (
        f"('0x' || substr(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT"
        " / 4294967296.0"
    )


def _rate_case() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {rate}" for lang, rate in SAMPLE_RATES.items()
    )
    return f"CASE lang {whens} ELSE {SAMPLE_DEFAULT} END"


ORACLE = {
    "sample_stratified": f"""
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE {_u_sql('sample:')} < {_rate_case()}
    """,
    "train_test_split": f"""
        WITH assigned AS (
            SELECT lang, n_chars,
                   CASE WHEN {_u_sql('split:')} < {smp.TRAIN_FRAC} THEN 'train'
                        WHEN {_u_sql('split:')} < {smp.TRAIN_FRAC + smp.VAL_FRAC} THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        ),
        agg AS (
            SELECT lang, split, count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS sum_chars
            FROM assigned GROUP BY lang, split
        )
        SELECT lang, split, n_docs, sum_chars,
               floor((n_docs / sum(n_docs) OVER (PARTITION BY lang)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS frac
        FROM agg
    """,
    "pack_sequences": f"""
        WITH toks AS (
            SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tok
            FROM documents
        ),
        placed AS (
            SELECT n_tok,
                   coalesce(sum(n_tok) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0)::BIGINT AS start
            FROM toks
        )
        SELECT floor(start / {smp.PACK_BUDGET})::BIGINT AS seq_id,
               count(*)::BIGINT AS n_docs,
               sum(n_tok)::BIGINT AS tok_mass,
               sum(CASE WHEN floor((start + n_tok - 1) / {smp.PACK_BUDGET})
                             > floor(start / {smp.PACK_BUDGET})
                        THEN 1 ELSE 0 END)::BIGINT AS n_crossing
        FROM placed GROUP BY seq_id
    """,
}
