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


def q_corpus_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return smp.corpus_funnel(load_table(spark, sf_dir, "documents"))


FIXED_SAMPLE_N = 25


def q_sample_fixed_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    return smp.fixed_size_sample(
        load_table(spark, sf_dir, "documents"), FIXED_SAMPLE_N
    )


QUERIES = {
    "sample_stratified": q_sample_stratified,
    "train_test_split": q_train_test_split,
    "pack_sequences": q_pack_sequences,
    "corpus_funnel": q_corpus_funnel,
    "sample_fixed_size": q_sample_fixed_size,
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
    "corpus_funnel": None,  # assigned below (needs the stopword list)
    "sample_fixed_size": f"""
        SELECT doc_id, lang, n_chars, CAST(r AS INTEGER) AS rank_in_stratum
        FROM (
            SELECT doc_id, lang, n_chars,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY ('0x' || substr(md5('fixed:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                                    / 4294967296.0 ASC,
                                doc_id ASC
                   ) AS r
            FROM documents
        ) WHERE r <= {FIXED_SAMPLE_N}
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


def _funnel_oracle_sql() -> str:
    from torua_spark.functions.text import STOPWORDS

    stoplist = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    stage_case = " ".join(
        f"WHEN {i} THEN '{s}'" for i, s in enumerate(smp.FUNNEL_STAGES)
    )
    return f"""
        WITH scored AS (
            SELECT doc_id, n_chars, text,
                   len(list_filter(w, t -> list_contains({stoplist}, t)))::DOUBLE
                       / len(w) AS stop_ratio,
                   len(list_distinct(w))::DOUBLE / len(w) AS ttr,
                   list_sum(list_transform(w, t -> length(t)))::DOUBLE / len(w) AS mwl
            FROM (SELECT doc_id, n_chars, text, string_split(text, ' ') AS w FROM documents)
        ),
        flagged AS (
            SELECT doc_id, n_chars,
                   n_chars >= {smp.FUNNEL_MIN_CHARS} AS p1,
                   (n_chars >= {smp.FUNNEL_MIN_CHARS} AND
                    floor((least(n_chars / 500.0, 1.0) * 0.3 + stop_ratio * 0.2
                          + ttr * 0.3 + least(mwl / 8.0, 1.0) * 0.2) * 10000.0 + 0.5 + 1e-9) / 10000.0
                        >= {smp.FUNNEL_MIN_QUALITY}) AS p2,
                   md5(text) AS digest,
                   ('0x' || substr(md5('funnel:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       / 4294967296.0 < {smp.FUNNEL_SAMPLE_RATE} AS samp
            FROM scored
        ),
        staged AS (
            SELECT n_chars,
                   CASE WHEN p3 AND samp THEN 4 WHEN p3 THEN 3
                        WHEN p2 THEN 2 WHEN p1 THEN 1 ELSE 0 END AS depth
            FROM (
                SELECT *, p2 AND (row_number() OVER (
                    PARTITION BY digest, p2 ORDER BY doc_id) = 1) AS p3
                FROM flagged
            )
        ),
        hist AS (
            SELECT depth, count(*)::BIGINT AS n, sum(n_chars)::BIGINT AS chars
            FROM staged GROUP BY depth
        ),
        stages AS (SELECT unnest(range({len(smp.FUNNEL_STAGES)}))::INTEGER AS stage)
        SELECT stage, CASE stage {stage_case} END AS stage_name,
               coalesce(sum(n), 0)::BIGINT AS n_docs,
               coalesce(sum(chars), 0)::BIGINT AS sum_chars
        FROM stages LEFT JOIN hist ON hist.depth >= stages.stage
        GROUP BY stage
    """


ORACLE["corpus_funnel"] = _funnel_oracle_sql()


def q_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    return smp.curriculum_phases(load_table(spark, sf_dir, "documents"))


QUERIES["curriculum_phases"] = q_curriculum_phases


def _curriculum_oracle_sql() -> str:
    from torua_spark.queries import rag_q

    quality = rag_q.ORACLE["text_quality_scores"]
    return f"""
        WITH q AS (
            SELECT doc_id, n_chars, quality_score FROM ({quality})
        ),
        cuts AS (
            SELECT
                floor((quantile_cont(quality_score, 0.25)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS c1,
                floor((quantile_cont(quality_score, 0.50)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS c2,
                floor((quantile_cont(quality_score, 0.75)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS c3
            FROM q
        )
        SELECT CAST(CASE WHEN quality_score <= c1 THEN 1
                         WHEN quality_score <= c2 THEN 2
                         WHEN quality_score <= c3 THEN 3
                         ELSE 4 END AS INTEGER) AS phase,
               count(*)::BIGINT AS n_docs,
               floor((min(quality_score)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS q_lo,
               floor((max(quality_score)) * 10000.0 + 0.5 + 1e-9) / 10000.0 AS q_hi,
               sum(n_chars)::BIGINT AS sum_chars
        FROM q, cuts
        GROUP BY 1
    """


ORACLE["curriculum_phases"] = _curriculum_oracle_sql()


# ---- Mixture sampling (round 7): source-weighted training mix with
# deterministic up/down-sampling (operators/sampling.mixture_sample).

MIX_WEIGHTS = {f"src{i}": w for i, w in
               [(0, 4.0), (1, 4.0), (2, 2.0), (3, 2.0), (4, 1.0), (5, 1.0)]}


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remix six sources at 4:4:2:2:1:1 into a corpus-sized mix:
    heavy sources repeat documents (epoch > 1), light ones thin by
    hash threshold — the reproducible-mix contract a training run
    needs (same inputs, same mix, any cluster)."""
    docs = load_table(spark, sf_dir, "documents")
    return smp.mixture_sample(docs, MIX_WEIGHTS)


QUERIES["mixture_sample"] = q_mixture_sample


def _mixture_oracle_sql() -> str:
    wsum = sum(MIX_WEIGHTS.values())
    wvals = ", ".join(
        f"('{s}', {w / wsum!r})" for s, w in sorted(MIX_WEIGHTS.items())
    )
    u = _u_sql("mix:")
    return f"""
        WITH w(source, wgt) AS (VALUES {wvals}),
        counts AS (
            SELECT d.source, count(*)::BIGINT AS n
            FROM documents d JOIN w ON w.source = d.source
            GROUP BY 1
        ),
        total AS (SELECT sum(n)::BIGINT AS t FROM counts),
        rates AS (
            SELECT w.source, CAST(t AS DOUBLE) * w.wgt / n AS rate
            FROM w JOIN counts USING (source), total
        ),
        kept AS (
            SELECT d.doc_id, d.source,
                   CAST(floor(r.rate) + CASE WHEN {u} < r.rate - floor(r.rate)
                        THEN 1 ELSE 0 END AS BIGINT) AS copies
            FROM documents d JOIN rates r ON r.source = d.source
        )
        SELECT doc_id, source,
               unnest(generate_series(1, copies)) AS epoch
        FROM kept WHERE copies >= 1
    """


ORACLE["mixture_sample"] = _mixture_oracle_sql()


# ---- Per-source cap (round 7): the crawl-pipeline domain cap.

SOURCE_CAP = 15


def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every source at SOURCE_CAP docs, keeping the longest
    (n_chars as the quality proxy, doc_id tie-break); report the
    per-source survivor count and kept-char mass."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    kept = smp.source_cap(docs, SOURCE_CAP)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("chars_kept"),
        F.min("n_chars").alias("min_chars_kept"),
    )


QUERIES["source_cap"] = q_source_cap

ORACLE["source_cap"] = f"""
    WITH ranked AS (
        SELECT source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents
    )
    SELECT source, count(*)::BIGINT AS n_kept,
           sum(n_chars)::BIGINT AS chars_kept,
           min(n_chars)::BIGINT AS min_chars_kept
    FROM ranked WHERE rk <= {SOURCE_CAP}
    GROUP BY 1
"""


WS_N = 100
WS_SALT = "ws1"


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted corpus sample (A-ES top-n on u^(1/n_chars)) —
    deterministic, hash-checked including the draw order."""
    return smp.weighted_sample(
        load_table(spark, sf_dir, "documents"), "n_chars", WS_N, salt=WS_SALT
    )


QUERIES["sample_weighted"] = q_weighted_sample

ORACLE["sample_weighted"] = f"""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               floor(pow({_u_sql(WS_SALT)}, 1.0 / n_chars)
                     * 10000.0 + 0.5 + 1e-9) / 10000.0 AS key
        FROM documents
    )
    SELECT doc_id, n_chars, key, CAST(draw AS INTEGER) AS draw FROM (
        SELECT *, row_number() OVER (ORDER BY key DESC, doc_id) AS draw
        FROM keyed
    ) WHERE draw <= {WS_N}
"""


def q_text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level BPE tokenization under the frozen v1 merge table
    (functions/bpe.py — the whole tokenizer is a JVM expression
    chain: hex render + one literal replace per merge rule, no
    Python). Per doc: the BPE token count, the whitespace count it
    replaces as the budget denominator, their round4 ratio (corpus
    mean 1.39 — the 25-40% divergence band real tokenizers show, the
    r10 verdict's 'missing #1'), and the md5 of the fully merged
    token string, which pins the ENTIRE segmentation, not just the
    count. Oracle: the identical merge chain unrolled as layered
    DuckDB replace() subqueries (fixed merge count => unrollable).

    Reference hook: the reference has no tokenizer (its text surface
    is the HTTP KV API, internal/storage/store.go); this is part of
    the LLM-pipeline envelope the north-star directive adds."""
    from pyspark.sql import functions as F

    from torua_spark.functions import bpe
    from torua_spark.functions.compat import round4

    # spread an under-partitioned scan so the merge chain
    # parallelizes in any consumer that materializes the projection
    # (the pack_sequences_bpe lesson; count()-only probes prune it)
    from torua_spark.sources.catalog import spread_small_scan

    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    enc = bpe.apply_merges(bpe.wrapped_hex("text"))
    n_bpe = bpe.token_count_from_encoded(enc)
    n_ws = F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " ", -1))
    return docs.select(
        "doc_id",
        n_bpe.alias("n_bpe_tokens"),
        n_ws.cast("long").alias("n_ws_tokens"),
        round4(n_bpe.cast("double") / n_ws).alias("bpe_ws_ratio"),
        F.md5(enc).alias("enc_md5"),
    )


def q_pack_sequences_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`pack_sequences` with the budget denominated in BPE tokens
    (`token_count=bpe_token_count(...)`) — the deployment-true
    training-mix packing: whitespace counts run ~28% under this
    corpus's BPE counts, so the whitespace-budgeted pack overfills
    every sequence by the same factor. Same concat-then-chunk
    semantics; only the token mass changes."""
    from torua_spark.functions import bpe

    # spread an under-partitioned scan so the 96-rule merge chain
    # runs corpus-parallel (measured 2.3 s single-core of the entry's
    # 5.5 s at bench SF); the prefix sum re-keys by block afterwards
    # (order-keyed, partitioning-independent), and at production
    # scale the guard adds no shuffle
    from torua_spark.sources.catalog import spread_small_scan

    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    return smp.pack_sequences(docs, token_count=bpe.bpe_token_count("text"))


def _bpe_oracles() -> dict[str, str]:
    from torua_spark.functions import bpe

    enc = bpe.oracle_encoded_subquery("documents")
    counts = bpe.oracle_counts_subquery("documents")
    text_sql = f"""
        WITH enc AS (SELECT doc_id, _s FROM {enc} e),
        ws AS (
            SELECT doc_id,
                   len(string_split(coalesce(text, ''), ' '))::BIGINT
                       AS n_ws_tokens
            FROM documents
        )
        SELECT enc.doc_id,
               (length(_s) - length(replace(_s, '(', '')))::BIGINT
                   AS n_bpe_tokens,
               ws.n_ws_tokens,
               floor((length(_s) - length(replace(_s, '(', '')))::DOUBLE
                     / ws.n_ws_tokens * 10000.0 + 0.5 + 1e-9) / 10000.0
                   AS bpe_ws_ratio,
               md5(_s) AS enc_md5
        FROM enc JOIN ws USING (doc_id)
    """
    pack_sql = f"""
        WITH toks AS (
            SELECT doc_id, n_bpe_tokens AS n_tok FROM {counts} c
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
    """
    return {"text_bpe_tokens": text_sql, "pack_sequences_bpe": pack_sql}


QUERIES["text_bpe_tokens"] = q_text_bpe_tokens
QUERIES["pack_sequences_bpe"] = q_pack_sequences_bpe
ORACLE.update(_bpe_oracles())


def q_text_stats_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.D `text_stats` re-denominated in BPE tokens: per
    source, doc count + total/avg BPE token mass (round4). The stats
    every training-mix decision actually consumes."""
    from pyspark.sql import functions as F

    from torua_spark.functions import bpe
    from torua_spark.functions.compat import round4

    # spread an under-partitioned scan so the merge chain
    # parallelizes (the pack_sequences_bpe lesson; no-op at scale)
    from torua_spark.sources.catalog import spread_small_scan

    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    return (
        docs.select("source", bpe.bpe_token_count("text").alias("n"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("bpe_tokens"),
            round4(F.sum("n") / F.count(F.lit(1))).alias("avg_bpe_tokens"),
        )
    )


def _text_stats_bpe_oracle() -> str:
    from torua_spark.functions import bpe

    counts = bpe.oracle_counts_subquery("documents")
    return f"""
        SELECT d.source,
               count(*)::BIGINT AS n_docs,
               sum(c.n_bpe_tokens)::BIGINT AS bpe_tokens,
               floor(sum(c.n_bpe_tokens)::DOUBLE / count(*)
                     * 10000.0 + 0.5 + 1e-9) / 10000.0 AS avg_bpe_tokens
        FROM documents d JOIN {counts} c USING (doc_id)
        GROUP BY d.source
    """


QUERIES["text_stats_bpe"] = q_text_stats_bpe
ORACLE["text_stats_bpe"] = _text_stats_bpe_oracle()


def q_text_bpe_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow PRODUCTION path of the BPE tokenizer
    (`bpe_count_kernel`, functions/bpe.py — iterative min-rank
    encoder with a per-batch pre-token memo, mapInPandas) under the
    SAME oracle as the expression chain. The chain is what a 96-rule
    fixture runs; a 50k-rule production table runs the kernel (the
    chain's per-rule string scans don't amortize past ~10^3 rules).
    pytest proves chain == kernel on hypothesis corpora
    (tests/test_bpe.py); this entry gives the kernel its own
    driver-grade hash proof against the unrolled-replace() oracle —
    the two implementations can't drift apart without a red row."""
    from torua_spark.functions import bpe
    from torua_spark.sources.catalog import spread_small_scan

    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    return bpe.bpe_count_kernel(docs)


def _text_bpe_kernel_oracle() -> str:
    from torua_spark.functions import bpe

    counts = bpe.oracle_counts_subquery("documents")
    return f"SELECT doc_id, n_bpe_tokens FROM {counts} _k"


QUERIES["text_bpe_kernel"] = q_text_bpe_kernel
ORACLE["text_bpe_kernel"] = _text_bpe_kernel_oracle()


def q_text_bpe_pretoken_counts(spark: SparkSession, sf_dir: str
                               ) -> DataFrame:
    """The corpus-sized HALF of distributed BPE training
    (`bpe.pretoken_counts`): the pre-token frequency relation — one
    explode + one combiner-friendly groupBy shuffle; after this,
    training cost is a function of |vocab|, not corpus bytes. Split
    uses the sentinel formulation (literal replace + literal split,
    no regex) so the DuckDB oracle is dialect-drift-free — RE2 has
    no lookahead, so the Java-regex '(?= )' split is NOT portable;
    the sentinel is."""
    from torua_spark.functions import bpe

    docs = load_table(spark, sf_dir, "documents")
    return bpe.pretoken_counts(docs)


def q_text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE TRAINING end-to-end (`bpe.bpe_train`): Spark
    counts pre-tokens (the corpus-sized shuffle), the merge loop runs
    over the gathered zipfian vocabulary head under a loud budget,
    and the result is the (rank, p, q) merge relation — the table
    `apply_merges`/`bpe_count_kernel` consume, and exactly what the
    frozen v1 fixture is (pinned: training on the sf0.001 corpus
    reproduces resources/bpe_merges_v1.py bit-for-bit,
    tests/test_bpe.py). The merge loop is iterative and data-dependent
    (each rule's argmax depends on the table the previous rule
    rewrote), so no closed-form SQL can re-derive it — but training is
    fully deterministic, so the oracle is a GOLDEN-LITERAL `VALUES`
    relation: the committed output of the OFFLINE generator (pure
    Python counting + the one shared merge loop,
    scripts/make_bpe_train_goldens.py) on the same corpus.
    Fixture-pinned, not independently computed — a drift in the
    engine's distributed counting or loop plumbing turns the driver
    row red instead of regenerating itself into the oracle."""
    from torua_spark.functions import bpe
    from torua_spark.sources.local import local_df

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.bpe_train(docs, n_merges=96)
    return local_df(
        spark,
        [(i, p, q) for i, (p, q) in enumerate(merges)],
        "rank int, p string, q string",
    )


def _pretoken_counts_oracle() -> str:
    from torua_spark.functions import bpe

    return (
        "SELECT pre, cnt FROM "
        + bpe.pretoken_counts_oracle_subquery("documents")
        + " _pc"
    )


def bpe_train_golden_oracle(merges) -> str:
    """Render a frozen merge table as the `VALUES`-literal oracle
    relation for text_bpe_train (rank int, p string, q string — the
    exact registry schema). Tokens are uppercase-hex strings, so no
    quoting hazards."""
    rows = ", ".join(
        f"({i}, '{p}', '{q}')" for i, (p, q) in enumerate(merges)
    )
    return (
        "SELECT CAST(rank AS INT) AS rank, p, q "
        f"FROM (VALUES {rows}) AS t(rank, p, q)"
    )


def _bpe_train_oracle_for_n(n_rows: int, sf_dir: str | None = None) -> str:
    """Golden lookup. PRIMARY key (r14, ADVICE r13): the SF tag parsed
    from ``sf_dir`` — row counts cannot disambiguate sf0.001 from
    sf0.01 (both 500 documents / 500 embeddings, different contents),
    so the r13 count-only key silently checked sf0.001 sweeps against
    the sf0.01 golden. FALLBACK (no sf_dir — older harnesses): the
    embeddings-count map with its documented n=500 -> sf0.01
    (driver-gate) bias. Loud on an unknown SF either way: silently
    using the wrong golden would turn a real training drift into an
    unexplained hash mismatch."""
    from torua_spark.resources.bpe_train_goldens import (
        BY_EMBEDDINGS_N,
        GOLDENS,
    )

    if sf_dir is not None:
        base = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        # "sf0.01" -> itself; "testdata_sf1" -> "sf1"
        tag = "sf" + base.rsplit("sf", 1)[-1] if "sf" in base else base
        if tag not in GOLDENS:
            raise KeyError(
                f"no committed text_bpe_train golden for SF tag "
                f"{tag!r} (from sf_dir {sf_dir!r}) — run "
                f"scripts/make_bpe_train_goldens.py for the new SF "
                f"and commit the output"
            )
        return bpe_train_golden_oracle(GOLDENS[tag])
    tag = BY_EMBEDDINGS_N.get(n_rows)
    if tag is None:
        raise KeyError(
            f"no committed text_bpe_train golden for a corpus with "
            f"{n_rows} embeddings — run scripts/make_bpe_train_goldens.py "
            f"for the new SF and commit the output"
        )
    return bpe_train_golden_oracle(GOLDENS[tag])


QUERIES["text_bpe_pretoken_counts"] = q_text_bpe_pretoken_counts
ORACLE["text_bpe_pretoken_counts"] = _pretoken_counts_oracle()
QUERIES["text_bpe_train"] = q_text_bpe_train
# The static string renders the sf0.01 (driver-gate, 500-embedding)
# golden; sf0.1/sf1 sweeps re-render through ORACLE_BY_N.
ORACLE["text_bpe_train"] = _bpe_train_oracle_for_n(500)
ORACLE_BY_N = {"text_bpe_train": _bpe_train_oracle_for_n}


def q_text_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus TOKEN-frequency under the frozen merge table — the
    tokenizer-QA relation every pipeline reads before committing a
    vocabulary (coverage, head/tail shape, dead merges): one explode
    over the encoded token stream + one groupBy. Token rendered as
    its wrapped-hex id (engine-portable, byte-transparent; the
    human-readable form is bpe_tokens' ISO-8859-1 render). Oracle:
    the same explode expressed as DuckDB string_split over the
    unrolled chain's encoded string."""
    from pyspark.sql import functions as F

    from torua_spark.functions import bpe
    from torua_spark.sources.catalog import spread_small_scan

    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(
            F.explode(bpe.bpe_token_hex_array("text")).alias("token_hex")
        )
        .groupBy("token_hex")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _text_bpe_vocab_oracle() -> str:
    from torua_spark.functions import bpe

    enc = bpe.oracle_encoded_subquery("documents")
    return f"""
        SELECT token_hex, count(*)::BIGINT AS cnt FROM (
            SELECT trim(unnest(string_split(
                translate(replace(_s, '|', ''), '()', ' ,'), ','
            ))) AS token_hex
            FROM {enc} e
        ) WHERE token_hex != '' GROUP BY token_hex
    """


QUERIES["text_bpe_vocab"] = q_text_bpe_vocab
ORACLE["text_bpe_vocab"] = _text_bpe_vocab_oracle()


def q_pack_sequences_bpe_kernel(spark: SparkSession, sf_dir: str
                                ) -> DataFrame:
    """`pack_sequences` fed by the Arrow KERNEL's token counts via
    the relation form (`token_counts=`) — the production-sized-
    tokenizer packing path: past the chain's 256-rule analyzer cap,
    the kernel is the only counter, and it yields a (doc_id, count)
    relation rather than a Column. Oracle: IDENTICAL to
    pack_sequences_bpe (kernel == chain counts is the proven
    equivalence), so a drift in either the kernel or the join-form
    plumbing turns this row red."""
    from torua_spark.functions import bpe
    from torua_spark.sources.catalog import spread_small_scan

    docs = spread_small_scan(load_table(spark, sf_dir, "documents"))
    return smp.pack_sequences(docs, token_counts=bpe.bpe_count_kernel(docs))


QUERIES["pack_sequences_bpe_kernel"] = q_pack_sequences_bpe_kernel
ORACLE["pack_sequences_bpe_kernel"] = _bpe_oracles()["pack_sequences_bpe"]
