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


def _token_array(token_mode: str):
    """The stats family's token stream selector (VERDICT r11 #8):
    'ws' = whitespace words (the historical denominator), 'bpe' = the
    frozen-table BPE token ids as wrapped-hex strings (engine-portable
    — the DuckDB oracles split the unrolled chain identically). Every
    downstream shape (explode, size, gram windows, feature hashing) is
    token-stream-agnostic, so the whole quality pipeline can budget in
    real tokenizer tokens by flipping one argument."""
    if token_mode == "ws":
        return tokens("text")
    if token_mode == "bpe":
        from torua_spark.functions.bpe import bpe_token_hex_array

        return bpe_token_hex_array("text")
    raise ValueError(
        f"token_mode must be 'ws' or 'bpe', got {token_mode!r}"
    )


def text_stats(documents: DataFrame, token_mode: str = "ws") -> DataFrame:
    """Per-language corpus stats: doc count, avg chars, avg token
    count (declared `text_stats`; ``token_mode='bpe'`` re-denominates
    avg_tokens in real tokenizer tokens — whitespace runs 25-40%
    under on this corpus)."""
    return (
        documents.select("lang", "n_chars",
                         F.size(_token_array(token_mode)).alias("n_tokens"))
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
    is vocabulary-sized — sublinear (Heaps' law) but unbounded, so it
    carries NO broadcast hint: AQE broadcasts it when the measured
    size fits and falls back to a shuffle join at scale. Only the
    corpus total is a forced-broadcast scalar. Per-doc reduce is a
    partial+final aggregation."""
    spark_parallelism = documents.sparkSession.sparkContext.defaultParallelism
    tok = documents.repartition(spark_parallelism, "doc_id").select(
        "doc_id", F.explode(tokens("text")).alias("t")
    )
    uni = tok.groupBy("t").agg(F.count(F.lit(1)).alias("cnt"))
    total = uni.agg(F.sum("cnt").alias("total"))
    return (
        tok.join(uni, "t")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            round4(
                F.avg(-F.log(F.col("cnt").cast("double") / F.col("total")))
            ).alias("avg_nll"),
        )
    )


def vocabulary_report(documents: DataFrame, top_k: int = 50) -> DataFrame:
    """Corpus vocabulary analytics (tokenizer/vocab design): the top-k
    terms by occurrence count with document frequency, rank, and
    cumulative corpus coverage — the Zipf head a BPE/vocab budget is
    chosen against.

    Scale shape: one (term) partial+final count aggregation (term
    cardinality ≈ vocabulary, not corpus), doc frequency via
    count_distinct in the same pass, corpus total as a broadcast
    scalar; top-k is orderBy().limit() (TakeOrderedAndProject — O(k)
    per partition, no global sort), and the cumulative-coverage window
    runs over the k-row result only."""
    from pyspark.sql import Window

    tok = documents.select("doc_id", F.explode(tokens("text")).alias("t"))
    counts = tok.groupBy("t").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    total = counts.agg(F.sum("n_occurrences").alias("total"))
    top = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("t").asc()
    ).limit(top_k)
    w = (
        Window.orderBy(F.col("n_occurrences").desc(), F.col("t").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.col("t").alias("term"),
            "n_occurrences",
            "n_docs",
            F.row_number().over(
                Window.orderBy(F.col("n_occurrences").desc(), F.col("t").asc())
            ).cast("int").alias("rank"),
            round4(
                F.sum("n_occurrences").over(w) / F.col("total")
            ).alias("coverage"),
        )
    )


def repetition_scores(documents: DataFrame,
                      token_mode: str = "ws") -> DataFrame:
    """Gopher-style within-document repetition rules (Rae et al. 2021
    §A1.1, the published heuristics — the line-based variants degenerate
    on this single-line corpus, so the n-gram family carries the
    signal): per doc,

    - ``top_bigram_frac``: occurrences of the most frequent word
      2-gram / total 2-gram occurrences (Gopher drops docs > 0.18)
    - ``dup_trigram_frac``: occurrences of 3-grams that appear more
      than once / total 3-gram occurrences (Gopher's duplicate
      n-gram-character rule reduced to token occurrences)

    ``token_mode='bpe'`` (r12, VERDICT r11 #8): grams over the BPE
    token-id stream instead of whitespace words — the denominator a
    tokenizer-budgeted pipeline filters in (a doc that repeats a
    phrase repeats its token n-grams identically; subword grams also
    catch repetition inside space-free runs whitespace grams cannot
    see).

    Plan shape: ONE tokenize+posexplode pass feeds both gram sizes via
    lead windows partitioned by doc_id (no second scan); each rule is
    a (doc_id, gram) partial+final count then a per-doc aggregate —
    shuffle keys are (doc_id, gram) and doc_id, both corpus-scalable,
    never a global key. Docs shorter than n words emit NULL fractions
    (no gram mass to judge).
    """
    from pyspark.sql import Window

    parallelism = documents.sparkSession.sparkContext.defaultParallelism
    w = Window.partitionBy("doc_id").orderBy("pos")
    tok = documents.repartition(parallelism, "doc_id").select(
        "doc_id", F.posexplode(_token_array(token_mode)).alias("pos", "w")
    )
    grams = (
        tok.withColumn("w1", F.lead("w", 1).over(w))
        .withColumn("w2", F.lead("w", 2).over(w))
        .select(
            "doc_id",
            F.when(
                F.col("w1").isNotNull(), F.concat_ws(" ", "w", "w1")
            ).alias("g2"),
            F.when(
                F.col("w2").isNotNull(), F.concat_ws(" ", "w", "w1", "w2")
            ).alias("g3"),
        )
    )

    def _rule(col: str, top: bool) -> DataFrame:
        per_gram = (
            grams.filter(F.col(col).isNotNull())
            .groupBy("doc_id", col)
            .agg(F.count(F.lit(1)).alias("c"))
        )
        num = F.max("c") if top else F.sum(F.when(F.col("c") > 1, F.col("c")))
        return per_gram.groupBy("doc_id").agg(
            round4(num / F.sum("c")).alias("frac"), F.sum("c").alias("n")
        )

    top2 = _rule("g2", top=True).withColumnsRenamed(
        {"frac": "top_bigram_frac", "n": "n_bigrams"}
    )
    dup3 = _rule("g3", top=False).withColumnsRenamed(
        {"frac": "dup_trigram_frac", "n": "n_trigrams"}
    )
    return (
        documents.select("doc_id")
        .join(top2, "doc_id", "left")
        .join(dup3, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            "top_bigram_frac",
            F.col("n_trigrams").cast("long").alias("n_trigrams"),
            # no duplicated gram -> 0.0; no grams at all -> NULL
            F.when(
                F.col("n_trigrams").isNotNull(),
                F.coalesce("dup_trigram_frac", F.lit(0.0)),
            ).alias("dup_trigram_frac"),
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


def feature_hash_embed(documents: DataFrame, dim: int = 64,
                       token_mode: str = "ws") -> DataFrame:
    """Hashing-trick featurization (Weinberger et al. 2009 — the
    model-free embedding a pipeline can compute at ingest): token t
    maps to bucket md5_32(t) % dim with sign from the hash's next bit;
    bucket weights are signed counts, L2-normalized per document.
    Emitted SPARSE — (doc_id, bucket, weight) rows for non-zero
    buckets — which is both the scale-friendly storage form and an
    exactly oracle-matchable relation; densifying is a client-side
    transform.

    Plan: one tokenize+explode pass, one (doc, bucket) partial+final
    sum, the norm via a window over the doc's ≤dim bucket rows. No
    vocabulary state anywhere — the whole point of the hashing trick
    at 100 TB.

    ``token_mode='bpe'``: hash the BPE token-id stream instead of
    whitespace words — the feature space a tokenizer-aligned quality
    model trains in (same plan shape; the hashed unit changes)."""
    tok = documents.select(
        "doc_id", F.explode(_token_array(token_mode)).alias("t")
    )
    return hashed_sparse(tok, ["doc_id"], dim)


def hashed_sparse(tok: DataFrame, keys: list[str], dim: int = 64) -> DataFrame:
    """Shared hashing-trick core: (keys..., t) token rows -> sparse
    L2-normalized (keys..., bucket, weight). Used per document
    (`feature_hash_embed`), per chunk and per query
    (`retrieval.hashed_retrieval`)."""
    from pyspark.sql import Window

    h = md5_32(F.col("t"))
    bucketed = tok.select(
        *keys,
        F.pmod(h, F.lit(dim)).cast("int").alias("bucket"),
        F.when(F.pmod(F.floor(h / F.lit(dim)), F.lit(2)) == 0, F.lit(1.0))
        .otherwise(F.lit(-1.0))
        .alias("sign"),
    )
    s = bucketed.groupBy(*keys, "bucket").agg(F.sum("sign").alias("s"))
    nz = s.filter(F.col("s") != 0)
    w = Window.partitionBy(*keys)
    return nz.select(
        *keys,
        "bucket",
        round4(F.col("s") / F.sqrt(F.sum(F.col("s") * F.col("s")).over(w))).alias(
            "weight"
        ),
    )


def linear_quality_score(
    documents: DataFrame,
    weights: dict[int, float],
    bias: float = 0.0,
    dim: int = 64,
    threshold: float = 0.5,
    token_mode: str = "ws",
) -> DataFrame:
    """Model-free quality-classifier INFERENCE (the fastText-style
    linear gate between the Gopher heuristics and a perplexity proxy —
    the standard learned quality filter in LLM data pipelines, e.g.
    CCNet/GPT-3's quality LR): score = sigmoid(w · x + bias) over the
    hashing-trick features of :func:`feature_hash_embed`, with the
    trained weight vector supplied as a plain ``{bucket: weight}``
    dict (trained offline; dim entries, so it always fits a literal).

    Spark-first plan — pure JVM end to end: the weight vector becomes
    a MAP LITERAL indexed per feature row (no join, no Python), the
    dot product is one sum per doc over its <= dim non-zero feature
    rows, and the left join back to ``documents`` gives FEATURE-LESS
    docs their prior sigmoid(bias). Note the edge semantics honestly
    (r9 review): an empty/whitespace-only ``text`` tokenizes to the
    single empty token (``split`` semantics, identical in DuckDB), so
    such docs carry ONE real hashed feature — md5("")'s bucket with
    weight ±1 — not the prior; the prior path fires only when a doc
    produces no non-zero feature row (signed bucket counts that all
    cancel). Deterministic and cross-engine identical either way;
    strip empty docs upstream if they should score as priors. Cost:
    the one
    (doc, bucket) aggregation feature hashing already pays + one
    doc-keyed agg — linear in corpus tokens, no vocabulary state,
    nothing to broadcast but dim doubles. At 100 TB this is the same
    shape as token counting.

    Returns (doc_id, logit, quality, keep) — scalars only (driver
    canon); logit/quality are round4'd, ``keep`` is quality >=
    threshold on the rounded value so both engines compare identical
    numbers. ``token_mode='bpe'`` scores over BPE-token features
    (pass weights trained in that feature space)."""
    feats = feature_hash_embed(documents, dim, token_mode)
    pairs: list = []
    for b in sorted(weights):
        pairs.extend((F.lit(int(b)), F.lit(float(weights[b]))))
    wmap = F.create_map(*pairs)
    dot = feats.select(
        "doc_id",
        (F.col("weight") * F.coalesce(wmap[F.col("bucket")], F.lit(0.0))).alias("xw"),
    ).groupBy("doc_id").agg(F.sum("xw").alias("dot"))
    logit = F.coalesce(F.col("dot"), F.lit(0.0)) + F.lit(float(bias))
    quality = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return (
        documents.select("doc_id")
        .join(dot, "doc_id", "left")
        .select(
            "doc_id",
            round4(logit).alias("logit"),
            round4(quality).alias("quality"),
            (round4(quality) >= F.lit(float(threshold))).alias("keep"),
        )
    )


# Conservative patterns that parse identically in Spark (Java regex)
# and DuckDB (RE2): no lookarounds, no \b.
PII_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
PII_URL_RE = "https?://[^ ]+"


def redact_pii(documents: DataFrame) -> DataFrame:
    """PII-style masking pass (the pretraining-cleanup step that
    rewrites text): emails then URLs replaced with fixed mask tokens,
    reported as (doc_id, n_emails, n_urls, redacted_md5, changed).
    The digest stands in for the rewritten body so the relation stays
    32 B/doc; the masking expressions are pure regexp_replace inside
    the scan stage — a rewrite pass costs exactly one corpus read.

    Patterns avoid lookarounds/anchors so the Java and RE2 engines
    agree; the oracle runs the same two-stage replace."""
    emails = F.regexp_count(F.col("text"), F.lit(PII_EMAIL_RE))
    red1 = F.regexp_replace(F.col("text"), PII_EMAIL_RE, "<EMAIL>")
    urls_in_red1 = F.regexp_count(red1, F.lit(PII_URL_RE))
    red2 = F.regexp_replace(red1, PII_URL_RE, "<URL>")
    return documents.select(
        "doc_id",
        emails.cast("long").alias("n_emails"),
        urls_in_red1.cast("long").alias("n_urls"),
        F.md5(red2).alias("redacted_md5"),
        (red2 != F.col("text")).alias("changed"),
    )


def remove_boilerplate_lines(documents: DataFrame, min_docs: int = 3,
                             id_col: str = "doc_id", text_col: str = "text",
                             sep: str = "\n",
                             hash_lines: bool = False) -> DataFrame:
    """CCNet-style line-level boilerplate removal: a line (trimmed,
    ``sep``-delimited segment) that appears in >= ``min_docs`` DISTINCT
    documents is boilerplate (nav bars, cookie banners, license
    headers) and is dropped from every document; blank lines are never
    boilerplate. Returns (id_col, clean_text, n_lines, n_removed) —
    documents whose every line is boilerplate survive with
    ``clean_text = ''`` so the corpus row set is stable.

    Plan shape (the 100 TB contract): one generate (posexplode, no
    shuffle) feeding TWO consumers that both key on the line — a
    count-distinct aggregation to find boilerplate and a left-anti
    join to drop it — then one reassembly aggregation on the document
    id. Three shuffles total; the boilerplate side is tiny after the
    HAVING filter, so AQE broadcasts the anti-join. With
    ``hash_lines=True`` the aggregation/join key is ``xxhash64(line)``
    (8 bytes instead of the line text) — the CCNet trick for
    shuffle-volume at corpus scale, at an astronomically small
    collision risk (documented, off by default so the exact-string
    path stays oracle-matchable).

    Reference parity: the reference documents a cleaning pipeline over
    raw documents (README.md:195-208); this is the standard line-dedup
    pass every pretraining pipeline runs before MinHash.
    """
    import re as _re

    lines = documents.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias("pos", "line"),
    )
    norm = F.trim(F.col("line"))
    key = F.xxhash64(norm) if hash_lines else norm
    boiler = (
        lines.filter(norm != "")
        .select(key.alias("bkey"), id_col)
        .groupBy("bkey")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= F.lit(min_docs))
        .select("bkey")
    )
    kept = lines.join(boiler, key == F.col("bkey"), "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s.line,
            ),
            sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = documents.select(
        id_col,
        F.size(F.split(F.col(text_col), _re.escape(sep))).cast("long").alias("n_lines"),
    )
    return totals.join(reassembled, id_col, "left").select(
        id_col,
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        F.col("n_lines"),
        (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
    )


def dedup_doc_lines(documents: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", sep: str = "\n") -> DataFrame:
    """Intra-document line dedup (the CCNet companion pass to
    ``remove_boilerplate_lines``): within each document keep only the
    FIRST occurrence of every repeated (trimmed) line — killing
    within-page repetition (repeated nav blocks, pagination echoes)
    without any cross-document state. Blank lines are preserved
    wherever they appear (they are structure, not content). Returns
    (id_col, clean_text, n_lines, n_removed).

    One explode + one window keyed (doc, line) ordered by position +
    one reassembly aggregation — every shuffle keys on the document
    id, so at 100 TB this co-partitions with any other per-doc pass
    (and on a doc-bucketed table the shuffles vanish)."""
    import re as _re

    from pyspark.sql import Window

    lines = documents.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias("pos", "line"),
    )
    norm = F.trim(F.col("line"))
    w = Window.partitionBy(id_col, norm).orderBy("pos")
    kept = (
        lines.withColumn("occ", F.row_number().over(w))
        .filter((F.col("occ") == 1) | (norm == ""))
    )
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s.line,
            ),
            sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = documents.select(
        id_col,
        F.size(F.split(F.col(text_col), _re.escape(sep))).cast("long").alias("n_lines"),
    )
    return totals.join(reassembled, id_col, "left").select(
        id_col,
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        F.col("n_lines"),
        (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_removed"),
    )


def bigram_logprob(documents: DataFrame, alpha: float = 1.0) -> DataFrame:
    """Bigram language-model quality score — `unigram_logprob`'s
    context-aware sibling and the closest cheap proxy to
    perplexity-based corpus filtering: per-doc mean negative log of
    the add-``alpha``-smoothed conditional
    ``P(w_i | w_{i-1}) = (c(w_{i-1} w_i) + a) / (c(w_{i-1}) + a*V)``
    under the corpus's own counts. Low = fluent under corpus
    statistics; high = surprising transitions (boilerplate soup,
    shuffled text, OCR noise).

    Plan shape: the (doc, pos, token) relation is built once inside
    the scan (posexplode); consecutive pairs come from a SELF-join on
    (doc_id, pos+1) that rides one doc-keyed shuffle; the bigram and
    context count tables are vocabulary-sized (no broadcast hint —
    AQE decides, same rationale as unigram); the per-doc reduce is
    partial+final. Deterministic: counts are exact integers, the only
    float is the final smoothed log, round4-rounded."""
    tok = documents.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "t")
    )
    nxt = tok.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("t").alias("t2")
    )
    pairs = tok.join(nxt, ["doc_id", "pos"])
    big = pairs.groupBy("t", "t2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = pairs.groupBy("t").agg(F.count(F.lit(1)).alias("c1"))
    vocab = tok.agg(F.count_distinct("t").alias("v"))
    return (
        pairs.join(big, ["t", "t2"])
        .join(ctx, "t")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            round4(
                F.avg(
                    -F.log(
                        (F.col("c12") + F.lit(float(alpha)))
                        / (F.col("c1") + F.lit(float(alpha)) * F.col("v"))
                    )
                )
            ).alias("avg_nll"),
        )
    )
