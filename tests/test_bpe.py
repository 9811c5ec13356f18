"""Byte-level BPE tokenizer (functions/bpe.py) — r11, VERDICT r10 #3.

Pins: the expression-chain / Arrow-kernel / DuckDB-oracle three-way
agreement, the pre-token boundary semantics, merge-table validation,
and the pack_sequences token_count= integration.
"""

import pytest
from pyspark.sql import functions as F

from tests.oracle import compare
from torua_spark.functions import bpe
from torua_spark.queries import pipeline_q
from torua_spark.sources.catalog import load_table
from torua_spark.sources.local import local_df


def test_chain_kernel_and_oracle_agree_on_corpus(spark, sf_dir):
    """The three implementations are the SAME tokenizer: JVM replace
    chain == iterative min-rank Arrow kernel (the rank-order/min-rank
    equivalence the validated merge property guarantees) == the
    unrolled DuckDB oracle."""
    docs = load_table(spark, sf_dir, "documents")
    chain = docs.select(
        "doc_id", bpe.bpe_token_count("text").alias("n_chain")
    )
    kern = bpe.bpe_count_kernel(docs)
    bad = (
        chain.join(kern, "doc_id")
        .filter(F.col("n_chain") != F.col("n_bpe_tokens"))
        .count()
    )
    assert bad == 0
    compare(
        kern,
        f"SELECT * FROM {bpe.oracle_counts_subquery('documents')} t",
        sf_dir,
    )


def test_registry_oracle_parity(spark, sf_dir):
    """Rotation discipline: the declared entries keep pytest-vs-DuckDB
    parity after they leave the driver window; the oracled extras
    (kernel path, pre-token counts) carry the same check."""
    for name in ("text_bpe_tokens", "pack_sequences_bpe",
                 "text_bpe_kernel", "text_bpe_pretoken_counts"):
        compare(
            pipeline_q.QUERIES[name](spark, sf_dir),
            pipeline_q.ORACLE[name],
            sf_dir,
        )


def test_hand_computed_segmentation(spark):
    """Tiny hand-verified cases under a 2-rule table:
    rule0 fuses (a,a); rule1 fuses (aa,b). Pre-token boundaries sit
    before every space, and a space byte can never be a fusion's
    RIGHT operand mid-pre-token (nothing precedes it in its segment).
    """
    merges = [("61", "61"), ("6161", "62")]
    rows = [
        # "aaab aa" -> pre [aaab][ aa]: [aa,a,b -> aa? no: leftmost
        # fusion aa|ab -> (aa)(a)(b), rule1 needs (aa)(b) adjacency:
        # not adjacent -> 3 tokens; " aa" -> [sp,a,a] -> [sp,aa] -> 2
        (1, "aaab aa", 5),
        # "aaaa" -> (aa)(aa) -> 2 (leftmost non-overlap run fusion)
        (2, "aaaa", 2),
        # "aab" -> (aa)(b) -> rule1 -> (aab) -> 1
        (3, "aab", 1),
        # boundary: "a ab": [a][ ab]; rule0 pair never spans the
        # boundary even though 'a' ends seg1 and 'a' sits in seg2
        (4, "a ab", 4),
        # empty + leading space
        (5, "", 0),
        (6, " a", 2),
    ]
    df = local_df(spark, [(i, t) for i, t, _ in rows],
                  "doc_id long, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe.bpe_token_count("text", merges).alias("n")
        ).collect()
    }
    for i, _, want in rows:
        assert got[i] == want, (i, got[i], want)
    # kernel agrees on the same custom table
    kern = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_count_kernel(df, merges=merges).collect()
    }
    assert kern == got


def test_tokens_roundtrip_and_count(spark, sf_dir):
    """Tokens roundtrip at the BYTE level and the array size equals
    the scalar count — including non-ASCII text, where byte-level
    tokens split UTF-8 multi-byte characters and the render is the
    byte-transparent ISO-8859-1 form (r11 review: per-token UTF-8
    decode crashed on any non-ASCII corpus). Lossless contract:
    re-encoding the concatenated render as ISO-8859-1 recovers the
    original text's exact UTF-8 bytes."""
    docs = (
        load_table(spark, sf_dir, "documents").select("text").limit(50)
        .unionByName(local_df(
            spark,
            [("héllo wörld",), ("日本語 テキスト",), ("emoji 🙂 café",),
             (None,)],
            "text string",
        ))
    )
    bad = docs.select(
        "text",
        bpe.bpe_tokens("text").alias("t"),
        bpe.bpe_token_count("text").alias("n"),
    ).filter(
        (
            F.encode(F.array_join("t", ""), "ISO-8859-1")
            != F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8")
        )
        | (F.size("t") != F.col("n"))
    )
    assert bad.count() == 0


def test_merge_table_validation_rejects_orphan_operand():
    with pytest.raises(ValueError, match="rank 1"):
        bpe._validate([("61", "62"), ("6363", "61")])


def test_merge_table_validation_rejects_duplicate_product():
    """Duplicate products break chain==kernel even when every operand
    exists (r11 review counterexample: rule 4's product '616263'
    re-creates a rank-3 adjacency the chain's finished pass never
    revisits, chain=2 tokens vs kernel=1 on 'abcd')."""
    table = [("62", "63"), ("61", "62"), ("6162", "63"),
             ("616263", "64"), ("61", "6263")]
    with pytest.raises(ValueError, match="duplicates"):
        bpe._validate(table)


def test_apply_merges_validates_explicit_tables(spark):
    """Both public entry points gate invalid tables identically (r11
    review: the chain path previously skipped validation for explicit
    merges= and silently mis-segmented where the kernel raised)."""
    with pytest.raises(ValueError, match="rank 1"):
        bpe.apply_merges(
            bpe.wrapped_hex(F.lit("ab")),
            [("61", "62"), ("6363", "61")],
        )


def test_frozen_fixture_subword_not_saturated():
    """The committed table must stay GENUINELY subword on its
    training corpus: saturation (every word one token) would make
    BPE == whitespace and the oracle check vacuous. Pinned via the
    corpus-wide ratio band recorded when v1 was frozen."""
    from torua_spark.resources.bpe_merges_v1 import MERGES, N_MERGES

    assert N_MERGES == len(MERGES) == 96
    bpe._validate(MERGES)


def test_corpus_ratio_in_divergence_band(spark, sf_dir):
    stats = (
        load_table(spark, sf_dir, "documents")
        .select(
            bpe.bpe_token_count("text").alias("b"),
            F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " ", -1))
            .alias("w"),
        )
        .agg(F.sum("b").alias("b"), F.sum("w").alias("w"))
        .collect()[0]
    )
    ratio = stats["b"] / stats["w"]
    assert 1.2 <= ratio <= 1.6, ratio


def test_pack_sequences_token_count_mode(spark, sf_dir):
    """token_count= changes ONLY the token mass: total packed mass
    equals the corpus BPE token sum, and the default path is
    unchanged whitespace."""
    from torua_spark.operators import sampling as smp

    docs = load_table(spark, sf_dir, "documents")
    packed = smp.pack_sequences(
        docs, token_count=bpe.bpe_token_count("text")
    )
    total = packed.agg(F.sum("tok_mass")).collect()[0][0]
    want = docs.select(
        bpe.bpe_token_count("text").alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert total == want
    # BPE-denominated packing needs MORE sequences than whitespace
    # (the ~28% under-budgeting the mode exists to fix)
    assert packed.count() > smp.pack_sequences(docs).count()


def test_unicode_multibyte_chain_kernel_oracle_agree(spark):
    """Byte-level BPE is byte-exact on multi-byte UTF-8: the chain,
    the kernel, and a Python reference all agree on non-ASCII text
    (each non-ASCII char is 2-4 base tokens before any merge)."""
    texts = [
        (1, "héllo wörld"),
        (2, "日本語 テキスト"),
        (3, "emoji 🙂 and café au lait"),
        (4, "mixed ascii + ñ + 中文"),
    ]
    from torua_spark.sources.local import local_df

    df = local_df(spark, texts, "doc_id long, text string")
    merges = bpe.load_merges()
    chain = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe.bpe_token_count("text").alias("n")
        ).collect()
    }
    kern = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_count_kernel(df).collect()
    }
    assert chain == kern
    # python reference: pre-tokens split before each space, iterative
    # min-rank fusion over raw UTF-8 bytes
    import re

    ranks = bpe._rank_table(merges)
    for i, t in texts:
        want = sum(
            bpe._encode_pretoken(p.encode("utf-8"), ranks)
            for p in re.split(r"(?= )", t) if p
        )
        assert chain[i] == want, (i, chain[i], want)


def test_bpe_train_reproduces_frozen_fixture(spark, sf_dir):
    """PROVENANCE PIN (r11): the engine's distributed trainer on the
    fixture's training corpus reproduces the committed v1 merge table
    bit-for-bit — Spark pre-token counting + the shared merge loop
    (train_from_counts, ONE definition with the offline generator)
    IS the fixture's generation path."""
    from torua_spark.resources.bpe_merges_v1 import MERGES

    got = bpe.bpe_train(
        load_table(spark, sf_dir, "documents"), n_merges=96
    )
    assert got == list(MERGES)


def test_bpe_train_gather_budget_is_loud(spark, sf_dir):
    """The vocabulary gather raises (never silently truncates) when
    distinct pre-tokens exceed the budget — truncation would bias
    low-frequency merges without a trace."""
    with pytest.raises(ValueError, match="max_pretokens"):
        bpe.bpe_train(
            load_table(spark, sf_dir, "documents"), n_merges=4,
            max_pretokens=10,
        )


def test_bpe_train_registry_entry_schema(spark, sf_dir):
    """The registry facade returns the (rank, p, q) relation of the
    same training run, rank-ordered from 0."""
    df = pipeline_q.QUERIES["text_bpe_train"](spark, sf_dir)
    rows = sorted(df.collect(), key=lambda r: r["rank"])
    from torua_spark.resources.bpe_merges_v1 import MERGES

    assert [(r["p"], r["q"]) for r in rows] == list(MERGES)
    assert [r["rank"] for r in rows] == list(range(len(MERGES)))


def test_bpe_train_golden_oracle_full_hash_parity(spark, sf_dir):
    """r13 (VERDICT r12 #1): text_bpe_train's driver row is now a full
    rows+schema+hash check via the golden-literal `VALUES` oracle. At
    this test's sf0.001 the golden IS the frozen v1 fixture; the
    driver-gate (sf0.01) static string and the sf0.1/sf1 renderer
    outputs are pinned structurally below and swept live by
    scripts/verify_driver_contract.py."""
    from torua_spark.resources.bpe_merges_v1 import MERGES

    compare(
        pipeline_q.QUERIES["text_bpe_train"](spark, sf_dir),
        pipeline_q.bpe_train_golden_oracle(MERGES),
        sf_dir,
    )


def test_bpe_train_golden_oracle_renderer_contract():
    """The static ORACLE string renders the sf0.01 (driver-gate,
    500-embedding) golden; ORACLE_BY_N re-renders per SF; an unknown
    corpus size is LOUD (a silent wrong-golden fallback would disguise
    a real training drift as an unexplained hash mismatch); and the
    registry no longer lists any rows-only entry."""
    from torua_spark.queries import _ROWS_ONLY, all_oracle_sql
    from torua_spark.resources.bpe_train_goldens import (
        BY_EMBEDDINGS_N,
        GOLDENS,
    )

    assert _ROWS_ONLY == set()
    static = all_oracle_sql()["text_bpe_train"]
    assert static == pipeline_q._bpe_train_oracle_for_n(500)
    assert BY_EMBEDDINGS_N[500] == "sf0.01"
    assert static == pipeline_q.bpe_train_golden_oracle(GOLDENS["sf0.01"])
    for n, tag in BY_EMBEDDINGS_N.items():
        assert pipeline_q.ORACLE_BY_N["text_bpe_train"](n) == (
            pipeline_q.bpe_train_golden_oracle(GOLDENS[tag])
        )
    with pytest.raises(KeyError, match="make_bpe_train_goldens"):
        pipeline_q._bpe_train_oracle_for_n(12345)
    # r14 (ADVICE r13): the sf_dir tag is the PRIMARY key — counts
    # cannot disambiguate sf0.001 from sf0.01 (both 500/500), so a
    # sweep at sf0.001 must get the sf0.001 golden, not the driver
    # gate's; an uncommitted SF tag is loud.
    assert pipeline_q._bpe_train_oracle_for_n(
        500, sf_dir="/root/testdata/sf0.001"
    ) == pipeline_q.bpe_train_golden_oracle(GOLDENS["sf0.001"])
    assert pipeline_q._bpe_train_oracle_for_n(
        500, sf_dir="/root/testdata/sf0.01"
    ) == static
    assert pipeline_q._bpe_train_oracle_for_n(
        20000, sf_dir="/root/repo/testdata_sf1"
    ) == pipeline_q.bpe_train_golden_oracle(GOLDENS["sf1"])
    assert GOLDENS["sf0.001"] != GOLDENS["sf0.01"]
    # provenance closure: the sf0.001 golden IS the frozen v1 table
    # (the generator and the v1 fixture run the same offline trainer
    # on the same corpus)
    from torua_spark.resources.bpe_merges_v1 import MERGES

    assert GOLDENS["sf0.001"] == list(MERGES)[:96]
    with pytest.raises(KeyError, match="make_bpe_train_goldens"):
        pipeline_q._bpe_train_oracle_for_n(500, sf_dir="/tmp/sf9.9")


def test_bpe_train_golden_matches_spark_at_driver_gate(spark):
    """End-to-end at the DRIVER'S OWN SF (sf0.01): the Spark
    distributed trainer hash-matches the committed offline-generator
    golden — the exact comparison the driver will run. sf0.01 and
    sf0.001 share a row count (500) but not contents, so this is a
    distinct corpus from the provenance pin above."""
    sf01 = "/root/testdata/sf0.01"
    compare(
        pipeline_q.QUERIES["text_bpe_train"](spark, sf01),
        pipeline_q.ORACLE["text_bpe_train"],
        sf01,
    )


def test_pretoken_counts_sentinel_equals_lookahead(spark):
    """The sentinel split (dialect-portable: literal replace + literal
    split) equals the Java-regex lookahead split it replaces,
    including consecutive-space and leading-space shapes."""
    import re

    texts = ["a  b", " lead", "no", "", "x y z", "tab\tkeeps one token"]
    df = local_df(spark, [(i, t) for i, t in enumerate(texts)],
                  "doc_id long, text string")
    got = {
        (r["pre"],): r["cnt"]
        for r in bpe.pretoken_counts(df).collect()
    }
    from collections import Counter

    want = Counter()
    for t in texts:
        for p in re.split(r"(?= )", t):
            if p:
                want[p] += 1
    assert got == {(k,): v for k, v in want.items()}


def test_bpe_vocab_mass_equals_token_count(spark, sf_dir):
    """The vocab relation's total mass equals the corpus token count
    (no token lost or double-counted by the explode), and it matches
    its DuckDB oracle."""
    vocab = pipeline_q.QUERIES["text_bpe_vocab"](spark, sf_dir)
    mass = vocab.agg(F.sum("cnt")).collect()[0][0]
    want = (
        load_table(spark, sf_dir, "documents")
        .select(bpe.bpe_token_count("text").alias("n"))
        .agg(F.sum("n")).collect()[0][0]
    )
    assert mass == want
    compare(vocab, pipeline_q.ORACLE["text_bpe_vocab"], sf_dir)


def test_chain_rule_cap_is_loud(spark):
    """A merge table past the chain's structural cap raises a
    cause-naming error instead of the bare JVM StackOverflowError the
    Catalyst analyzer throws on a 320-deep replace tree (measured:
    OK at 256, overflow at 320 on the default stack); the kernel
    handles the same table (flat in table size)."""
    base = bpe.load_merges()
    extra = [(f"{a:02X}", f"{b:02X}")
             for a in range(0x80, 0xC0) for b in range(0x80, 0xC0)]
    big = (base + extra)[:bpe._CHAIN_MAX_RULES + 1]
    with pytest.raises(ValueError, match="bpe_count_kernel"):
        bpe.apply_merges(bpe.wrapped_hex(F.lit("ab")), big)
    df = local_df(spark, [(1, "hello world")], "doc_id long, text string")
    got = bpe.bpe_count_kernel(df, merges=big).collect()
    # the synthetic high-byte rules never fire on ASCII text, so the
    # count equals the frozen-table count
    want = bpe.bpe_count_kernel(df).collect()
    assert got[0]["n_bpe_tokens"] == want[0]["n_bpe_tokens"]


def test_pack_sequences_relation_mode_equals_column_mode(spark, sf_dir):
    """The token_counts= relation form (the kernel path past the
    chain's 256-rule cap) packs identically to the token_count=
    Column form, and rejects passing both."""
    from torua_spark.operators import sampling as smp

    docs = load_table(spark, sf_dir, "documents")
    via_col = pipeline_q.QUERIES["pack_sequences_bpe"](spark, sf_dir)
    via_rel = pipeline_q.QUERIES["pack_sequences_bpe_kernel"](spark, sf_dir)
    assert sorted(map(tuple, via_col.collect())) == sorted(
        map(tuple, via_rel.collect())
    )
    compare(via_rel, pipeline_q.ORACLE["pack_sequences_bpe_kernel"], sf_dir)
    with pytest.raises(ValueError, match="not both"):
        smp.pack_sequences(
            docs,
            token_count=F.lit(1),
            token_counts=bpe.bpe_count_kernel(docs),
        )


def test_bpe_train_single_corpus_pass(spark, sf_dir):
    """ONE-PASS PIN (VERDICT r11 #2): bpe_train's budget check and
    vocabulary gather share a single bounded collect, so the corpus
    is scanned exactly once. An accumulator inside a mapInPandas
    wrapper counts every row the scan delivers — the pre-fix
    count()+collect() pair scanned the corpus twice (2n)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_rows = docs.count()
    acc = spark.sparkContext.accumulator(0)

    def counting(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    instrumented = docs.mapInPandas(counting, docs.schema)
    got = bpe.bpe_train(instrumented, n_merges=8)
    assert got == bpe.bpe_train(docs, n_merges=8)
    assert acc.value == n_rows, (
        f"corpus scanned {acc.value / n_rows:.1f}x, expected exactly 1x"
    )


def test_train_from_counts_skips_duplicate_products():
    """TRAINER-SIDE duplicate-product guard (ADVICE r11): a candidate
    pair whose product duplicates an earlier rule's product is
    skipped at TRAIN time, so the trainer always emits a table its
    own consumers (_validate in apply_merges / bpe_count_kernel /
    load_merges) accept. The words dict below forces the sequence
    ('61','62') -> ('6162','63') and then leaves ('61','6263') as
    the only remaining candidate — its product '616263' duplicates
    rule 2's, so training must stop rather than emit it."""
    words = {"(61)(62)": 100, "(61)(62)(63)": 50, "(61)(6263)": 30}
    got = bpe.train_from_counts(words, n_merges=10, min_pair_freq=2)
    assert got == [("61", "62"), ("6162", "63")]
    bpe._validate(got)  # consumers accept what the trainer emits


def test_kernel_memo_cap_is_pure(spark, sf_dir):
    """The per-batch pre-token memo is a pure cache: clearing it on
    every insert (memo_cap=1, the adversarial-partition bound from
    VERDICT r11 #5) leaves the counts bit-identical to the default."""
    docs = load_table(spark, sf_dir, "documents")
    capped = sorted(
        map(tuple, bpe.bpe_count_kernel(docs, memo_cap=1).collect())
    )
    default = sorted(map(tuple, bpe.bpe_count_kernel(docs).collect()))
    assert capped == default


def test_pack_sequences_token_counts_shape_is_loud(spark, sf_dir):
    """The token_counts= relation must be exactly (doc_id, count):
    a wider relation raises (instead of silently binding an arbitrary
    column as token mass) and a doc_id-only relation raises (instead
    of a bare IndexError) — ADVICE r11."""
    from torua_spark.operators import sampling as smp

    docs = load_table(spark, sf_dir, "documents")
    wide = bpe.bpe_count_kernel(docs).withColumn("extra", F.lit(1))
    with pytest.raises(ValueError, match="2-column"):
        smp.pack_sequences(docs, token_counts=wide)
    with pytest.raises(ValueError, match="2-column"):
        smp.pack_sequences(docs, token_counts=docs.select("doc_id"))


# --- production-sized (32k-rule) table, VERDICT r11 #3 ----------------------


def test_large_fixture_valid_and_chain_refuses():
    """The committed 32 768-rule table passes the consumer validation
    (operand closure, unique products) and sits two orders past the
    expression chain's structural cap — the kernel is its only path,
    by design."""
    large = bpe.load_merges_large()
    assert len(large) == 32_768
    with pytest.raises(ValueError, match="structural cap"):
        bpe.apply_merges(F.lit("x"), large)


def test_large_fixture_trainer_equivalence_gate():
    """The incremental trainer that generated the fixture implements
    EXACTLY train_from_counts' selection semantics (argmax,
    (-count, pair) tie-break, min freq, duplicate-product skip):
    bit-for-bit equal output on a lexicon subset."""
    from scripts.make_large_bpe_fixture import build_lexicon, train_fast

    sub = dict(sorted(build_lexicon().items())[:300])
    ref = bpe.train_from_counts(
        {bpe._wrap_hex_py(w): c for w, c in sub.items()}, 200, 2
    )
    assert train_fast(sub, 200, 2) == ref


def test_large_fixture_fuses_common_words_to_single_tokens():
    """Production-vocabulary behavior: common space-attached words
    are SINGLE tokens under the large table (they are multi-token
    under the 96-rule v1 fixture)."""
    ranks = bpe._rank_table(bpe.load_merges_large())
    ranks_v1 = bpe._rank_table(bpe.load_merges())
    for w in (" the", " window", " table", " spark", " customer",
              " international"):
        assert bpe._encode_pretoken(w.encode(), ranks) == 1, w
    assert bpe._encode_pretoken(" international".encode(), ranks_v1) > 1


def _chain_count_py(text: str, merges) -> int:
    """Rank-order full-fusion count in pure Python string replaces —
    the expression chain's ALGORITHM without the Catalyst analyzer's
    structural cap, so chain == kernel equivalence is checkable at
    32k rules too (the load-time _validate proof says they must
    agree; this exercises it on real text)."""
    hx = (text or "").encode("utf-8").hex().upper()
    s = "".join(f"({hx[i:i + 2]})" for i in range(0, len(hx), 2))
    s = s.replace("(20)", "|(20)")
    for p, q in merges:
        s = s.replace(f"({p})({q})", f"({p}{q})")
    return s.count("(")


def test_kernel_large_table_end_to_end(spark, sf_dir):
    """The production path at production vocab scale: kernel counts
    on the 32k table match the rank-order reference per-document;
    pack_sequences(token_counts=) and source_cap consume them; the
    divergence band orders as whitespace <= large < v1 (the large
    table fuses common words the tiny fixture can't)."""
    from torua_spark.operators import sampling as smp

    large = bpe.load_merges_large()
    docs = load_table(spark, sf_dir, "documents")
    kc = bpe.bpe_count_kernel(docs, merges=large)
    counts = {r["doc_id"]: r["n_bpe_tokens"] for r in kc.collect()}
    for r in docs.limit(4).collect():
        assert counts[r["doc_id"]] == _chain_count_py(r["text"], large)
    packed = smp.pack_sequences(docs, token_counts=kc)
    assert packed.agg(F.sum("tok_mass")).collect()[0][0] == sum(
        counts.values()
    )
    capped = smp.source_cap(docs, cap=10)
    cap_mass = (
        capped.select("doc_id")
        .join(bpe.bpe_count_kernel(docs, merges=large), "doc_id")
        .agg(F.sum("n_bpe_tokens")).collect()[0][0]
    )
    assert 0 < cap_mass <= sum(counts.values())
    # divergence band (pinned loosely — the exact ratios are SCALE.md
    # measurement rows): whitespace <= large-table <= v1-table mass
    ws = docs.select(
        F.size(F.split(F.trim(F.col("text")), " +")).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    v1_mass = docs.select(
        bpe.bpe_token_count("text").alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert ws <= sum(counts.values()) < v1_mass


# --- token_mode='bpe' across the stats family (VERDICT r11 #8) ---------------


def test_token_mode_bpe_text_stats(spark, sf_dir):
    """text_stats(token_mode='bpe') re-denominates avg_tokens in BPE
    tokens: per-lang total mass matches the projection counter; the
    whitespace mode is unchanged."""
    from torua_spark.operators import text_analysis as ta

    docs = load_table(spark, sf_dir, "documents")
    got = {r["lang"]: r for r in ta.text_stats(docs, "bpe").collect()}
    want = {
        r["lang"]: (r["n"], r["s"])
        for r in docs.select("lang", bpe.bpe_token_count("text").alias("t"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("t").alias("s"))
        .collect()
    }
    for lang, (n, s) in want.items():
        assert got[lang]["n_docs"] == n
        assert abs(got[lang]["avg_tokens"] - s / n) < 1e-3
    ws = {r["lang"]: r for r in ta.text_stats(docs).collect()}
    assert all(ws[g]["avg_tokens"] <= got[g]["avg_tokens"] for g in got)
    with pytest.raises(ValueError, match="token_mode"):
        ta.text_stats(docs, "chars")


def test_token_mode_bpe_repetition_hand_example(spark):
    """BPE-mode repetition grams run over the hex token-id stream: a
    doc that repeats one word gives top_bigram_frac 1.0 in BOTH modes
    when the word is multi-token (its internal bigram repeats too),
    and the gram counts are token-denominated."""
    from torua_spark.operators import text_analysis as ta

    df = local_df(
        spark, [(1, "zq zq zq zq")], "doc_id long, text string"
    )
    n_tok = df.select(bpe.bpe_token_count("text").alias("n")).collect()[0]["n"]
    row = ta.repetition_scores(df, token_mode="bpe").collect()[0]
    assert row["n_bigrams"] == n_tok - 1
    ws_row = ta.repetition_scores(df).collect()[0]
    assert ws_row["n_bigrams"] == 3  # 4 words -> 3 word bigrams
    # the repeated ' zq' unit repeats its token bigram at least
    # twice among the n_tok - 1 token bigrams
    assert ws_row["top_bigram_frac"] == 1.0
    assert row["top_bigram_frac"] >= 2.0 / (n_tok - 1)


def test_token_mode_bpe_quality_gate_feature_space(spark):
    """feature_hash_embed('bpe') hashes the hex token ids (md5_32
    bucket/sign on the id string), and linear_quality_score passes
    token_mode through — weights addressed in the BPE feature space
    move the score, pinned against a hand computation."""
    import hashlib

    from torua_spark.operators import text_analysis as ta

    df = local_df(spark, [(1, "ab cd")], "doc_id long, text string")
    hexes = [
        r["h"] for r in df.select(
            F.explode(bpe.bpe_token_hex_array("text")).alias("h")
        ).collect()
    ]
    want_buckets = set()
    for h in hexes:
        v = int(hashlib.md5(h.encode()).hexdigest()[:8], 16)
        want_buckets.add(v % 64)
    got = ta.feature_hash_embed(df, 64, token_mode="bpe").collect()
    assert {r["bucket"] for r in got} <= want_buckets
    scored = ta.linear_quality_score(
        df, weights={b: 1.0 for b in want_buckets}, token_mode="bpe"
    ).collect()[0]
    assert scored["logit"] != 0.0


def test_token_mode_bpe_repetition_oracle_parity(spark, sf_dir):
    from torua_spark.queries import rag_q

    compare(
        rag_q.QUERIES["text_repetition_bpe"](spark, sf_dir),
        rag_q.ORACLE["text_repetition_bpe"],
        sf_dir,
    )


# --- long-pre-token heap encoder (r12 100TB robustness) ----------------------


def test_heap_encoder_equals_rescan_on_adversarial_runs():
    """The O(L log L) heap encoder (`_encode_pretoken_long`, used past
    _LONG_PRETOKEN bytes) is EXACT vs the rescan reference on the
    inputs where fusion order matters: homogeneous runs ('aaaa...'),
    alternations, and real-word repeats — under both the v1 and the
    32k production table."""
    for merges in (bpe.load_merges(), bpe.load_merges_large()):
        ranks = bpe._rank_table(merges)
        cases = [
            b"a" * 501,
            b"ab" * 300,
            b"aab" * 211,
            b" the" * 200,
            b"international" * 40,
            bytes(range(256)) * 3,
            b"e" * 257 + b"x",
        ]
        for pre in cases:
            got_heap = bpe._encode_pretoken_long(pre, ranks)
            # rescan reference (the dispatch-free loop, inlined):
            toks = [pre[i:i + 1] for i in range(len(pre))]
            while len(toks) > 1:
                best_rank, best_pair = None, None
                for pair in zip(toks, toks[1:]):
                    r = ranks.get(pair)
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_pair = r, pair
                if best_pair is None:
                    break
                p, q = best_pair
                out, i = [], 0
                while i < len(toks):
                    if (i + 1 < len(toks) and toks[i] == p
                            and toks[i + 1] == q):
                        out.append(p + q)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                toks = out
            assert got_heap == len(toks), (pre[:20], len(pre))


def test_heap_encoder_property_random_bytes():
    """Hypothesis sweep: heap == rescan on random byte strings under
    the v1 table (short strings exercise the stale-entry and
    same-pair-overlap paths densely)."""
    from hypothesis import given, settings, strategies as st

    ranks = bpe._rank_table(bpe.load_merges())

    @settings(max_examples=300, deadline=None)
    @given(st.binary(min_size=0, max_size=48))
    def check(pre):
        toks = [pre[i:i + 1] for i in range(len(pre))]
        while len(toks) > 1:
            best_rank, best_pair = None, None
            for pair in zip(toks, toks[1:]):
                r = ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, pair
            if best_pair is None:
                break
            p, q = best_pair
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == p and toks[i + 1] == q:
                    out.append(p + q)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        assert bpe._encode_pretoken_long(pre, ranks) == len(toks)

    check()


def test_long_pretoken_dispatch_and_wallclock():
    """A space-free megabyte blob (the 100 TB hazard case: base64 /
    minified text) encodes in well under a second via the heap path —
    the rescan loop's O(L^2) would take minutes."""
    import time

    ranks = bpe._rank_table(bpe.load_merges_large())
    blob = (b"QWJjZGVmZ2hpamtsbW5vcHFyc3R1dnd4eXo" * 30000)[:1_000_000]
    t0 = time.perf_counter()
    n = bpe._encode_pretoken(blob, ranks)
    dt = time.perf_counter() - t0
    assert 0 < n <= len(blob)
    assert dt < 10.0, f"long-pretoken encode took {dt:.1f}s"


def _cjk_blob(n_chars: int, seed: bytes = b"cjk") -> str:
    """Deterministic CJK text (Unicode 4E00-9FFF, 3 utf-8 bytes per
    char, NO spaces — the whole blob is one pre-token)."""
    import hashlib

    out = []
    h = hashlib.md5(seed).hexdigest()
    while len(out) < n_chars:
        h = hashlib.md5(h.encode()).hexdigest()
        for i in range(0, 32, 4):
            out.append(chr(0x4E00 + (int(h[i:i + 4], 16) % 0x5200)))
    return "".join(out[:n_chars])


import functools


@functools.lru_cache(maxsize=1)
def _cjk_merge_table() -> tuple:
    """A merge table TRAINED on the CJK distribution (the 32k
    English-trained fixture applies zero merges to CJK bytes, which
    would make the exactness check vacuous): 96 rules over chunked
    blobs — enough for a 1.3-1.6x bytes/token fusion rate, so the
    heap genuinely cascades."""
    from collections import Counter

    from torua_spark.functions import bpe

    words = Counter()
    for i in range(100):
        hx = _cjk_blob(48, seed=b"train-%d" % i).encode("utf-8").hex().upper()
        words["".join(f"({hx[j:j + 2]})" for j in range(0, len(hx), 2))] += 1
    return tuple(bpe.train_from_counts(words, 96))


def test_cjk_nospace_long_pretoken_kernel_exact(spark):
    """r13 stretch (VERDICT r12 #8): CJK scripts have no spaces, so a
    whole document is ONE pre-token — exactly the no-space-blob shape
    the r12 heap encoder targets, now on multi-byte UTF-8. Pin: the
    kernel under a CJK-trained table (fusions genuinely fire — see
    the fused-ratio assert) equals an O(L^2) reference rescan (the
    readable loop, inlined here without the length delegation) on
    2,000-char / 6,000-byte blobs — 23x the heap threshold — so the
    O(L log L) path is EXACT on CJK, and the Arrow plumbing
    round-trips the multi-byte text unchanged."""
    from torua_spark.functions import bpe
    from torua_spark.sources.local import local_df

    BIG = _cjk_merge_table()
    texts = [(i, _cjk_blob(2000, seed=b"cjk-%d" % i)) for i in range(3)]
    df = local_df(spark, texts, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_count_kernel(df, merges=list(BIG)).collect()
    }

    ranks = bpe._rank_table(list(BIG))

    def rescan(pre: bytes) -> int:  # _encode_pretoken sans delegation
        toks = [pre[i:i + 1] for i in range(len(pre))]
        while len(toks) > 1:
            best_rank, best_pair = None, None
            for pair in zip(toks, toks[1:]):
                r = ranks.get(pair)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, pair
            if best_pair is None:
                break
            p, q = best_pair
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == p and toks[i + 1] == q:
                    out.append(p + q)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return len(toks)

    for i, t in texts:
        raw = t.encode("utf-8")
        assert len(raw) > bpe._LONG_PRETOKEN  # heap path engaged
        assert got[i] == rescan(raw), i
        assert got[i] <= len(raw) - 300, "fusions did not fire"


def test_cjk_heap_encoder_scales_linearithmically():
    """The heap encoder's cost on CJK blobs grows ~O(L log L), not
    O(L^2): 8x the length must cost well under 8^2 = 64x — the loud
    bound is 16x, far above linearithmic noise but far below
    quadratic. (The SCALE.md row records the measured ratios.)"""
    import time

    from torua_spark.functions import bpe

    ranks = bpe._rank_table(list(_cjk_merge_table()))
    small = _cjk_blob(2048).encode("utf-8")
    big = _cjk_blob(16384).encode("utf-8")
    # warm both paths once (dict/alloc effects), then time
    bpe._encode_pretoken_long(small, ranks)
    t0 = time.perf_counter()
    bpe._encode_pretoken_long(small, ranks)
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    bpe._encode_pretoken_long(big, ranks)
    t_big = time.perf_counter() - t0
    assert t_big / t_small < 16, (t_small, t_big)


def test_rotated_out_text_stats_bpe_vs_oracle(spark, sf_dir):
    """Rotation discipline (r13): text_stats_bpe left the driver
    window for text_repetition_bpe; it keeps full pytest-vs-DuckDB
    hash parity here."""
    compare(
        pipeline_q.QUERIES["text_stats_bpe"](spark, sf_dir),
        pipeline_q.ORACLE["text_stats_bpe"],
        sf_dir,
    )
