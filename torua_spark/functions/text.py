"""Text expressions for the LLM-data-pipeline operators.

Content hashing uses md5 (native, byte-identical in Spark and DuckDB)
truncated to 32 bits — the portable analog of a fast content hash.
Routing keeps FNV-1a (functions.hashing) because the *reference's*
placement contract depends on it; content dedup only needs a uniform
deterministic hash, so the cheaper native one wins.

Everything here is higher-order array expressions — fully
whole-stage-codegen'd, linear in corpus size — except
``word_gram_digests``, the deliberate Arrow-vectorized twin of
``md5_32∘word_shingles`` for contexts where the HOF's interpreted
lambda evaluation is the bottleneck and row windows are unavailable
(streaming micro-batches).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, functions as F, types as T

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (the documents corpus is single-space
    separated; matches DuckDB string_split)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.split(col, " ")


def md5_32(col: Column) -> Column:
    """First 32 bits of md5 as a non-negative BIGINT — the portable
    content hash (identical SQL: ('0x' || substr(md5(x),1,8))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string>. Inputs
    shorter than n words yield an empty array (sequence(1,0) would
    otherwise produce a *descending* [1,0] — guarded)."""
    w = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(w, (i + j).cast("int")) for j in range(n)]),
    )
    return F.when(F.size(w) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def word_gram_digests(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram md5_32 digests as an array<long> — the
    ARROW path for per-batch shingling (VERDICT r6 #3). Bit-identical
    to ``md5_32`` over ``word_shingles`` (parity-pinned in
    tests/test_streaming.py), but evaluated as one Python pass per
    Arrow batch instead of Spark's interpreted HOF lambda evaluator
    (no codegen for higher-order functions: ~2 lambda evals per gram
    per doc). Built for the streaming decontamination probe, where
    row windows (the fast batch explode+lead formulation,
    dedup._shingle_rows) are illegal and the HOF was the measured
    per-trigger bottleneck; usable anywhere the digest array (not the
    gram text) is the payload."""
    import hashlib  # noqa: PLC0415

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def digests(s: pd.Series) -> pd.Series:
        md5 = hashlib.md5
        out = []
        for t in s:
            ws = t.split(" ") if t else []
            if len(ws) < n:
                out.append([])
                continue
            # distinct on gram TEXT first (array_distinct semantics),
            # then digest — dedup before the hash work, not after
            grams = {" ".join(ws[i : i + n]): None
                     for i in range(len(ws) - n + 1)}
            out.append(
                [int.from_bytes(md5(g.encode()).digest()[:4], "big")
                 for g in grams]
            )
        return pd.Series(out)

    return digests(F.col(col) if isinstance(col, str) else col)


def char_shingles(col: Column | str, n: int = 8) -> Column:
    """Distinct character n-gram shingles (for fingerprinting); same
    short-input guard as word_shingles."""
    c = F.col(col) if isinstance(col, str) else col
    grams = F.transform(
        F.sequence(F.lit(1), F.length(c) - (n - 1)),
        lambda i: F.substring(c, i, F.lit(n)),
    )
    return F.when(F.length(c) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    return inter / (F.size(a) + F.size(b) - inter)


def stopword_ratio(col: Column | str) -> Column:
    w = tokens(col)
    stops = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    return stops.cast("double") / F.size(w)


def type_token_ratio(col: Column | str) -> Column:
    w = tokens(col)
    return F.size(F.array_distinct(w)).cast("double") / F.size(w)


def mean_word_length(col: Column | str) -> Column:
    w = tokens(col)
    total = F.aggregate(F.transform(w, F.length), F.lit(0), lambda acc, x: acc + x)
    return total.cast("double") / F.size(w)
