"""Text expressions for the LLM-data-pipeline operators.

Content hashing uses md5 (native, byte-identical in Spark and DuckDB)
truncated to 32 bits — the portable analog of a fast content hash.
Routing keeps FNV-1a (functions.hashing) because the *reference's*
placement contract depends on it; content dedup only needs a uniform
deterministic hash, so the cheaper native one wins.

Everything here is higher-order array expressions — no UDFs, fully
whole-stage-codegen'd, linear in corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

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
