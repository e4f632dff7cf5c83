"""Tokenization primitives — all native Catalyst expressions.

Covers the reference's whitespace split (``text.split()``,
topic_modelling.ipynb cell 5) plus the training-data-pipeline token
surfaces: a BPE-ish regex tokenizer, word n-gram shingles, and
character shingles (for MinHash/SimHash dedup).

Everything here is a narrow per-row transformation: no shuffle, fully
codegen'd, linear scale-out.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# GPT-2-style pre-tokenizer shape, simplified to what regexp_extract_all
# supports: word pieces, numbers, punctuation runs.
BPE_ISH_PATTERN = r"('s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+)"


def whitespace_tokens(col: Column) -> Column:
    """``text.split(' ')`` — the reference corpus tokenizer."""
    return F.split(col, " ")


def bpe_ish_tokens(col: Column) -> Column:
    """Regex token stream approximating a BPE pre-tokenizer."""
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 1)


def token_count(col: Column) -> Column:
    return F.size(bpe_ish_tokens(col))


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """Word n-grams as ' '-joined strings; empty array when the doc
    has fewer than n tokens.

    Guarded with ``when`` because Spark's ``sequence(0, x)`` counts
    DOWN when x < 0 (it would emit [0, -1] for a 2-token doc).
    """
    empty = F.array().cast("array<string>")
    idx = F.sequence(F.lit(0), F.size(tokens) - n)
    grams = F.transform(idx, lambda i: F.array_join(F.slice(tokens, i + 1, n), " "))
    return F.when(F.size(tokens) >= n, grams).otherwise(empty)


def char_shingles(col: Column, k: int = 5) -> Column:
    """Character k-grams of a string (classic MinHash shingling)."""
    empty = F.array().cast("array<string>")
    idx = F.sequence(F.lit(1), F.length(col) - k + 1)
    grams = F.transform(idx, lambda i: F.substring(col, i, k))
    return F.when(F.length(col) >= k, grams).otherwise(empty)
