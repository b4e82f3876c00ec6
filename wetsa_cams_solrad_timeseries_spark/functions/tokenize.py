"""Shared whitespace tokenization + rolling word n-grams.

The dedup shingle pipeline (operators/dedup.py) and the fingerprint /
text-analysis pipeline (operators/text.py) must stay TOKENIZATION-
IDENTICAL: near-dup results are cross-checked against fingerprints, so
a normalization tweak (say, punctuation stripping) applied to one copy
but not the other silently breaks parity. One definition here; both
modules import it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_words(text_col: str) -> Column:
    """lower → trim → whitespace-split word array."""
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def word_ngrams(words: Column, n: int) -> Column:
    """Rolling word ``n``-grams joined by single spaces. Documents with
    fewer than ``n`` words contribute their whole normalized text as one
    shingle, so every document yields ≥1 n-gram."""
    ngrams = F.transform(
        F.sequence(F.lit(1), F.size(words) - (n - 1)),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )
    return F.when(F.size(words) >= n, ngrams).otherwise(
        F.array(F.array_join(words, " "))
    )
