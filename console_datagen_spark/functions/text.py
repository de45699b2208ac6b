"""Text tokenization / shingling helpers (built-in functions only)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (fixture text is space-separated tokens)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


# PII patterns, ordered so broader shapes don't eat narrower ones: the
# email must go before the bare-number rule, the dotted IP before both.
# Kept ERE-portable: identical semantics in Spark (global by default) and
# DuckDB (with the 'g' flag).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b", "<PHONE>"),
    (r"\b\d{9,}\b", "<NUM>"),
)


def scrub_pii(col: Column | str) -> Column:
    """Redact common PII shapes (emails, IPs, phone numbers, long digit
    runs) with typed placeholder tokens — the standard scrub pass before
    text lands in a training corpus. Pure chained ``regexp_replace``:
    whole-stage codegen, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def winnow_fingerprint(
    toks: Column, hash_fn, n: int = 3, window: int = 4
) -> Column:
    """MOSS-style winnowing fingerprint set over token shingles.

    Ordered n-token shingle hashes → min of every ``window`` consecutive
    hashes → distinct sorted mins. Guarantees any shared run of
    window+n-1 tokens between two documents shares a fingerprint, at
    ~1/window the storage of the full shingle set. ``hash_fn`` maps a
    shingle-string Column to an int64 Column (the portable md5 hash, so
    the oracle replays it). Caller guarantees size(toks) >= n+window-1.
    """
    hashes = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: hash_fn(F.concat_ws(" ", F.slice(toks, i, n))),
    )
    mins = F.transform(
        F.sequence(F.lit(1), F.size(hashes) - (window - 1)),
        lambda i: F.array_min(F.slice(hashes, i, window)),
    )
    return F.array_sort(F.array_distinct(mins))


def shingles(toks: Column, n: int = 3) -> Column:
    """Array of n-token shingles joined by single spaces.

    Caller must guarantee size(toks) >= n (Spark's ``sequence`` counts
    DOWN when start > stop, which would fabricate bogus indices).
    """
    return F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
