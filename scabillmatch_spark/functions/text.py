"""Text cleaning / tokenization / n-gram / MinHash as pure Column expressions.

Everything here stays inside whole-stage codegen (no Python UDFs in the hot
path). The reference implemented these as ~20 scalar Scala UDFs; they all
collapse into built-ins:

- clean_text      <- cleaner_udf, strips ``[\\d,:;?!]`` (reference
                     feature/Utils.scala:177, ExtractMinHashLSH.scala:89)
- remove_small_words <- smallWordRemover ``\\b\\w{2}\\b`` (feature/Utils.scala:178)
- tokens          <- RegexTokenizer pattern ``\\W`` lowercase
                     (feature/Utils.scala:186-187)
- ngrams          <- pyspark.ml.feature.NGram semantics, "ngram REPLACES
                     unigram" rule (feature/Utils.scala:206-216)
- minhash_signature <- CustomizedMinHashLSH hashing (CustomizedMinHashLSH.scala:33-43),
                     re-based on md5 so the DuckDB oracle can reproduce it
                     bit-for-bit (lexicographic min over hex digests is a
                     valid min-wise hash family).

Design note (100 TB): these are narrow per-row transformations — no shuffle,
fully pipelined into the parquet scan, codegen'd by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Default punctuation/digit strip set, mirroring the reference's cleaner_udf.
CLEAN_PATTERN = r"[0-9,:;?!.]"


def clean_text(col: Column | str) -> Column:
    """Lowercase and strip digits + punctuation (reference cleaner_udf)."""
    return F.regexp_replace(F.lower(F.col(col) if isinstance(col, str) else col), CLEAN_PATTERN, "")


def remove_small_words(col: Column | str, max_len: int = 2) -> Column:
    """Drop words of <= max_len letters (reference smallWordRemover)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, rf"\b\w{{1,{max_len}}}\b", "")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of cleaned text -> array<string>, empties removed.

    Equivalent DuckDB: list_filter(string_split(<cleaned>, ' '), x -> x <> '').
    """
    c = clean_text(col)
    return F.filter(F.split(c, " "), lambda x: x != "")


def token_set(col: Column | str) -> Column:
    """Sorted distinct token array — the index-set representation the
    reference's set-based similarity measures operate on
    (SimilarityMeasure.scala:78-95 uses vector index sets)."""
    return F.array_sort(F.array_distinct(tokens(col)))


def ngrams(token_col: Column, n: int) -> Column:
    """Contiguous word n-grams joined by spaces (pyspark.ml NGram semantics).

    Pure expression: slice a sliding window over the token array. Guarded so
    arrays shorter than ``n`` yield an empty array (Spark's ``sequence`` would
    otherwise produce a descending range).
    """
    size = F.size(token_col)
    idx = F.sequence(F.lit(1), size - F.lit(n - 1))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(token_col, i, n), " "))
    return F.when(size >= n, grams).otherwise(F.array().cast("array<string>"))


def ngram_set(col: Column | str, n: int) -> Column:
    """Sorted distinct n-gram shingles of the cleaned text."""
    return F.array_sort(F.array_distinct(ngrams(tokens(col), n)))


def minhash_signature(set_col: Column, num_hashes: int = 8) -> Column:
    """MinHash signature as array<string> of length ``num_hashes``.

    h_i(S) = min over s in S of md5(i || ':' || s). Lexicographic min over
    fixed-width hex digests is an order-preserving stand-in for integer
    min-wise hashing, so P(h_i(A)=h_i(B)) ≈ Jaccard(A,B) — same property the
    reference's ``(1+x)*a+b mod P`` family has (CustomizedMinHashLSH.scala:33-43).
    md5 (not murmur) so a SQL oracle reproduces it exactly.

    Empty sets get the sentinel 'z'*32 (sorts after every hex digest).
    """
    sentinel = F.lit("z" * 32)

    def one_hash(i: int) -> Column:
        hashed = F.transform(set_col, lambda s: F.md5(F.concat(F.lit(f"{i}:"), s)))
        return F.coalesce(F.array_min(hashed), sentinel)

    return F.array(*[one_hash(i) for i in range(num_hashes)])


def minhash_bands(sig_col: Column, num_bands: int, rows_per_band: int) -> Column:
    """Group a signature into LSH bands: array of 'bandIdx|h1|h2|...' strings.

    Docs colliding on ANY band become join candidates — the OR-amplification
    the reference gets from numHashTables (CustomizedLSH.scala:20-27).
    """
    bands = []
    for b in range(num_bands):
        parts = [F.lit(f"{b}")]
        for r in range(rows_per_band):
            parts.append(F.element_at(sig_col, b * rows_per_band + r + 1))
        bands.append(F.concat_ws("|", *parts))
    return F.array(*bands)
