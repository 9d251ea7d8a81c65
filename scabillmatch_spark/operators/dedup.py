"""Corpus deduplication operators (LLM-data-pipeline extension).

The reference only dedups pair relations (distinct/dropDuplicates, A11).
A 100 TB training-data pipeline needs document-level dedup; these are the
standard four, all single-plan DataFrames:

- exact_dedup        : md5 fingerprint group-by (one shuffle on the hash)
- ngram_jaccard_pairs: shingle-set Jaccard over blocked candidates
- minhash_dedup_pairs: MinHash-LSH banded candidates + exact verification
- simhash            : relational SimHash (explode -> bit majority vote),
  pairs by Hamming distance on the signature

Everything uses md5-derived hashing so results are engine-independent
(reproducible against a SQL oracle) — no JVM-specific murmur.

Scale notes: exact dedup shuffles once on the fingerprint. MinHash banding
shuffles on band keys (linear in corpus size; near-dup clusters bound bucket
sizes). SimHash shuffles on (doc, bit) then on signature — both linear.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scabillmatch_spark.functions import similarity as SIM
from scabillmatch_spark.functions import text as TX
from scabillmatch_spark.operators import blocking


def exact_fingerprint(text_col: Column | str, normalize: bool = True) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.md5(F.lower(c) if normalize else c)


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep the min-id doc per identical (normalized) text; one hash shuffle."""
    fp = exact_fingerprint(text_col)
    groups = (
        df.groupBy(fp.alias("fp"))
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("dups"))
    )
    return groups


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 32,
    num_bands: int = 8,
    jaccard_threshold: float = 70.0,
    sets: DataFrame | None = None,
    banded: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate pairs: MinHash-LSH candidates, exact-Jaccard verified.

    Candidate recall at similarity s is 1-(1-s^r)^b with r rows per band and
    b bands — the default 8 bands of 4 rows gives ~0.89 at s=0.7 and ~0.998
    at s=0.9; exact rescoring then removes all false positives (the
    reference's approxSimilarityJoin + keyDistance refilter plan,
    CustomizedLSH.scala:227-259).

    The shingle-set projection is persisted: it feeds the signature branch
    and both verify-join sides. ``sets`` overrides it with a precomputed
    (id, shingle-id-set) frame — e.g. derived from the application-wide
    tokenized-corpus cache (operators/corpus.py), skipping the tokenize+md5
    pass entirely. ``banded`` additionally skips the num_hashes MinHash
    passes: a pre-built (__id, __sz, __band) projection of the SAME sets
    under the SAME banding config (the shared band-index cache; caller
    owns persistence).
    """
    if sets is not None:
        sets = sets.select(
            F.col(id_col).alias("__id"), F.col(sets.columns[1]).alias("__set")
        ).persist()
    else:
        sets = df.select(
            F.col(id_col).alias("__id"),
            TX.ngram_id_set(text_col, shingle_n).alias("__set"),
        ).persist()
    cands = blocking.lsh_candidate_pairs(
        sets, "__id", "__set", num_hashes=num_hashes, num_bands=num_bands,
        min_jaccard=jaccard_threshold,  # lossless: J <= size-ratio bound
        banded=banded,
    )
    s1 = sets.select(F.col("__id").alias("pk1"), F.col("__set").alias("__s1"))
    s2 = sets.select(F.col("__id").alias("pk2"), F.col("__set").alias("__s2"))
    return (
        cands.join(s1, "pk1")
        .join(s2, "pk2")
        .withColumn("similarity", SIM.jaccard(F.col("__s1"), F.col("__s2")))
        .filter(F.col("similarity") >= jaccard_threshold)
        .select("pk1", "pk2", "similarity")
    )


def token_hash16(tok: Column) -> Column:
    """First 4 md5 hex digits as an int in [0, 65536) — engine-independent."""
    return F.conv(F.substring(F.md5(tok), 1, 4), 16, 10).cast("int")


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit relational SimHash: per (doc, bit) majority vote over distinct
    token hashes, reassembled into an integer signature.

    Fully relational (explode -> groupBy -> conditional sum) so the identical
    formulation runs on a SQL oracle. Two linear shuffles.
    """
    toks = df.select(
        F.col(id_col).alias("__id"), F.explode(TX.token_set(text_col)).alias("tok")
    ).withColumn("h", token_hash16(F.col("tok")))
    bits = toks.select(
        "__id", "h", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bit")
    )
    # shiftright/shiftleft builtins require a literal shift; use SQL exprs so
    # the bit position can be a column
    votes = bits.groupBy("__id", "bit").agg(
        F.sum(
            F.when(F.expr("(h >> bit) & 1") == 1, 1).otherwise(-1)
        ).alias("vote")
    )
    sig = votes.groupBy("__id").agg(
        F.sum(F.when(F.col("vote") > 0, F.expr("shiftleft(1, bit)")).otherwise(0)).alias(
            "simhash"
        )
    )
    return sig.withColumnRenamed("__id", id_col)


def simhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    block_col: str | None = None,
) -> DataFrame:
    """Pairs whose 16-bit SimHash signatures differ in <= max_hamming bits."""
    sig = simhash16(df, id_col, text_col)
    if block_col:
        sig = sig.join(df.select(id_col, block_col), id_col)
    pairs = blocking.candidate_pairs(
        sig,
        id_col=id_col,
        group_col=None,
        block_col=block_col,
        allow_cartesian=block_col is None,
    )
    ham = F.bit_count(
        F.col("simhash1").bitwiseXOR(F.col("simhash2")).cast("long")
    )
    return pairs.select("pk1", "pk2", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def corpus_band_index(
    corpus_sets: DataFrame,
    id_col: str = "doc_id",
    set_col: str = "shingles",
    num_hashes: int = 32,
    num_bands: int = 8,
) -> DataFrame:
    """Build the corpus's reusable band-index projection for
    :func:`minhash_dedup_delta` (pass as ``corpus_banded``). At 100 TB
    this is the append-only table a deployment materializes once and
    reuses across every ingest batch instead of re-minhashing the corpus
    per delta — persist (or write) the result before looping."""
    from scabillmatch_spark.operators import blocking

    c = corpus_sets.select(
        F.col(id_col).alias("__id"), F.col(set_col).alias("__set")
    )
    return blocking.lsh_banded_projection(
        c, "__id", "__set", num_hashes, num_bands, with_size=True, tag="r"
    )


def minhash_dedup_delta(
    corpus_sets: DataFrame,
    delta_sets: DataFrame,
    id_col: str = "doc_id",
    set_col: str = "shingles",
    num_hashes: int = 32,
    num_bands: int = 8,
    jaccard_threshold: float = 70.0,
    corpus_banded: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup dedup: MinHash-LSH candidates between a NEW
    batch (``delta_sets``) and the EXISTING corpus (``corpus_sets``), then
    exact-Jaccard verification — the daily-ingest shape where the corpus
    band index is reused instead of re-joining corpus x corpus (see
    blocking.lsh_candidate_pairs_two_sided). Intra-delta duplicates are the
    regular minhash_dedup_pairs' job on the delta alone.

    Inputs are (id, shingle-id-set) frames (build via
    text.ngram_ids_from_token_ids over the corpus cache). Returns
    (pk1 = delta id, pk2 = corpus id, similarity) for pairs >= threshold.

    ``corpus_banded``: a persisted :func:`corpus_band_index` of
    ``corpus_sets`` (same num_hashes/num_bands) — skips re-minhashing the
    corpus on every call, the per-ingest-batch fast path.
    """
    from scabillmatch_spark.operators import blocking

    d = delta_sets.select(
        F.col(id_col).alias("__id"), F.col(set_col).alias("__set")
    ).persist()
    c = corpus_sets.select(
        F.col(id_col).alias("__id"), F.col(set_col).alias("__set")
    )
    if corpus_banded is None:
        # two consumers (band projection + rescore join) — persist so the
        # corpus side is signed once. With a pre-built band index the
        # candidate join never reads c (see lsh_candidate_pairs_two_sided);
        # its single remaining consumer is the rescore join, so a persist
        # would only add a duplicate in-memory copy of every corpus
        # shingle set plus the materialization pass that fills it
        # (r15 optimization round).
        c = c.persist()
    cands = blocking.lsh_candidate_pairs_two_sided(
        d, c, "__id", "__set", num_hashes=num_hashes, num_bands=num_bands,
        min_jaccard=jaccard_threshold, right_banded=corpus_banded,
    )
    s1 = d.select(F.col("__id").alias("pk1"), F.col("__set").alias("__s1"))
    s2 = c.select(F.col("__id").alias("pk2"), F.col("__set").alias("__s2"))
    return (
        cands.join(s1, "pk1")
        .join(s2, "pk2")
        .withColumn("similarity", SIM.jaccard(F.col("__s1"), F.col("__s2")))
        .filter(F.col("similarity") >= jaccard_threshold)
        .select("pk1", "pk2", "similarity")
    )


def minhash_estimate_audit(
    sets: DataFrame,
    id_col: str,
    set_col: str,
    num_hashes: int = 32,
    num_bands: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Estimator-quality audit for the MinHash tier -> per banded
    candidate pair (pk1, pk2, n_agree, est_jaccard, exact_jaccard,
    abs_err). The MinHash estimate (agreeing signature positions /
    num_hashes) is an unbiased Jaccard estimator; this row puts the
    estimate and the exact value side by side over the SAME banding the
    dedup pipeline uses, so estimator drift (bad hash family, banding
    bug) surfaces as a diffable relation instead of silent recall loss.

    Exactness: n_agree and the set sizes are integers; the two ratios
    and their gap are single double divisions rounded to
    ``round_digits``. Empty sets are excluded (their exact Jaccard is
    0/0). Plan: the banded candidate join (band-key shuffle only) +
    two feature joins carrying (id, set, signature) + narrow array
    expressions — the minhash_dedup_pairs shape with signatures riding
    the verify join.
    """
    s = sets.select(
        F.col(id_col).alias("__id"), F.col(set_col).alias("__set")
    ).filter(F.size("__set") > 0).persist()
    cands = blocking.lsh_candidate_pairs(
        s, "__id", "__set", num_hashes=num_hashes, num_bands=num_bands
    )
    feat = s.select(
        "__id",
        "__set",
        TX.minhash_signature(F.col("__set"), num_hashes).alias("__sig"),
    )
    f1 = feat.select(
        F.col("__id").alias("pk1"),
        F.col("__set").alias("__s1"),
        F.col("__sig").alias("__g1"),
    )
    f2 = feat.select(
        F.col("__id").alias("pk2"),
        F.col("__set").alias("__s2"),
        F.col("__sig").alias("__g2"),
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("__g1"), F.col("__g2"), lambda a, b: a == b),
            lambda x: x,
        )
    ).cast("long")
    inter = F.size(F.array_intersect(F.col("__s1"), F.col("__s2"))).cast("double")
    uni = F.size(F.array_union(F.col("__s1"), F.col("__s2"))).cast("double")
    est = F.round(agree.cast("double") / F.lit(float(num_hashes)), round_digits)
    exact = F.round(inter / uni, round_digits)
    return (
        cands.join(f1, "pk1")
        .join(f2, "pk2")
        .select(
            "pk1",
            "pk2",
            agree.alias("n_agree"),
            est.alias("est_jaccard"),
            exact.alias("exact_jaccard"),
            F.round(F.abs(est - exact), round_digits).alias("abs_err"),
        )
    )
