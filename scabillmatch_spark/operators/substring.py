"""Cross-document EXACT-substring duplication (the Lee et al. 2021
"Deduplicating Training Data Makes Language Models Better" shape,
arXiv:2107.06499): find every n-token window whose content appears in
more than one document, and report each document's duplicated regions as
merged token spans.

This is the third, finest-grained member of the dedup family — doc-level
MinHash (near-dup sets), paragraph-level C4 dedup (unit hashes), and now
sub-document exact substrings (boilerplate licenses, quoted passages,
templated headers that survive both coarser passes). The paper builds a
corpus-wide suffix array on one large machine; the distributed
re-expression is a POSITIONAL n-gram census: every n-token window gets
the same integer rolling-hash id the MinHash tier already uses
(functions/text.ngram_ids_from_token_ids' fold — one md5 per token, pure
integer math per window, engine-exact), windows whose id occurs in >=
min_docs distinct documents are duplicate witnesses, and a document's
witnesses merge into maximal spans with one fold. A window of n tokens
equals an exact n-token substring match up to rolling-hash collisions
(P = 2038074743; expected cross-collisions ~ (#distinct windows)^2 / 2P
— negligible below ~10^4 distinct windows and quantified, not hidden, at
scale; the paper's suffix array is collision-free but single-machine).

Scale shape: the gram stream is (doc_id, pos, gram_id) — three longs per
token, no text ever leaves the scan projection. One shuffle keyed on
gram_id for the census (combine-heavy: duplicated grams collapse
map-side), one semi-join to keep witness positions, one doc-key
aggregation to merge spans. Census size is bounded by distinct window
ids, witness volume by actually-duplicated tokens — never corpus^2.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scabillmatch_spark.functions.text import (
    HASH_PRIME,
    SHINGLE_B,
    ordered_token_ids,
)


def positional_ngram_ids(tok_ids_col: Column, n: int) -> Column:
    """ORDERED array<long> of rolling-hash window ids (one per n-token
    window, duplicates kept — element i covers 0-based token positions
    [i, i+n)). Same fold as ngram_ids_from_token_ids, minus the
    sort/distinct that makes that one a set."""
    size = F.size(tok_ids_col)
    idx = F.sequence(F.lit(1), size - F.lit(n - 1))
    gram = F.transform(
        idx,
        lambda i: F.aggregate(
            F.slice(tok_ids_col, i, n),
            F.lit(0).cast("long"),
            lambda acc, x: (acc * SHINGLE_B + x % HASH_PRIME) % HASH_PRIME,
        ),
    )
    return F.when(size >= n, gram).otherwise(F.array().cast("array<long>"))


def _merge_spans(sorted_pos: Column, n: int) -> Column:
    """Fold 0-based window starts (SORTED) into maximal merged spans
    array<struct<s,e>> (e exclusive): a start within or adjacent to the
    running span (p <= last.e) extends it, else opens a new one."""
    empty = F.array().cast("array<struct<s:long,e:long>>")
    return F.aggregate(
        sorted_pos,
        empty,
        lambda acc, p: F.when(
            (F.size(acc) == 0) | (p > F.element_at(acc, -1)["e"]),
            F.concat(
                acc,
                F.array(F.struct(p.alias("s"), (p + F.lit(n)).alias("e"))),
            ),
        ).otherwise(
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["s"].alias("s"),
                        F.greatest(
                            F.element_at(acc, -1)["e"], p + F.lit(n)
                        ).alias("e"),
                    )
                ),
            )
        ),
    )


def duplicate_ngram_spans(
    docs: DataFrame,
    n: int = 20,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
    token_ids_col: str | None = None,
) -> DataFrame:
    """Per-document duplicated-substring report -> (id_col, n_dup_windows,
    n_spans, dup_tokens, spans). Only documents containing at least one
    cross-document duplicate window appear. ``spans`` is the merged
    0-based token-span list rendered ``s-e`` (e exclusive) joined by
    ``;`` — a fixed-schema witness the gate can value-hash.
    ``dup_tokens`` = total tokens covered by the merged spans (the
    number a removal pass would strip).

    ``num_partitions``: spread the tokenize+window-hash projection (the
    CPU term — one md5 per token plus an O(n) fold per window) over this
    many tasks BEFORE the explode. Needed when the input is a handful of
    small files (local runs: one 5k-doc parquet file = one task = a
    24 s scan, measured); at real corpus scale input splits already
    provide the parallelism and the knob should stay None — a blanket
    text repartition at 100 TB would be a full-corpus shuffle.

    ``token_ids_col`` (r15 optimization round): name of a column already
    holding the ORDERED positional token-id array (ordered_token_ids
    output). When the caller has a tokenized-corpus projection — the
    engine's session-shared doc_token_sets cache carries exactly this —
    passing it skips the per-token md5 pass entirely; the operator then
    computes only the window-hash fold. Values are identical by
    construction (same tokenizer, same ids). ``num_partitions`` is honored
    in BOTH branches (r15 ADVICE: it was silently ignored with
    ``token_ids_col``): the repartition spreads whichever projection feeds
    the window-hash fold — raw text or precomputed id arrays."""
    if num_partitions:
        docs = docs.repartition(num_partitions, id_col)
    if token_ids_col is None:
        tids = ordered_token_ids(F.col(text_col))
    else:
        tids = F.col(token_ids_col)
    grams = docs.select(
        F.col(id_col),
        F.posexplode(positional_ngram_ids(tids, n)).alias("pos", "gram"),
    )
    # The gram stream feeds TWO consumers (census + witness semi-join),
    # so the window-hash Generate evaluates twice. Three alternatives
    # were A/B'd in the r15 optimization round (interleaved min-of-4 at
    # sf0.1, values identical): (a) pinning a shared exchange above the
    # Generate via repartition(gram, id) — Catalyst pushes the broadcast
    # LeftSemi BELOW the repartition, so the Generate still ran twice
    # and the exchange became pure overhead (5.40 s); (b) caching the
    # gram stream (localCheckpoint) — computes once but pays block
    # store/read (4.02 s) and at 100 TB would materialize the whole
    # positional gram stream (~24 B/token) on executor storage;
    # (c) recompute-twice over the cached token arrays (3.54 s) — the
    # winner locally AND the scale-honest shape (one extra fold pass
    # over cached ids beats storing the gram stream). (c) ships.
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct(id_col).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gram")
    )
    hits = grams.join(dup, "gram", "left_semi")
    spans = F.col("__spans")
    return (
        hits.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_windows"),
            F.array_sort(F.collect_list(F.col("pos").cast("long"))).alias("__pos"),
        )
        .withColumn("__spans", _merge_spans(F.col("__pos"), n))
        .select(
            id_col,
            "n_dup_windows",
            F.size(spans).cast("long").alias("n_spans"),
            F.aggregate(
                spans,
                F.lit(0).cast("long"),
                lambda acc, sp: acc + sp["e"] - sp["s"],
            ).alias("dup_tokens"),
            F.array_join(
                F.transform(
                    spans,
                    lambda sp: F.concat_ws(
                        "-", sp["s"].cast("string"), sp["e"].cast("string")
                    ),
                ),
                ";",
            ).alias("spans"),
        )
    )


def strip_duplicate_spans(
    docs: DataFrame,
    n: int = 20,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
    checksum_mod: int = 1_000_000_007,
    token_ids_col: str | None = None,
) -> DataFrame:
    """The APPLY step for :func:`duplicate_ngram_spans` (as
    doc_dedup_rewrite applies CC clusters and dedup_paragraphs rewrites
    units): drop every token covered by a cross-document duplicate span
    and return the surviving corpus as exact integer facts ->
    (id_col, n_tokens, dropped_tokens, kept_tokens, kept_checksum).
    EVERY document appears (untouched ones with dropped_tokens = 0) —
    a rewrite that loses rows is a bug, and the contract makes that
    visible. ``kept_checksum`` = sum of (token_id % checksum_mod) over
    surviving positions IN ORDER-FREE form — the house arithmetic
    fingerprint: any wrong keep/drop decision shifts it.

    Plan: the span pipeline is the detect operator's (census shuffle +
    semi-join + doc-key merge); the apply side is ONE left join of the
    per-doc token-id arrays onto their span arrays followed by narrow
    array expressions (coverage test per position, O(tokens x spans)
    per doc with spans few by construction). Exchanges carry longs and
    bounded span structs only.

    ``token_ids_col``: see :func:`duplicate_ngram_spans` — a precomputed
    ordered token-id column skips every md5 tokenize pass here (this
    operator otherwise pays it twice: census side + apply side).
    ``num_partitions`` is honored in both branches (r15 ADVICE)."""
    if num_partitions:
        docs = docs.repartition(num_partitions, id_col)
    if token_ids_col is None:
        toks = docs.select(
            F.col(id_col), ordered_token_ids(F.col(text_col)).alias("__tids")
        )
    else:
        toks = docs.select(
            F.col(id_col), F.col(token_ids_col).alias("__tids")
        )
    grams = toks.select(
        id_col,
        F.posexplode(positional_ngram_ids(F.col("__tids"), n)).alias(
            "pos", "gram"
        ),
    )
    # recompute-twice census shape — see the duplicate_ngram_spans note:
    # the pinned-exchange and cached-stream alternatives both measured
    # slower (LeftSemi pushes below a repartition; caching pays block
    # I/O and is storage-hostile at scale)
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct(id_col).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gram")
    )
    spans = (
        grams.join(dup, "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.col("pos").cast("long"))).alias("__pos"))
        .select(id_col, _merge_spans(F.col("__pos"), n).alias("__spans"))
    )
    empty = F.array().cast("array<struct<s:long,e:long>>")
    joined = toks.join(spans, id_col, "left").select(
        id_col,
        "__tids",
        F.coalesce("__spans", empty).alias("__spans"),
    )
    covered = lambda p: F.exists(  # noqa: E731
        F.col("__spans"), lambda sp: (p >= sp["s"]) & (p < sp["e"])
    )
    n_tokens = F.size("__tids").cast("long")
    # sequence(0, -1) is a DESCENDING [0, -1] in Spark, not empty — guard
    # the zero-token doc explicitly.
    all_pos = F.when(
        n_tokens > 0, F.sequence(F.lit(0).cast("long"), n_tokens - 1)
    ).otherwise(F.array().cast("array<long>"))
    kept_pos = F.filter(all_pos, lambda p: ~covered(p))
    kept = F.size(kept_pos).cast("long")
    return joined.select(
        id_col,
        n_tokens.alias("n_tokens"),
        (n_tokens - kept).alias("dropped_tokens"),
        kept.alias("kept_tokens"),
        F.aggregate(
            kept_pos,
            F.lit(0).cast("long"),
            lambda acc, p: acc
            + F.element_at(F.col("__tids"), (p + 1).cast("int"))
            % F.lit(checksum_mod),
        ).alias("kept_checksum"),
    )
