"""Training-data curation operators (LLM-data-pipeline extension):
benchmark decontamination, deterministic stratified sampling, sequence
packing, sliding-window document chunking, intra-document repetition
profiling, corpus-wide paragraph dedup (boilerplate removal), and
deterministic mixture sampling.

These are the corpus-hygiene steps a 100 TB pretraining pipeline runs
between dedup and tokenization. None exist in the reference (its corpus
is ~100k bills); each is built so the plan scales:

- decontamination: the eval/benchmark side is MBs while the train side
  is TBs, so the distinct eval n-gram set broadcasts and the train scan
  never shuffles its text — one narrow explode + broadcast semi-join.
- stratified sampling: rank-by-content-hash inside each stratum — one
  shuffle on the strata key, exact-k per stratum, and replayable across
  runs/engines (no rand()).
- sequence packing: start-offset chunking by running token count — one
  window shuffle per partition key; the classic scalable approximation
  of greedy first-fit (a pack may overflow by at most one document).
- repetition profiling: pure Column expressions, narrow, codegen'd.
- paragraph dedup: winner election shuffles only (16-byte hash, id, idx)
  — text never rides the wide shuffle; reassembly is one per-doc agg.
- mixture sampling: tiny per-stratum count agg broadcast back + one
  window shuffle on the stratum key; membership is md5-rank, replayable.

All are formulated identically in ANSI SQL for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from scabillmatch_spark.functions import text as TX


def decontamination_hits(
    train: DataFrame,
    eval_: DataFrame,
    id_col: str = "doc_id",
    gram_col: str = "gram_ids",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark-decontamination core: train documents sharing at least one
    n-gram with the eval/benchmark corpus, with the count of distinct
    shared n-grams.

    Inputs are (id, distinct n-gram-id array) relations — build the arrays
    with functions.text.ngram_ids_from_token_ids over the shared corpus
    cache so tokenize+md5 is paid once. Returns (id_col, n_hits) for
    contaminated train docs only.

    Scale shape: real benchmark suites are a few million n-grams, so the
    distinct eval-gram set broadcasts (set broadcast_eval=False for an
    unusually large holdout, which falls back to a shuffle join on the
    gram id). The train side explodes to (id, gram) — narrow, no text in
    flight — and the per-doc arrays are already distinct, so the post-join
    count is the distinct-overlap count without a distinct aggregation.
    """
    eval_grams = eval_.select(F.explode(gram_col).alias("__g")).distinct()
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    return (
        train.select(id_col, F.explode(gram_col).alias("__g"))
        .join(eval_grams, "__g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic balanced sample: exactly min(k, |stratum|) rows per
    stratum, chosen as the k smallest md5-of-id digests — a replayable
    rank-by-content-hash (sampleBy's rand() can't be reproduced across
    engines or runs). Adds ``__rk`` (1-based rank within stratum).

    One shuffle on the strata key. Skewed strata are safe: Catalyst plans
    the rank filter as Partial+Final WindowGroupLimit (plan-asserted in
    tests), pruning every map-side partition to its local top-k before
    the exchange — a hot stratum ships k x upstream-partitions rows, not
    its full size.
    """
    digest = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*strata_cols).orderBy(digest, F.col(id_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
    )


def weighted_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-ES, "Weighted random sampling with a
    reservoir", IPL 2006): per stratum keep the k rows with the largest
    key ln(u)/w — equivalently u^(1/w) — where w = ``weight_col`` and u is
    a uniform in (0,1] derived from md5(``id_col``) instead of rand(), so
    the draw is replayable across runs AND engines (the stratified_sample
    convention). P(row selected) is proportional to its weight; heavier
    documents (longer, higher-quality-scored) are favored exactly as a
    true weighted reservoir pass would.

    u = (int(md5(id)[:15 hex]) + 1) / 2^60 is bit-identical across
    Spark/DuckDB: the 60-bit integer -> double conversion and the
    power-of-two division are both IEEE-exact, and ln() agrees to 1 ulp —
    order-flip probability over a corpus is negligible, and ties on the
    key fall back to ``id_col``.

    Rows with weight <= 0 are excluded (they have selection probability 0
    and ln(u)/w would flip sign). Adds ``__rk`` (1-based rank within
    stratum, heaviest-keyed first).

    Scale shape: identical to stratified_sample — ONE shuffle on the
    strata key, a per-stratum top-k window. Catalyst plans the rank
    filter as Partial+Final WindowGroupLimit (plan-asserted in tests):
    every map-side partition is pruned to its local top-k BEFORE the
    exchange, so a hot stratum never ships or sorts more than
    k x upstream-partitions rows — the top-k-per-group rewrite is
    automatic, not a caller burden.
    """
    digest60 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    u = (digest60.cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
    key = F.ln(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(*strata_cols).orderBy(
        F.desc(key), F.col(id_col)
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    part_cols: list[str],
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Sequence packing for training-batch assembly: assign documents to
    fixed-token-budget packs by start-offset chunking — pack_id =
    floor(running-token-count-before-this-doc / budget) within each
    partition key, documents taken in ``order_col`` order.

    Semantics (deterministic, one window shuffle): a pack may overflow the
    budget by less than one document — the scalable approximation of
    greedy first-fit, whose running reset is inherently sequential and
    does not distribute. Exactly mirrored in ANSI SQL.

    Determinism requires ``order_col`` to be UNIQUE within each partition
    key: the ROWS-frame running sum is order-sensitive, so ties would make
    pack_id assignment depend on the engine's tie order. Callers with
    non-unique keys should pass a uniquified order column (e.g.
    ``concat(ts, '|', doc_id)``).
    """
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return df.withColumn(
        "pack_id", F.floor(before / F.lit(budget)).cast("long")
    )


# PII patterns kept inside the common RE2/Java regex subset (no lookaround,
# no backrefs) so the Spark expressions and the DuckDB oracle match hit for
# hit. Redaction order matters: URLs first (they may embed @ and digits).
PII_PATTERNS = {
    "url": r"https?://[^\s]+",
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d[\d\- ]{7,}\d",
}


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 256,
    stride: int = 192,
) -> DataFrame:
    """Sliding-window document chunking (the RAG / context-window chunker):
    split each document into whitespace tokens and emit overlapping windows
    of ``chunk_tokens`` tokens whose starts step by ``stride``
    (overlap = chunk_tokens - stride). Output: one row per chunk with
    ``chunk_idx`` (0-based), ``n_chunk_tokens``, and ``chunk_text``.

    Differs from pack_sequences (which assigns whole documents to
    fixed-budget packs ACROSS documents): this splits WITHIN a document,
    with overlap, the unit-of-retrieval/training-window shape.

    Chunk starts are every multiple of ``stride`` below the token count, so
    the final window may be shorter than ``chunk_tokens`` (and, when
    stride < chunk_tokens, a short tail window is a suffix of its
    predecessor — the standard overlap semantics; callers wanting
    suffix-free tails filter on n_chunk_tokens). Empty documents produce
    no rows. Tokens here are whitespace-delimited; a production pipeline
    would chunk on tokenizer ids, but the plan is identical.

    Plan: split -> sequence -> posexplode -> slice — entirely narrow
    per-row Column expressions, ZERO shuffles at any corpus size; chunking
    never needs to move data.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda x: x != F.lit("")
    )
    out = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.sequence(
            F.lit(0),
            F.greatest(F.size(toks) - 1, F.lit(0)),
            F.lit(stride),
        ).alias("__starts"),
    ).select(
        id_col,
        "__toks",
        F.posexplode("__starts").alias("chunk_idx", "__start"),
    )
    chunk = F.slice(
        F.col("__toks"), F.col("__start") + 1, F.lit(chunk_tokens)
    )
    return (
        out.select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
        .filter(F.col("n_chunk_tokens") > 0)
    )


def pii_counts(text_col: Column | str) -> list[Column]:
    """Per-document PII hit counts (url/email/ipv4/phone) — the scrubbing
    audit a pretraining pipeline runs before release. Pure regexp_count
    Column exprs, narrow and codegen'd."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return [
        F.regexp_count(c, F.lit(pat)).alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]


def redact_pii(text_col: Column | str) -> Column:
    """Replace every PII span with a typed placeholder token (url first —
    URLs can embed emails/digits). Chained regexp_replace: one projection,
    no UDF."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    out = c
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def repetition_stats(
    text_col: str = "text",
    gram_n: int = 4,
) -> list[Column]:
    """Intra-document repetition profile (the 'repetitive junk' quality
    axis dedup can't see): returns Columns for

    - n_grams / n_distinct_grams / dup_gram_ratio — share of repeated
      ``gram_n``-gram slots (Rae et al.'s duplicate-n-gram fraction);
    - top_token_share — frequency of the most common token over total
      tokens (catches 'aaaa aaaa ...' degenerate docs).

    Pure Column expressions over the token list — narrow and codegen'd;
    top_token_share is O(distinct x total) per document, bounded by
    document length, not corpus size.
    """
    toks = TX.tokens(text_col)
    n_tok = F.size(toks)
    idx = F.sequence(F.lit(1), n_tok - F.lit(gram_n - 1))
    grams = F.when(
        n_tok >= gram_n,
        F.transform(
            idx, lambda i: F.array_join(F.slice(toks, i, gram_n), " ")
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_grams = F.size(grams)
    n_distinct = F.size(F.array_distinct(grams))
    dup_ratio = F.when(
        n_grams > 0,
        F.round((n_grams - n_distinct).cast("double") / n_grams, 6),
    ).otherwise(F.lit(0.0))
    top_share = F.when(
        n_tok > 0,
        F.round(
            F.array_max(
                F.transform(
                    F.array_distinct(toks),
                    lambda t: F.size(F.filter(toks, lambda x: x == t)),
                )
            ).cast("double")
            / n_tok,
            6,
        ),
    ).otherwise(F.lit(0.0))
    return [
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct_grams"),
        dup_ratio.alias("dup_gram_ratio"),
        top_share.alias("top_token_share"),
    ]


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = ". ",
) -> DataFrame:
    """Corpus-wide paragraph/sentence-level exact dedup (the C4/RefinedWeb
    boilerplate-removal step): split every document into units on
    ``delimiter``, keep only each unit's FIRST global occurrence (ordered by
    (``id_col``, position)), and reassemble the surviving units in original
    order. Repeated boilerplate (headers, disclaimers, navigation chrome)
    survives exactly once — in the earliest document that carries it.

    Returns one row per input document:
      (id_col, n_paras, n_kept, clean_len, clean_md5, clean_text)
    where clean_text rejoins kept units with the delimiter (the trailing
    fragment of the original delimiter is NOT reconstructed — documented
    contract; clean_md5 = md5(clean_text) lets an oracle verify the exact
    reconstruction without comparing long strings).

    Scale shape: winner election is a groupBy(md5-unit-hash) ->
    min(struct(doc, idx)) — map-side-combinable, shuffles only
    (16-byte hash, id, idx) never text; the only shuffle carrying text is
    the co-partitioned winner join + the per-doc reassembly. Docs whose
    units ALL first-occurred elsewhere come back with empty clean_text.
    """
    import re as _re

    paras = (
        df.select(
            F.col(id_col),
            # Spark split() takes a REGEX; the delimiter is a literal, so
            # escape it (". " as a pattern would match any char + space)
            F.posexplode(
                F.split(F.col(text_col), _re.escape(delimiter), -1)
            ).alias("__idx", "__p"),
        )
        .filter(F.col("__p") != "")
        .withColumn("__h", F.md5(F.col("__p")))
    )
    paras = paras.persist()
    winners = paras.groupBy("__h").agg(
        F.min(F.struct(F.col(id_col), F.col("__idx"))).alias("__w")
    ).select(
        "__h",
        F.col(f"__w.{id_col}").alias("__wid"),
        F.col("__w.__idx").alias("__widx"),
    )
    kept = paras.join(
        winners,
        (paras["__h"] == winners["__h"])
        & (paras[id_col] == winners["__wid"])
        & (paras["__idx"] == winners["__widx"]),
        "left_semi",
    )
    n_before = paras.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_paras"))
    reassembled = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__idx", "__p"))),
                lambda s: s["__p"],
            ),
            delimiter,
        ).alias("clean_text"),
    )
    return (
        n_before.join(reassembled, id_col, "left")
        .select(
            id_col,
            "n_paras",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
        .withColumn("clean_len", F.length("clean_text"))
        .withColumn("clean_md5", F.md5("clean_text"))
    )


def mixture_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic data-mixing sampler: down-sample each stratum (data
    source / domain) to its configured mixture fraction — the step that
    turns a raw crawl into a weighted pretraining mix (e.g. wiki 1.0,
    web 0.3). Keeps exactly floor(frac * |stratum|) rows per stratum,
    chosen as the smallest md5-of-id digests (replayable across runs and
    engines — no rand()); strata missing from ``fractions`` keep fraction
    0.0, i.e. are dropped, so the output mix is exactly what was asked for.

    Scale shape: per-stratum counts are one map-side-combinable agg over a
    handful of groups (broadcast back), the keep-rank is one window shuffle
    on the stratum key. Same hot-stratum caveat as stratified_sample.
    """
    frac_entries = []
    for k, v in sorted(fractions.items()):
        frac_entries.extend([F.lit(k), F.lit(float(v))])
    frac_map = F.create_map(*frac_entries)
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    digest = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(stratum_col).orderBy(digest, F.col(id_col))
    return (
        df.join(F.broadcast(counts), stratum_col)
        .withColumn("__keep", F.floor(
            F.coalesce(frac_map[F.col(stratum_col)], F.lit(0.0)) * F.col("__n")
        ))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= F.col("__keep"))
        .drop("__n", "__keep")
    )


def embedding_outliers(
    emb: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    factor: float = 2.0,
) -> DataFrame:
    """Embedding-space outlier audit (the curation step that prunes
    mis-embedded / off-distribution samples before training): per label,
    the centroid over all vectors, each vector's squared distance to its
    label centroid, and the outlier flag d2 > factor * mean(d2).

    Fully relational — posexplode -> (label, pos) centroid agg -> join ->
    per-vector distance agg; shuffles are bounded by |labels| x dim and
    |vectors|, dense vectors never materialize engine-side.

    Cross-engine float discipline (this is oracle-checked): centroids use
    an exact DECIMAL(38,12) sum divided once in double; per-vector d2 and
    the per-label mean are rounded to 4 decimals BEFORE the comparison, so
    both engines flag from identical rounded quantities (summation-order
    noise is ~1e-12, four orders below the rounding grid).

    Returns (id_col, label_col, d2, is_outlier).
    """
    ex = emb.select(
        id_col,
        label_col,
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"),
    )
    cent = ex.groupBy(label_col, "pos").agg(
        (
            F.sum(F.col("val").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1))
        ).alias("__c")
    )
    d2 = (
        ex.join(cent, [label_col, "pos"])
        .groupBy(id_col, label_col)
        .agg(
            F.round(
                F.sum((F.col("val") - F.col("__c")) * (F.col("val") - F.col("__c"))),
                4,
            ).alias("d2")
        )
    )
    w = Window.partitionBy(label_col)
    return d2.withColumn(
        "__thr", F.round(F.lit(factor) * F.avg("d2").over(w), 4)
    ).select(
        id_col,
        label_col,
        "d2",
        (F.col("d2") > F.col("__thr")).alias("is_outlier"),
    )
