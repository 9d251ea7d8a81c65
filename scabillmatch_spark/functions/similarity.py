"""Similarity measures — the engine's hottest inner loop.

Two tiers:

1. **Set measures over array<string> token/shingle sets** — pure Column
   expressions (array_intersect/size), JVM-side, codegen'd. These correspond
   to the reference's index-set measures (SimilarityMeasure.scala:78-165:
   jaccard, maxasymjaccard/overlap, left/right jaccard). All rescaled to
   [0,100] like the reference.

2. **Vector kernels over array<double>** — cosine, manhattan, hamming,
   weighted jaccard (SimilarityMeasure.scala:23-143). Expressed with
   F.zip_with/F.aggregate where possible (JVM-side); a vectorized pandas-UDF
   variant lives in scabillmatch_spark.ml.kernels for VectorUDT interop.

Scale note: measures are per-pair scalar computations — they pipeline into
the join that produced the pair, no extra shuffle, no Python in the default
path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Tier 1: set measures (inputs must be DISTINCT arrays; use text.token_set)
# ---------------------------------------------------------------------------


def _inter_size(a: Column, b: Column) -> Column:
    return F.size(F.array_intersect(a, b)).cast("double")


def jaccard(a: Column, b: Column) -> Column:
    """100 * |A∩B| / |A∪B|  (SimilarityMeasure.scala:78-95)."""
    inter = _inter_size(a, b)
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, 100.0 * inter / union).otherwise(F.lit(0.0))


def max_asym_jaccard(a: Column, b: Column) -> Column:
    """Overlap coefficient: 100 * |A∩B| / min(|A|,|B|)
    (SimilarityMeasure.scala:97-111)."""
    inter = _inter_size(a, b)
    denom = F.least(F.size(a), F.size(b)).cast("double")
    return F.when(denom > 0, 100.0 * inter / denom).otherwise(F.lit(0.0))


def left_jaccard(a: Column, b: Column) -> Column:
    """100 * |A∩B| / |A|  (SimilarityMeasure.scala:145-154)."""
    sa = F.size(a).cast("double")
    return F.when(sa > 0, 100.0 * _inter_size(a, b) / sa).otherwise(F.lit(0.0))


def right_jaccard(a: Column, b: Column) -> Column:
    """100 * |A∩B| / |B|  (SimilarityMeasure.scala:156-165)."""
    sb = F.size(b).cast("double")
    return F.when(sb > 0, 100.0 * _inter_size(a, b) / sb).otherwise(F.lit(0.0))


def min_one_sided_jaccard_distance(a: Column, b: Column) -> Column:
    """The reference's *custom* LSH keyDistance:
    min(1 - |∩|/|A|, 1 - |∩|/|B|)  (CustomizedMinHashLSH.scala:46-58).
    NOT standard Jaccard distance — it pairs with max_asym_jaccard:
    dist = 1 - overlap/100."""
    return 1.0 - max_asym_jaccard(a, b) / 100.0


def weighted_jaccard(
    a: Column, b: Column, alpha: float = 0.2, skew: float = 5.0
) -> Column:
    """Skew-regularized Jaccard — an intentionally simplified SET-BASED
    analogue of the reference's weighted measure (SimilarityMeasure.scala:
    113-143), not a restatement of it: the reference gates its skew branch
    on |x-y|/sqrt(x*y) > 5 over vector L1 norms and computes an
    L1-norm-weighted similarity, while this measure gates on the set-size
    ratio (max/min > ``skew``) and down-weights the larger side's
    non-overlap by w = 1/(alpha*ratio); else plain Jaccard. Same intent
    (don't let a lopsided pair's big side swamp the score) on index sets
    instead of weighted vectors. Column-expr twin of the ml.kernels pandas
    form — CASE branches guard the divisions so ANSI mode never sees a zero
    denominator on the taken path."""
    inter = _inter_size(a, b)
    sa = F.size(a).cast("double")
    sb = F.size(b).cast("double")
    small, large = F.least(sa, sb), F.greatest(sa, sb)
    union = sa + sb - inter
    plain = F.when(union > 0, 100.0 * inter / union).otherwise(F.lit(0.0))
    ratio = large / small
    denom = small + (1.0 / (alpha * ratio)) * (large - inter)
    weighted = F.when(denom > 0, 100.0 * inter / denom).otherwise(F.lit(0.0))
    return F.when(
        small > 0, F.when(ratio <= skew, plain).otherwise(weighted)
    ).otherwise(F.lit(0.0))


# ---------------------------------------------------------------------------
# Tier 2: dense-vector kernels over array<double>/array<float>
# ---------------------------------------------------------------------------


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i via zip_with + aggregate (JVM-side, no UDF)."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(v: Column) -> Column:
    sq = F.aggregate(_as_double(v), F.lit(0.0), lambda acc, x: acc + x * x)
    return F.sqrt(sq)


def cosine_similarity(a: Column, b: Column) -> Column:
    """Raw cosine in [-1,1]. Rescaled variant below matches the reference."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def cosine100(a: Column, b: Column) -> Column:
    """Reference scaling: 100·|cos| (SimilarityMeasure.scala:23-38 uses abs)."""
    return 100.0 * F.abs(cosine_similarity(a, b))


def manhattan100(a: Column, b: Column) -> Column:
    """100 / (1 + ‖a−b‖₁)  (SimilarityMeasure.scala:40-51)."""
    diffs = F.zip_with(_as_double(a), _as_double(b), lambda x, y: F.abs(x - y))
    l1 = F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)
    return 100.0 / (1.0 + l1)


def hamming100(a: Column, b: Column) -> Column:
    """100 / (1 + #unequal elements)  (SimilarityMeasure.scala:53-75)."""
    neq = F.zip_with(
        _as_double(a), _as_double(b), lambda x, y: F.when(x != y, 1.0).otherwise(0.0)
    )
    dist = F.aggregate(neq, F.lit(0.0), lambda acc, x: acc + x)
    return 100.0 / (1.0 + dist)


def dense_jaccard100(a: Column, b: Column) -> Column:
    """100 * (d - #unequal positions) / d with d = size(a)
    (SimilarityMeasure.scala:168-175: zip dense values, count x1 != x2)."""
    neq = F.zip_with(
        _as_double(a), _as_double(b), lambda x, y: F.when(x != y, 1.0).otherwise(0.0)
    )
    s = F.aggregate(neq, F.lit(0.0), lambda acc, x: acc + x)
    d = F.size(a).cast("double")
    return F.when(d > 0, 100.0 * (d - s) / d).otherwise(F.lit(0.0))


def euclidean_distance(a: Column, b: Column) -> Column:
    sq = F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


MEASURES = {
    "jaccard": jaccard,
    "maxasymjaccard": max_asym_jaccard,
    "left_jaccard": left_jaccard,
    "right_jaccard": right_jaccard,
}

VECTOR_MEASURES = {
    "cosine": cosine100,
    "manhattan": manhattan100,
    "hamming": hamming100,
    "densejaccard": dense_jaccard100,
}
