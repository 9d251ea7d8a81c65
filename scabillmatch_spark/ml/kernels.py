"""Vectorized similarity kernels (Arrow-batched pandas UDFs) for ml
VectorUDT columns — the reference's SimilarityMeasure.scala:19-175 family.

The engine's default scoring path is JVM-side Column expressions over
array<long>/array<double> (functions/similarity.py). These kernels exist for
the VectorUDT boundary (TF-IDF SparseVectors out of the ml pipeline), where
built-in array functions don't apply. All rescaled to [0,100] like the
reference; similarity values are float (SimilarityMeasure.scala:20).

Per-batch numpy/scipy-free implementations (scipy optional): operate on
sparse indices/values directly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType


def _to_index_values(v):
    """ml Vector -> (int indices, float values).

    Inside an Arrow-batched pandas UDF a VectorUDT value arrives as its
    serialized struct {type: 0|1, size, indices, values} (dict-like), not a
    Vector object — handle both forms."""
    if isinstance(v, (dict, pd.Series)):
        keys = set(v.keys()) if isinstance(v, dict) else set(v.index)
        idx_field = v["indices"] if "indices" in keys else None
        if idx_field is None or (np.isscalar(idx_field) and pd.isna(idx_field)):
            idx_field = None
        if idx_field is not None:
            return (
                np.asarray(idx_field, dtype=np.int64),
                np.asarray(v["values"], dtype=np.float64),
            )
        arr = np.asarray(v["values"], dtype=np.float64)
        idx = np.nonzero(arr)[0]
        return idx, arr[idx]
    if hasattr(v, "indices"):
        return np.asarray(v.indices, dtype=np.int64), np.asarray(v.values, dtype=np.float64)
    arr = np.asarray(v.toArray() if hasattr(v, "toArray") else v, dtype=np.float64)
    idx = np.nonzero(arr)[0]
    return idx, arr[idx]


def _records(x):
    """Arrow hands struct columns (VectorUDT) to pandas UDFs as a DataFrame
    (Spark 4) — one column per struct field. Normalize to per-row dicts."""
    if isinstance(x, pd.DataFrame):
        return x.to_dict("records")
    return list(x)


def _pairwise(series1, series2, fn) -> pd.Series:
    return pd.Series(
        [fn(a, b) for a, b in zip(_records(series1), _records(series2))],
        dtype="float64",
    )


def _cosine(v1, v2) -> float:
    """100 * |v1.v2| / (||v1|| ||v2||)  (SimilarityMeasure.scala:23-38)."""
    i1, x1 = _to_index_values(v1)
    i2, x2 = _to_index_values(v2)
    common, c1, c2 = np.intersect1d(i1, i2, return_indices=True)
    dot = float(np.dot(x1[c1], x2[c2])) if common.size else 0.0
    n1 = float(np.sqrt(np.dot(x1, x1)))
    n2 = float(np.sqrt(np.dot(x2, x2)))
    if n1 == 0.0 or n2 == 0.0:
        return 0.0
    return 100.0 * abs(dot) / (n1 * n2)


def _manhattan(v1, v2) -> float:
    """100 / (1 + ||v1-v2||_1)  (SimilarityMeasure.scala:40-51)."""
    i1, x1 = _to_index_values(v1)
    i2, x2 = _to_index_values(v2)
    d = {int(i): float(x) for i, x in zip(i1, x1)}
    l1 = 0.0
    for i, x in zip(i2, x2):
        l1 += abs(d.pop(int(i), 0.0) - x)
    l1 += sum(abs(x) for x in d.values())
    return 100.0 / (1.0 + l1)


def _hamming(v1, v2) -> float:
    """100 / (1 + #unequal nonzero positions)  (SimilarityMeasure.scala:53-75)."""
    i1, x1 = _to_index_values(v1)
    i2, x2 = _to_index_values(v2)
    d = {int(i): float(x) for i, x in zip(i1, x1)}
    dist = 0
    for i, x in zip(i2, x2):
        if d.pop(int(i), None) != x:
            dist += 1
    dist += len(d)
    return 100.0 / (1.0 + dist)


def _vec_size(v):
    """Dimension of an ml Vector in any of its UDF arrival forms (sparse
    structs carry an explicit size; dense structs carry the full values
    array)."""
    if isinstance(v, (dict, pd.Series)):
        keys = set(v.keys()) if isinstance(v, dict) else set(v.index)
        sz = v["size"] if "size" in keys else None
        if sz is not None and not (np.isscalar(sz) and pd.isna(sz)):
            return int(sz)
        return len(v["values"])
    if hasattr(v, "size"):
        return int(v.size)
    return len(v)


def _dense_jaccard(v1, v2) -> float:
    """100 * (d - #unequal positions) / d, d = v1.size
    (SimilarityMeasure.scala:168-175). Positions absent from both sparse
    index sets are equal (0 == 0), so only the union of indices is scanned."""
    i1, x1 = _to_index_values(v1)
    i2, x2 = _to_index_values(v2)
    m1 = {int(i): float(x) for i, x in zip(i1, x1)}
    m2 = {int(i): float(x) for i, x in zip(i2, x2)}
    s = sum(1 for i in set(m1) | set(m2) if m1.get(i, 0.0) != m2.get(i, 0.0))
    d = _vec_size(v1)
    return 100.0 * (d - s) / d if d else 0.0


def _jaccard(v1, v2) -> float:
    """Index-set Jaccard (SimilarityMeasure.scala:78-95)."""
    s1 = set(map(int, _to_index_values(v1)[0]))
    s2 = set(map(int, _to_index_values(v2)[0]))
    union = len(s1 | s2)
    return 100.0 * len(s1 & s2) / union if union else 0.0


def _max_asym_jaccard(v1, v2) -> float:
    """Overlap coefficient (SimilarityMeasure.scala:97-111)."""
    s1 = set(map(int, _to_index_values(v1)[0]))
    s2 = set(map(int, _to_index_values(v2)[0]))
    m = min(len(s1), len(s2))
    return 100.0 * len(s1 & s2) / m if m else 0.0


def _weighted_jaccard(v1, v2, alpha: float = 0.2, skew: float = 5.0) -> float:
    """Intentionally simplified set-based analogue of the reference's
    weighted measure (SimilarityMeasure.scala:113-143) — same intent,
    different formula: the reference gates on |x-y|/sqrt(x*y) > 5 over
    vector L1 norms and computes an L1-norm-weighted similarity; this
    kernel gates on the index-set size ratio and, past ``skew``, uses an
    alpha-regularized denominator that down-weights the larger document;
    else plain Jaccard. Kept in lockstep with
    functions.similarity.weighted_jaccard and the DuckDB oracle."""
    s1 = set(map(int, _to_index_values(v1)[0]))
    s2 = set(map(int, _to_index_values(v2)[0]))
    if not s1 or not s2:
        return 0.0
    small, large = (s1, s2) if len(s1) <= len(s2) else (s2, s1)
    ratio = len(large) / len(small)
    inter = len(s1 & s2)
    if ratio <= skew:
        union = len(s1 | s2)
        return 100.0 * inter / union if union else 0.0
    # weighted: regularize the large side's contribution
    w = 1.0 / (alpha * ratio)
    denom = len(small) + w * (len(large) - inter)
    return 100.0 * inter / denom if denom else 0.0


_KERNELS = {
    "cosine": _cosine,
    "manhattan": _manhattan,
    "hamming": _hamming,
    "jaccard": _jaccard,
    "maxasymjaccard": _max_asym_jaccard,
    "weighted_jaccard": _weighted_jaccard,
    "densejaccard": _dense_jaccard,
}


def vector_similarity(name: str) -> Column:
    """Factory: a pandas UDF computing the named measure over two VectorUDT
    columns. Usage: df.withColumn('similarity', vector_similarity('cosine')(
    F.col('f1'), F.col('f2')))."""
    fn = _KERNELS[name]

    @pandas_udf(DoubleType())
    def kernel(a: pd.Series, b: pd.Series) -> pd.Series:
        return _pairwise(a, b, fn)

    return kernel


MEASURE_NAMES = tuple(_KERNELS)


# ---------------------------------------------------------------------------
# Vector introspection (for in-plan invariant assertions over ml outputs)
# ---------------------------------------------------------------------------


@pandas_udf(ArrayType(LongType()))
def vector_indices(v: pd.Series) -> pd.Series:
    """Sorted nonzero-index set of a VectorUDT column as array<long> — lets
    relational set math (array_intersect) cross-check pandas-UDF distance
    kernels in correctness-assertion queries."""
    return pd.Series(
        [sorted(int(i) for i in _to_index_values(r)[0]) for r in _records(v)]
    )


@pandas_udf(DoubleType())
def vector_l2_norm(v: pd.Series) -> pd.Series:
    """L2 norm of a VectorUDT column (norm-preservation bounds for SVD/LSA)."""
    return pd.Series(
        [float(np.sqrt(np.dot(x, x))) for x in
         (_to_index_values(r)[1] for r in _records(v))],
        dtype="float64",
    )
