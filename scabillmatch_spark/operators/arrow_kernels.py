"""Arrow-native grouped kernels: ``groupBy().applyInArrow`` all-pairs scoring.

The engine's group-local all-pairs tier (SURVEY §2 A5/A6; the reference
pairs bills inside a blocking key, feature/Utils.scala:284-305) has two
Spark paths already: pure Column-expr band joins (the default hot path) and
an applyInPandas escape hatch. This module adds the third tier for the
VECTOR case: pyspark 4's ``GroupedData.applyInArrow`` hands each group to
the Python worker as a ``pyarrow.Table`` — the group's embedding matrix
reaches numpy with no pandas materialization (one contiguous buffer view of
the Arrow list values), and the whole group's pairwise scores are a single
int64 matmul.

Determinism contract: inputs are floor-scaled to integers
(``round(x * 2^scale_bits)``-free — plain ``floor`` — the same 2^20 trick as
the sign-LSH cascade in ``__spark_entry__``) and ALL pairwise math is
int64-exact, so any reimplementation — DuckDB SQL over unnested lists, a
sequential loop — reproduces every dot/norm bit-for-bit; cosine is then ONE
float64 expression over those exact integers, identical on every engine.

Scale shape: grouped all-pairs is only sane under a blocker (label, LSH
band, IVF cell, near-dup cluster) that bounds group size — the kernel
REFUSES oversized groups instead of quietly OOMing an executor, and the
vectors shuffle exactly once, on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def grouped_allpairs_scores(
    df: DataFrame,
    group_col: str,
    id_col: str,
    vec_col: str,
    *,
    scale_bits: int = 20,
    min_cosine: float | None = None,
    max_group_size: int = 8192,
) -> DataFrame:
    """Exact all-pairs integer dot/norm scores WITHIN each group ->
    (group_col, id1, id2, dot, n1, n2), id1 < id2.

    ``dot``/``n1``/``n2`` are int64-exact over the floor-scaled vectors
    (value * 2^scale_bits, floored). With 64-dim unit-ish vectors at
    scale_bits=20 a dot is ~2^46 — far inside both int64 and float64's
    exact-integer range, so downstream ``dot / (sqrt(n1)*sqrt(n2))`` is one
    deterministic float64 expression.

    ``min_cosine`` pushes the threshold INTO the kernel (the filter
    decision uses the identical float64 expression an oracle computes from
    the same integers, so boundary decisions agree), cutting the emitted
    pair set from O(n^2) to the survivors — the difference between
    shipping 12 M scores and 10 k at a 5000-row group.

    Groups larger than ``max_group_size`` raise: an unblocked group is a
    quadratic bug upstream, and failing the task loudly beats an executor
    OOM with no named cause.

    NULL group keys: Spark's groupBy gathers NULL-keyed rows into one real
    group and this kernel scores it like any other — note that SQL
    equi-join reformulations (oracles, downstream joins on the group
    column) DROP those pairs instead. Filter NULL keys upstream when the
    two must agree.
    """
    import pyarrow as pa

    scale = float(1 << scale_bits)
    group_type = df.schema[group_col].dataType.simpleString()
    out_schema = (
        f"{group_col} {group_type}, id1 long, id2 long,"
        " dot long, n1 long, n2 long"
    )

    def kernel(table: "pa.Table") -> "pa.Table":
        import numpy as np
        import pyarrow as pa

        n = table.num_rows
        empty = {
            group_col: pa.array([], table.column(group_col).type),
            "id1": pa.array([], pa.int64()),
            "id2": pa.array([], pa.int64()),
            "dot": pa.array([], pa.int64()),
            "n1": pa.array([], pa.int64()),
            "n2": pa.array([], pa.int64()),
        }
        if n < 2:
            return pa.table(empty)
        if n > max_group_size:
            raise ValueError(
                f"group of {n} rows exceeds max_group_size={max_group_size}"
                " — all-pairs scoring needs a tighter blocker upstream"
            )
        ids = table.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        vec = table.column(vec_col).combine_chunks()
        flat = vec.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        if flat.size % n:
            raise ValueError("ragged vector column — equal dims required")
        dim = flat.size // n
        offsets = vec.offsets.to_numpy()
        if not (np.diff(offsets) == dim).all():
            raise ValueError("ragged vector column — equal dims required")
        m = np.floor(flat * scale).astype(np.int64).reshape(n, dim)
        gram = m @ m.T
        norms = np.diagonal(gram).copy()
        iu, ju = np.triu_indices(n, k=1)
        a, b, dot = ids[iu], ids[ju], gram[iu, ju]
        na, nb = norms[iu], norms[ju]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        n1 = np.where(swap, nb, na)
        n2 = np.where(swap, na, nb)
        if min_cosine is not None:
            denom = np.sqrt(n1.astype(np.float64)) * np.sqrt(
                n2.astype(np.float64)
            )
            with np.errstate(divide="ignore", invalid="ignore"):
                keep = dot.astype(np.float64) / denom >= min_cosine
            keep &= denom > 0
            a2, b2, dot, n1, n2 = a2[keep], b2[keep], dot[keep], n1[keep], n2[keep]
        gval = table.column(group_col)[0]
        return pa.table(
            {
                group_col: pa.array(
                    [gval.as_py()] * len(a2), table.column(group_col).type
                ),
                "id1": pa.array(a2, pa.int64()),
                "id2": pa.array(b2, pa.int64()),
                "dot": pa.array(dot, pa.int64()),
                "n1": pa.array(n1, pa.int64()),
                "n2": pa.array(n2, pa.int64()),
            }
        )

    return (
        df.select(group_col, id_col, vec_col)
        .groupBy(group_col)
        .applyInArrow(kernel, schema=out_schema)
    )
