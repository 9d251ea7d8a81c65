"""spark.sql surface: every engine capability reachable from SQL.

``register(spark)`` installs:
- similarity / text functions as SQL UDFs (set measures wrap the same
  Column-expression implementations; vector kernels are the Arrow pandas
  UDFs) — usable as ``SELECT sim_jaccard(a, b) FROM ...``;
- the testdata tables as temp views when a scale-factor dir is given.

The engine's preferred surface is the DataFrame API (Column exprs stay in
codegen; SQL UDFs cross the expression boundary per call for the set
measures), so these registrations are for interactive/SQL-first users.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def register(spark: SparkSession, sf_dir: str | None = None) -> None:
    from scabillmatch_spark.ml import kernels

    # vector kernels (Arrow-batched pandas UDFs) under sim_v_* names
    for name in kernels.MEASURE_NAMES:
        spark.udf.register(f"sim_v_{name}", kernels.vector_similarity(name))

    # set measures: plain Python UDFs wrapping the same formulas — SQL-surface
    # convenience only; DataFrame users get the codegen'd Column exprs
    def _jaccard(a, b):
        if not a or not b:
            return 0.0
        sa, sb = set(a), set(b)
        u = len(sa | sb)
        return 100.0 * len(sa & sb) / u if u else 0.0

    def _overlap(a, b):
        if not a or not b:
            return 0.0
        sa, sb = set(a), set(b)
        m = min(len(sa), len(sb))
        return 100.0 * len(sa & sb) / m if m else 0.0

    spark.udf.register("sim_jaccard", _jaccard, T.DoubleType())
    spark.udf.register("sim_overlap", _overlap, T.DoubleType())

    # table function (Spark 4 Python UDTF): lateral text chunking for
    # SQL-first users — the DataFrame tier's chunker (curation /
    # doc_chunk_overlap) stays the codegen'd hot path; this exposes the
    # same sliding-window semantics as
    #   SELECT d.doc_id, c.* FROM documents d,
    #          LATERAL chunk_text(d.text, 200, 40) c
    from pyspark.sql.functions import udtf

    class _ChunkText:
        def eval(self, text, size, overlap):
            if text is None or size is None or size <= 0:
                return
            step = max(1, size - (overlap or 0))
            idx, i = 0, 0
            while i < len(text):
                yield idx, text[i : i + size]
                idx += 1
                i += step

    spark.udtf.register(
        "chunk_text",
        udtf(_ChunkText, returnType="chunk_idx int, chunk string"),
    )

    if sf_dir:
        from scabillmatch_spark.io.sources import register_tables

        register_tables(spark, sf_dir)
