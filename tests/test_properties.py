"""Hypothesis property tests for the set-similarity Column expressions —
the engine's hottest inner loop (SURVEY §5 item 2)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from scabillmatch_spark.functions import similarity as SIM
from scabillmatch_spark.operators import blocking

token_sets = st.lists(st.integers(min_value=0, max_value=200), min_size=0, max_size=40)


def _eval_pairs(spark, rows):
    df = spark.createDataFrame(rows, "a array<long>, b array<long>")
    out = df.select(
        F.array_distinct("a").alias("a"), F.array_distinct("b").alias("b")
    ).select(
        SIM.jaccard(F.col("a"), F.col("b")).alias("j"),
        SIM.jaccard(F.col("b"), F.col("a")).alias("j_sym"),
        SIM.max_asym_jaccard(F.col("a"), F.col("b")).alias("o"),
        SIM.left_jaccard(F.col("a"), F.col("b")).alias("l"),
        SIM.right_jaccard(F.col("a"), F.col("b")).alias("r"),
    )
    return out.collect()


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(token_sets, token_sets), min_size=1, max_size=8))
def test_similarity_properties(spark, pairs):
    for row in _eval_pairs(spark, pairs):
        # bounds
        for v in (row.j, row.o, row.l, row.r):
            assert 0.0 <= v <= 100.0
        # symmetry of jaccard
        assert row.j == row.j_sym
        # jaccard <= overlap coefficient <= 100
        assert row.j <= row.o + 1e-9
        # overlap = max(left, right)... actually overlap >= both one-sided
        assert row.o >= row.l - 1e-9 and row.o >= row.r - 1e-9


def test_identical_sets_score_100(spark):
    rows = [([1, 2, 3], [1, 2, 3])]
    r = _eval_pairs(spark, rows)[0]
    assert r.j == 100.0 and r.o == 100.0 and r.l == 100.0 and r.r == 100.0


def test_disjoint_sets_score_0(spark):
    r = _eval_pairs(spark, [([1, 2], [3, 4])])[0]
    assert r.j == 0.0 and r.o == 0.0


def test_salted_two_phase_agg_exact(spark):
    df = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(1000)], ["k", "v"]
    )
    out = blocking.salted_two_phase_agg(df, ["k"], {"v": "sum", "k": "count"}, salt_n=8)
    got = {r.k: (r.v_sum, r.k_count) for r in out.collect()}
    want = {
        r.k: (r.s, r.c)
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")).collect()
    }
    assert got == want

def test_rolling_hash_shingle_ids_match_reference(spark):
    """The integer rolling-hash shingle ids (text.ngram_ids_from_token_ids)
    must equal a direct Python evaluation of the spec: fold
    (acc*B + id mod P) mod P over each 3-token window of md5 token ids —
    including short docs, repeated tokens, and digit-stripped input."""
    import hashlib
    import re

    from scabillmatch_spark.functions import text as TX

    def ref_ids(text: str, n: int = 3) -> list[int]:
        cleaned = re.sub(r"[0-9,:;?!.]", "", text.lower())
        toks = [t for t in cleaned.split(" ") if t]
        ids = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks]
        out = set()
        for i in range(len(ids) - n + 1):
            acc = 0
            for x in ids[i : i + n]:
                acc = (acc * TX.SHINGLE_B + x % TX.HASH_PRIME) % TX.HASH_PRIME
            out.add(acc)
        return sorted(out)

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a a a a a",                      # repeated tokens -> one shingle id
        "only two",                       # shorter than n -> empty
        "",                               # empty text
        "mix3d d1g1ts, and punct!? here." # cleaning path
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    got = {
        r.i: list(r.s)
        for r in df.select("i", TX.ngram_id_set("text", 3).alias("s")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == ref_ids(t), (i, t)


# --- curation-operator properties -------------------------------------------

docs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # doc id
        st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=25),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


@settings(max_examples=8, deadline=None)
@given(docs_strategy, docs_strategy)
def test_decontamination_matches_bruteforce(spark, train_rows, eval_rows):
    """decontamination_hits == the python brute-force distinct-overlap count
    on arbitrary gram-id sets (ids used directly as grams)."""
    from scabillmatch_spark.operators.curation import decontamination_hits

    train = spark.createDataFrame(
        [(i, sorted(set(g))) for i, g in train_rows], "doc_id long, gram_ids array<long>"
    )
    eval_ = spark.createDataFrame(
        [(i, sorted(set(g))) for i, g in eval_rows], "doc_id long, gram_ids array<long>"
    )
    got = {
        r["doc_id"]: r["n_hits"] for r in decontamination_hits(train, eval_).collect()
    }
    egrams = set().union(*(set(g) for _, g in eval_rows)) if eval_rows else set()
    want = {
        i: len(set(g) & egrams) for i, g in train_rows if set(g) & egrams
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1000),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=300),
)
def test_pack_sequences_matches_running_sum(spark, rows, budget):
    """pack_id == floor(run-sum-before / budget) in doc order, per the
    start-offset contract, for arbitrary token counts and budgets."""
    from scabillmatch_spark.operators.curation import pack_sequences

    df = spark.createDataFrame(
        [(i, "g", n) for i, n in rows], "doc_id long, lang string, n_tokens long"
    )
    got = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences(df, budget, ["lang"]).collect()
    }
    before = 0
    for i, n in sorted(rows):
        assert got[i] == before // budget
        before += n


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=5),
)
def test_stratified_sample_is_exact_k_and_stable(spark, rows, k):
    from scabillmatch_spark.operators.curation import stratified_sample

    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = stratified_sample(df, ["src"], k).collect()
    per = {}
    for r in out:
        per.setdefault(r["src"], []).append(r["doc_id"])
    sizes = {s: len([1 for _, x in rows if x == s]) for s in {x for _, x in rows}}
    for s, ids in per.items():
        assert len(ids) == min(k, sizes[s])
    # replayable: second run picks identical rows
    again = stratified_sample(df, ["src"], k).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in out)


# --- MERGE semantics vs a dict-model reference ------------------------------

_merge_targets = st.lists(
    st.tuples(st.integers(0, 15), st.integers(-5, 5)),
    min_size=0, max_size=10,
    unique_by=lambda t: t[0],
)
_merge_sources = st.lists(
    st.tuples(st.integers(0, 15), st.integers(-5, 5), st.booleans()),
    min_size=0, max_size=10,
    unique_by=lambda t: t[0],
)


def _merge_model(target, source, insert):
    """Dict-model ANSI MERGE: matched+delete -> drop; matched -> update;
    source-only -> insert (unless delete-flagged or insert=False)."""
    out = {k: v for k, v in target}
    for k, v, dele in source:
        if k in out:
            if dele:
                del out[k]
            else:
                out[k] = v
        elif insert and not dele:
            out[k] = v
    return out


@settings(max_examples=8, deadline=None)
@given(_merge_targets, _merge_sources, st.booleans(), st.booleans())
def test_merge_into_matches_dict_model(spark, target, source, insert, bcast):
    from scabillmatch_spark.operators.merge import merge_into

    tgt = spark.createDataFrame(target, "k long, v long") if target else (
        spark.createDataFrame([], "k long, v long")
    )
    src = spark.createDataFrame(source, "k long, v long, del boolean") if source else (
        spark.createDataFrame([], "k long, v long, del boolean")
    )
    got = {r.k: r.v for r in
           merge_into(tgt, src, ["k"], delete_col="del", insert=insert,
                      broadcast_source=bcast).collect()}
    assert got == _merge_model(target, source, insert)


def _py_lev(a: str, b: str) -> int:
    # classic Wagner-Fischer reference implementation
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcx ", min_size=0, max_size=12),
        min_size=2, max_size=10,
    ),
    st.integers(min_value=0, max_value=6),
    st.integers(min_value=1, max_value=4),
)
def test_blocked_edit_join_matches_bruteforce(spark, texts, d, pfx):
    """blocked_edit_distance_join == brute force restricted to the same
    blocking contract (prefix equality + id order), distances verified
    against a pure-Python Wagner-Fischer."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    got = {
        (r.pk1, r.pk2): r.distance
        for r in blocking.blocked_edit_distance_join(
            df, "doc_id", "t", max_distance=d, prefix_len=pfx
        ).collect()
    }
    want = {}
    for i, a in rows:
        for j, b in rows:
            if i < j and a[:pfx] == b[:pfx]:
                dist = _py_lev(a, b)
                if dist <= d:
                    want[(i, j)] = dist
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),      # doc_id
            st.sampled_from(["x", "y"]),                  # stratum
            st.integers(min_value=-2, max_value=1000),    # weight
        ),
        min_size=1, max_size=30, unique_by=lambda r: r[0],
    ),
    st.integers(min_value=1, max_value=5),
)
def test_weighted_sample_matches_python_model(spark, rows, k):
    """weighted_sample == a pure-Python A-ES model computing the identical
    md5-derived keys — full membership AND rank cross-validation."""
    import hashlib
    import math

    from scabillmatch_spark.operators import curation

    df = spark.createDataFrame(rows, "doc_id long, lang string, w long")
    got = {
        (r.lang, r["__rk"]): r.doc_id
        for r in curation.weighted_sample(df, ["lang"], k, "w").collect()
    }
    by_stratum = {}
    for doc_id, lang, w in rows:
        if w <= 0:
            continue
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        key = math.log((h + 1) / float(1 << 60)) / w
        by_stratum.setdefault(lang, []).append((-key, doc_id))
    want = {}
    for lang, entries in by_stratum.items():
        for rk, (_, doc_id) in enumerate(sorted(entries)[:k], 1):
            want[(lang, rk)] = doc_id
    assert got == want


# ---------------------------------------------------------------------------
# r9 surfaces: motif engine and Arrow grouped kernel vs brute force
# ---------------------------------------------------------------------------

_edges_strategy = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)),
    min_size=1,
    max_size=14,
)


@settings(max_examples=8, deadline=None)
@given(_edges_strategy)
def test_motif_open_path_matches_bruteforce(spark, edge_list):
    """motif_find's (a)->(b)->(c) with !(a)->(c) must equal a pure-Python
    enumeration over the same DIRECTED distinct edge set."""
    from scabillmatch_spark.operators.graph import motif_find

    edges = {(s, d) for s, d in edge_list if s != d}
    if not edges:
        return
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {
        (r.a, r.b, r.c)
        for r in motif_find(
            df, "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)"
        ).collect()
    }
    expect = {
        (a, b, c)
        for (a, b) in edges
        for (b2, c) in edges
        if b2 == b and (a, c) not in edges
    }
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(_edges_strategy)
def test_open_triangles_matches_bruteforce(spark, edge_list):
    """open_triangles must equal brute-force wedge-minus-closure over the
    canonicalized undirected graph."""
    from scabillmatch_spark.operators.graph import open_triangles

    canon = {(min(s, d), max(s, d)) for s, d in edge_list if s != d}
    if not canon:
        return
    df = spark.createDataFrame(sorted(canon), "src long, dst long")
    got = {(r.a, r.b, r.c) for r in open_triangles(df).collect()}
    und = canon | {(d, s) for s, d in canon}
    verts = {v for e in canon for v in e}
    expect = {
        (a, b, c)
        for b in verts
        for (b1, a) in und
        if b1 == b
        for (b2, c) in und
        if b2 == b and a < c and (a, c) not in canon
    }
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),  # group
            st.lists(
                st.floats(-4, 4, allow_nan=False, width=32),
                min_size=3,
                max_size=3,
            ),
        ),
        min_size=2,
        max_size=10,
    )
)
def test_grouped_allpairs_matches_pure_python(spark, rows):
    """The Arrow kernel's int64 dot/norm cells must equal a sequential
    pure-Python computation over the identically floor-scaled vectors —
    the same determinism contract the DuckDB oracle relies on."""
    import math

    from scabillmatch_spark.operators.arrow_kernels import (
        grouped_allpairs_scores,
    )

    data = [(g, i, v) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "g int, vid long, v array<float>")
    got = {
        (r.g, r.id1, r.id2): (r.dot, r.n1, r.n2)
        for r in grouped_allpairs_scores(df, "g", "vid", "v").collect()
    }
    # pure-Python reference: float32 storage semantics first, then scale
    import numpy as np

    def q(vec):
        return [
            int(math.floor(float(np.float32(x)) * (1 << 20))) for x in vec
        ]

    expect = {}
    for g1, i1, v1 in data:
        for g2, i2, v2 in data:
            if g1 != g2 or i1 >= i2:
                continue
            a, b = q(v1), q(v2)
            expect[(g1, i1, i2)] = (
                sum(x * y for x, y in zip(a, b)),
                sum(x * x for x in a),
                sum(y * y for y in b),
            )
    assert got == expect


# ---- generic vertex program (r10): pregel == adjacency-matrix power ------

_edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9), st.integers(min_value=0, max_value=9)
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=20,
)


@settings(max_examples=6, deadline=None)
@given(_edge_lists, st.integers(min_value=1, max_value=3))
def test_pregel_walks_match_matrix_power(spark, raw_edges, n_iter):
    """k supersteps of integer sum-over-in-neighbors from state=1 must
    equal A^k @ 1 on the DIRECTED distinct edge set — pregel's message
    flow is exactly repeated sparse-matrix multiplication."""
    import numpy as np

    from scabillmatch_spark.operators import graph

    edges_d = sorted(set(raw_edges))
    edges = spark.createDataFrame(edges_d, ["src", "dst"])
    verts = graph.vertices_from_edges(edges)
    res = graph.pregel(
        edges,
        verts,
        initial_state=F.lit(1).cast("long"),
        agg_msgs=F.sum("msg"),
        update_state=F.coalesce(F.col("msg"), F.lit(0)).cast("long"),
        send_to_dst=F.col("src.state"),
        max_iter=n_iter,
    )
    got = {r.id: r.state for r in res.collect()}
    ids = sorted(got)
    idx = {v: i for i, v in enumerate(ids)}
    a = np.zeros((len(ids), len(ids)), dtype=np.int64)
    for s, d in edges_d:
        a[idx[d], idx[s]] = 1  # messages flow src -> dst: state' = A @ state
    state = np.ones(len(ids), dtype=np.int64)
    for _ in range(n_iter):
        state = a @ state
    assert got == {v: int(state[idx[v]]) for v in ids}


_bfs_edges = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=14,
)


@settings(max_examples=8, deadline=None)
@given(_bfs_edges, st.integers(0, 9), st.integers(0, 9), st.booleans())
def test_bfs_matches_bruteforce_enumeration(spark, edge_list, src, dst, directed):
    """graph.bfs == brute-force all-minimum-length-simple-paths on random
    small graphs, both directed and undirected (the fixed-seed golden test
    covers one graph; this sweeps the structure space)."""
    from pyspark.sql import functions as F

    from scabillmatch_spark.operators import graph
    from tests.test_graph import _bfs_reference

    edges = spark.createDataFrame(sorted(set(edge_list)), ["src", "dst"])
    want = _bfs_reference(
        sorted(set(edge_list)), {src}, {dst}, max_len=5, directed=directed
    )
    got = {
        tuple(r.path)
        for r in graph.bfs(
            edges,
            F.col("id") == src,
            F.col("id") == dst,
            max_path_length=5,
            undirected=not directed,
        ).collect()
    }
    # vertices absent from the edge list can't be BFS endpoints (the vertex
    # frame derives from edges); the reference agrees by construction there
    verts = {v for e in edge_list for v in e}
    if src not in verts or dst not in verts:
        assert got == set()
    else:
        assert got == want
