"""DuckDB oracle mirrors for the driver contract — the cross-engine
CONTRACT data module (split out of __spark_entry__.py in round 13 per the
r12 verdict: the entry file had grown past 8.5k lines mostly with oracle
SQL).

Owns two things:

1. The shared contract constants (LSH banding parameters, BRP/near-dup
   thresholds, the deterministic hyperplane generator, the version-rank
   fixture): BOTH the Spark queries in __spark_entry__.py and the DuckDB
   SQL here import them from this module, so the two engines cannot
   drift independently.
2. Every ``_*_oracle()`` SQL builder plus ``oracle_sql()`` — the ANSI-SQL
   DuckDB equivalents the driver runs side-by-side with the Spark
   queries at sf=0.01 (rows + schema + value-hash compare).

__spark_entry__ re-exports everything here, so ``entrymod._x_oracle``
references in tests keep working; prefer importing from this module in
new code. No Spark imports at module level — this file is pure strings
+ stdlib + the scabillmatch_spark.functions.text constants.
"""

from __future__ import annotations

# Shared Spark<->oracle LSH banding config. Bands of 8 rows keep precision
# high on this extremely dense corpus (~43% of same-lang pairs have J>=0.6 —
# 2-row bands would explode candidates); 4 such bands give candidate recall
# ~90% at J>=0.90 and ~98.7% at J>=0.95 (1-(1-J^8)^4), vs ~67%/89% for the
# round-2 2-band config, at the same measured wall time. Shingle sets are far
# sparser, so the shingle dedup affords 8 bands of 4 (recall ~89% at J>=0.7).
DOC_LSH_HASHES, DOC_LSH_BANDS = 32, 4


SHINGLE_LSH_HASHES, SHINGLE_LSH_BANDS = 32, 8


def _graph_bfs_paths_oracle() -> str:
    """Oracle for the (unregistered until r12) bfs-paths query: components
    via the recursive-reach CTE (as in doc_dup_clusters), endpoints =
    (global min id, max id of its component), then bounded simple-path
    enumeration from the single source — UNION ALL recursion pruned by
    list_contains (simple paths), len < 4 (the query's max_path_length),
    and head <> target (a path THROUGH the target can never become a
    minimal hit); minimal hits selected by len = MIN(len). Single-source
    recursion over the banded edge set stays small (≤ deg^3 list rows at
    the observed 1-2 hop answer depth)."""
    cte = _DUCK_EDGE_CTE.format(banded=_banded_pairs_cte(_DUCK_TOKIDSET))
    return f"""
    WITH RECURSIVE {cte},
    reach(a, b) AS (
        SELECT id, id FROM verts
        UNION
        SELECT r.a, u.d FROM reach r JOIN und u ON u.s = r.b
    ),
    comp AS (SELECT a AS id, MIN(b) AS component FROM reach GROUP BY a),
    lm AS (SELECT MIN(id) AS src FROM verts),
    tgt AS (
        SELECT MAX(c.id) AS dst FROM comp c
        WHERE c.component = (
            SELECT component FROM comp WHERE id = (SELECT src FROM lm)
        )
    ),
    paths(head, path, len) AS (
        SELECT src, [src], 0 FROM lm
        UNION ALL
        SELECT u.d, list_append(p.path, u.d), p.len + 1
        FROM paths p JOIN und u ON u.s = p.head
        WHERE NOT list_contains(p.path, u.d)
          AND p.len < 4
          AND p.head <> (SELECT dst FROM tgt)
    ),
    hits AS (SELECT * FROM paths WHERE head = (SELECT dst FROM tgt))
    SELECT (SELECT src FROM lm) AS start,
           head AS "end",
           CAST(len AS INT) AS length,
           array_to_string(
               list_transform(path, x -> CAST(x AS VARCHAR)), '->'
           ) AS path_str
    FROM hits WHERE len = (SELECT MIN(len) FROM hits)"""


def _graph_cluster_audit_oracle(iters: int = 4) -> str:
    """Oracle for the (unregistered until r12) cluster audit: recursive
    reachability for components (as in doc_dup_clusters) + the shared
    unrolled LPA rounds (_lpa_rounds_cte — the exact text the LPA oracle
    runs), joined on vertex id and rolled up per component. Integer
    aggregates CAST per the house convention."""
    cte = _DUCK_EDGE_CTE.format(banded=_banded_pairs_cte(_DUCK_TOKIDSET))
    rounds, final = _lpa_rounds_cte(iters)
    return f"""
    WITH RECURSIVE {cte},
    reach(a, b) AS (
        SELECT id, id FROM verts
        UNION
        SELECT r.a, u.d FROM reach r JOIN und u ON u.s = r.b
    ),
    comp AS (SELECT a AS id, MIN(b) AS component FROM reach GROUP BY a),{rounds}
    SELECT c.component,
           CAST(COUNT(*) AS BIGINT) AS n_vertices,
           CAST(COUNT(DISTINCT l.label) AS BIGINT) AS n_communities,
           COUNT(DISTINCT l.label) > 1 AS is_bridged
    FROM comp c JOIN {final} l ON l.id = c.id
    GROUP BY c.component"""


def _io_xml_roundtrip_oracle() -> str:
    """Oracle for the XML round trip (registered r11): fingerprint
    the SOURCE table; equality proves the XML codec lossless. Same cells
    as the CSV oracle minus the byte-length column (strlen adds nothing
    over n_chars here), all integer aggregates CAST AS BIGINT."""
    return """
        SELECT lang,
               count(*) AS n_docs,
               count(DISTINCT doc_id) AS n_ids,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               count(DISTINCT md5(text)) AS n_distinct_md5,
               CAST(COALESCE(
                   sum(('0x' || substr(md5(text), 1, 15))::UBIGINT::BIGINT
                       % 1000000007), 0) AS BIGINT) AS text_chk_sum,
               COALESCE(bit_xor(('0x' || substr(md5(text), 1, 15))::UBIGINT::BIGINT),
                        0) AS text_chk_xor
        FROM documents GROUP BY lang
    """


def _media_wav_audio_stats_oracle() -> str:
    """Oracle for the (unregistered until r13) WAV query: every cell
    recomputed from md5(text) hex — sample i (0..7) is the signed
    little-endian int16 at hex chars [4i+1, 4i+4] (lo byte first), RMS =
    sqrt(avg(v^2)). Header fields are the query's literals (mono, 8 kHz,
    8 frames, 1 ms)."""
    return """
        SELECT doc_id AS media_id,
               1 AS n_channels,
               8000 AS sample_rate,
               CAST(8 AS BIGINT) AS n_frames,
               CAST(0.001 AS DOUBLE) AS duration_s,
               (ROUND(sqrt(sv.ms), 6) + 0.0) AS rms
        FROM documents d,
        LATERAL (
            SELECT avg(v * v) AS ms FROM (
                SELECT CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS v
                FROM (
                    SELECT CAST(('0x' || substr(md5(d.text), i * 4 + 3, 2)
                                       || substr(md5(d.text), i * 4 + 1, 2))
                                AS INTEGER) AS raw
                    FROM range(0, 8) t(i)
                )
            )
        ) sv
    """


def _doc_phrase_search_oracle(phrase: tuple = ("table", "scan")) -> str:
    """Oracle for the (unregistered until r16) phrase query: scan every
    window start over the shared token-list mirror and test positional
    equality term-by-term (DuckDB lists are 1-based)."""
    conds = " AND ".join(
        f"t[CAST(r.i AS INT) + {i}] = '{w}'" for i, w in enumerate(phrase)
    )
    return f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKLIST} AS t FROM documents),
    anchors AS (
        SELECT doc_id, CAST(r.i - 1 AS BIGINT) AS a
        FROM toks, UNNEST(range(1, len(t) - {len(phrase) - 2})) AS r(i)
        WHERE {conds}
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(MIN(a) AS BIGINT) AS first_pos
    FROM anchors GROUP BY doc_id"""


def _doc_bm25_search_oracle() -> str:
    """Oracle for the (unregistered until r13) BM25 query: the same
    textbook formula over the shared token-list mirror. Float identity
    notes: every constant is written as the same double literal/compute
    the Spark side uses (1.2 + 1.0 COMPUTED, 0.25 written directly since
    1.0 - 0.75 is exact); ln/sum-order ulp noise is absorbed by round(6)
    before the rank, per the house convention."""
    return f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKLIST} AS t FROM documents),
    stats AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(len(t)) AS avgdl
        FROM toks
    ),
    posts AS (
        SELECT doc_id, len(t) AS dl, u.term
        FROM toks, UNNEST(t) AS u(term)
        WHERE u.term IN ('hash', 'join', 'shuffle', 'window')
    ),
    tf AS (
        SELECT doc_id, dl, term, CAST(COUNT(*) AS DOUBLE) AS tf
        FROM posts GROUP BY doc_id, dl, term
    ),
    idf AS (
        SELECT term,
               ln(1.0 + ((SELECT n FROM stats) - df + 0.5) / (df + 0.5))
                   AS idf
        FROM (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df
              FROM tf GROUP BY term)
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_hits,
           round(SUM(i.idf * t.tf * (1.2 + 1.0)
                     / (t.tf + 1.2 * (0.25 + 0.75 * CAST(t.dl AS DOUBLE)
                                             / (SELECT avgdl FROM stats)))),
                 6) AS score
    FROM tf t JOIN idf i USING (term)
    GROUP BY t.doc_id
    ORDER BY score DESC, t.doc_id ASC
    LIMIT 15"""


def _doc_lm_perplexity_oracle() -> str:
    """Oracle for the (unregistered until r14) perplexity query: same
    count tables and the same add-k formula over the shared token-list
    mirror; DuckDB range(1, len) is end-exclusive and lists index
    1-based, giving exactly the adjacent-pair set. exp/ln/avg-order ulp
    noise absorbed by round(4)."""
    return f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKLIST} AS t FROM documents),
    uni AS (
        SELECT u.w AS w1, COUNT(*) AS c1
        FROM toks, UNNEST(t) AS u(w) GROUP BY u.w
    ),
    v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS vs FROM uni),
    bg AS (
        SELECT doc_id, t[CAST(r.i AS INT)] AS w1,
               t[CAST(r.i AS INT) + 1] AS w2
        FROM toks, UNNEST(range(1, len(t))) AS r(i)
    ),
    bic AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
    scored AS (
        SELECT g.doc_id,
               ln((CAST(COALESCE(b.c2, 0) AS DOUBLE) + 0.5)
                  / (CAST(COALESCE(u.c1, 0) AS DOUBLE)
                     + 0.5 * (SELECT vs FROM v))) AS lp
        FROM bg g
        LEFT JOIN bic b ON b.w1 = g.w1 AND b.w2 = g.w2
        LEFT JOIN uni u ON u.w1 = g.w1
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           round(exp(-AVG(lp)), 4) AS ppl_r
    FROM scored GROUP BY doc_id"""


def _doc_dsir_select_oracle() -> str:
    """Oracle for the (unregistered until r14) DSIR query: the full
    pipeline restated — shared token-list mirror, uni+bigram stream,
    house md5-int60 bucketing mod 1024, add-0.5 smoothed log-ratio table
    over a complete bucket spine, per-doc weight, md5-Gumbel key. Float
    notes: 512.0 (= add_k * B) and 2^60 are exact doubles; ln/sum-order
    ulp noise absorbed by round(6) before the rank."""
    return f"""
    WITH toks AS (SELECT doc_id, lang, {_DUCK_TOKLIST} AS t FROM documents),
    grams AS (
        SELECT doc_id, lang, u.g FROM toks, UNNEST(t) AS u(g)
        UNION ALL
        SELECT doc_id, lang,
               t[CAST(r.i AS INT)] || ' ' || t[CAST(r.i AS INT) + 1] AS g
        FROM toks, UNNEST(range(1, len(t))) AS r(i)
    ),
    b AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(g), 1, 15))::UBIGINT::BIGINT % 1024
                   AS bucket
        FROM grams
    ),
    t_tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS tt FROM b WHERE lang = 'en'),
    r_tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS rt FROM b),
    tcnt AS (SELECT bucket, COUNT(*) AS t_b FROM b WHERE lang = 'en'
             GROUP BY bucket),
    rcnt AS (SELECT bucket, COUNT(*) AS r_b FROM b GROUP BY bucket),
    spine AS (SELECT CAST(r.i AS BIGINT) AS bucket FROM range(0, 1024) r(i)),
    ratio AS (
        SELECT s.bucket,
               ln((CAST(COALESCE(t_b, 0) AS DOUBLE) + 0.5)
                  / ((SELECT tt FROM t_tot) + 512.0))
             - ln((CAST(COALESCE(r_b, 0) AS DOUBLE) + 0.5)
                  / ((SELECT rt FROM r_tot) + 512.0)) AS log_ratio
        FROM spine s
        LEFT JOIN tcnt ON tcnt.bucket = s.bucket
        LEFT JOIN rcnt ON rcnt.bucket = s.bucket
    ),
    feat AS (SELECT doc_id, bucket, COUNT(*) AS cnt FROM b
             GROUP BY doc_id, bucket),
    sc AS (
        SELECT f.doc_id,
               SUM(f.cnt) AS n_grams,
               SUM(CAST(f.cnt AS DOUBLE) * ratio.log_ratio) AS log_w
        FROM feat f JOIN ratio ON ratio.bucket = f.bucket
        GROUP BY f.doc_id
    )
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           round(log_w + -ln(-ln(
               ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                 ::UBIGINT::BIGINT)::DOUBLE + 1.0)
               / 1152921504606846976.0)), 6) AS key
    FROM sc
    ORDER BY key DESC, doc_id ASC
    LIMIT 25"""


def _doc_substring_dup_oracle(n: int = 20) -> str:
    """Oracle for the (unregistered until r15) substring-dup query: same
    positional rolling hash over the shared ordered token-id mirror
    (window slice is 1-based inclusive in DuckDB: t[i : i+n-1]), census
    via HAVING count(distinct doc), span merge as gaps-and-islands (a
    window starts a new island exactly when pos - lag(pos) > n — the
    same rule as the engine's fold, which merges on p <= last.e)."""
    from scabillmatch_spark.functions.text import HASH_PRIME, SHINGLE_B

    return f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKIDLIST} AS t FROM documents),
    w AS (
        SELECT doc_id, CAST(r.i - 1 AS BIGINT) AS pos,
               list_reduce(
                   list_transform(
                       t[CAST(r.i AS INT) : CAST(r.i AS INT) + {n - 1}],
                       x -> x % {HASH_PRIME}),
                   (acc, x) -> (acc * {SHINGLE_B} + x) % {HASH_PRIME}
               ) AS gram
        FROM toks, UNNEST(range(1, len(t) - {n - 2})) AS r(i)
    ),
    dup AS (
        SELECT gram FROM w GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hits AS (SELECT doc_id, pos FROM w WHERE gram IN (SELECT gram FROM dup)),
    lagged AS (
        SELECT doc_id, pos,
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM hits
    ),
    isl AS (
        SELECT doc_id, pos,
               SUM(CASE WHEN prev IS NULL OR pos - prev > {n}
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM lagged
    ),
    sp AS (
        SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + {n} AS e,
               COUNT(*) AS nw
        FROM isl GROUP BY doc_id, island
    )
    SELECT doc_id,
           CAST(SUM(nw) AS BIGINT) AS n_dup_windows,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(e - s) AS BIGINT) AS dup_tokens,
           string_agg(s || '-' || e, ';' ORDER BY s) AS spans
    FROM sp GROUP BY doc_id"""


def _doc_substring_rewrite_oracle(n: int = 20) -> str:
    """Oracle for the (unregistered until r16) substring-rewrite query:
    the dup oracle's span CTEs verbatim, then per-position coverage via
    NOT EXISTS against the merged spans and the same mod-1e9+7 token-id
    checksum. LEFT JOIN from toks keeps zero-token and untouched docs."""
    from scabillmatch_spark.functions.text import HASH_PRIME, SHINGLE_B

    return f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKIDLIST} AS t FROM documents),
    w AS (
        SELECT doc_id, CAST(r.i - 1 AS BIGINT) AS pos,
               list_reduce(
                   list_transform(
                       t[CAST(r.i AS INT) : CAST(r.i AS INT) + {n - 1}],
                       x -> x % {HASH_PRIME}),
                   (acc, x) -> (acc * {SHINGLE_B} + x) % {HASH_PRIME}
               ) AS gram
        FROM toks, UNNEST(range(1, len(t) - {n - 2})) AS r(i)
    ),
    dup AS (
        SELECT gram FROM w GROUP BY gram
        HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hits AS (SELECT doc_id, pos FROM w WHERE gram IN (SELECT gram FROM dup)),
    lagged AS (
        SELECT doc_id, pos,
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM hits
    ),
    isl AS (
        SELECT doc_id, pos,
               SUM(CASE WHEN prev IS NULL OR pos - prev > {n}
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM lagged
    ),
    sp AS (
        SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + {n} AS e
        FROM isl GROUP BY doc_id, island
    ),
    pos AS (
        SELECT doc_id, CAST(r.i - 1 AS BIGINT) AS p,
               t[CAST(r.i AS INT)] AS tid
        FROM toks, UNNEST(range(1, len(t) + 1)) AS r(i)
    ),
    kept AS (
        SELECT pos.doc_id, pos.tid FROM pos
        WHERE NOT EXISTS (
            SELECT 1 FROM sp
            WHERE sp.doc_id = pos.doc_id AND pos.p >= sp.s AND pos.p < sp.e
        )
    ),
    agg AS (
        SELECT doc_id, COUNT(*) AS kept_n,
               SUM(tid % 1000000007) AS cksum
        FROM kept GROUP BY doc_id
    )
    SELECT toks.doc_id,
           CAST(len(toks.t) AS BIGINT) AS n_tokens,
           CAST(len(toks.t) - COALESCE(agg.kept_n, 0) AS BIGINT)
               AS dropped_tokens,
           CAST(COALESCE(agg.kept_n, 0) AS BIGINT) AS kept_tokens,
           CAST(COALESCE(agg.cksum, 0) AS BIGINT) AS kept_checksum
    FROM toks LEFT JOIN agg USING (doc_id)"""


def _hyperplanes(num_planes: int = 8, dim: int = 64, salt: str = "") -> list[list[float]]:
    """Deterministic ±1 hyperplanes from md5 bits — literal constants shared
    by the Spark plan and the SQL oracle. ``salt`` yields an independent
    family (e.g. the BRP projection tables)."""
    import hashlib

    planes = []
    for j in range(num_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{salt}{j}:{i}".encode()).digest()[0]
            row.append(1.0 if h % 2 == 0 else -1.0)
        planes.append(row)
    return planes


# r14 density-scaled AND-composed BRP (replaces the fixed
# _BRP_BUCKET_LEN=0.25 OR-of-3 design whose candidate stage measured
# SUPERLINEAR in scale_check r13: with a fixed bucket length on dense
# i.i.d. data, bucket occupancy grows with n and candidates ~ n^2/#buckets).
# The fix makes #buckets grow with n: each of _BRP_TABLES tables keys on
# the AND of _BRP_AND projections, bucket length L = 2*s90/B with s90 the
# ceil(0.9n)-th smallest |projection| (an ORDER STATISTIC — an element of
# the bit-identical cross-engine dot multiset, no interpolation) and
# B = ceil(sqrt(n/_BRP_TAU)) cells per axis, so expected per-bucket
# occupancy stays ~_BRP_TAU and candidates ~ T*n*tau = LINEAR in n.
# Measured on sf0.1 flipped-copy corpora (DuckDB design sweep, r14):
# candidates 363k/596k/1.56M at 1x/2x/4x (old design: 396k/1.6M/6.3M)
# with 1x recall 0.264 vs the old 0.248 — recall parity at 1x, linear
# growth. Recall-vs-n decays on THIS synthetic because its truth is
# inherently quadratic (threshold 1.13 vs random-pair median 1.41); on
# real near-dup data (d << L) per-pair recall stays high.
_BRP_TABLES = 6


_BRP_AND = 2        # projections AND-composed per table key


_BRP_TAU = 80       # expected per-bucket occupancy target


_BRP_DIST_THRESHOLD = 1.13


def _emb_brp_oracle() -> str:
    planes = _hyperplanes(_BRP_TABLES * _BRP_AND, 64, salt="brp:")
    p0 = planes[0]
    items = ", ".join(
        "concat_ws('|', '{t}', {parts})".format(
            t=t,
            parts=", ".join(
                f"CAST(floor(list_dot_product(v, {planes[t * _BRP_AND + a]}) / L) AS VARCHAR)"
                for a in range(_BRP_AND)
            ),
        )
        for t in range(_BRP_TABLES)
    )
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
                   WHERE embedding IS NOT NULL),
        st AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
        dd AS (
            SELECT abs(list_dot_product(v, {p0})) AS d,
                   row_number() OVER (
                       ORDER BY abs(list_dot_product(v, {p0}))
                   ) AS rn
            FROM e
        ),
        lw AS (
            SELECT CASE WHEN s90 > 0.0
                        THEN 2.0 * s90 / CAST(greatest(
                                 1, CAST(ceil(sqrt(n / {float(_BRP_TAU)})) AS BIGINT)
                             ) AS DOUBLE)
                        ELSE 1.0 END AS L
            FROM (SELECT dd.d AS s90 FROM dd, st
                  WHERE dd.rn = (9 * st.n + 9) // 10), st
        ),
        b AS (SELECT vec_id, unnest([{items}]) AS bkt FROM e, lw),
        cand AS (
            SELECT a.vec_id AS pk1, b2.vec_id AS pk2
            FROM b a JOIN b b2 ON a.bkt = b2.bkt AND a.vec_id < b2.vec_id
            GROUP BY a.vec_id, b2.vec_id
        ),
        d AS (
            SELECT c.pk1, c.pk2,
                   sqrt(list_dot_product(
                       list_transform(list_zip(e1.v, e2.v), x -> (x[1] - x[2]) * (x[1] - x[2])),
                       list_transform(e1.v, x -> 1.0))) AS dist
            FROM cand c JOIN e e1 ON e1.vec_id = c.pk1 JOIN e e2 ON e2.vec_id = c.pk2
        )
        SELECT pk1, pk2, (ROUND(dist, 6) + 0.0) AS dist
        FROM d WHERE dist <= {_BRP_DIST_THRESHOLD}
    """


_ND_PLANES, _ND_BANDS = 32, 4      # 4 bands x 8 sign bits from a 32-plane signature


_ND_HAM_MAX = 8                    # Hamming prefilter: <= 8 of 32 bits differ


# variant ids must never collide with real vec_ids; 10^12 needs a trillion-
# row embeddings table to reach (vec_id is BIGINT — headroom to 9.2*10^18)
_ND_VARIANT_OFFSET = 1_000_000_000_000


_ND_COS_THRESHOLD = 0.98


def _emb_near_dup_oracle() -> str:
    planes = _hyperplanes(_ND_PLANES, 64, salt="nd:")
    # sign bits over FLOOR-SCALED INTEGER dots (exact in double up to 2^53,
    # order-independent) — mirrors the Spark kernel's int64 matmul exactly;
    # packed into one BIGINT signature like the Spark side
    sig_expr = " + ".join(
        "(CASE WHEN list_dot_product("
        f"list_transform(v, x -> floor(x * 1048576.0)), {plane}) > 0 "
        f"THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j, plane in enumerate(planes)
    )
    band_items = ", ".join(
        f"concat_ws('|', '{b}', CAST((sig >> {8 * b}) & 255 AS VARCHAR))"
        for b in range(_ND_BANDS)
    )
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        var AS (
            SELECT vec_id + {_ND_VARIANT_OFFSET} AS vec_id,
                   list_concat([0.0], v[2:64]) AS v
            FROM e
        ),
        allv AS (SELECT * FROM e UNION ALL SELECT * FROM var),
        sigs AS (SELECT vec_id, v, ({sig_expr}) AS sig FROM allv),
        banded AS (SELECT vec_id, unnest([{band_items}]) AS band FROM sigs),
        cand AS (
            SELECT a.vec_id AS id1, b.vec_id AS id2
            FROM banded a JOIN banded b ON a.band = b.band AND a.vec_id < b.vec_id
            GROUP BY a.vec_id, b.vec_id
        ),
        pre AS (
            SELECT c.id1, c.id2
            FROM cand c
            JOIN sigs sa ON sa.vec_id = c.id1
            JOIN sigs sb ON sb.vec_id = c.id2
            WHERE bit_count(xor(sa.sig, sb.sig)) <= {_ND_HAM_MAX}
        ),
        scored AS (
            SELECT p.id1, p.id2,
                   (ROUND(list_dot_product(x.v, y.v)
                         / (sqrt(list_dot_product(x.v, x.v))
                            * sqrt(list_dot_product(y.v, y.v))), 6) + 0.0) AS cos_sim
            FROM pre p
            JOIN allv x ON x.vec_id = p.id1
            JOIN allv y ON y.vec_id = p.id2
        )
        SELECT id1, id2, cos_sim FROM scored WHERE cos_sim >= {_ND_COS_THRESHOLD}
    """


def _emb_semantic_dedup_oracle() -> str:
    """Oracle for the (unregistered until r15) semantic-dedup query: the
    near-dup oracle verbatim as a nested CTE (its WITH is legal inside a
    derived table), undirected reach for components, integer rollups."""
    return f"""
    WITH RECURSIVE pairs AS ({_emb_near_dup_oracle()}),
    und(s, d) AS (
        SELECT id1, id2 FROM pairs UNION ALL SELECT id2, id1 FROM pairs
    ),
    verts AS (SELECT DISTINCT s AS id FROM und),
    reach(a, b) AS (
        SELECT id, id FROM verts
        UNION
        SELECT r.a, u.d FROM reach r JOIN und u ON u.s = r.b
    ),
    comp AS (SELECT a AS id, MIN(b) AS component FROM reach GROUP BY a)
    SELECT component,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_to_drop,
           CAST(SUM(id) AS BIGINT) AS id_sum,
           CAST(MAX(id) AS BIGINT) AS max_id
    FROM comp GROUP BY component"""


# Version labels for the synthetic latest-version metadata: the reference's
# 7-entry priority list (LatestVersionExtracter.scala:50-59) + one unknown
# label to exercise the rank-last fallback.
_LVF_VERSIONS = [
    "Enacted", "Enrolled", "Adopted", "Substituted", "Amended",
    "Reintroduced", "Introduced", "Draft",
]


def _stream_agg_maintain_oracle() -> str:
    """Oracle for the (unregistered) streaming-rollup query: the direct
    one-shot aggregate — micro-batched maintenance must be
    indistinguishable from it."""
    return """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type"""


def _orders_cohort_retention_oracle() -> str:
    """Oracle for the (unregistered until r18) cohort query: identical
    months-since-epoch integer periods, min-per-user cohort, same cell
    counts."""
    return """
    WITH p AS (
        SELECT o_custkey AS u,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                    AS BIGINT) AS p
        FROM orders
    ),
    f AS (SELECT u, MIN(p) AS cohort FROM p GROUP BY u)
    SELECT f.cohort,
           p.p - f.cohort AS periods_since,
           CAST(COUNT(DISTINCT p.u) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM p JOIN f USING (u)
    GROUP BY f.cohort, periods_since"""


def _part_basket_lift_oracle() -> str:
    """Oracle for the (unregistered until r18) basket-lift query: same
    distinct baskets, same p1 < p2 pair stream, same marginals, and the
    lift division written with the identical operand order
    (co·N then /(ct_a·ct_b))."""
    return """
    WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
    n AS (SELECT CAST(COUNT(DISTINCT bk) AS DOUBLE) AS nb FROM b),
    marg AS (SELECT it, CAST(COUNT(*) AS BIGINT) AS ct FROM b GROUP BY it),
    co AS (
        SELECT a.it AS item_a, c.it AS item_b,
               CAST(COUNT(*) AS BIGINT) AS co_count
        FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it
        GROUP BY a.it, c.it
        HAVING COUNT(*) >= 2
    )
    SELECT co.item_a, co.item_b, co.co_count,
           ma.ct AS ct_a, mb.ct AS ct_b,
           round(CAST(co.co_count AS DOUBLE) * n.nb
                 / (CAST(ma.ct AS DOUBLE) * CAST(mb.ct AS DOUBLE)), 6) AS lift
    FROM co
    JOIN marg ma ON ma.it = co.item_a
    JOIN marg mb ON mb.it = co.item_b
    CROSS JOIN n"""


def _doc_minhash_audit_oracle() -> str:
    """Oracle for the (unregistered until r20) MinHash audit: the
    registered banding's signature/band SQL mirrors verbatim, pairwise
    position agreement via list_transform over range, and the identical
    round-then-diff cadence."""
    nh = SHINGLE_LSH_HASHES
    sig = _minhash_sig_sql("toks", nh)
    bands = _band_sql("sig", nh, SHINGLE_LSH_BANDS)
    return f"""
    WITH raw AS (SELECT doc_id, {_DUCK_TOKIDLIST} AS t FROM documents),
    toks AS (
        SELECT doc_id, {_duck_gram_ids('t', 3)} AS toks FROM raw
        WHERE len({_duck_gram_ids('t', 3)}) > 0
    ),
    sigs AS (SELECT doc_id, toks, {sig} AS sig FROM toks),
    bands AS (SELECT doc_id, unnest({bands}) AS band FROM sigs),
    cand AS (
        SELECT a.doc_id AS pk1, b.doc_id AS pk2
        FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    j AS (
        SELECT c.pk1, c.pk2,
               CAST(len(list_filter(
                   list_transform(range(1, {nh + 1}),
                                  i -> s1.sig[i] = s2.sig[i]),
                   x -> x)) AS BIGINT) AS n_agree,
               CAST(len(list_intersect(s1.toks, s2.toks)) AS DOUBLE) AS inter,
               CAST(len(s1.toks) + len(s2.toks)
                    - len(list_intersect(s1.toks, s2.toks)) AS DOUBLE) AS uni
        FROM cand c
        JOIN sigs s1 ON s1.doc_id = c.pk1
        JOIN sigs s2 ON s2.doc_id = c.pk2
    ),
    r AS (
        SELECT pk1, pk2, n_agree,
               round(CAST(n_agree AS DOUBLE) / {float(nh)}, 6) AS est_jaccard,
               round(inter / uni, 6) AS exact_jaccard
        FROM j
    )
    SELECT pk1, pk2, n_agree, est_jaccard, exact_jaccard,
           round(abs(est_jaccard - exact_jaccard), 6) AS abs_err
    FROM r"""


def _nation_revenue_gini_oracle() -> str:
    """Oracle for the (unregistered until r20) Gini query: identical
    rank tiebreak and the identical closed-form expression."""
    return """
    WITH rev AS (
        SELECT o_custkey, round(SUM(o_totalprice), 6) AS x
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT n.n_name,
               CAST(row_number() OVER (
                   PARTITION BY n.n_name ORDER BY rev.x ASC, rev.o_custkey ASC
               ) AS DOUBLE) AS i,
               rev.x
        FROM rev
        JOIN customer c ON c.c_custkey = rev.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    )
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n,
           round(2.0 * SUM(i * x) / (CAST(COUNT(*) AS DOUBLE) * SUM(x))
                 - (CAST(COUNT(*) AS DOUBLE) + 1.0)
                   / CAST(COUNT(*) AS DOUBLE), 6) AS gini
    FROM ranked GROUP BY n_name"""


def _doc_winnow_fingerprints_oracle(n: int = 4, w: int = 6) -> str:
    """Oracle for the (unregistered) winnowing query: same positional
    rolling hash over the shared ordered token-id mirror (the
    substring_dup census CTE verbatim), selection via a window min over
    the struct {'g': gram, 'np': -pos} (field-order lexicographic — min
    hash, then rightmost position, exactly the engine's
    array_min(struct(g, -p))), DISTINCT (hash, position) per doc,
    shared census via HAVING count >= 2 over per-doc-distinct hashes.
    Integer-exact output; the checksum SUM is HUGEINT -> CAST AS BIGINT
    per the house convention."""
    from scabillmatch_spark.functions.text import HASH_PRIME, SHINGLE_B

    return f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKIDLIST} AS t FROM documents),
    w AS (
        SELECT doc_id, CAST(r.i - 1 AS BIGINT) AS pos,
               list_reduce(
                   list_transform(
                       t[CAST(r.i AS INT) : CAST(r.i AS INT) + {n - 1}],
                       x -> x % {HASH_PRIME}),
                   (acc, x) -> (acc * {SHINGLE_B} + x) % {HASH_PRIME}
               ) AS gram
        FROM toks, UNNEST(range(1, len(t) - {n - 2})) AS r(i)
    ),
    g AS (SELECT doc_id, COUNT(*) AS ng FROM w GROUP BY doc_id),
    sel AS (
        SELECT w.doc_id,
               min({{'g': gram, 'np': -pos}}) OVER (
                   PARTITION BY w.doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS m,
               pos, g.ng
        FROM w JOIN g USING (doc_id)
    ),
    fps AS (
        SELECT DISTINCT doc_id, ng, m.g AS fg, -m.np AS fp
        FROM sel WHERE pos <= ng - {w}
    ),
    census AS (
        SELECT fg FROM (SELECT DISTINCT doc_id, fg FROM fps)
        GROUP BY fg HAVING COUNT(*) >= 2
    )
    SELECT f.doc_id,
           CAST(f.ng AS BIGINT) AS n_grams,
           CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
           CAST(COUNT(*) FILTER (f.fg IN (SELECT fg FROM census))
                AS BIGINT) AS n_shared_fp,
           CAST(SUM(f.fg % 1000000007) AS BIGINT) AS fp_checksum
    FROM fps f GROUP BY f.doc_id, f.ng"""


def _events_session_pmi_oracle() -> str:
    """Oracle for the (unregistered) session-PMI query: the registered
    sessionization CTE verbatim, then set-distinct types per session,
    a < b self-join, marginal attach, and the identical
    multiply-then-divide ln argument. ROUND +0.0-folded (PMI of a
    near-independent pair can round to -0.0)."""
    return """
    WITH ev AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
    ),
    flagged AS (
        SELECT user_id, event_id, event_type, us,
               CASE WHEN us - LAG(us) OVER w IS NULL
                      OR us - LAG(us) OVER w > 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
    ),
    sess AS (
        SELECT user_id, event_type,
               CAST(SUM(new_sess) OVER (PARTITION BY user_id
                    ORDER BY us ASC, event_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS session_id
        FROM flagged
    ),
    st AS (SELECT DISTINCT user_id, session_id, event_type FROM sess),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions
          FROM (SELECT DISTINCT user_id, session_id FROM st)),
    marg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c
             FROM st GROUP BY event_type),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM st a JOIN st b
          ON a.user_id = b.user_id AND a.session_id = b.session_id
         AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_ab, ma.c AS n_a, mb.c AS n_b,
           (SELECT n_sessions FROM n) AS n_sessions,
           (ROUND(ln(CAST(p.n_ab AS DOUBLE) * (SELECT n_sessions FROM n)
                     / (CAST(ma.c AS DOUBLE) * CAST(mb.c AS DOUBLE))), 6)
            + 0.0) AS pmi
    FROM pairs p
    JOIN marg ma ON ma.event_type = p.type_a
    JOIN marg mb ON mb.event_type = p.type_b"""


def _doc_lang_divergence_oracle() -> str:
    """Oracle for the (unregistered) JS-divergence query: identical
    intersection-plus-marginals identity, term expression mirrored
    token-for-token (pa ln(2pa/(pa+pb)) + pb ln(2pb/(pa+pb)); the
    one-sided remainder via (ln(2.0)/2)(2 - Σpa - Σpb)). ROUND
    +0.0-folded (js of near-identical distributions can round to
    -0.0)."""
    return f"""
    WITH cnt AS (
        SELECT s, t, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT lang AS s, {_DUCK_TOKLIST} AS toks FROM documents),
             UNNEST(toks) AS u(t)
        GROUP BY s, t
    ),
    tot AS (
        SELECT s, CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v
        FROM cnt GROUP BY s
    ),
    e AS (SELECT cnt.s, cnt.t, cnt.c, tot.n, tot.v
          FROM cnt JOIN tot USING (s)),
    j AS (
        SELECT a.s AS lang_a, b.s AS lang_b,
               CAST(a.c AS DOUBLE) / CAST(a.n AS DOUBLE) AS pa,
               CAST(b.c AS DOUBLE) / CAST(b.n AS DOUBLE) AS pb,
               a.n AS na, b.n AS nb, a.v AS va, b.v AS vb
        FROM e a JOIN e b ON a.t = b.t AND a.s < b.s
    )
    SELECT lang_a, lang_b,
           MAX(na) AS n_tokens_a, MAX(nb) AS n_tokens_b,
           MAX(va) AS vocab_a, MAX(vb) AS vocab_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_vocab,
           (ROUND(0.5 * SUM(pa * ln(2.0 * pa / (pa + pb))
                            + pb * ln(2.0 * pb / (pa + pb)))
                  + 0.5 * ln(2.0) * (2.0 - SUM(pa) - SUM(pb)), 6)
            + 0.0) AS js
    FROM j GROUP BY lang_a, lang_b"""


def _events_markov_transitions_oracle() -> str:
    """Oracle for the (unregistered) Markov-transition query: the
    registered sessionization CTE verbatim, lead() within (user,
    session), bounded count agg + marginal attach. p is provably
    nonnegative, but the ROUND is +0.0-folded anyway for uniformity."""
    return """
    WITH ev AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
    ),
    flagged AS (
        SELECT user_id, event_id, event_type, us,
               CASE WHEN us - LAG(us) OVER w IS NULL
                      OR us - LAG(us) OVER w > 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
    ),
    sess AS (
        SELECT user_id, event_id, event_type, us,
               CAST(SUM(new_sess) OVER (PARTITION BY user_id
                    ORDER BY us ASC, event_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS session_id
        FROM flagged
    ),
    led AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (
                   PARTITION BY user_id, session_id
                   ORDER BY us ASC, event_id ASC) AS to_type
        FROM sess
    ),
    pairs AS (
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM led WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    ),
    marg AS (
        SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
        FROM pairs GROUP BY from_type
    )
    SELECT p.from_type, p.to_type, p.n, m.n_from,
           (ROUND(CAST(p.n AS DOUBLE) / CAST(m.n_from AS DOUBLE), 6)
            + 0.0) AS p
    FROM pairs p JOIN marg m USING (from_type)"""


def _orders_incremental_agg_oracle() -> str:
    """Oracle for the (unregistered) incremental-agg query: the DIRECT
    single-pass aggregation — incremental maintenance must be
    indistinguishable from recompute. DECIMAL sum per the house
    convention (HUGEINT/decimal exactness on both engines), CAST AS
    DOUBLE at the end."""
    return """
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
               AS total_spend
    FROM orders GROUP BY o_custkey"""


def _events_trailing_window_oracle() -> str:
    """Oracle for the (unregistered) trailing-window query: the same
    RANGE frame over epoch micros. DuckDB's RANGE n PRECEDING matches
    Spark's rangeBetween(-n, 0) including the equal-order-value peer
    rule; the DECIMAL sum keeps the cells exact on both engines."""
    return """
    SELECT user_id, event_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
               AS sum_1h
    FROM (SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY us ASC
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"""


def _doc_ngram_novelty_oracle() -> str:
    """Oracle for the (unregistered) novelty query: same positional
    rolling hash over the shared token-id mirror, min(doc_id) ownership,
    per-doc ratio. novelty is provably in [0,1]; ROUND left unfolded
    like the other provably-nonnegative sites."""
    from scabillmatch_spark.functions.text import HASH_PRIME, SHINGLE_B

    return f"""
    WITH toks AS (SELECT doc_id, {_DUCK_TOKIDLIST} AS t FROM documents),
    w AS (
        SELECT doc_id, CAST(r.i - 1 AS BIGINT) AS pos,
               list_reduce(
                   list_transform(
                       t[CAST(r.i AS INT) : CAST(r.i AS INT) + 3],
                       x -> x % {HASH_PRIME}),
                   (acc, x) -> (acc * {SHINGLE_B} + x) % {HASH_PRIME}
               ) AS gram
        FROM toks, UNNEST(range(1, len(t) - 2)) AS r(i)
    ),
    owner AS (SELECT gram, MIN(doc_id) AS first_doc FROM w GROUP BY gram)
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN o.first_doc = w.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           ROUND(CAST(SUM(CASE WHEN o.first_doc = w.doc_id
                              THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
    FROM w JOIN owner o USING (gram)
    GROUP BY w.doc_id"""


def _part_pareto_oracle() -> str:
    """Oracle for the (unregistered) Pareto query: identical rank order,
    decimal cumulative sum, identical class boundaries and division
    order. The scalar total is recomputed as the same decimal sum cast
    to double (the engine's driver scalar does the same conversion)."""
    return """
    WITH rev AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(38,6))
                   * (CAST(1 AS DECIMAL(38,6))
                      - CAST(l_discount AS DECIMAL(38,6)))) AS r
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT CAST(SUM(r) AS DOUBLE) AS t FROM rev),
    ranked AS (
        SELECT r,
               CAST(SUM(r) OVER (ORDER BY r DESC, l_partkey ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) / (SELECT t FROM tot) AS share
        FROM rev
    )
    SELECT CASE WHEN share <= 0.80 THEN 'A'
                WHEN share <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(r) AS DOUBLE) / (SELECT t FROM tot), 6)
               AS revenue_share
    FROM ranked GROUP BY 1"""


def _events_user_entropy_oracle() -> str:
    """Oracle for the (unregistered until r19) entropy query: identical
    window rank, identical p·ln p sum with the same -0.0 fold; window
    SUM(ct) is HUGEINT in DuckDB — cast before use (the r10 lesson)."""
    return """
    WITH ct AS (
        SELECT user_id AS u, event_type AS t,
               CAST(COUNT(*) AS BIGINT) AS ct
        FROM events GROUP BY user_id, event_type
    ),
    e AS (
        SELECT u, t, ct,
               SUM(ct) OVER (PARTITION BY u) AS n,
               row_number() OVER (
                   PARTITION BY u ORDER BY ct DESC, t ASC
               ) AS rn
        FROM ct
    )
    SELECT u AS user_id,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           round(-SUM((CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
                      * ln(CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)))
                 + 0.0, 6) AS entropy,
           MAX(CASE WHEN rn = 1 THEN t END) AS top_type,
           round(MAX(CASE WHEN rn = 1
                          THEN CAST(ct AS DOUBLE) / CAST(n AS DOUBLE) END),
                 6) AS top_share
    FROM e GROUP BY u"""


def _customer_rfm_oracle() -> str:
    """Oracle for the (unregistered until r19) RFM query: identical
    per-user rollup, date_diff('day') == Spark datediff on the
    midnight-instant order dates, identical ntile order keys."""
    return """
    WITH per AS (
        SELECT o_custkey, MAX(o_orderdate) AS last,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               round(SUM(o_totalprice), 6) AS monetary
        FROM orders GROUP BY o_custkey
    ),
    ref AS (SELECT MAX(o_orderdate) AS r FROM orders),
    per2 AS (
        SELECT o_custkey,
               CAST(date_diff('day', last, ref.r) AS BIGINT) AS recency_days,
               frequency, monetary
        FROM per CROSS JOIN ref
    ),
    sc AS (
        SELECT o_custkey, recency_days, frequency, monetary,
               CAST(ntile(4) OVER (
                   ORDER BY recency_days ASC, o_custkey ASC
               ) AS BIGINT) AS r_score,
               CAST(ntile(4) OVER (
                   ORDER BY frequency DESC, o_custkey ASC
               ) AS BIGINT) AS f_score,
               CAST(ntile(4) OVER (
                   ORDER BY monetary DESC, o_custkey ASC
               ) AS BIGINT) AS m_score
        FROM per2
    )
    SELECT o_custkey, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           r_score * 100 + f_score * 10 + m_score AS rfm
    FROM sc"""


def _events_mad_outliers_oracle() -> str:
    """Oracle for the (unregistered until r17) MAD query: quantile_cont
    medians with the identical round-to-6-before-compare cadence; the
    per-key constants ride the GROUP BY instead of first()."""
    return """
    WITH v AS (SELECT event_type, CAST(value AS DOUBLE) AS v FROM events),
    med AS (
        SELECT event_type, round(quantile_cont(v, 0.5), 6) AS med
        FROM v GROUP BY event_type
    ),
    dev AS (
        SELECT v.event_type, med, round(abs(v - med), 6) AS dev
        FROM v JOIN med USING (event_type)
    ),
    mad AS (
        SELECT event_type, round(quantile_cont(dev, 0.5), 6) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT dev.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           med AS median,
           mad.mad AS mad,
           round(3.0 * mad.mad, 6) AS cutoff,
           CAST(SUM(CASE WHEN dev > round(3.0 * mad.mad, 6)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           MAX(dev) AS max_dev
    FROM dev JOIN mad USING (event_type)
    GROUP BY dev.event_type, med, mad.mad"""


def _doc_zipf_fit_oracle() -> str:
    """Oracle for the (unregistered until r17) Zipf query: identical
    rank definition, identical closed-form OLS over the token mirror."""
    return f"""
    WITH tok AS (
        SELECT source, unnest({_DUCK_TOKLIST}) AS term FROM documents
    ),
    f AS (
        SELECT source, term, CAST(COUNT(*) AS BIGINT) AS freq
        FROM tok GROUP BY source, term
    ),
    xy AS (
        SELECT source, freq,
               ln(CAST(row_number() OVER (
                   PARTITION BY source ORDER BY freq DESC, term ASC
               ) AS DOUBLE)) AS x,
               ln(CAST(freq AS DOUBLE)) AS y
        FROM f
    ),
    s AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS vocab_size,
               CAST(SUM(freq) AS BIGINT) AS total_tokens,
               CAST(COUNT(*) AS DOUBLE) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
        FROM xy GROUP BY source
    )
    SELECT source, vocab_size, total_tokens,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
               AS intercept,
           round((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM s"""


# DuckDB-side tokenizer mirroring scabillmatch_spark.functions.text.token_set.
_DUCK_TOKSET = (
    "list_sort(list_distinct(list_filter("
    "string_split(regexp_replace(lower(text), '[0-9,:;?!.]', '', 'g'), ' '),"
    " x -> x <> '')))"
)


# ... and the integer-id variant mirroring text.token_id_set (60-bit md5 ids).
_DUCK_TOKIDSET = (
    "list_sort(list_distinct(list_transform(list_filter("
    "string_split(regexp_replace(lower(text), '[0-9,:;?!.]', '', 'g'), ' '),"
    " x -> x <> ''),"
    " t -> CAST(('0x' || substr(md5(t), 1, 15)) AS UBIGINT)::BIGINT)))"
)


def _duck_gram_ids(tok_ids_expr: str, n: int) -> str:
    """DuckDB expression: sorted distinct n-gram rolling-hash ids over an
    ordered BIGINT token-id list — the single mirror of
    functions/text.ngram_ids_from_token_ids (acc*B + x mod P, P-reduced
    window), shared by every oracle that shingles."""
    from scabillmatch_spark.functions.text import HASH_PRIME, SHINGLE_B

    return (
        f"list_sort(list_distinct(list_transform("
        f"range(1, len({tok_ids_expr}) - {n - 2}), "
        f"i -> list_reduce("
        f"list_transform({tok_ids_expr}[i:i+{n - 1}], x -> x % {HASH_PRIME}), "
        f"(acc, x) -> (acc * {SHINGLE_B} + x) % {HASH_PRIME}))))"
    )


def _minhash_sig_sql(ids_expr: str, num_hashes: int = 16) -> str:
    """DuckDB expression: array of minhash values over a BIGINT-id list,
    using the same LCG constants as functions.text.MINHASH_AB."""
    from scabillmatch_spark.functions.text import HASH_PRIME, MINHASH_AB

    exprs = []
    for i in range(num_hashes):
        a, b = MINHASH_AB[i]
        exprs.append(
            f"coalesce(list_min(list_transform({ids_expr}, "
            f"x -> ((x % {HASH_PRIME} + 1) * {a} + {b}) % {HASH_PRIME})), {HASH_PRIME})"
        )
    return "[" + ", ".join(exprs) + "]"


# DuckDB token list (non-distinct, order-preserving) — mirrors text.tokens().
_DUCK_TOKLIST = (
    "list_filter(string_split(regexp_replace(lower(text), '[0-9,:;?!.]', '', 'g'),"
    " ' '), x -> x <> '')"
)


# Ordered (non-distinct) 60-bit token-id list — mirrors text.ordered_token_ids.
_DUCK_TOKIDLIST = (
    f"list_transform({_DUCK_TOKLIST},"
    " t -> CAST(('0x' || substr(md5(t), 1, 15)) AS UBIGINT)::BIGINT)"
)


_EN_SW = "['the','and','of','to','in','is','that','for']"


_LANG_SW_SQL = {
    "de": "['der','die','und','das','ein','mit','von','ist']",
    "en": _EN_SW,
    "es": "['el','la','de','que','los','en','por','una']",
    "fr": "['le','la','les','des','une','dans','pour','est']",
}


def _band_sql(sig_expr: str, num_hashes: int, num_bands: int) -> str:
    """DuckDB list expression of LSH band keys — mirrors text.minhash_bands
    ('bandIdx|h1|h2|...' strings)."""
    rows = num_hashes // num_bands
    items = []
    for b in range(num_bands):
        parts = [f"'{b}'"] + [f"{sig_expr}[{b * rows + r + 1}]" for r in range(rows)]
        items.append(f"concat_ws('|', {', '.join(parts)})")
    return "[" + ", ".join(items) + "]"


def _banded_pairs_cte(
    tokset: str, num_hashes: int = DOC_LSH_HASHES, num_bands: int = DOC_LSH_BANDS
) -> str:
    """Shared DuckDB CTE chain mirroring _banded_doc_pairs: token-id sets ->
    LCG MinHash signature -> band explode -> band self-join -> residual
    predicates -> exact-Jaccard 'scored(d1, d2, inter, uni)'."""
    from scabillmatch_spark.functions.text import MINHASH_AB  # noqa: F401 (doc pointer)

    sig = _minhash_sig_sql("toks", num_hashes)
    bands = _band_sql("sig", num_hashes, num_bands)
    return f"""
    toks AS (SELECT doc_id, lang, source, n_chars, {tokset} AS toks FROM documents),
    sigs AS (SELECT doc_id, {sig} AS sig FROM toks),
    bands AS (SELECT doc_id, unnest({bands}) AS band FROM sigs),
    cand AS (
        SELECT a.doc_id AS pk1, b.doc_id AS pk2
        FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    scored AS (
        SELECT c.pk1 AS d1, c.pk2 AS d2,
               len(list_intersect(t1.toks, t2.toks)) AS inter,
               len(t1.toks) + len(t2.toks) - len(list_intersect(t1.toks, t2.toks)) AS uni
        FROM cand c
        JOIN toks t1 ON t1.doc_id = c.pk1
        JOIN toks t2 ON t2.doc_id = c.pk2
        WHERE t1.lang = t2.lang AND t1.source <> t2.source
          AND abs(t1.n_chars - t2.n_chars) / sqrt(t1.n_chars * t2.n_chars) < 0.26
    )"""


# Shared DuckDB CTE prefix: the similarity-graph edge list (exact Jaccard >=
# 95 over LSH-banded candidates — identical banding to the Spark plan).
_DUCK_EDGE_CTE = (
    "{banded},"
    """
    ed AS (SELECT d1, d2 FROM scored WHERE 100.0 * inter / uni >= 95.0),
    und AS (SELECT d1 AS s, d2 AS d FROM ed UNION ALL SELECT d2, d1 FROM ed),
    verts AS (SELECT DISTINCT s AS id FROM und)
"""
)


def _pagerank_oracle(iters: int = 3) -> str:
    cte = _DUCK_EDGE_CTE.format(banded=_banded_pairs_cte(_DUCK_TOKIDSET))
    sql = f"""
    WITH {cte},
    nn AS (SELECT COUNT(*) AS n FROM verts),
    deg AS (SELECT s, COUNT(*) AS outdeg FROM und GROUP BY s),
    r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM verts)"""
    prev = "r0"
    for i in range(1, iters + 1):
        sql += f""",
    r{i} AS (
        SELECT v.id,
               0.15 / (SELECT n FROM nn)
               + 0.85 * COALESCE(c.insum, 0.0) AS rank
        FROM verts v LEFT JOIN (
            SELECT u.d AS id, SUM(r.rank / dg.outdeg) AS insum
            FROM und u JOIN {prev} r ON u.s = r.id JOIN deg dg ON dg.s = u.s
            GROUP BY u.d
        ) c ON v.id = c.id
    )"""
        prev = f"r{i}"
    sql += f"""
    SELECT id, (ROUND(rank, 6) + 0.0) AS pagerank FROM {prev}"""
    return sql


def _pregel_walks_oracle() -> str:
    """Degree + 2-walk counts over the similarity graph (und(s,d) both
    directions, verts(id)): w1 = sum of 1 over in-neighbors = degree;
    w2(v) = sum of w1 over in-neighbors = #2-walks ending at v. Integer
    arithmetic only; every aggregate CAST AS BIGINT per the house
    convention (test_oracle_types.py)."""
    cte = _DUCK_EDGE_CTE.format(banded=_banded_pairs_cte(_DUCK_TOKIDSET))
    return f"""
    WITH {cte},
    deg AS (SELECT s AS id, CAST(COUNT(*) AS BIGINT) AS deg
            FROM und GROUP BY s),
    w2 AS (SELECT u.d AS id, CAST(SUM(dg.deg) AS BIGINT) AS w
           FROM und u JOIN deg dg ON u.s = dg.id GROUP BY u.d)
    SELECT v.id, dg.deg,
           CAST(COALESCE(w2.w, 0) AS BIGINT) AS n_walks2
    FROM verts v
    JOIN deg dg ON dg.id = v.id
    LEFT JOIN w2 ON w2.id = v.id"""


def _weighted_pagerank_oracle(iters: int = 3) -> str:
    """Similarity-weighted PageRank mirror: same banded/scored CTE as the
    unweighted oracle, edges carry w = 100.0*inter/uni, mass splits
    proportionally to w/wout. Float SUM order differs between engines by
    design; (ROUND(,6) + 0.0) absorbs it exactly as in _pagerank_oracle (green
    since r6 at two sfs)."""
    banded = _banded_pairs_cte(_DUCK_TOKIDSET)
    sql = f"""
    WITH {banded},
    edw AS (SELECT d1, d2, 100.0 * inter / uni AS w FROM scored
            WHERE 100.0 * inter / uni >= 95.0),
    undw AS (SELECT d1 AS s, d2 AS d, w FROM edw
             UNION ALL SELECT d2, d1, w FROM edw),
    verts AS (SELECT DISTINCT s AS id FROM undw),
    nn AS (SELECT COUNT(*) AS n FROM verts),
    wdeg AS (SELECT s, SUM(w) AS wout FROM undw GROUP BY s),
    r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM verts)"""
    prev = "r0"
    for i in range(1, iters + 1):
        sql += f""",
    r{i} AS (
        SELECT v.id,
               0.15 / (SELECT n FROM nn)
               + 0.85 * COALESCE(c.insum, 0.0) AS rank
        FROM verts v LEFT JOIN (
            SELECT u.d AS id, SUM(r.rank * u.w / dg.wout) AS insum
            FROM undw u JOIN {prev} r ON u.s = r.id JOIN wdeg dg ON dg.s = u.s
            GROUP BY u.d
        ) c ON v.id = c.id
    )"""
        prev = f"r{i}"
    sql += f"""
    SELECT id, (ROUND(rank, 6) + 0.0) AS wpagerank FROM {prev}"""
    return sql


def _lpa_rounds_cte(iters: int) -> tuple[str, str]:
    """The k unrolled synchronous-LPA CTE rounds over the shared edge CTE
    (und(s,d) both directions, verts(id)) -> (cte_chunk, final_name).
    Round i: count each vertex's in-neighbor labels, take the mode with
    the operator's deterministic tie-break (cnt DESC, label ASC),
    isolated vertices keep their previous label via COALESCE. Shared by
    the LPA oracle and the (r12-candidate) cluster-audit oracle."""
    sql = """
    l0 AS (SELECT id, id AS label FROM verts)"""
    prev = "l0"
    for i in range(1, iters + 1):
        sql += f""",
    c{i} AS (SELECT u.d AS id, p.label, COUNT(*) AS cnt
             FROM und u JOIN {prev} p ON u.s = p.id
             GROUP BY u.d, p.label),
    l{i} AS (
        SELECT v.id,
               COALESCE(
                 (SELECT c.label FROM c{i} c WHERE c.id = v.id
                  ORDER BY c.cnt DESC, c.label ASC LIMIT 1),
                 p.label) AS label
        FROM verts v JOIN {prev} p ON p.id = v.id
    )"""
        prev = f"l{i}"
    return sql, prev


def _label_propagation_oracle(iters: int = 4) -> str:
    """Synchronous LPA mirror: k rounds unrolled as CTEs (_lpa_rounds_cte).
    Labels are doc_ids (BIGINT on both engines) — no aggregate reaches
    the output, so no CAST convention applies. Single source of truth:
    the pre-validation test
    (test_label_propagation_matches_unrolled_sql_oracle) runs THIS string."""
    cte = _DUCK_EDGE_CTE.format(banded=_banded_pairs_cte(_DUCK_TOKIDSET))
    rounds, final = _lpa_rounds_cte(iters)
    return f"""
    WITH {cte},{rounds}
    SELECT id, label FROM {final}"""


def _emb_lsh_ann_oracle() -> str:
    planes = _hyperplanes()
    terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, {plane}) > 0 THEN {2**j} ELSE 0 END)"
        for j, plane in enumerate(planes)
    )
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        b AS (SELECT vec_id, v, ({terms}) AS bucket FROM e),
        q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qb FROM b WHERE vec_id < 10),
        cand AS (
            SELECT q.query_id, b.vec_id AS neighbor_id,
                   (ROUND(list_dot_product(q.qv, b.v)
                         / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(b.v, b.v))),
                         6) + 0.0) AS cos_sim
            FROM b JOIN q ON b.bucket = q.qb AND b.vec_id <> q.query_id
        )
        SELECT query_id, neighbor_id, cos_sim, rk FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
            FROM cand
        ) WHERE rk <= 3
    """


def _kcore_oracle(k: int = 3, rounds: int = 10) -> str:
    """Unrolled k-core peeling over the shared edge CTE (und = undirected
    (s,d) edges): each round keeps edges whose BOTH endpoints currently
    have degree >= k. Mirrors graph.k_core's early-stopped loop exactly as
    long as the fixpoint lands within ``rounds`` (it does at sf0.01; a
    too-shallow unroll would hash-fail loudly, not silently pass)."""
    cte = _DUCK_EDGE_CTE.format(banded=_banded_pairs_cte(_DUCK_TOKIDSET))
    # AS MATERIALIZED: each round references its predecessor three times —
    # inlined CTEs would re-expand the whole banded chain per reference
    # (exponential scan count; DuckDB runs out of file handles)
    sql = f"""
    WITH {cte},
    c0 AS MATERIALIZED (SELECT s, d FROM und)"""
    prev = "c0"
    for i in range(1, rounds + 1):
        sql += f""",
    k{i} AS MATERIALIZED (SELECT s FROM {prev} GROUP BY s HAVING COUNT(*) >= {k}),
    c{i} AS MATERIALIZED (
        SELECT s, d FROM {prev}
        WHERE s IN (SELECT s FROM k{i}) AND d IN (SELECT s FROM k{i})
    )"""
        prev = f"c{i}"
    sql += f"""
    SELECT s AS id, COUNT(*) AS degree FROM {prev}
    GROUP BY s HAVING COUNT(*) >= {k}"""
    return sql


def _weighted_paths_oracle(rounds: int = 6) -> str:
    """Unrolled Bellman-Ford relaxation rounds (exactly the Spark operator's
    bounded iteration — a recursive path-enumeration CTE would blow up on
    dense near-dup cliques)."""
    cte = _DUCK_EDGE_CTE.format(banded=_banded_pairs_cte(_DUCK_TOKIDSET))
    sql = f"""
    WITH {cte},
    wund AS (SELECT s, d, CAST((s + d) % 7 + 1 AS BIGINT) AS w FROM und),
    lm AS (SELECT MIN(d1) AS l FROM ed),
    d0 AS (SELECT l AS id, CAST(0 AS BIGINT) AS dist FROM lm)"""
    prev = "d0"
    for i in range(1, rounds + 1):
        sql += f""",
    d{i} AS (
        SELECT id, MIN(dist) AS dist FROM (
            SELECT id, dist FROM {prev}
            UNION ALL
            SELECT u.d AS id, p.dist + u.w AS dist
            FROM {prev} p JOIN wund u ON u.s = p.id
        ) GROUP BY id
    )"""
        prev = f"d{i}"
    sql += f"""
    SELECT id, dist AS distance FROM {prev}"""
    return sql


_MERGE_UPSERT_ORACLE = """
            WITH tgt AS (
                SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
                FROM orders
            ),
            src AS (
                SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                       o_totalprice + 100.0 AS o_totalprice,
                       FALSE AS is_delete
                FROM orders
                WHERE o_orderkey % 97 = 0 AND o_orderkey % 89 <> 0
                UNION ALL
                SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                       TRUE
                FROM orders WHERE o_orderkey % 89 = 0
                UNION ALL
                SELECT -(o_orderkey + 1), o_custkey, 'N',
                       o_totalprice * 0.5, FALSE
                FROM orders WHERE o_orderkey % 101 = 0
            )
            SELECT
                COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
                CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey
                     ELSE t.o_custkey END AS o_custkey,
                CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
                     ELSE t.o_orderstatus END AS o_orderstatus,
                CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                     ELSE t.o_totalprice END AS o_totalprice
            FROM tgt t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey
            WHERE NOT COALESCE(s.is_delete, FALSE)
        """


_DELTA_DEDUP_ORACLE = f"""
            WITH toks AS (SELECT doc_id, {_DUCK_TOKIDLIST} AS t FROM documents),
            ids AS (
                SELECT doc_id, {_duck_gram_ids('t', 3)} AS s
                FROM toks
            ),
            sigs AS (SELECT doc_id, s, {_minhash_sig_sql('s', SHINGLE_LSH_HASHES)} AS sig FROM ids),
            bands AS (
                SELECT doc_id,
                       unnest({_band_sql('sig', SHINGLE_LSH_HASHES, SHINGLE_LSH_BANDS)}) AS band
                FROM sigs
            ),
            cand AS (
                SELECT d.doc_id AS pk1, c.doc_id AS pk2
                FROM bands d JOIN bands c
                  ON d.band = c.band AND d.doc_id <> c.doc_id
                WHERE d.doc_id % 10 = 7 AND c.doc_id % 10 <> 7
                GROUP BY d.doc_id, c.doc_id
            ),
            scored AS (
                SELECT c.pk1, c.pk2,
                       len(list_intersect(i1.s, i2.s)) AS inter,
                       len(i1.s) + len(i2.s) - len(list_intersect(i1.s, i2.s)) AS uni
                FROM cand c
                JOIN ids i1 ON i1.doc_id = c.pk1
                JOIN ids i2 ON i2.doc_id = c.pk2
            )
            SELECT pk1, pk2, (ROUND(100.0 * inter / uni, 6) + 0.0) AS similarity
            FROM scored
            WHERE 100.0 * inter / uni >= 70.0
        """


def oracle_sql() -> dict[str, str]:
    edge_cte = _DUCK_EDGE_CTE.format(banded=_banded_pairs_cte(_DUCK_TOKIDSET))
    lang_hits = {
        lang: f"len(list_filter(t, x -> list_contains({arr}, x)))"
        for lang, arr in _LANG_SW_SQL.items()
    }
    return {
        # Efraimidis-Spirakis weighted sample: identical md5->60-bit-int
        # ->double->ln key on both engines (the int->double conversion and
        # the 2^60 division are IEEE-exact; ln agrees to 1 ulp), same
        # (key DESC, doc_id) tie-break.
        "doc_weighted_sample": """
            WITH w AS (
                SELECT lang, doc_id, n_chars,
                       ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                               1, 15)) AS UBIGINT) + 1)
                          / 1152921504606846976.0) / n_chars AS key
                FROM documents WHERE n_chars > 0
            ),
            r AS (
                SELECT lang, doc_id, n_chars,
                       row_number() OVER (
                           PARTITION BY lang ORDER BY key DESC, doc_id
                       ) AS rk
                FROM w
            )
            SELECT lang, rk, doc_id, n_chars FROM r WHERE rk <= 20
        """,
        # CSV round trip: the oracle fingerprints the SOURCE table; the
        # Spark side fingerprints what came back through the CSV codec —
        # equality proves the quoting/escaping/newline handling lossless.
        # strlen = BYTE length (identical semantics in every DuckDB/Spark
        # version, unlike character length()). r9: the content fingerprint
        # is an order-free arithmetic set checksum (sum + bit_xor over
        # md5-derived 60-bit ints, sum terms mod 1e9+7) — no string
        # min/max, no ordering/collation surface anywhere. The Spark
        # side's in-plan diagnostics are stated as literals: 0 corrupted
        # documents, 4 committed part files (a task-retry duplicate file
        # under concurrent load shows up as n_files_total <> 4).
        "io_csv_roundtrip": """
            SELECT lang,
                   count(*) AS n_docs,
                   count(DISTINCT doc_id) AS n_ids,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   CAST(sum(strlen(text)) AS BIGINT) AS sum_text_bytes,
                   count(DISTINCT md5(text)) AS n_distinct_md5,
                   CAST(COALESCE(
                       sum(('0x' || substr(md5(text), 1, 15))::UBIGINT::BIGINT
                           % 1000000007), 0) AS BIGINT) AS text_chk_sum,
                   COALESCE(bit_xor(('0x' || substr(md5(text), 1, 15))::UBIGINT::BIGINT),
                            0) AS text_chk_xor,
                   CAST(0 AS BIGINT) AS n_mismatched_vs_source,
                   CAST(4 AS BIGINT) AS n_files_total
            FROM documents GROUP BY lang
        """,
        # ORC round trip: same source-vs-roundtrip fingerprint pattern
        # (timestamps as epoch micros, exact decimal value sum).
        "io_orc_roundtrip": """
            SELECT event_type,
                   count(*) AS n,
                   count(DISTINCT user_id) AS n_users,
                   min(epoch_us(ts)) AS min_ts_us,
                   max(epoch_us(ts)) AS max_ts_us,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                       AS sum_value
            FROM events WHERE event_type <> 'view'
            GROUP BY event_type
        """,
        # Prefix-blocked Levenshtein fuzzy join: same (lang, 8-char-prefix)
        # block, same lossless length prune, same character-level edit
        # distance on both engines.
        "doc_fuzzy_title_join": """
            WITH t AS (
                SELECT doc_id, lang, lower(substr(text, 1, 120)) AS title
                FROM documents
            )
            SELECT a.lang AS lang, a.doc_id AS pk1, b.doc_id AS pk2,
                   levenshtein(a.title, b.title) AS distance
            FROM t a JOIN t b
              ON a.lang = b.lang
             AND substr(a.title, 1, 8) = substr(b.title, 1, 8)
             AND a.doc_id < b.doc_id
             AND abs(length(a.title) - length(b.title)) <= 25
            WHERE levenshtein(a.title, b.title) <= 25
        """,
        # Exact grouped quantiles: Spark's percentile() and DuckDB's
        # quantile_cont() share the (n-1)*p linear-interpolation
        # definition; round(4) absorbs last-ulp summation differences.
        "lineitem_exact_quantiles": """
            SELECT l_returnflag, l_linestatus,
                   round(quantile_cont(l_extendedprice, 0.25), 4) AS price_p25,
                   round(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50,
                   round(quantile_cont(l_extendedprice, 0.75), 4) AS price_p75,
                   round(quantile_cont(l_extendedprice, 0.95), 4) AS price_p95,
                   round(quantile_cont(l_quantity, 0.5), 4) AS qty_median,
                   count(*) AS n_rows
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
        # End-to-end curation pipeline: every stage's CTE reuses the
        # already-verified per-stage oracle mirror (gopher measures, exact
        # dedup winner election, shared rolling-hash 4-grams, A-ES weighted
        # sample); the final sampled SET is md5-verified, not just counted.
        "doc_curation_pipeline": f"""
            WITH w0 AS (
                SELECT doc_id, lang, n_chars, text,
                       list_filter(string_split_regex(text, '\\s+'),
                                   x -> x <> '') AS words
                FROM documents
            ),
            m AS (
                SELECT doc_id, lang, n_chars, text,
                       len(words) AS n_words,
                       CASE WHEN len(words) > 0 THEN
                           list_sum(list_transform(words, x -> length(x)))::DOUBLE
                           / len(words) ELSE 0.0 END AS mwl,
                       CASE WHEN len(words) > 0 THEN
                           len(regexp_extract_all(text, '#|\\.\\.\\.'))::DOUBLE
                           / len(words) ELSE 0.0 END AS sym,
                       CASE WHEN len(words) > 0 THEN
                           len(list_filter(words,
                               x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                           / len(words) ELSE 0.0 END AS awf,
                       len(list_filter(
                           ['the','and','of','to','in','is','that','for'],
                           s -> list_contains(
                               list_transform(words, x -> lower(x)), s)))
                           AS nsd
                FROM w0
            ),
            quality AS (
                SELECT doc_id, lang, n_chars FROM m
                WHERE n_words >= 30 AND n_words <= 100000
                  AND mwl >= 3.0 AND mwl <= 10.0 AND sym <= 0.1
                  AND awf >= 0.8 AND nsd >= 1
            ),
            fp AS (
                SELECT doc_id,
                       md5(array_to_string(list_transform(
                           {_DUCK_TOKIDSET},
                           x -> CAST(x AS VARCHAR)), ',')) AS f
                FROM documents
            ),
            dd AS (
                SELECT q.doc_id, q.lang, q.n_chars,
                       ROW_NUMBER() OVER (
                           PARTITION BY fp.f ORDER BY q.doc_id
                       ) AS rn
                FROM quality q JOIN fp USING (doc_id)
            ),
            winners AS (SELECT doc_id, lang, n_chars FROM dd WHERE rn = 1),
            train_w AS (SELECT * FROM winners WHERE doc_id % 50 <> 0),
            toks AS (SELECT doc_id, {_DUCK_TOKIDLIST} AS t FROM documents),
            ids AS (SELECT doc_id, {_duck_gram_ids('t', 4)} AS g FROM toks),
            ev AS (
                SELECT DISTINCT eg FROM (
                    SELECT unnest(g) AS eg FROM ids WHERE doc_id % 50 = 0
                )
            ),
            hits AS (
                SELECT DISTINCT i.doc_id FROM (
                    SELECT ids.doc_id, unnest(ids.g) AS eg
                    FROM ids JOIN train_w USING (doc_id)
                ) i JOIN ev USING (eg)
            ),
            clean AS (
                SELECT * FROM train_w
                WHERE doc_id NOT IN (SELECT doc_id FROM hits)
            ),
            keyd AS (
                SELECT lang, doc_id, n_chars,
                       ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                               1, 15)) AS UBIGINT) + 1)
                          / 1152921504606846976.0) / n_chars AS key
                FROM clean WHERE n_chars > 0
            ),
            rs AS (
                SELECT lang, doc_id,
                       row_number() OVER (
                           PARTITION BY lang ORDER BY key DESC, doc_id
                       ) AS rk
                FROM keyd
            ),
            samp AS (SELECT lang, doc_id FROM rs WHERE rk <= 10),
            li AS (SELECT lang, COUNT(*) AS n_input FROM documents GROUP BY lang),
            lq AS (SELECT lang, COUNT(*) AS n_quality FROM quality GROUP BY lang),
            ldd AS (SELECT lang, COUNT(*) AS n_dedup FROM winners GROUP BY lang),
            lc AS (SELECT lang, COUNT(*) AS n_clean FROM clean GROUP BY lang),
            ls AS (
                SELECT lang, COUNT(*) AS n_sampled,
                       md5(array_to_string(list_transform(
                           list_sort(list(doc_id)),
                           x -> CAST(x AS VARCHAR)), ',')) AS sampled_ids_md5
                FROM samp GROUP BY lang
            )
            SELECT li.lang, li.n_input,
                   COALESCE(lq.n_quality, 0) AS n_quality,
                   COALESCE(ldd.n_dedup, 0) AS n_dedup,
                   COALESCE(lc.n_clean, 0) AS n_clean,
                   COALESCE(ls.n_sampled, 0) AS n_sampled,
                   COALESCE(ls.sampled_ids_md5, '') AS sampled_ids_md5
            FROM li
            LEFT JOIN lq USING (lang)
            LEFT JOIN ldd USING (lang)
            LEFT JOIN lc USING (lang)
            LEFT JOIN ls USING (lang)
        """,
        # Runtime bloom-filter join pruning: scan-level might_contain must
        # never change results — the oracle is the plain join.
        "io_bloom_join_prune": """
            SELECT p.p_size,
                   count(*) AS n_items,
                   count(DISTINCT l.l_orderkey) AS n_orders,
                   CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6)))
                        AS DOUBLE) AS sum_price
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_size <= 3
            GROUP BY p.p_size
        """,
        # DPP roundtrip: layout + runtime pruning must never change
        # results — the oracle states the dim's predicate statically.
        "io_dpp_prune": """
            WITH o AS (
                SELECT *, year(o_orderdate) AS o_year FROM orders
            ),
            y AS (
                SELECT DISTINCT o_year FROM o WHERE o_year % 4 = 1
            )
            SELECT o.o_year, 'era1' AS era, count(*) AS n_orders,
                   count(DISTINCT o_custkey) AS n_customers,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                       AS sum_price
            FROM o JOIN y USING (o_year)
            GROUP BY o.o_year
        """,
        # MERGE semantics restated as the same FULL OUTER JOIN + CASE
        # arbitration the Spark operator lowers to (operators/merge.py):
        # matched & not deleted -> source values; target-only -> target
        # values; source-only & not delete-flagged -> insert.
        "storage_merge_upsert": _MERGE_UPSERT_ORACLE,
        # streaming CDC twin: batching must never change results
        "stream_merge_upsert": _MERGE_UPSERT_ORACLE,
        # CDC generation: the MERGE oracle becomes a CTE; the diff is the
        # same FULL OUTER JOIN with IS DISTINCT FROM change detection.
        "orders_snapshot_diff": f"""
            WITH merged AS ({_MERGE_UPSERT_ORACLE}),
            d AS (
                SELECT COALESCE(o.o_orderkey, m.o_orderkey) AS o_orderkey,
                       CASE WHEN m.o_orderkey IS NOT NULL THEN m.o_custkey
                            ELSE o.o_custkey END AS o_custkey,
                       CASE WHEN m.o_orderkey IS NOT NULL
                            THEN m.o_orderstatus
                            ELSE o.o_orderstatus END AS o_orderstatus,
                       CASE WHEN m.o_orderkey IS NOT NULL THEN m.o_totalprice
                            ELSE o.o_totalprice END AS o_totalprice,
                       CASE
                         WHEN m.o_orderkey IS NOT NULL
                              AND o.o_orderkey IS NULL THEN 'insert'
                         WHEN o.o_orderkey IS NOT NULL
                              AND m.o_orderkey IS NULL THEN 'delete'
                         WHEN (m.o_custkey IS DISTINCT FROM o.o_custkey)
                           OR (m.o_orderstatus IS DISTINCT FROM
                               o.o_orderstatus)
                           OR (m.o_totalprice IS DISTINCT FROM
                               o.o_totalprice) THEN 'update'
                       END AS op
                FROM (SELECT o_orderkey, o_custkey, o_orderstatus,
                             o_totalprice FROM orders) o
                FULL OUTER JOIN merged m ON o.o_orderkey = m.o_orderkey
            )
            SELECT * FROM d WHERE op IS NOT NULL
        """,
        # CDC squash + MERGE: last-writer-wins restated as a seq-desc
        # window (the log has no (key,seq) ties, so row_number == the
        # operator's rank), then the same FULL OUTER JOIN arbitration as
        # the MERGE oracle. Prices are computed off the ORIGINAL snapshot
        # on both engines — intermediate changes never compound.
        "orders_cdc_squash_merge": """
            WITH tgt AS (
                SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
                FROM orders
            ),
            log AS (
                SELECT o_orderkey, o_custkey, 'A' AS o_orderstatus,
                       o_totalprice + 50.0 AS o_totalprice,
                       FALSE AS is_delete, 1 AS seq
                FROM orders WHERE o_orderkey % 97 = 0
                UNION ALL
                SELECT o_orderkey, o_custkey, 'U', o_totalprice + 100.0,
                       FALSE, 2
                FROM orders
                WHERE o_orderkey % 97 = 0 AND o_orderkey % 2 = 0
                UNION ALL
                SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                       TRUE, 2
                FROM orders
                WHERE o_orderkey % 89 = 0 AND o_orderkey % 97 <> 0
                UNION ALL
                SELECT o_orderkey, o_custkey, 'R', o_totalprice * 0.25,
                       FALSE, 3
                FROM orders
                WHERE o_orderkey % 89 = 0 AND o_orderkey % 97 <> 0
                      AND o_orderkey % 2 = 0
            ),
            sq AS (
                SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                       is_delete
                FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY o_orderkey ORDER BY seq DESC
                    ) AS rn FROM log
                ) WHERE rn = 1
            )
            SELECT
                COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
                CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey
                     ELSE t.o_custkey END AS o_custkey,
                CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
                     ELSE t.o_orderstatus END AS o_orderstatus,
                CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                     ELSE t.o_totalprice END AS o_totalprice
            FROM tgt t FULL OUTER JOIN sq s ON t.o_orderkey = s.o_orderkey
            WHERE NOT COALESCE(s.is_delete, FALSE)
        """,
        # Sliding-window chunking: identical window arithmetic — starts are
        # multiples of the stride below the token count (Spark sequence()
        # has an inclusive stop, DuckDB range() an exclusive one; 0..n-1
        # inclusive == 0..n exclusive), 1-based inclusive list slices on
        # both engines, md5 over the space-joined chunk.
        "doc_chunk_overlap": """
            WITH toks AS (
                SELECT doc_id,
                       list_filter(string_split_regex(text, '\\s+'),
                                   x -> x <> '') AS t
                FROM documents
            ),
            st AS (
                SELECT doc_id, t,
                       unnest(range(0, greatest(len(t), 1), 48)) AS start
                FROM toks
            )
            SELECT doc_id,
                   CAST(start // 48 AS BIGINT) AS chunk_idx,
                   CAST(len(t[start + 1 : start + 64]) AS BIGINT)
                       AS n_chunk_tokens,
                   md5(array_to_string(t[start + 1 : start + 64], ' '))
                       AS chunk_md5
            FROM st
            WHERE len(t[start + 1 : start + 64]) > 0
        """,
        # SCD2: change-collapse via lag() then validity ranges via lead(),
        # ordered by (ts, priority) on both engines so ties are total.
        "orders_scd2_history": """
            WITH log AS (
                SELECT o_custkey AS custkey, o_orderdate AS ts,
                       o_orderpriority AS priority,
                       lag(o_orderpriority) OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderpriority
                       ) AS prev
                FROM orders
            ),
            chg AS (
                -- IS DISTINCT FROM: NULL-safe, mirroring the operator's
                -- eqNullSafe change test (latent here — o_orderpriority is
                -- never NULL — but the oracle must restate the semantics)
                SELECT custkey, ts, priority FROM log
                WHERE prev IS DISTINCT FROM priority
            )
            SELECT custkey, priority, effective_from, effective_to,
                   CASE WHEN effective_to IS NULL THEN 1 ELSE 0 END
                       AS is_current
            FROM (
                SELECT custkey, priority, ts AS effective_from,
                       lead(ts) OVER (
                           PARTITION BY custkey ORDER BY ts, priority
                       ) AS effective_to
                FROM chg
            )
        """,
        # ML model-fit queries: the fits (KMeans/LDA/SVD/MinHashLSH tables)
        # aren't reproducible in SQL, so each Spark query computes asserted
        # invariants in-plan and the oracle states the expected constants —
        # the emb_ivf_ann pattern. A fit/quantizer/distance regression flips
        # a boolean and hash-fails; n_docs is computed by BOTH engines.
        # Avro round-trip: the oracle aggregates the SAME rows straight from
        # parquet — a codec/schema/row-loss bug on the Spark side (which went
        # parquet -> avro -> parquet-free read) breaks the hash.
        "io_avro_roundtrip": """
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   CAST(SUM(length(text)) AS BIGINT) AS sum_text_len,
                   COUNT(DISTINCT doc_id) AS n_ids
            FROM documents GROUP BY lang
        """,
        "ml_kmeans_blocked_pairs": """
            SELECT TRUE AS blocking_selective, TRUE AS clusters_ok,
                   (SELECT COUNT(*) FROM documents) AS n_docs, TRUE AS recall_ok
        """,
        "ml_lda_topics": """
            SELECT CAST(5 AS BIGINT) AS n_topics, TRUE AS terms_ok,
                   TRUE AS vocab_ok, TRUE AS weights_ok
        """,
        "ml_lsa_projection": """
            SELECT TRUE AS dims_ok, TRUE AS energy_positive,
                   (SELECT COUNT(*) FROM documents) AS n_docs, TRUE AS norms_ok
        """,
        "ml_minhash_reference_join": """
            SELECT (SELECT COUNT(*) FROM documents) AS n_docs, TRUE AS nonempty,
                   TRUE AS precision_ok, TRUE AS recall_ok
        """,
        "ml_dimsum_lsa_invariants": """
            SELECT TRUE AS exact_ok, (SELECT COUNT(*) FROM documents) AS n_docs,
                   TRUE AS pairs_match, TRUE AS range_ok, TRUE AS triangular_ok
        """,
        # Porter stems of the probe words are stated literally (the published
        # Porter-correct values); vocab/cluster invariants literal TRUE;
        # n_docs computed by both engines.
        "ml_stemmer_bisecting": """
            SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
                   'run' AS stem_running, 'fli' AS stem_flies,
                   'happili' AS stem_happily, 'relat' AS stem_relational,
                   'gener' AS stem_generously,
                   TRUE AS vocab_shrunk, TRUE AS clusters_ok, TRUE AS labels_ok
        """,
        # Schema evolution: rebuild the identical two-generation union from
        # the raw table (gen 1 lacks source/quality -> nulls).
        "io_schema_evolution": """
            WITH u AS (
                SELECT doc_id, lang, n_chars,
                       NULL AS source, NULL::DOUBLE AS quality, 1 AS generation
                FROM documents WHERE doc_id % 2 = 0
                UNION ALL
                SELECT doc_id, lang, n_chars,
                       source, n_chars / 100.0 AS quality, 2 AS generation
                FROM documents WHERE doc_id % 2 = 1
            )
            SELECT generation, lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   COUNT(source) AS n_with_source,
                   CAST(SUM(CAST(quality AS DECIMAL(38,6))) AS DOUBLE) AS sum_quality
            FROM u GROUP BY generation, lang
        """,
        # Keywords: identical tf/df/idf/rank formulation; ranking decided
        # on the rounded score + term tie-break in both engines.
        "doc_keywords": f"""
            WITH toks AS (SELECT doc_id, {_DUCK_TOKLIST} AS t FROM documents),
            terms AS (SELECT doc_id, unnest(t) AS term FROM toks),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
            n AS (SELECT COUNT(*) AS n FROM documents),
            dfq AS (SELECT term, COUNT(*) AS dfq FROM tf GROUP BY term),
            sc AS (
                SELECT t.doc_id, t.term,
                       (ROUND(t.tf * ln((n.n + 1.0) / (d.dfq + 1.0)), 6) + 0.0) AS score
                FROM tf t JOIN dfq d USING (term), n
            ),
            rk AS (
                SELECT doc_id, term, score,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY score DESC, term ASC) AS rk
                FROM sc
            )
            SELECT doc_id, term, score, rk FROM rk WHERE rk <= 3
        """,
        # Embedding outliers: exact decimal centroids; d2 and threshold
        # rounded to 4dp in BOTH engines before comparison.
        "emb_outlier_audit": """
            WITH ex AS (
                SELECT vec_id, label,
                       generate_subscripts(embedding::DOUBLE[], 1) - 1 AS pos,
                       unnest(embedding::DOUBLE[]) AS val
                FROM embeddings
            ),
            cent AS (
                SELECT label, pos,
                       SUM(CAST(val AS DECIMAL(38,12)))::DOUBLE / COUNT(*) AS c
                FROM ex GROUP BY label, pos
            ),
            d2 AS (
                SELECT e.vec_id, e.label,
                       (ROUND(SUM((e.val - c.c) * (e.val - c.c)), 4) + 0.0) AS d2
                FROM ex e JOIN cent c ON e.label = c.label AND e.pos = c.pos
                GROUP BY e.vec_id, e.label
            ),
            thr AS (SELECT label, (ROUND(1.05 * AVG(d2), 4) + 0.0) AS t FROM d2 GROUP BY label)
            SELECT d.vec_id, d.label, d.d2, d.d2 > t.t AS is_outlier
            FROM d2 d JOIN thr t ON d.label = t.label
        """,
        # Z-order roundtrip: layout must never change results — identical
        # 2-D range aggregate from the raw table.
        "io_zorder_roundtrip": """
            SELECT event_type, COUNT(*) AS n,
                   COUNT(DISTINCT user_id) AS n_users,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
            FROM events
            WHERE user_id <= (SELECT MAX(user_id) FROM events) / 2
              AND value >= 50.0
            GROUP BY event_type
        """,
        # Funnel: strict-after semantics via groupBy+join chains — per-user
        # step timestamps identical to the window formulation.
        "events_funnel": """
            WITH mv AS (
                SELECT user_id,
                       MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
                FROM events GROUP BY user_id
            ),
            mc AS (
                SELECT e.user_id, MIN(e.ts) AS t_click
                FROM events e JOIN mv ON e.user_id = mv.user_id
                WHERE e.event_type = 'click' AND mv.t_view IS NOT NULL
                  AND e.ts > mv.t_view
                GROUP BY e.user_id
            ),
            mp AS (
                SELECT e.user_id, MIN(e.ts) AS t_purchase
                FROM events e JOIN mc ON e.user_id = mc.user_id
                WHERE e.event_type = 'purchase' AND e.ts > mc.t_click
                GROUP BY e.user_id
            )
            SELECT (SELECT COUNT(*) FROM mv WHERE t_view IS NOT NULL) AS n_view,
                   (SELECT COUNT(*) FROM mc) AS n_click_after_view,
                   (SELECT COUNT(*) FROM mp) AS n_purchase_after_click
        """,
        # Gopher rules: every measure restated formula-for-formula over the
        # same raw whitespace words.
        "doc_gopher_quality": r"""
            WITH w AS (
                SELECT doc_id, text,
                       list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> '') AS words
                FROM documents
            ),
            m AS (
                SELECT doc_id,
                       len(words) AS n_words,
                       CASE WHEN len(words) > 0 THEN
                           list_sum(list_transform(words, x -> length(x)))::DOUBLE
                           / len(words) ELSE 0.0 END AS mean_word_len,
                       CASE WHEN len(words) > 0 THEN
                           len(regexp_extract_all(text, '#|\.\.\.'))::DOUBLE
                           / len(words) ELSE 0.0 END AS symbol_ratio,
                       CASE WHEN len(words) > 0 THEN
                           len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
                           / len(words) ELSE 0.0 END AS alpha_word_frac,
                       len(list_filter(['the','and','of','to','in','is','that','for'],
                           s -> list_contains(list_transform(words, x -> lower(x)), s)))
                           AS n_stop_distinct
                FROM w
            )
            SELECT doc_id, n_words,
                   (ROUND(mean_word_len, 6) + 0.0) AS mean_word_len,
                   (ROUND(symbol_ratio, 6) + 0.0) AS symbol_ratio,
                   (ROUND(alpha_word_frac, 6) + 0.0) AS alpha_word_frac,
                   n_stop_distinct,
                   (n_words >= 30 AND n_words <= 100000
                    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                    AND symbol_ratio <= 0.1
                    AND alpha_word_frac >= 0.8
                    AND n_stop_distinct >= 1) AS gopher_pass
            FROM m
        """,
        # Bucketed-join roundtrip: layout must never change results — the
        # oracle aggregates the raw tables; the Spark side also plan-asserts
        # zero Exchange in-query.
        "io_bucketed_join": """
            SELECT c.c_mktsegment, COUNT(*) AS n_orders,
                   COUNT(DISTINCT c.c_custkey) AS n_customers,
                   CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
            FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
            GROUP BY c.c_mktsegment
        """,
        # Incremental dedup: same shingle/signature/band mirrors as
        # minhash_lsh_dedup, but candidates are (delta x corpus) band
        # collisions only; min_jaccard prune is lossless so absent here.
        "minhash_delta_dedup": _DELTA_DEDUP_ORACLE,
        # streaming twin: batching must never change results
        "stream_ingest_dedup": _DELTA_DEDUP_ORACLE,
        # Mixture sampler: same md5-rank membership rule in SQL — the oracle
        # reproduces the exact kept SET, not just per-stratum counts.
        "doc_mixture_sample": """
            WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
            r AS (
                SELECT d.doc_id, d.lang,
                       ROW_NUMBER() OVER (PARTITION BY d.lang
                           ORDER BY md5(d.doc_id::VARCHAR), d.doc_id) AS rk,
                       FLOOR(CASE d.lang WHEN 'en' THEN 1.0 WHEN 'de' THEN 0.5
                             WHEN 'es' THEN 0.25 WHEN 'fr' THEN 0.1
                             ELSE 0.0 END * c.n) AS keep
                FROM documents d JOIN c USING (lang)
            )
            SELECT doc_id, lang, rk FROM r WHERE rk <= keep
        """,
        # Paragraph dedup: identical split / first-global-occurrence /
        # ordered-reassembly pipeline in SQL; clean_md5 verifies the exact
        # reconstruction byte-for-byte.
        "doc_paragraph_dedup": """
            WITH paras AS (
                SELECT doc_id,
                       generate_subscripts(string_split(text, ' the '), 1) - 1 AS idx,
                       unnest(string_split(text, ' the ')) AS p
                FROM documents
            ),
            pnz AS (
                SELECT doc_id, idx, p, md5(p) AS h FROM paras WHERE p <> ''
            ),
            win AS (
                SELECT doc_id, idx, p,
                       ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, idx) AS rn
                FROM pnz
            ),
            nb AS (SELECT doc_id, COUNT(*) AS n_paras FROM pnz GROUP BY doc_id),
            re AS (
                SELECT doc_id, COUNT(*) AS n_kept,
                       string_agg(p, ' the ' ORDER BY idx) AS clean_text
                FROM win WHERE rn = 1 GROUP BY doc_id
            )
            SELECT nb.doc_id, nb.n_paras,
                   COALESCE(re.n_kept, 0) AS n_kept,
                   length(COALESCE(re.clean_text, '')) AS clean_len,
                   md5(COALESCE(re.clean_text, '')) AS clean_md5
            FROM nb LEFT JOIN re ON nb.doc_id = re.doc_id
        """,
        # approx k-NN probe: hash tables aren't SQL-reproducible — literal
        # invariants, the ml_* pattern.
        "ml_knn_probe": """
            SELECT CAST(10 AS BIGINT) AS n_neighbors, TRUE AS self_found,
                   TRUE AS dist_range_ok, TRUE AS sorted_ok
        """,
        # Cross-measure join: both measures recomputed in SQL over the same
        # consecutive-pair relation; corr/avg rounded to 6 (the pearson_corr
        # float-parity convention).
        "pair_measure_correlation": f"""
            WITH s AS (SELECT doc_id, {_DUCK_TOKIDSET} AS s FROM documents),
            p AS (
                SELECT len(list_intersect(a.s, b.s))::DOUBLE AS i,
                       len(a.s)::DOUBLE AS sa, len(b.s)::DOUBLE AS sb
                FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
            ),
            m AS (
                SELECT CASE WHEN sa + sb - i > 0
                            THEN 100.0 * i / (sa + sb - i) ELSE 0.0 END AS sim_a,
                       CASE WHEN least(sa, sb) > 0
                            THEN 100.0 * i / least(sa, sb) ELSE 0.0 END AS sim_b
                FROM p
            )
            SELECT COUNT(*) AS n_pairs,
                   (ROUND(corr(sim_a, sim_b), 6) + 0.0) AS corr_measures,
                   (ROUND(AVG(sim_a), 6) + 0.0) AS avg_jaccard,
                   (ROUND(AVG(sim_b), 6) + 0.0) AS avg_maxasym
            FROM m
        """,
        # Rebuild the identical synthetic metadata from documents and mirror
        # month-name parse -> priority rank -> family window -> attach join.
        "latest_version_family": f"""
            WITH meta AS (
                SELECT doc_id, doc_id % 40 AS fam,
                       {_LVF_VERSIONS!r}[(doc_id % 8 + 1)::INT] AS version,
                       DATE '2005-01-01' + ((doc_id % 1000)::INT) AS d
                FROM documents
            ),
            m2 AS (
                SELECT 'data/bills_' || fam || '_' || version || '.txt' AS filePath,
                       CASE WHEN doc_id % 17 = 0 THEN 'not a date'
                            ELSE strftime(d, '%B %-d, %Y') END AS versionDate,
                       version, fam
                FROM meta
            ),
            parsed AS (
                SELECT filePath, version, fam, 'bills_' || fam AS family,
                       COALESCE(try_strptime(trim(versionDate), '%B %-d, %Y'),
                                TIMESTAMP '1900-12-31') AS ts,
                       CASE WHEN list_position({_LVF_VERSIONS[:7]!r}, version) > 0
                            THEN list_position({_LVF_VERSIONS[:7]!r}, version)
                            ELSE 8 END AS prio
                FROM m2
            ),
            win AS (
                SELECT family, filePath, version, ts,
                       ROW_NUMBER() OVER (PARTITION BY family
                           ORDER BY ts DESC, prio ASC, filePath ASC) AS rn
                FROM parsed
            ),
            latest AS (SELECT family, filePath, version, ts FROM win WHERE rn = 1),
            counts AS (
                SELECT 'bills_' || fam || '_' || version AS primary_key,
                       COUNT(*) AS n_bills
                FROM m2 GROUP BY 1
            )
            SELECT l.family, l.filePath, l.version,
                   strftime(l.ts, '%Y-%m-%d') AS version_date,
                   COALESCE(c.n_bills, 0) AS n_bills
            FROM latest l
            LEFT JOIN counts c ON l.family || '_' || l.version = c.primary_key
        """,
        # JSON roundtrip: the oracle recomputes every aggregate straight from
        # parquet. n_files = 1 is structural (single_file=True sink); n_lines
        # and n_in_list are real recomputations (tail-split count; ids 0-99).
        "io_json_roundtrip": """
            SELECT COUNT(*) AS n_docs, COUNT(DISTINCT doc_id) AS n_ids,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
                   CAST(SUM(length(text)) AS BIGINT) AS sum_text_len,
                   COUNT(DISTINCT lang) AS n_langs,
                   CAST(SUM(CASE WHEN doc_id BETWEEN 0 AND 99 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_list,
                   CAST(1 AS BIGINT) AS n_files,
                   CAST(SUM(CASE WHEN doc_id % 10 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_lines
            FROM documents
        """,
        "emb_cosine_near_dup": _emb_near_dup_oracle(),
        "pairs_postprocess_sample": f"""
            WITH {_banded_pairs_cte(_DUCK_TOKIDSET)},
            sp AS (
                SELECT d1, d2, 100.0 * inter / uni AS sim
                FROM scored WHERE 100.0 * inter / uni >= 90.0
            ),
            fl AS (
                SELECT CASE WHEN (d1 + d2) % 2 = 0 THEN d2 ELSE d1 END AS pk1,
                       CASE WHEN (d1 + d2) % 2 = 0 THEN d1 ELSE d2 END AS pk2,
                       sim
                FROM sp
            ),
            en AS (
                SELECT f.pk1, f.pk2, f.sim, da.text AS c1, db.text AS c2
                FROM fl f
                JOIN documents da ON da.doc_id = f.pk1
                JOIN documents db ON db.doc_id = f.pk2
            ),
            sk AS (
                SELECT LEAST(pk1, pk2) AS pk1_smaller,
                       GREATEST(pk1, pk2) AS pk2_larger,
                       CASE WHEN pk1 <= pk2 THEN c1 ELSE c2 END AS cs,
                       CASE WHEN pk1 <= pk2 THEN c2 ELSE c1 END AS cl,
                       sim
                FROM en
            )
            SELECT pk1_smaller, pk2_larger,
                   md5(cs) AS c1_md5, md5(cl) AS c2_md5,
                   (ROUND(sim, 6) + 0.0) AS similarity
            FROM sk
            WHERE CAST(('0x' || substr(md5(pk1_smaller || '_' || pk2_larger), 1, 15))
                       AS UBIGINT)::BIGINT % 100 < 50
        """,
        "doc_decontaminate": f"""
            WITH toks AS (SELECT doc_id, {_DUCK_TOKIDLIST} AS t FROM documents),
            ids AS (
                -- 4-gram rolling-hash ids (shared _duck_gram_ids mirror of
                -- text.ngram_ids_from_token_ids)
                SELECT doc_id, {_duck_gram_ids('t', 4)} AS g
                FROM toks
            ),
            ev AS (
                SELECT DISTINCT eg FROM (
                    SELECT unnest(g) AS eg FROM ids WHERE doc_id % 50 = 0
                )
            ),
            tr AS (
                SELECT doc_id, unnest(g) AS eg FROM ids WHERE doc_id % 50 <> 0
            )
            SELECT doc_id, COUNT(*) AS n_hits
            FROM tr JOIN ev USING (eg) GROUP BY doc_id
        """,
        "doc_stratified_sample": """
            SELECT lang, source, rk, doc_id FROM (
                SELECT lang, source, doc_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY lang, source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ) AS rk
                FROM documents
            ) WHERE rk <= 3
        """,
        "doc_pack_sequences": f"""
            WITH t AS (
                SELECT doc_id, lang, len({_DUCK_TOKLIST}) AS n_tokens
                FROM documents
            ),
            p AS (
                SELECT lang, n_tokens,
                       CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                           PARTITION BY lang ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) / 2048) AS BIGINT) AS pack_id
                FROM t
            )
            SELECT lang, pack_id, COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
            FROM p GROUP BY lang, pack_id
        """,
        "doc_repetition": f"""
            WITH t AS (SELECT doc_id, {_DUCK_TOKLIST} AS toks FROM documents),
            g AS (
                SELECT doc_id, toks,
                       list_transform(range(1, len(toks) - 2),
                           i -> list_reduce(toks[i:i+3],
                                            (a, b) -> a || ' ' || b)) AS grams
                FROM t
            )
            SELECT doc_id,
                   len(grams) AS n_grams,
                   len(list_distinct(grams)) AS n_distinct_grams,
                   CASE WHEN len(grams) > 0
                        THEN (ROUND((len(grams) - len(list_distinct(grams)))::DOUBLE
                                   / len(grams), 6) + 0.0)
                        ELSE 0.0 END AS dup_gram_ratio,
                   CASE WHEN len(toks) > 0
                        THEN (ROUND(list_max(list_transform(list_distinct(toks),
                                 tk -> len(list_filter(toks, x -> x = tk))))::DOUBLE
                             / len(toks), 6) + 0.0)
                        ELSE 0.0 END AS top_token_share
            FROM g
        """,
        "doc_pii_scrub": """
            SELECT doc_id,
                   len(regexp_extract_all(text, 'https?://[^\\s]+')) AS n_url,
                   len(regexp_extract_all(text,
                       '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')) AS n_email,
                   len(regexp_extract_all(text,
                       '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ipv4,
                   len(regexp_extract_all(text, '\\+?\\d[\\d\\- ]{7,}\\d')) AS n_phone,
                   length(
                       regexp_replace(
                       regexp_replace(
                       regexp_replace(
                       regexp_replace(text,
                           'https?://[^\\s]+', '<URL>', 'g'),
                           '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
                           '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IPV4>', 'g'),
                           '\\+?\\d[\\d\\- ]{7,}\\d', '<PHONE>', 'g')
                   ) AS redacted_len
            FROM documents
        """,
        "doc_quality_filter": f"""
            WITH toks AS (SELECT doc_id, lang, text, {_DUCK_TOKLIST} AS t FROM documents),
            m AS (
                SELECT doc_id, lang,
                       len(t) AS ntok,
                       len(list_filter(t, x -> list_contains({_EN_SW}, x))) AS sw,
                       CASE WHEN length(text) > 0 THEN
                            (length(text) - length(regexp_replace(text, '[,:;?!.]', '', 'g')))::DOUBLE / length(text)
                            ELSE 0.0 END AS punct,
                       CASE WHEN length(text) > 0 THEN
                            (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / length(text)
                            ELSE 0.0 END AS dig
                FROM toks
            ),
            scored AS (
                SELECT doc_id, lang,
                       (ROUND(0.4 * least(ntok / 100.0, 1.0)
                             + 0.4 * least((CASE WHEN ntok > 0 THEN sw::DOUBLE / ntok ELSE 0.0 END) * 5.0, 1.0)
                             + 0.2 * (1.0 - least((punct + dig) * 5.0, 1.0)), 6) + 0.0) AS q
                FROM m
            )
            SELECT lang, COUNT(*) AS n_kept, (ROUND(AVG(q), 6) + 0.0) AS avg_quality
            FROM scored
            WHERE q >= (SELECT quantile_cont(q, 0.5) FROM scored)
            GROUP BY lang
        """,
        "io_sorted_compact": """
            SELECT event_type, COUNT(*) AS n,
                   COUNT(DISTINCT user_id) AS n_users,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
            FROM events
            WHERE ts >= '2024-01-08 00:00:00' AND ts < '2024-01-15 00:00:00'
            GROUP BY event_type
        """,
        "events_stream_static_join": """
            WITH ur AS (
                SELECT user_id, MAX(value) * 0.9 AS user_ref
                FROM events GROUP BY user_id
            )
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   e.event_type, COUNT(*) AS n,
                   CAST(SUM(CASE WHEN e.value > ur.user_ref THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_above_avg
            FROM events e JOIN ur USING (user_id)
            GROUP BY 1, 2
        """,
        "doc_token_stats": f"""
            WITH toks AS (SELECT doc_id, text, {_DUCK_TOKLIST} AS t FROM documents)
            SELECT doc_id,
                   len(t) AS n_tokens,
                   len(list_distinct(t)) AS n_distinct,
                   len(regexp_extract_all(lower(text),
                       '[a-z]{{1,6}}|[0-9]|[^a-z0-9\\s]')) AS n_bpe_pieces
            FROM toks
        """,
        "doc_quality_lang": f"""
            WITH toks AS (SELECT doc_id, lang, text, {_DUCK_TOKLIST} AS t FROM documents),
            m AS (
                SELECT doc_id, lang,
                       len(t) AS ntok,
                       len(list_filter(t, x -> list_contains({_EN_SW}, x))) AS sw,
                       CASE WHEN length(text) > 0 THEN
                            (length(text) - length(regexp_replace(text, '[,:;?!.]', '', 'g')))::DOUBLE / length(text)
                            ELSE 0.0 END AS punct,
                       CASE WHEN length(text) > 0 THEN
                            (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / length(text)
                            ELSE 0.0 END AS dig,
                       {lang_hits['de']} AS hde, {lang_hits['en']} AS hen,
                       {lang_hits['es']} AS hes, {lang_hits['fr']} AS hfr
                FROM toks
            )
            SELECT doc_id, lang,
                   (ROUND(0.4 * least(ntok / 100.0, 1.0)
                         + 0.4 * least((CASE WHEN ntok > 0 THEN sw::DOUBLE / ntok ELSE 0.0 END) * 5.0, 1.0)
                         + 0.2 * (1.0 - least((punct + dig) * 5.0, 1.0)), 6) + 0.0) AS quality,
                   CASE WHEN greatest(hde, hen, hes, hfr) = 0 THEN 'und'
                        WHEN hde = greatest(hde, hen, hes, hfr) THEN 'de'
                        WHEN hen = greatest(hde, hen, hes, hfr) THEN 'en'
                        WHEN hes = greatest(hde, hen, hes, hfr) THEN 'es'
                        ELSE 'fr' END AS predicted_lang
            FROM m
        """,
        "doc_fingerprint": f"""
            WITH toks AS (SELECT doc_id, {_DUCK_TOKLIST} AS t FROM documents),
            sh AS (
                SELECT doc_id,
                       list_sort(list_distinct(list_transform(range(1, len(t) - 1),
                           i -> array_to_string(t[i:i+2], ' ')))) AS grams
                FROM toks
            )
            SELECT doc_id,
                   array_to_string(list_sort(list_transform(grams, s -> md5(s)))[1:4], '|')
                       AS fingerprint
            FROM sh
        """,
        "doc_simhash": f"""
            WITH tok AS (
                SELECT doc_id, unnest(list_distinct({_DUCK_TOKLIST})) AS t FROM documents
            ),
            th AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(t), 1, 4)) AS UBIGINT)::INTEGER AS h
                FROM tok
            ),
            bits AS (SELECT doc_id, h, unnest(range(0, 16)) AS bit FROM th),
            votes AS (
                SELECT doc_id, bit,
                       SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
                FROM bits GROUP BY doc_id, bit
            )
            SELECT doc_id,
                   CAST(SUM(CASE WHEN vote > 0 THEN (1 << bit) ELSE 0 END) AS BIGINT)
                       AS simhash
            FROM votes GROUP BY doc_id
        """,
        "minhash_lsh_dedup": f"""
            WITH toks AS (SELECT doc_id, {_DUCK_TOKIDLIST} AS t FROM documents),
            ids AS (
                -- 3-gram shingle ids (shared _duck_gram_ids mirror of
                -- text.ngram_ids_from_token_ids)
                SELECT doc_id, {_duck_gram_ids('t', 3)} AS s
                FROM toks
            ),
            sigs AS (SELECT doc_id, s, {_minhash_sig_sql('s', SHINGLE_LSH_HASHES)} AS sig FROM ids),
            bands AS (
                SELECT doc_id,
                       unnest({_band_sql('sig', SHINGLE_LSH_HASHES, SHINGLE_LSH_BANDS)}) AS band
                FROM sigs
            ),
            cand AS (
                SELECT a.doc_id AS pk1, b.doc_id AS pk2
                FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            ),
            scored AS (
                SELECT c.pk1, c.pk2,
                       len(list_intersect(i1.s, i2.s)) AS inter,
                       len(i1.s) + len(i2.s) - len(list_intersect(i1.s, i2.s)) AS uni
                FROM cand c
                JOIN ids i1 ON i1.doc_id = c.pk1
                JOIN ids i2 ON i2.doc_id = c.pk2
            )
            SELECT pk1, pk2, (ROUND(100.0 * inter / uni, 6) + 0.0) AS similarity
            FROM scored
            WHERE 100.0 * inter / uni >= 70.0
        """,
        "orders_rollup": """
            SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
            FROM orders
            GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
        "pivot_lineitem": """
            SELECT l_returnflag,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                        FILTER (l_linestatus = 'O') AS DOUBLE) AS qty_open,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
                        FILTER (l_linestatus = 'F') AS DOUBLE) AS qty_finished
            FROM lineitem GROUP BY l_returnflag
        """,
        "probe_search": """
            SELECT c_custkey, c_name,
                   COUNT(o_orderkey) AS n_orders,
                   COUNT(DISTINCT o_orderstatus) AS n_statuses
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            WHERE c_name LIKE '%42%' AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
            GROUP BY c_custkey, c_name
        """,
        "events_asof_join": """
            SELECT e.event_id, e.user_id,
                   epoch_us(e.ts) AS err_us,
                   epoch_us(c.ts) AS click_us
            FROM (SELECT * FROM events WHERE event_type = 'error') e
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON e.user_id = c.user_id AND c.ts <= e.ts
        """,
        "events_range_join": """
            SELECT a.user_id, a.event_id AS id1, b.event_id AS id2,
                   epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND epoch_us(b.ts) > epoch_us(a.ts)
             AND epoch_us(b.ts) - epoch_us(a.ts) <= 120000000
        """,
        "events_stream_interval_join": """
            SELECT l.user_id, l.event_id AS left_id, r.event_id AS right_id,
                   epoch_us(l.ts) - epoch_us(r.ts) AS us_before
            FROM events l JOIN events r
              ON l.user_id = r.user_id
             AND l.event_type = 'purchase' AND r.event_type = 'click'
             AND epoch_us(r.ts) >= epoch_us(l.ts) - 900000000
             AND epoch_us(r.ts) <= epoch_us(l.ts)
        """,
        "graph_weighted_paths": _weighted_paths_oracle(6),
        "graph_kcore": _kcore_oracle(3, 10),
        "doc_sections": """
            WITH s AS (
                SELECT doc_id,
                       unnest(string_split_regex(text, ' the ')) AS section_text,
                       generate_subscripts(string_split_regex(text, ' the '), 1) - 1
                           AS section_idx
                FROM documents
            )
            SELECT concat_ws('_', CAST(section_idx AS VARCHAR), CAST(doc_id AS VARCHAR))
                       AS section_pk,
                   section_idx, doc_id,
                   length(section_text) AS section_len
            FROM s
            WHERE length(trim(section_text)) >= 5
        """,
        "events_sliding_window": """
            WITH g AS (
                SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000) AS s1,
                       event_type, value
                FROM events
            ),
            w AS (
                SELECT unnest([s1, s1 - INTERVAL 30 MINUTE]) AS ws, event_type, value
                FROM g
            )
            SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
                   (ROUND(AVG(value), 4) + 0.0) AS avg_value
            FROM w GROUP BY ws, event_type
        """,
        "events_stream_tumbling": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   event_type, COUNT(*) AS n,
                   (ROUND(SUM(value), 4) + 0.0) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        "events_stream_dedup": """
            SELECT DISTINCT user_id, event_type FROM events
        """,
        # Streaming session windows: lag-based sessionization with the >=
        # boundary (F.session_window's window end is EXCLUSIVE: an event
        # exactly gap after its predecessor opens a new session).
        "events_stream_session": """
            WITH e AS (
                SELECT user_id, ts, event_id,
                       lag(ts) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev
                FROM events
            ),
            f AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN prev IS NULL
                                 OR ts >= prev + INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM e
            ),
            s AS (
                SELECT user_id, ts,
                       SUM(new_s) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING
                       ) AS sid
                FROM f
            )
            SELECT user_id,
                   strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   COUNT(*) AS n_events
            FROM s GROUP BY user_id, sid
        """,
        "tpch_q10_returned_revenue": """
            SELECT c_custkey, c_name, n_name, c_acctbal,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                        AS DECIMAL(38,8))) AS DOUBLE) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l_returnflag = 'R'
            GROUP BY c_custkey, c_name, n_name, c_acctbal
            ORDER BY revenue DESC, c_custkey ASC
            LIMIT 20
        """,
        "tpch_q14_promo_pct": """
            WITH agg AS (
                SELECT
                    CAST(SUM(CASE WHEN p_type = 'PROMO'
                        THEN CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                             * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                             AS DECIMAL(38,8))
                        ELSE CAST(0 AS DECIMAL(38,8)) END) AS DOUBLE) AS pr,
                    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                        AS DECIMAL(38,8))) AS DOUBLE) AS tr
                FROM lineitem JOIN part ON p_partkey = l_partkey
                WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
                  AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
            )
            SELECT (ROUND(100.0 * pr / tr, 6) + 0.0) AS promo_pct FROM agg
        """,
        "tpch_q19_disjunctive_join": """
            SELECT COUNT(*) AS n_items,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                        AS DECIMAL(38,8))) AS DOUBLE) AS revenue
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 5 AND 25)
               OR (p_brand = 'Brand#4' AND p_size BETWEEN 10 AND 30
                   AND l_quantity BETWEEN 10 AND 40)
        """,
        "tpch_q6_forecast_revenue": """
            SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                       * CAST(l_discount AS DECIMAL(18,4)) AS DECIMAL(38,8)))
                       AS DOUBLE) AS revenue
            FROM lineitem
            WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
              AND l_discount BETWEEN 0.03 AND 0.07
              AND l_quantity < 24
        """,
        "tpch_q13_order_distribution": """
            WITH per_cust AS (
                SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
                FROM customer c
                LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                                  AND o.o_orderpriority <> '1-URGENT'
                GROUP BY c.c_custkey
            )
            SELECT c_count, COUNT(*) AS custdist
            FROM per_cust
            GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "tpch_q16_supplier_cnt": """
            SELECT p_brand, p_type, p_size,
                   COUNT(DISTINCT l_suppkey) AS supplier_cnt
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_size IN (5, 10, 15, 20)
              AND l_suppkey NOT IN (
                  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY p_brand, p_type, p_size
            ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
            LIMIT 20
        """,
        "tpch_q21_sole_returner": """
            WITH l1 AS (
                SELECT l.l_orderkey, l.l_suppkey, l.l_returnflag
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                WHERE o.o_orderstatus = 'F'
            ),
            failed AS (
                SELECT DISTINCT l_orderkey, l_suppkey
                FROM l1 WHERE l_returnflag = 'R'
            )
            SELECT s.s_name, COUNT(*) AS numwait
            FROM failed f
            JOIN supplier s ON s.s_suppkey = f.l_suppkey
            WHERE EXISTS (
                    SELECT 1 FROM l1 x
                    WHERE x.l_orderkey = f.l_orderkey
                      AND x.l_suppkey <> f.l_suppkey)
              AND NOT EXISTS (
                    SELECT 1 FROM l1 y
                    WHERE y.l_orderkey = f.l_orderkey
                      AND y.l_suppkey <> f.l_suppkey
                      AND y.l_returnflag = 'R')
            GROUP BY s.s_name
            ORDER BY numwait DESC, s.s_name ASC
            LIMIT 20
        """,
        "tpch_q22_dormant_customers": """
            SELECT c_mktsegment, COUNT(*) AS numcust,
                   (ROUND(SUM(c_acctbal), 4) + 0.0) AS totacctbal
            FROM customer c
            WHERE c_acctbal > (
                    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                           / COUNT(*)
                    FROM customer WHERE c_acctbal > 0)
              AND NOT EXISTS (
                    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            GROUP BY c_mktsegment
            ORDER BY c_mktsegment
        """,
        "tpch_q7_volume_shipping": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                        AS DECIMAL(38,8))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
              AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
            GROUP BY 1, 2, 3
        """,
        "tpch_q8_market_share": """
            WITH vols AS (
                SELECT year(o_orderdate) AS o_year,
                       CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                            * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                            AS DECIMAL(38,8)) AS volume,
                       n1.n_name AS supp_nation
                FROM lineitem
                JOIN part     ON l_partkey = p_partkey
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
                JOIN region   ON n2.n_regionkey = r_regionkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
                  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01'
            )
            SELECT o_year,
                   ROUND(CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_3'
                                                THEN volume END),
                                       0) AS DOUBLE)
                         / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
            FROM vols GROUP BY o_year
        """,
        "tpch_q9_product_profit": """
            SELECT n_name AS nation, year(o_orderdate) AS o_year,
                   CAST(SUM(
                       CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                            * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                            AS DECIMAL(38,8))
                       - CAST(CAST(p_retailprice AS DECIMAL(12,4))
                              * CAST(l_quantity AS DECIMAL(12,4))
                              * CAST(0.5 AS DECIMAL(2,1))
                              AS DECIMAL(38,8))
                   ) AS DOUBLE) AS sum_profit
            FROM lineitem
            JOIN part     ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN orders   ON l_orderkey = o_orderkey
            WHERE p_type = 'PROMO'
            GROUP BY 1, 2
        """,
        "tpch_q11_important_stock": """
            WITH per_part AS (
                SELECT l_partkey,
                       SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                                AS DECIMAL(38,8))) AS value_dec
                FROM lineitem
                WHERE l_suppkey IN (
                    SELECT s_suppkey FROM supplier WHERE s_nationkey = 7)
                GROUP BY l_partkey
            )
            SELECT l_partkey AS ps_partkey,
                   CAST(value_dec AS DOUBLE) AS value
            FROM per_part
            WHERE CAST(value_dec AS DOUBLE) >
                  0.002 * (SELECT CAST(SUM(value_dec) AS DOUBLE) FROM per_part)
            ORDER BY value DESC, ps_partkey ASC
        """,
        "tpch_q15_top_supplier": """
            WITH revenue AS (
                SELECT l_suppkey AS supplier_no,
                       SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                            * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                            AS DECIMAL(38,8))) AS total_rev
                FROM lineitem
                WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
                GROUP BY l_suppkey
            )
            SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
            FROM revenue JOIN supplier ON supplier_no = s_suppkey
            WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
            ORDER BY s_suppkey
        """,
        "tpch_q2_min_cost_supplier": """
            WITH scoped AS (
                SELECT DISTINCT p_partkey, s_suppkey, s_name, s_acctbal, n_name
                FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
                JOIN part     ON l_partkey = p_partkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation   ON s_nationkey = n_nationkey
                JOIN region   ON n_regionkey = r_regionkey
                WHERE p_size = 15 AND r_name = 'EUROPE'
            )
            SELECT s_acctbal, s_name, n_name, p_partkey
            FROM scoped s
            WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM scoped m
                               WHERE m.p_partkey = s.p_partkey)
            ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
            LIMIT 20
        """,
        "tpch_q20_dominant_supplier": """
            WITH scoped AS (
                SELECT l_partkey, l_suppkey,
                       CAST(l_quantity AS DECIMAL(18,4)) AS q
                FROM lineitem
                JOIN part ON l_partkey = p_partkey
                WHERE p_type = 'PROMO'
                  AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
            ),
            per_supp_part AS (
                SELECT l_partkey, l_suppkey, SUM(q) AS sq
                FROM scoped GROUP BY l_partkey, l_suppkey
            ),
            per_part AS (
                SELECT l_partkey, SUM(sq) AS qtot
                FROM per_supp_part GROUP BY l_partkey
            ),
            dominant AS (
                SELECT DISTINCT s.l_suppkey
                FROM per_supp_part s JOIN per_part p USING (l_partkey)
                WHERE CAST(s.sq AS DOUBLE) > 0.5 * CAST(p.qtot AS DOUBLE)
            )
            SELECT s_name, n_name AS nation
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
            ORDER BY s_name
        """,
        "events_resample_1h": """
            WITH h AS (
                SELECT user_id, date_trunc('hour', ts) AS hr, value, ts, event_id
                FROM events WHERE event_type = 'purchase'
            ),
            b AS (SELECT user_id, MIN(hr) AS mn, MAX(hr) AS mx FROM h GROUP BY user_id),
            grid AS (
                SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
                FROM b
            ),
            obs AS (
                SELECT user_id, hr, value AS v FROM (
                    SELECT user_id, hr, value,
                           ROW_NUMBER() OVER (PARTITION BY user_id, hr
                               ORDER BY ts DESC, event_id DESC) AS rn
                    FROM h
                ) WHERE rn = 1
            )
            SELECT g.user_id,
                   strftime(g.hr, '%Y-%m-%d %H:%M:%S') AS hour,
                   last_value(o.v IGNORE NULLS) OVER (
                       PARTITION BY g.user_id ORDER BY g.hr
                       ROWS UNBOUNDED PRECEDING) AS value_ffill
            FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.hr = g.hr
        """,
        "events_stream_stateful": """
            SELECT user_id, COUNT(*) AS n_events,
                   (ROUND(SUM(value), 4) + 0.0) AS total_value
            FROM events GROUP BY user_id
        """,
        "approx_sketch_stats": """
            SELECT COUNT(DISTINCT user_id)::BIGINT AS nd_exact,
                   TRUE AS hll_ok, TRUE AS p50_ok
            FROM events
        """,
        "media_image_metadata": """
            SELECT doc_id AS media_id, 4 AS width, 4 AS height,
                   CAST(27 AS BIGINT) AS n_bytes,
                   ROUND(list_sum(list_transform(range(0, 16),
                       i -> ('0x' || substr(md5(text), (1 + 2*i)::INT, 2))::UBIGINT::BIGINT
                   ))::DOUBLE / 16.0, 6) AS mean_px
            FROM documents
        """,
        "doc_pair_measures": f"""
            WITH s AS (SELECT doc_id, {_DUCK_TOKIDSET} AS s FROM documents),
            p AS (
                SELECT a.doc_id AS pk1, b.doc_id AS pk2,
                       len(list_intersect(a.s, b.s))::DOUBLE AS i,
                       len(a.s)::DOUBLE AS sa, len(b.s)::DOUBLE AS sb
                FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
            )
            -- formulas restated from SimilarityMeasure.scala:78-165 /
            -- CustomizedMinHashLSH.scala:46-58 in the same operation order
            -- as functions/similarity.py so doubles agree bitwise
            SELECT pk1, pk2,
                   (ROUND(CASE WHEN least(sa, sb) = 0 THEN 0.0
                         WHEN greatest(sa, sb) / least(sa, sb) <= 5.0 THEN
                           CASE WHEN sa + sb - i > 0
                                THEN 100.0 * i / (sa + sb - i) ELSE 0.0 END
                         ELSE
                           CASE WHEN least(sa, sb)
                                     + (1.0 / (0.2 * (greatest(sa, sb) / least(sa, sb))))
                                       * (greatest(sa, sb) - i) > 0
                                THEN 100.0 * i
                                     / (least(sa, sb)
                                        + (1.0 / (0.2 * (greatest(sa, sb) / least(sa, sb))))
                                          * (greatest(sa, sb) - i))
                                ELSE 0.0 END
                         END, 6) + 0.0) AS weighted_jaccard,
                   (ROUND(CASE WHEN least(sa, sb) > 0
                              THEN 100.0 * i / least(sa, sb) ELSE 0.0 END, 6) + 0.0)
                       AS maxasym_jaccard,
                   (ROUND(CASE WHEN sa > 0 THEN 100.0 * i / sa ELSE 0.0 END, 6) + 0.0)
                       AS left_jaccard,
                   (ROUND(CASE WHEN sb > 0 THEN 100.0 * i / sb ELSE 0.0 END, 6) + 0.0)
                       AS right_jaccard,
                   (ROUND(1.0 - (CASE WHEN least(sa, sb) > 0
                                     THEN 100.0 * i / least(sa, sb)
                                     ELSE 0.0 END) / 100.0, 6) + 0.0)
                       AS min_one_sided_dist
            FROM p
        """,
        "tfidf_cosine_pairs": f"""
            WITH docs AS (SELECT doc_id, lang, source, n_chars, {_DUCK_TOKLIST} AS toks FROM documents),
            nn AS (SELECT COUNT(*) AS n FROM docs),
            terms AS (
                SELECT doc_id, unnest(toks) AS term FROM docs
            ),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
            dfq AS (
                SELECT term, COUNT(*) AS dfq FROM tf GROUP BY term
            ),
            w AS (
                SELECT tf.doc_id, tf.term,
                       tf.tf * ln((nn.n + 1.0) / (dfq.dfq + 1.0)) AS weight
                FROM tf JOIN dfq USING (term) CROSS JOIN nn
                WHERE 10 * dfq.dfq <= nn.n
            ),
            norms AS (SELECT doc_id, sqrt(SUM(weight * weight)) AS norm FROM w GROUP BY doc_id),
            meta AS (SELECT doc_id, lang, source, n_chars FROM docs),
            dots AS (
                SELECT w1.doc_id AS d1, w2.doc_id AS d2,
                       SUM(w1.weight * w2.weight) AS dot
                FROM w w1
                JOIN meta m1 ON m1.doc_id = w1.doc_id
                JOIN w w2 ON w1.term = w2.term AND w1.doc_id < w2.doc_id
                JOIN meta m2 ON m2.doc_id = w2.doc_id
                WHERE m1.lang = m2.lang AND m1.source <> m2.source
                  AND abs(m1.n_chars - m2.n_chars) / sqrt(m1.n_chars * m2.n_chars) < 0.26
                GROUP BY w1.doc_id, w2.doc_id
            )
            SELECT d1, d2, (ROUND(100.0 * dot / (n1.norm * n2.norm), 6) + 0.0) AS cosine100
            FROM dots JOIN norms n1 ON n1.doc_id = d1 JOIN norms n2 ON n2.doc_id = d2
            WHERE 100.0 * dot / (n1.norm * n2.norm) >= 60.0
        """,
        # Arrow grouped kernel: same floor-scaled int64 dot/norm arithmetic
        # as the Spark kernel (exact on both engines), then the identical
        # float64 cosine expression and threshold — bit-for-bit agreement
        # with numpy's matmul because every operand is an exact integer.
        "emb_arrow_block_cosine": """
            WITH q AS (
                SELECT label, vec_id,
                       list_transform(embedding,
                           x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0)
                                AS BIGINT)) AS qv
                FROM embeddings
            ),
            ex AS (
                SELECT label, vec_id, unnest(qv) AS val,
                       generate_subscripts(qv, 1) AS pos
                FROM q
            ),
            norms AS (
                SELECT label, vec_id, CAST(SUM(val * val) AS BIGINT) AS nrm
                FROM ex GROUP BY label, vec_id
            ),
            dots AS (
                SELECT a.label, a.vec_id AS id1, b.vec_id AS id2,
                       CAST(SUM(a.val * b.val) AS BIGINT) AS dot
                FROM ex a JOIN ex b
                  ON a.label = b.label AND a.pos = b.pos
                 AND a.vec_id < b.vec_id
                GROUP BY a.label, a.vec_id, b.vec_id
            )
            SELECT d.label, d.id1, d.id2,
                   (ROUND(CAST(d.dot AS DOUBLE)
                         / (sqrt(CAST(x.nrm AS DOUBLE))
                            * sqrt(CAST(y.nrm AS DOUBLE))), 6) + 0.0) AS cosine
            FROM dots d
            JOIN norms x ON x.label = d.label AND x.vec_id = d.id1
            JOIN norms y ON y.label = d.label AND y.vec_id = d.id2
            WHERE CAST(d.dot AS DOUBLE)
                  / (sqrt(CAST(x.nrm AS DOUBLE))
                     * sqrt(CAST(y.nrm AS DOUBLE))) >= 0.30
        """,
        "emb_lsh_ann": _emb_lsh_ann_oracle(),
        "emb_brp_euclidean_join": _emb_brp_oracle(),
        "graph_pagerank": _pagerank_oracle(3),
        "graph_pregel_walks": _pregel_walks_oracle(),
        "graph_weighted_pagerank": _weighted_pagerank_oracle(3),
        "doc_label_propagation": _label_propagation_oracle(4),
        "io_xml_roundtrip": _io_xml_roundtrip_oracle(),
        "graph_bfs_paths": _graph_bfs_paths_oracle(),
        "graph_cluster_audit": _graph_cluster_audit_oracle(4),
        "media_wav_audio_stats": _media_wav_audio_stats_oracle(),
        "doc_bm25_search": _doc_bm25_search_oracle(),
        "doc_lm_perplexity": _doc_lm_perplexity_oracle(),
        "doc_dsir_select": _doc_dsir_select_oracle(),
        "doc_substring_dup": _doc_substring_dup_oracle(),
        "emb_semantic_dedup": _emb_semantic_dedup_oracle(),
        "graph_triangle_count": f"""
            WITH {edge_cte},
            tri AS (
                SELECT e1.d1 AS a, e1.d2 AS b, e2.d2 AS c
                FROM ed e1 JOIN ed e2 ON e1.d2 = e2.d1
                JOIN ed e3 ON e3.d1 = e1.d1 AND e3.d2 = e2.d2
            ),
            tv AS (
                SELECT a AS id FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri
            )
            SELECT id, COUNT(*) AS count FROM tv GROUP BY id
        """,
        # Open-triangle motif: wedges a-b-c (a<c once) missing the closing
        # canonical edge (ed is d1<d2 distinct), per-center clustering
        # profile. Pure integer cells + one 6-decimal ratio.
        "graph_open_triangles": f"""
            WITH {edge_cte},
            deg AS (SELECT s AS id, COUNT(*) AS deg FROM und GROUP BY s),
            wed AS (SELECT e1.d AS a, e1.s AS b, e2.d AS c
                    FROM und e1 JOIN und e2
                      ON e1.s = e2.s AND e1.d < e2.d),
            opn AS (SELECT w.b, COUNT(*) AS n_open
                    FROM wed w LEFT JOIN ed
                      ON ed.d1 = w.a AND ed.d2 = w.c
                    WHERE ed.d1 IS NULL GROUP BY w.b)
            SELECT d.id,
                   CAST(d.deg * (d.deg - 1) // 2 AS BIGINT) AS n_wedges,
                   COALESCE(o.n_open, 0) AS n_open,
                   CAST(d.deg * (d.deg - 1) // 2 AS BIGINT)
                       - COALESCE(o.n_open, 0) AS n_closed,
                   CASE WHEN d.deg > 1 THEN (ROUND(
                       (CAST(d.deg * (d.deg - 1) // 2 AS DOUBLE)
                        - COALESCE(o.n_open, 0))
                       / (d.deg * (d.deg - 1) // 2), 6) + 0.0)
                   ELSE 0.0 END AS clustering_coeff
            FROM deg d LEFT JOIN opn o ON o.b = d.id
        """,
        "graph_shortest_paths": f"""
            WITH RECURSIVE {edge_cte},
            lms AS (SELECT DISTINCT d1 AS l FROM ed ORDER BY d1 LIMIT 2),
            bfs(id, landmark, d) AS (
                SELECT l, l, 0 FROM lms
                UNION
                SELECT u.d, b.landmark, b.d + 1
                FROM bfs b JOIN und u ON u.s = b.id
                WHERE b.d < 6
            )
            SELECT id, landmark, MIN(d) AS distance
            FROM bfs GROUP BY id, landmark
        """,
        "doc_hash_sample": """
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT % 100 < 10
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
            FROM documents GROUP BY lang
        """,
        "doc_dup_clusters": f"""
            WITH RECURSIVE {edge_cte},
            reach(a, b) AS (
                SELECT id, id FROM verts
                UNION
                SELECT r.a, u.d FROM reach r JOIN und u ON u.s = r.b
            )
            SELECT a AS id, MIN(b) AS component FROM reach GROUP BY a
        """,
        # Dedup apply: same reachability components; keep = singleton or
        # cluster-min; the kept SET is verified per lang by an order-free
        # ARITHMETIC set checksum (sum + bit_xor over md5(doc_id)-derived
        # 60-bit ints, sum terms mod 1e9+7) — r9 replacement for the
        # string_agg-ORDER-BY md5, the last cell with any list/ordering/
        # collation semantics; pure integer arithmetic is bit-identical
        # on every Spark and DuckDB build. kept_id_sum stays to localize.
        "doc_dedup_rewrite": f"""
            WITH RECURSIVE {edge_cte},
            reach(a, b) AS (
                SELECT id, id FROM verts
                UNION
                SELECT r.a, u.d FROM reach r JOIN und u ON u.s = r.b
            ),
            comp AS (SELECT a AS id, MIN(b) AS component FROM reach GROUP BY a),
            k AS (
                SELECT d.doc_id, d.lang,
                       CASE WHEN c.component IS NULL
                                 OR c.component = d.doc_id
                            THEN 1 ELSE 0 END AS keep,
                       ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
                           ::UBIGINT::BIGINT AS chk
                FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
            )
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(keep) AS BIGINT) AS n_kept,
                   CAST(COUNT(*) - SUM(keep) AS BIGINT) AS n_dropped,
                   CAST(SUM(CASE WHEN keep = 1 THEN doc_id END) AS BIGINT)
                       AS kept_id_sum,
                   CAST(COALESCE(SUM(CASE WHEN keep = 1
                                          THEN chk % 1000000007 END), 0)
                        AS BIGINT) AS kept_chk_sum,
                   COALESCE(bit_xor(CASE WHEN keep = 1 THEN chk END), 0)
                       AS kept_chk_xor
            FROM k GROUP BY lang
        """,
        "emb_vector_sum_by_label": """
            WITH ex AS (
                SELECT label,
                       unnest(embedding::DOUBLE[]) AS val,
                       generate_subscripts(embedding, 1) - 1 AS pos
                FROM embeddings
            )
            SELECT label, pos, (ROUND(SUM(val), 6) + 0.0) AS elem_sum
            FROM ex GROUP BY label, pos
        """,
        "tpch_q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                        AS DECIMAL(38,8))) AS DOUBLE) AS sum_disc_price,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q3_shipping_priority": """
            SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                        AS DECIMAL(38,8))) AS DOUBLE) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
              AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey ASC
            LIMIT 10
        """,
        "tpch_q4_exists": """
            SELECT o_orderpriority, COUNT(*) AS order_count
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
            GROUP BY o_orderpriority
        """,
        "tpch_q12_case_agg": """
            SELECT l_returnflag,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l_returnflag
        """,
        "tpch_q17_correlated_avg": """
            WITH pa AS (
                SELECT l_partkey AS pk,
                       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
                           / COUNT(*) AS aq
                FROM lineitem GROUP BY l_partkey
            )
            SELECT COUNT(*) AS n_small,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
                       AS sum_price
            FROM lineitem JOIN pa ON l_partkey = pa.pk
            WHERE l_quantity < 0.5 * aq
        """,
        "tpch_q18_having_in": """
            WITH big AS (
                SELECT l_orderkey AS o_orderkey,
                       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty
                FROM lineitem GROUP BY l_orderkey
                HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) > 150
            )
            SELECT c_custkey, c_name, o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, qty
            FROM orders JOIN big USING (o_orderkey)
            JOIN customer ON o_custkey = c_custkey
        """,
        "tpch_q5_local_supplier": """
            SELECT n_name,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                        AS DECIMAL(38,8))) AS DOUBLE) AS revenue
            FROM region
            JOIN nation   ON r_regionkey = n_regionkey
            JOIN customer ON c_nationkey = n_nationkey
            JOIN orders   ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
            WHERE r_name = 'REGION_0'
            GROUP BY n_name
        """,
        "set_ops_union_intersect_except": """
            WITH building AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
                 big AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 300000)
            SELECT k, 'union' AS op FROM (SELECT k FROM building UNION SELECT k FROM big)
            UNION ALL
            SELECT k, 'intersect' AS op FROM (SELECT k FROM building INTERSECT SELECT k FROM big)
            UNION ALL
            SELECT k, 'except' AS op FROM (SELECT k FROM building EXCEPT SELECT k FROM big)
        """,
        "semi_anti_join": """
            SELECT c_custkey, 'has_orders' AS kind FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            UNION ALL
            SELECT c_custkey, 'no_orders' AS kind FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "window_running_sum": """
            SELECT o_custkey, o_orderkey,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                        OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate ASC, o_orderkey ASC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS DOUBLE) AS running_total
            FROM orders
        """,
        "latest_order_per_customer": """
            SELECT o_custkey, o_orderkey AS latest_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS latest_date
            FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                FROM orders
            ) WHERE rn = 1
        """,
        "events_tumbling_window": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   event_type, COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        "events_sessionization": """
            WITH ev AS (
                SELECT user_id, event_id, epoch_us(ts) AS us FROM events
            ),
            flagged AS (
                SELECT user_id, event_id, us,
                       CASE WHEN us - LAG(us) OVER w IS NULL
                              OR us - LAG(us) OVER w > 1800 * 1000000
                            THEN 1 ELSE 0 END AS new_sess
                FROM ev
                WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
            ),
            sess AS (
                SELECT user_id, us,
                       CAST(SUM(new_sess) OVER (PARTITION BY user_id
                                           ORDER BY us ASC, event_id ASC
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           AS BIGINT) AS session_id
                FROM flagged
            )
            SELECT user_id, session_id, COUNT(*) AS n_events,
                   MAX(us) - MIN(us) AS duration_us
            FROM sess GROUP BY user_id, session_id
        """,
        "histogram_events_value": """
            SELECT CAST(FLOOR(value / 25.0) AS BIGINT) AS bucket, COUNT(*) AS n
            FROM events GROUP BY 1
        """,
        "descriptive_stats": """
            SELECT event_type, COUNT(*) AS n,
                   (ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) + 0.0) AS mean_value,
                   (ROUND(stddev_samp(value), 6) + 0.0) AS sd_value,
                   MIN(value) AS min_value,
                   MAX(value) AS max_value
            FROM events GROUP BY event_type
        """,
        "pearson_corr": """
            SELECT (ROUND(corr(l_quantity, l_extendedprice), 6) + 0.0) AS corr_qty_price,
                   (ROUND(corr(l_discount, l_tax), 6) + 0.0) AS corr_disc_tax
            FROM lineitem
        """,
        "scalar_functions": """
            SELECT p_partkey,
                   upper(p_name) AS uname,
                   length(p_name) AS name_len,
                   substring(p_name, 1, 4) AS prefix,
                   concat_ws('-', p_brand, p_type) AS brand_type,
                   replace(p_brand, 'Brand#', 'B') AS brand_short,
                   p_size % 7 AS size_mod,
                   (ROUND(p_retailprice * 1.1, 2) + 0.0) AS markup,
                   CASE WHEN p_size > 25 THEN 'large'
                        WHEN p_size > 10 THEN 'medium'
                        ELSE 'small' END AS size_class
            FROM part
        """,
        "doc_5gram_wordcount": """
            WITH toks AS (
                SELECT list_filter(string_split(
                           regexp_replace(lower(text), '[0-9,:;?!.]', '', 'g'), ' '),
                           x -> x <> '') AS t
                FROM documents
            ),
            grams AS (
                SELECT unnest(list_transform(range(1, len(t) - 3),
                              i -> array_to_string(t[i:i+4], ' '))) AS gram
                FROM toks
            )
            SELECT gram, COUNT(*) AS n
            FROM grams GROUP BY gram
            ORDER BY n DESC, gram ASC
            LIMIT 20
        """,
        "window_topn_orders_per_customer": """
            SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders
            ) WHERE rn <= 3
        """,
        "events_json_agg": """
            SELECT event_type,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                        AS BIGINT) AS sum_k
            FROM events
            GROUP BY event_type
        """,
        "doc_near_dup_jaccard": f"""
            WITH {_banded_pairs_cte(_DUCK_TOKIDSET)}
            SELECT d1 AS doc1, d2 AS doc2,
                   (ROUND(100.0 * inter / uni, 6) + 0.0) AS similarity
            FROM scored
            WHERE 100.0 * inter / uni >= 90.0
            ORDER BY 100.0 * inter / uni DESC, d1 ASC, d2 ASC
            LIMIT 200
        """,
        "doc_exact_dedup": """
            SELECT md5(lower(text)) AS fp, MIN(doc_id) AS keeper_id, COUNT(*) AS dups
            FROM documents
            GROUP BY md5(lower(text))
            HAVING COUNT(*) > 1
        """,
        "emb_ivf_ann": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS recall_ok
            FROM embeddings WHERE vec_id < 10
        """,
        "emb_pq_ann": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
                   TRUE AS per_query_k_ok, TRUE AS recall_ok, TRUE AS range_ok
            FROM embeddings WHERE vec_id < 10
        """,
        "pair_space_accounting": """
            WITH per AS (
                SELECT lang || '|' || source AS blk, COUNT(*) AS n
                FROM documents GROUP BY 1
            ),
            t AS (SELECT COUNT(*) AS n_total FROM documents)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
                   CAST(SUM(n * (n - 1) / 2) AS BIGINT) AS blocked_pairs,
                   CAST((SELECT n_total * (n_total - 1) / 2 FROM t) AS BIGINT)
                       AS unblocked_pairs,
                   (ROUND((SELECT n_total * (n_total - 1) / 2 FROM t)
                         / SUM(n * (n - 1) / 2), 6) + 0.0) AS reduction_ratio
            FROM per
        """,
        "emb_cosine_topk": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
            scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       (ROUND(list_dot_product(q.qv, e.v) /
                             (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))),
                             6) + 0.0) AS cos_sim
                FROM e JOIN q ON e.vec_id <> q.query_id
            )
            SELECT query_id, neighbor_id, cos_sim, rk FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                             ORDER BY cos_sim DESC, neighbor_id ASC) AS rk
                FROM scored
            ) WHERE rk <= 5
        """,
        "emb_vector_measures": """
            WITH q AS (
                SELECT vec_id, list_transform(embedding::DOUBLE[], x -> round(x, 1)) AS v
                FROM embeddings
            ),
            pairs AS (
                SELECT a.vec_id AS id1, b.vec_id AS id2, a.v AS v1, b.v AS v2
                FROM q a JOIN q b ON b.vec_id = a.vec_id + 1
                WHERE a.vec_id < 32 AND b.vec_id <= 32
            )
            SELECT id1, id2,
                (ROUND(100.0 / (1.0 + list_sum(list_transform(generate_series(1, len(v1)),
                      i -> abs(v1[i] - v2[i])))), 6) + 0.0) AS manhattan,
                (ROUND(100.0 / (1.0 + list_sum(list_transform(generate_series(1, len(v1)),
                      i -> CASE WHEN v1[i] <> v2[i] THEN 1.0 ELSE 0.0 END))), 6) + 0.0) AS hamming,
                (ROUND(100.0 * (len(v1) - list_sum(list_transform(generate_series(1, len(v1)),
                      i -> CASE WHEN v1[i] <> v2[i] THEN 1.0 ELSE 0.0 END))) / len(v1), 6) + 0.0)
                      AS densejaccard
            FROM pairs
        """,
    }


def _doc_keyness_g2_oracle() -> str:
    """Oracle for the (unregistered) G2 keyness query: same tokenizer
    mirror, same 2-cell signed log-likelihood with the 0-count cells
    contributing 0, expected counts as integer-product / integer-total
    double divisions written operand-for-operand like the engine,
    round(6)+0.0 fold on g2 (the 2-cell form can go tiny-negative),
    integer cross-multiplied key_slice, (g2 DESC, term ASC) LIMIT 50."""
    return f"""
        WITH toks AS (
            SELECT unnest({_DUCK_TOKLIST}) AS term,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS in_t
            FROM documents
        ),
        cnt AS (
            SELECT term,
                   CAST(SUM(in_t) AS BIGINT) AS n_target,
                   CAST(COUNT(*) - SUM(in_t) AS BIGINT) AS n_rest
            FROM toks GROUP BY term
        ),
        tot AS (
            SELECT CAST(SUM(in_t) AS BIGINT) AS n1,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM toks
        )
        SELECT term, n_target, n_rest,
               (ROUND(2.0 * (
                   CASE WHEN n_target > 0
                        THEN CAST(n_target AS DOUBLE)
                             * ln(CAST(n_target AS DOUBLE)
                                  / ((n_target + n_rest) * n1 / n))
                        ELSE 0.0 END
                 + CASE WHEN n_rest > 0
                        THEN CAST(n_rest AS DOUBLE)
                             * ln(CAST(n_rest AS DOUBLE)
                                  / ((n_target + n_rest) * (n - n1) / n))
                        ELSE 0.0 END
               ), 6) + 0.0) AS g2,
               CASE WHEN n_target * (n - n1) > n_rest * n1
                    THEN 'target' ELSE 'rest' END AS key_slice
        FROM cnt, tot
        WHERE n_target + n_rest >= 5
        ORDER BY g2 DESC, term ASC
        LIMIT 50
    """


def _events_value_ks_oracle() -> str:
    """Oracle for the (unregistered) two-sample KS query: per-value
    integer counts, cumulative window over values ascending, ECDF
    divisions operand-for-operand like the engine (CAST ... AS DOUBLE /
    BIGINT total), round(6) ks_d as the order key (abs >= 0, no
    signed-zero fold needed), (ks_d DESC, at_value ASC) LIMIT 1.
    NULL values filtered like the operator (Spark window-sorts NULLS
    FIRST, DuckDB NULLS LAST — an unfiltered NULL would step the ECDF
    at opposite ends)."""
    return """
        WITH s AS (
            SELECT value AS v,
                   CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
            FROM events
            WHERE event_type IN ('click', 'purchase')
              AND value IS NOT NULL
        ),
        tot AS (
            SELECT CAST(SUM(ia) AS BIGINT) AS na,
                   CAST(COUNT(*) - SUM(ia) AS BIGINT) AS nb
            FROM s
        ),
        per AS (
            SELECT v,
                   CAST(SUM(ia) AS BIGINT) AS ca,
                   CAST(COUNT(*) - SUM(ia) AS BIGINT) AS cb
            FROM s GROUP BY v
        ),
        ec AS (
            SELECT v,
                   SUM(ca) OVER (ORDER BY v ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cca,
                   SUM(cb) OVER (ORDER BY v ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ccb
            FROM per
        )
        SELECT na AS n_a, nb AS n_b,
               ROUND(abs(CAST(cca AS DOUBLE) / na
                         - CAST(ccb AS DOUBLE) / nb), 6) AS ks_d,
               v AS at_value
        FROM ec, tot
        ORDER BY ks_d DESC, at_value ASC
        LIMIT 1
    """


def _events_burstiness_oracle() -> str:
    """Oracle for the (unregistered) burstiness query: same (type, user,
    ts, event_id) lag gaps in epoch micros, DECIMAL(19,0)-operand gap sums (18 overflows int64 on the square, 38x38 exceeds the width cap)
    (g*g cast-before-multiply like the engine), one CAST AS DOUBLE per
    sum, the variance expression operand-for-operand with the
    greatest(·, 0.0) clamp, round(6) outputs and a +0.0 fold on the
    signed burstiness."""
    return """
        WITH g AS (
            SELECT event_type,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY event_type, user_id
                       ORDER BY epoch_us(ts) ASC, event_id ASC
                   ) AS gap
            FROM events
        ),
        agg AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_gaps,
                   CAST(SUM(CAST(gap AS DECIMAL(19,0))) AS DOUBLE) AS s1,
                   CAST(SUM(CAST(gap AS DECIMAL(19,0))
                            * CAST(gap AS DECIMAL(19,0))) AS DOUBLE) AS s2
            FROM g WHERE gap IS NOT NULL
            GROUP BY event_type
        ),
        m AS (
            SELECT event_type, n_gaps,
                   s1 / CAST(n_gaps AS DOUBLE) AS mu,
                   sqrt(greatest(
                       (CAST(n_gaps AS DOUBLE) * s2 - s1 * s1)
                       / (CAST(n_gaps AS DOUBLE)
                          * (CAST(n_gaps AS DOUBLE) - 1.0)),
                       0.0)) AS sigma
            FROM agg WHERE n_gaps >= 2
        )
        SELECT event_type, n_gaps,
               ROUND(mu, 6) AS mean_gap_us,
               ROUND(sigma / mu, 6) AS cv_gap,
               (ROUND((sigma - mu) / (sigma + mu), 6) + 0.0) AS burstiness
        FROM m
    """


def _doc_chi2_lang_source_oracle() -> str:
    """Oracle for the (unregistered) chi-squared query: same closed-form
    zero-cell remainder (part + (n - Σ_occupied e)), expected counts as
    integer-product / integer-n double divisions operand-for-operand,
    cramers_v from the UNROUNDED raw sum, round(6) once at the end."""
    return """
        WITH o AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
            FROM documents GROUP BY lang, source
        ),
        ra AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS ta FROM o GROUP BY lang),
        rb AS (SELECT source, CAST(SUM(o) AS BIGINT) AS tb FROM o GROUP BY source),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT lang) AS BIGINT) AS r,
                   CAST(COUNT(DISTINCT source) AS BIGINT) AS c
            FROM documents
        ),
        cells AS (
            SELECT (CAST(o.o AS DOUBLE) - (ra.ta * rb.tb / tot.n))
                   * (CAST(o.o AS DOUBLE) - (ra.ta * rb.tb / tot.n))
                   / (ra.ta * rb.tb / tot.n) AS contrib,
                   (ra.ta * rb.tb / tot.n) AS e
            FROM o JOIN ra USING (lang) JOIN rb USING (source), tot
        ),
        s AS (
            SELECT SUM(contrib) AS p, SUM(e) AS es,
                   CAST(COUNT(*) AS BIGINT) AS nc
            FROM cells
        )
        SELECT ROUND(s.p + (CAST(tot.n AS DOUBLE) - s.es), 6) AS chi2,
               CAST((tot.r - 1) * (tot.c - 1) AS BIGINT) AS dof,
               ROUND(sqrt((s.p + (CAST(tot.n AS DOUBLE) - s.es))
                          / CAST(tot.n * least(tot.r - 1, tot.c - 1)
                                 AS DOUBLE)), 6) AS cramers_v,
               tot.n AS n_rows,
               s.nc AS n_cells_occupied
        FROM s, tot
    """


def _nation_revenue_theil_oracle() -> str:
    """Oracle for the (unregistered) Theil query: the gini row's rev CTE
    verbatim, per-nation (X, n) totals CTE, the Theil term mirrored
    operand-for-operand with the 0-value guard, round(6)+0.0."""
    return """
    WITH rev AS (
        SELECT o_custkey, round(SUM(o_totalprice), 6) AS x
        FROM orders GROUP BY o_custkey
    ),
    j AS (
        SELECT n.n_name, rev.x
        FROM rev
        JOIN customer c ON c.c_custkey = rev.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    tot AS (
        SELECT n_name, SUM(x) AS sx, CAST(COUNT(*) AS DOUBLE) AS nn
        FROM j GROUP BY n_name
    )
    SELECT j.n_name AS n_name,
           CAST(COUNT(*) AS BIGINT) AS n,
           (ROUND(SUM(CASE WHEN j.x > 0
                           THEN (j.x / t.sx) * ln(j.x * t.nn / t.sx)
                           ELSE 0.0 END), 6) + 0.0) AS theil
    FROM j JOIN tot t USING (n_name)
    GROUP BY j.n_name"""


def _orders_benford_digits_oracle() -> str:
    """Oracle for the (unregistered) Benford query: same [1, 10^7)
    plain-notation window, first char of the double's shortest
    round-trip string form (identical for identical bits on both
    engines inside the window), one 9-row count, expectations computed
    as ln(1+1/d)/ln(10) — never pasted — round(6) with a +0.0 fold on
    the signed dev."""
    return """
        WITH d AS (
            SELECT substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS digit
            FROM orders
            WHERE o_totalprice >= 1 AND o_totalprice < 10000000
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM d)
        SELECT digit,
               CAST(count(*) AS BIGINT) AS n,
               ROUND(CAST(count(*) AS DOUBLE) / CAST(nn AS DOUBLE), 6)
                   AS share,
               ROUND(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0), 6)
                   AS benford_p,
               (ROUND(CAST(count(*) AS DOUBLE) / CAST(nn AS DOUBLE)
                      - ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0), 6)
                + 0.0) AS dev
        FROM d, tot
        GROUP BY digit, nn
    """


def _events_hourly_acf_oracle() -> str:
    """Oracle for the (unregistered) hourly-acf query: hour ids via
    floor of the same double division (never a bare int cast — DuckDB
    CAST(double AS BIGINT) ROUNDS while Spark truncates), adjacent-hour
    lead pairs, the five Pearson sums on DECIMAL(19,0) operands
    (burstiness precedent), covariance/variances operand-for-operand
    with the greatest clamp, round(6)+0.0, same definedness filter."""
    return """
        WITH per AS (
            SELECT event_type,
                   CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS h,
                   CAST(count(*) AS BIGINT) AS x
            FROM events
            GROUP BY event_type, CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT)
        ),
        pairs AS (
            SELECT event_type, h, x,
                   lead(h) OVER (PARTITION BY event_type ORDER BY h) AS h2,
                   lead(x) OVER (PARTITION BY event_type ORDER BY h) AS y
            FROM per
        ),
        p2 AS (SELECT event_type, x, y FROM pairs WHERE h2 = h + 1),
        agg AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(x AS DECIMAL(19,0))
                            * CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS sxy,
                   CAST(SUM(CAST(x AS DECIMAL(19,0))
                            * CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(y AS DECIMAL(19,0))
                            * CAST(y AS DECIMAL(19,0))) AS DOUBLE) AS syy
            FROM p2 GROUP BY event_type
        ),
        m AS (
            SELECT event_type, n_pairs,
                   CAST(n_pairs AS DOUBLE) * sxy - sx * sy AS cov,
                   greatest(CAST(n_pairs AS DOUBLE) * sxx - sx * sx, 0.0) AS vx,
                   greatest(CAST(n_pairs AS DOUBLE) * syy - sy * sy, 0.0) AS vy
            FROM agg
        )
        SELECT event_type, n_pairs,
               (ROUND(cov / (sqrt(vx) * sqrt(vy)), 6) + 0.0) AS acf1
        FROM m WHERE n_pairs >= 2 AND vx > 0 AND vy > 0
    """


def _nation_supplier_hhi_oracle() -> str:
    """Oracle for the (unregistered) HHI query: per-supplier revenue via
    the tpch_q1/q10 exact-DECIMAL discounted-price sum (DECIMAL(18,4)
    operands widened to DECIMAL(38,8), ONE cast to double per
    supplier), HHI as sum-of-squares over squared-total so shares never
    materialize, round(6), zero-total guard."""
    return """
        WITH srev AS (
            SELECT l_suppkey,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                        AS DECIMAL(38,8))) AS DOUBLE) AS revenue
            FROM lineitem GROUP BY l_suppkey
        ),
        j AS (
            SELECT n.n_name, srev.revenue
            FROM srev
            JOIN supplier s ON s.s_suppkey = srev.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
        ),
        agg AS (
            SELECT n_name,
                   CAST(count(*) AS BIGINT) AS n,
                   SUM(revenue) AS s,
                   SUM(revenue * revenue) AS s2,
                   MAX(revenue) AS mx
            FROM j GROUP BY n_name
        )
        SELECT n_name, n,
               ROUND(s2 / (s * s), 6) AS hhi,
               ROUND(mx / s, 6) AS top_share
        FROM agg WHERE s > 0
    """


def _events_mannwhitney_oracle() -> str:
    """Oracle for the (unregistered) Mann-Whitney query: same NULL/type
    filter and per-value counts as the KS oracle, U in the
    pair-counting form (exact dyadic doubles — no rounding on u_a),
    tie-corrected z mirrored operand-for-operand ((na*nb/12) *
    ((n+1) - tt/(n*(n-1))), greatest clamp, sqrt, round(6)+0.0), the
    sigma>0 definedness filter."""
    return """
        WITH s AS (
            SELECT value AS v,
                   CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
            FROM events
            WHERE event_type IN ('click', 'purchase')
              AND value IS NOT NULL
        ),
        tot AS (
            SELECT CAST(SUM(ia) AS BIGINT) AS na,
                   CAST(COUNT(*) - SUM(ia) AS BIGINT) AS nb
            FROM s
        ),
        per AS (
            SELECT v,
                   CAST(SUM(ia) AS BIGINT) AS ca,
                   CAST(COUNT(*) - SUM(ia) AS BIGINT) AS cb
            FROM s GROUP BY v
        ),
        ec AS (
            SELECT v, ca, cb,
                   SUM(cb) OVER (ORDER BY v ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - cb AS cb_below,
                   ca + cb AS t
            FROM per
        ),
        agg AS (
            SELECT SUM(CAST(ca AS DOUBLE) * CAST(cb_below AS DOUBLE)
                       + CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE) / 2.0) AS u,
                   SUM(CAST(t AS DOUBLE) * CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
                       - CAST(t AS DOUBLE)) AS tt
            FROM ec
        ),
        m AS (
            SELECT u,
                   CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0 AS mu,
                   sqrt(greatest(
                       CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0
                       * (CAST(na + nb + 1 AS DOUBLE)
                          - tt / (CAST(na + nb AS DOUBLE)
                                  * CAST(na + nb - 1 AS DOUBLE))),
                       0.0)) AS sigma,
                   na, nb
            FROM agg, tot
        )
        SELECT na AS n_a, nb AS n_b, u AS u_a,
               (ROUND((u - mu) / sigma, 6) + 0.0) AS z
        FROM m WHERE sigma > 0
    """


def _customer_order_spearman_oracle() -> str:
    """Oracle for the (unregistered) Spearman query: same per-customer
    (count, rounded-revenue) base, average ranks as
    rank() + (tie-count - 1)/2 via the same two window functions, the
    five Pearson sums over exact dyadic half-integer ranks, the
    variance clamp and definedness filter, round(6)+0.0."""
    return """
        WITH per AS (
            SELECT o_custkey,
                   CAST(COUNT(*) AS BIGINT) AS x,
                   round(SUM(o_totalprice), 6) AS y
            FROM orders GROUP BY o_custkey
        ),
        r AS (
            SELECT (CAST(rank() OVER (ORDER BY x ASC) AS DOUBLE)
                    + (CAST(COUNT(*) OVER (PARTITION BY x) AS DOUBLE) - 1.0)
                      / 2.0) AS rx,
                   (CAST(rank() OVER (ORDER BY y ASC) AS DOUBLE)
                    + (CAST(COUNT(*) OVER (PARTITION BY y) AS DOUBLE) - 1.0)
                      / 2.0) AS ry
            FROM per
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(rx) AS sx, SUM(ry) AS sy,
                   SUM(rx * ry) AS sxy,
                   SUM(rx * rx) AS sxx,
                   SUM(ry * ry) AS syy
            FROM r
        ),
        m AS (
            SELECT n,
                   CAST(n AS DOUBLE) * sxy - sx * sy AS cov,
                   greatest(CAST(n AS DOUBLE) * sxx - sx * sx, 0.0) AS vx,
                   greatest(CAST(n AS DOUBLE) * syy - sy * sy, 0.0) AS vy
            FROM agg
        )
        SELECT n, (ROUND(cov / (sqrt(vx) * sqrt(vy)), 6) + 0.0) AS rho
        FROM m WHERE n >= 2 AND vx > 0 AND vy > 0
    """


def _doc_cms_heavy_hitters_oracle() -> str:
    """Oracle for the (unregistered) Count-Min query: identical
    md5->int60 row hashes ('cms<j>:<term>', house primitive), identical
    4x256 counter table via one GROUP BY, exact top-15 term counts with
    the (cnt DESC, term) tie rule, estimate = min over the 4 matching
    counters — every value an exact integer, so the whole row
    hash-compares with no rounding at all."""
    return f"""
        WITH toks AS (
            SELECT unnest({_DUCK_TOKLIST}) AS term FROM documents
        ),
        hashed AS (
            SELECT term, j,
                   CAST(('0x' || substr(md5('cms' || CAST(j AS VARCHAR)
                                             || ':' || term), 1, 15))
                        AS UBIGINT)::BIGINT % 256 AS bucket
            FROM toks, (SELECT unnest([0, 1, 2, 3]) AS j)
        ),
        counters AS (
            SELECT j, bucket, CAST(count(*) AS BIGINT) AS c
            FROM hashed GROUP BY j, bucket
        ),
        top AS (
            SELECT term, CAST(count(*) AS BIGINT) AS cnt_exact
            FROM toks GROUP BY term
            ORDER BY cnt_exact DESC, term ASC LIMIT 15
        )
        SELECT t.term, t.cnt_exact,
               min(c.c) AS cnt_est,
               min(c.c) - t.cnt_exact AS overestimate
        FROM top t
        JOIN counters c
          ON c.bucket = CAST(('0x' || substr(md5('cms' || CAST(c.j AS VARCHAR)
                                                  || ':' || t.term), 1, 15))
                             AS UBIGINT)::BIGINT % 256
        GROUP BY t.term, t.cnt_exact
    """


def _events_kruskal_wallis_oracle() -> str:
    """Oracle for the (unregistered) Kruskal-Wallis query: per-value
    integer counts, average ranks as cum_below + (cv+1)/2 (exact dyadic
    halves — the MWU/spearman class), R_g sums of exact products, the
    MWU integer tie mass, H and the tie-corrected H mirrored
    operand-for-operand with round(6)+0.0, the k>=2 / n>=2 / C<>0
    definedness filters matching the Spark guards."""
    return """
        WITH s AS (
            SELECT value AS v, event_type AS g FROM events
            WHERE value IS NOT NULL AND event_type IS NOT NULL
        ),
        pvg AS (
            SELECT v, g, CAST(count(*) AS BIGINT) AS c FROM s GROUP BY v, g
        ),
        pv AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM pvg GROUP BY v),
        pr AS (
            SELECT v, cv,
                   CAST(sum(cv) OVER (ORDER BY v ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        - cv AS DOUBLE)
                   + (CAST(cv AS DOUBLE) + 1.0) / 2.0 AS rv
            FROM pv
        ),
        pg AS (
            SELECT g, sum(CAST(c AS DOUBLE) * rv) AS rg,
                   CAST(sum(c) AS BIGINT) AS ng
            FROM pvg JOIN pr USING (v) GROUP BY g
        ),
        tt AS (
            SELECT sum(CAST(cv AS DOUBLE) * CAST(cv AS DOUBLE)
                       * CAST(cv AS DOUBLE) - CAST(cv AS DOUBLE)) AS t
            FROM pv
        ),
        tot AS (
            SELECT CAST(count(*) AS BIGINT) AS k,
                   CAST(sum(ng) AS BIGINT) AS n,
                   sum(rg * rg / CAST(ng AS DOUBLE)) AS srr
            FROM pg
        )
        SELECT k, n,
               (ROUND(12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                      * srr - 3.0 * (CAST(n AS DOUBLE) + 1.0), 6)
                + 0.0) AS h,
               (ROUND((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))
                       * srr - 3.0 * (CAST(n AS DOUBLE) + 1.0))
                      / (1.0 - t / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                                    * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))),
                      6)
                + 0.0) AS h_tie_corrected
        FROM tot, tt
        WHERE k >= 2 AND n >= 2
          AND (1.0 - t / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                          * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))) <> 0.0
    """


def _events_cusum_drift_oracle() -> str:
    """Oracle for the (unregistered) CUSUM query: mean from the
    DECIMAL(38,6) order-free sum cast to double once; prefix terms
    QUANTIZED to DECIMAL(38,6) so the running sums are exact decimal
    arithmetic (associative — immune to either engine's window
    summation order, e.g. DuckDB segment trees); round-before-rank on
    at_pos; round(6)+0.0 on the signed outputs."""
    return """
        WITH s AS (
            SELECT CAST(value AS DOUBLE) AS x, ts, event_id FROM events
            WHERE value IS NOT NULL
        ),
        h AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx
            FROM s
        ),
        cs AS (
            SELECT row_number() OVER (ORDER BY ts ASC, event_id ASC) AS pos,
                   CAST(sum(CAST(x - (SELECT sx / n FROM h) AS DECIMAL(38,6)))
                       OVER (ORDER BY ts ASC, event_id ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS DOUBLE) AS cusum
            FROM s
        ),
        agg AS (
            SELECT max(cusum) AS mx, min(cusum) AS mn,
                   max(ROUND(abs(cusum), 6)) AS ma
            FROM cs
        )
        SELECT (SELECT n FROM h) AS n,
               (ROUND((SELECT sx / n FROM h), 6) + 0.0) AS mean,
               (ROUND(mx, 6) + 0.0) AS s_max,
               (ROUND(mn, 6) + 0.0) AS s_min,
               (ROUND(mx - mn, 6) + 0.0) AS s_range,
               (SELECT CAST(min(pos) AS BIGINT) FROM cs
                WHERE ROUND(abs(cusum), 6) = (SELECT ma FROM agg)) AS at_pos
        FROM agg
        WHERE (SELECT n FROM h) > 0
    """


def _nation_revenue_atkinson_oracle() -> str:
    """Oracle for the (unregistered) Atkinson query: the HHI oracle's
    exact-DECIMAL per-supplier revenue CTE verbatim, positive-support
    filter, 1 - exp(mean-ln)/mean mirrored operand-for-operand
    (ln sums ride the zipf round(6) precedent), round(6)+0.0."""
    return """
        WITH srev AS (
            SELECT l_suppkey,
                   CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                        AS DECIMAL(38,8))) AS DOUBLE) AS revenue
            FROM lineitem GROUP BY l_suppkey
        ),
        j AS (
            SELECT n.n_name, srev.revenue
            FROM srev
            JOIN supplier s ON s.s_suppkey = srev.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
        ),
        pos AS (
            SELECT n_name,
                   CAST(count(*) AS BIGINT) AS n_pos,
                   CAST(sum(revenue) AS DOUBLE) AS sx,
                   sum(ln(revenue)) AS sl
            FROM j WHERE revenue > 0 GROUP BY n_name
        ),
        neg AS (
            SELECT n_name, CAST(count(*) AS BIGINT) AS n_excluded
            FROM j WHERE NOT (revenue > 0) GROUP BY n_name
        )
        SELECT p.n_name, p.n_pos,
               COALESCE(neg.n_excluded, CAST(0 AS BIGINT)) AS n_excluded,
               (ROUND(1.0 - exp(p.sl / CAST(p.n_pos AS DOUBLE))
                            / (p.sx / CAST(p.n_pos AS DOUBLE)), 6)
                + 0.0) AS atkinson
        FROM pos p LEFT JOIN neg USING (n_name)
    """


def _events_hour_uniformity_oracle() -> str:
    """Oracle for the (unregistered) hour-uniformity G-test: hour-of-day
    ids via the hourly_acf FLOOR-never-cast convention, observed-cells
    G sum (0·ln0 cells absent by construction), the fixed dof=23
    stated as a literal, round(6)+0.0."""
    return """
        WITH per AS (
            SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) % 24 AS h,
                   CAST(count(*) AS BIGINT) AS o
            FROM events WHERE ts IS NOT NULL
            GROUP BY CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) % 24
        ),
        tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM per)
        SELECT (SELECT n FROM tot) AS n,
               CAST(count(*) AS BIGINT) AS n_hours_observed,
               (ROUND(2.0 * sum(CAST(o AS DOUBLE)
                    * ln(CAST(o AS DOUBLE)
                         / (CAST((SELECT n FROM tot) AS DOUBLE) / 24.0))), 6)
                + 0.0) AS g2,
               CAST(23 AS BIGINT) AS dof
        FROM per
        WHERE (SELECT n FROM tot) > 0
    """


def _events_runs_test_oracle() -> str:
    """Oracle for the (unregistered) runs-test query: lower median as
    the ceil(n/2)-th smallest value (order statistic via row ordering
    — the s90 convention), median-equal rows excluded, runs counted by
    lag breaks along (ts, event_id), z mirrored operand-for-operand
    ((r − (2·n1·n2/(n1+n2) + 1)) / sqrt(...)), round(6)+0.0, the
    empty-class and zero-variance guards as WHERE filters."""
    return """
        WITH s AS (
            SELECT CAST(value AS DOUBLE) AS x, ts, event_id FROM events
            WHERE value IS NOT NULL
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s),
        med AS (
            SELECT x AS m FROM (
                SELECT x, row_number() OVER (ORDER BY x ASC, event_id ASC) AS rn
                FROM s
            ) WHERE rn = (SELECT (n + 1) // 2 FROM tot)
        ),
        cls AS (
            SELECT CASE WHEN x > (SELECT m FROM med) THEN 1 ELSE 0 END AS c,
                   ts, event_id
            FROM s WHERE x <> (SELECT m FROM med)
        ),
        runs AS (
            SELECT c,
                   CASE WHEN lag(c) OVER (ORDER BY ts ASC, event_id ASC)
                             IS DISTINCT FROM c
                        THEN 1 ELSE 0 END AS brk
            FROM cls
        ),
        agg AS (
            SELECT CAST(sum(c) AS BIGINT) AS n1,
                   CAST(count(*) - sum(c) AS BIGINT) AS n2,
                   CAST(sum(brk) AS BIGINT) AS r
            FROM runs
        )
        SELECT n1 AS n_above, n2 AS n_below, r AS runs,
               (ROUND((CAST(r AS DOUBLE)
                       - (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                          / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) + 1.0))
                      / sqrt(2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                             * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                                - CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))
                             / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                                * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                                * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)
                                   - 1.0))),
                      6)
                + 0.0) AS z
        FROM agg
        WHERE n1 >= 1 AND n2 >= 1 AND (2 * n1 * n2 - n1 - n2) > 0
    """


def _events_grubbs_test_oracle() -> str:
    """Oracle for the (unregistered) Grubbs query: DECIMAL(38,6)-
    quantized moment sums cast to double once (x squared BEFORE the
    quantization so both engines square the identical double),
    mean/var/sd/g mirrored operand-for-operand, round-before-rank on
    the argmax id, n>=3 and var>0 guards."""
    return """
        WITH s AS (
            SELECT CAST(value AS DOUBLE) AS x, event_id FROM events
            WHERE value IS NOT NULL
        ),
        h AS (
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx
            FROM s
        ),
        m AS (
            SELECT n, sx / n AS mean,
                   (sxx - sx * sx / n) / (n - 1) AS var
            FROM h
        ),
        g AS (
            SELECT max(ROUND(abs(x - (SELECT mean FROM m))
                             / sqrt((SELECT var FROM m)), 6)) AS gm
            FROM s
        )
        SELECT (SELECT n FROM m) AS n,
               (ROUND((SELECT mean FROM m), 6) + 0.0) AS mean,
               ROUND(sqrt((SELECT var FROM m)), 6) AS sd,
               (SELECT gm FROM g) AS g,
               (SELECT CAST(min(event_id) AS BIGINT) FROM s
                WHERE ROUND(abs(x - (SELECT mean FROM m))
                            / sqrt((SELECT var FROM m)), 6)
                      = (SELECT gm FROM g)) AS at_id
        FROM m
        WHERE n >= 3 AND var > 0.0
    """


def _events_cramer_von_mises_oracle() -> str:
    """Oracle for the (unregistered) CvM query: the KS/MWU per-value
    count head verbatim, cumulative integer counts, identical-operand
    ECDF divisions, per-point multiplicity weights, the
    (na·nb)/(na+nb)² prefactor operand-for-operand, round(6)+0.0,
    empty-sample guard as a WHERE filter."""
    return """
        WITH s AS (
            SELECT value AS v,
                   CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia
            FROM events
            WHERE event_type IN ('click', 'purchase')
              AND value IS NOT NULL
        ),
        tot AS (
            SELECT CAST(SUM(ia) AS BIGINT) AS na,
                   CAST(COUNT(*) - SUM(ia) AS BIGINT) AS nb
            FROM s
        ),
        per AS (
            SELECT v,
                   CAST(SUM(ia) AS BIGINT) AS ca,
                   CAST(COUNT(*) - SUM(ia) AS BIGINT) AS cb
            FROM s GROUP BY v
        ),
        ec AS (
            SELECT CAST(ca + cb AS DOUBLE) AS t,
                   CAST(SUM(ca) OVER (ORDER BY v ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS DOUBLE) / CAST((SELECT na FROM tot) AS DOUBLE)
                   - CAST(SUM(cb) OVER (ORDER BY v ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS DOUBLE) / CAST((SELECT nb FROM tot) AS DOUBLE)
                   AS d
            FROM per
        )
        SELECT (SELECT na FROM tot) AS n_a,
               (SELECT nb FROM tot) AS n_b,
               (ROUND(CAST((SELECT na FROM tot) AS DOUBLE)
                      * CAST((SELECT nb FROM tot) AS DOUBLE)
                      / ((CAST((SELECT na FROM tot) AS DOUBLE)
                          + CAST((SELECT nb FROM tot) AS DOUBLE))
                         * (CAST((SELECT na FROM tot) AS DOUBLE)
                            + CAST((SELECT nb FROM tot) AS DOUBLE)))
                      * sum(t * d * d), 6)
                + 0.0) AS t_cvm
        FROM ec
        WHERE (SELECT na FROM tot) > 0 AND (SELECT nb FROM tot) > 0
    """
