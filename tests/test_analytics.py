"""The r18-r20 window-candidate families — cohort retention +
market-basket lift (r18), user behavioral entropy + RFM segmentation
(r19), MinHash estimator audit + revenue Gini (r20): exact pure-Python
recompute pins on handmade tables, hypothesis properties, and the
gate-shaped pre-validation of all six unregistered driver rows against
their DuckDB oracles.
"""
from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from helpers import half_up_round
from scabillmatch_spark.operators.analytics import basket_lift, cohort_retention

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


# ------------------------------------------------------ cohort retention


def _py_cohort(rows):
    """rows: (user, period_int). Mirror of cohort_retention's cell counts."""
    first = {}
    for u, p in rows:
        first[u] = min(first.get(u, p), p)
    cells = {}
    for u, p in rows:
        key = (first[u], p - first[u])
        users, n = cells.get(key, (set(), 0))
        users.add(u)
        cells[key] = (users, n + 1)
    return {k: (len(us), n) for k, (us, n) in cells.items()}


def _month_df(spark, rows):
    # period -> a concrete date inside that month
    import datetime

    data = [
        (u, datetime.datetime(1995 + p // 12, p % 12 + 1, 1 + (u % 27)))
        for u, p in rows
    ]
    return spark.createDataFrame(data, "u long, ts timestamp")


def test_cohort_retention_golden(spark):
    # user 1 arrives month 0, returns months 1 and 3 (twice); user 2
    # arrives month 1 only; user 3 shares user 1's cohort, churns
    rows = [(1, 0), (1, 1), (1, 3), (1, 3), (2, 1), (3, 0)]
    got = {
        (r.cohort, r.periods_since): (r.n_users, r.n_events)
        for r in cohort_retention(_month_df(spark, rows), "u", "ts").collect()
    }
    base = 1995 * 12  # months-since-epoch of 1995-01
    expected = {
        (base + c, s): v for (c, s), v in _py_cohort(rows).items()
    }
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 5), st.integers(0, 24)),
        min_size=1,
        max_size=40,
    )
)
def test_cohort_retention_property(spark, rows):
    got = {
        (r.cohort, r.periods_since): (r.n_users, r.n_events)
        for r in cohort_retention(_month_df(spark, rows), "u", "ts").collect()
    }
    base = 1995 * 12
    assert got == {(base + c, s): v for (c, s), v in _py_cohort(rows).items()}
    # triangle invariants: offsets non-negative; cohort cell (c, 0)
    # contains every user of cohort c at least once
    assert all(s >= 0 for _, s in got)


def test_cohort_retention_year_granularity_and_bad_arg(spark):
    rows = [(1, 0), (1, 13), (2, 13)]
    got = {
        (r.cohort, r.periods_since): (r.n_users, r.n_events)
        for r in cohort_retention(
            _month_df(spark, rows), "u", "ts", granularity="year"
        ).collect()
    }
    assert got == {(1995, 0): (1, 1), (1995, 1): (1, 1), (1996, 0): (1, 1)}
    with pytest.raises(ValueError):
        cohort_retention(_month_df(spark, rows), "u", "ts", granularity="day")


# ------------------------------------------------------------ basket lift


def _py_lift(baskets, min_support=2):
    """baskets: {basket_id: iterable(items)} with possible dups."""
    b = {k: set(v) for k, v in baskets.items()}
    n = float(len(b))
    ct = {}
    for items in b.values():
        for it in items:
            ct[it] = ct.get(it, 0) + 1
    co = {}
    for items in b.values():
        s = sorted(items)
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                co[(s[i], s[j])] = co.get((s[i], s[j]), 0) + 1
    return {
        (a, c): (cnt, ct[a], ct[c], half_up_round(float(cnt) * n / (float(ct[a]) * float(ct[c])), 6))
        for (a, c), cnt in co.items()
        if cnt >= min_support
    }


def _basket_df(spark, baskets):
    rows = [(bk, it) for bk, items in baskets.items() for it in items]
    return spark.createDataFrame(rows, "bk long, it long")


def test_basket_lift_golden(spark):
    baskets = {
        1: [10, 20, 30],
        2: [10, 20],
        3: [10, 30, 30],  # duplicate item counts once
        4: [40],
    }
    got = {
        (r.item_a, r.item_b): (r.co_count, r.ct_a, r.ct_b, r.lift)
        for r in basket_lift(_basket_df(spark, baskets), "bk", "it").collect()
    }
    assert got == _py_lift(baskets)
    # (10,20): co=2 of 4 baskets, ct 3 and 2 -> lift = 2*4/(3*2) = 1.333333
    assert got[(10, 20)] == (2, 3, 2, round(8 / 6, 6))


def test_basket_lift_min_support_and_empty(spark):
    baskets = {1: [1, 2], 2: [3, 4]}
    assert (
        basket_lift(_basket_df(spark, baskets), "bk", "it", min_support=2).count()
        == 0
    )
    with pytest.raises(ValueError):
        basket_lift(
            _basket_df(spark, {}).filter("bk IS NOT NULL"), "bk", "it"
        )


@settings(max_examples=8, deadline=None)
@given(
    st.dictionaries(
        st.integers(1, 8),
        st.lists(st.integers(1, 6), min_size=1, max_size=4),
        min_size=1,
        max_size=8,
    )
)
def test_basket_lift_property(spark, baskets):
    got = {
        (r.item_a, r.item_b): (r.co_count, r.ct_a, r.ct_b, r.lift)
        for r in basket_lift(_basket_df(spark, baskets), "bk", "it").collect()
    }
    assert got == _py_lift(baskets)


# ------------------------------------------- r18 oracle pre-validations


def _gate_compare(spark, qfn, oracle_sql):
    import duckdb

    from tools_compare import compare_typed

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    df = qfn(spark, sf)
    rows = [tuple(r) for r in df.collect()]
    assert rows
    res = compare_typed(df, rows, con, oracle_sql)
    assert all(
        res[k] for k in ("rows_match", "schema_match", "hash_match", "type_match")
    ), res


def test_cohort_query_matches_oracle(spark):
    """r18 pre-validation: the unregistered q_orders_cohort_retention
    matches its DuckDB oracle typed-exact at sf0.001 (sf0.01
    out-of-band, PLANS.md round 12)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_orders_cohort_retention,
        entrymod._orders_cohort_retention_oracle(),
    )


def test_basket_lift_query_matches_oracle(spark):
    """r18 pre-validation #2: the unregistered q_part_basket_lift
    matches its DuckDB oracle typed-exact at sf0.001 (sf0.01
    out-of-band, PLANS.md round 12)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark, entrymod.q_part_basket_lift, entrymod._part_basket_lift_oracle()
    )


# ----------------------------------------------------- user entropy (r19)


def _py_entropy(rows, round_digits=6):
    import math

    by = {}
    for u, t in rows:
        by.setdefault(u, {})
        by[u][t] = by[u].get(t, 0) + 1
    out = {}
    for u, cts in by.items():
        n = sum(cts.values())
        h = -sum((c / n) * math.log(c / n) for c in cts.values()) + 0.0
        top = sorted(cts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        out[u] = (
            n, len(cts), half_up_round(h, round_digits),
            top[0], half_up_round(top[1] / n, round_digits),
        )
    return out


def test_user_entropy_golden(spark):
    from scabillmatch_spark.operators.analytics import user_entropy

    rows = [
        (1, "a"), (1, "a"), (1, "b"), (1, "b"),  # uniform pair: tie -> 'a'
        (2, "x"), (2, "x"), (2, "x"),  # single type: entropy exactly 0
        (3, "a"), (3, "b"), (3, "b"),
    ]
    df = spark.createDataFrame(rows, "u long, t string")
    got = {
        r.u: (r.n_events, r.n_types, r.entropy, r.top_type, r.top_share)
        for r in user_entropy(df, "u", "t").collect()
    }
    assert got == _py_entropy(rows)
    import math

    assert got[1][2] == round(math.log(2), 6) and got[1][3] == "a"
    assert got[2] == (3, 1, 0.0, "x", 1.0)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 4), st.sampled_from("abcd")),
        min_size=1,
        max_size=40,
    )
)
def test_user_entropy_property(spark, rows):
    from scabillmatch_spark.operators.analytics import user_entropy

    df = spark.createDataFrame(rows, "u long, t string")
    got = {
        r.u: (r.n_events, r.n_types, r.entropy, r.top_type, r.top_share)
        for r in user_entropy(df, "u", "t").collect()
    }
    assert got == _py_entropy(rows)


# ------------------------------------------------------------- RFM (r19)


def _py_rfm(rows, buckets=4):
    """rows: (user, day_int, amount). Mirror of rfm_scores."""
    per = {}
    for u, d, a in rows:
        last, n, m = per.get(u, (-(10**9), 0, 0.0))
        per[u] = (max(last, d), n + 1, m + a)
    ref = max(d for _, d, _ in rows)
    flat = [
        # half_up_round, not round(): monetary sums of dyadic floats can
        # land exact .5 ties at digit 6 (tests/helpers.py)
        (u, ref - last, n, half_up_round(m, 6)) for u, (last, n, m) in per.items()
    ]

    def nt(keyed):
        n = len(keyed)
        order = sorted(range(n), key=lambda i: keyed[i])
        size, extra = divmod(n, buckets)
        out = [0] * n
        pos = 0
        for b in range(1, buckets + 1):
            width = size + (1 if b <= extra else 0)
            for _ in range(width):
                if pos < n:
                    out[order[pos]] = b
                    pos += 1
        return out

    r = nt([(rec, u) for u, rec, _, _ in flat])
    f = nt([(-n, u) for u, _, n, _ in flat])
    m = nt([(-mny, u) for u, _, _, mny in flat])
    return {
        u: (rec, n, mny, r[i], f[i], m[i], r[i] * 100 + f[i] * 10 + m[i])
        for i, (u, rec, n, mny) in enumerate(flat)
    }


def _orders_df(spark, rows):
    import datetime

    return spark.createDataFrame(
        [
            (u, datetime.datetime(2000, 1, 1) + datetime.timedelta(days=d), a)
            for u, d, a in rows
        ],
        "u long, ts timestamp, amt double",
    )


def test_rfm_golden(spark):
    from scabillmatch_spark.operators.analytics import rfm_scores

    rows = [
        (1, 10, 100.0), (1, 20, 50.0),   # recency 10, freq 2, monetary 150
        (2, 30, 10.0),                   # most recent
        (3, 0, 300.0), (3, 5, 1.0), (3, 6, 1.0),
        (4, 25, 400.0),
        (5, 2, 5.0),
    ]
    df = _orders_df(spark, rows)
    got = {
        r.u: (
            r.recency_days, r.frequency, r.monetary,
            r.r_score, r.f_score, r.m_score, r.rfm,
        )
        for r in rfm_scores(df, "u", "ts", "amt").collect()
    }
    assert got == _py_rfm(rows)
    assert got[2][3] == 1  # most recent user gets the best r bucket


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 6),
            st.integers(0, 50),
            st.floats(min_value=0.5, max_value=1e4, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_rfm_property(spark, rows):
    from scabillmatch_spark.operators.analytics import rfm_scores

    got = {
        r.u: (
            r.recency_days, r.frequency, r.monetary,
            r.r_score, r.f_score, r.m_score, r.rfm,
        )
        for r in rfm_scores(_orders_df(spark, rows), "u", "ts", "amt").collect()
    }
    assert got == _py_rfm(rows)


def test_user_entropy_query_matches_oracle(spark):
    """r19 pre-validation: the unregistered q_events_user_entropy
    matches its DuckDB oracle typed-exact at sf0.001 (sf0.01
    out-of-band, PLANS.md round 12)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_events_user_entropy,
        entrymod._events_user_entropy_oracle(),
    )


def test_rfm_query_matches_oracle(spark):
    """r19 pre-validation #2: the unregistered q_customer_rfm matches
    its DuckDB oracle typed-exact at sf0.001 (sf0.01 out-of-band,
    PLANS.md round 12)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark, entrymod.q_customer_rfm, entrymod._customer_rfm_oracle()
    )


# ------------------------------------------------- MinHash audit (r20)


def _py_minhash_audit(sets, num_hashes=32, num_bands=4):
    """Pure-Python mirror of the LCG hash family + banding + audit."""
    from scabillmatch_spark.functions.text import HASH_PRIME, MINHASH_AB

    P = HASH_PRIME

    def sig(s):
        out = []
        for a, b in MINHASH_AB[:num_hashes]:
            out.append(min(((1 + x % P) * a + b) % P for x in s) if s else P)
        return out

    sigs = {d: sig(s) for d, s in sets.items() if s}
    rows = num_hashes // num_bands
    bands = {
        d: [tuple(g[b * rows : (b + 1) * rows]) + (b,) for b in range(num_bands)]
        for d, g in sigs.items()
    }
    out = {}
    ids = sorted(sigs)
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1 :]:
            if not set(bands[d1]) & set(bands[d2]):
                continue
            agree = sum(1 for a, b in zip(sigs[d1], sigs[d2]) if a == b)
            inter = len(sets[d1] & sets[d2])
            uni = len(sets[d1] | sets[d2])
            est = half_up_round(agree / num_hashes, 6)
            exact = half_up_round(inter / uni, 6)
            out[(d1, d2)] = (agree, est, exact, half_up_round(abs(est - exact), 6))
    return out


def test_minhash_audit_matches_python_mirror(spark):
    from scabillmatch_spark.operators.dedup import minhash_estimate_audit

    sets = {
        1: {10, 20, 30, 40},
        2: {10, 20, 30, 40},        # identical twin: est == exact == 1
        3: {10, 20, 30, 41},        # near dup
        4: {999, 888, 777},         # disjoint — may or may not collide
        5: set(),                   # empty: excluded entirely
    }
    df = spark.createDataFrame(
        [(d, sorted(s)) for d, s in sets.items()], "doc_id long, toks array<long>"
    )
    got = {
        (r.pk1, r.pk2): (r.n_agree, r.est_jaccard, r.exact_jaccard, r.abs_err)
        for r in minhash_estimate_audit(df, "doc_id", "toks").collect()
    }
    assert got == _py_minhash_audit(sets)
    assert got[(1, 2)] == (32, 1.0, 1.0, 0.0)  # twins agree everywhere
    assert all(d != 5 for pair in got for d in pair)


@settings(max_examples=6, deadline=None)
@given(
    st.dictionaries(
        st.integers(1, 5),
        st.sets(st.integers(1, 40), min_size=0, max_size=10),
        min_size=2,
        max_size=5,
    )
)
def test_minhash_audit_property(spark, sets):
    from scabillmatch_spark.operators.dedup import minhash_estimate_audit

    df = spark.createDataFrame(
        [(d, sorted(s)) for d, s in sets.items()], "doc_id long, toks array<long>"
    )
    got = {
        (r.pk1, r.pk2): (r.n_agree, r.est_jaccard, r.exact_jaccard, r.abs_err)
        for r in minhash_estimate_audit(df, "doc_id", "toks").collect()
    }
    assert got == _py_minhash_audit(sets)


# ----------------------------------------------------------- Gini (r20)


def _py_gini(groups, round_digits=6):
    """groups: {g: [(id, x), ...]} — mirror of stats.gini."""
    out = {}
    for g, rows in groups.items():
        ordered = sorted(rows, key=lambda r: (r[1], r[0]))
        n = float(len(ordered))
        sx = sum(x for _, x in ordered)
        six = sum((i + 1) * x for i, (_, x) in enumerate(ordered))
        out[g] = (
            len(ordered),
            half_up_round(2.0 * six / (n * sx) - (n + 1.0) / n, round_digits),
        )
    return out


def test_gini_golden(spark):
    from scabillmatch_spark.operators.stats import gini

    groups = {
        "even": [(1, 5.0), (2, 5.0), (3, 5.0), (4, 5.0)],     # G = 0
        "whale": [(1, 0.0), (2, 0.0), (3, 0.0), (4, 100.0)],  # G = (n-1)/n
        "mix": [(1, 1.0), (2, 2.0), (3, 3.0), (4, 10.0)],
    }
    rows = [(g, i, x) for g, rs in groups.items() for i, x in rs]
    df = spark.createDataFrame(rows, "g string, id long, x double")
    got = {r.g: (r.n, r.gini) for r in gini(df, "g", "x", "id").collect()}
    assert got == _py_gini(groups)
    assert got["even"][1] == 0.0 and got["whale"][1] == 0.75


@settings(max_examples=8, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from("ab"),
        st.lists(
            st.floats(min_value=0.0, max_value=1e5, allow_nan=False),
            min_size=1,
            max_size=20,
        ).filter(lambda xs: sum(xs) > 0),
        min_size=1,
        max_size=2,
    )
)
def test_gini_property(spark, raw):
    from scabillmatch_spark.operators.stats import gini

    groups = {g: [(i, x) for i, x in enumerate(xs)] for g, xs in raw.items()}
    rows = [(g, i, x) for g, rs in groups.items() for i, x in rs]
    df = spark.createDataFrame(rows, "g string, id long, x double")
    got = {r.g: (r.n, r.gini) for r in gini(df, "g", "x", "id").collect()}
    assert got == _py_gini(groups)


def test_minhash_audit_query_matches_oracle(spark):
    """r20 pre-validation: the unregistered q_doc_minhash_audit matches
    its DuckDB oracle typed-exact at sf0.001 (sf0.01 out-of-band,
    PLANS.md round 12)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark, entrymod.q_doc_minhash_audit, entrymod._doc_minhash_audit_oracle()
    )


def test_gini_query_matches_oracle(spark):
    """r20 pre-validation #2: the unregistered q_nation_revenue_gini
    matches its DuckDB oracle typed-exact at sf0.001 (sf0.01
    out-of-band, PLANS.md round 12)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_nation_revenue_gini,
        entrymod._nation_revenue_gini_oracle(),
    )


# --------------------------------------------- session co-occurrence PMI


def _ev_df(spark, rows):
    """rows: (event_id, user, type, seconds-offset)."""
    import datetime

    data = [
        (
            eid,
            u,
            t,
            datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s),
        )
        for eid, u, t, s in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, event_type string, ts timestamp"
    )


def _py_pmi(rows, gap_s=1800, round_digits=6):
    import math

    by_user = {}
    for eid, u, t, s in rows:
        by_user.setdefault(u, []).append((s, eid, t))
    sessions = []
    for u, evs in by_user.items():
        evs.sort()
        cur, last = None, None
        for s, eid, t in evs:
            if last is None or s - last > gap_s:
                cur = set()
                sessions.append(cur)
            cur.add(t)
            last = s
    n = len(sessions)
    marg = {}
    pair = {}
    for ss in sessions:
        for t in ss:
            marg[t] = marg.get(t, 0) + 1
        ts = sorted(ss)
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                pair[(ts[i], ts[j])] = pair.get((ts[i], ts[j]), 0) + 1
    return {
        (a, b): (
            c,
            marg[a],
            marg[b],
            n,
            half_up_round(math.log(c * n / (marg[a] * marg[b])), round_digits)
            + 0.0,
        )
        for (a, b), c in pair.items()
    }


def test_session_pmi_golden(spark):
    from scabillmatch_spark.operators.cooccur import session_pmi

    # user 1: two sessions — the second starts 1801s after the first's
    # last event (gap is STRICTLY greater than 1800); user 2: one
    # session; an exactly-1800s gap does NOT split.
    rows = [
        (0, 1, "a", 0),
        (1, 1, "b", 100),
        (2, 1, "a", 1900),  # 1800s after eid 1 -> SAME session
        (3, 1, "c", 3701),  # 1801s later -> NEW session
        (4, 1, "a", 3702),
        (5, 2, "b", 0),
        (6, 2, "c", 10),
    ]
    got = {
        (r.type_a, r.type_b): (r.n_ab, r.n_a, r.n_b, r.n_sessions, r.pmi)
        for r in session_pmi(_ev_df(spark, rows)).collect()
    }
    assert got == _py_pmi(rows)
    # hand-check the session structure the expectation relies on:
    # sessions = {a,b}, {a,c}, {b,c} -> every pair co-occurs once, N=3
    assert got[("a", "b")][:4] == (1, 2, 2, 3)
    assert got[("a", "c")][:4] == (1, 2, 2, 3)
    assert got[("b", "c")][:4] == (1, 2, 2, 3)


def test_session_pmi_tie_order_and_repeats(spark):
    from scabillmatch_spark.operators.cooccur import session_pmi

    # repeated types within one session count ONCE (set semantics);
    # a never co-occurring pair yields no row
    rows = [
        (0, 1, "x", 0),
        (1, 1, "x", 1),
        (2, 1, "y", 2),
        (3, 2, "z", 0),
    ]
    got = {
        (r.type_a, r.type_b): (r.n_ab, r.n_a, r.n_b, r.n_sessions)
        for r in session_pmi(_ev_df(spark, rows)).collect()
    }
    assert got == {("x", "y"): (1, 1, 1, 2)}


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 3),  # user
            st.sampled_from(["a", "b", "c"]),  # type
            st.integers(0, 7200),  # seconds
        ),
        min_size=2,
        max_size=24,
        unique_by=lambda r: (r[0], r[2]),  # one event per (user, instant)
    )
)
def test_session_pmi_property_matches_python(spark, evs):
    from scabillmatch_spark.operators.cooccur import session_pmi

    rows = [(i, u, t, s) for i, (u, t, s) in enumerate(evs)]
    got = {
        (r.type_a, r.type_b): (r.n_ab, r.n_a, r.n_b, r.n_sessions, r.pmi)
        for r in session_pmi(_ev_df(spark, rows)).collect()
    }
    assert got == _py_pmi(rows)


def test_session_pmi_query_matches_oracle(spark):
    """Banked-row pre-validation: the unregistered q_events_session_pmi
    matches its DuckDB oracle typed-exact at sf0.001 (sf0.01
    out-of-band, PLANS.md round 12)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_events_session_pmi,
        entrymod._events_session_pmi_oracle(),
    )


# -------------------------------------- JS divergence + Markov transitions


def _py_js(rows, round_digits=6):
    """rows: (slice, text). Mirror of slice_js_divergence (token pipeline
    + intersection-plus-marginals identity)."""
    import math
    import re

    def toks(text):
        return [
            w
            for w in re.sub(r"[0-9,:;?!.]", "", text.lower()).split(" ")
            if w
        ]

    cnt = {}
    for s, tx in rows:
        for t in toks(tx):
            cnt.setdefault(s, {})[t] = cnt.setdefault(s, {}).get(t, 0) + 1
    out = {}
    slices = sorted(cnt)
    for i, a in enumerate(slices):
        for b in slices[i + 1 :]:
            na, nb = sum(cnt[a].values()), sum(cnt[b].values())
            shared = sorted(set(cnt[a]) & set(cnt[b]))
            if not shared:
                continue
            s_term = s_pa = s_pb = 0.0
            for t in shared:
                pa, pb = cnt[a][t] / na, cnt[b][t] / nb
                s_term += pa * math.log(2.0 * pa / (pa + pb)) + pb * math.log(
                    2.0 * pb / (pa + pb)
                )
                s_pa += pa
                s_pb += pb
            js = 0.5 * s_term + 0.5 * math.log(2.0) * (2.0 - s_pa - s_pb)
            out[(a, b)] = (
                na,
                nb,
                len(cnt[a]),
                len(cnt[b]),
                len(shared),
                half_up_round(js, round_digits) + 0.0,
            )
    return out


def test_js_divergence_golden_identical_and_disjoint(spark):
    from scabillmatch_spark.operators.divergence import slice_js_divergence

    rows = [
        ("a", "red green blue red"),
        ("b", "red green blue red"),  # identical distribution -> js = 0
        ("c", "cyan magenta cyan"),  # disjoint from a/b -> no row
        ("d", "red cyan"),  # overlaps both camps
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = {
        (r.slice_a, r.slice_b): (
            r.n_tokens_a,
            r.n_tokens_b,
            r.vocab_a,
            r.vocab_b,
            r.n_shared_vocab,
            r.js,
        )
        for r in slice_js_divergence(df, "lang").collect()
    }
    assert got == _py_js(rows)
    assert got[("a", "b")][5] == 0.0  # identical -> exactly zero
    assert ("a", "c") not in got and ("b", "c") not in got  # disjoint
    assert ("a", "d") in got and ("c", "d") in got
    # JS is bounded by ln 2 and positive for differing distributions
    assert 0.0 < got[("a", "d")][5] < 0.693148


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.lists(
                st.sampled_from(["aa", "bb", "cc", "dd"]),
                min_size=1,
                max_size=12,
            ).map(" ".join),
        ),
        min_size=2,
        max_size=8,
    )
)
def test_js_divergence_property_matches_python(spark, rows):
    from scabillmatch_spark.operators.divergence import slice_js_divergence

    df = spark.createDataFrame(rows, "lang string, text string")
    got = {
        (r.slice_a, r.slice_b): (
            r.n_tokens_a,
            r.n_tokens_b,
            r.vocab_a,
            r.vocab_b,
            r.n_shared_vocab,
            r.js,
        )
        for r in slice_js_divergence(df, "lang").collect()
    }
    assert got == _py_js(rows)


def _py_markov(rows, gap_s=1800, round_digits=6):
    """rows: (eid, user, type, seconds). Mirror of session_transitions."""
    by_user = {}
    for eid, u, t, s in rows:
        by_user.setdefault(u, []).append((s, eid, t))
    pairs = {}
    for u, evs in by_user.items():
        evs.sort()
        chain, last = [], None
        chains = []
        for s, eid, t in evs:
            if last is None or s - last > gap_s:
                chain = []
                chains.append(chain)
            chain.append(t)
            last = s
        for ch in chains:
            for x, y in zip(ch, ch[1:]):
                pairs[(x, y)] = pairs.get((x, y), 0) + 1
    marg = {}
    for (x, _), n in pairs.items():
        marg[x] = marg.get(x, 0) + n
    return {
        (x, y): (n, marg[x], half_up_round(n / marg[x], round_digits) + 0.0)
        for (x, y), n in pairs.items()
    }


def test_markov_transitions_golden(spark):
    from scabillmatch_spark.operators.cooccur import session_transitions

    # user 1: a->b->a then (new session) c->a; user 2: b alone (no
    # transition); the a->b / b->a / c->a / a-row normalization all pin
    rows = [
        (0, 1, "a", 0),
        (1, 1, "b", 60),
        (2, 1, "a", 120),
        (3, 1, "c", 7200),
        (4, 1, "a", 7260),
        (5, 2, "b", 0),
    ]
    got = {
        (r.from_type, r.to_type): (r.n, r.n_from, r.p)
        for r in session_transitions(_ev_df(spark, rows)).collect()
    }
    assert got == _py_markov(rows)
    assert got[("a", "b")] == (1, 1, 1.0)
    assert got[("c", "a")] == (1, 1, 1.0)
    assert ("b", "b") not in got  # user 2's singleton makes no transition
    # transitions never cross the session boundary: no a->c row
    assert ("a", "c") not in got


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 3),
            st.sampled_from(["a", "b", "c"]),
            st.integers(0, 7200),
        ),
        min_size=2,
        max_size=24,
        unique_by=lambda r: (r[0], r[2]),
    )
)
def test_markov_transitions_property_matches_python(spark, evs):
    from scabillmatch_spark.operators.cooccur import session_transitions

    rows = [(i, u, t, s) for i, (u, t, s) in enumerate(evs)]
    got = {
        (r.from_type, r.to_type): (r.n, r.n_from, r.p)
        for r in session_transitions(_ev_df(spark, rows)).collect()
    }
    assert got == _py_markov(rows)


def test_lang_divergence_query_matches_oracle(spark):
    """Banked-row pre-validation: the unregistered q_doc_lang_divergence
    matches its DuckDB oracle typed-exact at sf0.001 (sf0.01
    out-of-band, PLANS.md round 12)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_doc_lang_divergence,
        entrymod._doc_lang_divergence_oracle(),
    )


def test_markov_transitions_query_matches_oracle(spark):
    """Banked-row pre-validation: the unregistered
    q_events_markov_transitions matches its DuckDB oracle typed-exact
    at sf0.001 (sf0.01 out-of-band, PLANS.md round 12)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_events_markov_transitions,
        entrymod._events_markov_transitions_oracle(),
    )


# ------------------------------------------------------- Pareto / ABC


def test_pareto_classes_boundaries_golden(spark):
    from pyspark.sql import functions as F

    from scabillmatch_spark.operators.stats import pareto_classes

    # revenues 80/15/5 -> cumulative shares 0.80, 0.95, 1.00: both
    # boundaries are INCLUSIVE, so the classes split exactly A/B/C
    rows = [(1, 80.0), (2, 15.0), (3, 5.0)]
    df = spark.createDataFrame(rows, "k long, v double").select(
        "k", F.col("v").cast("decimal(38,6)").alias("v")
    )
    got = {
        r.abc_class: (r.n_parts, r.revenue_share)
        for r in pareto_classes(df, "k", F.col("v")).collect()
    }
    assert got == {"A": (1, 0.8), "B": (1, 0.15), "C": (1, 0.05)}
    # shares partition the total
    assert abs(sum(v[1] for v in got.values()) - 1.0) < 1e-9
    # revenue ties break by key ascending: equal values never straddle
    # nondeterministically (rerun is bit-stable)
    rows2 = [(1, 50.0), (2, 50.0)] + [(k, 0.0) for k in range(3, 8)]
    df2 = spark.createDataFrame(rows2, "k long, v double").select(
        "k", F.col("v").cast("decimal(38,6)").alias("v")
    )
    got2 = {
        r.abc_class: (r.n_parts, r.revenue_share)
        for r in pareto_classes(df2, "k", F.col("v")).collect()
    }
    # tie broken by key asc: key 1 ranks first (cum 0.5 -> A); key 2's
    # cumulative share is 1.0 > 0.95 -> C, together with the zeros
    assert got2 == {"A": (1, 0.5), "C": (6, 0.5)}


def test_pareto_query_matches_oracle(spark):
    """Banked-row pre-validation: the unregistered q_part_pareto matches
    its DuckDB oracle typed-exact at sf0.001 (sf0.01 out-of-band,
    PLANS.md round 12)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark, entrymod.q_part_pareto, entrymod._part_pareto_oracle()
    )


def test_keyness_query_matches_oracle(spark):
    """Banked-row pre-validation (r13): the unregistered q_doc_keyness_g2
    matches its DuckDB oracle typed-exact at sf0.001 (sf0.01 out-of-band,
    PLANS.md round 13)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark, entrymod.q_doc_keyness_g2, entrymod._doc_keyness_g2_oracle()
    )


def test_ks_query_matches_oracle(spark):
    """Banked-row pre-validation (r13): the unregistered q_events_value_ks
    matches its DuckDB oracle typed-exact at sf0.001 (sf0.01 out-of-band,
    PLANS.md round 13)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark, entrymod.q_events_value_ks, entrymod._events_value_ks_oracle()
    )


def test_g2_keyness_python_mirror(spark):
    """g2_keyness vs an exact Python mirror on a tiny two-slice corpus,
    including a term present in only one slice (zero-cell convention)
    and the min_count filter."""
    import math

    from scabillmatch_spark.operators.divergence import g2_keyness

    rows = [
        ("en", "alpha alpha beta gamma"),
        ("en", "alpha beta beta gamma"),
        ("de", "gamma gamma delta delta"),
        ("de", "delta delta gamma alpha"),
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = {
        r.term: (r.n_target, r.n_rest, r.g2, r.key_slice)
        for r in g2_keyness(df, "lang", "en", min_count=1, top_k=50).collect()
    }
    # Python mirror
    from collections import Counter

    a, b = Counter(), Counter()
    for lang, text in rows:
        (a if lang == "en" else b).update(text.split())
    n1, n2 = sum(a.values()), sum(b.values())
    n = n1 + n2
    exp = {}
    for t in set(a) | set(b):
        ta, tb = a[t], b[t]
        e1 = (ta + tb) * n1 / n
        e2 = (ta + tb) * n2 / n
        g = 2.0 * (
            (ta * math.log(ta / e1) if ta else 0.0)
            + (tb * math.log(tb / e2) if tb else 0.0)
        )
        exp[t] = (
            ta,
            tb,
            round(g, 6) + 0.0,
            "target" if ta * n2 > tb * n1 else "rest",
        )
    assert got == exp
    # delta is de-only: its n_target cell is 0 and it must key to 'rest'
    assert got["delta"][0] == 0 and got["delta"][3] == "rest"


def test_ks_two_sample_mirror_and_guards(spark):
    """ks_two_sample vs a hand-computed ECDF max gap (with a duplicate
    pooled value), plus the empty-sample guard."""
    from scabillmatch_spark.operators.stats import ks_two_sample

    rows = [
        ("a", 1.0),
        ("a", 2.0),
        ("a", 3.0),
        ("b", 2.0),
        ("b", 4.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = ks_two_sample(df, "a", "b").collect()
    assert len(out) == 1
    r = out[0]
    # ECDFs over pooled values [1,2,3,4]:
    #   F_a = 1/3, 2/3, 3/3, 3/3 ; F_b = 0/2, 1/2, 1/2, 2/2
    # gaps = 1/3, 1/6, 1/2, 0 -> D = 0.5 at v=3
    assert (r.n_a, r.n_b) == (3, 2)
    assert r.ks_d == 0.5 and r.at_value == 3.0
    # one-sided sample -> empty typed frame, not a 0/0 NaN
    empty = ks_two_sample(df.filter("event_type = 'a'"), "a", "b")
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["n_a", "n_b", "ks_d", "at_value"]


def test_cms_query_matches_oracle(spark):
    """Banked-row pre-validation (r14): the unregistered
    q_doc_cms_heavy_hitters matches its DuckDB oracle typed-exact at
    sf0.001 (sf0.01 out-of-band, PLANS.md round 14)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_doc_cms_heavy_hitters,
        entrymod._doc_cms_heavy_hitters_oracle(),
    )


def test_cms_python_mirror(spark):
    """cms_heavy_hitters vs a Python Count-Min mirror: identical
    md5-derived counters, est = min over rows, the one-sided guarantee
    (est >= exact for EVERY term, including forced collisions at
    width=4), and exact top-k ordering."""
    import hashlib
    from collections import Counter

    from scabillmatch_spark.operators.textstats import cms_heavy_hitters

    rows = [("alpha alpha alpha beta beta gamma delta epsilon",),
            ("alpha beta gamma gamma zeta eta theta iota",)]
    df = spark.createDataFrame(rows, "text string")
    # width=4 forces collisions; the guarantee must still hold
    got = {r.term: (r.cnt_exact, r.cnt_est, r.overestimate)
           for r in cms_heavy_hitters(df, depth=4, width=4, top_k=10).collect()}

    toks = " ".join(t[0] for t in rows).split()
    exact = Counter(toks)

    def bucket(j, term):
        h = int(hashlib.md5(f"cms{j}:{term}".encode()).hexdigest()[:15], 16)
        return h % 4

    counters = Counter()
    for t, c in exact.items():
        for j in range(4):
            counters[(j, bucket(j, t))] += c
    for term, (ce, est, over) in got.items():
        assert ce == exact[term]
        assert est == min(counters[(j, bucket(j, term))] for j in range(4))
        assert over == est - ce and over >= 0
    assert len(got) == len(exact) <= 10


def test_spearman_query_matches_oracle(spark):
    """Banked-row pre-validation (r14): the unregistered
    q_customer_order_spearman matches its DuckDB oracle typed-exact at
    sf0.001 (sf0.01 out-of-band, PLANS.md round 14)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_customer_order_spearman,
        entrymod._customer_order_spearman_oracle(),
    )


def test_spearman_python_mirror(spark):
    """spearman_corr vs scipy-free Python average-rank mirror: ties on
    BOTH sides (the case the rank-then-id shortcut distorts), a perfect
    monotone pair (rho = 1), and the zero-variance guard."""
    import math

    from scabillmatch_spark.operators.stats import spearman_corr

    def mirror(xs, ys):
        def avg_ranks(vs):
            sv = sorted(vs)
            return [
                (sv.index(v) + 1 + (sv.index(v) + sv.count(v))) / 2.0
                for v in vs
            ]

        rx, ry = avg_ranks(xs), avg_ranks(ys)
        n = len(xs)
        sx, sy = sum(rx), sum(ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        sxx = sum(a * a for a in rx)
        syy = sum(b * b for b in ry)
        return (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )

    xs = [1.0, 2.0, 2.0, 3.0, 3.0, 5.0]
    ys = [10.0, 30.0, 20.0, 20.0, 40.0, 50.0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    out = spearman_corr(df, "x", "y").collect()
    assert len(out) == 1
    assert out[0].n == 6
    assert abs(out[0].rho - round(mirror(xs, ys), 6)) < 1e-9

    mono = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(1, 8)], "x double, y double"
    )
    assert spearman_corr(mono, "x", "y").collect()[0].rho == 1.0

    flat = spark.createDataFrame(
        [(1.0, float(i)) for i in range(5)], "x double, y double"
    )
    assert spearman_corr(flat, "x", "y").count() == 0  # zero x-variance


def test_mannwhitney_query_matches_oracle(spark):
    """Banked-row pre-validation (r14): the unregistered
    q_events_mannwhitney matches its DuckDB oracle typed-exact at
    sf0.001 (sf0.01 out-of-band, PLANS.md round 14)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_events_mannwhitney,
        entrymod._events_mannwhitney_oracle(),
    )


def test_mannwhitney_python_mirror(spark):
    """mann_whitney_u vs a brute-force pair-counting Python mirror
    (including a cross-sample tie for the half-count), the scipy-free
    tie-corrected z formula, and both guards (empty sample, all-tied
    zero-sigma)."""
    import math

    from scabillmatch_spark.operators.stats import mann_whitney_u

    a = [1.0, 2.0, 3.0, 5.0]
    b = [2.0, 4.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = mann_whitney_u(df, "a", "b").collect()
    assert len(out) == 1
    r = out[0]
    u = sum(1.0 if x > y else 0.5 if x == y else 0.0 for x in a for y in b)
    na, nb = len(a), len(b)
    n = na + nb
    from collections import Counter

    tt = sum(t**3 - t for t in Counter(a + b).values())
    sigma = math.sqrt(na * nb / 12.0 * ((n + 1) - tt / (n * (n - 1))))
    assert (r.n_a, r.n_b, r.u_a) == (na, nb, u)
    assert abs(r.z - (u - na * nb / 2.0) / sigma) < 1e-6
    # guards
    assert mann_whitney_u(df.filter("event_type = 'a'"), "a", "b").count() == 0
    tied = spark.createDataFrame(
        [("a", 7.0), ("a", 7.0), ("b", 7.0)], "event_type string, value double"
    )
    assert mann_whitney_u(tied, "a", "b").count() == 0  # sigma == 0


def test_benford_query_matches_oracle(spark):
    """Banked-row pre-validation (r14): the unregistered
    q_orders_benford_digits matches its DuckDB oracle typed-exact at
    sf0.001 (sf0.01 out-of-band, PLANS.md round 14)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_orders_benford_digits,
        entrymod._orders_benford_digits_oracle(),
    )


def test_benford_python_mirror(spark):
    """benford_digits vs an exact Python mirror on hand values, covering
    the [1, 10^7) window filter, multi-digit leading-char extraction,
    and the computed (never pasted) Benford expectations."""
    import math

    from scabillmatch_spark.operators.analytics import benford_digits

    vals = [1.5, 19.0, 123.4, 0.5, 2.0, 25000000.0, 9999999.9, 3.0, 1013.7]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = {r.digit: (r.n, r.share, r.benford_p, r.dev)
           for r in benford_digits(df, "value").collect()}
    kept = [v for v in vals if 1 <= v < 10_000_000]
    from collections import Counter

    exp = Counter(str(v)[0] for v in kept)
    assert {d: t[0] for d, t in got.items()} == dict(exp)
    for d, (n, share, p, dev) in got.items():
        assert abs(share - n / len(kept)) < 1e-6
        assert abs(p - math.log10(1 + 1 / int(d))) < 1e-6
        assert abs(dev - (share - p)) < 2e-6  # dev re-rounds share - p
        # signed-zero fold: a 0.0 dev must be POSITIVE zero
        if dev == 0.0:
            assert math.copysign(1, dev) == 1.0


def test_hourly_acf_query_matches_oracle(spark):
    """Banked-row pre-validation (r14): the unregistered
    q_events_hourly_acf matches its DuckDB oracle typed-exact at
    sf0.001 (sf0.01 out-of-band, PLANS.md round 14)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_events_hourly_acf,
        entrymod._events_hourly_acf_oracle(),
    )


def test_hourly_acf_python_mirror(spark):
    """hourly_acf1 vs an exact Python mirror: adjacent-hour pairing
    (a gap contributes no pair), the Pearson form, and the
    constant-series / <2-pairs definedness filters."""
    import datetime as dt
    import math

    from scabillmatch_spark.operators.analytics import hourly_acf1

    t0 = dt.datetime(2024, 1, 1)

    def at(h, m=0):
        return t0 + dt.timedelta(hours=h, minutes=m)

    rows = []
    # 'up': counts 1,2,3,4 over hours 0-3 -> strongly positive acf1
    for h in range(4):
        for i in range(h + 1):
            rows.append(("up", at(h, i)))
    # 'gap': hours 0,1 then 5,6 -> pairs (h0,h1),(h5,h6) only
    for h in (0, 1, 5, 6):
        for i in range({0: 1, 1: 3, 5: 3, 6: 1}[h]):
            rows.append(("gap", at(h, i)))
    # 'flat': constant series -> zero variance -> filtered out
    for h in range(3):
        rows.append(("flat", at(h)))
    # 'one': single hour -> no pair -> filtered out
    rows.append(("one", at(0)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r.event_type: (r.n_pairs, r.acf1) for r in hourly_acf1(df).collect()}
    assert set(got) == {"up", "gap"}

    def pearson(pairs):
        n = len(pairs)
        sx = sum(p[0] for p in pairs)
        sy = sum(p[1] for p in pairs)
        sxy = sum(p[0] * p[1] for p in pairs)
        sxx = sum(p[0] * p[0] for p in pairs)
        syy = sum(p[1] * p[1] for p in pairs)
        return (n * sxy - sx * sy) / math.sqrt(
            max(n * sxx - sx * sx, 0) * max(n * syy - sy * sy, 0)
        )

    assert got["up"][0] == 3
    assert abs(got["up"][1] - round(pearson([(1, 2), (2, 3), (3, 4)]), 6)) < 1e-9
    assert got["gap"][0] == 2
    assert abs(got["gap"][1] - round(pearson([(1, 3), (3, 1)]), 6)) < 1e-9


def test_hhi_query_matches_oracle(spark):
    """Banked-row pre-validation (r14): the unregistered
    q_nation_supplier_hhi matches its DuckDB oracle typed-exact at
    sf0.001 (sf0.01 out-of-band, PLANS.md round 14)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_nation_supplier_hhi,
        entrymod._nation_supplier_hhi_oracle(),
    )


def test_hhi_python_mirror(spark):
    """herfindahl_index vs an exact Python mirror: monopoly -> 1.0,
    perfectly even -> 1/n, the top_share spotlight, and the zero-total
    guard."""
    from scabillmatch_spark.operators.stats import herfindahl_index

    rows = [
        ("mono", "a", 100.0),
        ("mono", "b", 0.0),
        ("even", "a", 5.0),
        ("even", "b", 5.0),
        ("even", "c", 5.0),
        ("even", "d", 5.0),
        ("skew", "a", 8.0),
        ("skew", "b", 2.0),
        ("zero", "a", 0.0),
        ("zero", "b", 0.0),
    ]
    df = spark.createDataFrame(rows, "g string, m string, v double")
    got = {r.g: (r.n, r.hhi, r.top_share)
           for r in herfindahl_index(df, "g", "v").collect()}
    assert set(got) == {"mono", "even", "skew"}  # zero-total filtered
    assert got["mono"] == (2, 1.0, 1.0)
    assert got["even"] == (4, 0.25, 0.25)
    # skew: shares 0.8/0.2 -> hhi 0.68, top 0.8
    assert got["skew"] == (2, 0.68, 0.8)


def test_ks_binned_approximates_exact(spark):
    """The bins= scale path (r13 verdict #7): the binned-ECDF D is a
    LOWER bound on the exact D (the sup is evaluated on a sub-grid of
    approx-quantile cuts) and converges to it as bins grow. On two
    clearly-drifted synthetic distributions (deterministic hash-derived
    uniforms, one shifted) the binned form at 64 bins must land within
    0.05 of the exact D; the tiny hand case from the mirror test must be
    EXACT at bins >= the pooled distinct count (every value becomes a
    cut)."""
    from scabillmatch_spark.operators.stats import ks_two_sample

    # deterministic drifted samples: 400 'a' uniforms on [0,1),
    # 300 'b' uniforms on [0.25, 1.25) — exact D ~ 0.25
    rows = [("a", (i * 2654435761 % 1000) / 1000.0) for i in range(400)]
    rows += [("b", 0.25 + (i * 40503 % 1000) / 1000.0) for i in range(300)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    exact = ks_two_sample(df, "a", "b").collect()[0]
    binned = ks_two_sample(df, "a", "b", bins=64).collect()[0]
    assert binned.ks_d <= exact.ks_d + 1e-9
    assert exact.ks_d - binned.ks_d <= 0.05, (exact.ks_d, binned.ks_d)
    # schema parity with the exact form
    assert (binned.n_a, binned.n_b) == (exact.n_a, exact.n_b) == (400, 300)

    small = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 4.0)],
        "event_type string, value double",
    )
    e = ks_two_sample(small, "a", "b").collect()[0]
    b = ks_two_sample(small, "a", "b", bins=16).collect()[0]
    assert (b.ks_d, b.at_value) == (e.ks_d, e.at_value) == (0.5, 3.0)


def test_burstiness_query_matches_oracle(spark):
    """Banked-row pre-validation (r13): the unregistered
    q_events_burstiness matches its DuckDB oracle typed-exact at
    sf0.001 (sf0.01 out-of-band, PLANS.md round 13)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark, entrymod.q_events_burstiness, entrymod._events_burstiness_oracle()
    )


def test_burstiness_python_mirror(spark):
    """burstiness_profile vs an exact Python mirror, covering the
    constant-gap clamp (sigma would be sqrt of a cancellation residue),
    session boundaries per user, and the n_gaps >= 2 filter."""
    import datetime as dt
    import math

    from scabillmatch_spark.operators.analytics import burstiness_profile

    t0 = dt.datetime(2024, 1, 1)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        # type 'a', user 1: gaps 10s, 20s, 30s
        ("a", 1, 100, ts(0)),
        ("a", 1, 101, ts(10)),
        ("a", 1, 102, ts(30)),
        ("a", 1, 103, ts(60)),
        # type 'a', user 2: one gap 5s (no gap crosses users)
        ("a", 2, 200, ts(0)),
        ("a", 2, 201, ts(5)),
        # type 'b': metronome 7s gaps -> var clamps to exactly 0, B = -1
        ("b", 1, 300, ts(0)),
        ("b", 1, 301, ts(7)),
        ("b", 1, 302, ts(14)),
        ("b", 1, 303, ts(21)),
        # type 'c': single event -> no gaps -> filtered
        ("c", 1, 400, ts(0)),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, user_id long, event_id long, ts timestamp"
    )
    got = {
        r.event_type: (r.n_gaps, r.mean_gap_us, r.cv_gap, r.burstiness)
        for r in burstiness_profile(df).collect()
    }

    def mirror(gaps_us):
        n = len(gaps_us)
        s1, s2 = float(sum(gaps_us)), float(sum(g * g for g in gaps_us))
        mu = s1 / n
        var = max((n * s2 - s1 * s1) / (n * (n - 1.0)), 0.0)
        sig = math.sqrt(var)
        return (
            n,
            round(mu, 6),
            round(sig / mu, 6),
            round((sig - mu) / (sig + mu), 6) + 0.0,
        )

    assert got == {
        "a": mirror([10_000_000, 20_000_000, 30_000_000, 5_000_000]),
        "b": mirror([7_000_000, 7_000_000, 7_000_000]),
    }
    assert got["b"][3] == -1.0  # metronome: sigma 0 -> B = -1 exactly
    assert "c" not in got


def test_chi2_query_matches_oracle(spark):
    """Banked-row pre-validation (r13): the unregistered
    q_doc_chi2_lang_source matches its DuckDB oracle typed-exact at
    sf0.001 (sf0.01 out-of-band, PLANS.md round 13)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_doc_chi2_lang_source,
        entrymod._doc_chi2_lang_source_oracle(),
    )


def test_chi2_independence_python_mirror(spark):
    """chi2_independence vs an exact Python mirror over a table WITH an
    empty cell (the closed-form remainder path) and a perfectly
    independent table (chi2 == 0.0 exactly)."""
    from scabillmatch_spark.operators.stats import chi2_independence

    # (a1,b1)=2 (a1,b2)=1 (a2,b1)=1, (a2,b2) EMPTY -> remainder path
    rows = [("a1", "b1")] * 2 + [("a1", "b2")] + [("a2", "b1")]
    df = spark.createDataFrame(rows, "x string, y string")
    r = chi2_independence(df, "x", "y").collect()[0]
    n = 4.0
    cells = {("a1", "b1"): 2, ("a1", "b2"): 1, ("a2", "b1"): 1}
    ta = {"a1": 3, "a2": 1}
    tb = {"b1": 3, "b2": 1}
    part = sum(
        (o - ta[a] * tb[b] / n) ** 2 / (ta[a] * tb[b] / n)
        for (a, b), o in cells.items()
    )
    es = sum(ta[a] * tb[b] / n for (a, b) in cells)
    raw = part + (n - es)
    import math

    assert r.chi2 == round(raw, 6)
    assert r.dof == 1
    assert r.cramers_v == round(math.sqrt(raw / (4.0 * 1)), 6)
    assert (r.n_rows, r.n_cells_occupied) == (4, 3)

    # independent 2x2 with equal counts: chi2 exactly 0
    rows2 = [("a1", "b1"), ("a1", "b2"), ("a2", "b1"), ("a2", "b2")] * 3
    r2 = chi2_independence(
        spark.createDataFrame(rows2, "x string, y string"), "x", "y"
    ).collect()[0]
    assert r2.chi2 == 0.0 and r2.cramers_v == 0.0

    # single-level column: dof 0 -> NULL cramers_v, chi2 still defined
    r3 = chi2_independence(
        spark.createDataFrame([("a", "b1"), ("a", "b2")], "x string, y string"),
        "x",
        "y",
    ).collect()[0]
    assert r3.dof == 0 and r3.cramers_v is None


def test_theil_query_matches_oracle(spark):
    """Banked-row pre-validation (r13): the unregistered
    q_nation_revenue_theil matches its DuckDB oracle typed-exact at
    sf0.001 (sf0.01 out-of-band, PLANS.md round 13)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_nation_revenue_theil,
        entrymod._nation_revenue_theil_oracle(),
    )


def test_theil_index_python_mirror(spark):
    """theil_index vs an exact Python mirror: a perfectly even group
    must print exactly 0.0 (the +0.0 fold — cancellation can land at
    -0.0), a whale group must be strongly positive, and a zero-valued
    member contributes nothing (0·ln 0 convention)."""
    import math

    from scabillmatch_spark.operators.stats import theil_index

    rows = [
        ("even", 10.0), ("even", 10.0), ("even", 10.0), ("even", 10.0),
        ("whale", 97.0), ("whale", 1.0), ("whale", 1.0), ("whale", 1.0),
        ("zeros", 5.0), ("zeros", 0.0), ("zeros", 5.0),
    ]
    df = spark.createDataFrame(rows, "g string, x double")
    got = {r.g: (r.n, r.theil) for r in theil_index(df, "g", "x").collect()}

    def mirror(xs):
        sx, nn = float(sum(xs)), float(len(xs))
        t = sum((x / sx) * math.log(x * nn / sx) for x in xs if x > 0)
        return (len(xs), round(t, 6) + 0.0)

    assert got == {
        "even": mirror([10.0] * 4),
        "whale": mirror([97.0, 1.0, 1.0, 1.0]),
        "zeros": mirror([5.0, 0.0, 5.0]),
    }
    assert got["even"][1] == 0.0 and math.copysign(1, got["even"][1]) == 1.0
    assert got["whale"][1] > 1.0


def test_rfm_approx_cuts_scale_path(spark):
    """The r15 scale path (KS bins= precedent): approx_cuts=True scores
    via approx-quantile cut literals — no global window. Pins: valid
    score range, per-key monotonicity, and +/-1 agreement with exact
    ntile on keys untied in the per-user frame (tie groups land whole
    in one bucket by design, so only untied keys are +/-1-comparable)."""
    from scabillmatch_spark.operators.analytics import rfm_scores
    from scabillmatch_spark.io.sources import read_table

    orders = read_table(spark, "/root/testdata/sf0.001", "orders")
    exact = rfm_scores(
        orders, "o_custkey", "o_orderdate", "o_totalprice"
    ).collect()
    approx = rfm_scores(
        orders, "o_custkey", "o_orderdate", "o_totalprice", approx_cuts=True
    ).collect()
    assert len(exact) == len(approx) > 0
    ea = {r.o_custkey: r for r in exact}
    ap = {r.o_custkey: r for r in approx}
    assert set(ea) == set(ap)
    for r in approx:
        for s in (r.r_score, r.f_score, r.m_score):
            assert 1 <= s <= 4
    # monotonicity: strictly smaller recency never gets a worse bucket
    by_rec = sorted(approx, key=lambda r: r.recency_days)
    for a, b in zip(by_rec, by_rec[1:]):
        if a.recency_days < b.recency_days:
            assert a.r_score <= b.r_score
    by_mon = sorted(approx, key=lambda r: -r.monetary)
    for a, b in zip(by_mon, by_mon[1:]):
        if a.monetary > b.monetary:
            assert a.m_score <= b.m_score
    # +/-1 vs exact ntile on untied keys per dimension
    from collections import Counter

    for key, a_field in (
        ("recency_days", "r_score"),
        ("frequency", "f_score"),
        ("monetary", "m_score"),
    ):
        counts = Counter(getattr(r, key) for r in exact)
        untied = [u for u, r in ea.items() if counts[getattr(r, key)] == 1]
        assert untied, f"no untied {key} values to compare"
        for u in untied:
            d = abs(getattr(ea[u], a_field) - getattr(ap[u], a_field))
            assert d <= 1, f"{key} user {u}: exact={getattr(ea[u], a_field)} approx={getattr(ap[u], a_field)}"


def test_kruskal_query_matches_oracle(spark):
    """Banked-row pre-validation (r15): the unregistered
    q_events_kruskal_wallis matches its DuckDB oracle typed-exact at
    sf0.001 (sf0.01 out-of-band, PLANS.md round 15)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_events_kruskal_wallis,
        entrymod._events_kruskal_wallis_oracle(),
    )


def test_cusum_query_matches_oracle(spark):
    """Banked-row pre-validation (r15): the unregistered
    q_events_cusum_drift matches its DuckDB oracle typed-exact at
    sf0.001 (sf0.01 out-of-band, PLANS.md round 15)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_events_cusum_drift,
        entrymod._events_cusum_drift_oracle(),
    )


def test_atkinson_query_matches_oracle(spark):
    """Banked-row pre-validation (r15): the unregistered
    q_nation_revenue_atkinson matches its DuckDB oracle typed-exact at
    sf0.001 (sf0.01 out-of-band, PLANS.md round 15)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_nation_revenue_atkinson,
        entrymod._nation_revenue_atkinson_oracle(),
    )


def test_hour_uniformity_query_matches_oracle(spark):
    """Banked-row pre-validation (r15): the unregistered
    q_events_hour_uniformity matches its DuckDB oracle typed-exact at
    sf0.001 (sf0.01 out-of-band, PLANS.md round 15)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_events_hour_uniformity,
        entrymod._events_hour_uniformity_oracle(),
    )


def test_kruskal_guards(spark):
    """k < 2 and all-tied inputs return empty typed frames (H undefined)."""
    from scabillmatch_spark.operators.stats import kruskal_wallis

    one_group = spark.createDataFrame(
        [(1.0, "a"), (2.0, "a")], "value double, event_type string"
    )
    assert kruskal_wallis(one_group).count() == 0
    all_tied = spark.createDataFrame(
        [(5.0, "a"), (5.0, "b"), (5.0, "b")], "value double, event_type string"
    )
    assert all_tied.count() == 3
    assert kruskal_wallis(all_tied).count() == 0
    empty = spark.createDataFrame([], "value double, event_type string")
    assert kruskal_wallis(empty).count() == 0


def test_cusum_locates_planted_shift(spark):
    """A level shift planted mid-stream must put at_pos at the shift
    boundary region and s_range near n/2 * shift/2."""
    from scabillmatch_spark.operators.analytics import cusum_drift
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (float(0 if i < 50 else 10), base + datetime.timedelta(seconds=i), i)
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "value double, ts timestamp, event_id long")
    out = cusum_drift(df).collect()[0]
    assert out.n == 100 and abs(out.mean - 5.0) < 1e-9
    # S descends to its extreme exactly at the change point (pos 50)
    assert out.at_pos == 50
    assert abs(out.s_range - 250.0) < 1e-6
    assert cusum_drift(df.filter("value IS NULL")).count() == 0


def test_runs_query_matches_oracle(spark):
    """Banked-row pre-validation (r15): the unregistered
    q_events_runs_test matches its DuckDB oracle typed-exact at
    sf0.001 (sf0.01 out-of-band, PLANS.md round 15)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_events_runs_test,
        entrymod._events_runs_test_oracle(),
    )


def test_grubbs_query_matches_oracle(spark):
    """Banked-row pre-validation (r15): the unregistered
    q_events_grubbs_test matches its DuckDB oracle typed-exact at
    sf0.001 (sf0.01 out-of-band, PLANS.md round 15)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_events_grubbs_test,
        entrymod._events_grubbs_test_oracle(),
    )


def test_runs_test_mirrors_and_guards(spark):
    """Python mirror on a crafted stream + the degenerate guards."""
    from scabillmatch_spark.operators.analytics import runs_test
    import datetime

    base = datetime.datetime(2024, 1, 1)
    # values 1..8 in a perfectly alternating above/below pattern around
    # the lower median (=4): 1,8,2,7,3,6,4(excl),5 -> classes 0,1,0,1,0,1,1
    vals = [1.0, 8.0, 2.0, 7.0, 3.0, 6.0, 4.0, 5.0]
    rows = [
        (v, base + datetime.timedelta(seconds=i), i) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "value double, ts timestamp, event_id long")
    out = runs_test(df).collect()
    assert len(out) == 1
    r = out[0]
    # median (lower) of 8 values = 4th smallest = 4.0, excluded; 7 left:
    # classes in ts order: 0,1,0,1,0,1,1 -> 6 runs, n_above=4, n_below=3
    assert (r.n_above, r.n_below, r.runs) == (4, 3, 6)
    # guards: empty, one-class, n1=n2=1
    assert runs_test(df.filter("value IS NULL")).count() == 0
    one_cls = spark.createDataFrame(
        [(1.0, base, 0), (5.0, base + datetime.timedelta(seconds=1), 1)],
        "value double, ts timestamp, event_id long",
    )
    # 2 values: median=1.0 (excluded), only 5.0 left -> one class -> empty
    assert runs_test(one_cls).count() == 0


def test_grubbs_locates_planted_outlier(spark):
    """A single planted outlier must be the argmax with a large G."""
    from scabillmatch_spark.operators.analytics import grubbs_test

    rows = [(float(i % 5), i) for i in range(50)]
    rows.append((1000.0, 999))
    df = spark.createDataFrame(rows, "value double, event_id long")
    out = grubbs_test(df).collect()
    assert len(out) == 1
    assert out[0].at_id == 999 and out[0].g > 5.0
    # all-equal -> zero variance -> empty; n<3 -> empty
    allsame = spark.createDataFrame([(2.0, i) for i in range(9)], "value double, event_id long")
    assert grubbs_test(allsame).count() == 0
    assert grubbs_test(df.limit(2)).count() == 0


def test_cvm_query_matches_oracle(spark):
    """Banked-row pre-validation (r15): the unregistered
    q_events_cramer_von_mises matches its DuckDB oracle typed-exact at
    sf0.001 (sf0.01 out-of-band, PLANS.md round 15)."""
    import __spark_entry__ as entrymod

    _gate_compare(
        spark,
        entrymod.q_events_cramer_von_mises,
        entrymod._events_cramer_von_mises_oracle(),
    )


def test_cvm_mirrors_brute_force(spark):
    """T matches a brute-force Python ECDF integral on a crafted pair
    of samples, and identical samples give T = 0."""
    from scabillmatch_spark.operators.stats import cramer_von_mises

    a = [1.0, 2.0, 2.0, 5.0]
    b = [2.0, 3.0, 4.0]
    rows = [(x, "click") for x in a] + [(x, "purchase") for x in b]
    df = spark.createDataFrame(rows, "value double, event_type string")
    out = cramer_von_mises(df, "click", "purchase").collect()[0]
    na, nb = len(a), len(b)

    def ecdf(s, x):
        return sum(1 for y in s if y <= x) / len(s)

    t_ref = (na * nb) / (na + nb) ** 2 * sum(
        (ecdf(a, x) - ecdf(b, x)) ** 2 for x in a + b
    )
    assert (out.n_a, out.n_b) == (na, nb)
    assert abs(out.t_cvm - t_ref) < 1e-6
    same = spark.createDataFrame(
        [(x, t) for x in a for t in ("click", "purchase")],
        "value double, event_type string",
    )
    assert cramer_von_mises(same, "click", "purchase").collect()[0].t_cvm == 0.0
    assert cramer_von_mises(df.filter("value > 100"), "click", "purchase").count() == 0
