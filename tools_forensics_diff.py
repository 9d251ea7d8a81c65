"""Diff forensic records against their DuckDB oracles, cell by cell.

The two historically driver-red queries (io_csv_roundtrip,
doc_dedup_rewrite) append every invocation's computed rows to
forensics/<query>.jsonl (see forensics/README.md). After a driver gate run,
this tool answers the question two rounds of remediation could not: WHICH
cell did the gate's session compute differently from the oracle — or were
both sides equal, implicating the gate's comparator instead.

For each record it re-runs the query's oracle SQL on the record's sf_dir
and prints per-(lang, column) mismatches; records whose argv belongs to a
builder tool (rehearsal/chaos/pytest/bench) are skipped unless --all.

Usage:
    python tools_forensics_diff.py             # gate-candidate records only
    python tools_forensics_diff.py --all       # every record
    python tools_forensics_diff.py --query io_csv_roundtrip
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)
BUILDER_ARGV_MARKERS = (
    "tools_driver_rehearsal",
    "tools_chaos_oracle",
    "tools_forensics_diff",
    "pytest",
    "bench.py",
)
QUERIES = ("io_csv_roundtrip", "doc_dedup_rewrite")


def _is_builder(rec: dict) -> bool:
    argv = " ".join(rec.get("argv") or [])
    if any(m in argv for m in BUILDER_ARGV_MARKERS):
        return True
    # heredoc / interactive probes run as bare "python -"
    return argv.strip() in ("", "-")


_ORACLE_CACHE: dict[tuple[str, str], list] = {}


def _oracle_rows(query: str, sf_dir: str):
    # one oracle execution per (query, sf_dir): the dedup oracle's
    # recursive reachability CTE costs ~10s and --all replays many records
    cached = _ORACLE_CACHE.get((query, sf_dir))
    if cached is not None:
        return cached
    import duckdb

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(entrymod.oracle_sql()[query])
    cols = [d[0] for d in cur.description]
    rows = [dict(zip(cols, r)) for r in cur.fetchall()]
    _ORACLE_CACHE[(query, sf_dir)] = rows
    return rows


def _norm(v):
    if isinstance(v, float):
        return round(v, 9)
    try:  # HUGEINT/Decimal -> int
        import decimal

        if isinstance(v, decimal.Decimal):
            return int(v)
    except Exception:
        pass
    return v


def diff_record(query: str, rec: dict) -> list[str]:
    """Return human-readable mismatch lines for one forensic record."""
    sf_dir = rec["sf_dir"]
    if not os.path.isdir(sf_dir):
        return [f"  sf_dir missing on this host: {sf_dir} — cannot re-oracle"]
    oracle = {r["lang"]: r for r in _oracle_rows(query, sf_dir)}
    spark_side = {r["lang"]: r for r in rec["rows"]}
    out = []
    for lang in sorted(set(oracle) | set(spark_side)):
        o, s = oracle.get(lang), spark_side.get(lang)
        if o is None or s is None:
            out.append(f"  lang={lang}: present only on "
                       f"{'spark' if o is None else 'oracle'} side")
            continue
        for col in o:
            if col in s and _norm(o[col]) != _norm(s[col]):
                out.append(
                    f"  lang={lang} col={col}: spark={s[col]!r}"
                    f" oracle={o[col]!r}"
                )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true",
                    help="include builder-tool records, not just gate candidates")
    ap.add_argument("--query", choices=QUERIES, action="append")
    args = ap.parse_args()
    queries = args.query or list(QUERIES)
    n_bad = 0
    for q in queries:
        path = os.path.join(REPO, "forensics", f"{q}.jsonl")
        if not os.path.exists(path):
            print(f"{q}: no forensic records yet")
            continue
        records = []
        with open(path, encoding="utf-8") as fh:
            for lineno, line in enumerate(fh, 1):
                if not line.strip():
                    continue
                try:
                    records.append(json.loads(line))
                except ValueError:
                    # a torn/corrupt line (e.g. interleaved append) must
                    # not crash the analysis of every OTHER record
                    print(f"WARN {q}: skipping unparsable line {lineno}")
        shown = 0
        for rec in records:
            if not args.all and _is_builder(rec):
                continue
            shown += 1
            tag = (f"{q} @ {rec['ts_utc']} pid={rec['pid']}"
                   f" argv={rec.get('argv')} sf={rec['sf_dir']}")
            mism = diff_record(q, rec)
            if mism:
                n_bad += 1
                print(f"DIVERGED {tag}")
                print("\n".join(mism))
            else:
                print(f"equal    {tag}")
        if not shown:
            print(f"{q}: {len(records)} records, none from a non-builder "
                  "process (use --all to include them)")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
