"""Interleaved A/B: scratch-root placement for round-trip/streaming rows
(r12 session 3). /tmp is disk-backed ext4 on this host; /dev/shm is a
128 GiB tmpfs. Every _tmp_workdir consumer writes ephemeral data
(staging, checkpoints, copy-on-write rewrites, io round-trips), so the
root should be the fastest local medium. Arms toggle SPARK_GRAFT_TMPDIR
in-process (read per _tmp_workdir call), same session, min-of-N.

Usage: python tools_tmpfs_ab.py [n_trials] [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from scabillmatch_spark.session import get_spark

    spark = get_spark("tmpfs_ab", shuffle_partitions=32)
    import __spark_entry__ as E

    ROWS = [
        ("io_avro_roundtrip", E.q_io_avro_roundtrip),
        ("io_csv_roundtrip", E.q_io_csv_roundtrip),
        ("io_sorted_compact", E.q_io_sorted_compact),
        ("stream_merge_upsert", E.q_stream_merge_upsert),
        ("stream_ingest_dedup", E.q_stream_ingest_dedup),
    ]

    def run_all(root: str | None) -> dict[str, float]:
        if root is None:
            os.environ.pop("SPARK_GRAFT_TMPDIR", None)
        else:
            os.environ["SPARK_GRAFT_TMPDIR"] = root
        out = {}
        for name, fn in ROWS:
            t0 = time.monotonic()
            fn(spark, sf_dir).count()
            out[name] = time.monotonic() - t0
        return out

    arms: dict[str, list[dict[str, float]]] = {"disk": [], "shm": []}
    run_all("/tmp"); run_all(None)  # warmup both arms, not recorded
    for t in range(trials):
        arms["disk"].append(run_all("/tmp"))
        arms["shm"].append(run_all(None))
        print(f"trial {t + 1} done", file=sys.stderr)
    os.environ.pop("SPARK_GRAFT_TMPDIR", None)
    mins = {
        arm: {name: min(tr[name] for tr in trs) for name, _ in ROWS}
        for arm, trs in arms.items()
    }
    print(json.dumps({"mins": mins, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
