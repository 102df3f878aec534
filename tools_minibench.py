"""Interleaved mini-bench for optimization A/B runs (round 16 tooling).

Usage: python tools_minibench.py TAG q1 q2 ... [--rounds N] [--sf DIR]

Runs the named declared queries INTERLEAVED for N rounds (default 3) on
the bench session config (local[$SPARK_GRAFT_CPUS]), reports per-query
min/median, and appends a JSON record to /tmp/mini_log.jsonl so
before/after edits can be compared with the x09_lang_id / q67 controls
in the same record (the bench's own adjudication pair).

This is measurement tooling only — it changes nothing about bench.py's
driver contract.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:]]
    rounds = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1])
        del args[i:i + 2]
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    tag, names = args[0], args[1:]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from meshinsights_data_pipeline_spark.plans.queries import QUERIES
    from meshinsights_data_pipeline_spark.session import get_spark, read_table

    # resolve bare prefixes (x12 -> x12_embedding_neardup_lsh)
    full = []
    for nm in names:
        hits = [n for n in QUERIES if n == nm or n.split("_")[0] == nm]
        if not hits:
            raise SystemExit(f"no such query: {nm}")
        full.append(hits[0])
    controls = [c for c in ("x09_lang_id", "q67") if c not in full]
    run_list = full + controls

    spark = get_spark("mini-bench")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    read_table(spark, sf_dir, "region").write.format("noop").mode(
        "overwrite"
    ).save()

    runs: dict[str, list[float]] = {n: [] for n in run_list}
    for _ in range(rounds + 1):  # +1: first round is the cold pass
        for n in run_list:
            t0 = time.perf_counter()
            QUERIES[n].spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[n].append(round(time.perf_counter() - t0, 3))
    rec = {
        "tag": tag,
        "ts": time.strftime("%H:%M:%S"),
        "sf_dir": sf_dir,
        "warm_min": {n: min(v[1:]) for n, v in runs.items()},
        "warm_med": {
            n: round(statistics.median(v[1:]), 3) for n, v in runs.items()
        },
        "all": runs,
    }
    with open("/tmp/mini_log.jsonl", "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    for n in run_list:
        print(f"{n:45s} cold {runs[n][0]:7.3f}  warm_min {min(runs[n][1:]):7.3f}  all {runs[n]}")


if __name__ == "__main__":
    main()
