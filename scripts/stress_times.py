"""Time a list of registered queries at one or more SF dirs with the
bench protocol — IMPORTED from bench.py (`timed_cold_run` +
`wait_for_quiesce`), so the stress ledger and the headline bench
cannot drift apart (round-8 review finding).

Built for the round-8 dual-corpus stress ledger: the same query list
runs at sf0.1, the full-replica 10x (.stress/sf1.0 — every row
duplicated exactly 10x, pathological for bucket-join LSH) and the
Zipf 10x (.stress/sf1.0zipf — most rows unique, a few hot
exact-duplicate groups, the representative web-crawl shape).

Usage:
    python scripts/stress_times.py q1,q2,... DIR1 [DIR2 ...]
Prints one JSON line: {query: {dir_basename: min_sec, ...}, ...}
Per-run times and loads go to stderr.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    dirs = sys.argv[2:]
    from bench import timed_cold_run, wait_for_quiesce
    from backend_model_spark.plans import registry
    from backend_model_spark.session import get_spark

    spark = get_spark("stress-times")
    qs = registry.queries()
    # warmup: JIT + codegen + parquet footer caches
    qs["q1_pricing_summary"](spark, dirs[0]).write.format("noop").mode(
        "overwrite"
    ).save()
    quiesce = wait_for_quiesce(
        max_wait_s=float(os.environ.get("BENCH_QUIESCE_MAX_WAIT", "180")),
        gate=float(os.environ.get("BENCH_QUIESCE_GATE", "1.5")),
    )
    print(f"# quiesce: {quiesce}", file=sys.stderr)

    out: dict[str, dict[str, float]] = {n: {} for n in names}
    for d in dirs:
        key = os.path.basename(d.rstrip("/"))
        for name in names:
            runs, loads = [], []
            for _ in range(2):
                sec, load = timed_cold_run(spark, qs[name], d)
                runs.append(round(sec, 2))
                loads.append(load)
            out[name][key] = min(runs)
            print(
                f"# {name} @ {key}: {runs} (loads {loads}) -> {min(runs)}",
                file=sys.stderr,
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
