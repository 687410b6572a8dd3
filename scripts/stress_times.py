"""Time a list of registered queries at one or more SF dirs with the
bench protocol (noop sink, min-of-2, clearCache + double GC quiesce).

Built for the round-8 dual-corpus stress ledger: the same query list
runs at sf0.1, the full-replica 10x (.stress/sf1.0 — every row
duplicated exactly 10x, pathological for bucket-join LSH) and the
Zipf 10x (.stress/sf1.0zipf — most rows unique, a few hot
exact-duplicate groups, the representative web-crawl shape).

Usage:
    python scripts/stress_times.py q1,q2,... DIR1 [DIR2 ...]
Prints one JSON line: {query: {dir_basename: min_sec, ...}, ...}
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n]
    dirs = sys.argv[2:]
    from backend_model_spark.plans import registry
    from backend_model_spark.session import get_spark

    spark = get_spark("stress-times")
    qs = registry.queries()
    # warmup: JIT + codegen + parquet footer caches
    qs["q1_pricing_summary"](spark, dirs[0]).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict[str, float]] = {n: {} for n in names}
    for d in dirs:
        key = os.path.basename(d.rstrip("/"))
        for name in names:
            runs = []
            for _ in range(2):
                spark.catalog.clearCache()
                gc.collect()
                spark._jvm.System.gc()
                time.sleep(2.0)
                t0 = time.monotonic()
                qs[name](spark, d).write.format("noop").mode("overwrite").save()
                runs.append(round(time.monotonic() - t0, 2))
            out[name][key] = min(runs)
            print(f"# {name} @ {key}: {runs} -> {min(runs)}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
