"""Round-11 verdict ask #5: the streaming family at sf1 (100x the
correctness gate).

The stateful paths were Zipf-proven at 10.1x hot-key events in round
10 but had never run at `.stress/sf1.0` (uniform 10x replica of
sf0.1 = 100x sf0.01). This script runs every streaming entry at
sf0.1 and sf1.0 under the shared bench protocol (`timed_cold_run`,
min-of-2) and — the "per-key state metrics" half of the ask — attaches
a `StreamingQueryListener` that records, per entry and corpus, the
MAX over micro-batches of each state operator's `numRowsTotal` and
`memoryUsedBytes`. Bounded-state proof = state rows grow ~linearly in
keys (never in events) and memory stays flat-ish; anything key-count-
super-linear is a state leak.

Usage:
    python scripts/streaming_sf1.py [entry1,entry2,...]
Prints one JSON line; progress to stderr.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener

DIRS = ["/root/testdata/sf0.1", "/root/repo/.stress/sf1.0"]


class _StateCapture(StreamingQueryListener):
    """Max state-operator rows/memory across all progress events since
    the last reset. availableNow runs several micro-batches; the max is
    the steady-state footprint the cluster must hold."""

    def __init__(self) -> None:
        self.max_rows = 0
        self.max_mem = 0
        self.ops = 0

    def reset(self) -> None:
        self.max_rows = self.max_mem = self.ops = 0

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        ops = event.progress.stateOperators
        self.ops = max(self.ops, len(ops))
        rows = sum(o.numRowsTotal for o in ops)
        mem = sum(o.memoryUsedBytes for o in ops)
        self.max_rows = max(self.max_rows, rows)
        self.max_mem = max(self.max_mem, mem)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def main() -> None:
    from bench import timed_cold_run, wait_for_quiesce
    from backend_model_spark.plans import registry
    from backend_model_spark.session import get_spark

    spark = get_spark("streaming-sf1")
    qs = registry.queries()
    names = (
        sys.argv[1].split(",")
        if len(sys.argv) > 1
        else sorted(n for n in qs if n.startswith("streaming_"))
    )
    cap = _StateCapture()
    spark.streams.addListener(cap)

    quiesce = wait_for_quiesce(60.0, 4.0)
    print(f"quiesce: {quiesce}", file=sys.stderr)

    out: dict = {}
    for name in names:
        fn = qs[name]
        out[name] = {}
        for d in DIRS:
            base = os.path.basename(d.rstrip("/"))
            best, rows, mem, ops = None, 0, 0, 0
            for run in range(2):
                # progress events are delivered async on the listener
                # bus: settle before reset or a long prior query's
                # final progress lands in THIS entry's capture (the
                # round-11 foreach_batch cross-talk)
                import time as _time

                _time.sleep(1.5)
                cap.reset()
                sec, load = timed_cold_run(spark, fn, d)
                _time.sleep(1.0)  # drain this run's own tail events
                best = sec if best is None else min(best, sec)
                rows = max(rows, cap.max_rows)
                mem = max(mem, cap.max_mem)
                ops = max(ops, cap.ops)
                print(
                    f"{name} @ {base} run{run}: {sec}s load={load} "
                    f"state_rows={cap.max_rows} state_mb={cap.max_mem / 1e6:.1f}",
                    file=sys.stderr,
                )
            out[name][base] = {
                "sec": best,
                "state_rows_max": rows,
                "state_mb_max": round(mem / 1e6, 1),
                "state_ops": ops,
            }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
