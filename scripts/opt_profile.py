"""Round-11 optimization profiler (guide §1: measure first).

For each requested headline query at $SPARK_GRAFT_SF_DIR:
  * dump `.explain("formatted")` to plans/r11/<name>_<TAG>.txt
    (TAG=before|after, from $PLAN_TAG; empty TAG skips the dump)
  * run the query N times (default 2) under the bench's shared
    cold-run protocol (clearCache + GC + settle, noop sink)
  * record per-run stage evidence from the REST API: stage count,
    shuffle read/write bytes, input bytes/records, output rows

Usage:
    PLAN_TAG=before python scripts/opt_profile.py [q1,q2,...]
Prints one JSON line per entry; progress to stderr.
"""

from __future__ import annotations

import json
import os
import re
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAG = os.environ.get("PLAN_TAG", "")
RUNS = int(os.environ.get("PROFILE_RUNS", "2"))
PLAN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLAN_ROUND", "r12"),
)

UI = None


def _app_id() -> str:
    with urllib.request.urlopen(f"{UI}/applications", timeout=10) as r:
        return json.load(r)[0]["id"]


def _stages(app_id: str) -> list[dict]:
    with urllib.request.urlopen(
        f"{UI}/applications/{app_id}/stages?status=complete", timeout=10
    ) as r:
        return json.load(r)


def _totals(stages: list[dict], seen: set) -> dict:
    new = [s for s in stages if (s["stageId"], s["attemptId"]) not in seen]
    out = {
        "stages": len(new),
        "shuffle_read_mb": round(
            sum(s.get("shuffleReadBytes", 0) for s in new) / 1e6, 2
        ),
        "shuffle_write_mb": round(
            sum(s.get("shuffleWriteBytes", 0) for s in new) / 1e6, 2
        ),
        "input_mb": round(sum(s.get("inputBytes", 0) for s in new) / 1e6, 2),
        "tasks": sum(s.get("numCompleteTasks", 0) for s in new),
    }
    seen.update((s["stageId"], s["attemptId"]) for s in new)
    return out


def main() -> None:
    global UI
    from bench import HEADLINE, timed_cold_run
    from backend_model_spark.plans import registry
    from backend_model_spark.session import get_spark

    names = sys.argv[1].split(",") if len(sys.argv) > 1 else HEADLINE
    spark = get_spark(
        "opt-profile", extra_conf={"spark.ui.enabled": "true"}
    )
    UI = spark.sparkContext.uiWebUrl + "/api/v1"
    qs = registry.queries()

    os.makedirs(PLAN_DIR, exist_ok=True)
    seen: set = set()
    # warmup (JIT/codegen/footers) — same as bench.py
    qs["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    _totals(_stages(_app_id()), seen)

    for name in names:
        fn = qs[name]
        if TAG:
            df = fn(spark, SF_DIR)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(PLAN_DIR, f"{name}_{TAG}.txt"), "w") as f:
                f.write(plan)
            _totals(_stages(_app_id()), seen)  # drop any build-time jobs
        if RUNS == 0:  # plans-only mode
            print(f"  {name}: plan dumped", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"opt-profile: {name}")
        runs, evidence = [], []
        for _ in range(RUNS):
            sec, load = timed_cold_run(spark, fn, SF_DIR)
            runs.append(sec)
            evidence.append(_totals(_stages(_app_id()), seen))
        spark.sparkContext.setJobDescription(None)
        rec = {
            "name": name,
            "min_sec": min(runs),
            "runs": runs,
            "stage_evidence": evidence,
        }
        print(json.dumps(rec), flush=True)
        print(f"  {name}: {min(runs):.2f}s  {evidence[-1]}", file=sys.stderr)


if __name__ == "__main__":
    main()
