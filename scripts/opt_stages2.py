"""Per-stage wall breakdown for one query's SECOND cold run (guide
§1/§7): the bench reports min-of-2, and in-process session memos make
run 2 take the (cheaper) revalidation path — so run 2, not run 1, is
the shape the headline number measures. Runs the query twice under
the shared cold protocol and prints run 2's stages.

Usage: python scripts/opt_stages2.py <query_name> [n_warm]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import timed_cold_run
    from backend_model_spark.plans import registry
    from backend_model_spark.session import get_spark

    name = sys.argv[1]
    n_warm = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_spark("opt-stages2", extra_conf={"spark.ui.enabled": "true"})
    ui = spark.sparkContext.uiWebUrl + "/api/v1"
    qs = registry.queries()

    qs["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    with urllib.request.urlopen(f"{ui}/applications", timeout=10) as r:
        app = json.load(r)[0]["id"]

    def stages():
        with urllib.request.urlopen(
            f"{ui}/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            return json.load(r)

    for i in range(n_warm):
        sec, _ = timed_cold_run(spark, qs[name], SF_DIR)
        print(f"warm run {i + 1}: {sec:.3f}s")
    seen = {(s["stageId"], s["attemptId"]) for s in stages()}
    sec, _ = timed_cold_run(spark, qs[name], SF_DIR)
    new = sorted(
        (s for s in stages() if (s["stageId"], s["attemptId"]) not in seen),
        key=lambda s: s["submissionTime"],
    )
    print(f"{name} run {n_warm + 1}: {sec:.3f}s total, {len(new)} stages")

    def ts(x):
        return datetime.strptime(x[:23], "%Y-%m-%dT%H:%M:%S.%f")

    prev_end = None
    for s in new:
        sub, comp = ts(s["submissionTime"]), ts(s["completionTime"])
        dur = (comp - sub).total_seconds()
        gap = (sub - prev_end).total_seconds() if prev_end else 0.0
        prev_end = max(prev_end, comp) if prev_end else comp
        print(
            f"  stage {s['stageId']:4d} gap={gap:6.3f} dur={dur:6.3f}"
            f" tasks={s['numCompleteTasks']:3d}"
            f" in={s.get('inputBytes', 0) / 1e6:7.2f}MB"
            f" sr={s.get('shuffleReadBytes', 0) / 1e6:6.2f}MB"
            f"   {s.get('description') or s['name'][:70]}"
        )


if __name__ == "__main__":
    main()
