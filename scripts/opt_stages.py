"""Per-stage wall breakdown for one query (guide §1/§7): runs the
query once cold, then prints each stage's name, duration, task count,
and the submission-gap since the previous stage ended (scheduler /
driver-side dead time between stages).

Usage: python scripts/opt_stages.py <query_name>
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from bench import timed_cold_run
    from backend_model_spark.plans import registry
    from backend_model_spark.session import get_spark

    name = sys.argv[1]
    spark = get_spark("opt-stages", extra_conf={"spark.ui.enabled": "true"})
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

    seen = {(s["stageId"], s["attemptId"]) for s in stages()}
    sec, _ = timed_cold_run(spark, qs[name], SF_DIR)
    new = sorted(
        (s for s in stages() if (s["stageId"], s["attemptId"]) not in seen),
        key=lambda s: s["submissionTime"],
    )
    print(f"{name}: {sec:.3f}s total, {len(new)} stages")
    prev_end = None
    from datetime import datetime

    def ts(x):
        return datetime.strptime(x[:23], "%Y-%m-%dT%H:%M:%S.%f")

    for s in new:
        sub, comp = ts(s["submissionTime"]), ts(s["completionTime"])
        dur = (comp - sub).total_seconds()
        gap = (sub - prev_end).total_seconds() if prev_end else 0.0
        prev_end = max(prev_end, comp) if prev_end else comp
        det = (s.get("details") or "").split("\n")
        det = next((l for l in det if "backend_model_spark" in l or "scale_utils" in l), det[0] if det else "")
        print(
            f"  stage {s['stageId']:>4} gap={gap:6.3f} dur={dur:6.3f} "
            f"tasks={s['numCompleteTasks']:>3} "
            f"in={s.get('inputBytes', 0)/1e6:7.2f}MB "
            f"sr={s.get('shuffleReadBytes', 0)/1e6:6.2f}MB  "
            f"{(s.get('description') or '')[:40]} {det.strip()[:80]}"
        )


if __name__ == "__main__":
    main()
