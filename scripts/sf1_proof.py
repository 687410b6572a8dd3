"""Round-10 verdict ask #5: the 100x-direction proof point.

Times the heavy families (dedup md5 chain, IVF-PQ, events) at sf0.1
and at sf1 (.stress/sf1.0 — 10x sf0.1 = 100x the sf0.01 correctness
gate) under the shared bench protocol, and — new versus the plain
stress sweeps of rounds 3-9 — records per-run STAGE EVIDENCE from the
Spark REST API (this session runs with the UI enabled): number of
stages, summed shuffle read/write bytes and input records across the
run's stages. Linear-scaling proof = shuffle volume and input records
grow ~10x while stage count stays flat; anything super-linear that is
not output-bound is a bug to fix.

Usage:
    python scripts/sf1_proof.py [entry1,entry2,...]
Prints one JSON line per entry to stdout; progress to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = [
    # dedup md5 chain
    "dedup_exact_groups",
    "dedup_minhash_lsh_candidates",
    "dedup_lsh_verified",
    "dedup_duplicate_clusters",
    "dedup_chunk_first_wins",
    "dedup_substring_spans",
    # ANN scale path
    "sim_ivfpq_topk",
    "sim_pq_adc_topk",
    # events family
    "events_sessionize",
    "events_asof_join",
    "events_funnel",
]

DIRS = ["/root/testdata/sf0.1", "/root/repo/.stress/sf1.0"]
UI = None  # resolved from spark.sparkContext.uiWebUrl in main()


def _stages() -> list[dict]:
    with urllib.request.urlopen(f"{UI}/applications", timeout=10) as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{UI}/applications/{app_id}/stages?status=complete", timeout=10
    ) as r:
        return json.load(r)


def _stage_totals(stages: list[dict], seen: set[tuple]) -> dict:
    new = [s for s in stages if (s["stageId"], s["attemptId"]) not in seen]
    return {
        "stages": len(new),
        "input_records": sum(s.get("inputRecords", 0) for s in new),
        "shuffle_read_mb": round(
            sum(s.get("shuffleReadBytes", 0) for s in new) / 1e6, 1
        ),
        "shuffle_write_mb": round(
            sum(s.get("shuffleWriteBytes", 0) for s in new) / 1e6, 1
        ),
    }


def main() -> None:
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else HEAVY
    from bench import canary_ms, timed_cold_run, wait_for_quiesce
    from backend_model_spark.plans import registry
    from backend_model_spark.session import get_spark

    spark = get_spark("sf1-proof", extra_conf={"spark.ui.enabled": "true"})
    global UI
    # NEVER hardcode 4040: a co-running Spark app pushes this session
    # to 4041+ and the hardcoded port would silently read the OTHER
    # application's stage metrics (review-pass find)
    UI = f"{spark.sparkContext.uiWebUrl}/api/v1"
    qs = registry.queries()
    qs["q1_pricing_summary"](spark, DIRS[0]).write.format("noop").mode(
        "overwrite"
    ).save()
    q = wait_for_quiesce(max_wait_s=180, gate=1.5)
    print(f"# quiesce: {q}", file=sys.stderr)

    for name in names:
        row: dict = {"query": name}
        for d in DIRS:
            key = os.path.basename(d.rstrip("/"))
            cn = canary_ms()
            # min-of-2 cold runs; stage metrics from the faster run's
            # second execution would double-count, so take metrics from
            # run 1 (cold) and wall from the min — stage VOLUME is
            # deterministic per corpus, wall is the noisy part.
            seen = {(s["stageId"], s["attemptId"]) for s in _stages()}
            sec1, load1 = timed_cold_run(spark, qs[name], d)
            totals = _stage_totals(_stages(), seen)
            sec2, load2 = timed_cold_run(spark, qs[name], d)
            out_rows = qs[name](spark, d).count()
            row[key] = {
                "wall_s": min(sec1, sec2),
                "runs": [sec1, sec2],
                "loads": [load1, load2],
                "canary_ms": cn,
                "out_rows": out_rows,
                **totals,
            }
            print(f"# {name} @ {key}: {row[key]}", file=sys.stderr)
        a, b = row[os.path.basename(DIRS[0])], row["sf1.0"]
        row["factor_wall"] = round(b["wall_s"] / max(a["wall_s"], 1e-9), 2)
        row["factor_shuffle"] = round(
            (b["shuffle_read_mb"] + b["shuffle_write_mb"])
            / max(a["shuffle_read_mb"] + a["shuffle_write_mb"], 1e-9),
            2,
        )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
