"""Environment-robustness sweep: prove every hashed registry output is
invariant to Spark session geometry.

Both driver red rows in rounds 1-4 were *environment-sensitive
nondeterminism* — outputs that hash-matched under the builder's session
config but flipped under the round driver's (libm last-ulp under a
different JVM, per-Arrow-chunk folds that change with batch size).  The
DuckDB oracle sweep cannot catch these: it compares one Spark geometry
against DuckDB.  This script compares Spark against *itself* under two
deliberately different geometries:

  default   : local[8],  shuffle.partitions=8,  AQE on,  arrow batch 10k
  perturbed : local[3],  shuffle.partitions=7,  AQE off, arrow batch 64

A query whose value-hash differs between the two runs would be a latent
driver hash-FAIL.  Known partition-sensitive approximations (HLL bucket
counts, kmeans inits, brp joins) are rows-only at the driver too and are
reported separately, not enforced.

Usage:
  ENVPROF=default   python scripts/env_robustness.py   # writes /tmp/envhash_default.json
  ENVPROF=perturbed python scripts/env_robustness.py   # writes /tmp/envhash_perturbed.json
  ENVPROF=compare   python scripts/env_robustness.py   # diffs the two files

ONLY=name1,name2 limits to named queries; SF switches the data dir.
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SF", "/root/testdata/sf0.01")
PROF = os.environ.get("ENVPROF", "default")

# Entries whose output is legitimately partition-geometry-sensitive:
# every one is registered rows-only (no oracle_sql) at the driver, so a
# hash flip here is expected and not a parity risk.  Everything else —
# including the other rows-only entries — must be bit-stable.
GEOMETRY_SENSITIVE = {
    "mllib_kmeans_clusters",   # MLlib kmeans|| init samples per-partition
    "mllib_pca_variance",      # dense SVD sign/ulp depends on row order
    "mllib_brp_ann_join",      # random hyperplanes drawn per-fit
    "mllib_minhash_neardup",   # random coefficients drawn per-fit
    "ml_logistic_irls",        # float tree-aggregation order
}

PROFILES = {
    "default": {
        "master": "local[8]",
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    },
    "perturbed": {
        "master": "local[3]",
        "spark.sql.shuffle.partitions": "7",
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "64",
    },
}


def vhash(pdf):
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(str(row[c]) for c in cols) for _, row in pdf[cols].iterrows()
    )
    return hashlib.md5(json.dumps(rows).encode()).hexdigest()[:12]


def run_profile(prof):
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    cfg = PROFILES[prof]
    b = (
        SparkSession.builder.master(cfg["master"])
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName(f"env-robustness-{prof}")
    )
    for k, v in cfg.items():
        if k != "master":
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    qs = e.queries()
    only = os.environ.get("ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        qs = {n: f for n, f in qs.items() if n in keep}

    out = {}
    for name, fn in qs.items():
        try:
            pdf = fn(spark, SF).toPandas()
            out[name] = [len(pdf), vhash(pdf)]
        except Exception as ex:  # noqa: BLE001
            out[name] = [-1, f"ERROR: {ex}"[:200]]
        print(f"{name}: rows={out[name][0]} hash={out[name][1]}", flush=True)

    path = f"/tmp/envhash_{prof}{os.environ.get('ENVTAG', '')}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"\nwrote {path} ({len(out)} entries)")


def compare():
    tag = os.environ.get("ENVTAG", "")
    a = json.load(open(f"/tmp/envhash_default{tag}.json"))
    b = json.load(open(f"/tmp/envhash_perturbed{tag}.json"))
    enforced_diffs, expected_diffs, errors = [], [], []
    for name in sorted(set(a) & set(b)):
        if str(a[name][1]).startswith("ERROR") or str(b[name][1]).startswith("ERROR"):
            errors.append(name)
        elif a[name] != b[name]:
            (expected_diffs if name in GEOMETRY_SENSITIVE else enforced_diffs).append(name)
    missing = sorted(set(a) ^ set(b))
    print(f"compared {len(set(a) & set(b))} entries")
    print(f"geometry-sensitive (allowed) diffs: {expected_diffs}")
    if errors:
        print(f"ERRORS: {errors}")
    if missing:
        print(f"MISSING from one side: {missing}")
    if enforced_diffs:
        print(f"ENFORCED DIFFS (latent driver hash-fails): {enforced_diffs}")
        for n in enforced_diffs:
            print(f"  {n}: default={a[n]} perturbed={b[n]}")
    ok = not enforced_diffs and not errors and not missing
    print("\nENV-ROBUSTNESS:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    if PROF == "compare":
        compare()
    else:
        run_profile(PROF)
