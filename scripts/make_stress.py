"""Build a key-shifted K× replica of an SF dir for stress runs.

Replica k shifts every join key by k·SHIFT so referential integrity
holds within each replica and replicas never cross-join: a 10× sf0.1
behaves like a genuinely larger fact universe (10× customers, orders,
lineitems, events, docs), while the dimension tables nation/region
stay shared (as they would at any scale). Document text and embedding
vectors are exact clones across replicas — deliberately: dedup and
CC see true 10-way duplicate clusters, the harsher test for the
candidate→verify→decision path.

Usage:
    python scripts/make_stress.py [SRC] [DST] [K]
defaults: /root/testdata/sf0.1 → .stress/sf1.0 at K=10.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import reduce

from pyspark.sql import functions as F

from backend_model_spark.session import get_spark

SHIFT = 10_000_000_000

# per-table join-key columns to shift per replica (empty = shared dim)
KEYS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".stress",
        "sf1.0",
    )
    k_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("stress-gen")
    os.makedirs(dst, exist_ok=True)
    for table, keys in KEYS.items():
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        if keys:
            reps = []
            for k in range(k_reps):
                r = df
                for c in keys:
                    r = r.withColumn(c, F.col(c) + F.lit(k * SHIFT))
                reps.append(r)
            df = reduce(lambda a, b: a.unionByName(b), reps)
        out = os.path.join(dst, f"{table}.parquet")
        # single file per table, matching the source layout the
        # loaders and TESTDATA.md describe
        tmp = out + ".tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        os.replace(os.path.join(tmp, part), out)
        import shutil

        shutil.rmtree(tmp)
        print(f"{table}: {'x' + str(k_reps) if keys else 'shared dim'} -> {out}")
    print("done:", dst)


if __name__ == "__main__":
    main()
