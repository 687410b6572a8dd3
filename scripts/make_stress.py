"""Build a key-shifted K× replica of an SF dir for stress runs.

Replica k shifts every join key by k·SHIFT so referential integrity
holds within each replica and replicas never cross-join: a 10× sf0.1
behaves like a genuinely larger fact universe (10× customers, orders,
lineitems, events, docs), while the dimension tables nation/region
stay shared (as they would at any scale). Document text and embedding
vectors are exact clones across replicas — deliberately: dedup and
CC see true 10-way duplicate clusters, the harsher test for the
candidate→verify→decision path.

ZIPF MODE (round 8, verdict ask #5): the full-replica corpus is
PATHOLOGICAL for bucket-join LSH (every input duplicated exactly K×
— nothing real looks like that), so ``zipf`` builds the
representative web-crawl shape instead: MOST rows unique, a FEW hot
exact-duplicate groups with halving (Zipf-ish) sizes
(4000, 2000, …, 2 — boilerplate pages, licence blocks). Cold
uniqueness is content-level, per method class:

* documents — replica k>0 re-tokenizes every word to a 6-hex digest
  of (word, k): replicas share no vocabulary, so they are distinct
  for exact digests, shingle Jaccard, simhash AND bag-of-words
  methods alike (a mere word permutation would still simhash-collide);
* embeddings — replica k>0 applies a fixed signed roll (an orthogonal
  map): within-replica pair structure is preserved exactly (each
  replica is a rotated copy of the base corpus), cross-replica
  vectors sit at random high-d orientations, far beyond any join
  threshold.

Hot clones get fresh ids in a reserved range (HOT_BASE); all other
tables replicate exactly as in full-replica mode so every loader
works against the directory.

Usage:
    python scripts/make_stress.py [SRC] [DST] [K] [zipf]
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


# Zipf-mode hot exact-duplicate group sizes (halving ≈ Zipf tail);
# the originals stay in the cold mass, so group j has HOT_SIZES[j]+1
# identical members. Max group 4000: big enough that a quadratic
# C(g,2) within-group path (~8M pairs) is unmissable in wall time
# while the linear star/keep-list path (g−1 edges) stays trivial.
HOT_SIZES = [4000, 2000, 1000, 500, 250, 125, 62, 31, 15, 7, 3, 2]
# hot-clone ids live at replica slot 100_000 — far above any cold
# replica k*SHIFT (guarded in _hot_clone_map: k_reps must stay below
# it, else clone ids would collide with a cold replica's id range)
HOT_SLOT = 100_000
HOT_BASE = HOT_SLOT * SHIFT


def _hot_clone_map(spark, id_col: str, base_ids: list[int], k_reps: int) -> "DataFrame":
    """(orig id, fresh clone id) — one row per hot clone to emit."""
    assert k_reps < HOT_SLOT, (
        f"k_reps={k_reps} would overlap the hot-clone id range at "
        f"replica {HOT_SLOT}"
    )
    rows, next_id = [], HOT_BASE
    for orig, size in zip(base_ids, HOT_SIZES):
        for _ in range(size):
            rows.append((orig, next_id))
            next_id += 1
    return spark.createDataFrame(rows, f"{id_col} bigint, _new_id bigint")


def _zipf_documents(spark, df, k_reps):
    """K× rows, unique content per replica, + Zipf hot exact clones."""
    reps = [df]
    for k in range(1, k_reps):
        reps.append(
            df.withColumn("doc_id", F.col("doc_id") + F.lit(k * SHIFT))
            .withColumn(
                "text",
                F.expr(
                    "concat_ws(' ', transform(split(trim(text), '\\\\s+'),"
                    f" w -> substr(md5(concat(w, '|', {k})), 1, 6)))"
                ),
            )
            .withColumn("n_chars", F.length("text"))
        )
    cold = reduce(lambda a, b: a.unionByName(b), reps)
    base_ids = [r[0] for r in df.select("doc_id").orderBy("doc_id").limit(len(HOT_SIZES)).collect()]
    hot = (
        _hot_clone_map(spark, "doc_id", base_ids, k_reps)
        .join(df, "doc_id")
        .select(F.col("_new_id").alias("doc_id"), "text", "lang", "source", "n_chars")
    )
    return cold.unionByName(hot)


def _zipf_embeddings(spark, df, k_reps):
    """K× rows via per-replica signed rolls (orthogonal), + hot clones."""
    dim = len(df.select("embedding").first()[0])
    reps = [df]
    for k in range(1, k_reps):
        # T_k(x)[i] = ±x[(i+k) mod d]: a signed permutation — distances
        # within the replica are exactly preserved, cross-replica
        # orientations are effectively random
        reps.append(
            df.withColumn("vec_id", F.col("vec_id") + F.lit(k * SHIFT))
            .withColumn(
                "embedding",
                F.expr(
                    "transform(sequence(0, size(embedding) - 1),"
                    f" i -> embedding[(i + {k}) % {dim}]"
                    f" * cast(1 - 2 * ((i * {k} + {k}) % 2) as float))"
                ),
            )
        )
    cold = reduce(lambda a, b: a.unionByName(b), reps)
    base_ids = [r[0] for r in df.select("vec_id").orderBy("vec_id").limit(len(HOT_SIZES)).collect()]
    hot = (
        _hot_clone_map(spark, "vec_id", base_ids, k_reps)
        .join(df, "vec_id")
        .select(F.col("_new_id").alias("vec_id"), "embedding", "label")
    )
    return cold.unionByName(hot)


def _zipf_events(spark, df, k_reps):
    """K× key-shifted replicas + HOT USERS (round 9, verdict ask #8:
    the events family had never been family-stress-swept): hot user j
    (fresh id in the HOT range) receives ``HOT_SIZES[j]`` events
    cloned from a contiguous dense event_id slice of the base table
    with fresh event ids — the power-user/bot tail (a 4,000-event
    user against the ~99-event organic per-user max) that stresses
    per-user windows (sessionize, funnel, as-of, interpolate) the
    uniform replicas never exercise. Timestamps/types/values are
    inherited from the cloned slice, so hot users span the full time
    range like a real bot."""
    reps = []
    for k in range(k_reps):
        reps.append(
            df.withColumn("event_id", F.col("event_id") + F.lit(k * SHIFT))
            .withColumn("user_id", F.col("user_id") + F.lit(k * SHIFT))
        )
    cold = reduce(lambda a, b: a.unionByName(b), reps)
    hots = []
    off = 0
    for j, size in enumerate(HOT_SIZES):
        slice_df = df.filter(
            (F.col("event_id") >= off) & (F.col("event_id") < off + size)
        )
        # the literal-range slice assumes event_ids are dense from 0;
        # on an offset/sparse source a hot user would silently get
        # fewer (possibly zero) events, weakening the corpus with no
        # error (round-9 advice) — fail loudly instead
        got = slice_df.count()
        assert got == size, (
            f"hot user {j}: event_id slice [{off},{off + size}) matched "
            f"{got} rows, expected {size} — source event_ids not dense from 0"
        )
        hots.append(
            slice_df.select(
                (F.col("event_id") + F.lit(HOT_BASE + j * SHIFT)).alias("event_id"),
                "ts",
                F.lit(HOT_BASE + j).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
        off += size
    return cold.unionByName(reduce(lambda a, b: a.unionByName(b), hots))


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".stress",
        "sf1.0",
    )
    k_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    zipf = len(sys.argv) > 4 and sys.argv[4] == "zipf"
    spark = get_spark("stress-gen")
    os.makedirs(dst, exist_ok=True)
    for table, keys in KEYS.items():
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        if zipf and table == "documents":
            df = _zipf_documents(spark, df, k_reps)
        elif zipf and table == "embeddings":
            df = _zipf_embeddings(spark, df, k_reps)
        elif zipf and table == "events":
            df = _zipf_events(spark, df, k_reps)
        elif keys:
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
