"""Structural guarantees of the Zipf stress generator (round 8).

The dual-corpus stress ledger in SCALE.md only means something if the
Zipf corpus actually HAS the shape it claims: most rows unique for
every duplicate-detection method class (exact digest, shingle
Jaccard, bag-of-words/simhash), a few hot exact-duplicate groups with
the documented halving sizes, and embedding replicas that are
orthogonal-map images (norms preserved) rather than clones. These
tests build the corpus at sf0.001 (500 docs / 200 vecs, seconds) and
pin each claim, so a generator regression can't silently turn the
"representative" corpus back into the pathological full-replica one.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def zipf_dir(spark, tmp_path_factory) -> str:
    import scripts.make_stress as ms

    src_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    src_emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = tmp_path_factory.mktemp("zipf")
    ms._zipf_documents(spark, src_docs, 10).write.parquet(
        str(out / "documents.parquet")
    )
    ms._zipf_embeddings(spark, src_emb, 10).write.parquet(
        str(out / "embeddings.parquet")
    )
    return str(out)


def test_zipf_documents_structure(spark, zipf_dir):
    import scripts.make_stress as ms

    docs = spark.read.parquet(f"{zipf_dir}/documents.parquet")
    src = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_src = src.count()
    hot_total = sum(ms.HOT_SIZES)
    assert docs.count() == 10 * n_src + hot_total

    # hot groups: exactly the documented halving sizes (+1 — the
    # original row stays in the cold mass), nothing larger
    sizes = [
        r["c"]
        for r in docs.groupBy(F.md5("text").alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .orderBy(F.desc("c"))
        .limit(len(ms.HOT_SIZES))
        .collect()
    ]
    expected = sorted((s + 1 for s in ms.HOT_SIZES), reverse=True)
    assert sizes[: len(expected)][0] == expected[0]
    assert sizes[:4] == expected[:4], f"hot group sizes drifted: {sizes[:4]}"

    # cold mass: replicas use disjoint 6-hex vocabularies, so distinct
    # texts ≈ total minus hot clones minus the base corpus's own dups
    n_distinct = docs.select(F.countDistinct("text")).collect()[0][0]
    base_dups = n_src - src.select(F.countDistinct("text")).collect()[0][0]
    assert n_distinct >= 10 * (n_src - base_dups) - len(ms.HOT_SIZES)

    # replica texts keep the token-count structure (same word count as
    # their source doc) — the corpus stays shaped like text, not noise
    k1 = (
        docs.filter(
            (F.col("doc_id") >= ms.SHIFT) & (F.col("doc_id") < 2 * ms.SHIFT)
        )
        .select((F.col("doc_id") - ms.SHIFT).alias("doc_id"), F.size(F.split(F.trim("text"), r"\s+")).alias("wc"))
    )
    base_wc = src.select("doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("wc0"))
    mismatched = k1.join(base_wc, "doc_id").filter(F.col("wc") != F.col("wc0")).count()
    assert mismatched == 0


def test_zipf_embeddings_orthogonal_replicas(spark, zipf_dir):
    import scripts.make_stress as ms

    emb = spark.read.parquet(f"{zipf_dir}/embeddings.parquet")
    src = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_src = src.count()
    assert emb.count() == 10 * n_src + sum(ms.HOT_SIZES)

    # signed roll = orthogonal: every replica vector has EXACTLY its
    # source vector's norm (float-exact — the transform permutes and
    # negates, never arithmetic-mixes)
    norm = "aggregate(embedding, cast(0.0 as double), (s, x) -> s + x * x)"
    k3 = emb.filter(
        (F.col("vec_id") >= 3 * ms.SHIFT) & (F.col("vec_id") < 4 * ms.SHIFT)
    ).select((F.col("vec_id") - 3 * ms.SHIFT).alias("vec_id"), F.expr(norm).alias("n2"))
    base = src.select("vec_id", F.expr(norm).alias("n2_0"))
    bad = k3.join(base, "vec_id").filter(F.col("n2") != F.col("n2_0")).count()
    assert bad == 0

    # but replicas are NOT clones of their source
    k3v = emb.filter(
        (F.col("vec_id") >= 3 * ms.SHIFT) & (F.col("vec_id") < 4 * ms.SHIFT)
    ).select((F.col("vec_id") - 3 * ms.SHIFT).alias("vec_id"), F.col("embedding").alias("e1"))
    same = (
        k3v.join(src, "vec_id")
        .filter(F.col("e1") == F.col("embedding"))
        .count()
    )
    assert same == 0
