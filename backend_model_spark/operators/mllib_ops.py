"""MLlib-backed approximate operators (rows-only correctness checks;
SURVEY.md §7 M4 library-sibling tier of the dedup/similarity surface).

These pair with the md5-deterministic implementations in
:mod:`backend_model_spark.operators.dedup` / ``similarity``: the md5
versions are cross-engine oracle-checkable; these use MLlib's native
LSH families (seeded, deterministic within Spark, but not expressible
in DuckDB SQL) — the production-scale path, registered without
``oracle_sql`` per the driver contract for approximate ops.
"""

from __future__ import annotations

from pyspark.ml.feature import (
    BucketedRandomProjectionLSH,
    HashingTF,
    MinHashLSH,
)
from pyspark.ml.functions import array_to_vector

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from backend_model_spark.operators.dedup import SHINGLES, tokenized_docs
from backend_model_spark.sources.tables import load_table

SEED = 42


def mllib_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHashLSH near-dup join over shingle sets (Jaccard distance
    ≤ 0.9): shingles → HashingTF sparse vectors → approxSimilarityJoin.

    Scale: approxSimilarityJoin explodes each row into its OR-amplified
    hash buckets and equi-joins on bucket — shuffle on hash keys, no
    all-pairs compare.
    """
    shingled = (
        tokenized_docs(spark, sf_dir)
        .select("doc_id", F.expr(SHINGLES).alias("shingles"))
        .filter(F.size("shingles") > 0)
    )
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True
    )
    feats = tf.transform(shingled)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=SEED)
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.9, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
        .orderBy("doc_a", "doc_b")
    )


def mllib_brp_ann_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Euclidean ANN self-join via BucketedRandomProjectionLSH over the
    embedding vectors (distance ≤ 0.8), the MLlib scale path for
    similarity search."""
    emb = load_table(spark, "embeddings", sf_dir)
    vecs = emb.select(
        "vec_id",
        array_to_vector(F.expr("transform(embedding, x -> cast(x as double))")).alias(
            "features"
        ),
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=0.5,
        numHashTables=4,
        seed=SEED,
    )
    model = brp.fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, 1.15, distCol="euclidean_dist")
    return (
        pairs.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            F.round("euclidean_dist", 6).alias("euclidean_dist"),
        )
        .orderBy("vec_a", "vec_b")
    )


def mllib_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib KMeans over the embedding vectors (k=10, fixed seed):
    cluster sizes plus within-cluster cost — the trained sibling of
    the deterministic E-step in ``similarity.centroid_assign``.

    Scale: Lloyd iterations are data-parallel map-reduce per step
    (assign = broadcast centroids + one scan; update = one shuffle of
    k×dim partial sums); the fitted model is driver-held and tiny.
    Rows-only check: centroid init is seeded-random, not expressible
    in the SQL oracle.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.evaluation import ClusteringEvaluator

    emb = load_table(spark, "embeddings", sf_dir)
    vecs = emb.select(
        "vec_id",
        array_to_vector(F.expr("transform(embedding, x -> cast(x as double))")).alias(
            "features"
        ),
    )
    model = KMeans(k=10, seed=SEED, maxIter=20).fit(vecs)
    pred = model.transform(vecs)
    silhouette = ClusteringEvaluator(metricName="silhouette").evaluate(pred)
    return (
        pred.groupBy(F.col("prediction").alias("cluster"))
        .agg(F.count(F.lit(1)).alias("n_vectors"))
        .withColumn("silhouette", F.round(F.lit(silhouette), 4))
        .orderBy("cluster")
    )


def mllib_pca_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA over the embedding corpus: top-8 principal components'
    explained-variance ratios — the dimensionality check run before
    committing to a quantization/indexing budget (how many of the 64
    dims carry signal).

    Rows-only: eigen-decomposition isn't SQL-expressible; ratios are
    deterministic (eigenvalues are sign/rotation-invariant even where
    eigenvectors aren't) and rounded with the floor discipline for a
    stable schema check.

    Scale: MLlib PCA computes the Gramian distributively (one pass,
    map-side d×d partial products; d=64 → 4 KB per task), then the
    driver eigendecomposes the tiny d×d matrix. Never materializes a
    row matrix on the driver.
    """
    from pyspark.ml.feature import PCA

    emb = load_table(spark, "embeddings", sf_dir).select(
        array_to_vector(
            F.expr("transform(embedding, x -> cast(x as double))")
        ).alias("features")
    )
    model = PCA(k=8, inputCol="features", outputCol="pc").fit(emb)
    ratios = [float(v) for v in model.explainedVariance]
    rows = [
        (i + 1, float(__import__("math").floor(r * 1_000_000 + 0.5)) / 1_000_000)
        for i, r in enumerate(ratios)
    ]
    return spark.createDataFrame(
        rows, "component int, variance_ratio double"
    ).orderBy("component")
