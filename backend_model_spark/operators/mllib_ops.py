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


def mllib_fpgrowth_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FP-Growth frequent-itemset mining over order baskets: each order
    is the set of part brands it contains; report itemsets of size ≤ 2
    with support ≥ 2% plus their exact frequencies. Market-basket
    analytics on the star schema — the MLlib sibling of
    ``join_market_basket`` (which counts pairwise co-occurrence
    directly).

    Unlike the other MLlib entries this one IS oracle-checkable: exact
    frequent-itemset mining is deterministic, and level-1/level-2
    itemsets are expressible in SQL (distinct-brand scan + basket
    self-join). The size cap is applied AFTER mining, purely so the
    oracle stays SQL-expressible; FPGrowth itself mines all levels.

    Scale: FPGrowth distributes by suffix-partitioning the FP-tree
    (PFP, Li et al. 2008) — shuffle on item, no candidate explosion;
    basket build is one groupBy on orderkey. The brand alphabet is
    tiny (25) so the tree is shallow; support 2% prunes the lattice
    before level 3 (measured: max pair support ≈3%, so level 2 is
    populated and level 3 is empty at every test SF).
    """
    from pyspark.ml.fpm import FPGrowth

    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey")
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand")
    baskets = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.collect_set("p_brand").alias("items"))
    )
    fp = FPGrowth(itemsCol="items", minSupport=0.02, minConfidence=0.5)
    model = fp.fit(baskets)
    n_baskets = baskets.count()
    return (
        model.freqItemsets.filter(F.size("items") <= 2)
        .select(
            F.array_join(F.array_sort("items"), ",").alias("itemset"),
            F.size("items").alias("k"),
            F.col("freq").alias("freq"),
            F.floor(F.col("freq") / F.lit(float(n_baskets)) * 1_000_000 + 0.5)
            .cast("double")
            .alias("support_ppm"),
        )
        .orderBy("itemset")
    )


FPGROWTH_PAIRS_ORACLE = """
WITH baskets AS (
  SELECT l_orderkey, list_sort(list(DISTINCT p_brand)) AS items
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY l_orderkey
),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_baskets FROM baskets),
singles AS (
  SELECT b AS itemset, 1 AS k, COUNT(*) AS freq
  FROM (SELECT l_orderkey, unnest(items) AS b FROM baskets)
  GROUP BY b
),
pairs AS (
  SELECT x.b || ',' || y.b AS itemset, 2 AS k, COUNT(*) AS freq
  FROM (SELECT l_orderkey, unnest(items) AS b FROM baskets) x
  JOIN (SELECT l_orderkey, unnest(items) AS b FROM baskets) y
    ON x.l_orderkey = y.l_orderkey AND x.b < y.b
  GROUP BY x.b, y.b
),
lvl AS (
  SELECT * FROM singles UNION ALL SELECT * FROM pairs
)
SELECT
  itemset,
  CAST(k AS INTEGER) AS k,
  CAST(freq AS BIGINT) AS freq,
  FLOOR(freq / n_baskets * 1000000 + 0.5) AS support_ppm
FROM lvl, n
WHERE freq >= 0.02 * n_baskets
ORDER BY itemset
"""
