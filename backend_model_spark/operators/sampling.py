"""Deterministic sampling / dataset-mixing operators — the selection
layer of a training-data pipeline.

Everything here uses **content-addressed sampling**: keep a row iff
``md5(key) mod 100 < rate``. Unlike ``df.sample()`` (per-partition RNG,
not reproducible across engines or partitionings), the hash rule is a
pure column expression — same result on Spark, DuckDB, or a re-run
with different parallelism, which makes train/test membership stable
across pipeline versions (the property that actually matters when the
corpus is 100 TB and resampling is a full re-read).

Scale: each operator is a single scan + filter (no shuffle until the
reporting aggregate); the hash is computed inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from backend_model_spark.sources.tables import load_table

# md5(doc_id)'s first 4 hex chars as an int, mod 100 — a uniform,
# engine-portable [0, 100) bucket per document
BUCKET = "conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) % 100"
BUCKET_SQL = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100"


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stratified sampling at source-dependent rates
    (even-numbered sources 50%, odd 20%), reported as kept/total per
    source. The filter is one codegen'd expression — at 100 TB this
    is a pure scan with no shuffle before the count."""
    docs = load_table(spark, "documents", sf_dir)
    src_num = F.regexp_extract("source", r"(\d+)", 1).cast("int")
    rate = F.when(src_num % 2 == 0, 50).otherwise(20)
    kept = (F.expr(BUCKET) < rate).cast("long")
    return (
        docs.select("source", kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").alias("n_kept"),
        )
        .orderBy("source")
    )


STRATIFIED_SAMPLE_ORACLE = rf"""
SELECT
  source,
  COUNT(*) AS n_total,
  CAST(SUM(CASE WHEN {BUCKET_SQL} <
    (CASE WHEN CAST(regexp_extract(source, '(\d+)', 1) AS INTEGER) % 2 = 0
          THEN 50 ELSE 20 END)
    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents
GROUP BY source
ORDER BY source
"""


def weighted_language_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset mixing by language weight (en 80%, others 30%) — the
    up/down-sampling step that composes a training mix from skewed
    raw corpora. Reports the composed mix per language."""
    docs = load_table(spark, "documents", sf_dir)
    rate = F.when(F.col("lang") == "en", 80).otherwise(30)
    return (
        docs.filter(F.expr(BUCKET) < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("lang")
    )


WEIGHTED_MIX_ORACLE = f"""
SELECT
  lang,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE {BUCKET_SQL} < (CASE WHEN lang = 'en' THEN 80 ELSE 30 END)
GROUP BY lang
ORDER BY lang
"""


# finer-grained bucket for computed (non-integer-percent) rates:
# first 8 md5 hex chars mod 1e8 — same content-addressed discipline
BUCKET8 = "conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) % 100000000"
BUCKET8_SQL = (
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100000000"
)


def temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language mixing (XLM-R / mT5 style, public):
    sample language l with probability ∝ n_l^α, α = 0.5 — flattens a
    skewed language distribution toward uniform without the brutality
    of equal quotas. Downsampling-only normalization: keep-rate
    r_l = (n_min / n_l)^(1−α) = sqrt(n_min / n_l), so the smallest
    language keeps everything and no language upsamples.

    Engine parity: α = 0.5 makes the rate a single ``sqrt`` — IEEE
    correctly-rounded in both engines, so the floor-rounded micro rate
    can never straddle a ULP; membership is the content-addressed
    md5 bucket (fine-grained 1e8 variant) against that rate —
    reproducible across engines, partitionings, and corpus re-runs.

    Scale: one column-pruned count scan (lang only) for the tiny rate
    table, broadcast back onto the corpus scan; no shuffle before the
    reporting aggregate.
    """
    docs = load_table(spark, "documents", sf_dir)
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    n_min = counts.agg(F.min("n_l").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        "n_l",
        F.floor(
            F.sqrt(F.col("n_min").cast("double") / F.col("n_l")) * 100_000_000
            + 0.5
        )
        .cast("bigint")
        .alias("rate_u8"),
    )
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(F.expr(BUCKET8) < F.col("rate_u8"))
        .groupBy("lang")
        .agg(
            F.max("n_l").alias("n_total"),
            F.max("rate_u8").alias("rate_u8"),
            F.count(F.lit(1)).alias("n_kept"),
        )
        .orderBy("lang")
    )


TEMPERATURE_MIX_ORACLE = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang
),
mn AS (SELECT MIN(n_l) AS n_min FROM counts),
rates AS (
  SELECT
    lang, n_l,
    CAST(FLOOR(SQRT(CAST(n_min AS DOUBLE) / n_l) * 100000000 + 0.5)
         AS BIGINT) AS rate_u8
  FROM counts, mn
)
SELECT
  d.lang,
  CAST(MAX(r.n_l) AS BIGINT) AS n_total,
  MAX(r.rate_u8) AS rate_u8,
  COUNT(*) AS n_kept
FROM documents d
JOIN rates r ON d.lang = r.lang
WHERE {BUCKET8_SQL} < r.rate_u8
GROUP BY d.lang
ORDER BY d.lang
"""


def importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance resampling: each document's
    keep-probability IS its composite quality score (the DSIR-style
    "sample proportional to importance weight" selection step, with
    the heuristic gate of ``text.quality_scores`` as the weight).
    Reported per source: total, kept, and kept mean quality.

    Engine parity: the score is already floor-rounded at 6 dp by
    :func:`backend_model_spark.operators.text.quality_frame` (both
    engines produce the identical double), so the micro keep-rate
    ``floor(score·1e8 + 0.5)`` and the md5-bucket membership test are
    exact on both sides. Single scan, no shuffle before the report.
    """
    from backend_model_spark.operators.text import quality_frame

    docs = load_table(spark, "documents", sf_dir)
    scored = quality_frame(docs).withColumn(
        "rate_u8",
        F.floor(F.col("quality_score") * 100_000_000 + 0.5).cast("bigint"),
    )
    kept = (F.expr(BUCKET8) < F.col("rate_u8")).cast("long")
    return (
        scored.select("source", "quality_score", kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").alias("n_kept"),
            (
                F.floor(
                    F.sum(F.when(F.col("kept") == 1, F.col("quality_score")))
                    # nullif: a zero-kept source yields NULL, not an
                    # ANSI divide-by-zero error — same rule as oracle
                    / F.nullif(F.sum("kept"), F.lit(0))
                    * 1_000_000.0
                    + 0.5
                )
                / 1_000_000.0
            ).alias("kept_mean_quality"),
        )
        .orderBy("source")
    )


IMPORTANCE_RESAMPLE_ORACLE = rf"""
WITH feats AS (
  SELECT
    doc_id,
    source,
    CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS n_tokens,
    (length(trim(text)) - (len(string_split_regex(trim(text), '\s+')) - 1))
      / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS mean_tok_len,
    CAST(
        (len(string_split(' ' || text || ' ', ' the ')) - 1)
      + (len(string_split(' ' || text || ' ', ' a ')) - 1)
    AS DOUBLE)
      / len(string_split_regex(trim(text), '\s+')) AS stop_ratio
  FROM documents
),
scored AS (
  SELECT
    doc_id,
    source,
    floor((
        LEAST(n_tokens / 100.0, 1.0) * 0.5
      + (1.0 - LEAST(stop_ratio * 2.0, 1.0)) * 0.3
      + LEAST(mean_tok_len / 8.0, 1.0) * 0.2
    ) * 1000000.0 + 0.5) / 1000000.0 AS quality_score
  FROM feats
),
flagged AS (
  SELECT
    source,
    quality_score,
    CASE WHEN {BUCKET8_SQL}
         < CAST(FLOOR(quality_score * 100000000 + 0.5) AS BIGINT)
    THEN 1 ELSE 0 END AS kept
  FROM scored
)
SELECT
  source,
  COUNT(*) AS n_total,
  CAST(SUM(kept) AS BIGINT) AS n_kept,
  FLOOR(SUM(CASE WHEN kept = 1 THEN quality_score END)
        / CAST(NULLIF(SUM(kept), 0) AS DOUBLE) * 1000000 + 0.5) / 1000000
    AS kept_mean_quality
FROM flagged
GROUP BY source
ORDER BY source
"""


def train_test_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/20 train/test split (SURVEY §2.9 E4, made
    reproducible): membership is a function of doc_id alone, so the
    split survives re-partitioning, re-runs, and corpus growth
    (existing docs never switch sides)."""
    docs = load_table(spark, "documents", sf_dir)
    split = F.when(F.expr(BUCKET) < 80, "train").otherwise("test")
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("split")
    )


TRAIN_TEST_SPLIT_ORACLE = f"""
SELECT
  CASE WHEN {BUCKET_SQL} < 80 THEN 'train' ELSE 'test' END AS split,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1
ORDER BY split
"""


def approx_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (KLL-style sketch) over lineitem prices —
    the mergeable-sketch path for quantiles at 100 TB, where the
    exact sort-based percentile is off the table.

    Fully oracled since round 6, the `agg_approx_distinct` pattern:
    the raw sketch values are engine-specific so they are not hashed;
    what IS hashed is the exact group count plus Spark-side accuracy
    assertions — the estimate's exact RANK (counted, not sorted) must
    land in a generous window ([45%, 55%] of n for the median,
    [98.5%, 99.5%] for p99; Spark guarantees rank error
    ≤ N/accuracy = 0.01%). The oracle emits the same exact counts and
    literal TRUEs, so a drifting or broken sketch flips the hash.

    Plan shape (the certificate must not cost what the sketch
    saves): pass 1 is the sketch aggregate; pass 2 broadcast-joins
    the 3-row estimate frame back and COUNTS rows strictly below /
    at-or-below each estimate — both passes are hash aggregates, no
    value buffering. The first draft bracketed with exact
    ``percentile()`` instead: a SortAggregate that buffers every
    group's values — 4.4 s at sf0.1 / 14 s at 10×, the very cost the
    sketch exists to avoid (measured, SCALE.md round 6). With ties
    the estimate's feasible rank is the interval [count_lt,
    count_le], so the check is count_lt ≤ hi AND count_le ≥ lo."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_extendedprice"
    )
    est = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "approx_median"
        ),
        F.approx_percentile("l_extendedprice", F.lit(0.99), F.lit(10000)).alias(
            "approx_p99"
        ),
    )
    ranked = (
        li.join(F.broadcast(est), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.first("n_items").alias("n_items"),
            F.sum(
                (F.col("l_extendedprice") < F.col("approx_median")).cast("long")
            ).alias("lt_m"),
            F.sum(
                (F.col("l_extendedprice") <= F.col("approx_median")).cast("long")
            ).alias("le_m"),
            F.sum(
                (F.col("l_extendedprice") < F.col("approx_p99")).cast("long")
            ).alias("lt_99"),
            F.sum(
                (F.col("l_extendedprice") <= F.col("approx_p99")).cast("long")
            ).alias("le_99"),
        )
    )
    n = F.col("n_items").cast("double")
    return ranked.select(
        "l_returnflag",
        "n_items",
        (
            (F.col("lt_m") <= 0.55 * n) & (F.col("le_m") >= 0.45 * n)
        ).alias("median_est_ok"),
        (
            (F.col("lt_99") <= 0.995 * n) & (F.col("le_99") >= 0.985 * n)
        ).alias("p99_est_ok"),
    ).orderBy("l_returnflag")


APPROX_QUANTILES_ORACLE = """
SELECT
  l_returnflag,
  CAST(COUNT(*) AS BIGINT) AS n_items,
  TRUE AS median_est_ok,
  TRUE AS p99_est_ok
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


PACK_BUDGET = 2048  # tokens per packed training sequence


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget bins
    (training context windows), streaming-concat style — each doc goes
    into the bin where the running token count before it lands.

    Packing is inherently order-dependent, so the order is made
    explicit and deterministic: docs are packed per language in doc_id
    order. One window (partitioned by lang — high cardinality in a
    real corpus where the partition key is (lang, shard)) computes the
    exclusive running sum; the bin id is its integer division by the
    budget. No Python, no loop — the greedy packing IS a prefix sum.
    """
    docs = load_table(spark, "documents", sf_dir)
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_cum = docs.select(
        "doc_id",
        "lang",
        toks.alias("n_tokens"),
        F.coalesce(F.sum(toks).over(w), F.lit(0)).alias("cum_before"),
    )
    return (
        with_cum.select(
            "doc_id",
            "lang",
            "n_tokens",
            F.floor(F.col("cum_before") / PACK_BUDGET).alias("bin_id"),
        )
        .groupBy("lang", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
        .orderBy("lang", "bin_id")
    )


PACK_SEQUENCES_ORACLE = rf"""
WITH with_cum AS (
  SELECT
    doc_id, lang,
    len(string_split_regex(trim(text), '\s+')) AS n_tokens,
    COALESCE(SUM(len(string_split_regex(trim(text), '\s+'))) OVER (
      PARTITION BY lang ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS cum_before
  FROM documents
)
SELECT lang,
       CAST(FLOOR(cum_before / {PACK_BUDGET}.0) AS BIGINT) AS bin_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
FROM with_cum
GROUP BY lang, bin_id
ORDER BY lang, bin_id
"""


CAP_PER_SOURCE = 50


def cap_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap — downsample over-represented sources
    to ``CAP_PER_SOURCE`` docs each, choosing membership by
    content-addressed rank (md5 of doc_id), not RNG: the kept set is
    stable across engines, partitionings, and corpus growth at the
    head (a new doc only displaces the doc it out-hashes).

    Scale: one shuffle on source for the rank window, with
    ``WindowGroupLimit`` pushing the cap below the sort; reporting
    aggregates per source. For extreme single-key skew (one source =
    half the corpus) the two-stage per-partition top-k variant
    applies, same as top-k queries.
    """
    docs = load_table(spark, "documents", sf_dir)
    rank_key = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(rank_key.asc())
    kept = (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= CAP_PER_SOURCE)
    )
    toks = F.expr("size(split(trim(text), '\\\\s+'))")
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(toks).alias("kept_tokens"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("source")
    )


CAP_PER_GROUP_ORACLE = rf"""
WITH ranked AS (
  SELECT
    source, doc_id, text,
    ROW_NUMBER() OVER (
      PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC
    ) AS rk
  FROM documents
)
SELECT
  source,
  COUNT(*) AS n_kept,
  CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
    AS kept_tokens,
  MIN(doc_id) AS min_doc_id
FROM ranked
WHERE rk <= {CAP_PER_SOURCE}
GROUP BY source
ORDER BY source
"""


WEIGHTED_K = 100


def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis):
    each doc draws key = u^(1/w) — here the equivalent argmax form
    ln(u)/w — and the top-k keys are the sample. Inclusion probability
    is proportional to weight (token count), so long documents are
    favored exactly as importance sampling prescribes.

    Determinism: u comes from the md5 hash of doc_id (uniform in
    (0,1]), not an RNG — the same sample on every engine, partitioning
    and rerun. The float key is computed with one identical expression
    (ln of a hash-derived ratio divided by an integer weight) on both
    sides, and md5 keys make exact float ties impossible in practice.

    Scale: keys are scan-side expressions; selection is one global
    top-k (TakeOrderedAndProject — per-partition heaps, driver merge
    of k·partitions rows). Per-source caps compose by windowing on
    source instead (see cap_per_group).
    """
    docs = load_table(spark, "documents", sf_dir)
    toks = F.expr("size(split(trim(text), '\\\\s+'))")
    # u in (0, 1]: (bucket + 1) / 2^32 over the first 8 md5 hex chars
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + 1.0
    ) / F.lit(4294967296.0)
    key = F.log(u) / toks.cast("double")  # maximize ln(u)/w  (all ≤ 0)
    return (
        docs.select(
            "doc_id",
            "source",
            toks.alias("weight_tokens"),
            key.alias("es_key"),
        )
        .orderBy(F.col("es_key").desc(), F.col("doc_id").asc())
        .limit(WEIGHTED_K)
        .select("doc_id", "source", "weight_tokens")
        .orderBy("doc_id")
    )


WEIGHTED_TOPK_ORACLE = rf"""
WITH keyed AS (
  SELECT
    doc_id, source,
    len(string_split_regex(trim(text), '\s+')) AS weight_tokens,
    LN((CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        AS DOUBLE) + 1.0) / 4294967296.0)
      / len(string_split_regex(trim(text), '\s+')) AS es_key
  FROM documents
),
top AS (
  SELECT doc_id, source, weight_tokens
  FROM keyed
  ORDER BY es_key DESC, doc_id ASC
  LIMIT {WEIGHTED_K}
)
SELECT doc_id, source, CAST(weight_tokens AS INTEGER) AS weight_tokens
FROM top
ORDER BY doc_id
"""


def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering for training-data emission: rank documents
    within each source by quality (best first, ``doc_id`` tie-break),
    then interleave the sources round-robin — global position is
    ordered by ``(rank_in_source, source)``, so epoch position k·S..
    (k+1)·S-1 holds every source's (k+1)-th best document. This is the
    "order by difficulty, keep the mixture balanced everywhere in the
    epoch" shape curriculum/mixing schedules need.

    Scale: the per-source rank is a partitioned window (shuffles on
    ``source`` — bounded cardinality, and a skewed giant source still
    only sorts its own rows); the global interleave position uses the
    two-stage range-partitioned rank (``with_global_rank``), never an
    unpartitioned window. Output is the full corpus ordering — at
    100 TB this frame IS the shuffle-ordered write manifest.
    """
    from backend_model_spark.operators.scale_utils import with_global_rank
    from backend_model_spark.operators.text import quality_frame

    docs = load_table(spark, "documents", sf_dir)
    scored = quality_frame(docs).select("doc_id", "source", "quality_score")
    ranked = scored.withColumn(
        "rank_in_source",
        F.row_number().over(
            Window.partitionBy("source").orderBy(
                F.col("quality_score").desc(), F.col("doc_id")
            )
        ),
    )
    return (
        with_global_rank(
            ranked,
            [F.col("rank_in_source").asc(), F.col("source").asc()],
            "curriculum_pos",
        )
        .select(
            "doc_id", "source", "quality_score",
            F.col("rank_in_source").cast("bigint").alias("rank_in_source"),
            "curriculum_pos",
        )
        .orderBy("curriculum_pos")
    )


CURRICULUM_ORDER_ORACLE = r"""
WITH feats AS (
  SELECT
    doc_id,
    source,
    CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS n_tokens,
    (length(trim(text)) - (len(string_split_regex(trim(text), '\s+')) - 1))
      / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)
      AS mean_tok_len,
    CAST(
        (len(string_split(' ' || text || ' ', ' the ')) - 1)
      + (len(string_split(' ' || text || ' ', ' a ')) - 1)
    AS DOUBLE)
      / len(string_split_regex(trim(text), '\s+')) AS stop_ratio
  FROM documents
),
scored AS (
  SELECT
    doc_id,
    source,
    floor((
        LEAST(n_tokens / 100.0, 1.0) * 0.5
      + (1.0 - LEAST(stop_ratio * 2.0, 1.0)) * 0.3
      + LEAST(mean_tok_len / 8.0, 1.0) * 0.2
    ) * 1000000.0 + 0.5) / 1000000.0 AS quality_score
  FROM feats
),
ranked AS (
  SELECT
    doc_id,
    source,
    quality_score,
    CAST(row_number() OVER (
      PARTITION BY source ORDER BY quality_score DESC, doc_id
    ) AS BIGINT) AS rank_in_source
  FROM scored
)
SELECT
  doc_id,
  source,
  quality_score,
  rank_in_source,
  CAST(row_number() OVER (ORDER BY rank_in_source, source) AS BIGINT)
    AS curriculum_pos
FROM ranked
ORDER BY curriculum_pos
"""


K_FOLDS = 5


def kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation fold assignment (k=5) by the same
    content-addressed md5 bucketing as the sampling family — fold
    membership is a pure function of the row key, so every engine,
    run, and partitioning produces the same folds (the property
    ``randomSplit`` cannot give). Reports per-fold size, size share,
    and mean doc length — the balance check run before training.

    Scale: one scan, one map-side-combinable groupBy to k rows; the
    share denominator re-aggregates the persisted k-row counts, never
    the corpus.
    """
    docs = load_table(spark, "documents", sf_dir)
    fold = F.expr(
        "conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) "
        f"% {K_FOLDS}"
    ).cast("int")
    counts = (
        docs.select(fold.alias("fold"), "n_chars")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.sum("n_chars") / F.count(F.lit(1))).alias("avg_chars"),
        )
        .persist()
    )
    total = counts.agg(F.sum("n_docs").alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "fold",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(F.col("n_docs") / F.col("n_total"), 6).alias("fold_share"),
            F.round("avg_chars", 6).alias("avg_chars"),
        )
        .orderBy("fold")
    )


KFOLD_ASSIGN_ORACLE = f"""
WITH folds AS (
  SELECT
    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT)
      % {K_FOLDS} AS INTEGER) AS fold,
    n_chars
  FROM documents
),
counts AS (
  SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_docs,
         SUM(n_chars) / COUNT(*) AS avg_chars
  FROM folds GROUP BY fold
),
total AS (SELECT SUM(n_docs) AS n_total FROM counts)
SELECT fold, n_docs,
  ROUND(n_docs / CAST(n_total AS DOUBLE), 6) AS fold_share,
  ROUND(avg_chars, 6) AS avg_chars
FROM counts CROSS JOIN total
ORDER BY fold
"""


def group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-integrity train/test split (sklearn GroupShuffleSplit
    semantics): the md5 bucket of the GROUP key (source) decides the
    split, so every document of a source lands on the same side —
    the leakage guarantee a row-level split cannot give when grouped
    structure (same crawl domain, same author) must not straddle
    train and eval. ~80/20 by group.

    Scale: pure codegen'd expression on the group column — no
    shuffle before the 2-row aggregate; group-count distinctness is
    the only distinct aggregate.
    """
    docs = load_table(spark, "documents", sf_dir)
    split = F.when(
        F.expr(
            "conv(substring(md5(cast(source as string)), 1, 4), 16, 10) % 100"
        )
        < 80,
        F.lit("train"),
    ).otherwise(F.lit("test"))
    return (
        docs.select(split.alias("split"), "source", "n_chars")
        .groupBy("split")
        .agg(
            F.countDistinct("source").alias("n_groups"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .orderBy("split")
    )


GROUP_SPLIT_ORACLE = """
SELECT
  CASE WHEN CAST('0x' || substr(md5(CAST(source AS VARCHAR)), 1, 4) AS BIGINT)
            % 100 < 80
       THEN 'train' ELSE 'test' END AS split,
  COUNT(DISTINCT source) AS n_groups,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1
ORDER BY split
"""


def epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch global shuffle order — the data-order
    layer of a training loop: each epoch e visits the whole corpus in
    the order of ``md5(e || ':' || doc_id)``, so epochs are
    independent permutations that every worker can recompute from
    content alone (no stored shuffle files, no driver-side RNG, and
    reshards never change the order). Emits the first 10 positions of
    epochs 0 and 1 as proof rows.

    Scale: the epoch-position is the two-stage global rank
    (``scale_utils.with_global_rank``) ordered by (epoch, hash) —
    range-partitioned sort, never a single-partition window; the
    per-epoch offset subtracts e*N with N as a broadcast scalar.
    """
    from backend_model_spark.operators.scale_utils import with_global_rank

    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    epochs = docs.select(
        "doc_id",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("epoch"),
    ).withColumn(
        "shuffle_key",
        F.expr(
            "md5(concat(cast(epoch as string), ':', cast(doc_id as string)))"
        ),
    )
    ranked = with_global_rank(
        epochs,
        [F.col("epoch").asc(), F.col("shuffle_key").asc(), F.col("doc_id").asc()],
        "gpos",
        total_col="n2",
    )
    return (
        ranked.withColumn(
            "pos", (F.col("gpos") - F.col("epoch") * (F.col("n2") / 2)).cast("long")
        )
        .filter(F.col("pos") <= 10)
        .select("epoch", "pos", "doc_id")
        .orderBy("epoch", "pos")
    )


EPOCH_SHUFFLE_ORACLE = """
WITH e AS (
  SELECT doc_id, epoch,
    md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS k
  FROM documents CROSS JOIN (SELECT unnest([0, 1]) AS epoch)
),
r AS (
  SELECT epoch, doc_id,
    ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY k, doc_id) AS pos
  FROM e
)
SELECT epoch, CAST(pos AS BIGINT) AS pos, doc_id
FROM r WHERE pos <= 10
ORDER BY epoch, pos
"""


NEYMAN_BUDGET = 1000


def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation — the sampling
    DESIGN step (the execution siblings are ``sample_stratified_hash``
    etc.): split a fixed budget of ``NEYMAN_BUDGET`` labeled examples
    across document sources proportional to N_h·σ_h (Neyman 1934 —
    minimizes the variance of the stratified mean estimator at fixed
    budget), with per-document length as the measured variable. The
    training-data reading: spend human-annotation budget where a
    source is BOTH big and heterogeneous, not merely big.

    One map-side-combinable pass builds per-stratum sufficient
    statistics (n, Σy, Σy²); population σ_h, the weight N_h·σ_h, and
    the rounded allocation all derive in-query with a broadcast-scalar
    total — no driver math, no second scan. Proportional allocation is
    reported alongside so the Neyman-vs-proportional delta (the value
    of the design) is visible per stratum. Rounding is half-up per
    stratum; the sum may differ from the budget by ±(#strata)/2 —
    largest-remainder reconciliation is presentation-layer.
    """
    docs = load_table(spark, "documents", sf_dir)
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n_h"),
        F.sum(F.col("n_chars").cast("double")).alias("sy"),
        F.sum(F.col("n_chars").cast("double") * F.col("n_chars")).alias("syy"),
    )
    # greatest(0, ...) absorbs tiny negative float cancellation on
    # near-constant strata (sqrt(-eps) = NaN on both engines otherwise)
    w = per.withColumn(
        "sigma_h", F.expr("sqrt(greatest(0.0, (syy - sy * sy / n_h) / n_h))")
    ).withColumn("w_h", F.expr("n_h * sigma_h"))
    from backend_model_spark.operators.scale_utils import broadcast_scalars

    totals = w.agg(F.sum("w_h").alias("w_tot"), F.sum("n_h").alias("n_tot"))
    j = broadcast_scalars(w, totals)
    B = NEYMAN_BUDGET
    return j.select(
        "source",
        F.expr("cast(n_h as bigint)").alias("stratum_size"),
        F.expr("round(sigma_h, 6)").alias("sigma"),
        # NULLIF: all-constant strata make every sigma_h (hence w_tot)
        # exactly 0 — ANSI Spark would raise where DuckDB divides
        F.expr(f"cast(floor({B} * w_h / NULLIF(w_tot, 0) + 0.5) as bigint)").alias(
            "neyman_alloc"
        ),
        F.expr(f"cast(floor({B} * n_h / n_tot + 0.5) as bigint)").alias(
            "proportional_alloc"
        ),
    ).orderBy("source")


NEYMAN_ORACLE = f"""
WITH per AS (
  SELECT source,
    CAST(COUNT(*) AS DOUBLE) AS n_h,
    SUM(CAST(n_chars AS DOUBLE)) AS sy,
    SUM(CAST(n_chars AS DOUBLE) * CAST(n_chars AS DOUBLE)) AS syy
  FROM documents GROUP BY source
),
w AS (
  SELECT *, sqrt(greatest(0.0, (syy - sy * sy / n_h) / n_h)) AS sigma_h,
    n_h * sqrt(greatest(0.0, (syy - sy * sy / n_h) / n_h)) AS w_h
  FROM per
),
tot AS (SELECT SUM(w_h) AS w_tot, SUM(n_h) AS n_tot FROM w)
SELECT source,
  CAST(n_h AS BIGINT) AS stratum_size,
  ROUND(sigma_h, 6) AS sigma,
  CAST(FLOOR({NEYMAN_BUDGET} * w_h / NULLIF(w_tot, 0) + 0.5) AS BIGINT) AS neyman_alloc,
  CAST(FLOOR({NEYMAN_BUDGET} * n_h / n_tot + 0.5) AS BIGINT)
    AS proportional_alloc
FROM w CROSS JOIN tot
ORDER BY source
"""
