"""The reference's Airbnb wrangling dataflow as one lazy Spark lineage.

Re-expresses the EDA notebook chain (SURVEY.md §3.2: concat → dropna →
bool→int → price=round(exp(log_price),2) → junk-zip filter → zip regex
clean → casts → column drops → label-encode → epoch-days) as native
column expressions + a single ``StringIndexer`` pass. The reference
runs this eagerly in pandas over ~99k rows (EDA Notebook cells 4-100);
here it is one Catalyst plan that scales horizontally.

Parity-critical choices (SURVEY.md §7 "hard parts"):
* label codes must equal sklearn ``LabelEncoder``'s (sorted class
  name) → ``StringIndexer(stringOrderType="alphabetAsc")`` (E1);
* epoch-days via ``datediff(col, '1970-01-01')`` — integer-exact, no
  timezone drift (F7, nb cell 86);
* price inversion ``round(exp(log_price), 2)`` (F1/F2, nb:575-578).
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.feature import StringIndexer

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# columns handled like the reference's cell-16 bool coercion
BOOL_COLS = ["cleaning_fee", "instant_bookable", "host_identity_verified"]

# the reference label-encodes exactly these five (nb:3638-3643)
LABEL_COLS = ["property_type", "room_type", "bed_type", "cancellation_policy", "city"]

# reference's 15 dropped columns (nb:1766-1775, 1997-2000)
DROP_COLS = [
    "id",
    "amenities",
    "description",
    "first_review",
    "last_review",
    "name",
    "thumbnail_url",
    "neighbourhood",
    "latitude",
    "longitude",
    "host_has_profile_pic",
    "host_response_rate",
    "number_of_reviews",
    "log_price",
]

# junk zipcode literals the reference deletes by row (nb:1464-1471)
JUNK_ZIPS = ["1m", "95202\r\r\n95203\r\r\n94158", "11249\r\r\n11249"]

FINAL_COLS = [
    "property_type",
    "room_type",
    "accommodates",
    "bathrooms",
    "bed_type",
    "cancellation_policy",
    "cleaning_fee",
    "city",
    "host_identity_verified",
    "host_since",
    "instant_bookable",
    "review_scores_rating",
    "zipcode",
    "bedrooms",
    "beds",
    "price",
]


def union_train_test(train: DataFrame, test: DataFrame) -> DataFrame:
    """U1: the reference's pd.concat — duplicates preserved (nb:89)."""
    return train.unionByName(test)


def coerce_booleans(df: DataFrame) -> DataFrame:
    """P5: 't'/'f'/true/false → 1/0 (nb:549-556)."""
    for c in BOOL_COLS:
        df = df.withColumn(
            c,
            F.when(F.col(c).cast("string").isin("t", "true", "True", "1"), 1).otherwise(
                0
            ),
        )
    return df


def invert_log_price(df: DataFrame) -> DataFrame:
    """F1+F2: price = round(exp(log_price), 2) (nb:575-578)."""
    return df.withColumn("price", F.round(F.exp(F.col("log_price")), 2))


def filter_junk_zipcodes(df: DataFrame) -> DataFrame:
    """P4: drop rows whose zipcode equals a junk literal (nb:1464-71)."""
    return df.filter(~F.col("zipcode").isin(JUNK_ZIPS))


def clean_zipcode(df: DataFrame) -> DataFrame:
    """F4+F5+F6: the reference's ``clean_data`` UDF (nb:1437-1452) as
    native expressions: scrub non-[, a-zA-Z0-9], take the first
    space-token ('10003-8623'→'10003', '10019.0'→'10019'), cast int."""
    scrubbed = F.regexp_replace(F.col("zipcode"), r"[^, a-zA-Z0-9]", " ")
    first = F.split(scrubbed, " ").getItem(0)
    return df.withColumn("zipcode", first.cast("int"))


def host_since_epoch_days(df: DataFrame) -> DataFrame:
    """F7: 'YYYY-MM-DD' → integer epoch days (nb cell 86)."""
    return df.withColumn(
        "host_since",
        F.datediff(
            F.to_date(F.col("host_since"), "yyyy-MM-dd"),
            F.lit("1970-01-01").cast("date"),
        ),
    )


def label_encode(df: DataFrame) -> DataFrame:
    """E1: sklearn-LabelEncoder-parity encoding of the 5 categorical
    columns — alphabetAsc order is the parity trap (SURVEY §7)."""
    indexers = [
        StringIndexer(
            inputCol=c, outputCol=f"{c}__idx", stringOrderType="alphabetAsc"
        )
        for c in LABEL_COLS
    ]
    fitted = Pipeline(stages=indexers).fit(df)
    out = fitted.transform(df)
    for c in LABEL_COLS:
        out = out.drop(c).withColumnRenamed(f"{c}__idx", c).withColumn(
            c, F.col(c).cast("int")
        )
    return out


def cast_final_ints(df: DataFrame) -> DataFrame:
    """F6 (cell 78): numeric downcasts to int for the stored schema."""
    for c in [
        "accommodates",
        "bathrooms",
        "host_identity_verified",
        "cleaning_fee",
        "instant_bookable",
        "review_scores_rating",
        "bedrooms",
        "beds",
        "host_since",
    ]:
        df = df.withColumn(c, F.col(c).cast("int"))
    return df


def clean_listings(train: DataFrame, test: DataFrame) -> DataFrame:
    """The full reference chain, one lazy plan: raw listings → the
    16-column ``air_b`` modeling table (db_queries.py:4-23 schema)."""
    df = union_train_test(train, test)
    df = df.na.drop("any")
    df = coerce_booleans(df)
    df = invert_log_price(df)
    df = filter_junk_zipcodes(df)
    df = clean_zipcode(df)
    df = host_since_epoch_days(df)
    df = df.drop(*[c for c in DROP_COLS if c in df.columns])
    df = label_encode(df)
    df = cast_final_ints(df)
    return df.select(*FINAL_COLS)


# the reference's exact row funnel (SURVEY.md §5 goldens): 74,111
# train + 25,458 test = 99,569 raw listings → 38,499 stored air_b
# rows. The fixture mirrors the funnel exactly: 3 planted junk-zip
# rows are row-dropped, so the dropna stage must pass 38,502.
AIRBNB_E2E_SHAPE = dict(
    n_rows=99_569, n_train=74_111, n_null_rows=99_569 - 38_499 - 3
)

# applicationId -> (train_path, test_path): the deterministic fixture
# parquet, generated once per Spark application
_E2E_FIXTURE_CACHE: dict = {}


def airbnb_e2e(spark, sf_dir: str) -> DataFrame:
    """The reference's ENTIRE core dataflow as one registered,
    driver-checked entry: deterministic 29-column dirty fixture at
    the reference's exact row funnel (74,111 + 25,458 = 99,569 →
    38,499; the raw Kaggle CSVs are in .MISSING_LARGE_BLOBS, so the
    seeded fixture stands in) → ``clean_listings`` (concat → dropna →
    bool→int → price=round(exp(log_price),2) → junk-zip row filter →
    zip regex clean → epoch days → column drops → alphabetAsc label
    encode → int casts; EDA Notebook cells 4-100) → one summary row
    of exact integer facts computed from the cleaned frame.

    ``sf_dir`` is ignored: the reference's dataset is a fixed corpus,
    not a scaled table. The oracle is literal VALUES computed by an
    INDEPENDENT pandas implementation of the same funnel (the
    generator's golden path + a regex zip cleaner), so the driver
    hash cross-checks Spark's cleaning chain against a second engine
    end-to-end. All facts are integers (price summed as cents), so
    there is no float-association hazard.

    The fixture is written once per application to a temp parquet and
    SCANNED, not embedded: a 99,569-row local collection pickled into
    every task re-pays serialization on each of the 8 downstream jobs
    (two counts, five StringIndexer fits, the final agg — measured
    22 s embedded vs ~7 s scanned), and a parquet scan is how the
    real pipeline would ingest the CSVs anyway."""
    import os
    import tempfile

    from backend_model_spark.ml.fixtures import generate_listings

    key = spark.sparkContext.applicationId
    paths = _E2E_FIXTURE_CACHE.get(key)
    if paths is None:
        train_pdf, test_pdf, _ = generate_listings(**AIRBNB_E2E_SHAPE)
        d = tempfile.mkdtemp(prefix="airbnb_e2e_fixture_")
        # the fixture dir would otherwise outlive the process (the
        # cache key is the applicationId, so no later run reuses it) —
        # repeated driver rounds on one host would accumulate ~10 MB
        # of orphaned parquet per session (round-8 review finding)
        import atexit
        import shutil

        atexit.register(shutil.rmtree, d, ignore_errors=True)
        paths = (os.path.join(d, "train.parquet"), os.path.join(d, "test.parquet"))
        train_pdf.to_parquet(paths[0])
        test_pdf.to_parquet(paths[1])
        _E2E_FIXTURE_CACHE[key] = paths
    train = spark.read.parquet(paths[0])
    test = spark.read.parquet(paths[1])
    unioned = union_train_test(train, test)
    n_union = unioned.count()
    n_dropna = unioned.na.drop("any").count()
    cleaned = clean_listings(train, test)
    cents = F.floor(F.col("price") * 100 + F.lit(0.5)).cast("bigint")
    row = cleaned.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents).alias("sum_price_cents"),
        F.min(cents).alias("min_price_cents"),
        F.max(cents).alias("max_price_cents"),
        F.countDistinct("city").alias("n_cities"),
        F.sum("city").cast("bigint").alias("sum_city_code"),
        F.min("host_since").alias("host_since_min"),
        F.max("host_since").alias("host_since_max"),
        F.sum(
            F.col("cleaning_fee")
            + F.col("instant_bookable")
            + F.col("host_identity_verified")
        )
        .cast("bigint")
        .alias("sum_bool_flags"),
        F.sum(F.coalesce(F.col("zipcode"), F.lit(0)))
        .cast("bigint")
        .alias("sum_zipcode"),
        F.count(F.when(F.col("zipcode").isNull(), 1)).alias("n_null_zip"),
    ).select(
        F.lit(n_union).cast("bigint").alias("n_union"),
        F.lit(n_dropna).cast("bigint").alias("n_after_dropna"),
        "*",
    )
    return row


AIRBNB_E2E_ORACLE = """
SELECT
  CAST(99569 AS BIGINT) AS n_union,
  CAST(38502 AS BIGINT) AS n_after_dropna,
  CAST(38499 AS BIGINT) AS n_rows,
  CAST(3841385824 AS BIGINT) AS sum_price_cents,
  CAST(103 AS BIGINT) AS min_price_cents,
  CAST(199897 AS BIGINT) AS max_price_cents,
  CAST(6 AS BIGINT) AS n_cities,
  CAST(127062 AS BIGINT) AS sum_city_code,
  CAST(13941 AS INTEGER) AS host_since_min,
  CAST(17434 AS INTEGER) AS host_since_max,
  CAST(57488 AS BIGINT) AS sum_bool_flags,
  CAST(1855187158 AS BIGINT) AS sum_zipcode,
  CAST(0 AS BIGINT) AS n_null_zip
"""
