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
