"""Golden-invariant tests (FIXTURES.md §3, G1-G8) for the Airbnb
cleaning chain — the test suite the reference never had, asserting the
sanity-check values its notebook prints inline (SURVEY.md §5)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from backend_model_spark.ml import cleaning
from backend_model_spark.ml.fixtures import CITIES, generate_listings, to_spark

N_ROWS = 2000


@pytest.fixture(scope="module")
def fixture_data(spark):
    train_pdf, test_pdf, golden = generate_listings(n_rows=N_ROWS)
    train = to_spark(spark, train_pdf)
    test = to_spark(spark, test_pdf)
    return train, test, golden


@pytest.fixture(scope="module")
def cleaned(spark, fixture_data):
    train, test, _ = fixture_data
    return cleaning.clean_listings(train, test).cache()


def test_g1_union_conservation(fixture_data):
    train, test, golden = fixture_data
    unioned = cleaning.union_train_test(train, test)
    assert train.count() == golden.n_train
    assert test.count() == golden.n_test
    assert unioned.count() == golden.n_union


def test_g3_null_drop_count(fixture_data):
    train, test, golden = fixture_data
    dropped = cleaning.union_train_test(train, test).na.drop("any")
    assert dropped.count() == golden.n_after_dropna


def test_g4_junk_and_clean_zipcodes(fixture_data, cleaned):
    _, _, golden = fixture_data
    assert cleaned.count() == golden.n_after_junk_filter
    # cleanable zips survive as parsed ints
    zips = {r.zipcode for r in cleaned.select("zipcode").distinct().collect()}
    assert 10003 in zips  # '10003-8623'
    assert 10019 in zips  # '10019.0'
    assert None not in zips


def test_g2_g8_price_inversion_and_aggregates(fixture_data, cleaned):
    _, _, golden = fixture_data
    stats = cleaned.agg(
        F.mean("price").alias("mean"),
        F.min("price").alias("mn"),
        F.max("price").alias("mx"),
    ).collect()[0]
    assert stats.mean == pytest.approx(golden.mean_price, rel=1e-9)
    assert stats.mn == pytest.approx(golden.min_price)
    assert stats.mx == pytest.approx(golden.max_price)


def test_g5_label_encoding_alphabetical(fixture_data, cleaned):
    _, _, golden = fixture_data
    # city codes must equal alphabetical rank (sklearn LabelEncoder
    # parity): Boston=0 ... SF=5
    counts = {
        r.city: r.n
        for r in cleaned.groupBy("city").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    expected = {CITIES.index(c): n for c, n in golden.city_counts.items()}
    assert counts == expected


def test_g6_epoch_days_range(cleaned):
    r = cleaned.agg(F.min("host_since"), F.max("host_since")).collect()[0]
    assert 13941 <= r[0] <= r[1] <= 17434


def test_g7_bool_coercion(cleaned):
    for c in ["cleaning_fee", "instant_bookable", "host_identity_verified"]:
        vals = {row[0] for row in cleaned.select(c).distinct().collect()}
        assert vals <= {0, 1}


def test_final_schema_is_air_b(cleaned):
    # 16 columns: 15 int features + double price (db_queries.py:4-23)
    assert cleaned.columns == cleaning.FINAL_COLS
    dtypes = dict(cleaned.dtypes)
    assert dtypes["price"] == "double"
    for c in cleaning.FINAL_COLS[:-1]:
        assert dtypes[c] == "int", f"{c} is {dtypes[c]}"
