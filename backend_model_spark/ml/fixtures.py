"""Deterministic Airbnb-shaped fixture generator (FIXTURES.md §1).

Reproduces the reference's dirty 29-column Kaggle CSV surface —
including the exact junk-zipcode patterns the cleaning operators must
handle (nb:1437-1471) — with a seeded RNG so every golden invariant
(G1-G8) is computable ahead of time by the generator itself.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

SEED = 42

CITIES = ["Boston", "Chicago", "DC", "LA", "NYC", "SF"]
PROPERTY_TYPES = [f"PropType{i:02d}" for i in range(31)]
ROOM_TYPES = ["Entire home/apt", "Private room", "Shared room"]
BED_TYPES = ["Airbed", "Couch", "Futon", "Pull-out Sofa", "Real Bed"]
CANCEL_POLICIES = ["flexible", "moderate", "strict", "super_strict_30", "super_strict_60"]

# junk zips per nb:1437-1471 / FIXTURES.md: hyphenated + float-string
# are CLEANABLE; '1m' and the CR/LF multi-zips are row-DROPPED
CLEANABLE_ZIPS = ["10003-8623", "10019.0"]
JUNK_ZIPS = ["1m", "95202\r\r\n95203\r\r\n94158", "11249\r\r\n11249"]


@dataclass
class FixtureGolden:
    """Generator-side golden values (the G-invariants of FIXTURES.md §3)."""

    n_train: int
    n_test: int
    n_union: int
    n_after_dropna: int
    n_after_junk_filter: int
    mean_price: float
    min_price: float
    max_price: float
    city_counts: dict[str, int]


def generate_listings(
    n_rows: int = 5000,
    null_fraction: float = 0.3,
    seed: int = SEED,
    n_train: int | None = None,
    n_null_rows: int | None = None,
) -> tuple[pd.DataFrame, pd.DataFrame, FixtureGolden]:
    """Build (train, test, golden). Dirty patterns deterministic.

    ``n_train`` / ``n_null_rows`` override the ratio defaults so the
    fixture can mirror the reference's exact row funnel
    (74,111 + 25,458 = 99,569 → 38,499; SURVEY.md §5 goldens) — used
    by the registered ``pipeline_airbnb_e2e`` entry."""
    rng = np.random.default_rng(seed)
    if n_train is None:
        n_train = int(n_rows * 0.75)

    # Feature columns drawn FIRST so price can depend on them.
    # Round 9: the real Kaggle price is learnable from the listing
    # features (the reference's whole modeling premise); a noise-only
    # log_price made the held-out-R²>0 certificate of
    # ``pipeline_airbnb_train_eval`` unsatisfiable, so the fixture now
    # prices listings from capacity/quality/city/room-type plus
    # bounded log-normal noise (clipped ±3σ keeps price ≤ ~1,800).
    city = rng.choice(CITIES, n_rows, p=[0.06, 0.06, 0.06, 0.26, 0.46, 0.10])
    accommodates = rng.integers(1, 17, n_rows)
    bathrooms = rng.integers(0, 9, n_rows).astype("float64")
    bedrooms = rng.integers(0, 11, n_rows).astype("float64")
    beds = rng.integers(0, 19, n_rows).astype("float64")
    review_scores = rng.integers(20, 101, n_rows).astype("float64")
    cleaning_fee = rng.choice([True, False], n_rows)
    room_type = rng.choice(ROOM_TYPES, n_rows)
    city_premium = np.array(
        [{"Boston": 25, "Chicago": 10, "DC": 20, "LA": 40, "NYC": 70, "SF": 80}[c] for c in city],
        dtype="float64",
    )
    room_adj = np.array(
        [{"Entire home/apt": 45, "Private room": 10, "Shared room": 0}[r] for r in room_type],
        dtype="float64",
    )
    base = (
        30.0
        + 18.0 * accommodates
        + 9.0 * bathrooms
        + 12.0 * bedrooms
        + 6.0 * beds
        + 0.6 * review_scores
        + 15.0 * cleaning_fee.astype("float64")
        + city_premium
        + room_adj
    )
    log_price = np.log(base) + np.clip(rng.normal(0.0, 0.25, n_rows), -0.75, 0.75)
    host_since_days = rng.integers(13941, 17435, n_rows)
    host_since = pd.to_datetime(host_since_days, unit="D").strftime("%Y-%m-%d")

    zipcodes = np.array([f"{z:05d}" for z in rng.integers(2108, 94159, n_rows)], dtype=object)
    # plant cleanable + junk zips at deterministic positions
    for i, z in enumerate(CLEANABLE_ZIPS):
        zipcodes[10 + i] = z
    for i, z in enumerate(JUNK_ZIPS):
        zipcodes[20 + i] = z

    df = pd.DataFrame(
        {
            "id": np.arange(n_rows, dtype=np.int64),
            "log_price": log_price,
            "property_type": rng.choice(PROPERTY_TYPES, n_rows),
            "room_type": room_type,
            "amenities": [
                '{"Wireless Internet","Kitchen",TV}' if i % 3 else "{}"
                for i in range(n_rows)
            ],
            "accommodates": accommodates,
            "bathrooms": bathrooms,
            "bed_type": rng.choice(BED_TYPES, n_rows),
            "cancellation_policy": rng.choice(CANCEL_POLICIES, n_rows),
            "cleaning_fee": cleaning_fee,
            "city": city,
            "description": [f"desc {i} lorem ipsum" for i in range(n_rows)],
            "first_review": host_since,
            "last_review": host_since,
            "host_has_profile_pic": rng.choice(["t", "f"], n_rows),
            "host_identity_verified": rng.choice(["t", "f"], n_rows),
            "host_response_rate": [f"{r}%" for r in rng.integers(0, 101, n_rows)],
            "host_since": host_since,
            "instant_bookable": rng.choice(["t", "f"], n_rows),
            "latitude": rng.uniform(25.0, 48.0, n_rows),
            "longitude": rng.uniform(-123.0, -71.0, n_rows),
            "name": [f"listing {i}" for i in range(n_rows)],
            "neighbourhood": [f"hood{i % 600}" for i in range(n_rows)],
            "number_of_reviews": rng.integers(0, 401, n_rows),
            "review_scores_rating": review_scores,
            "thumbnail_url": [f"https://example.com/{i}.jpg" for i in range(n_rows)],
            "zipcode": zipcodes,
            "bedrooms": bedrooms,
            "beds": beds,
        }
    )

    # null budget: null out a deterministic slice of nullable columns in
    # rows AFTER the planted junk rows so junk rows survive dropna
    nullable = [
        "bathrooms",
        "first_review",
        "last_review",
        "host_has_profile_pic",
        "host_identity_verified",
        "host_response_rate",
        "host_since",
        "neighbourhood",
        "review_scores_rating",
        "thumbnail_url",
        "bedrooms",
        "beds",
    ]
    if n_null_rows is None:
        n_null_rows = int(n_rows * null_fraction)
    null_rows = rng.choice(np.arange(30, n_rows), size=n_null_rows, replace=False)
    # vectorized per-column strided assignment — the same (row, column)
    # cells as the original `for j, r: df.loc[r, nullable[j % 12]]`
    # row loop (row null_rows[j] gets column j % 12), ~40× faster at
    # the 99,569-row reference scale
    for k, col in enumerate(nullable):
        rows = null_rows[k :: len(nullable)]
        if len(rows):
            df.loc[rows, col] = None

    clean_mask = ~df.index.isin(null_rows)
    survivors = df[clean_mask]
    junk_mask = survivors["zipcode"].isin(JUNK_ZIPS)
    final = survivors[~junk_mask]
    price = np.round(np.exp(final["log_price"].to_numpy()), 2)

    golden = FixtureGolden(
        n_train=n_train,
        n_test=n_rows - n_train,
        n_union=n_rows,
        n_after_dropna=int(clean_mask.sum()),
        n_after_junk_filter=len(final),
        mean_price=float(np.mean(price)),
        min_price=float(np.min(price)),
        max_price=float(np.max(price)),
        city_counts=final["city"].value_counts().to_dict(),
    )
    train = df.iloc[:n_train].reset_index(drop=True)
    test = df.iloc[n_train:].reset_index(drop=True)
    return train, test, golden


def to_spark(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    return spark.createDataFrame(pdf)
