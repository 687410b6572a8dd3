"""Independent pandas implementation of the reference's Airbnb funnel.

Computes the literal oracle values for ``AIRBNB_E2E_ORACLE``
(backend_model_spark/ml/cleaning.py) from the SAME deterministic
fixture the registered entry scans — but through a from-scratch pandas
pipeline (concat → dropna → bool coercion → half-up price inversion →
junk-zip row filter → regex zip clean → epoch days → sorted-category
label codes), never the Spark operators. This is the second engine the
driver hash cross-checks against; round 8 computed these constants
offline, round 9 commits the computation (and re-runs it after the
fixture's price model became feature-dependent).

Usage: python scripts/airbnb_golden.py   # prints the oracle SQL body
"""

from __future__ import annotations

import os
import re
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from backend_model_spark.ml.cleaning import AIRBNB_E2E_SHAPE  # noqa: E402
from backend_model_spark.ml.fixtures import JUNK_ZIPS, generate_listings  # noqa: E402


def _round_half_up_cents(x: float) -> int:
    """Spark's F.round(col, 2) is BigDecimal HALF_UP on the double's
    shortest decimal repr (Double.toString == python repr); the entry
    then takes floor(price*100 + 0.5). Both steps exactly."""
    price = Decimal(repr(float(x))).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    return int(price * 100)


def _clean_zip(z: str):
    first = re.sub(r"[^, a-zA-Z0-9]", " ", z).split(" ")[0]
    try:
        return int(first)
    except ValueError:
        return None


def main() -> None:
    train, test, _ = generate_listings(**AIRBNB_E2E_SHAPE)
    df = pd.concat([train, test], ignore_index=True)
    n_union = len(df)
    df = df.dropna(how="any")
    n_dropna = len(df)
    df = df[~df["zipcode"].isin(JUNK_ZIPS)].copy()

    for c in ["cleaning_fee", "instant_bookable", "host_identity_verified"]:
        df[c] = df[c].astype(str).isin(["t", "true", "True", "1"]).astype(int)
    cents = df["log_price"].map(lambda lp: _round_half_up_cents(np.exp(lp)))
    df["zipcode"] = df["zipcode"].map(_clean_zip)
    epoch = pd.Timestamp("1970-01-01")
    df["host_since"] = (pd.to_datetime(df["host_since"]) - epoch).dt.days
    city_codes = {c: i for i, c in enumerate(sorted(df["city"].unique()))}
    df["city_code"] = df["city"].map(city_codes)

    facts = {
        "n_union": n_union,
        "n_after_dropna": n_dropna,
        "n_rows": len(df),
        "sum_price_cents": int(cents.sum()),
        "min_price_cents": int(cents.min()),
        "max_price_cents": int(cents.max()),
        "n_cities": df["city"].nunique(),
        "sum_city_code": int(df["city_code"].sum()),
        "host_since_min": int(df["host_since"].min()),
        "host_since_max": int(df["host_since"].max()),
        "sum_bool_flags": int(
            (df["cleaning_fee"] + df["instant_bookable"] + df["host_identity_verified"]).sum()
        ),
        "sum_zipcode": int(df["zipcode"].fillna(0).sum()),
        "n_null_zip": int(df["zipcode"].isna().sum()),
    }
    # host_since is INT on the Spark side (cast_final_ints); every
    # count/sum is BIGINT (count, countDistinct, sum casts)
    ints = {"host_since_min", "host_since_max"}
    print("SELECT")
    lines = []
    for k, v in facts.items():
        t = "INTEGER" if k in ints else "BIGINT"
        lines.append(f"  CAST({v} AS {t}) AS {k}")
    print(",\n".join(lines))


if __name__ == "__main__":
    main()
