"""Driver-simulation: import __spark_entry__ exactly as the round driver
does, run entry() smoke at sf0.001, then every queries() entry at
$SF (default sf0.01) against its DuckDB oracle_sql() with an
order-insensitive, name-sorted-column value hash."""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as e

SF = os.environ.get("SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def vhash(pdf):
    # itertuples, NOT iterrows: iterrows() promotes each row to a
    # common dtype, so an int64 "12" next to a float column becomes
    # "12.0" on BOTH sides and masks engine dtype mismatches (DuckDB
    # HUGEINT→float64 vs Spark int64) that a dtype-strict driver hash
    # catches — the round-4/5 streaming_stateful false-green.
    cols = sorted(pdf.columns)
    rows = sorted(
        tuple(str(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    return hashlib.md5(json.dumps(rows).encode()).hexdigest()[:12]


def main():
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = e.entry(spark)
    rows = df.collect()
    print(
        "SMOKE entry(): rows=%d schema=%s"
        % (len(rows), [f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields])
    )
    assert len(rows) > 0

    qs, osql = e.queries(), e.oracle_sql()
    only = os.environ.get("ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        qs = {n: f for n, f in qs.items() if n in keep}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        try:
            spdf = fn(spark, SF).toPandas()
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"{name}: SPARK ERROR {ex}")
            continue
        if name in osql:
            try:
                opdf = con.execute(osql[name]).fetchdf()
            except Exception as ex:  # noqa: BLE001
                failures.append(name)
                print(f"{name}: ORACLE ERROR {ex}")
                continue
            match = vhash(spdf) == vhash(opdf)
            print(f"{name}: spark_rows={len(spdf)} oracle_rows={len(opdf)} hash_match={match}")
            if not match:
                failures.append(name)
                print("  spark head:\n", spdf.head().to_string())
                print("  oracle head:\n", opdf.head().to_string())
        else:
            print(f"{name}: rows-only, rows={len(spdf)}")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries OK")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
