"""Time every registered query (Spark side + DuckDB oracle side) at $SF.

Prints a sorted per-query timing table so slow entries — which eat the
round driver's correctness budget — are visible. Mirrors
scripts/drive_driver.py but records wall time instead of diffing heads.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as e

SF = os.environ.get("SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main():
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("timing")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    times = {}
    t_start = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        err = None
        try:
            fn(spark, SF).toPandas()
        except Exception as ex:  # noqa: BLE001
            err = str(ex)[:100]
        t_spark = time.time() - t0
        t1 = time.time()
        if name in osql:
            try:
                con.execute(osql[name]).fetchdf()
            except Exception as ex:  # noqa: BLE001
                err = (err or "") + " ORACLE:" + str(ex)[:100]
        t_oracle = time.time() - t1
        times[name] = (t_spark, t_oracle, err)
        print(f"{name}\t{t_spark:.2f}\t{t_oracle:.2f}\t{err or ''}", flush=True)

    total = time.time() - t_start
    print(f"\nTOTAL {total:.1f}s for {len(qs)} queries")
    slow = sorted(times.items(), key=lambda kv: -(kv[1][0] + kv[1][1]))[:25]
    print("\nSLOWEST 25:")
    for name, (ts, to, err) in slow:
        print(f"  {name}: spark={ts:.2f}s oracle={to:.2f}s {err or ''}")
    with open("/tmp/query_times.json", "w") as f:
        json.dump({k: v[:2] for k, v in times.items()}, f)


if __name__ == "__main__":
    main()
