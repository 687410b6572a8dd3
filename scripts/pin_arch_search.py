"""Regenerate the pinned champion literals in ml/arch_search.py and the
trainer literals in ml/train_distributed.py (MLP_TRAIN_ORACLE).

Run after any change to the trainer math, the search spaces, the
schedules or the seeds:

    python scripts/pin_arch_search.py [sf_dir]

Prints the literal block to paste; does NOT edit files (pinning is a
reviewed, committed act — the oracle is the contract).
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("pin-arch-search")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from backend_model_spark.ml.arch_search import _search
    from backend_model_spark.ml.train_distributed import (
        train_serial,
        weight_checksum,
    )

    wts, losses = train_serial(sf_dir)
    print("# MLP_TRAIN_ORACLE literals (train_distributed.py):")
    print(f"#   loss_first_q    = {math.floor(losses[0] * 1e6 + 0.5)}")
    print(f"#   loss_final_q    = {math.floor(losses[-1] * 1e6 + 0.5)}")
    print(f"#   weight_checksum = {weight_checksum(wts)}")
    mono = all(losses[i + 1] < losses[i] for i in range(len(losses) - 1))
    print(f"#   (loss_monotone={mono}, beats_mean={losses[-1] < 1.0})")

    r = _search(spark, sf_dir)
    g, t = r["grid"], r["tpe"]
    win = "grid" if (g[3], "grid") < (t[3], "tpe") else "tpe"
    print("\n# arch_search.py oracle literals:")
    print(f"#   grid: h1={g[0]} h2={g[1]} lr_e4={g[2]} loss_q={g[3]} n={g[4]} win={win=='grid'}")
    print(f"#   tpe:  h1={t[0]} h2={t[1]} lr_e4={t[2]} loss_q={t[3]} n={t[4]} win={win=='tpe'}")

    from backend_model_spark.ml.arch_search import _search_subsample

    s = _search_subsample(spark, sf_dir)
    print(
        f"#   sub:  h1={s[0]} h2={s[1]} lr_e4={s[2]} sub_loss_q={s[3]} "
        f"full_loss_q={s[4]} n={s[5]}"
    )


if __name__ == "__main__":
    main()
