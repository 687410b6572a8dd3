"""Scalable total-order primitives: exact global rank / ntile without
a single-partition window.

Motivation (round-2 verdict): ``W.orderBy(...)`` with no partition
spec funnels the whole table through ONE task (Spark logs
``WindowExec: No Partition Defined ... Moving all data to a single
partition``). These helpers compute the *same exact* ``row_number`` /
``ntile`` semantics — including composite tie-break orderings an
``approx_percentile`` cut-point scheme cannot reproduce — via the
classic two-stage rank:

1. ``repartitionByRange`` on the sort expressions → disjoint, ordered
   key ranges (partition i's keys all sort before partition i+1's).
2. ``row_number`` *within* each range partition — parallel across
   partitions, never a global sort.
3. Global rank = local row_number + the prefix-sum of earlier
   partitions' row counts (a |partitions|-row side table, broadcast).

Consistency: offsets and local ranks MUST observe the same physical
partitioning. Spark does not reuse an unpersisted shared subplan
(two branches would re-run the range exchange, and AQE/sampling could
legally produce different partition boundaries per run), so the ranged
DataFrame is pinned with a lazy ``localCheckpoint`` — one
materialization, both branches read the persisted blocks. The
checkpoint is the price of exact total ordering; it is the ranked
table itself (e.g. a per-customer rollup), not the raw fact table.

``ntile(k)`` then needs no extra pass: with n rows, the first
``n mod k`` tiles get ``n div k + 1`` rows and the rest ``n div k``
(the SQL-standard rule Spark and DuckDB share), so the tile is a pure
arithmetic function of (rank, n, k).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["with_global_rank", "with_global_ntile", "broadcast_scalars"]


def broadcast_scalars(df: DataFrame, scalars: DataFrame) -> DataFrame:
    """Attach a one-row aggregate to every row of ``df`` as a broadcast
    cross join — the scalable replacement for ``agg OVER ()``."""
    return df.crossJoin(F.broadcast(scalars))


def with_global_rank(
    df: DataFrame,
    order: Sequence[Column],
    rank_col: str,
    total_col: str | None = None,
    prefix_sum: tuple[str, str] | None = None,
    grand_total: tuple[str, str] | None = None,
    prefix_max: tuple[str, str] | None = None,
) -> DataFrame:
    """Add an exact 1-based global ``row_number`` over ``order`` (a list
    of sort-order Columns, e.g. ``[F.col("x").desc(), F.col("k").asc()]``)
    without moving the table through a single partition.

    Optional companions computed from the SAME materialization:

    * ``total_col`` — attach the total row count to every row
      (``count() OVER ()`` as a broadcast one-row scalar).
    * ``prefix_sum=(value_col, out_col)`` — exact global running sum of
      ``value_col`` in rank order (``sum(v) OVER (ORDER BY ... ROWS
      UNBOUNDED PRECEDING)``): per-partition running sum + the
      broadcast sum of earlier partitions' totals.
    * ``grand_total=(value_col, out_col)`` — attach ``sum(value_col)
      OVER ()`` as a broadcast scalar (summed from the per-partition
      totals — no second scan of ``df``'s lineage).
    * ``prefix_max=(value_col, out_col)`` — exact global running MAX
      of ``value_col`` in rank order (``max(v) OVER (ORDER BY ...
      ROWS UNBOUNDED PRECEDING)``): per-partition running max
      ``greatest``-ed with the broadcast max of earlier partitions
      (``greatest`` skips the NULL offset of the first partition).
    """
    if prefix_sum and grand_total and prefix_sum[0] != grand_total[0]:
        raise ValueError("prefix_sum and grand_total must share a value col")
    vcol = (prefix_sum or grand_total or (None,))[0]
    ranged = (
        df.repartitionByRange(*order)
        .withColumn("__sg_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    per_part = [F.count(F.lit(1)).alias("__sg_cnt")]
    if vcol is not None:
        per_part.append(F.sum(vcol).alias("__sg_vsum"))
    if prefix_max is not None:
        per_part.append(F.max(prefix_max[0]).alias("__sg_vmax"))
    counts = ranged.groupBy("__sg_pid").agg(*per_part)
    a, b = counts.alias("a"), counts.alias("b")
    # Prefix-sum of earlier partitions' totals. |partitions|² pairs —
    # O(cluster width), not O(data) — and stays fully declarative (a
    # window here would itself be an unpartitioned WindowExec).
    offs = [F.coalesce(F.sum("b.__sg_cnt"), F.lit(0)).alias("__sg_off")]
    if vcol is not None:
        offs.append(
            F.coalesce(F.sum("b.__sg_vsum"), F.lit(0)).alias("__sg_voff")
        )
    if prefix_max is not None:
        # NULL for the first partition — greatest() skips it below
        offs.append(F.max("b.__sg_vmax").alias("__sg_moff"))
    offsets = (
        a.join(b, F.col("b.__sg_pid") < F.col("a.__sg_pid"), "left")
        .groupBy(F.col("a.__sg_pid").alias("__sg_pid"))
        .agg(*offs)
    )
    w = W.partitionBy("__sg_pid").orderBy(*order)
    local = ranged.withColumn("__sg_lrn", F.row_number().over(w))
    if prefix_sum is not None:
        local = local.withColumn(
            "__sg_lcum",
            F.sum(prefix_sum[0]).over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
    if prefix_max is not None:
        local = local.withColumn(
            "__sg_lmax",
            F.max(prefix_max[0]).over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
    out = (
        local.join(F.broadcast(offsets), "__sg_pid")
        .withColumn(
            rank_col, (F.col("__sg_lrn") + F.col("__sg_off")).cast("bigint")
        )
    )
    if prefix_sum is not None:
        out = out.withColumn(
            prefix_sum[1], F.col("__sg_lcum") + F.col("__sg_voff")
        ).drop("__sg_lcum", "__sg_voff")
    if prefix_max is not None:
        out = out.withColumn(
            prefix_max[1], F.greatest(F.col("__sg_lmax"), F.col("__sg_moff"))
        ).drop("__sg_lmax", "__sg_moff")
    out = out.drop("__sg_pid", "__sg_lrn", "__sg_off")
    if total_col is not None:
        total = counts.agg(F.sum("__sg_cnt").cast("bigint").alias(total_col))
        out = broadcast_scalars(out, total)
    if grand_total is not None:
        gt = counts.agg(F.sum("__sg_vsum").alias(grand_total[1]))
        out = broadcast_scalars(out, gt)
    return out


def with_global_ntile(
    df: DataFrame,
    k: int,
    order: Sequence[Column],
    tile_col: str,
) -> DataFrame:
    """Add an exact global ``ntile(k)`` over ``order`` via
    :func:`with_global_rank` + the SQL-standard tile-size rule.

    Matches ``F.ntile(k).over(W.orderBy(*order))`` value-for-value
    (cast to int, as Spark's ntile returns) while staying parallel.
    """
    ranked = with_global_rank(df, order, "__sg_rank", total_col="__sg_n")
    # First (n % k) tiles hold (n div k + 1) rows, the rest (n div k).
    # CASE evaluates lazily per row, so the q = 0 (n < k) division in
    # the ELSE branch is unreachable, never raised.
    tile = F.expr(
        f"cast(case when __sg_rank <= (__sg_n % {k}) * ((__sg_n div {k}) + 1) "
        f"then (__sg_rank - 1) div ((__sg_n div {k}) + 1) + 1 "
        f"else (__sg_n % {k}) "
        f"  + ((__sg_rank - 1) - (__sg_n % {k}) * ((__sg_n div {k}) + 1)) "
        f"    div (__sg_n div {k}) + 1 end as int)"
    )
    return ranked.withColumn(tile_col, tile).drop("__sg_rank", "__sg_n")


def ensure_persisted(df: DataFrame) -> DataFrame:
    """Re-assert a MEMO-OWNED frame's persist after an external
    ``spark.catalog.clearCache()`` unpersisted it behind the memo's
    back (the round-10 BRP canary catch: an unpersisted memo hit
    re-paid the dedup window per lineage evaluation — 239–300 s vs
    ~35 s at Zipf). ONE shared implementation so the ownership rule
    cannot drift between memo sites."""
    sl = df.storageLevel
    if not (sl.useMemory or sl.useDisk):
        df.persist()
    return df


def purge_other_apps(cache: dict, app_id: str) -> None:
    """Drop memo keys whose applicationId differs from the current
    one (round-10 advice): every module-level memo keys on
    ``(applicationId, ...)``, and a long-lived process that restarts
    its SparkSession would otherwise accumulate DataFrame/weight
    references bound to dead contexts forever. Call at each memo
    INSERT site (a key's first element is always the applicationId).
    No unpersist attempt — the owning context is already gone, and
    unpersisting through a dead SparkContext raises. Keys are either
    ``(applicationId, ...)`` tuples or the bare applicationId string
    (ml.cleaning's one-row memos)."""
    for key in [
        k
        for k in cache
        if (k[0] if isinstance(k, tuple) else k) != app_id
    ]:
        cache.pop(key, None)
