"""Markov-chain removal-effect attribution — the data-driven
multi-touch attribution model (Anderl et al. 2014): which marketing
channel actually CAUSES conversions, measured by how much the
conversion probability drops when the channel is removed from the
journey graph.

Channels here are the transient event types (view, click, signup);
``purchase`` absorbs as conversion; ``error`` and end-of-history
absorb as drop. The whole model is two aggregations + closed-form
algebra:

1. ONE pass over user journeys builds the transition-count matrix
   (lead() per user, conditional aggregation into a single row —
   map-side combinable, no collect) and the first-touch distribution.
2. Absorption probabilities solve the 3×3 linear system
   (I − Q)·a = r IN-QUERY via Cramer's rule (the
   ``ml_ridge_closed_form`` precedent); each removal effect re-solves
   the 2×2 system with that channel's row/column deleted (transitions
   into it become drops — the standard removal semantics).

Cross-engine exactness: every probability/determinant/effect is built
from ONE shared arithmetic-expression string evaluated by BOTH
engines (`F.expr` on Spark, verbatim SQL on DuckDB) over identically
named count columns — the formula text being literally shared makes
structural divergence impossible; doubles then round once at the
edge. Degenerate inputs (a channel with zero outgoing transitions,
zero transient first-touches, or zero conversions overall) are
NULLIF-guarded in the shared text, so BOTH engines yield NULL
probabilities/effects instead of Spark's ANSI DIVIDE_BY_ZERO raising
where DuckDB returns rows. At 100 TB a channel with zero traffic
should still be dropped from the state set upstream.

Scale: the journey scan is one shuffle (user window); everything
after runs on a ONE-ROW frame of 21 counters. At any SF the model
cost is the scan, exactly like the sufficient-statistics OLS/ridge
entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from backend_model_spark.sources.tables import load_table

# transient channels (short key -> event_type)
CH = {"v": "view", "k": "click", "g": "signup"}
_S = tuple(CH)  # ("v", "k", "g")

# ---------------------------------------------------------------------------
# Shared arithmetic (identical text on both engines).
# p_ab = P(a -> b) for transient a, b; p_ac = P(a -> conversion).
# ---------------------------------------------------------------------------
P_EXPRS = {
    f"p_{a}{b}": f"n_{a}{b} / NULLIF(t_{a}, 0)" for a in _S for b in (*_S, "c")
}

# det(I - Q) for the 3x3 transient matrix, rows/cols in (v, k, g)
_A = {
    (a, b): (f"(1 - p_{a}{b})" if a == b else f"(0 - p_{a}{b})")
    for a in _S
    for b in _S
}


def _det3(col: dict[tuple[str, str], str]) -> str:
    r = _S
    return (
        f"({col[r[0], r[0]]} * ({col[r[1], r[1]]} * {col[r[2], r[2]]}"
        f" - {col[r[1], r[2]]} * {col[r[2], r[1]]})"
        f" - {col[r[0], r[1]]} * ({col[r[1], r[0]]} * {col[r[2], r[2]]}"
        f" - {col[r[1], r[2]]} * {col[r[2], r[0]]})"
        f" + {col[r[0], r[2]]} * ({col[r[1], r[0]]} * {col[r[2], r[1]]}"
        f" - {col[r[1], r[1]]} * {col[r[2], r[0]]}))"
    )


DET3 = _det3(_A)


def _cramer3(target: str) -> str:
    """Absorption probability of ``target``: det of (I−Q) with the
    target's column replaced by r = (p_vc, p_kc, p_gc), over DET3."""
    col = {
        (a, b): (f"p_{a}c" if b == target else _A[a, b]) for a in _S for b in _S
    }
    return f"({_det3(col)} / {DET3})"


ABSORB = {s: _cramer3(s) for s in _S}


def _cramer2(removed: str) -> dict[str, str]:
    """2×2 absorption solve with ``removed`` deleted (its row/col
    gone; transitions into it are lost mass = drops)."""
    (x, y) = tuple(s for s in _S if s != removed)
    det2 = (
        f"({_A[x, x]} * {_A[y, y]} - {_A[x, y]} * {_A[y, x]})"
    )
    return {
        x: f"((p_{x}c * {_A[y, y]} - {_A[x, y]} * p_{y}c) / {det2})",
        y: f"(({_A[x, x]} * p_{y}c - p_{x}c * {_A[y, x]}) / {det2})",
    }


P_FULL = (
    "((f_v * a_v + f_k * a_k + f_g * a_g) / NULLIF(f_tot, 0))"
)


def _p_removed(removed: str) -> str:
    a2 = _cramer2(removed)
    (x, y) = tuple(s for s in _S if s != removed)
    return f"((f_{x} * {a2[x]} + f_{y} * {a2[y]}) / NULLIF(f_tot, 0))"


def markov_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per channel: first-touch share, absorption probability
    P(convert | start here), and the removal effect
    1 − P(conv | channel removed) / P(conv)."""
    ev = load_table(spark, "events", sf_dir)
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "ts", "event_id", "event_type").withColumn(
        "nxt", F.lead("event_type").over(wu)
    )
    transient = list(CH.values())
    dclass = (
        F.when(F.col("nxt").isin(transient), F.col("nxt"))
        .when(F.col("nxt") == "purchase", F.lit("__conv__"))
        .otherwise(F.lit("__drop__"))  # error / end of history
    )
    trans = seq.filter(F.col("event_type").isin(transient)).select(
        F.col("event_type").alias("s"), dclass.alias("d")
    )
    firsts = (
        seq.withColumn("rn", F.row_number().over(wu))
        .filter((F.col("rn") == 1) & F.col("event_type").isin(transient))
        .select(F.col("event_type").alias("s0"))
    )

    cnt_cols = []
    for a, a_t in CH.items():
        for b, b_t in CH.items():
            cnt_cols.append(
                F.sum(
                    ((F.col("s") == a_t) & (F.col("d") == b_t)).cast("long")
                ).alias(f"n_{a}{b}")
            )
        cnt_cols.append(
            F.sum(
                ((F.col("s") == a_t) & (F.col("d") == "__conv__")).cast("long")
            ).alias(f"n_{a}c")
        )
        cnt_cols.append(
            F.sum((F.col("s") == a_t).cast("double")).alias(f"t_{a}")
        )
    counts = trans.agg(*cnt_cols)
    f_cols = [
        F.sum((F.col("s0") == a_t).cast("double")).alias(f"f_{a}")
        for a, a_t in CH.items()
    ] + [F.count(F.lit(1)).cast("double").alias("f_tot")]
    fr = firsts.agg(*f_cols)

    one = counts.crossJoin(F.broadcast(fr))
    for name, expr in P_EXPRS.items():
        one = one.withColumn(name, F.expr(expr))
    for s in _S:
        one = one.withColumn(f"a_{s}", F.expr(ABSORB[s]))

    # one struct per channel exploded out of ONE projection — a union
    # of per-channel selects off the unpersisted one-row frame would
    # re-derive the whole journey lineage per channel (measured 6
    # corpus scans; Spark does not reuse shared subplans)
    def _row(s: str, s_t: str):
        return F.struct(
            F.lit(s_t).alias("channel"),
            F.expr(f"floor(f_{s} / NULLIF(f_tot, 0) * 1000000 + 0.5)")
            .cast("long")
            .alias("first_touch_micro"),
            F.expr(f"round(a_{s}, 6)").alias("absorption_prob"),
            F.expr(f"round(1 - {_p_removed(s)} / NULLIF({P_FULL}, 0), 6)").alias(
                "removal_effect"
            ),
        )

    return (
        one.select(
            F.explode(
                F.array(*[_row(s, s_t) for s, s_t in CH.items()])
            ).alias("r")
        )
        .select("r.*")
        .orderBy("channel")
    )


def _oracle() -> str:
    n_cols = []
    for a, a_t in CH.items():
        for b, b_t in CH.items():
            n_cols.append(
                f"CAST(SUM(CASE WHEN s = '{a_t}' AND d = '{b_t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{a}{b}"
            )
        n_cols.append(
            f"CAST(SUM(CASE WHEN s = '{a_t}' AND d = '__conv__' THEN 1 ELSE 0 END) AS BIGINT) AS n_{a}c"
        )
        n_cols.append(
            f"CAST(SUM(CASE WHEN s = '{a_t}' THEN 1 ELSE 0 END) AS DOUBLE) AS t_{a}"
        )
    f_cols = [
        f"CAST(SUM(CASE WHEN s0 = '{a_t}' THEN 1 ELSE 0 END) AS DOUBLE) AS f_{a}"
        for a, a_t in CH.items()
    ] + ["CAST(COUNT(*) AS DOUBLE) AS f_tot"]
    p_cols = ",\n    ".join(f"{e} AS {n}" for n, e in P_EXPRS.items())
    a_cols = ",\n    ".join(f"{ABSORB[s]} AS a_{s}" for s in _S)
    selects = []
    for s, s_t in CH.items():
        selects.append(
            f"""SELECT '{s_t}' AS channel,
  CAST(FLOOR(f_{s} / NULLIF(f_tot, 0) * 1000000 + 0.5) AS BIGINT) AS first_touch_micro,
  ROUND(a_{s}, 6) AS absorption_prob,
  ROUND(1 - {_p_removed(s)} / NULLIF({P_FULL}, 0), 6) AS removal_effect
FROM one"""
        )
    transient_sql = ", ".join(f"'{t}'" for t in CH.values())
    union = "\nUNION ALL\n".join(selects)
    n_cols_sql = ",\n    ".join(n_cols)
    f_cols_sql = ",\n    ".join(f_cols)
    return f"""
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
trans AS (
  SELECT event_type AS s,
    CASE WHEN nxt IN ({transient_sql}) THEN nxt
         WHEN nxt = 'purchase' THEN '__conv__'
         ELSE '__drop__' END AS d
  FROM seq WHERE event_type IN ({transient_sql})
),
counts AS (
  SELECT
    {n_cols_sql}
  FROM trans
),
firsts AS (
  SELECT event_type AS s0 FROM seq
  WHERE rn = 1 AND event_type IN ({transient_sql})
),
fr AS (
  SELECT
    {f_cols_sql}
  FROM firsts
),
base AS (SELECT * FROM counts CROSS JOIN fr),
probs AS (
  SELECT *,
    {p_cols}
  FROM base
),
one AS (
  SELECT *,
    {a_cols}
  FROM probs
)
{union}
ORDER BY channel
"""


MARKOV_ATTRIBUTION_ORACLE = _oracle()
