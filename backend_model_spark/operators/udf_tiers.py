"""The three Python-UDF tiers, demonstrated and benchmarked honestly.

The engine's rule (README): built-in column expressions first; when
Python is unavoidable, Arrow-batched UDFs; row-at-a-time Python UDFs
never in a hot path. This module makes the tiers concrete with the
SAME logical function — text normalization (lower, trim, collapse
whitespace) — implemented three ways:

1. ``native_normalize``  — pure `pyspark.sql.functions` (codegen,
   JVM-side): the production path, oracle-checked.
2. ``pandas_udf_normalize`` — `@pandas_udf` (Arrow batches, pandas
   str ops): the escape hatch, oracle-checked to the SAME oracle —
   proving tier 2 is a drop-in when tier 1 can't express the logic.
3. ``arrow_map_normalize`` — ``mapInArrow`` over raw
   ``pyarrow.RecordBatch``es: the lowest-overhead Python tier (no
   pandas object materialization), for per-partition logic that wants
   Arrow-native compute. Same oracle again.
4. A row-at-a-time `@udf` exists here ONLY as the documented
   anti-pattern; it is not registered as a query.

Reference parity: the reference's `clean_data` zipcode scrub and
`datetime_to_UTC_days` (SURVEY §2.11) are exactly this situation —
row-wise `Series.apply` functions that tier 1 replaces wholesale.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from backend_model_spark.sources.tables import load_table


def _report(docs: DataFrame, normalized) -> DataFrame:
    return (
        docs.select("source", normalized.alias("norm"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("norm").alias("n_distinct_norm"),
            F.sum(F.length("norm")).alias("sum_norm_chars"),
        )
        .orderBy("source")
    )


def native_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier 1: whole-stage-codegen column expression."""
    docs = load_table(spark, "documents", sf_dir)
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return _report(docs, norm)


def pandas_udf_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier 2: Arrow-batched pandas UDF computing the identical
    normalization — same oracle as tier 1, so the driver proves the
    escape hatch is semantics-preserving."""

    # defined here, not at module level: pandas_udf parses its return
    # type against the active session, which need not exist at import
    @pandas_udf(T.StringType())
    def pd_normalize(s: pd.Series) -> pd.Series:
        return s.str.strip().str.lower().str.replace(r"\s+", " ", regex=True)

    docs = load_table(spark, "documents", sf_dir)
    return _report(docs, pd_normalize(F.col("text")))


def arrow_map_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tier 3: ``mapInArrow`` — the batch iterator works directly on
    ``pyarrow.RecordBatch``es via ``pyarrow.compute`` kernels, never
    materializing pandas objects. The aggregate afterwards is normal
    JVM-side codegen; only the normalization crosses into Python, in
    Arrow columnar form both directions."""
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_table(spark, "documents", sf_dir).select("source", "text")

    def normalize_batches(batches):
        for batch in batches:
            text = batch.column(batch.schema.get_field_index("text"))
            norm = pc.replace_substring_regex(
                pc.utf8_lower(pc.utf8_trim_whitespace(text)),
                pattern=r"\s+",
                replacement=" ",
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), norm], names=["source", "norm"]
            )

    normalized = docs.mapInArrow(normalize_batches, "source string, norm string")
    return (
        normalized.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("norm").alias("n_distinct_norm"),
            F.sum(F.length("norm")).alias("sum_norm_chars"),
        )
        .orderBy("source")
    )


NORMALIZE_ORACLE = r"""
SELECT
  source,
  COUNT(*) AS n_docs,
  COUNT(DISTINCT regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
    AS n_distinct_norm,
  CAST(SUM(length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS BIGINT)
    AS sum_norm_chars
FROM documents
GROUP BY source
ORDER BY source
"""


def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row → N output rows.

    Splits each document into sentences on ``[.!?]+`` and yields
    (sent_idx, sentence, n_chars) per non-empty piece, consumed via a
    SQL LATERAL join. The UDTF surface is the right tool when the
    fan-out logic needs imperative Python (a real tokenizer, a parser);
    for this regex-split case the native ``posexplode(split(...))``
    would win — registered here to prove the surface against the same
    oracle discipline, aggregated per source so the result stays small.

    Scale: UDTFs run row-at-a-time in Python workers — the slowest
    tier. Keep them off corpus-wide hot paths; the narrow pipeline
    (scan → lateral → partial agg) at least avoids any extra shuffle
    beyond the final small aggregation.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string, n_chars int")
    class SentenceSplit:
        def eval(self, text: str):
            import re

            idx = 0
            for piece in re.split(r"[.!?]+", text or ""):
                cleaned = re.sub(r"^\s+|\s+$", "", piece)
                if cleaned:
                    idx += 1
                    yield idx, cleaned, len(cleaned)

    spark.udtf.register("sentence_split", SentenceSplit)
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source", "text")
    docs.createOrReplaceTempView("udtf_docs_v")
    return spark.sql(
        """
        SELECT d.source,
               COUNT(*)                          AS n_sentences,
               CAST(SUM(s.n_chars) AS BIGINT)    AS sum_chars,
               CAST(MAX(s.sent_idx) AS INTEGER)  AS max_sentences_per_doc
        FROM udtf_docs_v d, LATERAL sentence_split(d.text) s
        GROUP BY d.source
        ORDER BY d.source
        """
    )


SENTENCE_SPLIT_ORACLE = r"""
WITH arr AS (
  SELECT doc_id, source, string_split_regex(text, '[.!?]+') AS parts
  FROM documents
),
pieces AS (
  SELECT doc_id, source,
         regexp_replace(parts[i], '^\s+|\s+$', '', 'g') AS sentence
  FROM arr, unnest(generate_series(1, len(parts))) AS t(i)
),
sents AS (
  SELECT doc_id, source, sentence,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY doc_id) AS sent_idx
  FROM pieces WHERE sentence <> ''
)
SELECT source,
       COUNT(*) AS n_sentences,
       CAST(SUM(length(sentence)) AS BIGINT) AS sum_chars,
       CAST(MAX(sent_idx) AS INTEGER) AS max_sentences_per_doc
FROM sents
GROUP BY source
ORDER BY source
"""


def udaf_pandas_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDAF (grouped-agg tier): quantity-weighted mean unit
    price, used BOTH as a ``groupBy().agg`` aggregate and as a window
    function over the returnflag partition — the two consumption modes
    of a custom Arrow-batched aggregate.

    Determinism discipline: the UDAF folds exact integers (price cents
    as int64, integer-valued quantities), so the only float op is one
    final division — engine-order-independent, unlike a double sum.

    Scale: grouped-agg pandas UDFs get map-side partial application
    only per Arrow batch; the full group's rows still shuffle to one
    task (unlike built-in SUM, which combines map-side). Fine for
    bounded groups; for skewed hot keys pre-aggregate the sufficient
    statistics natively (see agg_salted_skew).
    """
    from pyspark.sql import Window as W

    @pandas_udf("double")
    def wmean(cents: pd.Series, qty: pd.Series) -> float:
        c = cents.to_numpy("int64").sum()  # exact
        q = qty.to_numpy("float64").sum()  # integer-valued: exact
        return float(c) / (100.0 * float(q))

    li = load_table(spark, "lineitem", sf_dir)
    base = li.select(
        "l_returnflag",
        "l_linestatus",
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("bigint")
        .alias("cents"),
        "l_quantity",
    )
    # NOTE: a grouped-agg pandas UDF cannot be mixed with built-in
    # aggregates in one agg() call (Spark limitation) — this agg is
    # UDAF-only
    per_group = base.groupBy("l_returnflag", "l_linestatus").agg(
        wmean(F.col("cents"), F.col("l_quantity")).alias("wm_raw")
    )
    flag_w = W.partitionBy("l_returnflag")
    per_flag = (
        base.withColumn("flag_wm_raw", wmean(F.col("cents"), F.col("l_quantity")).over(flag_w))
        .groupBy("l_returnflag")
        .agg(F.min("flag_wm_raw").alias("flag_wm_raw"))  # constant per flag
    )
    r6 = lambda c: F.floor(c * 1_000_000.0 + 0.5) / 1_000_000.0  # noqa: E731
    return (
        per_group.join(F.broadcast(per_flag), "l_returnflag")
        .select(
            "l_returnflag",
            "l_linestatus",
            r6(F.col("wm_raw")).alias("wm_unit_price"),
            r6(F.col("wm_raw") / F.col("flag_wm_raw")).alias("ratio_to_flag"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


WEIGHTED_MEAN_ORACLE = """
WITH base AS (
  SELECT
    l_returnflag,
    l_linestatus,
    CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
    l_quantity
  FROM lineitem
),
g AS (
  SELECT
    l_returnflag,
    l_linestatus,
    CAST(SUM(cents) AS DOUBLE) / (100.0 * CAST(SUM(l_quantity) AS DOUBLE))
      AS wm_raw
  FROM base
  GROUP BY l_returnflag, l_linestatus
),
f AS (
  SELECT
    l_returnflag,
    CAST(SUM(cents) AS DOUBLE) / (100.0 * CAST(SUM(l_quantity) AS DOUBLE))
      AS flag_wm_raw
  FROM base
  GROUP BY l_returnflag
)
SELECT
  g.l_returnflag,
  g.l_linestatus,
  FLOOR(g.wm_raw * 1000000 + 0.5) / 1000000 AS wm_unit_price,
  FLOOR(g.wm_raw / f.flag_wm_raw * 1000000 + 0.5) / 1000000 AS ratio_to_flag
FROM g JOIN f USING (l_returnflag)
ORDER BY g.l_returnflag, g.l_linestatus
"""


def udtf_runlength_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF over a TABLE argument with
    ``PARTITION BY user_id ORDER BY ts, event_id`` (the Spark 4
    table-function API): run-length encode each user's event-type
    stream — one output row per maximal run of equal consecutive
    types. The stateful per-partition shape (``eval`` accumulates,
    ``terminate`` flushes) that a plain lateral UDTF cannot express,
    because it needs ordered visibility across the partition's rows.

    Scale: the TABLE(... PARTITION BY) contract shuffles once on
    user_id and streams each partition through the UDTF instance in
    order — the same exchange the native gaps-and-islands window
    (the oracle's formulation) pays; state is one (type, count) pair.
    """
    from pyspark.sql.functions import udtf

    from backend_model_spark.sources.tables import register_views

    @udtf(returnType="user_id bigint, run_idx int, event_type string, run_len int")
    class RunLength:
        def __init__(self) -> None:
            self._uid = None
            self._type = None
            self._len = 0
            self._idx = 0

        def eval(self, row):
            if self._type is not None and row.event_type != self._type:
                yield self._uid, self._idx, self._type, self._len
                self._idx += 1
                self._len = 0
            self._uid = row.user_id
            self._type = row.event_type
            self._len += 1

        def terminate(self):
            if self._type is not None:
                yield self._uid, self._idx, self._type, self._len

    register_views(spark, sf_dir)
    spark.udtf.register("run_length", RunLength)
    return spark.sql(
        """
        SELECT user_id, run_idx, event_type, run_len
        FROM run_length(
          TABLE(events) PARTITION BY user_id ORDER BY (ts, event_id)
        )
        ORDER BY user_id, run_idx
        """
    )


RUNLENGTH_ORACLE = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
    CASE WHEN LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS brk
  FROM events
),
runs AS (
  SELECT user_id, event_type,
    CAST(SUM(brk) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) - 1 AS INTEGER) AS run_idx
  FROM ordered
)
SELECT user_id, run_idx, event_type,
       CAST(COUNT(*) AS INTEGER) AS run_len
FROM runs
GROUP BY user_id, run_idx, event_type
ORDER BY user_id, run_idx
"""
