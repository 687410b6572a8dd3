"""BPE tokenizer training as distributed aggregation — the merge-
learning step of byte-pair encoding (Sennrich et al. 2016), the
algorithm behind GPT/Llama tokenizers and the natural companion to
``text_bpe_token_count`` (which only counts with a FIXED pattern).

Why this is a Spark-shaped problem: classic BPE looks sequential, but
each round is two aggregations over the WORD-FREQUENCY VOCAB, not the
corpus — (1) sum pair frequencies weighted by word count, (2) argmax
with a deterministic tie-break — plus a positional rewrite applying
the winning merge. The corpus is touched exactly ONCE (the word-count
rollup: one shuffle on the word key, map-side combinable); every
round after that runs on the bounded vocab table (≤ ``VOCAB_TOP``
rows), so learning N merges over 100 TB costs one corpus scan + N
tiny distributed rounds. The winning pair flows into the next round
as a broadcast one-row frame — no driver round-trips, no collect.

Greedy left-to-right merge application (the part naive SQL gets wrong
for runs like "aaa") is expressed positionally: match positions group
into consecutive runs (pos − row_number key) and only ODD positions
within a run merge — exactly the non-overlapping greedy semantics,
and identically expressible with window functions on both engines.
The DuckDB oracle unrolls the same rounds as generated CTE chains
from the same constants (the MLP-oracle precedent).

Determinism: pure integer counts; argmax breaks ties by (count desc,
left asc, right asc); all window orders are total. No floats anywhere.

Reference anchor: the reference tokenizes text only through sklearn
vectorizers (SURVEY.md §2.6 F8); this is the training-data-pipeline
extension of that capability (SURVEY §2.11 charter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from backend_model_spark.sources.tables import load_table

N_MERGES = 5
VOCAB_TOP = 2000  # bounded vocab table: top words by (count, word)
MAX_WORD_LEN = 20


def _word_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One corpus pass: lowercase alpha word counts, top ``VOCAB_TOP``
    by (count desc, word asc) — the only corpus-sized stage."""
    docs = load_table(spark, "documents", sf_dir)
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("word")
        )
        .filter((F.col("word") != "") & (F.length("word") <= MAX_WORD_LEN))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    wv = W.orderBy(F.col("wc").desc(), F.col("word").asc())
    # global top-k: TakeOrderedAndProject shape via orderBy+limit
    return (
        words.withColumn("vrk", F.row_number().over(wv))
        .filter(F.col("vrk") <= VOCAB_TOP)
        .select("word", "wc")
    )


def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first ``N_MERGES`` BPE merges; returns one row per
    round: (round, left, right, merged, pair_count)."""
    vocab = _word_vocab(spark, sf_dir)
    # seq: (word, wc, pos, tok) — initial tokens are single characters
    seq = (
        vocab.select(
            "word",
            "wc",
            F.posexplode(F.split(F.col("word"), "(?!^)")).alias("pos", "tok"),
        )
        # Spark's split keeps the trailing empty match (limit=-1
        # semantics); dropping it leaves positions dense 0..len-1
        .filter(F.col("tok") != "")
        .localCheckpoint()
    )

    merge_rows = []
    for rnd in range(1, N_MERGES + 1):
        wp = W.partitionBy("word").orderBy("pos")
        paired = seq.withColumn("nxt", F.lead("tok").over(wp))
        best = (
            paired.filter(F.col("nxt").isNotNull())
            .groupBy(F.col("tok").alias("l"), F.col("nxt").alias("r"))
            .agg(F.sum("wc").alias("pc"))
            .orderBy(F.col("pc").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
        )
        best = best.localCheckpoint()  # 1 row; read twice (output + rewrite)
        merge_rows.append(
            best.select(
                F.lit(rnd).alias("round"),
                F.col("l").alias("lhs"),
                F.col("r").alias("rhs"),
                F.concat("l", "r").alias("merged"),
                F.col("pc").cast("long").alias("pair_count"),
            )
        )
        # apply the winning merge greedily left-to-right:
        # match positions → consecutive runs → keep odd-in-run
        m = paired.crossJoin(F.broadcast(best)).withColumn(
            "is_m", (F.col("tok") == F.col("l")) & (F.col("nxt") == F.col("r"))
        )
        wm = W.partitionBy("word").orderBy("pos")
        runs = m.withColumn(
            "mrn",
            F.when(
                F.col("is_m"),
                F.row_number().over(
                    W.partitionBy("word", "is_m").orderBy("pos")
                ),
            ),
        ).withColumn(
            "run_key", F.when(F.col("is_m"), F.col("pos") - F.col("mrn"))
        )
        keep = runs.withColumn(
            "rin",
            F.when(
                F.col("is_m"),
                F.row_number().over(
                    W.partitionBy("word", "run_key").orderBy("pos")
                ),
            ),
        ).withColumn("do_merge", F.col("is_m") & (F.col("rin") % 2 == 1))
        consumed = F.lag("do_merge", 1, False).over(wm)
        seq = (
            keep.withColumn("consumed", consumed)
            .filter(~F.col("consumed"))
            .select(
                "word",
                "wc",
                F.row_number().over(wm).alias("pos"),
                F.when(F.col("do_merge"), F.concat("tok", "nxt"))
                .otherwise(F.col("tok"))
                .alias("tok"),
            )
            .localCheckpoint()  # truncate the per-round window lineage
        )

    out = merge_rows[0]
    for mr in merge_rows[1:]:
        out = out.unionAll(mr)
    return out.orderBy("round")


def _round_ctes(r: int, prev: str) -> tuple[str, str, str]:
    """One unrolled BPE round in SQL: returns (cte_sql, best_name,
    next_seq_name) reading token table ``prev``(word, wc, pos, tok)."""
    p = f"r{r}_"
    ctes = f"""
{p}paired AS (
  SELECT word, wc, pos, tok,
    lead(tok) OVER (PARTITION BY word ORDER BY pos) AS nxt
  FROM {prev}
),
{p}best AS (
  SELECT tok AS l, nxt AS r, CAST(SUM(wc) AS BIGINT) AS pc
  FROM {p}paired WHERE nxt IS NOT NULL
  GROUP BY tok, nxt
  ORDER BY pc DESC, l ASC, r ASC
  LIMIT 1
),
{p}m AS (
  SELECT p.word, p.wc, p.pos, p.tok, p.nxt, b.l, b.r,
    (p.tok = b.l AND p.nxt = b.r) AS is_m
  FROM {p}paired p CROSS JOIN {p}best b
),
{p}runs AS (
  SELECT *,
    CASE WHEN is_m THEN pos - row_number() OVER (
      PARTITION BY word, is_m ORDER BY pos) END AS run_key
  FROM {p}m
),
{p}keep AS (
  SELECT *,
    is_m AND (row_number() OVER (
      PARTITION BY word, run_key ORDER BY pos) % 2 = 1) AS do_merge
  FROM {p}runs
),
{p}seq AS (
  SELECT word, wc,
    row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
    CASE WHEN do_merge THEN tok || nxt ELSE tok END AS tok
  FROM (
    SELECT *,
      COALESCE(lag(do_merge) OVER (PARTITION BY word ORDER BY pos),
               FALSE) AS consumed
    FROM {p}keep
  )
  WHERE NOT consumed
)"""
    return ctes, f"{p}best", f"{p}seq"


def _bpe_oracle() -> str:
    head = f"""
WITH words AS (
  SELECT word, COUNT(*) AS wc
  FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
    FROM documents
  )
  WHERE word <> '' AND length(word) <= {MAX_WORD_LEN}
  GROUP BY word
),
vocab AS (
  SELECT word, wc FROM words
  ORDER BY wc DESC, word ASC
  LIMIT {VOCAB_TOP}
),
r0_seq AS (
  SELECT word, wc, i.pos, substr(word, i.pos, 1) AS tok
  FROM vocab,
       (SELECT unnest(generate_series(1, {MAX_WORD_LEN})) AS pos) i
  WHERE i.pos <= length(word)
)"""
    ctes, selects, prev = [head], [], "r0_seq"
    for r in range(1, N_MERGES + 1):
        c, best, nxt = _round_ctes(r, prev)
        ctes.append(c)
        selects.append(
            f"SELECT {r} AS round, l AS lhs, r AS rhs, l || r AS merged,"
            f" pc AS pair_count FROM {best}"
        )
        prev = nxt
    return ",".join(ctes) + "\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY round"


BPE_MERGES_ORACLE = _bpe_oracle()
