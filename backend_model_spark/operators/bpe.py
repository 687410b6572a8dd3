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
    # global top-k as orderBy+limit: Spark plans this as a distributed
    # TakeOrderedAndProject (per-partition heap + driver merge of k
    # rows), never a single-partition WindowExec over the vocab. The
    # (wc desc, word asc) order is total, so the k-prefix is unique.
    return (
        words.orderBy(F.col("wc").desc(), F.col("word").asc())
        .limit(VOCAB_TOP)
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
        best = _best_pair(seq).localCheckpoint()  # 1 row; read twice
        merge_rows.append(
            best.select(
                F.lit(rnd).alias("round"),
                F.col("l").alias("lhs"),
                F.col("r").alias("rhs"),
                F.concat("l", "r").alias("merged"),
                F.col("pc").cast("long").alias("pair_count"),
            )
        )
        seq = _apply_merge(seq, best).localCheckpoint()

    out = merge_rows[0]
    for mr in merge_rows[1:]:
        out = out.unionAll(mr)
    return out.orderBy("round")


def _best_pair(seq: DataFrame) -> DataFrame:
    """Highest-frequency adjacent token pair of a (word, wc, pos, tok)
    frame, tie-broken (count desc, l asc, r asc) — one row (l, r, pc)."""
    wp = W.partitionBy("word").orderBy("pos")
    return (
        seq.withColumn("nxt", F.lead("tok").over(wp))
        .filter(F.col("nxt").isNotNull())
        .groupBy(F.col("tok").alias("l"), F.col("nxt").alias("r"))
        .agg(F.sum("wc").alias("pc"))
        .orderBy(F.col("pc").desc(), F.col("l").asc(), F.col("r").asc())
        .limit(1)
    )


def _apply_merge(seq: DataFrame, best: DataFrame) -> DataFrame:
    """Greedy left-to-right application of the broadcast (l, r) merge:
    match positions → consecutive runs (pos − row_number key) → only
    odd-in-run positions merge; the following position is consumed."""
    wm = W.partitionBy("word").orderBy("pos")
    paired = seq.withColumn("nxt", F.lead("tok").over(wm))
    m = paired.crossJoin(F.broadcast(best.select("l", "r"))).withColumn(
        "is_m", (F.col("tok") == F.col("l")) & (F.col("nxt") == F.col("r"))
    )
    runs = m.withColumn(
        "mrn",
        F.when(
            F.col("is_m"),
            F.row_number().over(W.partitionBy("word", "is_m").orderBy("pos")),
        ),
    ).withColumn("run_key", F.when(F.col("is_m"), F.col("pos") - F.col("mrn")))
    keep = runs.withColumn(
        "rin",
        F.when(
            F.col("is_m"),
            F.row_number().over(W.partitionBy("word", "run_key").orderBy("pos")),
        ),
    ).withColumn("do_merge", F.col("is_m") & (F.col("rin") % 2 == 1))
    return (
        keep.withColumn("consumed", F.lag("do_merge", 1, False).over(wm))
        .filter(~F.col("consumed"))
        .select(
            "word",
            "wc",
            F.row_number().over(wm).alias("pos"),
            F.when(F.col("do_merge"), F.concat("tok", "nxt"))
            .otherwise(F.col("tok"))
            .alias("tok"),
        )
    )


def bpe_segment_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merges to the WHOLE corpus — the inference
    half of tokenizer training: per source, total BPE tokens, total
    characters, and the compression the merges bought
    (chars-per-token, micro-rounded).

    Shape: merges are re-derived on the top-``VOCAB_TOP`` vocab (same
    lineage as :func:`bpe_learn_merges` — tiny); application runs on
    the DISTINCT-WORD table, never the corpus: every round rewrites
    one row per (word, position), and the corpus-sized work is only
    the two word rollups (global + per-source) at the edges. At
    100 TB: 2 corpus-rollup shuffles + N vocab-sized rounds + one
    broadcast join of per-word token counts onto the per-source
    rollup.
    """
    docs = load_table(spark, "documents", sf_dir)
    words = (
        docs.select(
            F.col("source"),
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("word"),
        )
        .filter((F.col("word") != "") & (F.length("word") <= MAX_WORD_LEN))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    ).localCheckpoint()  # read twice: learner vocab + final join

    # learner state: top-VOCAB_TOP global vocab (identical selection
    # to bpe_learn_merges, derived from the same per-source rollup)
    gw = words.groupBy("word").agg(F.sum("c").alias("wc"))
    # same TakeOrderedAndProject top-k as _word_vocab (total order ⇒
    # unique prefix; no single-partition window)
    vocab = (
        gw.orderBy(F.col("wc").desc(), F.col("word").asc())
        .limit(VOCAB_TOP)
        .select("word", "wc")
    )
    chars = lambda df: (
        df.select(
            "word",
            "wc",
            F.posexplode(F.split(F.col("word"), "(?!^)")).alias("pos", "tok"),
        ).filter(F.col("tok") != "")
    )
    learn_seq = chars(vocab).localCheckpoint()
    # apply-side state: EVERY distinct word (weight unused in rewrite)
    apply_seq = chars(
        gw.select("word", F.lit(1).alias("wc"))
    ).localCheckpoint()

    for _ in range(N_MERGES):
        best = _best_pair(learn_seq).localCheckpoint()
        learn_seq = _apply_merge(learn_seq, best).localCheckpoint()
        apply_seq = _apply_merge(apply_seq, best).localCheckpoint()

    per_word = apply_seq.groupBy("word").agg(F.count(F.lit(1)).alias("n_tok"))
    return (
        words.join(F.broadcast(per_word), "word")
        .groupBy("source")
        .agg(
            F.sum(F.col("c") * F.col("n_tok")).cast("long").alias("total_tokens"),
            F.sum(F.col("c") * F.length("word")).cast("long").alias("total_chars"),
        )
        .withColumn(
            # divide first (double), THEN micro-scale: total_chars*1e6
            # would overflow bigint at 100 TB character volumes
            "chars_per_token",
            F.floor(
                F.col("total_chars") / F.col("total_tokens") * 1000000
                + F.lit(0.5)
            )
            / 1000000,
        )
        .orderBy("source")
    )


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


def _apply_ctes(r: int, prev: str, best: str) -> tuple[str, str]:
    """Unrolled APPLY-only round: rewrite token table ``prev`` with
    the already-selected merge ``best`` — the SQL twin of
    :func:`_apply_merge`. Returns (cte_sql, next_seq_name)."""
    p = f"a{r}_"
    ctes = f"""
{p}m AS (
  SELECT s.word, s.wc, s.pos, s.tok,
    lead(s.tok) OVER (PARTITION BY s.word ORDER BY s.pos) AS nxt,
    b.l, b.r
  FROM {prev} s CROSS JOIN {best} b
),
{p}m2 AS (
  SELECT *, (tok = l AND nxt = r) AS is_m FROM {p}m
),
{p}runs AS (
  SELECT *,
    CASE WHEN is_m THEN pos - row_number() OVER (
      PARTITION BY word, is_m ORDER BY pos) END AS run_key
  FROM {p}m2
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
    return ctes, f"{p}seq"


def _bpe_segment_oracle() -> str:
    head = f"""
WITH words_src AS (
  SELECT source, word, COUNT(*) AS c
  FROM (
    SELECT source,
      unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
    FROM documents
  )
  WHERE word <> '' AND length(word) <= {MAX_WORD_LEN}
  GROUP BY source, word
),
gw AS (SELECT word, CAST(SUM(c) AS BIGINT) AS wc FROM words_src GROUP BY word),
vocab AS (
  SELECT word, wc FROM gw ORDER BY wc DESC, word ASC LIMIT {VOCAB_TOP}
),
series AS (SELECT unnest(generate_series(1, {MAX_WORD_LEN})) AS pos),
r0_seq AS (
  SELECT word, wc, i.pos, substr(word, i.pos, 1) AS tok
  FROM vocab, series i WHERE i.pos <= length(word)
),
a0_seq AS (
  SELECT word, 1 AS wc, i.pos, substr(word, i.pos, 1) AS tok
  FROM gw, series i WHERE i.pos <= length(word)
)"""
    ctes, lprev, aprev = [head], "r0_seq", "a0_seq"
    for r in range(1, N_MERGES + 1):
        c, best, lnext = _round_ctes(r, lprev)
        ctes.append(c)
        ac, anext = _apply_ctes(r, aprev, best)
        ctes.append(ac)
        lprev, aprev = lnext, anext
    return (
        ",".join(ctes)
        + f""",
per_word AS (
  SELECT word, COUNT(*) AS n_tok FROM {aprev} GROUP BY word
)
SELECT s.source,
  CAST(SUM(s.c * p.n_tok) AS BIGINT) AS total_tokens,
  CAST(SUM(s.c * length(s.word)) AS BIGINT) AS total_chars,
  FLOOR(CAST(SUM(s.c * length(s.word)) AS DOUBLE)
        / CAST(SUM(s.c * p.n_tok) AS DOUBLE) * 1000000 + 0.5) / 1000000
    AS chars_per_token
FROM words_src s JOIN per_word p USING (word)
GROUP BY s.source
ORDER BY s.source
"""
    )


BPE_SEGMENT_ORACLE = _bpe_segment_oracle()
