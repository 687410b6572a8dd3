"""Deduplication operators over ``documents`` — exact, n-gram Jaccard,
MinHash(+LSH), and SimHash (BASELINE.json north-star surface;
SURVEY.md §7 M4 `ops/dedup` plan — the reference itself has no dedup
beyond pandas ``drop`` patterns, SURVEY.md §2.2 P6).

Scale design:
* exact dedup = hash-groupBy on a digest key — one shuffle on a
  uniformly distributed key; never a pairwise compare.
* n-gram Jaccard = shingle → inverted-index self-join. Exact but
  O(pairs sharing a shingle); at 100 TB you run the MinHash band-join
  below FIRST to produce candidates, then this as the verify stage.
* MinHash: per-doc signatures from k independent hash slices of the
  shingle md5 — deterministic (md5-derived, no RNG), so both engines
  compute identical signatures; the LSH band variant buckets
  signature bands to turn all-pairs into an equi-join.
* SimHash: 32-bit weighted bit-vote over token hashes — again
  md5-derived for cross-engine determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from backend_model_spark.sources.tables import load_table, spread

TOKENS = "split(trim(text), '\\\\s+')"
# word 3-gram shingles over a pre-computed token column (1-based
# slice, same as DuckDB). Two deliberate choices:
# * operates on a `toks` COLUMN, not the split expression inline —
#   expressions inside a transform() lambda are re-evaluated per
#   element, so an inline split() would re-tokenize the document once
#   per shingle;
# * guards the short-doc case explicitly: Spark's sequence(1, 0)
#   yields a DESCENDING [1, 0], not an empty array.
SHINGLES = (
    "CASE WHEN size(toks) < 3 THEN cast(array() as array<string>) "
    "ELSE transform(sequence(1, size(toks) - 2),"
    " i -> concat_ws(' ', slice(toks, i, 3))) END"
)
SHINGLES_SQL = r"""
list_transform(
  generate_series(1, greatest(len(string_split_regex(trim(text), '\s+')) - 2, 0)),
  i -> string_split_regex(trim(text), '\s+')[i] || ' '
    || string_split_regex(trim(text), '\s+')[i+1] || ' '
    || string_split_regex(trim(text), '\s+')[i+2]
)
"""

N_MINHASH = 8  # hash functions: affine remixes of one md5 digest

# One md5 digest per shingle, sliced into four 32-bit words; each of
# the 8 MinHash functions is an affine remix (A_i·w + B_i) mod P of
# one word — the standard linear-permutation family (cf. universal
# hashing in b-bit minwise hashing). Halves digest work vs salted
# double-md5 while staying cross-engine exact: every operation is
# bigint arithmetic both engines evaluate identically, and products
# stay < 2^51 (A < 2^20, w mod P < 2^31) so ANSI mode never overflows.
MINHASH_P = 2_147_483_647  # 2^31 - 1
MINHASH_A = [1_000_003, 1_000_033, 1_000_037, 1_000_039,
             1_000_081, 1_000_099, 1_000_117, 1_000_121]
MINHASH_B = [0, 17, 31, 47, 59, 73, 89, 101]


def _mh_word_spark(i: int) -> str:
    """32-bit word i%4 of the shingle's md5, as a bigint SQL expr."""
    return (
        f"cast(conv(substring(md5(cast(shingle as binary)), "
        f"{1 + 8 * (i % 4)}, 8), 16, 10) as bigint)"
    )


def _mh_expr_spark(i: int) -> str:
    return (
        f"({MINHASH_A[i]} * ({_mh_word_spark(i)} % {MINHASH_P})"
        f" + {MINHASH_B[i]}) % {MINHASH_P}"
    )


def _mh_expr_from_digest(i: int) -> str:
    """Affine remix i over a PRE-COMPUTED md5 hex digest column
    ``mhd`` (round 11, guide §1.2): codegen's subexpression
    elimination DID share the common ``md5(shingle)`` across the 8
    MIN aggregate inputs (A/B-measured neutral at sf0.1), but that
    sharing is an optimizer courtesy that silently disappears if the
    aggregation is ever split, reordered, or run interpreted.
    Projecting the digest once before the groupBy makes the single
    evaluation STRUCTURAL, and is value-identical: the remix reads
    the same hex words of the same digest."""
    word = (
        f"cast(conv(substring(mhd, {1 + 8 * (i % 4)}, 8), 16, 10) as bigint)"
    )
    return (
        f"({MINHASH_A[i]} * ({word} % {MINHASH_P})"
        f" + {MINHASH_B[i]}) % {MINHASH_P}"
    )


def _mh_digest(df):
    """Project (doc_id, mhd=md5 hex of the shingle) — the shared
    single-evaluation digest input for :func:`_mh_expr_from_digest`."""
    return df.select(
        "doc_id", F.md5(F.col("shingle").cast("binary")).alias("mhd")
    )


def _mh_word_sql(i: int) -> str:
    return f"CAST('0x' || substr(md5(shingle), {1 + 8 * (i % 4)}, 8) AS BIGINT)"


# the SELECT-list block shared by every oracle that embeds signatures
MINHASH_SQL_AGGS = ", ".join(
    f"MIN(({MINHASH_A[i]} * ({_mh_word_sql(i)} % {MINHASH_P})"
    f" + {MINHASH_B[i]}) % {MINHASH_P}) AS mh_{i}"
    for i in range(N_MINHASH)
)

# ----------------------------------------------------------------------
# Round-8 EXACT-DEDUP-FIRST STAR CONTRACT for the pairwise near-dup
# family. The round-8 Zipf stress corpus (a few hot exact-duplicate
# groups over a mostly-unique corpus — the real web-crawl shape)
# measured the full-pair-list contract quadratic in duplicate-group
# size: a 4001-copy group puts 4001 docs in the same bucket of every
# band, so the band self-join emits C(4001,2) ≈ 8M pairs and the
# verify stage paid 267 s at 10× (vs 2 s at 1×). Identical texts are
# collapsed to one representative (md5 digest groups over ≥3-token
# docs) BEFORE shingling/banding; emitted pairs are the rep-level
# band-join candidates plus one rep→member star edge per duplicate —
# linear in the input, full pair list recoverable by expanding
# through the stars, connected components provably unchanged (every
# member reaches its rep, reps carry all cross-content edges). Same
# contract and rationale as the round-7/8 MLlib faces
# (mllib_ops._minhash_pairs) and the keep-list production shape.
# ----------------------------------------------------------------------
DEDUP_FIRST_CTES = r"""docs3 AS (
  SELECT doc_id, text, md5(text) AS h
  FROM documents
  WHERE len(string_split_regex(trim(text), '\s+')) >= 3
),
grp AS (SELECT h, MIN(doc_id) AS rep FROM docs3 GROUP BY h),
star AS (
  SELECT g.rep AS doc_a, d.doc_id AS doc_b
  FROM docs3 d JOIN grp g USING (h)
  WHERE d.doc_id <> g.rep
),
repdocs AS (
  SELECT d.doc_id, d.text
  FROM docs3 d JOIN grp g ON d.h = g.h AND d.doc_id = g.rep
)"""

_BANDED_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {band} AS band,"
    f" CAST(mh_{2 * band} AS VARCHAR) || '_' || CAST(mh_{2 * band + 1} AS VARCHAR)"
    f" AS bucket FROM sigs"
    for band in range(N_MINHASH // 2)
)

# rep-level shingles → signatures → banded buckets → candidate pairs
# (rep band-join ∪ star edges) — the shared CTE chain of every oracle
# in the LSH family
LSH_CAND_CTES = (
    DEDUP_FIRST_CTES
    + f""",
rep_shingled AS (
  SELECT DISTINCT doc_id, unnest({SHINGLES_SQL}) AS shingle FROM repdocs
),
sigs AS (
  SELECT doc_id, {MINHASH_SQL_AGGS} FROM rep_shingled GROUP BY doc_id
),
banded AS (
  {_BANDED_SQL}
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  UNION
  SELECT doc_a, doc_b FROM star
)"""
)


# session-scoped materialization of the digest-group frame — the
# shared first stage of the round-8 star contract, consumed by
# candidates, ngram, containment, verified (2-3 branches EACH: reps +
# star). Same design as _PAIR_CACHE below; MEMORY_AND_DISK because
# the frame carries text.
_REPS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _evict_oldest(cache: dict, cap: int = 8) -> None:
    """Bound the session caches: the test suite runs hundreds of
    fixture sf_dirs through these entries, and every key pins a
    persisted frame (the members frame carries TEXT). Eviction is
    true LRU — every hit calls :func:`_touch` to move its key to the
    dict's end, so the front is always the least-recently-used."""
    while len(cache) > cap:
        old = cache.pop(next(iter(cache)))
        try:
            old.unpersist()
        except Exception:  # noqa: BLE001 — session may be gone
            pass


def _touch(cache: dict, key) -> None:
    """Move ``key`` to the end of ``cache`` (mark most-recently-used).
    Plain reassignment keeps a dict key's ORIGINAL position, so
    without this a hot sf_dir inserted first would be evicted first."""
    if key in cache:
        cache[key] = cache.pop(key)


def _still_cached(df: DataFrame) -> bool:
    """True while a persisted frame is still registered with the cache
    manager — `spark.catalog.clearCache()` unpersists data behind the
    session caches' backs, and a stale dict hit would make EVERY
    downstream job recompute the full LSH lineage (measured: the
    multi-job graph entries pay 2-5 recomputes, triangles 10 s at
    sf0.1 instead of ~3)."""
    sl = df.storageLevel
    return bool(sl.useMemory or sl.useDisk)


def _content_reps(spark: SparkSession, sf_dir: str, eager: bool = True):
    """(reps, star) — exact-dedup-first over shingle-eligible docs.

    ``reps`` is one (doc_id, text) representative (min doc_id) per
    distinct text among docs with ≥3 tokens (exactly the docs whose
    shingle set is non-empty — shorter docs never enter the LSH
    family on either engine); ``star`` is one (doc_a=rep,
    doc_b=member) edge per duplicate, ``doc_a < doc_b`` by
    construction. One shuffle on the text digest; everything
    downstream (shingling, signatures, banding, the band self-join)
    sees each distinct text once, so duplicate-group cost is linear,
    never C(g,2). SQL twin: :data:`DEDUP_FIRST_CTES`.

    ``eager=False`` (round 12, guide §1.2): a caller whose NEXT
    materialization's lineage itself scans every partition of
    ``members`` (the banded build in :func:`lsh_candidate_pairs`)
    may skip the dedicated count() action here — that action's only
    job is to pre-build the cache blocks, and the caller's own first
    action builds them identically through the InMemoryRelation. The
    persist is registered either way; only WHO pays the build moves.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    members = _REPS_CACHE.get(key)
    _touch(_REPS_CACHE, key)
    if members is not None and not _still_cached(members):
        # an external clearCache() (bench quiesce, memory pressure)
        # unpersisted the data while the dict kept the frame — every
        # consumer job would silently recompute the whole lineage.
        # Re-register so the next action materializes once again.
        members = members.persist(StorageLevel.MEMORY_AND_DISK)
        if eager:
            members.count()  # eager: see the build-path note below
        _REPS_CACHE[key] = members
    if members is None:
        docs = load_table(spark, "documents", sf_dir)
        # compute-width exchange pin (round 11, guide §2.2): the
        # digest-window stage FUSES with the downstream shingle
        # explode + md5 signature map side in the revalidation
        # lineage; its shuffle is ~1 MB of compressed text but the
        # stage is compute-bound, and AQE's byte-based coalescing
        # squashed it onto 3 tasks (measured 0.68 s of a 2.5 s run).
        # Pinning at the conf'd shuffle width keeps it at full
        # parallelism; the window reuses the pinned exchange (same
        # key), so no extra shuffle is added.
        sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
        members = (
            docs.filter(F.size(F.split(F.trim(F.col("text")), r"\s+")) >= 3)
            .select("doc_id", "text", F.md5("text").alias("h"))
            .repartition(sp, "h")
            .withColumn("rep_id", F.min("doc_id").over(Window.partitionBy("h")))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # eager materialization (round 11): the reps/star consumers —
        # and a join's two map sides — run as CONCURRENT jobs; a lazy
        # persist lets each re-run the digest window from parquet.
        # One count() builds the blocks once, everyone else reads them.
        if eager:
            members.count()
        _REPS_CACHE[key] = members
        _evict_oldest(_REPS_CACHE)
    reps = members.filter(F.col("doc_id") == F.col("rep_id")).select(
        "doc_id", "text"
    )
    star = members.filter(F.col("doc_id") != F.col("rep_id")).select(
        F.col("rep_id").alias("doc_a"), F.col("doc_id").alias("doc_b")
    )
    return reps, star


# distinct (rep doc_id, shingle) inverted index — the star contract's
# SECOND shared stage, consumed by candidates (signatures), ngram,
# containment, and verified. Before round 8's review pass each of the
# three Jaccard-family entries rebuilt and separately persisted an
# identical copy.
_REP_SHINGLED_CACHE: dict[tuple[str, str], DataFrame] = {}

# (vec_id, label, v, rep_id) digest-group frame for the embedding
# pairwise family — same bounded-LRU posture as the text-side caches
_EMB_MEMBERS_CACHE: dict[tuple[str, str], DataFrame] = {}


def _shingle_index(reps: DataFrame) -> DataFrame:
    """The star contract's distinct (doc_id, shingle) inverted index
    over representatives — ONE construction shared by the memoized
    :func:`_rep_shingled` and the memo-miss inline path of
    :func:`lsh_candidate_pairs` (round-12 advice: two hand-copied
    versions risked drifting). DISTINCT is per-doc set semantics and
    doc_id is unique per rep, so per-row ``array_distinct`` before
    the explode is set-identical to a global DISTINCT with zero
    shuffle (guide §2.1; round 11)."""
    return reps.withColumn("toks", F.expr(TOKENS)).select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(SHINGLES))).alias("shingle"),
    )


def _rep_shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (doc_id, shingle) over the representatives — cached
    per (application, sf_dir) with the same LRU + clearCache
    revalidation as the other session materializations. Safe for the
    signature path too: MIN over the distinct shingle set equals MIN
    over the raw explode."""
    key = (spark.sparkContext.applicationId, sf_dir)
    sh = _REP_SHINGLED_CACHE.get(key)
    _touch(_REP_SHINGLED_CACHE, key)
    if sh is not None and not _still_cached(sh):
        sh = sh.persist()
        sh.count()  # eager: concurrent consumers (see _content_reps)
        _REP_SHINGLED_CACHE[key] = sh
    if sh is None:
        reps, _ = _content_reps(spark, sf_dir)
        sh = _shingle_index(reps).persist()
        sh.count()  # eager: concurrent consumers (see _content_reps)
        _REP_SHINGLED_CACHE[key] = sh
        _evict_oldest(_REP_SHINGLED_CACHE)
    return sh


def tokenized_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + a ``toks`` column, spread for fan-out.

    The local documents table arrives as one small parquet file → one
    input partition; every shingle/token explode would otherwise run
    in a single task. :func:`spread` repartitions ONLY in that
    under-parallel case — at 100 TB the source is already many files
    and no shuffle happens.
    """
    docs = spread(load_table(spark, "documents", sf_dir))
    return docs.withColumn("toks", F.expr(TOKENS))


def shingled_docs(
    spark: SparkSession, sf_dir: str, distinct: bool = True
) -> DataFrame:
    """(doc_id, shingle) word-3-gram pairs.

    ``distinct=True`` only where the consumer is duplicate-sensitive
    (Jaccard counts). MinHash takes ``min`` per doc, which duplicates
    can't change — it passes ``distinct=False``. Since round 11 the
    distinct branch costs no shuffle either: doc_id is unique per
    document row, so per-row ``array_distinct`` before the explode is
    set-identical to a global DISTINCT on (doc_id, shingle)
    (guide §2.1: remove the shuffle outright).
    """
    docs = tokenized_docs(spark, sf_dir)
    arr = F.array_distinct(F.expr(SHINGLES)) if distinct else F.expr(SHINGLES)
    return docs.select("doc_id", F.explode(arr).alias("shingle"))


def exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized-content digest: canonical (min) doc id
    + duplicate count per distinct content."""
    docs = load_table(spark, "documents", sf_dir)
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return (
        docs.withColumn("fp", F.md5(normalized.cast("binary")))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_duplicates"),
        )
        .orderBy("canonical_doc_id")
    )


EXACT_DEDUP_ORACLE = r"""
SELECT
  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
  MIN(doc_id) AS canonical_doc_id,
  COUNT(*) AS n_duplicates
FROM documents
GROUP BY 1
ORDER BY canonical_doc_id
"""


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact word-3-gram Jaccard ≥ 0.05 via an
    inverted-index self-join (shingle equi-join, never a cross join).
    The verify stage of a dedup pipeline; see module docstring for
    the 100 TB candidate-generation strategy.

    EXACT-DEDUP-FIRST STAR CONTRACT (round 8 — see
    :data:`DEDUP_FIRST_CTES`): the inverted-index self-join runs on
    one representative per distinct text; identical docs are emitted
    as rep→member star edges with their exact values (n_common =
    the doc's own distinct-shingle count, jaccard = 1.0). The full
    pair list is quadratic in duplicate-group size (a 4001-copy
    boilerplate group alone is 8M rows); the star form is linear and
    expansion-recoverable."""
    _, star = _content_reps(spark, sf_dir)
    shingled = _rep_shingled(spark, sf_dir)
    # persisted: read three times below (sizes + both join sides)
    sizes = shingled.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = shingled.alias("a")
    b = shingled.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    rep_pairs = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= 0.05)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )
    star_rows = star.join(sa, "doc_a").select(
        "doc_a",
        "doc_b",
        F.col("n_a").alias("n_common"),
        F.lit(1.0).alias("jaccard"),
    )
    return rep_pairs.unionByName(star_rows).orderBy("doc_a", "doc_b")


NGRAM_JACCARD_ORACLE = f"""
WITH {DEDUP_FIRST_CTES},
shingled AS (
  SELECT DISTINCT doc_id, unnest({SHINGLES_SQL}) AS shingle
  FROM repdocs
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM shingled GROUP BY doc_id
),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM shingled a
  JOIN shingled b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT
  doc_a, doc_b, n_common,
  ROUND(n_common / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE), 6)
    AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(n_common / CAST(sa.n_shingles + sb.n_shingles - n_common AS DOUBLE), 6)
      >= 0.05
UNION ALL
SELECT s.doc_a, s.doc_b, z.n_shingles AS n_common, 1.0 AS jaccard
FROM star s JOIN sizes z ON z.doc_id = s.doc_a
ORDER BY doc_a, doc_b
"""


def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric CONTAINMENT similarity C(A→B) = |A∩B| / |A| over
    the shingle inverted index — the normalization Jaccard cannot
    see: a short document quoted verbatim inside a long one scores
    near-1 containment while its Jaccard stays tiny (|A∪B| is
    dominated by the long doc). The sub-document-duplication signal
    CCNet-style corpus cleaning keys quote/nesting decisions on.

    Same inverted-index equi-join skeleton as
    :func:`ngram_jaccard_pairs` (shingle join, never cross); both
    directions report from ONE intersection computation. Gate:
    max-direction containment ≥ 0.5 (a real subset relation), in
    integer micro units. Round 8: exact-dedup-first star contract
    (see :data:`DEDUP_FIRST_CTES`) — identical docs are one
    rep→member star row at containment 1.0/1.0, never C(g,2) rows.
    """
    _, star = _content_reps(spark, sf_dir)
    shingled = _rep_shingled(spark, sf_dir)
    sizes = shingled.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = shingled.alias("a")
    b = shingled.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    micro = lambda num, den: F.floor(num * 1000000 / den + F.lit(0.5)).cast("long")
    rep_pairs = (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("c_a_in_b_micro", micro(F.col("n_common"), F.col("n_a")))
        .withColumn("c_b_in_a_micro", micro(F.col("n_common"), F.col("n_b")))
        .filter(
            F.greatest("c_a_in_b_micro", "c_b_in_a_micro") >= 500000
        )
        .select(
            "doc_a", "doc_b", "n_common", "c_a_in_b_micro", "c_b_in_a_micro"
        )
    )
    star_rows = star.join(sa, "doc_a").select(
        "doc_a",
        "doc_b",
        F.col("n_a").alias("n_common"),
        F.lit(1000000).cast("long").alias("c_a_in_b_micro"),
        F.lit(1000000).cast("long").alias("c_b_in_a_micro"),
    )
    return rep_pairs.unionByName(star_rows).orderBy("doc_a", "doc_b")


CONTAINMENT_ORACLE = f"""
WITH {DEDUP_FIRST_CTES},
shingled AS (
  SELECT DISTINCT doc_id, unnest({SHINGLES_SQL}) AS shingle
  FROM repdocs
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM shingled GROUP BY doc_id
),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM shingled a
  JOIN shingled b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT doc_a, doc_b, n_common,
    CAST(FLOOR(n_common * 1000000 / CAST(sa.n_shingles AS DOUBLE) + 0.5)
      AS BIGINT) AS c_a_in_b_micro,
    CAST(FLOOR(n_common * 1000000 / CAST(sb.n_shingles AS DOUBLE) + 0.5)
      AS BIGINT) AS c_b_in_a_micro
  FROM common
  JOIN sizes sa ON sa.doc_id = common.doc_a
  JOIN sizes sb ON sb.doc_id = common.doc_b
)
SELECT doc_a, doc_b, CAST(n_common AS BIGINT) AS n_common,
  c_a_in_b_micro, c_b_in_a_micro
FROM scored
WHERE GREATEST(c_a_in_b_micro, c_b_in_a_micro) >= 500000
UNION ALL
SELECT s.doc_a, s.doc_b, CAST(z.n_shingles AS BIGINT) AS n_common,
  CAST(1000000 AS BIGINT) AS c_a_in_b_micro,
  CAST(1000000 AS BIGINT) AS c_b_in_a_micro
FROM star s JOIN sizes z ON z.doc_id = s.doc_a
ORDER BY doc_a, doc_b
"""


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MinHash signatures (8 affine remixes of one md5
    digest — see ``MINHASH_A``) per document — the
    cross-engine-checkable core of MinHash dedup.

    Hashing cost: ONE digest per shingle row (subexpression
    elimination shares it across all 8 aggregate expressions), then
    pure bigint arithmetic inside whole-stage codegen.
    """
    shingled = shingled_docs(spark, sf_dir, distinct=False)
    aggs = [
        F.min(F.expr(_mh_expr_from_digest(i))).alias(f"mh_{i}")
        for i in range(N_MINHASH)
    ]
    return _mh_digest(shingled).groupBy("doc_id").agg(*aggs).orderBy("doc_id")


MINHASH_ORACLE = f"""
WITH shingled AS (
  SELECT DISTINCT doc_id, unnest({SHINGLES_SQL}) AS shingle
  FROM documents
)
SELECT
  doc_id,
  {MINHASH_SQL_AGGS}
FROM shingled
GROUP BY doc_id
ORDER BY doc_id
"""


# Candidate pairs are the shared first stage of the whole near-dup
# family (ordered presentation, connected components, PageRank, the
# verify stage). Each is registered as its own query, so without
# reuse every one re-runs the shingle→md5→band→self-join pipeline —
# the most expensive lineage in the module. A session-scoped
# materialized view (persisted DataFrame keyed by application + data
# dir) makes the stage compute-once, exactly like a production
# pipeline that materializes candidates before fanning out. The
# table is pair-sized (orders of magnitude smaller than the corpus);
# MEMORY_AND_DISK so an unexpectedly dense graph spills instead of
# evicting. Entries die with their Spark application.
_PAIR_CACHE: dict[tuple[str, str], DataFrame] = {}


def lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-join: band the 8-value signature into 4 bands of 2,
    bucket-join on (band, values) — candidate pairs via equi-join,
    unordered. Materialized once per (session, sf_dir) — see
    ``_PAIR_CACHE``.

    EXACT-DEDUP-FIRST STAR CONTRACT (round 8 — see the block comment
    at :data:`DEDUP_FIRST_CTES`): the band self-join runs on one
    representative per distinct text, and the emitted pairs are the
    rep-level candidates plus one rep→member star edge per duplicate
    (distance-0 by definition). On a corpus with no exact duplicates
    the output is identical to the classic full band-join; on a
    duplicated corpus it is linear in the input where the full pair
    list is quadratic in duplicate-group size (Zipf 10× stress:
    the downstream verify stage went 267 s → linear). Connected
    components over the graph are unchanged — the CC-family oracles
    deliberately still enumerate the FULL pair list in SQL, so every
    driver run re-proves the equivalence.

    This is the scale path for near-dup at 100 TB: candidate
    generation is one digest shuffle + a shuffle on band keys, never
    all-pairs and never quadratic in duplication.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _PAIR_CACHE.get(key)
    _touch(_PAIR_CACHE, key)
    if cached is not None:
        if not _still_cached(cached):
            # see _content_reps: survive an external clearCache()
            cached = cached.persist(StorageLevel.MEMORY_AND_DISK)
            cached.count()
            _PAIR_CACHE[key] = cached
        return cached
    # eager=False (round 12): the first downstream action here is
    # _rep_shingled's sh.count(), whose lineage scans every members
    # partition through the persisted InMemoryRelation (reps =
    # members.filter) — the cache blocks are built by THAT action and
    # the dedicated members.count() job was pure overhead on the cold
    # path (one whole action + its driver planning gap). Later
    # consumers (the star branch of pairs, other family entries)
    # read built blocks.
    reps, star = _content_reps(spark, sf_dir, eager=False)
    # shared distinct index (MIN over the distinct set == MIN over the
    # raw explode, so the signature path reuses it too).
    # Round 12 (verdict ask #1): the round-11 "skip the _rep_shingled
    # materialization when candidates is the only consumer" change
    # (009c997) was adjudicated with a quiet-host back-to-back A/B on
    # this tree: skip ON  minhash 1.30 s / clusters 1.48 s, skip OFF
    # 1.15 s / 1.37 s (min-of-4, canaries 280-370 ms) — the driver's
    # r11 regression direction reproduces, so the skip is REVERTED.
    # Two cheap actions (shingle-index build + banded build reading
    # cached shingles) beat one fused action that re-tokenizes the
    # corpus inside the banded lineage, and the memoized index is
    # then free for every other family entry in the same session.
    rep_shingled = _rep_shingled(spark, sf_dir)
    sigs = _mh_digest(rep_shingled).groupBy("doc_id").agg(
        *[
            F.min(F.expr(_mh_expr_from_digest(i))).alias(f"mh_{i}")
            for i in range(N_MINHASH)
        ]
    )
    # one pass over the signatures: explode the 4 band keys inline
    # (a per-band union would re-run the whole shingle→md5→min lineage
    # once per band and once per join side — 8× the scan)
    band_structs = ", ".join(
        f"struct({band} as band, concat(cast(mh_{2 * band} as string), '_', "
        f"cast(mh_{2 * band + 1} as string)) as bucket)"
        for band in range(N_MINHASH // 2)
    )
    banded = sigs.select(
        "doc_id", F.explode(F.expr(f"array({band_structs})")).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    # persist: the self-join reads this lineage twice, and the banded
    # table (4 rows/doc, two small columns) is far cheaper to hold
    # than to recompute through the md5 pipeline
    banded = banded.persist()
    # eager: the self-join's two map sides launch concurrently and a
    # cold lazy cache would run the shingle→md5→min lineage twice
    banded.count()
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        # star edges can't collide with rep-level pairs (members are
        # never reps), so unionAll after the distinct — no re-shuffle
        .unionAll(star)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pairs.count()  # materialize now so the banded intermediate can go
    banded.unpersist()
    _PAIR_CACHE[key] = pairs
    _evict_oldest(_PAIR_CACHE)
    return pairs


def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered presentation of :func:`lsh_candidate_pairs` (the sort
    exists only for the deterministic oracle compare; consumers like
    connected components use the unordered pairs directly). Round-8
    star contract — see :func:`lsh_candidate_pairs`."""
    return lsh_candidate_pairs(spark, sf_dir).orderBy("doc_a", "doc_b")


MINHASH_LSH_ORACLE = f"""
WITH {LSH_CAND_CTES}
SELECT doc_a, doc_b FROM cand
ORDER BY doc_a, doc_b
"""


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document: per-token md5-derived hash, bit
    votes weighted by token frequency, sign-aggregated — deterministic
    on both engines (no RNG, no engine hash)."""
    tokens = tokenized_docs(spark, sf_dir).select(
        "doc_id", F.explode("toks").alias("token")
    ).filter(F.col("token") != "")
    hashed = tokens.withColumn(
        "h", F.conv(F.substring(F.md5(F.col("token").cast("binary")), 1, 8), 16, 10).cast("bigint")
    )
    # one row per (doc, token-occurrence, bit): 32-way expand, then a
    # single groupBy — stays fully parallel, no Python
    bits = hashed.select(
        "doc_id",
        F.explode(F.expr("sequence(0, 31)")).alias("bit"),
        F.col("h"),
    ).withColumn(
        "vote",
        F.when(F.expr("(h >> bit) & 1") == 1, 1).otherwise(-1),
    )
    sig = (
        bits.groupBy("doc_id", "bit")
        .agg(F.sum("vote").alias("v"))
        .withColumn(
            "bitval",
            F.when(F.col("v") > 0, F.expr("shiftleft(cast(1 as bigint), bit)")).otherwise(
                F.lit(0).cast("bigint")
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("bitval").alias("simhash"))
    )
    return sig.orderBy("doc_id")


SIMHASH_ORACLE = r"""
WITH tokens AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
  FROM documents
),
hashed AS (
  SELECT doc_id, CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) AS h
  FROM tokens
  WHERE token <> ''
),
bits AS (
  SELECT doc_id, bit,
    CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END AS vote
  FROM hashed, unnest(generate_series(0, 31)) AS t(bit)
),
votes AS (
  SELECT doc_id, bit, SUM(vote) AS v FROM bits GROUP BY doc_id, bit
)
SELECT doc_id,
  CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT)
    AS simhash
FROM votes
GROUP BY doc_id
ORDER BY doc_id
"""


# grid side length for the blocked pairwise compare: each label's
# all-pairs work is spread over EMBED_PAIR_BLOCKS² join cells instead
# of one task. At 100 TB scale this with the largest label's size
# (cells per label ≈ (label_size / target_rows_per_task)²).
EMBED_PAIR_BLOCKS = 4


def _cell_cosine_kernel(left, right):
    """Exact pairwise cosine inside one grid cell — see
    :func:`embedding_neardup_pairs` for the bit-parity argument.

    left = cell's A-side rows (vec_id, label, v, __blk, __cj),
    right = B-side; emits ordered pairs (a.vec_id < b.vec_id) whose
    raw cosine clears the 0.4 gate with a 1e-6 margin (the exact
    6-dp round + threshold happen JVM-side afterwards)."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame(
        {
            "vec_a": pd.Series(dtype="int64"),
            "vec_b": pd.Series(dtype="int64"),
            "label": pd.Series(dtype="int32"),
            "cos_raw": pd.Series(dtype="float64"),
        }
    )
    if len(left) == 0 or len(right) == 0:
        return empty
    ids_a = left["vec_id"].to_numpy()
    ids_b = right["bvec_id"].to_numpy()
    va = np.stack(left["v"].to_numpy()).astype(np.float64, copy=False)
    vb = np.stack(right["bv"].to_numpy()).astype(np.float64, copy=False)
    d = va.shape[1]
    # left-to-right per-pair accumulation, vectorized across pairs:
    # acc[i, j] after step k equals the JVM fold of the first k+1
    # products — NEVER np.dot/matmul (BLAS reassociates the sum)
    acc = np.zeros((len(ids_a), len(ids_b)))
    for k in range(d):
        acc += np.multiply.outer(va[:, k], vb[:, k])
    n2a = np.zeros(len(ids_a))
    n2b = np.zeros(len(ids_b))
    for k in range(d):
        n2a += va[:, k] * va[:, k]
        n2b += vb[:, k] * vb[:, k]
    denom = np.multiply.outer(np.sqrt(n2a), np.sqrt(n2b))
    with np.errstate(divide="ignore", invalid="ignore"):
        cos = np.where(denom == 0.0, 0.0, acc / denom)
    ia, jb = np.nonzero(
        (ids_a[:, None] < ids_b[None, :]) & (cos >= 0.4 - 1e-6)
    )
    return pd.DataFrame(
        {
            "vec_a": ids_a[ia],
            "vec_b": ids_b[jb],
            "label": np.full(len(ia), left["label"].iloc[0], dtype="int32"),
            "cos_raw": cos[ia, jb],
        }
    )


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: pairs with cosine ≥ 0.4, bucketed by
    label so the pairwise compare is per-bucket (the IVF trick), not a
    global cross join — and grid-blocked within label (the Okcan &
    Riedewald theta-join cell scheme, realized since round 8 by the
    cogrouped Arrow kernel's (label, i, j) cell keys; the JVM-join
    reference formulation lives as the executable spec in
    tests/test_edge_cases.py::test_grid_pairs_bound_per_cell_and_exact)
    so a skewed label cannot serialize one task (the round-2 shape
    was per-label all-pairs in a single join cell). Dot products computed in double with identical
    left-to-right folds on both engines.

    Round 8 EXACT-DEDUP-FIRST STAR CONTRACT (the Zipf-stress fix, see
    :data:`DEDUP_FIRST_CTES` for the rationale): the grid join runs
    on one representative per distinct (label, vector); identical
    vectors are emitted as rep→member star rows at literal cosine 1.0
    (zero vectors excluded — identical zero vectors score 0.0 < 0.4
    under the zero-norm rule, so the full contract never paired them
    either). Output is linear in duplication, never C(g,2); the
    DuckDB oracle computes the same star form."""
    emb = load_table(spark, "embeddings", sf_dir)
    # spread: parallelize the pairwise stage when the source is one file
    allv = spread(emb).select(
        "vec_id",
        "label",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    # persisted via the bounded session cache: three consumers (both
    # grid-join sides + the star branch) would each recompute the
    # array-keyed window shuffle (measured A/B in SCALE.md round 8),
    # and embedding_duplicate_clusters re-enters this function in the
    # same session — an unbounded per-call persist() would pin one
    # corpus-sized frame per invocation (review finding, round 8)
    key = (spark.sparkContext.applicationId, sf_dir)
    members = _EMB_MEMBERS_CACHE.get(key)
    _touch(_EMB_MEMBERS_CACHE, key)
    if members is not None and not _still_cached(members):
        members = members.persist(StorageLevel.MEMORY_AND_DISK)
        members.count()  # eager: concurrent consumers (see _content_reps)
        _EMB_MEMBERS_CACHE[key] = members
    if members is None:
        members = allv.withColumn(
            "rep_id", F.min("vec_id").over(Window.partitionBy("label", "v"))
        ).persist(StorageLevel.MEMORY_AND_DISK)
        members.count()  # eager: concurrent consumers (see _content_reps)
        _EMB_MEMBERS_CACHE[key] = members
        _evict_oldest(_EMB_MEMBERS_CACHE)
    v = members.filter(F.col("vec_id") == F.col("rep_id")).select(
        "vec_id", "label", "v"
    )
    norm2 = F.expr(
        "aggregate(transform(v, x -> x * x), cast(0.0 as double), (acc, x) -> acc + x)"
    )
    star_rows = (
        members.filter((F.col("vec_id") != F.col("rep_id")) & (norm2 > 0))
        .select(
            F.col("rep_id").alias("vec_a"),
            F.col("vec_id").alias("vec_b"),
            "label",
            F.lit(1.0).alias("cosine"),
        )
    )
    # VECTORIZED EXACT KERNEL (round-8 Zipf-stress fix #2): the
    # O(pairs-per-label) exact cosine is this entry's contract, and
    # per-pair JVM expression evaluation (lambda fold OR unrolled
    # 64-term sum — both measured, SCALE.md) pays ~µs/pair: 39M grid
    # pairs at 10× cost 144-298 s. The same grid cells evaluated as a
    # cogrouped Arrow kernel run at numpy speed while staying
    # BIT-IDENTICAL to the JVM fold and DuckDB's list_sum: products
    # are elementwise IEEE multiplies and the 64-dim reduction is an
    # explicit d=0..63 loop of vectorized adds — left-to-right
    # association per pair, vectorized ACROSS pairs, never matmul/BLAS
    # (whose pairwise summation order would drift ulps). The kernel
    # emits raw cosines with a conservative margin and the 6-dp edge
    # round + threshold stay in JVM expressions, so the rounding path
    # is byte-for-byte the one the oracle mirrors.
    m = EMBED_PAIR_BLOCKS
    cell = F.explode(F.array(*[F.lit(i) for i in range(m)]))
    # EXPLICIT cell-key width (round 11): the kernel stage is compute-
    # bound on per-cell pair work — AQE's byte-based coalescing saw a
    # few MB of shuffle and squashed the numpy kernel onto ~5 tasks at
    # sf0.1; pinning the exchange at the conf'd shuffle width keeps
    # the same cluster-tunable fan-out and full local parallelism.
    sp = int(v.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ga = (
        v.withColumn("__blk", F.pmod(F.hash("vec_id"), F.lit(m)))
        .withColumn("__cj", cell)
        .select(F.col("label"), F.col("__blk").alias("__ci"), "__cj", "vec_id", "v")
        .repartition(sp, "label", "__ci", "__cj")
        .groupBy("label", "__ci", "__cj")
    )
    # B side carries RENAMED columns: a self-cogroup shares attribute
    # ids between sides, and Catalyst's dedup+pruning strips the right
    # side's payload columns out of the Arrow batch (observed as a
    # KeyError inside the kernel when the caller projects a column
    # subset) — distinct names keep both payloads intact
    gb = (
        v.select(
            F.col("vec_id").alias("bvec_id"),
            F.col("label").alias("blabel"),
            F.col("v").alias("bv"),
        )
        .withColumn("__blk", F.pmod(F.hash("bvec_id"), F.lit(m)))
        .withColumn("__ci", cell)
        .select("blabel", "__ci", F.col("__blk").alias("__cj"), "bvec_id", "bv")
        .repartition(sp, "blabel", "__ci", "__cj")
        .groupBy("blabel", "__ci", "__cj")
    )
    raw = ga.cogroup(gb).applyInPandas(
        _cell_cosine_kernel,
        schema="vec_a long, vec_b long, label int, cos_raw double",
    )
    rep_pairs = (
        raw.withColumn("cosine", F.round("cos_raw", 6))
        .filter(F.col("cosine") >= 0.4)
        .select("vec_a", "vec_b", "label", "cosine")
    )
    return rep_pairs.unionByName(star_rows).orderBy("vec_a", "vec_b")


EMBEDDING_NEARDUP_ORACLE = """
WITH v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
grpv AS (SELECT label, v, MIN(vec_id) AS rep FROM v GROUP BY label, v),
reps AS (SELECT rep AS vec_id, label, v FROM grpv),
starv AS (
  SELECT g.rep AS vec_a, m.vec_id AS vec_b, m.label
  FROM v m JOIN grpv g ON m.label = g.label AND m.v = g.v
  WHERE m.vec_id <> g.rep
    AND list_sum(list_transform(generate_series(1, 64), i -> m.v[i] * m.v[i])) > 0
),
pairs AS (
  SELECT
    a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
    ROUND(CASE
      WHEN (
        sqrt(list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * a.v[i])))
        * sqrt(list_sum(list_transform(generate_series(1, 64), i -> b.v[i] * b.v[i])))
      ) = 0 THEN cast(0.0 as double)
      ELSE
        list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i]))
        / (
          sqrt(list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * a.v[i])))
          * sqrt(list_sum(list_transform(generate_series(1, 64), i -> b.v[i] * b.v[i])))
        )
      END, 6) AS cosine
  FROM reps a
  JOIN reps b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, label, cosine
FROM pairs
WHERE cosine >= 0.4
UNION ALL
SELECT vec_a, vec_b, label, 1.0 AS cosine FROM starv
ORDER BY vec_a, vec_b
"""


MAX_CC_ITERATIONS = 20
# partition-local union-find contraction only engages above this edge
# count — below it the Python phase costs more than the rounds it
# saves (see duplicate_clusters docstring)
CONTRACTION_MIN_EDGES = 200_000
# below this edge count the whole graph is solved by union-find in a
# SINGLE task (repartition(1) + mapInArrow) — the broadcast-join
# analogue for graphs: 2M edges ≈ tens of MB of task-local dict,
# far under executor memory, and one task beats 3+ distributed
# rounds of join+checkpoint+count jobs. The LSH candidate graph is
# orders of magnitude smaller than the corpus, but a 100 TB run with
# heavy duplication exceeds this and takes the iterative path.
SINGLE_TASK_MAX_EDGES = 2_000_000


def _partition_local_cc_arrow(batches) -> "Iterator":
    """Union-find over one partition's edge list, min-id roots —
    Arrow-batched (``mapInArrow``): edges arrive as columnar int64
    buffers and labels leave the same way, so the only Python-side
    cost is the union-find loop itself; there is no per-row pickling
    of Row objects in either direction (measured 3.4× vs the round-3
    ``rdd.mapPartitions`` form on a 5M-edge contraction: min-of-3
    0.66 s vs 2.53 s, local[32]).

    Runs entirely inside a task (never on the driver): the classic
    first phase of scalable connected components — contract
    everything connected *within* a partition to its local minimum,
    so the iterative global phase only has to stitch components that
    span partition boundaries. Path-halving keeps it near-linear.
    """
    import pyarrow as pa

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for batch in batches:
        # .tolist(): loop over native ints, not numpy scalars (the
        # dict-keyed union-find is ~2x faster on ints)
        col_a = batch.column(0).to_numpy(zero_copy_only=False).tolist()
        col_b = batch.column(1).to_numpy(zero_copy_only=False).tolist()
        for a, b in zip(col_a, col_b):
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra < rb:
                parent[rb] = ra
            elif rb < ra:
                parent[ra] = rb
    nodes = list(parent)
    comps = [find(x) for x in nodes]
    yield pa.RecordBatch.from_arrays(
        [pa.array(nodes, pa.int64()), pa.array(comps, pa.int64())],
        ["node", "comp"],
    )


def duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the LSH candidate-pair graph:
    every doc in a near-dup candidate cluster labeled with the
    cluster's minimum doc_id, plus the cluster size.

    This is the step that turns pairwise candidates into dedup
    *decisions* (keep one doc per component). Cost-based physical
    strategy, the same spirit as broadcast-vs-shuffle join selection:

    * **graph fits one task** (≤ ``SINGLE_TASK_MAX_EDGES``): solve it
      with union-find in a single ``mapInArrow`` task over
      ``repartition(1)`` — one job instead of 3+ distributed rounds of
      join/checkpoint/count. Still executor-side (a task-local dict,
      no driver data), exactly like a broadcast join holds the small
      side in one task's memory.
    * **large graph**: two-phase scalable CC —
      1. partition-local ``mapInArrow`` union-find contraction
         (:func:`_partition_local_cc_arrow`) collapses within-partition
         connections to local minima (engages above
         ``CONTRACTION_MIN_EDGES``);
      2. iterative min-label propagation with pointer-jumping (hook +
         jump per round, O(log diameter) rounds) stitches components
         spanning partition boundaries.

    * every round is one equi-join + groupBy-min + one label
      self-join (fully distributed, shuffle on doc_id);
    * ``localCheckpoint`` truncates lineage each round so the plan
      doesn't grow with the iteration count (on a real cluster with
      a fault-tolerance requirement, swap for ``checkpoint`` with a
      reliable checkpoint dir);
    * the driver sees only one scalar (changed-count) per round —
      no data is collected.

    Singleton documents (no candidate pair) are excluded: at corpus
    scale the interesting output is the duplicate groups, not a
    copy of the corpus.
    """
    # already materialized by the shared candidate stage — no persist
    # of our own, and counting it is a cache read
    raw_edges = lsh_candidate_pairs(spark, sf_dir).select("doc_a", "doc_b")
    return _cluster_report(_connected_components(spark, raw_edges))


def _connected_components(spark: SparkSession, raw_edges: DataFrame) -> DataFrame:
    """Cost-based connected components over an edge DataFrame with
    columns (doc_a, doc_b) → (node, comp) labels with min-id roots.

    The shared post-candidate decision stage for every dedup family
    (MinHash/LSH text candidates, embedding-cosine candidates):
    single-task union-find below ``SINGLE_TASK_MAX_EDGES``,
    contraction + hook/jump label propagation above — see
    :func:`duplicate_clusters` for the full strategy rationale.
    """
    n_edges = raw_edges.count()
    if n_edges <= SINGLE_TASK_MAX_EDGES:
        # union-find with min-id roots IS exact CC when one task sees
        # every edge: roots are component minima by construction
        # repartition(1), NOT coalesce(1): coalesce would fold the
        # whole upstream candidate computation into the single task,
        # serializing it; repartition keeps candidate generation
        # parallel and only shuffles the (tiny) pair list to one task
        # localCheckpoint: _cluster_report reads labels twice (sizes +
        # join); without materialization the whole candidate lineage
        # would re-execute per read
        return (
            raw_edges.repartition(1)
            .mapInArrow(_partition_local_cc_arrow, "node bigint, comp bigint")
            .localCheckpoint()
        )
    # size the phase parallelism to the candidate GRAPH, which is
    # orders of magnitude smaller than the corpus — at corpus-wide
    # shuffle width, per-round task-scheduling overhead dominates the
    # (tiny) label table
    par = max(2, min(spark.sparkContext.defaultParallelism, n_edges // 50_000 + 1))
    if n_edges >= CONTRACTION_MIN_EDGES:
        # contraction pays when partitions hold enough intra-partition
        # structure to collapse; below the threshold the Python
        # round-trip costs more than the rounds it saves (measured:
        # at 619 edges it ADDS ~2 s and removes no rounds), so the
        # cutover is cost-based, like AQE's own threshold rules.
        local = raw_edges.repartition(par, "doc_a").mapInArrow(
            _partition_local_cc_arrow, "node bigint, comp bigint"
        )
        # contracted edges: node—local_min links (self-loops dropped).
        # Every original node still appears — as a source when it
        # isn't its partition-local min, and as the min endpoint of
        # its partners' links otherwise — so the global phase labels
        # all of them.
        edges = (
            local.filter(F.col("node") != F.col("comp"))
            .select(F.col("node").alias("doc_a"), F.col("comp").alias("doc_b"))
            .distinct()
        )
    else:
        edges = raw_edges
    und = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(
            edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .repartition(par, "src")
        .persist()  # read every round: both the join and (once) node init
    )

    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(MAX_CC_ITERATIONS):
        nb_min = (
            und.join(labels, und.src == labels.node)
            .groupBy(F.col("dst").alias("node2"))
            .agg(F.min("comp").alias("nb_comp"))
        )
        hooked = (
            labels.join(nb_min, labels.node == nb_min.node2, "left")
            .select(
                "node",
                "comp",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nb_comp"), F.col("comp"))
                ).alias("hooked"),
            )
        )
        # pointer-jump: follow the label one more step (labels are
        # always node ids within the same component, so comp[comp[v]]
        # is valid and can only be ≤). Hook alone moves the min label
        # one hop per round — O(diameter) rounds; hook + jump roughly
        # halves the distance-to-min each round — O(log diameter).
        # One extra self-join of the (tiny) label table per round
        # buys a halved round count, and each avoided round saves a
        # join + checkpoint + count job.
        lbl = hooked.select("node", F.col("hooked"))
        proposed = (
            hooked.alias("x")
            .join(
                lbl.alias("y"), F.col("x.hooked") == F.col("y.node"), "left"
            )
            .select(
                F.col("x.node").alias("node"),
                F.col("x.comp").alias("comp"),
                F.least(
                    F.col("x.hooked"),
                    F.coalesce(F.col("y.hooked"), F.col("x.hooked")),
                ).alias("new_comp"),
            )
        )
        # checkpoint BEFORE the convergence count: one materialization
        # per round serves both the changed-count action and the next
        # round's input (counting on the lazy frame would re-execute
        # the propagation join a second time)
        proposed = proposed.localCheckpoint()
        changed = proposed.filter(F.col("new_comp") != F.col("comp")).count()
        labels = proposed.select("node", F.col("new_comp").alias("comp"))
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected components did not converge in {MAX_CC_ITERATIONS} rounds"
        )
    und.unpersist()  # edges itself is the shared stage — stays cached
    return labels


def _cluster_report(labels: DataFrame) -> DataFrame:
    """(node, comp) labels → (doc_id, component, n_members) report."""
    sizes = labels.groupBy("comp").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        labels.join(sizes, "comp")
        .select(
            F.col("node").alias("doc_id"),
            F.col("comp").alias("component"),
            "n_members",
        )
        .orderBy("doc_id")
    )


_CC_ORACLE_PREFIX = f"""
WITH RECURSIVE shingled AS (
  SELECT DISTINCT doc_id, unnest({SHINGLES_SQL}) AS shingle
  FROM documents
),
sigs AS (
  SELECT
    doc_id,
    {MINHASH_SQL_AGGS}
  FROM shingled
  GROUP BY doc_id
),
banded AS (
  {" UNION ALL ".join(
    f"SELECT doc_id, {band} AS band,"
    f" CAST(mh_{2 * band} AS VARCHAR) || '_' || CAST(mh_{2 * band + 1} AS VARCHAR)"
    f" AS bucket FROM sigs"
    for band in range(N_MINHASH // 2)
  )}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
und AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM cand
),
nodes AS (SELECT DISTINCT src AS node FROM und),
reach(node, r) AS (
  SELECT node, node AS r FROM nodes
  UNION
  SELECT re.node, u.dst AS r FROM reach re JOIN und u ON re.r = u.src
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
"""


DUPLICATE_CLUSTERS_ORACLE = _CC_ORACLE_PREFIX + """
SELECT c.node AS doc_id, c.component, cnt.n_members
FROM comp c
JOIN (SELECT component, COUNT(*) AS n_members FROM comp GROUP BY component) cnt
  ON c.component = cnt.component
ORDER BY doc_id
"""


PR_ITERATIONS = 3
PR_INIT = 1_000_000  # rank micro-units
PR_BASE = 150_000  # (1 - 0.85) in micro-units


def lsh_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 fixed iterations, damping 0.85) over the undirected
    LSH candidate graph — ranks the most-connected near-duplicate
    documents, the "which docs sit at the center of a template
    cluster" signal. Round 8: the graph is the star-contract
    candidate set (see :func:`lsh_candidate_pairs`) — exact-duplicate
    groups appear as rep-centered stars (the rep's degree counts its
    g−1 members plus its near-dup edges), not C(g,2) cliques.

    Exact cross-engine arithmetic: ranks live in integer micro-units;
    each edge contributes ``r div deg`` (integer division) and the
    damped update is ``150000 + (85 · inflow) div 100`` — no floats
    anywhere, so the DuckDB oracle (same three iterations unrolled as
    chained CTEs) matches bit-for-bit. A float formulation would
    accumulate sum-order ULPs per iteration.

    Scale: per iteration one equi-join (edges ⨝ ranks on src) + one
    groupBy(dst) sum — the standard distributed PageRank step. Fixed
    iteration count keeps the lineage shallow (no checkpointing
    needed); the convergence-loop variant with localCheckpoint is
    :func:`duplicate_clusters`.
    """
    edges = lsh_candidate_pairs(spark, sf_dir).select("doc_a", "doc_b")
    und = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(
            edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .persist()
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    und_deg = und.join(deg, "src")

    ranks = deg.select(F.col("src").alias("node"), F.lit(PR_INIT).cast("bigint").alias("r"))
    for _ in range(PR_ITERATIONS):
        inflow = (
            und_deg.join(ranks, und_deg.src == ranks.node)
            .select("dst", F.expr("r div deg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = inflow.select(
            F.col("dst").alias("node"),
            F.expr(f"cast({PR_BASE} + (85 * inflow) div 100 as bigint)").alias(
                "r"
            ),
        )
    out = (
        ranks.join(deg, ranks.node == deg.src)
        .select(
            F.col("node").alias("doc_id"),
            F.col("r").alias("pr_micro"),
            "deg",
        )
        .orderBy(F.col("pr_micro").desc(), F.col("doc_id").asc())
    )
    # und stays persisted: the returned lineage references it once per
    # iteration, and the caller materializes after we return — an
    # eager unpersist here would recompute the whole LSH candidate
    # generation per reference. The table is edge-sized (KBs); session
    # cleanup / bench clearCache reclaims it.
    return out


def _pagerank_iteration_sql(n: int) -> str:
    prev = "r0" if n == 1 else f"it{n - 1}"
    return f"""
it{n} AS (
  SELECT u.dst AS node,
         CAST({PR_BASE} + (85 * SUM(p.r // d.deg)) // 100 AS BIGINT) AS r
  FROM und u
  JOIN {prev} p ON p.node = u.src
  JOIN deg d ON d.node = u.src
  GROUP BY u.dst
)"""


PAGERANK_ORACLE = (
    f"""
WITH {LSH_CAND_CTES},
und AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM cand
),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM und GROUP BY src),
r0 AS (SELECT node, CAST({PR_INIT} AS BIGINT) AS r FROM deg),"""
    + ",".join(_pagerank_iteration_sql(i) for i in range(1, PR_ITERATIONS + 1))
    + f"""
SELECT p.node AS doc_id, p.r AS pr_micro, d.deg
FROM it{PR_ITERATIONS} p JOIN deg d ON d.node = p.node
ORDER BY pr_micro DESC, doc_id ASC
"""
)


VERIFY_JACCARD_THRESHOLD = 0.5


def lsh_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production two-stage dedup pipeline as ONE lineage:
    MinHash-LSH candidate generation, then exact word-3-gram Jaccard
    computed ONLY on candidate pairs, keeping pairs ≥ 0.5 — the
    candidates→verify composition this module's docstring prescribes
    for 100 TB (all-pairs exact Jaccard is quadratic; exact Jaccard
    on the LSH survivors is linear in candidates).

    Shape: the candidate pairs semi-join back into the (doc, shingle)
    inverted index on BOTH endpoints, the shingle equi-join counts
    intersections only within candidates, and sizes broadcast back.

    Round 8: candidates arrive in the star contract (see
    :func:`lsh_candidate_pairs`), so the verify stage is linear in
    duplication. The exact-Jaccard recompute runs against the
    REPRESENTATIVE shingle index only — star pairs (identical texts
    by md5 construction) fall out of the inner join and are emitted
    at their exact value 1.0, so a 100%-duplicated corpus never pays
    a corpus-sized shingle explode for pairs whose equality is
    already proven. Zipf 10× stress: 267 s → 2.4×; full-replica 10×
    5.1× → measured after this change in SCALE.md.
    """
    # build the shingle-index memo FIRST: the candidate build then
    # reuses it (it checks the memo), instead of inlining its own
    # shingle pass and leaving this function to build the memo anyway
    shingled = _rep_shingled(spark, sf_dir)
    cand = lsh_candidate_pairs(spark, sf_dir)
    _, star = _content_reps(spark, sf_dir)
    sizes = shingled.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    a = shingled.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = shingled.select(F.col("doc_id").alias("doc_b"), "shingle")
    # star pairs drop out here by construction: doc_b is a member id,
    # never present in the rep-only index
    common = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    out = (
        common.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= VERIFY_JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
        .unionByName(
            star.select("doc_a", "doc_b", F.lit(1.0).alias("jaccard"))
        )
        .orderBy("doc_a", "doc_b")
    )
    # shingled stays persisted until the caller materializes
    # (see lsh_graph_pagerank note); bench/driver reclaim via session
    return out


LSH_VERIFIED_ORACLE = f"""
WITH {LSH_CAND_CTES},
sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM rep_shingled GROUP BY doc_id
),
common AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
  FROM cand c
  JOIN rep_shingled sa ON sa.doc_id = c.doc_a
  JOIN rep_shingled sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT
  doc_a, doc_b,
  ROUND(n_common / CAST(za.n_shingles + zb.n_shingles - n_common AS DOUBLE), 6)
    AS jaccard
FROM common
JOIN sizes za ON za.doc_id = doc_a
JOIN sizes zb ON zb.doc_id = doc_b
WHERE ROUND(n_common / CAST(za.n_shingles + zb.n_shingles - n_common AS DOUBLE), 6)
      >= {VERIFY_JACCARD_THRESHOLD}
UNION ALL
SELECT doc_a, doc_b, 1.0 AS jaccard FROM star
ORDER BY doc_a, doc_b
"""


def embedding_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space dedup decisions: connected components over the
    cosine near-dup graph (pairs with cosine ≥ 0.4 from
    :func:`embedding_neardup_pairs`), labeling every vector in a
    near-dup cluster with the cluster's minimum vec_id — the
    embedding twin of :func:`duplicate_clusters`, closing the
    candidates→decisions loop for semantic dedup.

    Reuses the same cost-based CC machinery
    (:func:`_connected_components`): single-task union-find for graphs
    that fit one task, contraction + hook/jump label propagation
    beyond — the large-graph path is shared code, not a re-implement
    (round 2 raised NotImplementedError here above the single-task
    bound). At 100 TB the candidate stage would come from the IVF/LSH
    bucketed join rather than the exact label-bucketed compare, with
    this step unchanged.
    """
    edges = embedding_neardup_pairs(spark, sf_dir).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    return _cluster_report(_connected_components(spark, edges)).withColumnsRenamed(
        {"doc_id": "vec_id"}
    )


EMBEDDING_CLUSTERS_ORACLE = """
WITH RECURSIVE v AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cand AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM v a
  JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE ROUND(
      list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * b.v[i]))
      / (
        sqrt(list_sum(list_transform(generate_series(1, 64), i -> a.v[i] * a.v[i])))
        * sqrt(list_sum(list_transform(generate_series(1, 64), i -> b.v[i] * b.v[i])))
      ), 6) >= 0.4
),
und AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM cand
),
nodes AS (SELECT DISTINCT src AS node FROM und),
reach(node, r) AS (
  SELECT node, node AS r FROM nodes
  UNION
  SELECT re.node, u.dst AS r FROM reach re JOIN und u ON re.r = u.src
),
comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
SELECT c.node AS vec_id, c.component, cnt.n_members
FROM comp c
JOIN (SELECT component, COUNT(*) AS n_members FROM comp GROUP BY component) cnt
  ON c.component = cnt.component
ORDER BY vec_id
"""


def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end dedup DECISION a corpus pipeline actually ships:
    which documents survive. Composes the full production chain —
    MinHash signatures → LSH band candidates → connected components →
    keep = cluster minimum or singleton — and reports the per-source
    retention (kept/dropped counts + dedup ratio), i.e. the yield
    table a data-curation run publishes.

    Scale: reuses the shared candidate stage (cached per sf_dir) and
    the cost-based CC (:func:`_connected_components`); the final pass
    is one broadcast-size join of the drop set (cluster non-minima —
    bounded by duplicate count, ≪ corpus) onto the corpus scan.
    """
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source")
    edges = lsh_candidate_pairs(spark, sf_dir).select("doc_a", "doc_b")
    labels = _connected_components(spark, edges)
    drops = labels.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias("doc_id"), F.lit(1).alias("__drop")
    )
    flagged = docs.join(F.broadcast(drops), "doc_id", "left")
    r6 = lambda c: F.floor(c * 1_000_000.0 + 0.5) / 1_000_000.0  # noqa: E731
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("__drop").isNull(), 1).otherwise(0)).alias(
                "n_kept"
            ),
            F.sum(F.coalesce(F.col("__drop"), F.lit(0))).alias("n_dropped"),
        )
        .withColumn("dedup_ratio", r6(F.col("n_dropped") / F.col("n_docs")))
        .orderBy("source")
    )


KEEP_LIST_ORACLE = _CC_ORACLE_PREFIX + """,
drops AS (SELECT node FROM comp WHERE node != component)
SELECT
  d.source,
  COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN dr.node IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(SUM(CASE WHEN dr.node IS NULL THEN 0 ELSE 1 END) AS BIGINT)
    AS n_dropped,
  FLOOR(SUM(CASE WHEN dr.node IS NULL THEN 0 ELSE 1 END)
        / CAST(COUNT(*) AS DOUBLE) * 1000000 + 0.5) / 1000000 AS dedup_ratio
FROM documents d
LEFT JOIN drops dr ON d.doc_id = dr.node
GROUP BY d.source
ORDER BY d.source
"""


# Non-overlapping passage width for first-wins chunk dedup: 20 tokens
# is the CCNet/RefinedWeb-style "paragraph" granularity scaled to the
# ~60-token synthetic docs (3 chunks/doc).
CHUNK_TOKENS = 20


def chunk_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level first-wins dedup (CCNet-style line dedup, mapped
    to fixed 20-token chunks because the corpus has no newlines): every
    document is cut into non-overlapping 20-token chunks, each chunk is
    fingerprinted, and only the corpus-wide FIRST occurrence of a
    fingerprint (min ``(doc_id, chunk_idx)``) survives. Reported per
    document: chunk counts and the retained-token fraction — the
    per-doc signal a pre-training pipeline uses to drop boilerplate
    that repeats across pages (reference has no analogue; extension
    surface per SURVEY.md §7 M4).

    Scale: chunking is a narrow ``posexplode`` inside codegen (chunk
    text never leaves the executor — only its md5 and token count do);
    first-wins is ONE shuffle on the fingerprint (a partitioned
    ``row_number`` window over ``fp`` — uniformly distributed md5 key,
    so no skew); the per-doc rollup shuffles on ``doc_id``. No
    all-pairs work anywhere, no global window. At 100 TB the fp
    shuffle is the classic dedup exchange; a popular boilerplate chunk
    lands millions of rows in one fp group, but the window computes
    only row_number over it (streaming, no buffering beyond sort).
    Measured (SCALE.md round-3 skew experiment, 70% exact clones →
    one hot fp group): the window form beats the map-side-combinable
    min-aggregate+join alternative 1.4× at a 126k-row hot group and
    2.3× at 1.26M (the join-back's second full shuffle of the chunk
    table costs more than the single-task sort of the hot group);
    the min-agg fallback only pays once a single fp group approaches
    a task's sort budget (~10⁸ rows).
    """
    from pyspark.sql import Window as W

    # null-text guard: Spark's sequence(1, ceil(size(NULL)/20)) would
    # yield a DESCENDING [1, 0] (two phantom chunks) while DuckDB's
    # generate_series(1, NULL) yields nothing — filter explicitly on
    # both sides so a future null-bearing corpus can't diverge
    docs = (
        spread(load_table(spark, "documents", sf_dir))
        .filter(F.col("text").isNotNull())
        .withColumn("toks", F.expr(TOKENS))
    )
    n_chunks = F.ceil(F.size("toks") / F.lit(float(CHUNK_TOKENS))).cast("int")
    chunks = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), n_chunks),
                lambda i: F.concat_ws(
                    " ",
                    F.slice(
                        F.col("toks"),
                        (i - 1) * CHUNK_TOKENS + 1,
                        CHUNK_TOKENS,
                    ),
                ),
            )
        ).alias("chunk_idx", "chunk"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.md5("chunk").alias("fp"),
        F.size(F.split("chunk", " ")).alias("chunk_toks"),
    )
    first_wins = chunks.withColumn(
        "rn",
        F.row_number().over(W.partitionBy("fp").orderBy("doc_id", "chunk_idx")),
    )
    kept = F.when(F.col("rn") == 1, 1).otherwise(0)
    r6 = lambda c: F.floor(c * 1_000_000.0 + 0.5) / 1_000_000.0  # noqa: E731
    return (
        first_wins.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(kept).alias("kept_chunks"),
            F.sum("chunk_toks").alias("n_toks"),
            F.sum(kept * F.col("chunk_toks")).alias("kept_toks"),
        )
        .withColumn(
            "retained_ratio", r6(F.col("kept_toks") / F.col("n_toks"))
        )
        .orderBy("doc_id")
    )


CHUNK_FIRST_WINS_ORACLE = rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
  FROM documents WHERE text IS NOT NULL
),
idx AS (
  SELECT doc_id, toks,
         unnest(generate_series(
           1, CAST(CEIL(len(toks) / {float(CHUNK_TOKENS)}) AS BIGINT)
         )) AS i
  FROM t
),
chunks AS (
  SELECT
    doc_id,
    CAST(i - 1 AS INTEGER) AS chunk_idx,
    md5(array_to_string(
      list_slice(toks, CAST((i - 1) * {CHUNK_TOKENS} + 1 AS BIGINT),
                 CAST(i * {CHUNK_TOKENS} AS BIGINT)), ' ')) AS fp,
    len(list_slice(toks, CAST((i - 1) * {CHUNK_TOKENS} + 1 AS BIGINT),
                   CAST(i * {CHUNK_TOKENS} AS BIGINT))) AS chunk_toks
  FROM idx
),
marked AS (
  SELECT doc_id, chunk_toks,
         row_number() OVER (PARTITION BY fp ORDER BY doc_id, chunk_idx) AS rn
  FROM chunks
)
SELECT
  doc_id,
  COUNT(*) AS n_chunks,
  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
  CAST(SUM(chunk_toks) AS BIGINT) AS n_toks,
  CAST(SUM(CASE WHEN rn = 1 THEN chunk_toks ELSE 0 END) AS BIGINT)
    AS kept_toks,
  FLOOR(SUM(CASE WHEN rn = 1 THEN chunk_toks ELSE 0 END)
        / CAST(SUM(chunk_toks) AS DOUBLE) * 1000000 + 0.5) / 1000000
    AS retained_ratio
FROM marked
GROUP BY doc_id
ORDER BY doc_id
"""


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the LSH candidate graph: node/edge/wedge
    counts, the exact triangle count, and global transitivity
    (3·triangles / wedges) — the structural summary that tells a dedup
    pipeline whether its candidate graph is clique-like (true
    duplicate clusters: transitivity → 1) or chain-like noise from
    band collisions (transitivity → 0). Round 8: the graph is the
    star-contract candidate set (see :func:`lsh_candidate_pairs`), so
    triangles now measure NEAR-dup (distinct-content) cliques —
    exact-duplicate groups are rep-centered stars and contribute
    wedges but never triangles.

    Scale: the classic degree-orientation trick. Counting each
    triangle once by enumerating closed wedges at an arbitrary vertex
    is O(Σ deg²) — catastrophic on a skewed graph (one viral doc in
    10⁶ pairs → 10¹² wedges). Orienting every edge from its
    (degree, id)-smaller endpoint to the larger caps out-degree at
    O(√m), so oriented-wedge generation is O(m^1.5) worst case and the
    hot node generates almost no wedges (it is every edge's HEAD).
    Three shuffles total: degree groupBy, wedge self-join on the
    low vertex, closing equi-join on (v, w).
    """
    edges = lsh_candidate_pairs(spark, sf_dir)  # doc_a < doc_b, distinct
    deg = (
        edges.select(F.col("doc_a").alias("node"))
        .unionAll(edges.select(F.col("doc_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # nodes + wedges from ONE aggregate over deg; edges and triangles
    # as their own one-row aggregates, all combined lazily below —
    # round 8 turned the previous 3 eager .count()s + final job
    # (each a full re-read of the candidate stage when the cache is
    # cold: 10.1 s at sf0.1) into a single action
    nw_row = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2)
        .cast("bigint")
        .alias("n_wedges"),
    )
    edge_row = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    da = deg.withColumnsRenamed({"node": "doc_a", "deg": "deg_a"})
    db = deg.withColumnsRenamed({"node": "doc_b", "deg": "deg_b"})
    withdeg = edges.join(da, "doc_a").join(db, "doc_b")
    # orient small→large by (deg, id); u = tail, v = head
    small_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("doc_a") < F.col("doc_b"))
    )
    oriented = withdeg.select(
        F.when(small_first, F.col("doc_a")).otherwise(F.col("doc_b")).alias("u"),
        F.when(small_first, F.struct("deg_b", "doc_b")).otherwise(
            F.struct(
                F.col("deg_a").alias("deg_b"), F.col("doc_a").alias("doc_b")
            )
        ).alias("v"),
    ).select("u", F.col("v.doc_b").alias("v"), F.col("v.deg_b").alias("deg_v"))
    e1 = oriented.select("u", F.col("v").alias("x"), F.col("deg_v").alias("dx"))
    e2 = oriented.select(
        F.col("u").alias("u2"), F.col("v").alias("y"), F.col("deg_v").alias("dy")
    )
    # ordered out-neighbor pairs (x before y in the same orientation)
    wedges = e1.join(e2, (F.col("u") == F.col("u2"))).filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(
        F.col("u").alias("x"), F.col("v").alias("y")
    )
    tri_row = (
        wedges.join(closing, ["x", "y"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    r6 = lambda c: F.floor(c * 1_000_000.0 + 0.5) / 1_000_000.0  # noqa: E731
    return (
        nw_row.join(edge_row)
        .join(tri_row)
        .select(
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.col("n_edges").cast("bigint").alias("n_edges"),
            F.col("n_wedges"),
            F.col("n_triangles").cast("bigint").alias("n_triangles"),
            F.when(
                F.col("n_wedges") > 0,
                r6(3.0 * F.col("n_triangles") / F.col("n_wedges")),
            )
            .otherwise(F.lit(0.0))
            .alias("transitivity"),
        )
    )


GRAPH_TRIANGLES_ORACLE = f"""
WITH {LSH_CAND_CTES},
deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT doc_a AS node FROM cand UNION ALL SELECT doc_b AS node FROM cand
  ) GROUP BY node
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM cand e1
  JOIN cand e2 ON e2.doc_a = e1.doc_a AND e2.doc_b > e1.doc_b
  JOIN cand e3 ON e3.doc_a = e1.doc_b AND e3.doc_b = e2.doc_b
),
agg AS (
  SELECT
    CAST(COUNT(*) AS BIGINT) AS n_nodes,
    CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_edges,
    CAST(SUM(deg * (deg - 1)) / 2 AS BIGINT) AS n_wedges
  FROM deg
)
SELECT
  n_nodes,
  n_edges,
  n_wedges,
  CAST(n_triangles AS BIGINT) AS n_triangles,
  CASE WHEN n_wedges > 0
       THEN FLOOR(3.0 * n_triangles / n_wedges * 1000000 + 0.5) / 1000000
       ELSE 0.0 END AS transitivity
FROM agg, tri
"""


def lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH quality evaluation: recall and precision of the banded
    MinHash candidate set against exact ground truth (word-3-gram
    Jaccard ≥ 0.5, the verify threshold). One summary row:
    truth/candidate/hit counts, recall_ppm (truth pairs the bands
    caught) and precision_ppm (candidate pairs that are true dups) —
    the two numbers that size an LSH deployment: recall bounds what
    dedup misses, precision prices the verify stage.

    Both sides are deterministic (md5-derived MinHash, exact
    Jaccard), so unlike the usual ANN-recall ops this evaluation is
    fully oracle-checkable. Round 8: both sides carry the star
    contract (see :func:`lsh_candidate_pairs`) — truth is rep-level
    exact pairs plus the star edges (identical pairs ARE true dups at
    jaccard 1.0), candidates are rep-level band pairs plus the same
    stars, so the confusion counts stay coherent and every star pair
    is a guaranteed hit on both engines. Scale: the truth side's inverted-index
    self-join is the expensive exact path — at 100 TB you'd measure
    recall on a stratified SAMPLE of documents (content-addressed,
    like ``sample_stratified_hash``) and apply the measured
    recall/precision to the full-corpus run; the full-outer pair join
    here is on (doc_a, doc_b) keys, uniform and skew-free.
    """
    truth = (
        ngram_jaccard_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= VERIFY_JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.lit(1).alias("t"))
    )
    cand = lsh_candidate_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("c")
    )
    both = truth.join(cand, ["doc_a", "doc_b"], "full_outer")
    return both.agg(
        F.sum("t").alias("n_truth"),
        F.sum("c").alias("n_candidates"),
        F.sum(
            F.when(F.col("t").isNotNull() & F.col("c").isNotNull(), 1).otherwise(0)
        ).alias("n_hits"),
    ).select(
        "n_truth",
        "n_candidates",
        "n_hits",
        F.floor(F.col("n_hits") * 1_000_000 / F.col("n_truth"))
        .cast("bigint")
        .alias("recall_ppm"),
        F.floor(F.col("n_hits") * 1_000_000 / F.col("n_candidates"))
        .cast("bigint")
        .alias("precision_ppm"),
    )


LSH_RECALL_ORACLE = f"""
WITH {LSH_CAND_CTES},
sizes AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM rep_shingled GROUP BY doc_id
),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM rep_shingled a
  JOIN rep_shingled b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE ROUND(n_common / CAST(sa.n_shingles + sb.n_shingles - n_common
                              AS DOUBLE), 6) >= {VERIFY_JACCARD_THRESHOLD}
  UNION
  SELECT doc_a, doc_b FROM star
),
joined AS (
  SELECT t.doc_a AS ta, c.doc_a AS ca
  FROM truth t
  FULL OUTER JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
)
SELECT
  CAST(COUNT(ta) AS BIGINT) AS n_truth,
  CAST(COUNT(ca) AS BIGINT) AS n_candidates,
  CAST(COUNT(CASE WHEN ta IS NOT NULL AND ca IS NOT NULL THEN 1 END)
    AS BIGINT) AS n_hits,
  CAST(FLOOR(COUNT(CASE WHEN ta IS NOT NULL AND ca IS NOT NULL THEN 1 END)
             * 1000000.0 / COUNT(ta)) AS BIGINT) AS recall_ppm,
  CAST(FLOOR(COUNT(CASE WHEN ta IS NOT NULL AND ca IS NOT NULL THEN 1 END)
             * 1000000.0 / COUNT(ca)) AS BIGINT) AS precision_ppm
FROM joined
"""


SKETCH_BUCKETS = 65536


def bloom_prefilter_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup against a reference corpus with a
    Bloom-style membership pre-filter: even doc_ids are the
    already-ingested reference, odd doc_ids the incoming batch. The
    reference collapses to its DISTINCT 16-bit fingerprint buckets —
    a set that is BOUNDED at 65536 rows no matter the corpus size
    (Spark 4 exposes no user-space `bloom_filter_agg`; a k=1
    bucket-set is the same sketch with the bit array stored as a
    broadcastable relation) — and a broadcast semi-join on the bucket
    discards the vast non-duplicate majority BEFORE any fingerprint
    shuffle; survivors are then EXACTLY verified with a semi-join on
    the full digest. Results are identical to the plain semi-join
    (the sketch has no false negatives; bucket-collision false
    positives die in the verify) — which is what the DuckDB oracle
    computes, so the hash check proves the pruned path preserves
    semantics. Per-source duplicate counts.

    Scale: this is the 100 TB shape for "dedup today's crawl against
    the corpus": the reference is reduced to a ≤65536-row broadcast
    sketch, the probe side never shuffles non-candidates, and the
    exact join only sees the surviving candidate stream. Pruning
    power is measured in tests/test_edge_cases.py.
    """
    docs = load_table(spark, "documents", sf_dir)
    normalized = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    bucket = F.pmod(F.xxhash64("fp"), F.lit(SKETCH_BUCKETS))
    with_fp = docs.select(
        "doc_id", "source", F.md5(normalized.cast("binary")).alias("fp")
    ).withColumn("bucket", bucket)
    ref = with_fp.filter(F.col("doc_id") % 2 == 0)
    probe = with_fp.filter(F.col("doc_id") % 2 == 1)
    sketch = ref.select("bucket").distinct()
    candidates = probe.join(F.broadcast(sketch), "bucket", "left_semi")
    verified = candidates.join(
        ref.select("fp").distinct(), "fp", "left_semi"
    )
    return (
        probe.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_probe"))
        .join(
            verified.groupBy("source").agg(
                F.count(F.lit(1)).alias("n_dup_vs_ref")
            ),
            "source",
            "left",
        )
        .select(
            "source",
            "n_probe",
            F.coalesce("n_dup_vs_ref", F.lit(0)).cast("long").alias("n_dup_vs_ref"),
        )
        .orderBy("source")
    )


BLOOM_PREFILTER_ORACLE = r"""
WITH fps AS (
  SELECT doc_id, source,
    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM documents
),
probe AS (SELECT * FROM fps WHERE doc_id % 2 = 1),
ref AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 2 = 0)
SELECT
  p.source,
  CAST(COUNT(*) AS BIGINT) AS n_probe,
  CAST(SUM(CASE WHEN r.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dup_vs_ref
FROM probe p LEFT JOIN ref r ON p.fp = r.fp
GROUP BY p.source
ORDER BY p.source
"""


def dedup_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-level SURVIVORSHIP — the master-data step after duplicate
    clustering: merge each near-duplicate cluster into one golden
    record where each field follows its own rule (the MDM pattern:
    "longest wins" for content, "first seen wins" for lineage).

    Composes the shared production chain (MinHash → LSH candidates →
    connected components; singletons are their own cluster) and then
    resolves per cluster: representative text = the member with the
    most characters (tie → lowest doc_id), lineage source = the
    lowest-doc_id member, plus member count and total characters. Two
    window ranks over cluster members + one conditional aggregate —
    never a per-field self-join.

    Scale: cluster labels are broadcast-joined onto the corpus scan
    (bounded by duplicate count); the survivorship windows partition
    on the cluster id, whose groups are near-duplicate cluster sizes —
    small by construction. One shuffle on comp.
    """
    from pyspark.sql import Window as W

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "text", "source", "n_chars"
    )
    edges = lsh_candidate_pairs(spark, sf_dir).select("doc_a", "doc_b")
    labels = _connected_components(spark, edges).select(
        F.col("node").alias("doc_id"), "comp"
    )
    members = docs.join(F.broadcast(labels), "doc_id", "left").withColumn(
        "comp", F.coalesce("comp", F.col("doc_id"))
    )
    w_longest = W.partitionBy("comp").orderBy(
        F.col("n_chars").desc_nulls_last(), F.col("doc_id").asc()
    )
    w_first = W.partitionBy("comp").orderBy(F.col("doc_id").asc())
    ranked = members.withColumn(
        "rn_long", F.row_number().over(w_longest)
    ).withColumn("rn_first", F.row_number().over(w_first))
    return (
        ranked.groupBy("comp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.max(F.when(F.col("rn_long") == 1, F.col("doc_id"))).alias(
                "rep_doc_id"
            ),
            F.max(
                F.when(F.col("rn_long") == 1, F.substring("text", 1, 60))
            ).alias("canon_prefix"),
            F.max(F.when(F.col("rn_first") == 1, F.col("source"))).alias(
                "first_source"
            ),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("comp")
    )


GOLDEN_RECORD_ORACLE = _CC_ORACLE_PREFIX + """,
members AS (
  SELECT d.doc_id, d.text, d.source, d.n_chars,
         COALESCE(c.component, d.doc_id) AS comp
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
),
ranked AS (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY comp
      ORDER BY n_chars DESC NULLS LAST, doc_id ASC) AS rn_long,
    ROW_NUMBER() OVER (PARTITION BY comp ORDER BY doc_id ASC) AS rn_first
  FROM members
)
SELECT comp,
  CAST(COUNT(*) AS BIGINT) AS n_members,
  MAX(CASE WHEN rn_long = 1 THEN doc_id END) AS rep_doc_id,
  MAX(CASE WHEN rn_long = 1 THEN substr(text, 1, 60) END) AS canon_prefix,
  MAX(CASE WHEN rn_first = 1 THEN source END) AS first_source,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM ranked
GROUP BY comp
ORDER BY comp
"""


# --- exact repeated-substring spans (ExactSubstr dedup) ---------------------
# The suffix-array dedup shape from "Deduplicating Training Data Makes
# Language Models Better" (Lee et al., ACL 2022): find the exact
# duplicated SPANS themselves, not just near-duplicate documents.
# The whole-document sketches above (MinHash/SimHash) dilute a long
# verbatim block inside an otherwise-unique document; this operator
# recovers it. Reference parity: the reference has no substring-level
# dedup (SURVEY.md §2.2 covers only row-level drops) — this is part of
# the LLM-pipeline extension surface.
#
# Spark-first reformulation of the suffix-array algorithm: a suffix
# array is not distributable, but its OUTPUT — maximal runs of >= K
# tokens occurring more than once across the corpus — is exactly the
# union of K-gram starts whose gram occurs in >= 2 documents, merged
# into islands. That turns the problem into the same inverted-index
# shuffle as MinHash-LSH (group by gram digest), plus a per-document
# gaps-and-islands window — both linear in corpus size, no pairwise
# work anywhere.
SPAN_K = 8  # tokens per gram: spans shorter than K are not reported

# K-token gram digest, computed PER EXPLODED ROW over the exploded
# start index — deliberately NOT as a transform() array column: with
# an array column the Generate's implicit non-empty guard gets pushed
# into the scan filter, where Catalyst re-evaluates the entire
# md5-per-gram transform once in the Filter and again in the Project
# (measured 5.3x slower end-to-end). Exploding the cheap
# sequence(1, n-K+1) first makes the pushed guard integer-only and
# each md5 is computed exactly once. md5 keeps the shuffle key a
# fixed 32 chars regardless of token lengths (at 100 TB you would
# swap in xxhash64 — 8 bytes — but md5 is the cross-engine-identical
# choice the oracle can reproduce).
_SPAN_GRAM_ROW = (
    f"md5(cast(concat_ws(' ', slice(toks, s, {SPAN_K})) as binary))"
)


def _dup_gram_islands(spark: SparkSession, sf_dir: str):
    """Shared stage: (islands, sized) where islands = one row per
    duplicated K-gram start annotated with its per-document island id,
    and sized = (doc_id, toks, n_words) for docs long enough to hold a
    gram.

    Duplicate detection is a single min/max window over the gram
    digest: a gram occurs in >= 2 distinct documents iff
    min(doc_id) != max(doc_id) within its partition — ONE corpus scan
    and ONE shuffle on the digest key, no second scan, no broadcast
    whose size depends on the (unbounded) duplicate-gram count.
    Measured faster than both the count-distinct semi-join (two scans)
    and the min/max-aggregate semi-join at sf0.1 and 10x stress; the
    tradeoff is no map-side combine, so a corpus where one boilerplate
    gram appears in millions of documents would hot-spot its
    partition — for such corpora swap the window for
    groupBy(gram).agg(min, max) + semi-join (partial aggregation
    collapses unique grams map-side), which is plan-equivalent here.

    Islands merge via gaps-and-islands: grams all have length K, so
    coverage is contiguous iff consecutive starts differ by <= K; a
    running sum over the new-span flag labels each maximal run. The
    window partitions on doc_id — per-document group sizes, never a
    global sort.
    """
    from pyspark.sql import Window as W

    docs = spread(load_table(spark, "documents", sf_dir))
    sized = (
        docs.select("doc_id", F.expr(TOKENS).alias("toks"))
        .withColumn("n_words", F.size("toks"))
        .filter(F.col("n_words") >= SPAN_K)
    )
    grams = sized.select(
        "doc_id",
        "n_words",
        "toks",
        F.explode(F.expr(f"sequence(1, n_words - {SPAN_K - 1})")).alias("s"),
    ).select("doc_id", "n_words", "s", F.expr(_SPAN_GRAM_ROW).alias("gram"))
    wg = W.partitionBy("gram")
    hits = (
        grams.withColumn("mn", F.min("doc_id").over(wg))
        .withColumn("mx", F.max("doc_id").over(wg))
        .filter(F.col("mn") != F.col("mx"))
        .select("doc_id", "n_words", "s")
    )
    w = W.partitionBy("doc_id").orderBy("s")
    islands = (
        hits.withColumn(
            "new_span",
            F.when(F.col("s") - F.lag("s").over(w) <= SPAN_K, F.lit(0)).otherwise(
                F.lit(1)
            ),
        )
        .withColumn(
            "island",
            F.sum("new_span").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
    )
    return islands, sized


def substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document report of exact cross-document duplicated spans:
    how many maximal duplicated runs of >= SPAN_K tokens the document
    contains, how many tokens they cover, and the duplicated fraction
    in integer permille.

    Output: (doc_id, n_words, n_dup_spans, dup_words, dup_permille)
    for every document containing at least one duplicated span.

    Scale: one corpus scan → gram explode (n grams per doc), one
    shuffle on the 32-char gram digest, one per-document window.
    Within-document repetition is deliberately out of scope (the
    text_repetition_* family covers it); requiring >= 2 DISTINCT
    documents makes this the cross-document complement.
    """
    islands, _ = _dup_gram_islands(spark, sf_dir)
    spans = islands.groupBy("doc_id", "n_words", "island").agg(
        (F.max("s") - F.min("s") + F.lit(SPAN_K)).alias("span_words")
    )
    return (
        spans.groupBy("doc_id", "n_words")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
            F.sum("span_words").cast("long").alias("dup_words"),
        )
        .withColumn(
            "dup_permille", F.expr("dup_words * 1000 div n_words").cast("long")
        )
        .withColumn("n_words", F.col("n_words").cast("long"))
        .select("doc_id", "n_words", "n_dup_spans", "dup_words", "dup_permille")
        .orderBy("doc_id")
    )


SUBSTRING_SPANS_ORACLE = rf"""
WITH sized AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t,
         len(string_split_regex(trim(text), '\s+')) AS n_words
  FROM documents
  WHERE len(string_split_regex(trim(text), '\s+')) >= {SPAN_K}
),
grams AS (
  SELECT doc_id, n_words, i AS s,
         md5(array_to_string(list_slice(t, i, i + {SPAN_K - 1}), ' ')) AS gram
  FROM (SELECT doc_id, n_words, t,
               unnest(generate_series(1, n_words - {SPAN_K - 1})) AS i
        FROM sized)
),
hits AS (
  SELECT doc_id, n_words, s FROM (
    SELECT doc_id, n_words, s,
      MIN(doc_id) OVER (PARTITION BY gram) AS mn,
      MAX(doc_id) OVER (PARTITION BY gram) AS mx
    FROM grams)
  WHERE mn <> mx
),
flagged AS (
  SELECT doc_id, n_words, s,
    CASE WHEN s - LAG(s) OVER (PARTITION BY doc_id ORDER BY s) <= {SPAN_K}
         THEN 0 ELSE 1 END AS new_span
  FROM hits
),
islands AS (
  SELECT doc_id, n_words, s,
    SUM(new_span) OVER (PARTITION BY doc_id ORDER BY s
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
),
spans AS (
  SELECT doc_id, n_words, island,
         MAX(s) - MIN(s) + {SPAN_K} AS span_words
  FROM islands GROUP BY doc_id, n_words, island
)
SELECT doc_id,
  CAST(n_words AS BIGINT) AS n_words,
  CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
  CAST(SUM(span_words) AS BIGINT) AS dup_words,
  CAST(SUM(span_words) AS BIGINT) * 1000 // n_words AS dup_permille
FROM spans
GROUP BY doc_id, n_words
ORDER BY doc_id
"""


def substring_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup ACTION for :func:`substring_spans`: rewrite every
    document with its cross-document duplicated spans removed —
    Lee et al.'s ExactSubstr-cut applied corpus-wide, keeping the
    surrounding unique prose.

    Output: (doc_id, n_words, kept_words, cleaned_text) for EVERY
    document long enough to hold a gram (untouched documents pass
    through verbatim — row conservation is part of the contract).

    Spans are packed per document as lo*100000+hi bigints (token
    positions; documents are far below 100k tokens, asserted) so the
    position filter is pure integer lambda arithmetic both engines
    evaluate identically — no struct access inside lambdas, which
    DuckDB and Spark parse differently. The rewrite is a narrow
    per-row projection over (toks, spans): no extra shuffle beyond
    the span aggregation itself, and the span list per document is
    bounded by n_words / SPAN_K.
    """
    islands, sized = _dup_gram_islands(spark, sf_dir)
    covered = islands.groupBy("doc_id", "island").agg(
        (F.min("s") * F.lit(100000) + (F.max("s") + F.lit(SPAN_K - 1))).alias(
            "packed"
        )
    )
    packed = covered.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("packed")).alias("spans")
    )
    return (
        sized.join(packed, "doc_id", "left")
        .withColumn(
            "spans",
            F.coalesce("spans", F.expr("cast(array() as array<bigint>)")),
        )
        .withColumn(
            "kept",
            F.expr(
                "filter(sequence(1, n_words), p -> "
                "size(filter(spans, sp -> "
                "p >= sp div 100000 and p <= sp % 100000)) = 0)"
            ),
        )
        .select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            F.size("kept").cast("long").alias("kept_words"),
            F.expr(
                "concat_ws(' ', transform(kept, p -> element_at(toks, p)))"
            ).alias("cleaned_text"),
        )
        .orderBy("doc_id")
    )


SUBSTRING_SCRUB_ORACLE = rf"""
WITH sized AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t,
         len(string_split_regex(trim(text), '\s+')) AS n_words
  FROM documents
  WHERE len(string_split_regex(trim(text), '\s+')) >= {SPAN_K}
),
grams AS (
  SELECT doc_id, n_words, i AS s,
         md5(array_to_string(list_slice(t, i, i + {SPAN_K - 1}), ' ')) AS gram
  FROM (SELECT doc_id, n_words, t,
               unnest(generate_series(1, n_words - {SPAN_K - 1})) AS i
        FROM sized)
),
hits AS (
  SELECT doc_id, s FROM (
    SELECT doc_id, s,
      MIN(doc_id) OVER (PARTITION BY gram) AS mn,
      MAX(doc_id) OVER (PARTITION BY gram) AS mx
    FROM grams)
  WHERE mn <> mx
),
flagged AS (
  SELECT doc_id, s,
    CASE WHEN s - LAG(s) OVER (PARTITION BY doc_id ORDER BY s) <= {SPAN_K}
         THEN 0 ELSE 1 END AS new_span
  FROM hits
),
islands AS (
  SELECT doc_id, s,
    SUM(new_span) OVER (PARTITION BY doc_id ORDER BY s
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
),
covered AS (
  SELECT doc_id, island,
         MIN(s) * 100000 + (MAX(s) + {SPAN_K - 1}) AS packed
  FROM islands GROUP BY doc_id, island
),
packed AS (
  SELECT doc_id, list_sort(list(packed)) AS spans FROM covered GROUP BY doc_id
),
kept AS (
  SELECT d.doc_id, d.n_words, d.t,
    list_filter(generate_series(1, d.n_words), p ->
      len(list_filter(COALESCE(p2.spans, CAST([] AS BIGINT[])), sp ->
        p >= sp // 100000 AND p <= sp % 100000)) = 0) AS kept
  FROM sized d LEFT JOIN packed p2 USING (doc_id)
)
SELECT doc_id,
  CAST(n_words AS BIGINT) AS n_words,
  CAST(len(kept) AS BIGINT) AS kept_words,
  COALESCE(array_to_string(list_transform(kept, p -> t[p]), ' '), '')
    AS cleaned_text
FROM kept
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Packed k-hash Bloom BITMAP for incremental dedup — round 11. The
# sibling `bloom_prefilter_dedup` above is the k=1 bucket-SET variant
# (sketch stored as a 65,536-row relation); this one is the real
# article: a k=4 Bloom with the bit array packed 63 bits/word via
# bit_or (so the same-capacity broadcast is ~500x smaller rows-wise),
# sized FROM the corpus (16 bits per history digest), and
# self-certifying — exact zero-false-negative proof + measured FPR. The 100-TB shape this demonstrates: dedup a NEW crawl
# against the historical corpus's digest set WITHOUT joining the new
# data to petabytes of history — build a bitmap over the historical
# digests once (16 bits/digest here), broadcast it, and probe each
# new digest with k=4 md5-derived positions. Definitely-fresh rows
# (any bit absent) skip the expensive verification entirely; only the
# "maybe" set (true dups + the measured false-positive tail) goes to
# the exact digest join. Bloom guarantee: ZERO false negatives — a
# certificate the entry computes exactly, per run, on its own data.
# ---------------------------------------------------------------------------

BLOOM_K = 4                # hash functions per digest
BLOOM_BITS_PER_KEY = 16    # m/n; with k=4 gives FPR ~ (1-e^-k/16)^4 ~ 0.24%
# 63 usable bits per word: keeps every shifted bit out of the int64
# sign position so `1 << bit` and bit_or behave identically in Spark
# and DuckDB (DuckDB's BIGINT << errors on signed overflow)
BLOOM_WORD_BITS = 63

# the corpus split: "history" vs "new crawl" — the sampling module's
# content-addressed md5 bucket over doc_id (never rand())
BLOOM_BASE_PCT = 80
_B_BUCKET = "conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) % 100"
_B_BUCKET_SQL = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 100"


def _bloom_pos(h_col: str, i: int) -> str:
    """Position i of digest column ``h_col``: first 32 md5 bits of
    ``digest#i``, mod the (data-derived) bit count — Spark SQL text;
    the oracle mirrors it with the '0x' hex-parse idiom."""
    return (
        f"conv(substring(md5(concat({h_col}, '#{i}')), 1, 8), 16, 10)"
        f" % {{bits}}"
    )


def bloom_bitmap_certify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-dedup Bloom pre-filter with exact self-certification.

    Pipeline (all exact integer arithmetic, no RNG, no pinned
    literals — the oracle recomputes EVERYTHING from the same md5
    math):

    1. SPLIT: history = md5-bucket(doc_id) < 80, crawl = rest (the
       repo's content-addressed split discipline).
    2. SIZE: bits = 16 bits per distinct history digest, rounded up
       to whole 63-bit words — Bloom sizing is corpus-derived, the
       way a real pipeline sizes m from |history|.
    3. BUILD: each distinct history digest sets k=4 positions
       (md5(digest#i) mod bits); positions pack into words via
       ``bit_or(1 << bit)`` — the bitmap is |words| rows of int64,
       i.e. ~2 bytes/digest, broadcastable where the digest set is
       not.
    4. PROBE: each distinct crawl digest checks its 4 positions
       against the broadcast bitmap; flagged = all 4 bits set.
    5. CERTIFY, exactly: ``n_false_neg`` (flagged-missed true dups)
       must be 0 — the Bloom guarantee, recomputed on this corpus,
       not assumed — and ``n_false_pos`` is the measured cost of the
       bitmap's compression (oracle recomputes both from the same
       split + hash arithmetic).

    Scale: the build is one scan of history digests + a words-wide
    bit_or aggregate (map-side combinable); the bitmap broadcast is
    bits/8 bytes (2 GB per 10^12 digests at 16 bits/key — shard the
    word space or raise bits/key as |history| grows); the probe is
    one scan of the crawl with a broadcast join on word id — the new
    data never shuffles against history, which is the entire point at
    100 TB. The "maybe" set then feeds the family's exact digest join
    at |true dups| + 0.24%·|fresh| rows instead of |crawl|.
    """
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    hashed = docs.select(
        F.col("doc_id"), F.md5(F.col("text")).alias("h"),
        F.expr(_B_BUCKET).alias("bkt"),
    )
    base_h = hashed.filter(F.col("bkt") < BLOOM_BASE_PCT).select("h").distinct()
    delta_h = hashed.filter(F.col("bkt") >= BLOOM_BASE_PCT).select("h").distinct()

    n_base = base_h.count()
    n_words = (BLOOM_BITS_PER_KEY * n_base + BLOOM_WORD_BITS - 1) // BLOOM_WORD_BITS
    n_words = max(n_words, 1)
    bits = n_words * BLOOM_WORD_BITS

    def positions(df):
        pos = F.explode(
            F.array(
                *[
                    F.expr(_bloom_pos("h", i).format(bits=bits)).cast("long")
                    for i in range(BLOOM_K)
                ]
            )
        ).alias("p")
        return df.select("h", pos).select(
            "h",
            (F.col("p") / BLOOM_WORD_BITS).cast("long").alias("word"),
            (F.col("p") % BLOOM_WORD_BITS).cast("long").alias("bit"),
        )

    bitmap = (
        positions(base_h)
        .groupBy("word")
        .agg(
            F.bit_or(
                F.expr("shiftleft(cast(1 as bigint), cast(bit as int))")
            ).alias("wval")
        )
    )
    probe = (
        positions(delta_h)
        .join(F.broadcast(bitmap), "word", "left")
        .withColumn(
            "hit",
            F.expr(
                "cast(shiftright(coalesce(wval, cast(0 as bigint)),"
                " cast(bit as int)) % 2 as long)"
            ),
        )
        .groupBy("h")
        .agg((F.sum("hit") == BLOOM_K).cast("long").alias("flagged"))
    )
    truth = probe.join(
        base_h.withColumn("in_base", F.lit(1)).withColumnRenamed("h", "h"),
        "h",
        "left",
    ).withColumn("in_base", F.coalesce(F.col("in_base"), F.lit(0)))
    bits_set = bitmap.select(
        F.sum(F.bit_count("wval")).cast("long").alias("s")
    ).collect()[0]["s"] or 0
    agg = truth.agg(
        F.count(F.lit(1)).cast("long").alias("n_delta_digests"),
        F.sum("in_base").cast("long").alias("n_true_dup"),
        F.sum("flagged").cast("long").alias("n_flagged"),
        F.sum(((F.col("in_base") == 1) & (F.col("flagged") == 0)).cast("long"))
        .cast("long")
        .alias("n_false_neg"),
        F.sum(((F.col("in_base") == 0) & (F.col("flagged") == 1)).cast("long"))
        .cast("long")
        .alias("n_false_pos"),
    )
    return agg.select(
        F.lit(n_base).cast("long").alias("n_base_digests"),
        "n_delta_digests",
        F.lit(n_words).cast("long").alias("bloom_words"),
        F.lit(int(bits_set)).cast("long").alias("bits_set"),
        "n_true_dup",
        "n_flagged",
        "n_false_neg",
        (F.col("n_false_neg") == 0).alias("zero_false_negatives"),
        "n_false_pos",
    )


def _bloom_bitmap_oracle() -> str:
    # positions are computed over the DEDUPED digest union: a digest
    # present in BOTH corpora must contribute exactly BLOOM_K position
    # rows (the probe tests SUM(hit) = K), not K per side
    pos_terms = " UNION ALL ".join(
        "SELECT h, CAST('0x' || substr(md5(h || '#%d'), 1, 8) AS BIGINT)"
        " %% (SELECT bits FROM sz) AS p FROM all_h" % i
        for i in range(BLOOM_K)
    )
    return f"""
WITH hashed AS (
  SELECT doc_id, md5(text) AS h, {_B_BUCKET_SQL} AS bkt FROM documents
),
base_h AS (SELECT DISTINCT h FROM hashed WHERE bkt < {BLOOM_BASE_PCT}),
delta_h AS (SELECT DISTINCT h FROM hashed WHERE bkt >= {BLOOM_BASE_PCT}),
all_h AS (SELECT h FROM base_h UNION SELECT h FROM delta_h),
sz AS (
  SELECT GREATEST(
           ({BLOOM_BITS_PER_KEY} * (SELECT COUNT(*) FROM base_h)
            + {BLOOM_WORD_BITS - 1}) // {BLOOM_WORD_BITS}, 1) AS n_words,
         GREATEST(
           ({BLOOM_BITS_PER_KEY} * (SELECT COUNT(*) FROM base_h)
            + {BLOOM_WORD_BITS - 1}) // {BLOOM_WORD_BITS}, 1)
           * {BLOOM_WORD_BITS} AS bits
),
allpos AS ({pos_terms}),
basepos AS (
  SELECT h, p // {BLOOM_WORD_BITS} AS word, p % {BLOOM_WORD_BITS} AS bit
  FROM allpos WHERE h IN (SELECT h FROM base_h)
),
bitmap AS (
  SELECT word, bit_or(CAST(1 AS BIGINT) << CAST(bit AS INTEGER)) AS wval
  FROM (SELECT DISTINCT word, bit FROM basepos) GROUP BY word
),
deltapos AS (
  SELECT h, p // {BLOOM_WORD_BITS} AS word, p % {BLOOM_WORD_BITS} AS bit
  FROM allpos WHERE h IN (SELECT h FROM delta_h)
),
probe AS (
  SELECT d.h,
    CASE WHEN SUM(
      (COALESCE(b.wval, 0) >> CAST(d.bit AS INTEGER)) % 2
    ) = {BLOOM_K} THEN 1 ELSE 0 END AS flagged
  FROM deltapos d LEFT JOIN bitmap b USING (word)
  GROUP BY d.h
),
truth AS (
  SELECT p.h, p.flagged,
    CASE WHEN p.h IN (SELECT h FROM base_h) THEN 1 ELSE 0 END AS in_base
  FROM probe p
)
SELECT
  CAST((SELECT COUNT(*) FROM base_h) AS BIGINT) AS n_base_digests,
  CAST(COUNT(*) AS BIGINT) AS n_delta_digests,
  CAST((SELECT n_words FROM sz) AS BIGINT) AS bloom_words,
  CAST((SELECT SUM(bit_count(wval)) FROM bitmap) AS BIGINT) AS bits_set,
  CAST(SUM(in_base) AS BIGINT) AS n_true_dup,
  CAST(SUM(flagged) AS BIGINT) AS n_flagged,
  CAST(SUM(CASE WHEN in_base = 1 AND flagged = 0 THEN 1 ELSE 0 END)
    AS BIGINT) AS n_false_neg,
  SUM(CASE WHEN in_base = 1 AND flagged = 0 THEN 1 ELSE 0 END) = 0
    AS zero_false_negatives,
  CAST(SUM(CASE WHEN in_base = 0 AND flagged = 1 THEN 1 ELSE 0 END)
    AS BIGINT) AS n_false_pos
FROM truth
"""


BLOOM_BITMAP_ORACLE = _bloom_bitmap_oracle()
