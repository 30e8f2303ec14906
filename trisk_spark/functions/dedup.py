"""Deduplication over ``documents``: exact, bag-of-words, MinHash+LSH,
and n-gram Jaccard near-dup detection. All JVM-side DataFrame
expressions with exact DuckDB oracles (both engines share md5, so hash
functions agree bit-for-bit).

Scale design (100 TB corpora):
  * exact/bag dedup: one shuffle on the content hash — the canonical
    map-side-combine groupBy.
  * MinHash+LSH: per-doc signature is a single grouped aggregate over
    exploded shingles (no perm-row explosion: P min-aggregates per
    shingle row); candidate generation is a self-join on (band,
    band_hash) buckets — at scale, bucket sizes are bounded (hot-bucket
    cap) so the join can't quadratically blow up.
  * Jaccard verify runs only on candidate pairs, never all pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from trisk_spark.catalog import table
from trisk_spark.registry import register

# ------------------------------------------------------- exact dedup --

DEDUP_EXACT_SQL = """
SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
"""


@register("dedup_exact", oracle=DEDUP_EXACT_SQL)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content md5, keep lowest doc_id.
    One shuffle; at 100 TB, hash first so the shuffle moves 32-byte keys
    instead of document bodies."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies")
    )


DEDUP_BAG_SQL = """
SELECT bag_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM (
  SELECT doc_id,
    md5(array_to_string(list_sort(list_distinct(
      list_filter(string_split(lower(text), ' '), w -> w <> ''))), ' ')) AS bag_hash
  FROM documents
)
GROUP BY bag_hash
HAVING COUNT(*) > 1
"""


@register("dedup_bag", oracle=DEDUP_BAG_SQL)
def dedup_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-reorder-invariant dedup: identical sorted-distinct word bags.
    Catches shuffled near-copies exact md5 misses."""
    docs = table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    return (
        docs.select(
            "doc_id",
            F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(ws)))).alias(
                "bag_hash"
            ),
        )
        .groupBy("bag_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .where(F.col("n_copies") > 1)
    )


# ------------------------------------------------------ shingling ----

SHINGLE_K = 5  # words per shingle

# DuckDB: distinct k-shingles per doc.
SHINGLES_SQL = f"""
SELECT DISTINCT doc_id,
  unnest(list_transform(range(1, greatest(len(ws) - {SHINGLE_K - 1}, 0) + 1),
         i -> array_to_string(list_slice(ws, i, i + {SHINGLE_K - 1}), ' '))) AS shingle
FROM (SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
      FROM documents)
"""


def shingles(docs: DataFrame, distinct: bool = True) -> DataFrame:
    """k-word shingles per doc (Spark mirror of SHINGLES_SQL).

    ``distinct=False`` skips the dedup shuffle for consumers whose
    aggregate is duplicate-insensitive (MIN for minhash) — same result,
    one less exchange."""
    ws = F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(ws) - (SHINGLE_K - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(ws, i, SHINGLE_K)),
    )
    out = docs.select("doc_id", F.explode(sh).alias("shingle"))
    return out.distinct() if distinct else out


# --------------------------------------------------- MinHash + LSH ---

N_PERMS = 12
N_BANDS = 3
ROWS_PER_BAND = N_PERMS // N_BANDS


def _perm_hash_sql(i: int) -> str:
    return f"MIN(md5(CONCAT('{i}|', shingle)))"


def _perm_hash(i: int) -> Column:
    return F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle"))))


_SIG_COLS_SQL = ",\n  ".join(f"{_perm_hash_sql(i)} AS h{i}" for i in range(N_PERMS))
_BAND_COLS_SQL = ",\n  ".join(
    "md5(CONCAT("
    + ", '|', ".join(f"h{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
    + f")) AS band{b}"
    for b in range(N_BANDS)
)

MINHASH_SIGNATURES_SQL = f"""
WITH sh AS ({SHINGLES_SQL})
SELECT doc_id, {_SIG_COLS_SQL}
FROM sh GROUP BY doc_id
"""

MINHASH_LSH_PAIRS_SQL = f"""
WITH sh AS ({SHINGLES_SQL}),
sig AS (SELECT doc_id, {_SIG_COLS_SQL} FROM sh GROUP BY doc_id),
bands AS (SELECT doc_id, {_BAND_COLS_SQL} FROM sig),
cand AS (
  {" UNION ALL ".join(
    f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a JOIN bands b "
    f"ON a.band{b} = b.band{b} AND a.doc_id < b.doc_id"
    for b in range(N_BANDS)
  )}
)
SELECT DISTINCT doc_a, doc_b FROM cand
"""


def minhash_signatures(docs: DataFrame) -> DataFrame:
    # MIN is duplicate-insensitive → no distinct pass over the shingles.
    sh = shingles(docs, distinct=False)
    return sh.groupBy("doc_id").agg(
        *[_perm_hash(i).alias(f"h{i}") for i in range(N_PERMS)]
    )


@register("dedup_minhash_lsh", oracle=MINHASH_LSH_PAIRS_SQL)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs: 5-word shingles → 12 md5
    min-hashes → 3 bands of 4 → same-bucket join.

    Plan: shingle explode + one grouped aggregate for signatures; the
    candidate join shuffles 3 band-hash columns, never document text.
    """
    docs = table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs)
    # Long form: one (doc_id, band_idx, band_hash) row per band, ONE
    # self-join on (band_idx, hash). Both join sides are identical
    # subplans, so ReuseExchange computes the signature pipeline once
    # (the wide form ran it 2 x N_BANDS times).
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    f"h{b * ROWS_PER_BAND + r}"
                                    for r in range(ROWS_PER_BAND)
                                ],
                            )
                        ).alias("bh"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.bh")
    # Alias self-join: both sides are the SAME plan subtree, so the
    # exchange (and the whole signature pipeline under it) is computed
    # once and reused for the other side.
    return (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


# NOTE: DuckDB's md5(CONCAT(...)) of band member hashes must concatenate
# in the same order as Spark's concat_ws — both use h_{4b}..h_{4b+3}; the
# SQL uses CONCAT(h0, '|', h1, ...) to match concat_ws('|', ...).

# ------------------------------------------------------- SimHash ----

SIMHASH_BITS = 60  # 15 md5 hex chars → fits signed BIGINT
SIMHASH_BANDS = 4
BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
HAMMING_MAX = 4  # template-generated corpus: fingerprints correlate heavily


def _simhash_digit_sql(d: int) -> str:
    return f"strpos('0123456789abcdef', substr(h, {d + 1}, 1)) - 1"


def _simhash_bitsum_sql(j: int) -> str:
    d, shift = j // 4, 3 - (j % 4)
    return f"SUM(2 * ((d{d} >> {shift}) & 1) - 1) AS s{j}"


_SIMHASH_FP_SQL = " + ".join(
    f"(CASE WHEN s{j} >= 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
    for j in range(SIMHASH_BITS)
)

SIMHASH_FP_SQL = f"""
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(list_filter(string_split(lower(text), ' '),
                                 w -> w <> '')) AS tok
  FROM documents
),
hx AS (SELECT doc_id, substr(md5(tok), 1, {SIMHASH_BITS // 4}) AS h FROM toks),
digits AS (
  SELECT doc_id,
    {", ".join(f"{_simhash_digit_sql(d)} AS d{d}" for d in range(SIMHASH_BITS // 4))}
  FROM hx
),
bitsums AS (
  SELECT doc_id, {", ".join(_simhash_bitsum_sql(j) for j in range(SIMHASH_BITS))}
  FROM digits GROUP BY doc_id
)
SELECT doc_id, {_SIMHASH_FP_SQL} AS fp FROM bitsums
"""

SIMHASH_PAIRS_SQL = f"""
WITH fps AS ({SIMHASH_FP_SQL}),
bands AS (
  SELECT doc_id, fp,
    {", ".join(f"(fp >> {BAND_BITS * b}) & {(1 << BAND_BITS) - 1} AS band{b}"
               for b in range(SIMHASH_BANDS))}
  FROM fps
),
cand AS (
  {" UNION ".join(
    f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.fp AS fa, b.fp AS fb "
    f"FROM bands a JOIN bands b ON a.band{b} = b.band{b} AND a.doc_id < b.doc_id"
    for b in range(SIMHASH_BANDS)
  )}
)
SELECT doc_a, doc_b, CAST(bit_count(xor(fa, fb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(fa, fb)) <= {HAMMING_MAX}
"""


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    """60-bit SimHash per doc: each distinct token votes ±1 per bit
    (bit j of md5(token)); fingerprint bit = sign of the vote sum.
    One explode + one grouped aggregate (60 map-side-combined SUMs) —
    the same shuffle shape as a word count, so it scales like one."""
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(
            F.filter(F.split(F.lower("text"), " "), lambda w: w != "")
        )).alias("tok"),
    )
    h = F.substring(F.md5("tok"), 1, SIMHASH_BITS // 4)
    digits = toks.select(
        "doc_id",
        *[
            (F.conv(F.substring(h, d + 1, 1), 16, 10).cast("int")).alias(f"d{d}")
            for d in range(SIMHASH_BITS // 4)
        ],
    )
    bitsums = digits.groupBy("doc_id").agg(
        *[
            F.sum(
                F.shiftright(F.col(f"d{j // 4}"), 3 - (j % 4)).bitwiseAND(F.lit(1))
                * 2
                - 1
            ).alias(f"s{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    fp = F.lit(0).cast("bigint")
    for j in range(SIMHASH_BITS):
        fp = fp + F.when(
            F.col(f"s{j}") >= 0, F.lit(1 << j).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return bitsums.select("doc_id", fp.alias("fp"))


@register("dedup_simhash", oracle=SIMHASH_PAIRS_SQL)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 60-bit fingerprints, 4 bands of 15 bits
    for candidate blocking, Hamming-distance verify (≤ HAMMING_MAX).

    Plan: fingerprinting is one shuffle (8-byte keys); the candidate
    join shuffles 15-bit band values, never text; verification is a
    codegen'd bit_count on the pair — the Manku-et-al. design with the
    permuted-table sweep replaced by band blocking.
    """
    docs = table(spark, sf_dir, "documents")
    fps = simhash_fingerprints(docs)
    # Long form (see dedup_minhash_lsh): one self-join on (band_idx,
    # band value) instead of one join per band → ReuseExchange computes
    # the fingerprint pipeline once.
    bands = fps.select(
        "doc_id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftright(F.col("fp"), BAND_BITS * b)
                        .bitwiseAND(F.lit((1 << BAND_BITS) - 1))
                        .alias("bv"),
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "fp", "band.band_idx", "band.bv")
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.fp").alias("fa"),
            F.col("b.fp").alias("fb"),
        )
        .distinct()
        .where(ham <= HAMMING_MAX)
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
    )


# ------------------------------------------------- n-gram Jaccard ----

JACCARD_THRESHOLD = 0.5

NGRAM_JACCARD_SQL = f"""
WITH sh AS ({SHINGLES_SQL}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
  CAST(ROUND(CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared), 4) AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared) >= {JACCARD_THRESHOLD}
"""


@register("ngram_jaccard", oracle=NGRAM_JACCARD_SQL)
def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle,
    thresholded at 0.5.

    Plan: shared-shingle self-join (bounded: shingle doc-frequency is
    low; at scale, drop hot shingles first — the standard stopword-
    shingle cut), then two broadcast joins against per-doc sizes.
    """
    docs = table(spark, sf_dir, "documents")
    sh = shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("n_shared").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_shared")
    )
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .where(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )
