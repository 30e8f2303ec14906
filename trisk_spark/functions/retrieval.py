"""Hybrid retrieval: reciprocal-rank fusion of the repo's two
retrieval families — BM25 lexical ranking (``text.bm25_pair_scores``)
and exact dense cosine top-k (``similarity.knn_bruteforce``) — in a
single "more-like-this" query: for each probe document (doc_id <
N_PROBES, the ANN probe convention; vec_id IS the document id per the
``dedup_semantic`` contract), the lexical query is the probe's own
top-KEYWORDS_K distinctive terms (the ``keyword_extract`` formula) and
the dense query is the probe's embedding. The two rankings fuse by
RRF (Cormack, Clarke & Buettcher 2009): score = Σ_sides 1/(C + rank),
C = 60 — the standard hybrid-search composition every modern retrieval
stack (lexical + vector) runs, absent from both families alone.

Determinism: both side-rankings are already cross-engine exact (the
BM25 DECIMAL-sum discipline and the knn rounded-cosine order are each
driver-hash-pinned); the fusion adds two IEEE divisions and one
addition in a fixed order, closed with the house ROUND(·, 6). Ranks
are ints, so ties everywhere break on doc_id.

Scale shape (100 TB):
  * probe keywords: the corpus (doc, token) tf shuffle is the
    ``keyword_extract`` df asset (write-once at scale); the ranking
    window itself runs on the PROBE-FILTERED tf rows only, and the
    keyword set crosses the driver as ≤ N_PROBES × KEYWORDS_K strings
    — the routing-decision collect class;
  * lexical scoring: the collected keyword set becomes the IN-ROW
    literal token filter BEFORE the explode (the ``bm25_top_docs``
    scale trick, preserved through the parameterized
    ``bm25_pair_scores``), so the scoring shuffle is hits-sized, never
    corpus-sized; df / corpus stats reach the scoring rows by
    broadcast;
  * dense scoring: the probe matrix is a driver-held broadcast model
    and the corpus is scanned once through the exact int64 GEMM kernel
    (``knn_bruteforce`` — map-side, zero shuffle before the top-k);
  * fusion: both sides are ≤ N_PROBES × side-k id/rank rows — the
    full-outer join and final rank are constant-size regardless of
    corpus size.

Reference: the reference's retrieval surface is dense-only
(beyond-reference mandate, SURVEY.md §7 step 7); BM25 and RRF follow
the published formulas cited above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from trisk_spark.catalog import table
from trisk_spark.functions.similarity import (
    N_PROBES,
    TOP_K,
    _DOT_SQL,
    _SCALED_SQL,
    _VALID_EMB_SQL,
    knn_bruteforce,
)
from trisk_spark.functions.text import (
    KEYWORDS_K,
    _kw_tf_df_n,
    bm25_pair_scores,
)

#: RRF smoothing constant (the value the original paper fixed and
#: every production hybrid stack defaults to)
RRF_C = 60
#: per-side ranking depth feeding the fusion (dense side = the pinned
#: knn TOP_K; lexical side ranked to the same depth)
LEX_SIDE_K = TOP_K
#: fused results kept per probe
HYBRID_TOP_K = 10


def probe_keywords(spark: SparkSession, sf_dir: str) -> list:
    """The probe documents' top-KEYWORDS_K distinctive terms as driver
    rows (doc_id, tok) — ≤ N_PROBES × KEYWORDS_K of them (the
    routing-decision collect class). Exactly ``keyword_extract``'s
    score (tf × n_docs / df over the corpus-wide df/n) and tie-break,
    but the ranking window runs on the probe-filtered tf rows only —
    at scale the window is probe-sized while df/n stay the shared
    corpus asset."""
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())
    tf, df, n = _kw_tf_df_n(docs)
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "tok")
    kw = (
        tf.where(F.col("doc_id") < N_PROBES)
        .join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf").cast("double") * F.col("n_docs") / F.col("df"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= KEYWORDS_K)
        .select("doc_id", "tok")
    )
    return kw.collect()


def hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid more-like-this: RRF-fuse each probe document's BM25
    keyword ranking with its exact dense cosine ranking. Returns
    (query_id, doc_id, lex_rank, sem_rank, rrf_score, fused_rank ≤
    HYBRID_TOP_K); a doc ranked by only one side carries a NULL rank
    on the other and its RRF term is 0 there (COALESCE, both engines).
    The probe document itself is excluded from both sides. LIBRARY op:
    full DuckDB oracle (``HYBRID_RETRIEVAL_SQL`` re-derives keywords,
    BM25, knn, and the fusion from the raw tables); R16 seat queue."""
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id").isNotNull())

    sem = knn_bruteforce(spark, sf_dir).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("sem_rank"),
    )

    rows = probe_keywords(spark, sf_dir)
    if rows:
        qterms = spark.createDataFrame(
            [(int(r.doc_id), r.tok) for r in rows],
            "query_id bigint, term string",
        )
        seed_terms = sorted({r.tok for r in rows})
        pair = bm25_pair_scores(spark, docs, qterms, seed_terms).where(
            F.col("doc_id") != F.col("query_id")
        )
        wl = Window.partitionBy("query_id").orderBy(F.desc("s"), "doc_id")
        lex = (
            pair.withColumn("lex_rank", F.row_number().over(wl))
            .where(F.col("lex_rank") <= LEX_SIDE_K)
            .select("query_id", "doc_id", "lex_rank")
        )
    else:  # every probe doc empty/stopword-free: dense-only fusion
        lex = spark.createDataFrame(
            [], "query_id bigint, doc_id bigint, lex_rank int"
        )

    fused = lex.join(sem, ["query_id", "doc_id"], "full_outer")
    rrf = F.round(
        F.coalesce(
            F.lit(1.0) / (F.lit(RRF_C) + F.col("lex_rank")), F.lit(0.0)
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(RRF_C) + F.col("sem_rank")), F.lit(0.0)
        ),
        6,
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), "doc_id")
    return (
        fused.withColumn("rrf_score", rrf)
        .withColumn("fused_rank", F.row_number().over(wf).cast("int"))
        .where(F.col("fused_rank") <= HYBRID_TOP_K)
        .select(
            "query_id",
            "doc_id",
            F.col("lex_rank").cast("int").alias("lex_rank"),
            F.col("sem_rank").cast("int").alias("sem_rank"),
            F.col("rrf_score").cast("double").alias("rrf_score"),
            "fused_rank",
        )
    )


HYBRID_RETRIEVAL_SQL = f"""
WITH hbase AS (
  SELECT doc_id,
    list_filter(string_split(lower(coalesce(text, '')), ' '), w -> w <> '') AS t
  FROM documents WHERE doc_id IS NOT NULL
),
ktf AS (
  SELECT doc_id, tok, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS tok FROM hbase)
  GROUP BY doc_id, tok
),
kdf AS (SELECT tok, COUNT(*) AS df FROM ktf GROUP BY tok),
kn AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM ktf),
kw AS (
  SELECT doc_id AS query_id, token FROM (
    SELECT ktf.doc_id, ktf.tok AS token,
      ROW_NUMBER() OVER (PARTITION BY ktf.doc_id
        ORDER BY CAST(ktf.tf AS DOUBLE) * kn.n_docs / kdf.df DESC, ktf.tok)
        AS rnk
    FROM ktf JOIN kdf ON ktf.tok = kdf.tok CROSS JOIN kn
    WHERE ktf.doc_id < {N_PROBES}
  ) WHERE rnk <= {KEYWORDS_K}
),
stats AS (SELECT COUNT(*) AS n_docs, SUM(len(t)) AS total_len FROM hbase),
btoks AS (SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM hbase),
btf AS (
  SELECT doc_id, term, dl, COUNT(*) AS tf FROM btoks
  WHERE term IN (SELECT DISTINCT token FROM kw)
  GROUP BY doc_id, term, dl
),
bdf AS (SELECT term, COUNT(*) AS df FROM btf GROUP BY term),
bscored AS (
  SELECT k.query_id, btf.doc_id,
    CAST(ROUND(
      LN(CAST(2 * s.n_docs + 2 AS DOUBLE) / CAST(2 * bdf.df + 1 AS DOUBLE))
      * (CAST(44 * btf.tf * s.total_len AS DOUBLE)
         / CAST(20 * btf.tf * s.total_len + 6 * s.total_len
                + 18 * btf.dl * s.n_docs AS DOUBLE)), 6)
      AS DECIMAL(18, 6)) AS contrib
  FROM btf
  JOIN bdf ON btf.term = bdf.term
  JOIN kw k ON btf.term = k.token
  CROSS JOIN stats s
  WHERE btf.doc_id <> k.query_id
),
bpair AS (
  SELECT query_id, doc_id, SUM(contrib) AS s
  FROM bscored GROUP BY query_id, doc_id
),
lex AS (
  SELECT query_id, doc_id, lex_rank FROM (
    SELECT query_id, doc_id,
      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id)
        AS lex_rank
    FROM bpair
  ) WHERE lex_rank <= {LEX_SIDE_K}
),
ssc AS (
  SELECT vec_id, {_SCALED_SQL.format(col="embedding")} AS vec
  FROM {_VALID_EMB_SQL} embeddings
),
sn AS (
  SELECT * FROM (
    SELECT vec_id, vec, {_DOT_SQL.format(a="vec", b="vec")} AS norm FROM ssc
  ) WHERE norm > 0
),
sq AS (SELECT vec_id AS query_id, vec AS qvec, norm AS qnorm FROM sn
       WHERE vec_id < {N_PROBES}),
spairs AS (
  SELECT sq.query_id, sn.vec_id AS doc_id,
    CAST(ROUND(CAST({_DOT_SQL.format(a="qvec", b="vec")} AS DOUBLE)
         / (SQRT(CAST(qnorm AS DOUBLE)) * SQRT(CAST(norm AS DOUBLE))), 6)
      AS DOUBLE) AS cosine_sim
  FROM sq CROSS JOIN sn WHERE sq.query_id <> sn.vec_id
),
sem AS (
  SELECT query_id, doc_id, sem_rank FROM (
    SELECT query_id, doc_id,
      ROW_NUMBER() OVER (PARTITION BY query_id
                         ORDER BY cosine_sim DESC, doc_id) AS sem_rank
    FROM spairs
  ) WHERE sem_rank <= {TOP_K}
),
fused AS (
  SELECT COALESCE(l.query_id, m.query_id) AS query_id,
         COALESCE(l.doc_id, m.doc_id) AS doc_id,
         l.lex_rank, m.sem_rank,
    CAST(ROUND(
      COALESCE(CAST(1 AS DOUBLE) / ({RRF_C} + l.lex_rank), 0)
      + COALESCE(CAST(1 AS DOUBLE) / ({RRF_C} + m.sem_rank), 0), 6)
      AS DOUBLE) AS rrf_score
  FROM lex l FULL OUTER JOIN sem m
    ON l.query_id = m.query_id AND l.doc_id = m.doc_id
)
SELECT query_id, doc_id,
  CAST(lex_rank AS INT) AS lex_rank, CAST(sem_rank AS INT) AS sem_rank,
  rrf_score, CAST(fr AS INT) AS fused_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY rrf_score DESC, doc_id) AS fr
  FROM fused
) WHERE fr <= {HYBRID_TOP_K}
"""
