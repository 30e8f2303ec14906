"""hybrid_retrieval: RRF arithmetic, self-exclusion, fixture-pinned
both-sides fusion, and the probe-keyword plan shape. Cross-engine
value parity at sf0.001 lives in test_oracle_parity's library pass."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

from trisk_spark.functions.retrieval import (
    HYBRID_RETRIEVAL_SQL,
    HYBRID_TOP_K,
    LEX_SIDE_K,
    RRF_C,
    hybrid_retrieval,
    probe_keywords,
)
from trisk_spark.functions.similarity import N_PROBES, TOP_K

from .conftest import SF_DIR, assert_matches_oracle


def _rows(spark, sf_dir=SF_DIR):
    return hybrid_retrieval(spark, sf_dir).collect()


def test_rrf_arithmetic_and_bounds(spark):
    rows = _rows(spark)
    assert rows
    for r in rows:
        assert r.lex_rank is not None or r.sem_rank is not None
        lex = 1.0 / (RRF_C + r.lex_rank) if r.lex_rank is not None else 0.0
        sem = 1.0 / (RRF_C + r.sem_rank) if r.sem_rank is not None else 0.0
        assert r.rrf_score == round(lex + sem, 6)
        assert 1 <= r.fused_rank <= HYBRID_TOP_K
        assert r.lex_rank is None or 1 <= r.lex_rank <= LEX_SIDE_K
        assert r.sem_rank is None or 1 <= r.sem_rank <= TOP_K
        assert r.doc_id != r.query_id  # self excluded on both sides
        assert r.query_id < N_PROBES


def test_fused_rank_orders_by_score(spark):
    rows = _rows(spark)
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r.fused_rank)
        assert [r.fused_rank for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert (a.rrf_score, -a.doc_id) >= (b.rrf_score, -b.doc_id)


def test_probe_keyword_collect_is_bounded(spark):
    from trisk_spark.functions.text import KEYWORDS_K

    kw = probe_keywords(spark, SF_DIR)
    assert 0 < len(kw) <= N_PROBES * KEYWORDS_K
    per_doc: dict[int, int] = {}
    for r in kw:
        assert r.doc_id < N_PROBES
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + 1
    assert max(per_doc.values()) <= KEYWORDS_K


@pytest.fixture()
def overlap_corpus(tmp_path):
    """A corpus where doc 100 must win BOTH sides for probe 0: it
    shares probe 0's rare keywords AND its embedding direction, while
    decoys win exactly one side each — pins the fusion ADDITION path
    (the sf corpora are near-orthogonal random, so both-sides rows are
    rare there)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    dim = 64

    def vec(direction, eps=0.0):
        v = [0.001] * dim
        v[direction] = 0.9
        v[(direction + 1) % dim] = eps
        return [float(x) for x in v]

    filler = "common words appear everywhere in all documents "
    texts = {
        0: "zylophant quibblex zylophant quibblex rare terms " + filler,
        100: "quibblex quibblex quibblex zylophant match " + filler * 2,
        101: "zylophant quibblex quibblex echo words " + filler * 2,
        102: filler * 6,  # lexically unrelated, semantically close
    }
    docs = pa.table(
        {
            "doc_id": list(texts),
            "text": [texts[d] for d in texts],
            "lang": ["en"] * 4,
            "source": ["fixture"] * 4,
            "n_chars": [len(texts[d]) for d in texts],
        }
    )
    emb = pa.table(
        {
            "vec_id": [0, 100, 101, 102],
            # probe 0 and docs 100/102 share a direction (100 closest);
            # 101 points elsewhere (still dense-ranked: 4-doc corpus)
            "embedding": [vec(0), vec(0, 0.02), vec(7), vec(0, 0.05)],
            "label": [0, 0, 1, 0],
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    pq.write_table(emb, tmp_path / "embeddings.parquet")
    return str(tmp_path)


def test_both_sides_fusion_and_fixture_parity(spark, overlap_corpus):
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{overlap_corpus}/{t}.parquet')"
        )
    sdf = hybrid_retrieval(spark, overlap_corpus)
    assert_matches_oracle(sdf, con, HYBRID_RETRIEVAL_SQL)

    rows = {r.doc_id: r for r in sdf.collect() if r.query_id == 0}
    both = rows[100]
    assert both.lex_rank == 1 and both.sem_rank == 1  # wins BOTH sides
    assert both.fused_rank == 1
    assert both.rrf_score == round(2.0 / (RRF_C + 1), 6)
    # decoys: 101 is lexically ranked, 102 has no keyword hit at all
    assert rows[101].lex_rank is not None
    assert rows[102].lex_rank is None and rows[102].sem_rank is not None


def test_deterministic_across_runs(spark):
    a = {tuple(r) for r in _rows(spark)}
    b = {tuple(r) for r in _rows(spark)}
    assert a == b and a


def test_probe_keyword_filter_reaches_scan(spark):
    """The probe restriction (doc_id < N_PROBES) must push below the
    (doc_id, tok) aggregate to the documents scan — the ranking window
    is probe-sized at any corpus size; df/n stay corpus-wide (their
    scan carries no probe filter)."""
    from pyspark.sql import Window, functions as F

    from trisk_spark.catalog import table
    from trisk_spark.functions.text import KEYWORDS_K, _kw_tf_df_n

    docs = table(spark, SF_DIR, "documents").where(F.col("doc_id").isNotNull())
    tf, df, n = _kw_tf_df_n(docs)
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "tok")
    kw = (
        tf.where(F.col("doc_id") < N_PROBES)
        .join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score", F.col("tf").cast("double") * F.col("n_docs") / F.col("df")
        )
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= KEYWORDS_K)
        .select("doc_id", "tok")
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        kw.explain("formatted")
    plan = buf.getvalue()
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any(f"LessThan(doc_id,{N_PROBES})" in p for p in pushed), plan


# ------------------- hybrid probe over the persisted stores ----------


def test_store_probe_semantics(spark):
    """The store-served hybrid: RRF arithmetic holds, self is excluded,
    and the LEXICAL side equals the one-plan corpus ranking (the index
    is exact, so store-probe ≡ kernel is a hard equality, not a
    recall statement). The dense sides legitimately differ: exact knn
    vs routed IVF."""
    from trisk_spark.functions.retrieval import hybrid_store_probe

    rows = hybrid_store_probe(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        lex = 1.0 / (RRF_C + r.lex_rank) if r.lex_rank is not None else 0.0
        sem = 1.0 / (RRF_C + r.sem_rank) if r.sem_rank is not None else 0.0
        assert r.rrf_score == round(lex + sem, 6)
        assert r.doc_id != r.query_id
        assert 1 <= r.fused_rank <= HYBRID_TOP_K

    store_lex = {
        (r.query_id, r.doc_id): r.lex_rank
        for r in rows
        if r.lex_rank is not None
    }
    corpus_lex = {
        (r.query_id, r.doc_id): r.lex_rank
        for r in hybrid_retrieval(spark, SF_DIR).collect()
        if r.lex_rank is not None
    }
    # same ranking wherever both fusions kept the pair
    common = set(store_lex) & set(corpus_lex)
    assert common
    assert all(store_lex[k] == corpus_lex[k] for k in common)


def test_store_pair_is_memoized_and_complete(spark):
    """corpus_stores_path builds BOTH index artifacts once per
    (session, corpus) and returns the same scratch path on repeat
    calls — the store economics the probe op depends on. (Each side's
    pruned-read shape is pinned in its own suite: bucket
    PartitionFilters in test_bm25_store, routed list_id filters in
    test_similarity_iter/test_pq.)"""
    import os

    from trisk_spark.functions.retrieval import corpus_stores_path

    p1 = corpus_stores_path(spark, SF_DIR)
    p2 = corpus_stores_path(spark, SF_DIR)
    assert p1 == p2
    for sub in (
        "bm25/postings", "bm25/doclens", "bm25/stats",
        "ivf/index", "ivf/centroids",
    ):
        assert os.path.isdir(os.path.join(p1, sub)), sub


def test_hybrid_probe_stream_equals_batch(spark, tmp_path):
    """Streaming hybrid serving: one arriving batch of the standard
    probe documents through ``hybrid_probe_stream`` must equal
    ``hybrid_store_probe`` row-for-row over the same store pair —
    stream ≡ batch by construction (each side is literally its batch
    engine under foreachBatch)."""
    from pyspark.sql import functions as F

    from trisk_spark.catalog import table
    from trisk_spark.functions.retrieval import (
        corpus_stores_path,
        hybrid_probe_stream,
        hybrid_store_probe,
    )
    from trisk_spark.functions.similarity import N_PROBES
    from trisk_spark.streaming.sources import checkpoint_dir

    path = corpus_stores_path(spark, SF_DIR)
    probes = (
        table(spark, SF_DIR, "documents")
        .where(F.col("doc_id") < N_PROBES)
        .join(
            table(spark, SF_DIR, "embeddings").select(
                F.col("vec_id").alias("doc_id"), "embedding"
            ),
            "doc_id",
        )
        .select("doc_id", "text", "embedding")
    )
    probes_dir = str(tmp_path / "probes")
    probes.coalesce(1).write.parquet(probes_dir)

    got: dict[int, set] = {}

    def sink(bdf, bid):
        got[bid] = {tuple(r) for r in bdf.collect()}

    stream = (
        spark.readStream.schema(
            "doc_id long, text string, embedding array<double>"
        ).parquet(probes_dir)
    )
    q = (
        hybrid_probe_stream(spark, stream, SF_DIR, path, sink)
        .option("checkpointLocation", checkpoint_dir("hybprobe"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    want = {tuple(r) for r in hybrid_store_probe(spark, SF_DIR).collect()}
    assert got == {0: want}
