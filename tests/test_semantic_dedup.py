"""Semantic (SemDeDup-class) dedup: cluster semantics replayed against
a pure-Python union-find, the manifest composition replayed from its
halves, and the plan pinned bucketed (never all-pairs). DuckDB parity
for both registered queries lives in test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from trisk_spark.catalog import table
from trisk_spark.functions.similarity import cosine_lsh_pairs, dedup_semantic
from trisk_spark.registry import load_all

from .conftest import SF_DIR


def _union_find_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_dedup_semantic_matches_union_find_replay(spark):
    # the min-label propagation must compute exactly the connected
    # components a union-find over the SAME candidate pairs computes,
    # with component = smallest member id
    emb = table(spark, SF_DIR, "embeddings")
    pairs = [
        (int(r.vec_a), int(r.vec_b))
        for r in cosine_lsh_pairs(emb).select("vec_a", "vec_b").collect()
    ]
    want = _union_find_components(pairs)
    got = {
        int(r.doc_id): int(r.component)
        for r in dedup_semantic(spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 0
    # at least one nontrivial cluster, else the operator is vacuous here
    assert any(c != d for d, c in got.items())


def test_curation_manifest_semantic_is_manifest_minus_losers(spark):
    # the composed manifest must equal the plain manifest minus every
    # semantic-cluster loser (component != doc_id), no more, no less
    reg = load_all()
    manifest = {
        int(r.doc_id): tuple(r)
        for r in reg["curation_manifest"].fn(spark, SF_DIR).collect()
    }
    losers = {
        int(r.doc_id)
        for r in dedup_semantic(spark, SF_DIR).collect()
        if r.component != r.doc_id
    }
    want = sorted(v for k, v in manifest.items() if k not in losers)
    got = sorted(
        tuple(r)
        for r in reg["curation_manifest_semantic"].fn(spark, SF_DIR).collect()
    )
    assert got == want and len(got) > 0
    assert len(got) < len(manifest), (
        "no manifest row was semantically deduped — vacuous composition"
    )


def test_curation_manifest_semantic_plan_stays_bucketed(spark):
    # never all-pairs: the embedding side must stay the bucketed LSH
    # kernel and the manifest meet must be a hash anti-join — no
    # nested-loop/cartesian anywhere even with auto-broadcast off
    from .test_plans import no_auto_broadcast, static_plan

    with no_auto_broadcast(spark):
        plan = static_plan(spark, "curation_manifest_semantic")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "LeftAnti" in plan, plan


def test_min_label_components_raises_on_capped_exit(spark, monkeypatch):
    # an unconverged exit must raise, never return silently-wrong
    # labels (the 100 TB correctness cliff: a chain longer than the
    # round budget would mislabel clusters)
    import pytest

    from trisk_spark.functions import dedup

    path_edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "doc_a long, doc_b long"
    )
    # force the distributed loop (the driver fast path solves any
    # graph under CC_DRIVER_MAX_EDGES exactly and never iterates)
    monkeypatch.setattr(dedup, "CC_DRIVER_MAX_EDGES", -1)
    monkeypatch.setattr(dedup, "MAX_CC_ITERS", 1)
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.min_label_components(path_edges)
    monkeypatch.undo()
    # sanity: with the real budget the same graph converges to one
    # cluster rooted at 0 in O(log diameter) pointer-jumped rounds
    got = {
        (r.doc_id, r.component)
        for r in dedup.min_label_components(path_edges).collect()
    }
    assert got == {(i, 0) for i in range(9)}


def test_driver_components_fast_path_equals_label_loop(spark, monkeypatch):
    # the r17 bounded-graph fast path (driver union-find under
    # CC_DRIVER_MAX_EDGES) must reproduce the distributed min-label
    # loop's fixpoint label-for-label — hostile graph: long chains
    # (pointer-jump territory), a star, duplicate + self edges, both
    # orientations, multiple components, non-contiguous ids
    from trisk_spark.functions import dedup

    edges = (
        [(i, i + 1) for i in range(0, 40)]            # long chain 0..40
        + [(1000 + i, 1000) for i in range(1, 9)]     # star at 1000
        + [(77, 77), (2000, 2001), (2001, 2000)]      # self + dup both ways
        + [(500_000_000_000 + i, 500_000_000_001 + i) for i in range(3)]
    )
    frame = spark.createDataFrame(edges, "doc_a long, doc_b long")
    fast = {
        (r.doc_id, r.component)
        for r in dedup.min_label_components(frame).collect()
    }
    monkeypatch.setattr(dedup, "CC_DRIVER_MAX_EDGES", -1)
    loop = {
        (r.doc_id, r.component)
        for r in dedup.min_label_components(frame).collect()
    }
    assert fast == loop and len(fast) > 0


def test_dedup_semantic_identical_corpus_single_cluster(spark, tmp_path):
    # a spam-like corpus of identical embeddings is ONE semantic
    # cluster rooted at the smallest doc_id — the bucket-capped pair
    # kernel plus transitive closure must still connect everything
    # (every vector shares every band), and nothing may go quadratic:
    # pairs are bounded by C(cap, 2) per bucket
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from trisk_spark.registry import load_all

    from .conftest import assert_matches_oracle

    n = 120
    vec = [0.25] * 64
    tab = pa.table(
        {
            "vec_id": pa.array(list(range(n)), pa.int64()),
            "embedding": pa.array([vec] * n, pa.list_(pa.float32())),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq.write_table(tab, tmp_path / "embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{tmp_path}/embeddings.parquet')"
    )
    qd = load_all()["dedup_semantic"]
    got = {(r.doc_id, r.component) for r in qd.fn(spark, str(tmp_path)).collect()}
    assert got == {(i, 0) for i in range(n)}
    assert_matches_oracle(qd.fn(spark, str(tmp_path)), con, qd.oracle)
