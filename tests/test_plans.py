"""Physical-plan shape assertions: the properties that make these
queries scale are pinned here, not just claimed in docstrings.

Static plans are checked with `.explain("formatted")`; runtime
properties (exchange reuse, codegen, AQE) are checked on the executed
plan after an action. Size-based auto-broadcast is disabled inside
these tests so what we assert is the *policy* (explicit broadcast
hints, shuffle joins for fact tables) — at 100 TB the size heuristic
won't save a bad plan.
"""

from __future__ import annotations

import io
from contextlib import contextmanager, redirect_stdout

import pytest

from trisk_spark.registry import load_all

from .conftest import SF_DIR

QUERIES = load_all()
# retired-to-library rows (tpch_q10) keep their plan/parity pins here
from trisk_spark.registry import load_library  # noqa: E402

QUERIES.update({n: q for n, q in load_library().items() if n not in QUERIES})


@contextmanager
def no_auto_broadcast(spark):
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        yield
    finally:
        spark.conf.set(key, old)


def static_plan(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def executed_plan(spark, name: str) -> str:
    # collect() (not a sink write) so THIS DataFrame's AQE plan is the
    # one finalized — a write clones the query execution
    df = QUERIES[name].fn(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE appends the pre-adaptive plan under "== Initial Plan ==";
    # keep only the final plan so node counts aren't doubled
    return plan.split("== Initial Plan ==")[0]


def test_tpch_q6_pushdown_and_pruning(spark):
    plan = static_plan(spark, "tpch_q6")
    assert "PushedFilters" in plan
    # every predicate column reaches the scan
    pushed = plan[plan.index("PushedFilters") :].splitlines()[0]
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in pushed, f"{c} not pushed to parquet scan"
    # column pruning: the scan reads only what the query needs
    read = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "l_extendedprice" in read
    assert "l_orderkey" not in read, "scan reads columns the query never uses"


def test_dimension_joins_are_broadcast_by_hint(spark):
    # with size-based auto-broadcast OFF, only the explicit hints keep
    # the dimension joins broadcast — the policy that survives 100 TB
    with no_auto_broadcast(spark):
        for name in ("tpch_q5", "tpch_q10", "tpch_q3"):
            plan = static_plan(spark, name)
            assert "BroadcastHashJoin" in plan, f"{name}: dim join not broadcast"


def test_big_join_is_not_broadcast(spark):
    # lineitem⋈orders must stay a shuffle join — broadcasting a fact
    # table would OOM at 100 TB
    with no_auto_broadcast(spark):
        plan = static_plan(spark, "tpch_q5")
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_lsh_signature_pipeline_runs_once(spark):
    # candidate generation is in-bucket pair explosion, not a self-join:
    # exactly one exchange over doc_id-grouped signatures may exist (a
    # self-join would plan two — exchange reuse does not fire across
    # AQE stages, we measured it)
    plan = executed_plan(spark, "dedup_minhash_lsh")
    assert plan.count("hashpartitioning(doc_id") == 1, (
        "signature pipeline computed more than once"
    )
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_aggregates_have_map_side_partials(spark):
    # partial_* functions before the exchange: the shuffle carries one
    # row per (partition, key), not one per input row
    for name in ("tpch_q1", "keyed_agg", "wordcount"):
        plan = static_plan(spark, name)
        assert "partial_" in plan, f"{name}: no map-side partial aggregation"


def test_relational_path_is_codegen(spark):
    # executed-plan strings mark codegen stages with "*(n)"
    for name in ("tpch_q1", "nexmark_q1", "nexmark_q2"):
        plan = executed_plan(spark, name)
        assert "*(" in plan, f"{name}: hot path fell out of codegen"


def test_lsh_buckets_are_capped_on_degenerate_corpus(spark):
    # a corpus of N identical docs lands in ONE bucket per band; the
    # row_number cap must bound pair output at C(CAP, 2) instead of
    # C(N, 2) — the property that saves a 100 TB run from a mega-bucket
    from trisk_spark.functions.dedup import (
        BUCKET_CAP,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    n = BUCKET_CAP + 100
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(n)],
        "doc_id long, text string",
    )
    cap_pairs = BUCKET_CAP * (BUCKET_CAP - 1) // 2
    assert minhash_lsh_pairs(docs).count() == cap_pairs
    assert simhash_pairs(docs).count() == cap_pairs
    # truncation is deterministic: the CAP smallest doc_ids survive
    kept = minhash_lsh_pairs(docs).agg({"doc_b": "max"}).collect()[0][0]
    assert kept == BUCKET_CAP - 1


def test_purging_trigger_is_single_exchange(spark):
    # purge-on-fire turns the trigger into one partitionable groupBy —
    # the plan must contain exactly one exchange (formatted explain
    # prints each node twice: tree line + "(n) Exchange" detail header)
    import re

    plan = static_plan(spark, "purging_trigger")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1


def test_new_window_ops_have_map_side_partials(spark):
    for name in ("purging_trigger", "repetition_ratio", "ngram_counts"):
        plan = static_plan(spark, name)
        assert "partial_" in plan, f"{name}: no map-side partial aggregation"


def test_ngram_counts_uses_topk_not_global_sort(spark):
    # ORDER BY + LIMIT must plan as TakeOrderedAndProject, not a full
    # global Sort — the difference between a bounded heap and an
    # all-data sort at corpus scale
    plan = static_plan(spark, "ngram_counts")
    assert "TakeOrderedAndProject" in plan


def test_hot_shingle_cut_bounds_jaccard_fanout(spark):
    # a boilerplate phrase shared by every doc must NOT fan out into
    # C(N,2) join rows: its shingles exceed SHINGLE_DF_CAP and are cut,
    # while genuinely-rare shared shingles still pair
    from trisk_spark.functions.dedup import SHINGLE_DF_CAP, jaccard_pairs

    n = SHINGLE_DF_CAP + 36
    common = "the quick brown fox jumps"  # 5 words → 1 hot shingle/doc
    rows = [(i, f"{common} filler{i}") for i in range(n)]
    # two docs sharing a RARE 5-word phrase → one surviving pair
    rows += [(n, "rare alpha beta gamma delta"), (n + 1, "rare alpha beta gamma delta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = jaccard_pairs(docs).collect()
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in got] == [(n, n + 1, 1.0)]


def test_ann_ivf_assignment_is_map_side(spark):
    # fixed-K centroids ship as ONE broadcast array row, so list
    # assignment is a map-side array argmax: the whole plan must hold
    # exactly one Window and one shuffle Exchange — both belonging to
    # the final per-query top-k rank, none to assignment (the r2 design
    # ranked centroids through a per-vector row_number window: O(n·K)
    # rows sorted through a vec_id exchange — a 100 TB scale-killer)
    import re

    with no_auto_broadcast(spark):
        plan = static_plan(spark, "ann_ivf")
    assert len(re.findall(r"^\(\d+\) Window$", plan, re.M)) == 1, (
        "assignment fell back to a per-vector window"
    )
    assert len(re.findall(r"^\(\d+\) Exchange$", plan, re.M)) == 1, (
        "assignment shuffles the corpus"
    )
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_knn_label_vote_broadcasts_probe_side(spark):
    # the label table is corpus-sized: it must never sit under a
    # BroadcastExchange (driver OOM at 100 TB) — only the 50-row ranked
    # probe set may broadcast
    import re

    with no_auto_broadcast(spark):
        plan = static_plan(spark, "knn_label_vote")
    assert "BroadcastHashJoin" in plan
    for m in re.finditer(r"^\(\d+\) BroadcastExchange\n((?:.+\n)+?)\n", plan, re.M):
        assert "label#" not in m.group(1), (
            "corpus-sized label table is being broadcast"
        )


def test_cosine_lsh_adaptive_cap(spark):
    # default path: the plan must NOT contain a Window (the cap is a
    # slice inside the bucket aggregate) and — since round 5 — no
    # driver-side pre-count job either; degenerate corpus (one
    # mega-bucket): BOTH paths bound pairs at C(cap, 2) and keep the
    # cap smallest vec_ids, same rows the oracle's row_number cap keeps
    import re

    from trisk_spark.functions.similarity import cosine_lsh_pairs

    plan = static_plan(spark, "cosine_near_dup_lsh")
    assert not re.findall(r"^\(\d+\) Window$", plan, re.M), (
        "common path pays the window sort"
    )
    cap, n = 16, 40
    vec = [1.0] * 64
    emb = spark.createDataFrame(
        [(i, vec) for i in range(n)], "vec_id long, embedding array<float>"
    )
    for degenerate in (False, True):
        pairs = cosine_lsh_pairs(emb, cap=cap, expect_degenerate=degenerate)
        assert pairs.count() == cap * (cap - 1) // 2
        assert pairs.agg({"vec_b": "max"}).collect()[0][0] == cap - 1


def test_cosine_lsh_builds_plan_without_running_a_job(spark):
    # regression for the round-4 perf bug: building the query plan must
    # not trigger a Spark job (the old adaptive cap ran a max-bucket
    # count — a full scan+banding — before the real query)
    from trisk_spark.catalog import table

    sc = spark.sparkContext
    sc.setJobGroup("lsh-plan-build", "plan build only")
    try:
        # baseline: loading the table alone may run a parquet
        # footer/schema-inference job — that is reader overhead, not
        # the query; the assertion is that building the FULL query adds
        # no jobs beyond it
        table(spark, SF_DIR, "embeddings")
        baseline = len(sc.statusTracker().getJobIdsForGroup("lsh-plan-build") or [])
        QUERIES["cosine_near_dup_lsh"].fn(spark, SF_DIR)
        jobs = sc.statusTracker().getJobIdsForGroup("lsh-plan-build") or []
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    # the query's own table() runs the same single reader job as the
    # baseline; the old pre-count added a scan+aggregate job on top
    # (extra == 2). Allow exactly the reader job, nothing else.
    extra = len(jobs) - baseline
    assert extra <= baseline, f"plan build ran {extra} extra job(s): {jobs}"


def test_map_only_queries_have_no_exchange(spark):
    # Q1/Q2 are pure map/filter, the PII/URL curation ops are pure
    # regex projections, and chunking is tokenize+explode+slice in one
    # stage — any Exchange here is a planning bug
    for name in (
        "nexmark_q1", "nexmark_q2", "pii_redact", "url_normalize",
        "doc_chunk", "media_decode_checksum", "embed_quantize_int8",
    ):
        plan = static_plan(spark, name)
        assert "Exchange" not in plan, f"{name}: map-only query shuffles"


def test_keyword_extract_df_join_is_broadcast(spark):
    # the vocabulary-sized df table must reach the scoring rows by
    # broadcast; the (doc_id, token) count must partial-agg map-side
    with no_auto_broadcast(spark):
        plan = static_plan(spark, "keyword_extract")
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "partial_count" in plan, plan


def test_bigram_lm_scoring_joins_are_broadcast(spark):
    # the scoring scan must take the LM tables by BROADCAST (a
    # sort-merge join would shuffle every bigram of the corpus against
    # the count tables); the per-doc aggregate must partial-agg
    import re

    with no_auto_broadcast(spark):
        plan = static_plan(spark, "bigram_lm_score")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row vocab cross join
    assert "partial_count" in plan and "partial_sum" in plan, plan


def test_substring_dedup_plan_is_bucketed_jvm_side(spark):
    # winnowed fingerprint selection must be pure map-side JVM array
    # algebra (no Python eval, no per-position explode-then-Window for
    # selection) and the whole query must shuffle KEYED DATA exactly
    # twice: once on fingerprint (bucket + cap share that exchange),
    # once on the (doc_a, doc_b) pair aggregate. No global sort
    # anywhere. A narrow-scan round-robin spread (catalog.
    # spread_narrow_scan — bounded bytes, absent on a real
    # multi-split corpus) is the only other exchange allowed.
    import re

    plan = static_plan(spark, "dedup_substring")
    exchanges = re.findall(
        r"^\(\d+\) Exchange\n(?:[^\n]*\n)*?Arguments: (\w+)", plan, re.M
    )
    keyed = [e for e in exchanges if e.lower() == "hashpartitioning"]
    spread = [
        e for e in exchanges if e.lower() == "roundrobinpartitioning"
    ]
    assert len(keyed) == 2 and len(exchanges) == len(keyed) + len(spread)
    assert len(spread) <= 1
    for marker in ("ArrowEvalPython", "BatchEvalPython", "FlatMapsInPandas",
                   "TakeOrderedAndProject"):
        assert marker not in plan
    # any Sort must be partition-local (rangepartitioning would show a
    # third exchange; global sort args end with ", true")
    for m in re.finditer(r"^\(\d+\) Sort.*\nArguments: (.+)$", plan, re.M):
        assert ", true," not in m.group(1), "global sort in dedup plan"


def test_substring_dedup_winnowing_guarantee(spark, tmp_path):
    # docs sharing a verbatim run >= K+W-1 chars at DIFFERENT offsets
    # must pair regardless of alignment (the winnowing property);
    # unrelated docs must not pair; Spark must match the DuckDB oracle
    # on the same fixture corpus
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.conftest import assert_matches_oracle

    shared = "the same forty character run appears here"  # 41 chars
    texts = [
        shared + " tail alpha words one two three",
        "prefix padding differs " + shared + " suffix beta",
        "completely unrelated filler content nothing in common at all",
    ]
    docs = {
        "doc_id": [1, 2, 3],
        "text": texts,
        "lang": ["en"] * 3,
        "source": ["fixture"] * 3,
        "n_chars": [len(t) for t in texts],
    }
    pq.write_table(pa.table(docs), tmp_path / "documents.parquet")
    qd = QUERIES["dedup_substring"]
    rows = {(r.doc_a, r.doc_b): r.n_shared_fps
            for r in qd.fn(spark, str(tmp_path)).collect()}
    assert (1, 2) in rows and rows[(1, 2)] >= 1
    assert not any(3 in p for p in rows), "unrelated doc paired"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    assert_matches_oracle(qd.fn(spark, str(tmp_path)), con, qd.oracle)


def test_asof_join_is_linear_not_range_explode(spark):
    # the as-of join must be the union+running-last shape: one exchange
    # on user_id feeding one Window — NOT a range join (which fans out
    # to a row per probe x earlier-quote before picking the max) and
    # not a second shuffle. The quote-dedup aggregate shares the
    # user_id exchange via the union.
    import re

    plan = static_plan(spark, "asof_join")
    assert "Join" not in plan, "asof regressed to a join"
    assert len(re.findall(r"^\(\d+\) Window$", plan, re.M)) == 1
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, (
        "asof must shuffle exactly once, on user_id"
    )
    for m in re.finditer(r"Arguments: hashpartitioning\(([^,]+),", plan):
        assert m.group(1).startswith("user_id"), m.group(0)


def test_train_split_is_map_only(spark):
    # split assignment must never shuffle: pure projection over the scan
    plan = static_plan(spark, "train_split")
    assert "Exchange" not in plan, "hash split plan shuffles"
    # and the rollup moves only (source, split) aggregate rows
    plan2 = static_plan(spark, "split_rollup")
    assert "partial_" in plan2, "split rollup lost map-side combine"


def test_sequence_pack_is_single_shard_shuffle(spark):
    # packing must shuffle ONCE on the shard key (source) and run the
    # running sum as a per-shard window — a global window (one
    # partition) would serialize the corpus
    import re
    plan = static_plan(spark, "sequence_pack")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert "SinglePartition" not in plan, "global window: corpus serialized"


def test_length_percentiles_is_single_exchange_partial_agg(spark):
    # exact percentiles: one shuffle on source with map-side partial
    # aggregation (percentile buffers merge map-side)
    import re
    plan = static_plan(spark, "length_percentiles")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert "partial_percentile" in plan or "Partial" in plan, plan


def test_source_cap_sample_is_single_exchange_rank_prune(spark):
    # one shuffle on source; the rank filter must sit directly on the
    # window (pruned before anything downstream)
    import re
    plan = static_plan(spark, "source_cap_sample")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert "SinglePartition" not in plan


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # two tables bucketed on the join key with matching bucket counts
    # must join with ZERO Exchange — the write-once-join-many layout
    # that saves re-shuffling a fact table on every 100 TB pipeline run
    import re

    from trisk_spark.catalog import table as _table
    from trisk_spark.sources.bucketing import bucketed, write_bucketed

    docs = _table(spark, SF_DIR, "documents").select("doc_id", "source", "n_chars")
    emb = _table(spark, SF_DIR, "embeddings").select("vec_id")
    write_bucketed(docs, "bt_docs", "doc_id", 8, sort_by="doc_id")
    write_bucketed(
        emb.withColumnRenamed("vec_id", "doc_id"), "bt_emb", "doc_id", 8,
        sort_by="doc_id",
    )
    try:
        with no_auto_broadcast(spark):
            j = bucketed(spark, "bt_docs").join(bucketed(spark, "bt_emb"), "doc_id")
            buf = io.StringIO()
            with redirect_stdout(buf):
                j.explain("formatted")
            plan = buf.getvalue()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 0, (
            "bucketed join still shuffles:\n" + plan
        )
        # and it actually runs
        assert j.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_docs")
        spark.sql("DROP TABLE IF EXISTS bt_emb")


def test_aqe_splits_skewed_join_partitions(spark):
    # a hot key must not pin one task with the whole join: AQE's skew
    # handling (OptimizeSkewedJoin) splits the oversized partition at
    # runtime — the no-code-change answer to skewed keys at 100 TB
    # (salting stays the fallback for the broadcast-disabled cases AQE
    # can't touch). Verified on the executed plan: the join reports
    # skew=true.
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        from pyspark.sql import functions as F

        n = 200_000
        fact = spark.range(n).select(
            # 90% of rows share key 0; the rest spread thin
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("p"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), F.lit("d").alias("d")
        )
        j = fact.join(dim, "k")
        # collect() on THIS DataFrame so its own AQE plan finalizes
        # (count() clones the query execution — see executed_plan())
        assert len(j.collect()) > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, (
            "AQE did not split the skewed partition:\n" + plan[:2000]
        )
    finally:
        # conf.get(k, None) is None for never-set keys: unset those so
        # the aggressive thresholds don't leak into the shared session
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_ivf_refine_is_bounded_partial_agg(spark):
    # assignment must stay map-side (zero Window); the only shuffles
    # are the two partial-aggregated groupBys ((list_id, pos) sums and
    # the per-list rebuild) whose post-combine payload is bounded by
    # K x DIM rows per partition; centroids ship by broadcast
    import re
    plan = static_plan(spark, "ivf_refine")
    assert len(re.findall(r"^\(\d+\) Window$", plan, re.M)) == 0, plan
    assert len(re.findall(r"^\(\d+\) Exchange$", plan, re.M)) == 2, plan
    assert "partial_" in plan, "member sums lack map-side combine"
    assert "BroadcastExchange" in plan


def test_multi_row_group_file_fans_out_scan(spark, tmp_path):
    # PERF_NOTES documents that the sf* fixtures' single-row-group
    # parquet caps the document family at one scan task locally, and
    # claims real multi-row-group corpora fan out with NO added
    # exchange. Pin that claim: a single .parquet FILE with 8 row
    # groups must feed >= 8 scan tasks that all do real work, and the
    # map-side fingerprint/text stage over it must stay exchange-free.
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from trisk_spark.functions.dedup import _WINNOW_EXPR

    import hashlib

    n, per_group = 4000, 500  # 8 row groups in ONE file
    docs = {
        "doc_id": list(range(n)),
        # md5-derived words: incompressible, so each row group's
        # on-disk size stays well above the split size below
        "text": [
            " ".join(
                hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8]
                for j in range(40)
            )
            for i in range(n)
        ],
        "lang": ["en"] * n,
        "source": ["fixture"] * n,
        "n_chars": [200] * n,
    }
    pq.write_table(
        pa.table(docs), tmp_path / "documents.parquet", row_group_size=per_group
    )

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024))
    try:
        stage = (
            spark.read.parquet(str(tmp_path / "documents.parquet"))
            .select("doc_id", F.explode(F.expr(_WINNOW_EXPR)).alias("fp"))
        )
        per_part = (
            stage.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .collect()
        )
        non_empty = [r for r in per_part if r["count"] > 0]
        assert len(non_empty) == 8, (
            f"expected one working scan task per row group, got "
            f"{len(non_empty)}: {sorted((r.pid, r['count']) for r in per_part)}"
        )
        # and the fan-out came from the SCAN, not a repartition: the
        # map stage (before the diagnostic groupBy) has no Exchange
        import io
        import re
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            stage.explain("formatted")
        plan = buf.getvalue()
        assert not re.findall(r"^\(\d+\) Exchange", plan, re.M), plan
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_source_mix_keep_pass_broadcasts_rates(spark):
    # the rates table must reach the keep scan by BROADCAST and the
    # only hash shuffles are the two source-keyed partial aggs — a
    # sort-merge join here would shuffle the corpus on source
    import re

    with no_auto_broadcast(spark):
        plan = static_plan(spark, "source_mix_sample")
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "partial_count" in plan and "partial_sum" in plan, plan
    shuffles = re.findall(r"Arguments: hashpartitioning\((\w+)#", plan)
    assert shuffles and set(shuffles) == {"source"}, shuffles


def test_ts_subsequence_windows_shuffle_once_and_broadcast_probes(spark):
    # window construction shuffles the corpus exactly once on user_id
    # (frame sort is spillable, no per-user array collect); the probe
    # set reaches candidates by broadcast; ranks are candidate-sized
    import re

    with no_auto_broadcast(spark):
        plan = static_plan(spark, "ts_subsequence_match")
    assert "SortMergeJoin" not in plan, plan
    # scoring is the driver-held-model Arrow kernel: NO join at all —
    # the plan's only corpus-keyed exchange feeds the frame-sort window
    assert "Join" not in plan, plan
    keys = re.findall(r"Arguments: hashpartitioning\((\w+)#", plan)
    assert set(keys) <= {"user_id", "probe_user"}, keys
    assert keys.count("user_id") == 1, keys


def test_ts_motif_single_exchange_and_distributed_topk(spark):
    # matrix-profile discovery must stay a ONE-shuffle plan: the
    # window build's user_id hash partitioning is REUSED by the
    # per-series pair kernel (FlatMapGroupsInPandas adds no second
    # exchange), the global rank is a distributed TakeOrderedAndProject
    # (never a full sort of the per-series survivors), and no join of
    # any kind appears (pairs exist only inside the kernel)
    import io
    import re
    from contextlib import redirect_stdout

    from trisk_spark.functions.timeseries import (
        ts_discord,
        ts_motif,
        ts_motif_sax,
    )

    # ONE exchange for all three — including the sax path: its
    # (user_id, word) grouping is satisfied by the window build's
    # user_id hash partitioning (partitioning on a subset of the
    # clustering keys clusters the groups), so the pair-set collapse
    # is free of extra shuffles; no join anywhere (bucketing is a
    # groupBy, not an equi-join)
    for fn, want in ((ts_motif, 1), (ts_discord, 1), (ts_motif_sax, 1)):
        buf = io.StringIO()
        with redirect_stdout(buf):
            fn(spark, SF_DIR).explain("formatted")
        plan = buf.getvalue()
        assert "Join" not in plan and "CartesianProduct" not in plan, plan
        assert "TakeOrderedAndProject" in plan, plan
        keys = re.findall(r"Arguments: hashpartitioning\((\w+)#", plan)
        assert keys == ["user_id"] * want, (fn.__name__, keys)
        assert "FlatMapGroupsInPandas" in plan, plan


def test_event_funnel_one_shuffle_no_join(spark):
    # the funnel-as-3-joins formulation re-shuffles the corpus once
    # per stage; this one must stay a single user_id exchange (the
    # stage-reach tests are window lookbacks sharing one sort, the
    # per-user agg reuses the partitioning, the rollup is one row)
    import io
    import re
    from contextlib import redirect_stdout

    from trisk_spark.functions.funnel import event_funnel

    buf = io.StringIO()
    with redirect_stdout(buf):
        event_funnel(spark, SF_DIR).explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    keys = re.findall(r"Arguments: hashpartitioning\((\w+)#", plan)
    assert keys == ["user_id"], keys
    # one corpus scan: the single-pass stack rollup, not per-stage
    # aggs (formatted output repeats the node name in the detail
    # section — the Location line appears once per actual scan)
    assert plan.count("Location: InMemoryFileIndex") == 1, plan


def test_user_retention_plan_shape(spark):
    # two exchanges, deliberately: the distinct (user, day) build
    # exchanges AFTER map-side partial dedup, then only the distinct
    # pairs re-key to user_id for the cohort window — the docstring's
    # density argument; a third corpus-keyed exchange or a join would
    # mean the shape regressed
    import io
    import re
    from contextlib import redirect_stdout

    from trisk_spark.functions.funnel import user_retention

    buf = io.StringIO()
    with redirect_stdout(buf):
        user_retention(spark, SF_DIR).explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
    keys = re.findall(r"Arguments: hashpartitioning\(([\w#L, ]+?), \d+\)", plan)
    corpus_keyed = [k for k in keys if "user_id" in k]
    assert len(corpus_keyed) == 2, keys
    assert "HashAggregate" in plan  # map-side partial dedup exists


def test_ts_kernel_matches_expression_form(spark):
    # the numpy scoring kernel must be bit-identical to the JVM
    # expression form that the streaming twin's batch image uses —
    # exact raw doubles, not just rounded values
    from trisk_spark.catalog import table
    from trisk_spark.functions.timeseries import (
        _ts_raw_windows,
        ts_candidate_distances,
        ts_candidate_distances_gemm,
        ts_probes,
        ts_windows,
    )

    ev = table(spark, SF_DIR, "events")
    probe_rows = [
        (r.probe_user, r.pmu, r.psd, list(r.pw))
        for r in ts_probes(ev).collect()
    ]
    kern = {
        (r.probe_user, r.match_user, r.match_seq): r.dist2
        for r in ts_candidate_distances_gemm(
            spark, _ts_raw_windows(ev), probe_rows
        ).collect()
    }
    expr = {
        (r.probe_user, r.match_user, r.match_seq): r.dist2
        for r in ts_candidate_distances(ts_windows(ev), ts_probes(ev)).collect()
    }
    assert kern == expr and len(kern) > 0


def test_ts_sax_kernel_matches_expression_form(spark):
    # the SAX stats+word kernel must be bit-identical to the JVM
    # expression form on every column (raw doubles included)
    from trisk_spark.catalog import table
    from trisk_spark.functions.timeseries import (
        _ts_raw_windows,
        sax_word_col,
        ts_sax_windows_gemm,
        ts_windows,
    )

    ev = table(spark, SF_DIR, "events")
    kern = {
        (r.user_id, r.seq): (tuple(r.w), r.mu, r.sd, r.word)
        for r in ts_sax_windows_gemm(spark, _ts_raw_windows(ev)).collect()
    }
    expr = {
        (r.user_id, r.seq): (tuple(r.w), r.mu, r.sd, r.word)
        for r in ts_windows(ev).withColumn("word", sax_word_col()).collect()
    }
    assert kern == expr and len(kern) > 0


def test_pq_encode_trained_final_plan_is_map_only(spark):
    # Lloyd training happens in model-sized partial-agg passes during
    # DataFrame construction; the FINAL registered plan is the fused
    # quantize+assign+encode Arrow kernel over the raw scan — zero
    # Exchange, zero joins (the 100 TB claim: encoding against the
    # trained codebook never shuffles the corpus)
    import re

    with no_auto_broadcast(spark):
        plan = static_plan(spark, "pq_encode_trained")
    assert not re.findall(r"^\(\d+\) Exchange$", plan, re.M), plan
    assert "Join" not in plan, plan


def test_bpe_segment_plan_broadcasts_vocab_model(spark):
    # the corpus scoring pass joins the word→length segmentation model
    # BROADCAST (vocabulary-sized, size-guarded) — never a corpus-wide
    # word shuffle on the scoring side; the only exchanges are the
    # vocabulary build and the final doc_id partial agg
    import re

    with no_auto_broadcast(spark):
        plan = static_plan(spark, "bpe_segment")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 1, plan
    assert len(re.findall(r"^\(\d+\) Exchange$", plan, re.M)) <= 3, plan


def test_training_plan_composition_join_policy(spark):
    # the composed artifact keeps every stage's proven join policy: the
    # epoch-factor and manifest model joins are broadcast; the id-sized
    # anti joins may shuffle (correct at scale — loser sets can be
    # corpus-fraction-sized, so forcing broadcast would be the bug);
    # no non-broadcast cartesian anywhere. materialize=False exposes
    # the full lineage past the r17 epoch-tail checkpoint (the
    # perplexity_buckets convention)
    from trisk_spark.functions.sampling import training_plan

    with no_auto_broadcast(spark):
        df = training_plan(spark, SF_DIR, materialize=False)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_training_plan_epoch_tail_materializes_manifest_once(spark):
    # the r17 optimization: the epoch tail's three consumers (token-mass
    # agg, max, factor join) must read ONE materialized survivors frame
    # — without the checkpoint the plan duplicates the whole manifest +
    # cluster-rank lineage 3x (documents scan + content-hash shuffle +
    # Lloyd/GEMM branch each appear three times). Pin: the default plan
    # scans NO parquet (all corpus work happens once, behind the
    # checkpoint barrier) and the checkpointed RDD feeds every branch.
    # Row-identity with the unmaterialized lineage is pinned by
    # test_oracle_parity (the registered row) — values cannot drift.
    plan = static_plan(spark, "training_plan")
    assert "Scan ExistingRDD" in plan, plan
    assert "Scan parquet" not in plan, plan


def test_sequence_pack_sharded_is_two_pass_prefix_sum(spark):
    # the r11 scale fix: past PACK_SHARD_MIN_SPAN ids the packing
    # prefix sum must (a) shuffle the corpus ONCE on (source, _shard)
    # — a dominant source fans out instead of serializing one sorted
    # task — (b) move only cell-sized PARTIAL sums for the offsets
    # branch, and (c) attach offsets via a broadcast hash join (the
    # null-safe keys still hash-join, never nested-loop)
    import io
    import re
    from contextlib import redirect_stdout

    from trisk_spark.functions.sampling import sequence_pack

    with no_auto_broadcast(spark):
        df = sequence_pack(spark, SF_DIR, n_shards=8)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    assert re.search(r"hashpartitioning\(source#\d+, _shard#\d+", plan), plan
    assert "partial_max" in plan, "offsets branch lost map-side combine"
    assert "BroadcastHashJoin" in plan, "offsets join is not broadcast-hash"
    assert "NestedLoop" not in plan, "null-safe join degraded to nested loop"
    assert "SinglePartition" not in plan


def test_sequence_pack_sharded_executes_upstream_once(spark):
    # the subtotal branch derives from the SAME exchange as the main
    # branch — at runtime AQE must materialize the corpus
    # scan+tokenize+shuffle exactly once (ReusedExchange), so
    # pack_plan's upstream chain can never execute twice; this needed
    # an explicit symmetric not-null on the shard key (see
    # _with_start_off) because the join's inferred isnotnull otherwise
    # breaks canonical stage equality
    from trisk_spark.functions.sampling import sequence_pack

    with no_auto_broadcast(spark):
        df = sequence_pack(spark, SF_DIR, n_shards=8)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString().split(
            "== Initial Plan =="
        )[0]
    assert plan.count("ReusedExchange") >= 1, plan
    assert plan.count("FileScan") == 1, plan


def test_source_cap_partial_topk_plan_bounds_the_final_sort(spark):
    # stage 1 must rank per (source, md5-prefix shard) — the corpus
    # exchange carries BOTH keys — and Spark's WindowGroupLimit keeps
    # only per-group top-K rows ahead of each shuffle, so the final
    # per-source sort sees at most 16^chars × SOURCE_CAP rows
    import io
    import re
    from contextlib import redirect_stdout

    from trisk_spark.functions.sampling import source_cap_sample

    with no_auto_broadcast(spark):
        df = source_cap_sample(spark, SF_DIR, shard_chars=2)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    exchanges = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    assert any("_w" in e and "source" in e for e in exchanges), plan
    assert "WindowGroupLimit" in plan, "rank no longer prunes pre-shuffle"
    assert "SinglePartition" not in plan


def test_shuffle_shards_is_single_bounded_shuffle(spark):
    # epoch shuffle: ONE exchange on the md5 shard key (uniform by
    # construction — no degenerate key can concentrate rows), per-shard
    # rank, never a global sort
    import io
    import re
    from contextlib import redirect_stdout

    from trisk_spark.functions.sampling import shuffle_shards

    df = shuffle_shards(spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    assert "SinglePartition" not in plan, "global sort: corpus serialized"


def test_budget_trim_buckets_keep_global_sort_off_the_corpus(spark):
    # the global ordered prefix sum must run as K-way parallel bucket
    # windows: the corpus-sized exchange partitions on the bucket key;
    # the only SinglePartition window is the K-row offsets aggregate;
    # offsets attach via broadcast hash join
    import io
    import re
    from contextlib import redirect_stdout

    from trisk_spark.functions.sampling import budget_trim

    with no_auto_broadcast(spark):
        df = budget_trim(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    assert re.search(r"hashpartitioning\(_b#\d+", plan), plan
    assert "BroadcastHashJoin" in plan, plan
    # SinglePartition may appear ONLY once — the K-row offsets window
    # above the bucket-level aggregate, never over corpus rows
    assert plan.count("SinglePartition") <= 1, plan
    assert "partial_max" in plan, "bucket subtotals lost map-side combine"


def test_perplexity_buckets_rank_is_lang_bucket_parallel(spark):
    # the per-language global rank must run as lang x K-way parallel
    # bucket windows: the corpus-sized exchange partitions on
    # (lang, coarse-bucket); offsets attach via broadcast hash join;
    # SinglePartition appears only under the LM kernel's 1-row vocab
    # aggregate, never a corpus window (materialize=False exposes the
    # full lineage past the localCheckpoint barrier)
    import re

    from trisk_spark.functions.sampling import perplexity_buckets

    with no_auto_broadcast(spark):
        df = perplexity_buckets(spark, SF_DIR, materialize=False)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    assert re.search(r"hashpartitioning\(lang#\d+, _cb#\d+", plan), plan
    assert "BroadcastHashJoin" in plan, plan
    # the two SinglePartition sites are the vocab 1-row aggregates of
    # the twice-planned LM chain (collapsed at runtime by the
    # checkpoint barrier); a corpus-ordered global window would add a
    # SinglePartition *Sort* -- assert none exists
    assert plan.count("SinglePartition") <= 2, plan
    assert not re.search(r"Sort .*SinglePartition", plan), plan


def test_canonical_by_quality_argmax_has_no_component_sort(spark):
    # the per-cluster argmax must be a partial-aggregatable struct MAX
    # (map-side combine), never a per-component window sort: one giant
    # boilerplate cluster would serialize a window through one task
    import re

    from trisk_spark.functions.dedup import canonical_by_quality

    df = canonical_by_quality(spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "partial_max" in plan, "argmax lost map-side combine"
    # no Window node may partition on the component key (the windows
    # inside dedup_clusters' upstream run on shingle/bucket keys
    # before the checkpoint barrier and never reach this plan)
    for m in re.finditer(r"^\(\d+\) Window", plan, re.M):
        seg = plan[m.start():m.start() + 400]
        assert "component" not in seg, seg


def test_bm25_top_docs_filters_in_row_and_broadcasts_models(spark):
    # the token array must be filtered IN-ROW against the literal
    # seed-term set before the explode (no join, no shuffle for the
    # filter — non-hit tokens never leave their row); df and the query
    # expansion attach by broadcast; the 1-row corpus stats by
    # broadcast nested-loop; the tf aggregate must partial-agg
    import io
    from contextlib import redirect_stdout

    from trisk_spark.functions.text import bm25_top_docs

    with no_auto_broadcast(spark):
        df = bm25_top_docs(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    assert "SortMergeJoin" not in plan, plan
    # the seed filter is an in-row lambda compiled to a set probe
    # (INSET), not a join
    assert "filter(" in plan and "INSET" in plan, plan
    # df join + query expansion join
    assert plan.count("BroadcastHashJoin") >= 2, plan
    # 1-row corpus stats cross join
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "partial_count" in plan, "tf aggregate lost map-side combine"


def test_dsir_weights_model_is_broadcast_and_bucket_bounded(spark):
    # the DSIR_BUCKETS-row model and its 1-row totals must reach the
    # scoring bigrams by broadcast (a sort-merge join would shuffle
    # every bigram of the corpus against the model); both the bucket
    # counts and the per-doc sum must partial-agg map-side
    import io
    from contextlib import redirect_stdout

    from trisk_spark.functions.sampling import dsir_weights

    with no_auto_broadcast(spark):
        df = dsir_weights(spark, SF_DIR, materialize=False)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "partial_sum" in plan and "partial_count" in plan, plan


def test_dsir_weights_bigram_pass_runs_once(spark):
    # the r17 optimization: the bigram explode + per-bigram md5 (the
    # corpus-dominant CPU) must feed ONE materialized per-(doc, bucket)
    # count frame consumed by both the model aggregate and the scoring
    # join — without the checkpoint the static plan replays the whole
    # md5 lineage twice (once per consumer). Pin: the default plan
    # scans NO parquet (the one bigram pass sits behind the checkpoint
    # barrier) and the duplicates collapse to counts BEFORE the wire
    # (partial_count in the checkpointed subtree, asserted on the
    # materialize=False lineage above). Row-identity with the
    # unmaterialized lineage is pinned by test_oracle_parity.
    plan = static_plan(spark, "dsir_weights")
    assert "Scan ExistingRDD" in plan, plan
    assert "Scan parquet" not in plan, plan


def test_embedding_health_is_single_label_shuffle(spark):
    # map-only per-row norm fold into ONE label-keyed exchange with
    # map-side partials — no join, no window, nothing corpus-sized
    # moves
    import io
    import re
    from contextlib import redirect_stdout

    from trisk_spark.functions.similarity import embedding_health

    with no_auto_broadcast(spark):
        df = embedding_health(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    assert "Join" not in plan, plan
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) <= 2, plan
    assert "partial_" in plan, "health aggregate lost map-side combine"


def test_probe_frame_executes_probe_lineage_once(spark, tmp_path):
    # r11 VERDICT #3: probe_frame must pay exactly ONE execution of the
    # probe frame's upstream before the candidate stage (the former
    # separate guard count + distinct-list collect paid ~3). An
    # accumulator in the probe lineage counts rows processed: after
    # probe_frame() returns (the routing collect has run), the count
    # must equal one pass over the probes — not two, not three. The
    # final result job legitimately re-executes the (per-micro-batch
    # persisted, in streaming) lineage afterwards.
    from pyspark.sql import functions as F

    from trisk_spark.catalog import table
    from trisk_spark.functions import ivf_store
    from trisk_spark.functions.similarity import N_PROBES, _valid_embeddings

    path = str(tmp_path / "ivf")
    ivf_store.write_index(spark, SF_DIR, path)
    emb = _valid_embeddings(table(spark, SF_DIR, "embeddings"))
    probes_plain = emb.where(F.col("vec_id") < N_PROBES)
    expected = probes_plain.count()
    assert expected > 0
    acc = spark.sparkContext.accumulator(0)

    def tick(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    probes = probes_plain.mapInPandas(tick, probes_plain.schema)
    out = ivf_store.probe_frame(spark, probes, emb, path)
    assert acc.value == expected, (
        f"probe lineage executed {acc.value / expected:.1f}x before the "
        "candidate stage — the guard/routing fold regressed"
    )
    assert out.count() > 0  # the probe still answers


def test_source_divergence_counts_once_and_joins_word_shuffled(spark):
    # the (source, word) count table is checkpoint-materialized ONCE
    # (zero FileScans above the barrier — without it four consumers
    # each replay the corpus explode), the word-keyed join of the two
    # count tables is a SHUFFLE join (a 100 TB vocabulary is past
    # broadcast — no forced broadcast on the word key), while the
    # per-source totals and the grand total reach scoring by broadcast
    import re

    from trisk_spark.functions.sampling import source_divergence

    with no_auto_broadcast(spark):
        df = source_divergence(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 0, (
        "count-table checkpoint barrier lost — the corpus explode "
        "would replay per consumer:\n" + plan
    )
    # word join shuffled, not broadcast: with auto-broadcast off the
    # only broadcasts are the explicit ns + totals hints
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # 1-row grand total
    assert "partial_sum" in plan, "final aggregate lost map-side combine"


def test_local_rows_frames_are_one_partition_and_broadcast_side(spark, tmp_path):
    # the r17 local_rows mechanism, pinned (r18 — VERDICT scale
    # hardening): a driver-held list enters the plan as ONE partition
    # (createDataFrame over a list fans to defaultParallelism Python-RDD
    # partitions, each a JVM<->Python round trip), and at its one real
    # consumer class — the store probes' routing/query tables — it
    # stays the BROADCAST side of the join, never a shuffled side
    from pyspark.sql import functions as F

    from trisk_spark.catalog import local_rows
    from trisk_spark.functions import bm25_store

    lf = local_rows(spark, [(1, "a"), (2, "b")], "query_id int, term string")
    assert lf.rdd.getNumPartitions() == 1

    # a real probe plan: qterms (local_rows) must feed a broadcast join
    path = str(tmp_path / "bm")
    docs = spark.createDataFrame(
        [(i, f"alpha beta tok{i} gamma") for i in range(30)],
        "doc_id long, text string",
    )
    bm25_store.write_bm25_store(spark, docs, path)
    out = bm25_store.probe_bm25_store(
        spark, path, queries={1: ("alpha",), 2: ("beta", "tok3")}
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Scan ExistingRDD" in plan, plan  # the local frames
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, (
        "a bounded local frame reached a shuffle join:\n" + plan
    )


def test_cc_fast_path_never_collects_oversized_graphs(spark, monkeypatch):
    # the driver components fast path is gated by a DATA-DERIVED edge
    # bound (r18 pin — VERDICT scale hardening): above
    # CC_DRIVER_MAX_EDGES the edge list must NEVER be collected (no
    # truncation, no driver solve) — the distributed loop runs instead
    # and still produces the exact min-label fixpoint
    from pyspark.sql import functions as F

    from trisk_spark.functions import dedup

    def _boom(_rows):
        raise AssertionError(
            "_driver_components called above the edge bound"
        )

    monkeypatch.setattr(dedup, "CC_DRIVER_MAX_EDGES", 2)
    monkeypatch.setattr(dedup, "_driver_components", _boom)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
    )  # 3 pairs > bound of 2 -> loop path
    got = sorted(
        (r.doc_id, r.component)
        for r in dedup.min_label_components(pairs).collect()
    )
    assert got == [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)]
