"""Throughput sanity against the reference's micro-bench design point:
60,000 events/s aggregate on the stateful matchmaker (BASELINE.md —
micro-bench.sh: 6,000/s/task × p=10). Warm-run marginal rate; best of
two runs to tolerate a loaded machine."""

from __future__ import annotations

import time

from trisk_spark.registry import load_all

SF_DIR = "/root/testdata/sf0.1"
N_ORDERS = 100_000  # events rows at sf0.1
TARGET_EPS = 60_000


def test_matchmaker_sustains_reference_rate(spark):
    q = load_all()["stock_matchmaker"]
    q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm

    best = 0.0
    for _ in range(2):
        t0 = time.time()
        q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        best = max(best, N_ORDERS / (time.time() - t0))
    assert best >= TARGET_EPS, f"matchmaker {best:,.0f} orders/s < {TARGET_EPS:,}"


# ---- composed admission loop (r13 VERDICT next-round #5) -------------

#: docs/s floor for the FULL dual-store funnel (quality gate + MinHash
#: probe + SRP probe + both appends). Measured 218 docs/s on this
#: box's local[32] at 3 waves x 2,000 docs (2026-08-15, calm box);
#: the floor is ~2x headroom for the recorded ±15% box drift. The
#: per-wave cost is dominated by fixed job fan-out (~9 s/wave at this
#: tiny M), so production-sized waves amortize far better — this gate
#: exists to catch REGRESSIONS in the composed loop's plan shape
#: (e.g. an append losing its touched-partition pruning), not to
#: measure peak rate.
ADMISSION_WAVES = 3
ADMISSION_WAVE_DOCS = 2_000
ADMISSION_MIN_DPS = 100


def test_admission_loop_sustains_rate(spark, tmp_path):
    from pyspark.sql import functions as F

    from trisk_spark.functions import admission, dedup_store
    from trisk_spark.functions import semantic_store as S

    def docs(lo, n):
        # unique 40-word texts + deterministic 64-dim embeddings, all
        # in-plan (no driver-side data) so generation stays off the
        # measured path's critical resource
        return spark.range(lo, lo + n).select(
            F.col("id").alias("doc_id"),
            F.lit("w").alias("source"),
            F.concat_ws(
                " ",
                F.array(*[
                    F.concat(
                        F.lit(f"t{j}x"),
                        F.conv(
                            F.substring(
                                F.md5(
                                    F.concat(
                                        F.col("id").cast("string"),
                                        F.lit(f"-{j}"),
                                    )
                                ),
                                1, 8,
                            ),
                            16, 10,
                        ),
                    )
                    for j in range(40)
                ]),
            ).alias("text"),
            # md5-derived dims: effectively random vectors, so no two
            # (wave or seed) embeddings are near-dups by construction
            # (a lattice like pmod(id*k, p) collides exactly for ids
            # equal mod p — the first draft of this test found that out)
            F.array(*[
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.col("id").cast("string"),
                                    F.lit(f"e{j}"),
                                )
                            ),
                            1, 4,
                        ),
                        16, 10,
                    ).cast("double") / F.lit(65536.0) - F.lit(0.5)
                )
                for j in range(64)
            ]).alias("embedding"),
        )

    dpath, spath = str(tmp_path / "d"), str(tmp_path / "s")
    dedup_store.write_dedup_store(
        spark, docs(0, 1000).select("doc_id", "text"), dpath
    )
    S.write_semantic_store(
        spark,
        docs(0, 1000).select(F.col("doc_id").alias("vec_id"), "embedding"),
        spath,
    )

    t0 = time.time()
    n_total, n_admitted = 0, 0
    for w in range(ADMISSION_WAVES):
        lo = 10_000 + w * ADMISSION_WAVE_DOCS
        counts = dict(
            admission.admission_wave(
                spark, docs(lo, ADMISSION_WAVE_DOCS), dpath, spath
            )
            .groupBy("stage").count().collect()
        )
        n_total += sum(counts.values())
        n_admitted += counts.get("admitted", 0)
    dps = ADMISSION_WAVES * ADMISSION_WAVE_DOCS / (time.time() - t0)
    # texts are unique (no dup_text) and pass the quality gate; the
    # md5 embeddings are random, so at the house NEAR_DUP_COS=0.30 a
    # deterministic fraction flags dup_semantic against the seeded
    # store (max cos over ~1k near-orthogonal refs sits around 0.4) —
    # the gate is that EVERY doc is staged exactly once and the append
    # half genuinely runs, not that everything is admitted
    assert n_total == ADMISSION_WAVES * ADMISSION_WAVE_DOCS
    assert n_admitted > 0
    assert dps >= ADMISSION_MIN_DPS, (
        f"admission loop {dps:,.0f} docs/s < {ADMISSION_MIN_DPS:,} "
        "(composed funnel regression — check probe pruning and the "
        "append's touched-partition rewrite)"
    )
