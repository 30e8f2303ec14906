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
