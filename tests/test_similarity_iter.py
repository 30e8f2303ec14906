"""Iterated IVF refinement: convergence semantics of the eps early
exit and the plan shape of the per-step kernel (DuckDB parity for the
fixed-T registered query lives in test_oracle_parity)."""

from __future__ import annotations

from trisk_spark.functions import similarity as sim

from .conftest import SF_DIR


def _rows(df):
    return sorted(
        (r.list_id, r.n_members, r.centroid_cos) for r in df.collect()
    )


def test_eps_early_exit_stops_after_first_step(spark):
    # cosine movement is bounded by 2, so eps=3 converges immediately:
    # the loop must stop after the FIRST assignment and report exactly
    # the one-step image (iters param can't rescue a broken early exit)
    one = _rows(sim.ivf_refine_iterative(spark, SF_DIR, iters=1))
    eager = _rows(sim.ivf_refine_iterative(spark, SF_DIR, iters=5, eps=3.0))
    assert eager == one


def test_fixed_t_equals_library_default(spark):
    # the registered query is the library call at iters=REFINE_ITERS
    reg = _rows(sim.ivf_refine_iters(spark, SF_DIR))
    lib = _rows(sim.ivf_refine_iterative(spark, SF_DIR, iters=sim.REFINE_ITERS))
    assert reg == lib
    assert len(reg) > 0


def test_iteration_changes_assignments_then_converges(spark):
    # the fixture corpus must actually exercise the loop: step 2 moves
    # at least one vector relative to step 1 (otherwise the unrolled
    # oracle is vacuously equal to one step), and a tight-but-reachable
    # eps terminates before the iteration cap
    one = _rows(sim.ivf_refine_iterative(spark, SF_DIR, iters=1))
    two = _rows(sim.ivf_refine_iterative(spark, SF_DIR, iters=2))
    assert one != two, "fixture corpus: Lloyd step 2 is a no-op"
    capped = _rows(sim.ivf_refine_iterative(spark, SF_DIR, iters=50, eps=0.2))
    assert len(capped) > 0  # terminated (eps or cap) and produced lists


def test_ivf_refine_iters_plan_is_stepwise_bounded(spark):
    # the returned DataFrame's lineage must contain ONLY the final
    # step: earlier steps are cut by the K-row centroid localCheckpoint,
    # so the plan shows the same bounded shape as one-step ivf_refine —
    # zero Window, two partial-agg Exchanges, broadcast centroids
    import re

    from .test_plans import static_plan

    plan = static_plan(spark, "ivf_refine_iters")
    assert len(re.findall(r"^\(\d+\) Window$", plan, re.M)) == 0, plan
    # exactly the two bounded partial-agg shuffles; assignment is the
    # Arrow GEMM kernel over the scan (driver-held centroid model — no
    # centroid-array collapse exchange, no shuffle, no window)
    assert len(re.findall(r"^\(\d+\) Exchange$", plan, re.M)) == 2, plan
    assert "partial_" in plan, "member sums lack map-side combine"
    assert "BroadcastExchange" in plan  # final K-row centroid join
