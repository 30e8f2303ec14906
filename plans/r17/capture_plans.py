#!/usr/bin/env python3
"""Capture .explain('formatted') for named queries into plans/r17/.

Usage: python plans/r17/capture_plans.py <suffix> [query ...]
  suffix: 'before' or 'after' (file name suffix)
  queries: names from the registry; default = every bench HEADLINE query.

Runs from the repo root; uses the bench session shape (local[32],
sf0.1). Store-backed queries build their session-scoped scratch store
as a side effect (same as the bench); plans are captured AFTER that so
the explain shows the probe plan the bench times.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from trisk_spark.registry import load_all
from trisk_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("trisk-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = load_all()
    if not names:
        import bench

        names = bench.HEADLINE
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        df = qs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"captured {name}_{suffix}.txt", flush=True)


if __name__ == "__main__":
    main()
