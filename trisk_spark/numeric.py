"""Numeric helpers shared by the Arrow-batched kernels.

The one rule that matters: every engine in the parity chain must round
identically. Spark's ``F.round`` and DuckDB's ``ROUND`` are
half-AWAY-FROM-ZERO; pandas/numpy ``.round()`` is half-to-even
(banker's), so a value landing exactly on a half cent (e.g. 0.125 * 100
= 12.5) silently diverges between a pandas kernel and its SQL oracle.
No current test corpus contains half-cent values, but the generator
contract doesn't forbid them — kernels must use :func:`cents` instead
of ``.round()``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def cents(values: pd.Series) -> pd.Series:
    """``value*100`` rounded half-away-from-zero to int64 — bit-exact
    with Spark ``F.round(col*100).cast('bigint')`` and DuckDB
    ``CAST(ROUND(value*100) AS BIGINT)`` for every input, including
    exact half cents."""
    v = values.to_numpy(dtype="float64") * 100.0
    out = np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))
    return pd.Series(out.astype("int64"), index=values.index)
