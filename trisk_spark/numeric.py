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


#: largest |value| whose cents (value*100, rounded) fit comfortably in
#: int64 — beyond it the ANSI cast overflows on BOTH engines
CENTS_MAX_ABS = 9.0e15


def finite_cents_col(value_col):
    """Column form: ``value*100`` rounded to BIGINT, NULL for NaN /
    +-Inf / |value| > CENTS_MAX_ABS — under ANSI, CAST(NaN AS BIGINT)
    and an overflowing cast are hard runtime errors on both engines, so
    one poisoned measurement would otherwise kill the whole query. The
    engine half of :data:`FINITE_CENTS_SQL`."""
    from pyspark.sql import functions as F

    return F.when(
        ~F.isnan(value_col)
        & (value_col != float("inf"))
        & (value_col != float("-inf"))
        & (F.abs(value_col) <= CENTS_MAX_ABS),
        F.round(value_col * 100).cast("bigint"),
    )


#: DuckDB half of finite_cents_col — format with the column name
FINITE_CENTS_SQL = (
    "CASE WHEN isnan({v}) OR isinf({v}) OR abs({v}) > 9.0e15 THEN NULL "
    "ELSE CAST(ROUND({v} * 100) AS BIGINT) END"
)
