"""Time-series subsequence similarity search over the ``events`` value
streams — the classic streaming-analytics primitive (UCR-style
z-normalized subsequence matching; cf. "Time Series Similarity Search
for Streaming Data in Distributed Systems", EDBT 2019) the reference's
domain (market data streams) uses for pattern screening: find, for each
probe window, the most similar windows in every OTHER user's series.

Float-parity design (house patterns): window contents are exact cent
integers (the ``numeric.cents`` idiom), window sums and sum-of-squares
are exact BIGINT folds, and every double step (mean, variance, sd, the
z-normalized squared distance) is the same sequence of correctly-rounded
IEEE ops on both engines, with the distance accumulated as an explicit
left fold (DuckDB's no-init ``list_reduce`` agrees with the engine's
``aggregate(0.0, +)`` because 0.0 + x == x exactly). Constant windows
(zero variance) are excluded on both sides — z-normalization is
undefined there.

Scale notes: windows come from ONE shuffle on user_id + a spillable
frame sort (no per-user series array is ever materialized — a hot user
costs sort spill, not memory); the probe set is bounded
(N_TS_PROBES first windows) and broadcast, so candidate scoring is one
map-side pass over the window stream — the brute-force baseline every
indexed variant (PAA/SAX bucketing, the ANN-family pattern) is measured
against. Reference has no time-series operator (beyond-reference
mandate, SURVEY.md §7 step 7).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from trisk_spark.catalog import cached_cols, local_rows, table
from trisk_spark.registry import register

TS_WINDOW = 16     # subsequence length (events per window)
N_TS_PROBES = 3    # probe set: first full window of user_id < N_TS_PROBES
TOP_TS_K = 5       # matches reported per probe

TS_SUBSEQ_SQL = f"""
WITH e AS (
  SELECT user_id, event_id AS seq, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
  WHERE user_id IS NOT NULL AND event_id IS NOT NULL AND value IS NOT NULL
),
win AS (
  SELECT user_id, seq,
    list(cents) OVER (PARTITION BY user_id ORDER BY seq
                      ROWS BETWEEN CURRENT ROW AND {TS_WINDOW - 1} FOLLOWING)
      AS w
  FROM e
),
m AS (
  SELECT user_id, seq, w,
    CAST(list_sum(w) AS DOUBLE) / {TS_WINDOW} AS mu,
    CAST(list_sum(list_transform(w, x -> x * x)) AS DOUBLE) / {TS_WINDOW} AS m2
  FROM win WHERE len(w) = {TS_WINDOW}
),
nz AS (
  SELECT user_id, seq, w, mu, SQRT(m2 - mu * mu) AS sd
  FROM m WHERE m2 - mu * mu > 0
),
p AS (
  SELECT user_id AS probe_user, seq AS probe_seq, w AS pw, mu AS pmu, sd AS psd
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY seq) AS rn
        FROM nz WHERE user_id < {N_TS_PROBES})
  WHERE rn = 1
),
d AS (
  SELECT p.probe_user, n.user_id AS match_user, n.seq AS match_seq,
    list_reduce(list_transform(list_zip(pw, n.w),
      s -> (((s[1] - pmu) / psd) - ((s[2] - n.mu) / n.sd))
         * (((s[1] - pmu) / psd) - ((s[2] - n.mu) / n.sd))),
      (acc, x) -> acc + x) AS dist2
  FROM p CROSS JOIN nz n WHERE n.user_id <> p.probe_user
)
SELECT probe_user, match_user, match_seq,
  CAST(ROUND(dist2, 6) AS DOUBLE) AS dist2, CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY probe_user
        ORDER BY dist2 ASC, match_user, match_seq) AS rank FROM d)
WHERE rank <= {TOP_TS_K}
"""


def _fold_sum(col: Column) -> Column:
    return F.aggregate(col, F.lit(0).cast("bigint"), lambda acc, v: acc + v)


def _check_cents_bound(W) -> None:
    """Loud no-overflow precondition for the numpy int64 window-stats
    kernels, mirroring ``similarity._check_dot_bound``: the exact
    sum-of-squares fold |Σ c²| ≤ dim·max|c|² must stay inside int64,
    because the three engines DIVERGE past it — Spark 4's ANSI bigint
    fold throws, DuckDB's list_sum promotes to HUGEINT, and numpy would
    silently wrap and corrupt the pinned kernel≡expression equivalence.
    Checked in exact Python ints per Arrow batch (one O(n·d) abs-max
    scan, negligible vs the stats pass); cents ≳ 7.6e8 (a $7.6M tick)
    would trip it."""
    c_max = int(abs(W).max()) if W.size else 0
    if TS_WINDOW * c_max * c_max >= 2**63:
        raise OverflowError(
            f"int64 window sum-of-squares bound exceeded: dim={TS_WINDOW} "
            f"max|cents|={c_max} — rescale the series (the JVM ANSI fold "
            "would throw here; numpy would silently wrap)"
        )


def events_cents(events: DataFrame) -> DataFrame:
    """The family's shared events → (user_id, seq, cents) projection
    (null filter, event_id as the per-user order key, the exact-cent
    ROUND quantization). PARITY-CRITICAL: every oracle's ``e`` CTE
    mirrors this exactly — one shared definition so a future change
    cannot desynchronize the window ops, ts_acf, and the streaming
    monitor."""
    return events.where(
        F.col("user_id").isNotNull()
        & F.col("event_id").isNotNull()
        & F.col("value").isNotNull()
    ).select(
        "user_id",
        F.col("event_id").alias("seq"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )


def _ts_raw_windows(events: DataFrame, with_rn: bool = False) -> DataFrame:
    """Full sliding windows per user, stats not yet attached:
    (user_id, seq, w) — one shuffle on user_id + a spillable frame
    sort. ``with_rn`` additionally carries the window's START POSITION
    in the user's event-row order (``rn``, 1-based row_number over the
    same partition/order — shares the frame sort, no extra shuffle):
    two windows of one series OVERLAP iff their start positions differ
    by < TS_WINDOW in ROW terms, which seq arithmetic cannot express
    (event ids are globally allocated, per-user gaps arbitrary) — the
    motif/discord exclusion zone keys on rn, never on seq."""
    e = events_cents(events)
    fr = (
        Window.partitionBy("user_id")
        .orderBy("seq")
        .rowsBetween(Window.currentRow, TS_WINDOW - 1)
    )
    cols = ["user_id", "seq"]
    if with_rn:
        cols.append(
            F.row_number()
            .over(Window.partitionBy("user_id").orderBy("seq"))
            .alias("rn")
        )
    return e.select(
        *cols, F.collect_list("cents").over(fr).alias("w")
    ).where(F.size("w") == TS_WINDOW)


def attach_window_stats(win: DataFrame) -> DataFrame:
    """Exact integer window sums → (…, w, mu, sd) with the shared
    zero-variance guard, over ANY frame carrying a ``w`` cents array
    (the batch window build, or a streaming micro-batch of arriving
    probe windows) — JVM expression form; other columns pass through."""
    rest = [c for c in win.columns if c != "w"]
    m = win.select(
        *rest, "w",
        (_fold_sum(F.col("w")).cast("double") / TS_WINDOW).alias("mu"),
        (
            _fold_sum(F.transform("w", lambda x: x * x)).cast("double")
            / TS_WINDOW
        ).alias("m2"),
    )
    return (
        m.where(F.col("m2") - F.col("mu") * F.col("mu") > 0)
        .select(
            *rest, "w", "mu",
            F.sqrt(F.col("m2") - F.col("mu") * F.col("mu")).alias("sd"),
        )
    )


def ts_windows(events: DataFrame) -> DataFrame:
    """Full z-normalizable sliding windows per user: (user_id, seq, w,
    mu, sd) — ``_ts_raw_windows`` plus ``attach_window_stats`` (the
    registered query's hot path computes the same stats inside the
    scoring kernel)."""
    return attach_window_stats(_ts_raw_windows(events))


def ts_probes(events: DataFrame, n_probes: int = N_TS_PROBES) -> DataFrame:
    """The probe set: the FIRST full z-normalizable window of each user
    with user_id < ``n_probes`` — (probe_user, probe_seq, pw, pmu, psd).
    The filter applies BEFORE the window build so the frame sort runs
    on the probe users' rows only (the partition-keyed window commutes
    with a partition-key filter — the quantize-probe lesson)."""
    pw = Window.partitionBy("user_id").orderBy("seq")
    return (
        ts_windows(events.where(F.col("user_id") < n_probes))
        .withColumn("rn", F.row_number().over(pw))
        .where(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("probe_user"),
            F.col("seq").alias("probe_seq"),
            F.col("w").alias("pw"),
            F.col("mu").alias("pmu"),
            F.col("sd").alias("psd"),
        )
    )




def ts_candidate_distances(cand: DataFrame, probes: DataFrame) -> DataFrame:
    """Raw z-normalized squared distances of every candidate window to
    every probe (self-user excluded) — the pre-rank stage shared by the
    batch query and the streaming alert twin's batch image. Probes are
    BROADCAST; scoring is one map-side pass over the window stream."""

    def znd(x: Column, y: Column) -> Column:
        e = (x - F.col("pmu")) / F.col("psd") - (y - F.col("mu")) / F.col("sd")
        return e * e

    dist2 = F.aggregate(
        F.zip_with(F.col("pw"), F.col("w"), znd),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        F.broadcast(probes)
        .crossJoin(cand)
        .where(F.col("user_id") != F.col("probe_user"))
        .select(
            "probe_user",
            F.col("user_id").alias("match_user"),
            F.col("seq").alias("match_seq"),
            dist2.alias("dist2"),
        )
    )


def ts_candidate_distances_gemm(
    spark: SparkSession, raw_win: DataFrame, probe_rows
) -> DataFrame:
    """Arrow numpy image of stats + ``ts_candidate_distances`` in ONE
    pass — the kernel treatment for the interpreted fold chain (the
    window stats and 16-element distance folds are Catalyst-interpreted
    HOFs; PERF_NOTES r8). ``probe_rows`` is the driver-held probe model
    (probe_user, pmu, psd, pw list). Bit-exact with the expression
    form (pytest-pinned): int64 axis sums are exact, mu/m2 are the
    same single divisions, and the distance accumulates
    dimension-by-dimension in index order — the exact left-fold
    rounding sequence of the JVM aggregate and the oracle's
    list_reduce."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    model = spark.sparkContext.broadcast(
        [
            (int(pu), float(pmu), float(psd), np.array(pw, dtype=np.int64))
            for pu, pmu, psd, pw in probe_rows
        ]
    )
    out_schema = StructType(
        [
            StructField("probe_user", LongType()),
            StructField("match_user", LongType()),
            StructField("match_seq", LongType()),
            StructField("dist2", DoubleType()),
        ]
    )

    def kern(batches):
        probes = model.value
        for pdf in batches:
            if len(pdf) == 0 or not probes:
                continue
            W = np.array(list(pdf["w"]), dtype=np.int64)
            _check_cents_bound(W)
            users = pdf["user_id"].to_numpy()
            seqs = pdf["seq"].to_numpy()
            s = W.sum(axis=1)
            sq = (W * W).sum(axis=1)
            mu = s.astype(np.float64) / TS_WINDOW
            m2 = sq.astype(np.float64) / TS_WINDOW
            var = m2 - mu * mu
            keep = var > 0
            if not keep.any():
                continue
            X = W[keep].astype(np.float64)
            mu, sd = mu[keep], np.sqrt(var[keep])
            users, seqs = users[keep], seqs[keep]
            frames = []
            for pu, pmu, psd, pw in probes:
                nonself = users != pu
                if not nonself.any():
                    continue
                acc = np.zeros(X.shape[0])
                for d in range(TS_WINDOW):  # left-fold over dims
                    e = (pw[d] - pmu) / psd - (X[:, d] - mu) / sd
                    acc += e * e
                frames.append(
                    pd.DataFrame(
                        {
                            "probe_user": np.full(int(nonself.sum()), pu,
                                                  dtype=np.int64),
                            "match_user": users[nonself],
                            "match_seq": seqs[nonself],
                            "dist2": acc[nonself],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames)

    return raw_win.mapInPandas(kern, out_schema)


def _rank_topk(d: DataFrame) -> DataFrame:
    """Shared tail of every subsequence-search variant: per-probe rank
    of the candidate-sized distance frame, top TOP_TS_K, 6-decimal
    rounded distance."""
    rw = Window.partitionBy("probe_user").orderBy(
        F.asc("dist2"), "match_user", "match_seq"
    )
    return (
        d.withColumn("rank", F.row_number().over(rw))
        .where(F.col("rank") <= TOP_TS_K)
        .select(
            "probe_user", "match_user", "match_seq",
            F.round("dist2", 6).alias("dist2"), "rank",
        )
    )


def ts_brute_topk(
    spark: SparkSession, ev: DataFrame, n_probes: int = N_TS_PROBES
) -> DataFrame:
    """Library form of ``ts_subsequence_match`` with a parameterized
    probe-batch size — the brute baseline every bucketed variant is
    measured against (the SAX crossover measurement sweeps
    ``n_probes`` here; PERF_NOTES r9)."""
    probe_rows = [
        (r.probe_user, r.pmu, r.psd, list(r.pw))
        for r in ts_probes(ev, n_probes).collect()
    ]
    d = ts_candidate_distances_gemm(spark, _ts_raw_windows(ev), probe_rows)
    return _rank_topk(d)


@register("ts_subsequence_match", oracle=TS_SUBSEQ_SQL)
def ts_subsequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K z-normalized subsequence matches for each probe window
    against every other user's series (self-matches excluded) — the
    market-pattern screen ("which securities moved like this one?") a
    streaming exchange runs over its value streams.

    Plan: window construction is ONE shuffle on user_id with a
    spillable frame sort (the probe branch re-derives its ≤N_TS_PROBES
    users' windows from a pushdown-filtered scan); the probe set is a
    DRIVER-HELD model (≤N_TS_PROBES rows, the knn/centroid collect
    class) and window stats + candidate scoring run as ONE Arrow numpy
    pass over the window stream (``ts_candidate_distances_gemm`` —
    bit-exact with the expression form, which the streaming twin's
    batch image keeps and a pytest cross-checks); the only other
    shuffle is the per-probe rank of candidate-sized rows. Brute-force
    over windows is the labeled baseline — at scale the candidate set
    is cut by PAA/SAX bucketing exactly like the ANN family's LSH/IVF
    variants."""
    return ts_brute_topk(spark, table(spark, sf_dir, "events"))


# ------------------------------ SAX-bucketed subsequence search ------

# The scale path for ts_subsequence_match, exactly the ANN family's
# LSH/IVF pattern: windows are reduced to a SAX word (PAA segment means
# z-normalized and quantized against the standard gaussian quartile
# breakpoints ±0.6745), probes compare ONLY against windows sharing
# their word — an equi-join over ~ALPHABET^SEGMENTS buckets instead of
# a cross join — and survivors are re-ranked with the exact distance.
# Every step is deterministic cross-engine: segment sums are exact
# BIGINTs, the z-normalized PAA values are fixed-order double ops, and
# symbol assignment is double comparisons against literal breakpoints.

SAX_SEGMENTS = 4                       # PAA segments per window
SAX_SEG_LEN = TS_WINDOW // SAX_SEGMENTS
SAX_BREAKS = (-0.6745, 0.0, 0.6745)    # alphabet of 4, gaussian quartiles

_SAX_WORD_SQL = " + ".join(
    f"""(CASE
    WHEN (CAST(list_sum(list_slice(w, {s * SAX_SEG_LEN + 1},
                {(s + 1) * SAX_SEG_LEN})) AS DOUBLE) / {SAX_SEG_LEN} - mu) / sd
         < {SAX_BREAKS[0]} THEN 0
    WHEN (CAST(list_sum(list_slice(w, {s * SAX_SEG_LEN + 1},
                {(s + 1) * SAX_SEG_LEN})) AS DOUBLE) / {SAX_SEG_LEN} - mu) / sd
         < {SAX_BREAKS[1]} THEN 1
    WHEN (CAST(list_sum(list_slice(w, {s * SAX_SEG_LEN + 1},
                {(s + 1) * SAX_SEG_LEN})) AS DOUBLE) / {SAX_SEG_LEN} - mu) / sd
         < {SAX_BREAKS[2]} THEN 2
    ELSE 3 END) * {4 ** (SAX_SEGMENTS - 1 - s)}"""
    for s in range(SAX_SEGMENTS)
)

TS_SAX_SQL = f"""
WITH e AS (
  SELECT user_id, event_id AS seq, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
  WHERE user_id IS NOT NULL AND event_id IS NOT NULL AND value IS NOT NULL
),
win AS (
  SELECT user_id, seq,
    list(cents) OVER (PARTITION BY user_id ORDER BY seq
                      ROWS BETWEEN CURRENT ROW AND {TS_WINDOW - 1} FOLLOWING)
      AS w
  FROM e
),
m AS (
  SELECT user_id, seq, w,
    CAST(list_sum(w) AS DOUBLE) / {TS_WINDOW} AS mu,
    CAST(list_sum(list_transform(w, x -> x * x)) AS DOUBLE) / {TS_WINDOW} AS m2
  FROM win WHERE len(w) = {TS_WINDOW}
),
nz AS (
  SELECT user_id, seq, w, mu, SQRT(m2 - mu * mu) AS sd
  FROM m WHERE m2 - mu * mu > 0
),
sx AS (SELECT *, {_SAX_WORD_SQL} AS word FROM nz),
p AS (
  SELECT user_id AS probe_user, seq AS probe_seq, w AS pw, mu AS pmu,
         sd AS psd, word AS pword
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY seq) AS rn
        FROM sx WHERE user_id < {N_TS_PROBES})
  WHERE rn = 1
),
d AS (
  SELECT p.probe_user, n.user_id AS match_user, n.seq AS match_seq,
    list_reduce(list_transform(list_zip(pw, n.w),
      s -> (((s[1] - pmu) / psd) - ((s[2] - n.mu) / n.sd))
         * (((s[1] - pmu) / psd) - ((s[2] - n.mu) / n.sd))),
      (acc, x) -> acc + x) AS dist2
  FROM p JOIN sx n ON p.pword = n.word
  WHERE n.user_id <> p.probe_user
)
SELECT probe_user, match_user, match_seq,
  CAST(ROUND(dist2, 6) AS DOUBLE) AS dist2, CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (PARTITION BY probe_user
        ORDER BY dist2 ASC, match_user, match_seq) AS rank FROM d)
WHERE rank <= {TOP_TS_K}
"""


def sax_word_col() -> Column:
    """The window's SAX word as one integer — base-ALPHABET digits of
    the z-normalized PAA symbols, mirroring ``_SAX_WORD_SQL`` exactly
    (same segment sums, same division order, same breakpoint
    comparisons). Built once per JVM (``cached_cols`` — ~SAX_SEGMENTS
    × a dozen py4j round trips)."""

    def build() -> Column:
        word = F.lit(0)
        for s in range(SAX_SEGMENTS):
            seg = F.slice(F.col("w"), s * SAX_SEG_LEN + 1, SAX_SEG_LEN)
            paa = (
                F.aggregate(seg, F.lit(0).cast("bigint"), lambda a, v: a + v)
                .cast("double")
                / SAX_SEG_LEN
            )
            z = (paa - F.col("mu")) / F.col("sd")
            sym = (
                F.when(z < SAX_BREAKS[0], 0)
                .when(z < SAX_BREAKS[1], 1)
                .when(z < SAX_BREAKS[2], 2)
                .otherwise(3)
            )
            word = word + sym * (4 ** (SAX_SEGMENTS - 1 - s))
        return word

    return cached_cols("ts.sax_word", build)


def ts_sax_windows_gemm(
    spark: SparkSession, raw_win: DataFrame, keep_words=None
) -> DataFrame:
    """Arrow numpy image of ``ts_windows`` + ``sax_word_col`` in ONE
    pass — (user_id, seq, w, mu, sd, word). Bit-exact with the
    expression form (pytest-pinned): int64 axis/segment sums are
    exact, mean/variance are the same single divisions, and symbol
    assignment is the same double comparisons against the literal
    breakpoints.

    ``keep_words`` (a set of word ids) makes the kernel emit ONLY
    windows in those buckets — the in-kernel image of the store's
    word-partition pruning. Without it, serializing every window's
    ``w`` array back through Arrow costs more than the stats saved
    (measured: 2.5 s for 100k windows at sf0.1, PERF_NOTES r8); with
    the probe buckets it emits ~corpus/words rows."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("seq", LongType()),
            StructField("w", ArrayType(LongType())),
            StructField("mu", DoubleType()),
            StructField("sd", DoubleType()),
            StructField("word", LongType()),
        ]
    )

    def kern(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            W = np.array(list(pdf["w"]), dtype=np.int64)
            _check_cents_bound(W)
            s = W.sum(axis=1)
            sq = (W * W).sum(axis=1)
            mu = s.astype(np.float64) / TS_WINDOW
            m2 = sq.astype(np.float64) / TS_WINDOW
            var = m2 - mu * mu
            keep = var > 0
            if not keep.any():
                continue
            W, mu = W[keep], mu[keep]
            sd = np.sqrt(var[keep])
            word = np.zeros(W.shape[0], dtype=np.int64)
            for seg in range(SAX_SEGMENTS):
                segsum = W[:, seg * SAX_SEG_LEN : (seg + 1) * SAX_SEG_LEN].sum(
                    axis=1
                )
                z = (segsum.astype(np.float64) / SAX_SEG_LEN - mu) / sd
                sym = np.full(z.shape, 3, dtype=np.int64)
                sym[z < SAX_BREAKS[2]] = 2
                sym[z < SAX_BREAKS[1]] = 1
                sym[z < SAX_BREAKS[0]] = 0
                word += sym * (4 ** (SAX_SEGMENTS - 1 - seg))
            users = pdf["user_id"].to_numpy()[keep]
            seqs = pdf["seq"].to_numpy()[keep]
            if keep_words is not None:
                bucket = np.isin(word, list(keep_words))
                if not bucket.any():
                    continue
                W, mu, sd, word = W[bucket], mu[bucket], sd[bucket], word[bucket]
                users, seqs = users[bucket], seqs[bucket]
            yield pd.DataFrame(
                {
                    "user_id": users,
                    "seq": seqs,
                    "w": list(W),
                    "mu": mu,
                    "sd": sd,
                    "word": word,
                }
            )

    return raw_win.mapInPandas(kern, out_schema)


def sax_probe_rows(ev: DataFrame, n_probes: int = N_TS_PROBES) -> list:
    """The SAX probe set as DRIVER-HELD rows (≤``n_probes``, the
    knn/centroid collect class): each probe user's first full
    z-normalizable window with its SAX word, via the JVM expression
    form on a pushdown-filtered scan. Collected ONCE — the words steer
    the kernel's bucket mask / the store's partition filter, and the
    same rows re-enter the plan as a broadcast local relation."""
    pw = Window.partitionBy("user_id").orderBy("seq")
    return (
        ts_windows(ev.where(F.col("user_id") < n_probes))
        .withColumn("word", sax_word_col())
        .withColumn("rn", F.row_number().over(pw))
        .where(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("probe_user"),
            F.col("w").alias("pw"),
            F.col("mu").alias("pmu"),
            F.col("sd").alias("psd"),
            F.col("word").alias("pword"),
        )
        .collect()
    )


def sax_probes_df(spark: SparkSession, probe_rows) -> DataFrame:
    """The driver-held probe rows re-entering the plan as a local
    relation for the broadcast word equi-join."""
    return local_rows(
        spark,
        [
            (int(r.probe_user), [int(x) for x in r.pw], float(r.pmu),
             float(r.psd), int(r.pword))
            for r in probe_rows
        ],
        "probe_user long, pw array<long>, pmu double, psd double, pword long",
    )


def sax_score_topk(probes: DataFrame, sx: DataFrame) -> DataFrame:
    """Shared scoring tail of the SAX variants (one-plan query AND
    probe-over-store): BROADCAST probe rows equi-join candidate
    windows on the SAX word (never a cross join), exact z-normalized
    distance as the JVM left-fold expression, per-probe top-K."""

    def znd(x: Column, y: Column) -> Column:
        e = (x - F.col("pmu")) / F.col("psd") - (y - F.col("mu")) / F.col("sd")
        return e * e

    dist2 = F.aggregate(
        F.zip_with(F.col("pw"), F.col("w"), znd),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    d = (
        F.broadcast(probes)
        .join(sx, F.col("pword") == F.col("word"))
        .where(F.col("user_id") != F.col("probe_user"))
        .select(
            "probe_user",
            F.col("user_id").alias("match_user"),
            F.col("seq").alias("match_seq"),
            dist2.alias("dist2"),
        )
    )
    return _rank_topk(d)


def ts_sax_topk(
    spark: SparkSession, ev: DataFrame, n_probes: int = N_TS_PROBES
) -> DataFrame:
    """Library form of ``ts_subsequence_sax`` with a parameterized
    probe-batch size — the bucketed path of the brute/SAX crossover
    measurement (PERF_NOTES r9)."""
    probe_rows = sax_probe_rows(ev, n_probes)
    sx = ts_sax_windows_gemm(
        spark, _ts_raw_windows(ev), {int(r.pword) for r in probe_rows}
    )
    return sax_score_topk(sax_probes_df(spark, probe_rows), sx)


@register("ts_subsequence_sax", oracle=TS_SAX_SQL)
def ts_subsequence_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX-bucketed subsequence search — ``ts_subsequence_match``'s
    scale path made real (the ann_lsh_bucketed analog): each window
    reduces to a 4-symbol SAX word and probes score ONLY same-word
    windows, cutting the candidate set by ~the bucket count
    (4^4 = 256 words) before the exact re-rank; recall vs the brute
    baseline is pytest-pinned.

    Plan: the same single user_id shuffle builds windows; stats + SAX
    word run as ONE Arrow numpy pass (``ts_sax_windows_gemm`` —
    bit-exact with the expression form, pytest-pinned); the
    ≤N_TS_PROBES probe rows BROADCAST into an equi-join on word (never
    a cross join), and the rank is candidate-sized. At 100 TB the word
    IS a partition column of the stored window index
    (``sax_store.write_windows``) — probes then read only their word's
    partitions (PartitionFilters-pinned), the ivf_store pattern."""
    return ts_sax_topk(spark, table(spark, sf_dir, "events"))


# ------------------------- motif + discord discovery (matrix-profile) -

# The OTHER half of subsequence analytics: no probe at all. A MOTIF is
# the closest pair of non-overlapping windows within one series (the
# repeated pattern — Matrix Profile's primary object, cf. Yeh et al.,
# "Matrix Profile I", ICDM 2016); a DISCORD is the window whose
# NEAREST non-overlapping neighbor is farthest (the anomaly — no other
# stretch of the series ever looked like it). Both are self-join
# discovery over the same z-normalized windows the probe queries use —
# a different op class from ts_subsequence_match/sax (those retrieve
# vs a given probe; these mine the series against itself), so they get
# their own library rows rather than riding the probe family's hash.
#
# Exclusion zone: windows overlap iff their start ROW positions differ
# by < TS_WINDOW (trivial-match suppression — adjacent windows are
# near-identical by construction). Positions are per-user row_numbers
# attached at the raw-window stage, BEFORE the zero-variance filter:
# filtering first would renumber survivors and let two row-sharing
# windows masquerade as non-overlapping.
#
# Float parity: identical discipline to the probe family — exact
# int64 window sums, single-division mu/m2, per-element
# (c - mu) / sd z-normalization, and the squared distance accumulated
# dimension-by-dimension in index order (the oracle's list_reduce
# left fold; 0.0 + x == x exactly). Ranks order on the exact double
# BEFORE the 6-decimal display rounding, ties broken on ids.

TS_MOTIF_K = 5          # pairs reported (motif) / windows reported (discord)
_TS_PAIR_CTES = f"""
WITH e AS (
  SELECT user_id, event_id AS seq, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
  WHERE user_id IS NOT NULL AND event_id IS NOT NULL AND value IS NOT NULL
),
win AS (
  SELECT user_id, seq,
    row_number() OVER (PARTITION BY user_id ORDER BY seq) AS rn,
    list(cents) OVER (PARTITION BY user_id ORDER BY seq
                      ROWS BETWEEN CURRENT ROW AND {TS_WINDOW - 1} FOLLOWING)
      AS w
  FROM e
),
m AS (
  SELECT user_id, seq, rn, w,
    CAST(list_sum(w) AS DOUBLE) / {TS_WINDOW} AS mu,
    CAST(list_sum(list_transform(w, x -> x * x)) AS DOUBLE) / {TS_WINDOW} AS m2
  FROM win WHERE len(w) = {TS_WINDOW}
),
nz AS (
  SELECT user_id, seq, rn, w, mu, SQRT(m2 - mu * mu) AS sd
  FROM m WHERE m2 - mu * mu > 0
)"""

TS_MOTIF_SQL = f"""{_TS_PAIR_CTES},
pairs AS (
  SELECT a.user_id, a.seq AS seq_a, b.seq AS seq_b,
    list_reduce(list_transform(list_zip(a.w, b.w),
      s -> (((s[1] - a.mu) / a.sd) - ((s[2] - b.mu) / b.sd))
         * (((s[1] - a.mu) / a.sd) - ((s[2] - b.mu) / b.sd))),
      (acc, x) -> acc + x) AS dist2
  FROM nz a JOIN nz b
    ON a.user_id = b.user_id AND b.rn >= a.rn + {TS_WINDOW}
)
SELECT user_id, seq_a, seq_b,
  CAST(ROUND(dist2, 6) AS DOUBLE) AS dist2, CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (
        ORDER BY dist2 ASC, user_id, seq_a, seq_b) AS rank FROM pairs)
WHERE rank <= {TS_MOTIF_K}
"""

TS_DISCORD_SQL = f"""{_TS_PAIR_CTES},
pairs AS (
  SELECT a.user_id, a.seq, b.seq AS other_seq,
    list_reduce(list_transform(list_zip(a.w, b.w),
      s -> (((s[1] - a.mu) / a.sd) - ((s[2] - b.mu) / b.sd))
         * (((s[1] - a.mu) / a.sd) - ((s[2] - b.mu) / b.sd))),
      (acc, x) -> acc + x) AS dist2
  FROM nz a JOIN nz b
    ON a.user_id = b.user_id
   AND (b.rn - a.rn >= {TS_WINDOW} OR a.rn - b.rn >= {TS_WINDOW})
),
nn AS (
  SELECT user_id, seq, other_seq AS nn_seq, dist2,
    row_number() OVER (PARTITION BY user_id, seq
                       ORDER BY dist2 ASC, other_seq) AS r2
  FROM pairs
)
SELECT user_id, seq, nn_seq,
  CAST(ROUND(dist2, 6) AS DOUBLE) AS dist2, CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (
        ORDER BY dist2 DESC, user_id, seq) AS rank FROM nn WHERE r2 = 1)
WHERE rank <= {TS_MOTIF_K}
"""

# Loud compute-bound guard, the _check_cents_bound pattern: per-series
# pair discovery is O(m²) in that series' window count. 32,768 windows
# is ~5·10⁸ pairs for ONE series — past any sane single-group budget;
# the scale path for longer series is SAX-word pair bucketing (only
# same-word windows pair, the ts_subsequence_sax treatment), not a
# silent cap that would change which pairs exist.
TS_MOTIF_MAX_WINDOWS = 32_768


def _ts_pair_topk_kernel(discord: bool):
    """Per-series Arrow kernel shared by motif and discord: all
    non-overlapping window pairs of ONE user's series, exact
    z-normalized distances (left-fold over dimensions — bit-exact
    with the oracle's list_reduce), reduced INSIDE the kernel to the
    per-series top-K (smallest pairs for motif; per-window nearest
    neighbor then largest-nn windows for discord) so each group emits
    ≤K rows no matter how long the series is. Row blocks of 256 bound
    the pair matrix at block×m doubles."""
    import numpy as np
    import pandas as pd

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        out_cols = (
            ["user_id", "seq", "nn_seq", "dist2"]
            if discord
            else ["user_id", "seq_a", "seq_b", "dist2"]
        )
        if len(pdf) > TS_MOTIF_MAX_WINDOWS:
            raise OverflowError(
                f"ts motif/discord: {len(pdf)} windows in one series "
                f"exceeds TS_MOTIF_MAX_WINDOWS={TS_MOTIF_MAX_WINDOWS} "
                "(O(m²) pair discovery) — route long series through "
                "SAX-word pair bucketing instead"
            )
        # group row order is not guaranteed post-shuffle; ascending seq
        # makes argmax-first tie-breaks mean "smallest seq" below
        pdf = pdf.sort_values("seq", kind="mergesort").reset_index(drop=True)
        W = np.array(list(pdf["w"]), dtype=np.int64)
        _check_cents_bound(W)
        s = W.sum(axis=1)
        sq = (W * W).sum(axis=1)
        mu = s.astype(np.float64) / TS_WINDOW
        m2 = sq.astype(np.float64) / TS_WINDOW
        var = m2 - mu * mu
        keep = var > 0
        if keep.sum() < 2:
            return pd.DataFrame(columns=out_cols)
        sd = np.sqrt(var[keep])
        Z = (W[keep].astype(np.float64) - mu[keep][:, None]) / sd[:, None]
        rns = pdf["rn"].to_numpy()[keep]
        seqs = pdf["seq"].to_numpy()[keep]
        user = int(pdf["user_id"].iloc[0])
        m = Z.shape[0]
        rows = []          # motif: per-block top-K candidate tuples
        nn_d = np.full(m, np.inf)       # discord: running per-window nn
        nn_j = np.full(m, -1, dtype=np.int64)
        for lo in range(0, m, 256):
            hi = min(lo + 256, m)
            gap = rns[None, :] - rns[lo:hi, None]       # block × m
            valid = (
                np.abs(gap) >= TS_WINDOW if discord else gap >= TS_WINDOW
            )
            if not valid.any():
                continue
            acc = np.zeros((hi - lo, m))
            for d in range(TS_WINDOW):  # left-fold over dims
                e = Z[lo:hi, d][:, None] - Z[None, :, d]
                acc += e * e
            if discord:
                # per-row nearest valid neighbor, ties to smallest seq
                # (columns are in ascending-seq order, argmax of a
                # boolean picks the first minimum); each row's FULL
                # neighbor set is scanned in its one block pass, so
                # this is an assignment, not a running merge
                acc[~valid] = np.inf
                bmin = acc.min(axis=1)
                has = np.isfinite(bmin)
                if has.any():
                    first = (acc == bmin[:, None]).argmax(axis=1)
                    idx = np.arange(lo, hi)[has]
                    nn_d[idx] = bmin[has]
                    nn_j[idx] = first[has]
            else:
                ii, jj = np.nonzero(valid)
                dist = acc[ii, jj]
                if len(dist) > TS_MOTIF_K:
                    # threshold-prefilter before the full-key sort: keep
                    # every pair at or under the K-th smallest distance
                    # (ties INCLUDED, so the id tie-break below still
                    # sees every contender — a bare top-K argpartition
                    # could drop an equal-distance pair that wins on
                    # (seq_a, seq_b) order), then lexsort only the
                    # survivors instead of O(P log P) over the block
                    kth = np.partition(dist, TS_MOTIF_K - 1)[TS_MOTIF_K - 1]
                    keep_m = dist <= kth
                    ii, jj, dist = ii[keep_m], jj[keep_m], dist[keep_m]
                order = np.lexsort((seqs[jj], seqs[lo + ii], dist))
                for t in order[:TS_MOTIF_K]:
                    rows.append(
                        (dist[t], int(seqs[lo + ii[t]]), int(seqs[jj[t]]))
                    )
        if discord:
            got = nn_j >= 0
            if not got.any():
                return pd.DataFrame(columns=out_cols)
            cand = sorted(
                (
                    (-nn_d[i], int(seqs[i]), int(seqs[nn_j[i]]))
                    for i in np.nonzero(got)[0]
                ),
            )[:TS_MOTIF_K]
            return pd.DataFrame(
                {
                    "user_id": np.full(len(cand), user, dtype=np.int64),
                    "seq": [c[1] for c in cand],
                    "nn_seq": [c[2] for c in cand],
                    "dist2": [-c[0] for c in cand],
                }
            )
        if not rows:
            return pd.DataFrame(columns=out_cols)
        rows.sort()
        rows = rows[:TS_MOTIF_K]
        return pd.DataFrame(
            {
                "user_id": np.full(len(rows), user, dtype=np.int64),
                "seq_a": [r[1] for r in rows],
                "seq_b": [r[2] for r in rows],
                "dist2": [r[0] for r in rows],
            }
        )

    return kern


_PAIR_SCHEMA = "user_id long, seq_a long, seq_b long, dist2 double"
_NN_SCHEMA = "user_id long, seq long, nn_seq long, dist2 double"


def _ts_global_topk(per_group: DataFrame, discord: bool) -> DataFrame:
    """Shared tail of every discovery variant: global top-K over the
    ≤K-per-group survivors as a distributed TakeOrderedAndProject
    (never a full sort), rank attached over the K-row result."""
    order = (
        [F.desc("dist2"), "user_id", "seq"]
        if discord
        else [F.asc("dist2"), "user_id", "seq_a", "seq_b"]
    )
    top = per_group.orderBy(*order).limit(TS_MOTIF_K)
    # rank over the ≤K surviving rows; the constant partition key is
    # cosmetic (silences the no-partition WindowExec warning — the
    # frame is already K rows by construction)
    rw = Window.partitionBy(F.lit(0)).orderBy(*order)
    keys = ["seq", "nn_seq"] if discord else ["seq_a", "seq_b"]
    return top.select(
        "user_id", *keys,
        F.round("dist2", 6).alias("dist2"),
        F.row_number().over(rw).cast("int").alias("rank"),
    )


def _ts_pair_topk(ev: DataFrame, discord: bool) -> DataFrame:
    """Shared driver of both exact discovery ops: one user_id shuffle
    builds rn-carrying raw windows, the per-series kernel reduces each
    group to ≤K rows, then the shared global-top-K tail."""
    per_user = (
        _ts_raw_windows(ev, with_rn=True)
        .groupBy("user_id")
        .applyInPandas(
            _ts_pair_topk_kernel(discord),
            _NN_SCHEMA if discord else _PAIR_SCHEMA,
        )
    )
    return _ts_global_topk(per_user, discord)


def ts_motif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K motifs: the closest non-overlapping window pairs within
    any one user's series (the repeated pattern screen — "has this
    exact shape happened in this series before?"). Library op; oracle
    TS_MOTIF_SQL.

    Plan: ONE shuffle on user_id builds rn-carrying windows; pair
    enumeration, exact distances, and the per-series top-K all happen
    INSIDE the per-series Arrow kernel (≤K rows leave each group), and
    the global rank is a TakeOrderedAndProject over ≤K·users rows. Per
    series the work is O(m²) with a loud TS_MOTIF_MAX_WINDOWS guard —
    at 100 TB a long series routes through SAX-word pair bucketing
    (same-word windows only), the ts_subsequence_sax treatment."""
    return _ts_pair_topk(table(spark, sf_dir, "events"), discord=False)


def ts_discord(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K discords: the windows whose NEAREST non-overlapping
    neighbor within their own series is farthest (the anomaly screen —
    "no other stretch of this series ever looked like this"). Library
    op; oracle TS_DISCORD_SQL. Same plan shape as ``ts_motif``; the
    kernel keeps a per-window running nearest-neighbor instead of a
    pair heap, still emitting ≤K rows per series.

    No SAX-bucketed sibling, deliberately: bucketing prunes CANDIDATE
    pairs, which is sound for motif (closest pairs share a word) but
    unsound for discord — a window's true nearest neighbor may sit in
    another bucket, and missing it INFLATES the nn distance, i.e.
    manufactures false discords. Discord pruning needs best-so-far
    lower bounds (the matrix-profile early-abandon family), not
    partitioning."""
    return _ts_pair_topk(table(spark, sf_dir, "events"), discord=True)


# ----------------------------- autocorrelation (seasonality screen) --

# The third leg of the time-series family beside search (probe
# retrieval) and discovery (motif/discord pair mining): per-series
# SAMPLE AUTOCORRELATION at fixed small lags — the standard
# seasonality / mean-reversion screen (r_k ≈ 1: trending; r_1 < 0:
# mean-reverting tick series; a spike at lag k: period-k seasonality).
#
# Exactness (the embedding_gram treatment applied to ACF): the
# centered estimator r_k = Σ(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)² is NOT
# cross-engine safe as written — it sums products of doubles in
# engine-chosen order. Expand it instead so ONLY exact BIGINT
# aggregates cross the shuffle (order-free by exactness): n, S=Σx,
# Q=Σx², and per lag C_k=Σ x_t·x_{t+k}, H_k=Σ_{t≤n−k} x_t,
# T_k=Σ_{t>k} x_t. Then with mu = S/n (one double division),
#   num_k = C_k − mu·(H_k + T_k) + (n−k)·mu·mu
#   den   = Q − S·mu
# — a FIXED sequence of correctly-rounded double ops from exact
# integers, identical on both engines; ROUND(·,6) closes the display.
# Overflow is loud on both sides: Spark's ANSI BIGINT sum throws,
# DuckDB computes HUGEINT then the explicit BIGINT cast errors.

TS_ACF_LAGS = (1, 2, 3, 4)

_ACF_LAG_AGG_SQL = ",\n".join(
    f"""    CAST(SUM(cents * lead{k}) AS BIGINT) AS c{k},
    CAST(SUM(CASE WHEN lead{k} IS NOT NULL THEN cents END) AS BIGINT) AS h{k},
    CAST(SUM(CASE WHEN lag{k} IS NOT NULL THEN cents END) AS BIGINT) AS t{k}"""
    for k in TS_ACF_LAGS
)
_ACF_LEAD_COLS_SQL = ",\n".join(
    f"""    lead(cents, {k}) OVER (PARTITION BY user_id ORDER BY seq)
      AS lead{k},
    lag(cents, {k}) OVER (PARTITION BY user_id ORDER BY seq) AS lag{k}"""
    for k in TS_ACF_LAGS
)
_ACF_ROWS_SQL = " UNION ALL ".join(
    f"""SELECT user_id, {k} AS lag,
      (c{k} - mu * (h{k} + t{k}) + (n - {k}) * mu * mu) / den AS acf
    FROM g WHERE n > {k}"""
    for k in TS_ACF_LAGS
)

TS_ACF_SQL = f"""
WITH e AS (
  SELECT user_id, event_id AS seq, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
  WHERE user_id IS NOT NULL AND event_id IS NOT NULL AND value IS NOT NULL
),
w AS (
  SELECT user_id, cents,
{_ACF_LEAD_COLS_SQL}
  FROM e
),
a AS (
  SELECT user_id,
    COUNT(*) AS n,
    CAST(SUM(cents) AS BIGINT) AS s,
    CAST(SUM(cents * cents) AS BIGINT) AS q,
{_ACF_LAG_AGG_SQL}
  FROM w GROUP BY user_id
),
g AS (
  SELECT *, CAST(s AS DOUBLE) / n AS mu,
    CAST(q AS DOUBLE) - s * (CAST(s AS DOUBLE) / n) AS den
  FROM a WHERE CAST(q AS DOUBLE) - s * (CAST(s AS DOUBLE) / n) > 0
)
SELECT user_id, CAST(lag AS INT) AS lag,
  CAST(ROUND(acf, 6) AS DOUBLE) AS acf
FROM ({_ACF_ROWS_SQL})
ORDER BY user_id, lag
"""


def ts_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series sample autocorrelation at lags 1..4 over the events
    value streams — the seasonality / mean-reversion screen beside the
    family's search and discovery ops. Library op; oracle TS_ACF_SQL
    (see the block comment above for the exact-BIGINT expansion that
    makes the centered estimator cross-engine deterministic).

    Plan: ONE shuffle on user_id; the per-lag lead/lag columns share
    the same window sort; every aggregate crossing the partial-agg
    boundary is an exact BIGINT (order-free), and the double work is a
    fixed per-row expression on the user-cardinality result. Constant
    output width (|lags| rows per user); zero-variance series drop on
    both sides."""
    # cents via the family's shared projection; safe even on hostile
    # half-cents — scale-0 DOUBLE ROUND is half-away-from-zero on
    # BOTH engines (verified ±12.5 → ±13 in Spark and this DuckDB;
    # the r16 half-even caution applies to other rounding constructs,
    # not this one), and an n≥2 op actually meets those rows where
    # the ≥16-event window family never forms a full window
    e = events_cents(table(spark, sf_dir, "events"))
    wspec = Window.partitionBy("user_id").orderBy("seq")
    cols = [F.col("user_id"), F.col("cents")]
    for k in TS_ACF_LAGS:
        cols.append(F.lead("cents", k).over(wspec).alias(f"lead{k}"))
        cols.append(F.lag("cents", k).over(wspec).alias(f"lag{k}"))
    w = e.select(*cols)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("bigint").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("q"),
    ]
    for k in TS_ACF_LAGS:
        aggs.append(
            F.sum(F.col("cents") * F.col(f"lead{k}"))
            .cast("bigint").alias(f"c{k}")
        )
        aggs.append(
            F.sum(
                F.when(F.col(f"lead{k}").isNotNull(), F.col("cents"))
            ).cast("bigint").alias(f"h{k}")
        )
        aggs.append(
            F.sum(
                F.when(F.col(f"lag{k}").isNotNull(), F.col("cents"))
            ).cast("bigint").alias(f"t{k}")
        )
    a = w.groupBy("user_id").agg(*aggs)
    mu = F.col("s").cast("double") / F.col("n")
    den = F.col("q").cast("double") - F.col("s") * mu
    g = a.withColumn("mu", mu).withColumn("den", den).where(den > 0)
    # ONE pass over the aggregate (a per-lag unionByName would
    # re-execute the whole corpus aggregation once per lag): every
    # lag's acf becomes a struct element, exploded and null-filtered
    lag_structs = []
    for k in TS_ACF_LAGS:
        acf_k = (
            F.col(f"c{k}")
            - F.col("mu") * (F.col(f"h{k}") + F.col(f"t{k}"))
            + (F.col("n") - F.lit(k)) * F.col("mu") * F.col("mu")
        ) / F.col("den")
        lag_structs.append(
            F.struct(
                F.lit(k).cast("int").alias("lag"),
                F.when(F.col("n") > k, F.round(acf_k, 6)).alias("acf"),
            )
        )
    return (
        g.select("user_id", F.explode(F.array(*lag_structs)).alias("r"))
        .where(F.col("r.acf").isNotNull())
        .select("user_id", "r.lag", "r.acf")
        .orderBy("user_id", "lag")
    )


TS_MOTIF_SAX_SQL = f"""{_TS_PAIR_CTES},
sx AS (SELECT *, {_SAX_WORD_SQL} AS word FROM nz),
pairs AS (
  SELECT a.user_id, a.seq AS seq_a, b.seq AS seq_b,
    list_reduce(list_transform(list_zip(a.w, b.w),
      s -> (((s[1] - a.mu) / a.sd) - ((s[2] - b.mu) / b.sd))
         * (((s[1] - a.mu) / a.sd) - ((s[2] - b.mu) / b.sd))),
      (acc, x) -> acc + x) AS dist2
  FROM sx a JOIN sx b
    ON a.user_id = b.user_id AND a.word = b.word
   AND b.rn >= a.rn + {TS_WINDOW}
)
SELECT user_id, seq_a, seq_b,
  CAST(ROUND(dist2, 6) AS DOUBLE) AS dist2, CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (
        ORDER BY dist2 ASC, user_id, seq_a, seq_b) AS rank FROM pairs)
WHERE rank <= {TS_MOTIF_K}
"""


def ts_motif_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX-bucketed motif discovery — ``ts_motif``'s scale path made
    real, the ts_subsequence_sax treatment applied to PAIR mining:
    windows pair only with same-word windows of their own series, so a
    series' O(m²) collapses to Σ_word m_word² (identical windows share
    a word by construction, so an exact repeat is never pruned — the
    planted-pair pytest pins that, and a recall pytest scores the
    bucketed top-K against the brute op). Library op; oracle
    TS_MOTIF_SAX_SQL — its own deterministic bucketed semantics, like
    the retrieval family's SAX row.

    Plan: the user_id shuffle builds rn-carrying windows; stats + the
    SAX word attach as JVM expressions (no second corpus pass); the
    (user_id, word) grouping is satisfied by the existing user_id
    partitioning (subset-of-clustering-keys), so the pair-set
    collapse costs NO extra shuffle (plan-pinned) — the same pair
    kernel + global-top-K tail finish ≤K rows per group. At 100 TB
    the (user, word) grouping reads straight off the persisted
    ``sax_store`` word partitions."""
    win = attach_window_stats(
        _ts_raw_windows(table(spark, sf_dir, "events"), with_rn=True)
    ).withColumn("word", sax_word_col())
    per_group = (
        win.select("user_id", "seq", "rn", "w", "word")
        .groupBy("user_id", "word")
        .applyInPandas(_ts_pair_topk_kernel(discord=False), _PAIR_SCHEMA)
    )
    return _ts_global_topk(per_group, discord=False)
