"""Multimodal ops: pure-Python replay oracles for the Pandas-UDF
kernels the DuckDB gate can't express (byte-histogram features, decode+
resize), plus schema/determinism invariants for the binary plumbing."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from trisk_spark.functions import multimodal as mm

SF = "/root/testdata/sf0.001"


def _docs() -> list[tuple[int, str]]:
    return duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()


def test_byte_features_matches_python_fold(spark):
    got = {
        r["doc_id"]: [r["n_bytes"]] + [r[f"bin{i}"] for i in range(mm.N_HIST_BINS)]
        for r in (x.asDict() for x in mm.media_byte_features(spark, SF).collect())
    }
    want = {doc_id: mm.byte_features_py(text) for doc_id, text in _docs()}
    assert got == want


def test_frame_sample_matches_python_fold(spark):
    rows = mm.media_frame_sample(spark, SF).collect()
    got = {(r.doc_id, r.frame_idx): r.frame_md5 for r in rows}
    assert len(got) == len(rows), "duplicate (doc, frame) emitted"
    want = {}
    for doc_id, text in _docs():
        if doc_id % 3 != 2:  # video = doc_id % 3 == 2
            continue
        data = text.encode()
        for idx in range(0, len(data) // mm.FRAME_BYTES, mm.FRAME_STRIDE):
            frame = data[idx * mm.FRAME_BYTES:(idx + 1) * mm.FRAME_BYTES]
            want[(doc_id, idx)] = hashlib.md5(frame).hexdigest()
    assert got == want
    assert want, "no video frames in fixture — test is vacuous"


def test_decode_resize_deterministic_and_shaped(spark):
    df = mm.media_decode_resize(spark, SF)
    rows1 = {r.doc_id: bytes(r.pixels) for r in df.collect()}
    rows2 = {r.doc_id: bytes(r.pixels) for r in df.collect()}
    assert rows1 == rows2, "resize kernel not deterministic"
    assert rows1, "no image rows"
    assert all(len(p) == mm.OUT_W * mm.OUT_H for p in rows1.values())
    # replay one doc through the kernel's math
    import numpy as np

    doc_id, text = next((d, t) for d, t in _docs() if d % 3 == 0)
    img = mm._decode_image(text.encode(), 0, 0)
    ys = (np.arange(mm.OUT_H) * img.shape[0]) // mm.OUT_H
    xs = (np.arange(mm.OUT_W) * img.shape[1]) // mm.OUT_W
    assert rows1[doc_id] == img[np.ix_(ys, xs)].astype(np.uint8).tobytes()


def test_media_view_blob_roundtrip(spark):
    m = mm.media(spark, SF).select("doc_id", "blob").collect()
    texts = dict(_docs())
    assert all(bytes(r.blob).decode() == texts[r.doc_id] for r in m)


@pytest.mark.parametrize("name", ["media_byte_features", "media_decode_resize"])
def test_rows_only_queries_nonempty(spark, name):
    from trisk_spark.registry import load_all

    df = load_all()[name].fn(spark, SF)
    assert df.count() > 0
