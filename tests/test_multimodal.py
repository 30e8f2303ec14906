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


def _ref_pgm(arr, comment: str | None = None) -> bytes:
    """Independent reference P5 encoder (pure Python, no numpy math
    shared with the decoder under test)."""
    h = len(arr)
    w = len(arr[0])
    hdr = "P5\n"
    if comment is not None:
        hdr += f"# {comment}\n"
    hdr += f"{w} {h}\n255\n"
    return hdr.encode() + bytes(v for row in arr for v in row)


def test_pgm_decoder_pixel_exact():
    import numpy as np

    arr = [[(3 * x + 7 * y) % 256 for x in range(9)] for y in range(5)]
    for comment in (None, "created by a real tool"):
        img = mm.decode_pgm(_ref_pgm(arr, comment))
        assert img is not None and img.shape == (5, 9)
        assert np.array_equal(img, np.array(arr, dtype=np.uint8))
    # trailing junk after the payload is tolerated (spec: readers take
    # exactly w*h bytes)
    assert np.array_equal(
        mm.decode_pgm(_ref_pgm(arr) + b"junk"), np.array(arr, dtype=np.uint8)
    )


def test_pgm_decoder_rejects_invalid():
    arr = [[1, 2], [3, 4]]
    good = _ref_pgm(arr)
    assert mm.decode_pgm(b"P6" + good[2:]) is None          # wrong magic
    assert mm.decode_pgm(good[:-1]) is None                 # short payload
    # 16-bit header with only 4 payload bytes (needs 2*2*2=8): short
    assert mm.decode_pgm(b"P5\n2 2\n65535\n" + good[-4:]) is None
    assert mm.decode_pgm(b"P5\n2 2\n70000\n" + bytes(8)) is None  # maxval>16bit
    assert mm.decode_pgm(b"not an image at all") is None
    # non-PGM bytes take the documented canvas fallback, flagged not-ok
    img, ok = mm._decode_image(b"not an image at all")
    assert img.shape == (mm.FAKE_H, mm.FAKE_W) and ok is False


def test_pgm_decoder_16bit():
    import numpy as np

    # two-byte big-endian samples, maxval 65535: value v scales to
    # floor(v * 255 / 65535)
    vals = [[0, 257, 65535], [1000, 32768, 50000]]
    payload = b"".join(
        v.to_bytes(2, "big") for row in vals for v in row
    )
    img = mm.decode_pgm(b"P5\n# 16-bit\n3 2\n65535\n" + payload)
    want = np.array(
        [[(v * 255) // 65535 for v in row] for row in vals], dtype=np.uint8
    )
    assert img is not None and img.dtype == np.uint8
    assert np.array_equal(img, want)
    # a non-65535 wide maxval scales by that maxval
    img2 = mm.decode_pgm(b"P5\n1 1\n1000\n" + (500).to_bytes(2, "big"))
    assert img2 is not None and img2[0, 0] == (500 * 255) // 1000
    # real decode path reports decoded_ok
    _, ok = mm._decode_image(b"P5\n1 1\n1000\n" + (500).to_bytes(2, "big"))
    assert ok is True


def test_decode_resize_deterministic_and_pixel_exact(spark):
    df = mm.media_decode_resize(spark, SF)
    collected = df.collect()
    assert all(r.decoded_ok for r in collected), (
        "synthesized PGM containers must take the real decode path, "
        "never the canvas fallback"
    )
    rows1 = {r.doc_id: bytes(r.pixels) for r in collected}
    rows2 = {r.doc_id: bytes(r.pixels) for r in df.collect()}
    assert rows1 == rows2, "resize kernel not deterministic"
    assert rows1, "no image rows"
    assert all(len(p) == mm.OUT_W * mm.OUT_H for p in rows1.values())
    # full pure-Python replay: rebuild every image doc's PGM container
    # from the raw text, decode with the INDEPENDENT reference layout,
    # resize with plain integer math — must be pixel-exact for ALL rows
    want = {}
    for doc_id, text in _docs():
        if doc_id % 3 != 0:  # image = doc_id % 3 == 0
            continue
        data = text.encode()
        w = 32 + (doc_id % 8) * 16
        h = len(data) // w
        if h < 1:
            continue
        rows = [list(data[y * w:(y + 1) * w]) for y in range(h)]
        px = bytes(
            rows[(y * h) // mm.OUT_H][(x * w) // mm.OUT_W]
            for y in range(mm.OUT_H)
            for x in range(mm.OUT_W)
        )
        want[doc_id] = px
    assert rows1 == want


def test_media_view_blob_roundtrip(spark):
    m = mm.media(spark, SF).select("doc_id", "blob").collect()
    texts = dict(_docs())
    assert all(bytes(r.blob).decode() == texts[r.doc_id] for r in m)


@pytest.mark.parametrize("name", ["media_byte_features", "media_decode_resize"])
def test_rows_only_queries_nonempty(spark, name):
    from trisk_spark.registry import load_all

    df = load_all()[name].fn(spark, SF)
    assert df.count() > 0


def test_pgm_decoder_clamps_spec_invalid_16bit_samples():
    # a sample GREATER than the declared maxval is spec-invalid; the
    # scaled value must clamp to 255, not wrap mod 256 into a
    # plausible-looking wrong pixel (ADVICE r7)
    import struct

    from trisk_spark.functions import multimodal as mm

    # maxval 1000; samples: legal 1000 -> 255, illegal 2000 -> would
    # scale to 510 (= 254 after a silent uint8 wrap) -> must clamp 255
    payload = struct.pack(">2H", 1000, 2000)
    img = mm.decode_pgm(b"P5\n2 1\n1000\n" + payload)
    assert img is not None and img.tolist() == [[255, 255]]


def test_decode_checksum_oracle_is_byte_exact_non_ascii(spark, tmp_path):
    # the checksum oracle gathers pixel bytes via hex(encode(text)) —
    # a char-offset substr would silently diverge on the first
    # non-ASCII character (ADVICE r7); this fixture makes the payload
    # genuinely multi-byte and requires exact parity
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from trisk_spark.registry import load_all

    from .conftest import assert_matches_oracle

    # media_type 'image' requires doc_id % 4 == 0 rows with enough text
    texts = {
        0: "héllo wörld ünïcode pixels " * 40,   # multi-byte UTF-8
        4: "plain ascii pixel payload " * 40,
        8: "ascii prefix then émojis 🙂🙃 " * 30,
    }
    docs = {
        "doc_id": list(texts),
        "text": [texts[k] for k in texts],
        "lang": ["en"] * 3,
        "source": ["fixture"] * 3,
        "n_chars": [len(texts[k]) for k in texts],
    }
    pq.write_table(pa.table(docs), tmp_path / "documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    qd = load_all()["media_decode_checksum"]
    sdf = qd.fn(spark, str(tmp_path))
    assert sdf.count() > 0, "fixture produced no image rows"
    assert_matches_oracle(sdf, con, qd.oracle)
