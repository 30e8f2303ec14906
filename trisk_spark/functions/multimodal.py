"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, plus decode / feature-extract / resize /
frame-sample over ``mapInPandas``.

The container ships no media libs and the testdata has no real media, so
the *bytes* are synthesized deterministically from ``documents.text``
(UTF-8 encode — pure ASCII, so byte offsets == char offsets and DuckDB
can oracle byte-slicing with VARCHAR substr). The decode step is REAL:
image blobs are wrapped into valid P5 PGM containers by JVM binary
expressions and ``decode_pgm`` is a genuine spec-conforming Netpbm
parser (it decodes any 8-bit P5 file, pytest-pinned pixel-exact against
an independent encoder); only non-PGM bytes fall back to a
deterministic canvas. Everything Spark-side — binary schema, Arrow
batch shape, mapInPandas signatures, partitioning — is real and is what
would run unchanged on real media at 100 TB.

Scale design: media ops are embarrassingly parallel map-side work (no
shuffle at all — mapInPandas over the scan); the only knob that matters
at 100 TB is input split size (`spark.sql.files.maxPartitionBytes`) so
one Arrow batch of blobs fits executor memory, and keeping the blob
column OUT of any shuffle key. Metadata aggregations shuffle only
(type, bigint) pairs, never bytes.

Reference has no media path at all (text/Kafka only —
SURVEY.md §2A sources); this module is the beyond-reference
training-data-pipeline mandate.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from trisk_spark.catalog import table
from trisk_spark.registry import register

FRAME_BYTES = 16      # "video" frame size in bytes
FRAME_STRIDE = 4      # sample every 4th frame
N_HIST_BINS = 8       # byte-histogram feature bins
FAKE_W, FAKE_H = 16, 12   # fake decoded canvas (w, h)
OUT_W, OUT_H = 4, 3       # resize target


def media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived media view: documents.text → binary blob + typed metadata.
    media_type cycles image/audio/video by doc_id; width/height are
    deterministic metadata (the fake "container header")."""
    docs = table(spark, sf_dir, "documents")
    # NULL text ≠ a media asset, and NULL doc_id ≠ an asset id: drop
    # both here (both engines) so the byte kernels never see a NULL
    # blob and the per-id media_type/width/height derivations never
    # hit NULL arithmetic (DuckDB CONCAT swallows NULLs; list[NULL]
    # and element_at NULL agree today but are fragile)
    docs = docs.where(F.col("text").isNotNull() & F.col("doc_id").isNotNull())
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("blob"),
        # pmod: a negative doc_id would drive % 3 + 1 to index 0 where
        # ANSI element_at throws (same class as the person-state fix)
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("doc_id"), 3) + 1).cast("int"),
        ).alias("media_type"),
        # pmod here too: signed % on a negative doc_id yields width 0
        # (doc_id = -18: -2*16+32) and ANSI then dies on blob/width in
        # the resize, or negative widths poisoning total_pixels
        (32 + F.pmod(F.col("doc_id"), 8) * 16).cast("int").alias("width"),
        (32 + F.pmod(F.col("doc_id"), 5) * 16).cast("int").alias("height"),
    )


_MEDIA_SQL = """
SELECT doc_id, encode(text) AS blob,
  (['image', 'audio', 'video'])[CAST(((doc_id % 3) + 3) % 3 AS INT) + 1] AS media_type,
  CAST(32 + ((doc_id % 8) + 8) % 8 * 16 AS INT) AS width,
  CAST(32 + ((doc_id % 5) + 5) % 5 * 16 AS INT) AS height
FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
"""

# ------------------------------------------------- metadata rollup ---

MEDIA_METADATA_SQL = f"""
WITH m AS ({_MEDIA_SQL})
SELECT media_type, COUNT(*) AS n_assets,
  CAST(SUM(octet_length(blob)) AS BIGINT) AS total_bytes,
  CAST(MAX(octet_length(blob)) AS BIGINT) AS max_bytes,
  CAST(SUM(CAST(width AS BIGINT) * height) AS BIGINT) AS total_pixels
FROM m GROUP BY media_type
"""


@register("media_metadata", oracle=MEDIA_METADATA_SQL)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata rollup per media_type. The blob column never
    enters the shuffle — octet_length is computed at the scan and only
    (type, bigint) rows move."""
    m = media(spark, sf_dir)
    nb = F.expr("octet_length(blob)")
    return m.groupBy("media_type").agg(
        F.count("*").alias("n_assets"),
        F.sum(nb).alias("total_bytes"),
        F.max(nb).cast("bigint").alias("max_bytes"),
        F.sum(F.col("width").cast("bigint") * F.col("height")).alias("total_pixels"),
    )


# --------------------------------------------------- frame sampling --

_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: slice each blob into FRAME_BYTES frames, keep
    every FRAME_STRIDE-th, emit md5 per kept frame."""
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_md5": []}
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            data = bytes(blob)
            for idx in range(0, len(data) // FRAME_BYTES, FRAME_STRIDE):
                frame = data[idx * FRAME_BYTES:(idx + 1) * FRAME_BYTES]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_md5"].append(hashlib.md5(frame).hexdigest())
        yield pd.DataFrame(out)


MEDIA_FRAME_SAMPLE_SQL = f"""
WITH m AS ({_MEDIA_SQL}),
v AS (SELECT doc_id, text FROM documents JOIN m USING (doc_id)
      WHERE media_type = 'video'),
idx AS (
  SELECT doc_id, text,
    unnest(range(0, length(text) // {FRAME_BYTES}, {FRAME_STRIDE})) AS fi
  FROM v
)
SELECT doc_id, CAST(fi AS INT) AS frame_idx,
  md5(substr(text, CAST(fi * {FRAME_BYTES} + 1 AS INT), {FRAME_BYTES})) AS frame_md5
FROM idx
"""


@register("media_frame_sample", oracle=MEDIA_FRAME_SAMPLE_SQL)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video blobs: every FRAME_STRIDE-th
    FRAME_BYTES-slice, hashed. Arrow-batched mapInPandas directly over
    the scan — zero shuffle; the oracle slices the same bytes as VARCHAR
    (corpus is ASCII so char == byte offsets)."""
    v = media(spark, sf_dir).where(F.col("media_type") == "video").select(
        "doc_id", "blob"
    )
    return v.mapInPandas(_sample_frames, _FRAME_SCHEMA)


# ---------------------------------------- byte-histogram features ----

_FEAT_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("n_bytes", LongType())]
    + [StructField(f"bin{i}", LongType()) for i in range(N_HIST_BINS)]
)


def _byte_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Feature extraction kernel: 8-bin byte histogram per blob
    (numpy over the Arrow batch — the shape real image featurizers
    have: bytes in, fixed-width numeric vector out)."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            arr = np.frombuffer(bytes(blob), dtype=np.uint8)
            hist = np.bincount(arr >> 5, minlength=N_HIST_BINS)
            rows.append([doc_id, len(arr), *hist.tolist()])
        yield pd.DataFrame(rows, columns=[f.name for f in _FEAT_SCHEMA.fields])


def byte_features_py(text: str) -> list[int]:
    """Pure-Python oracle for tests: same 8-bin histogram."""
    data = text.encode()
    hist = [0] * N_HIST_BINS
    for b in data:
        hist[b >> 5] += 1
    return [len(data), *hist]


BYTE_FEATURES_SQL = (
    # BYTE-exact under any encoding: slice the blob's hex string two
    # chars per byte (DuckDB v1.0.0 has no BLOB substring, but hex()
    # round-trips every byte). A per-char ascii() oracle would return
    # CODEPOINTS and diverge from the engine's UTF-8 byte histogram the
    # moment the driver corpus grows a non-ASCII character — the same
    # environment-drift class as the round-4 TIMESTAMP_NTZ break.
    # Empty docs: range(1, 1) yields no rows; the LEFT JOIN zero-fills.
    """
WITH h AS (
  SELECT doc_id, hex(encode(text)) AS hx,
    unnest(range(1, octet_length(encode(text)) + 1)) AS i
  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
),
b AS (
  SELECT doc_id,
    CAST(CONCAT('0x', substr(hx, CAST(i * 2 - 1 AS INT), 2)) AS INT) >> 5 AS bin
  FROM h
)
SELECT d.doc_id,
  CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
  """
    + ",\n  ".join(
        f"CAST(COUNT(CASE WHEN b.bin = {i} THEN 1 END) AS BIGINT) AS bin{i}"
        for i in range(N_HIST_BINS)
    )
    + """
FROM (SELECT * FROM documents
      WHERE text IS NOT NULL AND doc_id IS NOT NULL) d
LEFT JOIN b USING (doc_id)
GROUP BY d.doc_id, d.text
"""
)


@register("media_byte_features", oracle=BYTE_FEATURES_SQL)
def media_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction (8-bin byte histogram) over all
    media blobs. The oracle is byte-exact under ANY text encoding: it
    hexes encode(text) and slices two hex chars per byte, so it
    histograms UTF-8 BYTES (not codepoints) — identical to the engine's
    blob path even if the corpus grows non-ASCII characters;
    tests/test_multimodal.py additionally holds the pure-Python fold
    oracle. Zero-shuffle map work."""
    m = media(spark, sf_dir).select("doc_id", "blob")
    return m.mapInPandas(_byte_features, _FEAT_SCHEMA)


# ------------------------------------------------ decode + resize ----


def decode_pgm(data: bytes):
    """REAL P5 (binary) PGM decoder — no media libs needed. Per the
    Netpbm spec: magic ``P5``, then three ASCII integers (width,
    height, maxval) separated by whitespace, with ``#``-to-end-of-line
    comments allowed anywhere in the header, then exactly ONE
    whitespace byte, then the raw samples: one byte per pixel for
    maxval ≤ 255, two bytes (big-endian, MSB first per spec) for
    maxval 256–65535. 16-bit samples are scaled to 8-bit as
    ``floor(sample * 255 / maxval)`` so the return type is always an
    (h, w) uint8 array; returns None if the bytes are not a valid P5
    (caller decides the fallback). Decodes any conforming P5 file, not
    just this corpus's containers — pixel-exactness is pinned by
    tests/test_multimodal.py against an independent reference encoder
    (8- and 16-bit fixtures)."""
    import numpy as np

    if not data.startswith(b"P5"):
        return None
    pos = 2
    fields: list[int] = []
    while len(fields) < 3 and pos < len(data):
        c = data[pos : pos + 1]
        if c in (b" ", b"\t", b"\r", b"\n"):
            pos += 1
        elif c == b"#":
            nl = data.find(b"\n", pos)
            if nl < 0:
                return None
            pos = nl + 1
        elif c.isdigit():
            end = pos
            while end < len(data) and data[end : end + 1].isdigit():
                end += 1
            fields.append(int(data[pos:end]))
            pos = end
        else:
            return None
    if len(fields) < 3:
        return None
    if data[pos : pos + 1] not in (b" ", b"\t", b"\r", b"\n"):
        return None
    pos += 1
    w, h, maxval = fields
    if w <= 0 or h <= 0 or not 1 <= maxval <= 65535:
        return None
    # one byte/sample for maxval in [1, 255]; two bytes (big-endian)
    # for [256, 65535] — previously the 16-bit case returned None and
    # the caller tiled the raw bytes onto a fake canvas, silently
    # producing plausible-looking wrong pixels for a real 16-bit file
    bpp = 1 if maxval <= 255 else 2
    n = w * h * bpp
    payload = data[pos : pos + n]
    if len(payload) < n:
        return None
    if bpp == 1:
        return np.frombuffer(payload, dtype=np.uint8).reshape(h, w)
    raw = np.frombuffer(payload, dtype=">u2").astype(np.uint32)
    # spec-invalid samples (> maxval) scale past 255; clamp rather than
    # let the uint8 cast wrap mod 256 into plausible-looking wrong
    # pixels — the same silent-corruption class the 16-bit path itself
    # was added to fix
    return np.minimum((raw * 255) // maxval, 255).astype(np.uint8).reshape(h, w)


def _decode_image(blob: bytes):
    """Decode: REAL PGM parse first (``decode_pgm``); only bytes that
    are not a valid P5 container fall back to the deterministic canvas
    (blob bytes tiled row-major onto FAKE_W×FAKE_H) so an unknown
    format degrades predictably instead of crashing the executor.
    Returns ``(img, decoded_ok)`` — the boolean surfaces the fallback
    to the caller so canvas pixels can never masquerade as a real
    decode downstream."""
    import numpy as np

    img = decode_pgm(bytes(blob))
    if img is not None:
        return img, True
    tiled = np.resize(np.frombuffer(blob, dtype=np.uint8), FAKE_W * FAKE_H)
    return tiled.reshape(FAKE_H, FAKE_W), False


_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("pixels", BinaryType()),
        StructField("decoded_ok", BooleanType()),
    ]
)


def _resize_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode (real PGM parse; canvas fallback for non-PGM bytes,
    flagged decoded_ok=false) then nearest-neighbor resize to
    OUT_W×OUT_H."""
    import numpy as np

    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [], "out_w": [], "out_h": [], "pixels": [],
            "decoded_ok": [],
        }
        for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
            img, ok = _decode_image(bytes(blob))
            ys = (np.arange(OUT_H) * img.shape[0]) // OUT_H
            xs = (np.arange(OUT_W) * img.shape[1]) // OUT_W
            resized = img[np.ix_(ys, xs)].astype(np.uint8)
            out["doc_id"].append(doc_id)
            out["out_w"].append(OUT_W)
            out["out_h"].append(OUT_H)
            out["pixels"].append(resized.tobytes())
            out["decoded_ok"].append(ok)
        yield pd.DataFrame(out)


@register("media_decode_resize", oracle=None)
def media_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode + nearest-neighbor resize of image blobs.

    The corpus has no binary media (documents.text is the payload
    source), so the image container is synthesized IN THE PLAN as a
    valid P5 PGM file — header from the metadata width and the
    payload-derived height, raw pixel bytes from the blob — all in JVM
    binary expressions (octet_length / substring / concat are
    byte-exact on BinaryType). The Python kernel then runs a genuine
    spec-conforming PGM parser (``decode_pgm``: magic, comment-tolerant
    header, maxval check, exact payload slice) — the same kernel
    decodes any real 8-bit P5 file; pixel-exactness is pytest-pinned
    against an independent reference encoder. Documents shorter than
    one pixel row (octet_length < width) carry no image and are
    filtered.

    oracle=None (binary out); tests replay decode+resize in pure
    Python. Zero-shuffle map work; at 100 TB this is the canonical
    'GPU-adjacent preprocessing' stage — batch size bounded by
    maxPartitionBytes, pixels never shuffled."""
    m = media(spark, sf_dir).where(F.col("media_type") == "image")
    m = m.withColumn(
        "img_h", (F.expr("octet_length(blob)") / F.col("width")).cast("int")
    ).where(F.col("img_h") >= 1)
    header = F.encode(
        F.concat(
            F.lit("P5\n"),
            F.col("width").cast("string"),
            F.lit(" "),
            F.col("img_h").cast("string"),
            F.lit("\n255\n"),
        ),
        "UTF-8",
    )
    pgm = F.concat(header, F.expr("substring(blob, 1, width * img_h)"))
    return m.select("doc_id", pgm.alias("blob")).mapInPandas(
        _resize_kernel, _RESIZE_SCHEMA
    )


# ------------------------------------- decode + resize, checksummed --

# SQL mirror of the decode→NN-resize path: the synthesized PGM's pixel
# payload is the first width*img_h BYTES of the text, and
# nearest-neighbor gather is plain integer indexing: output pixel
# (i, j) = payload[((i*img_h)//OUT_H)*width + (j*width)//OUT_W] — the
# indices mirror _resize_kernel's (np.arange(OUT)*dim)//OUT. Gathering
# is BYTE-exact under any encoding (the BYTE_FEATURES_SQL pattern):
# hex(encode(text)) is sliced two hex chars per byte — a VARCHAR
# substr on the raw text would use CHAR offsets and silently flip the
# hash on the first non-ASCII character. Both sides hash the HEX image
# of the pixel buffer (hex chars are ASCII, so the VARCHAR md5 is
# byte-identical to the engine's md5 over the same hex string; DuckDB's
# md5 has no BLOB overload).
_PX_GATHER = ", ".join(
    f"substr(hx, CAST(((({i} * img_h) // {OUT_H}) * width"
    f" + (({j} * width) // {OUT_W})) * 2 + 1 AS INT), 2)"
    for i in range(OUT_H)
    for j in range(OUT_W)
)

MEDIA_DECODE_CHECKSUM_SQL = f"""
WITH m AS ({_MEDIA_SQL}),
img AS (
  SELECT m.doc_id, hex(encode(d.text)) AS hx, m.width,
    CAST(octet_length(encode(d.text)) // m.width AS INT) AS img_h
  FROM m JOIN documents d USING (doc_id)
  WHERE m.media_type = 'image'
)
SELECT doc_id,
  CAST({OUT_W} AS INT) AS out_w,
  CAST({OUT_H} AS INT) AS out_h,
  md5(concat({_PX_GATHER})) AS pix_md5
FROM img WHERE img_h >= 1
"""


@register("media_decode_checksum", oracle=MEDIA_DECODE_CHECKSUM_SQL)
def media_decode_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``media_decode_resize`` with the pixel buffer checksummed so the
    full decode→resize path gets a DuckDB value-hash gate (the binary
    ``pixels`` column itself is not oracle-comparable): emit
    (doc_id, out_w, out_h, md5(hex(pixels))). The oracle re-derives
    every output pixel by SQL hex-byte-gather over the same synthesized
    payload (byte-exact under any text encoding — see
    MEDIA_DECODE_CHECKSUM_SQL), so a single wrong pixel anywhere in the
    decoder, header parse, or NN index math flips the hash. Same
    zero-shuffle map-only plan as the parent — the md5 is two extra JVM
    expressions."""
    df = media_decode_resize(spark, sf_dir)
    return df.select(
        "doc_id", "out_w", "out_h", F.md5(F.hex("pixels")).alias("pix_md5")
    )
