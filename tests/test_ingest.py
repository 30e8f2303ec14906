"""JSONL/CSV ingest: schema-enforced readers with corrupt-record
capture must load a round-tripped documents table bit-identically and
route malformed lines to the dead-letter side, never dropping rows."""

from __future__ import annotations

import json

from trisk_spark.catalog import table
from trisk_spark.sources.ingest import (
    CORRUPT_COL,
    read_documents_csv,
    read_documents_jsonl,
    split_good_and_bad,
)

from .conftest import SF_DIR


def _docs_rows(spark):
    return sorted(
        (r.doc_id, r.text, r.lang, r.source, r.n_chars)
        for r in table(spark, SF_DIR, "documents").collect()
    )


def test_jsonl_roundtrip_and_dead_letter(spark, tmp_path):
    want = _docs_rows(spark)
    lines = [
        json.dumps(
            {"doc_id": d, "text": t, "lang": lg, "source": s, "n_chars": n}
        )
        for d, t, lg, s, n in want
    ]
    bad_lines = ['{"doc_id": broken', "not json at all"]
    src = tmp_path / "docs.jsonl"
    src.write_text("\n".join(lines[:250] + [bad_lines[0]] + lines[250:] + [bad_lines[1]]) + "\n")

    raw = read_documents_jsonl(spark, str(src))
    good, bad = split_good_and_bad(raw)
    got = sorted(
        (r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in good.collect()
    )
    assert got == want, "round-trip lost or mangled rows"
    assert good.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    captured = sorted(r[CORRUPT_COL] for r in bad.collect())
    assert captured == sorted(bad_lines), "malformed lines not captured whole"
    raw.unpersist()


def test_csv_roundtrip_with_quoted_delimiters(spark, tmp_path):
    want = _docs_rows(spark)
    import csv as _csv
    import io

    buf = io.StringIO()
    w = _csv.writer(buf, quoting=_csv.QUOTE_ALL)
    # the corrupt-capture column is virtual — the physical file carries
    # only the five data columns
    w.writerow(["doc_id", "text", "lang", "source", "n_chars"])
    for d, t, lg, s, n in want:
        # commas + quotes injected into text to exercise quoting
        w.writerow([d, t + ', "quoted, tail"', lg, s, n])
    src = tmp_path / "docs.csv"
    src.write_text(buf.getvalue())

    good, bad = split_good_and_bad(read_documents_csv(spark, str(src)))
    got = sorted(
        (r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in good.collect()
    )
    assert got == sorted(
        (d, t + ', "quoted, tail"', lg, s, n) for d, t, lg, s, n in want
    )
    assert bad.count() == 0


def test_downstream_ops_run_on_ingested_corpus(spark, tmp_path):
    # the ingest output must be a drop-in documents table: run a real
    # registered operator pipeline on it (writes parquet the operators'
    # sf_dir contract expects)
    from trisk_spark.registry import load_all

    good, _ = split_good_and_bad(
        read_documents_jsonl(spark, _write_jsonl(spark, tmp_path))
    )
    good.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    q = load_all()
    n = q["token_count"].fn(spark, str(tmp_path)).count()
    assert n == table(spark, SF_DIR, "documents").count()
    assert q["dedup_exact"].fn(spark, str(tmp_path)).count() > 0


def _write_jsonl(spark, tmp_path) -> str:
    rows = _docs_rows(spark)
    src = tmp_path / "in.jsonl"
    src.write_text(
        "\n".join(
            json.dumps(
                {"doc_id": d, "text": t, "lang": lg, "source": s, "n_chars": n}
            )
            for d, t, lg, s, n in rows
        )
        + "\n"
    )
    return str(src)
