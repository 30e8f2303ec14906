"""BPE merge training: replay-fold parity (the SQL-inexpressible
iteration's oracle, stock_matchmaker precedent), the textbook worked
example, hostile corpora, and determinism."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from trisk_spark.functions import bpe

from .conftest import SF_DIR


def _write_docs(tmp_path, texts):
    docs = {
        "doc_id": list(range(1, len(texts) + 1)),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["fixture"] * len(texts),
        "n_chars": [len(t) if t else 0 for t in texts],
    }
    pq.write_table(pa.table(docs), tmp_path / "documents.parquet")
    return str(tmp_path)


def test_bpe_train_matches_replay_on_corpus(spark):
    # the DISTRIBUTED trainer (local_max_words=0 forces it — the
    # default fast path would sidestep the loop under test) must
    # reproduce the pure-Python textbook fold merge-for-merge (same
    # pairs, same order, same counts) on the real corpus's word counts
    from trisk_spark.catalog import table

    got = bpe.bpe_train(spark, SF_DIR, n_merges=12, local_max_words=0)
    wc = {
        r.word: r.cnt
        for r in bpe.word_counts(table(spark, SF_DIR, "documents")).collect()
    }
    want = bpe.bpe_replay(wc, n_merges=12)
    assert got == want
    assert len(got) == 12, "corpus exhausted merges early — vacuous"


def test_bpe_train_fast_path_equals_distributed(spark):
    # the driver-side fast path (vocab under BPE_TRAIN_LOCAL_MAX_WORDS
    # collects the count table and folds in memory) and the
    # distributed per-merge loop are the same algorithm — the
    # crossover must be invisible in the merge table
    fast = bpe.bpe_train(spark, SF_DIR, n_merges=12)
    dist = bpe.bpe_train(spark, SF_DIR, n_merges=12, local_max_words=0)
    assert fast == dist and len(fast) == 12


def test_bpe_textbook_example(spark, tmp_path):
    # Sennrich's worked example shape: 'low'×5 'lower'×2 'newest'×6
    # 'widest'×3 — highest-count first merges are (e,s) then (es,t)
    # then (est,</w>) with counts 9/9/9; ties break lexicographically
    texts = [" ".join(["low"] * 5 + ["lower"] * 2
                      + ["newest"] * 6 + ["widest"] * 3)]
    sf = _write_docs(tmp_path, texts)
    got = bpe.bpe_train(spark, sf, n_merges=3)
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    assert got == bpe.bpe_replay(wc, n_merges=3)
    assert got[0] == ("e", "s", 9)
    assert got[1] == ("es", "t", 9)
    assert got[2] == ("est", bpe.EOW, 9)


def test_bpe_overlapping_pair_greedy_scan(spark, tmp_path):
    # 'aaaa'×k: pair (a,a) counts 3k occurrences but greedy merging
    # yields ['aa','aa','</w>'] — the fold must not double-merge
    # through the just-merged symbol
    sf = _write_docs(tmp_path, [" ".join(["aaaa"] * 4)])
    got = bpe.bpe_train(spark, sf, n_merges=2)
    want = bpe.bpe_replay({"aaaa": 4}, n_merges=2)
    assert got == want
    assert got[0] == ("a", "a", 12)          # 3 adjacent pairs × 4
    # after the merge ['aa','aa','</w>']: (aa,aa) and (aa,</w>) tie at
    # 4 — '<' sorts before 'a', so the lexicographic rule picks
    # (aa,</w>) on both engines
    assert got[1] == ("aa", bpe.EOW, 4)


def test_bpe_hostile_docs_and_stop_rule(spark, tmp_path):
    # NULL text, empty text, single chars: tokenizer drops them or
    # they contribute no pairs; all-singleton corpora stop before
    # n_merges (no pair reaches count 2)
    sf = _write_docs(tmp_path, [None, "", "x y z", "q"])
    got = bpe.bpe_train(spark, sf, n_merges=5)
    # every word is one char + EOW: pairs like (x,</w>) have count 1
    assert got == []


def test_bpe_deterministic_across_runs(spark):
    a = bpe.bpe_train(spark, SF_DIR, n_merges=6)
    b = bpe.bpe_train(spark, SF_DIR, n_merges=6)
    assert a == b and len(a) == 6


def _replay_segment(texts_by_doc, merges):
    # pure-Python: apply the ordered merges to each word's symbol list
    out = {}
    for doc_id, text in texts_by_doc.items():
        words = [w for w in (text or "").lower().split(" ") if w != ""]
        n_sub = 0
        for w in words:
            syms = list(w) + [bpe.EOW]
            for left, right, _ in merges:
                nxt, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == left
                        and syms[i + 1] == right
                    ):
                        nxt.append(left + right)
                        i += 2
                    else:
                        nxt.append(syms[i])
                        i += 1
                syms = nxt
            n_sub += len(syms)
        out[doc_id] = (len(words), n_sub)
    return out


def test_bpe_segment_matches_replay(spark):
    # the broadcast word→length model must reproduce a literal
    # per-document application of the merge table
    from trisk_spark.catalog import table
    from pyspark.sql import functions as F

    merges = bpe.bpe_train(spark, SF_DIR, n_merges=8)
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe.bpe_segment(spark, SF_DIR, merges=merges).collect()
    }
    texts = {
        r.doc_id: r.text
        for r in table(spark, SF_DIR, "documents")
        .where(F.col("doc_id").isNotNull())
        .collect()
    }
    want = _replay_segment(texts, merges)
    assert got == want
    # merges actually compress: fewer BPE tokens than raw chars+EOW
    raw = sum(
        len(w) + 1
        for t in texts.values()
        for w in (t or "").lower().split(" ")
        if w != ""
    )
    assert sum(v[1] for v in got.values()) < raw


def test_bpe_segment_empty_and_null_docs(spark, tmp_path):
    sf = _write_docs(tmp_path, [None, "", "ab ab"])
    merges = bpe.bpe_train(spark, sf, n_merges=2)
    got = {
        r.doc_id: (r.n_words, r.n_bpe_tokens)
        for r in bpe.bpe_segment(spark, sf, merges=merges).collect()
    }
    # docs 1/2 have zero words but must still appear with zero counts
    assert got[1] == (0, 0) and got[2] == (0, 0)
    assert got[3][0] == 2 and got[3][1] >= 2


def test_bpe_segment_vocab_guard_fires(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="vocabulary too large"):
        bpe.bpe_segment(spark, SF_DIR, merges=[], max_vocab_rows=1)


def test_bpe_train_early_stop_mid_run(spark, tmp_path):
    # the stopping rule must fire MID-training, not only on degenerate
    # corpora: "aa aa" yields exactly two count-2 merges — (a,</w>)
    # first ('<' sorts before 'a' on the lexicographic tie), then
    # (a,a</w>) — after which the word is a single symbol and every
    # pair is gone; asking for 10 merges must return exactly those
    # two, not pad with singleton merges (vocab bloat)
    sf = _write_docs(tmp_path, ["aa aa"])
    got = bpe.bpe_train(spark, sf, n_merges=10)
    assert [(l, r) for l, r, _ in got] == [("a", bpe.EOW), ("a", "a" + bpe.EOW)]
    assert all(n >= 2 for _, _, n in got)
    assert got == bpe.bpe_replay({"aa": 2}, n_merges=10)


def test_bpe_train_merge_ceiling_fails_loud(spark):
    # BPE_MAX_MERGES guards the sequential-job chain: each merge is one
    # Spark job, so an unbounded n_merges must be an explicit decision
    # (sampled word counts + raised ceiling), not a silent 50k-job run
    import pytest

    with pytest.raises(ValueError, match="BPE_MAX_MERGES"):
        bpe.bpe_train(spark, SF_DIR, n_merges=bpe.BPE_MAX_MERGES + 1)
