"""Shared durability machinery for the persisted-store family
(``dedup_store``'s MinHash band store, ``semantic_store``'s SRP band
store): the fail-loud filesystem gate, the atomic ingest watermark,
the crash-safe compaction swap/repair protocol, and the
replayed-append repair rewrite. Extracted from
``dedup_store`` (r12/r13) when the semantic store arrived — ONE
implementation of the swap state machine, table names parameterized.

DURABILITY MODEL (single-maintainer, local/HDFS-rename filesystems):
maintenance that swaps directories and the ingest watermark rely on
atomic rename — true on POSIX and HDFS, NOT on S3-style object
stores, where a deployment would put the swap behind a manifest
table / conditional put. The constraint is enforced loudly: every
rename-dependent entry point calls ``require_rename_fs`` first.

Reference: the reference has no persisted stores (beyond-reference
mandate, SURVEY.md §7 step 7); this is repo-local machinery.
"""

from __future__ import annotations

import os
import shutil


def require_rename_fs(path: str, op: str) -> None:
    """Fail loud on object-store paths: the watermark and the
    compaction swap rely on atomic rename, which ``s3://``-style
    stores do not provide (the module DURABILITY MODEL note). Local
    paths and explicit ``file:`` URIs pass; HDFS deployments would
    widen this to ``hdfs:`` after routing the os-level calls through
    the Hadoop FS API."""
    if "://" in path and not path.startswith("file://"):
        raise ValueError(
            f"{op} requires an atomic-rename filesystem (local/file:); "
            f"got {path!r} — on object storage, front the store with a "
            "manifest table / conditional-put swap instead"
        )


def strip_file_scheme(path: str) -> str:
    return path[len("file://"):] if path.startswith("file://") else path


def read_ingest_watermark(path: str) -> int | None:
    """Last fully-admitted streaming batch id, or None for a store
    that has never been written by an ingest stream."""
    p = f"{strip_file_scheme(path)}/_last_admitted_batch_id"
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip())


def write_ingest_watermark(path: str, batch_id: int) -> None:
    """Atomically persist the admitted-batch watermark beside the
    store (write-temp + ``os.replace`` — atomic on POSIX)."""
    write_small_text(path, "_last_admitted_batch_id", str(batch_id))


def read_small_text(path: str, name: str) -> str | None:
    """Read a durable small-text record beside the store, or None if
    it has never been written — the generic form of the watermark
    protocol (one file, one record, committed whole)."""
    p = f"{strip_file_scheme(path)}/{name}"
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return f.read()


def write_small_text(path: str, name: str, text: str) -> None:
    """Atomically persist a small-text record beside the store
    (write-temp + ``os.replace`` — atomic on POSIX). The one durable
    small-file idiom every store-side counter/intent/ledger shares
    (r16 review: three hand-rolled copies had drifted from the gate
    discipline)."""
    base = strip_file_scheme(path)
    tmp = f"{base}/{name}.tmp"
    with open(tmp, "w") as f:
        f.write(text)
    os.replace(tmp, f"{base}/{name}")


def repair_store(path: str, tables: tuple[str, ...]) -> None:
    """Bring a store back to a consistent layout after a compaction
    crash — called automatically on compaction entry, and callable
    standalone before reopening a store whose maintainer died. Per
    table, the swap protocol (``swap_in_compacted``) leaves exactly
    three observable states, each repairable without data loss:

      * live dir present           → nothing to do (stale ``_old`` /
        ``_compact_tmp`` leftovers are deleted — a tmp is only swapped
        in while the live dir is ABSENT, so a tmp beside a live dir is
        a dead build from a failed compaction run);
      * live dir absent, ``_old`` + ``_compact_tmp`` present → crashed
        between rename 1 and 2: finish the swap (tmp → live), then
        drop ``_old``;
      * live dir absent, only ``_old`` present → crashed after a tmp
        rename that never happened (impossible under the protocol) or
        after ``_old``'s tmp was already swapped and re-crashed before
        this repair's rmtree — roll back (``_old`` → live)."""
    base = strip_file_scheme(path)
    for t in tables:
        live, old, tmp = (
            f"{base}/{t}",
            f"{base}/{t}_old",
            f"{base}/{t}_compact_tmp",
        )
        if os.path.exists(live):
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(old, ignore_errors=True)
        elif os.path.exists(tmp) and os.path.exists(old):
            os.rename(tmp, live)
            shutil.rmtree(old, ignore_errors=True)
        elif os.path.exists(old):
            os.rename(old, live)


def repair_replayed_append(
    spark,
    path: str,
    table: str,
    id_col: str | list[str],
    files: int = 8,
    partition_by: tuple[str, ...] = (),
) -> None:
    """Repair the documented watermark-window replay: a crash BETWEEN a
    wave's row-table append and the ingest-watermark write replays that
    wave once, duplicating its rows in the store's row table (bands
    re-cap idempotently, so only the row table needs repair; the
    per-store stats expose the damage as ``n_dup_signature_ids`` /
    ``n_dup_vector_ids`` > 0). Replayed rows are BYTE-IDENTICAL per id
    (same wave, same deterministic kernel), so the repair is a
    ``dropDuplicates([id_col])`` rewrite — and it reuses the compaction
    swap protocol verbatim: build ``<table>_compact_tmp``, then the
    recovery-ordered rename swap, so a crash MID-REPAIR lands in a
    state ``repair_store`` already knows how to finish or roll back.
    Entry first repairs any half-swapped leftovers (repair-on-entry,
    the compaction rule). ``id_col`` may be one column or a composite
    key list (the bm25 store's postings dedupe on (term, doc_id));
    ``partition_by`` preserves a partitioned table's directory layout
    through the rewrite (one writer task per partition directory, the
    write_dedup_store rule). Single-maintainer, rename-FS only —
    fail-loud gate."""
    require_rename_fs(path, "repair_replayed_append")
    repair_store(path, (table,))
    keys = [id_col] if isinstance(id_col, str) else list(id_col)
    rows = spark.read.parquet(
        f"{strip_file_scheme(path)}/{table}"
    ).dropDuplicates(keys)
    tmp = f"{strip_file_scheme(path)}/{table}_compact_tmp"
    if partition_by:
        conf = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        rows.repartition(max(1, conf), *partition_by).write.mode(
            "overwrite"
        ).partitionBy(*partition_by).parquet(tmp)
    else:
        rows.coalesce(max(1, files)).write.mode("overwrite").parquet(tmp)
    swap_in_compacted(path, (table,))


def stage_partition_delete(
    spark,
    path: str,
    table: str,
    part_col: str,
    part_vals,
    kept_rows,
    write_tasks: int | None = None,
) -> None:
    """Durably STAGE a partition-directory delete before any live data
    is destroyed (the r14 bm25/ivf takedown hole: kept rows lived only
    in a localCheckpoint, so a crash between the touched-directory
    rmtree and the kept append lost non-victim rows with nothing
    durable to resume from — unlike the band stores, whose kept state
    re-derives from the signatures/vectors table swapped last).

    Protocol: write ``kept_rows`` partitioned by ``part_col`` into
    ``<table>_staged_delete_tmp`` (live table untouched — it is still
    the read source), create an EMPTY marker directory for every
    touched partition the write produced no rows for (a fully-victim
    partition ends empty, and a parquet writer cannot express an empty
    partition), then COMMIT the whole staging atomically by renaming
    tmp → ``<table>_staged_delete``. Until the rename nothing live has
    changed; after it, ``complete_staged_partition_swap`` can always
    finish from durable state alone."""
    base = strip_file_scheme(path)
    tmp = f"{base}/{table}_staged_delete_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    writer = (
        kept_rows
        if write_tasks is None
        else kept_rows.repartition(max(1, write_tasks), part_col)
    )
    writer.write.mode("overwrite").partitionBy(part_col).parquet(tmp)
    for v in part_vals:
        os.makedirs(f"{tmp}/{part_col}={v}", exist_ok=True)
    final = f"{base}/{table}_staged_delete"
    if os.path.isdir(final):
        # a committed staging may hold the ONLY copy of kept rows for
        # partitions whose live directories are already cleared —
        # overwriting it would lose them; the caller must consume it
        # (complete_staged_partition_swap) before staging anew
        raise RuntimeError(
            f"stage_partition_delete: committed staging {final!r} "
            "already exists — run complete_staged_partition_swap first"
        )
    os.rename(tmp, final)


def complete_staged_partition_swap(path: str, table: str, part_col: str) -> None:
    """Finish a staged partition-directory delete — idempotent at every
    crash point because it is driven purely by which staged directories
    still exist: a staged ``<part_col>=v`` dir vanishes only AFTER its
    live twin holds the kept rows. Per staged partition dir: clear the
    live directory (it holds victim rows or is already gone), then
    rename the staged content in; an EMPTY staged dir is the "this
    partition ends empty" marker and is simply consumed after the
    clear. Any uncommitted ``_tmp`` build is discarded (the routing +
    staging re-run from the live table, which that crash never
    touched). No-op when no staging was committed."""
    base = strip_file_scheme(path)
    staged_root = f"{base}/{table}_staged_delete"
    shutil.rmtree(staged_root + "_tmp", ignore_errors=True)
    if not os.path.isdir(staged_root):
        return
    for entry in sorted(os.listdir(staged_root)):
        if not entry.startswith(f"{part_col}="):
            continue
        staged = f"{staged_root}/{entry}"
        shutil.rmtree(f"{base}/{table}/{entry}", ignore_errors=True)
        if any(os.scandir(staged)):
            os.rename(staged, f"{base}/{table}/{entry}")
        else:
            os.rmdir(staged)
    shutil.rmtree(staged_root, ignore_errors=True)


def swap_in_compacted(path: str, tables: tuple[str, ...]) -> None:
    """Swap each table's freshly-built ``<t>_compact_tmp`` directory in
    as the live ``<t>`` — the recovery-ordered rename sequence whose
    every intermediate state ``repair_store`` can finish or roll back:
    live → ``_old``, tmp → live, drop ``_old``."""
    base = strip_file_scheme(path)
    for t in tables:
        old = f"{base}/{t}_old"
        os.rename(f"{base}/{t}", old)
        os.rename(f"{base}/{t}_compact_tmp", f"{base}/{t}")
        shutil.rmtree(old)
