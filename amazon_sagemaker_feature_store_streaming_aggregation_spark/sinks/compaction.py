"""Small-file compaction for streaming sink output.

Structured Streaming file sinks write at least one file per
(micro-batch × partition); a day of 1-minute triggers over 200
shuffle partitions is ~300k files — and at 100 TB the resulting
metadata pressure and per-file open cost dominate read time long
before the bytes do. The standard fix is periodic compaction:
rewrite a directory's many small files into few target-sized ones,
atomically, without changing the rows.

``compact_parquet_dir`` is that tool, deliberately simple:

1. measure the directory (file count, total bytes) driver-side;
2. read + ``repartition(ceil(bytes / target))`` — one round-robin
   shuffle whose only purpose is output sizing;
3. write to a staging dir, then swap (rename the old dir away, the
   staging dir in, delete the old) so a reader's listing is always
   entirely-old or entirely-new — see ``compact_parquet_dir`` for
   the concurrent-reader caveat (run quiesced or writer-owned).

The row payload is untouched — compaction is a physical-layout
operation, which the test asserts by full-row equality (and is why
there is no oracle entry: there is no query here).

At catalog scale the same job runs per partition directory (the
date=/bucket= leaves of ``layout.write_hash_layout``) so compaction
parallelizes across partitions and never rewrites the whole table;
table formats (Delta OPTIMIZE, Iceberg rewrite_data_files) are the
managed equivalent and the documented deployment swap.
"""

from __future__ import annotations

import math
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def fs_dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(parquet file count, total bytes) under ``path``, recursively,
    via the Hadoop FileSystem API — correct for any URI scheme
    (file://, hdfs://, s3a://). ``dir_stats`` below walks the LOCAL
    filesystem only and silently reports zero for a remote URI Spark
    happily wrote to; callers that accept arbitrary output URIs (the
    curation CLI) must use this variant."""
    from ..streaming.dedup import _hadoop_fs

    fs, p = _hadoop_fs(spark, path)
    if not fs.exists(p):
        return 0, 0
    n, size = 0, 0
    it = fs.listFiles(p, True)  # recursive RemoteIterator
    while it.hasNext():
        status = it.next()
        if status.getPath().getName().endswith(".parquet"):
            n += 1
            size += status.getLen()
    return n, size


def dir_stats(path: str) -> tuple[int, int]:
    """(parquet file count, total bytes) under ``path``."""
    n, size = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                size += os.path.getsize(os.path.join(root, f))
    return n, size


def _swap_names(path: str) -> tuple[str, str, str]:
    """(parent, hidden staging path, hidden retired path) for one
    compaction attempt on ``path``. The swap dirs are DOT-PREFIXED
    siblings (``<parent>/.<name>.__compact_<uuid>``): Spark's file
    index skips names starting with ``.`` or ``_``, so a crash that
    leaks one can never surface as a bogus partition value next to
    ``ibucket=``/``cell=`` leaves (an un-hidden leftover named
    ``ibucket=5.__compact_x`` would silently become partition value
    ``"5.__compact_x"`` — string-typed, rows invisible to pruned
    probes)."""
    base = path.rstrip("/")
    parent, name = base.rsplit("/", 1)
    tag = uuid.uuid4().hex[:8]
    return (
        parent,
        f"{parent}/.{name}.__compact_{tag}",
        f"{parent}/.{name}.__retired_{tag}",
    )


def heal_compaction_swap(spark: SparkSession, path: str) -> str | None:
    """Detect and resolve a crash-interrupted ``compact_parquet_dir``
    swap on ``path`` BEFORE anyone reads it. Returns what happened
    (``"completed"``, ``"restored"``, ``"cleaned"``) or None when no
    leftover exists.

    The swap has three crash windows, each leaving a distinct on-disk
    state, each resolved deterministically:

    * staging leaked, ``path`` still present — the write or the first
      rename failed; the staging copy is garbage (delete it). A
      leaked RETIRED dir with ``path`` present means the final delete
      was interrupted AFTER the swap completed — also garbage.
    * ``path`` missing, staging has ``_SUCCESS`` — crash between the
      two renames with a complete new copy: finish the swap (rename
      staging in, drop the retired original).
    * ``path`` missing, staging absent/incomplete — crash between the
      renames before the new copy was usable: put the retired
      original back.

    Legacy un-hidden leftovers (``<name>.__compact_*`` from the
    pre-hidden naming) are recognized and resolved the same way.
    """
    from ..streaming.dedup import _hadoop_fs

    base = path.rstrip("/")
    parent, name = base.rsplit("/", 1)
    fs, pp = _hadoop_fs(spark, parent)
    if not fs.exists(pp):
        return None
    stagings, retireds = [], []
    for status in fs.listStatus(pp):
        n = status.getPath().getName()
        stem = n[1:] if n.startswith(".") else n
        if stem.startswith(name + ".__compact_"):
            stagings.append(status.getPath())
        elif stem.startswith(name + ".__retired_"):
            retireds.append(status.getPath())
    if not stagings and not retireds:
        return None
    _, p = _hadoop_fs(spark, base)
    if fs.exists(p):
        for leftover in stagings + retireds:
            fs.delete(leftover, True)
        return "cleaned"
    done = [
        s
        for s in stagings
        if fs.exists(
            _hadoop_fs(spark, f"{parent}/{s.getName()}/_SUCCESS")[1]
        )
    ]
    if done:
        # complete the interrupted swap forward: the staging copy is a
        # full committed rewrite of the same rows
        if not fs.rename(done[0], p):
            raise IOError(f"heal failed: rename {done[0]} into {path}")
        for leftover in stagings + retireds:
            if str(leftover) != str(done[0]):
                fs.delete(leftover, True)
        return "completed"
    if retireds:
        if len(retireds) > 1:
            # cannot happen through the swap protocol (a second
            # retirement requires the first to have been deleted);
            # refuse to guess which copy is current
            raise IOError(
                f"multiple retired copies next to {path}: "
                f"{[str(r) for r in retireds]} — resolve manually"
            )
        if not fs.rename(retireds[0], p):
            raise IOError(f"heal failed: restore {retireds[0]} to {path}")
        for leftover in stagings:
            fs.delete(leftover, True)
        return "restored"
    for leftover in stagings:
        fs.delete(leftover, True)
    return "cleaned"


def heal_swap_leftovers(spark: SparkSession, root: str) -> dict:
    """Scan ``root``'s direct children for interrupted-compaction swap
    dirs and heal every affected target — the probe-safety sweep the
    partitioned index owners run before trusting their listings
    (``_ensure_index_buckets`` / the per-leaf compactors). Driven from
    the SWAP-DIR side, not the leaf listing: a leaf that vanished
    mid-swap is absent from the listing, so only its leftover names
    it. Returns ``{target_path: action}``."""
    from ..streaming.dedup import _hadoop_fs

    fs, rp = _hadoop_fs(spark, root.rstrip("/"))
    if not fs.exists(rp):
        return {}
    targets = set()
    for status in fs.listStatus(rp):
        n = status.getPath().getName()
        stem = n[1:] if n.startswith(".") else n
        for marker in (".__compact_", ".__retired_"):
            if marker in stem:
                targets.add(stem.split(marker, 1)[0])
    out = {}
    for t in sorted(targets):
        target = f"{root.rstrip('/')}/{t}"
        action = heal_compaction_swap(spark, target)
        if action:
            out[target] = action
    return out


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> int:
    """Compact ``path`` in place to ~``target_bytes`` parquet files.

    Returns the resulting file count. No-op (returns current count)
    when the directory already has fewer than ``min_files`` files or
    is already at/below one target-size file per existing file.

    Consistency: the two-step swap (rename old away, rename staging
    in) guarantees a reader never sees a MIXED listing of old and new
    files — but it is NOT safe against concurrent readers: between the
    renames ``path`` briefly does not exist (ENOENT), and a reader
    that listed old files before the swap can fail once the retired
    directory is deleted. Run it like any table-maintenance job — on a
    quiesced path or from the single writer that owns it. (The feature
    store avoids this window entirely with versioned ``v=K`` snapshot
    dirs and a ``_VERSION`` pointer flip; this helper deliberately
    stays layout-preserving for plain parquet sinks.)

    Crash safety: the staging/retired dirs are HIDDEN siblings
    (``.<name>.__compact_<uuid>`` — see :func:`_swap_names`), so a
    leaked leftover is invisible to Spark partition discovery instead
    of masquerading as a partition value; every entry first heals any
    prior interrupted swap via :func:`heal_compaction_swap`, and index
    owners sweep with :func:`heal_swap_leftovers` before probing.

    Filesystem access goes through the Hadoop FileSystem API (the
    ``compact_cluster_store`` pattern), so any scheme Spark can write
    works — file://, hdfs://, s3a://. On true object stores a
    directory "rename" is the connector's copy+delete (not O(1), and
    the no-mixed-listing guarantee weakens to the connector's
    semantics); the quiesced-or-writer-owned rule above is what makes
    that acceptable, and table formats (Delta OPTIMIZE, Iceberg
    rewrite_data_files) remain the managed alternative there.
    """
    from ..streaming.dedup import _hadoop_fs

    heal_compaction_swap(spark, path)
    n_files, total = fs_dir_stats(spark, path)
    n_out = max(1, math.ceil(total / target_bytes))
    if n_files < min_files or n_out >= n_files:
        return n_files

    df: DataFrame = spark.read.parquet(path)
    _, staging, retired = _swap_names(path)
    fs, p = _hadoop_fs(spark, path)
    _, sp = _hadoop_fs(spark, staging)
    _, rp = _hadoop_fs(spark, retired)
    try:
        df.repartition(n_out).write.mode("overwrite").parquet(staging)
        # swap: readers see the old or the new listing, not a mix
        if not fs.rename(p, rp):
            raise IOError(f"compaction swap failed: rename {path} away")
    except BaseException:
        # failed write (or failed swap) must not leak the staging copy:
        # a sibling .__compact_* dir the size of the table is a silent
        # 2x-disk cost on every failed maintenance run
        fs.delete(sp, True)
        raise
    if not fs.rename(sp, p):
        # put the original back rather than leave the path missing
        fs.rename(rp, p)
        fs.delete(sp, True)
        raise IOError(f"compaction swap failed: rename staging into {path}")
    fs.delete(rp, True)
    return fs_dir_stats(spark, path)[0]
