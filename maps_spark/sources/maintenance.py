"""Store maintenance: small-file compaction for append-mode stores.

The streaming sinks append per micro-batch — the incremental dedup
store (:mod:`maps_spark.streaming.dedup`) adds one file set per batch
to ``sigs``/``bands``/``hashes``/``dupes`` — so after thousands of
batches a scan pays thousands of file opens and the NameNode/listing
cost grows without bound. The reference sidesteps this because HBase
compacts regions itself (minor/major compactions); a Parquet store
needs the equivalent as an explicit maintenance pass, the same way
Delta/Iceberg expose OPTIMIZE.

``compact_dir`` rewrites one directory to ``ceil(bytes / target)``
files via a staging dir that is row-count-validated before any swap,
preserving hive partition columns (``partition_by``) so
partition-pruned readers are unaffected.

Crash/concurrency contract: the swap is two renames (old -> ``.old``,
staging -> live), which is NOT atomic as a pair — between them the
live path is briefly absent, and a crash in that window leaves the
only copy at ``.old``. Run compaction under the store's write lock
(e.g. between streaming triggers) and call :func:`recover_compaction`
at startup: it restores an orphaned ``.old`` and clears dead staging
dirs. The original data is never deleted until the validated rewrite
is live.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def _count_star():
    import pyspark.sql.functions as F
    return F.count(F.lit(1))


def swap_compacted(path: str, staging: str) -> None:
    """The shared two-rename swap every compaction uses (live ->
    ``.old``, staging -> live, drop ``.old``). ONE implementation so
    the crash-recovery contract :func:`recover_compaction` repairs
    stays true for every store kind. Callers must have validated the
    staging copy first."""
    old = path.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)  # validated rewrite is live; safe to drop


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under ``path`` (recursive)."""
    n, size = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                size += os.path.getsize(os.path.join(root, f))
    return n, size


def _write_staging_stats(spark: SparkSession, staging: str,
                         stats: tuple[tuple[str, str], str] | None) -> None:
    """Build the per-sub-bucket Bloom stats for a staged band-index
    rewrite, INSIDE the staging dir (``_stats/`` — underscore-hidden
    from parquet readers of the data) so the swap publishes data and
    stats atomically (:mod:`maps_spark.sources.bloom`)."""
    if stats is None:
        return
    from maps_spark.sources.bloom import write_stats
    keys, value_col = stats
    write_stats(spark.read.parquet(staging), f"{staging}/_stats",
                keys, value_col)


def compact_dir(spark: SparkSession, path: str,
                target_file_bytes: int = 128 * 1024 * 1024,
                partition_by: tuple[str, ...] = (),
                sort_within: tuple[str, ...] = (),
                stats: tuple[tuple[str, str], str] | None = None) -> dict:
    """Rewrite the parquet directory at ``path`` into
    ``max(1, ceil(total_bytes / target_file_bytes))`` files (per
    partition directory when ``partition_by`` is set), optionally
    sorted within files so row-group min/max stats stay selective.

    Returns {"files_before", "files_after", "bytes", "rows"}. The
    rewrite goes to ``path + '.compact'`` and is validated (row count
    vs the source) BEFORE the swap; a crash before the swap leaves the
    original untouched, a crash mid-swap is repaired by
    :func:`recover_compaction`. See the module docstring for the
    locking contract.
    """
    n_before, size = dir_stats(path)
    n_files = max(1, -(-size // target_file_bytes))
    df = spark.read.parquet(path)
    out = df.repartition(n_files, *partition_by) if partition_by \
        else df.repartition(n_files)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    staging = path.rstrip("/") + ".compact"
    shutil.rmtree(staging, ignore_errors=True)
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    # validate the rewrite before touching the live store: parquet
    # footer counts, no data scan
    n_rows = df.count()
    staged_rows = spark.read.parquet(staging).count()
    if staged_rows != n_rows:
        shutil.rmtree(staging)
        raise RuntimeError(
            f"compaction validation failed for {path}: "
            f"{staged_rows} staged rows != {n_rows} source rows")
    _write_staging_stats(spark, staging, stats)
    swap_compacted(path, staging)
    n_after, _ = dir_stats(path)
    return {"files_before": n_before, "files_after": n_after,
            "bytes": size, "rows": n_rows}


def recover_compaction(path: str) -> str | None:
    """Startup repair for a crash during :func:`compact_dir`'s swap.

    - live path missing but ``.old`` present -> the crash hit between
      the two renames; restore ``.old`` as live (the validated staging
      copy, if complete, is discarded — restoring the original is
      always safe).
    - stale ``.compact`` / leftover ``.old`` beside a live path ->
      remove them.

    Returns what was done ("restored", "cleaned") or None.
    """
    old = path.rstrip("/") + ".old"
    staging = path.rstrip("/") + ".compact"
    if not os.path.exists(path) and os.path.isdir(old):
        os.rename(old, path)
        shutil.rmtree(staging, ignore_errors=True)
        return "restored"
    cleaned = False
    for p in (staging, old):
        if os.path.isdir(p) and os.path.exists(path):
            shutil.rmtree(p)
            cleaned = True
    return "cleaned" if cleaned else None


def fold_l0(spark: SparkSession, live: str, l0: str,
            target_file_bytes: int = 128 * 1024 * 1024,
            partition_by: tuple[str, ...] = (),
            sort_within: tuple[str, ...] = (),
            stats: tuple[tuple[str, str], str] | None = None) -> dict | None:
    """Fold an unpartitioned L0 append directory into the
    hive-partitioned live (L1) directory — the LSM step of the
    streaming band index: per-batch appends land in L0 (ONE output
    commit per batch instead of one per partition directory); every
    compaction folds L0 into the path-pruned L1 layout and clears L0.

    Same validated-staging + two-rename-swap contract as
    :func:`compact_dir`. The fold de-duplicates full rows: a crash
    between a completed swap and the L0 cleanup leaves the folded
    rows in BOTH levels, and the replayed fold must converge instead
    of double-counting (duplicate band rows are harmless to probes —
    candidates are distinct()ed — but must not accrete in L1).

    With no L0 present this degrades to a plain :func:`compact_dir`
    of the live directory. Returns None when neither level exists."""
    if not os.path.isdir(l0):
        if os.path.isdir(live):
            return compact_dir(spark, live, target_file_bytes,
                               partition_by=partition_by,
                               sort_within=sort_within, stats=stats)
        return None
    l0_df = spark.read.parquet(l0)
    cols = sorted(l0_df.columns)
    df = l0_df.select(*cols)
    n_live, size_live = (0, 0)
    if os.path.isdir(live):
        df = df.unionByName(
            spark.read.option("basePath", live).parquet(live)
            .select(*cols))
        n_live, size_live = dir_stats(live)
    df = df.dropDuplicates()
    n_l0, size_l0 = dir_stats(l0)
    size = size_live + size_l0
    n_files = max(1, -(-size // target_file_bytes))
    # observe the source row count DURING the write — a post-hoc
    # df.count() would re-execute the whole union + dropDuplicates
    # shuffle a second time, doubling every fold's cost
    from pyspark.sql import Observation
    obs = Observation()
    df = df.observe(obs, _count_star().alias("n"))
    out = df.repartition(n_files, *partition_by) if partition_by \
        else df.repartition(n_files)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    staging = live.rstrip("/") + ".compact"
    shutil.rmtree(staging, ignore_errors=True)
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    n_rows = obs.get["n"]
    staged_rows = spark.read.parquet(staging).count()
    if staged_rows != n_rows:
        shutil.rmtree(staging)
        raise RuntimeError(
            f"fold validation failed for {live}: "
            f"{staged_rows} staged rows != {n_rows} source rows")
    _write_staging_stats(spark, staging, stats)
    if os.path.isdir(live):
        swap_compacted(live, staging)
    else:
        os.rename(staging, live)
    shutil.rmtree(l0)  # folded into L1; the L0 level restarts empty
    n_after, _ = dir_stats(live)
    return {"files_before": n_live + n_l0, "files_after": n_after,
            "bytes": size, "rows": n_rows}


def compact_frontier_store(spark: SparkSession, store_root: str,
                           target_file_bytes: int = 128 * 1024 * 1024
                           ) -> dict:
    """Compact the three append-only tables of a streaming crawl
    frontier store (:mod:`maps_spark.streaming.frontier`): every batch
    appends one file-set to refs/seen/edges, so a long-running crawl
    accumulates small files linearly with batch count. Same validated
    rewrite + recovery contract as the dedup store (run between
    triggers; call :func:`recover_compaction` per table dir on
    startup). ``batch_id`` is preserved — compaction changes file
    layout only, so ``read_frontier`` assembles identically."""
    out = {}
    for sub, sort in (("refs", ("norm_href",)),
                      ("seen", ("norm_href",)),
                      ("edges", ("src",))):
        p = f"{store_root.rstrip('/')}/{sub}"
        if os.path.isdir(p):
            out[sub] = compact_dir(spark, p, target_file_bytes,
                                   sort_within=sort)
    return out


def compact_dedup_store(spark: SparkSession, store_dir: str,
                        target_file_bytes: int = 128 * 1024 * 1024) -> dict:
    """Compact every table of a streaming dedup signature store
    (:mod:`maps_spark.streaming.dedup`): per-batch appended files fold
    into size-targeted ones; the band index's L0 appends
    (``bands_l0``) fold into the ``(band, bb)`` hive-partitioned
    ``bands`` L1 (the probe path-prunes it to touched sub-bucket
    dirs), sorted by bucket key within files."""
    out = {}
    for sub, part, sort in (("sigs", (), ("doc_id",)),
                            ("hashes", (), ("text_hash",)),
                            ("dupes", (), ("doc_id",))):
        p = f"{store_dir}/{sub}"
        if os.path.isdir(p):
            out[sub] = compact_dir(spark, p, target_file_bytes,
                                   partition_by=part, sort_within=sort)
    folded = fold_l0(spark, f"{store_dir}/bands",
                     f"{store_dir}/bands_l0", target_file_bytes,
                     partition_by=("band", "bb"), sort_within=("bh",),
                     stats=(("band", "bb"), "bh"))
    if folded is not None:
        out["bands"] = folded
    return out


def compact_media_store(spark: SparkSession, store_dir: str,
                        target_file_bytes: int = 128 * 1024 * 1024) -> dict:
    """Compact the streaming IMAGE dedup store
    (:mod:`maps_spark.streaming.media`): hashes/dupes fold into
    size-targeted files; the dHash band index's L0 appends fold into
    the ``(bidx, bb)`` hive-partitioned L1."""
    out = {}
    for sub, sort in (("hashes", ("media_id",)),
                      ("dupes", ("media_id",))):
        p = f"{store_dir}/{sub}"
        if os.path.isdir(p):
            out[sub] = compact_dir(spark, p, target_file_bytes,
                                   sort_within=sort)
    folded = fold_l0(spark, f"{store_dir}/bands",
                     f"{store_dir}/bands_l0", target_file_bytes,
                     partition_by=("bidx", "bb"),
                     sort_within=("bval",),
                     stats=(("bidx", "bb"), "bval"))
    if folded is not None:
        out["bands"] = folded
    return out
