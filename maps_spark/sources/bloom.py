"""Per-sub-bucket Bloom filters for the streaming dedup band stores.

The incremental dedup probe (:mod:`maps_spark.streaming.dedup`) reads
the L1 band index pruned to the batch's touched ``(band, bb)``
sub-bucket directories. That is O(touched) in *directories*, but a
large batch touches every sub-bucket, so post-compaction probes open
all ``bands x BAND_SUBBUCKETS`` directories even though only the
handful holding a band-hash the batch actually carries can ever
produce a candidate (the bucket key space is 2^31; random collisions
are ~0, so a sub-bucket matters only if it holds a TRUE dup's bucket
key). This module stores, inside each compacted L1 segment, one small
Bloom filter per sub-bucket over the bucket-key values present there;
the probe tests the batch's keys against every segment's filters in
one pass and reads, per segment, only the sub-buckets with a possible
hit in THAT segment — an old large segment rarely admits a fresh
batch's keys, so size-tiered L1 growth does not grow the probe.

Correctness contract: Bloom filters admit false POSITIVES only — a
false positive reads one sub-bucket unnecessarily; a false negative
would silently drop a duplicate, so the filter must cover every value
in the level it describes. That is guaranteed structurally:

- the stats are built from the exact staged bytes of a segment
  publish and written INSIDE the staging directory (``_stats/`` —
  the leading underscore hides it from parquet readers of the data),
  so the segment rename publishes data and stats atomically together
  and :func:`~maps_spark.sources.maintenance.recover_segments`
  drops them together;
- segments are immutable once published (appends land in L0, which
  the probe reads whole and never prunes by stats);
- a store whose L1 has no ``_stats`` (never compacted, or compacted
  by an older writer) simply skips pruning — the probe falls back to
  reading every touched directory, which is the pre-stats behavior.

Scale: filter size is ``min(10 bits x n, BLOOM_MAX_BYTES)`` per
sub-bucket — at 10 bits/key, k=7 probes, the false-positive rate is
~1% until a sub-bucket exceeds ~420k keys, after which FPR (and with
it the share of needlessly-read sub-buckets) degrades gracefully
instead of the stats table growing without bound. The stats table is
at most ``fan_out x BLOOM_MAX_BYTES`` (64 MB for the text store's
16x64 at the 64 KB cap) — broadcast-joined against the batch's
per-sub-bucket key sets, never collected to the driver.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

BLOOM_K = 7
BLOOM_BITS_PER_KEY = 10
BLOOM_MAX_BYTES = 64 * 1024
_GOLDEN = 0x9E3779B97F4A7C15
_MASK = (1 << 64) - 1


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (public splitmix64 constants) over a
    uint64 vector — the one hash both build and probe share."""
    z = (x + _GOLDEN) & _MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK
    return z ^ (z >> 31)


def _bit_positions(values: np.ndarray, m_bits: int) -> np.ndarray:
    """(len(values), BLOOM_K) bit positions via double hashing
    h1 + i*h2 mod m."""
    v = values.astype(np.uint64)
    h1 = _splitmix64(v)
    h2 = _splitmix64(v ^ np.uint64(_GOLDEN)) | np.uint64(1)
    i = np.arange(BLOOM_K, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) & np.uint64(_MASK)) \
        % np.uint64(m_bits)


def bloom_size_bits(n: int) -> int:
    """Filter size for n keys: 10 bits/key, 64-bit aligned, capped."""
    bits = max(64, n * BLOOM_BITS_PER_KEY)
    bits = min(bits, BLOOM_MAX_BYTES * 8)
    return (bits + 63) & ~63


def build_bloom(values: np.ndarray) -> bytes:
    """Bloom filter bytes over the given int64/uint64 values."""
    m = bloom_size_bits(len(values))
    bits = np.zeros(m // 8, dtype=np.uint8)
    if len(values):
        pos = _bit_positions(np.asarray(values), m).ravel()
        np.bitwise_or.at(bits, (pos >> 3).astype(np.int64),
                         (1 << (pos & 7)).astype(np.uint8))
    return bits.tobytes()


def bloom_any(bloom: bytes, values: np.ndarray) -> bool:
    """True iff ANY value possibly belongs to the filter."""
    if not len(values) or not bloom:
        return False
    bits = np.frombuffer(bloom, dtype=np.uint8)
    pos = _bit_positions(np.asarray(values), len(bits) * 8)
    hit = (bits[(pos >> 3).astype(np.int64)]
           & (1 << (pos & 7)).astype(np.uint8)) != 0
    return bool(hit.all(axis=1).any())


def write_stats(df: DataFrame, out_dir: str, keys: tuple[str, str],
                value_col: str, sub: int | None = None) -> int:
    """Build one Bloom row per (k1, k2) sub-bucket of ``df`` and write
    the stats table to ``out_dir`` (callers pass the staging
    directory's ``_stats`` path so the segment rename publishes data
    and stats atomically). Returns the TOTAL row count covered (sum
    of per-sub-bucket ``n``, read back from the tiny written table
    driver-side) — the segment publish uses it as the validation
    count, so stats and validation share one scan of the staged
    bytes.

    ``sub`` records the segment's adaptive sub-bucket modulus (see
    ``maintenance._adaptive_sub``) as a constant column so the probe
    can translate its global (k1, k2) keys into this segment's
    coarser key space; absent for pre-adaptive stats tables (probe
    then treats keys as already segment-space)."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq
    k1, k2 = keys
    schema = f"{k1} long, {k2} long, n long, bloom binary"
    if sub is not None:
        schema += ", sub long"

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[value_col].to_numpy(dtype=np.int64)
        out = {k1: [int(pdf[k1].iloc[0])],
               k2: [int(pdf[k2].iloc[0])],
               "n": [len(vals)],
               "bloom": [build_bloom(vals)]}
        if sub is not None:
            out["sub"] = [sub]
        return pd.DataFrame(out)

    (df.select(k1, k2, value_col).groupBy(k1, k2)
     .applyInPandas(_build, schema)
     .repartition(1).write.mode("overwrite").parquet(out_dir))
    total = 0
    for f in glob.glob(f"{out_dir}/*.parquet"):
        t = pq.read_table(f, columns=["n"])
        total += sum(t["n"].to_pylist())
    return int(total)


def load_blooms(stats_dir: str
                ) -> tuple[int | None,
                           dict[tuple[int, int], bytes]] | None:
    """Driver-side load of an L1 stats table:
    ``(sub, {(k1, k2) -> bloom})`` where ``sub`` is the segment's
    adaptive sub-bucket modulus (None for pre-adaptive tables — keys
    are then already in the probe's global space). Returns None when
    the store has no stats (never compacted, or an older writer) —
    callers then skip pruning, the safe fallback. The table is
    fan-out-bounded (<=1024 rows, filter bytes capped), so a direct
    pyarrow read is milliseconds and avoids a Spark job."""
    import glob
    import os
    if not os.path.isdir(stats_dir):
        return None
    files = glob.glob(f"{stats_dir}/*.parquet")
    if not files:
        return None
    import pyarrow.parquet as pq
    out: dict[tuple[int, int], bytes] = {}
    sub: int | None = None
    for f in files:
        t = pq.read_table(f)
        cols = [c for c in t.column_names
                if c not in ("n", "bloom", "sub")]
        k1s = t[cols[0]].to_pylist()
        k2s = t[cols[1]].to_pylist()
        blooms = t["bloom"].to_pylist()
        if "sub" in t.column_names and len(t):
            sub = int(t["sub"][0].as_py())
        for a, b, bl in zip(k1s, k2s, blooms):
            out[(int(a), int(b))] = bl
    return sub, out


def probe_keys(spark: SparkSession, batch_bands: DataFrame,
               stats_dirs: list[str] | str,
               keys: tuple[str, str], value_col: str
               ) -> tuple[list[tuple[int, int]],
                          list[list[tuple[int, int]] | None]]:
    """One pass over the batch's band table returning
    ``(touched, seg_hits)``:

    - ``touched`` — every distinct (k1, k2) sub-bucket the batch
      probes (what the L0 row filter and the O(batch) contract
      assert on);
    - ``seg_hits`` — one entry per ``stats_dirs`` element (the L1
      segments, manifest order): the touched keys, folded into THAT
      segment's (possibly coarser, adaptive-sub) key space, whose
      Bloom filter in that segment admits at least one of the batch's
      ``value_col`` keys (what the segment's directory read is pruned
      to), or None for a segment with no stats (the caller falls back
      to reading its full touched set — the safe pre-stats behavior).

    Per-segment gating matters once L1 is a size-tiered segment list:
    an old large segment rarely admits a fresh batch's keys, so it is
    usually skipped entirely even though a young segment hits.

    This REPLACES the plain ``distinct().collect()`` the probe used
    for ``touched`` — same single job, no extra shuffle: a
    ``mapInPandas`` pass dedups per partition and tests every batch
    key against the broadcast filters (hit set encoded as a per-key
    segment bitmask), and the driver unions the per-partition sets
    (bounded by fan-out x partitions). Bloom false positives only
    cost an extra directory read; false negatives cannot occur
    because every segment's filters cover every row of that
    segment."""
    import pandas as pd
    if isinstance(stats_dirs, str):
        stats_dirs = [stats_dirs]
    k1, k2 = keys
    blooms = [load_blooms(d) for d in stats_dirs]
    bc = spark.sparkContext.broadcast(blooms)

    def _seg_key(key: tuple[int, int], sub: int | None
                 ) -> tuple[int, int]:
        # a segment written with adaptive sub-bucket modulus ``sub``
        # partitions on value mod sub; sub divides the global modulus,
        # so the global (k1, k2) key folds onto the segment's key
        # space with one mod — no value rereads
        return key if sub is None else (key[0], key[1] % sub)

    def _scan(batches):
        masks: dict[tuple[int, int], int] = {}
        with_stats = sum(1 << i for i, bl in enumerate(bc.value)
                         if bl is not None)
        for pdf in batches:
            for (a, b), grp in pdf.groupby([k1, k2]):
                key = (int(a), int(b))
                mask = masks.get(key, 0)
                if (mask & with_stats) != with_stats:
                    vals = grp[value_col].to_numpy(dtype=np.int64)
                    for i, bl in enumerate(bc.value):
                        if bl is None or mask >> i & 1:
                            continue
                        sub_i, table = bl
                        filt = table.get(_seg_key(key, sub_i))
                        if filt is not None and bloom_any(filt, vals):
                            mask |= 1 << i
                masks[key] = mask
        items = list(masks.items())
        yield pd.DataFrame({k1: [a for (a, _), _m in items],
                            k2: [b for (_, b), _m in items],
                            "mask": [m for _k, m in items]})

    rows = (batch_bands.select(k1, k2, value_col)
            .mapInPandas(_scan, f"{k1} long, {k2} long, mask long")
            .collect())
    merged: dict[tuple[int, int], int] = {}
    for r in rows:
        key = (r[k1], r[k2])
        merged[key] = merged.get(key, 0) | r["mask"]
    touched = sorted(merged)
    # per-segment hits come back in THAT segment's key space (the
    # directory names its reader prunes to)
    seg_hits: list[list[tuple[int, int]] | None] = [
        None if bl is None
        else sorted({_seg_key(k, bl[0])
                     for k, m in merged.items() if m >> i & 1})
        for i, bl in enumerate(blooms)]
    return touched, seg_hits
