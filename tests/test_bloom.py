"""Per-sub-bucket Bloom gate for the streaming dedup L1 probes
(:mod:`maps_spark.sources.bloom`).

The gate's correctness contract is asymmetric: false positives only
cost an extra directory read, false negatives would silently drop a
duplicate — so the properties pinned here are (a) zero false
negatives by construction, (b) build/probe determinism, and (c) the
end-to-end guarantee that a Bloom-pruned probe still catches a dup
whose counterpart lives in the compacted L1 (while actually pruning
the match-free sub-buckets)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F


def test_bloom_no_false_negatives_and_determinism():
    from maps_spark.sources.bloom import (bloom_any, bloom_size_bits,
                                          build_bloom)
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 2**31 - 1, 3000, dtype=np.int64)
    b = build_bloom(vals)
    assert b == build_bloom(vals)  # deterministic bytes
    assert len(b) * 8 == bloom_size_bits(len(vals))
    # every inserted value answers True — singly and as a batch
    assert bloom_any(b, vals)
    for v in vals[:300]:
        assert bloom_any(b, np.array([v], dtype=np.int64))
    # FPR sanity on disjoint values: 10 bits/key, k=7 -> ~1%
    others = rng.integers(2**31, 2**32, 3000, dtype=np.int64)
    fp = sum(bloom_any(b, np.array([v])) for v in others)
    assert fp < 0.05 * len(others), fp
    # empties never match
    assert not bloom_any(build_bloom(np.array([], dtype=np.int64)), vals)
    assert not bloom_any(b, np.array([], dtype=np.int64))


def test_bloom_size_caps():
    from maps_spark.sources.bloom import BLOOM_MAX_BYTES, bloom_size_bits
    assert bloom_size_bits(0) == 64
    assert bloom_size_bits(100) == 1024  # 10 bits/key, 64-aligned
    assert bloom_size_bits(10**9) == BLOOM_MAX_BYTES * 8  # capped


def test_probe_keys_prunes_l1_but_never_misses(spark, tmp_path,
                                               monkeypatch):
    """End-to-end on the text dedup store: seed a store with one batch
    and compact it (so L1 + _stats exist), then probe with a batch
    holding ONE true duplicate. The Bloom gate must (a) return a
    seg_hits list that still finds the dup — verdicts identical to an
    ungated probe — and (b) actually prune: the segment's hits are a
    strict subset of the touched sub-buckets for a corpus whose other
    docs share no band hash. SUB_TARGET_BYTES is pinned tiny so the
    fold keeps the FULL sub-bucket fan-out at test scale (the
    adaptive coarse-fan-out path has its own test below)."""
    from maps_spark.sources import maintenance as M
    from maps_spark.sources.bloom import probe_keys
    from maps_spark.sources.maintenance import (compact_dedup_store,
                                                list_segments)
    monkeypatch.setattr(M, "SUB_TARGET_BYTES", 1)
    from maps_spark.streaming.dedup import (_band_table, process_batch,
                                            read_store_bands)
    from maps_spark.operators.dedup import minhash_signatures
    from tests.conftest import SF_SMALL

    docs = (spark.read.parquet(f"{SF_SMALL}/documents.parquet")
            .select("doc_id", "text"))
    store = str(tmp_path / "store")
    seed = docs.where("doc_id % 5 != 0")
    process_batch(seed, store, batch_id=0)
    compact_dedup_store(spark, store)
    segs = list_segments(f"{store}/bands")
    assert len(segs) == 1  # one fold -> one published segment
    import os
    assert os.path.isdir(f"{segs[0]}/_stats")

    # probe batch: fresh docs + ONE byte-identical copy of a stored
    # doc under a new id (its minhash bands match the store exactly)
    kept = seed.orderBy("doc_id").limit(1)
    dup = kept.select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                      "text")
    batch = (docs.where("doc_id % 5 = 0").unionByName(dup)
             .localCheckpoint())

    sigs = minhash_signatures(batch, "text", 64, 3, 42, "fast")
    batch_bands = _band_table(sigs, 16, 4).localCheckpoint()
    touched, seg_hits = probe_keys(spark, batch_bands,
                                   [f"{s}/_stats" for s in segs],
                                   ("band", "bb"), "bh")
    assert len(seg_hits) == 1 and seg_hits[0] is not None
    assert set(seg_hits[0]) <= set(touched)
    assert len(seg_hits[0]) < len(touched)  # real pruning happened

    # the gated read still returns every store row the ungated read
    # would have matched on the batch's (band, bh) keys
    gated = read_store_bands(spark, store, touched, seg_hits=seg_hits)
    ungated = read_store_bands(spark, store, touched)
    keys = batch_bands.select("band", "bh").distinct()
    a = set(map(tuple, gated.join(keys, ["band", "bh"])
                .select("band", "bh", "doc_id").collect()))
    b = set(map(tuple, ungated.join(keys, ["band", "bh"])
                .select("band", "bh", "doc_id").collect()))
    assert a == b and len(a) > 0

    # and the full batch body flags the planted dup against the store
    process_batch(batch, store, batch_id=1)
    rej = {(r.doc_id, r.dup_of)
           for r in spark.read.parquet(f"{store}/dupes").collect()}
    kept_id = kept.collect()[0]["doc_id"]
    assert (kept_id + 10_000_000, kept_id) in rej


def test_probe_keys_without_stats_returns_full_touched(spark, tmp_path):
    """A segment with no _stats yields seg_hits[i] = None — the probe
    reads every touched directory of that segment (the safe
    fallback); a store with no segments yields seg_hits = []."""
    from maps_spark.sources.bloom import probe_keys
    df = spark.range(200).select(
        (F.col("id") % 16).alias("band"),
        (F.col("id") % 64).alias("bb"),
        (F.col("id") * 7 + 1).alias("bh"))
    touched, seg_hits = probe_keys(spark, df,
                                   [str(tmp_path / "nope" / "_stats")],
                                   ("band", "bb"), "bh")
    assert seg_hits == [None]
    assert len(touched) == len(set(touched)) > 0

    # a store with no segments at all: empty seg_hits, same touched
    touched2, seg_hits2 = probe_keys(spark, df, [], ("band", "bb"), "bh")
    assert seg_hits2 == [] and touched2 == touched


def test_adaptive_sub_fold_probes_identically(spark, tmp_path):
    """Small segments fold with a COARSE adaptive sub-bucket fan-out
    (maintenance._adaptive_sub: a few-MB segment gets sub=1, i.e.
    bands-only directories instead of bands x 64): the manifest and
    _stats record the segment's sub, probe_keys folds its hits onto
    that key space, and the gated read returns byte-identical rows to
    the ungated read — dup verdicts cannot change. (No whole-segment
    skip is asserted here: at coarse fan-out each band's filter is
    probed with the batch's whole band key set, so ~1% per-value
    false positives make some admits near-certain — the cost is a
    directory read, never a verdict change; the fine-fan-out pruning
    evidence lives in the test above.)"""
    import os

    from maps_spark.operators.dedup import minhash_signatures
    from maps_spark.sources.bloom import load_blooms, probe_keys
    from maps_spark.sources.maintenance import (compact_dedup_store,
                                                list_segments,
                                                read_segment_manifest)
    from maps_spark.streaming.dedup import (_band_table, process_batch,
                                            read_store_bands)
    from tests.conftest import SF_SMALL

    docs = (spark.read.parquet(f"{SF_SMALL}/documents.parquet")
            .select("doc_id", "text"))
    store = str(tmp_path / "store")
    seed = docs.where("doc_id % 5 != 0")
    process_batch(seed, store, batch_id=0)
    compact_dedup_store(spark, store)

    m = read_segment_manifest(f"{store}/bands")
    assert len(m["segments"]) == 1
    sub = m["segments"][0]["sub"]
    assert 1 <= sub < 64  # tiny segment -> coarse fan-out chosen
    segs = list_segments(f"{store}/bands")
    loaded = load_blooms(f"{segs[0]}/_stats")
    assert loaded is not None and loaded[0] == sub
    # the physical layout really is the coarse fan-out
    band_dirs = [d for d in os.listdir(segs[0]) if "=" in d]
    subdirs = {d2 for d in band_dirs
               for d2 in os.listdir(os.path.join(segs[0], d))
               if "=" in d2}
    assert len(subdirs) <= sub

    # probe with one byte-identical dup under a fresh id
    kept = seed.orderBy("doc_id").limit(1)
    dup = kept.select((F.col("doc_id") + 10_000_000).alias("doc_id"),
                      "text")
    batch = (docs.where("doc_id % 5 = 0").unionByName(dup)
             .localCheckpoint())
    sigs = minhash_signatures(batch, "text", 64, 3, 42, "fast")
    batch_bands = _band_table(sigs, 16, 4).localCheckpoint()
    touched, seg_hits = probe_keys(spark, batch_bands,
                                   [f"{s}/_stats" for s in segs],
                                   ("band", "bb"), "bh")
    assert seg_hits[0] is not None
    folded = {(a, b % sub) for a, b in touched}
    assert set(seg_hits[0]) <= folded

    gated = read_store_bands(spark, store, touched, seg_hits=seg_hits)
    ungated = read_store_bands(spark, store, touched)
    keys = batch_bands.select("band", "bh").distinct()
    a = set(map(tuple, gated.join(keys, ["band", "bh"])
                .select("band", "bh", "doc_id").collect()))
    b = set(map(tuple, ungated.join(keys, ["band", "bh"])
                .select("band", "bh", "doc_id").collect()))
    assert a == b and len(a) > 0

    # the full batch body still flags the planted dup
    process_batch(batch, store, batch_id=1)
    rej = {(r.doc_id, r.dup_of)
           for r in spark.read.parquet(f"{store}/dupes").collect()}
    kept_id = kept.collect()[0]["doc_id"]
    assert (kept_id + 10_000_000, kept_id) in rej

    # a foreign batch (disjoint band hashes): every admitted key must
    # still live in the segment's folded key space (false positives
    # only ever cost a directory read)
    foreign = batch_bands.select(
        "doc_id", "band", (F.col("bh") + F.lit(10_000_019)).alias("bh")
    ).select("doc_id", "band",
             F.pmod(F.col("bh"), F.lit(64)).alias("bb"), "bh")
    t2, hits2 = probe_keys(spark, foreign,
                           [f"{s}/_stats" for s in segs],
                           ("band", "bb"), "bh")
    assert set(hits2[0]) <= {(a, b % sub) for a, b in t2}


def test_probe_prefilter_twin_verdicts_identical(spark, tmp_path):
    """r11 probe optimization twin: the broadcast semi-join pre-filter
    of the store side against the batch's exact (band, bh) key set
    must produce byte-identical verdicts to the unfiltered probe —
    including under a tight cap_buckets limit, where the equivalence
    rests on the semi-join keeping or dropping WHOLE buckets (the
    bucket key is the join key, so per-bucket counts cannot change).
    Two stores are built through the same batch sequence, one per
    mode, and their dupes/sigs/hashes tables must match exactly."""
    import maps_spark.streaming.dedup as SD
    from tests.conftest import SF_SMALL

    docs = (spark.read.parquet(f"{SF_SMALL}/documents.parquet")
            .select("doc_id", "text"))
    seed = docs.where("doc_id % 5 != 0")
    # probe batch: fresh docs + near-dup copies of stored docs (small
    # tail edit keeps most shingles -> LSH candidates, not exact dups)
    kept = seed.orderBy("doc_id").limit(3)
    near = kept.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"))
    batch = docs.where("doc_id % 5 = 0").unionByName(near)

    def build(store, gate):
        old = SD.PREFILTER_MAX_KEYS
        SD.PREFILTER_MAX_KEYS = gate
        try:
            # max_bucket=3 exercises the hot-bucket cap on BOTH sides
            SD.process_batch(seed, store, batch_id=0, max_bucket=3)
            SD.process_batch(batch, store, batch_id=1, max_bucket=3)
        finally:
            SD.PREFILTER_MAX_KEYS = old
        out = {}
        for t in ("dupes", "sigs", "hashes"):
            out[t] = sorted(map(
                tuple, spark.read.parquet(f"{store}/{t}")
                .drop("sig").collect()))
        return out

    on = build(str(tmp_path / "on"), 1 << 60)
    off = build(str(tmp_path / "off"), -1)
    assert on == off
    assert len(on["dupes"]) > 0  # the twin compared real verdicts
