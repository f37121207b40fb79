"""Isolated probe_verify growth profiler (guide §1: measure first).

Builds the streaming dedup store batch by batch — same landing shape
as bench.py's ``streaming_dedup_16batches_c2`` (16 slices, compaction
every 2 batches) but calling process_batch directly — and prints the
per-batch segment profile, with the store-side probe pre-filter ON and
OFF in ONE session (same-JVM A/B: the host shows multi-second I/O
weather, so cross-process single runs are not comparable).

Usage: python tools/profile_probe.py [n_batches] [mode]
  mode: "ab" (default: off-then-on), "on", "off"
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_curve(spark, d, n_batches: int, compact_every: int,
              label: str) -> list[dict]:
    from maps_spark.sources.maintenance import compact_dedup_store
    from maps_spark.streaming.dedup import process_batch

    base = tempfile.mkdtemp(prefix=f"prof_probe_{label}_")
    store = f"{base}/store"
    prof: list[dict] = []
    try:
        t0 = time.time()
        for b in range(n_batches):
            if compact_every and b and b % compact_every == 0:
                tc = time.time()
                res = compact_dedup_store(spark, store)
                bres = res.get("bands") or {}
                prof.append({"batch_id": b,
                             "compact": round(time.time() - tc, 3),
                             "segments": bres.get("segments")})
            spark.sparkContext.setJobDescription(
                f"probe[{label}] batch {b}")
            batch = d.where(F.col("doc_id") % n_batches == b)
            process_batch(batch, store, batch_id=b, profile=prof)
        total = time.time() - t0
        print(f"[{label}] total {total:.1f}s", flush=True)
        for p in prof:
            print(f"[{label}] {json.dumps(p)}", flush=True)
        pv = [p["probe_verify"] for p in prof if "probe_verify" in p]
        print(f"[{label}] pv curve: {pv}", flush=True)
        print(f"[{label}] pv_first={pv[0]:.2f} pv_last={pv[-1]:.2f} "
              f"ratio={pv[-1] / max(pv[0], 1e-9):.2f}", flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return prof


def main() -> None:
    import maps_spark.streaming.dedup as SD
    from maps_spark.session import get_spark
    from maps_spark.sources.occurrence import spread

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    mode = sys.argv[2] if len(sys.argv) > 2 else "ab"
    spark = get_spark("profile-probe", cpus=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spread(spark,
                  spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    d = docs.select("doc_id", "text")

    default_gate = SD.PREFILTER_MAX_KEYS
    if mode in ("ab", "off"):
        SD.PREFILTER_MAX_KEYS = -1  # pre-filter disabled
        run_curve(spark, d, n_batches, 2, "off")
    if mode in ("ab", "on"):
        SD.PREFILTER_MAX_KEYS = default_gate
        run_curve(spark, d, n_batches, 2, "on")
    spark.stop()


if __name__ == "__main__":
    main()
