"""Isolated profiler for the streaming-dedup compaction path (guide §1:
measure first). Builds a dedup store from sf0.1 documents batch-by-batch
(same shape as bench.py's streaming_dedup_16batches_c2 landing zone),
then times each component of compact_dedup_store in isolation:

- tiered compaction of sigs / hashes / dupes (flat tables)
- fold_l0_segments: fingerprint, L0 read+dropDuplicates, staged
  partitioned write, bloom write_stats pass, rename

Usage: python tools/profile_compact.py [n_batches]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from maps_spark.session import get_spark
    from maps_spark.sources.occurrence import spread
    from maps_spark.streaming.dedup import process_batch
    from maps_spark.sources import maintenance as M

    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("profile-compact", cpus=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spread(spark, spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    d = docs.select("doc_id", "text").where(F.col("doc_id") % 5 < 2)

    base = tempfile.mkdtemp(prefix="prof_dedup_")
    store = f"{base}/store"
    try:
        t0 = time.time()
        for b in range(n_batches):
            batch = d.where(F.col("doc_id") % n_batches == b)
            tb = time.time()
            process_batch(batch, store, batch_id=b)
            print(f"batch {b}: {time.time()-tb:6.2f}s", flush=True)
        print(f"build: {time.time()-t0:.1f}s", flush=True)

        # --- now time compact_dedup_store components ---
        spark.sparkContext.setJobDescription("compact: flat tables")
        for sub, sort in (("sigs", ("doc_id",)),
                          ("hashes", ("text_hash",)),
                          ("dupes", ("doc_id",))):
            p = f"{store}/{sub}"
            t = time.time()
            res = M.compact_dir_tiered(spark, p, sort_within=sort)
            print(f"compact {sub}: {time.time()-t:6.2f}s {res}", flush=True)

        # fold with internal phase timing (monkeypatched prints)
        spark.sparkContext.setJobDescription("compact: fold L0")
        l0 = f"{store}/bands_l0"
        live = f"{store}/bands"
        t = time.time()
        fp = M._l0_fingerprint(l0)
        t_fp = time.time() - t

        t = time.time()
        n_l0 = spark.read.parquet(l0).count()
        t_cnt = time.time() - t

        t = time.time()
        l0_df = spark.read.parquet(l0)
        df = l0_df.select(*sorted(l0_df.columns)).dropDuplicates()
        df.write.format("noop").mode("overwrite").save()
        t_dedup_noop = time.time() - t

        print(f"fold phases: fingerprint={t_fp:.2f}s footer_count={t_cnt:.2f}s "
              f"l0_dropDup_noop={t_dedup_noop:.2f}s (l0 rows={n_l0})",
              flush=True)

        # time _publish_segment's write separately: staged write vs stats
        os.makedirs(live, exist_ok=True)
        import maps_spark.sources.bloom as B
        orig_write_stats = B.write_stats
        stats_t = {}

        def timed_write_stats(df_, out_dir, keys, value_col, **kw):
            ts = time.time()
            r = orig_write_stats(df_, out_dir, keys, value_col, **kw)
            stats_t["stats"] = time.time() - ts
            return r

        B.write_stats = timed_write_stats
        # also patch in maintenance's import site (it imports inside fn)
        t = time.time()
        res = M.fold_l0_segments(spark, live, l0,
                                 partition_by=("band", "bb"),
                                 sort_within=("bh",),
                                 stats=(("band", "bb"), "bh"))
        t_fold = time.time() - t
        print(f"fold total: {t_fold:6.2f}s (stats pass: "
              f"{stats_t.get('stats', -1):.2f}s) {res}", flush=True)
        B.write_stats = orig_write_stats
    finally:
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
