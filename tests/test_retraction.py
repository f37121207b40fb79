"""Retraction (tombstone) support for the dedup signature store and
the persisted ANN index.

A 100 TB training-data pipeline must honor takedowns: a retracted
document stops being canonical IMMEDIATELY (merge-on-read — probes
anti-join the tombstone set) and its rows are physically removed by
the purge pass (major compaction). These tests pin both halves plus
the idempotent-replay contract of the purge.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F


def _docs(spark, n=6, tag="base"):
    rows = [(i, f"{tag} document number {i} " +
             " ".join(f"w{i}x{j}" for j in range(25)))
            for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDedupRetraction:
    def test_retracted_doc_stops_blocking_and_purges(self, spark,
                                                     tmp_path):
        from maps_spark.sources.maintenance import (
            compact_dedup_store, purge_dedup_tombstones)
        from maps_spark.streaming.dedup import (accepted_ids,
                                                process_batch,
                                                retract_docs)
        store = str(tmp_path / "store")
        base = _docs(spark)
        process_batch(base, store, batch_id=0)
        # a copy of doc 2 under a new id is rejected against it
        copy1 = base.where("doc_id = 2").select(
            (F.col("doc_id") + 100).alias("doc_id"), "text")
        process_batch(copy1, store, batch_id=1)
        rej = {(r.doc_id, r.dup_of) for r in
               spark.read.parquet(f"{store}/dupes").collect()}
        assert (102, 2) in rej

        # retract doc 2: it leaves accepted_ids NOW (merge-on-read)
        out = retract_docs(spark, store, [2])
        assert out["retracted"] == 1
        acc = {r.doc_id for r in accepted_ids(spark, store).collect()}
        assert 2 not in acc and 0 in acc

        # a NEW copy of the retracted text must now be ACCEPTED —
        # no canonical left to match (102 was rejected, never indexed)
        copy2 = base.where("doc_id = 2").select(
            (F.col("doc_id") + 200).alias("doc_id"), "text")
        process_batch(copy2, store, batch_id=2)
        acc = {r.doc_id for r in accepted_ids(spark, store).collect()}
        assert 202 in acc
        # history is preserved: the old verdict row is untouched
        rej = {(r.doc_id, r.dup_of) for r in
               spark.read.parquet(f"{store}/dupes").collect()}
        assert (102, 2) in rej

        # the tombstone filter also composes with a compacted store
        compact_dedup_store(spark, store)
        copy3 = base.where("doc_id = 2").select(
            (F.col("doc_id") + 300).alias("doc_id"), "text")
        process_batch(copy3, store, batch_id=3)
        rej = {(r.doc_id, r.dup_of) for r in
               spark.read.parquet(f"{store}/dupes").collect()}
        # 302 IS a dup — of the re-accepted copy 202, never of the
        # retracted 2
        assert (302, 202) in rej and (302, 2) not in rej

        # purge: rows physically gone from every index table
        res = purge_dedup_tombstones(spark, store)
        assert res["tombstones"] == 1
        assert not os.path.isdir(f"{store}/tombstones")
        raw_sigs = {r.doc_id for r in
                    spark.read.parquet(f"{store}/sigs").collect()}
        assert 2 not in raw_sigs and 202 in raw_sigs
        raw_hashes = {r.doc_id for r in
                      spark.read.parquet(f"{store}/hashes").collect()}
        assert 2 not in raw_hashes
        from maps_spark.streaming.dedup import read_store_bands
        bands = read_store_bands(spark, store)
        assert bands.where("doc_id = 2").count() == 0
        assert bands.where("doc_id = 202").count() > 0
        # dupes history survives the purge
        rej = {(r.doc_id, r.dup_of) for r in
               spark.read.parquet(f"{store}/dupes").collect()}
        assert (102, 2) in rej

        # replayed purge (no tombstones left) is a clean no-op
        assert purge_dedup_tombstones(spark, store) is None

    def test_purge_is_idempotent_with_tombstones_present(self, spark,
                                                         tmp_path):
        """Crash contract: if the purge completed its rewrites but
        died before clearing the tombstone set, re-running drops
        nothing new and converges."""
        import shutil

        from maps_spark.sources.maintenance import \
            purge_dedup_tombstones
        from maps_spark.streaming.dedup import (process_batch,
                                                retract_docs)
        store = str(tmp_path / "store")
        process_batch(_docs(spark), store, batch_id=0)
        retract_docs(spark, store, [1, 3])
        tomb_copy = str(tmp_path / "tomb_copy")
        shutil.copytree(f"{store}/tombstones", tomb_copy)
        r1 = purge_dedup_tombstones(spark, store)
        # simulate the crash window: tombstones reappear
        shutil.copytree(tomb_copy, f"{store}/tombstones")
        r2 = purge_dedup_tombstones(spark, store)
        assert r1["tombstones"] == r2["tombstones"] == 2
        sigs = {r.doc_id for r in
                spark.read.parquet(f"{store}/sigs").collect()}
        assert sigs == {0, 2, 4, 5}


class TestMediaRetraction:
    def _media(self, spark, imgs):
        import pandas as pd
        from maps_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                     encode_ppm)
        rows = [(mid, "image", bytearray(encode_ppm(img)),
                 img.shape[1], img.shape[0], 0, 0)
                for mid, img in imgs]
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["media_id", "kind", "payload",
                                        "width", "height",
                                        "sample_rate", "n_frames"]),
            schema=MEDIA_SCHEMA)

    def test_retracted_image_stops_blocking_and_purges(self, spark,
                                                       tmp_path):
        import numpy as np

        from maps_spark.sources.maintenance import (
            compact_media_store, purge_media_tombstones)
        from maps_spark.streaming.media import (accepted_ids,
                                                process_media_batch,
                                                read_store_bands,
                                                retract_media)
        rng = np.random.default_rng(7)
        store = str(tmp_path / "store")
        base = [rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
                for _ in range(4)]

        def noisy(img):
            return np.clip(img.astype(int)
                           + rng.integers(-3, 4, img.shape),
                           0, 255).astype(np.uint8)

        process_media_batch(self._media(
            spark, list(enumerate(base))), store, batch_id=0)
        process_media_batch(self._media(
            spark, [(10, noisy(base[1]))]), store, batch_id=1)
        rej = {(r.media_id, r.dup_of) for r in
               spark.read.parquet(f"{store}/dupes").collect()}
        assert (10, 1) in rej

        retract_media(spark, store, [1])
        acc = {r.media_id for r in
               accepted_ids(spark, store).collect()}
        assert 1 not in acc and 0 in acc

        # a new near-copy of the retracted image is ACCEPTED now
        process_media_batch(self._media(
            spark, [(20, noisy(base[1]))]), store, batch_id=2)
        acc = {r.media_id for r in
               accepted_ids(spark, store).collect()}
        assert 20 in acc

        # composes with the compacted (segmented) store: the next
        # copy matches the re-accepted canonical, never the retracted
        compact_media_store(spark, store)
        process_media_batch(self._media(
            spark, [(30, noisy(base[1]))]), store, batch_id=3)
        rej = {(r.media_id, r.dup_of) for r in
               spark.read.parquet(f"{store}/dupes").collect()}
        assert (30, 20) in rej and (30, 1) not in rej

        res = purge_media_tombstones(spark, store)
        assert res["tombstones"] == 1
        assert not os.path.isdir(f"{store}/tombstones")
        raw = {r.media_id for r in
               spark.read.parquet(f"{store}/hashes").collect()}
        assert 1 not in raw and 20 in raw
        bands = read_store_bands(spark, store)
        assert bands.where("media_id = 1").count() == 0
        rej = {(r.media_id, r.dup_of) for r in
               spark.read.parquet(f"{store}/dupes").collect()}
        assert (10, 1) in rej  # history survives


class TestAnnRetraction:
    def test_retracted_vector_leaves_topk_and_purges(self, spark,
                                                     tmp_path):
        from maps_spark.sources.ann_index import (build_ivf_index,
                                                  purge_ann_tombstones,
                                                  query_ivf_index,
                                                  retract_vectors)
        from tests.conftest import SF_SMALL
        emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        root = str(tmp_path / "ivf")
        build_ivf_index(emb, root, n_clusters=8, train_sample=300)
        q = emb.where("vec_id = 7")
        before = query_ivf_index(spark, root, q, k=5).collect()
        victim = before[0]["neighbor_id"]
        k_ids = {r["neighbor_id"] for r in before}

        retract_vectors(spark, root, [victim])
        after = query_ivf_index(spark, root, q, k=5).collect()
        ids_after = {r["neighbor_id"] for r in after}
        assert victim not in ids_after
        assert len(after) == 5  # the slot is refilled, not a hole
        assert ids_after - k_ids  # a new neighbor moved up

        res = purge_ann_tombstones(spark, root)
        assert res["tombstones"] == 1
        assert not os.path.isdir(f"{root}/tombstones")
        raw = spark.read.parquet(f"{root}/vectors")
        assert raw.where(f"vec_id = {victim}").count() == 0
        # cluster partitioning survives the purge (pruned serving)
        assert any(d.startswith("cluster=")
                   for d in os.listdir(f"{root}/vectors"))
        post = query_ivf_index(spark, root, q, k=5).collect()
        assert {r["neighbor_id"] for r in post} == ids_after

    def test_pq_codes_purge(self, spark, tmp_path):
        from maps_spark.sources.ann_index import (build_pq_index,
                                                  purge_ann_tombstones,
                                                  query_pq_index,
                                                  retract_vectors)
        from tests.conftest import SF_SMALL
        emb = (spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
               .where("vec_id < 200"))
        root = str(tmp_path / "pq")
        build_pq_index(emb, root, m=4, n_cent=8)
        q = emb.where("vec_id = 3")
        before = query_pq_index(spark, root, q, k_results=5).collect()
        victim = before[0]["vec_id"]
        retract_vectors(spark, root, [victim])
        after = query_pq_index(spark, root, q, k_results=5).collect()
        assert victim not in {r["vec_id"] for r in after}
        assert len(after) == 5
        purge_ann_tombstones(spark, root)
        raw = spark.read.parquet(f"{root}/pq_codes")
        assert raw.where(f"vec_id = {victim}").count() == 0
        post = query_pq_index(spark, root, q, k_results=5).collect()
        assert {r["vec_id"] for r in post} == {r["vec_id"] for r in after}
