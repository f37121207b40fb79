"""Incremental corpus re-curation: only the docs a snapshot diff
touched pay curation cost.

:func:`maps_spark.operators.corpus.curate_corpus` is the batch funnel;
re-running it on 100 TB because 0.1% of pages changed is the classic
waste. This driver keeps a persistent verdict table plus the streaming
dedup signature store (:mod:`maps_spark.streaming.dedup`) and, per new
snapshot:

1. :func:`operators.corpus.corpus_diff` computes the (added, changed,
   removed) trigger sets — one digest full-outer join;
2. only added/changed docs run the quality gate (pure codegen on the
   delta);
3. quality survivors run ONE :func:`streaming.dedup.process_batch`
   against the accumulated signature store — exact + near-dup vs the
   whole accepted corpus at O(delta) cost (the store probe reads only
   touched ``(band, bb)`` sub-buckets);
4. the verdict table is upserted: removed docs drop out, touched docs
   get their new stage, untouched verdicts survive unchanged.

Verdict stages match ``curate_corpus`` (quality / exact_dup /
near_dup / kept), so a full rebuild and an incremental pass agree on
the stage vocabulary; exact agreement of verdicts is NOT guaranteed
(incremental dedup is first-accepted-wins across batches, batch
curation is lowest-id-wins globally) — the trade every incremental
dedup makes, stated here rather than hidden.

Staleness: a CHANGED doc re-enters the batch but its previous
signature stays in the append-only store (self-matches are excluded in
``process_batch``); until the periodic full rebuild /
``compact_dedup_store`` pass, a later doc can still match the old
version's signature — the same stale-entry window HBase has between
compactions, bounded by rebuild cadence.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _verdicts_path(state_dir: str) -> str:
    return f"{state_dir}/verdicts"


def read_verdicts(spark: SparkSession, state_dir: str) -> DataFrame:
    """(doc_id, stage) for every doc in the current corpus state."""
    return spark.read.parquet(_verdicts_path(state_dir))


def run_incremental_curation(spark: SparkSession, new_docs: DataFrame,
                             state_dir: str,
                             text_col: str = "text",
                             min_tokens: int = 16,
                             threshold: float = 0.5,
                             batch_id: int | None = None) -> dict:
    """Fold a new corpus snapshot into the curation state.

    First call (empty ``state_dir``) curates everything (the whole
    snapshot IS the delta); later calls pay O(changed docs). Returns
    the delta funnel counts.
    """
    from maps_spark.operators.corpus import corpus_diff
    from maps_spark.operators.text import quality_score
    from maps_spark.streaming.dedup import process_batch, rejected

    vp = _verdicts_path(state_dir)
    # committed state = the batch counter exists (it is written LAST,
    # after the snapshot swap): a run that crashed mid-way leaves
    # partial files but no counter advance, and its retry must re-run
    # as the same logical batch, not treat debris as state
    have_state = os.path.isfile(_counter_path(state_dir))
    if have_state:
        _finish_swap_if_needed(state_dir)
    new_docs = new_docs.select("doc_id", text_col).localCheckpoint()

    if have_state:
        old_docs = spark.read.parquet(f"{state_dir}/docs")
        diff = corpus_diff(old_docs, new_docs).localCheckpoint()
        touched = (diff.where(F.col("change").isin("added", "changed"))
                   .select("doc_id"))
        removed = diff.where(F.col("change") == "removed").select("doc_id")
        delta = new_docs.join(touched, "doc_id")
    else:
        removed = None
        delta = new_docs
    n_delta = delta.count()

    q = quality_score(delta.select("doc_id", text_col),
                      min_tokens=min_tokens)
    q_fail = (q.where(~F.col("keep")).select("doc_id")
              .withColumn("stage", F.lit("quality")))
    survivors = delta.join(q.where(F.col("keep")).select("doc_id"),
                           "doc_id")

    # Replay guard (ADVICE r3): the signature-store append inside
    # process_batch is the one non-idempotent step. The batch counter
    # is only committed after the whole run succeeds, so a crash
    # anywhere after the append makes the RETRY reuse the same bid —
    # and the store marker (same mechanism as streaming.dedup's
    # foreachBatch body) then skips the duplicate append; verdicts
    # re-derive idempotently from the store's rejected table.
    from maps_spark.streaming.refresh import _applied_batch, _commit_batch
    bid = batch_id if batch_id is not None else _peek_batch(state_dir)
    store = f"{state_dir}/dedup_store"
    marker = f"{store}/_meta/last_batch.json"
    if _applied_batch(marker) < bid:
        process_batch(survivors, store, batch_id=bid, text_col=text_col,
                      threshold=threshold)
        _commit_batch(marker, bid)
    rej = (rejected(spark, store)
           .where(F.col("batch_id") == bid)
           .select("doc_id",
                   F.when(F.col("jaccard_est") >= 1.0, "exact_dup")
                   .otherwise("near_dup").alias("stage")))
    delta_verdicts = (delta.select("doc_id")
                      .join(q_fail.unionByName(rej), "doc_id", "left")
                      .withColumn("stage",
                                  F.coalesce("stage", F.lit("kept"))))

    # upsert: untouched old verdicts + delta verdicts - removed docs
    if have_state:
        old_v = read_verdicts(spark, state_dir)
        keepers = old_v.join(delta_verdicts.select("doc_id"),
                             "doc_id", "left_anti")
        if removed is not None:
            keepers = keepers.join(removed, "doc_id", "left_anti")
        merged = keepers.unionByName(delta_verdicts).localCheckpoint()
    else:
        merged = delta_verdicts.localCheckpoint()
    merged.write.mode("overwrite").parquet(vp)
    new_docs.write.mode("overwrite").parquet(f"{state_dir}/docs.next")
    _swap(state_dir)
    _commit_counter(state_dir, bid)  # the run is now durable

    stages = {r["stage"]: r["n"] for r in
              delta_verdicts.groupBy("stage")
              .agg(F.count("*").alias("n")).collect()}
    return {"batch_id": bid, "delta_docs": int(n_delta),
            "delta_stages": stages,
            "corpus_docs": int(merged.count())}


def _counter_path(state_dir: str) -> str:
    return f"{state_dir}/_meta/batch_counter"


def _peek_batch(state_dir: str) -> int:
    """Next batch id WITHOUT advancing the counter: a crashed run's
    retry draws the same id, which is what lets the store marker
    dedupe the signature append."""
    p = _counter_path(state_dir)
    if os.path.isfile(p):
        with open(p) as f:
            return int(f.read().strip()) + 1
    return 0


def _commit_counter(state_dir: str, bid: int) -> None:
    p = _counter_path(state_dir)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    cur = _peek_batch(state_dir) - 1
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(max(bid, cur)))  # never rewind on explicit ids
    os.replace(tmp, p)


def _finish_swap_if_needed(state_dir: str) -> None:
    """Complete a :func:`_swap` a previous run crashed inside: if the
    current snapshot is missing but ``docs.next`` survived, promote it;
    always clear leftover ``docs.old``."""
    import shutil
    cur, nxt = f"{state_dir}/docs", f"{state_dir}/docs.next"
    if not os.path.isdir(cur) and os.path.isdir(nxt):
        os.rename(nxt, cur)
    shutil.rmtree(f"{state_dir}/docs.old", ignore_errors=True)


def _swap(state_dir: str) -> None:
    """docs.next -> docs (keep the previous snapshot for the next
    diff; the brief rename window is covered by the driver being the
    only writer — same contract as maintenance.compact_dir)."""
    import shutil
    cur, nxt = f"{state_dir}/docs", f"{state_dir}/docs.next"
    old = f"{state_dir}/docs.old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(cur):
        os.rename(cur, old)
    os.rename(nxt, cur)
    shutil.rmtree(old, ignore_errors=True)
